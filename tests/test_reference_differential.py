"""THE differential gate: run the REFERENCE'S OWN CODE in-process
(unavailable heavy deps stubbed) against our kernels on the same inputs.

- builder parity: reference HMMBuilder vs kernels.build_hmm_params —
  identical probability values per (state, state) key;
- beam parity: reference _k_best_beam/kbest_for_word vs our NumPy beam,
  run on the SAME parameter dicts (same state order, so tie-breaking is
  comparable) — identical candidates AND probabilities;
- pipeline parity: reference tokenize -> dehyphenate -> generate_kbest ->
  bin_tokens -> autocorrect -> str(tokens)/gold sink vs
  kernels.correct_document — byte-identical output per document.

Skipped gracefully if the reference tree is unavailable.
"""

import sys
import types

import pytest


def _fake_reference_deps():
    class _Any:
        def __getattr__(self, n):
            return self

        def __call__(self, *a, **k):
            return self

        def __mro_entries__(self, bases):
            return (object,)

    any_obj = _Any()

    def fake_module(name, **attrs):
        m = types.ModuleType(name)
        m.__getattr__ = lambda _n: any_obj
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules.setdefault(name, m)

    fake_module("progressbar", progressbar=lambda it, max_value=None: it)
    fake_module("nltk")
    fake_module("nltk.tokenize", word_tokenize=lambda s, lang=None: s.split())
    for n in [
        "fitz", "cv2", "pytesseract", "PIL", "PIL.Image", "lxml", "lxml.html",
        "bs4", "bs4.dammit", "mysql", "mysql.connector", "requests", "plotille",
    ]:
        fake_module(n)

    class _LRU(dict):
        def __init__(self, maxsize=0):
            super().__init__()

    fake_module(
        "cachetools",
        LRUCache=_LRU,
        cachedmethod=lambda cache, key=None: (lambda fn: fn),
    )
    fake_module("cachetools.keys", hashkey=lambda *a, **k: a)


@pytest.fixture(scope="module")
def ref():
    _fake_reference_deps()
    sys.path.insert(0, "/root/reference")
    try:
        import CorrectOCR.tokens  # noqa: F401  (mocks.py entry order)
        from CorrectOCR.dictionary import Dictionary as RefDictionary
        from CorrectOCR.fileio import FileIO
        from CorrectOCR.model.hmm import HMM, HMMBuilder
        from CorrectOCR.heuristics import Heuristics
        from CorrectOCR.tokens import Tokenizer
        from CorrectOCR.tokens.list import TokenList
    except Exception as exc:  # pragma: no cover
        pytest.skip(f"reference not importable: {exc}")

    import tempfile
    from pathlib import Path

    FileIO.cacheRoot = Path(tempfile.mkdtemp(prefix="cocr_ref_cache_"))

    if "memtest" not in TokenList._subclasses:

        @TokenList.register("memtest")
        class MemTokenList(TokenList):
            def load(self):
                pass

            def save(self, token=None):
                pass

    class Config:
        type = "memtest"

    class Corpus:
        def __init__(self, body, docid="doc"):
            import pathlib

            self.body = body
            self.path = pathlib.Path(f"{docid}.txt")
            self.id = docid

    class Lang:
        name = "english"

    def make_dictionary(words):
        d = RefDictionary()
        for w in words:
            d.add("test", w)
        return d

    ns = types.SimpleNamespace(
        HMM=HMM, HMMBuilder=HMMBuilder, Heuristics=Heuristics,
        Tokenizer=Tokenizer, Config=Config, Corpus=Corpus, Lang=Lang,
        make_dictionary=make_dictionary,
    )
    return ns


FIXTURE = dict(
    gold_words=["String", "Stræng"],
    smoothing=0.0001,
    charset="ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz()-\xad",
    read_counts={
        "S": {"S": 1000}, "t": {"t": 999, "l": 1}, "r": {"r": 1000},
        "i": {"i": 1000}, "æ": {"æ": 1000}, "n": {"n": 1000},
        "g": {"g": 1000}, "-": {"-": 1000}, "\xad": {"\xad": 1000},
        "(": {")": 1000},
    },
)


def _ref_hmm(ref, multichars=None):
    b = ref.HMMBuilder(
        set(FIXTURE["gold_words"]), FIXTURE["smoothing"], FIXTURE["charset"],
        {k: dict(v) for k, v in FIXTURE["read_counts"].items()}, [],
        FIXTURE["gold_words"],
    )
    hmm = ref.HMM(None, multichars, use_cache=False)
    hmm.init, hmm.tran, hmm.emis = b.init, b.tran, b.emis
    return hmm


def test_builder_value_parity(ref):
    """Same probabilities per key (order-insensitive: the reference's
    state order is set-iteration-dependent, ours is sorted)."""
    from correctocr_spark.kernels.hmm import build_hmm_params

    hmm = _ref_hmm(ref)
    mine = build_hmm_params(
        sorted(set(FIXTURE["gold_words"])), FIXTURE["smoothing"],
        FIXTURE["charset"], FIXTURE["read_counts"], [], FIXTURE["gold_words"],
    )
    my_init, my_tran, my_emis = mine.to_dicts()
    assert set(hmm.init) == set(my_init)
    for s in hmm.init:
        assert hmm.init[s] == my_init[s], f"init[{s}]"
    for a in hmm.tran:
        for b2 in hmm.tran[a]:
            assert hmm.tran[a][b2] == my_tran[a][b2], f"tran[{a}][{b2}]"
    for a in hmm.emis:
        for b2 in hmm.emis[a]:
            assert hmm.emis[a][b2] == my_emis[a][b2], f"emis[{a}][{b2}]"


def test_builder_out_of_charset_gold_char(ref):
    """Gold/dictionary chars OUTSIDE the configured characterSet must not
    become HMM states: the reference filters _text_char_counts against
    the PRE-union charset (hmm.py:343-345) before the union at
    hmm.py:285. 'ø' (in gold, not in charset, not in readCounts) must be
    absent from init; every shared-state probability must match."""
    from correctocr_spark.kernels.hmm import build_hmm_params

    gold = ["ab", "øb"]  # 'ø' not in charset
    charset = "ab"
    read_counts = {"a": {"a": 10, "b": 1}, "b": {"b": 10}}
    b = ref.HMMBuilder(
        set(gold), 0.0001, charset,
        {k: dict(v) for k, v in read_counts.items()}, [], list(gold),
    )
    mine = build_hmm_params(sorted(set(gold)), 0.0001, charset, read_counts, [], gold)
    my_init, my_tran, my_emis = mine.to_dicts()
    assert "ø" not in b.init and "ø" not in my_init
    assert set(b.init) == set(my_init)
    for s in b.init:
        assert b.init[s] == my_init[s], f"init[{s}]"
    for a in b.tran:
        for b2 in b.tran[a]:
            assert b.tran[a][b2] == my_tran[a][b2], f"tran[{a}][{b2}]"
    for a in b.emis:
        for b2 in b.emis[a]:
            assert b.emis[a][b2] == my_emis[a][b2], f"emis[{a}][{b2}]"


def test_beam_parity_on_reference_params(ref):
    """Bitwise beam parity on the reference's own parameter dicts (same
    state order => tie-breaks comparable), over adversarial words."""
    from correctocr_spark.kernels.hmm import HMMParams, kbest_for_word, kbest_for_words

    hmm = _ref_hmm(ref)
    mine = HMMParams(dict(hmm.init), {a: dict(r) for a, r in hmm.tran.items()},
                     {a: dict(r) for a, r in hmm.emis.items()})
    words = [
        "Slring", "String", "Str-ing", "Str\xading", "(String)", "S", "-",
        "ÿÿ", "ÿSÿ", "Stri", "ng", "Stræng", "xyzzy", "STRING", "s",
        "(((", ")", "Str-", "gnirtS",
    ]
    for w in words:
        ref_kb = hmm.kbest_for_word(w, 4)
        ref_list = [(ref_kb[i].candidate, ref_kb[i].probability) for i in range(1, 5)]
        assert kbest_for_word(mine, w, 4) == ref_list, w
    batch = kbest_for_words(mine, words, 4)
    for w, got in zip(words, batch):
        ref_kb = hmm.kbest_for_word(w, 4)
        assert got == [(ref_kb[i].candidate, ref_kb[i].probability) for i in range(1, 5)], w


def test_multichar_parity(ref):
    from correctocr_spark.kernels.hmm import HMMParams, kbest_for_word

    hmm = _ref_hmm(ref, multichars={"ce": ["æ"]})
    mine = HMMParams(dict(hmm.init), {a: dict(r) for a, r in hmm.tran.items()},
                     {a: dict(r) for a, r in hmm.emis.items()}, multichars={"ce": ["æ"]})
    for w in ["Strceng", "ceceece", "ce", "Sce-ce"]:
        ref_kb = hmm.kbest_for_word(w, 4)
        ref_list = [(ref_kb[i].candidate, ref_kb[i].probability) for i in range(1, 5)]
        assert kbest_for_word(mine, w, 4) == ref_list, w


def _ref_correct_document(ref, hmm, dictionary, settings, text, k=4):
    """The reference chain (document.py:204-242) driven directly on
    reference objects (mirrors do_correct; our code under test is NOT
    involved here)."""
    tokenizer = ref.Tokenizer.for_type(".txt")(language=ref.Lang())
    tokens = tokenizer.tokenize(ref.Corpus(text), ref.Config())
    tokens.dehyphenate()
    hmm.generate_kbest(tokens, k)
    heuristics = ref.Heuristics(settings, dictionary)
    heuristics.bin_tokens(tokens)
    for t in tokens:
        if not t.gold:
            if t.heuristic in {"kbest", "kdict"}:
                t.gold = t.kbest[int(t.selection)].candidate
            elif t.heuristic == "original":
                t.gold = t.original
    merged = str(tokens)
    spaced = " ".join(t.gold or t.original for t in tokens if not t.is_discarded)
    corrected = spaced.replace("_NEWLINE_N_", "\n").replace(" \n ", "\n")
    return corrected, merged


def test_end_to_end_document_parity(ref):
    """Byte-identical corrected + merged text, reference vs kernel, over
    deterministic random adversarial documents."""
    import numpy as np

    from correctocr_spark.kernels.dictionary import Dictionary
    from correctocr_spark.kernels.heuristics import normalize_settings
    from correctocr_spark.kernels.hmm import HMMParams
    from correctocr_spark.kernels.pipeline import correct_document

    hmm = _ref_hmm(ref)
    mine = HMMParams(dict(hmm.init), {a: dict(r) for a, r in hmm.tran.items()},
                     {a: dict(r) for a, r in hmm.emis.items()})
    # the reference's own Dictionary (clean + <=1-letter membership) on
    # both sides — a plain set would silently change binning semantics
    ref_dict = ref.make_dictionary(FIXTURE["gold_words"])
    my_dict = Dictionary(FIXTURE["gold_words"])
    settings = {1: "original", 2: "annotator", 3: "annotator", 4: "kbest",
                5: "original", 6: "kdict", 7: "original", 8: "original",
                9: "original", 10: "original"}

    rng = np.random.RandomState(42)
    pieces = ["String", "Slring", "Stræng", "Str-", "ing", "Str\xad", ".", "»«",
              "_NEWLINE_N_", "-", "(String)", "s", "xyzzy", "STRING", "Te-st"]
    docs = ["Str- ing Te-st", "Slring"]
    for _ in range(40):
        n = rng.randint(1, 16)
        docs.append(" ".join(pieces[rng.randint(len(pieces))] for _ in range(n)))

    from correctocr_spark.kernels.textutils import hyphenRE

    checked = 0
    for text in docs:
        words = text.split()
        # Reference bug: a doc whose FINAL token dehyphenates crashes
        # bin_tokens (heuristics.py:107 indexes tokens[index+1] past the
        # end). We guard; the reference cannot process such docs at all —
        # asserted separately below.
        final_hyphen = bool(words) and bool(hyphenRE.search(words[-1]))
        res = correct_document(text, mine, my_dict, normalize_settings(settings), k=4)
        if final_hyphen:
            continue
        ref_corrected, ref_merged = _ref_correct_document(
            ref, hmm, ref_dict, dict(settings), text
        )
        assert res["corrected"] == ref_corrected, f"corrected mismatch: {text!r}"
        assert res["merged"] == ref_merged, f"merged mismatch: {text!r}"
        checked += 1
    assert checked >= 20  # the comparison actually exercised many docs

    with pytest.raises(IndexError):
        _ref_correct_document(ref, hmm, ref_dict, dict(settings), "Str-")
