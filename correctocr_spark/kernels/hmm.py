"""Character-level HMM: k-best beam search + parameter training.

Reference: /root/reference/CorrectOCR/model/hmm.py.

The beam (``hmm.py:165-188``) is re-expressed as vectorized NumPy with
**identical candidate ordering**, including ties:

- the reference sorts path lists with Python's stable ``sorted(...,
  key=prob, reverse=True)``; ``reverse=True`` on a stable sort keeps
  equal-probability paths in generation order;
- generation order for the first two chars is ``for i in states for j in
  states`` (i-major); for later chars it is ``for j in states for x in
  paths`` (**j-major**, paths minor — note the inversion, hmm.py:183-184);
- ``np.argsort(-probs, kind='stable')`` reproduces exactly that order.

State order = insertion order of the ``init`` mapping (``hmm.py:26-30``:
``states = init.keys()``), which must be preserved from the params JSON.
Missing chars hit ``defaultdict(float)`` => probability-0 paths that are
kept when fewer than k nonzero paths exist — we therefore never prune
zero-probability paths.
"""

from __future__ import annotations

import itertools
import re
from typing import Dict, Iterable, List, Mapping, Optional, Sequence, Tuple

import numpy as np

KBest = List[Tuple[str, float]]


class HMMParams:
    """Dense NumPy view of the reference's nested-dict parameters.

    ``init: {char->p}``, ``tran: {char->{char->p}}``,
    ``emis: {char->{char->p}}`` (``hmm.py:67-70``); state order is the
    ``init`` key order. Designed to be built once on the driver and
    broadcast to executors.
    """

    __slots__ = ("states", "index", "init", "tran", "emis", "multichars")

    def __init__(
        self,
        init: Mapping[str, float],
        tran: Mapping[str, Mapping[str, float]],
        emis: Mapping[str, Mapping[str, float]],
        multichars: Optional[Mapping[str, List[str]]] = None,
    ):
        self.states: List[str] = list(init.keys())
        self.index: Dict[str, int] = {s: i for i, s in enumerate(self.states)}
        n = len(self.states)
        self.init = np.zeros(n, dtype=np.float64)
        self.tran = np.zeros((n, n), dtype=np.float64)
        self.emis = np.zeros((n, n), dtype=np.float64)
        for s, p in init.items():
            self.init[self.index[s]] = p
        for a, row in tran.items():
            ia = self.index.get(a)
            if ia is None:
                continue
            for b, p in row.items():
                ib = self.index.get(b)
                if ib is not None:
                    self.tran[ia, ib] = p
        for a, row in emis.items():
            ia = self.index.get(a)
            if ia is None:
                continue
            for b, p in row.items():
                ib = self.index.get(b)
                if ib is not None:
                    self.emis[ia, ib] = p
        self.multichars = dict(multichars or {})

    # -- (de)serialization: the reference's JSON artifact shape -----------

    def to_dicts(self) -> list:
        """JSON shape ``[init, tran, emis]`` (``hmm.py:67-70``)."""
        init = {s: float(self.init[i]) for i, s in enumerate(self.states)}
        tran = {
            a: {b: float(self.tran[i, j]) for j, b in enumerate(self.states)}
            for i, a in enumerate(self.states)
        }
        emis = {
            a: {b: float(self.emis[i, j]) for j, b in enumerate(self.states)}
            for i, a in enumerate(self.states)
        }
        return [init, tran, emis]

    @classmethod
    def from_dicts(cls, data: Sequence, multichars=None) -> "HMMParams":
        init, tran, emis = data
        return cls(init, tran, emis, multichars)

    def is_valid(self) -> bool:
        """``hmm.py:107-130`` — init/tran/emis key sets must match.

        With the dense representation the inner-key check is structural;
        only NaN/negative sanity remains meaningful."""
        return bool(
            np.isfinite(self.init).all()
            and np.isfinite(self.tran).all()
            and np.isfinite(self.emis).all()
            and (self.init >= 0).all()
            and (self.tran >= 0).all()
            and (self.emis >= 0).all()
        )

    def _emis_col(self, ch: str) -> np.ndarray:
        """Emission column for an observed char; all-zeros if unknown
        (the ``defaultdict(float)`` fallthrough, ``hmm.py:52``)."""
        i = self.index.get(ch)
        if i is None:
            return np.zeros(len(self.states), dtype=np.float64)
        return self.emis[:, i]


def viterbi(params: HMMParams, char_seq: str) -> str:
    """``hmm.py:132-163`` — max-probability state path.

    Dead code in the reference (no call sites); implemented for API
    parity, vectorized. Tie-breaking matches the reference's
    ``max(dict.items(), key=...)``/``max(dict, key=...)`` behavior:
    first-encountered maximum wins == lowest state index wins.
    """
    n = len(params.states)
    L = len(char_seq)
    if n == 0 or L == 0:
        return ""
    delta = params.init * params._emis_col(char_seq[0])
    back = np.zeros((L, n), dtype=np.int64)
    for t in range(1, L):
        cand = delta[:, None] * params.tran  # cand[i, j]
        best_i = cand.argmax(axis=0)  # first max wins, as dict-max does
        delta = cand[best_i, np.arange(n)] * params._emis_col(char_seq[t])
        back[t] = best_i
    best_state = int(delta.argmax())
    states_rev = [best_state]
    for t in range(L - 1, 0, -1):
        states_rev.append(int(back[t, states_rev[-1]]))
    return "".join(params.states[i] for i in reversed(states_rev))


def k_best_beam(params: HMMParams, word: str, k: int) -> KBest:
    """``hmm.py:165-188`` with identical ordering (see module docstring)."""
    states = params.states
    n = len(states)
    if n == 0:
        return []
    if len(word) == 1:
        probs = params.init * params._emis_col(word[0])
        order = np.argsort(-probs, kind="stable")
        return [(states[i], float(probs[i])) for i in order[:k]]

    # First two characters: i-major N*N enumeration (hmm.py:174-175).
    probs2 = (params.init * params._emis_col(word[0]))[:, None] * params.tran * params._emis_col(word[1])[None, :]
    flat = probs2.ravel()  # row-major == i-major
    order = np.argsort(-flat, kind="stable")[:k]
    paths_idx = [(int(f) // n, int(f) % n) for f in order]
    probs = flat[order]

    for t in range(2, len(word)):
        ecol = params._emis_col(word[t])
        last = np.fromiter((p[-1] for p in paths_idx), dtype=np.int64, count=len(paths_idx))
        # hmm.py:183-184 enumerates `for j in states for x in paths`:
        # j-major, path-minor — cand[j, x].
        cand = probs[None, :] * params.tran[last, :].T * ecol[:, None]
        flat = cand.ravel()
        order = np.argsort(-flat, kind="stable")[: k]
        m = len(paths_idx)
        new_paths = []
        for f in order:
            j, x = int(f) // m, int(f) % m
            new_paths.append(paths_idx[x] + (j,))
        paths_idx = new_paths
        probs = flat[order]

    return [
        ("".join(states[i] for i in seq), float(p))
        for seq, p in zip(paths_idx, probs)
    ][:k]


def _stable_topk_desc(flat: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
    """Row-wise top-k indices by value desc, ties by index asc — exactly
    ``np.argsort(-row, kind='stable')[:k]`` but O(M) via argpartition
    plus an exact tie repair at the k-th-value boundary."""
    w, m = flat.shape
    if m <= max(k, 64):
        order = np.argsort(-flat, axis=1, kind="stable")[:, :k]
        return order, np.take_along_axis(flat, order, axis=1)
    part = np.argpartition(-flat, k - 1, axis=1)[:, :k]
    pvals = np.take_along_axis(flat, part, axis=1)
    kth = pvals.min(axis=1)
    # partition is exact iff no kth-valued element was left outside:
    # then ordering the k selected by (value desc, index asc) equals the
    # stable argsort prefix. Ties at the boundary (mostly all-zero rows
    # from unknown chars) take the per-row repair path.
    n_eq_total = (flat == kth[:, None]).sum(axis=1)
    n_eq_sel = (pvals == kth[:, None]).sum(axis=1)
    ok = n_eq_total == n_eq_sel
    order_in_row = np.lexsort((part, -pvals), axis=-1)
    out = np.take_along_axis(part, order_in_row, axis=1)
    for wi in np.flatnonzero(~ok):
        row = flat[wi]
        kv = kth[wi]
        gt = np.flatnonzero(row > kv)
        need = k - len(gt)
        sel = np.concatenate([gt, np.flatnonzero(row == kv)[:need]]) if need > 0 else gt[:k]
        out[wi] = sel[np.lexsort((sel, -row[sel]))]
    return out, np.take_along_axis(flat, out, axis=1)


def _batch_beam_same_length(
    params: HMMParams, words: List[str], k: int, chunk: int = 512
) -> List[KBest]:
    """Beam for a batch of same-length words, one vectorized op per char
    step. Bitwise-identical to :func:`k_best_beam` (same multiplication
    order and the same stable-argsort tie handling; enumeration order
    i-major for the first two chars, j-major/path-minor after —
    hmm.py:174-175,183-184)."""
    n = len(params.states)
    L = len(words[0])
    out: List[KBest] = []
    for lo in range(0, len(words), chunk):
        ws = words[lo : lo + chunk]
        W = len(ws)
        # observed-char emission columns per position: E[t] is (W, N)
        obs = np.full((W, L), -1, dtype=np.int64)
        for wi, w in enumerate(ws):
            for t, ch in enumerate(w):
                obs[wi, t] = params.index.get(ch, -1)
        emis_ext = np.concatenate(
            [params.emis, np.zeros((n, 1), dtype=np.float64)], axis=1
        )  # column -1 = unknown char = all zeros

        def ecol(t: int) -> np.ndarray:  # (W, N)
            return emis_ext[:, obs[:, t]].T

        if L == 1:
            probs = params.init[None, :] * ecol(0)  # (W, N)
            order = np.argsort(-probs, axis=1, kind="stable")[:, :k]
            for wi in range(W):
                out.append(
                    [
                        (params.states[j], float(probs[wi, j]))
                        for j in order[wi]
                    ]
                )
            continue

        a = params.init[None, :] * ecol(0)  # (W, N)
        p2 = (a[:, :, None] * params.tran[None, :, :]) * ecol(1)[:, None, :]
        flat = p2.reshape(W, n * n)  # i-major
        order, probs = _stable_topk_desc(flat, min(k, n * n))
        kk = order.shape[1]
        paths = np.empty((W, kk, L), dtype=np.int64)
        paths[:, :, 0] = order // n
        paths[:, :, 1] = order % n

        for t in range(2, L):
            last = paths[:, :, t - 1]  # (W, kk)
            tr = params.tran[last]  # (W, kk, N): tr[w,x,j]
            cand = (probs[:, :, None] * tr).transpose(0, 2, 1) * ecol(t)[:, :, None]
            flat = cand.reshape(W, n * kk)  # j-major, path-minor
            order, probs = _stable_topk_desc(flat, min(k, n * kk))
            j_idx = order // kk
            x_idx = order % kk
            new_paths = np.empty((W, order.shape[1], L), dtype=np.int64)
            new_paths[:, :, :t] = paths[np.arange(W)[:, None], x_idx, :t]
            new_paths[:, :, t] = j_idx
            paths = new_paths
            kk = order.shape[1]

        states = params.states
        for wi in range(W):
            out.append(
                [
                    ("".join(states[s] for s in paths[wi, x, :L]), float(probs[wi, x]))
                    for x in range(kk)
                ][:k]
            )
    return out


def kbest_for_words(params: HMMParams, words: List[str], k: int) -> List[KBest]:
    """Batched :func:`kbest_for_word`: groups by word length and runs the
    vectorized beam; multichar-bearing and empty words take the scalar
    path (rare). Returns results in input order, identical to the scalar
    function."""
    results: List[Optional[KBest]] = [None] * len(words)
    by_len: Dict[int, List[int]] = {}
    for i, w in enumerate(words):
        if len(w) == 0 or any(sub in w for sub in params.multichars):
            results[i] = kbest_for_word(params, w, k)
        else:
            by_len.setdefault(len(w), []).append(i)
    for _length, idxs in by_len.items():
        batch = _batch_beam_same_length(params, [words[i] for i in idxs], k)
        for i, kb in zip(idxs, batch):
            results[i] = kb
    return results  # type: ignore[return-value]


def multichar_variants(word: str, original: str, replacements: List[str]) -> set:
    """``hmm.py:222-233`` — NOTE the reference uses the key as a regex
    pattern in ``re.split``; replicated verbatim."""
    variants = [original] + list(replacements)
    variant_words = set()
    pieces = re.split(original, word)
    for x in itertools.product(variants, repeat=word.count(original)):
        variant_words.add(
            "".join(
                elem
                for pair in itertools.zip_longest(pieces, x, fillvalue="")
                for elem in pair
            )
        )
    return variant_words


def kbest_for_word(params: HMMParams, word: str, k: int) -> KBest:
    """``hmm.py:194-220``; returns rank-ordered list (rank = index + 1).

    Empty word => k copies of ``('', 0.0)`` (``hmm.py:204-205``). The
    multichar re-rank keeps the stable original-first tie order
    (``hmm.py:218``).
    """
    if len(word) == 0:
        return [("", 0.0)] * k
    k_best = k_best_beam(params, word, k)
    for sub in params.multichars:
        if sub in word:
            for variant in multichar_variants(word, sub, params.multichars[sub]):
                if variant != word:
                    k_best.extend(k_best_beam(params, variant, k))
            k_best = sorted(k_best, key=lambda x: x[1], reverse=True)[:k]
    return k_best[:k]


# ---------------------------------------------------------------------------
# Training (HMMBuilder): hmm.py:263-447
# ---------------------------------------------------------------------------


def build_hmm_params(
    dictionary: Iterable[str],
    smoothing: float,
    character_set: Iterable[str],
    read_counts: Mapping[str, Mapping[str, float]],
    remove_chars: Sequence[str],
    gold_words,
    multichars=None,
) -> HMMParams:
    """Reference ``HMMBuilder`` (``hmm.py:266-447``) as a pure function.

    One deliberate divergence: the reference iterates Python *sets* when
    enumerating the final charset (``hmm.py:441``), so its state order —
    and therefore tie-breaks among equal/zero-probability candidates —
    depends on the process hash seed (nondeterministic across runs). We
    iterate ``sorted(charset)`` so training is deterministic; everywhere
    probabilities differ the outputs agree with the reference.

    ``gold_words`` is either the reference's word *stream* (a list with
    multiplicity) or a ``{word: count}`` mapping. Every use of the stream
    is an additive tally, so weighted counts are mathematically identical
    — the mapping form lets the Spark training path aggregate word counts
    distributed-side instead of re-materializing the 10^12-token stream
    in driver memory (groupBy(word).count() -> collect of the Zipf-bounded
    vocabulary only).
    """
    dictionary = list(dictionary)
    charset = set(character_set)
    remove = list(remove_chars)
    if isinstance(gold_words, Mapping):
        gold_word_counts: Dict[str, int] = dict(gold_words)
    else:
        gold_word_counts = {}
        for w in gold_words:
            gold_word_counts[w] = gold_word_counts.get(w, 0) + 1

    # _generate_confusion (hmm.py:301-328)
    confusion: Dict[str, Dict[str, float]] = {
        key: dict(value) for key, value in read_counts.items() if len(key) == 1
    }
    for unwanted in remove:
        confusion.pop(unwanted, None)
    for outer in confusion:
        inner = confusion[outer]
        for key in [kk for kk in inner if len(kk) != 1]:
            del inner[key]
        for unwanted in remove:
            inner.pop(unwanted, None)

    # _text_char_counts (hmm.py:332-351): the reference filters the text
    # char counts against the *configured* (pre-union) characterSet inside
    # _text_char_counts, and only afterwards unions the charset with the
    # surviving count keys + confusion keys (hmm.py:285). Gold/dictionary
    # characters outside the configured charset therefore do NOT become
    # HMM states (they can still appear as emission columns via confusion
    # inner keys). Pinned by test_builder_out_of_charset_gold_char.
    char_count: Dict[str, float] = {}
    for word, wn in gold_word_counts.items():
        for ch in word:
            char_count[ch] = char_count.get(ch, 0) + wn
    for word in dictionary:
        for ch in word:
            char_count[ch] = char_count.get(ch, 0) + 1
    char_count = {c: v for c, v in char_count.items() if c in charset}
    for unwanted in remove:
        char_count.pop(unwanted, None)
    charset = charset | set(char_count) | set(confusion)

    # _emission_probabilities (hmm.py:357-404)
    for char in char_count:
        if char not in confusion:
            confusion[char] = {char: char_count[char]}
    inner_charset = set().union(*[set(confusion[i]) for i in confusion]) if confusion else set()
    for char in confusion:
        for missing in sorted(inner_charset):
            if missing not in confusion[char]:
                confusion[char][missing] = 0.0
    for i in confusion:
        denom = sum(confusion[i].values()) + smoothing * len(confusion[i])
        for j in confusion[i]:
            confusion[i][j] = (confusion[i][j] + smoothing) / denom
    extra_chars = charset - set(remove)
    for char in sorted(extra_chars):
        if char not in confusion:
            confusion[char] = {i: 0.0 for i in sorted(inner_charset)}
    for i in confusion:
        for char in sorted(extra_chars):
            if char not in confusion[i]:
                confusion[i][char] = 0.0
    for char in sorted(extra_chars):
        confusion[char][char] = 1.0
    for outer in list(confusion.keys()):
        if outer not in charset:
            del confusion[outer]
        else:
            for inner in list(confusion[outer].keys()):
                if inner not in charset:
                    del confusion[outer][inner]
    emis = confusion

    # _init_tran_probabilities (hmm.py:408-447)
    tran_counts: Dict[str, Dict[str, float]] = {}
    init_counts: Dict[str, float] = {}

    def add_word(w: str, wn: int = 1) -> None:
        if len(w) > 0:
            init_counts[w[0]] = init_counts.get(w[0], 0) + wn
            for a, b in zip(w, w[1:]):
                tran_counts.setdefault(a, {})[b] = tran_counts.get(a, {}).get(b, 0) + wn

    for word, wn in gold_word_counts.items():
        add_word(word, wn)
    for word in dictionary:
        add_word(word)
    for unwanted in remove:
        charset.discard(unwanted)
        init_counts.pop(unwanted, None)
        tran_counts.pop(unwanted, None)
        for i in tran_counts:
            tran_counts[i].pop(unwanted, None)

    ordered = sorted(charset)  # deterministic state order (see docstring)
    init_out: Dict[str, float] = {}
    tran_out: Dict[str, Dict[str, float]] = {}
    init_denom = sum(init_counts.values()) + smoothing * len(charset)
    for i in ordered:
        init_out[i] = (init_counts.get(i, 0) + smoothing) / init_denom
        row = tran_counts.get(i, {})
        tran_denom = sum(row.values()) + smoothing * len(charset)
        tran_out[i] = {j: (row.get(j, 0) + smoothing) / tran_denom for j in ordered}

    # Reorder emission rows to the state order for a clean dense matrix.
    emis_out = {i: emis.get(i, {}) for i in ordered}
    return HMMParams(init_out, tran_out, emis_out, multichars)
