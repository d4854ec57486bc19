"""Session probes for char_entropy, path_templates and
bibliographic_coupling — python simulations on hand-sized inputs
pinning quantization, regex grammar corners and the coupling/cocitation
duality the oracle fixture can't isolate."""

import math
import re
from collections import Counter

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# char_entropy
# ---------------------------------------------------------------------------


def _entropy_simulate(text):
    chars = list(text)
    n = len(chars)
    counts = Counter(chars)
    micro = sum(
        round(-(k / n) * math.log(k / n) * 1_000_000.0) for k in counts.values()
    )
    return (n, len(counts), micro)


class TestCharEntropy:
    def test_matches_simulation(self, spark):
        from correctocr_spark.ops.textstats import char_entropy

        docs = [
            (1, "aaaa"),                     # zero entropy
            (2, "ab"),                       # ln 2, quantized per term
            (3, "the quick brown fox\njumps"),  # newline is a codepoint
            (4, "héllo wörld — naïve"),      # non-ASCII codepoints
            (5, "0123456789abcdef" * 4),     # flat wide alphabet: high
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["n_chars"], r["n_distinct"], r["entropy_micro"])
            for r in char_entropy(df).collect()
        }
        assert got == {i: _entropy_simulate(t) for i, t in docs}
        assert got[1] == (4, 1, 0)
        # -(1/2)ln(1/2)*1e6 rounds to 346574 per char, summed AFTER
        # quantization (the reduction-order-proof discipline)
        assert got[2] == (2, 2, 693148)
        # ordering sanity: repeated-char spam scores far below both the
        # english sentence and the flat hex alphabet (ln 16 ≈ 2.77 nats)
        assert got[1][2] < min(got[3][2], got[5][2])
        assert got[5][2] == round(math.log(16) * 1_000_000 / 16) * 16

    def test_empty_and_null_drop(self, spark):
        from correctocr_spark.ops.textstats import char_entropy

        df = spark.createDataFrame(
            [(1, ""), (2, None), (3, "x")], "doc_id long, text string"
        )
        got = {r["doc_id"] for r in char_entropy(df).collect()}
        assert got == {3}

    def test_no_shuffle_in_plan(self, spark):
        """The op's whole point at 100 TB: the histogram is row-local,
        so the optimized plan contains NO Exchange."""
        from correctocr_spark.ops.textstats import char_entropy

        df = spark.range(10).select(
            F.col("id").alias("doc_id"), F.lit("some text").alias("text")
        )
        plan = (
            char_entropy(df)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert "Exchange" not in plan and "Repartition" not in plan


# ---------------------------------------------------------------------------
# path_templates
# ---------------------------------------------------------------------------


def _template_simulate(urls, min_pages=1):
    rows = []
    for u in urls:
        m = re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)([^?#]*)", u)
        host = re.sub(r":\d+$", "", (m.group(1) if m else "")).lower()
        path = (m.group(2) if m else "") or "/"
        tpl = re.sub(r"[0-9]+", "{n}", re.sub(r"[0-9a-fA-F]{16,}", "{h}", path))
        rows.append((host, path, tpl))
    agg = {}
    for host, path, tpl in rows:
        n, paths = agg.get((host, tpl), (0, set()))
        paths.add(path)
        agg[(host, tpl)] = (n + 1, paths)
    totals = Counter()
    for (host, _), (n, _) in agg.items():
        totals[host] += n
    return {
        (host, tpl): (n, len(paths), n * 10000 // totals[host])
        for (host, tpl), (n, paths) in agg.items()
        if n >= min_pages
    }


class TestPathTemplates:
    URLS = [
        "https://a.com/item1.html",
        "https://a.com/item2.html",
        "https://a.com/item2.html",          # same path twice: n_paths=2
        "https://A.COM:8080/item9.html",     # case + port fold into a.com
        "https://a.com/about",
        "https://a.com/session/0123456789abcdef0123/view",  # hex -> {h}
        "https://b.org",                     # no path at all -> '/'
        "https://b.org/?page=2",             # query stripped -> '/'
        "ftp://b.org/pub/file7.txt",
    ]

    def test_matches_simulation(self, spark):
        from correctocr_spark.ops.webindex import path_templates

        df = spark.createDataFrame([(u,) for u in self.URLS], "url string")
        got = {
            (r["host"], r["template"]): (
                r["n_pages"], r["n_paths"], r["host_share_bp"]
            )
            for r in path_templates(df).collect()
        }
        assert got == _template_simulate(self.URLS)
        assert got[("a.com", "/item{n}.html")] == (4, 3, 6666)
        assert got[("a.com", "/session/{h}/view")][0] == 1
        assert got[("b.org", "/")] == (2, 1, 6666)

    def test_min_pages_gate(self, spark):
        from correctocr_spark.ops.webindex import path_templates

        df = spark.createDataFrame([(u,) for u in self.URLS], "url string")
        got = {
            (r["host"], r["template"])
            for r in path_templates(df, min_pages=2).collect()
        }
        assert got == {
            k for k, v in _template_simulate(self.URLS).items() if v[0] >= 2
        }

    def test_trap_host_dominated_by_one_template(self, spark):
        """The motivating signal: a session-id trap host shows one {h}
        template absorbing its whole page budget with all-distinct
        paths."""
        from correctocr_spark.ops.webindex import path_templates

        urls = [
            f"https://trap.net/s/{i:032x}/cal" for i in range(50)
        ] + ["https://trap.net/about"]
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        got = {
            r["template"]: (r["n_pages"], r["n_paths"], r["host_share_bp"])
            for r in path_templates(df).collect()
        }
        assert got["/s/{h}/cal"] == (50, 50, 9803)


# ---------------------------------------------------------------------------
# path_prefix_census
# ---------------------------------------------------------------------------


def _prefix_simulate(urls, max_depth=3, min_pages=1):
    agg = Counter()
    for u in urls:
        m = re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)([^?#]*)", u)
        host = re.sub(r":\d+$", "", (m.group(1) if m else "")).lower()
        path = (m.group(2) if m else "") or "/"
        segs = [s for s in path.split("/") if s]
        agg[(host, 0, "/")] += 1
        for d in range(1, min(len(segs), max_depth) + 1):
            agg[(host, d, "/" + "/".join(segs[:d]))] += 1
    return {k: n for k, n in agg.items() if n >= min_pages}


class TestPathPrefixCensus:
    URLS = [
        "https://a.com/",
        "https://a.com/docs",
        "https://a.com/docs/",                    # trailing slash folds
        "https://a.com/docs/guide/ch1/sec2",      # depth 4 > cap 3
        "https://A.COM:8080/docs/guide?x=1",      # case/port/query fold
        "https://a.com/about",
        "https://b.org",                          # bare host -> '/'
        "ftp://b.org/pub/file7.txt",
        "not a url",                              # unparseable -> ('', '/')
    ]

    def test_matches_simulation(self, spark):
        from correctocr_spark.ops.webindex import path_prefix_census

        df = spark.createDataFrame([(u,) for u in self.URLS], "url string")
        got = {
            (r["host"], r["depth"], r["prefix"]): r["n_pages"]
            for r in path_prefix_census(df).collect()
        }
        assert got == _prefix_simulate(self.URLS)
        # every page counts at depth 0; deeper pages roll up into every
        # ancestor; the depth-4 leaf never appears
        assert got[("a.com", 0, "/")] == 6
        assert got[("a.com", 1, "/docs")] == 4
        assert got[("a.com", 2, "/docs/guide")] == 2
        assert got[("a.com", 3, "/docs/guide/ch1")] == 1
        assert not any(d > 3 for (_, d, _p) in got)

    def test_min_pages_and_depth_cap(self, spark):
        from correctocr_spark.ops.webindex import path_prefix_census

        df = spark.createDataFrame([(u,) for u in self.URLS], "url string")
        got = {
            (r["host"], r["depth"], r["prefix"]): r["n_pages"]
            for r in path_prefix_census(df, max_depth=1, min_pages=2).collect()
        }
        assert got == _prefix_simulate(self.URLS, max_depth=1, min_pages=2)
        assert all(n >= 2 for n in got.values())

    def test_bad_max_depth_raises(self, spark):
        import pytest

        from correctocr_spark.ops.webindex import path_prefix_census

        df = spark.createDataFrame([("https://a.com/x",)], "url string")
        with pytest.raises(ValueError):
            path_prefix_census(df, max_depth=0)

    def test_single_shuffle_bounded_fanout(self, spark):
        """100 TB shape: ONE Exchange (the count agg) and a literal
        array explode — no per-segment unbounded Generate feeding a
        second shuffle."""
        from correctocr_spark.ops.webindex import path_prefix_census

        df = spark.range(10).select(
            F.concat(F.lit("https://h.com/a/b/c/d/e"), F.col("id")).alias("url")
        )
        plan = (
            path_prefix_census(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange") == 1


# ---------------------------------------------------------------------------
# bibliographic_coupling
# ---------------------------------------------------------------------------


class TestBibliographicCoupling:
    EDGES = [
        ("p1", "x"), ("p1", "y"), ("p1", "z"),
        ("p2", "x"), ("p2", "y"),            # shares {x, y} with p1
        ("p3", "x"),                          # shares only {x}: below min
        ("p4", "y"), ("p4", "z"),            # shares {y, z} with p1
        ("p5", "p5"),                         # self-loop dropped
        ("p1", "x"),                          # duplicate edge collapses
    ]

    def test_shared_outlink_pairs(self, spark):
        from correctocr_spark.ops.graph import bibliographic_coupling

        df = spark.createDataFrame(self.EDGES, "src string, dst string")
        got = {
            (r["src_a"], r["src_b"]): r["n_common"]
            for r in bibliographic_coupling(df, min_common=2, max_in=None)
            .collect()
        }
        assert got == {("p1", "p2"): 2, ("p1", "p4"): 2}

    def test_max_in_drops_universal_target(self, spark):
        from correctocr_spark.ops.graph import bibliographic_coupling

        edges = self.EDGES + [(f"p{i}", "cdn") for i in range(1, 6)]
        df = spark.createDataFrame(edges, "src string, dst string")
        # uncapped: cdn adds +1 common to every source pair
        unc = {
            (r["src_a"], r["src_b"]): r["n_common"]
            for r in bibliographic_coupling(df, min_common=2, max_in=None)
            .collect()
        }
        assert unc[("p1", "p2")] == 3 and unc[("p2", "p3")] == 2
        # capped at in-degree 4: cdn (cited by 5) is excluded, exactly
        # the no-cdn answer
        cap = {
            (r["src_a"], r["src_b"]): r["n_common"]
            for r in bibliographic_coupling(df, min_common=2, max_in=4)
            .collect()
        }
        assert cap == {("p1", "p2"): 2, ("p1", "p4"): 2}

    def test_duality_with_cocitation(self, spark):
        """coupling(E) must equal cocitation(Eᵀ) — the wrapper's whole
        contract — on a corpus-shaped random-ish graph."""
        from correctocr_spark.ops.graph import bibliographic_coupling, cocitation

        edges = [
            (f"s{i % 7}", f"t{(i * 3 + 1) % 11}") for i in range(60)
        ]
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {
            (r["src_a"], r["src_b"]): r["n_common"]
            for r in bibliographic_coupling(df, min_common=1, max_in=None)
            .collect()
        }
        rev = df.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
        want = {
            (r["dst_a"], r["dst_b"]): r["n_common"]
            for r in cocitation(rev, min_common=1, max_out=None).collect()
        }
        assert got == want and got


# ---------------------------------------------------------------------------
# bitext_candidates
# ---------------------------------------------------------------------------


_URL_SPLIT = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)([^?#]*)")


def _bitext_simulate(urls, langs, max_variants=8):
    seg = re.compile(r"(?i)/(" + "|".join(langs) + r")(?:-[A-Za-z]{2})?(/|$)")
    rows = set()
    for u in urls:
        m = _URL_SPLIT.match(u)
        host = re.sub(r":\d+$", "", (m.group(1) if m else "")).lower()
        path = (m.group(2) if m else "") or "/"
        lm = seg.search(path)
        if not lm:
            continue
        rows.add((host + seg.sub(r"/{lang}\2", path), lm.group(1).lower(), u))
    by_skel = Counter(r[0] for r in rows)
    keep = {s for s, n in by_skel.items() if 2 <= n <= max_variants}
    return {
        (sa, la, ua, lb, ub)
        for (sa, la, ua) in rows
        for (sb, lb, ub) in rows
        if sa == sb and sa in keep and ua < ub and la != lb
    }


class TestBitextCandidates:
    URLS = [
        "https://a.com/en/about",            # en<->fr<->de triple
        "https://a.com/fr/about",
        "https://a.com/de/about",
        "https://a.com/EN/news",             # case-insensitive segment
        "https://a.com/fr/news",
        "https://b.org/en-US/p/1",           # region collapses to 'en'
        "https://b.org/en-GB/p/1",           # same lang -> NO pair
        "https://b.org/fr-CA/p/1",           # fr pairs with both en docs
        "https://c.net/to/page",             # 'to' not a lang code
        "https://c.net/entry/page",          # 'en' must match a SEGMENT
        "https://c.net/plain",               # no lang -> out
        "https://d.io/en",                   # path-final segment form
        "https://d.io/fr",
    ]

    def test_matches_simulation(self, spark):
        from correctocr_spark.ops.webindex import BITEXT_LANGS, bitext_candidates

        df = spark.createDataFrame([(u,) for u in self.URLS], "url string")
        got = {tuple(r) for r in bitext_candidates(df).collect()}
        want = _bitext_simulate(self.URLS, BITEXT_LANGS)
        assert got == want
        # the region-suffix collapse: en-US<->en-GB excluded, each
        # pairs with fr-CA; the bare-segment /en <-> /fr pair exists
        langs_at_b = {(r[1], r[3]) for r in got if r[0].startswith("b.org")}
        assert langs_at_b == {("en", "fr"), ("fr", "en")} & langs_at_b
        assert len([r for r in got if r[0].startswith("b.org")]) == 2
        assert any(r[0] == "d.io/{lang}" for r in got)
        assert not any("c.net" in r[0] for r in got)
        assert all(r[2] < r[4] and r[1] != r[3] for r in got)

    def test_max_variants_cap_drops_hub(self, spark):
        from correctocr_spark.ops.webindex import bitext_candidates

        hub = [f"https://h.com/en/hub?sid={i}" for i in range(6)] + [
            "https://h.com/fr/hub?x=1",
            "https://h.com/de/hub",
        ]
        good = ["https://h.com/en/a", "https://h.com/fr/a"]
        df = spark.createDataFrame([(u,) for u in hub + good], "url string")
        # query strings fold away: the 8 hub urls share one skeleton
        # (> max_variants=4) and are dropped wholesale; /a survives
        got = {tuple(r) for r in bitext_candidates(df, max_variants=4).collect()}
        assert got == {
            ("h.com/{lang}/a", "en", "https://h.com/en/a", "fr", "https://h.com/fr/a")
        }

    def test_bad_params_raise(self, spark):
        import pytest

        from correctocr_spark.ops.webindex import bitext_candidates

        df = spark.createDataFrame([("https://a.com/en/x",)], "url string")
        with pytest.raises(ValueError):
            bitext_candidates(df, max_variants=1)
        with pytest.raises(ValueError):
            bitext_candidates(df, langs=("en", "F R"))

    def test_entry_lang_alt_mirrors_package(self):
        """The oracle's inline alternation must stay equal to the
        package's BITEXT_LANGS so the two grammars can't drift."""
        import __spark_entry__ as entry

        from correctocr_spark.ops.webindex import BITEXT_LANGS

        assert entry.BITEXT_LANG_ALT == "|".join(BITEXT_LANGS)


# ---------------------------------------------------------------------------
# novelty_scores
# ---------------------------------------------------------------------------


def _doc_shingles(text, k=3):
    words = text.split()
    if not words:
        return set()
    return {
        " ".join(words[i : i + k])
        for i in range(0, max(len(words) - k, 0) + 1)
    }


def _novelty_simulate(docs, k=3):
    first = {}
    for did, text in sorted(docs):
        for s in _doc_shingles(text, k):
            first.setdefault(s, did)
    out = {}
    for did, text in docs:
        sh = _doc_shingles(text, k)
        novel = sum(1 for s in sh if first[s] == did)
        bp = (novel * 10000) // len(sh) if sh else None
        out[did] = (len(sh), novel, bp)
    return out


class TestNoveltyScores:
    DOCS = [
        (1, "alpha beta gamma delta epsilon"),   # all 3 shingles novel
        (2, "beta gamma delta zeta eta theta"),  # overlaps doc 1
        (3, "alpha beta gamma delta epsilon"),   # exact dup: 0 novel
        (4, "iota kappa"),                       # < k words: 1 whole shingle
        (5, ""),                                 # no shingles: NULL bp
        (6, "beta gamma delta zeta unique tail"),  # partial overlap w/ 2
    ]

    def test_matches_simulation(self, spark):
        from correctocr_spark.ops.textstats import novelty_scores

        df = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["n_shingles"], r["n_novel"], r["novelty_bp"])
            for r in novelty_scores(df).collect()
        }
        assert got == _novelty_simulate(self.DOCS)
        # arrival-order attribution: doc 1 owns everything it contains,
        # the exact dup scores 0, the empty doc decides nothing
        assert got[1] == (3, 3, 10000)
        assert got[3] == (3, 0, 0)
        assert got[4] == (1, 1, 10000)
        assert got[5] == (0, 0, None)
        assert len(got) == len(self.DOCS)  # every input doc returned

    def test_min_id_wins_regardless_of_row_order(self, spark):
        from correctocr_spark.ops.textstats import novelty_scores

        docs = list(reversed(self.DOCS))  # physical order must not matter
        df = spark.createDataFrame(docs, "doc_id long, text string").repartition(7)
        got = {
            r["doc_id"]: (r["n_shingles"], r["n_novel"], r["novelty_bp"])
            for r in novelty_scores(df).collect()
        }
        assert got == _novelty_simulate(self.DOCS)

    def test_bad_k_raises(self, spark):
        import pytest

        from correctocr_spark.ops.textstats import novelty_scores

        df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        with pytest.raises(ValueError):
            novelty_scores(df, k=0)
