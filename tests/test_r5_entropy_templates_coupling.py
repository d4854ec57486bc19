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
