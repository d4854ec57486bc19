"""Session probes for triangle_count, pmi_collocations and
host_mirrors — driver-side simulations on hand-sized inputs, skew/
orientation edge cases, and plan-shape pins the oracle can't see."""

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# triangle_count
# ---------------------------------------------------------------------------


def _tri_simulate(edges):
    """Brute-force per-node triangle count over the simple projection."""
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in und for n in e})
    adj = {n: set() for n in nodes}
    for u, v in und:
        adj[u].add(v)
        adj[v].add(u)
    tri = {n: 0 for n in nodes}
    for u, v in und:
        for w in adj[u] & adj[v]:
            tri[u] += 1
            tri[v] += 1
    # each node is counted twice per triangle (once per incident edge
    # of that triangle) — normalize
    tri = {n: c // 2 for n, c in tri.items()}
    out = {}
    for n in nodes:
        d = len(adj[n])
        coeff = (2 * tri[n] * 1_000_000) // (d * (d - 1)) if d >= 2 else 0
        out[n] = (d, tri[n], coeff)
    return out


class TestTriangleCount:
    def test_matches_bruteforce_with_noise(self, spark):
        from correctocr_spark.ops.graph import triangle_count

        edges = [
            ("a", "b"), ("b", "c"), ("a", "c"),   # triangle
            ("c", "d"),                           # pendant
            ("b", "a"),                           # reversed dup
            ("a", "a"),                           # self-loop
            ("a", "b"),                           # exact dup
        ]
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {
            r["node"]: (r["degree"], r["triangles"], r["coeff_ppm"])
            for r in triangle_count(df).collect()
        }
        assert got == _tri_simulate(edges)
        assert got["a"] == (2, 1, 1_000_000)
        assert got["c"] == (3, 1, 333_333)
        assert got["d"] == (1, 0, 0)

    def test_hub_star_with_one_closing_edge(self, spark):
        """Degree-ordered orientation: the hub must not pivot wedges —
        all its edges point INTO it, so the wedge fan-out stays at the
        leaves and the single leaf-leaf edge closes exactly one
        triangle."""
        from correctocr_spark.ops.graph import triangle_count

        edges = [("hub", f"x{i}") for i in range(20)] + [("x0", "x1")]
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {
            r["node"]: (r["degree"], r["triangles"], r["coeff_ppm"])
            for r in triangle_count(df).collect()
        }
        assert got == _tri_simulate(edges)
        assert got["hub"] == (20, 1, (2 * 1_000_000) // (20 * 19))
        assert got["x0"] == (2, 1, 1_000_000)
        assert got["x5"] == (1, 0, 0)

    def test_two_cliques_sharing_a_vertex(self, spark):
        from correctocr_spark.ops.graph import triangle_count
        from itertools import combinations

        k4a = [f"a{i}" for i in range(4)]
        k4b = ["a0"] + [f"b{i}" for i in range(3)]
        edges = list(combinations(k4a, 2)) + list(combinations(k4b, 2))
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {
            r["node"]: (r["degree"], r["triangles"], r["coeff_ppm"])
            for r in triangle_count(df).collect()
        }
        assert got == _tri_simulate(edges)
        # shared vertex: 3 triangles per K4 = 6, degree 6
        assert got["a0"] == (6, 6, (12 * 1_000_000) // 30)

    def test_intermediates_registered(self, spark):
        from correctocr_spark.ops.cache import release_intermediates
        from correctocr_spark.ops.graph import triangle_count

        df = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("a", "c")], "src string, dst string"
        )
        out = triangle_count(df)
        out.collect()
        assert release_intermediates(out) >= 3


# ---------------------------------------------------------------------------
# pmi_collocations
# ---------------------------------------------------------------------------


def _pmi_simulate(texts, min_count, top_k):
    from collections import Counter

    grams = Counter()
    for t in texts:
        ws = [w for w in t.split() if w]
        for i in range(len(ws) - 1):
            grams[(ws[i], ws[i + 1])] += 1
    n = sum(grams.values())
    left = Counter()
    right = Counter()
    for (w1, w2), c in grams.items():
        left[w1] += c
        right[w2] += c
    rows = []
    for (w1, w2), c in grams.items():
        if c < min_count:
            continue
        x = (c * n) / (left[w1] * right[w2])
        micro = math.log(x) * 1_000_000.0
        # Java/DuckDB round: half away from zero
        q = math.floor(micro + 0.5) if micro >= 0 else math.ceil(micro - 0.5)
        rows.append((w1, w2, c, q))
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    return rows[:top_k]


class TestPmiCollocations:
    TEXTS = (
        ["new york is a big city"] * 6
        + ["york new haven line"] * 3
        + ["a a a a"] * 4
        + ["big apple new york"] * 2
    )

    def _docs(self, spark):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(self.TEXTS)], "doc_id long, text string"
        )

    def test_matches_simulation(self, spark):
        from correctocr_spark.ops.textstats import pmi_collocations

        got = [
            (r["w1"], r["w2"], r["cnt"], r["pmi_micro"])
            for r in pmi_collocations(
                self._docs(spark), min_count=2, top_k=10
            ).collect()
        ]
        want = _pmi_simulate(self.TEXTS, min_count=2, top_k=10)
        assert sorted(got) == sorted(want)
        # the cut respects the (pmi desc, w1, w2) order
        assert got == want

    def test_min_count_gates_hapax_pairs(self, spark):
        from correctocr_spark.ops.textstats import pmi_collocations

        out = pmi_collocations(self._docs(spark), min_count=3, top_k=100)
        cnts = [r["cnt"] for r in out.collect()]
        assert cnts and min(cnts) >= 3

    def test_top_k_cut_is_take_ordered(self, spark):
        """The global cut must be TakeOrderedAndProject (per-partition
        heaps), never a full Sort + GlobalLimit."""
        from correctocr_spark.ops.textstats import pmi_collocations

        out = pmi_collocations(self._docs(spark), min_count=2, top_k=5)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan

    def test_empty_and_single_word_docs(self, spark):
        from correctocr_spark.ops.textstats import pmi_collocations

        docs = spark.createDataFrame(
            [(1, ""), (2, "one"), (3, "   ")], "doc_id long, text string"
        )
        assert pmi_collocations(docs, min_count=1, top_k=10).count() == 0


# ---------------------------------------------------------------------------
# host_mirrors
# ---------------------------------------------------------------------------


class TestHostMirrors:
    def _docs(self, spark):
        corpus = [
            "alpha beta gamma delta epsilon zeta eta theta",
            "iota kappa lambda mu nu xi omicron pi",
            "rho sigma tau upsilon phi chi psi omega",
        ]
        rows = []
        for i, t in enumerate(corpus):
            rows.append((f"http://origin.example/p/{i}", t))
            rows.append((f"http://mirror.example/copy/{i}", t))  # full mirror
        rows.append(("http://other.example/q/0", "totally different words here"))
        return spark.createDataFrame(rows, "url string, text string")

    def test_full_mirror_found_at_10000_bp(self, spark):
        from correctocr_spark.ops.webindex import host_mirrors

        got = {
            (r["host_a"], r["host_b"]): r["match_bp"]
            for r in host_mirrors(self._docs(spark), min_match_bp=2500).collect()
        }
        assert got.get(("mirror.example", "origin.example")) == 10000
        # the unrelated host never pairs with anything
        assert all("other.example" not in k for k in got)

    def test_host_pair_ordering_and_threshold(self, spark):
        from correctocr_spark.ops.webindex import host_mirrors

        out = host_mirrors(self._docs(spark), min_match_bp=2500)
        for r in out.collect():
            assert r["host_a"] < r["host_b"]
            assert r["match_bp"] >= 2500

    def test_union_semantics_vs_doc_level(self, spark):
        """A host serving a SUPERSET of another host's docs still
        matches on the shared content share — union MinHash, not
        per-doc pairing."""
        from correctocr_spark.ops.webindex import host_mirrors

        shared = ["one two three four five six seven eight nine ten"]
        extra = ["completely unrelated extra page content words differ"]
        rows = [("http://small.example/0", shared[0])]
        rows += [
            (f"http://big.example/{i}", t)
            for i, t in enumerate(shared + extra)
        ]
        docs = spark.createDataFrame(rows, "url string, text string")
        got = {
            (r["host_a"], r["host_b"]): r["match_bp"]
            for r in host_mirrors(docs, min_match_bp=0).collect()
        }
        pair = got.get(("big.example", "small.example"))
        # candidates require a full band match; if banded, the estimate
        # must be strictly between 0 and 10000 (partial overlap)
        if pair is not None:
            assert 0 < pair < 10000

    def test_no_cartesian_in_plan(self, spark):
        from correctocr_spark.ops.webindex import host_mirrors

        out = host_mirrors(self._docs(spark), min_match_bp=2500)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan

    def test_unparseable_urls_dropped(self, spark):
        from correctocr_spark.ops.webindex import host_mirrors

        docs = spark.createDataFrame(
            [("not a url", "alpha beta gamma"), ("also-bad", "alpha beta gamma")],
            "url string, text string",
        )
        assert host_mirrors(docs, min_match_bp=0).count() == 0


# ---------------------------------------------------------------------------
# k_core
# ---------------------------------------------------------------------------


def _kcore_simulate(edges, k):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = {n for e in und for n in e}
    while True:
        deg = {n: 0 for n in nodes}
        for u, v in und:
            if u in nodes and v in nodes:
                deg[u] += 1
                deg[v] += 1
        keep = {n for n in nodes if deg[n] >= k}
        if keep == nodes:
            return {n: deg[n] for n in nodes}
        nodes = keep


class TestKCore:
    def test_two_round_peel_matches_simulation(self, spark):
        from correctocr_spark.ops.graph import k_core

        # triangle core + a two-hop pendant chain: e peels round 1,
        # d peels round 2
        edges = [
            ("a", "b"), ("b", "c"), ("a", "c"),
            ("c", "d"), ("d", "e"),
        ]
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {r["node"]: r["core_degree"] for r in k_core(df, k=2).collect()}
        assert got == _kcore_simulate(edges, 2)
        assert got == {"a": 2, "b": 2, "c": 2}

    def test_whole_graph_survives(self, spark):
        from correctocr_spark.ops.graph import k_core
        from itertools import combinations

        edges = list(combinations(["a", "b", "c", "d"], 2))
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {r["node"]: r["core_degree"] for r in k_core(df, k=3).collect()}
        assert got == {n: 3 for n in "abcd"}

    def test_empty_core(self, spark):
        from correctocr_spark.ops.graph import k_core

        # a path graph has no 2-core
        edges = [("a", "b"), ("b", "c"), ("c", "d")]
        df = spark.createDataFrame(edges, "src string, dst string")
        assert k_core(df, k=2).count() == 0

    def test_non_convergence_raises(self, spark):
        from correctocr_spark.ops.graph import k_core

        # a 6-chain needs 3 peel rounds for k=2; max_rounds=1 must
        # raise loudly, never return an under-peeled set
        edges = [(f"n{i}", f"n{i+1}") for i in range(6)]
        df = spark.createDataFrame(edges, "src string, dst string")
        with pytest.raises(RuntimeError, match="did not converge"):
            k_core(df, k=2, max_rounds=1)

    def test_k_validation(self, spark):
        from correctocr_spark.ops.graph import k_core

        df = spark.createDataFrame([("a", "b")], "src string, dst string")
        with pytest.raises(ValueError):
            k_core(df, k=0)


# ---------------------------------------------------------------------------
# host_script_audit
# ---------------------------------------------------------------------------


class TestHostScriptAudit:
    SPOOF = "pаypal.example"     # Cyrillic а inside a Latin label
    IDN = "почта.example"  # all-Cyrillic label

    def _pages(self, spark):
        rows = [
            ("http://plain.example/a",),
            (f"http://{self.SPOOF}/b",),
            (f"http://{self.IDN}/c",),
            ("http://xn--pypal-4ve.example/d",),
            ("http://plain.example/e",),   # dup host — one audit row
            ("not a url",),
        ]
        return spark.createDataFrame(rows, "url string")

    def test_flags(self, spark):
        from correctocr_spark.ops.webindex import host_script_audit

        got = {
            r["host"]: (
                r["n_labels"], r["n_punycode"], r["n_mixed_script"],
                r["n_nonlatin"], r["suspicious"],
            )
            for r in host_script_audit(self._pages(spark)).collect()
        }
        assert len(got) == 4  # distinct hosts, bad url dropped
        assert got["plain.example"] == (2, 0, 0, 0, False)
        assert got[self.SPOOF] == (2, 0, 1, 0, True)
        assert got[self.IDN] == (2, 0, 0, 1, False)
        assert got["xn--pypal-4ve.example"] == (2, 1, 0, 0, False)

    def test_greek_latin_mix_flagged(self, spark):
        from correctocr_spark.ops.webindex import host_script_audit

        # Greek omicron inside a Latin label
        host = "gοogle.example"
        df = spark.createDataFrame([(f"http://{host}/x",)], "url string")
        row = host_script_audit(df).collect()[0]
        assert row["n_mixed_script"] == 1 and row["suspicious"]

    def test_no_shuffle_beyond_distinct(self, spark):
        from correctocr_spark.ops.webindex import host_script_audit

        out = host_script_audit(self._pages(spark))
        plan = out._jdf.queryExecution().executedPlan().toString()
        # exactly one exchange family: the host distinct
        assert plan.count("Exchange hashpartitioning") <= 2


# ---------------------------------------------------------------------------
# trustrank
# ---------------------------------------------------------------------------


def _trustrank_simulate(edges, seeds, iterations=5, init=1_000_000,
                        base=150_000, damping=85):
    from collections import defaultdict

    e = sorted(set(edges))
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    seeds = set(seeds)
    outdeg = defaultdict(int)
    for s, _ in e:
        outdeg[s] += 1
    rank = {n: (init if n in seeds else 0) for n in nodes}
    for _ in range(iterations):
        inc = defaultdict(int)
        for s, d in e:
            inc[d] += rank[s] // outdeg[s]
        rank = {
            n: (base if n in seeds else 0) + (damping * inc[n]) // 100
            for n in nodes
        }
    return rank


class TestTrustRank:
    EDGES = [
        (1, 2), (2, 3), (3, 1), (4, 1), (4, 2), (5, 4), (1, 3), (2, 3),
        # a spam ring densely interlinked but unreachable from seeds
        (10, 11), (11, 12), (12, 10), (10, 12), (11, 10), (12, 11),
    ]

    def _frames(self, spark, seeds):
        e = spark.createDataFrame(self.EDGES, "src long, dst long")
        s = spark.createDataFrame([(x,) for x in seeds], "node long")
        return e, s

    def test_matches_simulation(self, spark):
        from correctocr_spark.ops.graph import trustrank

        e, s = self._frames(spark, [1])
        got = {r["node"]: r["rank"] for r in trustrank(e, s).collect()}
        assert got == _trustrank_simulate(self.EDGES, [1])

    def test_spam_ring_gets_zero_trust(self, spark):
        from correctocr_spark.ops.graph import trustrank

        e, s = self._frames(spark, [1])
        got = {r["node"]: r["rank"] for r in trustrank(e, s).collect()}
        # ring nodes are unreachable from the seed: zero trust despite
        # their dense interlinking; reachable nodes carry trust
        assert got[10] == got[11] == got[12] == 0
        assert got[2] > 0 and got[3] > 0

    def test_seed_outside_graph_is_ignored(self, spark):
        from correctocr_spark.ops.graph import trustrank

        e, s = self._frames(spark, [999])
        got = {r["node"]: r["rank"] for r in trustrank(e, s).collect()}
        assert set(got.values()) == {0}
        assert 999 not in got  # rank table covers graph nodes only


# ---------------------------------------------------------------------------
# cocitation
# ---------------------------------------------------------------------------


def _cocite_simulate(edges, min_common, max_out):
    from collections import defaultdict
    from itertools import combinations

    e = sorted({(s, d) for s, d in edges if s != d})
    out = defaultdict(set)
    for s, d in e:
        out[s].add(d)
    pairs = defaultdict(int)
    for s, ds in out.items():
        if max_out is not None and len(ds) > max_out:
            continue
        for a, b in combinations(sorted(ds), 2):
            pairs[(a, b)] += 1
    return {k: v for k, v in pairs.items() if v >= min_common}


class TestCocitation:
    EDGES = (
        [(f"s{i}", "tA") for i in range(5)]
        + [(f"s{i}", "tB") for i in range(5)]
        + [("s0", "tC"), ("s1", "tC")]
        + [("hubdir", f"t{i}") for i in range(30)]   # directory page
        + [("s0", "s0")]                             # self-loop noise
        + [("s1", "tA"), ("s1", "tB")]               # exact dups
    )

    def test_matches_simulation_with_cap(self, spark):
        from correctocr_spark.ops.graph import cocitation

        df = spark.createDataFrame(self.EDGES, "src string, dst string")
        got = {
            (r["dst_a"], r["dst_b"]): r["n_common"]
            for r in cocitation(df, min_common=2, max_out=10).collect()
        }
        assert got == _cocite_simulate(self.EDGES, 2, 10)
        assert got[("tA", "tB")] == 5
        assert got[("tA", "tC")] == 2
        # the directory page's 30-outlink pairs must NOT appear
        assert ("t0", "t1") not in got
        assert set(got) == {("tA", "tB"), ("tA", "tC"), ("tB", "tC")}

    def test_uncapped_includes_directory(self, spark):
        from correctocr_spark.ops.graph import cocitation

        df = spark.createDataFrame(self.EDGES, "src string, dst string")
        got = {
            (r["dst_a"], r["dst_b"]): r["n_common"]
            for r in cocitation(df, min_common=1, max_out=None).collect()
        }
        assert got == _cocite_simulate(self.EDGES, 1, None)
        assert ("t0", "t1") in got  # directory pairs present uncapped

    def test_validation(self, spark):
        from correctocr_spark.ops.graph import cocitation

        df = spark.createDataFrame([("a", "b")], "src string, dst string")
        with pytest.raises(ValueError):
            cocitation(df, min_common=0)


class TestSpamMass:
    def test_ring_maxes_and_invariant(self, spark):
        from correctocr_spark.ops.graph import spam_mass

        e = spark.createDataFrame(TestTrustRank.EDGES, "src long, dst long")
        s = spark.createDataFrame([(1,)], "node long")
        rows = {r["node"]: r for r in spam_mass(e, s).collect()}
        for n, r in rows.items():
            # TR <= PR component-wise => bp share in [0, 10000]
            assert 0 <= r["trust"] <= r["rank"]
            assert 0 <= r["spam_mass_bp"] <= 10000
        # the unreachable dense ring owes ALL its rank to spam
        assert rows[10]["spam_mass_bp"] == 10000
        assert rows[11]["spam_mass_bp"] == 10000
        # pages fed by the seed owe much less
        assert rows[2]["spam_mass_bp"] < 10000
        assert rows[3]["spam_mass_bp"] < rows[10]["spam_mass_bp"]
