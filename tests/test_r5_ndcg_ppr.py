"""Session probes for ndcg_eval and personalized_pagerank — hand
simulations plus the lemmas the fixture oracle can't see: trec_eval
edge semantics (unjudged gain-0, empty-retrieval queries, idcg-0 NULL)
and PPR's proximity-to-seeds property vs global PageRank."""

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# ndcg_eval
# ---------------------------------------------------------------------------


def _ndcg_simulate(ranking, qrels, k):
    disc = [round(1_000_000 / math.log2(r + 1)) for r in range(1, k + 1)]
    rel = {(q, d): g for q, d, g in qrels}
    out = {}
    qs = {q for q, _, _ in qrels} | {q for q, _, _ in ranking}
    for q in qs:
        dcg = judged = 0
        for q2, d, r in ranking:
            if q2 == q and r <= k:
                g = rel.get((q, d))
                if g is not None:
                    judged += 1
                dcg += ((1 << (g or 0)) - 1) * disc[r - 1]
        ideal = sorted(
            ((g, d) for (q2, d), g in rel.items() if q2 == q and g > 0),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        idcg = sum(((1 << g) - 1) * disc[i] for i, (g, _) in enumerate(ideal))
        ndcg = (10000 * dcg) // idcg if idcg > 0 else None
        out[q] = (dcg, idcg, judged, ndcg)
    return out


class TestNdcgEval:
    # q0: perfect ordering; q1: inverted; q2: judged but never
    # retrieved (dcg 0); q3: retrieved but zero positive qrels (NULL)
    RANKING = [
        (0, "a", 1), (0, "b", 2), (0, "x", 3),
        (1, "d", 1), (1, "c", 2),
        (3, "z", 1),
    ]
    QRELS = [
        (0, "a", 3), (0, "b", 1),
        (1, "c", 2), (1, "d", 1),
        (2, "e", 2),
        (3, "z", 0),
    ]

    def _dfs(self, spark):
        return (
            spark.createDataFrame(self.RANKING, "query_id long, doc_id string, rank long"),
            spark.createDataFrame(self.QRELS, "query_id long, doc_id string, rel long"),
        )

    def test_matches_simulation(self, spark):
        from correctocr_spark.ops.similarity import ndcg_eval

        r, j = self._dfs(spark)
        got = {
            row["query_id"]: (
                row["dcg_micro"], row["idcg_micro"],
                row["judged_in_topk"], row["ndcg_bp"],
            )
            for row in ndcg_eval(r, j, k=3).collect()
        }
        assert got == _ndcg_simulate(self.RANKING, self.QRELS, 3)
        # perfect ordering ≡ ideal: exactly 10000 bp
        assert got[0][3] == 10000
        # inverted ordering strictly below
        assert got[1][3] < 10000
        # judged-never-retrieved query present at dcg 0, ndcg 0
        assert got[2][0] == 0 and got[2][3] == 0
        # all-zero-rel query: idcg 0 → NULL, not 0
        assert got[3][1] == 0 and got[3][3] is None

    def test_k_cuts_both_sides(self, spark):
        """k bounds the scored prefix AND the ideal: a rank-4 hit can't
        score at k=3, and the ideal at k=1 keeps only the best grade."""
        from correctocr_spark.ops.similarity import ndcg_eval

        r, j = self._dfs(spark)
        got = {
            row["query_id"]: row
            for row in ndcg_eval(r, j, k=1).collect()
        }
        sim = _ndcg_simulate(self.RANKING, self.QRELS, 1)
        assert {q: (v["dcg_micro"], v["idcg_micro"], v["judged_in_topk"], v["ndcg_bp"])
                for q, v in got.items()} == sim
        # q0 at k=1: retrieved a (rel 3) first, ideal is a — still 10000
        assert got[0]["ndcg_bp"] == 10000

    def test_validation(self, spark):
        from correctocr_spark.ops.similarity import ndcg_eval

        r, j = self._dfs(spark)
        with pytest.raises(ValueError, match="k >= 1"):
            ndcg_eval(r, j, k=0)

    def test_discounts_are_shared_constants(self):
        from correctocr_spark.ops.similarity import ndcg_discounts

        d = ndcg_discounts(3)
        assert d == [1_000_000, round(1_000_000 / math.log2(3)), 500_000]
        assert d[0] > d[1] > d[2]


# ---------------------------------------------------------------------------
# personalized_pagerank
# ---------------------------------------------------------------------------


def _ppr_simulate(edges, seeds, iterations, base=1_000_000, damping=85):
    e = sorted(set(edges))
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    od = {}
    for s, _ in e:
        od[s] = od.get(s, 0) + 1
    rank = {n: (base if n in seeds else 0) for n in nodes}
    for _ in range(iterations):
        inc = {n: 0 for n in nodes}
        for s, d in e:
            inc[d] += rank[s] // od[s]
        rank = {
            n: (base if n in seeds else 0) + (damping * inc[n]) // 100
            for n in nodes
        }
    return rank


class TestPersonalizedPagerank:
    # a chain 0→1→2→3 plus a disconnected pair 8→9
    EDGES = [(0, 1), (1, 2), (2, 3), (8, 9), (0, 1)]

    def _dfs(self, spark, seeds):
        e = spark.createDataFrame(self.EDGES, "src long, dst long")
        s = spark.createDataFrame([(x,) for x in seeds], "node long")
        return e, s

    def test_matches_simulation(self, spark):
        from correctocr_spark.ops.graph import personalized_pagerank

        e, s = self._dfs(spark, [0])
        got = {r["node"]: r["rank"] for r in personalized_pagerank(e, s, iterations=4).collect()}
        assert got == _ppr_simulate(self.EDGES, {0}, 4)

    def test_unreachable_nodes_rank_zero(self, spark):
        from correctocr_spark.ops.graph import personalized_pagerank

        e, s = self._dfs(spark, [0])
        got = {r["node"]: r["rank"] for r in personalized_pagerank(e, s, iterations=4).collect()}
        assert got[8] == 0 and got[9] == 0
        # proximity decay along the chain from the seed
        assert got[0] >= got[1] > got[2] > got[3] > 0

    def test_proximity_not_popularity(self, spark):
        """Global pagerank gives 9 (an in-degree-1 node) nonzero base
        mass; PPR seeded at 0 gives it exactly nothing — the property
        separating the two operators."""
        from correctocr_spark.ops.graph import pagerank, personalized_pagerank

        e, s = self._dfs(spark, [0])
        pr = {r["node"]: r["rank"] for r in pagerank(e, iterations=3).collect()}
        ppr = {r["node"]: r["rank"] for r in personalized_pagerank(e, s, iterations=3).collect()}
        assert pr[9] > 0 and ppr[9] == 0

    def test_seed_absent_from_graph_ignored(self, spark):
        from correctocr_spark.ops.graph import personalized_pagerank

        e, s = self._dfs(spark, [0, 777])
        got = {r["node"]: r["rank"] for r in personalized_pagerank(e, s, iterations=2).collect()}
        assert 777 not in got
        assert got == _ppr_simulate(self.EDGES, {0}, 2)

    def test_validation(self, spark):
        from correctocr_spark.ops.graph import personalized_pagerank

        e, s = self._dfs(spark, [0])
        with pytest.raises(ValueError, match="iterations >= 1"):
            personalized_pagerank(e, s, iterations=0)
