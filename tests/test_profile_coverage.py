"""dedup_profile (hand-labeled clusters: singleton accounting,
min-id-canonical mass, savings arithmetic) and coverage_diff (hand url
sets: backlog vs off-plan, per-host bp, 0/0 honesty)."""

from pyspark.sql import functions as F

from correctocr_spark.ops.dedup import dedup_profile
from correctocr_spark.ops.filters import coverage_diff


class TestDedupProfile:
    def test_hand_labeled(self, spark):
        # cluster 1: docs 1,2,3 (masses 10,20,30; canonical=1 keeps 10)
        # cluster 5: docs 5,6 (masses 5,7; canonical=5 keeps 5)
        # doc 9 (mass 100): singleton — NOT in the component table
        docs = spark.createDataFrame(
            [(1, 10), (2, 20), (3, 30), (5, 5), (6, 7), (9, 100)],
            "doc_id long, w long",
        )
        comp = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1), (5, 5), (6, 5)],
            "doc_id long, component long",
        )
        got = {
            r["cluster_size"]: (
                r["n_clusters"],
                r["n_docs"],
                r["total_mass"],
                r["removable_docs"],
                r["removable_mass"],
            )
            for r in dedup_profile(docs, comp, weight_col="w").collect()
        }
        assert got[3] == (1, 3, 60, 2, 50)
        assert got[2] == (1, 2, 12, 1, 7)
        assert got[1] == (1, 1, 100, 0, 0)

    def test_rowcount_weight_default(self, spark):
        docs = spark.createDataFrame([(1,), (2,)], "doc_id long")
        comp = spark.createDataFrame([(1, 1), (2, 1)], "doc_id long, component long")
        r = dedup_profile(docs, comp).collect()[0]
        assert (r["cluster_size"], r["total_mass"], r["removable_mass"]) == (2, 2, 1)


class TestCoverageDiff:
    def test_backlog_offplan_bp(self, spark):
        disc = spark.createDataFrame(
            [("https://a.ex/1",), ("https://a.ex/2",), ("https://a.ex/2",),
             ("https://b.ex/1",)],
            "url string",
        )
        crawl = spark.createDataFrame(
            [("https://a.ex/1",), ("https://a.ex/9",), ("https://c.ex/1",)],
            "url string",
        )
        got = {r["host"]: r for r in coverage_diff(disc, crawl).collect()}
        a = got["a.ex"]
        # a.ex: discovered {1,2} (dup collapsed), crawled {1,9}
        assert (a["n_discovered"], a["n_crawled"], a["n_both"]) == (2, 2, 1)
        assert (a["n_backlog"], a["n_offplan"]) == (1, 1)
        assert a["coverage_bp"] == 5000
        b = got["b.ex"]
        assert (b["n_discovered"], b["n_crawled"], b["coverage_bp"]) == (1, 0, 0)
        c = got["c.ex"]
        # never discovered: coverage is NULL, not a fabricated 0/0
        assert (c["n_discovered"], c["n_offplan"]) == (0, 1)
        assert c["coverage_bp"] is None

    def test_identical_sets_full_coverage(self, spark):
        urls = spark.createDataFrame([("https://x.ex/1",)], "url string")
        r = coverage_diff(urls, urls).collect()[0]
        assert (r["n_both"], r["n_backlog"], r["n_offplan"], r["coverage_bp"]) == (
            1, 0, 0, 10000,
        )
