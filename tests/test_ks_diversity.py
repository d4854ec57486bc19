"""ks_test (hand CDF sims, identical→0, disjoint→1000, smallest-argmax
tie-break, empty group NULL) and ngram_diversity (hand gram counts,
all-distinct vs degenerate, short docs, group split)."""

from pyspark.sql import functions as F

from correctocr_spark.ops.textstats import ks_test, ngram_diversity


class TestKsTest:
    def _run(self, spark, a_scores, b_scores):
        rows = [("a", s) for s in a_scores] + [("b", s) for s in b_scores]
        df = spark.createDataFrame(rows, "grp string, score long")
        return ks_test(df, "grp", "score", "a", "b").first()

    def test_identical_distributions_zero(self, spark):
        r = self._run(spark, [1, 2, 3], [1, 2, 3])
        assert (r["n_a"], r["n_b"], r["d_milli"]) == (3, 3, 0)

    def test_disjoint_distributions_full(self, spark):
        r = self._run(spark, [1, 2], [10, 20])
        assert r["d_milli"] == 1000
        # max gap first reached at the largest a-score
        assert r["at_score"] == 2

    def test_hand_simulated(self, spark):
        a, b = [1, 1, 2, 4], [2, 3, 3, 4]
        # cdf_a over scores 1..4: 2/4, 3/4, 3/4, 4/4
        # cdf_b:                  0/4, 1/4, 3/4, 4/4
        # gaps*16:                8,   8,   0,   0 → D = 8/16 = 0.5
        r = self._run(spark, a, b)
        assert r["d_milli"] == 500 and r["at_score"] == 1

    def test_empty_group_null(self, spark):
        df = spark.createDataFrame([("a", 1)], "grp string, score long")
        r = ks_test(df, "grp", "score", "a", "b").first()
        assert r["d_milli"] is None

    def test_other_groups_ignored(self, spark):
        rows = [("a", 1), ("b", 1), ("z", 99)]
        df = spark.createDataFrame(rows, "grp string, score long")
        r = ks_test(df, "grp", "score", "a", "b").first()
        assert (r["n_a"], r["n_b"], r["d_milli"]) == (1, 1, 0)


class TestNgramDiversity:
    def test_hand_counts(self, spark):
        df = spark.createDataFrame(
            [(1, "a b a b"), (2, "a b c")], "doc_id long, text string"
        )
        got = {
            r["n"]: (r["total_grams"], r["distinct_grams"], r["distinct_bp"])
            for r in ngram_diversity(df, ns=(1, 2)).collect()
        }
        # unigrams: a,b,a,b,a,b,c → 7 total, 3 distinct
        assert got[1] == (7, 3, (10000 * 3) // 7)
        # bigrams: "a b","b a","a b" + "a b","b c" → 5 total, 3 distinct
        assert got[2] == (5, 3, 6000)

    def test_degenerate_repetition_low_bp(self, spark):
        df = spark.createDataFrame(
            [(1, "spam " * 50)], "doc_id long, text string"
        )
        got = {r["n"]: r["distinct_bp"] for r in ngram_diversity(df, ns=(1, 2)).collect()}
        assert got[1] == (10000 * 1) // 50
        assert got[2] == (10000 * 1) // 49

    def test_short_docs_skip_higher_orders(self, spark):
        df = spark.createDataFrame([(1, "solo")], "doc_id long, text string")
        rows = ngram_diversity(df, ns=(1, 2)).collect()
        ns = {r["n"] for r in rows}
        assert ns == {1}  # no bigram row at all: nothing to count

    def test_group_split(self, spark):
        df = spark.createDataFrame(
            [(1, "x", "a a"), (2, "y", "a b")],
            "doc_id long, lang string, text string",
        )
        got = {
            (r["grp"], r["n"]): r["distinct_grams"]
            for r in ngram_diversity(df, ns=(1,), group_col="lang").collect()
        }
        assert got[("x", 1)] == 1 and got[("y", 1)] == 2
