"""mcnemar_test (hand 2x2 chi2, symmetric NULL, one-sided discordance,
non-boolean coercion) and contingency_chi2 (hand 2x2 quantized chi2,
exact-independence zero, single-category NULL V, null filtering,
margin/broadcast plan shape)."""

import pytest

from correctocr_spark.ops.textstats import contingency_chi2, mcnemar_test


def _mc(spark, both, only_a, only_b, neither):
    rows = (
        [(True, True)] * both
        + [(True, False)] * only_a
        + [(False, True)] * only_b
        + [(False, False)] * neither
    )
    df = spark.createDataFrame(rows, "a boolean, b boolean")
    return mcnemar_test(df, "a", "b").first()


class TestMcNemar:
    def test_hand_chi2(self, spark):
        # b=4, c=1: chi2 = (4-1)^2 / 5 = 1.8 -> 1800 milli
        r = _mc(spark, 3, 4, 1, 2)
        assert (r["n"], r["both_pass"], r["only_a"], r["only_b"]) == (
            10, 3, 4, 1,
        )
        assert r["chi2_milli"] == 1800

    def test_no_discordance_null(self, spark):
        r = _mc(spark, 5, 0, 0, 5)
        assert r["chi2_milli"] is None

    def test_one_sided(self, spark):
        # b=3, c=0: chi2 = 9/3 = 3 -> 3000 milli
        r = _mc(spark, 0, 3, 0, 0)
        assert r["chi2_milli"] == 3000

    def test_symmetric_zero(self, spark):
        r = _mc(spark, 1, 2, 2, 1)
        assert r["chi2_milli"] == 0


def _chi(spark, cells):
    rows = [(r, c) for (r, c, n) in cells for _ in range(n)]
    df = spark.createDataFrame(rows, "r string, c string")
    return contingency_chi2(df, "r", "c").first()


class TestContingency:
    def test_hand_2x2(self, spark):
        # [[10,20],[30,40]]: r=(30,70), c=(40,60), N=100
        # t = (1000*100*O^2) div (r*c): 8333+22222+32142+38095 = 100792
        r = _chi(
            spark,
            [("a", "x", 10), ("a", "y", 20), ("b", "x", 30), ("b", "y", 40)],
        )
        assert (r["n"], r["n_row_cats"], r["n_col_cats"], r["dof"]) == (
            100, 2, 2, 1,
        )
        assert r["chi2_milli"] == 792
        assert r["v2_micro"] == (1000 * 792) // (100 * 1)

    def test_exact_independence_zero(self, spark):
        # [[2,4],[3,6]] is exactly independent and every quantized
        # term is exact, so chi2 is exactly zero
        r = _chi(
            spark,
            [("a", "x", 2), ("a", "y", 4), ("b", "x", 3), ("b", "y", 6)],
        )
        assert r["chi2_milli"] == 0 and r["v2_micro"] == 0

    def test_single_category_null_v(self, spark):
        r = _chi(spark, [("a", "x", 3), ("b", "x", 5)])
        assert r["dof"] == 0
        assert r["chi2_milli"] == 0
        assert r["v2_micro"] is None

    def test_nulls_dropped(self, spark):
        df = spark.createDataFrame(
            [("a", "x"), ("a", None), (None, "x"), ("b", "y")],
            "r string, c string",
        )
        assert contingency_chi2(df, "r", "c").first()["n"] == 2

    def test_perfect_association(self, spark):
        # diagonal table: V^2 == 1 up to the per-cell floor
        r = _chi(spark, [("a", "x", 7), ("b", "y", 9)])
        assert r["v2_micro"] == pytest.approx(1_000_000, abs=2_000)

    def test_margin_joins_broadcast(self, spark):
        df = spark.createDataFrame(
            [("a", "x", 1)] * 4, "r string, c string, n int"
        )
        plan = contingency_chi2(df, "r", "c")._jdf.queryExecution().toString()
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
