"""mannwhitney_test (hand doubled mid-ranks / U / z with ties, shifted
distribution sign, all-tied NULL, empty group NULL) and range_bounds
(hand cut points under skew, uniform keys, every-split-covered, P<2
rejection, heavy single key spanning several splits)."""

import math

import pytest

from correctocr_spark.ops.cleaning import range_bounds
from correctocr_spark.ops.textstats import mannwhitney_test


def _mw(spark, a, b):
    rows = [("a", s) for s in a] + [("b", s) for s in b]
    df = spark.createDataFrame(rows, "grp string, score long")
    return mannwhitney_test(df, "grp", "score", "a", "b").first()


class TestMannWhitney:
    def test_hand_with_ties(self, spark):
        # a=[1,2,3], b=[2,3,4]: doubled mid-ranks 2,5,9,12
        # r2a = 2+5+9 = 16, u2_a = 16 - 12 = 4 (U=2)
        # tsum = 6+6 = 12, Var = (9/12)(7 - 12/30) = 4.95
        # z = (2 - 4.5)/sqrt(4.95) = -1.1236.. -> floor 1000z = -1124
        r = _mw(spark, [1, 2, 3], [2, 3, 4])
        assert (r["n_a"], r["n_b"], r["u2_a"]) == (3, 3, 4)
        assert r["z_milli"] == math.floor(1000 * (2 - 4.5) / math.sqrt(4.95))
        assert r["z_milli"] == -1124

    def test_shift_direction(self, spark):
        hi = _mw(spark, [10, 11, 12], [1, 2, 3])
        lo = _mw(spark, [1, 2, 3], [10, 11, 12])
        assert hi["u2_a"] == 2 * 9 and lo["u2_a"] == 0
        assert hi["z_milli"] > 0 > lo["z_milli"]

    def test_all_tied_null_z(self, spark):
        r = _mw(spark, [5, 5], [5, 5])
        assert r["z_milli"] is None
        # mid-rank of all four is 2.5 -> r2a = 2*5, u2 = 10 - 6 = 4
        assert r["u2_a"] == 4

    def test_empty_group_null(self, spark):
        df = spark.createDataFrame([("a", 1)], "grp string, score long")
        r = mannwhitney_test(df, "grp", "score", "a", "b").first()
        assert r["z_milli"] is None and r["n_b"] == 0

    def test_other_groups_ignored(self, spark):
        rows = [("a", 1), ("b", 2), ("z", 99)]
        df = spark.createDataFrame(rows, "grp string, score long")
        r = mannwhitney_test(df, "grp", "score", "a", "b").first()
        assert (r["n_a"], r["n_b"]) == (1, 1)


class TestRangeBounds:
    def _bounds(self, spark, keys, p):
        df = spark.createDataFrame([(k,) for k in keys], "k long")
        return {
            r["split_idx"]: (r["bound_key"], r["cum_rows"])
            for r in range_bounds(df, "k", p).collect()
        }

    def test_hand_skewed(self, spark):
        got = self._bounds(spark, [1, 1, 1, 2, 3, 4, 5, 6, 7, 8], 4)
        # N=10: split i cuts at min k with 4*cum >= 10i
        assert got == {1: (1, 3), 2: (3, 5), 3: (6, 8)}

    def test_uniform_exact_quarters(self, spark):
        got = self._bounds(spark, list(range(1, 9)), 4)
        assert got == {1: (2, 2), 2: (4, 4), 3: (6, 6)}

    def test_heavy_key_spans_multiple_splits(self, spark):
        # one key holding 90% of rows absorbs every interior split
        got = self._bounds(spark, [7] * 9 + [9], 4)
        assert got == {1: (7, 9), 2: (7, 9), 3: (7, 9)}

    def test_all_splits_present(self, spark):
        got = self._bounds(spark, list(range(100)), 16)
        assert sorted(got) == list(range(1, 16))
        # each tile holds >= floor(N/P) rows
        cums = [0] + [got[i][1] for i in sorted(got)] + [100]
        assert all(b - a >= 100 // 16 for a, b in zip(cums, cums[1:]))

    def test_p_below_two_rejected(self, spark):
        df = spark.createDataFrame([(1,)], "k long")
        with pytest.raises(ValueError):
            range_bounds(df, "k", 1)
