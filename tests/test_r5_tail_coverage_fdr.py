"""Unit tests for the tail/coverage/multiplicity batch: pot_tail_fit
(moment twin + exponential-tail xi~0 sanity), capture_recapture
(textbook Chapman, zero-overlap, full-overlap), bh_fdr (brute-force
BH twin, all/none rejected), poisson_rate_test (binomial-z twin,
equal-rate null, exposure scaling)."""

import math

import pytest

from correctocr_spark.ops.textstats import (
    bh_fdr,
    capture_recapture,
    poisson_rate_test,
    pot_tail_fit,
)


class TestPotTail:
    def _df(self, spark, vals):
        return spark.createDataFrame([(v,) for v in vals], "v long")

    def test_matches_python_twin(self, spark):
        vals = [100, 650, 700, 810, 1000, 1500, 300, 601, 2500, 950]
        u = 600
        r = pot_tail_fit(self._df(spark, vals), "v", u).collect()[0]
        ys = [v - u for v in vals if v > u]
        n, s, s2 = len(ys), sum(ys), sum(y * y for y in ys)
        varnum = n * s2 - s * s
        ratio = (s * s * (n - 1)) / (n * varnum)
        assert (r["n"], r["n_exceed"]) == (len(vals), n)
        assert r["exceed_ppm"] == (1000000 * n) // len(vals)
        assert r["mean_excess_milli"] == (1000 * s) // n
        assert r["xi_milli"] == math.floor(1000.0 * 0.5 * (1.0 - ratio))
        assert r["sigma_milli"] == math.floor(
            1000.0 * 0.5 * (s / n) * (1.0 + ratio)
        )

    def test_exponential_tail_xi_near_zero(self, spark):
        """Geometric (discrete-exponential) exceedances: GPD xi ~ 0;
        the moment fit should land near it."""
        import random

        rng = random.Random(7)
        vals = [600 + int(-100 * math.log(rng.random())) + 1
                for _ in range(4000)]
        r = pot_tail_fit(self._df(spark, vals), "v", 600).collect()[0]
        assert abs(r["xi_milli"]) < 120
        assert abs(r["sigma_milli"] - r["mean_excess_milli"]) < 0.15 * r[
            "mean_excess_milli"
        ]

    def test_degenerate(self, spark):
        r = pot_tail_fit(self._df(spark, [100, 601]), "v", 600).collect()[0]
        assert r["n_exceed"] == 1 and r["xi_milli"] is None
        assert r["mean_excess_milli"] == 1000


class TestCaptureRecapture:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "a boolean, b boolean")

    def test_textbook_chapman(self, spark):
        """n_a=10, n_b=8, overlap 4 -> Chapman ((11*9)//5)-1 = 18."""
        rows = (
            [(True, True)] * 4 + [(True, False)] * 6
            + [(False, True)] * 4 + [(False, False)] * 10
        )
        r = capture_recapture(self._df(spark, rows), "a", "b").collect()[0]
        assert (r["n_a"], r["n_b"], r["n_both"]) == (10, 8, 4)
        assert r["chapman_est"] == (11 * 9) // 5 - 1
        se = math.sqrt(11 * 9 * (10 - 4) * (8 - 4) / (25 * 6))
        assert r["se_milli"] == math.floor(1000 * se)

    def test_zero_overlap_defined(self, spark):
        rows = [(True, False)] * 5 + [(False, True)] * 3
        r = capture_recapture(self._df(spark, rows), "a", "b").collect()[0]
        assert r["chapman_est"] == 6 * 4 - 1

    def test_full_overlap_population_seen(self, spark):
        """Identical detectors: est == n_a (nothing hidden) and SE 0."""
        rows = [(True, True)] * 7 + [(False, False)] * 3
        r = capture_recapture(self._df(spark, rows), "a", "b").collect()[0]
        assert r["chapman_est"] == (8 * 8) // 8 - 1 == 7
        assert r["se_milli"] == 0


class TestBhFdr:
    def _df(self, spark, ps):
        return spark.createDataFrame([(p,) for p in ps], "p long")

    @staticmethod
    def _twin(ps, alpha):
        m = len(ps)
        s = sorted(ps)
        best = None
        for i, p in enumerate(s, start=1):
            if p * m <= alpha * i:
                best = (p, i)
        if best is None:
            return 0, None
        p_star = best[0]
        return sum(1 for p in ps if p <= p_star), p_star

    def test_matches_bruteforce_twin(self, spark):
        ps = [1, 2, 2, 8, 30, 40, 200, 500, 900, 950, 12, 4]
        r = bh_fdr(self._df(spark, ps), "p", alpha_milli=50).collect()[0]
        nrej, pstar = self._twin(ps, 50)
        assert r["m"] == len(ps)
        assert (r["n_rejected"], r["p_threshold_milli"]) == (nrej, pstar)
        # BH rejects at least the Bonferroni set
        bonf = sum(1 for p in ps if p * len(ps) <= 50)
        assert r["n_rejected"] >= bonf

    def test_none_rejected(self, spark):
        r = bh_fdr(
            self._df(spark, [800, 900, 999]), "p", alpha_milli=50
        ).collect()[0]
        assert r["n_rejected"] == 0 and r["p_threshold_milli"] is None

    def test_all_rejected(self, spark):
        ps = [1, 5, 10, 20]
        r = bh_fdr(self._df(spark, ps), "p", alpha_milli=50).collect()[0]
        assert r["n_rejected"] == 4 and r["p_threshold_milli"] == 20
        with pytest.raises(ValueError):
            bh_fdr(self._df(spark, ps), "p", alpha_milli=0)


class TestPoissonRate:
    def _df(self, spark, ka, kb):
        rows = [("a",)] * ka + [("b",)] * kb
        return spark.createDataFrame(rows, "g string")

    def test_matches_binomial_twin(self, spark):
        ka, kb, ta, tb = 37, 22, 2, 3
        r = poisson_rate_test(
            self._df(spark, ka, kb), "g", "a", "b", ta, tb
        ).collect()[0]
        w = ta / (ta + tb)
        k = ka + kb
        z = (ka - k * w) / math.sqrt(k * w * (1 - w))
        assert r["z_milli"] == math.floor(1000.0 * z)
        assert r["rate_ratio_milli"] == (1000 * ka * tb) // (kb * ta)

    def test_equal_rates_near_zero(self, spark):
        r = poisson_rate_test(
            self._df(spark, 50, 50), "g", "a", "b", 1, 1
        ).collect()[0]
        assert r["z_milli"] == 0 and r["rate_ratio_milli"] == 1000

    def test_exposure_normalizes(self, spark):
        """Double counts under double exposure is NOT a rate change."""
        r = poisson_rate_test(
            self._df(spark, 80, 40), "g", "a", "b", 2, 1
        ).collect()[0]
        assert r["rate_ratio_milli"] == 1000
        assert abs(r["z_milli"]) <= 1  # floor dust around 0
        with pytest.raises(ValueError):
            poisson_rate_test(self._df(spark, 1, 1), "g", "a", "b", 0, 1)

    def test_empty_null(self, spark):
        df = spark.createDataFrame([("c",)], "g string")
        r = poisson_rate_test(df, "g", "a", "b").collect()[0]
        assert r["z_milli"] is None and r["rate_ratio_milli"] is None
