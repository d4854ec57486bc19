"""Unit tests for the nonparametric/panel batch: wasserstein_1d
(constant-shift identity + python CDF twin), fleiss_kappa (python
definition twin, perfect/degenerate agreement), friedman_test
(classic no-ties formula twin, complete-block filter, tie NULL),
theil_sen (brute-force pair-median twin, exact-line slopes)."""

import math

import pytest

from correctocr_spark.ops.temporal import theil_sen
from correctocr_spark.ops.textstats import (
    fleiss_kappa,
    friedman_test,
    wasserstein_1d,
)


class TestWasserstein:
    def _df(self, spark, a_vals, b_vals):
        rows = [("a", v) for v in a_vals] + [("b", v) for v in b_vals]
        return spark.createDataFrame(rows, "g string, v long")

    def test_constant_shift_reads_the_shift(self, spark):
        """b = a + 37 elementwise -> W1 exactly 37.000."""
        a = [10, 50, 90, 200, 440]
        df = self._df(spark, a, [v + 37 for v in a])
        r = wasserstein_1d(df, "g", "v", "a", "b").collect()[0]
        assert r["w1_milli"] == 37_000

    def test_matches_python_cdf_twin(self, spark):
        a = [(i * 13) % 29 for i in range(40)]
        b = [(i * 7) % 31 + 3 for i in range(25)]
        df = self._df(spark, a, b)
        r = wasserstein_1d(df, "g", "v", "a", "b").collect()[0]
        vals = sorted(set(a) | set(b))
        na, nb = len(a), len(b)
        num = 0
        for s, nxt in zip(vals, vals[1:]):
            cuma = sum(1 for x in a if x <= s)
            cumb = sum(1 for x in b if x <= s)
            num += abs(nb * cuma - na * cumb) * (nxt - s)
        assert (r["n_a"], r["n_b"], r["w1_num"]) == (na, nb, num)
        assert r["w1_milli"] == (1000 * num) // (na * nb)
        # agrees with the textbook mean-|sorted-quantile-diff| on
        # equal-sized samples
        if na == nb:
            w1 = sum(abs(x - y) for x, y in zip(sorted(a), sorted(b))) / na
            assert abs(r["w1_milli"] / 1000 - w1) < 1e-9

    def test_equal_sized_quantile_identity(self, spark):
        a = [3, 9, 1, 14, 7, 7]
        b = [5, 2, 11, 8, 20, 2]
        r = wasserstein_1d(
            self._df(spark, a, b), "g", "v", "a", "b"
        ).collect()[0]
        w1 = sum(abs(x - y) for x, y in zip(sorted(a), sorted(b))) / len(a)
        assert r["w1_milli"] == math.floor(1000 * w1)

    def test_empty_group_null(self, spark):
        r = wasserstein_1d(
            self._df(spark, [1, 2], []), "g", "v", "a", "b"
        ).collect()[0]
        assert r["w1_milli"] is None


class TestFleiss:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            [(i, *r) for i, r in enumerate(rows)],
            "i long, r1 string, r2 string, r3 string",
        )

    def test_matches_python_twin(self, spark):
        rows = [
            ("a", "a", "a"), ("a", "a", "b"), ("b", "b", "b"),
            ("c", "b", "b"), ("a", "c", "a"), ("b", "b", "a"),
            ("c", "c", "c"), ("a", "a", "a"),
        ]
        r = fleiss_kappa(
            self._df(spark, rows), "i", ["r1", "r2", "r3"]
        ).collect()[0]
        n = 3
        N = len(rows)
        cats = sorted({c for row in rows for c in row})
        nij = [
            [sum(1 for c in row if c == j) for j in cats] for row in rows
        ]
        A = sum(c * c for row in nij for c in row)
        B = sum(sum(row[j] for row in nij) ** 2 for j in range(len(cats)))
        assert (r["n_subjects"], r["n_raters"]) == (N, n)
        assert (r["sum_nij_sq"], r["cat_mass_sq"]) == (A, B)
        pbar = (A - N * n) / (N * n * (n - 1))
        pe = B / (N * n) ** 2
        assert r["kappa_milli"] == math.floor(
            1000 * (pbar - pe) / (1 - pe)
        )
        # sanity: the classic statsmodels-style float kappa agrees
        assert abs(r["kappa_milli"] / 1000 - (pbar - pe) / (1 - pe)) < 2e-3

    def test_perfect_agreement_with_mixed_cats(self, spark):
        rows = [("a", "a", "a"), ("b", "b", "b"), ("c", "c", "c")]
        r = fleiss_kappa(
            self._df(spark, rows), "i", ["r1", "r2", "r3"]
        ).collect()[0]
        assert r["kappa_milli"] == 1000

    def test_single_category_null(self, spark):
        rows = [("a", "a", "a"), ("a", "a", "a")]
        r = fleiss_kappa(
            self._df(spark, rows), "i", ["r1", "r2", "r3"]
        ).collect()[0]
        assert r["kappa_milli"] is None

    def test_null_votes_dropped_and_validation(self, spark):
        df = spark.createDataFrame(
            [(0, "a", "a", "a"), (1, "a", None, "b")],
            "i long, r1 string, r2 string, r3 string",
        )
        r = fleiss_kappa(df, "i", ["r1", "r2", "r3"]).collect()[0]
        assert r["n_subjects"] == 1
        with pytest.raises(ValueError):
            fleiss_kappa(df, "i", ["r1"])


class TestFriedman:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "b string, t string, v long")

    def test_classic_no_ties_formula(self, spark):
        """No ties: Q == 12/(nk(k+1))·ΣR_j² − 3n(k+1)."""
        data = {
            "b1": [3, 1, 2], "b2": [2, 1, 3], "b3": [3, 2, 1],
            "b4": [3, 1, 2], "b5": [2, 1, 3],
        }
        rows = [
            (b, f"t{j}", v) for b, vs in data.items()
            for j, v in enumerate(vs)
        ]
        r = friedman_test(self._df(spark, rows), "b", "t", "v").collect()[0]
        n, k = 5, 3
        # within-block ranks ARE the values here (values 1..3)
        Rj = [sum(data[b][j] for b in data) for j in range(k)]
        q = 12.0 / (n * k * (k + 1)) * sum(x * x for x in Rj) - 3 * n * (
            k + 1
        )
        assert (r["n_blocks"], r["k"]) == (n, k)
        assert abs(r["q_milli"] / 1000 - q) < 2e-3

    def test_matches_python_twin_with_ties(self, spark):
        data = {
            "b1": [5, 5, 9], "b2": [1, 4, 4], "b3": [7, 2, 7],
            "b4": [3, 3, 3],
        }
        rows = [
            (b, f"t{j}", v) for b, vs in data.items()
            for j, v in enumerate(vs)
        ]
        r = friedman_test(self._df(spark, rows), "b", "t", "v").collect()[0]
        k = 3
        n = len(data)
        r2 = {}
        sumsq = 0
        for b, vs in data.items():
            for j, v in enumerate(vs):
                rank_min = 1 + sum(1 for x in vs if x < v)
                cnt_eq = sum(1 for x in vs if x == v)
                d = 2 * rank_min + cnt_eq - 1
                r2[j] = r2.get(j, 0) + d
                sumsq += d * d
        S = sum((r2[j] - n * (k + 1)) ** 2 for j in range(k))
        D = sumsq - n * k * (k + 1) ** 2
        assert (r["s_num"], r["d_den"]) == (S, D)
        assert r["q_milli"] == math.floor(1000.0 * (k - 1) * S / D)

    def test_incomplete_blocks_dropped(self, spark):
        rows = [
            ("b1", "t0", 1), ("b1", "t1", 2),
            ("b2", "t0", 5), ("b2", "t1", 3),
            ("b3", "t0", 9),  # missing t1 -> dropped
        ]
        r = friedman_test(self._df(spark, rows), "b", "t", "v").collect()[0]
        assert r["n_blocks"] == 2 and r["k"] == 2

    def test_all_tied_null(self, spark):
        rows = [("b1", "t0", 4), ("b1", "t1", 4), ("b2", "t0", 7),
                ("b2", "t1", 7)]
        r = friedman_test(self._df(spark, rows), "b", "t", "v").collect()[0]
        assert r["d_den"] == 0 and r["q_milli"] is None


class TestTheilSen:
    def _series(self, spark, ys):
        return spark.createDataFrame(
            list(enumerate(ys)), "t long, y long"
        )

    def test_exact_line(self, spark):
        ys = [7 + 3 * t for t in range(6)]
        r = theil_sen(self._series(spark, ys), "t", "y").collect()[0]
        assert r["n_pairs"] == 15
        assert r["slope2_milli"] == 2 * 3000

    def test_matches_bruteforce_twin(self, spark):
        ys = [3, 11, 4, 9, 15, 2, 8, 12]
        r = theil_sen(self._series(spark, ys), "t", "y").collect()[0]
        slopes = sorted(
            math.floor(1000.0 * (ys[j] - ys[i]) / (j - i))
            for i in range(len(ys))
            for j in range(i + 1, len(ys))
        )
        m = len(slopes)
        lo = slopes[(m + 1) // 2 - 1]
        hi = slopes[(m + 2) // 2 - 1]
        assert (r["n_points"], r["n_pairs"]) == (len(ys), m)
        assert r["slope2_milli"] == lo + hi

    def test_negative_slope_floor(self, spark):
        """Down-trend: per-pair floor is toward -inf, twin must agree."""
        ys = [20, 15, 13, 6, 2]
        r = theil_sen(self._series(spark, ys), "t", "y").collect()[0]
        slopes = sorted(
            math.floor(1000.0 * (ys[j] - ys[i]) / (j - i))
            for i in range(len(ys))
            for j in range(i + 1, len(ys))
        )
        m = len(slopes)
        assert r["slope2_milli"] == (
            slopes[(m + 1) // 2 - 1] + slopes[(m + 2) // 2 - 1]
        )
        assert r["slope2_milli"] < 0

    def test_single_point(self, spark):
        r = theil_sen(self._series(spark, [5]), "t", "y").collect()[0]
        assert r["n_points"] == 1 and r["n_pairs"] == 0
        assert r["slope2_milli"] is None
