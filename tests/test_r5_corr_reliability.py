"""Unit tests for the correlation/reliability/retrieval-eval batch:
pearson_corr (python moment twin + hand case), cronbach_alpha
(textbook definition twin on floats, checked against the integer
numerators), mrr_eval (hand-ranked case + miss/empty semantics),
autocorrelation (statsmodels-convention python twin). Integer twins
use truncate-toward-zero div (Spark `div` == DuckDB `//`)."""

import math

import pytest

from correctocr_spark.ops.similarity import mrr_eval
from correctocr_spark.ops.temporal import autocorrelation
from correctocr_spark.ops.textstats import cronbach_alpha, pearson_corr


class TestPearson:
    def test_perfect_line(self, spark):
        """y = 3x + 1 -> r_milli exactly 1000."""
        df = spark.createDataFrame(
            [(x, 3 * x + 1) for x in range(10)], "x long, y long"
        )
        r = pearson_corr(df, "x", "y").collect()[0]
        assert r["r_milli"] == 1000
        assert r["cov_num"] ** 2 == r["varx_num"] * r["vary_num"]

    def test_perfect_negative(self, spark):
        df = spark.createDataFrame(
            [(x, -2 * x) for x in range(8)], "x long, y long"
        )
        r = pearson_corr(df, "x", "y").collect()[0]
        # floor(1000 * -1.0) == -1000 exactly (cov/sqrt product is
        # the exact integer ratio -1 here)
        assert r["r_milli"] == -1000

    def test_matches_python_twin(self, spark):
        data = [(i, (i * 7) % 13 + (i // 3)) for i in range(50)]
        df = spark.createDataFrame(data, "x long, y long")
        r = pearson_corr(df, "x", "y").collect()[0]
        n = len(data)
        sx = sum(x for x, _ in data)
        sy = sum(y for _, y in data)
        sxy = sum(x * y for x, y in data)
        sxx = sum(x * x for x, _ in data)
        syy = sum(y * y for _, y in data)
        cov = n * sxy - sx * sy
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        assert (r["n"], r["cov_num"], r["varx_num"], r["vary_num"]) == (
            n, cov, vx, vy,
        )
        if cov * cov == vx * vy:
            assert r["r_milli"] == (1000 if cov >= 0 else -1000)
        else:
            assert r["r_milli"] == math.floor(
                1000.0 * cov / (math.sqrt(vx) * math.sqrt(vy))
            )
        # sanity vs the closed-form float r
        rf = cov / math.sqrt(vx * vy)
        assert abs(r["r_milli"] / 1000.0 - rf) < 2e-3

    def test_groups_and_degenerate(self, spark):
        rows = [("a", x, 2 * x) for x in range(5)] + [
            ("b", 4, y) for y in range(5)
        ]
        df = spark.createDataFrame(rows, "g string, x long, y long")
        out = {r["grp"]: r for r in pearson_corr(df, "x", "y", "g").collect()}
        assert out["a"]["r_milli"] == 1000
        # group b: zero x-variance -> NULL
        assert out["b"]["varx_num"] == 0 and out["b"]["r_milli"] is None

    def test_null_rows_dropped(self, spark):
        df = spark.createDataFrame(
            [(1, 2), (2, 4), (None, 9), (3, None), (3, 6)],
            "x long, y long",
        )
        r = pearson_corr(df, "x", "y").collect()[0]
        assert r["n"] == 3 and r["r_milli"] == 1000


class TestCronbach:
    def test_textbook_definition_twin(self, spark):
        """alpha == k/(k-1) * (1 - sum(var_i)/var_total) with population
        variances — checked through the integer numerators."""
        items = [
            (3, 4, 3), (5, 4, 5), (1, 2, 2), (4, 3, 4), (2, 2, 1),
            (5, 5, 4), (3, 3, 3), (4, 5, 5),
        ]
        df = spark.createDataFrame(items, "a long, b long, c long")
        r = cronbach_alpha(df, ["a", "b", "c"]).collect()[0]
        n, k = len(items), 3
        cols = list(zip(*items))
        tot = [sum(row) for row in items]

        def varnum(xs):
            return n * sum(x * x for x in xs) - sum(xs) ** 2

        ivs = sum(varnum(c) for c in cols)
        tv = varnum(tot)
        assert (r["n"], r["k"]) == (n, k)
        assert (r["items_var_num"], r["total_var_num"]) == (ivs, tv)
        expected = 1000.0 * (k / (k - 1)) * (1.0 - ivs / tv)
        assert r["alpha_milli"] == math.floor(expected)
        # and the float alpha from plain population variances agrees
        mean = lambda xs: sum(xs) / len(xs)
        var = lambda xs: mean([(x - mean(xs)) ** 2 for x in xs])
        alpha_f = (k / (k - 1)) * (
            1 - sum(var(list(c)) for c in cols) / var(tot)
        )
        assert abs(r["alpha_milli"] / 1000.0 - alpha_f) < 2e-3

    def test_perfectly_parallel_items(self, spark):
        """Items identical up to shift: total var = k^2 * item var ->
        alpha exactly 1."""
        df = spark.createDataFrame(
            [(x, x + 1) for x in range(6)], "a long, b long"
        )
        r = cronbach_alpha(df, ["a", "b"]).collect()[0]
        assert 4 * r["items_var_num"] // 2 == r["total_var_num"] * 1
        assert r["alpha_milli"] == 1000

    def test_validation_and_degenerate(self, spark):
        df = spark.createDataFrame([(1, 2)], "a long, b long")
        with pytest.raises(ValueError):
            cronbach_alpha(df, ["a"])
        assert cronbach_alpha(df, ["a", "b"]).collect()[0][
            "alpha_milli"
        ] is None  # n == 1


class TestMrr:
    def _rk(self, spark, rows):
        return spark.createDataFrame(
            rows, "query_id long, doc_id long, rank long"
        )

    def _qr(self, spark, rows):
        return spark.createDataFrame(rows, "query_id long, doc_id long")

    def test_hand_case(self, spark):
        """q0 first hit at rank 2, q1 at rank 1, q2 no hit in top-k,
        q3 only in qrels (empty retrieval)."""
        ranking = self._rk(
            spark,
            [(0, 10, 1), (0, 11, 2), (0, 12, 3),
             (1, 20, 1), (2, 30, 1), (2, 31, 2)],
        )
        qrels = self._qr(
            spark, [(0, 11), (0, 12), (1, 20), (2, 99), (3, 77)]
        )
        r = mrr_eval(ranking, qrels, k=10).collect()[0]
        assert r["n_queries"] == 4 and r["n_hit"] == 2
        assert r["sum_rr_micro"] == 1_000_000 // 2 + 1_000_000
        assert r["mrr_micro"] == (1_500_000) // 4

    def test_k_cutoff(self, spark):
        """A hit at rank 3 disappears at k=2."""
        ranking = self._rk(spark, [(0, 1, 1), (0, 2, 2), (0, 3, 3)])
        qrels = self._qr(spark, [(0, 3)])
        assert mrr_eval(ranking, qrels, k=10).collect()[0]["n_hit"] == 1
        r2 = mrr_eval(ranking, qrels, k=2).collect()[0]
        assert r2["n_hit"] == 0 and r2["mrr_micro"] == 0
        with pytest.raises(ValueError):
            mrr_eval(ranking, qrels, k=0)

    def test_min_rank_not_first_join_row(self, spark):
        """Two relevant docs -> reciprocal of the BEST rank."""
        ranking = self._rk(spark, [(0, 1, 4), (0, 2, 7)])
        qrels = self._qr(spark, [(0, 2), (0, 1)])
        r = mrr_eval(ranking, qrels, k=10).collect()[0]
        assert r["sum_rr_micro"] == 1_000_000 // 4


class TestAutocorrelation:
    def _series(self, spark, ys):
        return spark.createDataFrame(
            list(enumerate(ys)), "t long, y long"
        )

    def test_matches_python_twin(self, spark):
        ys = [3, 7, 4, 9, 2, 8, 5, 10, 1, 6, 7, 3]
        out = {
            r["lag"]: r
            for r in autocorrelation(
                self._series(spark, ys), "t", "y", max_lag=4
            ).collect()
        }
        n, s = len(ys), sum(ys)
        d = [n * y - s for y in ys]
        den = sum(x * x for x in d)
        for lag in range(1, 5):
            num = sum(d[t] * d[t + lag] for t in range(n - lag))
            r = out[lag]
            assert (r["n"], r["n_pairs"], r["num"], r["den"]) == (
                n, n - lag, num, den,
            )
            assert r["acf_milli"] == math.floor(1000.0 * num / den)
            # statsmodels-convention float acf agrees
            mean = s / n
            acf_f = sum(
                (ys[t] - mean) * (ys[t + lag] - mean)
                for t in range(n - lag)
            ) / sum((y - mean) ** 2 for y in ys)
            assert abs(r["acf_milli"] / 1000.0 - acf_f) < 2e-3

    def test_constant_series_null(self, spark):
        out = autocorrelation(
            self._series(spark, [5, 5, 5, 5]), "t", "y", max_lag=2
        ).collect()
        assert all(r["acf_milli"] is None for r in out)
        assert all(r["den"] == 0 for r in out)

    def test_lag_past_series_end(self, spark):
        """max_lag >= n: empty pair set -> num 0, acf 0 (den > 0)."""
        out = {
            r["lag"]: r
            for r in autocorrelation(
                self._series(spark, [1, 9]), "t", "y", max_lag=3
            ).collect()
        }
        assert len(out) == 3
        assert out[2]["n_pairs"] == 0 and out[2]["acf_milli"] == 0
        assert out[1]["n_pairs"] == 1
        with pytest.raises(ValueError):
            autocorrelation(self._series(spark, [1, 2]), "t", "y", max_lag=0)

    def test_periodic_signal_peaks_at_period(self, spark):
        ys = [10, 0, 10, 0, 10, 0, 10, 0, 10, 0]
        out = {
            r["lag"]: r["acf_milli"]
            for r in autocorrelation(
                self._series(spark, ys), "t", "y", max_lag=3
            ).collect()
        }
        assert out[2] > 700 and out[1] < 0
