"""Edge-case pins for the round-5 eval/diagnostics tier:
classifier_eval, brier_decomposition, trend_test (textstats),
tail_index (cleaning) and seasonality (temporal). DuckDB hash oracles
live in __spark_entry__ (langid_eval / brier_report / trend_gate /
tail_index / seasonality); these pin hand-checkable boundary
semantics."""

import datetime

import pytest

from pyspark.sql import functions as F


class TestClassifierEval:
    def _df(self, spark, pairs):
        return spark.createDataFrame(pairs, "gold string, pred string")

    def test_perfect_predictions(self, spark):
        from correctocr_spark.ops.textstats import classifier_eval

        d = self._df(spark, [("en", "en")] * 5 + [("fr", "fr")] * 3)
        out = {r["label"]: r for r in classifier_eval(d, "gold", "pred").collect()}
        for lbl in ("en", "fr"):
            assert out[lbl]["precision_bp"] == 10000
            assert out[lbl]["recall_bp"] == 10000
            assert out[lbl]["f1_bp"] == 10000

    def test_never_predicted_and_hallucinated_classes(self, spark):
        """A class the model never predicts keeps a row (zero recall,
        NULL precision); a class it invents shows zero precision with
        NULL recall."""
        from correctocr_spark.ops.textstats import classifier_eval

        d = self._df(spark, [("pt", "en"), ("pt", "en"), ("en", "xx")])
        out = {r["label"]: r for r in classifier_eval(d, "gold", "pred").collect()}
        assert out["pt"]["n_pred"] == 0 and out["pt"]["recall_bp"] == 0
        assert out["pt"]["precision_bp"] is None
        assert out["pt"]["f1_bp"] == 0
        assert out["xx"]["n_true"] == 0 and out["xx"]["precision_bp"] == 0
        assert out["xx"]["recall_bp"] is None

    def test_hand_f1_telescoped(self, spark):
        from correctocr_spark.ops.textstats import classifier_eval

        # en: n_true 4, n_pred 3, tp 2 -> P 2/3, R 1/2, F1 = 4/7
        d = self._df(
            spark,
            [("en", "en"), ("en", "en"), ("en", "fr"), ("en", "fr"),
             ("fr", "en"), ("fr", "fr"), ("fr", "fr")],
        )
        out = {r["label"]: r for r in classifier_eval(d, "gold", "pred").collect()}
        assert out["en"]["precision_bp"] == 6666
        assert out["en"]["recall_bp"] == 5000
        assert out["en"]["f1_bp"] == 40000 // 7


class TestBrierDecomposition:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "p long, o boolean")

    def test_perfect_calibration_zero_rel(self, spark):
        """Within-bin predicted mean == observed rate -> REL 0."""
        from correctocr_spark.ops.textstats import brier_decomposition

        rows = []
        for p, n, k in [(250000, 8, 2), (750000, 8, 6)]:
            rows += [(p, True)] * k + [(p, False)] * (n - k)
        r = brier_decomposition(self._df(spark, rows), "p", "o", bins=4).collect()[0]
        assert r["rel_micro"] == 0
        assert r["n_bins_occupied"] == 2

    def test_single_bin_zero_res(self, spark):
        """All mass in one bin: resolution vs the base rate is 0."""
        from correctocr_spark.ops.textstats import brier_decomposition

        rows = [(500000, i % 3 == 0) for i in range(12)]
        r = brier_decomposition(self._df(spark, rows), "p", "o", bins=1).collect()[0]
        assert r["res_micro"] == 0

    def test_uncertainty_closed_form(self, spark):
        from correctocr_spark.ops.textstats import brier_decomposition

        rows = [(100000 * (i % 11), i % 4 == 0) for i in range(40)]
        r = brier_decomposition(self._df(spark, rows), "p", "o").collect()[0]
        n, s = 40, 10
        assert r["unc_micro"] == (10**6 * s * (n - s)) // (n * n)
        assert r["n"] == n

    def test_decomposition_identity_within_quantization(self, spark):
        """brier ~= rel - res + unc up to binning + per-bin floors."""
        from correctocr_spark.ops.textstats import brier_decomposition

        rows = [((i * 73) % 101 * 10000, (i * 37) % 100 < (i * 73) % 101)
                for i in range(400)]
        r = brier_decomposition(self._df(spark, rows), "p", "o", bins=20).collect()[0]
        approx = r["rel_micro"] - r["res_micro"] + r["unc_micro"]
        # binning makes this approximate; at 20 bins the gap is small
        assert abs(r["brier_micro"] - approx) < 12000

    def test_validation(self, spark):
        from correctocr_spark.ops.textstats import brier_decomposition

        with pytest.raises(ValueError):
            brier_decomposition(self._df(spark, [(0, True)]), "p", "o", bins=0)


class TestTrendTest:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "b long, ok boolean")

    def test_clean_monotone_trend(self, spark):
        from correctocr_spark.ops.textstats import trend_test

        rows = []
        for b in range(5):
            rows += [(b, True)] * (10 + 8 * b) + [(b, False)] * (50 - 8 * b)
        r = trend_test(self._df(spark, rows), "b", "ok").collect()[0]
        assert r["direction"] == 1
        assert r["z2_milli"] > 3841  # way past 1.96^2

    def test_flat_rate_zero(self, spark):
        from correctocr_spark.ops.textstats import trend_test

        rows = []
        for b in range(4):
            rows += [(b, True)] * 5 + [(b, False)] * 15
        r = trend_test(self._df(spark, rows), "b", "ok").collect()[0]
        assert r["z2_milli"] == 0 and r["direction"] == 0

    def test_degenerate_cases_null(self, spark):
        from correctocr_spark.ops.textstats import trend_test

        all_pass = self._df(spark, [(0, True), (1, True)])
        assert trend_test(all_pass, "b", "ok").collect()[0]["z2_milli"] is None
        one_bucket = self._df(spark, [(3, True), (3, False)])
        assert trend_test(one_bucket, "b", "ok").collect()[0]["z2_milli"] is None

    def test_direction_flips_with_reversed_buckets(self, spark):
        from correctocr_spark.ops.textstats import trend_test

        rows = []
        for b in range(4):
            rows += [(b, True)] * (4 + 4 * b) + [(b, False)] * (20 - 4 * b)
        d = self._df(spark, rows)
        up = trend_test(d, "b", "ok").collect()[0]
        down = trend_test(
            d.select((F.lit(3) - F.col("b")).alias("b"), "ok"), "b", "ok"
        ).collect()[0]
        assert up["direction"] == 1 and down["direction"] == -1
        assert up["z2_milli"] == down["z2_milli"]


class TestTailIndex:
    def test_exact_pareto_recovery(self, spark):
        """Deterministic Pareto(alpha=2) order statistics: Hill on the
        full top-k recovers alpha within the estimator's own noise."""
        from correctocr_spark.ops.cleaning import tail_index

        n = 2000
        # x_i = floor(1e4 / sqrt(u)) with u = (i+0.5)/n: exact Pareto
        # quantiles, alpha = 2
        rows = [(i, int(10000.0 / ((i + 0.5) / n) ** 0.5)) for i in range(n)]
        df = spark.createDataFrame(rows, "id long, sz long")
        r = tail_index(df, "sz", k=200).collect()[0]
        assert r["k"] == 200
        assert 1700 <= r["alpha_milli"] <= 2300

    def test_tie_policy_takes_exactly_k(self, spark):
        from correctocr_spark.ops.cleaning import tail_index

        rows = [(i, 100) for i in range(10)] + [(10 + i, 1000) for i in range(3)]
        df = spark.createDataFrame(rows, "id long, sz long")
        r = tail_index(df, "sz", k=5).collect()[0]
        # top-5 = three 1000s + exactly two of the tied 100s
        assert r["k"] == 5 and r["x_kmin"] == 100

    def test_all_equal_top_null(self, spark):
        from correctocr_spark.ops.cleaning import tail_index

        df = spark.createDataFrame([(i, 500) for i in range(20)], "id long, sz long")
        r = tail_index(df, "sz", k=5).collect()[0]
        assert r["alpha_milli"] is None and r["sum_log_micro"] == 0

    def test_nonpositive_excluded_and_validation(self, spark):
        from correctocr_spark.ops.cleaning import tail_index

        df = spark.createDataFrame(
            [(1, 0), (2, -5), (3, 10), (4, 20), (5, 40)], "id long, sz long"
        )
        r = tail_index(df, "sz", k=3).collect()[0]
        assert r["k"] == 3 and r["x_kmin"] == 10
        with pytest.raises(ValueError):
            tail_index(df, "sz", k=1)


class TestSeasonality:
    def test_iso_dow_and_uniform_grid(self, spark):
        from correctocr_spark.ops.temporal import seasonality

        # 2024-01-01 is a Monday; one event per hour for exactly 7 days
        base = datetime.datetime(2024, 1, 1)
        rows = [(base + datetime.timedelta(hours=h),) for h in range(168)]
        out = seasonality(
            spark.createDataFrame(rows, "ts timestamp")
        ).collect()
        assert len(out) == 168
        by = {(r["dow"], r["hour"]): r for r in out}
        assert by[(1, 0)]["n_events"] == 1  # Monday midnight
        # perfectly uniform: every chi2 term is the same floor value
        assert {r["chi2_term_milli"] for r in out} == {
            out[0]["chi2_term_milli"]
        }

    def test_concentrated_cell_dominates(self, spark):
        from correctocr_spark.ops.temporal import seasonality

        base = datetime.datetime(2024, 1, 1, 3)  # Monday 03:00
        rows = [(base,)] * 100 + [
            (base + datetime.timedelta(hours=1),)
        ] * 1
        out = {
            (r["dow"], r["hour"]): r
            for r in seasonality(
                spark.createDataFrame(rows, "ts timestamp")
            ).collect()
        }
        assert out[(1, 3)]["n_events"] == 100
        assert out[(1, 3)]["share_bp"] == 10000 * 100 // 101
        assert out[(1, 3)]["chi2_term_milli"] > out[(1, 4)]["chi2_term_milli"]
