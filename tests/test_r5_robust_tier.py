"""Edge-case pins for the round-5 robust-stats tier: eb_shrinkage
(filters), weighted_percentiles / winsorized_mean / theils_u
(textstats), runs_test (temporal). DuckDB hash oracles live in
__spark_entry__ (rate_shrinkage / byte_percentiles / winsorized_mean /
uncertainty_coeff / runs_gate)."""

import pytest

from pyspark.sql import functions as F


class TestEbShrinkage:
    def _df(self, spark, spec):
        rows = []
        for grp, n, k in spec:
            rows += [(grp, i < k) for i in range(n)]
        return spark.createDataFrame(rows, "host string, ok boolean")

    def test_small_sample_pulled_toward_prior(self, spark):
        from correctocr_spark.ops.filters import eb_shrinkage

        spec = [("h%d" % i, 100, 30 + (i % 5) * 10) for i in range(10)]
        spec += [("lucky", 2, 2)]  # 100% on 2 trials
        out = {r["grp"]: r for r in eb_shrinkage(
            self._df(spark, spec), "host", "ok", min_n=5
        ).collect()}
        lucky = out["lucky"]
        assert lucky["rate_micro"] == 1000000
        # shrunk well below the raw 100%, above the ~50% prior
        assert lucky["prior_micro"] < lucky["shrunk_micro"] < 1000000
        # evidence-rich groups barely move
        big = out["h0"]
        assert abs(big["shrunk_micro"] - big["rate_micro"]) < abs(
            lucky["shrunk_micro"] - lucky["rate_micro"]
        )

    def test_small_groups_excluded_from_prior_but_shrunk(self, spark):
        from correctocr_spark.ops.filters import eb_shrinkage

        spec = [("a", 50, 10), ("b", 50, 20), ("c", 50, 30), ("tiny", 1, 1)]
        out = {r["grp"]: r for r in eb_shrinkage(
            self._df(spark, spec), "host", "ok", min_n=5
        ).collect()}
        # prior = mean of the three eligible micro-rates
        exp_prior = (200000 + 400000 + 600000) // 3
        assert out["a"]["prior_micro"] == exp_prior
        assert out["tiny"]["shrunk_micro"] is not None

    def test_degenerate_priors_null(self, spark):
        from correctocr_spark.ops.filters import eb_shrinkage

        # zero between-group variance
        flat = self._df(spark, [("a", 40, 20), ("b", 40, 20)])
        for r in eb_shrinkage(flat, "host", "ok").collect():
            assert r["shrunk_micro"] is None and r["prior_micro"] is None
        # single eligible group
        solo = self._df(spark, [("a", 40, 20), ("t", 2, 1)])
        for r in eb_shrinkage(solo, "host", "ok", min_n=5).collect():
            assert r["shrunk_micro"] is None


class TestWeightedPercentiles:
    def test_hand_weighted_median(self, spark):
        from correctocr_spark.ops.textstats import weighted_percentiles

        # values 10 (w 1), 20 (w 1), 1000 (w 98): the weighted median
        # is 1000 even though the row median is 20
        df = spark.createDataFrame(
            [(10, 1), (20, 1), (1000, 98)], "v long, w long"
        )
        out = {r["q_bp"]: r for r in weighted_percentiles(
            df, "v", "w", (5000,)
        ).collect()}
        assert out[5000]["value"] == 1000
        assert out[5000]["total_weight"] == 100

    def test_boundary_exact_hit(self, spark):
        from correctocr_spark.ops.textstats import weighted_percentiles

        # cum weights 25/50/75/100: q=2500 lands exactly on the first
        df = spark.createDataFrame(
            [(1, 25), (2, 25), (3, 25), (4, 25)], "v long, w long"
        )
        out = {r["q_bp"]: r["value"] for r in weighted_percentiles(
            df, "v", "w", (2500, 5000, 7500, 10000)
        ).collect()}
        assert out == {2500: 1, 5000: 2, 7500: 3, 10000: 4}

    def test_validation(self, spark):
        from correctocr_spark.ops.textstats import weighted_percentiles

        df = spark.createDataFrame([(1, 1)], "v long, w long")
        with pytest.raises(ValueError):
            weighted_percentiles(df, "v", "w", ())
        with pytest.raises(ValueError):
            weighted_percentiles(df, "v", "w", (0,))


class TestWinsorizedMean:
    def test_whale_clamped(self, spark):
        from correctocr_spark.ops.textstats import winsorized_mean

        rows = [(i, 100) for i in range(98)] + [(98, 100), (99, 10**9)]
        df = spark.createDataFrame(rows, "id long, v long")
        r = winsorized_mean(df, "v", 500, 9500).collect()[0]
        # the 1e9 whale is clamped to the 95th-percentile cut (100)
        assert r["hi_cut"] == 100
        assert r["winsorized_mean_micro"] == 100 * 10**6

    def test_plain_mean_when_no_clamping_needed(self, spark):
        from correctocr_spark.ops.textstats import winsorized_mean

        df = spark.createDataFrame([(i, 50) for i in range(10)], "id long, v long")
        r = winsorized_mean(df, "v", 500, 9500).collect()[0]
        assert r["winsorized_mean_micro"] == 50 * 10**6

    def test_validation(self, spark):
        from correctocr_spark.ops.textstats import winsorized_mean

        df = spark.createDataFrame([(1, 1)], "id long, v long")
        with pytest.raises(ValueError):
            winsorized_mean(df, "v", 9500, 500)


class TestTheilsU:
    def _df(self, spark, pairs):
        return spark.createDataFrame(pairs, "x string, y string")

    def test_perfect_determinism_u_one(self, spark):
        from correctocr_spark.ops.textstats import theils_u

        d = self._df(spark, [("a", "en")] * 5 + [("b", "fr")] * 5)
        r = theils_u(d, "x", "y").collect()[0]
        assert r["h_y_given_x_micro"] == 0
        assert r["u_bp"] == 10000

    def test_independence_near_zero(self, spark):
        from correctocr_spark.ops.textstats import theils_u

        pairs = [(x, y) for x in "ab" for y in ("en", "fr") for _ in range(25)]
        r = theils_u(self._df(spark, pairs), "x", "y").collect()[0]
        assert 0 <= r["u_bp"] <= 1  # floor slack only

    def test_asymmetry(self, spark):
        from correctocr_spark.ops.textstats import theils_u

        # x has 4 values each mapping to one of 2 y values: knowing x
        # determines y (U(y|x)=1) but knowing y leaves 2 x candidates
        pairs = [("a", "en"), ("b", "en"), ("c", "fr"), ("d", "fr")] * 10
        d = self._df(spark, pairs)
        u_yx = theils_u(d, "x", "y").collect()[0]["u_bp"]
        u_xy = theils_u(d, "y", "x").collect()[0]["u_bp"]
        assert u_yx == 10000 and u_xy < 10000

    def test_single_category_null(self, spark):
        from correctocr_spark.ops.textstats import theils_u

        d = self._df(spark, [("a", "en"), ("b", "en")])
        assert theils_u(d, "x", "y").collect()[0]["u_bp"] is None


class TestRunsTest:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "g string, ord long, ok boolean")

    def test_perfect_alternation_positive(self, spark):
        from correctocr_spark.ops.temporal import runs_test

        rows = [("g", i, i % 2 == 0) for i in range(40)]
        r = runs_test(self._df(spark, rows), "g", "ord", "ok").collect()[0]
        assert r["runs"] == 40 and r["direction"] == 1

    def test_two_blocks_strong_clustering(self, spark):
        from correctocr_spark.ops.temporal import runs_test

        rows = [("g", i, i < 20) for i in range(40)]
        r = runs_test(self._df(spark, rows), "g", "ord", "ok").collect()[0]
        assert r["runs"] == 2 and r["direction"] == -1
        assert r["z2_milli"] > 3841

    def test_hand_z2(self, spark):
        from correctocr_spark.ops.temporal import runs_test

        # n=10, n1=5, R=6: z2 = (N(R-1)-2n1n0)^2 (N-1) / (2n1n0(2n1n0-N))
        seq = [1, 1, 0, 0, 1, 0, 1, 1, 0, 0]
        rows = [("g", i, bool(v)) for i, v in enumerate(seq)]
        r = runs_test(self._df(spark, rows), "g", "ord", "ok").collect()[0]
        n, n1, R = 10, 5, 6
        n0 = n - n1
        exact = (
            1000 * (n * (R - 1) - 2 * n1 * n0) ** 2 * (n - 1)
        ) // (2 * n1 * n0 * (2 * n1 * n0 - n))
        assert r["runs"] == R and r["z2_milli"] == exact

    def test_one_sided_group_null(self, spark):
        from correctocr_spark.ops.temporal import runs_test

        rows = [("g", i, True) for i in range(12)]
        r = runs_test(self._df(spark, rows), "g", "ord", "ok").collect()[0]
        assert r["z2_milli"] is None and r["runs"] == 1
