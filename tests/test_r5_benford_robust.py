"""benford_deviation (python-twin χ² on a hand corpus, conformant
log-uniform passes / degenerate fails, zero-filled missing digits,
min_numeric gate, decimal/leading-zero token rules) and robust_location
(hand median/MAD incl. even-count half-values, outlier insensitivity vs
mean, constant column, group split)."""

from correctocr_spark.ops.textstats import (
    BENFORD_PPM,
    benford_deviation,
    robust_location,
)


def chi2_twin(obs_by_digit):
    n = sum(obs_by_digit.values())
    total = 0
    for d, p in enumerate(BENFORD_PPM, start=1):
        o = obs_by_digit.get(d, 0)
        num = 1000 * (10**6 * o - n * p) ** 2
        total += num // (10**6 * n * p)
    return n, total


class TestBenford:
    def test_matches_python_twin(self, spark):
        nums = [1, 19, 2, 33, 121, 8000, 95, 7, 1, 14]
        df = spark.createDataFrame(
            [("h", " ".join(map(str, nums)))], "host string, text string"
        )
        r = benford_deviation(df, "host", min_numeric=1).first()
        obs = {}
        for v in nums:
            d = int(str(v)[0])
            obs[d] = obs.get(d, 0) + 1
        n, chi2 = chi2_twin(obs)
        assert (r["n_numeric"], r["chi2_milli"]) == (n, chi2)

    def test_degenerate_fails_loguniform_passes(self, spark):
        import random

        rng = random.Random(7)
        good = " ".join(
            str(int(10 ** (rng.random() * 4)) or 1) for _ in range(500)
        )
        bad = " ".join("9" * (i % 3 + 1) for i in range(500))
        df = spark.createDataFrame(
            [("good", good), ("bad", bad)], "host string, text string"
        )
        got = {
            r["grp"]: r["chi2_milli"]
            for r in benford_deviation(df, "host").collect()
        }
        # 15500 milli ≈ χ²(8 dof) at p=0.05
        assert got["good"] < 16000 < got["bad"]

    def test_token_rules(self, spark):
        # leading-zero, signed, and word tokens are not numbers;
        # decimal with dot or comma counts by first digit
        df = spark.createDataFrame(
            [("h", "007 -5 3.14 2,5 99 word 0")], "host string, text string"
        )
        r = benford_deviation(df, "host", min_numeric=1).first()
        assert r["n_numeric"] == 3  # 3.14, 2,5 and 99

    def test_min_numeric_gate(self, spark):
        df = spark.createDataFrame([("h", "1 2 3")], "host string, text string")
        assert benford_deviation(df, "host", min_numeric=4).count() == 0


class TestRobustLocation:
    def test_hand_median_mad(self, spark):
        d = spark.createDataFrame(
            [("a", v) for v in [1, 2, 3, 4, 100]], "g string, v long"
        )
        r = robust_location(d, "v", group_col="g").first()
        # median 3, devs {2,1,0,1,97} → MAD 1
        assert (r["n_rows"], r["med_x2"], r["mad_x4"]) == (5, 6, 4)

    def test_even_count_half_values(self, spark):
        d = spark.createDataFrame([(v,) for v in [1, 2, 3, 10]], "v long")
        r = robust_location(d, "v").first()
        # median (2+3)/2 = 2.5 → med_x2 = 5
        # dev2 = |2x−5| = 3,1,1,15 → doubled median = 1+3 = 4 → MAD 1
        assert (r["med_x2"], r["mad_x4"]) == (5, 4)

    def test_outlier_insensitive(self, spark):
        base = [(v,) for v in range(1, 12)]
        spiked = base + [(10**9,)] * 2
        m1 = robust_location(
            spark.createDataFrame(base, "v long"), "v"
        ).first()
        m2 = robust_location(
            spark.createDataFrame(spiked, "v long"), "v"
        ).first()
        assert abs(m2["med_x2"] - m1["med_x2"]) <= 2
        assert m2["mad_x4"] <= m1["mad_x4"] + 8

    def test_constant_column(self, spark):
        d = spark.createDataFrame([(7,)] * 5, "v long")
        r = robust_location(d, "v").first()
        assert (r["med_x2"], r["mad_x4"]) == (14, 0)

    def test_group_split(self, spark):
        d = spark.createDataFrame(
            [("a", 1), ("a", 3), ("b", 10)], "g string, v long"
        )
        got = {
            r["grp"]: (r["med_x2"], r["mad_x4"])
            for r in robust_location(d, "v", group_col="g").collect()
        }
        assert got == {"a": (4, 4), "b": (20, 0)}
