"""quantile_bins (hand octave/sub-bin placement incl. zero and exact
powers of two, bounded cardinality) and quantile_estimates (true
quantile always inside the certified [lo, hi) interval, shard-merge ==
one-shot sketch, grouped reads, bad-quantile rejection)."""

import math

import pytest

from correctocr_spark.ops.sketch import quantile_bins, quantile_estimates


def _bin(v, s=16):
    if v == 0:
        return (-1, 0)
    e = v.bit_length() - 1
    return (e, ((v - (1 << e)) * s) >> e)


class TestQuantileBins:
    def test_hand_placement(self, spark):
        vals = [0, 1, 2, 3, 7, 8, 100, 65536]
        df = spark.createDataFrame([(v,) for v in vals], "v long")
        got = {
            (r["bin_e"], r["bin_k"]): r["n"]
            for r in quantile_bins(df, "v", sub_bins=4).collect()
        }
        exp = {}
        for v in vals:
            exp[_bin(v, 4)] = exp.get(_bin(v, 4), 0) + 1
        assert got == exp
        # exact powers of two sit at sub-bin 0 of their own octave
        assert got[(3, 0)] == 1 and got[(16, 0)] == 1

    def test_negative_and_null_dropped(self, spark):
        df = spark.createDataFrame([(5,), (-3,), (None,)], "v long")
        assert quantile_bins(df, "v").agg({"n": "sum"}).first()[0] == 1

    def test_bounded_cardinality(self, spark):
        df = spark.createDataFrame(
            [(v,) for v in range(2000)], "v long"
        )
        n_bins = quantile_bins(df, "v", sub_bins=8).count()
        assert n_bins <= 11 * 8 + 1  # 11 octaves cover 2000, plus zero

    def test_bad_sub_bins(self, spark):
        df = spark.createDataFrame([(1,)], "v long")
        with pytest.raises(ValueError):
            quantile_bins(df, "v", sub_bins=0)


class TestQuantileEstimates:
    def test_interval_contains_true_quantile(self, spark):
        vals = [int(1.37**i) for i in range(2, 40)]
        df = spark.createDataFrame([(v,) for v in vals], "v long")
        b = quantile_bins(df, "v", sub_bins=16)
        qs = (100, 2500, 5000, 7500, 9900)
        got = {
            r["q_bp"]: (r["est_lo"], r["est_hi"])
            for r in quantile_estimates(b, qs_bp=qs, sub_bins=16).collect()
        }
        sv = sorted(vals)
        for q in qs:
            rank = math.ceil(q * len(sv) / 10000)
            true = sv[rank - 1]
            lo, hi = got[q]
            assert lo <= true < hi, (q, true, lo, hi)

    def test_shard_merge_equals_one_shot(self, spark):
        vals = list(range(1, 101))
        d1 = spark.createDataFrame([(v,) for v in vals[:50]], "v long")
        d2 = spark.createDataFrame([(v,) for v in vals[50:]], "v long")
        one = quantile_bins(
            spark.createDataFrame([(v,) for v in vals], "v long"), "v"
        )
        merged = quantile_bins(d1, "v").unionByName(quantile_bins(d2, "v"))
        ro = {
            r["q_bp"]: (r["est_lo"], r["est_hi"], r["n_rows"])
            for r in quantile_estimates(one).collect()
        }
        rm = {
            r["q_bp"]: (r["est_lo"], r["est_hi"], r["n_rows"])
            for r in quantile_estimates(merged).collect()
        }
        assert ro == rm

    def test_grouped(self, spark):
        rows = [("a", v) for v in range(1, 11)] + [("b", 1000)]
        df = spark.createDataFrame(rows, "g string, v long")
        b = quantile_bins(df, "v", group_cols="g")
        got = {
            (r["g"], r["q_bp"]): r["n_rows"]
            for r in quantile_estimates(
                b, qs_bp=(5000,), group_cols="g"
            ).collect()
        }
        assert got == {("a", 5000): 10, ("b", 5000): 1}

    def test_bad_quantile_rejected(self, spark):
        df = spark.createDataFrame([(1,)], "v long")
        b = quantile_bins(df, "v")
        with pytest.raises(ValueError):
            quantile_estimates(b, qs_bp=(0,))
        with pytest.raises(ValueError):
            quantile_estimates(b, qs_bp=(10001,))
