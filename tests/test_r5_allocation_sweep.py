"""Unit tests for the allocation/sweep batch: neyman_allocation
(variance-proportional twin, exact-total invariant, degenerate-stratum
zero-weight), dedup_threshold_sweep (hand pair table, monotonicity),
simpson_diversity (hand collision twin, uniform/concentrated poles)."""

import math

import pytest

from correctocr_spark.ops.cleaning import neyman_allocation
from correctocr_spark.ops.dedup import dedup_threshold_sweep
from correctocr_spark.ops.textstats import simpson_diversity


class TestNeyman:
    def _df(self, spark, groups):
        rows = [(g, v) for g, vs in groups.items() for v in vs]
        return spark.createDataFrame(rows, "g string, v long")

    def test_matches_python_twin_and_sums_exactly(self, spark):
        groups = {
            "wide": [0, 100, 5, 95, 50, 2, 98],
            "narrow": [50, 51, 49, 50, 50, 51, 49, 50],
            "tiny": [10, 90],
        }
        total = 97
        out = {
            r["grp"]: r
            for r in neyman_allocation(
                self._df(spark, groups), "g", "v", total
            ).collect()
        }
        w = {}
        for g, vs in groups.items():
            n = len(vs)
            s, q = sum(vs), sum(v * v for v in vs)
            varnum = n * q - s * s
            if n >= 2 and varnum > 0:
                sd = math.sqrt(varnum / (n * (n - 1)))
                w[g] = math.floor(1e6 * n * sd)
                assert out[g]["sd_milli"] == math.floor(1000 * sd)
            else:
                w[g] = 0
            assert out[g]["weight_micro"] == w[g]
        W = sum(w.values())
        base = {g: (total * w[g]) // W for g in w}
        rem = sorted(w, key=lambda g: (-((total * w[g]) % W), g))
        leftover = total - sum(base.values())
        for i, g in enumerate(rem):
            if i < leftover:
                base[g] += 1
        assert {g: out[g]["quota"] for g in w} == base
        assert sum(r["quota"] for r in out.values()) == total

    def test_wide_stratum_gets_more_than_proportional(self, spark):
        groups = {
            "wide": [0, 200] * 5,      # 10 docs, huge spread
            "flat": [100, 101] * 20,   # 40 docs, tiny spread
        }
        out = {
            r["grp"]: r["quota"]
            for r in neyman_allocation(
                self._df(spark, groups), "g", "v", 100
            ).collect()
        }
        # proportional would give wide 20; Neyman gives it far more
        assert out["wide"] > 60

    def test_degenerate_strata_zero_weight(self, spark):
        groups = {"const": [5] * 10, "single": [9], "live": [1, 9, 4]}
        out = {
            r["grp"]: r
            for r in neyman_allocation(
                self._df(spark, groups), "g", "v", 10
            ).collect()
        }
        assert out["const"]["weight_micro"] == 0
        assert out["single"]["weight_micro"] == 0
        assert out["live"]["quota"] == 10
        with pytest.raises(ValueError):
            neyman_allocation(self._df(spark, groups), "g", "v", -1)


class TestDedupSweep:
    def _pairs(self, spark, rows):
        return spark.createDataFrame(
            rows, "doc_a long, doc_b long, jaccard double"
        )

    def test_hand_curve(self, spark):
        rows = [
            (1, 2, 0.95), (1, 3, 0.7), (4, 5, 0.55), (6, 7, 0.62),
        ]
        out = {
            r["threshold_milli"]: r
            for r in dedup_threshold_sweep(
                self._pairs(spark, rows), n_corpus_docs=100
            ).collect()
        }
        assert out[500]["n_pairs"] == 4
        assert out[500]["n_docs_touched"] == 7
        assert out[600]["n_pairs"] == 3 and out[600]["n_docs_touched"] == 5
        assert out[700]["n_pairs"] == 2 and out[700]["n_docs_touched"] == 3
        assert out[900]["n_pairs"] == 1 and out[900]["n_docs_touched"] == 2
        assert out[900]["docs_touched_ppm"] == (1000000 * 2) // 100

    def test_monotone_nonincreasing(self, spark):
        rows = [(i, i + 100, 0.4 + 0.05 * (i % 12)) for i in range(30)]
        out = sorted(
            dedup_threshold_sweep(
                self._pairs(spark, rows), n_corpus_docs=500
            ).collect(),
            key=lambda r: r["threshold_milli"],
        )
        for lo, hi in zip(out, out[1:]):
            assert lo["n_pairs"] >= hi["n_pairs"]
            assert lo["n_docs_touched"] >= hi["n_docs_touched"]

    def test_validation(self, spark):
        df = self._pairs(spark, [(1, 2, 0.9)])
        with pytest.raises(ValueError):
            dedup_threshold_sweep(df, n_corpus_docs=0)
        with pytest.raises(ValueError):
            dedup_threshold_sweep(df, n_corpus_docs=10, thresholds_milli=())


class TestSimpson:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "g string, k string")

    def test_hand_collision_twin(self, spark):
        rows = [("a", w) for w in
                ["x"] * 5 + ["y"] * 3 + ["z"] * 2]
        r = simpson_diversity(self._df(spark, rows), "k", "g").collect()[0]
        n, s2 = 10, 25 + 9 + 4
        assert (r["n"], r["n_keys"]) == (n, 3)
        assert r["simpson_ppm"] == (1000000 * (n * n - s2)) // (n * n)
        assert r["effective_keys_milli"] == (1000 * n * n) // s2

    def test_uniform_effective_equals_count(self, spark):
        rows = [("a", f"k{i}") for i in range(8) for _ in range(3)]
        r = simpson_diversity(self._df(spark, rows), "k", "g").collect()[0]
        assert r["effective_keys_milli"] == 8000
        assert r["simpson_ppm"] == (1000000 * 7) // 8

    def test_single_key_zero_diversity(self, spark):
        rows = [("a", "only")] * 6
        r = simpson_diversity(self._df(spark, rows), "k", "g").collect()[0]
        assert r["simpson_ppm"] == 0
        assert r["effective_keys_milli"] == 1000
