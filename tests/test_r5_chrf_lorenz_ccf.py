"""Unit tests for the eval/distribution/series batch: chrf_eval
(python clipped-n-gram twin, identity=1000, disjoint=0), lorenz_curve
(tie-exact bottom-k twin, uniform=linear), cross_correlation (shifted
-copy peak at the true lag, python twin), series_peaks (strict-max
plateau policy, rise filter)."""

import math
from collections import Counter

import pytest

from correctocr_spark.ops.temporal import cross_correlation, series_peaks
from correctocr_spark.ops.textstats import chrf_eval, lorenz_curve


class TestChrf:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "doc_id long, gold string, pred string"
        )

    @staticmethod
    def _twin(gold, pred, max_order=3, beta=2):
        fs = []
        b2 = beta * beta
        for o in range(1, max_order + 1):
            cg = Counter(
                gold[i : i + o] for i in range(len(gold) - o + 1)
            )
            cp = Counter(
                pred[i : i + o] for i in range(len(pred) - o + 1)
            )
            tg, tp = sum(cg.values()), sum(cp.values())
            if tg == 0 or tp == 0:
                continue
            m = sum(min(c, cp[g]) for g, c in cg.items())
            p, r = m / tp, m / tg
            den = b2 * p + r
            fs.append(
                math.floor(1000.0 * (1 + b2) * p * r / den)
                if den > 0
                else 0
            )
        if not fs:
            return 0, None
        return len(fs), sum(fs) // len(fs)

    def test_matches_python_twin(self, spark):
        rows = [
            (1, "the cat sat", "the bat sat"),
            (2, "hello world", "hello world"),
            (3, "abcdef", "uvwxyz"),
        ]
        out = {
            r["doc_id"]: r
            for r in chrf_eval(self._df(spark, rows)).collect()
        }
        for i, g, p in rows:
            n_ord, f = self._twin(g, p)
            assert (out[i]["n_orders"], out[i]["chrf_milli"]) == (n_ord, f)
        assert out[2]["chrf_milli"] == 1000  # identity
        assert out[3]["chrf_milli"] == 0  # fully disjoint

    def test_recall_weighting(self, spark):
        """beta=2 weights recall: dropping half the gold hurts more
        than adding the same amount of junk."""
        rows = [(1, "abcdabcd", "abcd"), (2, "abcd", "abcdabcd")]
        out = {
            r["doc_id"]: r
            for r in chrf_eval(self._df(spark, rows)).collect()
        }
        assert out[1]["chrf_milli"] < out[2]["chrf_milli"]

    def test_empty_pred_and_validation(self, spark):
        rows = [(1, "abc", "")]
        out = chrf_eval(self._df(spark, rows)).collect()[0]
        assert out["n_orders"] == 0 and out["chrf_milli"] is None
        with pytest.raises(ValueError):
            chrf_eval(self._df(spark, rows), max_order=0)


class TestLorenz:
    def _df(self, spark, vals):
        return spark.createDataFrame([(v,) for v in vals], "v long")

    def test_matches_python_twin_with_ties(self, spark):
        vals = [1, 5, 5, 5, 9, 20, 20, 100, 3, 7]
        out = {
            r["decile"]: r
            for r in lorenz_curve(self._df(spark, vals), "v").collect()
        }
        s = sorted(vals)
        tot = sum(s)
        for d in range(1, 11):
            idx = -(-d * len(s) // 10)
            mass = sum(s[:idx])
            r = out[d]
            assert (r["idx"], r["mass"]) == (idx, mass)
            assert r["share_ppm"] == (1000000 * mass) // tot
        assert out[10]["share_ppm"] == 1000000

    def test_uniform_is_linear(self, spark):
        vals = [7] * 10
        out = {
            r["decile"]: r["share_ppm"]
            for r in lorenz_curve(self._df(spark, vals), "v").collect()
        }
        for d in range(1, 11):
            assert out[d] == (1000000 * d * 7) // 70

    def test_concentrated_tail(self, spark):
        """One whale holds ~all mass: bottom 90% of units near 0."""
        vals = [1] * 9 + [991]
        out = {
            r["decile"]: r["share_ppm"]
            for r in lorenz_curve(self._df(spark, vals), "v").collect()
        }
        assert out[9] == (1000000 * 9) // 1000
        assert out[10] == 1000000


class TestCcf:
    def _series(self, spark, a, b):
        rows = [(t, a[t], b[t]) for t in range(len(a))]
        return spark.createDataFrame(rows, "t long, a long, b long")

    def test_shifted_copy_peaks_at_lag(self, spark):
        """b is a copy of a delayed by 2: CCF peaks at lag +2."""
        base = [3, 9, 1, 7, 4, 8, 2, 6, 5, 9, 1, 7]
        a = base[:-2]
        b = [0, 0] + base[:-4]
        out = {
            r["lag"]: r
            for r in cross_correlation(
                self._series(spark, a, b), "t", "a", "b", max_lag=3
            ).collect()
        }
        assert len(out) == 7  # -3..3
        best = max(out.values(), key=lambda r: r["ccf_milli"])
        assert best["lag"] == 2

    def test_matches_python_twin(self, spark):
        a = [5, 8, 2, 9, 4, 7, 3]
        b = [1, 6, 2, 8, 3, 9, 5]
        out = {
            r["lag"]: r
            for r in cross_correlation(
                self._series(spark, a, b), "t", "a", "b", max_lag=2
            ).collect()
        }
        n = len(a)
        sa, sb = sum(a), sum(b)
        da = [n * x - sa for x in a]
        db = [n * x - sb for x in b]
        dena = sum(x * x for x in da)
        denb = sum(x * x for x in db)
        for lag in range(-2, 3):
            num = sum(
                da[t] * db[t + lag]
                for t in range(n)
                if 0 <= t + lag < n
            )
            r = out[lag]
            assert r["num"] == num
            assert r["ccf_milli"] == math.floor(
                1000.0 * num / (math.sqrt(dena) * math.sqrt(denb))
            )

    def test_constant_series_null(self, spark):
        out = cross_correlation(
            self._series(spark, [4, 4, 4], [1, 5, 9]), "t", "a", "b",
            max_lag=1,
        ).collect()
        assert all(r["ccf_milli"] is None for r in out)
        with pytest.raises(ValueError):
            cross_correlation(
                self._series(spark, [1], [1]), "t", "a", "b", max_lag=-1
            )


class TestPeaks:
    def _series(self, spark, ys):
        return spark.createDataFrame(
            list(enumerate(ys)), "t long, y long"
        )

    def test_single_peak(self, spark):
        ys = [1, 2, 9, 2, 1, 1, 1]
        out = series_peaks(
            self._series(spark, ys), "t", "y", window=2
        ).collect()
        assert len(out) == 1 and out[0]["t"] == 2
        # neighborhood {1,2,2,1}: rise = 9 - 1.5
        assert out[0]["rise_milli"] == 7500
        assert out[0]["nbhd_max"] == 2

    def test_plateau_not_peak(self, spark):
        ys = [1, 5, 5, 1, 1]
        assert (
            series_peaks(self._series(spark, ys), "t", "y", window=2)
            .count()
            == 0
        )

    def test_rise_filter(self, spark):
        ys = [10, 11, 10, 10, 30, 10]
        all_peaks = series_peaks(
            self._series(spark, ys), "t", "y", window=1
        ).collect()
        assert {r["t"] for r in all_peaks} == {1, 4}
        strict = series_peaks(
            self._series(spark, ys), "t", "y", window=1,
            min_rise_milli=5000,
        ).collect()
        assert {r["t"] for r in strict} == {4}
        with pytest.raises(ValueError):
            series_peaks(self._series(spark, ys), "t", "y", window=0)

    def test_edge_truncated_neighborhood(self, spark):
        """A rising endpoint counts with its truncated window."""
        ys = [1, 2, 8]
        out = series_peaks(
            self._series(spark, ys), "t", "y", window=2
        ).collect()
        assert {r["t"] for r in out} == {2}
