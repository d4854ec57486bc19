"""Unit tests for the sketch/graph/forecast batch: ams_f2_sketch
(md5-sign python twin, exact-F2 identity, estimator tolerance),
link_prediction (hand wedge graph, adjacency anti-join, hub cap),
rich_club (hand phi curve), forecast_baselines (twin, periodic NULL,
drift regime)."""

import hashlib
import math

import pytest

from correctocr_spark.ops.graph import link_prediction, rich_club
from correctocr_spark.ops.sketch import ams_f2_sketch
from correctocr_spark.ops.temporal import forecast_baselines


class TestAmsF2:
    @staticmethod
    def _sign(j, v, salt="ams"):
        h = int(
            hashlib.md5(f"{salt}|{j}|{v}".encode()).hexdigest()[:8], 16
        )
        return 1 - 2 * (h % 2)

    def test_matches_python_twin(self, spark):
        rows = [(f"w{i % 7}",) for i in range(50)] + [("hot",)] * 20
        df = spark.createDataFrame(rows, "word string")
        k = 8
        r = ams_f2_sketch(df, "word", k=k).collect()[0]
        from collections import Counter

        c = Counter(w for (w,) in rows)
        f2 = sum(x * x for x in c.values())
        ests = sorted(
            sum(self._sign(j, v) * cnt for v, cnt in c.items()) ** 2
            for j in range(k)
        )
        m = len(ests)
        med2 = ests[(m + 1) // 2 - 1] + ests[(m + 2) // 2 - 1]
        assert (r["n_keys"], r["n_rows"], r["f2_exact"]) == (
            len(c), len(rows), f2,
        )
        assert r["est2_med"] == med2
        assert r["rel_err_milli"] == math.floor(
            1000.0 * abs(med2 - 2.0 * f2) / (2.0 * f2)
        )

    def test_single_key_exact(self, spark):
        """One key: every sign stream sees ±c, every estimate is c²
        — the sketch is exact."""
        df = spark.createDataFrame([("x",)] * 9, "word string")
        r = ams_f2_sketch(df, "word", k=4).collect()[0]
        assert r["f2_exact"] == 81
        assert r["est2_med"] == 162 and r["rel_err_milli"] == 0

    def test_estimator_tolerance(self, spark):
        """k=16 over 200 uniform keys: median estimate within ~3x of
        the true F2 (loose — variance of AMS is 2F2²/k)."""
        df = spark.createDataFrame(
            [(f"k{i}",) for i in range(200)], "word string"
        )
        r = ams_f2_sketch(df, "word", k=16).collect()[0]
        assert r["f2_exact"] == 200
        assert 0 < r["est2_med"] < 6 * 2 * 200
        with pytest.raises(ValueError):
            ams_f2_sketch(df, "word", k=0)


class TestLinkPrediction:
    def _df(self, spark, edges):
        return spark.createDataFrame(edges, "src long, dst long")

    def test_hand_wedge(self, spark):
        """Path 1-10-2 plus 1-11-2: pair (1,2) has CN=2; 10 and 11
        have degree 2 each -> aa = 2*floor(1e6/ln 2)."""
        edges = [(1, 10), (10, 2), (1, 11), (11, 2)]
        out = link_prediction(self._df(spark, edges)).collect()
        rows = {(r["node_a"], r["node_b"]): r for r in out}
        r = rows[(1, 2)]
        assert r["common_neighbors"] == 2
        assert r["aa_micro"] == 2 * math.floor(1000000.0 / math.log(2.0))
        # deg(1)=deg(2)=2, union = 2+2-2
        assert r["jaccard_milli"] == (1000 * 2) // 2
        # (10,11) share neighbors 1 and 2 as well
        assert rows[(10, 11)]["common_neighbors"] == 2

    def test_adjacent_pairs_excluded(self, spark):
        """Triangle: every 2-path closes an existing edge -> no
        predictions."""
        edges = [(1, 2), (2, 3), (1, 3)]
        assert link_prediction(self._df(spark, edges)).count() == 0

    def test_hub_cap_drops_pivot(self, spark):
        """Star through a hub: cap below the hub degree removes all
        its wedges."""
        edges = [(100, i) for i in range(5)]
        df = self._df(spark, edges)
        assert link_prediction(df).count() == 10  # C(5,2) leaf pairs
        assert link_prediction(df, max_pivot_degree=4).count() == 0

    def test_min_shared_filter(self, spark):
        edges = [(1, 10), (10, 2), (1, 11), (11, 2), (3, 10)]
        out = link_prediction(
            self._df(spark, edges), min_shared=2
        ).collect()
        # (1,2) share {10,11}; (10,11) share {1,2}; everything else
        # shares only one neighbor and is filtered
        assert {(r["node_a"], r["node_b"]) for r in out} == {
            (1, 2), (10, 11),
        }


class TestRichClub:
    def _df(self, spark, edges):
        return spark.createDataFrame(edges, "src long, dst long")

    def test_hand_curve(self, spark):
        """K4 core {0,1,2,3} plus pendant leaves on 0 and 1: nodes of
        degree > 3 are exactly {0, 1}, and they are linked."""
        core = [(a, b) for a in range(4) for b in range(a + 1, 4)]
        edges = core + [(0, 10), (1, 11)]
        out = {
            r["k"]: r
            for r in rich_club(
                self._df(spark, edges), ks=(1, 2, 3, 9)
            ).collect()
        }
        # deg: 0,1 -> 4; 2,3 -> 3; leaves -> 1
        r1 = out[1]
        assert r1["n_nodes"] == 4 and r1["n_edges"] == 6
        assert r1["phi_ppm"] == (2 * 6 * 1000000) // (4 * 3)  # 10^6
        r3 = out[3]
        assert r3["n_nodes"] == 2 and r3["n_edges"] == 1
        assert r3["phi_ppm"] == 1000000
        assert out[9]["n_nodes"] == 0 and out[9]["phi_ppm"] is None

    def test_no_interlink_zero(self, spark):
        """Two separate stars: the two hubs never link -> phi(1)=0."""
        edges = [(1, i) for i in range(10, 14)] + [
            (2, i) for i in range(20, 24)
        ]
        out = {
            r["k"]: r
            for r in rich_club(self._df(spark, edges), ks=(1,)).collect()
        }
        assert out[1]["n_nodes"] == 2 and out[1]["phi_ppm"] == 0


class TestForecastBaselines:
    def _series(self, spark, ys):
        return spark.createDataFrame(
            list(enumerate(ys)), "t long, y long"
        )

    def test_matches_python_twin(self, spark):
        ys = [10, 13, 9, 14, 11, 16, 12, 11, 15, 10, 13, 12]
        m = 3
        r = forecast_baselines(
            self._series(spark, ys), "t", "y", season=m
        ).collect()[0]
        sae_n = sum(abs(ys[t] - ys[t - 1]) for t in range(1, len(ys)))
        sae_s = sum(abs(ys[t] - ys[t - m]) for t in range(m, len(ys)))
        n1, ns = len(ys) - 1, len(ys) - m
        assert (r["sae_naive"], r["n_naive"]) == (sae_n, n1)
        assert (r["sae_seasonal"], r["n_seasonal"]) == (sae_s, ns)
        assert r["mase_milli"] == (1000 * sae_n * ns) // (n1 * sae_s)

    def test_perfectly_periodic_null(self, spark):
        ys = [5, 9, 2] * 4
        r = forecast_baselines(
            self._series(spark, ys), "t", "y", season=3
        ).collect()[0]
        assert r["sae_seasonal"] == 0 and r["mase_milli"] is None

    def test_trend_beats_seasonal_window(self, spark):
        """Pure linear trend: naive SAE per step is the slope, the
        seasonal lag accumulates season x slope -> MASE ~ 1/season."""
        ys = [3 * t for t in range(12)]
        r = forecast_baselines(
            self._series(spark, ys), "t", "y", season=4
        ).collect()[0]
        assert r["mase_milli"] == 250
        with pytest.raises(ValueError):
            forecast_baselines(self._series(spark, ys), "t", "y", season=0)

    def test_short_series(self, spark):
        """Series shorter than the season: no seasonal pairs -> NULL."""
        r = forecast_baselines(
            self._series(spark, [4, 6]), "t", "y", season=7
        ).collect()[0]
        assert r["n_seasonal"] == 0 and r["mase_milli"] is None
