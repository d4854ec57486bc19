"""Unit tests for the final batch: global_transitivity (hand graphs —
triangle, path, clique-with-pendant; definition 3T/W), group_trend
(per-group OLS twin, exact-line R2=1, flat NULL/zero)."""

import math

import pytest

from correctocr_spark.ops.graph import global_transitivity
from correctocr_spark.ops.temporal import group_trend


class TestGlobalTransitivity:
    def _df(self, spark, edges):
        return spark.createDataFrame(edges, "src long, dst long")

    def test_triangle_is_one(self, spark):
        r = global_transitivity(
            self._df(spark, [(1, 2), (2, 3), (1, 3)])
        ).collect()[0]
        assert (r["n_nodes"], r["n_edges"]) == (3, 3)
        assert (r["n_wedges"], r["n_triangles"]) == (3, 1)
        assert r["transitivity_ppm"] == 1000000

    def test_path_is_zero(self, spark):
        r = global_transitivity(
            self._df(spark, [(1, 2), (2, 3), (3, 4)])
        ).collect()[0]
        assert r["n_triangles"] == 0 and r["transitivity_ppm"] == 0
        assert r["n_wedges"] == 2

    def test_clique_with_pendant(self, spark):
        """K4 plus a pendant: T=4; W = sum d(d-1)/2 = 3*3 + 6 + 0."""
        k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
        r = global_transitivity(
            self._df(spark, k4 + [(0, 9)])
        ).collect()[0]
        assert r["n_triangles"] == 4
        assert r["n_wedges"] == 3 * 3 + 6
        assert r["transitivity_ppm"] == (3000000 * 4) // 15

    def test_dedup_and_selfloops_ignored(self, spark):
        edges = [(1, 2), (2, 1), (1, 2), (3, 3), (2, 3), (1, 3)]
        r = global_transitivity(self._df(spark, edges)).collect()[0]
        assert r["n_edges"] == 3 and r["n_triangles"] == 1

    def test_no_wedges_null(self, spark):
        r = global_transitivity(self._df(spark, [(1, 2)])).collect()[0]
        assert r["n_wedges"] == 0 and r["transitivity_ppm"] is None


class TestGroupTrend:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "g string, t long, y long")

    def test_matches_ols_twin(self, spark):
        rows = [("a", t, 3 * t + 7 + (t % 3)) for t in range(10)] + [
            ("b", t, 100 - 2 * t + (t * t) % 5) for t in range(8)
        ]
        out = {
            r["grp"]: r
            for r in group_trend(self._df(spark, rows), "g", "t", "y")
            .collect()
        }
        for g in ("a", "b"):
            pts = [(t, y) for gg, t, y in rows if gg == g]
            n = len(pts)
            st = sum(t for t, _ in pts)
            sy = sum(y for _, y in pts)
            sty = sum(t * y for t, y in pts)
            stt = sum(t * t for t, _ in pts)
            syy = sum(y * y for _, y in pts)
            cov = n * sty - st * sy
            vt = n * stt - st * st
            vy = n * syy - sy * sy
            r = out[g]
            assert r["slope_milli"] == math.floor(1000.0 * cov / vt)
            assert r["r2_milli"] == math.floor(
                1000.0 * float(cov * cov) / float(vt * vy)
            )

    def test_exact_line_r2_one(self, spark):
        rows = [("a", t, 5 * t + 2) for t in range(6)]
        r = group_trend(self._df(spark, rows), "g", "t", "y").collect()[0]
        assert r["slope_milli"] == 5000 and r["r2_milli"] == 1000

    def test_flat_series(self, spark):
        """Constant y: slope 0 exactly, R2 NULL (zero y-variance)."""
        rows = [("a", t, 9) for t in range(5)]
        r = group_trend(self._df(spark, rows), "g", "t", "y").collect()[0]
        assert r["slope_milli"] == 0 and r["r2_milli"] is None

    def test_sparse_t_ok(self, spark):
        """Non-dense t (epoch days with gaps) is fine for OLS."""
        rows = [("a", t, 2 * t) for t in (19723, 19730, 19737, 19760)]
        r = group_trend(self._df(spark, rows), "g", "t", "y").collect()[0]
        assert r["slope_milli"] == 2000 and r["r2_milli"] == 1000
