"""Unit tests for the stratified/clustered batch: partial_corr
(python moment twin, confounder-identity NULL), icc_oneway (twin +
float-ICC agreement, degenerate NULL), cmh_test (python twin, Simpson
two-strata case, OR sanity), page_trend (monotone max-L, reversed
sign, tie twin)."""

import math

import pytest

from correctocr_spark.ops.textstats import (
    cmh_test,
    icc_oneway,
    page_trend,
    partial_corr,
)


class TestPartialCorr:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "x long, y long, z long")

    def test_matches_python_twin(self, spark):
        rows = [
            (i, (i * 3) % 11 + i // 2, (i * 7) % 5 + i)
            for i in range(40)
        ]
        r = partial_corr(self._df(spark, rows), "x", "y", "z").collect()[0]
        n = len(rows)
        sx = sum(a for a, _, _ in rows)
        sy = sum(b for _, b, _ in rows)
        sz = sum(c for _, _, c in rows)
        sxy = sum(a * b for a, b, _ in rows)
        sxz = sum(a * c for a, _, c in rows)
        syz = sum(b * c for _, b, c in rows)
        sxx = sum(a * a for a, _, _ in rows)
        syy = sum(b * b for _, b, _ in rows)
        szz = sum(c * c for _, _, c in rows)
        cxy, cxz, cyz = (
            n * sxy - sx * sy, n * sxz - sx * sz, n * syz - sy * sz,
        )
        vx, vy, vz = (
            n * sxx - sx * sx, n * syy - sy * sy, n * szz - sz * sz,
        )
        num = cxy * vz - cxz * cyz
        r1 = vx * vz - cxz * cxz
        r2 = vy * vz - cyz * cyz
        assert r["r_xy_milli"] == math.floor(
            1000.0 * cxy / (math.sqrt(vx) * math.sqrt(vy))
        )
        assert r["r_partial_milli"] == math.floor(
            1000.0 * num / (math.sqrt(r1) * math.sqrt(r2))
        )
        # float sanity vs the textbook (r_xy − r_xz·r_yz)/... form
        rxy = cxy / math.sqrt(vx * vy)
        rxz = cxz / math.sqrt(vx * vz)
        ryz = cyz / math.sqrt(vy * vz)
        pr = (rxy - rxz * ryz) / math.sqrt(
            (1 - rxz**2) * (1 - ryz**2)
        )
        assert abs(r["r_partial_milli"] / 1000 - pr) < 2e-3

    def test_confounder_explains_everything(self, spark):
        """x and y BOTH equal to z (plus nothing): |r_xz| = 1 makes the
        radicand 0 -> NULL partial (undefined, surfaced)."""
        rows = [(i, i, i) for i in range(10)]
        r = partial_corr(self._df(spark, rows), "x", "y", "z").collect()[0]
        assert r["r_xy_milli"] == 1000
        assert r["r_partial_milli"] is None

    def test_partial_removes_common_driver(self, spark):
        """x = z + small noise_x, y = z + independent noise_y: raw r_xy
        is large (shared z), partial r_xy.z collapses toward 0."""
        rows = [
            (10 * i + (i * 3) % 7, 10 * i + (i * 5) % 11, 10 * i)
            for i in range(30)
        ]
        r = partial_corr(self._df(spark, rows), "x", "y", "z").collect()[0]
        assert r["r_xy_milli"] > 900
        assert abs(r["r_partial_milli"]) < 500


class TestIcc:
    def _df(self, spark, groups):
        rows = [
            (g, v) for g, vs in groups.items() for v in vs
        ]
        return spark.createDataFrame(rows, "g string, v long")

    def test_matches_float_icc(self, spark):
        groups = {
            "a": [10, 12, 11, 13], "b": [40, 44, 41], "c": [70, 75, 72, 71, 74],
        }
        r = icc_oneway(self._df(spark, groups), "v", "g").collect()[0]
        import statistics

        vals = [v for vs in groups.values() for v in vs]
        N, G = len(vals), len(groups)
        grand = sum(vals) / N
        ssb = sum(
            len(vs) * (statistics.mean(vs) - grand) ** 2
            for vs in groups.values()
        )
        ssw = sum(
            (v - statistics.mean(vs)) ** 2
            for vs in groups.values()
            for v in vs
        )
        msb, msw = ssb / (G - 1), ssw / (N - G)
        n0 = (N - sum(len(vs) ** 2 for vs in groups.values()) / N) / (
            G - 1
        )
        icc = (msb - msw) / (msb + (n0 - 1) * msw)
        assert (r["k"], r["n"]) == (G, N)
        assert r["sum_nsq"] == sum(len(vs) ** 2 for vs in groups.values())
        assert abs(r["icc_milli"] / 1000 - icc) < 2e-3
        assert r["icc_milli"] > 900  # strongly clustered by design

    def test_no_clustering_low_icc(self, spark):
        """Identical group distributions: ICC ~ -1/(n0-1) ~ 0 or below."""
        groups = {
            "a": [1, 5, 9], "b": [1, 5, 9], "c": [1, 5, 9],
        }
        r = icc_oneway(self._df(spark, groups), "v", "g").collect()[0]
        assert r["ssb_micro"] <= 2  # floor dust only
        assert r["icc_milli"] <= 0

    def test_single_group_null(self, spark):
        r = icc_oneway(
            self._df(spark, {"a": [1, 2, 3]}), "v", "g"
        ).collect()[0]
        assert r["icc_milli"] is None


class TestCmh:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "s string, e boolean, o boolean"
        )

    @staticmethod
    def _twin(strata):
        """strata: list of (a, b, c, d) kept 2x2s."""
        sum_a = se = sv = sad = sbc = 0
        for a, b, c, d in strata:
            n = a + b + c + d
            if n < 2:
                continue
            sum_a += a
            se += math.floor(1000000.0 * (a + b) * (a + c) / n)
            sv += math.floor(
                1000000.0 * (a + b) * (c + d) * (a + c) * (b + d)
                / (float(n) * n * (n - 1))
            )
            sad += math.floor(1000000.0 * a * d / n)
            sbc += math.floor(1000000.0 * b * c / n)
        diff = sum_a - se / 1000000.0
        cmh = (
            math.floor(1000.0 * diff * diff / (sv / 1000000.0))
            if sv > 0
            else None
        )
        orm = (1000 * sad) // sbc if sbc > 0 else None
        return sum_a, se, sv, orm, cmh

    def _rows(self, strata):
        rows = []
        for i, (a, b, c, d) in enumerate(strata):
            s = f"s{i}"
            rows += [(s, True, True)] * a + [(s, True, False)] * b
            rows += [(s, False, True)] * c + [(s, False, False)] * d
        return rows

    def test_matches_python_twin(self, spark):
        strata = [(8, 2, 5, 9), (3, 7, 2, 11), (6, 6, 6, 6)]
        r = cmh_test(
            self._df(spark, self._rows(strata)), "s", "e", "o"
        ).collect()[0]
        sum_a, se, sv, orm, cmh = self._twin(strata)
        assert (r["sum_a"], r["exp_micro"], r["var_micro"]) == (
            sum_a, se, sv,
        )
        assert (r["or_milli"], r["cmh_milli"]) == (orm, cmh)
        assert r["n_strata"] == 3

    def test_simpson_null_within_strata(self, spark):
        """Exposure has NO effect within either stratum (identical
        rates), but the strata differ in both exposure mix and base
        rate — the pooled 2x2 shows an association, CMH stays ~0."""
        strata = [(16, 4, 4, 1), (1, 4, 4, 16)]
        rows = self._rows(strata)
        r = cmh_test(self._df(spark, rows), "s", "e", "o").collect()[0]
        assert r["cmh_milli"] is not None and r["cmh_milli"] < 50
        # pooled table WOULD mislead: exposed rate 17/25 vs 8/25
        pooled_a = sum(s[0] for s in strata)
        pooled_c = sum(s[2] for s in strata)
        assert pooled_a != pooled_c  # the naive signal CMH removes
        # MH common OR ~ 1 (milli ~ 1000)
        assert 800 <= r["or_milli"] <= 1250

    def test_tiny_strata_dropped(self, spark):
        rows = self._rows([(4, 3, 2, 5)]) + [("tiny", True, True)]
        r = cmh_test(self._df(spark, rows), "s", "e", "o").collect()[0]
        assert r["n_strata"] == 1 and r["n_total"] == 14


class TestPageTrend:
    def _df(self, spark, data):
        rows = [
            (b, f"t{j}", v)
            for b, vs in data.items()
            for j, v in enumerate(vs)
        ]
        return spark.createDataFrame(rows, "b string, t string, v long")

    def test_perfect_monotone_max_l(self, spark):
        """Values strictly increasing in label order in every block:
        L = n·Σ j·j (max), z strongly positive."""
        data = {f"b{i}": [10, 20, 30, 40] for i in range(6)}
        r = page_trend(self._df(spark, data), "b", "t", "v").collect()[0]
        n, k = 6, 4
        lmax = n * sum(j * j for j in range(1, k + 1))
        assert r["l2_stat"] == 2 * lmax
        assert r["e2_stat"] == n * k * (k + 1) ** 2 // 2
        assert r["var144"] == n * k * k * (k + 1) ** 2 * (k - 1)
        assert r["z_milli"] == math.floor(
            6000.0 * (r["l2_stat"] - r["e2_stat"])
            / math.sqrt(r["var144"])
        )
        assert r["z_milli"] > 3000

    def test_reversed_order_negative(self, spark):
        data = {f"b{i}": [40, 30, 20, 10] for i in range(6)}
        r = page_trend(self._df(spark, data), "b", "t", "v").collect()[0]
        assert r["z_milli"] < -3000

    def test_matches_python_twin_with_ties(self, spark):
        data = {
            "b1": [5, 5, 9], "b2": [1, 4, 4], "b3": [7, 2, 7],
            "b4": [2, 6, 6],
        }
        r = page_trend(self._df(spark, data), "b", "t", "v").collect()[0]
        k = 3
        n = len(data)
        R2 = [0] * k
        for vs in data.values():
            for j, v in enumerate(vs):
                rank_min = 1 + sum(1 for x in vs if x < v)
                cnt_eq = sum(1 for x in vs if x == v)
                R2[j] += 2 * rank_min + cnt_eq - 1
        l2 = sum((j + 1) * R2[j] for j in range(k))
        e2 = n * k * (k + 1) ** 2 // 2
        var144 = n * k * k * (k + 1) ** 2 * (k - 1)
        assert (r["l2_stat"], r["e2_stat"], r["var144"]) == (
            l2, e2, var144,
        )
        assert r["z_milli"] == math.floor(
            6000.0 * (l2 - e2) / math.sqrt(var144)
        )

    def test_all_tied_z_zero(self, spark):
        data = {"b1": [4, 4, 4], "b2": [9, 9, 9]}
        r = page_trend(self._df(spark, data), "b", "t", "v").collect()[0]
        assert r["l2_stat"] == r["e2_stat"] and r["z_milli"] == 0
