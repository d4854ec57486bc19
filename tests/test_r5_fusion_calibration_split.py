"""Session probes for rrf_fusion, calibration_report and grouped_split
— hand simulations plus the lemmas the one-fixture oracle can't see:
RRF's rank-only invariance, the telescoping ECE identity, and the
no-group-straddles-splits leakage guarantee."""

import hashlib

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# rrf_fusion
# ---------------------------------------------------------------------------


def _rrf_simulate(lists, k0=60):
    score, nl = {}, {}
    for lst in lists:
        for q, d, r in lst:
            score[(q, d)] = score.get((q, d), 0) + 1_000_000 // (k0 + r)
            nl[(q, d)] = nl.get((q, d), 0) + 1
    out = {}
    for q in {q for q, _ in score}:
        cand = sorted(
            ((d, score[(q, d)], nl[(q, d)]) for (q2, d) in score if q2 == q),
            key=lambda t: (-t[1], t[0]),
        )
        out[q] = [
            (d, n, s, i + 1) for i, (d, s, n) in enumerate(cand)
        ]
    return out


class TestRrfFusion:
    A = [(0, "x", 1), (0, "y", 2), (0, "z", 3), (1, "p", 1)]
    B = [(0, "y", 1), (0, "w", 2), (1, "q", 1), (1, "p", 2)]

    def _dfs(self, spark):
        schema = "query_id long, doc_id string, rank long"
        return (
            spark.createDataFrame(self.A, schema),
            spark.createDataFrame(self.B, schema),
        )

    def test_matches_simulation(self, spark):
        from correctocr_spark.ops.similarity import rrf_fusion

        a, b = self._dfs(spark)
        got = {}
        for r in rrf_fusion([a, b]).collect():
            got.setdefault(r["query_id"], []).append(
                (r["doc_id"], r["n_lists"], r["rrf_micro"], r["fused_rank"])
            )
        for q in got:
            got[q].sort(key=lambda t: t[3])
        assert got == _rrf_simulate([self.A, self.B])
        # y appears in both lists (ranks 2 and 1) and must beat x
        # (rank 1 in one list only): 1e6//62 + 1e6//61 > 1e6//61
        assert got[0][0][0] == "y" and got[0][0][1] == 2

    def test_rank_only_invariance(self, spark):
        """RRF uses ranks, not scores: scaling a retriever's scores (or
        attaching any extra columns) cannot change the fusion."""
        from correctocr_spark.ops.similarity import rrf_fusion

        a, b = self._dfs(spark)
        a_decorated = a.withColumn("score", F.col("rank") * 1000)
        base = sorted(map(tuple, rrf_fusion([a, b]).collect()))
        deco = sorted(map(tuple, rrf_fusion([a_decorated, b]).collect()))
        assert base == deco

    def test_top_k_cut_and_plan(self, spark):
        from correctocr_spark.ops.similarity import rrf_fusion

        a, b = self._dfs(spark)
        out = rrf_fusion([a, b], top_k=2)
        rows = out.collect()
        per_q = {}
        for r in rows:
            per_q.setdefault(r["query_id"], []).append(r["fused_rank"])
        assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_q.values())
        assert all(len(v) <= 2 for v in per_q.values())
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan

    def test_validation(self, spark):
        from correctocr_spark.ops.similarity import rrf_fusion

        a, _ = self._dfs(spark)
        with pytest.raises(ValueError, match="at least one"):
            rrf_fusion([])
        with pytest.raises(ValueError, match="k0 >= 0"):
            rrf_fusion([a], k0=-1)
        with pytest.raises(ValueError, match="top_k >= 1"):
            rrf_fusion([a], top_k=0)


# ---------------------------------------------------------------------------
# calibration_report
# ---------------------------------------------------------------------------


def _cal_simulate(rows, n_bins):
    bins = {}
    for s, l in rows:
        b = min(max(s * n_bins // 1_000_000, 0), n_bins - 1)
        n, pos, ss = bins.get(b, (0, 0, 0))
        bins[b] = (n + 1, pos + l, ss + s)
    out = {}
    for b, (n, pos, ss) in bins.items():
        ece = abs(1_000_000 * pos - ss)
        out[b] = (n, pos, ss, ss // n, 1_000_000 * pos // n, ece // n, ece)
    return out


class TestCalibrationReport:
    ROWS = [
        (50_000, 0),
        (150_000, 0),
        (150_000, 1),  # bin 1: conf 150k, acc 500k
        (999_999, 1),
        (1_000_000, 1),  # exact top edge joins bin 9, not a bin 10
        (820_000, 1),
        (840_000, 0),
    ]

    def _df(self, spark):
        return spark.createDataFrame(self.ROWS, "score_micro long, label long")

    def test_matches_simulation(self, spark):
        from correctocr_spark.ops.textstats import calibration_report

        got = {
            r["bin"]: (
                r["n"], r["positives"], r["sum_score_micro"],
                r["conf_micro"], r["acc_micro"], r["gap_micro"],
                r["ece_term"],
            )
            for r in calibration_report(self._df(spark), n_bins=10).collect()
        }
        assert got == _cal_simulate(self.ROWS, 10)
        assert 9 in got and got[9][0] == 2  # 999_999 and the 1e6 edge
        assert 10 not in got

    def test_ece_telescopes(self, spark):
        """ECE_micro == sum(ece_term) // N: the per-bin n_b/N weight and
        the per-bin /n_b division cancel exactly in integer micro."""
        from correctocr_spark.ops.textstats import calibration_report

        rows = calibration_report(self._df(spark), n_bins=4).collect()
        total_n = sum(r["n"] for r in rows)
        ece_micro = sum(r["ece_term"] for r in rows) // total_n
        # hand value over the same rows, 4 bins
        sim = _cal_simulate(self.ROWS, 4)
        assert ece_micro == sum(e for *_, e in sim.values()) // len(self.ROWS)
        assert total_n == len(self.ROWS)

    def test_perfectly_calibrated_bin(self, spark):
        from correctocr_spark.ops.textstats import calibration_report

        # two rows at exactly 500_000, one positive: conf == acc
        df = spark.createDataFrame(
            [(500_000, 1), (500_000, 0)], "score_micro long, label long"
        )
        row = calibration_report(df, n_bins=2).collect()[0]
        assert row["gap_micro"] == 0 and row["ece_term"] == 0

    def test_out_of_range_clamps_visibly(self, spark):
        from correctocr_spark.ops.textstats import calibration_report

        df = spark.createDataFrame(
            [(2_000_000, 1), (-5, 0)], "score_micro long, label long"
        )
        got = {r["bin"]: r["n"] for r in calibration_report(df, n_bins=10).collect()}
        assert got == {9: 1, 0: 1}

    def test_validation(self, spark):
        from correctocr_spark.ops.textstats import calibration_report

        with pytest.raises(ValueError, match="n_bins >= 1"):
            calibration_report(self._df(spark), n_bins=0)


# ---------------------------------------------------------------------------
# grouped_split
# ---------------------------------------------------------------------------


class TestGroupedSplit:
    def _df(self, spark):
        return spark.range(0, 400).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("h"), (F.col("id") % 23).cast("string")).alias("host"),
        )

    def test_no_group_straddles_splits(self, spark):
        from correctocr_spark.ops.filters import grouped_split

        out = grouped_split(
            self._df(spark),
            "host",
            weights={"train": 0.8, "val": 0.1, "test": 0.1},
            seed="g1",
        )
        per_host = (
            out.groupBy("host")
            .agg(F.countDistinct("split").alias("k"))
            .collect()
        )
        assert all(r["k"] == 1 for r in per_host)

    def test_matches_hash_thresholds(self, spark):
        from correctocr_spark.ops.filters import grouped_split

        out = grouped_split(
            self._df(spark),
            "host",
            weights={"train": 0.8, "val": 0.1, "test": 0.1},
            seed="g1",
        )
        got = {r["host"]: r["split"] for r in out.collect()}
        t1 = format(int(0.8 * 16**6), "06x")
        t2 = format(int(0.9 * 16**6), "06x")
        for h, s in got.items():
            h6 = hashlib.md5(f"g1:{h}".encode()).hexdigest()[:6]
            expect = "train" if h6 < t1 else ("val" if h6 < t2 else "test")
            assert s == expect, (h, h6, s, expect)

    def test_stable_under_corpus_growth(self, spark):
        """Adding documents (even whole new hosts) never migrates an
        existing host's split — the anti-leakage property across
        snapshot re-runs."""
        from correctocr_spark.ops.filters import grouped_split

        small = self._df(spark)
        big = spark.range(0, 1000).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("h"), (F.col("id") % 61).cast("string")).alias("host"),
        )
        w = {"train": 0.8, "val": 0.1, "test": 0.1}
        a = {
            r["host"]: r["split"]
            for r in grouped_split(small, "host", weights=w, seed="g1")
            .select("host", "split").distinct().collect()
        }
        b = {
            r["host"]: r["split"]
            for r in grouped_split(big, "host", weights=w, seed="g1")
            .select("host", "split").distinct().collect()
        }
        assert all(b[h] == s for h, s in a.items())

    def test_row_local_plan(self, spark):
        from correctocr_spark.ops.filters import grouped_split

        plan = (
            grouped_split(self._df(spark), "host", seed="g1")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
