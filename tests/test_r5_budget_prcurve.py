"""Session probes for select_to_budget and pr_curve — hand simulations
plus the plan/scale lemmas: no partitionless window over the corpus in
the budget selection, exact boundary semantics, and PR identities."""

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# select_to_budget
# ---------------------------------------------------------------------------


def _budget_simulate(rows, budget):
    # rows: (doc_id, n_tokens, score)
    out, before = {}, 0
    for did, n, s in sorted(rows, key=lambda t: (-t[2], t[0])):
        out[did] = (n, s, before, 1 if before < budget else 0)
        before += n
    return out


class TestSelectToBudget:
    ROWS = [
        (0, 4, 900), (1, 3, 900),   # tie on score: doc 0 first
        (2, 5, 800),
        (3, 2, 700),
        (4, 10, 600),
        (5, 1, 500),
    ]

    def _df(self, spark):
        return spark.createDataFrame(
            [(d, "w " * n, s) for d, n, s in self.ROWS],
            "doc_id long, text string, q long",
        )

    def test_matches_simulation(self, spark):
        from correctocr_spark.ops.cleaning import select_to_budget

        got = {
            r["doc_id"]: (
                r["n_tokens"], r["score"], r["tokens_before"], r["selected"]
            )
            for r in select_to_budget(self._df(spark), 10, "q").collect()
        }
        assert got == _budget_simulate(self.ROWS, 10)
        # boundary: doc 2 starts at 7 < 10 and STRADDLES (7+5=12): kept
        assert got[2][3] == 1
        # doc 3 starts at 12 >= 10: dropped
        assert got[3][3] == 0

    def test_every_doc_returned_and_audit_sums(self, spark):
        from correctocr_spark.ops.cleaning import select_to_budget

        out = select_to_budget(self._df(spark), 10, "q").collect()
        assert len(out) == len(self.ROWS)
        total = sum(r["n_tokens"] for r in out)
        assert max(r["tokens_before"] + r["n_tokens"] for r in out) == total

    def test_bucket_decomposition_matches_global_window(self, spark):
        """Force many tiny buckets (width 1 via bucket_size=1): the
        two-pass result must equal the naive global cumsum."""
        from correctocr_spark.ops.cleaning import select_to_budget

        df = spark.range(0, 300).select(
            F.col("id").alias("doc_id"),
            F.lit("a b c").alias("text"),
            ((F.col("id") * 7) % 40).cast("long").alias("q"),
        )
        got = {
            r["doc_id"]: (r["tokens_before"], r["selected"])
            for r in select_to_budget(df, 100, "q", bucket_size=1).collect()
        }
        rows = [(i, 3, (i * 7) % 40) for i in range(300)]
        sim = {d: (b, s) for d, (n, q, b, s) in _budget_simulate(rows, 100).items()}
        assert got == sim

    def test_no_partitionless_window(self, spark):
        from correctocr_spark.ops.cleaning import select_to_budget

        plan = (
            select_to_budget(self._df(spark), 10, "q")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # every Window node must carry a partition spec (the _bucket key)
        for line in plan.splitlines():
            if "Window " in line or line.strip().startswith("Window"):
                assert "_bucket" in line, line

    def test_validation(self, spark):
        from correctocr_spark.ops.cleaning import select_to_budget

        with pytest.raises(ValueError, match="budget >= 0"):
            select_to_budget(self._df(spark), -1, "q")
        bad = self._df(spark).withColumn("qf", F.col("q") / 2.0)
        with pytest.raises(ValueError, match="integer"):
            select_to_budget(bad, 10, "qf")

    def test_empty_corpus_shape(self, spark):
        from correctocr_spark.ops.cleaning import select_to_budget

        out = select_to_budget(self._df(spark).where(F.lit(False)), 10, "q")
        assert out.count() == 0
        assert out.columns == [
            "doc_id", "n_tokens", "score", "tokens_before", "selected",
        ]


# ---------------------------------------------------------------------------
# pr_curve
# ---------------------------------------------------------------------------


def _pr_simulate(rows):
    # rows: (score, label)
    P = sum(l for _, l in rows)
    out = {}
    for t in {s for s, _ in rows}:
        above = [(s, l) for s, l in rows if s >= t]
        tp = sum(l for _, l in above)
        n = len(above)
        fp, fn = n - tp, P - tp
        out[t] = (
            n, tp, fp, fn,
            10000 * tp // n,
            10000 * tp // P if P else None,
            20000 * tp // (n + P) if P else None,
        )
    return out


class TestPrCurve:
    ROWS = [
        (90, 1), (90, 1), (80, 0), (70, 1), (60, 0), (60, 0), (50, 1), (40, 0),
    ]

    def _df(self, spark):
        return spark.createDataFrame(self.ROWS, "score long, label long")

    def test_matches_simulation(self, spark):
        from correctocr_spark.ops.textstats import pr_curve

        got = {
            r["threshold"]: (
                r["n_at_or_above"], r["tp"], r["fp"], r["fn"],
                r["precision_bp"], r["recall_bp"], r["f1_bp"],
            )
            for r in pr_curve(self._df(spark)).collect()
        }
        assert got == _pr_simulate(self.ROWS)
        # lowest threshold: everything predicted positive → recall 10000
        assert got[40][5] == 10000
        # highest threshold is the pure-positive bucket → precision 10000
        assert got[90][4] == 10000

    def test_monotone_identities(self, spark):
        from correctocr_spark.ops.textstats import pr_curve

        rows = sorted(pr_curve(self._df(spark)).collect(), key=lambda r: -r["threshold"])
        # recall is monotone non-decreasing as the threshold lowers;
        # n_at_or_above strictly increases (each threshold adds rows)
        for a, b in zip(rows, rows[1:]):
            assert b["recall_bp"] >= a["recall_bp"]
            assert b["n_at_or_above"] > a["n_at_or_above"]
        assert rows[-1]["fn"] == 0

    def test_no_positives_reports_null(self, spark):
        from correctocr_spark.ops.textstats import pr_curve

        df = spark.createDataFrame([(10, 0), (20, 0)], "score long, label long")
        for r in pr_curve(df).collect():
            assert r["recall_bp"] is None and r["f1_bp"] is None
            assert r["precision_bp"] == 0

    def test_f1_argmax_usable(self, spark):
        from correctocr_spark.ops.textstats import pr_curve

        best = (
            pr_curve(self._df(spark))
            .orderBy(F.desc("f1_bp"), F.asc("threshold"))
            .first()
        )
        sim = _pr_simulate(self.ROWS)
        assert best["f1_bp"] == max(v[6] for v in sim.values())
