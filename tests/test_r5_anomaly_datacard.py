"""Session probes for rate_anomalies and corpus_datacard — hand
simulations plus the honest-edge lemmas: sparse-host baselines over
OBSERVED days only, burst-side-only reporting (the div/floor parity
argument), and datacard share/dup identities."""

import datetime
import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# rate_anomalies
# ---------------------------------------------------------------------------


def _anom_simulate(daily, k, thr):
    # daily: {(entity, epoch_day): n}
    out = {}
    per_e = {}
    for (e, d), n in daily.items():
        per_e.setdefault(e, []).append((d, n))
    for e, rows in per_e.items():
        rows.sort()
        for i, (d, x) in enumerate(rows):
            window = rows[max(0, i - k) : i]
            if len(window) != k:
                continue
            s = sum(n for _, n in window)
            s2 = sum(n * n for _, n in window)
            mean = s // k
            var = (k * s2 - s * s) // (k * k)
            std = max(int(math.isqrt(var)), 1)
            if x > mean:
                z = ((x - mean) * 1000) // std
                if z >= thr:
                    out[(e, d)] = (x, mean, z)
    return out


def _day(n):
    return datetime.datetime(1970, 1, 1) + datetime.timedelta(days=n)


class TestRateAnomalies:
    def _events(self, spark):
        rows = []
        # host A: 7 quiet days at ~2/day, then a 40-event storm
        for d in range(7):
            rows += [("A", _day(100 + d))] * 2
        rows += [("A", _day(107))] * 40
        # host B: steady 5/day for 9 days — no alarm
        for d in range(9):
            rows += [("B", _day(100 + d))] * 5
        # host C: only 3 active days — never enough baseline
        for d in range(3):
            rows += [("C", _day(100 + d))] * 9
        return spark.createDataFrame(rows, "host string, ts timestamp")

    def _daily(self):
        daily = {}
        for d in range(7):
            daily[("A", 100 + d)] = 2
        daily[("A", 107)] = 40
        for d in range(9):
            daily[("B", 100 + d)] = 5
        for d in range(3):
            daily[("C", 100 + d)] = 9
        return daily

    def test_matches_simulation(self, spark):
        from correctocr_spark.ops.temporal import rate_anomalies

        got = {
            (r["entity"], r["epoch_day"]): (
                r["n_events"], r["mean_trailing"], r["z_milli"]
            )
            for r in rate_anomalies(
                self._events(spark), baseline_days=7, z_milli_threshold=2000
            ).collect()
        }
        sim = _anom_simulate(self._daily(), 7, 2000)
        assert got == sim
        assert ("A", 107) in got and got[("A", 107)][0] == 40
        # steady host and short-history host never alarm
        assert not any(e == "B" or e == "C" for e, _ in got)

    def test_sparse_host_baseline_is_observed_days(self, spark):
        """Gaps don't pad the window: a host active once a week still
        alarms against its 7 OBSERVED days, not 7 calendar days."""
        from correctocr_spark.ops.temporal import rate_anomalies

        rows = []
        for i in range(7):
            rows += [("S", _day(100 + 7 * i))] * 3
        rows += [("S", _day(200))] * 50
        df = spark.createDataFrame(rows, "host string, ts timestamp")
        got = rate_anomalies(df, baseline_days=7, z_milli_threshold=2000).collect()
        assert len(got) == 1 and got[0]["epoch_day"] == 200

    def test_quiet_days_never_reported(self, spark):
        """The drop-to-zero side is excluded by design (x > mean),
        which is also what keeps every div numerator non-negative."""
        from correctocr_spark.ops.temporal import rate_anomalies

        rows = []
        for d in range(7):
            rows += [("Q", _day(100 + d))] * 30
        rows += [("Q", _day(107))]  # collapse to 1
        df = spark.createDataFrame(rows, "host string, ts timestamp")
        assert (
            rate_anomalies(df, baseline_days=7, z_milli_threshold=0).count() == 0
        )

    def test_validation(self, spark):
        from correctocr_spark.ops.temporal import rate_anomalies

        with pytest.raises(ValueError, match="baseline_days >= 1"):
            rate_anomalies(self._events(spark), baseline_days=0)


# ---------------------------------------------------------------------------
# corpus_datacard
# ---------------------------------------------------------------------------


class TestCorpusDatacard:
    DOCS = [
        (0, "a b c", "en", "web"),
        (1, "a b c", "en", "web"),      # exact dup of 0
        (2, "d e", "da", "web"),
        (3, "f g h i", None, "books"),  # null lang
        (4, "a b c", "en", "web"),      # third copy
    ]

    def _df(self, spark):
        return spark.createDataFrame(
            self.DOCS, "doc_id long, text string, lang string, source string"
        )

    def _card(self, spark):
        from correctocr_spark.ops.cleaning import corpus_datacard

        return {
            (r["section"], r["metric"]): r["value"]
            for r in corpus_datacard(self._df(spark)).collect()
        }

    def test_totals_and_composition(self, spark):
        card = self._card(spark)
        assert card[("total", "docs")] == 5
        assert card[("total", "tokens")] == 3 + 3 + 2 + 4 + 3
        assert card[("total", "chars")] == sum(len(t) for _, t, _, _ in self.DOCS)
        assert card[("distinct", "langs")] == 3  # en, da, <null>
        assert card[("distinct", "sources")] == 2
        assert card[("lang=en", "docs")] == 3
        assert card[("lang=en", "share_bp")] == 6000
        assert card[("lang=<null>", "docs")] == 1
        assert card[("source=books", "docs")] == 1

    def test_dup_metrics_count_all_members(self, spark):
        card = self._card(spark)
        # docs 0, 1, 4 share one fingerprint: ALL THREE are dup-group
        # members (canonical included — the card measures mass, not
        # removals)
        assert card[("dedup", "exact_dup_docs")] == 3
        assert card[("dedup", "exact_dup_bp")] == 6000

    def test_shares_sum_within_floor_slack(self, spark):
        card = self._card(spark)
        shares = [v for (s, m), v in card.items() if m == "share_bp"]
        assert 10000 - len(shares) < sum(shares) <= 10000

    def test_no_dups_reports_zero(self, spark):
        from correctocr_spark.ops.cleaning import corpus_datacard

        df = self._df(spark).where(F.col("doc_id").isin(0, 2, 3))
        card = {
            (r["section"], r["metric"]): r["value"]
            for r in corpus_datacard(df).collect()
        }
        assert card[("dedup", "exact_dup_docs")] == 0
        assert card[("dedup", "exact_dup_bp")] == 0

    def test_uniform_long_schema(self, spark):
        from correctocr_spark.ops.cleaning import corpus_datacard

        out = corpus_datacard(self._df(spark))
        assert out.columns == ["section", "metric", "value"]
        assert dict(out.dtypes)["value"] == "bigint"
