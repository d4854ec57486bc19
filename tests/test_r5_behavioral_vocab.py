"""Unit tests for the behavioral/vocab batch: vocab_coverage_curve
(hand Zipf table, beyond-vocab saturation), event_funnel (strict
ordering, first-touch, hop medians), cohort_retention (hand triangle,
offset-0 identity), event_transitions (chain counts, same-ts
tiebreak)."""

from datetime import datetime

import pytest

from correctocr_spark.ops.temporal import (
    cohort_retention,
    event_funnel,
    event_transitions,
)
from correctocr_spark.ops.textstats import vocab_coverage_curve


def _ts(day, hour=0, minute=0):
    return datetime(2024, 1, day, hour, minute)


class TestVocabCoverage:
    def test_hand_zipf_table(self, spark):
        words = (
            ["the"] * 50 + ["of"] * 30 + ["cat"] * 15 + ["dog"] * 4
            + ["zebu"] * 1
        )
        df = spark.createDataFrame([(w,) for w in words], "word string")
        out = {
            r["vocab_size"]: r
            for r in vocab_coverage_curve(
                df, "word", sizes=(1, 2, 3, 10)
            ).collect()
        }
        assert out[1]["covered_tokens"] == 50
        assert out[1]["coverage_ppm"] == (1000000 * 50) // 100
        assert out[2]["covered_tokens"] == 80
        assert out[3]["covered_tokens"] == 95
        # size past the vocabulary: full coverage, true type count
        assert out[10]["n_types"] == 5
        assert out[10]["coverage_ppm"] == 1000000

    def test_tie_break_deterministic(self, spark):
        """Equal counts rank alphabetically — size-1 coverage picks
        'aa', not 'bb'."""
        words = ["bb"] * 3 + ["aa"] * 3 + ["cc"] * 2
        df = spark.createDataFrame([(w,) for w in words], "word string")
        out = {
            r["vocab_size"]: r
            for r in vocab_coverage_curve(df, "word", sizes=(1,)).collect()
        }
        assert out[1]["covered_tokens"] == 3
        with pytest.raises(ValueError):
            vocab_coverage_curve(df, "word", sizes=())


class TestEventFunnel:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "user_id long, event_type string, ts timestamp"
        )

    def test_strict_ordering_and_medians(self, spark):
        rows = [
            # u1: full funnel, gaps 60 s then 120 s
            (1, "view", _ts(1, 10, 0)), (1, "click", _ts(1, 10, 1)),
            (1, "purchase", _ts(1, 10, 3)),
            # u2: clicks BEFORE viewing -> click must not count
            (2, "click", _ts(2, 9, 0)), (2, "view", _ts(2, 10, 0)),
            # u3: view then click, gap 300 s, no purchase
            (3, "view", _ts(3, 8, 0)), (3, "click", _ts(3, 8, 5)),
        ]
        out = {
            r["step_idx"]: r
            for r in event_funnel(
                self._df(spark, rows), "user_id", "event_type", "ts",
                ["view", "click", "purchase"],
            ).collect()
        }
        assert out[1]["n_users"] == 3 and out[1]["conversion_ppm"] == 1000000
        assert out[1]["med2_gap_sec"] is None
        assert out[2]["n_users"] == 2  # u1 and u3; u2's early click void
        assert out[2]["conversion_ppm"] == (1000000 * 2) // 3
        # gaps {60, 300} -> doubled median 360
        assert out[2]["med2_gap_sec"] == 360
        assert out[3]["n_users"] == 1
        assert out[3]["med2_gap_sec"] == 2 * 120

    def test_first_touch_semantics(self, spark):
        """Second view earlier than the click does not reset the
        chain; the FIRST view anchors it."""
        rows = [
            (1, "view", _ts(1, 10)), (1, "view", _ts(1, 12)),
            (1, "click", _ts(1, 11)),
        ]
        out = {
            r["step_idx"]: r
            for r in event_funnel(
                self._df(spark, rows), "user_id", "event_type", "ts",
                ["view", "click"],
            ).collect()
        }
        assert out[2]["n_users"] == 1
        assert out[2]["med2_gap_sec"] == 2 * 3600
        with pytest.raises(ValueError):
            event_funnel(
                self._df(spark, rows), "user_id", "event_type", "ts", []
            )


class TestCohortRetention:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "user_id long, ts timestamp")

    def test_hand_triangle(self, spark):
        rows = [
            # cohort week of Jan 1: users 1, 2
            (1, _ts(1)), (2, _ts(2)),
            # user 1 returns the following week; user 2 does not
            (1, _ts(9)),
            # cohort of Jan 8: user 3, returns two weeks later
            (3, _ts(10)), (3, _ts(24)),
        ]
        out = {
            (r["cohort_period"], r["offset_periods"]): r
            for r in cohort_retention(
                self._df(spark, rows), "user_id", "ts", period_days=7
            ).collect()
        }
        # epoch-week of 2024-01-01 (day 19723 -> week 2817)
        w0 = 19723 // 7
        r00 = out[(w0, 0)]
        assert r00["cohort_users"] == 2 and r00["active_users"] == 2
        assert r00["retention_ppm"] == 1000000
        assert out[(w0, 1)]["active_users"] == 1
        assert out[(w0, 1)]["retention_ppm"] == 500000
        assert out[(w0 + 1, 2)]["active_users"] == 1
        with pytest.raises(ValueError):
            cohort_retention(self._df(spark, rows), "user_id", "ts", 0)

    def test_multiple_events_one_period_count_once(self, spark):
        rows = [(1, _ts(1)), (1, _ts(2)), (1, _ts(3))]
        out = cohort_retention(
            self._df(spark, rows), "user_id", "ts", period_days=7
        ).collect()
        assert len(out) == 1 and out[0]["active_users"] == 1


class TestEventTransitions:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "user_id long, event_type string, ts timestamp,"
            " event_id long"
        )

    def test_chain_counts_and_ppm(self, spark):
        rows = [
            (1, "view", _ts(1, 1), 1), (1, "click", _ts(1, 2), 2),
            (1, "view", _ts(1, 3), 3), (1, "click", _ts(1, 4), 4),
            (2, "view", _ts(1, 1), 5), (2, "error", _ts(1, 2), 6),
        ]
        out = {
            (r["prev_type"], r["next_type"]): r
            for r in event_transitions(
                self._df(spark, rows), "user_id", "event_type", "ts",
                "event_id",
            ).collect()
        }
        assert out[("view", "click")]["n"] == 2
        assert out[("view", "error")]["n"] == 1
        assert out[("click", "view")]["n"] == 1
        # row-normalization: view -> {click: 2/3, error: 1/3}
        assert out[("view", "click")]["ppm"] == (1000000 * 2) // 3
        assert out[("view", "error")]["ppm"] == (1000000 * 1) // 3
        assert out[("click", "view")]["ppm"] == 1000000

    def test_same_ts_tiebreak(self, spark):
        """Two events at the same timestamp order by event_id, so the
        transition is a->b, never b->a."""
        rows = [
            (1, "a", _ts(1, 1), 10), (1, "b", _ts(1, 1), 11),
        ]
        out = event_transitions(
            self._df(spark, rows), "user_id", "event_type", "ts",
            "event_id",
        ).collect()
        assert len(out) == 1
        assert (out[0]["prev_type"], out[0]["next_type"]) == ("a", "b")
