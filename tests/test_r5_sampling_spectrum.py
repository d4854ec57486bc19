"""Unit tests for the sampling/spectrum batch: negative_sampling_table
(^0.75 twin, exact-total ppm invariant, smoothing direction),
freq_spectrum (hand N_r twin, share sums), interarrival_stats (exact
moment twin, metronome/bursty poles, tiebreak determinism)."""

import math
from datetime import datetime

import pytest

from correctocr_spark.ops.temporal import interarrival_stats
from correctocr_spark.ops.textstats import (
    freq_spectrum,
    negative_sampling_table,
)


def _words(spark, counts):
    rows = [(w,) for w, c in counts.items() for _ in range(c)]
    return spark.createDataFrame(rows, "word string")


class TestNegativeSampling:
    def test_matches_python_twin_and_sums_exactly(self, spark):
        counts = {"the": 100, "of": 40, "cat": 10, "dog": 10, "zebu": 1}
        out = {
            r["word"]: r
            for r in negative_sampling_table(
                _words(spark, counts), "word", top_v=10
            ).collect()
        }
        w = {
            k: math.floor(1e6 * (c ** 0.75)) for k, c in counts.items()
        }
        W = sum(w.values())
        base = {k: (1_000_000 * w[k]) // W for k in w}
        order = sorted(w, key=lambda k: (-((1_000_000 * w[k]) % W), k))
        left = 1_000_000 - sum(base.values())
        for i, k in enumerate(order):
            if i < left:
                base[k] += 1
        for k in counts:
            assert out[k]["weight_micro"] == w[k]
            assert out[k]["sample_ppm"] == base[k]
        assert sum(r["sample_ppm"] for r in out.values()) == 1_000_000
        # deterministic tie-break: equal counts rank alphabetically
        assert out["cat"]["rank"] < out["dog"]["rank"]

    def test_smoothing_flattens_the_head(self, spark):
        """^0.75 gives the hot word LESS than proportional share and
        the rare word MORE."""
        counts = {"hot": 1000, "cold": 10}
        out = {
            r["word"]: r["sample_ppm"]
            for r in negative_sampling_table(
                _words(spark, counts), "word", top_v=10
            ).collect()
        }
        prop_hot = 1_000_000 * 1000 // 1010
        assert out["hot"] < prop_hot
        assert out["cold"] > 1_000_000 * 10 // 1010

    def test_top_v_cut_and_validation(self, spark):
        counts = {f"w{i}": 10 - i for i in range(8)}
        out = negative_sampling_table(
            _words(spark, counts), "word", top_v=3
        ).collect()
        assert len(out) == 3
        assert sum(r["sample_ppm"] for r in out) == 1_000_000
        with pytest.raises(ValueError):
            negative_sampling_table(_words(spark, counts), "word", top_v=0)


class TestFreqSpectrum:
    def test_hand_spectrum(self, spark):
        counts = {
            "a": 1, "b": 1, "c": 1, "d": 2, "e": 2, "f": 3, "g": 15,
        }
        out = {
            r["r"]: r
            for r in freq_spectrum(
                _words(spark, counts), "word", max_r=10
            ).collect()
        }
        assert out[1]["n_types"] == 3 and out[1]["n_tokens"] == 3
        assert out[2]["n_types"] == 2 and out[2]["n_tokens"] == 4
        assert out[3]["n_types"] == 1
        assert out[0]["n_types"] == 1 and out[0]["n_tokens"] == 15
        total_types, total_tokens = 7, 25
        assert out[1]["type_share_ppm"] == (1000000 * 3) // total_types
        assert out[0]["token_share_ppm"] == (1000000 * 15) // total_tokens

    def test_no_tail_bucket_when_all_small(self, spark):
        counts = {"a": 1, "b": 2}
        out = freq_spectrum(_words(spark, counts), "word", max_r=5).collect()
        assert {r["r"] for r in out} == {1, 2}
        with pytest.raises(ValueError):
            freq_spectrum(_words(spark, counts), "word", max_r=0)


class TestInterarrival:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_id long"
        )

    def test_matches_moment_twin(self, spark):
        t0 = datetime(2024, 1, 1)
        rows = [
            (1, datetime(2024, 1, 1, 0, 0, 0), 1),
            (1, datetime(2024, 1, 1, 0, 0, 30), 2),
            (1, datetime(2024, 1, 1, 0, 10, 0), 3),
            (2, datetime(2024, 1, 2, 0, 0, 0), 4),
            (2, datetime(2024, 1, 2, 2, 0, 0), 5),
        ]
        r = interarrival_stats(
            self._df(spark, rows), "user_id", "ts", "event_id"
        ).collect()[0]
        gaps = [30, 570, 7200]
        m, s, q = len(gaps), sum(gaps), sum(g * g for g in gaps)
        assert (r["n_gaps"], r["max_gap_sec"]) == (m, 7200)
        assert r["mean_gap_milli"] == (1000 * s) // m
        assert r["cv_milli"] == math.floor(
            1000.0 * math.sqrt(m * q - s * s) / s
        )

    def test_metronome_cv_zero(self, spark):
        rows = [
            (1, datetime(2024, 1, 1, 0, i, 0), i) for i in range(6)
        ]
        r = interarrival_stats(
            self._df(spark, rows), "user_id", "ts", "event_id"
        ).collect()[0]
        assert r["cv_milli"] == 0

    def test_bursty_cv_high(self, spark):
        ts = [0, 1, 2, 3, 4, 86400, 86401, 86402, 86403, 86404]
        rows = [
            (1, datetime.fromtimestamp(1704067200 + t), i)
            for i, t in enumerate(ts)
        ]
        r = interarrival_stats(
            self._df(spark, rows), "user_id", "ts", "event_id"
        ).collect()[0]
        assert r["cv_milli"] > 2000

    def test_single_event_user_contributes_nothing(self, spark):
        rows = [
            (1, datetime(2024, 1, 1), 1),
            (2, datetime(2024, 1, 1), 2),
            (2, datetime(2024, 1, 1, 1), 3),
        ]
        r = interarrival_stats(
            self._df(spark, rows), "user_id", "ts", "event_id"
        ).collect()[0]
        assert r["n_gaps"] == 1 and r["cv_milli"] is None
