"""term_burstiness (hand Fano with zero-fill, steady-term zero, single
-day spike, min_count gate) and sorted_neighborhood (hand pair set
across bucket seams, integer-key bucketing, window width, degenerate
window rejection, empty input)."""

import pytest

from correctocr_spark.ops.dedup import sorted_neighborhood
from correctocr_spark.ops.textstats import term_burstiness


class TestTermBurstiness:
    def test_hand_fano(self, spark):
        d = spark.createDataFrame(
            [(0, "x x y"), (1, "x z"), (2, "x")], "day long, text string"
        )
        got = {
            r["term"]: (r["n_total"], r["days_active"], r["fano_milli"])
            for r in term_burstiness(d, "day", min_count=1).collect()
        }
        # x: D=3 S=4 Q=6 → 1000·(18−16) div 12 = 166
        assert got["x"] == (4, 3, 166)
        # y: S=1 Q=1 → 1000·(3−1) div 3 = 666 (spike over 3 days)
        assert got["y"] == (1, 1, 666)

    def test_steady_term_zero(self, spark):
        d = spark.createDataFrame(
            [(0, "a a"), (1, "a a"), (2, "a a")], "day long, text string"
        )
        r = term_burstiness(d, "day", min_count=1).first()
        assert r["fano_milli"] == 0

    def test_single_day_spike_scales_with_mass(self, spark):
        d = spark.createDataFrame(
            [(0, "s " * 10), (1, "t")], "day long, text string"
        )
        got = {
            r["term"]: r["fano_milli"]
            for r in term_burstiness(d, "day", min_count=1).collect()
        }
        # s: D=2 S=10 Q=100 → 1000·(200−100) div 20 = 5000
        assert got["s"] == 5000

    def test_min_count_gate(self, spark):
        d = spark.createDataFrame([(0, "a a a b")], "day long, text string")
        terms = {
            r["term"] for r in term_burstiness(d, "day", min_count=3).collect()
        }
        assert terms == {"a"}


class TestSortedNeighborhood:
    def test_hand_pairs_cross_bucket(self, spark):
        rows = [(1, "bb"), (2, "aa"), (3, "ab"), (4, "ba"), (5, "aa")]
        df = spark.createDataFrame(rows, "doc_id long, key string")
        # order: (aa,2)(aa,5)(ab,3)(ba,4)(bb,1); prefix_len=1 puts the
        # a*/b* seam between ranks 3 and 4 — pairs must cross it
        got = {
            (r["id_a"], r["id_b"], r["gap"])
            for r in sorted_neighborhood(
                df, "key", window=3, prefix_len=1
            ).collect()
        }
        assert got == {
            (2, 5, 1), (2, 3, 2), (5, 3, 1), (5, 4, 2),
            (3, 4, 1), (3, 1, 2), (4, 1, 1),
        }

    def test_integer_key_buckets(self, spark):
        rows = [(i, 100 - i) for i in range(1, 8)]
        df = spark.createDataFrame(rows, "doc_id long, key long")
        got = sorted_neighborhood(
            df, "key", window=2, bucket_size=2, max_buckets=4
        ).collect()
        # ascending key = descending id: ranks pair 7→6→...→1
        assert {(r["id_a"], r["id_b"]) for r in got} == {
            (i + 1, i) for i in range(1, 7)
        }

    def test_window_width(self, spark):
        df = spark.createDataFrame(
            [(i, f"k{i}") for i in range(5)], "doc_id long, key string"
        )
        n2 = sorted_neighborhood(df, "key", window=2).count()
        n4 = sorted_neighborhood(df, "key", window=4).count()
        assert (n2, n4) == (4, 9)  # w=4 over 5 ranks: 3+3+2+1

    def test_window_below_two_rejected(self, spark):
        df = spark.createDataFrame([(1, "k")], "doc_id long, key string")
        with pytest.raises(ValueError):
            sorted_neighborhood(df, "key", window=1)

    def test_empty_input(self, spark):
        df = spark.createDataFrame([], "doc_id long, key string")
        assert sorted_neighborhood(df, "key").count() == 0
