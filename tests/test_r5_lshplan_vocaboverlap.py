"""lsh_tuning_curve (python-math twin across the full grid, S-curve
monotonicity in s, knee position vs threshold, bad-arg rejection) and
vocab_overlap (hand Jaccard, disjoint pair absent, identical groups,
unordered canonical pair, null group dropped)."""

import math

import pytest

from correctocr_spark.ops.dedup import lsh_tuning_curve, vocab_overlap


class TestLshTuningCurve:
    def test_matches_python_math(self, spark):
        rows = lsh_tuning_curve(spark, 16, s_step_bp=2500).collect()
        assert len(rows) == 5 * 3  # 5 factorizations × grid {2500,5000,7500}
        for r in rows:
            s = r["s_bp"] / 10000.0
            b, rr = r["bands"], r["rows_per_band"]
            assert r["collide_milli"] == math.floor(
                1000.0 * (1.0 - (1.0 - s**rr) ** b)
            )
            assert r["threshold_milli"] == math.floor(
                1000.0 * (1.0 / b) ** (1.0 / rr)
            )

    def test_monotone_in_similarity(self, spark):
        rows = lsh_tuning_curve(spark, 32, s_step_bp=500).collect()
        by_combo = {}
        for r in rows:
            by_combo.setdefault((r["bands"], r["rows_per_band"]), []).append(
                (r["s_bp"], r["collide_milli"])
            )
        for pts in by_combo.values():
            ys = [y for _, y in sorted(pts)]
            assert all(a <= b for a, b in zip(ys, ys[1:]))

    def test_knee_brackets_threshold(self, spark):
        # at s just below/above the threshold the curve crosses 50%
        # within a coarse neighbourhood for a mid-shaped combo (b=r)
        rows = [
            r
            for r in lsh_tuning_curve(spark, 16, s_step_bp=100).collect()
            if r["bands"] == 4
        ]
        thr = rows[0]["threshold_milli"]
        below = [r for r in rows if r["s_bp"] < thr * 10 - 1500]
        above = [r for r in rows if r["s_bp"] > thr * 10 + 1500]
        assert below and above
        assert max(r["collide_milli"] for r in below) < 500
        assert min(r["collide_milli"] for r in above) > 500

    def test_bad_args_rejected(self, spark):
        with pytest.raises(ValueError):
            lsh_tuning_curve(spark, 0)
        with pytest.raises(ValueError):
            lsh_tuning_curve(spark, 16, s_step_bp=10000)


class TestVocabOverlap:
    def test_hand_jaccard(self, spark):
        d = spark.createDataFrame(
            [("en", "a b c"), ("de", "b c d"), ("fr", "x")],
            "lang string, text string",
        )
        rows = vocab_overlap(d).collect()
        assert len(rows) == 1  # fr shares nothing → pair absent
        r = rows[0]
        assert (r["grp_a"], r["grp_b"]) == ("de", "en")
        assert (r["vocab_a"], r["vocab_b"], r["inter"]) == (3, 3, 2)
        assert r["jaccard_bp"] == (10000 * 2) // 4

    def test_identical_groups_full_overlap(self, spark):
        d = spark.createDataFrame(
            [("a", "x y"), ("b", "y x x")], "lang string, text string"
        )
        r = vocab_overlap(d).first()
        assert r["jaccard_bp"] == 10000

    def test_null_group_dropped(self, spark):
        d = spark.createDataFrame(
            [("a", "x"), (None, "x y"), ("b", "x")],
            "lang string, text string",
        )
        rows = vocab_overlap(d).collect()
        assert len(rows) == 1
        assert rows[0]["vocab_a"] == 1 and rows[0]["vocab_b"] == 1
