"""sanitize_controls (strip set vs keep set, exact n_removed, NULL
pass-through) and mass_tiers (hand Lorenz sims, boundary-crossing key
joins the smaller tier, single-key, validation)."""

import pytest
from pyspark.sql import functions as F

from correctocr_spark.ops.cleaning import mass_tiers
from correctocr_spark.ops.textstats import sanitize_controls


class TestSanitizeControls:
    def test_strip_and_keep_sets(self, spark):
        cases = [
            (0, "﻿bom at start", "bom at start", 1),
            (1, "bidi ‮evil‬ spoof", "bidi evil spoof", 2),
            (2, "nul\x00 and unit\x1f seps", "nul and unit seps", 2),
            (3, "c1 smuggle \x85\x9f here", "c1 smuggle  here", 2),
            # TAB/LF/CR are structure, ZWJ/ZWNJ are orthography — kept
            (4, "keep\tthese\nlines\rok", "keep\tthese\nlines\rok", 0),
            (5, "emoji \U0001f469‍\U0001f4bb seq", "emoji \U0001f469‍\U0001f4bb seq", 0),
            (6, "lrm‎ rlm‏ isolates⁦⁩", "lrm rlm isolates", 4),
            (7, None, None, 0),
            (8, "", "", 0),
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t, _, _ in cases], "doc_id long, text string"
        )
        got = {
            r["doc_id"]: (r["clean_text"], r["n_removed"])
            for r in sanitize_controls(df).collect()
        }
        for i, _, clean, n in cases:
            assert got[i] == (clean, n), (i, got[i])

    def test_row_local_plan(self, spark):
        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        plan = (
            sanitize_controls(df)._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan and "BatchEvalPython" not in plan


class TestMassTiers:
    def test_hand_lorenz(self, spark):
        # masses 50, 30, 15, 5 (total 100): head_bp=5000 → h1 (cum
        # before 0) is head; h2 (cum before 50%) is torso; h3 (80%)
        # torso; h4 (95%) tail with torso_bp=9000
        rows = [("h1", 50), ("h2", 30), ("h3", 15), ("h4", 5)]
        df = spark.createDataFrame(rows, "host string, m long")
        got = {
            r["key"]: (r["rank"], r["cum_mass"], r["share_bp"], r["cum_share_bp"], r["tier"])
            for r in mass_tiers(df, "host", "m").collect()
        }
        assert got["h1"] == (1, 50, 5000, 5000, "head")
        assert got["h2"] == (2, 80, 3000, 8000, "torso")
        assert got["h3"] == (3, 95, 1500, 9500, "torso")
        assert got["h4"] == (4, 100, 500, 10000, "tail")

    def test_boundary_crossing_key_joins_smaller_tier(self, spark):
        # one giant key covering 99%: cum_before = 0 < head → head;
        # the rest are tail (cum_before 99% ≥ torso_bp)
        rows = [("big", 99)] + [(f"t{i}", 1) for i in range(1)]
        df = spark.createDataFrame(rows, "host string, m long")
        got = {r["key"]: r["tier"] for r in mass_tiers(df, "host", "m").collect()}
        assert got["big"] == "head" and got["t0"] == "tail"

    def test_rowcount_weight_default_and_single_key(self, spark):
        df = spark.createDataFrame([("only",)] * 7, "host string")
        rows = mass_tiers(df, "host").collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r["mass"], r["cum_share_bp"], r["tier"]) == (7, 10000, "head")

    def test_validation(self, spark):
        df = spark.createDataFrame([("a", 1)], "host string, m long")
        with pytest.raises(ValueError):
            mass_tiers(df, "host", "m", head_bp=9000, torso_bp=5000)
