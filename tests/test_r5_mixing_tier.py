"""Edge-case pins for the round-5 mixing/serving tier:
unimax_allocation + padding_sweep (cleaning), conformal_threshold
(textstats), hard_negatives (similarity). DuckDB hash oracles live in
__spark_entry__ (unimax_plan / padding_plan / conformal_gate /
hard_negatives)."""

import pytest

from pyspark.sql import functions as F


class TestUnimaxAllocation:
    def _langs(self, spark, spec):
        rows = []
        for g, n in spec:
            rows += [(g,)] * n
        return spark.createDataFrame(rows, "lang string")

    def test_hand_waterfill(self, spark):
        """Caps (E=2): en 2000, fr 600, de 200, zh 60; B=1500 ->
        zh/de/fr saturate, en gets the 640 leftover."""
        from correctocr_spark.ops.cleaning import unimax_allocation

        d = self._langs(
            spark, [("en", 1000), ("fr", 300), ("de", 100), ("zh", 30)]
        )
        out = {r["grp"]: r for r in unimax_allocation(
            d, budget=1500, epochs_cap=2
        ).collect()}
        assert out["zh"]["allocation"] == 60 and out["zh"]["saturated"]
        assert out["de"]["allocation"] == 200 and out["fr"]["allocation"] == 600
        assert out["en"]["allocation"] == 640 and not out["en"]["saturated"]
        assert sum(r["allocation"] for r in out.values()) == 1500

    def test_budget_exceeds_data_all_saturate(self, spark):
        from correctocr_spark.ops.cleaning import unimax_allocation

        d = self._langs(spark, [("en", 50), ("fr", 20)])
        out = unimax_allocation(d, budget=10**6, epochs_cap=3).collect()
        for r in out:
            assert r["saturated"] and r["allocation"] == r["cap"]
            assert r["epochs_milli"] == 3000

    def test_remainder_distributed_deterministically(self, spark):
        """Budget 101 over two equal unsaturated langs: floor level 50,
        remainder 1 goes to the (cap, grp)-first language."""
        from correctocr_spark.ops.cleaning import unimax_allocation

        d = self._langs(spark, [("aa", 500), ("bb", 500)])
        out = {r["grp"]: r["allocation"] for r in unimax_allocation(
            d, budget=101, epochs_cap=1
        ).collect()}
        assert out == {"aa": 51, "bb": 50}

    def test_budget_exactly_consumed(self, spark):
        from correctocr_spark.ops.cleaning import unimax_allocation

        d = self._langs(spark, [("a", 300), ("b", 100), ("c", 7)])
        for b in (11, 107, 313, 800):
            total = sum(
                r["allocation"]
                for r in unimax_allocation(d, budget=b, epochs_cap=2).collect()
            )
            assert total == min(b, 2 * 407), (b, total)

    def test_validation(self, spark):
        from correctocr_spark.ops.cleaning import unimax_allocation

        d = self._langs(spark, [("a", 1)])
        with pytest.raises(ValueError):
            unimax_allocation(d, budget=-1)
        with pytest.raises(ValueError):
            unimax_allocation(d, budget=1, epochs_cap=0)


class TestPaddingSweep:
    def test_hand_case(self, spark):
        from correctocr_spark.ops.cleaning import padding_sweep

        df = spark.createDataFrame(
            [(1, 100), (2, 600), (3, 1200)], "id long, toks long"
        )
        out = {r["cap"]: r for r in padding_sweep(df, "toks", (512,)).collect()}
        r = out[512]
        # used = 100 + 512 + 512 = 1124; sequences = ceil(1124/512) = 3
        assert r["tokens_used"] == 1124
        assert r["n_truncated_docs"] == 2
        assert r["sequences"] == 3
        assert r["pad_last"] == 3 * 512 - 1124

    def test_cap_above_all_docs_no_truncation(self, spark):
        from correctocr_spark.ops.cleaning import padding_sweep

        df = spark.createDataFrame([(1, 10), (2, 20)], "id long, toks long")
        r = padding_sweep(df, "toks", (1024,)).collect()[0]
        assert r["n_truncated_docs"] == 0 and r["tokens_truncated_bp"] == 0
        assert r["sequences"] == 1 and r["pad_last"] == 1024 - 30

    def test_validation(self, spark):
        from correctocr_spark.ops.cleaning import padding_sweep

        df = spark.createDataFrame([(1, 10)], "id long, toks long")
        with pytest.raises(ValueError):
            padding_sweep(df, "toks", ())
        with pytest.raises(ValueError):
            padding_sweep(df, "toks", (0,))


class TestConformalThreshold:
    def test_textbook_rank(self, spark):
        """n=19, alpha=10%: k = ceil(20*0.9) = 18 -> the 18th smallest
        of scores 1..19 is 18."""
        from correctocr_spark.ops.textstats import conformal_threshold

        df = spark.createDataFrame([(i,) for i in range(1, 20)], "s long")
        r = conformal_threshold(df, "s", alpha_bp=1000).collect()[0]
        assert r["k_rank"] == 18 and r["threshold"] == 18

    def test_small_calibration_set_null(self, spark):
        from correctocr_spark.ops.textstats import conformal_threshold

        df = spark.createDataFrame([(5,), (9,)], "s long")
        r = conformal_threshold(df, "s", alpha_bp=1000).collect()[0]
        assert r["k_rank"] == 3 and r["threshold"] is None

    def test_coverage_guarantee_holds_empirically(self, spark):
        """Accepting test scores <= threshold covers >= 1 - alpha of an
        exchangeable sample (here: same distribution by construction)."""
        from correctocr_spark.ops.textstats import conformal_threshold

        cal = spark.createDataFrame(
            [((i * 37) % 1009,) for i in range(500)], "s long"
        )
        thr = conformal_threshold(cal, "s", alpha_bp=2000).collect()[0][
            "threshold"
        ]
        test = [(i * 41) % 1009 for i in range(500)]
        covered = sum(1 for v in test if v <= thr) / len(test)
        assert covered >= 0.78  # 1 - alpha with sampling slack

    def test_validation(self, spark):
        from correctocr_spark.ops.textstats import conformal_threshold

        df = spark.createDataFrame([(1,)], "s long")
        with pytest.raises(ValueError):
            conformal_threshold(df, "s", alpha_bp=0)
        with pytest.raises(ValueError):
            conformal_threshold(df, "s", alpha_bp=10000)


class TestHardNegatives:
    def _emb(self, spark):
        vecs = [
            (i, [float(((i * j * 7) % 19 - 9) / 9.0) for j in range(1, 9)], i % 3)
            for i in range(40)
        ]
        return spark.createDataFrame(
            vecs, "vec_id long, embedding array<double>, label int"
        )

    def test_no_same_label_negatives(self, spark):
        from correctocr_spark.ops.similarity import hard_negatives

        emb = self._emb(spark)
        anchors = emb.where("vec_id < 3")
        out = hard_negatives(emb, anchors, k=6).collect()
        albl = {r["vec_id"]: r["label"] for r in anchors.collect()}
        for r in out:
            assert r["label"] != albl[r["anchor_id"]]

    def test_k_rows_per_anchor_ranked(self, spark):
        from correctocr_spark.ops.similarity import hard_negatives

        emb = self._emb(spark)
        out = hard_negatives(emb, emb.where("vec_id < 2"), k=4).collect()
        per = {}
        for r in out:
            per.setdefault(r["anchor_id"], []).append(r)
        for rows in per.values():
            rows.sort(key=lambda r: r["rank"])
            assert [r["rank"] for r in rows] == [1, 2, 3, 4]
            cosines = [r["cosine"] for r in rows]
            assert cosines == sorted(cosines, reverse=True)

    def test_validation(self, spark):
        from correctocr_spark.ops.similarity import hard_negatives

        emb = self._emb(spark)
        with pytest.raises(ValueError):
            hard_negatives(emb, emb.where("vec_id < 1"), k=0)
