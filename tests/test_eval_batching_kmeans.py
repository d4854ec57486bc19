"""Round-5 session ops: LSH recall eval, Lloyd k-means step,
length-bucketed batch packing, shuffle-key skew report."""

import pytest
from pyspark.sql import Row, functions as F


class TestLshRecallReport:
    def _docs(self, spark):
        # 3 near-dup pairs (one word changed in 30) + unrelated docs
        rows = []
        for g in range(3):
            text = " ".join(f"g{g}w{i}" for i in range(30))
            rows.append(Row(doc_id=10 * g, text=text))
            rows.append(Row(doc_id=10 * g + 1, text=text.replace(f"g{g}w20", "z")))
        for j in range(5):
            rows.append(
                Row(doc_id=100 + j, text=" ".join(f"u{j}_{i}" for i in range(25)))
            )
        return spark.createDataFrame(rows)

    def test_counts_and_bounds(self, spark):
        from correctocr_spark.ops.dedup import lsh_recall_report

        rep = lsh_recall_report(
            self._docs(spark), threshold=0.5, k=3, num_hashes=8, bands=4
        ).collect()[0]
        # the 3 constructed pairs are >=0.5 Jaccard ground truth
        assert rep["n_exact"] == 3
        assert 0 <= rep["n_hit"] <= rep["n_exact"]
        assert rep["n_hit"] <= rep["n_candidates"]
        assert 0 <= rep["recall_bp"] <= 10000
        assert 0 <= rep["precision_bp"] <= 10000
        # 8 hashes / 4 bands over ~93% Jaccard pairs: all found
        assert rep["recall_bp"] == 10000

    def test_hot_bucket_cap_lowers_recall_never_raises(self, spark):
        from correctocr_spark.ops.dedup import lsh_recall_report

        docs = self._docs(spark)
        free = lsh_recall_report(docs, threshold=0.5, num_hashes=8, bands=4)
        capped = lsh_recall_report(
            docs, threshold=0.5, num_hashes=8, bands=4, max_bucket=1
        )
        f, c = free.collect()[0], capped.collect()[0]
        assert c["n_candidates"] <= f["n_candidates"]
        assert c["recall_bp"] <= f["recall_bp"]

    def test_empty_corpus_one_row_zero_bp(self, spark):
        from correctocr_spark.ops.dedup import lsh_recall_report

        empty = spark.createDataFrame([], "doc_id long, text string")
        rep = lsh_recall_report(empty).collect()
        assert len(rep) == 1
        assert rep[0]["n_exact"] == 0 and rep[0]["recall_bp"] == 0


class TestKmeansStep:
    CENTS = [[0.0, 0.0], [10.0, 10.0]]

    def _emb(self, spark):
        rows = [
            Row(vec_id=0, embedding=[0.5, -0.5]),
            Row(vec_id=1, embedding=[1.0, 0.25]),
            Row(vec_id=2, embedding=[9.0, 11.0]),
        ]
        return spark.createDataFrame(rows)

    def test_stats_exact(self, spark):
        from correctocr_spark.ops.similarity import kmeans_step_stats

        got = {
            (r["centroid_id"], r["dim"]): (r["n"], r["sum_q"])
            for r in kmeans_step_stats(self._emb(spark), self.CENTS).collect()
        }
        assert got == {
            (0, 1): (2, 1_500_000),  # 0.5 + 1.0
            (0, 2): (2, -250_000),  # -0.5 + 0.25
            (1, 1): (1, 9_000_000),
            (1, 2): (1, 11_000_000),
        }

    def test_new_centroids_mean_and_empty_cluster_holds(self, spark):
        from correctocr_spark.ops.similarity import (
            kmeans_new_centroids,
            kmeans_step_stats,
        )

        cents = [[0.0, 0.0], [10.0, 10.0], [99.0, 99.0]]  # 3rd captures nothing
        stats = kmeans_step_stats(self._emb(spark), cents)
        new = kmeans_new_centroids(stats, cents)
        assert new[0] == [0.75, -0.125]
        assert new[1] == [9.0, 11.0]
        assert new[2] == [99.0, 99.0]  # empty cluster keeps its position

    def test_train_converges_to_the_two_blobs(self, spark):
        from correctocr_spark.ops.similarity import kmeans_train

        out = kmeans_train(self._emb(spark), [[0.0, 0.0], [5.0, 5.0]], iters=3)
        assert out[0] == [0.75, -0.125]
        assert out[1] == [9.0, 11.0]

    def test_stats_stable_under_repartition(self, spark):
        from correctocr_spark.ops.similarity import kmeans_step_stats

        emb = self._emb(spark)
        a = sorted(map(tuple, kmeans_step_stats(emb, self.CENTS).collect()))
        b = sorted(
            map(tuple, kmeans_step_stats(emb.repartition(7), self.CENTS).collect())
        )
        assert a == b


class TestPackBatches:
    def _docs(self, spark, lengths):
        return spark.createDataFrame(
            [
                Row(doc_id=i, text=" ".join(f"t{j}" for j in range(n)))
                for i, n in enumerate(lengths)
            ]
        )

    def test_batches_are_length_sorted_chunks(self, spark):
        from correctocr_spark.ops.cleaning import pack_batches

        # all in one bucket (width 100): order by len desc -> batches of 2
        out = pack_batches(
            self._docs(spark, [10, 20, 30, 40, 50]),
            batch_size=2,
            bucket_width=100,
        ).collect()
        by_doc = {r["doc_id"]: r for r in out}
        assert all(r["bucket"] == 0 for r in out)
        # len desc: 50,40 | 30,20 | 10
        assert by_doc[4]["batch"] == 0 and by_doc[3]["batch"] == 0
        assert by_doc[2]["batch"] == 1 and by_doc[1]["batch"] == 1
        assert by_doc[0]["batch"] == 2

    def test_padding_bounded_by_bucket_width(self, spark):
        from correctocr_spark.ops.cleaning import batch_padding_stats, pack_batches

        lengths = list(range(1, 120))
        stats = batch_padding_stats(
            pack_batches(self._docs(spark, lengths), batch_size=4, bucket_width=16)
        ).collect()
        for r in stats:
            assert r["padding"] == r["n_docs"] * r["max_len"] - r["sum_len"]
            # within a bucket lengths differ < bucket_width
            assert r["padding"] <= r["n_docs"] * 15

    def test_no_partitionless_window(self, spark):
        from correctocr_spark.ops.cleaning import pack_batches

        plan = pack_batches(
            self._docs(spark, [5, 6, 7]), batch_size=2, bucket_width=4
        )._jdf.queryExecution().executedPlan().toString()
        for line in plan.splitlines():
            if "Window" in line and "windowspecdefinition" in line:
                assert "bucket" in line  # partitioned by the bucket key


class TestSkewReport:
    def test_shares_and_hot_flag(self, spark):
        from correctocr_spark.ops.cleaning import skew_report

        rows = [Row(k="hot", text="x" * 10)] * 6 + [
            Row(k=f"c{i}", text="y" * 5) for i in range(4)
        ]
        out = skew_report(
            spark.createDataFrame(rows),
            key_col="k",
            text_col="text",
            top=10,
            hot_share_bp=5000,
        ).collect()
        by_key = {r["key"]: r for r in out}
        assert by_key["hot"]["n_rows"] == 6
        assert by_key["hot"]["row_share_bp"] == 6000
        assert by_key["hot"]["byte_share_bp"] == 7500  # 60 of 80 bytes
        assert by_key["hot"]["hot"] is True
        assert all(not by_key[f"c{i}"]["hot"] for i in range(4))

    def test_top_n_by_rows(self, spark):
        from correctocr_spark.ops.cleaning import skew_report

        rows = [Row(k=f"k{i:02d}", text="z") for i in range(30) for _ in range(i + 1)]
        out = skew_report(
            spark.createDataFrame(rows), key_col="k", text_col="text", top=5
        ).collect()
        assert [r["key"] for r in out] == ["k29", "k28", "k27", "k26", "k25"]

    def test_rowcount_weight_without_text(self, spark):
        from correctocr_spark.ops.cleaning import skew_report

        rows = [Row(k="a", v=1), Row(k="a", v=2), Row(k="b", v=3)]
        out = skew_report(
            spark.createDataFrame(rows), key_col="k", text_col=None, top=10
        ).collect()
        by_key = {r["key"]: r for r in out}
        assert by_key["a"]["n_bytes"] == 2  # weight 1 per row
        assert by_key["a"]["row_share_bp"] == 6666


class TestScriptProfile:
    def _profile(self, spark, texts):
        from correctocr_spark.ops.textstats import script_profile

        df = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
        )
        return {r["doc_id"]: r.asDict() for r in script_profile(df).collect()}

    def test_counts_per_script(self, spark):
        r = self._profile(spark, ["abc привет 你好 안녕 ¡Ångström!"])[0]
        assert r["n_latin"] == 3 + 8  # abc + Ångström (Å, ö in Latin-1/Ext-A)
        assert r["n_cyrillic"] == 6
        assert r["n_cjk"] == 2
        assert r["n_hangul"] == 2
        assert r["dominant"] == "latin"

    def test_dominant_flip_and_tie_to_declaration_order(self, spark):
        p = self._profile(spark, ["привет мир", "ab ыы"])  # tie: 2 latin, 2 cyr
        assert p[0]["dominant"] == "cyrillic" and p[0]["dominant_bp"] == 10000
        assert p[1]["dominant"] == "latin"  # strict > keeps the earlier script

    def test_no_letters_none(self, spark):
        r = self._profile(spark, ["123 !!! \n"])[0]
        assert r["n_scripted"] == 0
        assert r["dominant"] == "none" and r["dominant_bp"] == 0

    def test_null_text(self, spark):
        from correctocr_spark.ops.textstats import script_profile

        df = spark.createDataFrame([Row(doc_id=1, text=None)], "doc_id long, text string")
        r = script_profile(df).collect()[0]
        assert r["dominant"] == "none"

    def test_scan_speed_no_shuffle(self, spark):
        from correctocr_spark.ops.textstats import script_profile

        df = spark.createDataFrame([Row(doc_id=1, text="abc")])
        plan = script_profile(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestResolveCanonicalChains:
    def _resolve(self, spark, pairs, **kw):
        from correctocr_spark.ops.graph import resolve_canonical_chains

        df = spark.createDataFrame(
            [Row(url=u, canonical=c) for u, c in pairs],
            "url string, canonical string",
        )
        return {
            r["url"]: (r["canonical_root"], r["resolved"])
            for r in resolve_canonical_chains(df, **kw).collect()
        }

    def test_chain_resolves_to_terminal(self, spark):
        out = self._resolve(
            spark, [("a", "b"), ("b", "c"), ("c", None), ("d", "d")]
        )
        assert out["a"] == ("c", True)
        assert out["b"] == ("c", True)
        assert out["c"] == ("c", True)
        assert out["d"] == ("d", True)  # self-declaration is terminal

    def test_out_of_crawl_target_is_terminal(self, spark):
        out = self._resolve(spark, [("a", "https://elsewhere/x")])
        assert out["a"] == ("https://elsewhere/x", True)

    def test_two_cycle_flagged_unresolved(self, spark):
        out = self._resolve(spark, [("a", "b"), ("b", "a"), ("x", "a")])
        assert out["a"][1] is False and out["b"][1] is False
        assert out["x"][1] is False  # chain INTO a cycle can't resolve

    def test_depth_bound_and_widening(self, spark):
        # 20-hop chain: n0 -> n1 -> ... -> n20 (terminal)
        pairs = [(f"n{i}", f"n{i+1}") for i in range(20)] + [("n20", None)]
        shallow = self._resolve(spark, pairs, max_hops=16)
        assert shallow["n0"][1] is False  # 20 hops > 16
        assert shallow["n10"] == ("n20", True)  # 10 hops fits
        deep = self._resolve(spark, pairs, max_hops=32)
        assert deep["n0"] == ("n20", True)

    def test_deterministic_under_repartition(self, spark):
        from correctocr_spark.ops.graph import resolve_canonical_chains

        pairs = [("a", "b"), ("b", "a"), ("c", "a"), ("d", None)]
        df = spark.createDataFrame(
            [Row(url=u, canonical=c) for u, c in pairs],
            "url string, canonical string",
        )
        one = sorted(map(tuple, resolve_canonical_chains(df).collect()))
        two = sorted(
            map(tuple, resolve_canonical_chains(df.repartition(5)).collect())
        )
        assert one == two


class TestExtractionTokenPrf:
    def _prf(self, spark, pairs):
        from correctocr_spark.ops.textstats import extraction_token_prf

        df = spark.createDataFrame(
            [Row(doc_id=i, expected=e, extracted=x) for i, (e, x) in enumerate(pairs)],
            "doc_id long, expected string, extracted string",
        )
        return {r["doc_id"]: r.asDict() for r in extraction_token_prf(df).collect()}

    def test_hand_computed(self, spark):
        out = self._prf(spark, [("a b b c", "a b d")])
        r = out[0]
        # expected {a,b,b,c}, extracted {a,b,d}: inter = a + min(2,1) b = 2
        assert (r["n_expected"], r["n_extracted"], r["n_inter"]) == (4, 3, 2)
        assert r["precision_bp"] == 6666  # 2/3
        assert r["recall_bp"] == 5000  # 2/4
        assert r["f1_bp"] == 5714  # 4/7
        assert r["exact"] is False

    def test_exact_match(self, spark):
        r = self._prf(spark, [("x y", "x y")])[0]
        assert r["exact"] is True
        assert r["precision_bp"] == r["recall_bp"] == r["f1_bp"] == 10000

    def test_empty_sides_no_div_error(self, spark):
        out = self._prf(spark, [("", "a b"), ("a b", ""), ("", ""), (None, None)])
        assert out[0]["recall_bp"] == 0 and out[0]["precision_bp"] == 0
        assert out[1]["precision_bp"] == 0 and out[1]["n_expected"] == 2
        assert out[2]["exact"] is True and out[2]["f1_bp"] == 0
        assert out[3]["exact"] is True  # null == null after coalesce
        assert len(out) == 4  # every doc re-anchored, even wordless ones


class TestNewOpPlanShapes:
    def test_kmeans_step_no_window_no_cartesian(self, spark):
        from correctocr_spark.ops.similarity import kmeans_step_stats

        emb = spark.createDataFrame(
            [Row(vec_id=i, embedding=[float(i), 1.0]) for i in range(10)]
        )
        plan = (
            kmeans_step_stats(emb, [[0.0, 0.0], [9.0, 1.0]])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "Window" not in plan
        # the argmin never joins a centroid table: one scan, one agg
        assert "Join" not in plan

    def test_skew_report_totals_broadcast_no_window(self, spark):
        from correctocr_spark.ops.cleaning import skew_report

        df = spark.createDataFrame([Row(k=f"k{i % 3}", text="x") for i in range(20)])
        plan = (
            skew_report(df, key_col="k", text_col="text")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Window" not in plan  # totals come from a broadcast, not
        # a partitionless window over the key table
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
        assert "TakeOrderedAndProject" in plan  # top-N never global-sorts

    def test_lsh_recall_no_cartesian(self, spark):
        from correctocr_spark.ops.dedup import lsh_recall_report

        docs = spark.createDataFrame(
            [Row(doc_id=i, text=" ".join(f"w{i}_{j}" for j in range(10))) for i in range(6)]
        )
        rep = lsh_recall_report(docs, threshold=0.5, num_hashes=8, bands=4)
        plan = rep._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan

    def test_extraction_prf_joins_keyed_no_window(self, spark):
        from correctocr_spark.ops.textstats import extraction_token_prf

        df = spark.createDataFrame(
            [Row(doc_id=1, expected="a b", extracted="a")],
            "doc_id long, expected string, extracted string",
        )
        plan = (
            extraction_token_prf(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Window" not in plan
        assert "CartesianProduct" not in plan


class TestBcubedEval:
    """B-cubed clustering eval: hand-computed identity, the perfect /
    one-big-cluster / all-singletons boundary cases."""

    @staticmethod
    def _df(spark, triples):
        from pyspark.sql import Row

        return spark.createDataFrame(
            [Row(doc_id=i, cluster_id=p, gold_id=g) for i, p, g in triples]
        )

    @staticmethod
    def _one(df):
        from correctocr_spark.ops.dedup import bcubed_eval

        return bcubed_eval(df).collect()[0]

    def test_hand_computed(self, spark):
        """gold {1..5}{6,7}, pred {1,2,3,6}{4,5,7}: per-item P =
        3·(3/4 quantized)+1·(1/4)+2·(2/3)+1·(1/3) over 7 items; same
        table for R over gold sizes — replicated with the operator's
        own integer flooring."""
        triples = [
            (1, "X", "A"), (2, "X", "A"), (3, "X", "A"), (6, "X", "B"),
            (4, "Y", "A"), (5, "Y", "A"), (7, "Y", "B"),
        ]
        r = self._one(self._df(spark, triples))
        cells = {("X", "A"): 3, ("X", "B"): 1, ("Y", "A"): 2, ("Y", "B"): 1}
        n_p = {"X": 4, "Y": 3}
        n_g = {"A": 5, "B": 2}
        ps = sum(n * (n * 1_000_000 // n_p[p]) for (p, g), n in cells.items())
        rs = sum(n * (n * 1_000_000 // n_g[g]) for (p, g), n in cells.items())
        assert r["n_items"] == 7
        assert r["n_pred_clusters"] == 2 and r["n_gold_classes"] == 2
        assert r["precision_micro"] == ps // 7
        assert r["recall_micro"] == rs // 7
        p_, r_ = ps // 7, rs // 7
        assert r["f1_micro"] == (2 * p_ * r_) // (p_ + r_)

    def test_perfect_clustering(self, spark):
        triples = [(i, i % 3, i % 3) for i in range(12)]
        r = self._one(self._df(spark, triples))
        assert (
            r["precision_micro"],
            r["recall_micro"],
            r["f1_micro"],
        ) == (1_000_000, 1_000_000, 1_000_000)

    def test_one_big_cluster_full_recall(self, spark):
        triples = [(i, 0, i % 4) for i in range(8)]
        r = self._one(self._df(spark, triples))
        assert r["recall_micro"] == 1_000_000
        assert r["precision_micro"] == 250_000  # each item: 2/8

    def test_singletons_full_precision(self, spark):
        triples = [(i, i, i % 2) for i in range(6)]
        r = self._one(self._df(spark, triples))
        assert r["precision_micro"] == 1_000_000
        assert r["recall_micro"] == 1_000_000 // 3  # each item: 1/3
