"""Unit tests for the round-5 batch-2 operators: cardinality sketches
(KMV / HLL), positional phrase search, ranking AUC, Cohen's kappa,
Levenshtein CER eval, and Hamilton stratified sampling.

The cross-engine value checks live in test_entry_contract.py (each op
has an oracled queries() entry); these tests pin the semantic claims
the oracles can't see: mergeability, estimate tolerance, known-value
closed forms, repeated-term phrase anchors, and quota exactness.
"""

import pytest
from pyspark.sql import functions as F

from correctocr_spark.ops.sketch import (
    hll_estimate,
    hll_registers,
    kmv_merge,
    kmv_retained,
    kmv_sketch,
)


def _ids(spark, n, label_mod=2):
    return spark.range(n).select(
        F.col("id").alias("key"),
        (F.col("id") % label_mod).cast("string").alias("grp"),
    )


class TestKmv:
    def test_exact_below_k(self, spark):
        """Fewer than k distinct keys: the sketch IS the distinct set
        and the estimate is exact."""
        df = _ids(spark, 10, label_mod=1)
        row = kmv_sketch(df, "key", "grp", k=64).collect()[0]
        assert row["n_min"] == 10
        assert row["est_distinct"] == 10

    def test_duplicates_do_not_eat_slots(self, spark):
        """KMV is defined over DISTINCT hashes: replicating every key
        3x must not change the sketch."""
        df = _ids(spark, 200, label_mod=1)
        tripled = df.unionByName(df).unionByName(df)
        a = kmv_sketch(df, "key", "grp", k=16).collect()[0]
        b = kmv_sketch(tripled, "key", "grp", k=16).collect()[0]
        assert (a["n_min"], a["kth_min"], a["est_distinct"]) == (
            b["n_min"],
            b["kth_min"],
            b["est_distinct"],
        )

    def test_merge_equals_union(self, spark):
        """Merging the parts' retained minima == sketching the union —
        the property that makes the sketch usable across snapshots."""
        df = _ids(spark, 500, label_mod=3)
        h1 = kmv_retained(df.where(F.col("key") % 2 == 0), "key", "grp", k=16)
        h2 = kmv_retained(df.where(F.col("key") % 2 == 1), "key", "grp", k=16)
        merged = (
            kmv_merge(h1.unionByName(h2), "grp", 16).orderBy("grp").collect()
        )
        full = kmv_sketch(df, "key", "grp", k=16).orderBy("grp").collect()
        assert [tuple(r) for r in merged] == [tuple(r) for r in full]

    def test_estimate_tolerance(self, spark):
        """k=256 over 5000 distinct keys: KMV std error ~ 1/sqrt(k-1)
        ≈ 6.3%; assert within 4 sigma."""
        df = _ids(spark, 5000, label_mod=1)
        est = kmv_sketch(df, "key", "grp", k=256).collect()[0]["est_distinct"]
        assert abs(est - 5000) / 5000 < 0.25

    def test_k_validation(self, spark):
        with pytest.raises(ValueError):
            kmv_sketch(_ids(spark, 5), "key", "grp", k=1)


class TestKmvSetOps:
    def test_exact_below_k(self, spark):
        """Both groups under k: the union sketch is the exact distinct
        union, the intersection estimator is exact too."""
        from correctocr_spark.ops.sketch import kmv_set_ops

        # grp a: keys 0..19, grp b: keys 10..29 -> union 30, inter 10
        rows = [(i, "a") for i in range(20)] + [
            (i, "b") for i in range(10, 30)
        ]
        df = spark.createDataFrame(rows, "key long, grp string")
        r = kmv_set_ops(df, "key", "grp", k=64).collect()[0]
        assert (r["grp_a"], r["grp_b"]) == ("a", "b")
        assert r["n_min"] == 30 and r["est_union"] == 30
        assert r["both_minima"] == 10
        assert r["est_intersect"] == 10
        assert r["jaccard_milli"] == (1000 * 10) // 30

    def test_matches_python_twin_saturated(self, spark):
        """k-saturated regime: every output field equals a python
        twin computed from the same md5-32 hashes."""
        import hashlib

        from correctocr_spark.ops.sketch import kmv_set_ops

        rows = [(i, "a") for i in range(300)] + [
            (i, "b") for i in range(150, 450)
        ]
        df = spark.createDataFrame(rows, "key long, grp string")
        k = 16
        r = kmv_set_ops(df, "key", "grp", k=k).collect()[0]

        def h32(v):
            return int(hashlib.md5(f"kmv|{v}".encode()).hexdigest()[:8], 16)

        ha = sorted({h32(i) for i in range(300)})[:k]
        hb = sorted({h32(i) for i in range(150, 450)})[:k]
        x = sorted(set(ha) | set(hb))[:k]
        n_min, kth = len(x), x[-1]
        both = sum(1 for h in x if h in set(ha) and h in set(hb))
        est_u = n_min if n_min < k else ((k - 1) * (1 << 32)) // kth
        assert (
            r["n_min"], r["kth_min"], r["both_minima"],
            r["est_union"], r["est_intersect"], r["jaccard_milli"],
        ) == (
            n_min, kth, both, est_u,
            (both * est_u) // n_min, (1000 * both) // n_min,
        )

    def test_estimate_tolerance(self, spark):
        """k=256, 3000-key groups with 1000 shared: union/intersection
        estimates land within 4 sigma of truth."""
        from correctocr_spark.ops.sketch import kmv_set_ops

        rows = [(i, "a") for i in range(3000)] + [
            (i, "b") for i in range(2000, 5000)
        ]
        df = spark.createDataFrame(rows, "key long, grp string")
        r = kmv_set_ops(df, "key", "grp", k=256).collect()[0]
        assert abs(r["est_union"] - 5000) / 5000 < 0.25
        assert abs(r["est_intersect"] - 1000) / 1000 < 0.5

    def test_pair_count_and_validation(self, spark):
        from correctocr_spark.ops.sketch import kmv_set_ops

        df = _ids(spark, 90, label_mod=3)
        out = kmv_set_ops(df, "key", "grp", k=8).collect()
        assert len(out) == 3  # 3 groups -> 3 pairs
        with pytest.raises(ValueError):
            kmv_set_ops(df, "key", "grp", k=1)


class TestHll:
    def test_merge_is_groupby_max(self, spark):
        """Registers of a union == element-wise max of the parts'
        registers."""
        df = _ids(spark, 1000, label_mod=2)
        full = hll_registers(df, "key", "grp", b=6)
        parts = hll_registers(
            df.where(F.col("key") < 500), "key", "grp", b=6
        ).unionByName(hll_registers(df.where(F.col("key") >= 500), "key", "grp", b=6))
        merged = parts.groupBy("grp", "bucket").agg(
            F.max("register").alias("register")
        )
        a = sorted(tuple(r) for r in full.collect())
        b = sorted(tuple(r) for r in merged.collect())
        assert a == b

    def test_estimate_tolerance(self, spark):
        """b=10 (m=1024) over 20000 distinct keys: HLL std error
        ~ 1.04/sqrt(m) ≈ 3.3%; assert within ~5 sigma."""
        df = _ids(spark, 20000, label_mod=1)
        regs = hll_registers(df, "key", "grp", b=10)
        est = hll_estimate(regs, "grp", b=10).collect()[0]["est_distinct"]
        assert abs(est - 20000) / 20000 < 0.17

    def test_small_range_linear_counting(self, spark):
        """Tiny cardinality (10 keys, m=64): the zero-register linear
        counting path must engage and land near-exact."""
        df = _ids(spark, 10, label_mod=1)
        regs = hll_registers(df, "key", "grp", b=6)
        est = hll_estimate(regs, "grp", b=6).collect()[0]["est_distinct"]
        assert abs(est - 10) <= 2

    def test_b_validation(self, spark):
        with pytest.raises(ValueError):
            hll_registers(_ids(spark, 5), "key", "grp", b=2)


class TestPhraseSearch:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_basic_and_counts(self, spark):
        from correctocr_spark.ops.webindex import phrase_search

        docs = self._docs(
            spark,
            [
                (1, "the quick brown fox"),
                (2, "quick brown, then quick brown again"),
                (3, "brown quick"),  # reversed — no hit
                (4, "quick and brown"),  # gap — no hit
            ],
        )
        got = {
            r["doc_id"]: r["n_hits"]
            for r in phrase_search(docs, "quick brown").collect()
        }
        assert got == {1: 1, 2: 2}

    def test_repeated_term_needs_distinct_offsets(self, spark):
        """'buffalo buffalo' must need two CONSECUTIVE copies: a doc
        with a single 'buffalo' satisfies both phrase offsets at
        different anchors but neither anchor fully."""
        from correctocr_spark.ops.webindex import phrase_search

        docs = self._docs(
            spark,
            [
                (1, "buffalo"),  # no hit
                (2, "buffalo buffalo"),  # one hit
                (3, "buffalo buffalo buffalo"),  # two hits (overlapping)
                (4, "buffalo x buffalo"),  # no hit
            ],
        )
        got = {
            r["doc_id"]: r["n_hits"]
            for r in phrase_search(docs, "buffalo buffalo").collect()
        }
        assert got == {2: 1, 3: 2}

    def test_analyzer_case_and_punct(self, spark):
        from correctocr_spark.ops.webindex import phrase_search

        docs = self._docs(spark, [(1, "Quick-BROWN! fox")])
        got = phrase_search(docs, "quick brown").collect()
        assert [(r["doc_id"], r["n_hits"]) for r in got] == [(1, 1)]

    def test_empty_phrase_raises(self, spark):
        from correctocr_spark.ops.webindex import phrase_search

        with pytest.raises(ValueError):
            phrase_search(self._docs(spark, [(1, "x")]), "...")


class TestRankingAuc:
    def test_perfect_separation(self, spark):
        from correctocr_spark.ops.textstats import ranking_auc

        df = spark.createDataFrame(
            [(1, 1), (2, 1), (0, 0), (-1, 0)], "score int, label int"
        )
        row = ranking_auc(df, "score", "label").collect()[0]
        assert (row["n_pos"], row["n_neg"], row["auc_bp"]) == (2, 2, 10000)

    def test_all_ties_is_half(self, spark):
        from correctocr_spark.ops.textstats import ranking_auc

        df = spark.createDataFrame(
            [(5, 1), (5, 1), (5, 0), (5, 0)], "score int, label int"
        )
        assert ranking_auc(df, "score", "label").collect()[0]["auc_bp"] == 5000

    def test_known_mixed_value(self, spark):
        """scores pos=[3,1], neg=[2,1]: pairs (3>2),(3>1),(1<2),(1=1)
        → AUC = (2 + 0.5)/4 = 0.625."""
        from correctocr_spark.ops.textstats import ranking_auc

        df = spark.createDataFrame(
            [(3, 1), (1, 1), (2, 0), (1, 0)], "score int, label int"
        )
        assert ranking_auc(df, "score", "label").collect()[0]["auc_bp"] == 6250


class TestAgreementKappa:
    def test_perfect_agreement(self, spark):
        from correctocr_spark.ops.textstats import agreement_kappa

        df = spark.createDataFrame(
            [("a", "a"), ("b", "b"), ("c", "c")], "x string, y string"
        )
        assert agreement_kappa(df, "x", "y").collect()[0]["kappa_bp"] == 10000

    def test_known_value(self, spark):
        """Classic 2x2: N=100, agree=70, marginals a=(60,40), b=(50,50)
        → pe=0.5, kappa=(0.7-0.5)/0.5=0.4 → 4000 bp."""
        from correctocr_spark.ops.textstats import agreement_kappa

        rows = (
            [("p", "p")] * 40
            + [("p", "n")] * 20
            + [("n", "p")] * 10
            + [("n", "n")] * 30
        )
        df = spark.createDataFrame(rows, "x string, y string")
        row = agreement_kappa(df, "x", "y").collect()[0]
        assert (row["n"], row["agree"], row["kappa_bp"]) == (100, 70, 4000)

    def test_degenerate_single_label(self, spark):
        """Both raters emit one identical label: pe == 1, defined as
        kappa=10000 (full agreement, zero information)."""
        from correctocr_spark.ops.textstats import agreement_kappa

        df = spark.createDataFrame([("a", "a")] * 5, "x string, y string")
        assert agreement_kappa(df, "x", "y").collect()[0]["kappa_bp"] == 10000


class TestEditDistanceEval:
    def test_known_distances(self, spark):
        from correctocr_spark.ops.textstats import edit_distance_eval

        df = spark.createDataFrame(
            [
                (1, "kitten", "sitting"),
                (2, "same", "same"),
                (3, "", "abc"),
            ],
            "doc_id long, gold string, pred string",
        )
        got = {r["doc_id"]: r for r in edit_distance_eval(df).collect()}
        assert got[1]["edit_distance"] == 3
        assert got[1]["cer_bp"] == 3 * 10000 // 7
        assert got[2]["edit_distance"] == 0 and got[2]["cer_bp"] == 0
        assert got[3]["edit_distance"] == 3 and got[3]["cer_bp"] == 10000

    def test_clamp_and_ascii_strip(self, spark):
        from correctocr_spark.ops.textstats import edit_distance_eval

        df = spark.createDataFrame(
            [(1, "a" * 1000, "a" * 1000 + "bbb"), (2, "café", "caf")],
            "doc_id long, gold string, pred string",
        )
        got = {r["doc_id"]: r for r in edit_distance_eval(df, max_chars=400).collect()}
        # both sides clamp to 400 'a's → identical
        assert got[1]["edit_distance"] == 0
        assert got[1]["gold_chars"] == 400
        # é stripped from gold → 'caf' vs 'caf'
        assert got[2]["edit_distance"] == 0


class TestStratified:
    def test_quotas_sum_exactly(self, spark):
        from correctocr_spark.ops.cleaning import stratified_quotas

        df = spark.range(1000).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 7).cast("string").alias("grp"),
        )
        for total in (0, 1, 97, 999, 1000):
            q = stratified_quotas(df, "grp", total)
            assert q.agg(F.sum("quota")).collect()[0][0] == total

    def test_quota_tracks_share(self, spark):
        """A stratum with 90% of rows gets 90%±1 of the quota."""
        from correctocr_spark.ops.cleaning import stratified_quotas

        df = spark.range(1000).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") < 900, "big").otherwise("small").alias("grp"),
        )
        got = {r["grp"]: r["quota"] for r in stratified_quotas(df, "grp", 100).collect()}
        assert got == {"big": 90, "small": 10}

    def test_sample_honors_quotas_and_is_stable(self, spark):
        from correctocr_spark.ops.cleaning import stratified_quotas, stratified_sample

        df = spark.range(500).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 5).cast("string").alias("grp"),
        )
        s = stratified_sample(df, "grp", 97)
        per_grp = {r["grp"]: r["n"] for r in s.groupBy("grp").agg(F.count("*").alias("n")).collect()}
        quotas = {r["grp"]: r["quota"] for r in stratified_quotas(df, "grp", 97).collect()}
        assert per_grp == {g: q for g, q in quotas.items() if q > 0}
        # deterministic: same ids on re-run
        a = sorted(r["doc_id"] for r in s.collect())
        b = sorted(r["doc_id"] for r in stratified_sample(df, "grp", 97).collect())
        assert a == b


class TestWeightedSample:
    def test_heavy_weight_dominates(self, spark):
        """One item carries ~99.9% of the mass: it must appear in the
        k=1 sample (P(miss) ~ 1e-3 per uniform draw; the fixture is
        deterministic so this is a fixed, checked-in outcome)."""
        from correctocr_spark.ops.cleaning import weighted_sample

        rows = [(i, 1.0) for i in range(100)] + [(999, 100000.0)]
        df = spark.createDataFrame(rows, "doc_id long, w double")
        got = weighted_sample(df, "w", 1).collect()
        assert [r["doc_id"] for r in got] == [999]

    def test_rerun_stable_and_excludes_nonpositive(self, spark):
        from correctocr_spark.ops.cleaning import weighted_sample

        rows = [(i, float(i % 5)) for i in range(50)]  # w=0 for i%5==0
        df = spark.createDataFrame(rows, "doc_id long, w double")
        a = sorted(r["doc_id"] for r in weighted_sample(df, "w", 10).collect())
        b = sorted(r["doc_id"] for r in weighted_sample(df, "w", 10).collect())
        assert a == b and len(a) == 10
        assert all(i % 5 != 0 for i in a)

    def test_grouped_k_per_group(self, spark):
        from pyspark.sql import functions as F
        from correctocr_spark.ops.cleaning import weighted_sample

        df = spark.range(100).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 4).cast("string").alias("g"),
            (F.col("id") + 1).cast("double").alias("w"),
        )
        s = weighted_sample(df, "w", 5, group_col="g")
        per = {r["g"]: r["n"] for r in s.groupBy("g").agg(F.count("*").alias("n")).collect()}
        assert per == {"0": 5, "1": 5, "2": 5, "3": 5}
        ranks = {r["sample_rank"] for r in s.collect()}
        assert ranks == {1, 2, 3, 4, 5}

    def test_k_validation(self, spark):
        from correctocr_spark.ops.cleaning import weighted_sample

        df = spark.createDataFrame([(1, 1.0)], "doc_id long, w double")
        import pytest as _pt

        with _pt.raises(ValueError):
            weighted_sample(df, "w", 0)


class TestEmbeddingOutliers:
    def test_injected_outlier_flagged(self, spark):
        """A tight cluster at the origin plus one far point: only the
        far point's |z| crosses the threshold."""
        from correctocr_spark.ops.similarity import embedding_outliers

        rows = [(i, [0.001 * i, 0.0]) for i in range(30)]
        rows.append((99, [5.0, 5.0]))
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = embedding_outliers(df, [[0.0, 0.0]], z_milli_threshold=2000)
        got = [r["vec_id"] for r in out.collect()]
        assert got == [99]

    def test_uniform_cluster_no_outliers(self, spark):
        from correctocr_spark.ops.similarity import embedding_outliers

        rows = [(i, [float(i % 2), 0.0]) for i in range(20)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = embedding_outliers(df, [[0.5, 0.0]], z_milli_threshold=2000)
        assert out.count() == 0

    def test_assignment_matches_ivf(self, spark):
        """centroid_id must agree with ivf_assign's argmin on the same
        centroids (strict-< tie semantics shared by construction)."""
        from correctocr_spark.ops.similarity import embedding_outliers, ivf_assign

        cents = [[0.0, 0.0], [10.0, 0.0]]
        rows = [(i, [float(i), 0.0]) for i in range(12)] + [(50, [100.0, 0.0])]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = embedding_outliers(df, cents, z_milli_threshold=0)  # keep all
        assign = {r["vec_id"]: r["centroid_id"] for r in ivf_assign(df, cents).collect()}
        for r in out.collect():
            assert r["centroid_id"] == assign[r["vec_id"]]


class TestHtmlTables:
    def test_kernel_structure_nested_entities(self):
        from correctocr_spark.kernels.extract import table_records

        h = (
            "<html><body><p>intro</p>"
            "<table><tr><th>K</th><th>V &amp; W</th></tr>"
            "<tr><td>id</td><td>42</td></tr>"
            "<tr><td>outer<table><tr><td>inner</td></tr></table></td>"
            "<td>after</td></tr></table>"
            "<table><tr><td>t2</td></table>tail</body></html>"
        )
        recs = table_records(h)
        by_key = {
            (r["table_idx"], r["row_idx"], r["col_idx"]): (r["header"], r["cell"])
            for r in recs
        }
        assert by_key[(0, 0, 0)] == (True, "K")
        assert by_key[(0, 0, 1)] == (True, "V & W")  # entity decoded
        assert by_key[(0, 1, 1)] == (False, "42")
        # nested table is its OWN table; outer cell keeps only its text
        assert by_key[(1, 0, 0)] == (False, "inner")
        assert by_key[(0, 2, 0)] == (False, "outer")
        assert by_key[(0, 2, 1)] == (False, "after")
        assert by_key[(2, 0, 0)] == (False, "t2")
        assert len(recs) == len(by_key)

    def test_kernel_malformed_and_implied_rows(self):
        from correctocr_spark.kernels.extract import table_records

        # unclosed cells, cell before any <tr>, EOF inside a table
        recs = table_records("<table><td>a<td>b<tr><td>c")
        assert [(r["row_idx"], r["col_idx"], r["cell"]) for r in recs] == [
            (0, 0, "a"),
            (0, 1, "b"),
            (1, 0, "c"),
        ]

    def test_kernel_none_bytes_and_no_tables(self):
        from correctocr_spark.kernels.extract import table_records

        assert table_records(None) == []
        assert table_records("<p>no tables here</p>") == []
        got = table_records(b"<table><tr><td>bytes</td></tr></table>")
        assert [r["cell"] for r in got] == ["bytes"]

    def test_spark_op_matches_kernel(self, spark):
        from correctocr_spark.kernels.extract import table_records
        from correctocr_spark.spark.warc import html_tables

        h = "<table><tr><th>a</th></tr><tr><td>b1</td><td>b2</td></tr></table>"
        pages = spark.createDataFrame(
            [("u1", h.encode()), ("u2", None)], "url string, html binary"
        )
        got = sorted(
            tuple(r) for r in html_tables(pages).collect()
        )
        want = sorted(
            ("u1", r["table_idx"], r["row_idx"], r["col_idx"], r["header"], r["cell"])
            for r in table_records(h)
        )
        assert got == want


class TestAnchorEntropy:
    def test_uniform_single_anchor_is_zero(self, spark):
        """The anchor-bombing case: many links, ONE exact phrase →
        entropy exactly 0 at high volume."""
        from correctocr_spark.ops.graph import anchor_entropy

        links = spark.createDataFrame(
            [(i, "https://t/x", "buy cheap now") for i in range(50)],
            "doc_id long, href string, anchor string",
        )
        row = anchor_entropy(links).collect()[0]
        assert (row["n_links"], row["n_anchor_texts"], row["entropy_micro"]) == (
            50,
            1,
            0,
        )

    def test_uniform_k_anchors_is_ln_k(self, spark):
        """4 equally-frequent anchors → entropy = ln 4 micro-nats."""
        import math

        from correctocr_spark.ops.graph import anchor_entropy

        links = spark.createDataFrame(
            [(i, "https://t/x", f"a{i % 4}") for i in range(40)],
            "doc_id long, href string, anchor string",
        )
        row = anchor_entropy(links).collect()[0]
        assert row["entropy_micro"] == 4 * round(0.25 * math.log(4) * 1e6)


class TestShardManifest:
    def test_order_and_partitioning_independent(self, spark):
        """Reversing row order and changing partitioning must not move
        the checksum — the property that makes it a distributed-write
        verifier."""
        from pyspark.sql import functions as F
        from correctocr_spark.ops.cleaning import shard_manifest

        df = spark.range(200).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("t"), F.col("id").cast("string")).alias("text"),
            (F.col("id") % 3).cast("string").alias("shard"),
        )
        a = {r["shard"]: tuple(r) for r in shard_manifest(df, "shard").collect()}
        rev = df.orderBy(F.col("doc_id").desc()).repartition(17)
        b = {r["shard"]: tuple(r) for r in shard_manifest(rev, "shard").collect()}
        assert a == b

    def test_single_row_drift_moves_checksum(self, spark):
        from pyspark.sql import functions as F
        from correctocr_spark.ops.cleaning import shard_manifest

        df = spark.range(50).select(
            F.col("id").alias("doc_id"),
            F.lit("same").alias("text"),
            F.lit("s0").alias("shard"),
        )
        tweaked = df.withColumn(
            "text", F.when(F.col("doc_id") == 7, "SAME").otherwise(F.col("text"))
        )
        a = shard_manifest(df, "shard").collect()[0]
        b = shard_manifest(tweaked, "shard").collect()[0]
        assert a["n_docs"] == b["n_docs"] and a["byte_mass"] == b["byte_mass"]
        assert a["checksum"] != b["checksum"]

    def test_submanifests_merge_by_resumming(self, spark):
        from pyspark.sql import functions as F
        from correctocr_spark.ops.cleaning import shard_manifest

        df = spark.range(100).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("x"), F.col("id").cast("string")).alias("text"),
            F.lit("s").alias("shard"),
        )
        full = shard_manifest(df, "shard").collect()[0]
        parts = shard_manifest(df.where(F.col("doc_id") < 40), "shard").unionByName(
            shard_manifest(df.where(F.col("doc_id") >= 40), "shard")
        )
        merged = (
            parts.groupBy("shard")
            .agg(
                F.sum("n_docs").alias("n_docs"),
                F.sum("byte_mass").alias("byte_mass"),
                (F.sum(F.col("checksum").cast("decimal(38,0)")) % (1 << 61))
                .cast("long")
                .alias("checksum"),
            )
            .collect()[0]
        )
        assert tuple(full) == tuple(merged)


class TestRecrawlIntervals:
    def test_buckets_and_singletons(self, spark):
        import datetime as dt

        from correctocr_spark.ops.temporal import recrawl_intervals

        t0 = dt.datetime(2026, 1, 1)
        rows = [
            # u1: gaps of 1h (<=1d) and 3d (<=7d)
            ("u1", t0), ("u1", t0 + dt.timedelta(hours=1)),
            ("u1", t0 + dt.timedelta(hours=1, days=3)),
            # u2: gap of 40d (>30d)
            ("u2", t0), ("u2", t0 + dt.timedelta(days=40)),
            # u3: singleton — contributes nothing
            ("u3", t0),
        ]
        df = spark.createDataFrame(rows, "url string, warc_ts timestamp")
        got = {
            r["bucket"]: r["n_gaps"]
            for r in recrawl_intervals(df, "url", "warc_ts").collect()
        }
        assert got == {"<=1d": 1, "<=7d": 1, ">30d": 1}

    def test_exact_boundary_is_inclusive(self, spark):
        import datetime as dt

        from correctocr_spark.ops.temporal import recrawl_intervals

        t0 = dt.datetime(2026, 1, 1)
        df = spark.createDataFrame(
            [("u", t0), ("u", t0 + dt.timedelta(days=1))],
            "url string, warc_ts timestamp",
        )
        got = recrawl_intervals(df, "url", "warc_ts").collect()
        assert [(r["bucket"], r["n_gaps"]) for r in got] == [("<=1d", 1)]


class TestZorderKey:
    def test_known_interleave(self, spark):
        """bits=2, values already in range: z(x=0b10, y=0b01) with x at
        even positions → key = x0 + y0<<1 + x1<<2 + y1<<3 = 0 + 2 + 4
        + 0 = 6."""
        from correctocr_spark.ops.cleaning import zorder_key

        df = spark.createDataFrame(
            [(1, 2, 1), (2, 0, 0), (3, 3, 3)], "doc_id long, x long, y long"
        )
        got = {
            r["doc_id"]: r["zkey"]
            for r in zorder_key(df, ["x", "y"], bits=2).collect()
        }
        assert got == {1: 6, 2: 0, 3: 15}

    def test_locality_beats_single_column_sort(self, spark):
        """The data-skipping claim, measured: chunk the z-sorted corpus
        into files of 64 and sum per-file (x-range + y-range); the
        z-layout's total bounding ranges must be far tighter than a
        sort by x alone (whose y min/max spans everything per file)."""
        from pyspark.sql import functions as F
        from correctocr_spark.ops.cleaning import zorder_key

        df = spark.range(4096).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 64).alias("x"),
            (F.col("id") / 64).cast("long").alias("y"),  # full 64x64 grid
        )
        z = zorder_key(df, ["x", "y"], bits=6)
        rows = z.orderBy("zkey", "doc_id").collect()
        by_x = z.orderBy("x", "doc_id").collect()

        def cost(rs):
            tot = 0
            for i in range(0, len(rs), 64):
                chunk = rs[i : i + 64]
                xs = [r["x"] for r in chunk]
                ys = [r["y"] for r in chunk]
                tot += (max(xs) - min(xs)) + (max(ys) - min(ys))
            return tot

        assert cost(rows) < cost(by_x) * 0.5

    def test_validations(self, spark):
        from correctocr_spark.ops.cleaning import zorder_key

        df = spark.createDataFrame([(1, 1)], "a long, b long")
        with pytest.raises(ValueError):
            zorder_key(df, ["a"], bits=8)
        with pytest.raises(ValueError):
            zorder_key(df, ["a", "b"], bits=32)


class TestRendezvousAssign:
    def test_minimal_disruption_on_node_removal(self, spark):
        """THE rendezvous property: dropping node-c only reassigns keys
        that lived on node-c; every other key keeps its node."""
        from correctocr_spark.ops.cleaning import rendezvous_assign

        df = spark.range(500).select(F.col("id").alias("k"))
        full = {
            r["k"]: r["node"]
            for r in rendezvous_assign(
                df, "k", ["node-a", "node-b", "node-c"]
            ).collect()
        }
        reduced = {
            r["k"]: r["node"]
            for r in rendezvous_assign(df, "k", ["node-a", "node-b"]).collect()
        }
        for k, n in full.items():
            if n != "node-c":
                assert reduced[k] == n
        assert any(n == "node-c" for n in full.values())

    def test_roughly_balanced(self, spark):
        from correctocr_spark.ops.cleaning import rendezvous_assign

        df = spark.range(3000).select(F.col("id").alias("k"))
        counts = {
            r["node"]: r["count"]
            for r in rendezvous_assign(df, "k", ["a", "b", "c"])
            .groupBy("node")
            .count()
            .collect()
        }
        for n, c in counts.items():
            assert abs(c - 1000) < 200, counts

    def test_empty_nodes_raises(self, spark):
        from correctocr_spark.ops.cleaning import rendezvous_assign

        with pytest.raises(ValueError):
            rendezvous_assign(spark.range(1), "id", [])


class TestPsiDrift:
    def test_identical_distributions_near_zero(self, spark):
        from correctocr_spark.ops.textstats import psi_drift

        df = spark.range(1000).select((F.col("id") % 100).alias("score"))
        row = psi_drift(df, df, "score").collect()[0]
        assert row["psi_micro"] == 0
        assert (row["n_ref"], row["n_cur"]) == (1000, 1000)

    def test_shift_detected(self, spark):
        """A hard shift (all mass moves buckets) must cross the 0.25
        'investigate' line (250000 micro)."""
        from correctocr_spark.ops.textstats import psi_drift

        ref = spark.range(1000).select((F.col("id") % 30).alias("score"))
        cur = spark.range(1000).select((F.col("id") % 30 + 70).alias("score"))
        row = psi_drift(ref, cur, "score").collect()[0]
        assert row["psi_micro"] > 250_000

    def test_validations(self, spark):
        from correctocr_spark.ops.textstats import psi_drift

        df = spark.range(5).select(F.col("id").alias("score"))
        with pytest.raises(ValueError):
            psi_drift(df, df, "score", n_buckets=1)
        with pytest.raises(ValueError):
            psi_drift(df, df, "score", lo=10, hi=10)


class TestThresholdCalibration:
    def test_exact_semantics(self, spark):
        """scores 1..100 uniform, keep 30% → cutoff 71 keeps exactly 30
        of 100 (3000 bp)."""
        from correctocr_spark.ops.textstats import threshold_calibration

        df = spark.range(1, 101).select(F.col("id").alias("q"))
        row = threshold_calibration(df, "q", 3000).collect()[0]
        assert (row["n_docs"], row["cutoff"], row["kept_bp_actual"]) == (
            100,
            71,
            3000,
        )

    def test_ties_spill_over_target(self, spark):
        """With mass concentrated on one score the kept share may
        exceed the target but never undershoot it."""
        from correctocr_spark.ops.textstats import threshold_calibration

        rows = [(50,)] * 90 + [(99,)] * 10
        df = spark.createDataFrame(rows, "q int")
        row = threshold_calibration(df, "q", 2000).collect()[0]
        assert row["cutoff"] == 50  # the 99s alone are only 10%
        assert row["kept_bp_actual"] == 10000

    def test_keep_all(self, spark):
        from correctocr_spark.ops.textstats import threshold_calibration

        df = spark.range(1, 11).select(F.col("id").alias("q"))
        row = threshold_calibration(df, "q", 10000).collect()[0]
        assert row["cutoff"] == 1 and row["kept_bp_actual"] == 10000

    def test_validation(self, spark):
        from correctocr_spark.ops.textstats import threshold_calibration

        df = spark.range(5).select(F.col("id").alias("q"))
        with pytest.raises(ValueError):
            threshold_calibration(df, "q", 0)


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------


def _md5_32(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _cms_simulate(pairs, depth, width, salt="cms"):
    """pairs: (key, weight). Returns {(row, bucket): cnt} and the exact
    per-key totals."""
    from collections import Counter

    sketch = Counter()
    exact = Counter()
    for key, w in pairs:
        exact[key] += w
        for i in range(depth):
            sketch[(i, _md5_32(f"{salt}{i}|{key}") % width)] += w
    return dict(sketch), dict(exact)


class TestCms:
    PAIRS = [("alpha", 1)] * 7 + [("beta", 1)] * 3 + [
        ("gamma", 1),
        ("delta", 1),
        ("delta", 1),
    ] + [(f"tail{i}", 1) for i in range(20)]

    def _df(self, spark, pairs):
        return spark.createDataFrame(pairs, "key string, w long")

    def test_table_matches_simulation(self, spark):
        from correctocr_spark.ops.sketch import cms_table

        got = {
            (r["row"], r["bucket"]): r["cnt"]
            for r in cms_table(
                self._df(spark, self.PAIRS), "key", depth=3, width=16
            ).collect()
        }
        want, _ = _cms_simulate(self.PAIRS, depth=3, width=16)
        assert got == want

    def test_weighted_and_grouped(self, spark):
        from correctocr_spark.ops.sketch import cms_table

        pairs = [("a", "x", 5), ("a", "y", 2), ("b", "x", 7)]
        df = spark.createDataFrame(pairs, "grp string, key string, w long")
        got = {
            (r["grp"], r["row"], r["bucket"]): r["cnt"]
            for r in cms_table(
                df, "key", group_cols="grp", depth=2, width=8, weight_col="w"
            ).collect()
        }
        for grp in ("a", "b"):
            want, _ = _cms_simulate(
                [(k, w) for g, k, w in pairs if g == grp], depth=2, width=8
            )
            assert {(r, b): c for (g, r, b), c in got.items() if g == grp} == want

    def test_merge_equals_union(self, spark):
        from correctocr_spark.ops.sketch import cms_table

        half = len(self.PAIRS) // 2
        a = cms_table(self._df(spark, self.PAIRS[:half]), "key", depth=3, width=16)
        b = cms_table(self._df(spark, self.PAIRS[half:]), "key", depth=3, width=16)
        merged = {
            (r["row"], r["bucket"]): r["cnt"]
            for r in a.unionByName(b)
            .groupBy("row", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
            .collect()
        }
        full = {
            (r["row"], r["bucket"]): r["cnt"]
            for r in cms_table(
                self._df(spark, self.PAIRS), "key", depth=3, width=16
            ).collect()
        }
        assert merged == full

    def test_lookup_never_undercounts_and_exact_when_wide(self, spark):
        from correctocr_spark.ops.sketch import cms_lookup, cms_table

        df = self._df(spark, self.PAIRS)
        _, exact = _cms_simulate(self.PAIRS, depth=3, width=16)
        # narrow sketch: collisions may overcount, never undercount
        sk = cms_table(df, "key", depth=3, width=16)
        got = {
            r["key"]: r["est"]
            for r in cms_lookup(sk, df.select("key"), "key", depth=3, width=16).collect()
        }
        assert set(got) == set(exact)
        assert all(got[k] >= exact[k] for k in exact)
        # wide sketch: no collisions at this cardinality -> exact
        wide = cms_table(df, "key", depth=4, width=4096)
        got_w = {
            r["key"]: r["est"]
            for r in cms_lookup(
                wide, df.select("key"), "key", depth=4, width=4096
            ).collect()
        }
        assert got_w == exact

    def test_absent_key_reports_zero_or_collision(self, spark):
        from correctocr_spark.ops.sketch import cms_lookup, cms_table

        df = self._df(spark, self.PAIRS)
        sk = cms_table(df, "key", depth=4, width=4096)
        probe = spark.createDataFrame([("neverseen",)], "key string")
        [r] = cms_lookup(sk, probe, "key", depth=4, width=4096).collect()
        assert r["est"] == 0  # all four probes miss at this width

    def test_local_equals_join(self, spark):
        from correctocr_spark.ops.sketch import cms_lookup, cms_lookup_local, cms_table

        df = self._df(spark, self.PAIRS)
        sk = cms_table(df, "key", depth=3, width=16)
        keys = df.select("key").distinct()
        join_form = {
            r["key"]: r["est"]
            for r in cms_lookup(sk, keys, "key", depth=3, width=16).collect()
        }
        local_form = {
            r["key"]: r["est"]
            for r in cms_lookup_local(sk, keys, "key", depth=3, width=16).collect()
        }
        assert local_form == join_form

    def test_local_plan_has_no_join_or_shuffle(self, spark):
        from correctocr_spark.ops.sketch import cms_lookup_local, cms_table

        df = self._df(spark, self.PAIRS)
        sk = cms_table(df, "key", depth=2, width=8)
        keys = spark.range(50).select(
            F.concat(F.lit("k"), F.col("id")).alias("key")
        )
        plan = (
            cms_lookup_local(sk, keys, "key", depth=2, width=8)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Join" not in plan and "Exchange" not in plan

    def test_heavy_hitters_one_sided(self, spark):
        from correctocr_spark.ops.sketch import cms_heavy_hitters

        df = self._df(spark, self.PAIRS)
        _, exact = _cms_simulate(self.PAIRS, depth=3, width=16)
        got = {
            r["key"]: r["est"]
            for r in cms_heavy_hitters(
                df, "key", threshold=3, depth=3, width=16
            ).collect()
        }
        # every true heavy hitter present (no false negatives)
        for k, n in exact.items():
            if n >= 3:
                assert k in got and got[k] >= n
        # impostors only via collision, still >= their exact count
        assert all(got[k] >= exact[k] for k in got)

    def test_bad_params_raise(self, spark):
        from correctocr_spark.ops.sketch import (
            cms_lookup,
            cms_lookup_local,
            cms_table,
        )

        df = self._df(spark, self.PAIRS[:2])
        with pytest.raises(ValueError):
            cms_table(df, "key", depth=0)
        with pytest.raises(ValueError):
            cms_table(df, "key", width=1)
        with pytest.raises(ValueError):
            cms_lookup(df, df, "key", depth=0)
        with pytest.raises(ValueError):
            cms_lookup_local(df.select("key"), df, "key", depth=2, width=600_000)
        grouped = df.select(F.lit("g").alias("grp"), F.lit(0).alias("row"),
                            F.lit(0).alias("bucket"), F.lit(1).alias("cnt"))
        with pytest.raises(ValueError):
            cms_lookup_local(grouped, df, "key")
