"""Unit probes for ops/cleaning.py on crafted inputs (the sf oracles
cover the corpus-scale behavior; these pin the semantics)."""

import pytest
from pyspark.sql import functions as F


def test_pii_scrub_crafted(spark):
    from correctocr_spark.ops.cleaning import pii_scrub

    docs = spark.createDataFrame(
        [
            (1, "mail a.b+c@test-site.org or 192.168.1.7 or +45 12 34 56 78 end"),
            (2, "no pii here at all"),
            (3, "two mails x@y.io z@w.co and ip 8.8.8.8"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    assert (got[1]["n_emails"], got[1]["n_ipv4"], got[1]["n_phones"]) == (1, 1, 1)
    assert got[1]["scrubbed"] == "mail <EMAIL> or <IP> or <PHONE> end"
    assert (got[2]["n_emails"], got[2]["n_ipv4"], got[2]["n_phones"]) == (0, 0, 0)
    assert got[2]["scrubbed"] == "no pii here at all"
    assert got[3]["n_emails"] == 2 and got[3]["n_ipv4"] == 1
    assert got[3]["scrubbed"] == "two mails <EMAIL> <EMAIL> and ip <IP>"


def test_repetition_stats_crafted(spark):
    from correctocr_spark.ops.cleaning import repetition_stats

    docs = spark.createDataFrame(
        [
            # 4 non-blank lines, 'same line' repeated 3x -> dup frac 0.5;
            # words: same*3 line*3 other*1 unique*1 -> top word 3/8;
            # bigrams (7): 'same line'x3 top -> 3/7
            (1, "same line\nsame line\n\nsame line\nother unique"),
            (2, "a b"),  # single line, no dups; bigram 'a b' frac 1.0
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert got[1]["n_lines"] == 4
    assert got[1]["dup_line_frac"] == 0.5
    assert got[1]["n_words"] == 8
    assert got[1]["top_word_frac"] == round(3 / 8, 6)
    assert got[1]["top_bigram_frac"] == round(3 / 7, 6)
    assert got[2]["n_lines"] == 1 and got[2]["dup_line_frac"] == 0.0
    assert got[2]["top_word_frac"] == 0.5 and got[2]["top_bigram_frac"] == 1.0


def test_tfidf_top_terms_crafted(spark):
    from correctocr_spark.ops.cleaning import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "common common zebra"),
            (2, "common common common"),
            (3, "common yak yak"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(docs, k=1).collect()
    top = {r["doc_id"]: r["term"] for r in out}
    # 'common' appears in every doc (idf = ln(4/4) = 0) so the doc-unique
    # terms win despite lower tf
    assert top == {1: "zebra", 2: "common", 3: "yak"}
    ranks = {r["doc_id"]: r["rank"] for r in out}
    assert set(ranks.values()) == {1}


def test_decontaminate_crafted(spark):
    from correctocr_spark.ops.cleaning import decontaminate

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps high"),   # shares 2 bench shingles
            (2, "quick brown elsewhere entirely"),   # shares 0 full 3-grams
            (3, "nothing in common at all"),
        ],
        "doc_id long, text string",
    )
    bench = ["the quick brown fox"]  # 3-shingles: 'the quick brown', 'quick brown fox'
    got = {r["doc_id"]: r for r in decontaminate(docs, bench, k=3, min_overlap=1).collect()}
    assert set(got) == {1}
    assert got[1]["n_overlap"] == 2
    assert got[1]["overlap_shingles"] == "quick brown fox|the quick brown"
    # raising the gate drops the single-overlap case
    assert decontaminate(docs, bench, k=3, min_overlap=3).count() == 0


def test_lsh_hot_bucket_cap(spark):
    """max_bucket drops oversized band buckets BEFORE the self-join: a
    boilerplate cluster of identical docs stops producing O(f²) pairs,
    while small legitimate buckets keep theirs."""
    from correctocr_spark.ops.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        shingles_df,
    )

    boiler = "identical boilerplate navigation footer text repeated on every mirror page"
    rows = [(i, boiler) for i in range(10)]  # hot bucket: 10 identical docs
    rows += [
        (100, "a unique pair of documents that share their entire wording"),
        (101, "a unique pair of documents that share their entire wording"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = shingles_df(docs, k=3).persist()
    sig = minhash_signatures(sh, num_hashes=8)

    uncapped = lsh_candidate_pairs(sig, 8, 4)
    assert uncapped.count() == 45 + 1  # C(10,2) + the small pair

    capped = lsh_candidate_pairs(sig, 8, 4, max_bucket=5)
    pairs = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    assert pairs == {(100, 101)}  # hot bucket gone, small bucket kept
    spark.catalog.clearCache()


def test_deterministic_sample_stable_and_stratified(spark):
    from correctocr_spark.ops.cleaning import deterministic_sample

    docs = spark.createDataFrame(
        [(i, "t", "en" if i % 2 == 0 else "zh") for i in range(400)],
        "doc_id long, text string, lang string",
    )
    a = {r["doc_id"] for r in deterministic_sample(docs, rate=0.25).collect()}
    b = {r["doc_id"] for r in deterministic_sample(docs, rate=0.25).collect()}
    assert a == b and 0 < len(a) < 400  # reproducible, non-trivial
    # a higher rate strictly grows the kept set (hash-gate monotonicity)
    c = {r["doc_id"] for r in deterministic_sample(docs, rate=0.5).collect()}
    assert a < c
    # stratified: en kept at ~0.9, zh dropped entirely
    s = deterministic_sample(docs, rate=0.0, rates={"en": 0.9}).collect()
    assert len(s) > 0 and all(r["lang"] == "en" for r in s)


def test_extract_links_crafted(spark):
    from correctocr_spark.ops.cleaning import extract_links

    pages = spark.createDataFrame(
        [
            (1, '<p>x</p><a href="https://a.example/1">first</a>'
                '<a class="nav" href="/rel">second link</a>'),
            (2, "no links at all"),
        ],
        "doc_id long, html string",
    )
    got = sorted(
        (r["doc_id"], r["href"], r["anchor"]) for r in extract_links(pages).collect()
    )
    assert got == [
        (1, "/rel", "second link"),
        (1, "https://a.example/1", "first"),
    ]


def test_corpus_rollup_crafted(spark):
    from correctocr_spark.ops.cleaning import corpus_rollup

    docs = spark.createDataFrame(
        [(1, "a b c", "en"), (2, "a b c d e", "en"), (3, "x", "zh")],
        "doc_id long, text string, lang string",
    )
    got = {r["stratum"]: r for r in corpus_rollup(docs).collect()}
    en = got["en"]
    assert (en["n_docs"], en["total_words"], en["min_words"], en["max_words"]) == (2, 8, 3, 5)
    assert en["mean_words"] == 4.0 and en["median_words"] == 4.0  # interpolated
    assert got["zh"]["n_docs"] == 1 and got["zh"]["median_words"] == 1.0


def test_pack_shards_values_and_plan(spark):
    """Two-pass prefix-sum packing equals the sequential greedy packing,
    and the plan contains no PARTITIONLESS window (every Window operator
    is keyed by the coarse bucket)."""
    import io
    from contextlib import redirect_stdout

    from correctocr_spark.ops.cleaning import pack_shards

    toks = [30, 50, 40, 80, 10, 60, 70, 20]
    docs = spark.createDataFrame(
        [(i, "w " * n) for i, n in enumerate(toks)], "doc_id long, text string"
    )
    out = pack_shards(docs, budget=100, bucket_size=3)
    got = {r["doc_id"]: (r["n_tokens"], r["shard"]) for r in out.collect()}
    run = 0
    for i, n in enumerate(toks):
        assert got[i] == (n, run // 100), (i, got[i], run)
        run += n

    plan = out._jdf.queryExecution().executedPlan().toString()
    win_lines = [ln for ln in plan.splitlines() if "windowspecdefinition" in ln]
    assert win_lines, plan
    assert all("_bucket" in ln for ln in win_lines), plan


def test_pack_shards_driver_bounded_for_sparse_ids(spark):
    """Huge sparse ids must not explode the driver-side offset table:
    the bucket width auto-widens to max_buckets, and the result still
    equals the sequential greedy packing."""
    from correctocr_spark.ops.cleaning import pack_shards

    ids = [10**12 + 7, 3 * 10**12, 5 * 10**12 + 1, 9 * 10**12]
    toks = [60, 50, 70, 40]
    docs = spark.createDataFrame(
        [(i, "w " * n) for i, n in zip(ids, toks)], "doc_id long, text string"
    )
    out = pack_shards(docs, budget=100, bucket_size=1024, max_buckets=8)
    got = {r["doc_id"]: r["shard"] for r in out.collect()}
    run, expected = 0, {}
    for i, n in zip(sorted(ids), toks):
        expected[i] = run // 100
        run += n
    assert got == expected


def test_canonical_url_crafted(spark):
    from correctocr_spark.ops.cleaning import canonicalize_urls

    pages = spark.createDataFrame(
        [
            (1, "HTTP://WWW.Example.COM:80/A/b?utm_source=x&q=1&fbclid=zz#frag"),
            (2, "https://site.org:443"),
            (3, "https://site.org/path?utm_campaign=only"),
            (4, "not a url at all"),
            (5, "  http://Host.net/KeepCase?gclid=1&x=2  "),
        ],
        "doc_id long, url string",
    )
    got = {r["doc_id"]: r["canonical_url"] for r in canonicalize_urls(pages, id_col="doc_id").collect()}
    assert got[1] == "http://www.example.com/A/b?q=1"
    assert got[2] == "https://site.org/"
    assert got[3] == "https://site.org/path"
    assert got[4] == "not a url at all"       # unparseable passes through
    assert got[5] == "http://host.net/KeepCase?x=2"  # trimmed, path case kept


def test_mix_proportions_shares_and_determinism(spark):
    from correctocr_spark.ops.cleaning import mix_proportions

    rows = (
        [(i, "en") for i in range(600)]
        + [(i + 1000, "fr") for i in range(200)]
        + [(i + 2000, "de") for i in range(200)]
        + [(i + 3000, "zh") for i in range(100)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    targets = {"en": 0.5, "fr": 0.3, "de": 0.2}
    out = mix_proportions(docs, targets, group_col="lang", key_col="doc_id")
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    # bottleneck is fr: T = 200/0.3 = 666.7 -> expected ~333 en / 200 fr / 133 de
    assert "zh" not in got            # absent from targets: dropped
    assert got["fr"] == 200           # bottleneck group keeps everything
    assert abs(got["en"] - 333) < 60  # hash-Bernoulli noise band
    assert abs(got["de"] - 133) < 40
    # selection is deterministic: identical re-run picks identical rows
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in mix_proportions(docs, targets, group_col="lang", key_col="doc_id").collect())
    assert a == b
    # output keeps all original columns
    assert set(out.columns) == {"doc_id", "lang"}


def test_mix_proportions_validates_targets(spark):
    import pytest

    from correctocr_spark.ops.cleaning import mix_proportions

    docs = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    with pytest.raises(ValueError, match="non-empty"):
        mix_proportions(docs, {})
    with pytest.raises(ValueError, match="must be > 0"):
        mix_proportions(docs, {"en": 0.0})


def test_mix_proportions_raises_on_absent_target_group(spark):
    import pytest

    from correctocr_spark.ops.cleaning import mix_proportions

    docs = spark.createDataFrame(
        [(i, "en") for i in range(10)], "doc_id long, lang string"
    )
    # 'fr' has zero corpus rows: silently mixing without it would
    # return wrong proportions — must fail loudly at execution
    out = mix_proportions(docs, {"en": 0.5, "fr": 0.5})
    with pytest.raises(Exception, match="unachievable"):
        out.collect()


def test_mix_proportions_plan_broadcasts_rates(spark):
    from correctocr_spark.ops.cleaning import mix_proportions

    docs = spark.createDataFrame([(1, "en"), (2, "fr")], "doc_id long, lang string")
    plan = (
        mix_proportions(docs, {"en": 0.5, "fr": 0.5})
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the corpus-side join against the tiny rates table must be a
    # broadcast, never a shuffle of the corpus itself
    assert "BroadcastHashJoin" in plan, plan


class TestNgramRepetition:
    def _run(self, spark, texts, **kw):
        from pyspark.sql import Row

        from correctocr_spark.ops.cleaning import ngram_repetition

        df = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
        )
        return {r["doc_id"]: r for r in ngram_repetition(df, **kw).collect()}

    def test_hand_computed_fractions(self, spark):
        got = self._run(spark, ["x y x y x y"], top_n=2, dup_n=2)[0]
        # bigrams: "x y"x3, "y x"x2; joined text = 11 chars
        assert got["top_ngram_char_frac"] == pytest.approx(9 / 11, abs=1e-6)
        # dup mass 3*3 + 2*3 = 15 > 11 -> capped at 1.0
        assert got["dup_ngram_char_frac"] == 1.0

    def test_tie_breaks_to_largest_gram(self, spark):
        got = self._run(spark, ["a b c d a b c d"], top_n=2, dup_n=5)[0]
        # "a b"/"b c"/"c d" all x2 -> winner "c d", 2*3 chars of 15
        assert got["top_ngram_char_frac"] == pytest.approx(6 / 15, abs=1e-6)

    def test_short_and_empty_docs_score_zero(self, spark):
        got = self._run(spark, ["x", ""], top_n=2, dup_n=2)
        for i in (0, 1):
            assert got[i]["top_ngram_char_frac"] == 0.0
            assert got[i]["dup_ngram_char_frac"] == 0.0

    def test_every_doc_returned(self, spark):
        got = self._run(spark, ["x", "x y z w v u t s", ""], top_n=3, dup_n=5)
        assert len(got) == 3


class TestLinearClassifier:
    DIMS, BIAS, THRESH = 64, 3, 2

    @staticmethod
    def _bucket(word: str) -> int:
        import hashlib

        return int(hashlib.md5(word.lower().encode()).hexdigest()[:15], 16) % 64

    @classmethod
    def _weights(cls):
        return {b: (b * 37) % 21 - 10 for b in range(cls.DIMS)}

    def _wdf(self, spark):
        from pyspark.sql import functions as F

        return spark.range(self.DIMS).select(
            F.col("id").alias("bucket"),
            ((F.col("id") * 37) % 21 - 10).cast("long").alias("weight"),
        )

    def test_matches_python_simulation(self, spark):
        """Score map equals a driver-side replication of the hashed
        bag-of-words + integer mean pooling — including trunc-division
        on NEGATIVE sums."""
        from pyspark.sql import Row

        from correctocr_spark.ops.textstats import linear_classifier_scores

        docs = [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "aaa bbb ccc ddd eee fff"),
            (2, ""),  # wordless -> bias
            (3, "one"),
        ]
        df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in docs])
        got = {
            r["doc_id"]: (r["n_words"], r["score"], r["keep"])
            for r in linear_classifier_scores(
                df, self._wdf(spark), dims=self.DIMS,
                bias=self.BIAS, threshold=self.THRESH,
            ).collect()
        }
        w = self._weights()
        for i, t in docs:
            words = t.split()
            s = sum(w[self._bucket(x)] for x in words)
            # Spark `div` truncates toward zero (matches DuckDB //)
            q = abs(s) // max(len(words), 1)
            pooled = q if s >= 0 else -q
            score = self.BIAS + pooled
            assert got[i] == (len(words), score, score >= self.THRESH), (i, t)

    def test_weights_broadcast_no_smj_on_bucket(self, spark):
        import io
        from contextlib import redirect_stdout

        from pyspark.sql import Row

        from correctocr_spark.ops.textstats import linear_classifier_scores

        df = spark.createDataFrame([Row(doc_id=0, text="a b c")])
        out = linear_classifier_scores(df, self._wdf(spark), dims=self.DIMS)
        buf = io.StringIO()
        with redirect_stdout(buf):
            out.explain("formatted")
        p = buf.getvalue()
        assert "BroadcastHashJoin" in p
        for line in p.splitlines():
            if "SortMergeJoin" in line:
                assert "_b" not in line, line
        spark.catalog.clearCache()

    def test_dims_validated(self, spark):
        import pytest as _pytest

        from pyspark.sql import Row

        from correctocr_spark.ops.textstats import linear_classifier_scores

        df = spark.createDataFrame([Row(doc_id=0, text="x")])
        with _pytest.raises(ValueError, match="dims"):
            linear_classifier_scores(df, self._wdf(spark), dims=0)


class TestNgramCounts:
    def test_counts_and_df(self, spark):
        from correctocr_spark.ops.textstats import ngram_counts

        docs = spark.createDataFrame(
            [
                (1, "a b a b c"),      # "a b" x2, "b a" x1, "b c" x1
                (2, "a b x"),          # "a b" x1, "b x" x1
                (3, "short"),          # < n words: contributes nothing
                (4, ""),
            ],
            "doc_id long, text string",
        )
        rows = {r.gram: (r.n_occurrences, r.n_docs) for r in
                ngram_counts(docs, n=2, min_count=1).collect()}
        assert rows["a b"] == (3, 2)
        assert rows["b a"] == (1, 1)
        assert rows["b x"] == (1, 1)
        assert "short" not in rows

    def test_min_count_prunes_after_full_aggregation(self, spark):
        from correctocr_spark.ops.textstats import ngram_counts

        docs = spark.createDataFrame(
            [(1, "p q"), (2, "p q"), (3, "r s")],
            "doc_id long, text string",
        )
        rows = {r.gram for r in ngram_counts(docs, n=2, min_count=2).collect()}
        # "p q" totals 2 across docs (1 each) -> kept; "r s" pruned
        assert rows == {"p q"}

    def test_shuffle_carries_distinct_gram_doc(self, spark):
        """The plan must pre-aggregate on (gram, doc) with map-side
        partials and contain no exact-distinct double exchange."""
        import io
        from contextlib import redirect_stdout

        from correctocr_spark.ops.textstats import ngram_counts

        docs = spark.createDataFrame(
            [(1, "a b a b")], "doc_id long, text string"
        )
        buf = io.StringIO()
        with redirect_stdout(buf):
            ngram_counts(docs).explain("formatted")
        p = buf.getvalue()
        assert "partial_count" in p
        tree = p.split("\n\n")[0]
        assert tree.count("Exchange") == 2  # (gram,doc) then gram rollup
        assert "Join" not in p


class TestBigramLm:
    def test_hand_computed_tiny_corpus(self, spark):
        import math

        from correctocr_spark.ops.textstats import bigram_lm_scores

        docs = spark.createDataFrame(
            [(1, "a b a b"), (2, "a b"), (3, "x"), (4, "")],
            "doc_id long, text string",
        )
        # bigrams: doc1 -> [a b, b a, a b], doc2 -> [a b]
        # model: "a b":3, "b a":1; ctx: a->3, b->1; V = |{b, a}| = 2
        rows = {r.doc_id: r for r in bigram_lm_scores(docs).collect()}
        lp_ab = round(math.log((3 + 1) / (3 + 2)) * 1e6)
        lp_ba = round(math.log((1 + 1) / (1 + 2)) * 1e6)
        assert rows[1].n_bigrams == 3
        assert rows[1].sum_logprob_micro == 2 * lp_ab + lp_ba
        assert rows[2].sum_logprob_micro == lp_ab
        # <2 words: no context anywhere, zeroed with NULL avg
        assert (rows[3].n_bigrams, rows[3].avg_logprob) == (0, None)
        assert (rows[4].n_bigrams, rows[4].avg_logprob) == (0, None)

    def test_orders_word_salad_below_typical_text(self, spark):
        """The signal the unigram model cannot give: identical word
        multiset, shuffled order -> lower bigram score."""
        from correctocr_spark.ops.textstats import bigram_lm_scores

        typical = "the cat sat on the mat and the dog sat on the rug"
        corpus = [(i, typical) for i in range(10)]
        salad = "mat the on dog sat rug the cat the and on sat the"
        docs = spark.createDataFrame(
            corpus + [(99, salad)], "doc_id long, text string"
        )
        rows = {r.doc_id: r.avg_logprob for r in bigram_lm_scores(docs).collect()}
        assert rows[99] < rows[0]


def test_lm_buckets_accept_bigram_scores(spark):
    """lm_quality_buckets composes with the bigram scorer: the count
    column carries through under its own name and the shuffled-order
    outlier lands in tail."""
    from correctocr_spark.ops.textstats import (
        bigram_lm_scores,
        lm_quality_buckets,
    )

    typical = "the cat sat on the mat and the dog sat on the rug"
    docs = spark.createDataFrame(
        [(i, typical) for i in range(10)]
        + [(99, "mat the on dog sat rug the cat the and on sat the")],
        "doc_id long, text string",
    )
    out = lm_quality_buckets(docs, scores=bigram_lm_scores(docs))
    assert "n_bigrams" in out.columns
    buckets = {r.doc_id: r.bucket for r in out.collect()}
    assert buckets[99] == "tail"


class TestSplitSentences:
    def test_boundaries_quotes_and_edge_docs(self, spark):
        from correctocr_spark.ops.cleaning import split_sentences

        docs = spark.createDataFrame(
            [
                (1, 'Hello there. How are you?  Fine!" Next (sic.) end'),
                (2, None),
                (3, "   "),
                (4, "No terminal punct"),
            ],
            "doc_id long, text string",
        )
        rows = [
            (r.doc_id, r.sent_id, r.sentence)
            for r in split_sentences(docs).orderBy("doc_id", "sent_id").collect()
        ]
        assert rows == [
            (1, 0, "Hello there."),
            (1, 1, "How are you?"),
            (1, 2, 'Fine!"'),
            (1, 3, "Next (sic.)"),
            (1, 4, "end"),
            (4, 0, "No terminal punct"),
        ]

    def test_min_chars_keeps_ids_dense(self, spark):
        from correctocr_spark.ops.cleaning import split_sentences

        docs = spark.createDataFrame(
            [(1, "One. A. Second real sentence. B. Third.")],
            "doc_id long, text string",
        )
        rows = [
            (r.sent_id, r.sentence)
            for r in split_sentences(docs, min_chars=3)
            .orderBy("sent_id")
            .collect()
        ]
        assert rows == [
            (0, "One."),
            (1, "Second real sentence."),
            (2, "Third."),
        ]

    def test_scan_speed_plan(self, spark):
        import io
        from contextlib import redirect_stdout

        from correctocr_spark.ops.cleaning import split_sentences

        docs = spark.createDataFrame([(1, "a. b.")], "doc_id long, text string")
        buf = io.StringIO()
        with redirect_stdout(buf):
            split_sentences(docs).explain("formatted")
        p = buf.getvalue()
        assert "Exchange" not in p and "Join" not in p
        assert "Generate" in p


class TestDedupParagraphsInDoc:
    def _run(self, spark, texts):
        from correctocr_spark.ops.cleaning import dedup_paragraphs_in_doc
        from pyspark.sql import Row

        df = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
        )
        return {r["doc_id"]: r.asDict() for r in dedup_paragraphs_in_doc(df).collect()}

    def test_first_occurrence_kept_in_order(self, spark):
        r = self._run(spark, ["A\n\nB\n\nA\n\nC\n\nB"])[0]
        assert r["text"] == "A\n\nB\n\nC"
        assert r["n_paras"] == 5 and r["n_unique_paras"] == 3

    def test_no_duplicates_is_identity(self, spark):
        t = "alpha\n\nbeta\n\ngamma"
        r = self._run(spark, [t])[0]
        assert r["text"] == t and r["n_paras"] == r["n_unique_paras"] == 3

    def test_single_newlines_not_breaks(self, spark):
        # lines within one paragraph are untouched
        t = "A\nA\n\nA\nA"
        r = self._run(spark, [t])[0]
        assert r["text"] == "A\nA" and r["n_paras"] == 2 and r["n_unique_paras"] == 1

    def test_null_text_empty(self, spark):
        from correctocr_spark.ops.cleaning import dedup_paragraphs_in_doc

        df = spark.createDataFrame(
            [(0, None)], "doc_id long, text string"
        )
        r = dedup_paragraphs_in_doc(df).first()
        assert r["text"] == "" and r["n_paras"] == 1



class TestMojibake:
    """Wrong-codec detection + signature repair (ops/textstats.py)."""

    def _stats(self, spark, texts):
        from correctocr_spark.ops.textstats import mojibake_stats
        from pyspark.sql import Row

        df = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
        )
        return {r["doc_id"]: r.asDict() for r in mojibake_stats(df).collect()}

    def test_clean_ascii_zero(self, spark):
        r = self._stats(spark, ["perfectly clean text"])[0]
        assert r["sig_hits"] == 0 and r["replacement_chars"] == 0
        assert r["mojibake_bp"] == 0

    def test_punctuation_family_counted_once(self, spark):
        # \u00e2\u20ac\u2122 contains the bare \u00e2\u20ac lead: one hit, not two
        r = self._stats(spark, ["x \u00e2\u20ac\u2122 y"])[0]
        assert r["sig_hits"] == 1

    def test_latin_signatures_and_rate(self, spark):
        t = "Caf\u00c3\u00a9 gar\u00c3\u00a7on"  # 2 sigs, 12 chars after decode? no: raw len
        r = self._stats(spark, [t])[0]
        assert r["sig_hits"] == 2
        assert r["n_chars"] == len(t)
        assert r["mojibake_bp"] == (2 * 10000) // len(t)

    def test_replacement_chars_counted(self, spark):
        r = self._stats(spark, ["ab\ufffd\ufffdcd"])[0]
        assert r["replacement_chars"] == 2 and r["sig_hits"] == 0

    def test_fix_repairs_longest_first(self, spark):
        from correctocr_spark.ops.textstats import fix_mojibake
        from pyspark.sql import Row

        df = spark.createDataFrame(
            [
                Row(doc_id=0, text="Caf\u00c3\u00a9 \u00e2\u20ac\u2122 \u00e2\u20ac\u201c \u00e2\u20ac x \u00c2\u00b0C"),
                Row(doc_id=1, text=None),
            ]
        )
        out = {r["doc_id"]: r["text"] for r in fix_mojibake(df).collect()}
        assert out[0] == "Caf\u00e9 \u2019 \u2013 \u201d x \u00b0C"
        assert out[1] == ""

    def test_fix_idempotent_on_clean(self, spark):
        from correctocr_spark.ops.textstats import fix_mojibake
        from pyspark.sql import Row

        t = "already clean caf\u00e9 \u2019quoted\u2019"
        df = spark.createDataFrame([Row(doc_id=0, text=t)])
        assert fix_mojibake(df).first()["text"] == t


class TestDsir:
    """DSIR importance resampling (Xie et al. 2023): hashed
    unigram+bigram log-likelihood-ratio weights + Gumbel top-k."""

    DIMS = 32

    RAW = [
        (0, "the cat sat on the mat"),
        (1, "quantum flux capacitor overload"),
        (2, "the cat sat"),
        (3, ""),  # featureless
        (4, "zzz yyy xxx www"),
    ]
    TGT = [(10, "the cat sat on the mat"), (11, "the dog sat on the rug")]

    @staticmethod
    def _feats(text: str):
        ws = text.split()
        return [w.lower() for w in ws] + [
            f"{a} {b}".lower() for a, b in zip(ws, ws[1:])
        ]

    @classmethod
    def _bucket(cls, feat: str) -> int:
        import hashlib

        return int(hashlib.md5(feat.encode()).hexdigest()[:15], 16) % cls.DIMS

    @staticmethod
    def _micro(x: float) -> int:
        import math

        return int(math.copysign(math.floor(abs(x) * 1_000_000.0 + 0.5), x))

    @classmethod
    def _expected_weights(cls):
        import math
        from collections import Counter

        qc = Counter(cls._bucket(f) for _, t in cls.RAW for f in cls._feats(t))
        pc = Counter(cls._bucket(f) for _, t in cls.TGT for f in cls._feats(t))
        nq, np_ = sum(qc.values()), sum(pc.values())
        lam = {
            b: cls._micro(math.log((pc.get(b, 0) + 1) / (np_ + cls.DIMS)))
            - cls._micro(math.log((qc[b] + 1) / (nq + cls.DIMS)))
            for b in qc
        }
        out = {}
        for did, t in cls.RAW:
            bs = [cls._bucket(f) for f in cls._feats(t)]
            out[did] = (len(bs), sum(lam[b] for b in bs))
        return out

    def _df(self, spark, rows):
        from pyspark.sql import Row

        return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])

    def test_matches_python_simulation(self, spark):
        """Weight map equals a driver-side replication of the hashed
        bag-of-features log-ratio — exact integers end to end."""
        from correctocr_spark.ops.textstats import dsir_weights

        got = {
            r["doc_id"]: (r["n_feats"], r["logweight_micro"])
            for r in dsir_weights(
                self._df(spark, self.RAW),
                self._df(spark, self.TGT),
                dims=self.DIMS,
            ).collect()
        }
        assert got == self._expected_weights()

    def test_featureless_doc_returns(self, spark):
        from correctocr_spark.ops.textstats import dsir_weights

        r = {
            x["doc_id"]: x
            for x in dsir_weights(
                self._df(spark, self.RAW), self._df(spark, self.TGT), dims=self.DIMS
            ).collect()
        }[3]
        assert (r["n_feats"], r["logweight_micro"], r["avg_logweight"]) == (0, 0, None)

    def test_target_like_scores_higher(self, spark):
        """A raw doc verbatim in the target outranks a disjoint-vocab
        doc on mean per-feature weight — the selection property the
        operator exists for."""
        from correctocr_spark.ops.textstats import dsir_weights

        avg = {
            r["doc_id"]: r["avg_logweight"]
            for r in dsir_weights(
                self._df(spark, self.RAW), self._df(spark, self.TGT), dims=self.DIMS
            ).collect()
        }
        assert avg[0] > avg[1] and avg[0] > avg[4]

    def test_topk_is_weight_plus_gumbel(self, spark):
        """key_micro == logweight_micro + gumbel_micro, the result has
        exactly n rows, and a re-run under the same seed is identical
        (deterministic sampling); a different seed reshuffles."""
        from correctocr_spark.ops.textstats import dsir_topk

        raw, tgt = self._df(spark, self.RAW), self._df(spark, self.TGT)
        a = dsir_topk(raw, tgt, n=3, seed=42, dims=self.DIMS).collect()
        assert len(a) == 3
        assert all(
            r["key_micro"] == r["logweight_micro"] + r["gumbel_micro"] for r in a
        )
        b = dsir_topk(raw, tgt, n=3, seed=42, dims=self.DIMS).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]
        keys_a = [r["key_micro"] for r in a]
        assert keys_a == sorted(keys_a, reverse=True)
        c = dsir_topk(raw, tgt, n=3, seed=7, dims=self.DIMS).collect()
        assert {r["gumbel_micro"] for r in c} != {r["gumbel_micro"] for r in a}

    def test_validation(self, spark):
        import pytest as _pytest

        from correctocr_spark.ops.textstats import dsir_weights

        raw = self._df(spark, self.RAW)
        with _pytest.raises(ValueError):
            dsir_weights(raw, raw, dims=0)
        with _pytest.raises(ValueError):
            dsir_weights(raw, raw, smoothing_k=0)


class TestKneserNey:
    """Interpolated Kneser-Ney bigram scoring: exact-value simulation +
    the continuation-probability property the smoothing exists for."""

    @staticmethod
    def _df(spark, rows):
        from pyspark.sql import Row

        return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])

    @staticmethod
    def _micro(x: float) -> int:
        import math

        return int(math.copysign(math.floor(abs(x) * 1_000_000.0 + 0.5), x))

    @classmethod
    def _expected(cls, rows, d=0.75):
        import math
        from collections import Counter

        grams = {}
        for did, t in rows:
            ws = t.split()
            grams[did] = [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        model = Counter(g for gs in grams.values() for g in gs)
        ctx_cnt = Counter()
        n1_fwd = Counter()
        n1_back = Counter()
        for g, c in model.items():
            v, w = g.split(" ", 1)
            ctx_cnt[v] += c
            n1_fwd[v] += 1
            n1_back[w] += 1
        n_types = len(model)
        lp = {
            g: cls._micro(
                math.log(
                    max(c - d, 0.0) / ctx_cnt[g.split(" ", 1)[0]]
                    + d
                    * n1_fwd[g.split(" ", 1)[0]]
                    / ctx_cnt[g.split(" ", 1)[0]]
                    * (n1_back[g.split(" ", 1)[1]] / n_types)
                )
            )
            for g, c in model.items()
        }
        return {
            did: (len(gs), sum(lp[g] for g in gs)) for did, gs in grams.items()
        }, lp

    def test_matches_python_simulation(self, spark):
        from correctocr_spark.ops.textstats import kn_bigram_lm_scores

        rows = [
            (0, "the cat sat on the mat"),
            (1, "the cat ran"),
            (2, "one"),  # no bigrams
            (3, "san francisco san francisco"),
        ]
        exp, _ = self._expected(rows)
        got = {
            r["doc_id"]: (r["n_bigrams"], r["sum_logprob_micro"])
            for r in kn_bigram_lm_scores(self._df(spark, rows)).collect()
        }
        assert got == exp

    def test_short_doc_null_avg(self, spark):
        from correctocr_spark.ops.textstats import kn_bigram_lm_scores

        r = {
            x["doc_id"]: x
            for x in kn_bigram_lm_scores(
                self._df(spark, [(0, "solo"), (1, "two words")])
            ).collect()
        }[0]
        assert (r["n_bigrams"], r["sum_logprob_micro"], r["avg_logprob"]) == (
            0,
            0,
            None,
        )

    def test_continuation_backoff_property(self, spark):
        """'francisco' is frequent but follows ONE context; 'car'
        follows many. With equal observed counts for 'a francisco' and
        'a car', KN must score 'a car' higher — the versatility signal
        add-k smoothing cannot express."""
        from correctocr_spark.ops.textstats import kn_bigram_lm_scores

        rows = [
            (0, "san francisco san francisco san francisco san francisco san francisco"),
            (1, "red car blue car old car new car fast car"),
            (2, "a francisco"),
            (3, "a car"),
        ]
        _, lp = self._expected(rows)
        got = {
            r["doc_id"]: r["sum_logprob_micro"]
            for r in kn_bigram_lm_scores(self._df(spark, rows)).collect()
        }
        # sanity: spark agrees with the simulation on the probe docs
        assert got[2] == lp["a francisco"] and got[3] == lp["a car"]
        assert lp["a car"] > lp["a francisco"]

    def test_validation(self, spark):
        import pytest as _pytest

        from correctocr_spark.ops.textstats import kn_bigram_lm_scores

        df = self._df(spark, [(0, "a b")])
        for bad in (0, 1000, -5):
            with _pytest.raises(ValueError):
                kn_bigram_lm_scores(df, discount_milli=bad)


class TestDomainReweight:
    """DoReMi exponentiated-gradient mixture step: simulation identity,
    invariances, the overflow guard, uniform smoothing."""

    @staticmethod
    def _df(spark, rows):
        from pyspark.sql import Row

        return spark.createDataFrame(
            [
                Row(domain=d, weight_micro=w, excess_loss_micro=l)
                for d, w, l in rows
            ]
        )

    def _run(self, spark, rows, **kw):
        from correctocr_spark.ops.cleaning import domain_reweight

        return {
            r["domain"]: r["new_weight_micro"]
            for r in domain_reweight(self._df(spark, rows), **kw).collect()
        }

    def test_matches_python_simulation(self, spark):
        import math

        rows = [("a", 500000, 200000), ("b", 300000, -100000), ("c", 200000, 0)]
        eta, c = 150, 50
        raw = {
            d: w
            * int(
                math.copysign(
                    math.floor(
                        abs(math.exp((eta / 1000.0) * (l / 1_000_000.0)) * 1e6)
                        + 0.5
                    ),
                    1,
                )
            )
            for d, w, l in rows
        }
        tot, k = sum(raw.values()), len(rows)
        exp = {
            d: ((1000 - c) * ((r * 1_000_000) // tot) + c * (1_000_000 // k))
            // 1000
            for d, r in raw.items()
        }
        assert self._run(spark, rows, eta_milli=eta, smooth_milli=c) == exp

    def test_zero_loss_keeps_relative_weights(self, spark):
        rows = [("a", 600000, 0), ("b", 400000, 0)]
        got = self._run(spark, rows, eta_milli=100, smooth_milli=0)
        assert got == {"a": 600000, "b": 400000}

    def test_high_loss_upweights(self, spark):
        rows = [("hard", 500000, 1_000_000), ("easy", 500000, -1_000_000)]
        got = self._run(spark, rows, eta_milli=500, smooth_milli=0)
        assert got["hard"] > 500000 > got["easy"]
        assert 999_990 <= got["hard"] + got["easy"] <= 1_000_000

    def test_full_smoothing_is_uniform(self, spark):
        rows = [("a", 900000, 2_000_000), ("b", 100000, -2_000_000)]
        got = self._run(spark, rows, eta_milli=100, smooth_milli=1000)
        assert got == {"a": 500000, "b": 500000}

    def test_overflow_guard_raises(self, spark):
        import pytest as _pytest

        # eta*loss = 3 nats -> factor e^3 ~ 20.1e6 micro > the 9e6 cap
        rows = [("a", 500000, 3_000_000), ("b", 500000, 0)]
        with _pytest.raises(ValueError, match="rescale"):
            self._run(spark, rows, eta_milli=1000, smooth_milli=0)
        # and a loss big enough that the long CAST itself overflows to
        # NULL (e^30 * 1e6 > int64) must hit the same loud branch
        rows = [("a", 500000, 30_000_000), ("b", 500000, 0)]
        with _pytest.raises(ValueError, match="rescale"):
            self._run(spark, rows, eta_milli=1000, smooth_milli=0)

    def test_validation(self, spark):
        import pytest as _pytest

        df_rows = [("a", 500000, 0)]
        with _pytest.raises(ValueError):
            self._run(spark, df_rows, eta_milli=-1)
        with _pytest.raises(ValueError):
            self._run(spark, df_rows, smooth_milli=1001)


class TestAlphaSampleShares:
    """mT5 α-sampling: simulation identity, α=1 identity, flattening
    direction, validation."""

    @staticmethod
    def _df(spark, rows):
        from pyspark.sql import Row

        return spark.createDataFrame(
            [Row(lang=g, n_docs=n) for g, n in rows]
        )

    def _run(self, spark, rows, alpha):
        from correctocr_spark.ops.cleaning import alpha_sample_shares

        return {
            r["group"]: (r["raw_share_micro"], r["alpha_share_micro"])
            for r in alpha_sample_shares(
                self._df(spark, rows), alpha_milli=alpha, group_col="lang"
            ).collect()
        }

    def test_matches_python_simulation(self, spark):
        import math

        rows = [("en", 800), ("fr", 150), ("sw", 50)]
        alpha = 300
        n = sum(c for _, c in rows)
        pow_ = {
            g: int(
                math.floor(
                    abs(math.exp((alpha / 1000.0) * math.log(c / n)) * 1e6)
                    + 0.5
                )
            )
            for g, c in rows
        }
        pt = sum(pow_.values())
        exp = {
            g: ((c * 1_000_000) // n, (pow_[g] * 1_000_000) // pt)
            for g, c in rows
        }
        assert self._run(spark, rows, alpha) == exp

    def test_alpha_one_is_identity(self, spark):
        rows = [("en", 750), ("fr", 250)]
        got = self._run(spark, rows, 1000)
        for g, (raw, a) in got.items():
            assert abs(raw - a) <= 1, got  # identical up to 1-micro flooring

    def test_flattens_toward_uniform(self, spark):
        rows = [("head", 900), ("tail", 100)]
        got = self._run(spark, rows, 300)
        assert got["head"][1] < got["head"][0]
        assert got["tail"][1] > got["tail"][0]

    def test_validation(self, spark):
        import pytest as _pytest

        for bad in (0, 1001, -3):
            with _pytest.raises(ValueError):
                self._run(spark, [("en", 10)], bad)


class TestOutlinkProfile:
    def test_hand_profile(self, spark):
        from correctocr_spark.ops.cleaning import outlink_profile

        html = (
            '<a href="http://ext1.com/a">x</a>'
            '<a href="http://ext1.com/b" rel="nofollow">y</a>'
            '<a href="http://ext2.com/c">z</a>'
            '<a href="/internal">i</a>'
            '<a href="http://me.com/self">s</a>'
        )
        pages = spark.createDataFrame(
            [("http://me.com/p", html), ("http://me.com/none", "text only")],
            ["url", "html"],
        )
        out = {r["url"]: r for r in outlink_profile(pages).collect()}
        p = out["http://me.com/p"]
        assert (p["n_links"], p["n_external"], p["n_nofollow"], p["n_ext_hosts"]) == (5, 3, 1, 2)
        assert (p["external_bp"], p["nofollow_bp"]) == (6000, 2000)
        none = out["http://me.com/none"]
        assert none["n_links"] == 0 and none["external_bp"] == 0

    def test_row_local_plan(self, spark):
        from correctocr_spark.ops.cleaning import outlink_profile

        pages = spark.createDataFrame([("http://a.com/", "<a href=\"http://b.com/\">l</a>")],
                                      ["url", "html"])
        plan = outlink_profile(pages)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Generate" not in plan
