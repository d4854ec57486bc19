"""Round-6 optimization pins: restructured operators must be
result-identical to their round-5 (composed / dense / joined) forms.

Each test freezes the EXACT output contract of an operator whose
internals this round restructured for plan shape:

- spam_mass:   fused double-vector loop == pagerank ∘ trustrank join
- hits:        sparse per-round renorm == dense completion at the end
- LM scorers:  explode_outer scoring pass keeps empty/short docs with
               zero counts and NULL averages (the former join-back rows)
- dsir:        featureless docs score (0, 0, NULL)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from correctocr_spark.spark.session import get_spark

    s = get_spark(app_name="round6-opt-tests", cores=4, shuffle_partitions=4)
    yield s


def test_spam_mass_equals_composed_pagerank_trustrank(spark):
    from correctocr_spark.ops.graph import pagerank, spam_mass, trustrank

    edges = spark.createDataFrame(
        [
            # trusted cluster 1-2-3 with seed 1
            (1, 2), (2, 3), (3, 1), (1, 3),
            # spam farm 10-11-12 densely interlinked, no trusted inlink
            (10, 11), (11, 10), (10, 12), (12, 10), (11, 12), (12, 11),
            # bridge from trusted world to 4
            (2, 4), (3, 4),
        ],
        "src long, dst long",
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    fused = {r["node"]: r for r in spam_mass(edges, seeds).collect()}
    pr = {r["node"]: r["rank"] for r in pagerank(edges).collect()}
    tr = {r["node"]: r["rank"] for r in trustrank(edges, seeds).collect()}
    assert set(fused) == set(pr) == set(tr)
    for node, row in fused.items():
        assert row["rank"] == pr[node], node
        assert row["trust"] == tr[node], node
        expected_bp = (
            ((pr[node] - tr[node]) * 10000) // pr[node] if pr[node] > 0 else 0
        )
        assert row["spam_mass_bp"] == expected_bp, node


def test_hits_sparse_renorm_keeps_zero_nodes(spark):
    from correctocr_spark.ops.graph import hits

    # node 5 has only OUT-edges (authority 0); node 6 only IN-edges
    # (hub 0): both must still appear in the output, scored 0 exactly
    # as the former dense per-round completion produced.
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (5, 1), (1, 6)], "src long, dst long"
    )
    rows = {r["node"]: r for r in hits(edges, iterations=3).collect()}
    assert set(rows) == {1, 2, 5, 6}
    assert rows[5]["authority"] == 0
    assert rows[6]["hub"] == 0
    assert rows[1]["authority"] > 0 and rows[1]["hub"] > 0
    # L-infinity renorm: the max side sits exactly at scale
    assert max(r["authority"] for r in rows.values()) == 1_000_000
    assert max(r["hub"] for r in rows.values()) == 1_000_000


@pytest.fixture(scope="module")
def lm_docs(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cat sat"),
            (3, "word"),          # no bigrams
            (4, ""),              # no words at all
            (5, "the cat sat on the mat again and again"),
        ],
        "doc_id long, text string",
    )


def test_unigram_lm_explode_outer_keeps_empty_docs(spark, lm_docs):
    from correctocr_spark.ops.textstats import unigram_lm_scores

    rows = {r["doc_id"]: r for r in unigram_lm_scores(lm_docs).collect()}
    assert set(rows) == {1, 2, 3, 4, 5}
    assert rows[4]["n_words"] == 0
    assert rows[4]["sum_logprob_micro"] == 0
    assert rows[4]["avg_logprob"] is None
    assert rows[1]["n_words"] == 6 and rows[1]["avg_logprob"] is not None


@pytest.mark.parametrize("fn", ["bigram_lm_scores", "kn_bigram_lm_scores"])
def test_bigram_lms_keep_short_docs(spark, lm_docs, fn):
    import correctocr_spark.ops.textstats as ts

    rows = {r["doc_id"]: r for r in getattr(ts, fn)(lm_docs).collect()}
    assert set(rows) == {1, 2, 3, 4, 5}
    for short in (3, 4):  # < 2 words -> no bigrams, NULL avg
        assert rows[short]["n_bigrams"] == 0
        assert rows[short]["sum_logprob_micro"] == 0
        assert rows[short]["avg_logprob"] is None
    assert rows[1]["n_bigrams"] == 5 and rows[1]["avg_logprob"] is not None


def test_dsir_weights_keep_featureless_docs(spark, lm_docs):
    from correctocr_spark.ops.textstats import dsir_weights

    target = lm_docs.where(F.col("doc_id") == 1)
    rows = {r["doc_id"]: r for r in dsir_weights(lm_docs, target).collect()}
    assert set(rows) == {1, 2, 3, 4, 5}
    assert rows[4]["n_feats"] == 0
    assert rows[4]["logweight_micro"] == 0
    assert rows[4]["avg_logweight"] is None
    # doc 3: one word, no bigram -> exactly 1 feature
    assert rows[3]["n_feats"] == 1
