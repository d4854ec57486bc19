"""The end-to-end corpus-curation composition: quality gate ->
exact-dup canonical -> near-dup (MinHash-LSH -> connected components)
canonical -> optional deterministic sample -> token-budget shards.

This is the library form of the ``training_corpus`` contract query
(__spark_entry__.py) plus the packing/writing tail — the single pass a
training-data pipeline runs between a crawl snapshot and tokenization.
Every stage is one of the first-class, individually-oracled operators;
this module only composes them.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .cleaning import deterministic_sample, pack_shards
from .dedup import (
    connected_components,
    lsh_candidate_pairs,
    minhash_signatures,
    shingles_df,
)
from .textstats import quality_scores


def curated_doc_ids(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    shingle_k: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    max_bucket: Optional[int] = None,
    canonical: str = "min_id",
) -> DataFrame:
    """Surviving doc ids: quality >= min_quality AND canonical member of
    both its exact-duplicate group and its near-dup cluster. Shapes: one
    window keyed by content hash (exact), the banded LSH self-join +
    O(log d) label propagation (near), three semi/anti joins to combine
    — no driver-side data beyond CC's round counts.

    ``canonical``: ``"min_id"`` (the oracle contract — lowest id wins)
    or ``"quality"`` (the highest-quality cluster member survives, via
    :func:`canonical_by_quality` over the same labels)."""
    quality_ok = (
        quality_scores(docs, id_col=id_col, text_col=text_col)
        .where(F.col("quality_score") >= min_quality)
        .select("doc_id")
    )

    w = Window.partitionBy(F.md5(F.col(text_col)))
    exact_canonical = (
        docs.withColumn("_keep", F.min(id_col).over(w))
        .where(F.col(id_col) == F.col("_keep"))
        .select(F.col(id_col).alias("doc_id"))
    )

    sh = shingles_df(docs, id_col=id_col, text_col=text_col, k=shingle_k)
    sig = minhash_signatures(sh, num_hashes=num_hashes)
    pairs = lsh_candidate_pairs(
        sig, num_hashes=num_hashes, bands=bands, max_bucket=max_bucket
    )
    cc = connected_components(pairs)
    if canonical == "quality":
        elected = canonical_by_quality(
            docs, pairs, id_col=id_col, text_col=text_col, cc=cc
        ).select(F.col("canonical_id").alias("doc_id"))
        near_dup_losers = cc.select("doc_id").join(
            elected, on="doc_id", how="left_anti"
        )
    else:
        near_dup_losers = cc.where(F.col("doc_id") != F.col("component")).select(
            "doc_id"
        )

    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(quality_ok, on="doc_id", how="left_semi")
        .join(exact_canonical, on="doc_id", how="left_semi")
        .join(near_dup_losers, on="doc_id", how="left_anti")
    )


def canonical_by_quality(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    cc: Optional[DataFrame] = None,
) -> DataFrame:
    """Per near-dup cluster, elect the HIGHEST-QUALITY member (ties ->
    min doc_id) — the production alternative to min-id canonicals: when
    a page exists as a clean mirror and a boilerplate-ridden one, keep
    the clean copy. One cluster-keyed window over the (tiny) cluster
    member set; returns (component, canonical_id, quality_score).
    Pass precomputed ``cc`` labels to avoid re-running the propagation
    (curated_doc_ids does)."""
    if cc is None:
        cc = connected_components(pairs)
    q = quality_scores(docs, id_col=id_col, text_col=text_col).select(
        "doc_id", "quality_score"
    )
    member = cc.join(q, on="doc_id")
    w = Window.partitionBy("component").orderBy(
        F.desc("quality_score"), F.asc("doc_id")
    )
    return (
        member.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") == 1)
        .select(
            "component", F.col("doc_id").alias("canonical_id"), "quality_score"
        )
    )


def curate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    shingle_k: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    max_bucket: Optional[int] = None,
    sample_rate: Optional[float] = None,
    sample_rates: Optional[Dict[str, float]] = None,
    stratify_col: str = "lang",
    shard_budget: Optional[int] = None,
    canonical: str = "min_id",
) -> DataFrame:
    """Full curation: filter to surviving docs, optionally sample,
    optionally assign token-budget shards. Returns the curated documents
    (all original columns) plus ``n_tokens``/``shard`` when packing."""
    keep = curated_doc_ids(
        docs,
        id_col=id_col,
        text_col=text_col,
        min_quality=min_quality,
        shingle_k=shingle_k,
        num_hashes=num_hashes,
        bands=bands,
        max_bucket=max_bucket,
        canonical=canonical,
    ).withColumnRenamed("doc_id", id_col)
    out = docs.join(keep, on=id_col, how="left_semi")
    if sample_rate is not None or sample_rates:
        out = deterministic_sample(
            out,
            rate=sample_rate if sample_rate is not None else 0.0,
            rates=sample_rates,
            stratify_col=stratify_col,
            key_col=id_col,
        )
    if shard_budget:
        shards = pack_shards(
            out, budget=shard_budget, id_col=id_col, text_col=text_col
        ).withColumnRenamed("doc_id", id_col)
        out = out.join(shards, on=id_col)
    return out
