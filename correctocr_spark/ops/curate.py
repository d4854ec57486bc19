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

from typing import Dict, List, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .cache import register_intermediates
from .cleaning import deterministic_sample, mix_proportions, pack_shards
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
    q = quality_scores(docs, id_col=id_col, text_col=text_col).select(
        "doc_id", "quality_score"
    )
    if canonical == "quality":
        # the score table feeds BOTH the gate and the canonical election
        # — persist + eager count so the interpreted HOF-heavy quality
        # projection scans the corpus ONCE, not once per consumer
        # (an eagerly-materialized persist is read by both; a lazy one
        # can still compute per concurrently-launching consumer stage)
        q = q.persist()
        q.count()
    quality_ok = q.where(F.col("quality_score") >= min_quality).select("doc_id")

    # min-id per content hash as an AGGREGATION instead of a window:
    # the groupBy partial-aggregates map-side and never sorts, where
    # the window shuffled every (id, hash) row and sorted each hash
    # partition; the surviving id set — and hence the semi-join below —
    # is identical (min over the same groups).
    exact_canonical = (
        docs.groupBy(F.md5(F.col(text_col)).alias("_h"))
        .agg(F.min(id_col).alias("doc_id"))
        .select("doc_id")
    )

    sh = shingles_df(docs, id_col=id_col, text_col=text_col, k=shingle_k)
    sig = minhash_signatures(sh, num_hashes=num_hashes)
    pairs = lsh_candidate_pairs(
        sig, num_hashes=num_hashes, bands=bands, max_bucket=max_bucket
    )
    cc = connected_components(pairs)
    if canonical == "quality":
        elected = canonical_by_quality(
            docs, pairs, id_col=id_col, text_col=text_col, cc=cc, quality_df=q
        ).select(F.col("canonical_id").alias("doc_id"))
        near_dup_losers = cc.select("doc_id").join(
            elected, on="doc_id", how="left_anti"
        )
    else:
        near_dup_losers = cc.where(F.col("doc_id") != F.col("component")).select(
            "doc_id"
        )

    out = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(quality_ok, on="doc_id", how="left_semi")
        .join(exact_canonical, on="doc_id", how="left_semi")
        .join(near_dup_losers, on="doc_id", how="left_anti")
    )
    # q is persisted only in quality mode (register_intermediates skips
    # unpersisted sources); pairs carries the LSH band-table cache
    return register_intermediates(out, q, pairs)


def canonical_by_quality(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    cc: Optional[DataFrame] = None,
    quality_df: Optional[DataFrame] = None,
) -> DataFrame:
    """Per near-dup cluster, elect the HIGHEST-QUALITY member (ties ->
    min doc_id) — the production alternative to min-id canonicals: when
    a page exists as a clean mirror and a boilerplate-ridden one, keep
    the clean copy. One cluster-keyed window over the (tiny) cluster
    member set; returns (component, canonical_id, quality_score).
    Pass precomputed ``cc`` labels / ``quality_df`` scores to avoid
    re-running the propagation / re-scanning the corpus for the quality
    projection (curated_doc_ids passes both)."""
    if cc is None:
        cc = connected_components(pairs)
    q = (
        quality_df
        if quality_df is not None
        else quality_scores(docs, id_col=id_col, text_col=text_col)
    ).select("doc_id", "quality_score")
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
    index_path: Optional[str] = None,
    mix: Optional[Dict[str, float]] = None,
    mix_col: str = "lang",
    gopher=False,
    blocklist: Optional[DataFrame] = None,
    url_col: str = "url",
    badwords=None,
    max_badword_ratio: float = 0.1,
    shuffle_seed: Optional[str] = None,
    respect_robots: bool = False,
    html_col: str = "html",
    lm_keep: Optional[List[str]] = None,
    lm_head: float = 0.3,
    lm_tail: float = 0.3,
    host_quota: Optional[int] = None,
    robots_txt: Optional[DataFrame] = None,
    classifier_weights: Optional[DataFrame] = None,
    classifier_dims: int = 1 << 16,
    classifier_bias: int = 0,
    classifier_threshold: int = 0,
) -> DataFrame:
    """Full curation: filter to surviving docs, optionally sample,
    optionally rebalance to a target group mixture
    (:func:`~correctocr_spark.ops.cleaning.mix_proportions` over
    ``mix_col`` — runs AFTER the quality/dedup/sample stages so the
    blend is computed over what actually survived, and BEFORE shard
    packing so shards hold the final mixture), optionally assign
    token-budget shards. Returns the curated documents (all original
    columns) plus ``n_tokens``/``shard`` when packing.

    With ``index_path`` the dedup stage runs INCREMENTALLY against the
    persistent MinHash band index at that path (and appends the
    increment to it) — see :func:`curate_incremental`. In that mode
    ``canonical="quality"`` elects across stored ∪ increment cluster
    members using the index's quality side-table, and the returned
    frame carries a ``_correctocr_superseded`` retraction list of
    previously-published docs that lost their election (preserved
    through the sampling/sharding steps here).

    ``blocklist`` (a one-column ``host`` DataFrame) and ``gopher`` (True
    for the published thresholds, or a dict of gopher_filter keyword
    overrides) prepend the crawl-filter tier, in production order — cheapest gate
    first: the domain blocklist drops pages by ``url_col`` host
    (broadcast anti-join of the tiny blocked-id set, the corpus never
    shuffles), then the Gopher rules run as an INLINE scan filter
    (:func:`~.filters.gopher_filter`, no join), and only the survivors
    pay for quality scoring and MinHash banding. ``badwords`` (a word
    list, or a one-column ``word`` DataFrame for dimension-sized
    lexicons) drops docs whose :func:`~.filters.wordlist_density`
    ``hit_ratio`` exceeds ``max_badword_ratio`` — the list form is an
    inline filter like the Gopher gate; the DataFrame form semi-joins
    the (tiny) surviving-id set.

    ``respect_robots=True`` drops pages whose ``html_col`` carries a
    robots ``noindex`` directive (:func:`~.filters.robots_directives`)
    before every other gate — crawl politeness precedes content policy.

    ``robots_txt`` (a ``(host, content)`` DataFrame of per-host
    robots.txt bodies) drops pages the RFC 9309 fetch gate disallows
    (:func:`~.filters.robots_txt_gate` — broadcast host join +
    row-local longest-match fold), alongside the meta gate: the
    file-level and tag-level politeness contracts compose.

    ``lm_keep`` (e.g. ``["head", "middle"]``) runs the CCNet-style
    perplexity gate (:func:`~.textstats.lm_quality_buckets` with
    ``lm_head``/``lm_tail`` cut fractions) over the post-crawl-filter
    survivors and keeps only the named buckets, before quality scoring
    and dedup pay for the dropped mass.

    ``classifier_weights`` (a ``(bucket, weight)`` DataFrame — an
    exported hashed linear model head, see
    :func:`~.textstats.linear_classifier_scores`) gates on the integer
    logit ``>= classifier_threshold`` alongside the other content
    filters — the FineWeb-Edu-style model-based quality pass; the
    weight table is fixed-``classifier_dims`` so it broadcasts at any
    corpus size.

    ``host_quota`` caps the SURVIVOR set at N docs per ``url_col`` host
    (:func:`~.filters.host_quota`, salted two-phase top-N preferring
    longer text — text length is the deterministic quality proxy both
    engines agree on) — the RefinedWeb-style domain-dominance guard.
    Runs after dedup (a host's near-dup mass shouldn't consume its
    quota) and before sampling/mixing, so rates apply to the capped
    corpus.

    ``shuffle_seed`` appends a ``position`` column — the seeded
    deterministic global training order over the SURVIVORS
    (:func:`~.filters.deterministic_shuffle`, reproducible from the
    seed alone). Runs last so positions are dense over exactly what
    ships; write ordered via ``repartitionByRange("position")`` +
    ``sortWithinPartitions`` (the CLI's ``--shuffle-seed`` does)."""
    if respect_robots:
        from .filters import robots_directives

        # crawl politeness first — a page asking not to be indexed never
        # reaches any other gate; noindex ids are rare, broadcast back
        noidx = (
            robots_directives(docs, id_col=id_col, html_col=html_col)
            .where(F.col("noindex") == 1)
            .select(F.col("doc_id").alias(id_col))
        )
        docs = docs.join(F.broadcast(noidx), on=id_col, how="left_anti")
    if robots_txt is not None:
        from .filters import robots_txt_gate, robots_txt_rules

        gate = robots_txt_gate(
            docs, robots_txt_rules(robots_txt), url_col=url_col, id_col=id_col
        )
        # the allowed set is corpus-scale: plain semi-join, no broadcast
        docs = docs.join(
            gate.where(F.col("allowed")).select(F.col("doc_id").alias(id_col)),
            on=id_col,
            how="left_semi",
        )
    if blocklist is not None:
        from .filters import blocked_doc_ids

        bad = blocked_doc_ids(docs, blocklist, url_col=url_col, id_col=id_col)
        docs = docs.join(
            F.broadcast(bad.withColumnRenamed("doc_id", id_col)),
            on=id_col,
            how="left_anti",
        )
    if gopher:
        from .filters import gopher_filter

        # True = published thresholds; a dict = keyword overrides for
        # gopher_filter (e.g. {"min_words": 10})
        overrides = gopher if isinstance(gopher, dict) else {}
        docs = gopher_filter(docs, text_col=text_col, **overrides)
    if badwords is not None:
        from .filters import wordlist_density

        dens = wordlist_density(docs, badwords, id_col=id_col, text_col=text_col)
        bad_ids = dens.where(F.col("hit_ratio") > max_badword_ratio).select(
            F.col("doc_id").alias(id_col)
        )
        # flagged docs are the rare case: broadcast the small bad-id
        # set back as an anti-join (same shape as the blocklist gate)
        docs = docs.join(F.broadcast(bad_ids), on=id_col, how="left_anti")
    if lm_keep:
        from .textstats import lm_quality_buckets

        bad = set(lm_keep) - {"head", "middle", "tail"}
        if bad:
            raise ValueError(f"lm_keep buckets must be head/middle/tail, got {sorted(bad)}")
        # CCNet-style perplexity gate over the post-crawl-filter corpus
        # (cuts computed on survivors, as CCNet buckets its own crawl):
        # the kept-id side is a corpus-scale fraction, so this is a
        # plain semi-join on the id column, not a broadcast
        keep_ids = (
            lm_quality_buckets(
                docs, id_col=id_col, text_col=text_col, head=lm_head, tail=lm_tail
            )
            .where(F.col("bucket").isin(list(lm_keep)))
            .select(F.col("doc_id").alias(id_col))
        )
        docs = docs.join(keep_ids, on=id_col, how="left_semi")
    if classifier_weights is not None:
        from .textstats import linear_classifier_scores

        # model-based quality gate (the FineWeb-Edu pattern): runs with
        # the other content gates, before dedup pays for dropped mass;
        # kept ids are corpus-scale, so a plain semi-join
        scored = linear_classifier_scores(
            docs,
            classifier_weights,
            dims=classifier_dims,
            bias=classifier_bias,
            threshold=classifier_threshold,
            id_col=id_col,
            text_col=text_col,
        )
        keep_ids = scored.where(F.col("keep")).select(
            F.col("doc_id").alias(id_col)
        )
        docs = docs.join(keep_ids, on=id_col, how="left_semi")
    superseded = None
    if index_path is not None:
        out = curate_incremental(
            docs,
            index_path,
            id_col=id_col,
            text_col=text_col,
            min_quality=min_quality,
            shingle_k=shingle_k,
            num_hashes=num_hashes,
            bands=bands,
            max_bucket=max_bucket,
            canonical=canonical,
        )
        superseded = getattr(out, "_correctocr_superseded", None)
    else:
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
        )
        out = register_intermediates(
            docs.join(
                keep.withColumnRenamed("doc_id", id_col), on=id_col, how="left_semi"
            ),
            keep,
        )
    if host_quota:
        from .filters import host_quota as _hq

        capped = _hq(
            out.withColumn("_hq_q", F.length(F.col(text_col))),
            host_quota,
            url_col=url_col,
            id_col=id_col,
            quality_col="_hq_q",
        ).select(F.col("doc_id").alias(id_col))
        # survivors-per-host is quota-bounded, but the union across
        # hosts is corpus-scale: plain semi-join, not a broadcast
        out = register_intermediates(
            out.join(capped, on=id_col, how="left_semi"), out
        )
    if sample_rate is not None or sample_rates:
        if sample_rates and sample_rate is None:
            # an implicit base rate of 0 would silently DROP every doc
            # in a stratum not listed in sample_rates — make the caller
            # say what unlisted strata get
            raise ValueError(
                "sample_rates needs an explicit sample_rate as the base "
                "rate for strata not listed (use 1.0 to keep them)"
            )
        out = register_intermediates(
            deterministic_sample(
                out,
                rate=sample_rate,
                rates=sample_rates,
                stratify_col=stratify_col,
                key_col=id_col,
            ),
            out,
        )
    if mix:
        out = register_intermediates(
            mix_proportions(out, mix, group_col=mix_col, key_col=id_col), out
        )
    if shard_budget:
        # the curated survivor set is consumed 4+ times below (shard
        # bounds probe, bucket totals, the bucket-local window, the
        # final re-join) — without an eager persist the whole
        # quality+LSH+CC curation subtree re-executes per consumer
        out = out.persist()
        out.count()
        shards = pack_shards(
            out, budget=shard_budget, id_col=id_col, text_col=text_col
        ).withColumnRenamed("doc_id", id_col)
        # register_intermediates both inherits `out`'s registered list
        # and records `out` itself (now persisted)
        out = register_intermediates(out.join(shards, on=id_col), out)
    if shuffle_seed is not None:
        from .filters import deterministic_shuffle

        # the shuffle reads `out` three times (bucket counts collect,
        # the bucket-local window, the join back) — eagerly persist the
        # survivor set unless the shard packer already did
        lvl = out.storageLevel
        if not (lvl.useMemory or lvl.useDisk):
            out = out.persist()
            out.count()
        # positions are assigned over the final survivor set (dense over
        # exactly what ships); the id-keyed join back is doc-count-sized
        pos = deterministic_shuffle(
            out.select(F.col(id_col).alias("doc_id")), seed=shuffle_seed
        ).withColumnRenamed("doc_id", id_col)
        out = register_intermediates(out.join(pos, on=id_col), out)
    if superseded is not None:
        out._correctocr_superseded = superseded
    return out


def curate_incremental(
    docs: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    shingle_k: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    max_bucket: Optional[int] = None,
    update_index: bool = True,
    canonical: str = "min_id",
) -> DataFrame:
    """INCREMENTAL snapshot curation against a persistent
    :class:`~correctocr_spark.ops.dedup.MinHashIndex`: only the
    increment is shingled/banded (O(increment), never O(corpus)); its
    near-dup candidates come from the index's new-vs-new + new-vs-old
    joins. ``canonical`` selects the cross-snapshot rule:

    ``"min_id"`` — any increment doc whose cluster touches an ALREADY-
    INDEXED doc is dropped (the stored copy won — it was emitted by an
    earlier snapshot's run). Increment-only clusters keep their min-id
    canonical, exact dups within the increment keep theirs, and the
    quality gate is per-doc — so for monotonically increasing doc ids
    the union of per-snapshot outputs EQUALS a one-shot
    :func:`curated_doc_ids` over the union (pinned by the CLI
    two-snapshot test).

    ``"quality"`` — the HIGHEST-QUALITY member of each cluster wins
    (ties -> min id), across stored AND increment members: increment
    quality comes from :func:`quality_scores`, stored quality from the
    index's ``_q`` side-table (written on every ``add``; an index
    created before quality support raises here). Because an earlier
    snapshot may already have PUBLISHED a member that now loses, the
    result carries a retraction list: the returned frame's
    ``_correctocr_superseded`` attribute is a ``(doc_id)`` DataFrame of
    previously-emitted stored docs whose cluster was won by an
    increment doc — a downstream Iceberg MERGE deletes them, and
    ``union(per-snapshot outputs) - superseded == one-shot quality
    curation`` (pinned by test_curate_incremental_quality_equals_union).
    Election is over INCREMENT-VISIBLE members: stored docs sharing a
    band (or exact fingerprint) with the increment. A stored doc
    connected to the cluster only through old-old edges does not
    compete — when a new doc merges two stored clusters through a
    narrow bridge, the non-adjacent cluster's canonical stays published
    even if it would lose the merged election. That is the O(increment)
    trade; cluster members are mutually similar in practice, so merged
    clusters are increment-visible in the common case.

    Cross-snapshot EXACT dups the band joins can miss are caught via
    the index's (doc_id, fp) fingerprint side-table: docs with no words
    at all (no shingles, hence never banded) and exact dups inside a
    ``max_bucket``-capped hot bucket — as a drop-list in min_id mode
    (``exact_dup_ids``), as election edges in quality mode
    (``exact_dup_pairs``). "Old" always means a doc id NOT in this
    increment, so re-running an already-indexed snapshot is IDEMPOTENT
    (returns the same survivors) instead of every doc self-matching its
    own stored bands/fingerprint and being dropped. ``update_index``
    appends the increment's band + fingerprint + quality tables after
    computing candidates (all increment docs, survivors or not: the
    one-shot-union invariant needs every doc indexed).
    """
    from .dedup import MinHashIndex

    if canonical not in ("min_id", "quality"):
        raise ValueError(f"canonical must be 'min_id' or 'quality', got {canonical!r}")
    idx = MinHashIndex(
        docs.sparkSession,
        index_path,
        k=shingle_k,
        num_hashes=num_hashes,
        bands=bands,
        max_bucket=max_bucket,
    )
    pairs = idx.candidate_pairs(docs, id_col=id_col, text_col=text_col)
    old_ids = idx.indexed_ids()
    if old_ids is not None:
        # "old" = indexed ids NOT in this increment: on a re-run of an
        # already-indexed snapshot every doc's own id is in the index,
        # and without this exclusion each cluster would count as
        # touching stored content and the whole snapshot would be
        # silently dropped
        old_ids = old_ids.join(
            docs.select(F.col(id_col).alias("doc_id")), on="doc_id", how="left_anti"
        )

    # quality feeds the gate, the (quality-mode) election, and the _q
    # side-table write — one corpus scan, eagerly materialized
    q = quality_scores(docs, id_col=id_col, text_col=text_col).select(
        "doc_id", "quality_score"
    )
    q = q.persist()
    q.count()
    quality_ok = q.where(F.col("quality_score") >= min_quality).select("doc_id")
    # min-id per content hash as an AGGREGATION instead of a window:
    # the groupBy partial-aggregates map-side and never sorts, where
    # the window shuffled every (id, hash) row and sorted each hash
    # partition; the surviving id set — and hence the semi-join below —
    # is identical (min over the same groups).
    exact_canonical = (
        docs.groupBy(F.md5(F.col(text_col)).alias("_h"))
        .agg(F.min(id_col).alias("doc_id"))
        .select("doc_id")
    )

    superseded = None
    if canonical == "quality":
        # fp-only exact dups (wordless / capped-bucket) join the edge
        # set so they compete under the same election as band matches
        ex_pairs = idx.exact_dup_pairs(docs, id_col=id_col, text_col=text_col)
        all_pairs = (
            pairs.unionByName(ex_pairs) if ex_pairs is not None else pairs
        )
        cc = connected_components(all_pairs)
        idx.release()
        inc_ids = docs.select(F.col(id_col).alias("doc_id"))
        m_new = (
            cc.join(inc_ids, on="doc_id", how="left_semi")
            .join(q, on="doc_id")
            .select(
                "doc_id",
                "component",
                "quality_score",
                F.lit(False).alias("_old"),
                F.lit(False).alias("emitted"),
            )
        )
        if old_ids is not None:
            stored_q = idx._existing_q()
            if stored_q is None:
                raise ValueError(
                    f"MinHashIndex at {index_path} has no quality "
                    "side-table (_q): it was built without quality "
                    "support, so stored cluster members cannot compete "
                    "in a quality election — rebuild the index or use "
                    "canonical='min_id'"
                )
            # left join: a stored doc indexed by a pre-quality add has
            # no score row — NULL sorts last (it can never win, and
            # never counts as emitted), loud-failure-free degradation
            m_old = (
                cc.join(old_ids, on="doc_id", how="left_semi")
                .join(stored_q, on="doc_id", how="left")
                .select(
                    "doc_id",
                    "component",
                    "quality_score",
                    F.lit(True).alias("_old"),
                    F.coalesce(F.col("emitted"), F.lit(False)).alias("emitted"),
                )
            )
            members = m_new.unionByName(m_old)
        else:
            members = m_new
        ew = Window.partitionBy("component").orderBy(
            F.desc_nulls_last("quality_score"), F.asc("doc_id")
        )
        ranked = members.withColumn("_r", F.row_number().over(ew))
        # increment members that lost their cluster's election
        nd_losers = ranked.where(
            (F.col("_r") != 1) & (~F.col("_old"))
        ).select("doc_id")
        # previously-PUBLISHED stored members that lost: the retraction
        # list a downstream MERGE applies
        superseded = ranked.where(
            (F.col("_r") != 1) & F.col("_old") & F.col("emitted")
        ).select("doc_id")
        keep = (
            docs.select(F.col(id_col).alias("doc_id"))
            .join(quality_ok, on="doc_id", how="left_semi")
            .join(exact_canonical, on="doc_id", how="left_semi")
            .join(nd_losers, on="doc_id", how="left_anti")
        )
    else:
        # exact-dup fingerprints close the band joins' residual holes
        # (wordless docs, capped hot buckets); self-matches excluded
        exact_vs_old = idx.exact_dup_ids(docs, id_col=id_col, text_col=text_col)
        cc = connected_components(pairs)
        # connected_components checkpoints its labels eagerly, and
        # `pairs` has no other consumer — the index's cached band/bucket
        # tables are dead weight from here on, in BOTH update_index modes
        idx.release()
        if old_ids is not None:
            # components containing ANY already-indexed doc: every
            # increment member of such a cluster is a near-dup of
            # stored content
            stale = (
                cc.join(
                    old_ids.withColumnRenamed("doc_id", "_old"),
                    on=cc["doc_id"] == F.col("_old"),
                    how="inner",
                )
                .select("component")
                .distinct()
            )
            losers_vs_old = cc.join(stale, on="component", how="left_semi").select(
                "doc_id"
            )
        else:
            losers_vs_old = None
        losers_in_new = cc.where(F.col("doc_id") != F.col("component")).select(
            "doc_id"
        )
        keep = (
            docs.select(F.col(id_col).alias("doc_id"))
            .join(quality_ok, on="doc_id", how="left_semi")
            .join(exact_canonical, on="doc_id", how="left_semi")
            .join(losers_in_new, on="doc_id", how="left_anti")
        )
        if losers_vs_old is not None:
            keep = keep.join(losers_vs_old, on="doc_id", how="left_anti")
        if exact_vs_old is not None:
            keep = keep.join(exact_vs_old, on="doc_id", how="left_anti")

    out = docs.join(
        keep.withColumnRenamed("doc_id", id_col), on=id_col, how="left_semi"
    )
    if update_index:
        # the candidate pairs (and hence `out`/`superseded`) must
        # reflect the PRE-increment index, but appending to the path
        # triggers Spark's recache-by-path, which silently RE-EXECUTES
        # a merely-persisted plan against the post-append index
        # (observed: increment docs self-matching as "old" and being
        # dropped). Eager localCheckpoints rewrite both plans to
        # RDD-backed relations with no path reference BEFORE the
        # append. (Local checkpoints are not fault-tolerant; a cluster
        # job that must survive executor loss writes them to real
        # tables before calling add().)
        out = out.localCheckpoint(eager=True)
        if superseded is not None:
            superseded = superseded.localCheckpoint(eager=True)
        # every add records the increment's quality + whether each doc
        # was published — the state quality-mode election reads later
        # (derived from the CHECKPOINTED survivors, so the plan cannot
        # touch the index path)
        emitted_q = q.join(
            out.select(F.col(id_col).alias("doc_id"), F.lit(True).alias("_e")),
            on="doc_id",
            how="left",
        ).select(
            "doc_id",
            "quality_score",
            F.coalesce(F.col("_e"), F.lit(False)).alias("emitted"),
        )
        idx.add(docs, id_col=id_col, text_col=text_col, quality=emitted_q)
        # everything derived from q is materialized now
        q.unpersist()
    if superseded is not None:
        out._correctocr_superseded = superseded
    return out
