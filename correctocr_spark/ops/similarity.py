"""Similarity search over an embedding column (``array<float>``).

Brute-force cosine top-k is the exact baseline; the scale path buckets
vectors by random-hyperplane signs (LSH) so each query only scans its
bucket. All arithmetic stays JVM-side (``zip_with`` + ``aggregate``
higher-order functions) — no Python in the hot path.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import ensure_parallelism, normalized_words


def _lit_vec(vec: Sequence[float]) -> Column:
    # ONE parsed expression instead of a py4j round trip per element:
    # repr() round-trips doubles exactly, and the decimal literal CAST
    # to DOUBLE rounds to the nearest double — i.e. the same value
    # F.lit(float(v)) produced. A 64-dim literal vector used to cost 65
    # driver round trips; query constructors embed dozens of these.
    return F.expr(
        "array(" + ",".join(f"CAST({float(v)!r} AS DOUBLE)" for v in vec) + ")"
    )


def _ranked_topk(scored: DataFrame, k: int) -> DataFrame:
    """Distributed top-k with a dense rank column, no global window.

    ``orderBy().limit(k)`` compiles to ``TakeOrderedAndProject`` — each
    partition keeps its local k, the driver merges k*num_partitions rows
    (pinned by test_ann_plan_take_ordered). The rank is then derived by
    sorting the k survivors *as an array* (struct sort: -cosine, vec_id)
    and ``posexplode``-ing — never a partitionless ``row_number()``
    window, which would move the whole table to one partition.
    """
    top = scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)
    arr = top.agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    (-F.col("cosine")).alias("neg_cosine"),
                    F.col("vec_id").alias("vec_id"),
                    F.col("cosine").alias("cosine"),
                )
            )
        ).alias("a")
    )
    return (
        arr.select(F.posexplode("a").alias("pos", "s"))
        .select(
            (F.col("pos") + 1).cast("int").alias("rank"),
            F.col("s.vec_id").alias("vec_id"),
            F.col("s.cosine").alias("cosine"),
        )
    )


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def brute_force_topk(
    embeddings: DataFrame,
    query: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine; deterministic ordering (score desc, id)."""
    q = _lit_vec(query)
    scored = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.round(cosine_col(F.col(vec_col).cast("array<double>"), q), 6).alias("cosine"),
    )
    return _ranked_topk(scored, k)


def random_planes(dim: int, n_planes: int = 8, seed: int = 7) -> List[List[float]]:
    """Deterministic hyperplanes (literal-embeddable in SQL oracles)."""
    rng = np.random.RandomState(seed)
    return [[round(float(x), 6) for x in rng.randn(dim)] for _ in range(n_planes)]


def hyperplane_bucket(vec_col: Column, planes: List[List[float]]) -> Column:
    """Sign-pattern bucket id: bit p set iff dot(vec, plane_p) > 0."""
    bucket = F.lit(0)
    for p, plane in enumerate(planes):
        bit = F.when(dot_col(vec_col, _lit_vec(plane)) > 0, F.lit(2**p)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket.cast("int")


def lsh_topk(
    embeddings: DataFrame,
    query: Sequence[float],
    planes: List[List[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only the query's hyperplane bucket.

    At 100 TB the bucket column is precomputed and the table is
    partitioned/bucketed by it, so a query reads one partition instead
    of the full corpus; recall is tuned by n_planes (and multi-probe).
    """
    vec_d = F.col(vec_col).cast("array<double>")
    qvec = [float(v) for v in query]
    q_bucket = 0
    for p, plane in enumerate(planes):
        if float(np.dot(qvec, plane)) > 0:
            q_bucket += 2**p
    q = _lit_vec(qvec)
    scored = (
        embeddings.withColumn("bucket", hyperplane_bucket(vec_d, planes))
        .where(F.col("bucket") == q_bucket)
        .select(
            F.col(id_col).alias("vec_id"),
            F.round(cosine_col(vec_d, q), 6).alias("cosine"),
        )
    )
    return _ranked_topk(scored, k)


def sq_dists_col(vec_d: Column, centroids: List[List[float]]) -> Column:
    """Array of squared L2 distances to each centroid — every distance
    evaluated exactly once (the building block nearest_centroid_col and
    cluster_quality share)."""
    return F.array(
        *[
            F.aggregate(
                F.zip_with(vec_d, _lit_vec(c), lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for c in centroids
        ]
    )


def argmin_col(dists: Column) -> Column:
    """First index of the minimum of a double array — strict `<` keeps
    the earlier entry on ties (the module's argmin contract):
    ``array_position`` returns the FIRST element equal to the array
    minimum, which is exactly the earliest strict-< winner. Two linear
    scans of the array per row."""
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def nearest_centroid_col(vec_d: Column, centroids: List[List[float]]) -> Column:
    """Argmin-centroid (squared L2) as one column expression; strict `<`
    keeps the earlier centroid on ties.

    Built as one distance ARRAY folded once: the former chained-when
    form nested every distance inside all later comparisons, so the
    interpreted zip_with/aggregate per centroid was evaluated ~2^k
    times per row instead of once (guide §1.2 — per-task work)."""
    return argmin_col(sq_dists_col(vec_d, centroids))


def ivf_assign(
    embeddings: DataFrame,
    centroids: List[List[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization: nearest centroid per vector (squared L2),
    computed as one column expression — the partition key for an IVF
    index layout."""
    vec_d = F.col(vec_col).cast("array<double>")
    return embeddings.select(
        F.col(id_col).alias("vec_id"),
        nearest_centroid_col(vec_d, centroids).alias("centroid_id"),
    )


def ivf_search(
    embeddings: DataFrame,
    centroids: List[List[float]],
    query: Sequence[float],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: score only the ``nprobe`` inverted lists
    nearest the query.

    The probe set is chosen on the DRIVER from the centroid table (C
    rows — always tiny; ties break to the lower centroid id), then the
    corpus is filtered to vectors whose argmin centroid is in the probe
    set and cosine-ranked with the same TakeOrderedAndProject shape as
    :func:`brute_force_topk`. At 100 TB the assignment is precomputed
    and the table partitioned by ``centroid_id``, so the IN-filter
    becomes partition pruning and a query reads ``nprobe`` partitions
    instead of the corpus; recall is tuned by ``nprobe``. Completes the
    IVF path started by :func:`ivf_assign` (which this composes).
    """
    qvec = [float(v) for v in query]
    dists = [
        (float(np.sum((np.asarray(qvec) - np.asarray(c)) ** 2)), cid)
        for cid, c in enumerate(centroids)
    ]
    probe = sorted(cid for _, cid in sorted(dists)[: max(1, nprobe)])
    vec_d = F.col(vec_col).cast("array<double>")
    scored = (
        embeddings.withColumn("_cid", nearest_centroid_col(vec_d, centroids))
        .where(F.col("_cid").isin(probe))
        .select(
            F.col(id_col).alias("vec_id"),
            F.round(cosine_col(vec_d, _lit_vec(qvec)), 6).alias("cosine"),
        )
    )
    return _ranked_topk(scored, k)


def quantize_embeddings(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector symmetric int8 quantization — the 4× storage/IO move
    an ANN index makes before a 10¹²-vector corpus fits anywhere:
    ``scale = max|xᵢ| / 127`` per vector, ``qᵢ = round(xᵢ / scale)``
    ∈ [−127, 127] (an all-zero vector quantizes to zeros with scale 0).
    Returns ``(id, qvec array<int>, scale, max_abs_err)`` where
    ``max_abs_err`` is the per-vector worst dequantization error
    ``max|qᵢ·scale − xᵢ|`` — the audit column a recall-regression gate
    thresholds on. Doubles round to 9 decimals so the hash oracle is
    exact.

    Scale shape: entirely row-local HOF column algebra (aggregate /
    transform / zip-free) — scan speed, no shuffle, no UDF; compose
    with the IVF/LSH index builders downstream.
    """
    v = F.col(vec_col)
    ma = F.aggregate(
        v,
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
    )
    scale = ma / F.lit(127.0)
    q = F.when(
        ma > 0,
        F.transform(v, lambda x: F.round(x.cast("double") / scale).cast("int")),
    ).otherwise(F.transform(v, lambda x: F.lit(0)))
    d = emb.select(
        F.col(id_col).alias("id"),
        v.alias("_v"),
        ma.alias("_ma"),
        scale.alias("_scale"),
        q.alias("qvec"),
    )
    err = F.aggregate(
        F.zip_with(
            F.col("qvec"),
            F.col("_v"),
            lambda qi, xi: F.abs(
                qi.cast("double") * F.col("_scale") - xi.cast("double")
            ),
        ),
        F.lit(0.0),
        lambda acc, e: F.greatest(acc, e),
    )
    return d.select(
        "id",
        "qvec",
        F.round("_scale", 9).alias("scale"),
        F.round(err, 9).alias("max_abs_err"),
    )


def quantized_topk(
    emb: DataFrame,
    query_id,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k by approximate dot product over the int8-quantized store —
    the scoring path an at-scale ANN actually serves from (4× less scan
    IO; int8 dots SIMD-vectorize on real hardware): the query is row
    ``query_id`` of the SAME quantized table, so quantization happens
    entirely engine-side (no driver-side rounding to drift between
    engines). ``score = scale_d · scale_q · Σ qdᵢ·qqᵢ`` — the Σ is
    EXACT integer arithmetic, so only one double product rounds (to 6
    decimals). Returns ``(rank, vec_id, score)`` with the
    :func:`brute_force_topk` deterministic ordering (score desc, id).

    Scale shape: quantize is row-local (see :func:`quantize_embeddings`),
    the 1-row query broadcasts, scoring is a scan-speed projection, and
    top-k compiles to TakeOrderedAndProject — no global window, no
    shuffle beyond the k-row merge.
    """
    qd = quantize_embeddings(emb, id_col=id_col, vec_col=vec_col)
    qrow = qd.where(F.col("id") == query_id).select(
        F.col("qvec").alias("_qq"), F.col("scale").alias("_qs")
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("qvec"), F.col("_qq"), lambda a, b: (a * b).cast("long")
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = qd.crossJoin(F.broadcast(qrow)).select(
        F.col("id").alias("vec_id"),
        F.round(
            F.col("scale") * F.col("_qs") * dot.cast("double"), 6
        ).alias("cosine"),
    )
    out = _ranked_topk(scored, k)
    return out.select("rank", "vec_id", F.col("cosine").alias("score"))


def kmeans_step_stats(
    emb: DataFrame,
    centroids: List[List[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """One distributed Lloyd iteration's SUFFICIENT STATISTICS — how the
    IVF coarse quantizer (:func:`ivf_assign` / :func:`ivf_search`) gets
    its centroids trained on the corpus instead of guessed: assign every
    vector to its nearest centroid (same strict-``<`` argmin as
    ``ivf_assign``), then per ``(centroid, dimension)`` accumulate the
    member count and the sum of MICRO-QUANTIZED components
    (``round(x * scale)`` as int64). Integer sums are
    reduction-order-independent, so the result is exact across
    partitionings, retries and engines (the same quantization move as
    ``unigram_lm_scores``) — a float mean would hash-drift with shuffle
    order. The division happens once, on the driver, in
    :func:`kmeans_new_centroids`.

    Returns ``(centroid_id, dim, n, sum_q)`` — K x D rows. Scale
    shape: the argmin is one codegen'd column expression (no join
    against a centroid table — K is small by construction), the explode
    is ``posexplode`` (linear), and the aggregation map-side-combines
    to K x D partials per partition before one tiny shuffle.
    """
    vec_d = F.col(vec_col).cast("array<double>")
    assigned = ensure_parallelism(emb).select(
        nearest_centroid_col(vec_d, centroids).alias("centroid_id"),
        F.posexplode(vec_d).alias("_pos", "_val"),
    )
    return assigned.groupBy(
        "centroid_id", (F.col("_pos") + 1).cast("int").alias("dim")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("_val") * int(scale)).cast("long")).alias("sum_q"),
    )


def kmeans_new_centroids(
    stats: DataFrame,
    centroids: List[List[float]],
    scale: int = 1_000_000,
) -> List[List[float]]:
    """Fold Lloyd sufficient statistics into the next centroid list:
    ``mean_d = (sum_q / n) / scale`` per dimension; a centroid that
    captured NO vectors keeps its previous position (the standard empty-
    cluster rule — no reseeding randomness, so training is
    deterministic). The collect is K x D rows — bounded and tiny, the
    same driver-side-model pattern as HMM training."""
    rows = stats.collect()
    by_c: dict = {}
    for r in rows:
        by_c.setdefault(int(r["centroid_id"]), {})[int(r["dim"])] = (
            int(r["sum_q"]),
            int(r["n"]),
        )
    out: List[List[float]] = []
    for cid, prev in enumerate(centroids):
        dims = by_c.get(cid)
        if not dims:
            out.append([float(v) for v in prev])
            continue
        out.append(
            [
                dims[d + 1][0] / dims[d + 1][1] / float(scale)
                for d in range(len(prev))
            ]
        )
    return out


def kmeans_train(
    emb: DataFrame,
    init_centroids: List[List[float]],
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> List[List[float]]:
    """Distributed k-means for IVF centroid training: ``iters`` Lloyd
    iterations of :func:`kmeans_step_stats` + :func:`kmeans_new_centroids`.
    Each iteration is one pass over the corpus (scan -> argmin ->
    map-side-combined K x D aggregation) with only K x D rows ever on
    the driver; at 10^12 vectors you run it on a deterministic sample
    first and refine on the full corpus last — both are this function.
    Deterministic end-to-end: integer-quantized accumulation, strict-<
    argmin ties, empty clusters hold position."""
    cents = [[float(v) for v in c] for c in init_centroids]
    for _ in range(max(0, int(iters))):
        cents = kmeans_new_centroids(
            kmeans_step_stats(
                emb, cents, id_col=id_col, vec_col=vec_col, scale=scale
            ),
            cents,
            scale=scale,
        )
    return cents


def bm25_topk(
    docs: DataFrame,
    query_terms: DataFrame,
    k: int = 10,
    k1_milli: int = 1200,
    b_milli: int = 750,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 lexical retrieval — the search-serving twin of the
    ANN paths: score every document against a small set of keyword
    queries and keep the top-``k`` per query. This is the read side of
    the inverted index (``spark/sources.py term_index``, ref
    commands.py index building): a crawl-scale corpus answers "which
    pages best match these terms" with corpus-trained IDF weights, no
    embeddings required.

    ``query_terms`` is a ``(query_id, term)`` table (one row per term;
    duplicate terms in one query are deduplicated — standard bag-of-
    words query semantics score each distinct term once with its
    document TF). ``k1``/``b`` arrive as EXACT MILLI-INTEGERS so both
    engines derive bit-identical doubles (``1200/1000.0``), never a
    decimal literal that parses differently.

    Determinism (the hash-oracle contract): each (query, term, doc)
    contribution ``idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))``
    is computed row-local in one fixed expression order and quantized
    ONCE to integer micro-units (round * 1e6, the unigram-LM trick);
    the per-(query, doc) aggregation sums integers, so shuffle
    reduction order cannot move a final ulp. ``dl/avgdl`` is computed
    as ``(dl * n_docs) / total_dl`` — two exact integers divided once.
    IDF is the Robertson-Sparck-Jones form ``ln(1 + (N - df + 0.5) /
    (df + 0.5))``, always positive.

    Scale shape: the query table is broadcast (queries are human-sized;
    the corpus is not) and the corpus explode is SEMI-filtered by it
    before any aggregation, so TF work is proportional to matched
    postings only. Document length is ROW-LOCAL (``size(words)`` at
    scan speed — never an explode + re-aggregate shuffle; ``N`` counts
    every document in the collection, wordless ones at dl 0) and RIDES
    THE EXPLODE: each matched posting carries its doc's dl into the TF
    aggregation (constant within the group, folded with ``max``), so
    scoring never joins a corpus-sized dl table — the v1 shape shuffled
    the full per-doc dl relation to serve the handful of matched docs,
    and the retrieval probe blamed exactly that join for BM25's 0.55
    matched-pair scaling at 500k docs. The (N, total_dl) totals are a
    separate map-side-combined row-local pass (no persist, no eager
    barrier — nothing corpus-sized is materialized at all). Final top-k
    is a per-query rank window — Spark compiles the ``rank <= k``
    filter to WindowGroupLimit (per-partition partial top-k before the
    shuffle), so no query ever gathers the whole corpus.

    Returns ``(query_id, doc_id, n_terms, score_micro, rank)`` with
    rank ties broken by ascending doc_id.
    """
    nw = normalized_words(text_col)
    # the word ARRAY materializes in its own projection and the explode
    # consumes the column: putting size(nw) and explode(nw) in ONE
    # projection makes Spark re-evaluate the interpreted HOF filter per
    # EXPLODED row (O(len²) per doc — measured 13.4 s vs 1.2 s on the
    # same 25k-doc input), and the Generate pipeline also codegens
    # better off a materialized array column.
    words = (
        docs
        .select(F.col(id_col).alias("doc_id"), nw.alias("_ws"))
        .select(
            "doc_id",
            F.size("_ws").cast("long").alias("dl"),
            F.explode("_ws").alias("w"),
        )
    )
    terms = query_terms.select("query_id", "term").distinct()
    totals = (
        docs
        .select(F.size(nw).cast("long").alias("dl"))
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_dl"))
    )
    tf = (
        words.join(F.broadcast(terms), words["w"] == terms["term"])
        .groupBy("query_id", "term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl"))
        .persist()
    )
    tf.count()
    df_t = tf.groupBy("query_id", "term").agg(F.count(F.lit(1)).alias("df"))
    k1 = F.lit(int(k1_milli)) / F.lit(1000.0)
    b = F.lit(int(b_milli)) / F.lit(1000.0)
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + k1 * (
        F.lit(1.0) - b + b * (F.col("dl") * F.col("n_docs") / F.col("total_dl"))
    )
    contrib = (
        tf.join(df_t, ["query_id", "term"])
        .crossJoin(F.broadcast(totals))
        .select(
            "query_id",
            "doc_id",
            F.round(idf * F.col("tf") * (k1 + F.lit(1.0)) / denom * F.lit(1_000_000.0))
            .cast("long")
            .alias("c_micro"),
        )
    )
    scored = contrib.groupBy("query_id", "doc_id").agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum("c_micro").alias("score_micro"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_micro"), F.asc("doc_id")
    )
    from .cache import register_intermediates

    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
        .select("query_id", "doc_id", "n_terms", "score_micro", "rank")
    )
    return register_intermediates(out, tf)


def semdedup(
    embeddings: DataFrame,
    centroids: List[List[float]],
    eps: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep: str = "far",
    max_cluster: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): SEMANTIC
    deduplication scoped to k-means clusters — the embedding-space
    complement of MinHash/SimHash (which only see lexical overlap).
    Every vector is assigned to its nearest centroid (squared-L2
    argmin, earliest centroid on ties — the ``ivf_assign`` rule);
    within each cluster, members are ordered by keep-priority —
    cosine-to-own-centroid ASCENDING for ``keep="far"`` (the paper's
    default: retain the example FARTHEST from the centroid) or
    DESCENDING for ``keep="close"``, ties broken by id — and a vector
    is REMOVED iff some higher-priority member of its cluster has
    cosine > ``eps`` with it. That is exactly the reference
    implementation's sort + ``triu(M)`` max-over-previous rule,
    re-expressed as a cluster-keyed pair join so no per-cluster
    similarity matrix ever materializes.

    Returns ``(vec_id, centroid_id, centroid_cos, kept)`` for EVERY
    input vector (``centroid_cos`` rounded to 6 — the priority key,
    quantized identically on both engines).

    Scale shape: one argmin projection at scan speed, persisted ONCE
    for the self-join's two sides (norms precomputed per row, so each
    candidate pair costs one dot product, not three folds); the only
    pairwise work is the within-cluster equi-join, bounded by cluster
    size — the scale lever is k (more centroids → smaller clusters),
    exactly the paper's regime (50k clusters over LAION). Pass
    ``max_cluster`` to RAISE loudly when a cluster exceeds the bound
    you sized executors for, instead of silently exploding the join.
    """
    if keep not in ("far", "close"):
        raise ValueError(f"keep must be 'far' or 'close', got {keep!r}")
    if not centroids:
        raise ValueError("semdedup requires a non-empty centroid list")
    vec_d = F.col(vec_col).cast("array<double>")
    cents = F.array(*[_lit_vec(c) for c in centroids])
    assigned = (
        ensure_parallelism(embeddings)
        .select(
            F.col(id_col).alias("vec_id"),
            vec_d.alias("_v"),
            nearest_centroid_col(vec_d, centroids).alias("centroid_id"),
        )
        .withColumn(
            "centroid_cos",
            F.round(
                cosine_col(F.col("_v"), F.element_at(cents, F.col("centroid_id") + 1)), 6
            ),
        )
        .withColumn("_n", norm_col(F.col("_v")))
    )
    # one computation feeding the pair join's two sides AND the output
    assigned = assigned.persist()
    assigned.count()
    if max_cluster is not None:
        top = (
            assigned.groupBy("centroid_id")
            .agg(F.count(F.lit(1)).alias("_c"))
            .agg(F.max("_c"))
            .first()[0]
        )
        if top is not None and top > max_cluster:
            raise ValueError(
                f"semdedup: largest cluster has {top} members > "
                f"max_cluster={max_cluster}; raise k (more centroids) "
                "or the bound"
            )
    a = assigned.select(
        "centroid_id",
        F.col("vec_id").alias("_ia"),
        F.col("_v").alias("_va"),
        F.col("centroid_cos").alias("_ca"),
        F.col("_n").alias("_na"),
    )
    b = assigned.select(
        "centroid_id",
        F.col("vec_id").alias("_ib"),
        F.col("_v").alias("_vb"),
        F.col("centroid_cos").alias("_cb"),
        F.col("_n").alias("_nb"),
    )
    if keep == "far":
        beats = (F.col("_ca") < F.col("_cb")) | (
            (F.col("_ca") == F.col("_cb")) & (F.col("_ia") < F.col("_ib"))
        )
    else:
        beats = (F.col("_ca") > F.col("_cb")) | (
            (F.col("_ca") == F.col("_cb")) & (F.col("_ia") < F.col("_ib"))
        )
    pair_cos = dot_col(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))
    removed = (
        a.join(b, on="centroid_id")
        .where(beats & (pair_cos > F.lit(float(eps))))
        .select(F.col("_ib").alias("vec_id"))
        .distinct()
    )
    out = (
        assigned.join(removed.withColumn("_dup", F.lit(True)), on="vec_id", how="left")
        .select(
            "vec_id",
            "centroid_id",
            "centroid_cos",
            F.col("_dup").isNull().alias("kept"),
        )
    )
    from .cache import register_intermediates

    return register_intermediates(out, assigned)


def margin_mine(
    src: DataFrame,
    tgt: DataFrame,
    k: int = 4,
    min_margin_milli: int = 1050,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: List[List[float]] | None = None,
    mutual: bool = True,
) -> DataFrame:
    """Bitext mining by RATIO MARGIN (Artetxe & Schwenk 2019,
    arXiv:1811.01136 — the CCMatrix/WikiMatrix miner): score every
    (src, tgt) candidate by ``cos(x,y)`` divided by the mean of the two
    sides' k-nearest-neighbor cosines — absolute cosine thresholds
    can't separate parallel pairs from dense-region neighbors (hubness);
    the margin normalizes by how crowded each vector's neighborhood is.
    A pair is MINED when its margin clears ``min_margin_milli`` and
    (``mutual=True``, the paper's intersection rule) each side is the
    other's best candidate by margin.

    Determinism (the hash-oracle contract): cosines are quantized ONCE
    to integer micro-units; kNN selection orders by (cos_micro DESC,
    id) — integer keys, engine-stable; denominators are integer sums of
    ≤k quantized cosines (reduction-order-proof); the margin is one
    integer expression ``(c·2·k_s·k_t·10⁶) div (den_s·k_t + den_t·k_s)``
    evaluated only where both the cosine and the denominator are
    positive (a non-positive cosine is never parallel text, and the
    restriction keeps integer division out of the floor-vs-truncate
    divergence zone between engines).

    Scale shape: with ``planes`` the candidate space is a hyperplane-
    LSH bucket equi-join (the ``embedding_dup_pairs_bucketed``
    discipline — kNN denominators then run over the same candidate set,
    the standard FAISS-approximate regime of the paper); without, a
    labeled small-n cross join — the exact oracle twin only. Pairs are
    persisted ONCE for their three consumers (fwd denom, bwd denom,
    scoring); norms are precomputed per vector so each candidate costs
    one dot product.

    Returns ``(src_id, tgt_id, cos_micro, margin_micro)``.
    """
    from pyspark.sql import Window

    from .cache import register_intermediates

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if min_margin_milli <= 0:
        raise ValueError(f"min_margin_milli must be positive, got {min_margin_milli}")
    vec_d = F.col(vec_col).cast("array<double>")
    s = ensure_parallelism(src).select(
        F.col(id_col).alias("src_id"),
        vec_d.alias("_sv"),
        norm_col(vec_d).alias("_sn"),
        *([hyperplane_bucket(vec_d, planes).alias("_bkt")] if planes else []),
    )
    t = ensure_parallelism(tgt).select(
        F.col(id_col).alias("tgt_id"),
        vec_d.alias("_tv"),
        norm_col(vec_d).alias("_tn"),
        *([hyperplane_bucket(vec_d, planes).alias("_bkt")] if planes else []),
    )
    joined = s.join(t, on="_bkt") if planes else s.crossJoin(t)
    pairs = joined.select(
        "src_id",
        "tgt_id",
        F.round(
            dot_col(F.col("_sv"), F.col("_tv")) / (F.col("_sn") * F.col("_tn"))
            * F.lit(1_000_000.0)
        )
        .cast("long")
        .alias("cos_micro"),
    )
    # one computation, three consumers
    pairs = pairs.persist()
    pairs.count()
    w_fwd = Window.partitionBy("src_id").orderBy(
        F.col("cos_micro").desc(), F.col("tgt_id").asc()
    )
    w_bwd = Window.partitionBy("tgt_id").orderBy(
        F.col("cos_micro").desc(), F.col("src_id").asc()
    )
    den_s = (
        pairs.withColumn("_rn", F.row_number().over(w_fwd))
        .where(F.col("_rn") <= k)
        .groupBy("src_id")
        .agg(F.sum("cos_micro").alias("_den_s"), F.count(F.lit(1)).alias("_k_s"))
    )
    den_t = (
        pairs.withColumn("_rn", F.row_number().over(w_bwd))
        .where(F.col("_rn") <= k)
        .groupBy("tgt_id")
        .agg(F.sum("cos_micro").alias("_den_t"), F.count(F.lit(1)).alias("_k_t"))
    )
    scored = (
        pairs.join(den_s, on="src_id")
        .join(den_t, on="tgt_id")
        .withColumn("_D", F.col("_den_s") * F.col("_k_t") + F.col("_den_t") * F.col("_k_s"))
        .where((F.col("cos_micro") > 0) & (F.col("_D") > 0))
        .withColumn(
            "margin_micro",
            F.expr("(cos_micro * 2 * _k_s * _k_t * 1000000) div _D").cast("long"),
        )
    )
    if mutual:
        m_fwd = Window.partitionBy("src_id").orderBy(
            F.col("margin_micro").desc(), F.col("tgt_id").asc()
        )
        m_bwd = Window.partitionBy("tgt_id").orderBy(
            F.col("margin_micro").desc(), F.col("src_id").asc()
        )
        scored = (
            scored.withColumn("_rf", F.row_number().over(m_fwd))
            .withColumn("_rb", F.row_number().over(m_bwd))
            .where((F.col("_rf") == 1) & (F.col("_rb") == 1))
        )
    out = scored.where(
        F.col("margin_micro") >= F.lit(int(min_margin_milli) * 1000)
    ).select("src_id", "tgt_id", "cos_micro", "margin_micro")
    return register_intermediates(out, pairs)


def embedding_outliers(
    embeddings: DataFrame,
    centroids: List[List[float]],
    z_milli_threshold: int = 2000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-cluster embedding outlier detection: assign each vector to
    its nearest centroid (the IVF argmin), quantize the squared-L2
    residual ONCE to integer micro units, and flag members whose
    z-score against their own cluster's residual distribution exceeds
    the threshold — the "weird vectors in an otherwise tight cluster"
    curation signal (mislabeled docs, embedding-model failures,
    adversarial content).

    All moments are exact integers over the micro-quantized residuals:
    ``mean = floor(Σd / n)``, ``var = floor((n·Σd² − (Σd)²) / n²)``,
    ``std = floor(sqrt(var))``, ``z_milli = (d − mean)·1000 div
    max(std, 1)``. The second moment is summed in DECIMAL(38,0) —
    Spark's int64 sum would overflow (and its decimal ``div`` silently
    WRAPS to long, so the divisions use ``floor(a / b)``, equal to
    truncation because every numerator here is non-negative; the z
    division stays bigint ``div``, both engines truncating toward
    zero, verified). The DuckDB twin's HUGEINT ``//`` matches by the
    same non-negativity. sqrt enters through a double cast — exact
    below 2^53 (any normalized-embedding cluster); above it both
    engines round-to-nearest the same way. One scan computes
    assignments + residuals; one dimension-small agg per centroid
    broadcasts back. No per-row Python, no float crosses a row
    boundary.

    Output: (vec_id, centroid_id, d_micro, z_milli), outliers only.
    """
    vec_d = F.col(vec_col).cast("array<double>")
    cid = nearest_centroid_col(vec_d, centroids)
    # residual = squared L2 to the ASSIGNED centroid — recompute via
    # min over the same literal distances (strict-< argmin twin)
    dists = [
        F.aggregate(
            F.zip_with(vec_d, _lit_vec(c), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        for c in centroids
    ]
    d2 = F.least(*dists) if len(dists) > 1 else dists[0]
    assigned = embeddings.select(
        F.col(id_col).alias("vec_id"),
        cid.alias("centroid_id"),
        F.round(d2 * 1e6).cast("long").alias("d_micro"),
    )
    dec = F.col("d_micro").cast("decimal(38,0)")
    stats = assigned.groupBy("centroid_id").agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum(dec).alias("_s"),
        F.sum(dec * dec).alias("_s2"),
    )
    joined = assigned.join(F.broadcast(stats), on="centroid_id")
    # Exact integer division on decimals: (a - a % b) / b — Spark's
    # plain decimal '/' rounds at a fixed scale and its 'div' wraps to
    # long, but an exactly-divisible quotient is representable, so this
    # is exact; equals DuckDB's HUGEINT '//' for the non-negative
    # numerators here.
    mean = "CAST((_s - _s % _n) / _n AS BIGINT)"
    var_num = "(_n * _s2 - _s * _s)"
    var_den = "(CAST(_n AS DECIMAL(38,0)) * _n)"
    var = f"(({var_num} - {var_num} % {var_den}) / {var_den})"
    z = F.expr(
        f"CAST(((d_micro - {mean}) * 1000) div "
        f"greatest(CAST(floor(sqrt(CAST({var} AS DOUBLE))) "
        "AS BIGINT), 1) AS BIGINT)"
    )
    return (
        joined.select("vec_id", "centroid_id", "d_micro", z.alias("z_milli"))
        .where(F.abs(F.col("z_milli")) >= int(z_milli_threshold))
    )


def rp_signs(dim_in: int, dim_out: int, salt: str = "rp") -> List[List[int]]:
    """The deterministic ±1 projection matrix behind :func:`rp_project`:
    ``sign[j][i] = +1`` iff the 32-bit md5 of ``'{salt}|{j}|{i}'`` is
    even — derivable identically in any engine (the DuckDB oracle
    recomputes it from the same md5 expression, pinning this
    derivation), so the projection needs no shipped model artifact."""
    import hashlib

    return [
        [
            1
            if int(hashlib.md5(f"{salt}|{j}|{i}".encode()).hexdigest()[:8], 16) % 2
            == 0
            else -1
            for i in range(dim_in)
        ]
        for j in range(dim_out)
    ]


def rp_project(
    emb: DataFrame,
    dim_in: int,
    dim_out: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "rp",
    scale: int = 1_000_000,
) -> DataFrame:
    """Signed random projection (Achlioptas 2003 / Johnson-Lindenstrauss
    with a ±1 matrix): compress ``dim_in`` float embeddings to
    ``dim_out`` integer components, ``proj[j] = sum_i sign(j,i) *
    round(v_i * scale)`` — the dimensionality-reduction front end that
    makes downstream ANN / clustering / near-dup passes cheaper at
    10^12 vectors while JL preserves pairwise distances to within the
    standard (1 ± eps) bound at ``dim_out = O(log n / eps^2)``.

    Components are micro-quantized BEFORE the signed sum (the
    ``kmeans_step_stats`` move), so every output is an exact int64 —
    reduction-order-independent and hash-identical cross-engine. The
    sign matrix comes from :func:`rp_signs` (md5-derived constants, no
    model artifact to ship). ``dim_in`` is an explicit parameter — the
    package rule against driver-side data probes.

    Returns ``(id_col, proj array<bigint> of length dim_out)``.

    Scale: ENTIRELY row-local — one quantizing transform + dim_out
    literal-signed sums over ``element_at``; no shuffle, no join, no
    UDF (plan pinned Exchange-free in tests/test_similarity_extras.py).
    """
    if dim_in < 1 or dim_out < 1:
        raise ValueError(
            f"rp_project needs dim_in/dim_out >= 1, got {dim_in}/{dim_out}"
        )
    signs = rp_signs(dim_in, dim_out, salt=salt)
    q = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda v: F.round(v * int(scale)).cast("long"),
    )
    d = emb.select(F.col(id_col).alias(id_col), q.alias("_q"))
    # each component is one zip_with(q, ±1-literal-array) · running sum:
    # the same exact integer sum as the former chain of dim_in signed
    # element_at terms, but the expression tree is dim_out small HOF
    # nodes instead of dim_in·dim_out Add/ElementAt nodes — the former
    # shape's optimizer/codegen handling dominated the operator's
    # runtime (measured 2.0 s -> 0.9 s at sf0.1 for 64->8)
    # The whole projection array is ONE parsed SQL expression: the
    # former per-component Column build issued ~dim_in·dim_out py4j
    # calls (a literal per sign-matrix entry — measured ~8,800 driver
    # round trips, ~1 s of pure construction time per call at 64->8);
    # the parsed tree, and hence execution and results, are identical.
    comps = []
    for j in range(dim_out):
        sarr = ",".join(
            "1L" if signs[j][i] > 0 else "-1L" for i in range(dim_in)
        )
        comps.append(
            "CAST(aggregate(zip_with(_q, array(" + sarr + "), "
            "(a, b) -> a * b), 0L, (acc, x) -> acc + x) AS BIGINT)"
        )
    proj = F.expr("array(" + ",".join(comps) + ")")
    return d.select(id_col, proj.alias("proj"))


def rrf_fusion(
    rankings: Sequence[DataFrame],
    k0: int = 60,
    top_k: int = None,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack/Clarke/Büttcher 2009) — the
    standard hybrid-retrieval combiner: fuse N per-query rank lists
    (e.g. BM25 lexical + ANN embedding recall) by summing
    ``1/(k0 + rank)`` per document, no score normalization needed
    because only RANKS enter. The training-data uses: hybrid
    benchmark-decontamination recall, retrieval-based hard-negative
    mining, and merging per-shard top-k lists from shard-local indexes.

    Integer-exact twist for the hash-oracle contract: each list
    contributes ``1_000_000 // (k0 + rank)`` micro-units (floor), so
    the fused score is an exact int64 sum — reduction-order-independent
    and cross-engine identical, while preserving the RRF ordering for
    any rank ≤ ~1e6·k0. Ties break by ascending id (the package's
    stable-tie rule).

    Each ranking is a ``(query_col, id_col, rank_col)`` table with rank
    ≥ 1; duplicate (query, doc) rows WITHIN one list are an upstream
    bug RRF must not paper over, so lists are used as-is (a doc in m
    lists gets m contributions — the RRF definition).

    Returns ``(query_col, id_col, n_lists, rrf_micro, fused_rank)``,
    optionally cut to ``top_k`` per query.

    Scale: the input lists are top-k slices (human/query-sized per
    query, NEVER corpus-sized), so the union + one (query, doc)-keyed
    combinable agg is bounded by Σ|lists|; the final per-query window
    compiles to WindowGroupLimit when ``top_k`` is set. The corpus
    itself never enters this operator — the upstream retrievers bound
    it.
    """
    if not rankings:
        raise ValueError("rrf_fusion needs at least one ranking")
    if k0 < 0:
        raise ValueError(f"rrf_fusion needs k0 >= 0, got {k0}")
    if top_k is not None and top_k < 1:
        raise ValueError(f"rrf_fusion needs top_k >= 1, got {top_k}")
    from pyspark.sql import Window

    # `div` keeps the contribution in exact int64 arithmetic end-to-end
    # (double division then truncation agrees here, but exactness
    # shouldn't hinge on a rounding argument)
    contrib = F.expr(
        f"1000000L div (cast({int(k0)} as bigint) + cast({rank_col} as bigint))"
    )
    parts = [
        ensure_parallelism(r).select(
            F.col(query_col).alias("_q"),
            F.col(id_col).alias("_d"),
            contrib.cast("long").alias("_c"),
        )
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy("_q", "_d").agg(
        F.count(F.lit(1)).cast("int").alias("n_lists"),
        F.sum("_c").cast("long").alias("rrf_micro"),
    )
    w = Window.partitionBy("_q").orderBy(
        F.col("rrf_micro").desc(), F.col("_d").asc()
    )
    out = fused.withColumn(
        "fused_rank", F.row_number().over(w).cast("int")
    )
    if top_k is not None:
        out = out.where(F.col("fused_rank") <= int(top_k))
    return out.select(
        F.col("_q").alias(query_col),
        F.col("_d").alias(id_col),
        "n_lists",
        "rrf_micro",
        "fused_rank",
    )


def ndcg_discounts(k: int, scale: int = 1_000_000) -> List[int]:
    """The micro-quantized rank discounts behind :func:`ndcg_eval`:
    ``disc[r-1] = round(scale / log2(r + 1))`` for rank r in 1..k —
    quantized ONCE in Python (deterministic IEEE doubles) and embedded
    as literals on BOTH engines (the ``rp_signs`` no-shipped-artifact
    discipline), so no per-row transcendental ever has to agree
    cross-engine."""
    import math

    return [round(scale / math.log2(r + 1)) for r in range(1, k + 1)]


def ndcg_eval(
    ranking: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """nDCG@k for a retrieval ranking against graded judgments — the
    standard eval closing the loop on ``bm25_topk`` / the ANN paths /
    ``rrf_fusion``: per query, ``DCG = Σ (2^rel − 1) · 1/log2(rank+1)``
    over the top-k, normalized by the ideal ordering's DCG. The
    training-data uses: scoring retrieval-based decontamination and
    hard-negative miners before trusting them at corpus scale.

    Integer-exact: gains ``2^rel − 1`` are exact ints (rel graded 0–30
    supported before overflow concerns), discounts come pre-quantized
    from :func:`ndcg_discounts`, so ``dcg_micro``/``idcg_micro`` are
    reduction-order-independent int64 sums and ``ndcg_bp = 10000 ·
    dcg div idcg``. A query with no positive judgments has idcg 0 and
    reports ``ndcg_bp`` NULL (undefined, surfaced — not a silent 0).

    ``qrels`` is ``(query_col, id_col, rel_col)`` with non-negative
    integer grades; unjudged ranked docs gain 0 (standard trec_eval
    semantics). Queries appearing only in qrels still report (their
    dcg is 0) — the eval must expose retrievers that return nothing.

    Scale: qrels and rank lists are eval-sized, never corpus-sized —
    one left join rank→rel, one per-query ideal window over qrels
    (WindowGroupLimit), two combinable aggs, one query-keyed join.
    """
    if k < 1:
        raise ValueError(f"ndcg_eval needs k >= 1, got {k}")
    from pyspark.sql import Window

    disc = ndcg_discounts(k)
    disc_arr = F.array(*[F.lit(d).cast("long") for d in disc])
    # 2^rel − 1: pow(2.0, n) is EXACT for integer n ≤ 52 (the double
    # is the correctly-rounded — here representable — power of two);
    # shiftleft would be nicer but pyspark's takes only a literal bit
    # count. Grades are eval-human-sized, nowhere near 52.
    gain = lambda c: (F.pow(F.lit(2.0), c).cast("long") - 1).cast("long")

    r = ensure_parallelism(ranking).select(
        F.col(query_col).alias("_q"),
        F.col(id_col).alias("_d"),
        F.col(rank_col).cast("int").alias("_r"),
    ).where(F.col("_r") <= int(k))
    j = qrels.select(
        F.col(query_col).alias("_q"),
        F.col(id_col).alias("_d"),
        F.col(rel_col).cast("long").alias("_rel"),
    )
    dcg = (
        r.join(j, on=["_q", "_d"], how="left")
        .select(
            "_q",
            (
                gain(F.coalesce(F.col("_rel"), F.lit(0)))
                * F.element_at(disc_arr, F.col("_r"))
            ).alias("_t"),
            F.when(F.col("_rel").isNotNull(), 1).otherwise(0).alias("_j"),
        )
        .groupBy("_q")
        .agg(
            F.sum("_t").cast("long").alias("dcg_micro"),
            F.sum("_j").cast("long").alias("judged_in_topk"),
        )
    )
    w = Window.partitionBy("_q").orderBy(F.col("_rel").desc(), F.col("_d").asc())
    ideal = (
        j.withColumn("_ir", F.row_number().over(w))
        .where((F.col("_ir") <= int(k)) & (F.col("_rel") > 0))
        .select(
            "_q",
            (gain(F.col("_rel")) * F.element_at(disc_arr, F.col("_ir"))).alias("_t"),
        )
        .groupBy("_q")
        .agg(F.sum("_t").cast("long").alias("idcg_micro"))
    )
    out = (
        j.select("_q").union(r.select("_q")).distinct()
        .join(dcg, on="_q", how="left")
        .join(ideal, on="_q", how="left")
        .select(
            F.col("_q").alias(query_col),
            F.coalesce("dcg_micro", F.lit(0)).cast("long").alias("dcg_micro"),
            F.coalesce("idcg_micro", F.lit(0)).cast("long").alias("idcg_micro"),
            F.coalesce("judged_in_topk", F.lit(0)).cast("long")
            .alias("judged_in_topk"),
        )
        .withColumn(
            "ndcg_bp",
            F.when(
                F.col("idcg_micro") > 0,
                F.expr("(10000 * dcg_micro) div idcg_micro"),
            ).cast("long"),
        )
    )
    return out


def burrows_delta(
    docs: DataFrame,
    group_col: str,
    text_col: str = "text",
    top_words: int = 30,
    max_groups: int = 200,
) -> DataFrame:
    """Burrows' Delta stylometry between hosts (or any grouping): mean
    absolute z-score gap over the corpus's top function words — the
    classic authorship-attribution distance. ``host_mirrors`` catches
    hosts serving the same CONTENT; Delta catches hosts written by the
    same HAND (template farms, spun-article networks, one operator
    behind many domains) whose pages never hash-match.

    Determinism discipline: relative frequencies quantize ONCE to
    integer ppm (``(10⁶·c) div T_g``, zero-filled over the group ×
    top-word grid); per word the z numerator ``f·H − Σf`` and variance
    core ``D_w = H·Σf² − (Σf)²`` stay exact longs (f ≤ 10⁶, H ≤
    max_groups — no overflow inside long for H ≤ 9e5); each pair term
    ``10⁶·|z_a − z_b| = 10⁶·|num_a − num_b|/√D_w`` floors to an
    integer micro-unit BEFORE summation, so the cross-partition sum is
    order-free and the oracle matches bit-for-bit (÷ and √ are
    correctly rounded IEEE; no transcendental). Words with D_w = 0
    (uniform across groups) drop from every pair identically.

    Scale: token totals and (group, word) counts are combinable
    rollups; only the top ``max_groups`` groups by volume enter the
    quadratic stage, so the pair fan-out is capped at
    max_groups²·top_words/2 rows regardless of corpus size (the same
    cap-the-quadratic discipline as MinHashIndex's max_bucket). One
    row per unordered group pair: ``(grp_a, grp_b, n_words,
    delta_micro)`` — delta in micro-z units, smaller = closer style.
    """
    f_top = int(top_words)
    h_max = int(max_groups)
    if f_top < 1 or h_max < 2:
        raise ValueError("need top_words ≥ 1 and max_groups ≥ 2")
    base = (
        docs
        .where(F.col(group_col).isNotNull())
        .select(
            F.col(group_col).alias("_g"),
            F.explode(normalized_words(text_col)).alias("_w"),
        )
    )
    per = base.groupBy("_g", "_w").agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    totals = per.groupBy("_g").agg(F.sum("_c").cast("long").alias("_t"))
    kept = totals.orderBy(F.col("_t").desc(), F.col("_g").asc()).limit(h_max)
    # top function words measured over the KEPT groups so the grid and
    # the frequencies describe the same population
    topw = (
        per.join(F.broadcast(kept.select("_g")), on="_g")
        .groupBy("_w")
        .agg(F.sum("_c").cast("long").alias("_wc"))
        .orderBy(F.col("_wc").desc(), F.col("_w").asc())
        .limit(f_top)
        .select("_w")
    )
    grid = kept.crossJoin(F.broadcast(topw))
    f = (
        grid.join(per, on=["_g", "_w"], how="left")
        .select(
            "_g",
            "_w",
            F.expr("(1000000 * coalesce(_c, 0)) div _t").alias("_f"),
        )
    )
    from pyspark.sql import Window

    ww = Window.partitionBy("_w")
    z = f.select(
        "_g",
        "_w",
        (
            F.col("_f") * F.count(F.lit(1)).over(ww) - F.sum("_f").over(ww)
        ).alias("_znum"),
        (
            F.count(F.lit(1)).over(ww) * F.sum(F.col("_f") * F.col("_f")).over(ww)
            - F.sum("_f").over(ww) * F.sum("_f").over(ww)
        ).alias("_dw"),
    ).where(F.col("_dw") > 0)
    a = z.select(
        F.col("_g").alias("grp_a"), "_w",
        F.col("_znum").alias("_za"), "_dw",
    )
    b = z.select(
        F.col("_g").alias("grp_b"), "_w", F.col("_znum").alias("_zb"),
    )
    pairs = (
        a.join(b, on="_w")
        .where(F.col("grp_a") < F.col("grp_b"))
        .select(
            "grp_a",
            "grp_b",
            F.floor(
                F.lit(1000000.0)
                * F.abs(F.col("_za") - F.col("_zb")).cast("double")
                / F.sqrt(F.col("_dw").cast("double"))
            )
            .cast("long")
            .alias("_term"),
        )
    )
    return pairs.groupBy("grp_a", "grp_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.expr("sum(_term) div count(1)").cast("long").alias("delta_micro"),
    )


def hard_negatives(
    embeddings: DataFrame,
    anchors: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each ANCHOR
    vector, the ``k`` most-similar corpus vectors carrying a DIFFERENT
    label — the negatives that actually teach a bi-encoder something
    (random negatives are trivially separable after the first epoch;
    the highest-cosine wrong-label neighbors define the decision
    boundary). The same-label filter is applied BEFORE ranking, so a
    near-duplicate of the anchor with the anchor's own label never
    burns a negative slot.

    Determinism: cosine rounded to 6 dp (the `brute_force_topk`
    contract) with (cosine desc, id asc) tie order, so the ranked
    output hash-matches the DuckDB twin exactly.

    Scale: this is the EXACT form — the anchor set is a bounded batch
    (a training mini-batch or eval probe set, broadcast: anchor count
    × corpus scoring is the oracle twin of the production path, which
    applies the same label≠ filter inside `lsh_topk`/`ivf_search`'s
    candidate stage and inherits their bucketed plans). Corpus side
    scans once per call; per-anchor ranking is a window partitioned by
    anchor, never global. Returns ``(anchor_id, rank, vec_id, cosine,
    label)``.
    """
    if k < 1:
        raise ValueError(f"hard_negatives: k must be >= 1, got {k}")
    a = F.broadcast(
        anchors.select(
            F.col(id_col).alias("anchor_id"),
            F.col(vec_col).cast("array<double>").alias("_avec"),
            F.col(label_col).alias("_albl"),
        )
    )
    c = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("_cvec"),
        F.col(label_col).alias("label"),
    )
    scored = (
        c.crossJoin(a)
        .where(F.col("label") != F.col("_albl"))
        .select(
            "anchor_id",
            "vec_id",
            "label",
            F.round(cosine_col(F.col("_cvec"), F.col("_avec")), 6).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.select(
            "anchor_id",
            F.row_number().over(w).cast("int").alias("rank"),
            "vec_id",
            "cosine",
            "label",
        )
        .where(F.col("rank") <= int(k))
    )


def mrr_eval(
    ranking: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Mean reciprocal rank @ k — the first-relevant-hit eval
    companion to :func:`ndcg_eval` (graded list quality) and
    `pr_curve` (threshold sweeps): for known-item tasks —
    decontamination probes, mirror lookup, canonical-URL retrieval —
    the only question is "how deep is the FIRST correct answer", and
    MRR is its standard summary.

    Per query: ``rr_micro = 10⁶ div first_rank`` over the minimum rank
    of any judged-relevant doc in the top-k (exact integer; a query
    with no relevant doc in the top-k scores 0 — standard MRR, misses
    count). Queries come from the UNION of ranking and qrels query
    sets, so empty retrievals are penalized, not dropped (the
    `ndcg_eval` convention). ``mrr_micro = Σrr div n_queries`` —
    integer div, non-negative numerator, engine-identical.

    Returns one row: ``(n_queries, n_hit, sum_rr_micro, mrr_micro)``.

    Scale: eval-sized inputs — one (query,doc) equi-join, one
    per-query min, one global agg. Nothing touches the corpus.
    """
    if k < 1:
        raise ValueError(f"mrr_eval needs k >= 1, got {k}")
    r = ensure_parallelism(ranking).select(
        F.col(query_col).alias("_q"),
        F.col(id_col).alias("_d"),
        F.col(rank_col).cast("long").alias("_r"),
    ).where(F.col("_r") <= int(k))
    j = qrels.select(
        F.col(query_col).alias("_q"),
        F.col(id_col).alias("_d"),
    )
    first = (
        r.join(j, on=["_q", "_d"])
        .groupBy("_q")
        .agg(F.min("_r").cast("long").alias("_fr"))
    )
    allq = r.select("_q").union(j.select("_q")).distinct()
    per = allq.join(first, on="_q", how="left").select(
        "_q",
        F.coalesce(
            F.expr("1000000 div _fr").cast("long"), F.lit(0)
        ).alias("_rr"),
        F.when(F.col("_fr").isNotNull(), 1).otherwise(0).alias("_h"),
    )
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.sum("_h").cast("long").alias("n_hit"),
        F.sum("_rr").cast("long").alias("sum_rr_micro"),
        F.expr("CAST(sum(_rr) div count(1) AS BIGINT)").alias("mrr_micro"),
    )


def cluster_quality(
    embeddings: DataFrame,
    centroids: List[List[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Centroid-based cluster-quality panel per cluster: simplified
    silhouette and the Davies–Bouldin term — the "is this k any
    good?" eval closing the k-means/IVF loop (`kmeans_step_stats`
    trains, `ivf_assign` partitions, nothing yet JUDGES). The
    simplified silhouette (vector-to-CENTROID distances, Hruschka et
    al.) is the O(n·k) form that survives corpus scale where the
    classic O(n²) pairwise silhouette cannot.

    Determinism (the `semdedup`/`ivf_assign` discipline): every
    per-vector float — own-centroid distance a, nearest-other
    distance b, silhouette (b−a)/max(a,b) — is ONE fixed IEEE shape
    quantized to integer micro BEFORE any cross-row sum, so
    aggregation order cannot drift the result. Per-cluster scatter
    s̄_i = mean a rides the same integer sums; DB_i = max_{j≠i}
    (s̄_i + s̄_j)/d_ij uses the centroid-pair distances, which are
    DRIVER literals (centroids are driver data — computed in numpy,
    embedded in the plan). Empty clusters emit zero rows (nothing to
    judge).

    Returns one row per non-empty cluster: ``(centroid_id, n,
    scatter_milli, silhouette_milli, db_milli)``.

    Scale: one scan with k distance expressions per row (k = IVF
    list count, driver-sized), ONE combinable per-cluster rollup,
    then k-row driver-side algebra. No shuffle beyond the rollup.
    """
    if len(centroids) < 2:
        raise ValueError("cluster_quality needs at least 2 centroids")
    vec_d = F.col(vec_col).cast("array<double>")

    # squared distances as ONE array column computed once per row —
    # the former per-centroid columns plus the chained-when argmin
    # re-evaluated the interpreted distance fold O(2^k) times per row
    # (see nearest_centroid_col); argmin, own distance and
    # nearest-other distance all derive from the array. The project
    # boundary survives (CollapseProject does not inline non-cheap
    # expressions used more than once), so values and results are
    # identical with ~k folds per row.
    base0 = embeddings.select(sq_dists_col(vec_d, centroids).alias("_sq"))
    base = base0.select(
        argmin_col(F.col("_sq")).alias("centroid_id"),
        F.transform(F.col("_sq"), lambda x: F.sqrt(x)).alias("_d"),
    )
    k_ = len(centroids)
    a = F.element_at(F.col("_d"), F.col("centroid_id") + 1)
    # min over the other centroids: min of the slices before and after
    # the own index (array_min of an empty slice is NULL; least skips
    # NULLs) — the same double set the former least(*others) reduced
    b = F.least(
        F.array_min(F.slice(F.col("_d"), F.lit(1), F.col("centroid_id"))),
        F.array_min(
            F.slice(F.col("_d"), F.col("centroid_id") + 2, F.lit(k_))
        ),
    )
    per = base.select(
        "centroid_id",
        F.floor(1_000_000 * a).cast("long").alias("_a_micro"),
        F.floor(
            1_000_000
            * (b - a)
            / F.greatest(a, b)
        ).cast("long").alias("_s_micro"),
    )
    agg = per.groupBy("centroid_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_a_micro").cast("long").alias("_sa"),
        F.sum("_s_micro").cast("long").alias("_ss"),
    )
    import numpy as np

    k = len(centroids)
    pair_rows = []
    for i in range(k):
        for j in range(k):
            if i != j:
                d = float(
                    np.sqrt(
                        np.sum(
                            (np.asarray(centroids[i]) - np.asarray(centroids[j]))
                            ** 2
                        )
                    )
                )
                pair_rows.append((i, j, d))
    pairs = embeddings.sparkSession.createDataFrame(
        pair_rows, "ci int, cj int, dij double"
    )
    scat = agg.select(
        F.col("centroid_id").alias("ci"),
        F.expr("CAST(_sa div n AS BIGINT)").alias("_scat_i"),
    )
    scat_j = scat.select(
        F.col("ci").alias("cj"), F.col("_scat_i").alias("_scat_j")
    )
    db = (
        pairs.join(F.broadcast(scat), on="ci")
        .join(F.broadcast(scat_j), on="cj")
        .groupBy(F.col("ci").alias("centroid_id"))
        .agg(
            F.max(
                F.expr(
                    "CAST(floor(1000.0 * (CAST(_scat_i AS DOUBLE)"
                    " + _scat_j) / 1000000.0 / dij) AS BIGINT)"
                )
            )
            .cast("long")
            .alias("db_milli")
        )
    )
    return (
        agg.join(F.broadcast(db), on="centroid_id", how="left")
        .select(
            "centroid_id",
            "n",
            F.expr("CAST((_sa div n) div 1000 AS BIGINT)").alias(
                "scatter_milli"
            ),
            F.expr("CAST((_ss div n) div 1000 AS BIGINT)").alias(
                "silhouette_milli"
            ),
            "db_milli",
        )
        .orderBy("centroid_id")
    )


def cluster_purity_nmi(
    assignments: DataFrame,
    cluster_col: str = "centroid_id",
    label_col: str = "label",
) -> DataFrame:
    """Purity and normalized mutual information of a clustering
    against reference labels — the external-validity pair next to
    `bcubed_eval` (which scores per-item precision/recall): purity
    is the fraction captured by each cluster's majority label
    (trivially gamed by tiny clusters), NMI is the
    information-theoretic correction that is not. One row summarizes
    the whole clustering.

    Exactness: purity's numerator ``Σ_c max_l n_cl`` is pure
    integers; MI and the entropies use the module's per-term
    ln-floor discipline — every ``(n_cl/N)·ln(N·n_cl/(n_c·n_l))``
    term floors to micro-nats BEFORE the order-free sum (identical
    libm doubles both engines), and ``nmi_milli = floor(1000·2·MI/
    (H_c + H_l))`` is one final shape. Degenerate (single cluster
    AND single label → H sums to 0) → NULL NMI.

    Returns one row: ``(n, n_clusters, n_labels, purity_ppm,
    mi_micro, h_cluster_micro, h_label_micro, nmi_milli)``.

    Scale: one (cluster, label) combinable rollup; margins re-derived
    from the cell table; everything after is cell-table-sized.
    """
    base = assignments.where(
        F.col(cluster_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.col(cluster_col).cast("string").alias("_c"),
        F.col(label_col).cast("string").alias("_l"),
    )
    cells = base.groupBy("_c", "_l").agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    cm = cells.groupBy("_c").agg(F.sum("_n").cast("long").alias("_nc"))
    lm = cells.groupBy("_l").agg(F.sum("_n").cast("long").alias("_nl"))
    tot = cells.agg(
        F.sum("_n").cast("long").alias("n"),
        F.count_distinct("_c").cast("long").alias("n_clusters"),
        F.count_distinct("_l").cast("long").alias("n_labels"),
    )
    pur = (
        cells.groupBy("_c")
        .agg(F.max("_n").cast("long").alias("_mx"))
        .agg(F.sum("_mx").cast("long").alias("_pure"))
    )
    mi = (
        cells.join(F.broadcast(cm), on="_c")
        .join(F.broadcast(lm), on="_l")
        .crossJoin(F.broadcast(tot.select("n")))
        .select(
            F.expr(
                "CAST(floor(1000000.0 * (CAST(_n AS DOUBLE) / n)"
                " * ln(CAST(_n AS DOUBLE) * n"
                "      / (CAST(_nc AS DOUBLE) * _nl))) AS BIGINT)"
            ).alias("_t")
        )
        .agg(F.sum("_t").cast("long").alias("mi_micro"))
    )

    def entropy(marg, cnt_col):
        return (
            marg.crossJoin(F.broadcast(tot.select("n")))
            .select(
                F.expr(
                    f"CAST(floor(1000000.0 * (CAST({cnt_col} AS DOUBLE)"
                    f" / n) * (ln(CAST(n AS DOUBLE))"
                    f" - ln(CAST({cnt_col} AS DOUBLE)))) AS BIGINT)"
                ).alias("_t")
            )
            .agg(F.sum("_t").cast("long").alias("h"))
        )

    hc = entropy(cm, "_nc").select(F.col("h").alias("h_cluster_micro"))
    hl = entropy(lm, "_nl").select(F.col("h").alias("h_label_micro"))
    out = (
        tot.crossJoin(F.broadcast(pur))
        .crossJoin(F.broadcast(mi))
        .crossJoin(F.broadcast(hc))
        .crossJoin(F.broadcast(hl))
    )
    return out.select(
        "n",
        "n_clusters",
        "n_labels",
        F.expr("(1000000 * _pure) div n").cast("long").alias("purity_ppm"),
        "mi_micro",
        "h_cluster_micro",
        "h_label_micro",
        F.when(
            (F.col("h_cluster_micro") + F.col("h_label_micro")) > 0,
            F.expr(
                "CAST(floor(1000.0 * 2.0 * CAST(mi_micro AS DOUBLE)"
                " / (CAST(h_cluster_micro AS DOUBLE)"
                "    + h_label_micro)) AS BIGINT)"
            ),
        ).alias("nmi_milli"),
    )


def assignment_margins(
    embeddings: DataFrame,
    centroids: List[List[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-cluster assignment-margin audit: how decisively does each
    vector belong to its list? margin = d(second-nearest centroid) −
    d(nearest), the ambiguity number behind IVF's nprobe choice (thin
    margins → probes must widen) and the unsupervised cousin of
    `hard_negatives`' label margins.

    Per-vector margins floor to integer micro (fixed IEEE shape, the
    `cluster_quality` discipline) before the per-cluster integer
    rollup; the per-cluster MINIMUM margin rides along — the worst
    case is what sets nprobe.

    Returns one row per non-empty cluster: ``(centroid_id, n,
    mean_margin_milli, min_margin_micro, thin_ppm)`` — thin_ppm =
    share of vectors with margin below 10% of the cluster's own-dist
    scale (margin < 0.1·d_nearest, evaluated per vector, exact
    integer comparison after a shared micro quantization).

    Scale: the `cluster_quality` scan shape — k distances per row,
    one combinable rollup.
    """
    if len(centroids) < 2:
        raise ValueError("assignment_margins needs at least 2 centroids")
    vec_d = F.col(vec_col).cast("array<double>")

    def sqdist(c):
        return F.aggregate(
            F.zip_with(vec_d, _lit_vec(c), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    cid = nearest_centroid_col(vec_d, centroids)
    dist_cols = [
        F.sqrt(sqdist(c)).alias(f"_d{i}") for i, c in enumerate(centroids)
    ]
    base = embeddings.select(cid.alias("centroid_id"), *dist_cols)
    d1 = None
    d2 = None
    for i in range(len(centroids)):
        own = F.when(F.col("centroid_id") == i, F.col(f"_d{i}"))
        d1 = own if d1 is None else F.coalesce(d1, own)
        others = [
            F.col(f"_d{j}") for j in range(len(centroids)) if j != i
        ]
        sec = F.when(F.col("centroid_id") == i, F.least(*others))
        d2 = sec if d2 is None else F.coalesce(d2, sec)
    per = base.select(
        "centroid_id",
        F.floor(1_000_000 * (d2 - d1)).cast("long").alias("_m_micro"),
        F.floor(1_000_000 * d1).cast("long").alias("_d1_micro"),
    )
    return (
        per.groupBy("centroid_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.expr(
                "CAST((sum(_m_micro) div count(1)) div 1000 AS BIGINT)"
            ).alias("mean_margin_milli"),
            F.min("_m_micro").cast("long").alias("min_margin_micro"),
            F.expr(
                "CAST((1000000 * sum(CASE WHEN 10 * _m_micro"
                " < _d1_micro THEN 1 ELSE 0 END)) div count(1)"
                " AS BIGINT)"
            ).alias("thin_ppm"),
        )
        .orderBy("centroid_id")
    )
