"""Link-graph operators for crawl curation: in-degree, an
integer-arithmetic PageRank, and per-target anchor-text aggregation —
the quality/relevance priors a frontier scheduler or document-weighting
pass consumes (fed by ops/cleaning.extract_links).

PageRank here is the INTEGER-TRUNCATED variant: ranks are integer
"micro-rank" units and every step is exact integer arithmetic
(``div`` truncation), so a fixed iteration count yields BIT-IDENTICAL
results on any engine, partitioning or reduction order — which is what
makes it DuckDB-oracle-checkable (floating-point PageRank sums are
reduction-order dependent in the last bits). The truncation loses at
most 1 micro-rank unit per edge per round — noise at the 10⁻⁶ level of
a quality prior. Dangling nodes leak rank (the standard simple
variant); per-iteration lineage is cut with an eager localCheckpoint
exactly like connected components (see ops/dedup.py — a lazy
persist/unpersist cycle rebuilds exponentially).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import ensure_parallelism


def in_degrees(edges: DataFrame, src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """Distinct-edge in-degree per node — the cheapest link-quality
    signal (one shuffle)."""
    return (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .groupBy(F.col("dst").alias("node"))
        .agg(F.count(F.lit(1)).alias("in_degree"))
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
    init: int = 1_000_000,
    base: int = 150_000,
    damping_pct: int = 85,
) -> DataFrame:
    """Fixed-iteration integer PageRank over the distinct edge set.

    Per round: each node sends ``rank div outdeg`` along every out-edge;
    each node's next rank is ``base + (damping_pct * incoming) div 100``.
    Each round is one join + one aggregation keyed by node — the 100 TB
    shape — and the label table is checkpointed per round to cut
    lineage. Returns (node, rank) after exactly ``iterations`` rounds.
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .persist()
    )
    # node set and out-degree in ONE aggregation (out-degree = count of
    # distinct out-edges = sum of src-side flags over the union), so the
    # loop's two setup tables need one barrier, not two; the initial
    # rank table derives from the cached deg table and needs no eager
    # checkpoint of its own
    deg = (
        e.select(F.col("src").alias("node"), F.lit(1).alias("_o"))
        .unionByName(e.select(F.col("dst").alias("node"), F.lit(0).alias("_o")))
        .groupBy("node")
        .agg(F.sum("_o").alias("od"))
    )
    # od RIDES THE RANK TABLE through every checkpoint: a node that
    # appears in `e` as src always has od >= 1 (od counts its distinct
    # out-edges), so `rank div od` sees exactly the rows the former
    # per-round outdeg join kept — one join per round removed, same
    # integer arithmetic, bit-identical ranks.
    ranks = deg.select("node", "od", F.lit(init).cast("long").alias("rank"))
    for _ in range(iterations):
        contrib = e.join(ranks, on=e.src == ranks.node).select(
            "dst", F.expr("rank div od").alias("c")
        )
        incoming = contrib.groupBy("dst").agg(F.sum("c").alias("inc"))
        new_ranks = (
            ranks.join(incoming, on=ranks.node == incoming.dst, how="left")
            .select(
                "node",
                "od",
                (
                    F.lit(base)
                    + F.expr(f"({damping_pct} * coalesce(inc, 0)) div 100")
                ).cast("long").alias("rank"),
            )
        )
        # eager checkpoint per round — see module docstring
        ranks = new_ranks.localCheckpoint(eager=True)
    e.unpersist()
    return ranks.select("node", "rank")


def anchor_stats(
    links: DataFrame,
    target_col: str = "href",
    anchor_col: str = "anchor",
    source_col: str = "doc_id",
) -> DataFrame:
    """Per-target anchor-text aggregation over the outlink table
    (ops/cleaning.extract_links' output): how many links point at each
    target, from how many distinct source docs, and the modal anchor
    text (ties by ascending anchor — deterministic, oracle-checkable).
    Anchor text is the classic off-page relevance/quality signal a
    crawl ranker consumes next to in-degree/PageRank.

    Scale (100 TB): two aggregations with map-side partials — one keyed
    (href, anchor) for the mode, one keyed href for the totals — and a
    href-keyed join of the two. The modal pick is a per-href window
    over the ALREADY-AGGREGATED pair counts (cardinality = distinct
    anchors per target, not link count), never over raw links. The
    ``links`` input is CONSUMED TWICE (pair branch + totals branch) and
    deliberately not persisted — same trade as domain_blocklist: at
    corpus scale ``links`` is a materialized 3-column table whose
    second pruned scan is cheaper than caching it; hand this op a
    parquet-backed link table, not an inline html-explode composition,
    when the input is big."""
    from pyspark.sql import Window

    base = (
        links
        .select(
            F.col(target_col).alias("href"),
            F.trim(F.col(anchor_col)).alias("anchor"),
            F.col(source_col).alias("src"),
        )
        .where(F.col("href") != "")
    )
    pair = base.groupBy("href", "anchor").agg(F.count("*").alias("_n"))
    w = Window.partitionBy("href").orderBy(F.col("_n").desc(), F.col("anchor"))
    top = (
        pair.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select("href", F.col("anchor").alias("top_anchor"))
    )
    totals = base.groupBy("href").agg(
        F.count("*").alias("n_links"),
        F.countDistinct("src").alias("n_source_docs"),
    )
    return totals.join(top, "href")


def hits(
    edges: DataFrame,
    iterations: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    scale: int = 1_000_000,
) -> DataFrame:
    """Fixed-iteration integer HITS (Kleinberg hubs & authorities) over
    the distinct edge set — the complementary link prior to
    :func:`pagerank`: authorities are pages good to KEEP, hubs are
    pages good to CRAWL FROM (frontier scheduling).

    Same exactness discipline as the integer PageRank: per round,
    ``auth_raw(n) = Σ hub(src)`` over in-edges, renormalized to
    ``(raw * scale) div max(raw)`` — an exact integer operation, so a
    fixed iteration count is bit-identical on any engine or reduction
    order (the float HITS power iteration is not); then the symmetric
    hub update over out-edges. Each half-round is one join + one
    node-keyed aggregation + a 1-row broadcast of the max (the
    standard L∞ normalization made integer); lineage cut per round
    with eager localCheckpoints. ``Σ hub ≤ n·scale`` and the renorm
    multiplies by ``scale`` before dividing, so keep
    ``n·scale² < 2⁶³`` (drop ``scale`` for billion-node graphs)."""
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )

    def _renorm(raw: DataFrame, out_name: str) -> DataFrame:
        # SPARSE renorm: only nodes with a nonzero raw sum get a row —
        # a node missing here has score 0, contributes 0 to the next
        # half-round's inner join, and 0 is exactly what the former
        # all-nodes left join would have given it ((0·scale) div mx =
        # 0). The dense completion happens ONCE at the end instead of
        # once per half-round — two joins per iteration removed, same
        # integer scores (guide §2.4). max(raw) is unchanged: raw sums
        # are positive, so absent rows never held the max.
        mx = raw.agg(F.greatest(F.max("raw"), F.lit(1)).alias("_mx"))
        side = raw.crossJoin(F.broadcast(mx)).select(
            "node",
            F.expr(f"(raw * {scale}) div _mx").cast("long").alias(out_name),
        )
        return side.localCheckpoint(eager=True)

    hub = nodes.withColumn("hub", F.lit(scale).cast("long"))
    auth = None
    for _ in range(iterations):
        araw = (
            e.join(hub, on=e.src == hub.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").alias("raw"))
        )
        auth = _renorm(araw, "authority")
        hraw = (
            e.join(auth, on=e.dst == auth.node)
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("authority").alias("raw"))
        )
        hub = _renorm(hraw, "hub")
    out = (
        nodes.join(hub, on="node", how="left")
        .join(auth, on="node", how="left")
        .select(
            "node",
            F.coalesce("hub", F.lit(0)).cast("long").alias("hub"),
            F.coalesce("authority", F.lit(0)).cast("long").alias("authority"),
        )
    )
    e.unpersist()
    nodes.unpersist()
    return out


def host_graph(
    links: DataFrame,
    src_url_col: str = "src_url",
    dst_url_col: str = "href",
) -> DataFrame:
    """Project the page-level link graph onto HOSTS — the standard
    first move before any link-quality analysis at crawl scale: a
    10¹²-edge page graph collapses to a ~10⁷-node host graph that
    iterative algorithms (:func:`pagerank`, :func:`hits`) can chew on.

    One row per (src_host, dst_host) ordered pair — self-loops
    (intra-host navigation) KEPT so the consumer can measure
    intra/inter link balance — with ``n_links`` (page-edge count) and
    ``n_src_pages`` (distinct linking source urls). Unparseable urls
    (empty host) are dropped.

    Scale (100 TB): one groupBy shuffle keyed on the (small-cardinality)
    host pair; count + approx-free distinct both partial-aggregate
    map-side after a row-local host extraction
    (:func:`~.filters.host_col` — same grammar as the curation tier, so
    graph hosts join curation hosts exactly).
    """
    from .filters import host_col

    return (
        links.select(
            host_col(src_url_col).alias("src_host"),
            host_col(dst_url_col).alias("dst_host"),
            F.col(src_url_col).alias("_src_url"),
        )
        .where((F.col("src_host") != "") & (F.col("dst_host") != ""))
        .groupBy("src_host", "dst_host")
        .agg(
            F.count(F.lit(1)).alias("n_links"),
            F.countDistinct("_src_url").alias("n_src_pages"),
        )
    )


def host_reputation(hedges: DataFrame) -> DataFrame:
    """Per-host link-reputation features over a :func:`host_graph`
    projection — the TrustRank-lite signals a spam/link-farm gate
    consumes: distinct in/out neighbor hosts, in/out link mass
    (self-loops excluded from both), intra-host link count, and
    ``in_ratio_ppm`` — integer parts-per-million share of inbound links
    in the host's total cross-host link traffic (link farms sit near 0;
    pure sinks near 10⁶). All-integer so the oracle hash is exact.

    Scale: two aggregations over the (already host-sized) projection —
    one keyed by src_host, one by dst_host — joined FULL OUTER on host;
    both sides partial-aggregate and the join keys are co-partitioned
    from the same exchange.
    """
    cross = hedges.where(F.col("src_host") != F.col("dst_host"))
    out_side = cross.groupBy(F.col("src_host").alias("host")).agg(
        F.countDistinct("dst_host").alias("n_out_hosts"),
        F.sum("n_links").alias("n_out_links"),
    )
    in_side = cross.groupBy(F.col("dst_host").alias("host")).agg(
        F.countDistinct("src_host").alias("n_in_hosts"),
        F.sum("n_links").alias("n_in_links"),
    )
    intra = (
        hedges.where(F.col("src_host") == F.col("dst_host"))
        .select(F.col("src_host").alias("host"), F.col("n_links").alias("intra_links"))
    )
    rep = (
        out_side.join(in_side, on="host", how="full_outer")
        .join(intra, on="host", how="left")
        .select(
            "host",
            F.coalesce("n_in_hosts", F.lit(0)).cast("long").alias("n_in_hosts"),
            F.coalesce("n_in_links", F.lit(0)).cast("long").alias("n_in_links"),
            F.coalesce("n_out_hosts", F.lit(0)).cast("long").alias("n_out_hosts"),
            F.coalesce("n_out_links", F.lit(0)).cast("long").alias("n_out_links"),
            F.coalesce("intra_links", F.lit(0)).cast("long").alias("intra_links"),
        )
        .withColumn(
            "in_ratio_ppm",
            F.when(
                F.col("n_in_links") + F.col("n_out_links") > 0,
                F.expr("(n_in_links * 1000000) div (n_in_links + n_out_links)"),
            )
            .otherwise(F.lit(0))
            .cast("long"),
        )
    )
    return rep


def host_communities(hedges: DataFrame, min_links: int = 1) -> DataFrame:
    """Connected components over the cross-host link projection —
    mirror networks, link rings and boilerplate-share clusters surface
    as one ``community`` (labeled by its lexicographically-min host),
    the unit a curation policy bans or caps as a whole. ``min_links``
    drops sub-threshold edges first (one stray link should not merge
    two real communities).

    Thin composition: :func:`host_graph` output →
    :func:`~.dedup.connected_components` (min-label propagation with
    pointer jumping, O(log diameter) rounds, per-round eager
    checkpoints) — string labels propagate through the same machinery
    the doc-level dedup groups use. Self-loops are irrelevant to
    connectivity and dropped.
    """
    from .dedup import connected_components

    cross = hedges.where(
        (F.col("src_host") != F.col("dst_host"))
        & (F.col("n_links") >= int(min_links))
    )
    out = connected_components(cross, a_col="src_host", b_col="dst_host")
    return out.select(
        F.col("doc_id").alias("host"), F.col("component").alias("community")
    )


def resolve_canonical_chains(
    edges: DataFrame,
    max_hops: int = 16,
    url_col: str = "url",
    canonical_col: str = "canonical",
) -> DataFrame:
    """Resolve ``rel=canonical`` POINTER CHAINS to their terminal url —
    the consolidation step that folds print views, tracking-parameter
    mirrors and A/B variants onto the url the publisher declared
    canonical. A crawl dedups by the RESOLVED canonical, not the
    declared one: chains (a -> b -> c) are common when a site migrates
    twice, and naive one-hop resolution leaves b-variants split from c.

    Directed functional-graph fixpoint by POINTER JUMPING: each round
    replaces every label with its label's label (missing target or
    self-pointer = terminal, keeps the label), so ``r`` rounds resolve
    chains up to ``2^r`` hops — O(log chain-length) rounds, each one
    keyed join, with an eager ``localCheckpoint`` per round cutting the
    lineage exactly like :func:`~.dedup.connected_components`. Chains
    longer than ``max_hops`` and CYCLES (a <-> b happens in the wild —
    publisher misconfiguration) cannot stabilize: those rows come back
    ``resolved = false`` with the depth-``max_hops`` pointer as-is —
    deterministic (a fixed function of the input, no convergence race),
    loud in the output, and the caller's policy choice (treat as
    self-canonical, or drop). NULL / empty / self declarations are
    terminals: ``canonical_root = url``, trivially resolved.

    Output: ``(url, canonical_root, resolved)``, one row per input row.
    Scale shape: the jump table starts as (url, target) pairs — edges
    only, never a dense vertex closure — and every round is one
    equi-join on the pointer key; at 10^12 urls the join keys are
    url-hash-partitioned like every other shuffle in this package.
    """
    import math

    rounds = max(1, math.ceil(math.log2(max(2, int(max_hops)))))
    # normalize: declared target, with null/empty/self => terminal
    tgt = F.col(canonical_col)
    base = edges.select(
        F.col(url_col).alias("url"),
        F.when(
            tgt.isNull() | (tgt == "") | (tgt == F.col(url_col)), F.col(url_col)
        )
        .otherwise(tgt)
        .alias("label"),
    )
    # the jump map starts as the declared pointers of KNOWN urls only;
    # a label pointing outside the crawl is a terminal by definition
    labels = base.localCheckpoint(eager=True)
    for _ in range(rounds):
        jump = labels.select(
            F.col("url").alias("_ju"), F.col("label").alias("_jl")
        )
        labels = (
            labels.join(jump, on=labels.label == jump._ju, how="left")
            .select(
                "url",
                F.coalesce(F.col("_jl"), F.col("label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
    # resolved iff one more hop is a no-op (terminal or out-of-crawl)
    probe = base.select(
        F.col("url").alias("_pu"), F.col("label").alias("_pl")
    )
    out = (
        labels.join(probe, on=labels.label == probe._pu, how="left")
        .select(
            "url",
            F.col("label").alias("canonical_root"),
            (
                F.col("_pl").isNull() | (F.col("_pl") == F.col("label"))
            ).alias("resolved"),
        )
    )
    return out


def triangle_count(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-node triangle count and local clustering coefficient over
    the undirected simple projection of ``edges`` (direction collapsed,
    self-loops dropped, duplicate edges merged) — the classic
    link-farm / tight-clique signal next to :func:`host_reputation`:
    organic host neighborhoods are sparse (coefficient near 0), paid
    link rings and mirror farms interlink densely (near 10⁶ ppm).

    Degree-ordered wedge enumeration (the MapReduce triangle scheme of
    Suri & Vassilvitskii, WWW 2011): every undirected edge is oriented
    from its ``(degree, node)``-smaller endpoint to the larger, so each
    triangle has exactly ONE pivot vertex with two out-edges and is
    counted exactly once where the wedge ``(pivot→b, pivot→c)`` closes
    via the oriented edge ``b→c``. Out-degree under this orientation is
    O(√m) regardless of hub degree — a 10⁸-follower hub contributes no
    wedge fan-out because its edges all point INTO it — which is what
    makes the wedge self-join survive web-scale skew.

    Scale (100 TB): five key-partitioned shuffles, no iteration —
    distinct-edge, degree aggregation (map-side partials), the wedge
    self-join keyed on the pivot (fan-out bounded per the above), the
    closure join keyed on the candidate (b, c) edge, and the final
    per-node count. ``coeff_ppm = (2·T·10⁶) div (d·(d−1))`` is exact
    integer arithmetic, so the oracle hash is exact. Returns
    ``(node, degree, triangles, coeff_ppm)`` — every node of the simple
    graph appears, zero-filled.
    """
    from .cache import register_intermediates

    und = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .where(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
        .persist()
    )
    und.count()
    deg = (
        und.select(F.col("u").alias("node"))
        .unionByName(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
        .persist()
    )
    deg.count()
    du = deg.select(F.col("node").alias("u"), F.col("degree").alias("_du"))
    dv = deg.select(F.col("node").alias("v"), F.col("degree").alias("_dv"))
    # orient u→v toward the (degree, node)-larger endpoint; keep the
    # head's degree so the wedge pair can be π-ordered without a
    # re-join against the degree table
    ori = (
        und.join(du, on="u")
        .join(dv, on="v")
        .select(
            F.when(
                (F.col("_du") < F.col("_dv"))
                | ((F.col("_du") == F.col("_dv")) & (F.col("u") < F.col("v"))),
                F.struct(
                    F.col("u").alias("a"),
                    F.col("v").alias("b"),
                    F.col("_dv").alias("db"),
                ),
            )
            .otherwise(
                F.struct(
                    F.col("v").alias("a"),
                    F.col("u").alias("b"),
                    F.col("_du").alias("db"),
                )
            )
            .alias("e")
        )
        .select("e.a", "e.b", "e.db")
        .persist()
    )
    ori.count()
    w1 = ori.select(F.col("a").alias("p"), F.col("b").alias("x"), F.col("db").alias("dx"))
    w2 = ori.select(F.col("a").alias("p"), F.col("b").alias("y"), F.col("db").alias("dy"))
    wedges = w1.join(w2, on="p").where(
        (F.col("dx") < F.col("dy"))
        | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    )
    closing = ori.select(F.col("a").alias("x"), F.col("b").alias("y"))
    tri = wedges.join(closing, on=["x", "y"]).select("p", "x", "y")
    per_node = (
        tri.select(F.explode(F.array("p", "x", "y")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    out = (
        deg.join(per_node, on="node", how="left")
        .select(
            "node",
            F.col("degree").cast("long").alias("degree"),
            F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"),
            F.when(
                F.col("degree") >= 2,
                F.expr(
                    "(2 * coalesce(triangles, 0) * 1000000)"
                    " div (degree * (degree - 1))"
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("coeff_ppm"),
        )
    )
    return register_intermediates(out, und, deg, ori)


def k_core(
    edges: DataFrame,
    k: int,
    max_rounds: int = 12,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """The k-core of the undirected simple projection of ``edges`` —
    the maximal subgraph in which every node has degree ≥ k — by
    iterative peeling: drop all nodes of degree < k, recompute degrees
    in the induced subgraph, repeat to fixpoint. The crawl-graph use is
    the same as :func:`triangle_count`'s, one notch more global: spam
    link rings and mirror farms sit in deep cores (every member links
    many members), while organic long-tail hosts peel away in the
    first rounds — and "which round a node peeled at" is the standard
    graph-degeneracy quality prior.

    Determinism contract: peeling is MONOTONE (survivor sets only
    shrink), so running exactly R rounds equals the fixpoint whenever
    convergence happens within R — the engine loops to ``max_rounds``
    with an early break on convergence and RAISES if still changing
    (same loud-failure discipline as connected components), while the
    DuckDB oracle unrolls exactly ``max_rounds`` rounds; both see the
    converged set. Returns ``(node, core_degree)`` — degree within the
    final core, all survivors.

    Scale (100 TB): per round, two node-keyed semi-joins (induced edge
    set) + one degree aggregation with map-side partials; the survivor
    table is eagerly localCheckpoint'ed per round (the exponential-
    lineage rule, see ops/dedup.py). Real crawls converge in a handful
    of rounds for small k; max_rounds bounds the worst case loudly
    rather than silently under-peeling.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    und = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .where(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
        .persist()
    )
    und.count()
    survivors = (
        und.select(F.col("u").alias("node"))
        .unionByName(und.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_prev = survivors.count()
    deg = None
    converged = False
    for _ in range(max_rounds):
        live = und.join(
            survivors.select(F.col("node").alias("u")), on="u", how="left_semi"
        ).join(
            survivors.select(F.col("node").alias("v")), on="v", how="left_semi"
        )
        deg = (
            live.select(F.col("u").alias("node"))
            .unionByName(live.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("core_degree"))
            .where(F.col("core_degree") >= k)
        )
        survivors = deg.select("node").localCheckpoint(eager=True)
        n_now = survivors.count()
        if n_now == n_prev:
            converged = True
            break
        n_prev = n_now
    if not converged:
        und.unpersist()
        raise RuntimeError(
            f"k_core did not converge within max_rounds={max_rounds}; "
            f"raise max_rounds (survivors still shrinking at {n_prev})"
        )
    # materialize before releasing the cached edge set: the returned
    # plan must not silently re-derive `und` from scratch at the
    # caller's first action
    out = deg.select(
        "node", F.col("core_degree").cast("long").alias("core_degree")
    ).localCheckpoint(eager=True)
    und.unpersist()
    return out


def trustrank(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "node",
    init: int = 1_000_000,
    base: int = 150_000,
    damping_pct: int = 85,
) -> DataFrame:
    """TrustRank (Gyöngyi, Garcia-Molina & Pedersen, VLDB 2004) — the
    seed-personalized variant of :func:`pagerank` and the classic
    web-spam demotion signal: trust mass originates ONLY at a
    hand-vetted seed set and attenuates along out-links, so spam farms
    — however densely interlinked (high raw PageRank, high
    :func:`triangle_count` density) — collect ~zero trust unless a
    trusted page actually links toward them. Rank gaps between
    PageRank and TrustRank are the spam-mass estimator of the paper.

    Same exact-integer discipline as :func:`pagerank` (bit-identical
    on any engine/partitioning, hash-oracle-checkable): seeds start at
    ``init`` micro-rank and receive the ``base`` teleport each round;
    non-seeds start at 0 and receive no teleport —
    ``rank' = base·[seed] + (damping·incoming) div 100``.

    Scale (100 TB): identical to pagerank — one join + one node-keyed
    aggregation per round over the host-sized projection, label table
    eagerly localCheckpoint'ed per round; the seed flag rides the node
    table (computed once, never re-joined).
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .persist()
    )
    # node set, out-degree and seed flag folded into ONE persisted
    # table (out-degree = sum of src-side flags over the union; the
    # seed set is broadcast-joined once) — one barrier instead of two,
    # and the initial rank table derives from the cache with no eager
    # checkpoint of its own (see pagerank)
    seed_set = seeds.select(F.col(seed_col).alias("node")).distinct()
    flagged = (
        e.select(F.col("src").alias("node"), F.lit(1).alias("_o"))
        .unionByName(e.select(F.col("dst").alias("node"), F.lit(0).alias("_o")))
        .groupBy("node")
        .agg(F.sum("_o").alias("od"))
        .join(F.broadcast(seed_set.withColumn("_s", F.lit(1))), on="node", how="left")
        .select(
            "node", "od",
            F.coalesce("_s", F.lit(0)).cast("long").alias("is_seed"),
        )
    )
    # od and is_seed ride the rank table (see pagerank): one join per
    # round removed, identical integer arithmetic.
    ranks = flagged.select(
        "node", "od", "is_seed",
        (F.lit(init) * F.col("is_seed")).cast("long").alias("rank"),
    )
    for _ in range(iterations):
        contrib = e.join(ranks, on=e.src == ranks.node).select(
            "dst", F.expr("rank div od").alias("c")
        )
        incoming = contrib.groupBy("dst").agg(F.sum("c").alias("inc"))
        new_ranks = (
            ranks.join(incoming, on=ranks.node == incoming.dst, how="left")
            .select(
                "node",
                "od",
                "is_seed",
                (
                    F.lit(base) * F.col("is_seed")
                    + F.expr(f"({damping_pct} * coalesce(inc, 0)) div 100")
                ).cast("long").alias("rank"),
            )
        )
        ranks = new_ranks.localCheckpoint(eager=True)
    e.unpersist()
    return ranks.select("node", "rank")


def cocitation(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    min_common: int = 2,
    max_out: "int | None" = 1000,
) -> DataFrame:
    """Co-citation similarity (Small 1973, the classic "related pages"
    signal): two targets are related when many SOURCES link to both —
    the judgment of the linking web, orthogonal to content similarity
    (:func:`~.webindex.host_mirrors`) and to direct linkage
    (:func:`host_communities`): two competing newspapers never link
    each other and share no text, but thousands of pages cite both.

    Returns ``(dst_a, dst_b, n_common)`` — distinct sources linking to
    both, ``dst_a < dst_b``, filtered to ``n_common >= min_common``.

    Scale (100 TB): the wedge self-join keyed on the SOURCE — the same
    fan-out law as every bucket join in the dedup tier: a source with
    out-degree f emits f(f−1)/2 pairs, so ``max_out`` drops
    link-directory pages (a 10⁵-outlink catalog page alone would emit
    ~5·10⁹ pairs) BEFORE the self-join via one combinable count +
    semi-join — the hot-bucket cap discipline verbatim. The final
    (dst_a, dst_b) count partial-aggregates map-side. ``None`` keeps
    every source (the oracle twin's behavior on bounded fixtures).
    """
    if min_common < 1:
        raise ValueError(f"min_common must be >= 1, got {min_common}")
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    if max_out is not None:
        small = (
            e.groupBy("src")
            .agg(F.count(F.lit(1)).alias("_od"))
            .where(F.col("_od") <= int(max_out))
            .select("src")
        )
        e = e.join(small, on="src", how="left_semi")
    # the self-join would otherwise recompute the distinct (and the
    # cap's semi-join) once per side
    e = e.persist()
    e.count()
    a = e.select("src", F.col("dst").alias("dst_a"))
    b = e.select("src", F.col("dst").alias("dst_b"))
    out = (
        a.join(b, on="src")
        .where(F.col("dst_a") < F.col("dst_b"))
        .groupBy("dst_a", "dst_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .where(F.col("n_common") >= int(min_common))
    )
    from .cache import register_intermediates

    return register_intermediates(out, e)


def spam_mass(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "node",
) -> DataFrame:
    """Relative spam mass (Gyöngyi et al., VLDB 2004 §6) — the share of
    a node's PageRank NOT backed by trust: ``(PR − TR) / PR`` in
    floored basis points. A page can earn high PageRank two ways —
    links from the reputable web (TrustRank follows those, gap ≈ 0) or
    a spam farm's dense interlinking (TrustRank never arrives, gap →
    10⁴). This is the paper's actual demotion signal; :func:`pagerank`
    and :func:`trustrank` are its two halves.

    With this module's integer arithmetic ``TR ≤ PR`` holds
    component-wise by induction (seed-gated teleport ≤ uniform
    teleport, same damping), so ``spam_mass_bp ∈ [0, 10⁴]`` exactly and
    the oracle hash is exact. Returns ``(node, rank, trust,
    spam_mass_bp)``.

    Scale: both rank vectors ride ONE fused iteration over the shared
    distinct edge set — the two loops' per-round updates are
    independent given the previous round's vectors, so each round is
    still one edge join + one node-keyed aggregation (now carrying two
    integer columns instead of one) + one eager checkpoint. Fusing
    halves the round count, computes the distinct edge set and degree
    table once instead of twice, and deletes the final node-keyed
    PR⋈TR join (both vectors already share a row). The integer
    arithmetic per component is verbatim :func:`pagerank` /
    :func:`trustrank`, so the result is bit-identical to the composed
    form (pinned by test).
    """
    init, base, damping_pct = 1_000_000, 150_000, 85
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .persist()
    )
    seed_set = seeds.select(F.col(seed_col).alias("node")).distinct()
    flagged = (
        e.select(F.col("src").alias("node"), F.lit(1).alias("_o"))
        .unionByName(e.select(F.col("dst").alias("node"), F.lit(0).alias("_o")))
        .groupBy("node")
        .agg(F.sum("_o").alias("od"))
        .join(F.broadcast(seed_set.withColumn("_s", F.lit(1))), on="node", how="left")
        .select(
            "node", "od",
            F.coalesce("_s", F.lit(0)).cast("long").alias("is_seed"),
        )
    )
    # od and is_seed RIDE THE RANK TABLE through every checkpoint, so a
    # round needs no per-round join against the degree table: nodes
    # appearing in `e` as src always have od >= 1 (od counts distinct
    # out-edges), so `rank div od` sees exactly the rows the composed
    # form's outdeg join kept.
    ranks = flagged.select(
        "node", "od", "is_seed",
        F.lit(init).cast("long").alias("pr"),
        (F.lit(init) * F.col("is_seed")).cast("long").alias("tr"),
    )
    for _ in range(iterations):
        contrib = e.join(ranks, on=e.src == ranks.node).select(
            "dst",
            F.expr("pr div od").alias("_cp"),
            F.expr("tr div od").alias("_ct"),
        )
        incoming = contrib.groupBy("dst").agg(
            F.sum("_cp").alias("_ip"), F.sum("_ct").alias("_it")
        )
        new_ranks = ranks.join(
            incoming, on=ranks.node == incoming.dst, how="left"
        ).select(
            "node", "od", "is_seed",
            (
                F.lit(base)
                + F.expr(f"({damping_pct} * coalesce(_ip, 0)) div 100")
            ).cast("long").alias("pr"),
            (
                F.lit(base) * F.col("is_seed")
                + F.expr(f"({damping_pct} * coalesce(_it, 0)) div 100")
            ).cast("long").alias("tr"),
        )
        ranks = new_ranks.localCheckpoint(eager=True)
    e.unpersist()
    return ranks.select(
        "node",
        F.col("pr").alias("rank"),
        F.col("tr").alias("trust"),
        F.when(
            F.col("pr") > 0,
            F.expr("((pr - tr) * 10000) div pr"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("spam_mass_bp"),
    )


def reciprocal_links(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-source link reciprocity over the DISTINCT edge set: how many
    of a node's out-links are returned by their target, as
    ``floor(n_mutual * 10000 / n_out)`` basis points. Mutual-link
    density is the classic link-exchange/link-farm tell (reciprocity in
    organic citation graphs is low; paid "links pages" and farm rings
    approach 10⁴) — cheap enough to run corpus-wide as a demotion
    feature next to :func:`spam_mass`, which needs a trusted seed set
    this signal does not.

    Exact integers end-to-end (count, count, one floored div), so the
    DuckDB oracle hash is exact. Self-loops are excluded from both
    numerator and denominator. Returns ``(node, n_out, n_mutual,
    reciprocity_bp)`` for every node with at least one non-self
    out-link.

    Scale (100 TB): dedup to distinct directed host pairs FIRST (the
    page-level multigraph collapses ~10⁹ pages to ~10⁷ host pairs),
    then ONE self-equi-join keyed (dst, src) — co-partitioned with the
    (src, dst) build by symmetric hashing, no broadcast needed — and
    one map-side-combinable aggregation keyed src. A hot hub costs its
    distinct-degree in join rows, never degree², because the probe is
    an equality on the full reversed pair, not a key expansion.
    """
    e = (
        edges
        .select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    mutual = e.join(rev, on=["src", "dst"], how="left_semi").select(
        "src", F.lit(1).alias("is_mutual")
    )
    per_src = (
        e.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("n_out"))
    )
    mut_src = (
        mutual.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("n_mutual"))
    )
    return (
        per_src.join(mut_src, on="src", how="left")
        .select(
            F.col("src").alias("node"),
            "n_out",
            F.coalesce(F.col("n_mutual"), F.lit(0)).cast("long").alias("n_mutual"),
            F.expr(
                "(coalesce(n_mutual, 0) * 10000) div n_out"
            ).cast("long").alias("reciprocity_bp"),
        )
    )


def bibliographic_coupling(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    min_common: int = 2,
    max_in: "int | None" = 1000,
) -> DataFrame:
    """Bibliographic coupling (Kessler 1963) — the structural DUAL of
    :func:`cocitation`: two SOURCES are related when they cite many
    common targets. Where co-citation needs the web to have already
    judged two pages (links pointing AT them accumulate over years),
    coupling works the moment a page is crawled — its out-links are in
    hand — so it is the related-pages signal available for NEW pages,
    and a strong host-level topical-community feature next to
    :func:`host_communities` (which needs direct linkage).

    Implemented AS ``cocitation`` on the transposed edge set — one
    reversed projection, zero new join machinery, so every property
    proved for the co-citation wedge join (pair law, cap-before-join,
    map-side partial aggregation) transfers verbatim. ``max_in`` caps
    target IN-degree on the original graph: a target cited by
    everything (a jquery CDN, a privacy-policy page) carries no
    topical signal and alone would emit f(f−1)/2 pairs — the same
    hot-bucket law, now on the popularity axis.

    Returns ``(src_a, src_b, n_common)`` — distinct shared targets,
    ``src_a < src_b``, ``n_common >= min_common``.
    """
    rev = edges.select(
        F.col(dst_col).alias("src"), F.col(src_col).alias("dst")
    )
    return cocitation(
        rev, min_common=min_common, max_out=max_in
    ).select(
        F.col("dst_a").alias("src_a"),
        F.col("dst_b").alias("src_b"),
        "n_common",
    )


def anchor_entropy(
    links: DataFrame,
    target_col: str = "href",
    anchor_col: str = "anchor",
    min_links: int = 1,
) -> DataFrame:
    """Per-target anchor-text DIVERSITY: Shannon entropy of the anchor
    distribution in integer micro-nats, plus volume — the paid-link /
    anchor-bombing tell :func:`anchor_stats`' modal pick can't see
    (thousands of links all saying the same exact money phrase score
    entropy ~0 at high volume; organic links vary).

    Same quantization discipline as the module's iterations: each
    anchor's term ``-(n/N)·ln(n/N)`` is quantized ONCE to micro-nats,
    then integer-summed — reduction-order-independent, oracle-exact.
    Shape: one (target, anchor) partial agg, one target-keyed totals
    agg, a co-partitioned join of the two (both already keyed on the
    target — no extra exchange), one final target agg.

    Returns ``(href, n_links, n_anchor_texts, entropy_micro)``.
    """
    t, a = F.col(target_col), F.col(anchor_col)
    pair = links.groupBy(t.alias("href"), a.alias("_anchor")).agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    totals = pair.groupBy("href").agg(
        F.sum("_n").alias("_N"),
        F.count(F.lit(1)).cast("long").alias("n_anchor_texts"),
    )
    # totals derives FROM pair, so the join needs explicit aliases to
    # break the shared-lineage attribute ambiguity
    p = F.col("p._n") / F.col("t._N")
    term = F.round(-p * F.log(p) * 1e6).cast("long")
    return (
        pair.alias("p")
        .join(totals.alias("t"), on="href")
        .groupBy("href")
        .agg(
            F.max("t._N").cast("long").alias("n_links"),
            F.max("t.n_anchor_texts").alias("n_anchor_texts"),
            F.sum(term).alias("entropy_micro"),
        )
        .where(F.col("n_links") >= int(min_links))
    )


def neighbor_sample(
    edges: DataFrame,
    k: int,
    src_col: str = "src",
    dst_col: str = "dst",
    salt: str = "nbr",
) -> DataFrame:
    """Deterministic bounded neighborhood sampling: at most ``k``
    out-neighbors per source, chosen by md5 order — the GraphSAGE /
    PinSAGE fan-out step that turns an unbounded adjacency into
    fixed-budget training neighborhoods, and the same primitive that
    caps a crawl frontier's per-host expansion. Hash-ordered rather
    than random so the sample is retry-stable, partitioning-invariant
    and oracle-checkable (the ``sample_stratified`` determinism rule);
    varying ``salt`` yields independent re-samples for multi-epoch
    training.

    Returns ``(src, dst, rnk)`` with ``rnk`` 1..k in hash order —
    downstream multi-hop sampling composes by joining ``dst`` back as
    the next hop's ``src``.

    Scale (100 TB of edges): distinct + one ``row_number() <= k``
    window per src — Spark rewrites it to WindowGroupLimit, a map-side
    partial top-k, so the shuffle carries at most k rows per src per
    input partition even for celebrity nodes (the kmv_sketch shape;
    pinned in tests/test_graph_extras.py).
    """
    if k < 1:
        raise ValueError(f"neighbor_sample needs k >= 1, got {k}")
    from pyspark.sql import Window

    e = (
        edges
        .select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit(salt), F.col("src"), F.col("dst"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy("src").orderBy(h.asc(), F.col("dst").asc())
    return (
        e.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= int(k))
        .select("src", "dst", F.col("rnk").cast("int").alias("rnk"))
    )


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "node",
    base: int = 1_000_000,
    damping_pct: int = 85,
) -> DataFrame:
    """Topic-sensitive / personalized PageRank (Haveliwala 2002): the
    :func:`pagerank` iteration with the teleport mass restricted to a
    SEED set — rank flows outward from trusted nodes only, so scores
    measure proximity-to-seeds rather than global popularity. The
    crawl-pipeline uses: seed-quality propagation for frontier
    prioritization (TrustRank's benign twin — `trustrank` starts from
    judged-good hosts to find spam by its ABSENCE; PPR ranks by
    closeness to ANY chosen seed topic), and related-host expansion
    from a curated allowlist.

    Same exact-integer discipline as :func:`pagerank`: seeds start (and
    re-teleport) at ``base`` micro-units, non-seeds at 0; per round
    each node emits ``rank div outdeg`` along out-edges and collects
    ``(damping_pct · incoming) div 100`` plus its seed base. Unknown
    seed nodes (absent from the edge set) are ignored — they can
    receive no walk and donate nothing. Dangling mass evaporates, as in
    :func:`pagerank` (documented, matches the oracle).

    Returns ``(node, rank)`` after exactly ``iterations`` rounds; a
    node unreachable from every seed reports rank 0 — the useful
    signal (prune it from the frontier), not an error.

    Scale: identical per-round shape to :func:`pagerank` — one
    edge⋈rank join + one combinable agg per round, eager localCheckpoint
    cutting lineage; the seed table is broadcast-sized by construction
    and folded into a boolean column once, BEFORE the loop.
    """
    if iterations < 1:
        raise ValueError(f"personalized_pagerank needs iterations >= 1, got {iterations}")
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .persist()
    )
    sd = seeds.select(F.col(seed_col).alias("node")).distinct()
    # node set, out-degree and seed flag in ONE persisted table (see
    # trustrank) — one barrier instead of two, no init checkpoint
    nodes = (
        e.select(F.col("src").alias("node"), F.lit(1).alias("_o"))
        .unionByName(e.select(F.col("dst").alias("node"), F.lit(0).alias("_o")))
        .groupBy("node")
        .agg(F.sum("_o").alias("od"))
        .join(
            F.broadcast(sd.withColumn("_is_seed", F.lit(1))), on="node", how="left"
        )
        .select(
            "node", "od", F.coalesce("_is_seed", F.lit(0)).alias("_is_seed")
        )
    )
    seed_base = (F.col("_is_seed") * F.lit(int(base))).cast("long")
    # od and _is_seed ride the rank table (see pagerank): one join per
    # round removed, identical integer arithmetic.
    ranks = nodes.select("node", "od", "_is_seed", seed_base.alias("rank"))
    for _ in range(iterations):
        contrib = e.join(ranks, on=e.src == ranks.node).select(
            "dst", F.expr("rank div od").alias("c")
        )
        incoming = contrib.groupBy("dst").agg(F.sum("c").alias("inc"))
        new_ranks = (
            ranks.join(incoming, on=ranks.node == incoming.dst, how="left")
            .select(
                "node",
                "od",
                "_is_seed",
                (
                    seed_base
                    + F.expr(f"({int(damping_pct)} * coalesce(inc, 0)) div 100")
                ).cast("long").alias("rank"),
            )
        )
        ranks = new_ranks.localCheckpoint(eager=True)
    e.unpersist()
    return ranks.select("node", "rank")


def degree_assortativity(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Degree assortativity (Newman's r) of the undirected host graph
    in micro-units — the one-number structural summary the graph tier
    lacks: do high-degree hosts link to other hubs (r > 0, portal/
    directory webs) or to the long tail (r < 0, the hub-and-spoke
    shape organic link graphs and ALSO link farms take)? Read next to
    :func:`reciprocal_links` and :func:`spam_mass`, a corpus whose
    assortativity swings between crawls signals a seed-list or
    frontier-policy change before any per-host score moves.

    Pearson correlation over DEGREE PAIRS at the ends of each
    undirected edge (both orientations counted, the standard
    convention): with j, k the endpoint degrees and M directed edge
    slots, ``r = (M·Σjk − (Σj)²) / (M·Σj² − (Σj)²)`` — by symmetry
    Σj = Σk, so the whole statistic reduces to FOUR integer sums. The
    sums are exact integer aggregation (degrees are longs, products
    land in decimal(38,0)); only the final one-row quotient runs in
    doubles, floored to micro-units — identical in both engines.
    Degenerate graphs (all degrees equal, zero variance) → NULL r.

    Self-loops are excluded; the edge set is deduplicated to distinct
    undirected pairs first (page-level multigraph → host pair set),
    then symmetrized. Returns one row ``(n_nodes, n_edges,
    r_micro)`` where n_edges counts undirected edges.

    Scale (100 TB): distinct-pair dedup is one shuffle; degrees are a
    combinable count over the symmetrized set; the degree table is
    node-sized (≤ 10⁷ hosts vs 10⁹ pages) and joins back onto edges
    twice by key — co-partitioned equi-joins, no broadcast assumption
    needed (though AQE will broadcast it when it fits); the final agg
    is one row. A hot hub costs its degree in join rows, never
    degree².
    """
    und = (
        ensure_parallelism(edges)
        .select(
            F.least(F.col(src_col), F.col(dst_col)).alias("_a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("_b"),
        )
        .where(F.col("_a") != F.col("_b"))
        .distinct()
    )
    sym = und.select(F.col("_a").alias("_u"), F.col("_b").alias("_v")).unionByName(
        und.select(F.col("_b").alias("_u"), F.col("_a").alias("_v"))
    )
    deg = sym.groupBy("_u").agg(F.count(F.lit(1)).cast("long").alias("_d"))
    paired = (
        sym.join(deg, on="_u")
        .select(F.col("_v").alias("_u2"), F.col("_d").alias("_j"))
        .join(deg.select(F.col("_u").alias("_u2"), F.col("_d").alias("_k")), on="_u2")
    )
    sums = paired.agg(
        F.count(F.lit(1)).cast("long").alias("_m"),
        F.sum(F.col("_j").cast("decimal(38,0)") * F.col("_k")).alias("_sjk"),
        F.sum("_j").cast("decimal(38,0)").alias("_sj"),
        F.sum(F.col("_j").cast("decimal(38,0)") * F.col("_j")).alias("_sj2"),
    )
    n_nodes_df = deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    n_edges_df = und.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    num = F.col("_m").cast("double") * F.col("_sjk").cast("double") - (
        F.col("_sj").cast("double") * F.col("_sj").cast("double")
    )
    den = F.col("_m").cast("double") * F.col("_sj2").cast("double") - (
        F.col("_sj").cast("double") * F.col("_sj").cast("double")
    )
    return (
        sums.crossJoin(F.broadcast(n_nodes_df))
        .crossJoin(F.broadcast(n_edges_df))
        .select(
            "n_nodes",
            "n_edges",
            F.when(den != F.lit(0.0), F.floor(F.lit(1000000.0) * num / den))
            .cast("long")
            .alias("r_micro"),
        )
    )


def link_prediction(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    min_shared: int = 1,
    max_pivot_degree: int = 10_000,
) -> DataFrame:
    """Link-prediction scores for NON-adjacent node pairs at distance
    2 over the undirected simple projection: common-neighbor count,
    Adamic–Adar, and neighbor-set Jaccard — the classic "which hosts
    SHOULD be linked" triple behind mirror discovery
    (`host_mirrors` ranks text similarity; this ranks topology) and
    crawl frontier prioritization.

    Adamic–Adar down-weights promiscuous shared neighbors:
    ``aa_micro = Σ_z floor(10⁶ / ln(deg_z))`` — per-term floor, the
    `entropy_rate` ln discipline (a shared neighbor necessarily has
    deg ≥ 2, so ln > 0). ``jaccard_milli = (1000·CN) div
    (deg_a + deg_b − CN)`` is exact integers. Already-adjacent pairs
    are anti-joined out (prediction means NEW links).

    Hub containment: wedges pivot on the shared neighbor, so a
    degree-d pivot fans out d²/2 pairs; pivots with ``deg >
    max_pivot_degree`` are EXCLUDED from pair generation (their AA
    weight ~ 1/ln d is noise anyway) — the documented accuracy trade
    that keeps the self-join alive at web scale; raise the cap when
    the graph is host-sized.

    Returns ``(node_a, node_b, common_neighbors, aa_micro,
    jaccard_milli)`` for pairs with ``CN ≥ min_shared``.

    Scale: distinct-edge + degree rollups, one pivot-keyed self-join
    (fan-out bounded by the cap), one (a,b)-keyed count, one
    broadcast-degree join, one anti-join on the edge table.
    """
    und = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .where(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
    )
    adj = und.select(F.col("u").alias("z"), F.col("v").alias("nb")).unionByName(
        und.select(F.col("v").alias("z"), F.col("u").alias("nb"))
    )
    deg = adj.groupBy("z").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    piv = adj.join(
        deg.where(F.col("deg") <= int(max_pivot_degree)).select(
            "z", F.col("deg").alias("_dz")
        ),
        on="z",
    )
    a = piv.select("z", "_dz", F.col("nb").alias("na"))
    b = piv.select("z", F.col("nb").alias("nb2"))
    wedges = a.join(b, on="z").where(F.col("na") < F.col("nb2"))
    pairs = wedges.groupBy(
        F.col("na").alias("node_a"), F.col("nb2").alias("node_b")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("common_neighbors"),
        F.sum(
            F.expr(
                "CAST(floor(1000000.0 / ln(CAST(_dz AS DOUBLE)))"
                " AS BIGINT)"
            )
        )
        .cast("long")
        .alias("aa_micro"),
    ).where(F.col("common_neighbors") >= int(min_shared))
    new_pairs = pairs.join(
        und.select(
            F.col("u").alias("node_a"), F.col("v").alias("node_b")
        ),
        on=["node_a", "node_b"],
        how="left_anti",
    )
    da = deg.select(F.col("z").alias("node_a"), F.col("deg").alias("_da"))
    db = deg.select(F.col("z").alias("node_b"), F.col("deg").alias("_db"))
    return (
        new_pairs.join(da, on="node_a")
        .join(db, on="node_b")
        .select(
            "node_a",
            "node_b",
            "common_neighbors",
            "aa_micro",
            F.expr(
                "(1000 * common_neighbors)"
                " div (_da + _db - common_neighbors)"
            )
            .cast("long")
            .alias("jaccard_milli"),
        )
    )


def rich_club(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    ks: "Sequence[int]" = (1, 2, 4, 8, 16),
) -> DataFrame:
    """Rich-club coefficient curve φ(k) over the undirected simple
    projection: among nodes of degree > k, what fraction of their
    possible pairwise links exist? A rising φ(k) is the "elite
    interlink" signature — big hosts linking each other far above
    chance (paid link rings read the same way at the top of
    `host_reputation`'s list); a flat curve says the hubs ignore
    each other.

    Exact integers: ``phi_ppm = (2·E_k·10⁶) div (N_k·(N_k−1))`` per
    threshold; N_k < 2 → NULL (no possible pairs).

    Returns one row per k: ``(k, n_nodes, n_edges, phi_ppm)``.

    Scale: distinct-edge + degree rollups once; each threshold is a
    broadcast-degree filter and two counts on the |ks|-expanded
    edge/node tables — |ks| is a handful, the expansion trivial.
    """
    und = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .where(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
    )
    adj = und.select(F.col("u").alias("z")).unionByName(
        und.select(F.col("v").alias("z"))
    )
    deg = adj.groupBy("z").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    kdf = und.sparkSession.createDataFrame(
        [(int(x),) for x in ks], "k long"
    )
    nodes_k = (
        deg.crossJoin(F.broadcast(kdf))
        .where(F.col("deg") > F.col("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    )
    du = deg.select(F.col("z").alias("u"), F.col("deg").alias("_du"))
    dv = deg.select(F.col("z").alias("v"), F.col("deg").alias("_dv"))
    edges_k = (
        und.join(F.broadcast(du), on="u")
        .join(F.broadcast(dv), on="v")
        .crossJoin(F.broadcast(kdf))
        .where((F.col("_du") > F.col("k")) & (F.col("_dv") > F.col("k")))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    )
    return (
        kdf.join(nodes_k, on="k", how="left")
        .join(edges_k, on="k", how="left")
        .select(
            "k",
            F.coalesce("n_nodes", F.lit(0)).cast("long").alias("n_nodes"),
            F.coalesce("n_edges", F.lit(0)).cast("long").alias("n_edges"),
            F.when(
                F.coalesce(F.col("n_nodes"), F.lit(0)) >= 2,
                F.expr(
                    "(2 * coalesce(n_edges, 0) * 1000000)"
                    " div (coalesce(n_nodes, 0)"
                    " * (coalesce(n_nodes, 0) - 1))"
                ),
            )
            .cast("long")
            .alias("phi_ppm"),
        )
    )


def global_transitivity(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Global transitivity (closed-wedge ratio) of the undirected
    simple projection — for the near-dup pair graph this is the
    THRESHOLD SANITY number `dedup_threshold_sweep` can't see: a
    true mirror relation is (nearly) transitive, so a dedup cutoff
    whose pair graph closes few of its wedges (a~b, b~c, a≁c
    everywhere) is clustering topics, not duplicates — lower τ
    verdicts straight from the pair table, before any
    connected-components commitment.

    ``transitivity_ppm = (3·10⁶·T) div W`` with exact longs: W =
    Σ_v d_v(d_v−1)/2 wedges and T from the `triangle_count`
    degree-ordered closure join (each triangle closes exactly once,
    O(√m) fan-out under hub skew — same machinery, global reduction
    instead of per-node). W = 0 → NULL.

    Returns one row: ``(n_nodes, n_edges, n_wedges, n_triangles,
    transitivity_ppm)``.

    Scale: the `triangle_count` shuffles minus the per-node rollup.
    """
    und = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .where(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
        .persist()
    )
    und.count()
    deg = (
        und.select(F.col("u").alias("node"))
        .unionByName(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
        .persist()
    )
    deg.count()
    base = und.join(
        deg.select(F.col("node").alias("u"), F.col("degree").alias("_du")),
        on="u",
    ).join(
        deg.select(F.col("node").alias("v"), F.col("degree").alias("_dv")),
        on="v",
    )
    lower = (F.col("_du") < F.col("_dv")) | (
        (F.col("_du") == F.col("_dv")) & (F.col("u") < F.col("v"))
    )
    ori = base.select(
        F.when(lower, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(lower, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(lower, F.col("_dv")).otherwise(F.col("_du")).alias("_db"),
    )
    w1 = ori.select("a", F.col("b").alias("x"), F.col("_db").alias("_dx"))
    w2 = ori.select("a", F.col("b").alias("y"), F.col("_db").alias("_dy"))
    wedges = w1.join(w2, on="a").where(
        (F.col("_dx") < F.col("_dy"))
        | ((F.col("_dx") == F.col("_dy")) & (F.col("x") < F.col("y")))
    )
    closure = ori.select(
        F.col("a").alias("x"), F.col("b").alias("y")
    )
    tri = wedges.join(closure, on=["x", "y"]).agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )
    stats = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.expr("CAST(sum(degree * (degree - 1) div 2) AS BIGINT)").alias(
            "n_wedges"
        ),
    )
    ecnt = und.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    out = (
        stats.crossJoin(F.broadcast(ecnt))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.when(
                F.col("n_wedges") > 0,
                F.expr("(3000000 * n_triangles) div n_wedges"),
            )
            .cast("long")
            .alias("transitivity_ppm"),
        )
    )
    from .cache import register_intermediates

    # und/deg are persisted with eager counts above; tag them so a
    # long-lived driver's release_intermediates(out) can free them
    # (ADVICE r5: they were untracked, leaking for the session).
    return register_intermediates(out, und, deg)
