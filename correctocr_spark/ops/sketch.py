"""Mergeable distinct-count sketches: KMV (k-minimum-values) and
HyperLogLog registers, both in exact integer arithmetic.

At 10^12 documents "how many distinct urls / hosts / shingles" is a
first-class question, and exact ``countDistinct`` per group forces a
full shuffle of every key. A sketch answers it with a fixed-size
per-group state that merges associatively — the shape that survives
incremental snapshots and multi-cluster unions. CorrectOCR never faces
this (its corpus is a hand-listed archive, reference
workspace.py:100-141); at web scale it is the cardinality layer under
crawl dashboards and dedup-ratio monitoring.

Determinism contract (same rule as :mod:`.dedup`): all hashing is
``md5`` over strings, truncated to the FIRST 8 hex chars = a 32-bit
integer, so every register / minimum is bit-identical in Spark and
DuckDB and the sketch tables themselves are oracle-checkable. Register
depth uses ``length(bin(x))`` — an exact integer stand-in for
``floor(log2 x) + 1`` in both engines — never float ``log2`` (whose
boundary rounding could diverge cross-engine).

Scale notes:

* :func:`kmv_sketch` keeps the k smallest distinct hashes per group via
  ``row_number() <= k`` — Spark rewrites that to ``WindowGroupLimit``,
  a map-side partial top-k, so the shuffle carries at most k rows per
  group per input partition, not the full distinct key set. Ungrouped
  sketches take the ``orderBy().limit(k)`` TakeOrderedAndProject path
  instead — a global window would funnel every distinct hash through
  one partition.
* :func:`hll_registers` is one groupBy(max) over (group, bucket) —
  map-side combinable, bounded at 2^b rows per group.
* Estimates are integer basis arithmetic (KMV) or one bounded driver
  step over an already-aggregated register table (HLL) — no per-row
  Python anywhere.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import ensure_parallelism

#: Hash domain: first 8 md5 hex chars = 32 bits.
_HASH_SPAN = 1 << 32


def _hash32(key, salt: str = "kmv") -> "F.Column":
    """32-bit integer hash of ``key`` — md5-derived so the DuckDB twin
    ``('0x' || substr(md5(...), 1, 8))::BIGINT`` is bit-identical."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}|"), key.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")


def _groups(group_cols: Union[str, Sequence[str], None]):
    if group_cols is None:
        return []
    if isinstance(group_cols, str):
        return [group_cols]
    return list(group_cols)


def _k_smallest(dist: DataFrame, gs: list, k: int) -> DataFrame:
    """The k smallest ``_h`` per group over a distinct-hash table.

    Grouped: ``row_number() <= k`` — Spark rewrites it to
    WindowGroupLimit, a map-side partial top-k, so the shuffle carries
    at most k rows per group per input partition. Ungrouped: a global
    window would funnel EVERY distinct hash through one partition, so
    use ``orderBy().limit(k)`` instead — TakeOrderedAndProject, the
    distributed per-partition top-k + driver merge of k·P candidates.
    """
    if gs:
        w = Window.partitionBy(*[F.col(g) for g in gs]).orderBy(F.col("_h").asc())
        return (
            dist.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= k)
            .drop("_rn")
        )
    return dist.orderBy(F.col("_h").asc()).limit(k)


def kmv_sketch(
    df: DataFrame,
    key_col: str,
    group_cols: Union[str, Sequence[str], None] = None,
    k: int = 64,
    salt: str = "kmv",
) -> DataFrame:
    """K-minimum-values distinct sketch per group.

    Returns one row per group: ``n_min`` (retained minima, ≤ k),
    ``kth_min`` (the largest retained hash), and ``est_distinct`` —
    exact when the group holds fewer than k distinct keys (the sketch
    IS the distinct set), else the KMV estimator
    ``(k - 1) * 2^32 // kth_min`` in pure integer arithmetic.

    Mergeable: the union's sketch equals re-sketching the k smallest
    of the parts' retained minima (pinned by
    tests/test_sketch_ops.py::test_kmv_merge_equals_union).
    """
    if k < 2:
        raise ValueError(f"kmv_sketch needs k >= 2, got {k}")
    gs = _groups(group_cols)
    d = df.select(
        *gs, _hash32(F.col(key_col), salt).alias("_h")
    )
    # Distinct BEFORE the top-k window: KMV is defined over distinct
    # hash values; duplicates would eat retention slots.
    dist = d.distinct()
    kept = _k_smallest(dist, gs, k)
    agg = kept.groupBy(*gs).agg(
        F.count(F.lit(1)).cast("long").alias("n_min"),
        F.max("_h").alias("kth_min"),
    )
    # Integer division: (k-1)*2^32 fits a BIGINT (k ≤ ~2^31), and the
    # DuckDB twin `((k-1)*4294967296) // kth_min` matches bit-for-bit.
    est = F.when(F.col("n_min") < k, F.col("n_min")).otherwise(
        F.expr(f"CAST(({k - 1} * {_HASH_SPAN}) div kth_min AS BIGINT)")
    )
    return agg.select(
        *gs,
        "n_min",
        "kth_min",
        est.cast("long").alias("est_distinct"),
    )


def kmv_merge(
    sketch_rows: DataFrame,
    group_cols: Union[str, Sequence[str], None],
    k: int,
) -> DataFrame:
    """Merge per-part KMV *retained-minima* tables (columns: groups +
    ``_h``) back into one sketch — take the k smallest distinct hashes
    of the union. Use :func:`kmv_retained` to get the mergeable form.
    """
    gs = _groups(group_cols)
    kept = _k_smallest(sketch_rows.select(*gs, "_h").distinct(), gs, k)
    agg = kept.groupBy(*gs).agg(
        F.count(F.lit(1)).cast("long").alias("n_min"),
        F.max("_h").alias("kth_min"),
    )
    est = F.when(F.col("n_min") < k, F.col("n_min")).otherwise(
        F.expr(f"CAST(({k - 1} * {_HASH_SPAN}) div kth_min AS BIGINT)")
    )
    return agg.select(*gs, "n_min", "kth_min", est.cast("long").alias("est_distinct"))


def kmv_retained(
    df: DataFrame,
    key_col: str,
    group_cols: Union[str, Sequence[str], None] = None,
    k: int = 64,
    salt: str = "kmv",
) -> DataFrame:
    """The mergeable state behind :func:`kmv_sketch`: per group, the k
    smallest distinct 32-bit hashes as rows (groups + ``_h``)."""
    gs = _groups(group_cols)
    d = (
        ensure_parallelism(df)
        .select(*gs, _hash32(F.col(key_col), salt).alias("_h"))
        .distinct()
    )
    return _k_smallest(d, gs, k).select(*gs, "_h")


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_cols: Union[str, Sequence[str], None] = None,
    b: int = 6,
    salt: str = "hll",
) -> DataFrame:
    """HyperLogLog register table: one row per (group, bucket) holding
    the max leading-zero rank observed — the sketch state itself, in
    exact integers, so it oracle-checks cross-engine.

    The 32-bit hash splits into a ``b``-bit bucket (high bits) and a
    ``32-b``-bit remainder ``rest``; the register value is the rank
    ``rho`` = leading zeros of ``rest`` within its field + 1, computed
    as ``(32-b) - length(bin(rest)) + 1`` (``bin`` emits the minimal
    binary string in both engines — no float log2). ``rest == 0`` maps
    to the field-exhausted rank ``32 - b + 1``.

    Mergeable by construction: registers of a union are the
    element-wise max of the parts' registers (groupBy-max is the merge).
    Missing buckets mean register 0 — :func:`hll_estimate` fills them.
    """
    if not 4 <= b <= 16:
        raise ValueError(f"hll_registers needs 4 <= b <= 16, got {b}")
    gs = _groups(group_cols)
    rest_bits = 32 - b
    d = df.select(
        *gs, _hash32(F.col(key_col), salt).alias("_h")
    )
    bucket = F.expr(f"_h div {1 << rest_bits}").cast("int")
    rest = (F.col("_h") % F.lit(1 << rest_bits)).cast("long")
    rho = (
        F.when(rest == 0, F.lit(rest_bits + 1))
        .otherwise(F.lit(rest_bits) - F.length(F.bin(rest)) + 1)
        .cast("int")
    )
    return (
        d.select(*gs, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*gs, "bucket")
        .agg(F.max("rho").alias("register"))
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: Union[str, Sequence[str], None] = None,
    b: int = 6,
) -> DataFrame:
    """Cardinality estimate from a :func:`hll_registers` table.

    One aggregation over the (already tiny) register table: the raw
    HLL estimator ``alpha_m * m^2 / sum(2^-reg)`` with the standard
    small-range linear-counting correction when zero registers remain.
    The indicator sum stays exact by scaling: ``sum(2^(33 - reg))`` is
    an integer (reg ≤ 33), divided out once at the end. Float enters
    only in the final two constants — deterministic IEEE ops over
    exact integers, but this is an ESTIMATE; tests pin tolerance vs
    exact distinct, not a hash (the register table is the oracled
    artifact).
    """
    gs = _groups(group_cols)
    m = 1 << b
    if m >= 128:
        alpha = 0.7213 / (1.0 + 1.079 / m)
    elif m == 64:
        alpha = 0.709
    elif m == 32:
        alpha = 0.697
    else:
        alpha = 0.673
    scale = 33  # max register = (32 - b) + 1 <= 29 for b >= 4
    agg = registers.groupBy(*gs).agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum(F.expr(f"CAST(pow(2, {scale} - register) AS BIGINT)")).alias(
            "_sum_scaled"
        ),
    )
    # Missing (group, bucket) rows are zero registers: each contributes
    # 2^scale to the scaled sum and counts toward the zero-register
    # linear-counting path.
    zeros = (F.lit(m) - F.col("n_buckets")).cast("long")
    sum_scaled = F.col("_sum_scaled") + zeros * F.lit(1 << scale)
    raw = F.lit(alpha * m * m * float(1 << scale)) / sum_scaled.cast("double")
    # Linear counting when raw <= 2.5m and zero registers exist.
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    est = F.when((raw <= 2.5 * m) & (zeros > 0), lc).otherwise(raw)
    return agg.select(
        *gs,
        zeros.alias("zero_registers"),
        F.round(est).cast("long").alias("est_distinct"),
    )


def cms_table(
    df: DataFrame,
    key_col: str,
    group_cols: Union[str, Sequence[str], None] = None,
    depth: int = 4,
    width: int = 1024,
    weight_col: Optional[str] = None,
    salt: str = "cms",
) -> DataFrame:
    """Count-min sketch state: per group, a ``depth x width`` counter
    table as rows ``(groups..., row, bucket, cnt)``.

    The frequency-counting sibling of the cardinality sketches above:
    exact per-key counts over a web-scale key domain (shingles, urls,
    query terms) shuffle EVERY key; the CMS shuffles at most
    ``depth * width`` combinable counters per group and answers point
    queries with the classic one-sided guarantee — estimates never
    undercount, and overcount by <= eps * total mass with probability
    1 - delta at ``width = ceil(e/eps)``, ``depth = ceil(ln 1/delta)``
    (Cormode & Muthukrishnan 2005).

    Determinism contract as the module header: row ``i`` buckets by
    ``md5('{salt}{i}|' || key)`` truncated to 32 bits, mod ``width`` —
    bit-identical in DuckDB, so the sketch table itself is oracled.
    ``weight_col`` (optional, integer) makes it a weighted CMS
    (byte mass, token mass); default weight 1 counts occurrences.

    Mergeable by construction: the union's sketch is the (row, bucket)
    SUM of the parts' sketches (pinned by
    tests/test_sketch_ops.py::TestCms::test_merge_equals_union).

    Scale (100 TB): one depth-bounded literal struct array explodes
    (``depth`` rows per input row — the bounded-fan-out rule of
    path_prefix_census, never a data-dependent Generate) into ONE
    combinable groupBy sum; map-side partials collapse hot keys before
    the Exchange, and the aggregate is hard-bounded at
    ``depth * width`` rows per group.
    """
    if depth < 1:
        raise ValueError(f"cms_table needs depth >= 1, got {depth}")
    if width < 2:
        raise ValueError(f"cms_table needs width >= 2, got {width}")
    gs = _groups(group_cols)
    wt = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    probes = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                (_hash32(F.col(key_col), f"{salt}{i}") % width)
                .cast("int")
                .alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    d = ensure_parallelism(df).select(
        *gs, F.explode(probes).alias("_p"), wt.alias("_w")
    )
    return (
        d.groupBy(*gs, F.col("_p.row").alias("row"), F.col("_p.bucket").alias("bucket"))
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_lookup(
    cms: DataFrame,
    keys: DataFrame,
    key_col: str,
    group_cols: Union[str, Sequence[str], None] = None,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms",
) -> DataFrame:
    """Point-query a :func:`cms_table` sketch for each distinct key in
    ``keys``: ``est = min over rows of cnt[row][bucket_row(key)]``,
    0 for keys whose probes all miss (LEFT join keeps them — a key the
    sketch never saw reports 0, not NULL).

    ``depth``/``width``/``salt`` must match the sketch's build
    parameters — they define the probe grammar.

    Scale: the probe side explodes ``depth`` rows per distinct key and
    joins the sketch on ``(groups, row, bucket)``; the sketch side is
    <= depth * width rows per group, so Spark broadcasts it and the
    probe never shuffles — only the final per-key min aggregates
    (combinable, ``depth`` rows per key). For a zero-shuffle row-local
    form over an ungrouped sketch see :func:`cms_lookup_local`.
    """
    if depth < 1:
        raise ValueError(f"cms_lookup needs depth >= 1, got {depth}")
    gs = _groups(group_cols)
    probes = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                (_hash32(F.col("_key"), f"{salt}{i}") % width)
                .cast("int")
                .alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    k = (
        ensure_parallelism(keys)
        .select(*gs, F.col(key_col).alias("_key"))
        .distinct()
        .select(*gs, "_key", F.explode(probes).alias("_p"))
        .select(
            *gs,
            "_key",
            F.col("_p.row").alias("row"),
            F.col("_p.bucket").alias("bucket"),
        )
    )
    joined = k.join(F.broadcast(cms), on=gs + ["row", "bucket"], how="left")
    return (
        joined.groupBy(*gs, "_key")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est"))
        .select(*gs, F.col("_key").alias(key_col), "est")
    )


def cms_lookup_local(
    cms: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms",
) -> DataFrame:
    """Zero-shuffle point lookup over an UNGROUPED sketch: the
    ``depth x width`` counter table is collected once (bounded by the
    sketch parameters — the same documented-bounded-collect rule as
    pack_shards' bucket offsets) into a dense integer literal, and the
    estimate is row-local ``least`` over ``element_at`` probes — the
    production shape for scoring a firehose of keys against a small
    broadcast sketch without a join or an aggregate.

    Value-identical to :func:`cms_lookup` on the same sketch (pinned by
    tests/test_sketch_ops.py::TestCms::test_local_equals_join); keys
    are NOT deduplicated here (row-local means one output row per
    input row).
    """
    if depth < 1:
        raise ValueError(f"cms_lookup_local needs depth >= 1, got {depth}")
    if depth * width > 1_000_000:
        raise ValueError(
            f"cms_lookup_local collects depth*width = {depth * width} "
            "counters into a literal; that is past the documented bound "
            "(1e6) — use cms_lookup's broadcast join instead"
        )
    extra = [c for c in cms.columns if c not in ("row", "bucket", "cnt")]
    if extra:
        raise ValueError(
            f"cms_lookup_local needs an ungrouped sketch; found extra "
            f"columns {extra} — use cms_lookup with group_cols"
        )
    dense = [[0] * width for _ in range(depth)]
    for r in cms.collect():  # bounded: depth * width rows max
        dense[r["row"]][r["bucket"]] = r["cnt"]
    table = F.array(
        *[
            F.array(*[F.lit(int(c)).cast("long") for c in dense[i]])
            for i in range(depth)
        ]
    )
    est = F.least(
        *[
            F.element_at(
                F.element_at(table, i + 1),
                (_hash32(F.col(key_col), f"{salt}{i}") % width).cast("int") + 1,
            )
            for i in range(depth)
        ]
    )
    return ensure_parallelism(keys).withColumn("est", est.cast("long"))


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    threshold: int,
    depth: int = 4,
    width: int = 1024,
    weight_col: Optional[str] = None,
    salt: str = "cms",
) -> DataFrame:
    """Keys whose CMS estimate reaches ``threshold``: build the sketch,
    probe every distinct key, keep ``est >= threshold``. One-sided by
    the CMS guarantee — no true heavy hitter is ever missed; the
    overcount can admit near-threshold impostors (that is the eps
    tradeoff, sized by ``width``).

    Enumerating distinct keys is the SMALL-DICTIONARY demo form (at
    10^12 rows you don't re-enumerate the key domain you sketched to
    avoid): production probes a bounded CANDIDATE stream — the current
    increment's new keys, a dashboard's watchlist — against the
    broadcast sketch via :func:`cms_lookup` / :func:`cms_lookup_local`,
    which is exactly what this composition does with ``df``'s own
    distinct keys as the candidates.

    Returns ``(key_col, est)``.
    """
    sketch = cms_table(
        df, key_col, depth=depth, width=width, weight_col=weight_col, salt=salt
    )
    looked = cms_lookup(
        sketch, df.select(key_col), key_col, depth=depth, width=width, salt=salt
    )
    return looked.where(F.col("est") >= int(threshold))


def quantile_bins(
    df: DataFrame,
    value_col: str,
    sub_bins: int = 16,
    group_cols: Union[str, Sequence[str], None] = None,
) -> DataFrame:
    """Mergeable LOG-HISTOGRAM quantile sketch — the missing member of
    the sketch family (KMV/HLL count distincts, CMS counts items; this
    holds a whole DISTRIBUTION in ≤ 64·sub_bins counters per group).
    Each non-negative integer value lands in bin ``(e, k)``: octave
    ``e = floor(log2 v)`` computed EXACTLY as the bit length
    (``length(bin(v)) − 1`` — never a float log, so no boundary ulp),
    sub-bin ``k = ((v − 2^e)·S) div 2^e`` (S linear steps per octave →
    relative value error ≤ 1/S). Zero gets octave −1. Merging sketches
    across shards or crawl snapshots is count ADDITION on
    (group, bin_e, bin_k) — the same additive contract as
    ``cms_table`` — so per-shard sketches roll up to the corpus
    distribution without re-scanning.

    Scale: one combinable rollup; output cardinality per group is
    bounded by 64·S regardless of data volume. One row per occupied
    bin: ``(group…, bin_e, bin_k, n)``.
    """
    s = int(sub_bins)
    if s < 1:
        raise ValueError("sub_bins must be ≥ 1")
    gs = _groups(group_cols)
    v = F.col(value_col).cast("long")
    e = (F.length(F.expr(f"bin(CAST({value_col} AS BIGINT))")) - 1).cast(
        "long"
    )
    pow_e = F.expr(
        f"shiftleft(CAST(1 AS BIGINT),"
        f" length(bin(CAST({value_col} AS BIGINT))) - 1)"
    )
    k = F.expr(
        f"((CAST({value_col} AS BIGINT)"
        f" - shiftleft(CAST(1 AS BIGINT),"
        f" length(bin(CAST({value_col} AS BIGINT))) - 1)) * {s})"
        f" div shiftleft(CAST(1 AS BIGINT),"
        f" length(bin(CAST({value_col} AS BIGINT))) - 1)"
    )
    return (
        df
        .where(v.isNotNull() & (v >= 0))
        .select(
            *gs,
            F.when(v == 0, F.lit(-1).cast("long")).otherwise(e).alias("bin_e"),
            F.when(v == 0, F.lit(0).cast("long")).otherwise(k).alias("bin_k"),
        )
        .groupBy(*gs, "bin_e", "bin_k")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def quantile_estimates(
    bins: DataFrame,
    qs_bp: Sequence[int] = (100, 2500, 5000, 7500, 9900),
    sub_bins: int = 16,
    group_cols: Union[str, Sequence[str], None] = None,
) -> DataFrame:
    """Quantile READ over a ``quantile_bins`` sketch (possibly the
    union of many shards' sketches): for each requested quantile q the
    bin containing rank ``ceil(q·N/10000)`` in (bin_e, bin_k) order,
    with its EXACT integer value bounds ``[est_lo, est_hi)`` —
    ``lo = (2^e·(S+k)) div S`` — so the answer is a certified interval
    (true quantile ∈ interval by construction), not a point guess.

    Scale: bins per group are ≤ 64·S, so the cumulative window and the
    grid cross-join are driver-trivial regardless of corpus size. One
    row per (group, q): ``(group…, q_bp, n_rows, bin_e, bin_k,
    est_lo, est_hi)``.
    """
    s = int(sub_bins)
    gs = _groups(group_cols)
    qs = sorted({int(q) for q in qs_bp})
    if not qs or qs[0] < 1 or qs[-1] > 10000:
        raise ValueError("quantiles must be in (0, 10000] basis points")
    spark = bins.sparkSession
    grid = spark.createDataFrame([(q,) for q in qs], "q_bp long")
    merged = bins.groupBy(*gs, "bin_e", "bin_k").agg(
        F.sum("n").cast("long").alias("_n")
    )
    w = (
        Window.partitionBy(*[F.col(g) for g in gs])
        if gs
        else Window.partitionBy()
    ).orderBy("bin_e", "bin_k").rowsBetween(Window.unboundedPreceding, 0)
    wall = (
        Window.partitionBy(*[F.col(g) for g in gs])
        if gs
        else Window.partitionBy()
    ).rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cum = merged.select(
        *gs,
        "bin_e",
        "bin_k",
        F.sum("_n").over(w).alias("_cum"),
        (F.sum("_n").over(w) - F.col("_n")).alias("_prev"),
        F.sum("_n").over(wall).alias("_tot"),
    )
    hit = (
        cum.crossJoin(F.broadcast(grid))
        .withColumn("_target", F.expr("(q_bp * _tot + 9999) div 10000"))
        .where(
            (F.col("_cum") >= F.col("_target"))
            & (F.col("_prev") < F.col("_target"))
        )
    )
    lo = F.when(F.col("bin_e") < 0, F.lit(0)).otherwise(
        F.expr(
            f"(shiftleft(CAST(1 AS BIGINT), CAST(bin_e AS INT))"
            f" * ({s} + bin_k)) div {s}"
        )
    )
    # octaves narrower than S (2^e < S) floor both bounds to the same
    # integer — clamp to lo+1 so the interval stays non-empty and still
    # certified (such a bin can only hold the single integer lo)
    hi = F.when(F.col("bin_e") < 0, F.lit(1)).otherwise(
        F.greatest(
            lo + 1,
            F.expr(
                f"(shiftleft(CAST(1 AS BIGINT), CAST(bin_e AS INT))"
                f" * ({s} + bin_k + 1)) div {s}"
            ),
        )
    )
    return hit.select(
        *gs,
        "q_bp",
        F.col("_tot").cast("long").alias("n_rows"),
        "bin_e",
        "bin_k",
        lo.cast("long").alias("est_lo"),
        hi.cast("long").alias("est_hi"),
    )


def kmv_set_ops(
    df: DataFrame,
    key_col: str,
    group_col: str,
    k: int = 64,
    salt: str = "kmv",
) -> DataFrame:
    """Pairwise set-operation estimates across groups from bottom-k
    (KMV / theta) sketches — the workflow `kmv_sketch` exists FOR:
    "how much vocabulary do en and de share? what's the distinct-URL
    union of source A and source B?" answered from k-row sketches
    instead of an exact distinct-join over the full key stream.

    Per pair (a < b): merge the two retained-minima sets, keep the k
    smallest of the union (the union's own KMV sketch — the merge
    identity `kmv_merge` pins); ``est_union`` is the standard integer
    estimator; intersection uses the ratio estimator counted on the
    union's retained set X: ``est_intersect = (|X ∩ A ∩ B| ·
    est_union) div |X|`` and ``jaccard_milli = 10³·|X ∩ A ∩ B| div
    |X|``. Everything is deterministic pure-integer arithmetic over
    md5-32 hashes — the DuckDB twin is bit-identical, and all divs
    have non-negative numerators.

    Returns one row per group pair: ``(grp_a, grp_b, n_min, kth_min,
    both_minima, est_union, est_intersect, jaccard_milli)``.

    Scale: the ONLY pass over the data is the per-group sketch build
    (distinct + WindowGroupLimit top-k, ≤ k rows out per group per
    partition); every set operation runs on g·k sketch rows — for
    10^12 keys and 100 sources that is 6,400 rows of pair algebra.
    """
    if k < 2:
        raise ValueError(f"kmv_set_ops needs k >= 2, got {k}")
    d = (
        df
        .select(
            F.col(group_col).cast("string").alias("_g"),
            _hash32(F.col(key_col), salt).alias("_h"),
        )
        .distinct()
    )
    ret = _k_smallest(d, ["_g"], k)
    glist = ret.select("_g").distinct()
    pairs = (
        glist.select(F.col("_g").alias("grp_a"))
        .join(
            glist.select(F.col("_g").alias("grp_b")),
            F.col("grp_a") < F.col("grp_b"),
        )
    )
    e = (
        F.broadcast(pairs)
        .join(
            ret,
            (F.col("_g") == F.col("grp_a")) | (F.col("_g") == F.col("grp_b")),
        )
        .groupBy("grp_a", "grp_b", "_h")
        .agg(
            F.max((F.col("_g") == F.col("grp_a")).cast("long")).alias("_ia"),
            F.max((F.col("_g") == F.col("grp_b")).cast("long")).alias("_ib"),
        )
    )
    x = _k_smallest(e, ["grp_a", "grp_b"], k)
    agg = x.groupBy("grp_a", "grp_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_min"),
        F.max("_h").alias("kth_min"),
        F.sum(F.col("_ia") * F.col("_ib")).cast("long").alias("both_minima"),
    )
    est_u = (
        f"CASE WHEN n_min < {k} THEN n_min"
        f" ELSE CAST(({k - 1} * {_HASH_SPAN}) div kth_min AS BIGINT) END"
    )
    return agg.select(
        "grp_a",
        "grp_b",
        "n_min",
        "kth_min",
        "both_minima",
        F.expr(est_u).cast("long").alias("est_union"),
        F.expr(f"(both_minima * ({est_u})) div n_min")
        .cast("long")
        .alias("est_intersect"),
        F.expr("(1000 * both_minima) div n_min")
        .cast("long")
        .alias("jaccard_milli"),
    )


def ams_f2_sketch(
    df: DataFrame,
    key_col: str,
    k: int = 8,
    salt: str = "ams",
) -> DataFrame:
    """AMS (Alon–Matias–Szegedy) F₂ sketch of a key stream — the
    second frequency moment IS the self-join size, so this estimates
    "how big would the (key,key) equi-join blow up?" from k counters
    instead of the exact per-key rollup the planner can't afford at
    10¹² rows. The mergeability twin of `kmv_sketch` (F₀) and
    `cms_sketch` (point counts): each z_j is a plain SUM, so sketches
    of shards ADD.

    Estimator: k independent ±1 hash streams (md5-parity signs — the
    `kmv_sketch` hash discipline, bit-identical in the oracle);
    ``z_j = Σ_v s_j(v)·c_v`` is an exact long and ``z_j²`` is an
    unbiased F₂ estimate; the reported estimate is the exact DOUBLED
    median of the k estimates (`robust_location` idiom). The exact F₂
    rides along from the same rollup, with the estimator's relative
    error in milli — this op doubles as its own calibration harness.

    Returns one row: ``(n_keys, n_rows, f2_exact, est2_med,
    rel_err_milli)`` — est2_med is 2× the median estimate.

    Scale: ONE key rollup (combinable — the only corpus-scale
    shuffle); the k-way sign expansion runs on the DISTINCT-key
    table (k ≤ 16 × vocabulary, not the stream), and the median on k
    rows. Exact-F₂ envelope: Σc² must fit a long (hot key ≤ 3e9).
    """
    if k < 1:
        raise ValueError(f"ams_f2_sketch needs k >= 1, got {k}")
    counts = (
        df.where(F.col(key_col).isNotNull())
        .groupBy(F.col(key_col).cast("string").alias("_v"))
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
    )
    exact = counts.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("_c").cast("long").alias("n_rows"),
        F.sum(F.col("_c") * F.col("_c")).cast("long").alias("f2_exact"),
    )
    js = counts.sparkSession.range(0, int(k)).select(
        F.col("id").cast("long").alias("_j")
    )
    signed = counts.crossJoin(F.broadcast(js)).select(
        "_j",
        (
            (
                F.lit(1)
                - 2
                * (
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.lit(f"{salt}|"),
                                    F.col("_j").cast("string"),
                                    F.lit("|"),
                                    F.col("_v"),
                                )
                            ),
                            1,
                            8,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % 2
                )
            )
            * F.col("_c")
        )
        .cast("long")
        .alias("_s"),
    )
    ests = (
        signed.groupBy("_j")
        .agg(F.sum("_s").cast("long").alias("_z"))
        .select((F.col("_z") * F.col("_z")).cast("long").alias("_e"))
        .groupBy("_e")
        .agg(F.count(F.lit(1)).cast("long").alias("_cnt"))
    )
    w = Window.orderBy("_e").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = ests.select(
        "_e",
        F.sum("_cnt").over(w).alias("_cum"),
        F.sum("_cnt").over(wall).alias("_m"),
    )
    med = cum.agg(
        (
            F.min(
                F.when(
                    F.col("_cum") >= F.expr("(_m + 1) div 2"), F.col("_e")
                )
            )
            + F.min(
                F.when(
                    F.col("_cum") >= F.expr("(_m + 2) div 2"), F.col("_e")
                )
            )
        )
        .cast("long")
        .alias("est2_med")
    )
    return exact.crossJoin(F.broadcast(med)).select(
        "n_keys",
        "n_rows",
        "f2_exact",
        "est2_med",
        F.when(
            F.col("f2_exact") > 0,
            F.expr(
                "CAST(floor(1000.0 * abs(CAST(est2_med AS DOUBLE)"
                " - 2.0 * f2_exact) / (2.0 * CAST(f2_exact AS DOUBLE)))"
                " AS BIGINT)"
            ),
        ).alias("rel_err_milli"),
    )
