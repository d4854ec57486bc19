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
    d = ensure_parallelism(df).select(
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
    d = ensure_parallelism(df).select(
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
