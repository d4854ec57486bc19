"""Temporal join operators: as-of join, point-in-time snapshot, and
binned range (interval-containment) join.

The north-rule pages table carries ``(url, warc_ts)`` — a
Common-Crawl-style corpus holds MANY crawls of the same url over time,
and a training-data pipeline needs point-in-time semantics over them:
"the page for this url as of crawl T" (:func:`snapshot_asof`), "for
each record the latest matching state at or before its timestamp"
(:func:`asof_join` — Spark has no built-in for this), and "which
records fall inside which time windows" (:func:`range_join`, which a
naive inequality join turns into a broadcast-nested-loop or cartesian
plan). Each is expressed as a composition of built-in DataFrame ops —
zero UDFs — so the whole plan stays inside whole-stage codegen.

Scale shapes (100 TB framing):

- ``asof_join`` is ONE hash shuffle of ``left ∪ right`` on the join
  keys plus a per-key sort — the sort-merge-join shape without the
  join explosion: the running ``last(payload, ignorenulls)`` window
  carries O(1) state per row, so a key with millions of rows costs
  its sort and nothing more. Skewed keys cost what any key shuffle
  costs; there is no row multiplication to amplify them.
- ``snapshot_asof`` is the same single-shuffle window shape with a
  ``row_number() = 1`` cut; at 10^12 rows the as-of filter is a scan
  predicate (pushed to parquet/Iceberg), and AQE handles stragglers.
- ``range_join`` buckets time into fixed-width bins, explodes each
  interval into the bins it covers (loudly capped — a runaway
  interval fails the job instead of silently exploding), and
  equi-joins points to intervals on (keys, bin). Both sides shuffle
  once on (keys, bin); hot bins are ordinary equi-join skew, which
  AQE's skew-join split handles — unlike the nested-loop plan Spark
  picks for a raw ``p.ts BETWEEN iv.lo AND iv.hi`` predicate, which
  no amount of AQE can save at scale.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import ensure_parallelism

__all__ = [
    "asof_join",
    "snapshot_asof",
    "snapshot_delta",
    "forward_fill",
    "range_join",
]


def _keys(on: Union[str, Sequence[str]]) -> List[str]:
    return [on] if isinstance(on, str) else list(on)


def _epoch(df: DataFrame, col: str):
    """Numeric view of a column for bin/tolerance arithmetic: numerics
    cast to double directly; TIMESTAMP/DATE go through epoch seconds.
    TIMESTAMP_NTZ cannot cast to double, so it routes via TIMESTAMP —
    exact and monotone because :func:`..spark.session.get_spark` pins
    ``spark.sql.session.timeZone`` to UTC (a DST-shifting session zone
    would fold the mapping; keep the UTC pin)."""
    dt = df.schema[col].dataType.simpleString()
    if dt in ("timestamp_ntz", "date"):
        return F.col(col).cast("timestamp").cast("double")
    return F.col(col).cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Union[str, Sequence[str]] = "url",
    left_ts: str = "ts",
    right_ts: Optional[str] = None,
    right_cols: Optional[Sequence[str]] = None,
    tolerance_seconds: Optional[float] = None,
    right_tiebreak: Optional[str] = None,
    how: str = "left",
    suffix: str = "_r",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for every left row, attach the right row with the
    greatest ``right_ts`` satisfying ``right_ts <= left_ts`` within the
    same ``on`` key(s) — inclusive at equality, matching DuckDB's
    ``ASOF JOIN ... ON l.ts >= r.ts`` semantics.
    ``direction="forward"`` flips the match to the EARLIEST right row
    with ``right_ts >= left_ts`` (DuckDB's ``l.ts <= r.ts`` form) —
    same single-shuffle window plan with the sort order reversed.

    Implemented as a tagged union + running-``last`` window rather
    than a join: both sides are stacked with a tag column, hash-
    shuffled ONCE on the key, sorted per key by ``(ts, tag)`` with
    right rows ordered before left rows at equal timestamps, and each
    left row reads ``last(right_payload, ignorenulls=True)`` over the
    unbounded-preceding frame. No join node appears in the plan at
    all (pinned by tests/test_temporal_ops.py::test_asof_plan_shape).

    ``right_cols`` — right columns to carry (default: everything but
    the keys and ``right_ts``); carried columns colliding with a left
    name are suffixed with ``suffix``, as is the matched right
    timestamp itself. ``tolerance_seconds`` nulls the match out when
    ``left_ts - right_ts`` exceeds it (timestamps compare as epoch
    seconds; plain numeric ts columns subtract directly).
    ``right_tiebreak`` — when several right rows share ``(key, ts)``,
    the row with the GREATEST tiebreak value wins; without it that
    pick is partition-order-dependent, so supply one whenever the
    right side is not unique on ``(key, ts)``. ``how``: ``"left"``
    keeps unmatched left rows with null payload, ``"inner"`` drops
    them.

    NULLs follow strict SQL inequality semantics: a NULL key or NULL
    timestamp on either side never matches (right rows with NULLs are
    filtered; left rows with NULLs keep a null payload). Note DuckDB's
    ASOF JOIN differs on one corner — it treats a NULL ordering key as
    comparable-largest and will match NULL-ts to NULL-ts (pinned in
    tests/test_temporal_ops.py::test_asof_null_keys_and_ts_match_sql_semantics).
    """
    if how not in ("left", "inner"):
        raise ValueError(f"asof_join: how must be 'left' or 'inner', got {how!r}")
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"asof_join: direction must be 'backward' or 'forward', got {direction!r}"
        )
    keys = _keys(on)
    rts = right_ts or left_ts
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != rts]
    rts_out = rts + suffix if rts in left.columns else rts
    out_names = [c + suffix if c in left.columns else c for c in right_cols]
    if len(set(out_names + [rts_out])) != len(out_names) + 1:
        raise ValueError(
            f"asof_join: right output columns collide after suffixing: {out_names}"
        )

    pay = F.struct(
        F.col(rts).alias("_rts"),
        *[F.col(c).alias(n) for c, n in zip(right_cols, out_names)],
    )
    pay_type = right.select(pay.alias("p")).schema[0].dataType
    lrow = F.struct(*[F.col(c) for c in left.columns])
    lrow_type = left.select(lrow.alias("l")).schema[0].dataType
    if right_tiebreak is not None:
        tb_type = right.select(right_tiebreak).schema[0].dataType.simpleString()
        r_tb = F.col(right_tiebreak).cast(tb_type)
    else:
        tb_type = "int"
        r_tb = F.lit(0).cast(tb_type)

    l2 = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(tb_type).alias("_tb"),
        lrow.alias("_lrow"),
        F.lit(None).cast(pay_type).alias("_pay"),
    )
    # SQL join semantics: a right row with a NULL key or NULL timestamp
    # can never satisfy `l.key = r.key AND l.ts >= r.ts`. The window
    # partitioning would instead GROUP nulls (making a null-key right
    # row visible to null-key left rows, and a null-ts right row sort
    # before everything and leak into every match) — filter them out so
    # the operator agrees with DuckDB's ASOF JOIN on dirty data.
    right_clean = right.where(F.col(rts).isNotNull())
    for k in keys:
        right_clean = right_clean.where(F.col(k).isNotNull())
    r2 = right_clean.select(
        *[F.col(k) for k in keys],
        F.col(rts).alias("_t"),
        F.lit(0).alias("_tag"),
        r_tb.alias("_tb"),
        F.lit(None).cast(lrow_type).alias("_lrow"),
        pay.alias("_pay"),
    )
    # backward: ascending ts, the running last() is the latest right row
    # at-or-before. forward: DESCENDING ts — the prefix then holds all
    # rows at-or-after, and last() is the EARLIEST of them. Right rows
    # (_tag 0) sort before left rows at equal ts in both directions, so
    # equality stays inclusive; among equal-(key, ts) right rows the
    # greatest tiebreak still wins (_tb ascending, last() takes the max).
    t_order = F.col("_t").asc() if direction == "backward" else F.col("_t").desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(t_order, F.col("_tag").asc(), F.col("_tb").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = (
        l2.unionByName(r2)
        .withColumn("_m", F.last("_pay", ignorenulls=True).over(w))
        .where(F.col("_tag") == 1)
    )
    if tolerance_seconds is not None:
        ts_dt = left.schema[left_ts].dataType.simpleString()
        if ts_dt in ("timestamp_ntz", "date"):
            # NTZ has no direct double cast; route via TIMESTAMP (exact
            # under get_spark's pinned UTC session zone, see _epoch)
            num = lambda c: c.cast("timestamp").cast("double")  # noqa: E731
        else:
            num = lambda c: c.cast("double")  # noqa: E731
        gap = (
            num(F.col("_t")) - num(F.col("_m._rts"))
            if direction == "backward"
            else num(F.col("_m._rts")) - num(F.col("_t"))
        )
        u = u.withColumn(
            "_m", F.when(gap <= F.lit(float(tolerance_seconds)), F.col("_m"))
        )
    if how == "inner":
        u = u.where(F.col("_m").isNotNull())
    return u.select(
        F.col("_lrow.*"),
        F.col("_m._rts").alias(rts_out),
        *[F.col(f"_m.{n}").alias(n) for n in out_names],
    )


def snapshot_asof(
    df: DataFrame,
    key_col: str = "url",
    ts_col: str = "warc_ts",
    as_of=None,
    tiebreak: Optional[str] = None,
) -> DataFrame:
    """Point-in-time snapshot: the latest row per ``key_col`` with
    ``ts_col <= as_of`` (or the overall latest when ``as_of`` is
    None) — "the page for each url as of crawl T" over a multi-crawl
    corpus. ``tiebreak`` (greatest wins) makes the pick deterministic
    when a key has several rows at the winning timestamp.

    One scan-pushed filter + one key-shuffled ``row_number`` window;
    the as-of predicate prunes at the source, so old crawls outside
    the cut are never read on a ts-partitioned table.
    """
    x = df
    if as_of is not None:
        cut = F.lit(as_of).cast(x.schema[ts_col].dataType)
        x = x.where(F.col(ts_col) <= cut)
    order = [F.col(ts_col).desc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).desc())
    w = Window.partitionBy(key_col).orderBy(*order)
    return x.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


def snapshot_delta(
    pages: DataFrame,
    key_col: str = "url",
    ts_col: str = "warc_ts",
    t1=None,
    t2=None,
    fp_col=None,
    tiebreak: Optional[str] = None,
) -> DataFrame:
    """Crawl-to-crawl delta: compare the point-in-time snapshot of a
    multi-crawl pages table as of ``t1`` against the one as of ``t2``
    and classify every key as ``added`` (absent at t1), ``removed``
    (absent at t2 — arises when the table is a bounded per-crawl log,
    not a cumulative one), ``changed`` (fingerprints differ) or
    ``unchanged``. ``fp_col`` is a Column fingerprint expression
    evaluated on each snapshot (default ``md5(text)``); returns
    ``(key, status, ts_1, ts_2, fp_1, fp_2)``.

    Scale shape: two single-shuffle snapshot windows, both hash-
    partitioned on the key, then a full outer join ON that same key —
    Catalyst reuses the windows' output partitioning, so the join adds
    sorts but no third exchange (pinned by
    tests/test_temporal_ops.py::test_snapshot_delta_plan_two_exchanges).
    """
    fp = fp_col if fp_col is not None else F.md5(F.col("text"))

    def side(cut, n: str) -> DataFrame:
        snap = snapshot_asof(pages, key_col=key_col, ts_col=ts_col, as_of=cut, tiebreak=tiebreak)
        return snap.select(
            F.col(key_col).alias("_k"),
            F.col(ts_col).alias(f"ts_{n}"),
            fp.alias(f"fp_{n}"),
        )

    a, b = side(t1, "1"), side(t2, "2")
    joined = a.join(b, on="_k", how="full_outer")
    status = (
        F.when(F.col("fp_1").isNull(), F.lit("added"))
        .when(F.col("fp_2").isNull(), F.lit("removed"))
        .when(F.col("fp_1") == F.col("fp_2"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        F.col("_k").alias(key_col),
        status.alias("status"),
        "ts_1",
        "ts_2",
        "fp_1",
        "fp_2",
    )


def forward_fill(
    df: DataFrame,
    on: Union[str, Sequence[str]] = "url",
    ts_col: str = "ts",
    cols: Optional[Sequence[str]] = None,
    tiebreak: Optional[str] = None,
) -> DataFrame:
    """Per-key forward fill: replace each null in ``cols`` with the
    latest preceding non-null value for the same key, ordered by
    ``ts_col`` (then ``tiebreak``) — the feature-pipeline companion of
    :func:`asof_join` when old and new values live in the SAME table.
    One key shuffle + one sort; every filled column is a running
    ``last(ignorenulls)`` over the same window, so adding columns adds
    no stages.
    """
    keys = _keys(on)
    if cols is None:
        cols = [c for c in df.columns if c not in keys and c != ts_col and c != tiebreak]
    order = [F.col(ts_col).asc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    on: Optional[Union[str, Sequence[str]]] = None,
    max_bins_per_interval: int = 4096,
) -> DataFrame:
    """Interval-containment join: every ``(point, interval)`` pair with
    ``lo_col <= point_col <= hi_col`` (inclusive both ends), optionally
    also equi-matched on ``on`` key(s). Works on timestamps (compared
    as epoch seconds for binning, natively for containment) and plain
    numeric columns alike.

    A raw ``BETWEEN`` join predicate gives Spark no equi-key, so it
    plans a broadcast-nested-loop (or cartesian) — quadratic at scale.
    Here both sides are mapped onto fixed-width bins: a point lands in
    exactly one bin, an interval is exploded into every bin it covers
    (``sequence(floor(lo/w), floor(hi/w))``), and the join is a plain
    equi-join on (keys, bin) with the exact containment re-checked
    after — each qualifying pair is produced exactly once, because the
    point's single bin appears once per interval. An interval covering
    more than ``max_bins_per_interval`` bins fails the job loudly
    (``assert_true``) instead of silently exploding the build side;
    pick ``bin_width`` near the typical interval length so the
    explode factor stays O(1).

    Both input frames must have disjoint column names apart from the
    ``on`` keys (raises otherwise).
    """
    keys = _keys(on) if on is not None else []
    clash = (set(points.columns) & set(intervals.columns)) - set(keys)
    if clash:
        raise ValueError(
            f"range_join: overlapping non-key columns {sorted(clash)}; "
            "rename one side before joining"
        )
    w = float(bin_width)
    if w <= 0:
        raise ValueError("range_join: bin_width must be positive")
    p_bin = F.floor(_epoch(points, point_col) / w).cast("long")
    lo_b = F.floor(_epoch(intervals, lo_col) / w).cast("long")
    hi_b = F.floor(_epoch(intervals, hi_col) / w).cast("long")
    pb = points.withColumn("_bin", p_bin)
    iv = intervals.withColumn("_lo_b", lo_b).withColumn("_hi_b", hi_b)
    # assert_true folds into the row pipeline: the guard cannot be
    # pruned away because _hi_b is read through it
    guarded_hi = F.when(
        F.assert_true(
            F.col("_hi_b") - F.col("_lo_b") < F.lit(int(max_bins_per_interval)),
            F.concat(
                F.lit(
                    f"range_join: interval spans > {max_bins_per_interval} bins "
                    f"of width {w}; raise bin_width or max_bins_per_interval "
                    "(offending lo="
                ),
                F.col(lo_col).cast("string"),
                F.lit(" hi="),
                F.col(hi_col).cast("string"),
                F.lit(")"),
            ),
        ).isNull(),
        F.col("_hi_b"),
    )
    ivx = (
        iv.withColumn("_bin", F.explode(F.sequence(F.col("_lo_b"), guarded_hi)))
        .drop("_lo_b", "_hi_b")
    )
    return (
        pb.join(ivx, on=keys + ["_bin"], how="inner")
        .where((F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col)))
        .drop("_bin")
    )


def page_change_ratio(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Per-URL CONTENT CHURN between two crawl snapshots — the signal
    that prices refetch frequency (a page that never changes is crawled
    monthly; a news index hourly) and that :func:`snapshot_delta`'s
    boolean changed-flag can't grade: change is measured as 1 − Jaccard
    over the two versions' DISTINCT non-blank normalized line sets, in
    floored basis points. Pages present on one side only are 'added' /
    'removed' at 10000 bp; both-empty pages are 'unchanged'.

    Returns ``(url, n_lines_old, n_lines_new, n_common, change_bp,
    status)`` for the UNION of both snapshots' urls.

    Scale shape: line explode + md5 per side at scan speed, one
    (url, line-key) aggregation with map-side partials folding both
    sides at once, one url-keyed rollup, one url-universe outer join —
    all shuffles keyed by url (and the line key), never a pairwise
    form. At 10¹² pages both snapshots are url-partitioned Iceberg
    tables, so every stage is a co-located merge.
    """

    def _lines(df: DataFrame, o: int, n: int) -> DataFrame:
        base = df.select(
            F.col(url_col).alias("url"), F.split(F.col(text_col), "\n").alias("_ls")
        ).select("url", F.explode("_ls").alias("_line"))
        return (
            base.where(F.trim("_line") != "")
            .select("url", F.md5(F.lower(F.trim("_line"))).alias("_lk"))
            .distinct()
            .select("url", "_lk", F.lit(o).alias("_o"), F.lit(n).alias("_n"))
        )

    merged = (
        _lines(old, 1, 0)
        .unionByName(_lines(new, 0, 1))
        .groupBy("url", "_lk")
        .agg(F.max("_o").alias("_io"), F.max("_n").alias("_in"))
        .groupBy("url")
        .agg(
            F.sum("_io").alias("_n_old"),
            F.sum("_in").alias("_n_new"),
            F.sum(F.col("_io") * F.col("_in")).alias("_n_common"),
        )
    )
    urls = (
        old.select(F.col(url_col).alias("url")).distinct()
        .select("url", F.lit(1).alias("_po"))
        .join(
            new.select(F.col(url_col).alias("url")).distinct()
            .select("url", F.lit(1).alias("_pn")),
            on="url",
            how="full_outer",
        )
    )
    j = urls.join(merged, on="url", how="left").select(
        "url",
        F.coalesce("_po", F.lit(0)).alias("_po"),
        F.coalesce("_pn", F.lit(0)).alias("_pn"),
        F.coalesce("_n_old", F.lit(0)).cast("long").alias("n_lines_old"),
        F.coalesce("_n_new", F.lit(0)).cast("long").alias("n_lines_new"),
        F.coalesce("_n_common", F.lit(0)).cast("long").alias("n_common"),
    )
    union_sz = F.col("n_lines_old") + F.col("n_lines_new") - F.col("n_common")
    change = (
        F.when(union_sz > 0,
               F.lit(10000) - F.expr("(n_common * 10000) div "
                                     "(n_lines_old + n_lines_new - n_common)"))
        .otherwise(
            F.when((F.col("_po") == 1) & (F.col("_pn") == 1), F.lit(0))
            .otherwise(F.lit(10000))
        )
        .cast("long")
    )
    return j.select(
        "url",
        "n_lines_old",
        "n_lines_new",
        "n_common",
        change.alias("change_bp"),
        F.when(F.col("_po") == 0, F.lit("added"))
        .when(F.col("_pn") == 0, F.lit("removed"))
        .when(change == 0, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    )


def crawl_freshness(
    pages: DataFrame,
    as_of,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    stale_after_days: int = 30,
    tiebreak: Optional[str] = None,
) -> DataFrame:
    """Per-host crawl FRESHNESS report as of a cutoff: over each url's
    latest snapshot at or before ``as_of``, the age distribution that
    prices the refetch budget — :func:`page_change_ratio` says how fast
    a page churns, this says how stale our copy already is; together
    they schedule the recrawl. Returns ``(host, n_urls,
    median_age_days, max_age_days, stale_urls, stale_share_bp)`` where
    a url is stale when its age exceeds ``stale_after_days``.

    Exactness: ages floor to integer days from epoch seconds (UTC
    session pin, see ``_epoch``); the median is the standard linearly
    interpolated exact percentile (identical definition both engines);
    shares are floored basis points.

    Scale shape: one url-keyed ``row_number`` window (the same
    latest-per-key shuffle ``snapshot_asof`` is; the as-of predicate
    prunes old crawls at the scan on a ts-partitioned table), then
    row-local host + age algebra and ONE host-keyed agg with map-side
    partials. No percentile over raw pages — ages reduce per url first.
    """
    from .filters import host_col

    latest = snapshot_asof(
        pages, key_col=url_col, ts_col=ts_col, as_of=as_of, tiebreak=tiebreak
    )
    cut = F.lit(as_of).cast(pages.schema[ts_col].dataType).cast("timestamp").cast("double")
    age = F.floor((cut - _epoch(latest, ts_col)) / F.lit(86400.0)).cast("long")
    aged = latest.select(
        host_col(url_col).alias("host"), age.alias("age_days")
    )
    return (
        aged.groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.round(F.percentile("age_days", F.lit(0.5)), 6).alias("median_age_days"),
            F.max("age_days").cast("long").alias("max_age_days"),
            F.sum(
                F.when(F.col("age_days") > int(stale_after_days), 1).otherwise(0)
            ).cast("long").alias("stale_urls"),
        )
        .select(
            "host",
            "n_urls",
            "median_age_days",
            "max_age_days",
            "stale_urls",
            F.expr("(stale_urls * 10000) div greatest(n_urls, 1)")
            .cast("long")
            .alias("stale_share_bp"),
        )
    )


def recrawl_intervals(
    snaps: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    group_col: Optional[str] = None,
    bucket_days: Sequence[int] = (1, 7, 30),
) -> DataFrame:
    """Histogram of gaps between consecutive snapshots of the same url
    — the recrawl-cadence distribution a refetch scheduler budgets
    with (:func:`crawl_freshness` prices staleness at a cutoff; this
    prices how often the crawler actually came back).

    Each url's snapshots sort once in a url-partitioned lag window
    (url-hash keyed, the flagship's balanced partitioning), the gap in
    seconds buckets into ``<=1d / <=7d / <=30d / >30d`` day bins (half
    -open, label = first fitting bound), and one map-side-combinable
    count rolls up per (group?, bucket). Urls seen once contribute
    nothing.

    Returns ``(group?, bucket, n_gaps)``.
    """
    from pyspark.sql import Window

    gs = [group_col] if group_col else []
    ep = _epoch(snaps, ts_col)
    w = Window.partitionBy(F.col(url_col)).orderBy(ep.asc(), F.col(url_col))
    gap = (ep - F.lag(ep, 1).over(w)).alias("_gap")
    d = snaps.select(*gs, F.col(url_col), gap).where(F.col("_gap").isNotNull())
    bounds = sorted(int(b) for b in bucket_days)
    # nest when() so the SMALLEST fitting bound labels the gap
    bucket = F.lit(f">{bounds[-1]}d")
    for b in reversed(bounds):
        bucket = F.when(F.col("_gap") <= b * 86400, F.lit(f"<={b}d")).otherwise(
            bucket
        )
    return (
        d.groupBy(*gs, bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_gaps"))
    )


def rate_anomalies(
    events: DataFrame,
    entity_col: str = "host",
    ts_col: str = "ts",
    baseline_days: int = 7,
    z_milli_threshold: int = 2000,
) -> DataFrame:
    """Per-entity daily-rate burst detection — the crawl-ops storm/trap
    alarm: a host whose fetch count suddenly towers over its own
    trailing baseline is a crawler trap, a misbehaving frontier shard,
    or a site restructure flooding the queue. Day counts per entity,
    then each day's z-score against the ``baseline_days`` OBSERVED days
    immediately preceding it (row-based trailing window — silent days
    don't pad the baseline; a sparse host's baseline is its active
    days, documented).

    Integer-exact (the embedding_outliers moments discipline):
    ``mean = Σx div n``, ``var = (n·Σx² − (Σx)²) div n²``, ``std =
    max(floor(sqrt(var)), 1)``, ``z_milli = (x − mean)·1000 div std``.
    Only BURSTS are reported (``x > mean``), which also keeps every
    ``div`` numerator non-negative — truncation equals floor equals the
    DuckDB twin; the quiet side is a different question (freshness
    decay — `crawl_freshness`). Days with fewer than ``baseline_days``
    preceding observations emit nothing (no baseline, no verdict).
    sqrt enters through a double cast — exact below 2^53, far above
    any daily count².

    Day keys are INTEGER epoch days (no engine date-type in the
    output). Returns ``(entity, epoch_day, n_events, mean_trailing,
    z_milli)`` for rows at or above the threshold.

    Scale: one (entity, day) combinable count — the corpus' only
    full-size shuffle — then entity-keyed windows on the per-day table
    (≤ days·entities rows); no partitionless window.
    """
    if baseline_days < 1:
        raise ValueError(
            f"rate_anomalies needs baseline_days >= 1, got {baseline_days}"
        )
    daily = (
        events
        .select(
            F.col(entity_col).alias("entity"),
            F.datediff(F.to_date(F.col(ts_col)), F.lit("1970-01-01"))
            .cast("long")
            .alias("epoch_day"),
        )
        .groupBy("entity", "epoch_day")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    w = (
        Window.partitionBy("entity")
        .orderBy("epoch_day")
        .rowsBetween(-int(baseline_days), -1)
    )
    with_stats = daily.select(
        "entity",
        "epoch_day",
        "n_events",
        F.count(F.lit(1)).over(w).cast("long").alias("_k"),
        F.sum("n_events").over(w).cast("long").alias("_s"),
        F.sum(F.col("n_events") * F.col("n_events")).over(w)
        .cast("long")
        .alias("_s2"),
    ).where(F.col("_k") == int(baseline_days))
    mean = "(_s div _k)"
    var = "((_k * _s2 - _s * _s) div (_k * _k))"
    std = f"greatest(CAST(floor(sqrt(CAST({var} AS DOUBLE))) AS BIGINT), 1)"
    z = F.expr(f"((n_events - {mean}) * 1000) div {std}")
    return (
        with_stats.where(F.col("n_events") > F.expr(mean))
        .select(
            "entity",
            "epoch_day",
            "n_events",
            F.expr(mean).cast("long").alias("mean_trailing"),
            z.cast("long").alias("z_milli"),
        )
        .where(F.col("z_milli") >= int(z_milli_threshold))
    )


def retention_plan(
    snapshots: DataFrame,
    on: Union[str, Sequence[str]] = "url",
    ts_col: str = "epoch_day",
    as_of: int = None,
) -> DataFrame:
    """Exponential snapshot thinning — the archive retention policy
    behind "keep everything recent, one per doubling of age beyond":
    a url recrawled daily for years carries hundreds of near-identical
    snapshots, and storage planning wants the newest, plus one
    representative per age octave (1-day, 2-3, 4-7, 8-15, ... days
    old), the rest marked droppable. Age buckets are
    ``length(bin(age + 1))`` — the exact integer ``floor(log2)+1``
    both engines share — and the NEWEST snapshot in each (key, bucket)
    is kept. Timestamp ties keep ALL tied-newest rows (a max
    comparison, not an arbitrary row_number election — deterministic,
    and over-retention is the safe failure for a deletion plan).
    ``as_of`` is the integer day the plan is computed at; snapshots
    dated after it get age 0 (bucket 1), never negative ages.

    Output: every input row plus ``(age, bucket, keep)`` — a PLAN, not
    a filter: the caller audits `keep = false` mass before deleting.

    Scale: one keyed window partitioned by (key, bucket) — no global
    window, no corpus-sized state.
    """
    if as_of is None:
        raise ValueError("retention_plan needs an explicit as_of day")
    keys = _keys(on)
    ts = F.col(ts_col).cast("long")
    age = F.greatest(F.lit(int(as_of)) - ts, F.lit(0))
    base = snapshots.select(
        *keys,
        ts.alias(ts_col),
        age.cast("long").alias("age"),
        F.length(F.bin(age + 1)).cast("long").alias("bucket"),
    )
    w = Window.partitionBy(*keys, "bucket")
    return base.withColumn(
        "keep", (F.col(ts_col) == F.max(ts_col).over(w)).cast("boolean")
    )


def status_transitions(
    snapshots: DataFrame,
    on: Union[str, Sequence[str]] = "url",
    ts_col: str = "epoch_day",
    status_col: str = "status",
) -> DataFrame:
    """Crawl-to-crawl HTTP status transition matrix — the corpus-level
    link-rot / soft-404 drift monitor: per key, order snapshots by
    time, pair each status with its predecessor (lag), and count
    transitions. ``share_bp`` normalizes each row per FROM-status
    (integer basis points), so "of pages that were 200, how many went
    404 next crawl" reads straight off the row. First snapshots have
    no predecessor and are excluded (a transition needs two ends).

    Scale: one keyed lag window (partitioned by the key — never
    global) + one combinable pair count; the share window runs on the
    TRANSITION-cardinality table (status² rows at most).
    """
    keys = _keys(on)
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc())
    pairs = (
        snapshots
        .select(*keys, F.col(ts_col), F.col(status_col).alias("_to"))
        .withColumn("_from", F.lag("_to").over(w))
        .where(F.col("_from").isNotNull())
    )
    counts = pairs.groupBy(
        F.col("_from").alias("from_status"), F.col("_to").alias("to_status")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    wf = Window.partitionBy("from_status")
    return counts.select(
        "from_status",
        "to_status",
        "n",
        F.expr("(10000 * n)").cast("long").alias("_num"),
        F.sum("n").over(wf).cast("long").alias("_den"),
    ).select(
        "from_status",
        "to_status",
        "n",
        F.expr("_num div _den").cast("long").alias("share_bp"),
    )


def paragraph_diff(
    old: DataFrame,
    new: DataFrame,
    on: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Paragraph-level DIFF between two crawl snapshots of the same
    urls — the block-granular complement of ``snapshot_delta`` (which
    classifies whole documents as changed/unchanged): per url, how many
    ``\\n\\n`` paragraphs were kept, added, removed, and the resulting
    churn share. Separates "the article text changed" from "only the
    sidebar rotated" — the signal recrawl scheduling actually wants,
    and the audit for an extractor upgrade (templates should churn,
    content should not).

    Set semantics per url (paragraphs DISTINCT within each side, empty
    blocks dropped): kept = |old ∩ new|, added = |new ∖ old|,
    removed = |old ∖ new|; ``churn_bp = (10000·(added+removed)) div
    union``. Urls present in only one snapshot count as all-removed /
    all-added.

    Scale: one distinct projection per side, one (url, para)-keyed
    full-outer join (co-located on the join key), one combinable per-
    url rollup — no window, no collect. One row per url:
    ``(url, n_old, n_new, kept, added, removed, churn_bp)``.
    """

    def side(df: DataFrame, name: str) -> DataFrame:
        paras = F.split(F.coalesce(F.col(text_col), F.lit("")), r"\n\n")
        return (
            ensure_parallelism(df)
            .select(F.col(on).alias("_u"), F.explode(paras).alias("_p"))
            .where(F.trim(F.col("_p")) != "")
            .distinct()
            .withColumn(name, F.lit(1))
        )
    o = side(old, "_in_old")
    n = side(new, "_in_new")
    joined = o.join(n, on=["_u", "_p"], how="full").select(
        "_u",
        F.coalesce("_in_old", F.lit(0)).alias("_io"),
        F.coalesce("_in_new", F.lit(0)).alias("_in"),
    )
    agg = joined.groupBy("_u").agg(
        F.sum("_io").cast("long").alias("n_old"),
        F.sum("_in").cast("long").alias("n_new"),
        F.sum(F.col("_io") * F.col("_in")).cast("long").alias("kept"),
        F.sum((1 - F.col("_io")) * F.col("_in")).cast("long").alias("added"),
        F.sum(F.col("_io") * (1 - F.col("_in"))).cast("long").alias("removed"),
    )
    return agg.select(
        F.col("_u").alias(on),
        "n_old",
        "n_new",
        "kept",
        "added",
        "removed",
        F.expr("(10000 * (added + removed)) div (kept + added + removed)")
        .cast("long")
        .alias("churn_bp"),
    )


def survival_curve(
    spans: DataFrame,
    duration_col: str = "duration",
    event_col: str = "event",
) -> DataFrame:
    """Kaplan-Meier / Nelson-Aalen page-survival curve over subject
    lifetimes with right-censoring — the crawl-planning question
    `crawl_freshness` and `recrawl_intervals` stop short of: "what
    fraction of pages is still alive D days after first sight?", asked
    over a corpus where most pages are STILL alive at the horizon
    (censored), so a naive mean/median lifetime is biased low exactly
    on the long-lived mass that matters. The product-limit estimator
    is the standard unbiased answer under independent censoring.

    Input is one row per subject: an integer ``duration`` (time units
    observed, e.g. epoch-day span) and a boolean/int ``event`` (1 =
    death observed at that duration, 0 = right-censored there). At
    each distinct EVENT time t (standard KM: censoring times between
    events shift the risk set but emit no row): ``n_risk`` = subjects
    with duration >= t, ``n_events``/``n_censored`` = counts exactly
    at t.

    Integer-exact (the `rate_anomalies` / `unigram_lm` discipline):
    per-step hazard ``hazard_micro = (1e6*d) div n`` and log-survival
    step ``floor(1e6*ln(n/(n-d)))`` are quantized FIRST, then the
    cumulative sums are INTEGER sums ordered by t — no float
    accumulation order anywhere. ``cumhaz_micro`` is Nelson-Aalen in
    micro-units; ``km_micro = floor(1e6*exp(-neglog/1e6))`` re-exposes
    the curve on the probability scale (one exp per emitted row, both
    engines IEEE-double on the same integer argument). When the last
    risk set dies entirely (n == d) the log step is undefined and the
    curve hits hard zero: km_micro = 0, neglog carried as NULL from
    that step on (documented, matches the textbook estimate S(t)=0).

    Scale: one combinable ``groupBy(duration)`` rollup — the only
    full-size shuffle — then a single-partition ordered cumsum over
    the per-duration table, whose size is bounded by the TIME RANGE in
    units (a few thousand days), not the corpus; same bounded-window
    rationale as `status_transitions`. Returns ``(t, n_risk, n_events,
    n_censored, hazard_micro, cumhaz_micro, km_micro)`` at event times
    ascending.
    """
    per_t = (
        ensure_parallelism(spans)
        .select(
            F.col(duration_col).cast("long").alias("t"),
            F.col(event_col).cast("int").alias("_e"),
        )
        .groupBy("t")
        .agg(
            F.sum("_e").cast("long").alias("_d"),
            F.sum(1 - F.col("_e")).cast("long").alias("_c"),
        )
    )
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    at_risk = per_t.select(
        "t",
        "_d",
        "_c",
        (
            F.sum(F.col("_d") + F.col("_c")).over(
                Window.orderBy("t").rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
            - F.coalesce(F.sum(F.col("_d") + F.col("_c")).over(w), F.lit(0))
        )
        .cast("long")
        .alias("_n"),
    )
    stepped = at_risk.select(
        "t",
        "_d",
        "_c",
        "_n",
        F.expr("(1000000 * _d) div _n").cast("long").alias("_h"),
        F.when(
            F.col("_n") > F.col("_d"),
            F.floor(
                F.lit(1000000.0)
                * (
                    F.log(F.col("_n").cast("double"))
                    - F.log((F.col("_n") - F.col("_d")).cast("double"))
                )
            ),
        ).alias("_s"),
    )
    wcum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    # a NULL step (curve hit zero) poisons every later cumsum via a
    # max-carried zero flag, not via NULL-skipping sum semantics
    cum = stepped.select(
        "t",
        "_d",
        "_c",
        "_n",
        "_h",
        F.sum("_h").over(wcum).cast("long").alias("cumhaz_micro"),
        F.sum(F.coalesce("_s", F.lit(0))).over(wcum).cast("long").alias("_neglog"),
        F.max(F.when(F.col("_s").isNull() & (F.col("_d") > 0), 1).otherwise(0))
        .over(wcum)
        .alias("_dead"),
    )
    return (
        cum.where(F.col("_d") > 0)
        .select(
            "t",
            F.col("_n").alias("n_risk"),
            F.col("_d").alias("n_events"),
            F.col("_c").alias("n_censored"),
            F.col("_h").alias("hazard_micro"),
            "cumhaz_micro",
            F.when(F.col("_dead") == 1, F.lit(0))
            .otherwise(
                F.floor(
                    F.lit(1000000.0)
                    * F.exp(-F.col("_neglog").cast("double") / F.lit(1000000.0))
                )
            )
            .cast("long")
            .alias("km_micro"),
        )
        .orderBy("t")
    )


def seasonality(
    events: DataFrame,
    ts_col: str = "ts",
) -> DataFrame:
    """Day-of-week × hour crawl seasonality grid with a per-cell
    uniformity χ² term — the fetch-rate heatmap behind politeness and
    capacity planning (`rate_anomalies` finds per-host bursts; this
    shows the CORPUS clock: nightly-batch sources, weekday-only CMS
    publishes, crawler-induced harmonics). Each (dow, hour) cell gets
    its count, share, and its χ² term against the uniform 1/168
    expectation, so both the heatmap and the "is the clock flat"
    number read from one table (total χ² = Σ terms, a SQL-side sum).

    Integer-exact: ``share_bp = 10⁴·n div N`` and the per-cell term
    in milli via cross-multiplication — ``(1000·(168·O − N)²) div
    (168·N)`` in decimal(38,0) (the contingency_chi2 floored-term
    discipline; bias ≤ 1 milli per occupied cell). Day-of-week is
    ISO (1 = Monday), hours 0-23, both integers — no engine date
    type in the output. Cells with zero events are absent (the χ²
    contribution of an empty cell, N/168, is derivable from N and
    the occupied-cell count; emitting 168 constant rows adds nothing
    the reader can't).

    Scale: ONE combinable (dow, hour) rollup — at most 168 output
    rows regardless of corpus size — plus a broadcast 1-row total.
    Output: ``(dow, hour, n_events, share_bp, chi2_term_milli)``.
    """
    cells = (
        events
        .select(
            (((F.dayofweek(F.col(ts_col)) + 5) % 7) + 1)
            .cast("int")
            .alias("dow"),
            F.hour(F.col(ts_col)).cast("int").alias("hour"),
        )
        .groupBy("dow", "hour")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    tot = cells.agg(F.sum("n_events").cast("long").alias("_N"))
    return cells.crossJoin(F.broadcast(tot)).select(
        "dow",
        "hour",
        "n_events",
        F.expr("(10000 * n_events) div _N").cast("long").alias("share_bp"),
        F.expr(
            "(1000 * (168 * CAST(n_events AS DECIMAL(38,0)) - _N)"
            " * (168 * CAST(n_events AS DECIMAL(38,0)) - _N))"
            " div (168 * CAST(_N AS DECIMAL(38,0)))"
        )
        .cast("long")
        .alias("chi2_term_milli"),
    )


def runs_test(
    df: DataFrame,
    group_col: str,
    order_col: str,
    pass_col: str,
) -> DataFrame:
    """Wald–Wolfowitz runs test of gate outcomes in fetch order, per
    group — the batch-effect detector the RATE monitors miss: a
    source whose keep-rate is a steady 50% can still deliver its
    passes in long blocks (a CMS section crawled contiguously, a
    mid-crawl extractor regression, a queue serving one template at a
    time), which breaks every downstream assumption of
    within-source exchangeability (split leakage, stratified-sample
    validity, shard balance). Too FEW runs = clustered outcomes; too
    many = alternation (interleaved dual pipelines).

    Exact integer statistic: with n1 passes, n0 fails, N = n1+n0 and
    R observed runs, ``z² = (N·(R−1) − 2·n1·n0)²·(N−1) /
    (2·n1·n0·(2·n1·n0 − N))`` — the textbook mean/variance folded to
    one integer quotient (decimal(38,0) products), ``z2_milli`` with
    the usual 1000 scale, ``direction`` = sign(N(R−1) − 2n1n0)
    (−1 = clustering). One-sided outcomes (n1 = 0 or n0 = 0) and the
    N = 1 edge → NULL. ``order_col`` must order rows uniquely within
    a group (doc_id / event_id); ties would make R engine-dependent,
    so the caller supplies a total order.

    Scale: one keyed lag window (the `status_transitions` shape —
    partition by group, never partitionless) plus one combinable
    group agg. Output per group: ``(grp, n, n_pass, runs, direction,
    z2_milli)``.
    """
    g = F.col(group_col).cast("string")
    w = Window.partitionBy("grp").orderBy("_ord")
    base = ensure_parallelism(df).select(
        g.alias("grp"),
        F.col(order_col).cast("long").alias("_ord"),
        F.col(pass_col).cast("boolean").cast("int").alias("_e"),
    )
    lagged = base.select(
        "grp",
        "_e",
        F.when(
            F.lag("_e").over(w).isNull() | (F.lag("_e").over(w) != F.col("_e")),
            1,
        )
        .otherwise(0)
        .alias("_newrun"),
    )
    agg = lagged.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_e").cast("long").alias("n_pass"),
        F.sum("_newrun").cast("long").alias("runs"),
    )
    lin = F.expr(
        "CAST(n AS DECIMAL(38,0)) * (runs - 1)"
        " - 2 * CAST(n_pass AS DECIMAL(38,0)) * (n - n_pass)"
    )
    ok = (
        (F.col("n_pass") > 0)
        & (F.col("n_pass") < F.col("n"))
        & (F.col("n") > 1)
        & (
            F.expr(
                "2 * CAST(n_pass AS DECIMAL(38,0)) * (n - n_pass)"
            )
            > F.col("n").cast("decimal(38,0)")
        )
    )
    return agg.select(
        "grp",
        "n",
        "n_pass",
        "runs",
        F.when(ok, F.signum(lin.cast("double")).cast("int")).alias("direction"),
        F.when(
            ok,
            F.expr(
                "(1000"
                " * (CAST(n AS DECIMAL(38,0)) * (runs - 1)"
                "    - 2 * CAST(n_pass AS DECIMAL(38,0)) * (n - n_pass))"
                " * (CAST(n AS DECIMAL(38,0)) * (runs - 1)"
                "    - 2 * CAST(n_pass AS DECIMAL(38,0)) * (n - n_pass))"
                " * (n - 1))"
                " div (2 * CAST(n_pass AS DECIMAL(38,0)) * (n - n_pass)"
                "      * (2 * CAST(n_pass AS DECIMAL(38,0)) * (n - n_pass) - n))"
            ),
        )
        .cast("long")
        .alias("z2_milli"),
    )


def cusum_changepoint(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    h_bp: int = 30000,
) -> DataFrame:
    """Two-sided CUSUM change detection on per-group daily counts —
    the drift alarm `rate_anomalies` can't raise: a z-score test sees
    each day alone, so a level shift of +0.5σ/day never trips it,
    while the CUSUM accumulates small same-signed deviations until the
    sum itself is undeniable (Page 1954). The crawl-ops question it
    answers: "did this event stream's BASE RATE move, and when?" —
    recrawl-policy and frontier-budget changes show up here first.

    The textbook recursion ``S_t = max(0, S_{t-1} + (x_t − k))`` looks
    window-hostile, but it is exactly the prefix-sum identity
    ``S_t = P_t − min(P_0..P_t)`` with ``P_0 = 0`` — so both one-sided
    CUSUMs are two plain windows (running sum + running extreme) per
    group: no recursion, no UDF, single shuffle on the group key.

    Integer-exact: reference ``k_micro = (10⁶·Σx) div n_days`` (the
    group's own mean daily count — the in-control level), deviations
    ``d_t = 10⁶·x_t − k_micro``, prefix sums and running extremes all
    BIGINT. Alarm threshold ``h_micro = (h_bp · k_micro) div 10⁴`` —
    h expressed in units of the mean (default 3× mean, a deliberately
    coarse "the level really moved" bar). Non-negative divisions only
    (Σx, k_micro ≥ 0), so Spark's truncating ``div`` equals DuckDB's
    floor ``//``.

    Returns one row per (group, day): ``(grp, epoch_day, n_events,
    cusum_up_micro, cusum_down_micro, alarm)`` — alarm ∈ {-1, 0, 1}
    (down-shift, in-control, up-shift; up wins a same-day tie).

    Scale: one (group, day) combinable count rollup is the only
    full-size shuffle; the windows run on the tiny per-day table.
    Days with zero events contribute no row (observed-days basis,
    same policy as `rate_anomalies`).
    """
    if h_bp < 1:
        raise ValueError(f"cusum_changepoint needs h_bp >= 1, got {h_bp}")
    daily = (
        events
        .select(
            F.col(group_col).cast("string").alias("grp"),
            F.datediff(F.to_date(F.col(ts_col)), F.lit("1970-01-01"))
            .cast("long")
            .alias("epoch_day"),
        )
        .groupBy("grp", "epoch_day")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    wg = Window.partitionBy("grp").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wrun = (
        Window.partitionBy("grp")
        .orderBy("epoch_day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    with_k = (
        daily.withColumn("_sx", F.sum("n_events").over(wg).cast("long"))
        .withColumn("_nd", F.count(F.lit(1)).over(wg).cast("long"))
        .withColumn("_k", F.expr("(1000000 * _sx) div _nd").cast("long"))
    )
    pref = with_k.withColumn(
        "_d", F.lit(1000000) * F.col("n_events") - F.col("_k")
    ).withColumn("_p", F.sum("_d").over(wrun).cast("long"))
    cus = pref.withColumn(
        "_pmin", F.least(F.lit(0).cast("long"), F.min("_p").over(wrun))
    ).withColumn(
        "_pmax", F.greatest(F.lit(0).cast("long"), F.max("_p").over(wrun))
    ).withColumn(
        "cusum_up_micro", (F.col("_p") - F.col("_pmin")).cast("long")
    ).withColumn(
        "cusum_down_micro", (F.col("_pmax") - F.col("_p")).cast("long")
    )
    h = F.expr(f"({int(h_bp)} * _k) div 10000")
    return cus.select(
        "grp",
        "epoch_day",
        "n_events",
        "cusum_up_micro",
        "cusum_down_micro",
        F.when(F.col("cusum_up_micro") > h, F.lit(1))
        .when(F.col("cusum_down_micro") > h, F.lit(-1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("alarm"),
    )


def ewma_control(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """EWMA control chart on per-group daily counts — the THIRD member
    of the monitoring triad: `rate_anomalies` (single-day z spike),
    `cusum_changepoint` (sustained level shift), and this — a
    geometrically-weighted forecast of today's level from the last 16
    observed days, λ = 1/4, flagging days whose count deviates from
    the forecast in units of the trailing std. The EWMA reacts faster
    than CUSUM to medium shifts and is less twitchy than a raw z.

    Exactness: a truncated-and-renormalized EWMA over exactly 16
    preceding observed days (not calendar days — sparse-group policy
    of `rate_anomalies`), with EXACT rational weights: lag i (1 = most
    recent) carries ``w_i = 3^(i−1)·4^(16−i)``, and ``Σw = 4^16 − 3^16
    = 4251920575`` — so ``ewma_milli = (1000·Σ w_i·x_{t−i}) div Σw``
    is pure BIGINT (numerator ≤ 10³·Σw·max_count, safe far past any
    daily count). Deviation ``dev_milli = 1000·x_t − ewma_milli``;
    trailing std via the integer-moments rule over the same 16 days;
    ``z_milli`` floors the MAGNITUDE then restores the sign, so every
    integer division has a non-negative numerator (truncation ==
    floor == the DuckDB twin — negative ``div`` disagrees between
    engines and is never evaluated here).

    Returns ``(grp, epoch_day, n_events, ewma_milli, z_milli)`` for
    days with a full 16-day history.

    Scale: one (group, day) combinable count rollup is the only
    full-size shuffle; the 16 lag() reads are one sorted window pass
    over the tiny per-day table.
    """
    daily = (
        events
        .select(
            F.col(group_col).cast("string").alias("grp"),
            F.datediff(F.to_date(F.col(ts_col)), F.lit("1970-01-01"))
            .cast("long")
            .alias("epoch_day"),
        )
        .groupBy("grp", "epoch_day")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    w = Window.partitionBy("grp").orderBy("epoch_day")
    wtrail = (
        Window.partitionBy("grp")
        .orderBy("epoch_day")
        .rowsBetween(-16, -1)
    )
    lagged = daily
    for i in range(1, 17):
        lagged = lagged.withColumn(f"_l{i}", F.lag("n_events", i).over(w))
    num = " + ".join(
        f"({3 ** (i - 1)} * {4 ** (16 - i)} * _l{i})" for i in range(1, 17)
    )
    denom = 4**16 - 3**16
    stats = (
        lagged.withColumn("_k", F.count("n_events").over(wtrail).cast("long"))
        .withColumn("_s", F.sum("n_events").over(wtrail).cast("long"))
        .withColumn(
            "_s2",
            F.sum(F.col("n_events") * F.col("n_events"))
            .over(wtrail)
            .cast("long"),
        )
        .where(F.col("_k") == 16)
        .withColumn(
            "ewma_milli",
            F.expr(f"(1000 * ({num})) div {denom}").cast("long"),
        )
        .withColumn(
            "_dev", F.lit(1000) * F.col("n_events") - F.col("ewma_milli")
        )
        .withColumn(
            "_std",
            F.expr(
                "greatest(CAST(floor(sqrt(CAST("
                "(16 * _s2 - _s * _s) div 256 AS DOUBLE))) AS BIGINT), 1)"
            ),
        )
    )
    return stats.select(
        "grp",
        "epoch_day",
        "n_events",
        "ewma_milli",
        F.expr(
            "CASE WHEN _dev >= 0 THEN _dev div _std "
            "ELSE -((-_dev) div _std) END"
        )
        .cast("long")
        .alias("z_milli"),
    )


def autocorrelation(
    series: DataFrame,
    t_col: str,
    y_col: str,
    max_lag: int = 7,
) -> DataFrame:
    """Sample autocorrelation function (ACF) of an integer time series
    at lags 1..max_lag — the seasonality detector behind
    :func:`seasonality`'s fixed grid: a crawl-rate series whose ACF
    spikes at lag 7 has a weekly cycle; one that stays high at EVERY
    lag has drift (see :func:`cusum_changepoint`); one near zero is
    healthy noise around a stable rate.

    ``t_col`` must be a dense integer index (0,1,2,...; the caller
    densifies with row_number over the aggregated series — days,
    hours). Exactness: with ``S = Σy`` the n-scaled deviations ``d_t =
    n·y_t − S`` are exact longs, so ``num_L = Σ_{t} d_t·d_{t+L}`` and
    ``den = Σ d_t²`` are exact integer sums (the `pearson_corr` moment
    trick — the common n² scale cancels in the ratio), and ``acf_milli
    = floor(1000·num_L/den)`` is ONE fixed IEEE shape per lag. The
    denominator uses all n terms and the GLOBAL mean (the standard
    biased-ACF estimator, the one statsmodels defaults to). n < 2 or a
    constant series → NULL acf.

    Returns one row per lag: ``(lag, n, n_pairs, num, den,
    acf_milli)``.

    Scale: the series is an AGGREGATED rollup (days of a crawl — 10³
    rows from 10¹² events), so the lag self-join and the totals
    crossJoin are driver-trivial; the only big-data work is the rollup
    the CALLER already paid for. The op itself never touches the row
    table.
    """
    if max_lag < 1:
        raise ValueError(f"autocorrelation needs max_lag >= 1, got {max_lag}")
    base = (
        series.where(F.col(t_col).isNotNull() & F.col(y_col).isNotNull())
        .select(
            F.col(t_col).cast("long").alias("_t"),
            F.col(y_col).cast("long").alias("_y"),
        )
    )
    tot = base.agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum("_y").cast("long").alias("_s"),
    )
    d = base.crossJoin(F.broadcast(tot)).select(
        "_t",
        "_n",
        (F.col("_n") * F.col("_y") - F.col("_s")).cast("long").alias("_d"),
    )
    den = d.agg(
        F.max("_n").cast("long").alias("n"),
        F.sum(F.col("_d") * F.col("_d")).cast("long").alias("den"),
    )
    lags = d.sparkSession.range(1, int(max_lag) + 1).select(
        F.col("id").cast("long").alias("lag")
    )
    left = d.crossJoin(F.broadcast(lags)).select(
        "lag", (F.col("_t") + F.col("lag")).alias("_tr"), F.col("_d").alias("_dl")
    )
    pairs = left.join(
        d.select(F.col("_t").alias("_tr"), F.col("_d").alias("_dr")),
        on="_tr",
    )
    num = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.col("_dl") * F.col("_dr")).cast("long").alias("num"),
    )
    out = (
        lags.join(num, on="lag", how="left")
        .crossJoin(F.broadcast(den))
        .select(
            "lag",
            "n",
            F.coalesce("n_pairs", F.lit(0)).cast("long").alias("n_pairs"),
            F.coalesce("num", F.lit(0)).cast("long").alias("num"),
            "den",
            F.when(
                (F.col("n") >= 2) & (F.col("den") > 0),
                F.expr(
                    "CAST(floor(1000.0"
                    " * CAST(coalesce(num, 0) AS DOUBLE)"
                    " / CAST(den AS DOUBLE)) AS BIGINT)"
                ),
            ).alias("acf_milli"),
        )
    )
    return out


def theil_sen(
    series: DataFrame,
    t_col: str,
    y_col: str,
) -> DataFrame:
    """Theil–Sen robust slope of an integer series — the
    outlier-proof trend estimator for crawl-rate / quality drift:
    OLS-through-time (the `trend_gate` shape) is dragged by a single
    steal-window spike; the MEDIAN of all pairwise slopes has a 29%
    breakdown point and needs no residual model. The robust companion
    to :func:`autocorrelation` on the same aggregated series.

    Each of the n·(n−1)/2 pairs (t_i < t_j) contributes
    ``slope_milli = floor(1000·(y_j − y_i)/(t_j − t_i))`` — ONE fixed
    IEEE division + floor per pair (floor-toward −∞, negative-safe,
    engine-identical), quantize-then-median; the multiset's DOUBLED
    median ``slope2_milli = s_(⌈m/2⌉) + s_(⌈(m+1)/2⌉)`` is then exact
    integer order statistics by cumulative counts on the
    DISTINCT-slope table (the `robust_location` idiom — no global
    row-number over the pair table). n < 2 → NULL.

    Returns one row: ``(n_points, n_pairs, slope2_milli)`` — the
    slope in milli-units is slope2_milli / 2 (kept doubled so the
    even-m midpoint stays an integer).

    Scale: the series is the caller's AGGREGATED rollup (days, hours
    — 10³..10⁵ rows from 10¹² events), so the O(n²) pair join is a
    few million in-memory rows at worst; the op never touches the
    row table. For 10⁶-point series use a windowed/sampled variant —
    deliberately not hidden inside this exact one.
    """
    base = series.where(
        F.col(t_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(
        F.col(t_col).cast("long").alias("_t"),
        F.col(y_col).cast("long").alias("_y"),
    )
    n = base.agg(F.count(F.lit(1)).cast("long").alias("n_points"))
    r = base.select(
        F.col("_t").alias("_tj"), F.col("_y").alias("_yj")
    )
    slopes = (
        base.join(r, F.col("_t") < F.col("_tj"))
        .select(
            F.expr(
                "CAST(floor(1000.0 * CAST(_yj - _y AS DOUBLE)"
                " / CAST(_tj - _t AS DOUBLE)) AS BIGINT)"
            ).alias("_sl")
        )
        .groupBy("_sl")
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
    )
    w = Window.orderBy("_sl").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = slopes.select(
        "_sl",
        F.sum("_c").over(w).alias("_cum"),
        F.sum("_c").over(wall).alias("_m"),
    )
    med = cum.agg(
        F.max("_m").cast("long").alias("n_pairs"),
        (
            F.min(
                F.when(
                    F.col("_cum") >= F.expr("(_m + 1) div 2"), F.col("_sl")
                )
            )
            + F.min(
                F.when(
                    F.col("_cum") >= F.expr("(_m + 2) div 2"), F.col("_sl")
                )
            )
        )
        .cast("long")
        .alias("slope2_milli"),
    )
    return n.crossJoin(F.broadcast(med)).select(
        "n_points",
        F.coalesce("n_pairs", F.lit(0)).cast("long").alias("n_pairs"),
        "slope2_milli",
    )


def mann_kendall(
    series: DataFrame,
    t_col: str,
    y_col: str,
) -> DataFrame:
    """Mann–Kendall trend TEST over an integer series — the
    significance companion to :func:`theil_sen`'s slope ESTIMATE
    (the pairing every monitoring textbook ships): S = Σ_{i<j}
    sign(y_j − y_i) counts concordant-minus-discordant time pairs,
    distribution-free, so a crawl-rate drift call doesn't depend on
    normality the way `trend_gate`'s regression z does.

    Exact integers end to end: S from the pair join; the tie
    correction ``T = Σ_v t_v(t_v−1)(2t_v+5)`` from the distinct-value
    counts; ``var18 = n(n−1)(2n+5) − T`` (18·Var(S)). The
    continuity-corrected ``z_milli = floor(1000·(S∓1)/
    sqrt(var18/18))`` (∓: toward zero; S = 0 → 0) is ONE fixed IEEE
    shape. var18 ≤ 0 (n < 2 or everything tied) → NULL.

    Returns one row: ``(n, s_stat, tie_term, var18, z_milli)``.

    Scale: the `theil_sen` shape — the series is the caller's
    aggregated rollup, the O(n²) pair join runs on thousands of rows,
    never the event table.
    """
    base = series.where(
        F.col(t_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(
        F.col(t_col).cast("long").alias("_t"),
        F.col(y_col).cast("long").alias("_y"),
    )
    r = base.select(F.col("_t").alias("_tj"), F.col("_y").alias("_yj"))
    s = base.join(r, F.col("_t") < F.col("_tj")).agg(
        F.sum(F.signum(F.col("_yj") - F.col("_y")).cast("long"))
        .cast("long")
        .alias("s_stat")
    )
    ties = (
        base.groupBy("_y")
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("_nv"),
            F.sum(
                F.col("_c")
                * (F.col("_c") - 1)
                * (2 * F.col("_c") + 5)
            )
            .cast("long")
            .alias("tie_term"),
        )
    )
    n = base.agg(F.count(F.lit(1)).cast("long").alias("n"))
    out = (
        n.crossJoin(F.broadcast(s))
        .crossJoin(F.broadcast(ties))
        .select(
            "n",
            F.coalesce("s_stat", F.lit(0)).cast("long").alias("s_stat"),
            "tie_term",
            (
                F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
                - F.col("tie_term")
            )
            .cast("long")
            .alias("var18"),
        )
    )
    z = (
        "CAST(floor(1000.0 * CAST(CASE WHEN s_stat > 0 THEN s_stat - 1"
        " WHEN s_stat < 0 THEN s_stat + 1 ELSE 0 END AS DOUBLE)"
        " / sqrt(CAST(var18 AS DOUBLE) / 18.0)) AS BIGINT)"
    )
    return out.select(
        "n",
        "s_stat",
        "tie_term",
        "var18",
        F.when(F.col("var18") > 0, F.expr(z)).alias("z_milli"),
    )


def logrank_test(
    spans: DataFrame,
    duration_col: str = "duration",
    event_col: str = "event",
    group_col: str = "grp",
    group_a: str = "a",
    group_b: str = "b",
) -> DataFrame:
    """Two-group log-rank test — "do these two cohorts' survival
    curves differ?", the hypothesis test :func:`survival_curve`'s
    Kaplan–Meier picture begs for (re-hosted vs stable pages, two
    crawler configs' page lifetimes). At each distinct EVENT time:
    observed-minus-expected group-a deaths under the shared-hazard
    null, with the hypergeometric variance; χ² = (ΣO−E)² / ΣV.

    Determinism (the `survival_curve` per-term discipline): each
    time's O−E term has EXACT integer numerator ``d_a·n − d·n_a``
    and is quantized ONCE — ``floor(10⁶·num/n)`` (floor toward −∞,
    negative-safe) — and each variance term is one fixed IEEE shape
    ``floor(10⁶·n_a·n_b·d·(n−d) / (n²·(n−1)))``, so both sums are
    integer sums with no float accumulation order. The final
    ``chi2_milli = floor(1000·(ΣO−E/10⁶)² / (ΣV/10⁶))`` is one
    fixed expression. ΣV ≤ 0 (no comparable event time) → NULL.
    Censoring follows standard KM: censored subjects leave the risk
    set after their time; ties between events and censorings at the
    same time keep the censored subject AT RISK for that time's
    events (the Kalbfleisch–Prentice convention).

    Returns one row: ``(n_a, n_b, n_event_times, oe_micro,
    var_micro, chi2_milli)``.

    Scale: one (duration, group) rollup over the span table
    (combinable), cumulative windows on the DISTINCT-duration table
    for the risk sets, one final agg. Subjects stream through once.
    """
    g = F.col(group_col)
    base = spans.where(
        g.isin([group_a, group_b])
        & F.col(duration_col).isNotNull()
        & F.col(event_col).isNotNull()
    ).select(
        (g == group_a).alias("_ia"),
        F.col(duration_col).cast("long").alias("_t"),
        F.col(event_col).cast("int").alias("_e"),
    )
    per = base.groupBy("_t").agg(
        F.sum(F.when(F.col("_ia"), 1).otherwise(0))
        .cast("long")
        .alias("_ca"),
        F.sum(F.when(~F.col("_ia"), 1).otherwise(0))
        .cast("long")
        .alias("_cb"),
        F.sum(F.when(F.col("_ia") & (F.col("_e") == 1), 1).otherwise(0))
        .cast("long")
        .alias("_da"),
        F.sum(F.when((~F.col("_ia")) & (F.col("_e") == 1), 1).otherwise(0))
        .cast("long")
        .alias("_db"),
    )
    w = Window.orderBy("_t").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = per.select(
        "_t",
        "_da",
        "_db",
        (F.sum("_ca").over(wall) - F.sum("_ca").over(w) + F.col("_ca"))
        .cast("long")
        .alias("_na"),
        (F.sum("_cb").over(wall) - F.sum("_cb").over(w) + F.col("_cb"))
        .cast("long")
        .alias("_nb"),
        F.sum("_ca").over(wall).cast("long").alias("_tot_a"),
        F.sum("_cb").over(wall).cast("long").alias("_tot_b"),
    ).where((F.col("_da") + F.col("_db")) > 0)
    terms = cum.select(
        "_tot_a",
        "_tot_b",
        F.expr(
            "CAST(floor(1000000.0 * CAST(_da * (_na + _nb)"
            " - (_da + _db) * _na AS DOUBLE) / (_na + _nb)) AS BIGINT)"
        ).alias("_oe"),
        F.when(
            (F.col("_na") + F.col("_nb")) > 1,
            F.expr(
                "CAST(floor(1000000.0 * CAST(_na AS DOUBLE) * _nb"
                " * (_da + _db) * ((_na + _nb) - (_da + _db))"
                " / (CAST(_na + _nb AS DOUBLE) * (_na + _nb)"
                "    * ((_na + _nb) - 1))) AS BIGINT)"
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("_v"),
    )
    agg = terms.agg(
        F.max("_tot_a").cast("long").alias("n_a"),
        F.max("_tot_b").cast("long").alias("n_b"),
        F.count(F.lit(1)).cast("long").alias("n_event_times"),
        F.sum("_oe").cast("long").alias("oe_micro"),
        F.sum("_v").cast("long").alias("var_micro"),
    )
    return agg.select(
        "n_a",
        "n_b",
        "n_event_times",
        "oe_micro",
        "var_micro",
        F.when(
            F.col("var_micro") > 0,
            F.expr(
                "CAST(floor(1000.0"
                " * (CAST(oe_micro AS DOUBLE) / 1000000.0)"
                " * (CAST(oe_micro AS DOUBLE) / 1000000.0)"
                " / (CAST(var_micro AS DOUBLE) / 1000000.0)) AS BIGINT)"
            ),
        ).alias("chi2_milli"),
    )


def forecast_baselines(
    series: DataFrame,
    t_col: str,
    y_col: str,
    season: int = 7,
) -> DataFrame:
    """Naive-forecast error floor + MASE for an integer series — the
    number every crawl-rate "forecast" must beat before it earns a
    dashboard: the naive forecast ŷ_t = y_{t−1} and the
    seasonal-naive ŷ_t = y_{t−season} are free, and MASE (Hyndman &
    Koehler) is the naive MAE scaled by the seasonal-naive MAE —
    below 1000 milli the last-value guess already beats the weekly
    pattern (drift regime, see `cusum_changepoint`); far above it,
    seasonality dominates and `seasonality`/`autocorrelation` tell
    you the period.

    ``t_col`` must be the dense index (the `autocorrelation`
    contract). Everything is exact integers: ``sae = Σ|y_t − y_{t−L}|``
    per baseline over its valid range, and ``mase_milli =
    (1000·sae_naive·n_seasonal) div (n_naive·sae_seasonal)`` — one
    integer div, non-negative. A perfectly periodic series (seasonal
    SAE 0) → NULL, surfaced rather than ∞.

    Returns one row: ``(n, season, sae_naive, n_naive, sae_seasonal,
    n_seasonal, mase_milli)``.

    Scale: two lag windows over the caller's AGGREGATED series —
    never the event table.
    """
    if season < 1:
        raise ValueError(f"forecast_baselines needs season >= 1, got {season}")
    base = series.where(
        F.col(t_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(
        F.col(t_col).cast("long").alias("_t"),
        F.col(y_col).cast("long").alias("_y"),
    )
    w = Window.orderBy("_t")
    d = base.select(
        "_y",
        F.lag("_y", 1).over(w).alias("_p1"),
        F.lag("_y", int(season)).over(w).alias("_ps"),
    )
    agg = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.abs(F.col("_y") - F.col("_p1"))).cast("long").alias(
            "sae_naive"
        ),
        F.sum(F.when(F.col("_p1").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_naive"),
        F.sum(F.abs(F.col("_y") - F.col("_ps"))).cast("long").alias(
            "sae_seasonal"
        ),
        F.sum(F.when(F.col("_ps").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_seasonal"),
    )
    return agg.select(
        "n",
        F.lit(int(season)).cast("long").alias("season"),
        F.coalesce("sae_naive", F.lit(0)).cast("long").alias("sae_naive"),
        "n_naive",
        F.coalesce("sae_seasonal", F.lit(0))
        .cast("long")
        .alias("sae_seasonal"),
        "n_seasonal",
        F.when(
            (F.col("n_naive") > 0)
            & (F.col("n_seasonal") > 0)
            & (F.col("sae_seasonal") > 0),
            F.expr(
                "(1000 * coalesce(sae_naive, 0) * n_seasonal)"
                " div (n_naive * coalesce(sae_seasonal, 0))"
            ),
        )
        .cast("long")
        .alias("mase_milli"),
    )


def event_funnel(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    steps: Sequence[str],
) -> DataFrame:
    """Ordered conversion funnel over an event stream — "of the users
    who VIEWED, how many then CLICKED, then PURCHASED — and how long
    did each hop take?" The behavioral sibling of `gate_funnel`
    (which funnels documents through quality gates): each step
    counts a user only if it happens STRICTLY AFTER their earliest
    completion of the previous step (first-touch semantics, the
    standard product-analytics contract).

    Per step: users converting, conversion vs the step-1 cohort in
    ppm (exact integer div), and the exact DOUBLED median of the gap
    seconds from the previous step (`robust_location` idiom on the
    distinct-gap table; timestamps floor to epoch seconds identically
    in both engines). Step 1 has no gap.

    Returns one row per step: ``(step_idx, step, n_users,
    conversion_ppm, med2_gap_sec)``.

    Scale: k−1 per-user min-aggregate joins, each keyed on the user
    — combinable rollups plus user-keyed equi-joins; the funnel
    depth k is a literal handful, the stream is scanned once per
    step with the type filter pushed down.
    """
    if len(steps) < 1:
        raise ValueError("event_funnel needs at least one step")
    base = events.where(
        F.col(user_col).isNotNull()
        & F.col(type_col).isNotNull()
        & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col).alias("_u"),
        F.col(type_col).alias("_ty"),
        F.col(ts_col).cast("timestamp").cast("long").alias("_t"),
    )
    spark = events.sparkSession
    cur = (
        base.where(F.col("_ty") == steps[0])
        .groupBy("_u")
        .agg(F.min("_t").alias("_t0"))
    )
    per_step = [cur.select("_u", F.col("_t0").alias("_tk"))]
    for s in steps[1:]:
        prev = per_step[-1]
        nxt = (
            base.where(F.col("_ty") == s)
            .join(prev.select("_u", F.col("_tk").alias("_tp")), on="_u")
            .where(F.col("_t") > F.col("_tp"))
            .groupBy("_u")
            .agg(F.min("_t").alias("_tk"))
        )
        per_step.append(nxt)

    def med2_gap(cur_df, prev_df):
        gaps = (
            cur_df.join(
                prev_df.select("_u", F.col("_tk").alias("_tp")), on="_u"
            )
            .select((F.col("_tk") - F.col("_tp")).alias("_g"))
            .groupBy("_g")
            .agg(F.count(F.lit(1)).cast("long").alias("_c"))
        )
        w = Window.orderBy("_g").rowsBetween(Window.unboundedPreceding, 0)
        wall = Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        cum = gaps.select(
            "_g",
            F.sum("_c").over(w).alias("_cum"),
            F.sum("_c").over(wall).alias("_m"),
        )
        return cum.agg(
            (
                F.min(
                    F.when(
                        F.col("_cum") >= F.expr("(_m + 1) div 2"),
                        F.col("_g"),
                    )
                )
                + F.min(
                    F.when(
                        F.col("_cum") >= F.expr("(_m + 2) div 2"),
                        F.col("_g"),
                    )
                )
            )
            .cast("long")
            .alias("med2_gap_sec")
        )

    base_cnt = per_step[0].agg(
        F.count(F.lit(1)).cast("long").alias("_b")
    )
    outs = []
    for i, s in enumerate(steps):
        cnt = per_step[i].agg(
            F.count(F.lit(1)).cast("long").alias("n_users")
        )
        row = cnt.crossJoin(F.broadcast(base_cnt))
        if i == 0:
            med = spark.range(1).select(
                F.lit(None).cast("long").alias("med2_gap_sec")
            )
        else:
            med = med2_gap(per_step[i], per_step[i - 1])
        outs.append(
            row.crossJoin(F.broadcast(med)).select(
                F.lit(i + 1).cast("long").alias("step_idx"),
                F.lit(s).alias("step"),
                "n_users",
                F.when(
                    F.col("_b") > 0,
                    F.expr("(1000000 * n_users) div _b"),
                )
                .otherwise(F.lit(0))
                .cast("long")
                .alias("conversion_ppm"),
                F.col("med2_gap_sec").cast("long").alias("med2_gap_sec"),
            )
        )
    funnel = outs[0]
    for o in outs[1:]:
        funnel = funnel.unionByName(o)
    return funnel


def cohort_retention(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention matrix over an event stream: users grouped by
    their FIRST-activity period (week by default), then counted in
    every later period they return — the standard "does the crawl
    keep re-seeing the same hosts / do annotators stay active"
    triangle, exact and assumption-free (the parametric lifetime view
    is `survival_curve`).

    All integers: period = epoch-day div period_days, offset =
    period − cohort_period, ``retention_ppm = (10⁶·active) div
    cohort_users``. Offset 0 is the cohort itself (ppm = 10⁶ by
    construction — kept as the sanity row).

    Returns one row per (cohort_period, offset): ``(cohort_period,
    offset_periods, cohort_users, active_users, retention_ppm)``.

    Scale: one (user, period) distinct rollup, a user-keyed min
    aggregate broadcast back, one (cohort, offset) rollup — three
    combinable shuffles, no windows over the event table.
    """
    if period_days < 1:
        raise ValueError(f"period_days must be positive, got {period_days}")
    up = (
        events.where(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(
            F.col(user_col).alias("_u"),
            F.expr(
                f"CAST(datediff(to_date({ts_col}), DATE '1970-01-01')"
                f" div {int(period_days)} AS BIGINT)"
            ).alias("_p"),
        )
        .distinct()
    )
    first = up.groupBy("_u").agg(F.min("_p").alias("_c0"))
    sizes = first.groupBy(F.col("_c0").alias("cohort_period")).agg(
        F.count(F.lit(1)).cast("long").alias("cohort_users")
    )
    act = (
        up.join(first, on="_u")
        .groupBy(
            F.col("_c0").alias("cohort_period"),
            (F.col("_p") - F.col("_c0")).cast("long").alias(
                "offset_periods"
            ),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("active_users"))
    )
    return act.join(F.broadcast(sizes), on="cohort_period").select(
        "cohort_period",
        "offset_periods",
        "cohort_users",
        "active_users",
        F.expr("(1000000 * active_users) div cohort_users")
        .cast("long")
        .alias("retention_ppm"),
    )


def event_transitions(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    order_col: str,
) -> DataFrame:
    """First-order Markov transition table of event types per user —
    "what follows what": the behavioral counterpart of
    `status_transitions` (HTTP status between snapshots) and
    `bigram_lm` (words). High error→error persistence flags broken
    sessions; purchase→view loops are the healthy cycle.

    Ordering is (ts, order_col) with the caller-supplied unique
    tiebreaker — WITHOUT it, same-timestamp events make the lag
    partition-order-dependent and the counts nondeterministic (the
    `asof_join` right_tiebreak lesson). Row-normalized ppm by exact
    integer div.

    Returns one row per (prev_type, next_type): ``(prev_type,
    next_type, n, ppm)``.

    Scale: ONE user-keyed window (hash shuffle + per-user sort, O(1)
    state) and one pair rollup — the `sessionize` plan shape.
    """
    base = events.where(
        F.col(user_col).isNotNull()
        & F.col(type_col).isNotNull()
        & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col).alias("_u"),
        F.col(type_col).alias("_ty"),
        F.col(ts_col).alias("_t"),
        F.col(order_col).alias("_o"),
    )
    w = Window.partitionBy("_u").orderBy("_t", "_o")
    pairs = (
        base.select(
            F.lag("_ty").over(w).alias("prev_type"),
            F.col("_ty").alias("next_type"),
        )
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    tot = pairs.groupBy("prev_type").agg(
        F.sum("n").cast("long").alias("_row_n")
    )
    return pairs.join(F.broadcast(tot), on="prev_type").select(
        "prev_type",
        "next_type",
        "n",
        F.expr("(1000000 * n) div _row_n").cast("long").alias("ppm"),
    )


def cross_correlation(
    series: DataFrame,
    t_col: str,
    ya_col: str,
    yb_col: str,
    max_lag: int = 7,
) -> DataFrame:
    """Cross-correlation function between two aligned integer series
    at lags −L..+L — the lead/lag detector `autocorrelation` can't
    be: "do error spikes LEAD purchase dips, and by how many days?"
    Positive lag means series A leads (A at t correlates with B at
    t+lag).

    The `autocorrelation` exactness trick per series: with each
    series' own n-scaled deviations ``da_t = n·a_t − Sa`` (exact
    longs), every lag's ``num = Σ da_t·db_{t+lag}`` is an exact
    integer and ``ccf_milli = floor(1000·num/(√Σda²·√Σdb²))`` is one
    fixed IEEE shape (two sqrts — the `pearson_corr` overflow rule).
    Either series constant → NULL.

    Returns one row per lag in [−L, L]: ``(lag, n_pairs, num,
    ccf_milli)``.

    Scale: the series is the caller's aggregated rollup; the lag
    join runs on thousands of rows, never the event table.
    """
    if max_lag < 0:
        raise ValueError(f"max_lag must be >= 0, got {max_lag}")
    base = series.where(
        F.col(t_col).isNotNull()
        & F.col(ya_col).isNotNull()
        & F.col(yb_col).isNotNull()
    ).select(
        F.col(t_col).cast("long").alias("_t"),
        F.col(ya_col).cast("long").alias("_a"),
        F.col(yb_col).cast("long").alias("_b"),
    )
    tot = base.agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum("_a").cast("long").alias("_sa"),
        F.sum("_b").cast("long").alias("_sb"),
    )
    d = base.crossJoin(F.broadcast(tot)).select(
        "_t",
        (F.col("_n") * F.col("_a") - F.col("_sa")).cast("long").alias(
            "_da"
        ),
        (F.col("_n") * F.col("_b") - F.col("_sb")).cast("long").alias(
            "_db"
        ),
    )
    den = d.agg(
        F.sum(F.col("_da") * F.col("_da")).cast("long").alias("_dena"),
        F.sum(F.col("_db") * F.col("_db")).cast("long").alias("_denb"),
    )
    lags = d.sparkSession.range(-int(max_lag), int(max_lag) + 1).select(
        F.col("id").cast("long").alias("lag")
    )
    left = d.crossJoin(F.broadcast(lags)).select(
        "lag",
        (F.col("_t") + F.col("lag")).alias("_tr"),
        F.col("_da").alias("_dl"),
    )
    pairs = left.join(
        d.select(F.col("_t").alias("_tr"), F.col("_db").alias("_dr")),
        on="_tr",
    )
    num = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.col("_dl") * F.col("_dr")).cast("long").alias("num"),
    )
    return (
        lags.join(num, on="lag", how="left")
        .crossJoin(F.broadcast(den))
        .select(
            "lag",
            F.coalesce("n_pairs", F.lit(0)).cast("long").alias(
                "n_pairs"
            ),
            F.coalesce("num", F.lit(0)).cast("long").alias("num"),
            F.when(
                (F.col("_dena") > 0) & (F.col("_denb") > 0),
                F.expr(
                    "CAST(floor(1000.0"
                    " * CAST(coalesce(num, 0) AS DOUBLE)"
                    " / (sqrt(CAST(_dena AS DOUBLE))"
                    "    * sqrt(CAST(_denb AS DOUBLE)))) AS BIGINT)"
                ),
            ).alias("ccf_milli"),
        )
    )


def series_peaks(
    series: DataFrame,
    t_col: str,
    y_col: str,
    window: int = 3,
    min_rise_milli: int = 0,
) -> DataFrame:
    """Local-maximum peaks of an integer series with an exact
    neighborhood-rise filter — the spike FINDER feeding
    `cusum_changepoint` (level shifts) and `rate_anomalies` (control
    limits): a point is a peak when it strictly exceeds every
    neighbor within ±window AND its rise over the neighborhood mean
    clears ``min_rise_milli`` (milli value-units).

    Tie policy: plateaus are NOT peaks (strict >), so a two-day
    equal-height spike reports neither day — deterministic and
    documented, not a hidden argmax race. The rise filter is the
    exact integer comparison ``1000·(y·cnt − Σnbhd) ≥ min_rise·cnt``;
    ``rise_milli`` itself floors once.

    Returns peak rows only: ``(t, y, nbhd_max, rise_milli)``.

    Scale: two frame windows over the caller's aggregated series —
    never the event table. Series edges use the truncated
    neighborhood (standard).
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    base = series.where(
        F.col(t_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(
        F.col(t_col).cast("long").alias("t"),
        F.col(y_col).cast("long").alias("y"),
    )
    wl = Window.orderBy("t").rowsBetween(-int(window), -1)
    wr = Window.orderBy("t").rowsBetween(1, int(window))
    nb = base.select(
        "t",
        "y",
        F.greatest(
            F.coalesce(F.max("y").over(wl), F.lit(-(1 << 62))),
            F.coalesce(F.max("y").over(wr), F.lit(-(1 << 62))),
        ).alias("nbhd_max"),
        (
            F.coalesce(F.sum("y").over(wl), F.lit(0))
            + F.coalesce(F.sum("y").over(wr), F.lit(0))
        ).alias("_nsum"),
        (
            F.coalesce(F.count("y").over(wl), F.lit(0))
            + F.coalesce(F.count("y").over(wr), F.lit(0))
        ).alias("_ncnt"),
    )
    return (
        nb.where(
            (F.col("_ncnt") > 0)
            & (F.col("y") > F.col("nbhd_max"))
            & (
                1000 * (F.col("y") * F.col("_ncnt") - F.col("_nsum"))
                >= int(min_rise_milli) * F.col("_ncnt")
            )
        )
        .select(
            "t",
            "y",
            F.col("nbhd_max").cast("long").alias("nbhd_max"),
            F.expr(
                "CAST(floor(1000.0 * (CAST(y AS DOUBLE)"
                " - CAST(_nsum AS DOUBLE) / _ncnt)) AS BIGINT)"
            ).alias("rise_milli"),
        )
    )


def interarrival_stats(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    order_col: str,
    group_col: "Optional[str]" = None,
) -> DataFrame:
    """Inter-arrival time statistics per group — the TEMPORAL
    burstiness profile (`term_burstiness` is the per-term Fano
    twin): for each key (user, host) the gaps between consecutive
    events, pooled per group, with the coefficient of variation as
    the regime flag — CV ≈ 1 is Poisson (memoryless), CV ≫ 1 is
    bursty sessions + silence (the human signature), CV ≪ 1 is a
    metronome (the bot/cron signature crawl politeness actually
    cares about).

    Gaps are exact integer epoch seconds from a (key)-partitioned
    lag ordered by ``(ts, order_col)`` — the unique tiebreaker is
    REQUIRED (the `event_transitions` determinism contract). Moments
    are exact longs; ``mean_milli = (1000·Σg) div m`` and
    ``cv_milli = floor(1000·√(m·Σg² − (Σg)²) / Σg)`` are one shape
    each (CV = sd_pop/mean; Σg = 0 or m < 2 → NULL CV).

    Returns one row per group: ``(grp, n_gaps, mean_gap_milli,
    max_gap_sec, cv_milli)``.

    Scale: ONE key-hash shuffle + per-key sort window (the
    `sessionize` plan), then a combinable group rollup.
    """
    gcol = (
        F.col(group_col).cast("string").alias("_g")
        if group_col is not None
        else F.lit("all").alias("_g")
    )
    base = events.where(
        F.col(key_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        gcol,
        F.col(key_col).alias("_k"),
        F.col(ts_col).cast("timestamp").cast("long").alias("_t"),
        F.col(order_col).alias("_o"),
    )
    w = Window.partitionBy("_k").orderBy("_t", "_o")
    gaps = base.select(
        "_g",
        (F.col("_t") - F.lag("_t").over(w)).alias("_gap"),
    ).where(F.col("_gap").isNotNull())
    agg = gaps.groupBy(F.col("_g").alias("grp")).agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum("_gap").cast("long").alias("_s"),
        F.sum(F.col("_gap") * F.col("_gap")).cast("long").alias("_q"),
        F.max("_gap").cast("long").alias("max_gap_sec"),
    )
    return agg.select(
        "grp",
        "n_gaps",
        F.when(
            F.col("n_gaps") > 0, F.expr("(1000 * _s) div n_gaps")
        )
        .cast("long")
        .alias("mean_gap_milli"),
        "max_gap_sec",
        F.when(
            (F.col("n_gaps") >= 2) & (F.col("_s") > 0),
            F.expr(
                "CAST(floor(1000.0 * sqrt(CAST(n_gaps AS DOUBLE) * _q"
                " - CAST(_s AS DOUBLE) * _s) / _s) AS BIGINT)"
            ),
        ).alias("cv_milli"),
    )


def group_trend(
    series: DataFrame,
    group_col: str,
    t_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group OLS trend screen — slope and R² of y over t for
    EVERY facet at once: "which sources' daily volumes are drifting,
    and how hard?" The screening table `theil_sen` (one robust
    slope) and `trend_gate` (one global test) don't produce, and the
    natural input to `bh_fdr` once the slopes get z-scores. t need
    not be dense — OLS doesn't care (epoch days work as-is).

    Exact long moments per group (`pearson_corr` algebra):
    ``cov = n·Σty − Σt·Σy``, ``var_t = n·Σt² − (Σt)²``, ``var_y``
    likewise; ``slope_milli = floor(1000·cov/var_t)`` and
    ``r2_milli = floor(1000·cov²/(var_t·var_y))`` — cov² and the
    denominator product run in decimal(38,0)/HUGEINT (the
    `partial_corr` envelope). Degenerate groups (n < 2, zero
    variance either side) → NULLs.

    Returns one row per group: ``(grp, n, slope_milli, r2_milli)``.

    Scale: ONE combinable rollup over the caller's (group, t, y)
    series — typically itself a daily rollup, so this is free.
    """
    base = series.where(
        F.col(group_col).isNotNull()
        & F.col(t_col).isNotNull()
        & F.col(y_col).isNotNull()
    ).select(
        F.col(group_col).cast("string").alias("grp"),
        F.col(t_col).cast("long").alias("_t"),
        F.col(y_col).cast("long").alias("_y"),
    )
    a = base.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_t").cast("long").alias("_st"),
        F.sum("_y").cast("long").alias("_sy"),
        F.sum(F.col("_t") * F.col("_y")).cast("long").alias("_sty"),
        F.sum(F.col("_t") * F.col("_t")).cast("long").alias("_stt"),
        F.sum(F.col("_y") * F.col("_y")).cast("long").alias("_syy"),
    )
    d = a.select(
        "grp",
        "n",
        (F.col("n") * F.col("_sty") - F.col("_st") * F.col("_sy"))
        .cast("long")
        .alias("_cov"),
        (F.col("n") * F.col("_stt") - F.col("_st") * F.col("_st"))
        .cast("long")
        .alias("_vt"),
        (F.col("n") * F.col("_syy") - F.col("_sy") * F.col("_sy"))
        .cast("long")
        .alias("_vy"),
    )
    return d.select(
        "grp",
        "n",
        F.when(
            (F.col("n") >= 2) & (F.col("_vt") > 0),
            F.expr(
                "CAST(floor(1000.0 * CAST(_cov AS DOUBLE)"
                " / CAST(_vt AS DOUBLE)) AS BIGINT)"
            ),
        ).alias("slope_milli"),
        F.when(
            (F.col("n") >= 2) & (F.col("_vt") > 0) & (F.col("_vy") > 0),
            F.expr(
                "CAST(floor(1000.0"
                " * CAST(CAST(_cov AS DECIMAL(38,0)) * _cov AS DOUBLE)"
                " / CAST(CAST(_vt AS DECIMAL(38,0)) * _vy AS DOUBLE))"
                " AS BIGINT)"
            ),
        ).alias("r2_milli"),
    )
