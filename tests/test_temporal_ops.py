"""Temporal operators: as-of join, point-in-time snapshot, binned
range join (correctocr_spark/ops/temporal.py).

Semantics pinned against a naive reference computation on seeded
random data AND against DuckDB's native ASOF JOIN; plan shapes pinned
so neither operator ever degrades to a nested-loop/cartesian join.
"""

import datetime as dt
import random

import duckdb
import pytest
from pyspark.sql import functions as F

from correctocr_spark.ops.temporal import (
    asof_join,
    forward_fill,
    range_join,
    snapshot_asof,
    snapshot_delta,
)


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------- asof


def test_asof_basic_and_inclusive_tie(spark):
    left = spark.createDataFrame(
        [("a", 5, 100), ("a", 2, 101), ("a", 1, 102), ("b", 9, 103)],
        ["k", "ts", "lid"],
    )
    right = spark.createDataFrame(
        [("a", 1, "r1"), ("a", 4, "r4"), ("a", 5, "r5"), ("c", 1, "rc")],
        ["k", "ts", "rv"],
    )
    got = {
        r["lid"]: (r["rv"], r["ts_r"])
        for r in asof_join(left, right, on="k", left_ts="ts").collect()
    }
    # ts=5 matches the right row AT 5 (inclusive), not the one at 4
    assert got[100] == ("r5", 5)
    assert got[101] == ("r1", 1)
    assert got[102] == ("r1", 1)  # equality at ts=1
    assert got[103] == (None, None)  # key 'b' has no right rows
    inner = asof_join(left, right, on="k", left_ts="ts", how="inner")
    assert {r["lid"] for r in inner.collect()} == {100, 101, 102}


def test_asof_tolerance_nulls_stale_matches(spark):
    left = spark.createDataFrame([("a", 10.0, 1), ("a", 4.5, 2)], ["k", "ts", "lid"])
    right = spark.createDataFrame([("a", 4.0, "r")], ["k", "ts", "rv"])
    got = {
        r["lid"]: r["rv"]
        for r in asof_join(
            left, right, on="k", left_ts="ts", tolerance_seconds=1.0
        ).collect()
    }
    assert got == {1: None, 2: "r"}  # 10-4=6 > 1 stale; 4.5-4=0.5 ok


def test_asof_multi_key_and_tiebreak(spark):
    left = spark.createDataFrame([(1, "x", 5, 0)], ["k1", "k2", "ts", "lid"])
    right = spark.createDataFrame(
        [(1, "x", 3, 7, "lo"), (1, "x", 3, 9, "hi"), (1, "y", 4, 1, "wrongkey")],
        ["k1", "k2", "ts", "tb", "rv"],
    )
    row = asof_join(
        left,
        right,
        on=["k1", "k2"],
        left_ts="ts",
        right_cols=["rv"],
        right_tiebreak="tb",
    ).first()
    # among equal (key, ts) right rows the GREATEST tiebreak wins
    assert row["rv"] == "hi"


def test_asof_collision_suffix(spark):
    left = spark.createDataFrame([("a", 3, "L")], ["k", "ts", "val"])
    right = spark.createDataFrame([("a", 2, "R")], ["k", "ts", "val"])
    out = asof_join(left, right, on="k", left_ts="ts", suffix="_r")
    assert set(out.columns) == {"k", "ts", "val", "ts_r", "val_r"}
    row = out.first()
    assert (row["val"], row["val_r"], row["ts_r"]) == ("L", "R", 2)


def test_asof_differential_vs_duckdb(spark):
    rng = random.Random(7)
    lrows = [(rng.randrange(6), rng.randrange(1000), i) for i in range(300)]
    # unique (k, ts) on the right so DuckDB's pick is deterministic
    rseen, rrows = set(), []
    for j in range(300):
        k, t = rng.randrange(6), rng.randrange(1000)
        if (k, t) not in rseen:
            rseen.add((k, t))
            rrows.append((k, t, j))
    left = spark.createDataFrame(lrows, ["k", "ts", "lid"])
    right = spark.createDataFrame(rrows, ["k", "ts", "rid"])
    got = sorted(
        (r["lid"], r["rid"])
        for r in asof_join(left, right, on="k", left_ts="ts").collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE l(k BIGINT, ts BIGINT, lid BIGINT)")
    con.execute("CREATE TABLE r(k BIGINT, ts BIGINT, rid BIGINT)")
    con.executemany("INSERT INTO l VALUES (?,?,?)", lrows)
    con.executemany("INSERT INTO r VALUES (?,?,?)", rrows)
    want = sorted(
        (int(a), None if b is None else int(b))
        for a, b in con.sql(
            "SELECT l.lid, r.rid FROM l ASOF LEFT JOIN r "
            "ON l.k = r.k AND l.ts >= r.ts"
        ).fetchall()
    )
    assert got == want


def test_asof_plan_single_shuffle_no_join(spark):
    left = spark.createDataFrame([("a", 1, 1)], ["k", "ts", "lid"])
    right = spark.createDataFrame([("a", 1, 2)], ["k", "ts", "rid"])
    plan = _plan(asof_join(left, right, on="k", left_ts="ts"))
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_asof_null_keys_and_ts_match_sql_semantics(spark):
    """SQL `l.k = r.k AND l.ts >= r.ts` never matches a NULL key or
    NULL timestamp; the window partitioning would group nulls instead —
    pin that dirty right rows are excluded and dirty left rows get no
    match (verified against DuckDB on the same frame)."""
    lrows = [("a", 5, 1), (None, 5, 2), ("a", None, 3)]
    rrows = [("a", 3, "ok"), (None, 1, "nullkey"), ("a", None, "nullts")]
    left = spark.createDataFrame(lrows, "k string, ts int, lid int")
    right = spark.createDataFrame(rrows, "k string, ts int, rv string")
    got = {
        r["lid"]: r["rv"]
        for r in asof_join(left, right, on="k", left_ts="ts").collect()
    }
    assert got == {1: "ok", 2: None, 3: None}
    con = duckdb.connect()
    con.execute("CREATE TABLE l(k VARCHAR, ts INT, lid INT)")
    con.execute("CREATE TABLE r(k VARCHAR, ts INT, rv VARCHAR)")
    con.executemany("INSERT INTO l VALUES (?,?,?)", lrows)
    con.executemany("INSERT INTO r VALUES (?,?,?)", rrows)
    want = dict(
        con.sql(
            "SELECT l.lid, r.rv FROM l ASOF LEFT JOIN r "
            "ON l.k = r.k AND l.ts >= r.ts"
        ).fetchall()
    )
    # null-key rows: both engines agree (equality never matches NULL)
    assert got[1] == want[1] and got[2] is None and want[2] is None
    # null-TS divergence, documented: DuckDB's ASOF sorts the ordering
    # key with NULLs as comparable-largest and MATCHES a null-ts left
    # row to a null-ts right row (want[3] == 'nullts'); this operator
    # keeps strict SQL inequality semantics — NULL >= NULL is not true,
    # so no match. The registered oracle runs on non-null data.
    assert want[3] == "nullts" and got[3] is None


def test_asof_forward_direction(spark):
    left = spark.createDataFrame(
        [("a", 5, 100), ("a", 2, 101), ("a", 9, 102)], ["k", "ts", "lid"]
    )
    right = spark.createDataFrame(
        [("a", 4, "r4"), ("a", 5, "r5"), ("a", 7, "r7")], ["k", "ts", "rv"]
    )
    got = {
        r["lid"]: (r["rv"], r["ts_r"])
        for r in asof_join(
            left, right, on="k", left_ts="ts", direction="forward"
        ).collect()
    }
    assert got[100] == ("r5", 5)   # inclusive at equality
    assert got[101] == ("r4", 4)   # earliest right at-or-after 2
    assert got[102] == (None, None)  # nothing after 9
    # forward tolerance: gap measured right_ts - left_ts
    tol = {
        r["lid"]: r["rv"]
        for r in asof_join(
            left, right, on="k", left_ts="ts", direction="forward",
            tolerance_seconds=1.0,
        ).collect()
    }
    assert tol == {100: "r5", 101: None, 102: None}  # 4-2=2 > 1 stale


def test_asof_forward_differential_vs_duckdb(spark):
    rng = random.Random(23)
    lrows = [(rng.randrange(5), rng.randrange(800), i) for i in range(250)]
    rseen, rrows = set(), []
    for j in range(250):
        k, t = rng.randrange(5), rng.randrange(800)
        if (k, t) not in rseen:
            rseen.add((k, t))
            rrows.append((k, t, j))
    left = spark.createDataFrame(lrows, ["k", "ts", "lid"])
    right = spark.createDataFrame(rrows, ["k", "ts", "rid"])
    got = sorted(
        (r["lid"], r["rid"])
        for r in asof_join(
            left, right, on="k", left_ts="ts", direction="forward"
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE l(k BIGINT, ts BIGINT, lid BIGINT)")
    con.execute("CREATE TABLE r(k BIGINT, ts BIGINT, rid BIGINT)")
    con.executemany("INSERT INTO l VALUES (?,?,?)", lrows)
    con.executemany("INSERT INTO r VALUES (?,?,?)", rrows)
    want = sorted(
        (int(a), None if b is None else int(b))
        for a, b in con.sql(
            "SELECT l.lid, r.rid FROM l ASOF LEFT JOIN r "
            "ON l.k = r.k AND l.ts <= r.ts"
        ).fetchall()
    )
    assert got == want


def test_asof_rejects_bad_how(spark):
    df = spark.range(1).select(F.lit("a").alias("k"), F.lit(1).alias("ts"))
    with pytest.raises(ValueError, match="how"):
        asof_join(df, df, on="k", left_ts="ts", how="full")
    with pytest.raises(ValueError, match="direction"):
        asof_join(df, df, on="k", left_ts="ts", direction="nearest")


# ------------------------------------------------------------ snapshot


def test_snapshot_asof(spark):
    t = dt.datetime
    df = spark.createDataFrame(
        [
            ("u1", t(2024, 1, 1), 1, "old"),
            ("u1", t(2024, 1, 10), 2, "pick"),
            ("u1", t(2024, 2, 1), 3, "after-cut"),
            ("u2", t(2024, 1, 5), 4, "tie-lo"),
            ("u2", t(2024, 1, 5), 5, "tie-hi"),
        ],
        ["url", "warc_ts", "rev", "body"],
    )
    got = {
        r["url"]: r["body"]
        for r in snapshot_asof(
            df, key_col="url", ts_col="warc_ts", as_of="2024-01-15 00:00:00", tiebreak="rev"
        ).collect()
    }
    assert got == {"u1": "pick", "u2": "tie-hi"}
    latest = {
        r["url"]: r["body"]
        for r in snapshot_asof(df, key_col="url", ts_col="warc_ts", tiebreak="rev").collect()
    }
    assert latest["u1"] == "after-cut"


def test_snapshot_delta_statuses(spark):
    t = dt.datetime
    df = spark.createDataFrame(
        [
            # changed: different payload at t1 vs t2
            ("chg", t(2024, 1, 5), "v1", 1),
            ("chg", t(2024, 1, 18), "v2", 2),
            # unchanged: same payload both snapshots (no new crawl)
            ("same", t(2024, 1, 3), "s", 3),
            # added: first crawl lands between t1 and t2
            ("new", t(2024, 1, 15), "n", 4),
            # after both cutoffs: invisible
            ("future", t(2024, 2, 9), "f", 5),
        ],
        ["url", "warc_ts", "body", "rev"],
    )
    from pyspark.sql import functions as SF

    out = {
        r["url"]: (r["status"], r["fp_1"] is not None, r["fp_2"] is not None)
        for r in snapshot_delta(
            df,
            key_col="url",
            ts_col="warc_ts",
            t1="2024-01-10 00:00:00",
            t2="2024-01-20 00:00:00",
            fp_col=SF.md5(SF.col("body")),
            tiebreak="rev",
        ).collect()
    }
    assert out == {
        "chg": ("changed", True, True),
        "same": ("unchanged", True, True),
        "new": ("added", False, True),
    }


def test_snapshot_delta_plan_two_exchanges(spark):
    t = dt.datetime
    df = spark.createDataFrame(
        [("a", t(2024, 1, 1), "x", 1)], ["url", "warc_ts", "body", "rev"]
    )
    from pyspark.sql import functions as SF

    plan = _plan(
        snapshot_delta(
            df,
            t1="2024-01-05 00:00:00",
            t2="2024-01-09 00:00:00",
            fp_col=SF.md5(SF.col("body")),
            tiebreak="rev",
        )
    )
    # the outer join must reuse the snapshot windows' hash partitioning:
    # one exchange per side, none for the join itself
    assert plan.count("Exchange hashpartitioning") == 2, plan


def test_forward_fill(spark):
    df = spark.createDataFrame(
        [
            ("a", 1, 10.0, 1),
            ("a", 2, None, 2),
            ("a", 3, 30.0, 3),
            ("a", 4, None, 4),
            ("b", 1, None, 5),  # nothing before it: stays null
        ],
        ["k", "ts", "v", "eid"],
    )
    got = {
        r["eid"]: r["v"]
        for r in forward_fill(df, on="k", ts_col="ts", cols=["v"], tiebreak="eid").collect()
    }
    assert got == {1: 10.0, 2: 10.0, 3: 30.0, 4: 30.0, 5: None}


def test_forward_fill_defaults_all_value_columns(spark):
    df = spark.createDataFrame(
        [("a", 1, None, "x"), ("a", 2, 5.0, None), ("a", 3, None, None)],
        ["k", "ts", "v", "s"],
    )
    row = (
        forward_fill(df, on="k", ts_col="ts")
        .where(F.col("ts") == 3)
        .first()
    )
    assert (row["v"], row["s"]) == (5.0, "x")


# --------------------------------------------------------------- range


def _naive_range(points, intervals):
    out = []
    for pid, p in points:
        for iid, lo, hi in intervals:
            if lo <= p <= hi:
                out.append((pid, iid))
    return sorted(out)


def test_range_join_vs_naive_with_boundaries(spark):
    rng = random.Random(11)
    pts = [(i, rng.uniform(-500, 500)) for i in range(200)]
    ivs = [
        (j, lo, lo + rng.uniform(0, 80))
        for j, lo in ((j, rng.uniform(-500, 480)) for j in range(40))
    ]
    # exact-boundary and degenerate cases
    ivs += [(100, -7.0, -7.0)]  # lo == hi point interval
    pts += [(900, -7.0), (901, ivs[0][1]), (902, ivs[0][2])]  # on lo / on hi
    p = spark.createDataFrame(pts, ["pid", "x"])
    iv = spark.createDataFrame(ivs, ["iid", "lo", "hi"])
    got = sorted(
        (r["pid"], r["iid"])
        for r in range_join(p, iv, "x", "lo", "hi", bin_width=25.0).collect()
    )
    assert got == _naive_range(pts, ivs)
    # no duplicate pairs from multi-bin intervals
    assert len(got) == len(set(got))


def test_range_join_keyed(spark):
    p = spark.createDataFrame([("a", 1, 5.0), ("b", 2, 5.0)], ["k", "pid", "x"])
    iv = spark.createDataFrame([("a", 10, 0.0, 10.0)], ["k", "iid", "lo", "hi"])
    got = range_join(p, iv, "x", "lo", "hi", bin_width=4.0, on="k").collect()
    assert [(r["pid"], r["iid"]) for r in got] == [(1, 10)]


def test_range_join_timestamps(spark):
    t = dt.datetime
    p = spark.createDataFrame([(1, t(2024, 1, 1, 12, 30))], ["pid", "ts"])
    iv = spark.createDataFrame(
        [(10, t(2024, 1, 1, 12, 0), t(2024, 1, 1, 13, 0)), (11, t(2024, 1, 1, 14, 0), t(2024, 1, 1, 15, 0))],
        ["iid", "lo", "hi"],
    )
    got = range_join(p, iv, "ts", "lo", "hi", bin_width=600.0).collect()
    assert [r["iid"] for r in got] == [10]


def test_range_join_guard_raises_on_runaway_interval(spark):
    p = spark.createDataFrame([(1, 5.0)], ["pid", "x"])
    iv = spark.createDataFrame([(10, 0.0, 1e9)], ["iid", "lo", "hi"])
    with pytest.raises(Exception, match="range_join: interval spans"):
        range_join(p, iv, "x", "lo", "hi", bin_width=1.0, max_bins_per_interval=100).collect()


def test_range_join_rejects_collisions_and_bad_width(spark):
    p = spark.createDataFrame([(1, 5.0)], ["pid", "x"])
    iv = spark.createDataFrame([(1, 0.0, 9.0)], ["pid", "lo", "hi"])
    with pytest.raises(ValueError, match="overlapping"):
        range_join(p, iv, "x", "lo", "hi", bin_width=1.0)
    iv2 = spark.createDataFrame([(1, 0.0, 9.0)], ["iid", "lo", "hi"])
    with pytest.raises(ValueError, match="bin_width"):
        range_join(p, iv2, "x", "lo", "hi", bin_width=0)


def test_range_join_plan_no_nested_loop(spark):
    p = spark.createDataFrame([(1, 5.0)], ["pid", "x"])
    iv = spark.createDataFrame([(10, 0.0, 9.0)], ["iid", "lo", "hi"])
    plan = _plan(range_join(p, iv, "x", "lo", "hi", bin_width=4.0))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, plan


class TestCrawlFreshness:
    def test_hand_ages(self, spark):
        import datetime

        from correctocr_spark.ops.temporal import crawl_freshness

        ts = lambda d: datetime.datetime(2024, 1, d)
        pages = spark.createDataFrame(
            [
                ("http://a.com/1", ts(1)),   # superseded
                ("http://a.com/1", ts(10)),  # latest -> age 21
                ("http://a.com/2", ts(28)),  # age 3
                ("http://b.com/1", ts(2)),   # age 29
            ],
            ["url", "warc_ts"],
        )
        out = {r["host"]: r for r in
               crawl_freshness(pages, "2024-01-31 00:00:00", stale_after_days=20).collect()}
        a = out["a.com"]
        assert (a["n_urls"], a["max_age_days"], a["stale_urls"], a["stale_share_bp"]) == (2, 21, 1, 5000)
        assert a["median_age_days"] == 12.0  # interpolated (21+3)/2
        b = out["b.com"]
        assert (b["n_urls"], b["median_age_days"], b["stale_share_bp"]) == (1, 29.0, 10000)

    def test_as_of_excludes_future_snapshots(self, spark):
        import datetime

        from correctocr_spark.ops.temporal import crawl_freshness

        pages = spark.createDataFrame(
            [
                ("http://a.com/1", datetime.datetime(2024, 1, 1)),
                ("http://a.com/1", datetime.datetime(2024, 3, 1)),  # after cut
            ],
            ["url", "warc_ts"],
        )
        out = crawl_freshness(pages, "2024-01-31 00:00:00", stale_after_days=10).collect()
        assert out[0]["max_age_days"] == 30  # the future row never wins
