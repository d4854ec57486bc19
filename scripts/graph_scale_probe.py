"""Graph-tier scaling probe: degree-ordered triangle counting and
k-core peeling (the queries `triangle_count` + `k_core` run) over a
deterministic multi-million-edge host graph, local[2] vs local[8]
interleaved — the same two-parallelism-levels evidence
BENCH/BASELINE.md records for the flagship job and the dedup/retrieval
tiers, applied to the graph tier whose profiles differ structurally:
triangle counting is join-dominated (wedge + closure, one pass), while
k-core is round-dominated (each peel round ends in an eager
localCheckpoint barrier — a serial section more executors cannot
shrink), so the two are timed separately.

Input: a deterministic circulant-plus-chords graph over ``n_nodes``
with 100 deliberate hub nodes of degree ~n/100 — the skew regime the
degree-ordering exists for (hubs must contribute NO wedge fan-out).
Edges per node i: (i, i+1), (i, i+2), (i, 13i+5), (i, i%100), all
mod n. No randomness; the same parquet is reused across reps.

Usage: python scripts/graph_scale_probe.py [n_nodes] — one JSON line.
Not part of bench.py; results recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_NODES = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
REPS = int(os.environ.get("SCALE_PROBE_REPS", "3"))
CORES = (2, 8)
CACHE = f"/tmp/correctocr_graph_probe_{N_NODES}"


def _build_input(spark):
    from pyspark.sql import functions as F

    n = F.lit(N_NODES)
    base = spark.range(N_NODES).select(F.col("id"))
    edges = None
    for dst in (
        (F.col("id") + 1) % n,
        (F.col("id") + 2) % n,
        (F.col("id") * 13 + 5) % n,
        F.col("id") % 100,  # 100 hubs, degree ~n/100: the skew probe
    ):
        part = base.select(F.col("id").alias("src"), dst.alias("dst"))
        edges = part if edges is None else edges.unionByName(part)
    edges.repartition(64).write.mode("overwrite").parquet(CACHE)


def _job(spark):
    """Returns (tri_sec, kcore_sec, tri_nodes, core_nodes)."""
    from correctocr_spark.ops.cache import release_intermediates
    from correctocr_spark.ops.graph import k_core, triangle_count

    edges = spark.read.parquet(CACHE)
    t0 = time.monotonic()
    tri = triangle_count(edges)
    tri_nodes = tri.count()
    release_intermediates(tri)
    tri_sec = time.monotonic() - t0
    t1 = time.monotonic()
    core = k_core(edges, k=4, max_rounds=16)
    core_nodes = core.count()
    return tri_sec, time.monotonic() - t1, tri_nodes, core_nodes


def main():
    from correctocr_spark.spark.session import get_spark

    if not os.path.exists(os.path.join(CACHE, "_SUCCESS")):
        spark = get_spark(app_name="graph-probe-gen", cores=32)
        _build_input(spark)
        spark.stop()

    out = {"probe": "graph_tier", "n_nodes": N_NODES, "cores": list(CORES)}
    times = {c: [] for c in CORES}
    stage_times = {(s, c): [] for s in ("tri", "kcore") for c in CORES}
    counts = None
    for _rep in range(REPS):
        for cores in CORES:
            spark = get_spark(
                app_name=f"graph-probe-{cores}", cores=cores,
                shuffle_partitions=max(cores * 2, 16),
            )
            t0 = time.monotonic()
            tri_sec, kcore_sec, tri_nodes, core_nodes = _job(spark)
            times[cores].append(time.monotonic() - t0)
            stage_times[("tri", cores)].append(tri_sec)
            stage_times[("kcore", cores)].append(kcore_sec)
            counts = (tri_nodes, core_nodes)
            spark.stop()
    out["tri_nodes"], out["core_nodes"] = counts
    n, n4 = CORES
    for c in CORES:
        out[f"local{c}_sec"] = round(min(times[c]), 2)
    out["scaling_efficiency"] = round(
        out[f"local{n}_sec"] / (4.0 * out[f"local{n4}_sec"]), 3
    )
    pair_effs = [
        round(times[n][i] / (4.0 * times[n4][i]), 3) for i in range(REPS)
    ]
    out["pair_efficiencies"] = pair_effs
    out["matched_pair_efficiency"] = round(statistics.median(pair_effs), 3)
    for stage in ("tri", "kcore"):
        for c in CORES:
            out[f"{stage}_local{c}_sec"] = round(min(stage_times[(stage, c)]), 2)
        out[f"{stage}_pair_efficiencies"] = [
            round(
                stage_times[(stage, n)][i] / (4.0 * stage_times[(stage, n4)][i]), 3
            )
            for i in range(REPS)
        ]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
