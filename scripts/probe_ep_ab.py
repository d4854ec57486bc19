"""A/B the aggregate cost/benefit of ensure_parallelism at sf0.1.

Runs the frozen bench query loop (no scaling) twice in one process
window: arm A = normal, arm B = ensure_parallelism patched to identity
in every ops module that imported it. Prints both JSON lines.

Diagnostic only — identifies call sites where the local repartition
exchange costs more than the parallelism wins (guide §1: measure
first). Results are identical either way; this never ships.
"""
from __future__ import annotations

import importlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_QUERY_REPS", "2"))

OPS_MODULES = [
    "correctocr_spark.ops.dedup",
    "correctocr_spark.ops.textstats",
    "correctocr_spark.ops.similarity",
    "correctocr_spark.ops.graph",
    "correctocr_spark.ops.filters",
    "correctocr_spark.ops.cleaning",
    "correctocr_spark.ops.temporal",
    "correctocr_spark.ops.webindex",
    "correctocr_spark.ops.sketch",
    "correctocr_spark.ops.curate",
    "correctocr_spark.ops.multimodal",
]


def set_ep(identity: bool) -> None:
    import correctocr_spark.ops.dedup as d

    if not hasattr(d, "_real_ensure_parallelism"):
        d._real_ensure_parallelism = d.ensure_parallelism
    fn = (
        (lambda df, min_partitions=None: df)
        if identity
        else d._real_ensure_parallelism
    )
    for name in OPS_MODULES:
        mod = importlib.import_module(name)
        if hasattr(mod, "ensure_parallelism"):
            mod.ensure_parallelism = fn


def run_arm(spark, queries, names):
    timings = {}
    for name in names:
        best = float("inf")
        for _ in range(REPS):
            t0 = time.monotonic()
            df = queries[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.monotonic() - t0)
            spark.catalog.clearCache()
        timings[name] = round(best, 3)
    return timings


def main() -> None:
    import bench as bench_mod
    import __spark_entry__ as entry_mod
    from correctocr_spark.spark.session import get_spark

    names = bench_mod.HEADLINE
    spark = get_spark(app_name="probe-ep-ab", cores=CPUS)
    queries = entry_mod.queries()
    set_ep(False)
    a = run_arm(spark, queries, names)
    set_ep(True)
    b = run_arm(spark, queries, names)
    set_ep(False)
    spark.stop()
    print(json.dumps({"arm": "normal", "value": round(sum(a.values()), 3), "queries": a}))
    print(json.dumps({"arm": "noep", "value": round(sum(b.values()), 3), "queries": b}))


if __name__ == "__main__":
    main()
