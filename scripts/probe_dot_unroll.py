"""A/B probe: interpreted HOF dot/norm (aggregate over zip_with) vs a
fixed-dim UNROLLED sum that whole-stage codegen compiles.

Semantics: the unrolled form seeds with lit(0.0) and left-folds
additions in index order — the exact evaluation order of the aggregate
fold, so doubles are bit-identical. Runs the full margin_mine query
both ways in one window; verifies identical output.
Diagnostic only; never ships.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("PROBE_REPS", "3"))
DIM = 64

from pyspark.sql import functions as F  # noqa: E402


def dot_unrolled(a, b, dim):
    acc = F.lit(0.0)
    for i in range(dim):
        acc = acc + a[i] * b[i]
    return acc


def norm_unrolled(a, dim):
    acc = F.lit(0.0)
    for i in range(dim):
        acc = acc + a[i] * a[i]
    return F.sqrt(acc)


def run(spark, unrolled):
    import correctocr_spark.ops.similarity as sim
    import __spark_entry__ as entry_mod

    saved = (sim.dot_col, sim.norm_col)
    if unrolled:
        sim.dot_col = lambda a, b: dot_unrolled(a, b, DIM)
        sim.norm_col = lambda a: norm_unrolled(a, DIM)
    try:
        t0 = time.monotonic()
        df = entry_mod.queries()["margin_mine"](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        wall = time.monotonic() - t0
        rows = sorted(map(tuple, df.collect()))
    finally:
        sim.dot_col, sim.norm_col = saved
    return wall, rows


def main() -> None:
    from correctocr_spark.spark.session import get_spark

    spark = get_spark(app_name="probe-dot-unroll", cores=CPUS)
    ref = None
    for rep in range(REPS):
        for unrolled in (False, True):
            spark.catalog.clearCache()
            wall, rows = run(spark, unrolled)
            if ref is None:
                ref = rows
            print(
                f"rep{rep} unrolled={unrolled} wall={wall:6.3f} "
                f"rows={len(rows)} equal={rows == ref}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
