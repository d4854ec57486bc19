"""Extra benchmark harness for the optimization rounds (guide §1.4).

NOT the driver-facing bench — ``bench.py`` stays frozen. This file
times an arbitrary subset of the declared queries with exactly the
frozen bench's methodology (noop sink, best-of-N with the cache cleared
between reps, t0 before query construction) so per-operator changes can
be A/B'd in isolation, and can dump ``.explain('formatted')`` plans.

Usage:
    python bench_extra.py q1 q2 ...          # time those queries
    python bench_extra.py --reps 3 q1 ...
    python bench_extra.py --explain DIR q1…  # also write plan files
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    import __spark_entry__ as entry_mod
    from correctocr_spark.spark.session import get_spark

    args = sys.argv[1:]
    reps = 3
    explain_dir = None
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        elif args[i] == "--explain":
            explain_dir = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1

    spark = get_spark(app_name="bench-extra", cores=CPUS)
    queries = entry_mod.queries()
    timings = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        best = float("inf")
        for _rep in range(reps):
            t0 = time.monotonic()
            df = queries[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.monotonic() - t0)
            spark.catalog.clearCache()
        timings[name] = round(best, 3)
        if explain_dir:
            os.makedirs(explain_dir, exist_ok=True)
            df = queries[name](spark, SF_DIR)
            with open(os.path.join(explain_dir, f"{name}.txt"), "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
            spark.catalog.clearCache()
    spark.stop()
    print(json.dumps({"queries": timings, "sum": round(sum(timings.values()), 3)}))


if __name__ == "__main__":
    main()
