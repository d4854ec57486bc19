"""Decompose the per-query fixed overhead at sf0.1 (guide §1).

For a set of representative queries, times separately:
  - construction  (queries[name](spark, sf_dir) returning the DataFrame)
  - planning      (force executedPlan)
  - execution     (noop write, after planning)
Also times bare spark.read.parquet and a 1-stage trivial job.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    import __spark_entry__ as entry_mod
    from correctocr_spark.spark.session import get_spark

    names = sys.argv[1:] or [
        "sample_stratified", "welch_t", "mannwhitney", "kendall_tau",
        "token_counts", "quality", "corpus_rollup", "ht_estimate",
    ]
    spark = get_spark(app_name="probe-overhead", cores=CPUS)
    queries = entry_mod.queries()

    t0 = time.monotonic()
    df0 = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    print(f"read.parquet(cold): {time.monotonic()-t0:.3f}")
    t0 = time.monotonic()
    spark.read.parquet(f"{SF_DIR}/documents.parquet")
    print(f"read.parquet(warm): {time.monotonic()-t0:.3f}")
    t0 = time.monotonic()
    df0.limit(10).write.format("noop").mode("overwrite").save()
    print(f"trivial job: {time.monotonic()-t0:.3f}")

    for name in names:
        for rep in range(3):
            t0 = time.monotonic()
            df = queries[name](spark, SF_DIR)
            t1 = time.monotonic()
            # force analysis+optimization+physical planning
            df._jdf.queryExecution().executedPlan()
            t2 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.monotonic()
            print(
                f"{name:22s} rep{rep} construct={t1-t0:6.3f} "
                f"plan={t2-t1:6.3f} exec={t3-t2:6.3f} total={t3-t0:6.3f}"
            )
            spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
