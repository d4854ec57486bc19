"""Dump .explain('formatted') for declared queries to a directory.

Usage: python scripts/dump_plans.py OUT_DIR [suffix] [q1 q2 ...]

Builds each query (no execution beyond what its constructor runs) and
writes ``OUT_DIR/<name><suffix>.txt``. With no query names, dumps every
bench HEADLINE query.
"""
from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    out_dir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else ""
    names = sys.argv[3:]
    import bench as bench_mod
    import __spark_entry__ as entry_mod
    from correctocr_spark.spark.session import get_spark

    if not names:
        names = bench_mod.HEADLINE
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump-plans", cores=CPUS)
    queries = entry_mod.queries()
    for name in names:
        try:
            df = queries[name](spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception:
            txt = "ERROR\n" + traceback.format_exc()
        with open(os.path.join(out_dir, f"{name}{suffix}.txt"), "w") as fh:
            fh.write(txt)
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
