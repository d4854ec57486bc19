"""Same-window QUERY-level A/B of jaccard_pairs' size computation:
the shipped post-aggregation size join (C) vs the former
count-over-window (A), monkeypatched in, for the declared queries that
consume the pair table multiple times (dedup_threshold_sweep: 3 legs;
global_transitivity: barrier + stats). Verifies identical output.
Diagnostic only; never ships.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("PROBE_REPS", "4"))

from pyspark.sql import functions as F  # noqa: E402


def jaccard_pairs_window(shingles, candidates=None, threshold=0.0):
    """The pre-round-6-session-3 form (count-over-window sizes)."""
    from pyspark.sql import Window

    sized = shingles.withColumn(
        "_n", F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
    )
    posting = (
        sized.groupBy("shingle")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "_n"))).alias("_ds"))
        .where(F.size("_ds") >= 2)
    )
    pairs = (
        posting.select(F.posexplode("_ds").alias("_i", "_a"), "_ds")
        .select(
            F.col("_a.doc_id").alias("doc_a"),
            F.col("_a._n").alias("n_a"),
            F.explode(F.slice("_ds", F.col("_i") + 2, F.size("_ds"))).alias("_b"),
        )
        .select("doc_a", "n_a", F.col("_b.doc_id").alias("doc_b"), F.col("_b._n").alias("n_b"))
    )
    inter = pairs.groupBy("doc_a", "doc_b").agg(
        F.count(F.lit(1)).alias("n_inter"),
        F.min("n_a").alias("n_a"),
        F.min("n_b").alias("n_b"),
    )
    if candidates is not None:
        inter = inter.join(candidates, on=["doc_a", "doc_b"], how="left_semi")
    out = inter.select(
        "doc_a", "doc_b",
        F.round(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6).alias("jaccard"),
    )
    return out.where(F.col("jaccard") >= threshold)


def main() -> None:
    import __spark_entry__ as entry_mod
    import correctocr_spark.ops.dedup as dd
    from correctocr_spark.spark.session import get_spark

    names = sys.argv[1:] or ["dedup_threshold_sweep", "global_transitivity"]
    spark = get_spark(app_name="probe-jp-query-ab", cores=CPUS)
    queries = entry_mod.queries()
    shipped = dd.jaccard_pairs

    refs = {}
    for rep in range(REPS):
        for arm, impl in (("C-shipped", shipped), ("A-window", jaccard_pairs_window)):
            dd.jaccard_pairs = impl
            try:
                for name in names:
                    t0 = time.monotonic()
                    df = queries[name](spark, SF_DIR)
                    df.write.format("noop").mode("overwrite").save()
                    wall = time.monotonic() - t0
                    rows = sorted(map(tuple, df.collect()))
                    if name not in refs:
                        refs[name] = rows
                    print(
                        f"rep{rep} {arm:9s} {name:24s} wall={wall:6.3f} "
                        f"equal={rows == refs[name]}"
                    )
                    spark.catalog.clearCache()
            finally:
                dd.jaccard_pairs = shipped
    spark.stop()


if __name__ == "__main__":
    main()
