"""A/B probe: jaccard_pairs doc-size computation — window over the
exploded shingle stream (current) vs post-aggregation size joins.

Variants, all value-identical by construction (verified by sorted
collect):
  A  current: _n = count over Window.partitionBy(doc_id), rides postings
  B  sizes from docs row-locally (size of the shingle array, no explode),
     joined onto the aggregated pair table
  C  sizes from shingles.groupBy(doc_id).count() (re-evaluates explode),
     joined onto the aggregated pair table

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
THRESH = float(os.environ.get("PROBE_THRESH", "0.5"))

from pyspark.sql import functions as F  # noqa: E402


def pairs_from_posting(posting):
    return (
        posting.select(F.posexplode("_ds").alias("_i", "_a"), "_ds")
        .select(
            F.col("_a.doc_id").alias("doc_a") if "_n" not in posting.schema["_ds"].dataType.elementType.names else F.col("_a.doc_id").alias("doc_a"),
        )
    )


def variant_a(shingles, threshold):
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
    out = inter.select(
        "doc_a", "doc_b",
        F.round(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6).alias("jaccard"),
    )
    return out.where(F.col("jaccard") >= threshold)


def variant_joined(shingles, sizes, threshold):
    posting = (
        shingles.groupBy("shingle")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("_ds"))
        .where(F.size("_ds") >= 2)
    )
    pairs = (
        posting.select(F.posexplode("_ds").alias("_i", "doc_a"), "_ds")
        .select(
            "doc_a",
            F.explode(F.slice("_ds", F.col("_i") + 2, F.size("_ds"))).alias("doc_b"),
        )
    )
    inter = pairs.groupBy("doc_a", "doc_b").agg(F.count(F.lit(1)).alias("n_inter"))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("_n").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("_n").alias("n_b"))
    joined = inter.join(sa, on="doc_a").join(sb, on="doc_b")
    out = joined.select(
        "doc_a", "doc_b",
        F.round(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6).alias("jaccard"),
    )
    return out.where(F.col("jaccard") >= threshold)


def main() -> None:
    import __spark_entry__ as entry_mod
    from correctocr_spark.spark.session import get_spark
    from correctocr_spark.ops.dedup import shingles_df, shingles_col, ensure_parallelism

    spark = get_spark(app_name="probe-jp-sizes", cores=CPUS)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    k = entry_mod.SHINGLE_K

    def build(v):
        sh = shingles_df(docs, k=k)
        if v == "A":
            return variant_a(sh, THRESH)
        if v == "B":
            sizes = ensure_parallelism(docs).select(
                F.col("doc_id"), F.size(shingles_col("text", k)).alias("_n")
            ).where(F.col("_n") > 0)
            return variant_joined(sh, sizes, THRESH)
        if v == "C":
            sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("_n"))
            return variant_joined(sh, sizes, THRESH)

    ref = None
    for rep in range(REPS):
        for v in ("A", "B", "C"):
            t0 = time.monotonic()
            out = build(v)
            out.write.format("noop").mode("overwrite").save()
            wall = time.monotonic() - t0
            rows = sorted(map(tuple, out.collect()))
            if ref is None:
                ref = rows
            print(f"rep{rep} {v} wall={wall:6.3f} rows={len(rows)} equal={rows == ref}")
            spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
