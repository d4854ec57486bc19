"""A/B probe: remove_duplicate_spans span-stream materialization.

  A  current: exploded.persist()+count() barrier, both consumers read
     the cached span stream
  B  no persist: both consumers re-derive the span stream from the
     corpus scan (explode+md5 is whole-stage codegen'd — recompute may
     be cheaper than caching a table larger than the corpus)

Runs the declared span_removal query both ways in one window; verifies
identical output. Diagnostic only; never ships.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("PROBE_REPS", "3"))

from pyspark.sql import functions as F  # noqa: E402


def build(spark, sf_dir, n, persist):
    from correctocr_spark.ops.dedup import ensure_parallelism, normalized_words

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = normalized_words("text")
    base = docs.select(F.col("doc_id"), words.alias("_ws"))
    exploded = (
        ensure_parallelism(docs)
        .select(F.col("doc_id"), words.alias("_ws"))
        .where(F.size("_ws") >= n)
        .select(
            "doc_id", "_ws",
            F.explode(F.sequence(F.lit(0), F.size("_ws") - n)).alias("pos"),
        )
        .select(
            "doc_id", "pos",
            F.md5(F.concat_ws(" ", F.slice(F.col("_ws"), F.col("pos") + 1, n))).alias("span_hash"),
        )
    )
    if persist:
        exploded = exploded.persist()
        exploded.count()
    hot = (
        exploded.groupBy("span_hash")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") >= 2)
        .select("span_hash")
    )
    covered = (
        exploded.join(hot, on="span_hash", how="left_semi")
        .select("doc_id", F.explode(F.sequence(F.col("pos"), F.col("pos") + n - 1)).alias("idx"))
        .distinct()
    )
    wordpos = base.select("doc_id", F.posexplode("_ws").alias("idx", "w"))
    kept = wordpos.join(covered, on=["doc_id", "idx"], how="left_anti")
    clean = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("idx"), F.col("w")))),
                lambda s: s["w"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("_n_kept"),
    )
    out = (
        base.select("doc_id", F.size("_ws").alias("n_words"))
        .join(clean, on="doc_id", how="left")
        .select(
            "doc_id",
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            F.col("n_words").cast("long").alias("n_words"),
            (F.col("n_words") - F.coalesce(F.col("_n_kept"), F.lit(0))).cast("long").alias("n_removed"),
        )
    )
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "clean_text", "n_words", "n_removed",
    )


def main() -> None:
    import __spark_entry__ as entry_mod
    from correctocr_spark.spark.session import get_spark

    spark = get_spark(app_name="probe-span-persist", cores=CPUS)
    n = entry_mod.DUP_SPAN_N
    ref = None
    for rep in range(REPS):
        for persist in (True, False):
            t0 = time.monotonic()
            out = build(spark, SF_DIR, n, persist)
            out.write.format("noop").mode("overwrite").save()
            wall = time.monotonic() - t0
            h = sorted(map(tuple, out.select("doc_id", "n_words", "n_removed").collect()))
            if ref is None:
                ref = h
            print(f"rep{rep} persist={persist} wall={wall:6.3f} rows={len(h)} equal={h == ref}")
            spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
