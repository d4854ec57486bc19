"""Audit table, per-partition lineage/metrics, checkpoint-resume.

North-rule requirements: the job writes per-partition lineage + token-bin
metrics to an audit table and resumes from checkpoint by anti-joining
completed url partitions. This mirrors the reference's ``is_done`` /
``skip_done`` pruning (workspace.py:143-160, document.py:133-151) — its
per-step idempotence becomes an idempotent partition-overwrite write plus
a left-anti join at the read stage.

Sandbox storage is parquet with hash-bucketed url partitions (``pkey``);
on a real deployment the same layout maps to an Iceberg table with
``overwritePartitions()`` — REPLACE-by-PK ≙ partition overwrite keyed by
url bucket (reference ``_db.py:232-331``).
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: number of url-hash buckets used as the physical partition key; salts
#: skewed hosts across buckets (hash of full url, not host)
DEFAULT_BUCKETS = 64


def with_partition_key(df: DataFrame, buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """Deterministic url-hash bucket — the unit of overwrite/resume."""
    return df.withColumn("pkey", F.pmod(F.xxhash64("url"), F.lit(buckets)).cast("int"))


def bin_metrics(tokens: DataFrame) -> DataFrame:
    """Token-bin metrics (heuristics.py:118-122, A2/A3): per-bin counts +
    annotator workload, computed as one native aggregation."""
    return (
        tokens.where(F.col("bin").isNotNull())
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("token_count"),
            F.sum(F.when(F.col("heuristic") == "annotator", 1).otherwise(0)).alias(
                "annotator_required"
            ),
        )
        .orderBy("bin")
    )


def partition_lineage(corrected: DataFrame, run_id: str, buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """Per-partition lineage: url bucket -> doc/token counts + run id."""
    return (
        with_partition_key(corrected, buckets)
        .groupBy("pkey")
        .agg(
            F.count(F.lit(1)).alias("url_count"),
            F.sum("index_count").alias("index_count"),
            F.sum("token_count").alias("token_count"),
            F.sum("corrected_count").alias("corrected_count"),
            F.min(F.col("done").cast("int")).cast("boolean").alias("completed"),
        )
        .withColumn("run_id", F.lit(run_id))
        .withColumn("lineage", F.concat_ws(":", F.lit("correctocr"), F.lit(run_id), F.col("pkey")))
    )


class AuditedRun:
    """Resumable run: anti-join completed urls, write results + audit."""

    def __init__(self, spark: SparkSession, output_dir: str, run_id: str = "run", buckets: int = DEFAULT_BUCKETS):
        self.spark = spark
        self.output_dir = output_dir
        self.run_id = run_id
        self.buckets = buckets
        self.corrected_path = os.path.join(output_dir, "corrected")
        self.audit_path = os.path.join(output_dir, "audit")

    def completed_urls(self) -> Optional[DataFrame]:
        try:
            done = self.spark.read.parquet(self.corrected_path)
            return done.select("url")
        except Exception:
            return None

    def pending(self, pages: DataFrame) -> DataFrame:
        """Checkpoint-resume: left-anti join against completed urls."""
        done = self.completed_urls()
        if done is None:
            return pages
        return pages.join(F.broadcast(done), on="url", how="left_anti")

    def write(self, corrected: DataFrame) -> None:
        out = with_partition_key(corrected, self.buckets)
        (
            out.write.mode("append")
            .partitionBy("pkey")
            .parquet(self.corrected_path)
        )
        lineage = partition_lineage(corrected, self.run_id, self.buckets)
        lineage.write.mode("append").parquet(self.audit_path)
