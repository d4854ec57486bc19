"""Structured Streaming front-end.

The reference has no streaming (SURVEY.md §2.11) — its closest analog is
a background thread incrementally ingesting documents
(server.py:505-551). Here that becomes the same batch pipeline applied
per micro-batch via ``foreachBatch`` (pure composition — no new
semantics to match), plus a genuinely streaming-native operator:
watermarked windowed crawl-rate metrics over ``warc_ts``.

At production scale the source is the Iceberg/parquet pages table with
new files landing per crawl segment; ``availableNow`` gives catch-up
batch semantics, a continuous trigger gives tailing.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .audit import AuditedRun
from .pipeline import CorrectionPipeline
from .synth import PAGES_SCHEMA


def pages_stream(spark: SparkSession, input_path: str) -> DataFrame:
    """File-source stream of pages parquet (new files = new crawl data)."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_path)
    )


def correct_stream(
    pipeline: CorrectionPipeline,
    pages: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    run_id: str = "stream",
    available_now: bool = True,
):
    """Run the correction pipeline continuously via foreachBatch.

    Each micro-batch goes through the full batch DAG and the audited
    writer, so resume/idempotence semantics are identical to batch; the
    streaming checkpoint adds exactly-once file tracking on top.
    """
    run = AuditedRun(pipeline.spark, output_dir, run_id=run_id)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        pending = run.pending(batch_df)
        run.write(pipeline.corrected(pending))

    writer = (
        pages.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def crawl_rate_metrics(
    pages: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming-native op: watermarked tumbling-window ingestion metrics
    per language (late pages beyond the watermark are dropped, state is
    bounded — the standard late-data story)."""
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum(F.length("text")).alias("n_chars"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n_pages",
            "n_chars",
        )
    )
