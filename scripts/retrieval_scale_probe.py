"""Retrieval-tier scaling probe: BM25 scoring + the posting-list size
audit (the queries `bm25_topk` + `postings_audit` compose) at ~100x the
driver-oracle document count, local[2] vs local[8] interleaved — the
same two-parallelism-levels evidence BENCH/BASELINE.md records for the
flagship correction job and the dedup chain, applied to the index tier
whose profile differs from both: one corpus-wide explode feeding
map-side-combined aggregations (BM25's dl/TF path) plus a Zipf-skewed
per-term lag window (the postings audit) with NO iterative barrier
rounds at all — the purest shuffle-throughput tier in the engine.

Input: the sf0.1 documents table tiled ``n_copies`` times with copy-
prefixed words (same construction as the dedup probe: vocabulary scales
with copies, so per-term posting lists keep their natural length
instead of growing 100x — the regime a sharded index actually sees).
Queries probe one copy's vocabulary so matched postings stay
corpus-proportional. Deterministic end to end.

Usage: python scripts/retrieval_scale_probe.py [n_copies] — one JSON
line. Not part of bench.py; results recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_COPIES = int(sys.argv[1]) if len(sys.argv) > 1 else 100
REPS = int(os.environ.get("SCALE_PROBE_REPS", "3"))
CORES = (2, 8)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# same tiling as the dedup probe -> reuse its cached input if present
CACHE = f"/tmp/correctocr_dedup_probe_{N_COPIES}"


def _build_input(spark):
    from pyspark.sql import functions as F

    base = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    n_base = base.count()
    copies = spark.range(N_COPIES).select(F.col("id").alias("_copy"))
    tiled = base.crossJoin(copies).select(
        (F.col("doc_id") + F.col("_copy") * n_base).alias("doc_id"),
        F.array_join(
            F.transform(
                F.split(F.coalesce(F.col("text"), F.lit("")), " "),
                lambda w: F.concat(
                    F.lit("c"), F.col("_copy").cast("string"), F.lit("_"), w
                ),
            ),
            " ",
        ).alias("text"),
    )
    tiled.repartition(64).write.mode("overwrite").parquet(CACHE)
    return n_base * N_COPIES


def _job(spark):
    """Returns (bm25_sec, postings_sec): BM25 top-k for three keyword
    queries against one copy's vocabulary, then the per-term postings
    audit over the full corpus, timed separately — BM25 is bounded by
    the corpus explode + two keyed aggs, the audit by the Zipf-skewed
    per-term window; one blended number would hide which half a bigger
    cluster helps."""
    from correctocr_spark.ops.similarity import bm25_topk
    from correctocr_spark.ops.webindex import postings_size_audit

    docs = spark.read.parquet(CACHE)
    qt = spark.createDataFrame(
        [
            (0, "c0_spark"),
            (0, "c0_join"),
            (1, "c1_window"),
            (1, "c1_merge"),
            (2, "c2_customer"),
        ],
        "query_id long, term string",
    )
    t0 = time.monotonic()
    res = bm25_topk(docs, qt, k=10)
    n_hits = res.count()
    from correctocr_spark.ops.cache import release_intermediates

    release_intermediates(res)
    bm25_sec = time.monotonic() - t0
    t1 = time.monotonic()
    n_terms = postings_size_audit(docs).count()
    return bm25_sec, time.monotonic() - t1, n_hits, n_terms


def main():
    from correctocr_spark.spark.session import get_spark

    if not os.path.exists(os.path.join(CACHE, "_SUCCESS")):
        spark = get_spark(app_name="retr-probe-gen", cores=32)
        n_docs = _build_input(spark)
        spark.stop()
    else:
        spark = get_spark(app_name="retr-probe-count", cores=8)
        n_docs = spark.read.parquet(CACHE).count()
        spark.stop()

    out = {"probe": "retrieval_tier", "n_docs": n_docs, "cores": list(CORES)}
    times = {c: [] for c in CORES}
    stage_times = {("bm25", c): [] for c in CORES}
    stage_times.update({("postings", c): [] for c in CORES})
    n_hits = n_terms = None
    for _rep in range(REPS):
        for cores in CORES:
            spark = get_spark(
                app_name=f"retr-probe-{cores}",
                cores=cores,
                shuffle_partitions=max(cores * 2, 16),
            )
            t0 = time.monotonic()
            bm25_sec, postings_sec, n_hits, n_terms = _job(spark)
            times[cores].append(time.monotonic() - t0)
            stage_times[("bm25", cores)].append(bm25_sec)
            stage_times[("postings", cores)].append(postings_sec)
            spark.stop()
    out["bm25_hits"] = n_hits
    out["postings_terms"] = n_terms
    n, n4 = CORES
    for c in CORES:
        best = min(times[c])
        out[f"local{c}_sec"] = round(best, 2)
        out[f"local{c}_docs_per_sec"] = round(n_docs / best, 1)
    out["scaling_efficiency"] = round(
        out[f"local{n4}_docs_per_sec"] / (4.0 * out[f"local{n}_docs_per_sec"]), 3
    )
    pair_effs = [
        round(times[n][i] / (4.0 * times[n4][i]), 3) for i in range(REPS)
    ]
    out["pair_efficiencies"] = pair_effs
    out["matched_pair_efficiency"] = round(statistics.median(pair_effs), 3)
    for stage in ("bm25", "postings"):
        for c in CORES:
            out[f"{stage}_local{c}_sec"] = round(min(stage_times[(stage, c)]), 2)
        effs = [
            round(
                stage_times[(stage, n)][i] / (4.0 * stage_times[(stage, n4)][i]),
                3,
            )
            for i in range(REPS)
        ]
        out[f"{stage}_pair_efficiencies"] = effs
        out[f"{stage}_matched_pair_efficiency"] = round(statistics.median(effs), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
