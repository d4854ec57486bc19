"""Dedup-tier scaling probe: the MinHash -> LSH bands -> candidate
pairs -> connected-components chain (the queries `minhash_lsh_pairs` +
`dedup_groups` compose) at ~100x the driver-oracle document count,
local[2] vs local[8] interleaved — the same two-parallelism-levels
evidence BENCH/BASELINE.md records for the flagship correction job,
applied to the dedup tier whose shuffles (band self-join, CC rounds)
have a different scaling profile than the UDF-dense correction path.

Input: the sf0.1 documents table tiled ``n_copies`` times with every
word prefixed by the copy index, so copies are DISSIMILAR (no
cross-copy near-dup blowup) while each copy keeps the original
corpus's natural near-dup structure — candidate volume scales linearly
with corpus size, which is the regime the banded join is designed for.
Deterministic end to end (no randomness; same input parquet reused).

Usage: python scripts/dedup_scale_probe.py [n_copies] — one JSON line.
Not part of bench.py; results recorded in BENCH/BASELINE.md.
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
        # prefix every word with the copy index: keeps WITHIN-copy
        # similarity structure, destroys cross-copy similarity
        F.array_join(
            F.transform(
                F.split(F.coalesce(F.col("text"), F.lit("")), " "),
                lambda w: F.concat(F.lit("c"), F.col("_copy").cast("string"), F.lit("_"), w),
            ),
            " ",
        ).alias("text"),
    )
    tiled.repartition(64).write.mode("overwrite").parquet(CACHE)
    return n_base * N_COPIES


def _job(spark):
    """Returns (pairs_sec, cc_sec, labeled): the scan/shuffle-dominated
    candidate generation and the iterative CC half timed separately —
    CC's O(log d) rounds each end in an eager localCheckpoint barrier
    (a serial section an executor count cannot shrink), so its scaling
    profile is structurally worse than the banded join's; reporting one
    blended number would hide which half to grow the cluster for."""
    from correctocr_spark.ops.dedup import (
        connected_components,
        lsh_candidate_pairs,
        minhash_signatures,
        shingles_df,
    )

    docs = spark.read.parquet(CACHE)
    sh = shingles_df(docs, k=3)
    sig = minhash_signatures(sh, num_hashes=8)
    t0 = time.monotonic()
    pairs = lsh_candidate_pairs(sig, num_hashes=8, bands=4, max_bucket=50)
    pairs = pairs.localCheckpoint(eager=True)  # materialized; CC timed alone
    pairs_sec = time.monotonic() - t0
    t1 = time.monotonic()
    labeled = connected_components(pairs).count()
    return pairs_sec, time.monotonic() - t1, labeled


def main():
    from correctocr_spark.spark.session import get_spark

    if not os.path.exists(os.path.join(CACHE, "_SUCCESS")):
        spark = get_spark(app_name="dedup-probe-gen", cores=32)
        n_docs = _build_input(spark)
        spark.stop()
    else:
        spark = get_spark(app_name="dedup-probe-count", cores=8)
        n_docs = spark.read.parquet(CACHE).count()
        spark.stop()

    out = {"probe": "dedup_chain", "n_docs": n_docs, "cores": list(CORES)}
    times = {c: [] for c in CORES}
    stage_times = {("pairs", c): [] for c in CORES}
    stage_times.update({("cc", c): [] for c in CORES})
    labeled = None
    for _rep in range(REPS):
        for cores in CORES:
            spark = get_spark(
                app_name=f"dedup-probe-{cores}", cores=cores,
                shuffle_partitions=max(cores * 2, 16),
            )
            t0 = time.monotonic()
            pairs_sec, cc_sec, labeled = _job(spark)
            times[cores].append(time.monotonic() - t0)
            stage_times[("pairs", cores)].append(pairs_sec)
            stage_times[("cc", cores)].append(cc_sec)
            spark.stop()
    out["labeled_docs"] = labeled
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
    for stage in ("pairs", "cc"):
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
