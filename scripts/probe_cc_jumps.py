"""A/B probe: connected_components with 1 vs 2 pointer jumps per round.

Builds the sf0.1 MinHash-LSH pair graph once, then alternates the two
CC variants in one process window (shared-host fairness), reporting
per-round changed counts, per-variant wall time, and an output-equality
check. Diagnostic only; never ships.
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


def cc_variant(pairs, jumps: int, max_iterations: int = 20):
    """connected_components with `jumps` pointer jumps per round (>=1).

    jumps=1 reproduces ops.dedup.connected_components exactly."""
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .distinct()
        .persist()
    )
    labels = None
    changed = 0
    rounds = []
    for it in range(max_iterations):
        t0 = time.monotonic()
        if it == 0:
            cand = edges.select(
                F.col("src").alias("id"),
                F.col("dst").alias("_c"),
                F.lit(None).cast(edges.schema["src"].dataType).alias("_p"),
            ).unionByName(
                edges.select(
                    F.col("src").alias("id"),
                    F.col("src").alias("_c"),
                    F.col("src").alias("_p"),
                )
            )
            new_labels = cand.groupBy("id").agg(
                F.max("_p").alias("_prev"), F.min("_c").alias("component")
            )
        else:
            cand = edges.join(labels, on=edges.dst == labels.id).select(
                F.col("src").alias("id"),
                F.col("component").alias("_c"),
                F.lit(None).cast(edges.schema["src"].dataType).alias("_p"),
            ).unionByName(
                labels.select(
                    "id",
                    F.col("component").alias("_c"),
                    F.col("component").alias("_p"),
                )
            )
            new_labels = cand.groupBy("id").agg(
                F.max("_p").alias("_prev"), F.min("_c").alias("component")
            )
            for j in range(jumps):
                lookup = labels.select(
                    F.col("id").alias(f"_pid{j}"), F.col("component").alias(f"_pcomp{j}")
                )
                new_labels = (
                    new_labels.join(
                        lookup,
                        on=new_labels.component == lookup[f"_pid{j}"],
                        how="left",
                    )
                    .select(
                        "id",
                        "_prev",
                        F.coalesce(F.col(f"_pcomp{j}"), F.col("component")).alias(
                            "component"
                        ),
                    )
                )
        new_labels = new_labels.localCheckpoint(eager=False)
        changed = new_labels.where(F.col("component") != F.col("_prev")).count()
        labels = new_labels.select("id", "component")
        rounds.append((round(time.monotonic() - t0, 3), changed))
        if changed == 0:
            break
    edges.unpersist()
    if changed != 0:
        raise RuntimeError("no converge")
    return labels.select(F.col("id").alias("doc_id"), "component"), rounds


def main() -> None:
    import __spark_entry__ as entry_mod  # noqa: F401  (constants)
    from correctocr_spark.spark.session import get_spark
    from correctocr_spark.ops.dedup import (
        lsh_candidate_pairs, minhash_signatures, shingles_df,
    )

    spark = get_spark(app_name="probe-cc-jumps", cores=CPUS)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sh = shingles_df(docs, k=entry_mod.SHINGLE_K)
    sig = minhash_signatures(sh, num_hashes=entry_mod.MINHASH_HASHES)
    pairs = lsh_candidate_pairs(
        sig, num_hashes=entry_mod.MINHASH_HASHES, bands=entry_mod.MINHASH_BANDS
    ).persist()
    n = pairs.count()
    print(f"pair graph: {n} pairs")

    ref_rows = None
    for rep in range(REPS):
        for jumps in (1, 2):
            t0 = time.monotonic()
            out, rounds = cc_variant(pairs, jumps)
            rows = sorted(map(tuple, out.collect()))
            wall = time.monotonic() - t0
            if ref_rows is None:
                ref_rows = rows
            eq = rows == ref_rows
            print(
                f"rep{rep} jumps={jumps} wall={wall:6.3f} rounds={len(rounds)} "
                f"per-round={rounds} equal={eq}"
            )
            spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
