"""A/B probe: jaccard_verify_candidates barrier shape.

  A  current: candidates.persist()+count(), arrays.persist()+count()
     (two eager barrier jobs before the final join job)
  B  fused: candidates.persist() LAZY, arrays.persist()+count() — the
     arrays job has exactly ONE consumer path through candidates
     (cand_ids -> members), so the count materializes both caches in
     one job; the final join then reads both from cache.

Runs the full ngram_jaccard_lsh chain for each arm in one process
window; verifies identical output. Diagnostic only; never ships.
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


def verify(docs, candidates, k, threshold, fused):
    from correctocr_spark.ops.dedup import shingles_col

    candidates = candidates.persist()
    if not fused:
        candidates.count()
    cand_ids = (
        candidates.select(F.col("doc_a").alias("doc_id"))
        .unionByName(candidates.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    members = docs.join(cand_ids, on="doc_id", how="left_semi")
    arrays_all = (
        members.repartition(F.col("doc_id"))
        .select(F.col("doc_id"), shingles_col("text", k).alias("sh"))
        .persist()
    )
    arrays_all.count()
    arrays = arrays_all.where(F.size("sh") > 0)
    a = arrays.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = arrays.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    counted = (
        candidates.join(a, on="doc_a")
        .join(b, on="doc_b")
        .select(
            "doc_a", "doc_b",
            F.size(F.array_intersect("sh_a", "sh_b")).alias("n_inter"),
            F.size("sh_a").alias("n_a"),
            F.size("sh_b").alias("n_b"),
        )
    )
    out = counted.select(
        "doc_a", "doc_b",
        F.round(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6).alias("jaccard"),
    ).where(F.col("jaccard") >= threshold)
    return out, [candidates, arrays_all]


def main() -> None:
    import __spark_entry__ as entry_mod
    from correctocr_spark.spark.session import get_spark
    from correctocr_spark.ops.dedup import (
        lsh_candidate_pairs, minhash_signatures, shingles_df,
    )

    spark = get_spark(app_name="probe-verify-fuse", cores=CPUS)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    k = entry_mod.SHINGLE_K

    ref = None
    for rep in range(REPS):
        for fused in (False, True):
            t0 = time.monotonic()
            sh = shingles_df(docs, k=k)
            sig = minhash_signatures(sh, num_hashes=entry_mod.MINHASH_HASHES)
            cands = lsh_candidate_pairs(
                sig, num_hashes=entry_mod.MINHASH_HASHES, bands=entry_mod.MINHASH_BANDS
            )
            out, cached = verify(docs, cands, k, 0.3, fused)
            out.write.format("noop").mode("overwrite").save()
            wall = time.monotonic() - t0
            rows = sorted(map(tuple, out.collect()))
            if ref is None:
                ref = rows
            print(f"rep{rep} fused={fused} wall={wall:6.3f} rows={len(rows)} equal={rows == ref}")
            spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
