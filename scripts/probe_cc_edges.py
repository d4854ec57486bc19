"""Same-window A/B: connected_components' symmetrized edge build.

  U  current: pairs.select(a,b) UNION pairs.select(b,a) — two legs,
     each a full evaluation of the (unpersisted) upstream pair chain
     inside round 1's materializing job (unless Spark reuses the
     chain's final distinct exchange — this probe settles whether it
     does).
  E  single leg: explode(array(struct(a,b), struct(b,a))) — one
     evaluation of the chain by construction. Same edge set.

Runs the full dedup_groups composition (LSH chain -> CC) both ways;
verifies identical labels. Diagnostic only; never ships.
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


def cc(pairs, edge_mode, max_iterations=20):
    if edge_mode == "U":
        edges = (
            pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
            .unionByName(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
            .distinct()
            .persist()
        )
    else:
        edges = (
            pairs.select(
                F.explode(
                    F.array(
                        F.struct(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
                        F.struct(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")),
                    )
                ).alias("_e")
            )
            .select("_e.src", "_e.dst")
            .distinct()
            .persist()
        )
    labels = None
    changed = 0
    for it in range(max_iterations):
        if it == 0:
            cand = edges.select(
                F.col("src").alias("id"), F.col("dst").alias("_c"),
                F.lit(None).cast(edges.schema["src"].dataType).alias("_p"),
            ).unionByName(
                edges.select(F.col("src").alias("id"), F.col("src").alias("_c"), F.col("src").alias("_p"))
            )
            new_labels = cand.groupBy("id").agg(F.max("_p").alias("_prev"), F.min("_c").alias("component"))
        else:
            cand = edges.join(labels, on=edges.dst == labels.id).select(
                F.col("src").alias("id"), F.col("component").alias("_c"),
                F.lit(None).cast(edges.schema["src"].dataType).alias("_p"),
            ).unionByName(
                labels.select("id", F.col("component").alias("_c"), F.col("component").alias("_p"))
            )
            relaxed = cand.groupBy("id").agg(F.max("_p").alias("_prev"), F.min("_c").alias("component"))
            lookup = labels.select(F.col("id").alias("_pid"), F.col("component").alias("_pcomp"))
            new_labels = relaxed.join(lookup, on=relaxed.component == lookup._pid, how="left").select(
                "id", "_prev", F.coalesce(F.col("_pcomp"), F.col("component")).alias("component")
            )
        new_labels = new_labels.localCheckpoint(eager=False)
        changed = new_labels.where(F.col("component") != F.col("_prev")).count()
        labels = new_labels.select("id", "component")
        if changed == 0:
            break
    edges.unpersist()
    assert changed == 0
    return labels.select(F.col("id").alias("doc_id"), "component")


def main() -> None:
    import __spark_entry__ as entry_mod
    from correctocr_spark.spark.session import get_spark
    from correctocr_spark.ops.dedup import lsh_candidate_pairs, minhash_signatures, shingles_df

    spark = get_spark(app_name="probe-cc-edges", cores=CPUS)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    def chain():
        sh = shingles_df(docs, k=entry_mod.SHINGLE_K)
        sig = minhash_signatures(sh, num_hashes=entry_mod.MINHASH_HASHES)
        return lsh_candidate_pairs(sig, num_hashes=entry_mod.MINHASH_HASHES, bands=entry_mod.MINHASH_BANDS)

    ref = None
    for rep in range(REPS):
        for mode in ("U", "E"):
            t0 = time.monotonic()
            out = cc(chain(), mode)
            out.write.format("noop").mode("overwrite").save()
            wall = time.monotonic() - t0
            rows = sorted(map(tuple, out.collect()))
            if ref is None:
                ref = rows
            print(f"rep{rep} {mode} wall={wall:6.3f} rows={len(rows)} equal={rows == ref}")
            spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
