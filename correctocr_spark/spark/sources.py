"""Token-table sources/sinks (S7/S9/S10/S15) and resource-prep jobs (S14).

The reference's MySQL token+kbest tables (docker/initdb.d/dbinit.sql)
become one denormalized parquet/Iceberg table with ``kbest`` as an
ordered array column; its tab-delimited CSV token dump with per-k columns
(fileio.py:44-53) and the externally-corrected CSV import
(commands.py:429-434, Token.from_dict) are kept for interchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .audit import DEFAULT_BUCKETS, with_partition_key

TOKEN_TABLE_COLS = [
    "url", "idx", "original", "gold", "head", "tail", "discarded",
    "kbest", "cand_in_dict", "bin", "heuristic", "sel_rank", "selection", "gold0",
]


def write_tokens(tokens: DataFrame, path: str, buckets: int = DEFAULT_BUCKETS) -> None:
    """S10: idempotent bucketed write — REPLACE-by-PK (_db.py:232-331)
    becomes partition overwrite keyed by url bucket."""
    (
        with_partition_key(tokens, buckets)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("pkey")
        .parquet(path)
    )


def read_tokens(spark: SparkSession, path: str) -> DataFrame:
    """S9: plain scan — the kbest array column removes the reference's
    1-to-k LEFT JOIN reassembly (_db.py:162-230) entirely."""
    return spark.read.parquet(path)


def export_tokens_csv(tokens: DataFrame, path: str, k: int = 4) -> None:
    """S7: the reference's tab-delimited token dump with per-k columns
    (fileio.py:44-53 header shape: Gold/Original/Doc ID/Index/...,
    ``N-best``/``N-best prob`` pairs)."""
    cols = [
        F.col("gold").alias("Gold"),
        F.col("original").alias("Original"),
        F.col("url").alias("Doc ID"),
        F.col("idx").alias("Index"),
        F.col("head").alias("Hyphenated"),
        F.col("discarded").alias("Discarded"),
        F.col("bin").alias("Bin"),
        F.col("heuristic").alias("Heuristic"),
        F.col("selection").alias("Selection"),
    ]
    for n in range(1, k + 1):
        item = F.element_at("kbest", n)
        cols.append(item["candidate"].alias(f"{n}-best"))
        cols.append(item["probability"].alias(f"{n}-best prob"))
    (
        tokens.select(*cols)
        .write.mode("overwrite")
        .option("sep", "\t")
        .option("header", True)
        .csv(path)
    )


def import_tokens_csv(spark: SparkSession, path: str, k: int = 4) -> DataFrame:
    """S15: externally-corrected CSV back to the token-table shape
    (the ``--apply`` path, commands.py:429-434)."""
    raw = spark.read.option("sep", "\t").option("header", True).csv(path)
    kbest = F.array(
        *[
            F.struct(
                F.col(f"`{n}-best`").alias("candidate"),
                F.col(f"`{n}-best prob`").cast("double").alias("probability"),
            )
            for n in range(1, k + 1)
        ]
    )
    return raw.select(
        F.col("`Doc ID`").alias("url"),
        F.col("Index").cast("int").alias("idx"),
        F.col("Original").alias("original"),
        F.col("Gold").alias("gold"),
        F.col("Hyphenated").cast("boolean").alias("head"),
        F.col("Discarded").cast("boolean").alias("discarded"),
        F.col("Bin").cast("int").alias("bin"),
        F.col("Heuristic").alias("heuristic"),
        F.col("Selection").alias("selection"),
        kbest.alias("kbest"),
    )


def build_dictionary_df(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """S14 (commands.py:31-169, minus the http/zip crawl): gold corpus ->
    cleaned distinct dictionary words. Cleaning matches
    ``Dictionary.add`` (dictionary.py:68-90): strip hyphens/punctuation,
    drop non-letter-bearing strings."""
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    exploded = docs.select(F.explode(words).alias("raw"))
    cleaned = F.regexp_replace(
        F.regexp_replace(F.col("raw"), r"[\xad-]", ""), r"^[\W_]+|[\W_]+$", ""
    )
    return (
        exploded.select(cleaned.alias("word"))
        .where((F.col("word") != "") & F.col("word").rlike(r"\p{L}"))
        .distinct()
    )


def apply_memoized_corrections(tokens: DataFrame, memo: dict) -> DataFrame:
    """J7: ``memoized_corrections`` map-side lookup (correcter.py:130-131)
    — resolve annotator-deferred tokens whose original has a known
    correction. Broadcast map -> CASE WHEN; no join."""
    if not memo:
        return tokens
    mapping = F.create_map(*[F.lit(x) for kv in memo.items() for x in kv])
    hit = mapping[F.col("original")]
    return tokens.withColumn(
        "gold",
        F.when(
            (F.col("heuristic") == "annotator")
            & (F.col("gold").isNull() | (F.col("gold") == ""))
            & hit.isNotNull(),
            hit,
        ).otherwise(F.col("gold")),
    )
