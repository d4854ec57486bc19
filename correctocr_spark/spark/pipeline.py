"""The correction pipeline as a Spark DataFrame DAG.

Reference chain (document.py:166-242):
``tokenize -> dehyphenate -> kbest -> bin -> autocorrect -> reassemble``
re-expressed as:

1. **extract** (new stage, north rule): ``html binary -> text`` via
   ``mapInPandas`` over Arrow batches (kernels/extract.py);
2. **tokenize+dehyphenate** (vectorized pandas UDF -> ``explode``): all
   doc-local sequence logic — hyphen marks, tail gold-clears, punctuation
   gold, *merged* consolidated words — is computed inside the UDF, so no
   window/shuffle is spent on it;
3. **k-best**: the reference's per-word LRU cache (_cache.py:10-52,
   hmm.py:194) becomes ``distinct(cons_word) -> beam UDF -> join back``
   — the central rewrite: the Zipfian word distribution means the beam
   runs once per distinct word, and AQE turns the join into a broadcast
   when the vocabulary is small;
4. **bin** (pandas UDF over (original, k1, candidate-dict-flags)): the
   dictionary predicate runs once per *distinct word* for candidates (in
   the k-best stage) and once per token for the raw original; bin
   selection itself is pure boolean algebra (heuristics.py:317-358);
5. **tail copy + autocorrect**: native column algebra — ``lag()`` over
   ``(url, idx)`` copies the head's decision onto the hyphen tail
   (heuristics.py:105-110), then a ``CASE WHEN`` chain implements
   document.py:231-239 (whole-stage codegen, no Python);
6. **finalize**: ``groupBy(url).applyInPandas`` reassembles both contract
   surfaces byte-exactly (gold sink tokens/_text.py:47-54 and the
   hyphen-merged ``__str__`` _super.py:67-79) plus per-doc stats (A1).

The window (5) and the groupBy (6) hash-partition on the same key, so
Spark plans a single exchange for both.
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernels.dictionary import Dictionary
from ..kernels.heuristics import match_bin
from ..kernels.hmm import kbest_for_word
from ..kernels.pipeline import Tok, dehyphenate, doc_stats, doc_to_string, gold_sink_text, tokenize_doc
from ..kernels.extract import extract_text
from .resources import Resources, default_resources

TOKEN_STRUCT = T.StructType(
    [
        T.StructField("idx", T.IntegerType(), False),
        T.StructField("original", T.StringType(), False),
        T.StructField("gold0", T.StringType(), True),
        T.StructField("head", T.BooleanType(), False),
        T.StructField("tail", T.BooleanType(), False),
        T.StructField("cons_word", T.StringType(), True),
    ]
)

KBEST_STRUCT = T.StructType(
    [
        T.StructField(
            "kbest",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("candidate", T.StringType(), False),
                        T.StructField("probability", T.DoubleType(), False),
                    ]
                )
            ),
            False,
        ),
        T.StructField("cand_in_dict", T.ArrayType(T.BooleanType()), False),
    ]
)

DECISION_STRUCT = T.StructType(
    [
        T.StructField("bin", T.IntegerType(), True),
        T.StructField("heuristic", T.StringType(), True),
        T.StructField("sel_rank", T.IntegerType(), True),
        T.StructField("selection", T.StringType(), True),
    ]
)

CORRECTED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("corrected", T.StringType(), False),
        T.StructField("merged", T.StringType(), False),
        T.StructField("index_count", T.LongType(), False),
        T.StructField("token_count", T.LongType(), False),
        T.StructField("corrected_count", T.LongType(), False),
        T.StructField("corrected_by_annotator_count", T.LongType(), False),
        T.StructField("corrected_by_model_count", T.LongType(), False),
        T.StructField("hyphenated_count", T.LongType(), False),
        T.StructField("discarded_count", T.LongType(), False),
        T.StructField("done", T.BooleanType(), False),
    ]
)


def _tokenize_rows(text: Optional[str]):
    """Doc-local stages 2: tokenize, dehyphenate, consolidated originals."""
    toks = tokenize_doc(text or "")
    dehyphenate(toks)
    n = len(toks)
    rows = []
    i = 0
    tail_flags = [False] * n
    # a tail is the token immediately after a head (consumed by the
    # iterator in dehyphenate/consolidated — cannot itself be a head)
    for t in toks:
        if t.is_hyphenated and t.index + 1 < n:
            tail_flags[t.index + 1] = True
    for t in toks:
        if tail_flags[t.index]:
            cons = None
        elif t.is_hyphenated:
            nxt = toks[t.index + 1].original if t.index + 1 < n else "-"
            cons = t.original + nxt
        else:
            cons = t.original
        rows.append(
            {
                "idx": t.index,
                "original": t.original,
                "gold0": t.gold,
                "head": t.is_hyphenated,
                "tail": tail_flags[t.index],
                "cons_word": cons,
            }
        )
    return rows


class CorrectionPipeline:
    def __init__(
        self,
        spark: SparkSession,
        resources: Optional[Resources] = None,
        dehyphenate: bool = True,
        use_html: bool = True,
        broadcast_kbest: Optional[bool] = None,
    ):
        self.spark = spark
        self.resources = resources or default_resources()
        self.k = self.resources.k
        self.use_html = use_html
        self.dehyphenate = dehyphenate
        self.broadcast_kbest = broadcast_kbest
        self._b_res = spark.sparkContext.broadcast(self.resources)

    # -- stage 1: extraction ----------------------------------------------

    def extracted(self, pages: DataFrame) -> DataFrame:
        """html binary -> text (or pass through the provided text column)."""
        if not self.use_html:
            return pages

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                pdf = pdf.copy()
                pdf["text"] = [extract_text(h) for h in pdf["html"]]
                yield pdf

        return pages.mapInPandas(run, schema=pages.schema)

    # -- stage 2: tokenize + dehyphenate ------------------------------------

    def tokens_raw(self, pages: DataFrame) -> DataFrame:
        dehyph = self.dehyphenate

        @F.pandas_udf(T.ArrayType(TOKEN_STRUCT))
        def tok_udf(texts: pd.Series) -> pd.Series:
            if dehyph:
                return texts.map(_tokenize_rows)
            return texts.map(_tokenize_rows_nodehyph)

        src = self.extracted(pages)
        # explode_outer keeps token-less docs (empty/unextractable pages)
        # as one all-null row so they still reach the output + audit —
        # otherwise resume would re-process them forever
        return (
            src.select("url", F.explode_outer(tok_udf(F.col("text"))).alias("t"))
            .select("url", "t.*")
            .withColumn("discarded", F.lit(False))
        )

    # -- stage 3: distinct-word k-best + join back ---------------------------

    def kbest_table(self, tokens: DataFrame) -> DataFrame:
        b_res = self._b_res
        k = self.k

        @F.pandas_udf(KBEST_STRUCT)
        def kbest_udf(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
            res: Resources = b_res.value
            params = res.params
            d = res.dictionary
            memo = {}
            for words in batches:
                kbs, flags = [], []
                for w in words:
                    hit = memo.get(w)
                    if hit is None:
                        kb = kbest_for_word(params, w, k)
                        fl = [c in d for c, _p in kb]
                        hit = (
                            [{"candidate": c, "probability": p} for c, p in kb],
                            fl,
                        )
                        memo[w] = hit
                    kbs.append(hit[0])
                    flags.append(hit[1])
                yield pd.DataFrame({"kbest": kbs, "cand_in_dict": flags})

        words = tokens.where(F.col("cons_word").isNotNull()).select("cons_word").distinct()
        return words.select(
            "cons_word", kbest_udf(F.col("cons_word")).alias("kb")
        ).select("cons_word", "kb.kbest", "kb.cand_in_dict")

    def with_kbest(self, tokens: DataFrame) -> DataFrame:
        kb = self.kbest_table(tokens)
        if self.broadcast_kbest:
            kb = F.broadcast(kb)
        return tokens.join(kb, on="cons_word", how="left")

    # -- stage 4: heuristic bins ---------------------------------------------

    def with_decisions(self, tokens: DataFrame) -> DataFrame:
        b_res = self._b_res

        @F.pandas_udf(DECISION_STRUCT)
        def bin_udf(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            import json

            res: Resources = b_res.value
            d = res.dictionary
            settings = res.settings
            in_dict_memo = {}

            def in_dict(w):
                hit = in_dict_memo.get(w)
                if hit is None:
                    hit = in_dict_memo[w] = w in d
                return hit

            for pdf in batches:
                bins, heuristics, sel_ranks, selections = [], [], [], []
                for original, k1, flags in zip(
                    pdf["original"], pdf["k1"], pdf["cand_in_dict"]
                ):
                    if k1 is None or flags is None:  # tail / no kbest
                        bins.append(None)
                        heuristics.append(None)
                        sel_ranks.append(None)
                        selections.append(None)
                        continue
                    flags = list(flags)
                    filtids = [i + 1 for i, f in enumerate(flags) if f]
                    if len(filtids) == 0:
                        dcode = "zerokd"
                    elif len(filtids) < len(flags):
                        dcode = "somekd"
                    else:
                        dcode = "allkd"
                    number = match_bin(
                        original == k1, in_dict(original), bool(flags[0]), dcode
                    )
                    heuristic = settings.get(number, "annotator")
                    if heuristic == "original":
                        sel_rank, selection = None, original
                    elif heuristic == "kbest":
                        sel_rank, selection = 1, "1"
                    elif heuristic == "kdict":
                        sel_rank, selection = filtids[0], str(filtids[0])
                    else:
                        sel_rank, selection = None, json.dumps(filtids)
                    bins.append(number)
                    heuristics.append(heuristic)
                    sel_ranks.append(sel_rank)
                    selections.append(selection)
                yield pd.DataFrame(
                    {
                        "bin": pd.array(bins, dtype="Int32"),
                        "heuristic": heuristics,
                        "sel_rank": pd.array(sel_ranks, dtype="Int32"),
                        "selection": selections,
                    }
                )

        with_k1 = tokens.withColumn("k1", F.element_at("kbest", 1)["candidate"])
        dec = with_k1.withColumn(
            "dec",
            bin_udf(F.struct("original", "k1", "cand_in_dict")),
        ).select("*", "dec.*").drop("dec", "k1")

        # heuristics.py:105-110 — tail inherits the head's decision
        w = Window.partitionBy("url").orderBy("idx")
        tail = F.col("tail")
        dec = (
            dec.withColumn("bin", F.when(tail, F.lag("bin").over(w)).otherwise(F.col("bin")))
            .withColumn("heuristic", F.when(tail, F.lag("heuristic").over(w)).otherwise(F.col("heuristic")))
            .withColumn("sel_rank", F.when(tail, F.lag("sel_rank").over(w)).otherwise(F.col("sel_rank")))
            .withColumn("selection", F.when(tail, F.lag("selection").over(w)).otherwise(F.col("selection")))
        )
        return dec

    # -- stage 5: autocorrect (native CASE WHEN; document.py:231-239) --------

    @staticmethod
    def _autocorrect_col() -> Column:
        gold0 = F.col("gold0")
        return (
            F.when(gold0.isNotNull() & (gold0 != F.lit("")), gold0)
            .when(
                F.col("heuristic").isin("kbest", "kdict"),
                F.coalesce(
                    F.element_at("kbest", F.col("sel_rank"))["candidate"], F.lit("")
                ),
            )
            .when(F.col("heuristic") == "original", F.col("original"))
            .otherwise(gold0)
        )

    def tokens(self, pages: DataFrame) -> DataFrame:
        """The full token table — the engine's relational data model
        (FIXTURES.md §6; mirrors the reference DDL with kbest as an
        ordered array column instead of a joined table)."""
        t = self.tokens_raw(pages)
        t = self.with_kbest(t)
        t = self.with_decisions(t)
        return t.withColumn("gold", self._autocorrect_col())

    # -- stage 6: reassembly ---------------------------------------------------

    def corrected(self, pages: DataFrame) -> DataFrame:
        tokens = self.tokens(pages)
        return self.finalize(tokens)

    @staticmethod
    def finalize(tokens: DataFrame) -> DataFrame:
        """groupBy(url).applyInPandas — byte-exact reassembly + doc stats."""

        def fin(key, pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("idx")
            toks = []
            for idx, original, gold, head, discarded, heuristic in zip(
                pdf["idx"], pdf["original"], pdf["gold"], pdf["head"], pdf["discarded"], pdf["heuristic"]
            ):
                if original is None:  # explode_outer placeholder (empty doc)
                    continue
                t = Tok.__new__(Tok)
                t.index = int(idx)
                t.original = original
                t.gold = gold if isinstance(gold, str) else None
                t.is_hyphenated = bool(head)
                t.is_discarded = bool(discarded)
                t.has_error = False
                t.kbest = []
                t.bin = None
                t.heuristic = heuristic if isinstance(heuristic, str) else None
                t.selection = None
                toks.append(t)
            stats = doc_stats(toks)
            return pd.DataFrame(
                [
                    {
                        "url": key[0],
                        "corrected": gold_sink_text(toks),
                        "merged": doc_to_string(toks),
                        "index_count": stats["index_count"],
                        "token_count": stats["token_count"],
                        "corrected_count": stats["corrected_count"],
                        "corrected_by_annotator_count": stats["corrected_by_annotator_count"],
                        "corrected_by_model_count": stats["corrected_by_model_count"],
                        "hyphenated_count": stats["hyphenated_count"],
                        "discarded_count": stats["discarded_count"],
                        "done": bool(stats["done"]),
                    }
                ]
            )

        cols = ["url", "idx", "original", "gold", "head", "discarded", "heuristic"]
        return tokens.select(*cols).groupBy("url").applyInPandas(fin, schema=CORRECTED_SCHEMA)


def _tokenize_rows_nodehyph(text: Optional[str]):
    toks = tokenize_doc(text or "")
    return [
        {
            "idx": t.index,
            "original": t.original,
            "gold0": t.gold,
            "head": False,
            "tail": False,
            "cons_word": t.original,
        }
        for t in toks
    ]
