"""Distributed HMM training (the reference's `model --build` path).

Reference: commands.py:196-221 + aligner.py:20-57 + hmm.py:263-447.

The char-pair counting (M10) distributes as a plain
``groupBy(left_char, right_char).count()`` over exploded alignment
pairs; the matrix smoothing (M8/M9) is driver-side NumPy — the matrix is
only |charset|² and never worth a shuffle.

Note: the reference merges per-document readCounts with ``dict.update``
(per-key *overwrite*, commands.py:209); we *sum* across documents — the
statistically-correct aggregation — and document the divergence.
"""

from __future__ import annotations

from typing import Iterable, Iterator, List, Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernels.aligner import apply_as_gold, char_pairs
from ..kernels.hmm import HMMParams, build_hmm_params
from ..kernels.pipeline import tokenize_doc

PAIR_SCHEMA = T.StructType(
    [
        T.StructField("left_char", T.StringType(), False),
        T.StructField("right_char", T.StringType(), False),
    ]
)


def alignment_pairs(docs: DataFrame, text_col: str = "text", gold_col: str = "gold_text") -> DataFrame:
    """(noisy text, gold text) docs -> exploded char-pair stream.

    Per doc: tokenize both, ``apply_as_gold`` (the SequenceMatcher
    order-based fuzzy join, aligner.py:59-87), then positional char zip
    (aligner.py:45-47).

    Deliberate divergence from the reference: its ``Token.__eq__``
    compares ``last_modified`` wall-clock, so reference tokens *never*
    compare equal and SequenceMatcher degenerates to a single positional
    'replace' zip that silently tolerates extra trailing gold tokens. We
    align on (original, index) — real matching — and treat an
    unalignable doc (gold has inserted tokens) as untrainable, skipping
    it rather than feeding misaligned char pairs into readCounts. On
    documents where both approaches align, the emitted pairs agree.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lefts: List[str] = []
            rights: List[str] = []
            for text, gold in zip(pdf[text_col], pdf[gold_col]):
                left = tokenize_doc(text or "")
                right = tokenize_doc(gold or "")
                try:
                    apply_as_gold(left, right)
                except ValueError:
                    continue  # inserted tokens: skip doc (reference raises)
                for a, b in char_pairs(left):
                    lefts.append(a)
                    rights.append(b)
            yield pd.DataFrame({"left_char": lefts, "right_char": rights})

    return docs.mapInPandas(run, schema=PAIR_SCHEMA)


def read_counts_df(docs: DataFrame, text_col: str = "text", gold_col: str = "gold_text") -> DataFrame:
    """M10/M6 feed: groupBy(gold_char, read_char).count()."""
    return (
        alignment_pairs(docs, text_col, gold_col)
        .groupBy("left_char", "right_char")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def train_hmm(
    docs: DataFrame,
    dictionary: Iterable[str],
    character_set: str,
    smoothing: float = 1e-4,
    remove_chars: Optional[List[str]] = None,
    text_col: str = "text",
    gold_col: str = "gold_text",
) -> HMMParams:
    """End-to-end training: distributed counts -> driver-side HMMBuilder.

    Orientation note: the aligner emits ``readCounts[read][gold]``
    (aligner.py:47, pinned by cocrtests/aligner.py: ``readCounts['3']
    ['e'] == 1`` for t3st->test), while HMMBuilder's own unit fixture
    uses ``[gold][read]`` (cocrtests/model.py: ``'t': {'t': 999,
    'l': 1}``) — the reference's `model --build` pipes one into the
    other unchanged, which trains a transposed (non-correcting)
    emission matrix. We transpose here so the trained model actually
    corrects; the builder itself stays fixture-exact.
    """
    counts = read_counts_df(docs, text_col, gold_col).collect()
    read_counts: dict = {}
    for row in counts:
        # transpose: outer = gold (correct) char, inner = read char
        read_counts.setdefault(row["right_char"], {})[row["left_char"]] = row["n"]

    # gold word frequencies: init/tran need the word *stream* counted,
    # which is exactly groupBy(word).count() — only the Zipf-bounded
    # vocabulary (not the 10^12-token stream) ever reaches the driver;
    # build_hmm_params consumes the weighted counts directly.
    gold_word_counts = {
        row["w"]: row["count"]
        for row in (
            docs.select(F.explode(F.split(F.trim(F.col(gold_col)), r"\s+")).alias("w"))
            .where(F.col("w") != "")
            .groupBy("w")
            .count()
            .collect()
        )
    }

    return build_hmm_params(
        dictionary, smoothing, character_set, read_counts, remove_chars or [], gold_word_counts
    )
