"""Text analysis operators: language-ID, quality scoring, token
counting, fingerprinting. Pure column algebra — whole-stage codegen,
no Python UDFs — so they run at scan speed over a 100 TB corpus.
"""

from __future__ import annotations

from typing import Dict, List

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import ensure_parallelism, normalized_words

#: tiny deterministic stopword profiles (n-gram/stopword heuristic)
STOPWORDS: Dict[str, List[str]] = {
    "en": "the of and to in is was for that with on as at by from this be are he she it they we you not".split(),
    "da": "og i at det er en til på de som med han af for ikke der var den hun et men sig jeg".split(),
    "es": "el la de que y en un ser se no haber por con su para como estar tener le lo todo".split(),
}

#: BPE-ish pre-tokenizer: letter runs | digit runs | single non-space symbol
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _stopword_hits(words: Column, lang: str) -> Column:
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(words, lambda w: F.array_contains(sw, F.lower(w))))


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-ratio language ID: argmax over language profiles, ties
    broken by profile order; no hits => 'und'."""
    words = normalized_words(text_col)
    langs = list(STOPWORDS)
    # interpreted HOF filters below run at the scan's partition count —
    # spread them (no-op when the input already has enough splits)
    d = ensure_parallelism(docs).select(
        F.col(id_col).alias("doc_id"),
        F.size(words).alias("n_words"),
        *[_stopword_hits(words, lang).alias(f"hits_{lang}") for lang in langs],
    )
    best_lang, best_hits = F.lit("und"), F.lit(0)
    for lang in langs:
        hits = F.col(f"hits_{lang}")
        best_lang = F.when(hits > best_hits, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(hits > best_hits, hits).otherwise(best_hits)
    return d.select(
        "doc_id",
        best_lang.alias("lang_pred"),
        F.round(best_hits / F.greatest(F.col("n_words"), F.lit(1)), 6).alias("stopword_ratio"),
    )


def quality_scores(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality signals + composite score in [0, 1]:
    length band, mean word length band, punctuation density, stopword
    density — the standard crawl-filtering feature set."""
    words = normalized_words(text_col)
    text = F.col(text_col)
    n_words = F.size(words)
    n_chars = F.length(text)
    mean_wlen = F.round(
        F.aggregate(words, F.lit(0.0), lambda acc, w: acc + F.length(w))
        / F.greatest(n_words, F.lit(1)),
        6,
    )
    n_punct = F.size(F.regexp_extract_all(text, F.lit(r"[^\w\s]"), 0))
    punct_ratio = F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6)
    sw_all = F.array(*[F.lit(w) for ws in STOPWORDS.values() for w in ws])
    sw_ratio = F.round(
        F.size(F.filter(words, lambda w: F.array_contains(sw_all, F.lower(w))))
        / F.greatest(n_words, F.lit(1)),
        6,
    )
    score = (
        F.when((n_words >= 10) & (n_words <= 100000), 0.25).otherwise(0.0)
        + F.when((mean_wlen >= 3) & (mean_wlen <= 12), 0.25).otherwise(0.0)
        + F.when(punct_ratio <= 0.2, 0.25).otherwise(0.0)
        + F.when(sw_ratio >= 0.1, 0.25).otherwise(0.0)
    )
    return ensure_parallelism(docs).select(
        F.col(id_col).alias("doc_id"),
        n_words.alias("n_words"),
        mean_wlen.alias("mean_word_len"),
        punct_ratio.alias("punct_ratio"),
        sw_ratio.alias("stopword_ratio"),
        F.round(score, 2).alias("quality_score"),
    )


def token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace and BPE-ish regex token counts (corpus sizing)."""
    return ensure_parallelism(docs).select(
        F.col(id_col).alias("doc_id"),
        F.size(normalized_words(text_col)).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), 0)).alias("bpe_tokens"),
    )


def fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Normalized content fingerprint: lowercase, collapse all
    non-alphanumerics to single spaces, trim, md5 — stable across
    formatting-only edits."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9]+", " "))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(norm).alias("fingerprint"),
        F.length(norm).alias("norm_len"),
    )
