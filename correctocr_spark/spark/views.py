"""Annotation-server read surface as DataFrame views.

The reference's Flask server (server.py:113-307) is a thin JSON shell
over *queries* on the token table; the HTTP layer is out of scope but
the queries are the product's read surface. Implemented here:

- :func:`token_detail_view` — the token-detail endpoint
  (server.py:231-307) with its three quirky display semantics:

  1. **hyphen redirect** (server.py:284-287): a token whose previous
     token is hyphenated is the tail of a pair; the server 302-redirects
     to the head. Here: a ``redirect_to`` column (the head's index,
     null otherwise) — the relational form of the redirect.
  2. **soft-hyphen display** (T4, server.py:289-294): a trailing U+00AD
     in Original/Gold renders as '-'; every U+00AD in the k-best
     candidates renders as '-'.
  3. **hyphenated join display** (server.py:295-305): the head shows
     ``original + next.original``; Gold joins only when BOTH halves
     have gold, else the joined Gold is null. A falsy (empty) head gold
     is left untouched — exactly the reference's ``if tokendict['Gold']``
     truthiness.

All pure column algebra over one (url, idx) window — whole-stage
codegen, one shuffle that reuses the token table's url partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SHY = "\xad"


def _shy_tail_fix(c: Column) -> Column:
    """Trailing soft hyphen renders as '-' (server.py:289-292)."""
    return F.regexp_replace(c, f"{_SHY}$", "-")


def token_window_view(
    tokens: DataFrame, before: int = 3, after: int = 3
) -> DataFrame:
    """W4 — the annotator shell's sliding token window
    (correcter.py:20-24 ``_split_window``: per token, the ``before``
    preceding and ``after`` following originals; the shell uses 7/7,
    the helper defaults 3/3). Two bounded ``rowsBetween`` frames over
    the (url, idx) window — one shuffle, reusing the token table's url
    partitioning; ``collect_list`` over a bounded frame preserves frame
    order."""
    w = Window.partitionBy("url").orderBy("idx")
    return tokens.where(F.col("idx").isNotNull()).select(
        "url",
        "idx",
        "original",
        F.collect_list("original")
        .over(w.rowsBetween(-before, -1))
        .alias("before_ctx"),
        F.collect_list("original")
        .over(w.rowsBetween(1, after))
        .alias("after_ctx"),
    )


def annotator_precache_view(tokens: DataFrame) -> DataFrame:
    """P12 — the annotation image precache set (document.py:249-264):
    the reference slides (l, token, r) triples and extracts images for
    ALL THREE whenever ``'annotator' in (l.heuristic, token.heuristic,
    r.heuristic) or l.is_hyphenated`` and the center is not discarded.

    Relationally: the center condition is a lag/lead expression; a
    token then needs its image iff any center within ±1 qualifies —
    ``max(center_flag) OVER (rows BETWEEN -1 AND 1)``. Both windows
    share the (url, idx) partitioning: one shuffle total. Centers are
    only interior tokens (the reference's zip-based triple window never
    centers the first/last token)."""
    w = Window.partitionBy("url").orderBy("idx")
    t = tokens.where(F.col("idx").isNotNull())
    prev_h = F.lag("heuristic").over(w)
    next_h = F.lead("heuristic").over(w)
    prev_head = F.lag("head").over(w)
    interior = F.lag("idx").over(w).isNotNull() & F.lead("idx").over(w).isNotNull()
    center = (
        interior
        & ~F.coalesce(F.col("discarded"), F.lit(False))
        & (
            (prev_h == "annotator")
            | (F.col("heuristic") == "annotator")
            | (next_h == "annotator")
            | F.coalesce(prev_head, F.lit(False))
        )
    )
    flagged = t.withColumn("_center", center)
    frame = w.rowsBetween(-1, 1)
    return flagged.select(
        "url",
        "idx",
        F.coalesce(F.max("_center").over(frame), F.lit(False)).alias("needs_image"),
    )


def token_detail_view(
    tokens: DataFrame, redirect_hyphenated: bool = True
) -> DataFrame:
    """server.py:231-307 ``tokeninfo`` as a relational view.

    Expects the engine token table (url, idx, original, gold, head,
    discarded, bin, heuristic[, kbest]). Note the reference applies the
    redirect *before* any display transform — consumers must follow
    ``redirect_to`` first; the tail row's display columns are computed
    but the reference would never serve them.
    """
    w = Window.partitionBy("url").orderBy("idx")
    has_kbest = "kbest" in tokens.columns

    t = tokens.where(F.col("idx").isNotNull()).withColumn(
        "_prev_head", F.lag("head").over(w)
    )
    t = t.withColumn("_next_original", F.lead("original").over(w)).withColumn(
        "_next_gold", F.lead("gold").over(w)
    )

    redirect_to = (
        F.when(
            (F.col("idx") > 0) & F.coalesce(F.col("_prev_head"), F.lit(False)),
            F.col("idx") - 1,
        )
        if redirect_hyphenated
        else F.lit(None).cast("int")
    )

    orig_shy = _shy_tail_fix(F.col("original"))
    gold_nonempty = F.col("gold").isNotNull() & (F.col("gold") != "")
    gold_shy = F.when(gold_nonempty, _shy_tail_fix(F.col("gold"))).otherwise(
        F.col("gold")
    )
    next_gold_truthy = F.col("_next_gold").isNotNull() & (F.col("_next_gold") != "")

    head_with_next = F.col("head") & F.col("_next_original").isNotNull()
    display_original = F.when(
        head_with_next, F.concat(orig_shy, F.col("_next_original"))
    ).otherwise(orig_shy)
    display_gold = (
        F.when(
            head_with_next & gold_nonempty,
            F.when(next_gold_truthy, F.concat(gold_shy, F.col("_next_gold"))).otherwise(
                F.lit(None)
            ),
        )
        .otherwise(gold_shy)
    )

    out = t.select(
        "url",
        "idx",
        redirect_to.cast("int").alias("redirect_to"),
        display_original.alias("original"),
        display_gold.alias("gold"),
        F.col("head").alias("hyphenated"),
        F.col("discarded").alias("discarded"),
        *( [F.col("bin")] if "bin" in tokens.columns else [] ),
        *( [F.col("heuristic")] if "heuristic" in tokens.columns else [] ),
        *(
            [
                F.transform(
                    F.col("kbest"),
                    lambda s: F.struct(
                        F.translate(s["candidate"], _SHY, "-").alias("candidate"),
                        s["probability"].alias("probability"),
                    ),
                ).alias("kbest")
            ]
            if has_kbest
            else []
        ),
    )
    return out
