"""Cache bookkeeping for operators that persist intermediates.

Several operators in this package ``persist()`` (and eagerly count) an
intermediate subtree that feeds two or more consumers of the RETURNED
plan — band tables ahead of self-joins, shingle/line explodes ahead of
hot-set anti-joins, the unigram model ahead of its two consumers. The
returned DataFrame is still LAZY and references those cached frames, so
the operator itself cannot unpersist them: that is the caller's move,
after the caller's own action has materialized the result. In a
one-shot job (bench, CLI, tests) the session exit or an explicit
``spark.catalog.clearCache()`` handles it; in a LONG-LIVED driver
curating many snapshots, leaking one cached band table per call
accumulates executor memory/disk until eviction churn sets in.

The contract here: every such operator tags its returned DataFrame with
the list of persisted intermediates backing it (a plain Python
attribute — pyspark DataFrames accept them), and a caller that keeps
the session alive calls :func:`release_intermediates` once the result
is materialized (collected, written, or checkpointed). Releasing
BEFORE materializing is safe but wasteful: the plan stays valid and
simply recomputes the subtree at the next action.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame

_ATTR = "_correctocr_cached"


def register_intermediates(df: DataFrame, *sources: DataFrame) -> DataFrame:
    """Tag ``df`` with the persisted intermediates backing its plan.

    Each ``source`` is either a frame this operator persisted itself
    (detected via a non-NONE storage level) or an upstream operator's
    output whose own registered intermediates are inherited — so
    compositions (curate over candidate pairs over band tables)
    surface their full cache set at the top.
    """
    cached: List[DataFrame] = []
    for s in sources:
        inherited = getattr(s, _ATTR, None)
        if inherited:
            cached.extend(inherited)
        lvl = s.storageLevel
        if lvl.useMemory or lvl.useDisk:
            cached.append(s)
    setattr(df, _ATTR, cached)
    return df


def release_intermediates(df: DataFrame) -> int:
    """Unpersist every intermediate registered on ``df`` (returning how
    many were released). Call after the result is materialized."""
    cached = getattr(df, _ATTR, None) or []
    for c in cached:
        c.unpersist()
    setattr(df, _ATTR, [])
    return len(cached)
