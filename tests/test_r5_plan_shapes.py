"""Physical-plan regressions for the round-5 session operators: the
scale claims in the docstrings (single combinable rollup, windows only
on aggregated tables, broadcasted small sides) must appear in the
actual plan, not just the prose."""

import io
import re
from contextlib import redirect_stdout

import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def n_exchanges(p: str) -> int:
    """Count shuffle Exchanges (ignore broadcast + single-partition
    result collection)."""
    # formatted explain puts the partitioning on an Arguments: line
    return len(
        [
            ln
            for ln in p.splitlines()
            if re.search(r"Arguments: hashpartitioning", ln)
        ]
    )


def test_pearson_one_rollup_no_window(spark):
    """pearson_corr: ONE hash shuffle (the per-lang rollup), no Window
    node anywhere — the cheapest-statistic claim."""
    p = plan_of(entry_mod.q_pearson(spark, SF))
    assert n_exchanges(p) == 1
    assert "Window" not in p
    # map-side partial aggregation present (partial then final)
    assert p.count("HashAggregate") >= 2


def test_mcc_single_conditional_rollup(spark):
    """mcc_eval: a global conditional agg — no hash-key shuffle at
    all (singlepartition exchange only), no join, no window."""
    p = plan_of(entry_mod.q_mcc(spark, SF))
    assert n_exchanges(p) == 0
    assert "Window" not in p and "Join" not in p


def test_wasserstein_window_on_distinct_scores_only(spark):
    """wasserstein_1d: the CDF window runs AFTER the per-score
    aggregate — the raw documents scan is never window-sorted."""
    p = plan_of(entry_mod.q_wasserstein(spark, SF))
    assert "Window" in p
    # the scan feeds a HashAggregate before any Window appears
    first_agg = p.find("HashAggregate")
    first_win = p.find("Window")
    assert 0 < first_agg < first_win


def test_vocab_coverage_rank_after_vocab_rollup(spark):
    """vocab_coverage: the global ranking window sorts the VOCAB
    table (post-aggregate), and the size expansion is a broadcast."""
    p = plan_of(entry_mod.q_vocab_coverage(spark, SF))
    first_agg = p.find("HashAggregate")
    first_win = p.find("Window")
    assert 0 < first_agg < first_win
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p


def test_cluster_quality_broadcast_pairs(spark):
    """cluster_quality: per-cluster rollup shuffles once; the
    centroid-pair table and scatters join via broadcast, never a
    shuffle join."""
    p = plan_of(entry_mod.q_cluster_quality(spark, SF))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_bh_fdr_window_on_distinct_p(spark):
    """bh_fdr: cumulative window strictly after the p-value rollup."""
    p = plan_of(entry_mod.q_bh_fdr(spark, SF))
    first_agg = p.find("HashAggregate")
    first_win = p.find("Window")
    assert 0 < first_agg < first_win


def test_event_transitions_single_user_window(spark):
    """event_transitions: one user-keyed window shuffle + the pair
    rollup; the totals join back is broadcast."""
    p = plan_of(entry_mod.q_event_transitions(spark, SF))
    assert "Window" in p
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_welch_no_join_no_window(spark):
    p = plan_of(entry_mod.q_welch_t(spark, SF))
    assert n_exchanges(p) == 0
    assert "Join" not in p and "Window" not in p


def test_logrank_windows_on_duration_rollup(spark):
    """logrank_test: risk-set windows run on the distinct-duration
    table, after the span rollup."""
    p = plan_of(entry_mod.q_logrank(spark, SF))
    first_agg = p.find("HashAggregate")
    first_win = p.find("Window")
    assert 0 < first_agg < first_win
