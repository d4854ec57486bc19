"""Physical-plan regression: the optimizations we rely on at 100 TB must
actually appear in the plan (a correct-but-full-scan query is a bug)."""

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


def test_filter_pushdown_and_pruning(spark):
    p = plan_of(entry_mod.q_revenue_filter_agg(spark, SF))
    m = re.search(r"PushedFilters: \[([^\]]*)\]", p)
    assert m and "GreaterThanOrEqual(l_discount,0.05)" in m.group(1)
    assert "LessThan(l_quantity,24.0)" in m.group(1)
    # column pruning: the scan must read exactly the 3 needed columns
    rs = re.search(r"ReadSchema: struct<([^>]*)>", p).group(1)
    assert sorted(c.split(":")[0] for c in rs.split(",")) == [
        "l_discount", "l_extendedprice", "l_quantity",
    ]


def test_broadcast_join_selected(spark):
    p = plan_of(entry_mod.q_join_agg(spark, SF))
    assert "BroadcastHashJoin" in p
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", p)
    assert any(s == "o_custkey:bigint,o_totalprice:double" for s in schemas)
    assert any(s == "c_custkey:bigint,c_mktsegment:string" for s in schemas)


def test_topk_window_group_limit(spark):
    # rank<=k pushdown: Spark's WindowGroupLimit keeps per-group top-k
    # before the full sort — essential for top-k-per-group at scale
    assert "WindowGroupLimit" in plan_of(entry_mod.q_topk_per_group(spark, SF))


def test_kbest_stage_parallelism_pinned(spark):
    """The compute-dense beam stage must not be AQE-coalesced to 1
    partition (cost is per-row compute, not bytes)."""
    from correctocr_spark.spark.pipeline import CorrectionPipeline
    from correctocr_spark.spark.synth import synth_pages

    pipe = CorrectionPipeline(spark, use_html=False, parallelism=8)
    pages = synth_pages(spark, 50, seed=3)
    kb = pipe.kbest_table(pipe.vocab(pages))
    assert kb.rdd.getNumPartitions() == 8


def test_pipeline_shuffle_count_join_path(spark):
    """Join path: exactly the designed exchanges — words distinct,
    kbest join, url repartition (reused by window+groupBy)."""
    from correctocr_spark.spark.pipeline import CorrectionPipeline
    from correctocr_spark.spark.synth import synth_pages

    pipe = CorrectionPipeline(spark, use_html=False)
    pages = synth_pages(spark, 50, seed=3)
    p = plan_of(pipe.corrected(pages, strategy="join"))
    shuffles = set(re.findall(r"\((\d+)\) Exchange", p))
    broadcasts = set(re.findall(r"\((\d+)\) BroadcastExchange", p))
    # designed exchanges: words distinct, words repartition, url
    # repartition (reused by window+groupBy); the kbest join side should
    # be a broadcast (small table), not a shuffle
    assert len(shuffles) <= 4, f"unexpected shuffle count {len(shuffles)}:\n{p}"
    assert len(broadcasts) >= 1, f"kbest join not broadcast:\n{p}"
