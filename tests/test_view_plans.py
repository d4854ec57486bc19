"""Physical-plan pins for the server-view family: each view's windows
must share ONE (url) exchange — a second shuffle would mean the lag/lead
and frame windows were planned on different partitionings."""

import io
import re
from contextlib import redirect_stdout


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def shuffle_count(df) -> int:
    p = plan_of(df)
    return len(set(re.findall(r"\((\d+)\) Exchange", p)))


def _tokens(spark):
    rows = [
        ("u1", i, f"w{i}", None, i % 3 == 0, False, "annotator" if i % 4 == 0 else "original")
        for i in range(30)
    ]
    return spark.createDataFrame(
        rows,
        "url string, idx int, original string, gold string, head boolean, "
        "discarded boolean, heuristic string",
    )


def test_token_detail_single_shuffle(spark):
    from correctocr_spark.spark.views import token_detail_view

    assert shuffle_count(token_detail_view(_tokens(spark))) <= 1


def test_token_window_single_shuffle(spark):
    from correctocr_spark.spark.views import token_window_view

    assert shuffle_count(token_window_view(_tokens(spark))) <= 1


def test_precache_single_shuffle(spark):
    from correctocr_spark.spark.views import annotator_precache_view

    assert shuffle_count(annotator_precache_view(_tokens(spark))) <= 1
