"""Differential tests: the distributed pipeline must produce
byte-identical per-url output vs the reference-semantics kernel executed
directly on the same inputs (SURVEY.md §5 strategy (b))."""

import pytest

from correctocr_spark.kernels.extract import extract_text
from correctocr_spark.kernels.pipeline import correct_document
from correctocr_spark.spark.resources import default_resources
from correctocr_spark.spark.synth import make_page, synth_pages

N_DOCS = 80
SEED = 1234


@pytest.fixture(scope="module")
def resources():
    return default_resources()


@pytest.fixture(scope="module")
def pipeline(spark, resources):
    from correctocr_spark.spark.pipeline import CorrectionPipeline

    return CorrectionPipeline(spark, resources, use_html=True)


def kernel_expected(resources, n=N_DOCS, seed=SEED):
    out = {}
    for i in range(n):
        page = make_page(i, seed)
        text = extract_text(page["html"])
        res = correct_document(
            text,
            resources.params,
            resources.dictionary,
            resources.settings,
            k=resources.k,
        )
        out[page["url"]] = (res["corrected"], res["merged"])
    return out


def test_extract_recovers_body():
    for i in range(20):
        page = make_page(i, SEED)
        assert extract_text(page["html"]) == page["text"], page["url"]


@pytest.mark.parametrize("strategy", ["join", "broadcast"])
def test_pipeline_byte_identical(spark, pipeline, resources, strategy):
    pages = synth_pages(spark, N_DOCS, seed=SEED)
    got = {
        r["url"]: (r["corrected"], r["merged"])
        for r in pipeline.corrected(pages, strategy=strategy).collect()
    }
    expected = kernel_expected(resources)
    assert set(got) == set(expected)
    mismatches = [u for u in expected if got[u] != expected[u]]
    assert mismatches == [], (
        f"{len(mismatches)} urls differ; first: {mismatches[0]!r}\n"
        f"spark={got[mismatches[0]]!r}\nkernel={expected[mismatches[0]]!r}"
        if mismatches
        else ""
    )


def test_adversarial_differential_fuzz(spark, pipeline, resources):
    """Byte-identity on 150 seeded random docs built from an adversarial
    alphabet: hyphen/soft-hyphen runs, pure punctuation, newline markers,
    unknown letters, empty-ish docs, final hyphens."""
    import numpy as np

    rng = np.random.RandomState(20260816)
    pieces = [
        "word", "w0rd", "str-", "str\xad", "-", "\xad", ".", ",,", "»«",
        "_NEWLINE_N_", "ÿÿ", "a", "A4", "(word)", "te-st", "the", "t3st",
        "--", "-\xad-", "word!", " ",
    ]
    docs = []
    for i in range(150):
        n = rng.randint(0, 30)
        docs.append(" ".join(pieces[rng.randint(len(pieces))] for _ in range(n)))

    import datetime

    from correctocr_spark.spark.synth import PAGES_SCHEMA

    ts = datetime.datetime(2024, 1, 1)
    rows = [
        (f"u://fuzz/{i}", ts, None, text, "en") for i, text in enumerate(docs)
    ]
    pages = spark.createDataFrame(rows, PAGES_SCHEMA)
    from correctocr_spark.spark.pipeline import CorrectionPipeline

    pipe = CorrectionPipeline(spark, resources, use_html=False)
    for strategy in ("join", "broadcast"):
        got = {
            r["url"]: (r["corrected"], r["merged"])
            for r in pipe.corrected(pages, strategy=strategy).collect()
        }
        bad = []
        for i, text in enumerate(docs):
            res = correct_document(
                text, resources.params, resources.dictionary, resources.settings, k=4
            )
            if got[f"u://fuzz/{i}"] != (res["corrected"], res["merged"]):
                bad.append((i, text, got[f"u://fuzz/{i}"], (res["corrected"], res["merged"])))
        assert not bad, f"{strategy}: {len(bad)} mismatches; first: {bad[0]}"


def test_strategies_agree(spark, pipeline):
    pages = synth_pages(spark, 40, seed=321).cache()
    a = {r["url"]: tuple(r) for r in pipeline.corrected(pages, strategy="join").collect()}
    b = {r["url"]: tuple(r) for r in pipeline.corrected(pages, strategy="broadcast").collect()}
    c = {r["url"]: tuple(r) for r in pipeline.corrected_two_phase(pages).collect()}
    assert a == b == c
    spark.catalog.clearCache()


def test_giant_document_skew(spark, pipeline, resources):
    """Doc-size skew: one 30k-token document among small ones — the
    finalize path (collect_list of the whole doc) must survive and stay
    byte-identical."""
    import datetime

    from correctocr_spark.spark.synth import PAGES_SCHEMA

    from correctocr_spark.spark.pipeline import CorrectionPipeline

    ts = datetime.datetime(2024, 1, 1)
    giant = " ".join(["the fast w0rd str-"] * 7500)
    rows = [
        ("u://giant", ts, None, giant, "en"),
        ("u://small", ts, None, "a t3st", "en"),
    ]
    pages = spark.createDataFrame(rows, PAGES_SCHEMA)
    pipe = CorrectionPipeline(spark, resources, use_html=False)
    got = {r["url"]: r for r in pipe.corrected(pages).collect()}
    assert got["u://giant"]["index_count"] == 30000
    exp = correct_document(
        giant, resources.params, resources.dictionary, resources.settings, k=4
    )
    assert got["u://giant"]["corrected"] == exp["corrected"]


def test_empty_corpus(spark, pipeline):
    from correctocr_spark.spark.synth import PAGES_SCHEMA

    pages = spark.createDataFrame([], PAGES_SCHEMA)
    for strategy in ("join", "broadcast"):
        assert pipeline.corrected(pages, strategy=strategy).count() == 0


def test_pipeline_corrects_noise(spark, pipeline):
    """The model genuinely fixes injected OCR noise: corrected text is
    closer to the clean source than the noisy input is."""
    pages = synth_pages(spark, 40, seed=99)
    rows = pipeline.corrected(pages).collect()
    assert len(rows) == 40
    assert all(r["token_count"] > 0 for r in rows)


def test_tokens_table_schema(spark, pipeline):
    pages = synth_pages(spark, 10, seed=7)
    tokens = pipeline.tokens(pages)
    cols = set(tokens.columns)
    for c in ["url", "idx", "original", "gold", "head", "tail", "kbest", "bin", "heuristic", "selection", "discarded"]:
        assert c in cols, c
    sample = tokens.limit(50).collect()
    assert sample


def test_audited_resume(spark, pipeline, tmp_path):
    from correctocr_spark.spark.audit import AuditedRun

    pages = synth_pages(spark, 30, seed=5).cache()
    run = AuditedRun(spark, str(tmp_path / "out"), run_id="r1")

    first = pages.limit(18)
    run.write(pipeline.corrected(first))

    pending = run.pending(pages)
    assert pending.count() == 12  # resume skips completed urls

    run.write(pipeline.corrected(pending))
    done = spark.read.parquet(run.corrected_path)
    assert done.count() == 30
    audit = spark.read.parquet(run.audit_path)
    assert audit.count() > 0
    assert {"pkey", "url_count", "lineage", "completed"} <= set(audit.columns)

    # north rule: per-partition token-bin metrics written alongside
    bins = spark.read.parquet(run.bin_metrics_path)
    assert {"pkey", "bin", "token_count", "run_id"} <= set(bins.columns)
    total_binned = sum(r["token_count"] for r in bins.collect())
    assert total_binned > 0
