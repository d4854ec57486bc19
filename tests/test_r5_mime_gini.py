"""Session probes for mime_sniff and concentration_gini — hand
simulations plus: prefix-order specificity, declared-type charset
stripping, Gini's 0/uniform and →10000/degenerate anchors."""

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# mime_sniff
# ---------------------------------------------------------------------------


class TestMimeSniff:
    CASES = [
        (0, b"%PDF-1.4 blah", "application/pdf", "application/pdf"),
        (1, b"\x1f\x8b\x08\x00payload", "text/html", "application/gzip"),
        (2, b"\x89PNG\r\n\x1a\n....", "image/png", "image/png"),
        (3, b"\xff\xd8\xff\xe0JFIF", "image/jpeg", "image/jpeg"),
        (4, b"<!DOCTYPE html><html>", "text/html; charset=utf-8", "text/html"),
        (5, b"<html><body>x", "text/html", "text/html"),
        (6, b"<?xml version='1.0'?>", "application/xml", "application/xml"),
        (7, b"WARC/1.0\r\nWARC-Type:", "application/warc", "application/warc"),
        (8, b"PK\x03\x04word/", "application/zip", "application/zip"),
        (9, b"\xef\xbb\xbfplain bom text", "text/plain", "text/plain"),
        (10, b"just some bytes", "text/html", "application/octet-stream"),
        (11, b"", "text/html", "application/octet-stream"),
    ]

    def _df(self, spark):
        return spark.createDataFrame(
            [(i, d, decl) for i, d, decl, _ in self.CASES],
            "doc_id long, data binary, ct string",
        )

    def test_sniffs_and_agreement(self, spark):
        from correctocr_spark.ops.multimodal import mime_sniff

        got = {
            r["doc_id"]: (r["sniffed"], r["declared"], r["agree"])
            for r in mime_sniff(
                self._df(spark), declared_col="ct"
            ).collect()
        }
        for i, _, decl, expect in self.CASES:
            bare = decl.split(";")[0].strip().lower()
            assert got[i] == (expect, bare, 1 if expect == bare else 0), (
                i, got[i]
            )
        # the gzip-behind-html lie is the one this op exists to catch
        assert got[1] == ("application/gzip", "text/html", 0)

    def test_without_declared(self, spark):
        from correctocr_spark.ops.multimodal import mime_sniff

        out = mime_sniff(self._df(spark))
        assert out.columns == ["doc_id", "sniffed"]
        assert out.count() == len(self.CASES)

    def test_row_local_plan(self, spark):
        from correctocr_spark.ops.multimodal import mime_sniff

        plan = (
            mime_sniff(self._df(spark), declared_col="ct")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan and "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# concentration_gini
# ---------------------------------------------------------------------------


def _gini_simulate(masses):
    xs = sorted(masses)
    n, s = len(xs), sum(xs)
    num = 2 * sum((i + 1) * x for i, x in enumerate(xs)) - (n + 1) * s
    return (10000 * num) // (n * s)


class TestConcentrationGini:
    def test_uniform_is_zero(self, spark):
        from correctocr_spark.ops.cleaning import concentration_gini

        df = spark.createDataFrame(
            [(f"h{i}", 10) for i in range(8)], "host string, tok long"
        )
        row = concentration_gini(df, "host", "tok").first()
        assert (row["n_keys"], row["total_mass"], row["gini_bp"]) == (8, 80, 0)

    def test_degenerate_approaches_ceiling(self, spark):
        from correctocr_spark.ops.cleaning import concentration_gini

        rows = [(f"h{i}", 1) for i in range(99)] + [("big", 100000)]
        df = spark.createDataFrame(rows, "host string, tok long")
        row = concentration_gini(df, "host", "tok").first()
        assert row["gini_bp"] == _gini_simulate([1] * 99 + [100000])
        assert row["gini_bp"] > 9800

    def test_matches_simulation_rowcount_weight(self, spark):
        from correctocr_spark.ops.cleaning import concentration_gini

        # weight defaults to row count: host i contributes i+1 rows
        rows = [(f"h{i}",) for i in range(5) for _ in range(i + 1)]
        df = spark.createDataFrame(rows, "host string")
        row = concentration_gini(df, "host").first()
        assert row["n_keys"] == 5 and row["total_mass"] == 15
        assert row["gini_bp"] == _gini_simulate([1, 2, 3, 4, 5])

    def test_single_key_is_zero(self, spark):
        from correctocr_spark.ops.cleaning import concentration_gini

        df = spark.createDataFrame([("only", 7)], "host string, tok long")
        assert concentration_gini(df, "host", "tok").first()["gini_bp"] == 0

    def test_empty_returns_no_rows_not_garbage(self, spark):
        from correctocr_spark.ops.cleaning import concentration_gini

        df = spark.createDataFrame([], "host string, tok long")
        rows = concentration_gini(df, "host", "tok").collect()
        # one aggregate row with n_keys 0 and NULL gini (0/0 surfaced
        # as NULL, never a fabricated number)
        assert len(rows) == 1
        assert rows[0]["n_keys"] == 0 and rows[0]["gini_bp"] is None
