"""http_headers and source_overlap: hand-built header blocks (absent
fields, case-insensitive names, malformed status, LF-only blocks),
overlap matrix hand sims (containment directionality, zero-overlap
absence, within-source dups collapsing in the distinct)."""

from pyspark.sql import functions as F

from correctocr_spark.ops.cleaning import source_overlap
from correctocr_spark.ops.webindex import http_headers


class TestHttpHeaders:
    BLOCKS = [
        (
            0,
            "HTTP/1.1 200 OK\r\nContent-Type: TEXT/HTML; charset=UTF-8\r\n"
            "Content-Length: 512\r\n\r\n",
            (200, "text/html", "utf-8", 512, None, None),
        ),
        (
            1,
            "HTTP/1.1 301 Moved Permanently\r\nLocation: https://ex.org/new\r\n"
            "content-type: text/plain\r\n\r\n",
            (301, "text/plain", None, None, "https://ex.org/new", None),
        ),
        (
            2,
            "HTTP/1.0 404 Not Found\r\n"
            "Last-Modified: Tue, 15 Nov 1994 12:45:26 GMT\r\n\r\n",
            (404, None, None, None, None, "Tue, 15 Nov 1994 12:45:26 GMT"),
        ),
        # LF-only block (in contract) — (?m)^ matches after \n both
        # engines; values have no trailing \r to strip
        (
            3,
            "HTTP/2 200 x\nContent-Type: application/json\nContent-Length: 7\n\n",
            (200, "application/json", None, 7, None, None),
        ),
        # malformed: no status line, stray text — survives with NULLs
        (4, "totally not http", (None, None, None, None, None, None)),
        (5, "", (None, None, None, None, None, None)),
    ]

    def test_fields(self, spark):
        df = spark.createDataFrame(
            [(i, b) for i, b, _ in self.BLOCKS], "doc_id long, headers string"
        )
        got = {
            r["doc_id"]: (
                r["status"],
                r["content_type"],
                r["charset"],
                r["content_length"],
                r["location"],
                r["last_modified"],
            )
            for r in http_headers(df).collect()
        }
        for i, _, expect in self.BLOCKS:
            assert got[i] == expect, (i, got[i], expect)

    def test_row_local_plan(self, spark):
        df = spark.createDataFrame([(1, "x")], "doc_id long, headers string")
        plan = http_headers(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "BatchEvalPython" not in plan


class TestSourceOverlap:
    def _docs(self, spark):
        # source A: texts t1 t2 t3 (t1 duplicated WITHIN A — collapses
        # in the distinct); source B: t1 t2 t9; source C: t7 (no overlap)
        rows = [
            (1, "t1", "A"),
            (2, "t1", "A"),
            (3, "t2", "A"),
            (4, "t3", "A"),
            (5, "t1", "B"),
            (6, "t2", "B"),
            (7, "t9", "B"),
            (8, "t7", "C"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string, source string")

    def test_matrix_hand_simulated(self, spark):
        got = {
            (r["source_a"], r["source_b"]): r
            for r in source_overlap(self._docs(spark)).collect()
        }
        # only the A-B pair shares fingerprints; C rows are absent
        assert set(got) == {("A", "B")}
        r = got[("A", "B")]
        assert (r["shared_fps"], r["fps_a"], r["fps_b"]) == (2, 3, 3)
        assert r["jaccard_bp"] == (10000 * 2) // (3 + 3 - 2)
        assert r["containment_a_bp"] == (10000 * 2) // 3
        assert r["containment_b_bp"] == (10000 * 2) // 3
        spark.catalog.clearCache()

    def test_full_containment(self, spark):
        rows = [(1, "x", "A"), (2, "y", "A"), (3, "x", "B"), (4, "y", "B"), (5, "z", "B")]
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        r = source_overlap(df).collect()[0]
        # A entirely inside B
        assert r["containment_a_bp"] == 10000 and r["containment_b_bp"] < 10000
        spark.catalog.clearCache()

    def test_intermediates_registered_for_release(self, spark):
        from correctocr_spark.ops.cache import release_intermediates

        out = source_overlap(self._docs(spark))
        out.collect()
        assert release_intermediates(out) == 1
