"""Web-archive index tier: SURT urlkeys, CDXJ parse/serialize
round-trip, record-span seekability, fetch planning."""

import base64
import datetime
import gzip
import hashlib
import io
import zlib

import pytest
from pyspark.sql import Row, functions as F

from correctocr_spark.kernels.warc import (
    iter_record_spans,
    parse_warc,
    split_http_response,
    surt_key,
    write_warc,
)


SURT_CASES = [
    # (input, expected) — the documented shared subset
    ("http://example.com/", "com,example)/"),
    ("http://example.com", "com,example)/"),
    ("HTTP://WWW.Example.COM:80/Path/One?b=2&a=1#frag", "com,example)/path/one?a=1&b=2"),
    ("https://sub.example.org:8443/x", "org,example,sub:8443)/x"),
    ("https://www2.example.net/A?z=1", "net,example)/a?z=1"),
    ("http://example.com/?", "com,example)/"),
    ("http://example.com/p?a=1&&b=2", "com,example)/p?a=1&b=2"),
    ("https://example.com:443/q", "com,example)/q"),
    ("http://example.com:8080/q", "com,example:8080)/q"),
    ("  http://example.com/x  ", "com,example)/x"),
    ("notaurl", "notaurl"),
    ("NotAUrl UPPER", "notaurl upper"),
]


def _pages(n=6):
    return [
        (
            f"https://WWW.Example{i % 2}.org/Page/{i}?b={i}&a=1",
            datetime.datetime(2024, 1, 1, 0, 0, i),
            f"<html><body><p>doc number {i} body text</p></body></html>".encode(),
        )
        for i in range(n)
    ]


class TestSurtKernel:
    @pytest.mark.parametrize("url,expected", SURT_CASES)
    def test_cases(self, url, expected):
        assert surt_key(url) == expected


class TestSurtColumn:
    def test_column_equals_kernel(self, spark):
        """The Spark column twin is byte-identical to the Python kernel
        over the whole case battery."""
        from correctocr_spark.ops.webindex import surt_keys

        df = spark.createDataFrame([Row(url=u) for u, _ in SURT_CASES])
        got = {r["url"]: r["urlkey"] for r in surt_keys(df).collect()}
        for url, expected in SURT_CASES:
            assert got[url.strip() if False else url] == expected, url
        # and the kernel agrees on every case too (belt over the braces)
        for url, expected in SURT_CASES:
            assert surt_key(url) == expected


class TestRecordSpans:
    def test_spans_are_seekable(self, tmp_path):
        """Each (offset, length) span decompresses standalone to its
        record — the CDX range-request contract."""
        path = str(tmp_path / "a.warc.gz")
        write_warc(_pages(), path)
        data = open(path, "rb").read()
        spans = list(iter_record_spans(data))
        assert len(spans) == 6
        for off, length, rec in spans:
            member = data[off : off + length]
            standalone = list(parse_warc(member))
            assert len(standalone) == 1
            assert standalone[0].uri == rec.uri
            assert standalone[0].payload == rec.payload

    def test_plain_warc_rejected(self, tmp_path):
        path = str(tmp_path / "a.warc")
        write_warc(_pages(2), path, gzip_records=False)
        with pytest.raises(ValueError, match="per-record-gzip"):
            list(iter_record_spans(open(path, "rb").read()))

    def test_truncated_tail(self, tmp_path):
        path = str(tmp_path / "a.warc.gz")
        write_warc(_pages(3), path)
        data = open(path, "rb").read()[:-20]
        with pytest.raises(ValueError):
            list(iter_record_spans(data))
        salvaged = list(iter_record_spans(data, skip_bad=True))
        assert 0 < len(salvaged) < 3


class TestCdxIndex:
    def _segments(self, spark, tmp_path, n_files=2):
        for k in range(n_files):
            write_warc(_pages(4), str(tmp_path / f"seg-{k}.warc.gz"))
        return spark.read.format("binaryFile").load(
            str(tmp_path) + "/seg-*.warc.gz"
        )

    def test_generate_and_reparse_roundtrip(self, spark, tmp_path):
        """write_warc → cdx_index → cdxj_lines → parse_cdxj is the
        identity on the typed index table."""
        from correctocr_spark.ops.webindex import cdx_index, cdxj_lines, parse_cdxj

        idx = cdx_index(self._segments(spark, tmp_path)).cache()
        rows = idx.collect()
        assert len(rows) == 8
        r = next(x for x in rows if x["url"].endswith("/Page/1?b=1&a=1"))
        assert r["urlkey"].startswith("org,example1)/page/1?")
        assert r["status"] == 200 and r["filename"].startswith("seg-")
        assert r["cdx_ts"] == "20240101000001"
        reparsed = parse_cdxj(cdxj_lines(idx)).collect()
        assert sorted(map(tuple, reparsed)) == sorted(map(tuple, rows))
        idx.unpersist()

    def test_digest_is_cc_sha1_base32_of_body(self, spark, tmp_path):
        from correctocr_spark.ops.webindex import cdx_index

        idx = cdx_index(self._segments(spark, tmp_path, n_files=1))
        r = idx.where(F.col("url").endswith("/Page/2?b=2&a=1")).collect()[0]
        body = "<html><body><p>doc number 2 body text</p></body></html>".encode()
        assert r["digest"] == base64.b32encode(hashlib.sha1(body).digest()).decode()

    def test_offsets_range_read(self, spark, tmp_path):
        """The published (filename, offset, length) triples really do
        range-read: slice the segment bytes per index row, decompress,
        and recover every page body."""
        from correctocr_spark.ops.webindex import cdx_index

        seg_dir = tmp_path
        idx = cdx_index(self._segments(spark, seg_dir, n_files=1)).collect()
        data = open(str(seg_dir / "seg-0.warc.gz"), "rb").read()
        for r in idx:
            member = data[r["offset"] : r["offset"] + r["length"]]
            rec = list(parse_warc(member))[0]
            assert rec.uri == r["url"]

    def test_fetch_plan(self, spark, tmp_path):
        from correctocr_spark.ops.webindex import cdx_index, fetch_plan

        idx = cdx_index(self._segments(spark, tmp_path, n_files=2))
        plan = {r["filename"]: r for r in fetch_plan(idx).collect()}
        assert set(plan) == {"seg-0.warc.gz", "seg-1.warc.gz"}
        for r in plan.values():
            assert r["n_records"] == 4
            assert r["first_offset"] == 0
            # members tile the file: end_offset == file size
            assert r["end_offset"] == (tmp_path / r["filename"]).stat().st_size
            assert r["total_bytes"] == r["end_offset"]


class TestParseCdxjRobustness:
    def test_malformed_lines_null_urlkey(self, spark):
        from correctocr_spark.ops.webindex import parse_cdxj

        lines = spark.createDataFrame(
            [
                Row(value='com,example)/ 20240101000000 {"url": "http://example.com/", "status": 200, "length": 10, "offset": 0, "filename": "f.warc.gz"}'),
                Row(value="garbage line with no json"),
                Row(value='com,example)/x 2024 {"url": "short ts"}'),
                Row(value=""),
            ]
        )
        out = parse_cdxj(lines).collect()
        ok = [r for r in out if r["urlkey"] is not None]
        assert len(ok) == 1 and ok[0]["status"] == 200 and ok[0]["length"] == 10


SITEMAP_XML = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc> https://example.com/a </loc>
    <lastmod>2024-01-01</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc>https://example.com/b</loc></url>
  <url><lastmod>2024-02-02</lastmod></url>
</urlset>
"""

SITEMAP_INDEX_XML = """<sitemapindex>
  <sitemap>
    <loc>https://example.com/sitemap-1.xml.gz</loc>
    <lastmod>2024-03-03T01:02:03Z</lastmod>
  </sitemap>
</sitemapindex>
"""


class TestParseSitemaps:
    def test_urlset_entries(self, spark):
        from correctocr_spark.ops.webindex import parse_sitemaps

        df = spark.createDataFrame(
            [Row(url="https://example.com/sitemap.xml", content=SITEMAP_XML)]
        )
        rows = sorted(parse_sitemaps(df).collect(), key=lambda r: r["loc"])
        # the loc-less <url> block is dropped
        assert len(rows) == 2
        a, b = rows
        assert a["loc"] == "https://example.com/a" and a["kind"] == "url"
        assert a["lastmod"] == "2024-01-01"
        assert a["changefreq"] == "daily" and a["priority"] == 0.8
        assert b["loc"] == "https://example.com/b"
        assert b["lastmod"] == "" and b["priority"] is None

    def test_sitemapindex_entries(self, spark):
        from correctocr_spark.ops.webindex import parse_sitemaps

        df = spark.createDataFrame(
            [Row(url="https://example.com/sitemap.xml", content=SITEMAP_INDEX_XML)]
        )
        rows = parse_sitemaps(df).collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["kind"] == "sitemap"
        assert r["loc"] == "https://example.com/sitemap-1.xml.gz"
        assert r["lastmod"] == "2024-03-03T01:02:03Z" and r["priority"] is None

    def test_garbage_priority_null(self, spark):
        from correctocr_spark.ops.webindex import parse_sitemaps

        df = spark.createDataFrame(
            [Row(url="s", content="<url><loc>x</loc><priority>high</priority></url>")]
        )
        assert parse_sitemaps(df).collect()[0]["priority"] is None


class TestCdxIndexSkipBad:
    def test_corrupt_segment_salvaged_or_raises(self, spark, tmp_path):
        """Strict mode fails the task on a truncated segment; skip_bad
        salvages the records before the corruption point."""
        from correctocr_spark.ops.webindex import cdx_index

        path = tmp_path / "seg-bad.warc.gz"
        write_warc(_pages(4), str(path))
        data = open(path, "rb").read()
        open(path, "wb").write(data[:-25])  # truncate the last member
        segs = spark.read.format("binaryFile").load(str(path))
        with pytest.raises(Exception):
            cdx_index(segs).collect()
        salvaged = cdx_index(segs, skip_bad=True).collect()
        assert 0 < len(salvaged) < 4


class TestRobotsDiscovery:
    BODY = (
        "# fleet policy\n"
        "Crawl-delay: 3\n"  # before any group: ignored
        "User-agent: specialbot\n"
        "Crawl-delay: 99\n"
        "Sitemap: https://h.example/a.xml\n"
        "User-agent: *\n"
        "Crawl-delay: nope\n"  # invalid: skipped, not an error
        "Crawl-delay: 2.5 # seconds\n"  # comment stripped BEFORE parse
        "Crawl-delay: 1\n"  # later valid value: first valid wins
        "Disallow: /tmp\n"
        "Sitemap: https://h.example/b.xml junk\n"
        "Sitemap: https://h.example/a.xml\n"  # duplicate kept
        "Sitemap:\n"  # empty value: skipped
    )

    def test_crawl_delay_group_scoped(self):
        from correctocr_spark.kernels.robots import parse_crawl_delay

        assert parse_crawl_delay(self.BODY) == 2.5
        # exact-token selection: the specialbot group, not *
        assert parse_crawl_delay(self.BODY, "SpecialBot") == 99.0
        # unknown token falls back to the * groups
        assert parse_crawl_delay(self.BODY, "otherbot") == 2.5

    def test_crawl_delay_absent_cases(self):
        from correctocr_spark.kernels.robots import parse_crawl_delay

        assert parse_crawl_delay("User-agent: *\nDisallow: /x\n") is None
        assert parse_crawl_delay("User-agent: *\nCrawl-delay: soon\n") is None
        # pre-group delay never applies
        assert parse_crawl_delay("Crawl-delay: 3\nUser-agent: *\n") is None
        assert parse_crawl_delay("") is None

    def test_sitemaps_global_ordered_duplicates_kept(self):
        from correctocr_spark.kernels.robots import parse_robots_sitemaps

        assert parse_robots_sitemaps(self.BODY) == [
            "https://h.example/a.xml",
            "https://h.example/b.xml",
            "https://h.example/a.xml",
        ]

    def test_op_matches_kernel(self, spark):
        from pyspark.sql import Row

        from correctocr_spark.kernels.robots import (
            parse_crawl_delay,
            parse_robots_sitemaps,
        )
        from correctocr_spark.ops.webindex import robots_discovery

        bodies = {
            "a.com": self.BODY,
            "b.com": "User-agent: *\nCrawl-delay: 7\n",
            "c.com": "just noise, no fields",
        }
        df = spark.createDataFrame(
            [Row(host=h, content=c) for h, c in bodies.items()]
        )
        got = {
            r["host"]: (r["crawl_delay"], r["sitemaps"])
            for r in robots_discovery(df).collect()
        }
        want = {
            h: (parse_crawl_delay(c), parse_robots_sitemaps(c))
            for h, c in bodies.items()
        }
        assert got == want


class TestZipNum:
    def _cdx(self, spark, n=50):
        from pyspark.sql import functions as F

        did = F.col("id")
        return spark.range(n).select(
            F.concat(
                F.lit("com,ex"), (did % 5).cast("string"),
                F.lit(")/p/"), did.cast("string"),
            ).alias("urlkey"),
            F.format_string("202401%02d000000", (did % 9 + 1).cast("int")).alias(
                "cdx_ts"
            ),
            F.concat(F.lit("http://e/"), did.cast("string")).alias("url"),
            F.lit(200).cast("long").alias("status"),
            F.lit("DIGEST").alias("digest"),
            (100 + did).cast("long").alias("length"),
            (did * 100).cast("long").alias("offset"),
            F.lit("seg-0.warc.gz").alias("filename"),
        )

    def test_blocks_plan_counts(self, spark):
        from correctocr_spark.ops.webindex import zipnum_blocks

        out = zipnum_blocks(
            self._cdx(spark), lines_per_block=8, blocks_per_part=3
        ).orderBy("block")
        rows = out.collect()
        assert [r.block for r in rows] == list(range(7))  # 50/8 -> 7 blocks
        assert [r.n_records for r in rows] == [8] * 6 + [2]
        assert rows[0].filename == "cdx-00000.gz"
        assert rows[3].filename == "cdx-00001.gz"
        assert rows[6].filename == "cdx-00002.gz"
        assert [r.first_lineno for r in rows] == [0, 8, 16, 24, 32, 40, 48]
        # first key of block 0 is the global minimum urlkey
        assert rows[0].first_urlkey == "com,ex0)/p/0"

    def test_write_roundtrip(self, spark, tmp_path):
        """cluster.idx spans must decompress to exactly the block's
        sorted CDXJ lines — the range-read contract."""
        import gzip
        import os

        from correctocr_spark.ops.webindex import (
            cdxj_lines,
            write_zipnum,
            zipnum_blocks,
        )

        cdx = self._cdx(spark)
        out_dir = str(tmp_path / "zipnum")
        idx = write_zipnum(
            cdx, out_dir, lines_per_block=8, blocks_per_part=3
        ).orderBy("block")
        rows = idx.collect()

        # plan parity: writer blocks == zipnum_blocks plan
        plan = {
            r.block: (r.filename, r.first_urlkey, r.first_ts, r.n_records)
            for r in zipnum_blocks(
                cdx, lines_per_block=8, blocks_per_part=3
            ).collect()
        }
        for r in rows:
            assert plan[r.block] == (
                r.filename, r.first_urlkey, r.first_ts, r.n_records
            )

        # byte contract: every (filename, offset, length) span is one
        # gzip member holding that block's lines in global order
        expected = sorted(
            v["value"] for v in cdxj_lines(cdx).collect()
        )
        got = []
        for r in rows:
            with open(os.path.join(out_dir, r.filename), "rb") as fh:
                fh.seek(r.offset)
                data = gzip.decompress(fh.read(r.length))
            lines = data.decode("utf-8").splitlines()
            assert len(lines) == r.n_records
            assert lines[0].startswith(f"{r.first_urlkey} {r.first_ts}")
            got.extend(lines)
        assert got == expected

        # cluster.idx file mirrors the returned frame, sorted
        with open(os.path.join(out_dir, "cluster.idx"), encoding="utf-8") as fh:
            idx_lines = fh.read().splitlines()
        assert len(idx_lines) == len(rows)
        assert idx_lines[0] == (
            f"{rows[0].first_urlkey} {rows[0].first_ts}\t{rows[0].filename}"
            f"\t{rows[0].offset}\t{rows[0].length}\t{rows[0].block}"
        )
        # members are concatenated back-to-back: offsets are dense
        by_file = {}
        for r in rows:
            by_file.setdefault(r.filename, []).append(r)
        for fname, rs in by_file.items():
            pos = 0
            for r in sorted(rs, key=lambda x: x.block):
                assert r.offset == pos
                pos += r.length
            assert pos == os.path.getsize(os.path.join(out_dir, fname))

    def test_empty_input(self, spark):
        from pyspark.sql import functions as F

        from correctocr_spark.ops.webindex import zipnum_blocks

        out = zipnum_blocks(self._cdx(spark).where(F.lit(False)))
        assert out.count() == 0


class TestRevisitCollapse:
    def test_earliest_wins_and_pointers(self, spark):
        from correctocr_spark.ops.webindex import revisit_collapse

        cdx = spark.createDataFrame(
            [
                ("com,a)/x", "20240102000000", "D1"),
                ("com,b)/y", "20240101000000", "D1"),   # earliest for D1
                ("com,c)/z", "20240103000000", "D1"),
                ("com,d)/q", "20240105000000", "D2"),   # singleton
                # same-ts tie inside D3: urlkey breaks it
                ("com,f)/t", "20240104000000", "D3"),
                ("com,e)/s", "20240104000000", "D3"),
                ("com,g)/n", None, None),               # null digest dropped
            ],
            "urlkey string, cdx_ts string, digest string",
        )
        rows = {r.urlkey: r for r in revisit_collapse(cdx).collect()}
        assert len(rows) == 6
        assert rows["com,b)/y"].record_type == "response"
        assert rows["com,b)/y"].orig_ts is None
        for k in ("com,a)/x", "com,c)/z"):
            assert rows[k].record_type == "revisit"
            assert rows[k].orig_ts == "20240101000000"
            assert rows[k].orig_urlkey == "com,b)/y"
        assert rows["com,d)/q"].record_type == "response"
        assert rows["com,e)/s"].record_type == "response"  # tie: smaller urlkey
        assert rows["com,f)/t"].orig_urlkey == "com,e)/s"

    def test_no_window_in_plan(self, spark):
        """Hot digests (empty-body sha1) forbid a digest-partitioned
        window; the plan must be a combinable aggregate + join."""
        import io
        from contextlib import redirect_stdout

        from correctocr_spark.ops.webindex import revisit_collapse

        cdx = spark.createDataFrame(
            [("k", "20240101000000", "D")],
            "urlkey string, cdx_ts string, digest string",
        )
        buf = io.StringIO()
        with redirect_stdout(buf):
            revisit_collapse(cdx).explain("formatted")
        p = buf.getvalue()
        assert "Window" not in p
        assert "HashAggregate" in p or "SortAggregate" in p


class TestFrontierSchedule:
    def test_slots_delays_and_cap(self, spark):
        from correctocr_spark.ops.webindex import frontier_schedule

        urls = spark.createDataFrame(
            [
                ("http://a.com/1", 5),
                ("http://a.com/2", 9),   # highest prio on a.com -> slot 0
                ("http://a.com/3", 5),   # prio tie with /1: url order
                ("http://b.com/x", 1),
                ("garbage", 7),          # unparseable host dropped
            ],
            "url string, prio long",
        )
        delays = spark.createDataFrame(
            [("a.com", 1.5)], "host string, crawl_delay double"
        )
        rows = {
            r.url: r
            for r in frontier_schedule(
                urls, delays, priority_col="prio"
            ).collect()
        }
        assert len(rows) == 4
        assert (rows["http://a.com/2"].slot, rows["http://a.com/2"].fetch_offset_ms) == (0, 0)
        assert (rows["http://a.com/1"].slot, rows["http://a.com/1"].fetch_offset_ms) == (1, 1500)
        assert rows["http://a.com/3"].slot == 2
        # b.com has no declared delay -> default 1000ms
        assert (rows["http://b.com/x"].delay_ms, rows["http://b.com/x"].fetch_offset_ms) == (1000, 0)

        capped = frontier_schedule(
            urls, delays, priority_col="prio", max_per_host=2
        ).collect()
        a = [r for r in capped if r.host == "a.com"]
        assert {r.url for r in a} == {"http://a.com/2", "http://a.com/1"}

    def test_no_delays_and_no_priority(self, spark):
        from correctocr_spark.ops.webindex import frontier_schedule

        urls = spark.createDataFrame(
            [("http://c.com/b",), ("http://c.com/a",)], "url string"
        )
        rows = {r.url: r.slot for r in frontier_schedule(urls).collect()}
        assert rows == {"http://c.com/a": 0, "http://c.com/b": 1}

    def test_delay_dim_broadcast(self, spark):
        """The delay table must join as a broadcast dimension — a
        shuffled join on host would move the whole frontier."""
        import io
        from contextlib import redirect_stdout

        from correctocr_spark.ops.webindex import frontier_schedule

        urls = spark.createDataFrame([("http://a.com/1", 1)], "url string, prio long")
        delays = spark.createDataFrame(
            [("a.com", 1.0)], "host string, crawl_delay double"
        )
        buf = io.StringIO()
        with redirect_stdout(buf):
            frontier_schedule(urls, delays, priority_col="prio").explain("formatted")
        p = buf.getvalue()
        assert "BroadcastHashJoin" in p
        assert "SortMergeJoin" not in p


class TestZipnumLookup:
    def test_range_and_prefix_probes(self, spark):
        from correctocr_spark.ops.webindex import zipnum_lookup

        cluster = spark.createDataFrame(
            [
                (0, "cdx-00000.gz", "com,a)/1", "20240101000000", 8),
                (1, "cdx-00000.gz", "com,c)/5", "20240101000000", 8),
                (2, "cdx-00001.gz", "com,m)/2", "20240101000000", 8),
                (3, "cdx-00001.gz", "com,t)/9", "20240101000000", 4),
            ],
            "block long, filename string, first_urlkey string, "
            "first_ts string, n_records long",
        )
        # range [com,c), com,n)): block 0 may hold keys < com,c)/5? No —
        # block 0 covers [com,a)/1, com,c)/5): com,c) < com,c)/5 so it
        # CAN hold com,c)* keys; blocks 1 and 2 intersect too; 3 doesn't
        got = {r.block for r in zipnum_lookup(
            cluster, "com,c)", "com,n)").collect()}
        assert got == {0, 1, 2}
        # point/prefix probe on the LAST block (open-ended)
        got = {r.block for r in zipnum_lookup(cluster, "com,z)").collect()}
        assert got == {3}
        # next_first is the successor's first key, NULL on the last
        rows = {r.block: r.next_first for r in zipnum_lookup(
            cluster, "com,a)", "zzz").collect()}
        assert rows[0] == "com,c)/5" and rows[3] is None

    def test_no_window_in_plan(self, spark):
        import io
        from contextlib import redirect_stdout

        from correctocr_spark.ops.webindex import zipnum_lookup

        cluster = spark.createDataFrame(
            [(0, "f", "a", "t", 1)],
            "block long, filename string, first_urlkey string, "
            "first_ts string, n_records long",
        )
        buf = io.StringIO()
        with redirect_stdout(buf):
            zipnum_lookup(cluster, "a").explain("formatted")
        p = buf.getvalue()
        assert "Window" not in p  # successor via block+1 join, not lead()


class TestPostingsSizeAudit:
    def _audit(self, spark, texts):
        from correctocr_spark.ops.webindex import postings_size_audit
        from pyspark.sql import Row

        df = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
        )
        return {
            r["term"]: r.asDict() for r in postings_size_audit(df).collect()
        }

    def test_dense_term_compresses(self, spark):
        # 'x' in all 5 docs: stored values = [0,1,1,1,1] -> 5 bytes
        out = self._audit(spark, ["x"] * 5)
        r = out["x"]
        assert r["df"] == 5 and r["delta_bytes"] == 5
        assert r["raw_bytes"] == 40
        assert r["savings_bp"] == 8750  # floor(35*10000/40)

    def test_multibyte_gap_width(self, spark):
        from correctocr_spark.ops.webindex import postings_size_audit

        # doc ids 0 and 200: gap 200 needs 2 varint bytes
        df = spark.createDataFrame(
            [(0, "y"), (200, "y")], "doc_id long, text string"
        )
        r = postings_size_audit(df).first()
        assert r["df"] == 2 and r["delta_bytes"] == 1 + 2

    def test_duplicate_occurrences_count_once(self, spark):
        out = self._audit(spark, ["z z z z"])
        assert out["z"]["df"] == 1 and out["z"]["delta_bytes"] == 1

    def test_first_id_stored_raw(self, spark):
        from correctocr_spark.ops.webindex import postings_size_audit

        # a single posting at id 16384 costs 3 varint bytes
        df = spark.createDataFrame([(16384, "q")], "doc_id long, text string")
        r = postings_size_audit(df).first()
        assert r["delta_bytes"] == 3 and r["raw_bytes"] == 8



class TestUrlFeatures:
    def _feats(self, spark, urls):
        from correctocr_spark.ops.webindex import url_features
        from pyspark.sql import Row

        df = spark.createDataFrame(
            [Row(doc_id=i, url=u) for i, u in enumerate(urls)]
        )
        return {r["doc_id"]: r.asDict() for r in url_features(df).collect()}

    def test_depth_params_digits(self, spark):
        r = self._feats(spark, ["https://Ex.com:8080/a/b12/c.html?x=1&y=2#frag"])[0]
        assert r["host"] == "ex.com:8080".replace(":8080", "") or r["host"] == "ex.com"
        assert r["path_depth"] == 3
        assert r["n_params"] == 2
        # path '/a/b12/c.html' = 13 chars, 2 digits
        assert r["digit_bp"] == (2 * 10000) // 13
        assert r["is_index"] is False and r["has_session_id"] is False

    def test_root_and_index_pages(self, spark):
        out = self._feats(
            spark,
            ["https://a.com/", "https://a.com", "https://a.com/x/index.html"],
        )
        assert all(out[i]["is_index"] for i in range(3))
        assert out[1]["path_depth"] == 0 and out[1]["n_params"] == 0

    def test_session_id_detection(self, spark):
        out = self._feats(
            spark,
            [
                "https://a.com/p?phpsessid=deadbeef",
                "https://a.com/p?a=1&jsessionid=x",
                "https://a.com/p?subside=x",  # 'sid' must not match inside a name
            ],
        )
        assert out[0]["has_session_id"] and out[1]["has_session_id"]
        assert not out[2]["has_session_id"]

    def test_unparseable_url_degrades(self, spark):
        r = self._feats(spark, ["not a url"])[0]
        assert r["host"] == "" and r["path_depth"] == 0
        assert r["url_len"] == 9


class TestHostCardinality:
    def test_url_and_content_dup_rates(self, spark):
        from correctocr_spark.ops.webindex import host_cardinality
        from pyspark.sql import Row

        rows = [
            ("https://a.com/1", "x"),
            ("https://a.com/1", "y"),   # repeated url
            ("https://a.com/2", "x"),   # repeated content
            ("https://a.com/3", "z"),
            ("https://b.com/1", "x"),   # other host: independent
        ]
        df = spark.createDataFrame([Row(url=u, text=t) for u, t in rows])
        out = {r["host"]: r.asDict() for r in host_cardinality(df).collect()}
        a = out["a.com"]
        assert a["n_pages"] == 4 and a["n_urls"] == 3 and a["n_fingerprints"] == 3
        assert a["url_dup_bp"] == 2500 and a["content_dup_bp"] == 2500
        b = out["b.com"]
        assert b["n_pages"] == 1 and b["url_dup_bp"] == 0

    def test_unparseable_urls_bucket_empty_host(self, spark):
        from correctocr_spark.ops.webindex import host_cardinality
        from pyspark.sql import Row

        df = spark.createDataFrame(
            [Row(url="junk", text="t"), Row(url=None, text="t")]
        )
        out = {r["host"]: r.asDict() for r in host_cardinality(df).collect()}
        assert out[""]["n_pages"] == 2


class TestRegisteredDomains:
    """PSL eTLD+1 extraction: plain/wildcard/exception rules, default
    rule, host-is-suffix and unparseable edges, and the rollup."""

    CASES = [
        # (url, host, public_suffix, registered_domain)
        ("http://www.example.com/a", "www.example.com", "com", "example.com"),
        ("https://a.b.example.co.uk:8080/x?y=1", "a.b.example.co.uk", "co.uk", "example.co.uk"),
        ("http://foo.bar.ck/", "foo.bar.ck", "bar.ck", "foo.bar.ck"),  # *.ck
        ("http://www.ck/", "www.ck", "ck", "www.ck"),                  # !www.ck
        ("http://com/", "com", "com", None),                           # host IS a PS
        ("not a url", "", None, None),
        ("http://user.github.io/repo", "user.github.io", "github.io", "user.github.io"),
        ("http://deep.sub.user.blogspot.com/", "deep.sub.user.blogspot.com", "blogspot.com", "user.blogspot.com"),
        ("http://unknowntld.zz/", "unknowntld.zz", "zz", "unknowntld.zz"),  # implicit *
        ("http://ck/", "ck", "ck", None),  # wildcard base itself: no match
    ]

    def test_psl_branches(self, spark):
        from correctocr_spark.ops.webindex import registered_domains

        df = spark.createDataFrame(
            [(i, c[0]) for i, c in enumerate(self.CASES)], ["doc_id", "url"]
        )
        got = {r["doc_id"]: r for r in registered_domains(df).collect()}
        for i, (_, host, ps, rd) in enumerate(self.CASES):
            assert got[i]["host"] == host, i
            assert got[i]["public_suffix"] == ps, i
            assert got[i]["registered_domain"] == rd, i

    def test_custom_rules_and_depth_cap(self, spark):
        from correctocr_spark.ops.webindex import registered_domains

        df = spark.createDataFrame(
            [(1, "http://x.y.a.b.c/"), (2, "http://p.q.a.b.c/")],
            ["doc_id", "url"],
        )
        out = {
            r["doc_id"]: r
            for r in registered_domains(df, rules=("a.b.c", "*.q.a.b.c")).collect()
        }
        assert out[1]["registered_domain"] == "y.a.b.c"
        # wildcard one deeper than its base wins over the plain rule
        assert out[2]["public_suffix"] == "p.q.a.b.c"
        assert out[2]["registered_domain"] is None

    def test_domain_rollup(self, spark):
        from correctocr_spark.ops.webindex import domain_rollup

        rows = [
            (1, "http://a.blogspot.com/"),
            (2, "http://b.blogspot.com/"),
            (3, "http://a.blogspot.com/x"),
            (4, "junk"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "url"])
        out = {r["registered_domain"]: r for r in domain_rollup(df).collect()}
        # each *.blogspot.com subdomain is its OWN registered domain
        assert out["a.blogspot.com"]["n_pages"] == 2
        assert out["a.blogspot.com"]["n_hosts"] == 1
        assert out["b.blogspot.com"]["n_pages"] == 1
        assert out["(none)"]["n_pages"] == 1


class TestParseFeeds:
    RSS = """<rss><channel><title>Chan</title>
<item><title><![CDATA[Post One]]></title><link>http://a.com/1</link><pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate></item>
<item><link> http://a.com/2 </link></item>
<item><title>No link drops</title></item>
</channel></rss>"""
    ATOM = """<feed><title>F</title>
<entry><title>E1</title><link rel="alternate" href="http://b.com/x"/><updated>2024-01-02T00:00:00Z</updated></entry>
<entry><link href='http://b.com/y'/><published>2024-01-03T00:00:00Z</published><updated>2024-01-04T00:00:00Z</updated></entry>
</feed>"""

    def test_rss_and_atom(self, spark):
        from correctocr_spark.ops.webindex import parse_feeds

        df = spark.createDataFrame(
            [("http://a.com/feed", self.RSS), ("http://b.com/atom", self.ATOM)],
            ["url", "content"],
        )
        out = {(r["kind"], r["link"]): r for r in parse_feeds(df).collect()}
        assert len(out) == 4  # the linkless item dropped
        r1 = out[("rss", "http://a.com/1")]
        assert r1["title"] == "Post One"  # CDATA stripped
        assert r1["published"].startswith("Mon, 01 Jan")
        assert out[("rss", "http://a.com/2")]["published"] == ""  # link trimmed
        # atom: published falls back to updated; single-quoted href parses
        assert out[("atom", "http://b.com/x")]["published"] == "2024-01-02T00:00:00Z"
        assert out[("atom", "http://b.com/y")]["published"] == "2024-01-03T00:00:00Z"

    def test_empty_and_garbage(self, spark):
        from correctocr_spark.ops.webindex import parse_feeds

        df = spark.createDataFrame(
            [("u1", ""), ("u2", "not xml at all"), ("u3", "<item>no close")],
            ["url", "content"],
        )
        assert parse_feeds(df).count() == 0
