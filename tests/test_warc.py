"""WARC source/sink: kernel parse + Spark reader + shard-sink roundtrip."""

import datetime
import gzip
import io

import pytest

from correctocr_spark.kernels.warc import (
    iter_pages,
    parse_warc,
    split_http_response,
    write_warc,
)


def _pages(n=6):
    return [
        (
            f"https://example.org/page/{i}",
            datetime.datetime(2024, 1, 1, 0, 0, i),
            f"<html><body><p>doc number {i} body text</p></body></html>".encode(),
        )
        for i in range(n)
    ]


class TestWarcKernel:
    @pytest.mark.parametrize("gz", [False, True])
    def test_roundtrip(self, tmp_path, gz):
        pages = _pages()
        path = str(tmp_path / ("a.warc" + (".gz" if gz else "")))
        write_warc(pages, path, gzip_records=gz)
        data = open(path, "rb").read()
        got = list(iter_pages(data))
        assert [(u, t, h) for u, t, h in got] == [
            (u, t.replace(tzinfo=datetime.timezone.utc), h) for u, t, h in pages
        ]

    def test_writer_deterministic(self, tmp_path):
        a, b = str(tmp_path / "a.warc.gz"), str(tmp_path / "b.warc.gz")
        write_warc(_pages(), a)
        write_warc(_pages(), b)
        assert open(a, "rb").read() == open(b, "rb").read()

    def test_non_response_records_skipped(self, tmp_path):
        path = str(tmp_path / "a.warc")
        write_warc(_pages(2), path, gzip_records=False)
        info = (
            b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 5\r\n\r\nhello\r\n\r\n"
        )
        data = info + open(path, "rb").read()
        recs = list(parse_warc(data))
        assert [r.rec_type for r in recs] == ["warcinfo", "response", "response"]
        assert len(list(iter_pages(data))) == 2

    def test_non_2xx_dropped_unless_ok_only_false(self, tmp_path):
        path = str(tmp_path / "a.warc")
        write_warc(_pages(3), path, gzip_records=False, status=404)
        data = open(path, "rb").read()
        assert list(iter_pages(data)) == []
        assert len(list(iter_pages(data, ok_only=False))) == 3

    def test_http_envelope_stripped_byte_exact(self):
        body = b"<html>\r\n\r\nweird \x00 bytes</html>"
        status, got = split_http_response(
            b"HTTP/1.1 200 OK\r\nX: y\r\n\r\n" + body
        )
        assert status == 200 and got == body
        # bare resource payload (no HTTP envelope) passes through whole
        status, got = split_http_response(body)
        assert status is None and got == body

    def test_truncated_payload_raises_strict_salvages_with_skip_bad(self, tmp_path):
        path = str(tmp_path / "a.warc")
        write_warc(_pages(3), path, gzip_records=False)
        data = open(path, "rb").read()[:-40]  # cut into the last record
        with pytest.raises(ValueError):
            list(parse_warc(data))
        salvaged = list(iter_pages(data, skip_bad=True))
        assert len(salvaged) == 2  # records before the corruption point

    def test_truncated_gzip_member_raises(self, tmp_path):
        path = str(tmp_path / "a.warc.gz")
        write_warc(_pages(2), path)
        data = open(path, "rb").read()[:-10]
        with pytest.raises(ValueError):
            list(parse_warc(data))

    def test_whole_file_gzip_also_parses(self, tmp_path):
        path = str(tmp_path / "a.warc")
        write_warc(_pages(3), path, gzip_records=False)
        out = io.BytesIO()
        with gzip.GzipFile(fileobj=out, mode="wb", mtime=0) as gz:
            gz.write(open(path, "rb").read())
        assert len(list(iter_pages(out.getvalue()))) == 3

    def test_bad_date_keeps_record(self, tmp_path):
        raw = (
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: https://x/\r\nWARC-Date: not-a-date\r\n"
            b"Content-Length: 4\r\n\r\nbody\r\n\r\n"
        )
        (url, ts, html), = list(iter_pages(raw))
        assert url == "https://x/" and ts is None and html == b"body"

    def test_empty_input(self):
        assert list(parse_warc(b"")) == []


class TestWarcSpark:
    def test_read_warc_roundtrip(self, spark, tmp_path):
        from correctocr_spark.spark.warc import read_warc

        pages = _pages(10)
        write_warc(pages[:5], str(tmp_path / "a.warc.gz"))
        write_warc(pages[5:], str(tmp_path / "b.warc.gz"))
        df = read_warc(spark, str(tmp_path))
        assert [f.name for f in df.schema.fields] == ["url", "warc_ts", "html"]
        got = sorted(
            (r.url, r.warc_ts, bytes(r.html)) for r in df.collect()
        )
        assert got == sorted(pages)

    def test_warc_pages_north_rule_shape_and_lang_parity(self, spark, tmp_path):
        from correctocr_spark.ops.textstats import language_id
        from correctocr_spark.spark.synth import synth_pages
        from correctocr_spark.spark.warc import warc_pages, write_warc_shards

        src = synth_pages(spark, 40, seed=7, partitions=4)
        manifest = write_warc_shards(src, str(tmp_path / "warc"), partitions=3).collect()
        assert sum(r.n_records for r in manifest) == 40
        assert len(manifest) == 3

        df = warc_pages(spark, str(tmp_path / "warc"))
        assert [f.name for f in df.schema.fields] == [
            "url", "warc_ts", "html", "text", "lang",
        ]
        rows = df.collect()
        assert len(rows) == 40
        # extraction matches the synth ground-truth body text
        truth = {r.url: (r.warc_ts, r.text) for r in src.collect()}
        for r in rows:
            ts, text = truth[r.url]
            assert r.warc_ts == ts
            assert r.text == text
        # lang column == ops.textstats.language_id on the same text
        lid = {
            r.doc_id: r.lang_pred
            for r in language_id(df, id_col="url", text_col="text").collect()
        }
        for r in rows:
            assert r.lang == lid[r.url], r.url

    def test_read_warc_parallelism_is_per_file(self, spark, tmp_path):
        from correctocr_spark.spark.warc import read_warc

        pages = _pages(9)
        for i in range(3):
            write_warc(pages[3 * i : 3 * i + 3], str(tmp_path / f"p{i}.warc.gz"))
        df = read_warc(spark, str(tmp_path))
        # one task per WARC file: the scan must not collapse to 1 split
        assert df.rdd.getNumPartitions() >= 3
        assert df.count() == 9


class TestWet:
    def test_kernel_roundtrip(self, tmp_path):
        import datetime as dt

        from correctocr_spark.kernels.warc import iter_text_records, write_wet

        pages = [
            (f"https://e/{i}", dt.datetime(2024, 2, 1, 0, 0, i), f"text £{i} — body")
            for i in range(5)
        ]
        path = str(tmp_path / "a.wet.gz")
        write_wet(pages, path)
        got = list(iter_text_records(open(path, "rb").read()))
        assert got == [
            (u, t.replace(tzinfo=dt.timezone.utc), x) for u, t, x in pages
        ]

    def test_wet_reader_ignores_response_records(self, tmp_path):
        from correctocr_spark.kernels.warc import iter_text_records, write_warc

        write_warc(_pages(3), str(tmp_path / "a.warc"), gzip_records=False)
        assert list(iter_text_records(open(tmp_path / "a.warc", "rb").read())) == []

    def test_spark_wet_roundtrip(self, spark, tmp_path):
        from correctocr_spark.spark.synth import synth_pages
        from correctocr_spark.spark.warc import read_wet, write_wet_shards

        src = synth_pages(spark, 30, seed=11, partitions=3)
        manifest = write_wet_shards(src, str(tmp_path / "wet"), partitions=2).collect()
        assert sum(r.n_records for r in manifest) == 30
        df = read_wet(spark, str(tmp_path / "wet"))
        assert [f.name for f in df.schema.fields] == ["url", "warc_ts", "text"]
        truth = {(r.url, r.warc_ts, r.text) for r in src.collect()}
        assert {(r.url, r.warc_ts, r.text) for r in df.collect()} == truth


class TestWarcStreaming:
    def test_ingest_stream_exactly_once_across_restart(self, spark, tmp_path):
        """Segments land -> stream ingests -> restart with a NEW segment:
        only the new file is processed (checkpointed file tracking), and
        the final table equals the batch reader's view of all segments."""
        from correctocr_spark.spark.streaming import warc_ingest_stream
        from correctocr_spark.spark.warc import warc_pages

        warc_dir, out, ckpt = (
            str(tmp_path / "warc"),
            str(tmp_path / "pages"),
            str(tmp_path / "ckpt"),
        )
        import os as _os

        _os.makedirs(warc_dir)
        write_warc(_pages(4), f"{warc_dir}/seg0.warc.gz")
        write_warc(_pages(8)[4:], f"{warc_dir}/seg1.warc.gz")

        q = warc_ingest_stream(spark, warc_dir, out, ckpt)
        q.awaitTermination(120)
        assert spark.read.parquet(out).count() == 8

        # a new segment lands; restart picks up ONLY seg2
        write_warc(_pages(11)[8:], f"{warc_dir}/seg2.warc.gz")
        q2 = warc_ingest_stream(spark, warc_dir, out, ckpt)
        q2.awaitTermination(120)

        got = spark.read.parquet(out)
        assert got.count() == 11  # no re-ingest of seg0/seg1
        batch = warc_pages(spark, warc_dir)
        assert (
            sorted((r.url, r.warc_ts, r.text, r.lang) for r in got.collect())
            == sorted((r.url, r.warc_ts, r.text, r.lang) for r in batch.collect())
        )


class TestJustextExtractor:
    SW = frozenset("the of and to in is was for that with a it".split())
    GOOD = (
        "the results of the study were that the effect was large and the "
        "sample was varied in the end for all that it was worth and the "
        "study was good " * 2
    ).strip()

    def _html(self, middle):
        return (
            f"<body><nav><a href=x>Home</a> <a href=y>About</a></nav>"
            f"<p>{self.GOOD}</p>{middle}<p>{self.GOOD}</p>"
            f"<div><a href=z>share this</a></div></body>"
        )

    def test_pass1_labels(self):
        from correctocr_spark.kernels.extract import classify_blocks

        labels = [
            lab for _, lab in classify_blocks(self._html("<p>tiny note</p>"), stopwords=self.SW)
        ]
        # the <nav> subtree is pruned before blocks exist; the trailing
        # link-only div survives pruning and classifies bad
        assert labels == ["good", "short", "good", "bad"]

    def test_short_promoted_between_goods_demoted_at_edges(self):
        from correctocr_spark.kernels.extract import justext_extract

        out = justext_extract(self._html("<p>tiny note</p>"), stopwords=self.SW)
        assert "tiny note" in out
        assert "Home" not in out and "share this" not in out
        # a leading short block (edge counts as bad side) is dropped
        lead = f"<body><p>hdr</p><p>{self.GOOD}</p></body>"
        assert "hdr" not in justext_extract(lead, stopwords=self.SW)

    def test_near_good_promotes_with_one_good_side(self):
        from correctocr_spark.kernels.extract import classify_blocks, justext_extract

        # long enough to clear length_low, stopword density in the
        # near-good band, nonsense filler keeps density below high
        near = ("the " + "zq " * 2) * 12
        html = f"<body><p>{near}</p><p>{self.GOOD}</p></body>"
        labs = [lab for _, lab in classify_blocks(html, stopwords=self.SW, stopword_low=0.30, stopword_high=0.40)]
        assert labs[0] == "near_good"
        out = justext_extract(html, stopwords=self.SW, stopword_low=0.30, stopword_high=0.40)
        assert "zq" in out

    def test_gibberish_block_dropped(self):
        from correctocr_spark.kernels.extract import justext_extract

        junk = " ".join(f"tok{i}" for i in range(40))
        html = f"<body><p>{self.GOOD}</p><p>{junk}</p><p>{self.GOOD}</p></body>"
        assert "tok3" not in justext_extract(html, stopwords=self.SW)

    def test_spark_extractor_selection(self, spark, tmp_path):
        from correctocr_spark.spark.warc import warc_pages, write_warc_shards
        from correctocr_spark.spark.synth import synth_pages

        src = synth_pages(spark, 12, seed=5, partitions=2)
        write_warc_shards(src, str(tmp_path / "w"), partitions=1).collect()
        df = warc_pages(spark, str(tmp_path / "w"), extractor="justext")
        assert df.count() == 12  # every page returns (text may be empty)
        import pytest as _pytest

        with _pytest.raises(ValueError):
            warc_pages(spark, str(tmp_path / "w"), extractor="bogus")


class TestWat:
    def _meta_pages(self, spark):
        from pyspark.sql import Row

        rows = [
            Row(
                url=f"https://w.example/p/{i}",
                warc_ts=datetime.datetime(2024, 2, 1, 0, 0, i),
                html=(
                    f"<html><head><title>Doc {i} \n  here</title>"
                    + (
                        "<meta content='d%d' name=\"description\">" % i
                        if i % 2 == 0
                        else ""
                    )
                    + (
                        f'<link rel=canonical href="https://c.example/{i}">'
                        if i % 3 == 0
                        else ""
                    )
                    + f'</head><body><a href="https://t.example/{i}">go {i}</a>'
                    + '<a href="https://t.example/x">x</a></body></html>'
                ),
            )
            for i in range(6)
        ]
        return spark.createDataFrame(rows)

    def test_wat_records_match_page_metadata_and_links(self, spark):
        """wat_records must agree with the two oracled ops it shares
        grammar with — page_metadata per field, extract_links per
        outlink (order preserved)."""
        from correctocr_spark.ops.cleaning import extract_links
        from correctocr_spark.ops.filters import page_metadata
        from correctocr_spark.spark.warc import wat_records

        pages = self._meta_pages(spark)
        wat = {r["url"]: r for r in wat_records(pages).collect()}
        meta = {
            r["doc_id"]: r
            for r in page_metadata(pages, id_col="url", html_col="html").collect()
        }
        links = {}
        for r in extract_links(pages, id_col="url", html_col="html").collect():
            links.setdefault(r["doc_id"], []).append((r["href"], r["anchor"]))
        assert set(wat) == set(meta)
        for url, w in wat.items():
            assert w["title"] == meta[url]["title"]
            assert w["meta_description"] == meta[url]["meta_description"]
            assert w["canonical_url"] == meta[url]["canonical_url"]
            assert [(l["href"], l["anchor"]) for l in w["links"]] == links.get(
                url, []
            )

    def test_wat_roundtrip(self, spark, tmp_path):
        """wat_records -> write_wat_shards -> read_wat is the identity
        (the WARC/WET/WAT sink-source inverse-proof pattern)."""
        from correctocr_spark.spark.warc import (
            read_wat,
            wat_records,
            write_wat_shards,
        )

        wat = wat_records(self._meta_pages(spark))
        manifest = write_wat_shards(wat, str(tmp_path / "wat"), partitions=2).collect()
        assert sum(m["n_records"] for m in manifest) == 6
        back = read_wat(spark, str(tmp_path / "wat"))
        key = lambda r: r["url"]
        src = sorted((tuple(r) for r in wat.collect()), key=lambda t: t[0])
        got = sorted((tuple(r) for r in back.collect()), key=lambda t: t[0])
        assert got == src

    def test_wat_reader_ignores_conversion_records(self, tmp_path):
        """A WET file contains no metadata records: read side yields
        nothing instead of misparsing."""
        from correctocr_spark.kernels.warc import (
            iter_metadata_records,
            write_wet,
        )

        path = str(tmp_path / "a.wet.gz")
        write_wet(
            [("https://e.org/1", datetime.datetime(2024, 1, 1), "text")], path
        )
        assert list(iter_metadata_records(open(path, "rb").read())) == []
