"""WARC (ISO 28500) record parsing and writing — pure Python, no Spark.

Common-Crawl-style pages arrive on disk as WARC files: a sequence of
records, each a header block (``WARC/1.0`` + ``Name: value`` lines)
followed by ``Content-Length`` bytes of payload. Crawl *response*
records wrap an HTTP response whose body is the page HTML — exactly the
``(url, warc_ts, html)`` triple of the target pages table. Common Crawl
ships each record as its own gzip member, concatenated, so a reader can
stream members sequentially without decompressing the whole file.

This module is the kernel layer: byte-level parse/serialize only, fully
unit-testable without Spark. The Spark source lives in
``correctocr_spark.spark.warc`` (binaryFile scan + mapInPandas over
this parser — one task per WARC file, the standard Common Crawl layout
of many ~1 GB segment files parallelizes across the file axis).

Not present in the reference (which ingests .txt/.pdf/.hocr via
workspace docs, workspace.py:100-141); required by the target pipeline:
the input hint's pages table is Common-Crawl-shaped and WARC is how
such pages exist before ingestion.

STRICT by policy (same rule as MinHashIndex reads): a structurally
corrupt record RAISES instead of silently truncating the corpus;
callers that want salvage semantics pass ``skip_bad=True`` and get the
records before the corruption point.
"""

from __future__ import annotations

import gzip
import json
import re
import io
import zlib
from datetime import datetime, timezone
from typing import Iterator, List, Optional, Tuple

_CRLF = b"\r\n"
_GZIP_MAGIC = b"\x1f\x8b"


class WarcRecord:
    """One parsed WARC record: type, target URI, date, raw payload."""

    __slots__ = ("rec_type", "uri", "date", "payload", "content_type")

    def __init__(
        self,
        rec_type: str,
        uri: Optional[str],
        date: Optional[datetime],
        payload: bytes,
        content_type: Optional[str] = None,
    ) -> None:
        self.rec_type = rec_type
        self.uri = uri
        self.date = date
        self.payload = payload
        self.content_type = content_type


def _parse_warc_date(value: str) -> Optional[datetime]:
    """WARC-Date is W3C ISO-8601 UTC (``2024-01-01T00:00:00Z``).

    Sub-second digits are allowed by the spec; normalize to a tz-aware
    UTC datetime. Unparseable dates return None (the date is metadata,
    not structure — a bad date must not kill the record)."""
    text = value.strip()
    if text.endswith("Z"):
        text = text[:-1] + "+00:00"
    try:
        parsed = datetime.fromisoformat(text)
    except ValueError:
        return None
    if parsed.tzinfo is None:
        parsed = parsed.replace(tzinfo=timezone.utc)
    return parsed.astimezone(timezone.utc)


def _read_headers(buf: io.BufferedIOBase) -> Optional[List[Tuple[str, str]]]:
    """Read a CRLF-terminated header block. Returns None at clean EOF
    (possibly after blank padding lines between records)."""
    headers: List[Tuple[str, str]] = []
    saw_any = False
    while True:
        line = buf.readline()
        if not line:
            if saw_any:
                raise ValueError("truncated WARC header block at EOF")
            return None
        stripped = line.rstrip(b"\r\n")
        if not stripped:
            if saw_any:
                return headers
            continue  # inter-record blank padding
        saw_any = True
        if b":" in stripped:
            name, _, value = stripped.partition(b":")
            headers.append(
                (
                    name.decode("ascii", "replace").strip().lower(),
                    value.decode("utf-8", "replace").strip(),
                )
            )
        else:
            # version line (WARC/1.0) or a continuation we don't fold
            headers.append(("", stripped.decode("ascii", "replace")))
    # unreachable


def _header(headers: List[Tuple[str, str]], name: str) -> Optional[str]:
    for key, value in headers:
        if key == name:
            return value
    return None


def _iter_plain(buf: io.BufferedIOBase) -> Iterator[WarcRecord]:
    """Iterate records from an UNcompressed WARC stream."""
    while True:
        headers = _read_headers(buf)
        if headers is None:
            return
        version = headers[0][1] if headers and headers[0][0] == "" else ""
        if not version.startswith("WARC/"):
            raise ValueError(f"record does not start with WARC/ version line: {version!r}")
        length_text = _header(headers, "content-length")
        if length_text is None:
            raise ValueError("WARC record missing Content-Length")
        try:
            length = int(length_text)
        except ValueError:
            raise ValueError(f"bad Content-Length: {length_text!r}")
        if length < 0:
            raise ValueError(f"bad Content-Length: {length_text!r}")
        payload = buf.read(length)
        if len(payload) != length:
            raise ValueError(
                f"truncated WARC payload: expected {length} bytes, got {len(payload)}"
            )
        yield WarcRecord(
            rec_type=(_header(headers, "warc-type") or "").lower(),
            uri=_header(headers, "warc-target-uri"),
            date=_parse_warc_date(_header(headers, "warc-date") or ""),
            payload=payload,
            content_type=_header(headers, "content-type"),
        )


def _iter_gzip_members(data: bytes) -> Iterator[bytes]:
    """Decompress a stream of concatenated gzip members one by one
    (Common Crawl's per-record-gzip layout)."""
    pos = 0
    while pos < len(data):
        if data[pos : pos + 2] != _GZIP_MAGIC:
            raise ValueError(f"expected gzip member at offset {pos}")
        decomp = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
        member = decomp.decompress(data[pos:])
        if not decomp.eof:
            raise ValueError(f"truncated gzip member at offset {pos}")
        yield member
        consumed = len(data) - pos - len(decomp.unused_data)
        if consumed <= 0:  # pragma: no cover - zlib guarantees progress
            raise ValueError(f"gzip member at offset {pos} consumed no bytes")
        pos += consumed


def parse_warc(data: bytes, skip_bad: bool = False) -> Iterator[WarcRecord]:
    """Parse WARC bytes — plain or per-record/whole-file gzip — into
    records. ``skip_bad=True`` yields records up to the first structural
    corruption instead of raising (salvage mode)."""

    def _records() -> Iterator[WarcRecord]:
        if data[:2] == _GZIP_MAGIC:
            for member in _iter_gzip_members(data):
                yield from _iter_plain(io.BufferedReader(io.BytesIO(member)))
        else:
            yield from _iter_plain(io.BufferedReader(io.BytesIO(data)))

    if not data:
        return
    if not skip_bad:
        yield from _records()
        return
    gen = _records()
    while True:
        try:
            record = next(gen)
        except StopIteration:
            return
        except (ValueError, zlib.error, OSError, EOFError):
            return
        yield record


def split_http_response(payload: bytes) -> Tuple[Optional[int], bytes]:
    """Split an HTTP response payload into (status, body). A payload
    that does not start with ``HTTP/`` is returned whole with status
    None (some archives store bare resource bodies)."""
    if not payload.startswith(b"HTTP/"):
        return None, payload
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        # headers never terminated: treat everything as headers, empty body
        head, body = payload, b""
    else:
        head, body = payload[:sep], payload[sep + 4 :]
    status_line = head.split(_CRLF, 1)[0]
    parts = status_line.split(None, 2)
    status: Optional[int] = None
    if len(parts) >= 2:
        try:
            status = int(parts[1])
        except ValueError:
            status = None
    return status, body


def iter_pages(
    data: bytes, skip_bad: bool = False, ok_only: bool = True
) -> Iterator[Tuple[str, Optional[datetime], bytes]]:
    """Yield ``(url, warc_ts, html)`` for each crawl response record —
    the pages-table triple. Non-response records (warcinfo, request,
    metadata) are skipped; ``ok_only`` additionally drops non-2xx HTTP
    responses (bare resource records with no HTTP envelope are kept)."""
    for record in parse_warc(data, skip_bad=skip_bad):
        if record.rec_type != "response" or record.uri is None:
            continue
        status, body = split_http_response(record.payload)
        if ok_only and status is not None and not (200 <= status < 300):
            continue
        yield record.uri, record.date, body


def write_warc(
    pages: List[Tuple[str, datetime, bytes]],
    path: str,
    gzip_records: bool = True,
    status: int = 200,
) -> None:
    """Serialize ``(url, warc_ts, html)`` triples as a valid WARC file
    (response records wrapping an HTTP 200 envelope), per-record gzip by
    default — the Common Crawl layout. Deterministic: fixture writer for
    tests and benchmarks; also the inverse proof for the reader."""
    chunks: List[bytes] = []
    for i, (url, ts, html) in enumerate(pages):
        http = (
            f"HTTP/1.1 {status} OK\r\nContent-Type: text/html\r\n"
            f"Content-Length: {len(html)}\r\n\r\n"
        ).encode("ascii") + bytes(html)
        # naive timestamps are BY CONVENTION UTC (the parquet testdata
        # convention) — never route them through the host's local tz
        aware = ts if ts.tzinfo is not None else ts.replace(tzinfo=timezone.utc)
        date = aware.astimezone(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")
        record = (
            (
                "WARC/1.0\r\n"
                "WARC-Type: response\r\n"
                f"WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-{i:012d}>\r\n"
                f"WARC-Target-URI: {url}\r\n"
                f"WARC-Date: {date}\r\n"
                "Content-Type: application/http; msgtype=response\r\n"
                f"Content-Length: {len(http)}\r\n\r\n"
            ).encode("utf-8")
            + http
            + b"\r\n\r\n"
        )
        if gzip_records:
            # mtime pinned so the bytes are deterministic across runs
            out = io.BytesIO()
            with gzip.GzipFile(fileobj=out, mode="wb", mtime=0) as gz:
                gz.write(record)
            chunks.append(out.getvalue())
        else:
            chunks.append(record)
    with open(path, "wb") as fh:
        fh.write(b"".join(chunks))


def iter_text_records(
    data: bytes, skip_bad: bool = False
) -> Iterator[Tuple[str, Optional[datetime], str]]:
    """Yield ``(url, warc_ts, text)`` from WET *conversion* records —
    the Common Crawl extracted-text exchange format (a WARC whose
    records carry ``WARC-Type: conversion`` and a bare UTF-8 payload,
    no HTTP envelope)."""
    for record in parse_warc(data, skip_bad=skip_bad):
        if record.rec_type != "conversion" or record.uri is None:
            continue
        yield record.uri, record.date, record.payload.decode("utf-8", "replace")


def write_wet(
    pages: List[Tuple[str, datetime, str]],
    path: str,
    gzip_records: bool = True,
) -> None:
    """Serialize ``(url, warc_ts, text)`` triples as a WET file
    (conversion records, bare text/plain payload), per-record gzip by
    default. Deterministic; the inverse proof for
    :func:`iter_text_records`."""
    chunks: List[bytes] = []
    for i, (url, ts, text) in enumerate(pages):
        body = text.encode("utf-8")
        aware = ts if ts.tzinfo is not None else ts.replace(tzinfo=timezone.utc)
        date = aware.astimezone(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")
        record = (
            (
                "WARC/1.0\r\n"
                "WARC-Type: conversion\r\n"
                f"WARC-Record-ID: <urn:uuid:00000000-0000-0000-0001-{i:012d}>\r\n"
                f"WARC-Target-URI: {url}\r\n"
                f"WARC-Date: {date}\r\n"
                "Content-Type: text/plain\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode("utf-8")
            + body
            + b"\r\n\r\n"
        )
        if gzip_records:
            out = io.BytesIO()
            with gzip.GzipFile(fileobj=out, mode="wb", mtime=0) as gz:
                gz.write(record)
            chunks.append(out.getvalue())
        else:
            chunks.append(record)
    with open(path, "wb") as fh:
        fh.write(b"".join(chunks))


def iter_record_spans(
    data: bytes, skip_bad: bool = False
) -> Iterator[Tuple[int, int, WarcRecord]]:
    """Yield ``(offset, length, record)`` for each record of a
    per-record-gzip WARC file — ``offset``/``length`` delimit the
    record's own gzip member, so an HTTP range request for exactly
    those bytes decompresses to the record standalone. That is the
    CDX ``offset``/``length`` contract Common Crawl's index serves
    (reference has no crawl index; this extends the WARC tier the
    same way the WET writer does).

    Only the per-record-gzip layout carries the random-access
    property, so plain/whole-file-gzip inputs raise ``ValueError``
    (index generation over them would publish unseekable spans).
    A member holding several records (legal WARC, not the CC layout)
    yields each record with the member's span."""
    if not data:
        return
    if data[:2] != _GZIP_MAGIC:
        raise ValueError(
            "record spans need the per-record-gzip layout; "
            "plain WARC bytes have no seekable member boundaries"
        )
    pos = 0
    while pos < len(data):
        try:
            if data[pos : pos + 2] != _GZIP_MAGIC:
                raise ValueError(f"expected gzip member at offset {pos}")
            decomp = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
            member = decomp.decompress(data[pos:])
            if not decomp.eof:
                raise ValueError(f"truncated gzip member at offset {pos}")
            consumed = len(data) - pos - len(decomp.unused_data)
            records = list(
                _iter_plain(io.BufferedReader(io.BytesIO(member)))
            )
        except (ValueError, zlib.error, OSError, EOFError):
            if skip_bad:
                return
            raise
        for record in records:
            yield pos, consumed, record
        pos += consumed


#: SURT (Sort-friendly URI Reordering Transform) — the documented
#: subset shared byte-for-byte by this kernel, the Spark column twin
#: (ops/webindex.py surt_key_col) and the DuckDB oracle: fragment
#: stripped; everything lowercased; default ports dropped, others kept
#: as ``:port`` after the reversed host; a leading ``www\d*.`` host
#: label stripped; host labels reversed and comma-joined; query params
#: split on ``&`` and sorted bytewise; empty path becomes ``/``.
#: Unparseable inputs (no ``scheme://``) pass through lowercased —
#: a key transform must never destroy a key.
_SURT_SCHEME_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.\-]*)://")
_SURT_HOSTPORT_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)")
_SURT_REST_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*(.*)", re.S)


def surt_key(url: str) -> str:
    """Python twin of the Spark/DuckDB SURT urlkey (see constant doc
    above); pinned value-identical by tests/test_webindex.py."""
    u = url.strip()
    nofrag = u.split("#", 1)[0]
    m = _SURT_SCHEME_RE.match(nofrag)
    if not m:
        return u.lower()
    scheme = m.group(1).lower()
    hostport = _SURT_HOSTPORT_RE.match(nofrag).group(1).lower()
    host, port = hostport, ""
    pm = re.search(r":(\d+)$", hostport)
    if pm:
        host, port = hostport[: pm.start()], pm.group(1)
    if (scheme == "http" and port == "80") or (scheme == "https" and port == "443"):
        port = ""
    host = re.sub(r"^www\d*\.", "", host)
    rev = ",".join(reversed(host.split(".")))
    rest = (_SURT_REST_RE.match(nofrag).group(1) or "").lower()
    path, _, query = rest.partition("?")
    if path == "":
        path = "/"
    qsorted = "&".join(sorted(p for p in query.split("&") if p != ""))
    return (
        rev
        + (f":{port}" if port else "")
        + ")"
        + path
        + (f"?{qsorted}" if qsorted else "")
    )


def wat_payload(
    url: str,
    ts: Optional[datetime],
    title: str,
    meta_description: str,
    canonical_url: str,
    links: List[Tuple[str, str]],
) -> bytes:
    """The WAT *metadata-record* JSON envelope for one page — the
    Common Crawl WAT layout's useful subset: WARC header echo +
    HTML-Metadata (Head title/meta/canonical link + outgoing Links).
    ``json.dumps`` with sorted keys and fixed separators, so the bytes
    are deterministic and parse ∘ serialize round-trips exactly."""
    head: dict = {}
    if title:
        head["Title"] = title
    if meta_description:
        head["Metas"] = [{"name": "description", "content": meta_description}]
    if canonical_url:
        head["Link"] = [{"rel": "canonical", "url": canonical_url}]
    env = {
        "Envelope": {
            "WARC-Header-Metadata": {
                "WARC-Target-URI": url,
                "WARC-Type": "response",
                **({"WARC-Date": _wat_date(ts)} if ts is not None else {}),
            },
            "Payload-Metadata": {
                "HTTP-Response-Metadata": {
                    "HTML-Metadata": {
                        "Head": head,
                        "Links": [
                            {"path": "A@/href", "url": href, "text": anchor}
                            for href, anchor in links
                        ],
                    }
                }
            },
        }
    }
    return json.dumps(env, sort_keys=True, separators=(",", ":")).encode("utf-8")


def _wat_date(ts: datetime) -> str:
    aware = ts if ts.tzinfo is not None else ts.replace(tzinfo=timezone.utc)
    return aware.astimezone(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")


def write_wat(
    entries: List[Tuple[str, datetime, bytes]],
    path: str,
    gzip_records: bool = True,
) -> None:
    """Serialize ``(url, warc_ts, wat_json_payload)`` as a WAT file:
    WARC *metadata* records with an ``application/json`` payload,
    per-record gzip by default — the third leg of the crawl ecosystem's
    WARC/WET/WAT triple, and the inverse proof for
    :func:`iter_metadata_records`."""
    chunks: List[bytes] = []
    for i, (url, ts, body) in enumerate(entries):
        record = (
            (
                "WARC/1.0\r\n"
                "WARC-Type: metadata\r\n"
                f"WARC-Record-ID: <urn:uuid:00000000-0000-0000-0002-{i:012d}>\r\n"
                f"WARC-Target-URI: {url}\r\n"
                f"WARC-Date: {_wat_date(ts)}\r\n"
                "Content-Type: application/json\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode("utf-8")
            + body
            + b"\r\n\r\n"
        )
        if gzip_records:
            out = io.BytesIO()
            with gzip.GzipFile(fileobj=out, mode="wb", mtime=0) as gz:
                gz.write(record)
            chunks.append(out.getvalue())
        else:
            chunks.append(record)
    with open(path, "wb") as fh:
        fh.write(b"".join(chunks))


def iter_metadata_records(
    data: bytes, skip_bad: bool = False
) -> Iterator[Tuple[str, Optional[datetime], str]]:
    """Yield ``(url, warc_ts, json_str)`` from WAT *metadata* records —
    the parse direction of :func:`write_wat`, same strictness policy as
    every reader here."""
    for record in parse_warc(data, skip_bad=skip_bad):
        if record.rec_type != "metadata" or record.uri is None:
            continue
        yield record.uri, record.date, record.payload.decode("utf-8", "replace")
