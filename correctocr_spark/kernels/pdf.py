"""Minimal PDF word extraction (pure stdlib) + the PDF token model.

Reference: tokens/_pdf.py:111-125 — ``PDFTokenizer.tokenize`` walks
``page.get_text_words()`` (PyMuPDF) and builds ``PDFToken`` whose
``token_info`` is ``(page, x0, y0, x1, y1, word, block_no, line_no,
word_no)``; the reference's own test (cocrtests/pdf.py:8-15) asserts the
extracted token stream of ``test.pdf`` is ``'Once upen a ti- me.'``.

PyMuPDF is not available in this environment, so the default extractor
here is a genuinely working *minimal* parser for simple text-positioning
PDFs (the kind the reference tests with): it walks page content streams
(raw or FlateDecode), tracks ``Tm`` text matrices and ``Tf`` font sizes,
and decodes ``TJ``/``Tj`` hex ``<...>`` and literal ``(...)`` strings.
Word boxes are approximated from the font size (x1 = x0 + 0.5·size·len —
PyMuPDF reads real glyph metrics; parity is on words/order/line
structure, not on exact box widths). Anything beyond its scope (xref
streams, CMaps, rotated matrices) raises ``PDFExtractError`` so callers
can plug a real extractor (the seam :func:`~correctocr_spark.spark.pdf.
pdf_tokens` exposes).

Verified against the reference's shipped ``cocrtests/test.pdf``:
``tests/test_pdf_source.py`` pins the exact reference expectation.
"""

from __future__ import annotations

import re
import zlib
from typing import Callable, List, Optional, Tuple

#: (page, x0, y0, x1, y1, word, block_no, line_no, word_no) — the exact
#: reference token_info shape (_pdf.py:20-46).
PDFWord = Tuple[int, float, float, float, float, str, int, int, int]

_OBJ_RE = re.compile(rb"(\d+)\s+0\s+obj(.*?)endobj", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\s*endstream", re.S)
_PAGE_RE = re.compile(rb"/Type\s*/Page(?![s])")
_CONTENTS_RE = re.compile(rb"/Contents\s*(?:\[([^\]]*)\]|(\d+)\s+0\s+R)")
_REF_RE = re.compile(rb"(\d+)\s+0\s+R")
#: text-showing ops we understand: Tm (set matrix), Tf (font+size),
#: Td/TD (relative move), TJ/Tj with <hex> or (literal) strings
_TOKEN_OP_RE = re.compile(
    rb"(?:(?P<tm>[\d.+-]+\s+[\d.+-]+\s+[\d.+-]+\s+[\d.+-]+\s+[\d.+-]+\s+[\d.+-]+)\s+Tm)"
    rb"|(?:/\S+\s+(?P<tf>[\d.+-]+)\s+Tf)"
    rb"|(?:(?P<td>[\d.+-]+\s+[\d.+-]+)\s+T[dD])"
    rb"|(?:\[(?P<tj_arr>[^\]]*)\]\s*TJ)"
    rb"|(?:<(?P<tj_hex>[0-9a-fA-F\s]*)>\s*Tj)"
    rb"|(?:\((?P<tj_lit>(?:\\.|[^)\\])*)\)\s*Tj)"
)
_ARR_STR_RE = re.compile(rb"<([0-9a-fA-F\s]*)>|\(((?:\\.|[^)\\])*)\)")


class PDFExtractError(NotImplementedError):
    """This minimal parser cannot handle the document — plug a real
    extractor (PyMuPDF ``page.get_text_words``) into ``pdf_tokens``."""


def _floats(raw: bytes) -> Optional[List[float]]:
    """Operand floats, or None when any token is malformed (a damaged
    content stream must degrade to skipped ops, not a ValueError)."""
    out = []
    for v in raw.split():
        try:
            out.append(float(v))
        except ValueError:
            return None
    return out


def _hex_str(raw: bytes) -> Optional[str]:
    h = re.sub(rb"\s", b"", raw)
    if len(h) % 2:  # PDF pads odd hex strings with a trailing 0
        h += b"0"
    try:
        return bytes.fromhex(h.decode()).decode("latin-1")
    except ValueError:
        return None


def _decode_literal(raw: bytes) -> str:
    out = []
    i = 0
    while i < len(raw):
        c = raw[i : i + 1]
        if c == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1 : i + 2]
            mapped = {b"n": "\n", b"r": "\r", b"t": "\t", b"(": "(", b")": ")", b"\\": "\\"}
            out.append(mapped.get(nxt, nxt.decode("latin-1")))
            i += 2
        else:
            out.append(c.decode("latin-1"))
            i += 1
    return "".join(out)


def _page_contents(data: bytes) -> List[bytes]:
    """Resolve each /Type /Page object's /Contents refs (single or
    array) to its concatenated, decoded content stream."""
    objs: dict = {}
    pages: List[bytes] = []
    for m in _OBJ_RE.finditer(data):
        objs[int(m.group(1))] = m.group(2)
    page_dicts = [body for body in objs.values() if _PAGE_RE.search(body)]
    for body in page_dicts:
        cm = _CONTENTS_RE.search(body)
        if cm is None:
            pages.append(b"")
            continue
        refs = (
            [int(r) for r in _REF_RE.findall(cm.group(1))]
            if cm.group(1) is not None
            else [int(cm.group(2))]
        )
        parts = []
        for ref in refs:
            obj = objs.get(ref, b"")
            sm = _STREAM_RE.search(obj)
            if sm is None:
                continue
            s = sm.group(1)
            try:
                parts.append(zlib.decompress(s))
            except Exception:
                parts.append(s)
        pages.append(b"\n".join(parts))
    return pages


def extract_pdf_words(data: bytes) -> List[PDFWord]:
    """``page.get_text_words()``-shaped extraction for simple PDFs.

    Line grouping mirrors PyMuPDF's: a new line starts when the baseline
    y drops by more than half the font size; words on a line are emitted
    in x order. Returns reference-shaped ``token_info`` tuples.
    """
    if not data.startswith(b"%PDF"):
        raise PDFExtractError("not a PDF header")
    page_streams = _page_contents(data)
    if not page_streams:
        raise PDFExtractError("no /Type /Page objects found (xref streams unsupported)")

    # per page: words as (y, x, size, text)
    raw_words: List[List[Tuple[float, float, float, str]]] = []
    any_text = False
    for stream in page_streams:
        cur: List[Tuple[float, float, float, str]] = []
        x = y = 0.0
        size = 12.0
        for m in _TOKEN_OP_RE.finditer(stream):
            if m.group("tm") is not None:
                ops = _floats(m.group("tm"))
                if ops is not None and len(ops) == 6:
                    x, y = ops[4], ops[5]
            elif m.group("tf") is not None:
                ops = _floats(m.group("tf"))
                if ops:
                    size = ops[0]
            elif m.group("td") is not None:
                ops = _floats(m.group("td"))
                if ops is not None and len(ops) == 2:
                    x, y = x + ops[0], y + ops[1]
            else:
                if m.group("tj_arr") is not None:
                    parts = []
                    for sm in _ARR_STR_RE.finditer(m.group("tj_arr")):
                        if sm.group(1) is not None:
                            h = _hex_str(sm.group(1))
                            if h is not None:
                                parts.append(h)
                        else:
                            parts.append(_decode_literal(sm.group(2)))
                    text = "".join(parts)
                elif m.group("tj_hex") is not None:
                    text = _hex_str(m.group("tj_hex")) or ""
                else:
                    text = _decode_literal(m.group("tj_lit"))
                if text.strip():
                    cur.append((y, x, size, text.strip()))
                    any_text = True
        raw_words.append(cur)
    if not any_text:
        raise PDFExtractError("no text-showing operators recognized")

    out: List[PDFWord] = []
    for page_no, words in enumerate(raw_words):
        # group into lines: sort by -y, split on baseline drop > size/2
        words = sorted(words, key=lambda w: (-w[0], w[1]))
        lines: List[List[Tuple[float, float, float, str]]] = []
        for w in words:
            if lines and abs(lines[-1][0][0] - w[0]) <= w[2] / 2:
                lines[-1].append(w)
            else:
                lines.append([w])
        for line_no, line in enumerate(lines):
            for word_no, (wy, wx, wsize, wtext) in enumerate(sorted(line, key=lambda w: w[1])):
                x1 = wx + 0.5 * wsize * len(wtext)  # approx box (see module doc)
                out.append((page_no, wx, wy, x1, wy + wsize, wtext, 0, line_no, word_no))
    return out


def pdf_text(words: List[PDFWord]) -> str:
    """The reference's ``str(tokens)`` over a PDF token stream — space-
    joined originals in (page, line, word) order (cocrtests/pdf.py:15)."""
    return " ".join(
        w[5] for w in sorted(words, key=lambda w: (w[0], w[7], w[8]))
    )


def fitz_extractor() -> Callable[[bytes], List[PDFWord]]:
    """The real-extractor seam: PyMuPDF ``get_text_words`` when present."""
    try:
        import fitz  # type: ignore
    except ImportError as exc:  # pragma: no cover - lib absent here
        raise PDFExtractError(
            "PyMuPDF (fitz) is not installed; use the minimal extractor "
            "or provide a custom one"
        ) from exc

    def run(data: bytes) -> List[PDFWord]:  # pragma: no cover - lib absent
        doc = fitz.open(stream=data, filetype="pdf")
        out: List[PDFWord] = []
        for page in doc:
            for w in page.get_text_words():
                out.append((page.number,) + tuple(w))
        return out

    return run


def calculate_crop_area(
    rects: List[Tuple[float, float]],
    width: float,
    tolerance: float = 0.1,
    edge_percentage: int = 20,
) -> Tuple[float, float]:
    """Reference ``PDFTokenizer.calculate_crop_area`` (_pdf.py:208-242)
    minus the plotille display: histogram of per-token x coverage (every
    integer x in [x0, x1)), 100 bins; the crop edges are the LAST bin
    edge among the first/last ``edge_percentage`` whose count falls
    under ``max(counts) * tolerance`` — including the reference's
    off-by-one pairing of ``counts[-20:]`` with ``bin_edges[-20:]``
    (bin_edges has 101 entries, so the right scan pairs count i with the
    *upper* edge of bin i). Kept bit-exact for parity.
    """
    import numpy

    x_values = []
    for x0, x1 in rects:
        for i in range(int(x0), int(x1)):
            x_values.append(i)
    if len(x_values) == 0:
        return 0, width
    counts, bin_edges = numpy.histogram(x_values, bins=100)
    cutoff = max(counts) * tolerance
    edge_left, edge_right = 0, width + 1
    for c, e in zip(counts[:edge_percentage], bin_edges[:edge_percentage]):
        if c < cutoff:
            edge_left = e
    for c, e in zip(counts[-edge_percentage:], bin_edges[-edge_percentage:]):
        if c < cutoff:
            edge_right = e
    return edge_left, edge_right
