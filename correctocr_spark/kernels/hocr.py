"""hOCR parsing (S3 front-end, T7 bbox parse).

Reference: tokens/_hocr.py — ``HOCRToken`` wraps an lxml element whose
text is the word and whose ``title`` attribute carries the bbox
(``bbox = re.compile(r'bbox (\\d+) (\\d+) (\\d+) (\\d+)')``,
_hocr.py:54; e.g. ``title='bbox 77 204 93 234; x_wconf 95'``). The
reference's image path (_hocr.py:188-220) runs tesseract + OpenCV
column splitting to *produce* the hOCR — unmaintained upstream ("will
need a lot of work", _hocr.py:19) and those libs are absent here, so
OCR itself is the pluggable seam; parsing existing hOCR output (the
interchange format every OCR engine emits) is implemented with stdlib
``html.parser``.

Structure mapping: ``ocr_page`` -> page ordinal, ``ocr_carea`` ->
block, ``ocr_line``/``ocr_textfloat``/``ocr_caption`` -> line,
``ocrx_word`` -> word; word text is the element's stripped text
(_hocr.py:75 ``self._element.text.strip()``). Output tuples use the
same (page, x0, y0, x1, y1, word, block, line, word_no) shape as
:mod:`.pdf`, so hOCR tokens flow into the identical downstream table.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import List, Optional, Tuple

from .pdf import PDFWord

#: _hocr.py:54, verbatim semantics: search (not match) over the title.
BBOX_RE = re.compile(r"bbox (\d+) (\d+) (\d+) (\d+)")

_LINE_CLASSES = {"ocr_line", "ocr_textfloat", "ocr_caption", "ocr_header"}


def parse_bbox(title: Optional[str]) -> Tuple[float, float, float, float]:
    """T7: ``title`` attribute -> (x0, y0, x1, y1); the reference falls
    back to a zero rect when absent (_hocr.py:77-83)."""
    m = BBOX_RE.search(title or "")
    if m:
        return tuple(float(v) for v in m.group(1, 2, 3, 4))  # type: ignore[return-value]
    return (0.0, 0.0, 0.0, 0.0)


class _HOCRParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.words: List[PDFWord] = []
        self.page = -1
        self.block = -1
        self.line = -1
        self.word_no = 0
        self._in_word: Optional[Tuple[float, float, float, float]] = None
        self._buf: List[str] = []

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        cls = set((a.get("class") or "").split())
        if "ocr_page" in cls:
            self.page += 1
            self.block = -1
        elif "ocr_carea" in cls:
            self.block += 1
            self.line = -1
        elif cls & _LINE_CLASSES:
            self.line += 1
            self.word_no = 0
        elif "ocrx_word" in cls:
            self._in_word = parse_bbox(a.get("title"))
            self._buf = []

    def handle_data(self, data):
        if self._in_word is not None:
            self._buf.append(data)

    def handle_endtag(self, tag):
        if self._in_word is not None and tag == "span":
            text = "".join(self._buf).strip()  # _hocr.py:75
            if text:
                x0, y0, x1, y1 = self._in_word
                self.words.append(
                    (
                        max(self.page, 0),
                        x0,
                        y0,
                        x1,
                        y1,
                        text,
                        max(self.block, 0),
                        max(self.line, 0),
                        self.word_no,
                    )
                )
                self.word_no += 1
            self._in_word = None


def extract_hocr_words(data: bytes) -> List[PDFWord]:
    """hOCR bytes -> reference-shaped word tuples (see module doc)."""
    p = _HOCRParser()
    p.feed(data.decode("utf-8", errors="replace"))
    return p.words
