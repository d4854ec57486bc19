"""HTML main-content extraction (boilerplate strip).

Not present in the reference (which ingests .txt/.pdf/.hocr); required by
the target pipeline: Common-Crawl-style pages carry ``html binary`` and
the extraction stage must yield the candidate text that the CorrectOCR
stages then correct.

Design: a single-pass, dependency-free DOM-ish scan (stdlib
``html.parser``) with classic text-density heuristics:

1. prune boilerplate subtrees: script/style/noscript/template/head/nav/
   header/footer/aside/form/iframe/svg/button/select/option;
2. segment text into blocks at block-level tags (p, div, li, td, h1-6,
   article, section, main, blockquote, pre, br, tr);
3. score each block by link density (chars inside <a> / total chars) and
   length; keep blocks with link_density < 0.5 — navigation chrome is
   link-dominated, body prose is not;
4. join kept blocks with ``'\\n'`` and whitespace-normalize within blocks
   (runs of whitespace -> single space).

Deterministic, pure-Python, Arrow-batch friendly: the Spark stage maps
this over ``pd.Series`` of bytes inside ``mapInPandas``.
"""

from __future__ import annotations

from html import unescape
from html.parser import HTMLParser
from typing import List, Optional, Union

_PRUNE_TAGS = frozenset(
    "script style noscript template head nav header footer aside form "
    "iframe svg button select option".split()
)

_BLOCK_TAGS = frozenset(
    "p div li td th h1 h2 h3 h4 h5 h6 article section main blockquote "
    "pre br tr ul ol table body".split()
)

#: void elements never get close tags; don't let them sit on the stack
_VOID_TAGS = frozenset("br img hr input meta link area base col embed source track wbr".split())


class _Block:
    __slots__ = ("chars", "link_chars")

    def __init__(self) -> None:
        self.chars: List[str] = []
        self.link_chars = 0


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._prune_depth = 0
        self._link_depth = 0
        self._blocks: List[_Block] = [_Block()]

    def _break_block(self) -> None:
        if self._blocks[-1].chars:
            self._blocks.append(_Block())

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _PRUNE_TAGS and tag not in _VOID_TAGS:
            self._prune_depth += 1
            return
        if self._prune_depth:
            return
        if tag == "a":
            self._link_depth += 1
        if tag in _BLOCK_TAGS:
            self._break_block()

    def handle_endtag(self, tag: str) -> None:
        if tag in _PRUNE_TAGS and tag not in _VOID_TAGS:
            self._prune_depth = max(0, self._prune_depth - 1)
            return
        if self._prune_depth:
            return
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
        if tag in _BLOCK_TAGS:
            self._break_block()

    def handle_data(self, data: str) -> None:
        if self._prune_depth or not data:
            return
        block = self._blocks[-1]
        block.chars.append(data)
        if self._link_depth:
            block.link_chars += len(data)

    def text(self, min_block_chars: int, max_link_density: float) -> str:
        kept: List[str] = []
        for block in self._blocks:
            raw = "".join(block.chars)
            norm = " ".join(raw.split())
            if not norm:
                continue
            density = block.link_chars / max(1, len(raw.strip()))
            if density >= max_link_density:
                continue
            if len(norm) < min_block_chars and density > 0.0:
                continue
            kept.append(norm)
        return "\n".join(kept)


def detect_encoding(data: bytes, sample: int = 500 * 1024) -> str:
    """S8 (fileio.py:56-66): UnicodeDammit-style sniff of the first
    500 KB — utf-8 if it decodes cleanly, else windows-1252 (the same
    two-candidate policy as the reference)."""
    head = bytes(data[:sample])
    try:
        head.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        return "windows-1252"


def extract_text(
    html: Union[bytes, str, None],
    encoding: Optional[str] = None,
    min_block_chars: int = 8,
    max_link_density: float = 0.5,
) -> str:
    """Strip boilerplate from an HTML page and return main-content text.

    Bytes are decoded via :func:`detect_encoding` unless an encoding is
    given (mirrors the reference's sniffing policy, fileio.py:56-66).
    """
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray, memoryview)):
        data = bytes(html)
        html = data.decode(encoding or detect_encoding(data), errors="replace")
    if not html:
        return ""
    parser = _Extractor()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        # malformed markup: fall back to the text collected so far
        pass
    return parser.text(min_block_chars, max_link_density)
