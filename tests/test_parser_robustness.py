"""Property tests: the byte-level source parsers must degrade to
PDFExtractError / empty results on arbitrary malformed input — a damaged
file in a 10^12-document crawl must never kill an executor with an
unexpected exception type."""

from hypothesis import given, settings
from hypothesis import strategies as st

from correctocr_spark.kernels.hocr import extract_hocr_words
from correctocr_spark.kernels.pdf import PDFExtractError, extract_pdf_words


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=2048))
def test_pdf_extractor_total(data):
    try:
        words = extract_pdf_words(data)
    except PDFExtractError:
        return
    assert isinstance(words, list)


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=2048))
def test_pdf_extractor_total_with_header(data):
    """Force past the header check so the object/stream parser is hit."""
    payload = b"%PDF-1.4\n" + data + b"\n1 0 obj\n<</Type/Page/Contents 2 0 R>>\nendobj\n"
    try:
        words = extract_pdf_words(payload)
    except PDFExtractError:
        return
    assert isinstance(words, list)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=2048))
def test_pdf_extractor_fuzzed_content_stream(data):
    """Arbitrary bytes inside a well-formed page's content stream."""
    doc = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<</Type/Page/Contents 2 0 R>>\nendobj\n"
        b"2 0 obj\n<</Length 0>> stream\nBT " + data.replace(b"endstream", b"") +
        b" ET\nendstream endobj\n"
    )
    try:
        words = extract_pdf_words(doc)
    except PDFExtractError:
        return
    for w in words:
        assert isinstance(w[5], str) and w[5].strip() == w[5] and w[5] != ""


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=2048))
def test_hocr_extractor_total(data):
    words = extract_hocr_words(data)
    assert all(w[5].strip() == w[5] and w[5] != "" for w in words)


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=1024))
def test_corpus_zip_walk_total(data):
    from correctocr_spark.spark.corpus import _walk_zip

    assert isinstance(_walk_zip("x.zip", data, set()), list)
