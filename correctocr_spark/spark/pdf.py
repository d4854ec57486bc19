"""PDF source/sink plumbing (S2, S12, P8/P9, A8, O2).

The reference's primary real-world input is PDF (tokens/_pdf.py:111-125);
here it becomes: ``spark.read.format("binaryFile")`` over the PDF files
-> ONE ``mapInPandas`` running a word extractor per document ->
the reference-shaped PDF token table ``(url, idx, page, x0, y0, x1, y1,
original, block, line, word)``. The extractor is a seam: the default is
:mod:`..kernels.pdf`'s working stdlib parser for simple text-positioning
PDFs (pinned against the reference's own cocrtests/test.pdf), and
``fitz_extractor()`` drops in PyMuPDF unchanged where it is installed.

Downstream, PDF tokens join the normal correction pipeline via
:func:`pdf_page_texts` (page -> whitespace-joined text, the reference's
``str(tokens)``), and the PDF-only operators become column algebra:

- **P8/P9 crop filter** (_pdf.py:196-207 ``crop_tokens_to_edges``):
  a ``discarded`` flag from the token's rect vs the page's crop edges.
- **A8 crop histogram** (_pdf.py:208-242 ``calculate_crop_area``):
  per-page edge detection. The reference materializes every integer x
  covered by a token and runs ``numpy.histogram`` — per *page* that is
  tiny, so the faithful implementation is a grouped ``applyInPandas``
  per (url, page) running the exact kernel (including the reference's
  counts[-20:]/bin_edges[-20:] off-by-one); the grouping key distributes
  perfectly at corpus scale.
- **O2 PDF sink sort** (_pdf.py:146): corrected tokens ordered by
  (page, block, line, word) with the insertion-plan columns (fontsize,
  padded rect). The physical PDF write (fitz ``insert_textbox``) is a
  per-doc sink stub behind the same seam — the *plan* (what to draw
  where) is fully computed Spark-side.
"""

from __future__ import annotations

from typing import Callable, Iterator, List, Optional, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernels.pdf import (
    PDFExtractError,
    PDFWord,
    calculate_crop_area,
    extract_pdf_words,
    pdf_text,
)

PDF_TOKEN_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("idx", T.IntegerType(), True),
        T.StructField("page", T.IntegerType(), True),
        T.StructField("x0", T.DoubleType(), True),
        T.StructField("y0", T.DoubleType(), True),
        T.StructField("x1", T.DoubleType(), True),
        T.StructField("y1", T.DoubleType(), True),
        T.StructField("original", T.StringType(), True),
        T.StructField("block", T.IntegerType(), True),
        T.StructField("line", T.IntegerType(), True),
        T.StructField("word", T.IntegerType(), True),
    ]
)


def read_pdf_files(spark: SparkSession, path: str) -> DataFrame:
    """S2 scan: binaryFile source — (path, content) per PDF. Predicate
    pushdown applies to the file metadata columns (pathGlobFilter keeps
    non-PDFs out of the scan entirely)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pdf")
        .load(path)
        .select(F.col("path").alias("url"), F.col("content"))
    )


def pdf_tokens(
    pdfs: DataFrame,
    extractor: Optional[Callable[[bytes], List[PDFWord]]] = None,
) -> DataFrame:
    """(url, content) -> reference-shaped PDF token table.

    One Python UDF per stage (module pattern); docs the extractor cannot
    parse keep one all-null placeholder row (same contract as
    ``tokens_raw`` — they stay visible to audit/resume)."""
    ex = extractor or extract_pdf_words
    fields = [f.name for f in PDF_TOKEN_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, content in zip(pdf["url"], pdf["content"]):
                try:
                    words = ex(bytes(content))
                except PDFExtractError:
                    words = []
                if not words:
                    rows.append({"url": url, **{f: None for f in fields[1:]}})
                    continue
                for idx, w in enumerate(
                    sorted(words, key=lambda w: (w[0], w[7], w[8]))
                ):
                    rows.append(
                        {
                            "url": url,
                            "idx": idx,
                            "page": w[0],
                            "x0": float(w[1]),
                            "y0": float(w[2]),
                            "x1": float(w[3]),
                            "y1": float(w[4]),
                            "original": w[5],
                            "block": int(w[6]),
                            "line": int(w[7]),
                            "word": int(w[8]),
                        }
                    )
            yield pd.DataFrame(rows, columns=fields)

    return pdfs.mapInPandas(run, schema=PDF_TOKEN_SCHEMA)


def read_hocr_files(spark: SparkSession, path: str, glob: str = "*.hocr") -> DataFrame:
    """S3 scan: binaryFile source over hOCR output files."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select(F.col("path").alias("url"), F.col("content"))
    )


def hocr_tokens(hocrs: DataFrame) -> DataFrame:
    """S3: hOCR documents -> the same token table as :func:`pdf_tokens`
    (shared schema/downstream; the image->hOCR OCR step itself is the
    external seam — see kernels/hocr.py module doc)."""
    from ..kernels.hocr import extract_hocr_words

    return pdf_tokens(hocrs, extractor=extract_hocr_words)


def pdf_page_texts(tokens: DataFrame) -> DataFrame:
    """PDF tokens -> (url, text) pages for the correction pipeline — the
    reference's ``str(tokens)`` (space-joined originals in stream order),
    built JVM-side: sort_array(collect_list(struct(idx, original)))."""
    return (
        tokens.where(F.col("idx").isNotNull())
        .groupBy("url")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("idx", "original"))),
                    lambda s: s["original"],
                ),
                " ",
            ).alias("text")
        )
    )


def crop_tokens_to_edges(
    tokens: DataFrame, edge_left: float, edge_right: float
) -> DataFrame:
    """P8/P9 (_pdf.py:196-207): discard tokens outside the crop edges —
    kept iff ``x1 >= edge_left AND x0 <= edge_right``. Pure column
    algebra; whole-stage codegen, no shuffle."""
    keep = (F.col("x1") >= edge_left) & (F.col("x0") <= edge_right)
    return tokens.withColumn(
        "discarded", F.when(F.col("idx").isNull(), F.lit(None)).otherwise(~keep)
    )


CROP_EDGE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("page", T.IntegerType(), False),
        T.StructField("edge_left", T.DoubleType(), False),
        T.StructField("edge_right", T.DoubleType(), False),
    ]
)


def page_crop_edges(
    tokens: DataFrame,
    page_width: float,
    tolerance: float = 0.1,
    edge_percentage: int = 20,
) -> DataFrame:
    """A8 (_pdf.py:208-242): per-(url, page) crop-edge detection running
    the exact kernel histogram per group (grouped applyInPandas — a page
    has O(100) tokens, the group key is the natural partitioner)."""

    def per_page(pdf: pd.DataFrame) -> pd.DataFrame:
        rects: List[Tuple[float, float]] = list(zip(pdf["x0"], pdf["x1"]))
        left, right = calculate_crop_area(
            rects, page_width, tolerance=tolerance, edge_percentage=edge_percentage
        )
        return pd.DataFrame(
            {
                "url": [pdf["url"].iloc[0]],
                "page": [pdf["page"].iloc[0]],
                "edge_left": [float(left)],
                "edge_right": [float(right)],
            }
        )

    return (
        tokens.where(F.col("idx").isNotNull())
        .select("url", "page", "x0", "x1")
        .groupBy("url", "page")
        .applyInPandas(per_page, schema=CROP_EDGE_SCHEMA)
    )


def crop_tokens(
    tokens: DataFrame,
    page_width: float,
    edge_left: Optional[float] = None,
    edge_right: Optional[float] = None,
    tolerance: float = 0.1,
) -> DataFrame:
    """The reference's full ``crop_tokens`` (_pdf.py:178-194): explicit
    edges if given, else per-page detected edges joined back onto the
    token table (left join: pages whose edges were undetectable keep
    everything)."""
    if edge_left is not None and edge_right is not None:
        return crop_tokens_to_edges(tokens, edge_left, edge_right)
    edges = page_crop_edges(tokens, page_width, tolerance=tolerance)
    left = F.coalesce(F.col("edge_left"), F.lit(0.0)) if edge_left is None else F.lit(edge_left)
    right = (
        F.coalesce(F.col("edge_right"), F.lit(page_width))
        if edge_right is None
        else F.lit(edge_right)
    )
    keep = (F.col("x1") >= left) & (F.col("x0") <= right)
    return (
        tokens.join(edges, on=["url", "page"], how="left")
        .withColumn(
            "discarded", F.when(F.col("idx").isNull(), F.lit(None)).otherwise(~keep)
        )
        .drop("edge_left", "edge_right")
    )


def pdf_sink_plan(
    tokens: DataFrame,
    fontfactor: float = 1.0,
    padding: float = 0.0,
    char_width: float = 0.5,
) -> DataFrame:
    """S12/O2 (_pdf.py:127-175 ``PDFTokenizer.apply``): the corrected-PDF
    insertion plan — non-discarded tokens in (page, block, line, word)
    order with the word to draw, fontsize (rect height · fontfactor) and
    the padded rect. ``textwidth`` uses a char-count · fontsize · width
    model where fitz's glyph metrics aren't available (the physical
    ``insert_textbox`` call is the per-doc sink seam; everything it needs
    is computed here, distributed)."""
    height = F.col("y1") - F.col("y0")
    fontsize = (height * F.lit(fontfactor)).alias("fontsize")
    word_col = F.coalesce(F.col("gold"), F.col("original")) if "gold" in tokens.columns else F.col("original")
    textwidth = F.length(word_col) * height * F.lit(fontfactor) * F.lit(char_width)
    out = tokens.where(F.col("idx").isNotNull())
    if "discarded" in tokens.columns:
        out = out.where(~F.coalesce(F.col("discarded"), F.lit(False)))
    return (
        out.select(
            "url",
            "page",
            "block",
            "line",
            "word",
            word_col.alias("draw_word"),
            fontsize,
            F.col("x0").alias("rect_x0"),
            F.col("y0").alias("rect_y0"),
            F.greatest(
                F.col("x1"), F.col("x0") + textwidth + F.lit(padding)
            ).alias("rect_x1"),
            (F.col("y1") + height).alias("rect_y1"),
        )
        # per-doc sink contract: each url's rows co-located and in the
        # reference's insertion order (one shuffle, sort map-side local)
        .repartition("url")
        .sortWithinPartitions("url", "page", "block", "line", "word")
    )
