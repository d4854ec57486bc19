"""Dictionary corpus ingestion (commands.py:31-169 ``build_dictionary``).

The reference walks a corpus directory on the driver: downloads listed
urls, recursively unzips archives, then per file extracts words (.txt
read + tokenize, .xml via TEI reader, .pdf via fitz) into dictionary
*groups* (= top-level corpus entries), skipping groups already ingested.

Spark-first shape: the corpus directory becomes a ``binaryFile`` scan;
zip expansion and per-format text extraction run distributed as ONE
``mapInPandas`` (zips expand recursively in-memory via stdlib
``zipfile`` — no driver staging area); word extraction + cleaning is the
same native column algebra as ``build_dictionary_df``; the incremental
group skip (existing_groups) becomes a scan-level filter (a pushed
``NOT group IN (...)`` — pruned before any bytes are parsed) and the
per-group ingest stays idempotent. Downloads (S16) precede the engine,
as with page ingestion.

Divergences, documented:
- tokenization is the Penn Treebank rule set (T2,
  kernels/treebank.py — the reference's nltk ``tokenize_str``) compiled
  to a NATIVE regexp_replace cascade + ``Dictionary.clean``; Punkt
  sentence-splitting is approximated (see the treebank module doc),
- TEI text extraction uses stdlib ElementTree ``itertext`` joined with
  spaces — the reference's tei_reader inserts a space after every
  element text for the same reason (its issue #6 workaround); both feed
  a whitespace tokenizer, so the word stream agrees,
- PDF words come from the :mod:`..kernels.pdf` extractor seam.
"""

from __future__ import annotations

import io
import zipfile
from typing import Iterator, List, Optional, Sequence, Set, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernels.extract import detect_encoding
from ..kernels.pdf import PDFExtractError, extract_pdf_words

#: extraneous corpus files the reference hardcodes (commands.py:97-104)
DEFAULT_IGNORE: Set[str] = {
    "teiHeader.xsd",
    "text-format.pdf",
    "text-header.pdf",
    "1817_9.xml",
}

FILE_SCHEMA = T.StructType(
    [
        T.StructField("grp", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)


def read_corpus_files(spark: SparkSession, corpus_path: str) -> DataFrame:
    """binaryFile scan of the corpus dir; group = the top-level entry
    name (commands.py:108 ``group_path.stem``)."""
    files = spark.read.format("binaryFile").option("recursiveFileLookup", "true").load(
        corpus_path
    )
    root = corpus_path.rstrip("/")
    rel = F.regexp_replace(F.col("path"), f"^file:{root}/", "")
    grp = F.regexp_replace(F.split(rel, "/")[0], r"\.[^.]+$", "")
    return files.select(
        grp.alias("grp"),
        F.element_at(F.split(F.col("path"), "/"), -1).alias("name"),
        F.col("content"),
    )


def _tei_text(data: bytes) -> Optional[str]:
    """TEI/XML -> text: every element's text joined with spaces (the
    reference's ``corpora.tostring(lambda e, t: f'{t} ')``)."""
    import xml.etree.ElementTree as ET

    try:
        root = ET.fromstring(data)
    except ET.ParseError:
        return None  # commands.py:127: XML error -> skip file
    return " ".join(t.strip() for t in root.itertext() if t.strip())


def _decode_txt(data: bytes) -> str:
    return data.decode(detect_encoding(data), errors="replace")


def _extract_one(name: str, data: bytes) -> Optional[str]:
    low = name.lower()
    if low.endswith(".txt"):
        return _decode_txt(data)
    if low.endswith(".xml"):
        return _tei_text(data)
    if low.endswith(".pdf"):
        try:
            words = extract_pdf_words(data)
        except PDFExtractError:
            return None
        return " ".join(w[5] for w in words)
    return None  # commands.py:140: unrecognized filetype


def _walk_zip(name: str, data: bytes, ignore: Set[str]) -> List[Tuple[str, str]]:
    """Recursive in-memory zip expansion (commands.py:78-93) ->
    (member_name, text) for every extractable member."""
    out: List[Tuple[str, str]] = []
    try:
        zf = zipfile.ZipFile(io.BytesIO(data))
    except zipfile.BadZipFile:
        return out
    for member in zf.namelist():
        base = member.rsplit("/", 1)[-1]
        if not base or base.startswith(".") or base in ignore:
            continue
        payload = zf.read(member)
        if member.endswith(".zip"):
            out.extend(_walk_zip(member, payload, ignore))
        else:
            text = _extract_one(base, payload)
            if text is not None:
                out.append((base, text))
    return out


def corpus_texts(
    files: DataFrame, ignore: Optional[Set[str]] = None
) -> DataFrame:
    """(grp, name, content) -> (grp, name, text): zip expansion + format
    dispatch in one mapInPandas (binary crosses Arrow exactly once)."""
    ign = DEFAULT_IGNORE if ignore is None else ignore

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for grp, name, content in zip(pdf["grp"], pdf["name"], pdf["content"]):
                if name.startswith(".") or name in ign:
                    continue
                data = bytes(content)
                if name.lower().endswith(".zip"):
                    for member, text in _walk_zip(name, data, ign):
                        rows.append({"grp": grp, "name": member, "text": text})
                else:
                    text = _extract_one(name, data)
                    if text is not None:
                        rows.append({"grp": grp, "name": name, "text": text})
            yield pd.DataFrame(rows, columns=["grp", "name", "text"])

    return files.mapInPandas(run, schema=FILE_SCHEMA)


def corpus_dictionary_df(
    spark: SparkSession,
    corpus_path: str,
    existing_groups: Sequence[str] = (),
    ignore: Optional[Set[str]] = None,
    tokenizer: str = "treebank",
) -> DataFrame:
    """Corpus dir -> distinct cleaned (grp, word) — the reference's
    per-group ``dictionary.add`` loop as one job. ``existing_groups``
    are pruned *before* parsing any bytes (the incremental skip at
    commands.py:108-112). ``tokenizer``: 'treebank' (the reference's
    nltk tokenize_str, as a native column cascade) or 'whitespace'."""
    from .sources import _clean_word_col

    files = read_corpus_files(spark, corpus_path)
    if existing_groups:
        files = files.where(~F.col("grp").isin(list(existing_groups)))
    texts = corpus_texts(files, ignore=ignore)
    if tokenizer == "treebank":
        words = treebank_tokenize_col("text")
    else:
        words = F.filter(F.split(F.trim("text"), r"\s+"), lambda w: w != "")
    return (
        texts.select("grp", F.explode(words).alias("raw"))
        .select("grp", _clean_word_col(F.col("raw")).alias("word"))
        .where((F.col("word") != "") & F.col("word").rlike(r"\p{L}"))
        .distinct()
    )


def annotator_gold_words(tokens: DataFrame) -> DataFrame:
    """commands.py:145-166 ``--add_annotator_gold``: gold words from
    annotator-decided tokens of done documents, one dictionary group per
    doc (``gold-<docid>``)."""
    from .sources import _clean_word_col

    done_urls = (
        tokens.groupBy("url")
        .agg(
            F.min(
                (F.col("heuristic").isNotNull() & ~F.col("discarded")).cast("int")
            ).alias("_done")
        )
        .where(F.col("_done") == 1)
        .select("url")
    )
    return (
        tokens.join(done_urls, on="url", how="left_semi")
        .where(
            (F.col("heuristic") == "annotator")
            & F.col("gold").isNotNull()
            & (F.col("gold") != "")
        )
        .select(
            F.concat(F.lit("gold-"), F.col("url")).alias("grp"),
            _clean_word_col(F.col("gold")).alias("word"),
        )
        .where(F.col("word") != "")
        .distinct()
    )


def treebank_tokenize_col(text_col):
    """T2 as a NATIVE column: the Penn Treebank rule cascade compiled to
    chained ``regexp_replace`` (whole-stage codegen — no Python UDF),
    value-identical to ``kernels.treebank.treebank_tokenize``."""
    from ..kernels.treebank import JAVA_RULES

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    for pat, rep in JAVA_RULES:
        if pat == "__PAD__":
            c = F.concat(F.lit(" "), c, F.lit(" "))
        else:
            c = F.regexp_replace(c, pat, rep)
    return F.filter(F.split(F.trim(c), r"\s+"), lambda w: w != "")
