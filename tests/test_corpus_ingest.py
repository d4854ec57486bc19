"""Dictionary corpus ingestion (commands.py:31-169): distributed
zip/TEI/txt/pdf word extraction into dictionary groups, incremental
group skip, annotator-gold groups."""

import io
import os
import shutil
import zipfile

import pytest

REF_PDF = "/root/reference/cocrtests/test.pdf"


@pytest.fixture()
def corpus_dir(tmp_path):
    root = tmp_path / "corpus"
    (root / "groupA").mkdir(parents=True)
    (root / "groupA" / "plain.txt").write_text("Hello wör-ld again hello")
    (root / "groupA" / "tei.xml").write_text(
        "<TEI><text><body><p>riget <w>altid</w> og</p><l>magten</l></body></text></TEI>"
    )
    (root / "groupA" / ".hidden.txt").write_text("skipped")
    (root / "groupA" / "teiHeader.xsd").write_text("ignored schema")
    (root / "groupB").mkdir()
    # nested zip: outer.zip -> inner.zip -> words.txt + direct.txt
    inner = io.BytesIO()
    with zipfile.ZipFile(inner, "w") as z:
        z.writestr("words.txt", "nested zipword")
    outer = root / "groupB" / "outer.zip"
    with zipfile.ZipFile(outer, "w") as z:
        z.writestr("inner.zip", inner.getvalue())
        z.writestr("direct.txt", "toplevel")
    if os.path.isfile(REF_PDF):
        shutil.copy(REF_PDF, root / "groupB" / "scan.pdf")
    return str(root)


def test_corpus_dictionary_groups(spark, corpus_dir):
    from correctocr_spark.spark.corpus import corpus_dictionary_df

    rows = corpus_dictionary_df(spark, corpus_dir).collect()
    by_group = {}
    for r in rows:
        by_group.setdefault(r["grp"], set()).add(r["word"])
    # groupA: txt (hyphen stripped per Dictionary.add) + TEI text
    assert by_group["groupA"] >= {"Hello", "wörld", "again", "hello", "riget", "altid", "og", "magten"}
    assert "skipped" not in by_group["groupA"]       # dotfile ignored
    assert "ignored" not in by_group["groupA"]       # hardcoded ignore list
    # groupB: nested zip + direct member (+ pdf words if ref present)
    assert {"nested", "zipword", "toplevel"} <= by_group["groupB"]
    if os.path.isfile(REF_PDF):
        assert {"Once", "upen"} <= by_group["groupB"]  # 'a' dropped? no: letters
    # distinct within group
    assert sum(1 for r in rows if r["grp"] == "groupA" and r["word"] == "Hello") == 1


def test_corpus_existing_group_skip(spark, corpus_dir):
    """commands.py:108-112: already-ingested groups are pruned before
    any bytes are parsed (scan-level filter)."""
    from correctocr_spark.spark.corpus import corpus_dictionary_df

    rows = corpus_dictionary_df(spark, corpus_dir, existing_groups=["groupA"]).collect()
    groups = {r["grp"] for r in rows}
    assert groups == {"groupB"}


def test_corpus_malformed_xml_skipped(spark, tmp_path):
    from correctocr_spark.spark.corpus import corpus_dictionary_df

    root = tmp_path / "c"
    (root / "g").mkdir(parents=True)
    (root / "g" / "bad.xml").write_text("<TEI><unclosed>")
    (root / "g" / "ok.txt").write_text("fine")
    rows = corpus_dictionary_df(spark, str(root)).collect()
    assert {(r["grp"], r["word"]) for r in rows} == {("g", "fine")}


def test_annotator_gold_words(spark):
    """commands.py:145-166: gold from annotator tokens of DONE docs only,
    grouped per doc."""
    from correctocr_spark.spark.corpus import annotator_gold_words

    cols = ["url", "idx", "original", "gold", "heuristic", "discarded"]
    tokens = spark.createDataFrame(
        [
            # done doc: all decided, none discarded
            ("d1", 0, "teh", "the,", "annotator", False),
            ("d1", 1, "cat", "cat", "original", False),
            # not done: one undecided token
            ("d2", 0, "dgo", "dog", "annotator", False),
            ("d2", 1, "x", None, None, False),
        ],
        cols,
    )
    rows = {(r["grp"], r["word"]) for r in annotator_gold_words(tokens).collect()}
    assert rows == {("gold-d1", "the")}  # cleaned, d2 excluded
