"""T2: Penn Treebank word tokenization — pinned against the nltk
TreebankWordTokenizer's documented outputs, with the native Spark column
cascade proven value-identical to the kernel."""

from hypothesis import given, settings
from hypothesis import strategies as st

from correctocr_spark.kernels.treebank import treebank_tokenize

#: (input, nltk TreebankWordTokenizer().tokenize output) — the first is
#: nltk's own doctest example.
PINNED = [
    (
        "Good muffins cost $3.88\nin New York.  Please buy me\ntwo of them.\nThanks.",
        ["Good", "muffins", "cost", "$", "3.88", "in", "New", "York.",
         "Please", "buy", "me", "two", "of", "them.", "Thanks", "."],
    ),
    (
        "They'll save and invest more.",
        ["They", "'ll", "save", "and", "invest", "more", "."],
    ),
    (
        "hi, my name can't hello,",
        ["hi", ",", "my", "name", "ca", "n't", "hello", ","],
    ),
    (
        '"We beat some pretty good teams to get here," Slocum said.',
        ["``", "We", "beat", "some", "pretty", "good", "teams", "to",
         "get", "here", ",", "''", "Slocum", "said", "."],
    ),
    ("I cannot gimme that", ["I", "can", "not", "gim", "me", "that"]),
    ("", []),
]


def test_treebank_pinned_examples():
    for text, expected in PINNED:
        assert treebank_tokenize(text) == expected, text


def test_treebank_column_twin_identical(spark):
    from correctocr_spark.spark.corpus import treebank_tokenize_col

    texts = [t for t, _ in PINNED] + ["(brackets) -- 'tis ... x; y@z 50%"]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    rows = df.select(treebank_tokenize_col("text").alias("toks")).collect()
    for t, r in zip(texts, rows):
        assert list(r["toks"]) == treebank_tokenize(t), t


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=120))
def test_treebank_total_and_nonempty_tokens(text):
    toks = treebank_tokenize(text)
    assert all(t and not t.isspace() for t in toks)
