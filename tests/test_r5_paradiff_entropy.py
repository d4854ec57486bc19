"""paragraph_diff (hand kept/added/removed with churn, url-only-in-one
-side cases, within-side duplicate paragraphs collapse, empty blocks
dropped, identical snapshots zero churn) and entropy_rate (python twin
with the same per-term floors, degenerate repetition collapses the
conditional rate, single-token docs yield zero bigrams, group split)."""

import math

from correctocr_spark.ops.temporal import paragraph_diff
from correctocr_spark.ops.textstats import entropy_rate


def h_twin(counts):
    n = sum(counts)
    return n, sum(
        math.floor(1e6 * c / n * (math.log(n) - math.log(c))) for c in counts
    )


class TestParagraphDiff:
    def _diff(self, spark, old_rows, new_rows):
        old = spark.createDataFrame(old_rows, "url string, text string")
        new = spark.createDataFrame(new_rows, "url string, text string")
        return {
            r["url"]: (r["n_old"], r["n_new"], r["kept"], r["added"],
                       r["removed"], r["churn_bp"])
            for r in paragraph_diff(old, new).collect()
        }

    def test_hand_counts(self, spark):
        got = self._diff(
            spark,
            [("u1", "a\n\nb\n\nc"), ("u2", "x")],
            [("u1", "b\n\nc\n\nd"), ("u3", "y\n\nz")],
        )
        assert got["u1"] == (3, 3, 2, 1, 1, 5000)
        assert got["u2"] == (1, 0, 0, 0, 1, 10000)
        assert got["u3"] == (0, 2, 0, 2, 0, 10000)

    def test_duplicate_paragraphs_collapse(self, spark):
        got = self._diff(
            spark, [("u", "a\n\na\n\nb")], [("u", "a")]
        )
        # old side distinct = {a, b}
        assert got["u"] == (2, 1, 1, 0, 1, 5000)

    def test_empty_blocks_dropped(self, spark):
        got = self._diff(
            spark, [("u", "a\n\n\n\n  \n\nb")], [("u", "a\n\nb")]
        )
        assert got["u"] == (2, 2, 2, 0, 0, 0)

    def test_identical_snapshots(self, spark):
        rows = [("u", "p1\n\np2")]
        got = self._diff(spark, rows, rows)
        assert got["u"][5] == 0


class TestEntropyRate:
    def test_matches_python_twin(self, spark):
        d = spark.createDataFrame(
            [(1, "a b a b"), (2, "a c")], "doc_id long, text string"
        )
        r = entropy_rate(d).first()
        # unigrams: a×3 b×2 c×1; bigrams: "a b"×2 "b a"×1 "a c"×1
        n1, h1 = h_twin([3, 2, 1])
        n2, h2 = h_twin([2, 1, 1])
        assert (r["n_tokens"], r["h1_micro"]) == (n1, h1)
        assert (r["n_bigrams"], r["h2_micro"]) == (n2, h2)
        assert r["rate_micro"] == h2 - h1

    def test_template_collapses_rate(self, spark):
        import random

        rng = random.Random(3)
        nat = " ".join("w%d" % rng.randrange(13) for _ in range(60))
        tpl = "click here now " * 20
        d = spark.createDataFrame(
            [("nat", nat), ("tpl", tpl)], "lang string, text string"
        )
        got = {
            r["grp"]: r["rate_micro"]
            for r in entropy_rate(d, group_col="lang").collect()
        }
        assert got["tpl"] < got["nat"]

    def test_single_token_no_bigrams(self, spark):
        d = spark.createDataFrame([(1, "solo")], "doc_id long, text string")
        r = entropy_rate(d).first()
        assert (r["n_tokens"], r["n_bigrams"], r["h2_micro"]) == (1, 0, 0)

    def test_group_split(self, spark):
        d = spark.createDataFrame(
            [("en", "a b"), ("de", "x y z")], "lang string, text string"
        )
        got = {
            r["grp"]: (r["n_tokens"], r["n_bigrams"])
            for r in entropy_rate(d, group_col="lang").collect()
        }
        assert got == {"en": (2, 1), "de": (3, 2)}
