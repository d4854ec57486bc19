"""vocab_richness (hand f1/f2 Chao1 + Good–Turing, no-singleton and
all-singleton edges, group split) and zipf_fit (hand OLS vs the same
milli-nat quantization in pure python, head cap, degenerate single-rank
NULL, flat-frequency slope 0)."""

import math

from correctocr_spark.ops.textstats import vocab_richness, zipf_fit


def _fit_expected(counts, max_rank=128):
    """Pure-python twin of zipf_fit's exact-integer OLS."""
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:max_rank]
    xs = [math.floor(1000 * math.log(r)) for r in range(1, len(ranked) + 1)]
    ys = [math.floor(1000 * math.log(c)) for _, c in ranked]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    den = n * sxx - sx * sx
    if den <= 0:
        return n, None, None
    negnum = sx * sy - n * sxy
    return (
        n,
        (1000 * negnum) // den,
        (sy * den + negnum * sx) // (n * den),
    )


class TestVocabRichness:
    def test_hand_counts(self, spark):
        df = spark.createDataFrame(
            [(1, "a a a a b b c d"), (2, "a b e f")],
            "doc_id long, text string",
        )
        r = vocab_richness(df).first()
        # a×5 b×3 c,d,e,f ×1 → N=12 V=6 f1=4 f2=0
        assert (r["n_tokens"], r["vocab"], r["f1"], r["f2"]) == (12, 6, 4, 0)
        assert r["chao1_milli"] == 1000 * 6 + (1000 * 4 * 3) // 2
        assert r["gt_unseen_bp"] == (10000 * 4) // 12
        assert r["singleton_share_bp"] == (10000 * 4) // 6

    def test_no_singletons_chao1_equals_vocab(self, spark):
        df = spark.createDataFrame([(1, "a a b b")], "doc_id long, text string")
        r = vocab_richness(df).first()
        assert (r["f1"], r["f2"]) == (0, 2)
        assert r["chao1_milli"] == 2000  # no unseen-mass correction
        assert r["gt_unseen_bp"] == 0

    def test_all_singletons(self, spark):
        df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        r = vocab_richness(df).first()
        # f1=3, f2=0 → chao1 = V + f1(f1-1)/2 = 3 + 3 = 6
        assert r["chao1_milli"] == 6000
        assert r["gt_unseen_bp"] == 10000  # P0 = 3/3

    def test_group_split(self, spark):
        df = spark.createDataFrame(
            [("en", "x x"), ("de", "y")], "lang string, text string"
        )
        got = {
            r["grp"]: (r["n_tokens"], r["vocab"], r["f1"])
            for r in vocab_richness(df, group_col="lang").collect()
        }
        assert got == {"en": (2, 1, 0), "de": (1, 1, 1)}


class TestZipfFit:
    def test_matches_python_twin(self, spark):
        counts = {"a": 5, "b": 3, "c": 1, "d": 1, "e": 1, "f": 1}
        text = " ".join(w for w, c in counts.items() for _ in range(c))
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        r = zipf_fit(df).first()
        n, slope, intercept = _fit_expected(counts)
        assert (r["n_ranks"], r["neg_slope_milli"], r["intercept_milli"]) == (
            n,
            slope,
            intercept,
        )

    def test_flat_frequencies_zero_slope(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c d")], "doc_id long, text string"
        )
        r = zipf_fit(df).first()
        assert r["neg_slope_milli"] == 0
        assert r["intercept_milli"] == 0  # ln(1) head

    def test_single_rank_null(self, spark):
        df = spark.createDataFrame([(1, "a a a")], "doc_id long, text string")
        r = zipf_fit(df).first()
        assert r["n_ranks"] == 1
        assert r["neg_slope_milli"] is None and r["intercept_milli"] is None

    def test_head_cap(self, spark):
        counts = {f"w{i:02d}": 20 - i for i in range(10)}
        text = " ".join(w for w, c in counts.items() for _ in range(c))
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        r = zipf_fit(df, max_rank=4).first()
        n, slope, intercept = _fit_expected(counts, max_rank=4)
        assert (r["n_ranks"], r["neg_slope_milli"], r["intercept_milli"]) == (
            4,
            slope,
            intercept,
        )

    def test_group_split(self, spark):
        df = spark.createDataFrame(
            [("en", "a a b"), ("de", "z z z y")], "lang string, text string"
        )
        got = {
            r["grp"]: r["n_ranks"]
            for r in zipf_fit(df, group_col="lang").collect()
        }
        assert got == {"en": 2, "de": 2}
