"""weight_ess (hand Kish ESS, degenerate single-heavy-weight collapse,
uniform weights = nominal, zero/negative/null handling) and heaps_fit
(python twin with TRUNCATING div — Spark `div` and DuckDB `//` both
round toward zero on negatives, unlike python's floor //, pinned here
by the signed-intercept case — plus sublinear beta on saturating vocab,
bad-arg and empty input)."""

import math

import pytest

from correctocr_spark.ops.textstats import heaps_fit, weight_ess


def tdiv(a, b):
    """Truncate-toward-zero integer division (Spark div / DuckDB //)."""
    q = abs(a) // abs(b)
    return q if (a < 0) == (b < 0) else -q


def heaps_expected(cn, cv):
    xs = [math.floor(1000 * math.log(n)) for n in cn]
    ys = [math.floor(1000 * math.log(v)) for v in cv]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    den = n * sxx - sx * sx
    num = n * sxy - sx * sy
    return tdiv(1000 * num, den), tdiv(sy * den - num * sx, n * den)


class TestWeightEss:
    def test_hand_kish(self, spark):
        d = spark.createDataFrame(
            [("a", 3), ("a", 1), ("a", 0), ("b", 2), ("b", 2)],
            "g string, w long",
        )
        got = {
            r["grp"]: (r["n_rows"], r["w_sum"], r["ess_milli"],
                       r["ess_share_bp"])
            for r in weight_ess(d, "w", group_col="g").collect()
        }
        # a: s=4 q=10 → ess = 16/10 = 1.6 docs of 3 nominal
        assert got["a"] == (3, 4, 1600, 5333)
        # b: uniform → ESS = nominal
        assert got["b"] == (2, 4, 2000, 10000)

    def test_single_heavy_weight_collapses(self, spark):
        d = spark.createDataFrame(
            [(1000,)] + [(1,)] * 99, "w long"
        )
        r = weight_ess(d, "w").first()
        # ESS ≈ (1099)²/(1000099) ≈ 1.2 docs out of 100
        assert r["ess_milli"] == (1000 * 1099 * 1099) // (1000000 + 99)
        assert r["ess_share_bp"] < 200

    def test_negative_and_null_dropped(self, spark):
        d = spark.createDataFrame(
            [(2,), (-5,), (None,), (2,)], "w long"
        )
        r = weight_ess(d, "w").first()
        assert (r["n_rows"], r["w_sum"], r["ess_milli"]) == (2, 4, 2000)

    def test_all_zero_null_ess(self, spark):
        d = spark.createDataFrame([(0,), (0,)], "w long")
        r = weight_ess(d, "w").first()
        assert r["ess_milli"] is None and r["n_rows"] == 2


class TestHeapsFit:
    def test_matches_python_twin_signed_intercept(self, spark):
        docs = spark.createDataFrame(
            [(i, "w%d x y z" % i) for i in range(16)],
            "doc_id long, text string",
        )
        r = heaps_fit(docs, num_points=4).first()
        # buckets of 4 docs: cumN 16,32,48,64; cumV 7,11,15,19
        beta, lnk = heaps_expected([16, 32, 48, 64], [7, 11, 15, 19])
        assert (r["n_points"], r["beta_milli"], r["lnk_milli"]) == (
            4, beta, lnk,
        )
        assert lnk < 0  # the case that pins truncating-div semantics

    def test_saturating_vocab_low_beta(self, spark):
        # same 3 words forever → cumV constant → beta ≈ 0
        docs = spark.createDataFrame(
            [(i, "a b c") for i in range(32)], "doc_id long, text string"
        )
        r = heaps_fit(docs, num_points=8).first()
        assert r["beta_milli"] == 0

    def test_all_new_vocab_beta_one(self, spark):
        # every doc brings exactly its own tokens → V = N → beta = 1
        docs = spark.createDataFrame(
            [(i, "u%d v%d" % (i, i)) for i in range(32)],
            "doc_id long, text string",
        )
        r = heaps_fit(docs, num_points=8).first()
        assert abs(r["beta_milli"] - 1000) <= 1

    def test_group_split(self, spark):
        docs = spark.createDataFrame(
            [(i, "en", "a b") for i in range(8)]
            + [(i + 8, "de", "x%d" % i) for i in range(8)],
            "doc_id long, lang string, text string",
        )
        got = {
            r["grp"]: r["n_points"]
            for r in heaps_fit(docs, group_col="lang", num_points=4).collect()
        }
        # global buckets of width 4 split en into 2, de into 2
        assert got == {"en": 2, "de": 2}

    def test_bad_points_rejected(self, spark):
        docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        with pytest.raises(ValueError):
            heaps_fit(docs, num_points=1)

    def test_empty_input(self, spark):
        docs = spark.createDataFrame([], "doc_id long, text string")
        assert heaps_fit(docs).count() == 0
