"""Edge-case pins for the round-5 estimation tier: Kaplan-Meier
survival (ops/temporal.survival_curve), the unpaired two-proportion
z-test (ops/textstats.two_proportion_gate), Jensen-Shannon drift
(ops/textstats.js_divergence), degree assortativity
(ops/graph.degree_assortativity) and Horvitz-Thompson estimation
(ops/cleaning.horvitz_thompson). The full DuckDB hash oracles live in
__spark_entry__ (test_entry_contract covers them every session); these
pin the hand-checkable boundary semantics the oracles can't isolate.
"""

import math

import pytest

from pyspark.sql import functions as F


def _sc(spark, rows):
    return spark.createDataFrame(rows, "duration long, event int")


class TestSurvivalCurve:
    def test_textbook_no_censoring(self, spark):
        """No censoring: KM at t is exactly (n-cum_d)/n — the empirical
        survivor function; pin against the closed form."""
        from correctocr_spark.ops.temporal import survival_curve

        rows = [(t, 1) for t in [1, 1, 2, 3, 3, 3, 5]]
        out = {r["t"]: r for r in survival_curve(_sc(spark, rows)).collect()}
        assert sorted(out) == [1, 2, 3, 5]
        assert out[1]["n_risk"] == 7 and out[1]["n_events"] == 2
        assert out[2]["n_risk"] == 5
        assert out[3]["n_risk"] == 4 and out[3]["n_events"] == 3
        # survivor function: 5/7, 4/7, 1/7, 0/... at t=5 the last
        # subject dies -> hard zero
        assert out[5]["km_micro"] == 0
        for t, frac in [(1, 5 / 7), (2, 4 / 7), (3, 1 / 7)]:
            assert abs(out[t]["km_micro"] - 1000000 * frac) <= len(rows) + 2

    def test_censoring_shifts_risk_set_without_rows(self, spark):
        """Censored durations emit no output row but shrink n_risk for
        later event times (standard KM risk-set accounting)."""
        from correctocr_spark.ops.temporal import survival_curve

        rows = [(1, 1), (2, 0), (2, 0), (4, 1), (4, 0), (9, 1)]
        out = {r["t"]: r for r in survival_curve(_sc(spark, rows)).collect()}
        assert sorted(out) == [1, 4, 9]  # t=2 censored-only: no row
        assert out[1]["n_risk"] == 6
        assert out[4]["n_risk"] == 3  # the two t=2 censorings left
        assert out[4]["n_censored"] == 1
        assert out[9]["n_risk"] == 1

    def test_all_censored_is_empty(self, spark):
        from correctocr_spark.ops.temporal import survival_curve

        assert survival_curve(_sc(spark, [(3, 0), (7, 0)])).count() == 0

    def test_cumhaz_is_sum_of_quantized_steps(self, spark):
        from correctocr_spark.ops.temporal import survival_curve

        rows = [(1, 1), (1, 1), (2, 1), (3, 1)]
        out = survival_curve(_sc(spark, rows)).collect()
        hz = [r["hazard_micro"] for r in out]
        cum = [r["cumhaz_micro"] for r in out]
        assert cum == [sum(hz[: i + 1]) for i in range(len(hz))]


class TestTwoProportionGate:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "g string, ok boolean")

    def test_hand_computed_z2(self, spark):
        """a: 30/60 pass, b: 20/40 pass -> identical rates, z2 = 0."""
        from correctocr_spark.ops.textstats import two_proportion_gate

        rows = [("a", i < 30) for i in range(60)] + [
            ("b", i < 20) for i in range(40)
        ]
        r = two_proportion_gate(
            self._df(spark, rows), "g", "ok", "a", "b"
        ).collect()[0]
        assert (r["n_a"], r["k_a"], r["n_b"], r["k_b"]) == (60, 30, 40, 20)
        assert r["z2_milli"] == 0
        assert r["rate_a_micro"] == r["rate_b_micro"] == 500000
        # Wilson interval brackets the point rate and stays in [0, 1e6]
        assert 0 <= r["wilson_a_lo_micro"] < 500000 < r["wilson_a_hi_micro"] <= 10**6

    def test_empty_group_yields_nulls(self, spark):
        from correctocr_spark.ops.textstats import two_proportion_gate

        rows = [("a", True), ("a", False)]
        r = two_proportion_gate(
            self._df(spark, rows), "g", "ok", "a", "missing"
        ).collect()[0]
        assert r["n_b"] == 0
        assert r["rate_b_micro"] is None
        assert r["wilson_b_lo_micro"] is None
        assert r["z2_milli"] is None

    def test_all_pass_pooled_edge_is_null(self, spark):
        """K == N: pooled variance is 0 and z2 is 0/0 -> NULL, not a
        divide-by-zero job failure."""
        from correctocr_spark.ops.textstats import two_proportion_gate

        rows = [("a", True)] * 5 + [("b", True)] * 5
        r = two_proportion_gate(
            self._df(spark, rows), "g", "ok", "a", "b"
        ).collect()[0]
        assert r["z2_milli"] is None

    def test_known_difference_matches_closed_form(self, spark):
        from correctocr_spark.ops.textstats import two_proportion_gate

        n_a, k_a, n_b, k_b = 80, 60, 70, 21
        rows = [("a", i < k_a) for i in range(n_a)] + [
            ("b", i < k_b) for i in range(n_b)
        ]
        r = two_proportion_gate(
            self._df(spark, rows), "g", "ok", "a", "b"
        ).collect()[0]
        K, N = k_a + k_b, n_a + n_b
        exact = (
            1000 * (k_a * n_b - k_b * n_a) ** 2 * N
        ) // (n_a * n_b * K * (N - K))
        assert r["z2_milli"] == exact
        p1, p2, pp = k_a / n_a, k_b / n_b, K / N
        z2_float = (p1 - p2) ** 2 / (pp * (1 - pp) * (1 / n_a + 1 / n_b))
        assert abs(r["z2_milli"] - 1000 * z2_float) <= 1.5


class TestJsDivergence:
    def _docs(self, spark, a_texts, b_texts):
        rows = [("A", t) for t in a_texts] + [("B", t) for t in b_texts]
        return spark.createDataFrame(rows, "lang string, text string")

    def test_identical_corpora_zero(self, spark):
        from correctocr_spark.ops.textstats import js_divergence

        d = self._docs(spark, ["x y z x"], ["x y z x"])
        r = js_divergence(d, "lang", "A", "B").collect()[0]
        assert r["jsd_micro"] == 0
        assert r["vocab"] == 3 and r["vocab_a"] == r["vocab_b"] == 3

    def test_disjoint_support_is_ln2(self, spark):
        """Fully disjoint vocabularies: JSD = ln 2 exactly; floor bias
        is at most one micro-nat per vocab word."""
        from correctocr_spark.ops.textstats import js_divergence

        d = self._docs(spark, ["a b c d"], ["w x y z w x"])
        r = js_divergence(d, "lang", "A", "B").collect()[0]
        ln2 = int(1000000 * math.log(2.0))
        assert ln2 - r["vocab"] - 1 <= r["jsd_micro"] <= ln2
        assert r["vocab_a"] == 4 and r["vocab_b"] == 4 and r["vocab"] == 8

    def test_symmetry(self, spark):
        from correctocr_spark.ops.textstats import js_divergence

        d = self._docs(spark, ["a a b c", "d a"], ["b b e", "a c c f"])
        ab = js_divergence(d, "lang", "A", "B").collect()[0]
        ba = js_divergence(d, "lang", "B", "A").collect()[0]
        assert ab["jsd_micro"] == ba["jsd_micro"]
        assert (ab["tokens_a"], ab["tokens_b"]) == (
            ba["tokens_b"],
            ba["tokens_a"],
        )


class TestDegreeAssortativity:
    def _edges(self, spark, pairs):
        return spark.createDataFrame(pairs, "src string, dst string")

    def test_star_is_perfectly_disassortative(self, spark):
        from correctocr_spark.ops.graph import degree_assortativity

        e = self._edges(spark, [("hub", f"leaf{i}") for i in range(6)])
        r = degree_assortativity(e).collect()[0]
        assert (r["n_nodes"], r["n_edges"]) == (7, 6)
        assert r["r_micro"] == -1000000

    def test_regular_graph_zero_variance_null(self, spark):
        """A cycle: every degree 2, zero degree variance -> NULL r."""
        from correctocr_spark.ops.graph import degree_assortativity

        n = 5
        e = self._edges(
            spark, [(f"n{i}", f"n{(i + 1) % n}") for i in range(n)]
        )
        r = degree_assortativity(e).collect()[0]
        assert (r["n_nodes"], r["n_edges"]) == (n, n)
        assert r["r_micro"] is None

    def test_multigraph_and_selfloops_collapse(self, spark):
        """Duplicate directed pairs, reversed duplicates and self-loops
        all collapse to the same distinct undirected edge set."""
        from correctocr_spark.ops.graph import degree_assortativity

        base = [("a", "b"), ("b", "c")]
        noisy = base + [("b", "a"), ("a", "b"), ("c", "c")]
        r1 = degree_assortativity(self._edges(spark, base)).collect()
        r2 = degree_assortativity(self._edges(spark, noisy)).collect()
        assert [tuple(r) for r in r1] == [tuple(r) for r in r2]


class TestHorvitzThompson:
    def _docs(self, spark, n=400):
        rows = [(i, "en" if i % 3 else "fr", 50 + (i * 31) % 400) for i in range(n)]
        return spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")

    def test_full_rate_recovers_exact_totals(self, spark):
        """bp = 10000 keeps every row: estimate == true total, var 0."""
        from correctocr_spark.ops.cleaning import horvitz_thompson

        d = self._docs(spark)
        got = {
            r["stratum"]: r
            for r in horvitz_thompson(d, "n_chars", rate_bp=10000).collect()
        }
        true = {
            r["lang"]: (r["n"], r["s"])
            for r in d.groupBy("lang")
            .agg(F.count("*").alias("n"), F.sum("n_chars").alias("s"))
            .collect()
        }
        for lang, (n, s) in true.items():
            assert got[lang]["n_sampled"] == n
            assert got[lang]["est_total"] == s
            assert got[lang]["var_total"] == 0
            assert got[lang]["se_total"] == 0

    def test_gate_matches_deterministic_sample(self, spark):
        """The bp gate selects EXACTLY deterministic_sample's rows —
        profiling the sample and training on it see the same set."""
        from correctocr_spark.ops.cleaning import (
            deterministic_sample,
            horvitz_thompson,
        )

        d = self._docs(spark)
        ht = horvitz_thompson(d, "n_chars", rate_bp=2500, seed="s9")
        n_ht = {r["stratum"]: r["n_sampled"] for r in ht.collect()}
        samp = deterministic_sample(d, rate=0.25, seed="s9")
        n_s = {
            r["lang"]: r["n"]
            for r in samp.groupBy("lang").agg(F.count("*").alias("n")).collect()
        }
        assert n_ht == n_s

    def test_estimate_within_two_se_of_truth(self, spark):
        from correctocr_spark.ops.cleaning import horvitz_thompson

        d = self._docs(spark, n=2000)
        truth = {
            r["lang"]: r["s"]
            for r in d.groupBy("lang").agg(F.sum("n_chars").alias("s")).collect()
        }
        for r in horvitz_thompson(d, "n_chars", rate_bp=2000).collect():
            assert abs(r["est_total"] - truth[r["stratum"]]) <= 2 * r["se_total"]

    def test_invalid_rate_raises(self, spark):
        from correctocr_spark.ops.cleaning import horvitz_thompson

        with pytest.raises(ValueError):
            horvitz_thompson(self._docs(spark), "n_chars", rate_bp=0)
        with pytest.raises(ValueError):
            horvitz_thompson(
                self._docs(spark), "n_chars", rates_bp={"en": 20000}
            )
