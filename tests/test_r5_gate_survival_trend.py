"""Unit tests for the gate/survival/trend batch: weighted_kappa
(python twin, binary reduction to unweighted Cohen, linear vs
quadratic), mcc_eval (hand confusion, ±perfect short-circuit,
degenerate NULL), mann_kendall (monotone S, tie twin, all-tied NULL),
logrank_test (identical-cohort null, python definition twin)."""

import math

import pytest

from correctocr_spark.ops.temporal import logrank_test, mann_kendall
from correctocr_spark.ops.textstats import (
    agreement_kappa,
    mcc_eval,
    weighted_kappa,
)


class TestWeightedKappa:
    def _df(self, spark, pairs):
        return spark.createDataFrame(pairs, "a long, b long")

    def test_matches_python_twin(self, spark):
        pairs = [
            (0, 0), (0, 1), (1, 1), (1, 1), (2, 1), (2, 2), (0, 2),
            (1, 0), (2, 2), (1, 1), (0, 0), (2, 0),
        ]
        r = weighted_kappa(self._df(spark, pairs), "a", "b").collect()[0]
        n = len(pairs)
        obs = sum((a - b) ** 2 for a, b in pairs)
        cats = sorted({x for p in pairs for x in p})
        ra = {k: sum(1 for a, _ in pairs if a == k) for k in cats}
        cb = {k: sum(1 for _, b in pairs if b == k) for k in cats}
        exp = sum(
            (i - j) ** 2 * ra.get(i, 0) * cb.get(j, 0)
            for i in cats
            for j in cats
        )
        assert (r["n"], r["n_cats"]) == (n, len(cats))
        assert (r["obs_weighted"], r["exp_weighted"]) == (obs, exp)
        assert r["kappa_w_bp"] == 10000 - (10000 * n * obs) // exp
        # float sanity
        kw = 1 - (n * obs) / exp
        assert abs(r["kappa_w_bp"] / 10000 - kw) < 2e-4

    def test_perfect_agreement(self, spark):
        pairs = [(0, 0), (1, 1), (2, 2), (1, 1)]
        r = weighted_kappa(self._df(spark, pairs), "a", "b").collect()[0]
        assert r["obs_weighted"] == 0 and r["kappa_w_bp"] == 10000

    def test_binary_reduces_to_unweighted_cohen(self, spark):
        """On {0,1} labels every off-diagonal weight is 1, so weighted
        kappa == agreement_kappa (up to bp rounding conventions)."""
        pairs = [(0, 0), (0, 1), (1, 1), (1, 0), (1, 1), (0, 0), (1, 1)]
        df = self._df(spark, pairs)
        rw = weighted_kappa(df, "a", "b").collect()[0]
        rc = agreement_kappa(df, "a", "b").collect()[0]
        n = len(pairs)
        # closed forms: both rationals share the denominator N² − Σ ra·cb,
        # and N·agree − Σp == den − N·(N − agree), so the two integer
        # divs can differ only by the truncation direction: 0 or 1 bp
        assert rw["kappa_w_bp"] - rc["kappa_bp"] in (0, 1)
        assert rw["obs_weighted"] == n - rc["agree"]

    def test_linear_vs_quadratic_and_validation(self, spark):
        pairs = [(0, 2), (0, 0), (2, 2), (1, 1)]
        df = self._df(spark, pairs)
        rq = weighted_kappa(df, "a", "b", "quadratic").collect()[0]
        rl = weighted_kappa(df, "a", "b", "linear").collect()[0]
        assert rq["obs_weighted"] == 4 and rl["obs_weighted"] == 2
        with pytest.raises(ValueError):
            weighted_kappa(df, "a", "b", "cubic")

    def test_degenerate_single_label_null(self, spark):
        pairs = [(1, 1), (1, 1)]
        r = weighted_kappa(self._df(spark, pairs), "a", "b").collect()[0]
        assert r["exp_weighted"] == 0 and r["kappa_w_bp"] is None


class TestMcc:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "pred boolean, truth boolean")

    def test_hand_confusion_twin(self, spark):
        rows = (
            [(True, True)] * 6 + [(True, False)] * 2
            + [(False, True)] * 3 + [(False, False)] * 9
        )
        r = mcc_eval(self._df(spark, rows), "pred", "truth").collect()[0]
        tp, fp, fn, tn = 6, 2, 3, 9
        assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (tp, fp, fn, tn)
        num = tp * tn - fp * fn
        den = math.sqrt(tp + fp) * math.sqrt(tp + fn) * math.sqrt(
            tn + fp
        ) * math.sqrt(tn + fn)
        assert r["mcc_milli"] == math.floor(1000.0 * num / den)

    def test_perfect_and_inverted(self, spark):
        rows = [(True, True)] * 4 + [(False, False)] * 7
        assert (
            mcc_eval(self._df(spark, rows), "pred", "truth")
            .collect()[0]["mcc_milli"]
            == 1000
        )
        inv = [(not p, t) for p, t in rows]
        assert (
            mcc_eval(self._df(spark, inv), "pred", "truth")
            .collect()[0]["mcc_milli"]
            == -1000
        )

    def test_degenerate_gate_null(self, spark):
        rows = [(True, True), (True, False), (True, True)]
        r = mcc_eval(self._df(spark, rows), "pred", "truth").collect()[0]
        assert r["mcc_milli"] is None  # tn + fn == 0


class TestMannKendall:
    def _series(self, spark, ys):
        return spark.createDataFrame(
            list(enumerate(ys)), "t long, y long"
        )

    def test_monotone_increasing(self, spark):
        ys = [1, 3, 7, 9, 12, 20]
        r = mann_kendall(self._series(spark, ys), "t", "y").collect()[0]
        n = len(ys)
        assert r["s_stat"] == n * (n - 1) // 2
        assert r["tie_term"] == 0
        assert r["var18"] == n * (n - 1) * (2 * n + 5)
        assert r["z_milli"] == math.floor(
            1000.0 * (r["s_stat"] - 1) / math.sqrt(r["var18"] / 18.0)
        )
        assert r["z_milli"] > 2000  # clearly significant up-trend

    def test_matches_python_twin_with_ties(self, spark):
        ys = [4, 7, 4, 9, 2, 9, 9, 5]
        r = mann_kendall(self._series(spark, ys), "t", "y").collect()[0]
        n = len(ys)
        S = sum(
            (ys[j] > ys[i]) - (ys[j] < ys[i])
            for i in range(n)
            for j in range(i + 1, n)
        )
        from collections import Counter

        T = sum(
            c * (c - 1) * (2 * c + 5) for c in Counter(ys).values()
        )
        var18 = n * (n - 1) * (2 * n + 5) - T
        assert (r["s_stat"], r["tie_term"], r["var18"]) == (S, T, var18)
        cc = S - 1 if S > 0 else (S + 1 if S < 0 else 0)
        assert r["z_milli"] == math.floor(
            1000.0 * cc / math.sqrt(var18 / 18.0)
        )

    def test_all_tied_null(self, spark):
        r = mann_kendall(
            self._series(spark, [5, 5, 5, 5]), "t", "y"
        ).collect()[0]
        assert r["s_stat"] == 0 and r["var18"] == 0
        assert r["z_milli"] is None


class TestLogrank:
    def _spans(self, spark, rows):
        return spark.createDataFrame(
            rows, "grp string, duration long, event int"
        )

    @staticmethod
    def _twin(rows):
        times = sorted({t for _, t, e in rows if e == 1})
        oe = v = 0
        for t in times:
            na = sum(1 for g, tt, _ in rows if g == "a" and tt >= t)
            nb = sum(1 for g, tt, _ in rows if g == "b" and tt >= t)
            da = sum(
                1 for g, tt, e in rows if g == "a" and tt == t and e == 1
            )
            db = sum(
                1 for g, tt, e in rows if g == "b" and tt == t and e == 1
            )
            d, n = da + db, na + nb
            oe += math.floor(1000000.0 * (da * n - d * na) / n)
            if n > 1:
                v += math.floor(
                    1000000.0 * na * nb * d * (n - d)
                    / (float(n) * n * (n - 1))
                )
        chi2 = (
            math.floor(
                1000.0 * (oe / 1000000.0) * (oe / 1000000.0)
                / (v / 1000000.0)
            )
            if v > 0
            else None
        )
        return oe, v, chi2

    def test_matches_python_twin(self, spark):
        rows = [
            ("a", 2, 1), ("a", 3, 0), ("a", 5, 1), ("a", 8, 1),
            ("a", 8, 0), ("b", 1, 1), ("b", 2, 1), ("b", 4, 0),
            ("b", 5, 1), ("b", 9, 0),
        ]
        r = logrank_test(
            self._spans(spark, rows), "duration", "event", "grp", "a", "b"
        ).collect()[0]
        oe, v, chi2 = self._twin(rows)
        assert (r["n_a"], r["n_b"]) == (5, 5)
        assert (r["oe_micro"], r["var_micro"]) == (oe, v)
        assert r["chi2_milli"] == chi2

    def test_identical_cohorts_near_zero(self, spark):
        """Mirror-image cohorts: O−E cancels exactly at every time."""
        rows = [("a", t, e) for t, e in [(1, 1), (3, 1), (6, 0)]] + [
            ("b", t, e) for t, e in [(1, 1), (3, 1), (6, 0)]
        ]
        r = logrank_test(
            self._spans(spark, rows), "duration", "event", "grp", "a", "b"
        ).collect()[0]
        assert abs(r["oe_micro"]) <= 2  # only per-term floor dust
        assert r["chi2_milli"] == 0

    def test_censored_kept_at_risk_at_their_time(self, spark):
        """A subject censored AT an event time still sits in that
        time's risk set (Kalbfleisch–Prentice tie convention)."""
        rows = [("a", 4, 0), ("b", 4, 1), ("a", 9, 1), ("b", 9, 0)]
        r = logrank_test(
            self._spans(spark, rows), "duration", "event", "grp", "a", "b"
        ).collect()[0]
        oe, v, chi2 = self._twin(rows)
        assert (r["oe_micro"], r["var_micro"], r["chi2_milli"]) == (
            oe, v, chi2,
        )
        assert r["n_event_times"] == 2
