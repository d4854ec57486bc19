"""Unit tests for the round-5 analysis tier: cusum_changepoint /
ewma_control (python-loop twins of the recursive definitions — proving
the window identities, not just cross-engine parity), woe_iv, cohens_d,
krippendorff_alpha (textbook hand case), cliffs_delta (brute-force pair
twin), sample_size_plan (closed form), best_split (brute-force
threshold sweep), anova_oneway, grubbs_outlier, tokenizer_fertility.
All integer twins use truncate-toward-zero div (Spark `div` ==
DuckDB `//`)."""

import math
from datetime import datetime

import pytest

from correctocr_spark.ops.temporal import cusum_changepoint, ewma_control
from correctocr_spark.ops.textstats import (
    anova_oneway,
    brown_forsythe,
    dunn_pairwise,
    kendall_tau,
    kruskal_wallis,
    best_split,
    cliffs_delta,
    cohens_d,
    grubbs_outlier,
    krippendorff_alpha,
    sample_size_plan,
    tokenizer_fertility,
    woe_iv,
)


def tdiv(a, b):
    q = abs(a) // abs(b)
    return q if (a < 0) == (b < 0) else -q


def _events(spark, counts_by_day, etype="view"):
    """counts_by_day: {epoch_day: n} -> events rows on those days."""
    rows = []
    i = 0
    for day, n in counts_by_day.items():
        for _ in range(n):
            ts = datetime.utcfromtimestamp(day * 86400 + 3600)
            rows.append((i, ts, etype))
            i += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string"
    )


class TestCusum:
    def test_matches_recursive_definition(self, spark):
        counts = {d: 10 for d in range(100, 110)}
        counts.update({d: 14 for d in range(110, 116)})  # level shift
        df = cusum_changepoint(_events(spark, counts), h_bp=10000)
        got = {
            r["epoch_day"]: (
                r["cusum_up_micro"],
                r["cusum_down_micro"],
                r["alarm"],
            )
            for r in df.collect()
        }
        xs = sorted(counts.items())
        k = tdiv(1_000_000 * sum(n for _, n in xs), len(xs))
        h = tdiv(10000 * k, 10000)
        s_up, s_dn = 0, 0
        for day, x in xs:
            d = 1_000_000 * x - k
            s_up = max(0, s_up + d)
            s_dn = max(0, s_dn - d)
            alarm = 1 if s_up > h else (-1 if s_dn > h else 0)
            assert got[day] == (s_up, s_dn, alarm), day
        # the shift must actually trip the up-alarm by the last day
        assert got[115][2] == 1

    def test_down_shift_and_validation(self, spark):
        counts = {d: 20 for d in range(50, 60)}
        counts.update({d: 12 for d in range(60, 70)})
        df = cusum_changepoint(_events(spark, counts), h_bp=20000)
        last = sorted(df.collect(), key=lambda r: r["epoch_day"])[-1]
        assert last["alarm"] == -1
        with pytest.raises(ValueError):
            cusum_changepoint(_events(spark, counts), h_bp=0)


class TestEwma:
    def test_matches_weighted_definition(self, spark):
        counts = {d: 5 + (d % 4) for d in range(200, 222)}
        df = ewma_control(_events(spark, counts))
        got = {
            r["epoch_day"]: (r["ewma_milli"], r["z_milli"])
            for r in df.collect()
        }
        days = sorted(counts)
        denom = 4**16 - 3**16
        expected_days = days[16:]
        assert sorted(got) == expected_days
        for t, day in enumerate(days):
            if t < 16:
                continue
            lags = [counts[days[t - i]] for i in range(1, 17)]
            num = sum(
                3 ** (i - 1) * 4 ** (16 - i) * lags[i - 1]
                for i in range(1, 17)
            )
            ewma = tdiv(1000 * num, denom)
            window = lags
            s, s2 = sum(window), sum(v * v for v in window)
            var = tdiv(16 * s2 - s * s, 256)
            std = max(int(math.floor(math.sqrt(var))), 1)
            dev = 1000 * counts[day] - ewma
            z = tdiv(dev, std) if dev >= 0 else -tdiv(-dev, std)
            assert got[day] == (ewma, z), day


class TestWoeIv:
    def test_hand_case(self, spark):
        rows = [("a", True)] * 8 + [("a", False)] * 2
        rows += [("b", True)] * 3 + [("b", False)] * 7
        df = spark.createDataFrame(rows, "f string, y boolean")
        got = {r["feature"]: r.asDict() for r in woe_iv(df, "f", "y").collect()}
        P, N, V = 11, 9, 2
        for feat, pos, neg in (("a", 8, 2), ("b", 3, 7)):
            pp = (pos + 1) / (P + V)
            pn = (neg + 1) / (N + V)
            w = math.log(pp) - math.log(pn)
            assert got[feat]["pos"] == pos and got[feat]["neg"] == neg
            assert got[feat]["woe_micro"] == math.floor(1_000_000 * w)
            assert got[feat]["iv_term_micro"] == math.floor(
                1_000_000 * (pp - pn) * w
            )
        assert (
            got["a"]["iv_total_micro"]
            == got["a"]["iv_term_micro"] + got["b"]["iv_term_micro"]
        )


class TestCohensD:
    def test_hand_case(self, spark):
        a, b = [10, 12, 14, 16], [20, 22, 24, 26, 28]
        df = spark.createDataFrame(
            [("a", v) for v in a] + [("b", v) for v in b], "g string, v long"
        )
        got = {r["grp"]: r.asDict() for r in cohens_d(df, "v", "g").collect()}

        def expect(x, y):
            n1, n2 = len(x), len(y)
            m1, m2 = sum(x) / n1, sum(y) / n2
            v1 = sum((v - m1) ** 2 for v in x) / (n1 - 1)
            v2 = sum((v - m2) ** 2 for v in y) / (n2 - 1)
            sp = math.sqrt(((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2))
            d = (m1 - m2) / sp
            g = d * (1 - 3 / (4 * (n1 + n2) - 9))
            return math.floor(1000 * d), math.floor(1000 * g)

        d_a, g_a = expect(a, b)
        assert got["a"]["d_milli"] == d_a and got["a"]["g_milli"] == g_a
        assert got["a"]["mean_micro"] == tdiv(1_000_000 * sum(a), len(a))
        # one-vs-rest symmetry for two groups: d_b = -d_a up to floor
        assert got["b"]["d_milli"] in (-d_a, -d_a - 1)

    def test_small_group_null(self, spark):
        df = spark.createDataFrame(
            [("a", 1), ("b", 5), ("b", 7), ("b", 9)], "g string, v long"
        )
        got = {r["grp"]: r["d_milli"] for r in cohens_d(df, "v", "g").collect()}
        assert got["a"] is None and got["b"] is None  # rest of b has n=1


class TestKrippendorff:
    def test_perfect_agreement(self, spark):
        rows = [(u, r, "x") for u in range(10) for r in ("r1", "r2", "r3")]
        df = spark.createDataFrame(rows, "u long, r string, v string")
        row = krippendorff_alpha(df, "u", "r", "v").collect()[0]
        assert row["o_micro"] == 0
        # single value class -> e_micro may be 0 for all-same data;
        # use a two-value perfect-agreement table instead for alpha=1
        rows = [(u, r, "x" if u % 2 else "y") for u in range(10)
                for r in ("r1", "r2", "r3")]
        df = spark.createDataFrame(rows, "u long, r string, v string")
        row = krippendorff_alpha(df, "u", "r", "v").collect()[0]
        assert row["o_micro"] == 0 and row["alpha_bp"] == 10000

    def test_hand_case_with_missing(self, spark):
        # units: u0 (3 raters agree), u1 (2-1 split), u2 (single rating
        # -> dropped), u3 (2 raters disagree)
        rows = (
            [(0, "r1", "a"), (0, "r2", "a"), (0, "r3", "a")]
            + [(1, "r1", "a"), (1, "r2", "a"), (1, "r3", "b")]
            + [(2, "r1", "a")]
            + [(3, "r1", "a"), (3, "r2", "b")]
        )
        df = spark.createDataFrame(rows, "u long, r string, v string")
        row = krippendorff_alpha(df, "u", "r", "v").collect()[0]
        assert row["n_units"] == 3 and row["n_ratings"] == 8
        # O = sum over units of 1e6*(m^2 - sum nc^2)/(m-1)
        o = tdiv(1_000_000 * (9 - 9), 2)
        o += tdiv(1_000_000 * (9 - 5), 2)
        o += tdiv(1_000_000 * (4 - 2), 1)
        assert row["o_micro"] == o
        # margins over kept units: a = 3+2+1 = 6, b = 1+1 = 2, n = 8
        e = tdiv(1_000_000 * (64 - 36 - 4), 7)
        assert row["e_micro"] == e
        assert row["alpha_bp"] == 10000 - tdiv(
            10000 * tdiv(o, 100), tdiv(e, 100)
        )


class TestCliffsDelta:
    def test_brute_force_twin(self, spark):
        a = [1, 3, 3, 5, 9]
        b = [2, 3, 4, 4, 6, 7]
        c = [1, 1, 8]
        data = [("a", v) for v in a] + [("b", v) for v in b] + [
            ("c", v) for v in c
        ]
        df = spark.createDataFrame(data, "g string, v long")
        got = {r["grp"]: r.asDict() for r in cliffs_delta(df, "v", "g").collect()}
        groups = {"a": a, "b": b, "c": c}
        for g, vals in groups.items():
            rest = [v for k, vs in groups.items() if k != g for v in vs]
            gt = sum(1 for x in vals for y in rest if x > y)
            lt = sum(1 for x in vals for y in rest if x < y)
            D = len(vals) * len(rest)
            assert got[g]["gt_pairs"] == gt, g
            assert got[g]["lt_pairs"] == lt, g
            assert got[g]["delta_milli"] == tdiv(1000 * gt, D) - tdiv(
                1000 * lt, D
            ), g


class TestSampleSize:
    def test_closed_form(self, spark):
        rows = [("a", True)] * 30 + [("a", False)] * 70
        rows += [("b", True)] * 50 + [("b", False)] * 50
        df = spark.createDataFrame(rows, "g string, y boolean")
        got = {
            r["grp"]: r["n_per_arm"]
            for r in sample_size_plan(df, "y", "g").collect()
        }
        za, zb = 1959964 / 1e6, 841621 / 1e6
        for g, pos, n, pos_r, n_r in (
            ("a", 30, 100, 50, 100),
            ("b", 50, 100, 30, 100),
        ):
            p1, p2 = pos / n, pos_r / n_r
            pbar = (pos + pos_r) / (n + n_r)
            num = za * math.sqrt(2 * pbar * (1 - pbar)) + zb * math.sqrt(
                p1 * (1 - p1) + p2 * (1 - p2)
            )
            exp = math.ceil(num * num / ((p1 - p2) ** 2))
            assert got[g] == exp

    def test_no_lift_null(self, spark):
        rows = [("a", True), ("a", False), ("b", True), ("b", False)]
        df = spark.createDataFrame(rows, "g string, y boolean")
        got = {
            r["grp"]: r["n_per_arm"]
            for r in sample_size_plan(df, "y", "g").collect()
        }
        assert got["a"] is None and got["b"] is None


class TestBestSplit:
    def test_brute_force_twin(self, spark):
        data = [(v, v >= 5) for v in (1, 2, 2, 3, 5, 6, 7, 7, 9, 4)]
        df = spark.createDataFrame(data, "v long, y boolean")
        row = best_split(df, "v", "y").collect()[0]
        vals = sorted(set(v for v, _ in data))
        best = None
        for t in vals[:-1]:
            pl = sum(1 for v, y in data if v <= t and y)
            nl = sum(1 for v, y in data if v <= t and not y)
            pr = sum(1 for v, y in data if v > t and y)
            nr = sum(1 for v, y in data if v > t and not y)
            ml, mr, m = pl + nl, pr + nr, len(data)
            imp = (ml * ml - pl * pl - nl * nl) / (m * ml) + (
                mr * mr - pr * pr - nr * nr
            ) / (m * mr)
            key = (math.floor(1_000_000 * imp), t)
            if best is None or key < best:
                best = key
        assert (row["impurity_micro"], row["threshold"]) == best
        # the label is perfectly separable at v <= 4
        assert row["threshold"] == 4 and row["impurity_micro"] == 0


class TestAnova:
    def test_hand_case(self, spark):
        groups = {"a": [1, 2, 3], "b": [4, 5, 6], "c": [9, 9, 9, 9]}
        data = [(g, v) for g, vs in groups.items() for v in vs]
        df = spark.createDataFrame(data, "g string, v long")
        row = anova_oneway(df, "v", "g").collect()[0]
        ssb_sum = sum(
            math.floor(1e6 * sum(vs) ** 2 / len(vs)) for vs in groups.values()
        )
        ssw = sum(
            math.floor(1e6 * (sum(v * v for v in vs) - sum(vs) ** 2 / len(vs)))
            for vs in groups.values()
        )
        ts = sum(sum(vs) for vs in groups.values())
        n = sum(len(vs) for vs in groups.values())
        ssb = ssb_sum - math.floor(1e6 * ts * ts / n)
        k = 3
        f = math.floor(1000 * (ssb / (k - 1)) / (ssw / (n - k)))
        assert (row["ssb_micro"], row["ssw_micro"], row["f_milli"]) == (
            ssb,
            ssw,
            f,
        )

    def test_zero_within_null(self, spark):
        df = spark.createDataFrame(
            [("a", 5), ("a", 5), ("b", 7), ("b", 7)], "g string, v long"
        )
        assert anova_oneway(df, "v", "g").collect()[0]["f_milli"] is None


class TestGrubbs:
    def test_hand_case_and_tie(self, spark):
        # 8 is the outlier; 0 and 8 tie on |dev| would prefer smaller v
        vals = [4, 4, 4, 4, 8]
        df = spark.createDataFrame(
            [("g", v) for v in vals], "g string, v long"
        )
        row = grubbs_outlier(df, "v", "g").collect()[0]
        n, s = len(vals), sum(vals)
        s2 = sum(v * v for v in vals)
        dev = max(abs(n * v - s) for v in vals)
        sd = math.sqrt((n * s2 - s * s) / (n * (n - 1)))
        assert row["outlier_value"] == 8 and row["dev_scaled"] == dev
        assert row["g_milli"] == math.floor(1000 * (dev / n) / sd)
        # symmetric data: tie broken toward the smaller value
        df = spark.createDataFrame(
            [("g", v) for v in (0, 4, 8)], "g string, v long"
        )
        assert grubbs_outlier(df, "v", "g").collect()[0]["outlier_value"] == 0

    def test_zero_variance_null(self, spark):
        df = spark.createDataFrame(
            [("g", 3), ("g", 3), ("g", 3)], "g string, v long"
        )
        assert grubbs_outlier(df, "v", "g").collect()[0]["g_milli"] is None


class TestFertility:
    def test_hand_counts(self, spark):
        df = spark.createDataFrame(
            [
                ("en", "hello world"),
                ("en", "it's a test-case"),
                ("de", "donaudampfschiff 42!"),
            ],
            "lang string, text string",
        )
        got = {
            r["grp"]: r.asDict()
            for r in tokenizer_fertility(df, "lang", "text").collect()
        }
        # en: words 2+3=5; subtokens: [hello, world]=2 +
        # [it, ', s, a, test, -, case]=7 -> 9
        assert got["en"]["words"] == 5 and got["en"]["subtokens"] == 9
        assert got["en"]["fertility_milli"] == tdiv(1000 * 9, 5)
        # de: words 2; subtokens [donaudampfschiff, 42, !] = 3
        assert got["de"]["subtokens"] == 3
        chars = len("donaudampfschiff 42!")
        assert got["de"]["chars_per_subtoken_milli"] == tdiv(1000 * chars, 3)


class TestKruskalWallis:
    @staticmethod
    def _twin(pairs):
        """Brute-force twin: classic midrank KW with tie correction,
        quantized exactly like the op (per-group micro term, one
        milli-floor)."""
        vals = {}
        for _, v in pairs:
            vals[v] = vals.get(v, 0) + 1
        cum, dr = 0, {}
        for v in sorted(vals):
            cum += vals[v]
            dr[v] = 2 * cum - vals[v] + 1
        groups = {}
        for g, v in pairs:
            n, s2 = groups.get(g, (0, 0))
            groups[g] = (n + 1, s2 + dr[v])
        term = sum(
            math.floor(1000000.0 * (float(s2) * s2 / (4.0 * n)))
            for n, s2 in groups.values()
        )
        tie = sum(c * c * c - c for c in vals.values())
        n = len(pairs)
        k = len(groups)
        h = 12.0 * (term / 1000000.0) / (float(n) * (n + 1)) - 3.0 * (n + 1)
        c = 1.0 - tie / (float(n) * n * n - n)
        h_milli = (
            math.floor(1000.0 * h / c)
            if k >= 2 and n >= 2 and c > 0
            else None
        )
        return k, n, tie, term, h_milli

    def test_matches_twin_with_ties(self, spark):
        pairs = (
            [("a", v) for v in [1, 2, 2, 3, 7]]
            + [("b", v) for v in [2, 5, 5, 9]]
            + [("c", v) for v in [1, 1, 8, 8, 8, 10]]
        )
        df = spark.createDataFrame(pairs, "g string, v long")
        row = kruskal_wallis(df, "v", "g").collect()[0]
        assert (
            row["k"],
            row["n"],
            row["tie_sum"],
            row["rank_term_micro"],
            row["h_milli"],
        ) == self._twin(pairs)
        # and the doubled midranks really are the textbook midranks:
        # scipy-free sanity on the untied permutation
        assert row["h_milli"] is not None and row["h_milli"] > 0

    def test_all_tied_null(self, spark):
        df = spark.createDataFrame(
            [("a", 5), ("a", 5), ("b", 5)], "g string, v long"
        )
        assert kruskal_wallis(df, "v", "g").collect()[0]["h_milli"] is None

    def test_identical_distributions_small_h(self, spark):
        pairs = [("a", v) for v in range(1, 21)] + [
            ("b", v) for v in range(1, 21)
        ]
        df = spark.createDataFrame(pairs, "g string, v long")
        row = kruskal_wallis(df, "v", "g").collect()[0]
        assert row["h_milli"] == 0  # exactly equal rank sums -> H = 0


class TestBrownForsythe:
    @staticmethod
    def _twin(groups):
        """Medians by order statistics, then the ANOVA twin on
        z = |2x − 2·med|, exactly as quantized by the op."""
        zs = {}
        for g, vs in groups.items():
            sv = sorted(vs)
            n = len(sv)
            dm = sv[(n + 1) // 2 - 1] + sv[n // 2 + 1 - 1]
            zs[g] = [abs(2 * v - dm) for v in vs]
        ssb_sum = sum(
            math.floor(1e6 * (float(sum(z)) * sum(z) / len(z)))
            for z in zs.values()
        )
        ssw = sum(
            math.floor(
                1e6
                * (sum(v * v for v in z) - float(sum(z)) * sum(z) / len(z))
            )
            for z in zs.values()
        )
        ts = sum(sum(z) for z in zs.values())
        n = sum(len(z) for z in zs.values())
        k = len(zs)
        ssb = ssb_sum - math.floor(1e6 * (float(ts) * ts / n))
        w = (
            math.floor(1000.0 * (ssb / (k - 1)) / (ssw / (n - k)))
            if k >= 2 and n > k and ssw > 0
            else None
        )
        return k, n, ssb, ssw, w

    def test_matches_twin_odd_even(self, spark):
        groups = {
            "a": [1, 3, 9, 20],  # even n: dbl_med = 3 + 9
            "b": [2, 2, 7],  # odd n: dbl_med = 2 + 2
            "c": [5, 6, 6, 8, 40],  # odd with ties
        }
        data = [(g, v) for g, vs in groups.items() for v in vs]
        df = spark.createDataFrame(data, "g string, v long")
        row = brown_forsythe(df, "v", "g").collect()[0]
        assert (
            row["k"],
            row["n"],
            row["ssb_micro"],
            row["ssw_micro"],
            row["w_milli"],
        ) == self._twin(groups)

    def test_equal_spread_zero_w(self, spark):
        # two groups, different centers, identical spread around median
        groups = {"a": [10, 20, 30], "b": [110, 120, 130]}
        data = [(g, v) for g, vs in groups.items() for v in vs]
        df = spark.createDataFrame(data, "g string, v long")
        row = brown_forsythe(df, "v", "g").collect()[0]
        assert row["w_milli"] == 0  # z-distributions identical


class TestCochranQ:
    def test_hand_case(self, spark):
        # 6 docs x 3 gates, mixed agreement
        rows = [
            (1, 1, 0),
            (1, 0, 0),
            (1, 1, 1),
            (0, 0, 0),
            (1, 0, 1),
            (1, 1, 0),
        ]
        df = spark.createDataFrame(rows, "g1 long, g2 long, g3 long")
        from correctocr_spark.ops.textstats import cochran_q

        row = cochran_q(df, ["g1", "g2", "g3"]).collect()[0]
        k = 3
        ls = [sum(r) for r in rows]
        gs = [sum(r[j] for r in rows) for j in range(3)]
        t = sum(ls)
        sum_l2 = sum(x * x for x in ls)
        sum_g2 = sum(x * x for x in gs)
        q = math.floor(
            1000.0 * (k - 1) * float(k * sum_g2 - t * t) / (k * t - sum_l2)
        )
        assert (
            row["k"],
            row["n"],
            row["t"],
            row["sum_g2"],
            row["sum_l2"],
            row["q_milli"],
        ) == (3, 6, t, sum_g2, sum_l2, q)

    def test_unanimous_rows_null(self, spark):
        rows = [(1, 1, 1), (0, 0, 0), (1, 1, 1)]
        df = spark.createDataFrame(rows, "g1 long, g2 long, g3 long")
        from correctocr_spark.ops.textstats import cochran_q

        assert cochran_q(df, ["g1", "g2", "g3"]).collect()[0][
            "q_milli"
        ] is None

    def test_reduces_to_mcnemar_shape_at_k2(self, spark):
        # k=2: Q = (b-c)^2/(b+c) — the McNemar statistic
        rows = [(1, 0)] * 5 + [(0, 1)] * 2 + [(1, 1)] * 3 + [(0, 0)] * 4
        df = spark.createDataFrame(rows, "g1 long, g2 long")
        from correctocr_spark.ops.textstats import cochran_q

        row = cochran_q(df, ["g1", "g2"]).collect()[0]
        b, c = 5, 2
        assert row["q_milli"] == math.floor(1000.0 * (b - c) ** 2 / (b + c))

    def test_k1_raises(self, spark):
        from correctocr_spark.ops.textstats import cochran_q

        df = spark.createDataFrame([(1,)], "g1 long")
        with pytest.raises(ValueError):
            cochran_q(df, ["g1"])


class TestDunnPairwise:
    def test_matches_twin(self, spark):
        pairs = (
            [("a", v) for v in [1, 2, 2, 3, 7, 11]]
            + [("b", v) for v in [2, 5, 5, 9]]
            + [("c", v) for v in [1, 1, 8, 8, 8, 10, 30]]
        )
        df = spark.createDataFrame(pairs, "g string, v long")
        got = {
            (r["grp_a"], r["grp_b"]): (r["n_a"], r["n_b"], r["z_milli"])
            for r in dunn_pairwise(df, "v", "g").collect()
        }
        # twin: textbook midranks (1-based average ranks)
        vals = {}
        for _, v in pairs:
            vals[v] = vals.get(v, 0) + 1
        cum, dr = 0, {}
        for v in sorted(vals):
            cum += vals[v]
            dr[v] = 2 * cum - vals[v] + 1  # doubled midrank
        groups = {}
        for g, v in pairs:
            n, s2 = groups.get(g, (0, 0))
            groups[g] = (n + 1, s2 + dr[v])
        n = len(pairs)
        tie = sum(c * c * c - c for c in vals.values())
        var = float(n) * (n + 1) / 12.0 - float(tie) / (12.0 * (n - 1))
        keys = sorted(groups)
        assert len(got) == len(keys) * (len(keys) - 1) // 2
        for i, u in enumerate(keys):
            for w_ in keys[i + 1:]:
                nu, su = groups[u]
                nv, sv = groups[w_]
                z = math.floor(
                    1000.0
                    * (float(su) / (2.0 * nu) - float(sv) / (2.0 * nv))
                    / math.sqrt(var * (1.0 / nu + 1.0 / nv))
                )
                assert got[(u, w_)] == (nu, nv, z), (u, w_)

    def test_all_tied_null(self, spark):
        df = spark.createDataFrame(
            [("a", 4), ("a", 4), ("b", 4), ("b", 4)], "g string, v long"
        )
        rows = dunn_pairwise(df, "v", "g").collect()
        assert len(rows) == 1 and rows[0]["z_milli"] is None


class TestKendallTau:
    @staticmethod
    def _twin(xy):
        blen = lambda v: len(bin(v)) - 2 if v > 0 else 1  # len(bin()) twin
        b = [(blen(x), blen(y)) for x, y in xy]
        n = len(b)
        conc = disc = 0
        for i in range(n):
            for j in range(i + 1, n):
                dx = (b[i][0] > b[j][0]) - (b[i][0] < b[j][0])
                dy = (b[i][1] > b[j][1]) - (b[i][1] < b[j][1])
                if dx * dy > 0:
                    conc += 1
                elif dx * dy < 0:
                    disc += 1
        n0 = n * (n - 1) // 2
        from collections import Counter

        tx = sum(
            t * (t - 1) // 2 for t in Counter(p[0] for p in b).values()
        )
        ty = sum(
            t * (t - 1) // 2 for t in Counter(p[1] for p in b).values()
        )
        tau = (
            math.floor(
                1000.0 * (conc - disc)
                / math.sqrt(float(n0 - tx) * (n0 - ty))
            )
            if n0 > tx and n0 > ty
            else None
        )
        return n, n0, conc, disc, tx, ty, tau

    def test_matches_brute_force(self, spark):
        xy = [
            (3, 1), (8, 2), (17, 4), (300, 60), (1023, 200),
            (2, 9), (40, 3), (5000, 900), (7, 7), (128, 32),
            (1, 1), (64, 1), (9000, 2000), (12, 2), (700, 150),
        ]
        df = spark.createDataFrame(xy, "x long, y long")
        r = kendall_tau(df, "x", "y").collect()[0]
        assert (
            r["n"], r["n0"], r["concordant"], r["discordant"],
            r["ties_x"], r["ties_y"], r["tau_milli"],
        ) == self._twin(xy)

    def test_perfect_monotone_tau_1000(self, spark):
        # strictly increasing across DISTINCT bit lengths -> tau = 1
        xy = [(1, 2), (2, 4), (4, 8), (8, 16), (16, 32)]
        df = spark.createDataFrame(xy, "x long, y long")
        assert kendall_tau(df, "x", "y").collect()[0]["tau_milli"] == 1000

    def test_degenerate_margin_null(self, spark):
        # all x in one bit-length bin -> n0 == ties_x -> NULL
        xy = [(4, 1), (5, 200), (6, 3), (7, 4000)]
        df = spark.createDataFrame(xy, "x long, y long")
        assert kendall_tau(df, "x", "y").collect()[0]["tau_milli"] is None
