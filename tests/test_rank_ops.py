"""rank_agreement (hand Spearman with ties via fractions, perfect /
inverted / constant columns) and percentile_normalize (hand mid-rank
percentiles, tie sharing, per-group independence)."""

from fractions import Fraction

from pyspark.sql import functions as F

from correctocr_spark.ops.textstats import percentile_normalize, rank_agreement


def _spearman_milli(xs, ys):
    """Exact reference: Pearson on average ranks, truncated to milli."""
    def avg_ranks(vs):
        order = sorted(set(vs))
        out = {}
        below = 0
        for v in order:
            t = vs.count(v)
            out[v] = Fraction(2 * below + t + 1, 2)
            below += t
        return [out[v] for v in vs]

    rx, ry = avg_ranks(xs), avg_ranks(ys)
    n = len(xs)
    sx, sy = sum(rx), sum(ry)
    sxx = sum(r * r for r in rx)
    syy = sum(r * r for r in ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    num = n * sxy - sx * sy
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    if vx == 0 or vy == 0:
        return None
    import math

    # the op works in half-ranks: num and each var scale by 4
    # uniformly; replicate its single-sqrt-of-the-product + clamp form
    denom = math.floor(math.sqrt(float(vx * 4 * vy * 4)))
    scaled = num * 4
    sign = -1 if scaled < 0 else 1
    return sign * min(1000, (1000 * abs(scaled)) // denom)


class TestRankAgreement:
    def _run(self, spark, xs, ys):
        df = spark.createDataFrame(list(zip(xs, ys)), "x long, y long")
        return rank_agreement(df, "x", "y").first()

    def test_perfect_agreement(self, spark):
        r = self._run(spark, [1, 2, 3, 4, 5], [10, 20, 30, 40, 50])
        assert r["rho_milli"] == 1000 and r["n_rows"] == 5

    def test_perfect_inversion(self, spark):
        r = self._run(spark, [1, 2, 3, 4, 5], [50, 40, 30, 20, 10])
        assert r["rho_milli"] == -1000

    def test_hand_simulated_with_ties(self, spark):
        xs = [1, 1, 2, 3, 3, 3, 4, 9]
        ys = [5, 7, 5, 8, 8, 2, 9, 9]
        r = self._run(spark, xs, ys)
        assert r["rho_milli"] == _spearman_milli(xs, ys)

    def test_constant_column_null(self, spark):
        r = self._run(spark, [7, 7, 7], [1, 2, 3])
        assert r["rho_milli"] is None and r["n_rows"] == 3

    def test_nulls_dropped(self, spark):
        df = spark.createDataFrame(
            [(1, 10), (2, None), (None, 30), (4, 40)], "x long, y long"
        )
        r = rank_agreement(df, "x", "y").first()
        assert r["n_rows"] == 2 and r["rho_milli"] == 1000


class TestPercentileNormalize:
    def test_hand_midrank(self, spark):
        # group g: scores [10, 10, 20, 30] → mid-rank bp:
        #   10: (0*2+2)*10000 // 8 = 2500 (shared by both)
        #   20: (2*2+1)*10000 // 8 = 6250
        #   30: (3*2+1)*10000 // 8 = 8750
        rows = [(1, "g", 10), (2, "g", 10), (3, "g", 20), (4, "g", 30)]
        df = spark.createDataFrame(rows, "doc_id long, grp string, score long")
        got = {
            r["doc_id"]: r["pct_bp"]
            for r in percentile_normalize(df, "grp", "score").collect()
        }
        assert got == {1: 2500, 2: 2500, 3: 6250, 4: 8750}

    def test_groups_independent(self, spark):
        # the same raw score lands at different percentiles per group
        rows = [(1, "a", 5), (2, "a", 9), (3, "b", 5), (4, "b", 1)]
        df = spark.createDataFrame(rows, "doc_id long, grp string, score long")
        got = {
            r["doc_id"]: r["pct_bp"]
            for r in percentile_normalize(df, "grp", "score").collect()
        }
        assert got[1] == 2500 and got[3] == 7500  # score 5: low in a, high in b

    def test_extremes_never_collapse(self, spark):
        rows = [(i, "g", i) for i in range(1, 6)]
        df = spark.createDataFrame(rows, "doc_id long, grp string, score long")
        vals = [
            r["pct_bp"]
            for r in percentile_normalize(df, "grp", "score").collect()
        ]
        assert min(vals) > 0 and max(vals) < 10000
