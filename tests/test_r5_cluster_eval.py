"""Unit tests for the cluster-eval batch: cluster_quality
(numpy definition twin for simplified silhouette + Davies-Bouldin,
tight-vs-loose ordering), cluster_purity_nmi (contingency twin,
perfect/degenerate cases), assignment_margins (numpy twin, thin-share
semantics)."""

import math

import numpy as np
import pytest

from correctocr_spark.ops.similarity import (
    assignment_margins,
    cluster_purity_nmi,
    cluster_quality,
)

CENTROIDS = [[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]]

VECS = [
    (0, [0.5, 0.2]), (1, [-0.3, 0.1]), (2, [0.1, -0.4]),   # cluster 0
    (3, [9.5, 0.3]), (4, [10.4, -0.2]),                     # cluster 1
    (5, [0.2, 9.1]), (6, [-0.1, 10.8]), (7, [0.4, 9.9]),    # cluster 2
]


def _emb_df(spark, vecs=VECS):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs],
        "vec_id long, embedding array<double>",
    )


def _twin_rows(vecs=VECS, cents=CENTROIDS):
    rows = {}
    for _, v in vecs:
        d = [
            math.sqrt(sum((a - b) * (a - b) for a, b in zip(v, c)))
            for c in cents
        ]
        sq = [sum((a - b) * (a - b) for a, b in zip(v, c)) for c in cents]
        cid = min(range(len(cents)), key=lambda i: (sq[i], i))
        a = d[cid]
        b = min(d[j] for j in range(len(cents)) if j != cid)
        rows.setdefault(cid, []).append((a, b))
    return rows


class TestClusterQuality:
    def test_matches_numpy_twin(self, spark):
        out = {
            r["centroid_id"]: r
            for r in cluster_quality(_emb_df(spark), CENTROIDS).collect()
        }
        rows = _twin_rows()
        scat = {}
        for cid, abs_ in rows.items():
            n = len(abs_)
            sa = sum(math.floor(1e6 * a) for a, _ in abs_)
            ss = sum(
                math.floor(1e6 * (b - a) / max(a, b)) for a, b in abs_
            )
            scat[cid] = sa // n
            r = out[cid]
            assert r["n"] == n
            assert r["scatter_milli"] == (sa // n) // 1000
            assert r["silhouette_milli"] == (ss // n) // 1000
        for cid in rows:
            db = max(
                math.floor(
                    1000.0 * (scat[cid] + scat[j]) / 1e6
                    / math.sqrt(
                        sum(
                            (a - b) * (a - b)
                            for a, b in zip(CENTROIDS[cid], CENTROIDS[j])
                        )
                    )
                )
                for j in rows
                if j != cid
            )
            assert out[cid]["db_milli"] == db

    def test_tight_clusters_high_silhouette(self, spark):
        out = cluster_quality(_emb_df(spark), CENTROIDS).collect()
        # separation 10 vs scatter <1: silhouette near 1, DB near 0
        assert all(r["silhouette_milli"] > 850 for r in out)
        assert all(r["db_milli"] < 200 for r in out)

    def test_loose_clusters_degrade(self, spark):
        loose = [(i, [x * 8 for x in v]) for i, v in VECS]
        tight = {
            r["centroid_id"]: r["silhouette_milli"]
            for r in cluster_quality(_emb_df(spark), CENTROIDS).collect()
        }
        worse = {
            r["centroid_id"]: r["silhouette_milli"]
            for r in cluster_quality(
                _emb_df(spark, loose), CENTROIDS
            ).collect()
        }
        assert sum(worse.values()) < sum(tight.values())
        with pytest.raises(ValueError):
            cluster_quality(_emb_df(spark), [CENTROIDS[0]])


class TestClusterPurity:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "c long, l string")

    def test_matches_contingency_twin(self, spark):
        rows = [
            (0, "x"), (0, "x"), (0, "y"),
            (1, "y"), (1, "y"), (1, "y"), (1, "x"),
            (2, "z"), (2, "z"),
        ]
        r = cluster_purity_nmi(self._df(spark, rows), "c", "l").collect()[0]
        from collections import Counter

        cells = Counter(rows)
        N = len(rows)
        cm = Counter(c for c, _ in rows)
        lm = Counter(l for _, l in rows)
        pure = sum(
            max(v for (c2, _), v in cells.items() if c2 == c)
            for c in cm
        )
        mi = sum(
            math.floor(
                1e6 * (v / N) * math.log(v * N / (cm[c] * lm[l]))
            )
            for (c, l), v in cells.items()
        )
        hc = sum(
            math.floor(1e6 * (v / N) * (math.log(N) - math.log(v)))
            for v in cm.values()
        )
        hl = sum(
            math.floor(1e6 * (v / N) * (math.log(N) - math.log(v)))
            for v in lm.values()
        )
        assert r["purity_ppm"] == (1000000 * pure) // N
        assert (r["mi_micro"], r["h_cluster_micro"], r["h_label_micro"]) \
            == (mi, hc, hl)
        assert r["nmi_milli"] == math.floor(1000.0 * 2.0 * mi / (hc + hl))

    def test_perfect_clustering(self, spark):
        rows = [(0, "x")] * 3 + [(1, "y")] * 4 + [(2, "z")] * 2
        r = cluster_purity_nmi(self._df(spark, rows), "c", "l").collect()[0]
        assert r["purity_ppm"] == 1000000
        assert r["nmi_milli"] in (999, 1000)  # per-term floor dust

    def test_single_cluster_single_label_null(self, spark):
        rows = [(0, "x")] * 4
        r = cluster_purity_nmi(self._df(spark, rows), "c", "l").collect()[0]
        assert r["nmi_milli"] is None


class TestAssignmentMargins:
    def test_matches_numpy_twin(self, spark):
        out = {
            r["centroid_id"]: r
            for r in assignment_margins(
                _emb_df(spark), CENTROIDS
            ).collect()
        }
        rows = _twin_rows()
        for cid, abs_ in rows.items():
            n = len(abs_)
            mm = [math.floor(1e6 * (b - a)) for a, b in abs_]
            d1 = [math.floor(1e6 * a) for a, _ in abs_]
            r = out[cid]
            assert r["n"] == n
            assert r["mean_margin_milli"] == (sum(mm) // n) // 1000
            assert r["min_margin_micro"] == min(mm)
            thin = sum(1 for m, d in zip(mm, d1) if 10 * m < d)
            assert r["thin_ppm"] == (1000000 * thin) // n

    def test_ambiguous_vector_thins(self, spark):
        """A vector halfway between two centroids has ~zero margin."""
        vecs = VECS + [(99, [5.0, 0.01])]
        out = {
            r["centroid_id"]: r
            for r in assignment_margins(
                _emb_df(spark, vecs), CENTROIDS
            ).collect()
        }
        hit = [r for r in out.values() if r["thin_ppm"] > 0]
        assert len(hit) == 1 and hit[0]["min_margin_micro"] < 50_000
        with pytest.raises(ValueError):
            assignment_margins(_emb_df(spark), [CENTROIDS[0]])
