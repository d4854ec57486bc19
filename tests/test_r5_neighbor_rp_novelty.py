"""Session probes for neighbor_sample, rp_project/rp_signs and
novelty_curve — driver-side simulations on hand-sized inputs plus the
determinism / plan-shape lemmas the DuckDB oracle can't see (it checks
one fixture; these check the claims the docstrings make: retry-stable
hash ordering, Exchange-free projection, zero-novelty buckets kept)."""

import hashlib

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# neighbor_sample
# ---------------------------------------------------------------------------


def _nbr_hash(salt, src, dst):
    return int(hashlib.md5(f"{salt}|{src}|{dst}".encode()).hexdigest()[:8], 16)


def _nbr_simulate(edges, k, salt="nbr"):
    adj = {}
    for s, d in set(edges):
        adj.setdefault(s, []).append(d)
    out = {}
    for s, ds in adj.items():
        ds.sort(key=lambda d: (_nbr_hash(salt, s, d), d))
        out[s] = [(d, i + 1) for i, d in enumerate(ds[:k])]
    return out


class TestNeighborSample:
    EDGES = (
        [("a", f"d{i}") for i in range(10)]
        + [("b", "d1"), ("b", "d2")]
        + [("a", "d1")]  # duplicate edge collapses before ranking
    )

    def test_matches_simulation(self, spark):
        from correctocr_spark.ops.graph import neighbor_sample

        df = spark.createDataFrame(self.EDGES, "src string, dst string")
        got = {}
        for r in neighbor_sample(df, k=3).collect():
            got.setdefault(r["src"], []).append((r["dst"], r["rnk"]))
        for s in got:
            got[s].sort(key=lambda t: t[1])
        assert got == _nbr_simulate(self.EDGES, 3)
        # b has only 2 distinct neighbors: both kept, rnk 1..2
        assert len(got["b"]) == 2
        assert [r for _, r in got["a"]] == [1, 2, 3]

    def test_partitioning_invariant(self, spark):
        from correctocr_spark.ops.graph import neighbor_sample

        df = spark.createDataFrame(self.EDGES, "src string, dst string")
        a = sorted(map(tuple, neighbor_sample(df, k=4).collect()))
        b = sorted(
            map(tuple, neighbor_sample(df.repartition(7), k=4).collect())
        )
        assert a == b

    def test_salt_varies_sample_not_size(self, spark):
        from correctocr_spark.ops.graph import neighbor_sample

        # 40 neighbors, k=5: two salts agree on count, differ on picks
        edges = [("s", f"n{i:02d}") for i in range(40)]
        df = spark.createDataFrame(edges, "src string, dst string")
        s1 = {r["dst"] for r in neighbor_sample(df, k=5, salt="e1").collect()}
        s2 = {r["dst"] for r in neighbor_sample(df, k=5, salt="e2").collect()}
        assert len(s1) == len(s2) == 5
        assert s1 != s2
        assert s1 == {d for d, _ in _nbr_simulate(edges, 5, salt="e1")["s"]}

    def test_window_group_limit_plan(self, spark):
        from correctocr_spark.ops.graph import neighbor_sample

        df = spark.createDataFrame(self.EDGES, "src string, dst string")
        plan = neighbor_sample(df, k=3)._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan

    def test_k_validation(self, spark):
        from correctocr_spark.ops.graph import neighbor_sample

        df = spark.createDataFrame(self.EDGES, "src string, dst string")
        with pytest.raises(ValueError, match="k >= 1"):
            neighbor_sample(df, k=0)


# ---------------------------------------------------------------------------
# rp_project / rp_signs
# ---------------------------------------------------------------------------


class TestRpProject:
    def test_signs_derivation(self):
        from correctocr_spark.ops.similarity import rp_signs

        signs = rp_signs(3, 2, salt="t")
        assert len(signs) == 2 and all(len(row) == 3 for row in signs)
        for j in range(2):
            for i in range(3):
                h = int(hashlib.md5(f"t|{j}|{i}".encode()).hexdigest()[:8], 16)
                assert signs[j][i] == (1 if h % 2 == 0 else -1)

    def test_matches_numpy(self, spark):
        import numpy as np

        from correctocr_spark.ops.similarity import rp_project, rp_signs

        vecs = [
            (0, [0.5, -0.25, 0.125, 1.0]),
            (1, [-1.5, 0.0, 2.0, -0.0625]),
            (2, [0.0, 0.0, 0.0, 0.0]),
        ]
        df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
        got = {
            r["vec_id"]: r["proj"]
            for r in rp_project(df, dim_in=4, dim_out=3).collect()
        }
        S = np.array(rp_signs(4, 3), dtype=np.int64)
        for vid, v in vecs:
            q = np.round(np.array(v, dtype=np.float64) * 1_000_000).astype(
                np.int64
            )
            assert got[vid] == list(S @ q)
        assert got[2] == [0, 0, 0]

    def test_exchange_free_plan(self, spark):
        from correctocr_spark.ops.similarity import rp_project

        df = spark.createDataFrame(
            [(0, [0.1] * 8)], "vec_id long, embedding array<float>"
        )
        plan = (
            rp_project(df, dim_in=8, dim_out=2)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan

    def test_dim_validation(self, spark):
        from correctocr_spark.ops.similarity import rp_project

        df = spark.createDataFrame(
            [(0, [0.1])], "vec_id long, embedding array<float>"
        )
        with pytest.raises(ValueError, match="dim_in/dim_out"):
            rp_project(df, dim_in=0, dim_out=2)


# ---------------------------------------------------------------------------
# novelty_curve
# ---------------------------------------------------------------------------


def _curve_simulate(docs, bucket_size, k=3):
    # mirrors shingles_col: whitespace words, and a doc SHORTER than k
    # words still yields one whole-doc shingle (sequence(0, greatest(
    # size-k, 0)) always has at least index 0)
    first = {}
    n_docs = {}
    for did, text in sorted(docs):
        n_docs[did // bucket_size] = n_docs.get(did // bucket_size, 0) + 1
        words = [w for w in text.split() if w]
        for i in range(max(len(words) - k, 0) + 1):
            sh = " ".join(words[i : i + k])
            if sh and sh not in first:
                first[sh] = did
    new = {}
    for did in first.values():
        new[did // bucket_size] = new.get(did // bucket_size, 0) + 1
    out, cum = [], 0
    for b in sorted(n_docs):
        cum += new.get(b, 0)
        out.append((b, n_docs[b], new.get(b, 0), cum))
    return out


class TestNoveltyCurve:
    DOCS = [
        (0, "alpha beta gamma delta"),
        (1, "alpha beta gamma"),  # fully redundant vs doc 0
        (2, "epsilon zeta eta theta"),
        (3, "alpha beta gamma delta"),  # bucket 1, zero novelty
        (4, "iota kappa lambda"),
        (5, "epsilon zeta eta"),  # bucket 2, zero novelty
    ]

    def _df(self, spark):
        return spark.createDataFrame(self.DOCS, "doc_id long, text string")

    def test_matches_simulation(self, spark):
        from correctocr_spark.ops.textstats import novelty_curve

        got = [
            (r["bucket"], r["n_docs"], r["new_shingles"], r["cum_shingles"])
            for r in novelty_curve(self._df(spark), bucket_size=2)
            .orderBy("bucket")
            .collect()
        ]
        assert got == _curve_simulate(self.DOCS, 2)

    def test_zero_novelty_bucket_survives(self, spark):
        from correctocr_spark.ops.textstats import novelty_curve

        # all of doc 1's shingles were introduced by doc 0 — with
        # bucket_size=1 doc 1's bucket must still appear, at zero new
        rows = {
            r["bucket"]: r
            for r in novelty_curve(self._df(spark), bucket_size=1).collect()
        }
        assert rows[1]["new_shingles"] == 0
        assert rows[1]["n_docs"] == 1
        assert rows[1]["cum_shingles"] == rows[0]["cum_shingles"]

    def test_cumulative_is_total_distinct(self, spark):
        from correctocr_spark.ops.textstats import novelty_curve

        df = self._df(spark)
        last = (
            novelty_curve(df, bucket_size=4)
            .orderBy(F.desc("bucket"))
            .first()
        )
        from correctocr_spark.ops.dedup import shingles_col

        total = (
            df.select(F.explode(shingles_col("text", k=3)).alias("sh"))
            .distinct()
            .count()
        )
        assert last["cum_shingles"] == total

    def test_validation(self, spark):
        from correctocr_spark.ops.textstats import novelty_curve

        with pytest.raises(ValueError, match="bucket_size >= 1"):
            novelty_curve(self._df(spark), bucket_size=0)
        with pytest.raises(ValueError, match="k >= 1"):
            novelty_curve(self._df(spark), bucket_size=2, k=0)
