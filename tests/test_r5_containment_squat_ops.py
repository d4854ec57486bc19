"""Session probes for reciprocal_links, typosquat_pairs and the
containment prefix-filter chain — driver-side simulations on hand-sized
inputs plus a seeded-corpus completeness sweep the oracle can't see
(the oracle checks one fixture; these check the candidate lemma)."""

import random

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# reciprocal_links
# ---------------------------------------------------------------------------


def _recip_simulate(edges):
    e = {(s, d) for s, d in edges if s != d}
    out = {}
    for s in {s for s, _ in e}:
        outs = {d for (s2, d) in e if s2 == s}
        mut = {d for d in outs if (d, s) in e}
        out[s] = (len(outs), len(mut), len(mut) * 10000 // len(outs))
    return out


class TestReciprocalLinks:
    EDGES = [
        ("a", "b"), ("b", "a"),            # mutual pair
        ("a", "c"),                        # one-way
        ("c", "a"),                        # ...actually returned: mutual
        ("a", "d"), ("a", "d"),            # duplicate edge collapses
        ("d", "d"),                        # self-loop dropped entirely
        ("e", "a"),                        # e: pure one-way
    ]

    def test_matches_simulation(self, spark):
        from correctocr_spark.ops.graph import reciprocal_links

        df = spark.createDataFrame(self.EDGES, "src string, dst string")
        got = {
            r["node"]: (r["n_out"], r["n_mutual"], r["reciprocity_bp"])
            for r in reciprocal_links(df).collect()
        }
        assert got == _recip_simulate(self.EDGES)
        # a: out = {b, c, d}, mutual = {b, c} -> 6666 bp floored
        assert got["a"] == (3, 2, 6666)
        assert got["e"] == (1, 0, 0)
        # d has only a self-loop: no non-self out-link, absent
        assert "d" not in got

    def test_full_ring_is_all_mutual(self, spark):
        from correctocr_spark.ops.graph import reciprocal_links

        ring = [(i, (i + 1) % 6) for i in range(6)] + [
            ((i + 1) % 6, i) for i in range(6)
        ]
        df = spark.createDataFrame(ring, "src long, dst long")
        rows = reciprocal_links(df).collect()
        assert len(rows) == 6
        assert all(r["reciprocity_bp"] == 10000 for r in rows)


# ---------------------------------------------------------------------------
# typosquat_pairs
# ---------------------------------------------------------------------------


def _lev(a, b):
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        prev = cur
    return prev[n]


class TestTyposquatPairs:
    DOMAINS = [
        "example.com",
        "exampl.com",    # deletion squat, distance 1
        "example.co",    # suffix-deletion squat, distance 1
        "exarnple.com",  # NOT distance 1 (rn vs m is two edits)
        "exanple.com",   # substitution squat, distance 1
        "xexample.com",  # insertion squat, distance 1
        "elpmaxe.com",   # reversal, far
        "shop.net",
        "shopp.net",     # insertion squat
        "shoop.net",     # substitution vs shopp, insertion vs shop
        "a.co",          # below min_len, skipped
        "b.co",          # below min_len: (a.co, b.co) must NOT pair
    ]

    def _got(self, spark, min_len=5):
        from correctocr_spark.ops.webindex import typosquat_pairs

        df = spark.createDataFrame(
            [(d,) for d in self.DOMAINS], "registered_domain string"
        )
        return {
            (r["domain_a"], r["domain_b"])
            for r in typosquat_pairs(df, min_len=min_len).collect()
        }

    def test_matches_bruteforce(self, spark):
        kept = sorted({d for d in self.DOMAINS if len(d) >= 5})
        want = {
            (a, b)
            for i, a in enumerate(kept)
            for b in kept[i + 1:]
            if _lev(a, b) == 1
        }
        got = self._got(spark)
        assert got == want
        assert ("example.co", "example.com") in got
        assert ("exampl.com", "example.com") in got
        assert ("example.com", "xexample.com") in got
        assert ("example.com", "exanple.com") in got
        # two-edit neighbours must not leak through the variant join
        assert ("exarnple.com", "example.com") not in got
        assert ("a.co", "b.co") not in got

    def test_duplicates_collapse(self, spark):
        from correctocr_spark.ops.webindex import typosquat_pairs

        df = spark.createDataFrame(
            [("dup.com",), ("dup.com",), ("dup.co",)],
            "registered_domain string",
        )
        rows = typosquat_pairs(df).collect()
        assert {(r["domain_a"], r["domain_b"], r["distance"]) for r in rows} == {
            ("dup.co", "dup.com", 1)
        }


# ---------------------------------------------------------------------------
# containment prefix-filter chain
# ---------------------------------------------------------------------------


def _shingle_set(text, k=3):
    ws = text.split()
    if not ws:
        return set()
    sh = {
        " ".join(ws[i : i + k]) for i in range(max(len(ws) - k, 0) + 1)
    }
    sh.discard("")
    return sh


def _containment_simulate(docs, k=3, threshold_bp=8000):
    sets = {i: _shingle_set(t, k) for i, t in docs}
    out = {}
    ids = sorted(sets)
    for x, a in enumerate(ids):
        for b in ids[x + 1:]:
            sa, sb = sets[a], sets[b]
            if not sa or not sb:
                continue
            n_inter = len(sa & sb)
            n_min = min(len(sa), len(sb))
            bp = n_inter * 10000 // n_min
            if bp >= threshold_bp:
                out[(a, b)] = (n_inter, n_min, bp)
    return out


class TestContainmentPairs:
    DOCS = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "quick brown fox jumps over"),                      # snippet of 1
        (3, "the quick brown fox jumps over the lazy dog today alpha beta gamma"),
        (4, "the quick brown cat sits under the lazy dog today"),  # partial
        (5, "lorem ipsum dolor sit amet consectetur"),             # unrelated
    ]

    def test_matches_simulation(self, spark):
        from correctocr_spark.ops.dedup import containment_pairs

        df = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        got = {
            (r["doc_a"], r["doc_b"]): (r["n_inter"], r["n_min"], r["containment_bp"])
            for r in containment_pairs(df, threshold_bp=8000).collect()
        }
        assert got == _containment_simulate(self.DOCS)
        # full containments surface at exactly 10^4 bp
        assert got[(1, 2)][2] == 10000
        assert got[(1, 3)][2] == 10000
        assert got[(2, 3)][2] == 10000
        # the ~50%-overlap page and the unrelated page never pair
        assert all(4 not in p and 5 not in p for p in got)

    def test_jaccard_would_miss_the_snippet(self, spark):
        """The motivating asymmetry: the snippet pair passes containment
        at 10^4 bp while its Jaccard is far below any near-dup cut."""
        sa = _shingle_set(self.DOCS[0][1])
        sb = _shingle_set(self.DOCS[1][1])
        jac = len(sa & sb) / len(sa | sb)
        assert jac < 0.5 and len(sa & sb) == len(sb)

    @pytest.mark.parametrize("threshold_bp", [6000, 8000, 9500])
    def test_prefix_candidates_complete_on_seeded_corpus(
        self, spark, threshold_bp
    ):
        """The probe-prefix lemma, checked empirically: on a seeded
        40-doc corpus with planted snippets/supersets, the full chain
        equals brute force at several thresholds — i.e. the df-ordered
        prefix join dropped no qualifying pair."""
        from correctocr_spark.ops.dedup import containment_pairs

        rng = random.Random(7)
        vocab = [f"w{i}" for i in range(60)]
        docs = []
        for i in range(30):
            docs.append((i, " ".join(rng.choice(vocab) for _ in range(30))))
        for j in range(5):  # planted snippets
            base = docs[j][1].split()
            s = rng.randrange(0, 15)
            docs.append((100 + j, " ".join(base[s : s + 8])))
        for j in range(5):  # planted supersets
            docs.append((200 + j, docs[10 + j][1] + " zz1 zz2 zz3"))
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            (r["doc_a"], r["doc_b"]): (r["n_inter"], r["n_min"], r["containment_bp"])
            for r in containment_pairs(df, threshold_bp=threshold_bp).collect()
        }
        assert got == _containment_simulate(docs, threshold_bp=threshold_bp)
        assert any(a < 100 and b >= 100 for a, b in got), "planted pairs missing"

    def test_empty_and_tiny_docs_drop(self, spark):
        from correctocr_spark.ops.dedup import containment_pairs

        df = spark.createDataFrame(
            [(1, "   "), (2, "one two"), (3, "one two")],
            "doc_id long, text string",
        )
        got = {
            (r["doc_a"], r["doc_b"]): r["containment_bp"]
            for r in containment_pairs(df).collect()
        }
        # sub-k docs still form their single clamped shingle; the
        # whitespace-only doc has no shingles and pairs with nothing
        assert got == {(2, 3): 10000}
