"""ops/graph.py probes: integer PageRank vs a driver-side simulation."""


def _simulate(edges, iterations=5, init=1_000_000, base=150_000, damping=85):
    from collections import defaultdict

    e = sorted(set(edges))
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    outdeg = defaultdict(int)
    for s, _ in e:
        outdeg[s] += 1
    rank = {n: init for n in nodes}
    for _ in range(iterations):
        inc = defaultdict(int)
        for s, d in e:
            inc[d] += rank[s] // outdeg[s]
        rank = {n: base + (damping * inc[n]) // 100 for n in nodes}
    return rank


def test_pagerank_matches_simulation(spark):
    from correctocr_spark.ops.graph import pagerank

    edges = [(1, 2), (2, 3), (3, 1), (4, 1), (4, 2), (5, 4), (1, 3), (2, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=5).collect()}
    assert got == _simulate(edges)
    # hub (node with two in-links from high-rank sources) outranks leaves
    assert got[3] > got[5] and got[1] > got[5]


def test_in_degrees(spark):
    from correctocr_spark.ops.graph import in_degrees

    df = spark.createDataFrame(
        [(1, 2), (3, 2), (1, 2), (2, 1)], "src long, dst long"
    )
    got = {r["node"]: r["in_degree"] for r in in_degrees(df).collect()}
    assert got == {2: 2, 1: 1}  # duplicate edge counted once


def test_canonical_by_quality_crafted(spark):
    """The elected canonical is the highest-quality cluster member, not
    the min id."""
    from correctocr_spark.ops.curate import canonical_by_quality

    good = ("the quick brown fox jumps over the lazy dog and then rests "
            "for a while in the shade of an old tree")
    docs = spark.createDataFrame(
        [
            (1, "x!!! ??? !!!"),     # low quality, min id
            (2, good),               # high quality
            (3, good + " today"),    # high quality too (longer)
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    got = canonical_by_quality(docs, pairs).collect()
    assert len(got) == 1
    row = got[0]
    assert row["component"] == 1          # min-id labels the cluster...
    assert row["canonical_id"] in (2, 3)  # ...but a high-quality doc wins
    assert row["canonical_id"] != 1


def test_curated_doc_ids_quality_canonical(spark):
    """canonical='quality' keeps the cluster's best doc instead of the
    lowest id; 'min_id' stays the oracle contract."""
    from correctocr_spark.ops.curate import curated_doc_ids

    good = ("the quick brown fox jumps over the lazy dog and then rests "
            "for a while in the shade of an old tree near the river")
    # one appended punct-only token: punct_ratio blows past 0.2 (quality
    # drops a band) while ~90% of shingles stay shared with doc 2
    noisy = good + " " + "!?;" * 20
    docs = spark.createDataFrame(
        [
            (1, noisy, "en"),            # same cluster as 2, worse quality
            (2, good + " today", "en"),
            (3, "standalone doc with plenty of good the of and to words here", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    by_id = {
        r["doc_id"]
        for r in curated_doc_ids(docs, min_quality=0.0, canonical="min_id").collect()
    }
    by_q = {
        r["doc_id"]
        for r in curated_doc_ids(docs, min_quality=0.0, canonical="quality").collect()
    }
    # docs 1 and 2 are near-dups (shared long base): min_id keeps 1,
    # quality keeps 2; the standalone doc survives either way
    assert 3 in by_id and 3 in by_q
    assert by_id == {1, 3}
    assert by_q == {2, 3}


class TestAnchorStats:
    def test_counts_mode_and_tiebreak(self, spark):
        from pyspark.sql import Row
        from correctocr_spark.ops.graph import anchor_stats

        links = spark.createDataFrame(
            [
                Row(doc_id=1, href="http://t.com/a", anchor="click"),
                Row(doc_id=1, href="http://t.com/a", anchor="click"),
                Row(doc_id=2, href="http://t.com/a", anchor=" here "),
                Row(doc_id=2, href="http://t.com/a", anchor="beta"),
                # tie (1 vs 1) on /b -> ascending anchor wins
                Row(doc_id=3, href="http://t.com/b", anchor="zz"),
                Row(doc_id=4, href="http://t.com/b", anchor="aa"),
                Row(doc_id=5, href="", anchor="dropped"),
            ]
        )
        got = {r["href"]: r for r in anchor_stats(links).collect()}
        assert set(got) == {"http://t.com/a", "http://t.com/b"}
        a = got["http://t.com/a"]
        assert a["n_links"] == 4 and a["n_source_docs"] == 2
        assert a["top_anchor"] == "click"
        b = got["http://t.com/b"]
        assert b["n_links"] == 2 and b["top_anchor"] == "aa"

    def test_anchor_trimmed_before_mode(self, spark):
        from pyspark.sql import Row
        from correctocr_spark.ops.graph import anchor_stats

        links = spark.createDataFrame(
            [
                Row(doc_id=1, href="h", anchor="x "),
                Row(doc_id=2, href="h", anchor=" x"),
                Row(doc_id=3, href="h", anchor="y"),
            ]
        )
        r = anchor_stats(links).collect()[0]
        assert r["top_anchor"] == "x" and r["n_links"] == 3


def _simulate_hits(edges, iterations=3, scale=1_000_000):
    e = sorted(set(edges))
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    hub = {n: scale for n in nodes}
    auth = {}
    for _ in range(iterations):
        raw = {n: 0 for n in nodes}
        for s, d in e:
            raw[d] += hub[s]
        mx = max(max(raw.values()), 1)
        auth = {n: (raw[n] * scale) // mx for n in nodes}
        raw = {n: 0 for n in nodes}
        for s, d in e:
            raw[s] += auth[d]
        mx = max(max(raw.values()), 1)
        hub = {n: (raw[n] * scale) // mx for n in nodes}
    return {n: (hub[n], auth[n]) for n in nodes}


def test_hits_matches_simulation(spark):
    from correctocr_spark.ops.graph import hits

    edges = [(1, 2), (2, 3), (3, 1), (4, 1), (4, 2), (5, 4), (1, 3), (2, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: (r["hub"], r["authority"])
        for r in hits(df, iterations=3).collect()
    }
    assert got == _simulate_hits(edges)


def test_hits_star_graph_roles(spark):
    """Leaves pointing at a star center: the center is the (only)
    authority, the leaves are the (equal) hubs, and the center's hub
    score is 0 (it links to nothing)."""
    from correctocr_spark.ops.graph import hits

    df = spark.createDataFrame(
        [(i, 0) for i in range(1, 6)], "src long, dst long"
    )
    got = {
        r["node"]: (r["hub"], r["authority"])
        for r in hits(df, iterations=2).collect()
    }
    assert got[0] == (0, 1_000_000)
    for leaf in range(1, 6):
        assert got[leaf] == (1_000_000, 0)


def test_hits_duplicate_edges_counted_once(spark):
    from correctocr_spark.ops.graph import hits

    once = spark.createDataFrame([(1, 2), (3, 2)], "src long, dst long")
    dup = spark.createDataFrame(
        [(1, 2), (1, 2), (3, 2), (3, 2)], "src long, dst long"
    )
    k = lambda df: sorted(tuple(r) for r in hits(df, iterations=2).collect())
    assert k(once) == k(dup)
