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
