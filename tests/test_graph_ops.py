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


class TestHostGraph:
    def _links(self, spark):
        return spark.createDataFrame(
            [
                ("http://A.com/1", "http://b.com/x"),
                ("http://a.com/2", "http://B.com:8080/y"),
                ("http://a.com/2", "http://b.com/z"),
                ("http://a.com/3", "http://a.com/self"),
                ("http://b.com/1", "http://a.com/back"),
                ("not a url", "http://b.com/q"),
                ("http://c.com/1", "garbage"),
            ],
            "src_url string, href string",
        )

    def test_projection_counts(self, spark):
        from correctocr_spark.ops.graph import host_graph

        rows = {
            (r.src_host, r.dst_host): (r.n_links, r.n_src_pages)
            for r in host_graph(self._links(spark)).collect()
        }
        # hosts lowercased, ports stripped; unparseable rows dropped
        assert rows == {
            ("a.com", "b.com"): (3, 2),  # /1 and /2 (x2) -> 2 distinct pages
            ("a.com", "a.com"): (1, 1),  # self-loop kept
            ("b.com", "a.com"): (1, 1),
        }

    def test_reputation_features(self, spark):
        from correctocr_spark.ops.graph import host_graph, host_reputation

        rep = {
            r.host: r.asDict()
            for r in host_reputation(host_graph(self._links(spark))).collect()
        }
        assert set(rep) == {"a.com", "b.com"}
        a, b = rep["a.com"], rep["b.com"]
        # a.com: 3 out cross-links to b.com, 1 in from b.com, 1 intra
        assert (a["n_out_hosts"], a["n_out_links"]) == (1, 3)
        assert (a["n_in_hosts"], a["n_in_links"]) == (1, 1)
        assert a["intra_links"] == 1
        assert a["in_ratio_ppm"] == 250000  # 1 in / 4 total cross-links
        # b.com mirrors: 3 in, 1 out, no intra
        assert (b["n_in_links"], b["n_out_links"], b["intra_links"]) == (3, 1, 0)
        assert b["in_ratio_ppm"] == 750000

    def test_isolated_sink_and_source_full_outer(self, spark):
        """A host appearing ONLY as a target (pure sink) or ONLY as a
        source must survive the full-outer degree join with zeroed
        other side."""
        from correctocr_spark.ops.graph import host_graph, host_reputation

        links = spark.createDataFrame(
            [("http://s.com/1", "http://sink.com/x")],
            "src_url string, href string",
        )
        rep = {
            r.host: r.asDict()
            for r in host_reputation(host_graph(links)).collect()
        }
        assert rep["sink.com"]["n_in_links"] == 1
        assert rep["sink.com"]["n_out_links"] == 0
        assert rep["sink.com"]["in_ratio_ppm"] == 1000000
        assert rep["s.com"]["n_out_links"] == 1
        assert rep["s.com"]["in_ratio_ppm"] == 0


class TestHostCommunities:
    def test_rings_merge_and_min_links_threshold(self, spark):
        from correctocr_spark.ops.graph import host_communities

        hedges = spark.createDataFrame(
            [
                ("a.com", "b.com", 3),
                ("b.com", "c.com", 2),   # chain a-b-c -> one community
                ("x.com", "y.com", 5),   # separate pair
                ("c.com", "x.com", 1),   # weak bridge
                ("z.com", "z.com", 9),   # self-loop: irrelevant
            ],
            "src_host string, dst_host string, n_links long",
        )
        merged = {
            r.host: r.community
            for r in host_communities(hedges, min_links=1).collect()
        }
        # weak bridge included at min_links=1: all five hosts share one label
        assert len(set(merged.values())) == 1
        assert set(merged) == {"a.com", "b.com", "c.com", "x.com", "y.com"}
        assert merged["y.com"] == "a.com"  # lexicographic min label

        split = {
            r.host: r.community
            for r in host_communities(hedges, min_links=2).collect()
        }
        # bridge dropped: two communities, labeled by their min hosts
        assert split["c.com"] == "a.com"
        assert split["y.com"] == "x.com"
        assert len(set(split.values())) == 2
