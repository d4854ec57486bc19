"""Crawl-filter tier: Gopher rules, domain blocklist, deterministic shuffle."""

import hashlib

import pytest
from pyspark.sql import Row, functions as F


GOOD = (
    "The quick brown fox jumped over the lazy dog and then ran off to be "
    "with the other foxes that have made a den in the hills. "
) * 3  # 81 words, all alphabetic, plenty of stopwords


def _rules(spark, rows, **kw):
    from correctocr_spark.ops.filters import gopher_rules

    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(rows)])
    out = gopher_rules(df, **kw)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


class TestGopherRules:
    def test_good_doc_passes(self, spark):
        r = _rules(spark, [GOOD])[0]
        assert r["passes_gopher"] is True
        assert r["n_words"] == 81
        assert r["stop_hits"] >= 2
        assert r["alpha_word_ratio"] == 1.0

    def test_short_doc_fails_word_count(self, spark):
        r = _rules(spark, ["the cat sat with that dog"])[0]
        assert r["n_words"] == 6 and r["passes_gopher"] is False

    def test_hash_symbol_ratio(self, spark):
        # 81 words + a 10-hash word -> ratio 10/82 > 0.1 fails; counts CHARS
        r = _rules(spark, [GOOD + "#" * 10])[0]
        assert r["hash_word_ratio"] == pytest.approx(10 / 82, abs=1e-6)
        assert r["passes_gopher"] is False

    def test_ellipsis_counts_both_forms(self, spark):
        r = _rules(spark, ["foo... bar… baz"])[0]
        assert r["ellipsis_word_ratio"] == pytest.approx(2 / 3, abs=1e-6)

    def test_bullet_line_ratio_blank_lines_excluded(self, spark):
        text = GOOD + "\n\n- item one\n* item two\n• item three\nplain line\n\n"
        r = _rules(spark, [text])[0]
        # 5 non-blank lines (GOOD is one line), 3 bulleted
        assert r["bullet_line_ratio"] == pytest.approx(3 / 5, abs=1e-6)
        assert r["passes_gopher"] is True

    def test_mostly_bullets_fails(self, spark):
        text = "\n".join(f"- {GOOD}" for _ in range(10))
        r = _rules(spark, [text])[0]
        assert r["bullet_line_ratio"] == 1.0 and r["passes_gopher"] is False

    def test_ellipsis_line_ratio(self, spark):
        text = GOOD + "\nto be continued...\nand more…\nthe end"
        r = _rules(spark, [text])[0]
        assert r["ellipsis_line_ratio"] == pytest.approx(2 / 4, abs=1e-6)

    def test_alpha_word_ratio_fails_numeric_doc(self, spark):
        nums = " ".join(str(i) for i in range(60))
        r = _rules(spark, ["the of and that " + nums])[0]
        assert r["alpha_word_ratio"] == pytest.approx(4 / 64, abs=1e-6)
        assert r["passes_gopher"] is False

    def test_stop_hits_are_distinct_words(self, spark):
        # 'the' repeated 60 times = ONE distinct stop word -> fails rule 8
        r = _rules(spark, ["The " * 30 + "the " * 30])[0]
        assert r["stop_hits"] == 1 and r["passes_gopher"] is False

    def test_mean_word_len_band(self, spark):
        long_words = " ".join(["the", "of"] + ["x" * 30] * 58)
        r = _rules(spark, [long_words])[0]
        assert r["mean_word_len"] > 10 and r["passes_gopher"] is False

    def test_empty_text(self, spark):
        r = _rules(spark, [""])[0]
        assert r["n_words"] == 0 and r["passes_gopher"] is False

    def test_thresholds_are_parameters(self, spark):
        r = _rules(spark, ["the cat sat with that dog"], min_words=3)[0]
        assert r["passes_gopher"] is True


class TestDomainBlocklist:
    def _run(self, spark, urls, blocked):
        from correctocr_spark.ops.filters import domain_blocklist

        pages = spark.createDataFrame(
            [Row(doc_id=i, url=u) for i, u in enumerate(urls)]
        )
        bl = spark.createDataFrame([Row(host=h) for h in blocked])
        out = domain_blocklist(pages, bl)
        return {r["doc_id"]: r for r in out.collect()}

    def test_exact_subdomain_and_clean(self, spark):
        got = self._run(
            spark,
            [
                "https://bad.com/x",
                "https://a.b.bad.com/y?z=1",
                "https://goodbad.com/",  # NOT a subdomain: no dot boundary
                "https://good.com/bad.com",  # path must not match
                "http://EVIL.org:8080/",  # case + port
                "not a url",
            ],
            ["bad.com", "evil.org"],
        )
        assert [got[i]["blocked"] for i in range(6)] == [
            True, True, False, False, True, False,
        ]
        assert got[5]["host"] == ""
        assert got[4]["host"] == "evil.org"

    def test_every_page_kept(self, spark):
        got = self._run(spark, ["https://a.com", "https://b.com"], ["a.com"])
        assert len(got) == 2

    def test_blocklist_deeper_than_cap_cannot_false_positive(self, spark):
        got = self._run(
            spark, ["https://a.com/"], ["x.y.z.w.v.a.com"]
        )
        assert got[0]["blocked"] is False


class TestDeterministicShuffle:
    def test_matches_global_hash_order(self, spark):
        from correctocr_spark.ops.filters import deterministic_shuffle

        ids = list(range(313))
        df = spark.createDataFrame([Row(doc_id=i) for i in ids])
        got = {
            r["doc_id"]: r["position"]
            for r in deterministic_shuffle(df, seed="s1").collect()
        }
        expect_order = sorted(
            ids, key=lambda i: (hashlib.md5(f"s1:{i}".encode()).hexdigest(), i)
        )
        expect = {doc: pos + 1 for pos, doc in enumerate(expect_order)}
        assert got == expect

    def test_seed_changes_order_rerun_stable(self, spark):
        from correctocr_spark.ops.filters import deterministic_shuffle

        df = spark.createDataFrame([Row(doc_id=i) for i in range(200)])
        a1 = {r["doc_id"]: r["position"] for r in deterministic_shuffle(df, "a").collect()}
        a2 = {r["doc_id"]: r["position"] for r in deterministic_shuffle(df, "a").collect()}
        b = {r["doc_id"]: r["position"] for r in deterministic_shuffle(df, "b").collect()}
        assert a1 == a2
        assert a1 != b
        assert sorted(a1.values()) == list(range(1, 201))

    def test_no_partitionless_window(self, spark):
        from correctocr_spark.ops.filters import deterministic_shuffle

        df = spark.createDataFrame([Row(doc_id=i) for i in range(50)])
        plan = deterministic_shuffle(df)._jdf.queryExecution().executedPlan().toString()
        for line in plan.splitlines():
            if "Window" in line and "windowspecdefinition" in line:
                assert "_bucket" in line, line

    def test_empty_input(self, spark):
        from correctocr_spark.ops.filters import deterministic_shuffle

        df = spark.createDataFrame([], "doc_id long")
        assert deterministic_shuffle(df).count() == 0


def _unique_good_text(i, n=30):
    sws = ["the", "of", "and", "to", "in", "is", "was", "for", "that", "with"]
    return " ".join(f"w{i}x{j} {sws[j % len(sws)]}" for j in range(n))


class TestFilterGates:
    def test_gopher_filter_matches_rules_semijoin(self, spark, sf_dir):
        """The inline-filter gate and the signals+verdict projection are
        built from the same shared expressions — same survivor set."""
        from correctocr_spark.ops.filters import gopher_filter, gopher_rules

        docs = spark.read.parquet(sf_dir + "/documents.parquet")
        # synthetic docs are multilingual (≤1 English stop word) and
        # 10-99 words: relax those two rules' thresholds so the word
        # count rule splits the corpus non-trivially
        kw = dict(min_stop_hits=0)
        kept = {r["doc_id"] for r in gopher_filter(docs, **kw).select("doc_id").collect()}
        expect = {
            r["doc_id"]
            for r in gopher_rules(docs, **kw).where("passes_gopher").collect()
        }
        assert kept == expect
        assert 0 < len(kept)

    def test_gopher_filter_keeps_all_columns(self, spark):
        from correctocr_spark.ops.filters import gopher_filter

        from pyspark.sql import Row

        df = spark.createDataFrame(
            [Row(doc_id=1, text=_unique_good_text(1), extra="keepme")]
        )
        rows = gopher_filter(df).collect()
        assert rows and rows[0]["extra"] == "keepme"

    def test_curate_gates(self, spark):
        """curate(gopher=True, blocklist=...) prepends the crawl-filter
        tier: blocked hosts and rule-failing docs never reach dedup."""
        from pyspark.sql import Row

        from correctocr_spark.ops.curate import curate

        rows = []
        for i in range(8):
            rows.append(
                Row(doc_id=i, text=_unique_good_text(i), url=f"https://good{i}.org/p")
            )
        # gopher-fail (all-bullet lines) but passes the numeric quality gate
        bullet_text = "\n".join(
            "- " + " ".join(f"w9x{j} the of" for j in range(k, k + 3))
            for k in range(0, 30, 3)
        )
        rows.append(Row(doc_id=20, text=bullet_text, url="https://good20.org/p"))
        # blocked host (subdomain of a blocklist entry)
        rows.append(
            Row(doc_id=21, text=_unique_good_text(21), url="https://a.bad.com/x")
        )
        docs = spark.createDataFrame(rows)
        bl = spark.createDataFrame([Row(host="bad.com")])
        out = curate(docs, min_quality=0.5, gopher=True, blocklist=bl)
        ids = {r["doc_id"] for r in out.select("doc_id").collect()}
        spark.catalog.clearCache()
        assert ids == set(range(8))

    def test_curate_gopher_threshold_overrides(self, spark):
        from pyspark.sql import Row

        from correctocr_spark.ops.curate import curate

        docs = spark.createDataFrame(
            [Row(doc_id=i, text=_unique_good_text(i, n=10)) for i in range(4)]
        )
        # 20 words each: default min_words=50 drops all...
        none = curate(docs, min_quality=0.0, gopher=True)
        spark.catalog.clearCache()
        # ...an override dict relaxes the gate
        some = curate(docs, min_quality=0.0, gopher={"min_words": 10})
        n_none, n_some = none.count(), some.count()
        spark.catalog.clearCache()
        assert n_none == 0 and n_some == 4


class TestWordlistDensity:
    def test_list_path_counts_occurrences(self, spark):
        from correctocr_spark.ops.filters import wordlist_density

        df = spark.createDataFrame(
            [Row(doc_id=0, text="Spam and SPAM and eggs"), Row(doc_id=1, text="clean")]
        )
        got = {
            r["doc_id"]: r for r in wordlist_density(df, ["spam", "eggs"]).collect()
        }
        assert got[0]["hits"] == 3 and got[0]["n_words"] == 5
        assert got[0]["hit_ratio"] == pytest.approx(3 / 5, abs=1e-6)
        assert got[1]["hits"] == 0 and got[1]["hit_ratio"] == 0.0

    def test_wordlist_density_list_equals_df(self, spark, sf_dir):
        """The array-literal fast path and the broadcast-join relational
        path must return identical values on the same corpus."""
        import __spark_entry__ as entry_mod
        from correctocr_spark.ops.filters import wordlist_density

        docs = spark.read.parquet(sf_dir + "/documents.parquet")
        lex = entry_mod.WORDLIST_LEXICON
        a = {
            r["doc_id"]: (r["n_words"], r["hits"], r["hit_ratio"])
            for r in wordlist_density(docs, lex).collect()
        }
        lex_df = spark.createDataFrame([Row(word=w) for w in lex])
        b = {
            r["doc_id"]: (r["n_words"], r["hits"], r["hit_ratio"])
            for r in wordlist_density(docs, lex_df).collect()
        }
        assert a == b
        assert any(v[1] > 0 for v in a.values())  # lexicon actually hits

    def test_df_path_every_page_kept(self, spark):
        from correctocr_spark.ops.filters import wordlist_density

        df = spark.createDataFrame(
            [Row(doc_id=0, text="no match here"), Row(doc_id=1, text="")]
        )
        lex_df = spark.createDataFrame([Row(word="zebra")])
        got = {r["doc_id"]: r for r in wordlist_density(df, lex_df).collect()}
        assert len(got) == 2 and got[1]["hits"] == 0


class TestBadwordGate:
    def test_curate_badwords_list_and_df(self, spark):
        """curate(badwords=...) drops high-density docs before dedup;
        list and DataFrame lexicons gate identically."""
        from correctocr_spark.ops.curate import curate

        rows = [Row(doc_id=i, text=_unique_good_text(i)) for i in range(6)]
        # 60-word doc, 12 lexicon hits -> ratio 0.2 > 0.1
        spammy = _unique_good_text(9, n=24) + " " + " ".join(["casino spins"] * 6)
        rows.append(Row(doc_id=9, text=spammy))
        docs = spark.createDataFrame(rows)
        a = curate(docs, min_quality=0.0, badwords=["casino", "spins"])
        ids_a = {r["doc_id"] for r in a.collect()}
        spark.catalog.clearCache()
        lex_df = spark.createDataFrame([Row(word="casino"), Row(word="spins")])
        b = curate(docs, min_quality=0.0, badwords=lex_df)
        ids_b = {r["doc_id"] for r in b.collect()}
        spark.catalog.clearCache()
        assert ids_a == ids_b == set(range(6))

    def test_curate_badword_threshold(self, spark):
        from correctocr_spark.ops.curate import curate

        docs = spark.createDataFrame(
            [Row(doc_id=0, text=_unique_good_text(0, n=24) + " casino")]
        )
        kept = curate(
            docs, min_quality=0.0, badwords=["casino"], max_badword_ratio=0.5
        ).count()
        spark.catalog.clearCache()
        assert kept == 1  # ratio 1/49 under the relaxed threshold


class TestFilterTierStreaming:
    def test_gates_are_stream_legal(self, spark, tmp_path):
        """The stateless gates (gopher_filter + list-lexicon density
        predicate) compose into a Structured Streaming pipeline without
        stateful operators: filter a parquet-source stream end-to-end."""
        from pyspark.sql import functions as F

        from correctocr_spark.ops.filters import gopher_filter

        inp = str(tmp_path / "in")
        rows = [Row(doc_id=i, text=_unique_good_text(i)) for i in range(5)]
        rows.append(Row(doc_id=10, text="too short"))
        df = spark.createDataFrame(rows)
        df.write.parquet(inp)
        stream = spark.readStream.schema(df.schema).parquet(inp)
        gated = gopher_filter(stream, min_words=20)
        assert gated.isStreaming
        q = (
            gated.writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.read.parquet(str(tmp_path / "out"))
        assert {r["doc_id"] for r in got.collect()} == set(range(5))


def test_wordlist_density_empty_lexicon(spark):
    from correctocr_spark.ops.filters import wordlist_density

    df = spark.createDataFrame([Row(doc_id=0, text="a b c")])
    r = wordlist_density(df, []).collect()[0]
    assert (r["n_words"], r["hits"], r["hit_ratio"]) == (3, 0, 0.0)


def test_curate_shuffle_seed_positions(spark):
    """curate(shuffle_seed=...) appends a dense, seed-reproducible
    position column over exactly the survivor set."""
    import hashlib as _h

    from correctocr_spark.ops.curate import curate

    rows = [Row(doc_id=i, text=_unique_good_text(i)) for i in range(10)]
    rows.append(Row(doc_id=50, text=rows[0].text))  # exact dup -> dropped
    docs = spark.createDataFrame(rows)
    out = curate(docs, min_quality=0.0, shuffle_seed="s7")
    got = {r["doc_id"]: r["position"] for r in out.select("doc_id", "position").collect()}
    spark.catalog.clearCache()
    assert set(got) == set(range(10))               # survivors only
    assert sorted(got.values()) == list(range(1, 11))  # dense over survivors
    order = sorted(got, key=lambda i: (_h.md5(f"s7:{i}".encode()).hexdigest(), i))
    assert [got[d] for d in order] == list(range(1, 11))


class TestRobotsDirectives:
    def _run(self, spark, htmls):
        from correctocr_spark.ops.filters import robots_directives

        df = spark.createDataFrame(
            [Row(doc_id=i, html=h) for i, h in enumerate(htmls)]
        )
        return {r["doc_id"]: (r["noindex"], r["nofollow"]) for r in robots_directives(df).collect()}

    def test_variants(self, spark):
        got = self._run(spark, [
            '<meta name="robots" content="noindex">ok',            # plain
            "<META NAME='ROBOTS' CONTENT='NOFOLLOW, NOARCHIVE'>",  # case+quotes
            '<meta content="none" name="robots">',                 # attr order
            '<meta name="description" content="noindex nofollow">',# decoy name
            '<p>noindex nofollow none</p>',                        # body text only
            '<meta name="robots" content="index, follow">',        # explicit allow
            '<meta name="robots" content="noindex"><meta name="robots" content="nofollow">',  # two tags
        ])
        assert got[0] == (1, 0)
        assert got[1] == (0, 1)
        assert got[2] == (1, 1)   # none implies both
        assert got[3] == (0, 0)
        assert got[4] == (0, 0)
        assert got[5] == (0, 0)
        assert got[6] == (1, 1)

    def test_every_page_kept(self, spark):
        got = self._run(spark, ["", "<html></html>"])
        assert got == {0: (0, 0), 1: (0, 0)}


def test_truncate_docs_values(spark):
    from correctocr_spark.ops.cleaning import truncate_docs

    df = spark.createDataFrame(
        [Row(doc_id=0, text="  a  b\tc\nd e  "), Row(doc_id=1, text="x y")]
    )
    got = {r["doc_id"]: r for r in truncate_docs(df, max_tokens=3).collect()}
    assert got[0]["text_trunc"] == "a b c"
    assert got[0]["n_tokens"] == 5 and got[0]["truncated"] == 1
    assert got[1]["text_trunc"] == "x y"
    assert got[1]["n_tokens"] == 2 and got[1]["truncated"] == 0


def test_curate_respect_robots(spark):
    """curate(respect_robots=True) drops noindex pages before every
    other gate; pages without a robots meta are untouched."""
    from correctocr_spark.ops.curate import curate

    rows = []
    for i in range(6):
        html = "<html><head>"
        if i in (2, 4):
            html += '<meta name="robots" content="noindex">'
        html += f"</head><body>{_unique_good_text(i)}</body></html>"
        rows.append(Row(doc_id=i, text=_unique_good_text(i), html=html))
    docs = spark.createDataFrame(rows)
    out = curate(docs, min_quality=0.0, respect_robots=True)
    ids = {r["doc_id"] for r in out.collect()}
    spark.catalog.clearCache()
    assert ids == {0, 1, 3, 5}


class TestHostQuota:
    def _pages(self, spark, n=40, hosts=4):
        # quality deliberately ANTI-correlated with doc_id so the cap
        # must actually sort, not just take the first ids
        return spark.createDataFrame(
            [
                Row(
                    doc_id=i,
                    url=f"http://example{i % hosts}.com/p/{i}",
                    q=float(n - i),
                )
                for i in range(n)
            ]
        )

    def test_caps_per_host_by_quality(self, spark):
        from correctocr_spark.ops.filters import host_quota

        out = host_quota(
            self._pages(spark), 3, quality_col="q", salt_buckets=1
        ).collect()
        by_host = {}
        for r in out:
            by_host.setdefault(r["host"], []).append(r)
        assert set(by_host) == {f"example{h}.com" for h in range(4)}
        for h, rows in by_host.items():
            assert len(rows) == 3
            # highest quality == lowest doc_id here
            ids = sorted(r["doc_id"] for r in rows)
            ranks = {r["doc_id"]: r["host_rank"] for r in rows}
            assert ids == sorted(ids)[:3]
            assert [ranks[i] for i in ids] == [1, 2, 3]

    def test_salted_equals_unsalted(self, spark):
        from correctocr_spark.ops.filters import host_quota

        pages = self._pages(spark, n=97, hosts=3)
        a = host_quota(pages, 5, quality_col="q", salt_buckets=1)
        b = host_quota(pages, 5, quality_col="q", salt_buckets=8)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_no_quality_col_orders_by_id(self, spark):
        from correctocr_spark.ops.filters import host_quota

        out = host_quota(self._pages(spark, n=20, hosts=2), 2).collect()
        kept = sorted((r["host"], r["doc_id"]) for r in out)
        assert kept == [
            ("example0.com", 0),
            ("example0.com", 2),
            ("example1.com", 1),
            ("example1.com", 3),
        ]

    def test_under_quota_host_keeps_all(self, spark):
        from correctocr_spark.ops.filters import host_quota

        out = host_quota(self._pages(spark, n=6, hosts=3), 10, quality_col="q")
        assert out.count() == 6

    def test_rejects_zero_quota(self, spark):
        from correctocr_spark.ops.filters import host_quota

        with pytest.raises(ValueError):
            host_quota(self._pages(spark), 0)


class TestHostQuotaGate:
    def test_curate_host_quota_caps_survivors(self, spark):
        """curate(host_quota=N) caps each host at N survivors, keeping
        the longest texts; hosts under quota are untouched."""
        from correctocr_spark.ops.curate import curate

        rows = [
            Row(
                doc_id=i,
                # doc_id 0-7 on hostA, 8-9 on hostB; length grows with i
                url=f"http://host{'a' if i < 8 else 'b'}.com/{i}",
                text=_unique_good_text(i, n=20 + i),
            )
            for i in range(10)
        ]
        docs = spark.createDataFrame(rows)
        out = curate(docs, min_quality=0.0, host_quota=3)
        ids = {r["doc_id"] for r in out.collect()}
        spark.catalog.clearCache()
        # hostA keeps its 3 longest (ids 5,6,7); hostB under quota keeps both
        assert ids == {5, 6, 7, 8, 9}

    def test_curate_host_quota_preserves_columns(self, spark):
        from correctocr_spark.ops.curate import curate

        docs = spark.createDataFrame(
            [Row(doc_id=1, url="http://h.com/1", text=_unique_good_text(1), lang="da")]
        )
        out = curate(docs, min_quality=0.0, host_quota=5)
        r = out.collect()[0]
        spark.catalog.clearCache()
        assert r["lang"] == "da" and "_hq_q" not in out.columns


ROBOTS_BODY = """
# global group
User-agent: *
Disallow: /private/
Allow: /private/ok/
Disallow: /tmp$
Disallow:

User-agent: specialbot
User-agent: otherbot
Disallow: /

Sitemap: https://example.com/sitemap.xml
"""


class TestRobotsTxtKernel:
    def test_star_group(self):
        from correctocr_spark.kernels.robots import parse_robots_txt

        rules = parse_robots_txt(ROBOTS_BODY, "*")
        # empty Disallow skipped; 3 real rules
        assert len(rules) == 3
        assert (True, len("/private/ok/"), "^/private/ok/") in rules
        assert (False, len("/private/"), "^/private/") in rules
        assert (False, len("/tmp$"), "^/tmp$") in rules

    def test_specific_agent_merges_its_groups(self):
        from correctocr_spark.kernels.robots import parse_robots_txt

        rules = parse_robots_txt(ROBOTS_BODY, "SpecialBot")
        assert rules == [(False, 1, "^/")]

    def test_unknown_agent_falls_back_to_star(self):
        from correctocr_spark.kernels.robots import parse_robots_txt

        assert len(parse_robots_txt(ROBOTS_BODY, "nobody")) == 3

    def test_rules_before_any_group_ignored(self):
        from correctocr_spark.kernels.robots import parse_robots_txt

        assert parse_robots_txt("Disallow: /x\n", "*") == []

    def test_malformed_lines_skipped(self):
        from correctocr_spark.kernels.robots import parse_robots_txt

        body = "User-agent: *\nDisallow /nocolon\nDisallow: /ok\ngarbage\n"
        assert parse_robots_txt(body, "*") == [(False, 3, "^/ok")]

    def test_regex_escapes_specials(self):
        from correctocr_spark.kernels.robots import parse_robots_txt

        rules = parse_robots_txt("User-agent: *\nDisallow: /a.b+c\n", "*")
        assert rules == [(False, 6, r"^/a\.b\+c")]


class TestRobotsTxtGate:
    def _gate(self, spark, urls):
        from correctocr_spark.ops.filters import robots_txt_gate, robots_txt_rules

        robots = spark.createDataFrame(
            [Row(host="example.com", content=ROBOTS_BODY)]
        )
        rules = robots_txt_rules(robots)
        pages = spark.createDataFrame(
            [Row(doc_id=i, url=u) for i, u in enumerate(urls)]
        )
        out = robots_txt_gate(pages, rules)
        return {r["url"]: r["allowed"] for r in out.collect()}

    def test_longest_match_and_allow_tiebreak(self, spark):
        got = self._gate(
            spark,
            [
                "http://example.com/",                    # no match -> allowed
                "http://example.com/private/x",           # Disallow /private/
                "http://example.com/private/ok/x",        # deeper Allow wins
                "http://example.com/tmp",                 # /tmp$ exact: matches
                "http://example.com/tmp/file",            # $ anchor: no match
                "http://other.com/private/x",             # no rules for host
            ],
        )
        assert got == {
            "http://example.com/": True,
            "http://example.com/private/x": False,
            "http://example.com/private/ok/x": True,
            "http://example.com/tmp": False,
            "http://example.com/tmp/file": True,
            "http://other.com/private/x": True,
        }

    def test_query_string_is_matched(self, spark):
        from correctocr_spark.ops.filters import robots_txt_gate, robots_txt_rules

        robots = spark.createDataFrame(
            [Row(host="h.com", content="User-agent: *\nDisallow: /*?session=\n")]
        )
        pages = spark.createDataFrame(
            [
                Row(doc_id=0, url="http://h.com/p?session=1"),
                Row(doc_id=1, url="http://h.com/p?id=1"),
            ]
        )
        got = {
            r["doc_id"]: r["allowed"]
            for r in robots_txt_gate(pages, robots_txt_rules(robots)).collect()
        }
        assert got == {0: False, 1: True}

    def test_broadcast_join_no_page_shuffle(self, spark):
        """The rules side must broadcast; the page side must not hash-
        shuffle (row-local verdict)."""
        import io
        from contextlib import redirect_stdout

        from correctocr_spark.ops.filters import robots_txt_gate, robots_txt_rules

        robots = spark.createDataFrame([Row(host="h.com", content="User-agent: *\nDisallow: /x\n")])
        pages = spark.createDataFrame([Row(doc_id=0, url="http://h.com/x")])
        out = robots_txt_gate(pages, robots_txt_rules(robots))
        buf = io.StringIO()
        with redirect_stdout(buf):
            out.explain("formatted")
        p = buf.getvalue()
        assert "BroadcastHashJoin" in p
        assert "SortMergeJoin" not in p


class TestRobotsTxtCurateGate:
    def test_curate_robots_txt_drops_disallowed(self, spark):
        from correctocr_spark.ops.curate import curate

        rows = [
            Row(
                doc_id=i,
                url=f"http://h.com/{'private' if i % 2 else 'pub'}/{i}",
                text=_unique_good_text(i),
            )
            for i in range(6)
        ]
        robots = spark.createDataFrame(
            [Row(host="h.com", content="User-agent: *\nDisallow: /private/\n")]
        )
        out = curate(spark.createDataFrame(rows), min_quality=0.0, robots_txt=robots)
        ids = {r["doc_id"] for r in out.collect()}
        spark.catalog.clearCache()
        assert ids == {0, 2, 4}


class TestPageMetadata:
    def test_extracts_all_three(self, spark):
        from correctocr_spark.ops.filters import page_metadata

        html = (
            "<html><head>\n<TITLE>\n  My   Page \n</TITLE>"
            "<meta content='a decoy description' name=\"description\">"
            '<link href="https://ex.com/canon" rel="canonical">'
            "</head><body>x</body></html>"
        )
        df = spark.createDataFrame([Row(doc_id=1, html=html)])
        r = page_metadata(df).collect()[0]
        assert r["title"] == "My Page"
        assert r["meta_description"] == "a decoy description"
        assert r["canonical_url"] == "https://ex.com/canon"

    def test_absent_fields_empty_not_null(self, spark):
        from correctocr_spark.ops.filters import page_metadata

        df = spark.createDataFrame([Row(doc_id=1, html="<p>no head</p>")])
        r = page_metadata(df).collect()[0]
        assert r["title"] == "" and r["meta_description"] == ""
        assert r["canonical_url"] == ""

    def test_first_tag_wins_and_robots_meta_ignored(self, spark):
        from correctocr_spark.ops.filters import page_metadata

        html = (
            '<meta name="robots" content="noindex">'
            '<meta name="description" content="first">'
            '<meta name="description" content="second">'
            '<link rel="stylesheet" href="/style.css">'
            '<link rel="canonical" href="/real">'
        )
        df = spark.createDataFrame([Row(doc_id=1, html=html)])
        r = page_metadata(df).collect()[0]
        assert r["meta_description"] == "first"
        assert r["canonical_url"] == "/real"


def test_page_metadata_null_html_yields_empty_fields(spark):
    from correctocr_spark.ops.filters import page_metadata

    probe = spark.createDataFrame(
        [(1, None), (2, ""), (3, "<title>unclosed")], "doc_id long, html string"
    )
    rows = sorted(tuple(r) for r in page_metadata(probe).collect())
    assert rows == [(1, "", "", ""), (2, "", "", ""), (3, "", "", "")]


def _py_bloom_pos(key: str, seed: int, m_bits: int) -> int:
    # the exact md5 arithmetic bloom_bitmap/bloom_gate compile into the
    # plan (and the DuckDB oracle restates): 60 md5 bits mod m
    return int(hashlib.md5(f"bf{seed}|{key}".encode()).hexdigest()[:15], 16) % m_bits


class TestBloomGate:
    M, K = 512, 3  # tiny on purpose: dense enough to produce real FPs

    def _frames(self, spark, n_keys=30, n_corpus=200):
        keys = spark.range(n_keys).select(
            F.concat(F.lit("k"), F.col("id")).alias("key")
        )
        corpus = spark.range(n_corpus).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("k"), F.col("id")).alias("url"),
        )
        return keys, corpus

    def test_matches_python_reference_exactly(self, spark):
        """Flag map (including any false positives) equals a Python
        bloom built with the same hash arithmetic — full functional
        cross-derivation, not just no-false-negatives."""
        from correctocr_spark.ops.filters import bloom_bitmap, bloom_gate

        keys, corpus = self._frames(spark)
        bm = bloom_bitmap(keys, "key", m_bits=self.M, num_hashes=self.K)
        got = {
            r["url"]: r["maybe_member"]
            for r in bloom_gate(
                corpus, bm, "url", m_bits=self.M, num_hashes=self.K
            ).collect()
        }
        bl_pos = {
            _py_bloom_pos(f"k{i}", s, self.M)
            for i in range(30)
            for s in range(self.K)
        }
        want = {
            f"k{i}": all(
                _py_bloom_pos(f"k{i}", s, self.M) in bl_pos for s in range(self.K)
            )
            for i in range(200)
        }
        assert got == want
        assert all(want[f"k{i}"] for i in range(30))  # no false negatives

    def test_bitmap_words_match_python(self, spark):
        from correctocr_spark.ops.filters import bloom_bitmap

        keys, _ = self._frames(spark)
        rows = bloom_bitmap(keys, "key", m_bits=self.M, num_hashes=self.K).collect()
        words = {}
        for i in range(30):
            for s in range(self.K):
                p = _py_bloom_pos(f"k{i}", s, self.M)
                w, b = p // 64, p % 64
                # python ints are unbounded; wrap bit 63 to the signed
                # BIGINT the relational bitmap stores
                bit = 1 << b
                if bit >= 1 << 63:
                    bit -= 1 << 64
                words[w] = words.get(w, 0) | bit
                if words[w] >= 1 << 63:
                    words[w] -= 1 << 64
        assert {r["word_index"]: r["bits"] for r in rows} == words

    def test_anti_join_equals_plain(self, spark):
        from correctocr_spark.ops.filters import bloom_anti_join

        keys, corpus = self._frames(spark)
        got = {
            r["doc_id"]
            for r in bloom_anti_join(
                corpus, keys, "url", "key", m_bits=self.M, num_hashes=self.K
            ).collect()
        }
        plain = {
            r["doc_id"]
            for r in corpus.join(
                keys.select(F.col("key").alias("url")), "url", "left_anti"
            ).collect()
        }
        assert got == plain == set(range(30, 200))

    def test_param_mismatch_raises(self, spark):
        from correctocr_spark.ops.filters import bloom_bitmap, bloom_gate

        keys, corpus = self._frames(spark, n_corpus=5)
        bm = bloom_bitmap(keys, "key", m_bits=self.M, num_hashes=self.K)
        with pytest.raises(ValueError, match="built with"):
            bloom_gate(corpus, bm, "url", m_bits=self.M * 2, num_hashes=self.K)
        with pytest.raises(ValueError):
            bloom_bitmap(keys, "key", m_bits=100)  # not a multiple of 64

    def test_probe_is_broadcast_no_corpus_shuffle(self, spark):
        """The gate's plan: every probe a BroadcastHashJoin, no
        SortMergeJoin, and the ONLY hash exchange is the bitmap's own
        word-keyed aggregation — the corpus side stays scan-partitioned
        at any scale."""
        import io
        from contextlib import redirect_stdout

        from correctocr_spark.ops.filters import bloom_bitmap, bloom_gate

        keys, corpus = self._frames(spark)
        out = bloom_gate(
            corpus,
            bloom_bitmap(keys, "key", m_bits=self.M, num_hashes=self.K),
            "url",
            m_bits=self.M,
            num_hashes=self.K,
        )
        buf = io.StringIO()
        with redirect_stdout(buf):
            out.explain("formatted")
        p = buf.getvalue()
        assert "SortMergeJoin" not in p
        assert p.count("BroadcastHashJoin") >= self.K
        for line in p.splitlines():
            if "Exchange hashpartitioning" in line:
                assert "word_index" in line, line


class TestGateFunnel:
    def _docs(self, spark):
        from pyspark.sql import functions as F

        return spark.createDataFrame(
            [
                (1, "good doc", True),
                (2, "bad doc", False),
                (3, "null gate doc", None),
                (4, "another good", True),
            ],
            "doc_id long, text string, keep boolean",
        )

    def test_cumulative_counts_and_null_fails(self, spark):
        from pyspark.sql import functions as F

        from correctocr_spark.ops.filters import gate_funnel

        docs = self._docs(spark)
        out = gate_funnel(
            docs,
            [
                ("keep", F.col("keep")),
                ("long_text", F.length("text") >= 9),
            ],
        ).orderBy("stage")
        rows = [tuple(r) for r in out.collect()]
        # NULL keep counts as FAIL (row 3); gate 2 only sees gate-1
        # survivors (docs 1 and 4), of which only doc 4 is >= 9 chars.
        assert rows == [
            (0, "total", 4, 0, 4),
            (1, "keep", 4, 2, 2),
            (2, "long_text", 2, 1, 1),
        ]
        assert [f.name for f in out.schema.fields] == [
            "stage", "gate", "n_in", "n_fail", "n_out",
        ]

    def test_empty_input_and_no_gates(self, spark):
        from pyspark.sql import functions as F

        from correctocr_spark.ops.filters import gate_funnel

        empty = self._docs(spark).where(F.lit(False))
        rows = gate_funnel(empty, [("keep", F.col("keep"))]).orderBy(
            "stage"
        ).collect()
        assert [tuple(r) for r in rows] == [
            (0, "total", 0, 0, 0),
            (1, "keep", 0, 0, 0),
        ]
        only_total = gate_funnel(self._docs(spark), []).collect()
        assert [tuple(r) for r in only_total] == [(0, "total", 4, 0, 4)]

    def test_single_scan_single_aggregate_plan(self, spark):
        """The whole funnel must be ONE aggregate over ONE scan — per-gate
        passes or joins would not survive 100 TB."""
        import io
        from contextlib import redirect_stdout

        from pyspark.sql import functions as F

        from correctocr_spark.ops.filters import gate_funnel

        docs = self._docs(spark)
        out = gate_funnel(
            docs,
            [("keep", F.col("keep")), ("long_text", F.length("text") >= 9)],
        )
        buf = io.StringIO()
        with redirect_stdout(buf):
            out.explain("formatted")
        p = buf.getvalue()
        assert "Join" not in p
        tree = p.split("\n\n")[0]  # node names repeat in the detail section
        assert tree.count("Scan ") == 1
        # one partial + one final HashAggregate, nothing per-gate
        assert tree.count("HashAggregate") <= 2


class TestCurateFunnel:
    def _docs(self, spark):
        from pyspark.sql import functions as F

        good = " ".join(["the quick brown fox jumps over lazy dogs"] * 8)
        return spark.createDataFrame(
            [
                (1, good, "<html><body>x</body></html>"),
                (2, good, '<meta name="robots" content="noindex">'),  # robots drop
                (3, "short", "<html/>"),                              # gopher drop
                (4, good + " badword badword badword badword badword "
                    + "badword badword badword badword badword", "<p>"),
            ],
            "doc_id long, text string, html string",
        )

    def test_funnel_matches_sequential_gates(self, spark):
        """The funnel's survivor counts must equal applying curate's own
        gate functions sequentially over the same rows."""
        from pyspark.sql import functions as F

        from correctocr_spark.ops.filters import (
            curate_funnel,
            gopher_filter,
            robots_directives,
            wordlist_density,
        )

        docs = self._docs(spark)
        bad = ["badword"]
        funnel = {
            r.gate: r
            for r in curate_funnel(
                docs,
                respect_robots=True,
                gopher={"min_words": 10},
                badwords=bad,
                max_badword_ratio=0.1,
            ).collect()
        }
        # sequential ground truth with the real gate operators
        noidx = robots_directives(docs).where(F.col("noindex") == 1)
        s1 = docs.join(noidx.select(F.col("doc_id")), "doc_id", "left_anti")
        s2 = gopher_filter(s1, min_words=10)
        dens = wordlist_density(s2, bad)
        s3 = s2.join(
            dens.where(F.col("hit_ratio") > 0.1).select("doc_id"),
            "doc_id",
            "left_anti",
        )
        assert funnel["total"].n_in == docs.count()
        assert funnel["robots_meta"].n_out == s1.count()
        assert funnel["gopher"].n_out == s2.count()
        assert funnel["badwords"].n_out == s3.count()
        assert [funnel[g].stage for g in ("total", "robots_meta", "gopher", "badwords")] == [0, 1, 2, 3]

    def test_dataframe_lexicon_rejected(self, spark):
        from correctocr_spark.ops.filters import curate_funnel

        lex = spark.createDataFrame([("x",)], "word string")
        try:
            curate_funnel(self._docs(spark), badwords=lex)
            assert False, "expected TypeError"
        except TypeError:
            pass


def test_cli_curate_funnel_out(tmp_path, spark):
    """--funnel-out writes the one-scan attrition report next to the
    curated corpus; its total row matches the input count."""
    from tests.test_cli import run_cli

    docs = spark.createDataFrame(
        [
            (i, " ".join(["the of and this text is long enough to pass"] * 6),
             "<html/>")
            for i in range(20)
        ] + [(99, "tiny", "<html/>")],
        "doc_id long, text string, html string",
    )
    inp = str(tmp_path / "docs")
    docs.write.parquet(inp)
    out = str(tmp_path / "curated")
    funnel_out = str(tmp_path / "funnel")
    r = run_cli(
        "curate", "--input", inp, "--output", out,
        "--min-quality", "0", "--gopher", "--funnel-out", funnel_out,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rows = {x.gate: x for x in spark.read.parquet(funnel_out).collect()}
    assert rows["total"].n_in == 21
    assert rows["gopher"].n_fail >= 1  # the tiny doc


class TestTrainValTestSplit:
    def test_matches_python_md5_and_proportions(self, spark):
        import hashlib

        from correctocr_spark.ops.filters import train_val_test_split

        docs = spark.createDataFrame(
            [(i,) for i in range(2000)], "doc_id long"
        )
        got = {
            r.doc_id: r.split
            for r in train_val_test_split(
                docs, {"train": 0.8, "val": 0.1, "test": 0.1}, seed="s"
            ).collect()
        }

        def expect(i):
            h6 = hashlib.md5(f"s:{i}".encode()).hexdigest()[:6]
            if h6 < format(int(0.8 * 16**6), "06x"):
                return "train"
            if h6 < format(int(0.9 * 16**6), "06x"):
                return "val"
            return "test"

        assert got == {i: expect(i) for i in range(2000)}
        n = len(got)
        frac = {k: sum(1 for v in got.values() if v == k) / n for k in ("train", "val", "test")}
        assert abs(frac["train"] - 0.8) < 0.03
        assert abs(frac["val"] - 0.1) < 0.02

    def test_stable_under_corpus_growth_and_seed_change(self, spark):
        from correctocr_spark.ops.filters import train_val_test_split

        small = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
        big = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
        a = {r.doc_id: r.split for r in train_val_test_split(small, seed="x").collect()}
        b = {r.doc_id: r.split for r in train_val_test_split(big, seed="x").collect()}
        assert all(b[i] == a[i] for i in a)  # no migration on growth
        c = {r.doc_id: r.split for r in train_val_test_split(small, seed="y").collect()}
        assert a != c

    def test_weight_validation(self, spark):
        from correctocr_spark.ops.filters import train_val_test_split

        docs = spark.createDataFrame([(1,)], "doc_id long")
        for bad in ({}, {"a": 0.5, "b": 0.6}):
            try:
                train_val_test_split(docs, bad)
                assert False, bad
            except ValueError:
                pass
        # single-name weighting degenerates to a constant column
        one = train_val_test_split(docs, {"all": 1.0}).collect()
        assert one[0].split == "all"


class TestTemplateSkeletons:
    def _pages(self, spark, rows):
        from pyspark.sql import Row

        return spark.createDataFrame(
            [Row(doc_id=i, url=u, html=h) for i, (u, h) in enumerate(rows)]
        )

    def test_same_template_counted_per_host(self, spark):
        from correctocr_spark.ops.filters import template_skeletons

        shell = "<html><body><div><p>%s</p></div></body></html>"
        rows = (
            [("https://a.com/%d" % i, shell % i) for i in range(3)]
            + [("https://b.com/9", shell % 9)]  # same skeleton, other host
            + [("https://a.com/x", "<html><body><p>x</p></body></html>")]
        )
        out = {
            r["doc_id"]: r.asDict()
            for r in template_skeletons(self._pages(spark, rows)).collect()
        }
        assert [out[i]["n_same"] for i in range(3)] == [3, 3, 3]
        assert all(out[i]["templated"] for i in range(3))
        # same skeleton hash on the other host, counted separately
        assert out[3]["skeleton"] == out[0]["skeleton"]
        assert out[3]["n_same"] == 1 and not out[3]["templated"]
        assert out[4]["n_same"] == 1 and not out[4]["templated"]

    def test_skeleton_ignores_text_case_and_attrs(self, spark):
        from correctocr_spark.ops.filters import template_skeletons

        rows = [
            ("https://a.com/1", "<HTML><Body class=x><P id=1>hello</P></Body></HTML>"),
            ("https://a.com/2", "<html><body><p>entirely different words</p></body></html>"),
        ]
        out = template_skeletons(self._pages(spark, rows)).collect()
        assert out[0]["skeleton"] == out[1]["skeleton"]
        # closing tags are not counted; null html hashes the empty sequence
        assert out[0]["n_tags"] == 3

    def test_null_html_empty_sequence(self, spark):
        from correctocr_spark.ops.filters import template_skeletons
        from pyspark.sql import Row

        df = spark.createDataFrame(
            [(0, "https://a.com/", None)],
            "doc_id long, url string, html string",
        )
        r = template_skeletons(df).first()
        assert r["n_tags"] == 0 and r["n_same"] == 1


class TestSoft404Detect:
    def _detect(self, spark, rows, **kw):
        from correctocr_spark.ops.filters import soft404_detect
        from pyspark.sql import Row

        df = spark.createDataFrame(
            [Row(doc_id=i, text=t, html=h) for i, (t, h) in enumerate(rows)]
        )
        return {r["doc_id"]: r.asDict() for r in soft404_detect(df, **kw).collect()}

    def test_phrase_hit_is_decisive(self, spark):
        long_text = "word " * 100 + "sadly this Page Not Found today"
        r = self._detect(spark, [(long_text, "<html></html>")])[0]
        assert r["err_phrases"] == 1 and r["soft404_bp"] >= 5000
        assert r["is_soft404"] is True

    def test_phrase_cap_at_two(self, spark):
        t = "error 404 " * 5 + "word " * 100
        r = self._detect(spark, [(t, "")])[0]
        assert r["err_phrases"] == 5 and r["soft404_bp"] == 10000

    def test_short_anchor_heavy_page_flagged(self, spark):
        html = "<a href=x>home page</a><a href=y>back to start now then</a>"
        r = self._detect(spark, [("home page back to start now then ok", html)])[0]
        assert r["err_phrases"] == 0
        assert r["n_words"] == 8 and r["link_words"] == 7
        # 7 anchor words * 2 >= 8 text words -> anchor-heavy + short
        assert r["soft404_bp"] == 5000 and r["is_soft404"] is True

    def test_short_alone_not_flagged(self, spark):
        r = self._detect(spark, [("just a few words here", "")])[0]
        assert r["soft404_bp"] == 2500 and r["is_soft404"] is False

    def test_long_clean_page_zero(self, spark):
        r = self._detect(spark, [("word " * 100, "<p>no anchors</p>")])[0]
        assert r["soft404_bp"] == 0 and r["is_soft404"] is False

    def test_empty_text_never_anchor_heavy(self, spark):
        # n_words == 0 must not satisfy link_words*2 >= n_words
        r = self._detect(spark, [("", "<a href=x>nav</a>")])[0]
        assert r["n_words"] == 0 and r["link_words"] == 1
        assert r["soft404_bp"] == 2500  # short only


class TestExtractionDensity:
    def test_density_arithmetic(self, spark):
        from correctocr_spark.ops.filters import extraction_density
        from pyspark.sql import Row

        # 3 OPENING tags — closing tags add no skeleton information
        html = "<html><body><p>hello world</p></body></html>"
        df = spark.createDataFrame([Row(doc_id=0, html=html, text="hello world")])
        r = extraction_density(df).first()
        assert r["html_chars"] == len(html) and r["text_chars"] == 11
        assert r["n_tags"] == 3
        assert r["text_bp"] == (11 * 10000) // len(html)
        assert r["chars_per_tag"] == 11 // 3

    def test_empty_html_guarded(self, spark):
        from correctocr_spark.ops.filters import extraction_density
        from pyspark.sql import Row

        df = spark.createDataFrame(
            [(0, None, "text with no markup")], "doc_id long, html string, text string"
        )
        r = extraction_density(df).first()
        assert r["html_chars"] == 0 and r["n_tags"] == 0
        # denominators floor at 1: rate against an empty page is the
        # text length itself scaled, never a division error
        assert r["text_bp"] == 19 * 10000
        assert r["chars_per_tag"] == 19
