"""q36 is registered rows-only (iterative fixpoint); its exactness
gate: connected components must equal a driver-side union-find over
the same edge set, on smoke and correctness scales."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_data_pipeline_for_restaurant_analytics_spark.operators.dedup import (
    connected_components,
)

from .conftest import SF_SMOKE


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


def test_components_match_union_find(spark):
    edges = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 1), (30, 30)]
    df = spark.createDataFrame(edges, "id1 long, id2 long")
    got = {r.id: r.component for r in connected_components(df).collect()}
    expected = _union_find(edges)
    assert got == expected
    # chain 1-2-3-22-21-20 must collapse to min label 1
    assert got[20] == 1 and got[3] == 1


def test_q36_runs_and_is_consistent(spark):
    from real_time_data_pipeline_for_restaurant_analytics_spark.registry import all_queries

    out = all_queries()["q36_dedup_clusters"].build(spark, SF_SMOKE).collect()
    assert all(r.cluster_size >= 2 for r in out)
    canon = [r.canonical_id for r in out]
    assert canon == sorted(canon)


def test_canonical_keeps_longest_per_cluster(spark):
    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.dedup import (
        select_canonical_per_cluster,
    )

    comps = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)], "id long, component long"
    )
    docs = spark.createDataFrame(
        [(1, 50), (2, 90), (3, 90), (10, 5), (11, 5)], "doc_id long, n_chars long"
    )
    got = {r.doc_id: r.keep for r in select_canonical_per_cluster(comps, docs).collect()}
    # longest wins; tie (2 vs 3 at 90) breaks to smaller id
    assert got == {1: False, 2: True, 3: False, 10: True, 11: False}


def test_incremental_dedup_only_reports_cross_corpus_pairs(spark):
    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.dedup import (
        dedup_against_base,
    )

    text = "the quick brown fox jumps over the lazy dog again and again today"
    base = spark.createDataFrame(
        [(1, text), (2, text)],  # exact dups INSIDE base: must not be reported
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(100, text + " ok"), (101, "completely different words entirely here now")],
        "doc_id long, text string",
    )
    got = dedup_against_base(base, new, "doc_id", "text").collect()
    assert {r.new_id for r in got} == {100}
    assert {r.base_id for r in got} == {1, 2}
    for r in got:
        assert r.jaccard_permille >= 300


def test_duplicated_span_stats_planted_repeat(spark):
    """Round-6 q123: a verbatim 8-token span shared by two docs must
    surface as longest_dup_span_tokens=8 in both (4 consecutive
    duplicated 5-gram positions -> run 4 + n-1); a doc with no
    repeated shingles reports 0; an intra-doc self-repeat counts."""
    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.dedup import (
        duplicated_span_stats,
    )

    span = "w1 w2 w3 w4 w5 w6 w7 w8"
    docs = spark.createDataFrame(
        [
            (1, f"a b c {span} d e f"),
            (2, f"x y {span} z q r"),
            (3, "u1 u2 u3 u4 u5 u6 u7"),            # unique everywhere
            (4, "s t p q r m s t p q r m n"),        # self-repeat of 6 tokens
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in duplicated_span_stats(docs).collect()}
    assert out[1].longest_dup_span_tokens == 8
    assert out[2].longest_dup_span_tokens == 8
    assert out[3].longest_dup_span_tokens == 0 and out[3].n_dup_shingles == 0
    # doc 4: "s t p q r m" repeats (positions 1 and 7) -> two duplicated
    # 5-gram starts per copy ("s t p q r", "t p q r m") -> span 6
    assert out[4].longest_dup_span_tokens == 6
    assert out[1].n_shingles == 10  # 14 tokens, 5-grams
    assert out[1].dup_ppm == out[1].n_dup_shingles * 1000000 // 10


def test_passage_scrub_semantics(spark):
    """q141's rewrite contract on crafted docs (w=3 for readability):
    the first (doc_id, position) occurrence of a duplicated passage
    survives, later ones are cut, trailing <w remainders and short
    docs ride through verbatim, and a doc reduced to nothing yields
    the empty string rather than NULL."""
    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.dedup import (
        passage_scrub,
    )

    dup = "x y z"  # one full 3-word passage, duplicated everywhere
    docs = spark.createDataFrame(
        [
            (1, f"{dup} a b c tail1"),   # canonical copy + unique + tail
            (2, f"{dup} d e f"),         # later copy cut, unique kept
            (3, dup),                     # later copy cut -> empty doc
            (4, "short doc"),            # < w words: whole text is tail
            (5, f"p q r {dup}"),         # dup at position 1, cut
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.n_passages, r.n_removed, r.clean_text)
        for r in passage_scrub(docs, w=3).collect()
    }
    assert out[1] == (2, 0, "x y z a b c tail1")
    assert out[2] == (2, 1, "d e f")
    assert out[3] == (1, 1, "")
    assert out[4] == (0, 0, "short doc")
    assert out[5] == (2, 1, "p q r")
    # within-doc repeats: second occurrence in the SAME doc is cut too
    solo = spark.createDataFrame(
        [(9, f"{dup} {dup} end")], "doc_id long, text string"
    )
    r = passage_scrub(solo, w=3).collect()[0]
    assert (r.n_passages, r.n_removed, r.clean_text) == (2, 1, "x y z end")


def test_passage_scrub_packed_key_guard(spark):
    """ADVICE r7: the packed key k = id·2^20 + i silently corrupts
    canonical selection for negative or >= 2^43 doc ids (negative ids
    also beat the incremental -1 base sentinel). The kernel must fail
    LOUDLY at key-build time instead."""
    import pytest
    from py4j.protocol import Py4JJavaError

    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.dedup import (
        passage_scrub,
        passage_scrub_incremental,
    )

    for bad_id in (-1, 1 << 43):
        bad = spark.createDataFrame(
            [(bad_id, "a b c d e f")], "doc_id long, text string"
        )
        with pytest.raises(Exception) as exc:
            passage_scrub(bad, w=3).collect()
        assert "packed-key overflow" in str(exc.value)
    # the incremental path shares the guard on its batch side
    base = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    batch = spark.createDataFrame([(-7, "a b c x y z")], "doc_id long, text string")
    with pytest.raises(Exception) as exc:
        passage_scrub_incremental(base, batch, w=3).collect()
    assert "packed-key overflow" in str(exc.value)
    # in-range ids at the boundary still work (id = 2^43 - 1)
    ok = spark.createDataFrame(
        [((1 << 43) - 1, "a b c d e")], "doc_id long, text string"
    )
    row = passage_scrub(ok, w=3).collect()[0]
    assert (row.n_passages, row.n_removed) == (1, 0)


def test_passage_scrub_matches_python_replica(spark):
    """Property-pin q141's kernel against a pure-Python replica over
    random small-alphabet corpora (repeated words force cross- and
    within-doc passage collisions): per-doc passage counts, removal
    counts, the rebuilt text, and its length must all match."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.dedup import (
        passage_scrub,
    )

    w = 3
    corpus = st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "aa"]), min_size=0, max_size=14).map(
            " ".join
        ),
        min_size=1,
        max_size=8,
    )

    def replica(docs):
        segs = []
        for doc_id, text in docs:
            ws = text.split(" ")
            if len(ws) < w:
                segs.append((doc_id, 0, " ".join(ws), True))
            else:
                nfull = len(ws) // w
                for i in range(nfull):
                    segs.append((doc_id, i, " ".join(ws[i * w:(i + 1) * w]), False))
                if len(ws) % w:
                    segs.append((doc_id, nfull, " ".join(ws[nfull * w:]), True))
        mins = {}
        for d, i, s, t in segs:
            if not t:
                k = d * (1 << 20) + i
                mins[s] = min(mins.get(s, k), k)
        out = {}
        for doc_id, _ in docs:
            kept, removed, npass = [], 0, 0
            for d, i, s, t in segs:
                if d != doc_id:
                    continue
                if not t:
                    npass += 1
                if t or mins[s] == d * (1 << 20) + i:
                    kept.append((i, s))
                else:
                    removed += 1
            kept.sort()
            ct = " ".join(s for _, s in kept)
            out[doc_id] = (npass, removed, ct, len(ct))
        return out

    @settings(max_examples=8, deadline=None)
    @given(corpus)
    def run(texts):
        docs = list(enumerate(texts))
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r.doc_id: (r.n_passages, r.n_removed, r.clean_text, r.clean_chars)
            for r in passage_scrub(df, w=w).collect()
        }
        assert got == replica(docs)

    run()


def test_passage_scrub_incremental_semantics(spark):
    """q142's batch×base contract (w=3): a batch passage present
    anywhere in the base is removed (base wins by seniority, even
    when the batch position key is smaller), within-batch duplicates
    keep only the first occurrence, unseen passages and tails ride
    through, and the base is never rewritten (operator returns batch
    rows only)."""
    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.dedup import (
        passage_scrub_incremental,
    )

    base = spark.createDataFrame(
        [(100, "x y z old stuff here")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (1, "x y z fresh words tail"),   # first passage in base -> cut
            (2, "a b c a b c"),              # within-batch self-dup
            (3, "a b c"),                    # dup of doc 2's canonical -> cut
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.n_passages, r.n_removed, r.clean_text)
        for r in passage_scrub_incremental(base, batch, w=3).collect()
    }
    assert set(out) == {1, 2, 3}, "only batch docs are rewritten"
    assert out[1] == (2, 1, "fresh words tail")
    assert out[2] == (2, 1, "a b c")
    assert out[3] == (1, 1, "")


def test_prefix_filter_equals_bruteforce_and_prunes_hot_token(spark):
    """q166 (round-12): prefix filtering must return EXACTLY the
    brute-force Jaccard-≥-t pairs (no false negatives — the pigeonhole
    property), while a corpus stopword shared by EVERY doc (the hot
    inverted-index key) never generates candidates by itself: the two
    docs that share ONLY the stopword are not candidates at all."""
    from pyspark.sql import functions as F

    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.dedup import (
        jaccard_pairs,
        prefix_filter_candidates,
        prefix_filter_jaccard_pairs,
    )

    # (id, shingle) sets: HOT appears in every doc. Docs 1/2 are true
    # near-dups (J=3/4 ≥ 0.5); docs 3/4 share ONLY the hot token
    # (J=1/5 < 0.5) and must be pruned before verification.
    rows = [
        (1, ["HOT", "a", "b", "c"]),
        (2, ["HOT", "a", "b", "d"]),
        (3, ["HOT", "x1", "x2"]),
        (4, ["HOT", "y1", "y2"]),
    ]
    sh = spark.createDataFrame(
        [(i, s) for i, toks in rows for s in toks], "doc_id long, shingle string"
    )

    got = sorted(
        (r.id1, r.id2, r.inter_ct, r.union_ct, r.jaccard_permille)
        for r in prefix_filter_jaccard_pairs(sh, "doc_id", 500).collect()
    )
    brute = sorted(
        (r.id1, r.id2, r.inter_ct, r.union_ct, r.jaccard_permille)
        for r in jaccard_pairs(sh, "doc_id", min_permille=500).collect()
    )
    assert got == brute == [(1, 2, 3, 5, 600)]

    cand = {
        (r.id1, r.id2)
        for r in prefix_filter_candidates(sh, "doc_id", 500).collect()
    }
    assert (1, 2) in cand
    assert (3, 4) not in cand, (
        "the hot-token-only pair must be pruned BEFORE verification — "
        "that pruning is the entire point of the prefix filter"
    )
    # the stopword sorts last in the rarest-first order, so prefixes
    # (length 4-2+1=3 for docs 1/2, 3-2+1=2 for docs 3/4) exclude it
    assert all(a < b for a, b in cand)


def test_positional_filter_prunes_prefix_collision(spark):
    """Round-13: the WWW'08 positional filter must prune a candidate
    whose shared prefix token sits too LATE in one set for the overlap
    to ever reach ceil(t(sa+sb)/(1+t)) — a pair the prefix filter
    alone would pass to verification — while leaving the exact result
    set untouched (lossless)."""
    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.dedup import (
        jaccard_pairs,
        prefix_filter_candidates,
        prefix_filter_jaccard_pairs,
    )

    # dfs by construction: u1/u2 df=1; C df=2 (docs 1+2 only); f1..f4
    # df=3 (one filler doc each reuses them). Ascending order puts C
    # at pos 3 of doc 1 (after its two df-1 tokens, inside the
    # length-3 prefix) and pos 1 of doc 2 — positional bound
    # min(3,1)+min(4-3,4-1) = 2 < alpha = ceil(0.5*8/1.5) = 3, so the
    # (1,2) candidate the prefix join generates via C is pruned.
    rows = [
        (1, ["u1", "u2", "C", "f1"]),
        (2, ["C", "f2", "f3", "f4"]),
        (3, ["f1", "f2", "f3", "z1"]),
        (4, ["f1", "f2", "f4", "z2"]),
        (5, ["f3", "f4", "z3", "z4"]),
    ]
    sh = spark.createDataFrame(
        [(i, s) for i, toks in rows for s in toks], "doc_id long, shingle string"
    )
    cand = {
        (r.id1, r.id2)
        for r in prefix_filter_candidates(sh, "doc_id", 500).collect()
    }
    assert (1, 2) not in cand, (
        "docs 1/2 share prefix token C, so only the positional filter "
        "can prune them — it did not"
    )
    got = sorted(
        (r.id1, r.id2, r.jaccard_permille)
        for r in prefix_filter_jaccard_pairs(sh, "doc_id", 500).collect()
    )
    brute = sorted(
        (r.id1, r.id2, r.jaccard_permille)
        for r in jaccard_pairs(sh, "doc_id", min_permille=500).collect()
    )
    assert got == brute, "positional filter lost a true pair"


def test_pruning_audit_fires_on_degenerate_token_order(spark):
    """Round-13 (verdict item 3): the q166 pruning audit must FIRE
    when the prefix filter degenerates. Hottest-first token order puts
    the corpus stopword at the head of every prefix, so every pair
    becomes a candidate — the exact failure the (fixed) candidate-count
    assert exists to catch; the healthy rarest-first order on the same
    corpus yields zero candidates and passes."""
    import pytest

    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.dedup import (
        _assert_pruning_engaged,
        prefix_filter_candidates,
    )

    rows = [(i, ["HOT", f"a{i}", f"b{i}"]) for i in range(1, 5)]
    sh = spark.createDataFrame(
        [(i, s) for i, toks in rows for s in toks], "doc_id long, shingle string"
    )
    healthy = prefix_filter_candidates(sh, "doc_id", 500).count()
    _assert_pruning_engaged(healthy, 4)  # passes: stopword sorts last
    assert healthy == 0

    degenerate = prefix_filter_candidates(
        sh, "doc_id", 500, _token_order="desc"
    ).count()
    assert degenerate == 6, "hottest-first must make every pair a candidate"
    with pytest.raises(AssertionError, match="degenerated to all-pairs"):
        _assert_pruning_engaged(degenerate, 4)


def test_verify_with_precomputed_sizes_is_identical(spark):
    """Round-14 (optimization): q166 materializes the per-doc sizes
    aggregate once and hands it to ``verify_jaccard_candidates`` (the
    same frame also supplies the pruning audit's doc count). The
    precomputed-sizes path must be value-identical to the default
    recompute-from-sh path on every output column."""
    from pyspark.sql import functions as F

    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.dedup import (
        prefix_filter_candidates,
        verify_jaccard_candidates,
    )

    rows = [
        (1, ["a", "b", "c", "d"]),
        (2, ["a", "b", "c", "e"]),
        (3, ["a", "x1", "x2"]),
        (4, ["b", "y1", "y2"]),
    ]
    sh = spark.createDataFrame(
        [(i, s) for i, toks in rows for s in toks], "doc_id long, shingle string"
    )
    cand = prefix_filter_candidates(sh, "doc_id", 500)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    cols = ("id1", "id2", "inter_ct", "union_ct", "jaccard_permille")
    default = sorted(
        tuple(r[c] for c in cols)
        for r in verify_jaccard_candidates(sh, cand, "doc_id", 500).collect()
    )
    precomputed = sorted(
        tuple(r[c] for c in cols)
        for r in verify_jaccard_candidates(
            sh, cand, "doc_id", 500, sizes=sizes
        ).collect()
    )
    assert default == precomputed and default, (
        "precomputed-sizes verify path diverged from the default path"
    )
    # the audit doc count q166 now derives from the sizes frame must
    # equal the distinct doc count it previously computed
    assert sizes.count() == sh.select("doc_id").distinct().count()
