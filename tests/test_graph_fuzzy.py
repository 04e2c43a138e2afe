"""Round-6 extension operators: blocked fuzzy entity resolution
(q133), integer PageRank over the event-transition graph (q134), and
shingle containment pairs (q135).

Each test pins the operator's algebra against a hand-computed or
pure-Python replica — the same pinning style as test_simhash64.py.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from real_time_data_pipeline_for_restaurant_analytics_spark.operators.dedup import (
    containment_pairs,
    fuzzy_blocked_matches,
    shingles,
)
from real_time_data_pipeline_for_restaurant_analytics_spark.plans.analytics import (
    event_pagerank,
)


# ---------------------------------------------------------------- q133


def _parts(spark, names):
    return spark.createDataFrame([(i, n) for i, n in enumerate(names)], ["pk", "nm"])


def test_fuzzy_pairs_exact_distances_and_counts(spark):
    # 'red bolt' / 'cold bolt' share the 'bolt' block; levenshtein = 3
    # ('red'→'cold'). 'red ring' is in another block — never compared.
    df = _parts(spark, ["red bolt", "cold bolt", "cold bolt", "red ring"])
    out = {
        (r.name1, r.name2): (r.edit_distance, r.n_entities1, r.n_entities2)
        for r in fuzzy_blocked_matches(df, "nm", max_dist=3).collect()
    }
    assert out == {("cold bolt", "red bolt"): (3, 2, 1)}


def test_fuzzy_max_dist_excludes_far_pairs(spark):
    # same block, distance 5 ('small'→'tiny') — excluded at max_dist=3,
    # included at 5.
    df = _parts(spark, ["small bolt", "tiny bolt"])
    assert fuzzy_blocked_matches(df, "nm", max_dist=3).count() == 0
    got = fuzzy_blocked_matches(df, "nm", max_dist=5).collect()
    assert [(r.name1, r.name2, r.edit_distance) for r in got] == [
        ("small bolt", "tiny bolt", 5)
    ]


def test_fuzzy_hot_block_cap_drops_block_loudly_sized(spark):
    # 3 distinct names in the 'bolt' block; cap at 2 drops the whole
    # block (the lsh_candidates max_bucket_size contract), cap at 3
    # keeps it.
    df = _parts(spark, ["red bolt", "wed bolt", "ted bolt"])
    assert fuzzy_blocked_matches(df, "nm", max_block_size=2).count() == 0
    assert fuzzy_blocked_matches(df, "nm", max_block_size=3).count() == 3


def test_fuzzy_block_template_allows_literal_regex_braces(spark):
    # classic prefix blocking uses a regex quantifier with literal
    # braces; only the documented {col} placeholder is substituted, so
    # this must not raise (str.format would KeyError on '{3}').
    df = _parts(spark, ["redbolt", "wedbolt", "blue ring"])
    out = {
        (r.name1, r.name2): r.edit_distance
        for r in fuzzy_blocked_matches(
            df, "nm", block_sql="regexp_extract({col}, '^.{3}', 0)", max_dist=3
        ).collect()
    }
    # 'red'/'wed' prefixes differ -> different blocks; craft a shared
    # 3-char prefix pair instead to prove the block actually keys.
    assert out == {}
    df2 = _parts(spark, ["boltred", "boltwed", "blue ring"])
    out2 = {
        (r.name1, r.name2): r.edit_distance
        for r in fuzzy_blocked_matches(
            df2, "nm", block_sql="regexp_extract({col}, '^.{3}', 0)", max_dist=3
        ).collect()
    }
    assert out2 == {("boltred", "boltwed"): 1}


def test_fuzzy_singleton_blocks_produce_no_pairs(spark):
    df = _parts(spark, ["red bolt", "red ring", "red anvil"])
    assert fuzzy_blocked_matches(df, "nm").count() == 0


def test_fuzzy_custom_block_template(spark):
    # first-token blocking puts 'red bolt'/'red ring' together instead.
    df = _parts(spark, ["red bolt", "red ring"])
    out = fuzzy_blocked_matches(
        df, "nm", block_sql="regexp_extract({col}, '^([^ ]+)', 1)", max_dist=4
    ).collect()
    assert [(r.name1, r.name2, r.edit_distance) for r in out] == [
        ("red bolt", "red ring", 4)
    ]


# ---------------------------------------------------------------- q134


def _events(spark, rows):
    """rows: (user_id, seq, event_type) → events frame with ts/event_id."""
    t0 = datetime.datetime(2024, 1, 1)
    data = [
        (i, t0 + datetime.timedelta(seconds=seq), u, et)
        for i, (u, seq, et) in enumerate(rows)
    ]
    return spark.createDataFrame(data, ["event_id", "ts", "user_id", "event_type"])


def _ref_pagerank(edges, nodes, n_iter):
    """Pure-Python replica of the integer ppm PageRank contract."""
    n = len(nodes)
    outw = {}
    for (s, _d), w in edges.items():
        outw[s] = outw.get(s, 0) + w
    score = {v: 1_000_000 // n for v in nodes}
    for _ in range(n_iter):
        sumc = {v: 0 for v in nodes}
        for (s, d), w in edges.items():
            sumc[d] += (score[s] * w) // outw[s]
        score = {v: 150_000 // n + (850 * sumc[v]) // 1000 for v in nodes}
    return score


def test_pagerank_uniform_cycle_is_stationary(spark):
    # a→b→c→a: the uniform vector is the exact fixed point of the
    # integer update (150000//3 + 850*333333//1000 = 333333).
    e = _events(spark, [("u", 0, "a"), ("u", 1, "b"), ("u", 2, "c"), ("u", 3, "a")])
    got = {r.event_type: r.pagerank_ppm for r in event_pagerank(e, n_iter=3).collect()}
    assert got == {"a": 333333, "b": 333333, "c": 333333}


def test_pagerank_matches_python_replica_on_asymmetric_graph(spark):
    # two users: u1 hammers a→b, u2 wanders b→c→a; node c has one
    # inbound edge, a has two distinct predecessors.
    rows = [
        ("u1", 0, "a"), ("u1", 1, "b"), ("u1", 2, "a"), ("u1", 3, "b"),
        ("u2", 0, "b"), ("u2", 1, "c"), ("u2", 2, "a"),
    ]
    e = _events(spark, rows)
    edges = {("a", "b"): 2, ("b", "a"): 1, ("b", "c"): 1, ("c", "a"): 1}
    want = _ref_pagerank(edges, ["a", "b", "c"], 3)
    got = {r.event_type: r.pagerank_ppm for r in event_pagerank(e, n_iter=3).collect()}
    assert got == want


def test_pagerank_source_only_node_gets_teleport_floor(spark):
    # 'x' appears only as a predecessor (no inbound edges): after any
    # iteration its score is exactly the teleport term 150000 div n.
    e = _events(spark, [("u", 0, "x"), ("u", 1, "y"), ("u", 2, "y")])
    got = {r.event_type: r.pagerank_ppm for r in event_pagerank(e, n_iter=2).collect()}
    assert got["x"] == 150_000 // 2
    assert got["y"] > got["x"]


# ---------------------------------------------------------------- q135


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_containment_subset_doc_scores_1000(spark):
    # small doc = a verbatim slice of the big doc: containment is
    # exactly 1000 permille while Jaccard is far below (3/10).
    big = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11"
    small = "w2 w3 w4 w5 w6"
    d = _docs(spark, [(1, big), (2, small)])
    sh = shingles(d, "doc_id", "text")
    out = containment_pairs(sh, "doc_id", min_permille=800).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.id1, r.id2, r.containment_permille) == (1, 2, 1000)
    assert r.min_sz == 3 and r.inter_ct == 3


def test_containment_threshold_excludes_low_overlap(spark):
    d = _docs(
        spark,
        [(1, "a b c d e f"), (2, "a b c x y z")],  # share only 1 of 4 shingles
    )
    sh = shingles(d, "doc_id", "text")
    assert containment_pairs(sh, "doc_id", min_permille=800).count() == 0
    low = containment_pairs(sh, "doc_id", min_permille=0).collect()
    assert [(r.id1, r.id2, r.containment_permille) for r in low] == [(1, 2, 250)]


# ------------------------------------------------------- property pins


def test_pagerank_random_graphs_match_replica(spark):
    """Random event sequences (varied users/types) must reproduce the
    pure-Python integer replica exactly — edges, teleport floors, and
    div-order all pinned at once."""
    import random

    rng = random.Random(7)
    for trial in range(4):
        types = ["a", "b", "c", "d", "e"][: rng.randint(2, 5)]
        rows = []
        for u in range(rng.randint(1, 4)):
            for s in range(rng.randint(1, 12)):
                rows.append((f"u{u}", s, rng.choice(types)))
        e = _events(spark, rows)
        # replica inputs derived independently from the same rows
        seen_types = sorted({t for _, _, t in rows})
        edges: dict = {}
        by_user: dict = {}
        for u, s, t in rows:
            by_user.setdefault(u, []).append((s, t))
        for u, seq in by_user.items():
            seq.sort()
            for (_, t1), (_, t2) in zip(seq, seq[1:]):
                edges[(t1, t2)] = edges.get((t1, t2), 0) + 1
        want = _ref_pagerank(edges, seen_types, 3)
        got = {
            r.event_type: r.pagerank_ppm for r in event_pagerank(e, n_iter=3).collect()
        }
        assert got == want, f"trial {trial}: {got} != {want}"


def test_fuzzy_matches_brute_force_replica(spark):
    """Blocked output must equal a brute-force all-pairs scan filtered
    to same-block pairs (blocking is an optimization, not a semantics
    change, within a block)."""
    import itertools
    import random

    rng = random.Random(11)
    adjs = ["red", "wed", "ted", "blue", "cold"]
    nouns = ["bolt", "ring"]
    names = [f"{rng.choice(adjs)} {rng.choice(nouns)}" for _ in range(30)]
    df = _parts(spark, names)

    def lev(a, b):
        la, lb = len(a), len(b)
        d = list(range(lb + 1))
        for i in range(1, la + 1):
            prev, d[0] = d[0], i
            for j in range(1, lb + 1):
                prev, d[j] = d[j], min(
                    d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1])
                )
        return d[lb]

    counts: dict = {}
    for n in names:
        counts[n] = counts.get(n, 0) + 1
    want = set()
    for n1, n2 in itertools.combinations(sorted(counts), 2):
        if n1.split()[-1] == n2.split()[-1] and lev(n1, n2) <= 3:
            want.add((n1, n2, lev(n1, n2), counts[n1], counts[n2]))
    got = {
        (r.name1, r.name2, r.edit_distance, r.n_entities1, r.n_entities2)
        for r in fuzzy_blocked_matches(df, "nm", max_dist=3).collect()
    }
    assert got == want


def test_containment_verified_equals_exact_on_candidates(spark):
    """q136 composition check: on a corpus whose near-dups are all
    LSH-candidates (identical + one-word-edit docs), the verified
    containment values must equal the exact q135 kernel's for the
    same pairs."""
    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.dedup import (
        containment_verified,
    )

    base = " ".join(f"tok{i}" for i in range(30))
    edited = base.replace("tok7", "zzz")
    d = _docs(spark, [(1, base), (2, base), (3, edited), (4, "totally different words here")])
    got = {
        (r.id1, r.id2): r.containment_permille
        for r in containment_verified(d, "doc_id", "text", min_permille=0).collect()
    }
    sh = shingles(d, "doc_id", "text")
    exact = {
        (r.id1, r.id2): r.containment_permille
        for r in containment_pairs(sh, "doc_id", min_permille=0).collect()
        if (r.id1, r.id2) in got
    }
    assert got == exact
    assert got[(1, 2)] == 1000  # identical docs
    assert 0 < got[(1, 3)] < 1000  # one-word edit


def test_candidate_restricted_verify_loses_no_pair(spark):
    """Round-14 invariant: the verify side of verified_near_dups is
    candidate-restricted (broadcast semi-join of the shingle table to
    candidate ids, materialized once) — the restriction must be
    lossless, i.e. identical to re-verifying against the FULL shingle
    table for the same candidate pairs."""
    from pyspark.sql import functions as F

    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.dedup import (
        lsh_bands,
        lsh_candidates,
        minhash_signatures,
        shingles,
        verified_near_dups,
    )

    base = " ".join(f"w{i}" for i in range(80))
    rows = [
        (1, base),
        (2, base),
        (3, base.replace("w33 ", "x ")),
        (4, "entirely unrelated content " + " ".join(f"u{i}" for i in range(30))),
        (5, "another disjoint doc " + " ".join(f"v{i}" for i in range(30))),
    ]
    d = _docs(spark, rows)
    got = {
        (r.id1, r.id2): (r.n_shared_bands, r.inter_ct, r.jaccard_permille)
        for r in verified_near_dups(d, "doc_id", "text", min_permille=0).collect()
    }
    # unrestricted reference: same candidate pairs, verify against the
    # full (never semi-joined) shingle table
    sig = minhash_signatures(d, "doc_id", "text")
    cands = lsh_candidates(lsh_bands(sig, "doc_id"), "doc_id").filter(
        F.col("n_shared_bands") >= 2
    )
    sh = shingles(d, "doc_id", "text")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        cands.join(sh.select(F.col("doc_id").alias("id1"), "shingle"), "id1")
        .join(sh.select(F.col("doc_id").alias("id2"), "shingle"), ["id2", "shingle"])
        .groupBy("id1", "id2", "n_shared_bands")
        .agg(F.count(F.lit(1)).alias("inter_ct"))
    )
    want = {
        (r.id1, r.id2): (
            r.n_shared_bands,
            r.inter_ct,
            r.inter_ct * 1000 // (r.sz1 + r.sz2 - r.inter_ct),
        )
        for r in inter.join(
            sizes.select(F.col("doc_id").alias("id1"), F.col("sz").alias("sz1")), "id1"
        )
        .join(sizes.select(F.col("doc_id").alias("id2"), F.col("sz").alias("sz2")), "id2")
        .collect()
    }
    assert got == want
    assert len(got) >= 2  # the candidate set is non-trivial
