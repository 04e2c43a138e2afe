"""Guards for the round-2 scale fixes: LSH hot-bucket cap, sharded
token-packing window, as-of NULL-value semantics, as-of under key skew.

These pin behaviors the oracles can't see — a degenerate band bucket
only exists in adversarial data, and the single-reducer-vs-sharded
window distinction is invisible in results (identical bins, different
physical plan).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from real_time_data_pipeline_for_restaurant_analytics_spark.operators.asof import asof_join
from real_time_data_pipeline_for_restaurant_analytics_spark.operators.dedup import (
    lsh_bucket_stats,
    lsh_candidates,
)
from real_time_data_pipeline_for_restaurant_analytics_spark.operators.sampling import (
    pack_into_token_bins,
)
from real_time_data_pipeline_for_restaurant_analytics_spark.registry import all_queries

from .conftest import SF_SMOKE


def _bands(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, band_idx int, band_hash string")


def test_lsh_hot_bucket_cap_drops_degenerate_bucket(spark):
    # 30 docs colliding in one band bucket (a band with no
    # discriminating power) + one normal 2-doc bucket.
    hot = [(i, 0, "HOT") for i in range(30)]
    ok = [(100, 1, "OK"), (101, 1, "OK")]
    bands = _bands(spark, hot + ok)

    capped = lsh_candidates(bands, "doc_id", max_bucket_size=10)
    got = {(r.id1, r.id2) for r in capped.collect()}
    assert got == {(100, 101)}, "hot-bucket pairs must be dropped, normal pair kept"

    # Uncapped still expands everything (the exactness kernel).
    uncapped = lsh_candidates(bands, "doc_id", max_bucket_size=10_000)
    assert uncapped.count() == 30 * 29 // 2 + 1

    stats = lsh_bucket_stats(bands, "doc_id", max_bucket_size=10).collect()[0]
    assert stats.n_buckets == 2
    assert stats.n_over_cap == 1
    assert stats.ids_in_over_cap == 30


def test_pack_window_is_partitioned_no_single_reducer(spark):
    """The q44 cumsum must run in a shard-partitioned window: a global
    Window.orderBy funnels the whole corpus through one task. The plan
    therefore must not round-trip through an Exchange SinglePartition
    anywhere (the final orderBy is range-partitioned, not single)."""
    df = all_queries()["q44_token_packing"].build(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    assert "SinglePartition" not in plan, "token-packing cumsum fell back to one reducer"
    assert "hashpartitioning" in plan, "window exchange should hash-partition by shard"


def test_pack_shard_local_bins(spark):
    # shard_size=3 → ids 0-2 are shard 0, ids 3-5 shard 1. Shard 0's
    # running sum (9,18) crosses bin_tokens=10 at id 2; shard 1 must
    # restart at 0 regardless of shard 0's totals.
    rows = [(i, 9) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens int")
    out = pack_into_token_bins(df, "doc_id", "n_tokens", bin_tokens=10, shard_size=3)
    got = {r.doc_id: r.bin_id for r in out.collect()}
    assert got == {
        0: 0,  # cum_before 0
        1: 0,  # cum_before 9
        2: 1,  # cum_before 18 → local bin 1
        3: 1_000_000,  # new shard: cum_before resets to 0
        4: 1_000_000,
        5: 1_000_001,
    }


def _ts(h, m=0):
    return dt.datetime(2024, 5, 1, h, m)


def test_asof_null_right_value_preserved(spark):
    """A matched right row whose value is legitimately NULL must yield
    asof_value NULL with THAT row's timestamp — not silently inherit an
    earlier non-null value (the pre-struct bug class)."""
    left = spark.createDataFrame([("A", _ts(10))], "k string, lts timestamp")
    right = spark.createDataFrame(
        [("A", _ts(9), 1.0), ("A", _ts(9, 30), None)],
        "k string, rts timestamp, value double",
    )
    out = asof_join(left, right, key="k", left_ts="lts", right_ts="rts", value_cols=["value"]).collect()
    assert len(out) == 1
    assert out[0].asof_value is None
    assert out[0].asof_ts == _ts(9, 30)


def test_asof_join_under_key_skew(spark):
    """One dominant key (90% of rows) — the union+window formulation
    partitions by key, so a hot key lands in one task but semantics
    must not change. Verified against a brute-force pandas as-of."""
    import pandas as pd

    left_rows = [("HOT", _ts(8 + (i % 10), i % 60)) for i in range(900)] + [
        (f"k{i}", _ts(12, i % 60)) for i in range(100)
    ]
    right_rows = [("HOT", _ts(7 + (i % 12), (i * 7) % 60), float(i)) for i in range(200)] + [
        (f"k{i}", _ts(11, i % 60), float(1000 + i)) for i in range(0, 100, 2)
    ]
    left = spark.createDataFrame(left_rows, "k string, lts timestamp")
    right = (
        spark.createDataFrame(right_rows, "k string, rts timestamp, value double")
        .groupBy("k", "rts")
        .agg(F.max("value").alias("value"))
    )

    got = {
        (r.k, r.lts): (r.asof_value, r.asof_ts)
        for r in asof_join(
            left, right, key="k", left_ts="lts", right_ts="rts", value_cols=["value"]
        ).collect()
    }

    rp = right.toPandas()
    expected = {}
    for k, lts in left_rows:
        cand = rp[(rp.k == k) & (rp.rts <= lts)]
        if len(cand):
            best = cand.loc[cand.rts.idxmax()]
            expected[(k, lts)] = (best.value, best.rts.to_pydatetime())
        else:
            expected[(k, lts)] = (None, None)
    assert got == expected


def test_token_chunks_cover_every_token_exactly(spark):
    """Chunk-boundary properties over doc lengths 0..300: chunks tile
    [0, n) with stride = chunk - overlap, consecutive chunks overlap
    by exactly `overlap` (until the clipped tail), and every token is
    covered."""
    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.text import (
        CHUNK_OVERLAP,
        CHUNK_TOKENS,
        token_chunks,
    )

    docs = spark.createDataFrame(
        [(n, " ".join(["w"] * n) if n else "") for n in range(0, 301, 7)],
        "doc_id long, text string",
    )
    out = token_chunks(docs, "doc_id", "text").collect()
    stride = CHUNK_TOKENS - CHUNK_OVERLAP
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for n in range(0, 301, 7):
        # size(split('')) == 1 (one empty token) — n=0 behaves as n=1
        eff_n = max(n, 1)
        chunks = sorted(by_doc[n], key=lambda r: r.chunk_idx)
        assert chunks[0].start_tok == 0
        assert chunks[-1].end_tok == eff_n, f"doc {n}: tail not clipped to doc"
        for i, c in enumerate(chunks):
            assert c.start_tok == i * stride
            assert c.end_tok == min(i * stride + CHUNK_TOKENS, eff_n)
            assert c.chunk_len == c.end_tok - c.start_tok
        # full coverage, no gap: next chunk starts inside the previous
        for a, b in zip(chunks, chunks[1:]):
            assert b.start_tok < a.end_tok
        # no chunk beyond the one containing the last token
        if len(chunks) > 1:
            assert chunks[-1].start_tok < eff_n


def test_mixture_allocation_invariants(spark):
    """Rates are capped at 1e6; over-target strata get a rate that
    lands within one token of the target share; at/under-target
    strata keep everything."""
    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.sampling import (
        mixture_allocation,
    )

    rows = [("big", 10) for _ in range(900)] + [("small", 10) for _ in range(100)]
    df = spark.createDataFrame(
        [(i, s, t) for i, (s, t) in enumerate(rows)], "id long, src string, toks int"
    )
    out = {
        r.src: r
        for r in mixture_allocation(
            df, "src", "toks", {"big": 500000, "small": 500000}
        ).collect()
    }
    assert out["big"].share_ppm == 900000
    assert out["small"].share_ppm == 100000
    assert out["small"].sample_rate_ppm == 1000000  # under target: keep all
    # big must shrink to the 50% target: rate * tokens ≈ half the corpus
    kept = out["big"].sample_rate_ppm * out["big"].n_tokens / 1e6
    assert abs(kept - 5000) <= 10
    for r in out.values():
        assert 0 <= r.sample_rate_ppm <= 1000000


def test_simhash_hot_value_cap_bounds_id_arrays(spark):
    """Round-5 guard: one degenerate fingerprint (every boilerplate
    doc hashing identically) must not build an unbounded collect_list
    row or size^2 intra pairs; ids past the cap drop BEFORE the array
    exists, and the stats frame accounts for them."""
    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.dedup import (
        simhash_hamming_pairs,
        simhash_value_stats,
    )

    hot = [(i, 0x00FF) for i in range(30)]          # 30 ids, one value
    ok = [(100, 0x0F0F), (101, 0x0F0F)]             # normal 2-id value
    fp = spark.createDataFrame(hot + ok, "doc_id long, simhash int")

    capped = simhash_hamming_pairs(fp, "doc_id", max_ids_per_value=5)
    intra0 = capped.filter("hamming = 0").collect()
    # hot value contributes C(5,2)=10 pairs (ids 0..4 kept,
    # deterministic by id order), normal value contributes 1
    hot_pairs = [r for r in intra0 if r.id1 < 100]
    assert len(hot_pairs) == 10
    assert max(max(r.id1, r.id2) for r in hot_pairs) == 4
    assert len([r for r in intra0 if r.id1 >= 100]) == 1

    stats = simhash_value_stats(fp, "doc_id", max_ids_per_value=5).collect()[0]
    assert stats.n_values == 2
    assert stats.n_over_cap == 1
    assert stats.ids_dropped == 25

    # default cap is a no-op at sane group sizes
    full = simhash_hamming_pairs(fp, "doc_id")
    assert full.filter("hamming = 0 AND id1 < 100").count() == 30 * 29 // 2


def test_asof_join_sql_null_semantics(spark):
    """Review r8: SQL ASOF never matches a right row with a NULL
    timestamp (r.ts <= l.ts is NULL) and NULL keys never join —
    but ascending NULLS-FIRST window order and NULL-grouping
    partitionBy made both spurious matches before the right-side
    filter."""
    left = spark.createDataFrame(
        [("A", "2024-01-01 10:00:00"), (None, "2024-01-01 10:00:00")],
        "k string, lts string",
    )
    right = spark.createDataFrame(
        [("A", None, 7.0), (None, "2024-01-01 09:00:00", 5.0)],
        "k string, rts string, value double",
    )
    out = {
        r.k: (r.asof_value, r.asof_ts)
        for r in asof_join(
            left, right, key="k", left_ts="lts", right_ts="rts", value_cols=["value"]
        ).collect()
    }
    assert out["A"] == (None, None), "NULL-ts right row must never match"
    assert out[None] == (None, None), "NULL keys must never join to each other"
    # a real right row still matches normally
    right2 = spark.createDataFrame(
        [("A", "2024-01-01 09:30:00", 9.0)], "k string, rts string, value double"
    )
    got = asof_join(
        left, right2, key="k", left_ts="lts", right_ts="rts", value_cols=["value"]
    ).collect()
    assert {r.k: r.asof_value for r in got}["A"] == 9.0


def test_bloom_cross_type_keys_no_false_negatives(spark):
    """Review r8: xxhash64 is type-sensitive, so an int fact key probed
    against a bigint dim build produced FALSE NEGATIVES (silently
    dropped matches). The canonical string-cast hash input makes the
    no-false-negative guarantee hold across integer widths."""
    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.bloom import (
        bloom_semi_join,
    )

    fact = spark.range(0, 200).selectExpr("CAST(id AS INT) AS k", "id AS payload")
    dim = spark.range(0, 200, 3).selectExpr("CAST(id AS BIGINT) AS dk")  # every 3rd key
    got = sorted(r.k for r in bloom_semi_join(fact, dim, "k", "dk").collect())
    assert got == list(range(0, 200, 3)), "cross-width keys must not drop matches"


def test_bloom_auto_sizing_tracks_dim_count(spark):
    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.bloom import (
        sized_num_bits,
    )

    assert sized_num_bits(10) == 4096  # floor
    assert sized_num_bits(30000) == ((30000 * 10 + 63) // 64) * 64  # grows with keys
    assert sized_num_bits(30000) % 64 == 0
