"""Hot-key-bounded pair expansion (round-15, VERDICT r14 item 4).

The exact group-and-expand kernels (jaccard_pairs / containment_pairs)
expand each shingle bucket's sorted id list into upper-triangle pairs.
Round 15 bounds the per-row materialization: a bucket with m ids now
explodes through ⌈m/block⌉² block pairs instead of one m²/2 struct
array. These tests pin that the PAIR SET is bit-identical to the
direct expansion (which the old shape also passes) across every block
boundary shape, including a synthetic hot shingle far wider than the
block.
"""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

from real_time_data_pipeline_for_restaurant_analytics_spark.operators.dedup import (
    _expand_sorted_id_pairs,
    containment_pairs,
    jaccard_pairs,
    shingles,
)

_GROUPS_SCHEMA = StructType([StructField("ids", ArrayType(LongType()))])


def _direct_pairs(buckets: list[list[int]]) -> set[tuple[int, int]]:
    out: set[tuple[int, int]] = set()
    for ids in buckets:
        out.update(itertools.combinations(sorted(ids), 2))
    return out


def _expanded(spark, buckets: list[list[int]], block: int) -> list[tuple[int, int]]:
    groups = spark.createDataFrame(
        [(sorted(b),) for b in buckets], schema=_GROUPS_SCHEMA
    )
    rows = _expand_sorted_id_pairs(groups, block=block).select("p.id1", "p.id2").collect()
    return [(r.id1, r.id2) for r in rows]


def test_block_expansion_matches_direct_all_boundary_shapes(spark):
    # bucket sizes straddling every block-boundary case at block=4:
    # under, exactly one block, one-past, multiple full blocks, a
    # ragged tail of 1, and a hot bucket of 23 (6 blocks, last short)
    buckets = [
        [3, 1],
        [10, 11, 12, 13],
        [20, 21, 22, 23, 24],
        [30, 31, 32, 33, 34, 35, 36, 37],
        [40, 41, 42, 43, 44, 45, 46, 47, 48],
        list(range(100, 123)),
    ]
    got = _expanded(spark, buckets, block=4)
    assert len(got) == len(set(got)), "duplicate pair emitted"
    assert set(got) == _direct_pairs(buckets)


def test_hot_bucket_pair_multiset_per_bucket(spark):
    # two buckets sharing ids: the pair (1,2) must be emitted ONCE PER
    # BUCKET (the count is |∩|) — blocks must not dedup across buckets
    buckets = [[1, 2, 3], [1, 2]]
    got = _expanded(spark, buckets, block=2)
    assert sorted(got) == [(1, 2), (1, 2), (1, 3), (2, 3)]


def test_jaccard_pairs_with_hot_shingle_matches_python_reference(spark):
    # synthetic hot shingle: every doc shares the stop-gram 'a b c'
    # (bucket width = corpus size, far beyond a block of 4); distinct
    # tails make the jaccard values spread. Reference is pure Python
    # over the same shingle sets — the OLD direct-expansion shape
    # passes this test identically.
    import importlib

    dedup_mod = importlib.import_module(
        "real_time_data_pipeline_for_restaurant_analytics_spark.operators.dedup"
    )
    docs = [
        (i, "a b c " + " ".join(f"w{i}_{k}" for k in range(3)) + (" a b c d" if i % 2 else ""))
        for i in range(11)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "body"])
    sh = shingles(df, "doc_id", "body")

    def py_shingles(text: str) -> set[str]:
        ws = text.split()
        return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}

    ref = {}
    sets = {i: py_shingles(t) for i, t in docs}
    for i, j in itertools.combinations(sorted(sets), 2):
        inter = len(sets[i] & sets[j])
        if inter:
            union = len(sets[i] | sets[j])
            ref[(i, j)] = (inter, union, inter * 1000 // union)

    old_block = dedup_mod.PAIR_EXPAND_BLOCK
    dedup_mod.PAIR_EXPAND_BLOCK = 4
    try:
        got = {
            (r.id1, r.id2): (r.inter_ct, r.union_ct, r.jaccard_permille)
            for r in jaccard_pairs(sh, "doc_id", min_permille=0).collect()
        }
    finally:
        dedup_mod.PAIR_EXPAND_BLOCK = old_block
    assert got == ref


def test_containment_pairs_unchanged_by_block_width(spark):
    # containment kernel: pair sets at block widths 1, 3, and default
    # must be exceptAll-identical in both directions
    docs = [(i, " ".join(f"t{k}" for k in range(i, i + 6))) for i in range(8)]
    df = spark.createDataFrame(docs, ["doc_id", "body"])
    sh = shingles(df, "doc_id", "body").localCheckpoint()

    import importlib

    dedup_mod = importlib.import_module(
        "real_time_data_pipeline_for_restaurant_analytics_spark.operators.dedup"
    )
    base = containment_pairs(sh, "doc_id", min_permille=0)
    old_block = dedup_mod.PAIR_EXPAND_BLOCK
    try:
        dedup_mod.PAIR_EXPAND_BLOCK = 1
        narrow = containment_pairs(sh, "doc_id", min_permille=0)
        assert narrow.exceptAll(base).count() == 0
        assert base.exceptAll(narrow).count() == 0
    finally:
        dedup_mod.PAIR_EXPAND_BLOCK = old_block
