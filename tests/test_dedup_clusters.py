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
