"""Interval-overlap join semantics: exactness vs a literal overlap
cross-join, and the first-shared-bin rule emitting each pair once."""

from __future__ import annotations

from real_time_data_pipeline_for_restaurant_analytics_spark.operators.asof import (
    interval_overlap_join,
)


def _iv(spark, name, rows):
    return spark.createDataFrame(rows, f"{name}_id long, key long, {name}_s long, {name}_e long")


def test_overlap_join_matches_naive_and_dedups_multibin(spark):
    # bin = 10s; pair (a1, b1) shares 3 bins — must appear exactly once
    a = _iv(spark, "a", [(1, 7, 5, 35), (2, 7, 100, 110), (3, 8, 0, 10)])
    b = _iv(spark, "b", [(1, 7, 20, 60), (2, 7, 36, 40), (3, 9, 0, 100)])
    got = sorted(
        (r.a_id, r.b_id)
        for r in interval_overlap_join(
            a, b, "key", "a_s", "a_e", "b_s", "b_e", bin_seconds=10
        ).collect()
    )
    naive = sorted(
        (ra.a_id, rb.b_id)
        for ra in a.collect()
        for rb in b.collect()
        if ra.key == rb.key and ra.a_s <= rb.b_e and rb.b_s <= ra.a_e
    )
    assert got == naive
    assert len(got) == len(set(got)), "each overlapping pair exactly once"


def test_overlap_join_touching_endpoints_count(spark):
    # closed intervals: touching at a single point IS an overlap
    a = _iv(spark, "a", [(1, 1, 0, 10)])
    b = _iv(spark, "b", [(1, 1, 10, 20), (2, 1, 21, 30)])
    got = [(r.a_id, r.b_id) for r in interval_overlap_join(
        a, b, "key", "a_s", "a_e", "b_s", "b_e", bin_seconds=7
    ).collect()]
    assert got == [(1, 1)]
