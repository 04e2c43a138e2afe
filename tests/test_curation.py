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
