"""Bloom join-pruning invariants: no false negatives (result equality
is also oracle-checked for q70), measured false-positive sanity, and
the pruning actually pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_data_pipeline_for_restaurant_analytics_spark.operators.bloom import (
    bloom_prune,
    bloom_semi_join,
    build_key_bloom,
)


def test_bloom_has_no_false_negatives(spark):
    dim = spark.range(0, 500).withColumnRenamed("id", "k")
    words = build_key_bloom(dim, "k", num_bits=6400)
    fact = spark.range(0, 500).withColumnRenamed("id", "fk")
    kept = bloom_prune(fact, "fk", words, num_bits=6400).count()
    assert kept == 500  # every true member must survive


def test_bloom_prunes_most_non_members(spark):
    dim = spark.range(0, 100).withColumnRenamed("id", "k")
    words = build_key_bloom(dim, "k", num_bits=48_000)
    fact = spark.range(10_000, 30_000).withColumnRenamed("id", "fk")
    kept = bloom_prune(fact, "fk", words, num_bits=48_000).count()
    # 20k non-members; at ~9.6 bits/key sizing the fp rate is well
    # under 5% — this is a determinism-backed bound, not a flake:
    # xxhash64 is fixed, so the count is the same on every run
    assert kept < 1000


def test_bloom_semi_join_equals_plain_semi_join(spark):
    dim = spark.range(0, 200).select((F.col("id") * 3).alias("k"))
    fact = spark.range(0, 2000).select(F.col("id").alias("fk"), (F.col("id") % 7).alias("v"))
    got = sorted(r.fk for r in bloom_semi_join(fact, dim, "fk", "k", num_bits=6400).collect())
    want = sorted(
        r.fk for r in fact.join(dim.withColumnRenamed("k", "fk"), "fk", "left_semi").collect()
    )
    assert got == want


def test_empty_dim_prunes_everything(spark):
    dim = spark.range(0, 0).withColumnRenamed("id", "k")
    words = build_key_bloom(dim, "k", num_bits=6400)
    fact = spark.range(0, 100).withColumnRenamed("id", "fk")
    assert bloom_prune(fact, "fk", words, num_bits=6400).count() == 0


def test_fractional_keys_fail_loudly(spark):
    """ADVICE r9: an int key 5 canonicalizes to '5' but a double 5.0
    to '5.0', so a float/decimal build or probe side would silently
    false-negative rows the exact join matches — the operator must
    refuse instead."""
    import pytest

    ints = spark.range(0, 10).withColumnRenamed("id", "k")
    dbls = spark.range(0, 10).select(F.col("id").cast("double").alias("k"))
    decs = spark.range(0, 10).select(F.col("id").cast("decimal(10,2)").alias("k"))

    with pytest.raises(TypeError, match="double"):
        build_key_bloom(dbls, "k", num_bits=6400)
    words = build_key_bloom(ints, "k", num_bits=6400)
    with pytest.raises(TypeError, match="double"):
        bloom_prune(dbls.withColumnRenamed("k", "fk"), "fk", words, num_bits=6400)
    with pytest.raises(TypeError, match="decimal"):
        bloom_semi_join(decs.withColumnRenamed("k", "fk"), ints, "fk", "k")
    # scale-0 decimals render as plain digits — compatible with ints
    dec0 = spark.range(0, 10).select(F.col("id").cast("decimal(20,0)").alias("fk"))
    assert bloom_semi_join(dec0, ints, "fk", "k", num_bits=6400).count() == 10


def test_cross_family_keys_fail_loudly(spark):
    """Review r9: individually-valid dtypes from DIFFERENT
    canonicalization families (int vs string, date vs timestamp) still
    render equal values as different strings — bloom_semi_join, which
    holds both frames, must refuse the pair."""
    import pytest

    ints = spark.range(0, 10).withColumnRenamed("id", "k")
    strs = spark.range(0, 10).select(
        F.lpad(F.col("id").cast("string"), 2, "0").alias("fk")  # '05' != '5'
    )
    with pytest.raises(TypeError, match="families differ"):
        bloom_semi_join(strs, ints, "fk", "k")

    dates = spark.sql(
        "SELECT DATE '2024-01-01' + CAST(id AS INT) AS k FROM range(5)"
    )
    tss = spark.sql(
        "SELECT CAST(DATE '2024-01-01' + CAST(id AS INT) AS TIMESTAMP) AS fk FROM range(5)"
    )
    with pytest.raises(TypeError, match="families differ"):
        bloom_semi_join(tss, dates, "fk", "k")
    # same-family pairs still work: date-date round trip keeps all rows
    dfk = dates.withColumnRenamed("k", "fk")
    assert bloom_semi_join(dfk, dates, "fk", "k", num_bits=6400).count() == 5


def test_same_dtype_pairs_outside_listed_families_prune(spark):
    """ADVICE r10: a same-dtype pair outside the merged families
    (boolean=boolean, binary=binary) canonicalizes identically by
    construction — it must prune, not raise. timestamp vs
    timestamp_ntz, previously folded into one family, now refuses the
    pair: the ltz string rendering is session-timezone-dependent, so
    equal instants can render differently and be silently pruned."""
    import pytest

    bools = spark.range(0, 10).select((F.col("id") % 2 == 0).alias("k"))
    bfk = bools.withColumnRenamed("k", "fk")
    assert bloom_semi_join(bfk, bools, "fk", "k", num_bits=6400).count() == 10

    bins = spark.range(0, 10).select(
        F.encode(F.col("id").cast("string"), "utf-8").alias("k")
    )
    binfk = bins.withColumnRenamed("k", "fk")
    assert bloom_semi_join(binfk, bins, "fk", "k", num_bits=6400).count() == 10

    ltz = spark.sql("SELECT TIMESTAMP '2024-01-01 00:00:00' AS k FROM range(3)")
    ntz = spark.sql(
        "SELECT TIMESTAMP_NTZ '2024-01-01 00:00:00' AS fk FROM range(3)"
    )
    with pytest.raises(TypeError, match="families differ"):
        bloom_semi_join(ntz, ltz, "fk", "k")
