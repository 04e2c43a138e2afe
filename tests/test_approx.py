"""Error-bound contracts for the sketch operators (q35 is registered
rows-only; this is its exactness gate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_data_pipeline_for_restaurant_analytics_spark.catalog import load
from real_time_data_pipeline_for_restaurant_analytics_spark.operators.approx import (
    approx_user_stats,
)

from .conftest import SF_CORRECT


def test_approx_distinct_within_rsd(spark):
    events = load(spark, SF_CORRECT, "events")
    approx = {r.event_type: r.approx_users for r in approx_user_stats(events).collect()}
    exact = {
        r.event_type: r.exact
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    for et, ex in exact.items():
        rel_err = abs(approx[et] - ex) / ex
        assert rel_err < 0.05, f"{et}: approx={approx[et]} exact={ex} err={rel_err:.3f}"


def test_approx_quantiles_bracket_exact(spark):
    events = load(spark, SF_CORRECT, "events")
    got = {r.event_type: (r.value_p50, r.value_p95) for r in approx_user_stats(events).collect()}
    exact = {
        r.event_type: (r.q[0], r.q[1])
        for r in events.groupBy("event_type")
        .agg(F.expr("percentile(value, array(0.5, 0.95))").alias("q"))
        .collect()
    }
    for et, (p50, p95) in got.items():
        e50, e95 = exact[et]
        # GK with accuracy 10000 on ~thousands of rows is near-exact;
        # allow 2% of the exact value as slack.
        assert abs(p50 - e50) <= max(abs(e50) * 0.02, 1e-9), f"{et} p50 {p50} vs {e50}"
        assert abs(p95 - e95) <= max(abs(e95) * 0.02, 1e-9), f"{et} p95 {p95} vs {e95}"


def test_sketch_rollup_merge_equals_direct(spark):
    from real_time_data_pipeline_for_restaurant_analytics_spark.catalog import load
    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.approx import (
        sketch_rollup_daily_monthly,
    )
    from .conftest import SF_SMOKE

    ev = load(spark, SF_SMOKE, "events")
    rows = sketch_rollup_daily_monthly(ev).collect()
    assert rows, "rollup must produce at least one month"
    assert all(r.merge_exact for r in rows), "union of daily sketches must equal direct sketch"
    # estimate sanity: within 5% of exact distinct count per month
    from pyspark.sql import functions as F

    exact = {
        r.month: r.n
        for r in ev.groupBy(F.date_format("ts", "yyyy-MM").alias("month"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in rows:
        assert abs(r.merged_users - exact[r.month]) <= max(2, 0.05 * exact[r.month])


def test_cms_never_underestimates_and_is_tight_for_heavy_hitters(spark):
    """CM guarantee: every row of the sketch only overestimates (hash
    collisions add, never subtract), so min-over-rows >= exact. On a
    skewed stream the heavy hitter's estimate should also be TIGHT:
    collision noise is bounded by total_other_mass / width per row."""
    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.approx import (
        _CMS_WIDTH,
        cms_estimate_heavy_hitters,
    )

    rows = [(1, "e")] * 500 + [(u, "e") for u in range(2, 202)]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    out = {r["user_id"]: r for r in cms_estimate_heavy_hitters(df, top_n=5).collect()}
    assert all(r["never_underestimates"] for r in out.values())
    heavy = out[1]
    assert heavy["exact_n"] == 500
    # other mass is 200 rows over 256 buckets: slack < a few collisions
    assert heavy["cms_estimate"] - heavy["exact_n"] <= 200


def test_hll_from_scratch_error_bound_and_merge(spark):
    """Round-5 deterministic HLL twins: estimate within the 1024-
    register error envelope of exact, and the daily->monthly register
    merge equals the direct pass exactly (max associativity)."""
    from real_time_data_pipeline_for_restaurant_analytics_spark.registry import all_queries

    from .conftest import SF_CORRECT

    qs = all_queries()
    rows = qs["q106_hll_from_scratch"].build(spark, SF_CORRECT).collect()
    assert rows
    import math

    for r in rows:
        # The registered outputs are the INTEGER-DETERMINISTIC sketch
        # state (digest + raw estimator). The standard small-range
        # correction (linear counting when registers are mostly empty)
        # uses ln(), which is not bit-stable cross-engine, so it's
        # applied HERE from the same state — exactly what a production
        # reader of the sketch does.
        m = 1024
        v = m - r.n_registers
        est = m * math.log(m / v) if (v > 0 and r.hll_users <= 2.5 * m) else r.hll_users
        # sigma ~ 1.04/sqrt(1024) ~ 3.25% (raw) / ~sqrt(m)*... (lin);
        # allow a generous 4-sigma-ish envelope
        assert abs(est - r.exact_users) <= max(0.13 * r.exact_users, 10), (
            r.event_type, est, r.hll_users, r.exact_users
        )
        assert 1 <= r.n_registers <= 1024

    merged = qs["q107_hll_merge_rollup"].build(spark, SF_CORRECT).collect()
    assert merged
    for r in merged:
        assert r.merge_exact, r
        assert r.merged_users == r.direct_users


def test_hll_registers_bounded_per_group(spark):
    """Scale shape: register frame is <= 1024 rows per group whatever
    the corpus size, and rho stays inside the 50-bit hash field."""
    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.approx import (
        hll_registers,
    )

    df = spark.createDataFrame(
        [(i % 3, i) for i in range(20_000)], "grp int, user_id long"
    )
    regs = hll_registers(df, ["grp"], "user_id")
    sizes = {r.grp: r.n for r in regs.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert all(n <= 1024 for n in sizes.values())
    lo, hi = regs.agg(F.min("m_j"), F.max("m_j")).collect()[0]
    assert 1 <= lo and hi <= 51


def test_hll_register_merge_is_partition_invariant(spark):
    """Property: for ANY split of the input, max-merging per-split
    registers equals the single-pass registers exactly (the integer
    determinization makes this bit-exact, not approximate) — the
    invariant that lets daily partials roll up without rescans."""
    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.approx import (
        hll_registers,
    )

    df = spark.createDataFrame(
        [(i, (i * 2654435761) % 4000) for i in range(30_000)],
        "part int, user_id long",
    ).withColumn("part", F.col("part") % 7)  # 7 arbitrary splits

    whole = hll_registers(df.withColumn("g", F.lit(1)), ["g"], "user_id")
    split = hll_registers(df.withColumnRenamed("part", "g"), ["g"], "user_id")
    merged = split.groupBy("bucket").agg(F.max("m_j").alias("m_j"))
    diff = (
        whole.select("bucket", "m_j")
        .exceptAll(merged.select("bucket", "m_j"))
        .count()
    )
    assert diff == 0
    assert merged.count() == whole.count()
