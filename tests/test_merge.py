"""Unit tests for operators/merge.py (C2/C3/C4 semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_data_pipeline_for_restaurant_analytics_spark.operators.merge import (
    Scd2Config,
    apply_scd2,
    change_feed,
    duplicate_key_audit,
    latest_per_key,
    merge_upsert,
)

TS = "ts timestamp"


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_merge_upsert_guarded(spark):
    target = _df(spark, [(1, "a", "x"), (2, "b", "y")], "id long, v string, w string")
    source = _df(spark, [(2, "b", "y"), (3, "c", "z")], "id long, v string, w string")
    out = merge_upsert(target, source, ["id"], ["v", "w"])
    got = {r.id: (r.v, r.w) for r in out.collect()}
    assert got == {1: ("a", "x"), 2: ("b", "y"), 3: ("c", "z")}


def test_merge_upsert_null_safe_guard(spark):
    # NULL == NULL must be treated as unchanged (EQUAL_NULL, P10)
    target = _df(spark, [(1, None)], "id long, v string")
    source = _df(spark, [(1, None)], "id long, v string")
    out = merge_upsert(target, source, ["id"], ["v"], modified_col="v", batch_ts=F.lit("CHANGED"))
    assert out.collect()[0].v is None  # not stamped → guard held


def test_change_feed_vocabulary(spark):
    prev = _df(spark, [(1, "a"), (2, "b"), (3, "c")], "id long, v string")
    curr = _df(spark, [(1, "a"), (2, "B"), (4, "d")], "id long, v string")
    feed = change_feed(prev, curr, ["id"])
    rows = {(r.id, r.action, r.metadata_isupdate) for r in feed.collect()}
    assert rows == {
        (4, "INSERT", False),  # new key
        (3, "DELETE", False),  # removed key
        (2, "DELETE", True),  # update pre-image
        (2, "INSERT", True),  # update post-image
    }
    # update DELETE row carries the previous image (Snowflake semantics)
    pre = [r for r in feed.collect() if r.id == 2 and r.action == "DELETE"][0]
    assert pre.v == "b"


def test_change_feed_bootstrap(spark):
    curr = _df(spark, [(1, "a")], "id long, v string")
    feed = change_feed(None, curr, ["id"])
    r = feed.collect()[0]
    assert r.action == "INSERT" and r.metadata_isupdate is False


def test_latest_per_key(spark):
    df = _df(spark, [(1, 1, "old"), (1, 2, "new"), (2, 1, "only")], "id long, seq long, v string")
    out = latest_per_key(df, ["id"], [F.col("seq").desc()])
    got = {r.id: r.v for r in out.collect()}
    assert got == {1: "new", 2: "only"}


def test_apply_scd2_noop_on_identical(spark):
    batch = _df(
        spark,
        [(1, "a", "2024-01-01 00:00:00")],
        "id long, v string, created string",
    ).withColumn("created", F.col("created").cast("timestamp"))
    cfg = Scd2Config(key=["id"], attrs=["v"], created_col="created")
    t0 = F.lit("2024-01-01 21:30:00").cast("timestamp")
    dim = apply_scd2(None, batch, cfg, t0)
    # same batch again → no new versions, still exactly one current row
    t1 = F.lit("2024-01-02 21:30:00").cast("timestamp")
    dim2 = apply_scd2(dim, batch, cfg, t1)
    rows = dim2.collect()
    assert len(rows) == 1 and rows[0].is_current
    assert str(rows[0].eff_start_date).startswith("2024-01-01 00:00")  # from created (v3)


def test_duplicate_key_audit(spark):
    df = _df(spark, [(1, "a"), (2, "b"), (2, "c"), (2, "d")], "id long, v string")
    got = {(r.id, r.n_rows) for r in duplicate_key_audit(df, ["id"]).collect()}
    assert got == {(2, 3)}
    clean = latest_per_key(df, ["id"], [F.col("v").desc()])
    assert duplicate_key_audit(clean, ["id"]).count() == 0


def test_apply_deletes_closes_current_versions(spark):
    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.merge import (
        apply_deletes,
        apply_scd2,
        change_feed,
    )

    batch = _df(spark, [(1, "a"), (2, "b")], "id long, v string")
    cfg = Scd2Config(key=["id"], attrs=["v"], created_col=None)
    t0 = F.lit("2024-05-01 21:30:00").cast("timestamp")
    dim = apply_scd2(None, batch, cfg, t0)

    # key 2 disappears from the next snapshot → DELETE in the feed
    nxt = _df(spark, [(1, "a")], "id long, v string")
    feed = change_feed(batch, nxt, ["id"])
    deleted = feed.filter("action = 'DELETE' AND NOT metadata_isupdate")
    t1 = F.lit("2024-05-02 21:30:00").cast("timestamp")
    dim2 = apply_deletes(dim, deleted, ["id"], t1)

    rows = {r.id: r for r in dim2.collect()}
    assert rows[1].is_current and rows[1].eff_end_date is None
    assert not rows[2].is_current
    assert str(rows[2].eff_end_date).startswith("2024-05-02 21:30")
    # idempotent: deleting an already-closed key changes nothing
    dim3 = apply_deletes(dim2, deleted, ["id"], F.lit("2024-05-03 00:00:00").cast("timestamp"))
    assert sorted(map(tuple, dim3.collect())) == sorted(map(tuple, dim2.collect()))


def test_null_business_keys_survive_all_merge_ops(spark):
    """Review r8: presence was read off key nullability, so NULL
    business keys — the exact case the eqNullSafe joins exist for —
    were wiped (merge_upsert), dropped (apply_scd2), invisible
    (change_feed), or never closed (apply_deletes)."""
    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.merge import (
        Scd2Config,
        apply_deletes,
        apply_scd2,
        change_feed,
        merge_upsert,
    )

    # merge_upsert: target-only NULL-key row keeps its attributes
    target = spark.createDataFrame([(None, "keep"), (1, "a")], "id long, v string")
    source = spark.createDataFrame([(1, "a2")], "id long, v string")
    got = {r.id: r.v for r in merge_upsert(target, source, ["id"], ["v"]).collect()}
    assert got == {None: "keep", 1: "a2"}

    # apply_scd2: NULL-key current row survives an unrelated batch, and
    # a NULL-key batch change versions it properly
    cfg = Scd2Config(key=["id"], attrs=["v"])
    ts1 = F.lit("2024-01-01 00:00:00").cast("timestamp")
    ts2 = F.lit("2024-01-02 00:00:00").cast("timestamp")
    dim = apply_scd2(None, target, cfg, ts1)
    dim2 = apply_scd2(dim, source, cfg, ts2)  # batch without the NULL key
    nk = dim2.filter("id IS NULL").collect()
    assert len(nk) == 1 and nk[0].v == "keep" and nk[0].is_current
    dim3 = apply_scd2(
        dim2, spark.createDataFrame([(None, "v2")], "id long, v string"), cfg, ts2
    )
    nk3 = sorted((r.v, r.is_current) for r in dim3.filter("id IS NULL").collect())
    assert nk3 == [("keep", False), ("v2", True)]

    # change_feed: NULL-key update emits the DELETE/INSERT pair
    prev = spark.createDataFrame([(None, "a")], "id long, v string")
    curr = spark.createDataFrame([(None, "b")], "id long, v string")
    feed = sorted(
        (r.action, r.metadata_isupdate, r.v)
        for r in change_feed(prev, curr, ["id"]).collect()
    )
    assert feed == [("DELETE", True, "a"), ("INSERT", True, "b")]

    # apply_deletes: a NULL-key delete closes the NULL-key version
    deleted = spark.createDataFrame([(None,)], "id long")
    closed = apply_deletes(dim3, deleted, ["id"], ts2)
    assert closed.filter("id IS NULL AND is_current").count() == 0
    assert closed.filter("id IS NULL").count() == 2  # history preserved


def test_latest_per_key_deterministic_on_ties(spark):
    """Review r8: with a constant fallback order (or created_col
    ties), the dedup winner was shuffle-order-dependent. The
    all-column hash tie-break makes it value-determined: the same
    input picks the same row on every run and partitioning."""
    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.merge import (
        latest_per_key,
    )

    rows = [(1, "a"), (1, "b"), (1, "c"), (2, "x")]
    runs = set()
    for n_parts in (1, 3, 7):
        df = spark.createDataFrame(rows, "id long, v string").repartition(n_parts)
        got = tuple(
            sorted(
                (r.id, r.v)
                for r in latest_per_key(df, ["id"], [F.lit(1)]).collect()
            )
        )
        runs.add(got)
    assert len(runs) == 1, f"dedup winner must not depend on partitioning: {runs}"


def test_snapshot_diff_null_vs_value_is_update(spark):
    """Review r8: the docstring promises null-safe value comparison,
    but != classified NULL-vs-5 as 'unchanged'."""
    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.cdc import (
        snapshot_diff,
    )

    old = spark.createDataFrame([(1, None), (2, 7)], "id long, n long")
    new = spark.createDataFrame([(1, 5), (2, 7)], "id long, n long")
    got = {r.id: r.change_type for r in snapshot_diff(old, new, ["id"], ["n"]).collect()}
    assert got == {1: "update", 2: "unchanged"}


def test_q161_audit_structure(spark):
    """q161 (round-12, A4): the registered duplicate-key audit. The
    merge-built clean table audits EMPTY (zero 'post_merge' rows); the
    injected double-apply yields exactly the k%7 / k%13 keys with
    multiplicity 2 / 3 (4 at the lcm); the audited segment proves the
    C6 dedup winner ('MOVED-', never 'STALE-') and the day-2 merge
    landed. The DuckDB oracle hash-checks every value; this pins the
    intended shape in one readable place."""
    from real_time_data_pipeline_for_restaurant_analytics_spark.registry import (
        all_queries,
    )

    rows = (
        all_queries()["q161_duplicate_key_audit"]
        .build(spark, "/root/testdata/sf0.001")
        .collect()
    )
    assert not [r for r in rows if r.table_state == "post_merge"], (
        "post-merge clean table must audit clean"
    )
    inj = {r.customer_id: r for r in rows if r.table_state == "injected"}
    assert inj, "injected corruption produced no audit rows"
    for k, r in inj.items():
        want = 1 + (k % 7 == 0) + 2 * (k % 13 == 0)
        assert r.n_rows == want, (k, r.n_rows, want)
        assert want > 1
        assert not r.segment.startswith("STALE-"), r
        if k % 10 in (0, 3):
            assert r.segment.startswith("MOVED-"), r
        else:
            assert not r.segment.startswith("MOVED-"), r
    # every multiplicity class realized
    assert {r.n_rows for r in inj.values()} == {2, 3, 4}
