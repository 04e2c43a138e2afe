"""Round-6: storage-backend seam for the merge library.

The SAME SCD scenarios run through every backend the environment
provides: the snapshot-rewrite backend always, the Delta file-level
MERGE backend when delta-spark is importable (this sandbox has no
delta-spark, so that leg skips with the documented runbook — the
Kafka-connector boundary pattern). The scenario assertions are shared
verbatim, so a Delta-equipped environment certifies semantic parity
by running this file unchanged.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_data_pipeline_for_restaurant_analytics_spark.operators.merge import Scd2Config
from real_time_data_pipeline_for_restaurant_analytics_spark.sources.merge_backend import (
    DELTA_RUNBOOK,
    DeltaMergeBackend,
    SnapshotMergeBackend,
    has_delta,
)

_BACKENDS = [
    "snapshot",
    pytest.param(
        "delta",
        marks=pytest.mark.skipif(
            not has_delta(),
            reason="delta-spark not installed — documented boundary; "
            "see merge_backend.DELTA_RUNBOOK",
        ),
    ),
]


@pytest.fixture(params=_BACKENDS)
def backend(request, spark, tmp_path):
    if request.param == "snapshot":
        return SnapshotMergeBackend(spark, str(tmp_path), "dim")
    return DeltaMergeBackend(spark, str(tmp_path / "dim_delta"))


def _ts(s: str):
    return F.to_timestamp(F.lit(s))


def test_scd1_upsert_sequence(backend, spark):
    """Initial load → guarded update → identical no-op, through the
    backend's stored table."""
    b1 = spark.createDataFrame(
        [(1, "a", "2024-05-01"), (2, "b", "2024-05-01")],
        "id long, v string, modified string",
    )
    out = backend.merge_upsert(b1, ["id"], ["v"])
    assert {r.id: r.v for r in out.collect()} == {1: "a", 2: "b"}

    # changed row updates + stamps; untouched row keeps its stamp
    b2 = spark.createDataFrame(
        [(2, "B", "ignored"), (3, "c", "2024-05-02")],
        "id long, v string, modified string",
    )
    out = backend.merge_upsert(
        b2, ["id"], ["v"], modified_col="modified", batch_ts=F.lit("2024-05-02")
    )
    got = {r.id: (r.v, r.modified) for r in out.collect()}
    assert got[1] == ("a", "2024-05-01")
    assert got[2] == ("B", "2024-05-02")
    assert got[3] == ("c", "2024-05-02")

    # identical batch: change guard holds, stamp NOT refreshed
    b3 = spark.createDataFrame([(2, "B", "later")], "id long, v string, modified string")
    out = backend.merge_upsert(
        b3, ["id"], ["v"], modified_col="modified", batch_ts=F.lit("2024-05-03")
    )
    assert {r.id: r.modified for r in out.collect()}[2] == "2024-05-02"


def test_scd2_three_branches(backend, spark):
    """Close-out / new-version / first-insert across two days, with
    the v3 eff_start-from-created first-insert semantics."""
    cfg = Scd2Config(key=["id"], attrs=["city"], created_col="created")
    day1 = spark.createDataFrame(
        [(1, "Pune", "2024-05-01 08:00:00"), (2, "Delhi", "2024-05-01 09:00:00")],
        "id long, city string, created string",
    ).withColumn("created", F.to_timestamp("created"))
    out = backend.apply_scd2(day1, cfg, _ts("2024-05-01 12:00:00"))
    rows = {r.id: r for r in out.collect()}
    assert all(r.is_current for r in rows.values())
    assert str(rows[1].eff_start_date).startswith("2024-05-01 08:00")  # from created

    day2 = spark.createDataFrame(
        [
            (1, "Mumbai", "2024-05-02 08:00:00"),  # changed → close-out + version
            (2, "Delhi", "2024-05-02 08:00:00"),   # identical → no-op
            (3, "Goa", "2024-05-02 09:00:00"),     # new key → first insert
        ],
        "id long, city string, created string",
    ).withColumn("created", F.to_timestamp("created"))
    out = backend.apply_scd2(day2, cfg, _ts("2024-05-02 12:00:00"))
    rows = sorted(out.collect(), key=lambda r: (r.id, str(r.eff_start_date)))
    by_id: dict[int, list] = {}
    for r in rows:
        by_id.setdefault(r.id, []).append(r)

    old1, new1 = by_id[1]
    assert old1.city == "Pune" and old1.is_current is False
    assert str(old1.eff_end_date).startswith("2024-05-02 12:00")
    assert new1.city == "Mumbai" and new1.is_current is True
    assert str(new1.eff_start_date).startswith("2024-05-02 12:00")  # branch b: batch_ts

    (only2,) = by_id[2]
    assert only2.is_current is True and only2.eff_end_date is None  # guard held

    (only3,) = by_id[3]
    assert only3.is_current is True
    assert str(only3.eff_start_date).startswith("2024-05-02 09:00")  # branch c: created


def test_scd2_batch_dedup_latest_per_key(backend, spark):
    """C6: duplicate keys inside one batch collapse to latest-by-created
    BEFORE the merge (Snowflake MERGE would error on them)."""
    cfg = Scd2Config(key=["id"], attrs=["city"], created_col="created")
    b = spark.createDataFrame(
        [(1, "Old", "2024-05-01 07:00:00"), (1, "New", "2024-05-01 10:00:00")],
        "id long, city string, created string",
    ).withColumn("created", F.to_timestamp("created"))
    out = backend.apply_scd2(b, cfg, _ts("2024-05-01 12:00:00"))
    rows = out.collect()
    assert len(rows) == 1 and rows[0].city == "New"


@pytest.mark.skipif(has_delta(), reason="only meaningful without delta-spark")
def test_delta_backend_fails_loudly_without_delta(spark, tmp_path):
    """The missing-dependency boundary must be LOUD and carry the
    runbook — never a silent fallback to a different storage layer."""
    with pytest.raises(RuntimeError) as exc:
        DeltaMergeBackend(spark, str(tmp_path / "d"))
    assert "delta-spark" in str(exc.value)
    assert "delta-spark" in DELTA_RUNBOOK


def test_delta_null_key_guard_is_loud(spark):
    """The NULL-business-key constraint is enforced, not assumed: the
    staticmethod guard (testable without delta-spark) raises on any
    NULL key and passes clean batches."""
    bad = spark.createDataFrame([(None, "a"), (2, "b")], "id long, v string")
    with pytest.raises(ValueError) as exc:
        DeltaMergeBackend._assert_non_null_keys(bad, ["id"], "apply_scd2")
    assert "NULL business key" in str(exc.value)
    ok = spark.createDataFrame([(1, "a")], "id long, v string")
    DeltaMergeBackend._assert_non_null_keys(ok, ["id"], "apply_scd2")
