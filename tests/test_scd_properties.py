"""Property-based invariants for the merge library (hypothesis).

The golden tests pin concrete day-1/day-2 scenarios; these drive the
SCD machinery through random batch sequences and assert the structural
invariants that must hold for ANY input history:

- at most one current version per business key, and every key ever
  seen has exactly one;
- current rows are open-ended, closed rows are not;
- the current value equals the last batch's value for that key
  (last-write-wins fold);
- closed versions chain: each version's eff_end equals the next
  version's eff_start (no gaps, no overlaps);
- re-applying the final batch is a no-op (guarded merge);
- merge_upsert equals a plain dict fold.

Examples are kept tiny (≤3 keys, ≤3 batches, 2-letter values — so
"unchanged" no-op branches are exercised often) because each example
costs real Spark jobs.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from real_time_data_pipeline_for_restaurant_analytics_spark.operators.merge import (
    Scd2Config,
    apply_scd2,
    merge_upsert,
)

KEYS = st.integers(min_value=0, max_value=2)
VALS = st.sampled_from(["a", "b"])
# one batch = unique keys (the pipeline dedups with latest_per_key
# before merging; unique keys keep the expected-state fold exact)
BATCH = st.dictionaries(KEYS, VALS, min_size=1, max_size=3)
HISTORY = st.lists(BATCH, min_size=1, max_size=3)

CFG = Scd2Config(key=["id"], attrs=["v"], created_col=None)

_slow = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _ts(i: int):
    return F.lit(f"2024-01-0{i + 1} 21:30:00").cast("timestamp")


def _batch_df(spark, batch: dict[int, str]):
    return spark.createDataFrame(sorted(batch.items()), "id long, v string")


@given(history=HISTORY)
@_slow
def test_scd2_invariants_over_random_history(spark, history):
    dim = None
    expected: dict[int, str] = {}
    changes: dict[int, int] = {}
    for i, batch in enumerate(history):
        dim = apply_scd2(dim, _batch_df(spark, batch), CFG, _ts(i))
        for k, v in batch.items():
            if expected.get(k) != v:
                changes[k] = changes.get(k, 0) + 1
            expected[k] = v
    rows = dim.collect()

    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r.id, []).append(r)

    assert set(by_key) == set(expected)
    for k, versions in by_key.items():
        current = [r for r in versions if r.is_current]
        assert len(current) == 1, f"key {k}: {len(current)} current rows"
        assert current[0].v == expected[k]
        assert current[0].eff_end_date is None
        assert len(versions) == changes[k]
        closed = sorted(
            (r for r in versions if not r.is_current), key=lambda r: r.eff_start_date
        )
        for r in closed:
            assert r.eff_end_date is not None
        chain = closed + current
        for prev, nxt in zip(chain, chain[1:]):
            assert prev.eff_end_date == nxt.eff_start_date, f"key {k}: gap in versions"

    # guarded no-op: replaying the last batch adds nothing
    replay = apply_scd2(dim, _batch_df(spark, history[-1]), CFG, _ts(len(history)))
    assert sorted(map(tuple, replay.collect())) == sorted(map(tuple, rows))


@given(history=HISTORY)
@_slow
def test_merge_upsert_equals_dict_fold(spark, history):
    target = None
    expected: dict[int, str] = {}
    for batch in history:
        target = merge_upsert(target, _batch_df(spark, batch), ["id"], ["v"])
        expected.update(batch)
    got = {r.id: r.v for r in target.collect()}
    assert got == expected
