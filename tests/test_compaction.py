"""Compaction planner (q137) kernel semantics on crafted file
listings — next-fit start-offset binning, order preservation,
partition independence, undersized-trailer flag. The oracle parity
test covers the registered query; these pin the edges the testdata
doesn't exercise (a file larger than the target, a single-file
partition, exact group boundaries)."""

from __future__ import annotations

from real_time_data_pipeline_for_restaurant_analytics_spark.operators.layout import (
    compaction_plan,
)


def _files(spark, rows):
    return spark.createDataFrame(rows, "part string, fid long, sz long")


def _plan(spark, rows, target):
    out = compaction_plan(_files(spark, rows), "part", "fid", "sz", target).collect()
    return {
        (r.part, r.out_group): (r.n_files, r.group_bytes, r.first_id, r.last_id, r.undersized)
        for r in out
    }


def test_next_fit_binning_exact_boundaries(spark):
    # files of 60 bytes, target 100: starts 0,60,120,180 -> groups 0,0,1,1
    rows = [("a", i, 60) for i in range(1, 5)]
    got = _plan(spark, rows, 100)
    assert got == {
        ("a", 0): (2, 120, 1, 2, False),
        ("a", 1): (2, 120, 3, 4, False),
    }


def test_file_larger_than_target_gets_own_group_slot(spark):
    # 250-byte file starts at 0 (group 0); next file starts at 250 -> group 2
    rows = [("a", 1, 250), ("a", 2, 10)]
    got = _plan(spark, rows, 100)
    assert got[("a", 0)] == (1, 250, 1, 1, False)
    assert got[("a", 2)] == (1, 10, 2, 2, True)  # trailing remainder flagged


def test_partitions_pack_independently(spark):
    rows = [("a", 1, 90), ("b", 1, 90), ("b", 2, 90)]
    got = _plan(spark, rows, 100)
    assert got[("a", 0)] == (1, 90, 1, 1, False)
    assert got[("b", 0)] == (2, 180, 1, 2, False)


def test_order_preserved_within_group(spark):
    # id span of each group must be contiguous in file order
    rows = [("a", i, 40) for i in range(1, 8)]
    got = _plan(spark, rows, 100)
    spans = sorted((g, v[2], v[3]) for (_, g), v in got.items())
    for (_, lo1, hi1), (_, lo2, _h) in zip(spans, spans[1:]):
        assert lo2 == hi1 + 1


def test_duplicate_order_keys_use_rows_frame(spark):
    """Ordering by a non-unique column (e.g. mtime instead of a unique
    file id) must still pack next-fit: the running start offset uses a
    ROWS frame, so peer rows with equal order values each advance the
    offset. Spark's default RANGE frame would sum ALL peers into every
    row's offset — here four 60-byte files with identical order keys
    would all start at 180 and collapse into one group of 4."""
    rows = [("a", 7, 60) for _ in range(4)]  # same mtime-like order key
    got = _plan(spark, rows, 100)
    assert got == {
        ("a", 0): (2, 120, 7, 7, False),
        ("a", 1): (2, 120, 7, 7, False),
    }


def test_property_matches_python_replica(spark):
    """Pure-Python next-fit replica over random file listings: the
    whole plan frame (group membership, bytes, spans, flag) must match
    for every partition. Catches off-by-one drift in the start-offset
    arithmetic that crafted cases might miss."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    target = 100
    listings = st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]),
                  st.integers(min_value=1, max_value=250)),
        min_size=1,
        max_size=20,
    )

    @settings(max_examples=10, deadline=None)
    @given(listings)
    def run(items):
        rows = [(part, i + 1, sz) for i, (part, sz) in enumerate(items)]
        want = {}
        by_part = {}
        for part, fid, sz in sorted(rows, key=lambda r: (r[0], r[1])):
            off = by_part.get(part, 0)
            g = off // target
            by_part[part] = off + sz
            k = (part, g)
            n, b, lo, hi = want.get(k, (0, 0, fid, fid))
            want[k] = (n + 1, b + sz, min(lo, fid), max(hi, fid))
        want = {k: (*v, v[1] < target // 2) for k, v in want.items()}
        assert _plan(spark, rows, target) == want

    run()


def test_compact_files_executes_the_plan(spark, tmp_path):
    """Round-7: the executor half of q137. Rewrite a many-small-files
    table into one file per planned output group: content is
    set-identical, each group directory holds exactly one parquet
    file, and the group count equals what compaction_assignments
    predicted from the same listing."""
    import os

    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.layout import (
        compact_files,
    )

    src = str(tmp_path / "small")
    dst = str(tmp_path / "compacted")
    df = spark.range(0, 5000).selectExpr(
        "id", "concat('row-', id) AS payload", "id % 7 AS grp"
    )
    df.repartition(20).write.parquet(src)
    n_small = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    assert n_small >= 10, "fixture must actually be fragmented"

    total = sum(
        os.path.getsize(os.path.join(src, f))
        for f in os.listdir(src)
        if f.endswith(".parquet")
    )
    target = total // 4 + 1  # aim for ~4 output groups
    stats = compact_files(spark, src, dst, target)
    assert stats["files_in"] == n_small
    assert 1 <= stats["groups_out"] <= 6

    group_dirs = [d for d in os.listdir(dst) if d.startswith("out_group=")]
    assert len(group_dirs) == stats["groups_out"]
    for d in group_dirs:
        pq = [f for f in os.listdir(os.path.join(dst, d)) if f.endswith(".parquet")]
        assert len(pq) == 1, f"{d} must hold exactly one compacted file"

    before = sorted(tuple(r) for r in df.collect())
    after = sorted(
        tuple(r)
        for r in spark.read.parquet(dst).select("id", "payload", "grp").collect()
    )
    assert before == after
