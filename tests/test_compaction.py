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


def test_duplicate_order_keys_with_tiebreak_are_deterministic(spark):
    """Review finding: with duplicate order keys and UNEQUAL sizes the
    peer order — and therefore the packing — is unspecified unless a
    tiebreaker is supplied. With tiebreak_col the assignment must match
    the python replica sorted by (order, tiebreak), every run."""
    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.layout import (
        compaction_assignments,
    )

    rows = [("a", 7, 150, "f1"), ("a", 7, 10, "f2"), ("a", 7, 80, "f3")]
    df = spark.createDataFrame(rows, "part string, fid long, sz long, name string")
    for _ in range(3):
        got = {
            r.name: r.out_group
            for r in compaction_assignments(
                df, "part", "fid", "sz", 100, tiebreak_col="name"
            ).collect()
        }
        # replica: sorted by (fid, name) -> starts 0, 150, 160
        assert got == {"f1": 0, "f2": 1, "f3": 1}


def test_compact_files_audits_and_handles_encoded_names(spark, tmp_path):
    """Review finding: input_file_name() percent-encodes the file URI,
    so a source file with a space in its name would miss the inner
    join against the os.listdir spelling and silently drop its rows.
    Pinned: the decoded basename matches, content round-trips exactly,
    and the stats carry the audited row count."""
    import os
    import shutil

    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.layout import (
        compact_files,
    )

    src = str(tmp_path / "small")
    dst = str(tmp_path / "compacted")
    df = spark.range(0, 500).selectExpr("id", "concat('r-', id) AS payload")
    df.repartition(4).write.parquet(src)
    # rename one part file to contain a space (and a '+', which must
    # NOT be decoded as a space by a correct url_decode of a URI path)
    parts = sorted(f for f in os.listdir(src) if f.endswith(".parquet"))
    shutil.move(
        os.path.join(src, parts[0]),
        os.path.join(src, "my data+file.parquet"),
    )
    stats = compact_files(spark, src, dst, target_bytes=1 << 20)
    assert stats["rows"] == 500
    before = sorted(tuple(r) for r in df.collect())
    after = sorted(
        tuple(r) for r in spark.read.parquet(dst).select("id", "payload").collect()
    )
    assert before == after


def test_compact_files_groups_out_counts_real_groups(spark, tmp_path):
    """Review finding: next-fit group ids SKIP integers when a file is
    >= target_bytes, so max(out_group)+1 over-counts. groups_out must
    equal the number of directories actually written."""
    import os
    import shutil

    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.layout import (
        compact_files,
    )

    src = str(tmp_path / "small")
    os.makedirs(src)
    # one big file (several multiples of target) then small ones:
    # listing sorts big first -> ids 0 and >= 2, never 1
    big = tmp_path / "big"
    spark.range(0, 20000).selectExpr(
        "id", "repeat('x', 64) AS pad"
    ).coalesce(1).write.parquet(str(big))
    small = tmp_path / "smallpart"
    spark.range(0, 10).selectExpr("id", "'y' AS pad").coalesce(1).write.parquet(
        str(small)
    )
    shutil.move(
        str(next(big.glob("*.parquet"))), os.path.join(src, "a-big.parquet")
    )
    shutil.move(
        str(next(small.glob("*.parquet"))), os.path.join(src, "b-small.parquet")
    )
    big_sz = os.path.getsize(os.path.join(src, "a-big.parquet"))
    target = big_sz // 3  # big spans ids 0..2, small starts at id 3
    dst = str(tmp_path / "compacted")
    stats = compact_files(spark, src, dst, target)
    group_dirs = [d for d in os.listdir(dst) if d.startswith("out_group=")]
    assert stats["groups_out"] == len(group_dirs) == 2
    assert stats["rows"] == 20010
    assert spark.read.parquet(dst).count() == 20010


def test_compact_files_walks_partitioned_layout(spark, tmp_path):
    """Round-8 (verdict item 3): a hive-partitioned source
    (part=.../ *.parquet — the form a real lakehouse OPTIMIZE walks)
    compacts per partition with the shared kernel: one file per
    partition-group leaf, planner rows == executor groups, content
    set-identical, per-partition audit counts carried in the stats."""
    import os

    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.layout import (
        compact_files,
    )

    src = str(tmp_path / "small")
    dst = str(tmp_path / "compacted")
    df = spark.range(0, 6000).selectExpr(
        "id", "concat('row-', id) AS payload", "cast(id % 3 as int) AS part"
    )
    df.repartition(8).write.partitionBy("part").parquet(src)
    part_dirs = sorted(d for d in os.listdir(src) if d.startswith("part="))
    assert len(part_dirs) == 3
    n_small = sum(
        1
        for d in part_dirs
        for f in os.listdir(os.path.join(src, d))
        if f.endswith(".parquet")
    )
    assert n_small >= 12, "fixture must be fragmented in every partition"

    per_part_bytes = max(
        sum(
            os.path.getsize(os.path.join(src, d, f))
            for f in os.listdir(os.path.join(src, d))
            if f.endswith(".parquet")
        )
        for d in part_dirs
    )
    target = per_part_bytes // 2 + 1  # ~2 groups in the largest partition
    stats = compact_files(spark, src, dst, target)
    assert stats["files_in"] == n_small
    assert stats["partitions"] == 3
    assert stats["rows"] == 6000
    # planner/executor contract: the written groups ARE the plan's rows
    # (the executor consumes the planner's assignment frame)
    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.layout import (
        compaction_plan,
    )

    listing = [
        (d, f, os.path.getsize(os.path.join(src, d, f)))
        for d in part_dirs
        for f in sorted(os.listdir(os.path.join(src, d)))
        if f.endswith(".parquet")
    ]
    files = spark.createDataFrame(
        [(pd, i, sz) for i, (pd, _f, sz) in enumerate(listing)],
        "pdir string, fid long, sz long",
    )
    plan_rows = compaction_plan(files, "pdir", "fid", "sz", target).count()
    assert plan_rows == stats["groups_out"], (
        "what executes must be what the planner predicted"
    )

    # layout: dst/part=v/out_group=g/ with exactly ONE file per leaf
    leaves = 0
    for d in sorted(os.listdir(dst)):
        if not d.startswith("part="):
            continue
        gdirs = [g for g in os.listdir(os.path.join(dst, d)) if g.startswith("out_group=")]
        assert gdirs, f"partition {d} lost its groups"
        for g in gdirs:
            pq = [
                f
                for f in os.listdir(os.path.join(dst, d, g))
                if f.endswith(".parquet")
            ]
            assert len(pq) == 1, f"{d}/{g} must hold exactly one compacted file"
            leaves += 1
    assert leaves == stats["groups_out"]

    before = sorted(tuple(r) for r in df.collect())
    after = sorted(
        tuple(r)
        for r in spark.read.parquet(dst).select("id", "payload", "part").collect()
    )
    assert before == after


def test_compact_files_partitioned_rejects_nested_and_mixed(spark, tmp_path):
    """The partition walk is one level with one column: deeper trees or
    mixed partition columns must fail loudly rather than silently
    escaping the listing."""
    import os

    import pytest

    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.layout import (
        compact_files,
    )

    src = str(tmp_path / "deep")
    df = spark.range(0, 100).selectExpr(
        "id", "cast(id % 2 as int) AS a", "cast(id % 3 as int) AS b"
    )
    df.write.partitionBy("a", "b").parquet(src)
    with pytest.raises(ValueError, match="nested"):
        compact_files(spark, src, str(tmp_path / "d1"), 1 << 20)

    src2 = str(tmp_path / "mixed")
    os.makedirs(os.path.join(src2, "a=1"))
    os.makedirs(os.path.join(src2, "b=1"))
    with pytest.raises(ValueError, match="mix"):
        compact_files(spark, src2, str(tmp_path / "d2"), 1 << 20)

    # review r8: a source partitioned by a kernel-internal name
    # (notably a previous compact_files OUTPUT, out_group=g/) must be
    # refused with the real reason, not a duplicate-column error
    src3 = str(tmp_path / "flatout")
    spark.range(0, 100).selectExpr("id", "concat('r-', id) AS payload").repartition(
        4
    ).write.parquet(src3)
    dst3 = str(tmp_path / "d3")
    compact_files(spark, src3, dst3, 1 << 20)  # flat compaction -> out_group=g/
    with pytest.raises(ValueError, match="reserved"):
        compact_files(spark, dst3, str(tmp_path / "d4"), 1 << 20)

    # empty partition dirs compact to clean zero stats, not a
    # schema-inference crash
    src4 = str(tmp_path / "empty")
    os.makedirs(os.path.join(src4, "part=0"))
    os.makedirs(os.path.join(src4, "part=1"))
    stats = compact_files(spark, src4, str(tmp_path / "d5"), 1 << 20)
    assert stats == {
        "files_in": 0,
        "groups_out": 0,
        "bytes_in": 0,
        "rows": 0,
        "partitions": 2,
    }


def test_compact_files_fails_loudly_on_unlisted_rows(spark, tmp_path):
    """Rows readable by the scan but absent from the listing must abort
    with the audit error, never silently vanish from the rewrite.
    Spark's parquet scan reads every non-hidden file REGARDLESS of
    extension, while the planner's listing keeps only '*.parquet' — a
    part file renamed to '.pq' is exactly the scanned-but-unplanned
    mismatch the row-count audit exists to catch. (A nested
    subdirectory is NOT such a case: the non-recursive scan and the
    listing both skip it, so scan and plan agree.)"""
    import os
    import shutil

    import pytest

    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.layout import (
        compact_files,
    )

    src = str(tmp_path / "small")
    df = spark.range(0, 200).selectExpr("id", "concat('r-', id) AS payload")
    df.repartition(2).write.parquet(src)
    parts = sorted(f for f in os.listdir(src) if f.endswith(".parquet"))
    shutil.move(
        os.path.join(src, parts[0]),
        os.path.join(src, parts[0].removesuffix(".parquet") + ".pq"),
    )
    with pytest.raises(RuntimeError, match="compact_files"):
        compact_files(spark, src, str(tmp_path / "dst"), target_bytes=1 << 20)
