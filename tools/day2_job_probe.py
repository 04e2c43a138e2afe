"""Job-level attribution for the batch replay's day-2 phase (guide §1):
wraps each Spark action site with a job-group label, replays q145's
day-1 then day-2, and prints per-job wall from the status tracker.
Measurement tooling only — never on any query path.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from real_time_data_pipeline_for_restaurant_analytics_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="day2_probe")
    spark.sparkContext.setLogLevel("ERROR")

    from real_time_data_pipeline_for_restaurant_analytics_spark.pipeline import replay as rp
    from real_time_data_pipeline_for_restaurant_analytics_spark.pipeline.entities import ENTITIES
    from real_time_data_pipeline_for_restaurant_analytics_spark.pipeline.runner import (
        Warehouse,
        run_all,
    )
    from real_time_data_pipeline_for_restaurant_analytics_spark.sources.paths import entity_file
    from real_time_data_pipeline_for_restaurant_analytics_spark.workdirs import replay_workdir

    from real_time_data_pipeline_for_restaurant_analytics_spark.registry import all_queries
    qs = all_queries()
    t0 = time.perf_counter()
    qs["q145_pipeline_replay"].build(spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()
    print(f"warm q145: {time.perf_counter() - t0:.2f}s", flush=True)

    work = replay_workdir("day2_probe")
    cust = rp._replay_keys(spark, sf_dir)
    day_dirs = (os.path.join(work, "drops", "2024", "6", "1"),
                os.path.join(work, "drops", "2024", "6", "2"))
    rp._parallel_drops([
        (lambda d=day, dd=ddir, src=src, ent=ent: rp._write_drop_csv(
            src(cust, d), entity_file(dd, ENTITIES[ent].source_file_stem), work))
        for day, ddir in ((1, day_dirs[0]), (2, day_dirs[1]))
        for src, ent in ((rp._location_src, "location"), (rp._menu_src, "menu"),
                         (rp._login_src, "login_audit"))
    ])
    wh = Warehouse(os.path.join(work, "wh"))
    run_all(spark, wh, day_dirs[0], batch_ts=F.lit(rp._TS1).cast("timestamp"),
            collect_stats=False, checkpoint="persist", parallel=True)

    # day 2, serial, with per-action timing via monkeypatched sites
    import real_time_data_pipeline_for_restaurant_analytics_spark.pipeline.runner as rn

    orig_merge = rn.merge_entity_batch

    t_day2 = time.perf_counter()
    events = []

    def timed_merge(spark, wh, spec, raw, batch_ts, checkpoint=False):
        t0 = time.perf_counter()
        orig_merge(spark, wh, spec, raw, batch_ts, checkpoint=checkpoint)
        events.append((spec.name, "merge(clean+dim)", time.perf_counter() - t0))

    rn.merge_entity_batch = timed_merge
    try:
        run_all(spark, wh, day_dirs[1], batch_ts=F.lit(rp._TS2).cast("timestamp"),
                collect_stats=False, checkpoint="persist", parallel=False)
    finally:
        rn.merge_entity_batch = orig_merge
    wall = time.perf_counter() - t_day2
    print(f"day2 SERIAL wall={wall:.2f}s", flush=True)
    for name, what, dt in events:
        print(f"  {name:12s} {what}: {dt:.2f}s", flush=True)

    # finer: one entity's day-2 merge split into stage/clean/dim
    # (fresh warehouse, replay day1 then instrument day2 by hand)
    work2 = replay_workdir("day2_probe_fine")
    wh2 = Warehouse(os.path.join(work2, "wh"))
    cust2 = rp._replay_keys(spark, sf_dir)
    dd = (os.path.join(work2, "drops", "2024", "6", "1"),
          os.path.join(work2, "drops", "2024", "6", "2"))
    rp._parallel_drops([
        (lambda d=day, ddir=ddir, src=src, ent=ent: rp._write_drop_csv(
            src(cust2, d), entity_file(ddir, ENTITIES[ent].source_file_stem), work2))
        for day, ddir in ((1, dd[0]), (2, dd[1]))
        for src, ent in ((rp._location_src, "location"), (rp._menu_src, "menu"),
                         (rp._login_src, "login_audit"))
    ])
    run_all(spark, wh2, dd[0], batch_ts=F.lit(rp._TS1).cast("timestamp"),
            collect_stats=False, checkpoint="persist", parallel=True)

    from real_time_data_pipeline_for_restaurant_analytics_spark.functions.keys import hash_key
    from real_time_data_pipeline_for_restaurant_analytics_spark.operators.merge import (
        Scd2Config,
        apply_scd2,
        latest_per_key,
        merge_upsert,
    )

    for ent in ("location", "menu", "login_audit"):
        spec = ENTITIES[ent]
        path = entity_file(dd[1], spec.source_file_stem, spec.ext)
        marks = [("t0", time.perf_counter())]
        raw = rn._read_source(spark, spec, path)
        ledger = wh2.ledger(spec.name)
        todo = ledger.unprocessed([path])
        import hashlib
        fp = ledger.pending_fingerprint(path)
        tag = hashlib.md5(f"{fp['path']}|{fp['size']}|{fp['mtime']}".encode()).hexdigest()
        (raw.withColumn("_ingest_fp", F.lit(tag))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_ingest_fp")
            .parquet(os.path.join(wh2.stage_dir(spec.name), "data")))
        marks.append(("stage_write", time.perf_counter()))

        typed = spec.clean(raw)
        if spec.dedup_source:
            typed = typed.dropDuplicates()
        order_cols = (
            [F.col(spec.modified_col).desc_nulls_last(),
             F.col(spec.created_col).desc_nulls_last()]
            if spec.modified_col and spec.created_col else [F.lit(1)]
        )
        typed = latest_per_key(typed, spec.key, order_cols).persist()
        clean_tbl = wh2.clean(spec.name)
        prev_clean = clean_tbl.read(spark)
        marks.append(("prev_read", time.perf_counter()))
        attrs = [c for c in typed.columns if c not in spec.key]
        clean_tbl.write(merge_upsert(prev_clean, typed, spec.key, attrs))
        marks.append(("clean_write", time.perf_counter()))

        dim_tbl = wh2.dim(spec.name)
        hk = f"{spec.name}_hk"
        with_hk = typed.withColumn(hk, hash_key(*spec.key, *spec.scd2_attrs))
        if spec.scd1_only:
            prev_fact = dim_tbl.read(spark)
            dim_tbl.write(merge_upsert(prev_fact, with_hk, spec.key, spec.scd2_attrs))
        else:
            prev_dim = dim_tbl.read(spark)
            cfg = Scd2Config(key=spec.key, attrs=spec.scd2_attrs,
                             created_col=spec.created_col,
                             first_start_from_created=True)
            dim_tbl.write(apply_scd2(prev_dim, with_hk, cfg,
                                     F.lit(rp._TS2).cast("timestamp")))
        marks.append(("dim_write", time.perf_counter()))
        typed.unpersist()
        ledger.mark(todo)
        line = "  ".join(f"{n}={t1 - t0:.2f}s" for (_, t0), (n, t1) in zip(marks, marks[1:]))
        print(f"{ent:12s} {line}", flush=True)


if __name__ == "__main__":
    main()
