"""Phase-level timing probe for the batch replay family (guide §1):
runs q145's phases by hand — drops / day1 / day2 / rerun / digest —
and prints per-phase wall. Measurement tooling only.
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
    spark = get_spark(app_name="replay_probe")
    spark.sparkContext.setLogLevel("ERROR")

    from real_time_data_pipeline_for_restaurant_analytics_spark.pipeline import replay as rp
    from real_time_data_pipeline_for_restaurant_analytics_spark.pipeline.entities import ENTITIES
    from real_time_data_pipeline_for_restaurant_analytics_spark.pipeline.runner import (
        Warehouse,
        run_all,
    )
    from real_time_data_pipeline_for_restaurant_analytics_spark.sources.paths import entity_file
    from real_time_data_pipeline_for_restaurant_analytics_spark.workdirs import replay_workdir

    # warm (JIT) with one full q145 at sf0.001
    from real_time_data_pipeline_for_restaurant_analytics_spark.registry import all_queries
    qs = all_queries()
    t0 = time.perf_counter()
    qs["q145_pipeline_replay"].build(spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()
    print(f"warm q145: {time.perf_counter() - t0:.2f}s", flush=True)

    for rep in range(2):
        marks = [("start", time.perf_counter())]

        work = replay_workdir("probe_q145")
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
        marks.append(("drops", time.perf_counter()))

        wh = Warehouse(os.path.join(work, "wh"))
        run_all(spark, wh, day_dirs[0], batch_ts=F.lit(rp._TS1).cast("timestamp"),
                collect_stats=False, checkpoint="fork", parallel=True)
        marks.append(("day1", time.perf_counter()))
        run_all(spark, wh, day_dirs[1], batch_ts=F.lit(rp._TS2).cast("timestamp"),
                collect_stats=False, checkpoint="fork", parallel=True)
        marks.append(("day2", time.perf_counter()))
        run_all(spark, wh, day_dirs[1], batch_ts=F.lit(rp._TS3).cast("timestamp"),
                collect_stats=False, checkpoint="fork", parallel=True)
        marks.append(("rerun", time.perf_counter()))

        out = (
            rp._digest_rows(wh.dim("location").read(spark), "location", "dim",
                            "location_id", rp._loc_digest())
            .unionByName(rp._digest_rows(wh.clean("location").read(spark), "location",
                                         "clean", "location_id", rp._loc_digest()))
            .unionByName(rp._digest_rows(wh.dim("menu").read(spark), "menu", "dim",
                                         "menu_id", rp._menu_digest()))
            .unionByName(rp._digest_rows(wh.clean("menu").read(spark), "menu", "clean",
                                         "menu_id", rp._menu_digest()))
            .unionByName(rp._digest_rows(wh.clean("login_audit").read(spark),
                                         "login_audit", "clean", "login_id",
                                         rp._login_digest()))
            .unionByName(rp._digest_rows(wh.dim("login_audit").read(spark),
                                         "login_audit", "fact", "login_id",
                                         rp._login_digest()))
        ).orderBy("entity", "layer", "key_str", "eff_start_day")
        out.write.format("noop").mode("overwrite").save()
        marks.append(("digest", time.perf_counter()))

        line = "  ".join(
            f"{name}={t1 - t0:.2f}s"
            for (_, t0), (name, t1) in zip(marks, marks[1:])
        )
        print(f"rep{rep + 1}: {line}  TOTAL={marks[-1][1] - marks[0][1]:.2f}s", flush=True)


if __name__ == "__main__":
    main()
