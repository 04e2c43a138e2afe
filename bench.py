"""Benchmark harness: runs the headline query set at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q01_...": sec, ...}, "sf": 0.1}

Headline set = one representative per operator family; the quadratic
exactness kernels (all-pairs Jaccard / all-pairs cosine) are exercised
via their scale paths (MinHash-LSH, LSH-ANN) — at 100 TB you never run
the O(n²) kernel over the whole corpus, so the bench doesn't either.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from real_time_data_pipeline_for_restaurant_analytics_spark.registry import all_queries
from real_time_data_pipeline_for_restaurant_analytics_spark.session import get_spark

HEADLINE = [
    "q01_pricing_summary",
    "q02_top_customers",
    "q03_revenue_by_region",
    "q04_segment_order_rates",
    "q05_yoy_revenue_growth",
    "q06_top_spender_per_nation",
    "q07_hourly_event_histogram",
    "q08_distinct_user_event",
    "q09_hash_surrogate_keys",
    "q12_props_extract_fill",
    "q13_datetime_parts",
    "q16_user_retention",
    "q17_scd1_latest_snapshot",
    "q18_scd2_version_history",
    "q19_dedup_exact",
    "q21_minhash_lsh_candidates",
    "q22_simhash_fingerprints",
    "q24_ann_bruteforce_topk",
    "q25_ann_lsh_topk",
    "q26_lang_id",
    "q27_quality_score",
    "q28_token_stats",
    "q29_fingerprints",
    "q30_multimodal_metadata",
    "q31_sessionize_batch",
    "q32_salted_heavy_hitters",
    "q33_salted_join_segments",
    "q35_approx_user_stats",
    "q36_dedup_clusters",
    "q37_multimodal_thumbnails",
    "q38_asof_join",
    "q39_range_join_binned",
    "q40_rollup_revenue",
    "q41_pivot_event_values",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    # JMH-style warm-up: run every headline query once at smoke scale
    # so the timed pass measures steady-state compute, not one-time
    # whole-stage-codegen compilation, Python-worker fork/Arrow init
    # (mapInPandas), or parquet footer caching. Plans are identical in
    # shape across scale factors, so the codegen cache carries over.
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    for name in HEADLINE:
        qs[name].build(spark, warm_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        q = qs[name]
        t0 = time.perf_counter()
        df = q.build(spark, sf_dir)
        # noop sink: forces full evaluation of every output column
        # (count() alone would let Catalyst prune the projections).
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.3f}s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_query_wall_time",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
