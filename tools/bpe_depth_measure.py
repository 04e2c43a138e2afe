"""Depth-64 batched-BPE measurement with realized-M logged per round —
the SCALE_r08 re-measure for the adaptive cand_k ladder (round-8,
verdict item 4).

Compares, on the sf0.1 documents corpus in one dedicated session
(sf0.001 warm-up, System.gc() before timings, noop sink, best-of-2):

- fixed cand_k=3*M (the round-7 configuration whose realized batch
  degraded to 5.5/8 at depth 64);
- adaptive cand_k (the default): pool doubles whenever a round
  realizes < 0.8*M.

Prints per-round (final_cand_k, realized_m) for both, total rules
learned in the same 8 rounds, and wall time.

Usage: python tools/bpe_depth_measure.py [n_rounds] [batch_m]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_time_data_pipeline_for_restaurant_analytics_spark.catalog import load
from real_time_data_pipeline_for_restaurant_analytics_spark.operators.text import (
    bpe_train_merges_batched,
)
from real_time_data_pipeline_for_restaurant_analytics_spark.session import get_spark

SF01 = "/root/testdata/sf0.1"
WARM = "/root/testdata/sf0.001"


def run(spark, sf_dir: str, n_rounds: int, batch_m: int, cand_k: int | None):
    stats: list = []
    spark.sparkContext._jvm.System.gc()
    t0 = time.perf_counter()
    out = bpe_train_merges_batched(
        load(spark, sf_dir, "documents"),
        n_rounds=n_rounds,
        batch_m=batch_m,
        cand_k=cand_k,
        round_stats=stats,
    )
    n_rules = out.count()
    wall = time.perf_counter() - t0
    return wall, n_rules, stats


def main() -> None:
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    batch_m = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark(app_name="bpe_depth_measure")
    spark.sparkContext.setLogLevel("ERROR")
    run(spark, WARM, 2, batch_m, None)  # warm-up
    for label, k in (("fixed cand_k=3M", 3 * batch_m), ("adaptive", None)):
        best = None
        for _ in range(2):
            wall, n_rules, stats = run(spark, SF01, n_rounds, batch_m, k)
            if best is None or wall < best[0]:
                best = (wall, n_rules, stats)
        wall, n_rules, stats = best
        realized = [m for _, _, m in stats]
        print(
            f"{label}: {n_rules} rules in {n_rounds} rounds, "
            f"wall {wall:.2f} s, realized/M per round "
            f"{[f'{m}/{batch_m}' for m in realized]}, "
            f"final cand_k per round {[ck for _, ck, _ in stats]}"
        )


if __name__ == "__main__":
    main()
