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

Round-9 (verdict item 5) adds the POOL-LIMITED corpus: the pinned
unit-test conflict shape at sf-scale (top pair ranks dominated by one
hot symbol, disjoint merge material only below them), where the
adaptive ladder's win is structural, not incidental.

Usage: python tools/bpe_depth_measure.py [n_rounds] [batch_m] [sf01|pool]
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


def pool_limited_corpus(spark, n_hot: int = 64, n_cold: int = 4000,
                        hot_freq: int = 100_000, cold_freq: int = 50):
    """The pool-limited corpus shape at sf-scale (round-9, verdict
    item 5) — the pinned unit test's conflict structure, sized like
    sf0.1 (~20 MB of text):

    - ``n_hot`` HOT words, every one 'a'+<distinct char>, with the
      highest frequencies in the corpus: the top-n_hot pair ranks ALL
      share the symbol 'a', so within any pool that fits inside them
      exactly ONE candidate survives symbol blocking — a fixed
      cand_k = 3*M realizes 1/M per round forever;
    - ``n_cold`` cold words over pairwise-disjoint fresh characters
      (no symbol shared with anything): mutually non-conflicting merge
      material sitting just below the hot block, reachable only by a
      pool that GROWS past n_hot.

    The pair vocabulary (n_hot + n_cold) is far larger than the 64*M
    adaptive cap, so the ladder is exercised as a pool problem, not a
    vocabulary-exhaustion one.
    """
    rows = [("a" + chr(0x100 + i), hot_freq - i) for i in range(n_hot)] + [
        (chr(0x1000 + 2 * j) + chr(0x1000 + 2 * j + 1), cold_freq + (j % 17))
        for j in range(n_cold)
    ]
    words = spark.createDataFrame(rows, "w string, freq int")
    # one doc per word, the word repeated freq times — explode(split)
    # in _bpe_vocab counts occurrences, so this IS the frequency
    return words.selectExpr("trim(repeat(w || ' ', freq)) AS text")


def run(spark, docs, n_rounds: int, batch_m: int, cand_k: int | None):
    stats: list = []
    spark.sparkContext._jvm.System.gc()
    t0 = time.perf_counter()
    out = bpe_train_merges_batched(
        docs,
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
    corpus_name = sys.argv[3] if len(sys.argv) > 3 else "sf01"
    spark = get_spark(app_name="bpe_depth_measure")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = (
        pool_limited_corpus(spark).localCheckpoint()
        if corpus_name == "pool"
        else load(spark, SF01, "documents")
    )
    run(spark, load(spark, WARM, "documents"), 2, batch_m, None)  # warm-up
    for label, k in (("fixed cand_k=3M", 3 * batch_m), ("adaptive", None)):
        best = None
        for _ in range(2):
            wall, n_rules, stats = run(spark, corpus, n_rounds, batch_m, k)
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
