"""Driver-sample rotation manifest (round-7, verdict item 6).

The driver checks ~50 of the registry's queries per round
(CORRECTNESS_r{N}.json); with a static sample most of the LLM-pipeline
surface is only ever mimic/judge-verified. This tool proposes the next
round's sample deterministically so the rotation cycles through the
WHOLE registry:

1. queries NEVER driver-sampled in any historical CORRECTNESS_r*.json
   come first (name order — stable);
2. then least-recently-sampled (oldest last-sampled round first);
3. ties broken by name.

Applying the proposal each round covers every registered query within
ceil(|registry| / sample_size) rounds, and keeps doing so as the
registry grows (a new query is by definition never-sampled, so it
enters the very next proposal). The rotation property is pinned by
tests/test_bench_contract.py::test_sample_rotation_covers_registry.

Usage: python tools/sample_rotation.py [sample_size]  (default 50)
Prints one query name per line — the proposed CORRECTNESS sample for
the next round.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sampled_history(root: str = ROOT) -> dict[str, int]:
    """{query_name: last round it appeared in a CORRECTNESS_r*.json}.
    Queries never sampled are absent."""
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        for name in data:
            last[name] = max(last.get(name, 0), rnd)
    return last


def propose(
    registry: list[str], history: dict[str, int], sample_size: int = 50
) -> list[str]:
    """The next round's sample: never-sampled first, then stalest."""
    return sorted(registry, key=lambda n: (history.get(n, -1), n))[:sample_size]


def main() -> None:
    from real_time_data_pipeline_for_restaurant_analytics_spark.registry import all_queries

    sample_size = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    registry = sorted(all_queries())
    history = sampled_history()
    never = [n for n in registry if n not in history]
    for name in propose(registry, history, sample_size):
        print(name)
    print(
        f"# registry={len(registry)} sampled-ever={len(history)} "
        f"never-sampled={len(never)} sample_size={sample_size}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
