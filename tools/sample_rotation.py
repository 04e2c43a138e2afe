"""Driver-sample rotation manifest (round-7 verdict item 6; APPLIED in
round 8 — verdict item 1).

The driver's per-round CORRECTNESS check takes the FIRST ~50 entries of
``queries()`` in dict order, so as of round 8 the registry itself
returns queries in rotation order (``registry.rotation_order``) and the
manifest this tool prints IS the live sample. Priority:

1. queries whose most recent driver sample was NOT green (fixed
   defects awaiting hard re-confirmation — the round-1 hash failures
   q23/q24/q44/q47 until CORRECTNESS_r08 lands);
2. queries NEVER driver-sampled in any historical CORRECTNESS_r*.json
   (name order — stable);
3. green queries, least-recently-sampled round first; ties by name.

Applying the proposal each round covers every registered query within
~ceil(|registry| / sample_size) rounds, and keeps doing so as the
registry grows (a new query is by definition never-sampled, so it
enters the very next proposal). Pinned by
tests/test_bench_contract.py::test_sample_rotation_covers_registry and
::test_registry_order_is_the_rotation_manifest.

Usage: python tools/sample_rotation.py [sample_size]  (default 50)
Prints one query name per line — the proposed CORRECTNESS sample for
the next round.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sampled_history(root: str = ROOT) -> dict[str, tuple[int, bool]]:
    """{query_name: (last round sampled, green at that round)}.
    Queries never sampled are absent. Delegates to the registry's
    reader so the CLI and the live ``queries()`` order cannot drift."""
    from real_time_data_pipeline_for_restaurant_analytics_spark.registry import (
        driver_sample_history,
    )

    return driver_sample_history(root)


def propose(
    registry: list[str],
    history: dict[str, int] | dict[str, tuple[int, bool]],
    sample_size: int = 50,
    first_rounds: dict[str, int] | None = None,
) -> list[str]:
    """The next round's sample. ``history`` values may be a bare round
    (treated as green — the coverage-simulation form) or a
    ``(round, green)`` tuple (the full form). ``first_rounds`` enables
    the round-10 newest-keeps-a-standing-row group; the CLI passes the
    artifact-derived map so the printout matches the live registry
    order, while coverage simulations omit it (a synthetic history has
    no meaningful first-sample rounds)."""
    from real_time_data_pipeline_for_restaurant_analytics_spark.registry import (
        rotation_order,
    )

    norm = {
        n: v if isinstance(v, tuple) else (int(v), True) for n, v in history.items()
    }
    return rotation_order(list(registry), norm, first_rounds)[:sample_size]


def main() -> None:
    from real_time_data_pipeline_for_restaurant_analytics_spark.registry import all_queries

    from real_time_data_pipeline_for_restaurant_analytics_spark.registry import (
        first_sample_rounds,
    )

    sample_size = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    registry = sorted(all_queries())
    history = sampled_history()
    never = [n for n in registry if n not in history]
    failed = [n for n, (_, green) in history.items() if not green]
    for name in propose(registry, history, sample_size, first_sample_rounds()):
        print(name)
    print(
        f"# registry={len(registry)} sampled-ever={len(history)} "
        f"never-sampled={len(never)} failed-at-last-sample={len(failed)} "
        f"sample_size={sample_size}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
