"""Round-6: the driver parses the LAST stdout line of bench.py and
stores only a ~2000-char tail — round 5's full-name JSON line
overflowed it (BENCH_r05 `parsed: null`). Pin the compact-line
contract: qNN short keys are unique across the registry and the
worst-case line stays under the buffer with headroom.
"""

from __future__ import annotations

import json

from real_time_data_pipeline_for_restaurant_analytics_spark.registry import all_queries

TAIL_BUFFER = 2000


def test_short_query_keys_unique():
    names = sorted(all_queries())
    short = [n.split("_", 1)[0] for n in names]
    assert len(set(short)) == len(short), "duplicate qNN prefixes break the compact bench line"


def test_compact_bench_line_fits_tail_buffer():
    # worst case: every query present with a 3-digit-seconds timing
    names = sorted(all_queries())
    short = {n.split("_", 1)[0]: 999.99 for n in names}
    line = json.dumps(
        {
            "metric": "headline_query_wall_time",
            "value": 99999.999,
            "unit": "sec",
            "queries": short,
            "sf": 0.1,
        },
        separators=(",", ":"),
    )
    assert len(line) < TAIL_BUFFER - 100, (
        f"compact bench line {len(line)} chars — shrink keys or values "
        "before the driver's tail buffer truncates it again"
    )


def test_compact_line_bounded_under_systemic_errors():
    """A systemic failure (every query erroring) must still produce a
    parseable line inside the tail buffer: the error section is a
    bounded sample + count, never the full map."""
    import sys

    sys.path.insert(0, "/root/repo")
    from bench import summary_line

    names = sorted(all_queries())
    errors = {n: "timed: AnalysisException: " + "x" * 400 for n in names}
    line = summary_line({}, errors, 0.1, partial=False)
    assert len(line) < TAIL_BUFFER - 100
    parsed = json.loads(line)
    assert parsed["n_errors"] == len(names)
    assert len(parsed["errors"]) == 5
    # mixed case: some timed, some failed — still bounded, still disjoint
    half = len(names) // 2
    timings = {n: 1.23 for n in names[:half]}
    errs = {n: "boom" for n in names[half:]}
    line = summary_line(timings, errs, 0.1, partial=True)
    assert len(line) < TAIL_BUFFER - 100
    parsed = json.loads(line)
    assert set(parsed["queries"]) & set(parsed["errors"]) == set()
