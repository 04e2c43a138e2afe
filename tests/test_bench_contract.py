"""Round-6: the driver parses the LAST stdout line of bench.py and
stores only a ~2000-char tail — round 5's full-name JSON line
overflowed it (BENCH_r05 `parsed: null`). Pin the compact-line
contract: qNN short keys are unique across the registry and the
worst-case line stays under the buffer with headroom.
"""

from __future__ import annotations

import json

import sys

sys.path.insert(0, "/root/repo")

from bench import TAIL_BUFFER  # single source of truth with bench.py

from real_time_data_pipeline_for_restaurant_analytics_spark.registry import all_queries


def test_short_query_keys_unique():
    names = sorted(all_queries())
    short = [n.split("_", 1)[0] for n in names]
    assert len(set(short)) == len(short), "duplicate qNN prefixes break the compact bench line"


def test_compact_bench_line_fits_tail_buffer():
    """summary_line must fit the tail buffer for ANY timings at ANY
    registry size — the adaptive emitter degrades precision, then
    drops the fastest queries with an omitted count, rather than
    overflowing (round-6: the fixed 2-dp format re-overflowed the
    worst case as the registry passed ~136 queries)."""
    import sys

    sys.path.insert(0, "/root/repo")
    from bench import summary_line

    names = sorted(all_queries())
    # worst case today: every query at a 3-digit-seconds timing
    line = summary_line({n: 999.994 for n in names}, {}, 0.1, partial=False)
    assert len(line) < TAIL_BUFFER - 100
    parsed = json.loads(line)
    assert parsed["queries"], "queries map must survive degradation"
    assert abs(parsed["value"] - 999.994 * len(names)) < 1
    # typical case keeps full 2-dp precision for every query
    line = summary_line({n: 1.23 for n in names}, {}, 0.1, partial=False)
    parsed = json.loads(line)
    assert len(parsed["queries"]) == len(names)
    assert parsed["queries"]["q01"] == 1.23
    assert "n_queries_omitted" not in parsed
    # pathological future registry: 400 queries, all slow — still fits,
    # slowest entries retained, drop count declared
    big = {f"q{i:03d}_future_op": 500.0 + i for i in range(1, 401)}
    line = summary_line(big, {}, 0.1, partial=False)
    assert len(line) < TAIL_BUFFER - 100
    parsed = json.loads(line)
    assert parsed["n_queries_omitted"] == 400 - len(parsed["queries"])
    assert "q400" in parsed["queries"], "slowest query must be retained"


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


def test_sample_rotation_covers_registry():
    """Round-7 verdict item 6: the driver's ~50-query CORRECTNESS
    sample left most of the registry only mimic-verified. The rotation
    manifest (tools/sample_rotation.py) must (a) put every
    never-driver-sampled query at the front of the next proposal, and
    (b) when applied round over round, cover the ENTIRE registry
    within ceil(N/50) rounds — including queries added mid-rotation."""
    from tools.sample_rotation import propose, sampled_history

    registry = sorted(all_queries())
    history = sampled_history()
    never = {n for n in registry if n not in history}
    manifest = propose(registry, history, 50)
    # (a) never-sampled queries fill the proposal first
    expect_new = min(50, len(never))
    assert len(set(manifest) & never) == expect_new, (
        "rotation must prioritize queries no CORRECTNESS round ever checked"
    )
    # (b) simulated rotation covers everything within ceil(N/50) rounds
    sim = dict(history)
    covered = set(sim)
    rounds_needed = 0
    max_rounds = -(-len(registry) // 50)
    base_round = max(sim.values(), default=0)
    for rnd in range(1, max_rounds + 1):
        pick = propose(registry, sim, 50)
        for n in pick:
            sim[n] = base_round + rnd
        covered |= set(pick)
        rounds_needed = rnd
        if covered >= set(registry):
            break
    assert covered >= set(registry), (
        f"rotation failed to cover {len(set(registry) - covered)} queries "
        f"in {rounds_needed} rounds"
    )


def test_last_resort_render_is_length_checked():
    """Even a pathological combination (hundreds of queries AND a full
    error map) must yield a line under the buffer — the final fallback
    is length-verified, not assumed bounded."""
    from bench import summary_line

    timings = {f"q{i:03d}_op": 99999.9 for i in range(1, 500)}
    errors = {f"e{i:03d}_op": "y" * 400 for i in range(1, 500)}
    line = summary_line(timings, errors, 0.1, partial=True)
    assert len(line) < TAIL_BUFFER - 100
    json.loads(line)


def test_minimal_fallback_payload_actually_exercised(monkeypatch):
    """The keep=0 ladder rung always fits the REAL budget (capped error
    samples), so the post-ladder minimal payload would otherwise be
    dead code in every test: shrink the budget until even keep=0
    overflows and pin that the fallback emits valid JSON with the
    counters intact and no unbounded sections."""
    import bench

    monkeypatch.setattr(bench, "_LINE_BUDGET", 120)
    timings = {f"q{i:03d}_op": 1.5 for i in range(1, 40)}
    errors = {f"e{i:03d}_op": "z" * 400 for i in range(1, 40)}
    line = bench.summary_line(timings, errors, 0.1, partial=True)
    parsed = json.loads(line)
    assert parsed["queries"] == {}
    assert "errors" not in parsed, "fallback must drop the error section"
    assert parsed["n_queries_omitted"] == 39
    assert parsed["n_errors"] == 39
    assert parsed["partial"] is True
    assert abs(parsed["value"] - 1.5 * 39) < 0.01
