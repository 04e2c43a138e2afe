"""Round-6: the driver parses the LAST stdout line of bench.py and
stores only a ~2000-char tail — round 5's full-name JSON line
overflowed it (BENCH_r05 `parsed: null`). Pin the compact-line
contract: qNN short keys are unique across the registry and the
worst-case line stays under the buffer with headroom.
"""

from __future__ import annotations

import json
import os
import sys

# repo root derived from this file, not hardcoded (ADVICE r7): the
# test must import bench.py from whatever checkout it lives in.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

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
    from bench import summary_line

    names = sorted(all_queries())
    # worst case today: every query at a 3-digit-seconds timing
    line = summary_line({n: 999.994 for n in names}, {}, 0.1, partial=False)
    assert len(line) < TAIL_BUFFER - 100
    parsed = json.loads(line)
    assert parsed["queries"], "queries map must survive degradation"
    assert abs(parsed["value"] - 999.994 * len(names)) < 1
    # typical case keeps EVERY query (no omissions) at whichever
    # precision rung the registry size currently needs — at 157
    # queries the ladder correctly degrades 2 dp → 1 dp before it
    # would ever drop entries (the round-11 suite caught exactly this
    # transition as the registry crossed the 2-dp budget)
    line = summary_line({n: 1.23 for n in names}, {}, 0.1, partial=False)
    parsed = json.loads(line)
    assert len(parsed["queries"]) == len(names)
    assert abs(parsed["queries"]["q01"] - 1.23) < 0.05
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
    failed = {n for n, (_, green) in history.items() if not green and n in set(registry)}
    manifest = propose(registry, history, 50)
    # (a) failed-at-last-sample queries lead (hard re-confirmation),
    #     then never-sampled queries fill the rest of the proposal
    assert set(manifest[: len(failed)]) == failed or not failed, (
        "queries whose last driver sample was non-green must lead the proposal"
    )
    expect_new = min(50 - len(failed), len(never))
    assert len(set(manifest) & never) == expect_new, (
        "rotation must prioritize queries no CORRECTNESS round ever checked"
    )
    # (b) simulated rotation covers everything within ceil(N/50) rounds
    sim: dict = dict(history)
    covered = set(sim)
    rounds_needed = 0
    max_rounds = -(-len(registry) // 50)
    base_round = max((v[0] for v in sim.values()), default=0)
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


def test_registry_order_is_the_rotation_manifest():
    """Round-8 (verdict item 1): the driver's CORRECTNESS sample is the
    FIRST ~50 entries of ``queries()`` in dict order, so the registry
    must iterate in rotation order — failed-at-last-sample first, then
    never-driver-sampled, then stalest-green. Otherwise the manifest is
    just a printout nobody applies."""
    from real_time_data_pipeline_for_restaurant_analytics_spark.registry import (
        driver_sample_history,
        queries,
        rotation_order,
    )

    live = list(queries().keys())
    assert live == rotation_order(live), "queries() must iterate in rotation order"
    hist = driver_sample_history()
    failed = [n for n in live if n in hist and not hist[n][1]]
    never = [n for n in live if n not in hist]
    # the sample prefix = every fixed-but-unconfirmed query, then
    # never-sampled queries (as many as fit)
    prefix = live[: min(50, len(failed) + len(never))]
    assert prefix[: len(failed)] == sorted(failed, key=lambda n: (hist[n][0], n))
    assert all(n in never for n in prefix[len(failed) :])


def test_rotation_green_history_parsing():
    """driver_sample_history must read green-ness, not just presence:
    a hash_match=False row at the last sample marks the query
    non-green; a no_oracle rows-only row stays green; a later green
    round supersedes an earlier failure."""
    import tempfile

    from real_time_data_pipeline_for_restaurant_analytics_spark.registry import (
        driver_sample_history,
    )

    rows = {
        "q_fail": {"rows_match": True, "schema_match": True, "hash_match": False, "err": None},
        "q_green": {"rows_match": True, "schema_match": True, "hash_match": True, "err": None},
        "q_rows_only": {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "err": "no_oracle",
        },
        "q_err": {"rows_match": None, "schema_match": None, "hash_match": None, "err": "boom"},
    }
    later = {
        "q_fail": {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
    }
    with tempfile.TemporaryDirectory() as d:
        with open(os.path.join(d, "CORRECTNESS_r01.json"), "w") as f:
            json.dump(rows, f)
        with open(os.path.join(d, "CORRECTNESS_r02.json"), "w") as f:
            json.dump(later, f)
        hist = driver_sample_history(d)
    assert hist["q_fail"] == (2, True), "later green round supersedes the r01 failure"
    assert hist["q_green"] == (1, True)
    assert hist["q_rows_only"] == (1, True), "no_oracle rows-only is green by design"
    assert hist["q_err"] == (1, False)


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


def test_rotation_newest_additions_keep_standing_row():
    """Round-10 (verdict item 6): queries ADDED last round (first
    sampled in the latest round AND numbered past everything earlier
    rounds sampled) keep a standing slot right after the never-sampled
    group — while an OLD query whose first driver sample merely came
    up in the latest round (the q80-q99 tail in r9) rotates normally."""
    from real_time_data_pipeline_for_restaurant_analytics_spark.registry import (
        rotation_order,
    )

    hist = {
        "q144_old": (8, True),
        "q090_tail": (9, True),  # old query, first sampled only in r9
        "q145_new": (9, True),   # genuinely added in r9
        "q001_stale": (2, True),
        "q100_failed": (3, False),
    }
    first = {
        "q144_old": 5,
        "q090_tail": 9,
        "q145_new": 9,
        "q001_stale": 1,
        "q100_failed": 3,
    }
    names = sorted(hist) + ["q999_never"]
    assert rotation_order(names, hist, first) == [
        "q100_failed",  # non-green leads
        "q999_never",   # never sampled
        "q145_new",     # newest addition keeps its standing row
        "q001_stale",   # then stalest-green rotation
        "q144_old",
        "q090_tail",    # first==latest but id 90 <= 144 → old tail, rotates
    ]
