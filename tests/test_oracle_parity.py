"""Every registered query with an oracle must match DuckDB exactly at
sf0.001 (fast) — the driver repeats this at sf0.01.

Queries without an oracle must at least run and return a stable schema.
"""

from __future__ import annotations

import pytest

from real_time_data_pipeline_for_restaurant_analytics_spark.registry import all_queries

from .conftest import SF_SMOKE
from .oracle_check import compare, compare_pandas_path

QUERIES = all_queries()
WITH_ORACLE = sorted(n for n, q in QUERIES.items() if q.oracle)
ROWS_ONLY = sorted(n for n, q in QUERIES.items() if not q.oracle)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, name):
    q = QUERIES[name]
    problems = compare(spark, name, q.build, q.oracle, SF_SMOKE)
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_hash_contract_pandas_path(spark, name):
    """Round-1 regression class: values identical but the driver hash
    diverges after pandas conversion (DECIMAL/HUGEINT → float64)."""
    q = QUERIES[name]
    problems = compare_pandas_path(spark, name, q.build, q.oracle, SF_SMOKE)
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    q = QUERIES[name]
    df = q.build(spark, SF_SMOKE)
    assert df.columns, f"{name}: no columns"
    df.limit(5).collect()  # must execute without error
