"""Regenerate QUERIES.md from the registry (run after adding queries)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_time_data_pipeline_for_restaurant_analytics_spark.registry import all_queries

HEADER = """# QUERIES — the registered operator surface

Auto-generated index of `__spark_entry__.queries()`. "oracle" = DuckDB SQL
hash-checked by the driver at sf0.01; "rows-only" operators carry a dedicated
exactness test instead (named in the doc). Regenerate with
`python tools/gen_queries_md.py`.

| Query | Check | What it does |
|---|---|---|
"""


def main() -> None:
    rows = []
    for name, q in sorted(all_queries().items()):
        check = "oracle" if q.oracle else "rows-only"
        doc = " ".join((q.doc or "").split())
        rows.append(f"| {name} | {check} | {doc} |")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "QUERIES.md")
    with open(out, "w") as f:
        f.write(HEADER + "\n".join(rows) + "\n")
    print(f"wrote {out}: {len(rows)} queries")


if __name__ == "__main__":
    main()
