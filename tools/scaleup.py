"""Deterministic N× scale-up of the driver's sf0.1 testdata for
empirical scaling measurements (round-5 verdict item: prove the
constants, not just the plan shapes, at 10× data).

NOT a synthetic replacement for the driver data — correctness gates
still run only on /root/testdata. This produces a sf1.0-shaped copy
under the repo (gitignored) by replicating sf0.1 R times with:

- key offsets of stride max(dim key)+1, applied consistently to every
  FK (lineitem→orders/part/supplier, orders→customer), so referential
  integrity and join fan-outs are preserved;
- region/nation left fixed (enum dims, as in real TPC-H);
- events: event_id/user_id offset (distinct users grow 10×, the daily
  event volume grows 10× over the SAME date range — the realistic
  growth mode for the windowed/rollup queries);
- documents: every token suffixed with a per-replica tag (replica 0
  untouched), so each replica is a *different* corpus slice and
  near-dup/shingle density stays ~constant instead of exploding 100×
  (plain replication would make every doc a 10-way exact dup);
  n_chars recomputed from the salted text. Token lengths grow by the
  tag width — fine for timing, noted for anyone reading quality
  scores;
- embeddings: vector rotated by (replica % dim) positions — norm and
  coordinate distribution preserved, replicas decorrelated; vec_id
  offset (query sets like vec_id<10 and IVF seed centroids vec_id<16
  keep their replica-0 identity).

Usage: python tools/scaleup.py [src] [dst] [n_replicas]
"""

from __future__ import annotations

import os
import sys

import duckdb


def scale_up(
    src: str = "/root/testdata/sf0.1",
    dst: str = "/root/repo/.scaledata/sf1.0",
    n_rep: int = 10,
) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW reps AS SELECT unnest(range({n_rep})) AS r")

    def stride(table: str, key: str) -> int:
        return con.execute(
            f"SELECT MAX({key}) + 1 FROM '{src}/{table}.parquet'"
        ).fetchone()[0]

    s_cust = stride("customer", "c_custkey")
    s_supp = stride("supplier", "s_suppkey")
    s_part = stride("part", "p_partkey")
    s_ord = stride("orders", "o_orderkey")
    s_evt = stride("events", "event_id")
    s_user = stride("events", "user_id")
    s_doc = stride("documents", "doc_id")
    s_vec = stride("embeddings", "vec_id")

    def copy(table: str, select: str, replicate: bool | None = True) -> None:
        # replicate=None: ``select`` carries its own FROM clause
        if replicate is None:
            frm = ""
        elif replicate:
            frm = f" FROM '{src}/{table}.parquet', reps"
        else:
            frm = f" FROM '{src}/{table}.parquet'"
        con.execute(f"COPY (SELECT {select}{frm}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT COUNT(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    copy("region", "*", replicate=False)
    copy("nation", "*", replicate=False)
    copy("customer", f"* REPLACE (c_custkey + r * {s_cust} AS c_custkey)")
    copy("supplier", f"* REPLACE (s_suppkey + r * {s_supp} AS s_suppkey)")
    copy("part", f"* REPLACE (p_partkey + r * {s_part} AS p_partkey)")
    copy(
        "orders",
        f"* REPLACE (o_orderkey + r * {s_ord} AS o_orderkey, "
        f"o_custkey + r * {s_cust} AS o_custkey)",
    )
    copy(
        "lineitem",
        f"* REPLACE (l_orderkey + r * {s_ord} AS l_orderkey, "
        f"l_partkey + r * {s_part} AS l_partkey, "
        f"l_suppkey + r * {s_supp} AS l_suppkey)",
    )
    copy(
        "events",
        f"* REPLACE (event_id + r * {s_evt} AS event_id, "
        f"user_id + r * {s_user} AS user_id)",
    )
    copy(
        "documents",
        "doc_id, text, lang, source, CAST(length(text) AS BIGINT) AS n_chars FROM ("
        f"SELECT doc_id + r * {s_doc} AS doc_id, "
        "CASE WHEN r = 0 THEN text ELSE "
        r"regexp_replace(text, '(\S+)', '\1x' || CAST(r AS VARCHAR), 'g') END AS text, "
        f"lang, source FROM '{src}/documents.parquet', reps) _t",
        replicate=None,
    )
    copy(
        "embeddings",
        f"* REPLACE (vec_id + r * {s_vec} AS vec_id, "
        "CASE WHEN r = 0 THEN embedding ELSE "
        "embedding[(r % len(embedding)) + 1:] || embedding[1:(r % len(embedding))] "
        "END AS embedding)",
    )


if __name__ == "__main__":
    args = sys.argv[1:]
    scale_up(*args[:2], n_rep=int(args[2]) if len(args) > 2 else 10)
