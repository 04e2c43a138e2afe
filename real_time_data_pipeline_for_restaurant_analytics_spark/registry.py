"""Query registry: the bridge between the engine's operator surface
and the driver's correctness harness (``__spark_entry__.py``).

Every operator from SURVEY.md §2 registers one (or more) named
queries; each query is a DataFrame builder ``(spark, sf_dir) -> DF``
plus, where SQL-expressible, an ANSI-SQL oracle string DuckDB runs on
the same parquet. Column names/types are aligned on both sides so the
driver's order-insensitive value-hash matches.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    build: Builder
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = "") -> Callable[[Builder], Builder]:
    def deco(fn: Builder) -> Builder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name=name, build=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    # Import registrars lazily to avoid import cycles; each module
    # registers its queries at import time.
    from .plans import analytics, incremental, olap, sessions  # noqa: F401
    from .operators import (  # noqa: F401
        approx,
        asof,
        bloom,
        cdc,
        curation,
        dedup,
        dq,
        layout,
        multimodal,
        sampling,
        similarity,
        skew,
        text,
    )
    from .sources import corpus  # noqa: F401

    return dict(_REGISTRY)


def queries() -> dict[str, Builder]:
    return {name: q.build for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
