"""Surrogate-key operators (SURVEY §2.2 P12/P15).

The reference keys every consumption dim with
``hash(SHA1_hex(CONCAT(c1,c2,...)))`` (`02 Location Entity.sql:299`,
`customer_proc.sql:249-251`). Snowflake HASH values are not
bit-reproducible outside Snowflake, so we guarantee the *scheme*
(deterministic hash of the same column tuple), not value equality.

Composition chosen here: md5 hex of the NULL-propagating concat,
folded to a signed 64-bit int. md5 exists identically in Spark,
DuckDB, and Python — so the oracle harness and any external system
reproduce the keys exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _cols(cols: tuple[Column | str, ...]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in cols]


def hash_hex(*cols: Column | str) -> Column:
    """md5 hex digest of the concatenated key tuple.

    Uses Snowflake-CONCAT semantics: NULL propagates (SURVEY P19) —
    ``concat`` in Spark matches; a NULL component yields a NULL key.
    Cast every component to string first so numeric formatting is
    engine-stable.
    """
    parts = [c.cast("string") for c in _cols(cols)]
    return F.md5(F.concat(*parts) if len(parts) > 1 else parts[0])


def hash_key(*cols: Column | str) -> Column:
    """Signed 64-bit surrogate key from the md5 hex digest.

    Top 15 hex chars (60 bits) → always a non-negative long, no
    overflow reinterpretation needed, reproducible from the hex digest
    in any engine (``int(hex[:15], 16)``). Deterministic,
    partition-friendly (uniform), join-friendly (fixed-width int
    instead of wide strings — same motivation as the reference,
    SURVEY §4).
    """
    return F.conv(F.substring(hash_hex(*cols), 1, 15), 16, 10).cast("long")


def smart_date_key(ts: Column | str) -> Column:
    """TO_NUMBER(TO_CHAR(ts,'YYYYMMDD')) (`login-audit_proc.sql:255`)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.date_format(c, "yyyyMMdd").cast("long")


def smart_time_key(ts: Column | str) -> Column:
    """TO_NUMBER(TO_CHAR(ts,'HH24MISS')) (`login-audit_proc.sql:256`)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.date_format(c, "HHmmss").cast("long")
