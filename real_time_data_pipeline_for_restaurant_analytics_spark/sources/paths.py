"""Date-partitioned ingest path contract (S8/O3).

The reference builds `@stage/YYYY/M/D/` from CURRENT_DATE-1 with
*non-zero-padded* month/day (`task_proc.sql:14-22`: FMMM/FMD) and
appends `<entity>.<csv|json>` per entity (`final_proc.sql:19-28`).
"""

from __future__ import annotations

from datetime import date, timedelta


def date_path(d: date) -> str:
    """'YYYY/M/D/' — no zero padding, mirroring FMMM/FMD."""
    return f"{d.year}/{d.month}/{d.day}/"


def yesterday_path(today: date | None = None) -> str:
    """RUN_FINAL_FOR_YESTERDAY's path (`task_proc.sql:6-28`)."""
    t = today or date.today()
    return date_path(t - timedelta(days=1))


def entity_file(stage_prefix: str, entity: str, ext: str = "csv") -> str:
    """`final_proc.sql:30-39`: stage_path || '<entity>.<ext>'."""
    sep = "" if stage_prefix.endswith("/") else "/"
    return f"{stage_prefix}{sep}{entity}.{ext}"
