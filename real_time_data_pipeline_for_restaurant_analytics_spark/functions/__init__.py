from .casts import try_to_date, try_to_decimal, try_to_number, try_to_timestamp
from .keys import hash_key, smart_date_key, smart_time_key
from .enrich import (
    case_map,
    mask_columns,
    with_datetime_parts,
)

__all__ = [
    "try_to_number",
    "try_to_decimal",
    "try_to_date",
    "try_to_timestamp",
    "hash_key",
    "smart_date_key",
    "smart_time_key",
    "case_map",
    "mask_columns",
    "with_datetime_parts",
]
