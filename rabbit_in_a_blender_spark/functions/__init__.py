from .scalars import (
    prequel_key,
    null_default,
    left_truncate,
    format_ts,
    parse_compact_date,
    mask_digits,
)

__all__ = [
    "prequel_key",
    "null_default",
    "left_truncate",
    "format_ts",
    "parse_compact_date",
    "mask_digits",
]
