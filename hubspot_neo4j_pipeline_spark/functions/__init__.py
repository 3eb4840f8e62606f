"""Column-function library (SURVEY.md §2.2 F1-F10)."""

from .cleaning import (
    clean_domain,
    clean_email,
    deterministic_event_id,
    extract_email_from_values,
    name_concat,
    parse_date_lenient,
    property_hash,
    safe_float,
    safe_int,
    truncate_value,
)

__all__ = [
    "clean_email",
    "clean_domain",
    "parse_date_lenient",
    "safe_int",
    "safe_float",
    "extract_email_from_values",
    "name_concat",
    "truncate_value",
    "property_hash",
    "deterministic_event_id",
]
