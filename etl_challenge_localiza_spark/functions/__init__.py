from .cleaning import NULL_TOKENS, clean_string, normalize_column_names
from .timeparse import (
    EPOCH_DIVISORS,
    detect_timestamp_unit,
    looks_numeric,
    parse_epoch,
    parse_timestamp_auto,
)

__all__ = [
    "NULL_TOKENS",
    "clean_string",
    "normalize_column_names",
    "EPOCH_DIVISORS",
    "detect_timestamp_unit",
    "looks_numeric",
    "parse_epoch",
    "parse_timestamp_auto",
]
