"""Scalar / column-expression layer (SURVEY.md §2.6 C1-C13 + text/vector fns)."""

from imperio_patitas_etl_spark.functions.cleaning import (
    blank_to_null,
    bool_to_int,
    clean_string,
    epoch_us,
    is_valid_email,
    is_valid_rut,
    money,
    normalize_sentinels,
    ts_from_unix,
)

__all__ = [
    "blank_to_null",
    "bool_to_int",
    "clean_string",
    "epoch_us",
    "is_valid_email",
    "is_valid_rut",
    "money",
    "normalize_sentinels",
    "ts_from_unix",
]
