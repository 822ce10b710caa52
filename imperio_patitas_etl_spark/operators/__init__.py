"""Relational + pipeline operators (SURVEY.md §2)."""

from imperio_patitas_etl_spark.operators.validate import EntitySpec, ValidationResult

__all__ = ["EntitySpec", "ValidationResult"]
