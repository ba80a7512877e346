"""Scalar-function helpers and the UDF surface (SURVEY.md §2.8, §2.12)."""

from projectmapreduce_spark.functions.rounding import dround

__all__ = ["dround"]
