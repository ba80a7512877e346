"""Scalar-function helpers and the UDF surface (SURVEY.md §2.8, §2.12)."""

from projectmapreduce_spark.functions.rounding import dround, money_avg, money_sum

__all__ = ["dround", "money_avg", "money_sum"]
