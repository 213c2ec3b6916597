"""Validation operators — the reference's inline checks as assertable passes.

The reference validates inline: DF.validate() schema re-checks
(datasets.py:348,451), a units whitelist hard-assert (datasets.py:141-146),
percent-range warnings (datasets.py:150-164), unused-header warnings
(datasets.py:250-268). Here each check is a DataFrame -> violation-count
operator, so pipelines can assert count==0 (SURVEY.md §5.2.3 turns warnings
into properties)."""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ValidationError(AssertionError):
    pass


def validate_not_null(df: DataFrame, cols: list[str], raise_: bool = True) -> int:
    """Nulls in declared non-nullable fields (DF.validate parity)."""
    cond = None
    for c in cols:
        k = F.col(c).isNull()
        cond = k if cond is None else (cond | k)
    n = df.filter(cond).count()
    if n and raise_:
        raise ValidationError(f"{n} rows with nulls in {cols}")
    return n


def validate_in_set(df: DataFrame, col: str, allowed: list[Any], raise_: bool = True) -> int:
    """Whitelist assert (units whitelist — datasets.py:141-146; also catches
    recode_map(strict=True) '__UNKNOWN__' sentinels)."""
    n = df.filter(~F.col(col).isin(allowed) | F.col(col).isNull()).count()
    if n and raise_:
        raise ValidationError(f"{n} rows with {col} outside {allowed}")
    return n


def validate_range(
    df: DataFrame, col: str, lo: float, hi: float, raise_: bool = True
) -> int:
    """X5 percent sanity check as a hard property (datasets.py:150-164)."""
    n = df.filter((F.col(col) < lo) | (F.col(col) > hi)).count()
    if n and raise_:
        raise ValidationError(f"{n} rows with {col} outside [{lo},{hi}]")
    return n


def unused_fields(df: DataFrame, mapped: list[str]) -> list[str]:
    """X4 header audit: plan-time check of df.columns vs the alias map
    (datasets.py:250-268) — returns unmapped columns instead of warning."""
    return [c for c in df.columns if c not in mapped]
