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


def constraint_report(
    df: DataFrame,
    row_rules: dict[str, F.Column] | None = None,
    unique: dict[str, list[str]] | None = None,
    foreign_keys: dict[str, tuple[DataFrame, list[str], list[str]]] | None = None,
) -> DataFrame:
    """Declarative constraint suite -> one (rule, n_violations) report frame,
    the expectations-style generalization of the point validators above.

    ``row_rules``: {name: violation predicate Column} — ALL evaluated in ONE
    aggregation pass over one scan (each rule is a summed flag), however many
    rules there are; this is the property that keeps a 50-rule suite the
    same cost as one rule at 100 TB.
    ``unique``: {name: key columns} — one groupBy per ruleset counting rows
    beyond the first per key.
    ``foreign_keys``: {name: (parent_df, child_cols, parent_cols)} — orphan
    rows counted with a left-anti join (parent side broadcast by AQE when
    dimension-sized).
    """
    spark = df.sparkSession
    reports: list[DataFrame] = []
    if row_rules:
        aggs = [
            F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias(name)
            for name, pred in row_rules.items()
        ]
        one = df.agg(*aggs)
        stack = (
            f"stack({len(row_rules)}, "
            + ", ".join(f"'{n}', `{n}`" for n in row_rules)
            + ") as (rule, n_violations)"
        )
        reports.append(one.selectExpr(stack))
    for name, keys in (unique or {}).items():
        dup = (
            df.groupBy(*keys)
            .agg((F.count(F.lit(1)) - 1).alias("extra"))
            .agg(F.sum("extra").cast("long").alias("n_violations"))
            .select(F.lit(name).alias("rule"), F.coalesce("n_violations", F.lit(0)).alias("n_violations"))
        )
        reports.append(dup)
    for name, (parent, child_cols, parent_cols) in (foreign_keys or {}).items():
        orphans = df.join(
            parent.select(
                *[F.col(p).alias(c) for c, p in zip(child_cols, parent_cols)]
            ).dropDuplicates(child_cols),
            child_cols,
            "left_anti",
        )
        reports.append(
            orphans.agg(F.count(F.lit(1)).cast("long").alias("n_violations")).select(
                F.lit(name).alias("rule"), "n_violations"
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def unused_fields(df: DataFrame, mapped: list[str]) -> list[str]:
    """X4 header audit: plan-time check of df.columns vs the alias map
    (datasets.py:250-268) — returns unmapped columns instead of warning."""
    return [c for c in df.columns if c not in mapped]
