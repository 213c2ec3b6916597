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


def fd_audit(df: DataFrame, det_cols: list[str], dep_col: str) -> DataFrame:
    """Functional-dependency audit: does ``det_cols -> dep_col`` hold, and
    how badly is it broken? The schema-inference / data-quality primitive
    behind "is this column a key for that one" — e.g. does zip determine
    city, does part determine supplier. Output is ONE summary row:

      - n_classes:      distinct determinant values
      - n_violating:    determinant classes mapping to >1 dependent value
      - n_rows:         rows carrying a non-NULL determinant+dependent
      - n_violating_rows: rows inside violating classes
      - repair_cost:    minimum row deletions to restore the FD
                        (rows - majority-dependent rows, summed over
                        violating classes — the classic g3-style count)

    NULLs on either side are excluded (SQL FD semantics are defined over
    non-NULL tuples).

    Shape at scale: groupBy(det, dep) over the scan (map-side combinable —
    the shuffle carries distinct pairs), then a groupBy(det) over the PAIR
    frame, then one scalar aggregate. No count_distinct expand, no join.
    Exactly three shuffles of strictly shrinking frames."""
    nn = F.col(dep_col).isNotNull()
    for c in det_cols:
        nn = nn & F.col(c).isNotNull()
    pairs = (
        df.where(nn)
        .groupBy(*[F.col(c).alias(f"d{i}") for i, c in enumerate(det_cols)],
                 F.col(dep_col).alias("dep"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    classes = pairs.groupBy(*[f"d{i}" for i in range(len(det_cols))]).agg(
        F.count(F.lit(1)).cast("long").alias("n_dep"),
        F.sum("cnt").cast("long").alias("rows"),
        F.max("cnt").cast("long").alias("max_dep_rows"),
    )
    viol = F.col("n_dep") > 1
    return classes.agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum(F.when(viol, 1).otherwise(0)).cast("long").alias("n_violating"),
        F.sum("rows").cast("long").alias("n_rows"),
        F.sum(F.when(viol, F.col("rows")).otherwise(0)).cast("long")
        .alias("n_violating_rows"),
        F.sum(F.when(viol, F.col("rows") - F.col("max_dep_rows")).otherwise(0))
        .cast("long")
        .alias("repair_cost"),
    )


def fd_audit_sql(rows_sql: str, n_det: int = 1) -> str:
    """Generated DuckDB mirror of ``fd_audit``: expects ``rows_sql`` to
    yield (d0[, d1, ...], dep) already NULL-filtered upstream or with
    NULLs present (filtered identically here)."""
    det = ", ".join(f"d{i}" for i in range(n_det))
    nn = " AND ".join([f"d{i} IS NOT NULL" for i in range(n_det)] + ["dep IS NOT NULL"])
    return f"""
WITH rows_in AS ({rows_sql}),
pairs AS (
  SELECT {det}, dep, count(*) AS cnt FROM rows_in
  WHERE {nn} GROUP BY {det}, dep
),
classes AS (
  SELECT {det}, count(*) AS n_dep, sum(cnt) AS rows_, max(cnt) AS max_dep_rows
  FROM pairs GROUP BY {det}
)
SELECT CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(CASE WHEN n_dep > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
       CAST(sum(rows_) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN n_dep > 1 THEN rows_ ELSE 0 END) AS BIGINT)
         AS n_violating_rows,
       CAST(sum(CASE WHEN n_dep > 1 THEN rows_ - max_dep_rows ELSE 0 END) AS BIGINT)
         AS repair_cost
FROM classes
"""
