"""R1 ``DF.unpivot``: wide -> long melt with regex-selected value columns.

Reference (flows/datasets.py:323-334): every column whose NAME matches a
year-ish regex becomes a (year, value) row; the regex capture group feeds the
key column; non-matching columns are carried as ids.

Spark-first: resolve the matching columns against ``df.columns`` at plan time,
then use the native ``melt`` (Spark >= 3.4) — one narrow generate, no shuffle,
columns pruned at the scan.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unpivot_regex(
    df: DataFrame,
    name_regex: str,
    var_name: str,
    value_name: str,
    extra_capture: int | None = 1,
) -> DataFrame:
    """Melt all columns matching ``name_regex`` into (var_name, value_name).

    If the regex has a capture group and ``extra_capture`` is set, the captured
    text replaces the raw column name in ``var_name`` (the reference feeds the
    captured year into the key column — datasets.py:327-333).
    """
    rx = re.compile(name_regex)
    matches = [(c, rx.search(c)) for c in df.columns]
    value_cols = [c for c, m in matches if m]
    if not value_cols:
        raise ValueError(f"unpivot_regex: no columns match {name_regex!r}")
    id_cols = [c for c, m in matches if not m]
    melted = df.melt(
        ids=id_cols, values=value_cols, variableColumnName=var_name, valueColumnName=value_name
    )
    if extra_capture is not None:
        # rewrite the variable column to the regex capture, plan-time map
        mapping = {
            c: (rx.search(c).group(extra_capture) if rx.search(c).groups() else c)
            for c in value_cols
        }
        expr = None
        for raw, captured in mapping.items():
            cond = F.col(var_name) == F.lit(raw)
            expr = F.when(cond, F.lit(captured)) if expr is None else expr.when(cond, F.lit(captured))
        melted = melted.withColumn(var_name, expr.otherwise(F.col(var_name)))
    return melted
