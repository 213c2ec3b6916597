"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 as
(spark_fn, DuckDB-SQL) pairs — the registry lives in
``migdar_data_pipelines_spark/plans/queries.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

try:
    # installed package (pip wheel from tools/build_wheel.py, or
    # `python setup.py develop` — see pyproject.toml)
    from migdar_data_pipelines_spark.plans import oracle_sqls, query_fns
except ModuleNotFoundError:
    # bare checkout loaded by file path (importlib spec does not put the
    # script's directory on sys.path)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from migdar_data_pipelines_spark.plans import oracle_sqls, query_fns  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    fns = query_fns()
    return fns["flagship_entity_rollup"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return query_fns()


def oracle_sql() -> dict[str, str]:
    return oracle_sqls()
