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

# Prefer the checkout sitting next to this entry file: a stale wheel
# installed earlier (tools/build_wheel.py makes that likely) must not
# silently shadow the code the harness thinks it is running (ADVICE r10).
# The installed package remains the fallback for wheel-only environments.
# Insert at position 0 UNCONDITIONALLY: a develop-install .pth puts the
# checkout on sys.path AFTER site-packages, so "already present" does not
# mean "wins the import race" — a duplicate front entry is harmless and is
# the only way to actually enforce the preference.
_here = os.path.dirname(os.path.abspath(__file__))
if os.path.isdir(os.path.join(_here, "migdar_data_pipelines_spark")):
    sys.path.insert(0, _here)
from migdar_data_pipelines_spark.plans import oracle_sqls, query_fns  # noqa: E402

_resolved = os.path.dirname(os.path.dirname(os.path.abspath(
    sys.modules["migdar_data_pipelines_spark"].__file__)))
if os.path.isdir(os.path.join(_here, "migdar_data_pipelines_spark")) and _resolved != _here:
    print(
        f"__spark_entry__: WARNING — resolved package at {_resolved!r}, "
        f"not the checkout at {_here!r} (stale installed wheel?)",
        file=sys.stderr,
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    fns = query_fns()
    return fns["flagship_entity_rollup"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return query_fns()


def oracle_sql() -> dict[str, str]:
    return oracle_sqls()
