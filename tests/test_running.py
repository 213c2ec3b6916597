"""Unit tests for the two-phase distributed running totals and the
broadcast-self-join bounded running helper (operators/windows.py) — the
replacements for no-partition / low-cardinality-partition WindowExec shapes.
Every case is checked against the single-partition Window result it replaces.
"""

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from migdar_data_pipelines_spark.operators.windows import (
    bounded_running,
    running_totals,
)


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_running_totals_global_matches_window(spark):
    random.seed(7)
    data = [(i, random.randint(1, 100)) for i in range(500)]
    df = spark.createDataFrame(data, "id long, v long")

    got = running_totals(
        df, "v", order_by=[("v", "desc"), ("id", "asc")],
        cum_col="cum", rank_col="rk", num_partitions=7,
    )
    w = Window.orderBy(F.desc("v"), F.asc("id"))
    want = df.withColumn("rk", F.row_number().over(w).cast("long")).withColumn(
        "cum", F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    assert _rows(got, "id", "v", "cum", "rk") == _rows(want, "id", "v", "cum", "rk")


def test_running_totals_grouped_matches_window(spark):
    random.seed(11)
    data = [
        (i, ["a", "b", "c"][i % 3], random.randint(1, 50)) for i in range(600)
    ]
    df = spark.createDataFrame(data, "id long, g string, v long")

    got = running_totals(
        df, "v", order_by=[("v", "asc"), ("id", "asc")],
        partition_by=["g"], cum_col="cum", rank_col="rk", num_partitions=6,
    )
    w = Window.partitionBy("g").orderBy("v", "id")
    want = df.withColumn("rk", F.row_number().over(w).cast("long")).withColumn(
        "cum", F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    assert _rows(got, "id", "g", "cum", "rk") == _rows(want, "id", "g", "cum", "rk")


def test_running_totals_double_values(spark):
    data = [(i, float(i % 13) + 0.25) for i in range(200)]
    df = spark.createDataFrame(data, "id long, v double")
    got = running_totals(
        df, "v", order_by=[("id", "asc")], cum_col="cum", num_partitions=5
    )
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    want = {r["id"]: r["cum"] for r in df.withColumn("cum", F.sum("v").over(w)).collect()}
    for r in got.collect():
        assert abs(r["cum"] - want[r["id"]]) < 1e-6


def test_running_totals_no_window_exec(spark):
    df = spark.range(100).withColumn("v", F.col("id") % 7)
    got = running_totals(df, "v", order_by=[("id", "asc")], num_partitions=4)
    plan = got._sc._jvm.PythonSQLUtils.explainString(
        got._jdf.queryExecution(), "formatted"
    )
    assert "Window" not in plan


def test_bounded_running_rank_and_cumsum(spark):
    data = [("t%02d" % i, (i * 37) % 19 + 1) for i in range(25)]
    df = spark.createDataFrame(data, "term string, freq long")
    got = bounded_running(
        df, order_by=[("freq", "desc"), ("term", "asc")],
        value_col="freq", cum_col="cum", rank_col="rank",
    )
    w = Window.orderBy(F.desc("freq"), F.asc("term"))
    want = df.withColumn("rank", F.row_number().over(w).cast("long")).withColumn(
        "cum", F.sum("freq").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    assert _rows(got, "term", "freq", "cum", "rank") == _rows(
        want, "term", "freq", "cum", "rank"
    )
    plan = got._sc._jvm.PythonSQLUtils.explainString(
        got._jdf.queryExecution(), "formatted"
    )
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_percentiles_and_pareto_plans_have_no_window(spark, sf_dir):
    """The two VERDICT-r4 scale defects: exact_percentiles must not sort per
    3-value group on single tasks, pareto must not push the customer frame
    through one WindowExec task. Both now run the two-phase plan — assert the
    executed plans contain no Window node at all."""
    from migdar_data_pipelines_spark.plans import query_fns

    fns = query_fns()
    for name in ("exact_percentiles_lineitem", "pareto_revenue_customers"):
        df = fns[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert "Window" not in plan, name
