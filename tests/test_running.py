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
        strategy="two_phase",
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
        strategy="two_phase",
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
        df, "v", order_by=[("id", "asc")], cum_col="cum", num_partitions=5,
        strategy="two_phase",
    )
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    want = {r["id"]: r["cum"] for r in df.withColumn("cum", F.sum("v").over(w)).collect()}
    for r in got.collect():
        assert abs(r["cum"] - want[r["id"]]) < 1e-6


def test_running_totals_no_window_exec(spark):
    df = spark.range(100).withColumn("v", F.col("id") % 7)
    got = running_totals(
        df, "v", order_by=[("id", "asc")], num_partitions=4,
        # auto would route this dimension-sized frame to the window path;
        # force two-phase to pin its Window-free plan
        strategy="two_phase",
    )
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


def test_percentiles_and_pareto_plans_have_no_window(spark, sf_dir, monkeypatch):
    """The two VERDICT-r4 scale defects: exact_percentiles must not sort per
    3-value group on single tasks, pareto must not push the customer frame
    through one WindowExec task. Their running_totals calls auto-route by
    row count — at test scale they legitimately take the window path, so pin
    the threshold to 0 to simulate a fact-sized input and assert the routed
    two-phase plans contain no Window node at all."""
    from migdar_data_pipelines_spark.operators import windows as windows_mod
    from migdar_data_pipelines_spark.plans import query_fns

    monkeypatch.setattr(windows_mod, "AUTO_ROWS_THRESHOLD", 0)
    fns = query_fns()
    for name in ("exact_percentiles_lineitem", "pareto_revenue_customers"):
        df = fns[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert "Window" not in plan, name


def test_running_totals_auto_routing(spark):
    """auto takes the window path on dimension-sized input, the two-phase
    path above the threshold, and both agree with the reference window."""
    import random

    random.seed(3)
    data = [
        (i, ["x", "y"][i % 2], random.randint(1, 40)) for i in range(400)
    ]
    df = spark.createDataFrame(data, "id long, g string, v long")
    w = Window.partitionBy("g").orderBy("v", "id")
    want = df.withColumn("rk", F.row_number().over(w).cast("long")).withColumn(
        "cum", F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    kw = dict(
        order_by=[("v", "asc"), ("id", "asc")], partition_by=["g"],
        cum_col="cum", rank_col="rk", num_partitions=5,
    )

    small = running_totals(df, "v", **kw)  # auto: 400 <= threshold
    plan = small._sc._jvm.PythonSQLUtils.explainString(
        small._jdf.queryExecution(), "formatted"
    )
    assert "Window" in plan
    assert _rows(small, "id", "g", "cum", "rk") == _rows(
        want, "id", "g", "cum", "rk"
    )

    big = running_totals(df, "v", auto_rows_threshold=10, **kw)
    plan = big._sc._jvm.PythonSQLUtils.explainString(
        big._jdf.queryExecution(), "formatted"
    )
    assert "Window" not in plan
    assert _rows(big, "id", "g", "cum", "rk") == _rows(
        want, "id", "g", "cum", "rk"
    )


def test_running_totals_summary_bound_fail_fast(spark, monkeypatch):
    """A high-cardinality partition_by must raise instead of collecting an
    unbounded per-(partition, group) summary to the driver."""
    import pytest

    from migdar_data_pipelines_spark.operators import windows as windows_mod

    monkeypatch.setattr(windows_mod, "MAX_SUMMARY_ROWS", 5)
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 50).alias("g"), F.lit(1).alias("v")
    )
    with pytest.raises(ValueError, match="high-cardinality"):
        running_totals(
            df, "v", order_by=[("id", "asc")], partition_by=["g"],
            num_partitions=4, strategy="two_phase",
        )


def test_ewma_by_matches_python_reference(spark):
    """operators/windows.py::ewma_by vs the textbook bounded-window EWMA:
    warm-up rows use the truncated normalizer; steady state matches the
    recurrence-free weighted mean; per-key independence."""
    from migdar_data_pipelines_spark.operators.windows import ewma_by

    ALPHA, W = 0.25, 4
    q = 1 - ALPHA
    series = {"u1": [10.0, 20.0, 30.0, 40.0, 50.0, 60.0], "u2": [5.0, 5.0, 5.0]}

    def ref(xs, t):
        m = min(W, t + 1)
        vals = xs[t - m + 1 : t + 1]
        num = sum(x * q ** (m - 1 - j) for j, x in enumerate(vals))
        den = sum(q**j for j in range(m))
        import math as _m
        # contract rounding: explicit IEEE floor(x*1e6 + 0.5)/1e6
        return _m.floor((num / den) * 1e6 + 0.5) / 1e6

    rows = [
        (u, i, x) for u, xs in series.items() for i, x in enumerate(xs)
    ]
    df = spark.createDataFrame(rows, "u string, i long, v double")
    got = {
        (r["u"], r["i"]): r["ewma"]
        for r in ewma_by(df, ["u"], ["i"], "v", alpha=ALPHA, window=W).collect()
    }
    import pytest as _pt

    for u, xs in series.items():
        for t in range(len(xs)):
            assert got[(u, t)] == _pt.approx(ref(xs, t), abs=1e-6), (u, t)
    # constant series smooths to itself everywhere
    assert all(got[("u2", t)] == 5.0 for t in range(3))


def test_ewma_by_null_values_cross_engine(spark):
    """ADVICE r7: ewma_by on a NULL-bearing value stream must agree with
    the generated DuckDB mirror — NULL observations drop out of the
    frame in BOTH engines (Spark collect_list drops implicitly; the
    mirror list_filters), and an all-NULL frame yields NULL ewma instead
    of a division error."""
    import duckdb

    from migdar_data_pipelines_spark.operators.windows import ewma_by, ewma_by_sql
    from tests import parity

    rows = [
        ("u1", 0, 10.0), ("u1", 1, None), ("u1", 2, 30.0), ("u1", 3, None),
        ("u1", 4, 50.0),
        # u2: leading all-NULL frame -> ewma NULL on the first rows
        ("u2", 0, None), ("u2", 1, None), ("u2", 2, 7.0),
    ]
    df = spark.createDataFrame(rows, "u string, i long, v double")
    got = ewma_by(df, ["u"], ["i"], "v", alpha=0.3, window=3)
    assert got.where((F.col("u") == "u2") & (F.col("i") < 2))\
              .where(F.col("ewma").isNull()).count() == 2

    con = duckdb.connect()
    con.sql(
        "CREATE TABLE t (u VARCHAR, i BIGINT, v DOUBLE)"
    )
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    sql = ewma_by_sql("t", ["u"], ["i"], "v", alpha=0.3, window=3)
    parity.compare(got, con, sql, name="ewma_by_nulls")
