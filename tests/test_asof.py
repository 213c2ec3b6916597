"""As-of join operator (operators/asof.py) — direction, tolerance, tie and
null-payload semantics on a hand-computable frame. The registered query
(`asof_join_events_purchase`) checks the backward path against DuckDB's
native ASOF LEFT JOIN at driver scale; these tests pin the corners."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from migdar_data_pipelines_spark.operators.asof import asof_join


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, "a", _ts(0)),   # before any right row -> null
            (2, "a", _ts(5)),   # exactly at r1 -> inclusive match
            (3, "a", _ts(7)),   # between r1 and r2 -> r1
            (4, "a", _ts(30)),  # far after r2 -> r2 (tolerance test drops it)
            (5, "b", _ts(9)),   # other key -> its own stream
            (6, "c", _ts(9)),   # key with no right rows at all -> null
        ],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("a", _ts(5), 10.0),
            ("a", _ts(10), None),  # NULL value must still advance the pointer
            ("b", _ts(8), 7.0),
        ],
        "k string, rts timestamp, v double",
    )
    return left, right


def _rows(df):
    return {r["id"]: (r["v"], r["m_ts"]) for r in df.collect()}


def test_backward(frames):
    left, right = frames
    out = asof_join(
        left, right, on="k", left_ts="ts", right_ts="rts",
        fields={"v": "v"}, right_ts_as="m_ts",
    )
    got = _rows(out)
    assert got[1] == (None, None)
    assert got[2] == (10.0, _ts(5))      # inclusive at equality
    assert got[3] == (10.0, _ts(5))
    assert got[4] == (None, _ts(10))     # null payload, pointer advanced
    assert got[5] == (7.0, _ts(8))
    assert got[6] == (None, None)


def test_forward(frames):
    left, right = frames
    out = asof_join(
        left, right, on="k", left_ts="ts", right_ts="rts",
        fields={"v": "v"}, right_ts_as="m_ts", direction="forward",
    )
    got = _rows(out)
    assert got[1] == (10.0, _ts(5))      # earliest at-or-after
    assert got[2] == (10.0, _ts(5))      # inclusive at equality
    assert got[3] == (None, _ts(10))
    assert got[4] == (None, None)        # nothing after minute 30
    assert got[5] == (None, None)        # b's only right row is before
    assert got[6] == (None, None)


def test_tolerance_drops_stale_matches(frames):
    left, right = frames
    out = asof_join(
        left, right, on="k", left_ts="ts", right_ts="rts",
        fields={"v": "v"}, right_ts_as="m_ts", tolerance_s=600,
    )
    got = _rows(out)
    assert got[3] == (10.0, _ts(5))      # 2 min gap <= 10 min: kept
    assert got[4] == (None, None)        # 25 min gap: match nulled, row kept
    assert len(got) == 6                 # left-join: no rows dropped


def test_single_shuffle_plan(frames):
    # The whole point vs a range join: ONE exchange on the key, no join node.
    left, right = frames
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="rts", fields={"v": "v"})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_left_columns_preserved(frames):
    left, right = frames
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="rts", fields={"v": "v"})
    assert out.columns == ["id", "k", "ts", "v"]
    assert out.count() == left.count()


class TestRangeJoinBucketed:
    """operators/rangejoin.py — correctness vs the naive BETWEEN join and
    the plan property that justifies it (equi-join, not nested-loop)."""

    def _frames(self, spark):
        points = spark.createDataFrame(
            [(i, i * 10) for i in range(40)], "pid long, x long"
        )
        intervals = spark.createDataFrame(
            [
                (0, 0, 35),      # sub-bucket length
                (1, 30, 170),    # spans several buckets
                (2, 95, 100),    # boundary-inclusive both ends
                (3, 400, 9000),  # tail past all points
                (4, 120, 120),   # degenerate single-point interval
            ],
            "iid long, s long, e long",
        )
        return points, intervals

    def test_matches_naive_between_join(self, spark):
        from migdar_data_pipelines_spark.operators.rangejoin import range_join_bucketed

        points, intervals = self._frames(spark)
        got = {
            (r.pid, r.iid)
            for r in range_join_bucketed(points, intervals, "x", "s", "e", 50).collect()
        }
        naive = {
            (r.pid, r.iid)
            for r in points.join(
                intervals, (F.col("x") >= F.col("s")) & (F.col("x") <= F.col("e"))
            ).collect()
        }
        assert got == naive
        assert (0, 2) not in got and (10, 2) in got  # x=100 in [95,100]
        assert (12, 4) in got                        # degenerate [120,120]

    def test_plan_is_equi_join(self, spark):
        from migdar_data_pipelines_spark.operators.rangejoin import range_join_bucketed

        points, intervals = self._frames(spark)
        out = range_join_bucketed(points, intervals, "x", "s", "e", 50)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan


class TestHllSketch:
    """operators/sketches.py — portability, mergeability, accuracy."""

    def test_registers_merge_across_shards(self, spark):
        # re-aggregating per-shard register maxima == whole-corpus registers:
        # the property that lets shards/engines union their sketch state.
        from migdar_data_pipelines_spark.operators.sketches import hll_registers

        df = spark.range(2000).select(F.col("id").cast("string").alias("v"))
        whole = {
            (r.register, r.max_rho) for r in hll_registers(df, "v").collect()
        }
        a = hll_registers(df.filter("id % 2 = 0"), "v")
        b = hll_registers(df.filter("id % 2 = 1"), "v")
        merged = {
            (r.register, r.max_rho)
            for r in a.unionByName(b)
            .groupBy("register")
            .agg(F.max("max_rho").alias("max_rho"))
            .collect()
        }
        assert merged == whole

    def test_estimate_accuracy_and_small_range_branch(self, spark):
        import duckdb

        from migdar_data_pipelines_spark.operators.sketches import (
            hll_distinct,
            hll_sql,
        )

        con = duckdb.connect()
        for n in (40, 5000):  # 40 -> small-range ln correction; 5000 -> raw
            df = spark.range(n).select(F.col("id").cast("string").alias("v"))
            est = hll_distinct(df, "v").collect()[0]["hll_estimate"]
            assert abs(est - n) / n < 0.25, (n, est)  # ~3.8 sigma at m=256
            duck = con.sql(
                f"WITH src AS (SELECT CAST(range AS VARCHAR) AS v FROM range({n}))"
                + f" SELECT * FROM ({hll_sql('v', 'src')})"
            ).fetchone()[0]
            assert est == duck, (n, est, duck)
