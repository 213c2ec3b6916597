"""operators/frequent.py: exact two-phase Misra-Gries heavy hitters — the
certified fast path and the flat-data fallback must both equal the plain
groupBy top-k with the (n desc, value asc) tie-break."""

import pytest
from pyspark.sql import functions as F

from migdar_data_pipelines_spark.operators.frequent import (
    frequent_items,
    frequent_items_sql,
)


def plain_topk(df, col, k):
    return [
        (r["v"], r["n"])
        for r in (
            df.select(F.col(col).alias("v"))
            .filter(F.col("v").isNotNull())
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.asc("v"))
            .limit(k)
            .collect()
        )
    ]


def test_frequent_items_zipf_matches_plain(spark):
    # Zipf-ish: value i appears ~N/i times — heavy head, long tail
    rows = [(f"v{i:03d}",) for i in range(1, 200) for _ in range(600 // i)]
    df = spark.createDataFrame(rows, "t string").repartition(8)
    got = frequent_items(df, "t", k=10, capacity=64).collect()
    assert [(r.value, r.n) for r in got] == plain_topk(df, "t", 10)
    assert [r.rank for r in got] == list(range(1, 11))


def test_frequent_items_flat_data_falls_back_exact(spark):
    # every value unique: no heavy hitters at ANY capacity — the certificate
    # must fail and the fallback must still return the exact (tie-broken)
    # top-k: counts all 1, so the k smallest values by the asc tie-break
    df = spark.createDataFrame(
        [(f"u{i:04d}",) for i in range(500)], "t string"
    ).repartition(8)
    got = frequent_items(df, "t", k=5, capacity=16)
    assert [(r.value, r.n) for r in got.collect()] == [
        (f"u{i:04d}", 1) for i in range(5)
    ]


def test_frequent_items_ties_at_boundary_deterministic(spark):
    # 4 values tied at the k=3 boundary: value-asc must decide
    rows = [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 3 + [("d",)] * 3
    df = spark.createDataFrame(rows, "t string").repartition(4)
    got = [(r.value, r.n) for r in frequent_items(df, "t", k=3, capacity=8).collect()]
    assert got == [("a", 5), ("b", 3), ("c", 3)]


def test_frequent_items_nulls_excluded(spark):
    df = spark.createDataFrame(
        [("x",)] * 4 + [(None,)] * 10 + [("y",)] * 2, "t string"
    )
    got = [(r.value, r.n) for r in frequent_items(df, "t", k=2, capacity=8).collect()]
    assert got == [("x", 4), ("y", 2)]


def test_frequent_items_empty(spark):
    df = spark.createDataFrame([], "t string")
    assert frequent_items(df, "t", k=3).count() == 0


def test_frequent_items_sql_mirror_agrees(spark, tmp_path):
    import duckdb

    rows = [(f"v{i:02d}",) for i in range(1, 40) for _ in range(200 // i)]
    df = spark.createDataFrame(rows, "t string").repartition(4)
    df.write.mode("overwrite").parquet(str(tmp_path / "t.parquet"))
    con = duckdb.connect()
    oracle = con.sql(
        frequent_items_sql("t", f"read_parquet('{tmp_path}/t.parquet/*.parquet')", k=7)
    ).fetchall()
    got = [
        (r.value, r.n, r.rank) for r in frequent_items(df, "t", k=7, capacity=32).collect()
    ]
    assert got == [tuple(r) for r in oracle]


def test_frequent_items_certificate_never_lies(spark):
    """Adversarial shape for the per-partition summaries: the true #2 value
    is spread thin across partitions while decoys are partition-locally
    dense. Whatever path the certificate picks must equal the plain plan."""
    rows = []
    for p in range(8):
        rows += [(f"decoy{p}",)] * 30  # dense in one partition only
    rows += [("hot",)] * 100
    rows += [("spread",)] * 64  # 8 per partition after round-robin
    df = spark.createDataFrame(rows, "t string").repartition(8)
    for cap in (5, 8, 64):
        got = [
            (r.value, r.n)
            for r in frequent_items(df, "t", k=4, capacity=cap).collect()
        ]
        assert got == plain_topk(df, "t", 4), f"capacity={cap}"
