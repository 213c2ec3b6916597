"""Structured Streaming: AvailableNow (cron-batch parity mode) must produce
the same aggregates as the batch plan (SURVEY §2.13)."""

import shutil
import tempfile

from migdar_data_pipelines_spark.streaming import (
    read_events_stream,
    run_available_now,
    tumbling_agg,
)


def test_available_now_equals_batch(spark, sf_dir):
    events_path = f"{sf_dir}/events.parquet"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from pyspark.sql import functions as F

    batch = spark.read.parquet(events_path)
    if dict(batch.dtypes).get("ts") == "bigint":
        batch = batch.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    expected = {
        tuple(r) for r in tumbling_agg(batch, "1 hour").collect()
    }

    stream = read_events_stream(spark, events_path)
    assert stream.isStreaming
    agg = tumbling_agg(stream, "1 hour", watermark="2 hours")
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    try:
        run_available_now(agg, ckpt, query_name="t_tumbling", output_mode="complete")
        got = {tuple(r) for r in spark.table("t_tumbling").collect()}
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    assert got == expected


def test_session_window_streaming_runs(spark, sf_dir):
    from migdar_data_pipelines_spark.streaming import session_window_agg

    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    agg = session_window_agg(stream, gap="30 minutes", watermark="1 hour")
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    try:
        run_available_now(agg, ckpt, query_name="t_sessions", output_mode="complete")
        n = spark.table("t_sessions").count()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    assert n > 0
