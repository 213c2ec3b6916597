"""Training-shard writer: the terminal step of an LLM data pipeline — turn a
curated corpus into a deterministic, reproducibly-laid-out set of shard files
a training job can map to data-loader workers.

Layout contract:
  * shard assignment is ``md5_bucket(id) % n_shards`` — engine-portable and
    stable across partitioning, retries, and re-runs (NOT ``spark_partition_id``
    or round-robin, both of which change with the physical plan);
  * one directory per shard (``shard=K/``), written via ``partitionBy`` after
    repartitioning ON the shard column, so each task owns whole shards and
    file counts stay O(n_shards), not O(n_shards x n_tasks);
  * rows within a shard are sorted by the order column
    (``sortWithinPartitions``) so file CONTENT is deterministic, which makes
    re-runs verifiable by fingerprint;
  * ``max_records_per_file`` bounds file size for loader parallelism without
    an extra shuffle (Spark splits during the write).

At 100 TB this is exactly one shuffle (the repartition); the sort is
per-partition, never global. Companion of sinks/package.py::dump_to_path
(reference K1) re-aimed at training-data consumers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..llm.curation import md5_bucket


def shard_assignment(id_col: str, n_shards: int) -> F.Column:
    """Deterministic shard id in [0, n_shards) from the row id (md5 fold —
    portable to the DuckDB oracle via md5_bucket_sql, unlike hash())."""
    return F.pmod(md5_bucket(id_col), F.lit(n_shards)).cast("int")


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int,
    order_col: str | None = None,
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
    count_by: list[str] | None = None,
) -> dict:
    """Write ``df`` as ``path/shard=K/*.parquet`` with deterministic
    assignment and in-shard order. Returns per-shard row counts (one extra
    aggregate over the same shuffled data — cheap relative to the write).

    ``count_by``: extra columns to sub-divide the count aggregate by; the
    result then also carries ``rows_per_shard_split`` keyed by
    ``(shard, *count_by values)`` — callers wanting e.g. a train/val
    histogram fold it from the aggregate the writer runs anyway instead of
    paying their own pass (see llm/pipeline.py::curate_corpus).
    """
    sharded = df.withColumn("shard", shard_assignment(id_col, n_shards))
    out = sharded.repartition(n_shards, "shard")
    out = out.sortWithinPartitions("shard", order_col or id_col)
    writer = out.write.mode(mode).partitionBy("shard")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", int(max_records_per_file))
    writer.parquet(path)
    by = ["shard", *(count_by or [])]
    rows = sharded.groupBy(*by).agg(F.count(F.lit(1)).alias("n")).collect()
    counts: dict = {}
    for r in rows:
        counts[int(r["shard"])] = counts.get(int(r["shard"]), 0) + int(r["n"])
    result = {"path": path, "n_shards": n_shards, "rows_per_shard": counts}
    if count_by:
        result["rows_per_shard_split"] = {
            (int(r["shard"]), *[r[c] for c in count_by]): int(r["n"]) for r in rows
        }
    return result
