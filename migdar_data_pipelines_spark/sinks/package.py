"""Package sinks: K1 ``dump_to_path``, K10 ``printer``, K11 ``checkpoint``.

The reference hands data between pipelines exclusively via materialized
datapackages (``DF.dump_to_path`` — e.g. flows/judges.py:150,
flows/dump_to_es.py:155, flows/broken_links.py:120) and resumes expensive
phases from ``DF.checkpoint`` (flows/judges.py:132-148,
flows/broken_links.py:95-98).

Spark-first: the canonical stage format is parquet (columnar, splittable,
predicate-pushdown-able) with an optional CSV snapshot for K1 compatibility;
``manifest.json`` carries Table Schema + es:* metadata + the
``{count_of_rows, hash}`` run-stats fingerprint the reference reports per
resource (QUICKSTART.md:312-315).

Scale notes (100 TB): the fingerprint is an order-independent aggregate
(sum of per-row xxhash64) computed in the same job as the write, so it's one
extra reduce, no sort and no collect. ``checkpoint`` materializes to parquet
rather than ``.persist()`` so a re-run of the *job* (the reference's resume
unit — dpp re-runs a failed pipeline from its checkpoint) can skip the
upstream stages entirely.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema.manifest import write_manifest
from ..schema.table_schema import struct_to_schema


def fingerprint(df: DataFrame) -> tuple[int, int]:
    """Order-independent content hash: ``(fp, row_count)`` where fp is the
    mod-2^64 sum of xxhash64 over the JSON encoding of every row. Stable
    across partitioning/shuffle (§5.2.4 determinism), unlike the reference's
    md5-of-bytes which pins row order."""
    row = (
        df.select(
            # accumulate in decimal(38,0): a plain long sum overflows under
            # ANSI mode once row counts get large; reduce mod 2^64 after.
            F.sum(
                F.xxhash64(F.to_json(F.struct(*df.columns))).cast("decimal(38,0)")
            ).alias("fp"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()[0]
    )
    fp = int(row["fp"] or 0) % (1 << 64)
    return fp, int(row["n"])


def dump_to_path(
    resources: dict[str, DataFrame],
    path: str,
    name: str = "package",
    csv: bool = False,
    primary_keys: dict[str, list[str]] | None = None,
    with_fingerprint: bool = True,
) -> dict[str, Any]:
    """K1: write every resource as parquet (+ optional CSV snapshot) and a
    manifest.json describing schema/primaryKey/count/fingerprint.

    Returns the manifest dict (reference parity: the run-stats summary
    ``{count_of_rows, bytes, hash}`` per resource, QUICKSTART.md:312-315).
    """
    primary_keys = primary_keys or {}
    descriptors: dict[str, dict[str, Any]] = {}
    for rname, df in resources.items():
        rel = f"{rname}.parquet"
        df.write.mode("overwrite").parquet(os.path.join(path, rel))
        desc: dict[str, Any] = {
            "path": rel,
            "schema": struct_to_schema(df.schema, primary_keys.get(rname)),
        }
        if with_fingerprint:
            fp, n = fingerprint(df)
            desc["count_of_rows"] = n
            desc["hash"] = format(fp & 0xFFFFFFFFFFFFFFFF, "016x")
        if csv:
            # CSV snapshot for reference-compatible consumers; arrays/structs
            # are JSON-encoded strings there (CSV is typeless in the reference
            # too — everything rides through Table Schema casts).
            flat = df.select(
                *[
                    F.to_json(c).alias(c.name)
                    if c.dataType.typeName() in ("array", "struct", "map")
                    else F.col(c.name)
                    for c in df.schema.fields
                ]
            )
            flat.write.mode("overwrite").option("header", True).csv(
                os.path.join(path, f"{rname}.csv")
            )
            desc["csv_path"] = f"{rname}.csv"
        descriptors[rname] = desc
    write_manifest(path, descriptors, name=name)
    return {"name": name, "resources": descriptors}


def printer(df: DataFrame, num_rows: int = 20) -> DataFrame:
    """K10: ``DF.printer()`` (flows/dump_to_es.py:170 et al)."""
    df.show(num_rows, truncate=False)
    return df


def checkpoint(
    spark: SparkSession,
    df: DataFrame,
    checkpoint_dir: str,
    key: str,
    force: bool = False,
) -> DataFrame:
    """K11: ``DF.checkpoint(key)`` — materialize once, resume on re-run
    (flows/judges.py:132-148). If the keyed parquet stage already exists it is
    read back and the upstream plan is *not* executed."""
    stage = os.path.join(checkpoint_dir, key)
    marker = os.path.join(stage, "_SUCCESS")
    if force or not os.path.exists(marker):
        df.write.mode("overwrite").parquet(stage)
    return spark.read.parquet(stage)


__all__ = ["dump_to_path", "printer", "checkpoint", "fingerprint"]
