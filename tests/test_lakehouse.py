"""K2 lakehouse MERGE variant (VERDICT r3 ask #6): copy-on-write versioned
parquet table with partition-pruned rewrite and fingerprint idempotence, plus
the Delta/Iceberg MERGE INTO statement builder."""

import json
import os

from migdar_data_pipelines_spark.sinks.lakehouse import (
    LakehouseTable,
    lakehouse_merge_sql,
)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_lakehouse_merge_upsert_and_idempotent_rerun(spark, tmp_path):
    t = LakehouseTable(str(tmp_path / "tbl"))
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "id long, name string, v long"
    )
    assert t.merge(base, ["id"]) == 0
    assert _rows(t.read(spark)) == [(1, "a", 10), (2, "b", 20), (3, "c", 30)]

    # update key 2, insert key 4 — classic mode='update'
    delta = spark.createDataFrame([(2, "B", 99), (4, "d", 40)], "id long, name string, v long")
    assert t.merge(delta, ["id"]) == 1
    assert _rows(t.read(spark)) == [
        (1, "a", 10),
        (2, "B", 99),
        (3, "c", 30),
        (4, "d", 40),
    ]

    # the reference's cron re-run story: applying the SAME day's upsert again
    # must be a provable no-op — same content AND no version advance
    assert t.merge(delta, ["id"]) == 1
    assert t.latest_version() == 1
    assert _rows(t.read(spark)) == [
        (1, "a", 10),
        (2, "B", 99),
        (3, "c", 30),
        (4, "d", 40),
    ]


def test_lakehouse_partition_pruned_rewrite(spark, tmp_path):
    """A merge touching one partition must carry every other partition into
    the new manifest BY REFERENCE (same data dir, no rewrite) — the property
    that bounds a 100 TB MERGE to its affected partitions."""
    t = LakehouseTable(str(tmp_path / "ptbl"), partition_by="region")
    base = spark.createDataFrame(
        [(1, "eu", 10), (2, "eu", 20), (3, "us", 30)], "id long, region string, v long"
    )
    t.merge(base, ["id"])
    m0 = json.load(open(os.path.join(t.path, "_v0.json")))

    delta = spark.createDataFrame([(3, "us", 99)], "id long, region string, v long")
    assert t.merge(delta, ["id"]) == 1
    m1 = json.load(open(os.path.join(t.path, "_v1.json")))
    # eu untouched -> same dir pointer as v0; us rewritten -> new dir
    assert m1["partitions"]["eu"] == m0["partitions"]["eu"]
    assert m1["partitions"]["us"] != m0["partitions"]["us"]
    assert m1["fingerprints"]["eu"] == m0["fingerprints"]["eu"]
    assert _rows(t.read(spark)) == [(1, "eu", 10), (2, "eu", 20), (3, "us", 99)]


def test_lakehouse_vacuum_drops_only_dead_dirs(spark, tmp_path):
    t = LakehouseTable(str(tmp_path / "vtbl"), partition_by="region")
    t.merge(
        spark.createDataFrame([(1, "eu", 1), (2, "us", 2)], "id long, region string, v long"),
        ["id"],
    )
    t.merge(spark.createDataFrame([(2, "us", 9)], "id long, region string, v long"), ["id"])
    removed = t.vacuum(keep_versions=1)
    # v0's us dir is dead (rewritten in v1); v0's eu dir is still referenced
    assert removed == [os.path.join("data", "v0", "us")]
    assert _rows(t.read(spark)) == [(1, "eu", 1), (2, "us", 9)]


def test_lakehouse_merge_sql_statement():
    stmt = lakehouse_merge_sql("lake.docs", "updates", ["id", "name", "v"], ["id"])
    assert stmt == (
        "MERGE INTO lake.docs t USING updates s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET t.name = s.name, t.v = s.v "
        "WHEN NOT MATCHED THEN INSERT (id, name, v) VALUES (s.id, s.name, s.v)"
    )


def test_lakehouse_compact_merges_small_files(spark, tmp_path):
    t = LakehouseTable(str(tmp_path / "ctbl"), partition_by="region")
    frag = spark.createDataFrame(
        [(i, "eu" if i % 2 else "us", i * 10) for i in range(40)],
        "id long, region string, v long",
    ).repartition(8)  # fragment each partition dir into many files
    coalesce_conf = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(coalesce_conf)
    spark.conf.set(coalesce_conf, "false")  # else AQE merges the tiny writes
    try:
        t.merge(frag, ["id"])
    finally:
        spark.conf.set(coalesce_conf, prev)
    m0 = json.load(open(os.path.join(t.path, "_v0.json")))

    def n_files(rel):
        d = os.path.join(t.path, rel)
        return sum(1 for f in os.listdir(d) if f.endswith(".parquet"))

    assert any(n_files(rel) > 1 for rel in m0["partitions"].values())
    before = _rows(t.read(spark))

    assert t.compact(spark, max_files_per_partition=1) == 1
    m1 = json.load(open(os.path.join(t.path, "_v1.json")))
    assert all(n_files(rel) == 1 for rel in m1["partitions"].values())
    # content identical: fingerprints carried, rows equal
    assert m1["fingerprints"] == m0["fingerprints"]
    assert _rows(t.read(spark)) == before
    # already-compact table: no-op, version unchanged
    assert t.compact(spark, max_files_per_partition=1) == 1
