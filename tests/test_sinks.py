"""Sinks: K1 dump_to_path + manifest fingerprint, K3-K6 ES suite, K11
checkpoint. Reference: datapackage_pipelines_migdar/flows/dump_to_es.py."""

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from migdar_data_pipelines_spark.sinks import (
    checkpoint,
    collate,
    dump_to_path,
    es_dumper,
    es_mapping,
    fingerprint,
    merge_create_timestamps,
    revision_gc_queries,
    stamp_es_fields,
)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [("d1", "alpha", 3), ("d2", "beta", 7), ("d3", None, 1)],
        "doc_id string, title string, n int",
    )


def test_es_mapping_annotations(spark):
    # dump_to_es.py:16-39 — keyword wins, hebrew subfield on titles, numerics
    # indexed, create_timestamp always injected.
    sch = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), metadata={"es:keyword": True}),
            T.StructField("title", T.StringType(), metadata={"es:title": True}),
            T.StructField("plain", T.StringType()),
            T.StructField("num", T.DoubleType()),
            T.StructField("tags", T.ArrayType(T.StringType())),
            T.StructField("blob", T.StringType(), metadata={"es:index": False}),
        ]
    )
    props = es_mapping(sch)["properties"]
    assert props["doc_id"] == {"type": "keyword"}
    assert props["title"]["fields"]["hebrew"]["analyzer"] == "hebrew"
    assert props["plain"] == {"type": "text"}
    assert props["num"] == {"type": "double", "index": True}
    assert props["tags"]["type"] == "text"  # arrays map to element type
    assert props["blob"] == {"type": "object", "enabled": False}
    assert props["create_timestamp"] == {"index": True, "type": "float"}


def test_collate_folds_value(docs):
    # dump_to_es.py:105-132 — output schema exactly (doc_id, revision, score,
    # value); nulls preserved inside value.
    out = collate(stamp_es_fields(docs, revision=202601, now=0.0))
    assert out.columns == ["doc_id", "revision", "score", "value"]
    row = {r["doc_id"]: json.loads(r["value"]) for r in out.collect()}
    assert row["d1"] == {"title": "alpha", "n": 3}
    assert row["d3"] == {"title": None, "n": 1}


def test_merge_create_timestamps(spark, docs):
    # dump_to_es.py:82-94 — already-indexed docs keep their timestamp.
    stamped = stamp_es_fields(docs, revision=1, now=100.0)
    existing = spark.createDataFrame(
        [("d2", 42.0)], "doc_id string, create_timestamp double"
    )
    out = {
        r["doc_id"]: r["create_timestamp"]
        for r in merge_create_timestamps(stamped, existing).collect()
    }
    assert out == {"d1": 100.0, "d2": 42.0, "d3": 100.0}


def test_revision_gc_queries():
    qs = revision_gc_queries(5)
    assert {"range": {"revision": {"lt": 5}}} in qs
    assert any("must_not" in q.get("bool", {}) for q in qs)


def test_dump_to_path_manifest_and_fingerprint(spark, docs, tmp_path):
    p = str(tmp_path / "pkg")
    manifest = dump_to_path({"docs": docs}, p, csv=True, primary_keys={"docs": ["doc_id"]})
    desc = manifest["resources"]["docs"]
    assert desc["count_of_rows"] == 3
    back = spark.read.parquet(os.path.join(p, "docs.parquet"))
    assert fingerprint(back) == fingerprint(docs)  # order-independent
    assert os.path.exists(os.path.join(p, "manifest.json"))
    assert desc["schema"]["primaryKey"] == ["doc_id"]


def test_fingerprint_partition_invariant(docs):
    # §5.2.4 determinism: hash survives repartition.
    assert fingerprint(docs.repartition(7)) == fingerprint(docs.coalesce(1))


def test_checkpoint_resume(spark, docs, tmp_path):
    cp = str(tmp_path / "cp")
    out1 = checkpoint(spark, docs, cp, "stage1")
    assert out1.count() == 3
    # second call must NOT re-run upstream: feed a poisoned plan and verify the
    # cached stage is returned instead.
    poisoned = docs.withColumn("boom", F.lit(1) / F.lit(0))
    out2 = checkpoint(spark, poisoned, cp, "stage1")
    assert "boom" not in out2.columns


def test_es_dumper_dry_run(spark, docs, tmp_path):
    # K6 composite without a live ES: stage dump runs, collated frame returned.
    out = es_dumper(docs, "pubs", revision=202601, path=str(tmp_path / "es"), now=0.0)
    assert out.columns == ["doc_id", "revision", "score", "value"]
    assert out.count() == 3
    staged = spark.read.parquet(str(tmp_path / "es" / "pubs.parquet"))
    assert staged.filter(F.col("revision") == 202601).count() == 3
