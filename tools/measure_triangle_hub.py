#!/usr/bin/env python
"""Measure triangle_count's degree-ordered orientation against the hub
shape — the graph analogue of the LSH hot-bucket rung: one node adjacent
to the whole corpus. A naive wedge enumeration keyed on the center pays
sum deg*(deg-1)/2 join rows (the hub alone contributes ~n^2/2); the
oriented plan (Suri & Vassilvitskii 2011) directs every edge toward the
higher (deg, id) rank, so the hub — which has the TOP rank — gets
out-degree 0 and its wedges are charged to the bounded-out-degree spokes.

Synthetic graph per rung (n spokes + 1 hub, all expressions over
spark.range — nothing driver-side):

  hub edges   (i, n)   for i in 0..n-1        -> deg(hub) = n
  chain edges (i, i+1) for i in 0..n-2
  skip edges  (i, i+2) for i in 0..n-3

Ground truth is analytic, asserted exactly per rung:
  triangles = (n-2)            chain  (i, i+1, i+2)
            + (n-1) + (n-2)    hub + each spoke edge
  wedges    = n*(n-1)/2 (hub) + sum over spoke degrees

This measures, per rung: implied naive wedge-join rows (COMPUTED from the
degree frame, never materialized), the oriented wedge join's ACTUAL row
count (the engine's own _oriented_wedges frame), the cut factor, and the
end-to-end triangle_count wall time.

Writes /tmp/migdar_scale/triangle_hub_stats.json for tools/gen_scaling.py.

Usage: python tools/measure_triangle_hub.py   (run alone; ~2-4 min)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALE_DIR = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/migdar_scale")
RUNGS = [100_000, 1_000_000]


def hub_edges(spark, n: int):
    from pyspark.sql import functions as F

    r = spark.range(n)
    hub = r.select(F.col("id").alias("src"), F.lit(n).cast("long").alias("dst"))
    chain = (
        spark.range(n - 1)
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    )
    skip = (
        spark.range(n - 2)
        .select(F.col("id").alias("src"), (F.col("id") + 2).alias("dst"))
    )
    return hub.unionAll(chain).unionAll(skip)


def expected_triangles(n: int) -> int:
    return (n - 2) + (n - 1) + (n - 2)


def main() -> None:
    from pyspark.sql import functions as F

    from migdar_data_pipelines_spark.operators.caching import release_scoped
    from migdar_data_pipelines_spark.operators.graph import (
        _canonical_oriented,
        _oriented_wedges,
        triangle_count,
    )
    from migdar_data_pipelines_spark.session import get_spark

    spark = get_spark("measure-triangle-hub", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, dict] = {}
    for n in RUNGS:
        edges = hub_edges(spark, n)
        # shape accounting from the engine's own frames
        e, d, o = _canonical_oriented(edges, "src", "dst")
        naive = d.agg(
            F.sum(
                (F.col("deg").cast("decimal(38,0)") * (F.col("deg") - 1) / 2)
                .cast("decimal(38,0)")
            ).alias("w")
        ).collect()[0]["w"]
        oriented_rows = _oriented_wedges(o).count()
        hub_outdeg = (
            o.where(F.col("src") == n).count()
        )
        release_scoped()
        spark.catalog.clearCache()

        t0 = time.time()
        row = triangle_count(hub_edges(spark, n), "src", "dst").collect()[0]
        wall = time.time() - t0
        release_scoped()
        spark.catalog.clearCache()

        exp = expected_triangles(n)
        assert row["n_triangles"] == exp, (n, row["n_triangles"], exp)
        out[str(n)] = {
            "n_nodes": row["n_nodes"],
            "n_edges": row["n_edges"],
            "naive_wedge_rows": int(naive),
            "oriented_wedge_rows": oriented_rows,
            "cut_factor": round(int(naive) / max(oriented_rows, 1), 1),
            "hub_out_degree": hub_outdeg,
            "n_triangles": row["n_triangles"],
            "expected_triangles": exp,
            "wall_s": round(wall, 2),
        }
        print(n, out[str(n)])

    os.makedirs(SCALE_DIR, exist_ok=True)
    path = f"{SCALE_DIR}/triangle_hub_stats.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("wrote", path)


if __name__ == "__main__":
    main()
