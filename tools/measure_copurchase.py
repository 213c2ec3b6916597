#!/usr/bin/env python
"""Measure the co-purchase miner's basket-ceiling + a-priori guards on a
Zipf-skewed basket corpus crossing the 1000-item ceiling (VERDICT r12 #2:
copurchase_parts_orders was "sound in shape but unmeasured at decade scale").

Corpus (generated here from numpy, seed 11 — same self-contained style as
measure_triangle_hub.py): basket sizes ~ Zipf(2.5) clipped at 2000 (most
baskets hold 1-3 items, a heavy tail holds hundreds), PLUS three 20,000-item
"bot-cart" baskets per rung — the production shape whose size^2 alone would
dominate the pair join. Items are drawn uniformly from a ~|baskets|-sized
universe, so a large fraction of items are singletons the a-priori prune
removes before any pair forms. Decade ladder: 20k / 200k / 2M baskets.

Per rung, from the basket-size histogram (COMPUTED, never materialized):

  implied_unguarded_pairs — sum s*(s-1)/2 over ALL baskets (incl. bot carts
      and a-priori-prunable rows): the join the guards prevent;
  guarded_pairs           — the same sum AFTER the a-priori item prune and
      the <=1000 basket ceiling: the join the operator actually runs;
  items_pruned_frac       — fraction of distinct items below min support 2;

then the REAL operator end-to-end (production params: ceiling 1000, item and
pair support 2) for wall time + output pair count.

The 20k mini-rung additionally proves the a-priori claim: the surviving
(item_a, item_b, n_ab, n_a, n_b) set is IDENTICAL with the prune disabled
(min_item_support=1) — downward closure loses no pair and no per-item count
(lift's n is defined over the post-prune basket universe by contract; see
operators/frequent.py docstring).

Writes /tmp/migdar_scale/copurchase_stats.json for tools/gen_scaling.py.

Usage: python tools/measure_copurchase.py   (run alone; ~3-5 min)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALE_DIR = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/migdar_scale")
CORPUS = f"{SCALE_DIR}/baskets_zipf.parquet"
CEILING = 1_000
RUNGS = {"20k": 20_000, "200k": 200_000, "2M": 2_000_000}
N_BOT_CARTS = 3
BOT_CART_SIZE = 20_000


def gen_corpus() -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(11)
    n_baskets = max(RUNGS.values())
    sizes = np.minimum(rng.zipf(2.5, size=n_baskets), 2_000).astype(np.int64)
    # basket ids 0..n-1; the first N_BOT_CARTS of EVERY rung prefix are the
    # bot carts, so each rung (a basket-id prefix) contains all three
    sizes[:N_BOT_CARTS] = BOT_CART_SIZE
    bk = np.repeat(np.arange(n_baskets, dtype=np.int64), sizes)
    universe = n_baskets
    it = rng.integers(0, universe, size=len(bk), dtype=np.int64)
    tbl = pa.table({"bk": pa.array(bk), "it": pa.array(it)})
    pq.write_table(tbl, CORPUS, row_group_size=2_000_000)
    print(f"corpus: {len(bk):,} rows, {n_baskets:,} baskets")


def histogram_stats(spark, limit: int) -> dict[str, int | float]:
    from pyspark.sql import functions as F

    rows = (
        spark.read.parquet(CORPUS)
        .filter(F.col("bk") < limit)
        .distinct()
    )
    sizes = rows.groupBy("bk").agg(F.count(F.lit(1)).alias("s"))
    implied = sizes.agg(
        F.sum(F.expr("s * (s - 1) / 2").cast("long")).alias("p"),
        F.count(F.lit(1)).alias("b"),
        F.max("s").alias("mx"),
        F.sum(F.when(F.col("s") > CEILING, 1).otherwise(0)).alias("over"),
    ).collect()[0]
    # post-guard histogram: ceiling first, then the a-priori item prune,
    # then re-histogram — the join budget the operator actually pays
    kept_bk = sizes.filter(F.col("s") <= CEILING).select("bk")
    guarded_rows = rows.join(kept_bk, "bk")
    supp = guarded_rows.groupBy("it").agg(F.count(F.lit(1)).alias("c"))
    n_items = supp.count()
    n_pruned = supp.filter(F.col("c") < 2).count()
    kept_it = supp.filter(F.col("c") >= 2).select("it")
    g_sizes = guarded_rows.join(kept_it, "it").groupBy("bk").agg(
        F.count(F.lit(1)).alias("s")
    )
    guarded = g_sizes.agg(
        F.sum(F.expr("s * (s - 1) / 2").cast("long")).alias("p")
    ).collect()[0]
    return {
        "baskets": int(implied["b"]),
        "max_basket": int(implied["mx"]),
        "over_ceiling": int(implied["over"]),
        "implied_unguarded_pairs": int(implied["p"]),
        "guarded_pairs": int(guarded["p"] or 0),
        "items": int(n_items),
        "items_pruned_frac": round(n_pruned / max(n_items, 1), 4),
    }


def operator_run(spark, limit: int) -> dict[str, int | float]:
    from pyspark.sql import functions as F

    from migdar_data_pipelines_spark.operators.frequent import copurchase_pairs

    rows = spark.read.parquet(CORPUS).filter(F.col("bk") < limit)
    t0 = time.time()
    out = copurchase_pairs(
        rows, "bk", "it",
        min_item_support=2, min_pair_support=2, max_basket_size=CEILING,
    )
    n = out.count()
    return {"wall_s": round(time.time() - t0, 2), "output_pairs": int(n)}


def mini_rung_apriori_equality(spark) -> dict[str, int]:
    from pyspark.sql import functions as F

    from migdar_data_pipelines_spark.operators.frequent import copurchase_pairs

    rows = spark.read.parquet(CORPUS).filter(F.col("bk") < RUNGS["20k"])

    def pair_set(min_item_support):
        out = copurchase_pairs(
            rows, "bk", "it",
            min_item_support=min_item_support, min_pair_support=2,
            max_basket_size=CEILING,
        )
        return {
            (r["item_a"], r["item_b"], r["n_ab"], r["n_a"], r["n_b"])
            for r in out.collect()
        }

    pruned = pair_set(2)
    unpruned = pair_set(1)
    assert pruned == unpruned, (
        f"a-priori prune changed the pair set: {len(pruned)} vs {len(unpruned)}"
    )
    return {"pairs": len(pruned)}


def main() -> None:
    from migdar_data_pipelines_spark.operators.caching import release_scoped
    from migdar_data_pipelines_spark.session import get_spark

    os.makedirs(SCALE_DIR, exist_ok=True)
    if not os.path.exists(CORPUS):
        gen_corpus()
    spark = get_spark("measure-copurchase", shuffle_partitions=32)
    out: dict[str, dict] = {}
    for name, limit in RUNGS.items():
        s = histogram_stats(spark, limit)
        s.update(operator_run(spark, limit))
        s["cut_factor"] = round(
            s["implied_unguarded_pairs"] / max(s["guarded_pairs"], 1), 1
        )
        out[name] = s
        release_scoped()
        print(name, json.dumps(s))
    out["mini_20k_apriori_equality"] = mini_rung_apriori_equality(spark)
    release_scoped()
    with open(f"{SCALE_DIR}/copurchase_stats.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {SCALE_DIR}/copurchase_stats.json")


if __name__ == "__main__":
    main()
