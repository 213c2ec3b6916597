"""SparkSession factory with scale-aware defaults.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32); the same
configuration block is what we would ship to a 1000-executor cluster — AQE on
(runtime re-planning, skew-join splitting, partition coalescing), broadcast
threshold sized for dimension tables, Arrow enabled for the few pandas-UDF
operators, and a UTC session timezone so results are oracle-comparable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "migdar-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    At 100 TB the same knobs matter, with different values supplied by the
    deployment: ``spark.sql.shuffle.partitions`` ~ 2-3x total cores,
    ``spark.sql.files.maxPartitionBytes`` sized so a scan task fits in memory,
    and AQE left on to coalesce/skew-split at runtime.
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # Long-lived-process memory retention (set BEFORE the JVM gateway
    # launches so the JVM and the reused Python workers it spawns inherit
    # them). Rationale (guide §5): a task's large numpy/Arrow buffers are
    # mmap'd by glibc and munmap'd on free, and Arrow's default jemalloc
    # pool returns memory to the OS on decay — so every task pays
    # page-fault + zeroing cost for the SAME working set the previous task
    # just released. Raising the mmap threshold and disabling trim keeps a
    # reused worker's arena warm across tasks (bounded by the worker's
    # steady-state peak, which worker.reuse retains anyway); routing Arrow
    # through the system allocator lets it share that warm arena. On
    # lazily-faulted VM memory (this sandbox: first-touch measured as low
    # as ~10 MB/s in bad host phases) the effect is dramatic — the
    # Python-kernel ngram query A/B'd 35s -> 3.8s median — but the churn
    # being removed is real on any hardware. Env-overridable; setdefault
    # never overrides an operator's explicit choice.
    for k, v in (
        ("MALLOC_MMAP_THRESHOLD_", str(256 * 1024 * 1024)),
        ("MALLOC_TRIM_THRESHOLD_", str(1 << 40)),
        ("ARROW_DEFAULT_MEMORY_POOL", "system"),
    ):
        os.environ.setdefault(k, v)
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # Shuffle parallelism ~ cores for local runs; AQE coalesces the rest.
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 2 * cpus))
        # Deterministic, oracle-comparable timestamps (DuckDB is UTC-naive).
        .config("spark.sql.session.timeZone", "UTC")
        # Runtime re-planning: partition coalescing, skew-join splitting,
        # shuffle-hash/broadcast conversion with real stats.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Apply AQE partition coalescing/skew handling to stages under a
        # persist() too — otherwise cached subtrees (LSH shingle/band frames)
        # run at the static shuffle width regardless of data size.
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        # Dimension tables (nation/region/translations/tribunals) broadcast;
        # sized so fact tables do NOT. A 64 MB threshold made Spark broadcast
        # the sf0.1 lineitem fact table (10 MB file; Catalyst's column-pruned
        # estimate ~4 MB): a single-threaded hash-relation build locally and
        # an impossible plan at 100 TB. 3 MB keeps every genuine dim
        # (pruned orders ~0.8 MB, customer, supplier, nation, region) on the
        # broadcast path and the fact table streaming; AQE upgrades shuffle
        # joins to broadcast at runtime when a *filtered* side turns out
        # small, using real stage stats instead of file-size guesses.
        .config("spark.sql.autoBroadcastJoinThreshold", str(3 * 1024 * 1024))
        # Arrow for the pandas-UDF operators (fuzzy translate, multimodal).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # ContextCleaner only reclaims unreferenced broadcast/shuffle/cache
        # blocks when the driver GCs; with a multi-GB heap that is rare, and
        # long sessions slow down as block-manager debris accumulates
        # (measured: a 14-query warmup pass degraded later queries 2-8x until
        # a GC ran). Ask for a periodic GC every 5 min instead of the 30 min
        # default — cheap insurance for exactly the long-running multi-query
        # sessions this engine targets.
        .config("spark.cleaner.periodicGC.interval", "5min")
        # Whole-stage-codegen compile cache (STATIC conf — applies at JVM
        # start). The default is 100 entries; this engine's registry alone
        # is 200+ distinct plans x several codegen units each, so under the
        # default EVERY query re-janinos its generated code on each
        # invocation once other queries have run — measured 35% of the
        # whole per-query wall at sf0.1 (28-query A/B: 38.0s -> 24.7s with
        # 10k entries). The same recompilation tax applies to any
        # long-lived multi-query session (driver and executors both hold
        # this cache); entries are compiled classes, so 10k is tens of MB
        # — negligible against any executor heap. Env-overridable for
        # deployments that want a different ceiling.
        .config(
            "spark.sql.codegen.cache.maxEntries",
            os.environ.get("SPARK_GRAFT_CODEGEN_CACHE", "10000"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", driver_mem)
        # Pin the committed heap to the max (-Xms = -Xmx): G1 UNCOMMITS
        # regions after full/periodic GCs, so a multi-query session that
        # GCs between queries re-faults the same heap pages over and over
        # — pure overhead on any OS, catastrophic on lazily-faulted VM
        # memory (see the env block above). Standard practice for
        # dedicated Spark JVMs (committed != resident: untouched pages
        # still fault lazily once, they just never get given back).
        # Applied at JVM launch via spark-submit; env-overridable.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get("SPARK_GRAFT_DRIVER_JAVA_OPTS", f"-Xms{driver_mem}"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def local_df(spark: SparkSession, rows, schema):
    """``createDataFrame`` for DRIVER-LOCAL literal rows, as a SINGLE-slice
    RDD.

    ``createDataFrame(list, schema)`` parallelizes the rows into
    ``defaultParallelism`` slices — and every slice is PYTHON-BACKED: each
    downstream task round-trips a Python worker to deserialize its slice.
    For the tiny literal frames this engine builds (quantizer references,
    Benford expectations, probe probabilities, collected result re-wraps)
    that is pure overhead, and it COMPOUNDS under ``coalesce(1)``: the one
    coalesced task drains all N parent slices' Python workers sequentially
    — measured 4.2s for a 10-row write at local[32] vs 0.3s with one slice,
    scaling linearly with core count (the per-slice worker round-trip is
    ~0.13s). One slice also keeps the conversion semantics byte-identical
    to the list form — same Python->JVM row path, just one partition.
    """
    return spark.createDataFrame(
        spark.sparkContext.parallelize(list(rows), numSlices=1), schema
    )


TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_tables(spark: SparkSession, sf_dir: str, names=TESTDATA_TABLES):
    """Load the driver's parquet tables as a dict name -> DataFrame."""
    return {name: spark.read.parquet(f"{sf_dir}/{name}.parquet") for name in names}
