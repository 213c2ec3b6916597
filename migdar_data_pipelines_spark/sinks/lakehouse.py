"""K2 lakehouse variant: transactional MERGE-upsert on table-format storage.

Reference semantics: ``dump_to_sql(tables={...: {'mode': 'update',
'update_keys': ['migdar_id']}})`` at obsolete/prepare_data_for_es.py:229-232 —
insert new keys, overwrite non-key fields of existing keys. ``sinks/jdbc.py``
is the database form (staging + MERGE); this module is the modern at-scale
form: MERGE INTO a lakehouse table, where the engine rewrites only the data
files that contain matched keys.

Two tiers:

- ``lakehouse_merge_sql`` / ``run_catalog_merge``: the real ``MERGE INTO``
  statement for Delta Lake / Apache Iceberg catalogs. Those jars are not in
  this container, so execution is gated — the statement builder is pure and
  unit-tested, and ``run_catalog_merge`` works unchanged on a session whose
  catalog supports MERGE.

- ``LakehouseTable``: a self-contained copy-on-write table over plain parquet
  that implements the same MERGE semantics transactionally, so the upsert
  path is *executed and tested* in this environment, not just planned:

  * versioned snapshots — each commit writes new data dirs and a manifest
    ``_v{N}.json``; readers resolve ``_LATEST`` -> manifest -> dirs, so a
    reader never sees a half-written commit (the pointer is renamed into
    place last, and parquet dirs are immutable once referenced);
  * partition-pruned rewrite — the manifest maps partition value -> data dir;
    a merge rewrites ONLY partitions whose content actually changes, while
    untouched partitions are carried into the new manifest BY REFERENCE
    (exactly how Delta/Iceberg avoid rewriting 100 TB to update one key);
  * idempotence by content fingerprint — each partition's manifest entry
    stores an order-independent row fingerprint
    (``sum(xxhash64(to_json(struct(*))))``); a merge whose result fingerprint
    matches everywhere is a no-op that does not even advance the version, so
    re-running a day's upsert (the reference's cron re-run / checkpoint
    resume story) provably changes nothing.

At 100 TB: the only wide operations are the key-hashed anti-join of target
vs source (source side broadcast when dimension-sized) and the per-partition
fingerprint aggregation (map-side combinable sum). Partition pruning bounds
the rewrite to affected partitions; everything else moves by manifest pointer.

Deployment scope: ``LakehouseTable``'s DATA moves through Spark readers/
writers (any Hadoop-compatible filesystem), but its manifest/pointer I/O and
vacuum/compact file listings use driver-local POSIX calls (``open``,
``os.rename``, ``os.listdir``, ``shutil.rmtree``) — so the table root must be
a path the driver mounts (local disk, NFS, FUSE). On object stores (s3a://,
hdfs://) use the catalog tier (``run_catalog_merge`` against Delta/Iceberg),
whose engines own exactly this manifest bookkeeping; re-implementing
rename-based commit atomicity over S3's non-atomic rename is their job, not
this module's.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_ALL = "__all__"  # partition key used for unpartitioned tables


def lakehouse_merge_sql(
    target_table: str,
    source: str,
    cols: list[str],
    update_keys: list[str],
) -> str:
    """The ANSI/Delta/Iceberg ``MERGE INTO`` for mode='update' semantics —
    same statement shape as ``plan_upsert(dialect='ansi')`` but addressed to
    a catalog table (Delta and Iceberg both accept exactly this form)."""
    non_keys = [c for c in cols if c not in update_keys]
    on = " AND ".join(f"t.{k} = s.{k}" for k in update_keys)
    sets = ", ".join(f"t.{c} = s.{c}" for c in non_keys)
    collist = ", ".join(cols)
    vals = ", ".join(f"s.{c}" for c in cols)
    return (
        f"MERGE INTO {target_table} t USING {source} s ON {on} "
        + (f"WHEN MATCHED THEN UPDATE SET {sets} " if non_keys else "")
        + f"WHEN NOT MATCHED THEN INSERT ({collist}) VALUES ({vals})"
    )


def run_catalog_merge(
    df: DataFrame,
    target_table: str,
    update_keys: list[str],
) -> str:
    """Execute ``MERGE INTO`` against a catalog table via a temp view —
    requires a Delta/Iceberg-capable session (gated: vanilla Spark's parquet
    tables reject MERGE). Returns the executed statement."""
    view = f"merge_src_{uuid.uuid4().hex[:8]}"
    df.createOrReplaceTempView(view)
    stmt = lakehouse_merge_sql(target_table, view, list(df.columns), update_keys)
    try:
        df.sparkSession.sql(stmt)  # pragma: no cover - needs Delta/Iceberg
    finally:
        df.sparkSession.catalog.dropTempView(view)
    return stmt


def _fingerprint_col() -> F.Column:
    # Order-independent content hash: sum of per-row xxhash64 over the
    # canonical JSON of the full row. Summed in DECIMAL — a long sum of
    # ~2^63-magnitude hashes overflows after a handful of rows and ANSI mode
    # turns that into a runtime ArithmeticException. decimal(38,0) holds
    # ~10^19 rows' worth of headroom; map-side combinable either way.
    # Collision odds are negligible for a change detector (a false
    # "unchanged" needs a collision on the SAME partition of the SAME table).
    return F.sum(F.xxhash64(F.to_json(F.struct("*"))).cast("decimal(28,0)")).cast(
        "decimal(38,0)"
    )


@dataclass
class LakehouseTable:
    """Copy-on-write versioned parquet table with MERGE-upsert. See module
    docstring for the commit protocol and scale notes."""

    path: str
    partition_by: str | None = None

    # ---------------------------------------------------------- manifest IO
    def _latest_path(self) -> str:
        return os.path.join(self.path, "_LATEST")

    def latest_version(self) -> int | None:
        try:
            with open(self._latest_path()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def _manifest(self, version: int) -> dict:
        with open(os.path.join(self.path, f"_v{version}.json")) as f:
            return json.load(f)

    def _commit(self, manifest: dict) -> int:
        version = manifest["version"]
        # exclusive create: two writers racing to commit the same version get
        # a FileExistsError instead of one silently overwriting the other —
        # the optimistic-concurrency primitive Delta/Iceberg build on (retry
        # by re-reading latest_version and re-merging)
        with open(os.path.join(self.path, f"_v{version}.json"), "x") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        # pointer swap last: rename is atomic on one filesystem, so a reader
        # resolves either the old complete snapshot or the new complete one
        tmp = self._latest_path() + f".tmp{uuid.uuid4().hex[:6]}"
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, self._latest_path())
        return version

    # ------------------------------------------------------------- reading
    def read(self, spark: SparkSession) -> DataFrame | None:
        v = self.latest_version()
        if v is None:
            return None
        dirs = sorted(
            os.path.join(self.path, rel)
            for rel in self._manifest(v)["partitions"].values()
        )
        return spark.read.parquet(*dirs)

    # ------------------------------------------------------------- writing
    def _write_partition(self, pdf: DataFrame, version: int, pkey: str) -> str:
        rel = os.path.join("data", f"v{version}", pkey)
        pdf.write.mode("overwrite").parquet(os.path.join(self.path, rel))
        return rel

    def _keyed(self, df: DataFrame) -> DataFrame:
        # partition identifier as a STRING key for the manifest; the
        # authoritative typed value stays inside the data files
        if self.partition_by:
            return df.withColumn(
                "__pk", F.coalesce(F.col(self.partition_by).cast("string"), F.lit("null"))
            )
        return df.withColumn("__pk", F.lit(_ALL))

    def _fingerprints(self, df: DataFrame) -> dict[str, int]:
        rows = (
            self._keyed(df)
            .groupBy("__pk")
            .agg(_fingerprint_col().alias("fp"))
            .collect()
        )  # one row per partition VALUE — dimension-sized, never data-sized
        return {r["__pk"]: str(r["fp"]) for r in rows}

    def merge(
        self,
        df: DataFrame,
        update_keys: list[str],
        broadcast_source: bool = False,
    ) -> int:
        """MERGE-upsert ``df`` into the table; returns the committed version
        (unchanged when the merge is a content no-op).

        Result = target rows whose key has no match in source (anti-join,
        key-hashed — broadcast the source side when it is dimension-sized)
        UNION the source rows (new keys inserted, matched keys overwritten —
        mode='update'). Only partitions whose fingerprint changes are
        rewritten; the rest carry forward by manifest reference."""
        spark = df.sparkSession
        os.makedirs(self.path, exist_ok=True)
        current_v = self.latest_version()
        if current_v is None:
            version = 0
            merged = df.dropDuplicates(update_keys)
            manifest: dict = {"version": 0, "partitions": {}, "fingerprints": {}}
            old_parts: dict[str, str] = {}
            old_fps: dict[str, int] = {}
        else:
            old = self._manifest(current_v)
            old_parts = old["partitions"]
            old_fps = {k: str(v) for k, v in old["fingerprints"].items()}
            target = self.read(spark)
            source = df.dropDuplicates(update_keys)
            src_join = F.broadcast(source) if broadcast_source else source
            kept = target.join(src_join.select(update_keys), update_keys, "left_anti")
            merged = kept.unionByName(source)
            version = current_v + 1
            manifest = {"version": version, "partitions": {}, "fingerprints": {}}

        keyed = self._keyed(merged)
        new_fps = self._fingerprints(merged)
        changed = {k for k, fp in new_fps.items() if old_fps.get(k) != fp}
        if current_v is not None and not changed and set(new_fps) == set(old_fps):
            return current_v  # content no-op: do not even advance the version

        for pkey, fp in new_fps.items():
            if pkey in old_parts and pkey not in changed:
                manifest["partitions"][pkey] = old_parts[pkey]  # by reference
            else:
                part_df = keyed.filter(F.col("__pk") == pkey).drop("__pk")
                manifest["partitions"][pkey] = self._write_partition(
                    part_df, version, pkey
                )
            manifest["fingerprints"][pkey] = fp
        return self._commit(manifest)

    def vacuum(self, keep_versions: int = 1) -> list[str]:
        """Drop data dirs no manifest among the newest ``keep_versions``
        references (the lakehouse VACUUM analogue). Returns removed dirs."""
        latest = self.latest_version()
        if latest is None:
            return []
        keep = range(max(0, latest - keep_versions + 1), latest + 1)
        live = {
            rel
            for v in keep
            for rel in self._manifest(v)["partitions"].values()
        }
        removed = []
        data_root = os.path.join(self.path, "data")
        if not os.path.isdir(data_root):
            return []
        for vdir in sorted(os.listdir(data_root)):
            for pdir in sorted(os.listdir(os.path.join(data_root, vdir))):
                rel = os.path.join("data", vdir, pdir)
                if rel not in live:
                    shutil.rmtree(os.path.join(self.path, rel), ignore_errors=True)
                    removed.append(rel)
        return removed

    def compact(
        self, spark: SparkSession, max_files_per_partition: int = 1
    ) -> int | None:
        """Small-file compaction — the OPTIMIZE analogue. Incremental merges
        leave each partition fragmented at the writer's task width; readers
        then pay per-file open/footer costs that dominate at high file
        counts. Compaction rewrites only partitions exceeding
        ``max_files_per_partition`` (coalesce — a file merge, no shuffle),
        carries the rest forward by manifest reference, and commits a new
        version. Content is asserted unchanged by recomputing the
        partition fingerprint and refusing to commit on mismatch — a
        compaction that changes data is a bug, not a bigger write.
        Returns the committed version, or the current one if nothing
        needed rewriting."""
        v = self.latest_version()
        if v is None:
            return None
        old = self._manifest(v)
        version = v + 1
        manifest: dict = {
            "version": version,
            "partitions": {},
            "fingerprints": dict(old["fingerprints"]),
        }
        rewrote = False
        for pkey, rel in old["partitions"].items():
            src = os.path.join(self.path, rel)
            n_files = sum(1 for f in os.listdir(src) if f.endswith(".parquet"))
            if n_files <= max_files_per_partition:
                manifest["partitions"][pkey] = rel
                continue
            pdf = spark.read.parquet(src).coalesce(max_files_per_partition)
            new_rel = self._write_partition(pdf, version, pkey)
            # recompute through _fingerprints so the hash covers the same
            # keyed row shape the merge-time fingerprint covered
            fp = self._fingerprints(
                spark.read.parquet(os.path.join(self.path, new_rel))
            )[pkey]
            if fp != str(old["fingerprints"][pkey]):
                shutil.rmtree(
                    os.path.join(self.path, new_rel), ignore_errors=True
                )
                raise RuntimeError(
                    f"compaction changed partition {pkey!r} content "
                    f"({fp} != {old['fingerprints'][pkey]}); aborting commit"
                )
            manifest["partitions"][pkey] = new_rel
            rewrote = True
        if not rewrote:
            return v
        return self._commit(manifest)


__all__ = [
    "LakehouseTable",
    "lakehouse_merge_sql",
    "run_catalog_merge",
]
