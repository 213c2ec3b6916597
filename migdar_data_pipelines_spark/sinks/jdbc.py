"""K2: SQL-database upsert sink.

Reference: ``dump_to_sql(tables={...: {'mode': 'update', 'update_keys':
['migdar_id']}})`` at obsolete/prepare_data_for_es.py:229-232 — per-row
upsert into Postgres keyed on ``migdar_id``.

Spark-first: plain appends go through the built-in JDBC writer. True upsert
has no single-statement JDBC path in Spark, so we use the standard two-phase
pattern — executor-parallel write into a staging table, then one driver-side
``MERGE``/``INSERT ... ON CONFLICT`` from staging into the target. The merge
is a single set-based SQL statement on the database (not a per-row loop), so
the only scale limit is the DB's own merge throughput; Spark's side stays
fully parallel.

No live database exists in this container, so the physical write is gated:
``plan_upsert`` (pure) builds the exact statements and is unit-tested;
``jdbc_upsert`` executes them when a JDBC URL + driver are available.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class UpsertPlan:
    staging_table: str
    target_table: str
    merge_sql: str
    create_target_hint: str


def _cols(df: DataFrame) -> list[str]:
    return list(df.columns)


def plan_upsert(
    df: DataFrame,
    table: str,
    update_keys: list[str],
    dialect: str = "postgresql",
) -> UpsertPlan:
    """Build the staging + merge statements for ``mode='update'`` semantics
    (insert new keys, overwrite non-key fields of existing keys).

    postgresql -> INSERT .. ON CONFLICT DO UPDATE; ansi -> MERGE INTO.
    """
    cols = _cols(df)
    non_keys = [c for c in cols if c not in update_keys]
    staging = f"{table}__stage"
    collist = ", ".join(cols)
    if dialect == "postgresql":
        conflict = ", ".join(update_keys)
        sets = ", ".join(f"{c} = EXCLUDED.{c}" for c in non_keys)
        action = f"DO UPDATE SET {sets}" if non_keys else "DO NOTHING"
        merge = (
            f"INSERT INTO {table} ({collist}) "
            f"SELECT {collist} FROM {staging} "
            f"ON CONFLICT ({conflict}) {action}"
        )
    else:  # ANSI MERGE (also valid for Delta Lake's MERGE INTO)
        on = " AND ".join(f"t.{k} = s.{k}" for k in update_keys)
        sets = ", ".join(f"t.{c} = s.{c}" for c in non_keys)
        vals = ", ".join(f"s.{c}" for c in cols)
        merge = (
            f"MERGE INTO {table} t USING {staging} s ON {on} "
            + (f"WHEN MATCHED THEN UPDATE SET {sets} " if non_keys else "")
            + f"WHEN NOT MATCHED THEN INSERT ({collist}) VALUES ({vals})"
        )
    return UpsertPlan(
        staging_table=staging,
        target_table=table,
        merge_sql=merge,
        create_target_hint=f"PRIMARY KEY ({', '.join(update_keys)})",
    )


def jdbc_upsert(
    df: DataFrame,
    url: str,
    table: str,
    update_keys: list[str],
    dialect: str = "postgresql",
    properties: dict[str, str] | None = None,
) -> UpsertPlan:
    """Execute the two-phase upsert: parallel JDBC overwrite of the staging
    table, then the single merge statement via a driver-side connection
    (needs the JDBC driver jar on the classpath — gated)."""
    plan = plan_upsert(df, table, update_keys, dialect)
    writer = df.write.mode("overwrite")
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.jdbc(url, plan.staging_table)  # pragma: no cover - needs a DB

    # driver-side merge through the same JVM driver
    jvm_conn = None  # pragma: no cover
    try:  # pragma: no cover
        sc = df.sparkSession.sparkContext
        jvm_conn = sc._jvm.java.sql.DriverManager.getConnection(url)
        stmt = jvm_conn.createStatement()
        stmt.execute(plan.merge_sql)
        stmt.close()
    finally:  # pragma: no cover
        if jvm_conn is not None:
            jvm_conn.close()
    return plan


__all__ = ["UpsertPlan", "plan_upsert", "jdbc_upsert"]
