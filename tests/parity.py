"""Driver-style oracle parity checker.

Mirrors the driver's CORRECTNESS comparison: run the Spark query and the
DuckDB oracle SQL on the same parquet tables, then compare row count, column
names, and an order-insensitive value hash with columns sorted by name.
Floats are normalized via repr of the double; None uniformly. Any mismatch
raises with a diff sample so failures are debuggable.
"""

from __future__ import annotations

import datetime as dt
import decimal
import hashlib
import math


def _norm_cell(v):
    if v is None:
        return "\x00"
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def normalize_rows(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for r in rows:
        vals = list(r)
        out.append(tuple(_norm_cell(vals[i]) for i in order))
    out.sort()
    return [c for c in sorted(columns)], out


def value_hash(columns, rows):
    cols, normed = normalize_rows(columns, rows)
    h = hashlib.md5()
    h.update(("|".join(cols)).encode())
    for r in normed:
        h.update(("\x01".join(r)).encode())
    return h.hexdigest()


def compare(spark_df, duck_con, sql, name="query", oracle_cap_s=None):
    """``oracle_cap_s`` arms a watchdog that interrupts the DUCKDB side only
    (the Spark side has already collected by then): at sf0.1 the handful of
    deliberately-quadratic oracles run uncapped for tens of minutes each,
    which would make the full-registry sf0.1 parity run (VERDICT r11 #4)
    impractical. On interrupt DuckDB raises duckdb.InterruptException —
    callers record the query as oracle-capped, distinct from green AND from
    red. Pass a fresh single-use connection when capping: an interrupt that
    fires between queries would otherwise poison the shared connection's
    next statement."""
    s_rows = spark_df.collect()
    s_cols = spark_df.columns
    timer = None
    if oracle_cap_s:
        import threading

        timer = threading.Timer(oracle_cap_s, duck_con.interrupt)
        timer.start()
    try:
        rel = duck_con.sql(sql)
        d_cols = rel.columns
        d_rows = rel.fetchall()
    finally:
        if timer is not None:
            timer.cancel()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count mismatch spark={len(s_rows)} duck={len(d_rows)}"
    )
    _, sn = normalize_rows(s_cols, [tuple(r) for r in s_rows])
    _, dn = normalize_rows(d_cols, d_rows)
    if sn != dn:
        diffs = [
            (a, b) for a, b in zip(sn, dn) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs: {diffs}")
    return True
