"""Round-15 optimization invariants: every change here must keep the
operator's output bit-identical — these tests pin the equivalences the
optimizations rely on."""

from __future__ import annotations

import struct

from pyspark.sql import functions as F


def _bits(x: float) -> bytes:
    return struct.pack(">d", x)


# ----------------------------------------------- _cells_literal (SQL form)


def _cells_literal_lit_form(refs):
    """The pre-round-15 literal-zip construction — the semantics reference
    the parsed-SQL fast path must match bit-for-bit."""
    cells = F.lit([int(c) for c, _ in refs])
    rvs = F.lit([[float(x) for x in rv] for _, rv in refs]).cast(
        "array<array<double>>"
    )
    return F.transform(
        F.sequence(F.lit(0), F.lit(len(refs) - 1)),
        lambda i: F.struct(
            F.get(cells, i).alias("cell"), F.get(rvs, i).alias("rv")
        ),
    )


def test_cells_literal_sql_form_bit_identical(spark):
    """The single-parse SQL construction of the quantizer-refs literal
    yields the same schema and the same double BITS as the per-element
    F.lit form it replaced (shortest-repr doubles re-parse exactly)."""
    from migdar_data_pipelines_spark.llm.similarity import _cells_literal

    vals = [
        0.1,
        -0.0,
        1e-300,
        5e-324,
        1.7976931348623157e308,
        123456789.123456789,
        -3.141592653589793,
        1e20,
        0.30000000000000004,
    ]
    refs = [(i, [vals[(i + j) % len(vals)] for j in range(5)]) for i in range(4)]
    df = spark.range(1)
    old = df.select(_cells_literal_lit_form(refs).alias("v"))
    new = df.select(_cells_literal(refs).alias("v"))
    assert old.schema == new.schema
    a, b = old.collect()[0]["v"], new.collect()[0]["v"]
    assert len(a) == len(b) == len(refs)
    for ra, rb in zip(a, b):
        assert ra["cell"] == rb["cell"]
        assert [_bits(x) for x in ra["rv"]] == [_bits(y) for y in rb["rv"]]


def test_cells_literal_nonfinite_falls_back(spark):
    """NaN/Infinity have no SQL literal syntax; the fallback zip form must
    carry them through unchanged."""
    import math

    from migdar_data_pipelines_spark.llm.similarity import _cells_literal

    refs = [(0, [float("nan"), float("inf"), 1.0])]
    got = spark.range(1).select(_cells_literal(refs).alias("v")).collect()[0]["v"]
    assert math.isnan(got[0]["rv"][0]) and math.isinf(got[0]["rv"][1])


def test_ivf_pq_search_refs_passthrough_equals_readback(spark, tmp_path):
    """search/add with the caller-held quantizer list returns exactly what
    the path/refs read-back form returns (same rows either way)."""
    from migdar_data_pipelines_spark.llm.similarity import (
        build_ivf_pq_index,
        incremental_add_ivf_pq,
        search_ivf_pq_index,
    )

    rows = [(i, [float((i * 7 + j * 3) % 11) for j in range(6)]) for i in range(40)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    refs = [(0, [1.0, 2.0, 0.5, 3.0, 1.5, 0.25]), (1, [4.0, 0.1, 2.0, 0.2, 5.0, 1.0])]
    a = e.filter(F.col("vec_id") % 2 == 0)
    b = e.filter(F.col("vec_id") % 2 == 1)
    p1, p2 = str(tmp_path / "i1"), str(tmp_path / "i2")
    q = e.filter(F.col("vec_id") < 3)
    build_ivf_pq_index(a, p1, refs, "vec_id")
    incremental_add_ivf_pq(spark, p1, b, "vec_id")
    build_ivf_pq_index(a, p2, refs, "vec_id")
    incremental_add_ivf_pq(spark, p2, b, "vec_id", refs=refs)
    out1 = sorted(search_ivf_pq_index(spark, p1, q, "vec_id").collect())
    out2 = sorted(search_ivf_pq_index(spark, p2, q, "vec_id", refs=refs).collect())
    assert out1 == out2 and out1
