"""Vector expressions over array<float> embedding columns.

One shared implementation of dot/norm/cosine for the dedup and similarity
operators. The fold shape (``zip_with`` + ``aggregate``) is deliberately the
ONLY path: unrolling a known-width dot into a flat 64-term
``a[0]*b[0] + a[1]*b[1] + ...`` expression was measured SLOWER (3.1s vs 1.1s
steady-state on 1M rows x 64 dims) — the wide expression tree drops out of
whole-stage codegen and falls back to per-node interpreted eval, while
Spark's higher-order-function evaluator runs the fold as a tight loop over
the primitive array. Keep per-PAIR work down structurally instead: compute
norms once per row before a pair join (bit-identical — the per-vector sum
order is unchanged), and block/bucket before ever forming pairs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Left-to-right fold — same summation order as a sequential SQL oracle."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    # try_divide: ANSI mode THROWS on double/0.0, so a single zero-norm
    # vector would kill the job with plain division; NULL (which fails every
    # threshold comparison) is the intended "no similarity" semantics.
    return F.try_divide(dot(a, b), norm(a) * norm(b))
