"""J1 ``DF.join`` and J2 ``DF.join_self`` (group-collect aggregation).

J1 reference semantics (flows/judges.py:137-143, obsolete/join_publications.py:
13-16,42-45): the *source* resource is consumed into a KV store and *target*
rows are enriched with renamed source fields; ``full=False`` -> INNER (unmatched
target rows dropped), ``full=True`` -> LEFT (keep unmatched target rows). The
reference spills the KV store to LevelDB beyond RAM (requirements.txt:8).

Spark-first: an equi-join. Small sources (tribunals: 92 rows; translation
tables) get ``broadcast()`` — no shuffle at all; large-large falls back to
sort-merge where AQE may convert to shuffled-hash / handle skew at runtime.
Spark's shuffle spill replaces LevelDB.

J2 reference semantics (flows/datasets.py:364-376,391-403): "self-join" is
really a group-by aggregation with per-field specs: None->first, 'array'->
collect_list, 'max'->max, 'count'->count, plus output renames. Streaming order
made collect_list deterministic in the reference; here order is pinned
explicitly by sorting structs on an order column (SURVEY.md §7.4) — partial
aggregation (map-side combine) still applies since all aggs are algebraic.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


_SKEW_PASSTHROUGH_NODES = {"Project", "Filter", "SubqueryAlias", "View"}
_SKEW_BLOCKING_NODES = {"Aggregate", "Deduplicate", "Distinct"}


def _aggregate_topped(df: DataFrame) -> bool:
    """True when the frame's analyzed plan is an Aggregate/Deduplicate under
    only pass-through unary nodes — the shape that sits between the dim's
    shuffle and a sort-merge join and SILENTLY disables AQE's
    OptimizeSkewedJoin on BOTH sides (measured, r10 Zipfian rung: splitting
    the skewed fact partition requires replicating the matching dim
    partition, and the rule only matches SMJ children that are bare
    shuffle+sort, so an intervening final HashAggregate breaks the match at
    every threshold)."""
    node = df._jdf.queryExecution().analyzed()
    while (
        node.getClass().getSimpleName() in _SKEW_PASSTHROUGH_NODES
        and node.children().size() == 1
    ):
        node = node.children().apply(0)
    return node.getClass().getSimpleName() in _SKEW_BLOCKING_NODES


def join(
    target: DataFrame,
    source: DataFrame,
    source_key: list[str] | str,
    target_key: list[str] | str | None = None,
    fields: dict[str, str] | None = None,
    full: bool = False,
    broadcast_source: bool = True,
    stage_blocking_source: bool = True,
) -> DataFrame:
    """Enrich ``target`` with renamed ``fields`` from ``source``.

    fields: {source_col: output_name}. full=False -> inner join (the
    reference's default drops unmatched target rows — QUICKSTART.md:325-337
    worked example goes 2,052 -> 389 rows); full=True -> left join.

    Skew alignment (VERDICT r10 #4): with ``broadcast_source=False`` (a
    source too big to broadcast — exactly the join AQE's skew split exists
    for) a source whose plan is topped by an Aggregate/Deduplicate (e.g. a
    ``.distinct()`` or a rollup built right before joining) would silently
    disable OptimizeSkewedJoin: the rule only matches sort-merge children
    that are bare shuffle+sort. ``stage_blocking_source`` (default True)
    detects that shape and stages the source through a LAZY checkpoint —
    no job at plan time; on first execution the source materializes once
    and the join reads it as a leaf, so the skew rule can engage
    (plan-shape-tested through this operator on a Zipfian corpus in
    tests/test_scale_ops.py). Broadcast joins never need it.

    Checkpoint tier: when the session has a RELIABLE checkpoint dir
    configured (``sc.setCheckpointDir`` — the right setup on clusters with
    executor churn), the stage uses ``checkpoint`` (replicated, survives
    executor loss); otherwise ``localCheckpoint``, whose blocks are
    UNREPLICATED — an executor lost mid-job fails the job permanently
    (truncated lineage cannot recompute). ``persist()`` is NOT a
    substitute: AQE declines to re-plan over cached subplans
    (canChangeCachedPlanOutputPartitioning=false by default), so the skew
    split never engages through a persisted dim — measured while building
    this. On spot-instance fleets either set a checkpoint dir or pass
    ``stage_blocking_source=False`` and materialize the dim yourself.
    """
    source_key = [source_key] if isinstance(source_key, str) else list(source_key)
    target_key = (
        source_key
        if target_key is None
        else ([target_key] if isinstance(target_key, str) else list(target_key))
    )
    fields = fields or {}
    sel = [F.col(k).alias(f"__jk{i}") for i, k in enumerate(source_key)]
    sel += [F.col(src).alias(out) for src, out in fields.items()]
    rhs = source.select(*sel)
    if broadcast_source:
        rhs = F.broadcast(rhs)
    elif stage_blocking_source and _aggregate_topped(rhs):
        sc = target.sparkSession.sparkContext
        if sc.getCheckpointDir() is not None:
            rhs = rhs.checkpoint(eager=False)
        else:
            rhs = rhs.localCheckpoint(eager=False)
    cond = None
    for i, tk in enumerate(target_key):
        c = target[tk] == rhs[f"__jk{i}"]
        cond = c if cond is None else (cond & c)
    how = "left" if full else "inner"
    out = target.join(rhs, cond, how)
    return out.drop(*[f"__jk{i}" for i in range(len(source_key))])


def join_self(
    df: DataFrame,
    keys: list[str],
    fields: dict[str, dict[str, Any] | None],
    order_col: str | None = None,
) -> DataFrame:
    """Group-by aggregation with the reference's join_self field specs.

    fields: {source_col: spec} where spec is None (first value), or
    {'aggregate': 'array'|'max'|'min'|'sum'|'count'|'last'|'any',
     'name': output_name}.

    'array' returns elements ordered by ``order_col`` (required then): we
    collect (ord, value) structs and sort — deterministic under any
    partitioning, unlike bare collect_list.
    """
    aggs = []
    for src, spec in fields.items():
        spec = spec or {}
        kind = spec.get("aggregate", "first")
        out_name = spec.get("name", src)
        if kind == "array":
            if order_col is None:
                raise ValueError("join_self 'array' aggregate requires order_col")
            expr = F.transform(
                F.array_sort(F.collect_list(F.struct(F.col(order_col).alias("o"), F.col(src).alias("v")))),
                lambda s: s["v"],
            )
        elif kind == "first":
            if order_col is not None:
                expr = F.min_by(F.col(src), F.col(order_col))
            else:
                expr = F.first(F.col(src), ignorenulls=False)
        elif kind == "last":
            if order_col is not None:
                expr = F.max_by(F.col(src), F.col(order_col))
            else:
                expr = F.last(F.col(src), ignorenulls=False)
        elif kind == "count":
            expr = F.count(F.lit(1))
        elif kind == "max":
            expr = F.max(src)
        elif kind == "min":
            expr = F.min(src)
        elif kind == "sum":
            expr = F.sum(src)
        elif kind == "any":
            expr = F.max(src)
        else:
            raise ValueError(f"unknown aggregate {kind!r}")
        aggs.append(expr.alias(out_name))
    return df.groupBy(*keys).agg(*aggs)
