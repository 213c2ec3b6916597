"""R2 ``DF.concatenate``: alias-mapped union of N resources.

Reference semantics (flows/datasets.py:336 with mapping :186-247,
flows/publications.py:95-118, flows/zotero.py:9-24,112-115,
flows/organisations.py:11-42,58): canonical field <- list of source aliases
(including Hebrew headers); the FIRST alias present in a source wins; unlisted
source fields are dropped; canonical fields missing from a source become null.

Spark-first: per-source ``select`` with alias resolution at plan time, then
``unionByName`` — a zero-shuffle narrow op; Catalyst prunes unselected source
columns all the way into the scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def concatenate(
    sources: list[DataFrame],
    fields: dict[str, list[str] | None],
    keep_ord: str | None = None,
) -> DataFrame:
    """Union ``sources`` into one DataFrame with canonical columns ``fields``.

    fields: {canonical_name: [alias, ...] or None}. ``None`` / empty list means
    the canonical name itself is the only accepted source column. When several
    aliases are present in one source, the first listed wins (coalesce order),
    matching the reference's first-alias-wins resolution.

    ``keep_ord``: name of an ordering column to carry through (the engine's
    ``__ord`` convention, SURVEY.md §7.4) — source index becomes the major key
    so cross-source order matches the reference's sequential streaming.
    """
    out = None
    for idx, src in enumerate(sources):
        cols = []
        for canonical, aliases in fields.items():
            candidates = [a for a in (aliases or []) if a in src.columns]
            if not candidates and canonical in src.columns:
                candidates = [canonical]
            if not candidates:
                cols.append(F.lit(None).cast("string").alias(canonical))
            elif len(candidates) == 1:
                cols.append(F.col(candidates[0]).alias(canonical))
            else:
                cols.append(F.coalesce(*[F.col(c) for c in candidates]).alias(canonical))
        if keep_ord and keep_ord in src.columns:
            # Major-order by source position, minor by intra-source ord.
            # __ord from monotonically_increasing_id packs partitionId into
            # bits 33+, so the shift must clear the largest possible ord:
            # 2^48 covers 2^15 = 32768 partitions per source (and 2^15
            # sources before overflowing a long) — beyond either bound the
            # composed key would interleave, so guard explicitly.
            if idx >= (1 << 15):
                raise ValueError("concatenate keep_ord supports < 32768 sources")
            # Enforce the symmetric bound at runtime, not by hope: an __ord
            # >= 2^48 (a source built with > 32768 partitions under
            # monotonically_increasing_id) would silently interleave with the
            # next source's range. raise_error inside the projection stays in
            # whole-stage codegen — no extra action, fails the task the moment
            # a violating row exists.
            ord_ok = F.when(
                (F.col(keep_ord) >= F.lit(1 << 48)) | (F.col(keep_ord) < 0),
                F.raise_error(
                    F.lit(
                        "concatenate keep_ord: __ord out of [0, 2^48) — source "
                        "has > 32768 partitions; repartition it below that "
                        "bound before concatenate"
                    )
                ).cast("long"),
            ).otherwise(F.col(keep_ord))
            cols.append(
                (F.lit(idx).cast("long") * F.lit(1 << 48) + ord_ok).alias(keep_ord)
            )
        projected = src.select(*cols)
        out = projected if out is None else out.unionByName(projected)
    if out is None:
        raise ValueError("concatenate needs at least one source")
    return out
