"""Scoped cache lifecycle for operators that persist intermediate frames.

Spark's CacheManager holds a persisted DataFrame's blocks until an explicit
``unpersist()``/``clearCache()`` — going out of scope in Python frees nothing,
and the ContextCleaner never touches catalog-registered caches. Operators such
as MinHash LSH (shingle + band frames) and split_and_translate (row-id base)
legitimately persist mid-pipeline, but in a long-lived session those blocks
pile up and measurably slow *unrelated* later queries (observed 10-20x on
window/CDC queries at sf0.1 once the LSH caches were resident).

``scoped_persist`` is a drop-in ``df.persist()`` that also records the frame
in a session-global scope; ``release_scoped`` unpersists everything recorded.
The query registry (plans/queries.py::register) releases the *previous*
query's scope at each new query invocation, so sequential protocols — the
driver's correctness loop, bench, driver-sim — get a bounded one-query cache
footprint with no harness cooperation. The currently-returned DataFrame is
never unpersisted before its action runs because release happens only when
the NEXT query is invoked, after the caller has consumed the previous result
(the contract of every sequential runner here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_SCOPED: list[DataFrame] = []


def scoped_persist(df: DataFrame) -> DataFrame:
    """persist() the frame and record it for the next release_scoped()."""
    df = df.persist()
    _SCOPED.append(df)
    return df


def release_scoped(blocking: bool = False) -> None:
    """Unpersist every frame recorded since the last release.

    Safe to call repeatedly; ignores frames whose session is already gone.
    """
    while _SCOPED:
        df = _SCOPED.pop()
        try:
            df.unpersist(blocking)
        except Exception:
            pass
