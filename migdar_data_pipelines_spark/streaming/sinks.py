"""Streaming sinks: land a stream in the lakehouse with MERGE semantics.

``foreachBatch`` is the production pattern for "stream of upserts into a
table": each microbatch is handed to batch code as a regular DataFrame, so
the same ``LakehouseTable.merge`` (sinks/lakehouse.py) that batch pipelines
use becomes the stream's sink — one MERGE per microbatch, exactly-once
end-to-end because the checkpoint records which batch ids committed and the
merge itself is an idempotent keyed upsert (a replayed batch re-merges the
same rows into the same keys; the content no-op detection then declines to
even advance the version).

This is the streaming form of the reference's CDC-to-store tail
(obsolete/prepare_data_for_es.py:229-232 via sinks/jdbc.py K2): change
events arrive continuously, the table converges continuously.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..sinks.lakehouse import LakehouseTable


def stream_merge_into_lakehouse(
    stream_df: DataFrame,
    table: LakehouseTable,
    update_keys: list[str],
    checkpoint_dir: str,
    query_name: str = "lakehouse_merge_stream",
):
    """Drain ``stream_df`` (Trigger.AvailableNow) merging every microbatch
    into ``table`` on ``update_keys``. Returns the final committed version.

    Resuming from the same checkpoint processes only NEW source files — the
    incremental path; a replayed microbatch (failure between merge and
    checkpoint commit) is absorbed by merge idempotence.
    """

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        table.merge(batch_df, update_keys)

    q = (
        stream_df.writeStream.foreachBatch(_merge)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return table.latest_version()
