"""Streaming sink into the versioned keyed table (exactly-once upsert).

The reference's ingest loop lands every record in Elasticsearch keyed by
``technical.internalId`` (documentsManager.js buildCreateBody) — replays
overwrite, so delivery is effectively exactly-once at the record level.
The Spark analogue: ``foreachBatch`` + the keyed :class:`UpsertTable`.
Replayed micro-batches (after a crash between sink write and checkpoint
commit) re-upsert the same keys with the same values — the MERGE is
idempotent, so at-least-once delivery from the checkpoint becomes
exactly-once table state. This is the standard Spark pattern for sinks
without native transactional streaming support.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..sources.upsert import UpsertTable


def upsert_sink_query(deduped: DataFrame, table_dir: str, key: str = "url",
                      checkpoint_dir: str | None = None,
                      trigger_available_now: bool = True):
    """Start a streaming query writing ``deduped`` into an UpsertTable.

    Each micro-batch is one keyed MERGE (insert new keys, replace
    existing) — O(touched buckets) per batch thanks to the hash-bucketed
    layout. Returns the started StreamingQuery; callers own
    ``awaitTermination``/``stop``.
    """
    spark = deduped.sparkSession

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        table = UpsertTable(spark, table_dir, key=key)
        # localCheckpoint: the batch plan must not be re-evaluated inside
        # the upsert's multiple actions (bucket discovery + write + count)
        table.upsert(batch_df.localCheckpoint())

    writer = deduped.writeStream.foreachBatch(write_batch).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
