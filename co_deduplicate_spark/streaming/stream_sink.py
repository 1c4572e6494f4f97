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


def upsert_sink_query(deduped: DataFrame, table_dir: str, checkpoint_dir: str,
                      key: str = "url", trigger_available_now: bool = True):
    """Start a streaming query writing ``deduped`` into an UpsertTable.

    Each micro-batch is one keyed MERGE (insert new keys, replace
    existing) — O(touched buckets) per batch thanks to the hash-bucketed
    layout; ``upsert`` localCheckpoints the batch internally before its
    multiple actions, so no extra materialization here.
    ``checkpoint_dir`` is REQUIRED: the exactly-once contract is
    checkpoint-based offset tracking + idempotent MERGE — without a
    durable checkpoint a restarted query would re-read the entire landing
    area from scratch. Returns the started StreamingQuery; callers own
    ``awaitTermination``/``stop``.
    """
    if not checkpoint_dir:
        raise ValueError("checkpoint_dir is required: exactly-once recovery "
                         "depends on a durable checkpointLocation")
    spark = deduped.sparkSession

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        UpsertTable(spark, table_dir, key=key).upsert(batch_df)

    writer = (
        deduped.writeStream.foreachBatch(write_batch).outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
