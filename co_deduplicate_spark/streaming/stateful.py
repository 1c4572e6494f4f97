"""Custom stateful streaming operator: per-host crawl sessionization.

The reference is record-at-a-time and keeps its "state" in Elasticsearch
(every doTheJob call re-reads the current cluster state,
/root/reference/src/documentsManager.js:220-334). The streaming analogue
of that pattern — evolving keyed state across arrivals — is Spark's
``applyInPandasWithState``: state lives in the state store, is
checkpoint-recoverable, and is bounded by event-time timeouts.

Operator: group the page stream by crawl host and maintain one open
session per host (a burst of fetches with < ``gap`` between consecutive
pages — the crawler-politeness view of a crawl run). A session row is
emitted when it CLOSES: either a later page arrives past the gap
(in-stream close) or the event-time watermark passes last_ts + gap
(timeout close). This is exactly the shape a custom incremental-dedup
state op takes (per-key evolving aggregate + watermark-bounded eviction);
sessionization keeps the semantics assertable in tests.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "host string, session_seq int, n_pages long, "
    "start_ts timestamp, end_ts timestamp, closed_by string"
)
STATE_SCHEMA = "session_seq int, n_pages long, start_ms long, last_ms long"


def _session_fn(gap_ms: int):
    def fn(key, pdfs, state: GroupState):
        (host,) = key
        if state.hasTimedOut:
            seq, n, start_ms, last_ms = state.get
            state.remove()
            yield pd.DataFrame(
                [{"host": host, "session_seq": seq, "n_pages": n,
                  "start_ts": pd.Timestamp(start_ms, unit="ms"),
                  "end_ts": pd.Timestamp(last_ms, unit="ms"),
                  "closed_by": "timeout"}]
            )
            return

        ts = pd.concat([pdf["warc_ts"] for pdf in pdfs]).sort_values()
        ms = (ts.astype("int64") // 1_000_000).to_list()
        if state.exists:
            seq, n, start_ms, last_ms = state.get
        else:
            seq, n, start_ms, last_ms = 1, 0, ms[0], ms[0]

        closed = []
        for t in ms:
            if t - last_ms > gap_ms:
                closed.append({"host": host, "session_seq": seq, "n_pages": n,
                               "start_ts": pd.Timestamp(start_ms, unit="ms"),
                               "end_ts": pd.Timestamp(last_ms, unit="ms"),
                               "closed_by": "gap"})
                seq, n, start_ms = seq + 1, 0, t
            n += 1
            last_ms = max(last_ms, t)

        state.update((seq, n, start_ms, last_ms))
        # evict the open session once the watermark passes last_ms + gap
        state.setTimeoutTimestamp(last_ms + gap_ms)
        if closed:
            yield pd.DataFrame(closed)

    return fn


def stream_host_sessions(
    spark: SparkSession,
    source_dir: str,
    schema,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Streaming per-host session table (append mode; one row per CLOSED
    session). State per host is a single 4-field tuple — O(hosts), bounded
    by the event-time timeout regardless of stream length."""
    n, unit = gap.split()
    gap_ms = int(n) * {"minutes": 60_000, "minute": 60_000,
                       "seconds": 1_000, "second": 1_000,
                       "hours": 3_600_000, "hour": 3_600_000}[unit]
    stream = spark.readStream.schema(schema).parquet(source_dir)
    pages = (
        stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withColumn("host", F.regexp_extract("url", r"^https?://([^/]+)/", 1))
        .withWatermark(ts_col, watermark)
        .select("host", ts_col)
    )
    return pages.groupBy("host").applyInPandasWithState(
        _session_fn(gap_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
