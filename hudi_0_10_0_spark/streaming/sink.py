"""Streaming sink: every micro-batch is a full table write.

Reference: ``ds/HoodieStreamingSink.scala:41-140`` — ``addBatch`` runs a
Hudi write with a bounded retry loop, records the micro-batch id in the
commit metadata, and skips batches already committed (exactly-once on
restart, because Spark replays the last uncommitted batch from the
checkpoint).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

BATCH_ID_KEY = "streaming.batch.id"
QUERY_ID_KEY = "streaming.query.id"


def last_committed_batch_id(table, query_name: str | None = None) -> int | None:
    """Largest micro-batch id recorded in completed write instants
    (``HoodieStreamingSink.canSkipBatch``)."""
    best: int | None = None
    for _, _, md in table.view().commits:
        extra = md.get("extra", {})
        if BATCH_ID_KEY not in extra:
            continue
        if query_name is not None and extra.get(QUERY_ID_KEY) not in (None, query_name):
            continue
        bid = int(extra[BATCH_ID_KEY])
        if best is None or bid > best:
            best = bid
    return best


def _foreach_batch(
    table,
    operation: str,
    query_name: str | None,
    retries: int,
    on_commit: Callable[[str], None] | None,
) -> Callable[[DataFrame, int], None]:
    def fn(batch_df: DataFrame, batch_id: int) -> None:
        done = last_committed_batch_id(table, query_name)
        if done is not None and batch_id <= done:
            return  # replayed batch already committed — skip (exactly-once)
        extra = {BATCH_ID_KEY: str(batch_id)}
        if query_name is not None:
            extra[QUERY_ID_KEY] = query_name
        op = getattr(table, operation)
        last_err: Exception | None = None
        for attempt in range(max(retries, 1)):
            # a failure AFTER a durable commit (e.g. in post-commit
            # services) must not rewrite the batch — re-check the
            # committed batch id before every retry, not just once
            if attempt > 0 and last_committed_batch_id(table, query_name) == batch_id:
                return
            try:
                instant = op(batch_df, extra=extra)
                if on_commit is not None:
                    on_commit(instant)
                return
            except Exception as e:  # noqa: BLE001 — retry loop mirrors the sink
                last_err = e
                table.rollback_pending_writes()
        if last_committed_batch_id(table, query_name) == batch_id:
            return  # final attempt committed before its post-commit error
        raise last_err  # type: ignore[misc]

    return fn


def write_stream(
    stream_df: DataFrame,
    table,
    checkpoint_location: str,
    operation: str = "upsert",
    query_name: str | None = None,
    retries: int = 3,
    on_commit: Callable[[str], None] | None = None,
    trigger: dict | None = None,
    **stream_options,
):
    """Start a Structured Streaming query writing each micro-batch into
    ``table`` via ``operation`` (upsert | insert | bulk_insert | delete).

    Returns the ``StreamingQuery``. Exactly-once across restarts: the
    batch id is stored in commit metadata and replayed batches are
    skipped, like the reference sink.
    """
    writer = (
        stream_df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_location)
        .foreachBatch(_foreach_batch(table, operation, query_name, retries, on_commit))
    )
    if query_name:
        writer = writer.queryName(query_name)
    if trigger:
        writer = writer.trigger(**trigger)
    for k, v in stream_options.items():
        writer = writer.option(k, v)
    return writer.start()
