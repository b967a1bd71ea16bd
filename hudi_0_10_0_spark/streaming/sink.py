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
    (``HoodieStreamingSink.canSkipBatch``).

    Attribution is EXACT: a commit counts only when its stored query id
    equals ``query_name`` (an unnamed query matches only unnamed
    commits). Matching None against everything let a brand-new query
    inherit another query's batch ids and silently skip its own first
    batches (code-review r6). Two unnamed queries writing one table
    still collide — name your queries; and recreating a checkpoint
    (batch ids reset to 0) intentionally restarts dedup, like the
    reference sink."""
    best: int | None = None
    for _, _, md in table.view().commits:
        extra = md.get("extra", {})
        if BATCH_ID_KEY not in extra:
            continue
        if extra.get(QUERY_ID_KEY) != query_name:
            continue
        bid = int(extra[BATCH_ID_KEY])
        if best is None or bid > best:
            best = bid
    return best


def _committed_instant_for_batch(
    table, query_name: str | None, batch_id: int
) -> str | None:
    """Instant that committed this (query, batch id), newest wins."""
    hit: str | None = None
    for ts, _, md in table.view().commits:
        extra = md.get("extra", {})
        if (
            extra.get(BATCH_ID_KEY) == str(batch_id)
            and extra.get(QUERY_ID_KEY) == query_name
        ):
            hit = ts
    return hit


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
            # replayed batch already committed — skip (exactly-once).
            # STILL publish the instant to on_commit: after a crash
            # between a predecessor's commit and its callback, this
            # replay is the only chance the caller gets to hear about
            # the durable instant (offset publishing would otherwise be
            # silently skipped — crash-matrix r7)
            if on_commit is not None:
                inst = _committed_instant_for_batch(table, query_name, batch_id)
                if inst is not None:
                    on_commit(inst)
            return
        extra = {BATCH_ID_KEY: str(batch_id)}
        if query_name is not None:
            extra[QUERY_ID_KEY] = query_name
        op = getattr(table, operation)
        last_err: Exception | None = None

        def _already_committed() -> bool:
            # a failure AFTER a durable commit (e.g. in post-commit
            # services) must not rewrite the batch; the commit callback
            # still fires for it — a durable instant the caller never
            # hears about would silently skip offset publishing
            # (code-review r6)
            if last_committed_batch_id(table, query_name) != batch_id:
                return False
            if on_commit is not None:
                inst = _committed_instant_for_batch(table, query_name, batch_id)
                if inst is not None:
                    on_commit(inst)
            return True

        for attempt in range(max(retries, 1)):
            if attempt > 0 and _already_committed():
                return
            try:
                instant = op(batch_df, extra=extra)
                if on_commit is not None:
                    on_commit(instant)
                return
            except Exception as e:  # noqa: BLE001 — retry loop mirrors the sink
                last_err = e
                try:
                    # best-effort cleanup: its OWN failure (e.g. the
                    # writer-blocking pending-restore guard) must not
                    # mask the real error or abandon the retry budget —
                    # the next attempt's write start re-sweeps anyway
                    table.rollback_pending_writes()
                except Exception:
                    pass
        if _already_committed():
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
