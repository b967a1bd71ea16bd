"""S3-events ingestion pipeline: SQS object notifications → an events
meta-table → incremental consumption of the actual objects.

Reference shape (two cooperating DeltaStreamer sources):

- ``S3EventsSource`` (``utilities/sources/S3EventsSource.java:44-87``)
  polls an SQS queue that receives S3 "ObjectCreated" notifications,
  filters/normalizes them via ``S3EventsMetaSelector``
  (``helpers/S3EventsMetaSelector.java:100-161``), writes them into a
  small "events" Hudi table, and deletes the consumed messages from the
  queue only AFTER the commit (``onCommit`` → ``deleteProcessedMessages``,
  ``helpers/CloudObjectsSelector.java:223-231``) — a crash between
  commit and delete redelivers, never loses.
- ``S3EventsHoodieIncrSource``
  (``utilities/sources/S3EventsHoodieIncrSource.java:79-148``) pulls
  the events table INCREMENTALLY, extracts distinct (bucket, key) pairs
  with ``s3.object.size > 0`` and an optional key prefix, and loads the
  named files as the actual source batch.

Spark-first shape here: the queue client is a SEAM — any object with
``receive(queue_url, max_messages, wait_seconds, visibility_timeout)``,
``delete(queue_url, handles)`` and ``approx_messages(queue_url)``.
:class:`FileSqsQueue` is the contract-level fake (same pattern as the
Kafka DataSource fake): a directory of JSON message files with SQS
visibility semantics, so the real boto3 client (absent in this build —
:class:`Boto3Sqs` raises with instructions) drops in with zero code
changes. The incr side needs no AWS at all: with
``hoodie.deltastreamer.source.s3incr.fs.prefix=file`` it runs fully
against local files, so the whole events→files pipeline is executable
end-to-end in tests.

The event payload (eventName/eventTime/s3.bucket.name/s3.object.key/
s3.object.size, plus the SNS ``Message`` envelope variant) follows the
published AWS S3 event-notification format the reference parses.
"""

from __future__ import annotations

import json
import logging
import time
import urllib.parse
from datetime import datetime, timezone

log = logging.getLogger(__name__)

# option spellings (CloudObjectsSelector.Config / S3EventsHoodieIncrSource.Config)
OPT_QUEUE_URL = "hoodie.deltastreamer.s3.source.queue.url"
OPT_QUEUE_REGION = "hoodie.deltastreamer.s3.source.queue.region"
OPT_QUEUE_FS = "hoodie.deltastreamer.s3.source.queue.fs"
OPT_LONG_POLL = "hoodie.deltastreamer.s3.source.queue.long.poll.wait"
OPT_MAX_PER_BATCH = "hoodie.deltastreamer.s3.source.queue.max.messages.per.batch"
OPT_VISIBILITY = "hoodie.deltastreamer.s3.source.queue.visibility.timeout"
OPT_INCR_EXISTS_CHECK = "hoodie.deltastreamer.source.s3incr.check.file.exists"
OPT_INCR_KEY_PREFIX = "hoodie.deltastreamer.source.s3incr.key.prefix"
OPT_INCR_FS_PREFIX = "hoodie.deltastreamer.source.s3incr.fs.prefix"

_ALLOWED_EVENT_PREFIX = ("ObjectCreated",)
_MAX_MESSAGES_PER_REQUEST = 10  # CloudObjectsSelector hardcodes 10


class FileSqsQueue:
    """Contract-level SQS fake: one JSON file per message under a local
    directory, with the subset of SQS semantics the source relies on —
    receive up to N with a visibility timeout (a received message is
    invisible to further receives until the timeout lapses), batch
    delete by receipt handle, approximate depth. ``send`` is the test
    producer."""

    def __init__(self, directory: str):
        import os

        self.dir = directory
        os.makedirs(directory, exist_ok=True)
        self._invisible_until: dict[str, float] = {}
        self._seq = 0

    def send(self, body: dict | str) -> str:
        import os

        self._seq += 1
        name = f"{time.time_ns()}-{self._seq}.json"
        text = body if isinstance(body, str) else json.dumps(body)
        tmp = os.path.join(self.dir, f".{name}.tmp")
        with open(tmp, "w") as f:
            f.write(text)
        os.rename(tmp, os.path.join(self.dir, name))
        return name

    def _names(self) -> list[str]:
        import os

        return sorted(
            n for n in os.listdir(self.dir)
            if n.endswith(".json") and not n.startswith(".")
        )

    def approx_messages(self, queue_url: str) -> int:
        return len(self._names())

    def receive(
        self,
        queue_url: str,
        max_messages: int,
        wait_seconds: int,
        visibility_timeout: int,
    ) -> list[tuple[str, str]]:
        """Up to ``max_messages`` (handle, body) pairs; received
        messages become invisible for ``visibility_timeout`` seconds
        (they reappear if not deleted — the redelivery behavior the
        commit-then-delete protocol depends on)."""
        import os

        now = time.monotonic()
        out: list[tuple[str, str]] = []
        for name in self._names():
            if len(out) >= max_messages:
                break
            if self._invisible_until.get(name, 0.0) > now:
                continue
            try:
                with open(os.path.join(self.dir, name)) as f:
                    body = f.read()
            except FileNotFoundError:
                continue  # deleted by a rival consumer between list/open
            self._invisible_until[name] = now + visibility_timeout
            out.append((name, body))
        return out

    def delete(self, queue_url: str, handles: list[str]) -> None:
        import os

        for h in handles:
            try:
                os.remove(os.path.join(self.dir, h))
            except FileNotFoundError:
                pass  # delete is idempotent, like SQS
            self._invisible_until.pop(h, None)


class Boto3Sqs:
    """The real-client seam: AWS SQS via boto3 when it is importable
    (credentials/region come from the standard AWS environment),
    otherwise the constructor raises with the exact contract a drop-in
    must satisfy (receive/delete/approx_messages as used by
    :func:`poll_events`)."""

    def __init__(self, region: str):
        try:
            import boto3  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "boto3 is not available in this environment. Provide "
                "source_options['sqs_client'] implementing receive(queue_url, "
                "max_messages, wait_seconds, visibility_timeout) -> "
                "[(handle, body)], delete(queue_url, handles) and "
                "approx_messages(queue_url) — FileSqsQueue shows the contract."
            ) from e
        self._sqs = __import__("boto3").client("sqs", region_name=region)

    def receive(self, queue_url, max_messages, wait_seconds, visibility_timeout):
        resp = self._sqs.receive_message(
            QueueUrl=queue_url,
            MaxNumberOfMessages=min(max_messages, _MAX_MESSAGES_PER_REQUEST),
            WaitTimeSeconds=wait_seconds,
            VisibilityTimeout=visibility_timeout,
        )
        return [
            (m["ReceiptHandle"], m["Body"]) for m in resp.get("Messages", [])
        ]

    def delete(self, queue_url, handles):
        # SQS caps delete batches at 10 (createListPartitions(.., 10))
        for i in range(0, len(handles), 10):
            self._sqs.delete_message_batch(
                QueueUrl=queue_url,
                Entries=[
                    {"Id": str(j), "ReceiptHandle": h}
                    for j, h in enumerate(handles[i : i + 10])
                ],
            )

    def approx_messages(self, queue_url):
        resp = self._sqs.get_queue_attributes(
            QueueUrl=queue_url, AttributeNames=["ApproximateNumberOfMessages"]
        )
        return int(resp["Attributes"]["ApproximateNumberOfMessages"])


def _event_time_millis(event: dict) -> int:
    """Epoch millis of the event's ISO-8601 eventTime; 0 for a missing
    or unparseable value (a valid ObjectCreated event with a mangled
    timestamp must still ingest, not crash every redelivery —
    code-review r8)."""
    ts = event.get("eventTime")
    try:
        return int(
            datetime.fromisoformat(str(ts).replace("Z", "+00:00"))
            .astimezone(timezone.utc)
            .timestamp()
            * 1000
        )
    except (ValueError, TypeError, AttributeError):
        return 0


def extract_valid_events(bodies: list[str]) -> list[dict]:
    """``S3EventsMetaSelector.processAndDeleteInvalidMessages`` parity:
    unwrap the SNS ``Message`` envelope when present, keep only
    ``Records`` whose eventName starts with ``ObjectCreated``, drop
    ``responseElements``. Malformed messages are skipped (and still
    deleted by the caller — the reference does the same, so a poison
    message cannot wedge the queue)."""
    events: list[dict] = []
    for body in bodies:
        try:
            msg = json.loads(body)
            if "Message" in msg:  # S3 → SNS → SQS envelope
                msg = json.loads(msg["Message"])
            for event in msg.get("Records", []):
                event.pop("responseElements", None)
                name = event.get("eventName", "")
                if name.startswith(_ALLOWED_EVENT_PREFIX):
                    events.append(event)
                else:
                    log.debug("ignoring disallowed S3 event %s", name)
        except (ValueError, TypeError, AttributeError) as e:
            log.debug("skipping malformed SQS message: %s", e)
    return events


def poll_events(
    client, options: dict, last_ckpt: str | None
) -> tuple[list[str], str | None, list[str]]:
    """``S3EventsMetaSelector.getNextEventsFromQueue`` parity: one
    receive round (respecting max-per-batch in chunks of ≤10), events
    filtered/normalized, checkpoint = max eventTime millis (carried
    forward when the round is empty). Returns (event JSON strings, new
    checkpoint, receipt handles to delete after commit). '%3D' in keys
    is decoded to '=' the way the reference post-processes its JSON."""
    queue_url = options.get(OPT_QUEUE_URL, "")
    long_poll = int(options.get(OPT_LONG_POLL, 20))
    max_batch = int(options.get(OPT_MAX_PER_BATCH, 5))
    visibility = int(options.get(OPT_VISIBILITY, 30))
    handles: list[str] = []
    bodies: list[str] = []
    # the option bounds TOTAL messages this round (the reference loops
    # while result.size() < maxMessagesEachBatch), in receive chunks of
    # ≤10 — not 10 × max_batch (code-review r8)
    while len(bodies) < max_batch:
        got = client.receive(
            queue_url,
            min(_MAX_MESSAGES_PER_REQUEST, max_batch - len(bodies)),
            long_poll,
            visibility,
        )
        if not got:
            break
        handles.extend(h for h, _ in got)
        bodies.extend(b for _, b in got)
    events = extract_valid_events(bodies)
    # monotonic: a late-delivered older event must not move the
    # checkpoint backwards (code-review r8)
    prior = int(last_ckpt) if last_ckpt else 0
    new_ckpt = max([prior] + [_event_time_millis(e) for e in events])
    rows = [json.dumps(e).replace("%3D", "=") for e in events]
    return rows, str(new_ckpt), handles


def incr_file_batch(spark, events_table, options: dict, ckpt: str | None):
    """``S3EventsHoodieIncrSource.fetchNextBatch`` parity over OUR
    incremental read: pull the events table (begin, latest], keep
    ``s3.object.size > 0`` rows matching the optional key prefix, build
    ``<fs>://<bucket>/<key>`` paths from the DISTINCT pairs
    (metadata-sized collect — one row per new file, the reference's
    ``collectAsList`` does the same), optionally drop paths that no
    longer exist, and load them with the source file format. Returns
    (DataFrame | None, new checkpoint)."""
    from pyspark.sql import functions as F

    latest = events_table.timeline.latest_completed()
    if latest is None or latest.timestamp == ckpt:
        return None, ckpt
    src = events_table.incremental(ckpt, latest.timestamp)
    filt = F.col("s3.object.size") > 0
    prefix = options.get(OPT_INCR_KEY_PREFIX)
    if prefix:
        filt = filt & F.col("s3.object.key").startswith(prefix)
    pairs = (
        src.filter(filt)
        .select(
            F.col("s3.bucket.name").alias("b"), F.col("s3.object.key").alias("k")
        )
        .distinct()
        .collect()
    )
    fs_prefix = str(options.get(OPT_INCR_FS_PREFIX, "s3")).lower()
    # unquote_plus: S3 notifications form-url-encode keys, so a space
    # arrives as '+' — plain unquote would build a wrong path and (with
    # the exists check on) silently drop the file (code-review r8;
    # the reference's URLDecoder.decode has +-as-space semantics)
    paths = [
        f"{fs_prefix}://{r['b']}/{urllib.parse.unquote_plus(r['k'])}"
        if fs_prefix != "file"
        else f"/{r['b']}/{urllib.parse.unquote_plus(r['k'])}"
        for r in pairs
    ]
    if _bool(options.get(OPT_INCR_EXISTS_CHECK, False)):
        import os

        kept = []
        for p in paths:
            local = p if fs_prefix == "file" else None
            if local is None or os.path.exists(local):
                kept.append(p)
            else:
                log.warning("S3 incr source: %s no longer exists, skipping", p)
        paths = kept
    if not paths:
        return None, latest.timestamp
    fmt = options.get("format", "parquet")
    return spark.read.format(fmt).load(paths), latest.timestamp


def _bool(v) -> bool:
    return str(v).lower() in ("1", "true", "yes")
