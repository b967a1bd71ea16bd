"""S3-events ingestion pipeline (streaming/s3_events.py — the
``S3EventsSource`` / ``S3EventsHoodieIncrSource`` analogues, r8).

The SQS client is a contract-level seam (FileSqsQueue implements the
receive/visibility/delete semantics the real boto3 client exposes);
the incremental consumer runs fully locally with fs.prefix=file, so the
whole notification → events-table → file-load pipeline executes end to
end with no AWS."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from hudi_0_10_0_spark import HudiTable, WriteConfig
from hudi_0_10_0_spark.streaming.delta_streamer import DeltaStreamer
from hudi_0_10_0_spark.streaming import s3_events as S3


def _event(bucket, key, size, ts, name="ObjectCreated:Put"):
    return {
        "Records": [
            {
                "eventName": name,
                "eventTime": ts,
                "responseElements": {"x-amz-request-id": "r1"},
                "s3": {
                    "bucket": {"name": bucket},
                    "object": {"key": key, "size": size},
                },
            }
        ]
    }


def _events_cfg():
    # events table keyed by object key: redelivery dedups via upsert
    return WriteConfig(
        record_key_field="s3.object.key",
        partition_field=None,
        precombine_field="eventTime",
        auto_clean=False,
        auto_archive=False,
    )


def _queue(tmp_path):
    return S3.FileSqsQueue(str(tmp_path / "queue"))


def test_extract_valid_events_filters_and_unwraps():
    plain = json.dumps(_event("b", "k1", 10, "2026-08-16T00:00:00.000Z"))
    sns = json.dumps({"Message": json.dumps(_event("b", "k2", 20, "2026-08-16T00:00:01.000Z"))})
    removed = json.dumps(_event("b", "k3", 0, "2026-08-16T00:00:02.000Z", name="ObjectRemoved:Delete"))
    malformed = "{not json"
    events = S3.extract_valid_events([plain, sns, removed, malformed])
    assert [e["s3"]["object"]["key"] for e in events] == ["k1", "k2"]
    assert all("responseElements" not in e for e in events)


def test_file_sqs_queue_visibility_and_delete(tmp_path):
    q = _queue(tmp_path)
    q.send({"a": 1})
    q.send({"a": 2})
    got = q.receive("q", 10, 0, visibility_timeout=60)
    assert len(got) == 2
    # invisible until timeout: an immediate re-receive sees nothing
    assert q.receive("q", 10, 0, visibility_timeout=60) == []
    assert q.approx_messages("q") == 2  # still in the queue though
    q.delete("q", [h for h, _ in got])
    assert q.approx_messages("q") == 0
    q.delete("q", ["not-there"])  # idempotent


def test_events_pipeline_end_to_end(spark, tmp_table_path, tmp_path):
    """notification queue → events meta-table → incremental consumer
    loads the actual files → target table, with checkpoints on both
    stages and message deletion only after the commit."""
    from datetime import datetime, timezone

    # local-run layout: with fs.prefix=file, paths resolve as
    # /<bucket>/<key>, so the "bucket" carries the data root's
    # slash-stripped absolute path (the documented local recipe)
    data_root = str(tmp_path / "data")
    bucket = f"{data_root}/bkt".lstrip("/")
    os.makedirs(f"/{bucket}", exist_ok=True)
    f1 = f"/{bucket}/part1.parquet"
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string").write.parquet(f1)

    q = _queue(tmp_path)
    q.send(_event(bucket, "part1.parquet", 100, "2026-08-16T01:00:00.000Z"))

    events_t = HudiTable.create(spark, tmp_table_path + "/events", _events_cfg())
    meta_ds = DeltaStreamer(
        spark, events_t, "mock://queue", source_format="s3_events",
        source_options={"sqs_client": q},
    )
    c1 = meta_ds.sync_once()
    assert c1 is not None
    assert events_t.snapshot().count() == 1
    # checkpoint = max eventTime epoch millis; message deleted post-commit
    expect_ms = int(
        datetime(2026, 8, 16, 1, 0, tzinfo=timezone.utc).timestamp() * 1000
    )
    assert meta_ds.last_checkpoint() == str(expect_ms)
    assert q.approx_messages("q") == 0

    target_t = HudiTable.create(
        spark, tmp_table_path + "/target",
        WriteConfig(record_key_field="id", partition_field=None,
                    precombine_field="id", auto_clean=False, auto_archive=False),
    )
    incr_ds = DeltaStreamer(
        spark, target_t, events_t.base_path, source_format="s3_events_incr",
        source_options={S3.OPT_INCR_FS_PREFIX: "file"},
    )
    c2 = incr_ds.sync_once()
    assert c2 is not None
    assert {r["id"] for r in target_t.snapshot().select("id").collect()} == {1, 2}
    # caught up → no commit
    assert incr_ds.sync_once() is None

    # second file arrives → second round picks up ONLY the new file
    f2 = f"/{bucket}/part2.parquet"
    spark.createDataFrame([(3, "c")], "id long, v string").write.parquet(f2)
    q.send(_event(bucket, "part2.parquet", 50, "2026-08-16T02:00:00.000Z"))
    assert meta_ds.sync_once() is not None
    assert events_t.snapshot().count() == 2
    c3 = incr_ds.sync_once()
    assert c3 is not None
    assert target_t.snapshot().count() == 3


def test_crash_between_commit_and_delete_redelivers_not_loses(
    spark, tmp_table_path, tmp_path
):
    """The commit-then-delete protocol: if the process dies after the
    commit but before the queue delete, the message is REDELIVERED once
    visibility lapses and the upsert dedups it — never lost, never
    double-counted."""
    q = _queue(tmp_path)
    q.send(_event("b", "k1", 10, "2026-08-16T01:00:00.000Z"))
    events_t = HudiTable.create(spark, tmp_table_path + "/ev", _events_cfg())

    class ExplodingQueue:
        """Delegates receive, dies on delete — the crash window."""

        def __init__(self, inner):
            self.inner = inner

        def receive(self, *a, **k):
            return self.inner.receive(*a, **k)

        def delete(self, *a, **k):
            raise RuntimeError("crash before delete")

        def approx_messages(self, *a):
            return self.inner.approx_messages(*a)

    ds = DeltaStreamer(
        spark, events_t, "mock://q", source_format="s3_events",
        source_options={
            "sqs_client": ExplodingQueue(q),
            S3.OPT_VISIBILITY: 0,  # redeliver immediately
        },
    )
    assert ds.sync_once() is not None  # commit succeeds, delete "crashes"
    assert events_t.snapshot().count() == 1
    assert q.approx_messages("q") == 1  # message survived

    # healthy round: redelivered message dedups via the upsert key and
    # is finally deleted
    ds2 = DeltaStreamer(
        spark, events_t, "mock://q", source_format="s3_events",
        source_options={"sqs_client": q, S3.OPT_VISIBILITY: 0},
    )
    ds2.sync_once()
    assert events_t.snapshot().count() == 1  # dedup'd, not duplicated
    assert q.approx_messages("q") == 0


def test_empty_queue_no_commit_boto3_seam_raises(spark, tmp_table_path, tmp_path):
    q = _queue(tmp_path)
    t = HudiTable.create(spark, tmp_table_path + "/e", _events_cfg())
    ds = DeltaStreamer(
        spark, t, "mock://q", source_format="s3_events",
        source_options={"sqs_client": q, S3.OPT_LONG_POLL: 0},
    )
    assert ds.sync_once() is None
    # without a client, the boto3 seam engages: either boto3 is absent
    # (NotImplementedError documenting the drop-in contract) or present
    # and unconfigured (botocore credential/endpoint error) — never a
    # failure inside OUR source code
    ds_real = DeltaStreamer(spark, t, "mock://q", source_format="s3_events")
    with pytest.raises(Exception) as ei:
        ds_real.sync_once()
    mod = type(ei.value).__module__
    assert isinstance(ei.value, NotImplementedError) or mod.startswith(
        ("botocore", "boto3")
    ), ei.value


def test_incr_key_prefix_and_size_filters(spark, tmp_table_path, tmp_path):
    """size>0 and key-prefix filters of S3EventsHoodieIncrSource."""
    q = _queue(tmp_path)
    q.send(_event("b", "logs/x.parquet", 0, "2026-08-16T01:00:00.000Z"))  # size 0
    q.send(_event("b", "data/y.parquet", 10, "2026-08-16T01:00:01.000Z"))
    q.send(_event("b", "logs/z.parquet", 10, "2026-08-16T01:00:02.000Z"))
    events_t = HudiTable.create(spark, tmp_table_path + "/ev2", _events_cfg())
    DeltaStreamer(
        spark, events_t, "mock://q", source_format="s3_events",
        source_options={"sqs_client": q},
    ).sync_once()
    from hudi_0_10_0_spark.streaming.s3_events import incr_file_batch

    # exists-check drops everything (no local files) → no batch, but
    # the checkpoint still advances past the consumed instant
    df, ck = incr_file_batch(
        spark, events_t,
        {S3.OPT_INCR_FS_PREFIX: "file", S3.OPT_INCR_KEY_PREFIX: "data/",
         S3.OPT_INCR_EXISTS_CHECK: "true"},
        None,
    )
    assert df is None and ck == events_t.timeline.latest_completed().timestamp


def test_poison_messages_deleted_without_commit(spark, tmp_table_path, tmp_path):
    """Code-review r8: an all-invalid round (s3:TestEvent, malformed)
    produces no commit, so the messages must be deleted IMMEDIATELY or
    they redeliver forever and starve the receive slots."""
    q = _queue(tmp_path)
    q.send({"Service": "Amazon S3", "Event": "s3:TestEvent"})  # no Records
    q.send("{not json")
    q.send(_event("b", "k", 1, "2026-08-16T01:00:00.000Z",
                  name="ObjectRemoved:Delete"))
    t = HudiTable.create(spark, tmp_table_path + "/p", _events_cfg())
    ds = DeltaStreamer(
        spark, t, "mock://q", source_format="s3_events",
        source_options={"sqs_client": q, S3.OPT_VISIBILITY: 0},
    )
    assert ds.sync_once() is None  # nothing valid → no commit
    assert q.approx_messages("q") == 0  # ...but the poison is GONE


def test_checkpoint_monotonic_and_bad_event_time(spark, tmp_table_path, tmp_path):
    """Code-review r8: a late-delivered older event must not move the
    checkpoint backwards, and an unparseable eventTime must not crash."""
    from datetime import datetime, timezone

    q = _queue(tmp_path)
    q.send(_event("b", "k1", 10, "2026-08-16T02:00:00.000Z"))
    t = HudiTable.create(spark, tmp_table_path + "/m", _events_cfg())
    ds = DeltaStreamer(
        spark, t, "mock://q", source_format="s3_events",
        source_options={"sqs_client": q, S3.OPT_VISIBILITY: 0},
    )
    ds.sync_once()
    ck1 = int(ds.last_checkpoint())
    assert ck1 == int(datetime(2026, 8, 16, 2, tzinfo=timezone.utc).timestamp() * 1000)
    # older + garbage eventTime arrive late
    q.send(_event("b", "k2", 10, "2026-08-16T01:00:00.000Z"))
    q.send(_event("b", "k3", 10, "2026/08/16 01:00"))  # unparseable
    ds.sync_once()
    assert int(ds.last_checkpoint()) == ck1  # monotonic, no regression
    assert t.snapshot().count() == 3  # all three ingested


def test_max_messages_per_batch_bounds_totals(tmp_path):
    """Code-review r8: the option bounds TOTAL messages per round (the
    reference loops while size < max), not the number of 10-message
    receive rounds."""
    q = _queue(tmp_path)
    for i in range(30):
        q.send(_event("b", f"k{i}", 1, "2026-08-16T01:00:00.000Z"))
    rows, _, handles = S3.poll_events(
        q, {S3.OPT_MAX_PER_BATCH: 7, S3.OPT_LONG_POLL: 0, S3.OPT_VISIBILITY: 60},
        None,
    )
    assert len(handles) == 7 and len(rows) == 7


def test_space_in_key_unquote_plus(spark, tmp_table_path, tmp_path):
    """Code-review r8: S3 form-url-encodes keys ('+' = space); plain
    unquote built a wrong path and the exists check silently dropped
    the file."""
    data_root = str(tmp_path / "data")
    bucket = f"{data_root}/bkt".lstrip("/")
    os.makedirs(f"/{bucket}", exist_ok=True)
    spark.createDataFrame([(1, "a")], "id long, v string").write.parquet(
        f"/{bucket}/my file.parquet"
    )
    q = _queue(tmp_path)
    q.send(_event(bucket, "my+file.parquet", 10, "2026-08-16T01:00:00.000Z"))
    events_t = HudiTable.create(spark, tmp_table_path + "/ev", _events_cfg())
    DeltaStreamer(spark, events_t, "mock://q", source_format="s3_events",
                  source_options={"sqs_client": q}).sync_once()
    target = HudiTable.create(
        spark, tmp_table_path + "/t",
        WriteConfig(record_key_field="id", partition_field=None,
                    precombine_field="id", auto_clean=False, auto_archive=False),
    )
    ds = DeltaStreamer(
        spark, target, events_t.base_path, source_format="s3_events_incr",
        source_options={S3.OPT_INCR_FS_PREFIX: "file",
                        S3.OPT_INCR_EXISTS_CHECK: "true"},
    )
    assert ds.sync_once() is not None
    assert target.snapshot().count() == 1


def test_all_filtered_range_advances_checkpoint(spark, tmp_table_path, tmp_path):
    """Code-review r8: when every event in the incremental range is
    filtered out, an empty commit still advances the checkpoint so the
    range is not re-collected forever."""
    q = _queue(tmp_path)
    q.send(_event("b", "logs/x.parquet", 0, "2026-08-16T01:00:00.000Z"))  # size 0
    events_t = HudiTable.create(spark, tmp_table_path + "/ev", _events_cfg())
    DeltaStreamer(spark, events_t, "mock://q", source_format="s3_events",
                  source_options={"sqs_client": q}).sync_once()
    target = HudiTable.create(
        spark, tmp_table_path + "/t",
        WriteConfig(record_key_field="id", partition_field=None,
                    precombine_field="id", auto_clean=False, auto_archive=False),
    )
    # target needs a schema for the empty-commit path: seed one row
    target.bulk_insert(spark.createDataFrame([(0,)], "id long"))
    ds = DeltaStreamer(
        spark, target, events_t.base_path, source_format="s3_events_incr",
        source_options={S3.OPT_INCR_FS_PREFIX: "file"},
    )
    assert ds.sync_once() is not None  # empty commit carries the ckpt
    assert ds.last_checkpoint() == events_t.timeline.latest_completed().timestamp
    assert target.snapshot().count() == 1  # nothing ingested
    assert ds.sync_once() is None  # and the range is NOT re-pulled
