"""Write-commit callbacks (reference: HoodieWriteCommitCallback.java,
fired from AbstractHoodieWriteClient.java:209-213 on user write commits
only; HTTP impl HoodieWriteCommitHttpCallback.java swallows transport
failures)."""

import http.server
import json
import threading

import pytest
from pyspark.sql import functions as F

from hudi_0_10_0_spark import HudiTable, WriteConfig
from hudi_0_10_0_spark.config import TableType
from hudi_0_10_0_spark.callbacks import (
    HTTP_API_KEY_HEADER,
    register_callback_factory,
)


class RecordingCallback:
    def __init__(self):
        self.messages = []

    def call(self, message):
        self.messages.append(message)


@pytest.fixture()
def recorder():
    rec = RecordingCallback()
    register_callback_factory("test_recorder", lambda cfg: rec)
    return rec


def _cfg(**kw):
    base = dict(
        record_key_field="o_orderkey",
        partition_field="o_orderstatus",
        precombine_field="o_totalprice",
        table_name="cb_orders",
        write_commit_callback_on=True,
        write_commit_callback_class="test_recorder",
    )
    base.update(kw)
    return WriteConfig(**base)


def test_callback_fires_once_per_write_with_stats(
    spark, tmp_table_path, orders, recorder
):
    t = HudiTable.create(spark, tmp_table_path + "/t", _cfg())
    i1 = t.bulk_insert(orders.limit(100))
    i2 = t.upsert(orders.limit(10).withColumn("o_totalprice", F.lit(1.0)))
    assert [m.commit_time for m in recorder.messages] == [i1, i2]
    m = recorder.messages[0]
    assert m.table_name == "cb_orders"
    assert m.base_path == t.base_path
    assert m.action == "commit"
    assert sum(s["rows"] for s in m.write_stats) == 100
    # message round-trips as the reference's JSON wire shape
    d = json.loads(m.to_json())
    assert d["commit_time"] == i1 and d["write_stats"]


def test_callback_fires_for_replacecommit_and_delete_partition(
    spark, tmp_table_path, orders, recorder
):
    t = HudiTable.create(spark, tmp_table_path + "/t", _cfg())
    t.bulk_insert(orders.limit(100))
    t.insert_overwrite(orders.limit(20))
    parts = [r[0] for r in orders.select("o_orderstatus").distinct().collect()]
    t.delete_partition([parts[0]])
    assert [m.action for m in recorder.messages] == [
        "commit",
        "replacecommit",
        "replacecommit",
    ]


def test_callback_not_fired_for_table_services(
    spark, tmp_table_path, orders, recorder
):
    """Inline compaction completes as a commit on the timeline but is a
    table service — the reference fires callbacks from commitStats (user
    writes) only."""
    t = HudiTable.create(
        spark,
        tmp_table_path + "/t",
        _cfg(table_type=TableType.MERGE_ON_READ, inline_compact=True,
             compact_max_delta_commits=2),
    )
    t.bulk_insert(orders.limit(100))
    for i in range(3):
        t.upsert(orders.limit(5).withColumn("o_totalprice", F.lit(float(i))))
    # 4 user writes; at least one compaction ran (timeline has a
    # compact-operation commit) yet exactly 4 callback messages
    assert len(recorder.messages) == 4
    compacted = [
        i for i in t.timeline.completed(("commit",))
        if t.timeline.read_metadata(i).get("operation") == "compact"
    ]
    assert compacted, "fixture should have triggered an inline compaction"


def test_callback_off_by_default_and_not_fired_on_failure(
    spark, tmp_table_path, orders, recorder
):
    cfg = _cfg()
    cfg.write_commit_callback_on = False
    t = HudiTable.create(spark, tmp_table_path + "/t", cfg)
    t.bulk_insert(orders.limit(10))
    assert recorder.messages == []
    t2 = HudiTable.create(spark, tmp_table_path + "/t2", _cfg())
    with pytest.raises(Exception):
        t2.upsert(orders.limit(5).drop("o_orderkey"))  # key column missing
    assert recorder.messages == []


class _Handler(http.server.BaseHTTPRequestHandler):
    received = []
    status = 200

    def do_POST(self):
        body = self.rfile.read(int(self.headers["Content-Length"]))
        _Handler.received.append(
            (self.path, self.headers.get(HTTP_API_KEY_HEADER), body)
        )
        self.send_response(_Handler.status)
        self.end_headers()

    def log_message(self, *a):  # silence
        pass


@pytest.fixture()
def http_server():
    _Handler.received = []
    _Handler.status = 200
    srv = http.server.HTTPServer(("127.0.0.1", 0), _Handler)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    yield srv
    srv.shutdown()


def test_http_callback_posts_json(spark, tmp_table_path, orders, http_server):
    url = f"http://127.0.0.1:{http_server.server_address[1]}/cb"
    t = HudiTable.create(
        spark,
        tmp_table_path + "/t",
        _cfg(
            write_commit_callback_class="http",
            write_commit_callback_http_url=url,
            write_commit_callback_http_api_key="k123",
        ),
    )
    i1 = t.bulk_insert(orders.limit(50))
    assert len(_Handler.received) == 1
    path, key, body = _Handler.received[0]
    assert path == "/cb" and key == "k123"
    msg = json.loads(body)
    assert msg["commit_time"] == i1
    assert msg["table_name"] == "cb_orders"
    assert sum(s["rows"] for s in msg["write_stats"]) == 50


def test_http_callback_failures_never_fail_the_write(
    spark, tmp_table_path, orders, http_server
):
    # non-2xx response
    _Handler.status = 500
    url = f"http://127.0.0.1:{http_server.server_address[1]}/cb"
    t = HudiTable.create(
        spark,
        tmp_table_path + "/t",
        _cfg(
            write_commit_callback_class="http",
            write_commit_callback_http_url=url,
        ),
    )
    i1 = t.bulk_insert(orders.limit(10))
    assert i1 in t.commits()
    # dead endpoint (connection refused)
    t2 = HudiTable.create(
        spark,
        tmp_table_path + "/t2",
        _cfg(
            write_commit_callback_class="http",
            write_commit_callback_http_url="http://127.0.0.1:1/cb",
            write_commit_callback_http_timeout_seconds=0.5,
        ),
    )
    i2 = t2.bulk_insert(orders.limit(10))
    assert i2 in t2.commits()


def test_unknown_callback_class_fails_fast_before_any_write(
    spark, tmp_table_path, orders
):
    t = HudiTable.create(
        spark, tmp_table_path + "/t",
        _cfg(write_commit_callback_class="nope_not_registered"),
    )
    with pytest.raises(ValueError, match="nope_not_registered"):
        t.bulk_insert(orders.limit(5))
    # fail-fast: nothing committed, nothing written — a retry after
    # fixing the config cannot double-ingest (code-review r7)
    assert t.commits() == []
    # http with no URL is the same class of misconfiguration
    t2 = HudiTable.create(
        spark, tmp_table_path + "/t2",
        _cfg(write_commit_callback_class="http"),
    )
    with pytest.raises(ValueError, match="url"):
        t2.insert_overwrite(orders.limit(5))
    assert t2.commits() == []
