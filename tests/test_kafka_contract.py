"""spark-sql-kafka contract tests (VERDICT r7 #6).

tests/helpers/fake_kafka_datasource.py registers a Python DataSource
under the short name ``kafka``, so ``DeltaStreamer._pull_kafka``'s JAR
path — ``spark.read.format("kafka_mock")`` with the translated option
matrix — executes UNCHANGED here (the ``client`` seam stays unset).
The fake validates the exact option contract and serves the
connector's fixed schema, so these tests prove a real jar drop-in
needs zero engine-code changes:

- first pull uses ``startingOffsets=earliest``;
- resumed pulls pass the checkpoint as a per-topic per-partition JSON
  offset map (every subscribed TopicPartition listed);
- ``endingOffsets=latest`` always;
- ``kafka.bootstrap.servers`` passes through;
- binary ``value`` casts to string and flows through the transformer;
- empty pulls commit nothing and keep the checkpoint.
"""

import json
import os
import sys

import pytest
from pyspark.sql import functions as F

from hudi_0_10_0_spark import HudiTable, WriteConfig
from hudi_0_10_0_spark.streaming.delta_streamer import DeltaStreamer

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "helpers"))
from fake_kafka_datasource import (  # noqa: E402
    CONNECTOR_SCHEMA,
    FakeKafkaReader,
    KafkaContractError,
    register,
    write_log,
)

SRC_SCHEMA = "id long, part string, v long"


def _cfg(**kw):
    base = dict(
        record_key_field="id",
        partition_field="part",
        precombine_field="v",
        auto_clean=False,
        auto_archive=False,
    )
    base.update(kw)
    return WriteConfig(**base)


def _parse(df):
    return df.select(F.from_json("value", SRC_SCHEMA).alias("r")).select("r.*")


@pytest.fixture()
def kafka(spark):
    register(spark)
    return spark


def _msg(i):
    return json.dumps({"id": i, "part": "p0", "v": i})


def test_jar_path_roundtrip_and_resume(kafka, spark, tmp_path):
    """The full InMemoryKafka roundtrip scenario, through the JAR path:
    exactly-once resume, per-partition positions, no replay/loss."""
    log = {"trips": {"0": [_msg(i) for i in range(0, 10, 2)],
                     "1": [_msg(i) for i in range(1, 10, 2)]}}
    broker = str(tmp_path / "broker.json")
    write_log(broker, log)

    t = HudiTable.create(spark, str(tmp_path / "kt"), _cfg())
    ds = DeltaStreamer(
        spark, t, "trips", source_format="kafka",
        source_options={"bootstrap.servers": f"mock://{broker}",
                        "connector_format": "kafka_mock"},
        transformer=_parse,
    )
    c1 = ds.sync_once()
    assert c1 is not None
    assert t.snapshot().count() == 10
    assert json.loads(ds.last_checkpoint()) == {"trips": {"0": 5, "1": 5}}

    # caught up → empty pull through the jar path → no commit
    assert ds.sync_once() is None
    assert json.loads(ds.last_checkpoint()) == {"trips": {"0": 5, "1": 5}}

    # "broker" gains data on partition 1 only; partition 0 keeps its
    # stored position (proves the startingOffsets JSON reached the scan)
    log["trips"]["1"].extend(_msg(i) for i in range(10, 14))
    write_log(broker, log)
    ds2 = DeltaStreamer(
        spark, t, "trips", source_format="kafka",
        source_options={"bootstrap.servers": f"mock://{broker}",
                        "connector_format": "kafka_mock"},
        transformer=_parse,
    )
    c2 = ds2.sync_once()
    assert c2 is not None
    assert t.snapshot().count() == 14
    assert t.incremental(c1).count() == 4  # exactly the new records
    assert json.loads(ds2.last_checkpoint()) == {"trips": {"0": 5, "1": 9}}
    assert ds2.sync_once() is None


def test_jar_path_multi_topic(kafka, spark, tmp_path):
    log = {
        "ta": {"0": [_msg(i) for i in range(4)]},
        "tb": {"0": [_msg(i) for i in range(4, 10)]},
    }
    broker = str(tmp_path / "broker.json")
    write_log(broker, log)
    t = HudiTable.create(spark, str(tmp_path / "ktm"), _cfg())
    ds = DeltaStreamer(
        spark, t, "ta, tb", source_format="kafka",
        source_options={"bootstrap.servers": f"mock://{broker}",
                        "connector_format": "kafka_mock"},
        transformer=_parse,
    )
    assert ds.sync_once() is not None
    assert t.snapshot().count() == 10
    ckpt = json.loads(ds.last_checkpoint())
    assert ckpt == {"ta": {"0": 4}, "tb": {"0": 6}}
    # only tb grows; ta's same-numbered partition must hold position
    log["tb"]["0"].append(_msg(10))
    write_log(broker, log)
    ds2 = DeltaStreamer(
        spark, t, "ta, tb", source_format="kafka",
        source_options={"bootstrap.servers": f"mock://{broker}",
                        "connector_format": "kafka_mock"},
        transformer=_parse,
    )
    assert ds2.sync_once() is not None
    assert t.snapshot().count() == 11
    assert json.loads(ds2.last_checkpoint()) == {"ta": {"0": 4}, "tb": {"0": 7}}


def test_connector_schema_shape(kafka, spark, tmp_path):
    """The raw scan must surface the connector's fixed 7-column schema
    with binary key/value — what production code downstream of a real
    jar would see."""
    broker = str(tmp_path / "b.json")
    write_log(broker, {"t": {"0": [_msg(1)]}})
    df = (
        spark.read.format("kafka_mock")
        .option("kafka.bootstrap.servers", f"mock://{broker}")
        .option("subscribe", "t")
        .load()
    )
    assert df.schema.simpleString() == (
        "struct<key:binary,value:binary,topic:string,partition:int,"
        "offset:bigint,timestamp:timestamp,timestampType:int>"
    )
    row = df.first()
    assert row["key"] is None
    assert bytes(row["value"]).decode() == _msg(1)
    assert (row["topic"], row["partition"], row["offset"]) == ("t", 0, 0)


# ---- option-matrix pins (reader-level, no Spark session needed) ----

GOOD = {
    "kafka.bootstrap.servers": "mock:///tmp/x.json",
    "subscribe": "t1,t2",
    "startingoffsets": json.dumps({"t1": {"0": 3}, "t2": {"0": 0}}),
    "endingoffsets": "latest",
}


def _opts(**overrides):
    o = dict(GOOD)
    for k, v in overrides.items():
        if v is None:
            o.pop(k, None)
        else:
            o[k] = v
    return o


def test_option_matrix_accepts_the_engine_translation():
    r = FakeKafkaReader(_opts())
    assert r.topics == ["t1", "t2"]
    assert r.starting == {"t1": {"0": 3}, "t2": {"0": 0}}
    r2 = FakeKafkaReader(_opts(startingoffsets="earliest"))
    assert r2.starting == "earliest"


@pytest.mark.parametrize(
    "bad, match",
    [
        (dict(**{"kafka.bootstrap.servers": None}), "bootstrap.servers"),
        (dict(subscribe=None), "subscription mode"),
        (dict(subscribe=" "), "no topics"),
        (dict(startingoffsets="latest"), "meaningless for a batch read"),
        (dict(startingoffsets="{bad json"), "JSON offset map"),
        (dict(startingoffsets='{"t1": {"0": 1}}'), "omits subscribed"),
        (dict(startingoffsets='{"t1": {"x": 1}, "t2": {}}'), "non-numeric"),
        (dict(endingoffsets='{"t1": {"0": 9}}'), "endingOffsets=latest"),
    ],
)
def test_option_matrix_rejects_contract_violations(bad, match):
    with pytest.raises(KafkaContractError, match=match):
        FakeKafkaReader(_opts(**bad))


def test_assign_mode_rejected():
    o = _opts()
    o["assign"] = '{"t1":[0]}'
    with pytest.raises(KafkaContractError, match="subscription mode"):
        FakeKafkaReader(o)


def test_connector_schema_constant_matches_documented_contract():
    # pin the literal so a drive-by edit can't silently drift the fake
    assert CONNECTOR_SCHEMA == (
        "key binary, value binary, topic string, partition int, offset long, "
        "timestamp timestamp, timestampType int"
    )


def test_sentinel_offsets_rejected():
    with pytest.raises(KafkaContractError, match="sentinel/negative"):
        FakeKafkaReader(_opts(startingoffsets='{"t1": {"0": -2}, "t2": {"0": 0}}'))


def test_partition_added_between_rounds_rejected(kafka, spark, tmp_path):
    """A partition appearing in the broker log but absent from the
    offset map must throw like the real KafkaOffsetReader, not default
    to earliest."""
    broker = str(tmp_path / "b.json")
    write_log(broker, {"t": {"0": [_msg(1)], "1": [_msg(2)]}})
    with pytest.raises(Exception, match="every TopicPartition"):
        (
            spark.read.format("kafka_mock")
            .option("kafka.bootstrap.servers", f"mock://{broker}")
            .option("subscribe", "t")
            .option("startingOffsets", json.dumps({"t": {"0": 1}}))
            .load()
            .collect()
        )
