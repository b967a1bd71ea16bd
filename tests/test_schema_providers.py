"""Schema providers (streaming/schema_providers.py — the SchemaProvider
plugin family, r8): avro→Spark conversion, file/registry providers, and
per-round re-resolution through DeltaStreamer."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import types as T

from hudi_0_10_0_spark.streaming.schema_providers import (
    avro_to_spark,
    file_schema_provider,
    registry_schema_provider,
)


AVRO = {
    "type": "record",
    "name": "trip",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "attrs", "type": {"type": "map", "values": "int"}},
        {"name": "day", "type": {"type": "int", "logicalType": "date"}},
        {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-millis"}},
        {"name": "amt", "type": {"type": "bytes", "logicalType": "decimal",
                                  "precision": 12, "scale": 2}},
        {"name": "state", "type": {"type": "enum", "name": "st",
                                    "symbols": ["A", "B"]}},
        {"name": "nested", "type": {"type": "record", "name": "inner",
                                     "fields": [{"name": "x", "type": "double"}]}},
    ],
}


def test_avro_to_spark_core_types():
    st = avro_to_spark(AVRO)
    assert st["id"].dataType == T.LongType()
    assert st["name"].dataType == T.StringType() and st["name"].nullable
    assert st["tags"].dataType == T.ArrayType(T.StringType())
    assert st["attrs"].dataType == T.MapType(T.StringType(), T.IntegerType())
    assert st["day"].dataType == T.DateType()
    assert st["ts"].dataType == T.TimestampType()
    assert st["amt"].dataType == T.DecimalType(12, 2)
    assert st["state"].dataType == T.StringType()
    assert isinstance(st["nested"].dataType, T.StructType)
    # JSON-string input works too
    assert avro_to_spark(json.dumps(AVRO)) == st


def test_avro_to_spark_rejects_unsupported():
    with pytest.raises(ValueError, match="union"):
        avro_to_spark({"type": "record", "name": "r",
                       "fields": [{"name": "u", "type": ["int", "string"]}]})
    with pytest.raises(ValueError, match="record"):
        avro_to_spark({"type": "array", "items": "int"})


def test_avro_unknown_logical_type_falls_back_to_base():
    """Avro spec (code-review r8): an unknown logicalType reads as its
    underlying type — uuid strings and time-millis ints are common in
    registry schemas and must not wedge the pipeline."""
    st = avro_to_spark({"type": "record", "name": "r", "fields": [
        {"name": "u", "type": {"type": "string", "logicalType": "uuid"}},
        {"name": "t", "type": {"type": "long", "logicalType": "time-micros"}},
    ]})
    assert st["u"].dataType == T.StringType()
    assert st["t"].dataType == T.LongType()


def test_file_provider_three_formats(spark, tmp_path):
    ddl = tmp_path / "s.ddl"
    ddl.write_text("id long, v string")
    assert file_schema_provider(str(ddl))() == T.StructType.fromDDL("id long, v string")

    avro = tmp_path / "s.avsc"
    avro.write_text(json.dumps(AVRO))
    assert file_schema_provider(str(avro))()["id"].dataType == T.LongType()

    sj = tmp_path / "s.json"
    sj.write_text(json.dumps(T.StructType.fromDDL("a int").jsonValue()))
    assert file_schema_provider(str(sj))() == T.StructType.fromDDL("a int")


def test_registry_provider_confluent_contract(tmp_path):
    payload = tmp_path / "subject.json"
    payload.write_text(json.dumps({"id": 1, "version": 3,
                                   "schema": json.dumps(AVRO)}))
    st = registry_schema_provider(f"file://{payload}")()
    assert st["id"].dataType == T.LongType()


def test_streamer_re_resolves_provider_per_round(spark, tmp_table_path, tmp_path):
    """A schema evolved in the file between rounds reaches the next pull
    without restarting the pipeline (provider re-resolution)."""
    from hudi_0_10_0_spark import HudiTable, WriteConfig
    from hudi_0_10_0_spark.streaming.delta_streamer import DeltaStreamer

    src = str(tmp_path / "src")
    os.makedirs(src)
    with open(f"{src}/b1.json", "w") as f:
        f.write('{"id": 1, "v": "a"}\n')
    schema_file = tmp_path / "schema.ddl"
    schema_file.write_text("id long, v string")

    t = HudiTable.create(
        spark, tmp_table_path + "/t",
        WriteConfig(record_key_field="id", partition_field=None,
                    precombine_field="id", auto_clean=False, auto_archive=False),
    )
    ds = DeltaStreamer(
        spark, t, src, source_format="json",
        source_schema=file_schema_provider(str(schema_file)),
    )
    assert ds.sync_once() is not None
    assert set(t.snapshot().columns) >= {"id", "v"}

    # schema evolves in the FILE; the next round's reader picks it up
    schema_file.write_text("id long, v string, extra string")
    import time

    time.sleep(0.01)
    with open(f"{src}/b2.json", "w") as f:
        f.write('{"id": 2, "v": "b", "extra": "x"}\n')
    os.utime(f"{src}/b2.json")
    assert ds.sync_once() is not None
    snap = t.snapshot()
    assert "extra" in snap.columns
    assert snap.filter("id = 2").first()["extra"] == "x"
