"""CDC payloads (AWS DMS / Debezium) and compaction plan strategies.

Reference models: ``common/model/AWSDmsAvroPayload.java``,
``common/model/debezium/PostgresDebeziumAvroPayload.java``, and
``client/table/action/compact/strategy/*CompactionStrategy.java``.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hudi_0_10_0_spark import HudiTable, WriteConfig
from hudi_0_10_0_spark.config import TableType

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("part", T.StringType()),
        T.StructField("v", T.LongType()),
        T.StructField("Op", T.StringType()),
    ]
)


def _mk(spark, path, payload, table_type=TableType.COPY_ON_WRITE, **kw):
    cfg = WriteConfig(
        record_key_field="id", partition_field="part", precombine_field="v",
        payload=payload, table_type=table_type,
        auto_clean=False, auto_archive=False, inline_compact=False, **kw,
    )
    return HudiTable.create(spark, path, cfg)


@pytest.mark.parametrize("table_type", [TableType.COPY_ON_WRITE, TableType.MERGE_ON_READ],
                         ids=["cow", "mor"])
def test_aws_dms_op_column_deletes(spark, tmp_table_path, table_type):
    t = _mk(spark, tmp_table_path, "aws_dms", table_type)
    base = spark.createDataFrame(
        [(i, "p", 1, "I") for i in range(10)], SCHEMA
    )
    t.bulk_insert(base)
    # CDC batch: update id 1, delete ids 2 and 3, insert id 100
    batch = spark.createDataFrame(
        [(1, "p", 2, "U"), (2, "p", 2, "D"), (3, "p", 2, "D"), (100, "p", 1, "I")],
        SCHEMA,
    )
    t.upsert(batch)
    snap = t.snapshot()
    assert snap.count() == 9  # 10 - 2 deleted + 1 inserted
    assert snap.filter(F.col("id").isin(2, 3)).count() == 0
    assert snap.filter(F.col("id") == 1).first()["v"] == 2
    assert snap.filter(F.col("id") == 100).count() == 1


def test_debezium_delete_and_event_time_guard(spark, tmp_table_path):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("part", T.StringType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("_change_operation_type", T.StringType()),
        ]
    )
    cfg = WriteConfig(
        record_key_field="id", partition_field="part", precombine_field="lsn",
        payload="debezium", auto_clean=False, auto_archive=False,
    )
    t = HudiTable.create(spark, tmp_table_path, cfg)
    t.bulk_insert(
        spark.createDataFrame([(i, "p", 10, "c") for i in range(5)], schema)
    )
    # stale update (lsn 5 < stored 10) must lose; delete id 2 wins (lsn 11)
    t.upsert(
        spark.createDataFrame(
            [(1, "p", 5, "u"), (2, "p", 11, "d")], schema
        )
    )
    snap = t.snapshot()
    assert snap.filter(F.col("id") == 2).count() == 0
    assert snap.filter(F.col("id") == 1).first()["lsn"] == 10


def _read_plan(t, instant):
    req = [
        i for i in t.timeline.instants()
        if i.timestamp == instant and i.state == "requested"
    ]
    return t.timeline.read_metadata(req[0])


def test_compaction_strategies(spark, tmp_table_path):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("part", T.StringType()),
            T.StructField("v", T.LongType()),
        ]
    )
    cfg = WriteConfig(
        record_key_field="id", partition_field="part", precombine_field="v",
        table_type=TableType.MERGE_ON_READ, inline_compact=False,
        auto_clean=False, auto_archive=False,
    )
    t = HudiTable.create(spark, tmp_table_path, cfg)
    rows = [(i, f"2026-01-{1 + i % 3:02d}", 1) for i in range(30)]
    t.bulk_insert(spark.createDataFrame(rows, schema))
    t.upsert(spark.createDataFrame([(i, f"2026-01-{1 + i % 3:02d}", 2) for i in range(30)], schema))

    # DAY_BASED: plan only touches the latest partition by name
    inst = t.schedule_compaction(strategy="DAY_BASED", day_partitions=1)
    assert inst is not None
    plan = _read_plan(t, inst)
    parts = {s["partition"] for s in plan["slices"]}
    assert parts == {"2026-01-03"}
    t.compact(inst)
    # compacted partition has no logs; others still do
    remaining = [s for s in t.view().latest_file_slices() if s.logs]
    assert remaining and all(s.partition != "2026-01-03" for s in remaining)

    # BOUNDED_IO: tiny budget still picks at least one slice
    inst2 = t.schedule_compaction(strategy="BOUNDED_IO", io_budget_bytes=1)
    assert inst2 is not None
    plan2 = _read_plan(t, inst2)
    assert len(plan2["slices"]) == 1


def test_time_elapsed_trigger(spark, tmp_table_path):
    from hudi_0_10_0_spark.operators.services import compaction_due

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("part", T.StringType()),
            T.StructField("v", T.LongType()),
        ]
    )
    cfg = WriteConfig(
        record_key_field="id", partition_field="part", precombine_field="v",
        table_type=TableType.MERGE_ON_READ, inline_compact=False,
        auto_clean=False, auto_archive=False,
        compact_trigger="TIME_ELAPSED", compact_max_delta_seconds=0,
    )
    t = HudiTable.create(spark, tmp_table_path, cfg)
    t.bulk_insert(spark.createDataFrame([(1, "p", 1)], schema))
    assert not compaction_due(t)  # no delta commits yet
    t.upsert(spark.createDataFrame([(1, "p", 2)], schema))
    assert compaction_due(t)  # 0-second band elapsed immediately
    t.cfg.compact_max_delta_seconds = 10_000
    assert not compaction_due(t)
    # NUM_OR_TIME: one delta commit, num condition not met, time not met
    t.cfg.compact_trigger = "NUM_OR_TIME"
    assert not compaction_due(t)
    t.cfg.compact_max_delta_seconds = 0
    assert compaction_due(t)


def test_overwrite_non_defaults_partial_update_on_mor(spark, tmp_table_path):
    """code-review r4: OverwriteNonDefaultsPayload must route MOR upserts
    through the stored-merge rewrite (requires_stored_merge) — a
    standalone delta row would lose the coalesce-against-old partial
    update when the read merge picks whole rows.
    Reference: OverwriteNonDefaultsWithLatestAvroPayload.java:49-76."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("part", T.StringType()),
            T.StructField("v", T.LongType()),
            T.StructField("note", T.StringType()),
        ]
    )
    t = HudiTable.create(
        spark, tmp_table_path,
        WriteConfig(
            record_key_field="id", partition_field="part",
            precombine_field="v", payload="overwrite_non_defaults",
            table_type=TableType.MERGE_ON_READ, inline_compact=False,
            auto_clean=False, auto_archive=False,
        ),
    )
    t.bulk_insert(spark.createDataFrame([(1, "p", 1, "keepme")], schema))
    # partial update: note is NULL → stored value must survive
    t.upsert(spark.createDataFrame([(1, "p", 2, None)], schema))
    row = t.snapshot().first()
    assert row["v"] == 2 and row["note"] == "keepme"
    t.compact()
    row = t.read_optimized().first()
    assert row["v"] == 2 and row["note"] == "keepme"


def test_default_payload_mor_delete_by_key(spark, tmp_table_path):
    """code-review r4: a key-only MOR delete under the event-time-ordered
    DefaultPayload has a NULL precombine value; it must still beat the
    stored row (the reference's DELETE log block removes the key
    positionally, regardless of ordering value —
    HoodieMergedLogRecordScanner.java:136-159)."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("part", T.StringType()),
            T.StructField("v", T.LongType()),
        ]
    )
    t = HudiTable.create(
        spark, tmp_table_path,
        WriteConfig(
            record_key_field="id", partition_field="part",
            precombine_field="v", payload="default",
            table_type=TableType.MERGE_ON_READ, inline_compact=False,
            auto_clean=False, auto_archive=False,
        ),
    )
    t.bulk_insert(spark.createDataFrame([(1, "p", 5), (2, "p", 5)], schema))
    t.delete(spark.createDataFrame([(1, "p")], "id long, part string"))
    assert [r["id"] for r in t.snapshot().collect()] == [2]
    # the delete must survive compaction too
    t.compact()
    assert [r["id"] for r in t.read_optimized().collect()] == [2]
    # and a LATER re-insert resurrects the key (positional delete block:
    # later log entries win)
    t.upsert(spark.createDataFrame([(1, "p", 1)], schema))
    assert sorted(r["id"] for r in t.snapshot().collect()) == [1, 2]
    # same sequence with BOTH the tombstone and the re-insert still
    # uncompacted deltas over one base row
    t.delete(spark.createDataFrame([(2, "p")], "id long, part string"))
    assert sorted(r["id"] for r in t.snapshot().collect()) == [1]
    t.upsert(spark.createDataFrame([(2, "p", 1)], schema))
    assert sorted(r["id"] for r in t.snapshot().collect()) == [1, 2]
    assert t.snapshot().filter("id = 2").first()["v"] == 1
