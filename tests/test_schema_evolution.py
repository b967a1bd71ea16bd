"""Schema evolution: ALTER ADD COLUMNS, CHANGE COLUMN (widening),
write-time reconcile, TRUNCATE.

Reference: ``AlterHoodieTableAddColumnsCommand.scala``,
``AlterHoodieTableChangeColumnCommand`` validation, reconcile-schema
(``ds/HoodieSparkSqlWriter.scala:168``), ``TruncateHoodieTableCommand``.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hudi_0_10_0_spark import HudiTable, WriteConfig

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("part", T.StringType()),
        T.StructField("v", T.IntegerType()),
    ]
)


def _cfg(**kw):
    return WriteConfig(
        record_key_field="id", partition_field="part", precombine_field="v",
        auto_clean=False, auto_archive=False, **kw,
    )


def _df(spark, rows, schema=SCHEMA):
    return spark.createDataFrame(rows, schema)


def test_add_columns_old_files_yield_nulls(spark, tmp_table_path):
    t = HudiTable.create(spark, tmp_table_path, _cfg())
    t.bulk_insert(_df(spark, [(1, "p0", 1), (2, "p0", 2)]))
    t.add_columns([("score", "double"), ("tag", "string")])

    snap = t.snapshot()
    assert "score" in snap.columns and "tag" in snap.columns
    assert snap.filter("score IS NULL").count() == 2

    # new writes can fill the added columns; missing columns still OK
    wide = T.StructType(
        SCHEMA.fields
        + [T.StructField("score", T.DoubleType()), T.StructField("tag", T.StringType())]
    )
    t.upsert(spark.createDataFrame([(2, "p0", 20, 0.5, "x"), (3, "p0", 3, 0.9, "y")], wide))
    snap = t.snapshot()
    assert snap.count() == 3
    assert snap.filter("id = 2").first().score == 0.5
    assert snap.filter("id = 1").first().score is None

    dup = pytest.raises(ValueError, t.add_columns, [("score", "double")])
    assert "already exists" in str(dup.value)


def test_reconcile_schema_on_write(spark, tmp_table_path):
    """A batch carrying a brand-new column evolves the table schema
    (write-time reconcile), no explicit DDL needed."""
    t = HudiTable.create(spark, tmp_table_path, _cfg())
    t.bulk_insert(_df(spark, [(1, "p0", 1)]))
    wide = T.StructType(SCHEMA.fields + [T.StructField("extra", T.LongType())])
    t.upsert(spark.createDataFrame([(2, "p0", 2, 99)], wide))
    snap = t.snapshot()
    assert snap.filter("id = 2").first().extra == 99
    assert snap.filter("id = 1").first().extra is None


def test_change_column_type_widening(spark, tmp_table_path):
    t = HudiTable.create(spark, tmp_table_path, _cfg())
    t.bulk_insert(_df(spark, [(1, "p0", 7)]))
    t.change_column_type("v", "bigint")
    assert dict(t.snapshot().dtypes)["v"] == "bigint"
    assert t.snapshot().first().v == 7  # old int32 file read as long

    with pytest.raises(ValueError, match="unsupported type change"):
        t.change_column_type("v", "int")  # narrowing (long → int)
    with pytest.raises(ValueError, match="meta column"):
        t.change_column_type("_hoodie_record_key", "bigint")
    with pytest.raises(ValueError, match="no such column"):
        t.change_column_type("nope", "bigint")

    # widened column keeps working for writes
    wide = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("part", T.StringType()),
            T.StructField("v", T.LongType()),
        ]
    )
    t.upsert(spark.createDataFrame([(1, "p0", 2**40)], wide))
    assert t.snapshot().first().v == 2**40


def test_truncate_keeps_schema_and_history(spark, tmp_table_path):
    t = HudiTable.create(spark, tmp_table_path, _cfg())
    c0 = t.bulk_insert(_df(spark, [(i, "p0", i) for i in range(5)]))
    t.truncate()
    assert t.snapshot().count() == 0
    assert [f.name for f in t.read_schema().fields if f.name == "v"] == ["v"]
    # truncation is a replacecommit: time travel still sees the old data
    assert t.snapshot(as_of=c0).count() == 5
    # and the table accepts new writes
    t.upsert(_df(spark, [(9, "p0", 9)]))
    assert t.snapshot().count() == 1


def test_rename_table_round_trip(spark, tmp_table_path):
    """ALTER TABLE RENAME TO (AlterHoodieTableRenameCommand.scala;
    exercised by reference TestAlterTable.scala): rename the table,
    widen a column, then read files written before AND after — data,
    schema, and the persisted name property all survive a reload."""
    from hudi_0_10_0_spark.sql.parser import HudiSqlSession

    t = HudiTable.create(spark, tmp_table_path, _cfg(table_name="orig"))
    t.bulk_insert(
        spark.createDataFrame([(1, "p0", 10), (2, "p1", 20)], SCHEMA)
    )
    s = HudiSqlSession(spark)
    s.register("orig", t)
    s.sql("ALTER TABLE orig RENAME TO renamed")
    assert "orig" not in s.tables and "renamed" in s.tables
    # persisted: a fresh load sees the new name
    assert HudiTable.load(spark, tmp_table_path).cfg.table_name == "renamed"
    # old name no longer resolves as a hudi statement target
    with pytest.raises(ValueError):
        s.sql("DELETE FROM orig WHERE id = 1")
    # widen int -> long under the new name, then write a long-valued row
    s.sql("ALTER TABLE renamed CHANGE COLUMN v bigint")
    s.sql("INSERT INTO renamed SELECT 3, 'p0', 5000000000")
    snap = {r.id: r.v for r in t.snapshot().select("id", "v").collect()}
    assert snap == {1: 10, 2: 20, 3: 5000000000}
    assert t.read_schema()["v"].dataType.simpleString() == "bigint"


def test_mor_add_column_across_delta_and_compaction(spark, tmp_table_path):
    """Schema evolution on MERGE_ON_READ: a delta commit introduces a
    new column that base files predate. The snapshot merge must yield
    nulls for untouched rows and values for delta rows; read-optimized
    ignores the deltas entirely; compaction rewrites bases under the
    widened schema without changing results."""
    from hudi_0_10_0_spark import TableType

    t = HudiTable.create(
        spark, tmp_table_path + "/morse",
        _cfg(table_type=TableType.MERGE_ON_READ, inline_compact=False),
    )
    t.bulk_insert(_df(spark, [(i, "p0", i) for i in range(20)]))
    with_extra = T.StructType(SCHEMA.fields + [T.StructField("extra", T.StringType())])
    t.upsert(
        spark.createDataFrame(
            [(i, "p0", 100 + i, f"x{i}") for i in range(5)], with_extra
        )
    )
    snap = t.snapshot()
    assert "extra" in snap.columns
    assert snap.filter("extra IS NOT NULL").count() == 5
    assert snap.filter("extra IS NULL").count() == 15
    assert {r.extra for r in snap.filter("id < 5").select("extra").collect()} == {
        f"x{i}" for i in range(5)
    }
    ro = t.read_optimized()
    assert ro.filter("v >= 100").count() == 0  # deltas invisible
    t.compact()
    snap2 = t.snapshot()
    assert snap2.filter("extra IS NOT NULL").count() == 5
    ro2 = t.read_optimized()
    assert ro2.filter("v >= 100").count() == 5  # compacted into base
    assert ro2.filter("extra IS NOT NULL").count() == 5


def test_change_column_date_to_timestamp_rejected(spark, tmp_table_path):
    """Code-review r3 (confirmed): Spark's vectorized parquet reader
    cannot read date32 pages under a pinned TimestampType schema, so
    committing a date→timestamp 'widening' would make every
    pre-existing file unreadable — it must be rejected up front."""
    t = HudiTable.create(spark, tmp_table_path + "/d2t", _cfg())
    t.bulk_insert(spark.createDataFrame(
        [(1, "p", 1, __import__("datetime").date(2020, 1, 2))],
        T.StructType(SCHEMA.fields + [T.StructField("d", T.DateType())]),
    ))
    with pytest.raises(ValueError):
        t.change_column_type("d", "timestamp")
    # the table stays readable
    assert t.snapshot().count() == 1


def test_concurrent_ddl_not_reverted_by_in_flight_write(spark, tmp_table_path, monkeypatch):
    """code-review r4: OCC mode — a data write that captured the table
    schema BEFORE an ALTER ADD COLUMNS completes must not commit the
    stale schema and revert the DDL. guarded_commit reconciles the
    about-to-commit schema with the timeline's latest (the reference's
    write-time reconcile, HoodieSparkSqlWriter.scala:168)."""
    import hudi_0_10_0_spark.operators.write as W

    t = HudiTable.create(
        spark, tmp_table_path,
        _cfg(concurrency_mode="OPTIMISTIC_CONCURRENCY_CONTROL",
             lock_provider="IN_PROCESS"),
    )
    t.bulk_insert(_df(spark, [(1, "p0", 1), (2, "p0", 2)]))

    # inject the DDL between the write's schema capture and its commit
    real_guard = W.guarded_commit
    fired = {"done": False}

    def ddl_then_commit(table, instant, action, metadata, txn_start=None):
        if not fired["done"]:
            fired["done"] = True
            t.add_columns([("note", "string")])
        return real_guard(table, instant, action, metadata, txn_start=txn_start)

    monkeypatch.setattr(W, "guarded_commit", ddl_then_commit)
    t.upsert(_df(spark, [(1, "p0", 10)]))
    monkeypatch.undo()

    # the added column survives the interleaved write...
    assert "note" in t.read_schema().fieldNames()
    snap = t.snapshot()
    assert "note" in snap.columns
    assert snap.filter("id = 1").first()["v"] == 10
    # ...and stays usable end-to-end
    t.upsert(
        spark.createDataFrame([(3, "p0", 3, "hello")],
                              "id long, part string, v int, note string")
    )
    assert t.snapshot().filter("note = 'hello'").count() == 1
