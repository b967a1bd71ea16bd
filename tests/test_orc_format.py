"""ORC base-file format (``HoodieFileFormat.java:30-33``): the full
write/read lifecycle with ``base_file_format="orc"`` — Spark's native
ORC source replaces the parquet source; stats come from columnar reads
of the stat columns (pyarrow.orc exposes no footer statistics)."""

import pytest
from pyspark.sql import functions as F

from hudi_0_10_0_spark import HudiTable, TableType, WriteConfig


def _cfg(**kw):
    return WriteConfig(
        record_key_field="o_orderkey",
        partition_field="o_orderpriority",
        precombine_field="o_orderdate",
        base_file_format="orc",
        auto_clean=False,
        auto_archive=False,
        **kw,
    )


def test_cow_lifecycle_orc(spark, tmp_table_path, orders):
    t = HudiTable.create(spark, tmp_table_path + "/orc_cow", _cfg())
    c0 = t.bulk_insert(orders)
    # files on disk are .orc
    files = [s for sl in t.file_slices() for s in sl.base.paths]
    assert files and all(p.endswith(".orc") for p in files), files[:3]
    t.upsert(orders.limit(100).withColumn("o_orderstatus", F.lit("Z")))
    assert t.snapshot().count() == orders.count()
    assert t.snapshot().filter("o_orderstatus = 'Z'").count() == 100
    assert t.incremental(c0).count() == 100
    assert t.time_travel(c0).count() == orders.count()
    t.delete(orders.limit(30).select("o_orderkey", "o_orderpriority"))
    assert t.snapshot().count() == orders.count() - 30
    # commit stats carried key ranges (read via the ORC columnar path)
    stats = [s for c in t.view().commits for s in c[2].get("write_stats", [])]
    assert any(s.get("min_key") is not None for s in stats)


def test_mor_lifecycle_orc(spark, tmp_table_path, orders):
    t = HudiTable.create(
        spark,
        tmp_table_path + "/orc_mor",
        _cfg(table_type=TableType.MERGE_ON_READ, inline_compact=False),
    )
    t.bulk_insert(orders)
    t.upsert(orders.limit(50).withColumn("o_totalprice", F.col("o_totalprice") * 2))
    snap_sum = t.snapshot().agg(F.sum("o_totalprice")).first()[0]
    ro_sum = t.read_optimized().agg(F.sum("o_totalprice")).first()[0]
    assert snap_sum > ro_sum  # deltas visible only to snapshot
    t.compact()
    ro2 = t.read_optimized().agg(F.sum("o_totalprice")).first()[0]
    assert ro2 == pytest.approx(snap_sum)
    assert t.snapshot().count() == orders.count()


def test_create_table_orc_via_sql(spark, tmp_table_path):
    from hudi_0_10_0_spark.sql.parser import HudiSqlSession

    s = HudiSqlSession(spark)
    s.sql(
        f"CREATE TABLE ot (id bigint, v double, ts bigint) USING hudi "
        f"TBLPROPERTIES (primaryKey='id', preCombineField='ts', "
        f"baseFileFormat='orc') LOCATION '{tmp_table_path}/ot'"
    )
    s.sql("INSERT INTO ot VALUES (1, 1.5, 10), (2, 2.5, 10)")
    t = s.tables["ot"]
    assert t.cfg.base_file_format == "orc"
    files = [p for sl in t.file_slices() for p in sl.base.paths]
    assert files and all(p.endswith(".orc") for p in files)
    rows = sorted(tuple(r) for r in s.sql("SELECT id, v FROM ot").collect())
    assert rows == [(1, 1.5), (2, 2.5)]
