"""METADATA_ONLY bootstrap: adopt an existing parquet dataset without
rewriting it (reference: BootstrapMode.java:29-34,
SparkBootstrapCommitActionExecutor.java; read side
HoodieBootstrapRelation.scala — ours derives meta columns at scan time
instead of writing skeleton files)."""

import glob

import pytest
from pyspark.sql import functions as F

from hudi_0_10_0_spark import HudiTable, TableType, WriteConfig


def _cfg(**kw):
    return WriteConfig(
        record_key_field="o_orderkey",
        partition_field="o_orderpriority",
        precombine_field="o_orderdate",
        **kw,
    )


@pytest.fixture()
def src(tmp_table_path, orders):
    """Standard Spark partitionBy layout: hive-style dirs, partition
    column NOT stored inside the data files."""
    p = tmp_table_path + "/src"
    orders.write.partitionBy("o_orderpriority").parquet(p)
    return p


def test_layout_mismatch_raises(spark, tmp_table_path, orders):
    flat = tmp_table_path + "/flat"
    orders.write.parquet(flat)
    t = HudiTable.create(spark, tmp_table_path + "/t", _cfg())
    with pytest.raises(ValueError, match="hive-style"):
        t.bootstrap(flat, mode="METADATA_ONLY")


def test_full_lifecycle(spark, tmp_table_path, orders, src):
    t = HudiTable.create(spark, tmp_table_path + "/t", _cfg())
    c0 = t.bootstrap(src, mode="METADATA_ONLY")

    # no data files were written into the table dir — pure manifest import
    assert glob.glob(tmp_table_path + "/t/data/**/*.parquet", recursive=True) == []

    # snapshot == source, including the dir-only partition column
    snap = t.snapshot()
    assert snap.count() == orders.count()
    a = snap.select("o_orderkey", "o_totalprice", "o_orderpriority").orderBy(
        "o_orderkey"
    ).collect()
    b = orders.select("o_orderkey", "o_totalprice", "o_orderpriority").orderBy(
        "o_orderkey"
    ).collect()
    assert [(r[0], r[2]) for r in a] == [(r[0], r[2]) for r in b]

    # upsert rewrites touched groups lazily into normal table files
    upd = orders.limit(200).withColumn("o_orderstatus", F.lit("B"))
    c1 = t.upsert(upd)
    assert t.snapshot().filter(F.col("o_orderstatus") == "B").count() == 200
    assert t.snapshot().count() == orders.count()
    assert len(glob.glob(tmp_table_path + "/t/data/**/*.parquet", recursive=True)) > 0

    # incremental sees exactly the upsert; time travel hides it
    assert t.incremental(c0).count() == 200
    assert t.time_travel(c0).filter(F.col("o_orderstatus") == "B").count() == 0
    assert t.time_travel(c0).count() == orders.count()

    # delete by key
    t.delete(upd.limit(50).select("o_orderkey", "o_orderpriority"))
    assert t.snapshot().count() == orders.count() - 50


def test_source_files_never_deleted(spark, tmp_table_path, orders, src):
    cfg = _cfg(cleaner_commits_retained=1)
    t = HudiTable.create(spark, tmp_table_path + "/t", cfg)
    t.bootstrap(src, mode="METADATA_ONLY")
    n_before = len(glob.glob(src + "/**/*.parquet", recursive=True))
    upd = orders.limit(30).withColumn("o_orderstatus", F.lit("Z"))
    for _ in range(3):
        t.upsert(upd)
    t.clean()
    assert len(glob.glob(src + "/**/*.parquet", recursive=True)) == n_before


def test_mor_deltas_on_raw_base(spark, tmp_table_path, orders, src):
    cfg = _cfg(table_type=TableType.MERGE_ON_READ, inline_compact=False)
    t = HudiTable.create(spark, tmp_table_path + "/t", cfg)
    t.bootstrap(src, mode="METADATA_ONLY")
    upd = orders.limit(150).withColumn("o_orderstatus", F.lit("D"))
    t.upsert(upd)
    # snapshot merges raw base + delta; read-optimized sees raw base only
    assert t.snapshot().filter(F.col("o_orderstatus") == "D").count() == 150
    assert t.read_optimized().filter(F.col("o_orderstatus") == "D").count() == 0
    t.compact()
    assert t.read_optimized().filter(F.col("o_orderstatus") == "D").count() == 150
    assert t.snapshot().count() == orders.count()


def test_unpartitioned(spark, tmp_table_path, orders):
    p = tmp_table_path + "/srcflat"
    orders.write.parquet(p)
    cfg = WriteConfig(
        record_key_field="o_orderkey",
        partition_field="",
        precombine_field="o_orderdate",
    )
    t = HudiTable.create(spark, tmp_table_path + "/t", cfg)
    t.bootstrap(p, mode="METADATA_ONLY")
    assert t.snapshot().count() == orders.count()
    sl = t.file_slices()
    assert all(s.base.raw for s in sl)
    assert any(s.base.col_stats for s in sl)
    # stats-based skipping works over adopted files
    pruned = t.snapshot(filters=[("o_orderkey", "=", -1)])
    assert pruned.count() == 0
