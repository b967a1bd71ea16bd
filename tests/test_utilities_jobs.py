"""Stand-alone utilities (reference: HDFSParquetImporter.java,
HoodieCleaner / HoodieCompactor / HoodieClusteringJob job runners)."""

import pytest
from pyspark.sql import functions as F

from hudi_0_10_0_spark import HudiTable, TableType, WriteConfig
from hudi_0_10_0_spark.utilities import import_parquet, run_table_service


def _cfg(**kw):
    base = dict(
        record_key_field="o_orderkey",
        partition_field="o_orderstatus",
        precombine_field="o_totalprice",
        auto_clean=False,
        auto_archive=False,
    )
    base.update(kw)
    return WriteConfig(**base)


def test_import_parquet_creates_then_upserts(spark, tmp_table_path, orders):
    src = tmp_table_path + "/src"
    orders.limit(100).write.parquet(src)
    tgt = tmp_table_path + "/tgt"
    c0 = import_parquet(spark, src, tgt, _cfg(), command="bulkinsert")
    t = HudiTable.load(spark, tgt)
    assert t.snapshot().count() == 100
    assert c0 == t.commits()[0]
    # second import with upsert applies on top of the existing table
    src2 = tmp_table_path + "/src2"
    orders.limit(10).withColumn("o_comment", F.lit("re")).write.parquet(src2)
    import_parquet(spark, src2, tgt, _cfg(), command="upsert")
    snap = t.snapshot()
    assert snap.count() == 100
    assert snap.filter("o_comment='re'").count() == 10
    with pytest.raises(ValueError, match="command"):
        import_parquet(spark, src, tmp_table_path + "/x", _cfg(), command="nope")


def test_import_parquet_rejects_conflicting_cfg_on_existing_target(
    spark, tmp_table_path, orders
):
    """advice r7: importing into an EXISTING table with a cfg whose
    identity fields disagree with the stored config must raise (the
    old load()-based path silently ignored the supplied cfg)."""
    src = tmp_table_path + "/src"
    orders.limit(20).write.parquet(src)
    tgt = tmp_table_path + "/tgt"
    import_parquet(spark, src, tgt, _cfg(), command="bulkinsert")
    with pytest.raises(ValueError, match="conflicts with the stored table"):
        import_parquet(
            spark, src, tgt, _cfg(record_key_field="o_custkey"), command="upsert"
        )
    # matching cfg still proceeds under the stored config
    import_parquet(spark, src, tgt, _cfg(), command="upsert")
    assert HudiTable.load(spark, tgt).snapshot().count() == 20


def test_run_table_service_compact_modes(spark, tmp_table_path, orders):
    t = HudiTable.create(
        spark,
        tmp_table_path + "/t",
        _cfg(table_type=TableType.MERGE_ON_READ, inline_compact=False),
    )
    t.bulk_insert(orders.limit(100))
    t.upsert(orders.limit(10).withColumn("o_comment", F.lit("d")))
    # schedule-only leaves a pending plan
    inst = run_table_service(spark, t.base_path, "compact", mode="schedule")
    assert inst is not None
    assert any(i.action == "compaction" for i in t.timeline.pending())
    # execute runs the earliest pending plan
    assert run_table_service(spark, t.base_path, "compact", mode="execute") == inst
    assert t.read_optimized().filter("o_comment='d'").count() == 10
    # nothing pending → execute is a no-op
    assert run_table_service(spark, t.base_path, "compact", mode="execute") is None


def test_run_table_service_cluster_clean_archive(spark, tmp_table_path, orders):
    t = HudiTable.create(
        spark,
        tmp_table_path + "/t",
        _cfg(cleaner_policy="KEEP_LATEST_FILE_VERSIONS",
             cleaner_file_versions_retained=1),
    )
    t.bulk_insert(orders.limit(100))
    t.upsert(orders.limit(10).withColumn("o_comment", F.lit("a")))
    assert run_table_service(
        spark, t.base_path, "cluster", sort_cols=["o_custkey"]
    ) is not None
    assert run_table_service(spark, t.base_path, "clean") is not None
    assert run_table_service(spark, t.base_path, "archive") >= 0
    assert HudiTable.load(spark, t.base_path).snapshot().count() == 100
    with pytest.raises(ValueError, match="unknown service"):
        run_table_service(spark, t.base_path, "defrag")
