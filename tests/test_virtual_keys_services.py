"""Virtual keys × the r7 admin/utility surface (VERDICT r7 #4).

test_virtual_keys.py pins write/read/merge/compaction/clustering for
``populate_meta_fields=false`` tables; this module crosses virtual keys
with the features that landed alongside them in round 7 and had never
met them: the snapshot exporter (both the "hudi" and flat formats),
the parquet importer, compaction admin (validate / unschedule /
repair), and pre-commit validators that read DERIVED meta columns.

Reference: virtual keys at ``HoodieTableConfig.java:159-163``; the
crossed features at ``HoodieSnapshotExporter.java:72-265``,
``HDFSParquetImporter.java:109-230``, ``CompactionAdminClient.java:64-217``,
``SparkPreCommitValidator.java``.
"""

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from hudi_0_10_0_spark import HudiTable, TableType, WriteConfig
from hudi_0_10_0_spark.utilities import import_parquet, snapshot_export

META5 = {
    "_hoodie_commit_time",
    "_hoodie_commit_seqno",
    "_hoodie_record_key",
    "_hoodie_partition_path",
    "_hoodie_file_id",
}


def _cfg(**kw):
    base = dict(
        record_key_field="o_orderkey",
        partition_field="o_orderpriority",
        precombine_field="o_totalprice",
        populate_meta_fields=False,
        auto_clean=False,
        auto_archive=False,
    )
    base.update(kw)
    return WriteConfig(**base)


def _physical_columns(base_path: str) -> set:
    cols = set()
    for f in glob.glob(base_path + "/data/*/_pp=*/_fg=*/*.parquet"):
        cols |= set(pq.ParquetFile(f).schema_arrow.names)
    return cols


def test_export_hudi_of_virtual_key_mor_table(spark, tmp_table_path, orders):
    """'hudi'-format export of a vk MOR table: the copy must load, read
    identically (meta columns derived, not materialized), stay meta-less
    on disk, and accept further writes under the vk config."""
    src = tmp_table_path + "/src"
    t = HudiTable.create(
        spark, src, _cfg(table_type=TableType.MERGE_ON_READ, inline_compact=False)
    )
    t.bulk_insert(orders)
    t.upsert(orders.limit(25).withColumn("o_comment", F.lit("vk")))
    tgt = tmp_table_path + "/exported"
    snapshot_export(spark, src, tgt, output_format="hudi")
    copy = HudiTable.load(spark, tgt)
    assert copy.cfg.populate_meta_fields is False
    src_rows = sorted(
        tuple(r) for r in t.snapshot().select("o_orderkey", "o_comment").collect()
    )
    cp_rows = sorted(
        tuple(r) for r in copy.snapshot().select("o_orderkey", "o_comment").collect()
    )
    assert src_rows == cp_rows
    # derived meta still works on the copy
    row = copy.snapshot().filter("o_orderkey = 7").first()
    assert row["_hoodie_record_key"] == "7"
    assert not (_physical_columns(tgt) & META5)
    # and the copy keeps taking vk writes
    copy.upsert(orders.limit(3).withColumn("o_comment", F.lit("more")))
    assert copy.snapshot().filter("o_comment = 'more'").count() == 3


def test_export_parquet_of_virtual_key_table(spark, tmp_table_path, orders):
    """Flat export drops meta columns — for a vk table the DERIVED ones
    must be dropped too, leaving exactly the user schema."""
    src = tmp_table_path + "/src"
    t = HudiTable.create(spark, src, _cfg())
    t.bulk_insert(orders)
    tgt = tmp_table_path + "/flat"
    snapshot_export(spark, src, tgt, output_format="parquet")
    out = spark.read.parquet(tgt)
    assert not (set(out.columns) & META5), out.columns
    assert out.count() == orders.count()


def test_import_parquet_into_virtual_key_table(spark, tmp_table_path, orders):
    src = tmp_table_path + "/raw"
    orders.limit(100).write.parquet(src)
    tgt = tmp_table_path + "/vk"
    import_parquet(spark, src, tgt, _cfg(), command="bulkinsert")
    t = HudiTable.load(spark, tgt)
    assert t.cfg.populate_meta_fields is False
    assert t.snapshot().count() == 100
    assert not (_physical_columns(tgt) & META5)
    # second import upserts on top under the stored vk config
    src2 = tmp_table_path + "/raw2"
    orders.limit(10).withColumn("o_comment", F.lit("imp")).write.parquet(src2)
    import_parquet(spark, src2, tgt, _cfg(), command="upsert")
    snap = t.snapshot()
    assert snap.count() == 100
    assert snap.filter("o_comment = 'imp'").count() == 10


def test_compaction_admin_on_virtual_key_table(spark, tmp_table_path, orders):
    """validate / unschedule / repair on a vk MOR table — the admin ops
    read plans and manifests only, so virtual keys must be transparent;
    unschedule leaves the table readable and re-compactable."""
    t = HudiTable.create(
        spark,
        tmp_table_path + "/vkadmin",
        _cfg(table_type=TableType.MERGE_ON_READ, inline_compact=False),
    )
    t.bulk_insert(orders)
    t.upsert(orders.limit(30).withColumn("o_comment", F.lit("d1")))
    ts = t.schedule_compaction()
    assert ts is not None
    report = t.validate_compaction(ts)
    assert report and all(r["valid"] and r["error"] is None for r in report), report
    assert t.unschedule_compaction(ts) is True
    assert not [i for i in t.timeline.pending() if i.action == "compaction"]
    snap = t.snapshot()
    assert snap.count() == orders.count()
    assert snap.filter("o_comment = 'd1'").count() == 30
    # fresh compaction still runs after the unschedule, keys intact
    out = t.compact()
    assert out is not None
    snap = t.snapshot()
    assert snap.count() == orders.count()
    row = snap.filter("o_orderkey = 7").first()
    assert row["_hoodie_record_key"] == "7"
    # repair on a COMMITTED compaction refuses (nothing pending)
    with pytest.raises(ValueError):
        t.repair_compaction(out)


def test_precommit_validator_reads_derived_meta(spark, tmp_table_path, orders):
    """A single_value validator querying _hoodie_record_key must see the
    DERIVED column on a vk table's staged after view."""
    t = HudiTable.create(
        spark,
        tmp_table_path + "/vkval",
        _cfg(
            precommit_validators="single_value",
            precommit_single_value_sql=(
                "select count(*) from <TABLE_NAME> "
                "where _hoodie_record_key = '7'#1"
            ),
        ),
    )
    t.bulk_insert(orders)
    assert t.snapshot().count() == orders.count()
    # the composed (non-first-commit) after view derives meta too
    t.cfg.precommit_single_value_sql = (
        "select count(*) from <TABLE_NAME> where _hoodie_record_key = '7'#1"
    )
    t.upsert(orders.limit(2).withColumn("o_comment", F.lit("ok")))
    assert t.snapshot().filter("o_comment = 'ok'").count() == 2
    # failing expectation aborts the write and leaves no commit
    from hudi_0_10_0_spark.precommit import PreCommitValidationError

    t.cfg.precommit_single_value_sql = (
        "select count(*) from <TABLE_NAME> where _hoodie_record_key = '7'#999"
    )
    n_commits = len(t.commits())
    with pytest.raises(PreCommitValidationError):
        t.upsert(orders.limit(2).withColumn("o_comment", F.lit("x")))
    assert len(t.commits()) == n_commits
