"""Snapshot exporter (reference: util/HoodieSnapshotExporter.java,
util/HoodieSnapshotCopier.java)."""

import pytest
from pyspark.sql import functions as F

from hudi_0_10_0_spark import HudiTable, TableType, WriteConfig, snapshot_export
from hudi_0_10_0_spark.utilities import SnapshotExportError


@pytest.fixture()
def cow(spark, tmp_table_path, orders):
    cfg = WriteConfig(
        record_key_field="o_orderkey",
        partition_field="o_orderstatus",
        precombine_field="o_totalprice",
        table_name="exp_orders",
    )
    t = HudiTable.create(spark, tmp_table_path + "/src", cfg)
    t.bulk_insert(orders)
    t.upsert(orders.limit(40).withColumn("o_comment", F.lit("v2")))
    return t


def test_export_parquet_drops_meta_and_matches_snapshot(
    spark, tmp_table_path, cow, orders
):
    out = tmp_table_path + "/out_parquet"
    ts = snapshot_export(spark, cow.base_path, out, "parquet")
    assert ts == cow.commits()[-1]
    got = spark.read.parquet(out)
    assert not [c for c in got.columns if c.startswith("_hoodie")]
    assert got.count() == orders.count()
    assert got.filter("o_comment='v2'").count() == 40
    assert cow.fs.exists(out + "/_SUCCESS")


def test_export_json_with_output_partition_field(spark, tmp_table_path, cow):
    out = tmp_table_path + "/out_json"
    snapshot_export(
        spark, cow.base_path, out, "json", output_partition_field="o_orderstatus"
    )
    names = cow.fs.list_names(out)
    assert any(n.startswith("o_orderstatus=") for n in names)
    got = spark.read.json(out)
    assert got.count() == cow.snapshot().count()


def test_export_custom_partitioner(spark, tmp_table_path, cow):
    out = tmp_table_path + "/out_custom"
    snapshot_export(
        spark,
        cow.base_path,
        out,
        "parquet",
        partitioner=lambda df: df.coalesce(1).write.partitionBy("o_orderpriority"),
    )
    names = cow.fs.list_names(out)
    assert any(n.startswith("o_orderpriority=") for n in names)


def test_export_hudi_is_a_loadable_equal_table(spark, tmp_table_path, cow):
    out = tmp_table_path + "/out_hudi"
    snapshot_export(spark, cow.base_path, out, "hudi")
    copy = HudiTable.load(spark, out)
    a = cow.snapshot().orderBy("o_orderkey").collect()
    b = copy.snapshot().orderBy("o_orderkey").collect()
    assert a == b
    # the copy is independently writable
    copy.upsert(
        cow.snapshot()
        .limit(5)
        .select(*[c for c in cow.snapshot().columns if not c.startswith("_hoodie")])
        .withColumn("o_comment", F.lit("post-export"))
    )
    assert copy.snapshot().filter("o_comment='post-export'").count() == 5
    # source untouched
    assert cow.snapshot().filter("o_comment='post-export'").count() == 0


def test_export_hudi_mor_copies_full_slices(spark, tmp_table_path, orders):
    cfg = WriteConfig(
        record_key_field="o_orderkey",
        partition_field="o_orderstatus",
        precombine_field="o_totalprice",
        table_type=TableType.MERGE_ON_READ,
        inline_compact=False,
    )
    t = HudiTable.create(spark, tmp_table_path + "/mor", cfg)
    t.bulk_insert(orders)
    t.upsert(orders.limit(25).withColumn("o_comment", F.lit("delta")))
    out = tmp_table_path + "/out_mor"
    snapshot_export(spark, t.base_path, out, "hudi")
    copy = HudiTable.load(spark, out)
    # snapshot (merged) equality — the delta files came along
    assert copy.snapshot().filter("o_comment='delta'").count() == 25
    # non-hudi export of the same table = read-optimized (reference
    # BaseFileOnlyView semantics): deltas absent
    out2 = tmp_table_path + "/out_mor_parquet"
    snapshot_export(spark, t.base_path, out2, "parquet")
    flat = spark.read.parquet(out2)
    assert flat.filter("o_comment='delta'").count() == 0


def test_export_excludes_commits_after_latest_at_call_time(
    spark, tmp_table_path, cow
):
    """The export captures the snapshot as of the latest commit; the
    returned timestamp pins which one."""
    out = tmp_table_path + "/out_pin"
    ts = snapshot_export(spark, cow.base_path, out, "hudi")
    copy = HudiTable.load(spark, out)
    assert copy.commits() == cow.commits()
    assert copy.commits()[-1] == ts


def test_export_errors(spark, tmp_table_path, cow):
    with pytest.raises(SnapshotExportError, match="already exists"):
        snapshot_export(spark, cow.base_path, cow.base_path, "parquet")
    with pytest.raises(SnapshotExportError, match="output_format"):
        snapshot_export(spark, cow.base_path, tmp_table_path + "/x", "csvish")
    empty = HudiTable.create(
        spark,
        tmp_table_path + "/empty",
        WriteConfig(record_key_field="o_orderkey"),
    )
    with pytest.raises(SnapshotExportError, match="No commits"):
        snapshot_export(spark, empty.base_path, tmp_table_path + "/y", "parquet")


def test_distributed_copy_path_over_64_files(spark, tmp_table_path, cow):
    """>64 data files routes the copy through executors (pyarrow.fs in
    Python workers); result must be byte-identical."""
    import os

    from hudi_0_10_0_spark.utilities import _copy_data_files

    src_dir = tmp_table_path + "/many_src"
    os.makedirs(src_dir)
    pairs = []
    for i in range(70):
        p = f"{src_dir}/f{i:03d}.bin"
        with open(p, "wb") as f:
            f.write(bytes([i % 256]) * (100 + i))
        pairs.append((p, f"{tmp_table_path}/many_dst/sub/f{i:03d}.bin"))
    _copy_data_files(spark, cow.fs, pairs)
    for i, (src, dst) in enumerate(pairs):
        with open(src, "rb") as a, open(dst, "rb") as b:
            assert a.read() == b.read(), dst
