"""Virtual keys — hoodie.populate.meta.fields=false
(reference: HoodieTableConfig.java:159-163; writer skip at
HoodieParquetWriter.java:78-85; keygen-at-merge at
HoodieSparkCopyOnWriteTable.java:306-323). Data files carry no meta
columns; reads re-derive them (key via keygen expression, identity via
file path), which keeps upsert/delete/MOR/compaction/clustering fully
functional — incremental queries raise, matching the reference's
documented limitation."""

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from hudi_0_10_0_spark import HudiTable, TableType, WriteConfig

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
    )
    base.update(kw)
    return WriteConfig(**base)


@pytest.fixture()
def vk(spark, tmp_table_path, orders):
    t = HudiTable.create(spark, tmp_table_path + "/vk", _cfg())
    t.bulk_insert(orders)
    return t


def _physical_columns(table):
    cols = set()
    for f in glob.glob(table.base_path + "/data/*/_pp=*/_fg=*/*.parquet"):
        cols |= set(pq.ParquetFile(f).schema_arrow.names)
    return cols


def test_files_carry_no_meta_columns(vk):
    assert not (_physical_columns(vk) & META5)


def test_snapshot_derives_meta_columns(vk, orders):
    snap = vk.snapshot()
    assert snap.count() == orders.count()
    row = snap.filter("o_orderkey = 7").first()
    assert row["_hoodie_record_key"] == "7"
    assert row["_hoodie_partition_path"] == row["o_orderpriority"]
    assert row["_hoodie_commit_time"] == vk.commits()[0]
    assert row["_hoodie_file_id"]
    # data columns round-trip
    a = snap.select(*orders.columns).orderBy("o_orderkey").collect()
    assert a == orders.orderBy("o_orderkey").collect()


def test_upsert_delete_roundtrip(vk, orders):
    vk.upsert(orders.limit(50).withColumn("o_comment", F.lit("v2")))
    snap = vk.snapshot()
    assert snap.count() == orders.count()
    assert snap.filter("o_comment='v2'").count() == 50
    assert not (_physical_columns(vk) & META5)  # rewrites stay virtual
    vk.delete(orders.limit(10).select("o_orderkey", "o_orderpriority"))
    assert vk.snapshot().count() == orders.count() - 10


def test_time_travel_works_incremental_raises(vk, orders):
    c0 = vk.commits()[0]
    vk.upsert(orders.limit(20).withColumn("o_comment", F.lit("v2")))
    assert vk.time_travel(c0).count() == orders.count()
    assert vk.time_travel(c0).filter("o_comment='v2'").count() == 0
    with pytest.raises(ValueError, match="not functional"):
        vk.incremental(c0)


def test_clustering_on_virtual_table(vk, orders):
    vk.upsert(orders.limit(30).withColumn("o_comment", F.lit("v2")))
    assert vk.cluster(sort_cols=["o_custkey"]) is not None
    snap = vk.snapshot()
    assert snap.count() == orders.count()
    assert snap.filter("o_comment='v2'").count() == 30
    assert not (_physical_columns(vk) & META5)


def test_mor_lifecycle(spark, tmp_table_path, orders):
    t = HudiTable.create(
        spark,
        tmp_table_path + "/mor",
        _cfg(table_type=TableType.MERGE_ON_READ, inline_compact=False),
    )
    t.bulk_insert(orders)
    t.upsert(orders.limit(30).withColumn("o_comment", F.lit("delta")))
    t.delete(orders.limit(5).select("o_orderkey", "o_orderpriority"))
    assert not (_physical_columns(t) & META5)  # log files virtual too
    assert t.snapshot().count() == orders.count() - 5
    assert t.snapshot().filter("o_comment='delta'").count() == 25
    assert t.read_optimized().filter("o_comment='delta'").count() == 0
    t.compact()
    assert t.read_optimized().filter("o_comment='delta'").count() == 25
    assert t.snapshot().count() == orders.count() - 5
    assert not (_physical_columns(t) & META5)  # compacted bases virtual


def test_multilevel_and_special_char_partitions(spark, tmp_table_path):
    df = spark.createDataFrame(
        [(1, "a b", "x/y", 1.0), (2, "a b", "x/y", 2.0), (3, "c", "z", 3.0)],
        "id long, p1 string, p2 string, v double",
    )
    t = HudiTable.create(
        spark,
        tmp_table_path + "/ml",
        WriteConfig(
            record_key_field="id",
            partition_field="p1,p2",
            precombine_field="v",
            populate_meta_fields=False,
        ),
    )
    t.bulk_insert(df)
    snap = t.snapshot()
    assert snap.count() == 3
    r = snap.filter("id=1").first()
    assert r["p1"] == "a b" and r["p2"] == "x/y"
    assert r["_hoodie_partition_path"].startswith("a b/")
    t.upsert(df.filter("id=2").withColumn("v", F.lit(20.0)))
    assert t.snapshot().filter("id=2").first()["v"] == 20.0


def test_global_index_partition_move(spark, tmp_table_path):
    df = spark.createDataFrame(
        [(1, "p0", 1.0), (2, "p0", 1.0)], "id long, part string, v double"
    )
    t = HudiTable.create(
        spark,
        tmp_table_path + "/g",
        WriteConfig(
            record_key_field="id",
            partition_field="part",
            precombine_field="v",
            index_type="GLOBAL_SIMPLE",
            update_partition_path=True,
            populate_meta_fields=False,
        ),
    )
    t.bulk_insert(df)
    t.upsert(
        spark.createDataFrame([(2, "p1", 2.0)], "id long, part string, v double")
    )
    snap = t.snapshot()
    assert snap.count() == 2
    assert snap.filter("id=2").first()["part"] == "p1"
    assert snap.filter("id=2").first()["_hoodie_partition_path"] == "p1"


def test_unsupported_combinations_refused(spark, tmp_table_path, orders):
    with pytest.raises(ValueError, match="uuid"):
        HudiTable.create(
            spark, tmp_table_path + "/u", _cfg(keygen="uuid")
        )
    with pytest.raises(ValueError, match="RECORD_INDEX"):
        HudiTable.create(
            spark, tmp_table_path + "/r", _cfg(index_type="RECORD_INDEX")
        )


def test_populate_meta_fields_is_a_creation_identity_field(
    spark, tmp_table_path, orders, vk
):
    with pytest.raises(ValueError, match="populate_meta_fields"):
        HudiTable.create(
            spark,
            vk.base_path,
            _cfg(populate_meta_fields=True),
            exist_ok=True,
        )


def test_record_key_is_dropped_partition_column(spark, tmp_table_path):
    """drop_partition_columns + record_key_field inside partition_fields:
    the key source column is absent from data files, so the virtual-key
    reader must restore it from the partition path BEFORE deriving the
    key (code-review r7)."""
    df = spark.createDataFrame(
        [("r1", 1.0), ("r2", 2.0), ("r3", 3.0)], "region string, v double"
    )
    t = HudiTable.create(
        spark,
        tmp_table_path + "/kp",
        WriteConfig(
            record_key_field="region",
            partition_field="region",
            precombine_field="v",
            drop_partition_columns=True,
            populate_meta_fields=False,
        ),
    )
    t.bulk_insert(df)
    snap = t.snapshot()
    assert snap.count() == 3
    r = snap.filter("region='r2'").first()
    assert r["_hoodie_record_key"] == "r2" and r["v"] == 2.0
    t.upsert(spark.createDataFrame([("r2", 20.0)], "region string, v double"))
    assert t.snapshot().filter("region='r2'").first()["v"] == 20.0
    assert t.snapshot().count() == 3


def test_partition_values_with_hostile_encodings(spark, tmp_table_path):
    """The expression-based identity derivation peels two decode layers
    (URI percent-encoding over escapePathName): literal %, +, space,
    '=', unicode, and '/' in partition values must all round-trip."""
    vals = ["a b", "x/y", "p%20q", "a+b", "k=v", "ünïcødé", "%2F"]
    rows = [(i, v, float(i)) for i, v in enumerate(vals)]
    t = HudiTable.create(
        spark,
        tmp_table_path + "/enc",
        WriteConfig(
            record_key_field="id",
            partition_field="p",
            precombine_field="v",
            populate_meta_fields=False,
        ),
    )
    t.bulk_insert(spark.createDataFrame(rows, "id long, p string, v double"))
    got = {
        r["p"]: r["_hoodie_partition_path"]
        for r in t.snapshot().collect()
    }
    assert set(got) == set(vals)
    for v in vals:
        assert got[v] == v, (v, got[v])
    # upserts keyed through the derived identity still land correctly
    t.upsert(spark.createDataFrame([(2, "p%20q", 99.0)], "id long, p string, v double"))
    assert t.snapshot().count() == len(vals)
    assert t.snapshot().filter("id=2").first()["v"] == 99.0


def test_url_encoded_hive_style_twin_equivalence(spark, tmp_table_path):
    """url_encode_partitioning + hive_style adds an encoding layer UNDER
    the layout escaping: the derived _hoodie_partition_path must equal
    byte-for-byte what an identical meta-full table stores (pinning the
    exact decode-layer count — one too many or too few corrupts it)."""
    vals = ["a b", "x/y", "p%q", "a+b", "k=v"]
    rows = [(i, v, float(i)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, p string, v double")
    tables = {}
    for tag, populate in (("meta", True), ("virt", False)):
        t = HudiTable.create(
            spark,
            f"{tmp_table_path}/{tag}",
            WriteConfig(
                record_key_field="id",
                partition_field="p",
                precombine_field="v",
                hive_style_partitioning=True,
                url_encode_partitioning=True,
                populate_meta_fields=populate,
            ),
        )
        t.bulk_insert(df)
        tables[tag] = t
    a = {
        (r["id"], r["p"], r["_hoodie_partition_path"])
        for r in tables["meta"].snapshot().collect()
    }
    b = {
        (r["id"], r["p"], r["_hoodie_partition_path"])
        for r in tables["virt"].snapshot().collect()
    }
    assert a == b
    # and upserts through the derived identity land on the same groups
    tables["virt"].upsert(
        spark.createDataFrame([(1, "x/y", 50.0)], "id long, p string, v double")
    )
    assert tables["virt"].snapshot().count() == len(vals)
    assert tables["virt"].snapshot().filter("id=1").first()["v"] == 50.0


def test_virtual_keys_through_sql_front_door(spark, tmp_table_path):
    """hoodie.populate.meta.fields flows through CREATE TABLE
    TBLPROPERTIES; INSERT/UPDATE on the virtual table work and files
    stay meta-free."""
    from hudi_0_10_0_spark.sql.parser import HudiSqlSession

    s = HudiSqlSession(spark)
    s.sql(
        f"""CREATE TABLE vkt_sql (id bigint, part string, v double) USING hudi
        PARTITIONED BY (part)
        TBLPROPERTIES (primaryKey='id', preCombineField='v',
                       'hoodie.populate.meta.fields'='false')
        LOCATION '{tmp_table_path}/vkt'"""
    )
    s.sql("INSERT INTO vkt_sql VALUES (1,'p0',1.0),(2,'p0',2.0),(3,'p1',3.0)")
    s.sql("UPDATE vkt_sql SET v = 20.0 WHERE id = 2")
    rows = [(r[0], r[1]) for r in s.sql(
        "SELECT id, v FROM vkt_sql ORDER BY id").collect()]
    assert rows == [(1, 1.0), (2, 20.0), (3, 3.0)]
    t = HudiTable.load(spark, f"{tmp_table_path}/vkt")
    assert t.cfg.populate_meta_fields is False
    assert not (_physical_columns(t) & META5)
    s.sql("DROP TABLE vkt_sql")
