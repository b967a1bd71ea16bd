"""Partition-path semantics through the SQL surface (model: reference
TestShowPartitions.scala, TestInsertTable.scala "Test Different Type of
Partition Column")."""

import pytest
from pyspark.sql import functions as F

from hudi_0_10_0_spark.sql.parser import HudiSqlSession


@pytest.fixture()
def sess(spark):
    return HudiSqlSession(spark)


def test_show_partitions_multilevel_with_nulls(sess, spark, tmp_table_path):
    """'Test Show Table's Partitions with MultiLevel Partitions'
    (TestShowPartitions.scala:97): null partition values land in the
    "default" partition (PartitionPathEncodeUtils.DEFAULT_PARTITION_PATH)
    and SQL tables default to hive-style paths."""
    sess.sql(
        f"""CREATE TABLE mlp (id int, name string, price double, ts long,
        year string, month string, day string) USING hudi
        PARTITIONED BY (year, month, day)
        TBLPROPERTIES (primaryKey = 'id', preCombineField = 'ts')
        LOCATION '{tmp_table_path}/mlp'"""
    )
    assert sess.sql("SHOW PARTITIONS mlp").collect() == []
    sess.sql(
        """INSERT INTO mlp VALUES
        (1,'a1',10.0,1000,'2021','01','01'), (2,'a2',10.0,1000,'2021','01','02'),
        (3,'a3',10.0,1000,'2021','02','01'), (4,'a4',10.0,1000,'2021','02',null),
        (5,'a5',10.0,1000,'2021',null,'01'), (6,'a6',10.0,1000,null,'01','02'),
        (7,'a6',10.0,1000,'2022',null,null), (8,'a6',10.0,1000,null,'01',null),
        (9,'a6',10.0,1000,null,null,'01')"""
    )
    got = sorted(r[0] for r in sess.sql("SHOW PARTITIONS mlp").collect())
    assert got == sorted(
        [
            "year=2021/month=01/day=01",
            "year=2021/month=01/day=02",
            "year=2021/month=02/day=01",
            "year=2021/month=02/day=default",
            "year=2021/month=default/day=01",
            "year=default/month=01/day=default",
            "year=default/month=01/day=02",
            "year=default/month=default/day=01",
            "year=2022/month=default/day=default",
        ]
    )
    # partial specs
    assert sorted(
        r[0]
        for r in sess.sql(
            "SHOW PARTITIONS mlp PARTITION(year='2021', month='02')"
        ).collect()
    ) == ["year=2021/month=02/day=01", "year=2021/month=02/day=default"]
    assert sorted(
        r[0] for r in sess.sql("SHOW PARTITIONS mlp PARTITION(day=01)").collect()
    ) == [
        "year=2021/month=01/day=01",
        "year=2021/month=02/day=01",
        "year=2021/month=default/day=01",
        "year=default/month=default/day=01",
    ]
    # all nine rows are readable back across every partition shape
    assert sess.tables["mlp"].snapshot().count() == 9


@pytest.mark.parametrize(
    "ptype,pval",
    [
        ("string", "'1000'"),
        ("int", "1000"),
        ("bigint", "10000"),
        ("timestamp", "'2021-05-20 00:00:00'"),
        ("date", "'2021-05-20'"),
    ],
)
def test_partition_column_types(sess, spark, tmp_table_path, ptype, pval):
    """'Test Different Type of Partition Column' (TestInsertTable.scala:230):
    static and dynamic inserts into non-string partition columns round-trip."""
    name = f"tp_{ptype}"
    sess.sql(
        f"""CREATE TABLE {name} (id int, name string, price double, dt {ptype})
        USING hudi TBLPROPERTIES (primaryKey = 'id') PARTITIONED BY (dt)
        LOCATION '{tmp_table_path}/{name}'"""
    )
    sess.sql(f"INSERT INTO {name} PARTITION(dt = {pval}) SELECT 1, 'a1', 10.0")
    sess.sql(f"INSERT INTO {name} SELECT 2, 'a2', 10.0, {pval}")
    rows = sorted(
        (r.id, r.name, r.price, str(r.dt))
        for r in sess.tables[name]
        .snapshot()
        .select("id", "name", "price", F.col("dt").cast("string").alias("dt"))
        .collect()
    )
    want_dt = pval.strip("'")
    if ptype == "timestamp":
        # Spark renders timestamps back as 'yyyy-MM-dd HH:mm:ss'
        assert rows == [(1, "a1", 10.0, want_dt), (2, "a2", 10.0, want_dt)]
    else:
        assert rows == [(1, "a1", 10.0, want_dt), (2, "a2", 10.0, want_dt)]


def test_url_encode_partitioning(spark, tmp_table_path):
    """URL_ENCODE_PARTITIONING=true (TestCOWDataSource.scala:552-582):
    '2016/03/15' becomes ONE escaped segment '2016%2F03%2F15'
    (PartitionPathEncodeUtils.escapePathName); empty and null values land
    in 'default'; column values round-trip unescaped."""
    from hudi_0_10_0_spark import HudiTable, WriteConfig

    df = spark.createDataFrame(
        [(1, "2016/03/15", 10), (2, "2016/03/16", 20), (3, "", 30),
         (4, None, 40), (5, "a:b=c", 50)],
        "id int, dt string, v int",
    )
    t = HudiTable.create(
        spark, tmp_table_path + "/enc",
        WriteConfig(record_key_field="id", partition_field="dt",
                    url_encode_partitioning=True),
    )
    t.bulk_insert(df)
    assert sorted(t.partitions()) == [
        "2016%2F03%2F15", "2016%2F03%2F16", "a%3Ab%3Dc", "default",
    ]
    snap = t.snapshot()
    assert snap.count() == 5
    assert snap.filter("dt = '2016/03/15'").count() == 1
    # upsert rewrites in place — the escaped path is a stable identity
    t.upsert(df.withColumn("v", F.col("v") * 10))
    assert t.snapshot().count() == 5
    assert t.snapshot().agg(F.sum("v")).first()[0] == 1500


def test_drop_partition_columns(spark, tmp_table_path):
    """hoodie.datasource.write.drop.partition.columns
    (DataSourceOptions.scala:553): data files omit partition field
    columns; readers rebuild them from _hoodie_partition_path — across
    upsert, MOR merge, and compaction."""
    import glob

    import pyarrow.parquet as pq

    from hudi_0_10_0_spark import HudiTable, TableType, WriteConfig

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    t = HudiTable.create(
        spark, tmp_table_path + "/dpc",
        WriteConfig(record_key_field="o_orderkey", partition_field="o_orderpriority",
                    precombine_field="o_orderdate", drop_partition_columns=True,
                    hive_style_partitioning=True),
    )
    t.bulk_insert(orders)
    f = glob.glob(tmp_table_path + "/dpc/data/*/*/*/*.parquet")[0]
    assert "o_orderpriority" not in pq.read_schema(f).names
    snap = t.snapshot()
    assert snap.count() == orders.count()
    assert sorted(r[0] for r in snap.select("o_orderpriority").distinct().collect()) == [
        "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
    ]
    t.upsert(orders.limit(50).withColumn("o_orderstatus", F.lit("D")))
    assert t.snapshot().count() == orders.count()
    assert t.snapshot().filter("o_orderstatus = 'D'").count() == 50

    t2 = HudiTable.create(
        spark, tmp_table_path + "/dpcm",
        WriteConfig(record_key_field="o_orderkey", partition_field="o_orderpriority",
                    precombine_field="o_orderdate", drop_partition_columns=True,
                    table_type=TableType.MERGE_ON_READ, inline_compact=False),
    )
    t2.bulk_insert(orders)
    t2.upsert(orders.limit(30).withColumn("o_orderstatus", F.lit("E")))
    assert t2.snapshot().filter("o_orderstatus = 'E'").count() == 30
    t2.compact()
    assert t2.read_optimized().filter("o_orderstatus = 'E'").count() == 30


def test_drop_partition_validations(sess, spark, tmp_table_path):
    """TestAlterTableDropPartition: unknown columns, duplicate keys, and
    partial multi-level specs are rejected; a full spec drops the
    partition; urlencoded values resolve to the encoded path."""
    sess.sql(
        f"""CREATE TABLE dpv (id bigint, name string, ts string, dt string)
        USING hudi TBLPROPERTIES (primaryKey = 'id', preCombineField = 'ts')
        LOCATION '{tmp_table_path}/dpv'"""
    )
    sess.sql("INSERT INTO dpv VALUES (1, 'z3', 'v1', '2021-10-01')")
    with pytest.raises(ValueError, match="dt is not a valid partition column"):
        sess.sql("ALTER TABLE dpv DROP PARTITION (dt='2021-10-01')")

    sess.sql(
        f"""CREATE TABLE dps (id bigint, name string, ts string, dt string)
        USING hudi TBLPROPERTIES (primaryKey = 'id', preCombineField = 'ts')
        PARTITIONED BY (dt) LOCATION '{tmp_table_path}/dps'"""
    )
    sess.sql("INSERT INTO dps VALUES (1, 'z3', 'v1', '2021-10-01'), (2, 'l4', 'v1', '2021-10-02')")
    with pytest.raises(ValueError, match="Found duplicate keys 'dt'"):
        sess.sql("ALTER TABLE dps DROP PARTITION (dt='2021-10-01', dt='2021-10-02')")
    sess.sql("ALTER TABLE dps DROP PARTITION (dt='2021-10-01')")
    rows = [tuple(r) for r in sess.tables["dps"].snapshot().select("id", "dt").collect()]
    assert rows == [(2, "2021-10-02")]

    sess.sql(
        f"""CREATE TABLE dpm (id bigint, name string, ts string,
        year string, month string, day string) USING hudi
        TBLPROPERTIES (primaryKey = 'id', preCombineField = 'ts')
        PARTITIONED BY (year, month, day) LOCATION '{tmp_table_path}/dpm'"""
    )
    sess.sql(
        "INSERT INTO dpm VALUES (1,'z3','v1','2021','10','01'), (2,'l4','v1','2021','10','02')"
    )
    with pytest.raises(ValueError, match="All partition columns need to be specified"):
        sess.sql("ALTER TABLE dpm DROP PARTITION (year='2021', month='10')")
    # spec order differs from declaration order — still resolves
    sess.sql("ALTER TABLE dpm DROP PARTITION (day='01', year='2021', month='10')")
    assert [r.id for r in sess.tables["dpm"].snapshot().collect()] == [2]


def test_hive_partition_value_with_equals_sign(spark, tmp_table_path):
    """ADVICE r2 (low): a hive-style partition VALUE containing a
    literal '=' (url-encoding off) must survive the drop-partition-
    columns round trip — strip only the first 'field=' prefix, not up
    to the last '='."""
    from pyspark.sql import functions as F

    from hudi_0_10_0_spark import HudiTable, WriteConfig

    df = spark.createDataFrame(
        [(1, "a=b", 1.0), (2, "c", 2.0)], "id int, tag string, v double"
    )
    t = HudiTable.create(
        spark, tmp_table_path + "/heq",
        WriteConfig(record_key_field="id", partition_field="tag",
                    hive_style_partitioning=True,
                    url_encode_partitioning=False,
                    drop_partition_columns=True),
    )
    t.bulk_insert(df)
    got = {r.id: r.tag for r in t.snapshot().select("id", "tag").collect()}
    assert got == {1: "a=b", 2: "c"}


def test_non_hive_partition_value_with_equals_pruning(spark, tmp_table_path):
    """Code-review r3: with hive_style OFF, a partition VALUE containing
    '=' must not be mis-stripped by pseudo-stats — pruning on it keeps
    the right slice and filtered reads return every matching row."""
    from pyspark.sql import functions as F

    from hudi_0_10_0_spark import HudiTable, WriteConfig
    from hudi_0_10_0_spark.plans.pruning import prune_slices_by_stats

    df = spark.createDataFrame(
        [(1, "a=b", 1.0), (2, "c", 2.0), (3, "a=b", 3.0)],
        "id int, tag string, v double",
    )
    t = HudiTable.create(
        spark, tmp_table_path + "/nheq",
        WriteConfig(record_key_field="id", partition_field="tag",
                    hive_style_partitioning=False,
                    url_encode_partitioning=False),
    )
    t.bulk_insert(df)
    slices = t.view().latest_file_slices()
    kept = prune_slices_by_stats(t, slices, [("tag", "=", "a=b")])
    assert {s.partition for s in kept} == {"a=b"}
    got = t.snapshot(filters=[("tag", "=", "a=b")]).filter(F.col("tag") == "a=b")
    assert got.count() == 2
