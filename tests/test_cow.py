"""COW write/read round-trips (model: reference TestCOWDataSource.scala)."""

import pytest
from pyspark.sql import functions as F

from hudi_0_10_0_spark import HudiTable, WriteConfig


def _round(v, d=3):
    return None if v is None else round(v, d)


@pytest.fixture()
def cow(spark, tmp_table_path, orders):
    cfg = WriteConfig(
        record_key_field="o_orderkey",
        partition_field="o_orderstatus",
        precombine_field="o_totalprice",
        table_name="orders_cow",
    )
    t = HudiTable.create(spark, tmp_table_path + "/orders", cfg)
    t.bulk_insert(orders)
    return t


def test_bulk_insert_snapshot_roundtrip(cow, orders):
    snap = cow.snapshot()
    assert snap.count() == orders.count()
    # data columns identical
    a = snap.select(*orders.columns).orderBy("o_orderkey")
    b = orders.orderBy("o_orderkey")
    assert a.collect() == b.collect()
    # meta columns present & populated
    row = snap.first()
    assert row["_hoodie_commit_time"] == cow.commits()[0]
    assert row["_hoodie_record_key"] is not None
    assert row["_hoodie_partition_path"] == row["o_orderstatus"]


def test_upsert_updates_and_inserts(cow, orders):
    upd = orders.filter(F.col("o_orderkey") % 10 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    new = orders.limit(7).withColumn("o_orderkey", F.col("o_orderkey") + 10**7)
    cow.upsert(upd.unionByName(new))
    snap = cow.snapshot()
    assert snap.count() == orders.count() + 7
    got = (
        snap.filter((F.col("o_orderkey") % 10 == 0) & (F.col("o_orderkey") < 10**7))
        .agg(F.sum("o_totalprice"))
        .first()[0]
    )
    exp = (
        orders.filter(F.col("o_orderkey") % 10 == 0)
        .agg(F.sum(F.col("o_totalprice") * 2))
        .first()[0]
    )
    assert _round(got) == _round(exp)
    # untouched rows keep their original commit time (incremental contract)
    c1 = cow.commits()[0]
    untouched = (
        snap.filter((F.col("o_orderkey") % 10 != 0) & (F.col("o_orderkey") < 10**7))
        .select("_hoodie_commit_time")
        .distinct()
        .collect()
    )
    assert [r[0] for r in untouched] == [c1]


def test_upsert_precombine_picks_highest(cow, orders):
    base = orders.limit(20)
    dup_lo = base.withColumn("o_totalprice", F.lit(1.0))
    dup_hi = base.withColumn("o_totalprice", F.lit(99999.0))
    cow.upsert(dup_lo.unionByName(dup_hi).unionByName(dup_lo))
    keys = [r[0] for r in base.select("o_orderkey").collect()]
    got = (
        cow.snapshot()
        .filter(F.col("o_orderkey").isin(keys))
        .select("o_totalprice")
        .distinct()
        .collect()
    )
    assert [r[0] for r in got] == [99999.0]


def test_delete(cow, orders):
    dk = orders.filter(F.col("o_orderkey") % 7 == 0).select("o_orderkey", "o_orderstatus")
    cow.delete(dk)
    n_del = dk.count()
    snap = cow.snapshot()
    assert snap.count() == orders.count() - n_del
    assert snap.filter(F.col("o_orderkey") % 7 == 0).count() == 0


def test_delete_then_reinsert(cow, orders):
    one = orders.limit(1)
    key = one.first()["o_orderkey"]
    cow.delete(one.select("o_orderkey", "o_orderstatus"))
    assert cow.snapshot().filter(F.col("o_orderkey") == key).count() == 0
    cow.upsert(one)
    assert cow.snapshot().filter(F.col("o_orderkey") == key).count() == 1


def test_insert_allows_duplicate_keys(cow, orders):
    dup = orders.limit(10)
    cow.insert(dup)
    assert cow.snapshot().count() == orders.count() + 10


def test_insert_drop_dups(spark, tmp_table_path, orders):
    cfg = WriteConfig(
        record_key_field="o_orderkey",
        partition_field="o_orderstatus",
        precombine_field="o_totalprice",
        insert_drop_dups=True,
    )
    t = HudiTable.create(spark, tmp_table_path + "/o2", cfg)
    t.bulk_insert(orders)
    mixed = orders.limit(10).unionByName(
        orders.limit(3).withColumn("o_orderkey", F.col("o_orderkey") + 10**7)
    )
    t.insert(mixed)
    assert t.snapshot().count() == orders.count() + 3


def test_small_file_packing_appends_to_existing_group(spark, tmp_table_path, orders):
    cfg = WriteConfig(
        record_key_field="o_orderkey",
        partition_field=None,
        precombine_field="o_totalprice",
    )
    t = HudiTable.create(spark, tmp_table_path + "/o3", cfg)
    t.bulk_insert(orders.limit(100))
    fgs1 = {s.file_id for s in t.file_slices()}
    t.insert(orders.limit(50).withColumn("o_orderkey", F.col("o_orderkey") + 5000))
    fgs2 = {s.file_id for s in t.file_slices()}
    # small table → inserts packed into the existing small file group
    assert fgs1 == fgs2
    assert t.snapshot().count() == 150


def test_schema_evolution_add_column(cow, orders):
    extended = orders.limit(5).withColumn(
        "o_orderkey", F.col("o_orderkey") + 10**7
    ).withColumn("o_comment", F.lit("new-col"))
    cow.upsert(extended)
    snap = cow.snapshot()
    assert "o_comment" in snap.columns
    assert snap.filter(F.col("o_comment").isNotNull()).count() == 5
    assert snap.count() == orders.count() + 5


def test_nonpartitioned_table(spark, tmp_table_path, orders):
    cfg = WriteConfig(record_key_field="o_orderkey", precombine_field="o_totalprice")
    t = HudiTable.create(spark, tmp_table_path + "/np", cfg)
    t.bulk_insert(orders)
    assert t.snapshot().count() == orders.count()
    assert t.partitions() == [""]


def test_complex_key_and_hive_style(spark, tmp_table_path, lineitem):
    cfg = WriteConfig(
        record_key_field=["l_orderkey", "l_linenumber"],
        partition_field="l_returnflag",
        precombine_field="l_quantity",
        hive_style_partitioning=True,
    )
    t = HudiTable.create(spark, tmp_table_path + "/li", cfg)
    t.bulk_insert(lineitem)
    snap = t.snapshot()
    assert snap.count() == lineitem.count()
    key = snap.select("_hoodie_record_key").first()[0]
    assert key.startswith("l_orderkey:")
    assert snap.select("_hoodie_partition_path").first()[0].startswith("l_returnflag=")


def test_delete_emptying_whole_file_group(spark, tmp_table_path):
    """A COW rewrite that deletes EVERY record of a file group must
    supersede the old slice with a zero-row version (no orphan
    resurrection on the next snapshot)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("part", T.StringType()),
            T.StructField("v", T.LongType()),
        ]
    )
    cfg = WriteConfig(
        record_key_field="id", partition_field="part", precombine_field="v",
        auto_clean=False, auto_archive=False,
    )
    t = HudiTable.create(spark, tmp_table_path, cfg)
    # tiny groups: every row lands in its own file group
    t.bulk_insert(spark.createDataFrame([(i, "p0", i) for i in range(8)], schema))
    # delete via meta-key columns (the delete_where path)
    keys = t.snapshot().filter("id >= 6").select(
        "_hoodie_record_key", "_hoodie_partition_path"
    )
    t.delete(keys)
    assert t.snapshot().count() == 6
    assert t.snapshot().filter("id >= 6").count() == 0
    # deleting everything leaves an empty but valid table
    t.delete_where(F.lit(True))
    assert t.snapshot().count() == 0
    t.upsert(spark.createDataFrame([(100, "p0", 1)], schema))
    assert t.snapshot().count() == 1


def test_insert_assignment_is_parallel_not_windowed(spark, tmp_table_path, orders):
    """A single table-partition's inserts must not serialize through one
    row_number window task: the hash-proportional bucket assignment has
    no Window in the plan and spreads one partition's rows over several
    new file groups when they exceed one file's capacity."""
    cfg = WriteConfig(
        record_key_field="o_orderkey",
        partition_field=None,
        precombine_field="o_totalprice",
        record_size_estimate=1024,
        max_file_size_bytes=100 * 1024,  # ~100 rows per file group
        small_file_limit_bytes=0,
    )
    t = HudiTable.create(spark, tmp_table_path + "/par", cfg)
    t.insert(orders.limit(1000))
    fgs = {s.file_id for s in t.file_slices()}
    assert len(fgs) > 1, "one partition's inserts should open several groups"
    assert t.snapshot().count() == 1000
    # plan check: assignment path contains no Window operator
    from hudi_0_10_0_spark.config import PARTITION_PATH_COL, RECORD_KEY_COL
    from hudi_0_10_0_spark.operators.write import assign_inserts

    inserts = (
        orders.limit(1000)
        .withColumn(RECORD_KEY_COL, F.col("o_orderkey").cast("string"))
        .withColumn(PARTITION_PATH_COL, F.lit(""))
    )
    assigned, _ = assign_inserts(t, t.view(), inserts, pack_small_files=True)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan


def test_insert_pack_key_containing_separator_byte(spark, tmp_table_path):
    """Code-review r3: the insert-into-existing-group salt restores keys
    by stripping the fixed-length uuid suffix — a user key containing
    the 0x1f separator byte must round-trip intact."""
    from pyspark.sql import functions as F

    weird = "a\x1fb\x1fc"
    t = HudiTable.create(
        spark, tmp_table_path + "/sep",
        WriteConfig(record_key_field="k", partition_field="part",
                    precombine_field="v"),
    )
    t.bulk_insert(spark.createDataFrame(
        [(weird, "p0", 1), ("plain", "p0", 1)], "k string, part string, v long"))
    # insert packs into the existing small file group → salt path
    t.insert(spark.createDataFrame(
        [(weird + "2", "p0", 2), ("other\x1f", "p0", 2)],
        "k string, part string, v long"))
    keys = sorted(r.k for r in t.snapshot().select("k").collect())
    assert keys == sorted([weird, "plain", weird + "2", "other\x1f"])
    skeys = sorted(
        r["_hoodie_record_key"]
        for r in t.snapshot().select("_hoodie_record_key").collect()
    )
    assert skeys == keys


def test_null_record_keys_rejected(spark, tmp_table_path):
    """Code-review r3: null/empty record keys raise (HoodieKeyException,
    KeyGenUtils.java:92-145) instead of silently collapsing all null-key
    rows into one record; composite keys use __null__/__empty__
    placeholders and raise only when every part is null/empty."""
    import pytest
    from pyspark.sql import types as T

    t = HudiTable.create(
        spark, tmp_table_path + "/nullk",
        WriteConfig(record_key_field="k", partition_field="part",
                    precombine_field="v"),
    )
    bad = spark.createDataFrame(
        [(None, "p0", 1), ("ok", "p0", 1)],
        T.StructType([T.StructField("k", T.StringType()),
                      T.StructField("part", T.StringType()),
                      T.StructField("v", T.LongType())]),
    )
    with pytest.raises(Exception, match="cannot be null or empty"):
        t.bulk_insert(bad)

    # composite: one null part renders as __null__, all-null raises
    t2 = HudiTable.create(
        spark, tmp_table_path + "/nullc",
        WriteConfig(record_key_field=["a", "b"], partition_field="part",
                    precombine_field="v"),
    )
    t2.bulk_insert(spark.createDataFrame(
        [("x", None, "p0", 1)],
        T.StructType([T.StructField("a", T.StringType()),
                      T.StructField("b", T.StringType()),
                      T.StructField("part", T.StringType()),
                      T.StructField("v", T.LongType())]),
    ))
    key = t2.snapshot().select("_hoodie_record_key").first()[0]
    assert key == "a:x,b:__null__"
    with pytest.raises(Exception, match="entirely null or empty"):
        t2.upsert(spark.createDataFrame(
            [(None, None, "p0", 2)],
            T.StructType([T.StructField("a", T.StringType()),
                          T.StructField("b", T.StringType()),
                          T.StructField("part", T.StringType()),
                          T.StructField("v", T.LongType())]),
        ))
