"""MERGE INTO / UPDATE / DELETE semantics (model: reference
TestMergeIntoTable.scala, TestUpdateTable.scala, TestDeleteTable.scala,
TestPartialUpdateForMergeInto.scala)."""

import pytest
from pyspark.sql import functions as F

from hudi_0_10_0_spark import HudiTable, WriteConfig
from hudi_0_10_0_spark.sql.dml import src, tgt


@pytest.fixture()
def cow(spark, tmp_table_path, orders):
    cfg = WriteConfig(
        record_key_field="o_orderkey",
        partition_field="o_orderstatus",
        precombine_field="o_totalprice",
    )
    t = HudiTable.create(spark, tmp_table_path + "/t", cfg)
    t.bulk_insert(orders)
    return t


def test_merge_update_all_and_insert(cow, orders):
    source = orders.limit(50).withColumn("o_totalprice", F.lit(5.0)).unionByName(
        orders.limit(6).withColumn("o_orderkey", F.col("o_orderkey") + 10**7)
    )
    cow.merge_into(source)
    snap = cow.snapshot()
    assert snap.count() == orders.count() + 6
    assert snap.filter(F.col("o_totalprice") == 5.0).count() == 50
    assert snap.filter(F.col("o_orderkey") >= 10**7).count() == 6


def test_merge_conditional_update(cow, orders):
    source = orders.limit(100)
    cow.merge_into(
        source,
        matched_update={"o_totalprice": F.lit(-1.0)},
        matched_condition=tgt("o_totalprice") > 100000.0,
        not_matched_insert=False,
    )
    exp = orders.limit(100).filter(F.col("o_totalprice") > 100000.0).count()
    assert cow.snapshot().filter(F.col("o_totalprice") == -1.0).count() == exp


def test_merge_update_expression_uses_both_sides(cow, orders):
    source = orders.limit(30).withColumn("bump", F.lit(10.0))
    cow.merge_into(
        source,
        matched_update={"o_totalprice": tgt("o_totalprice") + src("bump")},
        not_matched_insert=False,
    )
    keys = [r[0] for r in orders.limit(30).select("o_orderkey").collect()]
    got = (
        cow.snapshot()
        .filter(F.col("o_orderkey").isin(keys))
        .agg(F.round(F.sum("o_totalprice"), 2))
        .first()[0]
    )
    exp = round(
        orders.limit(30).agg(F.sum("o_totalprice")).first()[0] + 300.0, 2
    )
    assert got == exp


def test_merge_matched_delete(cow, orders):
    source = orders.limit(40)
    cow.merge_into(
        source,
        matched_update=None,
        matched_delete=src("o_totalprice") > 50000.0,
        not_matched_insert=False,
    )
    n_del = orders.limit(40).filter(F.col("o_totalprice") > 50000.0).count()
    assert cow.snapshot().count() == orders.count() - n_del


def test_merge_insert_condition(cow, orders):
    newbies = orders.limit(20).withColumn("o_orderkey", F.col("o_orderkey") + 10**7)
    cow.merge_into(
        newbies,
        matched_update=None,
        not_matched_insert=True,
        not_matched_condition=src("o_totalprice") > 100000.0,
    )
    exp = orders.limit(20).filter(F.col("o_totalprice") > 100000.0).count()
    assert cow.snapshot().count() == orders.count() + exp


def test_update_where(cow, orders):
    cow.update_where(
        F.col("o_orderpriority") == "1-URGENT",
        {"o_totalprice": F.col("o_totalprice") * 0.5},
    )
    got = (
        cow.snapshot()
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .agg(F.sum("o_totalprice"))
        .first()[0]
    )
    exp = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .agg(F.sum(F.col("o_totalprice") * 0.5))
        .first()[0]
    )
    assert got == pytest.approx(exp, rel=1e-9)


def test_delete_where(cow, orders):
    cow.delete_where(F.col("o_orderpriority") == "5-LOW")
    assert cow.snapshot().filter(F.col("o_orderpriority") == "5-LOW").count() == 0
    assert (
        cow.snapshot().count()
        == orders.filter(F.col("o_orderpriority") != "5-LOW").count()
    )


def test_partial_update_payload(spark, tmp_table_path, orders):
    cfg = WriteConfig(
        record_key_field="o_orderkey",
        partition_field="o_orderstatus",
        precombine_field="o_totalprice",
        payload="overwrite_non_defaults",
    )
    t = HudiTable.create(spark, tmp_table_path + "/pu", cfg)
    t.bulk_insert(orders)
    # partial update: null columns keep stored values
    patch = orders.limit(10).select(
        "o_orderkey",
        "o_orderstatus",
        (F.col("o_totalprice") * 2).alias("o_totalprice"),
        F.lit(None).cast("bigint").alias("o_custkey"),
        F.lit(None).cast("timestamp").alias("o_orderdate"),
        F.lit(None).cast("string").alias("o_orderpriority"),
    )
    t.upsert(patch)
    keys = [r[0] for r in orders.limit(10).select("o_orderkey").collect()]
    got = t.snapshot().filter(F.col("o_orderkey").isin(keys))
    assert got.filter(F.col("o_custkey").isNull()).count() == 0  # kept stored
    exp = round(orders.limit(10).agg(F.sum(F.col("o_totalprice") * 2)).first()[0], 2)
    assert round(got.agg(F.sum("o_totalprice")).first()[0], 2) == exp


def test_event_time_guard_payload(spark, tmp_table_path, orders):
    cfg = WriteConfig(
        record_key_field="o_orderkey",
        partition_field="o_orderstatus",
        precombine_field="o_totalprice",
        payload="default",
    )
    t = HudiTable.create(spark, tmp_table_path + "/ev", cfg)
    t.bulk_insert(orders)
    ten = orders.limit(10)
    keys = [r[0] for r in ten.select("o_orderkey").collect()]
    # stale update (ordering value below stored) must be ignored
    t.upsert(ten.withColumn("o_totalprice", F.lit(-1.0)))
    got = t.snapshot().filter(F.col("o_orderkey").isin(keys))
    assert got.filter(F.col("o_totalprice") == -1.0).count() == 0
    # fresh update (>= stored) wins
    t.upsert(ten.withColumn("o_totalprice", F.lit(10**9).cast("double")))
    got = t.snapshot().filter(F.col("o_orderkey").isin(keys))
    assert got.filter(F.col("o_totalprice") == float(10**9)).count() == 10
