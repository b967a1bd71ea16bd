"""GLOBAL index semantics: key lookup across all partitions, with and
without update-partition-path (reference:
HoodieGlobalSimpleIndex.java / HoodieGlobalBloomIndex.java — a key
arriving with a new partition value either stays in its original
partition or is moved via delete-old + insert-new)."""

import pytest
from pyspark.sql import functions as F

from hudi_0_10_0_spark import HudiTable, WriteConfig


def _cfg(**kw):
    return WriteConfig(
        record_key_field="o_orderkey",
        partition_field="o_orderpriority",
        precombine_field="o_orderdate",
        **kw,
    )


@pytest.fixture()
def base(spark, tmp_table_path, orders):
    def make(**kw):
        t = HudiTable.create(spark, tmp_table_path + "/t", _cfg(**kw))
        t.bulk_insert(orders)
        return t

    return make


def test_global_index_no_partition_update(base, orders):
    """update_partition_path=False: the arriving row is written into the
    record's ORIGINAL partition regardless of its new partition value."""
    t = base(index_type="GLOBAL_SIMPLE", update_partition_path=False)
    moved = (
        orders.filter(F.col("o_orderkey") % 50 == 0)
        .withColumn("o_orderpriority", F.lit("9-MOVED"))
        .withColumn("o_orderstatus", F.lit("G"))
    )
    n_moved = moved.count()
    t.upsert(moved)
    snap = t.snapshot()
    assert snap.count() == orders.count()  # no duplicates
    got = snap.filter(F.col("o_orderstatus") == "G")
    assert got.count() == n_moved
    # the payload (including the new partition VALUE) is written into the
    # record's ORIGINAL partition's file group — the reference does the
    # same: tagging pins the old location, the payload is stored as-is
    assert got.filter(F.col("o_orderpriority") == "9-MOVED").count() == n_moved
    assert "9-MOVED" not in t.partitions()
    assert (
        got.filter(F.col("_hoodie_partition_path") == "9-MOVED").count() == 0
    )


def test_global_index_update_partition_path(base, orders):
    """update_partition_path=True: old copy deleted, record re-inserted
    into the new partition."""
    t = base(index_type="GLOBAL_SIMPLE", update_partition_path=True)
    moved = (
        orders.filter(F.col("o_orderkey") % 50 == 0)
        .withColumn("o_orderpriority", F.lit("9-MOVED"))
        .withColumn("o_orderstatus", F.lit("G"))
    )
    n_moved = moved.count()
    t.upsert(moved)
    snap = t.snapshot()
    assert snap.count() == orders.count()  # moved, not duplicated
    got = snap.filter(F.col("o_orderstatus") == "G")
    assert got.count() == n_moved
    assert got.filter(F.col("o_orderpriority") == "9-MOVED").count() == n_moved
    assert "9-MOVED" in t.partitions()
    # no stale copies in the original partitions
    keys = {r[0] for r in moved.select("o_orderkey").collect()}
    stale = snap.filter(
        F.col("o_orderkey").isin(list(keys))
        & (F.col("o_orderpriority") != "9-MOVED")
    )
    assert stale.count() == 0


def test_global_delete_without_partition(base, orders):
    """GLOBAL index deletes locate keys without a partition column —
    the GlobalDeleteKeyGenerator scenario."""
    t = base(index_type="GLOBAL_SIMPLE")
    t.delete(orders.limit(70).select("o_orderkey"))
    assert t.snapshot().count() == orders.count() - 70


def test_inmemory_index_upsert_delete(spark, tmp_table_path, orders):
    """INMEMORY index (testing parity with HoodieInMemoryHashIndex):
    same tagging results as SIMPLE, driver-held map."""
    from hudi_0_10_0_spark import HudiTable, WriteConfig

    cfg = WriteConfig(
        record_key_field="o_orderkey",
        partition_field="o_orderstatus",
        precombine_field="o_totalprice",
        index_type="INMEMORY",
    )
    t = HudiTable.create(spark, tmp_table_path + "/inmem", cfg)
    t.bulk_insert(orders)
    t.upsert(orders.limit(40).withColumn("o_comment", F.lit("M")))
    snap = t.snapshot()
    assert snap.count() == orders.count()
    assert snap.filter(F.col("o_comment") == "M").count() == 40
    t.delete(orders.limit(10).select("o_orderkey", "o_orderstatus"))
    assert t.snapshot().count() == orders.count() - 10


def test_global_bloom_range_pruned_upsert(spark, tmp_table_path, orders):
    """GLOBAL_BLOOM: global tagging with key-range pruning of candidate
    file groups before the index scan."""
    cfg = WriteConfig(
        record_key_field="o_orderkey",
        partition_field="o_orderstatus",
        precombine_field="o_totalprice",
        index_type="GLOBAL_BLOOM",
    )
    t = HudiTable.create(spark, tmp_table_path + "/gbloom", cfg)
    t.bulk_insert(orders)
    t.upsert(orders.limit(30).withColumn("o_comment", F.lit("GB")))
    snap = t.snapshot()
    assert snap.count() == orders.count()
    assert snap.filter(F.col("o_comment") == "GB").count() == 30
    # global: delete by key alone
    t.delete(orders.limit(10).select("o_orderkey"))
    assert t.snapshot().count() == orders.count() - 10
