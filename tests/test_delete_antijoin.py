"""COW delete via broadcast anti-join (optimization r8): the fast path
must answer exactly like the merge-kernel path it bypasses, across the
edge shapes that could distinguish them — duplicate delete keys, absent
keys, a fully-emptied file group — and survivors must keep their
ORIGINAL commit time (incremental-query correctness)."""

import dataclasses

import pytest
from pyspark.sql import functions as F

from hudi_0_10_0_spark import HudiTable, WriteConfig


def _mk(spark, path, orders, **cfg_kw):
    t = HudiTable.create(
        spark,
        path,
        WriteConfig(
            record_key_field="o_orderkey",
            partition_field="o_orderpriority",
            precombine_field="o_orderdate",
            inline_compact=False,
            auto_clean=False,
            auto_archive=False,
            **cfg_kw,
        ),
    )
    t.bulk_insert(orders)
    return t


def _rows(t):
    # commit times differ across independently-built tables — compare
    # data columns only; commit-time preservation is asserted per-table
    return sorted(
        tuple(r)
        for r in t.snapshot().select("o_orderkey", "o_orderstatus").collect()
    )


def test_antijoin_delete_equals_kernel_delete(spark, orders, tmp_table_path):
    # duplicate keys in the batch + absent keys + one partition fully
    # cleared: both paths must produce identical snapshots
    dels = (
        orders.filter(F.col("o_orderkey") % 4 == 0)
        .select("o_orderkey", "o_orderpriority")
        .unionByName(  # duplicates of the same keys
            orders.filter(F.col("o_orderkey") % 8 == 0).select(
                "o_orderkey", "o_orderpriority"
            )
        )
        .unionByName(  # absent keys
            orders.limit(20)
            .select(
                (F.col("o_orderkey") + F.lit(10_000_000)).alias("o_orderkey"),
                "o_orderpriority",
            )
        )
    )
    fast = _mk(spark, f"{tmp_table_path}/fast", orders)
    c0_fast = fast.commits()[0]
    fast.delete(dels)

    slow = _mk(spark, f"{tmp_table_path}/slow", orders)
    slow.cfg = dataclasses.replace(
        slow.cfg, delete_antijoin_broadcast_budget_bytes=0
    )  # force the merge-kernel path
    slow.delete(dels)

    assert _rows(fast) == _rows(slow)
    # survivors keep the ORIGINAL bulk-insert commit time on the fast path
    cts = {
        r[0] for r in fast.snapshot().select("_hoodie_commit_time").distinct().collect()
    }
    assert cts == {c0_fast}


def test_antijoin_delete_empties_a_whole_partition(spark, orders, tmp_table_path):
    t = _mk(spark, tmp_table_path, orders)
    part = "5-LOW"
    t.delete(
        orders.filter(F.col("o_orderpriority") == part).select(
            "o_orderkey", "o_orderpriority"
        )
    )
    snap = t.snapshot()
    assert snap.filter(F.col("o_orderpriority") == part).count() == 0
    assert (
        snap.count()
        == orders.count() - orders.filter(F.col("o_orderpriority") == part).count()
    )


def _dup_table(spark, path, **cfg_kw):
    from hudi_0_10_0_spark import HudiTable, WriteConfig

    t = HudiTable.create(
        spark,
        path,
        WriteConfig(
            record_key_field="id", partition_field="part",
            precombine_field="v", inline_compact=False, **cfg_kw,
        ),
    )
    t.bulk_insert(
        spark.createDataFrame(
            [(1, "p0", 10), (1, "p0", 20), (2, "p0", 5)],
            "id long, part string, v long",
        )
    )
    return t


@pytest.mark.parametrize("budget", [None, 0])
def test_delete_preserves_untouched_duplicate_stored_keys(
    spark, tmp_table_path, budget
):
    """ENGINE-WIDE contract (r9, resolving the r8 pinned divergence):
    duplicate STORED keys of a rewritten group stream through per-row on
    BOTH the broadcast anti-join fast path and the merge kernel — the
    reference merge-handle writes each stored record independently
    (HoodieMergeHandle.write probes the incoming map per old record).
    Deleting key 2 must not silently dedup key 1's duplicates, and the
    outcome must not depend on the broadcast-budget perf knob."""
    t = _dup_table(spark, tmp_table_path)
    if budget is not None:
        t.cfg = dataclasses.replace(
            t.cfg, delete_antijoin_broadcast_budget_bytes=budget
        )  # force the merge-kernel path
    t.delete(spark.createDataFrame([(2, "p0")], "id long, part string"))
    got = sorted(tuple(r) for r in t.snapshot().select("id", "v").collect())
    assert got == [(1, 10), (1, 20)]


@pytest.mark.parametrize("budget", [None, 0])
def test_upsert_merges_each_duplicate_stored_key_per_row(
    spark, tmp_table_path, budget
):
    """Same engine-wide contract on the UPSERT side: an incoming update
    whose key has duplicate STORED rows merges with EACH of them
    (reference per-row semantics) — two stored (1, v=10)/(1, v=20) rows
    updated by one incoming (1, v=30) yield two v=30 rows, on the
    broadcast trickle path and the kernel alike."""
    t = _dup_table(spark, tmp_table_path)
    if budget is not None:
        t.cfg = dataclasses.replace(
            t.cfg, upsert_broadcast_budget_bytes=budget
        )  # force the merge-kernel path
    t.upsert(
        spark.createDataFrame([(1, "p0", 30)], "id long, part string, v long")
    )
    got = sorted(tuple(r) for r in t.snapshot().select("id", "v").collect())
    assert got == [(1, 30), (1, 30), (2, 5)]
