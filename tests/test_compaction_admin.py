"""Compaction admin ops (reference: CompactionAdminClient.java:64-217).
Our deltas are manifest-attached parquet files, so unschedule/repair
are timeline operations — the reference's log-rename machinery has no
analogue (see the services.py section comment)."""

import pytest
from pyspark.sql import functions as F

from hudi_0_10_0_spark import HudiTable, TableType, WriteConfig


def _cfg(**kw):
    return WriteConfig(
        record_key_field="o_orderkey",
        partition_field="o_orderstatus",
        precombine_field="o_totalprice",
        table_type=TableType.MERGE_ON_READ,
        inline_compact=False,
        auto_clean=False,
        auto_archive=False,
        **kw,
    )


@pytest.fixture()
def mor(spark, tmp_table_path, orders):
    t = HudiTable.create(spark, tmp_table_path + "/t", _cfg())
    t.bulk_insert(orders)
    t.upsert(orders.limit(40).withColumn("o_comment", F.lit("d1")))
    t.upsert(orders.limit(20).withColumn("o_comment", F.lit("d2")))
    return t


def test_validate_ok_then_detects_missing_base(mor):
    inst = mor.schedule_compaction()
    assert inst is not None
    report = mor.validate_compaction(inst)
    assert report and all(r["valid"] for r in report)
    # damage one planned base file → that slice invalid, others still ok
    view = mor.view()
    victim = next(s for s in view.latest_file_slices() if s.logs)
    mor.fs.delete(mor.abs_path(victim.base.paths[0]))
    report2 = mor.validate_compaction(inst)
    bad = [r for r in report2 if not r["valid"]]
    assert any(
        r["partition"] == victim.partition and r["file_id"] == victim.file_id
        for r in bad
    )
    assert all("missing" in r["error"] for r in bad)


def test_unschedule_plan_then_deltas_still_readable(mor, orders):
    inst = mor.schedule_compaction()
    assert mor.unschedule_compaction(inst) is True
    # plan gone: executing it raises, re-unscheduling is a no-op
    assert mor.unschedule_compaction(inst) is False
    with pytest.raises(ValueError, match="no compaction plan"):
        mor.compact(inst)
    # table unharmed: snapshot still merges the deltas
    snap = mor.snapshot()
    assert snap.count() == orders.count()
    assert snap.filter("o_comment='d2'").count() == 20
    # a fresh compaction can be scheduled and run afterwards
    assert mor.compact() is not None
    assert mor.read_optimized().filter("o_comment='d2'").count() == 20


def test_unschedule_single_file_id(mor):
    inst = mor.schedule_compaction()
    plan = mor.timeline.read_requested_metadata(inst, "compaction")
    slices = plan["slices"]
    assert len(slices) >= 2
    victim = slices[0]
    assert mor.unschedule_compaction_file_id(
        inst, victim["partition"], victim["file_id"]
    )
    # unknown slice → False
    assert not mor.unschedule_compaction_file_id(inst, "nope", "nope")
    plan2 = mor.timeline.read_requested_metadata(inst, "compaction")
    assert len(plan2["slices"]) == len(slices) - 1
    assert victim not in plan2["slices"]
    # the trimmed plan still executes; the removed group keeps its logs
    assert mor.compact(inst) == inst
    view = mor.view()
    kept = next(
        s for s in view.latest_file_slices()
        if (s.partition, s.file_id) == (victim["partition"], victim["file_id"])
    )
    assert kept.logs, "unscheduled group must keep its uncompacted deltas"


def test_unschedule_last_file_id_drops_plan(spark, tmp_table_path, orders):
    t = HudiTable.create(spark, tmp_table_path + "/t1", _cfg())
    t.bulk_insert(orders.limit(50))
    t.upsert(
        orders.limit(1).withColumn("o_comment", F.lit("x"))
    )
    inst = t.schedule_compaction()
    plan = t.timeline.read_requested_metadata(inst, "compaction")
    assert len(plan["slices"]) == 1
    d = plan["slices"][0]
    assert t.unschedule_compaction_file_id(inst, d["partition"], d["file_id"])
    with pytest.raises(ValueError, match="no pending compaction plan"):
        t.validate_compaction(inst)


def test_repair_clears_partial_output(mor):
    inst = mor.schedule_compaction()
    # simulate a crashed execution's partial data dir
    partial = mor.instant_data_path(inst)
    mor.fs.mkdirs(partial + "/_pp=x/_fg=y")
    mor.fs.write_text(partial + "/_pp=x/_fg=y/part-000.parquet", "torn")
    res = mor.repair_compaction(inst)
    assert res["cleared_partial_output"] is True
    assert res["finished_committed_cleanup"] is False
    assert not mor.fs.exists(partial)
    assert mor.compact(inst) == inst  # retry converges


def test_admin_refused_after_execution(mor):
    inst = mor.schedule_compaction()
    assert mor.compact(inst) == inst
    with pytest.raises(ValueError, match="no pending compaction plan|COMMIT"):
        mor.validate_compaction(inst)
    assert mor.unschedule_compaction(inst) is False


def test_repair_finishes_committed_cleanup_and_unschedule_refuses(mor, orders):
    """Crash window between the compaction's commit point and its
    plan-file cleanup: COMMIT durable, plan files leftover. Repair
    finishes the cleanup; unschedule refuses (the data dir holds
    COMMITTED base files)."""
    inst = mor.schedule_compaction()
    assert mor.compact(inst) == inst
    # recreate the leftover plan files (what the crash would leave)
    mor.timeline.create_requested(inst, "compaction", {"slices": []})
    with pytest.raises(ValueError, match="COMMIT"):
        mor.unschedule_compaction(inst)
    res = mor.repair_compaction(inst)
    assert res["finished_committed_cleanup"] is True
    # plan gone, committed data intact
    assert mor.timeline.read_requested_metadata(inst, "compaction") == {}
    assert mor.snapshot().filter("o_comment='d2'").count() == 20


def test_admin_consults_archived_commits(spark, tmp_table_path, orders):
    """A committed compaction whose COMMIT was ARCHIVED while its
    crash-leftover plan survived must still refuse unschedule — an
    active-only check would delete committed base files
    (code-review r7)."""
    t = HudiTable.create(
        spark,
        tmp_table_path + "/arch",
        _cfg(keep_min_commits=2, keep_max_commits=3),
    )
    t.bulk_insert(orders.limit(60))
    t.upsert(orders.limit(10).withColumn("o_comment", F.lit("x")))
    inst = t.schedule_compaction()
    assert t.compact(inst) == inst
    for i in range(4):  # push the compaction COMMIT past keep_max
        t.upsert(orders.limit(3).withColumn("o_comment", F.lit(f"w{i}")))
    assert t.archive() > 0
    assert not any(
        x.timestamp == inst for x in t.timeline.completed(("commit",))
    ), "fixture must archive the compaction commit"
    t.timeline.create_requested(inst, "compaction", {"slices": []})
    with pytest.raises(ValueError, match="COMMIT"):
        t.unschedule_compaction(inst)
    res = t.repair_compaction(inst)
    assert res["finished_committed_cleanup"] is True


def test_single_writer_inflight_refusal(mor):
    """Without heartbeats, an inflight marker may be a LIVE async
    compactor — unschedule/repair must refuse rather than delete its
    output mid-write; the crashed-run remedy is compact(instant)."""
    inst = mor.schedule_compaction()
    mor.timeline.transition_to_inflight(inst, "compaction")
    with pytest.raises(ValueError, match="inflight"):
        mor.unschedule_compaction(inst)
    with pytest.raises(ValueError, match="inflight"):
        mor.repair_compaction(inst)
    # the documented remedy converges
    assert mor.compact(inst) == inst


def test_occ_live_heartbeat_refuses_admin(spark, tmp_table_path, orders):
    """Under OCC a pending plan guarded by a LIVE executor heartbeat
    must refuse unschedule/repair — deleting a mid-execution rival's
    output is the exact race the execution claim exists to prevent."""
    from hudi_0_10_0_spark.concurrency import Heartbeat

    t = HudiTable.create(
        spark,
        tmp_table_path + "/occ",
        _cfg(concurrency_mode="OPTIMISTIC_CONCURRENCY_CONTROL",
             lock_wait_seconds=30.0),
    )
    t.bulk_insert(orders.limit(80))
    t.upsert(orders.limit(10).withColumn("o_comment", F.lit("d")))
    inst = t.schedule_compaction()
    hb = Heartbeat(t, inst).start()  # a live rival mid-execution
    try:
        with pytest.raises(ValueError, match="heartbeat"):
            t.unschedule_compaction(inst)
        with pytest.raises(ValueError, match="heartbeat"):
            t.repair_compaction(inst)
    finally:
        hb.stop()
    # heartbeat gone (aged out) → the plan is admin-able again
    hb_path = f"{t.meta_path}/heartbeat/{inst}"
    t.fs.delete(hb_path)
    assert t.unschedule_compaction(inst) is True
