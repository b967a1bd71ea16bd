"""Multi-writer crash-point fault-injection matrix (VERDICT r6 #1).

Extends the single-writer matrix: writer A crashes (SimulatedCrash via
the fs proxy) at EVERY fs-mutation point N, leaving its heartbeat FRESH
(thread dead, file recent — exactly what a just-crashed process looks
like to rivals), and THEN a live rival B runs a conflicting/overlapping
write or service against the half-mutated table. Invariants, per point:

1. B never loses committed data — B's operation succeeds and every
   commit completed before or by B stays on the timeline and readable;
2. single winner per key — the final state equals a SERIAL order of
   {A, B} (B-then-A-retry when A crashed; A-then-B when A's run
   completed before the crash point), never a blend;
3. timeline linearity after every step;
4. the lazy failed-write sweep never reclaims a live (fresh-heartbeat)
   instant — B runs with A's heartbeat fresh, and A's pending state
   must survive B untouched unless A had already committed.

Pairings (VERDICT r6 #1): upsert×upsert, upsert×compaction,
upsert×clean, compaction×sweep(+upsert).

Reference analogue: ``TestHoodieClientMultiWriter.java`` (rival writer /
table-service interleavings under OCC with marker-based recovery).
"""

from __future__ import annotations

import shutil

import pytest

from hudi_0_10_0_spark import HudiTable, WriteConfig
from hudi_0_10_0_spark.config import TableType
from test_crash_matrix import (
    SimulatedCrash,
    _df,
    _install,
    _timeline_sane,
    age_heartbeats as _age_heartbeats,
    assert_claim_hygiene,
)
from test_crash_matrix import _rows  # shared with the single-writer matrix

# soak/crash-matrix profile: deselected by the default (driver) fast
# profile, run with HUDI_FULL_SUITE=1 (see tests/conftest.py)
pytestmark = pytest.mark.soak

SEED = [(i, f"p{i % 2}", i) for i in range(60)]
A_UPD = [(i, f"p{i % 2}", i + 1000) for i in range(0, 60, 5)]
B_UPD = [(i, f"p{i % 2}", i + 9000) for i in range(0, 60, 10)]  # overlaps A's evens
FIRST = [(i, f"p{i % 2}", i + 77) for i in range(0, 60, 3)]  # pre-existing deltas


def _apply(state: dict, rows) -> dict:
    out = dict(state)
    for i, p, v in rows:
        out[(i, p)] = v
    return out


def _as_rows(state: dict) -> list[tuple]:
    return sorted((i, p, v) for (i, p), v in state.items())


def _cfg(**kw):
    base = dict(
        record_key_field="id",
        partition_field="part",
        precombine_field="v",
        concurrency_mode="OPTIMISTIC_CONCURRENCY_CONTROL",
        lock_wait_seconds=30.0,
        lock_ttl_seconds=5.0,
        auto_clean=False,
        auto_archive=False,
    )
    base.update(kw)
    return WriteConfig(**base)


def _completed(h) -> list[tuple]:
    """Committed write instants on the ACTIVE timeline ∪ the ARCHIVE —
    archiving RELOCATES completed instants (never loses them), so the
    no-data-loss invariants must look in both places (code-review r8:
    an archive-blind check fails spuriously the moment a pairing lets
    archiving run between the before/after snapshots)."""
    act = [(i.timestamp, i.action) for i in h.timeline.completed_write_instants()]
    act.extend(
        (a.get("timestamp"), a.get("action"))
        for a in h.timeline.archived_instants()
    )
    return act


def _retry_upsert(spark, h):
    _age_heartbeats(h)
    h.rollback_pending_writes()
    h.upsert(_df(spark, A_UPD))


def _retry_compact(spark, h):
    _age_heartbeats(h)
    h.rollback_pending_writes()
    pend = [i for i in h.timeline.pending() if i.action == "compaction"]
    if pend:
        h.compact(pend[0].timestamp)
    else:
        h.compact()


def _b_upsert(spark, h):
    h.upsert(_df(spark, B_UPD))


def _b_compact(spark, h):
    h.compact()  # schedules its own fresh plan


def _b_clean(spark, h):
    h.clean()


def _b_sweep_guard_writes_then_upsert(spark, h):
    """B's write-start lazy sweep with A's heartbeat FRESH: A's pending
    WRITE-action instants (the sweep's actual targets — service plans
    are skipped categorically) must survive (code-review r7: this is the
    non-vacuous form of invariant 4)."""
    from hudi_0_10_0_spark.timeline import WRITE_ACTIONS

    pend_writes = {
        (i.timestamp, i.action, i.state)
        for i in h.timeline.pending()
        if i.action in WRITE_ACTIONS
    }
    h.rollback_pending_writes()
    after = {
        (i.timestamp, i.action, i.state)
        for i in h.timeline.pending()
        if i.action in WRITE_ACTIONS
    }
    missing = pend_writes - after
    assert not missing, f"lazy sweep reclaimed live write instants: {missing}"
    h.upsert(_df(spark, B_UPD))


def _b_sweep_then_upsert(spark, h):
    # the lazy sweep itself is the operation under attack: with A's
    # heartbeat fresh it must leave A's pending state alone
    pend_before = {
        (i.timestamp, i.action, i.state) for i in h.timeline.pending()
    }
    h.rollback_pending_writes()
    pend_after = {(i.timestamp, i.action, i.state) for i in h.timeline.pending()}
    # fresh-heartbeat pendings must survive the sweep untouched
    missing = pend_before - pend_after
    assert not missing, f"lazy sweep reclaimed live instants: {missing}"
    h.upsert(_df(spark, B_UPD))


def _b_unschedule_then_upsert(spark, h):
    """B attempts to unschedule every pending compaction A left behind.
    With A's heartbeat still FRESH the admin guard must REFUSE (a live
    compactor's output must never be deleted from under it); a plan
    with no heartbeat yet (crash before the claim) may legitimately be
    unscheduled — A's retry then schedules fresh. Either way B's write
    proceeds."""
    from hudi_0_10_0_spark.concurrency import heartbeat_live

    for inst in h.timeline.pending():
        if inst.action != "compaction":
            continue
        live = heartbeat_live(h, inst.timestamp)
        try:
            h.unschedule_compaction(inst.timestamp)
            unscheduled = True
        except ValueError:
            unscheduled = False
        assert not (live and unscheduled), (
            f"unschedule removed plan {inst.timestamp} despite a LIVE "
            "rival heartbeat"
        )
    h.upsert(_df(spark, B_UPD))


def _b_cluster(spark, h):
    h.cluster(sort_cols=["id"])


def _retry_cluster(spark, h):
    _age_heartbeats(h)
    h.rollback_pending_writes()
    pend = [i for i in h.timeline.pending() if i.action == "replacecommit"]
    if pend:
        h.run_cluster(pend[0].timestamp)
    else:
        h.cluster(sort_cols=["id"])


def _seed_cow(spark, t):
    t.bulk_insert(_df(spark, SEED))


def _seed_cow_versions(spark, t):
    t.bulk_insert(_df(spark, SEED))
    t.upsert(_df(spark, FIRST))


def _seed_mor(spark, t):
    t.bulk_insert(_df(spark, SEED))
    t.upsert(_df(spark, FIRST))


PAIRINGS = {
    # A and B upsert overlapping key sets; final state must be a serial
    # order, B's non-overlap keys must keep B's values either way
    "upsert_x_upsert": dict(
        cfg={},
        seed=_seed_cow,
        a_op=lambda s, t: t.upsert(_df(s, A_UPD)),
        b_op=_b_upsert,
        retry=_retry_upsert,
        base=lambda: _apply({(i, f"p{i % 2}"): i for i in range(60)}, []),
        a_rows=A_UPD,
        b_rows=B_UPD,
    ),
    # A's deltacommit crashes mid-protocol; B compacts the table
    "upsert_x_compaction": dict(
        cfg={"table_type": TableType.MERGE_ON_READ, "inline_compact": False},
        seed=_seed_mor,
        a_op=lambda s, t: t.upsert(_df(s, A_UPD)),
        b_op=_b_compact,
        retry=_retry_upsert,
        base=lambda: _apply({(i, f"p{i % 2}"): i for i in range(60)}, FIRST),
        a_rows=A_UPD,
        b_rows=[],
    ),
    # A's upsert crashes; B cleans old file versions
    "upsert_x_clean": dict(
        cfg={
            "cleaner_policy": "KEEP_LATEST_FILE_VERSIONS",
            "cleaner_file_versions_retained": 1,
        },
        seed=_seed_cow_versions,
        a_op=lambda s, t: t.upsert(_df(s, A_UPD)),
        b_op=_b_clean,
        retry=_retry_upsert,
        base=lambda: _apply({(i, f"p{i % 2}"): i for i in range(60)}, FIRST),
        a_rows=A_UPD,
        b_rows=[],
    ),
    # A's upsert crashes with a fresh heartbeat; B's lazy sweep must
    # NOT reclaim A's pending write instant (the sweep's real targets)
    "upsert_x_sweep": dict(
        cfg={},
        seed=_seed_cow,
        a_op=lambda s, t: t.upsert(_df(s, A_UPD)),
        b_op=_b_sweep_guard_writes_then_upsert,
        retry=_retry_upsert,
        base=lambda: _apply({(i, f"p{i % 2}"): i for i in range(60)}, []),
        a_rows=A_UPD,
        b_rows=B_UPD,
    ),
    # A's upsert crashes; B runs inline z-less clustering over the
    # whole table (sort layout). B's plan sees only COMMITTED versions
    # (A's half-written data is invisible), so the replace is
    # value-neutral; A's retry tags against the post-clustering view
    "upsert_x_clustering": dict(
        cfg={},
        seed=_seed_cow,
        a_op=lambda s, t: t.upsert(_df(s, A_UPD)),
        b_op=_b_cluster,
        retry=_retry_upsert,
        base=lambda: _apply({(i, f"p{i % 2}"): i for i in range(60)}, []),
        a_rows=A_UPD,
        b_rows=[],
    ),
    # A's clustering crashes at every point (mid-schedule, mid-replace
    # write, mid-commit) with a fresh heartbeat; B's sweep must leave
    # the pending plan alone (cluster plans are categorically not
    # failed writes) and B's upsert — under ALLOW_ROLLBACK — rolls back
    # exactly the conflicting pinned plan and proceeds
    "clustering_x_sweep": dict(
        cfg={"clustering_updates_strategy": "ALLOW_ROLLBACK"},
        seed=_seed_cow_versions,
        a_op=lambda s, t: t.cluster(sort_cols=["id"]),
        b_op=_b_sweep_then_upsert,
        retry=_retry_cluster,
        base=lambda: _apply({(i, f"p{i % 2}"): i for i in range(60)}, FIRST),
        a_rows=[],
        b_rows=B_UPD,
    ),
    # A's compaction crashes at every point; B tries to UNSCHEDULE the
    # pending plan — refused while A's heartbeat reads live, allowed on
    # heartbeat-less debris — then writes; A's retry re-compacts either
    # way (fresh schedule when the plan was legitimately unscheduled)
    "compaction_x_unschedule": dict(
        cfg={"table_type": TableType.MERGE_ON_READ, "inline_compact": False},
        seed=_seed_mor,
        a_op=lambda s, t: t.compact(),
        b_op=_b_unschedule_then_upsert,
        retry=_retry_compact,
        base=lambda: _apply({(i, f"p{i % 2}"): i for i in range(60)}, FIRST),
        a_rows=[],
        b_rows=B_UPD,
    ),
    # A's compaction crashes with a fresh heartbeat; B runs the lazy
    # failed-write sweep (must not reclaim A) and then writes
    "compaction_x_sweep": dict(
        cfg={"table_type": TableType.MERGE_ON_READ, "inline_compact": False},
        seed=_seed_mor,
        a_op=lambda s, t: t.compact(),
        b_op=_b_sweep_then_upsert,
        retry=_retry_compact,
        base=lambda: _apply({(i, f"p{i % 2}"): i for i in range(60)}, FIRST),
        a_rows=[],
        b_rows=B_UPD,
    ),
}


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(PAIRINGS))
def test_multi_writer_crash_matrix(spark, tmp_path, name):
    spec = PAIRINGS[name]
    pristine = str(tmp_path / "pristine")
    t = HudiTable.create(spark, pristine, _cfg(**spec["cfg"]))
    spec["seed"](spark, t)

    base = spec["base"]()
    # serial expectations (compaction/clean are value-neutral)
    state_ba = _apply(_apply(base, spec["b_rows"]), spec["a_rows"])
    state_ab = _apply(_apply(base, spec["a_rows"]), spec["b_rows"])

    def clone(tag: str) -> str:
        dst = str(tmp_path / tag)
        shutil.copytree(pristine, dst)
        return dst

    # reference run of A alone → mutation count M
    ref_dir = clone("ref")
    ref = HudiTable.load(spark, ref_dir)
    counter = _install(ref)
    spec["a_op"](spark, ref)
    total = counter.n
    assert total > 0, "A performed no fs mutations — matrix is vacuous"
    shutil.rmtree(ref_dir)

    for n in range(1, total + 1):
        d = clone(f"crash{n}")
        victim = HudiTable.load(spark, d)
        proxy = _install(victim, crash_at=n)
        crashed = True
        try:
            spec["a_op"](spark, victim)
            crashed = False  # this interleaving took fewer mutations
        except SimulatedCrash:
            pass
        # keep A's heartbeat FRESH: B must treat A as a live rival
        b = HudiTable.load(spark, d)
        committed_before_b = set(_completed(b))
        spec["b_op"](spark, b)

        h = HudiTable.load(spark, d)
        _timeline_sane(h)
        # invariant 1: nothing B (or A's crash debris) lost a commit
        assert committed_before_b <= set(_completed(h)), (
            f"{name} crash@{n}: committed instants disappeared after B"
        )
        if crashed:
            spec["retry"](spark, h)
            want = state_ba
        else:
            want = state_ab
        final = _rows(HudiTable.load(spark, d))
        assert final == _as_rows(want), (
            f"{name} crash@{n} ({proxy.ops[-1] if proxy.ops else '?'}): "
            f"final state is not the serial {'B→A' if crashed else 'A→B'} order"
        )
        h2 = HudiTable.load(spark, d)
        _timeline_sane(h2)
        assert committed_before_b <= set(_completed(h2)), (
            f"{name} crash@{n}: A's retry erased a committed instant"
        )
        for inst in h2.timeline.pending():
            assert inst.action in ("compaction", "replacecommit"), (
                f"{name} crash@{n}: leftover pending {inst}"
            )
        # claim hygiene: no <ts>.claim may outlive its instant (r7)
        assert_claim_hygiene(h2)
        shutil.rmtree(d)
