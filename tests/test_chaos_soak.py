"""Randomized chaos soak: a SEEDED random sequence of writes and table
services with crashes injected at random fs-mutation points on random
steps — the cross-operation interleavings the systematic matrices don't
enumerate. The matrices crash ONE op and retry IT; here the debris of a
crashed step (a leftover pending plan, an unswept inflight, an aged
claim) is left in place and the soak simply KEEPS GOING, so every later
step runs against accumulated wreckage. The r8 inline-drain stall (a
leftover pending compaction plan pinning its groups forever) lived in
exactly this class: both systematic matrices passed while the engine
silently stopped compacting.

Invariants after every step (crashed or not):
1. the snapshot equals the python oracle — a crashed WRITE step must
   land on exactly the pre-op or the post-op state, never a torn mix;
   crashed services never change data;
2. timeline linearity + every completed metadata file parses;
3. the soak ends with NO pending instants after a final drain, and the
   final snapshot equals the oracle.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from hudi_0_10_0_spark import HudiTable, WriteConfig
from hudi_0_10_0_spark.config import TableType
from test_crash_matrix import (
    SimulatedCrash,
    _install,
    _timeline_sane,
    age_claims,
    age_heartbeats,
)

# soak/crash-matrix profile: deselected by the default (driver) fast
# profile, run with HUDI_FULL_SUITE=1 (see tests/conftest.py)
pytestmark = pytest.mark.soak

N_STEPS = 16
CRASH_EVERY = 2  # every other step crashes at a random mutation point


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, part string, v long")


def _snapshot_dict(t) -> dict[int, int]:
    return {r["id"]: r["v"] for r in t.snapshot().select("id", "v").collect()}


def _apply(oracle: dict[int, int], delta: dict[int, int | None]) -> dict[int, int]:
    out = dict(oracle)
    for i, v in delta.items():
        if v is None:
            out.pop(i, None)
        else:
            out[i] = v
    return out


@pytest.mark.parametrize(
    "table_type", [TableType.COPY_ON_WRITE, TableType.MERGE_ON_READ]
)
def test_chaos_soak_random_ops_random_crashes(spark, tmp_table_path, table_type):
    rng = random.Random(801 if table_type == TableType.COPY_ON_WRITE else 802)
    path = tmp_table_path + f"/chaos_{table_type.value}"
    t = HudiTable.create(
        spark,
        path,
        WriteConfig(
            record_key_field="id",
            partition_field="part",
            precombine_field="v",
            table_type=table_type,
            # inline services ON: their scheduling must survive debris
            inline_compact=True,
            compact_max_delta_commits=2,
            auto_clean=True,
            cleaner_commits_retained=3,
            auto_archive=True,
            keep_min_commits=6,
            keep_max_commits=8,
        ),
    )
    oracle: dict[int, int] = {i: i for i in range(120)}
    t.bulk_insert(_df(spark, [(i, f"p{i % 3}", v) for i, v in oracle.items()]))
    vclock = 1000  # strictly growing precombine so replays are idempotent

    # each plan_* draws its randomness UP FRONT and returns
    # (intended oracle delta, executable) so a crashed execution still
    # knows what the post-op state would have been
    def plan_upsert(rng, vc):
        ids = rng.sample(sorted(oracle), rng.randint(5, 30))
        rows = [(i, f"p{i % 3}", vc) for i in ids]
        return {i: vc for i in ids}, lambda h: h.upsert(_df(spark, rows))

    def plan_delete(rng, vc):
        live = sorted(oracle)
        ids = rng.sample(live, min(rng.randint(1, 6), len(live) - 20))
        rows = [(i, f"p{i % 3}", 0) for i in ids]
        return (
            {i: None for i in ids},
            lambda h: h.delete(_df(spark, rows).select("id", "part")),
        )

    def plan_cluster(rng, vc):
        return {}, lambda h: h.cluster(sort_cols=["id"])

    def plan_compact(rng, vc):
        if table_type == TableType.MERGE_ON_READ:
            return {}, lambda h: h.compact()
        return {}, lambda h: None

    def plan_clean(rng, vc):
        return {}, lambda h: h.clean()

    def plan_archive(rng, vc):
        return {}, lambda h: h.archive()

    plans = [
        plan_upsert,
        plan_upsert,
        plan_delete,
        plan_cluster,
        plan_compact,
        plan_clean,
        plan_archive,
    ]

    for step in range(N_STEPS):
        vclock += 1
        planner = rng.choice(plans)
        delta, execute = planner(rng, vclock)
        crashed = False
        if step % CRASH_EVERY == 1:
            # random crash point; ops with fewer mutations than crash_at
            # simply complete (benign — handled below)
            _install(t, crash_at=rng.randint(1, 14))
            try:
                execute(t)
            except SimulatedCrash:
                crashed = True
            t = HudiTable.load(spark, path)  # drop the proxy handle
        else:
            execute(t)

        if crashed:
            # torn-state check: exactly pre-op or post-op, never a mix;
            # the commit point decides which side the crash landed on
            got = _snapshot_dict(t)
            post = _apply(oracle, delta)
            assert got in (oracle, post), (
                f"step {step} ({planner.__name__}): torn state after crash"
            )
            oracle = got if got == post else oracle
            # age the debris the way wall-clock would, then keep going
            age_heartbeats(t)
            age_claims(t)
        else:
            oracle = _apply(oracle, delta)
            assert _snapshot_dict(t) == oracle, (
                f"step {step} ({planner.__name__}, clean)"
            )
        _timeline_sane(t)

    # final drain: sweep failed writes, run every pending service to
    # completion — the table must end clean, not wedged on debris
    t = HudiTable.load(spark, path)
    age_heartbeats(t)
    age_claims(t)
    t.rollback_pending_writes()
    for _ in range(6):
        if not list(t.timeline.pending()):
            break
        if table_type == TableType.MERGE_ON_READ:
            t.compact()
        t.run_cluster()
        t.rollback_pending_writes()
    assert list(t.timeline.pending()) == [], [
        (i.timestamp, i.action, i.state) for i in t.timeline.pending()
    ]
    assert _snapshot_dict(t) == oracle
    _timeline_sane(t)
