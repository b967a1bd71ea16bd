"""Streaming crash coverage (VERDICT r6 #4).

Both the streaming sink's micro-batch id and the DeltaStreamer
checkpoint live INSIDE the commit metadata of the write that applied the
batch — commit and progress-record are one atomic rename, so "crash
between write and checkpoint advance" has no window by construction.
What remains testable is the window the matrix method covers: crash at
EVERY fs-mutation point inside the batch write, then a restart replaying
the same batch. Invariants:

- exactly-once: after recovery + replay, the batch's rows are applied
  exactly once (never dropped, never doubled), and exactly ONE completed
  commit carries the batch id / checkpoint;
- a crash AFTER the commit point must make the replay a no-op skip;
- progression: the next batch/pull applies normally afterwards.

Reference analogue: ``HoodieStreamingSink.canSkipBatch`` replay dedup and
``DeltaSync`` checkpoint-in-commit (``deltastreamer.checkpoint.key``).
"""

from __future__ import annotations

import shutil

import pytest


from hudi_0_10_0_spark import HudiTable, WriteConfig
from hudi_0_10_0_spark.streaming.delta_streamer import CHECKPOINT_KEY, DeltaStreamer
from hudi_0_10_0_spark.streaming.sink import BATCH_ID_KEY, _foreach_batch
from test_crash_matrix import SimulatedCrash, _df, _install

# soak/crash-matrix profile: deselected by the default (driver) fast
# profile, run with HUDI_FULL_SUITE=1 (see tests/conftest.py)
pytestmark = pytest.mark.soak

SEED = [(i, f"p{i % 2}", i) for i in range(50)]
B0 = [(i, f"p{i % 2}", i + 1000) for i in range(0, 50, 5)]
B1 = [(i, f"p{i % 2}", i + 2000) for i in range(0, 50, 10)]


def _cfg():
    return WriteConfig(
        record_key_field="id",
        partition_field="part",
        precombine_field="v",
        auto_clean=False,
        auto_archive=False,
    )


def _rows(t):
    return sorted(tuple(r) for r in t.snapshot().select("id", "part", "v").collect())


def _state(*batches):
    s = {(i, p): v for i, p, v in SEED}
    for b in batches:
        for i, p, v in b:
            s[(i, p)] = v
    return sorted((i, p, v) for (i, p), v in s.items())


def _batch_commits(t, key, qname=None):
    """Completed commits carrying the given metadata key (and query)."""
    out = []
    for ts, _, md in t.view().commits:
        extra = md.get("extra", {})
        if key in extra:
            if qname is not None and extra.get("streaming.query.id") != qname:
                continue
            out.append((ts, extra[key]))
    return out


def test_sink_crash_replay_exactly_once(spark, tmp_path):
    pristine = str(tmp_path / "pristine")
    t = HudiTable.create(spark, pristine, _cfg())
    t.bulk_insert(_df(spark, SEED))

    def clone(tag):
        dst = str(tmp_path / tag)
        shutil.copytree(pristine, dst)
        return dst

    # reference run → mutation count
    ref_dir = clone("ref")
    ref = HudiTable.load(spark, ref_dir)
    counter = _install(ref)
    fn = _foreach_batch(ref, "upsert", "q1", retries=1, on_commit=None)
    fn(_df(spark, B0), 0)
    total = counter.n
    assert total > 0
    shutil.rmtree(ref_dir)

    for n in range(1, total + 1):
        d = clone(f"crash{n}")
        victim = HudiTable.load(spark, d)
        _install(victim, crash_at=n)
        commits = []
        vfn = _foreach_batch(
            victim, "upsert", "q1", retries=1, on_commit=commits.append
        )
        try:
            vfn(_df(spark, B0), 0)
        except SimulatedCrash:
            pass
        # restart: Spark replays batch 0 from the checkpoint into a
        # fresh sink instance over a clean table handle
        h = HudiTable.load(spark, d)
        commits2 = []
        rfn = _foreach_batch(h, "upsert", "q1", retries=3, on_commit=commits2.append)
        rfn(_df(spark, B0), 0)
        h2 = HudiTable.load(spark, d)
        assert _rows(h2) == _state(B0), f"crash@{n}: batch 0 not exactly-once"
        recorded = _batch_commits(h2, BATCH_ID_KEY, "q1")
        assert len(recorded) == 1 and recorded[0][1] == "0", (
            f"crash@{n}: batch id recorded {recorded}"
        )
        # the caller MUST hear about the committed instant exactly once
        # per sink instance (code-review r7: a durable commit the caller
        # never hears about silently skips offset publishing)
        assert commits2 == [recorded[0][0]], (
            f"crash@{n}: replay on_commit fired {commits2}"
        )
        # next batch progresses
        rfn(_df(spark, B1), 1)
        assert _rows(HudiTable.load(spark, d)) == _state(B0, B1)
        shutil.rmtree(d)


def test_sink_replay_of_committed_batch_is_skipped(spark, tmp_path):
    """Code-review r7: the crash loop always crashes BEFORE the commit
    lands, so the committed-then-restart replay path (canSkipBatch) needs
    its own case — a replayed committed batch must be a pure no-op that
    commits nothing new."""
    d = str(tmp_path / "t")
    t = HudiTable.create(spark, d, _cfg())
    t.bulk_insert(_df(spark, SEED))
    fn = _foreach_batch(t, "upsert", "q1", retries=1, on_commit=None)
    fn(_df(spark, B0), 0)
    before = _batch_commits(t, BATCH_ID_KEY, "q1")
    assert len(before) == 1
    # process restart: fresh handle + fresh sink, Spark replays batch 0
    h = HudiTable.load(spark, d)
    replay_commits = []
    rfn = _foreach_batch(h, "upsert", "q1", retries=3, on_commit=replay_commits.append)
    rfn(_df(spark, B0), 0)
    after = HudiTable.load(spark, d)
    assert _batch_commits(after, BATCH_ID_KEY, "q1") == before, (
        "replay of a committed batch wrote a second commit"
    )
    assert _rows(after) == _state(B0)
    # the skip path RE-publishes the committed instant: a fresh sink
    # instance cannot know whether its crashed predecessor got to
    # publish, and a durable commit the caller never hears about
    # silently skips offset publishing (idempotent re-publish is the
    # safe side)
    assert replay_commits == [before[0][0]]


def test_delta_streamer_replay_after_committed_pull(spark, tmp_path):
    """Code-review r7: resume after a pull COMMITTED (crash only after
    the commit point) — the next sync must move to the NEXT source
    commit, never re-apply c001."""
    src = str(tmp_path / "src")
    _df(spark, B0).write.parquet(f"{src}/c001")
    _df(spark, B1).write.parquet(f"{src}/c002")
    d = str(tmp_path / "t")
    t = HudiTable.create(spark, d, _cfg())
    t.bulk_insert(_df(spark, SEED))
    DeltaStreamer(spark, t, src, source_format="incr_pull").sync_once()
    # restart: fresh streamer resumes from the recorded checkpoint
    h = HudiTable.load(spark, d)
    s = DeltaStreamer(spark, h, src, source_format="incr_pull")
    s.sync_once()
    final = HudiTable.load(spark, d)
    assert _rows(final) == _state(B0, B1)
    assert [c for _, c in _batch_commits(final, CHECKPOINT_KEY)] == [
        "c001",
        "c002",
    ], "resume re-applied or skipped a committed pull"
    assert s.sync_once() is None  # drained


def test_delta_streamer_crash_resume_exactly_once(spark, tmp_path):
    # DFS-commit-dir source: one source commit dir per pull, checkpoint
    # = last consumed commit dir (incr_pull layout keeps pulls discrete)
    src = str(tmp_path / "src")
    _df(spark, B0).write.parquet(f"{src}/c001")
    _df(spark, B1).write.parquet(f"{src}/c002")

    pristine = str(tmp_path / "pristine")
    t = HudiTable.create(spark, pristine, _cfg())
    t.bulk_insert(_df(spark, SEED))

    def clone(tag):
        dst = str(tmp_path / tag)
        shutil.copytree(pristine, dst)
        return dst

    def streamer(table):
        return DeltaStreamer(spark, table, src, source_format="incr_pull")

    ref_dir = clone("ref")
    ref = HudiTable.load(spark, ref_dir)
    counter = _install(ref)
    streamer(ref).sync_once()
    total = counter.n
    assert total > 0
    shutil.rmtree(ref_dir)

    for n in range(1, total + 1):
        d = clone(f"crash{n}")
        victim = HudiTable.load(spark, d)
        _install(victim, crash_at=n)
        try:
            streamer(victim).sync_once()
        except SimulatedCrash:
            pass
        # resume: a fresh streamer over a clean handle re-pulls from the
        # recorded checkpoint (write start sweeps the crashed attempt)
        h = HudiTable.load(spark, d)
        streamer(h).sync_once()
        h2 = HudiTable.load(spark, d)
        state = _rows(h2)
        ckpts = _batch_commits(h2, CHECKPOINT_KEY)
        seen = [c for _, c in ckpts]
        if state == _state(B0):
            # crash hit before the first pull committed → resume applied
            # c001 exactly once
            assert seen == ["c001"], f"crash@{n}: checkpoints {seen}"
        else:
            # the first pull had committed before the crash → resume
            # moved on to c002; neither pull dropped nor doubled
            assert state == _state(B0, B1), f"crash@{n}: torn {state[:4]}..."
            assert seen == ["c001", "c002"], f"crash@{n}: checkpoints {seen}"
        # drain the rest; a second drain is a no-op
        s = streamer(HudiTable.load(spark, d))
        while s.sync_once() is not None:
            pass
        final = HudiTable.load(spark, d)
        assert _rows(final) == _state(B0, B1)
        assert [c for _, c in _batch_commits(final, CHECKPOINT_KEY)] == [
            "c001",
            "c002",
        ], f"crash@{n}: duplicate or dropped pull"
        shutil.rmtree(d)
