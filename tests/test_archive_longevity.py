"""Archived-timeline longevity soak (VERDICT r3 #6): enough write
traffic to archive MULTIPLE batches, with a simulated crash between an
archive batch write and its active-file deletes mid-soak, asserting
snapshot / incremental / time-travel stay model-consistent throughout.

Reference: ``HoodieTimelineArchiveLog`` (archive band), plus the r3
self-heal in ``timeline.py`` — instants already present in an archive
batch are not re-serialized, only their residual active files removed.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import types as T

from hudi_0_10_0_spark import HudiTable, WriteConfig
from hudi_0_10_0_spark.config import TableType

# soak/crash-matrix profile: deselected by the default (driver) fast
# profile, run with HUDI_FULL_SUITE=1 (see tests/conftest.py)
pytestmark = pytest.mark.soak

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("part", T.StringType()),
        T.StructField("v", T.LongType()),
        T.StructField("ts", T.LongType()),
    ]
)

PARTS = ["p0", "p1"]
KEYS = list(range(30))


def _rows(rng, n, ts):
    out = {}
    for _ in range(n):
        k = rng.choice(KEYS)
        out[k] = (k, rng.choice(PARTS), rng.randrange(1000), ts)
    return list(out.values())


def _apply(model, rows, op):
    for (k, p, v, ts) in rows:
        if op == "delete":
            model.pop((k, p), None)
        else:
            model[(k, p)] = (k, p, v, ts)


def _snap_dict(df):
    return {
        (r["id"], r["part"]): (r["id"], r["part"], r["v"], r["ts"])
        for r in df.select("id", "part", "v", "ts").collect()
    }


@pytest.mark.slow
@pytest.mark.parametrize("table_type", [TableType.COPY_ON_WRITE, TableType.MERGE_ON_READ],
                         ids=["cow", "mor"])
def test_archive_multi_batch_with_crash_repair(spark, tmp_table_path, table_type, monkeypatch):
    rng = random.Random(99)
    cfg = WriteConfig(
        record_key_field="id",
        partition_field="part",
        precombine_field="ts",
        table_type=table_type,
        keep_min_commits=4,
        keep_max_commits=6,
        inline_compact=(table_type == TableType.MERGE_ON_READ),
        auto_clean=False,     # old file versions stay readable → full audit
        auto_archive=False,   # archive invoked explicitly for crash control
    )
    t = HudiTable.create(spark, tmp_table_path, cfg)
    model: dict = {}
    history: list[tuple[str, dict]] = []

    init = _rows(rng, 20, ts=0)
    t.bulk_insert(spark.createDataFrame(init, SCHEMA))
    _apply(model, init, "insert")
    history.append((t.commits()[-1], dict(model)))

    from hudi_0_10_0_spark.timeline import Timeline

    crash_done = False
    for step in range(1, 25):
        if step % 3 == 0 and len(model) > 3:
            live = list(model.values())
            picked = [live[rng.randrange(len(live))] for _ in range(2)]
            t.delete(spark.createDataFrame(picked, SCHEMA).select("id", "part"))
            _apply(model, [(k, p, 0, 0) for (k, p, *_r) in picked], "delete")
        else:
            rows = _rows(rng, rng.randrange(2, 8), step)
            t.upsert(spark.createDataFrame(rows, SCHEMA))
            _apply(model, rows, "upsert")
        history.append((t.commits()[-1], dict(model)))

        if len(t.timeline.completed_write_instants()) > cfg.keep_max_commits:
            if not crash_done:
                # CRASH between the archive batch write and the active
                # deletes — after ONE active instant was already removed
                # (partial delete), the worst interleaving
                calls = {"n": 0}
                orig = Timeline.delete_instant_files

                def boom(self, ts, action, _orig=orig, _calls=calls):
                    _calls["n"] += 1
                    if _calls["n"] >= 2:
                        raise RuntimeError("simulated crash mid-archive")
                    return _orig(self, ts, action)

                monkeypatch.setattr(Timeline, "delete_instant_files", boom)
                with pytest.raises(RuntimeError, match="simulated crash"):
                    t.archive()
                monkeypatch.undo()
                crash_done = True
                # crashed archiver must not have corrupted reads: the
                # batch exists AND its instants are still (partly) active
                assert t.timeline.archived_instants()
            # continue: the next archive self-heals the residual overlap
            t.archive()

        got = _snap_dict(t.snapshot())
        assert got == model, (
            f"step {step}: drift extra={set(got) - set(model)} "
            f"missing={set(model) - set(got)}"
        )

    assert crash_done, "soak never reached the crash point — lower keep_max"
    batches = [
        n for n in t.fs.list_names(t.timeline.archive_dir)
        if n.endswith(".archive.jsonl")
    ]
    assert len(batches) >= 2, f"need multiple archive batches, got {batches}"
    # archived instants dedupe cleanly across overlapping batches
    arch = t.timeline.archived_instants()
    keys = [(a["timestamp"], a["action"]) for a in arch]
    assert len(keys) == len(set(keys))

    # incremental from the very beginning: begin predates the active
    # timeline → archived manifests fold in; latest state of every live
    # key appears
    inc = t.incremental(None)
    assert {(r["id"], r["part"]) for r in inc.select("id", "part").collect()} == set(model)
    # incremental from an ARCHIVED instant
    arch_ts = arch[0]["timestamp"]
    inc2 = t.incremental(arch_ts)
    assert inc2.count() > 0

    # time-travel audit across the soak (auto_clean off → every version
    # still on disk), including instants that are now archive-only
    by_ts: dict = {}
    for cts, m in history:
        by_ts[cts] = m
    active = {i.timestamp for i in t.timeline.completed_write_instants()}
    archived_only = [ts for ts in by_ts if ts not in active]
    sample = rng.sample(sorted(by_ts), min(4, len(by_ts)))
    if archived_only:
        sample.append(archived_only[-1])
    for cts in sample:
        got = _snap_dict(t.snapshot(as_of=cts))
        assert got == by_ts[cts], f"time travel to {cts} diverged"


@pytest.mark.slow
def test_archive_consolidation_preserves_views(spark, tmp_table_path):
    """``consolidate_archive`` merges every batch into ONE file and
    strips write_stats whose files the cleaner physically deleted
    (exactly the entries the view fold already skips). Snapshot,
    time-travel, archived dedup, and ancient-begin incremental (which
    must keep FALLING BACK — the stripped marker replaces the per-path
    cleaned check) are byte-identical before and after."""
    rng = random.Random(7)
    cfg = WriteConfig(
        record_key_field="id",
        partition_field="part",
        precombine_field="ts",
        keep_min_commits=4,
        keep_max_commits=6,
        auto_clean=True,           # cleaner retires old versions → strippable stats
        cleaner_commits_retained=2,
        auto_archive=False,        # archive driven explicitly below
        archive_merge_batches=1_000_000,  # no auto-consolidation mid-soak
    )
    t = HudiTable.create(spark, tmp_table_path, cfg)
    model: dict = {}
    init = _rows(rng, 20, ts=0)
    t.bulk_insert(spark.createDataFrame(init, SCHEMA))
    _apply(model, init, "insert")
    first_commit = t.commits()[-1]

    for step in range(1, 22):
        rows = _rows(rng, rng.randrange(2, 8), step)
        t.upsert(spark.createDataFrame(rows, SCHEMA))
        _apply(model, rows, "upsert")
        if len(t.timeline.completed_write_instants()) > cfg.keep_max_commits:
            t.archive()

    batches_before = [
        n for n in t.fs.list_names(t.timeline.archive_dir)
        if n.endswith(".archive.jsonl")
    ]
    assert len(batches_before) >= 3, batches_before
    arch_before = {
        (a["timestamp"], a["action"]) for a in t.timeline.archived_instants()
    }
    snap_before = _snap_dict(t.snapshot())
    inc_before = _snap_dict(t.incremental(first_commit))

    assert t.timeline.consolidate_archive(max_batches=1)

    batches_after = [
        n for n in t.fs.list_names(t.timeline.archive_dir)
        if n.endswith(".archive.jsonl")
    ]
    assert len(batches_after) == 1, batches_after
    arch = t.timeline.archived_instants()
    assert {(a["timestamp"], a["action"]) for a in arch} == arch_before
    # the cleaner retired versions in the archived band — stripping
    # must actually have happened (otherwise this test is vacuous)
    assert any(
        sd.get("stripped")
        for a in arch
        for sd in a["metadata"].get("write_stats", [])
    ), "no write_stats were strippable — raise the soak length"

    # FRESH loads (no per-process view cache): identical reads
    h = HudiTable.load(spark, tmp_table_path)
    assert _snap_dict(h.snapshot()) == snap_before == model
    assert _snap_dict(h.incremental(first_commit)) == inc_before
    # idempotent no-op below the threshold
    assert not h.timeline.consolidate_archive(max_batches=16)


@pytest.mark.slow
def test_archive_consolidation_crash_matrix(spark, tmp_table_path):
    """Crash consolidate_archive at EVERY fs-mutation point: reads and
    the archived-instant set must be invariant at every point (the
    consolidated superset is written before any batch delete; overlap
    windows dedup), and a retried consolidation converges to one file."""
    import shutil

    from test_crash_matrix import SimulatedCrash, _install

    rng = random.Random(3)
    cfg = WriteConfig(
        record_key_field="id",
        partition_field="part",
        precombine_field="ts",
        keep_min_commits=4,
        keep_max_commits=6,
        auto_clean=True,
        cleaner_commits_retained=2,
        auto_archive=True,
        archive_merge_batches=1_000_000,  # matrix drives it explicitly
    )
    pristine = tmp_table_path + "/pristine"
    t = HudiTable.create(spark, pristine, cfg)
    model: dict = {}
    init = _rows(rng, 20, ts=0)
    t.bulk_insert(spark.createDataFrame(init, SCHEMA))
    _apply(model, init, "insert")
    for step in range(1, 16):
        rows = _rows(rng, rng.randrange(2, 8), step)
        t.upsert(spark.createDataFrame(rows, SCHEMA))
        _apply(model, rows, "upsert")
    arch_set = {
        (a["timestamp"], a["action"]) for a in t.timeline.archived_instants()
    }
    assert len(arch_set) > 4

    # reference run → mutation count
    ref = HudiTable.load(spark, pristine + "")  # same dir is fine: copy next
    d0 = tmp_table_path + "/ref"
    shutil.copytree(pristine, d0)
    ref = HudiTable.load(spark, d0)
    proxy = _install(ref)
    assert ref.timeline.consolidate_archive(max_batches=1)
    total = proxy.n
    assert total > 0
    shutil.rmtree(d0)

    for n in range(1, total + 1):
        d = tmp_table_path + f"/crash{n}"
        shutil.copytree(pristine, d)
        victim = HudiTable.load(spark, d)
        _install(victim, crash_at=n)
        try:
            victim.timeline.consolidate_archive(max_batches=1)
            crashed = False
        except SimulatedCrash:
            crashed = True
        h = HudiTable.load(spark, d)
        got = {(a["timestamp"], a["action"]) for a in h.timeline.archived_instants()}
        assert got == arch_set, f"crash@{n}: archived set changed"
        assert _snap_dict(h.snapshot()) == model, f"crash@{n}: reads drifted"
        if crashed:
            h.timeline.consolidate_archive(max_batches=1)
            batches = [
                x for x in h.fs.list_names(h.timeline.archive_dir)
                if x.endswith(".archive.jsonl")
            ]
            assert len(batches) == 1, f"crash@{n}: retry did not converge"
            got2 = {
                (a["timestamp"], a["action"])
                for a in h.timeline.archived_instants()
            }
            assert got2 == arch_set
        shutil.rmtree(d)


def test_archive_consolidation_tiered(spark, tmp_table_path):
    """Tiered merge (code-review r7): once a big consolidated prefix
    exists, routine consolidation merges only the trailing small
    batches into a second-level file — the prefix is NOT re-read or
    rewritten (O(tail) per trigger, not O(all commits ever)) — until
    the tail has grown to the prefix's size, at which point one full
    merge folds everything (geometric amortization). Readers see the
    identical archived set at every step."""
    import json
    import os

    t = HudiTable.create(
        spark,
        tmp_table_path,
        WriteConfig(record_key_field="id", partition_field="part",
                    precombine_field="ts"),
    )
    tl = t.timeline
    arch = tl.archive_dir.replace("file:", "")
    os.makedirs(arch, exist_ok=True)

    def batch(i, n_records, pad=0):
        ts0 = f"{20200101000000000 + i * 1000:017d}"
        lines = []
        for j in range(n_records):
            ts = f"{int(ts0) + j:017d}"
            lines.append(json.dumps({
                "timestamp": ts, "action": "commit",
                "metadata": {"operation": "upsert",
                             "pad": "x" * pad, "write_stats": []},
            }, sort_keys=True))
        name = f"{ts0}_{int(ts0) + n_records - 1:017d}.archive.jsonl"
        with open(os.path.join(arch, name), "w") as f:
            f.write("\n".join(lines))
        return name

    # one big prefix (earlier full merge) + 17 small tail batches
    big = batch(0, 40, pad=2000)
    for i in range(1, 18):
        batch(i, 2)
    all_recs = {(a["timestamp"], a["action"]) for a in tl.archived_instants()}

    big_stat = os.stat(os.path.join(arch, big))
    reads = []
    orig_read = tl.fs.read_text
    tl.fs.read_text = lambda p: (reads.append(p), orig_read(p))[1]
    try:
        assert tl.consolidate_archive(max_batches=16)
    finally:
        tl.fs.read_text = orig_read
    names = sorted(n for n in os.listdir(arch) if n.endswith(".archive.jsonl"))
    assert len(names) == 2, names                      # prefix + ONE tail tier
    assert big in names, "big prefix was rewritten by a tail merge"
    # steady state (tail strictly newer than the prefix range): the
    # prefix is not even READ — the tiered trigger is O(tail) bytes
    assert not any(r.endswith(big) for r in reads), reads
    after_stat = os.stat(os.path.join(arch, big))
    assert (after_stat.st_mtime_ns, after_stat.st_size) == (
        big_stat.st_mtime_ns, big_stat.st_size), "prefix file was touched"
    assert {(a["timestamp"], a["action"]) for a in tl.archived_instants()} == all_recs

    # grow the tail past the prefix's size → the NEXT consolidation is
    # a full merge down to one file
    for i in range(18, 36):
        batch(i, 3, pad=3000)
    all_recs = {(a["timestamp"], a["action"]) for a in tl.archived_instants()}
    assert tl.consolidate_archive(max_batches=16)
    names = sorted(n for n in os.listdir(arch) if n.endswith(".archive.jsonl"))
    assert len(names) == 1, names
    assert {(a["timestamp"], a["action"]) for a in tl.archived_instants()} == all_recs


def test_archive_consolidation_converges_on_crash_leftovers(spark, tmp_table_path):
    """A crash between a full merge's consolidated write and its batch
    deletes leaves the originals as pure SUBSETS of the big file. The
    tiered retry must converge by deleting them — never by duplicating
    their records into a tail tier."""
    import json
    import os

    t = HudiTable.create(
        spark,
        tmp_table_path,
        WriteConfig(record_key_field="id", partition_field="part",
                    precombine_field="ts"),
    )
    tl = t.timeline
    arch = tl.archive_dir.replace("file:", "")
    os.makedirs(arch, exist_ok=True)

    recs = []
    for i in range(6):
        ts = f"{20200101000000000 + i:017d}"
        # the big file's copy carries the full metadata (padded so the
        # prefix dominates by size and the merge stays TIERED); the
        # leftover's copy is the same (timestamp, action) KEY — dedup
        # is by key, so it is a pure subset
        recs.append(json.dumps({
            "timestamp": ts, "action": "commit",
            "metadata": {"operation": "upsert", "pad": "x" * 2000,
                         "write_stats": []},
        }, sort_keys=True))
        with open(os.path.join(arch, f"{ts}_{ts}.archive.jsonl"), "w") as f:
            f.write(json.dumps({
                "timestamp": ts, "action": "commit",
                "metadata": {"operation": "upsert", "write_stats": []},
            }, sort_keys=True))
    big = f"{20200101000000000:017d}_{20200101000000005:017d}.archive.jsonl"
    with open(os.path.join(arch, big), "w") as f:
        f.write("\n".join(recs))

    before = {(a["timestamp"], a["action"]) for a in tl.archived_instants()}
    assert len(before) == 6
    assert tl.consolidate_archive(max_batches=2)
    names = [n for n in os.listdir(arch) if n.endswith(".archive.jsonl")]
    assert names == [big], names
    assert {(a["timestamp"], a["action"]) for a in tl.archived_instants()} == before


def test_archived_instants_retries_when_rival_consolidates(spark, tmp_table_path):
    """Lock-less readers race consolidation's batch deletes: a listed
    batch vanishing mid-read must trigger a fresh list+read pass (the
    merged superset is written BEFORE the deletes, so the retry sees
    every record), not crash the view build (code-review r7)."""
    import json
    import os

    t = HudiTable.create(
        spark,
        tmp_table_path,
        WriteConfig(record_key_field="id", partition_field="part",
                    precombine_field="ts"),
    )
    tl = t.timeline
    arch = tl.archive_dir.replace("file:", "")
    os.makedirs(arch, exist_ok=True)
    recs = []
    for i in range(4):
        ts = f"{20200101000000000 + i:017d}"
        rec = json.dumps({"timestamp": ts, "action": "commit",
                          "metadata": {"operation": "upsert",
                                       "write_stats": []}}, sort_keys=True)
        recs.append(rec)
        with open(os.path.join(arch, f"{ts}_{ts}.archive.jsonl"), "w") as f:
            f.write(rec)

    orig_read = tl.fs.read_text
    state = {"fired": False}

    def racy_read(p):
        if not state["fired"] and p.endswith(
            f"{20200101000000002:017d}_{20200101000000002:017d}.archive.jsonl"
        ):
            # rival consolidation: merged superset first, then deletes
            state["fired"] = True
            big = os.path.join(
                arch,
                f"{20200101000000000:017d}_{20200101000000003:017d}.archive.jsonl",
            )
            with open(big, "w") as f:
                f.write("\n".join(recs))
            for i in range(4):
                ts = f"{20200101000000000 + i:017d}"
                os.remove(os.path.join(arch, f"{ts}_{ts}.archive.jsonl"))
        return orig_read(p)

    tl.fs.read_text = racy_read
    try:
        got = {(a["timestamp"], a["action"]) for a in tl.archived_instants()}
    finally:
        tl.fs.read_text = orig_read
    assert state["fired"], "race never fired — test is vacuous"
    assert got == {(f"{20200101000000000 + i:017d}", "commit") for i in range(4)}


def test_consolidate_skips_batch_vanished_under_rival(spark, tmp_table_path):
    """A batch deleted by a rival consolidation between our listing and
    our read is SKIPPED (its records live in the rival's superset file),
    never raised, and never deleted by us (code-review r7)."""
    import json
    import os

    t = HudiTable.create(
        spark,
        tmp_table_path,
        WriteConfig(record_key_field="id", partition_field="part",
                    precombine_field="ts"),
    )
    tl = t.timeline
    arch = tl.archive_dir.replace("file:", "")
    os.makedirs(arch, exist_ok=True)
    for i in range(5):
        ts = f"{20200101000000000 + i:017d}"
        with open(os.path.join(arch, f"{ts}_{ts}.archive.jsonl"), "w") as f:
            f.write(json.dumps({"timestamp": ts, "action": "commit",
                                "metadata": {"operation": "upsert",
                                             "write_stats": []}},
                               sort_keys=True))
    victim = f"{20200101000000001:017d}_{20200101000000001:017d}.archive.jsonl"

    orig_read = tl.fs.read_text
    fired = {"n": 0}

    def read(p):
        # the rival deletes the victim AFTER our listing/size pass saw
        # it and right before we read it — the exact race window
        if p.endswith(victim) and fired["n"] == 0:
            fired["n"] = 1
            os.remove(os.path.join(arch, victim))
        return orig_read(p)

    tl.fs.read_text = read
    try:
        assert tl.consolidate_archive(max_batches=2)
    finally:
        tl.fs.read_text = orig_read
    assert fired["n"] == 1, "race never fired — test is vacuous"
    got = {a["timestamp"] for a in tl.archived_instants()}
    # the four surviving records were merged; the vanished record is
    # NOT resurrected by us (it lives in the rival's superset file)
    assert got == {f"{20200101000000000 + i:017d}" for i in (0, 2, 3, 4)}
