"""Bloom-filter membership pruning for the BLOOM / GLOBAL_BLOOM index
(operators/bloom.py — the membership half of HoodieBloomIndex, r8).

The decisive case is INTERLEAVED keys: every file group's [min,max] key
range spans the whole key space, so range pruning keeps everything and
only the bloom filters can bound the index scan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hudi_0_10_0_spark import HudiTable, WriteConfig
from hudi_0_10_0_spark.config import (
    PARTITION_PATH_COL,
    RECORD_KEY_COL,
    TableType,
)
from hudi_0_10_0_spark.operators import bloom as B


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, part string, v long")


# ids alternate partitions → every group's key range spans the space
SEED = [(i, f"p{i % 2}", i) for i in range(200)]


def _cfg(**kw):
    base = dict(
        record_key_field="id",
        partition_field="part",
        precombine_field="v",
        index_type="GLOBAL_BLOOM",
        bloom_prune_min_bytes=0,  # force the filter stage on tiny fixtures
        auto_clean=False,
        auto_archive=False,
    )
    base.update(kw)
    return WriteConfig(**base)


def test_size_filter_sane():
    m, k = B._size_filter(1000, 0.01)
    assert m % 8 == 0 and m >= 9000 and 5 <= k <= 9
    m1, k1 = B._size_filter(0, 0.01)
    assert m1 >= 64 and k1 >= 1


def test_sidecar_written_and_prunes_interleaved_groups(spark, tmp_table_path):
    t = HudiTable.create(spark, tmp_table_path + "/g", _cfg())
    t.bulk_insert(_df(spark, SEED))
    inst = t.timeline.completed_write_instants()[-1].timestamp
    assert t.fs.exists(B.sidecar_path(t, inst))
    slices = t.view().latest_file_slices()
    assert len(slices) >= 2
    # ranges interleave: every slice straddles key "50" lexicographically
    incoming = spark.createDataFrame(
        [("51", "p1")], f"{RECORD_KEY_COL} string, {PARTITION_PATH_COL} string"
    )
    pruned = B.prune_slices(t, incoming, slices, global_idx=True)
    # id 51 is odd → lives in p1's group only; p0's group bloom-misses
    assert {s.partition for s in pruned} == {"p1"}
    assert len(pruned) < len(slices)
    # an absent key prunes everything (pure insert: no index scan at all)
    nothing = B.prune_slices(
        t,
        spark.createDataFrame(
            [("zzz-not-there", "p0")],
            f"{RECORD_KEY_COL} string, {PARTITION_PATH_COL} string",
        ),
        slices,
        global_idx=True,
    )
    assert nothing == []


def test_upsert_delete_correct_with_filters(spark, tmp_table_path):
    """End-to-end: tag → merge through the bloom-pruned index equals the
    plain-oracle expectation (no false negatives ever)."""
    t = HudiTable.create(spark, tmp_table_path + "/e2e", _cfg())
    t.bulk_insert(_df(spark, SEED))
    oracle = {i: v for i, v, in ((i, i) for i, _, _ in SEED)}
    upd = [(i, f"p{i % 2}", i + 1000) for i in range(0, 200, 7)]
    t.upsert(_df(spark, upd))
    for i, _, v in upd:
        oracle[i] = v
    dels = [(i, f"p{i % 2}", 0) for i in range(3, 200, 50)]
    t.delete(_df(spark, dels).select("id"))
    for i, _, _ in dels:
        oracle.pop(i)
    got = {r["id"]: r["v"] for r in t.snapshot().select("id", "v").collect()}
    assert got == oracle


def test_mor_log_keys_never_false_negative(spark, tmp_table_path):
    """MOR: updates live in logs (no new bloom rows) but their keys are
    in the group's BASE filter by construction — re-upserting them must
    tag, not duplicate."""
    t = HudiTable.create(
        spark,
        tmp_table_path + "/mor",
        _cfg(table_type=TableType.MERGE_ON_READ, inline_compact=False),
    )
    t.bulk_insert(_df(spark, SEED))
    upd = [(i, f"p{i % 2}", i + 1000) for i in range(0, 200, 5)]
    t.upsert(_df(spark, upd))
    t.upsert(_df(spark, [(i, p, v + 1) for i, p, v in upd]))
    snap = t.snapshot()
    assert snap.count() == len(SEED)  # no duplicates
    got = {r["id"]: r["v"] for r in snap.select("id", "v").collect()}
    for i, _, v in upd:
        assert got[i] == v + 1


def test_missing_sidecar_disables_pruning_not_correctness(spark, tmp_table_path):
    t = HudiTable.create(spark, tmp_table_path + "/nos", _cfg())
    t.bulk_insert(_df(spark, SEED))
    t.fs.delete(B.blooms_dir(t), recursive=True)
    slices = t.view().latest_file_slices()
    incoming = spark.createDataFrame(
        [("51", "p1")], f"{RECORD_KEY_COL} string, {PARTITION_PATH_COL} string"
    )
    # nothing prunable → everything kept
    assert len(B.prune_slices(t, incoming, slices, global_idx=True)) == len(slices)
    # and the write path still works end-to-end
    t.upsert(_df(spark, [(51, "p1", 9999)]))
    got = {r["id"]: r["v"] for r in t.snapshot().select("id", "v").collect()}
    assert got[51] == 9999 and len(got) == len(SEED)


def test_virtual_keys_skip_sidecar_build(spark, tmp_table_path):
    t = HudiTable.create(
        spark, tmp_table_path + "/vk", _cfg(populate_meta_fields=False)
    )
    t.bulk_insert(_df(spark, SEED))
    assert not (t.fs.list_names(B.blooms_dir(t)) or [])
    t.upsert(_df(spark, [(7, "p1", 7777)]))
    got = {r["id"]: r["v"] for r in t.snapshot().select("id", "v").collect()}
    assert got[7] == 7777 and len(got) == len(SEED)


def test_max_keys_gate_skips_membership_stage(spark, tmp_table_path):
    """Above bloom_prune_max_keys the membership stage must be skipped
    (range-pruned candidates returned unchanged) — the per-group hash
    rows would otherwise grow O(batch) — and the upsert stays correct."""
    t = HudiTable.create(
        spark, tmp_table_path + "/cap", _cfg(bloom_prune_max_keys=10)
    )
    t.bulk_insert(_df(spark, SEED))
    slices = t.view().latest_file_slices()
    incoming = spark.createDataFrame(
        [(str(i), f"p{i % 2}") for i in range(40)],
        f"{RECORD_KEY_COL} string, {PARTITION_PATH_COL} string",
    )
    assert B.prune_slices(t, incoming, slices, global_idx=True) == slices
    # and below the cap the stage still prunes
    one = spark.createDataFrame(
        [("absent-xyz", "p0")], f"{RECORD_KEY_COL} string, {PARTITION_PATH_COL} string"
    )
    assert B.prune_slices(t, one, slices, global_idx=True) == []
    t.upsert(_df(spark, [(i, f"p{i % 2}", i + 5000) for i in range(40)]))
    got = {r["id"]: r["v"] for r in t.snapshot().select("id", "v").collect()}
    assert got[39] == 5039 and len(got) == len(SEED)


def test_clean_gc_drops_unreferenced_sidecars(spark, tmp_table_path):
    t = HudiTable.create(
        spark,
        tmp_table_path + "/gc",
        _cfg(auto_clean=True, cleaner_commits_retained=2),
    )
    t.bulk_insert(_df(spark, SEED))
    for gen in range(4):  # COW rewrites → old versions + old sidecars
        t.upsert(_df(spark, [(i, f"p{i % 2}", i + (gen + 1) * 1000) for i in range(0, 200, 3)]))
    names = set(t.fs.list_names(B.blooms_dir(t)) or [])
    referenced = {
        b.instant for g in t.view().groups.values() for b in g.bases
    }
    assert names == {f"{i}.parquet" for i in referenced}, (
        "sidecars must be exactly the instants still referenced by "
        f"retained base versions: {sorted(names)} vs {sorted(referenced)}"
    )
    # correctness after GC
    got = {r["id"]: r["v"] for r in t.snapshot().select("id", "v").collect()}
    assert got[0] == 4000


def test_fp_rate_bounded(spark, tmp_table_path):
    """Statistical: at fpp=0.01, absent keys must prune ≫ 90% of
    non-matching groups (double hashing keeps close to the target)."""
    t = HudiTable.create(spark, tmp_table_path + "/fp", _cfg(bloom_index_fpp=0.01))
    t.bulk_insert(_df(spark, SEED))
    slices = t.view().latest_file_slices()
    absent = spark.createDataFrame(
        [(f"absent-{j}", "p0") for j in range(200)],
        f"{RECORD_KEY_COL} string, {PARTITION_PATH_COL} string",
    )
    pruned = B.prune_slices(t, absent, slices, global_idx=True)
    # 200 absent keys × 100-key filters at 1% fpp: expected ~2 false
    # hits per group; allow every group a hit but require the PAIR mass
    # to be tiny is unobservable here — instead require that a SINGLE
    # absent key prunes everything
    one = B.prune_slices(
        t,
        spark.createDataFrame(
            [("absent-xyz", "p0")],
            f"{RECORD_KEY_COL} string, {PARTITION_PATH_COL} string",
        ),
        slices,
        global_idx=True,
    )
    assert one == []
    assert len(pruned) <= len(slices)


def test_stale_sidecar_row_does_not_resurrect_rewritten_group(spark, tmp_table_path):
    """Review r8: a rewritten group must be tested against the filter
    its CURRENT base wrote, not a stale row for the same file_id from an
    older sidecar (which may contain since-deleted keys)."""
    t = HudiTable.create(spark, tmp_table_path + "/stale", _cfg())
    t.bulk_insert(_df(spark, SEED))  # sidecar I0 covers both groups
    # delete key 51 → COW rewrites p1's group at I1 (its filter drops 51);
    # p0's group still references I0, so BOTH sidecars stay loaded
    t.delete(_df(spark, [(51, "p1", 0)]).select("id"))
    slices = t.view().latest_file_slices()
    insts = {s.base.instant for s in slices}
    assert len(insts) == 2, insts  # mixed-instant candidate set
    incoming = spark.createDataFrame(
        [("51", "p1")], f"{RECORD_KEY_COL} string, {PARTITION_PATH_COL} string"
    )
    pruned = B.prune_slices(t, incoming, slices, global_idx=True)
    # 51 was deleted: no current filter contains it → nothing to scan
    # (with the stale I0 row matched by file_id alone, p1's group would
    # wrongly survive here)
    assert pruned == []
    # correctness: re-inserting the key lands as a fresh insert
    t.upsert(_df(spark, [(51, "p1", 4242)]))
    got = {r["id"]: r["v"] for r in t.snapshot().select("id", "v").collect()}
    assert got[51] == 4242 and len(got) == len(SEED)


def test_corrupt_sidecar_degrades_to_unpruned(spark, tmp_table_path):
    """Review r8: a corrupt sidecar parquet must disable pruning (the
    schema'd read is lazy, so the error surfaces at job time), never
    fail the write path."""
    t = HudiTable.create(spark, tmp_table_path + "/corrupt", _cfg())
    t.bulk_insert(_df(spark, SEED))
    inst = t.timeline.completed_write_instants()[-1].timestamp
    side = B.sidecar_path(t, inst)
    names = [n for n in t.fs.list_names(side) if n.endswith(".parquet")]
    assert names
    t.fs.write_text(f"{side}/{names[0]}", "NOT A PARQUET FILE")
    slices = t.view().latest_file_slices()
    incoming = spark.createDataFrame(
        [("zzz-not-there", "p0")],
        f"{RECORD_KEY_COL} string, {PARTITION_PATH_COL} string",
    )
    # absent key would normally prune everything; corruption → keep all
    assert B.prune_slices(t, incoming, slices, global_idx=True) == slices
    # and the write path end-to-end still works
    t.upsert(_df(spark, [(51, "p1", 1234)]))
    assert {r["id"]: r["v"] for r in t.snapshot().select("id", "v").collect()}[51] == 1234


def test_mor_update_only_deltacommit_skips_sidecar(spark, tmp_table_path):
    """Review r8: an update-only MOR deltacommit writes only log rows
    whose keys are already in their base's filter — no empty per-commit
    sidecar debris."""
    t = HudiTable.create(
        spark,
        tmp_table_path + "/morskip",
        _cfg(table_type=TableType.MERGE_ON_READ, inline_compact=False),
    )
    t.bulk_insert(_df(spark, SEED))
    before = set(t.fs.list_names(B.blooms_dir(t)) or [])
    t.upsert(_df(spark, [(i, f"p{i % 2}", i + 1000) for i in range(0, 200, 5)]))
    after = set(t.fs.list_names(B.blooms_dir(t)) or [])
    assert after == before, "update-only deltacommit must not write a sidecar"
    # a deltacommit WITH inserts does build one (new base groups)
    t.upsert(_df(spark, [(9_000 + i, f"p{i % 2}", i) for i in range(5)]))
    assert len(set(t.fs.list_names(B.blooms_dir(t)))) == len(before) + 1


def test_gc_keeps_pending_instants_sidecar(spark, tmp_table_path):
    """Review r8: clean's sidecar GC must treat PENDING instants as
    referenced — a rival writer mid-commit has built its sidecar before
    its bases appear in the view."""
    t = HudiTable.create(spark, tmp_table_path + "/gcp", _cfg())
    t.bulk_insert(_df(spark, SEED))
    # simulate a rival mid-commit: requested instant + built sidecar
    rival = "99990101000000000"
    t.timeline.create_requested(rival, "commit")
    t.fs.mkdirs(B.sidecar_path(t, rival))
    t.fs.write_text(f"{B.sidecar_path(t, rival)}/part-0.parquet", "x")
    deleted = B.gc_sidecars(t, t.view())
    assert t.fs.exists(B.sidecar_path(t, rival)), "pending sidecar GC'd"
    # and a genuinely orphaned sidecar IS collected
    t.fs.mkdirs(B.sidecar_path(t, "11110101000000000"))
    t.fs.write_text(
        f"{B.sidecar_path(t, '11110101000000000')}/part-0.parquet", "x"
    )
    assert B.gc_sidecars(t, t.view()) >= 1
    assert not t.fs.exists(B.sidecar_path(t, "11110101000000000"))
