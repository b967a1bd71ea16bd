"""Expired-lock recovery must be single-recoverer (r8): a live recovery
claim blocks rival takers from moving the lock file aside, so a taker
acting on a stale "expired" read can never steal the fresh lock a rival
recovery just installed (the dual-hold caught under full-suite load)."""

import json
import time

from hudi_0_10_0_spark.concurrency import FileSystemLockProvider
from hudi_0_10_0_spark.fs import FS


def _expired_lock(fs, meta):
    fs.mkdirs(f"{meta}/locks")
    fs.write_text(
        f"{meta}/locks/table.lock",
        json.dumps({"owner": "dead", "acquired_at": time.time() - 10_000}),
    )


def test_live_recovery_claim_blocks_rival_takers(spark, tmp_table_path):
    fs = FS(spark, tmp_table_path)
    meta = f"{tmp_table_path}/_hoodie_meta"
    _expired_lock(fs, meta)
    # a rival recovery is mid-flight: its claim file exists and is fresh
    fs.write_text(
        f"{meta}/locks/table.lock.recovery",
        json.dumps({"by": "rival", "at": time.time()}),
    )
    lp = FileSystemLockProvider(fs, meta, ttl_seconds=3600.0)
    assert not lp.try_lock("latecomer")
    # the expired lock file was NOT moved aside by the blocked taker
    held = json.loads(fs.read_text(f"{meta}/locks/table.lock"))
    assert held["owner"] == "dead"


def test_stale_recovery_claim_is_age_gated_then_recoverable(spark, tmp_table_path):
    fs = FS(spark, tmp_table_path)
    meta = f"{tmp_table_path}/_hoodie_meta"
    _expired_lock(fs, meta)
    # a crashed recoverer's leftover claim: backdate its mtime past the gate
    import os

    claim = f"{meta}/locks/table.lock.recovery"
    fs.write_text(claim, json.dumps({"by": "crashed", "at": time.time() - 10_000}))
    old = time.time() - 10_000
    os.utime(claim, (old, old))
    lp = FileSystemLockProvider(fs, meta, ttl_seconds=3600.0)
    # first attempt clears the stale claim (and does not acquire) ...
    assert not lp.try_lock("taker")
    assert not fs.exists(claim)
    # ... the next poll recovers the expired lock normally
    assert lp.try_lock("taker")
    held = json.loads(fs.read_text(f"{meta}/locks/table.lock"))
    assert held["owner"] == "taker"
    # and the claim never outlives the recovery
    assert not fs.exists(claim)
