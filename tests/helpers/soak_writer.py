"""Subprocess worker for the randomized multi-writer + inline-services
soak (tests/test_concurrency.py::test_multi_writer_services_soak).

Usage: python soak_writer.py <table_path> <writer_id> <n_writers> \
           <barrier_dir> <iters> <keys_per_writer>

Each writer owns a DISJOINT key range (wid*1_000_000 ...) but spreads
its keys over SHARED partitions (key % 4), so concurrent commits can
land in the same file groups and the OCC overlap check must arbitrate.
Per iteration the writer upserts a random-ish (seeded, deterministic)
subset of its keys with v = iteration, occasionally deletes a few, and
retries on ConcurrentWriteConflictError. auto_clean/auto_archive run
inline on every commit; one writer (wid 0) also schedules+runs
CLUSTERING mid-soak and COMPACTION on a MOR-like cadence, so services
interleave with rival commits throughout.

Exits 0 when all its keys' final expected state is also what it reads
back; prints PER-KEY expectation lines the parent folds into the global
audit: `EXPECT <id> <v|DEAD>`.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

path, wid_s, n_writers_s, barrier, iters_s, keys_s = sys.argv[1:7]
wid, iters, n_keys = int(wid_s), int(iters_s), int(keys_s)

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .appName(f"soak-writer-{wid}")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from hudi_0_10_0_spark import HudiTable
from hudi_0_10_0_spark.concurrency import (
    ConcurrentWriteConflictError,
    LockTimeoutError,
)

t = HudiTable.load(spark, path)
base = wid * 1_000_000
my_keys = list(range(base, base + n_keys))

# start barrier: all writers load the table before anyone commits
open(os.path.join(barrier, f"ready-{wid}"), "w").write("")
deadline = time.time() + 180
while len([n for n in os.listdir(barrier) if n.startswith("ready-")]) < int(n_writers_s):
    if time.time() > deadline:
        raise RuntimeError("soak barrier timeout")
    time.sleep(0.05)


def _transient_read_race(e: BaseException) -> bool:
    """A rival's inline clean can physically delete files between a
    read's plan and its execution (3 writers × clean-on-every-commit ×
    cleaner_commits_retained=4 — the soak's deliberately aggressive
    shape). The reference behaves identically (FileNotFoundException
    from the executor scan); the remedy there and here is a retry from
    a FRESH view. Only the vanished-file signatures qualify — anything
    else (wrong results, corrupt data) must still fail the audit.

    Guard against masking real clean bugs (advice r7): the signature
    alone is NOT enough — a clean that deletes a file the LATEST view
    still references is a retention violation, not a race, and would
    otherwise pattern-match here and get silently retried. So extract
    the vanished path(s) from the message and require that a FRESH
    view (timeline re-listed, cache invalidated by the rival's commit)
    no longer references any of them; if the latest view still claims
    the file, fail hard."""
    s = str(e)
    if not any(
        m in s
        for m in (
            "FileNotFoundException",
            "does not exist",
            "ChecksumFileSystem",
            "ChecksumFSInputChecker",
        )
    ):
        return False
    import re

    vanished = re.findall(r"(/[^\s'\"():]+\.(?:parquet|orc))", s)
    vanished += re.findall(r"(/[^\s'\"():]+\.log\.\d+[^\s'\"():]*)", s)
    if not vanished:
        # signature matched but no parsable data-file path (e.g. a
        # directory listing race) — treat as transient, the audit at
        # the end still verifies every key's final value
        return True
    try:
        still = t.view().all_referenced_paths()  # RELATIVE to table base
    except Exception:  # noqa: BLE001 - view rebuild itself racing; retry
        return True
    for p in set(vanished):
        if any(p.endswith("/" + rel) for rel in still):
            raise AssertionError(
                f"clean deleted {p} while the LATEST view still "
                "references it — retention violation, not a read race"
            ) from e
    return True


def _retry(fn, what):
    # OCC conflicts are EXPECTED under shared-file-group contention: the
    # loser re-plans against the fresh view and tries again. Every
    # conflict round has a committed winner, so global progress is
    # guaranteed; a generous cap only bounds true livelock. The re-plan
    # itself is seconds of work — the jittered sleep just de-synchronizes
    # the round.
    for attempt in range(60):
        try:
            return fn()
        except (ConcurrentWriteConflictError, LockTimeoutError):
            time.sleep(0.05 + 0.07 * (wid + 1) * min(attempt, 4))
        except Exception as e:  # noqa: BLE001 - filtered just below
            if not _transient_read_race(e):
                raise
            time.sleep(0.05 + 0.07 * (wid + 1) * min(attempt, 4))
    raise RuntimeError(f"{what}: still conflicting after 60 retries")


alive = {}  # id -> last v
dead = set()
for it in range(1, iters + 1):
    # deterministic pseudo-random subset: every 1st/2nd/3rd key by round
    subset = [k for k in my_keys if (k + it) % 3 != 0]
    rows = [(k, f"p{k % 4}", it) for k in subset]
    df = spark.createDataFrame(rows, "id long, part string, v long")
    _retry(lambda: t.upsert(df), f"w{wid} upsert it{it}")
    for k in subset:
        alive[k] = it
        dead.discard(k)
    if it % 4 == 0:
        victims = [k for k in subset[:3]]
        del_df = spark.createDataFrame(
            [(k, f"p{k % 4}") for k in victims], "id long, part string"
        )
        _retry(lambda: t.delete(del_df), f"w{wid} delete it{it}")
        for k in victims:
            alive.pop(k, None)
            dead.add(k)
    if wid == 0 and it == max(2, iters // 2):
        # services under contention: clustering replaces file groups and
        # must go through the same OCC gate as rival commits
        _retry(lambda: t.cluster(), f"w{wid} cluster it{it}")
    if wid == 0 and it == iters - 1:
        _retry(lambda: t.compact(), f"w{wid} compact it{it}")

# self-audit: read back own keys (retried like every other read — a
# rival's clean may still be racing this writer's final snapshot)
def _read_own():
    snap = t.snapshot().filter(f"id >= {base} AND id < {base + n_keys}")
    return {r.id: r.v for r in snap.select("id", "v").collect()}


got = _retry(_read_own, f"w{wid} final audit read")
errs = []
for k, v in alive.items():
    if got.get(k) != v:
        errs.append(f"key {k}: expected v={v} got {got.get(k)}")
for k in dead:
    if k in got:
        errs.append(f"key {k}: expected DEAD, got v={got[k]}")
if errs:
    print("AUDIT-FAIL " + "; ".join(errs[:10]))
    sys.exit(3)
for k, v in sorted(alive.items()):
    print(f"EXPECT {k} {v}")
for k in sorted(dead):
    print(f"EXPECT {k} DEAD")
print("DONE")
sys.exit(0)
