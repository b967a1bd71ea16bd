"""Subprocess worker for the process-level OCC stress test
(tests/test_concurrency.py::test_occ_two_processes_filesystem_lock).

Usage: python occ_writer.py <table_path> <writer_id> <other_id> \
           <barrier_dir> <partition> <key_lo> <key_hi> <value>

Loads the shared table with the FILESYSTEM lock provider, upserts
[key_lo, key_hi) into <partition>, and uses a file barrier to guarantee
BOTH processes' transactions begin before either commits — the same
latch trick the reference's TestHoodieClientMultiWriter uses. Exits 0
on commit, 42 on ConcurrentWriteConflictError.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

path, writer_id, other_id, barrier, part, lo, hi, val = sys.argv[1:9]

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .appName(f"occ-writer-{writer_id}")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from hudi_0_10_0_spark import HudiTable
from hudi_0_10_0_spark.concurrency import (
    ConcurrentWriteConflictError,
    LockTimeoutError,
)
from hudi_0_10_0_spark.operators import write as write_mod

_orig_marker = write_mod.txn_start_marker


def latched_marker(table, view=None):
    res = _orig_marker(table, view)
    open(os.path.join(barrier, f"started-{writer_id}"), "w").write("")
    deadline = time.time() + 240  # generous under a loaded host
    while not os.path.exists(os.path.join(barrier, f"started-{other_id}")):
        if time.time() > deadline:
            raise RuntimeError("barrier timeout waiting for other writer")
        time.sleep(0.05)
    return res


write_mod.txn_start_marker = latched_marker

t = HudiTable.load(spark, path)
df = spark.createDataFrame(
    [(i, part, int(val)) for i in range(int(lo), int(hi))],
    "id long, part string, v long",
)
for attempt in range(5):
    try:
        inst = t.upsert(df)
        print(f"COMMITTED {inst}")
        sys.exit(0)
    except ConcurrentWriteConflictError as e:
        print(f"CONFLICT {e}")
        sys.exit(42)
    except LockTimeoutError:
        # lock contention under a loaded host is not the property under
        # test (conflict arbitration is) — wait and retry
        time.sleep(2.0 * (attempt + 1))
sys.exit(5)
