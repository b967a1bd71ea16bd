"""Subprocess worker designed to be SIGKILLed mid-iteration
(tests/test_concurrency.py::test_multi_writer_kill_soak).

Usage: python kill_victim_writer.py <table_path> <writer_id> <n_writers> \
           <barrier_dir> <progress_file> <keys>

Upserts ALL of its keys every iteration with v = iteration number and
records each DURABLE commit in <progress_file> (fsync'd), then loops
"forever" (the parent kills it). Because each commit covers every key,
any later read of this writer's keys must show ONE uniform v — either
the last recorded iteration N or N+1 (commit landed between the upsert
returning and the progress write, or the kill hit after the commit
point). Anything else is torn state.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

path, wid_s, n_writers_s, barrier, progress, keys_s = sys.argv[1:7]
wid, n_keys = int(wid_s), int(keys_s)

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .appName(f"kill-victim-{wid}")
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
rows_of = lambda it: [(k, f"p{k % 4}", it) for k in range(base, base + n_keys)]

open(os.path.join(barrier, f"ready-{wid}"), "w").write("")
deadline = time.time() + 180
while len([n for n in os.listdir(barrier) if n.startswith("ready-")]) < int(n_writers_s):
    if time.time() > deadline:
        raise RuntimeError("barrier timeout")
    time.sleep(0.05)

it = 0
while True:  # parent SIGKILLs us mid-loop
    it += 1
    df = spark.createDataFrame(rows_of(it), "id long, part string, v long")
    for attempt in range(60):
        try:
            t.upsert(df)
            break
        except (ConcurrentWriteConflictError, LockTimeoutError):
            time.sleep(0.1 + 0.05 * min(attempt, 4))
    else:
        sys.exit(4)
    # atomic write: a SIGKILL between truncate and write must never
    # leave an empty progress file for the parent to parse
    tmp = progress + ".tmp"
    fd = os.open(tmp, os.O_CREAT | os.O_WRONLY | os.O_TRUNC, 0o644)
    os.write(fd, str(it).encode())
    os.fsync(fd)
    os.close(fd)
    os.replace(tmp, progress)
