"""Cross-process worker for FileSystemLockProvider hammer tests.

Runs the REAL provider (hudi_0_10_0_spark.concurrency) over a pure-OS
local filesystem shim — no SparkSession per process, so a hammer run can
spawn many processes cheaply. The shim's rename/create semantics match
what the provider relies on: create_exclusive is O_CREAT|O_EXCL (the
same syscall FS.create_exclusive uses for local paths) and rename is
source-must-exist (every provider rename targets a unique tomb, so
POSIX rename's overwrite-on-target never comes into play).

An optional trailing ``fcntl`` argument swaps in FcntlLockProvider —
the same soak then exercises OS-flock mutual exclusion across
processes instead of the CAS lock file.

Modes:
  takeover <lock_meta_dir> <worker_id>
      one try_lock over a pre-seeded expired lock; exit 0 and print
      WIN if acquired (held, never released), exit 0 + LOSE otherwise.
  soak <lock_meta_dir> <worker_id> <iters> <log_file>
      <iters> × [lock → append "acq" record → tiny hold → append "rel"
      record → unlock]; records carry monotonic-ish wall timestamps so
      the parent can assert no two holds overlap.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from hudi_0_10_0_spark.concurrency import (
    FcntlLockProvider,
    FileSystemLockProvider,
)


class LocalFS:
    def exists(self, p):
        return os.path.exists(p)

    def mkdirs(self, p):
        os.makedirs(p, exist_ok=True)

    def delete(self, p, recursive=False):
        try:
            os.remove(p)
            return True
        except OSError:
            return False

    def rename(self, src, dst):
        # provider renames always target a UNIQUE tomb, so POSIX
        # overwrite-on-target semantics are unreachable; what matters is
        # source-must-exist: one mover wins, the rest get OSError.
        try:
            os.rename(src, dst)
            return True
        except OSError:
            return False

    def mtime(self, p):
        return os.path.getmtime(p)

    def read_text(self, p):
        with open(p, encoding="utf-8") as f:
            return f.read()

    def write_text(self, p, content):
        with open(p, "w", encoding="utf-8") as f:
            f.write(content)

    def create_exclusive(self, p, content):
        try:
            fd = os.open(p, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
        except FileExistsError:
            return False
        try:
            os.write(fd, content.encode("utf-8"))
        finally:
            os.close(fd)
        return True


def main():
    mode = sys.argv[1]
    meta = sys.argv[2]
    wid = sys.argv[3]
    if sys.argv[-1] == "fcntl":
        lp = FcntlLockProvider(meta)
    else:
        lp = FileSystemLockProvider(LocalFS(), meta, ttl_seconds=3600.0)
    if mode == "takeover":
        print("WIN" if lp.try_lock(wid) else "LOSE")
        return 0
    if mode == "soak":
        iters, log_file = int(sys.argv[4]), sys.argv[5]
        for seq in range(iters):
            owner = f"{wid}-{seq}"
            lp.lock(owner, wait_seconds=60.0, poll=0.002)
            t_acq = time.time()
            # the hold itself: validate must see our own acquisition
            assert lp.validate(owner), f"{owner}: validate failed while held"
            time.sleep(0.001)
            t_rel = time.time()
            # O_APPEND single short write: atomic on POSIX
            with open(log_file, "a", encoding="utf-8") as f:
                f.write(json.dumps({"o": owner, "a": t_acq, "r": t_rel}) + "\n")
            lp.unlock(owner)
        return 0
    raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    sys.exit(main())
