"""Full-coverage oracle sweep: every registered __spark_entry__ query vs
its DuckDB oracle, including the ones rotated past the driver's 50-entry
CORRECTNESS window (VERDICT r2 #2 — the rotation must never hide a
regression).

Slow (~15 min at sf0.01); opt-in:

    RUN_ORACLE_ALL=1 python -m pytest -m oracle_all -q

The same sweep runs standalone as `python tools/check_oracle.py`.
"""

import os
import subprocess
import sys

import pytest


@pytest.mark.oracle_all
@pytest.mark.skipif(
    not os.environ.get("RUN_ORACLE_ALL"),
    reason="full oracle sweep is opt-in: set RUN_ORACLE_ALL=1",
)
def test_all_queries_match_oracle():
    proc = subprocess.run(
        [sys.executable, "tools/check_oracle.py", "/root/testdata/sf0.01"],
        cwd="/root/repo", capture_output=True, text=True, timeout=3600,
    )
    tail = "\n".join(proc.stdout.splitlines()[-8:])
    assert proc.returncode == 0, f"oracle sweep failed:\n{tail}\n{proc.stderr[-2000:]}"
