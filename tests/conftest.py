import os
import shutil
import time
import uuid

import pytest
from pyspark.sql import SparkSession

TESTDATA = "/root/testdata/sf0.001"
SCRATCH = "/root/repo/.tmp/pytest"

# Pin the PROCESS timezone before the JVM starts (same as
# tools/check_oracle.py): createDataFrame converts naive datetimes with
# the process-local zone while session renders use
# spark.sql.session.timeZone=UTC — on a non-UTC host every
# timestamp-asserting test would otherwise fail (verification-chain
# review r6).
os.environ["TZ"] = "UTC"
time.tzset()

# ---- driver fast profile (VERDICT r8 item 2) -------------------------
# The external driver's pytest run has a hard time budget the full
# ~600-test suite exceeds (VERIFY_r08 tests_ok:false, tail cut at ~12%).
# DEFAULT runs deselect (a) whole soak/crash-matrix/chaos/longevity
# modules (module-level `pytest.mark.soak`) and (b) the individually
# slowest tests listed in tests/fast_profile_skip.txt (measured >10 s
# per call on the r9 --durations run). NOTHING is deleted: set
# HUDI_FULL_SUITE=1 to run everything (the builder's profile; the full
# suite is run and recorded each round in OPTIMIZATION_r*.md).
_SKIP_LIST_FILE = os.path.join(os.path.dirname(__file__), "fast_profile_skip.txt")


def pytest_collection_modifyitems(config, items):
    if os.environ.get("HUDI_FULL_SUITE"):
        return
    try:
        with open(_SKIP_LIST_FILE) as f:
            slow_ids = {
                ln.strip() for ln in f
                if ln.strip() and not ln.startswith("#")
            }
    except OSError:
        slow_ids = set()
    keep, drop = [], []
    for item in items:
        # nodeid is relative to rootdir: "tests/test_x.py::test_y" when
        # run from the repo root, "test_x.py::test_y" from tests/ —
        # match both forms
        nid = item.nodeid.removeprefix("tests/")
        if item.get_closest_marker("soak") or nid in slow_ids:
            drop.append(item)
        else:
            keep.append(item)
    if drop:
        config.hook.pytest_deselected(items=drop)
        items[:] = keep


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[8]")
        .appName("hudi_0_10_0_spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        # skip per-DataFrame-call call-site capture (error-context only;
        # ~4 py4j round trips per API call — optimization r9)
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture()
def tmp_table_path():
    p = f"{SCRATCH}/{uuid.uuid4().hex[:12]}"
    yield p
    shutil.rmtree(p, ignore_errors=True)


@pytest.fixture(scope="session")
def orders(spark):
    return spark.read.parquet(f"{TESTDATA}/orders.parquet").cache()


@pytest.fixture(scope="session")
def lineitem(spark):
    return spark.read.parquet(f"{TESTDATA}/lineitem.parquet").cache()


@pytest.fixture(scope="session")
def documents(spark):
    return spark.read.parquet(f"{TESTDATA}/documents.parquet").cache()


@pytest.fixture(scope="session")
def embeddings(spark):
    return spark.read.parquet(f"{TESTDATA}/embeddings.parquet").cache()
