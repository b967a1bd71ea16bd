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


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[8]")
        .appName("hudi_0_10_0_spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
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
