"""Multi-table DeltaStreamer (reference:
util/deltastreamer/HoodieMultiTableDeltaStreamer.java — sequential
per-table sync, per-table checkpoints, failures isolated)."""

import uuid

import pytest
from pyspark.sql import types as T

from hudi_0_10_0_spark import HudiTable, WriteConfig
from hudi_0_10_0_spark.streaming import MultiTableDeltaStreamer
from hudi_0_10_0_spark.streaming.delta_streamer import CHECKPOINT_KEY

from conftest import SCRATCH

SRC_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("part", T.StringType()),
        T.StructField("v", T.LongType()),
    ]
)


def _cfg(name, **kw):
    return WriteConfig(
        record_key_field="id",
        partition_field="part",
        precombine_field="v",
        table_name=name,
        auto_clean=False,
        auto_archive=False,
        **kw,
    )


@pytest.fixture()
def scratch_dir():
    import shutil

    p = f"{SCRATCH}/mts_{uuid.uuid4().hex[:10]}"
    yield p
    shutil.rmtree(p, ignore_errors=True)


def _write_src(spark, path, rows):
    spark.createDataFrame(rows, SRC_SCHEMA).write.mode("append").parquet(path)


def test_multi_table_sync_ingests_each_with_own_checkpoint(spark, scratch_dir):
    _write_src(spark, f"{scratch_dir}/in_a", [(i, "p0", i) for i in range(20)])
    _write_src(spark, f"{scratch_dir}/in_b", [(i, "p0", i) for i in range(7)])
    ta = HudiTable.create(spark, f"{scratch_dir}/ta", _cfg("tbl_a"))
    tb = HudiTable.create(spark, f"{scratch_dir}/tb", _cfg("tbl_b"))
    mts = MultiTableDeltaStreamer(
        spark,
        tables=[
            {"target": ta, "source": f"{scratch_dir}/in_a"},
            {"target": tb, "source": f"{scratch_dir}/in_b"},
        ],
        source_schema=SRC_SCHEMA,  # common kwarg layered under each table
    )
    res = mts.sync()
    assert res["failed"] == {}
    assert sorted(res["success"]) == ["tbl_a", "tbl_b"]
    assert ta.snapshot().count() == 20
    assert tb.snapshot().count() == 7
    # per-table checkpoints recorded independently
    for t in (ta, tb):
        md = t.timeline.read_metadata(t.timeline.latest_completed())
        assert md["extra"][CHECKPOINT_KEY]
    # second pass: nothing new anywhere
    res2 = mts.sync()
    assert res2["commits"] == {"tbl_a": None, "tbl_b": None}


def test_common_kwargs_are_overridable_per_table(spark, scratch_dir):
    _write_src(spark, f"{scratch_dir}/in_a", [(1, "p0", 10)])
    _write_src(spark, f"{scratch_dir}/in_b", [(2, "p0", 20)])
    ta = HudiTable.create(spark, f"{scratch_dir}/ta", _cfg("tbl_a"))
    tb = HudiTable.create(spark, f"{scratch_dir}/tb", _cfg("tbl_b"))
    mts = MultiTableDeltaStreamer(
        spark,
        tables=[
            {"target": ta, "source": f"{scratch_dir}/in_a"},
            {
                "target": tb,
                "source": f"{scratch_dir}/in_b",
                "transformer_sql": "SELECT id, part, v * 100 AS v FROM <SRC>",
            },
        ],
        source_schema=SRC_SCHEMA,
        transformer_sql="SELECT id, part, v + 1 AS v FROM <SRC>",
    )
    mts.sync()
    assert ta.snapshot().first()["v"] == 11  # common transformer
    assert tb.snapshot().first()["v"] == 2000  # per-table override


def test_one_failing_table_does_not_block_the_rest(spark, scratch_dir):
    _write_src(spark, f"{scratch_dir}/in_a", [(i, "p0", i) for i in range(5)])
    # table B's source rows are missing the record-key column → its write fails
    spark.createDataFrame(
        [("p0", 1)], "part string, v long"
    ).write.parquet(f"{scratch_dir}/in_bad")
    ta = HudiTable.create(spark, f"{scratch_dir}/ta", _cfg("tbl_a"))
    tb = HudiTable.create(spark, f"{scratch_dir}/tb", _cfg("tbl_bad"))
    mts = MultiTableDeltaStreamer(
        spark,
        tables=[
            {"target": tb, "source": f"{scratch_dir}/in_bad"},  # fails FIRST
            {"target": ta, "source": f"{scratch_dir}/in_a"},
        ],
    )
    res = mts.sync()
    assert list(res["failed"]) == ["tbl_bad"]
    assert res["success"] == ["tbl_a"]
    assert ta.snapshot().count() == 5
    assert mts.failed_tables and "tbl_bad" in mts.failed_tables
    # the failed table committed nothing
    assert tb.timeline.latest_completed() is None


def test_table_config_requires_target_and_source(spark, scratch_dir):
    with pytest.raises(ValueError, match="target"):
        MultiTableDeltaStreamer(spark, tables=[{"source": "/x"}])


def test_duplicate_table_names_rejected(spark, scratch_dir):
    ta = HudiTable.create(spark, f"{scratch_dir}/d1", _cfg("same"))
    tb = HudiTable.create(spark, f"{scratch_dir}/d2", _cfg("same"))
    with pytest.raises(ValueError, match="duplicate table_name"):
        MultiTableDeltaStreamer(
            spark,
            tables=[
                {"target": ta, "source": "/x"},
                {"target": tb, "source": "/y"},
            ],
        )
