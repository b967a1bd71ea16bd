"""Catalog sync (catalog_sync.py — the HiveSyncTool analogue, r8):
COW registers one view, MOR registers <name>_ro / <name>_rt, sync is
conditional on new commits, views stay fresh across commits (plan
re-registration = schema sync), and DeltaStreamer runs it post-commit
(DeltaSync.syncMeta parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hudi_0_10_0_spark import HudiTable, WriteConfig
from hudi_0_10_0_spark.catalog_sync import CatalogSyncTool
from hudi_0_10_0_spark.config import TableType


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, part string, v long")


def _cfg(**kw):
    base = dict(
        record_key_field="id", partition_field="part", precombine_field="v",
        auto_clean=False, auto_archive=False,
    )
    base.update(kw)
    return WriteConfig(**base)


def test_cow_sync_and_conditional_skip(spark, tmp_table_path):
    t = HudiTable.create(spark, tmp_table_path + "/c", _cfg(table_name="trips"))
    t.bulk_insert(_df(spark, [(i, f"p{i % 2}", i) for i in range(20)]))
    tool = CatalogSyncTool(spark, t, database="lake")
    r1 = tool.sync()
    assert r1["synced"] and r1["tables"] == ["lake_trips"]
    assert set(r1["partitions_added"]) == {"p0", "p1"}
    assert spark.sql("SELECT count(*) c FROM global_temp.lake_trips").first()["c"] == 20

    # nothing new → conditional skip
    r2 = tool.sync()
    assert not r2["synced"]

    # a commit in a NEW partition → resync reports it and the view
    # reflects the new data (stale plans would miss the commit)
    t.upsert(_df(spark, [(100, "p9", 100)]))
    r3 = tool.sync()
    assert r3["synced"] and r3["partitions_added"] == ["p9"]
    assert spark.sql("SELECT count(*) c FROM global_temp.lake_trips").first()["c"] == 21
    tool.unsync()
    assert "lake_trips" not in {
        v.name for v in spark.catalog.listTables("global_temp")
    }


def test_mor_registers_ro_and_rt(spark, tmp_table_path):
    t = HudiTable.create(
        spark, tmp_table_path + "/m",
        _cfg(table_name="trips", table_type=TableType.MERGE_ON_READ,
             inline_compact=False),
    )
    t.bulk_insert(_df(spark, [(i, f"p{i % 2}", i) for i in range(10)]))
    t.upsert(_df(spark, [(0, "p0", 999)]))  # delta on top of the base
    tool = CatalogSyncTool(spark, t, database="lake")
    r = tool.sync()
    assert r["tables"] == ["lake_trips_ro", "lake_trips_rt"]
    ro = spark.sql("SELECT v FROM global_temp.lake_trips_ro WHERE id = 0").first()["v"]
    rt = spark.sql("SELECT v FROM global_temp.lake_trips_rt WHERE id = 0").first()["v"]
    assert ro == 0 and rt == 999  # _ro skips deltas, _rt merges them
    tool.unsync()


def test_schema_evolution_reflected_on_resync(spark, tmp_table_path):
    t = HudiTable.create(spark, tmp_table_path + "/s", _cfg(table_name="ev"))
    t.bulk_insert(_df(spark, [(1, "p0", 1)]))
    tool = CatalogSyncTool(spark, t, database="lake")
    tool.sync()
    cols1 = set(spark.table("global_temp.lake_ev").columns)
    assert "extra" not in cols1
    t.upsert(
        spark.createDataFrame([(2, "p0", 2, "x")], "id long, part string, v long, extra string")
    )
    r = tool.sync()
    assert r["synced"]
    cols2 = set(spark.table("global_temp.lake_ev").columns)
    assert "extra" in cols2  # syncSchema parity: evolve on resync
    tool.unsync()


def test_delta_streamer_meta_sync_hook(spark, tmp_table_path, tmp_path):
    """--enable-hive-sync analogue: the streamer syncs the catalog after
    every successful commit and skips it on empty rounds."""
    import os

    from hudi_0_10_0_spark.streaming.delta_streamer import DeltaStreamer

    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    _df(spark, [(1, "p0", 1), (2, "p1", 2)]).write.parquet(f"{src}/batch1.parquet")
    t = HudiTable.create(spark, tmp_table_path + "/d", _cfg(table_name="str"))
    tool = CatalogSyncTool(spark, t, database="lake")
    ds = DeltaStreamer(spark, t, src, source_format="parquet", meta_sync=tool)
    assert ds.sync_once() is not None
    assert spark.sql("SELECT count(*) c FROM global_temp.lake_str").first()["c"] == 2
    state = tool._load_state()
    assert state["last_commit_time_sync"] == t.timeline.latest_completed().timestamp
    assert ds.sync_once() is None  # empty round: no commit, no resync churn
    tool.unsync()


def test_sync_on_empty_table_reports_cleanly(spark, tmp_table_path):
    """Code-review r8: sync before the first commit must report
    {'synced': False}, not raise from deep inside the read path."""
    t = HudiTable.create(spark, tmp_table_path + "/e", _cfg(table_name="empty"))
    r = CatalogSyncTool(spark, t, database="lake").sync()
    assert r == {"synced": False, "last_commit_time_sync": None,
                 "tables": ["lake_empty"], "partitions_added": []}
