"""Metrics (reference: HoodieMetrics.java, MetricsReporterType.java).
Gauge names: <prefix>.<action>.<metric>."""

import pytest
from pyspark.sql import functions as F

from hudi_0_10_0_spark import HudiTable, WriteConfig
from hudi_0_10_0_spark.metrics import register_reporter, table_metrics


def _cfg(**kw):
    base = dict(
        record_key_field="o_orderkey",
        partition_field="o_orderstatus",
        precombine_field="o_totalprice",
        table_name="m_orders",
        metrics_on=True,
        auto_archive=False,
    )
    base.update(kw)
    return WriteConfig(**base)


def test_commit_metrics_recorded(spark, tmp_table_path, orders):
    t = HudiTable.create(spark, tmp_table_path + "/t", _cfg(auto_clean=False))
    t.bulk_insert(orders)
    g = table_metrics(t).gauges
    assert g["m_orders.commit.totalRecordsWritten"] == orders.count()
    assert g["m_orders.commit.duration"] > 0
    assert g["m_orders.commit.totalBytesWritten"] > 0
    assert g["m_orders.commit.totalPartitionsWritten"] == 3  # O/F/P
    t.upsert(orders.limit(10).withColumn("o_comment", F.lit("u")))
    assert g["m_orders.commit.totalRecordsWritten"] >= 10
    t.insert_overwrite(orders.limit(5))
    assert g["m_orders.replacecommit.totalRecordsWritten"] == 5


def test_clean_and_rollback_metrics(spark, tmp_table_path, orders):
    t = HudiTable.create(
        spark,
        tmp_table_path + "/t",
        _cfg(auto_clean=False, cleaner_commits_retained=1),
    )
    t.bulk_insert(orders)
    c1 = t.upsert(orders.limit(10).withColumn("o_comment", F.lit("a")))
    t.upsert(orders.limit(10).withColumn("o_comment", F.lit("b")))
    g = table_metrics(t).gauges
    t.clean()
    assert g["m_orders.clean.numFilesDeleted"] > 0
    assert g["m_orders.clean.duration"] > 0
    last = t.commits()[-1]
    t.rollback(last)
    assert g["m_orders.rollback.numFilesDeleted"] > 0
    assert g["m_orders.rollback.duration"] > 0


def test_metrics_off_by_default_is_noop(spark, tmp_table_path, orders):
    cfg = _cfg()
    cfg.metrics_on = False
    t = HudiTable.create(spark, tmp_table_path + "/t", cfg)
    t.bulk_insert(orders.limit(5))
    m = table_metrics(t)
    assert not hasattr(t, "_metrics")
    m.update_commit_metrics("commit", 1.0, {})  # no-op, no error


def test_custom_reporter_seam(spark, tmp_table_path, orders):
    seen = []

    class Rec:
        def report(self, name, value):
            seen.append((name, value))

    register_reporter("test_rec", lambda: Rec())
    t = HudiTable.create(
        spark,
        tmp_table_path + "/t",
        _cfg(metrics_reporter_type="test_rec", metrics_prefix="px",
             auto_clean=False),
    )
    t.bulk_insert(orders.limit(5))
    names = {n for n, _ in seen}
    assert "px.commit.duration" in names
    assert "px.commit.totalRecordsWritten" in names


def test_unknown_reporter_raises(spark, tmp_table_path, orders):
    t = HudiTable.create(
        spark,
        tmp_table_path + "/t",
        _cfg(metrics_reporter_type="nope", auto_clean=False),
    )
    with pytest.raises(ValueError, match="NOPE"):
        t.bulk_insert(orders.limit(5))


def test_unknown_reporter_fails_fast_before_any_write(
    spark, tmp_table_path, orders
):
    """Misconfiguration surfaces at write entry — nothing committed,
    retry after fixing cannot double-ingest (code-review r7)."""
    t = HudiTable.create(
        spark,
        tmp_table_path + "/t",
        _cfg(metrics_reporter_type="bogus", auto_clean=False),
    )
    with pytest.raises(ValueError, match="BOGUS"):
        t.bulk_insert(orders.limit(5))
    assert t.commits() == []


def test_metrics_prefix_option_mapping():
    from hudi_0_10_0_spark.datasource import options_to_config

    cfg = options_to_config(
        {
            "hoodie.table.name": "x",
            "hoodie.datasource.write.recordkey.field": "id",
            "hoodie.metrics.on": "true",
            "hoodie.metrics.reporter.metricsname.prefix": "prod.tbl",
        }
    )
    assert cfg.metrics_prefix == "prod.tbl"
