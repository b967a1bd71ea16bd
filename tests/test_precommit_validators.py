"""Pre-commit validators (reference: SparkPreCommitValidator.java +
SqlQuery{Equality,Inequality,SingleResult}PreCommitValidator,
HoodiePreCommitValidatorConfig.java:39-75). A failing validator aborts
the write BEFORE the commit; the abort path removes the staged files."""

import pytest
from pyspark.sql import functions as F

from hudi_0_10_0_spark import HudiTable, TableType, WriteConfig
from hudi_0_10_0_spark.precommit import PreCommitValidationError


def _cfg(**kw):
    base = dict(
        record_key_field="o_orderkey",
        partition_field="o_orderstatus",
        precombine_field="o_totalprice",
        auto_clean=False,
        auto_archive=False,
    )
    base.update(kw)
    return WriteConfig(**base)


def test_equality_passes_then_blocks_violating_write(spark, tmp_table_path, orders):
    """Guard: no write may introduce NULL o_custkey rows."""
    t = HudiTable.create(
        spark,
        tmp_table_path + "/t",
        _cfg(
            precommit_validators="equality",
            precommit_equality_sql=(
                "select count(*) as n from <TABLE_NAME> where o_custkey is null"
            ),
        ),
    )
    c0 = t.bulk_insert(orders)  # 0 nulls before == 0 nulls after → passes
    assert c0 in t.commits()
    good = orders.limit(5).withColumn("o_comment", F.lit("ok"))
    assert t.upsert(good) in t.commits()

    bad = orders.limit(3).withColumn("o_custkey", F.lit(None).cast("long"))
    with pytest.raises(PreCommitValidationError, match="equality"):
        t.upsert(bad)
    # write aborted cleanly: no new commit, no nulls visible, retryable
    assert len(t.commits()) == 2
    assert t.snapshot().filter("o_custkey is null").count() == 0
    assert t.upsert(good.withColumn("o_comment", F.lit("again"))) in t.commits()


def test_inequality_requires_a_change(spark, tmp_table_path, orders):
    """Guard: the write must actually change the row count."""
    # build the base WITHOUT validators, then turn them on: a pure
    # update (same keys) leaves the count unchanged → inequality fails
    t2 = HudiTable.create(spark, tmp_table_path + "/t2", _cfg())
    t2.bulk_insert(orders)
    t2.cfg.precommit_validators = "inequality"
    t2.cfg.precommit_inequality_sql = "select count(*) as n from <TABLE_NAME>"
    with pytest.raises(PreCommitValidationError, match="inequality"):
        t2.upsert(orders.limit(5).withColumn("o_comment", F.lit("upd")))
    # an insert of new keys changes the count → passes
    new = orders.limit(4).withColumn("o_orderkey", F.col("o_orderkey") + 10**9)
    assert t2.upsert(new) in t2.commits()


def test_single_value_on_after_state(spark, tmp_table_path, orders):
    n = orders.count()
    t = HudiTable.create(
        spark,
        tmp_table_path + "/t",
        _cfg(
            precommit_validators="single_value",
            precommit_single_value_sql=(
                f"select count(*) from <TABLE_NAME>#{n}"
            ),
        ),
    )
    assert t.bulk_insert(orders) in t.commits()  # after-state count == n
    with pytest.raises(PreCommitValidationError, match="single_value"):
        t.upsert(  # insert of a new key → count n+1 != n
            orders.limit(1).withColumn("o_orderkey", F.lit(10**9).cast("long"))
        )
    assert len(t.commits()) == 1


def test_mor_delta_writes_validate_merged_after_state(
    spark, tmp_table_path, orders
):
    t = HudiTable.create(
        spark,
        tmp_table_path + "/t",
        _cfg(
            table_type=TableType.MERGE_ON_READ,
            inline_compact=False,
            precommit_validators="equality",
            precommit_equality_sql=(
                "select count(*) as n from <TABLE_NAME> where o_totalprice < 0"
            ),
        ),
    )
    t.bulk_insert(orders)
    # a delta write whose MERGED state stays clean passes
    assert (
        t.upsert(orders.limit(10).withColumn("o_comment", F.lit("d")))
        in t.commits()
    )
    # a delta introducing negative prices is caught in the merged view
    # (NEW keys — an update of existing keys with a LOWER precombine
    # value would legitimately lose the merge and never surface)
    with pytest.raises(PreCommitValidationError):
        t.upsert(
            orders.limit(2)
            .withColumn("o_orderkey", F.col("o_orderkey") + 10**9)
            .withColumn("o_totalprice", F.lit(-5.0))
        )
    assert t.snapshot().filter("o_totalprice < 0").count() == 0


def test_misconfiguration_fails_fast(spark, tmp_table_path, orders):
    t = HudiTable.create(
        spark,
        tmp_table_path + "/t",
        _cfg(precommit_validators="nonsense"),
    )
    with pytest.raises(PreCommitValidationError, match="unknown"):
        t.bulk_insert(orders.limit(5))
    assert t.commits() == []
    t2 = HudiTable.create(
        spark,
        tmp_table_path + "/t2",
        _cfg(precommit_validators="equality"),  # no queries configured
    )
    with pytest.raises(PreCommitValidationError, match="no queries"):
        t2.bulk_insert(orders.limit(5))
    assert t2.commits() == []


def test_replacecommit_validates_after_state(spark, tmp_table_path, orders):
    """insert_overwrite must see the REPLACED composition as the after
    state (old groups gone, new files in)."""
    n_urgent = orders.filter("o_orderstatus = 'F'").count()
    t = HudiTable.create(spark, tmp_table_path + "/t", _cfg())
    t.bulk_insert(orders)
    t.cfg.precommit_validators = "single_value"
    keep = orders.filter("o_orderstatus = 'F'").limit(10)
    t.cfg.precommit_single_value_sql = (
        "select count(*) from <TABLE_NAME> where o_orderstatus='F'#10"
    )
    assert n_urgent > 10
    t.insert_overwrite(keep)
    snap = t.snapshot()
    assert snap.filter("o_orderstatus='F'").count() == 10


def test_single_value_tolerates_hash_in_sql_body(
    spark, tmp_table_path, orders
):
    """advice r7: the query#expected split uses the LAST '#', so a
    literal '#' inside a SQL string constant must not break parsing."""
    t = HudiTable.create(spark, tmp_table_path + "/t", _cfg())
    t.cfg.precommit_validators = "single_value"
    t.cfg.precommit_single_value_sql = (
        "select count(*) from <TABLE_NAME> where o_orderpriority = '#tag'#0"
    )
    t.bulk_insert(orders.limit(5))
    assert t.snapshot().count() == 5
    # and a missing '#' separator is still a format error
    t.cfg.precommit_single_value_sql = "select count(*) from <TABLE_NAME>"
    with pytest.raises(PreCommitValidationError, match="format"):
        t.upsert(orders.limit(1))


def test_schema_evolving_write_is_visible_to_validators(
    spark, tmp_table_path, orders
):
    """A write that introduces a new column must expose it in the
    after view (the pinned-committed-schema read would hide it —
    code-review r7)."""
    t = HudiTable.create(spark, tmp_table_path + "/t", _cfg())
    t.bulk_insert(orders.limit(100))
    t.cfg.precommit_validators = "single_value"
    t.cfg.precommit_single_value_sql = (
        "select count(*) from <TABLE_NAME> where c2 = 'new'#3"
    )
    t.upsert(
        orders.limit(3)
        .withColumn("o_orderkey", F.col("o_orderkey") + 10**9)
        .withColumn("c2", F.lit("new"))
    )
    assert t.snapshot().filter("c2 = 'new'").count() == 3


def test_first_commit_with_dropped_partition_columns(
    spark, tmp_table_path
):
    """First-commit validation must see restored partition values, not
    nulls (code-review r7)."""
    df = spark.createDataFrame(
        [(1, "d1", 1.0), (2, "d1", 2.0), (3, "d2", 3.0)],
        "id long, dt string, v double",
    )
    t = HudiTable.create(
        spark,
        tmp_table_path + "/t",
        WriteConfig(
            record_key_field="id",
            partition_field="dt",
            precombine_field="v",
            drop_partition_columns=True,
            precommit_validators="single_value",
            precommit_single_value_sql=(
                "select count(*) from <TABLE_NAME> where dt is not null#3"
            ),
        ),
    )
    assert t.bulk_insert(df) in t.commits()
