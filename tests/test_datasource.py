"""hoodie.* option-string shim (reference DataSourceOptions.scala)."""

import pytest
from pyspark.sql import functions as F

from hudi_0_10_0_spark import TableType, datasource
from hudi_0_10_0_spark.datasource import options_to_config


def test_option_translation():
    cfg = options_to_config(
        {
            "hoodie.table.name": "trips",
            "hoodie.datasource.write.recordkey.field": "uuid",
            "hoodie.datasource.write.partitionpath.field": "region,day",
            "hoodie.datasource.write.precombine.field": "ts",
            "hoodie.datasource.write.table.type": "MERGE_ON_READ",
            "hoodie.datasource.write.payload.class": "org.apache.hudi.common.model.OverwriteNonDefaultsWithLatestAvroPayload",
            "hoodie.datasource.write.hive_style_partitioning": "true",
            "hoodie.index.type": "GLOBAL_SIMPLE",
            "hoodie.simple.index.update.partition.path": "true",
            "hoodie.parquet.max.file.size": "125829120",
            "hoodie.cleaner.commits.retained": "7",
            "hoodie.compact.inline": "true",
            "hoodie.compact.inline.max.delta.commits": "3",
            "hoodie.some.unknown.key": "ignored",
        }
    )
    assert cfg.table_name == "trips"
    assert cfg.record_key_field == "uuid"
    assert cfg.partition_field == ["region", "day"]
    assert cfg.precombine_field == "ts"
    assert cfg.table_type == TableType.MERGE_ON_READ
    assert cfg.payload == "overwrite_non_defaults"
    assert cfg.hive_style_partitioning is True
    assert cfg.index_type == "GLOBAL_SIMPLE"
    assert cfg.update_partition_path is True
    assert cfg.max_file_size_bytes == 125829120
    assert cfg.cleaner_commits_retained == 7
    assert cfg.inline_compact is True
    assert cfg.compact_max_delta_commits == 3


def _opts(**extra):
    return {
        "hoodie.table.name": "orders",
        "hoodie.datasource.write.recordkey.field": "o_orderkey",
        "hoodie.datasource.write.partitionpath.field": "o_orderpriority",
        "hoodie.datasource.write.precombine.field": "o_orderdate",
        "hoodie.clean.automatic": "false",
        **extra,
    }


def test_write_read_roundtrip(spark, tmp_table_path, orders):
    p = tmp_table_path + "/t"
    datasource.write(
        orders, p, options=_opts(**{"hoodie.datasource.write.operation": "bulk_insert"})
    )
    # second write: default operation = upsert, config loaded from table
    datasource.write(
        orders.limit(100).withColumn("o_orderstatus", F.lit("X")), p, options=_opts()
    )
    snap = datasource.read(spark, p)
    assert snap.count() == orders.count()
    assert snap.filter(F.col("o_orderstatus") == "X").count() == 100

    inc = datasource.read(
        spark, p, options={"hoodie.datasource.query.type": "incremental"}
    )
    assert inc.count() == orders.count()  # no begin → everything


def test_per_write_options_applied_to_existing_table(spark, tmp_table_path):
    """The reference builds its write config from the supplied options
    on EVERY write — a per-write AWS DMS payload + precombine must take
    effect on an existing table (Op='D' rows delete), not be silently
    ignored in favor of the creation-time defaults."""
    p = tmp_table_path + "/t"
    df = spark.createDataFrame(
        [(1, "p0", 1, "I"), (2, "p0", 1, "I")], "id long, part string, lsn long, Op string"
    )
    datasource.write(df, p, options={
        "hoodie.table.name": "cdc",
        "hoodie.datasource.write.recordkey.field": "id",
        "hoodie.datasource.write.partitionpath.field": "part",
        "hoodie.datasource.write.precombine.field": "lsn",
        "hoodie.clean.automatic": "false",
    })
    dms = spark.createDataFrame([(1, "p0", 2, "D")], "id long, part string, lsn long, Op string")
    datasource.write(dms, p, options={
        "hoodie.datasource.write.payload.class":
            "org.apache.hudi.common.model.AWSDmsAvroPayload",
        "hoodie.datasource.write.precombine.field": "lsn",
    })
    snap = datasource.read(spark, p)
    assert snap.count() == 1  # id=1 deleted by the DMS payload
    assert snap.first().id == 2


def test_immutable_option_conflict_raises(spark, tmp_table_path, orders):
    p = tmp_table_path + "/t"
    datasource.write(orders, p, options=_opts())
    with pytest.raises(ValueError, match="record_key_field"):
        datasource.write(orders, p, options=_opts(**{
            "hoodie.datasource.write.recordkey.field": "o_custkey"
        }))
    with pytest.raises(ValueError, match="table_type"):
        datasource.write(orders, p, options=_opts(**{
            "hoodie.datasource.write.table.type": "MERGE_ON_READ"
        }))
    # same values are not a conflict
    datasource.write(orders.limit(5), p, options=_opts())


def test_timestamp_input_format_is_immutable(spark, tmp_table_path, orders):
    """Code-review r5: a per-write override of the DATE_STRING input
    format would re-parse the same source value into a different
    partition path — it must conflict like the other identity fields."""
    from hudi_0_10_0_spark import datasource as ds

    p = tmp_table_path + "/tsfmt"
    base = _opts(**{
        "hoodie.datasource.write.keygenerator.class":
            "org.apache.hudi.keygen.TimestampBasedKeyGenerator",
        "hoodie.deltastreamer.keygen.timestamp.timestamp.type": "DATE_STRING",
        "hoodie.deltastreamer.keygen.timestamp.input.dateformat": "yyyy-MM-dd",
        "hoodie.deltastreamer.keygen.timestamp.output.dateformat": "yyyy/MM/dd",
        "hoodie.datasource.write.partitionpath.field": "o_orderdate",
    })
    ds.write(orders.withColumn("o_orderdate", F.date_format("o_orderdate", "yyyy-MM-dd")), p, options=base)
    with pytest.raises(ValueError, match="timestamp_input_format"):
        ds.write(orders.withColumn("o_orderdate", F.date_format("o_orderdate", "yyyy-MM-dd")), p, options={
            **base,
            "hoodie.deltastreamer.keygen.timestamp.input.dateformat": "ddMMyyyy",
        })


def test_bad_operation_does_not_create_table(spark, tmp_table_path, orders):
    """Code-review r5: a typo'd write operation on a FRESH path used to
    commit an empty table before raising, making the retry fail with
    'already exists'; the operation is now validated before creation."""
    from hudi_0_10_0_spark import HudiTable, datasource as ds

    p = tmp_table_path + "/typo"
    with pytest.raises(ValueError, match="unknown hoodie.datasource.write.operation"):
        ds.write(orders, p, options=_opts(**{
            "hoodie.datasource.write.operation": "upssert"
        }))
    assert not HudiTable.exists(spark, p)
    # the corrected retry works on the same path
    ds.write(orders, p, options=_opts())
    assert HudiTable.exists(spark, p)


def test_unknown_keygenerator_class_fails():
    with pytest.raises(ValueError, match="keygenerator"):
        options_to_config({
            "hoodie.datasource.write.keygenerator.class":
                "org.apache.hudi.keygen.GlobalDeleteKeyGenerator",
        })
    cfg = options_to_config({
        "hoodie.datasource.write.keygenerator.class":
            "org.apache.hudi.keygen.CustomKeyGenerator",
    })
    assert cfg.keygen == "custom"


def test_schema_cache_sees_external_writers_evolution(spark, tmp_table_path, orders):
    """table.schema() on handle A must reflect an ALTER committed via
    handle B without A calling view() first (stale-cache regression)."""
    from hudi_0_10_0_spark import HudiTable

    p = tmp_table_path + "/t"
    datasource.write(orders, p, options=_opts())
    a = HudiTable.load(spark, p)
    cols_before = set(a.read_schema().fieldNames())
    b = HudiTable.load(spark, p)
    b.add_columns([("new_col", "string")])
    assert "new_col" in set(a.read_schema().fieldNames())
    assert "new_col" not in cols_before


def test_save_modes(spark, tmp_table_path, orders):
    p = tmp_table_path + "/t"
    datasource.write(orders, p, options=_opts())
    with pytest.raises(ValueError, match="exists"):
        datasource.write(orders, p, mode="error", options=_opts())
    assert datasource.write(orders, p, mode="ignore", options=_opts()) == ""
    # overwrite = insert_overwrite_table
    datasource.write(orders.limit(10), p, mode="overwrite", options=_opts())
    assert datasource.read(spark, p).count() == 10


def test_incremental_bounds(spark, tmp_table_path, orders):
    p = tmp_table_path + "/t"
    c0 = datasource.write(
        orders, p, options=_opts(**{"hoodie.datasource.write.operation": "bulk_insert"})
    )
    c1 = datasource.write(
        orders.limit(40).withColumn("o_orderstatus", F.lit("Y")), p, options=_opts()
    )
    inc = datasource.read(
        spark,
        p,
        options={
            "hoodie.datasource.query.type": "incremental",
            "hoodie.datasource.read.begin.instanttime": c0,
        },
    )
    assert inc.count() == 40
    tt = datasource.read(spark, p, options={"as.of.instant": c0})
    assert tt.filter(F.col("o_orderstatus") == "Y").count() == 0


def test_incremental_path_glob(spark, tmp_table_path):
    """hoodie.datasource.read.incr.path.glob
    (IncrementalRelation.scala:139-150): restrict incremental results to
    partitions matching the glob."""
    from pyspark.sql import functions as F

    from hudi_0_10_0_spark import HudiTable, WriteConfig
    from hudi_0_10_0_spark import datasource as ds

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    t = HudiTable.create(
        spark, tmp_table_path + "/ipg",
        WriteConfig(record_key_field="o_orderkey", partition_field="o_orderpriority",
                    precombine_field="o_orderdate"),
    )
    c0 = t.bulk_insert(orders)
    t.upsert(orders.limit(200).withColumn("o_orderstatus", F.lit("G")))
    full = ds.read(spark, tmp_table_path + "/ipg", {
        "hoodie.datasource.query.type": "incremental",
        "hoodie.datasource.read.begin.instanttime": c0,
    })
    globbed = ds.read(spark, tmp_table_path + "/ipg", {
        "hoodie.datasource.query.type": "incremental",
        "hoodie.datasource.read.begin.instanttime": c0,
        "hoodie.datasource.read.incr.path.glob": "1-URGENT*",
    })
    assert globbed.count() == full.filter("o_orderpriority = '1-URGENT'").count() > 0
    assert globbed.filter("o_orderpriority <> '1-URGENT'").count() == 0


def test_incremental_path_glob_partition_and_filename(spark, tmp_table_path):
    """ADVICE r2 (low): the reference matches GlobPattern('*'+glob)
    against each file's table-relative '<partition>/<fileName>' path
    (IncrementalRelation.scala:139-150) — a glob spanning partition and
    file name like 'PART/*.parquet' must select that partition's files,
    not silently match nothing against internal layout paths."""
    from pyspark.sql import functions as F

    from hudi_0_10_0_spark import HudiTable, WriteConfig
    from hudi_0_10_0_spark import datasource as ds

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    t = HudiTable.create(
        spark, tmp_table_path + "/ipg2",
        WriteConfig(record_key_field="o_orderkey", partition_field="o_orderpriority",
                    precombine_field="o_orderdate"),
    )
    c0 = t.bulk_insert(orders)
    t.upsert(orders.limit(200).withColumn("o_orderstatus", F.lit("G")))
    full = ds.read(spark, tmp_table_path + "/ipg2", {
        "hoodie.datasource.query.type": "incremental",
        "hoodie.datasource.read.begin.instanttime": c0,
    })
    globbed = ds.read(spark, tmp_table_path + "/ipg2", {
        "hoodie.datasource.query.type": "incremental",
        "hoodie.datasource.read.begin.instanttime": c0,
        "hoodie.datasource.read.incr.path.glob": "1-URGENT/*.parquet",
    })
    want = full.filter("o_orderpriority = '1-URGENT'").count()
    assert want > 0
    assert globbed.count() == want
    assert globbed.filter("o_orderpriority <> '1-URGENT'").count() == 0


def test_save_mode_case_insensitive_and_unknown_rejected(spark, tmp_table_path, orders):
    """code-review r4: Spark's own SaveMode matching is case-insensitive
    ('Overwrite' works in the reference); an unrecognized string must
    FAIL instead of silently falling through to the append path."""
    opts = {
        "hoodie.datasource.write.recordkey.field": "o_orderkey",
        "hoodie.datasource.write.partitionpath.field": "o_orderpriority",
        "hoodie.datasource.write.precombine.field": "o_orderdate",
    }
    datasource.write(orders, tmp_table_path, mode="Append", options=opts)
    # 'Overwrite' (Spark spelling) → insert_overwrite_table, not upsert
    datasource.write(orders.limit(7), tmp_table_path, mode="Overwrite", options=opts)
    assert datasource.read(spark, tmp_table_path).count() == 7
    with pytest.raises(ValueError, match="unknown SaveMode"):
        datasource.write(orders, tmp_table_path, mode="overwrote", options=opts)
    # 'Ignore' on existing table is a no-op
    datasource.write(orders, tmp_table_path, mode="Ignore", options=opts)
    assert datasource.read(spark, tmp_table_path).count() == 7


def test_deltastreamer_timestamp_keygen_option_names():
    """code-review r4: 0.10.0 spells the timestamp keygen options
    hoodie.deltastreamer.keygen.timestamp.* — both spellings translate;
    silently dropping them would derive wrong partition paths."""
    cfg = options_to_config(
        {
            "hoodie.table.name": "t",
            "hoodie.datasource.write.recordkey.field": "id",
            "hoodie.datasource.write.partitionpath.field": "ts",
            "hoodie.datasource.write.keygenerator.class":
                "org.apache.hudi.keygen.TimestampBasedKeyGenerator",
            "hoodie.deltastreamer.keygen.timestamp.type": "EPOCHMILLISECONDS",
            "hoodie.deltastreamer.keygen.timestamp.output.dateformat": "yyyyMM",
            "hoodie.deltastreamer.keygen.timestamp.input.dateformat": "yyyy-MM-dd",
        }
    )
    assert cfg.keygen == "timestamp"
    assert cfg.timestamp_input_type == "EPOCHMILLISECONDS"
    assert cfg.timestamp_output_format == "yyyyMM"
    assert cfg.timestamp_input_format == "yyyy-MM-dd"
    # modern spelling still works
    cfg2 = options_to_config(
        {
            "hoodie.table.name": "t",
            "hoodie.datasource.write.recordkey.field": "id",
            "hoodie.datasource.write.partitionpath.field": "ts",
            "hoodie.keygen.timestamp.type": "EPOCHMS",
            "hoodie.keygen.timestamp.output.dateformat": "yyyy/MM",
        }
    )
    assert cfg2.timestamp_input_type == "EPOCHMS"
    assert cfg2.timestamp_output_format == "yyyy/MM"


def test_r7_option_mappings(spark, tmp_path_factory):
    """hoodie.* spellings for the round-7 features map onto WriteConfig
    (populate.meta.fields is creation-fixed, like the other layout
    fields)."""
    from hudi_0_10_0_spark.datasource import options_to_config

    cfg = options_to_config(
        {
            "hoodie.table.name": "x",
            "hoodie.datasource.write.recordkey.field": "id",
            "hoodie.populate.meta.fields": "false",
            "hoodie.write.commit.callback.on": "true",
            "hoodie.write.commit.callback.class": "http",
            "hoodie.write.commit.callback.http.url": "http://h/cb",
            "hoodie.write.commit.callback.http.api.key": "k",
            "hoodie.precommit.validators": "equality",
            "hoodie.precommit.validators.equality.sql.queries": (
                "select 1 from <TABLE_NAME>"
            ),
            "hoodie.metrics.on": "true",
            "hoodie.metrics.reporter.type": "console",
        }
    )
    assert cfg.populate_meta_fields is False
    assert cfg.write_commit_callback_on is True
    assert cfg.write_commit_callback_http_url == "http://h/cb"
    assert cfg.write_commit_callback_http_api_key == "k"
    assert cfg.precommit_validators == "equality"
    assert cfg.precommit_equality_sql.startswith("select 1")
    assert cfg.metrics_on is True and cfg.metrics_reporter_type == "CONSOLE"


def test_r8_option_mappings():
    """r8 spellings: record-index file-group sizing and archive-file
    merge batch size."""
    from hudi_0_10_0_spark.datasource import options_to_config

    cfg = options_to_config(
        {
            "hoodie.table.name": "x",
            "hoodie.datasource.write.recordkey.field": "id",
            "hoodie.index.type": "RECORD_INDEX",
            "hoodie.metadata.record.index.min.filegroup.count": "64",
            "hoodie.metadata.record.index.max.filegroup.count": "4096",
            "hoodie.metadata.record.index.max.filegroup.size": "262144",
            "hoodie.archive.merge.files.batch.size": "4",
        }
    )
    assert cfg.index_type == "RECORD_INDEX"
    assert cfg.key_index_buckets == 64
    assert cfg.key_index_max_buckets == 4096
    assert cfg.key_index_bucket_target_bytes == 262144
    assert cfg.archive_merge_batches == 4
