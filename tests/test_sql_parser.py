"""SQL statement surface (sql/parser.py) — the Python analogue of the
reference's session extension + command classes
(``HoodieSparkSessionExtension``, ``sql/hudi/command/*``,
``HoodieSqlCommon.g4:23-33``)."""

import pytest
from pyspark.sql import types as T

from hudi_0_10_0_spark import HudiTable, TableType, WriteConfig
from hudi_0_10_0_spark.sql.parser import HudiSqlSession

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("part", T.StringType()),
        T.StructField("v", T.LongType()),
        T.StructField("name", T.StringType()),
    ]
)


@pytest.fixture()
def hs(spark, tmp_table_path):
    t = HudiTable.create(
        spark,
        tmp_table_path,
        WriteConfig(
            record_key_field="id", partition_field="part", precombine_field="v",
            auto_clean=False, auto_archive=False,
        ),
    )
    t.bulk_insert(
        spark.createDataFrame(
            [(i, "p0" if i % 2 == 0 else "p1", i, f"n{i}") for i in range(10)], SCHEMA
        )
    )
    s = HudiSqlSession(spark)
    s.register("tgt", t)
    return s, t


def test_update_delete_statements(hs):
    s, t = hs
    s.sql("UPDATE tgt SET name = 'upd', v = v + 100 WHERE id % 3 = 0")
    snap = t.snapshot()
    assert snap.filter("name = 'upd'").count() == 4  # ids 0,3,6,9
    assert snap.filter("id = 3").first().v == 103

    s.sql("DELETE FROM tgt WHERE id >= 8")
    assert t.snapshot().count() == 8

    s.sql("DELETE FROM tgt")
    assert t.snapshot().count() == 0


def test_merge_statement_update_delete_insert(hs, spark):
    s, t = hs
    src = spark.createDataFrame(
        [(0, "p0", 1000, "m0"), (1, "p1", 1001, "m1"), (50, "p0", 50, "new")], SCHEMA
    )
    src.createOrReplaceTempView("src_v")
    s.sql(
        """
        MERGE INTO tgt AS t USING src_v AS s
        ON t.id = s.id
        WHEN MATCHED AND s.id = 1 THEN DELETE
        WHEN MATCHED AND s.id != 1 THEN UPDATE SET name = s.name, v = s.v
        WHEN NOT MATCHED THEN INSERT *
        """
        # NOTE: conditions are mutually exclusive, mirroring the
        # reference's own test (TestMergeIntoTable.scala:105-107) —
        # ExpressionPayload tests UPDATE conditions FIRST regardless of
        # clause order, so an unconditional UPDATE would beat the DELETE
    )
    snap = t.snapshot()
    assert snap.count() == 10  # 10 - 1 deleted + 1 inserted
    assert snap.filter("id = 1").count() == 0
    assert snap.filter("id = 0").first().name == "m0"
    assert snap.filter("id = 50").first().name == "new"
    # untouched rows keep their values
    assert snap.filter("id = 2").first().name == "n2"


def test_merge_on_clause_split_newline_and_parens(spark, tmp_table_path):
    """ON-conjunct splitting must treat any-whitespace AND and `)AND(` as
    separators (previously only ' AND ' with a single leading whitespace
    char matched, so 'AND\\n' swallowed the rest of the ON clause into the
    first conjunct's rhs)."""
    t = HudiTable.create(
        spark,
        tmp_table_path,
        WriteConfig(
            record_key_field="id,part", partition_field="part",
            precombine_field="v", auto_clean=False, auto_archive=False,
        ),
    )
    t.bulk_insert(
        spark.createDataFrame(
            [(i, "p0" if i % 2 == 0 else "p1", i, f"n{i}") for i in range(10)],
            SCHEMA,
        )
    )
    s = HudiSqlSession(spark)
    s.register("tgt2", t)
    src = spark.createDataFrame([(0, "p0", 1000, "m0"), (3, "p1", 1003, "m3")], SCHEMA)
    src.createOrReplaceTempView("src2_v")
    # newline-separated AND, no space before the second conjunct's AND
    s.sql(
        "MERGE INTO tgt2 AS t USING src2_v AS s\n"
        "ON t.id = s.id AND\n(t.part = s.part)\n"
        "WHEN MATCHED THEN UPDATE SET name = s.name, v = s.v"
    )
    snap = t.snapshot()
    assert snap.filter("name = 'm0'").count() == 1
    assert snap.filter("name = 'm3'").count() == 1
    # `(x = y)AND(a = b)` with zero whitespace around AND
    src2 = spark.createDataFrame([(4, "p0", 2000, "z4")], SCHEMA)
    src2.createOrReplaceTempView("src2b_v")
    s.sql(
        "MERGE INTO tgt2 AS t USING src2b_v AS s "
        "ON (t.id = s.id)AND(t.part = s.part) "
        "WHEN MATCHED THEN UPDATE SET name = s.name, v = s.v"
    )
    assert t.snapshot().filter("name = 'z4'").count() == 1
    # FULLY parenthesized ON clause: the parens hide the top-level AND —
    # unwrap must re-split, not return one garbage conjunct
    src4 = spark.createDataFrame([(6, "p0", 4000, "y6")], SCHEMA)
    src4.createOrReplaceTempView("src2d_v")
    s.sql(
        "MERGE INTO tgt2 AS t USING src2d_v AS s "
        "ON (t.id = s.id AND t.part = s.part) "
        "WHEN MATCHED THEN UPDATE SET name = s.name, v = s.v"
    )
    assert t.snapshot().filter("name = 'y6'").count() == 1
    # AND inside a string literal must NOT split: this maps part -> ' AND '
    # (a constant source expression), which matches no target row — a
    # naive splitter would instead produce a dangling `'` conjunct and
    # raise "Invalidate Merge-On condition"
    src3 = spark.createDataFrame([(5, "p1", 3000, "w5")], SCHEMA)
    src3.createOrReplaceTempView("src2c_v")
    s.sql(
        "MERGE INTO tgt2 AS t USING src2c_v AS s "
        "ON t.id = s.id AND t.part = ' AND ' "
        "WHEN MATCHED THEN UPDATE SET name = s.name, v = s.v"
    )
    assert t.snapshot().filter("name = 'w5'").count() == 0


def test_merge_with_subquery_source(hs, spark):
    s, t = hs
    s.sql(
        """
        MERGE INTO tgt USING (
            SELECT id, part, v + 1 AS v, 'via_sq' AS name FROM tgt WHERE id < 2
        ) s ON tgt.id = s.id
        WHEN MATCHED THEN UPDATE SET *
        """
    )
    snap = t.snapshot()
    assert snap.filter("name = 'via_sq'").count() == 2
    assert snap.count() == 10


def test_insert_into_and_overwrite(hs, spark):
    s, t = hs
    s.sql("INSERT INTO tgt SELECT 100 AS id, 'p0' AS part, 100 AS v, 'ins' AS name")
    assert t.snapshot().filter("id = 100").first().name == "ins"
    s.sql(
        "INSERT OVERWRITE tgt SELECT 7 AS id, 'p0' AS part, 7 AS v, 'only' AS name"
    )
    snap = t.snapshot()
    # p0 replaced by the single row; p1 untouched
    assert snap.filter("part = 'p0'").count() == 1
    assert snap.filter("part = 'p1'").count() == 5


def test_show_partitions_truncate_alter(hs):
    s, t = hs
    parts = {r.partition for r in s.sql("SHOW PARTITIONS tgt").collect()}
    assert parts == {"p0", "p1"}

    s.sql("ALTER TABLE tgt ADD COLUMNS (score double)")
    assert "score" in t.snapshot().columns

    s.sql("TRUNCATE TABLE tgt")
    assert t.snapshot().count() == 0


def test_compaction_statements(spark, tmp_table_path):
    t = HudiTable.create(
        spark,
        tmp_table_path,
        WriteConfig(
            record_key_field="id", partition_field="part", precombine_field="v",
            table_type=TableType.MERGE_ON_READ, inline_compact=False,
            auto_clean=False, auto_archive=False,
        ),
    )
    df = spark.createDataFrame([(1, "p0", 1, "a")], SCHEMA)
    t.bulk_insert(df)
    t.upsert(spark.createDataFrame([(1, "p0", 2, "b")], SCHEMA))
    s = HudiSqlSession(spark)
    s.register("m", t)

    assert s.sql("SHOW COMPACTION ON m").count() == 0
    s.sql("SCHEDULE COMPACTION ON m")
    assert s.sql("SHOW COMPACTION ON m").count() == 1
    s.sql("RUN COMPACTION ON m")
    assert s.sql("SHOW COMPACTION ON m").count() == 0
    assert t.read_optimized().filter("name = 'b'").count() == 1


def test_plain_select_delegates_to_spark(hs):
    s, t = hs
    rows = s.sql("SELECT COUNT(*) AS n FROM tgt WHERE part = 'p0'").collect()
    assert rows[0].n == 5


def test_show_commits_and_files(hs):
    s, t = hs
    cdf = s.sql("SHOW COMMITS ON tgt")
    assert cdf.count() == len(t.commits())
    assert "total_rows" in cdf.columns
    fdf = s.sql("SHOW FILES ON tgt")
    assert fdf.count() == len(t.file_slices())


def test_insert_static_partition_clause(spark, tmp_table_path):
    """INSERT INTO/OVERWRITE t PARTITION(col='v') SELECT ... (reference
    TestInsertTable static-partition scenarios)."""
    from hudi_0_10_0_spark.sql.parser import HudiSqlSession

    s = HudiSqlSession(spark)
    s.sql(
        f"CREATE TABLE tsp (id bigint, name string, dt string) USING hudi "
        f"PARTITIONED BY (dt) TBLPROPERTIES (primaryKey='id') LOCATION '{tmp_table_path}/tsp'"
    )
    s.sql("INSERT INTO tsp PARTITION(dt='2021-01-01') SELECT 1, 'a'")
    s.sql("INSERT INTO tsp PARTITION(dt='2021-01-02') VALUES (2, 'b')")
    got = sorted(tuple(r) for r in s.sql("SELECT id, name, dt FROM tsp").collect())
    assert got == [(1, "a", "2021-01-01"), (2, "b", "2021-01-02")]
    # overwrite one static partition; the other is untouched
    s.sql("INSERT OVERWRITE tsp PARTITION(dt='2021-01-01') SELECT 9, 'z'")
    got = sorted(tuple(r) for r in s.sql("SELECT id, name, dt FROM tsp").collect())
    assert got == [(2, "b", "2021-01-02"), (9, "z", "2021-01-01")]


def test_drop_multiple_partitions(spark, tmp_table_path):
    from hudi_0_10_0_spark.sql.parser import HudiSqlSession

    s = HudiSqlSession(spark)
    s.sql(
        f"CREATE TABLE tdp (id bigint, dt string) USING hudi PARTITIONED BY (dt) "
        f"TBLPROPERTIES (primaryKey='id') LOCATION '{tmp_table_path}/tdp'"
    )
    s.sql("INSERT INTO tdp VALUES (1,'a'), (2,'b'), (3,'c')")
    s.sql("ALTER TABLE tdp DROP PARTITION (dt='a'), PARTITION (dt='c')")
    got = sorted(tuple(r) for r in s.sql("SELECT id, dt FROM tdp").collect())
    assert got == [(2, "b")]


def test_drop_table_and_purge(spark, tmp_table_path):
    from hudi_0_10_0_spark import HudiTable
    from hudi_0_10_0_spark.sql.parser import HudiSqlSession

    s = HudiSqlSession(spark)
    s.sql(
        f"CREATE TABLE td (id bigint) USING hudi TBLPROPERTIES (primaryKey='id') "
        f"LOCATION '{tmp_table_path}/td'"
    )
    s.sql("INSERT INTO td VALUES (1)")
    s.sql("DROP TABLE td")
    assert "td" not in s.tables
    # without PURGE the data survives on disk
    assert HudiTable.exists(spark, f"{tmp_table_path}/td")
    s.sql("DROP TABLE IF EXISTS td")  # unregistered + IF EXISTS → no-op

    s.sql(
        f"CREATE TABLE tp2 (id bigint) USING hudi TBLPROPERTIES (primaryKey='id') "
        f"LOCATION '{tmp_table_path}/tp2'"
    )
    s.sql("DROP TABLE tp2 PURGE")
    assert not HudiTable.exists(spark, f"{tmp_table_path}/tp2")


def test_show_archived_commits(spark, tmp_table_path):
    from hudi_0_10_0_spark import HudiTable, WriteConfig
    from hudi_0_10_0_spark.sql.parser import HudiSqlSession

    t = HudiTable.create(
        spark, tmp_table_path + "/arc",
        WriteConfig(record_key_field="id", precombine_field="ts",
                    keep_min_commits=3, keep_max_commits=5, auto_clean=False),
    )
    for i in range(8):
        t.upsert(spark.createDataFrame([(1, i, i)], "id long, v long, ts long"))
    s = HudiSqlSession(spark)
    s.register("arc", t)
    rows = s.sql("SHOW ARCHIVED COMMITS arc").collect()
    assert len(rows) >= 1
    assert all(r.action for r in rows)


def test_show_savepoints_and_cleans(spark, tmp_table_path):
    """hudi-cli `savepoints show` / `cleans show` analogues as SHOW
    statements."""
    from pyspark.sql import functions as F

    from hudi_0_10_0_spark import HudiTable, WriteConfig
    from hudi_0_10_0_spark.sql.parser import HudiSqlSession

    t = HudiTable.create(
        spark, tmp_table_path + "/svc",
        WriteConfig(record_key_field="id", precombine_field="ts",
                    cleaner_commits_retained=1, auto_clean=False,
                    auto_archive=False),
    )
    df = spark.createDataFrame([(1, 1, 1)], "id long, v long, ts long")
    c0 = t.bulk_insert(df)
    t.savepoint(c0)
    for i in range(3):
        t.upsert(df.withColumn("v", F.lit(10 + i)))
    t.clean()
    s = HudiSqlSession(spark)
    s.register("svc", t)
    sp = s.sql("SHOW SAVEPOINTS ON svc").collect()
    assert len(sp) == 1 and sp[0].savepoint_at == c0
    cl = s.sql("SHOW CLEANS ON svc").collect()
    assert len(cl) == 1 and cl[0].files_deleted >= 1


def test_create_table_column_validate(spark, tmp_table_path):
    """'Test Table Column Validate' (TestCreateTable.scala:194): unknown
    primaryKey / preCombineField / bad type are rejected at CREATE."""
    import pytest

    from hudi_0_10_0_spark.sql.parser import HudiSqlSession

    s = HudiSqlSession(spark)
    cols = "(id int, name string, price double, ts long)"
    with pytest.raises(ValueError, match="primarykey `id1`"):
        s.sql(f"CREATE TABLE v1 {cols} USING hudi TBLPROPERTIES (primaryKey='id1', type='cow') LOCATION '{tmp_table_path}/v1'")
    with pytest.raises(ValueError, match="precombinefield `ts1`"):
        s.sql(f"CREATE TABLE v2 {cols} USING hudi TBLPROPERTIES (primaryKey='id', preCombineField='ts1', type='cow') LOCATION '{tmp_table_path}/v2'")
    with pytest.raises(ValueError, match="'type' must be 'cow' or 'mor'"):
        s.sql(f"CREATE TABLE v3 {cols} USING hudi TBLPROPERTIES (primaryKey='id', preCombineField='ts', type='cow1') LOCATION '{tmp_table_path}/v3'")
    # valid create still works
    s.sql(f"CREATE TABLE v4 {cols} USING hudi TBLPROPERTIES (primaryKey='id', preCombineField='ts', type='mor') LOCATION '{tmp_table_path}/v4'")
    assert "v4" in s.tables


def test_create_table_from_existing(spark, tmp_table_path):
    """'Test Create Table From Exist Hoodie Table' (TestCreateTable.scala:
    333,410): CREATE TABLE with just a name and LOCATION over an existing
    table loads the STORED config — including multi-level partitioning —
    and the data is immediately queryable."""
    from pyspark.sql import functions as F

    from hudi_0_10_0_spark import HudiTable, WriteConfig
    from hudi_0_10_0_spark.sql.parser import HudiSqlSession

    df = spark.createDataFrame(
        [(1, "a", 1, "2021", "10"), (2, "b", 2, "2021", "11")],
        "id int, name string, ts long, year string, month string",
    )
    t = HudiTable.create(
        spark, tmp_table_path + "/src",
        WriteConfig(record_key_field="id", precombine_field="ts",
                    partition_field="year,month", hive_style_partitioning=True),
    )
    t.bulk_insert(df)

    s = HudiSqlSession(spark)
    s.sql(f"CREATE TABLE adopted USING hudi LOCATION '{tmp_table_path}/src'")
    t2 = s.tables["adopted"]
    assert t2.cfg.partition_fields() == ["year", "month"]
    assert sorted(r[0] for r in s.sql("SHOW PARTITIONS adopted").collect()) == [
        "year=2021/month=10", "year=2021/month=11",
    ]
    assert sorted(tuple(r) for r in s.sql("SELECT id, name FROM adopted").collect()) == [
        (1, "a"), (2, "b"),
    ]
    # writes through the adopted handle use the stored key config
    s.sql("UPDATE adopted SET name = 'z' WHERE id = 1")
    assert t.snapshot().filter("id = 1").first().name == "z"


def test_create_table_from_existing_identity_conflicts(spark, tmp_table_path):
    """ADVICE r5: CREATE TABLE over an existing location must reject an
    EXPLICITLY supplied type or PARTITIONED BY that contradicts the
    stored config (primaryKey/preCombineField were already checked) —
    silently adopting the stored values would hand the user a handle
    whose declared identity is a lie."""
    import pytest

    from hudi_0_10_0_spark import HudiTable, WriteConfig
    from hudi_0_10_0_spark.config import TableType
    from hudi_0_10_0_spark.sql.parser import HudiSqlSession

    t = HudiTable.create(
        spark, tmp_table_path + "/src2",
        WriteConfig(record_key_field="id", precombine_field="ts",
                    partition_field="part",
                    table_type=TableType.MERGE_ON_READ),
    )
    t.bulk_insert(spark.createDataFrame(
        [(1, "p0", 1)], "id int, part string, ts long"))

    s = HudiSqlSession(spark)
    loc = f"{tmp_table_path}/src2"
    with pytest.raises(ValueError, match="type"):
        s.sql(f"CREATE TABLE bad1 USING hudi TBLPROPERTIES (type = 'cow') LOCATION '{loc}'")
    with pytest.raises(ValueError, match="PARTITIONED BY"):
        s.sql(f"CREATE TABLE bad2 USING hudi PARTITIONED BY (id) LOCATION '{loc}'")
    # agreeing explicit identity props still adopt fine
    s.sql(f"CREATE TABLE ok USING hudi TBLPROPERTIES (type = 'mor') PARTITIONED BY (part) LOCATION '{loc}'")
    assert s.tables["ok"].cfg.partition_fields() == ["part"]


def test_update_ignoring_case(spark, tmp_table_path):
    """'Test ignoring case for Update Table' (TestUpdateTable.scala:63):
    differently-cased column references in UPDATE resolve."""
    from hudi_0_10_0_spark import HudiTable, WriteConfig
    from hudi_0_10_0_spark.sql.parser import HudiSqlSession

    t = HudiTable.create(
        spark, tmp_table_path + "/uc",
        WriteConfig(record_key_field="id", precombine_field="ts"),
    )
    t.bulk_insert(spark.createDataFrame([(1, "a1", 10.0, 1000)], "id int, name string, price double, ts long"))
    s = HudiSqlSession(spark)
    s.register("tuc", t)
    s.sql("UPDATE tuc SET PRICE = 20.0 WHERE ID = 1")
    row = t.snapshot().select("id", "price").first()
    assert (row.id, row.price) == (1, 20.0)
    cols = [c.lower() for c in t.snapshot().columns]
    assert cols.count("price") == 1  # replaced in place, not duplicated


def test_create_table_hoodie_tblproperties_passthrough(spark, tmp_table_path):
    """Raw hoodie.* TBLPROPERTIES flow into the write config like the
    reference's catalogProperties merge (e.g. TestMergeIntoLogOnlyTable
    sets hoodie.index.type = 'INMEMORY', hoodie.compact.inline='true')."""
    from hudi_0_10_0_spark import TableType
    from hudi_0_10_0_spark.sql.parser import HudiSqlSession

    s = HudiSqlSession(spark)
    s.sql(
        f"""CREATE TABLE hp (id int, name string, price double, ts long)
        USING hudi TBLPROPERTIES (
          primaryKey = 'id', preCombineField = 'ts', type = 'mor',
          hoodie.index.type = 'INMEMORY',
          hoodie.compact.inline = 'true',
          hoodie.compact.inline.max.delta.commits = '2',
          hoodie.parquet.max.file.size = '10000'
        ) LOCATION '{tmp_table_path}/hp'"""
    )
    t = s.tables["hp"]
    assert t.cfg.index_type == "INMEMORY"
    assert t.cfg.inline_compact is True
    assert t.cfg.compact_max_delta_commits == 2
    assert t.cfg.max_file_size_bytes == 10000
    assert t.cfg.table_type == TableType.MERGE_ON_READ
    assert t.cfg.record_key_field == "id"
    # the table is writable/readable under that config
    s.sql("INSERT INTO hp VALUES (1, 'a', 1.0, 1)")
    s.sql("INSERT INTO hp VALUES (1, 'a', 2.0, 2)")
    row = t.snapshot().select("id", "price").first()
    assert (row.id, row.price) == (1, 2.0)


def test_show_rollbacks_restores_and_front_door_set(spark, tmp_table_path):
    """hudi-cli `show rollbacks` / `show restores` analogues; SET and
    TIMESTAMP AS OF also work through the patched spark.sql front door."""
    from pyspark.sql import functions as F

    from hudi_0_10_0_spark import HudiTable, WriteConfig
    from hudi_0_10_0_spark.sql.extension import (
        install_sql_extension,
        uninstall_sql_extension,
    )
    from hudi_0_10_0_spark.sql.parser import HudiSqlSession

    t = HudiTable.create(
        spark, tmp_table_path + "/rr",
        WriteConfig(record_key_field="id", precombine_field="ts",
                    auto_clean=False, auto_archive=False),
    )
    df = spark.createDataFrame([(1, 1, 1)], "id long, v long, ts long")
    c0 = t.bulk_insert(df)
    t.savepoint(c0)
    c1 = t.upsert(df.withColumn("v", F.lit(2)))
    t.rollback(c1)
    t.upsert(df.withColumn("v", F.lit(3)))
    t.restore(c0)

    s = HudiSqlSession(spark)
    s.register("trr", t)
    rb = s.sql("SHOW ROLLBACKS ON trr").collect()
    assert len(rb) >= 1 and rb[0].rolled_back == c1
    rs = s.sql("SHOW RESTORES ON trr").collect()
    assert len(rs) == 1 and rs[0].restored_to == c0

    # spark.sql front door routes the newer statements too
    install_sql_extension(spark, s)
    try:
        spark.sql("SET hoodie.sql.insert.mode = non-strict")
        assert spark.conf.get("hoodie.sql.insert.mode") == "non-strict"
        spark.sql("SET hoodie.sql.insert.mode = upsert")
        got = spark.sql(f"SELECT v FROM trr TIMESTAMP AS OF '{c0}'").collect()
        assert [r.v for r in got] == [1]
        assert spark.sql("SHOW ROLLBACKS ON trr").count() >= 1
    finally:
        uninstall_sql_extension(spark)


def test_compaction_on_path_literal(spark, tmp_table_path):
    """'Test compaction path' (TestCompactionTable.scala:73): RUN/SHOW
    COMPACTION accept a quoted table path instead of a registered name
    (CompactionHoodiePathCommand)."""
    from pyspark.sql import functions as F

    from hudi_0_10_0_spark import HudiTable, TableType, WriteConfig
    from hudi_0_10_0_spark.sql.parser import HudiSqlSession

    path = tmp_table_path + "/cp"
    t = HudiTable.create(
        spark, path,
        WriteConfig(record_key_field="id", precombine_field="ts",
                    table_type=TableType.MERGE_ON_READ, inline_compact=False),
    )
    df = spark.createDataFrame([(1, 10.0, 1)], "id long, price double, ts long")
    t.bulk_insert(df)
    t.upsert(df.withColumn("price", F.lit(11.0)))
    s = HudiSqlSession(spark)
    s.sql(f"SCHEDULE COMPACTION ON '{path}'")
    assert len(s.sql(f"SHOW COMPACTION ON '{path}'").collect()) == 1
    s.sql(f"RUN COMPACTION ON '{path}'")
    assert len(s.sql(f"SHOW COMPACTION ON '{path}'").collect()) == 0
    assert t.read_optimized().first().price == 11.0


def test_vanilla_sql_view_refresh_cached_by_fingerprint(spark, tmp_table_path):
    """VERDICT r2 #4: repeated vanilla SELECTs must not rebuild every
    registered table's snapshot temp view — the refresh is skipped while
    the table's timeline fingerprint is unchanged, and re-runs after a
    commit."""
    from hudi_0_10_0_spark import HudiTable, WriteConfig
    from hudi_0_10_0_spark.sql.extension import (
        install_sql_extension,
        uninstall_sql_extension,
    )

    t = HudiTable.create(
        spark, tmp_table_path + "/vc",
        WriteConfig(record_key_field="id", precombine_field="ts"),
    )
    t.bulk_insert(spark.createDataFrame(
        [(1, "a", 1000)], "id int, name string, ts long"))

    calls = {"n": 0}
    orig_snapshot = t.snapshot

    def counting_snapshot(*a, **k):
        calls["n"] += 1
        return orig_snapshot(*a, **k)

    t.snapshot = counting_snapshot
    s = install_sql_extension(spark)
    try:
        s.register("tvc", t)
        assert spark.sql("SELECT count(*) AS n FROM tvc").collect()[0].n == 1
        first = calls["n"]
        assert first >= 1
        # steady state: no snapshot rebuild per statement
        for _ in range(3):
            spark.sql("SELECT count(*) AS n FROM tvc").collect()
        assert calls["n"] == first
        # a commit changes the fingerprint → exactly one more rebuild
        t.upsert(spark.createDataFrame([(2, "b", 1001)], "id int, name string, ts long"))
        assert spark.sql("SELECT count(*) AS n FROM tvc").collect()[0].n == 2
        after = calls["n"]
        assert after > first
        spark.sql("SELECT count(*) AS n FROM tvc").collect()
        assert calls["n"] == after
    finally:
        uninstall_sql_extension(spark)
        t.snapshot = orig_snapshot
