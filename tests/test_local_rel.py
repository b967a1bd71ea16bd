"""local_rel.local_df: tiny metadata DataFrames must become JVM local
relations (no PythonRDD/parallelize scan — optimization r8) while
answering exactly like the plain createDataFrame path."""

import pytest
from pyspark.sql import types as T

from hudi_0_10_0_spark.local_rel import local_df

CASES = [
    # (rows, schema) — the shapes the write/read hot paths build
    (
        [("p0", "fid0"), ("p1", "fid1")],
        "_hoodie_partition_path string, _hoodie_file_id string",
    ),
    (
        [("p0", 0, 10, "f" * 16, True, 100), ("p1", 10, 100, "g" * 16, False, 100)],
        T.StructType(
            [
                T.StructField("_hoodie_partition_path", T.StringType()),
                T.StructField("__bstart", T.LongType()),
                T.StructField("__bend", T.LongType()),
                T.StructField("__bfid", T.StringType()),
                T.StructField("__bexisting", T.BooleanType()),
                T.StructField("__btotal", T.LongType()),
            ]
        ),
    ),
    # nulls in string columns (bootstrap partition values, key ranges)
    (
        [("pp", "fid", "i0", None, None), ("pp2", "fid2", "i1", "a", "z")],
        "__cpp string, _hoodie_file_id string, __inst string, __mn string, __mx string",
    ),
    # empty row list
    ([], "k string, p string, f string"),
]


@pytest.mark.parametrize("rows,schema", CASES)
def test_local_df_matches_plain_createDataFrame(spark, rows, schema):
    fast = local_df(spark, rows, schema)
    slow = spark.createDataFrame(
        rows,
        schema if isinstance(schema, T.StructType) else T.StructType.fromDDL(schema),
    )
    assert fast.schema == slow.schema
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, slow.collect()))


@pytest.mark.parametrize("rows,schema", CASES)
def test_local_df_is_a_local_relation(spark, rows, schema):
    fast = local_df(spark, rows, schema)
    plan = fast._jdf.queryExecution().optimizedPlan().toString()
    assert "LocalRelation" in plan or "LocalTableScan" in plan
    # the whole point: no parallelize/PythonRDD scan behind the frame
    assert "Scan ExistingRDD" not in plan


def test_local_df_falls_back_on_unrepresentable_rows(spark):
    # a value Arrow cannot coerce to the declared type must not crash —
    # the plain createDataFrame path takes over (and raises or coerces
    # exactly as before)
    rows = [({"k": 1},)]
    df = local_df(spark, rows, "m map<string,int>")
    assert df.collect()[0][0] == {"k": 1}
