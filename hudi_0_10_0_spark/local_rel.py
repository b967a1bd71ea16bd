"""Tiny driver-side metadata DataFrames as JVM local relations.

``spark.createDataFrame(list_of_rows, schema)`` parallelizes pickled
rows into ``defaultParallelism`` PythonRDD slices: every job that reads
the frame then launches one task per slice, and each task blocks on a
JVM→Python-worker round trip just to emit a handful of metadata rows.
Measured on the write path (the insert-bucket broadcast feeding
``assign_inserts``): 32 tasks blocked 8-10 s each under load with ~10 ms
of actual CPU — the Python boundary is the entire cost (optimization
guide §4).

Building the same rows as ONE Arrow record batch instead turns the frame
into a ``LocalTableScan``: the data is materialized on the JVM at
creation, broadcast builds read it driver-side without launching a
single task, and no Python worker is ever involved.  Any row/ type shape
Arrow cannot represent falls back to the plain path — correctness never
depends on the fast path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


# types whose Python→Arrow and Python→pickled-row conversions agree
# value-for-value. Deliberately EXCLUDES timestamps: pa.array treats a
# naive datetime as UTC while the plain path treats it as session-local
# — same schema, silently shifted instants (code-review r8). Anything
# outside the list takes the plain path.
_SAFE_TYPES = (
    T.StringType, T.LongType, T.IntegerType, T.ShortType, T.ByteType,
    T.BooleanType, T.DoubleType, T.FloatType, T.BinaryType, T.DateType,
)


def local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` for small driver-side
    metadata row lists, materialized as a JVM ``LocalTableScan`` (one
    Arrow batch) instead of a parallelized PythonRDD.  ``schema`` is a
    DDL string or StructType; ``rows`` a list of tuples.

    Validation caveat (advice r8): the Arrow path is MORE LENIENT than
    plain createDataFrame — ``pa.array`` silently coerces values the
    row verifier would reject with TypeError (e.g. a Python int into a
    double column), so which path fires determines whether a
    wrongly-typed value errors or coerces. Every current call site
    passes values already typed to the schema; callers must not rely
    on this function for type VALIDATION."""
    st = schema if isinstance(schema, T.StructType) else T.StructType.fromDDL(schema)
    # empty row lists carry no values to mis-convert — any schema may
    # take the fast path (the empty-table reader passes full table
    # schemas with timestamp columns)
    if rows and not all(isinstance(f.dataType, _SAFE_TYPES) for f in st.fields):
        return spark.createDataFrame(rows, st)
    try:
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        pa_schema = to_arrow_schema(st)
        cols = list(zip(*rows)) if rows else [[] for _ in st.fields]
        arrays = [
            pa.array(list(c), type=f.type)
            for c, f in zip(cols, pa_schema)
        ]
        df = spark.createDataFrame(pa.Table.from_arrays(arrays, schema=pa_schema))
        # Arrow → Spark type round-trips exactly for the primitive
        # types metadata frames use; anything else falls back below
        if df.schema != st:
            raise ValueError("arrow schema round-trip mismatch")
        return df
    except Exception:
        return spark.createDataFrame(rows, st)
