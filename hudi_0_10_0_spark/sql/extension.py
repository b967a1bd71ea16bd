"""``spark.sql(...)`` front door — the Python analogue of injecting
``HoodieSparkSessionExtension`` via ``spark.sql.extensions``.

Reference: ``hudi-spark-datasource/hudi-spark/src/main/scala/org/apache/
spark/sql/hudi/HoodieSparkSessionExtension.scala`` (injects parser +
resolution/post-hoc rules) and ``sql/hudi/analysis/HoodieAnalysis.scala:
58-88,403-431`` (routes MERGE/UPDATE/DELETE/ALTER/TRUNCATE/compaction
plans on Hudi tables into Hudi commands).

A pure-Python engine cannot register Catalyst rules in the JVM, so the
same user experience is achieved one layer up: ``install_sql_extension``
replaces the session's ``sql`` method with a dispatcher that

- executes Hudi-recognized statement shapes that target a REGISTERED
  Hudi table through :class:`HudiSqlSession` (DML writes, DDL, table
  services, introspection), returning a DataFrame like ``spark.sql``
  always does (command results are wrapped; Spark's own commands return
  result DataFrames the same way);
- passes every other statement to the original planner, with the
  registered tables refreshed as snapshot temp views first so plain
  ``SELECT ... FROM hudi_tbl`` resolves against current table state.

``uninstall_sql_extension`` restores the original method.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from .parser import _ID, _WS, HudiSqlSession

# statement shapes the Hudi grammar claims, with the group that names
# the target table — mirrors HoodieAnalysis' pattern matches
_HUDI_SHAPES = [
    rf"MERGE{_WS}INTO{_WS}(?P<t>{_ID})\b",
    rf"UPDATE{_WS}(?P<t>{_ID}){_WS}SET\b",
    rf"DELETE{_WS}FROM{_WS}(?P<t>{_ID})\b",
    rf"INSERT{_WS}(?:INTO|OVERWRITE){_WS}(?P<t>{_ID})\b",
    rf"TRUNCATE{_WS}TABLE{_WS}(?P<t>{_ID})\b",
    rf"DROP{_WS}TABLE{_WS}(?:IF{_WS}EXISTS{_WS})?(?P<t>{_ID})\b",
    rf"ALTER{_WS}TABLE{_WS}(?P<t>{_ID})\b",
    rf"SHOW{_WS}PARTITIONS{_WS}(?P<t>{_ID})\b",
    rf"SHOW{_WS}(?:ARCHIVED{_WS})?COMMITS{_WS}(?:ON{_WS})?(?P<t>{_ID})\b",
    rf"SHOW{_WS}(?:FILES|SAVEPOINTS|CLEANS|ROLLBACKS|RESTORES){_WS}(?:ON{_WS})?(?P<t>{_ID})\b",
    rf"(?:RUN|SCHEDULE|SHOW){_WS}COMPACTION{_WS}(?:ON{_WS})?(?P<t>{_ID})\b",
]
_CREATE_HUDI = rf"CREATE{_WS}TABLE{_WS}.*\bUSING{_WS}(?:hudi)\b"
# tableless statements the Hudi grammar always claims
_SET_HOODIE = rf"SET{_WS}hoodie\.[\w.]+\s*="
# time travel over a registered table anywhere in the statement
_TT_AS_OF = rf"\b(?P<t>{_ID}){_WS}TIMESTAMP{_WS}AS{_WS}OF{_WS}'"


def _claims(session: HudiSqlSession, stmt: str) -> bool:
    """True when the Hudi grammar should handle ``stmt``: a CREATE TABLE
    ... USING hudi, a ``SET hoodie.*`` conf, a Hudi statement shape whose
    target table is registered with ``session``, or a TIMESTAMP AS OF
    over a registered table."""
    s = stmt.strip().rstrip(";").strip()
    if re.match(_CREATE_HUDI, s, re.IGNORECASE | re.DOTALL):
        return True
    if re.match(_SET_HOODIE, s, re.IGNORECASE):
        return True
    for shape in _HUDI_SHAPES:
        m = re.match(shape, s, re.IGNORECASE)
        if m and m.group("t") in session.tables:
            return True
    for m in re.finditer(_TT_AS_OF, s, re.IGNORECASE):
        if m.group("t") in session.tables:
            return True
    return False


def install_sql_extension(
    spark: SparkSession, session: HudiSqlSession | None = None
) -> HudiSqlSession:
    """Patch ``spark.sql`` so Hudi statements on registered tables run
    through the Hudi command layer. Returns the :class:`HudiSqlSession`
    used for table registration (``session.register(name, table)``, also
    done automatically by CREATE TABLE statements)."""
    if getattr(spark, "_hudi_sql_session", None) is not None:
        return spark._hudi_sql_session
    session = session or HudiSqlSession(spark)
    original = spark.sql
    session._raw_sql = original

    def hudi_sql(stmt: str, *args, **kwargs):
        # parameterized spark.sql(query, args=...) is always vanilla
        if args or kwargs or not isinstance(stmt, str):
            return original(stmt, *args, **kwargs)
        if _claims(session, stmt):
            result = session.sql(stmt)
            if isinstance(result, DataFrame):
                return result
            # command results (commit timestamps, None) surface like
            # Spark's own command output: a small result DataFrame
            if result is None:
                return spark.createDataFrame([], "result string")
            return spark.createDataFrame([(str(result),)], "result string")
        # plain relational statement — resolve against fresh snapshots
        session._refresh_views()
        return original(stmt)

    spark.sql = hudi_sql
    spark._hudi_sql_session = session
    return session


def uninstall_sql_extension(spark: SparkSession) -> None:
    session = getattr(spark, "_hudi_sql_session", None)
    if session is None:
        return
    spark.sql = session._raw_sql
    spark._hudi_sql_session = None
