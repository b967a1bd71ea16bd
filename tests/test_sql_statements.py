"""Golden-file SQL corpus harness — the analogue of the reference's
``TestSqlStatement.scala:45`` (``execSqlFile``) running
``sql-statements.sql`` parameterized by ``${tableType}``.

Statements execute through :class:`HudiSqlSession`; ``-- expect [...]``
comments pin the (sorted) rows of the following statement as JSON,
``-- expect rows=N`` pins only the count.
"""

from __future__ import annotations

import json
import math
import os
import re

import pytest

from hudi_0_10_0_spark.sql.parser import HudiSqlSession

CORPUS = os.path.join(os.path.dirname(__file__), "sql_statements.sql")


def _statements(text: str):
    """Yield (expect, statement) pairs; expect is None, int, or rows."""
    # strip comment lines but keep "-- expect" markers
    expect = None
    buf: list[str] = []
    for line in text.splitlines():
        stripped = line.strip()
        if stripped.startswith("--"):
            m = re.match(r"--\s*expect\s+rows=(\d+)", stripped)
            if m:
                expect = int(m.group(1))
                continue
            m = re.match(r"--\s*expect\s+(\[.*)", stripped)
            if m:
                expect = json.loads(m.group(1))
            continue
        buf.append(line)
        if stripped.endswith(";"):
            stmt = "\n".join(buf).strip().rstrip(";").strip()
            if stmt:
                yield expect, stmt
            expect, buf = None, []


def _canon(v):
    if isinstance(v, float):
        return round(v, 6)
    return v


def _run_corpus(sql_fn, text, df_required):
    for i, (expect, stmt) in enumerate(_statements(text)):
        result = sql_fn(stmt)
        if expect is None:
            continue
        if df_required:
            assert hasattr(result, "collect"), f"stmt {i} expected rows: {stmt[:80]}"
        rows = [[_canon(v) for v in r] for r in result.collect()]
        if isinstance(expect, int):
            assert len(rows) == expect, f"stmt {i}: {stmt[:80]} -> {rows}"
        else:
            want = sorted([[_canon(v) for v in r] for r in expect])
            got = sorted(rows)
            assert got == want, f"stmt {i}: {stmt[:80]}\n got {got}\nwant {want}"


@pytest.mark.parametrize("table_type", ["cow", "mor"])
def test_sql_statement_corpus(spark, tmp_table_path, table_type):
    text = open(CORPUS).read()
    text = text.replace("${DIR}", f"{tmp_table_path}/{table_type}")
    text = text.replace("${TYPE}", table_type)
    sess = HudiSqlSession(spark)
    _run_corpus(sess.sql, text, df_required=True)


@pytest.mark.parametrize("table_type", ["cow", "mor"])
def test_sql_statement_corpus_through_spark_sql(spark, tmp_table_path, table_type):
    """Same golden corpus, but every statement goes through the patched
    ``spark.sql(...)`` front door (install_sql_extension) — the UX of the
    reference's HoodieSparkSessionExtension."""
    from hudi_0_10_0_spark.sql import install_sql_extension, uninstall_sql_extension

    text = open(CORPUS).read()
    text = text.replace("${DIR}", f"{tmp_table_path}/ext_{table_type}")
    text = text.replace("${TYPE}", table_type)
    install_sql_extension(spark)
    try:
        # every spark.sql return is a DataFrame, command or query alike
        _run_corpus(spark.sql, text, df_required=True)
    finally:
        uninstall_sql_extension(spark)
