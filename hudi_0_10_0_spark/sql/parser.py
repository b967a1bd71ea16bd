"""SQL statement surface over registered tables.

The reference injects a Spark session extension: a small ANTLR grammar
for compaction statements (``HoodieSqlCommon.g4:23-33``) plus analysis
rules that turn MERGE/UPDATE/DELETE/ALTER/TRUNCATE/SHOW plans into Hudi
commands (``sql/hudi/analysis/HoodieAnalysis.scala:58-88,403-431``). A
Python-only engine can't inject Catalyst rules, so this module is the
equivalent front door: it parses the Hudi-specific statement shapes
itself (same surface as ``sql/hudi/command/*``) and delegates every
plain relational statement to ``spark.sql`` with the registered tables
exposed as snapshot temp views.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..payloads import NEW, OLD

_WS = r"\s+"
_ID = r"[A-Za-z_][A-Za-z0-9_]*"


def _split_top_level(s: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` outside parens/quotes."""
    out, depth, cur, q = [], 0, [], None
    for ch in s:
        if q:
            cur.append(ch)
            if ch == q:
                q = None
            continue
        if ch in "'\"":
            q = ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == sep and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return [x for x in out if x]


def _split_top_word(s: str, word: str) -> list[str]:
    """Split on a WORD separator (case-insensitive, token boundaries —
    BRAND/ANDREW don't split) outside parens and both quote styles."""
    out, depth, cur, q, i, n = [], 0, [], None, 0, len(s)
    wl, wu = len(word), word.upper()
    while i < n:
        ch = s[i]
        if q:
            cur.append(ch)
            if ch == q:
                q = None
            i += 1
            continue
        if ch in "'\"":
            q = ch
            cur.append(ch)
            i += 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if (
            depth == 0
            and s[i:i + wl].upper() == wu
            and (i == 0 or not (s[i - 1].isalnum() or s[i - 1] in "_$"))
            and (i + wl >= n or not (s[i + wl].isalnum() or s[i + wl] in "_$"))
        ):
            out.append("".join(cur))
            cur = []
            i += wl
            continue
        cur.append(ch)
        i += 1
    out.append("".join(cur))
    return [x.strip() for x in out if x.strip()]


def _strip_outer_parens(x: str) -> str:
    """Strip balanced outer parens — '(a = b)' → 'a = b' — with
    quote-aware balancing so literals containing parens can't confuse
    the count (e.g. ``(t.part = ')')``)."""
    x = x.strip()
    while x.startswith("(") and x.endswith(")"):
        depth, q, closes_at_end = 0, None, False
        for k, c in enumerate(x):
            if q:
                if c == q:
                    q = None
                continue
            if c in "'\"":
                q = c
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    closes_at_end = k == len(x) - 1
                    break
        if not closes_at_end:
            return x  # outer parens close early: not one group
        x = x[1:-1].strip()
    return x


def _split_top_and(s: str) -> list[str]:
    """Top-level AND conjuncts of a boolean expression: split outside
    parens/quotes, strip grouping parens, and RE-SPLIT what the parens
    hid — ``(a = b AND c = d)`` yields both conjuncts."""
    out: list[str] = []
    for part in _split_top_word(s, "AND"):
        inner = _strip_outer_parens(part)
        if inner != part:
            out.extend(_split_top_and(inner))
        else:
            out.append(inner)
    return [x for x in out if x]


class HudiSqlSession:
    """``sql(stmt)`` over registered HudiTables — the Python analogue of
    ``HoodieSparkSessionExtension``."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.tables: dict[str, object] = {}
        # timeline fingerprint at last temp-view registration per table
        # (VERDICT r2 #4: skip per-statement view churn when nothing
        # committed since — fingerprint() is one directory listing vs a
        # full snapshot plan build + createOrReplaceTempView)
        self._view_fps: dict[str, tuple] = {}
        # the vanilla planner entry point — kept separate so that
        # install_sql_extension can patch spark.sql to route through
        # THIS object without recursing back into itself
        self._raw_sql = spark.sql

    def register(self, name: str, table) -> None:
        self.tables[name] = table
        self._view_fps.pop(name, None)

    def _table(self, name: str):
        t = self.tables.get(name)
        if t is None:
            raise ValueError(f"not a registered hudi table: {name}")
        return t

    def _refresh_views(self) -> None:
        self._refresh_views_except(None)

    # -- MERGE INTO ---------------------------------------------------------
    def _merge(self, stmt: str) -> str:
        m = re.match(
            rf"MERGE{_WS}INTO{_WS}(?P<tgt>{_ID})(?:{_WS}(?:AS{_WS})?(?P<talias>{_ID}))?"
            rf"{_WS}USING{_WS}(?P<src>\(.*\)|{_ID})(?:{_WS}(?:AS{_WS})?(?P<salias>{_ID}))?"
            rf"{_WS}ON{_WS}(?P<on>.*?)(?P<whens>{_WS}WHEN{_WS}.*)$",
            stmt,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise ValueError(f"cannot parse MERGE statement: {stmt[:120]}")
        t = self._table(m.group("tgt"))
        talias = m.group("talias") or m.group("tgt")
        salias = m.group("salias")
        src_spec = m.group("src").strip()
        if src_spec.startswith("("):
            self._refresh_views()
            source = self._raw_sql(src_spec[1:-1])
            salias = salias or "src"
        else:
            if src_spec in self.tables:
                source = self._table(src_spec).snapshot()
            else:
                self._refresh_views()
                source = self.spark.table(src_spec)
            salias = salias or src_spec

        # SQL identifiers are case-insensitive: canonicalize the source's
        # column names to the target schema's spelling so differently-
        # cased source columns (TestMergeIntoTable2 "Test ignoring case",
        # "...Differ In Case Only") match instead of duplicating columns
        canon = {f.name.lower(): f.name for f in t.read_schema().fields}
        source = source.select(
            *[
                F.col(f"`{c}`").alias(canon.get(c.lower(), c))
                for c in source.columns
            ]
        )

        def _col(name: str) -> str:
            return canon.get(name.lower(), name)

        def rewrite(expr: str) -> str:
            # alias.col → merge-frame prefixed columns (ExpressionPayload
            # evaluates against the joined old/new frame); alias and
            # column matching are case-insensitive like SQL itself
            expr = re.sub(
                rf"\b{re.escape(talias)}\.({_ID})",
                lambda mm: f"`{OLD}{_col(mm.group(1))}`",
                expr,
                flags=re.IGNORECASE,
            )
            expr = re.sub(
                rf"\b{re.escape(salias)}\.({_ID})",
                lambda mm: f"`{NEW}{_col(mm.group(1))}`",
                expr,
                flags=re.IGNORECASE,
            )
            return expr

        # ---- ON-clause validation (MergeIntoHoodieTableCommand.scala:
        # 94-117 targetKey2SourceExpression): conjuncts must be
        # equalities 'targetColumn = sourceExpression', every record-key
        # field must be covered, and differently-named source
        # expressions are remapped onto the source frame. Previously the
        # ON text was parsed but silently ignored.
        on_text = m.group("on").strip()
        key_map: dict[str, str] = {}
        for conj in _split_top_and(on_text):
            if re.search(r"<=|>=|!=|<>|<|>", conj):
                raise ValueError(
                    "Non-Equal condition is not support for Merge Into "
                    f"Statement: {conj}"
                )
            if "=" not in conj:
                raise ValueError(f"Invalidate Merge-On condition: {conj}")
            lhs, rhs = conj.split("=", 1)

            def _target_col(e: str) -> str | None:
                e = e.strip()
                mm = re.fullmatch(
                    rf"(?:{re.escape(talias)}\.)?({_ID})", e, re.IGNORECASE
                )
                return mm.group(1) if mm and mm.group(1).lower() in canon else None

            tcol, sexpr = _target_col(lhs), rhs
            if tcol is None:
                tcol, sexpr = _target_col(rhs), lhs
            if tcol is None:
                raise ValueError(
                    f"Invalidate Merge-On condition: {conj}. The validate "
                    "condition should be 'targetColumn = sourceColumnExpression', "
                    "e.g. t.id = s.id"
                )
            key_map[_col(tcol)] = sexpr.strip()
        key_fields = [_col(k) for k in t.cfg.key_fields()]
        missing = [k for k in key_fields if k not in key_map]
        if missing:
            raise ValueError(
                f"Merge-On condition must assign every record key field; "
                f"missing: {missing} (e.g. ON t.{missing[0]} = s.{missing[0]})"
            )
        extra = [k for k in key_map if k not in key_fields]
        if extra:
            raise ValueError(
                "Merge-On condition only supports record-key equality; "
                f"move conditions on {extra} into WHEN ... AND clauses"
            )
        for kf in key_fields:
            bare = re.sub(
                rf"\b{re.escape(salias)}\.({_ID})",
                lambda mm: f"`{mm.group(1)}`",
                key_map[kf],
                flags=re.IGNORECASE,
            ).strip()
            if re.fullmatch(rf"`?{re.escape(kf)}`?", bare, re.IGNORECASE):
                continue  # identity mapping — source already carries it
            source = source.withColumn(kf, F.expr(bare))

        kw: dict = {"matched_update": None, "not_matched_insert": False}
        for when in re.finditer(
            rf"WHEN{_WS}(?P<not>NOT{_WS})?MATCHED(?:{_WS}AND{_WS}(?P<cond>.*?))?"
            rf"{_WS}THEN{_WS}(?P<act>UPDATE{_WS}SET{_WS}.*?|DELETE|INSERT{_WS}\*)"
            rf"(?=\s+WHEN\s|\s*$)",
            m.group("whens"),
            re.IGNORECASE | re.DOTALL,
        ):
            cond = F.expr(rewrite(when.group("cond"))) if when.group("cond") else None
            act = when.group("act").strip()
            up = re.match(rf"UPDATE{_WS}SET{_WS}(.*)$", act, re.IGNORECASE | re.DOTALL)
            if when.group("not"):
                if not re.match(r"INSERT\s*\*", act, re.IGNORECASE):
                    raise ValueError("only INSERT * is supported in WHEN NOT MATCHED")
                kw["not_matched_insert"] = True
                kw["not_matched_condition"] = cond
            elif up:
                sets = up.group(1).strip()
                if sets == "*":
                    kw["matched_update"] = "all"
                else:
                    assignments = {}
                    for a in _split_top_level(sets):
                        col, expr = a.split("=", 1)
                        col = _col(col.strip().split(".")[-1])
                        assignments[col] = F.expr(rewrite(expr.strip()))
                    kw["matched_update"] = assignments
                kw["matched_condition"] = cond
            else:  # DELETE
                kw["matched_delete"] = cond if cond is not None else F.lit(True)
        # Reference parity (TestPartialUpdateForMergeInto.scala "Test
        # MergeInto Exception"): a partial UPDATE SET on a table with a
        # preCombine field must assign it, otherwise the merged row would
        # carry the OLD ordering value and lose future conflict resolution.
        pc = t.cfg.precombine_field
        if (
            pc
            and isinstance(kw.get("matched_update"), dict)
            and _col(pc) not in kw["matched_update"]
        ):
            raise ValueError(
                f"Missing specify value for the preCombineField: {_col(pc)} in "
                f"merge-into update action. You should add '... update set "
                f"{_col(pc)} = xx....' to the when-matched clause."
            )
        return t.merge_into(source, **kw)

    # -- CREATE TABLE [AS SELECT] -------------------------------------------
    def _create_table(self, s: str):
        """CREATE TABLE (``CreateHoodieTableCommand`` /
        ``CreateHoodieTableAsSelectCommand``): table properties carry the
        key/precombine/type config exactly like the reference's SQL
        surface (primaryKey / preCombineField / type)."""
        m = re.match(
            rf"CREATE{_WS}TABLE{_WS}(?:IF{_WS}NOT{_WS}EXISTS{_WS})?(?P<name>{_ID})"
            rf"(?:\s*\((?P<cols>(?:[^()]|\([^()]*\))*)\))?"
            rf"{_WS}USING{_WS}(?:hudi|HUDI|Hudi)"
            # PARTITIONED BY / TBLPROPERTIES / LOCATION appear in any
            # order (Spark's grammar allows it; reference tests use both
            # "tblproperties ... partitioned by" and the reverse)
            rf"(?:{_WS}(?:"
            rf"PARTITIONED{_WS}BY\s*\((?P<parts>(?:[^()]|\([^()]*\))*)\)"
            rf"|(?:TBLPROPERTIES|OPTIONS)\s*\((?P<props>(?:[^()]|\([^()]*\))*)\)"
            rf"|LOCATION\s+'(?P<loc>[^']+)'"
            rf"))*"
            rf"(?:{_WS}AS{_WS}(?P<query>SELECT.*|VALUES.*))?$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise ValueError(f"cannot parse CREATE TABLE: {s[:120]}")
        from ..config import TableType, WriteConfig
        from ..table import HudiTable

        name = m.group("name")
        if m.group("loc") is None:
            raise ValueError("CREATE TABLE requires LOCATION '<path>' (no catalog)")
        props = {}
        for kv in _split_top_level(m.group("props") or ""):
            k, v = kv.split("=", 1)
            props[k.strip().strip("'\"").lower()] = v.strip().strip("'\"")
        parts = [p.strip() for p in _split_top_level(m.group("parts") or "")]
        # Reference validation (HoodieOptionConfig.validateTable /
        # TestCreateTable "Test Table Column Validate"): declared
        # primaryKey / preCombineField must name declared columns, and
        # type must be cow|mor
        if m.group("cols"):
            declared = {
                cd.split(None, 1)[0].lower()
                for cd in _split_top_level(m.group("cols"))
            }
            for prop in ("primarykey", "precombinefield"):
                for fld in str(props.get(prop, "")).split(","):
                    fld = fld.strip()
                    if fld and fld.lower() not in declared:
                        raise ValueError(
                            f"Can't find {prop} `{fld}` in table columns"
                        )
        ttype = props.get("type", "cow").lower()
        if ttype not in ("cow", "copy_on_write", "mor", "merge_on_read"):
            raise ValueError(
                f"'type' must be 'cow' or 'mor', got: {ttype}"
            )
        # raw ``hoodie.*`` TBLPROPERTIES flow through the same option
        # translation as the datasource write path (the reference merges
        # catalog properties into the write config —
        # InsertIntoHoodieTableCommand.scala:208 catalogProperties ++
        # tableConfig), so e.g. hoodie.index.type / hoodie.compact.inline
        # work as table properties
        import dataclasses as _dc

        from ..datasource import options_to_config

        base = options_to_config(
            {k: v for k, v in props.items() if k.startswith("hoodie.")}
        )
        has_pk = (
            "primarykey" in props
            or "hoodie.datasource.write.recordkey.field" in props
        )
        cfg = _dc.replace(
            base,
            record_key_field=props.get(
                "primarykey",
                base.record_key_field if has_pk else "_uuid_key_",
            ),
            keygen=(
                base.keygen
                if "hoodie.datasource.write.keygenerator.class" in props
                else ("auto" if has_pk else "uuid")
            ),
            partition_field=(
                ",".join(parts) if parts else base.partition_field
            ),
            precombine_field=props.get(
                "precombinefield", base.precombine_field
            ),
            table_type=(
                TableType.MERGE_ON_READ
                if ttype in ("mor", "merge_on_read")
                else TableType.COPY_ON_WRITE
                if "type" in props
                else base.table_type
            ),
            # hoodie.table.base.file.format analogue
            base_file_format=props.get(
                "basefileformat", base.base_file_format
            ).lower(),
            # SQL-created tables default to hive-style partition paths
            # (InsertIntoHoodieTableCommand.scala:214
            #  hiveStylePartitioningEnable getOrElse "true")
            hive_style_partitioning=props.get(
                "hoodie.datasource.write.hive_style_partitioning",
                props.get("hivestylepartitioning", "true"),
            ).lower() == "true",
        )
        exists = HudiTable.exists(self.spark, m.group("loc"))
        if exists:
            # 'Test Create Table From Exist Hoodie Table': adopting an
            # existing table loads the STORED config. Explicitly supplied
            # identity TBLPROPERTIES must still agree with it — the
            # defaults the statement did NOT set must not be validated
            # (create(exist_ok=True) compares every identity field, and a
            # bare CREATE ... LOCATION carries defaults for all of them).
            t = HudiTable.load(self.spark, m.group("loc"))
            stored_keys = ",".join(t.cfg.key_fields())

            def _ci(fields):  # SQL identifiers resolve case-insensitively
                return [f.strip().casefold() for f in fields]

            if "primarykey" in props and _ci(
                props["primarykey"].split(",")
            ) != _ci(t.cfg.key_fields()):
                raise ValueError(
                    f"CREATE TABLE {name}: primaryKey "
                    f"{props['primarykey']!r} conflicts with the existing "
                    f"table's record key {stored_keys!r} at {m.group('loc')}"
                )
            if "precombinefield" in props and (
                props["precombinefield"].casefold()
                != (t.cfg.precombine_field or "").casefold()
            ):
                raise ValueError(
                    f"CREATE TABLE {name}: preCombineField conflicts with "
                    f"the existing table at {m.group('loc')}"
                )
            if "type" in props and cfg.table_type != t.cfg.table_type:
                raise ValueError(
                    f"CREATE TABLE {name}: type {ttype!r} conflicts with "
                    f"the existing {t.cfg.table_type.value} table at "
                    f"{m.group('loc')}"
                )
            if parts and _ci(parts) != _ci(t.cfg.partition_fields()):
                raise ValueError(
                    f"CREATE TABLE {name}: PARTITIONED BY "
                    f"({', '.join(parts)}) conflicts with the existing "
                    f"table's partition fields "
                    f"{t.cfg.partition_fields()!r} at {m.group('loc')}"
                )
        else:
            t = HudiTable.create(self.spark, m.group("loc"), cfg)
        self.register(name, t)
        if m.group("cols") and not exists:
            # declared columns seed the table schema via an empty schema
            # commit so INSERT/SELECT work before any data lands
            from pyspark.sql import types as T

            from ..config import DELETE_MARKER_COL, META_COLS
            from ..operators.schema_evolution import _commit_schema

            fields = [T.StructField(c, T.StringType()) for c in META_COLS]
            for cd in _split_top_level(m.group("cols")):
                n, typ = cd.split(None, 1)
                fields.append(T.StructField(n, T._parse_datatype_string(typ), True))
            fields.append(T.StructField(DELETE_MARKER_COL, T.BooleanType(), True))
            _commit_schema(t, T.StructType(fields), "create_table")
        if m.group("query") and not exists:
            self._refresh_views_except(name)
            df = self._raw_sql(m.group("query"))
            t.bulk_insert(df)
        return t

    def _run_insert(self, t, df: DataFrame, overwrite: bool) -> str:
        """The reference's insert decision table
        (``InsertIntoHoodieTableCommand.scala:224-260``): session confs
        ``hoodie.sql.insert.mode`` (upsert|strict|non-strict, default
        upsert) and ``hoodie.sql.bulk.insert.enable`` pick the write
        operation; strict mode on a COW table validates against existing
        keys (``ValidateDuplicateKeyPayload``)."""
        from ..config import TableType

        conf = self.spark.conf
        mode = conf.get("hoodie.sql.insert.mode", "upsert").lower()
        enable_bulk = conf.get(
            "hoodie.sql.bulk.insert.enable", "false"
        ).lower() == "true"
        drop_dup = conf.get(
            "hoodie.datasource.write.insert.drop.duplicates", "false"
        ).lower() == "true"
        partitioned = bool(t.cfg.partition_field)
        has_pc = bool(t.cfg.precombine_field)

        if enable_bulk:
            if mode != "non-strict":
                raise ValueError(
                    f"Table with primaryKey can not use bulk insert in {mode} mode."
                )
            if overwrite and partitioned:
                raise ValueError("Insert Overwrite Partition can not use bulk insert.")
            if drop_dup:
                raise ValueError(
                    "Bulk insert cannot support drop duplication. Please disable "
                    "hoodie.datasource.write.insert.drop.duplicates and try again."
                )
        if overwrite:
            if not partitioned:
                return t.insert_overwrite_table(df)
            return t.insert_overwrite(df)
        if enable_bulk:
            return t.bulk_insert(df)
        if not drop_dup and mode in ("upsert", "strict") and has_pc:
            if mode == "strict" and t.cfg.table_type == TableType.COPY_ON_WRITE:
                # Full composite-key comparison, mirroring
                # ValidateDuplicateKeyPayload which validates the whole
                # record key (key_fields() also handles list-typed
                # record_key_field from datasource-registered tables)
                keys = t.cfg.key_fields()
                hit = (
                    df.select(*keys)
                    .join(t.snapshot().select(*keys), keys)
                    .first()
                )
                if hit is not None:
                    raise ValueError(
                        "Duplicate key found for insert statement, key is: "
                        + ",".join(str(hit[k]) for k in keys)
                    )
            return t.upsert(df)
        if drop_dup:
            import dataclasses as _dc

            prev = t.cfg
            t.cfg = _dc.replace(t.cfg, insert_drop_dups=True)
            try:
                return t.insert(df)
            finally:
                t.cfg = prev
        return t.insert(df)

    def _refresh_views_except(self, skip: str | None) -> None:
        for n, t in self.tables.items():
            if n == skip:
                continue
            try:
                fp = t.timeline.fingerprint()
            except Exception:
                fp = None
            if fp is not None and self._view_fps.get(n) == fp:
                # unchanged since last registration — but self-heal if
                # something external dropped the temp view meanwhile
                try:
                    if self.spark.catalog.tableExists(n):
                        continue
                except Exception:
                    pass
            t.snapshot().createOrReplaceTempView(n)
            if fp is not None:
                self._view_fps[n] = fp

    # -- dispatcher ----------------------------------------------------------
    def sql(self, stmt: str):
        s = stmt.strip().rstrip(";").strip()
        u = s.upper()

        if u.startswith("MERGE INTO"):
            return self._merge(s)

        if re.match(rf"CREATE{_WS}TABLE\b", s, re.IGNORECASE):
            return self._create_table(s)

        m = re.match(
            rf"ALTER{_WS}TABLE{_WS}({_ID}){_WS}RENAME{_WS}TO{_WS}({_ID})$",
            s, re.IGNORECASE)
        if m:
            # AlterHoodieTableRenameCommand: rename the catalog entry and
            # patch the stored table-name property
            old, new = m.group(1), m.group(2)
            if new in self.tables:
                raise ValueError(f"table already registered: {new}")
            t = self._table(old)
            t.rename(new)
            self.tables[new] = self.tables.pop(old)
            self._view_fps.pop(old, None)
            try:
                self.spark.catalog.dropTempView(old)
            except Exception:
                pass
            return None

        m = re.match(
            rf"ALTER{_WS}TABLE{_WS}({_ID}){_WS}DROP{_WS}PARTITION{_WS}(\(.*\))$",
            s, re.IGNORECASE)
        if m:
            # ALTER TABLE ... DROP PARTITION (col='v'[, ...])
            #   [, PARTITION (col='v'[, ...])]* — one replacecommit
            # covering every named partition (AlterHoodieTableDropPartition
            # Command accepts multiple specs the same way)
            t = self._table(m.group(1))
            pfields = t.cfg.partition_fields()
            paths = []
            for spec in re.split(
                rf"\)\s*,\s*PARTITION\s*\(", m.group(2).strip()[1:-1],
                flags=re.IGNORECASE,
            ):
                vals: dict[str, str] = {}
                for kv in _split_top_level(spec):
                    k, v = kv.split("=", 1)
                    k = k.strip()
                    # reference parity (TestAlterTableDropPartition):
                    # unknown columns, duplicate keys, and partial specs
                    # are all rejected up front
                    if k not in pfields:
                        raise ValueError(
                            f"{k} is not a valid partition column in table "
                            f"{m.group(1)}"
                        )
                    if k in vals:
                        raise ValueError(f"Found duplicate keys '{k}'")
                    vals[k] = v.strip().strip("'\"")
                missing = [f for f in pfields if f not in vals]
                if missing:
                    raise ValueError(
                        "All partition columns need to be specified for "
                        "Hoodie's dropping partition"
                    )
                pieces = []
                for fld in pfields:  # table-declared order, not spec order
                    v = vals[fld]
                    if t.cfg.url_encode_partitioning:
                        from ..keygen import _ESCAPE_CHARS

                        for ch in _ESCAPE_CHARS:
                            v = v.replace(ch, "%%%02X" % ord(ch))
                    pieces.append(
                        f"{fld}={v}" if t.cfg.hive_style_partitioning else v
                    )
                paths.append("/".join(pieces))
            return t.delete_partition(paths)

        m = re.match(rf"UPDATE{_WS}({_ID}){_WS}SET{_WS}(.*?)(?:{_WS}WHERE{_WS}(.*))?$",
                     s, re.IGNORECASE | re.DOTALL)
        if m:
            t = self._table(m.group(1))
            assignments = {}
            for a in _split_top_level(m.group(2)):
                col, expr = a.split("=", 1)
                assignments[col.strip()] = F.expr(expr.strip())
            cond = F.expr(m.group(3)) if m.group(3) else F.lit(True)
            return t.update_where(cond, assignments)

        m = re.match(rf"DELETE{_WS}FROM{_WS}({_ID})(?:{_WS}WHERE{_WS}(.*))?$",
                     s, re.IGNORECASE | re.DOTALL)
        if m:
            t = self._table(m.group(1))
            return t.delete_where(F.expr(m.group(2)) if m.group(2) else F.lit(True))

        m = re.match(
            rf"INSERT{_WS}(INTO|OVERWRITE){_WS}(?:TABLE{_WS})?({_ID})"
            rf"(?:{_WS}PARTITION\s*\(([^)]*)\))?"
            rf"{_WS}(SELECT.*|VALUES.*|TABLE.*)$",
            s, re.IGNORECASE | re.DOTALL)
        if m:
            t = self._table(m.group(2))
            self._refresh_views()
            df = self._raw_sql(m.group(4))
            data_cols = [f.name for f in t.read_schema().fields
                         if not f.name.startswith("_hoodie")]
            static = {}
            if m.group(3):
                for kv in _split_top_level(m.group(3)):
                    k, v = kv.split("=", 1)
                    static[k.strip()] = v.strip().strip("'\"")
            # Reference parity (InsertIntoHoodieTableCommand.alignOutputFields,
            # "Test Insert Exception"): the SELECT list plus static PARTITION
            # values must supply exactly the table's data columns
            required = len(data_cols)
            provided = len(df.columns) + len(static)
            if provided != required:
                raise ValueError(
                    f"Required select columns count: {required}, Current select "
                    f"columns(including static partition column) count: "
                    f"{provided}, columns: "
                    f"({','.join(list(df.columns) + list(static))})"
                )
            if static:
                # static partition spec (InsertIntoHoodieTableCommand):
                # the query supplies the remaining columns in order, the
                # PARTITION values ride along as literals (align casts
                # them to the declared types)
                non_part = [c for c in data_cols if c not in static]
                df = df.toDF(*non_part[: len(df.columns)])
                for k, v in static.items():
                    df = df.withColumn(k, F.lit(v))
            else:
                df = df.toDF(*data_cols[: len(df.columns)])
            return self._run_insert(t, df, m.group(1).upper() == "OVERWRITE")

        m = re.match(rf"SET{_WS}([\w.]+)\s*=\s*(.+)$", s, re.IGNORECASE)
        if m:
            # session conf (reference: spark.sql("set hoodie.sql.insert.mode
            # = strict") steers the insert decision table)
            self.spark.conf.set(m.group(1), m.group(2).strip().strip("'\""))
            return None

        m = re.match(rf"TRUNCATE{_WS}TABLE{_WS}({_ID})$", s, re.IGNORECASE)
        if m:
            return self._table(m.group(1)).truncate()

        m = re.match(
            rf"DROP{_WS}TABLE{_WS}(?P<ife>IF{_WS}EXISTS{_WS})?({_ID})"
            rf"(?:{_WS}(PURGE))?$",
            s, re.IGNORECASE)
        if m and (m.group(2) in self.tables or m.group("ife")):
            # DropHoodieTableCommand: unregister; PURGE also deletes the
            # table directory
            t = self.tables.pop(m.group(2), None)
            self._view_fps.pop(m.group(2), None)
            try:
                self.spark.catalog.dropTempView(m.group(2))
            except Exception:
                pass
            if t is not None and m.group(3):
                t.fs.delete(t.base_path, recursive=True)
            return None

        m = re.match(
            rf"SHOW{_WS}PARTITIONS{_WS}({_ID})"
            rf"(?:{_WS}PARTITION\s*\(([^)]*)\))?$",
            s, re.IGNORECASE)
        if m:
            t = self._table(m.group(1))
            parts = t.partitions()
            if m.group(2):
                # partial spec (ShowHoodieTablePartitionsCommand /
                # TestShowPartitions.scala "check partial partitions"):
                # keep partitions whose named segments match the given
                # values, compared on the value part of field=value
                spec = {}
                for kv in _split_top_level(m.group(2)):
                    k, v = kv.split("=", 1)
                    spec[k.strip().lower()] = v.strip().strip("'\"")
                pfields = [f.lower() for f in t.cfg.partition_fields()]

                def _match(p: str) -> bool:
                    segs = p.split("/")
                    vals = {}
                    for i, seg in enumerate(segs):
                        fld = (
                            seg.split("=", 1)[0].lower()
                            if "=" in seg
                            else (pfields[i] if i < len(pfields) else str(i))
                        )
                        vals[fld] = seg.split("=", 1)[1] if "=" in seg else seg
                    return all(vals.get(k) == v for k, v in spec.items())

                parts = [p for p in parts if _match(p)]
            return self.spark.createDataFrame(
                [(p,) for p in parts], "partition string"
            )

        # introspection statements in the custom-grammar style (the
        # reference exposes these via hudi-cli `commits show` /
        # `show fsview latest`)
        m = re.match(
            rf"SHOW{_WS}ARCHIVED{_WS}COMMITS{_WS}(?:ON{_WS})?({_ID})$",
            s, re.IGNORECASE)
        if m:
            # hudi-cli `show archived commits`
            t = self._table(m.group(1))
            rows = [
                (a.get("timestamp", ""), a.get("action", ""))
                for a in t.timeline.archived_instants()
            ]
            return self.spark.createDataFrame(
                rows or [], "instant string, action string"
            )

        m = re.match(
            rf"SHOW{_WS}SAVEPOINTS{_WS}(?:ON{_WS})?({_ID})$", s, re.IGNORECASE)
        if m:
            # hudi-cli `savepoints show`
            t = self._table(m.group(1))
            rows = [
                (
                    i.timestamp,
                    str(
                        t.timeline.read_metadata(i).get("savepoint_at", "")
                    ),
                )
                for i in t.timeline.instants()
                if i.action == "savepoint" and i.state == "completed"
            ]
            return self.spark.createDataFrame(
                rows or [], "instant string, savepoint_at string"
            )

        m = re.match(
            rf"SHOW{_WS}CLEANS{_WS}(?:ON{_WS})?({_ID})$", s, re.IGNORECASE)
        if m:
            # hudi-cli `cleans show`
            t = self._table(m.group(1))
            rows = []
            for i in t.timeline.instants():
                if i.action == "clean" and i.state == "completed":
                    md = t.timeline.read_metadata(i)
                    rows.append((i.timestamp, int(len(md.get("deleted", [])))))
            return self.spark.createDataFrame(
                rows or [], "instant string, files_deleted int"
            )

        m = re.match(
            rf"SHOW{_WS}ROLLBACKS{_WS}(?:ON{_WS})?({_ID})$", s, re.IGNORECASE)
        if m:
            # hudi-cli `show rollbacks`
            t = self._table(m.group(1))
            rows = []
            for i in t.timeline.instants():
                if i.action == "rollback" and i.state == "completed":
                    md = t.timeline.read_metadata(i)
                    rows.append(
                        (
                            i.timestamp,
                            str(md.get("rolled_back", "")),
                            str(md.get("action", "")),
                        )
                    )
            return self.spark.createDataFrame(
                rows or [],
                "instant string, rolled_back string, rolled_action string",
            )

        m = re.match(
            rf"SHOW{_WS}RESTORES{_WS}(?:ON{_WS})?({_ID})$", s, re.IGNORECASE)
        if m:
            # hudi-cli `show restores`
            t = self._table(m.group(1))
            rows = [
                (
                    i.timestamp,
                    str(t.timeline.read_metadata(i).get("restored_to", "")),
                )
                for i in t.timeline.instants()
                if i.action == "restore" and i.state == "completed"
            ]
            return self.spark.createDataFrame(
                rows or [], "instant string, restored_to string"
            )

        m = re.match(rf"SHOW{_WS}COMMITS{_WS}(?:ON{_WS})?({_ID})$", s, re.IGNORECASE)
        if m:
            return self._table(m.group(1)).commits_df()

        m = re.match(rf"SHOW{_WS}FILES{_WS}(?:ON{_WS})?({_ID})$", s, re.IGNORECASE)
        if m:
            return self._table(m.group(1)).files_df()

        m = re.match(
            rf"ALTER{_WS}TABLE{_WS}({_ID}){_WS}ADD{_WS}COLUMNS?{_WS}\((.*)\)$",
            s, re.IGNORECASE | re.DOTALL)
        if m:
            fields = []
            for f in _split_top_level(m.group(2)):
                name, typ = f.split(None, 1)
                fields.append((name, typ))
            return self._table(m.group(1)).add_columns(fields)

        m = re.match(
            rf"ALTER{_WS}TABLE{_WS}({_ID}){_WS}(?:CHANGE|ALTER){_WS}COLUMN{_WS}"
            rf"({_ID}){_WS}(?:TYPE{_WS})?(.+)$",
            s, re.IGNORECASE)
        if m:
            return self._table(m.group(1)).change_column_type(m.group(2), m.group(3).strip())

        # custom compaction grammar — HoodieSqlCommon.g4:23-33:
        #   (RUN|SCHEDULE|SHOW) COMPACTION ON (<table>|'<path>')
        #     [AT <instant>] [LIMIT <n>]
        m = re.match(
            rf"(RUN|SCHEDULE|SHOW){_WS}COMPACTION{_WS}(?:ON{_WS})?"
            rf"({_ID}|'[^']+')(?:{_WS}AT{_WS}(\d+))?(?:{_WS}LIMIT{_WS}(\d+))?$",
            s, re.IGNORECASE)
        if m:
            target = m.group(2)
            if target.startswith("'"):
                # CompactionHoodiePathCommand: target a table by location
                from ..table import HudiTable

                t = HudiTable.load(self.spark, target.strip("'"))
            else:
                t = self._table(target)
            verb = m.group(1).upper()
            if verb == "RUN":
                if m.group(3):
                    return t.compact(m.group(3))
                pend = [
                    i.timestamp for i in t.timeline.pending()
                    if i.action == "compaction"
                ]
                return t.compact(pend[0] if pend else None)
            if verb == "SCHEDULE":
                return t.schedule_compaction()
            pend = [
                (i.timestamp, i.state)
                for i in t.timeline.pending()
                if i.action == "compaction"
            ]
            if m.group(4):
                pend = pend[: int(m.group(4))]
            return self.spark.createDataFrame(
                pend or [], "timestamp string, state string"
            )

        # SELECT ... FROM <hudi table> TIMESTAMP AS OF '<instant>': swap
        # in a time-travel view (Spark's native syntax needs a V2 catalog;
        # instant formats per HoodieSqlUtils.formatQueryInstant)
        def _tt_view(mm):
            name = mm.group(1)
            if name not in self.tables:
                return mm.group(0)
            view = f"__tt_{name}_{abs(hash(mm.group(2)))}"
            self.tables[name].snapshot(
                as_of=mm.group(2)
            ).createOrReplaceTempView(view)
            return f" {view}"
        s = re.sub(
            rf"\s({_ID}){_WS}TIMESTAMP{_WS}AS{_WS}OF{_WS}'([^']+)'",
            _tt_view, s, flags=re.IGNORECASE,
        )

        # plain relational SQL → Spark, with table snapshots as views
        self._refresh_views()
        return self._raw_sql(s)
