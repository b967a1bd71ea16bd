"""Key generators: derive ``_hoodie_record_key`` / ``_hoodie_partition_path``.

Reference surface: ``hudi-client/hudi-spark-client/.../keygen/`` (Simple,
Complex, TimestampBased, NonPartitioned, GlobalDelete, Custom, Uuid).
Ours are pure Column expressions (``F.concat_ws`` / ``F.date_format``) so
key stamping stays inside whole-stage codegen — the reference evaluates
these per-record on Avro objects.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .config import (
    DEFAULT_PARTITION,
    PARTITION_PATH_COL,
    RECORD_KEY_COL,
    WriteConfig,
)


def _record_key_expr(cfg: WriteConfig) -> Column:
    """Record-key expression with the reference's null/empty semantics
    (``KeyGenUtils.java:92-145``): a simple key that is null or empty
    RAISES (HoodieKeyException — silently grouping null keys would
    collapse distinct records in the merge); complex keys render null
    parts as ``__null__`` and empty parts as ``__empty__``, raising only
    when every part is null/empty. ``raise_error`` keeps the check
    JVM-side — no extra validation job."""
    fields = cfg.key_fields()
    if len(fields) == 1:
        # SimpleKeyGenerator: raw value, loud on null/empty
        v = F.col(fields[0]).cast("string")
        return F.when(
            v.isNull() | (v == ""),
            F.raise_error(F.lit(
                f'recordKey value for field "{fields[0]}" cannot be null or empty'
            )),
        ).otherwise(v)
    # ComplexKeyGenerator format "f1:v1,f2:v2"
    # (spark-client/keygen/ComplexKeyGenerator.java + KeyGenUtils:92-112)
    vals = [F.col(f).cast("string") for f in fields]
    parts = [
        F.concat(
            F.lit(f + ":"),
            F.when(v.isNull(), F.lit("__null__"))
            .when(v == "", F.lit("__empty__"))
            .otherwise(v),
        )
        for f, v in zip(fields, vals)
    ]
    all_null = None
    for v in vals:
        cond = v.isNull() | (v == "")
        all_null = cond if all_null is None else (all_null & cond)
    key = F.concat_ws(",", *parts)
    return F.when(
        all_null,
        F.raise_error(F.lit(
            f"recordKey values for fields {fields} cannot be entirely null or empty"
        )),
    ).otherwise(key)


def timestamp_partition_fields(cfg: WriteConfig) -> set:
    """Partition columns whose path value is a FORMATTED timestamp
    rendering (the ``_timestamp_partition_expr`` branch of
    ``_partition_path_expr`` below), not the raw column value. The
    single source of truth for "is this field a timestamp rendering" —
    pruning pseudo-stats and partition-column restoration must never
    treat these path segments as column values."""
    specs = cfg.raw_partition_specs()
    out = set()
    for i, spec in enumerate(specs):
        fld, per_field = spec, None
        if cfg.keygen == "custom" and ":" in spec:
            fld, per_field = spec.split(":", 1)
            per_field = per_field.strip().lower()
        if per_field == "timestamp" or (
            cfg.keygen == "timestamp" and i == len(specs) - 1
        ):
            out.add(fld)
    return out


def _partition_path_expr(cfg: WriteConfig) -> Column:
    fields = cfg.raw_partition_specs()
    if not fields:
        # NonpartitionedKeyGenerator → empty partition path
        return F.lit("")
    pieces = []
    for fld in fields:
        # CustomKeyGenerator (spark-client/keygen/CustomKeyGenerator.java):
        # each partition field carries its own generator as "field:simple"
        # or "field:timestamp"
        per_field = None
        if cfg.keygen == "custom" and ":" in fld:
            fld, per_field = fld.split(":", 1)
            per_field = per_field.strip().lower()
        if per_field == "timestamp" or (
            cfg.keygen == "timestamp" and fld == fields[-1]
        ):
            val = _timestamp_partition_expr(cfg, fld)
        else:
            base = F.col(fld).cast("string")
            if cfg.url_encode_partitioning:
                base = _escape_path_expr(base)
            # null OR empty → "default"
            # (PartitionPathEncodeUtils.escapePathName:68-75, KeyGenUtils)
            val = F.when(
                F.col(fld).cast("string").isNull()
                | (F.col(fld).cast("string") == ""),
                F.lit(DEFAULT_PARTITION),
            ).otherwise(base)
        if cfg.hive_style_partitioning:
            val = F.concat_ws("=", F.lit(fld), val)
        pieces.append(val)
    return F.concat_ws("/", *pieces)


# The escapable set of PartitionPathEncodeUtils.escapePathName:30-50 —
# '%' first so already-escaped output isn't double-escaped.
_ESCAPE_CHARS = ["%"] + [chr(i) for i in range(1, 32)] + [
    '"', "#", "'", "*", "/", ":", "=", "?", "\\", "\x7f", "{", "[", "]", "^",
]


def _escape_path_expr(c: Column) -> Column:
    """URL_ENCODE_PARTITIONING=true: escape each special character to
    %XX (PartitionPathEncodeUtils.escapePathName) so a value like
    "2016/03/15" becomes ONE path segment "2016%2F03%2F15". A chain of
    literal replaces stays inside whole-stage codegen — no UDF."""
    out = c
    for ch in _ESCAPE_CHARS:
        out = F.replace(out, F.lit(ch), F.lit("%%%02X" % ord(ch)))
    return out


def _timestamp_partition_expr(cfg: WriteConfig, fld: str) -> Column:
    """TimestampBasedKeyGenerator
    (spark-client/keygen/TimestampBasedAvroKeyGenerator.java:48-60):
    input interpreted per ``timestamp_input_type``, formatted with
    ``timestamp_output_format``."""
    fmt = cfg.timestamp_output_format
    t = cfg.timestamp_input_type.upper()
    c = F.col(fld)
    if t in ("EPOCHMS", "EPOCHMILLISECONDS"):
        # the 0.10 enum spells it EPOCHMILLISECONDS
        # (keygen/TimestampKeyGeneratorConfig TimestampType)
        ts = F.timestamp_millis(c.cast("long"))
    elif t in ("EPOCHSECONDS", "UNIX_TIMESTAMP", "SCALAR"):
        ts = F.timestamp_seconds(c.cast("long"))
    elif t == "DATE_STRING":
        in_fmt = getattr(cfg, "timestamp_input_format", None)
        ts = F.to_timestamp(c, in_fmt) if in_fmt else F.to_timestamp(c)
    else:  # TIMESTAMP / DATE column
        ts = c.cast("timestamp")
    # null partition value → the reference's default of epoch 1ms
    # (TimestampBasedAvroKeyGenerator.getDefaultPartitionVal: 1L), so
    # null rows land in the 1970 partition instead of concat_ws silently
    # dropping the segment and misaligning the path
    ts = F.coalesce(ts, F.timestamp_millis(F.lit(1)))
    return F.date_format(ts, fmt)


def stamp_keys(
    df: DataFrame, cfg: WriteConfig, partition_optional: bool = False
) -> DataFrame:
    """Add ``_hoodie_record_key`` and ``_hoodie_partition_path``.

    ``partition_optional``: a GLOBAL-index delete may arrive with only
    the key columns (GlobalDeleteKeyGenerator,
    ``spark-client/keygen/GlobalDeleteKeyGenerator.java``) — the true
    partition comes from the index join, so stamp a placeholder instead
    of failing on the missing partition source column."""
    out = df
    if RECORD_KEY_COL not in df.columns:
        if cfg.keygen == "uuid":
            # UuidKeyGenerator — SQL tables created without a primaryKey
            out = out.withColumn(RECORD_KEY_COL, F.expr("uuid()"))
        else:
            out = out.withColumn(RECORD_KEY_COL, _record_key_expr(cfg))
    if PARTITION_PATH_COL not in out.columns:
        missing = [f for f in cfg.partition_fields() if f not in out.columns]
        if missing and partition_optional:
            out = out.withColumn(PARTITION_PATH_COL, F.lit(""))
        else:
            out = out.withColumn(PARTITION_PATH_COL, _partition_path_expr(cfg))
    return out


def stamp_uuid_key(df: DataFrame) -> DataFrame:
    """UuidKeyGenerator (SQL tables without a natural key)."""
    return df.withColumn(RECORD_KEY_COL, F.expr("uuid()"))
