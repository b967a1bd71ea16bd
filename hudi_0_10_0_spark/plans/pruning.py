"""Predicate-tree pruning against per-file column stats.

Reference: ``sql/hudi/DataSkippingUtils.scala:49-229`` (filter → stats
range test, ``col = v`` → ``min <= v <= max``, AND/OR folded) and
``HoodieFileIndex.scala:178-294`` (candidate-file intersection). Stats
pruning is an optimization only — the same predicates are re-applied as
row-level Column filters after the scan/merge, which is what guarantees
correctness.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# Column-stats data skipping (reference: DataSkippingUtils.scala:49-229 +
# HoodieFileIndex.scala:178-294 — predicate → stats-range test)
# --------------------------------------------------------------------------

_OPS = {"=", "==", "<", "<=", ">", ">=", "in"}


def pred_to_column(pred):
    """Predicate tuple/tree → Column for the post-scan re-application
    (stats pruning is an optimization; the row-level filter is what
    guarantees correctness)."""
    from pyspark.sql import Column

    if isinstance(pred, Column):
        return pred
    if isinstance(pred, tuple) and len(pred) == 2 and pred[0] in ("and", "or"):
        cols = [pred_to_column(p) for p in pred[1]]
        out = cols[0]
        for c in cols[1:]:
            out = (out & c) if pred[0] == "and" else (out | c)
        return out
    col, op, val = pred
    c = F.col(col)
    if op in ("=", "=="):
        return c == F.lit(val)
    if op == "<":
        return c < F.lit(val)
    if op == "<=":
        return c <= F.lit(val)
    if op == ">":
        return c > F.lit(val)
    if op == ">=":
        return c >= F.lit(val)
    if op == "in":
        return c.isin(list(val))
    raise ValueError(f"unsupported predicate op: {op!r}")


def leaf_possible(col_stats: dict, pred: tuple, dtypes: dict | None = None) -> bool:
    """True if a slice with these stats might contain a matching row.
    Any (literal, stats) pair that cannot be aligned to a SAFELY
    comparable type keeps the slice — pruning must be conservative,
    because dropped slices are gone for good (the post-scan row filter
    only re-checks kept slices). ``dtypes`` (column → declared Spark
    simpleString) lets numeric literals prune against the string-encoded
    stats of DECIMAL columns; without it such pairs only prune on
    point ranges (min == max)."""
    col, op, val = pred
    st = col_stats.get(col)
    if not st:
        return True
    mn, mx, _ = st
    if mn is None or mx is None:
        return True
    dtype = (dtypes or {}).get(col)
    if op == "in":
        for x in val:
            a = _aligned(mn, mx, x, dtype)
            if a is None:
                return True  # un-comparable element → cannot prune
            m, big, v = a
            if m <= v <= big:
                return True
        return False
    a = _aligned(mn, mx, val, dtype)
    if a is None:
        return True
    mn, mx, v = a
    if op in ("=", "=="):
        return mn <= v <= mx
    if op == "<":
        return mn < v
    if op == "<=":
        return mn <= v
    if op == ">":
        return mx > v
    if op == ">=":
        return mx >= v
    return True


def pred_possible(col_stats: dict, pred, dtypes: dict | None = None) -> bool:
    """Evaluate a predicate tree against file stats, mirroring the
    reference's translated-filter evaluation
    (``DataSkippingUtils.scala:49-229``: ``col = v → min<=v<=max``,
    AND/OR folded over the per-column range tests). Predicates:
    ``(col, op, value)`` leaves, ``("and", [preds])``, ``("or", [preds])``.
    """
    if isinstance(pred, tuple) and len(pred) == 2 and pred[0] in ("and", "or"):
        kids = [pred_possible(col_stats, p, dtypes) for p in pred[1]]
        return all(kids) if pred[0] == "and" else any(kids)
    if isinstance(pred, tuple) and len(pred) == 3:
        return leaf_possible(col_stats, pred, dtypes)
    return True  # unknown shape — must read


def _timestamp_partition_fields(cfg) -> set:
    """Delegates to the keygen module — the writer's own definition of
    which partition fields are timestamp renderings."""
    from ..keygen import timestamp_partition_fields

    return timestamp_partition_fields(cfg)


def _pseudo_stats_ctx(table) -> tuple | None:
    """Per-TABLE context for partition-path pseudo-stats, computed once
    per prune call (not per slice — a 100 TB table lists ~875k slices):
    (partition fields, timestamp-formatted fields, declared dtypes).
    None when the table is unpartitioned."""
    cfg = table.cfg
    pfields = cfg.partition_fields()
    if not pfields:
        return None
    try:
        dtypes = {f.name: f.dataType.simpleString() for f in table.read_schema().fields}
    except Exception:
        dtypes = {}
    return (cfg, pfields, _timestamp_partition_fields(cfg), dtypes)


def _partition_pseudo_stats(table, partition: str, ctx: tuple | None = "unset") -> dict:
    """Exact (min=max) stats for the partition field columns derived
    from the slice's partition path — partition pruning that works even
    when the columns aren't in the data files (drop.partition.columns)
    and for slices with delta logs (the partition is slice identity).
    Values are coerced to the declared column type so range predicates
    compare numerically, not lexicographically.

    Timestamp-keygen fields are skipped (their path value is a
    ``date_format`` rendering of the column, not the value itself), and
    if the segment count doesn't match the field count (e.g. a
    'yyyy/MM/dd' output format spans three path segments) NO pseudo
    stats are derived — alignment of every later field would be wrong.
    """
    from urllib.parse import unquote

    from ..config import DEFAULT_PARTITION

    if ctx == "unset":
        ctx = _pseudo_stats_ctx(table)
    if ctx is None:
        return {}
    cfg, pfields, ts_fields, dtypes = ctx
    segs = partition.split("/") if partition else []
    if len(segs) != len(pfields):
        return {}
    out = {}
    for i, fld in enumerate(pfields):
        if fld in ts_fields:
            continue
        # strip the "field=" prefix only for hive-style layouts — a
        # NON-hive partition VALUE may itself contain '='
        v = (
            segs[i].split("=", 1)[1]
            if cfg.hive_style_partitioning and "=" in segs[i]
            else segs[i]
        )
        if cfg.url_encode_partitioning:
            v = unquote(v)
        if v == DEFAULT_PARTITION:
            out[fld] = (None, None, 1)
            continue
        t = dtypes.get(fld, "string")
        try:
            if t in ("int", "bigint", "smallint", "tinyint", "long"):
                v = int(v)
            elif t in ("float", "double"):
                v = float(v)
        except (TypeError, ValueError):
            pass  # keep the string; _coerce will align literals
        out[fld] = (v, v, 0)
    return out


def prune_slices_by_stats(table, slices, filters) -> list:
    """Drop file slices whose column stats prove the predicate can't
    match. ``filters`` may be Column objects (kept scan-side only),
    ``(col, op, value)`` triples, or ``("and"/"or", [preds])`` trees;
    the listed predicates are ANDed. Partition-path pseudo-stats apply
    to every slice; footer stats additionally apply to log-free slices
    (delta rows aren't covered by base-file stats)."""
    preds = [f for f in filters if isinstance(f, tuple)]
    if not preds:
        return slices
    ctx = _pseudo_stats_ctx(table)
    try:
        dtypes = {f.name: f.dataType.simpleString() for f in table.read_schema().fields}
    except Exception:
        dtypes = {}
    kept = []
    for s in slices:
        stats = _partition_pseudo_stats(table, s.partition, ctx)
        if not s.logs and s.base.col_stats:
            # footer stats come from the real data — they win wherever
            # both exist; pseudo-stats only fill columns absent from the
            # file (drop.partition.columns)
            stats = {**stats, **s.base.col_stats}
        if all(pred_possible(stats, p, dtypes) for p in preds):
            kept.append(s)
    return kept


_NUMERIC_DTYPES = (
    "decimal", "int", "bigint", "smallint", "tinyint", "long",
    "float", "double",
)


def _aligned(mn, mx, val, dtype: str | None = None):
    """Align (min, max, literal) to ONE safely comparable type; None when
    no safe alignment exists (caller keeps the slice).

    Stats arrive JSON-roundtripped (footer stats via write.py ``_js``:
    Decimal/date/datetime stored as ``str(v)``, bools as bools) or as
    partition-path strings, so cross-type pairs are common and several
    are traps:

    - numeric literals stay numeric vs numeric stats (truncating a float
      literal to int — ``int(3.5) -> 3`` — would falsely prune
      ``col < 3.5`` vs min=3); Decimal literals compare exactly with
      int/float in Python, no conversion needed;
    - a numeric/Decimal literal vs STRING stats parses the stats as
      Decimal ONLY when the declared column type is numeric/decimal
      (Decimal footer stats are ``str(v)``) or the range is a single
      point (partition pseudo-stats): the min/max of a true STRING
      column are LEXICOGRAPHIC bounds ('10' < '9'), not a numeric
      range, and reinterpreting them numerically falsely prunes;
      non-finite literals (NaN/inf) keep the slice — Decimal NaN
      comparisons raise instead of ordering;
    - a bool literal vs 'true'/'false' string stats maps the stats to
      bools — Python ``str(True) == 'True'`` never equals Spark's
      ``'true'`` rendering and falsely pruned every boolean match;
    - date/datetime literals vs string stats use isoformat (both sides
      are ISO-rendered, where lexicographic order IS chronological);
    - anything else cross-type → None (cannot prune)."""
    import datetime
    import decimal
    import math

    try:
        if isinstance(mn, bool):
            return (mn, mx, val) if isinstance(val, bool) else None
        if isinstance(mn, (int, float)):
            if isinstance(val, bool):
                return None
            if isinstance(val, (int, float, decimal.Decimal)):
                return (mn, mx, val)
            return (mn, mx, float(val))  # string literal vs numeric stats
        if isinstance(mn, str):
            if isinstance(val, str):
                return (mn, mx, val)
            if isinstance(val, bool):
                lo, hi = mn.strip().lower(), mx.strip().lower()
                if lo in ("true", "false") and hi in ("true", "false"):
                    return (lo == "true", hi == "true", val)
                return None
            if isinstance(val, (int, float, decimal.Decimal)):
                if isinstance(val, float) and not math.isfinite(val):
                    return None
                if isinstance(val, decimal.Decimal) and not val.is_finite():
                    return None
                numeric_col = dtype is not None and dtype.lower().startswith(
                    _NUMERIC_DTYPES
                )
                if not numeric_col and mn != mx:
                    return None  # lexicographic string range — cannot prune
                return (
                    decimal.Decimal(mn.strip()),
                    decimal.Decimal(mx.strip()),
                    decimal.Decimal(str(val)),
                )
            if isinstance(val, datetime.datetime):
                return (mn, mx, val.isoformat(sep=" "))
            if isinstance(val, datetime.date):
                return (mn, mx, val.isoformat())
            return None
    except (TypeError, ValueError, decimal.InvalidOperation):
        return None
    return (mn, mx, val)
