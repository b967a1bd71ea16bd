"""Training-data sampling and sequence packing.

Large-scale corpus construction needs reproducible subsetting (the same
fraction selects the same rows on every run and every engine) and
token-budget packing (assigning documents to fixed-capacity training
sequences). Both are pure DataFrame transformations:

- ``deterministic_sample`` / ``stratified_sample`` hash the row key with
  a splitmix64-style integer mix expressed in plain 64-bit arithmetic —
  identical in any engine with BIGINT math (unlike engine-specific
  ``hash()``/``rand()``), so an oracle can re-derive the exact subset.
- ``pack_sequences`` assigns each doc a bin id from the running token
  total over a deterministic order — the scalable cumulative-quota
  variant of greedy first-fit packing (one window prefix-sum per
  stratum, no driver loop). Bins can overflow by at most one document,
  the standard trade-off for a single-pass distributed packer.

At 100 TB: sampling is stateless per-row (no shuffle); packing is one
window over the pack key — partition by a coarse stratum (e.g. source
shard) so each window partition is bounded, never a single global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Universal hash (a*x + b) mod p over the Mersenne prime 2^31-1: every
# intermediate stays under 2^62, so the arithmetic neither overflows
# int64 (Spark 4 ANSI mode throws on overflow) nor differs across
# engines — any BIGINT engine reproduces it exactly. Two rounds for
# avalanche quality. Constants from splitmix64 of fixed seeds.
_P = (1 << 31) - 1
_A1, _B1 = 1442695040888963407 % (_P - 1) + 1, 6364136223846793005 % _P
_A2, _B2 = 2862933555777941757 % (_P - 1) + 1, 3037000499 % _P


def sample_bucket(key: Column | str, buckets: int = 10_000) -> Column:
    """Deterministic per-row bucket in [0, buckets): two rounds of the
    universal hash over the key. Same key → same bucket, forever, in
    every engine."""
    c = F.col(key) if isinstance(key, str) else key
    h = F.pmod(c.cast("long"), F.lit(_P))
    h = F.pmod(h * F.lit(_A1) + F.lit(_B1), F.lit(_P))
    h = F.pmod(h * F.lit(_A2) + F.lit(_B2), F.lit(_P))
    return F.pmod(h, F.lit(buckets))


def _require_numeric_key(df: DataFrame, key_col: str) -> None:
    """The universal hash is integer arithmetic: a non-numeric key would
    cast to null and silently sample ZERO rows. Fail loudly instead and
    point at the fix (a numeric surrogate such as a row id)."""
    from pyspark.sql import types as T

    f = df.schema[key_col]
    if not isinstance(
        f.dataType, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ):
        raise ValueError(
            f"sampling key column {key_col!r} has type "
            f"{f.dataType.simpleString()}; the engine-portable hash needs an "
            "integer key (use a numeric id column, or derive one)"
        )


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, buckets: int = 10_000
) -> DataFrame:
    """Keep rows whose hash bucket falls below ``fraction`` of the bucket
    space. Stateless, no shuffle, reproducible across runs/engines —
    the right sampling primitive for corpus versioning (engine ``rand()``
    is none of those things)."""
    _require_numeric_key(df, key_col)
    return df.filter(sample_bucket(key_col, buckets) < int(fraction * buckets))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    buckets: int = 10_000,
) -> DataFrame:
    """Per-stratum deterministic sampling (data mixing: e.g. keep 100%
    of books, 10% of web). ``fractions`` maps stratum value → fraction;
    unlisted strata use ``default_fraction``. One CASE expression over
    the same hash — still stateless and shuffle-free."""
    _require_numeric_key(df, key_col)
    thresh = F.lit(int(default_fraction * buckets))
    for val, frac in sorted(fractions.items()):
        thresh = F.when(
            F.col(strata_col) == F.lit(val), F.lit(int(frac * buckets))
        ).otherwise(thresh)
    return df.filter(sample_bucket(key_col, buckets) < thresh)


def pack_sequences(
    df: DataFrame,
    token_col: str,
    max_tokens: int,
    order_col: str,
    partition_col: str | None = None,
    bin_col: str = "bin_id",
) -> DataFrame:
    """Assign each document a training-sequence bin: running token total
    (in ``order_col`` order, optionally per ``partition_col`` stratum)
    integer-divided by capacity. Documents longer than ``max_tokens``
    occupy their own bin(s). Appends ``bin_col``.

    One window prefix-sum — the distributed-scalable packing shape; at
    100 TB partition by source shard so no window partition is global.
    """
    if partition_col:
        w = Window.partitionBy(partition_col).orderBy(order_col)
    else:
        w = Window.orderBy(order_col)
    cum_before = F.coalesce(
        F.sum(F.col(token_col)).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    return df.withColumn(
        bin_col, F.floor(cum_before / F.lit(max_tokens)).cast("long")
    )
