"""Space-filling-curve sort keys for layout optimization.

Reference: z-value interleave in
``spark-client/index/zorder/ZOrderingIndexHelper.java:86+`` and the
hilbert/sample strategies keyed by
``client/config/HoodieClusteringConfig.java:131,174-178``; recorded
skipping results in BASELINE.md.

Three normalization strategies:
- ``raw``: direct value→bits, the reference's *map* behavior — degrades
  to ~0% skipping when column ranges are imbalanced (BASELINE.md's
  skewed case) because the narrow column only occupies low bits;
- ``map``: min-max rescale each column into the full bit range first —
  strictly better than ``raw`` (immune to range imbalance) at the cost
  of one min/max aggregate;
- ``sample``: rank-based via quantile boundaries (the reference's
  *sample* variants) — robust to arbitrary value-distribution skew,
  not just range imbalance.

The z-value is a pure Column expression (bit arithmetic, codegen'd);
hilbert uses a vectorized pandas UDF (numpy bit loop over 63 bits is
the slow path Spark can't express).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _normalize_raw(df: DataFrame, cols: list[str], bits: int) -> tuple[DataFrame, list[str]]:
    """Direct value→bits clamp, no rescaling — the reference's map-based
    build (``ZOrderingIndexHelper.java``: int values are bit-interleaved
    as-is). Kept for parity; prefer ``map``/``sample``."""
    out_cols = []
    for c in cols:
        df = df.withColumn(
            f"__n_{c}",
            F.least(
                F.greatest(F.col(c).cast("long"), F.lit(0)),
                F.lit((1 << bits) - 1),
            ),
        )
        out_cols.append(f"__n_{c}")
    return df, out_cols


def _normalize_map(df: DataFrame, cols: list[str], bits: int) -> tuple[DataFrame, list[str]]:
    """Min-max scale each column into [0, 2^bits)."""
    aggs = []
    for c in cols:
        aggs += [F.min(F.col(c).cast("double")).alias(f"mn_{c}"),
                 F.max(F.col(c).cast("double")).alias(f"mx_{c}")]
    r = df.agg(*aggs).first()
    out_cols = []
    for c in cols:
        mn, mx = r[f"mn_{c}"], r[f"mx_{c}"]
        span = (mx - mn) if (mn is not None and mx is not None and mx > mn) else 1.0
        norm = (
            ((F.col(c).cast("double") - F.lit(mn)) / F.lit(span)) * ((1 << bits) - 1)
        )
        df = df.withColumn(f"__n_{c}", F.least(
            F.greatest(norm.cast("long"), F.lit(0)), F.lit((1 << bits) - 1)
        ))
        out_cols.append(f"__n_{c}")
    return df, out_cols


def _normalize_sample(df: DataFrame, cols: list[str], bits: int) -> tuple[DataFrame, list[str]]:
    """Rank-normalize via approx quantile boundaries (the reference's
    sample-based curve build: boundaries from a data sample, robust to
    skew). Bucket lookup uses ``Bucketizer`` (JVM binary search), not a
    chained comparison expression."""
    from pyspark.ml.feature import Bucketizer

    n_buckets = min(1 << bits, 1024)
    probs = [i / n_buckets for i in range(1, n_buckets)]
    out_cols = []
    for c in cols:
        qs = df.stat.approxQuantile(c, probs, 0.001) if probs else []
        bounds = sorted(set(qs))
        splits = [float("-inf")] + [float(b) for b in bounds] + [float("inf")]
        dcol = f"__d_{c}"
        df = df.withColumn(dcol, F.coalesce(F.col(c).cast("double"), F.lit(float("-inf"))))
        if len(splits) > 2:
            df = Bucketizer(
                splits=splits, inputCol=dcol, outputCol=f"__b_{c}"
            ).transform(df)
        else:
            df = df.withColumn(f"__b_{c}", F.lit(0.0))
        scale = max(1, (1 << bits) // (len(bounds) + 1))
        df = df.withColumn(f"__n_{c}", (F.col(f"__b_{c}") * scale).cast("long")).drop(
            dcol, f"__b_{c}"
        )
        out_cols.append(f"__n_{c}")
    return df, out_cols


_NORMALIZERS = {
    "raw": _normalize_raw,
    "map": _normalize_map,
    "sample": _normalize_sample,
}


def with_zvalue(
    df: DataFrame,
    cols: list[str],
    out_col: str = "__zvalue",
    bits: int = 16,
    method: str = "sample",
) -> DataFrame:
    """Add the interleaved-bit z-value of ``cols``. Bit interleave is a
    Column expression: for bit i of column j → output bit i*ncols+j.

    The total interleaved width is capped at 63 bits (the long sign bit
    must stay clear — a negative z-value would sort the top of the
    curve first, and the JVM masks shift amounts mod 64, silently
    folding bits). With many columns the per-column bit budget shrinks:
    4 columns → 15 bits each, 6 → 10."""
    eff_bits = min(bits, 63 // max(1, len(cols)))
    df, norm_cols = _NORMALIZERS[method](df, cols, eff_bits)
    n = len(norm_cols)
    z: Column = F.lit(0).cast("long")
    for i in range(eff_bits):
        for j, c in enumerate(norm_cols):
            bit = F.shiftright(F.col(c), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return df.withColumn(out_col, z).drop(*norm_cols)


def _hilbert_index_np(coords: np.ndarray, bits: int) -> np.ndarray:
    """Vectorized Hilbert curve index (Skilling's transform), coords
    shape (rows, dims) of uint64 in [0, 2^bits)."""
    x = coords.astype(np.uint64).copy()
    n, dims = x.shape
    m = np.uint64(1) << np.uint64(bits - 1)
    # Inverse undo excess work
    q = m
    while q > np.uint64(1):
        p = q - np.uint64(1)
        for i in range(dims):
            mask = (x[:, i] & q) != 0
            x[mask, 0] ^= p  # invert
            t = (x[:, 0] ^ x[:, i]) & p
            x[~mask, 0] ^= t[~mask]
            x[~mask, i] ^= t[~mask]
        q >>= np.uint64(1)
    # Gray encode
    for i in range(1, dims):
        x[:, i] ^= x[:, i - 1]
    t = np.zeros(n, dtype=np.uint64)
    q = m
    while q > np.uint64(1):
        mask = (x[:, dims - 1] & q) != 0
        t[mask] ^= q - np.uint64(1)
        q >>= np.uint64(1)
    for i in range(dims):
        x[:, i] ^= t
    # interleave bits of x → single index
    out = np.zeros(n, dtype=np.uint64)
    for b in range(bits - 1, -1, -1):
        for i in range(dims):
            out = (out << np.uint64(1)) | ((x[:, i] >> np.uint64(b)) & np.uint64(1))
    return out


def with_hilbert_value(
    df: DataFrame,
    cols: list[str],
    out_col: str = "__hvalue",
    bits: int = 16,
    method: str = "sample",
) -> DataFrame:
    """Add the Hilbert-curve index of ``cols``. Same 63-bit total-width
    cap as :func:`with_zvalue`: dims*bits beyond 63 overflows — at
    exactly 64 the int64 cast flips the sign (the curve's top half sorts
    FIRST), beyond it the uint64 interleave wraps and collapses distinct
    coordinates — so the per-column budget shrinks with column count."""
    eff_bits = min(bits, 63 // max(1, len(cols)))
    df, norm_cols = _NORMALIZERS[method](df, cols, eff_bits)

    @F.pandas_udf(T.LongType())
    def _hv(*series: pd.Series) -> pd.Series:
        coords = np.stack([s.fillna(0).to_numpy(dtype=np.uint64) for s in series], axis=1)
        return pd.Series(_hilbert_index_np(coords, eff_bits).astype(np.int64))

    return df.withColumn(out_col, _hv(*[F.col(c) for c in norm_cols])).drop(*norm_cols)
