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


def mixture_sample(
    df: DataFrame,
    key_col: str,
    domain_col: str,
    weights: dict[str, int],
    buckets: int = 10_000,
) -> DataFrame:
    """Target-mixture downsampling: keep the LARGEST corpus whose domain
    proportions match integer ``weights`` (e.g. ``{"web": 5, "books": 3,
    "code": 2}`` → 50/30/20). The binding domain — the one that runs out
    first at the target mixture, min over n_d/w_d — is kept whole; every
    other domain is deterministically hash-sampled down to
    ``w_d * n_binding / w_binding`` rows (in expectation over hash
    buckets). Domains absent from ``weights`` are dropped.

    All threshold arithmetic is integer (weights are integer parts;
    thresholds are floor-divided products), so any BIGINT engine
    reproduces the exact row set — the same portability contract as
    ``deterministic_sample``. Binding-domain selection cross-multiplies
    exact fractions, tie-broken by domain name.

    Scale shape: one O(domains) count agg (collect is metadata-sized),
    then a stateless CASE-threshold filter over the same universal hash
    — no data shuffle, no per-row Python. This is the mixture-weighting
    step of corpus construction (fixed-ratio data mixing), run once per
    corpus version."""
    from fractions import Fraction

    _require_numeric_key(df, key_col)
    if not weights:
        raise ValueError("weights must name at least one domain")
    for d, w in weights.items():
        if not isinstance(w, int) or w <= 0:
            raise ValueError(
                f"weight for {d!r} is {w!r}; weights are positive integer "
                "parts (use e.g. 5/3/2, not 0.5/0.3/0.2) so thresholds "
                "stay exact integer arithmetic"
            )
    counts = {
        r[0]: r[1]
        for r in df.filter(F.col(domain_col).isin(list(weights)))
        .groupBy(domain_col)
        .count()
        .collect()
    }
    empty = sorted(d for d in weights if not counts.get(d))
    if empty:
        # a zero-row domain forces the whole mixture to zero rows —
        # loud beats a silently empty corpus
        raise ValueError(f"mixture domains have no rows: {empty}")
    b = min(weights, key=lambda d: (Fraction(counts[d], weights[d]), d))
    thresh = F.lit(-1)
    for d in sorted(weights):
        t = (buckets * weights[d] * counts[b]) // (weights[b] * counts[d])
        thresh = F.when(F.col(domain_col) == F.lit(d), F.lit(t)).otherwise(
            thresh
        )
    return df.filter(sample_bucket(key_col, buckets) < thresh)


def epoch_shuffle(
    df: DataFrame,
    key_col: str,
    epoch: int,
    n_shards: int,
    buckets: int = 1 << 30,
) -> DataFrame:
    """Deterministic per-epoch shuffle + shard assignment: every row
    gets a ``shard`` in [0, n_shards) and an ``ord`` that orders rows
    WITHIN its shard, both pure functions of (key, epoch). Training
    runs re-shuffle between epochs without materializing randomness —
    epoch 0 and epoch 1 produce decorrelated permutations, and any
    engine (or a resumed job) re-derives the exact same order.

    The epoch derives BOTH rounds' multipliers (exact Python int
    arithmetic, embedded as literals), and a mod-2^30 truncation sits
    BETWEEN the rounds: a composition of mod-P affine maps is itself
    affine — with an additive-only salt the epochs would differ by a
    per-key CONSTANT, i.e. the "new" epoch order would be the old one
    rotated (code-review r8, verified numerically) — but the
    truncation is non-affine over mod-P arithmetic, so per-epoch
    multipliers + the cut genuinely scramble adjacency between epochs.

    Scale shape: stateless per-row projection — the caller writes
    ``.repartition(n_shards, "shard").sortWithinPartitions("ord")``,
    one shuffle whose reducer count IS the shard count; no global
    sort, no driver state. Collisions in ``ord`` are broken by the
    key itself to keep the total order deterministic."""
    _require_numeric_key(df, key_col)
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    if epoch < 0:
        raise ValueError("epoch must be >= 0")
    a1, b1, a2, b2 = epoch_constants(epoch)
    c = F.col(key_col)
    h = F.pmod(F.pmod(c.cast("long"), F.lit(_P)) * F.lit(a1) + F.lit(b1), F.lit(_P))
    m = F.pmod(h, F.lit(buckets))  # non-affine cut between the rounds
    h = F.pmod(m * F.lit(a2) + F.lit(b2), F.lit(_P))
    b = F.pmod(h, F.lit(buckets))
    return df.withColumns(
        {
            "shard": F.pmod(b, F.lit(n_shards)).cast("int"),
            "ord": (b / F.lit(n_shards)).cast("long"),
        }
    )


def epoch_constants(epoch: int) -> tuple[int, int, int, int]:
    """Per-epoch affine constants for :func:`epoch_shuffle` — derived
    in exact Python int arithmetic so an oracle can embed the same
    literals. Multipliers are nonzero mod P by construction."""
    a1 = (_A1 + epoch * _A2) % (_P - 1) + 1
    b1 = (_B1 + epoch * _B2) % _P
    a2 = (_A2 + epoch * _B1) % (_P - 1) + 1
    b2 = (_B2 + epoch * _A1) % _P
    return a1, b1, a2, b2


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
