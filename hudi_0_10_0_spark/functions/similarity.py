"""Similarity search over embedding columns (array<float>).

- ``cosine`` / ``dot`` / ``l2norm`` are pure JVM higher-order-function
  expressions (zip_with + aggregate in double precision) — no UDF.
- ``brute_force_topk`` is the exact baseline: broadcast the (small) query
  set against the corpus, rank per query. Linear in corpus size, fully
  scan-parallel: the right shape for 100 TB when queries << corpus.
- ``rhp_signature``/``ann_topk`` is the scale path: random-hyperplane LSH
  (sign bits of fixed deterministic projections) buckets the corpus so
  each query only reranks candidate buckets — turns all-pairs into an
  equi-join. Recall < 1 by construction (approximate)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _splitmix64


def dot(a: Column, b: Column) -> Column:
    """Σ a_i*b_i in double, sequential left fold (matches a DuckDB
    list_sum(list_transform(...)) oracle exactly)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2norm2(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(l2norm2(a)) * F.sqrt(l2norm2(b)))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors per query row. Queries are
    broadcast; ranking is by rounded similarity with id tie-break so the
    result is stable under float noise."""
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qvec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .withColumn("cos_sim", F.round(cosine(F.col("__qvec"), F.col("__cvec")), 6))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "cos_sim", "rank")
    )


def _hyperplanes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-gaussian hyperplanes from splitmix64 bits
    (sum of 4 uniforms ≈ gaussian; fixed across runs/executors)."""
    planes = []
    ctr = 0
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            u = 0.0
            for _ in range(4):
                ctr += 1
                u += _splitmix64(ctr) / 2**64
            row.append(u - 2.0)
        planes.append(row)
    return planes


def _rhp_bucket(vec_col: str, planes: list[list[float]]) -> Column:
    """Bucket id whose bits are sign(v·plane_i). JVM expressions only."""
    bits = []
    for i, p in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(x) for x in p]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return bucket.cast("long")


def rhp_signature(
    df: DataFrame, vec_col: str = "embedding", n_planes: int = 16, dim: int = 64,
    table: int = 0,
) -> DataFrame:
    """Append ``bucket``: random-hyperplane LSH bucket id (table-th
    deterministic plane set)."""
    planes = _hyperplanes((table + 1) * n_planes, dim)[table * n_planes :]
    return df.withColumn("bucket", _rhp_bucket(vec_col, planes))


def ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = 6,
    n_tables: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: multi-table random-hyperplane LSH. The corpus
    is indexed into ``n_tables`` independent bucket spaces (the classic
    L-tables LSH index — corpus storage ×L); a query probes, per table,
    its own bucket plus every 1-bit flip, then exact-cosine reranks the
    union of candidates. At 100 TB the (table, bucket) equi-join
    replaces the cross join and AQE handles bucket skew."""
    all_planes = _hyperplanes(n_tables * n_planes, dim)
    c_buckets = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        F.posexplode(
            F.array(*[
                _rhp_bucket(vec_col, all_planes[t * n_planes : (t + 1) * n_planes])
                for t in range(n_tables)
            ])
        ).alias("table", "bucket"),
    )
    # per table: own bucket + 1-bit flips (multi-probe)
    probe_structs = []
    for t in range(n_tables):
        b = _rhp_bucket(vec_col, all_planes[t * n_planes : (t + 1) * n_planes])
        probe_structs.append(F.struct(F.lit(t).alias("table"), b.alias("bucket")))
        for i in range(n_planes):
            probe_structs.append(
                F.struct(
                    F.lit(t).alias("table"),
                    b.bitwiseXOR(F.lit(1 << i)).alias("bucket"),
                )
            )
    qb = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qvec"),
        F.explode(F.array(*probe_structs)).alias("probe"),
    ).select(
        query_id_col, "__qvec", F.col("probe.table").alias("table"), F.col("probe.bucket").alias("bucket")
    )
    scored = (
        c_buckets.join(qb, ["table", "bucket"])
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .dropDuplicates([query_id_col, "neighbor_id"])
        .withColumn("cos_sim", F.round(cosine(F.col("__qvec"), F.col("__cvec")), 6))
        .drop("__qvec", "__cvec", "bucket", "table")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "cos_sim", "rank")
    )
