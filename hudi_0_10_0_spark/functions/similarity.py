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

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

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


def cosine_from_norms(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """``cosine`` with the per-side norms precomputed as columns —
    the SAME expression regrouped (na/nb must be ``sqrt(l2norm2(side))``
    projected per row), so the double bits are identical while each
    norm is evaluated once per row instead of once per pair
    (optimization r8). Every ranking/verify site MUST use this helper,
    never a hand-written dot/(na*nb): a later "fix" to e.g.
    sqrt(n2a*n2b) at one site would silently diverge floor(cos*1e6)
    ties from the oracle."""
    return dot(a, b) / (na * nb)


def norm_col(vec: Column) -> Column:
    """The per-row norm ``cosine_from_norms`` expects."""
    return F.sqrt(l2norm2(vec))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors per query row. Queries are
    broadcast; ranking is by FIXED-POINT similarity (floor of cos*1e6,
    BIGINT) with id tie-break: engines' ROUND(double) implementations
    provably disagree on 6th-decimal ties (HALF_UP-on-shortest-repr vs
    float-multiply), while floor of the identical product is stable."""
    # per-row norms are computed ONCE per side instead of once per pair:
    # dot/(sqrt(n2(q))*sqrt(n2(c))) is the cosine() expression regrouped —
    # identical double bits, ~3x less interpreted per-pair work (r8)
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qvec"),
        norm_col(F.col(vec_col)).alias("__qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec"),
        norm_col(F.col(vec_col)).alias("__cn"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .withColumn(
            "cos_sim_u6",
            F.floor(
                cosine_from_norms(
                    F.col("__qvec"), F.col("__cvec"), F.col("__qn"), F.col("__cn")
                ) * F.lit(1e6)
            ).cast("long"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim_u6"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "cos_sim_u6", "rank")
    )


def _check_dim(df: DataFrame, vec_col: str, dim: int, who: str) -> None:
    """Fail LOUDLY when the vectors don't have length ``dim``: zip_with
    null-pads mismatched lengths, so every RHP projection goes null and
    every vector lands in bucket 0 of every table — the LSH self-join
    silently degenerates to ~n²/2 candidate pairs. One metadata-sized
    job (first row only — a best-effort guard, not a full-column scan)."""
    row = df.select(F.size(F.col(vec_col)).alias("n")).first()
    if row is not None and row["n"] is not None and row["n"] != dim:
        raise ValueError(
            f"{who}: dim={dim} but {vec_col!r} vectors have length "
            f"{row['n']} — a mismatched RHP projection degenerates every "
            f"vector to one LSH bucket (quadratic join); pass dim={row['n']}"
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
    _check_dim(df, vec_col, dim, "rhp_signature")
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
    probe_all: bool = False,
) -> DataFrame:
    """Approximate top-k: multi-table random-hyperplane LSH. The corpus
    is indexed into ``n_tables`` independent bucket spaces (the classic
    L-tables LSH index — corpus storage ×L); a query probes, per table,
    its own bucket plus every 1-bit flip, then exact-cosine reranks the
    union of candidates. At 100 TB the (table, bucket) equi-join
    replaces the cross join and AQE handles bucket skew.

    ``probe_all=True`` probes every bucket of every table — the result is
    then provably identical to ``brute_force_topk`` (every corpus row is a
    candidate), which makes the same pipeline exactly verifiable against a
    brute-force SQL oracle while exercising the bucketed join shape."""
    _check_dim(corpus, vec_col, dim, "ann_topk(corpus)")
    _check_dim(queries, vec_col, dim, "ann_topk(queries)")
    all_planes = _hyperplanes(n_tables * n_planes, dim)
    c_buckets = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        norm_col(F.col(vec_col)).alias("__cn"),
        F.posexplode(
            F.array(*[
                _rhp_bucket(vec_col, all_planes[t * n_planes : (t + 1) * n_planes])
                for t in range(n_tables)
            ])
        ).alias("table", "bucket"),
    )
    probe_structs = []
    if probe_all:
        # exhaustive: every bucket of every table
        for t in range(n_tables):
            for bkt in range(1 << n_planes):
                probe_structs.append(
                    F.struct(
                        F.lit(t).alias("table"),
                        F.lit(bkt).cast("long").alias("bucket"),
                    )
                )
    else:
        # per table: own bucket + 1-bit flips (multi-probe)
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
        norm_col(F.col(vec_col)).alias("__qn"),
        F.explode(F.array(*probe_structs)).alias("probe"),
    ).select(
        query_id_col, "__qvec", "__qn",
        F.col("probe.table").alias("table"), F.col("probe.bucket").alias("bucket")
    )
    scored = (
        c_buckets.join(qb, ["table", "bucket"])
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .dropDuplicates([query_id_col, "neighbor_id"])
        .withColumn(
            "cos_sim_u6",
            F.floor(
                cosine_from_norms(
                    F.col("__qvec"), F.col("__cvec"), F.col("__qn"), F.col("__cn")
                ) * F.lit(1e6)
            ).cast("long"),
        )
        .drop("__qvec", "__cvec", "__qn", "__cn", "bucket", "table")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim_u6"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "cos_sim_u6", "rank")
    )


# --------------------------------------------------------------------------
# IVF (inverted-file) ANN — the second classic scale path next to LSH:
# a small deterministic k-means codebook partitions the corpus into
# nlist cells; a query exact-reranks only its nprobe nearest cells.
# --------------------------------------------------------------------------


def train_ivf_centroids(
    corpus: DataFrame,
    nlist: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 2048,
    iters: int = 5,
) -> list[list[float]]:
    """Driver-side Lloyd iterations over a deterministic sample (first
    ``sample_size`` rows by id — stable across runs, no RNG). The
    codebook is O(nlist × dim) — broadcast-sized at any corpus scale;
    training cost is bounded by the sample, not the corpus."""
    sample = np.array(
        [
            r[0]
            for r in corpus.select(vec_col)
            .orderBy(F.col(id_col))
            .limit(sample_size)
            .collect()
        ],
        dtype=np.float64,
    )
    # k-means++ style spread without RNG: start from evenly spaced
    # sample rows (sample is id-ordered, effectively arbitrary in
    # embedding space), then Lloyd refine
    idx = np.linspace(0, len(sample) - 1, nlist).astype(int)
    centroids = sample[idx].copy()
    for _ in range(iters):
        # cosine assignment == dot after L2 normalization
        s_norm = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
        c_norm = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)
        assign = np.argmax(s_norm @ c_norm.T, axis=1)
        for j in range(nlist):
            members = sample[assign == j]
            if len(members):
                centroids[j] = members.mean(axis=0)
    return centroids.tolist()


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    cell_col: str = "ivf_cell",
) -> DataFrame:
    """Append the nearest-centroid (by cosine) cell id. Arrow-batched
    pandas UDF: one numpy matmul per batch — the vectorized path for a
    100 TB assign pass (the codebook rides along as a closure literal,
    no shuffle, no driver involvement)."""
    c = np.array(centroids, dtype=np.float64)
    c_norm = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)

    @pandas_udf("int")
    def _nearest(vecs: pd.Series) -> pd.Series:
        m = np.array(vecs.tolist(), dtype=np.float64)
        m_norm = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(m_norm @ c_norm.T, axis=1).astype("int32"))

    return df.withColumn(cell_col, _nearest(F.col(vec_col)))


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate top-k cosine via IVF: corpus rows live in their
    nearest-centroid cell; each query exact-reranks only its ``nprobe``
    nearest cells. The (cell) equi-join replaces the cross join —
    corpus stored once (vs ×L for multi-table LSH), recall tuned by
    nprobe. Same output shape as ``brute_force_topk``."""
    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, nlist=nlist, vec_col=vec_col, id_col=id_col
        )
    c_cells = ivf_assign(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec")),
        centroids,
        vec_col="__cvec",
        cell_col="cell",
    )
    cn = np.array(centroids, dtype=np.float64)
    cn = cn / np.maximum(np.linalg.norm(cn, axis=1, keepdims=True), 1e-12)

    # queries are few: probe cells computed the same vectorized way,
    # exploded into (query, cell) pairs
    @pandas_udf("array<int>")
    def _probes(vecs: pd.Series) -> pd.Series:
        m = np.array(vecs.tolist(), dtype=np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(m @ cn.T), axis=1)[:, :nprobe].astype("int32")
        return pd.Series(list(order))

    qb = (
        queries.select(
            F.col(query_id_col), F.col(vec_col).alias("__qvec"),
            norm_col(F.col(vec_col)).alias("__qn"),
        )
        .withColumn("cell", F.explode(_probes(F.col("__qvec"))))
    )
    scored = (
        c_cells.withColumn("__cn", norm_col(F.col("__cvec")))
        .join(qb, ["cell"])
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .withColumn(
            "cos_sim_u6",
            F.floor(
                cosine_from_norms(
                    F.col("__qvec"), F.col("__cvec"), F.col("__qn"), F.col("__cn")
                ) * F.lit(1e6)
            ).cast("long"),
        )
        .drop("__qvec", "__cvec", "__qn", "__cn", "cell")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim_u6"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "cos_sim_u6", "rank")
    )
