"""Similarity search over embedding columns (task brief: brute-force cosine
top-k baseline + LSH-bucketed scale path).

Brute force stays fully JVM-side (higher-order functions — zip_with /
aggregate), so Catalyst pipelines it with the scan; the LSH path derives a
small integer bucket per vector (random-hyperplane signs, numpy Arrow UDF)
so candidate generation is an equi-join, then re-ranks candidates exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType
from pyspark.sql.window import Window


def dot_expr(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def norm_expr(a: str) -> str:
    return (
        f"sqrt(aggregate({a}, CAST(0.0 AS DOUBLE), "
        f"(acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"
    )


def cosine_expr(a: str, b: str) -> str:
    return f"({dot_expr(a, b)}) / (({norm_expr(a)}) * ({norm_expr(b)}))"


def brute_force_topk(
    vectors: DataFrame,
    query_vec: list[float],
    k: int,
    key: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against one query vector (broadcast literal)."""
    q = ", ".join(f"CAST({float(x)} AS FLOAT)" for x in query_vec)
    d = vectors.selectExpr(key, f"{cosine_expr(vec, f'array({q})')} as cosine")
    return d.orderBy(F.col("cosine").desc(), F.col(key)).limit(k)


def knn_topk_join(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    key: str = "vec_id",
    vec: str = "embedding",
    qkey: str = "qid",
    qvec: str = "qe",
) -> DataFrame:
    """Exact top-k for a (small, broadcast) query SET: one broadcast
    nested-loop join + per-query window top-k."""
    j = vectors.crossJoin(F.broadcast(queries.select(qkey, qvec)))
    scored = j.selectExpr(qkey, key, f"{cosine_expr(vec, qvec)} as cosine")
    w = Window.partitionBy(qkey).orderBy(F.col("cosine").desc(), F.col(key))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    """Deterministic random hyperplanes: splitmix64-seeded uniform grid, no
    RNG state (same matrix on every executor)."""
    from coords_spark.kernels.phash import splitmix64

    idx = np.arange(dim * n_planes, dtype=np.uint64) + np.uint64(seed * 1_000_003)
    u = (splitmix64(idx) >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    return (u.reshape(n_planes, dim) * 2.0 - 1.0)


def lsh_bucket_col(vec_col, n_planes: int = 12, seed: int = 7, dim: int | None = None):
    """Random-hyperplane signature -> int bucket (Arrow-batched matmul)."""

    @F.pandas_udf(IntegerType())
    def _b(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:  # empty Arrow batch: np.stack would raise
            return pd.Series([], dtype="int32")
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        planes = _planes(mat.shape[1], n_planes, seed)
        signs = (mat @ planes.T) > 0
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series((signs @ weights).astype("int32"))

    return _b(vec_col)


def lsh_band_buckets_col(vec_col, n_bands: int, planes_per_band: int, seed: int = 7):
    """array<int>: band b's sign-signature at index b — ALL bands from one
    Arrow batch matmul against the concatenated plane matrix. Band b's
    signature is bit-identical to lsh_bucket_col(vec, planes_per_band,
    seed + 101*b), so banded consumers (embedding_near_dups) read the whole
    signature set in ONE scan of the vector column instead of one
    scan+matmul per band."""
    from pyspark.sql.types import ArrayType, IntegerType

    @F.pandas_udf(ArrayType(IntegerType()))
    def _bb(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:  # empty Arrow batch: np.stack would raise
            return pd.Series([], dtype=object)
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        dim = mat.shape[1]
        planes = np.concatenate(
            [_planes(dim, planes_per_band, seed + 101 * b) for b in range(n_bands)]
        )
        signs = (mat @ planes.T) > 0  # (N, n_bands*planes_per_band)
        weights = (1 << np.arange(planes_per_band)).astype(np.int64)
        sigs = signs.reshape(len(mat), n_bands, planes_per_band) @ weights
        return pd.Series([row.astype("int32").tolist() for row in sigs])

    return _bb(vec_col)


def ann_topk(
    vectors: DataFrame,
    query_vec: list[float],
    k: int,
    n_planes: int = 8,
    seed: int = 7,
    probe_hamming: int = 1,
    key: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Approximate top-k: probe the query's LSH bucket plus all buckets
    within `probe_hamming` bit flips (multi-probe), exact-rank candidates.
    Recall grows with probe_hamming; probe count = sum_{i<=h} C(n_planes,i)."""
    qv = np.asarray(query_vec, dtype=np.float64)
    planes = _planes(len(qv), n_planes, seed)
    qsig = int(((qv @ planes.T) > 0) @ (1 << np.arange(n_planes)))
    probes = {qsig}
    if probe_hamming >= 1:
        for i in range(n_planes):
            probes.add(qsig ^ (1 << i))
    if probe_hamming >= 2:
        for i in range(n_planes):
            for j in range(i + 1, n_planes):
                probes.add(qsig ^ (1 << i) ^ (1 << j))
    d = vectors.withColumn("bucket", lsh_bucket_col(F.col(vec), n_planes, seed))
    cand = d.filter(F.col("bucket").isin(*[int(p) for p in probes]))
    q = ", ".join(f"CAST({float(x)} AS FLOAT)" for x in query_vec)
    scored = cand.selectExpr(key, f"{cosine_expr(vec, f'array({q})')} as cosine")
    return scored.orderBy(F.col("cosine").desc(), F.col(key)).limit(k)


def probe_buckets_col(vec_col, n_planes: int = 8, seed: int = 7, probe_hamming: int = 1):
    """array<int> of multi-probe LSH buckets per query vector: its own
    signature plus every signature within probe_hamming bit flips."""
    from pyspark.sql.types import ArrayType, IntegerType

    @F.pandas_udf(ArrayType(IntegerType()))
    def _pb(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:  # empty Arrow batch: np.stack would raise
            return pd.Series([], dtype=object)
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        planes = _planes(mat.shape[1], n_planes, seed)
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        sigs = (((mat @ planes.T) > 0) @ weights).astype(np.int64)
        out = []
        for s in sigs:
            probes = {int(s)}
            if probe_hamming >= 1:
                for i in range(n_planes):
                    probes.add(int(s) ^ (1 << i))
            if probe_hamming >= 2:
                for i in range(n_planes):
                    for j in range(i + 1, n_planes):
                        probes.add(int(s) ^ (1 << i) ^ (1 << j))
            out.append(sorted(probes))
        return pd.Series(out)

    return _pb(vec_col)


def ivf_centroids(
    vectors: DataFrame, n_centroids: int, key: str = "vec_id", vec: str = "embedding"
) -> list[tuple[int, np.ndarray]]:
    """Deterministic IVF coarse quantizer: the n_centroids vectors with the
    smallest xxhash64(key) — an order-free uniform sample, no RNG state and
    no iterative refinement, so the quantizer (and therefore every IVF cell
    assignment) is bit-reproducible across runs and parallelism. One
    TakeOrdered pass builds it; the centroid matrix is tiny (k x dim) and
    rides to executors inside the UDF closure. Sorted by centroid id so
    argmax tie-breaks resolve to the smallest id."""
    rows = (
        vectors.select(F.col(key).alias("cid"), F.col(vec).alias("cvec"))
        .withColumn("_h", F.xxhash64(F.col("cid")))
        .orderBy("_h", "cid")
        .limit(n_centroids)
        .drop("_h")
        .collect()
    )
    return sorted(
        ((r["cid"], np.asarray(r["cvec"], dtype=np.float64)) for r in rows),
        key=lambda t: t[0],
    )


def _centroid_matrix(cents: list[tuple[int, np.ndarray]]) -> tuple[np.ndarray, np.ndarray]:
    ids = np.asarray([c for c, _ in cents], dtype=np.int64)
    mat = np.stack([v for _, v in cents])
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return ids, mat / norms[:, None]


def nearest_centroid_col(vec_col, cents: list[tuple[int, np.ndarray]]):
    """IVF cell id per vector: argmax cosine against the centroid matrix
    (vectorized batch matmul; ties resolve to the smallest centroid id)."""
    from pyspark.sql.types import LongType

    cids, cn = _centroid_matrix(cents)

    @F.pandas_udf(LongType())
    def _nc(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="int64")
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        sims = (mat / norms[:, None]) @ cn.T
        return pd.Series(cids[np.argmax(sims, axis=1)])

    return _nc(vec_col)


def probe_centroids_col(vec_col, cents: list[tuple[int, np.ndarray]], nprobe: int):
    """array<long> of the nprobe nearest IVF cells per query vector
    (stable argsort: equal similarities resolve to the smaller id)."""
    from pyspark.sql.types import ArrayType, LongType

    cids, cn = _centroid_matrix(cents)

    @F.pandas_udf(ArrayType(LongType()))
    def _pc(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        sims = (mat / norms[:, None]) @ cn.T
        order = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
        return pd.Series([cids[row].tolist() for row in order])

    return _pc(vec_col)


def ivf_topk_join(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    n_centroids: int = 16,
    nprobe: int = 3,
    key: str = "vec_id",
    vec: str = "embedding",
    qkey: str = "qid",
    qvec: str = "qe",
) -> DataFrame:
    """IVF approximate top-k for a query SET (the task brief's "IVF or
    LSH-bucketed variant" — this is the IVF one; ann_topk_join is the LSH
    one). Same 100 TB join shape: every vector keyed by its single IVF
    cell, queries exploded over their nprobe nearest cells, candidates from
    the cell equi-join, exact cosine re-rank per query — never a cross
    join. Recall grows with nprobe; candidate cardinality is bounded by
    the probed cells' population (~nprobe/n_centroids of the corpus)."""
    cents = ivf_centroids(vectors, n_centroids, key, vec)
    if not cents:  # empty corpus: no cells, no candidates
        spark = vectors.sparkSession
        key_t = vectors.schema[key].dataType.simpleString()
        qkey_t = queries.schema[qkey].dataType.simpleString()
        return spark.createDataFrame(
            [], f"{qkey} {qkey_t}, {key} {key_t}, cosine double, rank int"
        )
    d = vectors.withColumn("cid", nearest_centroid_col(F.col(vec), cents))
    q = queries.withColumn(
        "cid", F.explode(probe_centroids_col(F.col(qvec), cents, nprobe))
    )
    cand = d.join(q, "cid").select(qkey, key, vec, qvec)
    scored = cand.selectExpr(qkey, key, f"{cosine_expr(vec, qvec)} as cosine")
    w = Window.partitionBy(qkey).orderBy(F.col("cosine").desc(), F.col(key))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ann_topk_join(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    n_planes: int = 8,
    seed: int = 7,
    probe_hamming: int = 1,
    key: str = "vec_id",
    vec: str = "embedding",
    qkey: str = "qid",
    qvec: str = "qe",
) -> DataFrame:
    """Approximate top-k for a query SET as a bucketed EQUI-JOIN (the
    100 TB shape): vectors key by their single LSH bucket, queries explode
    their multi-probe bucket list, candidates come from the bucket join —
    never a cross join — then exact cosine re-rank per query.

    Shuffle: one hash exchange on `bucket` each side (the query side is
    tiny and broadcasts below the threshold); candidate cardinality is
    bucket-bounded. Contrast knn_topk_join (exact, broadcast nested loop):
    that scans all vectors per query, this touches only probed buckets."""
    d = vectors.withColumn("bucket", lsh_bucket_col(F.col(vec), n_planes, seed))
    q = queries.withColumn(
        "bucket",
        F.explode(probe_buckets_col(F.col(qvec), n_planes, seed, probe_hamming)),
    )
    # no distinct needed: each vector lives in exactly ONE bucket, so a
    # (query, vector) pair can only meet once even under multi-probe
    cand = d.join(q, "bucket").select(qkey, key, vec, qvec)
    scored = cand.selectExpr(qkey, key, f"{cosine_expr(vec, qvec)} as cosine")
    w = Window.partitionBy(qkey).orderBy(F.col("cosine").desc(), F.col(key))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
