"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a broadcast of the (small) query set
against a scan of the corpus, scored vectorized in NumPy via mapInArrow
(one matmul per Arrow batch; no per-row Python), then a global top-k.
At 100 TB the scan is embarrassingly parallel and the only shuffle is the
k-row-per-partition top-k combine.

Scale path: random-hyperplane LSH bucketing (signed projections → bucket
join like minhash LSH) restricts scoring to same-bucket candidates.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, Window, functions as F


def _batch_matrix(arr: pa.Array) -> np.ndarray:
    """(n, d) float32 matrix from an Arrow list<float> column (zero-copy
    flatten; assumes fixed dimension, validated)."""
    lens = np.diff(arr.offsets.to_numpy(zero_copy_only=False))
    d = int(lens[0]) if len(lens) else 0
    if len(lens) and not (lens == d).all():
        raise ValueError("ragged embedding column")
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(-1, d) if d else flat.reshape(0, 0)


def brute_force_topk(
    df: DataFrame,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine neighbors in `df` for each query vector.

    queries: (q, d) float array, broadcast in the UDF closure (small dim
    table pattern). Per Arrow batch: one (n, d) @ (d, q) matmul + partial
    top-k, so each partition emits ≤ q·k candidate rows; the final exact
    top-k is a cheap window over q·k·P rows.
    """
    qm = np.asarray(queries, dtype=np.float64)
    qn = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-30)
    qids = np.asarray(query_ids)

    def score(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(batch.schema.get_field_index(id_col)).to_numpy(zero_copy_only=False)
            m = _batch_matrix(batch.column(batch.schema.get_field_index(vec_col)))
            if m.shape[0] == 0:
                continue
            m64 = m.astype(np.float64)
            mn = m64 / np.maximum(np.linalg.norm(m64, axis=1, keepdims=True), 1e-30)
            sims = mn @ qn.astype(np.float64).T  # (n, q)
            kk = min(k, sims.shape[0])
            top = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, q)
            out_q, out_id, out_s = [], [], []
            for j in range(sims.shape[1]):
                out_q.extend([int(qids[j])] * kk)
                out_id.extend(ids[top[:, j]].tolist())
                out_s.extend(sims[top[:, j], j].astype(np.float64).tolist())
            yield pa.RecordBatch.from_arrays(
                [pa.array(out_q, pa.int64()), pa.array(out_id, pa.int64()), pa.array(out_s, pa.float64())],
                names=["query_id", id_col, "cosine"],
            )

    partial = df.select(id_col, vec_col).mapInArrow(score, f"query_id long, {id_col} long, cosine double")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", id_col, "cosine", "rank")
    )


def cosine_topk_sql(
    df: DataFrame, query_df: DataFrame, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Pure-DataFrame variant (zip_with/aggregate dot product) — exact, fully
    Catalyst-planned; used as the oracle-matching path for small query sets.
    query_df: (query_id, qvec array<float>) — broadcast joined.
    """
    dot = F.aggregate(
        F.zip_with(vec_col, "qvec", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    norm = lambda c: F.sqrt(F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda a, x: a + x))  # noqa: E731
    scored = (
        df.crossJoin(F.broadcast(query_df))
        .withColumn("cosine", dot / (norm(F.col(vec_col)) * norm(F.col("qvec")) + F.lit(1e-30)))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", id_col, "cosine", "rank")
    )


def lsh_bucket_embeddings(
    df: DataFrame, n_planes: int = 16, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH: bucket = sign bits of `n_planes` projections.

    Same-bucket rows are cosine-similar with high probability; ANN = score
    within buckets only (join on bucket). The planes live in the closure —
    a few KB broadcast, no shuffle added to compute buckets.
    """

    def bucketize(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        planes = None
        for batch in batches:
            ids = batch.column(batch.schema.get_field_index(id_col)).to_numpy(zero_copy_only=False)
            m = _batch_matrix(batch.column(batch.schema.get_field_index(vec_col)))
            if m.shape[0] == 0:
                continue
            if planes is None:
                rng = np.random.default_rng(seed)
                planes = rng.standard_normal((m.shape[1], n_planes)).astype(np.float32)
            bits = (m @ planes) > 0  # (n, planes)
            bucket = (bits.astype(np.int64) << np.arange(n_planes, dtype=np.int64)).sum(axis=1)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.int64()), pa.array(bucket, pa.int64())],
                names=[id_col, "bucket"],
            )

    buckets = df.select(id_col, vec_col).mapInArrow(bucketize, f"{id_col} long, bucket long")
    return df.join(buckets, id_col)


def ann_topk(
    df: DataFrame, queries: np.ndarray, query_ids: np.ndarray, k: int = 10,
    n_planes: int = 12, seed: int = 42, id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed ANN: score only rows whose bucket matches a query bucket."""
    qm = np.asarray(queries, dtype=np.float32)
    rng = np.random.default_rng(seed)
    d = qm.shape[1]
    planes = rng.standard_normal((d, n_planes)).astype(np.float32)
    qbits = (qm @ planes) > 0
    qbuckets = set(((qbits.astype(np.int64) << np.arange(n_planes, dtype=np.int64)).sum(axis=1)).tolist())
    bucketed = lsh_bucket_embeddings(df, n_planes=n_planes, seed=seed, id_col=id_col, vec_col=vec_col)
    cand = bucketed.where(F.col("bucket").isin(list(qbuckets)))
    return brute_force_topk(cand, qm, query_ids, k=k, id_col=id_col, vec_col=vec_col)
