"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k entirely in built-in higher-order
functions (``zip_with`` + ``aggregate`` — JVM, codegen). Scale path:
LSH-bucketed ANN via deterministic random-hyperplane signatures (one
pandas-UDF pass to sign-project, then bucket-local search) — the IVF
pattern without a training step.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..datagen.hashing import h64


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_to_query(embeddings: DataFrame, query_vec: list[float]) -> DataFrame:
    """cosine(embedding, query) for every row — no shuffle, codegen."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    qn = float(np.sqrt(np.sum(np.asarray(query_vec, dtype=np.float64) ** 2)))
    dot = _dot(F.col("embedding"), q)
    norm = F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
    return embeddings.select(
        "vec_id",
        "label",
        F.round(dot / (norm * F.lit(qn)), 8).alias("cosine"),
    )


def brute_force_topk(embeddings: DataFrame, query_vec: list[float], k: int = 10) -> DataFrame:
    """Exact top-k by cosine: per-partition top-k then global merge —
    Spark's orderBy().limit() already executes as TakeOrderedAndProject
    (no full sort shuffle)."""
    return (
        cosine_to_query(embeddings, query_vec)
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes from counter hashing."""
    ids = np.arange(dim * n_planes, dtype=np.uint64)
    u = h64(ids, seed, 60).astype(np.float64) / 2**64
    return (u.reshape(n_planes, dim) - 0.5) * 2.0


SIG_SCHEMA = "vec_id long, bucket int"


def lsh_buckets(embeddings: DataFrame, n_planes: int = 8, seed: int = 7) -> DataFrame:
    """Sign-projection signature → int bucket (vectorized one-pass)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        planes = None
        for b in batches:
            mat = np.array(b["embedding"].tolist(), dtype=np.float64)
            if planes is None:
                planes = hyperplanes(mat.shape[1], n_planes, seed)
            proj = mat @ planes.T
            bits = (proj > 0).astype(np.int64)
            bucket = (bits * (1 << np.arange(n_planes))).sum(axis=1)
            yield pd.DataFrame({"vec_id": b["vec_id"], "bucket": bucket.astype(np.int32)})

    return embeddings.select("vec_id", "embedding").mapInPandas(fn, schema=SIG_SCHEMA)


def ann_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 5,
    probe_hamming: int = 2,
    seed: int = 7,
) -> DataFrame:
    """ANN: search only buckets within ``probe_hamming`` of the query's
    bucket (multi-probe LSH), then exact cosine inside the candidates.
    Recall < 1 by design; pytest checks recall against brute force.

    Defaults (5 planes, hamming ≤ 2) probe ≈ half the corpus on
    uniform-random embeddings — real embedding distributions cluster,
    where the same settings probe far less; tune per corpus."""
    planes = hyperplanes(len(query_vec), n_planes, seed)
    qbits = (planes @ np.asarray(query_vec, dtype=np.float64) > 0).astype(int)
    qbucket = int((qbits * (1 << np.arange(n_planes))).sum())
    probe = {qbucket}
    if probe_hamming >= 1:
        probe |= {qbucket ^ (1 << j) for j in range(n_planes)}
    if probe_hamming >= 2:
        probe |= {
            qbucket ^ (1 << j) ^ (1 << j2)
            for j in range(n_planes)
            for j2 in range(j + 1, n_planes)
        }
    probe = sorted(probe)
    buckets = lsh_buckets(embeddings, n_planes, seed).filter(
        F.col("bucket").isin(probe)
    )
    cand = embeddings.join(buckets, "vec_id", "left_semi")
    return brute_force_topk(cand, query_vec, k)


def pairwise_cosine_dups(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 6,
    seed: int = 7,
    max_bucket: int | None = 10_000,
) -> DataFrame:
    """Embedding near-duplicate pairs: bucket-local pairwise cosine
    (LSH prefilter keeps it from being all-pairs at scale).

    ``max_bucket`` caps bucket size (a degenerate bucket — e.g. all-zero
    embeddings landing together — would be a quadratic join); oversized
    buckets are dropped wholesale via a windowed count over the same
    (bucket) exchange the self-join uses, so the embedding scan runs
    once (ReusedExchange), mirroring dedup.lsh_candidate_pairs."""
    from pyspark.sql.window import Window

    b = lsh_buckets(embeddings, n_planes, seed)
    e = embeddings.join(b, "vec_id")
    if max_bucket is not None:
        w = Window.partitionBy("bucket")
        e = (
            e.withColumn("n_in_bucket", F.count("*").over(w))
            .filter(F.col("n_in_bucket") <= max_bucket)
            .drop("n_in_bucket")
        )
    left = e.alias("a").hint("shuffle_hash")
    right = e.alias("b")
    pairs = left.join(
        right,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    )
    dot = _dot(F.col("a.embedding"), F.col("b.embedding"))
    na = F.sqrt(_dot(F.col("a.embedding"), F.col("a.embedding")))
    nb = F.sqrt(_dot(F.col("b.embedding"), F.col("b.embedding")))
    return (
        pairs.select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(dot / (na * nb), 8).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .distinct()
    )
