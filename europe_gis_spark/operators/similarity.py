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


def rank_band_pairs(
    embeddings: DataFrame,
    query_vecs: list[list[float]],
    top_k: int = 3,
    neg_lo: int = 50,
    neg_hi: int = 52,
) -> DataFrame:
    """Contrastive-training pair mining: for each query vector emit the
    rank-≤``top_k`` neighbors as POSITIVES and the ``neg_lo``..``neg_hi``
    rank band as HARD NEGATIVES (close enough to be informative, far
    enough to be wrong — the standard in-batch-negatives upgrade).

    Shape: the query set is tiny (a constant per job), so each query's
    cosine column is computed in the same codegen'd scan pass (union of
    per-query branches over ONE cached scan at corpus scale); ranking is
    a per-query window — Spark's WindowGroupLimit caps the sort at
    ``neg_hi`` rows per query partition."""
    from pyspark.sql.window import Window

    branches = None
    for qid, qv in enumerate(query_vecs):
        b = cosine_to_query(embeddings, qv).select(
            F.lit(qid).alias("query_id"), "vec_id", "cosine"
        )
        branches = b if branches is None else branches.unionByName(b)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    ranked = branches.withColumn("rank", F.row_number().over(w))
    # the conjunctive rank <= neg_hi filter FIRST: InferWindowGroupLimit
    # only extracts simple conjuncts, so a bare disjunction would force
    # a full per-query sort; with the bound in place each map partition
    # forwards at most neg_hi rows per query before the band filter
    return ranked.filter(F.col("rank") <= neg_hi).filter(
        (F.col("rank") <= top_k) | (F.col("rank") >= neg_lo)
    ).select(
        "query_id",
        "vec_id",
        "rank",
        F.when(F.col("rank") <= top_k, F.lit("pos"))
        .otherwise(F.lit("neg"))
        .alias("band"),
        "cosine",
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes from counter hashing."""
    ids = np.arange(dim * n_planes, dtype=np.uint64)
    u = h64(ids, seed, 60).astype(np.float64) / 2**64
    return (u.reshape(n_planes, dim) - 0.5) * 2.0


SIG_SCHEMA = "vec_id long, bucket int"


def lsh_buckets_np(mat: np.ndarray, n_planes: int, seed: int) -> np.ndarray:
    """Sign-projection bucket ids for a row-matrix — the exact kernel
    the ``lsh_buckets`` mapInPandas pass runs per Arrow batch, exposed
    so the DuckDB oracle can recompute buckets driver-side."""
    mat = np.asarray(mat, dtype=np.float64)
    planes = hyperplanes(mat.shape[1], n_planes, seed)
    bits = (mat @ planes.T > 0).astype(np.int64)
    return (bits * (1 << np.arange(n_planes))).sum(axis=1).astype(np.int32)


def lsh_probe_set(
    query_vec: list[float], n_planes: int, probe_hamming: int, seed: int
) -> list[int]:
    """The query's bucket plus all buckets within ``probe_hamming`` bit
    flips (multi-probe LSH probe set), sorted."""
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
    return sorted(probe)


def lsh_buckets(embeddings: DataFrame, n_planes: int = 8, seed: int = 7) -> DataFrame:
    """Sign-projection signature → int bucket (vectorized one-pass)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            mat = np.array(b["embedding"].tolist(), dtype=np.float64)
            bucket = lsh_buckets_np(mat, n_planes, seed)
            yield pd.DataFrame({"vec_id": b["vec_id"], "bucket": bucket})

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
    probe = lsh_probe_set(query_vec, n_planes, probe_hamming, seed)
    buckets = lsh_buckets(embeddings, n_planes, seed).filter(
        F.col("bucket").isin(probe)
    )
    cand = embeddings.join(buckets, "vec_id", "left_semi")
    return brute_force_topk(cand, query_vec, k)


def spherical_kmeans(x: np.ndarray, n_lists: int, iters: int, seed: int) -> np.ndarray:
    """Fixed-iteration spherical k-means on an ALREADY-ORDERED sample
    matrix — pure numpy, bit-deterministic for a given row order, so the
    same kernel serves both the Spark training path and the driver-side
    DuckDB-oracle recomputation (the simhash_pairs oracle pattern)."""
    x = np.asarray(x, dtype=np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    ids = h64(np.arange(len(x), dtype=np.uint64), seed, 61)
    init = np.argsort(ids)[:n_lists]
    c = x[init].copy()
    for _ in range(iters):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(n_lists):
            m = assign == j
            if m.any():
                v = x[m].sum(axis=0)
                c[j] = v / max(np.linalg.norm(v), 1e-12)
    return c


def _md5_hex(v) -> str:
    import hashlib

    return hashlib.md5(str(v).encode()).hexdigest()


def train_ivf_centroids(
    embeddings: DataFrame,
    n_lists: int = 64,
    sample: int = 4096,
    iters: int = 8,
    seed: int = 7,
) -> np.ndarray:
    """Spherical k-means coarse quantizer, trained on the driver from a
    deterministic sample (the IVF 'train' step — FAISS IVF's exact
    shape). Returns L2-normalized centroids (n_lists, dim).

    The sample is tiny and the iteration count fixed, so training cost
    is independent of corpus size; only assignment scans the corpus.
    The sample order key is md5(vec_id) with a vec_id tie-break — an
    ENGINE-PORTABLE total order (same trick as hash_split), so a pandas
    driver-side recomputation (``train_ivf_centroids_pandas``) yields
    bit-identical centroids and the ANN queries get exact oracles.
    """
    pdf = (
        embeddings.select("vec_id", "embedding")
        .orderBy(
            F.md5(F.encode(F.col("vec_id").cast("string"), "UTF-8")),
            F.asc("vec_id"),
        )
        .limit(sample)
        .toPandas()
    )
    x = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    return spherical_kmeans(x, n_lists, iters, seed)


def train_ivf_centroids_pandas(
    pdf,
    n_lists: int = 64,
    sample: int = 4096,
    iters: int = 8,
    seed: int = 7,
) -> np.ndarray:
    """Driver-side twin of ``train_ivf_centroids`` over a pandas frame
    (columns vec_id, embedding) — no Spark. Used by the DuckDB oracle
    builders to recompute the engine-specific intermediate (centroids →
    list assignments → probe set) so the downstream exact top-k can be
    brute-forced relationally; a pytest pins bit-equality of the two
    training paths."""
    sel = (
        pdf[["vec_id", "embedding"]]
        .assign(_k=pdf["vec_id"].map(_md5_hex))
        .sort_values(["_k", "vec_id"], kind="mergesort")
        .head(sample)
    )
    x = np.array(sel["embedding"].tolist(), dtype=np.float64)
    return spherical_kmeans(x, n_lists, iters, seed)


def assign_lists_np(emb: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """Numpy twin of the ``ivf_assign`` mapInPandas kernel (normalize →
    max-dot centroid), for oracle-side recomputation."""
    mat = np.asarray(emb, dtype=np.float64)
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    return np.argmax(mat @ np.asarray(centroids).T, axis=1).astype(np.int32)


def ivf_assign(embeddings: DataFrame, centroids: np.ndarray) -> DataFrame:
    """Assign every vector to its nearest (max-dot, normalized) coarse
    centroid: (vec_id, list_id). One vectorized Arrow pass, no shuffle.
    At corpus scale this output is WRITTEN partitioned by list_id (see
    write_ivf_index) so probing becomes partition pruning."""
    c = centroids

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            mat = np.array(b["embedding"].tolist(), dtype=np.float64)
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            lists = np.argmax(mat @ c.T, axis=1).astype(np.int32)
            yield pd.DataFrame({"vec_id": b["vec_id"], "list_id": lists})

    return embeddings.select("vec_id", "embedding").mapInPandas(
        fn, schema="vec_id long, list_id int"
    )


def write_ivf_index(
    embeddings: DataFrame, path: str, centroids: np.ndarray
) -> None:
    """Materialize the IVF index: rows partitioned BY LIST so a probe of
    p lists scans only p/n_lists of the data (parquet partition pruning
    — plan-asserted in tests)."""
    embeddings.join(ivf_assign(embeddings, centroids), "vec_id").write.mode(
        "overwrite"
    ).partitionBy("list_id").parquet(path)


def probe_lists(centroids: np.ndarray, query_vec: list[float], n_probe: int) -> list[int]:
    q = np.asarray(query_vec, dtype=np.float64)
    q /= max(np.linalg.norm(q), 1e-12)
    return np.argsort(-(centroids @ q))[:n_probe].astype(int).tolist()


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_lists: int = 64,
    n_probe: int = 16,
    seed: int = 7,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF ANN: exact cosine top-k inside the ``n_probe`` inverted lists
    nearest to the query — candidates ≈ n_probe/n_lists of the corpus.
    Defaults scan ~24 % for recall ≈ 0.6 on UNIFORM-random embeddings
    (ANN's worst case: true neighbors are barely above random and
    scatter across lists; measured 8→0.40, 16→0.60, 32→0.90 on the
    test corpus). Real embedding distributions cluster, where the same
    probe count buys far higher recall — tune per corpus. Recall is
    pytest-gated against brute force; pass a prebuilt ``centroids`` to
    amortize training across queries (the production shape)."""
    if centroids is None:
        centroids = train_ivf_centroids(embeddings, n_lists=n_lists, seed=seed)
    probe = probe_lists(centroids, query_vec, n_probe)
    assigned = ivf_assign(embeddings, centroids).filter(
        F.col("list_id").isin(probe)
    )
    cand = embeddings.join(assigned, "vec_id", "left_semi")
    return brute_force_topk(cand, query_vec, k)


def ivf_topk_from_index(
    spark,
    index_path: str,
    centroids: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 16,
) -> DataFrame:
    """The at-rest form: read the list-partitioned index with a probe
    filter that Catalyst turns into PartitionFilters — only the probed
    lists' files are scanned."""
    probe = probe_lists(centroids, query_vec, n_probe)
    cand = spark.read.parquet(index_path).filter(F.col("list_id").isin(probe))
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
    from .dedup import cap_hot_buckets

    b = lsh_buckets(embeddings, n_planes, seed)
    e = embeddings.join(b, "vec_id")
    if max_bucket is not None:
        e = cap_hot_buckets(e, ("bucket",), max_bucket)
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


def assign_lists_with_cos(
    embeddings: DataFrame, centroids: np.ndarray
) -> DataFrame:
    """(vec_id, list_id, cos_centroid): nearest-centroid assignment plus
    the (rounded) cosine to that centroid, one vectorized Arrow pass —
    the SemDeDup ordering key. The cosine is computed in the SAME numpy
    kernel on the Spark path and the oracle twin, so the rounded value
    is bit-identical across engines."""
    c = np.asarray(centroids, dtype=np.float64)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            mat = np.array(b["embedding"].tolist(), dtype=np.float64)
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            dots = mat @ c.T
            lists = np.argmax(dots, axis=1).astype(np.int32)
            cos = np.round(dots[np.arange(len(mat)), lists], 8)
            yield pd.DataFrame(
                {"vec_id": b["vec_id"], "list_id": lists, "cos_centroid": cos}
            )

    return embeddings.select("vec_id", "embedding").mapInPandas(
        fn, schema="vec_id long, list_id int, cos_centroid double"
    )


def semdedup_flags(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_clusters: int = 32,
    seed: int = 7,
    centroids: np.ndarray | None = None,
    max_cluster: int | None = 10_000,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by k-means clustering of embeddings, then dropping
    within each cluster every item whose cosine to an EARLIER-ordered
    cluster member reaches ``threshold``. Items are ordered by cosine
    to the cluster centroid ASCENDING (vec_id tie-break), so the
    survivor of each near-dup group is its LOWEST-centroid-similarity
    member — the paper's keep policy (prototypical examples are the
    redundant ones; edge examples carry the information).

    The drop rule is the paper implementation's non-iterative one:
    drop(b) ⇔ ∃ a in the same cluster with rank(a) < rank(b) and
    cos(a,b) ≥ τ — a appearing earlier need not itself survive. That
    makes the whole operator ONE plan (no fixpoint): rank window +
    per-cluster vectorized cosine pass + flag join, all on the list_id
    key.

    Scale shape (the paper runs 50k clusters over LAION-440M): training
    is a fixed-size driver sample; assignment is map-side; the rank
    window and the self-join share the list_id hash key. Within-cluster
    pairwise work is O((corpus/n_clusters)²) per cluster — n_clusters
    grows with the corpus to bound it, and ``max_cluster`` drops
    degenerate hot clusters wholesale (cap-not-crash, like the LSH
    bucket caps). Returns every input row flagged:
    (vec_id, list_id, cos_centroid, kept)."""
    from pyspark.sql.window import Window

    from .dedup import cap_hot_buckets

    if centroids is None:
        centroids = train_ivf_centroids(
            embeddings, n_lists=n_clusters, seed=seed
        )
    a = assign_lists_with_cos(embeddings, centroids)
    if max_cluster is not None:
        a = cap_hot_buckets(a, ("list_id",), max_cluster)
    w = Window.partitionBy("list_id").orderBy(
        F.asc("cos_centroid"), F.asc("vec_id")
    )
    # pin the tiny (vec_id, list_id, cos, rank) table ONCE — the
    # simhash fingerprint-table discipline (~24 B/row): without it the
    # Arrow assignment pass + rank window re-run for the self-join's
    # two sides AND the final flag join (measured 8 scans → 2)
    ranked = a.withColumn("rank", F.row_number().over(w)).localCheckpoint(
        eager=True
    )
    # Within-cluster pairwise cosine as ONE vectorized Arrow pass per
    # cluster (numpy matmul in row blocks) instead of a rank-theta
    # self-join evaluating an interpreted zip_with/aggregate dot per
    # pair — measured 1 381 core-seconds at sf1.0 (13M pairs × 64 dims)
    # for the join form vs milliseconds of BLAS here. Same math, same
    # op order (widen float32→float64, dot / (‖a‖·‖b‖), round 8, ≥ τ);
    # summation order inside the dot differs by ulps, which the round-8
    # threshold compare absorbs (verified hash-identical at sf0.01/0.1/
    # 1.0 against both the old plan and the DuckDB oracle). Shuffles
    # only (vec_id, rank, embedding) keyed by list_id — the exchange the
    # self-join needed anyway, minus the pair blow-up.
    thr = float(threshold)

    def _drop_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n <= 1:
            return pd.DataFrame({"vec_id": pd.Series([], dtype="int64")})
        mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
        norms = np.sqrt((mat * mat).sum(axis=1))
        ranks = pdf["rank"].to_numpy()
        ids = pdf["vec_id"].to_numpy()
        dropped = np.zeros(n, dtype=bool)
        blk = 512  # bounds the cosine block at blk×max_cluster doubles
        for s in range(0, n, blk):
            rows = slice(s, min(s + blk, n))
            cos = np.round(
                (mat[rows] @ mat.T) / np.outer(norms[rows], norms), 8
            )
            hit = (cos >= thr) & (ranks[None, :] < ranks[rows][:, None])
            dropped[rows] |= hit.any(axis=1)
        return pd.DataFrame({"vec_id": ids[dropped].astype("int64")})

    e = embeddings.select("vec_id", "embedding").join(
        ranked.select("vec_id", "list_id", "rank"), "vec_id"
    )
    dropped = e.groupBy("list_id").applyInPandas(_drop_fn, "vec_id long")
    return ranked.join(dropped.withColumn("_d", F.lit(True)), "vec_id", "left").select(
        "vec_id",
        "list_id",
        "cos_centroid",
        "rank",
        F.coalesce(~F.col("_d"), F.lit(True)).alias("kept"),
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    id_col: str = "doc_id",
    c: int = 60,
    top_k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of two candidate lists (Cormack et al.):
    rrf(d) = Σ_lists 1/(c + rank_d) — the standard score-free way to
    merge a lexical (BM25) and a vector (cosine) ranking into one
    hybrid result; c=60 is the published default.

    Inputs are (id, rank) lists ALREADY truncated to their per-ranker
    top-L (each produced by a TakeOrderedAndProject — at corpus scale
    the fusion only ever touches ≤ 2L rows, never the corpus). Missing
    membership in one list contributes 0, per the published formula
    (full outer join + coalesce). Fused scores are ROUNDED with an id
    tie-break so rank boundaries are engine-exact.
    """
    a = ranked_a.select(F.col(id_col), F.col("rank").alias("rank_a"))
    b = ranked_b.select(F.col(id_col), F.col("rank").alias("rank_b"))
    contrib_a = F.when(
        F.col("rank_a").isNotNull(), F.lit(1.0) / (F.lit(c) + F.col("rank_a"))
    ).otherwise(F.lit(0.0))
    contrib_b = F.when(
        F.col("rank_b").isNotNull(), F.lit(1.0) / (F.lit(c) + F.col("rank_b"))
    ).otherwise(F.lit(0.0))
    return (
        a.join(b, id_col, "full_outer")
        .select(
            id_col,
            "rank_a",
            "rank_b",
            F.round(contrib_a + contrib_b, 8).alias("rrf"),
        )
        .orderBy(F.desc("rrf"), F.asc(id_col))
        .limit(top_k)
    )


def with_rank(topk: DataFrame, score_col: str, id_col: str = "doc_id") -> DataFrame:
    """Attach 1-based ranks to an already-truncated top-L list.

    The window is a SINGLE partition by construction — acceptable only
    because the input is a constant-bounded top-L (post-limit), never a
    corpus-scale table; the corpus-scale ranking work already happened
    inside the upstream TakeOrderedAndProject.
    """
    from pyspark.sql.window import Window

    w = Window.orderBy(F.desc(score_col), F.asc(id_col))
    return topk.withColumn("rank", F.row_number().over(w))


# --- Product quantization (PQ) ANN -------------------------------------
# Jégou et al. 2011: split the (normalized) vector into PQ_M subspaces,
# k-means each subspace to PQ_K codewords, store only the M uint8 codes
# (8 B/vec vs 256 B float32 at dim=64 — the at-rest compression that
# makes 10^12-vector search feasible). Queries score via ADC: one
# (M × K) lookup table built driver-side per query, approximate inner
# product = Σ_m table[m][code_m] — pure map-side JVM lookups on the
# code column, no decode, no Python in the scan path.

PQ_M = 8
PQ_K = 16


def l2_kmeans(x: np.ndarray, k: int, iters: int, seed: int) -> np.ndarray:
    """Fixed-iteration L2 k-means on an ALREADY-ORDERED sample — the
    same bit-deterministic discipline as spherical_kmeans, shared by
    the Spark training path and the oracle-side pandas twin."""
    x = np.asarray(x, dtype=np.float64)
    ids = h64(np.arange(len(x), dtype=np.uint64), seed, 61)
    c = x[np.argsort(ids)[:k]].copy()
    for _ in range(iters):
        d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=-1)
        assign = np.argmin(d2, axis=1)
        for j in range(k):
            m = assign == j
            if m.any():
                c[j] = x[m].mean(axis=0)
    return c


def _pq_sample_matrix(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, dtype=np.float64)
    return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)


def train_pq_codebooks(
    embeddings: DataFrame,
    m: int = PQ_M,
    k: int = PQ_K,
    sample: int = 4096,
    iters: int = 8,
    seed: int = 7,
) -> np.ndarray:
    """Train the (m, k, dim/m) PQ codebooks on the driver from the same
    md5-ordered deterministic sample as IVF training (engine-portable
    total order → the pandas twin is bit-identical and the driver query
    gets an exact oracle). Vectors are L2-normalized before splitting,
    so ADC approximates cosine."""
    pdf = (
        embeddings.select("vec_id", "embedding")
        .orderBy(
            F.md5(F.encode(F.col("vec_id").cast("string"), "UTF-8")),
            F.asc("vec_id"),
        )
        .limit(sample)
        .toPandas()
    )
    x = _pq_sample_matrix(np.array(pdf["embedding"].tolist()))
    ds = x.shape[1] // m
    return np.stack(
        [l2_kmeans(x[:, j * ds : (j + 1) * ds], k, iters, seed + j) for j in range(m)]
    )


def train_pq_codebooks_pandas(
    pdf,
    m: int = PQ_M,
    k: int = PQ_K,
    sample: int = 4096,
    iters: int = 8,
    seed: int = 7,
) -> np.ndarray:
    """Driver-side twin of ``train_pq_codebooks`` (no Spark) for the
    DuckDB oracle builders; bit-equality pytest-pinned."""
    sel = (
        pdf[["vec_id", "embedding"]]
        .assign(_k=pdf["vec_id"].map(_md5_hex))
        .sort_values(["_k", "vec_id"], kind="mergesort")
        .head(sample)
    )
    x = _pq_sample_matrix(np.array(sel["embedding"].tolist()))
    ds = x.shape[1] // m
    return np.stack(
        [l2_kmeans(x[:, j * ds : (j + 1) * ds], k, iters, seed + j) for j in range(m)]
    )


def pq_encode_np(emb: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """Numpy encode kernel (normalize → per-subspace argmin L2): shared
    by the Spark mapInPandas pass and the oracle recomputation."""
    x = _pq_sample_matrix(np.asarray(emb))
    m, k, ds = codebooks.shape
    codes = np.empty((len(x), m), dtype=np.int32)
    for j in range(m):
        sub = x[:, j * ds : (j + 1) * ds]
        d2 = ((sub[:, None, :] - codebooks[j][None, :, :]) ** 2).sum(axis=-1)
        codes[:, j] = np.argmin(d2, axis=1)
    return codes


def pq_encode(embeddings: DataFrame, codebooks: np.ndarray) -> DataFrame:
    """(vec_id, codes array<int>) — one vectorized Arrow pass, no
    shuffle. At rest this column is the whole index: m bytes/vector."""
    c = codebooks

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            codes = pq_encode_np(np.array(b["embedding"].tolist()), c)
            yield pd.DataFrame({"vec_id": b["vec_id"], "codes": list(codes)})

    return embeddings.select("vec_id", "embedding").mapInPandas(
        fn, schema="vec_id long, codes array<int>"
    )


def pq_adc_tables(codebooks: np.ndarray, query_vec: list[float]) -> np.ndarray:
    """The per-query ADC lookup table (m, k): table[j][c] = <q_sub_j,
    codeword_jc> over the L2-normalized query."""
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    m, k, ds = codebooks.shape
    return np.stack(
        [codebooks[j] @ q[j * ds : (j + 1) * ds] for j in range(m)]
    )


def pq_adc_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    codebooks: np.ndarray | None = None,
) -> DataFrame:
    """PQ-ADC approximate top-k: score every code row via m table
    lookups (tiny array<double> literals — JVM element_at, codegen) and
    TakeOrderedAndProject the winners. The embedding column is read
    ONCE to encode; in the production at-rest shape the code column is
    precomputed and the scan touches m bytes/vector. Scores are ROUNDED
    with a vec_id tie-break; the 8-term sum is evaluated left-to-right
    in both engines, so the oracle is bit-exact."""
    if codebooks is None:
        codebooks = train_pq_codebooks(embeddings)
    tables = pq_adc_tables(codebooks, query_vec)
    codes = pq_encode(embeddings, codebooks)
    score = None
    for j in range(tables.shape[0]):
        tab = F.array(*[F.lit(float(v)) for v in tables[j]])
        term = F.element_at(tab, F.element_at("codes", j + 1) + 1)
        score = term if score is None else score + term
    return (
        codes.select("vec_id", F.round(score, 8).alias("adc"))
        .orderBy(F.desc("adc"), F.asc("vec_id"))
        .limit(k)
    )


def ivfpq_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_lists: int = 64,
    n_probe: int = 16,
    seed: int = 7,
    centroids: np.ndarray | None = None,
    codebooks: np.ndarray | None = None,
) -> DataFrame:
    """FAISS-IVFPQ shape: the coarse quantizer prunes to ``n_probe``
    inverted lists, PQ-ADC scores only the survivors — at rest this is
    a list-partitioned code table (m bytes/vector), so a query scans
    n_probe/n_lists of an already-256×-compressed index. Both training
    steps reuse the deterministic-sample kernels, so the oracle
    re-derives probe set AND codes exactly."""
    if centroids is None:
        centroids = train_ivf_centroids(embeddings, n_lists=n_lists, seed=seed)
    if codebooks is None:
        codebooks = train_pq_codebooks(embeddings, seed=seed)
    probe = probe_lists(centroids, query_vec, n_probe)
    cand = embeddings.join(
        ivf_assign(embeddings, centroids).filter(F.col("list_id").isin(probe)),
        "vec_id",
        "left_semi",
    )
    return pq_adc_topk(cand, query_vec, k=k, codebooks=codebooks)
