"""Deduplication operators for web-text corpora (training-data layer).

Four strategies, scale-ranked:
  * exact        — md5 groupBy (one shuffle on the hash key)
  * minhash-LSH  — word-shingle → md5 minhash signature → banded buckets
                   → candidate pairs (the 100 TB path: pair generation is
                   bucket-local, never all-pairs)
  * ngram-jaccard — exact verification of candidate pairs (or, at test
                   scale, of all shingle-sharing pairs)
  * simhash      — 64-bit bitwise fingerprint, hamming-close pairs via
                   band rotation (pandas-UDF bit ops)

MinHash uses lexicographic min over md5 hex digests (a hash-min is a
hash-min; strings avoid engine-specific int hashing) so the DuckDB
oracle reproduces signatures exactly.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

SHINGLE_WORDS = 5
N_HASHES = 12
BAND_SIZE = 3  # 4 bands of 3 hashes


def exact_dup_groups(docs: DataFrame) -> DataFrame:
    """Exact duplicate groups by content hash (normalized text)."""
    norm = F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
    return (
        docs.select("doc_id", F.md5(norm).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .filter(F.col("n_docs") >= 2)
    )


def shingles_df(docs: DataFrame, k: int = SHINGLE_WORDS, distinct: bool = True) -> DataFrame:
    """Word k-gram shingles per doc: (doc_id, shingle).

    ``distinct=False`` skips the per-array dedup — correct for min-hash
    aggregation (duplicates can't change a min) and measurably cheaper;
    Jaccard set arithmetic needs ``distinct=True``."""
    toks = F.split(F.trim(F.col("text")), r"\s+")
    # guard: Spark sequence(1, n) with n < 1 runs DESCENDING — emit an
    # empty shingle set for too-short docs instead
    arr = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (k - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )
    if distinct:
        arr = F.array_distinct(arr)
    sh = F.when(F.size(toks) >= k, arr).otherwise(F.array().cast("array<string>"))
    return docs.select("doc_id", F.explode(sh).alias("shingle"))


def minhash_expr(j: int, col: str = "shingle") -> str:
    """SQL text of minhash j — shared verbatim with the DuckDB oracle.

    Hash family: 4 independent 8-hex-char slices per md5 digest, over
    salted digests md5('<s>:' || shingle) — 12 hashes cost 3 md5 calls
    instead of 12 (the md5 evaluation dominated the LSH job's runtime).
    Lexicographic min over fixed-width hex == hash-min.
    """
    salt, slice_i = divmod(j, 4)
    return f"substring(md5('{salt}:' || {col}), {1 + 8 * slice_i}, 8)"


def minhash_signatures(docs: DataFrame, n_hashes: int = N_HASHES) -> DataFrame:
    """Per-doc minhash signature columns mh0..mh{n-1}:
    mh_j = min(hash_j(shingle)) over the doc's shingles."""
    sh = shingles_df(docs, distinct=False)
    aggs = [
        F.min(F.expr(minhash_expr(j))).alias(f"mh{j}") for j in range(n_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(
    docs: DataFrame, n_hashes: int = N_HASHES, band_size: int = BAND_SIZE
) -> DataFrame:
    """Banded LSH: equal band-signature ⇒ candidate pair. Pair
    generation is a self-equi-join per band key — bucket-local, the
    trick that avoids O(n²) at corpus scale."""
    sig = minhash_signatures(docs, n_hashes)
    n_bands = n_hashes // band_size
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "|",
                            *[F.col(f"mh{b * band_size + j}") for j in range(band_size)],
                        ).alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.key")
    left = bands.alias("l")
    right = bands.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b")
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame, threshold: float = 0.5, k: int = SHINGLE_WORDS
) -> DataFrame:
    """Exact word-k-gram Jaccard over shingle-sharing pairs.

    At 100 TB this runs ONLY on LSH candidates; at test scale the
    shingle self-join is the exact oracle-checkable form."""
    sh = shingles_df(docs, k)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    pair_common = (
        sh.alias("a")
        .join(sh.alias("b"), (F.col("a.shingle") == F.col("b.shingle"))
              & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    return (
        pair_common.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "sh_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "sh_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("sh_a") + F.col("sh_b") - F.col("n_common")),
                9,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "jaccard")
    )


SIMHASH_SCHEMA = "doc_id long, simhash long"

_SHIFTS = np.arange(64, dtype=np.uint64)
_POWERS = (np.uint64(1) << _SHIFTS).astype(np.uint64)


def simhash_batch(texts: list) -> np.ndarray:
    """64-bit SimHash per document, vectorized over the whole batch.

    Token hash = blake2b-64; bit j of a doc's hash is set iff the +1/−1
    vote over its tokens is positive (⇔ set-bit count > n_tokens/2).
    One bit-matrix + one ``np.add.reduceat`` serves every document in
    the Arrow batch — no per-document numpy allocations. NB: assembly
    stays in uint64 throughout; a naive ``sum(1 << j …)`` promotes numpy
    uint64 through float64 and silently corrupts the low bits.
    """
    import hashlib

    toks_per = [(t or "").split() for t in texts]
    counts = np.array([len(t) for t in toks_per], dtype=np.int64)
    out = np.zeros(len(texts), dtype=np.int64)
    nz = np.nonzero(counts)[0]
    if len(nz) == 0:
        return out
    all_toks = [x for t in toks_per for x in t]
    hs = np.frombuffer(
        b"".join(
            hashlib.blake2b(x.encode(), digest_size=8).digest() for x in all_toks
        ),
        dtype="<u8",
    )
    bits = ((hs[:, None] >> _SHIFTS[None, :]) & np.uint64(1)).astype(np.int32)
    ends = np.cumsum(counts)
    starts = ends - counts
    seg = np.add.reduceat(bits, starts[nz], axis=0)  # (n_nonempty, 64)
    set_bit = (2 * seg) > counts[nz][:, None]  # vote > 0
    vals = (set_bit.astype(np.uint64) * _POWERS[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    out[nz] = vals.astype(np.int64)
    return out


def simhash_one(text: str) -> np.int64:
    return np.int64(simhash_batch([text])[0])


def simhash(docs: DataFrame) -> DataFrame:
    """64-bit SimHash over whitespace tokens, one Arrow batch pass."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            sims = simhash_batch(b["text"].tolist())
            yield pd.DataFrame({"doc_id": b["doc_id"].to_numpy(), "simhash": sims})

    return docs.select("doc_id", "text").mapInPandas(fn, schema=SIMHASH_SCHEMA)


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Hamming-close pairs via 4×16-bit band buckets (a pair within
    hamming ≤ 3·16 shares ≥1 band; verify with bit_count)."""
    sh = simhash(docs)
    bands = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), 16 * b)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", "bk.band", "bk.key")
    pairs = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return pairs.withColumn(
        "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    ).filter(F.col("hamming") <= max_hamming).select("doc_a", "doc_b", "hamming")
