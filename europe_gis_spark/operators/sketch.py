"""Mergeable frequency/membership sketches: Count-Min (heavy hitters)
and a Bloom-filter semi-join pruner.

Reference analogue: the reference keeps per-tile summary stats in its
Mongo metadata store (scripts/jobs/mongodb_scripts.py:29-46) and
recomputes exact counts per run; at corpus scale a 100 TB engine wants
BOUNDED-memory summaries that merge across partitions/snapshots — the
textbook Cormode–Muthukrishnan Count-Min sketch and Bloom filter, both
built from public formulas.

Hashing is md5-derived on BOTH engines (Spark ``conv(substr(md5(s),1,8),
16,10)`` ≡ DuckDB ``CAST('0x'||SUBSTRING(MD5(s),1,8) AS BIGINT)``), so
every bucket assignment is engine-portable and the DuckDB oracle can
rebuild the identical sketch relationally.

All hot-path expressions are built-in ``pyspark.sql.functions`` — no
Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

CMS_DEPTH = 4
CMS_WIDTH = 1024


def _md5_bucket(prefix, value_col, width: int):
    """Engine-portable hash bucket: first 8 md5 hex chars → uint32 % w."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(prefix, F.lit(":"), value_col)), 1, 8),
            16,
            10,
        ).cast("long")
        % width
    )


def cms_build(
    items: DataFrame,
    item_col: str = "term",
    weight_col: str | None = None,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build Count-Min counters from an item-per-row DataFrame.

    Output is (i, bucket, c) with AT MOST depth·width rows — a
    constant-size summary regardless of input size. The only shuffle is
    the (i, bucket) agg, and its map-side partial caps every task's
    output at depth·width rows, so shuffle volume is O(partitions), not
    O(items). Sketches over disjoint corpora MERGE by unioning counter
    tables and re-aggregating (``cms_merge``) — the property exact
    counts lack at bounded memory.
    """
    rows = items.select(
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("i"),
        F.col(item_col).alias("item"),
        (F.lit(1) if weight_col is None else F.col(weight_col)).alias("wt"),
    )
    return (
        rows.select(
            "i", _md5_bucket(F.col("i").cast("string"), F.col("item"), width).alias("bucket"), "wt"
        )
        .groupBy("i", "bucket")
        .agg(F.sum("wt").alias("c"))
    )


def cms_merge(*counter_tables: DataFrame) -> DataFrame:
    """Merge sketches built with the same (depth, width): counters add."""
    out = counter_tables[0]
    for t in counter_tables[1:]:
        out = out.unionByName(t)
    return out.groupBy("i", "bucket").agg(F.sum("c").alias("c"))


def cms_estimate(
    counters: DataFrame,
    queries: DataFrame,
    item_col: str = "term",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-query the sketch: est(x) = min_i counters[i][h_i(x)].

    The counter table is ≤ depth·width rows → BROADCAST side of the
    probe join (hinted; it is bounded by construction, the one case a
    forced broadcast is always safe). Estimates never underestimate;
    overestimates are bounded by e·N/width with prob 1−e^−depth.
    """
    probes = queries.select(
        F.col(item_col).alias("item"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("i"),
    )
    probes = probes.withColumn(
        "bucket", _md5_bucket(F.col("i").cast("string"), F.col("item"), width)
    )
    return (
        probes.join(F.broadcast(counters), ["i", "bucket"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce("c", F.lit(0))).alias("est"))
        .select(F.col("item").alias(item_col), "est")
    )


BLOOM_BITS = 1 << 15
BLOOM_HASHES = 5


def bloom_bit_positions(
    keys: DataFrame,
    key_col: str,
    m: int = BLOOM_BITS,
    k: int = BLOOM_HASHES,
) -> DataFrame:
    """The set-bit positions of a Bloom filter over ``keys`` — k
    md5-derived positions per key, distinct. ≤ min(m, k·|keys|) rows."""
    return (
        keys.select(
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("i"),
            F.col(key_col).cast("string").alias("key"),
        )
        .select(
            _md5_bucket(
                F.concat(F.lit("bloom"), F.col("i").cast("string")),
                F.col("key"),
                m,
            ).alias("pos")
        )
        .distinct()
    )


def bloom_semi_join(
    fact: DataFrame,
    dim_keys: DataFrame,
    fact_key: str,
    dim_key: str,
    m: int = BLOOM_BITS,
    k: int = BLOOM_HASHES,
) -> DataFrame:
    """Semi join with a map-side Bloom pre-filter: fact rows whose key
    fails ANY of the k bit probes are dropped BEFORE the exact join —
    the classic runtime-filter pattern (Spark's own InjectRuntimeFilter
    does this for AQE-eligible joins; this is the explicit, plannable
    form for when the build side is a separate pipeline stage).

    The bit set ships as a single m-char string literal probed with
    O(1) JVM ``substring`` per hash — no broadcast join, no shuffle
    added to the fact side (see the build-cost note). The exact semi
    join afterwards removes Bloom false positives, so output ≡ plain
    semi join (no false negatives by construction); at 100 TB the win
    is the fact-side shuffle shrinking by the filter's selectivity.

    Build cost: the dim bit positions COLLECT to the driver (≤ m ints);
    valid precisely because the build side is broadcast-scale — the
    same budget as any broadcast hash join, documented at the call site.

    The bitmap ships as an array<bigint> literal (m/64 words, built by
    ONE ``F.expr`` parse and constant-folded) probed with O(1)
    ``element_at`` + ``shiftright`` — NOT as ``isin(*positions)`` (an
    In-list of 10⁴ literals costs seconds of py4j plan construction per
    probe) and NOT as a ``substring`` over an m-char string literal
    (UTF8String counts code points from the string start — O(m) PER
    ROW; measured ~80 µs/row at m=2¹⁵, turning a sub-second filter
    into tens of seconds).
    """
    bits = {r.pos for r in bloom_bit_positions(dim_keys, dim_key, m, k).collect()}
    words = [0] * (m // 64)
    for p in bits:
        words[p // 64] |= 1 << (p % 64)
    # format as signed int64 for the SQL literal
    arr_sql = "array(" + ",".join(
        f"{w - (1 << 64) if w >= (1 << 63) else w}L" for w in words
    ) + ")"
    key = F.col(fact_key).cast("string")
    pruned = fact
    pos_cols = []
    for i in range(k):
        c = f"__bloom_pos_{i}"
        pos_cols.append(c)
        pruned = pruned.withColumn(
            c, _md5_bucket(F.lit(f"bloom{i}"), key, m)
        )
    cond = " AND ".join(
        f"((shiftright(element_at({arr_sql}, cast({c} / 64 as int) + 1),"
        f" cast({c} % 64 as int)) & 1) = 1)"
        for c in pos_cols
    )
    pruned = pruned.filter(F.expr(cond)).drop(*pos_cols)
    return pruned.join(
        dim_keys.select(F.col(dim_key).alias(fact_key)).distinct(),
        fact_key,
        "left_semi",
    )
