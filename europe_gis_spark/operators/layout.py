"""Z-order (Morton) data layout for spatial scan pruning at scale.

The 100 TB problem: a bbox query over parquet written in arrival order
touches every row group, because each group's (x, y) min/max spans the
whole extent. Writing the table clustered by the Morton interleave of
bucketed (x, y) makes every row group cover a compact spatial blob, so
the engine's ordinary row-group min/max statistics prune the scan to
the handful of groups intersecting the query bbox — the same trick
Delta/Iceberg expose as ``OPTIMIZE ZORDER BY``, here as plain Spark.

The reference gets this for free from PostGIS spatial indexes on the
server (``/root/reference/scripts/jobs/process_raster_layer.py`` writes
to PostGIS); on a data lake the LAYOUT is the index.

Everything is pure column arithmetic (shift/and/or on longs — inside
whole-stage codegen); no UDF, no driver collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_MASKS = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def _part1by1(c: Column) -> Column:
    """Spread a 32-bit int's bits to the even bit positions of a long
    (the magic-mask Morton spread, fully JVM-side)."""
    c = c.cast("long")
    for shift, mask in _MASKS:
        c = c.bitwiseOR(F.shiftleft(c, shift)).bitwiseAND(F.lit(mask))
    return c


def zorder_key(
    x: Column,
    y: Column,
    x0: float,
    y0: float,
    cell: float,
    bits: int = 20,
) -> Column:
    """Morton key of (x, y) bucketed on a ``cell``-sized grid anchored
    at (x0, y0): interleave(xb, yb) — adjacent keys are spatially
    adjacent, which is the entire point. ``bits`` caps each axis (20
    bits ≈ 10⁶ buckets/axis; beyond that the interleave of two 32-bit
    halves no longer fits a long)."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    hi = (1 << bits) - 1
    xb = F.least(
        F.greatest(F.floor((x - F.lit(x0)) / F.lit(cell)), F.lit(0)),
        F.lit(hi),
    ).cast("int")
    yb = F.least(
        F.greatest(F.floor((y - F.lit(y0)) / F.lit(cell)), F.lit(0)),
        F.lit(hi),
    ).cast("int")
    return _part1by1(xb).bitwiseOR(F.shiftleft(_part1by1(yb), 1))


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    x0: float,
    y0: float,
    cell: float,
    n_files: int = 8,
    bits: int = 20,
) -> None:
    """Write ``df`` as parquet clustered by Z-order of (x_col, y_col).

    ``repartitionByRange`` on the Morton key splits the keyspace into
    ``n_files`` contiguous slices (one range shuffle — the layout cost,
    paid once at write), ``sortWithinPartitions`` orders rows inside
    each file so every parquet ROW GROUP covers a compact spatial blob,
    and the helper key is dropped before writing: pruning then runs off
    the ordinary (x, y) column min/max statistics, no reader-side
    cooperation needed."""
    key = zorder_key(F.col(x_col), F.col(y_col), x0, y0, cell, bits)
    (
        df.withColumn("_zorder", key)
        .repartitionByRange(n_files, "_zorder")
        .sortWithinPartitions("_zorder")
        .drop("_zorder")
        .write.mode("overwrite")
        .parquet(path)
    )


def intersecting_row_groups(
    path: str, x_col: str, y_col: str, bbox: tuple[float, float, float, float]
) -> tuple[int, int]:
    """(row groups whose (x, y) min/max stats intersect ``bbox``, total
    row groups) across a parquet directory — the direct measure of how
    much a bbox scan must read under a given layout (what Spark's
    parquet reader skips via the same statistics)."""
    import glob
    import os

    import pyarrow.parquet as pq

    xmin, ymin, xmax, ymax = bbox
    hit = total = 0
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for g in range(md.num_row_groups):
            total += 1
            sx = md.row_group(g).column(names[x_col]).statistics
            sy = md.row_group(g).column(names[y_col]).statistics
            if sx is None or sy is None:
                hit += 1  # no stats ⇒ the reader cannot skip it either
                continue
            if (
                sx.min <= xmax
                and sx.max >= xmin
                and sy.min <= ymax
                and sy.max >= ymin
            ):
                hit += 1
    return hit, total


def compact_parquet(
    spark,
    src: str,
    dst: str,
    target_file_mb: int = 512,
    sort_cols: tuple[str, ...] = (),
) -> int:
    """Small-file compaction — the standard lake maintenance pass
    (streaming sinks and fine-grained partition overwrites accumulate
    KB-scale files whose per-file open/footer cost eventually dominates
    scans). Rewrites ``src`` into ``dst`` as ⌈bytes/target⌉ files,
    optionally re-sorted so row-group stats stay tight (pass the
    Z-order key columns to preserve clustering through compaction).
    Sizing reads actual file bytes from the filesystem — no sampling,
    no collect of data rows. Returns the output file count."""
    jvm_fs = spark._jvm.org.apache.hadoop.fs  # noqa: SLF001
    hconf = spark._jsc.hadoopConfiguration()  # noqa: SLF001
    p = jvm_fs.Path(src)
    fs = p.getFileSystem(hconf)
    total = 0
    it = fs.listFiles(p, True)
    while it.hasNext():
        f = it.next()
        if f.getPath().getName().endswith(".parquet"):
            total += f.getLen()
    n_files = max(1, -(-total // (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(src)
    if sort_cols:
        out = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(dst)
    return int(n_files)
