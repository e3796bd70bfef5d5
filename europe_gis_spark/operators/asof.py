"""As-of join — the temporal operator Spark lacks natively.

For every left row, attach the LATEST right row whose timestamp is ≤
the left timestamp (per key): the standard training-data alignment of
events against slowly-changing snapshots (rates, configs, model
versions). DuckDB has it built in (``ASOF JOIN``), which is exactly
what the oracle uses.

Plan shape: the classic scalable form — tag both sides, UNION, one
shuffle+sort on (keys, ts) and a running ``last(ignorenulls)`` window
fills each event with the most recent snapshot values. No range
explosion, no per-key collect; cost is one sort-based exchange over
left+right (right is usually tiny).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    value_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: left rows gain ``value_cols`` from the LATEST
    right row with ``right.ts_col <= left.ts_col`` (``backward``, the
    default — DuckDB ASOF JOIN semantics) or the EARLIEST right row
    with ``right.ts_col >= left.ts_col`` (``forward`` — the
    next-event/funnel direction). NULLs when no matching right row
    exists. Both inputs must carry ``on`` + ``ts_col``; at equal
    timestamps the right row matches in both directions. Same
    single-sort plan either way."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lcols = [c for c in left.columns if c not in value_cols]
    l_tag = left.select(
        *lcols,
        *[F.lit(None).cast(right.schema[v].dataType).alias(v) for v in value_cols],
        F.lit(0).alias("_is_right"),
    )
    r_tag = right.select(
        *[
            F.col(c)
            if c in right.columns
            else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        *value_cols,
        F.lit(1).alias("_is_right"),
    )
    u = l_tag.unionByName(r_tag)
    guarded = F.when(
        F.col("_is_right") == 1, F.struct(*[F.col(v) for v in value_cols])
    )
    # fill ONE struct of all value_cols guarded by _is_right: the
    # matched right ROW is carried atomically, so (a) a right row whose
    # value is legitimately NULL still wins over a farther non-NULL
    # snapshot (DuckDB ASOF JOIN returns that row's NULL), and (b)
    # multiple value_cols can never tear across different right rows
    if direction == "backward":
        # right rows sort BEFORE left rows at equal ts so <= matches
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col(ts_col).asc(), F.col("_is_right").desc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        snap = F.last(guarded, ignorenulls=True).over(w)
    else:
        # right rows sort AFTER left rows at equal ts; the forward frame
        # starts at the current row so an equal-ts right row matches
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col(ts_col).asc(), F.col("_is_right").asc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        snap = F.first(guarded, ignorenulls=True).over(w)
    filled = u.select(
        *lcols,
        "_is_right",
        *[snap.getField(v).alias(v) for v in value_cols],
    )
    return filled.filter(F.col("_is_right") == 0).drop("_is_right")


def range_join(
    left: DataFrame,
    right: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket: float,
) -> DataFrame:
    """Point-in-interval range join (``left.point ∈ [right.lo,
    right.hi)``) without a nested-loop: each interval is exploded to
    the coarse buckets it covers, points carry their single bucket, the
    join is a plain EQUI-join on bucket + exact refine. Each matching
    (point, interval) pair meets in exactly one bucket — the point's —
    so no distinct pass is needed. Work scales with
    Σ interval_width/bucket instead of |left|·|right|; pick ``bucket``
    near the median interval width (same coarse-cover-then-refine
    shape as the spatial cell join)."""
    lb = left.withColumn(
        "_bk", F.floor(F.col(point_col) / bucket).cast("long")
    )
    rb = right.withColumn(
        "_bk",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket).cast("long"),
                F.floor(F.col(hi_col) / bucket).cast("long"),
            )
        ),
    )
    return (
        lb.join(rb, "_bk")
        .filter((F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col)))
        .drop("_bk")
    )


def gap_fill_locf(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    unit: str = "day",
    order_col: str = "event_id",
) -> DataFrame:
    """Time-series gap fill with last-observation-carried-forward — the
    densification step a training pipeline runs before windowed feature
    extraction (regular grid in, no missing buckets out).

    Per key: one row per ``unit`` bucket from the key's first to its
    last event; ``n_events``/``sum_value`` aggregate the bucket's own
    events; ``filled_value`` is the latest in-bucket value (max_by on
    (ts, event ordinal) — deterministic under ties) carried forward
    across empty buckets by a running ``last(ignorenulls)`` window.

    Scale shape: per-key bounds are one agg; the dense grid is a
    map-side ``sequence``/``explode`` off that (grid size is
    output-bound by construction — the operator EXISTS to emit it); one
    (key, bucket) exchange joins grid to bucket aggregates, and the
    LOCF window rides the same key partitioning with a bucket sort.
    No per-key collect, no range self-join.
    """
    k, ts = F.col(key_col), F.col(ts_col)
    bucket = F.date_trunc(unit, ts)
    per_bucket = events.groupBy(k.alias(key_col), bucket.alias("bucket")).agg(
        F.count("*").alias("n_events"),
        F.sum(value_col).alias("sum_value"),
        F.max_by(
            value_col, F.struct(ts.alias("t"), F.col(order_col).alias("i"))
        ).alias("_last_in_bucket"),
    )
    # per-key bounds derive from the bucket aggregate (min/max of the
    # bucket set ≡ bucket of min/max ts — date_trunc is monotone), so
    # the raw events table is scanned and shuffled ONCE (r6 — the old
    # separate bounds agg cost a second full scan + shuffle). The
    # aggregate is pinned with an eager localCheckpoint because column
    # pruning specializes the two consumers' subtrees and defeats
    # ReusedExchange (verified: 0 reuse, 4 scans without it); the table
    # is output-bound by construction (≤ one row per grid bucket).
    per_bucket = per_bucket.localCheckpoint(eager=True)
    bounds = per_bucket.groupBy(key_col).agg(
        F.min("bucket").alias("_b0"), F.max("bucket").alias("_b1")
    )
    grid = bounds.select(
        key_col,
        F.explode(
            F.sequence("_b0", "_b1", F.expr(f"INTERVAL 1 {unit}"))
        ).alias("bucket"),
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(per_bucket, [key_col, "bucket"], "left")
        .select(
            key_col,
            "bucket",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce(F.round("sum_value", 6), F.lit(0.0)).alias("sum_value"),
            F.round(
                F.last("_last_in_bucket", ignorenulls=True).over(w), 6
            ).alias("filled_value"),
        )
    )


def merge_intervals(
    spans: DataFrame,
    key_col: str,
    lo_col: str,
    hi_col: str,
) -> DataFrame:
    """Coalesce overlapping-or-touching half-open intervals per key
    (gaps-and-islands) — the span-algebra step behind PII-redaction
    merging, near-dup range coalescing and chunk-overlap resolution.

    A new island starts where ``lo`` exceeds the running max ``hi`` of
    all earlier intervals (touching, ``lo == prev_hi``, merges — the
    half-open ranges are adjacent). Output one row per island:
    (key, span_lo, span_hi, n_merged).

    Scale shape: ONE shuffle+sort on (key, lo, hi); both window phases
    (running-max-of-previous, then running island-id sum) ride that
    single sort — no self-join, no per-key collect, cost linear in
    span count.
    """
    w = Window.partitionBy(key_col).orderBy(lo_col, hi_col)
    prev_max = F.max(hi_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = spans.select(
        key_col,
        lo_col,
        hi_col,
        F.when(
            prev_max.isNull() | (F.col(lo_col) > prev_max), F.lit(1)
        ).otherwise(F.lit(0)).alias("_new"),
    )
    with_island = flagged.select(
        key_col,
        lo_col,
        hi_col,
        F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("_isl"),
    )
    return with_island.groupBy(key_col, "_isl").agg(
        F.min(lo_col).alias("span_lo"),
        F.max(hi_col).alias("span_hi"),
        F.count("*").alias("n_merged"),
    ).drop("_isl")


def scd2_history(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    attr_col: str,
    order_col: str | None = None,
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from an event log:
    consecutive equal ``attr_col`` values per key collapse into one
    validity interval [valid_from, valid_to); the latest interval is
    open (``valid_to`` NULL, ``is_current`` true). The standard
    snapshot-lineage build for training-metadata dimensions.

    ``order_col`` breaks same-timestamp ties deterministically (e.g.
    an event id). Comparison is null-safe: NULL attr is a value, a
    NULL->x transition opens a new interval.

    Scale shape: one shuffle+sort on (key, ts, order); change
    detection (lag) and interval close (lead over the filtered change
    rows) are two window phases on the SAME key partitioning — the
    second sorts a strictly smaller row set. No self-join.
    """
    extra = [order_col] if order_col else []
    w = Window.partitionBy(key_col).orderBy(ts_col, *extra)
    changed = events.select(
        key_col,
        attr_col,
        F.col(ts_col).alias("valid_from"),
        *extra,
        (~F.col(attr_col).eqNullSafe(F.lag(attr_col).over(w))
         | F.lag(attr_col).over(w).isNull()
         & (F.row_number().over(w) == 1)).alias("_chg"),
    ).filter(F.col("_chg")).drop("_chg")
    # the tie-break column rides into the close window too: two changes
    # at the SAME timestamp must close each other in a deterministic
    # (engine-portable) order
    w2 = Window.partitionBy(key_col).orderBy("valid_from", *extra)
    return changed.select(
        key_col,
        attr_col,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())
