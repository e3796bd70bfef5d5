"""Trajectory analysis over per-entity point streams.

Stay-point detection (the relational variant of Li et al. 2008,
"Mining user similarity based on location history"): a stay is a
maximal run of consecutive points (per entity, time-ordered) in which
every step moves at most ``radius`` — runs lasting at least
``min_duration`` are the places the entity dwelt.  The sequential
reference algorithm anchors on the first point of a candidate stay;
the chained-step variant here is the standard gaps-and-islands
relaxation that needs NO iteration: one window pass marks the
over-radius steps, a running sum turns them into island ids, and one
aggregation per (entity, island) finishes the job.

Engine-portable exactness: the step test compares SQUARED distance to
radius² — with the integer-plus-half synthetic coordinates both sides
are exact doubles, so no sqrt and no float-rounding boundary exists;
island centroids divide an exactly-representable coordinate sum by the
count (one correctly-rounded IEEE division, identical across engines).

Scale shape: ONE shuffle.  The window exchange hash-partitions on the
entity key; the island aggregation's key (entity, island) extends it,
and Spark's ClusteredDistribution accepts a partitioning on a key
subset — so the agg rides the window's exchange (plan-asserted).
Per-entity history length bounds the window buffer, not corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def trip_stats(
    points: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Per (entity, day) travel statistics: point/step counts, total
    and maximum step length, and net first-to-last displacement —
    the trajectory summary layer (daily ranges, commute vs roam).

    Step lengths are floor(sqrt(dx²+dy²)·1000) — integer millimeters.
    IEEE sqrt is correctly rounded on every engine and the squared
    terms are exact, so each step length is bit-identical across
    engines and the SUMS are associative integers (a float-meter sum
    would depend on partial-aggregation order). First/last positions
    come from min/max over (ts, tiebreak, x, y) structs — exact, no
    first_value frame subtleties. Same one-exchange shape as
    stay_points: the (key, day) agg key extends the window key."""
    w = Window.partitionBy(key_col, "day").orderBy(
        F.col(time_col), F.col(order_tiebreak)
    )
    dx = F.col("x") - F.lag("x").over(w)
    dy = F.col("y") - F.lag("y").over(w)
    step_mm = F.floor(F.sqrt(dx * dx + dy * dy) * 1000).cast("long")
    pos = F.struct(
        F.col(time_col), F.col(order_tiebreak), F.col("x"), F.col("y")
    )
    net = F.sqrt(
        (F.col("l.x") - F.col("f.x")) * (F.col("l.x") - F.col("f.x"))
        + (F.col("l.y") - F.col("f.y")) * (F.col("l.y") - F.col("f.y"))
    )
    return (
        points.select(
            key_col,
            F.to_date(time_col).alias("day"),
            F.col(time_col),
            F.col(order_tiebreak),
            "x",
            "y",
        )
        .withColumn("step_mm", step_mm)
        .groupBy(key_col, "day")
        .agg(
            F.count("*").alias("n_points"),
            F.count("step_mm").alias("n_steps"),
            F.coalesce(F.sum("step_mm"), F.lit(0)).alias("total_mm"),
            F.coalesce(F.max("step_mm"), F.lit(0)).alias("max_step_mm"),
            F.min(pos).alias("f"),
            F.max(pos).alias("l"),
        )
        .select(
            key_col,
            "day",
            "n_points",
            "n_steps",
            "total_mm",
            "max_step_mm",
            F.floor(net * 1000).cast("long").alias("net_mm"),
        )
    )


def transition_matrix(
    states: DataFrame,
    key_col: str,
    order_col: str,
    state_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """First-order transition counts over per-entity ordered state
    sequences: (from_state, to_state, n_transitions).  The generic
    Markov-chain builder — fed region sequences it is the
    origin–destination mobility matrix; fed page/event types it is the
    session flow graph.  One key-partitioned lag window + one
    (from, to) aggregation; NULL states propagate (a NULL never forms
    a transition).  Per-entity sequence length bounds the window
    buffer, not corpus size."""
    order = [F.col(order_col)]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(key_col).orderBy(*order)
    prev = F.lag(state_col).over(w)
    return (
        states.withColumn("_from", prev)
        .filter(F.col("_from").isNotNull() & F.col(state_col).isNotNull())
        .groupBy(
            F.col("_from").alias("from_state"),
            F.col(state_col).alias("to_state"),
        )
        .agg(F.count("*").alias("n_transitions"))
    )


def stay_points(
    points: DataFrame,
    radius: float,
    min_duration_s: int,
    key_col: str = "user_id",
    time_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """(key, island, n_points, start_ts, end_ts, cx, cy) for every
    chained-step stay of at least ``min_duration_s`` seconds."""
    w = Window.partitionBy(key_col).orderBy(
        F.col(time_col), F.col(order_tiebreak)
    )
    dx = F.col("x") - F.lag("x").over(w)
    dy = F.col("y") - F.lag("y").over(w)
    move = F.when(
        dx.isNull() | (dx * dx + dy * dy > F.lit(float(radius) ** 2)),
        F.lit(1),
    ).otherwise(F.lit(0))
    island = F.sum(move).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        points.withColumn("island", island)
        .groupBy(key_col, "island")
        .agg(
            F.count("*").alias("n_points"),
            F.min(time_col).alias("start_ts"),
            F.max(time_col).alias("end_ts"),
            F.round(F.sum("x") / F.count("*"), 6).alias("cx"),
            F.round(F.sum("y") / F.count("*"), 6).alias("cy"),
        )
        .filter(
            F.unix_micros(F.col("end_ts").cast("timestamp"))
            - F.unix_micros(F.col("start_ts").cast("timestamp"))
            >= F.lit(min_duration_s * 1_000_000)
        )
    )
