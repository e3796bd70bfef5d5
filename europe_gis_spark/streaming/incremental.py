"""Incremental file ingest — the reference's poll loop, Spark-native.

The reference simulates incrementality by polling ``path.exists``
(``/root/reference/scripts/jobs/dataset_creation.py:355-360``). The
engine replaces that with Structured Streaming over a directory source
using ``Trigger.AvailableNow``: each invocation processes exactly the
files not yet seen (checkpointed offsets), then stops — an idempotent
catch-up batch, which is the correct semantics for a crawl-dump ingest
(SURVEY.md §2.9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def incremental_ingest(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    checkpoint_dir: str,
    schema,
    transform=None,
) -> None:
    """Process new parquet files in src_dir into dst_dir exactly once.

    Blocks until the available data is drained (availableNow), then
    returns. Re-invoking later picks up only newly arrived files.
    """
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 64)
        .parquet(src_dir)
    )
    if transform is not None:
        stream = transform(stream)
    q = (
        stream.writeStream.format("parquet")
        .option("path", dst_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()


def dedup_stream(
    docs: DataFrame,
    key_cols: tuple[str, ...] = ("fp",),
    ts_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: the first occurrence of each key passes,
    later ones are dropped — ACROSS micro-batches and restarts, because
    seen keys live in the checkpointed state store. With ``ts_col`` the
    state is bounded by the watermark (keys older than it are evicted —
    the production form for unbounded streams); without it state grows
    with distinct keys (fine for bounded backfills).

    The streaming twin of dedup.exact_dup_groups: on a crawl ingest this
    is 'keep the first copy of each page fingerprint ever seen'.
    """
    if ts_col is not None:
        # KEY-only dedup with watermark-bounded state: a re-crawl of the
        # same fingerprint at a different timestamp is still a duplicate
        # (dropDuplicates([key, ts]) would leak it)
        return docs.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            list(key_cols)
        )
    return docs.dropDuplicates(list(key_cols))


SESSION_OUT_SCHEMA = (
    "user_id long, session_start long, session_end long, n_events int, sum_value double"
)
SESSION_STATE_SCHEMA = "start long, last long, n int, s double"


def fold_session_events(ts, vals, state, gap_sec: int):
    """Fold a sorted event batch into gap-session state (pure, testable).

    ``state`` is (start, last, n, sum) or None; returns
    (closed_sessions, new_state). Late data guard: an event at or
    before the open session's ``last`` merges into it WITHOUT moving
    ``session_end`` backwards (last = max(last, t), start = min(start,
    t)) — the previous behaviour reset last=t, which could shrink the
    session and merge events across an already-elapsed gap. Events
    later than ``last + gap`` close the session. Equivalence with the
    batch sessionizer holds when cross-batch disorder is bounded by
    ``gap_sec`` (the watermark analogue); events later than that have
    no correct streaming answer without retracting emitted sessions.
    """
    if state is None:
        start, last, n, s = None, None, 0, 0.0
    else:
        start, last, n, s = state
    closed = []
    for t, v in zip(ts, vals):
        if start is None:
            start, last, n, s = t, t, 1, v
        elif t - last > gap_sec:
            closed.append((start, last, n, s))
            start, last, n, s = t, t, 1, v
        else:
            start = min(start, t)
            last = max(last, t)
            n, s = n + 1, s + v
    return closed, (start, last, n, s)


def stateful_sessionize(events: DataFrame, gap_sec: int = 3600) -> DataFrame:
    """Custom stateful streaming operator (SURVEY.md §2.9 / the
    'applyInPandasWithState for custom stateful operators' slot):
    per-user gap-based sessionization whose OPEN session survives in the
    state store across micro-batches AND across availableNow restarts
    (checkpointed) — the streaming twin of the batch ``sessionize``
    window query.

    Emits one row per CLOSED session (append semantics): a session
    closes when a later event for the same user arrives more than
    ``gap_sec`` after its last event. Input columns: (user_id long,
    ts timestamp, value double). Timestamps are carried as epoch
    seconds in both output and state to keep the state row fixed-width.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        rows = pd.concat(list(pdfs))
        rows = rows.sort_values("ts")
        ts = (rows["ts"].astype("int64") // 1_000_000_000).to_numpy()
        vals = rows["value"].to_numpy(dtype=float)
        prev = state.get if state.exists else None
        closed_raw, new_state = fold_session_events(
            ts.tolist(), vals.tolist(), prev, gap_sec
        )
        state.update(new_state)
        closed = [(key[0], *c) for c in closed_raw]
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[
                    "user_id", "session_start", "session_end", "n_events", "sum_value",
                ],
            )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def enrich_stream(stream: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream–static enrichment join: every micro-batch broadcast-joins
    the (small) static dimension — the standard crawl-ingest shape of
    attaching host/geo metadata to a page stream. Pure plan composition;
    Spark re-plans the broadcast per batch, so a refreshed ``dim``
    DataFrame picks up new dimension rows on the next trigger."""
    from pyspark.sql import functions as F

    return stream.join(F.broadcast(dim), on, "left")


def join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream inner join — the impression⋈click /
    crawl-request⋈fetch-result shape: match right rows to left rows on
    ``key`` arriving within ``within`` AFTER the left event.

    Both sides carry a watermark and the join condition bounds the
    right timestamp to ``[left_ts, left_ts + within]``, so Spark can
    size state exactly (a side's row is dropped once the other side's
    watermark passes its joinable window — state is O(rate·window), not
    O(stream)). Without the time bound a stream-stream join must keep
    EVERY row forever; this is the only state-safe form at crawl scale.

    Works identically on batch DataFrames (watermarks become no-ops),
    which is what the batch-equivalence test and any backfill use.
    """
    from pyspark.sql import functions as F

    l, r = left, right  # noqa: E741
    if l.isStreaming:
        l = l.withWatermark(left_ts, watermark)
    if r.isStreaming:
        r = r.withWatermark(right_ts, watermark)
    lcols = [F.col(f"l.{c}").alias(c) for c in left.columns]
    rcols = [
        F.col(f"r.{c}").alias(c if c not in left.columns else f"r_{c}")
        for c in right.columns
        if c != key
    ]
    return (
        l.alias("l")
        .join(
            r.alias("r"),
            (F.col(f"l.{key}") == F.col(f"r.{key}"))
            & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
            & (
                F.col(f"r.{right_ts}")
                <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {within}")
            ),
        )
        .select(*lcols, *rcols)
    )


def upsert_sink(
    stream: DataFrame,
    path: str,
    checkpoint_dir: str,
    key_cols: tuple[str, ...],
) -> None:
    """Idempotent keyed parquet sink via ``foreachBatch``: each
    micro-batch is deduped on ``key_cols``, anti-joined against the keys
    already at rest, and APPENDED — so replayed batches (streaming is
    at-least-once on retry) and re-crawled keys land exactly once. This
    is the parquet stand-in for the Iceberg ``MERGE INTO`` seam
    (checkpoint.lineage.checkpoint_merge_sql); on a lakehouse the
    foreachBatch body becomes that MERGE. Blocks until drained
    (availableNow)."""

    def write_batch(batch: DataFrame, _batch_id: int) -> None:
        from pyspark.errors import AnalysisException

        spark = batch.sparkSession
        fresh = batch.dropDuplicates(list(key_cols))
        # only a genuinely-absent or genuinely-empty sink may skip the
        # anti-join. Absent: filesystem existence check. Empty-shell (a
        # killed first write left the directory but no committed part
        # files): schema inference raises AnalysisException at READ
        # time — nothing is at rest, so proceeding is correct and the
        # retry loop must not wedge. Any error at WRITE time (corrupt
        # footer surfacing in the anti-join, IO failure) still aborts
        # the batch rather than appending duplicates.
        jvm_fs = spark._jvm.org.apache.hadoop.fs  # noqa: SLF001
        hconf = spark._jsc.hadoopConfiguration()  # noqa: SLF001
        p = jvm_fs.Path(path)
        if p.getFileSystem(hconf).exists(p):
            try:
                # schema inference is eager here: an empty shell fails NOW
                at_rest = spark.read.parquet(path)
            except AnalysisException:
                at_rest = None  # directory shell with no committed data
            if at_rest is not None:
                # OUTSIDE the except-guard: a misnamed key column must
                # abort loudly, not silently disable the dedup anti-join
                existing = at_rest.select(*key_cols).distinct()
                fresh = fresh.join(existing, list(key_cols), "left_anti")
        fresh.write.mode("append").parquet(path)

    q = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def windowed_event_counts(
    events: DataFrame,
    window_dur: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked event-time windowed aggregation — works identically
    on a stream (late data dropped past the watermark) and on a batch
    DataFrame (degenerates to a plain group-by; oracle-checkable)."""
    from pyspark.sql import functions as F

    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return src.groupBy(
        F.window(ts_col, window_dur).alias("win"), F.col("event_type")
    ).agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))


def delta_counts_sink(
    stream: DataFrame,
    path: str,
    checkpoint_dir: str,
    key_cols: tuple[str, ...],
) -> None:
    """Exactly-once ADDITIVE aggregation sink — the streaming rollup
    counterpart of :func:`upsert_sink` (which dedups KEYS; this one
    accumulates COUNTS, where key-dedup would be wrong).

    Each micro-batch writes its per-key count DELTA into a partition
    named by the batch_id, with dynamic partition overwrite — so an
    at-least-once REPLAY of a batch overwrites its own partition
    instead of appending a second copy: idempotence without a ledger
    or a read-modify-write of the whole table (the classic
    crash-between-data-and-ledger double-count has nothing to
    double). The at-rest layout is a delta log; :func:`read_delta_
    counts` folds it with one sum, and periodic compaction (the
    lineage-maintenance shape) can fold old batches into one
    partition whenever the partition count grows. Blocks until
    drained (availableNow)."""

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        delta = (
            batch.groupBy(*key_cols)
            .count()
            .withColumnRenamed("count", "n")
            .withColumn("batch_id", F.lit(int(batch_id)))
        )
        (
            delta.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(path)
        )

    (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def read_delta_counts(
    spark: SparkSession, path: str, key_cols: tuple[str, ...]
) -> DataFrame:
    """Fold the delta log written by :func:`delta_counts_sink` into
    current totals: one sum over the batch partitions."""
    return (
        spark.read.parquet(path)
        .groupBy(*key_cols)
        .agg(F.sum("n").alias("n"))
    )


def compact_delta_counts(
    spark: SparkSession,
    path: str,
    key_cols: tuple[str, ...],
    keep_after_batch: int | None = None,
) -> None:
    """Fold the delta log into one partition: batches ≤
    ``keep_after_batch`` (default: all) collapse into a single summed
    delta written under batch_id = -1 (reserved: real trigger batch
    ids are non-negative, so later replays can never collide with the
    compacted partition). Totals are invariant — read_delta_counts
    before ≡ after.

    Crash protocol (r6 — the previous in-place write left fold PLUS
    surviving originals after a crash between the fold write and the
    partition deletes, double-counting on read, and a re-run re-folded
    the double state): the fold is staged in a dot-prefixed directory
    (invisible to parquet readers) together with a manifest of the
    batches it covers, and only after the ``_done`` marker lands are
    originals deleted and the fold renamed into place. Every crash
    point is convergent — the next compact_delta_counts (or an explicit
    call with no new batches) resumes from the staging manifest instead
    of recomputing: before ``_done`` the staging is discarded (old log
    intact); after it, the remaining deletes + atomic rename are
    replayed. The one non-atomic window (crash mid-deletes, before the
    rename) can under-count transient reads until recovery runs;
    unlike the old protocol it can never double-count, and recovery
    restores exact totals."""
    import json
    import os
    import shutil

    staging = os.path.join(path, ".compact_staging")
    done_marker = os.path.join(staging, "_done")
    manifest_f = os.path.join(staging, "_manifest.json")

    def _finish_from_staging() -> None:
        with open(manifest_f) as f:
            doomed = json.load(f)["doomed"]
        for b in doomed:
            shutil.rmtree(f"{path}/batch_id={b}", ignore_errors=True)
        src = os.path.join(staging, "batch_id=-1")
        dst = os.path.join(path, "batch_id=-1")
        if os.path.exists(src):
            shutil.rmtree(dst, ignore_errors=True)
            os.rename(src, dst)
        shutil.rmtree(staging, ignore_errors=True)

    if os.path.exists(done_marker):
        # resume an interrupted compaction before touching new state
        _finish_from_staging()
    elif os.path.exists(staging):
        # fold never completed — old log is intact, discard the stage
        shutil.rmtree(staging, ignore_errors=True)

    at_rest = spark.read.parquet(path)
    cond = (
        F.col("batch_id") <= keep_after_batch
        if keep_after_batch is not None
        else F.lit(True)
    )
    old = at_rest.filter(cond)
    folded = (
        old.groupBy(*key_cols)
        .agg(F.sum("n").alias("n"))
        .withColumn("batch_id", F.lit(-1))
    )
    doomed = [
        r.batch_id
        for r in old.select("batch_id").distinct().collect()
    ]
    (
        folded.write.mode("overwrite")
        .partitionBy("batch_id")
        .parquet(staging)
    )
    with open(manifest_f, "w") as f:
        json.dump({"doomed": [b for b in doomed if b != -1]}, f)
    with open(done_marker, "w") as f:
        f.write("1")
    _finish_from_staging()
