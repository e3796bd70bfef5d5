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

from pyspark.sql import DataFrame, SparkSession


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
