"""Per-partition lineage + idempotent resume (the Mongo tile log,
Spark-style).

The reference checkpoints each processed raster tile as a Mongo document
``{row, column, bounds{…}, insertedUTC, files[…]}``
(``/root/reference/scripts/jobs/mongodb_scripts.py:26-48``) and restarts
by wiping a work dir (``src/data_engineering/raster_processor.py:37-39``).
The engine replaces that with a parquet/Iceberg checkpoint table keyed by
deterministic unit ids:

  * work is split into deterministic units (e.g. cell-prefix buckets);
  * each completed unit appends one lineage row
    (run_id, unit_id, bounds, row_count, files, inserted_utc);
  * resume = left_anti join of the unit list against completed units —
    already-done work is never recomputed (idempotence comes from
    deterministic unit ids + overwrite-by-unit output partitioning).

On Iceberg the append becomes ``MERGE INTO``; parquet append + anti-join
gives the same at-least-once-safe semantics because re-processing a unit
overwrites the same output partition (dynamic partition overwrite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CHECKPOINT_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("unit_id", T.LongType(), False),
        T.StructField(
            "bounds",
            T.StructType(
                [
                    T.StructField("xmin", T.DoubleType(), True),
                    T.StructField("ymin", T.DoubleType(), True),
                    T.StructField("xmax", T.DoubleType(), True),
                    T.StructField("ymax", T.DoubleType(), True),
                ]
            ),
            True,
        ),
        T.StructField("row_count", T.LongType(), False),
        T.StructField(
            "files",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("raster", T.StringType(), True),
                        T.StructField("filenamepath", T.StringType(), True),
                        T.StructField("slice_id", T.StringType(), True),
                    ]
                )
            ),
            True,
        ),
        T.StructField("inserted_utc", T.TimestampType(), False),
    ]
)


def completed_units(spark: SparkSession, ckpt_path: str, run_id: str) -> DataFrame:
    """Unit ids already checkpointed for this run (empty if no table)."""
    try:
        df = spark.read.parquet(ckpt_path)
    except Exception:
        return spark.createDataFrame([], "unit_id long")
    return df.filter(F.col("run_id") == run_id).select("unit_id").distinct()


def pending_units(
    spark: SparkSession, all_units: DataFrame, ckpt_path: str, run_id: str
) -> DataFrame:
    """Resume anti-join: units not yet completed (SURVEY.md §4 item 5)."""
    done = completed_units(spark, ckpt_path, run_id)
    return all_units.join(done, "unit_id", "left_anti")


def lineage_rows(result: DataFrame, unit_col: str = "unit_id") -> DataFrame:
    """G11: per-unit row counts + bounds from a result DataFrame —
    the metrics half of the tile document (mongodb_scripts.py:29-46)."""
    has_xy = "x" in result.columns and "y" in result.columns
    aggs = [F.count("*").alias("row_count")]
    if has_xy:
        aggs += [
            F.struct(
                F.min("x").alias("xmin"),
                F.min("y").alias("ymin"),
                F.max("x").alias("xmax"),
                F.max("y").alias("ymax"),
            ).alias("bounds")
        ]
    return result.groupBy(unit_col).agg(*aggs)


def write_checkpoint(
    spark: SparkSession,
    metrics: DataFrame,
    ckpt_path: str,
    run_id: str,
    files: list[tuple[str, str, str]] | None = None,
) -> None:
    """Append lineage rows (one per completed unit)."""
    cols = [
        F.lit(run_id).alias("run_id"),
        F.col("unit_id").cast("long").alias("unit_id"),
    ]
    if "bounds" in metrics.columns:
        cols.append(F.col("bounds"))
    else:
        cols.append(
            F.struct(
                F.lit(None).cast("double").alias("xmin"),
                F.lit(None).cast("double").alias("ymin"),
                F.lit(None).cast("double").alias("xmax"),
                F.lit(None).cast("double").alias("ymax"),
            ).alias("bounds")
        )
    cols.append(F.col("row_count").cast("long"))
    file_structs = [
        F.struct(
            F.lit(a).alias("raster"),
            F.lit(b).alias("filenamepath"),
            F.lit(c).alias("slice_id"),
        )
        for a, b, c in (files or [])
    ]
    cols.append(
        (F.array(*file_structs) if file_structs else F.array().cast(
            CHECKPOINT_SCHEMA["files"].dataType
        )).alias("files")
    )
    cols.append(F.current_timestamp().alias("inserted_utc"))
    metrics.select(*cols).write.mode("append").parquet(ckpt_path)


def reset_checkpoint(spark: SparkSession, ckpt_path: str) -> None:
    """S13 collection-drop equivalent."""
    import shutil

    shutil.rmtree(ckpt_path, ignore_errors=True)


def run_with_checkpoint(
    spark: SparkSession,
    units: DataFrame,
    process_fn,
    out_path: str,
    ckpt_path: str,
    run_id: str,
    unit_col: str = "unit_id",
) -> int:
    """Process only pending units; write output partitioned by unit;
    checkpoint afterwards. Returns number of units processed.

    Idempotent under retry/kill: output is partitioned by unit id with
    dynamic partition overwrite, so reprocessing a unit replaces its own
    partition exactly; the checkpoint row is written only after the data
    write succeeds (write-ahead of nothing, checkpoint-behind).
    """
    pend = pending_units(spark, units, ckpt_path, run_id)
    n_pending = pend.count()
    if n_pending == 0:
        return 0
    result = process_fn(pend)
    (
        result.write.mode("overwrite")
        .partitionBy(unit_col)
        .option("partitionOverwriteMode", "dynamic")
        .parquet(out_path)
    )
    done = spark.read.parquet(out_path).join(
        pend.select(unit_col), unit_col, "left_semi"
    )
    write_checkpoint(spark, lineage_rows(done, unit_col), ckpt_path, run_id)
    return n_pending
