"""External relational sinks/sources (SURVEY.md §2.1 S15/S10 seams).

The reference batch-inserts results into Postgres/PostGIS
(``/root/reference/scripts/jobs/dataset_creation.py`` COPY path and the
``scripts/old_files/sql`` DDL). Spark ships a JDBC connector natively,
so the engine needs no code beyond the correctly-shaped call — these
seams pin the options that matter at scale (batch size, partitioned
writes, predicate-pushdown reads) and are capability-gated exactly like
the Iceberg seam (no JDBC endpoint exists in this sandbox; the
integration test skips VISIBLY and runs for real the moment a reachable
URL is configured).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def jdbc_available(spark: SparkSession, driver: str = "org.postgresql.Driver") -> bool:
    """True iff the JDBC driver class is on the classpath (capability
    check mirroring lineage.iceberg_available)."""
    try:
        spark._jvm.java.lang.Class.forName(driver)  # type: ignore[union-attr]
        return True
    except Exception:
        return False


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = 10_000,
    num_partitions: int | None = None,
    **properties: str,
) -> None:
    """S15: batch insert into a relational table — each partition opens
    one connection and inserts in ``batch_size`` statements (the JDBC
    twin of the reference's COPY loop). ``num_partitions`` caps writer
    concurrency so a 1000-executor job doesn't open 1000 connections
    against one database."""
    w = df
    if num_partitions is not None:
        w = df.coalesce(num_partitions)
    (
        w.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .options(**properties)
        .mode(mode)
        .save()
    )


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    **properties: str,
) -> DataFrame:
    """S10: parallel relational scan. With ``partition_column`` bounds,
    Spark issues ``num_partitions`` range-sliced queries so the read is
    distributed instead of a single-connection bottleneck; filters and
    projections still push down to the database (JDBC source supports
    both)."""
    r = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .options(**properties)
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "partition_column requires explicit lower_bound and "
                "upper_bound (Spark's JDBC source cannot infer them)"
            )
        r = (
            r.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return r.load()
