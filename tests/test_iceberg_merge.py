"""Iceberg MERGE INTO integration — keeps the checkpoint-upsert seam
warm: the moment Iceberg jars appear on the classpath this test runs the
REAL merge end-to-end (create table → merge → retry-merge → assert
idempotent upsert); in jar-less environments it skips VISIBLY rather
than passing vacuously. The SQL-generation half is unit-tested in
test_resume_inference regardless."""

import pytest

from europe_gis_spark.checkpoint import lineage

UPDATES_SCHEMA = "run_id string, unit_id bigint, row_count bigint"


def test_iceberg_merge_into_executes(spark, tmp_path):
    if not lineage.iceberg_available(spark):
        pytest.skip(
            "Iceberg runtime not on classpath — MERGE INTO exercised via "
            "SQL generation only (test_resume_inference)"
        )
    # Spark resolves spark.sql.catalog.* lazily at first catalog access,
    # so a runtime-registered hadoop catalog works on the shared session
    spark.conf.set("spark.sql.catalog.egs_it", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.egs_it.type", "hadoop")
    spark.conf.set("spark.sql.catalog.egs_it.warehouse", str(tmp_path / "wh"))
    table = "egs_it.db.ckpt"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(
        f"CREATE TABLE {table} (run_id string, unit_id bigint, "
        "row_count bigint) USING iceberg"
    )
    try:
        spark.createDataFrame(
            [("r1", 1, 10), ("r1", 2, 20)], UPDATES_SCHEMA
        ).createOrReplaceTempView("ckpt_updates")
        spark.sql(lineage.checkpoint_merge_sql(table))
        # retry of unit 2 + new unit 3: MUST update in place, not duplicate
        spark.createDataFrame(
            [("r1", 2, 25), ("r1", 3, 30)], UPDATES_SCHEMA
        ).createOrReplaceTempView("ckpt_updates")
        spark.sql(lineage.checkpoint_merge_sql(table))
        rows = {r.unit_id: r.row_count for r in spark.table(table).collect()}
        assert rows == {1: 10, 2: 25, 3: 30}
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
