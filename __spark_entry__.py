"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship spatial-join query (pages → coordinate
extraction → cell-bucketed PIP join → per-region counts) on a
deterministically generated pages table joined against the NUTS-like
fixture polygons. ``queries()``/``oracle_sql()`` expose every implemented
operator from SURVEY.md §2 with DuckDB oracles where SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: pages per NUTS level-3 region (SURVEY.md §7.2).

    Uses a deterministic in-process pages table (seeded datagen — no
    external data) plus the sf0.001 relational layer for a smoke of the
    scan path; returns the per-region page counts.
    """
    import pandas as pd

    from europe_gis_spark.datagen import geodata, pages as pgen
    from europe_gis_spark.operators import geo_join

    # smoke the driver testdata scan path too
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").limit(1).collect()

    pages_pdf = pgen.pages_pandas(__import__("numpy").arange(2000), seed=42)
    pages_df = spark.createDataFrame(pages_pdf)
    polys_df = spark.createDataFrame(geodata.admin_polygons())
    return geo_join.pages_per_region(
        spark, pages_df, polys_df, host_hints=pgen.host_city_hints(), level=3
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family from SURVEY.md §2."""
    from europe_gis_spark.queries import QUERIES

    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    from europe_gis_spark.queries import QUERIES

    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
