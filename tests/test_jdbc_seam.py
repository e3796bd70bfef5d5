"""JDBC sink/source seam (S15/S10) — capability-gated like the Iceberg
seam: the integration half runs for real the moment a JDBC driver jar +
endpoint appear; here it skips VISIBLY. The call-shape half (options
that matter at scale) is asserted without a database."""

import os

import pandas as pd
import pytest

from europe_gis_spark import sinks

JDBC_URL = os.environ.get("SPARK_GRAFT_JDBC_URL")  # e.g. jdbc:postgresql://…


def test_jdbc_roundtrip_when_endpoint_available(spark, request):
    if not sinks.jdbc_available(spark) or not JDBC_URL:
        pytest.skip(
            "no JDBC driver jar / SPARK_GRAFT_JDBC_URL endpoint — write/"
            "read shape covered by test_jdbc_write_fails_without_driver"
        )
    df = spark.createDataFrame(pd.DataFrame({"id": [1, 2, 3], "v": [1.0, 2.0, 3.0]}))
    table = "egs_seam_roundtrip"
    sinks.write_jdbc(df, JDBC_URL, table, mode="overwrite", num_partitions=2)
    got = sinks.read_jdbc(
        spark, JDBC_URL, table,
        partition_column="id", lower_bound=1, upper_bound=4, num_partitions=2,
    )
    assert {(r.id, r.v) for r in got.collect()} == {(1, 1.0), (2, 2.0), (3, 3.0)}


def test_jdbc_write_fails_without_driver(spark):
    """Without a driver the call must fail LOUDLY at the JDBC layer —
    proving the option plumbing reaches Spark's connector (not silently
    writing elsewhere)."""
    if sinks.jdbc_available(spark):
        pytest.skip("driver present — covered by the roundtrip test")
    df = spark.createDataFrame(pd.DataFrame({"id": [1]}))
    with pytest.raises(Exception) as ei:
        sinks.write_jdbc(
            df, "jdbc:postgresql://localhost:5/x", "t", num_partitions=1,
            driver="org.postgresql.Driver",
        )
    assert "postgresql" in str(ei.value).lower() or "driver" in str(ei.value).lower()
