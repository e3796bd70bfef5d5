"""End-to-end entry-point pipelines (SURVEY.md §3): ETL with per-layer
lineage + resume, feature dataset build, resumable inference."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from europe_gis_spark import pipelines
from europe_gis_spark.datagen import geodata


@pytest.fixture(scope="module")
def fixture_inputs(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("pipe")
    tiles = spark.createDataFrame(geodata.raster_tiles())
    grid_pdf, a1, a2 = geodata.pop_grid()
    p1, p2 = str(d / "a1.csv"), str(d / "a2.csv")
    a1.to_csv(p1, index=False)
    a2.to_csv(p2, index=False)
    grid = spark.createDataFrame(grid_pdf[["grd_id", "x0", "y0"]])
    ap = geodata.admin_polygons()
    polys = spark.createDataFrame(ap[(ap.levl_code == 1) & (ap.cntr_code == "AA")])
    return tiles, polys, [p1, p2], grid, str(d)


def test_etl_pipeline_runs_and_resumes(spark, fixture_inputs):
    tiles, polys, csvs, grid, d = fixture_inputs
    out, ck = f"{d}/out", f"{d}/ck"
    n = pipelines.process_raster_layers(spark, tiles, polys, csvs, grid, out, ck)
    assert n == 4  # 3 layers + 1 population unit
    layers_out = spark.read.parquet(f"{out}/layers")
    assert set(r.layer for r in layers_out.select("layer").distinct().collect()) == {
        "dem", "pop", "ww",
    }
    # normalize range per layer is [0, 255]
    agg = layers_out.filter("value > -1000").agg(
        F.min("norm"), F.max("norm")
    ).collect()[0]
    assert agg[0] == 0 and agg[1] == 255
    pop = spark.read.parquet(f"{out}/population")
    zones = {r.zone_id: r.pop_sum for r in pop.collect()}
    assert set(zones) == {"AA1", "AA2"} and all(v > 0 for v in zones.values())
    # resume: nothing pending
    assert pipelines.process_raster_layers(spark, tiles, polys, csvs, grid, out, ck) == 0


def test_feature_dataset_build(spark, fixture_inputs):
    tiles, _, _, _, d = fixture_inputs
    train, test = pipelines.build_training_dataset(spark, tiles, f"{d}/feat")
    n_tr, n_te = train.count(), test.count()
    assert n_tr > 0 and n_te > 0
    # split fractions roughly honored and all rows valid
    assert 0.1 < n_te / (n_tr + n_te) < 0.3
    assert train.filter(~F.col("valid")).count() == 0
    # labels come from the pop layer, never the bad fill
    assert train.filter(F.col("label") <= -1000).count() == 0
    assert set(r.layer for r in train.select("layer").distinct().collect()) == {
        "dem", "ww",
    }


def test_inference_pipeline_resumable(spark, fixture_inputs):
    tiles, _, _, _, d = fixture_inputs
    train, _ = pipelines.build_training_dataset(spark, tiles, f"{d}/feat2")
    out, ck = f"{d}/pred", f"{d}/pck"
    model = lambda m: m.mean(axis=1)
    n = pipelines.run_inference(spark, train, model, out, ck, units=4)
    assert n == 4
    scored = spark.read.parquet(out)
    assert scored.count() == train.count()
    assert "pred" in scored.columns
    # rerun = no-op
    assert pipelines.run_inference(spark, train, model, out, ck, units=4) == 0
