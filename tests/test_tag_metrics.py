"""Fused geo-tag + per-page metrics pass: simhash consistency with the
standalone dedup operator, token counts vs oracle."""

import numpy as np
import pandas as pd

from europe_gis_spark.datagen import geodata, pages as pgen
from europe_gis_spark.operators import dedup, geo_join


def test_tag_pages_metrics_consistent(spark):
    pages_pdf = pgen.pages_pandas(np.arange(300), seed=42)
    pages_df = spark.createDataFrame(pages_pdf)
    polys_df = spark.createDataFrame(
        geodata.admin_polygons().query("levl_code == 3")
    )
    idx_bc = geo_join.build_polygon_index_bc(spark, polys_df)
    tagged = geo_join.tag_pages(
        pages_df, idx_bc, host_hints=pgen.host_city_hints(), with_metrics=True
    ).collect()
    got_sim = {r.url: r.simhash for r in tagged}
    got_tok = {r.url: r.n_tokens for r in tagged}

    # simhash must equal the standalone dedup.simhash on the same text
    docs = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": range(len(pages_pdf)), "text": pages_pdf.text}
        )
    )
    want = {
        pages_pdf.url.iloc[r.doc_id]: r.simhash
        for r in dedup.simhash(docs).collect()
    }
    assert got_sim == want

    for u, t in zip(pages_pdf.url, pages_pdf.text):
        assert got_tok[u] == len(t.split())

    # poly assignments identical with and without metrics
    plain = {
        r.url: r.poly_id
        for r in geo_join.tag_pages(
            pages_df, idx_bc, host_hints=pgen.host_city_hints()
        ).collect()
    }
    assert plain == {r.url: r.poly_id for r in tagged}
