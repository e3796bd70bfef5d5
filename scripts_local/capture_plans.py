"""Regenerate docs/PLANS.md: live .explain captures of the plans whose
shapes the tests in tests/test_plans.py assert (flagship single-shuffle
join, MinHash exchange reuse, bucketed co-located join, pushdown scan).

Usage: python scripts_local/capture_plans.py
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def plan(df, mode="simple") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue().strip()


def main() -> None:
    from europe_gis_spark.session import get_spark

    spark = get_spark(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    sections: list[tuple[str, str]] = []

    from europe_gis_spark.datagen import geodata, pages as pgen
    from europe_gis_spark.operators import dedup, geo_join

    pages_df = spark.createDataFrame(pgen.pages_pandas(np.arange(500)))
    polys_df = spark.createDataFrame(geodata.admin_polygons())
    idx_bc = geo_join.build_polygon_index_bc(spark, polys_df.filter("levl_code = 3"))
    counts = (
        geo_join.tag_pages(pages_df, idx_bc, host_hints=pgen.host_city_hints())
        .groupBy("poly_id")
        .agg(F.count("*").alias("n"))
    )
    sections.append(
        ("Flagship geo-tag join (single shuffle, map-side PIP)", plan(counts))
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    pairs = dedup.lsh_candidate_pairs(docs)
    pairs.collect()
    sections.append(
        (
            "MinHash LSH candidate pairs (FINAL adaptive plan: one band "
            "exchange, ReusedExchange, shuffle-free map-side signatures)",
            pairs._jdf.queryExecution().executedPlan().toString().strip(),
        )
    )

    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    spark.sql("DROP TABLE IF EXISTS o_bkt_doc")
    spark.sql("DROP TABLE IF EXISTS c_bkt_doc")
    o.write.bucketBy(8, "o_custkey").sortBy("o_custkey").mode("overwrite").saveAsTable(
        "o_bkt_doc"
    )
    c.write.bucketBy(8, "c_custkey").sortBy("c_custkey").mode("overwrite").saveAsTable(
        "c_bkt_doc"
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    j = (
        spark.table("o_bkt_doc")
        .join(spark.table("c_bkt_doc"), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "c_name")
    )
    sections.append(("Bucketed co-located join (zero Exchange)", plan(j)))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    spark.sql("DROP TABLE IF EXISTS o_bkt_doc")
    spark.sql("DROP TABLE IF EXISTS c_bkt_doc")

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    q = li.select("l_orderkey", "l_quantity").filter(F.col("l_quantity") > 10)
    sections.append(
        ("Projection + predicate pushdown (ReadSchema / PushedFilters)", plan(q, "formatted"))
    )

    spairs = dedup.simhash_near_pairs(docs)
    spairs.collect()
    sections.append(
        (
            "SimHash near-pairs (FINAL adaptive plan: 4×16-bit bands + "
            "hamming-1 multi-probe — probe rows hash-join capped base "
            "buckets; one text-hash pass feeds both sides via the "
            "checkpointed fingerprint table)",
            spairs._jdf.queryExecution().executedPlan().toString().strip(),
        )
    )

    import tempfile

    from europe_gis_spark.operators import similarity
    from europe_gis_spark.queries import QUERY_VEC

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cent = similarity.train_ivf_centroids(e, n_lists=16, seed=7)
    ivf_path = os.path.join(tempfile.gettempdir(), "egs_plans_ivf")
    similarity.write_ivf_index(e, ivf_path, cent)
    probe = [int(x) for x in similarity.probe_lists(cent, QUERY_VEC, 4)]
    cand = spark.read.parquet(ivf_path).filter(F.col("list_id").isin(probe))
    sections.append(
        (
            "At-rest IVF probe (PartitionFilters on list_id: only the "
            "probed lists' files are scanned)",
            plan(cand, "formatted"),
        )
    )

    from europe_gis_spark.operators import textops

    tfidf = textops.tf_idf(docs, top_k=5)
    tfidf.collect()
    sections.append(
        (
            "TF-IDF top-k (FINAL adaptive plan: one explode→(doc,term) "
            "partial+final agg, df aggregated off the SAME table, "
            "term-keyed join, 1-row broadcast N, doc-windowed top-k)",
            tfidf._jdf.queryExecution().executedPlan().toString().strip(),
        )
    )

    lm = textops.char_trigram_lm_scores(docs)
    lm.collect()
    sections.append(
        (
            "Trigram-LM quality score (FINAL adaptive plan: one trigram "
            "count shuffle; the count table and the 1-row corpus-N both "
            "come back via BROADCAST — scoring never shuffles trigram "
            "rows)",
            lm._jdf.queryExecution().executedPlan().toString().strip(),
        )
    )

    bench = docs.filter(F.col("doc_id") % 50 == 0)
    dec = textops.contamination_flags(docs, bench)
    dec.collect()
    sections.append(
        (
            "Benchmark decontamination (FINAL adaptive plan: doc "
            "shingles explode map-side into a BROADCAST hash join "
            "against the tiny benchmark shingle set; the corpus-scale "
            "hit table joins back un-hinted)",
            dec._jdf.queryExecution().executedPlan().toString().strip(),
        )
    )

    from europe_gis_spark.queries import q_url_dedup

    ud = q_url_dedup(spark, "/root/testdata/sf0.001")
    ud.collect()
    sections.append(
        (
            "Canonical-URL dedup (map-side JVM regex canonicalization; "
            "only the distinct-agg exchange pair, both keyed on the "
            "canonical key)",
            ud._jdf.queryExecution().executedPlan().toString().strip(),
        )
    )

    from europe_gis_spark.queries import q_corpus_select

    sel = q_corpus_select(spark, "/root/testdata/sf0.001")
    sel.collect()
    sections.append(
        (
            "Corpus selection end-to-end (FINAL adaptive plan: every "
            "branch reads the ONE localCheckpointed docs+dups union — "
            "Scan ExistingRDD, no re-scan of documents.parquet)",
            sel._jdf.queryExecution().executedPlan().toString().strip(),
        )
    )

    from europe_gis_spark.queries import q_hybrid_rrf

    hy = q_hybrid_rrf(spark, "/root/testdata/sf0.001")
    sections.append(
        (
            "Hybrid BM25+cosine RRF (query-term isin filter BELOW the "
            "tf exchange — non-matching vocabulary never leaves the map "
            "side; both candidate lists are TakeOrderedAndProject "
            "limit=50 heaps, the full-outer fusion join touches ≤ 2L "
            "rows, final top-10 is TakeOrderedAndProject)",
            plan(hy),
        )
    )

    from europe_gis_spark.queries import q_dsir_select, q_hll_users

    hll = q_hll_users(spark, "/root/testdata/sf0.001")
    sections.append(
        (
            "Own-HLL cardinality (ONE (group,bucket) register exchange "
            "with map-side partial capped at m rows/group/task; the "
            "estimate math is post-agg projection — no second pass over "
            "events for the sketch)",
            plan(hll),
        )
    )

    ds = q_dsir_select(spark, "/root/testdata/sf0.001")
    sections.append(
        (
            "DSIR selection (map-side hashed-bigram explode; two "
            "bounded ≤1024-row bucket aggs; the λ table joins back as "
            "an explicit broadcast; ONE doc_id-keyed integer score "
            "sum; Gumbel top-k is TakeOrderedAndProject)",
            plan(ds),
        )
    )

    from europe_gis_spark.operators import textops as tx

    docs001 = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pair1 = tx._bpe_pair_counts(tx.bpe_words(docs001)).orderBy(
        F.desc("cnt"), "lft", "rgt"
    ).limit(1)
    sections.append(
        (
            "BPE merge iteration (the per-merge unit: pair counts are "
            "a map-side zip_with explode over the word-type table into "
            "one (lft,rgt) agg; the argmax is TakeOrderedAndProject "
            "limit=1 — no global sort, no Python in the loop body)",
            plan(pair1),
        )
    )

    from europe_gis_spark.operators import trajectory, webmap
    from europe_gis_spark.queries import AA_X0, AA_Y0, event_points

    pts001 = event_points(spark, "/root/testdata/sf0.001").join(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
            "event_id", "user_id", "ts"
        ),
        "event_id",
    )
    sections.append(
        (
            "Tile pyramid (ONE point scan + ONE corpus shuffle at max "
            "zoom; each coarser level aggregates the previous level's "
            "tile table — at runtime AQE dedups the shared prefix into "
            "ReusedExchange per zoom branch, asserted in "
            "test_plans.test_tile_pyramid_scans_points_once_reuses_base)",
            plan(
                webmap.tile_pyramid(
                    event_points(spark, "/root/testdata/sf0.001"),
                    AA_X0,
                    AA_Y0,
                    65536.0,
                    3,
                    8,
                )
            ),
        )
    )
    sections.append(
        (
            "Stay points (gaps-and-islands dwell detection: the island "
            "aggregation's (user, island) key EXTENDS the window's "
            "user key, so ClusteredDistribution lets it ride the one "
            "window exchange — single Exchange total, asserted in "
            "test_asof_range.test_stay_points_islands_and_single_exchange)",
            plan(trajectory.stay_points(pts001, 15000.0, 3600)),
        )
    )
    sections.append(
        (
            "KDE heatmap (driver-quantized integer kernel stamp rides "
            "the plan as an inline-exploded literal; one (cx, cy) "
            "exchange, no Python, no floats in either engine)",
            plan(
                webmap.kde_heatmap(
                    event_points(spark, "/root/testdata/sf0.001"),
                    AA_X0,
                    AA_Y0,
                    2000.0,
                )
            ),
        )
    )

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs", "PLANS.md")
    with open(out, "w") as f:
        f.write("# Captured physical plans — the evidence behind the scale claims\n\n")
        f.write("Generated live on this box (`python scripts_local/capture_plans.py`).\n")
        f.write("Each plan is the one the plan-assertion tests in tests/test_plans.py pin.\n\n")
        for title, p in sections:
            f.write(f"## {title}\n\n```\n{p}\n```\n\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
