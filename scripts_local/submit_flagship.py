"""spark-submit entry point for the flagship spatial join.

Cluster usage (north-rule run shape):

    cd /root/repo && zip -r /tmp/egs.zip europe_gis_spark
    spark-submit --py-files /tmp/egs.zip \
        scripts_local/submit_flagship.py \
        --pages-path <parquet/iceberg pages table> \
        --out <output path> [--n-pages-synthetic 1000000]

Local sandbox: omits --master (session.py defaults to
local[$SPARK_GRAFT_CPUS]). With no --pages-path, a deterministic
synthetic pages table is generated first (seeded; no external data).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages-path", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--n-pages-synthetic", type=int, default=200_000)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--run-id", default="run1")
    args = ap.parse_args()

    from europe_gis_spark.datagen import geodata, pages as pgen
    from europe_gis_spark.operators import geo_join
    from europe_gis_spark.session import get_spark

    spark = get_spark(app_name="flagship-spatial-join")
    spark.sparkContext.setLogLevel("WARN")

    if args.pages_path:
        pages_df = spark.read.parquet(args.pages_path)
    else:
        tmp = os.path.join(os.getcwd(), ".bench_pages", f"pages_{args.n_pages_synthetic}")
        if not os.path.exists(tmp):
            pgen.write_pages(spark, args.n_pages_synthetic, tmp, seed=42, partitions=64)
        pages_df = spark.read.parquet(tmp)

    polys_df = spark.createDataFrame(geodata.admin_polygons())
    t0 = time.perf_counter()
    result = geo_join.pages_per_region(
        spark, pages_df, polys_df, host_hints=pgen.host_city_hints(), level=3
    )
    if args.out:
        result.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
    else:
        n = len(result.collect())
    dt = time.perf_counter() - t0
    total = pages_df.count()
    print(
        json.dumps(
            {
                "regions": n,
                "pages": total,
                "sec": round(dt, 3),
                "pages_per_sec": round(total / dt, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
