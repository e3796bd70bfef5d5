"""Paired A/B: r2-checkout JVM vs current JVM on the SAME
spatial_join_metrics measurement (round-3 verdict 'what's wrong #1' —
+177 % with no code change on the measured path).

Protocol: alternating child JVMs (A = git worktree at the r2 commit,
B = current repo), >=5 pairs, each child re-measures bench.py's
spatial_join_metrics shape exactly (200k pages parquet scan ->
pages_per_region(with_metrics=True), warmup slice + best-of-2). A
matmul bandwidth control and /proc/stat steal%% bracket every pair so
host weather is visible in the record.

Usage: python scripts_local/ab_regression.py [--pairs 5] [--pages 200000]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R2_COMMIT = "048dff3"
R2_TREE = "/tmp/egs_ab_r2_tree"

CHILD = r"""
import json, sys, time
repo = sys.argv[1]; pages_path = sys.argv[2]
sys.path.insert(0, repo)
from europe_gis_spark.session import get_spark
from europe_gis_spark.datagen import geodata, pages as pgen
from europe_gis_spark.operators import geo_join

spark = get_spark(app_name="ab")
spark.sparkContext.setLogLevel("ERROR")
pages_df = spark.read.parquet(pages_path)
polys_df = spark.createDataFrame(geodata.admin_polygons())
hints = pgen.host_city_hints()
geo_join.pages_per_region(
    spark, pages_df.limit(5000), polys_df, host_hints=hints, level=3,
    with_metrics=True,
).collect()
best = None
for _ in range(2):
    t0 = time.perf_counter()
    geo_join.pages_per_region(
        spark, pages_df, polys_df, host_hints=hints, level=3,
        with_metrics=True,
    ).collect()
    dt = time.perf_counter() - t0
    best = dt if best is None or dt < best else best
print(json.dumps({"sec": round(best, 3)}))
spark.stop()
"""


def run_child(repo: str, pages_path: str) -> float:
    out = subprocess.run(
        [sys.executable, "-c", CHILD, repo, pages_path],
        capture_output=True,
        text=True,
        check=True,
        cwd=repo,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])["sec"]


def steal_pct(interval: float = 1.0) -> float:
    import time

    def snap():
        f = open("/proc/stat").readline().split()
        v = [int(x) for x in f[1:]]
        return sum(v), v[7] if len(v) > 7 else 0

    t1, s1 = snap()
    time.sleep(interval)
    t2, s2 = snap()
    return round(100.0 * (s2 - s1) / max(t2 - t1, 1), 2)


def matmul_jobs_s(procs: int = 8, jobs: int = 16) -> float:
    import multiprocessing as mp
    import time

    from scaling_bench import _matmul_job  # same control as BASELINE.md

    with mp.get_context("fork").Pool(procs) as p:
        p.map(_matmul_job, range(procs))
        t0 = time.perf_counter()
        p.map(_matmul_job, range(jobs))
        dt = time.perf_counter() - t0
    return round(jobs / dt, 2)


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=5)
    ap.add_argument("--pages", type=int, default=200_000)
    args = ap.parse_args()

    if not os.path.exists(R2_TREE):
        subprocess.run(
            ["git", "worktree", "add", "--detach", R2_TREE, R2_COMMIT],
            cwd=REPO,
            check=True,
        )
    pages_path = os.path.join(REPO, ".bench_pages", f"pages_{args.pages}")
    if not os.path.exists(pages_path):
        code = (
            "import sys; sys.path.insert(0, %r)\n"
            "from europe_gis_spark.session import get_spark\n"
            "from europe_gis_spark.datagen import pages as pgen\n"
            "s = get_spark(app_name='gen'); s.sparkContext.setLogLevel('ERROR')\n"
            "pgen.write_pages(s, %d, %r, seed=42, partitions=64)\n"
            "s.stop()" % (REPO, args.pages, pages_path)
        )
        subprocess.run([sys.executable, "-c", code], check=True)

    pairs = []
    for i in range(args.pairs):
        rec = {"steal_pre": steal_pct(), "matmul_pre": matmul_jobs_s()}
        rec["r2_sec"] = run_child(R2_TREE, pages_path)
        rec["cur_sec"] = run_child(REPO, pages_path)
        rec["ratio_cur_over_r2"] = round(rec["cur_sec"] / rec["r2_sec"], 3)
        rec["steal_post"] = steal_pct()
        pairs.append(rec)
        print(json.dumps({"pair": i, **rec}), flush=True)
    ratios = sorted(p["ratio_cur_over_r2"] for p in pairs)
    med = ratios[len(ratios) // 2]
    print(
        json.dumps(
            {
                "median_ratio_cur_over_r2": med,
                "all_ratios": ratios,
                "r2_secs": [p["r2_sec"] for p in pairs],
                "cur_secs": [p["cur_sec"] for p in pairs],
                "verdict": "code" if med > 1.3 else "host-weather-exonerated",
            }
        )
    )


if __name__ == "__main__":
    main()
