"""Round-6 measurement harness (guide §1: measure first).

Times declared queries with the bench methodology (collect, best-of-2),
captures .explain("formatted") into plans/r06/, and pulls per-stage
executor metrics from the Spark REST API so hot stages are attributable.

Usage:
  python scripts_local/measure_r06.py [--sf /root/testdata/sf1.0]
      [--out /tmp/measure_r06.json] [--tag before] [--plans] [query ...]

Separate from the FROZEN bench.py on purpose (round rules).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

UI_PORT = 4059


def rest(path: str):
    with urllib.request.urlopen(f"http://localhost:{UI_PORT}/api/v1/{path}") as r:
        return json.load(r)


def stage_metrics(app_id: str, after_stage: int) -> list[dict]:
    out = []
    for s in rest(f"applications/{app_id}/stages?status=complete"):
        if s["stageId"] <= after_stage:
            continue
        out.append(
            {
                "stageId": s["stageId"],
                "name": s["name"].split("\n")[0][:120],
                "numTasks": s["numTasks"],
                "executorRunTime_s": round(s["executorRunTime"] / 1000, 2),
                "executorCpuTime_s": round(s.get("executorCpuTime", 0) / 1e9, 2),
                "shuffleRead_mb": round(s["shuffleReadBytes"] / 1e6, 2),
                "shuffleWrite_mb": round(s["shuffleWriteBytes"] / 1e6, 2),
                "input_mb": round(s["inputBytes"] / 1e6, 2),
            }
        )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf1.0")
    ap.add_argument("--out", default="/tmp/measure_r06.json")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--plans", action="store_true", help="write plans/r06/<q>_<tag>.txt")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from europe_gis_spark.queries import QUERIES
    from europe_gis_spark.session import get_spark

    spark = get_spark(
        app_name="measure_r06",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": str(UI_PORT)},
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId

    names = args.queries or list(QUERIES)
    plans_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(plans_dir, exist_ok=True)

    results: dict[str, dict] = {}
    for name in names:
        fn, _sql = QUERIES[name]
        spark.sparkContext.setJobDescription(name)
        last_stage = max(
            (s["stageId"] for s in rest(f"applications/{app_id}/stages")), default=-1
        )
        samples = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            df.collect()
            samples.append(round(time.perf_counter() - t0, 3))
        if args.plans:
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain(mode="formatted")
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(buf.getvalue())
        stages = stage_metrics(app_id, last_stage)
        results[name] = {
            "samples": samples,
            "best": min(samples),
            "stages_core_s": round(sum(s["executorRunTime_s"] for s in stages), 2),
            "top_stages": sorted(
                stages, key=lambda s: -s["executorRunTime_s"]
            )[:6],
        }
        print(f"{name}: {samples} core_s={results[name]['stages_core_s']}", flush=True)
    with open(args.out, "w") as f:
        json.dump({"sf": args.sf, "tag": args.tag, "results": results}, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
