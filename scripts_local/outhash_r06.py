"""Output-hash regression net for the r06 optimization round.

Computes a stable hash of every declared query's collected output
(column names + row values, order-insensitive) at a given SF dir.
Run BEFORE and AFTER each optimization; equal hashes = identical
results (the round's hard constraint).

Usage:
  python scripts_local/outhash_r06.py --sf /root/testdata/sf0.1 \
      --out /tmp/outhash_sf01_before.json [query ...]
  python scripts_local/outhash_r06.py --compare A.json B.json
"""

from __future__ import annotations

import argparse
import hashlib
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def row_repr(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(row_repr(x) for x in v) + "]"
    if isinstance(v, bytes):
        return "0x" + v.hex()
    return repr(v)


def df_hash(df) -> tuple[str, int]:
    rows = df.collect()
    cols = df.columns
    lines = sorted(
        "|".join(row_repr(r[c]) for c in cols) for r in rows
    )
    h = hashlib.sha256()
    h.update(",".join(cols).encode())
    for line in lines:
        h.update(line.encode())
    return h.hexdigest()[:16], len(rows)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None)
    ap.add_argument("--compare", nargs=2, default=None)
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    if args.compare:
        with open(args.compare[0]) as f:
            a = json.load(f)
        with open(args.compare[1]) as f:
            b = json.load(f)
        bad = []
        for k in sorted(set(a["hashes"]) & set(b["hashes"])):
            if a["hashes"][k] != b["hashes"][k]:
                bad.append((k, a["hashes"][k], b["hashes"][k]))
        missing = sorted(set(a["hashes"]) ^ set(b["hashes"]))
        print(f"compared {len(set(a['hashes']) & set(b['hashes']))} queries")
        if missing:
            print("only in one file:", missing)
        if bad:
            print("MISMATCHES:")
            for k, x, y in bad:
                print(f"  {k}: {x} vs {y}")
            sys.exit(1)
        print("all hashes match")
        return

    from europe_gis_spark.queries import QUERIES
    from europe_gis_spark.session import get_spark

    spark = get_spark(app_name="outhash_r06")
    spark.sparkContext.setLogLevel("ERROR")
    names = args.queries or list(QUERIES)
    hashes = {}
    for name in names:
        fn, _sql = QUERIES[name]
        try:
            hashes[name] = df_hash(fn(spark, args.sf))
        except Exception as e:  # record, don't die
            hashes[name] = ["ERROR", str(e)[:200]]
        print(name, hashes[name], flush=True)
    out = args.out or f"/tmp/outhash_{os.path.basename(args.sf)}.json"
    with open(out, "w") as f:
        json.dump({"sf": args.sf, "hashes": hashes}, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
