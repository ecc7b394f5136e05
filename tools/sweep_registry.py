"""Full-registry straggler sweep: time EVERY registry key once (guide §1).

For each key in __spark_entry__.queries(), build + collect at
$SPARK_GRAFT_SF_DIR and record wall seconds (best of --runs, default 2 so
one-off GC pauses don't mislabel a key as a straggler). Prints one JSONL
row per key as it goes (so a killed run still leaves a ranked prefix) and
a final ranking of the slowest keys.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/sweep_registry.py \
        [--runs 2] [--out sweeps/r15_registry.jsonl] [--skip-warmup]

This is a read-only diagnostic OUTSIDE the timed bench path; absolute
numbers are only comparable within one quiesced run (the sandbox
burst-throttles — see OPTIMIZATION_r15.md "Measurement protocol").
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_HASH_MODE", "production")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from data_pipeline_python_aws_cdk_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out", default="")
    ap.add_argument("--skip-warmup", action="store_true")
    ap.add_argument("--keys", default="", help="comma-separated subset")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("registry-sweep")
    registry = entrymod.queries()
    names = [k for k in args.keys.split(",") if k] or sorted(registry)

    # One warm-up pass at the small SF so codegen/Arrow spin-up doesn't get
    # billed to whichever key runs first (same rationale as bench.py).
    warm = os.environ.get("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    if not args.skip_warmup and os.path.isdir(warm):
        for n in names:
            try:
                registry[n](spark, warm).collect()
            except Exception:
                pass

    sink = open(args.out, "w") if args.out else None
    rows = []
    for i, name in enumerate(names):
        spark.sparkContext.setJobDescription(f"sweep:{name}")
        best = float("inf")
        build_best = float("inf")
        err = None
        for _ in range(max(1, args.runs)):
            t0 = time.time()
            try:
                df = registry[name](spark, sf_dir)
                t1 = time.time()
                df.collect()
            except Exception as e:  # record and move on — sweep must finish
                err = f"{type(e).__name__}: {e}"[:200]
                break
            best = min(best, time.time() - t0)
            build_best = min(build_best, t1 - t0)
        rec = {
            "key": name,
            "best_sec": round(best, 4) if best != float("inf") else None,
            "build_sec": round(build_best, 4) if build_best != float("inf") else None,
            "err": err,
        }
        rows.append(rec)
        line = json.dumps(rec)
        print(f"[{i + 1}/{len(names)}] {line}", flush=True)
        if sink:
            sink.write(line + "\n")
            sink.flush()
    timed = [r for r in rows if r["best_sec"] is not None]
    timed.sort(key=lambda r: -r["best_sec"])
    print(json.dumps({
        "total_keys": len(rows),
        "errors": [r["key"] for r in rows if r["err"]],
        "total_sec": round(sum(r["best_sec"] for r in timed), 2),
        "top20": [(r["key"], r["best_sec"]) for r in timed[:20]],
    }))
    if sink:
        sink.close()


if __name__ == "__main__":
    main()
