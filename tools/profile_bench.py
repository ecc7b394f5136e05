"""Per-query profile of the headline bench set (optimization guide §1).

For each headline query: capture .explain("formatted") to
plans/<round>/<name>_before.txt (or _after.txt), then run the query and
report, via the local Spark UI REST API:

- number of jobs and stages the query submitted,
- per-stage wall time, task count, shuffle read/write bytes,
- total executor run time vs wall time (scheduling-floor fraction).

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/profile_bench.py \
        [--tag before] [--queries q1,q2] [--no-plans]

Prints one JSON line per query plus a summary. The timed action is
collect() — the same action bench.py times — so profiles map 1:1 onto
bench numbers.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

os.environ.setdefault("SPARK_GRAFT_HASH_MODE", "production")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from bench import HEADLINE  # noqa: E402
from data_pipeline_python_aws_cdk_spark.session import get_spark  # noqa: E402


def _ui(path: str):
    base = "http://localhost:4040/api/v1"
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.load(r)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--round", default=os.environ.get("SPARK_GRAFT_ROUND", "r15"))
    ap.add_argument("--queries", default="")
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("engine-profile")
    sc = spark.sparkContext
    registry = entrymod.queries()
    names = [n for n in (args.queries.split(",") if args.queries else HEADLINE) if n in registry]

    app_id = sc.applicationId
    plans_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", args.round)
    os.makedirs(plans_dir, exist_ok=True)

    # Warm-up: JIT/codegen/Arrow worker spin-up, same rationale as bench.py.
    warm = os.environ.get("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    for n in names:
        try:
            registry[n](spark, warm).collect()
        except Exception:
            pass

    out = []
    for name in names:
        df = registry[name](spark, sf_dir)
        if not args.no_plans:
            plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(plan)
        # profile run: fresh plan, job-group scoped
        sc.setJobGroup(f"profile:{name}", name)
        best = float("inf")
        plan_ms_best = float("inf")
        for _ in range(args.runs):
            t0 = time.time()
            df2 = registry[name](spark, sf_dir)
            t1 = time.time()
            df2.collect()
            t2 = time.time()
            best = min(best, t2 - t0)
            plan_ms_best = min(plan_ms_best, t1 - t0)
        sc.setJobGroup("idle", "idle")
        jobs = [j for j in _ui(f"/applications/{app_id}/jobs") if j.get("jobGroup") == f"profile:{name}"]
        n_runs = max(1, args.runs)
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        stages = []
        exec_ms = 0
        shuffle_r = shuffle_w = 0
        for sid in stage_ids:
            try:
                sts = _ui(f"/applications/{app_id}/stages/{sid}")
            except Exception:
                continue
            for st in sts:
                if st["status"] not in ("COMPLETE", "FAILED"):
                    continue
                dur = (st.get("executorRunTime") or 0)
                exec_ms += dur
                shuffle_r += st.get("shuffleReadBytes") or 0
                shuffle_w += st.get("shuffleWriteBytes") or 0
                stages.append(
                    {
                        "id": sid,
                        "tasks": st.get("numCompleteTasks"),
                        "run_ms": dur,
                        "sread": st.get("shuffleReadBytes"),
                        "swrite": st.get("shuffleWriteBytes"),
                    }
                )
        rec = {
            "query": name,
            "best_sec": round(best, 4),
            "df_build_sec": round(plan_ms_best, 4),
            "jobs_per_run": round(len(jobs) / n_runs, 1),
            "stages_per_run": round(len(stages) / n_runs, 1),
            "exec_ms_total_all_runs": exec_ms,
            "shuffle_read_b_total_all_runs": shuffle_r,
            "shuffle_write_b_total_all_runs": shuffle_w,
        }
        out.append(rec)
        print(json.dumps(rec), flush=True)
    print(json.dumps({"total_best_sec": round(sum(r["best_sec"] for r in out), 4)}))


if __name__ == "__main__":
    main()
