"""Dump .explain("formatted") for named registry queries to plans/<round>/.

Usage: python tools/dump_plans.py [--round rNN] <tag> <query> [query ...]
The round directory defaults to $SPARK_GRAFT_ROUND or r15.
With --executed, runs the query first and dumps the FINAL adaptive plan
(ReusedExchange / AQEShuffleRead visible) instead of the initial one.
"""
from __future__ import annotations

import os
import sys

os.environ.setdefault("SPARK_GRAFT_HASH_MODE", "production")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from data_pipeline_python_aws_cdk_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--executed"]
    executed = "--executed" in sys.argv
    rnd = os.environ.get("SPARK_GRAFT_ROUND", "r15")
    if "--round" in args:
        i = args.index("--round")
        rnd = args[i + 1]
        del args[i : i + 2]
    tag, names = args[0], args[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan-dump")
    reg = entrymod.queries()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = reg[name](spark, sf_dir)
        if executed:
            df.collect()
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print("wrote", path)


if __name__ == "__main__":
    main()
