"""DuckDB baseline runner: times each headline query's oracle SQL at a
given scale factor on the same parquet tables the Spark bench reads.

The reference publishes no benchmark numbers (SURVEY.md §6), so per
BASELINE.md the DuckDB runtimes on identical parquet serve as the
comparison baseline for bench.py's "within 2x" target.

Usage: python tools/baseline_duckdb.py [sf_dir]
Prints ONE JSON line: {"metric": "duckdb_baseline_total_time", "value": N,
"unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from bench import HEADLINE
from data_pipeline_python_aws_cdk_spark.tables import TABLE_NAMES


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    oracles = entrymod.oracle_sql()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        sql = oracles.get(name)
        if sql is None:  # rows-only ops have no SQL twin
            continue
        best = float("inf")
        for _attempt in range(5):  # best-of-5, mirroring bench.py
            t0 = time.time()
            con.execute(sql).fetchall()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 4)

    print(
        json.dumps(
            {
                "metric": "duckdb_baseline_total_time",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
