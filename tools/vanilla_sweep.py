"""Driver-parity gate: run every registered query under a VANILLA session.

The external driver imports ``__spark_entry__`` into its own process with a
plain ``SparkSession`` (no engine confs) and its own working directory. Local
harnesses accidentally mask two classes of environment bugs the driver then
hits: session confs that only our ``session.get_spark`` sets, and Python
workers that can only import the package because cwd happens to be the repo
root (round-2 regression: every mapInPandas operator crashed with
ModuleNotFoundError under a foreign cwd until ``tables.ensure_package_shipped``
addPyFile'd the package).

This sweep reproduces the driver's exact setup — vanilla session, cwd moved
to a temp directory — and collects every query. It checks execution only
(the differential harness ``check_correctness.py`` owns value comparison).

Usage: python tools/vanilla_sweep.py [sf_dir]   (exit 1 on any failure)
"""

from __future__ import annotations

import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    os.chdir(tempfile.mkdtemp(prefix="vanilla_sweep_"))
    sys.path.insert(0, REPO)
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config(
            "spark.sql.shuffle.partitions",
            os.environ.get("SPARK_GRAFT_SHUFFLE", "16"),
        )
        .appName("vanilla-sweep")
        .getOrCreate()
    )
    import __spark_entry__ as entry

    queries = entry.queries()
    failed = []
    for name, fn in queries.items():
        try:
            fn(spark, sf_dir).collect()
            print(f"PASS {name}")
        except Exception as ex:  # noqa: BLE001 — report every failure
            failed.append(name)
            print(f"FAIL {name}: {ex!r}"[:300])
    print(f"\n{len(queries) - len(failed)}/{len(queries)} ok")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
