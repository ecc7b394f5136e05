"""Local differential harness mirroring the driver's t2 gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same parquet tables, then compares row count, column names, and an
order-insensitive value multiset (floats rounded to 9 significant-ish
decimals to absorb summation-order noise).

Usage: python tools/check_correctness.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")

# The differential gate compares Spark against md5-based oracles, so the
# hash family MUST be the oracle mode regardless of what the invoking shell
# exports (bench shells run production/xxhash64, which has no oracle twin by
# design — inheriting it here would spray spurious mismatches across the
# whole dedup/sampling/split tier).
os.environ["SPARK_GRAFT_HASH_MODE"] = "oracle"

import duckdb

import __spark_entry__ as entrymod
from data_pipeline_python_aws_cdk_spark.tables import TABLE_NAMES


def vanilla_spark():
    """A deliberately untuned session, mirroring the driver's harness.

    Round 1 failed precisely because queries worked under the engine's own
    session factory (session.py confs) but erred under the driver's vanilla
    session; the local gate must reproduce the driver's environment, so no
    engine confs here — every query must set what it needs at runtime.
    """
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.appName("check-correctness-vanilla")
        .master("local[*]")
        # SPARK_GRAFT_SHUFFLE lets the adversarial-parallelism gate vary
        # the partition count (e.g. =7); results must not change with it.
        .config(
            "spark.sql.shuffle.partitions",
            os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
        )
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )


def normalize(v):
    """Type-tagged canonical form.

    The driver's value hash is type-sensitive (DuckDB HUGEINT from an
    integer SUM arrives as Decimal and hashes differently from Spark's
    int even when numerically equal — the round-1 `missing_fields`
    failure), so the local gate must distinguish types too, not rely on
    Python's cross-type ``==``.
    """
    import datetime
    import decimal

    if v is None:
        return ("none", "")
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "NaN")
        return ("float", f"{v:.9g}")
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, decimal.Decimal):
        return ("decimal", str(v))
    if isinstance(v, datetime.datetime):
        return ("datetime", v.isoformat())
    if isinstance(v, datetime.date):
        return ("date", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("list", tuple(normalize(x) for x in v))
    if isinstance(v, (bytes, bytearray)):
        return ("bytes", bytes(v).hex())
    return (type(v).__name__, str(v))


def row_key(row, cols_order):
    return tuple(normalize(row[i]) for i in cols_order)


def compare(name: str, sf_dir: str, spark, con) -> dict:
    t0 = time.time()
    qfn = entrymod.queries()[name]
    sdf = qfn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    t_spark = time.time() - t0

    sql = entrymod.oracle_sql().get(name)
    if sql is None:
        return {"name": name, "status": "rows-only", "rows": len(srows), "spark_sec": round(t_spark, 2)}

    t0 = time.time()
    ocur = con.execute(sql)
    ocols = [d[0] for d in ocur.description]
    orows = [tuple(r) for r in ocur.fetchall()]
    t_oracle = time.time() - t0

    res = {"name": name, "rows": len(srows), "oracle_rows": len(orows),
           "spark_sec": round(t_spark, 2), "oracle_sec": round(t_oracle, 2)}
    if sorted(scols) != sorted(ocols):
        res["status"] = "SCHEMA-MISMATCH"
        res["spark_cols"] = scols
        res["oracle_cols"] = ocols
        return res
    if len(srows) != len(orows):
        res["status"] = "COUNT-MISMATCH"
        return res
    s_order = [scols.index(c) for c in sorted(scols)]
    o_order = [ocols.index(c) for c in sorted(ocols)]
    smulti = sorted(row_key(r, s_order) for r in srows)
    omulti = sorted(row_key(r, o_order) for r in orows)
    if smulti != omulti:
        res["status"] = "VALUE-MISMATCH"
        for a, b in zip(smulti, omulti):
            if a != b:
                res["first_diff"] = {"spark": a, "oracle": b}
                break
        return res
    res["status"] = "MATCH"
    return res


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(entrymod.queries())
    spark = vanilla_spark()
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    failures = 0
    for name in names:
        try:
            res = compare(name, sf_dir, spark, con)
        except Exception as e:  # noqa: BLE001
            res = {"name": name, "status": "ERROR", "error": str(e)[:500]}
        ok = res["status"] in ("MATCH", "rows-only")
        failures += 0 if ok else 1
        print(("PASS " if ok else "FAIL ") + str(res))
    print(f"\n{len(names) - failures}/{len(names)} ok")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
