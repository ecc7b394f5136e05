"""Oracle/Spark type-width gate — the failure class the value harness can't see.

The driver's value hash is type-sensitive, but DuckDB's Python client returns
plain ``int`` for INTEGER, BIGINT *and* HUGEINT alike, so
``tools/check_correctness.py`` (which compares fetched values) is structurally
blind to integer-width drift between an oracle and its Spark query.  That is
exactly how the three CORRECTNESS_r03 hash mismatches (``embedding_quantize``,
``corpus_quality_gate``, ``doc_rolling_fingerprint``) slipped through a green
182/182 local differential.

This gate compares *declared* types instead: ``duckdb.sql(oracle).types``
(binder output, no execution) against the Spark DataFrame's analyzed schema,
canonicalized to a common spelling.  HUGEINT/UHUGEINT are unconditionally
illegal in an oracle — no Spark type matches them, and pandas/pyarrow convert
them to object/float on the driver side.

Usage: python tools/check_types.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, "/root/repo")

os.environ["SPARK_GRAFT_HASH_MODE"] = "oracle"

_DUCK_SCALARS = {
    "BIGINT": "bigint",
    "INTEGER": "int",
    "SMALLINT": "smallint",
    "TINYINT": "tinyint",
    "DOUBLE": "double",
    "FLOAT": "float",
    "VARCHAR": "string",
    "BOOLEAN": "boolean",
    "DATE": "date",
    "BLOB": "binary",
    # DuckDB TIMESTAMP is tz-naive microseconds; Spark TimestampType values
    # compare equal through the harness, so both spell "timestamp".
    "TIMESTAMP": "timestamp",
    "TIMESTAMP WITH TIME ZONE": "timestamp",
    # No Spark equivalent — always a mismatch, by design.
    "HUGEINT": "!hugeint",
    "UHUGEINT": "!uhugeint",
    "UBIGINT": "!ubigint",
    "UINTEGER": "!uinteger",
}


def duck_canon(t) -> str:
    s = str(t).upper().strip()
    if s.endswith("[]"):
        return f"array<{duck_canon(s[:-2])}>"
    m = re.fullmatch(r"DECIMAL\((\d+),(\d+)\)", s)
    if m:
        return f"decimal({m.group(1)},{m.group(2)})"
    st = re.fullmatch(r"STRUCT\((.*)\)", s, flags=re.DOTALL)
    if st:
        # good-enough split for the flat structs our oracles emit
        parts = [p.strip() for p in st.group(1).split(",")]
        inner = ",".join(
            f"{p.split(' ', 1)[0].lower()}:{duck_canon(p.split(' ', 1)[1])}"
            for p in parts
        )
        return f"struct<{inner}>"
    return _DUCK_SCALARS.get(s, f"?{s.lower()}")


def spark_canon(dt) -> str:
    return dt.simpleString().replace("timestamp_ntz", "timestamp")


def check_one(name: str, sdf, con, sql: str) -> list[str]:
    """Return a list of human-readable mismatch strings (empty = ok)."""
    rel = con.sql(sql)
    duck = dict(zip(rel.columns, (duck_canon(t) for t in rel.types)))
    spark = {f.name: spark_canon(f.dataType) for f in sdf.schema.fields}
    probs = []
    for col in sorted(set(duck) | set(spark)):
        d, s = duck.get(col), spark.get(col)
        if d is None or s is None:
            probs.append(f"{name}.{col}: oracle={d} spark={s} (column set differs)")
        elif d.startswith("!") or "!" in d:
            probs.append(f"{name}.{col}: oracle type {d[1:]} has no Spark equivalent")
        elif d != s:
            probs.append(f"{name}.{col}: oracle={d} spark={s}")
    return probs


def run(sf_dir: str, names: list[str] | None = None, spark=None):
    import duckdb

    import __spark_entry__ as entrymod
    from data_pipeline_python_aws_cdk_spark.tables import TABLE_NAMES

    owns_spark = spark is None
    if spark is None:
        from tools.check_correctness import vanilla_spark

        spark = vanilla_spark()
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    names = names or [n for n in qs if n in os_]
    failures: list[str] = []
    for name in names:
        if name not in os_:
            continue
        try:
            probs = check_one(name, qs[name](spark, sf_dir), con, os_[name])
        except Exception as e:  # noqa: BLE001
            probs = [f"{name}: ERROR {type(e).__name__}: {str(e)[:300]}"]
        failures.extend(probs)
        status = "ok " if not probs else "MISMATCH "
        print(status + name + ("" if not probs else " :: " + "; ".join(probs)))
    con.close()
    if owns_spark:
        spark.stop()
    return failures


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    fails = run(sf_dir, sys.argv[2:] or None)
    print(f"\n{'FAIL' if fails else 'PASS'}: {len(fails)} type mismatches")
    sys.exit(1 if fails else 0)
