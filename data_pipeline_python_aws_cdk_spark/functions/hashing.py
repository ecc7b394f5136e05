"""Deterministic cross-engine hashing.

MinHash/SimHash/LSH operators need hash functions that (a) run JVM-side in
Spark, (b) can be reproduced exactly by the DuckDB oracle, and (c) are stable
across partitioning/retries. Spark's builtin ``hash``/``xxhash64`` are not
implemented in DuckDB, so we derive a 60-bit integer from the top 15 hex chars
of md5 — available and bit-identical in both engines (and in hashlib for
pandas-UDF code paths).

60 bits keeps the value strictly positive in a signed 64-bit integer, so
right-shifts and comparisons behave identically everywhere.
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
from pyspark.sql import Column

HASH_BITS = 60


def hash60(col: Column | str, salt: str | None = None) -> Column:
    """60-bit non-negative hash of a string column (Spark side).

    ``salt`` derives independent hash families (MinHash needs k of them).
    Stays in whole-stage codegen: md5 + substring + conv + cast.
    """
    c = F.col(col) if isinstance(col, str) else col
    if salt is not None:
        c = F.concat(F.lit(salt + ":"), c)
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("bigint")


def hash60_sql(expr: str, salt: str | None = None) -> str:
    """The same hash as DuckDB SQL over an arbitrary expression."""
    inner = f"'{salt}:' || {expr}" if salt is not None else expr
    return f"('0x' || substr(md5({inner}), 1, 15))::BIGINT"


def hash60_py(value: str, salt: str | None = None) -> int:
    """The same hash in plain Python (for pandas-UDF code paths)."""
    s = f"{salt}:{value}" if salt is not None else value
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)
