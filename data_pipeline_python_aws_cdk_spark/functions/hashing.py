"""Deterministic cross-engine hashing with a pluggable family.

MinHash/SimHash/LSH operators need hash functions that (a) run JVM-side in
Spark, (b) are stable across partitioning/retries, and — in differential-
testing mode — (c) can be reproduced exactly by the DuckDB oracle. Two
families satisfy different subsets:

- ``oracle`` (default): a 60-bit integer from the top 15 hex chars of md5 —
  available and bit-identical in Spark, DuckDB, and hashlib. This is the
  mode the driver's correctness gate runs in; every ``oracle_sql`` replays
  signatures bit-for-bit against it.
- ``production``: Spark's builtin ``xxhash64`` masked to 60 bits. xxHash is
  a few integer rounds per value vs md5's 64 rounds of full crypto mixing —
  on the dedup ladder (one hash per shingle, the biggest scan in the
  engine) that is the difference between hashing dominating the profile
  and disappearing into it. Not reproducible in DuckDB, so it has no
  oracle twin *by design*: any uniform hash family yields statistically
  identical MinHash/SimHash behavior, and the exact-Jaccard /
  exact-cosine verification stages downstream are hash-independent.

Select with env var ``SPARK_GRAFT_HASH_MODE`` (``oracle`` | ``production``)
or per call site via the ``mode`` argument. ``bench.py`` runs production
mode; correctness harnesses run (and must run) the default.

60 bits keeps the value strictly positive in a signed 64-bit integer, so
right-shifts, mod, and comparisons behave identically everywhere.
"""

from __future__ import annotations

import hashlib
import os

import pyspark.sql.functions as F
from pyspark.sql import Column

HASH_BITS = 60
HASH_MODE_ENV = "SPARK_GRAFT_HASH_MODE"
_MODES = ("oracle", "production")
_MASK60 = (1 << HASH_BITS) - 1


def hash_mode() -> str:
    """Resolve the active hash family (read at plan-build time)."""
    mode = os.environ.get(HASH_MODE_ENV, "oracle")
    if mode not in _MODES:
        raise ValueError(f"{HASH_MODE_ENV}={mode!r}; expected one of {_MODES}")
    return mode


def hash60(col: Column | str, salt: str | None = None, mode: str | None = None) -> Column:
    """60-bit non-negative hash of a string column (Spark side).

    ``salt`` derives independent hash families (MinHash needs k of them).
    Both families stay in whole-stage codegen: md5 + substring + conv +
    cast (oracle) or a single xxhash64 + bitmask (production).
    """
    if mode is not None and mode not in _MODES:
        raise ValueError(f"mode={mode!r}; expected one of {_MODES}")
    c = F.col(col) if isinstance(col, str) else col
    if salt is not None:
        c = F.concat(F.lit(salt + ":"), c)
    if (mode or hash_mode()) == "production":
        return F.xxhash64(c.cast("string")).bitwiseAND(F.lit(_MASK60))
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("bigint")


def hash60_spark_sql(
    expr: str, salt: str | None = None, mode: str | None = None
) -> str:
    """:func:`hash60` as a Spark-SQL string over an arbitrary expression
    (e.g. a higher-order-function lambda variable, where a Column can't
    reach). Parses to the IDENTICAL expression tree as the Column spelling
    — gated by tests/test_hashing_property.py — so call sites may use
    either form interchangeably, including the ``salt`` parameter (same
    ``'salt:' || value`` derivation as :func:`hash60`); the SQL form costs
    one py4j round trip where the Column form costs ~6 (the driver-latency
    motivation)."""
    if mode is not None and mode not in _MODES:
        raise ValueError(f"mode={mode!r}; expected one of {_MODES}")
    if salt is not None:
        expr = f"concat('{salt}:', {expr})"
    if (mode or hash_mode()) == "production":
        return f"(xxhash64(CAST({expr} AS STRING)) & {_MASK60})"
    return (
        f"CAST(conv(substring(md5(CAST({expr} AS STRING)), 1, 15), 16, 10)"
        " AS BIGINT)"
    )


def hash60_sql(expr: str, salt: str | None = None) -> str:
    """The oracle-family hash as DuckDB SQL over an arbitrary expression.

    Always md5-based: oracles exist precisely to replay the oracle family;
    production-mode plans are never differentially compared.
    """
    inner = f"'{salt}:' || {expr}" if salt is not None else expr
    return f"('0x' || substr(md5({inner}), 1, 15))::BIGINT"


def hash60_py(value: str, salt: str | None = None) -> int:
    """The oracle-family hash in plain Python (pandas-UDF code paths and
    driver-side derived constants, e.g. LSH plane seeds)."""
    s = f"{salt}:{value}" if salt is not None else value
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


# --- persisted-index hash-mode pinning ----------------------------------------
#
# An index whose layout derives from hash60 (BM25's term-hash buckets, the
# LSH band-key partitions) is only probeable under the SAME hash family it
# was built with: a probe in the other mode computes different bucket/band
# keys, prunes to the wrong partition directories, and silently returns
# incomplete postings — no error, just missing rows. Builds therefore record
# the active mode in a one-row ``_meta`` sidecar (underscore prefix: hidden
# from partition readers, like ``_stats``/``_centroids``) and probes assert
# it before planning the pruned scan.

def write_hash_mode_meta(spark, index_dir: str) -> None:
    """Record the hash family a persisted index was built under."""
    spark.createDataFrame([(hash_mode(),)], "hash_mode string").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{index_dir}/_meta")


def assert_hash_mode_meta(spark, index_dir: str) -> None:
    """Fail fast if the index was built under a different hash family.

    An index with no ``_meta`` sidecar predates this guard and is accepted
    as-is (every build in this repo now writes one, so the unguarded
    surface only shrinks).
    """
    from pyspark.errors import AnalysisException

    try:
        rows = spark.read.parquet(f"{index_dir}/_meta").collect()
    except AnalysisException:  # pre-guard index: no _meta path recorded
        return
    # Any other failure (corrupt sidecar, transient FS error) must surface —
    # swallowing it would silently disable the very guard this implements.
    built = rows[0].hash_mode if rows else None
    active = hash_mode()
    if built is not None and built != active:
        raise ValueError(
            f"index at {index_dir} was built with {HASH_MODE_ENV}={built!r} "
            f"but is being probed with {active!r}; bucket/band-key pruning "
            "would silently miss postings — rebuild the index or set "
            f"{HASH_MODE_ENV}={built!r}"
        )
