"""Property tests: the deterministic hash agrees across all three engines.

Every dedup/LSH operator's Spark/DuckDB equivalence rests on hash60 being
bit-identical in Spark SQL, DuckDB SQL, and Python (functions/hashing.py).
Hypothesis drives arbitrary unicode through all three implementations; any
divergence (encoding, hex parsing, salt concatenation) fails here long
before it would surface as a flaky oracle mismatch.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pyspark.sql.functions as F

from data_pipeline_python_aws_cdk_spark.functions.hashing import (
    hash60,
    hash60_py,
    hash60_sql,
)

# Printable-ish unicode without surrogates (not encodable) and without NUL
# (C-string boundary in some layers); covers ASCII, accents, CJK, emoji.
TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
    min_size=0,
    max_size=64,
)


@given(values=st.lists(TEXT, min_size=1, max_size=24, unique=True))
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_hash60_spark_duckdb_python_agree(spark, values):
    py = {v: hash60_py(v) for v in values}

    con = duckdb.connect()
    for v in values:
        got = con.execute(f"SELECT {hash60_sql('?')}", [v]).fetchone()[0]
        assert got == py[v], f"duckdb != python for {v!r}"

    df = spark.createDataFrame([(v,) for v in values], "s string")
    spark_res = {r["s"]: r["h"] for r in df.select("s", hash60("s").alias("h")).collect()}
    assert spark_res == py


@given(value=TEXT, salt=st.sampled_from(["w", "h", "band:0", "p:1"]))
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_hash60_salt_agrees(spark, value, salt):
    py = hash60_py(value, salt)
    con = duckdb.connect()
    got = con.execute(f"SELECT {hash60_sql('?', salt)}", [value]).fetchone()[0]
    assert got == py
    df = spark.createDataFrame([(value,)], "s string")
    spark_val = df.select(hash60("s", salt).alias("h")).collect()[0]["h"]
    assert spark_val == py


def test_hash60_range_and_positivity():
    # 60-bit contract: strictly non-negative in a signed 64-bit integer, so
    # shifts/comparisons behave identically across engines.
    for v in ("", "a", "x" * 1000, "é中\U0001f600"):
        h = hash60_py(v)
        assert 0 <= h < (1 << 60)


@pytest.mark.parametrize("bad", [None])
def test_hash60_py_rejects_none(bad):
    with pytest.raises(AttributeError):
        hash60_py(bad)
