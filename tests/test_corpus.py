"""Differential tests for the reference query corpus.

Each corpus builder runs on Spark and its oracle SQL on DuckDB over the same
sf0.001 parquet, compared as order-insensitive value multisets — the same
contract the driver's t2 gate enforces at sf0.01.
"""

from __future__ import annotations

import math

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE


def _normalize(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.9g}"
    if isinstance(v, (list, tuple)):
        return tuple(_normalize(x) for x in v)
    return v


def assert_matches_oracle(spark, duck, name: str, sf_dir: str = SF_SMOKE):
    sdf = entrymod.queries()[name](spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(entrymod.oracle_sql()[name])
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    assert sorted(scols) == sorted(ocols), f"{name}: schema {scols} != {ocols}"
    assert len(srows) == len(orows), f"{name}: rows {len(srows)} != {len(orows)}"
    s_idx = [scols.index(c) for c in sorted(scols)]
    o_idx = [ocols.index(c) for c in sorted(ocols)]
    # key=repr: a total order even when a NULL-bearing column mixes None
    # with str/float values (Python 3 refuses None < str); equality still
    # compares the actual normalized tuples
    smulti = sorted((tuple(_normalize(r[i]) for i in s_idx) for r in srows), key=repr)
    omulti = sorted((tuple(_normalize(r[i]) for i in o_idx) for r in orows), key=repr)
    assert smulti == omulti, f"{name}: value mismatch"


CORPUS_NAMES = sorted(
    set(entrymod.queries()) & set(entrymod.oracle_sql())
)


@pytest.mark.parametrize("name", CORPUS_NAMES)
def test_query_matches_oracle(spark, duck, name):
    assert_matches_oracle(spark, duck, name)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["segment", "user_count"]


def test_every_query_has_runnable_builder(spark):
    for name, fn in entrymod.queries().items():
        df = fn(spark, SF_SMOKE)
        assert df.columns, f"{name} returned no columns"
