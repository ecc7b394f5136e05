"""Registry-wide oracle/Spark type-width gate.

CORRECTNESS_r03 went red on three queries whose VALUES matched: the driver's
hash is type-sensitive, DuckDB promotes integer SUMs to HUGEINT and
generate_series to BIGINT, and the local value-comparison harness collapses
Python int widths so it cannot see the drift.  This test closes the class:
every registered oracle's *declared* DuckDB column types (binder output, no
execution) must canonicalize to exactly the Spark DataFrame's analyzed
schema — HUGEINT anywhere in an oracle is an automatic failure.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import SF_SMOKE
from tools.check_types import run


def test_all_oracles_match_spark_types(spark):
    failures = run(SF_SMOKE, spark=spark)
    assert not failures, "oracle/Spark type-width mismatches:\n" + "\n".join(failures)
