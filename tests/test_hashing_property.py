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


def test_production_mode_uses_xxhash64(spark, monkeypatch):
    """Production family: xxhash64-based, 60-bit non-negative, deterministic,
    and selected either per-call or via SPARK_GRAFT_HASH_MODE."""
    from data_pipeline_python_aws_cdk_spark.functions.hashing import (
        HASH_MODE_ENV,
        hash_mode,
    )

    df = spark.createDataFrame([("abc",), ("",), ("é中\U0001f600",)], "s string")
    col = hash60("s", mode="production")
    assert "xxhash64" in col._jc.toString().lower()
    rows = df.select(col.alias("h")).collect()
    assert all(0 <= r["h"] < (1 << 60) for r in rows)
    # deterministic across plans
    rows2 = df.select(hash60("s", mode="production").alias("h")).collect()
    assert [r["h"] for r in rows] == [r["h"] for r in rows2]
    # salt derives a different value
    salted = df.select(hash60("s", salt="w", mode="production").alias("h")).collect()
    assert [r["h"] for r in salted] != [r["h"] for r in rows]

    monkeypatch.setenv(HASH_MODE_ENV, "production")
    assert hash_mode() == "production"
    env_rows = df.select(hash60("s").alias("h")).collect()
    assert [r["h"] for r in env_rows] == [r["h"] for r in rows]
    monkeypatch.setenv(HASH_MODE_ENV, "bogus")
    with pytest.raises(ValueError):
        hash_mode()


def test_dedup_ladder_in_production_mode(spark, tmp_path, monkeypatch):
    """The dedup discovery path works identically under the production hash
    family: planted near-dups are found, and the plan carries xxhash64
    instead of md5 on the signature path."""
    from data_pipeline_python_aws_cdk_spark.functions.hashing import HASH_MODE_ENV
    from data_pipeline_python_aws_cdk_spark.operators import dedup

    monkeypatch.setenv(HASH_MODE_ENV, "production")
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 10
    near = base.replace("gamma", "gamma2", 1)
    far = "one two three four five six seven eight nine ten " * 10
    df = spark.createDataFrame(
        [(1, base, "en", "s", len(base)), (2, near, "en", "s", len(near)),
         (3, far, "en", "s", len(far))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = tmp_path / "docs_prod"
    df.write.parquet(f"{out}/documents.parquet")

    lsh = dedup.dedup_minhash_lsh(spark, str(out))
    assert [(r.doc_a, r.doc_b) for r in lsh.collect()] == [(1, 2)]

    sim = dedup.dedup_simhash(spark, str(out))
    assert (1, 2) in [(r.doc_a, r.doc_b) for r in sim.collect()]

    exact_plan = dedup.dedup_exact(spark, str(out))._jdf.queryExecution().toString()
    assert "xxhash64" in exact_plan and "md5" not in exact_plan


@given(sizes=st.lists(st.integers(min_value=1, max_value=300), min_size=1,
                      max_size=12, unique=True))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_chunking_layout_invariants(spark, tmp_path_factory, sizes):
    """Chunk layout must tile every document: first chunk at token 1,
    consecutive starts exactly one stride apart, the tail reaching the last
    token, every chunk full-size except possibly the tail, and short docs
    yielding exactly one chunk."""
    from data_pipeline_python_aws_cdk_spark.operators.text import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        documents_chunking,
    )

    out = tmp_path_factory.mktemp("chunkprop")
    rows = [
        (n, " ".join(f"t{i}" for i in range(n)), "en", "s", 1) for n in sizes
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    got = {}
    for r in documents_chunking(spark, str(out)).collect():
        got.setdefault(r.doc_id, []).append((r.chunk_id, r.start_tok, r.n_tokens))
    assert set(got) == set(sizes)
    for n, chunks in got.items():
        chunks.sort()
        starts = [s for _, s, _ in chunks]
        assert starts[0] == 1
        assert all(b - a == CHUNK_STRIDE for a, b in zip(starts, starts[1:]))
        # tail reaches the last token; nothing hangs past it
        _, last_start, last_len = chunks[-1]
        if n >= CHUNK_TOKENS:
            assert last_start + last_len - 1 == n
        else:
            assert chunks == [(0, 1, n)]
        # every non-tail chunk is full-size
        assert all(ln == CHUNK_TOKENS for _, _, ln in chunks[:-1])


# Boundary-adversarial doubles for the F.round parity battery: exact 6-dp
# halves (the HALF_UP decision points), their ±1-ulp neighbors (where a
# non-shortest Double.toString rendering could flip the parsed decimal
# across the boundary), and values whose repr carries 17 significant
# digits. math.nextafter generates the ulp neighbors exactly.
def _round6_battery() -> list[float]:
    import math

    vals: list[float] = []
    for mant in (5, 15, 25, 1234565, 9999995):
        for exp in (7, 8, 9):
            for sign in (1.0, -1.0):
                v = sign * (mant / 10.0**exp)
                vals.extend(
                    [v, math.nextafter(v, math.inf), math.nextafter(v, -math.inf)]
                )
    vals.extend([0.1 + 0.2, 1 / 3, 2 / 3, 1e-7, -1e-7, 0.0, 123456.789012345])
    return vals


@given(
    extra=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=0,
        max_size=32,
    )
)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_round6_half_up_matches_f_round(spark, extra):
    """_round6_half_up (driver-side Decimal(repr) quantization) must equal
    F.round(x, 6) (JVM BigDecimal.valueOf + setScale HALF_UP) bit-for-bit.

    This empirically pins the recorded JDK assumption in the
    _round6_half_up docstring: pre-Ryu (JDK < 19) Double.toString may emit
    non-shortest decimal renderings, and a rendering that straddles a 6-dp
    half boundary would make the two paths disagree. The battery feeds the
    exact half points, their ±1-ulp neighbors, and hypothesis-random
    doubles through BOTH paths on the live JVM."""
    from data_pipeline_python_aws_cdk_spark.operators.similarity import (
        _round6_half_up,
    )

    vals = _round6_battery() + extra
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    jvm = [r.r for r in df.select(F.round("v", 6).alias("r")).collect()]
    py = [_round6_half_up(v) for v in vals]
    assert jvm == py, [
        (v, j, p) for v, j, p in zip(vals, jvm, py) if j != p
    ]


def test_hash60_spark_sql_parses_to_identical_tree(spark):
    """hash60_spark_sql (the one-py4j-call SQL spelling used inside
    higher-order-function lambdas) must parse to the IDENTICAL expression
    tree as the hash60 Column spelling, in BOTH hash families — call sites
    rely on interchangeability, and a drift here would silently change
    bucket/band keys."""
    import re

    from data_pipeline_python_aws_cdk_spark.functions.hashing import (
        hash60,
        hash60_spark_sql,
    )

    df = spark.createDataFrame([("a",), ("xyz",), (None,)], "s string")
    canon = lambda p: re.sub(r"#\d+L?", "#x", p)  # noqa: E731
    for mode in ("oracle", "production"):
        col_plan = canon(
            df.select(hash60(F.col("s"), mode=mode).alias("h"))
            ._jdf.queryExecution().optimizedPlan().toString()
        )
        sql_plan = canon(
            df.select(F.expr(hash60_spark_sql("s", mode=mode)).alias("h"))
            ._jdf.queryExecution().optimizedPlan().toString()
        )
        assert col_plan == sql_plan, mode
        # and the values themselves
        a = [r.h for r in df.select(hash60(F.col("s"), mode=mode).alias("h")).collect()]
        b = [r.h for r in df.select(F.expr(hash60_spark_sql("s", mode=mode)).alias("h")).collect()]
        assert a == b, mode
        # salted form: same 'salt:' || value derivation in both spellings
        col_salted = canon(
            df.select(hash60(F.col("s"), salt="k7", mode=mode).alias("h"))
            ._jdf.queryExecution().optimizedPlan().toString()
        )
        sql_salted = canon(
            df.select(F.expr(hash60_spark_sql("s", salt="k7", mode=mode)).alias("h"))
            ._jdf.queryExecution().optimizedPlan().toString()
        )
        assert col_salted == sql_salted, mode
        sa = [r.h for r in df.select(hash60(F.col("s"), salt="k7", mode=mode).alias("h")).collect()]
        sb = [r.h for r in df.select(F.expr(hash60_spark_sql("s", salt="k7", mode=mode)).alias("h")).collect()]
        assert sa == sb, mode
