"""Vector similarity search over the ``embeddings`` table.

Extension tier (BASELINE.json north star): approximate-nearest-neighbor over
an ``array<float>`` embedding column.

Three operators, in increasing scale-readiness:

- ``similarity_threshold``   all-pairs cosine >= t (doubles as
                             embedding-cosine near-dup). Exact, quadratic —
                             the verification tool.
- ``similarity_topk``        brute-force top-k for a query set: broadcast the
                             (small) query side, stream the corpus once,
                             per-partition top-k via window. Exact; linear in
                             corpus size, so it scales to 100 TB *per query
                             batch* as long as the query set broadcasts.
- ``similarity_ann_lsh``     random-hyperplane LSH: 16-bit signatures, 4
                             bands x 4 bits, candidates = bucket collisions,
                             exact rerank of candidates only. The discovery
                             tool when the query set is also huge.

Hyperplanes are derived from the deterministic md5 hash (functions/hashing),
so signatures — and therefore candidates — are bit-identical in the DuckDB
oracle. No randomness, no resampling drift across runs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions.hashing import hash60_py
from ..functions.vectors import cosine
from ..tables import load_table

QUERIES = {}
ORACLES = {}

DIM = 64
N_QUERIES = 8  # vec_id < 8 are the query vectors in demo queries
TOP_K = 10
COSINE_THRESHOLD = 0.4
LSH_BITS = 16
LSH_BANDS = 4  # 4 bands x 4 bits


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Deterministic pseudo-random hyperplane component in [-1, 1]:
# (hash60("p:i") mod 2000001 - 1000000) / 1e6 — reproducible in SQL, Python,
# and Spark alike.
def _plane(p: int, i: int) -> float:
    return (hash60_py(f"{p}:{i}") % 2000001 - 1000000) / 1e6


_COS_SQL = (
    "SUM(qe[i]::DOUBLE * ne[i]::DOUBLE)"
    " / (sqrt(SUM(qe[i]::DOUBLE * qe[i]::DOUBLE))"
    " * sqrt(SUM(ne[i]::DOUBLE * ne[i]::DOUBLE)))"
)


@_register(
    "similarity_threshold",
    oracle=f"""
    WITH p AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             a.embedding AS qe, b.embedding AS ne
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    ),
    d AS (
      SELECT vec_a, vec_b, {_COS_SQL} AS c
      FROM p, generate_series(1, {DIM}) g(i)
      GROUP BY vec_a, vec_b
    )
    SELECT vec_a, vec_b, ROUND(c, 6) AS cosine
    FROM d WHERE ROUND(c, 6) >= {COSINE_THRESHOLD}
    """,
)
def similarity_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs cosine >= threshold — embedding-cosine near-dup.

    Exact quadratic pass; at scale this is what you run on LSH candidates,
    not the full corpus. The self-join is a single shuffle-free cartesian
    when one side broadcasts; with AQE the small side does.
    """
    e = load_table(spark, sf_dir, "embeddings")
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    c = F.round(cosine(F.col("ea"), F.col("eb")), 6)
    return pairs.select("vec_a", "vec_b", c.alias("cosine")).filter(
        F.col("cosine") >= COSINE_THRESHOLD
    )


@_register(
    "similarity_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qe
               FROM embeddings WHERE vec_id < {N_QUERIES}),
    p AS (SELECT q.query_id, e.vec_id AS neighbor_id, q.qe, e.embedding AS ne
          FROM q JOIN embeddings e ON e.vec_id != q.query_id),
    d AS (SELECT query_id, neighbor_id, {_COS_SQL} AS c
          FROM p, generate_series(1, {DIM}) g(i)
          GROUP BY query_id, neighbor_id),
    r AS (SELECT query_id, neighbor_id, ROUND(c, 6) AS cosine,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY c DESC, neighbor_id) AS rank
          FROM d)
    SELECT query_id, neighbor_id, cosine, rank FROM r WHERE rank <= {TOP_K}
    """,
)
def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: the exact baseline.

    Query side is tiny -> broadcast; the corpus streams through once with a
    fused zip_with/aggregate dot product (no UDF, stays in codegen). The
    window's per-query top-k shuffles only (query_id, neighbor, cosine)
    tuples. Linear in corpus size; the 100 TB path as long as queries fit in
    a broadcast (use similarity_ann_lsh otherwise).
    """
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    n = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ne"))
    pairs = F.broadcast(q).join(n, F.col("neighbor_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id", "neighbor_id", cosine(F.col("qe"), F.col("ne")).alias("c")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("c").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", F.round("c", 6).alias("cosine"), "rank")
    )


def _planes_values_sql() -> str:
    rows = []
    for p in range(LSH_BITS):
        for i in range(1, DIM + 1):
            rows.append(f"({p}, {i}, {_plane(p, i)!r})")
    return ",\n      ".join(rows)


def _ann_oracle() -> str:
    return f"""
    WITH planes(p, i, w) AS (VALUES
      {_planes_values_sql()}
    ),
    sig AS (
      SELECT e.vec_id, pl.p,
             CASE WHEN SUM(e.embedding[pl.i]::DOUBLE * pl.w) > 0 THEN 1 ELSE 0 END AS bit
      FROM embeddings e JOIN planes pl ON TRUE
      GROUP BY e.vec_id, pl.p
    ),
    chunks AS (
      SELECT vec_id, p // {LSH_BITS // LSH_BANDS} AS band,
             SUM(bit * (1 << (p % {LSH_BITS // LSH_BANDS}))) AS chunk
      FROM sig GROUP BY vec_id, p // {LSH_BITS // LSH_BANDS}
    ),
    cand AS (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM chunks q JOIN chunks c
        ON q.band = c.band AND q.chunk = c.chunk AND q.vec_id != c.vec_id
      WHERE q.vec_id < {N_QUERIES}
    ),
    p2 AS (
      SELECT cand.query_id, cand.neighbor_id, a.embedding AS qe, b.embedding AS ne
      FROM cand JOIN embeddings a ON a.vec_id = cand.query_id
                JOIN embeddings b ON b.vec_id = cand.neighbor_id
    ),
    d AS (SELECT query_id, neighbor_id, {_COS_SQL} AS c
          FROM p2, generate_series(1, {DIM}) g(i)
          GROUP BY query_id, neighbor_id),
    r AS (SELECT query_id, neighbor_id, ROUND(c, 6) AS cosine,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY c DESC, neighbor_id) AS rank
          FROM d)
    SELECT query_id, neighbor_id, cosine, rank FROM r WHERE rank <= {TOP_K}
    """


def _signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, band, chunk): banded LSH signature via JVM-side fold.

    The 16x64 plane matrix is embedded as literals — it broadcasts with the
    plan itself; signature computation is a map-only projection.
    """
    e = load_table(spark, sf_dir, "embeddings")
    bits = []
    for p in range(LSH_BITS):
        plane = F.array(*[F.lit(_plane(p, i)) for i in range(1, DIM + 1)])
        s = F.aggregate(
            F.zip_with(F.col("embedding"), plane, lambda x, w: x.cast("double") * w),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(s > 0, 1).otherwise(0).alias(f"b{p}"))
    sig = e.select("vec_id", *bits)
    r = LSH_BITS // LSH_BANDS
    bands = []
    for band in range(LSH_BANDS):
        chunk = None
        for j in range(r):
            term = F.col(f"b{band * r + j}") * F.lit(1 << j)
            chunk = term if chunk is None else chunk + term
        bands.append(F.struct(F.lit(band).alias("band"), chunk.cast("bigint").alias("chunk")))
    return sig.select(
        "vec_id", F.explode(F.array(*bands)).alias("bc")
    ).select("vec_id", F.col("bc.band").alias("band"), F.col("bc.chunk").alias("chunk"))


@_register("similarity_ann_lsh", oracle=_ann_oracle())
def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via random-hyperplane LSH + exact rerank of candidates.

    Sign-pattern signatures (16 bits from deterministic hyperplanes) are
    banded 4x4; a corpus vector is a candidate iff it shares a band chunk
    with the query. Only candidates get the exact cosine + window rerank, so
    the heavy math runs on a small fraction of the corpus — the scale path
    when both sides are large. Recall vs the exact top-k is asserted in
    tests/test_similarity.py.
    """
    chunks = _signatures(spark, sf_dir)
    q = chunks.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "band", "chunk"
    )
    c = chunks.select(F.col("vec_id").alias("neighbor_id"), "band", "chunk")
    cand = (
        F.broadcast(q)
        .join(c, ["band", "chunk"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    e = load_table(spark, sf_dir, "embeddings")
    qe = e.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"))
    ne = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ne"))
    scored = (
        cand.join(F.broadcast(qe), "query_id")
        .join(ne, "neighbor_id")
        .select("query_id", "neighbor_id", cosine(F.col("qe"), F.col("ne")).alias("c"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("c").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", F.round("c", 6).alias("cosine"), "rank")
    )
