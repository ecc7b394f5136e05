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

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from ..functions.hashing import hash60, hash60_py, hash60_sql
from ..functions.vectors import cosine, cosine_arrow
from ..tables import load_table

QUERIES = {}
ORACLES = {}

DIM = 64
N_QUERIES = 8  # vec_id < 8 are the query vectors in demo queries
TOP_K = 10
COSINE_THRESHOLD = 0.4
LSH_BITS = 16
LSH_BANDS = 4  # 4 bands x 4 bits
IVF_NLIST = 16  # centroid count (inverted lists)
IVF_NPROBE = 4  # lists probed per query


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


def _codebook_matrix(rows: list) -> tuple[list[int], "np.ndarray", "np.ndarray"]:
    """Shared codebook prep for the driver-side probe ranking and the
    executor-side assignment — ONE place for the NULL-as-zero-row /
    stacking / norm conventions the two sides must agree on bit-for-bit.
    Returns (ids, C, cn); empty input returns ([], 0x1 zeros, zeros) so
    callers can guard on ids without np.stack throwing."""
    ids = [int(r["centroid_id"]) for r in rows]
    if not ids:
        return [], np.zeros((0, 1)), np.zeros(0)
    dim = next((len(r["ce"]) for r in rows if r["ce"] is not None), 1)
    C = np.stack(
        [
            np.zeros(dim) if r["ce"] is None else np.asarray(r["ce"], dtype=np.float64)
            for r in rows
        ]
    )
    return ids, C, np.linalg.norm(C, axis=1)


def _round6_half_up(v: float) -> float | None:
    """F.round(x, 6) replicated exactly: BigDecimal.valueOf(double) parses
    Double.toString's decimal rendering and setScale(6, HALF_UP) is
    Decimal.quantize(1e-6, ROUND_HALF_UP).

    Recorded assumption (like the ln() 1-ulp note on the BM25 idf):
    Double.toString is shortest-roundtrip — equal to Python's repr — only
    guaranteed by the Ryu rewrite in JDK 19+ (JDK-4511638). Pre-19 JVMs
    (this container runs 17) use the legacy algorithm, which is documented
    to sometimes emit MORE digits than the shortest form; a non-shortest
    rendering that straddles a 6-dp HALF_UP boundary would diverge from
    repr-based quantization. Exposure is bounded empirically, not just on
    paper: tests/test_hashing_property.py::test_round6_half_up_matches_f_round
    drives a boundary-adversarial battery (exact .xxxxxx5 halves, ±1-ulp
    neighbors, hypothesis-random doubles) through BOTH paths on the live
    JVM, so a legacy-toString divergence fails the suite instead of
    surfacing as a probe-list oracle mismatch. NaN (zero-norm cosine) maps
    to None like Arrow does."""
    import decimal
    import math

    if v is None or math.isnan(v):
        return None
    return float(
        decimal.Decimal(repr(v)).quantize(
            decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
        )
    )


def _probe_lists(
    cent_rows: list, query_rows: list, nprobe: int
) -> list[tuple[int, int]]:
    """Driver-side probe selection: per query, the nprobe nearest centroid
    ids — metadata-scale work (|queries| x NLIST cosines) that previously
    spent a whole Spark stage on a 128-row window. Cosines use the exact
    cos_all op order (bit-identical to the distributed path), rounding
    replicates F.round, and ordering is (c6 DESC NULLS LAST, centroid_id)
    — the oracle's ranking to the letter."""
    ids, C, cn = _codebook_matrix(cent_rows)
    if not ids:
        return []
    out: list[tuple[int, int]] = []
    for qr in query_rows:
        qid = int(qr["vec_id"])
        if qr["embedding"] is None:
            ranked = sorted(ids)[:nprobe]
        else:
            x = np.asarray(qr["embedding"], dtype=np.float64)[None, :]
            xn = np.linalg.norm(x, axis=1)
            c6 = []
            for j in range(C.shape[0]):
                num = (x * C[j]).sum(axis=1)
                with np.errstate(invalid="ignore", divide="ignore"):
                    c6.append(_round6_half_up(float(num[0] / (xn[0] * cn[j]))))
            key = [
                ((-c if c is not None else float("inf")), cid)
                for c, cid in zip(c6, ids)
            ]
            ranked = [cid for _, cid in sorted(zip(key, ids))][:nprobe]
        out.extend((qid, cid) for cid in ranked)
    return out


def _seed_codebook_and_queries(e: DataFrame) -> tuple[list, list]:
    """ONE bounded collect feeding both driver-side prologue consumers:
    the seed codebook (vec_id < IVF_NLIST, re-keyed to centroid_id/ce for
    _codebook_matrix) and the query vectors (vec_id < N_QUERIES).

    The two sets are head slices of the same table (N_QUERIES <=
    IVF_NLIST), so collecting them separately pays two serial local jobs —
    each a scheduling quantum — before the main query even plans. Fusing
    them into one filter+collect halves the prologue; at cluster scale the
    single scan also means one round of task launches against the head
    file instead of two."""
    head = sorted(
        e.filter(F.col("vec_id") < max(IVF_NLIST, N_QUERIES))
        .select("vec_id", "embedding")
        .collect(),
        key=lambda r: r["vec_id"],
    )
    cent_rows = [
        {"centroid_id": r["vec_id"], "ce": r["embedding"]}
        for r in head
        if r["vec_id"] < IVF_NLIST
    ]
    query_rows = [r for r in head if r["vec_id"] < N_QUERIES]
    return cent_rows, query_rows


def _cos_all_udf(C, cn):
    """Arrow UDF factory: per input vector, the float64 cosine to EVERY
    codebook row, as one array — the map-only kernel shared by nearest-
    centroid assignment and the silhouette audit (one site for the float
    discipline documented on _assign_nearest_centroid).

    NULL embedding -> all-NaN cosines (NULL after Arrow), which the JVM
    argmax resolves to the lowest centroid — identical to the oracle's
    all-NULL ranking tiebreak. Zero rows stand in for the Nones so
    np.stack cannot throw; 0/0 already yields NaN.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, DoubleType

    @pandas_udf(ArrayType(DoubleType()))
    def cos_all(a: pd.Series) -> pd.Series:
        vals = a.values
        mask = a.isna().values
        if mask.any():
            dim = next((len(v) for v in vals if v is not None), 1)
            vals = [np.zeros(dim) if v is None else v for v in vals]
        x = np.stack(vals).astype(np.float64)
        xn = np.linalg.norm(x, axis=1)
        out = np.empty((x.shape[0], C.shape[0]), dtype=np.float64)
        for j in range(C.shape[0]):
            num = (x * C[j]).sum(axis=1)
            with np.errstate(invalid="ignore", divide="ignore"):
                out[:, j] = num / (xn * cn[j])
        out[mask, :] = np.nan
        return pd.Series(list(out))

    return cos_all


def _assign_nearest_centroid(
    e: DataFrame, cent: DataFrame, cent_rows: list | None = None
) -> DataFrame:
    """Map-ONLY nearest-centroid assignment: e + a ``centroid_id`` column.
    ``cent_rows``: optionally pass the already-collected codebook so a
    caller that also probes driver-side pays the bounded collect once.

    The codebook (bounded: NLIST rows at any corpus size) is collected and
    shipped in the UDF closure; each Arrow batch computes all NLIST cosines
    with one vectorized pass and the argmax never leaves the row. Nothing
    shuffles — the corpus streams through a single ArrowEvalPython stage.
    This replaces both earlier spellings (per-vec row_number window: corpus
    x NLIST shuffle + sort; max_by groupBy: corpus-row exchange) with zero
    exchanges.

    Float discipline: per centroid j the cosine is computed exactly like
    ``cosine_arrow`` — float64 widen, ``(x * C[j]).sum(axis=1)`` (numpy
    pairwise summation along axis 1, the same reduction the pairwise UDF
    runs), norms via ``np.linalg.norm(..., axis=1)`` on 2-D inputs for both
    sides (the 1-D BLAS nrm2 path can differ in the last bit) — so the
    assignment agrees bit-for-bit with the probe-side cosine_arrow ranking
    and, after the shared ROUND(·, 6), with the DuckDB oracle.

    Rounding and argmax run JVM-SIDE on the UDF's raw cosine array: the
    UDF never rounds (numpy's round is half-to-even; ``F.round`` and the
    oracle's ROUND are half-up — a last-bit divergence trap), ``F.round``
    applies the one shared convention, and
    ``array_position(c6s, array_max(c6s))`` implements the oracle's
    ``ORDER BY c6 DESC, centroid_id`` exactly: first occurrence of the
    max = lowest centroid_id on ties.

    Zero-norm semantics: numpy's 0/0 NaN crosses Arrow as NULL — the same
    value DuckDB's 0/0 division and the cosine_arrow probe path produce —
    and both engines sort NULL LAST under DESC, so a null cosine never
    beats a real one; ``array_max`` likewise ignores nulls. When EVERY
    cosine is null (a zero-norm vector against any codebook), both
    engines' tiebreak falls through to the lowest centroid_id, which the
    coalesce pins explicitly.
    """
    rows = (
        cent_rows
        if cent_rows is not None
        else cent.select("centroid_id", "ce").orderBy("centroid_id").collect()
    )
    # Codebook prep is shared with the driver-side probe ranking
    # (_codebook_matrix) — ONE site for the NULL-centroid-as-zero-row
    # convention (norm 0 -> 0/0 = NaN -> NULL after Arrow, exactly the
    # oracle's NULL cosine, which never wins the desc ranking).
    ids, C, cn = _codebook_matrix(rows)
    if not ids:
        # Empty codebook (empty embeddings table): no assignment exists;
        # emit NULL ids on whatever rows e has (typically none).
        return e.withColumn("centroid_id", F.lit(None).cast("bigint"))

    c6s = F.transform(_cos_all_udf(C, cn)(F.col("embedding")), lambda v: F.round(v, 6))
    id_arr = F.array(*[F.lit(i).cast("long") for i in ids])
    # The all-null fallback coalesces the INDEX, not the element: ANSI
    # element_at is (mis)declared non-nullable, so Catalyst folds a
    # coalesce AROUND it away and codegen then returns garbage for a null
    # index. A never-null index sidesteps the whole class.
    pos = F.coalesce(F.array_position(c6s, F.array_max(c6s)), F.lit(1)).cast("int")
    return e.withColumn("centroid_id", F.element_at(id_arr, pos))


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
    c = F.round(cosine_arrow(F.col("ea"), F.col("eb")), 6)
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

    Query side is tiny -> broadcast; the corpus streams through once and
    cosine scoring runs in the Arrow-vectorized pandas UDF (one numpy
    matmul per batch — plan-gated as ArrowEvalPython, never row-at-a-time
    BatchEvalPython; measured faster than the JVM higher-order-function
    fold, which is interpreted per element). The window's per-query top-k
    shuffles only (query_id, neighbor, cosine) tuples. Linear in corpus
    size; the 100 TB path as long as queries fit in a broadcast (use
    similarity_ann_lsh otherwise).
    """
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    n = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ne"))
    pairs = F.broadcast(q).join(n, F.col("neighbor_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id", "neighbor_id", cosine_arrow(F.col("qe"), F.col("ne")).alias("c")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("c").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.round("c", 6).alias("cosine"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def _planes_values_sql() -> str:
    rows = []
    for p in range(LSH_BITS):
        for i in range(1, DIM + 1):
            rows.append(f"({p}, {i}, {_plane(p, i)!r})")
    return ",\n      ".join(rows)


def _planes_values_sql_n(bits: int) -> str:
    rows = []
    for p in range(bits):
        for i in range(1, DIM + 1):
            rows.append(f"({p}, {i}, {_plane(p, i)!r})")
    return ",\n      ".join(rows)


def _chunks_ctes(bits: int = LSH_BITS, bands: int = LSH_BANDS) -> str:
    """Shared oracle CTEs: hyperplane signatures -> banded LSH chunks.

    Used by similarity_ann_lsh and dedup_embedding_cosine (at different
    bits/bands — see _signatures) so each oracle replays the exact Spark
    bucketing."""
    r = bits // bands
    return f"""planes(p, i, w) AS (VALUES
      {_planes_values_sql_n(bits)}
    ),
    sig AS (
      SELECT e.vec_id, pl.p,
             CASE WHEN SUM(e.embedding[pl.i]::DOUBLE * pl.w) > 0 THEN 1 ELSE 0 END AS bit
      FROM embeddings e JOIN planes pl ON TRUE
      GROUP BY e.vec_id, pl.p
    ),
    chunks AS (
      SELECT vec_id, p // {r} AS band,
             SUM(bit * (1 << (p % {r}))) AS chunk
      FROM sig GROUP BY vec_id, p // {r}
    )"""


def _ann_oracle() -> str:
    return f"""
    WITH {_chunks_ctes()},
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


def _signatures(
    spark: SparkSession,
    sf_dir: str,
    n_bits: int = LSH_BITS,
    n_bands: int = LSH_BANDS,
    checkpoint: bool = True,
) -> DataFrame:
    """(vec_id, band, chunk): banded LSH signature via JVM-side fold.

    The bits x 64 plane matrix is embedded as literals — it broadcasts with
    the plan itself; signature computation is a map-only projection. With
    ``checkpoint`` (default) the result (``n_bands`` small rows per vector)
    is localCheckpoint-ed: consumers that join it against an *asymmetric*
    other side (the ANN query-vs-corpus paths) would otherwise re-run the
    dot-product scan per consumer. Symmetric self-join consumers (the
    embedding dedup path) pass ``checkpoint=False`` and force a shuffle
    join instead, so the two identical band-key exchanges canonicalize
    equal and Spark's ReuseExchange serves both sides from ONE Arrow scan
    — no cut-point barrier and no executor-disk materialization.

    Chunk width (bits/bands) sets the bucket count and therefore the
    random-collision rate; callers pick it per workload — few wide buckets
    for query-vs-corpus ANN, many narrow buckets for all-pairs dedup (the
    candidate floor is ~n^2 * bands / 2^(bits/bands)).
    """
    e = load_table(spark, sf_dir, "embeddings")
    # One numpy matmul per Arrow batch computes every bit at once
    # ((batch x DIM) @ (DIM x bits), sign, pack little-endian into a long) —
    # replacing `bits` interpreted higher-order-function folds per row. The
    # plane matrix rides inside the UDF closure, serialized once per task.
    # Float64 matmul vs the oracle's float64 sum: a sign can only disagree
    # where a dot product sits within ~1e-13 of zero — the same summation
    # -order exposure the fold had.
    planes = np.array(
        [[_plane(p, i) for i in range(1, DIM + 1)] for p in range(n_bits)],
        dtype=np.float64,
    ).T  # DIM x bits
    weights = np.power(2.0, np.arange(n_bits)).astype(np.int64)  # bit p -> 2^p

    @pandas_udf(LongType())
    def packed_sig(emb: pd.Series) -> pd.Series:
        # NULL embedding -> all-zero signature: the oracle's CASE WHEN
        # NULL > 0 takes the ELSE 0 branch for every bit, and a zero row
        # reproduces that exactly (0 > 0 is False bitwise) — np.stack
        # would otherwise throw on the None and kill the task.
        vals = emb.values
        if emb.isna().values.any():
            dim = next((len(v) for v in vals if v is not None), 1)
            vals = [np.zeros(dim) if v is None else v for v in vals]
        x = np.stack(vals).astype(np.float64)  # batch x DIM
        bits = (x @ planes) > 0  # batch x n_bits
        return pd.Series((bits * weights).sum(axis=1))

    sig = e.select("vec_id", packed_sig("embedding").alias("sig"))
    r = n_bits // n_bands
    mask = (1 << r) - 1
    bands = [
        F.struct(
            F.lit(band).alias("band"),
            F.shiftright(F.col("sig"), band * r).bitwiseAND(F.lit(mask)).alias("chunk"),
        )
        for band in range(n_bands)
    ]
    out = sig.select(
        "vec_id", F.explode(F.array(*bands)).alias("bc")
    ).select(
        "vec_id", F.col("bc.band").alias("band"), F.col("bc.chunk").alias("chunk")
    )
    return out.localCheckpoint() if checkpoint else out


@_register("similarity_ann_lsh", oracle=_ann_oracle())
def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via random-hyperplane LSH + exact rerank of candidates.

    Sign-pattern signatures (16 bits from deterministic hyperplanes) are
    banded 4x4; a corpus vector is a candidate iff it shares a band chunk
    with the query. Only candidates get the exact cosine + window rerank, so
    the heavy math runs on a small fraction of the corpus — the scale path
    when both sides are large. Recall vs the exact top-k is asserted in
    tests/test_extensions.py.

    No localCheckpoint cut point: the query side's ``vec_id < N_QUERIES``
    filter pushes BELOW the signature UDF to the parquet scan
    (PushedFilters: LessThan(vec_id, 8) — min/max row-group skipping), so
    the broadcast build re-derives signatures for the handful of query
    vectors only, while the corpus-side signature scan still runs exactly
    once. The previous eager checkpoint materialized the corpus-scale
    signature stream (bands x |corpus| rows) to executor disk and paid a
    serial job barrier before the main query — pure overhead once the
    rescan is query-bounded.
    """
    chunks = _signatures(spark, sf_dir, checkpoint=False)
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
    # Broadcast only the query vectors; a full-table broadcast would ship
    # the whole corpus for a join only query ids can survive.
    qe = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    ne = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ne"))
    scored = (
        cand.join(F.broadcast(qe), "query_id")
        .join(ne, "neighbor_id")
        .select("query_id", "neighbor_id", cosine_arrow(F.col("qe"), F.col("ne")).alias("c"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("c").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.round("c", 6).alias("cosine"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def _ivf_oracle(nprobe: int = IVF_NPROBE) -> str:
    cos_assign = _COS_SQL.replace("qe", "e.embedding").replace("ne", "c.ce")
    return f"""
    WITH cent AS (
      SELECT vec_id AS centroid_id, embedding AS ce
      FROM embeddings WHERE vec_id < {IVF_NLIST}
    ),
    ac AS (
      SELECT e.vec_id, c.centroid_id, ROUND({cos_assign}, 6) AS c6
      FROM embeddings e JOIN cent c ON TRUE, generate_series(1, {DIM}) g(i)
      GROUP BY e.vec_id, c.centroid_id
    ),
    ranked AS (
      SELECT vec_id, centroid_id,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY c6 DESC, centroid_id) AS rn
      FROM ac
    ),
    assign AS (SELECT vec_id, centroid_id FROM ranked WHERE rn = 1),
    probes AS (
      SELECT vec_id AS query_id, centroid_id FROM ranked
      WHERE vec_id < {N_QUERIES} AND rn <= {nprobe}
    ),
    cand AS (
      SELECT p.query_id, a.vec_id AS neighbor_id
      FROM probes p JOIN assign a ON a.centroid_id = p.centroid_id
      WHERE a.vec_id != p.query_id
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


@_register("similarity_ann_ivf", oracle=_ivf_oracle())
def similarity_ann_ivf(
    spark: SparkSession, sf_dir: str, nprobe: int = IVF_NPROBE
) -> DataFrame:
    """ANN via an IVF (inverted-file) index: centroid partition + probe.

    The scale path when the corpus is huge and queries keep arriving:

    1. **Index**: every vector is assigned to its nearest centroid
       (IVF_NLIST inverted lists). Centroids are a deterministic seed set
       (the IVF_NLIST lowest vec_ids) so the DuckDB oracle replays the
       exact partition; a production build would k-means-refine them — the
       assignment plan is identical. The 16-row centroid table broadcasts;
       assignment is one corpus scan + a per-vector top-1 window.
    2. **Probe**: each query ranks all centroids (tiny) and probes only the
       IVF_NPROBE nearest lists — skipping (1 - NPROBE/NLIST) = 75% of the
       corpus without touching it.
    3. **Rerank**: exact cosine + windowed top-k on the probed lists only.

    Cosines round to 6 dp before ranking so Spark's and DuckDB's float-sum
    orders agree (same convention as similarity_ann_lsh). At 100 TB the
    assignment output is what you'd persist, bucketed/partitioned by
    centroid_id, turning probes into partition-pruned scans.

    Assignment is MAP-ONLY (``_assign_nearest_centroid``): the bounded
    codebook ships in an Arrow UDF closure, every batch computes all
    NLIST cosines in one vectorized pass, and the rounded argmax resolves
    JVM-side — the corpus crosses NO exchange to learn its list. The two
    earlier spellings both shuffled (row_number: corpus x NLIST rows +
    per-vec sort; max_by groupBy: one corpus-row exchange); this one
    streams scan→assign→bucket-join in a single stage.
    """
    e = load_table(spark, sf_dir, "embeddings")
    cent = e.filter(F.col("vec_id") < IVF_NLIST).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("ce")
    )
    # Probe selection is METADATA-scale (N_QUERIES x NLIST cosines) and
    # runs driver-side — bit-identical math + F.round-faithful HALF_UP
    # rounding (_probe_lists), replacing a whole Spark stage that windowed
    # 128 rows. Codebook + query vectors arrive in ONE fused collect
    # (_seed_codebook_and_queries) instead of two serial pre-jobs.
    cent_rows, query_rows = _seed_codebook_and_queries(e)
    assign = _assign_nearest_centroid(e, cent, cent_rows=cent_rows).select(
        "vec_id", "centroid_id"
    )
    probes = spark.createDataFrame(
        _probe_lists(cent_rows, query_rows, nprobe) or [],
        "query_id long, centroid_id long",
    )
    cand = (
        F.broadcast(probes)
        .join(assign, "centroid_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    # Broadcast only the QUERY vectors (vec_id < N_QUERIES) — a full-table
    # broadcast would ship the whole corpus for rows of which only the
    # query ids can survive the join.
    qe = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    ne = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ne"))
    scored = (
        cand.join(F.broadcast(qe), "query_id")
        .join(ne, "neighbor_id")
        .select("query_id", "neighbor_id", cosine_arrow(F.col("qe"), F.col("ne")).alias("c"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("c").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.round("c", 6).alias("cosine"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


CONTRASTIVE_POS_K = 2  # top ranks kept as positives
CONTRASTIVE_HARD_LO = 6  # hard negatives: close but not closest
CONTRASTIVE_HARD_HI = 10
CONTRASTIVE_RAND_K = 5  # hash-deterministic random negatives per query


def _contrastive_oracle() -> str:
    h = hash60_sql(
        "CAST(query_id AS VARCHAR) || ':' || CAST(vec_id AS VARCHAR)", salt="neg"
    )
    return f"""
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
          FROM d),
    pos AS (SELECT query_id, 'positive' AS kind, rank AS pair_rank,
                   neighbor_id AS cand_id, cosine
            FROM r WHERE rank <= {CONTRASTIVE_POS_K}),
    hard AS (SELECT query_id, 'hard_negative' AS kind,
                    rank - {CONTRASTIVE_HARD_LO} + 1 AS pair_rank,
                    neighbor_id AS cand_id, cosine
             FROM r WHERE rank BETWEEN {CONTRASTIVE_HARD_LO}
                                   AND {CONTRASTIVE_HARD_HI}),
    pool AS (
      SELECT qq.query_id, e.vec_id, ({h}) AS h
      FROM (SELECT DISTINCT query_id FROM r) qq
      JOIN embeddings e ON e.vec_id != qq.query_id
      WHERE NOT EXISTS (SELECT 1 FROM r
                        WHERE r.query_id = qq.query_id
                          AND r.neighbor_id = e.vec_id
                          AND r.rank <= {TOP_K})
    ),
    rnd AS (
      SELECT query_id, 'random_negative' AS kind,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY h, vec_id)
               AS pair_rank,
             vec_id AS cand_id, CAST(NULL AS DOUBLE) AS cosine
      FROM pool
    )
    SELECT * FROM pos
    UNION ALL SELECT * FROM hard
    UNION ALL SELECT * FROM rnd WHERE pair_rank <= {CONTRASTIVE_RAND_K}
    ORDER BY query_id, kind, pair_rank
    """


@_register("contrastive_training_pairs", oracle=_contrastive_oracle())
def contrastive_training_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training pair assembly: per query vector, positives
    (exact top-{CONTRASTIVE_POS_K}), HARD negatives (ranks
    {CONTRASTIVE_HARD_LO}-{CONTRASTIVE_HARD_HI} — semantically close but
    wrong, the examples that actually move an embedding model), and
    hash-deterministic RANDOM negatives ({CONTRASTIVE_RAND_K} per query,
    drawn outside the top-{TOP_K}) — the (anchor, positive, negatives)
    batch builder behind every contrastive embedding run.

    The random tier is sampled by ranking hash60(query:candidate) — the
    engine's standard replayable-sampling move: no RNG state, identical
    draws at any parallelism and in the oracle, and a re-run after an
    incremental corpus append only re-draws where candidates changed.

    Shape: one ranking pass (the brute-force top-k plan: broadcast query
    side, Arrow cosine, per-query window); the random pool reuses that
    ranking as a broadcast anti-join filter and ranks a second per-query
    window over (hash, id) scalars. Corpus text/embeddings stream once;
    at 100 TB the ranking pass swaps for the ANN shortlist and the pool
    for a bucket-sampled candidate stream — same downstream shape.
    """
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    n = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ne"))
    scored = (
        F.broadcast(q)
        .join(n, F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id", cosine_arrow(F.col("qe"), F.col("ne")).alias("c")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("c").desc(), F.col("neighbor_id"))
    ranked = scored.withColumn("rank", F.row_number().over(w)).select(
        "query_id", "neighbor_id", F.round("c", 6).alias("cosine"), "rank"
    )
    pos = ranked.filter(F.col("rank") <= CONTRASTIVE_POS_K).select(
        "query_id",
        F.lit("positive").alias("kind"),
        F.col("rank").cast("bigint").alias("pair_rank"),
        F.col("neighbor_id").alias("cand_id"),
        "cosine",
    )
    hard = ranked.filter(
        F.col("rank").between(CONTRASTIVE_HARD_LO, CONTRASTIVE_HARD_HI)
    ).select(
        "query_id",
        F.lit("hard_negative").alias("kind"),
        (F.col("rank") - CONTRASTIVE_HARD_LO + 1).cast("bigint").alias("pair_rank"),
        F.col("neighbor_id").alias("cand_id"),
        "cosine",
    )
    top = ranked.filter(F.col("rank") <= TOP_K).select(
        "query_id", F.col("neighbor_id").alias("vec_id")
    )
    pool = (
        F.broadcast(q.select("query_id"))
        .join(e.select("vec_id"), F.col("vec_id") != F.col("query_id"))
        .join(F.broadcast(top), ["query_id", "vec_id"], "left_anti")
        .withColumn(
            "h",
            hash60(
                F.concat(
                    F.col("query_id").cast("string"),
                    F.lit(":"),
                    F.col("vec_id").cast("string"),
                ),
                salt="neg",
            ),
        )
    )
    wr = Window.partitionBy("query_id").orderBy("h", "vec_id")
    rnd = (
        pool.withColumn("pr", F.row_number().over(wr))
        .filter(F.col("pr") <= CONTRASTIVE_RAND_K)
        .select(
            "query_id",
            F.lit("random_negative").alias("kind"),
            F.col("pr").cast("bigint").alias("pair_rank"),
            F.col("vec_id").alias("cand_id"),
            F.lit(None).cast("double").alias("cosine"),
        )
    )
    return pos.unionAll(hard).unionAll(rnd).orderBy("query_id", "kind", "pair_rank")


KMEANS_K = 10
KMEANS_SEED = 7


@_register(
    "embedding_kmeans",
    oracle="""
    SELECT COUNT(embedding) AS n_points,
           CAST(LEAST(10, COUNT(DISTINCT embedding)) AS BIGINT) AS n_clusters,
           TRUE AS sse_below_label_partition,
           TRUE AS sse_below_global
    FROM embeddings
    """,
)
def embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib k-means over the embedding corpus, emitted as seed-independent
    quality invariants — the batch-iterative workload class (each iteration
    is one distributed pass: broadcast centroids, assign map-side,
    re-average with a map-side-combined aggregation).

    This is the corpus-structuring step a training pipeline runs before
    IVF indexing (similarity_ann_ivf trains its own centroids the same way)
    or balanced sampling. Cluster IDs and sizes are init-order dependent
    (k-means|| init reads the RDD partitioning), so the registered query
    emits what IS deterministic for any converged run:
    - `n_points` / `n_clusters`: exact corpus size, all k clusters used;
    - `sse_below_label_partition`: within-cluster SSE beats the metadata
      `label` 10-way partition by >=1% (measured margin ~6%; the labels are
      not geometric — within-label spread is ~5x the between-centroid
      distance — so any converged k-means clears this easily while a broken
      assignment cannot);
    - `sse_below_global`: SSE <=95% of the single-cluster SSE.
    A wrong distance/convergence/assignment flips a boolean and fails the
    driver hash. `kmeans_assign` (below) stays the production operator
    surface; tests/test_extensions.py::test_kmeans_recovers_planted_clusters
    pins exact recovery on constructed Gaussian blobs.
    """
    # NULL embeddings can neither seed nor join a cluster (MLlib's fit
    # crashes on null features), and the oracle's COUNT(DISTINCT embedding)
    # ignores NULLs — filter them out before both the clamp and the fit.
    e = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # Clamp k to the DISTINCT vector count: MLlib's k-means|| init crashes
    # outright when k exceeds the candidate-center pool (a tiny or
    # duplicate-heavy corpus), and a duplicate vector can never seed a
    # second center. One map-side-combined distinct count; the oracle
    # mirrors with LEAST(k, COUNT(DISTINCT embedding)).
    n_distinct = e.select("embedding").distinct().count()
    k = min(KMEANS_K, n_distinct)
    if k == 0:
        return spark.createDataFrame(
            [(0, 0, True, True)],
            "n_points long, n_clusters long, "
            "sse_below_label_partition boolean, sse_below_global boolean",
        )
    ef = e.withColumn(
        "features", array_to_vector(F.col("embedding").cast("array<double>"))
    )
    model = KMeans(k=k, seed=KMEANS_SEED, maxIter=20).fit(ef)
    sse = float(model.summary.trainingCost)
    n_clusters = model.transform(ef).select("prediction").distinct().count()

    # Exact SSE of two fixed reference partitions, computed distributed:
    # SSE(partition) = sum ||x||^2 - sum_g n_g * ||mean_g||^2. posexplode
    # keeps the group count at |labels| x dim (640 rows) — dim-bounded, no
    # vector shuffles.
    sq = F.aggregate(
        F.col("embedding"),
        F.lit(0.0),
        lambda a, x: a + x.cast("double") * x.cast("double"),
    )
    total_ssq = e.select(F.sum(sq).alias("ssq")).first().ssq
    ex = e.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v")
    )
    per_label = ex.groupBy("label", "pos").agg(
        F.avg("v").alias("m"), F.count("*").alias("n")
    )
    label_proj = (
        per_label.groupBy("label")
        .agg(F.sum(F.col("m") * F.col("m")).alias("msq"), F.first("n").alias("n"))
        .select(F.sum(F.col("msq") * F.col("n")).alias("x"))
        .first()
        .x
    )
    global_proj = (
        ex.groupBy("pos")
        .agg(F.avg("v").alias("m"), F.count("*").alias("n"))
        .select(F.sum(F.col("m") * F.col("m") * F.col("n")).alias("x"))
        .first()
        .x
    )
    label_sse = total_ssq - label_proj
    global_sse = total_ssq - global_proj
    return e.select(F.count("*").alias("n_points")).select(
        "n_points",
        F.lit(n_clusters).cast("long").alias("n_clusters"),
        F.lit(bool(sse <= 0.99 * label_sse)).alias("sse_below_label_partition"),
        F.lit(bool(sse <= 0.95 * global_sse)).alias("sse_below_global"),
    )


def kmeans_assign(
    embeddings: DataFrame, k: int, seed: int = KMEANS_SEED, max_iter: int = 20
) -> DataFrame:
    """Fit MLlib k-means on an (id, embedding array<float>) frame and return
    it with a ``prediction`` cluster column (JVM-side assignment; no Python
    per-row crossing)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    e = embeddings.withColumn(
        "features", array_to_vector(F.col("embedding").cast("array<double>"))
    )
    model = KMeans(k=k, seed=seed, maxIter=max_iter).fit(e)
    return model.transform(e).drop("features")


# --- embedding diagnostics ---------------------------------------------------


@_register(
    "embedding_norm_stats",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           ROUND(sqrt(list_aggregate(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')), 6)
             AS l2_norm,
           ROUND(list_aggregate(list_transform(embedding,
                 x -> CAST(x AS DOUBLE)), 'sum') / len(embedding), 6)
             AS mean_val,
           ROUND(list_max(list_transform(embedding,
                 x -> abs(CAST(x AS DOUBLE)))), 6) AS max_abs
    FROM embeddings
    ORDER BY vec_id
    """,
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector norm/moment diagnostics: the sanity gate before ANN.

    Unnormalized or degenerate (all-zero, exploding) embeddings silently
    wreck cosine-based dedup and search; this operator surfaces them as a
    map-only projection — dimension, L2 norm, mean component, max |x| per
    vector via JVM higher-order functions (``aggregate``/``transform``
    fold inside codegen; no UDF, no shuffle). At 100 TB this scans at
    parquet-read speed; both engines fold the sum left-to-right over the
    array so the doubles agree bit-for-bit before the 6dp round.
    """
    e = load_table(spark, sf_dir, "embeddings")
    x2 = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    x1 = F.aggregate("embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double"))
    return (
        e.select(
            "vec_id",
            F.size("embedding").alias("dim"),
            F.round(F.sqrt(x2), 6).alias("l2_norm"),
            F.round(x1 / F.size("embedding"), 6).alias("mean_val"),
            F.round(
                F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double")))),
                6,
            ).alias("max_abs"),
        )
        .orderBy("vec_id")
    )


@_register(
    "embedding_drift_report",
    oracle=f"""
    WITH t AS (SELECT (MIN(vec_id) + MAX(vec_id)) // 2 AS thr FROM embeddings),
    v AS (
      SELECT g.i AS dim, e.embedding[g.i]::DOUBLE AS v,
             e.vec_id <= t.thr AS early
      FROM embeddings e CROSS JOIN t, generate_series(1, {DIM}) g(i)
      WHERE e.embedding IS NOT NULL
    ),
    agg AS (
      SELECT dim,
             ROUND(AVG(CASE WHEN early THEN v END), 4) + 0 AS mean_early,
             ROUND(AVG(CASE WHEN NOT early THEN v END), 4) + 0 AS mean_late,
             ROUND(STDDEV_POP(v), 4) + 0 AS std_all
      FROM v GROUP BY dim
    )
    SELECT dim, mean_early, mean_late, std_all,
           ROUND(ABS(mean_early - mean_late) / NULLIF(std_all, 0), 4) + 0
             AS drift_score
    FROM agg ORDER BY dim
    """,
)
def embedding_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift monitor: per-dimension mean shift between the
    EARLIER and LATER corpus halves (split at the midpoint id), in pooled-
    std units — the vector-modality twin of events_drift_report. A new
    crawl slice, an embedder version bump, or a domain-mix change shows up
    here as dimensions whose drift_score jumps, BEFORE it silently skews
    ANN recall and centroid geometry downstream; this is the retrain/
    reindex trigger a production embedding pipeline watches.

    Shape: one conditional aggregation over the posexploded stream — DIM
    groups with map-side combine, corpus-size-independent exchange (the
    embedding_dim_stats geometry). The drift ratio divides the ROUNDED
    aggregates, so both engines compute it from identical doubles; a
    zero-variance dimension yields NULL (try_divide / NULLIF), which IS
    the signal that the dim carries no information at all.
    """
    e = load_table(spark, sf_dir, "embeddings")
    thr = e.agg(
        F.expr("(MIN(vec_id) + MAX(vec_id)) DIV 2").alias("thr")
    )
    v = (
        e.crossJoin(F.broadcast(thr))
        .select(
            (F.col("vec_id") <= F.col("thr")).alias("early"),
            F.posexplode("embedding").alias("pos", "v"),
        )
        .select(
            "early",
            (F.col("pos") + 1).cast("bigint").alias("dim"),
            F.col("v").cast("double").alias("v"),
        )
    )
    agg = v.groupBy("dim").agg(
        (F.round(F.avg(F.when(F.col("early"), F.col("v"))), 4) + F.lit(0.0)).alias(
            "mean_early"
        ),
        (F.round(F.avg(F.when(~F.col("early"), F.col("v"))), 4) + F.lit(0.0)).alias(
            "mean_late"
        ),
        (F.round(F.stddev_pop("v"), 4) + F.lit(0.0)).alias("std_all"),
    )
    return agg.select(
        "dim",
        "mean_early",
        "mean_late",
        "std_all",
        (
            F.round(
                F.try_divide(
                    F.abs(F.col("mean_early") - F.col("mean_late")),
                    F.nullif(F.col("std_all"), F.lit(0.0)),
                ),
                4,
            )
            + F.lit(0.0)
        ).alias("drift_score"),
    ).orderBy("dim")


@_register(
    "embedding_dim_stats",
    oracle=f"""
    SELECT g.i AS dim,
           ROUND(AVG(embedding[g.i]::DOUBLE), 4) + 0 AS mean,
           ROUND(STDDEV_POP(embedding[g.i]::DOUBLE), 4) + 0 AS std,
           ROUND(MIN(embedding[g.i]::DOUBLE), 4) + 0 AS min_v,
           ROUND(MAX(embedding[g.i]::DOUBLE), 4) + 0 AS max_v
    FROM embeddings, generate_series(1, {DIM}) g(i)
    GROUP BY g.i
    ORDER BY g.i
    """,
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension moment profile of the embedding space.

    The feature-diagnostics pass before ANN indexing: a collapsed or
    heavy-tailed dimension (std near 0, or extreme min/max) degrades both
    hyperplane LSH and IVF centroid geometry, and this is the table that
    shows it. posexplode keeps the whole computation JVM-side; the only
    shuffle carries (dim, partial moments) — DIM groups regardless of
    corpus size, with map-side combine doing all the heavy lifting.
    DuckDB's list index is 1-based; +1 on posexplode's 0-based position
    keeps the dim labels identical.
    """
    e = load_table(spark, sf_dir, "embeddings")
    v = e.select(F.posexplode("embedding").alias("pos", "v")).select(
        (F.col("pos") + 1).cast("bigint").alias("dim"),
        F.col("v").cast("double").alias("v"),
    )
    # "+ 0.0" (here and in the oracle) normalizes IEEE negative zero: a mean
    # that rounds to -0.0 in one engine and +0.0 in the other would be a
    # spurious hash mismatch.
    return (
        v.groupBy("dim")
        .agg(
            (F.round(F.avg("v"), 4) + F.lit(0.0)).alias("mean"),
            (F.round(F.stddev_pop("v"), 4) + F.lit(0.0)).alias("std"),
            (F.round(F.min("v"), 4) + F.lit(0.0)).alias("min_v"),
            (F.round(F.max("v"), 4) + F.lit(0.0)).alias("max_v"),
        )
        .orderBy("dim")
    )


def ivf_train_centroids(
    spark: SparkSession, sf_dir: str, k: int = IVF_NLIST, max_iter: int = 20
) -> DataFrame:
    """k-means-trained IVF codebook: MLlib Lloyd iterations (broadcast
    centroids, map-side assignment, map-side-combined re-averaging per
    pass) fit k centers on the corpus; the returned (centroid_id, ce)
    frame drops into ivf_build_index, which persists it WITH the index so
    probes always rank against the codebook the lists were built from.

    Measured deploy guidance (tests pin BOTH regimes): on the synthetic
    near-uniform test corpus, seed codebooks (actual corpus points)
    probe BETTER at fixed nprobe — recall@10 0.90 vs 0.275 — because the
    directional Voronoi cells of k-means mean-directions are badly
    imbalanced when the data has little cluster structure (list sizes
    7-57 vs the seeds' 20-42). On a CLUSTERED corpus (16 planted
    Gaussian blobs with the seed ids concentrated in two of them) the
    trained codebooks win outright — refined recall@10 1.0 vs seed
    0.8375 (IVF) / 0.625 (residual IVF+PQ) — one recovered centroid per
    blob versus true neighbors scattered across noise-ordered seed
    lists. Seed on uniform, trained on clustered; the pluggable-codebook
    contract is how either drops in, and the ANN recall scoreboard is
    how a real corpus reads off which regime it is in.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    e = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    # Clamp k to the distinct vector count (embedding_kmeans' rule): the
    # k-means|| init crashes when k exceeds the candidate-center pool,
    # which a hostile/tiny corpus can trigger.
    k = min(k, e.select("embedding").distinct().count())
    if k < 1:
        return spark.createDataFrame([], "centroid_id long, ce array<double>")
    ef = e.withColumn(
        "features", array_to_vector(F.col("embedding").cast("array<double>"))
    )
    model = KMeans(k=k, seed=KMEANS_SEED, maxIter=max_iter).fit(ef)
    centers = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    return spark.createDataFrame(
        centers, "centroid_id long, ce array<double>"
    )


def ivf_build_index(
    spark: SparkSession,
    sf_dir: str,
    index_dir: str,
    centroids: DataFrame | None = None,
    vectors: DataFrame | None = None,
) -> None:
    """Materialize the IVF inverted lists: the persisted-index half of the
    similarity_ann_ivf docstring's 100 TB story.

    Writes (vec_id, embedding) Hive-partitioned by assigned centroid_id, so
    a later probe that knows its centroid list becomes a partition-pruned
    scan — (1 - NPROBE/NLIST) of the corpus is skipped at the FILE level,
    never read, never decoded. Build cost is the one assignment pass the
    inline query already pays; at scale this is the classic
    write-once/probe-many amortization.

    ``centroids``: optional (centroid_id, ce) codebook — e.g. from
    ivf_train_centroids — defaulting to the deterministic seed set. The
    codebook is persisted under ``{index_dir}/_centroids`` (underscore
    prefix: invisible to readers of the list files), so the probe always
    ranks against the exact codebook the lists were assigned with.

    ``vectors``: optional (vec_id, embedding) frame to index instead of
    the full embeddings table — the base-corpus side of the append
    equality gate (build(base); append(batch) == build(base+batch)).
    """
    from ..functions.indexing import (
        clear_index_complete,
        clear_torn_by_append,
        discard_stale_stages,
        mark_index_complete,
    )

    clear_index_complete(spark, index_dir)
    # A stale torn-by-append breadcrumb (this build repairing a torn
    # append) must not survive into THIS mutation: if the rebuild itself
    # crashes, the artifact may be missing whole lists and the screen's
    # assert_index_screenable must reject it — a breadcrumb may only ever
    # describe an in-flight append (the round-13 advice finding).
    clear_torn_by_append(spark, index_dir)
    # Same discipline for stale leaf _stage dirs (the round-14 advice
    # finding): a committed stage from an older torn compact surviving
    # into a torn BUILD would make index_maintain converge pre-rebuild
    # data and mark complete an artifact missing whole lists.
    discard_stale_stages(spark, index_dir)
    e = vectors if vectors is not None else load_table(spark, sf_dir, "embeddings")
    cent = centroids
    if cent is None:
        cent = e.filter(F.col("vec_id") < IVF_NLIST).select(
            F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("ce")
        )
    # The same float32 cast the probe applies on read, so build-time
    # assignment and probe-time ranking see bit-identical centroid values.
    cent = cent.select(
        "centroid_id", F.col("ce").cast("array<float>").alias("ce")
    ).localCheckpoint(eager=True)
    # Map-only argmax (same discipline as similarity_ann_ivf): each vector
    # learns its list inside one Arrow stage, its embedding riding in-row —
    # the build is scan → assign → partitioned write with ZERO exchanges.
    assign = _assign_nearest_centroid(e, cent).select(
        "vec_id", "embedding", "centroid_id"
    )
    assign.write.mode("overwrite").partitionBy("centroid_id").parquet(index_dir)
    # Codebook rides WITH the lists (written after them: the overwrite
    # above replaces index_dir wholesale). The underscore prefix hides it
    # from readers of the list files.
    cent.write.mode("overwrite").parquet(f"{index_dir}/_centroids")
    mark_index_complete(spark, index_dir)


def ivf_append_index(
    spark: SparkSession, index_dir: str, batch: DataFrame, resume: bool = False
) -> None:
    """Append a batch of (vec_id, embedding) rows to the PERSISTED IVF
    index against its EXISTING ``_centroids`` sidecar: one map-only
    assignment pass over the batch, then a rewrite of only the touched
    inverted lists (existing members minus batch ids plus the batch) —
    idempotent under replay, O(batch + touched lists), never a rebuild.
    See ivfpq_append_index for the full maintenance contract; this is
    the same discipline over full-vector lists instead of PQ codes."""
    from ..functions.indexing import (
        assert_index_complete,
        clear_index_complete,
        mark_index_complete,
        mark_torn_by_append,
    )

    if not resume:
        assert_index_complete(spark, index_dir)
    cent = spark.read.parquet(f"{index_dir}/_centroids").select(
        "centroid_id", F.col("ce").cast("array<float>").alias("ce")
    )
    # breadcrumb FIRST, marker-clear second: at no point is the artifact
    # marker-less without being attributable to this append — the
    # screen's resume gate (assert_index_screenable) accepts exactly
    # this torn state and no other. mark_index_complete below drops the
    # breadcrumb again once the artifact is whole.
    mark_torn_by_append(spark, index_dir)
    clear_index_complete(spark, index_dir)
    b = batch.select("vec_id", "embedding")
    new = _assign_nearest_centroid(b, cent).select(
        "vec_id", "embedding", "centroid_id"
    )
    _merge_into_lists(spark, index_dir, new)
    mark_index_complete(spark, index_dir)


def ivf_probe_indexed(
    spark: SparkSession, index_dir: str, sf_dir: str, nprobe: int = IVF_NPROBE
) -> DataFrame:
    """Probe the persisted IVF index with partition pruning.

    Query-side centroid ranking is computed exactly like the inline
    similarity_ann_ivf; the candidate fetch then filters the index read on
    ``centroid_id IN (probed)``, which Catalyst turns into partition-path
    pruning (gated in tests — PartitionFilters on the scan, only probed
    directories listed). Result set matches the inline query when the
    index was built from the seed codebook; the probe always ranks
    against the codebook persisted with the index (``_centroids``), so a
    k-means-refined index is probed with its own refined centers.

    ``nprobe`` is the recall/cost dial: more probed lists = more index
    partitions read = higher recall (the silhouette audit quantifies WHY:
    boundary vectors land in a neighbor's cell). The pruning contract is
    unchanged at any setting — (1 - nprobe/NLIST) of the index is never
    listed, never read.
    """
    from pyspark.errors import AnalysisException

    from ..functions.indexing import assert_index_complete

    assert_index_complete(spark, index_dir)
    e = load_table(spark, sf_dir, "embeddings")
    try:
        cent = spark.read.parquet(f"{index_dir}/_centroids").select(
            "centroid_id", F.col("ce").cast("array<float>").alias("ce")
        )
    except AnalysisException:  # missing-path only: pre-codebook seed fallback
        # Any OTHER failure (corrupt sidecar, transient FS error) must
        # surface — silently ranking a refined-codebook index against seed
        # centroids would return wrong neighbors with no signal.
        cent = e.filter(F.col("vec_id") < IVF_NLIST).select(
            F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("ce")
        )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    qc = q.join(F.broadcast(cent)).select(
        "query_id",
        "qe",
        "centroid_id",
        F.round(cosine_arrow(F.col("qe"), F.col("ce")), 6).alias("c6"),
    )
    w_q = Window.partitionBy("query_id").orderBy(F.col("c6").desc(), "centroid_id")
    probes = (
        qc.withColumn("rn", F.row_number().over(w_q))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "centroid_id")
    )
    # One driver-side materialization of the (query, centroid) probe table
    # — bounded at N_QUERIES x NPROBE rows. The collected rows both drive
    # the partition filter AND rebuild the broadcast side as a literal
    # DataFrame, so the corpus-vs-centroid scoring lineage executes exactly
    # once (joining `probes` directly would re-run the whole ranking scan
    # inside the broadcast build).
    probe_rows = probes.collect()
    probed_ids = sorted({r.centroid_id for r in probe_rows})
    probes_lit = spark.createDataFrame(probe_rows, probes.schema)
    index = spark.read.parquet(index_dir).filter(
        F.col("centroid_id").isin(probed_ids)
    )
    cand = (
        F.broadcast(probes_lit)
        .join(index, "centroid_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ne"))
    )
    # Rerank joins only the QUERY vectors back in — broadcasting the full
    # embeddings table would ship (and at 100 TB, OOM on) the whole corpus
    # for rows of which only query_id < N_QUERIES can survive the join.
    scored = cand.join(F.broadcast(q), "query_id").select(
        "query_id", "neighbor_id", cosine_arrow(F.col("qe"), F.col("ne")).alias("c")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("c").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.round("c", 6).alias("cosine"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


# --- round 11: streaming ANN ingest screen over the persisted IVF index -----


# The near-dup routing bar. Numerically EQUAL to dedup's
# EMBEDDING_DUP_THRESHOLD (the testdata-calibrated cosine at which a pair
# is a semantic duplicate) — pinned equal by test rather than imported,
# because dedup's module load already imports this module through the
# text/rrf oracle chain (decoration-time import cycle).
ANN_SCREEN_THRESHOLD = 0.45


def ann_screen_against_index(
    spark: SparkSession,
    batch: DataFrame,
    index_dir: str,
    nprobe: int = IVF_NPROBE,
    threshold: float = ANN_SCREEN_THRESHOLD,
    resume: bool = False,
) -> DataFrame:
    """Screen an ingest batch of (vec_id, embedding) rows against the
    PERSISTED IVF index: per batch vector, rank the index's own
    ``_centroids`` codebook, read ONLY the nprobe probed inverted lists
    (partition-path pruning — the ivf_probe_indexed contract), take the
    exact-cosine TOP-1 standing-corpus neighbor, and route
    ``near_dup_candidate`` when its 6-dp cosine clears the threshold
    (default: ANN_SCREEN_THRESHOLD == dedup's EMBEDDING_DUP_THRESHOLD,
    the testdata-calibrated near-dup bar) else ``new`` — the embedding-space member of the
    screen-frame family (LSH bands, substring windows, winnowed
    fingerprints), and the frame both the batch backfill and
    ``run_stream_ann_screen`` call, so stream and backfill cannot
    disagree.

    Screening is against the STANDING CORPUS only: the ENTIRE batch's
    vec_id set is anti-joined out of the candidates, not just each
    query's own id (intra-batch duplicates are the batch's own dedup
    problem — the same semantics as the other screens). The batch-wide
    exclusion is what makes the append-mode stream's verdicts replayable:
    on first run the batch's ids are not in the index, so it excludes
    exactly the self-matches; on a checkpointed REPLAY after the batch
    was appended, it keeps the already-ingested batch members from
    flipping each other 'new' -> 'near_dup_candidate' and rewriting the
    verdict partition differently than the first run (gated by test).

    ``resume=True`` swaps the completion-marker assert for
    assert_index_screenable, which accepts a complete artifact OR one
    torn specifically BY AN APPEND (ivf_append_index's
    ``_torn_by_append`` breadcrumb, dropped before the marker clears and
    removed after the re-mark): torn-by-append lists still hold every
    standing-corpus row (the merge only rewrites
    existing-minus-batch-plus-batch), and batch rows are excluded above,
    so the replayed screen still sees exactly the standing corpus — then
    the convergent re-append repairs and re-marks the artifact. An index
    torn by a crashed BUILD or COMPACT (no breadcrumb) still fails
    loudly even under resume — those tears can lose whole lists, and a
    blanket bypass would screen against a partial corpus silently (the
    round-12 advice finding).

    Scale shape: the batch
    crosses one broadcast-codebook cosine pass and one window; the only
    driver materialization is the DISTINCT probed centroid ids (bounded
    by NLIST at any batch size) feeding the partition filter; the corpus
    contributes only the probed lists.

    Returns (vec_id, verdict, match_id, cosine) — match_id/cosine NULL for
    vectors whose probed lists held no candidates.
    """
    from ..functions.indexing import (
        assert_index_complete,
        assert_index_screenable,
    )

    if resume:
        assert_index_screenable(spark, index_dir)
    else:
        assert_index_complete(spark, index_dir)
    # The screen requires the codebook the lists were assigned with; a
    # missing sidecar is a broken artifact, not a fallback case (the
    # assert_hash_mode_meta discipline) — let the read fail loudly.
    cent = spark.read.parquet(f"{index_dir}/_centroids").select(
        "centroid_id", F.col("ce").cast("array<float>").alias("ce")
    )
    b = batch.select("vec_id", "embedding").localCheckpoint(eager=True)
    q = b.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"))
    qc = q.join(F.broadcast(cent)).select(
        "query_id",
        "centroid_id",
        F.round(cosine_arrow(F.col("qe"), F.col("ce")), 6).alias("c6"),
    )
    w_q = Window.partitionBy("query_id").orderBy(F.col("c6").desc(), "centroid_id")
    probes = (
        qc.withColumn("rn", F.row_number().over(w_q))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "centroid_id")
        .localCheckpoint(eager=True)  # batch x nprobe rows; read twice below
    )
    probed_ids = sorted(
        r.centroid_id for r in probes.select("centroid_id").distinct().collect()
    )
    index = spark.read.parquet(index_dir).filter(
        F.col("centroid_id").isin(probed_ids)
    )
    cand = (
        probes.join(index, "centroid_id")
        # batch-wide exclusion (not merely vec_id != query_id): candidates
        # must come from the standing corpus only, so an appended-then-
        # replayed batch cannot match its own members (docstring contract)
        .join(F.broadcast(b.select("vec_id")), "vec_id", "anti")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("ne"),
        )
    )
    scored = cand.join(F.broadcast(q), "query_id").select(
        "query_id",
        "neighbor_id",
        F.round(cosine_arrow(F.col("qe"), F.col("ne")), 6).alias("c6"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("c6").desc(), "neighbor_id")
    best = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", "neighbor_id", "c6")
    )
    return (
        b.select(F.col("vec_id").cast("bigint").alias("vec_id"))
        .join(best, F.col("vec_id") == F.col("query_id"), "left")
        .select(
            "vec_id",
            F.when(F.col("c6") >= threshold, F.lit("near_dup_candidate"))
            .otherwise(F.lit("new"))
            .alias("verdict"),
            F.col("neighbor_id").cast("bigint").alias("match_id"),
            F.col("c6").alias("cosine"),
        )
        .orderBy("vec_id")
    )


# --- round-3 addition: scalar quantization ---------------------------------

QUANT_LEVELS = 255


@_register(
    "embedding_quantize",
    oracle=f"""
    WITH ex AS (
      SELECT vec_id, u.i AS pos, CAST(embedding[u.i] AS DOUBLE) AS v
      FROM embeddings, LATERAL unnest(generate_series(1, len(embedding))) u(i)
    ),
    st AS (SELECT pos, MIN(v) AS mn, MAX(v) AS mx FROM ex GROUP BY pos),
    codes AS (
      SELECT ex.vec_id,
             CASE WHEN st.mx = st.mn THEN 0
                  ELSE CAST(round((ex.v - st.mn) * {QUANT_LEVELS} / (st.mx - st.mn))
                       AS BIGINT) END AS code
      FROM ex JOIN st ON st.pos = ex.pos
    )
    SELECT vec_id,
           CAST(SUM(code) AS BIGINT) AS code_sum,
           CAST(SUM(CASE WHEN code = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
           CAST(SUM(CASE WHEN code = {QUANT_LEVELS} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_high
    FROM codes GROUP BY vec_id ORDER BY vec_id
    """,
)
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension int8 scalar quantization of the embedding corpus —
    the 4x memory/IO reduction that makes billion-vector ANN serving fit
    in RAM (codes re-rank with full-precision vectors only for the
    shortlist). Emits per-vector code checksums + saturation counts, the
    audit a quantization run reports.

    Shape: the per-dim min/max profile is a DIM-bounded aggregation (64
    groups) over the posexploded corpus — one map-side-combined shuffle;
    the code pass broadcasts those 64 rows back and re-aggregates by
    vec_id. Integer outputs keep the cross-engine comparison exact (the
    double expression feeding round() is identical bit-for-bit in both
    engines, and round-half-up equals round-half-away on non-negatives).
    """
    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v"),
    )
    st = ex.groupBy("pos").agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    code = F.when(F.col("mx") == F.col("mn"), F.lit(0)).otherwise(
        F.round(
            (F.col("v") - F.col("mn")) * QUANT_LEVELS / (F.col("mx") - F.col("mn"))
        ).cast("bigint")
    )
    return (
        ex.join(F.broadcast(st), "pos")
        .select("vec_id", code.alias("code"))
        .groupBy("vec_id")
        .agg(
            F.sum("code").alias("code_sum"),
            F.sum(F.when(F.col("code") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_low"),
            F.sum(F.when(F.col("code") == QUANT_LEVELS, 1).otherwise(0))
            .cast("bigint")
            .alias("n_high"),
        )
        .orderBy("vec_id")
    )


QUANT_SHORTLIST = 2 * TOP_K  # quantized-score shortlist reranked exactly


def _ann_quantized_oracle() -> str:
    cos_assign = _COS_SQL.replace("qe", "e.embedding").replace("ne", "c.ce")
    return f"""
    WITH cent AS (
      SELECT vec_id AS centroid_id, embedding AS ce
      FROM embeddings WHERE vec_id < {IVF_NLIST}
    ),
    ac AS (
      SELECT e.vec_id, c.centroid_id, ROUND({cos_assign}, 6) AS c6
      FROM embeddings e JOIN cent c ON TRUE, generate_series(1, {DIM}) g(i)
      GROUP BY e.vec_id, c.centroid_id
    ),
    ranked AS (
      SELECT vec_id, centroid_id,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY c6 DESC, centroid_id) AS rn
      FROM ac
    ),
    assign AS (SELECT vec_id, centroid_id FROM ranked WHERE rn = 1),
    probes AS (
      SELECT vec_id AS query_id, centroid_id FROM ranked
      WHERE vec_id < {N_QUERIES} AND rn <= {IVF_NPROBE}
    ),
    cand AS (
      SELECT p.query_id, a.vec_id AS neighbor_id
      FROM probes p JOIN assign a ON a.centroid_id = p.centroid_id
      WHERE a.vec_id != p.query_id
    ),
    ex AS (
      SELECT vec_id, u.i AS pos, CAST(embedding[u.i] AS DOUBLE) AS v
      FROM embeddings, LATERAL unnest(generate_series(1, len(embedding))) u(i)
    ),
    st AS (SELECT pos, MIN(v) AS mn, MAX(v) AS mx FROM ex GROUP BY pos),
    codes AS (
      SELECT ex.vec_id, ex.pos,
             CASE WHEN st.mx = st.mn THEN 0
                  ELSE CAST(round((ex.v - st.mn) * {QUANT_LEVELS}
                                  / (st.mx - st.mn)) AS BIGINT)
                       - CAST(round((0 - st.mn) * {QUANT_LEVELS}
                                    / (st.mx - st.mn)) AS BIGINT) END AS code
      FROM ex JOIN st ON st.pos = ex.pos
    ),
    qscore AS (
      SELECT c.query_id, c.neighbor_id, SUM(qa.code * qb.code) AS score
      FROM cand c JOIN codes qa ON qa.vec_id = c.query_id
                  JOIN codes qb ON qb.vec_id = c.neighbor_id
                                AND qb.pos = qa.pos
      GROUP BY 1, 2
    ),
    shortlist AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, neighbor_id) AS srn
        FROM qscore
      ) WHERE srn <= {QUANT_SHORTLIST}
    ),
    p2 AS (
      SELECT s.query_id, s.neighbor_id, a.embedding AS qe, b.embedding AS ne
      FROM shortlist s JOIN embeddings a ON a.vec_id = s.query_id
                       JOIN embeddings b ON b.vec_id = s.neighbor_id
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


@_register("similarity_ann_quantized", oracle=_ann_quantized_oracle())
def similarity_ann_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probe with int8-quantized candidate scoring + exact rerank —
    the memory-tier ANN architecture: inverted lists hold 64-byte code
    vectors (4x smaller than float32, 8x than float64), the probe scores
    candidates with integer dot products, and only a 2k shortlist ever
    touches full-precision embeddings. At billion-vector scale this is
    what keeps the serving index in RAM; the full-precision table stays
    on cheap storage and is read shortlist-sized.

    Scoring arithmetic is all-integer (codes from embedding_quantize's
    per-dim profile), so Spark and DuckDB agree bit-for-bit with no
    float-order exposure until the exact rerank, which follows
    similarity_ann_ivf's rounding convention. Plan shape: the code table
    derives from one posexplode groupBy; candidate scoring is a zip_with
    map over broadcast query codes; the rerank reuses the broadcast
    query-vector pattern.
    """
    e = load_table(spark, sf_dir, "embeddings")
    cent = e.filter(F.col("vec_id") < IVF_NLIST).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("ce")
    )
    # Map-only argmax assignment (similarity_ann_ivf's discipline): the
    # corpus learns its list inside one Arrow stage, no exchange at all;
    # probe lists resolve driver-side from the same fused head collect.
    cent_rows, query_rows = _seed_codebook_and_queries(e)
    assign = _assign_nearest_centroid(e, cent, cent_rows=cent_rows).select(
        "vec_id", "centroid_id"
    )
    probes = spark.createDataFrame(
        _probe_lists(cent_rows, query_rows, IVF_NPROBE) or [],
        "query_id long, centroid_id long",
    )
    cand = (
        F.broadcast(probes)
        .join(assign, "centroid_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    # int8 code vectors: per-dim profile (64 rows, broadcast) -> codes as a
    # pos-ordered array per vector, derived in one groupBy.
    ex = e.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v"),
    )
    st = ex.groupBy("pos").agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    # CENTERED codes: subtracting each dimension's quantized zero point
    # keeps the integer dot product proportional to the true dot product.
    # Raw offset-scaled codes add per-dim bias terms (sum-of-coordinates
    # cross terms) that scramble the shortlist ranking — measured recall@10
    # collapsed to 0.29 vs IVF's 0.90 on identical probes before centering.
    code = F.when(F.col("mx") == F.col("mn"), F.lit(0)).otherwise(
        F.round(
            (F.col("v") - F.col("mn")) * QUANT_LEVELS / (F.col("mx") - F.col("mn"))
        ).cast("long")
        - F.round(
            (F.lit(0.0) - F.col("mn")) * QUANT_LEVELS / (F.col("mx") - F.col("mn"))
        ).cast("long")
    )
    codes = (
        ex.join(F.broadcast(st), "pos")
        .select("vec_id", "pos", code.alias("code"))
        .groupBy("vec_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "code"))),
                lambda x: x["code"],
            ).alias("codes")
        )
    )
    qc = codes.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("codes").alias("qcodes")
    )
    nc = codes.select(
        F.col("vec_id").alias("neighbor_id"), F.col("codes").alias("ncodes")
    )
    score = F.aggregate(
        F.zip_with("qcodes", "ncodes", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = (
        cand.join(F.broadcast(qc), "query_id")
        .join(nc, "neighbor_id")
        .select("query_id", "neighbor_id", score.alias("score"))
    )
    w_s = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), "neighbor_id"
    )
    shortlist = (
        scored.withColumn("srn", F.row_number().over(w_s))
        .filter(F.col("srn") <= QUANT_SHORTLIST)
        .select("query_id", "neighbor_id")
    )
    qe = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    ne = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ne"))
    rer = (
        shortlist.join(F.broadcast(qe), "query_id")
        .join(ne, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine_arrow(F.col("qe"), F.col("ne")).alias("c"),
        )
    )
    w_r = Window.partitionBy("query_id").orderBy(F.col("c").desc(), "neighbor_id")
    return (
        rer.withColumn("rank", F.row_number().over(w_r))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.round("c", 6).alias("cosine"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


# --- distributed Gram / second-moment accumulation (PCA & whitening prep) ----

GRAM_QSCALE = 1 << 20  # quantization scale: floor(v * 2^20 + 0.5)


@_register(
    "embedding_gram_matrix",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, u.i - 1 AS i,
             CAST(FLOOR(CAST(embedding[u.i] AS DOUBLE) * {GRAM_QSCALE} + 0.5)
                  AS BIGINT) AS qv
      FROM embeddings, LATERAL unnest(generate_series(1, len(embedding))) u(i)
      WHERE embedding IS NOT NULL
    )
    SELECT a.i AS i, b.i AS j, CAST(SUM(a.qv * b.qv) AS BIGINT) AS m2
    FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i
    GROUP BY 1, 2
    ORDER BY i, j
    """,
)
def embedding_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper triangle of the corpus second-moment (Gram) matrix sum(x x^T)
    over quantized embeddings — the one corpus-scale pass PCA, whitening,
    and OPQ rotation training all start from.

    Scale design: the ONLY thing that crosses the wire is one DIM x DIM
    partial per Arrow batch. mapInPandas runs a single integer matmul
    (Q^T Q) per batch and emits the 2080 upper-triangle cells; the
    follow-up groupBy(i, j) sums |partitions| partials — a reduce whose
    traffic is independent of corpus size. Compare the naive
    explode-then-self-join spelling (the oracle): that shuffles
    |corpus| x DIM rows and joins them quadratically in DIM.

    Integer-exact on purpose: floats sum in partition order, so a float
    Gram would be partition-count dependent and oracle-divergent at the
    last bit. Quantizing to floor(v * 2^20 + 0.5) (power-of-two scale:
    the multiply is exact; floor(x+0.5) ties identically in numpy and
    DuckDB, unlike rint's half-to-even vs ROUND's half-away) makes every
    partial an exact int64 and addition associative — any partitioning
    yields the identical matrix. Headroom: |q| <= 2^20 for unit-range
    values, so products are < 2^40 and ~2^22 vectors fit before int64
    overflow; a 100 TB corpus drops to scale 2^12 or splits the reduce
    into per-shard spills, same plan shape.
    """
    e = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )

    def gram_partials(batches):
        total = None
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf["embedding"].values).astype(np.float64)
            q = np.floor(m * GRAM_QSCALE + 0.5).astype(np.int64)
            part = q.T @ q
            total = part if total is None else total + part
        if total is not None:
            iu = np.triu_indices(total.shape[0])
            yield pd.DataFrame(
                {"i": iu[0].astype("int64"), "j": iu[1].astype("int64"),
                 "m2": total[iu]}
            )

    return (
        e.select("embedding")
        .mapInPandas(gram_partials, "i long, j long, m2 long")
        .groupBy("i", "j")
        .agg(F.sum("m2").alias("m2"))
        .orderBy("i", "j")
    )


PCA_K = 8


class PCAModel:
    """Fitted PCA basis: driver-held, executor-broadcast at projection time.

    mean (DIM,), components (k, DIM) row-orthonormal, explained_variance
    (k,) descending. Tiny by construction (k x DIM doubles), so shipping it
    inside a pandas_udf closure is a few KB regardless of corpus size.
    """

    def __init__(self, mean, components, explained_variance):
        self.mean = mean
        self.components = components
        self.explained_variance = explained_variance


def pca_fit(spark: SparkSession, sf_dir: str, k: int = PCA_K) -> PCAModel:
    """Fit PCA from two corpus passes, both already scale-shaped: the
    integer-exact Gram accumulation (embedding_gram_matrix — DIM x DIM
    partials only) and a DIM-bounded per-dimension mean. The
    eigendecomposition itself runs driver-side on the DIM x DIM covariance
    — O(DIM^3) independent of corpus size, the standard split for
    tall-skinny PCA (compute-heavy part distributed, tiny solve local).

    Eigenvector SIGN is numerically arbitrary, so the fit is a job surface
    gated by invariant tests (orthonormality, descending variance, planted
    subspace recovery), not a registry query with a value oracle.
    """
    e = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    stats = (
        e.select(F.posexplode("embedding").alias("pos", "v"))
        .groupBy("pos")
        .agg(F.sum(F.col("v").cast("double")).alias("s"), F.count("*").alias("n"))
        .orderBy("pos")
        .collect()
    )
    dim = len(stats)
    n = stats[0].n
    mu = np.array([r.s / r.n for r in stats])
    m2 = np.zeros((dim, dim))
    for r in embedding_gram_matrix(spark, sf_dir).collect():
        val = r.m2 / float(GRAM_QSCALE) ** 2
        m2[r.i, r.j] = val
        m2[r.j, r.i] = val
    cov = m2 / n - np.outer(mu, mu)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    return PCAModel(mu, v[:, order].T.copy(), w[order].copy())


def pca_project(
    spark: SparkSession, sf_dir: str, model: PCAModel, whiten: bool = False
) -> DataFrame:
    """Project every embedding onto the fitted basis: one numpy matmul per
    Arrow batch ((X - mu) @ C^T), map-only — the dimensionality-reduction
    pass feeding cheaper ANN indexes and dedup at 100 TB.

    ``whiten=True`` additionally scales each component by
    1/sqrt(explained_variance), so projected components have unit
    variance — the whitening prep OPQ/ZCA-style pipelines require (the
    Gram-accumulation docstring's third customer). Same single matmul:
    the scaling folds into the projection matrix on the driver.
    """
    mu = model.mean
    comps = model.components
    if whiten:
        import numpy as _np

        scale = 1.0 / _np.sqrt(_np.maximum(model.explained_variance, 1e-12))
        comps = comps * scale[:, None]

    @pandas_udf("array<double>")
    def proj(a: pd.Series) -> pd.Series:
        x = np.stack(a.values).astype(np.float64)
        p = (x - mu) @ comps.T
        return pd.Series(list(p))

    e = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    return e.select("vec_id", proj(F.col("embedding")).alias("proj"))


# --- label-space diagnostics and kNN classification --------------------------


@_register(
    "embedding_label_centroids",
    oracle=f"""
    SELECT label, g.i AS dim, COUNT(*) AS n,
           ROUND(AVG(embedding[g.i]::DOUBLE), 4) + 0 AS centroid
    FROM embeddings, generate_series(1, {DIM}) g(i)
    WHERE embedding IS NOT NULL
    GROUP BY label, g.i
    ORDER BY label, g.i
    """,
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class centroids: the mean embedding of every label, one row per
    (label, dimension) — classifier-head initialization, nearest-centroid
    baselines, and the "are my classes even separable?" audit all read
    this table.

    Same shuffle geometry as embedding_dim_stats: posexplode keeps the
    arithmetic JVM-side and the aggregate carries |labels| x DIM groups
    with map-side combine — corpus-size-independent exchange. The "+ 0.0"
    normalizes IEEE -0.0 cross-engine. Rows with a NULL embedding
    contribute nothing (posexplode drops them; the oracle filters
    explicitly), so n counts a label's VECTORS, not its rows.
    """
    e = load_table(spark, sf_dir, "embeddings")
    v = e.select("label", F.posexplode("embedding").alias("pos", "v")).select(
        "label",
        (F.col("pos") + 1).cast("bigint").alias("dim"),
        F.col("v").cast("double").alias("v"),
    )
    return (
        v.groupBy("label", "dim")
        .agg(
            F.count("*").alias("n"),
            (F.round(F.avg("v"), 4) + F.lit(0.0)).alias("centroid"),
        )
        .orderBy("label", "dim")
    )


def _knn_vote_oracle() -> str:
    return f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qe, label AS true_label
               FROM embeddings WHERE vec_id < {N_QUERIES}),
    p AS (SELECT q.query_id, e.vec_id AS neighbor_id, q.qe, e.embedding AS ne
          FROM q JOIN embeddings e ON e.vec_id != q.query_id),
    d AS (SELECT query_id, neighbor_id, {_COS_SQL} AS c
          FROM p, generate_series(1, {DIM}) g(i)
          GROUP BY query_id, neighbor_id),
    r AS (SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY c DESC, neighbor_id) AS rank
          FROM d),
    votes AS (
      SELECT r.query_id, e.label, COUNT(*) AS votes
      FROM r JOIN embeddings e ON e.vec_id = r.neighbor_id
      WHERE r.rank <= {TOP_K}
      GROUP BY r.query_id, e.label
    ),
    win AS (
      SELECT query_id, label AS predicted_label, votes,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY votes DESC, label) AS vr
      FROM votes
    )
    SELECT w.query_id, q.true_label, w.predicted_label, w.votes,
           w.predicted_label = q.true_label AS correct
    FROM win w JOIN q ON q.query_id = w.query_id
    WHERE w.vr = 1
    ORDER BY w.query_id
    """


@_register("similarity_knn_label_vote", oracle=_knn_vote_oracle())
def similarity_knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN classification by neighbor-label majority vote: each query's
    top-{TOP_K} cosine neighbors vote with their labels; (votes desc,
    label asc) breaks ties deterministically. The standard embedding-space
    sanity probe — if nearest-neighbor labels can't predict a vector's own
    label, the space won't serve retrieval either.

    Shape: the scoring pass IS similarity_topk (broadcast queries, Arrow
    cosine, per-query top-k window); labels attach via an equi-join of the
    K x |queries| neighbor-id rows back to the corpus (narrow rows — at
    100 TB this is the candidates-only join the rerank already does),
    and the vote/argmax windows run on vote-count-sized data.
    """
    e = load_table(spark, sf_dir, "embeddings")
    topk = similarity_topk(spark, sf_dir).select("query_id", "neighbor_id")
    labels = e.select(F.col("vec_id").alias("neighbor_id"), F.col("label"))
    votes = (
        topk.join(labels, "neighbor_id")
        .groupBy("query_id", "label")
        .agg(F.count("*").alias("votes"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("votes").desc(), F.col("label"))
    pred = (
        votes.withColumn("vr", F.row_number().over(w))
        .filter(F.col("vr") == 1)
        .select("query_id", F.col("label").alias("predicted_label"), "votes")
    )
    truth = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("true_label")
    )
    return (
        pred.join(F.broadcast(truth), "query_id")
        .select(
            "query_id",
            "true_label",
            "predicted_label",
            "votes",
            (F.col("predicted_label") == F.col("true_label")).alias("correct"),
        )
        .orderBy("query_id")
    )


def _dispersion_oracle() -> str:
    return f"""
    WITH cent AS (
      SELECT label, g.i AS dim,
             ROUND(AVG(embedding[g.i]::DOUBLE), 6) AS c
      FROM embeddings, generate_series(1, {DIM}) g(i)
      WHERE embedding IS NOT NULL
      GROUP BY label, g.i
    ),
    dist AS (
      SELECT e.label, e.vec_id,
             ROUND(sqrt(SUM((e.embedding[c.dim]::DOUBLE - c.c)
                            * (e.embedding[c.dim]::DOUBLE - c.c))), 6) AS d
      FROM embeddings e JOIN cent c ON e.label = c.label
      WHERE e.embedding IS NOT NULL
      GROUP BY e.label, e.vec_id
    ),
    ranked AS (
      SELECT label, vec_id, d,
             ROW_NUMBER() OVER (PARTITION BY label ORDER BY d DESC, vec_id)
               AS rn
      FROM dist
    )
    SELECT r.label, s.n, s.mean_dist, s.max_dist,
           r.vec_id AS farthest_vec_id
    FROM ranked r
    JOIN (
      SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
             ROUND(AVG(d), 4) + 0 AS mean_dist,
             ROUND(MAX(d), 4) + 0 AS max_dist
      FROM dist GROUP BY label
    ) s ON r.label = s.label
    WHERE r.rn = 1
    ORDER BY r.label
    """


@_register("embedding_label_dispersion", oracle=_dispersion_oracle())
def embedding_label_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class compactness audit: per label, the distance profile of member
    vectors around their own centroid plus the single farthest member —
    the mislabeled-example / class-collapse detector run before training
    a classifier head (a label whose max_dist towers over mean_dist has
    outliers; one whose mean approaches other labels' has collapsed).

    Shape: centroids are the |labels| x DIM map-side-combined aggregate
    (embedding_label_centroids' geometry) broadcast back onto one corpus
    scan; distances are a JVM-side posexplode-join-aggregate, and the
    per-label profile plus argmax window run at |labels| cardinality.
    Centroids round to 6 BEFORE the distance so both engines subtract
    identical values; distances round before aggregation for the same
    reason.
    """
    e = load_table(spark, sf_dir, "embeddings")
    v = e.select(
        "label", "vec_id", F.posexplode("embedding").alias("pos", "x")
    ).select(
        "label",
        "vec_id",
        (F.col("pos") + 1).cast("bigint").alias("dim"),
        F.col("x").cast("double").alias("x"),
    )
    cent = (
        v.groupBy("label", "dim")
        .agg(F.round(F.avg("x"), 6).alias("c"))
    )
    dist = (
        v.join(F.broadcast(cent), ["label", "dim"])
        .groupBy("label", "vec_id")
        .agg(
            F.round(
                F.sqrt(F.sum((F.col("x") - F.col("c")) * (F.col("x") - F.col("c")))),
                6,
            ).alias("d")
        )
    )
    prof = dist.groupBy("label").agg(
        F.count("*").cast("bigint").alias("n"),
        (F.round(F.avg("d"), 4) + F.lit(0.0)).alias("mean_dist"),
        (F.round(F.max("d"), 4) + F.lit(0.0)).alias("max_dist"),
    )
    w = Window.partitionBy("label").orderBy(F.col("d").desc(), "vec_id")
    far = (
        dist.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("label", F.col("vec_id").alias("farthest_vec_id"))
    )
    return (
        prof.join(far, "label")
        .select("label", "n", "mean_dist", "max_dist", "farthest_vec_id")
        .orderBy("label")
    )


# --- product quantization ----------------------------------------------------

PQ_M = 8           # subspaces (DIM/PQ_M dims each)
PQ_K = 16          # codewords per subspace -> 4 bits/sub, 32-bit code total
PQ_SUBDIM = DIM // PQ_M


def _pq_oracle() -> str:
    return f"""
    WITH cb AS (
      SELECT vec_id AS k, embedding AS ce FROM embeddings WHERE vec_id < {PQ_K}
    ),
    d AS (
      SELECT e.vec_id, s.sub, cb.k,
             ROUND(SUM((e.embedding[s.sub * {PQ_SUBDIM} + j.j]::DOUBLE
                        - cb.ce[s.sub * {PQ_SUBDIM} + j.j]::DOUBLE)
                       * (e.embedding[s.sub * {PQ_SUBDIM} + j.j]::DOUBLE
                          - cb.ce[s.sub * {PQ_SUBDIM} + j.j]::DOUBLE)), 6)
               AS d6
      FROM embeddings e
      CROSS JOIN generate_series(0, {PQ_M - 1}) s(sub)
      CROSS JOIN cb
      CROSS JOIN generate_series(1, {PQ_SUBDIM}) j(j)
      GROUP BY e.vec_id, s.sub, cb.k
    ),
    best AS (
      SELECT vec_id, sub, k, d6,
             ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY d6, k) AS rn
      FROM d
    )
    SELECT vec_id,
           CAST(SUM(k * (CAST(1 AS BIGINT) << (4 * sub))) AS BIGINT) AS pq_code,
           CAST(SUM(CAST(ROUND(d6 * 1000000) AS BIGINT)) AS BIGINT)
             AS recon_err_micro
    FROM best WHERE rn = 1
    GROUP BY vec_id
    ORDER BY vec_id
    """


@_register("embedding_pq_codes", oracle=_pq_oracle())
def embedding_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization: each vector compresses to {PQ_M} x 4-bit
    codeword ids (one 32-bit code for a 64-dim float vector — 64x smaller
    than float32, the billion-vector-in-RAM encoding IVF-PQ serving
    stacks use), plus the squared reconstruction error the code ladder
    monitors (int8 scalar quantization -> PQ is the standard
    memory/recall trade).

    Codebooks are deterministic seed subvectors (the PQ_K lowest vec_ids,
    same convention as the IVF centroid set) so the oracle replays every
    assignment; a production build k-means-refines each subspace codebook
    and only this table's contents change, not the plan. Shape: the
    128-row codebook broadcasts; per (vector, subspace) the argmin over
    16 codewords is a JVM-side slice + zip_with fold (no UDF), the
    min-struct aggregation is map-side-combinable, and packing is one
    groupBy(vec_id) at {PQ_M} rows per vector. Distances round to 6
    BEFORE the argmin so both engines pick identical codewords.
    """
    e = load_table(spark, sf_dir, "embeddings")
    cb = (
        e.filter(F.col("vec_id") < PQ_K)
        .select(F.col("vec_id").alias("k"), F.col("embedding").alias("ce"))
    )
    return _pq_codes_core(e, cb)


def _pq_codes_core(vectors: DataFrame, cb: DataFrame) -> DataFrame:
    """(vec_id, pq_code, recon_err_micro) for arbitrary (vec_id, embedding)
    rows against an EXPLICIT (k, ce) codebook — the assignment kernel
    ``embedding_pq_codes`` runs over the corpus with the seed codebook and
    the index APPEND path runs over an ingest batch with the codebook read
    back from the ``_codebook`` sidecar.  One kernel, identical 6-dp
    rounding and min-(d6, k) tie rule, so a batch's codes can never drift
    from the codes a full rebuild would assign."""
    subs = vectors.select(
        "vec_id", "embedding", F.explode(F.expr(f"sequence(0, {PQ_M - 1})")).alias("sub")
    )
    pairs = subs.join(F.broadcast(cb))
    sq = F.expr(
        f"aggregate(zip_with("
        f" slice(embedding, sub * {PQ_SUBDIM} + 1, {PQ_SUBDIM}),"
        f" slice(ce, sub * {PQ_SUBDIM} + 1, {PQ_SUBDIM}),"
        f" (a, b) -> (CAST(a AS DOUBLE) - CAST(b AS DOUBLE))"
        f"        * (CAST(a AS DOUBLE) - CAST(b AS DOUBLE))),"
        f" CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
    )
    d = pairs.select("vec_id", "sub", "k", F.round(sq, 6).alias("d6"))
    # Ordering key coalesces NULL distances (NULL vector or NULL codebook
    # entry) to +inf: Spark's struct-min sorts NULL FIRST, the oracle's
    # ORDER BY d6 sorts it LAST — +inf reproduces nulls-last exactly, and
    # the raw d6 rides along for the (possibly NULL) error sum.
    best = d.groupBy("vec_id", "sub").agg(
        F.min(
            F.struct(
                F.coalesce(F.col("d6"), F.lit(float("inf"))).alias("ord"),
                F.col("k"),
                F.col("d6"),
            )
        ).alias("b")
    )
    return (
        best.select(
            "vec_id",
            "sub",
            F.col("b.k").alias("k"),
            F.col("b.d6").alias("d6"),
        )
        .groupBy("vec_id")
        .agg(
            F.sum(
                F.expr("k * shiftleft(CAST(1 AS BIGINT), CAST(4 * sub AS INT))")
            ).cast("bigint").alias("pq_code"),
            # integer micro-units: the 6-dp distances become exact BIGINTs
            # before summation, so no float sum-order/rounding boundary can
            # flip the last digit cross-engine
            F.sum(F.round(F.col("d6") * 1_000_000).cast("bigint"))
            .cast("bigint")
            .alias("recon_err_micro"),
        )
        .orderBy("vec_id")
    )


PQ_SHORTLIST = 50  # ADC-scored candidates kept per query for exact rerank


def _pq_adc_oracle(codes_where: str = "") -> str:
    """``codes_where``: optional predicate on the CODE-TABLE side of the
    ADC join (the deleted-row oracle restricts candidates to the
    surviving corpus; queries and the codebook are untouched — deletion
    never changes what the remaining codes mean)."""
    return f"""
    WITH cb AS (
      SELECT vec_id AS k, embedding AS ce FROM embeddings WHERE vec_id < {PQ_K}
    ),
    d AS (
      SELECT e.vec_id, s.sub, cb.k,
             CAST(ROUND(ROUND(SUM(
               (e.embedding[s.sub * {PQ_SUBDIM} + j.j]::DOUBLE
                - cb.ce[s.sub * {PQ_SUBDIM} + j.j]::DOUBLE)
               * (e.embedding[s.sub * {PQ_SUBDIM} + j.j]::DOUBLE
                  - cb.ce[s.sub * {PQ_SUBDIM} + j.j]::DOUBLE)), 6)
               * 1000000) AS BIGINT) AS dmic
      FROM embeddings e
      CROSS JOIN generate_series(0, {PQ_M - 1}) s(sub)
      CROSS JOIN cb
      CROSS JOIN generate_series(1, {PQ_SUBDIM}) j(j)
      GROUP BY e.vec_id, s.sub, cb.k
    ),
    best AS (
      SELECT vec_id, sub, k,
             ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                ORDER BY dmic, k) AS rn
      FROM d
    ),
    codes AS (SELECT vec_id, sub, k FROM best WHERE rn = 1),
    adc AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             SUM(t.dmic) AS adc_micro
      FROM (SELECT DISTINCT vec_id FROM embeddings
            WHERE vec_id < {N_QUERIES}) q
      JOIN codes c ON c.vec_id != q.vec_id {codes_where}
      JOIN d t ON t.vec_id = q.vec_id AND t.sub = c.sub AND t.k = c.k
      GROUP BY q.vec_id, c.vec_id
    ),
    short AS (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY adc_micro, neighbor_id) AS srn
      FROM adc
    ),
    p2 AS (
      SELECT s.query_id, s.neighbor_id, a.embedding AS qe, b.embedding AS ne
      FROM short s JOIN embeddings a ON a.vec_id = s.query_id
                   JOIN embeddings b ON b.vec_id = s.neighbor_id
      WHERE s.srn <= {PQ_SHORTLIST}
    ),
    ex AS (SELECT query_id, neighbor_id, {_COS_SQL} AS c
           FROM p2, generate_series(1, {DIM}) g(i)
           GROUP BY query_id, neighbor_id),
    r AS (SELECT query_id, neighbor_id, ROUND(c, 6) AS cosine,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY c DESC, neighbor_id) AS rank
          FROM ex)
    SELECT query_id, neighbor_id, cosine, rank FROM r WHERE rank <= {TOP_K}
    """


@_register("similarity_ann_pq_adc", oracle=_pq_adc_oracle())
def similarity_ann_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN over PQ codes with asymmetric distance computation: each query
    precomputes a {PQ_M} x {PQ_K} lookup table of exact
    query-subvector-to-codeword distances; a neighbor's approximate
    distance is then just {PQ_M} table lookups keyed by its code nibbles
    — the memory-resident scan that serves billion-vector corpora from
    32-bit codes. The ADC shortlist of {PQ_SHORTLIST} reranks exactly.

    Shape: codes come from embedding_pq_codes' plan (broadcast codebook,
    no UDF); the per-query table is |queries| x 128 rows and broadcasts;
    the ADC join touches (neighbor, sub) nibble rows — at 100 TB this is
    the sequential integer scan PQ exists for, with NO float vectors read
    until the {PQ_SHORTLIST}-row rerank. Distances ride as exact integer
    micro-units end to end, so table build, lookup sums, and shortlist
    boundaries are bit-identical cross-engine.
    """
    e = load_table(spark, sf_dir, "embeddings")
    cb = (
        e.filter(F.col("vec_id") < PQ_K)
        .select(F.col("vec_id").alias("k"), F.col("embedding").alias("ce"))
    )
    sq_micro = F.round(
        F.round(
            F.expr(
                f"aggregate(zip_with("
                f" slice(embedding, sub * {PQ_SUBDIM} + 1, {PQ_SUBDIM}),"
                f" slice(ce, sub * {PQ_SUBDIM} + 1, {PQ_SUBDIM}),"
                f" (a, b) -> (CAST(a AS DOUBLE) - CAST(b AS DOUBLE))"
                f"        * (CAST(a AS DOUBLE) - CAST(b AS DOUBLE))),"
                f" CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
            ),
            6,
        )
        * 1_000_000
    ).cast("bigint")
    subs = e.select(
        "vec_id", "embedding",
        F.explode(F.expr(f"sequence(0, {PQ_M - 1})")).alias("sub"),
    )
    dist = subs.join(F.broadcast(cb)).select(
        "vec_id", "sub", "k", sq_micro.alias("dmic")
    )
    codes = dist.groupBy("vec_id", "sub").agg(
        F.min(F.struct("dmic", "k")).alias("b")
    ).select(
        F.col("vec_id").alias("neighbor_id"), "sub", F.col("b.k").alias("k")
    )
    qtable = dist.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "sub", "k", "dmic"
    )
    adc = (
        codes.join(F.broadcast(qtable), ["sub", "k"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("dmic").alias("adc_micro"))
    )
    ws = Window.partitionBy("query_id").orderBy("adc_micro", "neighbor_id")
    short = (
        adc.withColumn("srn", F.row_number().over(ws))
        .filter(F.col("srn") <= PQ_SHORTLIST)
        .select("query_id", "neighbor_id")
    )
    qe = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    ne = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ne"))
    scored = (
        short.join(F.broadcast(qe), "query_id")
        .join(ne, "neighbor_id")
        .select(
            "query_id", "neighbor_id", cosine_arrow(F.col("qe"), F.col("ne")).alias("c")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("c").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.round("c", 6).alias("cosine"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def _ivfpq_oracle(src: str = "embeddings", prelude: str = "") -> str:
    """The IVF+PQ ranking twin. ``src``: the corpus CTE/table every
    vector-side reference reads (the deleted-row query points it at a
    base CTE injected via ``prelude``, so assignment, codes, candidates,
    and rerank all derive from the surviving corpus exactly as the
    deleted artifact must)."""
    cos_assign = _COS_SQL.replace("qe", "e.embedding").replace("ne", "c.ce")
    return f"""
    WITH {prelude}icent AS (
      SELECT vec_id AS centroid_id, embedding AS ce
      FROM {src} WHERE vec_id < {IVF_NLIST}
    ),
    iac AS (
      SELECT e.vec_id, c.centroid_id, ROUND({cos_assign}, 6) AS c6
      FROM {src} e JOIN icent c ON TRUE, generate_series(1, {DIM}) g(i)
      GROUP BY e.vec_id, c.centroid_id
    ),
    iranked AS (
      SELECT vec_id, centroid_id,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY c6 DESC, centroid_id) AS rn
      FROM iac
    ),
    iassign AS (SELECT vec_id, centroid_id FROM iranked WHERE rn = 1),
    iprobes AS (
      SELECT vec_id AS query_id, centroid_id FROM iranked
      WHERE vec_id < {N_QUERIES} AND rn <= {IVF_NPROBE}
    ),
    icand AS (
      SELECT p.query_id, a.vec_id AS neighbor_id
      FROM iprobes p JOIN iassign a ON a.centroid_id = p.centroid_id
      WHERE a.vec_id != p.query_id
    ),
    cb AS (
      SELECT vec_id AS k, embedding AS ce FROM {src} WHERE vec_id < {PQ_K}
    ),
    d AS (
      SELECT e.vec_id, s.sub, cb.k,
             CAST(ROUND(ROUND(SUM(
               (e.embedding[s.sub * {PQ_SUBDIM} + j.j]::DOUBLE
                - cb.ce[s.sub * {PQ_SUBDIM} + j.j]::DOUBLE)
               * (e.embedding[s.sub * {PQ_SUBDIM} + j.j]::DOUBLE
                  - cb.ce[s.sub * {PQ_SUBDIM} + j.j]::DOUBLE)), 6)
               * 1000000) AS BIGINT) AS dmic
      FROM {src} e
      CROSS JOIN generate_series(0, {PQ_M - 1}) s(sub)
      CROSS JOIN cb
      CROSS JOIN generate_series(1, {PQ_SUBDIM}) j(j)
      GROUP BY e.vec_id, s.sub, cb.k
    ),
    best AS (
      SELECT vec_id, sub, k,
             ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                ORDER BY dmic, k) AS rn
      FROM d
    ),
    codes AS (SELECT vec_id, sub, k FROM best WHERE rn = 1),
    adc AS (
      SELECT ic.query_id, ic.neighbor_id, SUM(t.dmic) AS adc_micro
      FROM icand ic
      JOIN codes c ON c.vec_id = ic.neighbor_id
      JOIN d t ON t.vec_id = ic.query_id AND t.sub = c.sub AND t.k = c.k
      GROUP BY ic.query_id, ic.neighbor_id
    ),
    short AS (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY adc_micro, neighbor_id) AS srn
      FROM adc
    ),
    p2 AS (
      SELECT s.query_id, s.neighbor_id, a.embedding AS qe, b.embedding AS ne
      FROM short s JOIN {src} a ON a.vec_id = s.query_id
                   JOIN {src} b ON b.vec_id = s.neighbor_id
      WHERE s.srn <= {PQ_SHORTLIST}
    ),
    ex AS (SELECT query_id, neighbor_id, {_COS_SQL} AS c
           FROM p2, generate_series(1, {DIM}) g(i)
           GROUP BY query_id, neighbor_id),
    r AS (SELECT query_id, neighbor_id, ROUND(c, 6) AS cosine,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY c DESC, neighbor_id) AS rank
          FROM ex)
    SELECT query_id, neighbor_id, cosine, rank FROM r WHERE rank <= {TOP_K}
    """


CB_BASE = IVF_NLIST  # residual-codebook seeds: vec_ids [CB_BASE, CB_BASE+PQ_K)


def _res_sq_sql(vec: str, cvec: str) -> str:
    """Residual-space squared subdistance in micro-units, as shared SQL:
    sum over the subspace of ((v - v_centroid) - (b - b_centroid))^2,
    rounded to 6dp then scaled — the per-(row, sub, codeword) kernel both
    the corpus-code CTE and the query-table CTE replay verbatim. ``vec``/
    ``cvec``: the row vector and ITS centroid vector (assigned for corpus
    rows, probed for query rows); the codebook residual is always
    cb.bv - cb.bcv."""
    idx = f"s.sub * {PQ_SUBDIM} + j.j"
    t = (
        f"(({vec}[{idx}]::DOUBLE - {cvec}[{idx}]::DOUBLE)"
        f" - (cb.bv[{idx}]::DOUBLE - cb.bcv[{idx}]::DOUBLE))"
    )
    return f"CAST(ROUND(ROUND(SUM({t} * {t}), 6) * 1000000) AS BIGINT)"


def _ivfpq_res_oracle() -> str:
    cos_assign = _COS_SQL.replace("qe", "e.embedding").replace("ne", "c.ce")
    return f"""
    WITH icent AS (
      SELECT vec_id AS centroid_id, embedding AS ce
      FROM embeddings WHERE vec_id < {IVF_NLIST}
    ),
    iac AS (
      SELECT e.vec_id, c.centroid_id, ROUND({cos_assign}, 6) AS c6
      FROM embeddings e JOIN icent c ON TRUE, generate_series(1, {DIM}) g(i)
      GROUP BY e.vec_id, c.centroid_id
    ),
    iranked AS (
      SELECT vec_id, centroid_id,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY c6 DESC, centroid_id) AS rn
      FROM iac
    ),
    iassign AS (SELECT vec_id, centroid_id FROM iranked WHERE rn = 1),
    iprobes AS (
      SELECT vec_id AS query_id, centroid_id FROM iranked
      WHERE vec_id < {N_QUERIES} AND rn <= {IVF_NPROBE}
    ),
    icand AS (
      SELECT p.query_id, p.centroid_id, a.vec_id AS neighbor_id
      FROM iprobes p JOIN iassign a ON a.centroid_id = p.centroid_id
      WHERE a.vec_id != p.query_id
    ),
    cb AS (
      SELECT sv.vec_id - {CB_BASE} AS k, sv.embedding AS bv,
             cc.embedding AS bcv
      FROM embeddings sv
      JOIN iassign sa ON sa.vec_id = sv.vec_id
      JOIN embeddings cc ON cc.vec_id = sa.centroid_id
      WHERE sv.vec_id >= {CB_BASE} AND sv.vec_id < {CB_BASE + PQ_K}
    ),
    d AS (
      SELECT e.vec_id, s.sub, cb.k,
             {_res_sq_sql('e.embedding', 'ca.embedding')} AS dmic
      FROM embeddings e
      JOIN iassign ia ON ia.vec_id = e.vec_id
      JOIN embeddings ca ON ca.vec_id = ia.centroid_id
      CROSS JOIN generate_series(0, {PQ_M - 1}) s(sub)
      CROSS JOIN cb
      CROSS JOIN generate_series(1, {PQ_SUBDIM}) j(j)
      GROUP BY e.vec_id, s.sub, cb.k
    ),
    best AS (
      SELECT vec_id, sub, k,
             ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                ORDER BY dmic, k) AS rn
      FROM d
    ),
    codes AS (SELECT vec_id, sub, k FROM best WHERE rn = 1),
    qd AS (
      SELECT p.query_id, p.centroid_id, s.sub, cb.k,
             {_res_sq_sql('q.embedding', 'cp.embedding')} AS dmic
      FROM iprobes p
      JOIN embeddings q ON q.vec_id = p.query_id
      JOIN embeddings cp ON cp.vec_id = p.centroid_id
      CROSS JOIN generate_series(0, {PQ_M - 1}) s(sub)
      CROSS JOIN cb
      CROSS JOIN generate_series(1, {PQ_SUBDIM}) j(j)
      GROUP BY p.query_id, p.centroid_id, s.sub, cb.k
    ),
    adc AS (
      SELECT ic.query_id, ic.neighbor_id, SUM(t.dmic) AS adc_micro
      FROM icand ic
      JOIN codes c ON c.vec_id = ic.neighbor_id
      JOIN qd t ON t.query_id = ic.query_id
               AND t.centroid_id = ic.centroid_id
               AND t.sub = c.sub AND t.k = c.k
      GROUP BY ic.query_id, ic.neighbor_id
    ),
    short AS (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY adc_micro, neighbor_id) AS srn
      FROM adc
    ),
    p2 AS (
      SELECT s.query_id, s.neighbor_id, a.embedding AS qe, b.embedding AS ne
      FROM short s JOIN embeddings a ON a.vec_id = s.query_id
                   JOIN embeddings b ON b.vec_id = s.neighbor_id
      WHERE s.srn <= {PQ_SHORTLIST}
    ),
    ex AS (SELECT query_id, neighbor_id, {_COS_SQL} AS c
           FROM p2, generate_series(1, {DIM}) g(i)
           GROUP BY query_id, neighbor_id),
    r AS (SELECT query_id, neighbor_id, ROUND(c, 6) AS cosine,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY c DESC, neighbor_id) AS rank
          FROM ex)
    SELECT query_id, neighbor_id, cosine, rank FROM r WHERE rank <= {TOP_K}
    """


def _recall_oracle() -> str:
    topk = ORACLES["similarity_topk"]
    methods = {
        "ann_lsh": _ann_oracle(),
        "ann_ivf": _ivf_oracle(),
        "ann_ivf_nprobe3": _ivf_oracle(3),
        "ann_ivfpq": _ivfpq_oracle(),
        "ann_ivfpq_res": _ivfpq_res_oracle(),
        "ann_quantized": _ann_quantized_oracle(),
        "ann_pq_adc": _pq_adc_oracle(),
    }
    sel = "\nUNION ALL\n".join(
        f"""SELECT '{name}' AS method, e.query_id,
               CAST(COUNT(a.neighbor_id) AS DOUBLE) / COUNT(*) AS r
        FROM ({topk}) e LEFT JOIN ({sql}) a
          ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
        GROUP BY e.query_id"""
        for name, sql in methods.items()
    )
    return f"""
    SELECT method, ROUND(AVG(r), 6) AS recall_at_{TOP_K},
           CAST(COUNT(*) AS BIGINT) AS queries
    FROM ({sel})
    GROUP BY method
    ORDER BY method
    """


@_register("similarity_ann_recall_report", oracle=_recall_oracle())
def similarity_ann_recall_report(
    spark: SparkSession, sf_dir: str, ivfpq_index_dir: str | None = None
) -> DataFrame:
    """The ANN quality scoreboard: recall@{TOP_K} of every approximate
    method (hyperplane LSH, IVF probing, IVF+PQ serving composition,
    int8 quantized-rerank, PQ-ADC) against the exact brute-force top-k,
    averaged over the query set — the one table an operator reads before
    choosing an index type, and the regression alarm that catches a
    silently mis-tuned bucket/probe/codebook parameter (recall collapses
    long before results look obviously wrong).

    ``ivfpq_index_dir``: when given, an ``ann_ivfpq_indexed`` row is
    appended — the SAME composition probed from the persisted IVF+PQ
    index (ivfpq_build_index) instead of computed inline; the indexed
    probe is result-equal to the inline query by test, so this row
    asserts the serving artifact's recall in the same table that graded
    the inline plan. The registered query omits it (no index on disk in
    the differential harness); the oracle covers the inline rows.

    Shape: each method's candidate generation runs its own already-gated
    plan; the comparison is a per-query left join of two {TOP_K}-row
    sets followed by a |methods|-row rollup — evaluation cost is the sum
    of the methods' costs, the joins are negligible. At 100 TB you run
    this on a sampled query panel, which is exactly what the fixed
    query set is.
    """
    exact = similarity_topk(spark, sf_dir).select("query_id", "neighbor_id")
    methods = {
        "ann_lsh": similarity_ann_lsh,
        "ann_ivf": similarity_ann_ivf,
        "ann_ivf_nprobe3": lambda s, d: similarity_ann_ivf(s, d, nprobe=3),
        "ann_ivfpq": similarity_ann_ivfpq,
        "ann_ivfpq_res": similarity_ann_ivfpq_residual,
        "ann_quantized": similarity_ann_quantized,
        "ann_pq_adc": similarity_ann_pq_adc,
    }
    if ivfpq_index_dir is not None:
        methods["ann_ivfpq_indexed"] = (
            lambda s, d: ivfpq_probe_indexed(s, ivfpq_index_dir, d)
        )
    per = None
    for name, fn in methods.items():
        hit = _recall_hits(exact, fn(spark, sf_dir), name)
        per = hit if per is None else per.unionByName(hit)
    return _recall_rollup(per)


def _recall_hits(exact: DataFrame, approx: DataFrame, name: str) -> DataFrame:
    """Per-query recall rows of one approximate method against the exact
    top-k — the comparison kernel shared by the seed-codebook scoreboard
    and the refined-codebook scoreboard, so the two tables can never
    drift in their recall arithmetic."""
    a = approx.select("query_id", F.col("neighbor_id").alias("a_neighbor"))
    return (
        exact.join(
            a,
            (exact.query_id == a.query_id)
            & (exact.neighbor_id == a.a_neighbor),
            "left",
        )
        .select(
            exact.query_id.alias("qid"),
            F.col("a_neighbor").isNotNull().cast("double").alias("hit"),
        )
        .groupBy("qid")
        .agg(F.avg("hit").alias("r"))
        .select(F.lit(name).alias("method"), "r")
    )


def _recall_rollup(per: DataFrame) -> DataFrame:
    return (
        per.groupBy("method")
        .agg(
            F.round(F.avg("r"), 6).alias(f"recall_at_{TOP_K}"),
            F.count("*").cast("bigint").alias("queries"),
        )
        .orderBy("method")
    )


@_register("similarity_ann_recall_refined")  # rows-only: k-means codebooks
def similarity_ann_recall_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REFINED-codebook side of the ANN scoreboard: recall@{TOP_K} of
    the persisted IVF and residual-IVF+PQ indexes built from
    k-means-trained centroids (ivf_train_centroids through the pluggable-
    codebook contract), measured with the same recall kernel as
    similarity_ann_recall_report — the standing, regression-visible form
    of the seed-vs-trained deployment decision.  On this near-uniform
    synthetic corpus the SEED codebooks win (directional Voronoi cells of
    k-means mean-directions are badly imbalanced without cluster
    structure — measured 0.90 seed vs 0.275 refined at fixed nprobe,
    pinned by test); on clustered embeddings the refined rows overtake
    (measured 1.0 refined vs 0.8375/0.625 seed on the planted 16-blob
    corpus, pinned by test), and THIS table is where a real corpus
    reads that off.

    No oracle by design: MLlib's Lloyd iterations are data-dependent
    iterative training, not SQL-expressible — the driver records the
    rows-only check; the recall ARITHMETIC is oracle-verified via the
    seed scoreboard, which shares the kernel.

    Shape: one k-means fit (map-side-combined Lloyd passes), two index
    builds into a temp dir (each the gated build plan), two partition-
    pruned probes, and the bounded recall joins.  The residual row is
    emitted only when the corpus can seed a residual codebook (ids
    [{CB_BASE}, {CB_BASE}+{PQ_K}) present) — a tiny corpus yields the
    IVF row alone.
    """
    import shutil
    import tempfile

    cent = ivf_train_centroids(spark, sf_dir).localCheckpoint(eager=True)
    if not cent.take(1):
        return spark.createDataFrame(
            [], f"method string, recall_at_{TOP_K} double, queries bigint"
        )
    e = load_table(spark, sf_dir, "embeddings")
    exact = similarity_topk(spark, sf_dir).select("query_id", "neighbor_id")
    n_seeds = e.filter(
        (F.col("vec_id") >= CB_BASE) & (F.col("vec_id") < CB_BASE + PQ_K)
    ).count()
    tmp = tempfile.mkdtemp(prefix="ann_refined_")
    try:
        ivf_build_index(spark, sf_dir, f"{tmp}/ivf", centroids=cent)
        per = _recall_hits(
            exact, ivf_probe_indexed(spark, f"{tmp}/ivf", sf_dir), "ann_ivf_refined"
        )
        if n_seeds == PQ_K:
            ivfpq_residual_build_index(spark, sf_dir, f"{tmp}/res", centroids=cent)
            per = per.unionByName(
                _recall_hits(
                    exact,
                    ivfpq_residual_probe_indexed(spark, f"{tmp}/res", sf_dir),
                    "ann_ivfpq_res_refined",
                )
            )
        return _recall_rollup(per).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


IVF_NPROBE_SWEEP = (1, 2, 4, 8)


def _ivf_sweep_oracle() -> str:
    topk = ORACLES["similarity_topk"]
    sel = "\nUNION ALL\n".join(
        f"""SELECT {np} AS nprobe, e.query_id,
               CAST(COUNT(a.neighbor_id) AS DOUBLE) / COUNT(*) AS r,
               COUNT(a.neighbor_id) AS hits
        FROM ({topk}) e LEFT JOIN ({_ivf_oracle(np)}) a
          ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
        GROUP BY e.query_id"""
        for np in IVF_NPROBE_SWEEP
    )
    return f"""
    SELECT CAST(nprobe AS BIGINT) AS nprobe,
           ROUND(AVG(r), 6) AS recall_at_{TOP_K},
           CAST(SUM(hits) AS BIGINT) AS true_positives,
           CAST(COUNT(*) AS BIGINT) AS queries
    FROM ({sel})
    GROUP BY nprobe
    ORDER BY nprobe
    """


@_register("similarity_ann_ivf_nprobe_sweep", oracle=_ivf_sweep_oracle())
def similarity_ann_ivf_nprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multi-probe recall curve: recall@{TOP_K} of IVF probing at
    nprobe in {IVF_NPROBE_SWEEP}, against the exact brute-force top-k —
    the table that SETS nprobe. The simplified-silhouette audit predicts
    the lift qualitatively (boundary vectors with s<0.25 sit in cells
    whose second-nearest centroid holds their true neighbors; probing
    that second cell recovers them); this measures it, per corpus, as a
    monotone recall-vs-cost curve. Read with embedding_silhouette: a
    corpus with few boundary vectors saturates at nprobe=1 and the extra
    probes are wasted IO; one with many keeps climbing.

    Shape: each sweep point runs the gated inline IVF plan (map-only
    assignment, bounded probe table, candidate-only rerank) — the
    assignment pass re-executes per point in this inline form; at 100 TB
    you build the persisted index ONCE (ivf_build_index) and sweep
    nprobe over ivf_probe_indexed, where each point is a partition-pruned
    read of nprobe/NLIST of the index and the sweep shares one build.
    The comparison joins are {TOP_K}-row-per-query; the rollup is
    |sweep|-bounded.
    """
    exact = similarity_topk(spark, sf_dir).select("query_id", "neighbor_id")
    per = None
    for np_ in IVF_NPROBE_SWEEP:
        approx = similarity_ann_ivf(spark, sf_dir, nprobe=np_).select(
            "query_id", F.col("neighbor_id").alias("a_neighbor")
        )
        hit = (
            exact.join(
                approx,
                (exact.query_id == approx.query_id)
                & (exact.neighbor_id == approx.a_neighbor),
                "left",
            )
            .select(
                exact.query_id.alias("qid"),
                F.col("a_neighbor").isNotNull().cast("double").alias("hit"),
            )
            .groupBy("qid")
            .agg(F.avg("hit").alias("r"), F.sum("hit").alias("hits"))
            .select(F.lit(np_).cast("bigint").alias("nprobe"), "r", "hits")
        )
        per = hit if per is None else per.unionByName(hit)
    return _nprobe_sweep_rollup(per)


def _nprobe_sweep_rollup(per: DataFrame) -> DataFrame:
    """Shared sweep tail (per-point per-query hit rows -> the curve), so
    the inline and indexed sweeps cannot drift in their rollup."""
    return (
        per.groupBy("nprobe")
        .agg(
            F.round(F.avg("r"), 6).alias(f"recall_at_{TOP_K}"),
            F.sum("hits").cast("bigint").alias("true_positives"),
            F.count("*").cast("bigint").alias("queries"),
        )
        .orderBy("nprobe")
    )


def ivf_nprobe_sweep_indexed(
    spark: SparkSession, index_dir: str, sf_dir: str
) -> DataFrame:
    """The nprobe recall curve over the PERSISTED IVF index — the exact
    plan the inline sweep's docstring prescribes for 100 TB, executable:
    the assignment pass is paid ONCE at ivf_build_index, and each sweep
    point is a partition-pruned read of nprobe/NLIST of the index
    (ivf_probe_indexed, gated), so sweeping the dial costs probes, not
    rebuilds. Result-equal to the inline sweep when the index was built
    from the seed codebook (pinned by test via the shared rollup tail).
    """
    exact = similarity_topk(spark, sf_dir).select("query_id", "neighbor_id")
    per = None
    for np_ in IVF_NPROBE_SWEEP:
        approx = ivf_probe_indexed(spark, index_dir, sf_dir, nprobe=np_).select(
            "query_id", F.col("neighbor_id").alias("a_neighbor")
        )
        hit = (
            exact.join(
                approx,
                (exact.query_id == approx.query_id)
                & (exact.neighbor_id == approx.a_neighbor),
                "left",
            )
            .select(
                exact.query_id.alias("qid"),
                F.col("a_neighbor").isNotNull().cast("double").alias("hit"),
            )
            .groupBy("qid")
            .agg(F.avg("hit").alias("r"), F.sum("hit").alias("hits"))
            .select(F.lit(np_).cast("bigint").alias("nprobe"), "r", "hits")
        )
        per = hit if per is None else per.unionByName(hit)
    return _nprobe_sweep_rollup(per)


@_register(
    "embedding_duplicate_vectors",
    oracle="""
    SELECT MIN(vec_id) AS keep_vec_id,
           CAST(COUNT(*) AS BIGINT) AS copies,
           CAST(COUNT(DISTINCT label) AS BIGINT) AS labels
    FROM embeddings
    GROUP BY embedding
    HAVING COUNT(*) > 1
    ORDER BY keep_vec_id
    """,
)
def embedding_duplicate_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate embeddings: vectors that are bit-identical across
    rows — the vector-side mirror of exact text dedup (an embedding
    pipeline re-run over duplicated content, or a collapsed encoder,
    shows up here first), with the label spread per group flagging
    identical vectors carrying CONTRADICTORY labels (a training-data
    poison the scalar audits can't see).

    Shape: one groupBy directly on the array column (Spark hashes the
    array bytes — no serialization to string needed), map-side combined;
    survivors follow the ladder's canonical min-id rule. At 100 TB the
    group key is the 256-byte vector — the fingerprint upgrade is
    hashing it first (xxhash64 over the bytes), same plan.
    """
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.groupBy("embedding")
        .agg(
            F.min("vec_id").alias("keep_vec_id"),
            F.count("*").cast("bigint").alias("copies"),
            F.count_distinct("label").cast("bigint").alias("labels"),
        )
        .filter(F.col("copies") > 1)
        .select("keep_vec_id", "copies", "labels")
        .orderBy("keep_vec_id")
    )


def pq_build_index(
    spark: SparkSession,
    sf_dir: str,
    index_dir: str,
    vectors: DataFrame | None = None,
) -> None:
    """Materialize the PQ code table: one (vec_id, pq_code) row per corpus
    vector — 12 bytes each — plus the subspace codebook under
    ``_codebook`` (same carries-its-own-codebook contract as the IVF
    index). Unlike IVF/LSH there is nothing to partition-prune: the
    whole point of PQ serving is that the FULL code table is small
    enough to scan per query batch (64x under the float vectors), so
    the index is written compact and probes read all of it.

    ``vectors``: optional (vec_id, embedding) frame to index instead of
    the full embeddings table — the base-corpus side of the append
    equality gate (build(base); append(batch) == build(base+batch)).
    The codebook stays the CORPUS seed set (``sf_dir``'s PQ_K lowest
    vec_ids) regardless, so base and incremental artifacts code against
    identical codewords.
    """
    from ..functions.indexing import (
        clear_index_complete,
        discard_stale_stages,
        mark_index_complete,
    )

    clear_index_complete(spark, index_dir)
    # stale-stage discipline at build start — see indexing.discard_stale_stages
    discard_stale_stages(spark, index_dir)
    e = load_table(spark, sf_dir, "embeddings")
    cb = e.filter(F.col("vec_id") < PQ_K).select(
        F.col("vec_id").alias("k"), F.col("embedding").alias("ce")
    )
    if vectors is None:
        codes = embedding_pq_codes(spark, sf_dir).select("vec_id", "pq_code")
    else:
        codes = _pq_codes_core(
            vectors.select("vec_id", "embedding"), cb
        ).select("vec_id", "pq_code")
    codes.write.mode("overwrite").parquet(index_dir)
    cb.write.mode("overwrite").parquet(f"{index_dir}/_codebook")
    mark_index_complete(spark, index_dir)


def pq_append_index(
    spark: SparkSession, index_dir: str, batch: DataFrame, resume: bool = False
) -> None:
    """Append an ingest batch of (vec_id, embedding) rows to the PERSISTED
    PQ code table WITHOUT recoding the corpus: the batch is PQ-coded
    against the FROZEN ``_codebook`` sidecar (the FAISS ``add()``
    contract — one bounded codebook broadcast join over the batch, the
    shared ``_pq_codes_core`` kernel, so appended codes are exactly what
    a rebuild would assign, gated by test), then merged as
    existing-minus-batch-ids plus the batch's codes.

    The artifact is UNPARTITIONED (the whole point of PQ serving is
    scanning the compact full table), so there are no touched-lists
    economics to exploit: the merge rewrites the table. That is still
    O(corpus x 12 bytes) — the code table at a billion vectors is ~12 GB,
    the size class :func:`maintenance.compact` rewrites routinely — and
    the rewrite goes through the staged swap protocol
    (``staged_table_replace``): a plain overwrite would delete the old
    file set before the new one is durable, so a crash mid-write could
    lose the table with nothing left to converge from.  ``resume=True``
    first completes any committed-but-unswapped stage, then re-merges —
    convergent at every crash point, idempotent under replay.
    """
    from ..functions.indexing import (
        assert_index_complete,
        clear_index_complete,
        finish_staged_table_swap,
        mark_index_complete,
        staged_table_replace,
    )

    if not resume:
        assert_index_complete(spark, index_dir)
    else:
        finish_staged_table_swap(spark, index_dir)
    cb = spark.read.parquet(f"{index_dir}/_codebook").select(
        "k", F.col("ce").cast("array<float>").alias("ce")
    )
    b = batch.select("vec_id", "embedding")
    new_codes = _pq_codes_core(b, cb).select("vec_id", "pq_code")
    merged = (
        spark.read.parquet(index_dir)
        .join(F.broadcast(b.select("vec_id")), "vec_id", "left_anti")
        .unionByName(new_codes)
    )
    clear_index_complete(spark, index_dir)
    staged_table_replace(spark, index_dir, merged)
    mark_index_complete(spark, index_dir)


def pq_delete_index(
    spark: SparkSession, index_dir: str, ids: DataFrame, resume: bool = False
) -> int:
    """Delete rows BY ID from the persisted PQ code table — append's
    inverse, the right-to-be-forgotten op for the unpartitioned kind.
    Codes are a pure per-id function of the frozen ``_codebook`` (which
    deletion never changes), so the delete is one anti-join and a staged
    full-table rewrite (``pq_append_index``'s swap protocol and
    economics). Result-equal to rebuilding without the ids (gated),
    idempotent (absent ids rewrite nothing), convergent under
    ``resume=True`` — including the tail crash where the swap finished
    but the marker was never restored, which re-marks instead of
    early-returning (the inverted_lists_delete discipline).

    Returns the number of code rows removed.
    """
    from ..functions.indexing import (
        assert_index_complete,
        clear_index_complete,
        finish_staged_table_swap,
        mark_index_complete,
        staged_table_replace,
    )

    if not resume:
        assert_index_complete(spark, index_dir)
    else:
        finish_staged_table_swap(spark, index_dir)
    idset = ids.select("vec_id").distinct().localCheckpoint(eager=True)
    existing = spark.read.parquet(index_dir)
    removed = existing.join(F.broadcast(idset), "vec_id", "semi").count()
    if removed == 0:  # ids absent: the table is already correct
        if resume:
            mark_index_complete(spark, index_dir)
        return 0
    remaining = existing.join(F.broadcast(idset), "vec_id", "left_anti")
    clear_index_complete(spark, index_dir)
    staged_table_replace(spark, index_dir, remaining)
    mark_index_complete(spark, index_dir)
    return int(removed)


def pq_probe_indexed(
    spark: SparkSession, index_dir: str, sf_dir: str
) -> DataFrame:
    """ADC search against the PERSISTED code table: the query batch builds
    its distance lookup tables against the codebook stored with the
    index, scores every stored 32-bit code with eight nibble lookups,
    and exactly reranks the shortlist — result-equal to the inline
    similarity_ann_pq_adc (gated by test) at O(code-table scan) probe
    cost with zero corpus-vector reads outside the rerank.
    """
    from ..functions.indexing import assert_index_complete

    assert_index_complete(spark, index_dir)
    e = load_table(spark, sf_dir, "embeddings")
    cb = spark.read.parquet(f"{index_dir}/_codebook").select(
        "k", F.col("ce").cast("array<float>").alias("ce")
    )
    sq_micro = F.round(
        F.round(
            F.expr(
                f"aggregate(zip_with("
                f" slice(embedding, sub * {PQ_SUBDIM} + 1, {PQ_SUBDIM}),"
                f" slice(ce, sub * {PQ_SUBDIM} + 1, {PQ_SUBDIM}),"
                f" (a, b) -> (CAST(a AS DOUBLE) - CAST(b AS DOUBLE))"
                f"        * (CAST(a AS DOUBLE) - CAST(b AS DOUBLE))),"
                f" CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
            ),
            6,
        )
        * 1_000_000
    ).cast("bigint")
    qsubs = (
        e.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            "embedding",
            F.explode(F.expr(f"sequence(0, {PQ_M - 1})")).alias("sub"),
        )
    )
    qtable = qsubs.join(F.broadcast(cb)).select(
        "query_id", "sub", "k", sq_micro.alias("dmic")
    )
    codes = spark.read.parquet(index_dir).select(
        F.col("vec_id").alias("neighbor_id"),
        "pq_code",
        F.explode(F.expr(f"sequence(0, {PQ_M - 1})")).alias("sub"),
    ).select(
        "neighbor_id",
        "sub",
        F.expr("CAST(shiftright(pq_code, 4 * sub) & 15 AS BIGINT)").alias("k"),
    )
    adc = (
        codes.join(F.broadcast(qtable), ["sub", "k"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("dmic").alias("adc_micro"))
    )
    ws = Window.partitionBy("query_id").orderBy("adc_micro", "neighbor_id")
    short = (
        adc.withColumn("srn", F.row_number().over(ws))
        .filter(F.col("srn") <= PQ_SHORTLIST)
        .select("query_id", "neighbor_id")
    )
    qe = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    ne = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ne"))
    scored = (
        short.join(F.broadcast(qe), "query_id")
        .join(ne, "neighbor_id")
        .select(
            "query_id", "neighbor_id", cosine_arrow(F.col("qe"), F.col("ne")).alias("c")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("c").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.round("c", 6).alias("cosine"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


# --- matryoshka (truncated-dimension) recall report ----------------------------

MRL_BUDGETS = (8, 16, 32, 64)  # prefix-dimension budgets; last = full DIM
# The recall baseline is the dim_budget == DIM slice; if either constant
# drifts, `base` is empty and every recall_at_k silently becomes NULL in
# BOTH engines — enforce the invariant loudly at import time.
assert MRL_BUDGETS[-1] == DIM, "MRL_BUDGETS must end at the full dimension"


def _matryoshka_oracle() -> str:
    per_budget = []
    for b in MRL_BUDGETS:
        per_budget.append(f"""
      SELECT {b} AS dim_budget, a.vec_id AS query_id, b.vec_id AS neighbor_id,
             (SELECT SUM(a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)
                     / (sqrt(SUM(a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE))
                        * sqrt(SUM(b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)))
              FROM generate_series(1, {b}) g(i)) AS c
      FROM embeddings a JOIN embeddings b ON b.vec_id != a.vec_id
      WHERE a.vec_id < {N_QUERIES}""")
    scored = "\nUNION ALL\n".join(per_budget)
    return f"""
    WITH scored AS ({scored}),
    ranked AS (
      SELECT dim_budget, query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY dim_budget, query_id
                                ORDER BY c DESC NULLS LAST, neighbor_id) AS rank
      FROM scored
    ),
    top AS (SELECT * FROM ranked WHERE rank <= {TOP_K}),
    base AS (SELECT query_id, neighbor_id FROM top WHERE dim_budget = {DIM}),
    hits AS (
      SELECT t.dim_budget,
             COUNT(b.neighbor_id) AS n_hits,
             COUNT(DISTINCT t.query_id) AS n_queries
      FROM top t LEFT JOIN base b
        ON b.query_id = t.query_id AND b.neighbor_id = t.neighbor_id
      GROUP BY t.dim_budget
    ),
    basek AS (SELECT CAST(COUNT(*) AS BIGINT) AS total_base FROM base)
    SELECT CAST(h.dim_budget AS BIGINT) AS dim_budget,
           CAST(h.n_queries AS BIGINT) AS n_queries,
           CAST(h.n_hits AS BIGINT) AS n_hits,
           CASE WHEN bk.total_base = 0 THEN NULL
                ELSE ROUND(h.n_hits / CAST(bk.total_base AS DOUBLE), 6)
           END AS recall_at_k
    FROM hits h CROSS JOIN basek bk
    ORDER BY dim_budget
    """


@_register("embedding_matryoshka_recall", oracle=_matryoshka_oracle())
def embedding_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation report: top-{TOP_K} retrieval recall when the
    index keeps only the first d dimensions (d in {MRL_BUDGETS}) against
    the full-dimension ranking — the measurement behind
    Matryoshka-representation (MRL, arXiv:2205.13147) dimension-budget
    choices: how many prefix dims buy how much recall, i.e. how small the
    serving index can be before quality falls off.

    Recall is MICRO-averaged (total hits / total baseline rows) so the
    statistic is a ratio of two exact integers — no float accumulation
    order anywhere; set membership comes from the same
    (cosine DESC, neighbor_id) ranking similarity_topk uses. Shape: ONE
    broadcast-queries x corpus pass per budget (the budgets are a fixed
    4-entry grid, so the union is 4 scans of the same head — at scale
    each is similarity_topk's linear streaming plan on a sliced vector);
    everything after the per-query windows is |budgets| x {TOP_K} x
    {N_QUERIES} rows.
    """
    e = load_table(spark, sf_dir, "embeddings")
    parts = []
    for b in MRL_BUDGETS:
        q = e.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.slice(F.col("embedding"), 1, b).alias("qe"),
        )
        n = e.select(
            F.col("vec_id").alias("neighbor_id"),
            F.slice(F.col("embedding"), 1, b).alias("ne"),
        )
        parts.append(
            F.broadcast(q)
            .join(n, F.col("neighbor_id") != F.col("query_id"))
            .select(
                F.lit(b).alias("dim_budget"),
                "query_id",
                "neighbor_id",
                cosine_arrow(F.col("qe"), F.col("ne")).alias("c"),
            )
        )
    scored = parts[0]
    for p in parts[1:]:
        scored = scored.unionAll(p)
    w = Window.partitionBy("dim_budget", "query_id").orderBy(
        F.col("c").desc(), F.col("neighbor_id")
    )
    top = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("dim_budget", "query_id", "neighbor_id")
    )
    base = top.filter(F.col("dim_budget") == DIM).select(
        F.col("query_id").alias("b_query_id"),
        F.col("neighbor_id").alias("b_neighbor_id"),
    )
    hits = (
        top.join(
            base,
            (F.col("query_id") == F.col("b_query_id"))
            & (F.col("neighbor_id") == F.col("b_neighbor_id")),
            "left",
        )
        .groupBy("dim_budget")
        .agg(
            F.count_distinct("query_id").cast("bigint").alias("n_queries"),
            F.count("b_neighbor_id").cast("bigint").alias("n_hits"),
        )
    )
    basek = base.agg(F.count("*").cast("bigint").alias("total_base"))
    return (
        hits.join(F.broadcast(basek))
        .select(
            F.col("dim_budget").cast("bigint").alias("dim_budget"),
            "n_queries",
            "n_hits",
            F.when(F.col("total_base") == 0, F.lit(None).cast("double"))
            .otherwise(
                F.round(
                    F.col("n_hits") / F.col("total_base").cast("double"), 6
                )
            )
            .alias("recall_at_k"),
        )
        .orderBy("dim_budget")
    )


# --- margin-based bitext / pair mining ------------------------------------------

MINE_KNN = 4  # neighborhood size for the margin denominator
MINE_MARGIN_NANO = 1_050_000_000  # keep pairs with margin >= 1.05


def _bitext_oracle() -> str:
    return f"""
    WITH x AS (
      SELECT vec_id AS src_id, embedding AS qe FROM embeddings
      WHERE label % 2 = 0 AND embedding IS NOT NULL
    ),
    y AS (
      SELECT vec_id AS tgt_id, embedding AS ne FROM embeddings
      WHERE label % 2 = 1 AND embedding IS NOT NULL
    ),
    p AS (SELECT src_id, tgt_id, qe, ne FROM x JOIN y ON TRUE),
    d AS (
      SELECT src_id, tgt_id, {_COS_SQL} AS c
      FROM p, generate_series(1, {DIM}) g(i)
      GROUP BY src_id, tgt_id
    ),
    m AS (
      SELECT src_id, tgt_id,
             CAST(ROUND(c * 1000000) AS BIGINT) AS cmic
      FROM d WHERE c IS NOT NULL AND NOT isnan(c)
    ),
    rx AS (
      SELECT src_id, tgt_id, cmic,
             ROW_NUMBER() OVER (PARTITION BY src_id
                                ORDER BY cmic DESC, tgt_id) AS rn
      FROM m
    ),
    nx AS (
      SELECT src_id, CAST(SUM(cmic) AS BIGINT) AS sx,
             CAST(COUNT(*) AS BIGINT) AS ka
      FROM rx WHERE rn <= {MINE_KNN} GROUP BY src_id
    ),
    ry AS (
      SELECT src_id, tgt_id, cmic,
             ROW_NUMBER() OVER (PARTITION BY tgt_id
                                ORDER BY cmic DESC, src_id) AS rn
      FROM m
    ),
    ny AS (
      SELECT tgt_id, CAST(SUM(cmic) AS BIGINT) AS sy,
             CAST(COUNT(*) AS BIGINT) AS kb
      FROM ry WHERE rn <= {MINE_KNN} GROUP BY tgt_id
    ),
    g AS (
      SELECT m.src_id, m.tgt_id, m.cmic,
             CASE WHEN nx.sx * ny.kb + ny.sy * nx.ka <= 0 THEN NULL
                  ELSE CAST(ROUND(
                    CAST(2 * m.cmic * nx.ka * ny.kb AS DOUBLE) * 1000000000.0
                    / (nx.sx * ny.kb + ny.sy * nx.ka)) AS BIGINT)
             END AS margin_nano
      FROM m JOIN nx ON nx.src_id = m.src_id
             JOIN ny ON ny.tgt_id = m.tgt_id
    ),
    gg AS (SELECT * FROM g WHERE margin_nano IS NOT NULL),
    bx AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY src_id
                                   ORDER BY margin_nano DESC, tgt_id) AS rsrc
      FROM gg
    ),
    bxy AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY tgt_id
                                   ORDER BY margin_nano DESC, src_id) AS rtgt
      FROM bx
    )
    SELECT src_id, tgt_id,
           ROUND(cmic / 1000000.0, 6) AS cosine,
           ROUND(margin_nano / 1000000000.0, 6) AS margin
    FROM bxy
    WHERE rsrc = 1 AND rtgt = 1 AND margin_nano >= {MINE_MARGIN_NANO}
    ORDER BY src_id
    """


@_register("embedding_bitext_mining", oracle=_bitext_oracle())
def embedding_bitext_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based pair mining between two embedding populations — the
    Artetxe & Schwenk (arXiv:1811.01136) ratio-margin criterion behind
    large-scale bitext mining (CCMatrix class): a candidate pair survives
    only if its similarity stands OUT of both endpoints' k-NN
    neighborhoods (raw cosine thresholds over-mine hubs; the margin
    normalizes hubness away), and the match must be MUTUAL best.

    Sides here are the even/odd label halves of the embeddings table (in
    production: the two language shards). All margin arithmetic is
    integer: cosines quantize to micro-units ONCE, neighborhood sums are
    exact int64, and margin = 2*c*ka*kb / (sx*kb + sy*ka) evaluates as
    integer products with ONE shared double division — so ranking,
    mutual-best selection, and the threshold agree bit-for-bit across
    engines and partitionings (ln()-class lessons applied).

    Shape: this demo pairs the sides brute-force (quadratic BY DESIGN, the
    verification tool); the 100 TB path feeds the SAME margin/mutual tail
    from an ANN shortlist (similarity_ann_ivf/_lsh per side) instead of
    the full cross product — the tail's cost is |candidates|, and the
    per-side windows carry (id, cmic) longs only.
    """
    e = load_table(spark, sf_dir, "embeddings")
    x = e.filter((F.col("label") % 2 == 0) & F.col("embedding").isNotNull()).select(
        F.col("vec_id").alias("src_id"), F.col("embedding").alias("qe")
    )
    y = e.filter((F.col("label") % 2 == 1) & F.col("embedding").isNotNull()).select(
        F.col("vec_id").alias("tgt_id"), F.col("embedding").alias("ne")
    )
    m = (
        F.broadcast(x)
        .join(y)
        .select(
            "src_id",
            "tgt_id",
            F.round(cosine_arrow(F.col("qe"), F.col("ne")) * 1000000)
            .cast("bigint")
            .alias("cmic"),
        )
        .filter(F.col("cmic").isNotNull())
    )
    wx = Window.partitionBy("src_id").orderBy(F.col("cmic").desc(), "tgt_id")
    nx = (
        m.withColumn("rn", F.row_number().over(wx))
        .filter(F.col("rn") <= MINE_KNN)
        .groupBy("src_id")
        .agg(
            F.sum("cmic").cast("bigint").alias("sx"),
            F.count("*").cast("bigint").alias("ka"),
        )
    )
    wy = Window.partitionBy("tgt_id").orderBy(F.col("cmic").desc(), "src_id")
    ny = (
        m.withColumn("rn", F.row_number().over(wy))
        .filter(F.col("rn") <= MINE_KNN)
        .groupBy("tgt_id")
        .agg(
            F.sum("cmic").cast("bigint").alias("sy"),
            F.count("*").cast("bigint").alias("kb"),
        )
    )
    denom = F.col("sx") * F.col("kb") + F.col("sy") * F.col("ka")
    margin_nano = F.when(denom <= 0, F.lit(None).cast("bigint")).otherwise(
        F.round(
            (F.lit(2) * F.col("cmic") * F.col("ka") * F.col("kb")).cast("double")
            * 1000000000.0
            / denom
        ).cast("bigint")
    )
    g = (
        m.join(nx, "src_id")
        .join(ny, "tgt_id")
        .select("src_id", "tgt_id", "cmic", margin_nano.alias("margin_nano"))
        .filter(F.col("margin_nano").isNotNull())
    )
    bx = Window.partitionBy("src_id").orderBy(F.col("margin_nano").desc(), "tgt_id")
    by = Window.partitionBy("tgt_id").orderBy(F.col("margin_nano").desc(), "src_id")
    return (
        g.withColumn("rsrc", F.row_number().over(bx))
        .withColumn("rtgt", F.row_number().over(by))
        .filter(
            (F.col("rsrc") == 1)
            & (F.col("rtgt") == 1)
            & (F.col("margin_nano") >= MINE_MARGIN_NANO)
        )
        .select(
            "src_id",
            "tgt_id",
            F.round(F.col("cmic") / 1000000.0, 6).alias("cosine"),
            F.round(F.col("margin_nano") / 1000000000.0, 6).alias("margin"),
        )
        .orderBy("src_id")
    )


# --- Mahalanobis (diagonal) outlier scoring ------------------------------------

MDIST_OUTLIER_THRESHOLD = 1.5  # RMS z-score units


@_register(
    "embedding_outlier_mahalanobis",
    oracle=f"""
    WITH stats AS (
      SELECT g.i AS dim,
             ROUND(AVG(embedding[g.i]::DOUBLE), 4) + 0 AS mean,
             ROUND(STDDEV_POP(embedding[g.i]::DOUBLE), 4) + 0 AS std
      FROM embeddings, generate_series(1, {DIM}) g(i)
      GROUP BY g.i
    ),
    per AS (
      SELECT e.vec_id,
             SUM(CAST(ROUND(CASE WHEN s.std > 0
                       THEN ((e.embedding[s.dim]::DOUBLE - s.mean) / s.std)
                            * ((e.embedding[s.dim]::DOUBLE - s.mean) / s.std)
                       ELSE 0 END * 1000000, 0) AS BIGINT)) AS m2_micro
      FROM embeddings e CROSS JOIN stats s
      WHERE e.embedding IS NOT NULL
      GROUP BY e.vec_id
    )
    SELECT vec_id,
           ROUND(sqrt(m2_micro / 1000000.0 / {DIM}), 4) + 0 AS m_dist,
           (ROUND(sqrt(m2_micro / 1000000.0 / {DIM}), 4)
            >= {MDIST_OUTLIER_THRESHOLD}) AS is_outlier
    FROM per ORDER BY vec_id
    """,
)
def embedding_outlier_mahalanobis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diagonal-covariance Mahalanobis outlier score per vector — the
    embedding-space data-cleaning gate: encoder glitches, wrong-modality
    rows and corrupted inputs land far from the per-dimension distribution
    and surface here before they poison centroids, ANN probes or training
    batches. Reported as the RMS z-score sqrt(sum((x-mu)/sigma)^2 / DIM),
    so the threshold reads in "average sigmas per dimension".

    Shape: per-dim stats are one DIM-bounded conditional aggregation (the
    embedding_dim_stats geometry); the one-row (means, stds) array pair
    broadcasts back and scoring is an IN-ROW zip_with fold — the corpus
    crosses no exchange to be scored. Per-dimension terms are rounded to
    6dp and summed in integer micro-units, so the cross-vector sum is
    associative and engine-order-independent; zero-variance dimensions
    contribute 0 (they carry no information to be an outlier in).
    """
    e = load_table(spark, sf_dir, "embeddings")
    v = (
        e.filter(F.col("embedding").isNotNull())
        .select("vec_id", F.posexplode("embedding").alias("pos", "x"))
        .select(
            "vec_id",
            (F.col("pos") + 1).alias("dim"),
            F.col("x").cast("double").alias("x"),
        )
    )
    stats = v.groupBy("dim").agg(
        (F.round(F.avg("x"), 4) + F.lit(0.0)).alias("mean"),
        (F.round(F.stddev_pop("x"), 4) + F.lit(0.0)).alias("std"),
    )
    one = stats.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "mean"))),
            lambda s: s["mean"],
        ).alias("means"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "std"))),
            lambda s: s["std"],
        ).alias("stds"),
    )
    diffs = F.zip_with(
        F.col("embedding"), F.col("means"), lambda x, m: x.cast("double") - m
    )
    # (d/s)*(d/s), never pow(): multiply/divide are IEEE-identical across
    # engines while java.lang.Math.pow vs libm pow can differ by an ulp.
    # Each term is rounded AT integer micro-unit scale (round THEN cast —
    # Spark's double->bigint cast truncates where DuckDB's rounds, which
    # flipped single micro-units at sf0.1 until both sides rounded first).
    terms = F.zip_with(
        diffs,
        F.col("stds"),
        lambda d, s: F.when(s > 0, (d / s) * (d / s)).otherwise(F.lit(0.0)),
    )
    m2_micro = F.aggregate(
        terms,
        F.lit(0).cast("bigint"),
        lambda acc, t: acc + F.round(t * 1000000).cast("bigint"),
    )
    m_dist = F.round(
        F.sqrt(m2_micro / F.lit(1000000.0) / F.lit(float(DIM))), 4
    ) + F.lit(0.0)
    return (
        e.filter(F.col("embedding").isNotNull())
        .crossJoin(F.broadcast(one))
        .select(
            "vec_id",
            m_dist.alias("m_dist"),
            (m_dist >= F.lit(MDIST_OUTLIER_THRESHOLD)).alias("is_outlier"),
        )
        .orderBy("vec_id")
    )


# --- nearest-centroid classification + confusion matrix ------------------------

_CENT_COS_SQL = (
    "SUM(ve[i]::DOUBLE * ce[i]::DOUBLE)"
    " / (sqrt(SUM(ve[i]::DOUBLE * ve[i]::DOUBLE))"
    " * sqrt(SUM(ce[i]::DOUBLE * ce[i]::DOUBLE)))"
)


@_register(
    "similarity_centroid_classify",
    oracle=f"""
    WITH cent AS (
      SELECT label, g.i AS dim,
             ROUND(AVG(embedding[g.i]::DOUBLE), 4) + 0 AS mean
      FROM embeddings, generate_series(1, {DIM}) g(i)
      WHERE label IS NOT NULL AND embedding IS NOT NULL
      GROUP BY label, g.i
    ),
    ca AS (
      SELECT label AS c_label, list(mean ORDER BY dim) AS ce
      FROM cent GROUP BY label
    ),
    v AS (
      SELECT vec_id, label AS true_label, embedding AS ve
      FROM embeddings
      WHERE label IS NOT NULL AND embedding IS NOT NULL
        AND list_max(list_transform(embedding, x -> abs(x::DOUBLE))) > 0
    ),
    scored AS (
      SELECT v.vec_id, v.true_label, ca.c_label,
             ROUND((SELECT {_CENT_COS_SQL}
                    FROM generate_series(1, {DIM}) g(i)), 6) AS c
      FROM v CROSS JOIN ca
    ),
    pred AS (
      SELECT vec_id, true_label, c_label AS pred_label
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                         ORDER BY c DESC, c_label ASC) AS rn
            FROM scored)
      WHERE rn = 1
    )
    SELECT true_label, pred_label,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(COUNT(*) * 1.0 /
                 SUM(COUNT(*)) OVER (PARTITION BY true_label), 6)
             AS frac_of_true
    FROM pred GROUP BY true_label, pred_label
    ORDER BY true_label, pred_label
    """,
)
def similarity_centroid_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-label-centroid classification with its confusion matrix —
    the label-quality audit: how separable the label space is in
    embedding geometry, which labels bleed into which, and (diagonal
    fraction) how much a trivial centroid classifier already recovers.
    The complement of similarity_knn_label_vote: prototype-based instead
    of instance-based, so disagreement between the two surfaces
    border-region structure.

    Shape: centroids are a |labels| x DIM conditional aggregation; the
    label-bounded centroid-array table broadcasts into a corpus cross
    join (|labels| skinny rows per vector), and the per-vector argmax is
    one max(struct) aggregation keyed by vec_id — the only corpus-scale
    exchange carries (vec_id, rounded cosine, label) triples, never
    vectors. The confusion rollup is |labels|^2-bounded. Ties break to
    the smallest label on the ROUNDED cosine in both engines.
    """
    e = load_table(spark, sf_dir, "embeddings")
    lab = e.filter(F.col("label").isNotNull() & F.col("embedding").isNotNull())
    cent = (
        lab.select("label", F.posexplode("embedding").alias("pos", "x"))
        .groupBy("label", (F.col("pos") + 1).alias("dim"))
        .agg((F.round(F.avg(F.col("x").cast("double")), 4) + F.lit(0.0)).alias("mean"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "mean"))),
                lambda s: s["mean"],
            ).alias("ce")
        )
        .select(F.col("label").alias("c_label"), "ce")
    )
    v = lab.filter(
        F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))
        > 0
    ).select("vec_id", F.col("label").alias("true_label"), F.col("embedding").alias("ve"))
    scored = v.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "true_label",
        "c_label",
        F.round(cosine_arrow(F.col("ve"), F.col("ce")), 6).alias("c"),
    )
    pred = (
        scored.groupBy("vec_id", "true_label")
        .agg(F.max(F.struct(F.col("c"), (-F.col("c_label")).alias("nl"))).alias("m"))
        .select("true_label", (-F.col("m.nl")).alias("pred_label"))
    )
    w = Window.partitionBy("true_label")
    agg = pred.groupBy("true_label", "pred_label").agg(
        F.count("*").cast("bigint").alias("n")
    )
    return agg.select(
        "true_label",
        "pred_label",
        "n",
        F.round(F.col("n") * F.lit(1.0) / F.sum("n").over(w), 6).alias(
            "frac_of_true"
        ),
    ).orderBy("true_label", "pred_label")


# --- hubness diagnostic over the exact top-k lists -----------------------------


def _hubness_oracle() -> str:
    topk = ORACLES["similarity_topk"]
    return f"""
    WITH topk AS ({topk}),
    occ AS (SELECT neighbor_id, COUNT(*) AS n_lists
            FROM topk GROUP BY neighbor_id)
    SELECT n_lists,
           CAST(COUNT(*) AS BIGINT) AS n_neighbors,
           CAST(SUM(COUNT(*)) OVER (ORDER BY n_lists DESC) AS BIGINT)
             AS neighbors_at_least
    FROM occ GROUP BY n_lists ORDER BY n_lists
    """


@_register("embedding_hubness_report", oracle=_hubness_oracle())
def embedding_hubness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-occurrence (hubness) distribution over the exact top-k lists: for
    each neighbor that appears in ANY query's top-k, how many lists it
    appears in, rolled up into a histogram. Hubness is the
    high-dimensional failure mode where a few points become everyone's
    neighbor (Radovanovic et al., JMLR 2010) — a right-heavy tail here
    means ANN recall targets and contrastive negative sampling are being
    skewed by hub points, and is the trigger to re-normalize or whiten
    (pca_fit/project) before indexing.

    Shape: rides similarity_topk's linear scan (broadcast queries, Arrow
    scoring); the rollups are query-set-bounded — the histogram is at
    most |queries| x k rows collapsing to at most k distinct counts.
    """
    topk = similarity_topk(spark, sf_dir).select("neighbor_id")
    occ = topk.groupBy("neighbor_id").agg(F.count("*").alias("n_lists"))
    hist = occ.groupBy("n_lists").agg(
        F.count("*").cast("bigint").alias("n_neighbors")
    )
    w = Window.orderBy(F.col("n_lists").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return hist.select(
        "n_lists",
        "n_neighbors",
        F.sum("n_neighbors").over(w).cast("bigint").alias("neighbors_at_least"),
    ).orderBy("n_lists")


def _cluster_profiles_oracle() -> str:
    cos_assign = _COS_SQL.replace("qe", "e.embedding").replace("ne", "c.ce")
    return f"""
    WITH cent AS (
      SELECT vec_id AS centroid_id, embedding AS ce
      FROM embeddings WHERE vec_id < {IVF_NLIST}
    ),
    ac AS (
      SELECT e.vec_id, e.label, c.centroid_id, ROUND({cos_assign}, 6) AS c6
      FROM embeddings e JOIN cent c ON TRUE, generate_series(1, {DIM}) g(i)
      GROUP BY e.vec_id, e.label, c.centroid_id
    ),
    ranked AS (
      SELECT vec_id, label, centroid_id, c6,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY c6 DESC, centroid_id) AS rn
      FROM ac
    ),
    assign AS (
      SELECT vec_id, label, centroid_id AS cell, c6 FROM ranked WHERE rn = 1
    ),
    cellagg AS (
      SELECT cell, COUNT(*) AS n_vectors,
             COUNT(DISTINCT label) AS n_labels,
             ROUND(CAST(SUM(CAST(ROUND(c6 * 1000000) AS BIGINT)) AS DOUBLE)
                   / COUNT(c6) / 1000000.0, 6) AS avg_cos_centroid
      FROM assign GROUP BY cell
    ),
    lab AS (
      SELECT cell, label, COUNT(*) AS cnt,
             ROW_NUMBER() OVER (PARTITION BY cell
                                ORDER BY COUNT(*) DESC, label) AS rn
      FROM assign WHERE label IS NOT NULL GROUP BY cell, label
    )
    SELECT ca.cell AS cell, CAST(ca.n_vectors AS BIGINT) AS n_vectors,
           CAST(ca.n_labels AS BIGINT) AS n_labels,
           ca.avg_cos_centroid,
           CAST(l.label AS BIGINT) AS top_label,
           ROUND(CAST(l.cnt AS DOUBLE) / ca.n_vectors, 6) AS top_label_share
    FROM cellagg ca LEFT JOIN lab l ON l.cell = ca.cell AND l.rn = 1
    ORDER BY ca.cell
    """


@_register("embedding_cluster_profiles", oracle=_cluster_profiles_oracle())
def embedding_cluster_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster composition audit: per codebook cell, its population, label
    diversity, dominant label (with share), and mean cosine to its own
    centroid — the review table behind every clustered surface in the
    engine (SemDeDup cells, IVF inverted lists, curriculum-by-cluster
    mixes). A cell with low cohesion and no dominant label is a junk
    drawer: split it (more centroids) before trusting per-cell dedup or
    ANN probes routed through it.

    Cells are the deterministic seed codebook so the oracle replays the
    assignment bit-for-bit; production swaps in kmeans_assign, identical
    shape.

    Shape: assignment is the map-only Arrow argmax (zero exchanges); the
    assigned-centroid cosine is one broadcast join against the NLIST-row
    codebook plus the shared Arrow cosine; both rollups exchange only
    (cell)- and (cell, label)-keyed rows after map-side combine —
    NLIST- and NLIST x |labels|-bounded outputs at any corpus size.
    """
    e = load_table(spark, sf_dir, "embeddings")
    cent = e.filter(F.col("vec_id") < IVF_NLIST).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("ce")
    )
    assign = _assign_nearest_centroid(e, cent).select(
        "vec_id",
        "label",
        "embedding",
        F.col("centroid_id").alias("cell"),
    )
    scored = assign.join(
        F.broadcast(cent.withColumnRenamed("centroid_id", "cell")), "cell"
    ).select(
        "vec_id",
        "label",
        "cell",
        F.round(cosine_arrow(F.col("embedding"), F.col("ce")), 6).alias("c6"),
    )
    # Exact int64 micro-unit sum before the one double division: an AVG of
    # rounded doubles can land on a half-boundary whose direction depends
    # on summation order; sum_micro / count is the same IEEE double in both
    # engines, so the shared half-up ROUND agrees bit-for-bit.
    c_micro = F.expr("CAST(ROUND(c6 * 1000000) AS BIGINT)")
    cellagg = scored.groupBy("cell").agg(
        F.count("*").cast("bigint").alias("n_vectors"),
        F.countDistinct("label").cast("bigint").alias("n_labels"),
        F.round(
            F.sum(c_micro).cast("double") / F.count("c6") / F.lit(1000000.0), 6
        ).alias("avg_cos_centroid"),
    )
    lw = Window.partitionBy("cell").orderBy(F.col("cnt").desc(), "label")
    lab = (
        scored.filter(F.col("label").isNotNull())
        .groupBy("cell", "label")
        .agg(F.count("*").alias("cnt"))
        .withColumn("rn", F.row_number().over(lw))
        .filter(F.col("rn") == 1)
        .select(
            "cell",
            F.col("label").cast("bigint").alias("top_label"),
            F.col("cnt").alias("top_cnt"),
        )
    )
    return (
        cellagg.join(F.broadcast(lab), "cell", "left")
        .select(
            "cell",
            "n_vectors",
            "n_labels",
            "avg_cos_centroid",
            "top_label",
            F.round(F.col("top_cnt").cast("double") / F.col("n_vectors"), 6).alias(
                "top_label_share"
            ),
        )
        .orderBy("cell")
    )


# --- simplified-silhouette clustering-quality audit (round 8) --------------

def _silhouette_oracle() -> str:
    cos = _COS_SQL.replace("qe", "e.embedding").replace("ne", "c.ce")
    return f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS ce
      FROM embeddings WHERE vec_id < {IVF_NLIST}
    ),
    ac AS (
      SELECT e.vec_id, c.cid, ROUND({cos}, 6) AS c6
      FROM embeddings e JOIN cent c ON TRUE, generate_series(1, {DIM}) g(i)
      GROUP BY e.vec_id, c.cid
    ),
    r AS (
      SELECT vec_id, cid, c6,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY c6 DESC, cid) AS rk
      FROM ac
    ),
    t AS (
      SELECT a.vec_id, a.cid AS cell, a.c6 AS own, b.c6 AS second
      FROM r a JOIN r b ON a.vec_id = b.vec_id AND b.rk = 2
      WHERE a.rk = 1 AND a.c6 IS NOT NULL AND b.c6 IS NOT NULL
    ),
    s AS (
      SELECT cell,
             CASE WHEN own = second THEN 0
                  ELSE CAST(ROUND((own - second) / (1 - second) * 1000000)
                            AS BIGINT)
             END AS sm
      FROM t
    )
    SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(SUM(CASE WHEN sm < 250000 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_boundary,
           ROUND(CAST(SUM(sm) AS DOUBLE) / COUNT(*) / 1000000.0, 6)
             AS avg_silhouette
    FROM s GROUP BY cell ORDER BY cell
    """


@_register("embedding_silhouette", oracle=_silhouette_oracle())
def embedding_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified-silhouette clustering-quality audit (Rousseeuw 1987's
    silhouette with centroid distances standing in for mean pairwise
    distances — the linear-time form every large-scale clustering review
    uses, since true silhouette is quadratic per cluster): per vector,
    a = cosine distance to its OWN (nearest) centroid, b = distance to the
    SECOND-nearest, s = (b-a)/max(a,b) = (own_cos - second_cos)/(1 -
    second_cos). Under nearest-centroid assignment s is in [0, 1] by
    construction (own >= second), so the audit reports the BOUNDARY count:
    vectors with s < 0.25 sit nearly equidistant between two centroids —
    the docs whose cell membership is routing noise, which SemDeDup
    comparisons and single-probe IVF scans will mishandle first (they are
    exactly the nprobe>1 motivation).
    Complements embedding_cluster_profiles: that table audits WHAT is in
    each cell, this one audits whether the BOUNDARIES are trustworthy.

    Cells are the deterministic seed codebook (cluster_profiles'
    convention) so the oracle replays the top-2 ranking bit-for-bit;
    production swaps in trained centroids, identical shape.

    Shape: ONE map-only Arrow pass computes all NLIST cosines per vector
    (the shared _cos_all_udf kernel, zero exchanges); own/second/cell fall
    out of JVM-side array ops over the rounded cosine array (argmax = the
    assignment's first-occurrence-of-max convention, second = max of the
    remainder); the only exchange carries (cell, s_micro) pairs into an
    NLIST-bounded rollup. Float discipline: per-vector silhouette is ONE
    division of identically-rounded doubles, quantized to integer
    micro-units; cell means are exact int64 sums over one shared double
    division. Ties (own == second) pin s = 0 explicitly — equidistant
    vectors carry no boundary signal and no 0/0 risk when own = 1.
    """
    e = load_table(spark, sf_dir, "embeddings")
    cent = e.filter(F.col("vec_id") < IVF_NLIST).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("ce")
    )
    rows = cent.orderBy("centroid_id").collect()
    ids, C, cn = _codebook_matrix(rows)
    empty = "cell bigint, n_vectors bigint, n_boundary bigint, avg_silhouette double"
    if len(ids) < 2:
        # Fewer than two valid centroids: no second-nearest exists for any
        # vector, so the audit is empty — in both engines.
        return spark.createDataFrame([], empty)
    nlist = len(ids)
    c6s = F.transform(_cos_all_udf(C, cn)(F.col("embedding")), lambda v: F.round(v, 6))
    id_arr = F.array(*[F.lit(i).cast("long") for i in ids])
    scored = e.select("vec_id", c6s.alias("c6s"))
    pos = F.coalesce(
        F.array_position(F.col("c6s"), F.array_max("c6s")), F.lit(1)
    ).cast("int")
    base = (
        scored.select(
            "vec_id",
            F.element_at(id_arr, pos).alias("cell"),
            F.array_max("c6s").alias("own"),
            F.expr(
                "array_max(concat("
                " slice(c6s, 1, CAST(array_position(c6s, array_max(c6s)) AS INT) - 1),"
                " slice(c6s, CAST(array_position(c6s, array_max(c6s)) AS INT) + 1,"
                f" {nlist})))"
            ).alias("second"),
        )
        .filter(F.col("own").isNotNull() & F.col("second").isNotNull())
    )
    sm = F.when(F.col("own") == F.col("second"), F.lit(0).cast("bigint")).otherwise(
        F.expr("CAST(ROUND((own - second) / (1 - second) * 1000000) AS BIGINT)")
    )
    return (
        base.select("cell", sm.alias("sm"))
        .groupBy("cell")
        .agg(
            F.count("*").cast("bigint").alias("n_vectors"),
            F.sum((F.col("sm") < 250000).cast("int")).cast("bigint").alias(
                "n_boundary"
            ),
            F.round(
                F.sum("sm").cast("double") / F.count("*") / F.lit(1000000.0), 6
            ).alias("avg_silhouette"),
        )
        .orderBy("cell")
    )


@_register("similarity_ann_ivfpq", oracle=_ivfpq_oracle())
def similarity_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ — the FAISS IVFPQ serving composition, and the one the two
    parents exist to feed: IVF probing cuts the CANDIDATE SET to
    nprobe/NLIST of the corpus (partition pruning at the file level once
    persisted), PQ-ADC cuts the PER-CANDIDATE COST to {PQ_M} integer
    nibble lookups (no float vectors read), and the {PQ_SHORTLIST}-row
    shortlist reranks exactly. similarity_ann_ivf still reads full
    vectors for every probed candidate; similarity_ann_pq_adc still
    scores every corpus code; this does neither — the multiplicative
    saving that serves billion-vector corpora from RAM.

    Shape: candidate generation is the gated inline-IVF plan (map-only
    Arrow assignment, bounded probe-table broadcast); ADC scoring joins
    the candidate pairs to their code nibbles and the broadcast
    per-query lookup tables (|queries| x {PQ_M} x {PQ_K} integer rows),
    summing exact micro-unit distances — bit-identical boundaries
    cross-engine; only the shortlist touches float vectors again. The
    recall scoreboard comparison: run this against ann_ivf (same probes,
    cheaper scan) — the recall gap IS the quantization cost at the
    banked IO savings.
    """
    e = load_table(spark, sf_dir, "embeddings")
    # --- IVF candidate generation (similarity_ann_ivf's gated prologue)
    cent = e.filter(F.col("vec_id") < IVF_NLIST).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("ce")
    )
    cent_rows, query_rows = _seed_codebook_and_queries(e)
    assign = _assign_nearest_centroid(e, cent, cent_rows=cent_rows).select(
        "vec_id", "centroid_id"
    )
    probes = spark.createDataFrame(
        _probe_lists(cent_rows, query_rows, IVF_NPROBE) or [],
        "query_id long, centroid_id long",
    )
    cand = (
        F.broadcast(probes)
        .join(assign, "centroid_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    # --- PQ codes + per-query ADC tables (similarity_ann_pq_adc's plan)
    cb = e.filter(F.col("vec_id") < PQ_K).select(
        F.col("vec_id").alias("k"), F.col("embedding").alias("ce")
    )
    sq_micro = F.round(
        F.round(
            F.expr(
                f"aggregate(zip_with("
                f" slice(embedding, sub * {PQ_SUBDIM} + 1, {PQ_SUBDIM}),"
                f" slice(ce, sub * {PQ_SUBDIM} + 1, {PQ_SUBDIM}),"
                f" (a, b) -> (CAST(a AS DOUBLE) - CAST(b AS DOUBLE))"
                f"        * (CAST(a AS DOUBLE) - CAST(b AS DOUBLE))),"
                f" CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
            ),
            6,
        )
        * 1_000_000
    ).cast("bigint")
    subs = e.select(
        "vec_id", "embedding",
        F.explode(F.expr(f"sequence(0, {PQ_M - 1})")).alias("sub"),
    )
    dist = subs.join(F.broadcast(cb)).select(
        "vec_id", "sub", "k", sq_micro.alias("dmic")
    )
    codes = (
        dist.groupBy("vec_id", "sub")
        .agg(F.min(F.struct("dmic", "k")).alias("b"))
        .select(
            F.col("vec_id").alias("neighbor_id"), "sub", F.col("b.k").alias("k")
        )
    )
    qtable = dist.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "sub", "k", "dmic"
    )
    # --- ADC restricted to the IVF candidates: the composition point
    adc = (
        cand.join(codes, "neighbor_id")
        .join(F.broadcast(qtable), ["query_id", "sub", "k"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("dmic").alias("adc_micro"))
    )
    ws = Window.partitionBy("query_id").orderBy("adc_micro", "neighbor_id")
    short = (
        adc.withColumn("srn", F.row_number().over(ws))
        .filter(F.col("srn") <= PQ_SHORTLIST)
        .select("query_id", "neighbor_id")
    )
    qe = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    ne = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ne"))
    scored = (
        short.join(F.broadcast(qe), "query_id")
        .join(ne, "neighbor_id")
        .select(
            "query_id", "neighbor_id", cosine_arrow(F.col("qe"), F.col("ne")).alias("c")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("c").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.round("c", 6).alias("cosine"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def ivfpq_build_index(
    spark: SparkSession,
    sf_dir: str,
    index_dir: str,
    centroids: DataFrame | None = None,
    vectors: DataFrame | None = None,
) -> None:
    """Materialize the FAISS-style IVF+PQ serving artifact: the IVF
    partition layout (Hive-partitioned by assigned centroid_id, so probes
    prune at the FILE level) with the PQ codes RESIDENT in it — one
    (vec_id, pq_code) row per corpus vector inside its inverted list.
    This is the index similarity_ann_ivfpq's docstring promises: a probe
    reads nprobe/NLIST of the DIRECTORIES, and inside them touches 32-bit
    codes instead of float vectors — the multiplicative IO saving that
    serves billion-vector corpora. ivf_build_index still stores full
    embeddings per list; pq_build_index still stores codes unpartitioned;
    this composes both halves.

    Codes come from the gated embedding_pq_codes plan (identical codeword
    assignment, 6-dp-rounded distances, min-(d6, k) tie rule) and join the
    map-only centroid assignment on vec_id — an int-row shuffle paid once
    at build. Both codebooks ride WITH the index (``_centroids``,
    ``_codebook`` — underscore-prefixed, invisible to list readers), so a
    probe always ranks and ADC-scores against exactly the codebooks the
    lists and codes were built from.
    """
    from ..functions.indexing import (
        clear_index_complete,
        discard_stale_stages,
        mark_index_complete,
    )

    clear_index_complete(spark, index_dir)
    # stale-stage discipline at build start — see indexing.discard_stale_stages
    discard_stale_stages(spark, index_dir)
    e = vectors if vectors is not None else load_table(spark, sf_dir, "embeddings")
    cent = centroids
    if cent is None:
        cent = e.filter(F.col("vec_id") < IVF_NLIST).select(
            F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("ce")
        )
    # Same float32 cast the probe applies on read (ivf_build_index's rule):
    # build-time assignment and probe-time ranking see identical centroids.
    cent = cent.select(
        "centroid_id", F.col("ce").cast("array<float>").alias("ce")
    ).localCheckpoint(eager=True)
    assign = _assign_nearest_centroid(e, cent).select("vec_id", "centroid_id")
    cb = e.filter(F.col("vec_id") < PQ_K).select(
        F.col("vec_id").alias("k"), F.col("embedding").alias("ce")
    )
    codes = _pq_codes_core(e, cb).select("vec_id", "pq_code")
    assign.join(codes, "vec_id").write.mode("overwrite").partitionBy(
        "centroid_id"
    ).parquet(index_dir)
    # Sidecars written after the wholesale overwrite above replaces index_dir.
    cent.write.mode("overwrite").parquet(f"{index_dir}/_centroids")
    cb.write.mode("overwrite").parquet(f"{index_dir}/_codebook")
    mark_index_complete(spark, index_dir)


def _merge_into_lists(
    spark: SparkSession, index_dir: str, new: DataFrame, key: str = "vec_id"
) -> None:
    """Shared tail of the inverted-list append family: given the batch's
    fully-derived index rows (same schema as the artifact, partition
    column ``centroid_id`` last), rewrite ONLY the touched lists as
    existing-members-minus-batch-keys plus the batch rows.

    The anti-join on ``key`` makes appends idempotent (a replayed batch
    replaces its own rows instead of duplicating them) and convergent
    after a torn append; dynamic partition overwrite confines the write
    to the touched directories — the ``run_stream_winnow_screen``
    effectively-once discipline applied to index maintenance.  The merged
    frame is localCheckpoint'd before the write because it reads the same
    path the write replaces (bounded: touched-list members + batch, the
    §8.3 bounded-intermediate rule; at production NLIST the touched set
    is O(batch) lists, never the artifact)."""
    vals = [r.centroid_id for r in new.select("centroid_id").distinct().collect()]
    if not vals:  # empty batch: nothing to merge, artifact already correct
        return
    touched = sorted(v for v in vals if v is not None)
    cond = F.col("centroid_id").isin(touched)
    if any(v is None for v in vals):
        # NULL-assigned rows land in the default partition; read it back
        # too so a replay replaces rather than clobbers its prior members.
        cond = cond | F.col("centroid_id").isNull()
    existing = (
        spark.read.parquet(index_dir).filter(cond).select(*new.columns)
    )
    merged = (
        existing.join(new.select(key).distinct(), key, "left_anti")
        .unionByName(new)
        .localCheckpoint(eager=True)
    )
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("centroid_id")
        .parquet(index_dir)
    )


def inverted_lists_delete(
    spark: SparkSession,
    index_dir: str,
    ids: DataFrame,
    resume: bool = False,
    id_col: str = "vec_id",
    partition_cols: tuple[str, ...] = ("centroid_id",),
) -> int:
    """Delete rows BY ID from a Hive-partitioned index whose rows are a
    pure per-id function (ivf / ivfpq / ivfpq-residual lists over
    ``centroid_id``; the LSH band index over ``(band, bucket)``) — the
    right-to-be-forgotten maintenance op, append's inverse: rewrite each
    TOUCHED partition as existing-members-minus-ids, leave every other
    partition's files untouched, keep the sidecar codebooks (deletion
    never changes what the remaining rows mean). BM25 and the
    winnow/substring fingerprint indexes DENORMALIZE corpus-global df
    onto their rows, so their deletes need the bucket-repair form
    (``bm25_delete_index``), not this one.

    Deletes arrive as bare ids, so the touched-partition set is
    discovered with one COLUMN-PRUNED scan of the index (the id and
    partition columns only — for IVF+PQ that is 12 bytes/vector, never
    embeddings), semi-joined against the broadcast id set. Result-equal
    to rebuilding without the ids (gated), idempotent (deleting absent
    ids rewrites nothing), convergent after a torn delete
    (``resume=True`` re-runs the same id set — including the tail-crash
    case where the partition rewrite and the emptied-partition sweep both
    finished but the completion marker was never restored: the re-run
    then finds no matching ids and its only remaining job is to re-mark
    the artifact, which it does instead of early-returning). Dynamic
    overwrite only
    replaces partitions PRESENT in the write, so a partition whose
    members are ALL deleted (zero remaining rows) is removed explicitly
    through the Hadoop FileSystem — without that, the emptied
    partition's old files would silently survive the rewrite.

    Returns the number of index rows removed.
    """
    import functools

    from ..functions.indexing import (
        assert_index_complete,
        clear_index_complete,
        mark_index_complete,
    )

    if not resume:
        assert_index_complete(spark, index_dir)
    pcols = list(partition_cols)
    idset = ids.select(id_col).distinct().localCheckpoint(eager=True)
    hit = (
        spark.read.parquet(index_dir)
        .select(id_col, *pcols)
        .join(F.broadcast(idset), id_col, "semi")
    )
    touched = sorted(
        {tuple(r[c] for c in pcols) for r in hit.select(*pcols).distinct().collect()},
        key=lambda t: tuple((v is None, v) for v in t),
    )
    if not touched:  # ids absent: the partitions are already correct
        if resume:
            # Torn-delete tail recovery: the crashed run finished its
            # rewrite and sweep (no id survives anywhere — a stale
            # emptied partition would have matched above) but died
            # before restoring the marker. The artifact's DATA is
            # whole, so re-mark it; early-returning here would leave
            # the index permanently unprobeable.
            mark_index_complete(spark, index_dir)
        return 0
    clear_index_complete(spark, index_dir)

    def _leaf_cond(t):
        return functools.reduce(
            lambda a, b: a & b,
            [
                F.col(c).isNull() if v is None else (F.col(c) == v)
                for c, v in zip(pcols, t)
            ],
        )

    cond = functools.reduce(lambda a, b: a | b, [_leaf_cond(t) for t in touched])
    existing = spark.read.parquet(index_dir).filter(cond)
    remaining = existing.join(
        F.broadcast(idset), id_col, "left_anti"
    ).localCheckpoint(eager=True)  # bounded: touched-partition members
    removed = existing.count() - remaining.count()
    kept = {
        tuple(r[c] for c in pcols)
        for r in remaining.select(*pcols).distinct().collect()
    }
    (
        remaining.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*pcols)
        .parquet(index_dir)
    )
    jvm, jsc = spark._jvm, spark._jsc
    for t in touched:
        if t in kept:
            continue
        leaf = "/".join(
            f"{c}=__HIVE_DEFAULT_PARTITION__" if v is None else f"{c}={v}"
            for c, v in zip(pcols, t)
        )
        path = jvm.org.apache.hadoop.fs.Path(f"{index_dir.rstrip('/')}/{leaf}")
        fs = path.getFileSystem(jsc.hadoopConfiguration())
        if fs.exists(path):
            fs.delete(path, True)
    mark_index_complete(spark, index_dir)
    return int(removed)


def ivfpq_append_index(
    spark: SparkSession, index_dir: str, batch: DataFrame, resume: bool = False
) -> None:
    """Append an ingest batch of (vec_id, embedding) rows to the PERSISTED
    IVF+PQ index WITHOUT rebuilding it: the batch is assigned against the
    EXISTING ``_centroids`` sidecar and PQ-coded against the EXISTING
    ``_codebook`` sidecar (codebooks stay frozen — the FAISS ``add()``
    contract), and only the inverted lists the batch lands in are
    rewritten.  This is the O(batch) maintenance path that makes the
    index docstrings' write-once/probe-many economics hold at 100 TB:
    a day's ingest costs one map-only assignment pass, one bounded
    codebook broadcast join, and a rewrite of the touched lists — never
    a full rebuild (the round-10 verdict's top gap).

    Result-equal to a full rebuild by construction: assignment and codes
    are pure functions of (vector, sidecar codebooks) and the sidecars
    are exactly the ones the base build persisted — gated by test on
    both index contents and probe results, plus replay idempotence.

    ``resume=True`` skips the completion-marker assert so a torn append
    (crash mid-rewrite cleared the marker) can be re-run: the merge is
    convergent, so re-running the same batch repairs the artifact.
    """
    from ..functions.indexing import (
        assert_index_complete,
        clear_index_complete,
        mark_index_complete,
    )

    if not resume:
        assert_index_complete(spark, index_dir)
    cent = spark.read.parquet(f"{index_dir}/_centroids").select(
        "centroid_id", F.col("ce").cast("array<float>").alias("ce")
    )
    cb = spark.read.parquet(f"{index_dir}/_codebook").select("k", "ce")
    clear_index_complete(spark, index_dir)
    b = batch.select("vec_id", "embedding")
    assign = _assign_nearest_centroid(b, cent).select("vec_id", "centroid_id")
    codes = _pq_codes_core(b, cb).select("vec_id", "pq_code")
    new = assign.join(codes, "vec_id").select("vec_id", "pq_code", "centroid_id")
    _merge_into_lists(spark, index_dir, new)
    mark_index_complete(spark, index_dir)


def ivfpq_probe_indexed(
    spark: SparkSession, index_dir: str, sf_dir: str, nprobe: int = IVF_NPROBE
) -> DataFrame:
    """Probe the persisted IVF+PQ index: rank the query batch against the
    index's own centroid codebook, read ONLY the nprobe probed lists
    (partition-path pruning, same contract as ivf_probe_indexed — gated),
    ADC-score their resident 32-bit codes with {PQ_M} nibble lookups per
    candidate against the broadcast per-query distance tables, and
    exactly rerank the {PQ_SHORTLIST}-row shortlist — the only step that
    touches float vectors, and only for queries + shortlisted candidates.
    Result-equal to the inline similarity_ann_ivfpq when the index was
    built from the seed codebooks (gated by test).

    At 100 TB the two parents' costs multiply out: (1 - nprobe/NLIST) of
    the index is never LISTED, and what is read is 12 bytes/vector, not
    256 — the serving plan FAISS IVFPQ runs, in Spark partition terms.
    """
    from pyspark.errors import AnalysisException

    from ..functions.indexing import assert_index_complete

    assert_index_complete(spark, index_dir)
    e = load_table(spark, sf_dir, "embeddings")
    try:
        cent = spark.read.parquet(f"{index_dir}/_centroids").select(
            "centroid_id", F.col("ce").cast("array<float>").alias("ce")
        )
    except AnalysisException:  # missing-path only: pre-codebook seed fallback
        # Any OTHER failure (corrupt sidecar, transient FS error) must
        # surface — assert_hash_mode_meta's rule: a refined-codebook index
        # silently ranked against seed centroids is wrong with no signal.
        cent = e.filter(F.col("vec_id") < IVF_NLIST).select(
            F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("ce")
        )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    qc = q.join(F.broadcast(cent)).select(
        "query_id",
        "centroid_id",
        F.round(cosine_arrow(F.col("qe"), F.col("ce")), 6).alias("c6"),
    )
    w_q = Window.partitionBy("query_id").orderBy(F.col("c6").desc(), "centroid_id")
    probes = (
        qc.withColumn("rn", F.row_number().over(w_q))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "centroid_id")
    )
    # Bounded driver materialization (N_QUERIES x nprobe rows) feeding both
    # the partition filter and the literal broadcast side — the
    # ivf_probe_indexed discipline: the ranking lineage executes once.
    probe_rows = probes.collect()
    probed_ids = sorted({r.centroid_id for r in probe_rows})
    probes_lit = spark.createDataFrame(probe_rows, probes.schema)
    index = spark.read.parquet(index_dir).filter(
        F.col("centroid_id").isin(probed_ids)
    )
    cand = (
        F.broadcast(probes_lit)
        .join(index, "centroid_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "pq_code")
    )
    # Per-query ADC lookup tables against the codebook stored with the
    # index — |queries| x PQ_M x PQ_K integer rows, broadcast.
    cb = spark.read.parquet(f"{index_dir}/_codebook").select(
        "k", F.col("ce").cast("array<float>").alias("ce")
    )
    sq_micro = F.round(
        F.round(
            F.expr(
                f"aggregate(zip_with("
                f" slice(qe, sub * {PQ_SUBDIM} + 1, {PQ_SUBDIM}),"
                f" slice(ce, sub * {PQ_SUBDIM} + 1, {PQ_SUBDIM}),"
                f" (a, b) -> (CAST(a AS DOUBLE) - CAST(b AS DOUBLE))"
                f"        * (CAST(a AS DOUBLE) - CAST(b AS DOUBLE))),"
                f" CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
            ),
            6,
        )
        * 1_000_000
    ).cast("bigint")
    qsubs = q.select(
        "query_id", "qe", F.explode(F.expr(f"sequence(0, {PQ_M - 1})")).alias("sub")
    )
    qtable = qsubs.join(F.broadcast(cb)).select(
        "query_id", "sub", "k", sq_micro.alias("dmic")
    )
    nibbles = cand.select(
        "query_id",
        "neighbor_id",
        F.explode(F.expr(f"sequence(0, {PQ_M - 1})")).alias("sub"),
        "pq_code",
    ).select(
        "query_id",
        "neighbor_id",
        "sub",
        F.expr("CAST(shiftright(pq_code, 4 * sub) & 15 AS BIGINT)").alias("k"),
    )
    adc = (
        nibbles.join(F.broadcast(qtable), ["query_id", "sub", "k"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("dmic").alias("adc_micro"))
    )
    ws = Window.partitionBy("query_id").orderBy("adc_micro", "neighbor_id")
    short = (
        adc.withColumn("srn", F.row_number().over(ws))
        .filter(F.col("srn") <= PQ_SHORTLIST)
        .select("query_id", "neighbor_id")
    )
    ne = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ne"))
    scored = (
        short.join(F.broadcast(q), "query_id")
        .join(ne, "neighbor_id")
        .select(
            "query_id", "neighbor_id", cosine_arrow(F.col("qe"), F.col("ne")).alias("c")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("c").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.round("c", 6).alias("cosine"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


APPEND_SEED_FLOOR = CB_BASE + PQ_K  # a split below this would drop seed rows


@_register("similarity_ann_ivfpq_appended", oracle=_ivfpq_oracle())
def similarity_ann_ivfpq_appended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental index maintenance verified END TO END as a registered
    query: build the persisted IVF+PQ index on the base 4/5 of the corpus
    (all seed-codebook ids stay in the base), ivfpq_append_index the
    remaining 1/5 against the FROZEN sidecar codebooks, probe the
    appended artifact — and hold the INLINE similarity_ann_ivfpq oracle.
    append == rebuild == inline IS the maintenance contract (each
    equality is also individually pytest-gated); this row makes the
    composition driver-verifiable on every dataset the harness throws at
    it.  Corpora too small to split (max vec_id below the seed floor)
    append an EMPTY batch — the degenerate case the append path must
    no-op on, which the oracle then checks for free.

    Scale shape: the build is the one assignment/coding pass the inline
    query pays anyway; the append is O(batch + touched lists); the probe
    is the partition-pruned serving read. The temp artifact is deleted
    after the (bounded, eagerly checkpointed) probe result materializes.
    """
    import shutil
    import tempfile

    e = load_table(spark, sf_dir, "embeddings")
    mx = e.agg(F.max("vec_id")).collect()[0][0]
    split = max(APPEND_SEED_FLOOR, int(((mx or 0) + 1) * 4 // 5))
    tmp = tempfile.mkdtemp(prefix="ivfpq_appended_")
    try:
        ivfpq_build_index(
            spark, sf_dir, tmp, vectors=e.filter(F.col("vec_id") < split)
        )
        ivfpq_append_index(spark, tmp, e.filter(F.col("vec_id") >= split))
        return ivfpq_probe_indexed(spark, tmp, sf_dir).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@_register("similarity_ann_pq_appended", oracle=_pq_adc_oracle())
def similarity_ann_pq_appended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UNPARTITIONED kind's incremental maintenance verified END TO
    END as a registered query: build the persisted PQ code table on the
    base 4/5 of the corpus, pq_append_index the remaining 1/5 against the
    FROZEN ``_codebook`` sidecar (batch codes through the shared
    ``_pq_codes_core`` kernel — exactly what a rebuild would assign),
    probe the appended artifact — and hold the INLINE
    similarity_ann_pq_adc oracle. append == rebuild == inline IS the
    maintenance contract (each equality also individually pytest-gated);
    this row makes the composition driver-verifiable on every dataset the
    harness generates. Corpora too small to split append an EMPTY batch —
    the degenerate no-op the append path must converge on, which the
    oracle then checks for free.

    Scale shape: the build is the one coding pass the inline query pays
    anyway; the append codes only the batch (bounded codebook broadcast)
    and rewrites the compact 12-byte-per-vector table through the staged
    swap protocol; the probe is the full-code-table ADC scan PQ serving
    is designed around. The temp artifact is deleted after the probe
    result materializes.
    """
    import shutil
    import tempfile

    e = load_table(spark, sf_dir, "embeddings")
    mx = e.agg(F.max("vec_id")).collect()[0][0]
    split = max(APPEND_SEED_FLOOR, int(((mx or 0) + 1) * 4 // 5))
    tmp = tempfile.mkdtemp(prefix="pq_appended_")
    try:
        pq_build_index(
            spark, sf_dir, tmp, vectors=e.filter(F.col("vec_id") < split)
        )
        pq_append_index(spark, tmp, e.filter(F.col("vec_id") >= split))
        return pq_probe_indexed(spark, tmp, sf_dir).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _fragment_index(
    spark: SparkSession,
    index_dir: str,
    n: int = 4,
    partition_col: "str | tuple[str, ...]" = "centroid_id",
) -> None:
    """Rewrite an index's lists fanned across ``n`` round-robin tasks —
    the file layout a PRODUCTION-parallelism build/append leaves (each
    written leaf gets one file per task holding its rows; local[32] at
    test scale coalesces to one). Rows are untouched; only the
    file-per-leaf count changes. Used by the compaction lifecycle query
    and its gates so ``index_compact`` genuinely rewrites at every scale
    instead of no-opping on toy single-file leaves.

    Scaffolding or not, it rewrites REAL artifacts inside registered
    queries, so it follows the in-place writers' completion-marker
    discipline (assert -> clear -> rewrite -> mark, the index_compact
    shape): a crash mid-rewrite must leave a loudly-torn artifact, never
    a marked index serving partial lists."""
    from ..functions.indexing import (
        assert_index_complete,
        clear_index_complete,
        mark_index_complete,
    )

    pcols = (
        [partition_col] if isinstance(partition_col, str) else list(partition_col)
    )
    assert_index_complete(spark, index_dir)
    frag = spark.read.parquet(index_dir).repartition(n).localCheckpoint(eager=True)
    clear_index_complete(spark, index_dir)
    (
        frag.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*pcols)
        .parquet(index_dir)
    )
    mark_index_complete(spark, index_dir)


@_register("similarity_ann_ivfpq_compacted", oracle=_ivfpq_oracle())
def similarity_ann_ivfpq_compacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full index LIFECYCLE verified end to end as a registered query:
    build the persisted IVF+PQ index on the base 4/5 of the corpus, append
    the remaining 1/5 against the frozen sidecar codebooks, fragment the
    lists into the multi-file-per-leaf layout a production-parallelism
    write leaves (``_fragment_index`` — local toy scale coalesces to one
    file per leaf, which would let compaction no-op), run
    ``index_compact`` over the artifact, probe — and still hold the
    INLINE similarity_ann_ivfpq oracle. build + append + fragment +
    compact + probe == inline IS the maintenance story: compaction
    rewrites bytes, never rows, so serving results cannot drift (also
    row-for-row pytest-gated; this row makes the composition
    driver-verifiable on every dataset the harness generates).

    Scale shape: compaction cost is one read+coalesce+write per
    OVER-FRAGMENTED leaf (file-count vs byte-size test, skipped when
    already stable), so a scheduled compact after each append window is
    O(fragmented lists), the same economics as the append itself.
    """
    import shutil
    import tempfile

    from ..functions.indexing import index_compact

    e = load_table(spark, sf_dir, "embeddings")
    mx = e.agg(F.max("vec_id")).collect()[0][0]
    split = max(APPEND_SEED_FLOOR, int(((mx or 0) + 1) * 4 // 5))
    tmp = tempfile.mkdtemp(prefix="ivfpq_compacted_")
    try:
        ivfpq_build_index(
            spark, sf_dir, tmp, vectors=e.filter(F.col("vec_id") < split)
        )
        ivfpq_append_index(spark, tmp, e.filter(F.col("vec_id") >= split))
        _fragment_index(spark, tmp)
        index_compact(spark, tmp)
        return ivfpq_probe_indexed(spark, tmp, sf_dir).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


_PQ_DELETE_CODES_WHERE = (
    f"AND c.vec_id < GREATEST({APPEND_SEED_FLOOR},"
    " (SELECT (MAX(vec_id) + 1) * 4 // 5 FROM embeddings))"
)


@_register(
    "similarity_ann_pq_deleted",
    oracle=_pq_adc_oracle(codes_where=_PQ_DELETE_CODES_WHERE),
)
def similarity_ann_pq_deleted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unpartitioned kind's DELETE path verified END TO END as a
    registered query: build the persisted PQ code table on the FULL
    corpus, pq_delete_index the top 1/5 of vec_ids (anti-join + the
    staged full-table swap), probe — and hold the inline ADC oracle with
    the CANDIDATE side restricted to the surviving corpus (queries and
    the frozen codebook are untouched; a shortlist or top-k slot that a
    deleted vector held must be refilled by the next-best survivor,
    which the oracle recomputes from scratch). delete == rebuild-without
    == inline-on-survivors, pairwise pytest-gated; with the appended row
    this puts the whole pq lifecycle under driver verification. The
    split floor keeps the query vectors and codebook seeds in the
    surviving base so both engines rank the same queries."""
    import shutil
    import tempfile

    e = load_table(spark, sf_dir, "embeddings")
    mx = e.agg(F.max("vec_id")).collect()[0][0]
    split = max(APPEND_SEED_FLOOR, int(((mx or 0) + 1) * 4 // 5))
    tmp = tempfile.mkdtemp(prefix="pq_deleted_")
    try:
        pq_build_index(spark, sf_dir, tmp)
        pq_delete_index(
            spark, tmp, e.filter(F.col("vec_id") >= split).select("vec_id")
        )
        return pq_probe_indexed(spark, tmp, sf_dir).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@_register("similarity_ann_ivfpq_maintained", oracle=_ivfpq_oracle())
def similarity_ann_ivfpq_maintained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCHEDULED maintenance composition verified end to end as a
    registered query: build + append + fragment (the production
    multi-file leaf layout), then run ``index_maintain`` — the exact
    report -> compact-iff-fragmented -> report frame ``jobs index
    --maintain`` invokes from cron — assert it actually compacted a
    complete artifact, probe, and still hold the INLINE
    similarity_ann_ivfpq oracle. The compacted row already pins
    ``index_compact`` itself; THIS row pins the scheduler's decision
    logic around it (fragmentation detection before, zero fragmented
    leaves and an intact marker after), so the cron path is
    driver-verified on every dataset the harness generates, not just
    CLI-gated.

    Scale shape: identical to the compacted row — the maintain pass adds
    two metadata-scale reports around the same O(fragmented lists)
    rewrite.
    """
    import shutil
    import tempfile

    from ..functions.indexing import index_maintain

    e = load_table(spark, sf_dir, "embeddings")
    mx = e.agg(F.max("vec_id")).collect()[0][0]
    split = max(APPEND_SEED_FLOOR, int(((mx or 0) + 1) * 4 // 5))
    tmp = tempfile.mkdtemp(prefix="ivfpq_maintained_")
    try:
        ivfpq_build_index(
            spark, sf_dir, tmp, vectors=e.filter(F.col("vec_id") < split)
        )
        ivfpq_append_index(spark, tmp, e.filter(F.col("vec_id") >= split))
        _fragment_index(spark, tmp)
        st = index_maintain(spark, tmp)
        # the lifecycle contract, asserted where the driver can see a
        # failure as a crashed query: maintain must have found the
        # fragmentation, repaired it, and left a whole artifact
        if st["fragmented_before"] == 0 and st["compacted"] is not None:
            raise AssertionError("maintain compacted a stable artifact")
        if st["fragmented_before"] > 0 and (
            st["compacted"] is None
            or st["fragmented_after"] != 0
            or not st["complete"]
        ):
            raise AssertionError(f"maintain did not converge: {st}")
        return ivfpq_probe_indexed(spark, tmp, sf_dir).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


_IVFPQ_DELETE_PRELUDE = (
    f"bounds AS (SELECT GREATEST({APPEND_SEED_FLOOR},"
    " (MAX(vec_id) + 1) * 4 // 5) AS split FROM embeddings),\n"
    "    base AS (SELECT e.* FROM embeddings e, bounds"
    " WHERE e.vec_id < split),\n    "
)


@_register(
    "similarity_ann_ivfpq_deleted",
    oracle=_ivfpq_oracle(src="base", prelude=_IVFPQ_DELETE_PRELUDE),
)
def similarity_ann_ivfpq_deleted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The vector-side DELETE path verified END TO END as a registered
    query: build the persisted IVF+PQ index on the FULL corpus,
    inverted_lists_delete the top 1/5 of vec_ids (touched lists
    rewritten, fully-emptied lists FS-removed, sidecar codebooks
    untouched), probe — and hold the inline oracle computed over the
    SURVIVING corpus only (the parametrized ``_ivfpq_oracle`` with every
    corpus reference pointed at the base CTE). delete == rebuild-without
    == inline-on-survivors is the contract (pairwise pytest-gated; this
    row verifies the composition on every dataset the harness
    generates). The split floor keeps the seed codebooks and the query
    vectors in the surviving base so both engines rank the same queries
    against the same centroids. Scale shape: build is the one
    assignment/coding pass; the delete is O(touched lists) discovered by
    a 12-bytes-per-vector column-pruned scan; the probe is the
    partition-pruned serving read.
    """
    import shutil
    import tempfile

    e = load_table(spark, sf_dir, "embeddings")
    mx = e.agg(F.max("vec_id")).collect()[0][0]
    split = max(APPEND_SEED_FLOOR, int(((mx or 0) + 1) * 4 // 5))
    tmp = tempfile.mkdtemp(prefix="ivfpq_deleted_")
    try:
        ivfpq_build_index(spark, sf_dir, tmp)
        inverted_lists_delete(
            spark, tmp, e.filter(F.col("vec_id") >= split).select("vec_id")
        )
        return ivfpq_probe_indexed(spark, tmp, sf_dir).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _ivfpq_stats_oracle() -> str:
    cos_assign = _COS_SQL.replace("qe", "e.embedding").replace("ne", "c.ce")
    return f"""
    WITH icent AS (
      SELECT vec_id AS centroid_id, embedding AS ce
      FROM embeddings WHERE vec_id < {IVF_NLIST}
    ),
    iac AS (
      SELECT e.vec_id, c.centroid_id, ROUND({cos_assign}, 6) AS c6
      FROM embeddings e JOIN icent c ON TRUE, generate_series(1, {DIM}) g(i)
      GROUP BY e.vec_id, c.centroid_id
    ),
    iranked AS (
      SELECT vec_id, centroid_id,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY c6 DESC, centroid_id) AS rn
      FROM iac
    ),
    iassign AS (SELECT vec_id, centroid_id FROM iranked WHERE rn = 1),
    cb AS (
      SELECT vec_id AS k, embedding AS ce FROM embeddings WHERE vec_id < {PQ_K}
    ),
    d AS (
      SELECT e.vec_id, s.sub, cb.k,
             ROUND(SUM((e.embedding[s.sub * {PQ_SUBDIM} + j.j]::DOUBLE
                        - cb.ce[s.sub * {PQ_SUBDIM} + j.j]::DOUBLE)
                       * (e.embedding[s.sub * {PQ_SUBDIM} + j.j]::DOUBLE
                          - cb.ce[s.sub * {PQ_SUBDIM} + j.j]::DOUBLE)), 6)
               AS d6
      FROM embeddings e
      CROSS JOIN generate_series(0, {PQ_M - 1}) s(sub)
      CROSS JOIN cb
      CROSS JOIN generate_series(1, {PQ_SUBDIM}) j(j)
      GROUP BY e.vec_id, s.sub, cb.k
    ),
    best AS (
      SELECT vec_id, sub, k,
             ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY d6, k) AS rn
      FROM d
    ),
    pq AS (
      SELECT vec_id,
             CAST(SUM(k * (CAST(1 AS BIGINT) << (4 * sub))) AS BIGINT)
               AS pq_code
      FROM best WHERE rn = 1 GROUP BY vec_id
    )
    SELECT CAST(a.centroid_id AS BIGINT) AS centroid_id,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(MIN(a.vec_id) AS BIGINT) AS min_vec_id,
           CAST(MAX(a.vec_id) AS BIGINT) AS max_vec_id,
           CAST(SUM(p.pq_code) AS BIGINT) AS code_checksum
    FROM iassign a JOIN pq p USING (vec_id)
    GROUP BY a.centroid_id
    ORDER BY centroid_id
    """


@_register("ivfpq_index_stats", oracle=_ivfpq_stats_oracle())
def ivfpq_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-inverted-list stats read FROM THE PERSISTED ARTIFACT — the
    oracle-backed core of the index freshness report (``jobs index
    --report`` adds the non-SQL-expressible operational columns: file
    counts, bytes, fragmentation, marker state).

    The query builds the IVF+PQ index on the base 4/5 of the corpus,
    appends the remaining 1/5 against the frozen sidecar codebooks, then
    aggregates the artifact's OWN rows per list: member count, vec_id
    range, and the sum of resident 32-bit PQ codes. The oracle recomputes
    every column from the raw embeddings table (full assignment + code
    math), so a green row proves the bytes ON DISK after a build+append
    cycle — partition membership AND resident codes — match what
    full-corpus math says they must be, row for row. The checksum is the
    strong part: one flipped nibble in one list breaks it.

    Scale shape: the report side is one partition-pruned-free scan of the
    index (codes are 12 bytes/vector, never the float vectors) rolled up
    map-side to NLIST rows.
    """
    import shutil
    import tempfile

    e = load_table(spark, sf_dir, "embeddings")
    mx = e.agg(F.max("vec_id")).collect()[0][0]
    split = max(APPEND_SEED_FLOOR, int(((mx or 0) + 1) * 4 // 5))
    tmp = tempfile.mkdtemp(prefix="ivfpq_stats_")
    try:
        ivfpq_build_index(
            spark, sf_dir, tmp, vectors=e.filter(F.col("vec_id") < split)
        )
        ivfpq_append_index(spark, tmp, e.filter(F.col("vec_id") >= split))
        idx = spark.read.parquet(tmp)
        return (
            idx.groupBy(F.col("centroid_id").cast("bigint").alias("centroid_id"))
            .agg(
                F.count("*").cast("bigint").alias("n_vectors"),
                F.min("vec_id").cast("bigint").alias("min_vec_id"),
                F.max("vec_id").cast("bigint").alias("max_vec_id"),
                F.sum("pq_code").cast("bigint").alias("code_checksum"),
            )
            .orderBy("centroid_id")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _ivf_stats_oracle() -> str:
    cos_assign = _COS_SQL.replace("qe", "e.embedding").replace("ne", "c.ce")
    return f"""
    WITH icent AS (
      SELECT vec_id AS centroid_id, embedding AS ce
      FROM embeddings WHERE vec_id < {IVF_NLIST}
    ),
    iac AS (
      SELECT e.vec_id, c.centroid_id, ROUND({cos_assign}, 6) AS c6
      FROM embeddings e JOIN icent c ON TRUE, generate_series(1, {DIM}) g(i)
      GROUP BY e.vec_id, c.centroid_id
    ),
    iranked AS (
      SELECT vec_id, centroid_id,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY c6 DESC, centroid_id) AS rn
      FROM iac
    ),
    iassign AS (SELECT vec_id, centroid_id FROM iranked WHERE rn = 1),
    vchk AS (
      SELECT e.vec_id,
             SUM(CAST(FLOOR(ABS(CAST(e.embedding[g.i] AS DOUBLE)) * 10000)
                      AS BIGINT)) AS vc
      FROM embeddings e, generate_series(1, {DIM}) g(i)
      GROUP BY e.vec_id
    )
    SELECT CAST(a.centroid_id AS BIGINT) AS centroid_id,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(MIN(a.vec_id) AS BIGINT) AS min_vec_id,
           CAST(MAX(a.vec_id) AS BIGINT) AS max_vec_id,
           CAST(SUM(v.vc) AS BIGINT) AS vector_checksum
    FROM iassign a JOIN vchk v USING (vec_id)
    GROUP BY a.centroid_id
    ORDER BY centroid_id
    """


@_register("ivf_index_stats", oracle=_ivf_stats_oracle())
def ivf_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-inverted-list stats read FROM THE PERSISTED full-vector IVF
    artifact — the ivfpq_index_stats twin for the non-PQ layout, so BOTH
    persisted vector layouts carry an oracle-backed freshness-report
    core. Build on the base 4/5, ivf_append_index the rest against the
    frozen ``_centroids`` sidecar, then aggregate the artifact's OWN
    rows per list: member count, vec_id range, and a checksum over the
    RESIDENT float vectors — per component, floor(|x| * 1e4) summed as
    exact integers (float32 -> float64 widening and IEEE double multiply
    are bit-identical across engines, and integer floor-sums are
    order-independent, so the checksum is deterministic where a float
    sum would not be). The oracle recomputes assignment AND checksum
    from the raw embeddings table, so a green row proves the bytes on
    disk after a build+append cycle — list membership and the resident
    vectors themselves — match full-corpus math. A single damaged
    component in a single resident vector breaks it.

    Scale shape: one scan of the index rolled up map-side to NLIST rows;
    the checksum folds inside the row (F.aggregate over the array), so
    nothing but (centroid_id, 4 longs) ever reaches the exchange.
    """
    import shutil
    import tempfile

    e = load_table(spark, sf_dir, "embeddings")
    mx = e.agg(F.max("vec_id")).collect()[0][0]
    split = max(APPEND_SEED_FLOOR, int(((mx or 0) + 1) * 4 // 5))
    tmp = tempfile.mkdtemp(prefix="ivf_stats_")
    try:
        ivf_build_index(
            spark, sf_dir, tmp, vectors=e.filter(F.col("vec_id") < split)
        )
        ivf_append_index(spark, tmp, e.filter(F.col("vec_id") >= split))
        idx = spark.read.parquet(tmp)
        vchk = F.aggregate(
            F.col("embedding"),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc
            + F.floor(F.abs(x.cast("double")) * F.lit(10000.0)).cast("bigint"),
        )
        return (
            idx.groupBy(F.col("centroid_id").cast("bigint").alias("centroid_id"))
            .agg(
                F.count("*").cast("bigint").alias("n_vectors"),
                F.min("vec_id").cast("bigint").alias("min_vec_id"),
                F.max("vec_id").cast("bigint").alias("max_vec_id"),
                F.sum(vchk).cast("bigint").alias("vector_checksum"),
            )
            .orderBy("centroid_id")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _pq_stats_oracle() -> str:
    return f"""
    WITH cb AS (
      SELECT vec_id AS k, embedding AS ce FROM embeddings WHERE vec_id < {PQ_K}
    ),
    d AS (
      SELECT e.vec_id, s.sub, cb.k,
             ROUND(SUM((e.embedding[s.sub * {PQ_SUBDIM} + j.j]::DOUBLE
                        - cb.ce[s.sub * {PQ_SUBDIM} + j.j]::DOUBLE)
                       * (e.embedding[s.sub * {PQ_SUBDIM} + j.j]::DOUBLE
                          - cb.ce[s.sub * {PQ_SUBDIM} + j.j]::DOUBLE)), 6)
               AS d6
      FROM embeddings e
      CROSS JOIN generate_series(0, {PQ_M - 1}) s(sub)
      CROSS JOIN cb
      CROSS JOIN generate_series(1, {PQ_SUBDIM}) j(j)
      GROUP BY e.vec_id, s.sub, cb.k
    ),
    best AS (
      SELECT vec_id, sub, k,
             ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY d6, k) AS rn
      FROM d
    ),
    pq AS (
      SELECT vec_id,
             CAST(SUM(k * (CAST(1 AS BIGINT) << (4 * sub))) AS BIGINT)
               AS pq_code
      FROM best WHERE rn = 1 GROUP BY vec_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(MIN(vec_id) AS BIGINT) AS min_vec_id,
           CAST(MAX(vec_id) AS BIGINT) AS max_vec_id,
           CAST(SUM(pq_code) AS BIGINT) AS code_checksum
    FROM pq
    """


@_register("pq_index_stats", oracle=_pq_stats_oracle())
def pq_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-table stats read FROM THE PERSISTED unpartitioned PQ code
    table after a build+append cycle — the stats row for the one index
    kind with no partitions to report per-list (the whole point of PQ
    serving is scanning the compact full table), completing the
    oracle-backed stats family across the vector layouts. The appended
    1/5 is coded against the FROZEN ``_codebook`` sidecar and merged
    through the crash-safe staged swap; the oracle recomputes count,
    vec_id range, and the 32-bit code checksum from the raw embeddings
    table, so a green row proves the post-swap bytes on disk are exactly
    what full-corpus code math assigns — one flipped nibble in one code
    breaks it, and so would a staged swap that dropped or duplicated a
    file. Scale shape: one scan of the 12-byte/vector code table folded
    map-side to a single row."""
    import shutil
    import tempfile

    e = load_table(spark, sf_dir, "embeddings")
    mx = e.agg(F.max("vec_id")).collect()[0][0]
    split = max(APPEND_SEED_FLOOR, int(((mx or 0) + 1) * 4 // 5))
    tmp = tempfile.mkdtemp(prefix="pq_stats_")
    try:
        pq_build_index(
            spark, sf_dir, tmp, vectors=e.filter(F.col("vec_id") < split)
        )
        pq_append_index(spark, tmp, e.filter(F.col("vec_id") >= split))
        return (
            spark.read.parquet(tmp)
            .agg(
                F.count("*").cast("bigint").alias("n_vectors"),
                F.min("vec_id").cast("bigint").alias("min_vec_id"),
                F.max("vec_id").cast("bigint").alias("max_vec_id"),
                F.sum("pq_code").cast("bigint").alias("code_checksum"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _ann_screen_oracle() -> str:
    cos_assign = _COS_SQL.replace("qe", "e.embedding").replace("ne", "c.ce")
    cos_q = _COS_SQL.replace("qe", "q.embedding").replace("ne", "c.ce")
    return f"""
    WITH bounds AS (
      SELECT GREATEST({APPEND_SEED_FLOOR},
                      (MAX(vec_id) + 1) * 4 // 5) AS split
      FROM embeddings
    ),
    cent AS (
      SELECT vec_id AS centroid_id, embedding AS ce
      FROM embeddings WHERE vec_id < {IVF_NLIST}
    ),
    base AS (SELECT e.* FROM embeddings e, bounds WHERE e.vec_id < split),
    batch AS (SELECT e.* FROM embeddings e, bounds WHERE e.vec_id >= split),
    ac AS (
      SELECT e.vec_id, c.centroid_id, ROUND({cos_assign}, 6) AS c6
      FROM base e JOIN cent c ON TRUE, generate_series(1, {DIM}) g(i)
      GROUP BY e.vec_id, c.centroid_id
    ),
    assign AS (
      SELECT vec_id, centroid_id FROM (
        SELECT vec_id, centroid_id,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY c6 DESC, centroid_id) AS rn
        FROM ac) WHERE rn = 1
    ),
    qac AS (
      SELECT q.vec_id AS query_id, c.centroid_id, ROUND({cos_q}, 6) AS c6
      FROM batch q JOIN cent c ON TRUE, generate_series(1, {DIM}) g(i)
      GROUP BY q.vec_id, c.centroid_id
    ),
    probes AS (
      SELECT query_id, centroid_id FROM (
        SELECT query_id, centroid_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY c6 DESC, centroid_id) AS rn
        FROM qac) WHERE rn <= {IVF_NPROBE}
    ),
    cand AS (
      SELECT p.query_id, a.vec_id AS neighbor_id
      FROM probes p JOIN assign a ON a.centroid_id = p.centroid_id
      WHERE a.vec_id != p.query_id
    ),
    p2 AS (
      SELECT cand.query_id, cand.neighbor_id,
             a.embedding AS qe, b.embedding AS ne
      FROM cand JOIN embeddings a ON a.vec_id = cand.query_id
                JOIN embeddings b ON b.vec_id = cand.neighbor_id
    ),
    d AS (SELECT query_id, neighbor_id, ROUND({_COS_SQL}, 6) AS c6
          FROM p2, generate_series(1, {DIM}) g(i)
          GROUP BY query_id, neighbor_id),
    best AS (
      SELECT query_id, neighbor_id, c6 FROM (
        SELECT query_id, neighbor_id, c6,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY c6 DESC, neighbor_id) AS rn
        FROM d) WHERE rn = 1
    )
    SELECT CAST(q.vec_id AS BIGINT) AS vec_id,
           CASE WHEN best.c6 >= {ANN_SCREEN_THRESHOLD}
                THEN 'near_dup_candidate' ELSE 'new' END AS verdict,
           CAST(best.neighbor_id AS BIGINT) AS match_id,
           best.c6 AS cosine
    FROM batch q LEFT JOIN best ON best.query_id = q.vec_id
    ORDER BY vec_id
    """


@_register("similarity_ann_screen", oracle=_ann_screen_oracle())
def similarity_ann_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming ANN ingest screen verified END TO END as a registered
    query: build the persisted IVF index on the base 4/5 of the corpus,
    screen the remaining 1/5 as the arriving batch through
    ``ann_screen_against_index``, and hold an oracle that recomputes
    every verdict from raw embeddings math (base-side assignment, probe
    ranking, exact top-1 cosine, threshold CASE). This is the frame
    ``run_stream_ann_screen`` applies per micro-batch — the embedding
    twin of the LSH/substring/winnow screen rows — so the driver verifies
    the serving path's routing on every dataset the harness generates.
    Corpora too small to split screen an EMPTY batch (zero rows, stable
    schema), which the oracle checks for free.
    """
    import shutil
    import tempfile

    e = load_table(spark, sf_dir, "embeddings")
    mx = e.agg(F.max("vec_id")).collect()[0][0]
    split = max(APPEND_SEED_FLOOR, int(((mx or 0) + 1) * 4 // 5))
    tmp = tempfile.mkdtemp(prefix="ann_screen_")
    try:
        ivf_build_index(
            spark, sf_dir, tmp, vectors=e.filter(F.col("vec_id") < split)
        )
        return ann_screen_against_index(
            spark, e.filter(F.col("vec_id") >= split), tmp
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _res_sq_expr() -> "F.Column":
    """Residual-space squared subdistance in micro-units, Spark side —
    the verbatim twin of _res_sq_sql over in-row arrays named
    (embedding-side) ``v``/``cv`` and (codebook-side) ``bv``/``bcv``:
    per element j, ((v - cv) - (bv - bcv))^2, left-fold summed in j
    order (the same order DuckDB's SUM scans its 8-element groups),
    rounded to 6dp then scaled to exact int64 micro-units."""
    idx = f"sub * {PQ_SUBDIM} + j"
    t = (
        f"((CAST(element_at(v, {idx}) AS DOUBLE)"
        f" - CAST(element_at(cv, {idx}) AS DOUBLE))"
        f" - (CAST(element_at(bv, {idx}) AS DOUBLE)"
        f"    - CAST(element_at(bcv, {idx}) AS DOUBLE)))"
    )
    sq = (
        f"aggregate(transform(sequence(1, {PQ_SUBDIM}), j -> {t} * {t}),"
        f" CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
    )
    return F.round(F.round(F.expr(sq), 6) * 1_000_000).cast("bigint")


def _residual_codebook_rows(e: DataFrame, cent_rows: list) -> list:
    """Driver-side residual codebook: the {PQ_K} seed vectors at vec_id
    [CB_BASE, CB_BASE+PQ_K) with the vector of their ASSIGNED centroid —
    a bounded collect + the _probe_lists top-1 ranking (bit-identical to
    the distributed assignment), so no extra corpus pass is spent
    assigning 16 rows. Raw seed vectors ride along (bv, bcv); residual
    arithmetic happens in the shared kernel expression."""
    seed_rows = sorted(
        e.filter(
            (F.col("vec_id") >= CB_BASE) & (F.col("vec_id") < CB_BASE + PQ_K)
        )
        .select("vec_id", "embedding")
        .collect(),
        key=lambda r: r["vec_id"],
    )
    assigned = dict(_probe_lists(cent_rows, seed_rows, 1))
    cent_by_id = {r["centroid_id"]: r["ce"] for r in cent_rows}
    return [
        (
            int(r["vec_id"]) - CB_BASE,
            r["embedding"],
            cent_by_id.get(assigned.get(int(r["vec_id"]))),
        )
        for r in seed_rows
    ]


@_register("similarity_ann_ivfpq_residual", oracle=_ivfpq_res_oracle())
def similarity_ann_ivfpq_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ with RESIDUAL encoding — the composition FAISS actually
    ships as IndexIVFPQ: codes quantize v - centroid(v), not v. Inside
    one inverted list every member shares its centroid, so the residual
    distribution is centered and much tighter than the raw vectors';
    the same {PQ_K}-codeword budget therefore spends its resolution on
    the part of the vector the IVF assignment has NOT already explained
    — the standard accuracy win of residual PQ over raw-vector PQ at
    identical bits (compare this row with ann_ivfpq in the recall
    scoreboard: the gap IS what residual encoding buys on this corpus).

    The cost asymmetry residual encoding introduces is the interesting
    part, and it is modeled faithfully: the ADC lookup table becomes
    per-(query, PROBED LIST) — |queries| x nprobe x {PQ_M} x {PQ_K}
    integer rows instead of |queries| x {PQ_M} x {PQ_K} — because the
    query's residual differs per probed centroid. Still bounded, still
    broadcast; candidates join their list's table on (query, centroid,
    sub, nibble). Codebook: residuals of the {PQ_K} seed vectors at
    vec_id [{CB_BASE}, {CB_BASE}+{PQ_K}) — deterministic and
    oracle-replayable (the PQ_K lowest ids are the IVF centroids
    themselves, whose residuals are identically zero: a degenerate
    codebook, so the NEXT {PQ_K} ids seed instead). Null-safe argmin via
    the coalesce-to-+inf ordering key (embedding_pq_codes' rule: Spark's
    struct-min sorts NULL first, the oracle's ORDER BY sorts it last).

    Scale shape: assignment is the gated map-only Arrow pass; corpus
    codes are one bounded-codebook broadcast join (allowlisted class) at
    {PQ_M} rows per vector; everything query-side is bounded-broadcast;
    only the {PQ_SHORTLIST}-row shortlist reads float vectors again.
    """
    e = load_table(spark, sf_dir, "embeddings")
    cent = e.filter(F.col("vec_id") < IVF_NLIST).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("ce")
    )
    cent_rows, query_rows = _seed_codebook_and_queries(e)
    assign = _assign_nearest_centroid(e, cent, cent_rows=cent_rows).select(
        "vec_id", "embedding", "centroid_id"
    )
    probes = spark.createDataFrame(
        _probe_lists(cent_rows, query_rows, IVF_NPROBE) or [],
        "query_id long, centroid_id long",
    )
    cb_lit = spark.createDataFrame(
        _residual_codebook_rows(e, cent_rows) or [],
        f"k long, bv array<float>, bcv array<float>",
    )
    # --- corpus codes over residuals: vector + ITS centroid ride in-row
    av = assign.join(F.broadcast(cent), "centroid_id").select(
        "vec_id",
        "centroid_id",
        F.col("embedding").alias("v"),
        F.col("ce").alias("cv"),
    )
    subs = av.select(
        "vec_id", "v", "cv",
        F.explode(F.expr(f"sequence(0, {PQ_M - 1})")).alias("sub"),
    )
    dist = subs.join(F.broadcast(cb_lit)).select(
        "vec_id", "sub", "k", _res_sq_expr().alias("dmic")
    )
    codes = (
        dist.groupBy("vec_id", "sub")
        .agg(
            F.min(
                F.struct(
                    F.coalesce(
                        F.col("dmic").cast("double"), F.lit(float("inf"))
                    ).alias("ord"),
                    F.col("k"),
                )
            ).alias("b")
        )
        .select(
            F.col("vec_id").alias("neighbor_id"), "sub", F.col("b.k").alias("k")
        )
    )
    # --- per-(query, probed list) ADC tables: bounded, broadcast
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    qp = (
        F.broadcast(probes)
        .join(F.broadcast(q), "query_id")
        .join(F.broadcast(cent), "centroid_id")
        .select(
            "query_id",
            "centroid_id",
            F.col("qe").alias("v"),
            F.col("ce").alias("cv"),
        )
    )
    qsubs = qp.select(
        "query_id", "centroid_id", "v", "cv",
        F.explode(F.expr(f"sequence(0, {PQ_M - 1})")).alias("sub"),
    )
    qd = qsubs.join(F.broadcast(cb_lit)).select(
        "query_id", "centroid_id", "sub", "k", _res_sq_expr().alias("dmic")
    )
    # --- candidates carry their list id; ADC joins the list's table
    cand = (
        F.broadcast(probes)
        .join(assign.select("vec_id", "centroid_id"), "centroid_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "centroid_id", F.col("vec_id").alias("neighbor_id"))
    )
    adc = (
        cand.join(codes, "neighbor_id")
        .join(F.broadcast(qd), ["query_id", "centroid_id", "sub", "k"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("dmic").alias("adc_micro"))
    )
    ws = Window.partitionBy("query_id").orderBy("adc_micro", "neighbor_id")
    short = (
        adc.withColumn("srn", F.row_number().over(ws))
        .filter(F.col("srn") <= PQ_SHORTLIST)
        .select("query_id", "neighbor_id")
    )
    ne = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ne"))
    scored = (
        short.join(F.broadcast(q), "query_id")
        .join(ne, "neighbor_id")
        .select(
            "query_id", "neighbor_id", cosine_arrow(F.col("qe"), F.col("ne")).alias("c")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("c").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.round("c", 6).alias("cosine"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def _residual_codes_packed(
    assign: DataFrame, cent: DataFrame, cb_lit: DataFrame
) -> DataFrame:
    """(vec_id, centroid_id, pq_code) residual codes for assigned vectors:
    each vector's residual v − centroid(v) is quantized per subspace
    against the (k, bv, bcv) residual codebook and packed into one 32-bit
    code — the kernel the residual build runs over the corpus and the
    append path runs over an ingest batch against the persisted sidecars
    (same null-safe argmin, same packing, so appended codes can never
    drift from a rebuild's)."""
    av = assign.join(F.broadcast(cent), "centroid_id").select(
        "vec_id",
        "centroid_id",
        F.col("embedding").alias("v"),
        F.col("ce").alias("cv"),
    )
    subs = av.select(
        "vec_id", "centroid_id", "v", "cv",
        F.explode(F.expr(f"sequence(0, {PQ_M - 1})")).alias("sub"),
    )
    dist = subs.join(F.broadcast(cb_lit)).select(
        "vec_id", "centroid_id", "sub", "k", _res_sq_expr().alias("dmic")
    )
    return (
        dist.groupBy("vec_id", "centroid_id", "sub")
        .agg(
            F.min(
                F.struct(
                    F.coalesce(
                        F.col("dmic").cast("double"), F.lit(float("inf"))
                    ).alias("ord"),
                    F.col("k"),
                )
            ).alias("b")
        )
        .groupBy("vec_id", "centroid_id")
        .agg(
            F.sum(
                F.expr("b.k * shiftleft(CAST(1 AS BIGINT), CAST(4 * sub AS INT))")
            )
            .cast("bigint")
            .alias("pq_code")
        )
    )


def ivfpq_residual_build_index(
    spark: SparkSession,
    sf_dir: str,
    index_dir: str,
    centroids: DataFrame | None = None,
    vectors: DataFrame | None = None,
) -> None:
    """Materialize the RESIDUAL IVF+PQ serving artifact — structurally
    the layout FAISS IndexIVFPQ persists (not its serialized byte format;
    this is Hive-partitioned parquet): inverted lists partitioned by
    assigned centroid, each member stored as its {PQ_M}-nibble RESIDUAL
    code (v - centroid quantized, not v), with the centroid codebook and
    the residual codebook (bv, bcv pairs) riding as sidecars. Completes
    the ladder ivfpq_build_index started: that index banks the IO
    savings; this one also banks residual encoding's recall (measured
    +0.025 recall@10 at identical bits on this corpus — the
    ann_ivfpq vs ann_ivfpq_res scoreboard rows).

    Build shape: one map-only assignment pass; codes are the bounded
    residual-codebook broadcast join packed per vector by one groupBy —
    int-row shuffles only; the write is scan -> assign -> code ->
    partitioned write.

    ``centroids``: optional (centroid_id, ce) codebook (e.g. from
    ivf_train_centroids), defaulting to the deterministic seed set —
    the ivf/ivfpq pluggable-codebook contract. NOTE residual codes DO
    depend on the IVF codebook (each vector quantizes v - ITS centroid),
    so unlike the raw-vector index a refined-codebook build re-derives
    both the residual codebook (seeds re-assigned against the refined
    centers) and every code; the probe always ranks and ADC-scores
    against the sidecars persisted WITH the index, so the pairing cannot
    drift.
    """
    from ..functions.indexing import (
        clear_index_complete,
        discard_stale_stages,
        mark_index_complete,
    )

    clear_index_complete(spark, index_dir)
    # stale-stage discipline at build start — see indexing.discard_stale_stages
    discard_stale_stages(spark, index_dir)
    e = vectors if vectors is not None else load_table(spark, sf_dir, "embeddings")
    if centroids is None:
        cent = e.filter(F.col("vec_id") < IVF_NLIST).select(
            F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("ce")
        )
        cent_rows, _ = _seed_codebook_and_queries(e)
    else:
        cent = centroids.select(
            "centroid_id", F.col("ce").cast("array<float>").alias("ce")
        ).localCheckpoint(eager=True)
        cent_rows = [
            {"centroid_id": r["centroid_id"], "ce": r["ce"]}
            for r in sorted(cent.collect(), key=lambda r: r["centroid_id"])
        ]
    assign = _assign_nearest_centroid(e, cent, cent_rows=cent_rows).select(
        "vec_id", "embedding", "centroid_id"
    )
    cb_lit = spark.createDataFrame(
        _residual_codebook_rows(e, cent_rows) or [],
        "k long, bv array<float>, bcv array<float>",
    )
    codes = _residual_codes_packed(assign, cent, cb_lit).select(
        "vec_id", "pq_code", "centroid_id"
    )
    codes.write.mode("overwrite").partitionBy("centroid_id").parquet(index_dir)
    cent.select(
        "centroid_id", F.col("ce").cast("array<float>").alias("ce")
    ).write.mode("overwrite").parquet(f"{index_dir}/_centroids")
    cb_lit.write.mode("overwrite").parquet(f"{index_dir}/_codebook")
    mark_index_complete(spark, index_dir)


def ivfpq_residual_append_index(
    spark: SparkSession, index_dir: str, batch: DataFrame, resume: bool = False
) -> None:
    """Append a batch of (vec_id, embedding) rows to the PERSISTED
    residual IVF+PQ index against its EXISTING sidecars: assignment uses
    the stored ``_centroids``, residual codes quantize v − centroid(v)
    against the stored (k, bv, bcv) ``_codebook`` — both frozen, so the
    appended codes are exactly what a rebuild with those codebooks would
    assign (gated by test) — then only the touched lists are rewritten.
    See ivfpq_append_index for the maintenance contract; the residual
    kernel is shared with the build (``_residual_codes_packed``)."""
    from ..functions.indexing import (
        assert_index_complete,
        clear_index_complete,
        mark_index_complete,
    )

    if not resume:
        assert_index_complete(spark, index_dir)
    cent = spark.read.parquet(f"{index_dir}/_centroids").select(
        "centroid_id", F.col("ce").cast("array<float>").alias("ce")
    )
    cb = spark.read.parquet(f"{index_dir}/_codebook").select(
        "k",
        F.col("bv").cast("array<float>").alias("bv"),
        F.col("bcv").cast("array<float>").alias("bcv"),
    )
    clear_index_complete(spark, index_dir)
    b = batch.select("vec_id", "embedding")
    assign = _assign_nearest_centroid(b, cent).select(
        "vec_id", "embedding", "centroid_id"
    )
    new = _residual_codes_packed(assign, cent, cb).select(
        "vec_id", "pq_code", "centroid_id"
    )
    _merge_into_lists(spark, index_dir, new)
    mark_index_complete(spark, index_dir)


def ivfpq_residual_probe_indexed(
    spark: SparkSession, index_dir: str, sf_dir: str, nprobe: int = IVF_NPROBE
) -> DataFrame:
    """Probe the persisted residual IVF+PQ index: rank queries against
    the stored centroids, read ONLY the probed lists (partition-path
    pruning), ADC-score the resident residual codes against the
    per-(query, probed list) lookup tables built from the stored
    codebooks, exact-rerank the shortlist. Result-equal to the inline
    similarity_ann_ivfpq_residual when built from the seed codebooks
    (gated by test) — the full FAISS serving loop, persisted end to end.
    """
    from ..functions.indexing import assert_index_complete

    assert_index_complete(spark, index_dir)
    e = load_table(spark, sf_dir, "embeddings")
    cent = spark.read.parquet(f"{index_dir}/_centroids").select(
        "centroid_id", F.col("ce").cast("array<float>").alias("ce")
    )
    cb = spark.read.parquet(f"{index_dir}/_codebook").select(
        "k",
        F.col("bv").cast("array<float>").alias("bv"),
        F.col("bcv").cast("array<float>").alias("bcv"),
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    qc = q.join(F.broadcast(cent)).select(
        "query_id",
        "centroid_id",
        F.round(cosine_arrow(F.col("qe"), F.col("ce")), 6).alias("c6"),
    )
    w_q = Window.partitionBy("query_id").orderBy(F.col("c6").desc(), "centroid_id")
    probes = (
        qc.withColumn("rn", F.row_number().over(w_q))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "centroid_id")
    )
    probe_rows = probes.collect()
    probed_ids = sorted({r.centroid_id for r in probe_rows})
    probes_lit = spark.createDataFrame(probe_rows, probes.schema)
    index = spark.read.parquet(index_dir).filter(
        F.col("centroid_id").isin(probed_ids)
    )
    cand = (
        F.broadcast(probes_lit)
        .join(index, "centroid_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "centroid_id",
            F.col("vec_id").alias("neighbor_id"), "pq_code",
        )
    )
    qp = (
        F.broadcast(probes_lit)
        .join(F.broadcast(q), "query_id")
        .join(F.broadcast(cent), "centroid_id")
        .select(
            "query_id", "centroid_id",
            F.col("qe").alias("v"), F.col("ce").alias("cv"),
        )
    )
    qsubs = qp.select(
        "query_id", "centroid_id", "v", "cv",
        F.explode(F.expr(f"sequence(0, {PQ_M - 1})")).alias("sub"),
    )
    qd = qsubs.join(F.broadcast(cb)).select(
        "query_id", "centroid_id", "sub", "k", _res_sq_expr().alias("dmic")
    )
    nibbles = cand.select(
        "query_id",
        "centroid_id",
        "neighbor_id",
        F.explode(F.expr(f"sequence(0, {PQ_M - 1})")).alias("sub"),
        "pq_code",
    ).select(
        "query_id",
        "centroid_id",
        "neighbor_id",
        "sub",
        F.expr("CAST(shiftright(pq_code, 4 * sub) & 15 AS BIGINT)").alias("k"),
    )
    adc = (
        nibbles.join(F.broadcast(qd), ["query_id", "centroid_id", "sub", "k"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("dmic").alias("adc_micro"))
    )
    ws = Window.partitionBy("query_id").orderBy("adc_micro", "neighbor_id")
    short = (
        adc.withColumn("srn", F.row_number().over(ws))
        .filter(F.col("srn") <= PQ_SHORTLIST)
        .select("query_id", "neighbor_id")
    )
    ne = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ne"))
    scored = (
        short.join(F.broadcast(q), "query_id")
        .join(ne, "neighbor_id")
        .select(
            "query_id", "neighbor_id", cosine_arrow(F.col("qe"), F.col("ne")).alias("c")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("c").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.round("c", 6).alias("cosine"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )
