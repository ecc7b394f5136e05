"""Deduplication operators over the ``documents`` table.

Extension tier (BASELINE.json north star): exact dedup, n-gram Jaccard
near-dup, MinHash+LSH near-dup, and SimHash near-dup — the standard
training-data dedup ladder, each expressed as DataFrame compositions with
deterministic md5-derived hashing (functions/hashing.py) so the DuckDB
oracle can replay every stage bit-for-bit.

Scale design (the point of each operator):

- exact:     one hash-groupBy on a 60-bit fingerprint — map-side partial agg,
             single shuffle keyed by fingerprint; at 100 TB the fingerprint
             (16 bytes) shuffles, never the document bodies.
- jaccard:   pairwise via an inverted-index self-join on shingles. This is
             quadratic in the worst case; it is the *verification* tool, not
             the discovery tool at scale.
- minhash:   the discovery tool: k=16 signatures, b=4 bands x r=4 rows.
             Candidate generation shuffles only (doc_id, band_key) pairs —
             O(docs x bands) — and exact Jaccard runs on candidates only.
             At j=0.9 the detect probability is ~0.986; at j=0.1 it is ~4e-4,
             so candidate volume stays near-linear in the true-dup count.
- simhash:   constant-size signature (one int64 per doc) + banded hamming
             join; cheapest at scale, coarsest recall.

Skew note: stop-shingles (shingles appearing in a large fraction of docs)
are the classic LSH hot key. The corpus here is small-vocab word salad, so
the inverted index is dense but bounded; a production run would cap shingle
document-frequency before the self-join (drop df > ~1e-4 of corpus) — left
exact here so the oracle comparison stays lossless.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions.hashing import hash60, hash60_spark_sql, hash60_sql
from ..functions.textfns import BIGRAM_EXPR, lower_ws_tokens
from ..tables import load_table

QUERIES = {}
ORACLES = {}

MINHASH_K = 16
MINHASH_BANDS = 4  # r = K / BANDS = 4 rows per band
# Universal-hash family over one base hash: h_i(s) = (a_i*h(s) + b_i) mod P.
# One md5 per shingle instead of K; the affine constants are fixed odd
# multipliers (any distinct constants < P work — only pairwise independence
# matters for MinHash accuracy).
MINHASH_PRIME = 1_073_741_789  # largest prime < 2^30: a*h+b stays < 2^63
MINHASH_A = [2 * i + 3 for i in range(MINHASH_K)]
MINHASH_B = [1000 * i + 7 for i in range(MINHASH_K)]
SIMHASH_BITS = 60
SIMHASH_BAND_BITS = 15  # 4 bands of 15 bits
JACCARD_THRESHOLD = 0.5
SIMHASH_MAX_HAMMING = 8


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# --- shared SQL fragments (DuckDB oracle side) -----------------------------

_TOKS_SQL = "regexp_split_to_array(lower(trim(text)), '\\s+')"

# 2-gram word shingles, one row per (doc_id, shingle).
_SHINGLES_CTE = (
    "t AS (SELECT doc_id, " + _TOKS_SQL + " AS toks FROM documents),\n"
    "idx AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks)-1)) AS i FROM t),\n"
    "shm AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] AS s FROM idx),\n"
    "sh AS (SELECT DISTINCT doc_id, s FROM shm)"
)

_JACCARD_TAIL = (
    "cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),\n"
    "common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common\n"
    "           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id\n"
    "           GROUP BY 1, 2)\n"
    "SELECT doc_a, doc_b,\n"
    "       ROUND(common * 1.0 / (ca.n + cb.n - common), 6) AS jaccard\n"
    "FROM common JOIN cnt ca ON ca.doc_id = doc_a\n"
    "            JOIN cnt cb ON cb.doc_id = doc_b\n"
    "WHERE common * 1.0 / (ca.n + cb.n - common) >= {thr}"
)


# --- shared Spark builders -------------------------------------------------


def _shingles(d: DataFrame, distinct: bool = True) -> DataFrame:
    """(doc_id, s): 2-gram word shingles of lowercased text.

    Spark arrays are 0-indexed and DuckDB's are 1-indexed; both loops emit
    exactly the (token[j], token[j+1]) adjacent pairs. Docs with <2 tokens
    are filtered (DuckDB's generate_series is empty there; Spark's sequence
    would count *down* and fabricate shingles).
    """
    toks = lower_ws_tokens("text")
    t = d.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= 2)
    shm = t.select(
        "doc_id",
        F.explode(
            F.expr(BIGRAM_EXPR)
        ).alias("s"),
    )
    return shm.distinct() if distinct else shm


def _doc_shingle_sets(d: DataFrame) -> DataFrame:
    """(doc_id, sset: array<bigint>, n) — each doc's distinct hashed-bigram
    set assembled IN-ROW, with no shuffle at all.

    A document's shingles all live in its own row, so the explode →
    groupBy(collect_set) round-trip is pure waste: ``array_distinct`` over
    the bigram array builds the identical set map-side. Per-row state is
    bounded by the document's own length — the same bound collect_set's
    aggregation state had — but the plan loses one corpus-scale exchange
    and one serial AQE stage. Values match the exploded path bit-for-bit:
    same tokenizer contract, same hash60 family, same sort order.
    """
    t = d.select(
        "doc_id", lower_ws_tokens("text").alias("toks")
    ).filter(F.size("toks") >= 2)
    # The coalesce is a NULLABILITY ANNOTATION, not a value change: the
    # size(toks) >= 2 filter already drops NULL-token rows, so the empty-array
    # branch never fires. Without it, a downstream join condition touching
    # sset makes InferFiltersFromConstraints add isnotnull(sset) and push it
    # THROUGH this projection — re-inlining the whole nested
    # transform/sequence tree (split() re-evaluated per element) as an
    # interpreted filter, a measured 6x slowdown of the broadcast-build
    # stage. A non-nullable sset infers no constraint.
    #
    # Spelled as ONE parsed-SQL expression (hash60_spark_sql parses to the
    # identical tree as the hash60 Column form, property-gated): the nested
    # transform/coalesce chain was ~30 py4j round trips per plan build.
    sset = F.expr(
        "coalesce(sort_array(array_distinct(transform("
        f"{BIGRAM_EXPR}, s -> {hash60_spark_sql('s')}"
        "))), CAST(array() AS ARRAY<BIGINT>))"
    )
    return t.select("doc_id", sset.alias("sset")).withColumn(
        "n", F.size("sset")
    )


def _pair_jaccard_sets(sets: DataFrame, pairs: DataFrame) -> DataFrame:
    """Exact Jaccard for candidate ``pairs`` given per-doc shingle sets.

    ONE broadcast of the set table serves both pair-side joins — the two
    join sides are alias references to the identical broadcast child, so
    their BroadcastExchanges canonicalize equal and Spark reuses the first
    build (ReusedExchange). ``array_intersect`` then computes overlap in a
    single map stage. Candidate docs are the near-dup fraction, so the
    broadcast is candidate-bounded, never corpus-scale.
    """
    sa = F.broadcast(sets).alias("sa")
    sb = F.broadcast(sets).alias("sb")
    return (
        pairs.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .withColumn(
            "common",
            F.size(F.array_intersect(F.col("sa.sset"), F.col("sb.sset"))),
        )
        .withColumn(
            "jaccard",
            F.col("common")
            * F.lit(1.0)
            / (F.col("sa.n") + F.col("sb.n") - F.col("common")),
        )
        .select("doc_a", "doc_b", "common", "jaccard")
    )


def _doc_shingle_string_sets(d: DataFrame) -> DataFrame:
    """(doc_id, sarr: array<string>, n) — each doc's distinct RAW-STRING
    2-gram shingle set assembled IN-ROW, with no shuffle at all: the
    string twin of :func:`_doc_shingle_sets` for consumers whose oracle
    joins raw shingles (containment / all-pairs Jaccard).

    The explode → ``.distinct()`` spelling pays a corpus-scale exchange to
    dedup rows that all live in their source row already, and its
    consumers pay ANOTHER corpus exchange (``groupBy(doc_id).count()``) to
    learn set sizes the array carries for free (guide §2.4: remove
    shuffles outright). Set membership and size are identical to the
    exploded path: same tokenizer contract, same bigram expression,
    ``array_distinct`` keeps first occurrence.

    The coalesce is the same NULLABILITY ANNOTATION as _doc_shingle_sets
    (the empty-array branch never fires past the size filter); it keeps
    InferFiltersFromConstraints from pushing an isnotnull through this
    projection and re-inlining the transform tree as an interpreted
    filter.
    """
    t = d.select(
        "doc_id", lower_ws_tokens("text").alias("toks")
    ).filter(F.size("toks") >= 2)
    sarr = F.expr(
        f"coalesce(array_distinct({BIGRAM_EXPR}), CAST(array() AS ARRAY<STRING>))"
    )
    return t.select("doc_id", sarr.alias("sarr")).withColumn("n", F.size("sarr"))


def _all_pairs_jaccard(d: DataFrame) -> DataFrame:
    """All-pairs exact Jaccard via the inverted-index self-join — the only
    way to avoid enumerating the quadratic pair space.

    Physical shape (round 15, guide §2.4): per-doc set sizes ride THROUGH
    the exploded stream as an extra long per row, so the pair aggregate
    already knows na/nb — no separate ``groupBy(doc_id).count()`` corpus
    exchange and no post-aggregation joins back to a counts table. The
    map-side distinct (:func:`_doc_shingle_string_sets`) removes the
    ``.distinct()`` exchange too: the whole query is scan → in-row sets →
    explode → one reused (s)-keyed exchange pair → pair aggregate.
    Columns: (doc_a, na, doc_b, nb, common, jaccard).
    """
    ex = _doc_shingle_string_sets(d).select(
        "doc_id", "n", F.explode("sarr").alias("s")
    )
    a = ex.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"), "s")
    b = ex.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"), "s")
    common = (
        a.join(b, ["s"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "na", "doc_b", "nb")
        .agg(F.count("*").alias("common"))
    )
    return common.withColumn(
        "jaccard",
        F.col("common") * F.lit(1.0) / (F.col("na") + F.col("nb") - F.col("common")),
    )


# --- operators -------------------------------------------------------------


@_register(
    "dedup_exact",
    oracle=(
        "WITH fp AS (SELECT doc_id,\n"
        "  " + hash60_sql("lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))") + " AS fp60\n"
        "  FROM documents)\n"
        "SELECT fp60, MIN(doc_id) AS keep_doc_id, COUNT(*) AS copies\n"
        "FROM fp GROUP BY fp60"
    ),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on the normalized-text fingerprint, keep the
    lowest doc_id per group. One shuffle of (fp60, doc_id) pairs only."""
    d = load_table(spark, sf_dir, "documents")
    normalized = F.lower(F.regexp_replace(F.trim(F.col("text")), "\\s+", " "))
    return (
        d.select("doc_id", hash60(normalized).alias("fp60"))
        .groupBy("fp60")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("copies"))
    )


@_register(
    "dedup_ngram_jaccard",
    oracle="WITH "
    + _SHINGLES_CTE
    + ",\n"
    + _JACCARD_TAIL.format(thr=JACCARD_THRESHOLD),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs n-gram Jaccard near-dup (the exact/verification path).

    Inverted-index self-join on 2-gram shingles -> per-pair intersection
    counts -> Jaccard >= 0.5. Quadratic blow-up is bounded by shingle
    selectivity; at scale this runs only on LSH candidates (see
    dedup_minhash_lsh).
    """
    d = load_table(spark, sf_dir, "documents")
    out = _all_pairs_jaccard(d)
    return out.filter(F.col("jaccard") >= JACCARD_THRESHOLD).select(
        "doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard")
    )


def _minhash_oracle_parts() -> tuple[str, str]:
    """(CTE chain, final pair-select) of the MinHash+LSH oracle, separated
    so dedup_clusters can embed the pair derivation as its edge source."""
    base = hash60_sql("s")
    r = MINHASH_K // MINHASH_BANDS
    min_cols = ", ".join(
        f"MIN(({MINHASH_A[i]} * (base % {MINHASH_PRIME}) + {MINHASH_B[i]})"
        f" % {MINHASH_PRIME}) AS m{i}"
        for i in range(MINHASH_K)
    )
    band_rows = ",\n                ".join(
        "({b}, md5({key}))".format(
            b=b,
            key=" || ',' || ".join(f"m{b * r + j}::VARCHAR" for j in range(r)),
        )
        for b in range(MINHASH_BANDS)
    )
    ctes = (
        _SHINGLES_CTE
        + ",\n"
        + f"hb AS (SELECT doc_id, {base} AS base FROM sh),\n"
        + f"mh AS (SELECT doc_id, {min_cols} FROM hb GROUP BY doc_id),\n"
        + "bands AS (SELECT doc_id, bb.band, bb.bkey\n"
        + "          FROM mh, LATERAL (VALUES\n"
        + f"                {band_rows}) AS bb(band, bkey)),\n"
        + "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b\n"
        + "         FROM bands a JOIN bands b\n"
        + "           ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),\n"
        # Verification runs on HASHED shingle sets (see dedup_minhash_lsh:
        # the Spark side intersects 60-bit hashes, not strings), so the
        # oracle counts/joins the same hashed domain — bit-identical in the
        # oracle hash family.
        + f"hsh AS (SELECT DISTINCT doc_id, {hash60_sql('s')} AS h FROM shm),\n"
        + "cnt AS (SELECT doc_id, count(*) AS n FROM hsh GROUP BY doc_id),\n"
        + "common AS (SELECT c.doc_a, c.doc_b, count(*) AS common\n"
        + "           FROM cand c JOIN hsh a ON a.doc_id = c.doc_a\n"
        + "                       JOIN hsh b ON b.doc_id = c.doc_b AND b.h = a.h\n"
        + "           GROUP BY 1, 2)"
    )
    final = (
        "SELECT doc_a, doc_b,\n"
        "       ROUND(common * 1.0 / (ca.n + cb.n - common), 6) AS jaccard\n"
        "FROM common JOIN cnt ca ON ca.doc_id = doc_a\n"
        "            JOIN cnt cb ON cb.doc_id = doc_b\n"
        f"WHERE common * 1.0 / (ca.n + cb.n - common) >= {JACCARD_THRESHOLD}"
    )
    return ctes, final


def _minhash_oracle() -> str:
    ctes, final = _minhash_oracle_parts()
    return "WITH " + ctes + "\n" + final


def _minhash_signature_table(d: DataFrame) -> DataFrame:
    """(doc_id, m0..m{K-1}) — all K min-hashes in ONE groupBy pass over one
    base hash per shingle (see _minhash_candidates for the cost analysis).

    The explode + groupBy shape is deliberate, re-validated after an
    in-row rewrite attempt: computing the K minima as array_min folds over
    an in-row base array avoids this shuffle but pays 1.5x scan-stage CPU
    (higher-order functions evaluate interpreted, outside whole-stage
    codegen) and drives Catalyst optimization time super-linear on the
    16-transform expression tree (~5 s of planning per query at ANY data
    size). The exploded stream keeps every hot expression inside codegen;
    the shuffle it pays carries |docs| x K integers after map-side partial
    mins — docs' shingles are scan-local, so the partial aggregation
    already reduces to one row per doc before the exchange.
    """
    base = hash60(F.col("s")) % MINHASH_PRIME
    hb = _shingles(d, distinct=False).select("doc_id", base.alias("base"))
    # One parsed-SQL expression per aggregate instead of ~8 chained Column
    # ops: the K=16 min-aggs were the single largest py4j round-trip source
    # in the engine (~130 driver<->JVM socket turns per plan build, ~0.2 s
    # of the query's driver-side latency at any data size). The parsed tree
    # is IDENTICAL to the Column spelling (optimized-plan strings compare
    # equal after expr-id canonicalization), so plans, results, and the
    # oracle contract are untouched — only the build-time chatter goes.
    return hb.groupBy("doc_id").agg(
        *[
            F.expr(
                f"min(({MINHASH_A[i]} * base + {MINHASH_B[i]})"
                f" % {MINHASH_PRIME}) AS m{i}"
            )
            for i in range(MINHASH_K)
        ]
    )


def _minhash_candidates(d: DataFrame) -> DataFrame:
    """LSH candidate pairs (doc_a, doc_b) from the banded minhash index.

    All 16 min-hashes in ONE groupBy(doc_id) pass over ONE base hash per
    shingle: the universal-hash family derives h_i = (a_i*h + b_i) mod P
    from the shared base, so per-row cost is one hash + K integer ops, and
    the only corpus-scale shuffle carries |docs| x K integers (map-side
    partial mins). At 100 TB this is the difference between hashing the
    corpus K times and once.

    The band index (4 small rows per doc) carries NO localCheckpoint cut
    point: both self-join sides hang off the SAME groupBy(doc_id) shuffle,
    which Spark reuses (ReusedExchange — gated by
    tests/test_plans.py::test_banded_self_join_reuses_signature_exchange),
    so the corpus-scale shingle scan + partial aggregation run exactly once;
    only the doc-scale band projection (4 md5s/doc) is duplicated. Skipping
    the checkpoint avoids a doc-scale materialization to executor-local disk
    and one serial job barrier.
    """
    mins = _minhash_signature_table(d)
    r = MINHASH_K // MINHASH_BANDS
    # One parsed-SQL explode instead of 4 struct()/md5()/concat_ws() Column
    # chains — same py4j-thinning as the signature aggregates above; the
    # parsed expression tree is identical (explicit CASTs keep the
    # bigint->string coercion the Column spelling had under ANSI mode).
    struct_sql = ", ".join(
        "struct({b} AS band, md5(concat_ws(',', {cols})) AS bkey)".format(
            b=band,
            cols=", ".join(
                f"CAST(m{band * r + j} AS STRING)" for j in range(r)
            ),
        )
        for band in range(MINHASH_BANDS)
    )
    bands = mins.select(
        "doc_id", F.expr(f"explode(array({struct_sql}))").alias("bc")
    ).select("doc_id", "bc.band", "bc.bkey")
    a = bands.select(F.col("doc_id").alias("doc_a"), "band", "bkey")
    b = bands.select(F.col("doc_id").alias("doc_b"), "band", "bkey")
    return (
        a.join(b, ["band", "bkey"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        # The repartition is load-bearing, not cosmetic: it pins an EXPLICIT
        # shuffle exchange on the pair stream, giving the candidate subtree a
        # planner-independent AQE materialization point. Without it, whenever
        # the planner broadcasts the band join (runtime stats at small SF),
        # the join output's stream-side partitioning satisfies the distinct
        # and NO exchange survives between the candidate pipeline and its
        # three consumers in dedup_minhash_lsh — each then re-executes the
        # corpus-scale signature pipeline from the scan (observed: 14 scans,
        # 3x wall time). The pair stream is candidate-scale, so the exchange
        # itself is cheap at any SF; distinct then runs exchange-free on top.
        .repartition("doc_a", "doc_b")
        .distinct()
    )

@_register("dedup_minhash_lsh", oracle=_minhash_oracle())
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-dup: the 100 TB discovery path.

    shingle -> k=16 salted min-hashes -> 4 bands x 4 rows -> band-bucket
    self-join -> exact-Jaccard verification of candidates only.

    Candidate generation never materializes the quadratic pair space: the
    band join shuffles (band, band_key) — 4 small rows per doc — and only
    colliding buckets produce pairs. Hash family is the deterministic
    md5-based hash60, so Spark and the oracle agree on every signature.

    Shuffle discipline (the sf0.1 profile drove these choices):

    - Signatures read the RAW shingle stream: MIN is duplicate-insensitive,
      so the corpus-wide ``distinct()`` shuffle is skipped entirely — the
      only corpus-scale shuffle is the map-side-combined groupBy(doc_id).
    - Verification re-derives shingles from the candidate docs only
      (a broadcast semi-join on the candidate id set), and builds each
      doc's shingle set IN-ROW (_doc_shingle_sets: array_distinct over the
      bigram array — a doc's shingles never leave its row), so verification
      adds NO shuffle at all: the pruned scan feeds the set broadcast
      directly. At 100 TB the candidate set is the interesting fraction of
      the data; the corpus-sized shingle index is never shuffled or pinned.
    - Verification intersects 60-bit shingle HASHES, not strings: the
      collect_set aggregation state, the broadcast set table, and every
      array_intersect comparison carry 8-byte longs instead of ~15-byte
      shingle strings (~2x smaller state, integer compares). The oracle
      counts the same hashed domain, so Jaccard stays bit-identical in the
      oracle hash family; a hash collision would shift both engines
      identically (and is ~2^-60 per pair).
    """
    d = load_table(spark, sf_dir, "documents")
    # ONE plan, no cut point: the candidate subtree appears three times
    # below (pair stream + both branches of the id union), but all three
    # hang off the identical (doc_a, doc_b)-distinct exchange, which AQE
    # canonicalizes equal and serves from one materialization
    # (ReusedExchange — gated by tests/test_plans.py::
    # test_minhash_full_query_reuses_candidate_exchange). The corpus-scale
    # signature pipeline therefore runs exactly once, same as the previous
    # localCheckpoint design, minus the serial checkpoint barrier and minus
    # the multi-MiB task binaries the checkpointed RDD's captured lineage
    # put into every downstream stage (the r02 bench's "broadcasting large
    # task binary" warnings).
    cand = _minhash_candidates(d)
    # Exact-Jaccard verification over candidate docs only: the broadcast
    # semi-join prunes the corpus scan, and the per-doc shingle sets are
    # assembled in-row (map-only — no explode, no collect_set shuffle), so
    # the verification half of the plan contributes zero exchanges beyond
    # its two broadcasts.
    #
    # The id list is NOT de-duplicated: a LEFT SEMI join keys the probe on
    # set membership, so the broadcast hash build absorbs duplicate ids and
    # the union feeds it directly — one fewer exchange (and one fewer
    # serial AQE stage) than union().distinct(), worth ~0.2 s of the
    # query's stage-chain floor at sf0.1 (and nothing at 100 TB, where the
    # build is candidate-bounded either way).
    cand_ids = cand.select(F.col("doc_a").alias("doc_id")).union(
        cand.select(F.col("doc_b").alias("doc_id"))
    )
    sets = _doc_shingle_sets(
        d.join(F.broadcast(cand_ids), "doc_id", "left_semi")
    )
    verified = _pair_jaccard_sets(sets, pairs=cand)
    return verified.filter(F.col("jaccard") >= JACCARD_THRESHOLD).select(
        "doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard")
    )


def _overlap_spans_oracle() -> str:
    from .text import _rolling_oracle

    ctes, final = _minhash_oracle_parts()
    return f"""
    WITH {ctes},
    mpairs AS ({final}),
    roll AS ({_rolling_oracle()}),
    shared AS (
      SELECT p.doc_a, p.doc_b, ra.chunk_hash,
             MIN(ra.pos) AS pa, MIN(rb.pos) AS pb
      FROM mpairs p
      JOIN roll ra ON ra.doc_id = p.doc_a
      JOIN roll rb ON rb.doc_id = p.doc_b AND rb.chunk_hash = ra.chunk_hash
      GROUP BY p.doc_a, p.doc_b, ra.chunk_hash
    )
    SELECT doc_a, doc_b,
           CAST(COUNT(*) AS BIGINT) AS shared_chunks,
           MIN(pa) AS first_pos_a,
           MIN(pb) AS first_pos_b
    FROM shared GROUP BY doc_a, doc_b
    ORDER BY doc_a, doc_b
    """


@_register("dedup_pair_overlap_spans", oracle=_overlap_spans_oracle())
def dedup_pair_overlap_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE does the duplication live: for each verified near-dup pair,
    the content-defined chunks (doc_rolling_fingerprint's rsync/LBFS
    boundaries) present in BOTH documents, with each side's first shared
    token position. The explanation surface between the dedup verdict and
    the raw text — "these two docs share 7 chunks starting at token 12
    vs token 380" distinguishes a quoted block from a whole-document copy
    without anyone re-reading the corpus.

    Composes two existing streams: the verified pair table (near-dup-
    bounded) broadcasts into two probes of the rolling-fingerprint stream
    (map-only per doc), and the rollup is pair x shared-chunk sized.
    Pairs sharing NO boundary chunk are absent by design — boundaries
    sample ~1/64 of windows, so absence means the overlap is shorter than
    a chunk, which is itself the answer.
    """
    from .text import doc_rolling_fingerprint

    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    roll = doc_rolling_fingerprint(spark, sf_dir)
    ra = roll.select(
        F.col("doc_id").alias("doc_a"),
        F.col("pos").alias("pa"),
        "chunk_hash",
    )
    rb = roll.select(
        F.col("doc_id").alias("doc_b"),
        F.col("pos").alias("pb"),
        "chunk_hash",
    )
    shared = (
        F.broadcast(pairs)
        .join(ra, "doc_a")
        .join(rb, ["doc_b", "chunk_hash"])
        .groupBy("doc_a", "doc_b", "chunk_hash")
        .agg(F.min("pa").alias("pa"), F.min("pb").alias("pb"))
    )
    return (
        shared.groupBy("doc_a", "doc_b")
        .agg(
            F.count("*").cast("bigint").alias("shared_chunks"),
            F.min("pa").alias("first_pos_a"),
            F.min("pb").alias("first_pos_b"),
        )
        .orderBy("doc_a", "doc_b")
    )


def _estimator_audit_oracle() -> str:
    ctes, final = _minhash_oracle_parts()
    agree = " + ".join(
        f"CASE WHEN a.m{i} = b.m{i} THEN 1 ELSE 0 END" for i in range(MINHASH_K)
    )
    return f"""
    WITH {ctes},
    pairs AS ({final}),
    ag AS (
      SELECT p.doc_a, p.doc_b, p.jaccard, CAST({agree} AS BIGINT) AS agree
      FROM pairs p JOIN mh a ON a.doc_id = p.doc_a
                   JOIN mh b ON b.doc_id = p.doc_b
    )
    SELECT doc_a, doc_b, agree,
           ROUND(agree / {MINHASH_K}.0, 6) AS jaccard_est,
           jaccard,
           ROUND(agree / {MINHASH_K}.0 - jaccard, 6) AS est_err
    FROM ag ORDER BY doc_a, doc_b
    """


@_register("dedup_minhash_estimator_audit", oracle=_estimator_audit_oracle())
def dedup_minhash_estimator_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator calibration: signature-agreement Jaccard estimate
    (agree/K, the unbiased MinHash estimator) next to the EXACT Jaccard on
    every verified near-dup pair. dedup_threshold_curve calibrates the
    THRESHOLDS; this audits the ESTIMATOR the banding math is built on —
    a systematic est_err means the hash family or K is wrong for this
    corpus (expected spread at K={MINHASH_K} is ~sqrt(j(1-j)/K) ≈ 0.12),
    and that error feeds directly into the band false-negative rate.

    Shape: the verified pair table (near-dup-bounded) broadcasts into two
    probes of the signature table — the corpus streams through the one
    signature groupBy it already pays in the discovery path; agreement is
    K integer equality tests per pair, summed map-side. Every compared
    quantity is integer-derived, so the cross-engine hash is exact.
    """
    d = load_table(spark, sf_dir, "documents")
    pairs = dedup_minhash_lsh(spark, sf_dir)
    sig = _minhash_signature_table(d)
    sa = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"m{i}").alias(f"a{i}") for i in range(MINHASH_K)],
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"m{i}").alias(f"b{i}") for i in range(MINHASH_K)],
    )
    agree = sum(
        (F.col(f"a{i}") == F.col(f"b{i}")).cast("int") for i in range(MINHASH_K)
    ).cast("bigint")
    est = F.round(F.col("agree") / float(MINHASH_K), 6)
    return (
        F.broadcast(pairs)
        .join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("agree", agree)
        .select(
            "doc_a",
            "doc_b",
            "agree",
            est.alias("jaccard_est"),
            "jaccard",
            F.round(F.col("agree") / float(MINHASH_K) - F.col("jaccard"), 6).alias(
                "est_err"
            ),
        )
        .orderBy("doc_a", "doc_b")
    )


def _clusters_oracle_parts() -> tuple[str, str]:
    """(recursive CTE chain, final member select) of the cluster oracle,
    separated so dedup_survivors can join the membership as a subquery."""
    ctes, final = _minhash_oracle_parts()
    chain = f"""{ctes},
    pairs AS ({final}),
    edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
    reach(src, dst) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
    ),
    members AS (
      SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
      FROM reach GROUP BY src
    )"""
    final_select = (
        "SELECT cluster_id, doc_id,\n"
        "       CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size\n"
        "FROM members"
    )
    return chain, final_select


def _clusters_oracle() -> str:
    chain, final_select = _clusters_oracle_parts()
    return f"""
    WITH RECURSIVE {chain}
    {final_select}
    ORDER BY cluster_id, doc_id
    """


@_register("dedup_clusters", oracle=_clusters_oracle())
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster resolution: verified near-dup pairs -> connected
    components -> (cluster_id, doc_id, cluster_size).

    The last stage of the dedup pipeline: pairwise output is not
    actionable until transitive duplicates collapse into one group with a
    canonical representative (the min doc_id, which IS the cluster_id).

    Algorithm: iterative min-label propagation. Every vertex starts
    labeled with itself; each round takes the min of its own and its
    neighbors' labels; convergence (no label changed) is reached after
    ~diameter rounds. Scale shape:

    - All state is SUBGRAPH-scale — vertices and edges of the near-dup
      pair graph (the interesting fraction of the corpus), never corpus-
      scale. Each round is one shuffle keyed by doc_id over that subgraph.
    - ``localCheckpoint`` truncates lineage every round — without it the
      plan doubles per iteration and Catalyst re-derives the whole LSH
      pipeline each round.
    - Near-dup clusters are shallow (dup chains, not long paths), so the
      round count is small and data-independent of corpus size. A corpus
      with adversarially long chains would switch to the alternating
      large-star/small-star formulation (O(log n) rounds, same per-round
      shape); plain propagation is the right default here.

    DuckDB oracle: recursive-CTE transitive closure with min-label
    aggregation — tractable because the pair graph is candidate-scale.
    """
    pairs = (
        dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b").localCheckpoint()
    )
    edges = (
        pairs.union(pairs.select(F.col("doc_b"), F.col("doc_a")))
        .toDF("src", "dst")
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .localCheckpoint()
    )
    while True:
        nbr = (
            edges.join(labels, edges["src"] == labels["doc_id"])
            .select(F.col("dst").alias("doc_id"), "label")
            .groupBy("doc_id")
            .agg(F.min("label").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr, "doc_id", "left")
            .select(
                "doc_id",
                F.least(F.col("label"), F.coalesce("nbr_min", "label")).alias(
                    "label"
                ),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.join(
                labels.withColumnRenamed("label", "old"), "doc_id"
            )
            .filter(F.col("label") != F.col("old"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    from pyspark.sql import Window

    return labels.select(
        F.col("label").alias("cluster_id"),
        "doc_id",
        F.count("*").over(Window.partitionBy("label")).alias("cluster_size"),
    ).orderBy("cluster_id", "doc_id")


PAGERANK_ITERS = 3
PAGERANK_SCALE = 10**12  # pico-unit integer mass
PAGERANK_D_NUM = 85  # damping 0.85 as the exact rational 85/100
PAGERANK_D_DEN = 100


def _pagerank_oracle() -> str:
    ctes, final = _minhash_oracle_parts()
    s, dn, dd = PAGERANK_SCALE, PAGERANK_D_NUM, PAGERANK_D_DEN
    its = []
    prev = "p0"
    for i in range(1, PAGERANK_ITERS + 1):
        its.append(
            f"""it{i} AS (
      SELECT e.dst AS doc_id,
             ({dd - dn} * {s}) // ({dd} * nn.n)
               + SUM((p.pr * {dn}) // ({dd} * d.deg)) AS pr
      FROM edges e
      JOIN {prev} p ON p.doc_id = e.src
      JOIN deg d ON d.src = e.src
      CROSS JOIN nn
      GROUP BY e.dst, nn.n
    )"""
        )
        prev = f"it{i}"
    its_sql = ",\n    ".join(its)
    return f"""
    WITH {ctes},
    prpairs AS ({final}),
    edges AS (SELECT doc_a AS src, doc_b AS dst FROM prpairs
              UNION ALL SELECT doc_b, doc_a FROM prpairs),
    deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM deg),
    p0 AS (SELECT d.src AS doc_id, {s} // nn.n AS pr FROM deg d CROSS JOIN nn),
    {its_sql}
    SELECT doc_id, CAST(pr AS BIGINT) AS pr_pico,
           ROW_NUMBER() OVER (ORDER BY pr DESC, doc_id) AS rank
    FROM {prev} ORDER BY rank
    """


@_register("dedup_graph_pagerank", oracle=_pagerank_oracle())
def dedup_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the verified near-dup graph — {PAGERANK_ITERS} power-
    iteration rounds with damping {PAGERANK_D_NUM}/{PAGERANK_D_DEN}. The
    duplication-HUB detector: a template/boilerplate document that
    near-matches many others concentrates rank mass, where
    cluster_size_histogram only sees component sizes — rank 1 here is the
    "which single document explains the most duplication?" answer the
    drop-the-cluster decision wants.

    The batch-iterative workload class done deterministically: every
    quantity is an int64 of pico-units, the per-edge contribution is
    integer floor division ((pr * {PAGERANK_D_NUM}) DIV
    ({PAGERANK_D_DEN} * deg)) and the per-round sum is exact integer
    addition — no float ever appears, so engines, partitionings, and
    summation orders agree bit-for-bit (mass lost to flooring is
    deterministic too). Each Spark round is one (edges ⨝ pr ⨝ deg) join +
    a map-side-combined groupBy, localCheckpointed so lineage stays one
    round deep (the dedup_clusters discipline); the graph is
    candidate-scale, never the corpus.
    """
    s, dn, dd = PAGERANK_SCALE, PAGERANK_D_NUM, PAGERANK_D_DEN
    prpairs = (
        dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b").localCheckpoint()
    )
    edges = (
        prpairs.union(prpairs.select(F.col("doc_b"), F.col("doc_a")))
        .toDF("src", "dst")
        .localCheckpoint()
    )
    deg = edges.groupBy("src").agg(F.count("*").cast("bigint").alias("deg"))
    n = deg.count()
    if n == 0:
        return spark.createDataFrame([], "doc_id long, pr_pico long, rank long")
    pr = deg.select(
        F.col("src").alias("doc_id"), F.lit(s // n).cast("bigint").alias("pr")
    ).localCheckpoint()
    base = ((dd - dn) * s) // (dd * n)
    for _ in range(PAGERANK_ITERS):
        contrib = (
            edges.join(pr, edges["src"] == pr["doc_id"])
            .join(deg, "src")
            .select(
                F.col("dst"),
                F.expr(f"(pr * {dn}L) DIV ({dd}L * deg)").alias("c"),
            )
        )
        pr = (
            contrib.groupBy(F.col("dst").alias("doc_id"))
            .agg(F.sum("c").alias("sc"))
            .select("doc_id", (F.lit(base) + F.col("sc")).cast("bigint").alias("pr"))
            .localCheckpoint()
        )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("pr").desc(), "doc_id")
    return pr.select(
        "doc_id",
        F.col("pr").alias("pr_pico"),
        F.row_number().over(w).cast("bigint").alias("rank"),
    ).orderBy("rank")


def _simhash_sig_sql() -> str:
    h_expr = hash60_sql("s")
    bit_sums = ",\n    ".join(
        f"SUM(CASE WHEN (hv >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(SIMHASH_BITS)
    )
    value = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN {1 << b}::BIGINT ELSE 0::BIGINT END)"
        for b in range(SIMHASH_BITS)
    )
    return (
        "WITH "
        + _SHINGLES_CTE
        + ",\n"
        + f"hv AS (SELECT doc_id, {h_expr} AS hv FROM shm),\n"
        + f"bits AS (SELECT doc_id, {bit_sums} FROM hv GROUP BY doc_id)\n"
        + f"SELECT doc_id, {value} AS simhash FROM bits"
    )


_SIMHASH_COUNTER_BITS = 21  # per-bit ones-counter width; 3 counters per long


def _simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signatures via packed bit-counters: 21 aggregates instead of 61.

    The naive shape (one +/-1 SUM per signature bit) makes Catalyst plan a
    61-expression aggregate — ~1 s of driver-side planning per query at 60
    bits. Instead, three 21-bit ones-counters pack into each 63-bit long, so
    the groupBy carries 20 packed SUMs + COUNT; bit b of the signature is
    then 2*ones_b > total (equivalent to sign(sum of +/-1)). Bit-identical
    to the unpacked form — the DuckDB oracle keeps the naive spelling.

    Capacity: counters hold < 2^21 shingle instances per doc; a doc would
    need >2M tokens to overflow — far past any sane document-splitting
    policy (chunk inputs upstream if that ever changes).
    """
    d = load_table(spark, sf_dir, "documents")
    shm = _shingles(d, distinct=False)
    hv = shm.select("doc_id", hash60(F.col("s")).alias("hv"))
    cb = _SIMHASH_COUNTER_BITS
    mask = (1 << cb) - 1
    aggs = ["count(*) AS total"]
    for g in range(SIMHASH_BITS // 3):
        b0, b1, b2 = 3 * g, 3 * g + 1, 3 * g + 2
        aggs.append(
            f"sum((shiftright(hv, {b0}) & 1)"
            f" + ((shiftright(hv, {b1}) & 1) << {cb})"
            f" + ((shiftright(hv, {b2}) & 1) << {2 * cb})) AS g{g}"
        )
    bits = hv.groupBy("doc_id").agg(*[F.expr(a) for a in aggs])
    # MSB-first binary string -> one flat conv(, 2, 10); avoids a 60-deep
    # nested addition tree (another planner hot spot).
    parts = [
        f"CASE WHEN 2 * ((g{b // 3} >> {(b % 3) * cb}) & {mask}) > total"
        " THEN '1' ELSE '0' END"
        for b in range(SIMHASH_BITS - 1, -1, -1)
    ]
    return bits.selectExpr(
        "doc_id",
        f"CAST(conv(concat({','.join(parts)}), 2, 10) AS BIGINT) AS simhash",
    )


@_register("simhash_signatures", oracle=_simhash_sig_sql())
def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash: 60-bit signature per doc from the 2-gram shingle multiset.

    All-integer arithmetic (weights = shingle occurrence counts), so the
    signature is bit-identical across engines and partitionings. One shuffle
    on doc_id with 60 partial-agg sums; signature is 8 bytes/doc — the
    cheapest near-dup representation at 100 TB.
    """
    return _simhash_signatures(spark, sf_dir)


def _simhash_pairs_sql() -> str:
    sig = _simhash_sig_sql()
    bands = ", ".join(str(i) for i in range(SIMHASH_BITS // SIMHASH_BAND_BITS))
    return (
        "WITH sig AS (" + sig + "),\n"
        + f"chunks AS (SELECT doc_id, simhash, unnest([{bands}]) AS band FROM sig),\n"
        + f"keyed AS (SELECT doc_id, simhash, band,\n"
        + f"                 (simhash >> (band * {SIMHASH_BAND_BITS})) & {(1 << SIMHASH_BAND_BITS) - 1} AS chunk\n"
        + "          FROM chunks),\n"
        + "cand AS (SELECT DISTINCT a.doc_id AS doc_a, a.simhash AS sim_a,\n"
        + "                b.doc_id AS doc_b, b.simhash AS sim_b\n"
        + "         FROM keyed a JOIN keyed b\n"
        + "           ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id)\n"
        + "SELECT doc_a, doc_b, CAST(bit_count(xor(sim_a, sim_b)) AS BIGINT) AS hamming\n"
        + "FROM cand\n"
        + f"WHERE bit_count(xor(sim_a, sim_b)) <= {SIMHASH_MAX_HAMMING}"
    )


@_register("dedup_simhash", oracle=_simhash_pairs_sql())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: banded hamming join.

    Signatures are split into 4 x 15-bit chunks; any pair within hamming
    distance 3 must share >= 1 chunk (pigeonhole), and the hamming <= 8
    filter keeps recall soft while the chunk join keeps the pair space
    near-linear. Shuffle volume: 4 x (chunk, doc_id) rows per doc.
    """
    sig = _simhash_signatures(spark, sf_dir)
    n_bands = SIMHASH_BITS // SIMHASH_BAND_BITS
    mask = (1 << SIMHASH_BAND_BITS) - 1
    # 4 (chunk, signature) rows per doc. No cut point: the shuffle_hash hint
    # (same pattern as dedup_embedding_cosine) keeps the self-join's two
    # band-key exchanges symmetric, so they canonicalize equal and AQE's
    # ReuseExchange serves BOTH sides from one materialization. The
    # expensive post-shuffle signature projection (60-branch CASE +
    # conv(,2,10)) sits BELOW that band-key exchange, so it runs exactly
    # once — unlike the earlier localCheckpoint design, which paid an eager
    # corpus-scale materialization to executor disk plus a serial job
    # barrier before the main query even started (interleaved A/B at
    # sf0.1: 1.32 s with the checkpoint vs 1.06 s with exchange reuse;
    # plan-gated by tests/test_plans.py::
    # test_simhash_band_join_reuses_exchange).
    keyed = sig.select(
        "doc_id",
        "simhash",
        F.explode(F.array(*[F.lit(i) for i in range(n_bands)])).alias("band"),
    ).withColumn(
        "chunk",
        F.expr(f"shiftright(simhash, band * {SIMHASH_BAND_BITS})").bitwiseAND(
            F.lit(mask)
        ),
    ).hint("shuffle_hash")
    a = keyed.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sim_a"), "band", "chunk"
    )
    b = keyed.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sim_b"), "band", "chunk"
    )
    cand = (
        a.join(b, ["band", "chunk"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "sim_a", "doc_b", "sim_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).cast("bigint")
    return cand.select("doc_a", "doc_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= SIMHASH_MAX_HAMMING
    )


EMBEDDING_DUP_THRESHOLD = 0.45
# All-pairs dedup needs finer buckets than query-vs-corpus ANN: candidate
# volume floors at ~n^2 * bands / 2^(bits/bands), so 6-bit chunks (64
# buckets/band) cut random collisions ~3.5x vs the ANN path's 4-bit chunks
# while a true near-dup (cosine >= 0.99) still collides in some band with
# p > 0.9999.
EMBEDDING_LSH_BITS = 24
EMBEDDING_LSH_BANDS = 4


def _embedding_cosine_oracle() -> str:
    from .similarity import _chunks_ctes, _COS_SQL, DIM

    return f"""
    WITH {_chunks_ctes(EMBEDDING_LSH_BITS, EMBEDDING_LSH_BANDS)},
    cand AS (
      SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
      FROM chunks a JOIN chunks b
        ON a.band = b.band AND a.chunk = b.chunk AND a.vec_id < b.vec_id
    ),
    p2 AS (
      SELECT cand.va, cand.vb, ea.embedding AS qe, eb.embedding AS ne
      FROM cand JOIN embeddings ea ON ea.vec_id = cand.va
                JOIN embeddings eb ON eb.vec_id = cand.vb
    ),
    d AS (SELECT va, vb, {_COS_SQL} AS c
          FROM p2, generate_series(1, {DIM}) g(i)
          GROUP BY va, vb)
    SELECT da.doc_id AS doc_a, db.doc_id AS doc_b, ROUND(c, 6) AS cosine
    FROM d JOIN documents da ON da.doc_id = d.va
           JOIN documents db ON db.doc_id = d.vb
    WHERE ROUND(c, 6) >= {EMBEDDING_DUP_THRESHOLD}
    """


@_register("dedup_embedding_cosine", oracle=_embedding_cosine_oracle())
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup over ``documents``: semantic duplicates.

    The last rung of the dedup ladder — catches paraphrases that shingle
    hashing can't. Candidates come from the same random-hyperplane LSH
    bucketing as similarity_ann_lsh (shared ``_signatures``, finer 24-bit
    parameters); only colliding pairs get the exact cosine, so the pair
    space stays near-linear. Pairs at cosine >= EMBEDDING_DUP_THRESHOLD are
    reported with their *document* ids (embeddings join documents 1:1 on
    vec_id = doc_id).

    At 100 TB: signatures are a map-only projection (plane matrix ships
    with the plan), the bucket self-join shuffles 4 small rows per doc, and
    the document join is a broadcast of the near-dup id set — the corpus
    text is never shuffled.
    """
    from .similarity import _signatures
    from ..functions.vectors import cosine_arrow

    # checkpoint=False + shuffle_hash hint: the symmetric self-join's two
    # band-key exchanges canonicalize equal, so ReuseExchange serves both
    # sides from one Arrow signature scan (same pattern as
    # _minhash_candidates; the reuse is gated there by
    # test_banded_self_join_reuses_signature_exchange). shuffle_hash keeps
    # that reuse while skipping BOTH sort passes a merge join would add
    # (verified: identical pairs, ReusedExchange intact, ~0.1 s at sf0.1);
    # the hint only prevents a broadcast conversion that would break the
    # reuse — at scale both sides shuffle regardless.
    chunks = _signatures(
        spark, sf_dir, EMBEDDING_LSH_BITS, EMBEDDING_LSH_BANDS, checkpoint=False
    ).hint("shuffle_hash")
    a = chunks.select(F.col("vec_id").alias("va"), "band", "chunk")
    b = chunks.select(F.col("vec_id").alias("vb"), "band", "chunk")
    cand = (
        a.join(b, ["band", "chunk"])
        .filter(F.col("va") < F.col("vb"))
        .select("va", "vb")
        .distinct()
    )
    e = load_table(spark, sf_dir, "embeddings")
    ea = e.select(F.col("vec_id").alias("va"), F.col("embedding").alias("qe"))
    eb = e.select(F.col("vec_id").alias("vb"), F.col("embedding").alias("ne"))
    scored = (
        cand.join(ea, "va")
        .join(eb, "vb")
        .select(
            "va", "vb", F.round(cosine_arrow(F.col("qe"), F.col("ne")), 6).alias("cosine")
        )
        .filter(F.col("cosine") >= EMBEDDING_DUP_THRESHOLD)
    )
    d = load_table(spark, sf_dir, "documents")
    da = d.select(F.col("doc_id").alias("va"))
    db = d.select(F.col("doc_id").alias("vb"))
    return (
        scored.join(da, "va")
        .join(db, "vb")
        .select(F.col("va").alias("doc_a"), F.col("vb").alias("doc_b"), "cosine")
    )


def _semdedup_oracle() -> str:
    from .similarity import _COS_SQL, DIM, IVF_NLIST

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
    p AS (
      SELECT a.vec_id AS va, b.vec_id AS vb, a.centroid_id AS cell
      FROM assign a JOIN assign b
        ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
    ),
    p2 AS (
      SELECT p.va, p.vb, p.cell, ea.embedding AS qe, eb.embedding AS ne
      FROM p JOIN embeddings ea ON ea.vec_id = p.va
             JOIN embeddings eb ON eb.vec_id = p.vb
    ),
    d AS (SELECT va, vb, cell, {_COS_SQL} AS c
          FROM p2, generate_series(1, {DIM}) g(i)
          GROUP BY va, vb, cell)
    SELECT va AS doc_a, vb AS doc_b, ROUND(c, 6) AS cosine, cell
    FROM d WHERE ROUND(c, 6) >= {EMBEDDING_DUP_THRESHOLD}
    ORDER BY doc_a, doc_b
    """


@_register("dedup_embedding_semdedup", oracle=_semdedup_oracle())
def dedup_embedding_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al., "SemDeDup: Data-
    efficient learning at web-scale through semantic deduplication",
    arXiv:2303.09540 — public method): cluster the embedding space, then
    compare pairs ONLY within each cluster cell. The third candidate
    scheme of the semantic-dedup ladder, next to hyperplane-LSH bucketing
    (dedup_embedding_cosine) and the ANN probe path — clustering adapts
    the buckets to the corpus's actual density, where LSH bands are
    data-oblivious.

    Candidate recall is cell-bounded BY DESIGN: a near-dup pair straddling
    a cell boundary is missed (the paper accepts this; k trades recall for
    the pair-space bound n²/k). Cells here are the deterministic seed
    codebook so the oracle replays the assignment; production swaps in
    k-means centroids (kmeans_assign) with k ~ sqrt(n), identical shape.

    Shape: assignment is the MAP-ONLY argmax (codebook in the Arrow
    closure — zero exchanges, embeddings ride in-row into the cell join);
    the within-cell self-join shuffles one (cell, id, vector) row per doc,
    and exact cosine runs on in-cell pairs only — per-cell quadratic,
    never corpus-quadratic.
    """
    from .similarity import IVF_NLIST, _assign_nearest_centroid
    from ..functions.vectors import cosine_arrow

    e = load_table(spark, sf_dir, "embeddings")
    cent = e.filter(F.col("vec_id") < IVF_NLIST).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("ce")
    )
    assign = _assign_nearest_centroid(e, cent).select(
        "vec_id", "embedding", F.col("centroid_id").alias("cell")
    )
    a = assign.select(
        F.col("vec_id").alias("va"), F.col("embedding").alias("qe"), "cell"
    )
    b = assign.select(
        F.col("vec_id").alias("vb"), F.col("embedding").alias("ne"), "cell"
    )
    pairs = a.join(b, "cell").filter(F.col("va") < F.col("vb"))
    return (
        pairs.select(
            "va",
            "vb",
            F.round(cosine_arrow(F.col("qe"), F.col("ne")), 6).alias("cosine"),
            "cell",
        )
        .filter(F.col("cosine") >= EMBEDDING_DUP_THRESHOLD)
        .select(
            F.col("va").alias("doc_a"), F.col("vb").alias("doc_b"), "cosine", "cell"
        )
        .orderBy("doc_a", "doc_b")
    )


# --- train/test decontamination ----------------------------------------------

DECON_NGRAM = 8
DECON_TRAIN_PCT = 90  # same salted split as documents_clean_corpus


def _decon_oracle() -> str:
    split = hash60_sql("CAST(doc_id AS VARCHAR)", salt="split")
    gram = hash60_sql("array_to_string(toks[i:i+{m}], ' ')".format(m=DECON_NGRAM - 1))
    return f"""
    WITH t AS (
      SELECT doc_id,
             {split} % 100 < {DECON_TRAIN_PCT} AS is_train,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
      FROM documents
    ),
    idx AS (
      SELECT doc_id, is_train, toks,
             unnest(generate_series(1, len(toks) - {DECON_NGRAM - 1})) AS i
      FROM t WHERE len(toks) >= {DECON_NGRAM}
    ),
    sh AS (SELECT DISTINCT doc_id, is_train, {gram} AS sh60 FROM idx),
    train_sh AS (SELECT DISTINCT sh60 FROM sh WHERE is_train),
    test_sh AS (SELECT doc_id, sh60 FROM sh WHERE NOT is_train)
    SELECT e.doc_id, COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN tr.sh60 IS NULL THEN 0 ELSE 1 END) AS BIGINT)
             AS n_contaminated,
           ROUND(CAST(SUM(CASE WHEN tr.sh60 IS NULL THEN 0 ELSE 1 END) AS DOUBLE)
                 / COUNT(*), 6) AS contamination_ratio
    FROM test_sh e
    LEFT JOIN train_sh tr ON e.sh60 = tr.sh60
    GROUP BY e.doc_id
    ORDER BY e.doc_id
    """


@_register("corpus_decontaminate", oracle=_decon_oracle())
def corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test decontamination: for every held-out document, the fraction
    of its distinct word 8-grams that appear anywhere in the training
    split — the overlap audit run before any benchmark evaluation, here
    over the same salted hash split ``documents_clean_corpus`` materializes.

    Scale shape: documents never meet documents. Both sides reduce to
    streams of (doc_id, shingle-hash) pairs — 8-grams are hashed to 60-bit
    ints at the scan, texts are dropped immediately — and the ONE wide
    shuffle is the equi-join on shingle hash. The train side deduplicates
    to a distinct hash set (map-side combined); at 100 TB that set can
    further shrink to a bloom filter broadcast with identical plan shape.
    Per-doc rollup rides doc_id at test-split cardinality.
    """
    d = load_table(spark, sf_dir, "documents")
    is_train = (
        hash60(F.col("doc_id").cast("string"), salt="split") % 100 < DECON_TRAIN_PCT
    )
    toks = lower_ws_tokens("text")
    t = d.select("doc_id", is_train.alias("is_train"), toks.alias("toks")).filter(
        F.size("toks") >= DECON_NGRAM
    )
    grams = F.expr(
        f"transform(sequence(1, size(toks) - {DECON_NGRAM - 1}),"
        f" i -> array_join(slice(toks, i, {DECON_NGRAM}), ' '))"
    )
    sh = (
        t.select("doc_id", "is_train", F.explode(grams).alias("gram"))
        .select("doc_id", "is_train", hash60(F.col("gram")).alias("sh60"))
        .distinct()
    )
    train_sh = (
        sh.filter(F.col("is_train")).select("sh60").distinct().withColumn("hit", F.lit(1))
    )
    test_sh = sh.filter(~F.col("is_train")).select("doc_id", "sh60")
    joined = test_sh.join(train_sh, "sh60", "left")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("bigint").alias(
                "n_contaminated"
            ),
            F.round(
                F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("double")
                / F.count("*"),
                6,
            ).alias("contamination_ratio"),
        )
        .orderBy("doc_id")
    )


# --- per-source curation report ----------------------------------------------


def _source_report_oracle() -> str:
    fp = hash60_sql("lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))")
    return f"""
    WITH fp AS (
      SELECT doc_id, source, lang,
             len(regexp_split_to_array(trim(text), '\\s+')) AS t,
             {fp} AS fp60
      FROM documents
    ),
    n AS (SELECT *, COUNT(*) OVER (PARTITION BY fp60) AS n FROM fp)
    SELECT source,
           COUNT(*) AS docs,
           CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_docs,
           ROUND(AVG(CASE WHEN n > 1 THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END), 6) AS dup_rate,
           ROUND(AVG(CAST(t AS DOUBLE)), 6) AS avg_ws_tokens,
           COUNT(DISTINCT lang) AS langs
    FROM n
    GROUP BY source
    ORDER BY source
    """


@_register("source_curation_report", oracle=_source_report_oracle())
def source_curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source curation dashboard: duplicate contribution and size mix.

    The decision table of corpus curation — which ingestion sources feed
    the pipeline exact duplicates (corpus-wide normalized-text fingerprint
    seen more than once, attributed to every source holding a copy), how
    long their documents run, and how many languages they span.

    Shape: fingerprint + token count fuse into the scan; ONE corpus-scale
    shuffle (window count over fp60 — duplicate groups are tiny, so
    partitions stay balanced) and a small per-source aggregation. No join
    against a fingerprint table: the window form halves the shuffle count
    of the naive groupBy-then-join spelling.
    """
    from pyspark.sql import Window

    from ..functions.textfns import ws_token_count

    d = load_table(spark, sf_dir, "documents")
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), "\\s+", " "))
    fp = d.select(
        "doc_id",
        "source",
        "lang",
        ws_token_count("text").alias("t"),
        hash60(norm).alias("fp60"),
    )
    n = fp.withColumn("n", F.count("*").over(Window.partitionBy("fp60")))
    is_dup = F.when(F.col("n") > 1, F.lit(1.0)).otherwise(F.lit(0.0))
    return (
        n.groupBy("source")
        .agg(
            F.count("*").alias("docs"),
            F.sum(F.when(F.col("n") > 1, 1).otherwise(0)).alias("dup_docs"),
            F.round(F.avg(is_dup), 6).alias("dup_rate"),
            F.round(F.avg(F.col("t").cast("double")), 6).alias("avg_ws_tokens"),
            F.countDistinct("lang").alias("langs"),
        )
        .orderBy("source")
    )


# --- round-3 additions: survivors / containment / family audit / stats -----


def _survivors_oracle() -> str:
    chain, final_select = _clusters_oracle_parts()
    return f"""
    WITH RECURSIVE {chain},
    clusters AS ({final_select})
    SELECT d.doc_id,
           COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
           CAST(COALESCE(c.cluster_size, 1) AS BIGINT) AS cluster_size,
           (c.doc_id IS NULL OR c.cluster_id = d.doc_id) AS is_survivor
    FROM documents d LEFT JOIN clusters c ON c.doc_id = d.doc_id
    ORDER BY d.doc_id
    """


@_register("dedup_survivors", oracle=_survivors_oracle())
def dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup pipeline's endpoint: a full-corpus keep/drop assignment.

    Every document maps to its near-dup cluster (dedup_clusters: MinHash
    LSH pairs -> exact-Jaccard verify -> connected components) and the
    cluster's canonical representative (min doc_id) is the survivor;
    documents in no cluster survive as singletons. This is the table a
    training run actually consumes — ``WHERE is_survivor`` is the dedup
    filter, and cluster_id lets audits recover what each survivor stands
    for.

    Scale shape: cluster membership is subgraph-scale (the near-dup
    fraction); the corpus-side left join rides doc_id — one shuffle of
    (doc_id, tiny columns), never text.
    """
    d = load_table(spark, sf_dir, "documents")
    members = dedup_clusters(spark, sf_dir).select(
        "doc_id", "cluster_id", "cluster_size"
    )
    joined = d.select("doc_id").join(members, "doc_id", "left")
    return joined.select(
        "doc_id",
        F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
        F.coalesce("cluster_size", F.lit(1)).cast("long").alias("cluster_size"),
        (
            F.col("cluster_size").isNull()
            | (F.col("cluster_id") == F.col("doc_id"))
        ).alias("is_survivor"),
    ).orderBy("doc_id")


CONTAINMENT_THRESHOLD = 0.6


def _containment_oracle() -> str:
    return f"""
    WITH {_SHINGLES_CTE},
    cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
               FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
               GROUP BY 1, 2)
    SELECT c.doc_a, c.doc_b,
           ROUND(common * 1.0 / ca.n, 6) AS containment_a,
           ROUND(common * 1.0 / cb.n, 6) AS containment_b
    FROM common c JOIN cnt ca ON ca.doc_id = c.doc_a
                  JOIN cnt cb ON cb.doc_id = c.doc_b
    WHERE common * 1.0 / ca.n >= {CONTAINMENT_THRESHOLD}
       OR common * 1.0 / cb.n >= {CONTAINMENT_THRESHOLD}
    ORDER BY doc_a, doc_b
    """


@_register("dedup_containment", oracle=_containment_oracle())
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup detection: containment |A∩B| / |A| — catches
    prefix/quote/wrapper duplication that symmetric Jaccard misses (a doc
    fully contained in a 10x longer one scores Jaccard ~0.1 but
    containment 1.0).

    Candidates come from the inverted shingle index (any shared shingle),
    NOT from MinHash bands: band collision probability is jaccard^r, so a
    contained-but-low-Jaccard pair — the exact case this operator exists
    for — would almost never surface as an LSH candidate
    (tests/test_extensions.py::test_containment_catches_planted_prefix_dup
    plants one). Like dedup_ngram_jaccard this is the verification-scale
    tool; the 100 TB discovery variant buckets by the K smallest shingle
    hashes of the SMALLER set (bottom-k sketch), whose collision rate
    tracks containment rather than Jaccard — same downstream verify.
    """
    # Round 15 (guide §2.4): set sizes ride through the exploded stream —
    # the .distinct() exchange, the groupBy(doc_id).count() exchange, and
    # the two post-aggregation joins back to the counts table are gone.
    # Same inverted-index pair space, same results (the sweep measured the
    # old shape at 15.8 s / this one materially below it; see
    # OPTIMIZATION_r15.md for the interleaved numbers).
    d = load_table(spark, sf_dir, "documents")
    ex = _doc_shingle_string_sets(d).select(
        "doc_id", "n", F.explode("sarr").alias("s")
    )
    a = ex.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"), "s")
    b = ex.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"), "s")
    common = (
        a.join(b, ["s"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "na", "doc_b", "nb")
        .agg(F.count("*").alias("common"))
    )
    return (
        common.select(
            "doc_a",
            "doc_b",
            F.round(F.col("common") / F.col("na"), 6).alias("containment_a"),
            F.round(F.col("common") / F.col("nb"), 6).alias("containment_b"),
        )
        .filter(
            (F.col("containment_a") >= CONTAINMENT_THRESHOLD)
            | (F.col("containment_b") >= CONTAINMENT_THRESHOLD)
        )
        .orderBy("doc_a", "doc_b")
    )


def _family_compare_oracle() -> str:
    fp = hash60_sql("lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))")
    ja = ORACLES["dedup_ngram_jaccard"]
    si = ORACLES["dedup_simhash"]
    return f"""
    WITH fpt AS (SELECT doc_id, {fp} AS fp60 FROM documents),
    ex AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
           FROM fpt a JOIN fpt b ON a.fp60 = b.fp60 AND a.doc_id < b.doc_id),
    ja AS ({ja}),
    si AS ({si})
    SELECT
      (SELECT COUNT(*) FROM ex) AS exact_pairs,
      (SELECT COUNT(*) FROM ja) AS jaccard_pairs,
      (SELECT COUNT(*) FROM si) AS simhash_pairs,
      (SELECT COUNT(*) FROM ja JOIN ex USING (doc_a, doc_b)) AS jaccard_and_exact,
      (SELECT COUNT(*) FROM ja JOIN si USING (doc_a, doc_b)) AS jaccard_and_simhash,
      (SELECT COUNT(*) FROM si LEFT JOIN ja USING (doc_a, doc_b)
        WHERE ja.doc_a IS NULL) AS simhash_only
    """


@_register("dedup_family_compare", oracle=_family_compare_oracle())
def dedup_family_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-method agreement audit: pair counts and overlaps across the
    three detector families (exact normalized-text fingerprint, n-gram
    Jaccard >= 0.5, SimHash hamming <= 8) — the calibration table a
    curation run reads to pick thresholds (a simhash_only count far above
    jaccard_and_simhash means the hamming cut is too loose).

    Each family's pair set is the EXISTING operator's plan (shared
    builders, same shuffles); the comparison layer joins pair keys only —
    subgraph-scale, never corpus-scale.
    """
    d = load_table(spark, sf_dir, "documents")
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), "\\s+", " "))
    fpt = d.select("doc_id", hash60(norm).alias("fp60"))
    a = fpt.select(F.col("doc_id").alias("doc_a"), "fp60")
    b = fpt.select(F.col("doc_id").alias("doc_b"), "fp60")
    ex = (
        a.join(b, "fp60")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
    )
    ja = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    si = dedup_simhash(spark, sf_dir).select("doc_a", "doc_b")
    cnt = lambda df, name: df.agg(F.count("*").cast("bigint").alias(name))  # noqa: E731
    return (
        cnt(ex, "exact_pairs")
        .crossJoin(cnt(ja, "jaccard_pairs"))
        .crossJoin(cnt(si, "simhash_pairs"))
        .crossJoin(cnt(ja.join(ex, ["doc_a", "doc_b"]), "jaccard_and_exact"))
        .crossJoin(cnt(ja.join(si, ["doc_a", "doc_b"]), "jaccard_and_simhash"))
        .crossJoin(
            cnt(si.join(ja, ["doc_a", "doc_b"], "left_anti"), "simhash_only")
        )
    )


def _contamination_stats_oracle() -> str:
    decon = _decon_oracle()
    return f"""
    WITH decon AS ({decon})
    SELECT d.source,
           COUNT(*) AS n_test_docs,
           CAST(SUM(CASE WHEN c.contamination_ratio > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_contaminated,
           ROUND(AVG(c.contamination_ratio), 6) AS avg_ratio,
           ROUND(MAX(c.contamination_ratio), 6) AS max_ratio
    FROM decon c JOIN documents d ON d.doc_id = c.doc_id
    GROUP BY d.source
    ORDER BY d.source
    """


@_register("corpus_contamination_stats", oracle=_contamination_stats_oracle())
def corpus_contamination_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source contamination rollup of the train/test 8-gram audit —
    which ingestion sources leak held-out content into the training split
    (the number a benchmark report has to disclose per source).

    Builds on corpus_decontaminate's per-doc output (one shingle-hash
    equi-join shuffle); the rollup joins doc_id at test-split cardinality
    and aggregates to |sources| groups.
    """
    decon = corpus_decontaminate(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        decon.join(d, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_test_docs"),
            F.sum(F.when(F.col("contamination_ratio") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_contaminated"),
            F.round(F.avg("contamination_ratio"), 6).alias("avg_ratio"),
            F.round(F.max("contamination_ratio"), 6).alias("max_ratio"),
        )
        .orderBy("source")
    )


BOTTOMK_K = 8  # bottom-k sketch width; P(candidate | containment c) = 1-(1-c)^K


def _containment_bottomk_oracle() -> str:
    return f"""
    WITH {_SHINGLES_CTE},
    hsh AS (SELECT DISTINCT doc_id, {hash60_sql('s')} AS h FROM shm),
    cnt AS (SELECT doc_id, count(*) AS n FROM hsh GROUP BY doc_id),
    bk AS (
      SELECT doc_id, h FROM (
        SELECT doc_id, h,
               ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY h) AS rn
        FROM hsh
      ) WHERE rn <= {BOTTOMK_K}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bk a JOIN hsh b ON a.h = b.h
      WHERE a.doc_id != b.doc_id
    ),
    common AS (
      SELECT c.doc_a, c.doc_b, count(*) AS common
      FROM cand c JOIN hsh a ON a.doc_id = c.doc_a
                  JOIN hsh b ON b.doc_id = c.doc_b AND b.h = a.h
      GROUP BY 1, 2
    )
    SELECT c.doc_a, c.doc_b, ROUND(common * 1.0 / ca.n, 6) AS containment
    FROM common c JOIN cnt ca ON ca.doc_id = c.doc_a
    WHERE common * 1.0 / ca.n >= {CONTAINMENT_THRESHOLD}
    ORDER BY doc_a, doc_b
    """


@_register("dedup_containment_bottomk", oracle=_containment_bottomk_oracle())
def dedup_containment_bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discovery-scale containment: bottom-k sketch candidates + exact
    verification — the 100 TB path `dedup_containment` (all-pairs
    inverted index) names. Directional: (doc_a, doc_b, containment of A's
    shingle set inside B's).

    Why bottom-k and not MinHash bands: A's k smallest shingle hashes are
    a uniform sample of A's set, so if containment(A in B) = c, each
    sampled hash lands in B with probability c and a candidate fires with
    p = 1-(1-c)^k (k=8, c=0.6 -> 0.9993) — the collision rate tracks
    CONTAINMENT, where band collisions track Jaccard and miss contained
    docs (see dedup_containment's planted-case test).

    Physical shape (round 15, guide §2.4/§5): candidacy and verification
    FUSE into one inverted-index pass. A shared hash h of pair (a, b) is
    in a's bottom-k iff h <= a's k-th smallest hash (the sets are
    distinct, so bottom-k = every element <= that cut; n < k degenerates
    to the whole set, where any shared hash qualifies) — so per unordered
    co-occurring pair it suffices to aggregate COUNT(shared) and
    MIN(shared h) and compare against each side's cut. The per-doc sorted
    hash sets build map-side (:func:`_doc_shingle_sets` — no corpus
    groupBy), set size and cut ride through the exploded stream, and the
    old shape's THREE liabilities disappear: the separate bottom-k-vs-
    index candidate join, the candidate-ids broadcast, and the broadcast
    of candidate docs' FULL hash sets into a per-pair array_intersect —
    the latter two being hard broadcast-cap walls once the near-dup
    fraction of a 100 TB corpus stops fitting on one executor. (Measured
    at sf0.1: 127 s -> see OPTIMIZATION_r15.md; the old verification
    broadcast dominated.)
    """
    d = load_table(spark, sf_dir, "documents")
    sets = _doc_shingle_sets(d)  # (doc_id, sset sorted asc, n) — map-only
    # k-th smallest hash = the bottom-k inclusion cut (sset is sorted and
    # duplicate-free; n >= 1 past the two-token filter, so element_at's
    # index is always valid).
    ex = sets.select(
        "doc_id",
        "n",
        F.element_at("sset", F.least(F.lit(BOTTOMK_K), F.col("n"))).alias("cut"),
        F.explode("sset").alias("h"),
    )
    a = ex.select(
        F.col("doc_id").alias("doc_a"),
        F.col("n").alias("na"),
        F.col("cut").alias("cut_a"),
        "h",
    )
    b = ex.select(
        F.col("doc_id").alias("doc_b"),
        F.col("n").alias("nb"),
        F.col("cut").alias("cut_b"),
        "h",
    )
    pair = (
        a.join(b, ["h"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "na", "cut_a", "doc_b", "nb", "cut_b")
        .agg(F.count("*").alias("common"), F.min("h").alias("minh"))
    )
    # Each unordered pair yields up to two DIRECTIONAL rows; a direction
    # is a candidate iff the minimum shared hash clears that side's
    # bottom-k cut (exactly "some shared hash is in the probe's sketch").
    both = pair.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("doc_a").alias("doc_a"),
                    F.col("doc_b").alias("doc_b"),
                    (F.col("minh") <= F.col("cut_a")).alias("is_cand"),
                    F.round(F.col("common") / F.col("na"), 6).alias("containment"),
                ),
                F.struct(
                    F.col("doc_b").alias("doc_a"),
                    F.col("doc_a").alias("doc_b"),
                    (F.col("minh") <= F.col("cut_b")).alias("is_cand"),
                    F.round(F.col("common") / F.col("nb"), 6).alias("containment"),
                ),
            )
        ).alias("r")
    ).select("r.*")
    return (
        both.filter(
            F.col("is_cand") & (F.col("containment") >= CONTAINMENT_THRESHOLD)
        )
        .select("doc_a", "doc_b", "containment")
        .orderBy("doc_a", "doc_b")
    )


def _star_round(edges: DataFrame) -> DataFrame:
    """One large-star + small-star contraction round (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SOCC'14 — public
    algorithm). ``edges`` is undirected, kept as (u, v) pairs with u != v;
    returns the contracted edge set.

    - large-star: every neighbor v > u re-attaches to m = min(N(u) ∪ u).
    - small-star: every neighbor v <= u (and u itself) attaches to
      m = min of that down-neighborhood.
    Each phase is one groupBy(u) min-aggregation plus a self-join on u —
    subgraph-scale shuffles keyed by node id.
    """
    both = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    # large-star
    m = both.groupBy("u").agg(F.min("v").alias("minv"))
    m = m.select("u", F.least("minv", F.col("u")).alias("m"))
    ls = (
        both.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    # small-star over the contracted edges (directed to the smaller id)
    down = ls.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).distinct()
    m2 = down.groupBy("u").agg(F.min("v").alias("m"))
    ss = (
        down.join(m2, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(down.join(m2, "u").select("u", "m"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    return ss


@_register("dedup_clusters_star", oracle=_clusters_oracle())
def dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components by alternating large-star/small-star
    contraction — the O(log n)-round scale path `dedup_clusters` names as
    its fallback for adversarially long duplicate chains (plain min-label
    propagation needs ~diameter rounds; star contraction halves chain
    length every round). Same verified near-dup pair input, same oracle,
    same (cluster_id, doc_id, cluster_size) output — the two formulations
    must agree exactly (tests/test_extensions.py::
    test_star_contraction_matches_propagation_on_long_chain pins a
    200-node chain, star's worst-published case).

    Round state is the contracted edge set (monotonically shrinking,
    subgraph-scale); per-round cost is two min-aggregations + self-joins
    keyed by node id, localCheckpoint-ed so lineage stays one round deep.
    """
    pairs = (
        dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b").localCheckpoint()
    )
    edges = pairs.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    ).localCheckpoint()
    members = star_components(edges)
    from pyspark.sql import Window

    return members.select(
        "cluster_id",
        "doc_id",
        F.count("*").over(Window.partitionBy("cluster_id")).alias("cluster_size"),
    ).orderBy("cluster_id", "doc_id")


def star_components(edges: DataFrame) -> DataFrame:
    """Run star contraction to a fixpoint over an undirected (u, v) edge
    set; returns (doc_id, cluster_id) membership for every non-isolated
    node, cluster_id = component min. Round count is O(log n) in chain
    length (the adversarial case for plain propagation)."""
    edges = edges.filter(F.col("u") != F.col("v"))
    prev = None
    while True:
        edges = _star_round(edges).localCheckpoint()
        # Convergence: the edge set is a fixpoint of the contraction. Edge
        # count alone can ping-pong between isomorphic sets, so compare
        # content via an order-insensitive checksum (cheap: edge-scale agg).
        sig = edges.agg(
            F.count("*").alias("n"),
            F.sum(F.col("u") * 1_000_003 + F.col("v")).alias("s"),
        ).first()
        cur = (sig.n, sig.s)
        if cur == prev:
            break
        prev = cur
    # Fixpoint edges form stars (v -> component min). Membership: every
    # node that appears, mapped to its min; roots map to themselves.
    return (
        edges.select(F.col("u").alias("doc_id"), F.col("v").alias("label"))
        .union(edges.select(F.col("v").alias("doc_id"), F.col("v").alias("label")))
        .groupBy("doc_id")
        .agg(F.min("label").alias("cluster_id"))
    )


def _incremental_oracle() -> str:
    fp = hash60_sql("lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))")
    base = hash60_sql("s")
    r = MINHASH_K // MINHASH_BANDS
    min_cols = ", ".join(
        f"MIN(({MINHASH_A[i]} * (base % {MINHASH_PRIME}) + {MINHASH_B[i]})"
        f" % {MINHASH_PRIME}) AS m{i}"
        for i in range(MINHASH_K)
    )
    band_rows = ",\n            ".join(
        "({b}, md5({key}))".format(
            b=b,
            key=" || ',' || ".join(f"m{b * r + j}::VARCHAR" for j in range(r)),
        )
        for b in range(MINHASH_BANDS)
    )
    return f"""
    WITH split AS (
      SELECT doc_id, text, source = 'src0' AS is_new FROM documents
    ),
    fpt AS (SELECT doc_id, is_new, {fp} AS fp60 FROM split),
    corpus_fp AS (SELECT DISTINCT fp60 FROM fpt WHERE NOT is_new),
    {_SHINGLES_CTE.replace("FROM documents", "FROM split")},
    hb AS (SELECT sh.doc_id, s2.is_new, {base} AS base
           FROM sh JOIN split s2 ON s2.doc_id = sh.doc_id),
    mh AS (SELECT doc_id, is_new, {min_cols} FROM hb GROUP BY doc_id, is_new),
    bands AS (SELECT doc_id, is_new, bb.band, bb.bkey
              FROM mh, LATERAL (VALUES
            {band_rows}) AS bb(band, bkey)),
    hits AS (
      SELECT n.doc_id, COUNT(DISTINCT c.doc_id) AS near_candidates
      FROM bands n JOIN bands c
        ON n.band = c.band AND n.bkey = c.bkey AND NOT c.is_new
      WHERE n.is_new
      GROUP BY n.doc_id
    )
    SELECT f.doc_id,
           (cf.fp60 IS NOT NULL) AS exact_dup,
           CAST(COALESCE(h.near_candidates, 0) AS BIGINT) AS near_candidates,
           (cf.fp60 IS NOT NULL OR COALESCE(h.near_candidates, 0) > 0) AS quarantine
    FROM fpt f
    LEFT JOIN corpus_fp cf ON cf.fp60 = f.fp60
    LEFT JOIN hits h ON h.doc_id = f.doc_id
    WHERE f.is_new
    ORDER BY f.doc_id
    """


@_register("dedup_incremental", oracle=_incremental_oracle())
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: screen a NEW batch (here: source src0, the
    stand-in for today's ingest drop) against the existing corpus without
    re-deduplicating the corpus — the shape a daily pipeline actually
    runs. Per new document: exact duplicate of the corpus (normalized
    fingerprint), count of corpus-side MinHash band collisions, and the
    quarantine verdict a curation queue consumes.

    Scale shape: the corpus side reduces to (a) a distinct fingerprint
    set and (b) the banded signature index — both O(corpus) narrow rows
    a production run PERSISTS and reads back (ivf_build_index-style), so
    a day's increment costs O(batch) signatures + two equi-joins against
    the index, not a corpus rescan. Here both sides derive in one plan:
    the signature groupBy is shared by the batch and corpus branches via
    exchange reuse (same aggregate, filtered after), and the fingerprint
    probe is a broadcast of the BATCH side (small) against the corpus
    fingerprint stream.
    """
    d = load_table(spark, sf_dir, "documents")
    split = d.withColumn("is_new", F.col("source") == "src0")
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), "\\s+", " "))
    fpt = split.select("doc_id", "is_new", hash60(norm).alias("fp60"))
    corpus_fp = fpt.filter(~F.col("is_new")).select("fp60").distinct()
    new_fp = fpt.filter(F.col("is_new")).select("doc_id", "fp60")
    exact = new_fp.join(
        corpus_fp.withColumn("hit", F.lit(1)), "fp60", "left"
    ).select("doc_id", F.col("hit").isNotNull().alias("exact_dup"))

    base = hash60(F.col("s")) % MINHASH_PRIME
    sh = _shingles(split, distinct=False)
    hb = sh.join(
        split.select("doc_id", "is_new"), "doc_id"
    ).select("doc_id", "is_new", base.alias("base"))
    mins = hb.groupBy("doc_id", "is_new").agg(
        *[
            F.min(
                (F.lit(MINHASH_A[i]) * F.col("base") + F.lit(MINHASH_B[i]))
                % MINHASH_PRIME
            ).alias(f"m{i}")
            for i in range(MINHASH_K)
        ]
    )
    r = MINHASH_K // MINHASH_BANDS
    band_structs = [
        F.struct(
            F.lit(band).alias("band"),
            F.md5(
                F.concat_ws(
                    ",",
                    *[F.col(f"m{band * r + j}").cast("string") for j in range(r)],
                )
            ).alias("bkey"),
        )
        for band in range(MINHASH_BANDS)
    ]
    bands = mins.select(
        "doc_id", "is_new", F.explode(F.array(*band_structs)).alias("bc")
    ).select("doc_id", "is_new", F.col("bc.band").alias("band"), F.col("bc.bkey").alias("bkey"))
    n_side = bands.filter(F.col("is_new")).select(
        F.col("doc_id").alias("new_id"), "band", "bkey"
    )
    c_side = bands.filter(~F.col("is_new")).select(
        F.col("doc_id").alias("corpus_id"), "band", "bkey"
    )
    hits = (
        n_side.join(c_side, ["band", "bkey"])
        .groupBy("new_id")
        .agg(F.count_distinct("corpus_id").alias("near_candidates"))
    )
    return (
        exact.join(hits.withColumnRenamed("new_id", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            "exact_dup",
            F.coalesce("near_candidates", F.lit(0)).cast("bigint").alias(
                "near_candidates"
            ),
            (
                F.col("exact_dup") | (F.coalesce("near_candidates", F.lit(0)) > 0)
            ).alias("quarantine"),
        )
        .orderBy("doc_id")
    )


def _embedding_clusters_oracle() -> str:
    return f"""
    WITH RECURSIVE pairs AS ({_embedding_cosine_oracle()}),
    edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
    reach(src, dst) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
    ),
    members AS (
      SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
      FROM reach GROUP BY src
    )
    SELECT cluster_id, doc_id,
           CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
    FROM members
    ORDER BY cluster_id, doc_id
    """


@_register("dedup_embedding_clusters", oracle=_embedding_clusters_oracle())
def dedup_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic duplicate clusters: embedding-cosine near-dup pairs
    (paraphrases the shingle ladder can't see) resolved into connected
    components by star contraction — the same composition dedup_clusters
    applies to the lexical pair stream, proving the cluster stage is
    pair-source agnostic. Output contract matches dedup_clusters.

    Scale: pair discovery is the LSH-bucketed embedding path (near-linear
    candidates); contraction state is subgraph-scale with O(log n) rounds.
    """
    pairs = (
        dedup_embedding_cosine(spark, sf_dir)
        .select("doc_a", "doc_b")
        .localCheckpoint()
    )
    edges = pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    members = star_components(edges)
    from pyspark.sql import Window

    return members.select(
        "cluster_id",
        "doc_id",
        F.count("*").over(Window.partitionBy("cluster_id")).alias("cluster_size"),
    ).orderBy("cluster_id", "doc_id")


# --- cross-source overlap matrix / corpus boilerplate -------------------------

BOILER_NGRAM = 8
BOILER_MIN_DF = 2  # a shingle in >= 2 distinct docs counts as boilerplate


def _overlap_matrix_oracle() -> str:
    fp = hash60_sql("lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))")
    return f"""
    WITH fp AS (
      SELECT DISTINCT source, {fp} AS fp60
      FROM documents WHERE text IS NOT NULL
    ),
    tot AS (SELECT source, COUNT(*) AS n FROM fp GROUP BY source),
    ov AS (
      SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS shared
      FROM fp a JOIN fp b ON a.fp60 = b.fp60 AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT ta.source AS src_a, tb.source AS src_b,
           CAST(COALESCE(ov.shared, 0) AS BIGINT) AS shared_fps,
           ta.n AS n_a, tb.n AS n_b,
           ROUND(CAST(COALESCE(ov.shared, 0) AS DOUBLE)
                 / LEAST(ta.n, tb.n), 6) AS containment
    FROM tot ta
    JOIN tot tb ON ta.source < tb.source
    LEFT JOIN ov ON ov.src_a = ta.source AND ov.src_b = tb.source
    ORDER BY src_a, src_b
    """


@_register("source_overlap_matrix", oracle=_overlap_matrix_oracle())
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-overlap matrix: for every unordered pair of ingestion
    sources, how many distinct normalized-text fingerprints they share —
    the "is C4 already inside our CommonCrawl slice?" curation question,
    answered corpus-wide before choosing mixture weights.

    Scale shape: documents reduce to distinct (source, fp60) pairs at the
    scan (16-byte rows; bodies never shuffle). The ONE corpus-scale
    exchange is the fp60 equi-self-join — both sides share the same hash
    partitioning, and per-fp60 groups are duplicate-group sized, so no key
    is hot. Per-source totals and the pair skeleton are |sources|-sized:
    driver-trivial broadcast joins. Containment is normalized by the
    smaller side so a small curated set fully embedded in a crawl scores
    1.0 rather than vanishing.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), "\\s+", " "))
    fp = d.select("source", hash60(norm).alias("fp60")).distinct()
    tot = fp.groupBy("source").agg(F.count("*").alias("n"))
    a = fp.select(F.col("source").alias("src_a"), F.col("fp60").alias("fpa"))
    b = fp.select(F.col("source").alias("src_b"), F.col("fp60").alias("fpb"))
    ov = (
        a.join(b, (F.col("fpa") == F.col("fpb")) & (F.col("src_a") < F.col("src_b")))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").alias("shared"))
    )
    ta = tot.select(F.col("source").alias("src_a"), F.col("n").alias("n_a"))
    tb = tot.select(F.col("source").alias("src_b"), F.col("n").alias("n_b"))
    skeleton = ta.join(F.broadcast(tb), F.col("src_a") < F.col("src_b"))
    return (
        skeleton.join(ov, ["src_a", "src_b"], "left")
        .select(
            "src_a",
            "src_b",
            F.coalesce("shared", F.lit(0)).cast("bigint").alias("shared_fps"),
            "n_a",
            "n_b",
            F.round(
                F.coalesce("shared", F.lit(0)).cast("double")
                / F.least("n_a", "n_b"),
                6,
            ).alias("containment"),
        )
        .orderBy("src_a", "src_b")
    )


def _boilerplate_oracle() -> str:
    gram = hash60_sql(
        "array_to_string(toks[i:i+{m}], ' ')".format(m=BOILER_NGRAM - 1)
    )
    return f"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
      FROM documents
    ),
    idx AS (
      SELECT doc_id, toks,
             unnest(generate_series(1, len(toks) - {BOILER_NGRAM - 1})) AS i
      FROM t WHERE len(toks) >= {BOILER_NGRAM}
    ),
    sh AS (SELECT DISTINCT doc_id, {gram} AS sh60 FROM idx),
    hot AS (
      SELECT sh60 FROM (SELECT sh60, COUNT(*) AS df FROM sh GROUP BY sh60)
      WHERE df >= {BOILER_MIN_DF}
    )
    SELECT s.doc_id, COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN h.sh60 IS NULL THEN 0 ELSE 1 END) AS BIGINT)
             AS n_boilerplate,
           ROUND(CAST(SUM(CASE WHEN h.sh60 IS NULL THEN 0 ELSE 1 END) AS DOUBLE)
                 / COUNT(*), 6) AS boilerplate_ratio
    FROM sh s
    LEFT JOIN hot h ON s.sh60 = h.sh60
    GROUP BY s.doc_id
    ORDER BY s.doc_id
    """


@_register("corpus_boilerplate_ngrams", oracle=_boilerplate_oracle())
def corpus_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document boilerplate exposure: the fraction of a doc's distinct
    word 8-grams that recur in >= BOILER_MIN_DF distinct documents — the
    corpus-wide repeated-span detector (navboxes, license headers, cookie
    banners) that in-document repetition stats (text_repetition_stats) and
    cross-SPLIT overlap (corpus_decontaminate) both miss.

    Scale shape mirrors corpus_decontaminate: docs reduce to (doc_id,
    shingle-hash) streams at the scan — texts are dropped immediately — so
    the wide work is one distinct + one map-side-combined document-frequency
    count. The load-bearing asymmetry: the `hot` side of the membership join
    keeps ONLY shingles with df >= threshold, which is duplicate-volume
    sized, not corpus sized — at 100 TB it collapses to a broadcast/bloom
    side while the plan shape stays identical. Per-doc rollup rides doc_id.
    """
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", lower_ws_tokens("text").alias("toks")).filter(
        F.size("toks") >= BOILER_NGRAM
    )
    grams = F.expr(
        f"transform(sequence(1, size(toks) - {BOILER_NGRAM - 1}),"
        f" i -> array_join(slice(toks, i, {BOILER_NGRAM}), ' '))"
    )
    sh = (
        t.select("doc_id", F.explode(grams).alias("gram"))
        .select("doc_id", hash60(F.col("gram")).alias("sh60"))
        .distinct()
    )
    hot = (
        sh.groupBy("sh60")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= BOILER_MIN_DF)
        .select("sh60")
        .withColumn("hit", F.lit(1))
    )
    return (
        sh.join(hot, "sh60", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            .cast("bigint")
            .alias("n_boilerplate"),
            F.round(
                F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("double")
                / F.count("*"),
                6,
            ).alias("boilerplate_ratio"),
        )
        .orderBy("doc_id")
    )


# --- persisted LSH signature index (write-once / probe-many) ------------------

LSH_INDEX_BUCKETS = 64  # hash-buckets per band -> band x bucket Hive partitions


def _band_table(docs: DataFrame) -> DataFrame:
    """(doc_id, band, bkey) banded MinHash signature stream for ``docs``
    (any frame holding doc_id + text) — the persisted-index twin of the
    signature pipeline inside dedup_minhash_lsh / dedup_incremental."""
    base = hash60(F.col("s")) % MINHASH_PRIME
    sh = _shingles(docs, distinct=False)
    mins = sh.select("doc_id", base.alias("base")).groupBy("doc_id").agg(
        *[
            F.min(
                (F.lit(MINHASH_A[i]) * F.col("base") + F.lit(MINHASH_B[i]))
                % MINHASH_PRIME
            ).alias(f"m{i}")
            for i in range(MINHASH_K)
        ]
    )
    r = MINHASH_K // MINHASH_BANDS
    band_structs = [
        F.struct(
            F.lit(band).alias("band"),
            F.md5(
                F.concat_ws(
                    ",",
                    *[F.col(f"m{band * r + j}").cast("string") for j in range(r)],
                )
            ).alias("bkey"),
        )
        for band in range(MINHASH_BANDS)
    ]
    return mins.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bc")
    ).select("doc_id", F.col("bc.band").alias("band"), F.col("bc.bkey").alias("bkey"))


def _lsh_bucket(bkey) -> F.Column:
    """Stable bucket for a band key — MUST be identical at build and probe
    time (same Spark builtin, no oracle twin needed: the index surface is
    equality-gated against the inline dedup_incremental screen)."""
    return F.pmod(F.xxhash64(bkey), F.lit(LSH_INDEX_BUCKETS))


def lsh_build_index(
    spark: SparkSession,
    sf_dir: str,
    index_dir: str,
    docs: DataFrame | None = None,
) -> None:
    """Materialize the corpus-side banded MinHash signature index — the
    "production run PERSISTS the index" half of dedup_incremental's
    docstring, mirroring ivf_build_index for the lexical-dedup path.

    Writes (doc_id, bkey) Hive-partitioned by (band, bucket): 4 bands x 64
    hash-buckets of the band key. A probe that knows which buckets its
    batch hashes into prunes every other directory at the FILE level, so a
    day's ingest screen reads O(collided buckets), not the corpus. The
    corpus is the standing split dedup_incremental screens against
    (source != src0).
    """
    from ..functions.hashing import write_hash_mode_meta
    from ..functions.indexing import (
        clear_index_complete,
        discard_stale_stages,
        mark_index_complete,
    )

    clear_index_complete(spark, index_dir)
    # A committed _stage left by an older torn compact must not survive the
    # rebuild: index_maintain would attribute it to a torn swap and
    # converge pre-rebuild data into a torn-build artifact (advice r14).
    discard_stale_stages(spark, index_dir)
    d = (
        docs
        if docs is not None
        else load_table(spark, sf_dir, "documents").filter(F.col("source") != "src0")
    )
    bands = _band_table(d).withColumn("bucket", _lsh_bucket(F.col("bkey")))
    bands.write.mode("overwrite").partitionBy("band", "bucket").parquet(index_dir)
    # Band keys derive from hash60(shingle): pin the build's hash family so
    # a probe under the other family fails loudly instead of joining on
    # mismatched keys and silently reporting zero collisions.
    write_hash_mode_meta(spark, index_dir)
    mark_index_complete(spark, index_dir)


def lsh_append_index(
    spark: SparkSession, index_dir: str, batch_docs: DataFrame, resume: bool = False
) -> None:
    """Append a batch of (doc_id, text) documents to the PERSISTED banded
    MinHash signature index WITHOUT rebuilding it: the batch pays its own
    shingle → minhash → band pass (the signature pipeline is a pure
    per-document function, so batch signatures can never drift from a
    rebuild's), then only the (band, bucket) directories the batch hashes
    into are rewritten — existing members minus the batch's doc_ids plus
    the batch's rows.  The anti-join makes replays idempotent and a torn
    append convergent (``resume=True`` re-runs it); dynamic partition
    overwrite confines the write to the touched buckets, so a day's
    ingest costs O(batch + collided buckets), never the corpus — the
    missing write side of the dedup_incremental / run_stream_screen
    read-side economics.  Contract: doc_ids are content-immutable (a
    replayed id replaces its own rows; re-ingesting an id with DIFFERENT
    text is an update, which this index family does not model).
    """
    from ..functions.hashing import assert_hash_mode_meta
    from ..functions.indexing import (
        assert_index_complete,
        clear_index_complete,
        mark_index_complete,
    )

    if not resume:
        assert_index_complete(spark, index_dir)
    # The batch's band keys derive from the ACTIVE hash family; refuse to
    # mix them into an index pinned to the other one.
    assert_hash_mode_meta(spark, index_dir)
    clear_index_complete(spark, index_dir)
    new = _band_table(batch_docs).withColumn("bucket", _lsh_bucket(F.col("bkey")))
    parts = new.select("band", "bucket").distinct()
    part_rows = sorted((r.band, r.bucket) for r in parts.collect())
    if not part_rows:  # empty/shingle-free batch: nothing to merge
        mark_index_complete(spark, index_dir)
        return
    bands_hit = sorted({b for b, _ in part_rows})
    buckets_hit = sorted({u for _, u in part_rows})
    # Rectangle isin prunes at the FILE level (the probe's discipline);
    # the exact-pair semi join then drops the rectangle's corners so only
    # truly-touched directories are read back and rewritten.
    existing = (
        spark.read.parquet(index_dir)
        .filter(F.col("band").isin(bands_hit) & F.col("bucket").isin(buckets_hit))
        .join(F.broadcast(parts), ["band", "bucket"], "semi")
        .select(*new.columns)
    )
    merged = (
        existing.join(new.select("doc_id").distinct(), "doc_id", "left_anti")
        .unionByName(new)
        .localCheckpoint(eager=True)
    )
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("band", "bucket")
        .parquet(index_dir)
    )
    mark_index_complete(spark, index_dir)


def lsh_probe_indexed(
    spark: SparkSession, index_dir: str, sf_dir: str
) -> DataFrame:
    """Screen the new batch (source src0) against the PERSISTED signature
    index: per new document, the count of distinct corpus documents
    colliding with it in any band — exactly dedup_incremental's
    ``near_candidates`` column, but at O(batch) cost against a standing
    index instead of recomputing corpus signatures.

    The batch's (band, bucket) hit-list is bounded by batch x BANDS (and
    by the 256 existing partitions), so the driver-side collect that feeds
    the partition filter is trivially small; Catalyst turns the isin into
    partition-path pruning (plan-gated in tests with result equality vs
    the inline screen).
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("source") == "src0")
    return screen_docs_against_index(spark, d, index_dir)


def _lsh_appended_oracle(docs_where: str = "") -> str:
    """The hits-only tail of the incremental screen: per src0 document,
    distinct corpus docs colliding in any band — exactly what
    lsh_probe_indexed returns from the persisted index.
    ``docs_where``: optional predicate on the corpus CTE (the deleted-row
    oracle keeps the src0 batch but restricts the STANDING side to the
    surviving base, exactly the world the pruned index serves)."""
    base = hash60_sql("s")
    r = MINHASH_K // MINHASH_BANDS
    min_cols = ", ".join(
        f"MIN(({MINHASH_A[i]} * (base % {MINHASH_PRIME}) + {MINHASH_B[i]})"
        f" % {MINHASH_PRIME}) AS m{i}"
        for i in range(MINHASH_K)
    )
    band_rows = ",\n            ".join(
        "({b}, md5({key}))".format(
            b=b,
            key=" || ',' || ".join(f"m{b * r + j}::VARCHAR" for j in range(r)),
        )
        for b in range(MINHASH_BANDS)
    )
    return f"""
    WITH split AS (
      SELECT doc_id, text, source = 'src0' AS is_new FROM documents {docs_where}
    ),
    {_SHINGLES_CTE.replace("FROM documents", "FROM split")},
    hb AS (SELECT sh.doc_id, s2.is_new, {base} AS base
           FROM sh JOIN split s2 ON s2.doc_id = sh.doc_id),
    mh AS (SELECT doc_id, is_new, {min_cols} FROM hb GROUP BY doc_id, is_new),
    bands AS (SELECT doc_id, is_new, bb.band, bb.bkey
              FROM mh, LATERAL (VALUES
            {band_rows}) AS bb(band, bkey))
    SELECT n.doc_id,
           CAST(COUNT(DISTINCT c.doc_id) AS BIGINT) AS near_candidates
    FROM bands n JOIN bands c
      ON n.band = c.band AND n.bkey = c.bkey AND NOT c.is_new
    WHERE n.is_new
    GROUP BY n.doc_id
    ORDER BY n.doc_id
    """


@_register("dedup_lsh_appended", oracle=_lsh_appended_oracle())
def dedup_lsh_appended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of the banded-signature index verified END
    TO END as a registered query: build the persisted LSH index on the
    base 4/5 of the standing corpus (source != src0), lsh_append_index
    the remaining 1/5 (a later ingest day), then screen the src0 batch
    against the APPENDED artifact — and hold the same oracle the inline
    screen holds, because append == rebuild == inline collisions is the
    maintenance contract (pytest-gated pairwise; this row verifies the
    composition under the driver's datasets).  Scale shape: build is the
    one signature pass, append O(batch + collided buckets), probe the
    partition-pruned screen."""
    import shutil
    import tempfile

    d = load_table(spark, sf_dir, "documents").filter(F.col("source") != "src0")
    mx = d.agg(F.max("doc_id")).collect()[0][0]
    split = max(1, int(((mx or 0) + 1) * 4 // 5))
    tmp = tempfile.mkdtemp(prefix="lsh_appended_")
    try:
        lsh_build_index(
            spark, sf_dir, tmp, docs=d.filter(F.col("doc_id") < split)
        )
        lsh_append_index(spark, tmp, d.filter(F.col("doc_id") >= split))
        return lsh_probe_indexed(spark, tmp, sf_dir).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def screen_docs_against_index(
    spark: SparkSession, docs: DataFrame, index_dir: str
) -> DataFrame:
    """The reusable probe core: screen any (doc_id, text) batch against the
    persisted band-signature index (partition-pruned read, collision count
    per batch doc). lsh_probe_indexed is this over the sf_dir src0 split;
    streaming.run_stream_screen calls it per micro-batch."""
    from ..functions.hashing import assert_hash_mode_meta
    from ..functions.indexing import assert_index_complete

    assert_index_complete(spark, index_dir)
    assert_hash_mode_meta(spark, index_dir)
    nb = _band_table(docs).withColumn("bucket", _lsh_bucket(F.col("bkey")))
    hit_parts = sorted(
        {(r.band, r.bucket) for r in nb.select("band", "bucket").distinct().collect()}
    )
    bands_hit = sorted({b for b, _ in hit_parts})
    buckets_hit = sorted({u for _, u in hit_parts})
    index = spark.read.parquet(index_dir).filter(
        F.col("band").isin(bands_hit) & F.col("bucket").isin(buckets_hit)
    )
    return (
        nb.select(F.col("doc_id").alias("new_id"), "band", "bkey")
        .join(
            index.select(F.col("doc_id").alias("corpus_id"), "band", "bkey"),
            ["band", "bkey"],
        )
        .groupBy("new_id")
        .agg(F.count_distinct("corpus_id").alias("near_candidates"))
        .select(F.col("new_id").alias("doc_id"), "near_candidates")
        .orderBy("doc_id")
    )



# --- threshold calibration curve ---------------------------------------------

CURVE_THRESHOLDS = (0.5, 0.6, 0.7, 0.8, 0.9)


def _threshold_curve_oracle() -> str:
    th = ", ".join(f"(CAST({t} AS DOUBLE))" for t in CURVE_THRESHOLDS)
    return f"""
    WITH {_SHINGLES_CTE},
    cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
               FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
    pairs AS (
      SELECT doc_a, doc_b,
             common * 1.0 / (ca.n + cb.n - common) AS jac
      FROM common JOIN cnt ca ON ca.doc_id = doc_a
                  JOIN cnt cb ON cb.doc_id = doc_b
      WHERE common * 1.0 / (ca.n + cb.n - common) >= {min(CURVE_THRESHOLDS)}
    ),
    th(t) AS (VALUES {th}),
    pc AS (
      SELECT th.t, CAST(COUNT(p.doc_a) AS BIGINT) AS n_pairs
      FROM th LEFT JOIN pairs p ON p.jac >= th.t GROUP BY th.t
    ),
    dc AS (
      SELECT th.t, CAST(COUNT(DISTINCT u.doc) AS BIGINT) AS n_docs
      FROM th LEFT JOIN (
        SELECT doc_a AS doc, jac FROM pairs
        UNION ALL SELECT doc_b, jac FROM pairs
      ) u ON u.jac >= th.t
      GROUP BY th.t
    )
    SELECT pc.t AS threshold, pc.n_pairs, dc.n_docs
    FROM pc JOIN dc ON pc.t = dc.t
    ORDER BY threshold
    """


@_register("dedup_threshold_curve", oracle=_threshold_curve_oracle())
def dedup_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-aggressiveness calibration: for each candidate Jaccard
    threshold, how many near-dup pairs and how many distinct documents a
    dedup run at that threshold would touch — the table an operator reads
    before choosing how hard to deduplicate (0.9 = mirrors only, 0.5 =
    aggressive boilerplate collapse).

    Shape: the pair table is computed ONCE (the same inverted-index +
    candidate verification the dedup ladder runs; at 100 TB it reuses the
    LSH candidate path) and the curve is a 5-row broadcast-joined rollup
    over it — the sweep costs five filters over an already-tiny pair set,
    not five dedup runs. Unrounded Jaccard feeds the threshold compare in
    both engines so boundary pairs bin identically.
    """
    d = load_table(spark, sf_dir, "documents")
    pairs = _all_pairs_jaccard(d).filter(
        F.col("jaccard") >= min(CURVE_THRESHOLDS)
    )
    th = spark.createDataFrame(
        [(float(t),) for t in CURVE_THRESHOLDS], "t double"
    )
    pj = F.broadcast(th).join(pairs, pairs.jaccard >= F.col("t"), "left")
    pc = pj.groupBy("t").agg(F.count("doc_a").alias("n_pairs"))
    docs = pairs.select(F.col("doc_a").alias("doc"), "jaccard").unionAll(
        pairs.select(F.col("doc_b").alias("doc"), "jaccard")
    )
    dj = F.broadcast(th).join(docs, docs.jaccard >= F.col("t"), "left")
    dc = dj.groupBy("t").agg(F.count_distinct("doc").alias("n_docs"))
    return (
        pc.join(dc, "t")
        .select(F.col("t").alias("threshold"), "n_pairs", "n_docs")
        .orderBy("threshold")
    )


def _semantic_lexical_oracle() -> str:
    return f"""
    WITH lexical AS (
      SELECT doc_a, doc_b FROM ({_minhash_oracle()}) x
    ),
    semantic AS (
      SELECT doc_a, doc_b FROM ({_embedding_cosine_oracle()}) y
    ),
    agree AS (
      SELECT COUNT(*) AS both_pairs
      FROM lexical l JOIN semantic s
        ON l.doc_a = s.doc_a AND l.doc_b = s.doc_b
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM lexical) AS lexical_pairs,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM semantic) AS semantic_pairs,
           CAST(a.both_pairs AS BIGINT) AS both_pairs,
           ROUND(CAST(a.both_pairs AS DOUBLE) /
                 NULLIF((SELECT COUNT(*) FROM lexical)
                        + (SELECT COUNT(*) FROM semantic) - a.both_pairs, 0), 6)
             AS pair_jaccard
    FROM agree a
    """


@_register("dedup_semantic_lexical_agreement", oracle=_semantic_lexical_oracle())
def dedup_semantic_lexical_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-family dedup agreement: how much of the MinHash (lexical)
    near-dup pair set the embedding-cosine (semantic) detector also finds,
    and vice versa — pair-set Jaccard across the two families. High
    agreement means paraphrase detection adds little on this corpus; low
    agreement quantifies exactly what each family contributes, the input
    to "do we pay for the embedding pass?" (dedup_family_compare answers
    this WITHIN the lexical family; this is the cross-modality row).

    Shape: both pair generators run their own gated bucketed plans; the
    comparison is an equi-join of two duplicate-volume-sized pair sets
    plus scalar counts — negligible next to either generator.
    """
    lex = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    sem = dedup_embedding_cosine(spark, sf_dir).select("doc_a", "doc_b")
    # Pure DataFrame composition (no driver-side counts in the query
    # path): three 1-row aggregates cross-joined — scalar exchanges only.
    ln = lex.agg(F.count("*").cast("bigint").alias("lexical_pairs"))
    sn = sem.agg(F.count("*").cast("bigint").alias("semantic_pairs"))
    bn = (
        lex.join(sem, ["doc_a", "doc_b"])
        .agg(F.count("*").cast("bigint").alias("both_pairs"))
    )
    return ln.join(F.broadcast(sn)).join(F.broadcast(bn)).select(
        "lexical_pairs",
        "semantic_pairs",
        "both_pairs",
        F.round(
            F.try_divide(
                F.col("both_pairs").cast("double"),
                F.col("lexical_pairs")
                + F.col("semantic_pairs")
                - F.col("both_pairs"),
            ),
            6,
        ).alias("pair_jaccard"),
    )


def _cluster_histogram_oracle() -> str:
    chain, final = _clusters_oracle_parts()
    return f"""
    WITH RECURSIVE {chain},
    clusters AS ({final}),
    per AS (SELECT cluster_id, MAX(cluster_size) AS size
            FROM clusters GROUP BY cluster_id)
    SELECT CAST(FLOOR(ln(size) / ln(2)) AS BIGINT) AS size_log2_bucket,
           CAST(POW(2, FLOOR(ln(size) / ln(2))) AS BIGINT) AS min_size,
           CAST(COUNT(*) AS BIGINT) AS clusters,
           CAST(SUM(size) AS BIGINT) AS docs
    FROM per
    GROUP BY 1, 2
    ORDER BY size_log2_bucket
    """


@_register("dedup_cluster_size_histogram", oracle=_cluster_histogram_oracle())
def dedup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-pathology profile: log2 histogram of near-dup cluster
    sizes, with how many documents each size class holds — a corpus
    where most duplicate mass sits in a few giant clusters (mirrored
    sites, boilerplate storms) needs different treatment (drop the
    cluster) than one with many pairs (keep one of each), and this is
    the table that tells them apart.

    Shape: cluster resolution is the gated min-label-propagation plan;
    the histogram is one groupBy over |clusters| rows then a bucket
    rollup — noise next to the component computation.
    """
    clusters = dedup_clusters(spark, sf_dir)
    per = clusters.groupBy("cluster_id").agg(F.max("cluster_size").alias("size"))
    bucket = F.floor(F.log(F.col("size").cast("double")) / F.log(F.lit(2.0))).cast(
        "bigint"
    )
    return (
        per.select(bucket.alias("size_log2_bucket"), "size")
        .groupBy("size_log2_bucket")
        .agg(
            F.pow(F.lit(2.0), F.col("size_log2_bucket")).cast("bigint").alias(
                "min_size"
            ),
            F.count("*").cast("bigint").alias("clusters"),
            F.sum("size").cast("bigint").alias("docs"),
        )
        .orderBy("size_log2_bucket")
    )


# --- per-document n-gram novelty ----------------------------------------------


def _novelty_oracle() -> str:
    return f"""
    WITH {_SHINGLES_CTE},
    df AS (
      SELECT s, COUNT(*) AS n_docs FROM sh GROUP BY s
    )
    SELECT sh.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN df.n_docs = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS novel_shingles,
           ROUND(SUM(CASE WHEN df.n_docs = 1 THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS novelty_ratio
    FROM sh JOIN df ON df.s = sh.s
    GROUP BY sh.doc_id ORDER BY sh.doc_id
    """


@_register("corpus_ngram_novelty", oracle=_novelty_oracle())
def corpus_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a document's distinct
    shingles that occur in NO other document — the per-doc inverse of
    corpus_boilerplate_ngrams (which ranks the corpus's most-duplicated
    shingles). Low novelty = template/boilerplate assembly; high novelty =
    original text. Curation uses it to pick which side of a near-dup
    cluster to keep and to down-weight mashup sources.

    Shape: ONE distinct-(doc_id, shingle-hash) stream feeds both sides —
    the shingle document-frequency aggregate (map-side combined, carries
    8-byte hashes) and the per-doc rollup after an equi-join on the hash.
    Document bodies never shuffle; the join carries (doc_id, hash, df)
    triples. At 100 TB this is the same exchange discipline as the
    decontamination/boilerplate family; a frequency-sketch variant (CMS
    over shingles, map-side novelty test) is the drop-in if even the
    df join is unwanted.

    Collision exposure: document frequency is computed over hash60(shingle),
    so two distinct shingles colliding (~2^-60 per pair) would mark a novel
    shingle as duplicated with no rerank step to catch it (unlike the LSH
    candidate → verify pattern). Accepted: at 100 TB the hash stream is the
    whole point (8-byte keys instead of shingle strings in the shuffle), and
    the expected collision count stays ≪ 1 until ~10^8 distinct shingles
    per-pair-tested against each other.
    """
    d = load_table(spark, sf_dir, "documents")
    sh = _shingles(d, distinct=True).select("doc_id", hash60(F.col("s")).alias("h"))
    df = sh.groupBy("h").agg(F.count("*").alias("n_docs"))
    novel = (F.col("n_docs") == 1).cast("long")
    return (
        sh.join(df, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_shingles"),
            F.sum(novel).cast("bigint").alias("novel_shingles"),
            F.round(F.sum(novel) / F.count("*").cast("double"), 6).alias(
                "novelty_ratio"
            ),
        )
        .orderBy("doc_id")
    )


def _dedup_impact_oracle() -> str:
    chain, final_select = _clusters_oracle_parts()
    return f"""
    WITH RECURSIVE {chain},
    clusters AS ({final_select}),
    surv AS (
      SELECT d.doc_id, d.source,
             len(regexp_split_to_array(lower(trim(d.text)), '\\s+')) AS n_tokens,
             (c.doc_id IS NULL OR c.cluster_id = d.doc_id) AS is_survivor
      FROM documents d LEFT JOIN clusters c ON c.doc_id = d.doc_id
      WHERE d.text IS NOT NULL AND trim(d.text) <> ''
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS docs_total,
           CAST(SUM(CASE WHEN is_survivor THEN 0 ELSE 1 END) AS BIGINT)
             AS docs_dropped,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_total,
           CAST(SUM(CASE WHEN is_survivor THEN 0 ELSE n_tokens END) AS BIGINT)
             AS tokens_dropped,
           ROUND(SUM(CASE WHEN is_survivor THEN 0 ELSE n_tokens END) * 1.0
                 / SUM(n_tokens), 6) AS token_drop_rate
    FROM surv GROUP BY source ORDER BY source
    """


@_register("corpus_dedup_impact_report", oracle=_dedup_impact_oracle())
def corpus_dedup_impact_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What deduplication actually costs, per source: documents and tokens
    that the survivor policy (dedup_survivors: min-id representative per
    near-dup cluster) would drop, with the per-source token drop rate.
    This is the accounting surface a curation review reads before
    committing a dedup pass — a source with an outlier drop rate is
    either a mirror/scrape (working as intended) or a false-positive
    cluster problem (threshold too loose for that domain), and this
    report is what routes the investigation.

    Shape: survivor assignment is subgraph-scale (dedup_clusters on the
    near-dup pair graph); the corpus side contributes one scan projecting
    (doc_id, source, token count) and a left join keyed on doc_id — text
    never shuffles — collapsing into a |sources|-bounded rollup.
    """
    d = load_table(spark, sf_dir, "documents")
    surv = dedup_survivors(spark, sf_dir).select("doc_id", "is_survivor")
    t = (
        d.filter(F.col("text").isNotNull() & (F.trim("text") != ""))
        .select("doc_id", "source", lower_ws_tokens("text").alias("toks"))
        .select("doc_id", "source", F.size("toks").alias("n_tokens"))
    )
    j = t.join(surv, "doc_id", "left")
    dropped_docs = F.when(F.col("is_survivor"), 0).otherwise(1)
    dropped_toks = F.when(F.col("is_survivor"), 0).otherwise(F.col("n_tokens"))
    return (
        j.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("docs_total"),
            F.sum(dropped_docs).cast("bigint").alias("docs_dropped"),
            F.sum("n_tokens").cast("bigint").alias("tokens_total"),
            F.sum(dropped_toks).cast("bigint").alias("tokens_dropped"),
            F.round(
                F.sum(dropped_toks) * F.lit(1.0) / F.sum("n_tokens"), 6
            ).alias("token_drop_rate"),
        )
        .orderBy("source")
    )


def _span_decon_oracle() -> str:
    split = hash60_sql("CAST(doc_id AS VARCHAR)", salt="split")
    gram = hash60_sql("array_to_string(toks[i:i+{m}], ' ')".format(m=DECON_NGRAM - 1))
    return f"""
    WITH t AS (
      SELECT doc_id,
             {split} % 100 < {DECON_TRAIN_PCT} AS is_train,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
      FROM documents
    ),
    idx AS (
      SELECT doc_id, is_train, toks,
             unnest(generate_series(1, len(toks) - {DECON_NGRAM - 1})) AS i
      FROM t WHERE len(toks) >= {DECON_NGRAM}
    ),
    g AS (SELECT doc_id, is_train, i, {gram} AS sh60 FROM idx),
    train_sh AS (SELECT DISTINCT sh60 FROM g WHERE is_train),
    hits AS (SELECT g.doc_id, g.i
             FROM g JOIN train_sh tr ON g.sh60 = tr.sh60
             WHERE NOT g.is_train),
    runs AS (
      SELECT doc_id, i,
             LAG(i) OVER (PARTITION BY doc_id ORDER BY i) AS prev
      FROM hits
    ),
    spans AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_hit_positions,
             CAST(SUM(CASE WHEN prev IS NULL OR i - prev > 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_spans,
             CAST(MIN(i) AS BIGINT) AS first_hit_pos,
             CAST(MAX(i) AS BIGINT) AS last_hit_pos
      FROM runs GROUP BY doc_id
    ),
    covp AS (
      SELECT doc_id, unnest(generate_series(i, i + {DECON_NGRAM - 1})) AS p
      FROM hits
    ),
    cov AS (
      SELECT doc_id, COUNT(DISTINCT p) AS covered
      FROM covp GROUP BY doc_id
    ),
    nt AS (SELECT doc_id, len(toks) AS n_tokens FROM t)
    SELECT s.doc_id, s.n_hit_positions, s.n_spans,
           s.first_hit_pos, s.last_hit_pos,
           CAST(c.covered AS BIGINT) AS contaminated_tokens,
           ROUND(c.covered * 1.0 / n.n_tokens, 6) AS contaminated_frac
    FROM spans s JOIN cov c ON c.doc_id = s.doc_id
                 JOIN nt n ON n.doc_id = s.doc_id
    ORDER BY s.doc_id
    """


@_register("corpus_span_decontaminate", oracle=_span_decon_oracle())
def corpus_span_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level decontamination: WHERE inside each contaminated held-out
    document the training overlap lives. corpus_decontaminate answers
    "how much of this doc leaked"; this answers "which token ranges" —
    the difference between dropping a whole document and surgically
    cutting the quoted benchmark passage while keeping the rest (the
    policy Lee et al.'s exact-substring dedup applies at corpus scale).
    Per contaminated doc: hit-position count, number of MAXIMAL
    contiguous spans, first/last hit position, and the token mass the
    8-gram hits actually cover (union of overlapping windows, as a count
    and as a fraction of the doc).

    Scale shape: identical exchange discipline to corpus_decontaminate —
    texts drop to (doc_id, position, 8-gram hash) streams at the scan,
    the one wide shuffle is the hash equi-join against the distinct
    train-side set, and everything after (LAG run detection, coverage
    count-distinct) rides doc_id at CONTAMINATED-doc cardinality, the
    smallest set in the whole pipeline.
    """
    d = load_table(spark, sf_dir, "documents")
    is_train = (
        hash60(F.col("doc_id").cast("string"), salt="split") % 100 < DECON_TRAIN_PCT
    )
    toks = lower_ws_tokens("text")
    t = d.select("doc_id", is_train.alias("is_train"), toks.alias("toks")).filter(
        F.size("toks") >= DECON_NGRAM
    )
    grams = F.expr(
        f"transform(sequence(1, size(toks) - {DECON_NGRAM - 1}),"
        f" i -> array_join(slice(toks, i, {DECON_NGRAM}), ' '))"
    )
    g = t.select(
        "doc_id", "is_train", F.posexplode(grams).alias("pos", "gram")
    ).select(
        "doc_id",
        "is_train",
        (F.col("pos") + 1).cast("bigint").alias("i"),
        hash60(F.col("gram")).alias("sh60"),
    )
    train_sh = g.filter(F.col("is_train")).select("sh60").distinct()
    hits = (
        g.filter(~F.col("is_train"))
        .join(train_sh, "sh60", "left_semi")
        .select("doc_id", "i")
    )
    w = Window.partitionBy("doc_id").orderBy("i")
    runs = hits.withColumn("prev", F.lag("i").over(w))
    spans = runs.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_hit_positions"),
        F.sum(
            F.when(
                F.col("prev").isNull() | (F.col("i") - F.col("prev") > 1), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_spans"),
        F.min("i").cast("bigint").alias("first_hit_pos"),
        F.max("i").cast("bigint").alias("last_hit_pos"),
    )
    cov = (
        hits.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("i"), F.col("i") + F.lit(DECON_NGRAM - 1))
            ).alias("p"),
        )
        .groupBy("doc_id")
        .agg(F.countDistinct("p").cast("bigint").alias("contaminated_tokens"))
    )
    nt = t.select("doc_id", F.size("toks").alias("n_tokens"))
    return (
        spans.join(cov, "doc_id")
        .join(nt, "doc_id")
        .select(
            "doc_id",
            "n_hit_positions",
            "n_spans",
            "first_hit_pos",
            "last_hit_pos",
            "contaminated_tokens",
            F.round(
                F.col("contaminated_tokens") * F.lit(1.0) / F.col("n_tokens"), 6
            ).alias("contaminated_frac"),
        )
        .orderBy("doc_id")
    )


def _lsh_recall_oracle() -> str:
    ctes, final = _minhash_oracle_parts()
    return f"""
    WITH {ctes},
    lsh AS ({final}),
    tcnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    tcommon AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
    truth AS (SELECT doc_a, doc_b
              FROM tcommon JOIN tcnt ca ON ca.doc_id = doc_a
                           JOIN tcnt cb ON cb.doc_id = doc_b
              WHERE common * 1.0 / (ca.n + cb.n - common)
                    >= {JACCARD_THRESHOLD}),
    m AS (SELECT
            (SELECT COUNT(*) FROM truth) AS n_truth,
            (SELECT COUNT(*) FROM lsh) AS n_lsh_verified,
            (SELECT COUNT(*) FROM cand) AS n_candidates,
            (SELECT COUNT(*) FROM lsh l JOIN truth t
              ON t.doc_a = l.doc_a AND t.doc_b = l.doc_b) AS true_pos)
    SELECT CAST(n_truth AS BIGINT) AS n_truth,
           CAST(n_lsh_verified AS BIGINT) AS n_lsh_verified,
           CAST(n_candidates AS BIGINT) AS n_candidates,
           CAST(true_pos AS BIGINT) AS true_pos,
           ROUND(true_pos * 1.0 / NULLIF(n_truth, 0), 6) AS recall,
           ROUND(true_pos * 1.0 / NULLIF(n_candidates, 0), 6)
             AS candidate_precision
    FROM m
    """


@_register("dedup_lsh_recall_report", oracle=_lsh_recall_oracle())
def dedup_lsh_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The banding-quality scoreboard: LSH-discovered near-dup pairs vs the
    EXACT all-pairs ground truth at the same Jaccard threshold. Recall
    here is the number the (bands, rows-per-band) S-curve promises on
    paper — this measures it on the actual corpus, per corpus, which is
    what decides whether 4x4 banding is leaving duplicate families
    undiscovered. candidate_precision (verified hits / band candidates)
    is the verification-cost dial: low precision means buckets are too
    coarse and the exact-Jaccard stage is paying for collisions.
    The lexical twin of similarity_ann_recall_report; the estimator
    audit (dedup_minhash_estimator_audit) checks the HASH FAMILY, this
    checks the BANDING built on top of it.

    Shape: truth rides the inverted-index self-join (quadratic-by-design
    verification path, candidate-bounded at scale when fed from LSH);
    the four counts are one-row aggregates cross-joined into the single
    report row — the dedup_family_compare pattern.
    """
    d = load_table(spark, sf_dir, "documents")
    truth = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    lsh = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    cand = _minhash_candidates(d)
    nt = truth.groupBy().agg(F.count("*").cast("bigint").alias("n_truth"))
    nl = lsh.groupBy().agg(F.count("*").cast("bigint").alias("n_lsh_verified"))
    nc = cand.groupBy().agg(F.count("*").cast("bigint").alias("n_candidates"))
    tp = (
        lsh.join(truth, ["doc_a", "doc_b"])
        .groupBy()
        .agg(F.count("*").cast("bigint").alias("true_pos"))
    )
    return (
        nt.crossJoin(nl)
        .crossJoin(nc)
        .crossJoin(tp)
        .select(
            "n_truth",
            "n_lsh_verified",
            "n_candidates",
            "true_pos",
            F.round(
                F.col("true_pos") * F.lit(1.0) / F.nullif("n_truth", F.lit(0)), 6
            ).alias("recall"),
            F.round(
                F.col("true_pos") * F.lit(1.0) / F.nullif("n_candidates", F.lit(0)),
                6,
            ).alias("candidate_precision"),
        )
    )


DUP_PASSAGE_TOPK = 20


def _dup_passages_oracle() -> str:
    from .text import ROLL_W, _rolling_oracle

    return f"""
    WITH roll AS ({_rolling_oracle()}),
    byhash AS (
      SELECT chunk_hash,
             COUNT(DISTINCT doc_id) AS n_docs,
             COUNT(*) AS n_occurrences,
             MIN(doc_id) AS rep_doc
      FROM roll GROUP BY chunk_hash
      HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    top AS (
      SELECT * FROM byhash
      ORDER BY n_docs DESC, n_occurrences DESC, chunk_hash
      LIMIT {DUP_PASSAGE_TOPK}
    ),
    rep AS (
      SELECT t.chunk_hash, t.n_docs, t.n_occurrences, t.rep_doc,
             MIN(r.pos) AS rep_pos
      FROM top t JOIN roll r
        ON r.chunk_hash = t.chunk_hash AND r.doc_id = t.rep_doc
      GROUP BY t.chunk_hash, t.n_docs, t.n_occurrences, t.rep_doc
    )
    SELECT rep.chunk_hash,
           CAST(rep.n_docs AS BIGINT) AS n_docs,
           CAST(rep.n_occurrences AS BIGINT) AS n_occurrences,
           rep.rep_doc, rep.rep_pos,
           array_to_string(
             list_slice(regexp_split_to_array(lower(trim(d.text)), '\\s+'),
                        CAST(rep.rep_pos AS INTEGER),
                        CAST(rep.rep_pos + {ROLL_W} - 1 AS INTEGER)),
             ' ') AS passage
    FROM rep JOIN documents d ON d.doc_id = rep.rep_doc
    ORDER BY n_docs DESC, n_occurrences DESC, chunk_hash
    """


@_register("corpus_duplicate_passages", oracle=_dup_passages_oracle())
def corpus_duplicate_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide repeated-passage ranking: the most widely shared
    content-defined chunks (doc_rolling_fingerprint's rsync/LBFS boundaries)
    with the actual passage text sliced back out of a representative
    document — the human-readable "what exactly is being copied" report that
    sits above the pair-level span explainer (dedup_pair_overlap_spans needs
    a verified pair table; this needs nothing but the corpus).

    Distinct from corpus_boilerplate_ngrams on purpose: fixed shingles rank
    every n-gram window, so a long duplicated passage smears across dozens
    of overlapping shingles; content-defined boundaries collapse it to its
    stable chunk fingerprints, which survive upstream edits (an insertion
    shifts no boundary after the next zero residue).

    Shape: the fingerprint stream is map-only per doc; a map-side-combined
    groupBy on chunk_hash keeps only multi-doc hashes and
    TakeOrderedAndProject cuts top-k. The rep-position re-probe recomputes
    the stream with the tiny top-k table broadcast (two corpus passes in
    this inline form — at 100 TB the stream is persisted once, it is ~1/64
    of token volume, and both consumers read the parquet, the persisted-
    index discipline of the BM25/LSH tier); the text slice touches exactly
    top-k representative documents. Bodies never shuffle, the rollup output
    is chunk-cardinality bounded.

    Reference scope: extends the dedup ladder (SURVEY.md §2 extension
    tier); no reference twin — the reference's corpus has no passage-level
    dedup surface.
    """
    from .text import ROLL_W, doc_rolling_fingerprint

    roll = doc_rolling_fingerprint(spark, sf_dir)
    byhash = (
        roll.groupBy("chunk_hash")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.count("*").cast("bigint").alias("n_occurrences"),
            F.min("doc_id").alias("rep_doc"),
        )
        .filter(F.col("n_docs") >= 2)
    )
    top = byhash.orderBy(
        F.col("n_docs").desc(), F.col("n_occurrences").desc(), "chunk_hash"
    ).limit(DUP_PASSAGE_TOPK)
    # rep_pos: earliest boundary position of this chunk inside the
    # representative doc — re-probe the fingerprint stream with the tiny
    # top-k table broadcast, then slice the passage from the rep doc's
    # token array (top-k-bounded text access).
    rep = (
        F.broadcast(top)
        .join(
            roll.select(
                F.col("doc_id").alias("rep_doc"),
                "chunk_hash",
                "pos",
            ),
            ["chunk_hash", "rep_doc"],
        )
        .groupBy("chunk_hash", "n_docs", "n_occurrences", "rep_doc")
        .agg(F.min("pos").alias("rep_pos"))
    )
    d = load_table(spark, sf_dir, "documents")
    return (
        F.broadcast(rep)
        .join(d.select("doc_id", "text"), rep.rep_doc == F.col("doc_id"))
        .select(
            "chunk_hash",
            "n_docs",
            "n_occurrences",
            "rep_doc",
            "rep_pos",
            F.array_join(
                F.slice(
                    lower_ws_tokens("text"),
                    F.col("rep_pos").cast("int"),
                    ROLL_W,
                ),
                " ",
            ).alias("passage"),
        )
        .orderBy(F.col("n_docs").desc(), F.col("n_occurrences").desc(), "chunk_hash")
    )


# --- AllPairs/PPJoin prefix-filter similarity join (round 8) ---------------

PREFIX_W = 4  # shingle width (tokens) — the RefinedWeb/MassiveText regime

_PREFIX_ORACLE = f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    idx AS (SELECT doc_id, toks,
                   unnest(generate_series(1, len(toks) - {PREFIX_W - 1})) AS i
            FROM t WHERE len(toks) >= {PREFIX_W}),
    shm AS (SELECT doc_id,
                   toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                           || ' ' || toks[i+3] AS s
            FROM idx),
    hsh AS (SELECT DISTINCT doc_id, {hash60_sql('s')} AS h FROM shm),
    cnt AS (SELECT doc_id, count(*) AS n FROM hsh GROUP BY doc_id),
    common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
               FROM hsh a JOIN hsh b ON a.h = b.h AND a.doc_id < b.doc_id
               GROUP BY 1, 2)
    SELECT doc_a, doc_b, CAST(common AS BIGINT) AS common_shingles,
           ROUND(common * 1.0 / (ca.n + cb.n - common), 6) AS jaccard
    FROM common JOIN cnt ca ON ca.doc_id = doc_a
                JOIN cnt cb ON cb.doc_id = doc_b
    WHERE common * 1.0 / (ca.n + cb.n - common) >= {JACCARD_THRESHOLD}
    ORDER BY doc_a, doc_b
    """


@_register("dedup_prefix_filter_join", oracle=_PREFIX_ORACLE)
def dedup_prefix_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT thresholded Jaccard self-join via prefix filtering (AllPairs /
    PPJoin, Bayardo et al. WWW'07 / Xiao et al. WWW'08 — public methods):
    the deterministic-recall alternative to MinHash-LSH. LSH trades recall
    for candidate volume via the banding S-curve; prefix filtering is
    LOSSLESS — its output is bit-identical to the all-pairs truth — while
    still never enumerating the quadratic pair space.

    The pruning lemma: order every doc's shingle set by one GLOBAL order
    (document frequency ascending, hash ascending — rarest first). If
    |a∩b| >= o, the smallest common element in that order sits within the
    first n-o+1 elements of BOTH sets (all o-1 other common elements rank
    after it). J(a,b) >= t forces o >= ceil(t*max(na,nb)), so probing only
    each doc's prefix of length n - ceil(t*n) + 1 finds every qualifying
    pair — candidates then length-filtered (t*max <= min, integer-exact at
    t=0.5 as 2*min >= max) and exact-verified on in-row hashed sets
    (_doc_shingle_sets + the LSH ladder's broadcast verifier).

    At 100 TB: DF-ascending order puts each doc's RAREST shingles in its
    prefix, so the prefix inverted index is maximally selective and
    boilerplate/stop shingles (the skew killers of a naive token self-join)
    are structurally excluded from candidate generation — they rank last.
    The prefix stream is ~(1-t) of the shingle stream; the DF aggregate and
    the prefix self-join shuffle on the shingle hash, the ranking window on
    doc_id — every exchange carries (id, hash, small ints), never text.
    Verification scans CANDIDATE docs only (broadcast semi-join prune) and
    candidates sit behind a localCheckpoint cut, so its three consumers
    cannot re-run the prefix pipeline; nothing corpus-scale is ever
    broadcast or pinned. The oracle is the brute-force all-pairs truth —
    what makes this operator EXACT is precisely that the prefix filter is
    provably lossless.

    Shingles are 4-token windows (the RefinedWeb/MassiveText dedup
    regime), wider than the ladder's 2-grams ON PURPOSE: prefix filtering
    prunes exactly as well as document frequency discriminates, and a
    narrow shingle domain (the degenerate small-vocabulary case) makes
    every bigram common — with w=4 the domain is |V|^4, DF is informative,
    and candidate volume stays near-linear even on vocabulary-poor
    corpora. The truth (and the oracle) is 4-gram Jaccard >= t, exactly
    as the ladder's truth is 2-gram Jaccard.
    """
    t = JACCARD_THRESHOLD
    d = load_table(spark, sf_dir, "documents")
    toks = lower_ws_tokens("text")
    base = d.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= PREFIX_W)
    sh = (
        base.select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(toks) - {PREFIX_W - 1}), i ->"
                    " concat_ws(' ', toks[i-1], toks[i], toks[i+1], toks[i+2]))"
                )
            ).alias("s"),
        )
        .distinct()
        .select("doc_id", hash60("s").alias("h"))
    )
    df_tbl = sh.groupBy("h").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "h")
    ranked = sh.join(df_tbl, "h").select(
        "doc_id",
        "h",
        F.row_number().over(w).alias("pos"),
        F.count("*").over(Window.partitionBy("doc_id")).alias("n"),
    )
    prefix = ranked.filter(
        F.col("pos") <= F.expr(f"CAST(n - ceil({t} * n) + 1 AS INT)")
    )
    a = prefix.select(F.col("doc_id").alias("doc_a"), "h", F.col("n").alias("na"))
    b = prefix.select(F.col("doc_id").alias("doc_b"), "h", F.col("n").alias("nb"))
    cand = (
        a.join(b, "h")
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            # length filter: t*max(na,nb) <= min(na,nb); at t=1/2 the
            # integer form below is exact (no float boundary to disagree on)
            & (2 * F.least("na", "nb") >= F.greatest("na", "nb"))
        )
        .select("doc_a", "doc_b")
        .distinct()
        # localCheckpoint on the candidate-SCALE pair set: its three
        # consumers (the verify join + both arms of the id union) prune
        # differently, so exchange canonicalization cannot serve them from
        # one materialization — the checkpoint stops each from re-running
        # the whole prefix pipeline. Candidates are the near-dup fraction,
        # so the cut is small by construction.
        .localCheckpoint()
    )
    # Verification scans CANDIDATE docs only (broadcast semi-join prune —
    # the minhash verifier's discipline; broadcasting the full corpus set
    # table would be the scale killer): in-row 4-gram hashed sets,
    # _doc_shingle_sets' shape at w=4, same nullability annotation.
    cand_ids = cand.select(F.col("doc_a").alias("doc_id")).union(
        cand.select(F.col("doc_b").alias("doc_id"))
    )
    pruned = base.join(F.broadcast(cand_ids), "doc_id", "left_semi")
    hashed = F.transform(
        F.expr(
            f"transform(sequence(1, size(toks) - {PREFIX_W - 1}), i ->"
            " concat_ws(' ', toks[i-1], toks[i], toks[i+1], toks[i+2]))"
        ),
        lambda s: hash60(s),
    )
    sets = pruned.select(
        "doc_id",
        F.coalesce(
            F.sort_array(F.array_distinct(hashed)), F.array().cast("array<bigint>")
        ).alias("sset"),
    ).withColumn("n", F.size("sset"))
    verified = _pair_jaccard_sets(sets, cand)
    return (
        verified.filter(F.col("jaccard") >= t)
        .select(
            "doc_a",
            "doc_b",
            F.col("common").cast("bigint").alias("common_shingles"),
            F.round("jaccard", 6).alias("jaccard"),
        )
        .orderBy("doc_a", "doc_b")
    )


# --- quality-aware survivor selection (round 8) -----------------------------

def _quality_survivors_oracle() -> str:
    chain, final_select = _clusters_oracle_parts()
    return f"""
    WITH RECURSIVE {chain},
    clusters AS ({final_select}),
    feat AS (
      SELECT doc_id,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
             CASE
               WHEN len(regexp_split_to_array(trim(text), '\\s+')) >= 50
                    AND CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))
                             AS DOUBLE) / length(text) < 0.05 THEN 2
               WHEN len(regexp_split_to_array(trim(text), '\\s+')) >= 20 THEN 1
               ELSE 0
             END AS q
      FROM documents
    ),
    m AS (
      SELECT f.doc_id, COALESCE(c.cluster_id, f.doc_id) AS cluster_id,
             CAST(COALESCE(c.cluster_size, 1) AS BIGINT) AS cluster_size,
             f.n_tokens, f.q
      FROM feat f LEFT JOIN clusters c ON c.doc_id = f.doc_id
    ),
    r AS (
      SELECT m.*,
             FIRST_VALUE(doc_id) OVER (PARTITION BY cluster_id
                                       ORDER BY q DESC, n_tokens DESC, doc_id)
               AS survivor_doc
      FROM m
    )
    SELECT doc_id, cluster_id, cluster_size,
           CAST(q AS BIGINT) AS quality_rank,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           survivor_doc, doc_id = survivor_doc AS is_survivor
    FROM r ORDER BY doc_id
    """


@_register("dedup_quality_survivors", oracle=_quality_survivors_oracle())
def dedup_quality_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware survivor selection: within each near-dup cluster keep
    the BEST copy, not the lowest doc_id. dedup_survivors' min-id canon is
    replay-stable but quality-blind — when a cluster mixes a clean original
    with truncated/mojibake mirrors, the keeper should be chosen by signal.
    Policy (ties broken deterministically): text_quality's rule bucket
    (good=2 / fair=1 / poor=0) first, then token count (longest), then
    min doc_id — the RefinedWeb/CCNet convention of keeping the longest
    best-bucket copy so downstream token mass is preserved.

    Shape: the quality features are a map-only projection (text never
    shuffles — features reduce each doc to two ints before any exchange);
    cluster membership is the subgraph-scale dedup_clusters table; the
    argmax is ONE first_value window over (cluster_id) on narrow
    (doc_id, q, n_tokens) rows. Singletons carry cluster_id = doc_id, so
    their window partitions are width-1 — the exchange is corpus-shaped
    but minimal-width, and the survivor flag needs no second join.

    All-integer ranking (bucket, token count, id): no float enters the
    ordering, so both engines agree on every tie exactly.
    """
    from ..functions.textfns import ws_token_count

    d = load_table(spark, sf_dir, "documents")
    n_tokens = ws_token_count("text")
    n_punct = F.size(
        F.regexp_extract_all(F.col("text"), F.lit("[^A-Za-z0-9\\s]"), F.lit(0))
    )
    q = (
        F.when(
            (n_tokens >= 50)
            & (F.try_divide(n_punct.cast("double"), F.length("text")) < 0.05),
            2,
        )
        .when(n_tokens >= 20, 1)
        .otherwise(0)
    )
    feat = d.select("doc_id", n_tokens.alias("n_tokens"), q.alias("q"))
    members = dedup_clusters(spark, sf_dir).select(
        "doc_id", "cluster_id", "cluster_size"
    )
    m = (
        feat.join(members, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
            F.coalesce("cluster_size", F.lit(1)).cast("bigint").alias("cluster_size"),
            "n_tokens",
            "q",
        )
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("q").desc(), F.col("n_tokens").desc(), F.col("doc_id")
    )
    return (
        m.withColumn("survivor_doc", F.first("doc_id").over(w))
        .select(
            "doc_id",
            "cluster_id",
            "cluster_size",
            F.col("q").cast("bigint").alias("quality_rank"),
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            "survivor_doc",
            (F.col("doc_id") == F.col("survivor_doc")).alias("is_survivor"),
        )
        .orderBy("doc_id")
    )


# --- dedup cascade (marginal removal per stage) (round 8) --------------------

def _cascade_oracle() -> str:
    chain, final_select = _clusters_oracle_parts()
    fp = hash60_sql("lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))")
    return f"""
    WITH RECURSIVE {chain},
    clusters AS ({final_select}),
    fp AS (SELECT doc_id, {fp} AS f FROM documents),
    s1 AS (SELECT MIN(doc_id) AS doc_id FROM fp GROUP BY f),
    m AS (SELECT s1.doc_id, COALESCE(c.cluster_id, s1.doc_id) AS cl
          FROM s1 LEFT JOIN clusters c ON c.doc_id = s1.doc_id),
    s2 AS (SELECT MIN(doc_id) AS doc_id FROM m GROUP BY cl),
    n0 AS (SELECT COUNT(*) AS c FROM documents),
    n1 AS (SELECT COUNT(*) AS c FROM s1),
    n2 AS (SELECT COUNT(*) AS c FROM s2)
    SELECT stage_ord, stage, docs_in, docs_out,
           docs_in - docs_out AS removed,
           ROUND(CAST(docs_in - docs_out AS DOUBLE) / docs_in, 6)
             AS removal_rate
    FROM (
      SELECT CAST(1 AS BIGINT) AS stage_ord, 'exact' AS stage,
             CAST(n0.c AS BIGINT) AS docs_in, CAST(n1.c AS BIGINT) AS docs_out
      FROM n0 CROSS JOIN n1
      UNION ALL
      SELECT 2, 'minhash_lsh', CAST(n1.c AS BIGINT), CAST(n2.c AS BIGINT)
      FROM n1 CROSS JOIN n2
    )
    ORDER BY stage_ord
    """


@_register("corpus_dedup_cascade_report", oracle=_cascade_oracle())
def corpus_dedup_cascade_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup CASCADE as actually deployed — exact dedup first (cheap,
    removes byte-identical mirrors), MinHash-LSH near-dup second (expensive,
    runs only on exact survivors) — with each stage's MARGINAL removal.
    corpus_dedup_impact_report prices ONE policy's total cost per source;
    this table says how much each successive stage buys, which is what
    decides whether the expensive stage earns its compute at all (if exact
    already removed 30% and near-dup adds 0.4%, reorder the pipeline
    budget). Stage-2 keeps the minimum surviving doc_id per near-dup
    cluster, so its keep-set is exactly what rerunning the ladder on the
    stage-1 output would keep.

    Shape: the exact stage is one (fp60 -> min doc_id) map-side-combined
    rollup; stage 2 left-joins the subgraph-scale cluster table and rolls
    up per cluster; the three stage counts are one-row aggregates crossed
    into a TWO-row presentation (allowlisted scalar class). Counts are
    exact integers; one double division per row.
    """
    d = load_table(spark, sf_dir, "documents")
    normalized = F.lower(F.regexp_replace(F.trim(F.col("text")), "\\s+", " "))
    fp = d.select("doc_id", hash60(normalized).alias("f"))
    s1 = fp.groupBy("f").agg(F.min("doc_id").alias("doc_id")).select("doc_id")
    members = dedup_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    m = s1.join(members, "doc_id", "left").select(
        "doc_id", F.coalesce("cluster_id", "doc_id").alias("cl")
    )
    s2 = m.groupBy("cl").agg(F.min("doc_id").alias("doc_id")).select("doc_id")
    n0 = d.agg(F.count("*").alias("c0"))
    n1 = s1.agg(F.count("*").alias("c1"))
    n2 = s2.agg(F.count("*").alias("c2"))
    stages = (
        n0.crossJoin(n1)
        .crossJoin(n2)
        .select(
            F.explode(
                F.expr(
                    "array(named_struct('stage_ord', 1L, 'stage', 'exact',"
                    " 'docs_in', CAST(c0 AS BIGINT), 'docs_out', CAST(c1 AS BIGINT)),"
                    " named_struct('stage_ord', 2L, 'stage', 'minhash_lsh',"
                    " 'docs_in', CAST(c1 AS BIGINT), 'docs_out', CAST(c2 AS BIGINT)))"
                )
            ).alias("s")
        )
        .select("s.stage_ord", "s.stage", "s.docs_in", "s.docs_out")
    )
    return stages.select(
        "stage_ord",
        "stage",
        "docs_in",
        "docs_out",
        (F.col("docs_in") - F.col("docs_out")).alias("removed"),
        F.round(
            (F.col("docs_in") - F.col("docs_out")).cast("double") / F.col("docs_in"),
            6,
        ).alias("removal_rate"),
    ).orderBy("stage_ord")


# --- intra-corpus exact-substring dedup (round 9) ---------------------------

SUBSTR_NGRAM = 8  # window width (tokens) — the exact-substring unit
SUBSTR_MIN_SPAN = 8  # emit spans covering at least this many tokens


def _exact_substring_oracle(docs_where: str = "") -> str:
    """``docs_where``: optional corpus predicate (the deleted-row oracle
    restricts to the surviving base; shared-window counts and spans then
    derive from the reduced corpus exactly as the pruned index must)."""
    gram = hash60_sql(
        "array_to_string(toks[i:i+{m}], ' ')".format(m=SUBSTR_NGRAM - 1)
    )
    return f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents {docs_where}),
    idx AS (SELECT doc_id, toks,
                   unnest(generate_series(1, len(toks) - {SUBSTR_NGRAM - 1})) AS i
            FROM t WHERE len(toks) >= {SUBSTR_NGRAM}),
    g AS (SELECT doc_id, i, {gram} AS h FROM idx),
    shared AS (SELECT h, COUNT(DISTINCT doc_id) AS n_docs
               FROM g GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
    hits AS (SELECT g.doc_id, g.i, s.n_docs FROM g JOIN shared s ON s.h = g.h),
    runs AS (SELECT doc_id, i, n_docs,
                    i - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS isl
             FROM hits),
    spans AS (SELECT doc_id,
                     CAST(MIN(i) AS BIGINT) AS span_start,
                     CAST(MAX(i) - MIN(i) + {SUBSTR_NGRAM} AS BIGINT) AS span_len,
                     CAST(COUNT(*) AS BIGINT) AS n_windows,
                     CAST(MIN(n_docs) - 1 AS BIGINT) AS n_other_docs
              FROM runs GROUP BY doc_id, isl)
    SELECT doc_id, span_start, span_len, n_windows, n_other_docs
    FROM spans WHERE span_len >= {SUBSTR_MIN_SPAN}
    ORDER BY doc_id, span_start
    """


@_register("corpus_exact_substring_dedup", oracle=_exact_substring_oracle())
def corpus_exact_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-corpus exact-substring dedup manifest (Lee et al.,
    arXiv:2107.06499 "Deduplicating Training Data Makes Language Models
    Better"): for every document, the MAXIMAL token spans whose
    {SUBSTR_NGRAM}-token windows ALL recur verbatim in at least one OTHER
    document — the span-removal manifest the Lee et al. suffix-array stage
    emits, here corpus-vs-itself (corpus_span_decontaminate is the same
    arithmetic train-vs-heldout; this closes the ladder's one missing
    canonical stage). Emits (doc_id, span_start, span_len, n_windows,
    n_other_docs): span_start/span_len delimit the cuttable range in
    token coordinates, n_other_docs = the minimum cross-document sharing
    over the span's windows (every window in the span appears verbatim in
    >= that many other docs — the conservative bound a removal policy
    wants before surgically cutting).

    Suffix arrays don't distribute; the hashed-window equivalent does:
    a window is a repeated >= {SUBSTR_NGRAM}-token substring iff its hash
    lands in >= 2 distinct docs, and maximal repeated spans are exactly
    the maximal runs of consecutive shared positions (gaps-and-islands:
    i - row_number). Detection is hash-exact up to 60-bit collisions,
    the ladder-wide fingerprint discipline.

    Scale shape: texts drop to (doc_id, position, window-hash) ints at
    the scan — exchanges carry hashes, never text. One map-side-combined
    groupBy on the hash builds the shared-window table (duplicated-window
    cardinality, NOT corpus cardinality — hash-distributed, no driver
    materialization, no broadcast: it is SF-scaled); one hash-keyed join
    marks hit positions; the island window + span rollup ride doc_id at
    hit cardinality, the smallest set in the pipeline. Pass accounting:
    inline, the gram stream's two consumers (DF rollup, hit join) each
    re-run the tokenize scan; at 100 TB persist the (doc_id, i, h) int
    stream once and point the whole family (span manifest, doc fraction,
    source rollup, removal plan) at the parquet — the duplicate-passages
    persisted-fingerprint discipline, amortized over FOUR consumers here. Window width 8 and
    the span threshold are module constants (Lee et al. run k=50 at web
    scale; the synthetic corpus' planted dups share 11-93-token spans).
    """
    d = load_table(spark, sf_dir, "documents")
    toks = lower_ws_tokens("text")
    t = d.select("doc_id", toks.alias("toks")).filter(
        F.size("toks") >= SUBSTR_NGRAM
    )
    grams = F.expr(
        f"transform(sequence(1, size(toks) - {SUBSTR_NGRAM - 1}),"
        f" i -> array_join(slice(toks, i, {SUBSTR_NGRAM}), ' '))"
    )
    g = t.select("doc_id", F.posexplode(grams).alias("pos", "gram")).select(
        "doc_id",
        (F.col("pos") + 1).cast("bigint").alias("i"),
        hash60(F.col("gram")).alias("h"),
    )
    shared = (
        g.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
    )
    hits = g.join(shared, "h").select("doc_id", "i", "n_docs")
    w = Window.partitionBy("doc_id").orderBy("i")
    runs = hits.withColumn("isl", F.col("i") - F.row_number().over(w))
    return (
        runs.groupBy("doc_id", "isl")
        .agg(
            F.min("i").cast("bigint").alias("span_start"),
            (F.max("i") - F.min("i") + SUBSTR_NGRAM).cast("bigint").alias("span_len"),
            F.count("*").cast("bigint").alias("n_windows"),
            (F.min("n_docs") - 1).cast("bigint").alias("n_other_docs"),
        )
        .filter(F.col("span_len") >= SUBSTR_MIN_SPAN)
        .select("doc_id", "span_start", "span_len", "n_windows", "n_other_docs")
        .orderBy("doc_id", "span_start")
    )


def _doc_dup_fraction_oracle() -> str:
    gram = hash60_sql(
        "array_to_string(toks[i:i+{m}], ' ')".format(m=SUBSTR_NGRAM - 1)
    )
    return f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    idx AS (SELECT doc_id, toks,
                   unnest(generate_series(1, len(toks) - {SUBSTR_NGRAM - 1})) AS i
            FROM t WHERE len(toks) >= {SUBSTR_NGRAM}),
    g AS (SELECT doc_id, i, {gram} AS h FROM idx),
    shared AS (SELECT h FROM g GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
    hits AS (SELECT g.doc_id, g.i FROM g JOIN shared s ON s.h = g.h),
    covp AS (SELECT doc_id, unnest(generate_series(i, i + {SUBSTR_NGRAM - 1})) AS p
             FROM hits),
    cov AS (SELECT doc_id, COUNT(DISTINCT p) AS covered FROM covp GROUP BY doc_id),
    nh AS (SELECT doc_id, COUNT(*) AS n_dup_windows FROM hits GROUP BY doc_id),
    base AS (SELECT doc_id, len(toks) AS n_tokens,
                    len(toks) - {SUBSTR_NGRAM - 1} AS n_windows
             FROM t WHERE len(toks) >= {SUBSTR_NGRAM})
    SELECT b.doc_id,
           CAST(b.n_tokens AS BIGINT) AS n_tokens,
           CAST(b.n_windows AS BIGINT) AS n_windows,
           CAST(COALESCE(nh.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
           ROUND(COALESCE(nh.n_dup_windows, 0) * 1.0 / b.n_windows, 6)
             AS dup_window_frac,
           CAST(COALESCE(cov.covered, 0) AS BIGINT) AS dup_tokens,
           ROUND(COALESCE(cov.covered, 0) * 1.0 / b.n_tokens, 6)
             AS dup_token_frac
    FROM base b
    LEFT JOIN nh ON nh.doc_id = b.doc_id
    LEFT JOIN cov ON cov.doc_id = b.doc_id
    ORDER BY b.doc_id
    """


@_register("corpus_doc_duplication_fraction", oracle=_doc_dup_fraction_oracle())
def corpus_doc_duplication_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplication fraction: what share of each doc's
    {SUBSTR_NGRAM}-token windows (and of its token mass, as the union of
    hit windows) recurs verbatim elsewhere in the corpus — the doc-level
    rollup of corpus_exact_substring_dedup's span manifest and the
    RefinedWeb-style "mostly duplicated document" FILTER signal: the span
    manifest says what to cut, this says which docs to drop outright
    (dup_token_frac near 1 = a mirror/boilerplate page; near 0 = original
    prose). Every >= {SUBSTR_NGRAM}-token doc appears, zero-dup docs
    included — the distribution IS the report.

    Scale shape: the same one-wide-shuffle gram pipeline as the span
    manifest (hashes shuffle, text never does); the shared-hash table here
    drops n_docs (left-semi join); coverage re-explodes HIT windows only
    (hit cardinality, not corpus cardinality) and both rollups ride
    doc_id. The base-table left joins are doc-keyed at doc cardinality.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = lower_ws_tokens("text")
    t = d.select("doc_id", toks.alias("toks")).filter(
        F.size("toks") >= SUBSTR_NGRAM
    )
    grams = F.expr(
        f"transform(sequence(1, size(toks) - {SUBSTR_NGRAM - 1}),"
        f" i -> array_join(slice(toks, i, {SUBSTR_NGRAM}), ' '))"
    )
    g = t.select("doc_id", F.posexplode(grams).alias("pos", "gram")).select(
        "doc_id",
        (F.col("pos") + 1).cast("bigint").alias("i"),
        hash60(F.col("gram")).alias("h"),
    )
    shared = (
        g.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .select("h")
    )
    hits = g.join(shared, "h", "left_semi").select("doc_id", "i")
    # ONE aggregation serves both hit statistics: over the exploded
    # coverage frame, countDistinct(i) IS the hit-window count ((doc, i)
    # is unique in hits) and countDistinct(p) is the token coverage —
    # fusing them removes a second consumer of `hits`, whose re-executed
    # lineage was a whole extra corpus scan (measured: 4 scans -> 3).
    stats = (
        hits.select(
            "doc_id",
            "i",
            F.explode(
                F.sequence(F.col("i"), F.col("i") + F.lit(SUBSTR_NGRAM - 1))
            ).alias("p"),
        )
        .groupBy("doc_id")
        .agg(
            F.countDistinct("i").alias("n_dup_windows"),
            F.countDistinct("p").alias("dup_tokens"),
        )
    )
    base = t.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_tokens"),
        (F.size("toks") - (SUBSTR_NGRAM - 1)).cast("bigint").alias("n_windows"),
    )
    return (
        base.join(stats, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "n_windows",
            F.coalesce("n_dup_windows", F.lit(0)).cast("bigint").alias("n_dup_windows"),
            F.round(
                F.coalesce("n_dup_windows", F.lit(0)) * F.lit(1.0) / F.col("n_windows"),
                6,
            ).alias("dup_window_frac"),
            F.coalesce("dup_tokens", F.lit(0)).cast("bigint").alias("dup_tokens"),
            F.round(
                F.coalesce("dup_tokens", F.lit(0)) * F.lit(1.0) / F.col("n_tokens"), 6
            ).alias("dup_token_frac"),
        )
        .orderBy("doc_id")
    )


SELF_NGRAM = 3  # intra-doc repeat unit: loops repeat SHORT phrases, and the
# within-doc chance-collision base rate is doc-length-bounded, so a narrow
# window is the right detector here (the CROSS-doc manifest needs
# SUBSTR_NGRAM=8 because its collision base is the whole corpus).


def _self_repetition_oracle() -> str:
    gram = hash60_sql(
        "array_to_string(toks[i:i+{m}], ' ')".format(m=SELF_NGRAM - 1)
    )
    return f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    idx AS (SELECT doc_id, toks,
                   unnest(generate_series(1, len(toks) - {SELF_NGRAM - 1})) AS i
            FROM t WHERE len(toks) >= {SELF_NGRAM}),
    g AS (SELECT doc_id, i, {gram} AS h FROM idx),
    rep AS (SELECT doc_id, h, COUNT(*) AS cnt
            FROM g GROUP BY doc_id, h HAVING COUNT(*) >= 2),
    hits AS (SELECT g.doc_id, g.i, r.cnt
             FROM g JOIN rep r ON r.doc_id = g.doc_id AND r.h = g.h),
    runs AS (SELECT doc_id, i, cnt,
                    i - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS isl
             FROM hits),
    spans AS (SELECT doc_id,
                     CAST(MIN(i) AS BIGINT) AS span_start,
                     CAST(MAX(i) - MIN(i) + {SELF_NGRAM} AS BIGINT) AS span_len,
                     CAST(COUNT(*) AS BIGINT) AS n_windows,
                     CAST(MIN(cnt) AS BIGINT) AS min_repeats
              FROM runs GROUP BY doc_id, isl)
    SELECT doc_id, span_start, span_len, n_windows, min_repeats
    FROM spans ORDER BY doc_id, span_start
    """


@_register("doc_self_repetition_spans", oracle=_self_repetition_oracle())
def doc_self_repetition_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repeated-span manifest: maximal token spans whose
    {SELF_NGRAM}-token windows each occur >= 2 times WITHIN THE SAME
    document — the looping-generation / copy-pasted-boilerplate artifact
    detector at span granularity. text_repetition_stats (Gopher fractions)
    scores HOW repetitive a doc is; this says WHERE, in the same
    (doc_id, span_start, span_len) coordinates as the cross-doc manifest,
    so one removal policy consumes both. A repeated passage marks ALL its
    occurrences (each is a run of within-doc-repeated windows), and
    min_repeats bounds the occurrence count every window in the span
    reaches.

    Scale shape: strictly cheaper than the cross-doc manifest — the
    repeat table groups on (doc_id, hash) so the ONE shuffle is doc-local
    (a doc's windows land together; no cross-doc key exists anywhere),
    and the hit join, island window, and span rollup all ride doc_id.
    At 100 TB this is the operator to run FIRST: it needs no global
    shared-hash table at all.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = lower_ws_tokens("text")
    t = d.select("doc_id", toks.alias("toks")).filter(
        F.size("toks") >= SELF_NGRAM
    )
    grams = F.expr(
        f"transform(sequence(1, size(toks) - {SELF_NGRAM - 1}),"
        f" i -> array_join(slice(toks, i, {SELF_NGRAM}), ' '))"
    )
    g = t.select("doc_id", F.posexplode(grams).alias("pos", "gram")).select(
        "doc_id",
        (F.col("pos") + 1).cast("bigint").alias("i"),
        hash60(F.col("gram")).alias("h"),
    )
    rep = (
        g.groupBy("doc_id", "h")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 2)
    )
    hits = g.join(rep, ["doc_id", "h"]).select("doc_id", "i", "cnt")
    w = Window.partitionBy("doc_id").orderBy("i")
    runs = hits.withColumn("isl", F.col("i") - F.row_number().over(w))
    return (
        runs.groupBy("doc_id", "isl")
        .agg(
            F.min("i").cast("bigint").alias("span_start"),
            (F.max("i") - F.min("i") + SELF_NGRAM).cast("bigint").alias("span_len"),
            F.count("*").cast("bigint").alias("n_windows"),
            F.min("cnt").cast("bigint").alias("min_repeats"),
        )
        .select("doc_id", "span_start", "span_len", "n_windows", "min_repeats")
        .orderBy("doc_id", "span_start")
    )


def _dup_by_source_oracle() -> str:
    gram = hash60_sql(
        "array_to_string(toks[i:i+{m}], ' ')".format(m=SUBSTR_NGRAM - 1)
    )
    return f"""
    WITH t AS (SELECT doc_id, source, {_TOKS_SQL} AS toks FROM documents),
    idx AS (SELECT doc_id, toks,
                   unnest(generate_series(1, len(toks) - {SUBSTR_NGRAM - 1})) AS i
            FROM t WHERE len(toks) >= {SUBSTR_NGRAM}),
    g AS (SELECT doc_id, i, {gram} AS h FROM idx),
    shared AS (SELECT h FROM g GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
    hits AS (SELECT g.doc_id, g.i FROM g JOIN shared s ON s.h = g.h),
    covp AS (SELECT doc_id, unnest(generate_series(i, i + {SUBSTR_NGRAM - 1})) AS p
             FROM hits),
    cov AS (SELECT doc_id, COUNT(DISTINCT p) AS covered FROM covp GROUP BY doc_id),
    base AS (SELECT doc_id, source, len(toks) AS n_tokens
             FROM t WHERE len(toks) >= {SUBSTR_NGRAM}),
    per AS (SELECT b.source, b.n_tokens, COALESCE(c.covered, 0) AS dup_tokens
            FROM base b LEFT JOIN cov c ON c.doc_id = b.doc_id)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN dup_tokens > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_with_dup,
           CAST(SUM(CASE WHEN 2 * dup_tokens >= n_tokens THEN 1 ELSE 0 END)
                AS BIGINT) AS docs_mostly_dup,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(dup_tokens) AS BIGINT) AS dup_tokens,
           ROUND(SUM(dup_tokens) * 1.0 / SUM(n_tokens), 6) AS dup_token_rate
    FROM per GROUP BY source ORDER BY source
    """


@_register("corpus_duplication_by_source", oracle=_dup_by_source_oracle())
def corpus_duplication_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which SOURCE is the mirror: the per-source rollup of verbatim
    duplication — docs touched, docs mostly-duplicated (>= half their
    token mass recurring elsewhere, the integer form 2*dup >= n so the
    threshold has no float edge), and the source's duplicated-token rate.
    The routing table for dedup policy: a crawl source with an outlier
    rate gets the aggressive span-cut treatment, an original-content
    source skips it — the exact-substring twin of
    corpus_dedup_impact_by_source (that one accounts the NEAR-dup ladder,
    this the verbatim-window layer).

    Scale shape: corpus_doc_duplication_fraction's pipeline (one gram
    shuffle on hashes, left-semi shared join, hit-bounded coverage)
    collapsed one level further, to a |sources|-bounded map-side rollup.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = lower_ws_tokens("text")
    t = d.select("doc_id", "source", toks.alias("toks")).filter(
        F.size("toks") >= SUBSTR_NGRAM
    )
    grams = F.expr(
        f"transform(sequence(1, size(toks) - {SUBSTR_NGRAM - 1}),"
        f" i -> array_join(slice(toks, i, {SUBSTR_NGRAM}), ' '))"
    )
    g = t.select("doc_id", F.posexplode(grams).alias("pos", "gram")).select(
        "doc_id",
        (F.col("pos") + 1).cast("bigint").alias("i"),
        hash60(F.col("gram")).alias("h"),
    )
    shared = (
        g.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .select("h")
    )
    hits = g.join(shared, "h", "left_semi").select("doc_id", "i")
    cov = (
        hits.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("i"), F.col("i") + F.lit(SUBSTR_NGRAM - 1))
            ).alias("p"),
        )
        .groupBy("doc_id")
        .agg(F.countDistinct("p").alias("covered"))
    )
    base = t.select("doc_id", "source", F.size("toks").alias("n_tokens"))
    per = base.join(cov, "doc_id", "left").select(
        "source",
        "n_tokens",
        F.coalesce("covered", F.lit(0)).alias("dup_tokens"),
    )
    return (
        per.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("dup_tokens") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("docs_with_dup"),
            F.sum(
                F.when(2 * F.col("dup_tokens") >= F.col("n_tokens"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("docs_mostly_dup"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.sum("dup_tokens").cast("bigint").alias("dup_tokens"),
            F.round(
                F.sum("dup_tokens") * F.lit(1.0) / F.sum("n_tokens"), 6
            ).alias("dup_token_rate"),
        )
        .orderBy("source")
    )


def _span_removal_oracle() -> str:
    gram = hash60_sql(
        "array_to_string(toks[i:i+{m}], ' ')".format(m=SUBSTR_NGRAM - 1)
    )
    return f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    idx AS (SELECT doc_id, toks,
                   unnest(generate_series(1, len(toks) - {SUBSTR_NGRAM - 1})) AS i
            FROM t WHERE len(toks) >= {SUBSTR_NGRAM}),
    g AS (SELECT doc_id, i, {gram} AS h FROM idx),
    shared AS (SELECT h, MIN(doc_id) AS c_doc
               FROM g GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
    hits AS (SELECT g.doc_id, g.i, g.doc_id = s.c_doc AS keep
             FROM g JOIN shared s ON s.h = g.h),
    covp AS (SELECT doc_id, keep,
                    unnest(generate_series(i, i + {SUBSTR_NGRAM - 1})) AS p
             FROM hits),
    cov AS (SELECT doc_id,
                   COUNT(DISTINCT CASE WHEN NOT keep THEN p END) AS removable,
                   COUNT(DISTINCT CASE WHEN keep THEN p END) AS kept
            FROM covp GROUP BY doc_id),
    nt AS (SELECT doc_id, len(toks) AS n_tokens FROM t)
    SELECT c.doc_id,
           CAST(n.n_tokens AS BIGINT) AS n_tokens,
           CAST(c.removable AS BIGINT) AS removable_tokens,
           CAST(c.kept AS BIGINT) AS kept_dup_tokens,
           CAST(n.n_tokens - c.removable AS BIGINT) AS remaining_tokens
    FROM cov c JOIN nt n ON n.doc_id = c.doc_id
    ORDER BY c.doc_id
    """


@_register("corpus_span_removal_plan", oracle=_span_removal_oracle())
def corpus_span_removal_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY the exact-substring manifest under the Lee et al. keep-one-
    copy policy: every shared {SUBSTR_NGRAM}-token window elects the
    MINIMUM doc_id holding it as its canonical home; hit windows in that
    doc are KEPT (some copy must survive — deduplication, not deletion),
    hit windows everywhere else are REMOVABLE. Per touched doc:
    removable token mass (union of removable windows), kept duplicate
    mass, and the post-cut size — the byte-accounting a span-removal run
    reports before committing, and the bridge from
    corpus_exact_substring_dedup (WHERE the spans are) to an actual
    smaller corpus. Min-id canon is the ladder-wide survivor rule, so
    span-level and doc-level dedup elect consistent keepers.

    Scale shape: the manifest pipeline plus ONE extra column — the
    per-hash canonical doc rides the same map-side-combined groupBy that
    already counts distinct docs, and keep/remove resolves in the hit
    join. Coverage unions stay hit-bounded; nothing new shuffles.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = lower_ws_tokens("text")
    t = d.select("doc_id", toks.alias("toks")).filter(
        F.size("toks") >= SUBSTR_NGRAM
    )
    grams = F.expr(
        f"transform(sequence(1, size(toks) - {SUBSTR_NGRAM - 1}),"
        f" i -> array_join(slice(toks, i, {SUBSTR_NGRAM}), ' '))"
    )
    g = t.select("doc_id", F.posexplode(grams).alias("pos", "gram")).select(
        "doc_id",
        (F.col("pos") + 1).cast("bigint").alias("i"),
        hash60(F.col("gram")).alias("h"),
    )
    shared = (
        g.groupBy("h")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("c_doc"),
        )
        .filter(F.col("n_docs") >= 2)
        .select("h", "c_doc")
    )
    hits = g.join(shared, "h").select(
        "doc_id", "i", (F.col("doc_id") == F.col("c_doc")).alias("keep")
    )
    cov = (
        hits.select(
            "doc_id",
            "keep",
            F.explode(
                F.sequence(F.col("i"), F.col("i") + F.lit(SUBSTR_NGRAM - 1))
            ).alias("p"),
        )
        .groupBy("doc_id")
        .agg(
            F.countDistinct(F.when(~F.col("keep"), F.col("p"))).alias("removable"),
            F.countDistinct(F.when(F.col("keep"), F.col("p"))).alias("kept"),
        )
    )
    nt = t.select("doc_id", F.size("toks").cast("bigint").alias("n_tokens"))
    return (
        cov.join(nt, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            F.col("removable").cast("bigint").alias("removable_tokens"),
            F.col("kept").cast("bigint").alias("kept_dup_tokens"),
            (F.col("n_tokens") - F.col("removable"))
            .cast("bigint")
            .alias("remaining_tokens"),
        )
        .orderBy("doc_id")
    )


FP_INDEX_BUCKETS = 64  # fingerprint-hash partition fan-out (substring/winnow)


def _substring_windows(d: DataFrame) -> DataFrame:
    """(doc_id, i, h) window-fingerprint rows for any documents frame —
    the per-document pure function shared by the index build and the
    append path, so an appended batch's windows can never drift from a
    rebuild's."""
    toks = lower_ws_tokens("text")
    t = d.select("doc_id", toks.alias("toks")).filter(
        F.size("toks") >= SUBSTR_NGRAM
    )
    grams = F.expr(
        f"transform(sequence(1, size(toks) - {SUBSTR_NGRAM - 1}),"
        f" i -> array_join(slice(toks, i, {SUBSTR_NGRAM}), ' '))"
    )
    return t.select("doc_id", F.posexplode(grams).alias("pos", "gram")).select(
        "doc_id",
        (F.col("pos") + 1).cast("bigint").alias("i"),
        hash60(F.col("gram")).alias("h"),
    )


def substring_index_build(
    spark: SparkSession,
    sf_dir: str,
    index_dir: str,
    docs: DataFrame | None = None,
) -> None:
    """Materialize the window-fingerprint stream: one (doc_id, i, h) row
    per {SUBSTR_NGRAM}-token window, the shared input of the whole
    exact-substring family (span manifest, doc fraction, source rollup,
    removal plan). Build pays the tokenize scan ONCE; every consumer then
    reads back three ints per window — the write-once/probe-many
    amortization of the LSH/IVF/BM25 index tier, at ~{SUBSTR_NGRAM}x
    compression of the token volume it replaces. Written Hive-partitioned
    by a {FP_INDEX_BUCKETS}-way hash bucket of the fingerprint (the BM25
    layout): all rows of one h share a directory, which is what makes the
    O(batch + touched buckets) append path (substring_index_append)
    possible — and a screen that knows its batch's buckets prunes the
    standing read the same way.

    ``docs``: optional documents frame to index instead of the sf_dir
    table — the base-corpus side of the append equality gate.
    """
    from ..functions.indexing import (
        clear_index_complete,
        discard_stale_stages,
        mark_index_complete,
    )

    clear_index_complete(spark, index_dir)
    # stale-stage discipline at build start — see lsh_build_index
    discard_stale_stages(spark, index_dir)
    d = docs if docs is not None else load_table(spark, sf_dir, "documents")
    g = _substring_windows(d).withColumn(
        "bucket", F.pmod(F.col("h"), F.lit(FP_INDEX_BUCKETS))
    )
    g.write.mode("overwrite").partitionBy("bucket").parquet(index_dir)
    # The fingerprint column IS hash60(window): pin the build's hash family
    # (the BM25/LSH index discipline) so a probe under the other family —
    # computing different window hashes — fails loudly instead of matching
    # nothing and silently routing every arriving document 'new'.
    from ..functions.hashing import write_hash_mode_meta

    write_hash_mode_meta(spark, index_dir)
    mark_index_complete(spark, index_dir)


def substring_index_append(
    spark: SparkSession, index_dir: str, batch_docs: DataFrame, resume: bool = False
) -> None:
    """Append a batch of (doc_id, text) documents to the PERSISTED
    window-fingerprint stream WITHOUT rebuilding it: the batch pays its
    own tokenize → window → hash pass (a per-document pure function, so
    appended rows equal a rebuild's), then only the fingerprint buckets
    the batch hashes into are rewritten as existing-minus-batch-doc_ids
    plus the batch's windows — the ivfpq/lsh/bm25 append discipline
    (anti-join idempotence, convergent torn-append recovery via
    ``resume=True``, dynamic partition overwrite).  Closes the last
    write-side gap of the substring family: after a day of ingest the
    span manifest / removal plan re-serve from the appended index, no
    corpus re-tokenize.  Contract: doc_ids are content-immutable.
    """
    from ..functions.hashing import assert_hash_mode_meta
    from ..functions.indexing import (
        assert_index_complete,
        clear_index_complete,
        mark_index_complete,
    )

    if not resume:
        assert_index_complete(spark, index_dir)
    assert_hash_mode_meta(spark, index_dir)
    clear_index_complete(spark, index_dir)
    new = _substring_windows(batch_docs).withColumn(
        "bucket", F.pmod(F.col("h"), F.lit(FP_INDEX_BUCKETS))
    )
    buckets_hit = sorted(
        {r.bucket for r in new.select("bucket").distinct().collect()}
    )
    if not buckets_hit:  # window-free batch: artifact already correct
        mark_index_complete(spark, index_dir)
        return
    existing = (
        spark.read.parquet(index_dir)
        .filter(F.col("bucket").isin(buckets_hit))
        .select(*new.columns)
    )
    merged = (
        existing.join(new.select("doc_id").distinct(), "doc_id", "left_anti")
        .unionByName(new)
        .localCheckpoint(eager=True)  # bounded: touched buckets + batch
    )
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(index_dir)
    )
    mark_index_complete(spark, index_dir)


def exact_substring_dedup_indexed(
    spark: SparkSession, index_dir: str
) -> DataFrame:
    """corpus_exact_substring_dedup served from the PERSISTED fingerprint
    stream: identical span manifest (result-equal gated by test), zero
    text reads — both gram consumers scan the int parquet. The inline
    query's 100 TB upgrade path, executable.
    """
    from ..functions.hashing import assert_hash_mode_meta
    from ..functions.indexing import assert_index_complete

    assert_index_complete(spark, index_dir)
    assert_hash_mode_meta(spark, index_dir)
    g = spark.read.parquet(index_dir)
    shared = (
        g.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
    )
    hits = g.join(shared, "h").select("doc_id", "i", "n_docs")
    w = Window.partitionBy("doc_id").orderBy("i")
    runs = hits.withColumn("isl", F.col("i") - F.row_number().over(w))
    return (
        runs.groupBy("doc_id", "isl")
        .agg(
            F.min("i").cast("bigint").alias("span_start"),
            (F.max("i") - F.min("i") + SUBSTR_NGRAM).cast("bigint").alias("span_len"),
            F.count("*").cast("bigint").alias("n_windows"),
            (F.min("n_docs") - 1).cast("bigint").alias("n_other_docs"),
        )
        .filter(F.col("span_len") >= SUBSTR_MIN_SPAN)
        .select("doc_id", "span_start", "span_len", "n_windows", "n_other_docs")
        .orderBy("doc_id", "span_start")
    )


def span_removal_plan_indexed(spark: SparkSession, index_dir: str) -> DataFrame:
    """corpus_span_removal_plan served from the PERSISTED fingerprint
    stream (result-equal gated by test), with ZERO text reads — including
    the per-doc token count, which the index already encodes: windows run
    i = 1 .. n_tokens - {SUBSTR_NGRAM} + 1, so n_tokens = max(i) +
    {SUBSTR_NGRAM} - 1 exactly, and only docs with >= 1 window can appear
    in the plan (the inline query's own inner join drops the rest).
    Completes the ``jobs substring-dedup`` pipeline's one-tokenize
    promise: after the index build, manifest AND removal plan both read
    three ints per window.
    """
    from ..functions.hashing import assert_hash_mode_meta
    from ..functions.indexing import assert_index_complete

    assert_index_complete(spark, index_dir)
    assert_hash_mode_meta(spark, index_dir)
    g = spark.read.parquet(index_dir)
    shared = (
        g.groupBy("h")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("c_doc"),
        )
        .filter(F.col("n_docs") >= 2)
        .select("h", "c_doc")
    )
    hits = g.join(shared, "h").select(
        "doc_id", "i", (F.col("doc_id") == F.col("c_doc")).alias("keep")
    )
    cov = (
        hits.select(
            "doc_id",
            "keep",
            F.explode(
                F.sequence(F.col("i"), F.col("i") + F.lit(SUBSTR_NGRAM - 1))
            ).alias("p"),
        )
        .groupBy("doc_id")
        .agg(
            F.countDistinct(F.when(~F.col("keep"), F.col("p"))).alias("removable"),
            F.countDistinct(F.when(F.col("keep"), F.col("p"))).alias("kept"),
        )
    )
    nt = g.groupBy("doc_id").agg(
        (F.max("i") + F.lit(SUBSTR_NGRAM - 1)).cast("bigint").alias("n_tokens")
    )
    return (
        cov.join(nt, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            F.col("removable").cast("bigint").alias("removable_tokens"),
            F.col("kept").cast("bigint").alias("kept_dup_tokens"),
            (F.col("n_tokens") - F.col("removable"))
            .cast("bigint")
            .alias("remaining_tokens"),
        )
        .orderBy("doc_id")
    )


# --- winnowing fingerprint selection (round 9) ------------------------------

WINNOW_K = 4  # k-gram width (tokens)
WINNOW_W = 4  # winnow window (hashes)
WINNOW_MIN_SHARED = 2  # report pairs sharing at least this many fingerprints
# Skew guard on the fingerprint self-join: a fingerprint selected in more
# than this many documents (a boilerplate header sampled as a local min
# corpus-wide) is a stop-shingle, not a duplication signal — joining it
# would cost df^2 pairs per hot key. Applied identically in both engines,
# so the oracle comparison stays lossless at any corpus.
WINNOW_DF_CAP = 128


def _winnow_fp_ctes(docs_where: str = "") -> str:
    """The winnowed-fingerprint CTE chain (t -> idx -> g -> sel -> fp0 ->
    fp), shared by the pair oracle and the recall-report oracle so the
    selection + DF-cap semantics cannot drift between them.
    ``docs_where``: optional corpus predicate (the deleted-row oracle
    restricts to the surviving base; the DF cap then derives from the
    reduced corpus exactly as the repaired index must)."""
    gram = hash60_sql(
        "array_to_string(toks[i:i+{m}], ' ')".format(m=WINNOW_K - 1)
    )
    return f"""t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents {docs_where}),
    idx AS (SELECT doc_id, toks,
                   unnest(generate_series(1, len(toks) - {WINNOW_K - 1})) AS i
            FROM t WHERE len(toks) >= {WINNOW_K}),
    g AS (SELECT doc_id, i, {gram} AS h FROM idx),
    sel AS (
      SELECT doc_id, i, h,
             MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                          ROWS BETWEEN {WINNOW_W - 1} PRECEDING
                                   AND {WINNOW_W - 1} FOLLOWING) AS wmin
      FROM g
    ),
    fp0 AS (SELECT DISTINCT doc_id, h FROM sel WHERE h = wmin),
    fdf AS (SELECT h FROM fp0 GROUP BY h HAVING COUNT(*) <= {WINNOW_DF_CAP}),
    fp AS (SELECT fp0.doc_id, fp0.h FROM fp0 JOIN fdf USING (h))"""


def _winnowing_oracle(docs_where: str = "") -> str:
    return f"""
    WITH {_winnow_fp_ctes(docs_where)}
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS common_fingerprints
    FROM fp a JOIN fp b ON a.h = b.h AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING COUNT(*) >= {WINNOW_MIN_SHARED}
    ORDER BY doc_a, doc_b
    """


def _winnow_fingerprints(d: DataFrame, df_cap: int = WINNOW_DF_CAP) -> DataFrame:
    """The winnowed, DF-capped fingerprint stream (doc_id, h) — the shared
    front of the inline pair query, the persisted index build, and the
    recall report's candidate arm. The cap is a WINDOW over h, not a
    groupBy+join, so the stream stays ONE pass: distinct shuffles
    (doc_id, h), the count-over-h rides the h exchange the self-join
    needs anyway."""
    return (
        _winnow_selected(d)
        .withColumn("df", F.count("*").over(Window.partitionBy("h")))
        .filter(F.col("df") <= df_cap)
        .drop("df")
    )


def _winnow_pairs(fp: DataFrame) -> DataFrame:
    """Inverted-index self-join over a winnowed fingerprint stream — the
    shared tail of the inline query and the persisted-index probe."""
    a = fp.select(F.col("doc_id").alias("doc_a"), "h")
    b = fp.select(F.col("doc_id").alias("doc_b"), "h")
    return (
        a.join(b, "h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("bigint").alias("common_fingerprints"))
        .filter(F.col("common_fingerprints") >= WINNOW_MIN_SHARED)
        .orderBy("doc_a", "doc_b")
    )


@_register("dedup_winnowing", oracle=_winnowing_oracle())
def dedup_winnowing(
    spark: SparkSession, sf_dir: str, df_cap: int = WINNOW_DF_CAP
) -> DataFrame:
    """Winnowing-style fingerprint pair discovery (Schleimer, Wilkerson &
    Aiken, SIGMOD'03 "Winnowing: Local Algorithms for Document
    Fingerprinting" — the MOSS scheme; public method): sample each doc's
    {WINNOW_K}-gram hash stream down to its window-local minima and join
    ONLY the samples — the third fingerprint-selection discipline in the
    family, between CDC boundary sampling (doc_rolling_fingerprint:
    expected-size chunks, no guarantee) and exhaustive shingles
    (dedup_ngram_jaccard: lossless, heaviest). Selection here is the
    symmetric-window local-min variant: position i survives iff h_i
    equals the min over the centered 2W-1 window — chosen over the
    classic per-window-rightmost rule because it needs NO tie-break (all
    positions achieving the min are kept, identically in both engines),
    while keeping the guarantee that any sufficiently long shared run
    (>= 2W-1 consecutive equal-hash positions) contributes at least one
    common selected fingerprint to BOTH documents. Pairs sharing >=
    {WINNOW_MIN_SHARED} fingerprints are candidates for the exact
    verification tiers (Jaccard / span manifest).

    Scale shape: selection is ONE bounded-frame window pass riding the
    per-doc ordering (no cross-doc key until after sampling); the
    inverted-index self-join then runs on the WINNOWED stream — ~2/(W+1)
    of the shingle volume, the whole point of the scheme — behind the
    {WINNOW_DF_CAP}-doc fingerprint-DF cap (the minhash header's skew
    discipline, applied in BOTH engines so the comparison stays
    lossless): a corpus-wide boilerplate fingerprint would otherwise
    cost df^2 pairs on one key. The cap is a count-over-h window, not a
    groupBy+join, so the corpus is still scanned once (gate-pinned).
    Exchanges carry (doc_id, hash) ints only.
    """
    d = load_table(spark, sf_dir, "documents")
    return _winnow_pairs(_winnow_fingerprints(d, df_cap=df_cap))


def _winnow_selected(d: DataFrame) -> DataFrame:
    """The UNCAPPED winnowed fingerprint stream (doc_id, h) — the
    per-document selection (window local-min, distinct) WITHOUT the
    corpus-global DF cap.  The cap is a function of global fingerprint
    frequency, which appends change, so the persisted index stores this
    per-document-pure stream plus a denormalized df column and probes
    apply the cap on read (the BM25 denormalized-df discipline)."""
    toks = lower_ws_tokens("text")
    t = d.select("doc_id", toks.alias("toks")).filter(
        F.size("toks") >= WINNOW_K
    )
    grams = F.expr(
        f"transform(sequence(1, size(toks) - {WINNOW_K - 1}),"
        f" i -> array_join(slice(toks, i, {WINNOW_K}), ' '))"
    )
    g = t.select("doc_id", F.posexplode(grams).alias("pos", "gram")).select(
        "doc_id",
        (F.col("pos") + 1).alias("i"),
        hash60(F.col("gram")).alias("h"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(-(WINNOW_W - 1), WINNOW_W - 1)
    )
    return (
        g.withColumn("wmin", F.min("h").over(w))
        .filter(F.col("h") == F.col("wmin"))
        .select("doc_id", "h")
        .distinct()
    )


def winnow_index_build(
    spark: SparkSession,
    sf_dir: str,
    index_dir: str,
    docs: DataFrame | None = None,
) -> None:
    """Materialize the winnowed fingerprint stream — one (doc_id, h, df)
    row per selected local-min window, ~2/(W+1) of the shingle volume the
    substring index stores — mirroring substring_index_build for the MOSS
    rung of the ladder. Build pays the tokenize + selection pass ONCE;
    the pair probe then self-joins two ints per fingerprint, and an
    arriving batch can screen against the standing stream without
    re-reading corpus text.

    Layout: Hive-partitioned by a {FP_INDEX_BUCKETS}-way hash bucket of
    the fingerprint, with the corpus-global document frequency
    DENORMALIZED per row and the {WINNOW_DF_CAP} skew cap applied by the
    PROBES on read — not baked into the artifact — because the cap is a
    function of global df, which appends move: baking it in would make an
    appended index disagree with a rebuild whenever a batch pushes a
    fingerprint over the cap (rows a build dropped cannot be
    resurrected).  Storing the uncapped stream keeps append == rebuild
    exact (winnow_index_append repairs df per touched bucket, the BM25
    discipline) at ~1 extra int per row.  The _meta sidecar pins the
    hash family (fingerprints ARE hash60 values).

    ``docs``: optional documents frame — the append equality gate's base.
    """
    from ..functions.hashing import write_hash_mode_meta
    from ..functions.indexing import (
        clear_index_complete,
        discard_stale_stages,
        mark_index_complete,
    )

    clear_index_complete(spark, index_dir)
    # stale-stage discipline at build start — see lsh_build_index
    discard_stale_stages(spark, index_dir)
    d = docs if docs is not None else load_table(spark, sf_dir, "documents")
    fp = (
        _winnow_selected(d)
        .withColumn("df", F.count("*").over(Window.partitionBy("h")))
        .withColumn("bucket", F.pmod(F.col("h"), F.lit(FP_INDEX_BUCKETS)))
    )
    fp.write.mode("overwrite").partitionBy("bucket").parquet(index_dir)
    write_hash_mode_meta(spark, index_dir)
    mark_index_complete(spark, index_dir)


def winnow_index_delete(
    spark: SparkSession, index_dir: str, doc_ids: DataFrame, resume: bool = False
) -> int:
    """Delete documents BY ID from the persisted winnowed-fingerprint
    index — the right-to-be-forgotten op for the winnow rung, the
    bm25_delete_index discipline over the (doc_id, i, h, df, bucket)
    stream: removing documents lowers df for every fingerprint they
    carried, and all rows of one h share its bucket, so rewriting the
    touched buckets as (existing minus deleted doc_ids) with df
    recomputed as the count-over-h window restores the globally-correct
    df — including fingerprints a deletion pulls back UNDER the
    probe-side skew cap, exactly as a rebuild would. Touched buckets
    are discovered by a COLUMN-PRUNED (doc_id, bucket) scan, so no hash
    family is consulted. Idempotent, convergent under ``resume=True``,
    O(touched buckets); fully-emptied buckets are removed through the
    Hadoop FileSystem (dynamic overwrite cannot clear a partition it
    writes no rows for). Result-equal to rebuilding without the
    documents (gated).

    Returns the number of fingerprint rows removed.
    """
    from ..functions.indexing import (
        assert_index_complete,
        clear_index_complete,
        mark_index_complete,
    )

    if not resume:
        assert_index_complete(spark, index_dir)
    idset = doc_ids.select("doc_id").distinct().localCheckpoint(eager=True)
    hit = (
        spark.read.parquet(index_dir)
        .select("doc_id", "bucket")
        .join(F.broadcast(idset), "doc_id", "semi")
    )
    touched = sorted({r.bucket for r in hit.select("bucket").distinct().collect()})
    if not touched:  # ids absent: the buckets are already correct
        if resume:
            # Torn-delete tail recovery (the inverted_lists_delete
            # discipline): the crashed run finished its rewrite and
            # emptied-bucket sweep — a surviving stale bucket would have
            # matched above — but died before restoring the marker. The
            # data is whole; re-mark instead of early-returning, or the
            # index stays permanently unprobeable.
            mark_index_complete(spark, index_dir)
        return 0
    clear_index_complete(spark, index_dir)
    existing = spark.read.parquet(index_dir).filter(F.col("bucket").isin(touched))
    cols = existing.columns
    remaining = (
        existing.join(F.broadcast(idset), "doc_id", "left_anti")
        .drop("df")
        .withColumn("df", F.count("*").over(Window.partitionBy("h")))
        .select(*cols)
        .localCheckpoint(eager=True)  # bounded: touched buckets
    )
    removed = existing.count() - remaining.count()
    kept = {r.bucket for r in remaining.select("bucket").distinct().collect()}
    (
        remaining.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(index_dir)
    )
    jvm, jsc = spark._jvm, spark._jsc
    for v in touched:
        if v in kept:
            continue
        p = jvm.org.apache.hadoop.fs.Path(f"{index_dir.rstrip('/')}/bucket={v}")
        fs = p.getFileSystem(jsc.hadoopConfiguration())
        if fs.exists(p):
            fs.delete(p, True)
    mark_index_complete(spark, index_dir)
    return int(removed)


def winnow_index_append(
    spark: SparkSession, index_dir: str, batch_docs: DataFrame, resume: bool = False
) -> None:
    """Append a batch of (doc_id, text) documents to the PERSISTED
    winnowed-fingerprint index WITHOUT rebuilding it: the batch pays its
    own winnow-selection pass (per-document pure), then only the touched
    fingerprint buckets are rewritten — existing minus batch doc_ids plus
    the batch's rows, with df RECOMPUTED as the count-over-h window on
    the merged rows (all rows of one h share its bucket, so the window
    sees the exact global frequency — including batch rows pushing a
    standing fingerprint over the probe-side cap, exactly as a rebuild
    would).  Idempotent, convergent under ``resume=True``, O(batch +
    touched buckets).  Contract: doc_ids are content-immutable."""
    from ..functions.hashing import assert_hash_mode_meta
    from ..functions.indexing import (
        assert_index_complete,
        clear_index_complete,
        mark_index_complete,
    )

    if not resume:
        assert_index_complete(spark, index_dir)
    assert_hash_mode_meta(spark, index_dir)
    clear_index_complete(spark, index_dir)
    new = _winnow_selected(batch_docs).withColumn(
        "bucket", F.pmod(F.col("h"), F.lit(FP_INDEX_BUCKETS))
    )
    buckets_hit = sorted(
        {r.bucket for r in new.select("bucket").distinct().collect()}
    )
    if not buckets_hit:  # fingerprint-free batch: artifact already correct
        mark_index_complete(spark, index_dir)
        return
    existing = (
        spark.read.parquet(index_dir)
        .filter(F.col("bucket").isin(buckets_hit))
        .select("doc_id", "h", "bucket")
    )
    merged = (
        existing.join(new.select("doc_id").distinct(), "doc_id", "left_anti")
        .unionByName(new)
        .withColumn("df", F.count("*").over(Window.partitionBy("h")))
        .select("doc_id", "h", "df", "bucket")
        .localCheckpoint(eager=True)  # bounded: touched buckets + batch
    )
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(index_dir)
    )
    mark_index_complete(spark, index_dir)


def dedup_winnowing_indexed(spark: SparkSession, index_dir: str) -> DataFrame:
    """dedup_winnowing's candidate pairs served from the PERSISTED
    fingerprint stream (result-equal gated by test): zero text reads —
    the probe applies the {WINNOW_DF_CAP} skew cap to the stored df
    column (the cap lives probe-side so appends stay exact — see
    winnow_index_build) and runs the _winnow_pairs self-join over the
    int parquet, the same write-once/probe-many amortization as the
    substring index."""
    from ..functions.hashing import assert_hash_mode_meta
    from ..functions.indexing import assert_index_complete

    assert_index_complete(spark, index_dir)
    assert_hash_mode_meta(spark, index_dir)
    return _winnow_pairs(_winnow_index_capped(spark.read.parquet(index_dir)))


def _winnow_index_capped(index: DataFrame, df_cap: int = WINNOW_DF_CAP) -> DataFrame:
    """Apply the probe-side skew cap to a persisted winnow index read:
    drop fingerprints whose corpus-global df exceeds the cap (the stored
    df column), or pass a pre-cap (doc_id, h) frame through untouched —
    back-compat for frames built by the inline pipeline."""
    if "df" in index.columns:
        index = index.filter(F.col("df") <= df_cap)
    return index.select("doc_id", "h")


@_register("dedup_winnowing_appended", oracle=_winnowing_oracle())
def dedup_winnowing_appended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of the winnowed-fingerprint index verified
    END TO END as a registered query: build on the base 4/5 of the
    corpus, winnow_index_append the rest (repairing the denormalized df
    per touched bucket — including batch rows pushing a standing
    fingerprint over the probe-side skew cap, the case that forced the
    cap OUT of the artifact), probe the appended index — and hold the
    INLINE dedup_winnowing oracle, because append == rebuild == inline
    pairs is the maintenance contract (pytest-gated pairwise; this row
    drives the df-repair arithmetic under every harness dataset)."""
    import shutil
    import tempfile

    d = load_table(spark, sf_dir, "documents")
    mx = d.agg(F.max("doc_id")).collect()[0][0]
    split = max(1, int(((mx or 0) + 1) * 4 // 5))
    tmp = tempfile.mkdtemp(prefix="winnow_appended_")
    try:
        winnow_index_build(
            spark, sf_dir, tmp, docs=d.filter(F.col("doc_id") < split)
        )
        winnow_index_append(spark, tmp, d.filter(F.col("doc_id") >= split))
        return dedup_winnowing_indexed(spark, tmp).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@_register("substring_spans_appended", oracle=_exact_substring_oracle())
def substring_spans_appended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of the window-fingerprint index verified
    END TO END as a registered query: build on the base 4/5 of the
    corpus, substring_index_append the rest, serve the maximal repeated-
    span manifest from the appended index — and hold the INLINE
    corpus_exact_substring_dedup oracle (append == rebuild == inline
    spans, pytest-gated pairwise; this row verifies the composition on
    the driver's datasets)."""
    import shutil
    import tempfile

    d = load_table(spark, sf_dir, "documents")
    mx = d.agg(F.max("doc_id")).collect()[0][0]
    split = max(1, int(((mx or 0) + 1) * 4 // 5))
    tmp = tempfile.mkdtemp(prefix="substring_appended_")
    try:
        substring_index_build(
            spark, sf_dir, tmp, docs=d.filter(F.col("doc_id") < split)
        )
        substring_index_append(spark, tmp, d.filter(F.col("doc_id") >= split))
        return exact_substring_dedup_indexed(spark, tmp).localCheckpoint(
            eager=True
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# the surviving-corpus predicate the deleted rows share: drop the top 1/5
# of doc_ids (GREATEST floor keeps a tiny corpus from going negative);
# the matching Spark split is computed from the same MAX(doc_id)
_DOC_DELETE_WHERE = (
    "WHERE doc_id < GREATEST(1,"
    " (SELECT (MAX(doc_id) + 1) * 4 // 5 FROM documents))"
)


def _doc_delete_split(spark: SparkSession, d: DataFrame) -> int:
    mx = d.agg(F.max("doc_id")).collect()[0][0]
    return max(1, int(((mx or 0) + 1) * 4 // 5))


@_register("dedup_winnowing_deleted", oracle=_winnowing_oracle(_DOC_DELETE_WHERE))
def dedup_winnowing_deleted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DELETE path of the winnow rung verified END TO END as a
    registered query: build the persisted fingerprint index on the FULL
    corpus, winnow_index_delete the top 1/5 of doc_ids (repairing the
    denormalized df on every touched bucket — deletions can pull a
    fingerprint back UNDER the probe-side skew cap, the repair a skipped
    or torn delete corrupts), probe — and hold the inline winnowing
    oracle over the SURVIVING corpus only. delete == rebuild-without ==
    inline-on-survivors is the contract (pairwise pytest-gated; this row
    drives the df repair and the cap re-derivation under every dataset
    the harness generates). Scale shape: build is the one selection
    pass; the delete is O(touched buckets) discovered column-pruned; the
    probe is the capped self-join."""
    import shutil
    import tempfile

    d = load_table(spark, sf_dir, "documents")
    split = _doc_delete_split(spark, d)
    tmp = tempfile.mkdtemp(prefix="winnow_deleted_")
    try:
        winnow_index_build(spark, sf_dir, tmp)
        winnow_index_delete(
            spark, tmp, d.filter(F.col("doc_id") >= split).select("doc_id")
        )
        return dedup_winnowing_indexed(spark, tmp).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@_register(
    "substring_spans_deleted", oracle=_exact_substring_oracle(_DOC_DELETE_WHERE)
)
def substring_spans_deleted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DELETE path of the exact-substring rung verified END TO END as
    a registered query: build the window-fingerprint index on the FULL
    corpus, drop the top 1/5 of doc_ids through the generic per-id
    delete (the stream denormalizes no corpus-global state, so pruning
    rows IS the whole repair — shared-window counts re-derive at probe
    time), serve the span manifest — and hold the inline substring
    oracle over the SURVIVING corpus only (a span shared only with
    deleted docs must disappear, spans shared more widely must shrink
    their n_other_docs; the oracle recomputes both from scratch)."""
    import shutil
    import tempfile

    from .similarity import inverted_lists_delete

    d = load_table(spark, sf_dir, "documents")
    split = _doc_delete_split(spark, d)
    tmp = tempfile.mkdtemp(prefix="substring_deleted_")
    try:
        substring_index_build(spark, sf_dir, tmp)
        inverted_lists_delete(
            spark,
            tmp,
            d.filter(F.col("doc_id") >= split).select("doc_id"),
            id_col="doc_id",
            partition_cols=("bucket",),
        )
        return exact_substring_dedup_indexed(spark, tmp).localCheckpoint(
            eager=True
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@_register("dedup_winnowing_maintained", oracle=_winnowing_oracle())
def dedup_winnowing_maintained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCHEDULED maintenance composition over the WINNOW rung's
    persisted fingerprint index, verified end to end as a registered
    query (the similarity_ann_ivfpq_maintained frame applied to the
    fingerprint tier): build on the base 4/5 of the corpus, append the
    rest (df repaired per touched bucket), fragment the buckets into the
    multi-file-per-leaf layout a production-parallelism append leaves,
    run ``index_maintain`` — the exact report -> compact-iff-fragmented
    -> report composition ``jobs index --maintain`` invokes from cron —
    assert it converged to a whole artifact, probe, and still hold the
    INLINE dedup_winnowing oracle. The appended row already pins the
    df-repair arithmetic; THIS row pins the scheduler's decision logic
    around the artifact (fragmentation detected before, zero fragmented
    leaves and an intact marker after) on every dataset the harness
    generates, so the cron frame is driver-verified beyond the ivfpq
    kind. Scale shape: two metadata-scale reports around an O(fragmented
    buckets) rewrite that now rides the stage/commit/swap protocol."""
    import shutil
    import tempfile

    from ..functions.indexing import index_maintain
    from .similarity import _fragment_index

    d = load_table(spark, sf_dir, "documents")
    mx = d.agg(F.max("doc_id")).collect()[0][0]
    split = max(1, int(((mx or 0) + 1) * 4 // 5))
    tmp = tempfile.mkdtemp(prefix="winnow_maintained_")
    try:
        winnow_index_build(
            spark, sf_dir, tmp, docs=d.filter(F.col("doc_id") < split)
        )
        winnow_index_append(spark, tmp, d.filter(F.col("doc_id") >= split))
        _fragment_index(spark, tmp, partition_col="bucket")
        st = index_maintain(spark, tmp)
        if st["fragmented_before"] == 0 and st["compacted"] is not None:
            raise AssertionError("maintain compacted a stable artifact")
        if st["fragmented_before"] > 0 and (
            st["compacted"] is None
            or st["fragmented_after"] != 0
            or not st["complete"]
        ):
            raise AssertionError(f"maintain did not converge: {st}")
        return dedup_winnowing_indexed(spark, tmp).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@_register("substring_spans_maintained", oracle=_exact_substring_oracle())
def substring_spans_maintained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCHEDULED maintenance composition over the exact-substring
    rung's window-fingerprint index, verified end to end as a registered
    query: build on the base 4/5 of the corpus, append the rest,
    fragment the buckets, run ``index_maintain`` (the cron frame), assert
    convergence, serve the maximal repeated-span manifest — and hold the
    INLINE corpus_exact_substring_dedup oracle. With the winnow twin this
    puts the scheduled-maintenance composition under driver verification
    for every appendable fingerprint kind, not just the vector tier."""
    import shutil
    import tempfile

    from ..functions.indexing import index_maintain
    from .similarity import _fragment_index

    d = load_table(spark, sf_dir, "documents")
    mx = d.agg(F.max("doc_id")).collect()[0][0]
    split = max(1, int(((mx or 0) + 1) * 4 // 5))
    tmp = tempfile.mkdtemp(prefix="substring_maintained_")
    try:
        substring_index_build(
            spark, sf_dir, tmp, docs=d.filter(F.col("doc_id") < split)
        )
        substring_index_append(spark, tmp, d.filter(F.col("doc_id") >= split))
        _fragment_index(spark, tmp, partition_col="bucket")
        st = index_maintain(spark, tmp)
        if st["fragmented_before"] == 0 and st["compacted"] is not None:
            raise AssertionError("maintain compacted a stable artifact")
        if st["fragmented_before"] > 0 and (
            st["compacted"] is None
            or st["fragmented_after"] != 0
            or not st["complete"]
        ):
            raise AssertionError(f"maintain did not converge: {st}")
        return exact_substring_dedup_indexed(spark, tmp).localCheckpoint(
            eager=True
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# Modulus for the order-independent stats checksums: summing raw 60-bit
# hash60 values overflows BIGINT at corpus scale (DuckDB widens to
# HUGEINT, Spark does not), so both engines sum h % this prime instead —
# still sensitive to any changed/dropped/duplicated row, exactly
# representable everywhere.
_STATS_CHECKSUM_MOD = 1_000_003


def _winnow_stats_oracle() -> str:
    return f"""
    WITH {_winnow_fp_ctes()},
    wdf AS (SELECT h, COUNT(*) AS df FROM fp0 GROUP BY h),
    r AS (
      SELECT fp0.doc_id, fp0.h, wdf.df,
             fp0.h % {FP_INDEX_BUCKETS} AS bucket
      FROM fp0 JOIN wdf USING (h)
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_fingerprints,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT h) AS BIGINT) AS n_hashes,
           CAST(SUM(df) AS BIGINT) AS df_checksum,
           CAST(SUM(h % {_STATS_CHECKSUM_MOD}) AS BIGINT) AS h_checksum
    FROM r GROUP BY bucket ORDER BY bucket
    """


@_register("winnow_index_stats", oracle=_winnow_stats_oracle())
def winnow_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bucket stats read FROM THE PERSISTED winnowed-fingerprint
    artifact after a build+append cycle, held against an oracle that
    recomputes every column — selection, bucket layout, AND the
    denormalized corpus-global df — from the raw corpus. The df_checksum
    is the strong part: the append path's one hard job is repairing df
    on every touched bucket's standing rows, and a skipped or
    under-repaired bucket breaks the sum even when counts and layout
    look right. Completes the oracle-backed stats family for the winnow
    rung (bm25/ivf/ivfpq/pq twins exist). Scale shape: one scan of the
    integer fingerprint rows rolled up map-side to
    {FP_INDEX_BUCKETS} rows."""
    import shutil
    import tempfile

    d = load_table(spark, sf_dir, "documents")
    mx = d.agg(F.max("doc_id")).collect()[0][0]
    split = max(1, int(((mx or 0) + 1) * 4 // 5))
    tmp = tempfile.mkdtemp(prefix="winnow_stats_")
    try:
        winnow_index_build(
            spark, sf_dir, tmp, docs=d.filter(F.col("doc_id") < split)
        )
        winnow_index_append(spark, tmp, d.filter(F.col("doc_id") >= split))
        idx = spark.read.parquet(tmp)
        return (
            idx.groupBy(F.col("bucket").cast("bigint").alias("bucket"))
            .agg(
                F.count("*").cast("bigint").alias("n_fingerprints"),
                F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
                F.countDistinct("h").cast("bigint").alias("n_hashes"),
                F.sum("df").cast("bigint").alias("df_checksum"),
                F.sum(F.col("h") % _STATS_CHECKSUM_MOD)
                .cast("bigint")
                .alias("h_checksum"),
            )
            .orderBy("bucket")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _substring_stats_oracle() -> str:
    gram = hash60_sql(
        "array_to_string(toks[i:i+{m}], ' ')".format(m=SUBSTR_NGRAM - 1)
    )
    return f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    idx AS (SELECT doc_id, toks,
                   unnest(generate_series(1, len(toks) - {SUBSTR_NGRAM - 1})) AS i
            FROM t WHERE len(toks) >= {SUBSTR_NGRAM}),
    g AS (SELECT doc_id, i, {gram} AS h FROM idx)
    SELECT CAST(h % {FP_INDEX_BUCKETS} AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT h) AS BIGINT) AS n_hashes,
           CAST(SUM(i) AS BIGINT) AS i_checksum,
           CAST(SUM(h % {_STATS_CHECKSUM_MOD}) AS BIGINT) AS h_checksum
    FROM g GROUP BY bucket ORDER BY bucket
    """


@_register("substring_index_stats", oracle=_substring_stats_oracle())
def substring_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bucket stats read FROM THE PERSISTED window-fingerprint
    artifact after a build+append cycle, against an oracle recomputing
    window positions, hashes, and the bucket layout from the raw corpus.
    The i_checksum pins POSITIONS, not just membership — the span
    manifest's gaps-and-islands arithmetic consumes i directly, so a
    shifted or duplicated window that leaves counts intact still breaks
    the row. Scale shape: one scan of the three-int window rows rolled
    up map-side to {FP_INDEX_BUCKETS} rows."""
    import shutil
    import tempfile

    d = load_table(spark, sf_dir, "documents")
    mx = d.agg(F.max("doc_id")).collect()[0][0]
    split = max(1, int(((mx or 0) + 1) * 4 // 5))
    tmp = tempfile.mkdtemp(prefix="substring_stats_")
    try:
        substring_index_build(
            spark, sf_dir, tmp, docs=d.filter(F.col("doc_id") < split)
        )
        substring_index_append(spark, tmp, d.filter(F.col("doc_id") >= split))
        idx = spark.read.parquet(tmp)
        return (
            idx.groupBy(F.col("bucket").cast("bigint").alias("bucket"))
            .agg(
                F.count("*").cast("bigint").alias("n_windows"),
                F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
                F.countDistinct("h").cast("bigint").alias("n_hashes"),
                F.sum("i").cast("bigint").alias("i_checksum"),
                F.sum(F.col("h") % _STATS_CHECKSUM_MOD)
                .cast("bigint")
                .alias("h_checksum"),
            )
            .orderBy("bucket")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _lsh_stats_oracle() -> str:
    base = hash60_sql("s")
    min_cols = ", ".join(
        f"MIN(({MINHASH_A[i]} * (base % {MINHASH_PRIME}) + {MINHASH_B[i]})"
        f" % {MINHASH_PRIME}) AS m{i}"
        for i in range(MINHASH_K)
    )
    r = MINHASH_K // MINHASH_BANDS
    band_rows = ",\n            ".join(
        "({b}, md5({key}))".format(
            b=b,
            key=" || ',' || ".join(f"m{b * r + j}::VARCHAR" for j in range(r)),
        )
        for b in range(MINHASH_BANDS)
    )
    bkey_h = hash60_sql("bkey")
    return f"""
    WITH std AS (SELECT * FROM documents WHERE source != 'src0'),
    {_SHINGLES_CTE.replace("FROM documents", "FROM std")},
    hb AS (SELECT doc_id, {base} AS base FROM sh),
    mh AS (SELECT doc_id, {min_cols} FROM hb GROUP BY doc_id),
    bands AS (SELECT doc_id, bb.band, bb.bkey
              FROM mh, LATERAL (VALUES
            {band_rows}) AS bb(band, bkey))
    SELECT CAST(band AS BIGINT) AS band,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT bkey) AS BIGINT) AS n_keys,
           CAST(SUM({bkey_h} % {_STATS_CHECKSUM_MOD}) AS BIGINT)
             AS bkey_checksum
    FROM bands GROUP BY band ORDER BY band
    """


@_register("lsh_index_stats", oracle=_lsh_stats_oracle())
def lsh_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-band stats read FROM THE PERSISTED banded-signature artifact
    after a build+append cycle over the standing corpus, against an
    oracle recomputing the full shingle -> minhash -> band pipeline from
    raw text. Aggregation is per BAND, not per (band, bucket): the
    bucket column is xxhash64-derived (no DuckDB twin by design —
    equality-gated against the inline screen instead), but the band keys
    themselves ARE oracle-expressible through the shared hash60 family,
    so the checksum pins the resident md5 band keys row for row. With
    this row every one of the seven persisted index kinds carries an
    oracle-backed stats surface. Scale shape: one scan of the signature
    rows rolled up map-side to {MINHASH_BANDS} rows."""
    import shutil
    import tempfile

    from ..functions.hashing import hash60

    d = load_table(spark, sf_dir, "documents").filter(F.col("source") != "src0")
    mx = d.agg(F.max("doc_id")).collect()[0][0]
    split = max(1, int(((mx or 0) + 1) * 4 // 5))
    tmp = tempfile.mkdtemp(prefix="lsh_stats_")
    try:
        lsh_build_index(
            spark, sf_dir, tmp, docs=d.filter(F.col("doc_id") < split)
        )
        lsh_append_index(spark, tmp, d.filter(F.col("doc_id") >= split))
        idx = spark.read.parquet(tmp)
        return (
            idx.groupBy(F.col("band").cast("bigint").alias("band"))
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
                F.countDistinct("bkey").cast("bigint").alias("n_keys"),
                F.sum(hash60(F.col("bkey")) % _STATS_CHECKSUM_MOD)
                .cast("bigint")
                .alias("bkey_checksum"),
            )
            .orderBy("band")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


_LSH_DELETE_WHERE = (
    "WHERE source = 'src0' OR doc_id < GREATEST(1,"
    " (SELECT (MAX(doc_id) + 1) * 4 // 5 FROM documents"
    "  WHERE source != 'src0'))"
)


@_register("dedup_lsh_deleted", oracle=_lsh_appended_oracle(_LSH_DELETE_WHERE))
def dedup_lsh_deleted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DELETE path of the banded-signature rung verified END TO END as
    a registered query: build the persisted LSH index on the FULL
    standing corpus (source != src0), drop the top 1/5 of standing
    doc_ids through the generic (band, bucket) per-id delete, screen the
    src0 batch against the pruned artifact — and hold the incremental-
    screen oracle with the STANDING side restricted to survivors (the
    batch is unchanged; collisions that existed only through deleted
    docs must vanish). delete == rebuild-without == inline-on-survivors,
    pairwise pytest-gated; this row verifies the right-to-be-forgotten
    path on the screen family's serving artifact under every harness
    dataset."""
    import shutil
    import tempfile

    from .similarity import inverted_lists_delete

    d = load_table(spark, sf_dir, "documents").filter(F.col("source") != "src0")
    split = _doc_delete_split(spark, d)
    tmp = tempfile.mkdtemp(prefix="lsh_deleted_")
    try:
        lsh_build_index(spark, sf_dir, tmp)
        inverted_lists_delete(
            spark,
            tmp,
            d.filter(F.col("doc_id") >= split).select("doc_id"),
            id_col="doc_id",
            partition_cols=("band", "bucket"),
        )
        return lsh_probe_indexed(spark, tmp, sf_dir).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _winnow_recall_oracle() -> str:
    return f"""
    WITH {_winnow_fp_ctes()},
    fullset AS (SELECT DISTINCT doc_id, h FROM g),
    cnt AS (SELECT doc_id, COUNT(*) AS n FROM fullset GROUP BY doc_id),
    common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                      COUNT(*) AS common
               FROM fullset a JOIN fullset b
                 ON a.h = b.h AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
    truth AS (SELECT doc_a, doc_b
              FROM common JOIN cnt ca ON ca.doc_id = doc_a
                          JOIN cnt cb ON cb.doc_id = doc_b
              WHERE 3 * common >= ca.n + cb.n),
    cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM fp a JOIN fp b ON a.h = b.h AND a.doc_id < b.doc_id
             GROUP BY 1, 2
             HAVING COUNT(*) >= {WINNOW_MIN_SHARED}),
    m AS (SELECT
            (SELECT COUNT(*) FROM truth) AS n_truth,
            (SELECT COUNT(*) FROM cand) AS n_candidates,
            (SELECT COUNT(*) FROM cand c JOIN truth t
              ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b) AS n_verified)
    SELECT CAST(n_truth AS BIGINT) AS n_truth,
           CAST(n_candidates AS BIGINT) AS n_candidates,
           CAST(n_verified AS BIGINT) AS n_verified,
           ROUND(n_verified * 1.0 / NULLIF(n_truth, 0), 6) AS recall,
           ROUND(n_verified * 1.0 / NULLIF(n_candidates, 0), 6)
             AS candidate_precision
    FROM m
    """


@_register("dedup_winnowing_recall_report", oracle=_winnow_recall_oracle())
def dedup_winnowing_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The winnowing-quality scoreboard — the missing half of the MOSS
    rung: dedup_winnowing emits CANDIDATE pairs "for the exact
    verification tiers", and this report runs that verification and
    grades the sampling against the exact all-pairs truth, exactly as
    dedup_lsh_recall_report grades the minhash banding. Truth is
    Jaccard >= 1/2 over each doc's FULL distinct {WINNOW_K}-gram hash
    set, in the integer-exact spelling 3*common >= n_a + n_b (no float
    boundary can flip a pair cross-engine). n_verified — candidates
    that pass the exact-Jaccard verifier — is both the true-positive
    count (recall numerator) and the wired candidates->verifier path;
    candidate_precision is the verification-cost dial (low precision =
    the {WINNOW_MIN_SHARED}-fingerprint screen passes too much junk to
    the exact tier).

    Shape: the truth arm is the quadratic-by-design verification path
    (all-pairs on the full gram sets — at 100 TB you'd grade a sampled
    panel, same as the ANN scoreboard); the candidate arm is the gated
    one-scan winnowing plan; the three counts are ONE-ROW aggregates
    crossed into the single report row (the lsh report's class).
    """
    d = load_table(spark, sf_dir, "documents")
    toks = lower_ws_tokens("text")
    t = d.select("doc_id", toks.alias("toks")).filter(
        F.size("toks") >= WINNOW_K
    )
    grams = F.expr(
        f"transform(sequence(1, size(toks) - {WINNOW_K - 1}),"
        f" i -> array_join(slice(toks, i, {WINNOW_K}), ' '))"
    )
    # Set size rides each fingerprint row as a count-over-doc window, so
    # BOTH self-join sides read one identical subplan (exchange-reuse
    # canonicalizes) instead of a separate groupBy(doc_id) consumer
    # re-running the tokenize scan — truth arm = ONE corpus pass
    # (scan-budget gate pins the report at 2 with the candidate arm).
    fullset = (
        t.select("doc_id", F.explode(grams).alias("gram"))
        .select("doc_id", hash60(F.col("gram")).alias("h"))
        .distinct()
        .withColumn("n", F.count("*").over(Window.partitionBy("doc_id")))
    )
    a = fullset.select(
        F.col("doc_id").alias("doc_a"), "h", F.col("n").alias("na")
    )
    b = fullset.select(
        F.col("doc_id").alias("doc_b"), "h", F.col("n").alias("nb")
    )
    truth = (
        a.join(b, "h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count("*").alias("common"),
            F.first("na").alias("na"),
            F.first("nb").alias("nb"),
        )
        .filter(3 * F.col("common") >= F.col("na") + F.col("nb"))
        .select("doc_a", "doc_b")
    )
    cand = dedup_winnowing(spark, sf_dir).select("doc_a", "doc_b")
    nt = truth.groupBy().agg(F.count("*").cast("bigint").alias("n_truth"))
    nc = cand.groupBy().agg(F.count("*").cast("bigint").alias("n_candidates"))
    nv = (
        cand.join(truth, ["doc_a", "doc_b"])
        .groupBy()
        .agg(F.count("*").cast("bigint").alias("n_verified"))
    )
    return (
        nt.crossJoin(nc)
        .crossJoin(nv)
        .select(
            "n_truth",
            "n_candidates",
            "n_verified",
            F.round(
                F.col("n_verified") * F.lit(1.0) / F.nullif("n_truth", F.lit(0)), 6
            ).alias("recall"),
            F.round(
                F.col("n_verified") * F.lit(1.0) / F.nullif("n_candidates", F.lit(0)),
                6,
            ).alias("candidate_precision"),
        )
    )


def _winnow_verified_oracle() -> str:
    return f"""
    WITH {_winnow_fp_ctes()},
    cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                    CAST(COUNT(*) AS BIGINT) AS common_fingerprints
             FROM fp a JOIN fp b ON a.h = b.h AND a.doc_id < b.doc_id
             GROUP BY 1, 2
             HAVING COUNT(*) >= {WINNOW_MIN_SHARED}),
    cdocs AS (SELECT doc_a AS doc_id FROM cand
              UNION SELECT doc_b FROM cand),
    fullset AS (SELECT DISTINCT doc_id, h FROM g
                WHERE doc_id IN (SELECT doc_id FROM cdocs)),
    cnt AS (SELECT doc_id, COUNT(*) AS n FROM fullset GROUP BY doc_id),
    pc AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
           FROM fullset a JOIN fullset b
             ON a.h = b.h AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
    SELECT c.doc_a, c.doc_b, c.common_fingerprints,
           CAST(pc.common AS BIGINT) AS common_grams,
           CAST(ca.n AS BIGINT) AS n_a,
           CAST(cb.n AS BIGINT) AS n_b,
           CAST(ROUND(pc.common * 1000000.0 / (ca.n + cb.n - pc.common))
                AS BIGINT) AS jaccard_micro,
           3 * pc.common >= ca.n + cb.n AS is_dup
    FROM cand c
    JOIN pc ON pc.doc_a = c.doc_a AND pc.doc_b = c.doc_b
    JOIN cnt ca ON ca.doc_id = c.doc_a
    JOIN cnt cb ON cb.doc_id = c.doc_b
    ORDER BY c.doc_a, c.doc_b
    """


@_register("dedup_winnowing_verified", oracle=_winnow_verified_oracle())
def dedup_winnowing_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The winnowing rung's CONSUMABLE output: every candidate pair the
    fingerprint screen surfaced, verified by exact Jaccard over the FULL
    distinct {WINNOW_K}-gram sets — what dedup_minhash_lsh emits for the
    banding path, emitted here for the MOSS path (the recall report
    grades the screen in aggregate; this is the pair table a dedup policy
    actually consumes). jaccard_micro is one double division of exact
    integers rounded to micro-units; is_dup is the integer-exact
    3*common >= n_a + n_b spelling of Jaccard >= 1/2 — no float boundary
    can flip a verdict cross-engine.

    Scale discipline (the minhash rule): the exact-verification gram sets
    are CANDIDATE-PRUNED — full sets are built only for documents that
    appear in some candidate pair (left-semi on the candidate doc list),
    so verification cost scales with candidate volume, never the corpus;
    the pairwise overlap join runs on those pruned sets and is grouped
    straight onto the candidate pairs.
    """
    d = load_table(spark, sf_dir, "documents")
    cand = _winnow_pairs(_winnow_fingerprints(d))
    cdocs = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    toks = lower_ws_tokens("text")
    t = d.select("doc_id", toks.alias("toks")).filter(
        F.size("toks") >= WINNOW_K
    )
    grams = F.expr(
        f"transform(sequence(1, size(toks) - {WINNOW_K - 1}),"
        f" i -> array_join(slice(toks, i, {WINNOW_K}), ' '))"
    )
    fullset = (
        t.select("doc_id", F.explode(grams).alias("gram"))
        .select("doc_id", hash60(F.col("gram")).alias("h"))
        .distinct()
        .join(cdocs, "doc_id", "left_semi")
        .withColumn("n", F.count("*").over(Window.partitionBy("doc_id")))
    )
    a = fullset.select(
        F.col("doc_id").alias("doc_a"), "h", F.col("n").alias("n_a")
    )
    b = fullset.select(
        F.col("doc_id").alias("doc_b"), "h", F.col("n").alias("n_b")
    )
    pc = (
        a.join(b, "h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count("*").alias("common"),
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
        )
    )
    return (
        cand.join(pc, ["doc_a", "doc_b"])
        .select(
            "doc_a",
            "doc_b",
            "common_fingerprints",
            F.col("common").cast("bigint").alias("common_grams"),
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.round(
                F.col("common") * 1000000.0
                / (F.col("n_a") + F.col("n_b") - F.col("common"))
            )
            .cast("bigint")
            .alias("jaccard_micro"),
            (3 * F.col("common") >= F.col("n_a") + F.col("n_b")).alias("is_dup"),
        )
        .orderBy("doc_a", "doc_b")
    )


def _pruned_fp_index_read(
    spark: SparkSession, index_dir: str, batch_fp: DataFrame
) -> DataFrame:
    """Partition-pruned read of a bucket-partitioned fingerprint index
    (substring/winnow layout): collect the batch's fingerprint buckets
    (bounded: at most {FP_INDEX_BUCKETS} values) and filter the scan to
    them — Catalyst turns the isin into directory-level pruning, so a
    screen reads O(collided buckets) of the standing corpus, never all
    of it.  The lsh_probe_indexed economics, enabled for the MOSS and
    exact-substring screens by the round-11 bucket layout."""
    buckets_hit = sorted(
        {
            r.bucket
            for r in batch_fp.select(
                F.pmod(F.col("h"), F.lit(FP_INDEX_BUCKETS)).alias("bucket")
            )
            .distinct()
            .collect()
        }
    )
    return spark.read.parquet(index_dir).filter(F.col("bucket").isin(buckets_hit))


def substring_screen_indexed(
    spark: SparkSession, index_dir: str, docs: DataFrame
) -> DataFrame:
    """substring_screen_against_index served with PARTITION PRUNING: the
    batch's windows know their fingerprint buckets, so only those
    directories of the standing index are listed and read (plan-gated) —
    result-equal to screening against the full index read (gated),
    because a fingerprint can only match inside its own bucket."""
    from ..functions.hashing import assert_hash_mode_meta
    from ..functions.indexing import assert_index_complete

    assert_index_complete(spark, index_dir)
    assert_hash_mode_meta(spark, index_dir)
    batch_fp = _substring_windows(docs).select("h")
    return substring_screen_against_index(
        docs, _pruned_fp_index_read(spark, index_dir, batch_fp)
    )


def winnow_screen_indexed(
    spark: SparkSession, index_dir: str, docs: DataFrame
) -> DataFrame:
    """winnow_screen_against_index served with PARTITION PRUNING — the
    batch's selected fingerprints prune the standing read to their
    buckets; result-equal to the full-index screen (gated).  The batch
    pays its winnow selection twice (once for pruning, once inside the
    shared screen frame) — batch-sized work, traded for skipping
    (1 - collided/{FP_INDEX_BUCKETS}) of the standing corpus read."""
    from ..functions.hashing import assert_hash_mode_meta
    from ..functions.indexing import assert_index_complete

    assert_index_complete(spark, index_dir)
    assert_hash_mode_meta(spark, index_dir)
    batch_fp = _winnow_selected(docs).select("h")
    return winnow_screen_against_index(
        docs, _pruned_fp_index_read(spark, index_dir, batch_fp)
    )


def substring_screen_against_index(docs: DataFrame, index: DataFrame) -> DataFrame:
    """Screen a batch of ARRIVING documents against a persisted standing-
    corpus fingerprint index (substring_index_build's (doc_id, i, h)
    stream): per new doc, how many of its {SUBSTR_NGRAM}-token windows
    already exist verbatim in the standing corpus, the token mass those
    hits cover, and a route — ``dup`` (>= half the doc's token mass is
    standing text, the integer 2*cov >= n form), ``partial_dup`` (>= 1
    hit), ``new``. The exact-substring family's INCREMENTAL entry point:
    the standing corpus is never rescanned (its text was tokenized once,
    at index build), arriving docs join the int stream on the hash.

    Shared frame discipline (quality_verdicts' rule): the streaming
    screen and any batch backfill call THIS function, so they cannot
    disagree.
    """
    toks = lower_ws_tokens("text")
    t = docs.select("doc_id", toks.alias("toks")).filter(
        F.size("toks") >= SUBSTR_NGRAM
    )
    grams = F.expr(
        f"transform(sequence(1, size(toks) - {SUBSTR_NGRAM - 1}),"
        f" i -> array_join(slice(toks, i, {SUBSTR_NGRAM}), ' '))"
    )
    g = t.select("doc_id", F.posexplode(grams).alias("pos", "gram")).select(
        "doc_id",
        (F.col("pos") + 1).cast("bigint").alias("i"),
        hash60(F.col("gram")).alias("h"),
    )
    standing = index.select("h").distinct()
    hits = g.join(standing, "h", "left_semi")
    nh = hits.groupBy("doc_id").agg(F.count("*").alias("n_hits"))
    cov = (
        hits.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("i"), F.col("i") + F.lit(SUBSTR_NGRAM - 1))
            ).alias("p"),
        )
        .groupBy("doc_id")
        .agg(F.countDistinct("p").alias("standing_tokens"))
    )
    base = t.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_tokens"),
        (F.size("toks") - (SUBSTR_NGRAM - 1)).cast("bigint").alias("n_windows"),
    )
    j = (
        base.join(nh, "doc_id", "left")
        .join(cov, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "n_windows",
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
            F.coalesce("standing_tokens", F.lit(0))
            .cast("bigint")
            .alias("standing_tokens"),
        )
    )
    verdict = (
        F.when(2 * F.col("standing_tokens") >= F.col("n_tokens"), "dup")
        .when(F.col("n_hits") >= 1, "partial_dup")
        .otherwise("new")
    )
    return j.select(
        "doc_id", "n_tokens", "n_windows", "n_hits", "standing_tokens",
        verdict.alias("verdict"),
    )


def winnow_screen_against_index(docs: DataFrame, index: DataFrame) -> DataFrame:
    """Screen a batch of ARRIVING documents against a persisted
    standing-corpus winnowed-fingerprint index (winnow_index_build's
    (doc_id, h) stream): per new doc, its selected fingerprint count, how
    many standing documents share >= {WINNOW_MIN_SHARED} fingerprints
    with it, the strongest such candidate (most shared fingerprints,
    min-id tie-break — the ladder's canon), and a route —
    ``near_dup_candidate`` (>= 1 standing candidate; send to the exact
    verification tier) or ``new``. The MOSS rung's INCREMENTAL entry
    point, mirroring substring_screen_against_index: the standing corpus
    is never re-tokenized (its selection ran once, at index build);
    arriving docs join the int stream on the fingerprint hash at
    ~2/(W+1) of their shingle volume.

    Shared-frame discipline (quality_verdicts' rule): the streaming
    screen and any batch backfill call THIS function, so they cannot
    disagree.
    """
    fp_new = _winnow_fingerprints(docs)
    standing = _winnow_index_capped(index)
    hits = fp_new.join(
        standing.select(F.col("doc_id").alias("standing_doc"), "h"), "h"
    )
    cand = (
        hits.groupBy("doc_id", "standing_doc")
        .agg(F.count("*").alias("common"))
        .filter(F.col("common") >= WINNOW_MIN_SHARED)
    )
    best = cand.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_candidates"),
        # strongest candidate: most shared fingerprints, lowest id on ties
        F.min(
            F.struct(
                (-F.col("common")).alias("neg_common"),
                F.col("standing_doc").alias("sd"),
            )
        ).alias("b"),
    )
    nf = fp_new.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_fingerprints")
    )
    j = nf.join(best, "doc_id", "left")
    verdict = (
        F.when(F.col("n_candidates") >= 1, "near_dup_candidate")
        .otherwise("new")
    )
    return j.select(
        "doc_id",
        "n_fingerprints",
        F.coalesce("n_candidates", F.lit(0)).cast("bigint").alias("n_candidates"),
        F.col("b.sd").cast("bigint").alias("best_standing_doc"),
        (-F.col("b.neg_common")).cast("bigint").alias("best_common"),
        verdict.alias("verdict"),
    )
