"""Text-analysis operators over the ``documents`` table.

Extension tier (BASELINE.json north star): language-ID, quality scoring,
token counting, document fingerprinting — the per-document statistics a
large-scale training-data pipeline computes before filtering/dedup.

Every operator here is a pure column-expression pipeline (no Python UDFs):
one narrow projection per document, no shuffle at all except where a final
aggregate is requested. At 100 TB this is the ideal shape — embarrassingly
parallel map work that whole-stage codegen fuses into the parquet scan.

Each query has a DuckDB oracle built from the same tokenization contract
(functions/textfns.py, functions/hashing.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions.hashing import hash60, hash60_sql
from ..functions.textfns import (
    BIGRAM_EXPR,
    BPE_ISH_PATTERN,
    bpe_ish_token_count,
    lower_ws_tokens,
    ws_token_count,
)
from ..tables import load_table

QUERIES = {}
ORACLES = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Stopword votes per language for the n-gram/stopword heuristic. The corpus
# text is synthetic word salad, so the *labels* are arbitrary — what matters
# is that the decision function is deterministic and identical in both
# engines: count whole-word stopword occurrences per family, argmax with a
# fixed tie-break order (en > de > es).
_LANG_MARKERS = {
    "en": ["the", "a", "and", "of"],
    "de": ["der", "die", "und", "das"],
    "es": ["el", "la", "los", "de"],
}


def _marker_regex(words: list[str]) -> str:
    alt = "|".join(words)
    return f"(^|\\s)({alt})(\\s|$)"


@_register(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           len(regexp_split_to_array(trim(text), '\\s+')) AS ws_tokens,
           len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS bpe_tokens,
           length(text) AS chars
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish lexer tokens per doc.

    Narrow map-only projection; codegen fuses both regex counters into the
    scan. At 100 TB: zero shuffle, scales linearly with input splits.
    """
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        ws_token_count("text").cast("bigint").alias("ws_tokens"),
        bpe_ish_token_count("text").cast("bigint").alias("bpe_tokens"),
        F.length("text").cast("bigint").alias("chars"),
    )


@_register(
    "text_quality",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             length(text) AS chars,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
             len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct,
             len(regexp_extract_all(lower(text), '(^|\\s)(the|a|and|of|in|to)(\\s|$)'))
               AS n_stop
      FROM documents
    )
    SELECT doc_id, chars, n_tokens,
           ROUND(CAST(n_punct AS DOUBLE) / chars, 6) AS punct_ratio,
           ROUND(CAST(n_stop AS DOUBLE) / n_tokens, 6) AS stopword_ratio,
           ROUND(CAST(chars AS DOUBLE) / n_tokens, 6) AS avg_token_len,
           CASE
             WHEN n_tokens >= 50 AND CAST(n_punct AS DOUBLE) / chars < 0.05
               THEN 'good'
             WHEN n_tokens >= 20 THEN 'fair'
             ELSE 'poor'
           END AS quality_bucket
    FROM t
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length / punctuation-ratio / stopword-ratio features
    plus a CASE bucket — the standard pre-training quality filter features.

    Map-only like text_token_stats; non-overlapping whole-word matching uses
    ``(^|\\s)word(\\s|$)`` so Java and DuckDB regex engines agree.
    """
    d = load_table(spark, sf_dir, "documents")
    chars = F.length("text")
    n_tokens = ws_token_count("text")
    n_punct = F.size(F.regexp_extract_all(F.col("text"), F.lit("[^A-Za-z0-9\\s]"), F.lit(0)))
    n_stop = F.size(
        F.regexp_extract_all(
            F.lower(F.col("text")),
            F.lit("(^|\\s)(the|a|and|of|in|to)(\\s|$)"),
            F.lit(0),
        )
    )
    t = d.select(
        "doc_id",
        chars.alias("chars"),
        n_tokens.alias("n_tokens"),
        n_punct.alias("n_punct"),
        n_stop.alias("n_stop"),
    )
    return t.select(
        "doc_id",
        F.col("chars").cast("bigint").alias("chars"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        # try_divide: chars=0 (empty doc) yields NULL like DuckDB's float
        # division, instead of an ANSI DIVIDE_BY_ZERO crash
        F.round(F.try_divide(F.col("n_punct").cast("double"), F.col("chars")), 6).alias("punct_ratio"),
        F.round(F.col("n_stop").cast("double") / F.col("n_tokens"), 6).alias(
            "stopword_ratio"
        ),
        F.round(F.col("chars").cast("double") / F.col("n_tokens"), 6).alias(
            "avg_token_len"
        ),
        F.when(
            (F.col("n_tokens") >= 50)
            & (F.try_divide(F.col("n_punct").cast("double"), F.col("chars")) < 0.05),
            "good",
        )
        .when(F.col("n_tokens") >= 20, "fair")
        .otherwise("poor")
        .alias("quality_bucket"),
    )


def _lang_id_expr_sql() -> str:
    counts = {
        lang: f"len(regexp_extract_all(lower(text), '{_marker_regex(words)}'))"
        for lang, words in _LANG_MARKERS.items()
    }
    en, de, es = counts["en"], counts["de"], counts["es"]
    return f"""
    SELECT doc_id, lang AS labeled_lang,
           CASE
             WHEN {en} >= {de} AND {en} >= {es} THEN 'en'
             WHEN {de} >= {es} THEN 'de'
             ELSE 'es'
           END AS detected_lang
    FROM documents
    """


@_register("lang_id", oracle=_lang_id_expr_sql())
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: whole-word stopword votes per language family,
    argmax with fixed tie-break (en > de > es).

    A real pipeline would swap the marker lists for per-language n-gram
    profiles; the operator shape (map-only vote + argmax) is identical.
    """
    d = load_table(spark, sf_dir, "documents")
    votes = {
        lang: F.size(
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit(_marker_regex(words)), F.lit(0)
            )
        )
        for lang, words in _LANG_MARKERS.items()
    }
    detected = (
        F.when((votes["en"] >= votes["de"]) & (votes["en"] >= votes["es"]), "en")
        .when(votes["de"] >= votes["es"], "de")
        .otherwise("es")
    )
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        detected.alias("detected_lang"),
    )


@_register(
    "lang_stats",
    oracle="""
    SELECT lang, COUNT(*) AS docs,
           ROUND(AVG(CAST(n_chars AS DOUBLE)), 4) AS avg_chars,
           MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
    FROM documents GROUP BY lang ORDER BY docs DESC, lang
    """,
)
def lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus statistics (single hash-agg on a low-cardinality
    key; partial aggregation collapses shuffle traffic to ~|langs| rows)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").alias("docs"),
            F.round(F.avg(F.col("n_chars").cast("double")), 4).alias("avg_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy(F.col("docs").desc(), F.col("lang"))
    )


_NORM_SQL = "lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))"
_FP60_SQL = hash60_sql(_NORM_SQL)


@_register(
    "doc_fingerprint",
    oracle=f"""
    SELECT doc_id,
           md5({_NORM_SQL}) AS fp_md5,
           {_FP60_SQL} AS fp60
    FROM documents
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 + 60-bit integer fingerprint of
    whitespace-normalized lowercased text. The integer form feeds exact
    dedup and sharded equality joins without string comparisons."""
    d = load_table(spark, sf_dir, "documents")
    normalized = F.lower(F.regexp_replace(F.trim(F.col("text")), "\\s+", " "))
    return d.select(
        "doc_id",
        F.md5(normalized).alias("fp_md5"),
        hash60(normalized).alias("fp60"),
    )


ROLL_W = 8  # rolling window, tokens
ROLL_B = 31  # polynomial base
ROLL_M = 1 << 20  # hash modulus (keeps products in int64: 2^20 * 2^20 * 8 < 2^63)
ROLL_MASK = 63  # boundary when hv % 64 == 0 -> expected chunk ~64 windows


def _roll_powers() -> list[int]:
    return [pow(ROLL_B, ROLL_W - 1 - j, ROLL_M) for j in range(ROLL_W)]


def _rolling_oracle() -> str:
    powers = "[" + ", ".join(str(p) for p in _roll_powers()) + "]"
    tok_h = "(('0x' || substr(md5(toks[i + j]), 1, 15))::BIGINT % {m})".format(m=ROLL_M)
    return f"""
    WITH t AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
               FROM documents),
    pos AS (SELECT doc_id, toks,
                   unnest(generate_series(1, len(toks) - {ROLL_W} + 1)) AS i
            FROM t WHERE len(toks) >= {ROLL_W}),
    h AS (SELECT doc_id, i,
                 list_sum(list_transform(generate_series(0, {ROLL_W - 1}),
                          j -> {tok_h} * ({powers})[j + 1])) % {ROLL_M} AS hv
          FROM pos)
    SELECT doc_id, CAST(i AS BIGINT) AS pos, CAST(hv AS BIGINT) AS chunk_hash
    FROM h WHERE hv % {ROLL_MASK + 1} = 0
    """


@_register("doc_rolling_fingerprint", oracle=_rolling_oracle())
def doc_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash fingerprints with content-defined chunk boundaries.

    A Rabin-Karp polynomial hash slides over token windows; positions where
    the hash lands on a zero residue become chunk boundaries — the
    content-defined-chunking primitive behind rsync/LBFS-style partial-dup
    detection. Unlike fixed-size chunks, an insertion early in a document
    shifts no boundary after the next zero residue, so chunk fingerprints
    stay stable under local edits — at 100 TB, boundary hashes land in a
    (chunk_hash -> doc) inverted index and partial-overlap candidates fall
    out of a groupBy, exact-verified like the MinHash ladder.

    All-integer arithmetic (token hash and powers both < 2^20, window sum
    < 2^43), so Spark and the DuckDB oracle agree bit-for-bit. Map-only:
    the window enumeration happens inside one projection per doc.
    """
    d = load_table(spark, sf_dir, "documents")
    powers = "array(" + ", ".join(str(p) + "L" for p in _roll_powers()) + ")"
    tok_h = (
        f"(CAST(conv(substring(md5(toks[i + j - 1]), 1, 15), 16, 10) AS BIGINT)"
        f" % {ROLL_M})"
    )
    toks = lower_ws_tokens("text")
    t = d.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= ROLL_W)
    windows = t.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(toks) - {ROLL_W} + 1),"
                f" i -> struct(i AS pos,"
                f" aggregate(transform(sequence(0, {ROLL_W - 1}),"
                f" j -> {tok_h} * element_at({powers}, j + 1)),"
                f" 0L, (acc, v) -> acc + v) % {ROLL_M} AS hv))"
            )
        ).alias("w"),
    ).select(
        "doc_id",
        F.col("w.pos").cast("bigint").alias("pos"),
        F.col("w.hv").alias("chunk_hash"),
    )
    return windows.filter(F.col("chunk_hash") % (ROLL_MASK + 1) == 0)


TFIDF_TOPK = 3


def _tfidf_oracle() -> str:
    return f"""
    WITH toks AS (
      SELECT doc_id, t AS term
      FROM documents, UNNEST(regexp_split_to_array(lower(trim(text)), '\\s+')) AS u(t)
      WHERE t != ''
    ),
    tc AS (SELECT doc_id, term, COUNT(*) AS tc FROM toks GROUP BY doc_id, term),
    dl AS (SELECT doc_id, SUM(tc) AS dl FROM tc GROUP BY doc_id),
    idf AS (SELECT term, COUNT(*) AS df FROM tc GROUP BY term),
    nd AS (SELECT COUNT(DISTINCT doc_id) AS n FROM tc),
    scored AS (
      SELECT tc.doc_id, tc.term,
             (CAST(tc.tc AS DOUBLE) / CAST(dl.dl AS DOUBLE))
               * (CAST(nd.n AS DOUBLE) / CAST(idf.df AS DOUBLE)) AS tfidf
      FROM tc JOIN dl USING (doc_id) JOIN idf USING (term) CROSS JOIN nd
    )
    SELECT doc_id, term, tfidf FROM (
      SELECT doc_id, term, tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
      FROM scored
    ) WHERE rk <= {TFIDF_TOPK}
    ORDER BY doc_id, tfidf DESC, term
    """


@_register("text_tfidf_topk", oracle=_tfidf_oracle())
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF — the classic
    keyword-extraction pass of a training-data pipeline.

    Pipeline: tokenize (same whitespace lexer as text_token_stats) ->
    per-(doc, term) counts -> doc length via a doc_id window over those
    counts (reuses the (doc_id, term) distribution; no second corpus scan)
    -> document frequency per term (one aggregation of the count table,
    NOT the raw token stream) -> score -> per-doc top-k window.

    Scale notes: every aggregation input is the (doc, term) count table —
    corpus-scale text is scanned exactly once. The DF join shuffles on
    term; AQE broadcast-converts it when the vocabulary is small. TF-IDF
    is computed with integer->double divisions only (no log), so scores
    are bit-identical across engines and the top-k tie-break (score desc,
    term asc) is deterministic.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(lower_ws_tokens("text")).alias("term"),
    ).filter(F.col("term") != "")
    tc = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tc"))
    dl = Window.partitionBy("doc_id")
    with_dl = tc.withColumn("dl", F.sum("tc").over(dl))
    idf = tc.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = tc.agg(F.countDistinct("doc_id").alias("n"))
    scored = (
        with_dl.join(idf, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            (F.col("tc").cast("double") / F.col("dl").cast("double"))
            * (F.col("n").cast("double") / F.col("df").cast("double")),
        )
    )
    rk = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") <= TFIDF_TOPK)
        .select("doc_id", "term", "tfidf")
        .orderBy("doc_id", F.col("tfidf").desc(), "term")
    )


BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY_DOCS = 8  # doc_id < 8 are the query documents (ANN convention)
BM25_TOP_K = 10

# The per-term weight as ONE shared SQL expression, engineered so the two
# engines cannot drift:
#
# - ln() is the single transcendental, and JVM Math.log vs glibc log CAN
#   differ by 1 ulp — so the idf is quantized to integer micro-units
#   IMMEDIATELY, per TERM. A 1-ulp log difference only matters if
#   ln(...)*1e6 sits within that ulp of a rounding boundary: with |vocab|
#   trials (tens) instead of |candidate-row| trials (hundreds of
#   thousands), that exposure is ~1e-9 per corpus rather than near-certain
#   (the unquantized spelling hash-mismatched at sf0.01 exactly this way).
# - The BM25 tf saturation factor: with k1=6/5 and b=3/4, multiplying
#   through by 10*total_tokens gives
#   tffac = 22*tf*T / (10*tf*T + 3*T + 9*dl*N). The products are computed
#   in DOUBLE, not int64: at the 100 TB design point (T ~ 1e13-1e14, tf up
#   to ~1e4) 22*tf*T overflows int64 — a crash under ANSI, silent garbage
#   otherwise — while a double merely loses bits below 1e-16 relative (the
#   ranking is unaffected and nothing can overflow short of 1e308). This
#   costs NO determinism: IEEE-754 multiplication/addition/division are
#   bit-exact functions of their operands, both engines evaluate this one
#   shared expression string with the same left-associated operator tree,
#   and below 2^53 (every test scale) the doubles are exact, so results are
#   bit-identical to the old int64 spelling.
# - The final weight rounds a product of those values computed with an
#   identical operator tree, then SUMs as int64 — order-independent, so
#   partition layout, shuffle count, and engine agree bit-for-bit (same
#   discipline as nation_trade_flow_matrix's integer cents).
_BM25_WMIC_SQL = (
    "CAST(ROUND("
    "CAST(CAST(ROUND(ln((n_docs - df + 0.5) / (df + 0.5) + 1) * 1000000)"
    " AS BIGINT) AS DOUBLE)"
    " * (22 * CAST(tf AS DOUBLE) * total_tokens)"
    " / (10 * CAST(tf AS DOUBLE) * total_tokens"
    "    + 3 * CAST(total_tokens AS DOUBLE)"
    "    + 9 * CAST(dl AS DOUBLE) * n_docs)"
    ") AS BIGINT)"
)


def _bm25_oracle(docs_where: str = "") -> str:
    """The BM25 ranking twin. ``docs_where``: optional extra predicate on
    the corpus CTE (the deleted-row query restricts to the surviving
    base; everything downstream — df, dl, stats, scores — then derives
    from the reduced corpus exactly as the repaired index must)."""
    return f"""
    WITH toks AS (
      SELECT doc_id, t AS term
      FROM documents, UNNEST(regexp_split_to_array(lower(trim(text)), '\\s+')) AS u(t)
      WHERE t != '' {docs_where}
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
    dlt AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id),
    stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                     CAST(SUM(dl) AS BIGINT) AS total_tokens FROM dlt),
    dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    qt AS (SELECT DISTINCT doc_id AS query_id, term FROM tf
           WHERE doc_id < {BM25_QUERY_DOCS}),
    cand AS (
      SELECT qt.query_id, tf.doc_id AS neighbor_id, tf.tf, dft.df,
             dlt.dl, s.n_docs, s.total_tokens
      FROM qt
      JOIN dft ON dft.term = qt.term
      JOIN tf ON tf.term = qt.term
      JOIN dlt ON dlt.doc_id = tf.doc_id
      CROSS JOIN stats s
      WHERE tf.doc_id != qt.query_id
    ),
    sc AS (
      SELECT query_id, neighbor_id, CAST(SUM({_BM25_WMIC_SQL}) AS BIGINT) AS smic
      FROM cand GROUP BY query_id, neighbor_id
    ),
    r AS (
      SELECT query_id, neighbor_id, ROUND(smic / 1000000.0, 6) AS bm25,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY smic DESC, neighbor_id) AS rank
      FROM sc
    )
    SELECT query_id, neighbor_id, bm25, rank FROM r WHERE rank <= {BM25_TOP_K}
    """


@_register("text_bm25_retrieval", oracle=_bm25_oracle())
def text_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical retrieval: top-k corpus documents per query document —
    the sparse-retrieval counterpart to the embedding ANN tier
    (similarity_topk/ann_*), and the workhorse behind hard-negative
    mining, retrieval-based decontamination, and RAG indexing in a
    training-data pipeline.

    Pipeline: tokenize once -> (doc, term) counts -> doc length + corpus
    stats + document frequency, all derived from that ONE count table ->
    inverted-index join of the query docs' term sets against the postings
    -> per-(query, neighbor) score -> top-{BM25_TOP_K} window.

    Scale shape: corpus text is scanned exactly once; every later input is
    the (doc, term) count table. The postings join shuffles on term with
    the tiny query-term set broadcast; the score aggregation is map-side
    combinable because each term's weight quantizes to integer micro-units
    BEFORE summation (exact int64 adds — also what makes Spark, DuckDB,
    and any partitioning agree bit-for-bit; the ranking orders by the
    integer sum itself). At 100 TB the dlt/dft tables are the persisted
    index artifacts, and production retrieval adds a df cap on the
    postings join (``dft.df * K <= n_docs``) so the worst posting list is
    bounded at |corpus|/K — idf already scores ubiquitous terms near
    zero, so the cap changes cost, not ranking. It is omitted from the
    registered query because the synthetic corpus's 31-term vocabulary is
    ~all high-df: any cap empties the index instead of pruning it.
    """
    postings, stats = _bm25_corpus_tables(spark, sf_dir)
    # Query term sets tokenize the QUERY DOCS directly (doc_id pushed to
    # the scan: a row-group-pruned read of 8 docs, the probe-side read
    # bm25_probe_indexed already does) rather than filtering the postings
    # pipeline — the broadcast side must not re-run the corpus tokenize.
    d = load_table(spark, sf_dir, "documents")
    qt = (
        d.filter(F.col("doc_id") < BM25_QUERY_DOCS)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(lower_ws_tokens("text")).alias("term"),
        )
        .filter(F.col("term") != "")
        .distinct()
    )
    return _bm25_score(
        F.broadcast(qt)
        .join(postings, "term")
        .filter(F.col("doc_id") != F.col("query_id"))
        .crossJoin(F.broadcast(stats))
    )


def _bm25_score(cand: DataFrame) -> DataFrame:
    """The ONE scoring tail both the inline retrieval and the persisted-
    index probe run: integer-micro-unit per-term weights, exact int64
    aggregation, rank by the integer sum. A single site keeps the
    'index probe result-equal to inline' invariant true by construction —
    a scoring change cannot be applied to only one path. ``cand``: rows
    with (query_id, doc_id, tf, dl, df, n_docs, total_tokens)."""
    sc = (
        cand.select(
            "query_id",
            F.col("doc_id").alias("neighbor_id"),
            F.expr(_BM25_WMIC_SQL).alias("wmic"),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("wmic").cast("bigint").alias("smic"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("smic").desc(), "neighbor_id")
    return (
        sc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BM25_TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("smic") / 1000000.0, 6).alias("bm25"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


@_register(
    "corpus_tokenizer_fertility",
    oracle=f"""
    WITH t AS (
      SELECT lang,
             len(regexp_split_to_array(trim(text), '\\s+')) AS ws,
             len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS bpe,
             length(text) AS chars
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(ws) AS BIGINT) AS ws_tokens,
           CAST(SUM(bpe) AS BIGINT) AS bpe_tokens,
           ROUND(CAST(SUM(bpe) AS DOUBLE) / SUM(ws), 6) AS fertility,
           ROUND(CAST(SUM(chars) AS DOUBLE) / SUM(bpe), 6) AS chars_per_token
    FROM t GROUP BY lang ORDER BY lang
    """,
)
def corpus_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by language: BPE-ish tokens per whitespace word
    and characters per token — THE cross-lingual tokenizer-evaluation
    table. High fertility on a language means the vocabulary under-serves
    it (each word fragments into many subwords), which silently taxes its
    effective context window and training compute; chars/token is the
    compression read. Run before and after a bpe_train to quantify what a
    vocabulary change buys each language.

    One map-side-combined aggregation over |langs| groups; both token
    counters fuse into the scan (the same expressions text_token_stats
    projects per doc). Ratios divide two exact int64 sums — one double op
    from identical inputs, so engines agree bit-for-bit.
    """
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            "lang",
            ws_token_count("text").alias("ws"),
            bpe_ish_token_count("text").alias("bpe"),
            F.length("text").alias("chars"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("ws").alias("ws_tokens"),
            F.sum("bpe").alias("bpe_tokens"),
            # try_divide: a language whose docs are all empty/whitespace
            # has SUM(bpe)=0 — the oracle's float division yields NULL,
            # ANSI '/' would crash the query instead.
            F.round(
                F.try_divide(F.sum("bpe").cast("double"), F.sum("ws")), 6
            ).alias("fertility"),
            F.round(
                F.try_divide(F.sum("chars").cast("double"), F.sum("bpe")), 6
            ).alias("chars_per_token"),
        )
        .orderBy("lang")
    )


RRF_K = 60  # the standard reciprocal-rank-fusion damping constant
RRF_SCALE = 1_000_000_000  # nano-unit contributions: exact int64 fusion


def _rrf_oracle() -> str:
    from .similarity import ORACLES as SIM_ORACLES

    contrib = f"CAST(ROUND({RRF_SCALE} / ({RRF_K} + {{r}})) AS BIGINT)"
    return f"""
    WITH lex AS ({_bm25_oracle()}),
    sem AS ({SIM_ORACLES["similarity_topk"]}),
    u AS (
      SELECT COALESCE(l.query_id, s.query_id) AS query_id,
             COALESCE(l.neighbor_id, s.neighbor_id) AS neighbor_id,
             l.rank AS lr, s.rank AS sr
      FROM lex l FULL JOIN sem s
        ON l.query_id = s.query_id AND l.neighbor_id = s.neighbor_id
    ),
    sc AS (
      SELECT query_id, neighbor_id,
             COALESCE({contrib.format(r="lr")}, 0)
               + COALESCE({contrib.format(r="sr")}, 0) AS rmic,
             lr IS NOT NULL AS in_lexical,
             sr IS NOT NULL AS in_semantic
      FROM u
    ),
    r AS (
      SELECT query_id, neighbor_id, rmic, in_lexical, in_semantic,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY rmic DESC, neighbor_id) AS rank
      FROM sc
    )
    SELECT query_id, neighbor_id,
           ROUND(rmic / {RRF_SCALE}.0, 6) AS rrf,
           in_lexical, in_semantic, rank
    FROM r WHERE rank <= {BM25_TOP_K}
    ORDER BY query_id, rank
    """


@_register("retrieval_hybrid_rrf", oracle=_rrf_oracle())
def retrieval_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion of the lexical (BM25) and
    semantic (embedding cosine top-k) rankings — the standard two-tower
    serving pattern, where each system's blind spots (vocabulary mismatch
    for BM25, rare-entity precision for embeddings) are covered by the
    other. The in_lexical/in_semantic flags make the fusion auditable:
    a neighbor found by only one system is exactly the case fusion exists
    for.

    RRF needs only each system's RANK (1/(k + rank), k={RRF_K}) — no score
    calibration across systems, which is why it wins in practice. Each
    contribution quantizes to integer nano-units from identical-in-both-
    engines doubles ({RRF_SCALE}/(k+rank) of exact integers), the fused
    score is one int64 add (no float summation anywhere), and the re-rank
    orders by that integer — bit-stable across engines and partitionings.

    Scale shape: both inputs are already top-{BM25_TOP_K}-per-query tables
    (bounded: queries x k rows), so the FULL OUTER fusion join, the
    re-rank window, and the output are all query-set-sized — the corpus
    was only touched by the two underlying retrievers.
    """
    from .similarity import similarity_topk

    lex = text_bm25_retrieval(spark, sf_dir).select(
        "query_id", "neighbor_id", F.col("rank").alias("lr")
    )
    sem = similarity_topk(spark, sf_dir).select(
        "query_id", "neighbor_id", F.col("rank").alias("sr")
    )
    return _rrf_fuse(lex, sem)


def _rrf_fuse(lex: DataFrame, sem: DataFrame) -> DataFrame:
    """Shared RRF fusion tail — (query_id, neighbor_id, lr) x (query_id,
    neighbor_id, sr) → the fused top-{BM25_TOP_K} table — so the inline
    hybrid and the indexed serving twin cannot drift in their fusion
    arithmetic (integer nano-unit contributions, one int64 add, the
    deterministic re-rank)."""
    contrib = lambda r: F.coalesce(  # noqa: E731
        F.round(F.lit(RRF_SCALE) / (F.lit(RRF_K) + r)).cast("bigint"), F.lit(0)
    )
    u = lex.join(sem, ["query_id", "neighbor_id"], "full_outer")
    sc = u.select(
        "query_id",
        "neighbor_id",
        (contrib(F.col("lr")) + contrib(F.col("sr"))).alias("rmic"),
        F.col("lr").isNotNull().alias("in_lexical"),
        F.col("sr").isNotNull().alias("in_semantic"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("rmic").desc(), "neighbor_id")
    return (
        sc.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= BM25_TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("rmic") / float(RRF_SCALE), 6).alias("rrf"),
            "in_lexical",
            "in_semantic",
            "rank",
        )
        .orderBy("query_id", "rank")
    )


def retrieval_hybrid_rrf_from_indexes(
    spark: SparkSession,
    bm25_index_dir: str,
    ann_index_dir: str,
    sf_dir: str,
    nprobe: int | None = None,
    ann_probe: str = "ivf",
) -> DataFrame:
    """The hybrid retrieval SERVING path: probe the two PERSISTED indexes
    — the BM25 inverted index (bucket-pruned) and an ANN index
    (partition-pruned inverted lists) — and fuse their ranks with the
    same integer RRF tail the inline retrieval_hybrid_rrf uses.  This is
    the composition a deployed two-tower retriever actually runs: both
    corpus passes were paid at build time; a query batch costs two
    pruned index reads and a query-set-sized fusion join.

    ``ann_probe`` selects the semantic tower: ``ivf`` (full-vector lists;
    at the default nprobe=NLIST it is EXACT, so the whole composition is
    result-equal to the inline hybrid — gated by test), ``ivfpq`` or
    ``ivfpq-residual`` (code-resident lists: cheaper reads, approximate —
    the in_semantic flags expose what approximation dropped).  ``nprobe``
    dials cost vs recall exactly as in the underlying probes.
    """
    from .similarity import (
        IVF_NLIST,
        ivf_probe_indexed,
        ivfpq_probe_indexed,
        ivfpq_residual_probe_indexed,
    )

    probes = {
        "ivf": ivf_probe_indexed,
        "ivfpq": ivfpq_probe_indexed,
        "ivfpq-residual": ivfpq_residual_probe_indexed,
    }
    np_ = IVF_NLIST if nprobe is None else nprobe
    lex = bm25_probe_indexed(spark, bm25_index_dir, sf_dir).select(
        "query_id", "neighbor_id", F.col("rank").alias("lr")
    )
    sem = probes[ann_probe](spark, ann_index_dir, sf_dir, nprobe=np_).select(
        "query_id", "neighbor_id", F.col("rank").alias("sr")
    )
    return _rrf_fuse(lex, sem)


@_register("retrieval_hybrid_rrf_indexed", oracle=_rrf_oracle())
def retrieval_hybrid_rrf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The indexed hybrid serving path verified END TO END as a registered
    query: build both persisted indexes (BM25 postings + IVF inverted
    lists), probe them, RRF-fuse the ranks — and hold the INLINE
    retrieval_hybrid_rrf oracle, because at nprobe=NLIST the IVF tower is
    exact and the BM25 probe is result-equal by construction, so indexed
    == inline is the serving contract (each leg also individually
    pytest-gated).  The temp artifacts are deleted after the (bounded,
    eagerly checkpointed) fused result materializes."""
    import shutil
    import tempfile

    from .similarity import ivf_build_index

    tmp = tempfile.mkdtemp(prefix="hybrid_indexed_")
    try:
        bm25_dir, ann_dir = f"{tmp}/bm25", f"{tmp}/ivf"
        bm25_build_index(spark, sf_dir, bm25_dir)
        ivf_build_index(spark, sf_dir, ann_dir)
        return retrieval_hybrid_rrf_from_indexes(
            spark, bm25_dir, ann_dir, sf_dir
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


BM25_INDEX_BUCKETS = 64


def _bm25_corpus_tables(spark: SparkSession, sf_dir: str, docs=None):
    """(postings, stats): the two tables BM25 retrieval consumes.

    postings = (doc_id, term, tf, dl, df) — df denormalized onto each
    posting so a probe needs NO vocabulary-side join; stats = the ONE-ROW
    (n_docs, total_tokens) corpus aggregate.

    dl and df ride the count table as WINDOW columns (count-over-doc,
    count-over-term) instead of two groupBy branches joined back: the
    branch form makes dlt/dft/postings three differently-pruned consumers
    of the same tokenize pipeline, which Catalyst re-runs per consumer
    (the §8.3 pruning-defeats-exchange-reuse class — measured 6 corpus
    scans in the pre-round-10 retrieval plan); the window form is ONE
    lineage, one scan, with the same term/doc shuffles the joins paid
    anyway. stats still re-derives the pipeline once (its one-row rollup
    prunes differently by nature) — the retrieval budget is pinned at 3
    total by the scan-count gate."""
    d = docs if docs is not None else load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(lower_ws_tokens("text")).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    postings = (
        tf.withColumn("dl", F.sum("tf").over(Window.partitionBy("doc_id")))
        .withColumn("df", F.count("*").over(Window.partitionBy("term")))
        .select("doc_id", "term", "tf", "dl", "df")
    )
    stats = (
        postings.select("doc_id", "dl")
        .distinct()
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("dl").cast("bigint").alias("total_tokens"),
        )
    )
    return postings, stats


def bm25_build_index(
    spark: SparkSession,
    sf_dir: str,
    index_dir: str,
    docs: "DataFrame | None" = None,
) -> None:
    """Materialize the BM25 inverted index — the sparse-retrieval member of
    the write-once/probe-many index family (ivf/pq/lsh_build_index).

    Postings (doc_id, term, tf, dl, df) write Hive-partitioned by a
    {BM25_INDEX_BUCKETS}-way term-hash bucket: a probe that knows its
    query terms' buckets prunes every other directory at the FILE level,
    so per-query cost is O(collided posting lists), never the corpus. df
    rides denormalized on each posting (an index trades bytes for probe
    joins); the ONE-ROW corpus stats land in an underscore-prefixed
    sidecar the partition readers never see.
    """
    from ..functions.hashing import write_hash_mode_meta
    from ..functions.indexing import (
        clear_index_complete,
        discard_stale_stages,
        mark_index_complete,
    )

    clear_index_complete(spark, index_dir)
    # stale-stage discipline at build start — see indexing.discard_stale_stages
    discard_stale_stages(spark, index_dir)
    postings, stats = _bm25_corpus_tables(spark, sf_dir, docs=docs)
    out = postings.withColumn(
        "bucket", F.pmod(hash60(F.col("term")), F.lit(BM25_INDEX_BUCKETS))
    )
    out.write.mode("overwrite").partitionBy("bucket").parquet(index_dir)
    stats.write.mode("overwrite").parquet(f"{index_dir}/_stats")
    # Bucket layout derives from hash60(term): pin the build's hash family
    # so a probe under the other family fails loudly instead of pruning to
    # the wrong directories and silently dropping postings.
    write_hash_mode_meta(spark, index_dir)
    mark_index_complete(spark, index_dir)


def bm25_append_index(
    spark: SparkSession, index_dir: str, batch_docs: DataFrame, resume: bool = False
) -> None:
    """Append a batch of (doc_id, text) documents to the PERSISTED BM25
    inverted index WITHOUT rebuilding it — the write-side twin of
    bm25_probe_indexed's read economics.

    BM25's denormalized-df layout makes this subtler than the vector
    appends: adding documents changes df for every term the batch
    mentions, and those terms' EXISTING postings carry the stale value.
    But the bucket layout localizes the repair exactly: ALL postings of a
    term live in that term's hash bucket, so rewriting the touched
    buckets as (existing minus batch doc_ids) ∪ (batch postings) and
    recomputing df as the count-over-term WINDOW on the merged rows
    restores the globally-correct df for every term present — terms
    outside the touched buckets are untouched by the batch by
    construction.  The one-row ``_stats`` sidecar is adjusted exactly
    (old − previously-present-batch-docs + batch), so replaying a batch
    is a no-op for stats too.

    Idempotent under replay (anti-join on doc_id), convergent after a
    torn append (``resume=True``), O(batch + touched posting lists) —
    never the corpus.  Contract: doc_ids are content-immutable (same as
    lsh_append_index; a changed text under a reused id is an update this
    index family does not model).
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
    old = spark.read.parquet(f"{index_dir}/_stats").collect()[0]
    clear_index_complete(spark, index_dir)
    toks = batch_docs.select(
        "doc_id", F.explode(lower_ws_tokens("text")).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    new = (
        tf.withColumn("dl", F.sum("tf").over(Window.partitionBy("doc_id")))
        .withColumn("bucket", F.pmod(hash60(F.col("term")), F.lit(BM25_INDEX_BUCKETS)))
        .select("doc_id", "term", "tf", "dl", "bucket")
        .localCheckpoint(eager=True)  # batch-sized; read 3x below
    )
    buckets_hit = sorted({r.bucket for r in new.select("bucket").distinct().collect()})
    if not buckets_hit:  # empty/term-free batch: artifact already correct
        mark_index_complete(spark, index_dir)
        return
    batch_ids = new.select("doc_id").distinct()
    existing = (
        spark.read.parquet(index_dir)
        .filter(F.col("bucket").isin(buckets_hit))
        .select("doc_id", "term", "tf", "dl", "bucket")
    )
    # Stats adjustment, computed BEFORE the merge mutates the artifact: a
    # previously-present batch doc contributes all its postings to touched
    # buckets (content-immutable contract), so its (doc_id, dl) is visible
    # here exactly when it was already indexed.
    prev = (
        existing.join(batch_ids, "doc_id", "semi").select("doc_id", "dl").distinct()
    ).agg(
        F.count("*").cast("bigint").alias("n"), F.sum("dl").cast("bigint").alias("t")
    ).collect()[0]
    batch = new.select("doc_id", "dl").distinct().agg(
        F.count("*").cast("bigint").alias("n"), F.sum("dl").cast("bigint").alias("t")
    ).collect()[0]
    n_docs = int(old.n_docs) - int(prev.n or 0) + int(batch.n or 0)
    total_tokens = int(old.total_tokens) - int(prev.t or 0) + int(batch.t or 0)
    merged = (
        existing.join(batch_ids, "doc_id", "left_anti")
        .unionByName(new)
        .withColumn("df", F.count("*").over(Window.partitionBy("term")))
        .select("doc_id", "term", "tf", "dl", "df", "bucket")
        .localCheckpoint(eager=True)  # bounded: touched posting lists + batch
    )
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(index_dir)
    )
    spark.createDataFrame(
        [(n_docs, total_tokens)], "n_docs bigint, total_tokens bigint"
    ).write.mode("overwrite").parquet(f"{index_dir}/_stats")
    mark_index_complete(spark, index_dir)


def bm25_delete_index(
    spark: SparkSession, index_dir: str, doc_ids: DataFrame, resume: bool = False
) -> int:
    """Delete documents BY ID from the persisted BM25 index — append's
    inverse and the right-to-be-forgotten maintenance op for the lexical
    tier. Removing documents LOWERS df for every term they contained,
    and those terms' surviving postings carry the stale value; the
    bucket layout localizes the repair exactly as it does for appends:
    every posting of a term lives in that term's hash bucket, so
    rewriting the touched buckets as (existing minus deleted doc_ids)
    with df recomputed as the count-over-term window restores the
    globally-correct df, and the one-row ``_stats`` sidecar is adjusted
    exactly by the deleted documents' (count, total length).

    Touched buckets are discovered with one COLUMN-PRUNED scan
    (doc_id + dl + the partition column — no term strings decoded), so
    no hash family is consulted: deletes work identically under either
    hash mode. Idempotent (deleting absent ids rewrites nothing),
    convergent after a torn delete (``resume=True``), O(touched posting
    lists); fully-emptied buckets are removed through the Hadoop
    FileSystem (dynamic overwrite cannot clear a partition it writes no
    rows for). Result-equal to rebuilding without the documents (gated).

    Torn-delete recovery (``resume=True``) cannot trust the decrement
    arithmetic the clean path uses: a crash between the partition
    rewrite and the ``_stats`` write leaves the sidecar at its
    PRE-delete values, and a re-run only re-finds the ids whose postings
    survived the crash — docs the torn run fully removed would never be
    subtracted. So on resume the sidecar is RECOMPUTED from the
    surviving postings (one column-pruned (doc_id, dl) rollup of the
    index minus the id set), and the tail-crash case — rewrite and
    sweep both done, so no id matches anything — recomputes the sidecar
    and re-marks instead of early-returning (which would strand the
    artifact unprobeable with inflated stats). Both paths gated.

    Returns the number of postings removed.
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
        .select("doc_id", "dl", "bucket")
        .join(F.broadcast(idset), "doc_id", "semi")
        .localCheckpoint(eager=True)  # bounded: the deleted docs' postings
    )
    touched = sorted({r.bucket for r in hit.select("bucket").distinct().collect()})
    if not touched:  # ids absent: the postings are already correct
        if resume:
            # Tail recovery: the crashed run finished its rewrite and
            # emptied-bucket sweep (a surviving stale bucket would have
            # matched above) but died before the _stats/marker writes.
            clear_index_complete(spark, index_dir)
            _bm25_write_stats(spark, index_dir, *_bm25_surviving_stats(spark, index_dir, idset))
            mark_index_complete(spark, index_dir)
        return 0
    if resume:
        # Docstring contract: recompute, never decrement, on resume —
        # measured BEFORE the rewrite, while the index still holds every
        # surviving posting the stats must describe.
        n_docs, total_tokens = _bm25_surviving_stats(spark, index_dir, idset)
    else:
        old = spark.read.parquet(f"{index_dir}/_stats").collect()[0]
        gone = hit.select("doc_id", "dl").distinct().agg(
            F.count("*").cast("bigint").alias("n"), F.sum("dl").cast("bigint").alias("t")
        ).collect()[0]
        n_docs = int(old.n_docs) - int(gone.n or 0)
        total_tokens = int(old.total_tokens) - int(gone.t or 0)
    clear_index_complete(spark, index_dir)
    existing = (
        spark.read.parquet(index_dir)
        .filter(F.col("bucket").isin(touched))
        .select("doc_id", "term", "tf", "dl", "bucket")
    )
    remaining = (
        existing.join(F.broadcast(idset), "doc_id", "left_anti")
        .withColumn("df", F.count("*").over(Window.partitionBy("term")))
        .select("doc_id", "term", "tf", "dl", "df", "bucket")
        .localCheckpoint(eager=True)  # bounded: touched posting lists
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
        path = jvm.org.apache.hadoop.fs.Path(
            f"{index_dir.rstrip('/')}/bucket={v}"
        )
        fs = path.getFileSystem(jsc.hadoopConfiguration())
        if fs.exists(path):
            fs.delete(path, True)
    _bm25_write_stats(spark, index_dir, n_docs, total_tokens)
    mark_index_complete(spark, index_dir)
    return int(removed)


def _bm25_write_stats(
    spark: SparkSession, index_dir: str, n_docs: int, total_tokens: int
) -> None:
    spark.createDataFrame(
        [(int(n_docs), int(total_tokens))], "n_docs bigint, total_tokens bigint"
    ).write.mode("overwrite").parquet(f"{index_dir}/_stats")


def _bm25_surviving_stats(
    spark: SparkSession, index_dir: str, idset: DataFrame
) -> "tuple[int, int]":
    """Post-delete (n_docs, total_tokens) recomputed from the index's own
    postings minus the ids being deleted — the convergent form
    bm25_delete_index uses under ``resume=True``, where the ``_stats``
    sidecar may describe a pre-crash world. One column-pruned scan; no
    term strings decoded. An index the torn run fully emptied has no
    data files left to read, which is exactly (0, 0)."""
    from pyspark.errors import AnalysisException

    try:
        r = (
            spark.read.parquet(index_dir)
            .select("doc_id", "dl")
            .join(F.broadcast(idset), "doc_id", "left_anti")
            .distinct()
            .agg(
                F.count("*").cast("bigint").alias("n"),
                F.sum("dl").cast("bigint").alias("t"),
            )
            .collect()[0]
        )
    except AnalysisException:
        return 0, 0
    return int(r.n or 0), int(r.t or 0)


def bm25_index_drift(spark: SparkSession, index_dir: str) -> dict:
    """Staleness audit for the persisted BM25 index: the denormalized
    ``df`` on every posting and the one-row ``_stats`` sidecar are both
    REDUNDANT with the postings themselves, so drift between the stored
    and recomputed values is a direct integrity check — all-zero after
    any build/append sequence (the append's window repair makes this an
    invariant, pytest-gated), nonzero exactly when a write tore or a
    doc_id's text changed under the content-immutable contract. The
    df check is one scan rolled up to vocabulary size map-side; the
    stats check is one distinct-doc rollup to a single row.

    Returns {terms, drifted_terms, max_df_drift, n_docs_drift,
    total_tokens_drift} — integers, zero means fresh.
    """
    from ..functions.indexing import assert_index_complete

    assert_index_complete(spark, index_dir)
    p = spark.read.parquet(index_dir)
    per_term = p.groupBy("term").agg(
        F.count("*").alias("n"),
        F.min("df").alias("df_min"),
        F.max("df").alias("df_max"),
    )
    t = per_term.agg(
        F.count("*").cast("bigint").alias("terms"),
        F.sum(
            ((F.col("df_min") != F.col("n")) | (F.col("df_max") != F.col("n")))
            .cast("bigint")
        ).alias("drifted"),
        F.max(
            F.greatest(
                F.abs(F.col("df_min") - F.col("n")),
                F.abs(F.col("df_max") - F.col("n")),
            )
        ).alias("max_drift"),
    ).collect()[0]
    docs = p.select("doc_id", "dl").distinct().agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("dl").cast("bigint").alias("tt"),
    ).collect()[0]
    old = spark.read.parquet(f"{index_dir}/_stats").collect()[0]
    return {
        "terms": int(t.terms or 0),
        "drifted_terms": int(t.drifted or 0),
        "max_df_drift": int(t.max_drift or 0),
        "n_docs_drift": int(old.n_docs) - int(docs.n or 0),
        "total_tokens_drift": int(old.total_tokens) - int(docs.tt or 0),
    }


def bm25_probe_indexed(
    spark: SparkSession, index_dir: str, sf_dir: str
) -> DataFrame:
    """Probe the persisted BM25 index with partition pruning — result-equal
    to the inline ``text_bm25_retrieval`` (pinned by test).

    The query docs' term set is query-bounded, so the driver-side bucket
    collect is trivially small; Catalyst turns the bucket isin into
    partition-path pruning on the index scan. Scoring replays the exact
    integer-micro-unit weight expression, so index and inline rankings are
    bit-identical.
    """
    from ..functions.hashing import assert_hash_mode_meta
    from ..functions.indexing import assert_index_complete

    assert_index_complete(spark, index_dir)
    assert_hash_mode_meta(spark, index_dir)
    d = load_table(spark, sf_dir, "documents")
    toks = d.filter(F.col("doc_id") < BM25_QUERY_DOCS).select(
        F.col("doc_id").alias("query_id"),
        F.explode(lower_ws_tokens("text")).alias("term"),
    ).filter(F.col("term") != "")
    qt = toks.distinct().withColumn(
        "bucket", F.pmod(hash60(F.col("term")), F.lit(BM25_INDEX_BUCKETS))
    )
    buckets_hit = sorted({r.bucket for r in qt.select("bucket").distinct().collect()})
    postings = spark.read.parquet(index_dir).filter(F.col("bucket").isin(buckets_hit))
    stats = spark.read.parquet(f"{index_dir}/_stats")
    return _bm25_score(
        F.broadcast(qt.drop("bucket"))
        .join(postings, "term")
        .filter(F.col("doc_id") != F.col("query_id"))
        .crossJoin(F.broadcast(stats))
    )


@_register("text_bm25_appended", oracle=_bm25_oracle())
def text_bm25_appended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of the BM25 inverted index verified END TO
    END as a registered query: build the persisted index on the base 4/5
    of the corpus, bm25_append_index the remaining 1/5 (repairing the
    denormalized df on every touched term's existing postings and
    adjusting the one-row stats sidecar exactly), probe the appended
    artifact — and hold the INLINE text_bm25_retrieval oracle, because
    append == rebuild == inline ranking is the maintenance contract
    (pytest-gated pairwise; this row verifies the composition under the
    driver's datasets, including the df-repair arithmetic that BM25's
    denormalized layout makes the hard part).  Scale shape: build is the
    one tokenize pass, append O(batch + touched posting lists), probe
    the bucket-pruned scoring read."""
    import shutil
    import tempfile

    d = load_table(spark, sf_dir, "documents")
    mx = d.agg(F.max("doc_id")).collect()[0][0]
    split = max(1, int(((mx or 0) + 1) * 4 // 5))
    tmp = tempfile.mkdtemp(prefix="bm25_appended_")
    try:
        bm25_build_index(
            spark, sf_dir, tmp, docs=d.filter(F.col("doc_id") < split)
        )
        bm25_append_index(spark, tmp, d.filter(F.col("doc_id") >= split))
        return bm25_probe_indexed(spark, tmp, sf_dir).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _bm25_stats_oracle() -> str:
    bucket = f"{hash60_sql('tf.term')} % {BM25_INDEX_BUCKETS}"
    return f"""
    WITH toks AS (
      SELECT doc_id, t AS term
      FROM documents, UNNEST(regexp_split_to_array(lower(trim(text)), '\\s+')) AS u(t)
      WHERE t != ''
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
    dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    p AS (
      SELECT tf.doc_id, tf.term, tf.tf, dft.df, {bucket} AS bucket
      FROM tf JOIN dft ON dft.term = tf.term
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_postings,
           CAST(COUNT(DISTINCT term) AS BIGINT) AS n_terms,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(SUM(tf) AS BIGINT) AS tf_checksum,
           CAST(SUM(df) AS BIGINT) AS df_checksum
    FROM p GROUP BY bucket ORDER BY bucket
    """


@_register("bm25_index_stats", oracle=_bm25_stats_oracle())
def bm25_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bucket stats read FROM THE PERSISTED BM25 ARTIFACT after a
    build+append cycle, held against an oracle that recomputes every
    column from the raw corpus — the lexical twin of ivfpq_index_stats,
    and the external-truth complement to bm25_index_drift (drift checks
    the artifact against ITSELF; this row checks it against the corpus
    math). A green row proves the term-hash bucket layout, the posting
    rows, and the denormalized df ON DISK all match what one tokenize
    pass over the corpus says they must be — including the append's
    window repair of df in the touched buckets, which is exactly the
    value a torn or skipped repair would corrupt.

    Scale shape: one partition-filter-free scan of the index (postings
    are integer rows, never text) rolled up map-side to
    {BM25_INDEX_BUCKETS} rows.
    """
    import shutil
    import tempfile

    d = load_table(spark, sf_dir, "documents")
    mx = d.agg(F.max("doc_id")).collect()[0][0]
    split = max(1, int(((mx or 0) + 1) * 4 // 5))
    tmp = tempfile.mkdtemp(prefix="bm25_stats_")
    try:
        bm25_build_index(
            spark, sf_dir, tmp, docs=d.filter(F.col("doc_id") < split)
        )
        bm25_append_index(spark, tmp, d.filter(F.col("doc_id") >= split))
        idx = spark.read.parquet(tmp)
        return (
            idx.groupBy(F.col("bucket").cast("bigint").alias("bucket"))
            .agg(
                F.count("*").cast("bigint").alias("n_postings"),
                F.countDistinct("term").cast("bigint").alias("n_terms"),
                F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
                F.sum("tf").cast("bigint").alias("tf_checksum"),
                F.sum("df").cast("bigint").alias("df_checksum"),
            )
            .orderBy("bucket")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


_BM25_DELETE_SPLIT_SQL = (
    f"(SELECT GREATEST({BM25_QUERY_DOCS}, (MAX(doc_id) + 1) * 4 // 5)"
    " FROM documents)"
)


@_register(
    "text_bm25_deleted",
    oracle=_bm25_oracle(docs_where=f"AND doc_id < {_BM25_DELETE_SPLIT_SQL}"),
)
def text_bm25_deleted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DELETE path verified END TO END as a registered query: build
    the persisted BM25 index on the FULL corpus, bm25_delete_index the
    top 1/5 of doc_ids (lowering df on every touched term's surviving
    postings and adjusting the stats sidecar exactly), probe — and hold
    the inline oracle computed over the SURVIVING corpus only. delete ==
    rebuild-without == inline-on-survivors is the contract (pairwise
    pytest-gated; this row verifies the composition — especially the df
    REPAIR, which is the value a skipped or torn repair corrupts — on
    every dataset the harness generates). The split floor keeps the
    query documents in the surviving base so both engines rank the same
    queries. Scale shape: build is the one tokenize pass; the delete is
    O(touched posting lists) discovered by a column-pruned scan; the
    probe is the bucket-pruned scoring read.
    """
    import shutil
    import tempfile

    d = load_table(spark, sf_dir, "documents")
    mx = d.agg(F.max("doc_id")).collect()[0][0]
    split = max(BM25_QUERY_DOCS, int(((mx or 0) + 1) * 4 // 5))
    tmp = tempfile.mkdtemp(prefix="bm25_deleted_")
    try:
        bm25_build_index(spark, sf_dir, tmp)
        bm25_delete_index(
            spark, tmp, d.filter(F.col("doc_id") >= split).select("doc_id")
        )
        return bm25_probe_indexed(spark, tmp, sf_dir).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


SAMPLE_PCT = 20


def _sample_oracle() -> str:
    h = hash60_sql("CAST(doc_id AS VARCHAR)", salt="sample")
    return f"""
    SELECT lang, COUNT(*) AS sampled_docs,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
    FROM documents
    WHERE {h} % 100 < {SAMPLE_PCT}
    GROUP BY lang
    ORDER BY lang
    """


@_register("documents_stratified_sample", oracle=_sample_oracle())
def documents_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~20% sample, profiled per language stratum.

    Seeded ``sample()``/``sampleBy()`` depends on partitioning and RNG
    stream position — re-running on re-partitioned data yields a different
    subset. Keying the decision on a content hash (the cross-engine hash60
    of doc_id) makes membership a pure function of the ROW: replayable at
    any parallelism, incrementally stable (new docs don't flip old
    decisions), and auditable in SQL — the properties a training-data
    sample must have. The predicate is a scan-level filter; no shuffle
    beyond the per-stratum count.
    """
    d = load_table(spark, sf_dir, "documents")
    keep = (hash60(F.col("doc_id").cast("string"), salt="sample") % 100) < SAMPLE_PCT
    return (
        d.filter(keep)
        .groupBy("lang")
        .agg(
            F.count("*").alias("sampled_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("lang")
    )


# --- corpus n-gram statistics ----------------------------------------------

NGRAM_TOP_K = 50


@_register(
    "corpus_bigram_stats",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
      FROM documents
    ),
    idx AS (
      SELECT doc_id, toks, unnest(generate_series(1, len(toks)-1)) AS i FROM t
    ),
    shm AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] AS bigram FROM idx)
    SELECT bigram,
           COUNT(DISTINCT doc_id) AS doc_freq,
           COUNT(*) AS occurrences
    FROM shm
    GROUP BY bigram
    ORDER BY doc_freq DESC, occurrences DESC, bigram
    LIMIT {NGRAM_TOP_K}
    """,
)
def corpus_bigram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level n-gram statistics: top-k bigrams by document frequency.

    The vocabulary/contamination-analysis primitive of a training-data
    pipeline: which n-grams dominate the corpus, and in how many documents.
    Execution shape at 100 TB: explode is map-side (fused with the scan);
    the aggregation is ONE shuffle keyed by bigram — count(distinct doc_id)
    plans as a two-phase partial/final aggregate over (bigram, doc_id),
    never a per-group set materialization — and top-k plans
    TakeOrderedAndProject (per-partition heaps + single k-row merge, no
    global sort). Deterministic total order: doc_freq, occurrences, bigram.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = lower_ws_tokens("text")
    t = d.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= 2)
    shm = t.select(
        "doc_id",
        F.explode(
            F.expr(BIGRAM_EXPR)
        ).alias("bigram"),
    )
    return (
        shm.groupBy("bigram")
        .agg(
            F.countDistinct("doc_id").alias("doc_freq"),
            F.count("*").alias("occurrences"),
        )
        .orderBy(
            F.col("doc_freq").desc(), F.col("occurrences").desc(), F.col("bigram")
        )
        .limit(NGRAM_TOP_K)
    )


# --- PII redaction -----------------------------------------------------------

# Patterns restricted to syntax both regex engines (Java in Spark, RE2 in
# DuckDB) interpret identically: no lookarounds, no backreferences.
PII_URL = r"https?://[^\s]+"
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+?[0-9][0-9() -]{6,}[0-9]"


@_register(
    "pii_redact",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{PII_URL}')) AS n_urls,
           len(regexp_extract_all(regexp_replace(text, '{PII_URL}', '<URL>', 'g'),
               '{PII_EMAIL}')) AS n_emails,
           md5(regexp_replace(regexp_replace(regexp_replace(text,
               '{PII_URL}', '<URL>', 'g'),
               '{PII_EMAIL}', '<EMAIL>', 'g'),
               '{PII_PHONE}', '<PHONE>', 'g')) AS clean_md5
    FROM documents
    """,
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: URLs, then emails, then phone-like digit runs are
    replaced with typed placeholder tokens — the standard scrub pass before
    training-data release.

    Map-only column expressions (three regexp_replace fused into the scan
    by codegen; zero shuffle, zero Python). Redaction order is significant
    (an email inside a URL must be swallowed by the URL rule) and pinned
    identically in the oracle. The synthetic corpus contains no PII, so the
    differential check proves the engines' regex dialects agree on finding
    nothing; the planted-PII unit test carries the positive cases.
    """
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(PII_URL), F.lit(0)))
        .cast("bigint")
        .alias("n_urls"),
        F.size(
            F.regexp_extract_all(
                F.regexp_replace(F.col("text"), PII_URL, "<URL>"),
                F.lit(PII_EMAIL),
                F.lit(0),
            )
        )
        .cast("bigint")
        .alias("n_emails"),
        F.md5(
            redact_text(F.col("text")).cast("binary")
        ).alias("clean_md5"),
    )


def redact_text(col: "F.Column") -> "F.Column":
    """The reusable redaction expression: URL -> EMAIL -> PHONE order."""
    c = F.regexp_replace(col, PII_URL, "<URL>")
    c = F.regexp_replace(c, PII_EMAIL, "<EMAIL>")
    return F.regexp_replace(c, PII_PHONE, "<PHONE>")


# --- repetition / duplication quality signals --------------------------------


@_register(
    "text_repetition_stats",
    oracle="""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
      FROM documents
    ),
    t2 AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 2),
    w AS (SELECT doc_id, CAST(len(toks) AS INTEGER) AS n_words, unnest(toks) AS word
          FROM t2),
    wc AS (SELECT doc_id, n_words, word, COUNT(*) AS c FROM w GROUP BY 1, 2, 3),
    wstat AS (SELECT doc_id, n_words, COUNT(*) AS distinct_words,
                     MAX(c) AS top_word_count
              FROM wc GROUP BY 1, 2),
    idx AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks)-1)) AS i
            FROM t2),
    bg AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] AS bigram FROM idx),
    bc AS (SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY 1, 2),
    bstat AS (SELECT doc_id, MAX(c) AS top_bigram_count FROM bc GROUP BY 1)
    SELECT ws.doc_id, ws.n_words, ws.distinct_words,
           ROUND(CAST(ws.top_word_count AS DOUBLE) / ws.n_words, 6)
             AS top_word_frac,
           ROUND(1 - CAST(ws.distinct_words AS DOUBLE) / ws.n_words, 6)
             AS dup_word_frac,
           ROUND(CAST(bs.top_bigram_count AS DOUBLE) / (ws.n_words - 1), 6)
             AS top_bigram_frac
    FROM wstat ws JOIN bstat bs ON ws.doc_id = bs.doc_id
    ORDER BY ws.doc_id
    """,
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signals (Gopher-style rules): per document,
    the fraction held by the most frequent word / bigram and the duplicate-
    word fraction — the filters that catch boilerplate, keyword stuffing,
    and generation loops before pre-training.

    Execution shape: explode is map-side; the (doc_id, word) count is one
    shuffle whose partial aggregation collapses each document's repeats
    map-side (every doc lives in one input split, so the exchange carries
    ~distinct-words-per-doc rows, not tokens). The per-doc fold-up rides
    the same hash partitioning (doc_id is a prefix of the (doc_id, word)
    key, but Spark re-shuffles on doc_id alone — per-doc-aggregate rows
    only). Word and bigram pipelines join on doc_id at per-doc cardinality.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = lower_ws_tokens("text")
    t = d.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= 2)
    words = t.select(
        "doc_id", F.size("toks").alias("n_words"), F.explode("toks").alias("word")
    )
    wstat = (
        words.groupBy("doc_id", "n_words", "word")
        .count()
        .groupBy("doc_id", "n_words")
        .agg(
            F.count("*").alias("distinct_words"),
            F.max("count").alias("top_word_count"),
        )
    )
    bigrams = t.select(
        "doc_id",
        F.explode(
            F.expr(BIGRAM_EXPR)
        ).alias("bigram"),
    )
    bstat = (
        bigrams.groupBy("doc_id", "bigram")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("top_bigram_count"))
        .withColumnRenamed("doc_id", "b_doc_id")
    )
    return (
        wstat.join(bstat, F.col("doc_id") == F.col("b_doc_id"))
        .select(
            "doc_id",
            "n_words",
            "distinct_words",
            F.round(
                F.col("top_word_count").cast("double") / F.col("n_words"), 6
            ).alias("top_word_frac"),
            F.round(
                1 - F.col("distinct_words").cast("double") / F.col("n_words"), 6
            ).alias("dup_word_frac"),
            F.round(
                F.col("top_bigram_count").cast("double") / (F.col("n_words") - 1), 6
            ).alias("top_bigram_frac"),
        )
        .orderBy("doc_id")
    )


# --- end-to-end corpus cleaning pipeline -------------------------------------

CLEAN_MIN_TOKENS = 20
CLEAN_MAX_PUNCT_RATIO = 0.1
CLEAN_TRAIN_PCT = 90


def _clean_oracle() -> str:
    fp = hash60_sql("lower(regexp_replace(t, '\\s+', ' ', 'g'))")
    split = hash60_sql("CAST(doc_id AS VARCHAR)", salt="split")
    return f"""
    WITH q AS (
      SELECT doc_id, lang, trim(text) AS t,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
             len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct,
             length(text) AS chars
      FROM documents
    ),
    k AS (SELECT * FROM q
          WHERE n_tokens >= {CLEAN_MIN_TOKENS}
            AND CAST(n_punct AS DOUBLE) / chars < {CLEAN_MAX_PUNCT_RATIO}),
    fp AS (SELECT doc_id, lang, n_tokens, {fp} AS fp60,
                  CASE WHEN {split} % 100 < {CLEAN_TRAIN_PCT}
                       THEN 'train' ELSE 'val' END AS split
           FROM k),
    d AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY fp60 ORDER BY doc_id) AS rn
          FROM fp)
    SELECT lang, split, COUNT(*) AS docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM d WHERE rn = 1
    GROUP BY lang, split
    ORDER BY lang, split
    """


@_register("documents_clean_corpus", oracle=_clean_oracle())
def documents_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data prep pipeline: quality filter -> exact
    dedup -> deterministic train/val split -> per-(lang, split) manifest.

    One operator exercising the composition story end-to-end, ordered for
    scale: the map-only quality gate (token count, punctuation ratio) runs
    first so the dedup shuffle only carries survivors; dedup keys the ONE
    wide shuffle on the 60-bit fingerprint carrying a skinny
    (fp60, doc_id, lang, n_tokens, split) tuple — bodies never move; the
    split tag is a salted hash of doc_id, so membership is replayable at
    any parallelism and stable under re-runs (the property that makes the
    output a *manifest* rather than a random draw). The final rollup is a
    tiny-key aggregation. At 100 TB: one scan, one skinny shuffle, one
    aggregate — nothing else.
    """
    d = load_table(spark, sf_dir, "documents")
    chars = F.length("text")
    n_tokens = ws_token_count("text")
    n_punct = F.size(
        F.regexp_extract_all(F.col("text"), F.lit("[^A-Za-z0-9\\s]"), F.lit(0))
    )
    normalized = F.lower(F.regexp_replace(F.trim(F.col("text")), "\\s+", " "))
    kept = d.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        n_punct.alias("n_punct"),
        chars.alias("chars"),
        hash60(normalized).alias("fp60"),
        F.when(
            hash60(F.col("doc_id").cast("string"), salt="split") % 100
            < CLEAN_TRAIN_PCT,
            "train",
        )
        .otherwise("val")
        .alias("split"),
    ).filter(
        (F.col("n_tokens") >= CLEAN_MIN_TOKENS)
        & (F.try_divide(F.col("n_punct").cast("double"), F.col("chars")) < CLEAN_MAX_PUNCT_RATIO)
    )
    first_per_fp = Window.partitionBy("fp60").orderBy("doc_id")
    return (
        kept.withColumn("rn", F.row_number().over(first_per_fp))
        .filter(F.col("rn") == 1)
        .groupBy("lang", "split")
        .agg(
            F.count("*").alias("docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy("lang", "split")
    )


# --- weighted sampling (Efraimidis-Spirakis) ---------------------------------

WEIGHTED_SAMPLE_K = 100


def _weighted_oracle() -> str:
    u = f"(CAST({hash60_sql('CAST(doc_id AS VARCHAR)', salt='wsample')} AS DOUBLE) + 1) / 1152921504606846976"
    return f"""
    SELECT doc_id, lang, n_chars,
           ROUND(ln({u}) / n_chars, 9) AS es_key
    FROM documents
    WHERE n_chars > 0
    ORDER BY es_key DESC, doc_id
    LIMIT {WEIGHTED_SAMPLE_K}
    """


@_register("documents_weighted_sample", oracle=_weighted_oracle())
def documents_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional sampling without replacement (Efraimidis-Spirakis
    A-ES): per row, key = ln(u)/w with u a deterministic hash-uniform in
    (0, 1] and w = n_chars; the global top-k by key IS a weighted sample —
    the standard way to char-budget a training mixture so long documents
    are drawn proportionally more often.

    One distributed top-k (TakeOrderedAndProject: per-partition heaps of k,
    single k-row merge on the driver — no global sort, no shuffle of the
    corpus) over a map-computed key. Same determinism contract as
    documents_stratified_sample: membership is a pure function of the row,
    replayable at any parallelism; both engines compute bit-identical keys
    (same hash, same IEEE doubles), so the selected set is bit-stable
    cross-engine.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (
        hash60(F.col("doc_id").cast("string"), salt="wsample").cast("double") + 1
    ) / float(1 << 60)
    return (
        d.select(
            "doc_id",
            "lang",
            "n_chars",
            F.round(F.log(u) / F.col("n_chars"), 9).alias("es_key"),
        )
        .orderBy(F.col("es_key").desc(), F.col("doc_id"))
        .limit(WEIGHTED_SAMPLE_K)
    )


# --- unigram LM scoring (CCNet-style quality signal) -------------------------

LM_VOCAB_SIZE = 1000
LM_OOV_PENALTY = 10  # OOV probability floor = 1 / (corpus_tokens * PENALTY)


def _lm_oracle() -> str:
    return f"""
    WITH w AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS word
      FROM documents
    ),
    tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM w),
    vc AS (SELECT word, COUNT(*) AS c FROM w GROUP BY word),
    vocab AS (SELECT word, c FROM vc ORDER BY c DESC, word LIMIT {LM_VOCAB_SIZE}),
    scored AS (
      SELECT w.doc_id,
             CASE WHEN v.word IS NULL THEN 1 ELSE 0 END AS oov,
             CASE WHEN v.word IS NULL
                  THEN -ln(1.0 / (tot.n * {LM_OOV_PENALTY}))
                  ELSE -ln(CAST(v.c AS DOUBLE) / tot.n) END AS nll
      FROM w LEFT JOIN vocab v ON w.word = v.word CROSS JOIN tot
    )
    SELECT doc_id, COUNT(*) AS n_words,
           ROUND(AVG(CAST(oov AS DOUBLE)), 6) AS oov_rate,
           ROUND(AVG(nll), 6) AS avg_nll
    FROM scored
    GROUP BY doc_id
    ORDER BY doc_id
    """


@_register("text_lm_score", oracle=_lm_oracle())
def text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model quality scoring (CCNet-style, simplified):
    fit p(w) on the corpus itself, score each document by average negative
    log-probability and out-of-vocabulary rate — gibberish and
    wrong-language text score high NLL, natural in-domain text scores low.

    The two-pass broadcast-model shape that scales: pass 1 aggregates word
    counts (one shuffle, map-side combined) and keeps the top-V vocabulary
    via TakeOrderedAndProject with a deterministic (count, word) tie-break
    — the boundary is bit-stable cross-engine; the fitted model (V rows +
    one scalar) broadcasts back onto the exploded token stream, so pass 2
    is map-side scoring plus one per-doc aggregation. Corpus bodies are
    never joined or shuffled wide.
    """
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.explode(lower_ws_tokens("text")).alias("word"),
    )
    vocab = (
        words.groupBy("word")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), F.col("word"))
        .limit(LM_VOCAB_SIZE)
        .withColumnRenamed("word", "v_word")
    )
    total = words.agg(F.count("*").cast("double").alias("n"))
    oov = F.col("v_word").isNull()
    scored = (
        words.join(F.broadcast(vocab), F.col("word") == F.col("v_word"), "left")
        .join(F.broadcast(total))
        .select(
            "doc_id",
            oov.cast("double").alias("oov"),
            F.when(
                oov, -F.log(F.lit(1.0) / (F.col("n") * LM_OOV_PENALTY))
            )
            .otherwise(-F.log(F.col("c").cast("double") / F.col("n")))
            .alias("nll"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.round(F.avg("oov"), 6).alias("oov_rate"),
            F.round(F.avg("nll"), 6).alias("avg_nll"),
        )
        .orderBy("doc_id")
    )


# --- sequence packing for training shards ------------------------------------

# Token budget of one packed training sequence (a stand-in context length;
# real pipelines pass their model's).
PACK_SEQ_LEN = 512
# Independent packing streams. Each bucket is one deterministic token stream
# packed in isolation, so packing parallelism == bucket count with no
# cross-bucket coordination; at 100 TB this is thousands of buckets, each a
# single in-partition window pass.
PACK_BUCKETS = 8


def _pack_oracle() -> str:
    h = hash60_sql("CAST(doc_id AS VARCHAR)", salt="pack")
    return f"""
    WITH toks AS (
      SELECT doc_id,
             {h} AS h,
             len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS doc_tokens
      FROM documents
    ),
    ordered AS (
      SELECT doc_id, h % {PACK_BUCKETS} AS bucket, doc_tokens,
             CAST(COALESCE(SUM(doc_tokens) OVER (
               PARTITION BY h % {PACK_BUCKETS}
               ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS tok_start
      FROM toks WHERE doc_tokens > 0
    )
    SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
           tok_start // {PACK_SEQ_LEN} AS seq_id,
           tok_start, CAST(doc_tokens AS BIGINT) AS doc_tokens,
           (tok_start + doc_tokens - 1) // {PACK_SEQ_LEN}
             > tok_start // {PACK_SEQ_LEN} AS straddles
    FROM ordered
    ORDER BY bucket, tok_start, doc_id
    """


@_register("corpus_pack_sequences", oracle=_pack_oracle())
def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into fixed-token-budget training sequences.

    The export step of an LLM data pipeline: concatenate documents into a
    contiguous token stream and chop it into PACK_SEQ_LEN-token training
    sequences. Each doc gets the sequence containing its first token
    (``seq_id``, bucket-local), its offset in the stream (``tok_start``),
    and whether it straddles a sequence boundary (``straddles`` — the docs
    a loader must split across samples).

    Determinism contract: bucket assignment AND within-bucket order are
    pure functions of doc_id (cross-engine hash60, salt "pack"), so the
    packing is replayable at any parallelism and incrementally stable —
    the same properties as documents_stratified_sample, extended to an
    ordering. No RNG, no partition-index dependence.

    Shape at 100 TB: one shuffle (hash-partition by bucket), then a single
    in-partition window pass computes every running offset; token counting
    fuses into the scan. Buckets bound window-partition size, so no
    single-reducer global ordering exists anywhere — scale the bucket
    count with the corpus.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", bpe_ish_token_count("text").alias("doc_tokens")
    ).filter(F.col("doc_tokens") > 0)
    return _pack_offsets(toks).orderBy("bucket", "tok_start", "doc_id")


def _pack_offsets(toks: DataFrame) -> DataFrame:
    """Packing core over a (doc_id, doc_tokens) table: hash-bucket, order,
    running token offset, sequence id, straddle flag. Shared by
    corpus_pack_sequences (whole corpus) and corpus_shard_manifest
    (cleaned-survivor subset); the input is already skinny — two integers
    per doc — so nothing corpus-scale beyond the one bucket shuffle moves.
    """
    h = hash60(F.col("doc_id").cast("string"), salt="pack")
    w = (
        Window.partitionBy("bucket")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        toks.withColumn("h", h)
        .withColumn("bucket", (F.col("h") % PACK_BUCKETS).cast("bigint"))
        .withColumn(
            "tok_start",
            F.coalesce(F.sum("doc_tokens").over(w), F.lit(0)).cast("bigint"),
        )
        .select(
            "doc_id",
            "bucket",
            F.expr(f"tok_start DIV {PACK_SEQ_LEN}").alias("seq_id"),
            "tok_start",
            F.col("doc_tokens").cast("bigint").alias("doc_tokens"),
            (
                F.expr(f"(tok_start + doc_tokens - 1) DIV {PACK_SEQ_LEN}")
                > F.expr(f"tok_start DIV {PACK_SEQ_LEN}")
            ).alias("straddles"),
        )
    )


def _manifest_oracle() -> str:
    fp = hash60_sql("lower(regexp_replace(t, '\\s+', ' ', 'g'))")
    split = hash60_sql("CAST(doc_id AS VARCHAR)", salt="split")
    h = hash60_sql("CAST(doc_id AS VARCHAR)", salt="pack")
    return f"""
    WITH q AS (
      SELECT doc_id, trim(text) AS t,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
             len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct,
             length(text) AS chars,
             len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS bpe
      FROM documents
    ),
    k AS (SELECT * FROM q
          WHERE n_tokens >= {CLEAN_MIN_TOKENS}
            AND CAST(n_punct AS DOUBLE) / chars < {CLEAN_MAX_PUNCT_RATIO}),
    fp AS (SELECT doc_id, bpe, {fp} AS fp60,
                  CASE WHEN {split} % 100 < {CLEAN_TRAIN_PCT}
                       THEN 'train' ELSE 'val' END AS split
           FROM k),
    d AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY fp60 ORDER BY doc_id) AS rn
          FROM fp),
    surv AS (SELECT doc_id, bpe AS doc_tokens, {h} AS h
             FROM d WHERE rn = 1 AND split = 'train' AND bpe > 0),
    packed AS (
      SELECT doc_id, h % {PACK_BUCKETS} AS bucket, doc_tokens,
             CAST(COALESCE(SUM(doc_tokens) OVER (
               PARTITION BY h % {PACK_BUCKETS}
               ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS tok_start
      FROM surv
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           COUNT(*) AS docs,
           CAST(COUNT(DISTINCT tok_start // {PACK_SEQ_LEN}) AS BIGINT) AS seqs,
           CAST(SUM(doc_tokens) AS BIGINT) AS tokens,
           CAST(SUM(CASE WHEN (tok_start + doc_tokens - 1) // {PACK_SEQ_LEN}
                              > tok_start // {PACK_SEQ_LEN}
                    THEN 1 ELSE 0 END) AS BIGINT) AS straddlers
    FROM packed
    GROUP BY bucket
    ORDER BY bucket
    """


def clean_survivor_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packed sequence assignment of the CLEANED corpus: quality filter ->
    exact dedup -> train split -> _pack_offsets over the survivors.

    This is the packing the export job materializes; corpus_shard_manifest
    is its per-bucket aggregate — both must describe the SAME packing, so
    they share this builder (jobs pack writes this assignment and derives
    the manifest from the same survivor set).
    """
    d = load_table(spark, sf_dir, "documents")
    chars = F.length("text")
    n_tokens = ws_token_count("text")
    n_punct = F.size(
        F.regexp_extract_all(F.col("text"), F.lit("[^A-Za-z0-9\\s]"), F.lit(0))
    )
    normalized = F.lower(F.regexp_replace(F.trim(F.col("text")), "\\s+", " "))
    kept = d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_punct.alias("n_punct"),
        chars.alias("chars"),
        bpe_ish_token_count("text").alias("doc_tokens"),
        hash60(normalized).alias("fp60"),
        F.when(
            hash60(F.col("doc_id").cast("string"), salt="split") % 100
            < CLEAN_TRAIN_PCT,
            "train",
        )
        .otherwise("val")
        .alias("split"),
    ).filter(
        (F.col("n_tokens") >= CLEAN_MIN_TOKENS)
        & (F.try_divide(F.col("n_punct").cast("double"), F.col("chars")) < CLEAN_MAX_PUNCT_RATIO)
    )
    first_per_fp = Window.partitionBy("fp60").orderBy("doc_id")
    surv = (
        kept.withColumn("rn", F.row_number().over(first_per_fp))
        .filter(
            (F.col("rn") == 1) & (F.col("split") == "train") & (F.col("doc_tokens") > 0)
        )
        .select("doc_id", "doc_tokens")
    )
    return _pack_offsets(surv)


@_register("corpus_shard_manifest", oracle=_manifest_oracle())
def corpus_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-data export manifest: quality filter ->
    exact dedup -> train split -> sequence packing -> per-bucket shard
    stats (docs, sequences, tokens, boundary-straddling docs).

    This is the composition a real pipeline ships: the number a capacity
    plan needs (sequences per shard) and the number a loader needs
    (straddle rate) computed in one job. Scale shape: the quality gate and
    token counters fuse into the scan; the dedup window shuffles a skinny
    (fp60, doc_id, counts) tuple; packing shuffles two integers per
    surviving doc; the manifest is a PACK_BUCKETS-row aggregate. Document
    bodies never move. The per-doc assignment behind these stats is
    clean_survivor_packing — the export job writes that exact packing.
    """
    packed = clean_survivor_packing(spark, sf_dir)
    return (
        packed.groupBy("bucket")
        .agg(
            F.count("*").alias("docs"),
            F.countDistinct("seq_id").alias("seqs"),
            F.sum("doc_tokens").alias("tokens"),
            F.sum(F.when(F.col("straddles"), 1).otherwise(0)).alias("straddlers"),
        )
        .orderBy("bucket")
    )


# --- round-3 additions: normalization / gating / entropy / profiling -------

_NORMALIZE_SQL = (
    "trim(regexp_replace(regexp_replace(lower(text),"
    " '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g'))"
)


@_register(
    "text_normalize",
    oracle=f"""
    SELECT doc_id,
           {_NORMALIZE_SQL} AS norm_text,
           ({_NORMALIZE_SQL} != text) AS changed,
           CAST(length(text) AS BIGINT) AS chars_before,
           CAST(length({_NORMALIZE_SQL}) AS BIGINT) AS chars_after
    FROM documents
    ORDER BY doc_id
    """,
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization: lowercase, strip non-alphanumerics,
    collapse whitespace, trim — the first pass of every dedup/quality
    pipeline (exact dedup over raw bytes misses trivially-reformatted
    copies; every downstream fingerprint should hash THIS form).

    Map-only column expressions fused into the scan; no shuffle, no UDF.
    The trailing ORDER BY is presentation-only.
    """
    d = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9\\s]", ""),
            "\\s+",
            " ",
        )
    )
    return d.select(
        "doc_id",
        norm.alias("norm_text"),
        (norm != F.col("text")).alias("changed"),
        F.length("text").cast("long").alias("chars_before"),
        F.length(norm).cast("long").alias("chars_after"),
    ).orderBy("doc_id")


GATE_MIN_TOKENS = 20
GATE_MAX_PUNCT = 0.10
GATE_MIN_STOP = 0.0  # synthetic corpus: stopword floor disabled by data


@_register(
    "corpus_quality_gate",
    oracle=f"""
    WITH t AS (
      SELECT source,
             len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tokens,
             len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))
               * 1.0 / NULLIF(length(text), 0) AS punct_ratio
      FROM documents
    ),
    g AS (
      SELECT source,
             (n_tokens >= {GATE_MIN_TOKENS}
              AND COALESCE(punct_ratio, 1.0) <= {GATE_MAX_PUNCT}) AS passed
      FROM t
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN passed THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
           ROUND(SUM(CASE WHEN passed THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
             AS pass_rate
    FROM g
    GROUP BY source
    ORDER BY source
    """,
)
def corpus_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source admission gate: how much of each source survives the
    pre-training quality filter (token floor + punctuation ceiling) — the
    report a curation run reads before deciding which sources to keep.

    One map-side-combined aggregation over |sources| groups; the per-doc
    features are scan-fused expressions shared with ``text_quality``.
    """
    d = load_table(spark, sf_dir, "documents")
    n_tokens = ws_token_count("text")
    punct_ratio = F.try_divide(
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit("[^A-Za-z0-9\\s]"), F.lit(0))
        ).cast("double"),
        F.length("text"),
    )
    passed = (n_tokens >= GATE_MIN_TOKENS) & (
        F.coalesce(punct_ratio, F.lit(1.0)) <= GATE_MAX_PUNCT
    )
    return (
        d.select("source", passed.alias("passed"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("passed"), 1).otherwise(0)).alias("n_pass"),
            F.round(
                F.sum(F.when(F.col("passed"), 1).otherwise(0))
                * F.lit(1.0)
                / F.count("*"),
                6,
            ).alias("pass_rate"),
        )
        .orderBy("source")
    )


@_register(
    "text_ngram_entropy",
    oracle="""
    WITH lt AS (SELECT doc_id, lower(text) AS t FROM documents
                WHERE length(text) >= 2),
    bg AS (
      SELECT doc_id, substr(t, i, 2) AS g
      FROM lt, LATERAL unnest(generate_series(1, length(t) - 1)) AS u(i)
    ),
    cnt AS (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY 1, 2),
    tot AS (SELECT doc_id, SUM(c) AS n FROM cnt GROUP BY 1)
    SELECT cnt.doc_id,
           CAST(tot.n AS BIGINT) AS n_bigrams,
           ROUND(log2(tot.n) - SUM(c * log2(c)) / tot.n, 3) AS entropy_bits
    FROM cnt JOIN tot ON tot.doc_id = cnt.doc_id
    GROUP BY cnt.doc_id, tot.n
    ORDER BY cnt.doc_id
    """,
)
def text_ngram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-bigram entropy per document — the cheap gibberish/
    boilerplate detector (natural text sits in a narrow entropy band;
    random bytes score high, repeated template text scores low).

    H = log2(N) - sum(c_i * log2(c_i)) / N over bigram counts c_i — the
    count-based form, so both engines sum the SAME discrete values and
    the only float sensitivity is summation order inside one doc
    (~1e-12, rounded at 3 decimals). Shuffle shape: (doc_id, bigram)
    partial-count then doc rollup — two map-side-combined exchanges on
    doc-bounded state.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") >= 2)
    lt = d.select("doc_id", F.lower(F.col("text")).alias("t"))
    bg = lt.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, length(t) - 1), i -> substring(t, i, 2))")
        ).alias("g"),
    )
    cnt = bg.groupBy("doc_id", "g").agg(F.count("*").alias("c"))
    return (
        cnt.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_bigrams"),
            F.sum(F.col("c") * F.log2("c")).alias("clog"),
        )
        .select(
            "doc_id",
            F.col("n_bigrams").cast("long").alias("n_bigrams"),
            F.round(
                F.log2("n_bigrams") - F.col("clog") / F.col("n_bigrams"), 3
            ).alias("entropy_bits"),
        )
        .orderBy("doc_id")
    )


@_register(
    "documents_length_histogram",
    oracle="""
    SELECT lang,
           CAST(floor(log2(n_chars + 1)) AS INTEGER) AS bucket,
           COUNT(*) AS n_docs,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars
    FROM documents
    GROUP BY 1, 2
    ORDER BY lang, bucket
    """,
)
def documents_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed document-length histogram per language — the length
    profile a pipeline reads to set packing sequence length and truncation
    policy (and to spot collapsed/truncated sources).

    Tiny-group aggregation (|langs| x ~12 buckets) with map-side combine;
    log2 of an integer is exact at bucket boundaries in both engines
    (powers of two are representable), so bucket edges agree.
    """
    d = load_table(spark, sf_dir, "documents")
    bucket = F.floor(F.log2(F.col("n_chars") + 1)).cast("int")
    return (
        d.groupBy("lang", bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("lang", "bucket")
    )


MIXTURE_BUDGET_FRAC = 0.5  # training budget as a fraction of corpus tokens


@_register(
    "corpus_mixture_plan",
    oracle=f"""
    WITH t AS (
      SELECT source,
             SUM(len(regexp_split_to_array(lower(trim(text)), '\\s+'))) AS avail
      FROM documents GROUP BY source
    ),
    g AS (SELECT SUM(avail) AS corpus_tokens, COUNT(*) AS n_sources FROM t)
    SELECT t.source,
           CAST(t.avail AS BIGINT) AS tokens_available,
           CAST(FLOOR({MIXTURE_BUDGET_FRAC} * g.corpus_tokens / g.n_sources)
                AS BIGINT) AS uniform_share,
           CAST(LEAST(t.avail,
                FLOOR({MIXTURE_BUDGET_FRAC} * g.corpus_tokens / g.n_sources))
                AS BIGINT) AS tokens_target,
           ROUND(LEAST(t.avail,
                 FLOOR({MIXTURE_BUDGET_FRAC} * g.corpus_tokens / g.n_sources))
                 * 1.0 / t.avail, 6) AS sample_rate,
           (t.avail < FLOOR({MIXTURE_BUDGET_FRAC} * g.corpus_tokens
                            / g.n_sources)) AS underfilled
    FROM t, g
    ORDER BY t.source
    """,
)
def corpus_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture budgeting: given a token budget (50% of the corpus)
    and a uniform target mixture over sources, the per-source sampling
    plan — available tokens, the uniform share, the capped target, the
    sampling rate a downsampler would apply, and an `underfilled` flag for
    sources too small to fill their share (the signal to re-weight or
    up-epoch them). The table a data-mixture config is generated from.

    One map-side-combined per-source aggregation plus a broadcast 1-row
    corpus total — no second scan, no shuffle beyond |sources| groups.
    Closed-form (no waterfill redistribution): deficits are REPORTED, not
    silently reallocated — re-weighting is a policy decision.
    """
    d = load_table(spark, sf_dir, "documents")
    t = d.groupBy("source").agg(
        F.sum(ws_token_count("text")).alias("avail")
    )
    g = t.agg(
        F.sum("avail").alias("corpus_tokens"), F.count("*").alias("n_sources")
    )
    share = F.floor(
        F.lit(MIXTURE_BUDGET_FRAC) * F.col("corpus_tokens") / F.col("n_sources")
    )
    return (
        t.join(F.broadcast(g))
        .select(
            "source",
            F.col("avail").cast("bigint").alias("tokens_available"),
            share.cast("bigint").alias("uniform_share"),
            F.least(F.col("avail"), share).cast("bigint").alias("tokens_target"),
            F.round(
                F.least(F.col("avail"), share) * F.lit(1.0) / F.col("avail"), 6
            ).alias("sample_rate"),
            (F.col("avail") < share).alias("underfilled"),
        )
        .orderBy("source")
    )


# --- fixed-token chunking with overlap ---------------------------------------

CHUNK_TOKENS = 64
CHUNK_OVERLAP = 16
CHUNK_STRIDE = CHUNK_TOKENS - CHUNK_OVERLAP


def _chunking_oracle() -> str:
    fp = hash60_sql(
        "array_to_string(toks[CAST(i * {s} + 1 AS BIGINT):"
        "CAST(LEAST(i * {s} + {c}, n) AS BIGINT)], ' ')".format(
            s=CHUNK_STRIDE, c=CHUNK_TOKENS
        )
    )
    return f"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
      FROM documents
    ),
    s AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) >= 1),
    c AS (
      SELECT doc_id, toks, n,
             unnest(generate_series(
               0,
               CAST(GREATEST(1, CEIL((n - {CHUNK_OVERLAP})
                    / CAST({CHUNK_STRIDE} AS DOUBLE))) AS BIGINT) - 1
             )) AS i
      FROM s
    )
    SELECT doc_id,
           i AS chunk_id,
           CAST(i * {CHUNK_STRIDE} + 1 AS BIGINT) AS start_tok,
           CAST(LEAST(i * {CHUNK_STRIDE} + {CHUNK_TOKENS}, n)
                - i * {CHUNK_STRIDE} AS BIGINT) AS n_tokens,
           {fp} AS chunk_fp
    FROM c
    ORDER BY doc_id, chunk_id
    """


@_register("documents_chunking", oracle=_chunking_oracle())
def documents_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-token chunking with overlap: every document split into
    {CHUNK_TOKENS}-token windows at stride {CHUNK_STRIDE} (={CHUNK_OVERLAP}
    tokens of overlap) — the chunker feeding context-window packing,
    retrieval indexing, and embedding jobs. chunk count =
    max(1, ceil((n - overlap) / stride)), so every token lands in a chunk,
    short docs yield exactly one, and the tail chunk shrinks rather than
    duplicating a full window.

    Pure projection: tokenize -> per-row explode of a chunk-index sequence
    -> slice + fingerprint, all inside whole-stage codegen with ZERO
    shuffles (the output orderBy is presentation-only). At 100 TB this is
    a map-only pass whose output partitioning follows the input files —
    exactly what a downstream embedding job wants to mapInPandas over.
    """
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", lower_ws_tokens("text").alias("toks")).filter(
        F.size("toks") >= 1
    )
    n = F.size("toks")
    c = t.select(
        "doc_id",
        "toks",
        n.alias("n"),
        F.explode(F.expr(
            f"sequence(0, greatest(1, ceil((size(toks) - {CHUNK_OVERLAP})"
            f" / cast({CHUNK_STRIDE} as double))) - 1)"
        )).alias("i"),
    )
    start = F.col("i") * CHUNK_STRIDE + 1
    end = F.least(F.col("i") * CHUNK_STRIDE + CHUNK_TOKENS, F.col("n"))
    chunk_text = F.array_join(
        F.slice(F.col("toks"), start.cast("int"), (end - start + 1).cast("int")), " "
    )
    return c.select(
        "doc_id",
        F.col("i").alias("chunk_id"),
        start.cast("bigint").alias("start_tok"),
        (end - start + 1).cast("bigint").alias("n_tokens"),
        hash60(chunk_text).alias("chunk_fp"),
    ).orderBy("doc_id", "chunk_id")


# --- language-ID evaluation and perplexity-based partitioning ----------------


def _lang_confusion_oracle() -> str:
    return f"""
    WITH pred AS ({_lang_id_expr_sql()}),
    tot AS (
      SELECT labeled_lang, COUNT(*) AS labeled_docs
      FROM pred GROUP BY labeled_lang
    )
    SELECT p.labeled_lang, p.detected_lang, COUNT(*) AS docs,
           ROUND(CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(t.labeled_docs), 6)
             AS recall_share
    FROM pred p JOIN tot t ON p.labeled_lang = t.labeled_lang
    GROUP BY p.labeled_lang, p.detected_lang
    ORDER BY p.labeled_lang, p.detected_lang
    """


@_register("corpus_lang_confusion", oracle=_lang_confusion_oracle())
def corpus_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix: ground-truth label x detected language
    with per-truth recall shares — the calibration table read before
    trusting the classifier to route documents into per-language pipelines
    (a LID that shunts 20% of French into the English bucket poisons both).

    Shape: the per-doc prediction is the same map-only vote as ``lang_id``;
    the matrix is ONE map-side-combinable groupBy at |langs|^2 cardinality,
    and the per-truth totals it normalizes by are a window over that
    already-tiny aggregate — no second scan, no corpus-scale shuffle, so
    at 100 TB the cost is one pass over the text plus an exchange of a
    few dozen rows.
    """
    pred = lang_id(spark, sf_dir)
    cell = pred.groupBy("labeled_lang", "detected_lang").agg(
        F.count("*").alias("docs")
    )
    w = Window.partitionBy("labeled_lang")
    return (
        cell.select(
            "labeled_lang",
            "detected_lang",
            "docs",
            F.round(
                F.col("docs").cast("double") / F.sum("docs").over(w), 6
            ).alias("recall_share"),
        )
        .orderBy("labeled_lang", "detected_lang")
    )


# CCNet-style corpus partitioning: per language, documents split into
# perplexity terciles (head = most in-domain, tail = noisiest). Mixture
# builders upsample head, drop or LM-filter tail.
PPL_BUCKETS = 3
_PPL_NAMES = {1: "head", 2: "middle", 3: "tail"}


def _ppl_bucket_oracle() -> str:
    name_case = " ".join(
        f"WHEN {k} THEN '{v}'" for k, v in sorted(_PPL_NAMES.items())
    )
    return f"""
    WITH lm AS ({_lm_oracle()}),
    scored AS (
      SELECT d.lang, lm.doc_id, lm.avg_nll,
             NTILE({PPL_BUCKETS}) OVER (
               PARTITION BY d.lang ORDER BY lm.avg_nll, lm.doc_id
             ) AS b
      FROM lm JOIN documents d ON lm.doc_id = d.doc_id
    )
    SELECT lang, CASE b {name_case} END AS bucket, COUNT(*) AS docs,
           ROUND(MIN(avg_nll), 6) AS min_nll,
           ROUND(MAX(avg_nll), 6) AS max_nll
    FROM scored
    GROUP BY lang, b
    ORDER BY lang, MIN(b)
    """


@_register("corpus_perplexity_buckets", oracle=_ppl_bucket_oracle())
def corpus_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity partitioning: per language, split documents
    into head/middle/tail terciles of unigram-LM score — the standard
    quality gradient used to pick how much of a crawl enters the training
    mixture (head kept, tail dropped or re-filtered).

    Shape: the per-doc score is ``text_lm_score``'s two-pass broadcast-model
    plan (one token-count shuffle + map-side scoring); the lang join is a
    narrow doc_id equi-join of per-doc SCORES (never bodies); the tercile
    split is one window per language ordered by (avg_nll, doc_id) — the
    doc_id tie-break makes bucket boundaries bit-stable cross-engine. The
    final rollup is |langs| x {PPL_BUCKETS} rows. At 100 TB the window
    carries 16-byte score rows, and a quantile-sketch cut (approx
    percentiles -> map-side bucket assignment) is the drop-in upgrade if
    even that shuffle is unwanted.
    """
    lm = text_lm_score(spark, sf_dir)
    langs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    scored = lm.join(langs, "doc_id").select("lang", "doc_id", "avg_nll")
    w = Window.partitionBy("lang").orderBy("avg_nll", "doc_id")
    b = scored.withColumn("b", F.ntile(PPL_BUCKETS).over(w))
    name_col = F.col("b")
    bucket = None
    for k, v in sorted(_PPL_NAMES.items()):
        bucket = (
            F.when(name_col == k, v) if bucket is None else bucket.when(name_col == k, v)
        )
    return (
        b.groupBy("lang", "b")
        .agg(
            F.count("*").alias("docs"),
            F.round(F.min("avg_nll"), 6).alias("min_nll"),
            F.round(F.max("avg_nll"), 6).alias("max_nll"),
        )
        .select(
            "lang",
            bucket.alias("bucket"),
            "docs",
            "min_nll",
            "max_nll",
            F.col("b").alias("_b"),
        )
        .orderBy("lang", "_b")
        .drop("_b")
    )


# --- BPE tokenizer induction -------------------------------------------------

# Pairs reported by the registered query (iteration-0 of BPE: adjacent
# character-pair counts weighted by word frequency).
BPE_TOP_PAIRS = 50

# Symbol sequences sit on the distinct-WORD dictionary, not the corpus:
# pair counting and merging are weighted by word frequency, so a 100 TB
# corpus costs one word-count shuffle up front and each merge round then
# touches only the (much smaller, still distributed) dictionary.
_SYMS_EXPR = "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
_ADJ_PAIRS = (
    "zip_with(slice(syms, 1, size(syms) - 1),"
    " slice(syms, 2, size(syms) - 1), (a, b) -> concat(a, ' ', b))"
)


def _bpe_pair_oracle() -> str:
    return f"""
    WITH w AS (
      SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS word
      FROM documents
    ),
    wf AS (SELECT word, COUNT(*) AS freq FROM w WHERE word <> '' GROUP BY word),
    pos AS (
      SELECT word, freq, unnest(generate_series(1, length(word) - 1)) AS i
      FROM wf WHERE length(word) >= 2
    )
    SELECT substr(word, i, 1) || ' ' || substr(word, i + 1, 1) AS pair,
           CAST(SUM(freq) AS BIGINT) AS cnt
    FROM pos
    GROUP BY pair
    ORDER BY cnt DESC, pair
    LIMIT {BPE_TOP_PAIRS}
    """


def _word_freqs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(lower_ws_tokens("text")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


@_register("corpus_bpe_pair_counts", oracle=_bpe_pair_oracle())
def corpus_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE iteration zero: adjacent character-pair counts over the corpus,
    weighted by word frequency — the statistic a byte-pair-encoding
    tokenizer trainer maximizes at every merge step, and on its own the
    standard "which merges would a tokenizer learn here?" audit.

    Shape: one word-count shuffle collapses the corpus to its dictionary
    (map-side combined; token payloads never shuffle — only distinct words
    with counts), then pair expansion is a JVM-side transform over each
    word's characters and the pair rollup is a second map-side-combined
    aggregate at |alphabet|^2 cardinality. Top-k via
    TakeOrderedAndProject with the (count desc, pair asc) tie-break that
    makes the boundary deterministic cross-engine.
    """
    wf = _word_freqs(spark, sf_dir)
    pairs = wf.filter(F.length("word") >= 2).select(
        "freq",
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1),"
                " i -> concat(substring(word, i, 1), ' ', substring(word, i + 1, 1)))"
            )
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").cast("bigint").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "pair")
        .limit(BPE_TOP_PAIRS)
    )


_SYMS_STR_EXPR = f"array_join({_SYMS_EXPR}, ' ')"
# Adjacent symbol pairs of the single-spaced state string (overlapping, the
# Sennrich counting convention: "a a a" contributes (a,a) twice).
_STATE_PAIRS = (
    "zip_with(slice(split(s, ' '), 1, size(split(s, ' ')) - 1),"
    " slice(split(s, ' '), 2, size(split(s, ' ')) - 1),"
    " (a, b) -> concat(a, ' ', b))"
)


def _merge_pair_expr(col, a: str, b: str):
    """Greedy left-to-right non-overlapping merge of pair (a, b) in a
    single-spaced symbol string, as three JVM string ops.

    Literal replace() scans left-to-right and never rescans replaced text —
    exactly the greedy non-overlap semantics — but on a single-spaced
    string consecutive occurrences share their delimiter space, so the
    second of "a b a b" is missed. Doubling the internal spaces gives every
    symbol its own delimiters; a collapse pass restores the single-spaced
    form. Symbols never contain spaces (they are merges of whitespace-split
    word characters), so collapsing space runs is lossless.
    """
    doubled = F.concat(
        F.lit(" "), F.replace(col, F.lit(" "), F.lit("  ")), F.lit(" ")
    )
    rewritten = F.replace(doubled, F.lit(f" {a}  {b} "), F.lit(f" {a + b} "))
    return F.trim(F.regexp_replace(rewritten, " +", " "))


def _bpe_train_states(
    spark: SparkSession, sf_dir: str, n_merges: int
) -> tuple[list[tuple[str, int]], DataFrame]:
    """Shared BPE training loop: returns (merges, state) where state is the
    post-merge dictionary (word, freq, s) with ``s`` the single-spaced
    symbol string — the table every consumer (stats, encode, fertility)
    derives from. Every per-round operation is JVM-side string/array work;
    no Python UDF touches the hot path.
    """
    wf = _word_freqs(spark, sf_dir)
    state = wf.select(
        "word", "freq", F.expr(_SYMS_STR_EXPR).alias("s")
    ).localCheckpoint(eager=True)
    merges: list[tuple[str, int]] = []
    for _ in range(n_merges):
        pairs = state.select("freq", F.explode(F.expr(_STATE_PAIRS)).alias("pair"))
        top = (
            pairs.groupBy("pair")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "pair")
            .limit(1)
            .collect()
        )
        if not top:
            break
        best, cnt = top[0].pair, int(top[0].cnt)
        merges.append((best, cnt))
        a, b = best.split(" ")
        state = state.withColumn(
            "s", _merge_pair_expr(F.col("s"), a, b)
        ).localCheckpoint(eager=True)
    return merges, state


BPE_BATCH_K = 8       # max merges applied per batched round
BPE_BATCH_WINDOW = 64  # serial-order candidates examined per round


def _bpe_train_states_batched(
    spark: SparkSession,
    sf_dir: str,
    n_merges: int,
    batch_k: int = BPE_BATCH_K,
) -> tuple[list[tuple[str, int]], DataFrame, int]:
    """BPE training with BATCHED rounds, GUARANTEED merge-for-merge equal
    to the serial trainer — the measured mitigation the bpe_train
    docstring promises (a 32k-merge production vocabulary is bounded by
    the per-round driver floor, not data volume; batching divides the
    round count).

    Each round counts pairs ONCE and then accepts a PREFIX of the
    serial-ordered (count desc, pair asc) candidate list, applying all
    accepted merges in one rewrite pass.  A candidate is accepted only
    when serial execution would provably pick it next:

    - prefix rule: the walk stops at the FIRST candidate sharing a symbol
      with an accepted pair — an overlapping pair's count CHANGES once
      the earlier merges apply, so everything at or below it may reorder;
      an accepted pair is symbol-disjoint from all earlier ones, so its
      count (and every not-yet-reached candidate's relative order below
      it) is untouched by their rewrites, which also makes the rewrites
      commute;
    - new-pair bound: merging (a, b) can only create pairs (x, a·b) with
      count ≤ cnt(x, a) and (a·b, y) with count ≤ cnt(b, y), so the walk
      stops when the max count over pairs adjacent to an accepted symbol
      reaches the candidate's count — a freshly-created pair could
      otherwise outrank it in the serial schedule (strict: a tie is
      unsafe too, because the new pair's NAME takes over the tie-break).
      The adjacency maxima split into an EXACT part over the collected
      window and a FLOOR for everything below it: pairs outside the
      window all have cnt ≤ the window's minimum, so requiring an
      accepted candidate's cnt to strictly exceed that floor (waived
      when the window holds the whole dictionary) makes the out-of-
      window contribution provably harmless — the guarantee costs ZERO
      extra Spark jobs beyond widening serial's LIMIT 1 collect to the
      window.

    Per round this is exactly serial's work — one pair-count aggregation,
    one bounded collect, one rewrite+checkpoint — amortized over several
    merges.  Returns (merges, state, rounds_used); merges match
    ``_bpe_train_states`` element-for-element (pytest + hypothesis gated,
    and the registered query holds the serial UNROLLED SQL oracle).
    """
    wf = _word_freqs(spark, sf_dir)
    state = wf.select(
        "word", "freq", F.expr(_SYMS_STR_EXPR).alias("s")
    ).localCheckpoint(eager=True)
    merges: list[tuple[str, int]] = []
    rounds = 0
    while len(merges) < n_merges:
        pairs = (
            state.select("freq", F.explode(F.expr(_STATE_PAIRS)).alias("pair"))
            .groupBy("pair")
            .agg(F.sum("freq").alias("cnt"))
        )
        top = (
            pairs.orderBy(F.col("cnt").desc(), "pair")
            .limit(BPE_BATCH_WINDOW)
            .collect()
        )
        if not top:
            break
        rounds += 1
        # Exact adjacency maxima over the window; the floor covers the rest.
        left_max: dict[str, int] = {}
        right_max: dict[str, int] = {}
        for row in top:
            x, y = row.pair.split(" ")
            c = int(row.cnt)
            right_max[x] = max(right_max.get(x, 0), c)  # pairs (x, ·)
            left_max[y] = max(left_max.get(y, 0), c)    # pairs (·, y)
        complete = len(top) < BPE_BATCH_WINDOW  # window holds the dictionary
        floor = 0 if complete else int(top[-1].cnt)
        selected: list[tuple[str, int]] = []
        used_syms: set[str] = set()
        new_pair_bound = 0
        for row in top:
            pair, cnt = row.pair, int(row.cnt)
            a, b = pair.split(" ")
            if selected:
                if a in used_syms or b in used_syms:
                    break  # prefix rule: counts at/below here may reorder
                if new_pair_bound >= cnt or floor >= cnt:
                    break  # a created pair could outrank this candidate
            selected.append((pair, cnt))
            used_syms.update((a, b))
            # new pairs from (a, b) are bounded by pairs ENDING in a and
            # pairs STARTING at b
            new_pair_bound = max(
                new_pair_bound, left_max.get(a, 0), right_max.get(b, 0)
            )
            if len(selected) >= min(batch_k, n_merges - len(merges)):
                break
        merges.extend(selected)
        state = state.withColumn(
            "s", _merge_pairs_batch_expr(F.col("s"), [p for p, _ in selected])
        ).localCheckpoint(eager=True)
    return merges, state, rounds


def _merge_pairs_batch_expr(col, pairs: list[str]):
    """Apply a batch of SYMBOL-DISJOINT merges in one rewrite: double the
    delimiters once, run one literal replace per pair, collapse once —
    equal to chaining ``_merge_pair_expr`` per pair (each replace leaves
    every other pair's doubled separators intact except around its own
    new symbol, whose pairs are outside the batch by the disjointness
    rule) but paying the doubling and the regexp collapse ONCE per round
    instead of once per merge."""
    doubled = F.concat(
        F.lit(" "), F.replace(col, F.lit(" "), F.lit("  ")), F.lit(" ")
    )
    for pair in pairs:
        a, b = pair.split(" ")
        doubled = F.replace(doubled, F.lit(f" {a}  {b} "), F.lit(f" {a + b} "))
    return F.trim(F.regexp_replace(doubled, " +", " "))


def bpe_train_batched(
    spark: SparkSession,
    sf_dir: str,
    n_merges: int = 8,
    batch_k: int = BPE_BATCH_K,
) -> dict:
    """bpe_train's scale form: identical merges (see
    ``_bpe_train_states_batched`` for the equality proof sketch), fewer
    driver rounds — the returned ``rounds`` key is the envelope number
    (serial uses exactly n_merges rounds when the dictionary lasts)."""
    merges, state, rounds = _bpe_train_states_batched(
        spark, sf_dir, n_merges, batch_k=batch_k
    )
    stats = state.select(
        F.explode(F.split("s", " ")).alias("sym"), F.col("freq")
    ).agg(
        F.count_distinct("sym").alias("vocab"),
        F.sum("freq").alias("total"),
    ).collect()[0]
    return {
        "merges": merges,
        "vocab_size": int(stats.vocab),
        "total_symbols": int(stats.total),
        "rounds": rounds,
    }


def bpe_train(
    spark: SparkSession, sf_dir: str, n_merges: int = 8
) -> dict:
    """Distributed BPE tokenizer training: greedily learn ``n_merges``
    merge rules over the corpus dictionary (Sennrich et al.'s algorithm,
    the vocabulary-induction step every *-BPE/wordpiece pipeline runs
    before training).

    Scale shape: the corpus collapses to (word, freq, symbol-string) rows
    once; every round then (1) counts adjacent symbol pairs with a
    map-side-combined aggregate weighted by freq, (2) takes the argmax
    with a deterministic (count desc, pair asc) tie-break, and (3) applies
    the merge as JVM literal-replace string ops on the doubled-delimiter
    form (greedy left-to-right non-overlapping, the reference semantics —
    see ``_merge_pair_expr``; this replaced a round-8-era Arrow UDF
    rewrite: same result, no Python in the loop). State is
    localCheckpoint'd per round so lineage stays flat across the driver
    loop. Pair counting and the merge rewrite are both dictionary-sized,
    corpus-size-independent work.

    Merge-budget envelope (measured round 10, BASELINE.md): ~0.18-0.31 s
    per round on sf0.1/local[32] — the per-round cost is the driver-loop
    scheduling floor, not data volume. A production 32k-merge vocabulary
    is therefore ~1.8 h of serial rounds; if that matters, the scale path
    is batching each round's top-k NON-OVERLAPPING pairs (no shared
    symbol between any two selected pairs — their rewrites commute, so
    greedy order is preserved) into one rewrite pass, cutting round count
    by roughly the batch factor at identical results.

    Returns {"merges": [(pair, count), ...], "vocab_size": int,
    "total_symbols": int} — merges in learned order.
    """
    merges, state = _bpe_train_states(spark, sf_dir, n_merges)
    stats = state.select(
        F.explode(F.split("s", " ")).alias("sym"), F.col("freq")
    ).agg(
        F.count_distinct("sym").alias("vocab"),
        F.sum("freq").alias("total"),  # one row per symbol slot x freq
    ).collect()[0]
    return {
        "merges": merges,
        "vocab_size": int(stats.vocab),
        "total_symbols": int(stats.total),
    }


# --- BPE apply/encode (round 9) ---------------------------------------------

BPE_ENCODE_MERGES = 6  # merges learned by the registered encode queries


def _bpe_sql_cte(n_merges: int) -> tuple[str, str]:
    """The DuckDB twin of ``_bpe_train_states``, UNROLLED: a CTE chain
    st0 -> st{n} where each round computes the weighted pair argmax with
    the same (count desc, pair asc) tie-break and applies the same
    doubled-delimiter literal replace. The COALESCE sentinel (an
    unmatchable two-symbol pattern built from chr(1)) keeps rounds total
    when the dictionary runs out of pairs — the Spark loop breaks, the SQL
    no-ops, final states agree. Returns (cte_text, final_state_name).

    Each ``st{r}`` is MATERIALIZED: it is referenced twice (by its
    round's pair count and by the next state), so DuckDB's default CTE
    inlining re-expands the whole chain per reference — measured ~6x
    PER ROUND (2.8 s at 6 rounds, 93 s at 9, hours at 12); forcing one
    materialization per round makes the chain linear (0.15 s at 12).
    """
    parts = [
        "w AS (SELECT unnest(regexp_split_to_array(lower(trim(text)),"
        " '\\s+')) AS word FROM documents)",
        "wf AS (SELECT word, COUNT(*) AS freq FROM w WHERE word <> ''"
        " GROUP BY word)",
        "st0 AS MATERIALIZED (SELECT word, freq, array_to_string(list_transform("
        "generate_series(1, length(word)), i -> substr(word, i, 1)), ' ')"
        " AS s FROM wf)",
    ]
    for r in range(n_merges):
        parts.append(
            f"p{r} AS (SELECT l[i] || ' ' || l[i+1] AS pair, SUM(freq) AS cnt"
            f" FROM (SELECT freq, str_split(s, ' ') AS l FROM st{r}) t,"
            f" unnest(generate_series(1, len(l) - 1)) u(i) GROUP BY 1)"
        )
        parts.append(
            f"b{r} AS (SELECT COALESCE((SELECT pair FROM p{r}"
            f" ORDER BY cnt DESC, pair LIMIT 1),"
            f" chr(1) || ' ' || chr(1)) AS pair)"
        )
        parts.append(
            f"st{r + 1} AS MATERIALIZED (SELECT word, freq, trim(regexp_replace("
            f"replace(' ' || replace(s, ' ', '  ') || ' ',"
            f" ' ' || str_split(pair, ' ')[1] || '  '"
            f" || str_split(pair, ' ')[2] || ' ',"
            f" ' ' || replace(pair, ' ', '') || ' '),"
            f" ' +', ' ', 'g')) AS s FROM st{r}, b{r})"
        )
    return ",\n    ".join(parts), f"st{n_merges}"


BPE_BATCHED_MERGES = 8


def _bpe_batched_oracle() -> str:
    ctes, _ = _bpe_sql_cte(BPE_BATCHED_MERGES)
    sel = "\nUNION ALL\n".join(
        f"(SELECT {r + 1} AS rank, pair, cnt FROM p{r}"
        f" ORDER BY cnt DESC, pair LIMIT 1)"
        for r in range(BPE_BATCHED_MERGES)
    )
    return f"""
    WITH {ctes}
    SELECT CAST(rank AS BIGINT) AS rank, pair, CAST(cnt AS BIGINT) AS cnt
    FROM ({sel})
    ORDER BY rank
    """


@_register("bpe_train_batched_merges", oracle=_bpe_batched_oracle())
def bpe_train_batched_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batched trainer's merge schedule as a registered query, held
    against the SERIAL trainer's unrolled SQL twin — the driver-verified
    form of the batching guarantee: the oracle runs one argmax per round
    (the serial schedule, rank = round), the Spark side runs the batched
    prefix rule (``_bpe_train_states_batched``), and the rows must agree
    pair-for-pair and count-for-count.  Exhausted rounds end the list in
    both engines (the oracle's per-round LIMIT 1 yields nothing once the
    dictionary runs dry; the batched loop breaks)."""
    merges, _, _ = _bpe_train_states_batched(spark, sf_dir, BPE_BATCHED_MERGES)
    rows = [(i + 1, p, c) for i, (p, c) in enumerate(merges)]
    return spark.createDataFrame(rows or [], "rank bigint, pair string, cnt bigint")


def _bpe_vocab(state: DataFrame) -> DataFrame:
    """(sym, token_id) id table of the final symbol vocabulary, ids dense
    by lexicographic symbol order. BOUNDED: the final vocabulary is the
    base alphabet plus at most one new symbol per merge (each merge
    creates exactly one type), so the global ranking window and the
    broadcast downstream are |alphabet|+n_merges rows at ANY corpus size.
    """
    syms = state.select(F.explode(F.split("s", " ")).alias("sym")).distinct()
    return syms.select(
        "sym",
        F.row_number().over(Window.orderBy("sym")).cast("bigint").alias("token_id"),
    )


def _bpe_encode_oracle(n_merges: int = BPE_ENCODE_MERGES) -> str:
    ctes, st_n = _bpe_sql_cte(n_merges)
    return f"""
    WITH {ctes},
    vocab AS (SELECT sym, ROW_NUMBER() OVER (ORDER BY sym) AS token_id
              FROM (SELECT DISTINCT sym FROM
                    (SELECT unnest(str_split(s, ' ')) AS sym FROM {st_n}))),
    dw AS (SELECT doc_id, u.word
           FROM documents d,
                unnest(regexp_split_to_array(lower(trim(d.text)), '\\s+'))
                  u(word)
           WHERE u.word <> ''),
    enc AS (SELECT dw.doc_id, unnest(str_split(st.s, ' ')) AS sym
            FROM dw JOIN {st_n} st ON st.word = dw.word),
    ids AS (SELECT doc_id, token_id FROM enc JOIN vocab USING (sym))
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bpe_tokens,
           CAST(SUM(token_id) AS BIGINT) AS token_id_sum,
           CAST(COUNT(DISTINCT token_id) AS BIGINT) AS n_distinct_tokens
    FROM ids GROUP BY doc_id ORDER BY doc_id
    """


@_register("corpus_bpe_encode", oracle=_bpe_encode_oracle())
def corpus_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a trained BPE merge table to tokenize the corpus into real
    token ids — the encode step that closes the tokenizer loop
    (corpus_bpe_pair_counts audits, bpe_train learns, THIS applies;
    bpe_encode_ids hands the id sequences to packing/export). Trains
    {BPE_ENCODE_MERGES} merges with the shared loop, assigns dense token
    ids over the final symbol vocabulary, and emits the per-doc encode
    summary (token count, id checksum, distinct types) — all-integer, so
    the DuckDB twin (the UNROLLED trainer, same argmax tie-break, same
    greedy rewrite) matches bit-for-bit.

    Scale shape: training cost is the dictionary loop (corpus-size-
    independent per round); encoding is corpus words joined to the
    dictionary's (word -> symbol string) — the ONE corpus-scale shuffle,
    keyed on word, text never wider than a word — then an explode to
    symbols and a broadcast join against the PROVABLY bounded id table
    (|alphabet| + n_merges rows, one new type per merge). Per-doc rollup
    is map-side combined.
    """
    _, state = _bpe_train_states(spark, sf_dir, BPE_ENCODE_MERGES)
    return _bpe_encode_summary(spark, sf_dir, state)


def _bpe_encode_summary(spark: SparkSession, sf_dir: str, state: DataFrame) -> DataFrame:
    """Shared encode tail: apply a trained (word, symbol-string) state to
    the corpus and roll up the per-doc (token count, id checksum,
    distinct types) summary — one corpus-scale word-keyed shuffle, one
    broadcast join against the provably bounded id table. The serial
    and batched trainers both feed this verbatim, so their encode rows
    can differ only if their final states do."""
    vocab = _bpe_vocab(state)
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.explode(lower_ws_tokens("text")).alias("word")
    ).filter(F.col("word") != "")
    enc = words.join(state.select("word", "s"), "word")
    toks = enc.select("doc_id", F.explode(F.split("s", " ")).alias("sym"))
    ids = toks.join(F.broadcast(vocab), "sym")
    return (
        ids.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_bpe_tokens"),
            F.sum("token_id").cast("bigint").alias("token_id_sum"),
            F.countDistinct("token_id").cast("bigint").alias("n_distinct_tokens"),
        )
        .orderBy("doc_id")
    )


BPE_ENCODE_BATCHED_MERGES = 12  # deeper than the serial encode's budget


@_register(
    "corpus_bpe_encode_batched",
    oracle=_bpe_encode_oracle(BPE_ENCODE_BATCHED_MERGES),
)
def corpus_bpe_encode_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BATCHED trainer pushed through the full encode chain at a
    deeper merge budget: train {BPE_ENCODE_BATCHED_MERGES} merges with
    ``_bpe_train_states_batched`` (several symbol-disjoint merges per
    round — the production schedule), then encode the corpus through the
    shared ``_bpe_encode_summary`` tail — while the oracle runs the
    SERIAL trainer UNROLLED in SQL (one argmax per round) to the same
    depth and encodes with it. A green row therefore proves end to end
    that batching changes the ROUND COUNT and nothing else: final symbol
    state, vocabulary ids, and every per-doc token/checksum row are
    bit-identical to serial training at 2x the registered serial encode
    query's depth (``corpus_bpe_encode`` at {BPE_ENCODE_MERGES} merges
    pins the serial twin; the merge-schedule equality itself is pinned by
    ``bpe_train_batched_merges`` and the hypothesis property gate).

    Scale shape: identical to corpus_bpe_encode — the trainer's rounds
    are dictionary-sized driver work (fewer of them here), the encode is
    the one word-keyed corpus shuffle plus a bounded broadcast.
    """
    _, state, _ = _bpe_train_states_batched(
        spark, sf_dir, BPE_ENCODE_BATCHED_MERGES
    )
    return _bpe_encode_summary(spark, sf_dir, state)


def _bpe_fertility_oracle() -> str:
    ctes, st_n = _bpe_sql_cte(BPE_ENCODE_MERGES)
    return f"""
    WITH {ctes},
    wtok AS (SELECT word, len(str_split(s, ' ')) AS n_syms FROM {st_n}),
    dw AS (SELECT d.lang, u.word
           FROM documents d,
                unnest(regexp_split_to_array(lower(trim(d.text)), '\\s+'))
                  u(word)
           WHERE u.word <> ''),
    j AS (SELECT lang, n_syms FROM dw JOIN wtok USING (word))
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(n_syms) AS BIGINT) AS n_bpe_tokens,
           ROUND(CAST(SUM(n_syms) AS DOUBLE) / COUNT(*), 6) AS fertility
    FROM j GROUP BY lang ORDER BY lang
    """


@_register("corpus_bpe_fertility", oracle=_bpe_fertility_oracle())
def corpus_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility from REAL encodings: BPE tokens per word by
    language under the trained {BPE_ENCODE_MERGES}-merge vocabulary —
    corpus_tokenizer_fertility's question answered with the actual learned
    tokenizer instead of the BPE-ish regex approximation (run both: the
    gap IS the approximation error). High fertility on a language means
    the merge table under-serves it.

    Scale shape: per-word token counts are a projection of the trained
    dictionary (dictionary-scale, no corpus text); the corpus contributes
    one word-keyed join of (lang, word) pairs, rolled up to |langs| rows
    map-side. Exact int64 sums; one double division per output row.
    """
    _, state = _bpe_train_states(spark, sf_dir, BPE_ENCODE_MERGES)
    wtok = state.select("word", F.size(F.split("s", " ")).alias("n_syms"))
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "lang", F.explode(lower_ws_tokens("text")).alias("word")
    ).filter(F.col("word") != "")
    j = words.join(wtok, "word")
    return (
        j.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum("n_syms").cast("bigint").alias("n_bpe_tokens"),
            F.round(
                F.try_divide(F.sum("n_syms").cast("double"), F.count("*")), 6
            ).alias("fertility"),
        )
        .orderBy("lang")
    )


def bpe_encode_ids(
    spark: SparkSession, sf_dir: str, n_merges: int = BPE_ENCODE_MERGES
) -> DataFrame:
    """Tokenize every document into its BPE id SEQUENCE (doc_id,
    token_ids array<bigint>, n_bpe_tokens) — the hand-off frame that feeds
    sequence packing and shard export with real token ids. Ids follow
    _bpe_vocab's dense lexicographic assignment; within a document, ids
    appear in reading order (words in order, symbols left-to-right within
    each word — pinned by positional sort keys, not by shuffle luck).
    """
    _, state = _bpe_train_states(spark, sf_dir, n_merges)
    vocab = _bpe_vocab(state)
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.posexplode(lower_ws_tokens("text")).alias("wpos", "word")
    ).filter(F.col("word") != "")
    enc = words.join(state.select("word", "s"), "word")
    syms = enc.select(
        "doc_id", "wpos", F.posexplode(F.split("s", " ")).alias("spos", "sym")
    )
    ids = syms.join(F.broadcast(vocab), "sym")
    per_doc = ids.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(F.struct("wpos", "spos", "token_id"))
        ).alias("ordered")
    )
    return per_doc.select(
        "doc_id",
        F.expr("transform(ordered, x -> x.token_id)").alias("token_ids"),
        F.size("ordered").cast("bigint").alias("n_bpe_tokens"),
    )


def export_jsonl_shards(spark: SparkSession, sf_dir: str, out: str) -> dict:
    """Materialize the cleaned train corpus as JSONL shards, one directory
    per packing bucket — the hand-off format tokenizer/training jobs
    consume (one shard per reader, records already in deterministic
    token-stream order).

    The record set and ordering ARE clean_survivor_packing's assignment
    (quality filter -> exact dedup -> train split -> packing): the export
    joins document bodies back to that skinny assignment by doc_id — the
    ONE place bodies enter a shuffle, and they arrive pre-pruned to
    survivors. Files are Spark's native JSONL writer partitioned by
    bucket; ordering inside a shard follows (tok_start) so a sequential
    reader sees the packed token stream.

    Returns shard stats: buckets, docs, tokens.
    """
    assign = clean_survivor_packing(spark, sf_dir)
    bodies = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    rows = (
        assign.join(bodies, "doc_id")
        .select("bucket", "tok_start", "seq_id", "doc_id", "doc_tokens",
                "text", "lang", "source")
        .repartition("bucket")
        .sortWithinPartitions("bucket", "tok_start")
    )
    rows.write.mode("overwrite").partitionBy("bucket").json(out)
    stats = assign.agg(
        F.count_distinct("bucket").alias("buckets"),
        F.count("*").alias("docs"),
        F.sum("doc_tokens").alias("tokens"),
    ).collect()[0]
    return {
        "output": out,
        "buckets": int(stats.buckets),
        "docs": int(stats.docs),
        "tokens": int(stats.tokens),
    }


@_register(
    "corpus_zipf_slope",
    oracle="""
    WITH w AS (
      SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS word
      FROM documents
    ),
    wf AS (SELECT word, COUNT(*) AS freq FROM w WHERE word <> '' GROUP BY word),
    ranked AS (
      SELECT ln(ROW_NUMBER() OVER (ORDER BY freq DESC, word)) AS x,
             ln(CAST(freq AS DOUBLE)) AS y
      FROM wf
    ),
    s AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS vocab,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) + 0 AS zipf_slope
    FROM s
    """,
)
def corpus_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit: least-squares slope of ln(frequency) against ln(rank)
    over the corpus vocabulary. Natural language sits near -1; a flat
    slope flags template/machine-generated text, a cliff flags a
    truncated vocabulary — a one-number corpus health check before
    tokenizer training.

    Shape: word counts are the usual map-side-combined shuffle to the
    dictionary; ranking is ONE window over (word, freq) pairs — the
    (freq desc, word) tie-break pins equal-frequency ranks identically in
    both engines — and the regression is a single 5-sum aggregate to one
    row. The closed-form slope (n*Sxy - Sx*Sy)/(n*Sxx - Sx^2) keeps both
    engines' arithmetic identical; ROUND(...,4) absorbs float sum-order
    noise.
    """
    wf = _word_freqs(spark, sf_dir)
    w = Window.orderBy(F.col("freq").desc(), "word")
    ranked = wf.select(
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
    )
    s = ranked.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        F.col("n").cast("bigint").alias("vocab"),
        (F.round(slope, 4) + F.lit(0.0)).alias("zipf_slope"),
    )


def _budget_curve_oracle() -> str:
    return f"""
    WITH lm AS ({_lm_oracle()}),
    toks AS (
      SELECT doc_id,
             len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS doc_tokens
      FROM documents
    ),
    ranked AS (
      SELECT lm.doc_id, t.doc_tokens,
             NTILE(10) OVER (ORDER BY lm.avg_nll, lm.doc_id) AS decile
      FROM lm JOIN toks t ON t.doc_id = lm.doc_id
    ),
    per AS (
      SELECT decile, COUNT(*) AS docs,
             CAST(SUM(doc_tokens) AS BIGINT) AS tokens
      FROM ranked GROUP BY decile
    )
    SELECT decile, docs, tokens,
           CAST(SUM(tokens) OVER (ORDER BY decile
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cum_tokens
    FROM per
    ORDER BY decile
    """


@_register("corpus_token_budget_curve", oracle=_budget_curve_oracle())
def corpus_token_budget_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-vs-budget curve: documents ranked best-first by unigram-LM
    score and cut into deciles, with cumulative token counts — the table
    that answers "if we keep only the cleanest X0% of the corpus, how
    many training tokens remain?" before committing to a filtering
    threshold (the CCNet-bucket decision, quantified in tokens).

    Shape: scoring is text_lm_score's two-pass broadcast-model plan;
    token counts ride the same narrow per-doc rows; the decile split is
    one global window over (score, doc_id) scalars — pre-reduced, the
    discipline the plan gates pin — and the cumulative sum runs over ten
    rows. The doc_id tie-break keeps decile boundaries bit-stable.
    """
    lm = text_lm_score(spark, sf_dir).select("doc_id", "avg_nll")
    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id", bpe_ish_token_count("text").alias("doc_tokens")
    )
    w = Window.orderBy("avg_nll", "doc_id")
    ranked = lm.join(toks, "doc_id").withColumn(
        "decile", F.ntile(10).over(w).cast("bigint")
    )
    per = ranked.groupBy("decile").agg(
        F.count("*").alias("docs"),
        F.sum("doc_tokens").cast("bigint").alias("tokens"),
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return per.select(
        "decile",
        "docs",
        "tokens",
        F.sum("tokens").over(wc).cast("bigint").alias("cum_tokens"),
    ).orderBy("decile")


def _vocab_growth_oracle() -> str:
    return """
    WITH w AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS word
      FROM documents
    ),
    first_use AS (
      SELECT word, MIN(doc_id) AS first_doc
      FROM w WHERE word <> '' GROUP BY word
    ),
    ord AS (
      SELECT doc_id, NTILE(10) OVER (ORDER BY doc_id) AS decile
      FROM (SELECT DISTINCT doc_id FROM documents)
    ),
    new_per AS (
      SELECT o.decile, COUNT(*) AS new_words
      FROM first_use f JOIN ord o ON o.doc_id = f.first_doc
      GROUP BY o.decile
    )
    SELECT d.decile,
           CAST(COALESCE(n.new_words, 0) AS BIGINT) AS new_words,
           CAST(SUM(COALESCE(n.new_words, 0)) OVER (
             ORDER BY d.decile ROWS UNBOUNDED PRECEDING
           ) AS BIGINT) AS vocab_size
    FROM (SELECT DISTINCT decile FROM ord) d
    LEFT JOIN new_per n ON n.decile = d.decile
    ORDER BY d.decile
    """


@_register("corpus_vocab_growth_curve", oracle=_vocab_growth_oracle())
def corpus_vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth: cumulative distinct-word count as the
    corpus is consumed in doc_id order, per corpus decile — a curve that
    keeps climbing steeply means the corpus still surfaces new
    vocabulary (keep crawling / grow the tokenizer vocab); a flat tail
    means coverage has saturated. The companion measurement to the Zipf
    slope.

    Shape: each word reduces to its FIRST-occurrence document (the usual
    map-side-combined dictionary shuffle — cumulative distinct counting
    without ever re-counting prefixes), deciles come from one window
    over the distinct doc_id list, and the curve is a ten-row cumsum.
    """
    wf = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(lower_ws_tokens("text")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id").distinct()
    w = Window.orderBy("doc_id")
    ords = docs.withColumn("decile", F.ntile(10).over(w).cast("bigint"))
    new_per = (
        wf.join(ords, wf.first_doc == ords.doc_id)
        .groupBy("decile")
        .agg(F.count("*").alias("new_words"))
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        ords.select("decile")
        .distinct()
        .join(new_per, "decile", "left")
        .select("decile", F.coalesce("new_words", F.lit(0)).cast("bigint").alias("new_words"))
        .withColumn("vocab_size", F.sum("new_words").over(wc).cast("bigint"))
        .orderBy("decile")
    )


# --- char-trigram language-model scoring (CCNet-style char LM) ---------------

TRI_VOCAB_SIZE = 512
TRI_OOV_PENALTY = 100

# Char trigrams over the lowercased trimmed text INCLUDING spaces — the
# standard char-LM featurization (word boundaries carry signal). The Spark
# expression guards length >= 3 the same way BIGRAM_EXPR guards size >= 2:
# Spark's sequence(1, 0) counts DOWN (fabricated trigrams / ANSI crash)
# where DuckDB's generate_series(1, 0) is empty.
_TRIGRAM_EXPR = (
    "CASE WHEN length(nt) >= 3 THEN"
    " transform(sequence(1, length(nt) - 2), i -> substring(nt, i, 3))"
    " ELSE array() END"
)


def _char_trigram_oracle() -> str:
    return f"""
    WITH t AS (
      SELECT doc_id, lower(trim(text)) AS nt FROM documents
      WHERE length(lower(trim(text))) >= 3
    ),
    g AS (
      SELECT doc_id, substr(nt, CAST(i AS INT), 3) AS tri
      FROM t, unnest(generate_series(1, length(nt) - 2)) u(i)
    ),
    vocab AS (
      SELECT tri AS v_tri, COUNT(*) AS c FROM g GROUP BY tri
      ORDER BY c DESC, tri LIMIT {TRI_VOCAB_SIZE}
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM g),
    sc AS (
      SELECT g.doc_id,
             CASE WHEN v.v_tri IS NULL THEN 1 ELSE 0 END AS oov,
             CASE WHEN v.v_tri IS NULL THEN
               CAST(ROUND(ln(CAST(tot.n AS DOUBLE) * {TRI_OOV_PENALTY})
                          * 1000000) AS BIGINT)
             ELSE
               CAST(ROUND(ln(CAST(tot.n AS DOUBLE) / v.c) * 1000000) AS BIGINT)
             END AS nll_mic
      FROM g LEFT JOIN vocab v ON v.v_tri = g.tri CROSS JOIN tot
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_trigrams,
           ROUND(SUM(oov) * 1.0 / COUNT(*), 6) AS oov_rate,
           ROUND(CAST(SUM(nll_mic) AS DOUBLE) / (COUNT(*) * 1000000.0), 6)
             AS avg_nll
    FROM sc GROUP BY doc_id ORDER BY doc_id
    """


@_register("text_char_trigram_nll", oracle=_char_trigram_oracle())
def text_char_trigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-trigram LM quality scoring — the character-level member of the
    CCNet-style filter family (text_lm_score is its word-unigram sibling;
    KenLM char models are the production analogue). Character LMs catch
    what word models can't: encoding mojibake, ransom-note casing, and
    non-linguistic character soup score high NLL even when every "word" is
    in-vocabulary.

    Two-pass broadcast-model shape (same as text_lm_score): pass 1 counts
    trigrams (one map-side-combined shuffle over trigram keys) and keeps
    the top-{TRI_VOCAB_SIZE} vocabulary with the deterministic
    (count DESC, trigram) tie-break; the fitted model broadcasts onto the
    trigram stream, so pass 2 is map-side scoring + one per-doc
    aggregation. Corpus bodies never shuffle.

    Float discipline: ln() is quantized to integer micro-units PER
    VOCABULARY ENTRY (|vocab|+1 trials, not |corpus-row| trials) — the
    same 1-ulp-exposure bound as the BM25 idf — and per-doc totals are
    exact int64 sums, so partition layout and engine agree bit-for-bit;
    the only float ops are the shared ln/round and two final divisions.
    """
    d = load_table(spark, sf_dir, "documents")
    nt = F.lower(F.trim(F.col("text")))
    tri = (
        d.select("doc_id", nt.alias("nt"))
        .filter(F.length("nt") >= 3)
        .select("doc_id", F.explode(F.expr(_TRIGRAM_EXPR)).alias("tri"))
    )
    vocab = (
        tri.groupBy("tri")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), "tri")
        .limit(TRI_VOCAB_SIZE)
        .withColumnRenamed("tri", "v_tri")
    )
    total = tri.agg(F.count("*").cast("bigint").alias("n"))
    oov = F.col("v_tri").isNull()
    nll_mic = (
        F.when(
            oov,
            F.round(
                F.log(F.col("n").cast("double") * TRI_OOV_PENALTY) * 1000000
            ),
        )
        .otherwise(
            F.round(F.log(F.col("n").cast("double") / F.col("c")) * 1000000)
        )
        .cast("bigint")
    )
    scored = (
        tri.join(F.broadcast(vocab), F.col("tri") == F.col("v_tri"), "left")
        .join(F.broadcast(total))
        .select("doc_id", oov.cast("int").alias("oov"), nll_mic.alias("nll_mic"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_trigrams"),
            F.round(F.sum("oov") * F.lit(1.0) / F.count("*"), 6).alias("oov_rate"),
            F.round(
                F.sum("nll_mic").cast("double") / (F.count("*") * 1000000.0), 6
            ).alias("avg_nll"),
        )
        .orderBy("doc_id")
    )


# --- cumulative quality-filter funnel -----------------------------------------

FUNNEL_MIN_TOKENS = 20
FUNNEL_MAX_TOKENS = 80
FUNNEL_MIN_AVG_TOKEN_LEN = 2.0
FUNNEL_MAX_AVG_TOKEN_LEN = 12.0
FUNNEL_STOPWORD_RE = "(^|\\s)(the|a|and|of|in|to)(\\s|$)"
FUNNEL_DUP_WINDOW = 3  # duplicated-trigram-window rule (see intra_doc op)

_FUNNEL_RULES = (
    "min_tokens",
    "max_tokens",
    "avg_token_len",
    "has_stopword",
    "no_dup_trigram_window",
)


def _funnel_oracle() -> str:
    w = FUNNEL_DUP_WINDOW
    steps = []
    for k, rule in enumerate(_FUNNEL_RULES, start=1):
        prev = "total" if k == 1 else f"r{k - 1}"
        steps.append(
            f"SELECT {k} AS step, '{rule}' AS rule, {prev} AS docs_in,"
            f" r{k} AS docs_remaining, {prev} - r{k} AS dropped,"
            f" CASE WHEN {prev} = 0 THEN NULL"
            f" ELSE ROUND(({prev} - r{k}) * 1.0 / {prev}, 6) END AS drop_rate"
            " FROM agg"
        )
    union = "\nUNION ALL\n".join(steps)
    return f"""
    WITH t AS (
      SELECT doc_id,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
             length(text) AS chars,
             len(regexp_extract_all(lower(text), '{FUNNEL_STOPWORD_RE}'))
               AS n_stop,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
      FROM documents
    ),
    win AS (
      SELECT doc_id, array_to_string(toks[i:i+{w - 1}], ' ') AS win
      FROM t, unnest(generate_series(1, len(toks) - {w - 1})) u(i)
      WHERE len(toks) >= {w}
    ),
    dup AS (
      SELECT doc_id,
             COUNT(*) - COUNT(DISTINCT win) AS dup_windows
      FROM win GROUP BY doc_id
    ),
    flags AS (
      SELECT t.doc_id,
             CASE WHEN t.n_tokens >= {FUNNEL_MIN_TOKENS} THEN 1 ELSE 0 END AS f1,
             CASE WHEN t.n_tokens <= {FUNNEL_MAX_TOKENS} THEN 1 ELSE 0 END AS f2,
             CASE WHEN t.chars * 1.0 / t.n_tokens
                       BETWEEN {FUNNEL_MIN_AVG_TOKEN_LEN}
                       AND {FUNNEL_MAX_AVG_TOKEN_LEN} THEN 1 ELSE 0 END AS f3,
             CASE WHEN t.n_stop >= 1 THEN 1 ELSE 0 END AS f4,
             CASE WHEN COALESCE(dup.dup_windows, 0) = 0 THEN 1 ELSE 0 END AS f5
      FROM t LEFT JOIN dup ON dup.doc_id = t.doc_id
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS total,
             CAST(SUM(f1) AS BIGINT) AS r1,
             CAST(SUM(f1 * f2) AS BIGINT) AS r2,
             CAST(SUM(f1 * f2 * f3) AS BIGINT) AS r3,
             CAST(SUM(f1 * f2 * f3 * f4) AS BIGINT) AS r4,
             CAST(SUM(f1 * f2 * f3 * f4 * f5) AS BIGINT) AS r5
      FROM flags
    )
    SELECT CAST(step AS BIGINT) AS step, rule,
           CAST(docs_in AS BIGINT) AS docs_in,
           CAST(docs_remaining AS BIGINT) AS docs_remaining,
           CAST(dropped AS BIGINT) AS dropped, drop_rate
    FROM ({union}) ORDER BY step
    """


@_register("corpus_filter_funnel", oracle=_funnel_oracle())
def corpus_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative quality-filter funnel: documents surviving each successive
    Gopher/C4-style rule (min/max length, mean word length, stopword
    presence, no duplicated trigram window), applied IN ORDER.

    corpus_quality_gate reports per-source pass rates for independent
    thresholds; the funnel is the other operational view — rule ORDER
    matters when each stage's cost is paid only by survivors, and the
    per-step drop rate is what you tune when a filter chain eats 40% of a
    crawl. Shape: one map pass computes the cheap flags; the duplicated-
    window flag joins a per-doc aggregate of the trigram-window stream
    (the ONE shuffle, map-side combined); the funnel itself is a single
    5-product aggregation folded to one row, exploded to 5 presentation
    rows via stack. At 100 TB: corpus-linear, bodies never shuffle,
    output is |rules| rows.
    """
    w = FUNNEL_DUP_WINDOW
    d = load_table(spark, sf_dir, "documents")
    toks = lower_ws_tokens("text")
    t = d.select(
        "doc_id",
        ws_token_count("text").alias("n_tokens"),
        F.length("text").alias("chars"),
        # F.lit(pattern), not an F.expr SQL literal: the SQL parser would
        # eat the \s escape and silently match nothing (0 stopwords).
        F.size(
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit(FUNNEL_STOPWORD_RE), F.lit(0)
            )
        ).alias("n_stop"),
        toks.alias("toks"),
    )
    win_expr = (
        f"CASE WHEN size(toks) >= {w} THEN"
        f" transform(sequence(1, size(toks) - {w - 1}),"
        f" i -> concat_ws(' ', slice(toks, i, {w})))"
        " ELSE array() END"
    )
    dup = (
        t.select("doc_id", F.explode(F.expr(win_expr)).alias("win"))
        .groupBy("doc_id", "win")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg((F.sum("c") - F.count("*")).alias("dup_windows"))
    )
    flags = t.join(dup, "doc_id", "left").select(
        (F.col("n_tokens") >= FUNNEL_MIN_TOKENS).cast("long").alias("f1"),
        (F.col("n_tokens") <= FUNNEL_MAX_TOKENS).cast("long").alias("f2"),
        (
            (F.col("chars") * 1.0 / F.col("n_tokens"))
            .between(FUNNEL_MIN_AVG_TOKEN_LEN, FUNNEL_MAX_AVG_TOKEN_LEN)
        )
        .cast("long")
        .alias("f3"),
        (F.col("n_stop") >= 1).cast("long").alias("f4"),
        (F.coalesce(F.col("dup_windows"), F.lit(0)) == 0).cast("long").alias("f5"),
    )
    agg = flags.agg(
        F.count("*").cast("bigint").alias("total"),
        F.sum("f1").cast("bigint").alias("r1"),
        F.sum(F.col("f1") * F.col("f2")).cast("bigint").alias("r2"),
        F.sum(F.col("f1") * F.col("f2") * F.col("f3")).cast("bigint").alias("r3"),
        F.sum(F.col("f1") * F.col("f2") * F.col("f3") * F.col("f4"))
        .cast("bigint")
        .alias("r4"),
        F.sum(
            F.col("f1") * F.col("f2") * F.col("f3") * F.col("f4") * F.col("f5")
        )
        .cast("bigint")
        .alias("r5"),
    )
    stack_args = []
    for k, rule in enumerate(_FUNNEL_RULES, start=1):
        prev = "total" if k == 1 else f"r{k - 1}"
        # CAST(... AS DOUBLE), not * 1.0: a 1.0 literal inside F.expr SQL
        # parses as DECIMAL(2,1) and the ratio comes out DECIMAL — a width
        # mismatch against the oracle's DOUBLE even when values agree.
        stack_args.append(
            f"CAST({k} AS BIGINT), '{rule}', {prev}, r{k}, {prev} - r{k},"
            f" CASE WHEN {prev} = 0 THEN NULL"
            f" ELSE ROUND(({prev} - r{k}) / CAST({prev} AS DOUBLE), 6) END"
        )
    return (
        agg.select(
            F.expr(
                f"stack({len(_FUNNEL_RULES)}, "
                + ", ".join(stack_args)
                + ") AS (step, rule, docs_in, docs_remaining, dropped, drop_rate)"
            )
        )
        .orderBy("step")
    )


# --- intra-document duplicated-window detection --------------------------------

REP_WINDOW = 3  # token-window width for the generation-loop detector


def _intra_doc_oracle() -> str:
    w = REP_WINDOW
    return f"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
      FROM documents
    ),
    win AS (
      SELECT doc_id, array_to_string(toks[i:i+{w - 1}], ' ') AS win
      FROM t, unnest(generate_series(1, len(toks) - {w - 1})) u(i)
      WHERE len(toks) >= {w}
    ),
    per AS (
      SELECT doc_id, win, COUNT(*) AS c FROM win GROUP BY doc_id, win
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_windows,
           CAST(COUNT(*) AS BIGINT) AS distinct_windows,
           ROUND(1.0 - COUNT(*) * 1.0 / SUM(c), 6) AS dup_window_frac,
           CAST(MAX(c) AS BIGINT) AS max_repeat
    FROM per GROUP BY doc_id ORDER BY doc_id
    """


@_register("text_intra_doc_repetition", oracle=_intra_doc_oracle())
def text_intra_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document duplicated-window detection: per document, how much of
    its own {REP_WINDOW}-token window stream repeats — the generation-loop
    / template-spam detector (a looping generator re-emits the same short
    window; a scraped template repeats its chrome inside one page).
    text_repetition_stats reports the TOP word/bigram share; this reports
    the full duplication mass (dup fraction + worst repeat count) over
    overlapping windows, which catches loops whose period is longer than a
    bigram.

    Shape: window explode is map-side; the (doc_id, window) count shuffle
    partially aggregates each document's repeats map-side (docs live in
    one input split, so the exchange carries ~distinct-windows-per-doc
    rows); the per-doc fold-up is doc-scale. Documents shorter than
    {REP_WINDOW} tokens have no window stream and are absent — the same
    convention as the shingle operators.
    """
    w = REP_WINDOW
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", lower_ws_tokens("text").alias("toks")).filter(
        F.size("toks") >= w
    )
    win_expr = (
        f"transform(sequence(1, size(toks) - {w - 1}),"
        f" i -> concat_ws(' ', slice(toks, i, {w})))"
    )
    per = (
        t.select("doc_id", F.explode(F.expr(win_expr)).alias("win"))
        .groupBy("doc_id", "win")
        .agg(F.count("*").alias("c"))
    )
    return (
        per.groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_windows"),
            F.count("*").cast("bigint").alias("distinct_windows"),
            F.round(1.0 - F.count("*") * F.lit(1.0) / F.sum("c"), 6).alias(
                "dup_window_frac"
            ),
            F.max("c").cast("bigint").alias("max_repeat"),
        )
        .orderBy("doc_id")
    )


# --- readability scoring -------------------------------------------------------


@_register(
    "text_readability",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n_words,
             len(regexp_extract_all(text, '[.!?]+')) AS n_sentences,
             len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syllables
      FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
    )
    SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
           CAST(n_sentences AS BIGINT) AS n_sentences,
           CAST(n_syllables AS BIGINT) AS n_syllables,
           ROUND(0.39 * (n_words * 1.0 / NULLIF(n_sentences, 0))
                 + 11.8 * (n_syllables * 1.0 / NULLIF(n_words, 0))
                 - 15.59, 4) + 0 AS fk_grade
    FROM t ORDER BY doc_id
    """,
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-Kincaid-style readability grade per document — the curation
    signal for audience-level filtering and curriculum ordering (simple
    text first, dense text later). Syllables use the standard cheap
    approximation (runs of vowels incl. y), sentences are terminal-
    punctuation runs; both are regexp counts, so the whole operator is a
    map-only projection that scans at parquet speed at any corpus size.

    A document with no sentence terminator (or no words) yields NULL
    grade rather than a fabricated score — NULLIF in both engines. The
    grade arithmetic runs on exact-integer-valued doubles, so the 4dp
    round agrees cross-engine bit-for-bit.
    """
    d = load_table(spark, sf_dir, "documents")
    t = d.filter(
        F.col("text").isNotNull() & (F.trim("text") != "")
    ).select(
        "doc_id",
        ws_token_count("text").cast("bigint").alias("n_words"),
        F.regexp_count(F.col("text"), F.lit(r"[.!?]+")).cast("bigint").alias(
            "n_sentences"
        ),
        F.regexp_count(F.lower("text"), F.lit("[aeiouy]+"))
        .cast("bigint")
        .alias("n_syllables"),
    )
    grade = (
        F.lit(0.39)
        * (F.col("n_words") * F.lit(1.0) / F.nullif("n_sentences", F.lit(0)))
        + F.lit(11.8)
        * (F.col("n_syllables") * F.lit(1.0) / F.nullif("n_words", F.lit(0)))
        - F.lit(15.59)
    )
    return t.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        (F.round(grade, 4) + F.lit(0.0)).alias("fk_grade"),
    ).orderBy("doc_id")


# --- code-vs-prose heuristic classifier ----------------------------------------

CODE_SYMBOL_CLASS = r"[{}()\[\];=<>|&+*/%#@\\]"
CODE_SCORE_THRESHOLD = 0.05


@_register(
    "text_code_prose_classify",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, length(text) AS n_chars,
             len(regexp_extract_all(text, '{CODE_SYMBOL_CLASS.replace("'", "''")}')) AS n_symbols,
             len(regexp_extract_all(text, ';')) AS n_semicolons,
             len(regexp_extract_all(text, '\\n[ \\t]')) AS n_indent_breaks
      FROM documents WHERE text IS NOT NULL AND length(text) > 0
    )
    SELECT doc_id,
           ROUND(n_symbols * 1.0 / n_chars, 6) AS symbol_ratio,
           ROUND(n_semicolons * 1.0 / n_chars, 6) AS semicolon_ratio,
           CAST(n_indent_breaks AS BIGINT) AS n_indent_breaks,
           ROUND(n_symbols * 1.0 / n_chars
                 + 2.0 * (n_semicolons * 1.0 / n_chars), 6) AS code_score,
           (ROUND(n_symbols * 1.0 / n_chars
                  + 2.0 * (n_semicolons * 1.0 / n_chars), 6)
            >= {CODE_SCORE_THRESHOLD}) AS is_code
    FROM t ORDER BY doc_id
    """,
)
def text_code_prose_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic code-vs-prose detector: symbol density, semicolon density
    and indented-line breaks — the cheap first-pass router that decides
    whether a document flows to the code pipeline (different tokenizer,
    different quality rules, no stopword filtering) or the prose one.
    Real pipelines put a learned classifier here; the feature extraction —
    the part that has to stream 100 TB — is exactly this map-only
    projection, and the linear score over the features is where a trained
    weight vector would drop in.

    The classification decides on the ROUNDED score so the boolean agrees
    cross-engine even when a raw ratio lands on a rounding boundary.
    """
    d = load_table(spark, sf_dir, "documents")
    t = d.filter(F.col("text").isNotNull() & (F.length("text") > 0)).select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.regexp_count(F.col("text"), F.lit(CODE_SYMBOL_CLASS)).alias("n_symbols"),
        F.regexp_count(F.col("text"), F.lit(";")).alias("n_semicolons"),
        F.regexp_count(F.col("text"), F.lit("\n[ \t]"))
        .cast("bigint")
        .alias("n_indent_breaks"),
    )
    score = F.round(
        F.col("n_symbols") * F.lit(1.0) / F.col("n_chars")
        + F.lit(2.0) * (F.col("n_semicolons") * F.lit(1.0) / F.col("n_chars")),
        6,
    )
    return t.select(
        "doc_id",
        F.round(F.col("n_symbols") * F.lit(1.0) / F.col("n_chars"), 6).alias(
            "symbol_ratio"
        ),
        F.round(F.col("n_semicolons") * F.lit(1.0) / F.col("n_chars"), 6).alias(
            "semicolon_ratio"
        ),
        "n_indent_breaks",
        score.alias("code_score"),
        (score >= F.lit(CODE_SCORE_THRESHOLD)).alias("is_code"),
    ).orderBy("doc_id")


# --- deterministic train/valid/test split --------------------------------------

SPLIT_SALT = "split"
SPLIT_TRAIN_PCT = 80
SPLIT_VALID_PCT = 10  # test gets the remainder


@_register(
    "corpus_train_eval_split",
    oracle=f"""
    WITH t AS (
      SELECT source,
             len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tokens,
             {hash60_sql("CAST(doc_id AS VARCHAR)", salt=SPLIT_SALT)} % 100 AS bucket
      FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
    ),
    s AS (
      SELECT source,
             CASE WHEN bucket < {SPLIT_TRAIN_PCT} THEN 'train'
                  WHEN bucket < {SPLIT_TRAIN_PCT + SPLIT_VALID_PCT} THEN 'valid'
                  ELSE 'test' END AS split,
             n_tokens
      FROM t
    )
    SELECT source, split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           ROUND(COUNT(*) * 1.0 /
                 SUM(COUNT(*)) OVER (PARTITION BY source), 6) AS frac_of_source
    FROM s GROUP BY source, split
    ORDER BY source, split
    """,
)
def corpus_train_eval_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/valid/test assignment: a salted 60-bit hash of the
    document id buckets every doc into 100 cells, 80/10/10. Hash-based
    splitting is THE correct primitive at scale — it is stable under
    re-partitioning, re-ingestion and incremental appends (a doc's split
    never changes when the corpus around it does), needs no global sort or
    random state, and is replayable by any engine that shares the hash.
    The report is the per-source audit: split sizes in docs and tokens and
    each split's realized fraction (hash splits are only asymptotically
    80/10/10 — per-source skew on small sources is exactly what this
    surface makes visible).

    Map-only assignment + one |sources|x3-group aggregation: nothing
    corpus-scale ever shuffles.
    """
    d = load_table(spark, sf_dir, "documents")
    t = d.filter(
        F.col("text").isNotNull() & (F.trim("text") != "")
    ).select(
        "source",
        ws_token_count("text").alias("n_tokens"),
        (
            hash60(F.col("doc_id").cast("string"), salt=SPLIT_SALT) % 100
        ).alias("bucket"),
    )
    s = t.select(
        "source",
        "n_tokens",
        F.when(F.col("bucket") < SPLIT_TRAIN_PCT, "train")
        .when(F.col("bucket") < SPLIT_TRAIN_PCT + SPLIT_VALID_PCT, "valid")
        .otherwise("test")
        .alias("split"),
    )
    w = Window.partitionBy("source")
    agg = s.groupBy("source", "split").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
    )
    return agg.select(
        "source",
        "split",
        "n_docs",
        "n_tokens",
        F.round(
            F.col("n_docs") * F.lit(1.0) / F.sum("n_docs").over(w), 6
        ).alias("frac_of_source"),
    ).orderBy("source", "split")


# --- encoding-artifact (mojibake) detection ------------------------------------

ENC_CONTROL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f]"
ENC_MOJIBAKE_RE = "(Ã.|â€.|Â.)"
ENC_ARTIFACT_THRESHOLD = 0.001


@_register(
    "text_encoding_artifacts",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, length(text) AS n_chars,
             len(regexp_extract_all(text, '�')) AS n_replacement,
             len(regexp_extract_all(text, '{ENC_CONTROL_RE}')) AS n_control,
             len(regexp_extract_all(text, '{ENC_MOJIBAKE_RE}')) AS n_mojibake
      FROM documents WHERE text IS NOT NULL AND length(text) > 0
    )
    SELECT doc_id,
           CAST(n_replacement AS BIGINT) AS n_replacement,
           CAST(n_control AS BIGINT) AS n_control,
           CAST(n_mojibake AS BIGINT) AS n_mojibake,
           ROUND((3 * n_replacement + 2 * n_control + 2 * n_mojibake) * 1.0
                 / n_chars, 6) AS artifact_score,
           (n_replacement > 0 OR
            ROUND((3 * n_replacement + 2 * n_control + 2 * n_mojibake) * 1.0
                  / n_chars, 6) >= {ENC_ARTIFACT_THRESHOLD}) AS is_suspect
    FROM t ORDER BY doc_id
    """,
)
def text_encoding_artifacts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level corruption detector: U+FFFD replacement characters
    (decoder already gave up), C0 control characters (binary bleed,
    terminal escapes), and the classic UTF-8-decoded-as-Latin-1 mojibake
    digraphs (Ã., â€., Â.). The complement of text_char_trigram_nll: the
    trigram model scores STATISTICAL weirdness, this catches the
    MECHANICAL corruption classes that are individually rare enough to
    slip a smoothed LM but are hard evidence of a broken ingest path —
    one replacement char alone marks the doc suspect regardless of score.

    Map-only regexp-count projection; the weighted score is a ratio of
    exact integers rounded at 6dp, and the suspect flag decides on the
    ROUNDED score, so both engines agree at the boundary.
    """
    d = load_table(spark, sf_dir, "documents")
    t = d.filter(F.col("text").isNotNull() & (F.length("text") > 0)).select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.regexp_count(F.col("text"), F.lit("�"))
        .cast("bigint")
        .alias("n_replacement"),
        F.regexp_count(F.col("text"), F.lit(ENC_CONTROL_RE))
        .cast("bigint")
        .alias("n_control"),
        F.regexp_count(F.col("text"), F.lit(ENC_MOJIBAKE_RE))
        .cast("bigint")
        .alias("n_mojibake"),
    )
    score = F.round(
        (
            3 * F.col("n_replacement")
            + 2 * F.col("n_control")
            + 2 * F.col("n_mojibake")
        )
        * F.lit(1.0)
        / F.col("n_chars"),
        6,
    )
    return t.select(
        "doc_id",
        "n_replacement",
        "n_control",
        "n_mojibake",
        score.alias("artifact_score"),
        (
            (F.col("n_replacement") > 0)
            | (score >= F.lit(ENC_ARTIFACT_THRESHOLD))
        ).alias("is_suspect"),
    ).orderBy("doc_id")


# --- per-source PII prevalence -------------------------------------------------


@_register(
    "corpus_pii_prevalence",
    oracle=f"""
    WITH t AS (
      SELECT source,
             len(regexp_extract_all(text, '{PII_EMAIL}')) AS n_email,
             len(regexp_extract_all(text, '{PII_PHONE}')) AS n_phone,
             len(regexp_extract_all(text, '{PII_URL}')) AS n_url
      FROM documents WHERE text IS NOT NULL
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_email) AS BIGINT) AS emails,
           CAST(SUM(n_phone) AS BIGINT) AS phones,
           CAST(SUM(n_url) AS BIGINT) AS urls,
           CAST(SUM(CASE WHEN n_email + n_phone + n_url > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS docs_with_pii,
           ROUND(SUM(CASE WHEN n_email + n_phone + n_url > 0 THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*), 6) AS pii_doc_rate
    FROM t GROUP BY source ORDER BY source
    """,
)
def corpus_pii_prevalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII prevalence: email / phone / URL hit counts and the
    fraction of documents carrying at least one hit — the governance
    surface that decides WHERE pii_redact must run and which sources need
    a human look before release. pii_redact transforms documents; this
    aggregates exposure, and running it BEFORE and AFTER a redaction pass
    is the verification that the scrub actually converged to zero.

    Same dual-engine-safe pattern set as pii_redact (syntax common to
    Java regex and RE2). Map-only regexp counts folding into a
    |sources|-bounded rollup — nothing corpus-scale shuffles.
    """
    d = load_table(spark, sf_dir, "documents")
    t = d.filter(F.col("text").isNotNull()).select(
        "source",
        F.regexp_count(F.col("text"), F.lit(PII_EMAIL)).alias("n_email"),
        F.regexp_count(F.col("text"), F.lit(PII_PHONE)).alias("n_phone"),
        F.regexp_count(F.col("text"), F.lit(PII_URL)).alias("n_url"),
    )
    has_pii = F.when(
        F.col("n_email") + F.col("n_phone") + F.col("n_url") > 0, 1
    ).otherwise(0)
    return (
        t.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_email").cast("bigint").alias("emails"),
            F.sum("n_phone").cast("bigint").alias("phones"),
            F.sum("n_url").cast("bigint").alias("urls"),
            F.sum(has_pii).cast("bigint").alias("docs_with_pii"),
            F.round(F.sum(has_pii) * F.lit(1.0) / F.count("*"), 6).alias(
                "pii_doc_rate"
            ),
        )
        .orderBy("source")
    )


# --- context-window token-budget report ----------------------------------------

CONTEXT_BUDGETS = (64, 128, 256, 512)


def _context_budget_oracle() -> str:
    rows = []
    for c in CONTEXT_BUDGETS:
        rows.append(f"""
      SELECT {c} AS context_len,
             CAST(SUM(CASE WHEN n_tokens > {c} THEN 1 ELSE 0 END) AS BIGINT)
               AS docs_truncated,
             CAST(SUM(LEAST(n_tokens, {c})) AS BIGINT) AS tokens_kept,
             CAST(SUM(GREATEST(n_tokens - {c}, 0)) AS BIGINT) AS tokens_lost,
             ROUND(SUM(GREATEST(n_tokens - {c}, 0)) * 1.0 / SUM(n_tokens), 6)
               AS lost_frac
      FROM t"""
        )
    union = "\nUNION ALL\n".join(rows)
    return f"""
    WITH t AS (
      SELECT len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tokens
      FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
    )
    {union}
    ORDER BY context_len
    """


@_register("corpus_context_budget_report", oracle=_context_budget_oracle())
def corpus_context_budget_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much of the corpus a context window actually captures: for each
    candidate training context length, the documents that would truncate,
    the token mass kept vs lost, and the lost fraction. This is the curve
    a pretraining config review reads when choosing sequence length (and
    whether documents_chunking must run first): context length trades
    attention cost against exactly this truncation loss, per corpus.

    Shape: ONE corpus pass computes every budget's sums as parallel
    conditional aggregates folded into a single row (the
    corpus_filter_funnel pattern); the |budgets| presentation rows explode
    from that row — no per-budget scans, no cross join, nothing
    corpus-scale after the aggregate.
    """
    d = load_table(spark, sf_dir, "documents")
    t = d.filter(
        F.col("text").isNotNull() & (F.trim("text") != "")
    ).select(ws_token_count("text").alias("n_tokens"))
    aggs = [F.sum("n_tokens").alias("total")]
    for c in CONTEXT_BUDGETS:
        aggs += [
            F.sum(F.when(F.col("n_tokens") > c, 1).otherwise(0)).alias(f"d{c}"),
            F.sum(F.least(F.col("n_tokens"), F.lit(c))).alias(f"k{c}"),
            F.sum(F.greatest(F.col("n_tokens") - c, F.lit(0))).alias(f"l{c}"),
        ]
    one = t.groupBy().agg(*aggs)
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).cast("int").alias("context_len"),
                    F.col(f"d{c}").cast("bigint").alias("docs_truncated"),
                    F.col(f"k{c}").cast("bigint").alias("tokens_kept"),
                    F.col(f"l{c}").cast("bigint").alias("tokens_lost"),
                    F.round(F.col(f"l{c}") * F.lit(1.0) / F.col("total"), 6).alias(
                        "lost_frac"
                    ),
                )
                for c in CONTEXT_BUDGETS
            ]
        )
    ).alias("r")
    return (
        one.select(rows)
        .select("r.*")
        .orderBy("context_len")
    )


# --- vocabulary coverage / OOV audit -------------------------------------------

OOV_VOCAB_SIZE = 1000


def _oov_oracle() -> str:
    split = hash60_sql("CAST(doc_id AS VARCHAR)", salt=SPLIT_SALT)
    return f"""
    WITH t AS (
      SELECT doc_id, source,
             {split} % 100 < {SPLIT_TRAIN_PCT} AS is_train,
             unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
      FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
    ),
    vocab AS (
      SELECT tok FROM (
        SELECT tok, COUNT(*) AS c FROM t WHERE is_train GROUP BY tok
      ) ORDER BY c DESC, tok ASC LIMIT {OOV_VOCAB_SIZE}
    ),
    test AS (SELECT source, tok FROM t WHERE NOT is_train)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS oov_tokens,
           ROUND(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) AS oov_rate
    FROM test e LEFT JOIN vocab v ON e.tok = v.tok
    GROUP BY source ORDER BY source
    """


@_register("corpus_oov_rate", oracle=_oov_oracle())
def corpus_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-coverage audit: the token-level out-of-vocabulary rate of
    each source's held-out split against a top-{OOV_VOCAB_SIZE} vocabulary
    built from the TRAIN split (same salted hash split as the train/eval
    assignment, so there is no leakage in the measurement itself). The
    tokenizer-health twin of corpus_tokenizer_fertility: fertility says
    how many pieces a tokenizer yields, this says how much of unseen data
    a frequency-built vocabulary covers at all — a source with an
    outlier OOV rate is in a domain/script the vocabulary build never
    saw, and is the first place a byte-fallback or vocab-size bump shows
    its value.

    Shape: train token counts are a map-side-combined groupBy over the
    token stream; the top-V cut is a distributed TakeOrdered (count DESC,
    token ASC — deterministic at the boundary), broadcast back as a
    V-row build side; the test stream then left-joins it map-only and
    folds into a |sources|-bounded rollup. No global window anywhere.
    """
    d = load_table(spark, sf_dir, "documents")
    is_train = (
        hash60(F.col("doc_id").cast("string"), salt=SPLIT_SALT) % 100
        < SPLIT_TRAIN_PCT
    )
    t = d.filter(
        F.col("text").isNotNull() & (F.trim("text") != "")
    ).select(
        "source",
        is_train.alias("is_train"),
        F.explode(lower_ws_tokens("text")).alias("tok"),
    )
    vocab = (
        t.filter(F.col("is_train"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), F.col("tok").asc())
        .limit(OOV_VOCAB_SIZE)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    test = t.filter(~F.col("is_train")).select("source", "tok")
    j = test.join(F.broadcast(vocab), "tok", "left")
    oov = F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
    return (
        j.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum(oov).cast("bigint").alias("oov_tokens"),
            F.round(F.sum(oov) * F.lit(1.0) / F.count("*"), 6).alias("oov_rate"),
        )
        .orderBy("source")
    )


# --- batch quality-verdict core (shared with the streaming screen) -------------


def quality_verdicts(d) -> "DataFrame":
    """One map-only projection routing documents at ingest: the text_quality
    bucket features and the text_encoding_artifacts corruption counts fused
    into a single pass, collapsed to a verdict —

    - ``drop``:   poor-quality bucket OR any U+FFFD replacement char
    - ``review``: fair bucket, or artifact score at/over threshold
    - ``keep``:   good bucket, artifact-clean

    This is the standing decision the curation queue applies to every
    arriving document; the streaming wrapper
    (streaming.events.run_stream_quality_screen) runs exactly this frame
    per micro-batch, so batch backfills and the live stream CANNOT
    disagree on a verdict.
    """
    chars = F.length("text")
    n_tokens = ws_token_count("text")
    n_punct = F.size(
        F.regexp_extract_all(F.col("text"), F.lit("[^A-Za-z0-9\\s]"), F.lit(0))
    )
    bucket = (
        F.when(
            (n_tokens >= 50) & (F.try_divide(n_punct.cast("double"), chars) < 0.05),
            "good",
        )
        .when(n_tokens >= 20, "fair")
        .otherwise("poor")
    )
    n_repl = F.regexp_count(F.col("text"), F.lit("\ufffd"))
    n_ctrl = F.regexp_count(F.col("text"), F.lit(ENC_CONTROL_RE))
    n_moji = F.regexp_count(F.col("text"), F.lit(ENC_MOJIBAKE_RE))
    art_score = F.round(
        (3 * n_repl + 2 * n_ctrl + 2 * n_moji) * F.lit(1.0) / chars, 6
    )
    suspect = (n_repl > 0) | (art_score >= F.lit(ENC_ARTIFACT_THRESHOLD))
    t = d.filter(F.col("text").isNotNull() & (F.length("text") > 0)).select(
        "doc_id",
        "source",
        bucket.alias("quality_bucket"),
        suspect.alias("artifact_suspect"),
        n_repl.cast("bigint").alias("n_replacement"),
    )
    route = (
        F.when((F.col("quality_bucket") == "poor") | (F.col("n_replacement") > 0), "drop")
        .when((F.col("quality_bucket") == "fair") | F.col("artifact_suspect"), "review")
        .otherwise("keep")
    )
    return t.select(
        "doc_id", "source", "quality_bucket", "artifact_suspect", route.alias("route")
    )


# --- token coverage curve ------------------------------------------------------

COVERAGE_VOCAB_SIZES = (10, 100, 1000)


def _coverage_oracle() -> str:
    rows = []
    for v in COVERAGE_VOCAB_SIZES:
        rows.append(f"""
      SELECT {v} AS vocab_size,
             CAST(SUM(CASE WHEN rnk <= {v} THEN c ELSE 0 END) AS BIGINT)
               AS tokens_covered,
             CAST(SUM(c) AS BIGINT) AS tokens_total,
             ROUND(SUM(CASE WHEN rnk <= {v} THEN c ELSE 0 END) * 1.0
                   / SUM(c), 6) AS coverage
      FROM ranked"""
        )
    union = "\nUNION ALL\n".join(rows)
    return f"""
    WITH toks AS (
      SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
      FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
    ),
    cnt AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
    ranked AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, tok ASC) AS rnk
               FROM cnt)
    {union}
    ORDER BY vocab_size
    """


@_register("corpus_token_coverage_curve", oracle=_coverage_oracle())
def corpus_token_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What fraction of the corpus token MASS the top-V most frequent types
    cover, for a ladder of vocabulary sizes — the coverage side of the
    vocabulary-size decision (corpus_zipf_slope fits the law, corpus_oov_rate
    measures held-out misses, this reads the realized cumulative curve:
    coverage(1000) = 0.98 says a tiny vocab + byte fallback already covers
    almost everything; a flat curve says the corpus is type-diverse and
    needs the vocab budget).

    Shape: token counting is the corpus-scale map-side-combined groupBy the
    Zipf/Heaps family already pays; the ranking window runs over the TYPE
    space (vocabulary-scale, orders of magnitude below corpus-scale — the
    same single-partition exposure corpus_zipf_slope accepts and documents),
    and the |ladder| presentation rows fold from one conditional aggregate.
    The rank tie-break is (count DESC, token ASC) in both engines, so the
    boundary type at each V is identical.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.filter(
        F.col("text").isNotNull() & (F.trim("text") != "")
    ).select(F.explode(lower_ws_tokens("text")).alias("tok"))
    cnt = toks.groupBy("tok").agg(F.count("*").alias("c"))
    w = Window.orderBy(F.col("c").desc(), F.col("tok").asc())
    ranked = cnt.select("c", F.row_number().over(w).alias("rnk"))
    aggs = [F.sum("c").alias("total")]
    for v in COVERAGE_VOCAB_SIZES:
        aggs.append(
            F.sum(F.when(F.col("rnk") <= v, F.col("c")).otherwise(0)).alias(f"k{v}")
        )
    one = ranked.groupBy().agg(*aggs)
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(v).cast("int").alias("vocab_size"),
                    F.col(f"k{v}").cast("bigint").alias("tokens_covered"),
                    F.col("total").cast("bigint").alias("tokens_total"),
                    F.round(F.col(f"k{v}") * F.lit(1.0) / F.col("total"), 6).alias(
                        "coverage"
                    ),
                )
                for v in COVERAGE_VOCAB_SIZES
            ]
        )
    ).alias("r")
    return one.select(rows).select("r.*").orderBy("vocab_size")


# --- curriculum ordering -------------------------------------------------------

CURRICULUM_SALT = "curriculum"
CURRICULUM_STAGE_BOUNDS = (4.0, 7.0)  # difficulty < b0 -> 0, < b1 -> 1, else 2


@_register(
    "corpus_curriculum_order",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n_words,
             len(regexp_extract_all(text, '[.!?]+')) AS n_sentences,
             len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syllables
      FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
    ),
    g AS (
      SELECT doc_id, n_words,
             ROUND(0.39 * (n_words * 1.0 / NULLIF(n_sentences, 0))
                   + 11.8 * (n_syllables * 1.0 / NULLIF(n_words, 0))
                   - 15.59, 4) AS fk
      FROM t
    ),
    s AS (
      SELECT doc_id,
             ROUND(0.6 * COALESCE(fk, 12.0) + 0.4 * (n_words / 10.0), 4) + 0
               AS difficulty,
             {hash60_sql("CAST(doc_id AS VARCHAR)", salt=CURRICULUM_SALT)}
               AS order_key
      FROM g
    )
    SELECT doc_id, difficulty,
           CAST(CASE WHEN difficulty < {CURRICULUM_STAGE_BOUNDS[0]} THEN 0
                     WHEN difficulty < {CURRICULUM_STAGE_BOUNDS[1]} THEN 1
                     ELSE 2 END AS INT) AS stage,
           order_key
    FROM s
    ORDER BY stage, order_key, doc_id
    """,
)
def corpus_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum assignment: a difficulty score (readability grade blended
    with length) buckets every document into FIXED-threshold stages, and a
    salted hash gives each stage a deterministic internal shuffle — the
    standard easy-first curriculum shape (stages advance, order within a
    stage is randomized but replayable). Threshold stages rather than
    quantile stages on purpose: quantiles need a global sort/percentile
    pass and RE-ASSIGN stages whenever the corpus grows, while fixed
    cut-points keep assignment map-only, append-stable, and identical
    across engines; the stage histogram (reading this output grouped by
    stage) is how the thresholds get re-tuned per corpus.

    Wholly map-only per document; the trailing ORDER BY is presentational
    (a distributed range sort) — a training loader consumes
    (stage, order_key) as its sort key directly.
    """
    d = load_table(spark, sf_dir, "documents")
    t = d.filter(
        F.col("text").isNotNull() & (F.trim("text") != "")
    ).select(
        "doc_id",
        ws_token_count("text").alias("n_words"),
        F.regexp_count(F.col("text"), F.lit(r"[.!?]+")).alias("n_sentences"),
        F.regexp_count(F.lower("text"), F.lit("[aeiouy]+")).alias("n_syllables"),
    )
    fk = F.round(
        F.lit(0.39) * (F.col("n_words") * F.lit(1.0) / F.nullif("n_sentences", F.lit(0)))
        + F.lit(11.8) * (F.col("n_syllables") * F.lit(1.0) / F.nullif("n_words", F.lit(0)))
        - F.lit(15.59),
        4,
    )
    difficulty = F.round(
        F.lit(0.6) * F.coalesce(fk, F.lit(12.0))
        + F.lit(0.4) * (F.col("n_words") / F.lit(10.0)),
        4,
    ) + F.lit(0.0)
    stage = (
        F.when(difficulty < CURRICULUM_STAGE_BOUNDS[0], 0)
        .when(difficulty < CURRICULUM_STAGE_BOUNDS[1], 1)
        .otherwise(2)
        .cast("int")
    )
    return t.select(
        "doc_id",
        difficulty.alias("difficulty"),
        stage.alias("stage"),
        hash60(F.col("doc_id").cast("string"), salt=CURRICULUM_SALT).alias(
            "order_key"
        ),
    ).orderBy("stage", "order_key", "doc_id")


# Hashed feature space for the bag-of-hashed-ngrams models (DSIR importance
# weights, Naive-Bayes quality classifier). 512 buckets keeps the broadcast
# model table trivially small; the paper-scale setting (10k) changes only
# this constant — per-bucket statistics are B-bounded at any corpus size.
FEAT_BUCKETS = 512


def _dsir_oracle() -> str:
    b = FEAT_BUCKETS
    return f"""
    WITH w AS (
      SELECT doc_id,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_t,
             {hash60_sql('word')} % {b} AS bucket
      FROM (SELECT doc_id, lang,
                   unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS word
            FROM documents)
    ),
    bs AS (
      SELECT bucket, COUNT(*) AS cnt_r, SUM(is_t) AS cnt_t
      FROM w GROUP BY bucket
    ),
    tot AS (
      SELECT SUM(cnt_r) AS t_r, SUM(cnt_t) AS t_t FROM bs
    ),
    lr AS (
      SELECT bucket,
             CAST(ROUND((ln(CAST(cnt_t + 1 AS DOUBLE) / (t_t + {b}))
                         - ln(CAST(cnt_r + 1 AS DOUBLE) / (t_r + {b})))
                        * 1000000) AS BIGINT) AS lr_micro
      FROM bs CROSS JOIN tot
    )
    SELECT w.doc_id,
           d.lang,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(lr.lr_micro) AS BIGINT) AS dsir_weight_micro,
           SUM(lr.lr_micro) > 0 AS target_like
    FROM w JOIN lr ON lr.bucket = w.bucket
           JOIN documents d ON d.doc_id = w.doc_id
    GROUP BY w.doc_id, d.lang
    ORDER BY w.doc_id
    """


@_register("corpus_dsir_weights", oracle=_dsir_oracle())
def corpus_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al., "Data Selection for Language
    Models via Importance Resampling", arXiv:2302.03169 — public method):
    fit bag-of-hashed-ngrams unigram models over a TARGET domain sample and
    the RAW corpus, weight every document by its target/raw log-likelihood
    ratio. Resampling docs ∝ weight shifts the training mixture toward the
    target domain without a trained classifier — the importance-sampling
    counterpart to the Naive-Bayes filter below.

    The target here is the lang='en' slice (a stand-in; production feeds a
    curated target sample, e.g. held-out Wikipedia). Hashed buckets make
    the feature space B-bounded regardless of vocabulary growth — the
    paper's trick, and what keeps the model table broadcastable at 100 TB.

    Float discipline: one ln() per bucket on identical double operands in
    both engines, quantized to integer micro-units immediately (the char-
    trigram/BM25 convention); per-doc weights are then exact int64 sums —
    order- and partition-independent. Laplace (+1, +B) smoothing keeps
    empty buckets and an empty target slice finite.

    Shape: one exploded token pass feeds a B-bounded bucket aggregate
    (map-side combined); the fitted 512-row ratio table broadcasts back
    onto the token stream; per-doc scoring is one more map-side-combined
    groupBy. Two corpus tokenizes in the inline form (fit + score), the
    text_lm_score discipline; bodies never shuffle.
    """
    b = FEAT_BUCKETS
    d = load_table(spark, sf_dir, "documents")
    w = d.select(
        "doc_id",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("is_t"),
        F.explode(lower_ws_tokens("text")).alias("word"),
    ).select("doc_id", "is_t", (hash60("word") % b).alias("bucket"))
    bs = w.groupBy("bucket").agg(
        F.count("*").alias("cnt_r"), F.sum("is_t").alias("cnt_t")
    )
    tot = bs.agg(
        F.sum("cnt_r").alias("t_r"), F.sum("cnt_t").alias("t_t")
    )
    lr = bs.join(F.broadcast(tot)).select(
        "bucket",
        F.expr(
            f"CAST(ROUND((ln(CAST(cnt_t + 1 AS DOUBLE) / (t_t + {b}))"
            f" - ln(CAST(cnt_r + 1 AS DOUBLE) / (t_r + {b}))) * 1000000)"
            " AS BIGINT)"
        ).alias("lr_micro"),
    )
    scored = (
        w.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum("lr_micro").cast("bigint").alias("dsir_weight_micro"),
        )
    )
    return (
        scored.join(d.select("doc_id", "lang"), "doc_id")
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            "dsir_weight_micro",
            (F.col("dsir_weight_micro") > 0).alias("target_like"),
        )
        .orderBy("doc_id")
    )


def _nb_teacher_sql() -> str:
    # The text_quality bucket, restated over raw columns — the shared
    # teacher contract (regexes identical to text_quality's).
    return """
      CASE
        WHEN len(regexp_split_to_array(trim(text), '\\s+')) >= 50
             AND CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
                 / length(text) < 0.05 THEN 'good'
        WHEN len(regexp_split_to_array(trim(text), '\\s+')) >= 20 THEN 'fair'
        ELSE 'poor'
      END
    """


def _nb_oracle() -> str:
    b = FEAT_BUCKETS
    return f"""
    WITH lab AS (
      SELECT doc_id, {_nb_teacher_sql()} AS teacher FROM documents
    ),
    w AS (
      SELECT t.doc_id, lab.teacher,
             {hash60_sql('t.word')} % {b} AS bucket
      FROM (SELECT doc_id,
                   unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS word
            FROM documents) t
      JOIN lab ON lab.doc_id = t.doc_id
    ),
    bs AS (
      SELECT bucket,
             SUM(CASE WHEN teacher = 'good' THEN 1 ELSE 0 END) AS cnt_g,
             SUM(CASE WHEN teacher = 'poor' THEN 1 ELSE 0 END) AS cnt_p
      FROM w GROUP BY bucket
    ),
    tot AS (SELECT SUM(cnt_g) AS t_g, SUM(cnt_p) AS t_p FROM bs),
    prior AS (
      SELECT CAST(ROUND(ln(CAST(SUM(CASE WHEN teacher = 'good' THEN 1 ELSE 0 END)
                                 + 1 AS DOUBLE)
                            / (SUM(CASE WHEN teacher = 'poor' THEN 1 ELSE 0 END)
                               + 1)) * 1000000) AS BIGINT) AS prior_micro
      FROM lab
    ),
    lo AS (
      SELECT bucket,
             CAST(ROUND((ln(CAST(cnt_g + 1 AS DOUBLE) / (t_g + {b}))
                         - ln(CAST(cnt_p + 1 AS DOUBLE) / (t_p + {b})))
                        * 1000000) AS BIGINT) AS lo_micro
      FROM bs CROSS JOIN tot
    )
    SELECT w.doc_id, w.teacher,
           CAST(prior.prior_micro + SUM(lo.lo_micro) AS BIGINT) AS nb_score_micro,
           prior.prior_micro + SUM(lo.lo_micro) > 0 AS predicted_good,
           CASE w.teacher
             WHEN 'good' THEN prior.prior_micro + SUM(lo.lo_micro) > 0
             WHEN 'poor' THEN NOT (prior.prior_micro + SUM(lo.lo_micro) > 0)
             ELSE NULL
           END AS teacher_agree
    FROM w JOIN lo ON lo.bucket = w.bucket CROSS JOIN prior
    GROUP BY w.doc_id, w.teacher, prior.prior_micro
    ORDER BY w.doc_id
    """


@_register("text_nb_quality_classify", oracle=_nb_oracle())
def text_nb_quality_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering: a Naive-Bayes classifier over hashed
    unigram buckets, trained on the corpus's own rule-based extremes
    (text_quality 'good' vs 'poor') and scoring EVERY document — the
    fastText-classifier stage of the GPT-3/CCNet pipeline in its simplest
    deterministic form. The interesting rows are the disagreements: 'fair'
    docs the model pulls toward either pole, and rule-good docs with
    negative scores (rule-passing gibberish the token distribution
    betrays). Production swaps the teacher for curated positives (e.g.
    Wikipedia) — shape unchanged.

    Same float discipline as corpus_dsir_weights: per-bucket log-odds and
    the class prior each take one ln() on identical doubles, quantized to
    integer micro-units; per-doc scores are exact int64 sums. Laplace
    smoothing keeps a missing teacher class finite (tiny/hostile corpora).

    Shape: token explode -> B-bounded conditional bucket aggregate ->
    512-row log-odds table + one-row prior broadcast back onto the token
    stream -> per-doc map-side-combined sum. Bodies never shuffle.
    """
    b = FEAT_BUCKETS
    d = load_table(spark, sf_dir, "documents")
    chars = F.length("text")
    n_tokens = ws_token_count("text")
    n_punct = F.size(
        F.regexp_extract_all(F.col("text"), F.lit("[^A-Za-z0-9\\s]"), F.lit(0))
    )
    teacher = (
        F.when(
            (n_tokens >= 50)
            & (F.try_divide(n_punct.cast("double"), chars) < 0.05),
            "good",
        )
        .when(n_tokens >= 20, "fair")
        .otherwise("poor")
    )
    lab = d.select("doc_id", teacher.alias("teacher"))
    w = (
        d.select("doc_id", teacher.alias("teacher"),
                 F.explode(lower_ws_tokens("text")).alias("word"))
        .select("doc_id", "teacher", (hash60("word") % b).alias("bucket"))
    )
    bs = w.groupBy("bucket").agg(
        F.sum(F.when(F.col("teacher") == "good", 1).otherwise(0)).alias("cnt_g"),
        F.sum(F.when(F.col("teacher") == "poor", 1).otherwise(0)).alias("cnt_p"),
    )
    tot = bs.agg(F.sum("cnt_g").alias("t_g"), F.sum("cnt_p").alias("t_p"))
    prior = lab.agg(
        F.expr(
            "CAST(ROUND(ln(CAST(SUM(CASE WHEN teacher = 'good' THEN 1 ELSE 0 END)"
            " + 1 AS DOUBLE)"
            " / (SUM(CASE WHEN teacher = 'poor' THEN 1 ELSE 0 END) + 1))"
            " * 1000000) AS BIGINT)"
        ).alias("prior_micro")
    )
    lo = bs.join(F.broadcast(tot)).select(
        "bucket",
        F.expr(
            f"CAST(ROUND((ln(CAST(cnt_g + 1 AS DOUBLE) / (t_g + {b}))"
            f" - ln(CAST(cnt_p + 1 AS DOUBLE) / (t_p + {b}))) * 1000000)"
            " AS BIGINT)"
        ).alias("lo_micro"),
    )
    score = (
        w.join(F.broadcast(lo), "bucket")
        .groupBy("doc_id", "teacher")
        .agg(F.sum("lo_micro").alias("sum_lo"))
        .join(F.broadcast(prior))
        .select(
            "doc_id",
            "teacher",
            (F.col("prior_micro") + F.col("sum_lo")).cast("bigint").alias(
                "nb_score_micro"
            ),
        )
    )
    pred = F.col("nb_score_micro") > 0
    return score.select(
        "doc_id",
        "teacher",
        "nb_score_micro",
        pred.alias("predicted_good"),
        F.when(F.col("teacher") == "good", pred)
        .when(F.col("teacher") == "poor", ~pred)
        .otherwise(F.lit(None).cast("boolean"))
        .alias("teacher_agree"),
    ).orderBy("doc_id")


# --- Heaps'-law vocabulary growth (round 8) ---------------------------------

_HEAPS_ORACLE = """
WITH mx AS (SELECT MAX(doc_id) AS m FROM documents),
thr AS (
  SELECT s.step,
         CASE s.step WHEN 1 THEN m // 8 WHEN 2 THEN m // 4
                     WHEN 3 THEN m // 2 ELSE m END AS ceil_id
  FROM (VALUES (1), (2), (3), (4)) s(step) CROSS JOIN mx
),
w AS (SELECT doc_id,
             unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS word
      FROM documents),
ft AS (SELECT word, MIN(doc_id) AS first_doc FROM w GROUP BY word),
dt AS (SELECT doc_id,
              len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS nt
       FROM documents),
v AS (SELECT t.step,
             SUM(CASE WHEN f.first_doc <= t.ceil_id THEN 1 ELSE 0 END) AS vocab
      FROM thr t CROSS JOIN ft f GROUP BY t.step),
tk AS (SELECT t.step,
              SUM(CASE WHEN d.doc_id <= t.ceil_id THEN 1 ELSE 0 END) AS cum_docs,
              SUM(CASE WHEN d.doc_id <= t.ceil_id THEN d.nt ELSE 0 END)
                AS cum_tokens
       FROM thr t CROSS JOIN dt d GROUP BY t.step),
j AS (SELECT t.step, t.ceil_id, tk.cum_docs, tk.cum_tokens, v.vocab,
             LAG(v.vocab) OVER (ORDER BY t.step) AS pv,
             LAG(tk.cum_tokens) OVER (ORDER BY t.step) AS pt
      FROM thr t JOIN v ON v.step = t.step JOIN tk ON tk.step = t.step)
SELECT CAST(step AS BIGINT) AS step, ceil_id AS doc_ceiling,
       CAST(cum_docs AS BIGINT) AS cum_docs,
       CAST(COALESCE(cum_tokens, 0) AS BIGINT) AS cum_tokens,
       CAST(vocab AS BIGINT) AS vocab,
       CASE WHEN pv > 0 AND pt > 0 AND cum_tokens > pt
            THEN CAST(ROUND((ln(CAST(vocab AS DOUBLE)) - ln(CAST(pv AS DOUBLE)))
                            / (ln(CAST(cum_tokens AS DOUBLE))
                               - ln(CAST(pt AS DOUBLE))) * 1000000) AS BIGINT)
            ELSE NULL END AS beta_micro
FROM j ORDER BY step
"""


@_register("corpus_heaps_law", oracle=_HEAPS_ORACLE)
def corpus_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth audit: cumulative distinct-type count
    V(T) against cumulative token mass T at doubling corpus-prefix
    checkpoints (doc_id <= max/8, /4, /2, all), plus the realized local
    Heaps exponent beta = dln V / dln T between consecutive checkpoints
    (V ~ K*T^beta, Heaps 1978 — public result). Zipf's slope (zipf fit op)
    describes the FREQUENCY distribution at one snapshot; this curve says
    how the TYPE INVENTORY grows as the corpus does — the projection
    behind vocabulary-size budgeting when scaling a corpus 100x, and a
    drift alarm (a beta jump between prefixes = a new domain entered the
    crawl mix).

    Shape: one token explode feeds a vocabulary-bounded (word ->
    min(doc_id)) aggregate; per-doc token counts are a map-only
    projection. Both tables cross-join only the FOUR-ROW broadcast
    checkpoint table (derived from the one-row MAX — the allowlisted
    scalar-broadcast class) into conditional aggregates, so no prefix is
    rescanned and no global rank/window over corpus rows exists — the
    checkpoint ladder keys off doc_id VALUE, not row position, exactly so
    the 100 TB form needs no global sort. Float discipline: ln() only on
    exactly-equal integer counts, one shared division, micro-unit ROUND;
    the beta guard (prev vocab/tokens > 0, token mass strictly grew)
    avoids Spark's ln(0)=NULL vs DuckDB's -inf divergence.
    """
    d = load_table(spark, sf_dir, "documents")
    mx = d.agg(F.max("doc_id").alias("m"))
    thr = mx.select(
        F.explode(
            F.expr(
                "array(named_struct('step', 1L, 'ceil_id', m DIV 8),"
                " named_struct('step', 2L, 'ceil_id', m DIV 4),"
                " named_struct('step', 3L, 'ceil_id', m DIV 2),"
                " named_struct('step', 4L, 'ceil_id', m))"
            )
        ).alias("s")
    ).select(F.col("s.step").alias("step"), F.col("s.ceil_id").alias("ceil_id"))
    w = d.select("doc_id", F.explode(lower_ws_tokens("text")).alias("word"))
    ft = w.groupBy("word").agg(F.min("doc_id").alias("first_doc"))
    dt = d.select("doc_id", ws_token_count("text").alias("nt"))
    v = (
        ft.crossJoin(F.broadcast(thr))
        .groupBy("step")
        .agg(
            F.sum(F.when(F.col("first_doc") <= F.col("ceil_id"), 1).otherwise(0))
            .alias("vocab")
        )
    )
    tk = (
        dt.crossJoin(F.broadcast(thr))
        .groupBy("step")
        .agg(
            F.sum(F.when(F.col("doc_id") <= F.col("ceil_id"), 1).otherwise(0))
            .alias("cum_docs"),
            F.sum(
                F.when(F.col("doc_id") <= F.col("ceil_id"), F.col("nt")).otherwise(0)
            ).alias("cum_tokens"),
        )
    )
    lw = Window.orderBy("step")
    j = (
        thr.join(v, "step")
        .join(tk, "step")
        .select(
            "step",
            "ceil_id",
            "cum_docs",
            "cum_tokens",
            "vocab",
            F.lag("vocab").over(lw).alias("pv"),
            F.lag("cum_tokens").over(lw).alias("pt"),
        )
    )
    beta = F.when(
        (F.col("pv") > 0) & (F.col("pt") > 0) & (F.col("cum_tokens") > F.col("pt")),
        F.expr(
            "CAST(ROUND((ln(CAST(vocab AS DOUBLE)) - ln(CAST(pv AS DOUBLE)))"
            " / (ln(CAST(cum_tokens AS DOUBLE)) - ln(CAST(pt AS DOUBLE)))"
            " * 1000000) AS BIGINT)"
        ),
    ).otherwise(F.lit(None).cast("bigint"))
    return (
        j.select(
            F.col("step").cast("bigint").alias("step"),
            F.col("ceil_id").alias("doc_ceiling"),
            F.col("cum_docs").cast("bigint").alias("cum_docs"),
            F.coalesce(F.col("cum_tokens"), F.lit(0)).cast("bigint").alias(
                "cum_tokens"
            ),
            F.col("vocab").cast("bigint").alias("vocab"),
            beta.alias("beta_micro"),
        )
        .orderBy("step")
    )


# --- seeded-keyword topic routing (round 8) ---------------------------------

# Seed lexicon for keyword-based domain routing. Production swaps in a
# curated taxonomy (or a trained classifier's vocabulary); the engine-side
# contract is only (word -> topic), broadcastable at any corpus size.
TOPIC_KEYWORDS: dict[str, tuple[str, ...]] = {
    "execution": ("filter", "hash", "join", "merge", "scan", "sort"),
    "planning": ("agg", "data", "order", "query", "spark"),
    "storage": ("column", "key", "part", "row", "table", "value"),
    "streaming": ("batch", "group", "stream", "window"),
}


def _topic_mix_oracle() -> str:
    kw_rows = ",\n           ".join(
        f"('{w}', '{t}')"
        for t in sorted(TOPIC_KEYWORDS)
        for w in TOPIC_KEYWORDS[t]
    )
    return f"""
    WITH kw(word, topic) AS (
      VALUES {kw_rows}
    ),
    w AS (SELECT doc_id,
                 unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS word
          FROM documents),
    hits AS (SELECT w.doc_id, kw.topic, COUNT(*) AS cnt
             FROM w JOIN kw ON kw.word = w.word
             GROUP BY w.doc_id, kw.topic),
    best AS (SELECT doc_id, topic,
                    ROW_NUMBER() OVER (PARTITION BY doc_id
                                       ORDER BY cnt DESC, topic) AS rn
             FROM hits),
    assigned AS (
      SELECT d.doc_id, d.source, COALESCE(b.topic, 'other') AS topic
      FROM documents d
      LEFT JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1
    ),
    mix AS (SELECT source, topic, COUNT(*) AS n_docs FROM assigned
            GROUP BY source, topic),
    tot AS (SELECT source, COUNT(*) AS n FROM assigned GROUP BY source)
    SELECT m.source, m.topic, CAST(m.n_docs AS BIGINT) AS n_docs,
           ROUND(CAST(m.n_docs AS DOUBLE) / t.n, 6) AS share
    FROM mix m JOIN tot t ON t.source = m.source
    ORDER BY m.source, m.topic
    """


@_register("corpus_topic_mix", oracle=_topic_mix_oracle())
def corpus_topic_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded-keyword topic routing + per-source mixture report: every doc
    is assigned the topic whose seed keywords it hits most (tie -> the
    lexicographically first topic; zero hits -> 'other'), then rolled up
    to the (source, topic) composition table — the domain-mixture audit
    behind training-mixture decisions (the keyword-seeded first pass of
    taxonomy systems like WebOrganizer; the trained classifier drops into
    the same shape later). corpus_mixture_plan decides how much of each
    SOURCE to take; this says what each source actually CONTAINS.

    Shape: the seed lexicon is a broadcast map-side equi-join on the token
    stream (never a scan of anything corpus-scale); per-doc hit counts
    combine map-side; the argmax is a doc-keyed window over |topics|-bounded
    rows per doc; the final rollup is |sources| x |topics+1| rows. The one
    corpus-shaped exchange carries (doc_id, topic, cnt) triples. Exact
    integer counts everywhere; the share is one double division rounded 6.
    """
    d = load_table(spark, sf_dir, "documents")
    kw = spark.createDataFrame(
        [(w, t) for t in sorted(TOPIC_KEYWORDS) for w in TOPIC_KEYWORDS[t]],
        "word string, topic string",
    )
    w = d.select("doc_id", F.explode(lower_ws_tokens("text")).alias("word"))
    hits = (
        w.join(F.broadcast(kw), "word")
        .groupBy("doc_id", "topic")
        .agg(F.count("*").alias("cnt"))
    )
    rk = Window.partitionBy("doc_id").orderBy(F.col("cnt").desc(), "topic")
    best = hits.withColumn("rn", F.row_number().over(rk)).filter(F.col("rn") == 1)
    assigned = (
        d.select("doc_id", "source")
        .join(best.select("doc_id", "topic"), "doc_id", "left")
        .select("source", F.coalesce("topic", F.lit("other")).alias("topic"))
    )
    mix = assigned.groupBy("source", "topic").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
    tot = assigned.groupBy("source").agg(F.count("*").alias("n"))
    return (
        mix.join(tot, "source")
        .select(
            "source",
            "topic",
            "n_docs",
            F.round(F.col("n_docs").cast("double") / F.col("n"), 6).alias("share"),
        )
        .orderBy("source", "topic")
    )


# --- windowed co-occurrence PMI (round 8) -----------------------------------

PMI_WINDOW = 2      # symmetric token window (word2vec's small-context regime)
PMI_MIN_PAIRS = 5   # minimum co-occurrence count (kills one-off noise pairs)
PMI_TOPK = 50

# The log-space PMI expression, shared VERBATIM by both engines so the
# double additions associate identically: pmi = ln P(a,b) - ln P(a) - ln P(b)
# with each ln taken on an exact integer count.
_PMI_EXPR = (
    "CAST(ROUND(((ln(CAST(cab AS DOUBLE)) - ln(CAST(tp AS DOUBLE)))"
    " - (ln(CAST(ca AS DOUBLE)) - ln(CAST(tt AS DOUBLE)))"
    " - (ln(CAST(cb AS DOUBLE)) - ln(CAST(tt AS DOUBLE)))) * 1000000)"
    " AS BIGINT)"
)

_PMI_ORACLE = f"""
WITH t AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
           FROM documents),
idx AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS i
        FROM t WHERE len(toks) >= 2),
jdx AS (SELECT doc_id, toks, i,
               unnest(generate_series(i + 1, least(i + {PMI_WINDOW}, len(toks))))
                 AS j
        FROM idx),
pr AS (SELECT LEAST(toks[i], toks[j]) AS w1, GREATEST(toks[i], toks[j]) AS w2
       FROM jdx WHERE toks[i] <> toks[j]),
pc AS (SELECT w1, w2, COUNT(*) AS cab FROM pr GROUP BY w1, w2),
uni AS (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w,
               1 AS one
        FROM documents),
uc AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY w),
tot AS (SELECT (SELECT SUM(c) FROM uc) AS tt, (SELECT SUM(cab) FROM pc) AS tp),
scored AS (
  SELECT p.w1, p.w2, p.cab, {_PMI_EXPR} AS pmi_micro
  FROM pc p JOIN uc a ON a.w = p.w1 JOIN uc b ON b.w = p.w2
  CROSS JOIN tot,
  LATERAL (SELECT a.c AS ca, b.c AS cb) x
  WHERE p.cab >= {PMI_MIN_PAIRS}
)
SELECT w1, w2, CAST(cab AS BIGINT) AS pair_count, pmi_micro
FROM scored
ORDER BY pmi_micro DESC, w1, w2
LIMIT {PMI_TOPK}
"""


@_register("corpus_cooccurrence_pmi", oracle=_PMI_ORACLE)
def corpus_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed co-occurrence PMI ranking: the top word pairs by pointwise
    mutual information over a symmetric +/-2 token window — the
    count-based association statistic under word2vec/GloVe (SGNS factorizes
    the shifted-PMI matrix, Levy & Goldberg NeurIPS'14 — public result) and
    the collocation detector behind phrase-vocabulary induction ("new york"
    -> one token). corpus_bigram_stats ranks ADJACENT pairs by raw count;
    PMI normalizes by unigram frequency, so stop-word pairs sink and true
    collocations surface.

    Shape: pair enumeration happens INSIDE one projection per doc (the
    rolling-fingerprint discipline — windows never explode through a
    shuffle wider than the token stream x window size); pair and unigram
    counts combine map-side into vocabulary^2-bounded and vocab-bounded
    tables; the two scalar totals broadcast (the allowlisted one-row
    class); unigram counts join back vocab-keyed; TakeOrderedAndProject
    cuts top-k. Float discipline: one ln() per exact integer count,
    combined in a SHARED verbatim expression, micro-unit quantized — the
    DSIR/BM25 convention. The min-count floor is applied before scoring,
    so the expensive tail never materializes.
    """
    d = load_table(spark, sf_dir, "documents")
    t = d.select(lower_ws_tokens("text").alias("toks")).filter(F.size("toks") >= 2)
    pairs = t.select(
        F.explode(
            F.expr(
                f"""flatten(transform(sequence(1, size(toks) - 1), i ->
                      transform(sequence(i + 1, least(i + {PMI_WINDOW}, size(toks))), j ->
                        named_struct('w1', least(toks[i-1], toks[j-1]),
                                     'w2', greatest(toks[i-1], toks[j-1]),
                                     'same', toks[i-1] = toks[j-1]))))"""
            )
        ).alias("p")
    ).filter(~F.col("p.same")).select("p.w1", "p.w2")
    # ONE aggregated pair table serves the floor-filtered scoring side AND
    # the pre-floor grand total. localCheckpoint (not an exchange pin):
    # the consumers prune different columns, so Catalyst rewrites each
    # copy's aggregate differently and the exchanges never canonicalize
    # equal — the checkpoint is the only cut that makes the corpus-scale
    # pair enumeration run exactly once. Both tables are vocabulary-
    # bounded, so the local materialization is small at any corpus size.
    pcall = pairs.groupBy("w1", "w2").agg(F.count("*").alias("cab")).localCheckpoint()
    pc = pcall.filter(F.col("cab") >= PMI_MIN_PAIRS)
    uni = d.select(F.explode(lower_ws_tokens("text")).alias("w"))
    uc = uni.groupBy("w").agg(F.count("*").alias("c")).localCheckpoint()
    # totals: tt over ALL unigrams (pre-floor), tp over ALL pairs (pre-floor)
    tot = uc.agg(F.sum("c").alias("tt")).crossJoin(
        pcall.agg(F.sum("cab").alias("tp"))
    )
    scored = (
        pc.join(uc.select(F.col("w").alias("w1"), F.col("c").alias("ca")), "w1")
        .join(uc.select(F.col("w").alias("w2"), F.col("c").alias("cb")), "w2")
        .crossJoin(F.broadcast(tot))
        .select("w1", "w2", "cab", F.expr(_PMI_EXPR).alias("pmi_micro"))
    )
    return (
        scored.select(
            "w1", "w2", F.col("cab").cast("bigint").alias("pair_count"), "pmi_micro"
        )
        .orderBy(F.col("pmi_micro").desc(), "w1", "w2")
        .limit(PMI_TOPK)
    )


# --- Kneser-Ney bigram LM scoring (round 8) ----------------------------------

KN_DISCOUNT = 0.75  # the standard absolute-discount constant

# The per-bigram interpolated-KN probability, shared VERBATIM between
# engines (parenthesized so the double ops associate identically):
#   p(w2|w1) = (max(c2 - d, 0) + (d * nctx) * (nr / bt)) / c1
_KN_P_EXPR = (
    "(greatest(CAST(c2 AS DOUBLE) - 0.75, CAST(0.0 AS DOUBLE))"
    " + ((0.75 * CAST(nctx AS DOUBLE)) * (CAST(nr AS DOUBLE) / CAST(bt AS DOUBLE))))"
    " / CAST(c1 AS DOUBLE)"
)

_KN_ORACLE = f"""
WITH t AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
           FROM documents),
bg AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
       FROM t, unnest(generate_series(1, len(toks) - 1)) g(i)
       WHERE len(toks) >= 2),
c2t AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg GROUP BY w1, w2),
ctx AS (SELECT w1, SUM(c2) AS c1, COUNT(*) AS nctx FROM c2t GROUP BY w1),
rgt AS (SELECT w2, COUNT(*) AS nr FROM c2t GROUP BY w2),
tot AS (SELECT COUNT(*) AS bt FROM c2t),
scored AS (
  SELECT bg.doc_id,
         CAST(ROUND(-ln({_KN_P_EXPR}) * 1000000) AS BIGINT) AS nll_micro
  FROM bg JOIN c2t ON c2t.w1 = bg.w1 AND c2t.w2 = bg.w2
          JOIN ctx ON ctx.w1 = bg.w1
          JOIN rgt ON rgt.w2 = bg.w2
          CROSS JOIN tot
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(nll_micro) AS BIGINT) AS kn_nll_micro,
       CAST(ROUND(CAST(SUM(nll_micro) AS DOUBLE) / COUNT(*)) AS BIGINT)
         AS avg_nll_micro
FROM scored GROUP BY doc_id ORDER BY doc_id
"""


@_register("text_kn_bigram_lm", oracle=_KN_ORACLE)
def text_kn_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram language-model scoring (Kneser & Ney
    ICASSP'95; the smoothing KenLM implements — public method): per-doc
    negative log-likelihood under a bigram LM with absolute discounting
    d=0.75 and CONTINUATION-count backoff, p(w2|w1) = (max(c(w1,w2)-d, 0)
    + d·N1+(w1·)·P_cont(w2)) / c(w1·), P_cont(w2) = N1+(·w2)/|bigram
    types|. This is the CCNet/KenLM perplexity-filter stage with real
    smoothing: text_lm_score's unigram model scores word CHOICE,
    char-trigram NLL scores spelling — this scores word ORDER, the signal
    that catches shuffled/templated/stitched text whose unigram profile is
    clean. Continuation counts (not raw frequencies) in the backoff are
    KN's insight: "francisco" is frequent but follows only "san", so its
    backoff mass stays low.

    Trained on the corpus itself (the self-scoring convention of
    text_lm_score; production trains on a held-out clean slice, shape
    unchanged) — so every scored bigram has c2 >= 1 and p > 0 with no
    epsilon floor needed.

    Shape: one in-row bigram enumeration feeds the bigram-type table
    (vocab²-bounded, map-side combined); context/continuation tables are
    vocab-bounded rollups OF THE TYPE TABLE (never a second corpus pass);
    the one-row type-count total broadcasts (allowlisted scalar class);
    scoring joins the token stream against these bounded tables and
    fold-ups ride doc_id. Float discipline: per-bigram probability is the
    shared verbatim expression, one ln(), micro-unit quantized; per-doc
    NLLs are exact int64 sums.
    """
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", lower_ws_tokens("text").alias("toks")).filter(
        F.size("toks") >= 2
    )
    bg = t.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> named_struct('w1', toks[i-1], 'w2', toks[i]))"
            )
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")
    # localCheckpoint pins the vocab²-bounded type table behind one real
    # materialization: its four consumers (context, continuation, total,
    # the scoring join) prune different columns, so Catalyst rewrites each
    # copy's aggregate differently and exchange reuse can never fire — the
    # checkpoint collapses four corpus-scale re-tokenizations into one.
    # The table is vocab²-bounded, so the cut is cheap at any corpus size.
    c2t = bg.groupBy("w1", "w2").agg(F.count("*").alias("c2")).localCheckpoint()
    ctx = c2t.groupBy("w1").agg(
        F.sum("c2").alias("c1"), F.count("*").alias("nctx")
    )
    rgt = c2t.groupBy("w2").agg(F.count("*").alias("nr"))
    tot = c2t.agg(F.count("*").alias("bt"))
    scored = (
        bg.join(c2t, ["w1", "w2"])
        .join(ctx, "w1")
        .join(rgt, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.expr(
                f"CAST(ROUND(-ln({_KN_P_EXPR}) * 1000000) AS BIGINT)"
            ).alias("nll_micro"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.sum("nll_micro").cast("bigint").alias("kn_nll_micro"),
            F.expr(
                "CAST(ROUND(CAST(SUM(nll_micro) AS DOUBLE) / COUNT(*)) AS BIGINT)"
            ).alias("avg_nll_micro"),
        )
        .orderBy("doc_id")
    )


def _bpe_merge_curve_oracle() -> str:
    ctes, _ = _bpe_sql_cte(BPE_ENCODE_MERGES)
    arms = "\nUNION ALL\n".join(
        f"SELECT {r + 1} AS merge_ord, b{r}.pair, p.cnt"
        f" FROM b{r} JOIN p{r} p ON p.pair = b{r}.pair"
        for r in range(BPE_ENCODE_MERGES)
    )
    return f"""
    WITH {ctes},
    mc AS ({arms}),
    base AS (SELECT SUM(freq * length(word)) AS base FROM wf)
    SELECT CAST(merge_ord AS BIGINT) AS merge_ord, pair,
           CAST(cnt AS BIGINT) AS merged_count,
           CAST(base - SUM(cnt) OVER (ORDER BY merge_ord) AS BIGINT)
             AS tokens_after,
           ROUND((base - SUM(cnt) OVER (ORDER BY merge_ord)) * 1.0 / base, 6)
             AS compression_ratio
    FROM mc, base
    ORDER BY merge_ord
    """


@_register("corpus_bpe_merge_curve", oracle=_bpe_merge_curve_oracle())
def corpus_bpe_merge_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE training curve: per learned merge, the pair, how many
    occurrences it collapsed, the corpus symbol count after it, and the
    cumulative compression ratio vs the character baseline — the
    diminishing-returns table that SETS the merge budget (each merge
    strictly saves its pair count; when the curve flattens, stop). Read
    with corpus_bpe_fertility: this is compression spent, that is
    fertility bought.

    Shape: the trainer's own per-round argmax IS the curve — no extra
    corpus work; the baseline is one dictionary aggregate. The merge list
    is a bounded driver-side literal (n_merges rows, the probe-table
    pattern), cross-joined against the ONE-ROW baseline; the cumulative
    window runs over n_merges rows. The DuckDB twin joins each unrolled
    round's argmax back to its own pair-count table, so a round with no
    pairs left drops out of BOTH engines identically.
    """
    merges, _ = _bpe_train_states(spark, sf_dir, BPE_ENCODE_MERGES)
    lit = spark.createDataFrame(
        [(i + 1, p, c) for i, (p, c) in enumerate(merges)],
        "merge_ord long, pair string, merged_count long",
    )
    base = _word_freqs(spark, sf_dir).agg(
        F.sum(F.col("freq") * F.length("word")).alias("base")
    )
    w = Window.orderBy("merge_ord")
    return (
        lit.crossJoin(F.broadcast(base))
        .select(
            "merge_ord",
            "pair",
            "merged_count",
            (F.col("base") - F.sum("merged_count").over(w))
            .cast("bigint")
            .alias("tokens_after"),
            F.round(
                (F.col("base") - F.sum("merged_count").over(w))
                * F.lit(1.0)
                / F.col("base"),
                6,
            ).alias("compression_ratio"),
        )
        .orderBy("merge_ord")
    )


def _bpe_pack_oracle() -> str:
    ctes, st_n = _bpe_sql_cte(BPE_ENCODE_MERGES)
    h = hash60_sql("CAST(doc_id AS VARCHAR)", salt="pack")
    return f"""
    WITH {ctes},
    wtok AS (SELECT word, len(str_split(s, ' ')) AS n_syms FROM {st_n}),
    dw AS (SELECT doc_id, u.word
           FROM documents d,
                unnest(regexp_split_to_array(lower(trim(d.text)), '\\s+'))
                  u(word)
           WHERE u.word <> ''),
    toks AS (SELECT doc_id, {h} AS h, SUM(n_syms) AS doc_tokens
             FROM dw JOIN wtok USING (word) GROUP BY doc_id),
    ordered AS (
      SELECT doc_id, h % {PACK_BUCKETS} AS bucket, doc_tokens,
             CAST(COALESCE(SUM(doc_tokens) OVER (
               PARTITION BY h % {PACK_BUCKETS}
               ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS tok_start
      FROM toks WHERE doc_tokens > 0
    )
    SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
           tok_start // {PACK_SEQ_LEN} AS seq_id,
           tok_start, CAST(doc_tokens AS BIGINT) AS doc_tokens,
           (tok_start + doc_tokens - 1) // {PACK_SEQ_LEN}
             > tok_start // {PACK_SEQ_LEN} AS straddles
    FROM ordered
    ORDER BY bucket, tok_start, doc_id
    """


@_register("corpus_bpe_pack_sequences", oracle=_bpe_pack_oracle())
def corpus_bpe_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing on REAL tokenizer counts: corpus_pack_sequences'
    exact contract (hash-bucketed deterministic stream, running offsets,
    {PACK_SEQ_LEN}-token sequence ids, straddle flags) with doc_tokens
    measured by the TRAINED {BPE_ENCODE_MERGES}-merge BPE encoding
    instead of the BPE-ish regex — the step VERDICT r8 named: the
    train -> encode -> pack loop now carries one tokenizer end to end, so
    sample boundaries land where the loader's real token stream lands
    them. Run both packers; the assignment diff IS the approximation
    error the regex was hiding.

    Shape: per-doc real counts are the encode pipeline's word-keyed join
    rolled up by doc_id (text never wider than a word); packing itself is
    _pack_offsets — one bucket shuffle, one in-partition window pass.
    """
    _, state = _bpe_train_states(spark, sf_dir, BPE_ENCODE_MERGES)
    wtok = state.select("word", F.size(F.split("s", " ")).alias("n_syms"))
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.explode(lower_ws_tokens("text")).alias("word")
    ).filter(F.col("word") != "")
    toks = (
        words.join(wtok, "word")
        .groupBy("doc_id")
        .agg(F.sum("n_syms").alias("doc_tokens"))
        .filter(F.col("doc_tokens") > 0)
    )
    return _pack_offsets(toks).orderBy("bucket", "tok_start", "doc_id")


def _js_divergence_oracle() -> str:
    b = FEAT_BUCKETS
    return f"""
    WITH w AS (
      SELECT source, {hash60_sql('word')} % {b} AS bucket
      FROM (SELECT source,
                   unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS word
            FROM documents) t
      WHERE word <> ''
    ),
    sb AS (SELECT source, bucket, COUNT(*) AS cnt_s FROM w GROUP BY 1, 2),
    st AS (SELECT source, SUM(cnt_s) AS t_s FROM sb GROUP BY source),
    cb AS (SELECT bucket, COUNT(*) AS cnt_c FROM w GROUP BY bucket),
    tot AS (SELECT COUNT(*) AS t_c FROM w),
    grid AS (SELECT s.source, g.bkt AS bucket
             FROM (SELECT DISTINCT source FROM w) s,
                  (SELECT unnest(generate_series(0, {b - 1})) AS bkt) g),
    terms AS (
      SELECT grid.source,
             CAST(ROUND((
               0.5 * ((COALESCE(sb.cnt_s, 0) + 1.0) / (st.t_s + {b}))
                   * ln(((COALESCE(sb.cnt_s, 0) + 1.0) / (st.t_s + {b}))
                        / ((((COALESCE(sb.cnt_s, 0) + 1.0) / (st.t_s + {b}))
                            + ((COALESCE(cb.cnt_c, 0) + 1.0) / (tot.t_c + {b})))
                           / 2))
               + 0.5 * ((COALESCE(cb.cnt_c, 0) + 1.0) / (tot.t_c + {b}))
                     * ln(((COALESCE(cb.cnt_c, 0) + 1.0) / (tot.t_c + {b}))
                          / ((((COALESCE(sb.cnt_s, 0) + 1.0) / (st.t_s + {b}))
                              + ((COALESCE(cb.cnt_c, 0) + 1.0) / (tot.t_c + {b})))
                             / 2))
             ) * 1000000000) AS BIGINT) AS term_nano
      FROM grid
      LEFT JOIN sb ON sb.source = grid.source AND sb.bucket = grid.bucket
      LEFT JOIN cb ON cb.bucket = grid.bucket
      JOIN st ON st.source = grid.source
      CROSS JOIN tot
    )
    SELECT t.source,
           CAST(st.t_s AS BIGINT) AS n_tokens,
           CAST(SUM(t.term_nano) AS BIGINT) AS js_nano
    FROM terms t JOIN st ON st.source = t.source
    GROUP BY t.source, st.t_s
    ORDER BY t.source
    """


@_register("corpus_source_js_divergence", oracle=_js_divergence_oracle())
def corpus_source_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain shift per source: Jensen-Shannon divergence between each
    source's hashed-unigram distribution and the whole corpus — the
    symmetric, bounded (<= ln 2) drift table that ranks sources by HOW
    DIFFERENT their language is, feeding mixture planning (a high-JS
    source is a distinct domain to up/down-weight deliberately) and crawl
    drift alarms (a source whose JS moves between snapshots changed
    content, not just volume). DSIR's log-ratio weights answer "is this
    doc target-like"; JS answers "how far is this SOURCE from the mix".

    Same feature discipline as DSIR (Xie et al. arXiv:2302.03169's
    hashed buckets): {FEAT_BUCKETS} buckets bound the distribution
    regardless of vocabulary, Laplace (+1, +B) smoothing keeps every term
    finite, and each per-bucket JS term is ONE double expression over
    identical integer inputs in both engines, quantized to integer
    NANO-units (terms are O(1e-6); micro would truncate the signal) —
    per-source sums are then exact int64.

    Shape: ONE exploded token pass ends at the (source, bucket) rollup —
    a PROVABLY bounded table (|sources| x {FEAT_BUCKETS} rows), so it
    takes a localCheckpoint cut per the SURVEY §8.3 rule and every other
    statistic (per-bucket corpus counts, per-source totals, the grand
    total, the source list for the grid) derives from it as a bounded
    rollup — the corpus is tokenized exactly once (the inline form
    originally re-scanned it three times, once per independent
    aggregation; scan budget pinned by plan gate). The term table is the
    bounded grid (cross join of two tiny sets, never corpus-scale); the
    final rollup is |sources| rows.
    """
    b = FEAT_BUCKETS
    d = load_table(spark, sf_dir, "documents")
    w = (
        d.select("source", F.explode(lower_ws_tokens("text")).alias("word"))
        .filter(F.col("word") != "")
        .select("source", (hash60("word") % b).alias("bucket"))
    )
    sb = (
        w.groupBy("source", "bucket")
        .agg(F.count("*").alias("cnt_s"))
        .localCheckpoint(eager=True)
    )
    st = sb.groupBy("source").agg(F.sum("cnt_s").alias("t_s"))
    cb = sb.groupBy("bucket").agg(F.sum("cnt_s").alias("cnt_c"))
    tot = sb.agg(F.sum("cnt_s").alias("t_c"))
    buckets = spark.range(b).select(F.col("id").cast("bigint").alias("bucket"))
    grid = sb.select("source").distinct().crossJoin(F.broadcast(buckets))
    p = (F.coalesce("cnt_s", F.lit(0)) + 1.0) / (F.col("t_s") + b)
    q = (F.coalesce("cnt_c", F.lit(0)) + 1.0) / (F.col("t_c") + b)
    m = (p + q) / 2
    term_nano = F.round(
        (0.5 * p * F.log(p / m) + 0.5 * q * F.log(q / m)) * 1_000_000_000
    ).cast("bigint")
    terms = (
        grid.join(sb, ["source", "bucket"], "left")
        .join(F.broadcast(cb), "bucket", "left")
        .join(F.broadcast(st), "source")
        .crossJoin(F.broadcast(tot))
        .select("source", "t_s", term_nano.alias("term_nano"))
    )
    return (
        terms.groupBy("source", "t_s")
        .agg(F.sum("term_nano").cast("bigint").alias("js_nano"))
        .select(
            "source",
            F.col("t_s").cast("bigint").alias("n_tokens"),
            "js_nano",
        )
        .orderBy("source")
    )


def _doc_js_oracle() -> str:
    b = FEAT_BUCKETS
    return f"""
    WITH w AS (
      SELECT doc_id, {hash60_sql('word')} % {b} AS bucket
      FROM (SELECT doc_id,
                   unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS word
            FROM documents) t
      WHERE word <> ''
    ),
    db AS (SELECT doc_id, bucket, COUNT(*) AS cnt_d FROM w GROUP BY 1, 2),
    dt AS (SELECT doc_id, SUM(cnt_d) AS t_d FROM db GROUP BY doc_id),
    cb AS (SELECT bucket, COUNT(*) AS cnt_c FROM w GROUP BY bucket),
    tot AS (SELECT COUNT(*) AS t_c FROM w),
    grid AS (SELECT d.doc_id, g.bkt AS bucket
             FROM (SELECT DISTINCT doc_id FROM w) d,
                  (SELECT unnest(generate_series(0, {b - 1})) AS bkt) g),
    terms AS (
      SELECT grid.doc_id,
             CAST(ROUND((
               0.5 * ((COALESCE(db.cnt_d, 0) + 1.0) / (dt.t_d + {b}))
                   * ln(((COALESCE(db.cnt_d, 0) + 1.0) / (dt.t_d + {b}))
                        / ((((COALESCE(db.cnt_d, 0) + 1.0) / (dt.t_d + {b}))
                            + ((COALESCE(cb.cnt_c, 0) + 1.0) / (tot.t_c + {b})))
                           / 2))
               + 0.5 * ((COALESCE(cb.cnt_c, 0) + 1.0) / (tot.t_c + {b}))
                     * ln(((COALESCE(cb.cnt_c, 0) + 1.0) / (tot.t_c + {b}))
                          / ((((COALESCE(db.cnt_d, 0) + 1.0) / (dt.t_d + {b}))
                              + ((COALESCE(cb.cnt_c, 0) + 1.0) / (tot.t_c + {b})))
                             / 2))
             ) * 1000000000) AS BIGINT) AS term_nano
      FROM grid
      LEFT JOIN db ON db.doc_id = grid.doc_id AND db.bucket = grid.bucket
      LEFT JOIN cb ON cb.bucket = grid.bucket
      JOIN dt ON dt.doc_id = grid.doc_id
      CROSS JOIN tot
    )
    SELECT t.doc_id,
           CAST(dt.t_d AS BIGINT) AS n_tokens,
           CAST(SUM(t.term_nano) AS BIGINT) AS js_nano
    FROM terms t JOIN dt ON dt.doc_id = t.doc_id
    GROUP BY t.doc_id, dt.t_d
    ORDER BY t.doc_id
    """


@_register("doc_js_novelty", oracle=_doc_js_oracle())
def doc_js_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-DOCUMENT novelty vs the corpus: Jensen-Shannon divergence
    between each doc's hashed-unigram distribution and the whole-corpus
    mix — the doc-level twin of corpus_source_js_divergence (VERDICT
    r9's named growth candidate). The source table ranks DOMAINS; this
    ranks individual documents — the out-of-domain screen that catches a
    mislabeled-source doc, boilerplate injection, or a genuinely novel
    document the mixture planner should see, independent of what its
    source label claims. Same {FEAT_BUCKETS}-bucket feature space,
    Laplace (+1, +B) smoothing, and nano-unit term quantization, so doc
    and source scores are directly comparable.

    Shape — the doc arm CANNOT take the source table's localCheckpoint
    (per-doc rollups are corpus-scale, §8.3 forbids it), so single-pass
    discipline comes from keeping it ONE lineage instead: the per-doc
    bucket histogram aggregates into an IN-ROW map (<= {FEAT_BUCKETS}
    entries), each doc row then explodes its own full bucket grid and
    looks counts up from the map — no second consumer, no re-scan. The
    corpus-side per-bucket counts ARE provably bounded ({FEAT_BUCKETS}
    rows) and take the checkpoint cut, with the grand total derived from
    them. Two corpus passes total — the checkpoint arm pays its scan
    eagerly at build, the per-doc arm is the ONE scan left in the final
    plan (gate-pinned at 1). Terms are |docs| x {FEAT_BUCKETS} rows —
    512x linear in docs, never quadratic; the one-row total broadcast is
    the allowlisted scalar class.
    """
    b = FEAT_BUCKETS
    d = load_table(spark, sf_dir, "documents")
    w = (
        d.select("doc_id", F.explode(lower_ws_tokens("text")).alias("word"))
        .filter(F.col("word") != "")
        .select("doc_id", (hash60("word") % b).alias("bucket"))
    )
    cb = (
        w.groupBy("bucket")
        .agg(F.count("*").alias("cnt_c"))
        .localCheckpoint(eager=True)
    )
    tot = cb.agg(F.sum("cnt_c").alias("t_c"))
    perdoc = (
        w.groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("bucket", "cnt"))
            ).alias("mb"),
            F.sum("cnt").alias("t_d"),
        )
    )
    grid = perdoc.select(
        "doc_id",
        "t_d",
        F.explode(F.expr(f"sequence(0L, {b - 1}L)")).alias("bucket"),
        F.col("mb"),
    ).select(
        "doc_id",
        "t_d",
        "bucket",
        F.element_at(F.col("mb"), F.col("bucket")).alias("cnt_d"),
    )
    p = (F.coalesce("cnt_d", F.lit(0)) + 1.0) / (F.col("t_d") + b)
    q = (F.coalesce("cnt_c", F.lit(0)) + 1.0) / (F.col("t_c") + b)
    m = (p + q) / 2
    term_nano = F.round(
        (0.5 * p * F.log(p / m) + 0.5 * q * F.log(q / m)) * 1_000_000_000
    ).cast("bigint")
    terms = (
        grid.join(F.broadcast(cb), "bucket", "left")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", "t_d", term_nano.alias("term_nano"))
    )
    return (
        terms.groupBy("doc_id", "t_d")
        .agg(F.sum("term_nano").cast("bigint").alias("js_nano"))
        .select(
            "doc_id",
            F.col("t_d").cast("bigint").alias("n_tokens"),
            "js_nano",
        )
        .orderBy("doc_id")
    )


NDCG_SCALE = 1_000_000  # micro-unit discounted gains: exact int64 sums


def _ndcg_oracle() -> str:
    from .similarity import ORACLES as SIM_ORACLES

    g = BM25_TOP_K + 1
    return f"""
    WITH lex AS ({_bm25_oracle()}),
    sem AS ({SIM_ORACLES["similarity_topk"]}),
    j AS (
      SELECT l.query_id, l.rank AS lr, s.rank AS sr
      FROM lex l LEFT JOIN sem s
        ON s.query_id = l.query_id AND s.neighbor_id = l.neighbor_id
    ),
    dcg AS (
      SELECT query_id,
             CAST(SUM(CASE WHEN sr IS NULL THEN 0 ELSE 1 END) AS BIGINT)
               AS overlap,
             CAST(SUM(COALESCE(
               CAST(ROUND({NDCG_SCALE} * ({g} - sr) / log2(lr + 1))
                    AS BIGINT), 0)) AS BIGINT) AS dcg_micro
      FROM j GROUP BY query_id
    ),
    ideal AS (
      SELECT CAST(SUM(CAST(ROUND({NDCG_SCALE} * ({g} - r) / log2(r + 1))
                           AS BIGINT)) AS BIGINT) AS idcg_micro
      FROM generate_series(1, {BM25_TOP_K}) t(r)
    )
    SELECT query_id, overlap, dcg_micro, idcg_micro,
           ROUND(dcg_micro * 1.0 / idcg_micro, 6) AS ndcg
    FROM dcg CROSS JOIN ideal
    ORDER BY query_id
    """


@_register("retrieval_ndcg_report", oracle=_ndcg_oracle())
def retrieval_ndcg_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-system rank agreement as nDCG: score each query's BM25
    ranking against GRADED relevance derived from the semantic top-10
    (gain {BM25_TOP_K}+1-minus-semantic-rank, so the embedding system's
    first pick is worth 10 and its tenth is worth 1), discounted by
    1/log2(rank+1) — the standard nDCG the hybrid tier needs BEFORE
    choosing fusion weights: near-1 queries are ones where lexical alone
    suffices (fusion adds little), near-0 queries are where the two
    systems disagree and RRF earns its keep. Read with
    retrieval_hybrid_rrf's in_lexical/in_semantic flags: this quantifies
    per-query what those flags show per-neighbor.

    Float discipline: every discounted gain is ONE double expression over
    exact integers (gain/log2(rank+1)) quantized to micro-units before
    the int64 sum; the ideal normalizer is the same formula over ranks
    1..{BM25_TOP_K} — a constant computed identically in both engines,
    not hardcoded. Shape: both inputs are the bounded top-k tables; the
    join, rollup, and output are query-set-sized.
    """
    from .similarity import similarity_topk

    g = BM25_TOP_K + 1
    lex = text_bm25_retrieval(spark, sf_dir).select(
        "query_id", "neighbor_id", F.col("rank").alias("lr")
    )
    sem = similarity_topk(spark, sf_dir).select(
        "query_id", "neighbor_id", F.col("rank").alias("sr")
    )
    j = lex.join(sem, ["query_id", "neighbor_id"], "left")
    term = F.coalesce(
        F.round(
            F.lit(NDCG_SCALE) * (F.lit(g) - F.col("sr")) / F.log2(F.col("lr") + 1)
        ).cast("bigint"),
        F.lit(0),
    )
    dcg = j.groupBy("query_id").agg(
        F.sum(F.when(F.col("sr").isNull(), 0).otherwise(1))
        .cast("bigint")
        .alias("overlap"),
        F.sum(term).cast("bigint").alias("dcg_micro"),
    )
    ideal = (
        spark.range(1, BM25_TOP_K + 1)
        .select(
            F.round(
                F.lit(NDCG_SCALE)
                * (F.lit(g) - F.col("id"))
                / F.log2(F.col("id") + 1)
            )
            .cast("bigint")
            .alias("t")
        )
        .agg(F.sum("t").cast("bigint").alias("idcg_micro"))
    )
    return (
        dcg.crossJoin(F.broadcast(ideal))
        .select(
            "query_id",
            "overlap",
            "dcg_micro",
            "idcg_micro",
            F.round(F.col("dcg_micro") * F.lit(1.0) / F.col("idcg_micro"), 6).alias(
                "ndcg"
            ),
        )
        .orderBy("query_id")
    )
