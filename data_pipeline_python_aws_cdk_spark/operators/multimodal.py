"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Extension tier (BASELINE.json north star). Image/audio/video content is
carried as an opaque ``binary`` column next to typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas
functions over ``mapInPandas`` so bytes never round-trip through Python
row-at-a-time.

Decoders come in two interchangeable workers with identical signature,
schema, and plan shape: ``real_decode_batch`` (PIL-backed, used by
``decode_features`` wherever PIL is importable, conditionally tested) and
``fake_decode_batch`` (deterministic md5-derived pseudo-dimensions the
DuckDB oracle reproduces — the registered-query twin, and the fallback in
containers without imaging libs). Video frame *decoding* still requires a
PyAV/ffmpeg binding and stays an honest stub; the 1->N frame-expansion
plumbing below is real and tested.

Scale notes: payloads stay columnar (parquet binary) end to end; mapInPandas
processes whole Arrow batches (spark.sql.execution.arrow.maxRecordsPerBatch
controls batch height, so memory is bounded per task regardless of payload
size); no shuffle is introduced — decode is map-only and co-partitioned
with the scan.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions.hashing import hash60_py, hash60_sql
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


def attach_payload(d: DataFrame) -> DataFrame:
    """documents -> multimodal frame: (doc_id, payload binary, meta struct).

    Stand-in for reading real media: the text bytes play the role of an
    encoded image/audio blob.
    """
    return d.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.octet_length("text").alias("byte_len"),
            F.lit("application/octet-stream").alias("mime"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


# --- real decoders (stubbed: libs absent in this container) ---------------

try:  # pragma: no cover - PIL not installed here
    from PIL import Image  # type: ignore  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def decode_image(payload: bytes) -> "object":
    """Decode an encoded image payload to pixels. Requires PIL."""
    if not HAVE_PIL:
        raise NotImplementedError(
            "image decode requires PIL; container ships without imaging libs "
            "— use fake_decode_batch for plumbing tests"
        )
    import io

    return Image.open(io.BytesIO(payload))  # pragma: no cover


def sample_frames(payload: bytes, every_n: int = 30) -> list:
    """Frame-sample a video payload. Requires an av/ffmpeg binding."""
    raise NotImplementedError(
        "video frame sampling requires PyAV/ffmpeg; not present in this "
        "container — the mapInPandas plumbing below is the tested surface"
    )


def real_decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: decode real encoded images (PNG/JPEG/...) with
    PIL, emitting the same FEATURE_SCHEMA as the fake twin.

    This is the production decoder: identical signature, schema, Arrow
    batching, and map-only plan shape as ``fake_decode_batch`` — the
    operator swaps workers and nothing else changes. Animated formats
    (GIF/multi-frame TIFF) report their true frame count; stills report 1.
    Raises at call time if PIL is absent (gate with HAVE_PIL)."""
    import io

    import numpy as np
    from PIL import Image as PILImage

    for pdf in batches:
        doc_ids, byte_lens, widths, heights, n_frames_col, channel_sums = (
            [], [], [], [], [], []
        )
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            doc_ids.append(doc_id)
            if payload is None:
                # NULL payload -> NULL features, same as the fake twin
                for col in (byte_lens, widths, heights, n_frames_col, channel_sums):
                    col.append(None)
                continue
            raw = bytes(payload)
            img = PILImage.open(io.BytesIO(raw))
            arr = np.asarray(img.convert("RGB"), dtype=np.uint64)
            byte_lens.append(len(raw))
            widths.append(img.width)
            heights.append(img.height)
            n_frames_col.append(int(getattr(img, "n_frames", 1)))
            channel_sums.append(int(arr.sum()))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(doc_ids, dtype="int64"),
                "byte_len": pd.Series(byte_lens, dtype="Int64"),
                "width": pd.Series(widths, dtype="Int64"),
                "height": pd.Series(heights, dtype="Int64"),
                "n_frames": pd.Series(n_frames_col, dtype="Int64"),
                "channel_sum": pd.Series(channel_sums, dtype="Int64"),
            }
        )


def decode_features(frame: DataFrame, decoder: str | None = None) -> DataFrame:
    """Decode/feature-extract a multimodal frame (doc_id, payload, meta).

    ``decoder``: ``"real"`` (PIL, raises if absent), ``"fake"`` (the
    deterministic oracle-matched twin), or None to auto-select real when
    PIL is importable. Either way the plan is the same single map-only
    ArrowEvalPython stage over the scan.
    """
    if decoder is None:
        decoder = "real" if HAVE_PIL else "fake"
    if decoder == "real":
        if not HAVE_PIL:
            raise NotImplementedError("decoder='real' requires PIL")
        worker = real_decode_batch
    elif decoder == "fake":
        worker = fake_decode_batch
    else:
        raise ValueError(f"decoder={decoder!r}; expected 'real', 'fake', or None")
    return frame.mapInPandas(worker, schema=FEATURE_SCHEMA)


# --- deterministic fake decoder (the tested plumbing) ---------------------

FEATURE_SCHEMA = (
    "doc_id long, byte_len long, width long, height long, n_frames long, "
    "channel_sum long"
)


def fake_decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: 'decode' each payload deterministically.

    Pseudo-dimensions derive from the md5-based hash60 of the payload text —
    exactly what the oracle computes in SQL — so correctness of the batching
    and schema plumbing is verifiable without any media library.
    """
    for pdf in batches:
        raws = pdf["payload"].map(lambda b: None if b is None else bytes(b))
        texts = raws.map(lambda b: None if b is None else b.decode("utf-8"))

        def h(salt: str, mod: int, off: int = 0):
            return texts.map(
                lambda t: None if t is None else hash60_py(t, salt) % mod + off
            )

        # byte_len is the BYTE count (len of the raw payload) — the oracle
        # computes octet_length(encode(text)), and the real PIL twin len(raw);
        # a character count diverges on any non-ASCII text. NULL payloads
        # propagate as NULL-valued rows, matching the oracle's md5(NULL).
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "byte_len": raws.map(lambda b: None if b is None else len(b)).astype("Int64"),
                "width": h("w", 1920, 1).astype("Int64"),
                "height": h("h", 1080, 1).astype("Int64"),
                "n_frames": h("f", 240, 1).astype("Int64"),
                "channel_sum": h("c", 1_000_000).astype("Int64"),
            }
        )


@_register(
    "multimodal_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS byte_len,
           md5(text) AS content_md5,
           source AS origin
    FROM documents
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata extraction from the binary payload (no decode):
    byte length + content hash + origin. Map-only, columnar end to end."""
    d = load_table(spark, sf_dir, "documents")
    frame = attach_payload(d)
    return frame.select(
        "doc_id",
        F.col("meta.byte_len").cast("bigint").alias("byte_len"),
        F.md5("payload").alias("content_md5"),
        F.col("meta.origin").alias("origin"),
    )


# Salted via the helper's own parameter so the "salt:" joining convention
# lives in exactly one place (hashing.py), mirrored by the hash60_py calls
# in the fake workers.
_W = hash60_sql("text", salt="w")
_H = hash60_sql("text", salt="h")
_F = hash60_sql("text", salt="f")
_C = hash60_sql("text", salt="c")


@_register(
    "multimodal_decode",
    oracle=f"""
    SELECT doc_id,
           octet_length(encode(text)) AS byte_len,
           ({_W}) % 1920 + 1 AS width,
           ({_H}) % 1080 + 1 AS height,
           ({_F}) % 240 + 1 AS n_frames,
           ({_C}) % 1000000 AS channel_sum
    FROM documents
    """,
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode/feature-extract over mapInPandas.

    The fake decoder stands in for PIL/ffmpeg; schema, batch shape, and
    partitioning are the real production plumbing (swap fake_decode_batch
    for a real decoder and nothing else changes).
    """
    d = load_table(spark, sf_dir, "documents")
    frame = attach_payload(d)
    # decoder pinned to "fake": the registered query must replay the DuckDB
    # oracle. Real media runs decode_features(frame) / decoder="real".
    return decode_features(frame, decoder="fake")


RESIZE_TARGET = 224  # longest-edge fit, aspect preserved

RESIZE_SCHEMA = "doc_id long, width long, height long, out_w long, out_h long"


def fake_resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: aspect-preserving longest-edge resize plan.

    Integer arithmetic only (floor((dim * T) / longest), min 1) so the
    oracle reproduces every output dimension exactly. A real implementation
    replaces the dimension derivation with PIL's ``Image.resize`` and adds
    a resized-payload column; rows in = rows out either way.
    """
    for pdf in batches:
        texts = pdf["payload"].map(
            lambda b: None if b is None else bytes(b).decode("utf-8")
        )
        w = texts.map(lambda t: None if t is None else hash60_py(t, "w") % 1920 + 1)
        h = texts.map(lambda t: None if t is None else hash60_py(t, "h") % 1080 + 1)
        # NULL payloads keep their row with NULL dims (the oracle's
        # arithmetic over NULL width/height); nullable Int dtypes carry
        # that through Arrow. combine(max) and // both propagate None.
        longest = w.combine(h, lambda a, b: None if a is None else max(a, b))
        scale = lambda x: x.combine(  # noqa: E731
            longest,
            lambda v, lg: None if v is None else max(1, v * RESIZE_TARGET // lg),
        )
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": w.astype("Int64"),
                "height": h.astype("Int64"),
                "out_w": scale(w).astype("Int64"),
                "out_h": scale(h).astype("Int64"),
            }
        )


@_register(
    "multimodal_resize",
    oracle=f"""
    WITH dims AS (
      SELECT doc_id,
             ({_W}) % 1920 + 1 AS width,
             ({_H}) % 1080 + 1 AS height
      FROM documents
    )
    SELECT doc_id, width, height,
           GREATEST(1, (width * {RESIZE_TARGET}) // GREATEST(width, height)) AS out_w,
           GREATEST(1, (height * {RESIZE_TARGET}) // GREATEST(width, height)) AS out_h
    FROM dims
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize plumbing: decode -> aspect-preserving resize plan, one
    Arrow batch at a time, map-only (no shuffle, co-partitioned with the
    scan)."""
    d = load_table(spark, sf_dir, "documents")
    frame = attach_payload(d)
    return frame.mapInPandas(fake_resize_batch, schema=RESIZE_SCHEMA)


FRAME_SAMPLE_EVERY = 30  # keep one frame per N (1 fps at 30 fps video)

FRAME_SCHEMA = "doc_id long, frame_idx long, frame_hash long"


def fake_frame_sample_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: sample every Nth frame of each payload.

    The 1 -> N row expansion is the real shape of video frame extraction:
    one input row (a video) yields a variable number of output rows
    (frames), decided per payload inside the worker — something a scalar
    UDF cannot express. Frame count and per-frame hashes are md5-derived so
    the oracle replays them; a real worker would decode with PyAV and emit
    (doc_id, frame_idx, jpeg_bytes)."""
    for pdf in batches:
        out_doc, out_idx, out_hash = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            if payload is None:
                # oracle: generate_series over NULL n_frames unnests to
                # zero rows — a NULL video contributes no frames
                continue
            t = bytes(payload).decode("utf-8")
            n_frames = hash60_py(t, "f") % 240 + 1
            for idx in range(0, n_frames, FRAME_SAMPLE_EVERY):
                out_doc.append(doc_id)
                out_idx.append(idx)
                out_hash.append(hash60_py(f"{t}:{idx}") % 1_000_000_000)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out_doc, dtype="int64"),
                "frame_idx": pd.Series(out_idx, dtype="int64"),
                "frame_hash": pd.Series(out_hash, dtype="int64"),
            }
        )


@_register(
    "multimodal_frame_sample",
    oracle=f"""
    WITH vids AS (
      SELECT doc_id, text, ({_F}) % 240 + 1 AS n_frames
      FROM documents
    ),
    frames AS (
      SELECT doc_id, text,
             unnest(generate_series(0, n_frames - 1, {FRAME_SAMPLE_EVERY})) AS frame_idx
      FROM vids
    )
    SELECT doc_id, frame_idx,
           ({hash60_sql("text || ':' || frame_idx")}) % 1000000000 AS frame_hash
    FROM frames
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing: one row per kept frame, expansion
    decided per payload inside the Arrow worker. Map-only; downstream ops
    (dedup per frame, feature extraction) see an ordinary DataFrame."""
    d = load_table(spark, sf_dir, "documents")
    frame = attach_payload(d)
    return frame.mapInPandas(fake_frame_sample_batch, schema=FRAME_SCHEMA)


# --- audio chunking ----------------------------------------------------------

# Fixed-duration chunking for ASR/audio-embedding pipelines: a payload is
# split into CHUNK_SECS windows at its own sample rate, the tail chunk
# keeping whatever samples remain. Rates are drawn from the common capture
# set so the chunk length varies per payload (the real-world shape: a
# corpus mixes 8 kHz telephony with 44.1 kHz studio audio).
AUDIO_RATES = (8000, 16000, 22050, 44100)
AUDIO_CHUNK_SECS = 10
AUDIO_MAX_SAMPLES = 2_000_000  # ~45 s at 44.1 kHz — bounds the fake corpus

AUDIO_CHUNK_SCHEMA = (
    "doc_id long, sample_rate int, n_samples long, chunk_idx int, "
    "start_sample long, chunk_samples long, chunk_hash long"
)


def fake_audio_chunk_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: fixed-duration audio chunk expansion.

    Pseudo sample-rate / sample-count derive from the payload hash (the
    oracle replays both); the 1 -> N expansion with a shrinking tail chunk
    is the real shape of audio segmentation — chunk count depends on each
    payload's own rate, decided inside the worker. A real worker swaps the
    metadata derivation for a soundfile/ffprobe header read and emits
    (..., pcm_bytes) per chunk; schema and plan shape are unchanged.
    NULL payloads contribute no chunks (same contract as frame sampling).
    """
    n_rates = len(AUDIO_RATES)
    for pdf in batches:
        o_doc, o_rate, o_n, o_idx, o_start, o_len, o_hash = [], [], [], [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            if payload is None:
                continue
            t = bytes(payload).decode("utf-8")
            rate = AUDIO_RATES[hash60_py(t, "sr") % n_rates]
            n_samples = hash60_py(t, "ns") % AUDIO_MAX_SAMPLES + 1
            chunk_len = rate * AUDIO_CHUNK_SECS
            for idx, start in enumerate(range(0, n_samples, chunk_len)):
                o_doc.append(doc_id)
                o_rate.append(rate)
                o_n.append(n_samples)
                o_idx.append(idx)
                o_start.append(start)
                o_len.append(min(chunk_len, n_samples - start))
                o_hash.append(hash60_py(f"{t}:{start}") % 1_000_000_000)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(o_doc, dtype="int64"),
                "sample_rate": pd.Series(o_rate, dtype="int32"),
                "n_samples": pd.Series(o_n, dtype="int64"),
                "chunk_idx": pd.Series(o_idx, dtype="int32"),
                "start_sample": pd.Series(o_start, dtype="int64"),
                "chunk_samples": pd.Series(o_len, dtype="int64"),
                "chunk_hash": pd.Series(o_hash, dtype="int64"),
            }
        )


_SR = hash60_sql("text", salt="sr")
_NS = hash60_sql("text", salt="ns")


def _audio_chunk_oracle() -> str:
    rate_list = ", ".join(str(r) for r in AUDIO_RATES)
    return f"""
    WITH clips AS (
      SELECT doc_id, text,
             ([{rate_list}])[({_SR}) % {len(AUDIO_RATES)} + 1] AS sample_rate,
             ({_NS}) % {AUDIO_MAX_SAMPLES} + 1 AS n_samples
      FROM documents
    ),
    chunks AS (
      SELECT doc_id, text, sample_rate, n_samples,
             unnest(generate_series(
               0, n_samples - 1, sample_rate * {AUDIO_CHUNK_SECS}
             )) AS start_sample
      FROM clips
    )
    SELECT doc_id, sample_rate, n_samples,
           CAST(start_sample / (sample_rate * {AUDIO_CHUNK_SECS}) AS INT)
             AS chunk_idx,
           start_sample,
           LEAST(sample_rate * {AUDIO_CHUNK_SECS}, n_samples - start_sample)
             AS chunk_samples,
           ({hash60_sql("text || ':' || start_sample")}) % 1000000000
             AS chunk_hash
    FROM chunks
    """


@_register("multimodal_audio_chunks", oracle=_audio_chunk_oracle())
def multimodal_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio segmentation plumbing: each payload splits into fixed-duration
    chunks at its own sample rate (tail keeps the remainder) — the prep
    step before ASR or audio-embedding batch inference.

    Map-only like frame sampling: the expansion happens inside the Arrow
    worker, no shuffle, output co-partitioned with the scan; at 100 TB the
    only knob is input split size. Downstream sees ordinary rows keyed
    (doc_id, chunk_idx) ready for a mapInPandas encoder.
    """
    d = load_table(spark, sf_dir, "documents")
    frame = attach_payload(d)
    return frame.mapInPandas(fake_audio_chunk_batch, schema=AUDIO_CHUNK_SCHEMA)


# Minimum distinct shared frame hashes for a video near-dup verdict.
VIDEO_DUP_MIN_FRAMES = 3


def _video_near_dup_oracle() -> str:
    return f"""
    WITH vids AS (
      SELECT doc_id, text, ({_F}) % 240 + 1 AS n_frames
      FROM documents
    ),
    frames AS (
      SELECT doc_id,
             unnest(generate_series(0, n_frames - 1, {FRAME_SAMPLE_EVERY}))
               AS frame_idx,
             text
      FROM vids
    ),
    fh AS (
      SELECT DISTINCT doc_id,
             ({hash60_sql("text || ':' || frame_idx")}) % 1000000000 AS fhash
      FROM frames
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS shared_frames
    FROM fh a JOIN fh b ON a.fhash = b.fhash AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING COUNT(*) >= {VIDEO_DUP_MIN_FRAMES}
    ORDER BY doc_a, doc_b
    """


@_register("multimodal_video_near_dup", oracle=_video_near_dup_oracle())
def multimodal_video_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-duplicate detection by shared frame fingerprints: two
    payloads whose sampled frames collide on >= {VIDEO_DUP_MIN_FRAMES}
    distinct hashes are the same footage (re-encodes, watermarked
    mirrors, trims) — the multimodal mirror of the text dedup ladder,
    with a perceptual hash (pHash/dHash per frame) as the production
    drop-in for the deterministic fake.

    Shape: the frame expansion is the gated map-only Arrow worker; the
    pair discovery is an inverted-index equi-self-join on frame_hash —
    identical to the text ladder's shingle join: only colliding hashes
    produce pairs, the quadratic space is never materialized, and
    per-hash groups are duplicate-volume sized.
    """
    frames = multimodal_frame_sample(spark, sf_dir)
    fh = frames.select("doc_id", F.col("frame_hash").alias("fhash")).distinct()
    a = fh.select(F.col("doc_id").alias("doc_a"), "fhash")
    b = fh.select(F.col("doc_id").alias("doc_b"), "fhash")
    return (
        a.join(b, "fhash")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("bigint").alias("shared_frames"))
        .filter(F.col("shared_frames") >= VIDEO_DUP_MIN_FRAMES)
        .orderBy("doc_a", "doc_b")
    )


# --- exact payload dedup (round 8) -------------------------------------------

_PAYLOAD_DEDUP_ORACLE = """
WITH p AS (
  SELECT doc_id, md5(text) AS ph, octet_length(encode(text)) AS nbytes
  FROM documents WHERE text IS NOT NULL
)
SELECT ph AS payload_md5,
       MIN(doc_id) AS keep_doc_id,
       CAST(COUNT(*) AS BIGINT) AS copies,
       CAST(SUM(nbytes) AS BIGINT) AS total_bytes,
       CAST(SUM(nbytes) - MIN(nbytes) AS BIGINT) AS reclaimable_bytes
FROM p GROUP BY ph
ORDER BY copies DESC, payload_md5
"""


@_register("multimodal_payload_dedup", oracle=_PAYLOAD_DEDUP_ORACLE)
def multimodal_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact byte-level payload dedup — stage one of every image/audio
    pipeline (identical files re-crawled under different URLs dominate raw
    media dumps, and a digest groupBy removes them before any expensive
    decode or perceptual hashing runs). Keys on the md5 of the RAW payload
    bytes: no decode, no normalization — text-side dedup_exact normalizes
    whitespace/case, which has no analogue for opaque binaries. Also
    reports the reclaimable byte mass (all copies minus one kept), the
    number storage budgeting wants.

    Shape: one map-side digest projection (payloads never shuffle — only
    16-byte digests and byte counts move), one combine-friendly groupBy.
    All-copy groups at any corpus size; at 100 TB this runs as the ingest
    gate before payloads are even persisted twice.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    p = attach_payload(d).select(
        "doc_id",
        F.md5("payload").alias("ph"),
        F.octet_length("payload").cast("bigint").alias("nbytes"),
    )
    return (
        p.groupBy("ph")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").cast("bigint").alias("copies"),
            F.sum("nbytes").cast("bigint").alias("total_bytes"),
            (F.sum("nbytes") - F.min("nbytes")).cast("bigint").alias(
                "reclaimable_bytes"
            ),
        )
        .select(
            F.col("ph").alias("payload_md5"),
            "keep_doc_id",
            "copies",
            "total_bytes",
            "reclaimable_bytes",
        )
        .orderBy(F.col("copies").desc(), "payload_md5")
    )
