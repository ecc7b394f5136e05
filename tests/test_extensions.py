"""Behavioral tests for the extension tier.

The oracle harness (tests/test_corpus.py) proves Spark==DuckDB on the
driver testdata; these tests prove the operators do the *right thing* on
constructed inputs — planted duplicates get found, ANN recall holds, stubs
fail loudly, pandas plumbing preserves schema.
"""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from data_pipeline_python_aws_cdk_spark.operators import dedup, multimodal, similarity, text
from tests.conftest import SF_SMOKE


def test_dedup_finds_planted_near_dups(spark, tmp_path):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 10
    near = base.replace("gamma", "gamma2", 1)  # one-token edit: still >0.9 jaccard
    far = "one two three four five six seven eight nine ten " * 10
    df = spark.createDataFrame(
        [(1, base, "en", "s", len(base)), (2, near, "en", "s", len(near)),
         (3, far, "en", "s", len(far))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = tmp_path / "docs"
    df.write.parquet(f"{out}/documents.parquet")
    for other in ("region", "nation"):  # unused but loader-agnostic
        pass
    pairs = dedup.dedup_ngram_jaccard(spark, str(out)).collect()
    assert [(r.doc_a, r.doc_b) for r in pairs] == [(1, 2)]
    assert pairs[0].jaccard > 0.8

    lsh_pairs = dedup.dedup_minhash_lsh(spark, str(out)).collect()
    assert [(r.doc_a, r.doc_b) for r in lsh_pairs] == [(1, 2)]

    sim_pairs = dedup.dedup_simhash(spark, str(out)).collect()
    assert (1, 2) in [(r.doc_a, r.doc_b) for r in sim_pairs]


def test_exact_dedup_collapses_identical_text(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "same text here", "en", "s", 10),
         (2, "Same   TEXT here ", "en", "s", 10),  # normalization catches this
         (3, "different", "en", "s", 9)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = tmp_path / "docs2"
    df.write.parquet(f"{out}/documents.parquet")
    res = {r.keep_doc_id: r.copies for r in dedup.dedup_exact(spark, str(out)).collect()}
    assert res == {1: 2, 3: 1}


def test_ann_lsh_recall_vs_bruteforce(spark):
    # The driver embeddings are near-random (top-10 "neighbors" sit barely
    # above background cosine) — sign-LSH's worst case. Recall on genuinely
    # similar vectors is asserted separately below; here we only require
    # better-than-random candidate quality.
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.similarity_topk(spark, SF_SMOKE).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in similarity.similarity_ann_lsh(spark, SF_SMOKE).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.25, f"ANN recall too low: {recall}"


def test_ann_lsh_finds_planted_near_duplicate(spark, tmp_path):
    # A query vector and a 0.999-cosine copy must share LSH buckets and be
    # retrieved at rank 1; random background vectors fill the corpus.
    import random

    rnd = random.Random(7)
    dim = similarity.DIM

    def vec():
        return [rnd.gauss(0, 1) for _ in range(dim)]

    q = vec()
    near = [x + rnd.gauss(0, 0.01) for x in q]
    rows = [(0, q, 0), (100, near, 0)] + [(i, vec(), 1) for i in range(101, 300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = tmp_path / "emb"
    df.write.parquet(f"{out}/embeddings.parquet")
    res = similarity.similarity_ann_lsh(spark, str(out)).collect()
    top = {r.query_id: r.neighbor_id for r in res if r.rank == 1}
    assert top.get(0) == 100


def test_ann_ivf_recall_vs_bruteforce(spark):
    # IVF probes the 4 nearest of 16 lists; on near-random embeddings the
    # true neighbors scatter across lists, so require better-than-random
    # candidate quality (4/16 probe fraction would give ~0.25 by chance).
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.similarity_topk(spark, SF_SMOKE).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in similarity.similarity_ann_ivf(spark, SF_SMOKE).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.25, f"IVF recall too low: {recall}"


def test_ann_ivf_finds_planted_near_duplicate(spark, tmp_path):
    # A 0.999-cosine copy of a query lands in the same inverted list and
    # must come back at rank 1.
    import random

    rnd = random.Random(11)
    dim = similarity.DIM

    def vec():
        return [rnd.gauss(0, 1) for _ in range(dim)]

    q = vec()
    near = [x + rnd.gauss(0, 0.01) for x in q]
    rows = [(0, q, 0), (100, near, 0)] + [(i, vec(), 1) for i in range(101, 300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = tmp_path / "emb_ivf"
    df.write.parquet(f"{out}/embeddings.parquet")
    res = similarity.similarity_ann_ivf(spark, str(out)).collect()
    top = {r.query_id: r.neighbor_id for r in res if r.rank == 1}
    assert top.get(0) == 100


def test_embedding_cosine_dedup_finds_planted_pair(spark, tmp_path):
    # Two documents whose embeddings are near-identical must surface as an
    # embedding-cosine near-dup pair even though their texts differ.
    import random

    rnd = random.Random(13)
    dim = similarity.DIM

    def vec():
        return [rnd.gauss(0, 1) for _ in range(dim)]

    v = vec()
    near = [x + rnd.gauss(0, 0.01) for x in v]
    emb = [(50, v, 0), (51, near, 0)] + [(i, vec(), 1) for i in range(100, 200)]
    docs = [(vid, f"text of doc {vid}", "en", "s", 14) for vid, _, _ in emb]
    out = tmp_path / "embdup"
    spark.createDataFrame(
        emb, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{out}/embeddings.parquet")
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{out}/documents.parquet")
    pairs = dedup.dedup_embedding_cosine(spark, str(out)).collect()
    assert (50, 51) in [(r.doc_a, r.doc_b) for r in pairs]
    by_pair = {(r.doc_a, r.doc_b): r.cosine for r in pairs}
    assert by_pair[(50, 51)] > 0.99


def test_rolling_fingerprint_stable_under_local_edits(spark, tmp_path):
    # The CDC property: editing one early token must not shift boundary
    # hashes discovered later in the document (unlike fixed-size chunking).
    words = [f"tok{i}" for i in range(300)]
    orig = " ".join(words)
    edited = " ".join(["CHANGED"] + words[1:])  # single-token edit at pos 0
    out = tmp_path / "cdc"
    spark.createDataFrame(
        [(1, orig, "en", "s", len(orig)), (2, edited, "en", "s", len(edited))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{out}/documents.parquet")
    rows = text.doc_rolling_fingerprint(spark, str(out)).collect()
    by_doc = {1: set(), 2: set()}
    for r in rows:
        by_doc[r.doc_id].add((r.pos, r.chunk_hash))
    # boundaries past the edited window (pos > ROLL_W) must be identical
    tail1 = {(p, h) for p, h in by_doc[1] if p > text.ROLL_W}
    tail2 = {(p, h) for p, h in by_doc[2] if p > text.ROLL_W}
    assert tail1 == tail2 and len(tail1) > 0


def test_lang_id_emits_known_language(spark):
    rows = text.lang_id(spark, SF_SMOKE).collect()
    assert {r.detected_lang for r in rows} <= {"en", "de", "es"}
    assert len(rows) == 500


def test_multimodal_stubs_fail_loudly():
    with pytest.raises(NotImplementedError):
        multimodal.sample_frames(b"not-a-video")
    if not multimodal.HAVE_PIL:
        with pytest.raises(NotImplementedError):
            multimodal.decode_image(b"not-an-image")


def test_decode_features_selects_decoder(spark):
    """decode_features auto-selects the fake decoder without PIL (and the
    real one with it); asking for the real decoder without PIL raises."""
    from data_pipeline_python_aws_cdk_spark.tables import load_table

    frame = multimodal.attach_payload(load_table(spark, SF_SMOKE, "documents"))
    auto = multimodal.decode_features(frame)
    assert auto.columns == ["doc_id", "byte_len", "width", "height", "n_frames", "channel_sum"]
    assert auto.count() == 500
    if not multimodal.HAVE_PIL:
        with pytest.raises(NotImplementedError):
            multimodal.decode_features(frame, decoder="real")
    with pytest.raises(ValueError):
        multimodal.decode_features(frame, decoder="bogus")


def test_real_decode_batch_with_pil(spark):
    """Conditional production-decoder test: real PNG payloads through the
    identical mapInPandas plumbing. Runs only where PIL is installed."""
    PILImage = pytest.importorskip("PIL.Image")
    import io

    def png_bytes(w, h, rgb):
        img = PILImage.new("RGB", (w, h), rgb)
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    payloads = [(1, png_bytes(8, 4, (1, 2, 3))), (2, png_bytes(3, 5, (10, 0, 0)))]
    frame = spark.createDataFrame(payloads, "doc_id long, payload binary")
    rows = {r.doc_id: r for r in multimodal.decode_features(frame, decoder="real").collect()}
    assert (rows[1].width, rows[1].height, rows[1].n_frames) == (8, 4, 1)
    assert rows[1].channel_sum == 8 * 4 * (1 + 2 + 3)
    assert (rows[2].width, rows[2].height) == (3, 5)
    assert rows[2].channel_sum == 3 * 5 * 10


def test_multimodal_resize_preserves_aspect(spark):
    rows = multimodal.multimodal_resize(spark, SF_SMOKE).collect()
    assert len(rows) == 500
    t = multimodal.RESIZE_TARGET
    for r in rows[:50]:
        assert max(r.out_w, r.out_h) <= t
        assert max(r.out_w, r.out_h) == t or max(r.width, r.height) < t
        # aspect preserved within integer-floor tolerance
        assert abs(r.out_w * r.height - r.out_h * r.width) <= max(r.width, r.height)


def test_multimodal_frame_sample_expands_rows(spark):
    decoded = {r.doc_id: r.n_frames for r in multimodal.multimodal_decode(spark, SF_SMOKE).collect()}
    frames = multimodal.multimodal_frame_sample(spark, SF_SMOKE).collect()
    per_doc: dict[int, list[int]] = {}
    for r in frames:
        per_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    every = multimodal.FRAME_SAMPLE_EVERY
    assert set(per_doc) == set(decoded)
    for doc_id, idxs in per_doc.items():
        expected = list(range(0, decoded[doc_id], every))
        assert sorted(idxs) == expected


def test_multimodal_payload_schema(spark):
    from data_pipeline_python_aws_cdk_spark.tables import load_table

    frame = multimodal.attach_payload(load_table(spark, SF_SMOKE, "documents"))
    assert dict(frame.dtypes)["payload"] == "binary"
    decoded = multimodal.multimodal_decode(spark, SF_SMOKE)
    assert decoded.columns == [
        "doc_id", "byte_len", "width", "height", "n_frames", "channel_sum",
    ]
    row = decoded.filter(F.col("doc_id") == 0).collect()[0]
    assert 1 <= row.width <= 1920 and 1 <= row.height <= 1080


def test_approx_sketch_bounds_error_vs_exact(spark):
    """HLL distinct counts within 3x the configured 2% rsd; approx median
    within the [p25, p75] band of the exact distribution."""
    from data_pipeline_python_aws_cdk_spark.operators import analytics

    sf = "/root/testdata/sf0.01"
    approx = {
        r.event_type: r
        for r in analytics.approx_sketch_estimates(spark, sf).collect()
    }
    verdicts = analytics.events_approx_sketch(spark, sf).collect()
    assert verdicts and all(
        v.users_within_eps and v.p50_within_tol and v.p95_within_tol
        for v in verdicts
    )
    from data_pipeline_python_aws_cdk_spark.tables import load_table

    ev = load_table(spark, sf, "events")
    exact = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.25)").alias("p25"),
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.75)").alias("p75"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for etype, a in approx.items():
        e = exact[etype]
        assert abs(a.approx_users - e.users) <= max(3, 0.06 * e.users), etype
        assert e.p25 <= a.p50_value <= e.p75, etype


def test_kmeans_recovers_planted_clusters(spark):
    """Three tight Gaussian blobs -> k-means must recover them exactly
    (every blob maps to one distinct predicted cluster)."""
    import numpy as np

    rng = np.random.default_rng(11)
    centers = np.eye(3, 16) * 10.0
    rows = []
    for lbl in range(3):
        for i in range(40):
            v = centers[lbl] + rng.normal(0, 0.05, 16)
            rows.append((lbl * 100 + i, [float(x) for x in v], lbl))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    pred = similarity.kmeans_assign(df, k=3, seed=1).collect()
    mapping = {}
    for r in pred:
        mapping.setdefault(r.label, set()).add(r.prediction)
    assert all(len(v) == 1 for v in mapping.values())  # each blob intact
    assert len({next(iter(v)) for v in mapping.values()}) == 3  # and distinct


def test_pii_redact_planted_cases(spark):
    """The corpus has no PII, so plant the positive cases: URL swallows the
    email inside it, standalone email and phone get typed placeholders."""
    rows = [
        (1, "contact me at alice@example.com or +1 (555) 123-4567 today"),
        (2, "see https://example.com/u?user=bob@example.com for details"),
        (3, "plain text with no identifiers at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.clean for r in df.select(
        "doc_id", text.redact_text(F.col("text")).alias("clean")).collect()}
    assert out[1] == "contact me at <EMAIL> or <PHONE> today"
    assert out[2] == "see <URL> for details"
    assert out[3] == rows[2][1]


def test_corpus_bigram_stats_shape(spark):
    """Top-k bigram stats: deterministic order, doc_freq <= occurrences,
    and the plan is TakeOrderedAndProject (no global sort)."""
    df = text.corpus_bigram_stats(spark, SF_SMOKE)
    rows = df.collect()
    assert len(rows) == text.NGRAM_TOP_K
    assert all(r.doc_freq <= r.occurrences for r in rows)
    keys = [(-r.doc_freq, -r.occurrences, r.bigram) for r in rows]
    assert keys == sorted(keys)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_dedup_clusters_transitive_chain(spark, tmp_path):
    """Label propagation must group a transitive chain A~B~C into ONE
    cluster even when A and C are not directly near-duplicates."""
    toks = [f"w{i}" for i in range(60)]
    a = " ".join(toks)
    b = " ".join(["X" if i in (5, 10, 15) else t for i, t in enumerate(toks)])
    c = " ".join(["X" if i in (5, 10, 15) else ("Y" if i in (25, 30, 35) else t)
                  for i, t in enumerate(toks)])
    far = " ".join(f"z{i}" for i in range(60))
    rows = [(1, a), (2, b), (3, c), (9, far)]
    out = tmp_path / "chain"
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{out}/documents.parquet")

    pairs = {(r.doc_a, r.doc_b) for r in dedup.dedup_minhash_lsh(spark, str(out)).collect()}
    clusters = dedup.dedup_clusters(spark, str(out)).collect()
    by_doc = {r.doc_id: r.cluster_id for r in clusters}
    members = {r.doc_id for r in clusters}
    # every doc in a pair is clustered; all chained docs share one cluster
    assert members == {d for p in pairs for d in p}
    chained = {d for p in pairs for d in p} & {1, 2, 3}
    assert len({by_doc[d] for d in chained}) == 1
    assert by_doc[min(chained)] == min(chained)  # canonical = min doc_id
    sizes = {r.cluster_id: r.cluster_size for r in clusters}
    assert sizes[min(chained)] == len(chained)


def test_repetition_stats_planted_loop(spark, tmp_path):
    """A generation-loop document (one word repeated) must score
    top_word_frac ~1 and dup_word_frac near 1; a all-distinct document
    scores top_word_frac = 1/n and dup_word_frac = 0."""
    loop = " ".join(["spam"] * 40)
    clean = " ".join(f"w{i}" for i in range(40))
    out = tmp_path / "rep"
    spark.createDataFrame(
        [(1, loop, "en", "s", len(loop)), (2, clean, "en", "s", len(clean))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{out}/documents.parquet")
    rows = {r.doc_id: r for r in text.text_repetition_stats(spark, str(out)).collect()}
    assert rows[1].top_word_frac == 1.0
    assert rows[1].top_bigram_frac == 1.0
    assert abs(rows[1].dup_word_frac - (1 - 1 / 40)) < 1e-9
    assert abs(rows[2].top_word_frac - 1 / 40) < 1e-9
    assert rows[2].dup_word_frac == 0.0


def test_embedding_norm_stats_flags_degenerate_vectors(spark, tmp_path):
    """Norm diagnostics must expose all-zero and unnormalized vectors, and
    the compute must be JVM higher-order functions (no Python eval)."""
    from data_pipeline_python_aws_cdk_spark.operators import similarity

    out = tmp_path / "emb"
    spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0, 0.0], 0), (2, [3.0, 4.0, 0.0, 0.0], 0),
         (3, [0.5, 0.5, 0.5, 0.5], 1)],
        "vec_id long, embedding array<float>, label int",
    ).write.parquet(f"{out}/embeddings.parquet")
    df = similarity.embedding_norm_stats(spark, str(out))
    rows = {r.vec_id: r for r in df.collect()}
    assert rows[1].l2_norm == 0.0
    assert rows[2].l2_norm == 5.0 and rows[2].max_abs == 4.0
    assert rows[3].l2_norm == 1.0 and rows[3].mean_val == 0.5
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_clean_corpus_filters_dedups_and_splits(spark, tmp_path):
    """The composed pipeline must drop short/punct-heavy docs, keep one
    copy per duplicate group, and assign hash-deterministic splits."""
    good = " ".join(f"w{i}" for i in range(30))
    dup = good  # exact duplicate, higher doc_id -> must be dropped
    short = "too short"
    punct = "!!! ??? *** " * 20
    out = tmp_path / "clean"
    rows = [(1, good), (2, dup), (3, short), (4, punct)]
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{out}/documents.parquet")
    res = text.documents_clean_corpus(spark, str(out)).collect()
    # only doc 1 survives (2 is a dup, 3 too short, 4 too punct-y)
    assert sum(r.docs for r in res) == 1
    assert sum(r.total_tokens for r in res) == 30
    # replayable: second run produces the identical manifest
    again = text.documents_clean_corpus(spark, str(out)).collect()
    assert sorted(map(tuple, res)) == sorted(map(tuple, again))


def test_weighted_sample_prefers_heavy_docs_and_plans_topk(spark, tmp_path):
    """A-ES sampling: a document with overwhelming weight must be selected;
    the plan must be TakeOrderedAndProject (no global sort)."""
    out = tmp_path / "ws"
    rows = [(i, "x " * 10, "en", "s", 20) for i in range(1, 50)]
    rows.append((999, "y " * 10, "en", "s", 10_000_000))  # whale weight
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{out}/documents.parquet")
    import data_pipeline_python_aws_cdk_spark.operators.text as textmod

    old_k = textmod.WEIGHTED_SAMPLE_K
    textmod.WEIGHTED_SAMPLE_K = 10
    try:
        df = textmod.documents_weighted_sample(spark, str(out))
        picked = {r.doc_id for r in df.collect()}
    finally:
        textmod.WEIGHTED_SAMPLE_K = old_k
    assert 999 in picked and len(picked) == 10
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_lm_score_separates_gibberish_from_indomain(spark, tmp_path):
    """Docs made of corpus-frequent words must score lower avg_nll than a
    doc of hapaxes; OOV appears only for words outside the top-V vocab."""
    import data_pipeline_python_aws_cdk_spark.operators.text as textmod

    out = tmp_path / "lm"
    common = "the cat sat on the mat " * 20
    rows = [(i, common, "en", "s", len(common)) for i in range(1, 9)]
    gibberish = " ".join(f"zq{i}x" for i in range(120))
    rows.append((99, gibberish, "en", "s", len(gibberish)))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{out}/documents.parquet")

    old_v = textmod.LM_VOCAB_SIZE
    textmod.LM_VOCAB_SIZE = 5  # exactly the common words fit the vocab
    try:
        res = {r.doc_id: r for r in textmod.text_lm_score(spark, str(out)).collect()}
    finally:
        textmod.LM_VOCAB_SIZE = old_v
    assert res[1].oov_rate == 0.0
    assert res[99].oov_rate == 1.0
    assert res[99].avg_nll > res[1].avg_nll


def test_decontaminate_flags_planted_leak(spark, tmp_path):
    """A test-split document sharing an 8-gram with a train document must
    show contamination; a fully novel test document must show zero."""
    import data_pipeline_python_aws_cdk_spark.operators.dedup as dedupmod
    from data_pipeline_python_aws_cdk_spark.functions.hashing import hash60_py

    # find doc_ids on each side of the salted split
    train_id = next(i for i in range(1, 100) if hash60_py(str(i), salt="split") % 100 < 90)
    test_ids = [i for i in range(1, 100) if hash60_py(str(i), salt="split") % 100 >= 90]
    leak_id, clean_id = test_ids[0], test_ids[1]

    shared = "one two three four five six seven eight"
    train_text = f"{shared} alpha beta gamma delta epsilon zeta eta theta"
    leak_text = f"prefix words here {shared} suffix words trailing after"
    clean_text = " ".join(f"nv{i}" for i in range(16))
    out = tmp_path / "decon"
    spark.createDataFrame(
        [(train_id, train_text, "en", "s", 1), (leak_id, leak_text, "en", "s", 1),
         (clean_id, clean_text, "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{out}/documents.parquet")

    res = {r.doc_id: r for r in dedupmod.corpus_decontaminate(spark, str(out)).collect()}
    assert set(res) == {leak_id, clean_id}
    assert res[leak_id].n_contaminated >= 1
    assert res[clean_id].n_contaminated == 0 and res[clean_id].contamination_ratio == 0.0


def test_pack_sequences_offsets_are_contiguous_per_bucket(spark):
    # Within every bucket the token stream must be gapless: sorted by
    # tok_start, each doc begins exactly where the previous one ended, the
    # first begins at 0, and seq_id/straddles are pure functions of
    # (tok_start, doc_tokens). A violation means the window frame or the
    # ordering key drifted.
    from data_pipeline_python_aws_cdk_spark.operators.text import (
        PACK_SEQ_LEN,
        corpus_pack_sequences,
    )

    rows = corpus_pack_sequences(spark, SF_SMOKE).collect()
    assert rows
    by_bucket: dict[int, list] = {}
    for r in rows:
        by_bucket.setdefault(r.bucket, []).append(r)
    for bucket, rs in by_bucket.items():
        rs.sort(key=lambda r: r.tok_start)
        expected = 0
        for r in rs:
            assert r.tok_start == expected, (bucket, r)
            assert r.seq_id == r.tok_start // PACK_SEQ_LEN
            assert r.straddles == (
                (r.tok_start + r.doc_tokens - 1) // PACK_SEQ_LEN > r.seq_id
            )
            expected += r.doc_tokens


def test_rfm_segments_cover_all_customers_with_valid_codes(spark):
    from data_pipeline_python_aws_cdk_spark.operators.analytics import (
        orders_rfm_segments,
    )
    from data_pipeline_python_aws_cdk_spark.tables import load_table

    rows = orders_rfm_segments(spark, SF_SMOKE).collect()
    total = sum(r.customers for r in rows)
    n_customers = (
        load_table(spark, SF_SMOKE, "orders").select("o_custkey").distinct().count()
    )
    assert total == n_customers
    for r in rows:
        digits = (r.segment // 100, (r.segment // 10) % 10, r.segment % 10)
        assert all(1 <= d <= 4 for d in digits), r.segment


def test_anomaly_zscore_bounds(spark):
    from data_pipeline_python_aws_cdk_spark.operators.analytics import (
        events_anomaly_zscore,
    )

    for r in events_anomaly_zscore(spark, SF_SMOKE).collect():
        assert 0 <= r.outliers <= r.events
        assert r.max_abs_z >= 0


def test_ivf_persisted_index_prunes_partitions_and_matches_inline(spark, tmp_path):
    # The persisted-index half of the IVF story: inverted lists written
    # partitionBy(centroid_id), probe filters on the probed centroid set,
    # and Catalyst must turn that into partition-path pruning — the scan
    # lists ONLY the probed directories, so (1 - NPROBE/NLIST) of the
    # corpus is skipped at the file level. Results must equal the inline
    # (index-free) query exactly.
    from data_pipeline_python_aws_cdk_spark.operators.similarity import (
        ivf_build_index,
        ivf_probe_indexed,
        similarity_ann_ivf,
    )

    from data_pipeline_python_aws_cdk_spark.operators.similarity import (
        ivf_nprobe_sweep_indexed,
        similarity_ann_ivf_nprobe_sweep,
    )

    index_dir = str(tmp_path / "ivf_index")
    ivf_build_index(spark, SF_SMOKE, index_dir)
    probed = ivf_probe_indexed(spark, index_dir, SF_SMOKE)
    inline = similarity_ann_ivf(spark, SF_SMOKE)
    assert {tuple(r) for r in probed.collect()} == {tuple(r) for r in inline.collect()}
    # the nprobe sweep over the SAME persisted index reproduces the
    # inline sweep's curve — one build amortized across all sweep points
    sweep_idx = {
        tuple(r) for r in ivf_nprobe_sweep_indexed(spark, index_dir, SF_SMOKE).collect()
    }
    sweep_inline = {
        tuple(r) for r in similarity_ann_ivf_nprobe_sweep(spark, SF_SMOKE).collect()
    }
    assert sweep_idx == sweep_inline
    # The probe filter must land in the index scan's PartitionFilters (an
    # INSET over centroid_id) — that is the file-level pruning mechanism.
    # At smoke scale 8 queries x 4 probes touch most of the 16 lists, so
    # assert the mechanism, not a pruned-path count; at production scale
    # the same plan skips (1 - NPROBE/NLIST) of the corpus directories.
    plan = probed._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[[^\]]*centroid_id[^\]]*INSET", plan)
    assert m is not None, "centroid INSET missing from index scan PartitionFilters"


# --- round-3 additions -------------------------------------------------------


def test_containment_catches_planted_prefix_dup(spark, tmp_path):
    """A doc fully contained in a 5x longer one: Jaccard ~0.2 (below the 0.5
    near-dup cut) but containment_a = 1.0 — exactly the asymmetric case
    minhash_containment exists for."""
    inner = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    outer = inner + "lambda mu nu xi omicron pi rho sigma tau upsilon " * 16
    far = "one two three four five six seven eight nine ten " * 10
    df = spark.createDataFrame(
        [(1, inner, "en", "s", len(inner)), (2, outer, "en", "s", len(outer)),
         (3, far, "en", "s", len(far))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = tmp_path / "docs_cont"
    df.write.parquet(f"{out}/documents.parquet")
    rows = {(r.doc_a, r.doc_b): r for r in
            dedup.dedup_containment(spark, str(out)).collect()}
    assert (1, 2) in rows
    assert rows[(1, 2)].containment_a == 1.0  # inner fully inside outer
    assert rows[(1, 2)].containment_b < 0.5
    # and the symmetric Jaccard path does NOT flag it
    ja = {(r.doc_a, r.doc_b) for r in
          dedup.dedup_ngram_jaccard(spark, str(out)).collect()}
    assert (1, 2) not in ja


def test_survivors_full_corpus_assignment(spark, tmp_path):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 10
    near = base.replace("gamma", "gamma2", 1)
    far = "one two three four five six seven eight nine ten " * 10
    df = spark.createDataFrame(
        [(1, base, "en", "s", 1), (2, near, "en", "s", 1), (3, far, "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = tmp_path / "docs_surv"
    df.write.parquet(f"{out}/documents.parquet")
    rows = {r.doc_id: r for r in dedup.dedup_survivors(spark, str(out)).collect()}
    assert set(rows) == {1, 2, 3}  # every doc gets an assignment
    assert rows[1].is_survivor and rows[1].cluster_id == 1
    assert not rows[2].is_survivor and rows[2].cluster_id == 1
    assert rows[3].is_survivor and rows[3].cluster_size == 1  # singleton


def test_text_normalize_is_idempotent(spark):
    out = text.text_normalize(spark, SF_SMOKE).select("norm_text")
    renorm = out.select(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower(F.col("norm_text")), "[^a-z0-9\\s]", ""),
                "\\s+",
                " ",
            )
        ).alias("again"),
        "norm_text",
    )
    assert renorm.filter(F.col("again") != F.col("norm_text")).count() == 0


def test_quantize_codes_bounded_and_reconstructible(spark):
    rows = similarity.embedding_quantize(spark, SF_SMOKE).collect()
    assert rows
    from data_pipeline_python_aws_cdk_spark.operators.similarity import QUANT_LEVELS
    for r in rows:
        # 64 dims x [0, 255] codes
        assert 0 <= r.code_sum <= 64 * QUANT_LEVELS
        assert 0 <= r.n_low <= 64 and 0 <= r.n_high <= 64
    # per-dim min/max are corpus-wide extremes: every dimension has exactly
    # one vector at code 0 and one at 255, so saturation exists somewhere
    assert sum(r.n_low for r in rows) >= 64
    assert sum(r.n_high for r in rows) >= 64


def test_session_funnel_is_monotone(spark):
    from data_pipeline_python_aws_cdk_spark.operators import analytics

    row = analytics.events_session_funnel(spark, SF_SMOKE).collect()[0]
    assert row.sessions >= row.with_view >= row.view_then_click >= row.view_click_purchase
    assert row.view_then_click > 0  # the 10k-event smoke data converts


def test_backlog_conservation(spark):
    from data_pipeline_python_aws_cdk_spark.operators import analytics
    from data_pipeline_python_aws_cdk_spark.tables import load_table

    rows = analytics.orders_backlog_asof(spark, SF_SMOKE).collect()
    n_orders = load_table(spark, SF_SMOKE, "orders").count()
    assert rows[-1].placed_cum == n_orders  # every order eventually placed
    for r in rows:
        assert r.backlog == r.placed_cum - r.shipped_cum >= 0


def test_star_contraction_matches_propagation_on_long_chain(spark):
    """A 200-node path graph — the adversarial case where plain min-label
    propagation needs ~200 rounds; star contraction must collapse it to
    one component (min id 0) in O(log n) rounds, plus a multi-component
    mix to catch cross-component label bleed."""
    import pyspark.sql.functions as F  # noqa: F811

    chain = [(i, i + 1) for i in range(199)]           # component: 0..199
    ring = [(1000 + i, 1000 + (i + 1) % 50) for i in range(50)]  # 1000..1049
    pair = [(5000, 5001)]
    edges = spark.createDataFrame(chain + ring + pair, "u long, v long")
    got = {
        (r.doc_id, r.cluster_id)
        for r in dedup.star_components(edges).collect()
    }
    want = {(i, 0) for i in range(200)}
    want |= {(1000 + i, 1000) for i in range(50)}
    want |= {(5000, 5000), (5001, 5000)}
    assert got == want


def test_ann_quantized_finds_planted_near_duplicate(spark, tmp_path):
    """int8 coarse scoring must keep a 0.999-cosine copy in the shortlist
    and the exact rerank must return it at rank 1 — quantization noise may
    reorder the tail, never the planted near-dup."""
    import random

    rnd = random.Random(17)
    dim = similarity.DIM

    def vec():
        return [rnd.gauss(0, 1) for _ in range(dim)]

    q = vec()
    near = [x + rnd.gauss(0, 0.01) for x in q]
    rows = [(0, q, 0), (100, near, 0)] + [(i, vec(), 1) for i in range(101, 300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = tmp_path / "emb_q"
    df.write.parquet(f"{out}/embeddings.parquet")
    res = similarity.similarity_ann_quantized(spark, str(out)).collect()
    top = {r.query_id: r.neighbor_id for r in res if r.rank == 1}
    assert top.get(0) == 100


def test_source_overlap_matrix_planted_shared_doc(spark, tmp_path):
    shared = "identical article text replicated across two crawls exactly"
    df = spark.createDataFrame(
        [(1, shared, "en", "a", 10), (2, "only in a", "en", "a", 9),
         (3, shared + " ", "en", "b", 10),  # normalization still matches
         (4, "only in b", "en", "b", 9), (5, "only in c", "en", "c", 9)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = tmp_path / "ovl"
    df.write.parquet(f"{out}/documents.parquet")
    rows = {
        (r.src_a, r.src_b): r
        for r in dedup.source_overlap_matrix(spark, str(out)).collect()
    }
    assert set(rows) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert rows[("a", "b")].shared_fps == 1
    assert rows[("a", "c")].shared_fps == 0 and rows[("b", "c")].shared_fps == 0
    # containment normalizes by the smaller side: 1 shared / min(2, 2)
    assert rows[("a", "b")].containment == 0.5
    assert rows[("a", "b")].n_a == 2 and rows[("a", "b")].n_b == 2


def test_boilerplate_ngrams_flags_shared_span_only(spark, tmp_path):
    boiler = "this site uses cookies to improve your browsing experience today"
    df = spark.createDataFrame(
        [(1, boiler + " unique tail alpha beta gamma delta", "en", "s", 1),
         (2, boiler + " other ending words epsilon zeta eta", "en", "s", 1),
         (3, "a fully unique document with ten distinct words here now", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = tmp_path / "boiler"
    df.write.parquet(f"{out}/documents.parquet")
    rows = {
        r.doc_id: r
        for r in dedup.corpus_boilerplate_ngrams(spark, str(out)).collect()
    }
    # the 10-token boilerplate span yields 3 shared 8-grams in docs 1 and 2;
    # every boundary-crossing shingle is unique to its doc
    assert rows[1].n_boilerplate == 3 and rows[2].n_boilerplate == 3
    assert rows[3].n_boilerplate == 0 and rows[3].boilerplate_ratio == 0.0
    assert 0 < rows[1].boilerplate_ratio < 1


def test_sliding_distinct_hand_computed_window(spark, tmp_path):
    from datetime import datetime

    from data_pipeline_python_aws_cdk_spark.operators import analytics

    ev = [
        # (event_id, ts, user_id, event_type, value, props)
        (1, datetime(2026, 1, 1, 9), 1, "click", 1.0, None),
        (2, datetime(2026, 1, 1, 10), 2, "click", 1.0, None),
        (3, datetime(2026, 1, 5, 9), 2, "view", 1.0, None),
        (4, datetime(2026, 1, 9, 9), 3, "view", 1.0, None),
        # day 20: outside every earlier trailing week
        (5, datetime(2026, 1, 20, 9), 1, "click", 1.0, None),
    ]
    df = spark.createDataFrame(
        ev, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = tmp_path / "slide"
    df.write.parquet(f"{out}/events.parquet")
    rows = {
        str(r.day): (r.users_1d, r.users_7d)
        for r in analytics.events_sliding_distinct(spark, str(out)).collect()
    }
    assert rows == {
        "2026-01-01": (2, 2),          # users {1,2}
        "2026-01-05": (1, 2),          # trailing week covers Jan 1: {1,2}
        "2026-01-09": (1, 2),          # Jan 3..9: user 2 (Jan 5) + user 3
        "2026-01-20": (1, 1),          # isolated
    }


def test_lsh_persisted_index_prunes_partitions_and_matches_inline(spark, tmp_path):
    # The lexical-dedup twin of the IVF persisted-index test: corpus band
    # signatures written partitionBy(band, bucket); the probe's bucket
    # hit-list must land in PartitionFilters, and the collision counts must
    # equal the inline dedup_incremental screen for every colliding doc.
    from data_pipeline_python_aws_cdk_spark.operators.dedup import (
        dedup_incremental,
        lsh_build_index,
        lsh_probe_indexed,
    )

    index_dir = str(tmp_path / "lsh_index")
    lsh_build_index(spark, SF_SMOKE, index_dir)
    probed = lsh_probe_indexed(spark, index_dir, SF_SMOKE)
    inline = {
        r.doc_id: r.near_candidates
        for r in dedup_incremental(spark, SF_SMOKE).collect()
    }
    probe_counts = {r.doc_id: r.near_candidates for r in probed.collect()}
    # the probe emits only docs with >=1 collision; inline emits all new docs
    assert probe_counts == {k: v for k, v in inline.items() if v > 0}
    assert probe_counts, "smoke corpus must produce at least one collision"
    plan = probed._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[[^\]]*bucket[^\]]*", plan)
    assert m is not None, "bucket filter missing from index scan PartitionFilters"


def test_chunking_overlap_and_tail_rules(spark, tmp_path):
    from data_pipeline_python_aws_cdk_spark.operators.text import documents_chunking

    hundred = " ".join(f"w{i}" for i in range(100))
    df = spark.createDataFrame(
        [(1, hundred, "en", "s", 1), (2, "just three tokens", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = tmp_path / "chunks"
    df.write.parquet(f"{out}/documents.parquet")
    rows = documents_chunking(spark, str(out)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_id, r.start_tok, r.n_tokens))
    # 100 tokens at chunk=64/stride=48: [1..64] and [49..100] (overlap 16)
    assert by_doc[1] == [(0, 1, 64), (1, 49, 52)]
    # short doc: exactly one shrunken chunk
    assert by_doc[2] == [(0, 1, 3)]


def test_bot_detection_burst_vs_slow_user(spark, tmp_path):
    from datetime import datetime

    from data_pipeline_python_aws_cdk_spark.operators import analytics

    burst = [
        (i, datetime(2026, 1, 1, 10, 0, i * 5), 1, "click", 1.0, None)
        for i in range(6)  # 6 events in 25 s -> burst 6
    ]
    slow = [
        (10 + i, datetime(2026, 1, 1 + i, 10), 2, "view", 1.0, None)
        for i in range(3)  # 3 events over 2 days
    ]
    df = spark.createDataFrame(
        burst + slow,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = tmp_path / "bots"
    df.write.parquet(f"{out}/events.parquet")
    rows = {r.user_id: r for r in analytics.events_bot_detection(spark, str(out)).collect()}
    assert rows[1].max_burst_60s == 6 and rows[1].is_bot
    assert rows[2].max_burst_60s == 1 and not rows[2].is_bot


def test_gram_matrix_exact_on_planted_vectors(spark, tmp_path):
    from data_pipeline_python_aws_cdk_spark.operators.similarity import (
        GRAM_QSCALE,
        embedding_gram_matrix,
    )

    df = spark.createDataFrame(
        [(0, [1.0, 0.0], 0), (1, [0.0, 1.0], 0), (2, [1.0, 1.0], 0),
         (3, [0.5, -0.5], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    out = tmp_path / "gram"
    df.write.parquet(f"{out}/embeddings.parquet")
    got = {
        (r.i, r.j): r.m2
        for r in embedding_gram_matrix(spark, str(out)).collect()
    }
    s = GRAM_QSCALE
    h = s // 2
    # sum(x x^T) over the four vectors, quantized exactly
    assert got == {
        (0, 0): s * s + s * s + h * h,
        (0, 1): s * s - h * h,
        (1, 1): s * s + s * s + h * h,
    }


def test_pca_recovers_planted_plane(spark, tmp_path):
    import numpy as np

    from data_pipeline_python_aws_cdk_spark.operators.similarity import (
        pca_fit,
        pca_project,
    )

    rng = np.random.default_rng(7)
    dim, n = 8, 400
    u = np.zeros(dim); u[0] = 1.0
    v = np.zeros(dim); v[3] = 1.0
    a = rng.normal(0, 3.0, n)
    b = rng.normal(0, 1.5, n)
    x = np.outer(a, u) + np.outer(b, v) + rng.normal(0, 0.01, (n, dim)) + 0.5
    df = spark.createDataFrame(
        [(i, [float(c) for c in x[i]], 0) for i in range(n)],
        "vec_id long, embedding array<float>, label int",
    )
    out = tmp_path / "pca"
    df.write.parquet(f"{out}/embeddings.parquet")

    model = pca_fit(spark, str(out), k=2)
    # orthonormal basis, descending variance
    assert np.allclose(model.components @ model.components.T, np.eye(2), atol=1e-8)
    assert model.explained_variance[0] >= model.explained_variance[1] > 0
    # the planted plane carries ~all variance: top-2 capture >= 99.5%
    total_var = float(np.var(x, axis=0, ddof=0).sum())
    assert model.explained_variance.sum() / total_var > 0.995
    # projection matches the driver-side computation (float32 read-back tol)
    proj = {r.vec_id: np.array(r.proj) for r in pca_project(spark, str(out), model).collect()}
    expect = (x.astype(np.float32).astype(np.float64) - model.mean) @ model.components.T
    err = max(np.abs(proj[i] - expect[i]).max() for i in range(n))
    assert err < 1e-6


def test_audio_chunks_cover_every_sample_exactly_once(spark):
    rows = multimodal.multimodal_audio_chunks(spark, SF_SMOKE).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert by_doc
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        rate = chunks[0].sample_rate
        n = chunks[0].n_samples
        assert rate in multimodal.AUDIO_RATES
        # chunks tile [0, n_samples) exactly: contiguous, non-overlapping,
        # full chunks everywhere except a shrinking tail
        clen = rate * multimodal.AUDIO_CHUNK_SECS
        assert sum(c.chunk_samples for c in chunks) == n
        for i, c in enumerate(chunks):
            assert c.start_sample == i * clen
            assert c.chunk_samples == (clen if i < len(chunks) - 1 else n - i * clen)
            assert 1 <= c.chunk_samples <= clen


def test_lang_confusion_shares_sum_to_one_per_truth(spark):
    rows = text.corpus_lang_confusion(spark, SF_SMOKE).collect()
    per_truth = {}
    for r in rows:
        per_truth.setdefault(r.labeled_lang, 0.0)
        per_truth[r.labeled_lang] += r.recall_share
        assert r.detected_lang in ("en", "de", "es")  # the classifier's range
        assert r.docs > 0
    # every ground-truth language's detected shares partition its docs
    for lang, s in per_truth.items():
        assert abs(s - 1.0) < 1e-4, (lang, s)


def test_perplexity_buckets_ordered_and_partition_docs(spark):
    from data_pipeline_python_aws_cdk_spark.tables import load_table

    rows = text.corpus_perplexity_buckets(spark, SF_SMOKE).collect()
    docs_total = sum(r.docs for r in rows)
    assert docs_total == load_table(spark, SF_SMOKE, "documents").count()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, bs in by_lang.items():
        names = [b.bucket for b in bs]
        assert names == ["head", "middle", "tail"][: len(names)], lang
        # terciles are score-ordered: head's max <= middle's min, etc.
        for a, b in zip(bs, bs[1:]):
            assert a.max_nll <= b.min_nll + 1e-9, lang
        # NTILE balance: sizes differ by at most 1
        sizes = [b.docs for b in bs]
        assert max(sizes) - min(sizes) <= 1, lang


def _reference_bpe(word_freqs, n_merges):
    """Pure-Python Sennrich-style BPE: overlapping pair counts, argmax with
    (count desc, pair asc) tie-break, greedy left-to-right merge."""
    state = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for syms, f in state.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = counts.get((syms[i], syms[i + 1]), 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        merges.append((f"{a} {b}", cnt))
        new_state = {}
        for syms, f in state.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_state[tuple(out)] = new_state.get(tuple(out), 0) + f
        state = new_state
    return merges


def test_bpe_train_matches_pure_python_reference(spark, tmp_path):
    docs = [
        (1, "low low low lower lowest", "en", "s", 1),
        (2, "new newer newest low new", "en", "s", 1),
        (3, "wider wide wide new lower", "en", "s", 1),
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = tmp_path / "bpe"
    df.write.parquet(f"{out}/documents.parquet")

    wf = {}
    for _, t, *_ in docs:
        for w in t.split():
            wf[w] = wf.get(w, 0) + 1
    expected = _reference_bpe(wf, 6)
    got = text.bpe_train(spark, str(out), n_merges=6)
    assert got["merges"] == expected
    # every merge strictly shrinks the symbol stream by its pair count
    base = sum(len(w) * f for w, f in wf.items())
    assert got["total_symbols"] == base - sum(c for _, c in expected)
    # vocab grows by one learned symbol per merge over the base alphabet
    alphabet = {c for w in wf for c in w}
    assert got["vocab_size"] <= len(alphabet) + len(expected)


def test_bpe_pair_counts_weighted_by_word_freq(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "ab ab ab", "en", "s", 1), (2, "ab cd", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = tmp_path / "bpepc"
    df.write.parquet(f"{out}/documents.parquet")
    rows = {r.pair: r.cnt for r in text.corpus_bpe_pair_counts(spark, str(out)).collect()}
    assert rows == {"a b": 4, "c d": 1}


def test_bpe_train_property_random_corpora(spark, tmp_path):
    """Property: on randomized small corpora the distributed trainer agrees
    with the pure-Python reference merge-for-merge (argmax tie-breaks,
    greedy left-to-right rewrite, overlapping-pair counting)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    word = st.text(alphabet="abcd", min_size=1, max_size=6)
    corpus = st.lists(
        st.lists(word, min_size=1, max_size=8).map(" ".join),
        min_size=1,
        max_size=4,
    )

    case = [0]

    @given(texts=corpus)
    @settings(
        max_examples=6, deadline=None, suppress_health_check=list(HealthCheck)
    )
    def check(texts):
        case[0] += 1
        out = tmp_path / f"bpe_prop_{case[0]}"
        spark.createDataFrame(
            [(i, t, "en", "s", 1) for i, t in enumerate(texts)],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(f"{out}/documents.parquet")
        wf = {}
        for t in texts:
            for w in t.lower().split():
                wf[w] = wf.get(w, 0) + 1
        expected = _reference_bpe(wf, 4)
        got = text.bpe_train(spark, str(out), n_merges=4)
        assert got["merges"] == expected

    check()


def test_pq_seed_vectors_reconstruct_exactly(spark):
    """The PQ_K seed vectors ARE codewords, so their own reconstruction
    error must be exactly zero and every other vector's must be >= 0;
    codes must fit in PQ_M nibbles."""
    rows = {r.vec_id: r for r in similarity.embedding_pq_codes(spark, SF_SMOKE).collect()}
    assert len(rows) > similarity.PQ_K
    for vid, r in rows.items():
        assert 0 <= r.pq_code < (1 << (4 * similarity.PQ_M))
        if vid < similarity.PQ_K:
            assert r.recon_err_micro == 0, vid
        else:
            assert r.recon_err_micro >= 0


def test_pq_adc_top1_mostly_agrees_with_exact(spark):
    """ADC is approximate, but with a 50-deep shortlist over 150 vectors
    the reranked top-1 should equal the exact brute-force top-1 for most
    queries (the rerank is exact; only shortlist misses can differ)."""
    exact = {
        r.query_id: r.neighbor_id
        for r in similarity.similarity_topk(spark, SF_SMOKE).collect()
        if r.rank == 1
    }
    adc = {
        r.query_id: r.neighbor_id
        for r in similarity.similarity_ann_pq_adc(spark, SF_SMOKE).collect()
        if r.rank == 1
    }
    assert set(adc) == set(exact)
    agree = sum(1 for q in exact if adc[q] == exact[q])
    assert agree >= len(exact) // 2, (agree, len(exact))


def test_duplicate_vectors_planted_copies_and_label_conflict(spark, tmp_path):
    v1 = [0.1] * 64
    v2 = [0.2] * 64
    v3 = [float(i) / 64 for i in range(64)]
    df = spark.createDataFrame(
        [(0, v1, 1), (1, v2, 2), (2, v1, 1), (3, v1, 3), (4, v3, 4), (5, v2, 2)],
        "vec_id long, embedding array<float>, label long",
    )
    out = tmp_path / "dupvec"
    df.write.parquet(f"{out}/embeddings.parquet")
    rows = {
        r.keep_vec_id: r
        for r in similarity.embedding_duplicate_vectors(spark, str(out)).collect()
    }
    # v1 appears 3x under labels {1,3} (conflict!), v2 2x under one label,
    # v3 is unique and must not appear
    assert set(rows) == {0, 1}
    assert rows[0].copies == 3 and rows[0].labels == 2
    assert rows[1].copies == 2 and rows[1].labels == 1


def test_ivf_index_carries_its_codebook(spark, tmp_path):
    """The persisted IVF index must be probed with the exact codebook it
    was built from: a custom (k-means) codebook round-trips through
    _centroids, probes stay self-consistent, and every candidate really
    comes from a probed list. Also pins the measured scoreboard finding:
    on this near-uniform corpus the seed codebook probes better at fixed
    nprobe — the reason the codebook is pluggable rather than silently
    refined."""
    sf = SF_SMOKE
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.similarity_topk(spark, sf).collect()
    }

    seed_dir = str(tmp_path / "ivf_seed")
    similarity.ivf_build_index(spark, sf, seed_dir)
    seed = {(r.query_id, r.neighbor_id)
            for r in similarity.ivf_probe_indexed(spark, seed_dir, sf).collect()}

    ref_dir = str(tmp_path / "ivf_refined")
    cent = similarity.ivf_train_centroids(spark, sf)
    similarity.ivf_build_index(spark, sf, ref_dir, centroids=cent)
    # codebook persisted and readable
    persisted = spark.read.parquet(f"{ref_dir}/_centroids").collect()
    assert len(persisted) == similarity.IVF_NLIST
    ref1 = {(r.query_id, r.neighbor_id)
            for r in similarity.ivf_probe_indexed(spark, ref_dir, sf).collect()}
    ref2 = {(r.query_id, r.neighbor_id)
            for r in similarity.ivf_probe_indexed(spark, ref_dir, sf).collect()}
    assert ref1 == ref2  # deterministic probe against the stored codebook
    assert ref1 != seed  # really using the refined codebook, not seeds

    seed_recall = len(seed & exact) / len(exact)
    ref_recall = len(ref1 & exact) / len(exact)
    assert seed_recall >= 0.8  # the deploy-choice input the scoreboard gives
    assert 0.0 < ref_recall <= 1.0


def test_pq_persisted_index_matches_inline_adc(spark, tmp_path):
    """The persisted PQ code table + codebook must reproduce the inline
    ADC query exactly: same shortlist, same reranked top-k."""
    idx = str(tmp_path / "pq_idx")
    similarity.pq_build_index(spark, SF_SMOKE, idx)
    # 12-byte rows + the codebook ride together
    codes = spark.read.parquet(idx)
    assert codes.columns == ["vec_id", "pq_code"]
    assert spark.read.parquet(f"{idx}/_codebook").count() == similarity.PQ_K

    inline = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in similarity.similarity_ann_pq_adc(spark, SF_SMOKE).collect()
    }
    probed = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in similarity.pq_probe_indexed(spark, idx, SF_SMOKE).collect()
    }
    assert probed == inline


def test_ivfpq_persisted_index_matches_inline_prunes_and_scoreboards(
    spark, tmp_path
):
    """The composed IVF+PQ serving artifact: codes RESIDENT in the IVF
    partition layout, both codebooks riding along, probe partition-pruned
    (centroid INSET in PartitionFilters), result-equal to the inline
    similarity_ann_ivfpq, and surfaced as the ann_ivfpq_indexed row of
    the recall scoreboard with recall identical to the inline row."""
    import re

    idx = str(tmp_path / "ivfpq_idx")
    similarity.ivfpq_build_index(spark, SF_SMOKE, idx)
    rows = spark.read.parquet(idx)
    assert set(rows.columns) == {"vec_id", "pq_code", "centroid_id"}
    assert spark.read.parquet(f"{idx}/_centroids").count() == similarity.IVF_NLIST
    assert spark.read.parquet(f"{idx}/_codebook").count() == similarity.PQ_K
    # resident codes are exactly the gated embedding_pq_codes assignment
    expect = {
        (r.vec_id, r.pq_code)
        for r in similarity.embedding_pq_codes(spark, SF_SMOKE)
        .select("vec_id", "pq_code")
        .collect()
    }
    assert {(r.vec_id, r.pq_code) for r in rows.collect()} == expect

    probed = similarity.ivfpq_probe_indexed(spark, idx, SF_SMOKE)
    inline = similarity.similarity_ann_ivfpq(spark, SF_SMOKE)
    assert {tuple(r) for r in probed.collect()} == {
        tuple(r) for r in inline.collect()
    }
    plan = probed._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[[^\]]*centroid_id[^\]]*INSET", plan)
    assert m is not None, "centroid INSET missing from index scan PartitionFilters"

    rep = {
        r.method: r
        for r in similarity.similarity_ann_recall_report(
            spark, SF_SMOKE, ivfpq_index_dir=idx
        ).collect()
    }
    assert "ann_ivfpq" in rep and "ann_ivfpq_indexed" in rep
    col = f"recall_at_{similarity.TOP_K}"
    assert getattr(rep["ann_ivfpq_indexed"], col) == getattr(rep["ann_ivfpq"], col)

    # the RESIDUAL artifact: residual codes resident per list, probe
    # partition-pruned and result-equal to the inline residual query
    ridx = str(tmp_path / "ivfpq_res_idx")
    similarity.ivfpq_residual_build_index(spark, SF_SMOKE, ridx)
    rrows = spark.read.parquet(ridx)
    assert set(rrows.columns) == {"vec_id", "pq_code", "centroid_id"}
    assert set(spark.read.parquet(f"{ridx}/_codebook").columns) == {
        "k", "bv", "bcv",
    }
    rprobed = similarity.ivfpq_residual_probe_indexed(spark, ridx, SF_SMOKE)
    rinline = similarity.similarity_ann_ivfpq_residual(spark, SF_SMOKE)
    assert {tuple(r) for r in rprobed.collect()} == {
        tuple(r) for r in rinline.collect()
    }
    rplan = rprobed._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[[^\]]*centroid_id[^\]]*INSET", rplan)
    assert m is not None, "residual index scan lost its partition pruning"


def test_pca_whitening_unit_variance_components(spark, tmp_path):
    """Whitened projections must have ~unit variance on every kept
    component (that is the definition); unwhitened variances must echo
    the model's explained_variance spectrum instead."""
    import numpy as np

    rng = np.random.default_rng(11)
    # anisotropic data: variance concentrated along two planted directions
    base = rng.normal(size=(400, 64)) * 0.05
    base[:, 3] += rng.normal(size=400) * 2.0
    base[:, 17] += rng.normal(size=400) * 1.0
    df = spark.createDataFrame(
        [(i, [float(x) for x in row], 0) for i, row in enumerate(base)],
        "vec_id long, embedding array<float>, label long",
    )
    out = tmp_path / "whiten"
    df.write.parquet(f"{out}/embeddings.parquet")

    model = similarity.pca_fit(spark, str(out), k=4)
    plain = np.stack(
        [r.proj for r in similarity.pca_project(spark, str(out), model).collect()]
    )
    white = np.stack(
        [r.proj for r in similarity.pca_project(
            spark, str(out), model, whiten=True
        ).collect()]
    )
    plain_var = plain.var(axis=0, ddof=0)
    white_var = white.var(axis=0, ddof=0)
    # unwhitened: spectrum matches the model's (descending, anisotropic)
    assert plain_var[0] > 5 * plain_var[2]
    np.testing.assert_allclose(plain_var, model.explained_variance, rtol=0.05)
    # whitened: every component ~unit variance
    np.testing.assert_allclose(white_var, np.ones(4), rtol=0.05)


def test_video_near_dup_planted_mirror(spark, tmp_path):
    """Two payloads with identical content must surface as a near-dup pair
    sharing ALL their sampled frames; unrelated payloads must not pair."""
    same = "identical video payload content replicated across two mirrors"
    df = spark.createDataFrame(
        [(1, same, "en", "s", 1), (2, same, "en", "s", 1),
         (3, "completely different footage of something else entirely", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = tmp_path / "viddup"
    df.write.parquet(f"{out}/documents.parquet")

    frames = {
        r.doc_id: r.cnt
        for r in multimodal.multimodal_frame_sample(spark, str(out))
        .groupBy("doc_id").count().withColumnRenamed("count", "cnt").collect()
    }
    pairs = multimodal.multimodal_video_near_dup(spark, str(out)).collect()
    if frames.get(1, 0) >= multimodal.VIDEO_DUP_MIN_FRAMES:
        assert [(p.doc_a, p.doc_b, p.shared_frames) for p in pairs] == [
            (1, 2, frames[1])
        ]
    else:  # content hashing gave this text a short fake video: no verdict
        assert pairs == []


def test_bm25_ranks_planted_rare_term_doc_first(spark, tmp_path):
    # Query doc 0 carries a rare term; exactly one corpus doc repeats it.
    # Every doc shares the common vocabulary, whose idf ~ ln(1 + 0.5/N) is
    # negligible, so the rare-term doc must win rank 1 for query 0.
    common = "the quick brown fox jumps over the lazy dog "
    rows = [(0, common + "zyzzyva", "en", "s", 1)]
    rows += [(i, common * 3, "en", "s", 1) for i in range(10, 24)]
    rows.append((30, common * 2 + "zyzzyva zyzzyva", "en", "s", 1))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = tmp_path / "bm25docs"
    df.write.parquet(f"{out}/documents.parquet")
    got = (
        text.text_bm25_retrieval(spark, str(out))
        .filter(F.col("query_id") == 0)
        .orderBy("rank")
        .collect()
    )
    assert got, "query 0 retrieved nothing"
    assert got[0].neighbor_id == 30
    assert got[0].rank == 1
    # BM25 tf saturation: two occurrences score ABOVE the common-only docs
    # but below 2x a single occurrence's weight.
    assert got[0].bm25 > got[1].bm25


def test_rrf_fuses_lexical_and_semantic_agreement(spark, tmp_path):
    common = "the quick brown fox jumps over the lazy dog "
    rows = [(0, common + "zyzzyva", "en", "s", 1)]
    rows += [(i, common * 3, "en", "s", 1) for i in range(10, 24)]
    rows.append((30, common * 2 + "zyzzyva zyzzyva", "en", "s", 1))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = tmp_path / "rrfdocs"
    df.write.parquet(f"{out}/documents.parquet")
    # Embeddings: vec 30 nearly parallel to query vec 0; the rest orthogonal-ish.
    import random

    rng = random.Random(7)
    def vec(seed_parallel: float | None):
        if seed_parallel is not None:
            return [1.0, seed_parallel] + [0.0] * 6
        return [0.0, 0.0] + [abs(rng.random()) for _ in range(6)]

    evs = [(0, vec(0.0), "a")]
    evs += [(i, vec(None), "a") for i in range(10, 24)]
    evs.append((30, vec(0.05), "a"))
    spark.createDataFrame(
        evs, "vec_id long, embedding array<float>, label string"
    ).write.parquet(f"{out}/embeddings.parquet")
    fused = (
        text.retrieval_hybrid_rrf(spark, str(out))
        .filter(F.col("query_id") == 0)
        .orderBy("rank")
        .collect()
    )
    assert fused[0].neighbor_id == 30
    # found by BOTH systems -> both audit flags set, fused score = 2/(60+1)
    assert fused[0].in_lexical and fused[0].in_semantic
    assert abs(fused[0].rrf - 2 / 61) < 1e-6


def test_bm25_index_probe_matches_inline_with_pruning(spark, tmp_path):
    from data_pipeline_python_aws_cdk_spark.operators.text import (
        bm25_build_index,
        bm25_probe_indexed,
        text_bm25_retrieval,
    )

    index_dir = str(tmp_path / "bm25_index")
    bm25_build_index(spark, SF_SMOKE, index_dir)
    probed = bm25_probe_indexed(spark, index_dir, SF_SMOKE)
    inline = text_bm25_retrieval(spark, SF_SMOKE)
    assert {tuple(r) for r in probed.collect()} == {tuple(r) for r in inline.collect()}
    # The query-term bucket list must land in the index scan's
    # PartitionFilters — the file-level pruning that makes a probe
    # O(collided posting lists) instead of a corpus scan. (The smoke
    # corpus's tiny vocabulary may hit many of the 64 buckets; assert the
    # mechanism, like the IVF/LSH twins.)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[[^\]]*bucket[^\]]*", plan)
    assert m is not None, "bucket filter missing from index scan PartitionFilters"


def test_cosine_arrow_null_safe(spark):
    from data_pipeline_python_aws_cdk_spark.functions.vectors import cosine_arrow

    df = spark.createDataFrame(
        [(1, [1.0, 0.0], [1.0, 0.0]),
         (2, None, [1.0, 0.0]),
         (3, [0.0, 1.0], None),
         (4, [0.0, 0.0], [1.0, 0.0])],  # zero norm -> NaN -> NULL via Arrow
        "id long, a array<float>, b array<float>",
    )
    rows = {r.id: r.c for r in df.select("id", cosine_arrow("a", "b").alias("c")).collect()}
    assert rows[1] == 1.0
    assert rows[2] is None and rows[3] is None and rows[4] is None


def test_index_probe_rejects_hash_mode_mismatch(spark, tmp_path, monkeypatch):
    """An index built under one hash family must refuse a probe under the
    other: bucket/band-key layouts derive from hash60, so a cross-mode
    probe would prune to the wrong partitions and silently drop postings.
    The _meta sidecar turns that silent wrong answer into a loud error."""
    from data_pipeline_python_aws_cdk_spark.functions.hashing import HASH_MODE_ENV
    from data_pipeline_python_aws_cdk_spark.operators.dedup import (
        lsh_build_index,
        lsh_probe_indexed,
    )
    from data_pipeline_python_aws_cdk_spark.operators.text import (
        bm25_build_index,
        bm25_probe_indexed,
    )

    from data_pipeline_python_aws_cdk_spark.operators.dedup import (
        exact_substring_dedup_indexed,
        span_removal_plan_indexed,
        substring_index_build,
    )

    bm25_dir = str(tmp_path / "bm25_modecheck")
    lsh_dir = str(tmp_path / "lsh_modecheck")
    sub_dir = str(tmp_path / "substring_modecheck")
    bm25_build_index(spark, SF_SMOKE, bm25_dir)  # built under default: oracle
    lsh_build_index(spark, SF_SMOKE, lsh_dir)
    substring_index_build(spark, SF_SMOKE, sub_dir)
    monkeypatch.setenv(HASH_MODE_ENV, "production")
    with pytest.raises(ValueError, match="HASH_MODE"):
        bm25_probe_indexed(spark, bm25_dir, SF_SMOKE)
    with pytest.raises(ValueError, match="HASH_MODE"):
        lsh_probe_indexed(spark, lsh_dir, SF_SMOKE)
    # the substring-family consumers guard the same way: a cross-mode
    # probe computes different window hashes and would match NOTHING —
    # every doc silently routed 'new' — so it must refuse loudly instead
    with pytest.raises(ValueError, match="HASH_MODE"):
        exact_substring_dedup_indexed(spark, sub_dir)
    with pytest.raises(ValueError, match="HASH_MODE"):
        span_removal_plan_indexed(spark, sub_dir)
    # matching mode still probes fine
    monkeypatch.setenv(HASH_MODE_ENV, "oracle")
    assert bm25_probe_indexed(spark, bm25_dir, SF_SMOKE).count() > 0
    assert exact_substring_dedup_indexed(spark, sub_dir).count() >= 0


# --- round-6 curation/audit tier ----------------------------------------------


def _write_docs(spark, tmp_path, rows, name="r6docs"):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = tmp_path / name
    df.write.parquet(f"{out}/documents.parquet")
    return str(out)


def test_readability_exact_counts_and_null_grade(spark, tmp_path):
    # "go go go. stop now." -> 5 words, 2 sentence runs, 5 vowel runs
    sf = _write_docs(
        spark,
        tmp_path,
        [(1, "go go go. stop now.", "en", "s", 19),
         (2, "no terminator here", "en", "s", 18)],
    )
    rows = {r.doc_id: r for r in text.text_readability(spark, sf).collect()}
    r1 = rows[1]
    assert (r1.n_words, r1.n_sentences, r1.n_syllables) == (5, 2, 5)
    expected = round(0.39 * (5 / 2) + 11.8 * (5 / 5) - 15.59, 4)
    assert abs(r1.fk_grade - expected) < 1e-9
    assert rows[2].fk_grade is None  # no sentence terminator -> NULL, not 0


def test_code_prose_classifier_routes_planted_code(spark, tmp_path):
    code = "def f(x):\n    return g(x) + h[0];\n    y = {a: b};\n" * 5
    prose = "the quiet morning light settled gently over the harbor town " * 5
    sf = _write_docs(
        spark,
        tmp_path,
        [(1, code, "en", "s", len(code)), (2, prose, "en", "s", len(prose))],
    )
    rows = {r.doc_id: r for r in text.text_code_prose_classify(spark, sf).collect()}
    assert rows[1].is_code and rows[1].code_score > rows[2].code_score
    assert not rows[2].is_code
    assert rows[1].n_indent_breaks > 0


def test_train_eval_split_is_hash_stable_and_partition_independent(spark, tmp_path):
    from data_pipeline_python_aws_cdk_spark.functions.hashing import hash60_py

    rows = [(i, f"doc body number {i} with several tokens", "en",
             "src_a" if i % 2 else "src_b", 30) for i in range(200)]
    sf = _write_docs(spark, tmp_path, rows)
    out = text.corpus_train_eval_split(spark, sf).collect()
    # fractions within each source sum to 1
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        assert abs(sum(x.frac_of_source for x in rs) - 1.0) < 1e-6, src
        assert sum(x.n_docs for x in rs) == 100
    # the realized split matches the salted-hash contract exactly
    expected = {"train": 0, "valid": 0, "test": 0}
    for i in range(200):
        b = hash60_py(str(i), salt=text.SPLIT_SALT) % 100
        expected[
            "train" if b < text.SPLIT_TRAIN_PCT
            else "valid" if b < text.SPLIT_TRAIN_PCT + text.SPLIT_VALID_PCT
            else "test"
        ] += 1
    got = {}
    for r in out:
        got[r.split] = got.get(r.split, 0) + r.n_docs
    assert got == {k: v for k, v in expected.items() if v}


def test_mahalanobis_flags_planted_outlier(spark, tmp_path):
    import random

    rnd = random.Random(11)
    dim = similarity.DIM
    rows = [(i, [rnd.gauss(0, 1) for _ in range(dim)], 0) for i in range(100)]
    rows.append((100, [8.0] * dim, 0))  # ~8 sigma in every dimension
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = tmp_path / "emb_outlier"
    df.write.parquet(f"{out}/embeddings.parquet")
    res = {r.vec_id: r for r in
           similarity.embedding_outlier_mahalanobis(spark, str(out)).collect()}
    assert res[100].is_outlier
    assert res[100].m_dist > max(res[i].m_dist for i in range(100))
    assert sum(1 for i in range(100) if res[i].is_outlier) == 0


def test_centroid_classify_separable_labels_give_diagonal_confusion(spark, tmp_path):
    import random

    rnd = random.Random(13)
    dim = similarity.DIM
    rows = []
    vid = 0
    for label in (0, 1):
        base = [(+3.0 if label == 0 else -3.0)] * (dim // 2) + [
            (-3.0 if label == 0 else +3.0)
        ] * (dim - dim // 2)
        for _ in range(40):
            rows.append(
                (vid, [b + rnd.gauss(0, 0.3) for b in base], label)
            )
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = tmp_path / "emb_classes"
    df.write.parquet(f"{out}/embeddings.parquet")
    conf = similarity.similarity_centroid_classify(spark, str(out)).collect()
    assert {(r.true_label, r.pred_label) for r in conf} == {(0, 0), (1, 1)}
    assert all(r.frac_of_true == 1.0 for r in conf)


def test_hubness_histogram_accounts_for_every_topk_row(spark):
    topk_rows = similarity.similarity_topk(spark, SF_SMOKE).count()
    hist = similarity.embedding_hubness_report(spark, SF_SMOKE).collect()
    assert sum(r.n_lists * r.n_neighbors for r in hist) == topk_rows
    # neighbors_at_least is a reverse-cumulative count: its max equals the
    # distinct-neighbor total, reached at the smallest occurrence bucket
    assert hist[0].neighbors_at_least == sum(r.n_neighbors for r in hist)


def test_dedup_impact_charges_drop_to_the_right_source(spark, tmp_path):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 10
    near = base.replace("gamma", "gamma2", 1)
    far = "one two three four five six seven eight nine ten " * 10
    sf = _write_docs(
        spark,
        tmp_path,
        [(1, base, "en", "dup_src", len(base)),
         (2, near, "en", "dup_src", len(near)),
         (3, far, "en", "clean_src", len(far))],
    )
    rep = {r.source: r for r in
           dedup.corpus_dedup_impact_report(spark, sf).collect()}
    assert rep["dup_src"].docs_total == 2 and rep["dup_src"].docs_dropped == 1
    assert rep["clean_src"].docs_dropped == 0
    assert rep["dup_src"].tokens_dropped > 0
    assert rep["clean_src"].token_drop_rate == 0.0


def test_span_decontaminate_locates_planted_leak(spark, tmp_path):
    from data_pipeline_python_aws_cdk_spark.functions.hashing import hash60_py
    from data_pipeline_python_aws_cdk_spark.operators.dedup import DECON_TRAIN_PCT

    # find one train-split id and one test-split id under the salted hash
    def split_of(i):
        return "train" if hash60_py(str(i), salt="split") % 100 < DECON_TRAIN_PCT else "test"

    train_id = next(i for i in range(1000) if split_of(i) == "train")
    test_id = next(i for i in range(1000) if split_of(i) == "test")
    bench = "the secret benchmark passage that must never leak into training data"
    filler = " ".join(f"tok{j}" for j in range(20))
    sf = _write_docs(
        spark,
        tmp_path,
        [(train_id, f"{filler} {bench} {filler}", "en", "s", 10),
         (test_id, f"intro words here {bench} trailing words follow now", "en", "s", 10)],
    )
    rows = dedup.corpus_span_decontaminate(spark, sf).collect()
    assert [r.doc_id for r in rows] == [test_id]
    r = rows[0]
    # the planted passage is one contiguous leak: a single maximal span
    assert r.n_spans == 1
    assert r.n_hit_positions >= 1
    # covered tokens = hit positions + window tail (8-gram)
    assert r.contaminated_tokens == r.n_hit_positions + 7
    assert r.first_hit_pos == 4  # "intro words here" = 3 tokens, hit starts at 4
    assert 0 < r.contaminated_frac < 1


def test_encoding_artifacts_flags_planted_mojibake(spark, tmp_path):
    clean = "a perfectly ordinary sentence with nothing wrong at all " * 3
    moji = ("the caf\u00c3\u00a9 serves \u00e2\u20ac\u0153coffee\u00e2\u20ac\u009d"
            " and cr\u00c3\u00a8me br\u00c3\u00bbl\u00c3\u00a9e ") * 3
    broken = "data \ufffd with replacement \ufffd characters " * 2
    sf = _write_docs(
        spark,
        tmp_path,
        [(1, clean, "en", "s", len(clean)), (2, moji, "en", "s", len(moji)),
         (3, broken, "en", "s", len(broken))],
    )
    rows = {r.doc_id: r for r in text.text_encoding_artifacts(spark, sf).collect()}
    assert not rows[1].is_suspect and rows[1].artifact_score == 0.0
    assert rows[2].is_suspect and rows[2].n_mojibake > 0
    assert rows[3].is_suspect and rows[3].n_replacement == 4


def test_lsh_recall_report_accounts_on_planted_dups(spark, tmp_path):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 10
    near = base.replace("gamma", "gamma2", 1)
    far = "one two three four five six seven eight nine ten " * 10
    sf = _write_docs(
        spark,
        tmp_path,
        [(1, base, "en", "s", len(base)), (2, near, "en", "s", len(near)),
         (3, far, "en", "s", len(far))],
    )
    r = dedup.dedup_lsh_recall_report(spark, sf).collect()[0]
    # the one planted near-dup pair is both the truth and the LSH find
    assert r.n_truth == 1 and r.true_pos == 1 and r.recall == 1.0
    assert r.n_candidates >= r.n_lsh_verified
    assert r.candidate_precision <= 1.0


def test_oov_rate_spikes_on_unseen_domain(spark, tmp_path):
    from data_pipeline_python_aws_cdk_spark.functions.hashing import hash60_py
    from data_pipeline_python_aws_cdk_spark.operators.text import (
        SPLIT_SALT, SPLIT_TRAIN_PCT,
    )

    train_ids = [i for i in range(400)
                 if hash60_py(str(i), salt=SPLIT_SALT) % 100 < SPLIT_TRAIN_PCT]
    test_ids = [i for i in range(400)
                if hash60_py(str(i), salt=SPLIT_SALT) % 100 >= SPLIT_TRAIN_PCT]
    common = "the quick brown fox jumps over the lazy dog"
    rows = [(i, common, "en", "seen", len(common)) for i in train_ids[:50]]
    # held-out docs in the seen domain reuse train vocabulary -> low OOV
    rows += [(i, common, "en", "seen", len(common)) for i in test_ids[:3]]
    # held-out docs in an unseen domain -> every token is OOV
    alien = "zxqv wvzk qqjx mmzp glorp blargh"
    rows += [(i, alien, "xx", "unseen", len(alien)) for i in test_ids[3:6]]
    sf = _write_docs(spark, tmp_path, rows)
    out = {r.source: r for r in text.corpus_oov_rate(spark, sf).collect()}
    assert out["seen"].oov_rate == 0.0
    assert out["unseen"].oov_rate == 1.0


# ---------------------------------------------------------------------------
# round-7 debut operators: planted-case behavioral tests
# ---------------------------------------------------------------------------


def test_fuzzy_match_covers_all_three_edit_kinds(spark, tmp_path):
    """The four-pass blocking must reach every lev<=1 pair kind within a
    nation: substitution (equal length), insertion/deletion at the tail
    (prefix cross-length pass), and insertion/deletion at the head (suffix
    cross-length pass) — and nothing at lev 2 or across nations."""
    from data_pipeline_python_aws_cdk_spark.operators import analytics

    rows = [
        (1, "alice smith", 0, 0.0, "SEG1"),
        (2, "alice smiths", 0, 0.0, "SEG1"),   # insertion at end  -> lev 1
        (3, "alice smyth", 0, 0.0, "SEG2"),    # substitution      -> lev 1
        (4, "blice smith", 0, 0.0, "SEG1"),    # substitution head -> lev 1
        (5, "xalice smith", 0, 0.0, "SEG1"),   # insertion at head -> lev 1
        (6, "totally different name", 0, 0.0, "SEG1"),
        (7, "alice smith", 1, 0.0, "SEG1"),    # right name, wrong nation
    ]
    df = spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    )
    out = tmp_path / "cust_fuzzy"
    df.write.parquet(f"{out}/customer.parquet")
    got = analytics.customers_fuzzy_match(spark, str(out)).collect()
    pairs = {(r.custkey_a, r.custkey_b) for r in got}
    assert pairs == {(1, 2), (1, 3), (1, 4), (1, 5)}
    by = {(r.custkey_a, r.custkey_b): r for r in got}
    assert all(r.edit_distance == 1 for r in got)
    assert by[(1, 2)].same_segment is True
    assert by[(1, 3)].same_segment is False


def test_scd2_collapses_runs_and_opens_current(spark, tmp_path):
    """view,view,click,view -> three intervals: the first closed at the
    click, the click closed at the return to view, the last open-ended
    (valid_to NULL, is_current)."""
    from datetime import datetime

    from data_pipeline_python_aws_cdk_spark.operators import analytics

    t = [datetime(2026, 1, 1, 10, 0, i) for i in range(4)]
    rows = [
        (1, t[0], 7, "view", 0.0, "{}"),
        (2, t[1], 7, "view", 0.0, "{}"),
        (3, t[2], 7, "click", 0.0, "{}"),
        (4, t[3], 7, "view", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = tmp_path / "ev_scd2"
    df.write.parquet(f"{out}/events.parquet")
    got = analytics.events_scd2_user_state(spark, str(out)).collect()
    assert [(r.run_id, r.state, r.run_events, r.is_current) for r in got] == [
        (1, "view", 2, False),
        (2, "click", 1, False),
        (3, "view", 1, True),
    ]
    assert got[0].valid_from == "2026-01-01 10:00:00"
    assert got[0].valid_to == "2026-01-01 10:00:02"     # closed by the click
    assert got[1].valid_to == "2026-01-01 10:00:03"
    assert got[2].valid_to is None


def test_attribution_window_edges_and_credit_split(spark, tmp_path):
    """Two in-window clicks split linear credit 500000/500000 and take
    first/last respectively; a click exactly 7 days before the purchase is
    OUTSIDE the window (strict >), a click after the purchase never counts,
    and a user with clicks but no purchase contributes nothing."""
    from datetime import datetime

    from data_pipeline_python_aws_cdk_spark.operators import analytics

    p_ts = datetime(2026, 1, 10, 12, 0, 0)
    rows = [
        (1, datetime(2026, 1, 5, 12, 0, 0), 1, "click", 0.0, '{"k": 1}'),
        (2, datetime(2026, 1, 8, 12, 0, 0), 1, "click", 0.0, '{"k": 2}'),
        (3, datetime(2026, 1, 3, 12, 0, 0), 1, "click", 0.0, '{"k": 3}'),  # = p_ts - 7d
        (4, datetime(2026, 1, 11, 12, 0, 0), 1, "click", 0.0, '{"k": 4}'),  # after
        (100, p_ts, 1, "purchase", 9.0, "{}"),
        (5, datetime(2026, 1, 5, 0, 0, 0), 2, "click", 0.0, '{"k": 1}'),   # no conv
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = tmp_path / "ev_attr"
    df.write.parquet(f"{out}/events.parquet")
    got = {r.campaign: r for r in analytics.events_attribution(spark, str(out)).collect()}
    assert set(got) == {1, 2}
    assert (got[1].touches, got[1].conversions_first, got[1].conversions_last) == (1, 1, 0)
    assert (got[2].touches, got[2].conversions_first, got[2].conversions_last) == (1, 0, 1)
    assert got[1].linear_credit_micro == got[2].linear_credit_micro == 500000


def test_dsir_weights_track_target_vocabulary(spark, tmp_path):
    """Docs made of target-slice vocabulary score positive regardless of
    their own lang tag; docs of never-in-target vocabulary score negative —
    the importance weight follows the token distribution, not the label."""
    from data_pipeline_python_aws_cdk_spark.operators import text

    cat = ("cat " * 1000).strip()
    hund = ("hund " * 1000).strip()
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, cat, "en", "s", len(cat)),
            (2, cat, "en", "s", len(cat)),
            (3, hund, "de", "s", len(hund)),
            (4, cat, "de", "s", len(cat)),  # target-like tokens, non-target lang
        ],
        name="dsir_docs",
    )
    got = {r.doc_id: r for r in text.corpus_dsir_weights(spark, sf).collect()}
    assert all(got[i].n_tokens == 1000 for i in (1, 2, 3, 4))
    assert got[1].dsir_weight_micro == got[2].dsir_weight_micro == got[4].dsir_weight_micro
    assert got[4].dsir_weight_micro > 0 and got[4].target_like is True
    assert got[3].dsir_weight_micro < 0 and got[3].target_like is False


def test_nb_classifier_pulls_fair_docs_toward_their_vocabulary(spark, tmp_path):
    """Teacher extremes train the hashed-unigram NB; 'fair' docs (never in
    the training mass) must be routed by vocabulary: good-vocab fair doc
    scores positive, poor-vocab fair doc negative, teacher_agree NULL."""
    from data_pipeline_python_aws_cdk_spark.operators import text

    good = ("alpha beta gamma delta " * 15).strip()   # 60 tokens, no punct
    poor = ("zork " * 10).strip()                      # 10 tokens -> 'poor'
    fair_good = ("alpha beta gamma delta " * 7).strip()  # 28 tokens -> 'fair'
    fair_poor = ("zork " * 25).strip()                   # 25 tokens -> 'fair'
    rows = [(i, good, "en", "s", len(good)) for i in (1, 2, 3)]
    rows += [(i, poor, "en", "s", len(poor)) for i in (4, 5, 6)]
    rows += [(7, fair_good, "en", "s", len(fair_good)),
             (8, fair_poor, "en", "s", len(fair_poor))]
    sf = _write_docs(spark, tmp_path, rows, name="nb_docs")
    got = {r.doc_id: r for r in text.text_nb_quality_classify(spark, sf).collect()}
    assert [got[i].teacher for i in range(1, 9)] == [
        "good", "good", "good", "poor", "poor", "poor", "fair", "fair"
    ]
    for i in (1, 2, 3):
        assert got[i].predicted_good is True and got[i].teacher_agree is True
    for i in (4, 5, 6):
        assert got[i].predicted_good is False and got[i].teacher_agree is True
    assert got[7].predicted_good is True and got[7].teacher_agree is None
    assert got[8].predicted_good is False and got[8].teacher_agree is None


def test_duplicate_passages_finds_planted_shared_passage(spark, tmp_path):
    """A 600-token passage planted in three docs (behind distinct prefixes)
    must surface with n_docs=3, the smallest doc as representative, and
    every reported passage sliced from inside the shared region."""
    from data_pipeline_python_aws_cdk_spark.operators import dedup

    shared_toks = [f"p{i}" for i in range(600)]
    shared = " ".join(shared_toks)
    docs = []
    for d, pre in ((1, "a"), (2, "b"), (3, "c")):
        txt = " ".join(f"{pre}{j}" for j in range(10)) + " " + shared
        docs.append((d, txt, "en", "s", len(txt)))
    noise = " ".join(f"z{j}" for j in range(200))
    docs.append((4, noise, "en", "s", len(noise)))
    sf = _write_docs(spark, tmp_path, docs, name="dup_pass_docs")
    got = dedup.corpus_duplicate_passages(spark, sf).collect()
    assert len(got) >= 1
    for r in got:
        assert r.n_docs == 3
        assert r.n_occurrences == 3
        assert r.rep_doc == 1
        assert set(r.passage.split()) <= set(shared_toks)


def test_cluster_profiles_accounting_on_planted_cells(spark, tmp_path):
    """Exact copies of centroid 0 (labels 5,5,7) land in cell 0 with
    cohesion 1.0, dominant label 5 at share 0.5; unlabeled singleton cells
    report n_labels=0 and a NULL top_label."""
    from data_pipeline_python_aws_cdk_spark.operators import similarity

    dim, nlist = similarity.DIM, similarity.IVF_NLIST

    def onehot(i):
        return [1.0 if j == i else 0.0 for j in range(dim)]

    rows = [(i, onehot(i), None) for i in range(nlist)]          # centroids
    rows += [(100, onehot(0), 5), (101, onehot(0), 5), (102, onehot(0), 7)]
    rows += [(103, onehot(1), 3)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = tmp_path / "emb_cells"
    df.write.parquet(f"{out}/embeddings.parquet")
    got = {r.cell: r for r in similarity.embedding_cluster_profiles(spark, str(out)).collect()}
    assert len(got) == nlist
    c0 = got[0]
    assert (c0.n_vectors, c0.n_labels, c0.top_label) == (4, 2, 5)
    assert c0.top_label_share == 0.5
    assert c0.avg_cos_centroid == 1.0
    c1 = got[1]
    assert (c1.n_vectors, c1.n_labels, c1.top_label) == (2, 1, 3)
    for cell in range(2, nlist):
        r = got[cell]
        assert (r.n_vectors, r.n_labels) == (1, 0)
        assert r.top_label is None and r.top_label_share is None
        assert r.avg_cos_centroid == 1.0


# ---------------------------------------------------------------------------
# round-8 debut operators: planted-case behavioral tests
# ---------------------------------------------------------------------------


def test_prefix_filter_join_equals_bruteforce_truth(spark, tmp_path):
    """Prefix filtering is LOSSLESS: on a fixture with a planted near-dup,
    the output must equal the brute-force 4-gram Jaccard truth exactly —
    same single pair, bit-equal jaccard computed independently in Python."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 10
    near = base.replace("gamma", "gamma2", 1)
    far = "one two three four five six seven eight nine ten " * 10
    sf = _write_docs(
        spark,
        tmp_path,
        [(1, base, "en", "s", len(base)), (2, near, "en", "s", len(near)),
         (3, far, "en", "s", len(far))],
        name="ppjoin_docs",
    )
    got = dedup.dedup_prefix_filter_join(spark, sf).collect()
    assert [(r.doc_a, r.doc_b) for r in got] == [(1, 2)]

    def grams(txt, w=dedup.PREFIX_W):
        t = txt.lower().split()
        return {" ".join(t[i : i + w]) for i in range(len(t) - w + 1)}

    a, b = grams(base), grams(near)
    want = round(len(a & b) / len(a | b), 6)
    assert got[0].jaccard == want
    assert got[0].common_shingles == len(a & b)


def test_silhouette_separates_tight_and_boundary_vectors(spark, tmp_path):
    """Exact centroid copies score silhouette 1; a vector equidistant
    between two centroids scores 0 (tie pinned explicitly) and counts as
    boundary in its lowest-id cell."""
    dim, nlist = similarity.DIM, similarity.IVF_NLIST

    def onehot(i, scale=1.0):
        return [scale if j == i else 0.0 for j in range(dim)]

    mid = [0.0] * dim
    mid[0] = mid[1] = 1.0  # cos 0.707107 to BOTH e0 and e1 -> s = 0, cell 0
    rows = [(i, onehot(i), None) for i in range(nlist)]
    rows += [(100, onehot(0), 1), (101, onehot(0), 1)]  # s = 1 each
    rows += [(102, mid, 2)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = tmp_path / "emb_sil"
    df.write.parquet(f"{out}/embeddings.parquet")
    got = {r.cell: r for r in similarity.embedding_silhouette(spark, str(out)).collect()}
    c0 = got[0]
    # centroid 0 itself + two copies (s=1) + the midpoint (s=0)
    assert c0.n_vectors == 4
    assert c0.n_boundary == 1
    assert c0.avg_silhouette == 0.75
    assert got[1].n_vectors == 1 and got[1].avg_silhouette == 1.0


def test_quality_survivors_prefers_bucket_then_length_then_id(spark, tmp_path):
    """In a 3-doc near-dup cluster the keeper is the best-bucket copy, not
    the lowest id: doc 1 (punctuation-degraded, 'fair') loses to doc 2
    ('good'); doc 3 ties doc 2 on bucket and tokens and loses on id."""
    base = " ".join(f"w{i}" for i in range(60))          # 60 clean tokens
    noisy = base + " " + "!" * 30                          # punct ratio > 0.05
    edited = base.replace("w30", "w30x", 1)
    other = "completely different text " * 10
    sf = _write_docs(
        spark,
        tmp_path,
        [(1, noisy, "en", "s", len(noisy)), (2, base, "en", "s", len(base)),
         (3, edited, "en", "s", len(edited)), (4, other, "en", "s", len(other))],
        name="qsurv_docs",
    )
    got = {r.doc_id: r for r in dedup.dedup_quality_survivors(spark, sf).collect()}
    assert got[1].cluster_size == 3
    assert all(got[i].survivor_doc == 2 for i in (1, 2, 3))
    assert [got[i].is_survivor for i in (1, 2, 3, 4)] == [False, True, False, True]
    assert got[1].quality_rank == 1 and got[2].quality_rank == 2


def test_heaps_law_exact_on_unique_vocab(spark, tmp_path):
    """Eight docs of ten unique tokens each: vocab == tokens at every
    checkpoint, so the realized Heaps exponent is exactly 1.0 (beta_micro
    1000000) and the first checkpoint's beta is NULL."""
    from data_pipeline_python_aws_cdk_spark.operators import text

    rows = []
    for i in range(1, 9):
        t = " ".join(f"t{i}_{j}" for j in range(10))
        rows.append((i, t, "en", "s", len(t)))
    sf = _write_docs(spark, tmp_path, rows, name="heaps_docs")
    got = text.corpus_heaps_law(spark, sf).collect()
    assert [(r.step, r.doc_ceiling, r.cum_docs, r.cum_tokens, r.vocab)
            for r in got] == [
        (1, 1, 1, 10, 10), (2, 2, 2, 20, 20), (3, 4, 4, 40, 40), (4, 8, 8, 80, 80),
    ]
    assert got[0].beta_micro is None
    assert all(r.beta_micro == 1000000 for r in got[1:])


def test_topic_mix_routes_by_keyword_majority(spark, tmp_path):
    """Docs route to their dominant seed topic; keyword ties go to the
    lexicographically first topic; no hits -> 'other'; shares sum per
    source."""
    from data_pipeline_python_aws_cdk_spark.operators import text

    rows = [
        (1, "scan filter sort noise", "en", "s", 22),        # execution x3
        (2, "table table row stream", "en", "s", 22),        # storage 3 > streaming 1
        (3, "stream batch window group", "en", "s", 25),     # streaming x4
        (4, "xyzzy unknown words", "en", "s", 19),           # -> other
        (5, "scan table", "en", "s", 10),                    # tie -> execution
    ]
    sf = _write_docs(spark, tmp_path, rows, name="topic_docs")
    got = {(r.source, r.topic): r for r in text.corpus_topic_mix(spark, sf).collect()}
    assert got[("s", "execution")].n_docs == 2
    assert got[("s", "storage")].n_docs == 1
    assert got[("s", "streaming")].n_docs == 1
    assert got[("s", "other")].n_docs == 1
    assert got[("s", "execution")].share == 0.4


def test_benford_first_digit_extraction_and_expectation(spark, tmp_path):
    """First significant digits come out of integer micro-units (0.5 -> 5,
    19.0 -> 1); zero and NULL values are excluded; the digit-1 Benford
    expectation is log10(2) ~ 0.30103."""
    from datetime import datetime

    from data_pipeline_python_aws_cdk_spark.operators import analytics

    t0 = datetime(2026, 1, 1)
    vals = [1.0, 1.5, 19.0, 2.0, 30.0, 0.5, 0.0, None]
    rows = [(i, t0, 1, "view", v, "{}") for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = tmp_path / "ev_benford"
    df.write.parquet(f"{out}/events.parquet")
    got = {r.digit: r for r in analytics.events_benford_audit(spark, str(out)).collect()}
    assert {d: got[d].n for d in got} == {1: 3, 2: 1, 3: 1, 5: 1}
    assert got[1].share == 0.5
    assert got[1].benford_share == 0.30103
    assert got[1].dev_micro == 198970  # 0.5 - log10(2), in micro-units


def test_pmi_ranks_collocation_above_stopword_pairs(spark, tmp_path):
    """'new york' co-occurs every time and both words are rare -> top PMI;
    'the' co-occurs just as often but is twice as frequent, so its pairs
    score exactly ln(2) micro-units lower; singleton pairs fall below the
    min-count floor."""
    from data_pipeline_python_aws_cdk_spark.operators import text

    rows = []
    for i in range(12):
        t = f"new york q{i} the r{i} the s{i}"
        rows.append((i, t, "en", "s", len(t)))
    sf = _write_docs(spark, tmp_path, rows, name="pmi_docs")
    got = text.corpus_cooccurrence_pmi(spark, sf).collect()
    assert (got[0].w1, got[0].w2, got[0].pair_count) == ("new", "york", 12)
    assert got[0].pmi_micro > 0
    by = {(r.w1, r.w2): r.pmi_micro for r in got}
    # ln(2) = 0.693147: the exact unigram-frequency penalty for 'the'
    assert by[("new", "york")] - by[("the", "york")] == 693147


def test_match_pattern_counts_runs_and_abandonments(spark, tmp_path):
    """v c c p -> one converting match of length 4; v c e -> one
    abandonment; a user with no click between view and purchase matches
    nothing; two runs count twice with the longest reported."""
    from datetime import datetime

    from data_pipeline_python_aws_cdk_spark.operators import analytics

    def ev(eid, uid, sec, typ):
        return (eid, datetime(2026, 1, 1, 0, 0, sec), uid, typ, 0.0, "{}")

    rows = [ev(i, 1, i, t) for i, t in enumerate(
        ["view", "click", "click", "purchase", "view", "click", "error", "signup"])]
    rows += [ev(100 + i, 2, i, t) for i, t in enumerate(["view", "purchase"])]
    rows += [ev(200 + i, 3, i, t) for i, t in enumerate(
        ["view", "click", "purchase", "view", "click", "click", "click", "purchase"])]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = tmp_path / "ev_match"
    df.write.parquet(f"{out}/events.parquet")
    got = {r.user_id: r for r in analytics.events_match_pattern(spark, str(out)).collect()}
    assert (got[1].n_converted, got[1].longest_match, got[1].n_abandoned) == (1, 4, 1)
    assert (got[2].n_converted, got[2].longest_match, got[2].n_abandoned) == (0, 0, 0)
    assert (got[3].n_converted, got[3].longest_match, got[3].n_abandoned) == (2, 5, 0)


def test_kn_bigram_lm_matches_independent_formula(spark, tmp_path):
    """The per-doc KN NLL must equal an independent Python replication of
    interpolated Kneser-Ney (d=0.75) on a corpus small enough to enumerate
    by hand — and the doc built from the corpus's dominant bigram must
    score lower NLL per bigram than the doc with the one-off bigram."""
    import math

    from data_pipeline_python_aws_cdk_spark.operators import text

    d1 = "x y x y x y"   # bigrams: xy x3, yx x2
    d2 = "x z"           # bigram: xz x1
    sf = _write_docs(
        spark, tmp_path,
        [(1, d1, "en", "s", len(d1)), (2, d2, "en", "s", len(d2))],
        name="kn_docs",
    )
    got = {r.doc_id: r for r in text.text_kn_bigram_lm(spark, sf).collect()}

    c2 = {("x", "y"): 3, ("y", "x"): 2, ("x", "z"): 1}
    c1 = {"x": 4, "y": 2}
    nctx = {"x": 2, "y": 1}
    nr = {"y": 1, "x": 1, "z": 1}
    bt = 3

    def nll(w1, w2):
        p = (max(c2[(w1, w2)] - 0.75, 0.0)
             + (0.75 * nctx[w1]) * (nr[w2] / bt)) / c1[w1]
        return round(-math.log(p) * 1000000)

    want1 = 3 * nll("x", "y") + 2 * nll("y", "x")
    want2 = nll("x", "z")
    assert got[1].kn_nll_micro == want1 and got[1].n_bigrams == 5
    assert got[2].kn_nll_micro == want2 and got[2].n_bigrams == 1
    assert got[1].avg_nll_micro < got[2].avg_nll_micro  # rare bigram costs more


def test_regression_recovers_exact_linear_law(spark, tmp_path):
    """Ship latency planted as exactly 2*quantity + 3 days: slope 2,
    intercept 3, r-squared 1 — all in micro-units, zero residual."""
    from datetime import date

    from data_pipeline_python_aws_cdk_spark.operators import analytics

    d0 = date(2026, 1, 1)
    orders = [(i, 1, "O", 10.0, d0, "1-URGENT") for i in range(1, 6)]
    lines = []
    for i, q in zip(range(1, 6), [1.0, 2.0, 3.0, 4.0, 5.0]):
        from datetime import timedelta
        lines.append((i, 1, 1, 1, q, 10.0, 0.0, 0.0, "N", "O",
                      d0 + timedelta(days=int(2 * q + 3))))
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate date, o_orderpriority string",
    ).write.parquet(f"{tmp_path}/reg/orders.parquet")
    spark.createDataFrame(
        lines,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate date",
    ).write.parquet(f"{tmp_path}/reg/lineitem.parquet")
    row = analytics.lineitem_ship_latency_regression(
        spark, f"{tmp_path}/reg"
    ).collect()[0]
    assert (row.n, row.slope_micro, row.intercept_micro, row.r2_micro) == (
        5, 2000000, 3000000, 1000000,
    )


def test_chi2_zero_on_independence_and_n_on_full_dependence(spark, tmp_path):
    """A perfectly balanced type x dow table scores chi2 = 0; a fully
    dependent 2x2 table scores chi2 = n (the 2x2 identity)."""
    from datetime import datetime

    from data_pipeline_python_aws_cdk_spark.operators import analytics

    mon, tue = datetime(2026, 1, 5, 12), datetime(2026, 1, 6, 12)
    schema = ("event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")

    indep = [(i, ts, 1, t, 1.0, "{}") for i, (ts, t) in enumerate(
        [(mon, "a"), (mon, "a"), (tue, "a"), (tue, "a"),
         (mon, "b"), (mon, "b"), (tue, "b"), (tue, "b")])]
    spark.createDataFrame(indep, schema).write.parquet(
        f"{tmp_path}/chi_i/events.parquet")
    r = analytics.events_type_dow_chi2(spark, f"{tmp_path}/chi_i").collect()[0]
    assert (r.n_events, r.n_types, r.n_days, r.dof, r.chi2_micro) == (8, 2, 2, 1, 0)

    dep = [(i, ts, 1, t, 1.0, "{}") for i, (ts, t) in enumerate(
        [(mon, "a"), (mon, "a"), (tue, "b"), (tue, "b")])]
    spark.createDataFrame(dep, schema).write.parquet(
        f"{tmp_path}/chi_d/events.parquet")
    r = analytics.events_type_dow_chi2(spark, f"{tmp_path}/chi_d").collect()[0]
    assert r.chi2_micro == 4000000  # chi2 == n for a fully dependent 2x2


def test_seasonal_decompose_recovers_planted_sunday_lift(spark, tmp_path):
    """Three weeks of 10 events/day with Sundays at 17: the centered-MA
    trend is flat 11, so the seasonal factor is exactly +6 on Sunday and
    -1 elsewhere; edge days without a full window are excluded."""
    from datetime import datetime, timedelta

    from data_pipeline_python_aws_cdk_spark.operators import analytics

    start = datetime(2026, 1, 5)  # a Monday
    rows, eid = [], 0
    for day in range(21):
        dow = day % 7 + 1
        n = 17 if dow == 7 else 10
        for k in range(n):
            rows.append((eid, start + timedelta(days=day, hours=k % 24), 1,
                         "view", 1.0, "{}"))
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{tmp_path}/seas/events.parquet")
    got = {r.dow: r for r in analytics.events_seasonal_decompose(
        spark, f"{tmp_path}/seas").collect()}
    assert len(got) == 7
    for dow in range(1, 7):
        assert got[dow].seasonal_micro == -1000000, dow
    assert got[7].seasonal_micro == 6000000
    assert got[7].avg_daily_events == 17.0
    assert all(got[d].n_days == 3 for d in range(1, 8))
    assert got[4].days_estimated == 3 and got[1].days_estimated == 2


def test_pareto_concentration_and_cents_exactness(spark, tmp_path):
    """20 customers with one order each, customer k spending k dollars:
    deciles hold 2 customers each, the top decile carries (20+19)/210 of
    revenue, the cumulative share reaches exactly 1.0, and cent sums are
    exact integers."""
    from datetime import date

    from data_pipeline_python_aws_cdk_spark.operators import analytics

    rows = [(k, k, "O", float(k), date(2026, 1, 1), "1-URGENT")
            for k in range(1, 21)]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate date, o_orderpriority string",
    ).write.parquet(f"{tmp_path}/par/orders.parquet")
    got = analytics.orders_revenue_pareto(spark, f"{tmp_path}/par").collect()
    assert [r.n_customers for r in got] == [2] * 10
    assert got[0].revenue_cents == (20 + 19) * 100
    assert got[-1].cum_revenue_cents == sum(range(1, 21)) * 100
    assert got[-1].cum_share == 1.0
    assert got[0].cum_share == round(39 / 210, 6)


def test_dedup_cascade_marginal_removal(spark, tmp_path):
    """Three byte-identical docs collapse in the EXACT stage; a near-dup
    (one-token edit) survives exact and is removed by the MINHASH stage;
    an unrelated doc survives both — so the marginal removals are 2 and 1."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 10
    near = base.replace("gamma", "gamma2", 1)
    far = "one two three four five six seven eight nine ten " * 10
    sf = _write_docs(
        spark,
        tmp_path,
        [(1, base, "en", "s", len(base)), (2, base, "en", "s", len(base)),
         (3, base, "en", "s", len(base)), (4, near, "en", "s", len(near)),
         (5, far, "en", "s", len(far))],
        name="cascade_docs",
    )
    got = {r.stage: r for r in dedup.corpus_dedup_cascade_report(spark, sf).collect()}
    ex, mh = got["exact"], got["minhash_lsh"]
    assert (ex.docs_in, ex.docs_out, ex.removed) == (5, 3, 2)
    assert (mh.docs_in, mh.docs_out, mh.removed) == (3, 2, 1)
    assert ex.removal_rate == 0.4
    assert mh.removal_rate == round(1 / 3, 6)


def test_seasonal_residual_flags_planted_spike(spark, tmp_path):
    """Three weeks of 10/day (Sundays 17) with one anomalous +30 Thursday:
    the spike day carries by far the largest positive z; Sundays stay
    unremarkable because the weekly factor absorbs them."""
    from datetime import datetime, timedelta

    from data_pipeline_python_aws_cdk_spark.operators import analytics

    start = datetime(2026, 1, 5)  # a Monday
    rows, eid = [], 0
    for day in range(21):
        dow = day % 7 + 1
        n = 17 if dow == 7 else 10
        if day == 10:  # Thursday, Jan 15: planted spike
            n += 30
        for k in range(n):
            rows.append((eid, start + timedelta(days=day, hours=k % 24), 1,
                         "view", 1.0, "{}"))
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{tmp_path}/seasr/events.parquet")
    got = analytics.events_seasonal_residual_outliers(
        spark, f"{tmp_path}/seasr").collect()
    by_day = {r.day: r for r in got}
    spike = by_day["2026-01-15"]
    assert spike.n_events == 40
    assert spike.z_micro == max(r.z_micro for r in got)
    assert spike.z_micro > 1500000  # > 1.5 sigma, dominant by construction
    assert all(r.z_micro < spike.z_micro for r in got if r.day != "2026-01-15")


def test_segment_migration_exact_matrix(spark, tmp_path):
    """Eight customers whose spend ranking reverses between halves, plus a
    churned and an acquired customer: the full 10-customer migration
    matrix is pinned cell by cell (segment 0 = absent in that half)."""
    from datetime import date

    from data_pipeline_python_aws_cdk_spark.operators import analytics

    rows = []
    ok = 0
    d1, d2 = date(1970, 1, 1), date(1970, 1, 20)  # cut lands at epoch-day 9
    for c in range(1, 9):
        ok += 1
        rows.append((ok, c, "O", float(1000 - 100 * c), d1, "1-URGENT"))  # H1
        ok += 1
        rows.append((ok, c, "O", float(100 + 100 * c), d2, "1-URGENT"))   # H2
    ok += 1
    rows.append((ok, 9, "O", 100.0, d1, "1-URGENT"))    # churned after H1
    ok += 1
    rows.append((ok, 10, "O", 100.0, d2, "1-URGENT"))   # acquired in H2
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate date, o_orderpriority string",
    ).write.parquet(f"{tmp_path}/mig/orders.parquet")
    got = {
        (r.seg_h1, r.seg_h2): r.n_customers
        for r in analytics.orders_segment_migration(spark, f"{tmp_path}/mig").collect()
    }
    assert got == {(0, 4): 1, (1, 3): 2, (1, 4): 1, (2, 2): 2,
                   (3, 1): 2, (4, 0): 1, (4, 1): 1}


def test_payload_dedup_reports_reclaimable_bytes(spark, tmp_path):
    from data_pipeline_python_aws_cdk_spark.operators import multimodal

    same = "identical payload bytes"
    sf = _write_docs(
        spark,
        tmp_path,
        [(1, same, "en", "s", len(same)), (2, same, "en", "s", len(same)),
         (3, "unique bytes", "en", "s", 12)],
        name="payload_docs",
    )
    got = {r.keep_doc_id: r for r in multimodal.multimodal_payload_dedup(spark, sf).collect()}
    assert got[1].copies == 2
    assert got[1].total_bytes == 2 * len(same)
    assert got[1].reclaimable_bytes == len(same)
    assert got[3].copies == 1 and got[3].reclaimable_bytes == 0


def test_cohort_ltv_accumulates_per_acquisition_year(spark, tmp_path):
    from datetime import date

    from data_pipeline_python_aws_cdk_spark.operators import analytics

    rows = [
        (1, 1, "O", 100.0, date(2020, 3, 1), "1-URGENT"),
        (2, 1, "O", 50.0, date(2021, 6, 1), "1-URGENT"),
        (3, 2, "O", 200.0, date(2021, 2, 1), "1-URGENT"),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate date, o_orderpriority string",
    ).write.parquet(f"{tmp_path}/ltv/orders.parquet")
    got = {
        (r.cohort_year, r.offset_years): r
        for r in analytics.orders_cohort_ltv(spark, f"{tmp_path}/ltv").collect()
    }
    assert got[(2020, 0)].revenue_cents == 10000
    assert got[(2020, 1)].cum_revenue_cents == 15000
    assert got[(2020, 1)].avg_ltv_cents == 15000   # one customer in cohort
    assert got[(2021, 0)].cohort_customers == 1
    assert got[(2021, 0)].avg_ltv_cents == 20000


def test_dau_wau_mau_windows_and_stickiness(spark, tmp_path):
    from datetime import datetime

    from data_pipeline_python_aws_cdk_spark.operators import analytics

    rows = [
        (1, datetime(2026, 1, 1, 9), 1, "view", 1.0, "{}"),
        (2, datetime(2026, 1, 10, 9), 1, "view", 1.0, "{}"),
        (3, datetime(2026, 1, 10, 10), 1, "click", 1.0, "{}"),  # same user-day
        (4, datetime(2026, 1, 10, 9), 2, "view", 1.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{tmp_path}/act/events.parquet")
    got = {r.day: r for r in analytics.events_dau_wau_mau(spark, f"{tmp_path}/act").collect()}
    assert set(got) == {"2026-01-01", "2026-01-10"}
    d1, d10 = got["2026-01-01"], got["2026-01-10"]
    assert (d1.dau, d1.wau, d1.mau) == (1, 1, 1)
    # Jan 1 is outside Jan 10's trailing week but inside its trailing 28
    assert (d10.dau, d10.wau, d10.mau) == (2, 2, 2)
    assert d10.stickiness == 1.0


def test_rollup_levels_and_null_segment_disambiguation(spark, tmp_path):
    from datetime import date

    from data_pipeline_python_aws_cdk_spark.operators import analytics

    spark.createDataFrame(
        [(0, "N1", 0), (1, "N2", 0)], "n_nationkey int, n_name string, n_regionkey int"
    ).write.parquet(f"{tmp_path}/ru/nation.parquet")
    spark.createDataFrame(
        [(1, "c1", 0, 0.0, "SEG1"), (2, "c2", 0, 0.0, None), (3, "c3", 1, 0.0, "SEG2")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).write.parquet(f"{tmp_path}/ru/customer.parquet")
    orders = [(10, 1, "O", 10.0, date(2026, 1, 1), "x"),
              (11, 2, "O", 20.0, date(2026, 1, 1), "x"),
              (12, 3, "O", 40.0, date(2026, 1, 1), "x")]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate date, o_orderpriority string",
    ).write.parquet(f"{tmp_path}/ru/orders.parquet")
    got = {
        (r.nation, r.segment, r.grouping_level): r
        for r in analytics.orders_nation_segment_rollup(spark, f"{tmp_path}/ru").collect()
    }
    assert got[("ALL", "ALL", 3)].revenue_cents == 7000       # grand total
    assert got[("N1", "ALL", 1)].revenue_cents == 3000        # nation subtotal
    assert got[("N1", "SEG1", 0)].revenue_cents == 1000       # leaf
    # a REAL NULL segment stays NULL at level 0 — never conflated with 'ALL'
    assert got[("N1", None, 0)].revenue_cents == 2000
    assert ("N1", "ALL", 0) not in got


def test_conversion_latency_percentiles_exact_interpolation(spark, tmp_path):
    """Two converters at 100 s and 200 s: p50 interpolates to 150, p90 to
    190; an organic purchaser (purchase before any click) and a
    non-converter are excluded."""
    from datetime import datetime, timedelta

    from data_pipeline_python_aws_cdk_spark.operators import analytics

    t0 = datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        (1, t0, 1, "click", 0.0, "{}"),
        (2, t0 + timedelta(seconds=100), 1, "purchase", 0.0, "{}"),
        (3, t0, 2, "click", 0.0, "{}"),
        (4, t0 + timedelta(seconds=200), 2, "purchase", 0.0, "{}"),
        (5, t0, 3, "purchase", 0.0, "{}"),                       # organic
        (6, t0 + timedelta(seconds=50), 3, "click", 0.0, "{}"),
        (7, t0, 4, "click", 0.0, "{}"),                          # never converts
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{tmp_path}/lat/events.parquet")
    r = analytics.events_conversion_latency_percentiles(
        spark, f"{tmp_path}/lat").collect()[0]
    assert (r.converters, r.min_sec, r.max_sec) == (2, 100, 200)
    assert (r.p50_sec, r.p90_sec, r.p99_sec) == (150.0, 190.0, 199.0)


def test_bot_screen_flags_metronomic_single_action_user(spark, tmp_path):
    """60 clicks at exact 10 s intervals in one day: rate >= 50/day, zero
    type entropy, zero gap CV — flagged. A 3-day mixed-type irregular
    human is not."""
    from datetime import datetime, timedelta

    from data_pipeline_python_aws_cdk_spark.operators import analytics

    t0 = datetime(2026, 1, 1, 8, 0, 0)
    rows = [(i, t0 + timedelta(seconds=10 * i), 1, "click", 0.0, "{}")
            for i in range(60)]
    human = [(100, t0, 2, "view", 0.0, "{}"),
             (101, t0 + timedelta(hours=3, seconds=17), 2, "click", 0.0, "{}"),
             (102, t0 + timedelta(days=1, seconds=905), 2, "view", 0.0, "{}"),
             (103, t0 + timedelta(days=2, seconds=42), 2, "purchase", 0.0, "{}"),
             (104, t0 + timedelta(days=2, hours=5), 2, "view", 0.0, "{}")]
    spark.createDataFrame(
        rows + human,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{tmp_path}/bot/events.parquet")
    got = {r.user_id: r for r in analytics.events_bot_screen(
        spark, f"{tmp_path}/bot").collect()}
    bot, hum = got[1], got[2]
    assert bot.events_per_day == 60.0
    assert bot.type_entropy_micro == 0      # single action type
    assert bot.gap_cv_micro == 0            # metronomic
    assert bot.is_bot_suspect is True
    assert hum.is_bot_suspect is False and hum.type_entropy_micro > 0


def test_hhi_monopoly_and_duopoly(spark, tmp_path):
    from datetime import date

    from data_pipeline_python_aws_cdk_spark.operators import analytics

    spark.createDataFrame(
        [(1, "part a", "BrandA", "TYPEA", 1, 1.0),
         (2, "part b", "BrandB", "TYPEB", 1, 1.0)],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    ).write.parquet(f"{tmp_path}/hhi/part.parquet")
    lines = [
        (1, 1, 10, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", date(2026, 1, 1)),  # A: mono
        (2, 2, 20, 1, 1.0, 50.0, 0.0, 0.0, "N", "O", date(2026, 1, 1)),   # B: 50/50
        (3, 2, 21, 1, 1.0, 50.0, 0.0, 0.0, "N", "O", date(2026, 1, 1)),
    ]
    spark.createDataFrame(
        lines,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate date",
    ).write.parquet(f"{tmp_path}/hhi/lineitem.parquet")
    got = {r.p_type: r for r in analytics.parts_supplier_hhi(
        spark, f"{tmp_path}/hhi").collect()}
    assert got["TYPEA"].hhi_micro == 1000000 and got["TYPEA"].top_supplier_share == 1.0
    assert got["TYPEB"].hhi_micro == 500000 and got["TYPEB"].top_supplier_share == 0.5
    assert got["TYPEB"].suppliers == 2


def test_exact_substring_dedup_finds_planted_shared_paragraph(spark, tmp_path):
    """Two docs embedding the same 20-token paragraph at DIFFERENT offsets
    must each emit exactly one maximal span delimiting that paragraph in
    their own token coordinates; a novel doc must emit nothing."""
    shared = " ".join(f"sh{i}" for i in range(20))
    d1 = " ".join(f"u{i}" for i in range(10)) + " " + shared + " " + " ".join(
        f"v{i}" for i in range(5)
    )
    d2 = " ".join(f"w{i}" for i in range(3)) + " " + shared + " " + " ".join(
        f"x{i}" for i in range(12)
    )
    d3 = " ".join(f"nv{i}" for i in range(30))
    out = tmp_path / "substr"
    spark.createDataFrame(
        [(1, d1, "en", "s", 1), (2, d2, "en", "s", 1), (3, d3, "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{out}/documents.parquet")
    rows = dedup.corpus_exact_substring_dedup(spark, str(out)).collect()
    got = {r.doc_id: r for r in rows}
    assert set(got) == {1, 2}
    # doc 1: paragraph at tokens 11-30 -> windows i=11..23 (13 of them)
    assert (got[1].span_start, got[1].span_len, got[1].n_windows) == (11, 20, 13)
    # doc 2: paragraph at tokens 4-23 -> windows i=4..16
    assert (got[2].span_start, got[2].span_len, got[2].n_windows) == (4, 20, 13)
    assert got[1].n_other_docs == 1 and got[2].n_other_docs == 1


def test_bpe_encode_ids_matches_pure_python_encode(spark, tmp_path):
    """bpe_encode_ids must reproduce the pure-Python pipeline exactly:
    train merges (reference trainer), apply them greedily per word, map
    symbols to dense lexicographic ids, concatenate in reading order."""
    docs = [
        (1, "low low low lower lowest", "en", "s", 1),
        (2, "new newer newest low new", "en", "s", 1),
        (3, "wider wide wide new lower", "en", "s", 1),
    ]
    out = tmp_path / "bpe_enc"
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{out}/documents.parquet")

    wf = {}
    for _, t, *_ in docs:
        for w in t.split():
            wf[w] = wf.get(w, 0) + 1
    merges = _reference_bpe(wf, 4)
    pairs = [tuple(m.split(" ")) for m, _ in merges]

    def encode_word(w):
        syms = list(w)
        for a, b in pairs:
            out_s, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out_s.append(a + b)
                    i += 2
                else:
                    out_s.append(syms[i])
                    i += 1
            syms = out_s
        return syms

    vocab = sorted({s for w in wf for s in encode_word(w)})
    ids = {s: i + 1 for i, s in enumerate(vocab)}
    expected = {
        did: [ids[s] for w in t.split() for s in encode_word(w)]
        for did, t, *_ in docs
    }

    got = {
        r.doc_id: (list(r.token_ids), r.n_bpe_tokens)
        for r in text.bpe_encode_ids(spark, str(out), n_merges=4).collect()
    }
    assert {k: v[0] for k, v in got.items()} == expected
    assert all(v[1] == len(expected[k]) for k, v in got.items())


def test_ivf_nprobe_sweep_monotone_and_full_probe_exact(spark):
    """Recall must be non-decreasing in nprobe (candidate sets are nested),
    and probing EVERY list must reproduce the exact brute-force top-k —
    the degenerate end of the sweep where IVF stops being approximate."""
    rows = similarity.similarity_ann_ivf_nprobe_sweep(spark, SF_SMOKE).collect()
    by_np = {r.nprobe: r for r in rows}
    assert sorted(by_np) == [1, 2, 4, 8]
    recalls = [by_np[n].recall_at_10 for n in (1, 2, 4, 8)]
    assert recalls == sorted(recalls)
    assert all(r.queries == 8 for r in rows)

    from data_pipeline_python_aws_cdk_spark.operators.similarity import IVF_NLIST

    full = similarity.similarity_ann_ivf(spark, SF_SMOKE, nprobe=IVF_NLIST)
    exact = similarity.similarity_topk(spark, SF_SMOKE)
    assert {tuple(r) for r in full.collect()} == {tuple(r) for r in exact.collect()}


def test_ivf_probe_indexed_honors_nprobe(spark, tmp_path):
    """The persisted-index probe at nprobe=3 must equal the inline query at
    nprobe=3 — the parameter threads through both paths identically."""
    from data_pipeline_python_aws_cdk_spark.operators.similarity import (
        ivf_build_index,
        ivf_probe_indexed,
        similarity_ann_ivf,
    )

    index_dir = str(tmp_path / "ivf_index_np3")
    ivf_build_index(spark, SF_SMOKE, index_dir)
    probed = ivf_probe_indexed(spark, index_dir, SF_SMOKE, nprobe=3)
    inline = similarity_ann_ivf(spark, SF_SMOKE, nprobe=3)
    assert {tuple(r) for r in probed.collect()} == {tuple(r) for r in inline.collect()}


def test_doc_duplication_fraction_planted_half_copy(spark, tmp_path):
    """A doc whose first 15 tokens are copied into another doc must show
    exactly the shared-prefix windows and token coverage; a fully unique
    doc must report zeros (and still appear — the distribution is the
    report)."""
    base = [f"t{i}" for i in range(30)]
    d1 = " ".join(base)
    d2 = " ".join(base[:15] + [f"z{i}" for i in range(15)])
    d3 = " ".join(f"q{i}" for i in range(20))
    out = tmp_path / "dupfrac"
    spark.createDataFrame(
        [(1, d1, "en", "s", 1), (2, d2, "en", "s", 1), (3, d3, "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{out}/documents.parquet")
    got = {
        r.doc_id: r
        for r in dedup.corpus_doc_duplication_fraction(spark, str(out)).collect()
    }
    assert set(got) == {1, 2, 3}
    # shared windows: those fully inside tokens 1-15 -> i = 1..8
    assert (got[1].n_windows, got[1].n_dup_windows, got[1].dup_tokens) == (23, 8, 15)
    assert (got[2].n_windows, got[2].n_dup_windows, got[2].dup_tokens) == (23, 8, 15)
    assert got[1].dup_token_frac == 0.5
    assert (got[3].n_dup_windows, got[3].dup_tokens, got[3].dup_token_frac) == (0, 0, 0.0)


def test_self_repetition_spans_planted_loop(spark, tmp_path):
    """A doc repeating the phrase 'a b c' twice must emit one span per
    occurrence, each delimiting exactly the repeated trigram; a repeat-free
    doc must emit nothing."""
    d1 = "p q r a b c s t u a b c v w x"
    d2 = " ".join(f"n{i}" for i in range(12))
    out = tmp_path / "selfrep"
    spark.createDataFrame(
        [(1, d1, "en", "s", 1), (2, d2, "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{out}/documents.parquet")
    rows = dedup.doc_self_repetition_spans(spark, str(out)).collect()
    assert [
        (r.doc_id, r.span_start, r.span_len, r.n_windows, r.min_repeats)
        for r in rows
    ] == [(1, 4, 3, 1, 2), (1, 10, 3, 1, 2)]


def test_bpe_merge_curve_matches_reference_counts(spark, tmp_path):
    """Curve rows must replay the reference trainer's merge counts and the
    exact symbol-count arithmetic: tokens_after(r) = chars - cumsum(counts)."""
    docs = [
        (1, "low low low lower lowest", "en", "s", 1),
        (2, "new newer newest low new", "en", "s", 1),
    ]
    out = tmp_path / "bpe_curve"
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{out}/documents.parquet")
    wf = {}
    for _, t, *_ in docs:
        for w in t.split():
            wf[w] = wf.get(w, 0) + 1
    from data_pipeline_python_aws_cdk_spark.operators.text import BPE_ENCODE_MERGES

    expected = _reference_bpe(wf, BPE_ENCODE_MERGES)
    base = sum(len(w) * f for w, f in wf.items())
    rows = text.corpus_bpe_merge_curve(spark, str(out)).collect()
    assert [(r.merge_ord, r.pair, r.merged_count) for r in rows] == [
        (i + 1, p, c) for i, (p, c) in enumerate(expected)
    ]
    cum = 0
    for r in rows:
        cum += r.merged_count
        assert r.tokens_after == base - cum


def test_bpe_pack_sequences_counts_agree_with_encode(spark, tmp_path):
    """The real-count packer's doc_tokens must equal the id-sequence
    lengths bpe_encode_ids emits for the same corpus and merge budget —
    the loop-closing invariant (pack boundaries ARE token-stream truth).
    Offsets must stay gapless per bucket, corpus_pack_sequences' contract."""
    docs = [
        (i, " ".join(f"w{j}" for j in range(i + 3)) + " low lower", "en", "s", 1)
        for i in range(1, 9)
    ]
    out = tmp_path / "bpe_pack"
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{out}/documents.parquet")
    from data_pipeline_python_aws_cdk_spark.operators.text import BPE_ENCODE_MERGES

    enc = {
        r.doc_id: r.n_bpe_tokens
        for r in text.bpe_encode_ids(
            spark, str(out), n_merges=BPE_ENCODE_MERGES
        ).collect()
    }
    packed = text.corpus_bpe_pack_sequences(spark, str(out)).collect()
    assert {r.doc_id: r.doc_tokens for r in packed} == enc
    by_bucket = {}
    for r in sorted(packed, key=lambda r: (r.bucket, r.tok_start)):
        assert r.tok_start == by_bucket.get(r.bucket, 0)
        by_bucket[r.bucket] = r.tok_start + r.doc_tokens


def test_ann_ivfpq_finds_planted_near_duplicate_and_respects_probes(spark, tmp_path):
    """IVFPQ must surface a 0.999-cosine copy at rank 1 (it shares the
    query's inverted list and survives ADC + exact rerank), and its result
    set must be a subset of the plain-IVF candidate universe — PQ only
    rescores the probed lists, it can never add candidates."""
    import random

    rnd = random.Random(13)
    dim = similarity.DIM

    def vec():
        return [rnd.gauss(0, 1) for _ in range(dim)]

    q = vec()
    near = [x + rnd.gauss(0, 0.01) for x in q]
    rows = [(0, q, 0), (100, near, 0)] + [(i, vec(), 1) for i in range(101, 300)]
    out = tmp_path / "emb_ivfpq"
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{out}/embeddings.parquet")

    res = similarity.similarity_ann_ivfpq(spark, str(out)).collect()
    top = {r.query_id: r.neighbor_id for r in res if r.rank == 1}
    assert top.get(0) == 100

    # never a self-pair (the join must exclude query == neighbor)
    assert all(r.query_id != r.neighbor_id for r in res)
    # dominance: plain IVF reranks EVERY probed candidate exactly, IVFPQ
    # only its ADC shortlist of the same candidates — so at equal rank the
    # IVF cosine can never be lower
    ivf = {
        (r.query_id, r.rank): r.cosine
        for r in similarity.similarity_ann_ivf(spark, str(out)).collect()
    }
    for r in res:
        assert ivf[(r.query_id, r.rank)] >= r.cosine


def test_ann_ivfpq_residual_finds_planted_near_dup_and_self_codes_exact(
    spark, tmp_path
):
    """Residual IVFPQ must surface a 0.999-cosine copy at rank 1, never
    emit a self-pair, and stay IVF-cosine-dominated at equal rank (same
    candidate universe, shortlist-only rescoring — PQ can only drop
    candidates before the exact rerank, never add or re-score them up)."""
    import random

    rnd = random.Random(17)
    dim = similarity.DIM

    def vec():
        return [rnd.gauss(0, 1) for _ in range(dim)]

    q = vec()
    near = [x + rnd.gauss(0, 0.01) for x in q]
    # contiguous ids: the residual codebook seeds are vec_ids
    # [CB_BASE, CB_BASE + PQ_K) and must exist in the corpus
    rows = [(0, q, 0), (100, near, 0)] + [
        (i, vec(), 1) for i in range(1, 300) if i != 100
    ]
    out = tmp_path / "emb_ivfpq_res"
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{out}/embeddings.parquet")

    res = similarity.similarity_ann_ivfpq_residual(spark, str(out)).collect()
    top = {r.query_id: r.neighbor_id for r in res if r.rank == 1}
    assert top.get(0) == 100
    assert all(r.query_id != r.neighbor_id for r in res)
    ivf = {
        (r.query_id, r.rank): r.cosine
        for r in similarity.similarity_ann_ivf(spark, str(out)).collect()
    }
    for r in res:
        assert ivf[(r.query_id, r.rank)] >= r.cosine


def test_span_removal_plan_keeps_one_copy(spark, tmp_path):
    """Under the min-id canon, the lower doc of a planted shared paragraph
    keeps its copy (removable 0, kept = paragraph mass) and the higher doc
    marks exactly the paragraph removable; an untouched doc is absent."""
    shared = " ".join(f"sh{i}" for i in range(20))
    d1 = " ".join(f"u{i}" for i in range(10)) + " " + shared
    d2 = shared + " " + " ".join(f"x{i}" for i in range(12))
    d3 = " ".join(f"nv{i}" for i in range(30))
    out = tmp_path / "removal"
    spark.createDataFrame(
        [(1, d1, "en", "s", 1), (2, d2, "en", "s", 1), (3, d3, "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{out}/documents.parquet")
    got = {r.doc_id: r for r in dedup.corpus_span_removal_plan(spark, str(out)).collect()}
    assert set(got) == {1, 2}
    assert (got[1].removable_tokens, got[1].kept_dup_tokens) == (0, 20)
    assert (got[2].removable_tokens, got[2].kept_dup_tokens) == (20, 0)
    assert got[2].remaining_tokens == got[2].n_tokens - 20


def test_substring_index_probe_equals_inline(spark, tmp_path):
    """The persisted fingerprint stream must reproduce the inline span
    manifest exactly — the write-once/probe-many path is result-equal."""
    shared = " ".join(f"sh{i}" for i in range(20))
    docs = [
        (1, " ".join(f"u{i}" for i in range(10)) + " " + shared, "en", "s", 1),
        (2, shared + " " + " ".join(f"x{i}" for i in range(12)), "en", "s", 1),
        (3, " ".join(f"nv{i}" for i in range(30)), "en", "s", 1),
    ]
    out = tmp_path / "sidx_docs"
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{out}/documents.parquet")
    idx = str(tmp_path / "substring_index")
    dedup.substring_index_build(spark, str(out), idx)
    inline = dedup.corpus_exact_substring_dedup(spark, str(out)).collect()
    probed = dedup.exact_substring_dedup_indexed(spark, idx).collect()
    assert {tuple(r) for r in probed} == {tuple(r) for r in inline}
    assert len(inline) == 2
    # the removal plan is served from the same index — result-equal too,
    # including the n_tokens column it derives from max(i) alone
    plan_inline = dedup.corpus_span_removal_plan(spark, str(out)).collect()
    plan_probed = dedup.span_removal_plan_indexed(spark, idx).collect()
    assert {tuple(r) for r in plan_probed} == {tuple(r) for r in plan_inline}
    assert len(plan_inline) == 2


def test_js_divergence_zero_for_single_source_and_ranks_disjoint_higher(spark, tmp_path):
    """With one source, P == Q bucket-for-bucket so JS is EXACTLY zero;
    with two sources, a disjoint-vocabulary source must out-diverge one
    that shares the corpus vocabulary, and both stay within [0, ln 2]."""
    import math

    one = tmp_path / "js_one"
    spark.createDataFrame(
        [(1, "alpha beta gamma alpha", "en", "s0", 1),
         (2, "beta gamma alpha beta", "en", "s0", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{one}/documents.parquet")
    rows = text.corpus_source_js_divergence(spark, str(one)).collect()
    assert [(r.source, r.js_nano) for r in rows] == [("s0", 0)]

    two = tmp_path / "js_two"
    spark.createDataFrame(
        [(1, "alpha beta gamma delta " * 5, "en", "shared", 1),
         (2, "alpha beta gamma delta epsilon " * 5, "en", "shared", 1),
         (3, "zulu yankee xray whiskey " * 5, "en", "disjoint", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{two}/documents.parquet")
    by_src = {
        r.source: r.js_nano
        for r in text.corpus_source_js_divergence(spark, str(two)).collect()
    }
    assert set(by_src) == {"shared", "disjoint"}
    ln2_nano = math.log(2) * 1e9
    assert 0 < by_src["shared"] < by_src["disjoint"] <= ln2_nano


def test_doc_js_novelty_zero_for_lone_doc_and_ranks_disjoint_higher(
    spark, tmp_path
):
    """A corpus of ONE doc has doc distribution == corpus distribution
    bucket-for-bucket, so its JS is EXACTLY zero; in a mixed corpus a
    disjoint-vocabulary doc must out-diverge docs that share the corpus
    vocabulary, all within [0, ln 2]; and doc scores must sit on the same
    nano scale as the source table (comparability claim)."""
    import math

    one = tmp_path / "djs_one"
    spark.createDataFrame(
        [(1, "alpha beta gamma alpha beta", "en", "s0", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{one}/documents.parquet")
    rows = text.doc_js_novelty(spark, str(one)).collect()
    assert [(r.doc_id, r.js_nano) for r in rows] == [(1, 0)]

    mixed = tmp_path / "djs_mixed"
    spark.createDataFrame(
        [(1, "alpha beta gamma delta " * 8, "en", "s", 1),
         (2, "alpha beta gamma delta epsilon " * 8, "en", "s", 1),
         (3, "zulu yankee xray whiskey " * 8, "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{mixed}/documents.parquet")
    by_doc = {
        r.doc_id: r.js_nano for r in text.doc_js_novelty(spark, str(mixed)).collect()
    }
    assert set(by_doc) == {1, 2, 3}
    ln2_nano = math.log(2) * 1e9
    assert max(by_doc[1], by_doc[2]) < by_doc[3] <= ln2_nano
    assert all(v >= 0 for v in by_doc.values())


def test_events_type_trend_ols_recovers_planted_line(spark, tmp_path):
    """A type whose daily count is exactly y = 2x + 3 must come back with
    slope_micro = 2_000_000, intercept_micro = 3_000_000, r2 = 1_000_000;
    a single-active-day type has zero x-variance -> all-NULL fit."""
    import datetime

    from data_pipeline_python_aws_cdk_spark.operators import (
        analytics as analyticsmod,
    )

    base = datetime.date(2024, 3, 1)
    epoch = datetime.date(1970, 1, 1)
    rows, eid = [], 0
    for d in range(6):
        day = base + datetime.timedelta(days=d)
        x = (day - epoch).days
        for _ in range(2 * x + 3):
            eid += 1
            rows.append(
                (eid, 1, "linear", datetime.datetime.combine(day, datetime.time(9)), 1.0, "{}")
            )
    for _ in range(7):
        eid += 1
        rows.append(
            (eid, 2, "oneday", datetime.datetime.combine(base, datetime.time(9)), 1.0, "{}")
        )
    out = tmp_path / "trend_ols"
    spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, ts timestamp,"
        " value double, props string",
    ).write.parquet(f"{out}/events.parquet")
    got = {
        r.event_type: r
        for r in analyticsmod.events_type_trend_ols(spark, str(out)).collect()
    }
    lin = got["linear"]
    assert lin.n_days == 6
    assert lin.slope_micro == 2_000_000
    assert lin.intercept_micro == 3_000_000
    assert lin.r2_micro == 1_000_000
    one = got["oneday"]
    assert one.n_days == 1
    assert (one.slope_micro, one.intercept_micro, one.r2_micro) == (None, None, None)


def test_cusum_changepoint_finds_planted_level_shift(spark, tmp_path):
    """10 days at 10 events/day then 10 days at 30/day: the scaled CUSUM
    is exactly 200d-400d on the left and 200d-4000 on the right, so the
    |max| lands exactly on the last pre-shift day."""
    import datetime

    from data_pipeline_python_aws_cdk_spark.operators import analytics as analyticsmod

    rows = []
    eid = 0
    for d in range(20):
        day = datetime.datetime(2024, 1, 1) + datetime.timedelta(days=d)
        for k in range(10 if d < 10 else 30):
            eid += 1
            rows.append((eid, day, eid % 7, "click", 1.0, "{}"))
    out = tmp_path / "cusum"
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{out}/events.parquet")
    res = analyticsmod.events_cusum_changepoint(spark, str(out)).collect()
    assert len(res) == 20
    flagged = [r for r in res if r.is_changepoint]
    assert len(flagged) == 1
    assert flagged[0].day == datetime.date(2024, 1, 10)
    assert flagged[0].cusum_scaled == -2000
    assert res[-1].cusum_scaled == 0  # CUSUM always closes at zero


def test_mad_outliers_robust_to_the_outlier_itself(spark, tmp_path):
    """A single 10x day among stable days must be the ONLY flag, with the
    median/MAD threshold unmoved by the spike (the breakdown property a
    mean/std z-score lacks); an all-identical series must flag nothing
    and yield NULL robust_z (MAD = 0)."""
    import datetime

    from data_pipeline_python_aws_cdk_spark.operators import analytics as am

    def mk(counts, name):
        rows, eid = [], 0
        for d, n in enumerate(counts):
            day = datetime.datetime(2024, 3, 1) + datetime.timedelta(days=d)
            for _ in range(n):
                eid += 1
                rows.append((eid, day, eid % 5, "view", 1.0, "{}"))
        out = tmp_path / name
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).write.parquet(f"{out}/events.parquet")
        return str(out)

    spiky = mk([10, 11, 10, 12, 10, 11, 100, 10, 11, 10], "mad_spiky")
    res = am.events_mad_outliers(spark, spiky).collect()
    flagged = [r for r in res if r.is_outlier]
    assert len(flagged) == 1 and flagged[0].n_events == 100
    # median of the 10 days is 10.5, untouched by the spike
    assert flagged[0].deviation == 89.5

    flat = mk([7] * 6, "mad_flat")
    res2 = am.events_mad_outliers(spark, flat).collect()
    assert all(not r.is_outlier for r in res2)
    assert all(r.robust_z is None for r in res2)


def _reference_substring_spans(docs, ngram, min_span):
    """Pure-Python exact-substring manifest: shared windows -> maximal runs."""
    grams = {}
    toks = {d: t.lower().split() for d, t in docs.items()}
    for d, ts in toks.items():
        for i in range(len(ts) - ngram + 1):
            grams.setdefault(" ".join(ts[i:i + ngram]), set()).add(d)
    spans = []
    for d, ts in toks.items():
        hits = [
            (i + 1, len(grams[" ".join(ts[i:i + ngram])]))
            for i in range(len(ts) - ngram + 1)
            if len(grams[" ".join(ts[i:i + ngram])]) >= 2
        ]
        run = []
        for pos, ndocs in hits:
            if run and pos == run[-1][0] + 1:
                run.append((pos, ndocs))
            else:
                if run:
                    spans.append((d, run))
                run = [(pos, ndocs)]
        if run:
            spans.append((d, run))
    out = []
    for d, run in spans:
        start, end = run[0][0], run[-1][0]
        span_len = end - start + ngram
        if span_len >= min_span:
            out.append((d, start, span_len, len(run), min(n for _, n in run) - 1))
    return sorted(out)


def test_exact_substring_property_random_corpora(spark, tmp_path):
    """Property: on randomized small corpora the distributed span manifest
    agrees row-for-row with a pure-Python reference (shared-window
    detection, island merging, min-sharing bound)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from data_pipeline_python_aws_cdk_spark.operators.dedup import (
        SUBSTR_MIN_SPAN,
        SUBSTR_NGRAM,
    )

    word = st.sampled_from(["a", "b", "c", "d", "e"])
    doc = st.lists(word, min_size=4, max_size=30).map(" ".join)
    corpus = st.lists(doc, min_size=2, max_size=5)
    case = [0]

    @given(texts=corpus)
    @settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
    def check(texts):
        case[0] += 1
        out = tmp_path / f"substr_prop_{case[0]}"
        docs = {i + 1: t for i, t in enumerate(texts)}
        spark.createDataFrame(
            [(d, t, "en", "s", 1) for d, t in docs.items()],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(f"{out}/documents.parquet")
        got = sorted(
            (r.doc_id, r.span_start, r.span_len, r.n_windows, r.n_other_docs)
            for r in dedup.corpus_exact_substring_dedup(spark, str(out)).collect()
        )
        assert got == _reference_substring_spans(docs, SUBSTR_NGRAM, SUBSTR_MIN_SPAN)

    check()


def test_bpe_encode_ids_roundtrip_reconstructs_words(spark, tmp_path):
    """Invariant: concatenating each word's encoded symbols reproduces the
    word exactly — BPE merges re-segment, they never alter characters."""
    docs = [
        (1, "low lower lowest newest new wide", "en", "s", 1),
        (2, "newer low wide wider lowest", "en", "s", 1),
    ]
    out = tmp_path / "bpe_rt"
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{out}/documents.parquet")
    from data_pipeline_python_aws_cdk_spark.operators.text import (
        _bpe_train_states,
        _bpe_vocab,
    )

    _, state = _bpe_train_states(spark, str(out), 5)
    sym_of = {r.sym: r.token_id for r in _bpe_vocab(state).collect()}
    id_to_sym = {v: k for k, v in sym_of.items()}
    enc = text.bpe_encode_ids(spark, str(out), n_merges=5).collect()
    originals = {d: t.split() for d, t, *_ in docs}
    for r in enc:
        decoded = "".join(id_to_sym[t] for t in r.token_ids)
        assert decoded == "".join(originals[r.doc_id])


def test_winnowing_finds_planted_pair_and_samples_subset(spark, tmp_path):
    """A shared 20-token paragraph must surface the pair with multiple
    common fingerprints; an unrelated doc must pair with nobody; and every
    selected fingerprint is by construction one of the doc's own 4-gram
    hashes (sampling, never synthesis)."""
    shared = " ".join(f"sh{i}" for i in range(20))
    out = tmp_path / "winnow"
    spark.createDataFrame(
        [(1, " ".join(f"u{i}" for i in range(8)) + " " + shared, "en", "s", 1),
         (2, shared + " " + " ".join(f"x{i}" for i in range(9)), "en", "s", 1),
         (3, " ".join(f"nv{i}" for i in range(25)), "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{out}/documents.parquet")
    pairs = dedup.dedup_winnowing(spark, str(out)).collect()
    assert [(r.doc_a, r.doc_b) for r in pairs] == [(1, 2)]
    assert pairs[0].common_fingerprints >= 2


def test_winnowing_df_cap_drops_boilerplate_fingerprints(spark, tmp_path):
    """The skew guard: a boilerplate paragraph shared by FOUR docs puts
    its fingerprints at df=4; with df_cap=3 those hot keys are dropped
    before the self-join, so boilerplate-only pairs vanish while a pair
    sharing a RARE paragraph (df=2) survives. The default cap (128)
    keeps everything here — planted behavior, both regimes."""
    boiler = " ".join(f"bp{i}" for i in range(30))
    rare = " ".join(f"rr{i}" for i in range(30))
    out = tmp_path / "winnow_cap"
    spark.createDataFrame(
        [(1, boiler + " " + rare, "en", "s", 1),
         (2, rare + " " + boiler, "en", "s", 1),
         (3, boiler + " " + " ".join(f"x{i}" for i in range(10)), "en", "s", 1),
         (4, " ".join(f"y{i}" for i in range(10)) + " " + boiler, "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{out}/documents.parquet")
    # default cap: all six pairs collide via the boilerplate run
    full = {(r.doc_a, r.doc_b) for r in dedup.dedup_winnowing(spark, str(out)).collect()}
    assert full == {(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)}
    # capped at 3: boilerplate fingerprints (df=4) die; only the rare-
    # paragraph pair (df=2 fingerprints) survives
    capped = {
        (r.doc_a, r.doc_b)
        for r in dedup.dedup_winnowing(spark, str(out), df_cap=3).collect()
    }
    assert capped == {(1, 2)}


def test_winnow_index_probe_equals_inline_and_pins_hash_mode(
    spark, tmp_path, monkeypatch
):
    """The persisted winnowed-fingerprint stream must reproduce the inline
    candidate pairs exactly, and — fingerprints being hash60 values —
    must refuse a probe under the other hash family."""
    from data_pipeline_python_aws_cdk_spark.functions.hashing import HASH_MODE_ENV

    shared = " ".join(f"sh{i}" for i in range(20))
    out = tmp_path / "winnow_idx_docs"
    spark.createDataFrame(
        [(1, " ".join(f"u{i}" for i in range(8)) + " " + shared, "en", "s", 1),
         (2, shared + " " + " ".join(f"x{i}" for i in range(9)), "en", "s", 1),
         (3, " ".join(f"nv{i}" for i in range(25)), "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{out}/documents.parquet")
    idx = str(tmp_path / "winnow_index")
    dedup.winnow_index_build(spark, str(out), idx)
    inline = dedup.dedup_winnowing(spark, str(out)).collect()
    probed = dedup.dedup_winnowing_indexed(spark, idx).collect()
    assert {tuple(r) for r in probed} == {tuple(r) for r in inline}
    assert len(inline) == 1
    monkeypatch.setenv(HASH_MODE_ENV, "production")
    with pytest.raises(ValueError, match="HASH_MODE"):
        dedup.dedup_winnowing_indexed(spark, idx)


def test_winnowing_recall_report_planted_counts(spark, tmp_path):
    """Two near-identical docs (truth AND candidate), one contained-copy
    pair below the Jaccard-1/2 truth bar that winnowing still surfaces
    (candidate, not verified), one unrelated doc: n_truth=1,
    n_candidates=2, n_verified=1, recall=1.0, precision=0.5."""
    para = " ".join(f"p{i}" for i in range(24))
    out = tmp_path / "winnow_recall"
    spark.createDataFrame(
        [(1, para + " a1 a2", "en", "s", 1),
         (2, para + " b1 b2", "en", "s", 1),
         # doc 3 shares the paragraph but is 3x longer: Jaccard < 1/2
         (3, para + " " + " ".join(f"z{i}" for i in range(50)), "en", "s", 1),
         (4, " ".join(f"nv{i}" for i in range(30)), "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{out}/documents.parquet")
    rows = dedup.dedup_winnowing_recall_report(spark, str(out)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_truth, r.n_verified) == (1, 1)
    assert r.n_candidates >= 2  # (1,2) verified + at least one (·,3) pair
    assert r.recall == 1.0
    assert r.candidate_precision == round(1.0 / r.n_candidates, 6)
    # the pair-level verified table agrees with the aggregate report:
    # every candidate appears, exactly the (1,2) pair passes the bar,
    # and its exact-Jaccard micro value is the recomputable ratio
    ver = {
        (v.doc_a, v.doc_b): v
        for v in dedup.dedup_winnowing_verified(spark, str(out)).collect()
    }
    assert len(ver) == r.n_candidates
    assert ver[(1, 2)].is_dup and sum(v.is_dup for v in ver.values()) == 1
    v12 = ver[(1, 2)]
    assert v12.jaccard_micro == round(
        v12.common_grams * 1_000_000 / (v12.n_a + v12.n_b - v12.common_grams)
    )
    assert all(
        v.common_fingerprints >= dedup.WINNOW_MIN_SHARED for v in ver.values()
    )


def test_ndcg_report_matches_pure_python_recompute(spark):
    """The nDCG table must equal a pure-Python recomputation from the two
    component rankings (same graded gains, same micro quantization)."""
    import math

    from data_pipeline_python_aws_cdk_spark.operators.text import (
        BM25_TOP_K,
        NDCG_SCALE,
        retrieval_ndcg_report,
        text_bm25_retrieval,
    )

    lex = text_bm25_retrieval(spark, SF_SMOKE).collect()
    sem = {
        (r.query_id, r.neighbor_id): r.rank
        for r in similarity.similarity_topk(spark, SF_SMOKE).collect()
    }
    g = BM25_TOP_K + 1
    exp = {}
    for r in lex:
        sr = sem.get((r.query_id, r.neighbor_id))
        d, o = exp.get(r.query_id, (0, 0))
        if sr is not None:
            d += round(NDCG_SCALE * (g - sr) / math.log2(r.rank + 1))
            o += 1
        exp[r.query_id] = (d, o)
    idcg = sum(
        round(NDCG_SCALE * (g - r) / math.log2(r + 1))
        for r in range(1, BM25_TOP_K + 1)
    )
    got = {r.query_id: r for r in retrieval_ndcg_report(spark, SF_SMOKE).collect()}
    assert set(got) == set(exp)
    for qid, (d, o) in exp.items():
        assert (got[qid].dcg_micro, got[qid].overlap) == (d, o)
        assert got[qid].idcg_micro == idcg
        assert 0.0 <= got[qid].ndcg <= 1.0


def test_winnowing_selection_law_property(spark, tmp_path):
    """Property: the distributed fingerprint selection equals a pure-Python
    replay of the law — position i survives iff h_i equals the min over
    the centered 2W-1 hash window (all min-achieving positions kept)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from data_pipeline_python_aws_cdk_spark.functions.hashing import hash60_py
    from data_pipeline_python_aws_cdk_spark.operators.dedup import (
        WINNOW_K,
        WINNOW_MIN_SHARED,
        WINNOW_W,
        dedup_winnowing,
    )

    word = st.sampled_from(["a", "b", "c", "d"])
    doc = st.lists(word, min_size=WINNOW_K, max_size=24).map(" ".join)
    corpus = st.lists(doc, min_size=2, max_size=4)
    case = [0]

    def ref_pairs(texts):
        fps = {}
        for d, t in enumerate(texts, start=1):
            toks = t.lower().split()
            hs = [
                hash60_py(" ".join(toks[i:i + WINNOW_K]))
                for i in range(len(toks) - WINNOW_K + 1)
            ]
            sel = set()
            for i, h in enumerate(hs):
                lo, hi = max(0, i - WINNOW_W + 1), min(len(hs), i + WINNOW_W)
                if h == min(hs[lo:hi]):
                    sel.add(h)
            fps[d] = sel
        out = []
        docs_ids = sorted(fps)
        for x in docs_ids:
            for y in docs_ids:
                if x < y:
                    c = len(fps[x] & fps[y])
                    if c >= WINNOW_MIN_SHARED:
                        out.append((x, y, c))
        return sorted(out)

    @given(texts=corpus)
    @settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
    def check(texts):
        case[0] += 1
        out = tmp_path / f"winnow_prop_{case[0]}"
        spark.createDataFrame(
            [(i + 1, t, "en", "s", 1) for i, t in enumerate(texts)],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(f"{out}/documents.parquet")
        got = sorted(
            (r.doc_a, r.doc_b, r.common_fingerprints)
            for r in dedup_winnowing(spark, str(out)).collect()
        )
        assert got == ref_pairs(texts)

    check()


def test_substring_screen_empty_index_routes_all_new(spark, tmp_path):
    """Against an EMPTY standing index every arriving doc routes 'new'
    with zero hits — the cold-start contract."""
    from data_pipeline_python_aws_cdk_spark.operators.dedup import (
        substring_screen_against_index,
    )

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(12)), "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    empty_index = spark.createDataFrame([], "doc_id long, i long, h long")
    rows = substring_screen_against_index(docs, empty_index).collect()
    assert [(r.doc_id, r.n_hits, r.verdict) for r in rows] == [(1, 0, "new")]


def test_ivfpq_index_accepts_refined_codebook(spark, tmp_path):
    """The pluggable-codebook contract extends to the composed IVF+PQ
    index: a k-means-refined centroid set round-trips through
    _centroids, the probe ranks against it (self-consistent: TOP_K rows
    per query, no self-pairs, every shortlist survivor exact-reranked),
    and the PQ codes are unchanged (the code table quantizes vectors
    against the PQ codebook, which is independent of the IVF layout)."""
    sf = SF_SMOKE
    ref_dir = str(tmp_path / "ivfpq_refined")
    cent = similarity.ivf_train_centroids(spark, sf)
    similarity.ivfpq_build_index(spark, sf, ref_dir, centroids=cent)
    persisted = spark.read.parquet(f"{ref_dir}/_centroids").collect()
    assert len(persisted) == similarity.IVF_NLIST
    res = similarity.ivfpq_probe_indexed(spark, ref_dir, sf).collect()
    by_q = {}
    for r in res:
        assert r.query_id != r.neighbor_id
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == set(range(similarity.N_QUERIES))
    for q, rows in by_q.items():
        ranks = sorted(r.rank for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        assert len(rows) <= similarity.TOP_K
    # codes identical to the seed-codebook build: PQ quantization does
    # not depend on which IVF cell a vector landed in (raw-vector PQ)
    seed_dir = str(tmp_path / "ivfpq_seed")
    similarity.ivfpq_build_index(spark, sf, seed_dir)
    codes_ref = {
        (r.vec_id, r.pq_code) for r in spark.read.parquet(ref_dir).collect()
    }
    codes_seed = {
        (r.vec_id, r.pq_code) for r in spark.read.parquet(seed_dir).collect()
    }
    assert codes_ref == codes_seed

    # the RESIDUAL index under a refined codebook: residual codes DO
    # depend on the IVF codebook, so only self-consistency is asserted —
    # the probe ranks against the refined sidecar and returns a full,
    # self-pair-free ranking per query
    rref_dir = str(tmp_path / "ivfpq_res_refined")
    similarity.ivfpq_residual_build_index(spark, sf, rref_dir, centroids=cent)
    assert (
        spark.read.parquet(f"{rref_dir}/_centroids").count()
        == similarity.IVF_NLIST
    )
    assert spark.read.parquet(f"{rref_dir}/_codebook").count() == similarity.PQ_K
    rres = similarity.ivfpq_residual_probe_indexed(spark, rref_dir, sf).collect()
    rby_q = {}
    for r in rres:
        assert r.query_id != r.neighbor_id
        rby_q.setdefault(r.query_id, []).append(r)
    assert set(rby_q) == set(range(similarity.N_QUERIES))
    for rows in rby_q.values():
        assert sorted(r.rank for r in rows) == list(range(1, len(rows) + 1))


# --- round 11: crash-atomic index builds (completion marker) -----------------


def test_index_completion_marker_written_and_torn_build_fails_loudly(
    spark, tmp_path
):
    """Every build in the persisted-index family ends by writing the
    ``_complete`` marker; a probe of an artifact whose marker is missing
    (a build that died between its list overwrite and its sidecar writes
    — the torn-artifact window) raises instead of silently scoring
    against stale or seed codebooks."""
    import shutil

    from data_pipeline_python_aws_cdk_spark.functions.indexing import (
        INDEX_COMPLETE_SIDECAR,
    )

    builds = {
        "ivf": (similarity.ivf_build_index, similarity.ivf_probe_indexed),
        "ivfpq": (similarity.ivfpq_build_index, similarity.ivfpq_probe_indexed),
        "pq": (similarity.pq_build_index, similarity.pq_probe_indexed),
        "lsh": (dedup.lsh_build_index, dedup.lsh_probe_indexed),
        "bm25": (text.bm25_build_index, text.bm25_probe_indexed),
        "winnow": (dedup.winnow_index_build, None),
        "substring": (dedup.substring_index_build, None),
    }
    for kind, (build, probe) in builds.items():
        idx = str(tmp_path / f"{kind}_idx")
        build(spark, SF_SMOKE, idx)
        marker = tmp_path / f"{kind}_idx" / INDEX_COMPLETE_SIDECAR
        assert marker.exists(), f"{kind}: build did not write the marker"
        # simulate the torn window: marker gone, lists/sidecars present
        shutil.rmtree(marker)
        probe_fn = probe or (
            lambda s, i, _sf: dedup.dedup_winnowing_indexed(s, i)
            if kind == "winnow"
            else dedup.exact_substring_dedup_indexed(s, i)
        )
        with pytest.raises(ValueError, match="_complete"):
            probe_fn(spark, idx, SF_SMOKE).collect()


def test_index_residual_ivfpq_marker_roundtrip(spark, tmp_path):
    """The residual IVF+PQ build writes the marker last; clearing it makes
    the probe refuse the artifact (ValueError naming the marker)."""
    import shutil

    from data_pipeline_python_aws_cdk_spark.functions.indexing import (
        INDEX_COMPLETE_SIDECAR,
    )

    idx = str(tmp_path / "res_idx")
    similarity.ivfpq_residual_build_index(spark, SF_SMOKE, idx)
    probed = similarity.ivfpq_residual_probe_indexed(spark, idx, SF_SMOKE)
    assert probed.count() > 0
    shutil.rmtree(tmp_path / "res_idx" / INDEX_COMPLETE_SIDECAR)
    with pytest.raises(ValueError, match="_complete"):
        similarity.ivfpq_residual_probe_indexed(spark, idx, SF_SMOKE).collect()


# --- round 11: incremental index maintenance (append = rebuild) --------------


def _index_rows(spark, path):
    df = spark.read.parquet(path)
    return sorted(tuple(r) for r in df.select(*sorted(df.columns)).collect())


def _split_embeddings(spark, at=400):
    e = similarity.load_table(spark, SF_SMOKE, "embeddings")
    return e.filter(F.col("vec_id") < at), e.filter(F.col("vec_id") >= at)


def test_ivfpq_append_equals_full_rebuild_probe_equal_and_idempotent(
    spark, tmp_path
):
    """build(base); append(batch) is row-for-row the artifact
    build(base+batch) writes — codes and assignments are pure functions
    of the frozen sidecar codebooks — the probe results agree, and
    replaying the batch is a no-op (anti-join idempotence)."""
    full_dir, inc_dir = str(tmp_path / "full"), str(tmp_path / "inc")
    base, batch = _split_embeddings(spark)
    similarity.ivfpq_build_index(spark, SF_SMOKE, full_dir)
    similarity.ivfpq_build_index(spark, SF_SMOKE, inc_dir, vectors=base)
    similarity.ivfpq_append_index(spark, inc_dir, batch)
    assert _index_rows(spark, inc_dir) == _index_rows(spark, full_dir)
    probe_full = {
        tuple(r) for r in similarity.ivfpq_probe_indexed(spark, full_dir, SF_SMOKE).collect()
    }
    probe_inc = {
        tuple(r) for r in similarity.ivfpq_probe_indexed(spark, inc_dir, SF_SMOKE).collect()
    }
    assert probe_inc == probe_full and len(probe_inc) > 0
    similarity.ivfpq_append_index(spark, inc_dir, batch)  # replay
    assert _index_rows(spark, inc_dir) == _index_rows(spark, full_dir)


def test_ivf_append_equals_full_rebuild(spark, tmp_path):
    full_dir, inc_dir = str(tmp_path / "full"), str(tmp_path / "inc")
    base, batch = _split_embeddings(spark)
    similarity.ivf_build_index(spark, SF_SMOKE, full_dir)
    similarity.ivf_build_index(spark, SF_SMOKE, inc_dir, vectors=base)
    similarity.ivf_append_index(spark, inc_dir, batch)
    assert _index_rows(spark, inc_dir) == _index_rows(spark, full_dir)


def test_ivfpq_residual_append_equals_full_rebuild_and_probe_equal(
    spark, tmp_path
):
    full_dir, inc_dir = str(tmp_path / "full"), str(tmp_path / "inc")
    base, batch = _split_embeddings(spark)
    similarity.ivfpq_residual_build_index(spark, SF_SMOKE, full_dir)
    similarity.ivfpq_residual_build_index(spark, SF_SMOKE, inc_dir, vectors=base)
    similarity.ivfpq_residual_append_index(spark, inc_dir, batch)
    assert _index_rows(spark, inc_dir) == _index_rows(spark, full_dir)
    probe_full = {
        tuple(r)
        for r in similarity.ivfpq_residual_probe_indexed(
            spark, full_dir, SF_SMOKE
        ).collect()
    }
    probe_inc = {
        tuple(r)
        for r in similarity.ivfpq_residual_probe_indexed(
            spark, inc_dir, SF_SMOKE
        ).collect()
    }
    assert probe_inc == probe_full and len(probe_inc) > 0


def test_lsh_append_equals_full_rebuild_and_screen_equal(spark, tmp_path):
    """The banded-signature index appended batch-by-batch equals the full
    rebuild, and the incremental screen sees identical collisions."""
    full_dir, inc_dir = str(tmp_path / "full"), str(tmp_path / "inc")
    d = dedup.load_table(spark, SF_SMOKE, "documents").filter(
        F.col("source") != "src0"
    )
    base = d.filter(F.col("doc_id") < 400)
    batch = d.filter(F.col("doc_id") >= 400)
    dedup.lsh_build_index(spark, SF_SMOKE, full_dir)
    dedup.lsh_build_index(spark, SF_SMOKE, inc_dir, docs=base)
    dedup.lsh_append_index(spark, inc_dir, batch)
    assert _index_rows(spark, inc_dir) == _index_rows(spark, full_dir)
    sf, si = (
        {tuple(r) for r in dedup.lsh_probe_indexed(spark, p, SF_SMOKE).collect()}
        for p in (full_dir, inc_dir)
    )
    assert si == sf and len(si) > 0
    dedup.lsh_append_index(spark, inc_dir, batch)  # replay: idempotent
    assert _index_rows(spark, inc_dir) == _index_rows(spark, full_dir)


def test_bm25_append_equals_full_rebuild_stats_df_and_probe_equal(
    spark, tmp_path
):
    """Appending documents repairs the denormalized df on every touched
    term's existing postings, adjusts the one-row stats sidecar exactly,
    and yields an artifact row-for-row equal to the full rebuild — so the
    probe's rankings are bit-identical. Replay is a no-op including
    stats."""
    full_dir, inc_dir = str(tmp_path / "full"), str(tmp_path / "inc")
    d = text.load_table(spark, SF_SMOKE, "documents")
    base = d.filter(F.col("doc_id") < 400)
    batch = d.filter(F.col("doc_id") >= 400)
    text.bm25_build_index(spark, SF_SMOKE, full_dir)
    text.bm25_build_index(spark, SF_SMOKE, inc_dir, docs=base)
    text.bm25_append_index(spark, inc_dir, batch)
    assert _index_rows(spark, inc_dir) == _index_rows(spark, full_dir)
    assert (
        spark.read.parquet(f"{inc_dir}/_stats").collect()
        == spark.read.parquet(f"{full_dir}/_stats").collect()
    )
    pf, pi = (
        {tuple(r) for r in text.bm25_probe_indexed(spark, p, SF_SMOKE).collect()}
        for p in (full_dir, inc_dir)
    )
    assert pi == pf and len(pi) > 0
    text.bm25_append_index(spark, inc_dir, batch)  # replay
    assert _index_rows(spark, inc_dir) == _index_rows(spark, full_dir)
    assert (
        spark.read.parquet(f"{inc_dir}/_stats").collect()
        == spark.read.parquet(f"{full_dir}/_stats").collect()
    )


def test_append_refuses_torn_artifact_and_resume_repairs_it(spark, tmp_path):
    """An append onto a torn artifact (no completion marker) raises; the
    documented recovery — re-running the same batch with resume=True —
    converges the artifact back to the full-rebuild state."""
    import shutil

    from data_pipeline_python_aws_cdk_spark.functions.indexing import (
        INDEX_COMPLETE_SIDECAR,
    )

    full_dir, inc_dir = str(tmp_path / "full"), str(tmp_path / "inc")
    base, batch = _split_embeddings(spark)
    similarity.ivfpq_build_index(spark, SF_SMOKE, full_dir)
    similarity.ivfpq_build_index(spark, SF_SMOKE, inc_dir, vectors=base)
    similarity.ivfpq_append_index(spark, inc_dir, batch)
    # simulate the torn window mid-append: marker cleared, lists merged
    shutil.rmtree(tmp_path / "inc" / INDEX_COMPLETE_SIDECAR)
    with pytest.raises(ValueError, match="_complete"):
        similarity.ivfpq_append_index(spark, inc_dir, batch)
    similarity.ivfpq_append_index(spark, inc_dir, batch, resume=True)
    assert _index_rows(spark, inc_dir) == _index_rows(spark, full_dir)


# --- round 11: appended-index compaction + freshness report -------------------


def test_index_compact_preserves_rows_and_probe_and_is_idempotent(
    spark, tmp_path
):
    """index_compact on a built+appended IVF+PQ artifact fragmented into
    the multi-file-per-leaf layout a production-parallelism write leaves:
    rows and probe results are byte-identical before and after, total
    file count drops, the completion marker survives, and a second pass
    is a no-op (stable artifacts must be safe to compact on a
    schedule)."""
    from data_pipeline_python_aws_cdk_spark.functions.indexing import (
        index_compact,
        index_report,
    )

    idx = str(tmp_path / "idx")
    base, batch = _split_embeddings(spark)
    similarity.ivfpq_build_index(spark, SF_SMOKE, idx, vectors=base)
    similarity.ivfpq_append_index(spark, idx, batch)
    similarity._fragment_index(spark, idx)
    before_rows = _index_rows(spark, idx)
    before_probe = {
        tuple(r)
        for r in similarity.ivfpq_probe_indexed(spark, idx, SF_SMOKE).collect()
    }
    before = index_report(spark, idx)
    assert before["complete"] and before["fragmented_partitions"] > 0
    st = index_compact(spark, idx)
    assert st["partitions_compacted"] > 0
    assert st["files_after"] < st["files_before"]
    assert _index_rows(spark, idx) == before_rows
    after_probe = {
        tuple(r)
        for r in similarity.ivfpq_probe_indexed(spark, idx, SF_SMOKE).collect()
    }
    assert after_probe == before_probe and len(after_probe) > 0
    after = index_report(spark, idx)
    assert after["complete"] and after["fragmented_partitions"] == 0
    assert after["total_rows"] == before["total_rows"] == len(before_rows)
    st2 = index_compact(spark, idx)  # stable: schedule-safe no-op
    assert st2["partitions_compacted"] == 0
    assert _index_rows(spark, idx) == before_rows


def test_index_compact_bm25_preserves_probe_stats_and_hash_meta(
    spark, tmp_path
):
    """Compaction is layout-generic: on the bucket-partitioned BM25 index
    the probe rankings, the one-row _stats sidecar, and the hash-mode
    meta all survive the rewrite untouched."""
    from data_pipeline_python_aws_cdk_spark.functions.indexing import index_compact

    idx = str(tmp_path / "bm25")
    d = text.load_table(spark, SF_SMOKE, "documents")
    text.bm25_build_index(spark, SF_SMOKE, idx, docs=d.filter(F.col("doc_id") < 400))
    text.bm25_append_index(spark, idx, d.filter(F.col("doc_id") >= 400))
    similarity._fragment_index(spark, idx, partition_col="bucket")
    before_rows = _index_rows(spark, idx)
    before_probe = {
        tuple(r) for r in text.bm25_probe_indexed(spark, idx, SF_SMOKE).collect()
    }
    stats_before = spark.read.parquet(f"{idx}/_stats").collect()
    st = index_compact(spark, idx)
    assert st["files_after"] < st["files_before"]
    assert _index_rows(spark, idx) == before_rows
    assert spark.read.parquet(f"{idx}/_stats").collect() == stats_before
    after_probe = {
        tuple(r) for r in text.bm25_probe_indexed(spark, idx, SF_SMOKE).collect()
    }
    assert after_probe == before_probe and len(after_probe) > 0


def test_index_compact_lsh_nested_partition_layout(spark, tmp_path):
    """Compaction walks NESTED Hive leaves (band=X/bucket=Y) — the LSH
    layout — rewriting fragmented leaves in place with probe results and
    rows byte-identical."""
    from data_pipeline_python_aws_cdk_spark.functions.indexing import index_compact

    idx = str(tmp_path / "lsh")
    dedup.lsh_build_index(spark, SF_SMOKE, idx)
    similarity._fragment_index(spark, idx, partition_col=("band", "bucket"))
    before_rows = _index_rows(spark, idx)
    before_probe = {
        tuple(r) for r in dedup.lsh_probe_indexed(spark, idx, SF_SMOKE).collect()
    }
    st = index_compact(spark, idx)
    assert st["files_after"] < st["files_before"]
    assert _index_rows(spark, idx) == before_rows
    after_probe = {
        tuple(r) for r in dedup.lsh_probe_indexed(spark, idx, SF_SMOKE).collect()
    }
    assert after_probe == before_probe and len(after_probe) > 0


def test_index_compact_refuses_torn_artifact_and_resume_repairs(
    spark, tmp_path
):
    """Compacting a torn artifact (no completion marker) raises; the
    documented recovery — resume=True — rewrites leaves (each rewrite
    preserves its leaf's rows) and restores the marker."""
    import shutil

    from data_pipeline_python_aws_cdk_spark.functions.indexing import (
        INDEX_COMPLETE_SIDECAR,
        index_compact,
        index_report,
    )

    idx = str(tmp_path / "idx")
    base, batch = _split_embeddings(spark)
    similarity.ivfpq_build_index(spark, SF_SMOKE, idx, vectors=base)
    similarity.ivfpq_append_index(spark, idx, batch)
    similarity._fragment_index(spark, idx)
    before_rows = _index_rows(spark, idx)
    shutil.rmtree(tmp_path / "idx" / INDEX_COMPLETE_SIDECAR)
    assert index_report(spark, idx)["complete"] is False
    with pytest.raises(ValueError, match="_complete"):
        index_compact(spark, idx)
    index_compact(spark, idx, resume=True)
    assert _index_rows(spark, idx) == before_rows
    assert index_report(spark, idx)["complete"] is True


def test_ivfpq_delete_equals_rebuild_without_and_is_idempotent(
    spark, tmp_path
):
    """inverted_lists_delete on the IVF+PQ artifact: build(all);
    delete(tail) is row-for-row build(base), the probe agrees, replaying
    the delete removes nothing, and a fully-emptied list's directory is
    gone from disk (dynamic overwrite alone cannot clear it)."""
    import os

    full_dir, inc_dir = str(tmp_path / "base_only"), str(tmp_path / "deleted")
    base, tail = _split_embeddings(spark)
    similarity.ivfpq_build_index(spark, SF_SMOKE, full_dir, vectors=base)
    similarity.ivfpq_build_index(spark, SF_SMOKE, inc_dir)
    removed = similarity.inverted_lists_delete(
        spark, inc_dir, tail.select("vec_id")
    )
    assert removed == tail.count() > 0
    assert _index_rows(spark, inc_dir) == _index_rows(spark, full_dir)
    pf, pi = (
        {tuple(r) for r in similarity.ivfpq_probe_indexed(spark, p, SF_SMOKE).collect()}
        for p in (full_dir, inc_dir)
    )
    assert pi == pf and len(pi) > 0
    assert similarity.inverted_lists_delete(
        spark, inc_dir, tail.select("vec_id")
    ) == 0  # replay: absent ids rewrite nothing
    assert _index_rows(spark, inc_dir) == _index_rows(spark, full_dir)

    # fully-emptied list: deleting every member of one list removes its
    # directory, and readers see zero rows for it
    idx = spark.read.parquet(inc_dir)
    victim = idx.select("centroid_id").distinct().orderBy("centroid_id").collect()[0][0]
    members = idx.filter(F.col("centroid_id") == victim).select("vec_id")
    n = members.count()
    assert similarity.inverted_lists_delete(spark, inc_dir, members) == n > 0
    assert not os.path.exists(os.path.join(inc_dir, f"centroid_id={victim}"))
    assert (
        spark.read.parquet(inc_dir)
        .filter(F.col("centroid_id") == victim)
        .count()
        == 0
    )


def test_lsh_delete_equals_rebuild_without(spark, tmp_path):
    """The generic delete applied to the (band, bucket)-partitioned LSH
    index: build(all); delete(tail doc_ids) equals build(base), and the
    screen sees identical collisions."""
    full_dir, inc_dir = str(tmp_path / "base_only"), str(tmp_path / "deleted")
    d = dedup.load_table(spark, SF_SMOKE, "documents").filter(
        F.col("source") != "src0"
    )
    base = d.filter(F.col("doc_id") < 400)
    tail = d.filter(F.col("doc_id") >= 400)
    dedup.lsh_build_index(spark, SF_SMOKE, full_dir, docs=base)
    dedup.lsh_build_index(spark, SF_SMOKE, inc_dir)
    removed = similarity.inverted_lists_delete(
        spark, inc_dir, tail.select("doc_id"),
        id_col="doc_id", partition_cols=("band", "bucket"),
    )
    assert removed > 0
    assert _index_rows(spark, inc_dir) == _index_rows(spark, full_dir)
    sf, si = (
        {tuple(r) for r in dedup.lsh_probe_indexed(spark, p, SF_SMOKE).collect()}
        for p in (full_dir, inc_dir)
    )
    assert si == sf


def test_bm25_delete_repairs_df_stats_and_equals_rebuild_without(
    spark, tmp_path
):
    """bm25_delete_index: build(all); delete(tail) is row-for-row
    build(base) INCLUDING the repaired denormalized df and the adjusted
    stats sidecar; the drift audit reads zero; the probe agrees; replay
    removes nothing and leaves stats untouched; a torn delete refuses
    and resume repairs."""
    import shutil

    from data_pipeline_python_aws_cdk_spark.functions.indexing import (
        INDEX_COMPLETE_SIDECAR,
    )

    full_dir, inc_dir = str(tmp_path / "base_only"), str(tmp_path / "deleted")
    d = text.load_table(spark, SF_SMOKE, "documents")
    base = d.filter(F.col("doc_id") < 400)
    tail_ids = d.filter(F.col("doc_id") >= 400).select("doc_id")
    text.bm25_build_index(spark, SF_SMOKE, full_dir, docs=base)
    text.bm25_build_index(spark, SF_SMOKE, inc_dir)
    removed = text.bm25_delete_index(spark, inc_dir, tail_ids)
    assert removed > 0
    assert _index_rows(spark, inc_dir) == _index_rows(spark, full_dir)
    assert (
        spark.read.parquet(f"{inc_dir}/_stats").collect()
        == spark.read.parquet(f"{full_dir}/_stats").collect()
    )
    drift = text.bm25_index_drift(spark, inc_dir)
    assert drift["drifted_terms"] == 0 and drift["n_docs_drift"] == 0
    pf, pi = (
        {tuple(r) for r in text.bm25_probe_indexed(spark, p, SF_SMOKE).collect()}
        for p in (full_dir, inc_dir)
    )
    assert pi == pf and len(pi) > 0
    assert text.bm25_delete_index(spark, inc_dir, tail_ids) == 0  # replay
    assert (
        spark.read.parquet(f"{inc_dir}/_stats").collect()
        == spark.read.parquet(f"{full_dir}/_stats").collect()
    )
    # torn delete refuses; resume converges
    shutil.rmtree(tmp_path / "deleted" / INDEX_COMPLETE_SIDECAR)
    with pytest.raises(ValueError, match="_complete"):
        text.bm25_delete_index(spark, inc_dir, tail_ids)
    text.bm25_delete_index(spark, inc_dir, tail_ids, resume=True)
    assert _index_rows(spark, inc_dir) == _index_rows(spark, full_dir)


def test_winnow_delete_repairs_df_and_equals_rebuild_without(
    spark, tmp_path
):
    """winnow_index_delete: build(all); delete(tail) is row-for-row
    build(base) INCLUDING the repaired denormalized df (the probe-side
    cap's input — a skipped repair would resurrect capped fingerprints),
    the indexed verdict frame agrees, and replay removes nothing."""
    full_dir, inc_dir = str(tmp_path / "base_only"), str(tmp_path / "deleted")
    d = dedup.load_table(spark, SF_SMOKE, "documents")
    base = d.filter(F.col("doc_id") < 400)
    tail_ids = d.filter(F.col("doc_id") >= 400).select("doc_id")
    dedup.winnow_index_build(spark, SF_SMOKE, full_dir, docs=base)
    dedup.winnow_index_build(spark, SF_SMOKE, inc_dir)
    removed = dedup.winnow_index_delete(spark, inc_dir, tail_ids)
    assert removed > 0
    assert _index_rows(spark, inc_dir) == _index_rows(spark, full_dir)
    vf, vi = (
        {tuple(r) for r in dedup.dedup_winnowing_indexed(spark, p).collect()}
        for p in (full_dir, inc_dir)
    )
    assert vi == vf and len(vi) > 0
    assert dedup.winnow_index_delete(spark, inc_dir, tail_ids) == 0  # replay
    assert _index_rows(spark, inc_dir) == _index_rows(spark, full_dir)


def test_substring_delete_equals_rebuild_without(spark, tmp_path):
    """The generic per-id delete applied to the substring fingerprint
    stream (no denormalized df): build(all); delete(tail doc_ids) equals
    build(base), and the indexed span pipeline agrees."""
    full_dir, inc_dir = str(tmp_path / "base_only"), str(tmp_path / "deleted")
    d = dedup.load_table(spark, SF_SMOKE, "documents")
    base = d.filter(F.col("doc_id") < 400)
    tail_ids = d.filter(F.col("doc_id") >= 400).select("doc_id")
    dedup.substring_index_build(spark, SF_SMOKE, full_dir, docs=base)
    dedup.substring_index_build(spark, SF_SMOKE, inc_dir)
    removed = similarity.inverted_lists_delete(
        spark, inc_dir, tail_ids, id_col="doc_id", partition_cols=("bucket",)
    )
    assert removed > 0
    assert _index_rows(spark, inc_dir) == _index_rows(spark, full_dir)
    sf, si = (
        {
            tuple(r)
            for r in dedup.exact_substring_dedup_indexed(spark, p).collect()
        }
        for p in (full_dir, inc_dir)
    )
    assert si == sf


def test_ann_screen_prunes_index_partitions(spark, tmp_path):
    """The ingest screen's candidate fetch must read the standing index
    through PartitionFilters (centroid INSET) — the same file-level
    pruning contract as ivf_probe_indexed: at production NLIST a batch
    touches its probed lists' directories and nothing else."""
    import re

    idx = str(tmp_path / "ivf_idx")
    similarity.ivf_build_index(spark, SF_SMOKE, idx)
    e = similarity.load_table(spark, SF_SMOKE, "embeddings")
    verdicts = similarity.ann_screen_against_index(
        spark, e.filter(F.col("vec_id") >= 400), idx
    )
    assert verdicts.count() > 0
    plan = verdicts._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[[^\]]*centroid_id[^\]]*INSET", plan)
    assert m is not None, "centroid INSET missing from screen's index scan"
    # scan budget (the §8.3 gate): the batch rides its localCheckpoint
    # and the batch-wide exclusion broadcasts from it, so the FINAL plan
    # holds exactly ONE parquet scan — the pruned index read. A second
    # scan means a consumer escaped the checkpoint and re-reads a table.
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1, final.count("Scan parquet")


def test_ann_screen_threshold_pinned_to_dedup_bar():
    """ANN_SCREEN_THRESHOLD cannot be imported from dedup at module load
    (decoration-time cycle through the text/rrf oracle chain) — this gate
    is the drift guard the import would have been."""
    assert similarity.ANN_SCREEN_THRESHOLD == dedup.EMBEDDING_DUP_THRESHOLD


def test_bm25_index_drift_zero_after_append_and_detects_corruption(
    spark, tmp_path
):
    """The BM25 freshness audit: after a build+append sequence the stored
    df and stats are exactly the recomputed values (the append's window
    repair invariant); planting a duplicated posting (a torn write's
    signature) flips the df drift nonzero, and a stale stats sidecar
    flips the doc-count drift."""
    idx = str(tmp_path / "bm25")
    d = text.load_table(spark, SF_SMOKE, "documents")
    text.bm25_build_index(spark, SF_SMOKE, idx, docs=d.filter(F.col("doc_id") < 400))
    text.bm25_append_index(spark, idx, d.filter(F.col("doc_id") >= 400))
    drift = text.bm25_index_drift(spark, idx)
    assert drift["drifted_terms"] == 0 and drift["max_df_drift"] == 0
    assert drift["n_docs_drift"] == 0 and drift["total_tokens_drift"] == 0
    assert drift["terms"] > 0

    # plant a duplicated posting in one bucket: df on the copy stays the
    # old value while the recount rises — exactly a torn write's signature
    one = spark.read.parquet(idx).limit(1).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    bucket = one.collect()[0].bucket
    one.drop("bucket").write.mode("append").parquet(f"{idx}/bucket={bucket}")
    bad = text.bm25_index_drift(spark, idx)
    assert bad["drifted_terms"] >= 1 and bad["max_df_drift"] >= 1
    assert bad["n_docs_drift"] != 0  # the planted doc is absent from stats


def test_bpe_encode_batched_equals_serial_through_full_chain(spark):
    """The batched trainer's final state pushed through the shared encode
    tail yields per-doc rows IDENTICAL to serial training at the same
    {12}-merge depth — the end-to-end form of the merge-schedule equality
    (which bpe_train_batched_merges and the hypothesis gate pin) — while
    spending strictly fewer driver rounds on this corpus (measured 6
    rounds for 12 merges at sf0.001)."""
    depth = text.BPE_ENCODE_BATCHED_MERGES
    _, st_serial = text._bpe_train_states(spark, SF_SMOKE, depth)
    merges, st_batched, rounds = text._bpe_train_states_batched(
        spark, SF_SMOKE, depth
    )
    assert len(merges) == depth and rounds <= depth
    a = sorted(
        tuple(r) for r in text._bpe_encode_summary(spark, SF_SMOKE, st_serial).collect()
    )
    b = sorted(
        tuple(r)
        for r in text._bpe_encode_summary(spark, SF_SMOKE, st_batched).collect()
    )
    assert a == b and len(a) > 0


def test_index_report_rows_files_and_sidecars(spark, tmp_path):
    """The freshness report's row counts come from the artifact itself
    (sum over partitions == artifact row count), the sidecar listing
    names the codebooks, and per-partition entries carry the Hive
    partition path."""
    from data_pipeline_python_aws_cdk_spark.functions.indexing import index_report

    idx = str(tmp_path / "idx")
    similarity.ivfpq_build_index(spark, SF_SMOKE, idx)
    rep = index_report(spark, idx)
    assert rep["complete"] is True
    assert "_centroids" in rep["sidecars"] and "_codebook" in rep["sidecars"]
    total = spark.read.parquet(idx).count()
    assert rep["total_rows"] == total > 0
    assert rep["n_partitions"] == len(rep["partitions"]) > 0
    assert all(
        p["partition"].startswith("centroid_id=") for p in rep["partitions"]
    )
    assert all(p["n_files"] >= 1 and p["n_rows"] >= 1 for p in rep["partitions"])


# --- round 11: indexed hybrid retrieval serving path -------------------------


def test_hybrid_rrf_served_from_indexes_equals_inline(spark, tmp_path):
    """The two-tower serving composition: BM25 probe + IVF probe (exact at
    nprobe=NLIST) fused with the shared RRF tail must equal the inline
    retrieval_hybrid_rrf bit-for-bit; the ivfpq tower variant fuses the
    same shape with the approximate semantic arm."""
    bm25_dir = str(tmp_path / "bm25")
    ivf_dir = str(tmp_path / "ivf")
    pq_dir = str(tmp_path / "ivfpq")
    text.bm25_build_index(spark, SF_SMOKE, bm25_dir)
    similarity.ivf_build_index(spark, SF_SMOKE, ivf_dir)
    similarity.ivfpq_build_index(spark, SF_SMOKE, pq_dir)
    inline = {tuple(r) for r in text.retrieval_hybrid_rrf(spark, SF_SMOKE).collect()}
    served = {
        tuple(r)
        for r in text.retrieval_hybrid_rrf_from_indexes(
            spark, bm25_dir, ivf_dir, SF_SMOKE
        ).collect()
    }
    assert served == inline and len(served) > 0

    approx = text.retrieval_hybrid_rrf_from_indexes(
        spark, bm25_dir, pq_dir, SF_SMOKE,
        nprobe=similarity.IVF_NPROBE, ann_probe="ivfpq",
    ).collect()
    assert approx and all(1 <= r.rank <= text.BM25_TOP_K for r in approx)
    assert any(r.in_semantic for r in approx) and any(r.in_lexical for r in approx)


# --- round 11: batched BPE merges --------------------------------------------


def test_bpe_train_batched_equals_serial_with_fewer_rounds(spark, tmp_path):
    """The batched trainer must reproduce the serial merge list
    element-for-element (the provable prefix rule) while using fewer
    driver rounds on a corpus with several disjoint high-count pairs."""
    docs = [
        (1, "aa bb aa bb cc dd cc dd ee ff ee ff", "en", "s", 1),
        (2, "aa bb cc dd ee ff gg hh gg hh", "en", "s", 1),
        (3, "low lower lowest new newer newest wide wider", "en", "s", 1),
    ]
    out = tmp_path / "bpe_batch"
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{out}/documents.parquet")
    serial = text.bpe_train(spark, str(out), n_merges=10)
    batched = text.bpe_train_batched(spark, str(out), n_merges=10)
    assert batched["merges"] == serial["merges"]
    assert batched["vocab_size"] == serial["vocab_size"]
    assert batched["total_symbols"] == serial["total_symbols"]
    assert batched["rounds"] < 10  # the whole point: fewer driver rounds


def test_bpe_train_batched_property_random_corpora(spark, tmp_path):
    """Property: the batched trainer agrees with the pure-Python serial
    reference merge-for-merge on randomized corpora — the prefix rule
    must never admit a pair the serial schedule would not pick next."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    word = st.text(alphabet="abcd", min_size=1, max_size=6)
    corpus = st.lists(
        st.lists(word, min_size=1, max_size=8).map(" ".join),
        min_size=1,
        max_size=4,
    )

    case = [0]

    @given(texts=corpus)
    @settings(
        max_examples=6, deadline=None, suppress_health_check=list(HealthCheck)
    )
    def check(texts):
        case[0] += 1
        out = tmp_path / f"bpe_bprop_{case[0]}"
        spark.createDataFrame(
            [(i, t, "en", "s", 1) for i, t in enumerate(texts)],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(f"{out}/documents.parquet")
        wf = {}
        for t in texts:
            for w in t.lower().split():
                wf[w] = wf.get(w, 0) + 1
        expected = _reference_bpe(wf, 5)
        got = text.bpe_train_batched(spark, str(out), n_merges=5)
        assert got["merges"] == expected

    check()


# --- round 11: refined-codebook recall scoreboard -----------------------------


def test_refined_codebook_scoreboard_pins_seed_vs_trained_decision(spark):
    """The refined-codebook rows are a standing regression table: on this
    near-uniform synthetic corpus the SEED codebooks must beat the
    k-means-refined ones at fixed nprobe (the measured artifact the
    ivf_train_centroids docstring documents), and the recall kernel is
    shared with the oracle-verified seed scoreboard."""
    refined = {
        r.method: r
        for r in similarity.similarity_ann_recall_refined(spark, SF_SMOKE).collect()
    }
    assert set(refined) == {"ann_ivf_refined", "ann_ivfpq_res_refined"}
    assert all(r.queries == similarity.N_QUERIES for r in refined.values())
    seed = {
        r.method: r
        for r in similarity.similarity_ann_recall_report(spark, SF_SMOKE).collect()
    }
    # the deployment decision this table exists to answer, pinned:
    assert seed["ann_ivf"].recall_at_10 > refined["ann_ivf_refined"].recall_at_10
    assert (
        seed["ann_ivfpq_res"].recall_at_10
        > refined["ann_ivfpq_res_refined"].recall_at_10
    )
    # exact measured values (regression alarm for a silently-changed
    # codebook path; MLlib seed and corpus are both fixed)
    assert refined["ann_ivf_refined"].recall_at_10 == 0.575
    assert refined["ann_ivfpq_res_refined"].recall_at_10 == 0.5125


def test_refined_scoreboard_survives_tiny_corpus(spark, tmp_path):
    """A corpus too small to seed the residual codebook yields the IVF row
    alone (k clamped to the distinct pool); no crash, stable schema."""
    import pyspark.sql.functions as F  # noqa: F811

    e = similarity.load_table(spark, SF_SMOKE, "embeddings").filter(
        F.col("vec_id") < 12
    )
    out = tmp_path / "tiny"
    e.write.parquet(f"{out}/embeddings.parquet")
    rows = similarity.similarity_ann_recall_refined(spark, str(out)).collect()
    assert [r.method for r in rows] == ["ann_ivf_refined"]


# --- round 11: winnow/substring index appends ---------------------------------


def _docs_df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_substring_append_equals_full_rebuild_spans_and_replay(spark, tmp_path):
    """build(base); append(batch) equals build(base+batch) row-for-row for
    the window-fingerprint index, the served span manifest agrees, and a
    replayed batch is a no-op."""
    para = " ".join(f"w{i}" for i in range(20))
    rows = [
        (1, para + " tail one here now", "en", "s", 1),
        (2, para + " other ending words go", "en", "s", 1),
        (3, " ".join(f"u{i}" for i in range(25)), "en", "s", 1),
        (4, para + " appended later document text", "en", "s", 1),
        (5, " ".join(f"v{i}" for i in range(25)), "en", "s", 1),
    ]
    out = tmp_path / "sub_docs"
    _docs_df(spark, rows).write.parquet(f"{out}/documents.parquet")
    d = dedup.load_table(spark, str(out), "documents")
    full_dir, inc_dir = str(tmp_path / "full"), str(tmp_path / "inc")
    dedup.substring_index_build(spark, str(out), full_dir)
    dedup.substring_index_build(
        spark, str(out), inc_dir, docs=d.filter(F.col("doc_id") <= 3)
    )
    dedup.substring_index_append(spark, inc_dir, d.filter(F.col("doc_id") > 3))
    assert _index_rows(spark, inc_dir) == _index_rows(spark, full_dir)
    sf_, si_ = (
        {tuple(r) for r in dedup.exact_substring_dedup_indexed(spark, p).collect()}
        for p in (full_dir, inc_dir)
    )
    assert si_ == sf_ and len(si_) > 0
    dedup.substring_index_append(spark, inc_dir, d.filter(F.col("doc_id") > 3))
    assert _index_rows(spark, inc_dir) == _index_rows(spark, full_dir)


def test_winnow_append_repairs_df_across_the_probe_side_cap(spark, tmp_path):
    """The case that forced the skew cap OUT of the artifact: a batch
    pushes a standing fingerprint's global df over the cap. The appended
    index must equal the full rebuild row-for-row INCLUDING the
    denormalized df column, and a probe at a cap the batch crosses must
    drop the fingerprint exactly as a rebuild would."""
    para = " ".join(f"b{i}" for i in range(25))
    base_rows = [(i, para + f" tail{i} x{i} y{i} z{i}", "en", "s", 1) for i in (1, 2, 3)]
    batch_rows = [(i, para + f" tail{i} x{i} y{i} z{i}", "en", "s", 1) for i in (4, 5, 6)]
    out = tmp_path / "win_docs"
    _docs_df(spark, base_rows + batch_rows).write.parquet(f"{out}/documents.parquet")
    d = dedup.load_table(spark, str(out), "documents")
    full_dir, inc_dir = str(tmp_path / "full"), str(tmp_path / "inc")
    dedup.winnow_index_build(spark, str(out), full_dir)
    dedup.winnow_index_build(
        spark, str(out), inc_dir, docs=d.filter(F.col("doc_id") <= 3)
    )
    dedup.winnow_index_append(spark, inc_dir, d.filter(F.col("doc_id") > 3))
    assert _index_rows(spark, inc_dir) == _index_rows(spark, full_dir)
    # the shared paragraph yields at least one fingerprint in all 6 docs
    dfs = {r.df for r in spark.read.parquet(inc_dir).collect()}
    assert 6 in dfs
    # a cap of 4: base-built df was 3 (kept), global df is 6 (dropped) —
    # the appended index's repaired df must drive the same drop a rebuild does
    for cap in (4, dedup.WINNOW_DF_CAP):
        pf = {
            tuple(r)
            for r in dedup._winnow_pairs(
                dedup._winnow_index_capped(spark.read.parquet(full_dir), cap)
            ).collect()
        }
        pi = {
            tuple(r)
            for r in dedup._winnow_pairs(
                dedup._winnow_index_capped(spark.read.parquet(inc_dir), cap)
            ).collect()
        }
        assert pi == pf
    # default-cap probe also equals the inline pairs (the registered gate)
    inline = {tuple(r) for r in dedup.dedup_winnowing(spark, str(out)).collect()}
    probed = {tuple(r) for r in dedup.dedup_winnowing_indexed(spark, inc_dir).collect()}
    assert probed == inline
    # replay idempotence
    dedup.winnow_index_append(spark, inc_dir, d.filter(F.col("doc_id") > 3))
    assert _index_rows(spark, inc_dir) == _index_rows(spark, full_dir)


def test_pruned_screens_equal_full_index_screens_and_prune(spark, tmp_path):
    """The bucket-layout payoff on the read side: the pruned substring and
    winnow screens equal the full-index screens row-for-row, and their
    standing-index scans carry a bucket INSET partition filter."""
    import re

    d = dedup.load_table(spark, SF_SMOKE, "documents")
    standing = d.filter(F.col("source") != "src0")
    batch = d.filter(F.col("source") == "src0")
    sub_idx = str(tmp_path / "sub_idx")
    win_idx = str(tmp_path / "win_idx")
    dedup.substring_index_build(spark, SF_SMOKE, sub_idx, docs=standing)
    dedup.winnow_index_build(spark, SF_SMOKE, win_idx, docs=standing)
    for pruned_fn, full_fn, idx in (
        (dedup.substring_screen_indexed, dedup.substring_screen_against_index, sub_idx),
        (dedup.winnow_screen_indexed, dedup.winnow_screen_against_index, win_idx),
    ):
        pruned = pruned_fn(spark, idx, batch)
        full = full_fn(batch, spark.read.parquet(idx))
        assert {tuple(r) for r in pruned.collect()} == {
            tuple(r) for r in full.collect()
        }
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert re.search(r"PartitionFilters: \[[^\]]*bucket[^\]]*INSET", plan), plan[:2000]


# --- round 12: torn-delete convergence (the resume=True contract) -------------


def test_bm25_torn_delete_tail_recovery_recomputes_stats_and_remarks(
    spark, tmp_path
):
    """A crash AFTER the partition rewrite and emptied-bucket sweep but
    BEFORE the _stats/marker writes leaves an index whose postings are
    already correct, its sidecar stale, and its marker cleared. The
    resume re-run then finds no matching postings — and must NOT
    early-return: it recomputes _stats from the surviving postings and
    re-marks, or the artifact stays permanently unprobeable with
    inflated stats."""
    import shutil

    from data_pipeline_python_aws_cdk_spark.functions.indexing import (
        INDEX_COMPLETE_SIDECAR,
    )

    full_dir, inc_dir = str(tmp_path / "base_only"), str(tmp_path / "deleted")
    d = text.load_table(spark, SF_SMOKE, "documents")
    base = d.filter(F.col("doc_id") < 400)
    tail_ids = d.filter(F.col("doc_id") >= 400).select("doc_id")
    text.bm25_build_index(spark, SF_SMOKE, full_dir, docs=base)
    text.bm25_build_index(spark, SF_SMOKE, inc_dir)
    pre_stats = spark.read.parquet(f"{inc_dir}/_stats").collect()

    text.bm25_delete_index(spark, inc_dir, tail_ids)

    # reconstruct the torn tail state: postings done, stats stale, no marker
    shutil.rmtree(tmp_path / "deleted" / INDEX_COMPLETE_SIDECAR)
    spark.createDataFrame(
        pre_stats, "n_docs bigint, total_tokens bigint"
    ).write.mode("overwrite").parquet(f"{inc_dir}/_stats")

    assert text.bm25_delete_index(spark, inc_dir, tail_ids, resume=True) == 0
    assert (
        spark.read.parquet(f"{inc_dir}/_stats").collect()
        == spark.read.parquet(f"{full_dir}/_stats").collect()
    )
    drift = text.bm25_index_drift(spark, inc_dir)  # asserts the marker too
    assert drift["n_docs_drift"] == 0 and drift["total_tokens_drift"] == 0


def test_bm25_torn_delete_partial_rewrite_recovery_avoids_stats_drift(
    spark, tmp_path
):
    """A crash PART-WAY through the delete (some buckets rewritten, one
    still holding the deleted docs' postings, stats untouched): the
    resume re-run only re-finds the surviving postings, so decrement
    arithmetic would under-subtract docs the torn run fully removed —
    the recompute-from-surviving-postings path must land _stats exactly
    at the rebuild-without values."""
    import os
    import shutil

    from data_pipeline_python_aws_cdk_spark.functions.indexing import (
        INDEX_COMPLETE_SIDECAR,
    )

    full_dir, inc_dir = str(tmp_path / "base_only"), str(tmp_path / "deleted")
    d = text.load_table(spark, SF_SMOKE, "documents")
    base = d.filter(F.col("doc_id") < 400)
    tail_ids = d.filter(F.col("doc_id") >= 400).select("doc_id")
    text.bm25_build_index(spark, SF_SMOKE, full_dir, docs=base)
    text.bm25_build_index(spark, SF_SMOKE, inc_dir)
    pre_stats = spark.read.parquet(f"{inc_dir}/_stats").collect()

    # pick a bucket that holds tail postings and save its pre-delete files
    victim = (
        spark.read.parquet(inc_dir)
        .join(tail_ids, "doc_id", "semi")
        .select("bucket")
        .distinct()
        .orderBy("bucket")
        .collect()[0][0]
    )
    saved = str(tmp_path / "saved_bucket")
    shutil.copytree(os.path.join(inc_dir, f"bucket={victim}"), saved)

    text.bm25_delete_index(spark, inc_dir, tail_ids)

    # torn state: victim bucket back at its pre-delete content, stats
    # stale, marker cleared — every other bucket already rewritten
    shutil.rmtree(tmp_path / "deleted" / INDEX_COMPLETE_SIDECAR)
    vdir = os.path.join(inc_dir, f"bucket={victim}")
    shutil.rmtree(vdir, ignore_errors=True)
    shutil.copytree(saved, vdir)
    spark.createDataFrame(
        pre_stats, "n_docs bigint, total_tokens bigint"
    ).write.mode("overwrite").parquet(f"{inc_dir}/_stats")

    removed = text.bm25_delete_index(spark, inc_dir, tail_ids, resume=True)
    assert removed > 0  # the victim bucket's stale postings
    assert _index_rows(spark, inc_dir) == _index_rows(spark, full_dir)
    assert (
        spark.read.parquet(f"{inc_dir}/_stats").collect()
        == spark.read.parquet(f"{full_dir}/_stats").collect()
    )
    drift = text.bm25_index_drift(spark, inc_dir)
    assert drift["drifted_terms"] == 0 and drift["n_docs_drift"] == 0
    assert drift["total_tokens_drift"] == 0


def test_winnow_torn_delete_tail_recovery_remarks(spark, tmp_path):
    """winnow_index_delete's tail recovery: rewrite and sweep done, marker
    never restored — the resume re-run finds nothing to touch and must
    re-mark instead of early-returning."""
    import shutil

    from data_pipeline_python_aws_cdk_spark.functions.indexing import (
        INDEX_COMPLETE_SIDECAR,
        assert_index_complete,
    )

    inc_dir = str(tmp_path / "deleted")
    d = dedup.load_table(spark, SF_SMOKE, "documents")
    tail_ids = d.filter(F.col("doc_id") >= 400).select("doc_id")
    dedup.winnow_index_build(spark, SF_SMOKE, inc_dir)
    assert dedup.winnow_index_delete(spark, inc_dir, tail_ids) > 0
    rows_after = _index_rows(spark, inc_dir)

    shutil.rmtree(tmp_path / "deleted" / INDEX_COMPLETE_SIDECAR)
    assert dedup.winnow_index_delete(spark, inc_dir, tail_ids, resume=True) == 0
    assert_index_complete(spark, inc_dir)
    assert _index_rows(spark, inc_dir) == rows_after


def test_inverted_lists_torn_delete_tail_recovery_remarks(spark, tmp_path):
    """inverted_lists_delete's tail recovery on the IVF+PQ artifact: the
    resume re-run of a delete whose data work already finished re-marks
    the index instead of leaving it permanently failing the probe
    assert."""
    import shutil

    from data_pipeline_python_aws_cdk_spark.functions.indexing import (
        INDEX_COMPLETE_SIDECAR,
        assert_index_complete,
    )

    inc_dir = str(tmp_path / "deleted")
    base, tail = _split_embeddings(spark)
    similarity.ivfpq_build_index(spark, SF_SMOKE, inc_dir)
    assert similarity.inverted_lists_delete(
        spark, inc_dir, tail.select("vec_id")
    ) == tail.count() > 0
    rows_after = _index_rows(spark, inc_dir)

    shutil.rmtree(tmp_path / "deleted" / INDEX_COMPLETE_SIDECAR)
    assert similarity.inverted_lists_delete(
        spark, inc_dir, tail.select("vec_id"), resume=True
    ) == 0
    assert_index_complete(spark, inc_dir)
    assert _index_rows(spark, inc_dir) == rows_after


def test_fragment_index_follows_marker_discipline(spark, tmp_path):
    """_fragment_index rewrites real artifacts inside registered queries,
    so it must refuse a torn artifact (assert first) and leave the marker
    restored after a successful rewrite — the index_compact shape."""
    import shutil

    from data_pipeline_python_aws_cdk_spark.functions.indexing import (
        INDEX_COMPLETE_SIDECAR,
        assert_index_complete,
        mark_index_complete,
    )

    idx = str(tmp_path / "ivfpq_idx")
    similarity.ivfpq_build_index(spark, SF_SMOKE, idx)
    rows = _index_rows(spark, idx)
    shutil.rmtree(tmp_path / "ivfpq_idx" / INDEX_COMPLETE_SIDECAR)
    with pytest.raises(ValueError, match="_complete"):
        similarity._fragment_index(spark, idx)
    mark_index_complete(spark, idx)
    similarity._fragment_index(spark, idx)
    assert_index_complete(spark, idx)
    assert _index_rows(spark, idx) == rows


# --- round 12: the unpartitioned (PQ) kind's full lifecycle -------------------


def test_pq_append_equals_full_rebuild_probe_equal_and_idempotent(
    spark, tmp_path
):
    """build(base); pq_append_index(batch) is row-for-row the table
    build(base+batch) writes — batch codes come from the frozen
    _codebook through the shared kernel — the ADC probe agrees, replay
    is a no-op, a torn append refuses without resume, and resume
    converges."""
    import shutil

    from data_pipeline_python_aws_cdk_spark.functions.indexing import (
        INDEX_COMPLETE_SIDECAR,
    )

    full_dir, inc_dir = str(tmp_path / "full"), str(tmp_path / "inc")
    base, tail = _split_embeddings(spark)
    similarity.pq_build_index(spark, SF_SMOKE, full_dir)
    similarity.pq_build_index(spark, SF_SMOKE, inc_dir, vectors=base)
    similarity.pq_append_index(spark, inc_dir, tail)
    assert _index_rows(spark, inc_dir) == _index_rows(spark, full_dir)
    pf, pi = (
        {tuple(r) for r in similarity.pq_probe_indexed(spark, p, SF_SMOKE).collect()}
        for p in (full_dir, inc_dir)
    )
    assert pi == pf and len(pi) > 0

    similarity.pq_append_index(spark, inc_dir, tail)  # replay: no-op
    assert _index_rows(spark, inc_dir) == _index_rows(spark, full_dir)

    # torn append refuses; resume converges and re-marks
    shutil.rmtree(tmp_path / "inc" / INDEX_COMPLETE_SIDECAR)
    with pytest.raises(ValueError, match="_complete"):
        similarity.pq_append_index(spark, inc_dir, tail)
    similarity.pq_append_index(spark, inc_dir, tail, resume=True)
    assert _index_rows(spark, inc_dir) == _index_rows(spark, full_dir)


def test_pq_delete_equals_rebuild_without_and_tail_recovery(spark, tmp_path):
    """pq_delete_index: build(all); delete(tail) is row-for-row
    build(base), the probe agrees, replay removes nothing, and the
    tail-crash resume (swap done, marker never restored) re-marks."""
    import shutil

    from data_pipeline_python_aws_cdk_spark.functions.indexing import (
        INDEX_COMPLETE_SIDECAR,
        assert_index_complete,
    )

    full_dir, inc_dir = str(tmp_path / "base_only"), str(tmp_path / "deleted")
    base, tail = _split_embeddings(spark)
    similarity.pq_build_index(spark, SF_SMOKE, full_dir, vectors=base)
    similarity.pq_build_index(spark, SF_SMOKE, inc_dir)
    removed = similarity.pq_delete_index(spark, inc_dir, tail.select("vec_id"))
    assert removed == tail.count() > 0
    assert _index_rows(spark, inc_dir) == _index_rows(spark, full_dir)
    pf, pi = (
        {tuple(r) for r in similarity.pq_probe_indexed(spark, p, SF_SMOKE).collect()}
        for p in (full_dir, inc_dir)
    )
    assert pi == pf and len(pi) > 0
    assert similarity.pq_delete_index(
        spark, inc_dir, tail.select("vec_id")
    ) == 0  # replay: absent ids rewrite nothing
    assert _index_rows(spark, inc_dir) == _index_rows(spark, full_dir)

    shutil.rmtree(tmp_path / "deleted" / INDEX_COMPLETE_SIDECAR)
    assert similarity.pq_delete_index(
        spark, inc_dir, tail.select("vec_id"), resume=True
    ) == 0
    assert_index_complete(spark, inc_dir)
    assert _index_rows(spark, inc_dir) == _index_rows(spark, full_dir)


def test_staged_table_swap_recovers_at_every_crash_point(spark, tmp_path):
    """The staged swap protocol behind the unpartitioned lifecycle:
    an UNCOMMITTED stage (crash mid-stage-write) is discarded with the
    old table intact; a COMMITTED stage (crash mid-swap, even after some
    old files were already deleted) finishes to exactly the staged
    table."""
    import os

    from data_pipeline_python_aws_cdk_spark.functions.indexing import (
        finish_staged_table_swap,
    )

    root = str(tmp_path / "tbl")
    old = spark.createDataFrame([(i, i * 10) for i in range(8)], "vec_id long, pq_code long")
    old.repartition(2).write.parquet(root)
    old_rows = _index_rows(spark, root)

    # crash mid-stage-write: files staged, manifest never committed
    new = spark.createDataFrame([(i, i * 7) for i in range(5)], "vec_id long, pq_code long")
    new.write.parquet(f"{root}/_stage")
    assert finish_staged_table_swap(spark, root) is False
    assert not os.path.exists(f"{root}/_stage")
    assert _index_rows(spark, root) == old_rows  # old table untouched

    # crash mid-swap: stage committed (manifest present), one old file
    # already deleted — the finish must land exactly the staged table
    new.write.parquet(f"{root}/_stage")
    names = [
        n for n in os.listdir(f"{root}/_stage")
        if not n.startswith(("_", ".")) and os.path.isfile(f"{root}/_stage/{n}")
    ]
    spark.createDataFrame([(n,) for n in names], "name string").coalesce(
        1
    ).write.parquet(f"{root}/_stage/_manifest")
    victim = next(
        n for n in os.listdir(root)
        if not n.startswith(("_", ".")) and os.path.isfile(f"{root}/{n}")
    )
    os.remove(f"{root}/{victim}")
    assert finish_staged_table_swap(spark, root) is True
    assert not os.path.exists(f"{root}/_stage")
    got = {tuple(r) for r in spark.read.parquet(root).collect()}
    assert got == {(i, i * 7) for i in range(5)}
    # idempotent: a second finish is a no-op
    assert finish_staged_table_swap(spark, root) is False
    assert {tuple(r) for r in spark.read.parquet(root).collect()} == got


def _commit_stage(spark, root, df, extra_manifest_names=()):
    """Write a COMMITTED stage under root (data files + manifest), the
    state a crash between staged_table_replace's commit and its swap
    leaves behind."""
    import os

    df.write.parquet(f"{root}/_stage")
    names = [
        n
        for n in os.listdir(f"{root}/_stage")
        if not n.startswith(("_", ".")) and os.path.isfile(f"{root}/_stage/{n}")
    ] + list(extra_manifest_names)
    spark.createDataFrame([(n,) for n in names], "name string").coalesce(
        1
    ).write.parquet(f"{root}/_stage/_manifest")


def test_staged_swap_unreadable_manifest_raises_and_preserves_stage(
    spark, tmp_path
):
    """The round-12 advice finding: a manifest that EXISTS but cannot be
    read is an environmental failure, not an uncommitted stage — the
    stage may be the only complete copy, so the finish must surface the
    error and leave both stage and table untouched, never discard."""
    import os

    from data_pipeline_python_aws_cdk_spark.functions.indexing import (
        finish_staged_table_swap,
    )

    root = str(tmp_path / "tbl")
    old = spark.createDataFrame(
        [(i, i * 10) for i in range(8)], "vec_id long, pq_code long"
    )
    old.write.parquet(root)
    old_rows = _index_rows(spark, root)
    new = spark.createDataFrame(
        [(i, i * 7) for i in range(5)], "vec_id long, pq_code long"
    )
    _commit_stage(spark, root, new)
    # corrupt every manifest data file in place: present but unreadable
    mdir = f"{root}/_stage/_manifest"
    for n in os.listdir(mdir):
        if not n.startswith(("_", ".")) and n.endswith(".parquet"):
            with open(os.path.join(mdir, n), "wb") as fh:
                fh.write(b"not a parquet file")
    with pytest.raises(Exception):
        finish_staged_table_swap(spark, root)
    assert os.path.exists(f"{root}/_stage")  # NOT discarded
    assert _index_rows(spark, root) == old_rows  # old table untouched


def test_staged_swap_refuses_to_drop_stage_with_manifest_files_missing(
    spark, tmp_path
):
    """The round-12 advice finding on unchecked renames: if after the
    move loop any manifest-listed file is absent at root (a failed
    rename, or a staged file that never materialized), the stage must
    survive for a retried finish — deleting it there would be permanent
    row loss inside the recovery protocol itself."""
    import os

    from data_pipeline_python_aws_cdk_spark.functions.indexing import (
        finish_staged_table_swap,
    )

    root = str(tmp_path / "tbl")
    old = spark.createDataFrame(
        [(i, i * 10) for i in range(8)], "vec_id long, pq_code long"
    )
    old.write.parquet(root)
    new = spark.createDataFrame(
        [(i, i * 7) for i in range(5)], "vec_id long, pq_code long"
    )
    # manifest claims one more staged file than exists — the move loop
    # cannot produce it, so the post-move verification must refuse
    _commit_stage(
        spark, root, new, extra_manifest_names=["part-lost-in-rename.parquet"]
    )
    with pytest.raises(IOError, match="stage left intact"):
        finish_staged_table_swap(spark, root)
    assert os.path.exists(f"{root}/_stage")
    # the files that DID move are at root: a retried finish (with the
    # missing file restored to the stage) completes idempotently
    with open(
        f"{root}/_stage/part-lost-in-rename.parquet", "wb"
    ) as fh:  # restore: any bytes — existence at root is the contract
        fh.write(b"x")
    assert finish_staged_table_swap(spark, root) is True
    assert not os.path.exists(f"{root}/_stage")


def test_staged_swap_partial_move_rerun_converges(spark, tmp_path):
    """Crash mid-move-loop: some staged files already renamed up, the
    rest still in the stage. The re-run must treat the already-moved as
    done (dest present) and finish the remainder to exactly the staged
    table."""
    import os
    import shutil as sh

    from data_pipeline_python_aws_cdk_spark.functions.indexing import (
        finish_staged_table_swap,
    )

    root = str(tmp_path / "tbl")
    old = spark.createDataFrame(
        [(i, i * 10) for i in range(8)], "vec_id long, pq_code long"
    )
    old.write.parquet(root)
    new = spark.createDataFrame(
        [(i, i * 7) for i in range(5)], "vec_id long, pq_code long"
    )
    _commit_stage(spark, root, new.repartition(3))
    # simulate: old files already deleted, ONE staged file already moved
    for n in os.listdir(root):
        if not n.startswith(("_", ".")) and os.path.isfile(f"{root}/{n}"):
            os.remove(f"{root}/{n}")
    staged = [
        n
        for n in os.listdir(f"{root}/_stage")
        if not n.startswith(("_", ".")) and os.path.isfile(f"{root}/_stage/{n}")
    ]
    sh.move(f"{root}/_stage/{staged[0]}", f"{root}/{staged[0]}")
    assert finish_staged_table_swap(spark, root) is True
    assert not os.path.exists(f"{root}/_stage")
    got = {tuple(r) for r in spark.read.parquet(root).collect()}
    assert got == {(i, i * 7) for i in range(5)}


def test_compact_converges_torn_leaf_rewrite(spark, tmp_path):
    """maintenance.compact's per-leaf rewrite rides the stage/commit/swap
    protocol (the round-12 advice finding: the old delete-before-move
    swap could lose a whole unpartitioned table under index_maintain).
    A COMMITTED stage a crashed compact left behind — even at the worst
    point, old files gone — is converged by the next compact run; an
    UNCOMMITTED one is discarded with the old fragments intact."""
    import os
    import shutil as sh

    from data_pipeline_python_aws_cdk_spark.maintenance import compact

    # worst-case torn state: stage committed, ALL old leaf files deleted
    root = str(tmp_path / "ds_committed")
    rows = spark.createDataFrame(
        [(i, f"v{i}") for i in range(64)], "id long, v string"
    )
    rows.repartition(8).write.parquet(root)
    _commit_stage(spark, root, rows.coalesce(1))
    for n in os.listdir(root):
        if not n.startswith(("_", ".")) and os.path.isfile(f"{root}/{n}"):
            os.remove(f"{root}/{n}")
    st = compact(spark, root, "parquet")
    assert not os.path.exists(f"{root}/_stage")
    assert _index_rows(spark, root) == sorted(
        (i, f"v{i}") for i in range(64)
    )
    assert st.partitions_seen == 1  # the stage-only dir still counted

    # uncommitted stage: garbage, discarded; fragments compact normally
    root2 = str(tmp_path / "ds_uncommitted")
    rows.repartition(8).write.parquet(root2)
    spark.createDataFrame([(99, "zzz")], "id long, v string").write.parquet(
        f"{root2}/_stage"
    )  # no manifest -> never committed
    compact(spark, root2, "parquet", target_file_bytes=10**9)
    assert not os.path.exists(f"{root2}/_stage")
    assert _index_rows(spark, root2) == sorted(
        (i, f"v{i}") for i in range(64)
    )
    sh.rmtree(root2)


def test_index_maintain_composition_is_read_only_until_fragmented(
    spark, tmp_path
):
    """index_maintain (the cron frame behind jobs index --maintain and the
    similarity_ann_ivfpq_maintained row): on a stable artifact it is
    read-only (no compact, marker untouched); on a fragmented one it
    compacts to zero fragmented leaves, preserves rows, and leaves the
    marker restored."""
    import os

    from data_pipeline_python_aws_cdk_spark.functions.indexing import (
        INDEX_COMPLETE_SIDECAR,
        index_maintain,
    )

    idx = str(tmp_path / "ivfpq_idx")
    similarity.ivfpq_build_index(spark, SF_SMOKE, idx)
    rows = _index_rows(spark, idx)
    marker_mtime = os.path.getmtime(os.path.join(idx, INDEX_COMPLETE_SIDECAR))

    st = index_maintain(spark, idx)
    assert st["compacted"] is None and st["fragmented_before"] == 0
    assert st["complete"] is True and st["total_rows"] == len(rows)
    assert (
        os.path.getmtime(os.path.join(idx, INDEX_COMPLETE_SIDECAR))
        == marker_mtime
    )  # read-only: no marker churn on the no-work path

    similarity._fragment_index(spark, idx)
    st = index_maintain(spark, idx)
    if st["fragmented_before"] > 0:  # toy leaves can coalesce to one file
        assert st["compacted"] is not None and st["fragmented_after"] == 0
    assert st["complete"] is True
    assert _index_rows(spark, idx) == rows


# --- round 13: fingerprint-tier maintain rows + the non-PQ stats twin ---------


def test_maintained_fingerprint_rows_equal_inline_results(spark):
    """The registered scheduled-maintenance rows for the fingerprint tier
    (dedup_winnowing_maintained / substring_spans_maintained): the
    build -> append -> fragment -> index_maintain -> probe composition
    must serve exactly the inline results — maintenance is invisible to
    consumers, which is the whole contract the driver row holds."""
    inline_w = {tuple(r) for r in dedup.dedup_winnowing(spark, SF_SMOKE).collect()}
    maint_w = {
        tuple(r)
        for r in dedup.dedup_winnowing_maintained(spark, SF_SMOKE).collect()
    }
    assert maint_w == inline_w
    inline_s = {
        tuple(r)
        for r in dedup.corpus_exact_substring_dedup(spark, SF_SMOKE).collect()
    }
    maint_s = {
        tuple(r)
        for r in dedup.substring_spans_maintained(spark, SF_SMOKE).collect()
    }
    assert maint_s == inline_s and len(maint_s) > 0


def test_ivf_index_stats_matches_oracle_and_detects_damage(spark, duck, tmp_path):
    """ivf_index_stats (the non-PQ twin of ivfpq_index_stats): the
    artifact-side rollup equals the full-corpus DuckDB recomputation at
    SF_SMOKE, and the floor-sum vector checksum is SENSITIVE — perturbing
    a single component of a single resident vector changes its list's
    checksum while every count/range column stays identical (the failure
    a membership-only report would miss)."""
    got = sorted(
        tuple(r)
        for r in similarity.QUERIES["ivf_index_stats"](spark, SF_SMOKE).collect()
    )
    exp = sorted(tuple(r) for r in duck.execute(
        similarity.ORACLES["ivf_index_stats"]
    ).fetchall())
    assert got == exp and len(got) > 0
    assert sum(r[1] for r in got) == spark.read.parquet(
        f"{SF_SMOKE}/embeddings.parquet"
    ).count()

    # checksum sensitivity: same aggregation over an artifact whose one
    # resident vector drifted 0.37 on one component
    idx = str(tmp_path / "ivf_idx")
    similarity.ivf_build_index(spark, SF_SMOKE, idx)
    vchk = F.aggregate(
        F.col("embedding"),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc
        + F.floor(F.abs(x.cast("double")) * F.lit(10000.0)).cast("bigint"),
    )

    def stats(df):
        return {
            r.centroid_id: tuple(r)[1:]
            for r in df.groupBy("centroid_id")
            .agg(
                F.count("*").alias("n"),
                F.min("vec_id").alias("mn"),
                F.max("vec_id").alias("mx"),
                F.sum(vchk).alias("chk"),
            )
            .collect()
        }

    clean = spark.read.parquet(idx)
    damaged = clean.withColumn(
        "embedding",
        F.when(
            F.col("vec_id") == 100,
            F.concat(
                F.array(
                    F.element_at("embedding", 1).cast("double") + F.lit(0.37)
                ),
                F.slice("embedding", 2, similarity.DIM - 1).cast(
                    "array<double>"
                ),
            ).cast("array<float>"),
        ).otherwise(F.col("embedding")),
    )
    s_clean, s_damaged = stats(clean), stats(damaged)
    diff = {c for c in s_clean if s_clean[c] != s_damaged[c]}
    assert len(diff) == 1  # exactly the damaged vector's list moved
    c = diff.pop()
    assert s_clean[c][:3] == s_damaged[c][:3]  # counts/ranges blind to it
    assert s_clean[c][3] != s_damaged[c][3]  # the checksum is not


# --- round 12: the refined-codebook contract in its intended regime -----------


def _planted_clustered_corpus(spark, tmp_path):
    """16 tight Gaussian blobs at orthogonal directions (the
    embedding_kmeans blob-recovery construction, widened to the ANN
    fixture's 64 dims), laid out so the SEED codebook is maximally
    unrepresentative: the 16 seed-centroid ids (0..15, which include the
    8 query ids) all come from blobs 0 and 1, so blob 0's points — every
    query's true neighbors — scatter across eight noise-ordered lists,
    while k-means recovers one centroid per blob. This is the corpus
    shape ivf_train_centroids exists for."""
    import numpy as np

    rng = np.random.default_rng(12)
    nblob, per = 16, 24
    centers = np.zeros((nblob, 64))
    for b in range(nblob):
        centers[b, 4 * b] = 10.0
    slots = [0] * 8 + [1] * 8 + [0] * 16 + [1] * 16
    for b in range(2, nblob):
        slots += [b] * per
    rows = [
        (vid, [float(x) for x in centers[b] + rng.normal(0, 0.05, 64)])
        for vid, b in enumerate(slots)
    ]
    sf = str(tmp_path / "clustered")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).write.parquet(f"{sf}/embeddings.parquet")
    return sf


def test_refined_codebook_wins_on_clustered_corpus(spark, tmp_path):
    """The other half of the seed-vs-trained deployment decision, the
    measurement that justifies the pluggable-codebook machinery: on a
    corpus with real cluster structure the k-means-refined codebooks
    must BEAT the seed codebooks at fixed nprobe — perfect recall from
    one-list-per-blob Voronoi cells, where the seed lists split every
    blob across noise-ordered partitions. Together with
    test_refined_codebook_scoreboard_pins_seed_vs_trained_decision
    (seed wins on the near-uniform corpus) this pins BOTH rows of the
    deploy guidance: seed on uniform, trained on clustered."""
    sf = _planted_clustered_corpus(spark, tmp_path)
    seed = {
        r.method: r
        for r in similarity.similarity_ann_recall_report(spark, sf).collect()
    }
    refined = {
        r.method: r
        for r in similarity.similarity_ann_recall_refined(spark, sf).collect()
    }
    assert set(refined) == {"ann_ivf_refined", "ann_ivfpq_res_refined"}
    assert all(r.queries == similarity.N_QUERIES for r in refined.values())

    # the deployment decision, clustered regime: trained beats seed
    assert refined["ann_ivf_refined"].recall_at_10 == 1.0
    assert refined["ann_ivfpq_res_refined"].recall_at_10 == 1.0
    assert seed["ann_ivf"].recall_at_10 < 1.0
    assert (
        seed["ann_ivfpq_res"].recall_at_10
        < refined["ann_ivfpq_res_refined"].recall_at_10
    )
    # seed rows are deterministic (no k-means involved): exact regression
    # pins for the planted layout
    assert seed["ann_ivf"].recall_at_10 == 0.8375
    assert seed["ann_ivfpq_res"].recall_at_10 == 0.625


# --- round 14: torn-lifecycle convergence (the round-13 advice findings) -------


def test_index_report_stage_only_artifact_reports_instead_of_crashing(
    spark, tmp_path
):
    """A committed ``_stage`` can be the artifact's ONLY copy (crash right
    after the stage commit, before any file moved up): the freshness report
    must describe that state — complete False, zero visible files/rows —
    not die in its row-count scan on the empty visible file set."""
    from data_pipeline_python_aws_cdk_spark.functions.indexing import (
        index_report,
        pending_committed_stage,
    )

    root = str(tmp_path / "tbl")
    rows = spark.createDataFrame(
        [(i, i * 7) for i in range(6)], "vec_id long, pq_code long"
    )
    (tmp_path / "tbl").mkdir()
    _commit_stage(spark, root, rows)
    rep = index_report(spark, root)
    assert rep["complete"] is False
    assert rep["total_files"] == 0 and rep["total_rows"] == 0
    assert rep["n_partitions"] == 1  # the stage-only leaf is still visible
    assert pending_committed_stage(spark, root) is True


def test_index_maintain_converges_torn_staged_swap(spark, tmp_path):
    """The cron frame must CONVERGE a torn staged swap, not skip it (leaf
    shows 0 visible files -> not 'fragmented') or crash on the cleared
    marker (resume=False assert): with a committed stage pending and the
    marker gone, index_maintain runs the compact with resume, the per-leaf
    finish_staged_table_swap folds the stage in, and the artifact comes
    back complete with exactly the staged rows."""
    import os

    from data_pipeline_python_aws_cdk_spark.functions.indexing import (
        clear_index_complete,
        index_maintain,
        index_report,
    )

    idx = str(tmp_path / "pq_like")
    old = spark.createDataFrame(
        [(i, i * 10) for i in range(8)], "vec_id long, pq_code long"
    )
    old.repartition(2).write.parquet(idx)
    spark.createDataFrame([(True,)], "complete boolean").coalesce(
        1
    ).write.parquet(f"{idx}/_complete")

    # worst-case tear: stage committed, marker cleared, ALL visible files
    # already deleted — the stage is the sole copy
    new = spark.createDataFrame(
        [(i, i * 7) for i in range(5)], "vec_id long, pq_code long"
    )
    _commit_stage(spark, idx, new)
    clear_index_complete(spark, idx)
    for n in os.listdir(idx):
        if not n.startswith(("_", ".")) and os.path.isfile(f"{idx}/{n}"):
            os.remove(f"{idx}/{n}")

    st = index_maintain(spark, idx)
    assert st["compacted"] is not None  # the converging compact RAN
    assert st["complete"] is True
    assert not os.path.exists(f"{idx}/_stage")
    # _index_rows sorts columns alphabetically: (pq_code, vec_id)
    assert _index_rows(spark, idx) == sorted((i * 7, i) for i in range(5))
    after = index_report(spark, idx)
    assert after["total_rows"] == 5 and after["complete"] is True

    # an incomplete artifact WITHOUT a pending stage (torn build) is left
    # alone: no compact, complete stays False — only a rebuild repairs it
    clear_index_complete(spark, idx)
    st2 = index_maintain(spark, idx)
    assert st2["compacted"] is None and st2["complete"] is False


def test_rebuild_and_compact_clear_stale_append_breadcrumb(
    spark, tmp_path, monkeypatch
):
    """A _torn_by_append breadcrumb may only ever describe an IN-FLIGHT
    append. If the repairing rebuild (or a compact) itself crashes, the
    artifact can be missing whole lists — the streaming screen's
    assert_index_screenable must reject it rather than accept the stale
    breadcrumb of the older append."""
    from data_pipeline_python_aws_cdk_spark.functions.indexing import (
        assert_index_screenable,
        index_compact,
        mark_torn_by_append,
        torn_by_append,
    )

    idx = str(tmp_path / "ivf_idx")
    similarity.ivf_build_index(spark, SF_SMOKE, idx)

    # simulate: an append tore (breadcrumb present, marker gone), then the
    # repairing REBUILD crashes mid-assignment
    mark_torn_by_append(spark, idx)
    def _boom(*a, **k):
        raise RuntimeError("simulated crash mid-build")
    monkeypatch.setattr(similarity, "_assign_nearest_centroid", _boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        similarity.ivf_build_index(spark, SF_SMOKE, idx)
    monkeypatch.undo()
    assert torn_by_append(spark, idx) is False  # breadcrumb cleared FIRST
    with pytest.raises(ValueError, match="torn by a build or compact"):
        assert_index_screenable(spark, idx)

    # same discipline on the compact path: breadcrumb dropped before the
    # rewrite, so a crash mid-compact leaves an unscreenable artifact
    similarity.ivf_build_index(spark, SF_SMOKE, idx)
    mark_torn_by_append(spark, idx)
    import data_pipeline_python_aws_cdk_spark.maintenance as maint
    monkeypatch.setattr(maint, "compact", _boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        index_compact(spark, idx, resume=True)
    monkeypatch.undo()
    assert torn_by_append(spark, idx) is False
    with pytest.raises(ValueError, match="torn by a build or compact"):
        assert_index_screenable(spark, idx)


# --- round 15: stale-stage discipline at build start (the round-14 advice) ----


def test_build_discards_stale_stage_so_maintain_cannot_converge_torn_build(
    spark, tmp_path, monkeypatch
):
    """A committed ``_stage`` left by an OLDER torn compact must not survive
    into a later torn BUILD: index_maintain attributes "incomplete + any
    committed stage" to a torn swap and would otherwise fold the
    pre-rebuild stage in and mark_index_complete an artifact missing whole
    lists — which probes then silently accept. Builds discard stale leaf
    stages at start (the clear_torn_by_append discipline), so a pending
    committed stage is always attributable to the CURRENT artifact
    generation."""
    import os

    from data_pipeline_python_aws_cdk_spark.functions.indexing import (
        index_maintain,
        pending_committed_stage,
    )

    idx = str(tmp_path / "ivf_idx")
    similarity.ivf_build_index(spark, SF_SMOKE, idx)

    # an older compact tore mid-swap: one leaf holds a committed stage
    leaf = next(
        f"{idx}/{n}" for n in sorted(os.listdir(idx))
        if n.startswith("centroid_id=")
    )
    stale = spark.createDataFrame(
        [(99991, [0.0] * 64)], "vec_id long, embedding array<float>"
    )
    _commit_stage(spark, leaf, stale)
    assert pending_committed_stage(spark, idx) is True

    # the repairing REBUILD crashes mid-assignment (a torn build)
    def _boom(*a, **k):
        raise RuntimeError("simulated crash mid-build")

    monkeypatch.setattr(similarity, "_assign_nearest_centroid", _boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        similarity.ivf_build_index(spark, SF_SMOKE, idx)
    monkeypatch.undo()

    # the stale stage was discarded at build start, so scheduled
    # maintenance must NOT converge it: the torn build stays incomplete
    # (only a rebuild repairs it) and the planted row can never surface
    assert pending_committed_stage(spark, idx) is False
    st = index_maintain(spark, idx)
    assert st["compacted"] is None and st["complete"] is False
    assert 99991 not in {
        r.vec_id for r in spark.read.parquet(idx).select("vec_id").collect()
    }

    # a clean rebuild over the same dir still converges to a whole artifact
    similarity.ivf_build_index(spark, SF_SMOKE, idx)
    rep = index_maintain(spark, idx)
    assert rep["complete"] is True
