"""Unit tests for perceptual-hash image near-dup and the learned
quality classifier (the round-8 curation additions), plus the
substring-excise ledger compaction seam."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from gcp_etl_pipeline_spark.operators import codecs, curation, dedup, multimodal


def _png_df(spark, pixel_fn, n, w=18, h=16):
    rows = []
    for i in range(n):
        px = bytes(pixel_fn(i, p) for p in range(w * h))
        rows.append((i, codecs.encode_png(w, h, px)))
    return spark.createDataFrame(rows, "media_id BIGINT, content BINARY")


def test_dhash_brightness_invariant(spark):
    # +24 everywhere preserves every gradient comparison -> same hash
    def px(i, p):
        base = (p * 37 + 11) % 200 + 8
        return base + (24 if i == 1 else 0)

    out = {
        r["media_id"]: r["dhash"]
        for r in multimodal.image_dhash(_png_df(spark, px, 2)).collect()
    }
    assert out[0] == out[1]


def test_dhash_single_pixel_bump_hamming_le_1(spark):
    def px(i, p):
        base = (p * 37 + 11) % 200 + 8
        return base + (40 if i == 1 and p == 0 else 0)

    df = multimodal.image_dhash(_png_df(spark, px, 2))
    pairs = multimodal.phash_neardup_pairs(df, max_hamming=6).collect()
    assert len(pairs) == 1
    assert pairs[0]["hamming"] <= 1


def test_dhash_drops_corrupt_and_tiny(spark):
    good = codecs.encode_png(18, 16, bytes(range(200)) + bytes(88))
    tiny = codecs.encode_png(4, 4, bytes(16))
    df = spark.createDataFrame(
        [(0, good), (1, b"not a png"), (2, tiny)],
        "media_id BIGINT, content BINARY",
    )
    out = multimodal.image_dhash(df).collect()
    assert [r["media_id"] for r in out] == [0]


def test_phash_bands_decompose_hash(spark):
    def px(i, p):
        return ((i * 131 + p * 37 + 11) % 200) + 8

    for r in multimodal.image_dhash(_png_df(spark, px, 4)).collect():
        u = r["dhash"] + (1 << 64) if r["dhash"] < 0 else r["dhash"]
        rebuilt = sum(r[f"band{k}"] << (16 * k) for k in range(4))
        assert rebuilt == u


def test_quality_classifier_separates_vocabularies(spark):
    # positives say "good stuff", negatives say "junk noise"; a holdout
    # doc of each vocabulary must land on the right side of the gate
    rows = [(i, "good stuff here", "en") for i in range(10)]
    rows += [(i + 10, "junk noise words", "xx") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING, lang STRING")
    w = curation.fit_quality_classifier(docs, "lang = 'en'")
    scored = curation.quality_classifier_score(docs, w)
    by_id = {r["doc_id"]: r for r in scored.collect()}
    assert by_id[0]["keep"] and by_id[0]["prob_u"] > 500_000
    assert not by_id[10]["keep"] and by_id[10]["prob_u"] < 500_000


def test_quality_classifier_zero_token_row(spark):
    docs = spark.createDataFrame(
        [(1, "real text", "en"), (2, "...", "en")],
        "doc_id BIGINT, text STRING, lang STRING",
    )
    w = curation.fit_quality_classifier(docs, "lang = 'en'")
    out = {r["doc_id"]: r for r in curation.quality_classifier_score(docs, w).collect()}
    assert out[2]["n_tokens"] == 0
    assert out[2]["prob_u"] == 500_000
    assert not out[2]["keep"]


def test_quality_classifier_weights_bounded_and_broadcastable(spark):
    docs = spark.createDataFrame(
        [(i, f"tok{i} shared word", "en" if i % 2 == 0 else "xx")
         for i in range(20)],
        "doc_id BIGINT, text STRING, lang STRING",
    )
    w = curation.fit_quality_classifier(docs, "lang = 'en'")
    rows = w.collect()
    assert 0 < len(rows) <= 64
    assert all(-1_000_000 <= r["w_u"] <= 1_000_000 for r in rows)


def test_excise_compaction_preserves_ledger_semantics(spark):
    # increment 1 ledgers chunk fps; compaction rewrites the attempt
    # tree; increment 2 must excise exactly what it would have without
    # the compaction (replaying the same text)
    docs1 = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id BIGINT, text STRING",
    )
    docs2 = spark.createDataFrame(
        [(2, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id BIGINT, text STRING",
    )
    for compact in (False, True):
        store = tempfile.mkdtemp(prefix="graft_exc_t_") + "/fps"
        dedup.substring_excise_incremental(docs1, store, attempt_id="i1").collect()
        if compact:
            before, after = dedup.compact_ledger(spark, store)
            assert after <= before
        out = dedup.substring_excise_incremental(
            docs2, store, attempt_id="i2"
        ).collect()
        assert len(out) == 1
        r = out[0]
        # identical text replayed -> every chunk already ledgered
        assert r["excised_chunks"] == r["n_chunks"]
        assert r["clean_text"] == ""
        assert r["n_chunks"] > 0  # non-vacuous: chunks actually existed


def test_audio_fingerprint_dc_offset_invariant(spark):
    def clip(off):
        smp = bytes(((t * 13 + 29) % 180) + 10 + off for t in range(140))
        return codecs.encode_wav(16000, smp)

    df = spark.createDataFrame(
        [(0, clip(0)), (1, clip(7))], "media_id BIGINT, content BINARY"
    )
    out = {r["media_id"]: r["dhash"]
           for r in multimodal.audio_fingerprint(df).collect()}
    assert out[0] == out[1]


def test_audio_fingerprint_drops_short_and_corrupt(spark):
    ok = codecs.encode_wav(8000, bytes(range(132)))
    short = codecs.encode_wav(8000, bytes(range(50)))
    df = spark.createDataFrame(
        [(0, ok), (1, short), (2, b"junk")],
        "media_id BIGINT, content BINARY",
    )
    out = multimodal.audio_fingerprint(df).collect()
    assert [r["media_id"] for r in out] == [0]


def test_intradoc_chunk_dedup_removes_planted_stutter(spark):
    # 'gamma' and 'edge' are CDC boundary tokens (md5 starts '0'); the
    # trailing boundary makes both copies of the doubled text decompose
    # into the SAME two chunks -> exactly those two repeats removed
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa edge"
    docs = spark.createDataFrame(
        [(1, base + " " + base), (2, base)],
        "doc_id BIGINT, text STRING",
    )
    out = {r["doc_id"]: r
           for r in dedup.intradoc_chunk_dedup(docs).collect()}
    # the unique doc is untouched
    assert out[2]["removed_chunks"] == 0
    assert out[2]["kept_tokens"] == 11
    # the doubled doc collapses back to one copy
    assert out[1]["n_chunks"] == 4
    assert out[1]["removed_chunks"] == 2
    assert out[1]["kept_tokens"] == 11
    assert out[1]["clean_text"] == base


def test_intradoc_chunk_dedup_idempotent(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(1, base + " " + base)], "doc_id BIGINT, text STRING"
    )
    once = dedup.intradoc_chunk_dedup(docs).collect()[0]
    again = dedup.intradoc_chunk_dedup(
        spark.createDataFrame(
            [(1, once["clean_text"])], "doc_id BIGINT, text STRING"
        )
    ).collect()[0]
    assert again["removed_chunks"] == 0
    assert again["clean_text"] == once["clean_text"]


def test_clip_audio_slices_frames_and_passes_non_audio(spark):
    sr = 8000
    smp = bytes(t % 200 for t in range(300))
    wav = codecs.encode_wav(sr, smp)
    png = codecs.encode_png(4, 4, bytes(16))
    df = spark.createDataFrame(
        [(0, wav), (1, png), (2, b"junk")],
        "media_id BIGINT, content BINARY",
    )
    out = {r["media_id"]: bytes(r["content"])
           for r in multimodal.clip_audio(df, 3, 7).collect()}
    lo, hi = 3 * sr // 1000, min(300, 10 * sr // 1000)
    _, clipped = codecs.wav_samples(out[0])
    assert clipped == smp[lo:hi]
    assert out[1] == png       # image passthrough
    assert out[2] == b"junk"   # corrupt passthrough
