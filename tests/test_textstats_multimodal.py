"""Text-analysis + multimodal plumbing tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from embed_rerank_spark.operators import multimodal, textstats


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (0, "the cat and the dog of a house is in the garden"),
            (1, "der hund und die katze ist nicht das problem"),
            (2, "el perro es de la casa que los gatos"),
            (3, "xxxxx yyyyy zzzzz qqqqq wwwww"),
            (4, "Numbers 123 and punct!!! ... ??? mixed, content; here."),
        ],
        "doc_id long, text string",
    )


def test_token_counts(spark, docs):
    out = {r.doc_id: r.n for r in docs.select("doc_id", textstats.token_count(F.col("text")).alias("n")).collect()}
    assert out[0] == 12 and out[3] == 5
    est = docs.select(textstats.token_estimate(F.col("text")).alias("e")).collect()
    assert all(r.e >= 0 for r in est)
    bpe = {r.doc_id: r.n for r in docs.select("doc_id", textstats.bpe_ish_token_count(F.col("text")).alias("n")).collect()}
    assert bpe[4] > out[4]  # punctuation splits add fragments beyond whitespace count


def test_lang_id(spark, docs):
    out = {r.doc_id: r.lang for r in docs.select("doc_id", textstats.lang_id(F.col("text")).alias("lang")).collect()}
    assert out[0] == "en"
    assert out[1] == "de"
    assert out[2] == "es"
    assert out[3] == "und"


def test_quality(spark, docs):
    q = {r.doc_id: r.quality for r in textstats.quality_score(docs).collect()}
    assert all(0.0 <= v <= 1.0 for v in q.values())
    # short gibberish doc scores below the clean english doc
    assert q[3] < q[0] or q[3] == pytest.approx(q[0])
    feats = textstats.quality_features(docs).collect()
    row4 = next(r for r in feats if r.doc_id == 4)
    assert row4.punct_ratio > 0 and row4.digit_ratio > 0


def test_fingerprints(spark, docs):
    fp = textstats.fingerprint(docs).collect()
    assert len({r.fp for r in fp}) == len(fp)  # all distinct texts
    dup = spark.createDataFrame(
        [(0, "THE cat and the dog   of a house is in the garden")],
        "doc_id long, text string",
    )
    fp0 = textstats.fingerprint(docs.filter(F.col("doc_id") == 0)).first().fp
    assert textstats.fingerprint(dup).first().fp == fp0  # normalization


def test_rolling_fingerprints(spark):
    text = " ".join(f"t{i}" for i in range(100))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = textstats.rolling_fingerprints(docs, window_tokens=32, stride=16).collect()
    assert len(out) == 5  # (100-32)/16+1
    assert len({r.fp for r in out}) == 5


# ---------------- multimodal ----------------


@pytest.fixture(scope="module")
def media(spark):
    return multimodal.generate_fake_media(spark, 30).cache()


def test_media_metadata_jvm_only(spark, media):
    m = multimodal.media_metadata(media).collect()
    assert len(m) == 30
    assert all(r.n_bytes > 0 and len(r.content_md5) == 32 for r in m)
    kinds = {r.kind for r in m}
    assert kinds == {"image", "audio", "video"}


def test_feature_extraction_deterministic(spark, media):
    a = {r.media_id: tuple(r.features) for r in multimodal.extract_features(media).collect()}
    b = {r.media_id: tuple(r.features) for r in multimodal.extract_features(media).collect()}
    assert a == b
    assert all(len(v) == multimodal.FEATURE_DIM for v in a.values())
    # content-keyed: same bytes -> same features
    import numpy as np

    p = media.filter(F.col("media_id") == 0).first().payload
    expect = multimodal.deterministic_fake_features(bytes(p))
    np.testing.assert_allclose(np.array(a[0]), expect, rtol=1e-6)


def test_png_roundtrip_all_channel_counts():
    import numpy as np

    rng = np.random.default_rng(7)
    for c in (1, 2, 3, 4):
        px = rng.integers(0, 256, size=(9, 5, c), dtype=np.uint8)
        got = multimodal.decode_image(multimodal.png_encode(px))
        np.testing.assert_array_equal(got, px)
    # 2-D grayscale input round-trips as (h, w, 1)
    g = rng.integers(0, 256, size=(4, 6), dtype=np.uint8)
    np.testing.assert_array_equal(
        multimodal.decode_image(multimodal.png_encode(g)), g[:, :, None]
    )


def test_png_decode_all_filter_types():
    """Hand-build an IDAT stream using every scanline filter type
    (None/Sub/Up/Average/Paeth) and check reconstruction against a
    straightforward per-pixel reference."""
    import struct as _struct
    import zlib as _zlib

    import numpy as np

    rng = np.random.default_rng(11)
    w, h, c = 7, 5, 3
    px = rng.integers(0, 256, size=(h, w, c), dtype=np.int64)
    flat = px.reshape(h, w * c)
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int64)
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        line = flat[y]
        enc = np.zeros(w * c, dtype=np.int64)
        for x in range(w * c):
            a = line[x - c] if x >= c else 0
            b = prev[x]
            cc = prev[x - c] if x >= c else 0
            pred = {
                0: 0,
                1: a,
                2: b,
                3: (a + b) >> 1,
                4: multimodal._paeth(int(a), int(b), int(cc)),
            }[ftype]
            enc[x] = (line[x] - pred) & 0xFF
        raw.append(ftype)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = line
    ihdr = _struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    payload = (
        multimodal._PNG_SIG
        + multimodal._png_chunk(b"IHDR", ihdr)
        + multimodal._png_chunk(b"IDAT", _zlib.compress(bytes(raw)))
        + multimodal._png_chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(
        multimodal.decode_image(payload), px.astype(np.uint8)
    )


def test_png_paletted_decode():
    import struct as _struct
    import zlib as _zlib

    import numpy as np

    palette = np.array([[250, 1, 2], [3, 240, 5], [6, 7, 230]], dtype=np.uint8)
    idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    ihdr = _struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0)
    payload = (
        multimodal._PNG_SIG
        + multimodal._png_chunk(b"IHDR", ihdr)
        + multimodal._png_chunk(b"PLTE", palette.tobytes())
        + multimodal._png_chunk(b"IDAT", _zlib.compress(raw))
        + multimodal._png_chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(multimodal.decode_image(payload), palette[idx])


def test_image_dimensions_png_jpeg_gif():
    import struct as _struct

    import numpy as np

    png = multimodal.png_encode(np.zeros((12, 34, 3), dtype=np.uint8))
    assert multimodal.image_dimensions(png) == ("png", 34, 12)
    # minimal JPEG: SOI, APP0 stub, DQT stub, SOF0 with dims, EOI
    sof = b"\xff\xc0" + _struct.pack(">HBHHB", 11, 8, 480, 640, 1) + b"\x01\x11\x00"
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + _struct.pack(">H", 4) + b"JF"
        + b"\xff\xdb" + _struct.pack(">H", 4) + b"\x00\x00"
        + sof
        + b"\xff\xd9"
    )
    assert multimodal.image_dimensions(jpeg) == ("jpeg", 640, 480)
    gif = b"GIF89a" + _struct.pack("<HH", 320, 200) + b"\x00\x00\x00"
    assert multimodal.image_dimensions(gif) == ("gif", 320, 200)
    with pytest.raises(ValueError):
        multimodal.image_dimensions(b"not an image at all")


def test_wav_roundtrip_and_info():
    import numpy as np

    rng = np.random.default_rng(3)
    mono = rng.uniform(-0.9, 0.9, size=400).astype(np.float32)
    payload = multimodal.wav_encode(mono, sample_rate=8000)
    assert multimodal.wav_info(payload) == (8000, 1, 400, 50)
    got = multimodal.decode_audio(payload)
    assert got.shape == (400, 1)
    # quantization: encode scales by 32767, decode by 1/32768, plus
    # rounding — worst case ~1.5 LSB
    np.testing.assert_allclose(got[:, 0], mono, atol=1.5 / 32768)
    # stereo int16 input
    stereo = rng.integers(-30000, 30000, size=(100, 2)).astype(np.int16)
    got2 = multimodal.decode_audio(multimodal.wav_encode(stereo, 16000))
    assert got2.shape == (100, 2)
    np.testing.assert_allclose(got2, stereo.astype(np.float32) / 32768.0, atol=1e-6)
    with pytest.raises(ValueError):
        multimodal.decode_audio(b"RIFFxxxxNOPE")
    with pytest.raises(ValueError):
        multimodal.decode_image(payload)  # wav is not an image
    # fmt chunk shorter than 16 bytes: documented ValueError, never a
    # leaked struct.error (direct callers rely on the exception type)
    truncated = b"RIFF" + b"\x24\x00\x00\x00" + b"WAVE" + b"fmt " + b"\x08\x00\x00\x00" + b"\x01\x00\x01\x00"
    with pytest.raises(ValueError):
        multimodal.decode_audio(truncated)
    with pytest.raises(ValueError):
        multimodal.wav_info(truncated)


def test_parse_media_headers_matches_declared(spark, media):
    got = {r.media_id: r for r in multimodal.parse_media_headers(media).collect()}
    declared = {r.media_id: r for r in media.collect()}
    assert set(got) == set(declared)
    for mid, r in got.items():
        d = declared[mid]
        if d.kind == "image":
            assert r.header_ok and r.fmt == "png"
            assert (r.parsed_width, r.parsed_height) == (d.width, d.height)
        elif d.kind == "audio":
            assert r.header_ok and r.fmt == "wav"
            assert r.parsed_duration_ms == d.duration_ms
        else:  # opaque video fakes: quarantine path
            assert not r.header_ok and r.fmt is None


def test_frame_sampling_plan(spark, media):
    frames = multimodal.sample_frames(media, every_ms=1000, max_frames=16).collect()
    assert frames
    by_media = {}
    for r in frames:
        by_media.setdefault(r.media_id, []).append(r)
    for rows in by_media.values():
        idxs = sorted(r.frame_idx for r in rows)
        assert idxs == list(range(len(idxs)))
        assert len(idxs) <= 16
        assert all(r.ts_ms == r.frame_idx * 1000 for r in rows)


def test_cooccurrence_pmi_caps_and_values(spark):
    """PMI operator: df cap bounds the pair space on a skewed corpus,
    and values match a hand computation."""
    import math

    from embed_rerank_spark.operators.textstats import cooccurrence_pmi

    rows = [(i, "hot " + ("alpha beta " if i % 2 == 0 else "gamma ")) for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # no cap: 'hot' (df=40) pairs with everything
    out = {
        (r["term_a"], r["term_b"]): (r["pair_count"], round(r["pmi"], 6))
        for r in cooccurrence_pmi(docs, min_pair_count=1).collect()
    }
    assert ("alpha", "hot") in out and out[("alpha", "beta")][0] == 20
    # pmi(alpha, beta) = ln(20*40/(20*20)) = ln(2)
    assert out[("alpha", "beta")][1] == round(math.log(2.0), 6)
    # df cap 25 drops 'hot' from the pair space entirely
    capped = {
        (r["term_a"], r["term_b"])
        for r in cooccurrence_pmi(docs, min_pair_count=1, max_term_df=25).collect()
    }
    assert capped == {("alpha", "beta")}


def test_unigram_cross_entropy_matches_numpy(spark):
    """ce == -(1/dl) * sum tf*ln(cf/C) against a hand NumPy reference;
    common-token docs score LOWER than rare-token docs."""
    import math
    from collections import Counter

    from embed_rerank_spark.operators.textstats import unigram_cross_entropy

    rows = [
        (1, "the the the cat"),
        (2, "the cat sat"),
        (3, "zyx qwv jkl"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    toks = {i: t.split() for i, t in rows}
    cf = Counter(w for ws in toks.values() for w in ws)
    c = sum(cf.values())
    expected = {
        i: round(-sum(math.log(cf[w] / c) for w in ws) / len(ws), 6)
        for i, ws in toks.items()
    }
    out = {r["doc_id"]: r for r in unigram_cross_entropy(docs).collect()}
    for i, ws in toks.items():
        assert out[i]["dl"] == len(ws)
        assert abs(out[i]["ce"] - expected[i]) < 1e-6
    assert out[1]["ce"] < out[3]["ce"]  # boilerplate scores lower than rare soup


def test_domain_stats_hand_built(spark):
    """Per-source counts, token sums, dup detection, and mean quality
    against hand-computed values."""
    from embed_rerank_spark.operators.textstats import domain_stats, quality_score

    rows = [
        (1, "a.com", "one two three four five six seven eight nine ten eleven"),
        (2, "a.com", "one two three four five six seven eight nine ten eleven"),
        (3, "a.com", "different text entirely here now ok more words padding x"),
        (4, "b.org", "short doc"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["source"]: r for r in domain_stats(docs).collect()}
    assert out["a.com"]["n_docs"] == 3
    assert out["a.com"]["total_tokens"] == 11 + 11 + 10
    assert out["a.com"]["dup_docs"] == 1  # docs 1 and 2 share normalized text
    assert out["b.org"]["n_docs"] == 1
    assert out["b.org"]["total_tokens"] == 2
    assert out["b.org"]["dup_docs"] == 0
    q = {r["doc_id"]: r["quality"] for r in quality_score(docs).collect()}
    assert abs(out["a.com"]["mean_quality"] - round((q[1] + q[2] + q[3]) / 3, 6)) < 1e-6


def test_png_wav_fuzz_roundtrip_and_malformed():
    """Hypothesis fuzz: arbitrary small images/waveforms round-trip
    exactly; mangled payloads raise ValueError (never crash)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(1, 12),
        h=st.integers(1, 12),
        c=st.sampled_from([1, 2, 3, 4]),
        seed=st.integers(0, 2**31 - 1),
    )
    def png_case(w, h, c, seed):
        px = np.random.default_rng(seed).integers(0, 256, size=(h, w, c), dtype=np.uint8)
        payload = multimodal.png_encode(px)
        np.testing.assert_array_equal(multimodal.decode_image(payload), px)
        assert multimodal.image_dimensions(payload) == ("png", w, h)
        # truncation anywhere after the signature must raise, not crash
        cut = len(payload) // 2
        try:
            multimodal.decode_image(payload[:cut])
        except ValueError:
            pass
        except Exception as ex:  # zlib/struct leakage would be a bug
            raise AssertionError(f"non-ValueError on truncated PNG: {ex!r}") from ex

    @settings(max_examples=25, deadline=None)
    @given(
        n=st.integers(1, 500),
        ch=st.sampled_from([1, 2]),
        rate=st.sampled_from([8000, 16000, 44100]),
        seed=st.integers(0, 2**31 - 1),
    )
    def wav_case(n, ch, rate, seed):
        rng = np.random.default_rng(seed)
        samples = rng.integers(-32768, 32767, size=(n, ch)).astype(np.int16)
        payload = multimodal.wav_encode(samples, rate)
        got = multimodal.decode_audio(payload)
        assert got.shape == (n, ch)
        np.testing.assert_allclose(got, samples / 32768.0, atol=1e-6)
        sr, nch, ns, _dur = multimodal.wav_info(payload)
        assert (sr, nch, ns) == (rate, ch, n)

    png_case()
    wav_case()
