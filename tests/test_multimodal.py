"""Multimodal plumbing: schema contract, batch shape, determinism."""

from __future__ import annotations

import pytest

from appeals_data_spark.catalog import load_table
from appeals_data_spark.operators.multimodal import (
    as_media,
    decode_media,
    extract_features,
    resize_media,
    sample_frames,
)

from conftest import SF_SMOKE


def test_media_schema(spark):
    media = as_media(load_table(spark, SF_SMOKE, "documents"))
    dtypes = dict(media.dtypes)
    assert dtypes["blob"] == "binary"
    assert dtypes["meta"] == "struct<mime:string,width:int,height:int,n_frames:int>"
    row = media.first()
    assert isinstance(row["blob"], (bytes, bytearray))
    assert 32 <= row["meta"]["width"] < 640 + 32


def test_feature_extraction_deterministic(spark):
    media = as_media(load_table(spark, SF_SMOKE, "documents"))
    feats = extract_features(media)
    assert dict(feats.dtypes)["feat"] == "array<float>"
    a = sorted(feats.collect(), key=lambda r: r["doc_id"])
    b = sorted(extract_features(media.repartition(7)).collect(), key=lambda r: r["doc_id"])
    assert [r["digest"] for r in a] == [r["digest"] for r in b]
    assert [r["feat"] for r in a] == [r["feat"] for r in b]
    # features are a pure function of bytes
    r = a[0]
    assert r["feat"][0] == float(r["n_bytes"])


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_media(b"\x00", "image/png")


def test_resize_caps_longer_side(spark):
    media = as_media(load_table(spark, SF_SMOKE, "documents"))
    out = resize_media(media, max_dim=256)
    rows = out.collect()
    assert len(rows) == media.count()
    orig = {r["doc_id"]: (r["meta"]["width"], r["meta"]["height"]) for r in media.collect()}
    for r in rows:
        w, h = r["new_width"], r["new_height"]
        ow, oh = orig[r["doc_id"]]
        assert max(w, h) <= 256
        # never upscale; aspect handling truncates, so small dims shrink
        assert w <= ow and h <= oh
        assert isinstance(r["blob"], (bytes, bytearray))


def test_frame_sampling_fanout(spark):
    media = as_media(load_table(spark, SF_SMOKE, "documents"))
    frames = sample_frames(media, every_k=4)
    per_doc = {
        r["doc_id"]: r["n"]
        for r in frames.groupBy("doc_id").count().withColumnRenamed("count", "n").collect()
    }
    meta = {r["doc_id"]: r["meta"]["n_frames"] for r in media.collect()}
    assert per_doc.keys() == meta.keys()
    for did, nf in meta.items():
        assert per_doc[did] == (nf + 3) // 4  # ceil(n_frames / 4)
    idx = frames.filter("doc_id = %d" % next(iter(meta))).collect()
    assert all(r["frame_idx"] % 4 == 0 for r in idx)


def test_ppm_round_trip():
    from appeals_data_spark.operators.multimodal import (
        PPM_MIME,
        decode_media,
        decode_ppm,
        encode_ppm,
    )

    px = bytes(range(18))  # 2x3 RGB
    blob = encode_ppm(2, 3, px)
    assert blob.startswith(b"P6\n2 3\n255\n")
    assert decode_ppm(blob) == (2, 3, px)
    assert decode_media(blob, PPM_MIME) == (2, 3, px)


def test_ppm_decoder_handles_comments_and_whitespace():
    from appeals_data_spark.operators.multimodal import decode_ppm

    px = bytes(3)
    blob = b"P6\n# a comment\n 1\t1 # trailing\n255\n" + px
    assert decode_ppm(blob) == (1, 1, px)


def test_ppm_decoder_rejects_bad_payloads():
    from appeals_data_spark.operators.multimodal import decode_media, decode_ppm

    with pytest.raises(ValueError, match="not a binary PPM"):
        decode_ppm(b"P5\n1 1\n255\n\x00")
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(b"P6\n2 2\n255\n\x00\x00")
    with pytest.raises(NotImplementedError, match="no codec"):
        decode_media(b"\x89PNG", "image/png")


def test_decode_image_stats_reads_every_byte(spark):
    from appeals_data_spark.operators.multimodal import (
        as_ppm_media,
        decode_image_stats,
    )

    docs = load_table(spark, SF_SMOKE, "documents").limit(20)
    out = {r["doc_id"]: r for r in decode_image_stats(as_ppm_media(docs)).collect()}
    for did, r in out.items():
        w, h = did % 16 + 4, did % 12 + 4
        rgb = did % 256 + (did * 7) % 256 + (did * 13) % 256
        assert (r["width"], r["height"]) == (w, h)
        assert r["pixel_sum"] == rgb * w * h


def test_ppm_round_trip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from appeals_data_spark.operators.multimodal import decode_ppm, encode_ppm

    @settings(max_examples=200, deadline=None)
    @given(st.data())
    def prop(data):
        w = data.draw(st.integers(1, 16))
        h = data.draw(st.integers(1, 16))
        px = data.draw(st.binary(min_size=w * h * 3, max_size=w * h * 3))
        assert decode_ppm(encode_ppm(w, h, px)) == (w, h, px)

    prop()


def test_bmp_golden_bytes():
    # Hand-computed 2x2 24-bit BMP: rows bottom-up, BGR, width 2 ->
    # row = 6 bytes, pad = 2. Pixels top-down RGB:
    #   (1,2,3) (4,5,6)
    #   (7,8,9) (10,11,12)
    from appeals_data_spark.operators.multimodal import decode_bmp, encode_bmp

    pixels = bytes([1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12])
    bmp = encode_bmp(2, 2, pixels)
    assert bmp[:2] == b"BM"
    assert bmp[10:14] == (54).to_bytes(4, "little")  # raster offset
    # raster: bottom row first (7,8,9),(10,11,12) as BGR + 2 pad bytes
    assert bmp[54:62] == bytes([9, 8, 7, 12, 11, 10, 0, 0])
    assert bmp[62:70] == bytes([3, 2, 1, 6, 5, 4, 0, 0])
    assert len(bmp) == 54 + 16
    assert decode_bmp(bmp) == (2, 2, pixels)


def test_bmp_round_trip_non_constant_pins_row_and_channel_order():
    # Non-constant image: every (row, channel) position unique, so an
    # unflipped row order or unswapped channel CANNOT round-trip —
    # the byte-level pin the constant-color query rollup can't give.
    from appeals_data_spark.operators.multimodal import (
        decode_bmp,
        decode_media,
        decode_ppm,
        encode_bmp,
        encode_ppm,
    )

    w, h = 3, 4  # odd row width -> real padding (9 bytes -> pad 3)
    pixels = bytes(range(w * h * 3))
    assert decode_bmp(encode_bmp(w, h, pixels)) == (w, h, pixels)
    # cross-codec agreement: both containers decode to identical rasters
    assert decode_media(encode_ppm(w, h, pixels), "image/x-portable-pixmap") \
        == decode_media(encode_bmp(w, h, pixels), "image/bmp")


def test_bmp_decoder_rejects_unsupported():
    from appeals_data_spark.operators.multimodal import decode_bmp, encode_bmp

    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"P6\n1 1\n255\n\x00\x00\x00")
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(encode_bmp(2, 2, bytes(12))[:-4])
    # 8bpp header is refused, not misread
    good = bytearray(encode_bmp(1, 1, bytes(3)))
    good[28] = 8  # bpp field
    with pytest.raises(ValueError, match="only uncompressed"):
        decode_bmp(bytes(good))


def test_mixed_media_dispatches_per_row(spark):
    from appeals_data_spark.operators.multimodal import (
        BMP_MIME,
        PPM_MIME,
        as_image_media,
        decode_image_stats,
    )

    docs = load_table(spark, SF_SMOKE, "documents").limit(20)
    media = as_image_media(docs, mixed=True)
    mimes = {r["doc_id"]: r["mime"] for r in media.collect()}
    assert all(
        m == (BMP_MIME if did % 2 else PPM_MIME) for did, m in mimes.items()
    )
    out = {r["doc_id"]: r for r in decode_image_stats(media).collect()}
    for did, r in out.items():
        w, h = did % 16 + 4, did % 12 + 4
        rgb = did % 256 + (did * 7) % 256 + (did * 13) % 256
        assert (r["width"], r["height"]) == (w, h)
        assert r["pixel_sum"] == rgb * w * h


def test_wav_golden_bytes_and_chunk_walk():
    import struct

    from appeals_data_spark.operators.multimodal import decode_wav, encode_wav

    pcm = struct.pack("<4h", 100, -200, 32767, -32768)
    wav = encode_wav(8000, pcm)
    assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"
    assert struct.unpack_from("<I", wav, 4)[0] == len(wav) - 8
    assert decode_wav(wav) == (8000, 1, pcm)
    # chunk-walk: an odd-length LIST chunk between fmt and data (RIFF
    # pads chunks to even length) must be skipped, not misparsed
    fmt = wav[12:36]
    data = wav[36:]
    extra = struct.pack("<4sI", b"LIST", 3) + b"abc" + b"\x00"  # pad byte
    body = b"WAVE" + fmt + extra + data
    padded = struct.pack("<4sI", b"RIFF", len(body)) + body
    assert decode_wav(padded) == (8000, 1, pcm)


def test_wav_decoder_rejects_unsupported():
    import struct

    from appeals_data_spark.operators.multimodal import decode_wav, encode_wav

    with pytest.raises(ValueError, match="not a RIFF"):
        decode_wav(b"BM" + bytes(60))
    wav = bytearray(encode_wav(8000, struct.pack("<2h", 1, 2)))
    wav[20] = 3  # audio_format = IEEE float
    with pytest.raises(ValueError, match="only uncompressed 16-bit"):
        decode_wav(bytes(wav))
    with pytest.raises(ValueError, match="missing fmt or data"):
        decode_wav(struct.pack("<4sI", b"RIFF", 4) + b"WAVE")


def test_decode_audio_stats_matches_arithmetic(spark):
    from appeals_data_spark.operators.multimodal import (
        as_wav_media,
        decode_audio_stats,
    )

    docs = load_table(spark, SF_SMOKE, "documents").limit(10)
    out = {r["doc_id"]: r for r in decode_audio_stats(as_wav_media(docs)).collect()}
    for did, r in out.items():
        n = did % 256 + 16
        samples = [(31 * did + 17 * i) % 65536 - 32768 for i in range(n)]
        assert r["sample_rate"] == 8000
        assert r["n_samples"] == n
        assert r["abs_sum"] == sum(abs(s) for s in samples)
        assert r["max_abs"] == max(abs(s) for s in samples)


def test_codec_rejections_stay_valueerror_on_short_or_corrupt():
    # The codec error contract is ValueError for ANY malformed payload
    # — a struct.error or ZeroDivisionError escaping the Arrow worker
    # would be an uncaught task failure instead of a typed rejection.
    import struct

    from appeals_data_spark.operators.multimodal import (
        decode_bmp,
        decode_wav,
        encode_wav,
    )

    with pytest.raises(ValueError, match="truncated BMP header"):
        decode_bmp(b"BM")  # shorter than the fixed 54-byte headers
    wav = encode_wav(8000, struct.pack("<2h", 1, 2))
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(wav[:-2])  # data chunk declares 2 bytes more
    short_fmt = (
        struct.pack("<4sI", b"RIFF", 16)
        + b"WAVE"
        + struct.pack("<4sI", b"fmt ", 4)
        + bytes(4)
    )
    with pytest.raises(ValueError, match="truncated fmt"):
        decode_wav(short_fmt)
    zero_ch = bytearray(encode_wav(8000, struct.pack("<2h", 1, 2)))
    zero_ch[22] = 0  # channels field
    with pytest.raises(ValueError, match="only uncompressed 16-bit"):
        decode_wav(bytes(zero_ch))


def test_bmp_round_trip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from appeals_data_spark.operators.multimodal import decode_bmp, encode_bmp

    @settings(max_examples=200, deadline=None)
    @given(st.data())
    def prop(data):
        w = data.draw(st.integers(1, 16))  # odd widths exercise padding
        h = data.draw(st.integers(1, 16))
        px = data.draw(st.binary(min_size=w * h * 3, max_size=w * h * 3))
        assert decode_bmp(encode_bmp(w, h, px)) == (w, h, px)

    prop()


def test_wav_round_trip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from appeals_data_spark.operators.multimodal import decode_wav, encode_wav

    @settings(max_examples=200, deadline=None)
    @given(st.data())
    def prop(data):
        ch = data.draw(st.integers(1, 2))
        frames = data.draw(st.integers(0, 64))
        pcm = data.draw(
            st.binary(min_size=frames * 2 * ch, max_size=frames * 2 * ch)
        )
        sr = data.draw(st.sampled_from([8000, 16000, 44100]))
        assert decode_wav(encode_wav(sr, pcm, channels=ch)) == (sr, ch, pcm)

    prop()


def test_bmp_decoder_rejects_offset_inside_header():
    from appeals_data_spark.operators.multimodal import decode_bmp, encode_bmp

    bad = bytearray(encode_bmp(2, 2, bytes(12)))
    bad[10] = 14  # pixel-data offset now points inside the info header
    bad += bytes(64)  # keep the raster-length check satisfiable
    with pytest.raises(ValueError, match="offset"):
        decode_bmp(bytes(bad))


def _dhash_py(doc_id: int) -> int:
    """Reference dHash straight from the synthesis arithmetic (no
    container round-trip) — what dhash32 must recover from the bytes."""
    import numpy as np

    from appeals_data_spark.operators.multimodal import (
        PHASH_H,
        PHASH_W,
        _gradient_pixels,
    )

    arr = np.frombuffer(_gradient_pixels(doc_id), dtype=np.uint8).reshape(
        PHASH_H, PHASH_W, 3
    )
    s = (
        arr[:, :, 0]
        .astype(np.int64)
        .reshape(PHASH_H // 2, 2, PHASH_W // 2, 2)
        .sum(axis=(1, 3))
    )
    bits = s[:, :-1] > s[:, 1:]
    gy, gx = np.nonzero(bits)
    return int((1 << (gy * 8 + gx)).sum())


def test_phash_invariances(spark):
    """The two guarantees mm_phash_near_dedup's banding relies on:
    (1) a uniform brightness shift (same scene+pert, different off)
    leaves the dHash IDENTICAL; (2) the row-0 perturbation (same
    scene, different pert) stays confined to band 0 — Hamming <= 8
    and bands 1-3 bit-equal — so same-scene replicas always share a
    band bucket. Checked through the FULL pipeline (encode PPM/BMP ->
    decode -> hash) against the arithmetic reference."""
    from appeals_data_spark.operators.multimodal import (
        as_gradient_image_media,
        dhash32,
    )

    base = [3, 10, 77, 200]
    ids = []
    for d in base:
        ids += [d, d + 2048, d + 256]  # self, brightness twin, pert twin
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: r["h"]
        for r in dhash32(as_gradient_image_media(docs)).collect()
    }
    for d in ids:  # container round-trip recovers the arithmetic hash
        assert got[d] == _dhash_py(d), d
    for d in base:
        assert got[d] == got[d + 2048], f"brightness twin moved hash: {d}"
        x = got[d] ^ got[d + 256]
        assert bin(x).count("1") <= 8, f"pert twin hamming > 8: {d}"
        assert (got[d] >> 8) == (got[d + 256] >> 8), f"pert leaked: {d}"


def _envelope_py(doc_id: int) -> int:
    """Reference envelope hash straight from the synthesis arithmetic
    (no RIFF round-trip) — what audio_envelope_hash must recover."""
    scene, gain, pert = doc_id % 128, (doc_id // 128) % 3 + 1, (doc_id // 7) % 8
    e = [
        16 * ((scene * 11 + f * f) % 199 + 1) * gain
        + (6 * pert if f == 0 else 0)
        for f in range(32)
    ]
    return sum(1 << f for f in range(31) if e[f] > e[f + 1])


def test_audio_envelope_invariances(spark):
    """The guarantees mm_audio_fingerprint_dedup's banding relies on:
    a same-scene replica at a different gain (and a different frame-0
    pert) moves AT MOST bit 0 — Hamming <= 1 with bits 1..30 equal —
    so replicas always share the three upper bands. Checked through
    the FULL pipeline (WAV encode -> RIFF decode -> hash) against the
    arithmetic reference."""
    from appeals_data_spark.operators.multimodal import (
        as_tone_wav_media,
        audio_envelope_hash,
    )

    base = [3, 10, 77, 200]
    ids = []
    for d in base:
        ids += [d, d + 896]  # same scene+pert, gain+1 (lcm(128,56)=896)
        ids += [d + 128]  # same scene, different gain AND pert
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: r["h"]
        for r in audio_envelope_hash(as_tone_wav_media(docs)).collect()
    }
    for d in ids:  # RIFF round-trip recovers the arithmetic hash
        assert got[d] == _envelope_py(d), d
    for d in base:
        for twin in (d + 896, d + 128):
            x = got[d] ^ got[twin]
            assert x in (0, 1), f"replica moved past bit 0: {d} vs {twin}"


def test_video_shingle_invariances(spark):
    """The guarantees mm_video_shingle_dedup relies on, through the
    FULL pipeline (P6 stream encode -> container walk -> per-frame
    dHash): (1) a brightness-shifted replica of the same video has the
    IDENTICAL frame-hash sequence; (2) a temporal crop (same scene,
    start offset +1) shares exactly VIDEO_FRAMES-1 aligned frame
    hashes, i.e. 6 of the 7 consecutive 2-grams."""
    from appeals_data_spark.operators.multimodal import (
        VIDEO_FRAMES,
        as_video_media,
        video_hash_seq,
    )

    base = [3, 10, 77]
    ids = []
    for d in base:
        # +256: same vscene (256 % 64 == 0) and same offv (offv moves
        # by 4 ≡ 0 mod 4) but a different brightness (256//7 shifts
        # (d//7)%16) -> the brightness twin. +64: same vscene, offv+1
        # -> the one-frame temporal crop.
        ids += [d, d + 256, d + 64]
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: list(r["seq"])
        for r in video_hash_seq(as_video_media(docs)).collect()
    }
    for d in base:
        assert len(got[d]) == VIDEO_FRAMES
        assert got[d] == got[d + 256], f"brightness twin moved hashes: {d}"
        # +64: offv+1 -> frames shift by one position
        assert got[d][1:] == got[d + 64][:-1], f"crop misaligned: {d}"
