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
