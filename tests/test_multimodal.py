"""Multimodal plumbing: schema contract, batch shape, determinism."""

from __future__ import annotations

import pytest

from appeals_data_spark.catalog import load_table
from appeals_data_spark.operators.multimodal import (
    as_media,
    decode_media,
    extract_features,
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
