"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries images/audio/video as opaque
``binary`` columns with a typed metadata struct alongside; decode and
feature extraction run as Arrow-batched pandas iterators (mapInPandas)
so the JVM never copies payload bytes row-at-a-time into Python.

The real codecs (PIL / soundfile / av) are NOT in this container, so
``decode_media`` is a clearly-marked stub; everything around it — the
schema contract, the partition-preserving mapInPandas shape, the batch
iteration, the deterministic fallback features — is real and tested.
Payloads here are synthesized deterministically from the documents
table (utf-8 bytes of the text), which makes every derived number
oracle-checkable in DuckDB.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import sized_for_compute as _sized

MEDIA_META_SCHEMA = "struct<mime:string,width:int,height:int,n_frames:int>"

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, digest string, mime string, "
    "feat array<float>"
)


def as_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Documents -> media table: ``blob binary`` + typed metadata.

    The blob is the utf-8 encoding of the text (deterministic fake
    payload); metadata is derived from doc stats the way a real
    ingest job would record container headers.
    """
    n = F.coalesce(F.col("n_chars"), F.length(text_col)).cast("int")
    meta = F.struct(
        F.lit("application/x-fake").alias("mime"),
        (n % 640 + 32).alias("width"),
        (n % 480 + 32).alias("height"),
        (n % 24 + 1).alias("n_frames"),
    )
    return docs.select(
        "doc_id",
        "source",
        F.encode(F.col(text_col), "utf-8").alias("blob"),
        meta.cast(MEDIA_META_SCHEMA).alias("meta"),
    )


PPM_MIME = "image/x-portable-pixmap"


def encode_ppm(width: int, height: int, pixels: bytes) -> bytes:
    """Binary PPM (P6) encoder — pure Python, no codec libraries.
    ``pixels`` is raw interleaved RGB, len == width*height*3."""
    if len(pixels) != width * height * 3:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, "
            f"expected {width * height * 3} for {width}x{height} RGB"
        )
    return b"P6\n%d %d\n255\n" % (width, height) + pixels


def decode_ppm(payload: bytes) -> tuple[int, int, bytes]:
    """Binary PPM (P6) decoder -> (width, height, raw RGB bytes).
    Handles the format's whitespace/comment header grammar; only
    maxval 255 (8-bit channels) is supported."""
    if payload[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    width, height, maxval = fields
    if maxval != 255:
        raise ValueError(f"only 8-bit PPM supported, got maxval={maxval}")
    pos += 1  # single whitespace byte separates header from raster
    raster = payload[pos : pos + width * height * 3]
    if len(raster) != width * height * 3:
        raise ValueError("truncated PPM raster")
    return width, height, raster


def decode_media(payload: bytes, mime: str):
    """Decode hook, dispatched on mime. PPM images decode natively
    (pure-Python P6 codec above — no external libraries); every other
    format is where a production deployment plugs in PIL.Image.open /
    soundfile.read / av.open, none of which are installed in this
    environment.
    """
    if mime == PPM_MIME:
        return decode_ppm(bytes(payload))
    raise NotImplementedError(
        f"no codec for {mime!r} in this environment; "
        "install PIL/soundfile/av and dispatch on mime"
    )


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction. One output row per input row;
    pure function of the payload bytes, so the op is deterministic
    under any partitioning. Only the decoder-hook features are computed
    here — everything expressible JVM-side (digest, byte length) is
    already a column on the way in."""
    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["n_bytes"],
                "digest": pdf["digest"],
                "mime": pdf["mime"],
                # Deterministic fallback features (a real decoder would
                # emit embeddings here via decode_media).
                "feat": [
                    [
                        float(n),
                        float(b[0]) if n else 0.0,
                        float(b[-1]) if n else 0.0,
                    ]
                    for b, n in zip(pdf["blob"], pdf["n_bytes"])
                ],
            }
        )


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over (doc_id, blob, meta.mime).

    Projects only the needed columns before the Python boundary so
    Arrow ships the minimum bytes; partitioning is preserved (no
    shuffle), so this pipelines with an upstream repartition sized to
    fit payload batches in executor memory.

    Payload *metadata* (md5 digest, byte length) is computed in
    whole-stage codegen before the boundary — a per-row
    ``hashlib.md5`` inside the pandas batch measured ~2x slower on the
    rollup; Python only does what only Python can (the decode hook).
    """
    slim = media.select(
        "doc_id",
        "blob",
        F.col("meta.mime").alias("mime"),
        F.octet_length("blob").cast("long").alias("n_bytes"),
        F.md5("blob").alias("digest"),
    )
    return _sized(slim).mapInPandas(_feature_batches, schema=FEATURE_SCHEMA)


PPM_STATS_SCHEMA = "doc_id long, width int, height int, pixel_sum long"


def as_ppm_media(docs: DataFrame) -> DataFrame:
    """Synthesize a REAL image payload per document: a constant-color
    RGB PPM whose dims/color are pure functions of doc_id (w = id%16+4,
    h = id%12+4, rgb = id%256/(7id)%256/(13id)%256) — so everything a
    decoder recovers from the bytes has an exact SQL twin, while the
    payload is still a genuine container a real parser must decode."""

    def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for did in pdf["doc_id"]:
                d = int(did)
                w, h = d % 16 + 4, d % 12 + 4
                px = bytes((d % 256, (d * 7) % 256, (d * 13) % 256)) * (w * h)
                blobs.append(encode_ppm(w, h, px))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    return (
        _sized(docs.select("doc_id"))
        .mapInPandas(_enc, schema="doc_id long, blob binary")
        .withColumn("mime", F.lit(PPM_MIME))
    )


def decode_image_stats(media: DataFrame) -> DataFrame:
    """End-to-end decode path: parse each payload via the decode_media
    mime dispatch and emit stats computed FROM THE DECODED RASTER
    (dims from the header, pixel_sum over every byte) — a wrong parse
    of any byte changes the output. Arrow-batched, 1:1, partition-
    preserving, like every other payload stage."""

    def _dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ws, hs, sums = [], [], []
            for blob, mime in zip(pdf["blob"], pdf["mime"]):
                w, h, raster = decode_media(blob, mime)
                ws.append(w)
                hs.append(h)
                sums.append(
                    int(np.frombuffer(raster, dtype=np.uint8).astype(np.int64).sum())
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "width": ws, "height": hs,
                 "pixel_sum": sums}
            )

    return media.select("doc_id", "blob", "mime").mapInPandas(
        _dec, schema=PPM_STATS_SCHEMA
    )


RESIZE_SCHEMA = "doc_id long, blob binary, new_width int, new_height int"


def resize_media(media: DataFrame, max_dim: int = 256) -> DataFrame:
    """1:1 payload transform: cap the longer image side at ``max_dim``.

    The geometry (scale = min(1, max_dim / max(w, h)), truncating int
    dims) is real; the pixel resample is stubbed — a production build
    decodes via ``decode_media``, resamples, and re-encodes the blob.
    Binary-in/binary-out through Arrow with metadata recomputed
    JVM-side afterwards: the exact shape a real thumbnailing stage has.
    """

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            scale = (max_dim / pdf[["width", "height"]].max(axis=1)).clip(upper=1.0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    # stub: real impl re-encodes the decoded, resampled image
                    "blob": pdf["blob"],
                    "new_width": (pdf["width"] * scale).astype("int32"),
                    "new_height": (pdf["height"] * scale).astype("int32"),
                }
            )

    slim = media.select(
        "doc_id",
        "blob",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )
    return _sized(slim).mapInPandas(_resize, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id long, source string, frame_idx int, frame_blob binary"


def sample_frames(media: DataFrame, every_k: int = 4) -> DataFrame:
    """1:N frame sampling: emit every k-th frame of each video payload.

    Demonstrates the fan-out mapInPandas shape (output rows > input
    rows) a video pipeline needs; frames are deterministic byte slices
    of the payload standing in for decoded frames (``decode_media`` is
    the production hook). Emitted rows per doc = ceil(n_frames / k).
    """

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "source": [], "frame_idx": [], "frame_blob": []}
            for did, src, blob, nf in zip(
                pdf["doc_id"], pdf["source"], pdf["blob"], pdf["n_frames"]
            ):
                b = bytes(blob)
                stride = max(1, len(b) // int(nf)) if len(b) else 1
                for idx in range(0, int(nf), every_k):
                    out["doc_id"].append(did)
                    out["source"].append(src)
                    out["frame_idx"].append(idx)
                    out["frame_blob"].append(b[idx * stride : (idx + 1) * stride])
            yield pd.DataFrame(out)

    slim = media.select(
        "doc_id", "source", "blob", F.col("meta.n_frames").alias("n_frames")
    )
    return _sized(slim).mapInPandas(_frames, schema=FRAME_SCHEMA)
