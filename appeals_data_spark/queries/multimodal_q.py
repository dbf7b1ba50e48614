"""Multimodal pipeline queries (training-data ops).

The feature extraction crosses the Python boundary via mapInPandas,
but every emitted value is a pure function of the payload bytes, so
the rollup still carries a full DuckDB oracle (md5/byte-length have
exact SQL twins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.multimodal import (
    as_media,
    as_ppm_media,
    decode_image_stats,
    extract_features,
    resize_media,
    sample_frames,
)
from ..registry import register


@register(
    "mm_decode_image",
    oracle="""
    WITH img AS (
      SELECT source,
             doc_id % 16 + 4 AS w,
             doc_id % 12 + 4 AS h,
             doc_id % 256 AS r, (doc_id * 7) % 256 AS g,
             (doc_id * 13) % 256 AS b
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_imgs,
           CAST(SUM(w) AS BIGINT) AS total_width,
           CAST(SUM(h) AS BIGINT) AS total_height,
           CAST(SUM((r + g + b) * w * h) AS BIGINT) AS total_pixel_sum
    FROM img
    GROUP BY source
    ORDER BY source
    """,
    tags=("MM", "UDF", "CODEC"),
)
def mm_decode_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 1:1 decode path end-to-end with a REAL codec: synthesize a
    binary PPM per document (genuine P6 container), decode it through
    the decode_media mime dispatch (pure-Python parser — no codec
    libraries), and roll up stats computed from the decoded header and
    raster. The oracle predicts dims and the full-raster pixel sum from
    the doc_id arithmetic — integer-exact, so any mis-parsed byte
    hash-fails."""
    docs = load_table(spark, sf_dir, "documents")
    stats = decode_image_stats(as_ppm_media(docs))
    return (
        stats.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_imgs"),
            F.sum("width").alias("total_width"),
            F.sum("height").alias("total_height"),
            F.sum("pixel_sum").alias("total_pixel_sum"),
        )
        .orderBy("source")
    )


@register(
    "mm_feature_rollup",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           COUNT(DISTINCT md5(text)) AS n_distinct_payloads,
           CAST(SUM(CASE WHEN octet_length(encode(text)) >= 200
                     THEN 1 ELSE 0 END) AS BIGINT)
             AS n_large
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
    tags=("MM", "UDF", "A1", "X6"),
    bench=True,
)
def mm_feature_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload audit per source: documents -> media table
    (binary blob + typed metadata) -> Arrow-batched mapInPandas
    feature extraction -> rollup. Oracle recomputes byte length and
    md5 in SQL — proving the Python boundary loses nothing."""
    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(as_media(docs))
    return (
        feats.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_bytes").alias("total_bytes"),
            F.countDistinct("digest").alias("n_distinct_payloads"),
            F.sum(F.when(F.col("n_bytes") >= 200, 1).otherwise(0)).alias("n_large"),
        )
        .orderBy("source")
    )


@register(
    "mm_resize_dims",
    oracle="""
    WITH dims AS (
      SELECT source,
             (n_chars % 640) + 32 AS w,
             (n_chars % 480) + 32 AS h
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST(FLOOR(w * LEAST(1.0, 256.0 / GREATEST(w, h)))
                        AS BIGINT)) AS BIGINT)
             AS total_new_width,
           CAST(SUM(CAST(FLOOR(h * LEAST(1.0, 256.0 / GREATEST(w, h)))
                        AS BIGINT)) AS BIGINT)
             AS total_new_height
    FROM dims
    GROUP BY source
    ORDER BY source
    """,
    tags=("MM", "UDF", "X6"),
)
def mm_resize_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail-stage audit: media -> resize_media (cap longer side at
    256, Arrow binary-in/binary-out) -> summed post-resize dimensions
    per source. The oracle recomputes the geometry in SQL; identical
    IEEE doubles on both sides make the truncated ints exact."""
    docs = load_table(spark, sf_dir, "documents")
    resized = resize_media(as_media(docs), max_dim=256)
    return (
        resized.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("new_width").alias("total_new_width"),
            F.sum("new_height").alias("total_new_height"),
        )
        .orderBy("source")
    )


@register(
    "mm_frame_sample",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST(CEIL(CAST((n_chars % 24) + 1 AS DOUBLE) / 4)
                        AS BIGINT)) AS BIGINT)
             AS n_frames_sampled
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
    tags=("MM", "UDF", "X6"),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling: media -> sample_frames (every 4th frame,
    1:N fan-out through mapInPandas) -> frames per source. The oracle
    predicts the fan-out arithmetic (ceil(n_frames / 4) with n_frames =
    n_chars % 24 + 1) straight from the documents table."""
    docs = load_table(spark, sf_dir, "documents")
    frames = sample_frames(as_media(docs), every_k=4)
    return (
        frames.groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_frames_sampled"),
        )
        .orderBy("source")
    )
