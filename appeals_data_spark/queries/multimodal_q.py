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
from ..operators.multimodal import as_media, extract_features
from ..registry import register


@register(
    "mm_feature_rollup",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           SUM(octet_length(encode(text))) AS total_bytes,
           COUNT(DISTINCT md5(text)) AS n_distinct_payloads,
           SUM(CASE WHEN octet_length(encode(text)) >= 200 THEN 1 ELSE 0 END)
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
