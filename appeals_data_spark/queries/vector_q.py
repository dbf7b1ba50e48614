"""Embedding similarity-search queries (training-data ops).

Brute-force cosine top-k carries a DuckDB oracle (ranks only — float
cosine values are engine-representation-sensitive; ordering on random
embeddings is ulp-stable). The LSH variant and recall audit are
rows-only, golden-tested in pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..operators.similarity import brute_force_topk, lsh_topk
from ..registry import register

_DIM = 64


@register(
    "vec_brute_force_topk",
    oracle="""
    WITH q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 8
    ), scored AS (
      SELECT q.query_id, e.vec_id AS corpus_id,
             ROW_NUMBER() OVER (
               PARTITION BY q.query_id
               ORDER BY list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) DESC,
                        e.vec_id
             ) AS rank
      FROM q, embeddings e
      WHERE e.vec_id != q.query_id
    )
    SELECT query_id, rank, corpus_id
    FROM scored WHERE rank <= 5
    ORDER BY query_id, rank
    """,
    tags=("VEC", "ANN"),
    bench=True,
)
def vec_brute_force_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for 8 query vectors against the corpus.
    Queries broadcast; scoring is zip_with/aggregate in the JVM
    (no Python boundary); per-query top-k via rank window."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    return brute_force_topk(emb, queries, k=5).select("query_id", "rank", "corpus_id")


@register(
    "vec_lsh_topk",
    oracle=None,  # hyperplane family is xxhash64-derived; recall audited in pytest
    tags=("VEC", "ANN", "LSH"),
)
def vec_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH buckets: candidates
    share a 6-bit signed-projection bucket, so scored pairs track
    bucket occupancy (~|corpus|/64 per query) instead of |corpus|."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    return lsh_topk(emb, queries, dim=_DIM, k=5).select(
        "query_id", "rank", "corpus_id"
    )


@register(
    "vec_label_centroid_assign",
    oracle=None,  # float centroid math; audited by rows-only + pytest
    tags=("VEC", "IVF"),
)
def vec_label_centroid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style two-stage search skeleton: build per-label centroids
    (the 'coarse quantizer'), assign every vector to its nearest
    centroid, report the assignment-vs-label confusion counts. At
    100 TB the centroid set is the broadcast index; the probe list
    bounds candidates exactly like FAISS IVF."""
    from ..functions.vectors import cosine

    emb = load_table(spark, sf_dir, "embeddings")
    unpacked = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "x")
    )
    centroids = (
        unpacked.groupBy("label", "pos")
        .agg(F.avg("x").alias("cx"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cx"))), lambda s: s["cx"]
            ).alias("centroid")
        )
        .withColumnRenamed("label", "centroid_label")
    )
    assigned = (
        emb.crossJoin(F.broadcast(centroids))
        .select(
            "vec_id",
            "label",
            "centroid_label",
            cosine(F.col("embedding"), F.col("centroid")).alias("cos"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(
                    F.desc("cos"), F.asc("centroid_label")
                )
            ),
        )
        .filter(F.col("rn") == 1)
    )
    return (
        assigned.groupBy("label", "centroid_label")
        .agg(F.count("*").alias("n"))
        .orderBy("label", "centroid_label")
    )
