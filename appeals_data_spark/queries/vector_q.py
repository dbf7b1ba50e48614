"""Embedding similarity-search queries (training-data ops).

Brute-force cosine top-k, IVF top-k, and centroid assignment carry
DuckDB oracles (ranks/assignments only — float cosine values are
engine-representation-sensitive, but ordering on random embeddings is
ulp-stable). The hyperplane-LSH variant is rows-only (xxhash64 plane
family has no DuckDB twin), recall-audited in pytest.
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
    """Approximate top-k via random-hyperplane LSH: 4 independent
    4-bit hash tables union their candidates (recall ~ 1-(1-p)^L vs a
    single table's p), so scored pairs track ~L|corpus|/16 per query
    instead of |corpus|. Plane count trades bucket occupancy (cost)
    against per-table recall; table count buys recall back linearly in
    cost. Recall vs brute-force ground truth is asserted in
    tests/test_ann_recall.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    return lsh_topk(
        emb, queries, dim=_DIM, k=5, n_planes=4, n_tables=4
    ).select("query_id", "rank", "corpus_id")


# Shared oracle fragment: per-label centroids as DOUBLE lists.
_SQL_CENTROIDS = """
    unp AS (
      SELECT label, generate_subscripts(embedding, 1) AS pos,
             unnest(CAST(embedding AS DOUBLE[])) AS x
      FROM embeddings
    ), cent AS (
      SELECT c_label, list(cx ORDER BY pos) AS cvec
      FROM (SELECT label AS c_label, pos, AVG(x) AS cx
            FROM unp GROUP BY label, pos) t
      GROUP BY c_label
    )
"""


@register(
    "vec_label_centroid_assign",
    oracle=f"""
    WITH {_SQL_CENTROIDS},
    assigned AS (
      SELECT e.vec_id, e.label, c.c_label,
             ROW_NUMBER() OVER (
               PARTITION BY e.vec_id
               ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                               c.cvec) DESC,
                        c.c_label
             ) AS rn
      FROM embeddings e CROSS JOIN cent c
    )
    SELECT label, c_label AS centroid_label, COUNT(*) AS n
    FROM assigned WHERE rn = 1
    GROUP BY label, c_label
    ORDER BY label, centroid_label
    """,
    tags=("VEC", "IVF"),
)
def vec_label_centroid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style two-stage search skeleton: build per-label centroids
    (the 'coarse quantizer'), assign every vector to its nearest
    centroid, report the assignment-vs-label confusion counts. At
    100 TB the centroid set is the broadcast index; the probe list
    bounds candidates exactly like FAISS IVF. Clusters are separated
    by construction, so argmax assignments are stable across engines
    despite last-ulp float drift."""
    from ..operators.similarity import assign_to_centroids, label_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    cents = label_centroids(emb)
    assigned = assign_to_centroids(emb, cents, 1).join(
        emb.select("vec_id", "label"), "vec_id"
    )
    return (
        assigned.groupBy("label", F.col("c_label").alias("centroid_label"))
        .agg(F.count("*").alias("n"))
        .orderBy("label", "centroid_label")
    )


@register(
    "vec_ivf_topk",
    oracle=f"""
    WITH {_SQL_CENTROIDS},
    cells AS (
      SELECT vec_id AS corpus_id, c_vec, c_label FROM (
        SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS c_vec, c.c_label,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                 c.cvec) DESC, c.c_label
               ) AS rn
        FROM embeddings e CROSS JOIN cent c
      ) WHERE rn = 1
    ), probes AS (
      SELECT vec_id AS query_id, q_vec, c_label FROM (
        SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS q_vec, c.c_label,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                 c.cvec) DESC, c.c_label
               ) AS rn
        FROM embeddings e CROSS JOIN cent c
        WHERE e.vec_id < 8
      ) WHERE rn <= 3
    ), scored AS (
      SELECT p.query_id, s.corpus_id,
             ROW_NUMBER() OVER (
               PARTITION BY p.query_id
               ORDER BY list_cosine_similarity(p.q_vec, s.c_vec) DESC,
                        s.corpus_id
             ) AS rank
      FROM probes p JOIN cells s USING (c_label)
      WHERE s.corpus_id != p.query_id
    )
    SELECT query_id, rank, corpus_id
    FROM scored WHERE rank <= 5
    ORDER BY query_id, rank
    """,
    tags=("VEC", "ANN", "IVF"),
    bench=True,
)
def vec_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF two-stage ANN: probe the 3 nearest centroid cells per
    query, brute-force only those cells' members — the scale path
    where scored pairs track cell occupancy (~nprobe/|cells| of the
    corpus), not |corpus|. nprobe is the recall knob
    (tests/test_ann_recall.py): 2 cells gave 0.40 recall here, 3 gives
    ~0.5 at +50% candidate cost."""
    from ..operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    return ivf_topk(emb, queries, k=5, nprobe=3).select(
        "query_id", "rank", "corpus_id"
    )
