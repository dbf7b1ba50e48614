"""Iterative PageRank over an edge DataFrame.

Companion to :mod:`closure` (the reference's repeated-self-join
case-unification family, scratch/other/event-history.R:34-58, SURVEY
J19): where connected components answers "which rows chain together",
PageRank ranks nodes by link structure — the standard importance
measure for handoff/citation graphs.

Scale discipline (SURVEY §4): a fixed number of rounds, each one
equi-join (edges ⋈ ranks on src) + one groupBy(dst) — both shuffles on
the same keys every round, so at cluster scale the edge side can be
pre-partitioned once and reused. The dangling-node mass is a 1-row
aggregate broadcast back with a nested-loop join whose build side is a
single row. Note: the plan gate (tests/test_plans.py) never sees these
per-iteration joins — ``localCheckpoint`` truncates lineage each round,
so the audited plan is only the post-checkpoint final segment; the
per-round scale cost is reported separately by tools/audit_plans.py's
iterative annotations. No per-iteration driver collect. Lineage is cut with ``localCheckpoint`` per round, the same
discipline as :func:`closure.connected_components` and the Lloyd/IRLS
loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 6,
) -> DataFrame:
    """Return (node, rank) after ``iterations`` synchronous rounds.

    ``edges`` is a directed, deduplicated (src, dst) edge list. Ranks
    start uniform at 1/N. Each round:

        rank'(v) = (1-d)/N + d * (sum_{u->v} rank(u)/outdeg(u)
                                  + dangling_mass/N)

    where dangling_mass is the total rank parked on nodes with no
    out-edges — redistributed uniformly, the textbook formulation, so
    total rank stays 1 every round.

    N is model-as-data: a 1-row count aggregate broadcast into the
    rank initialization and every round (the same shape as the
    dangling-mass scalar) — no driver-side action anywhere; an empty
    graph flows through as empty frames (the per-row divisions never
    evaluate) and returns the empty (node, rank) result the oracle's
    CTE chain over zero nodes produces.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    nn = nodes.agg(
        F.count("*").cast("double").alias("n_nodes")
    ).localCheckpoint()
    deg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    # (src, dst, outdeg) is loop-invariant: build once, checkpoint once.
    edeg = e.join(deg, "src").localCheckpoint()
    has_out = deg.select(F.col("src").alias("node"))

    ranks = (
        nodes.join(F.broadcast(nn))
        .select("node", (F.lit(1.0) / F.col("n_nodes")).alias("rank"))
        .localCheckpoint()
    )
    for _ in range(iterations):
        contrib = (
            edeg.join(ranks, edeg.src == ranks.node)
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("outdeg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        dangling = (
            ranks.join(has_out, "node", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .join(F.broadcast(dangling))
            .join(F.broadcast(nn))
            .select(
                "node",
                (
                    F.lit(1.0 - damping) / F.col("n_nodes")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("dm") / F.col("n_nodes")
                    )
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks
