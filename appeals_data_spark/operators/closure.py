"""Iterative transitive closure / connected components.

The reference chains appeals into "logical cases" by repeated
self-joins until fixpoint (scratch/other/event-history.R:34-58,
phase-history.R:118-145, SURVEY J19). The Spark-native form is
label-propagation connected components: every node takes the min label
in its neighborhood until nothing changes.

Scale discipline (SURVEY §4): each iteration is one join + one
groupBy; lineage is cut with ``localCheckpoint`` every iteration so the
plan doesn't grow unboundedly; convergence is detected with a cheap
count. Large-diameter graphs converge in O(diameter) rounds — for the
reference's appeal chains diameter is tiny (2-5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Return (node, component) with component = min node id reachable.

    ``edges`` is undirected input (src, dst) of any integral/string
    type with a total order.
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    nodes = sym.select(F.col("a").alias("node")).distinct()
    labels = nodes.withColumn("component", F.col("node"))
    sym = sym.localCheckpoint()
    labels = labels.localCheckpoint()

    for _ in range(max_iter):
        # neighbor labels (incl. self) -> min per node
        neighbor = (
            sym.join(labels, sym.b == labels.node)
            .select(F.col("a").alias("node"), "component")
            .unionByName(labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        changed = (
            neighbor.alias("n")
            .join(labels.alias("l"), "node")
            .filter(F.col("n.component") != F.col("l.component"))
            .limit(1)
            .count()
        )
        labels = neighbor.localCheckpoint()
        if changed == 0:
            break
    return labels
