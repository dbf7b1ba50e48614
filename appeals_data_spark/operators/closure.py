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

Round-10 loop discipline (shared with operators.graph.pagerank):

* the convergence count runs on the CHECKPOINTED new-label frame —
  before, it ran on the lazy frame, silently executing every round's
  edge join twice;
* AQE is disabled for the loop (saved/restored): a checkpoint taken
  under AQE records UnknownPartitioning, forcing every round to
  re-shuffle the edge-sized side; with it off, the symmetric edge
  frame is shuffled onto its join key and sorted ONCE, and each
  round's join streams it with no exchange and no re-sort — only the
  node-sized label frame moves per round. The caller's edge
  derivation is materialized under the ambient conf first, so AQE
  still covers the expensive upstream pass.
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
    spark = edges.sparkSession
    # materialize the caller's (possibly expensive) edge derivation
    # once under the ambient conf, AQE included
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .localCheckpoint()
    )
    from ..session import aqe_disabled, scoped_shuffle_partitions

    # Size the loop's shuffle count from the materialized edge frame
    # (round 12): with AQE off nothing coalesces the conf's partition
    # count down to the data, so a duplicate graph of a few thousand
    # edges paid conf-many task launches per round — the dominant
    # small-corpus cost of every closure-consuming query. The count is
    # free (sym is checkpointed); ~1M two-int64 rows per task keeps
    # partitions a few tens of MB, and large graphs keep the ambient
    # conf (the cluster-tuned value) untouched.
    n_edges = sym.count()
    try:
        ambient = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        ambient = 200
    n_part = max(1, min(ambient, -(-n_edges // 1_000_000)))

    with aqe_disabled(spark), scoped_shuffle_partitions(spark, n_part):
        # loop-invariant edge frame: placed on the per-round join key
        # and sorted ONCE; the checkpoint records partitioning+ordering
        # (AQE off), so every round's join streams it exchange-free
        sym = (
            sym.repartition(n_part, "b")
            .sortWithinPartitions("b")
            .localCheckpoint()
        )
        nodes = sym.select(F.col("a").alias("node")).distinct()
        # hash(node)-partitioned via distinct's agg; recorded by the
        # checkpoint, so the round joins never move the label side
        # beyond the min-agg exchange
        labels = nodes.withColumn("component", F.col("node")).localCheckpoint()

        for _ in range(max_iter):
            # neighbor labels (incl. self) -> min per node
            neighbor = (
                sym.join(labels, sym.b == labels.node)
                .select(F.col("a").alias("node"), "component")
                .unionByName(labels)
                .groupBy("node")
                .agg(F.min("component").alias("component"))
            )
            # checkpoint FIRST, then count convergence on the
            # materialized frame — counting the lazy frame would
            # execute the round's edge join twice
            new_labels = neighbor.localCheckpoint()
            changed = (
                new_labels.alias("n")
                .join(labels.alias("l"), "node")
                .filter(F.col("n.component") != F.col("l.component"))
                .limit(1)
                .count()
            )
            labels = new_labels
            if changed == 0:
                break
        return labels
