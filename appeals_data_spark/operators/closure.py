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

# At or below this many symmetric edge rows the whole fixpoint runs in
# ONE Arrow pass over the coalesced edge partition (_components_local):
# 2M two-int64 rows are ~32 MB in one task, and the vectorized
# hook+compress label sweep converges in O(log n) numpy passes of
# ~10 ms each — while the distributed loop pays 2 jobs per round
# (checkpoint + convergence count) x O(diameter) rounds, ~2.6s of
# scheduling on the sf0.1 duplicate graph (round-12 profile). The
# same dispatch move as pagerank/Bradley-Terry. Numeric node ids only
# (the exactness argument below needs an order numpy and Spark agree
# on); non-numeric ids take the distributed loop regardless of size.
CLOSURE_LOCAL_MAX_EDGES = 2_000_000

_LOCAL_NODE_TYPES = {
    "tinyint", "smallint", "int", "bigint", "float", "double", "date",
}


def _components_local(sym: DataFrame, node_type: str) -> DataFrame:
    """Exact min-label components in one numpy pass.

    Works in index space (``np.unique`` ascending, so min index = min
    node id): each sweep lowers every edge head's label to its tail's
    label (``np.minimum.at``) then pointer-compresses (label of
    label). Labels are monotone non-increasing integers bounded below,
    so the loop terminates; at fixpoint both directions of every
    symmetric edge force equal labels across a component, and the
    component's minimum index m can never be lowered, so the common
    value is exactly m — the identical (node, component = min
    reachable node) contract as the distributed loop, bit-exact (pure
    integer index arithmetic, no floats)."""

    def run(batches):
        import numpy as np
        import pandas as pd

        aa, bb = [], []
        for pdf in batches:
            aa.append(pdf["a"].to_numpy())
            bb.append(pdf["b"].to_numpy())
        if not aa or sum(len(x) for x in aa) == 0:
            yield pd.DataFrame({"node": [], "component": []})
            return
        a = np.concatenate(aa)
        b = np.concatenate(bb)
        nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
        si, ti = inv[: len(a)], inv[len(a):]
        label = np.arange(len(nodes))
        while True:
            prev = label.copy()
            np.minimum.at(label, si, label[ti])
            label = np.minimum(label, label[label])
            if np.array_equal(label, prev):
                break
        yield pd.DataFrame({"node": nodes, "component": nodes[label]})

    return sym.coalesce(1).mapInPandas(
        run, schema=f"node {node_type}, component {node_type}"
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Return (node, component) with component = min node id reachable.

    ``edges`` is undirected input (src, dst) of any integral/string
    type with a total order. Size-dispatched (round 12): small numeric
    graphs run as one Arrow union-find pass; everything else takes the
    per-round checkpointed label-propagation loop (the only shape that
    scales). Both return the identical (node, min reachable node)
    table — pinned by tests/test_operators_golden.py::
    test_closure_local_matches_distributed."""
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
    node_type = sym.schema["a"].dataType.simpleString()
    if n_edges <= CLOSURE_LOCAL_MAX_EDGES and node_type in _LOCAL_NODE_TYPES:
        return _components_local(sym, node_type)
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
