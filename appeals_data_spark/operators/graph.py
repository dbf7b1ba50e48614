"""Iterative PageRank over an edge DataFrame.

Companion to :mod:`closure` (the reference's repeated-self-join
case-unification family, scratch/other/event-history.R:34-58, SURVEY
J19): where connected components answers "which rows chain together",
PageRank ranks nodes by link structure — the standard importance
measure for handoff/citation graphs.

Scale discipline (SURVEY §4): a fixed number of rounds, each one
equi-join (edges ⋈ ranks on src) + one groupBy(dst), lineage cut with
``localCheckpoint`` per round (the closure/Lloyd/IRLS discipline — a
``persist``-only variant was tried and rejected: without lineage
truncation the logical plan nests a round deeper each iteration and
driver-side analysis time grows exponentially, measured 1.5s -> 17.7s
per round by round 6 at sf0.1). Round-10 scale fixes, in effect here:

* the out-degree frame is checkpointed — before, it was lazy and the
  per-round dangling-mass broadcast silently re-derived the FULL edge
  input every round (for the registered handoff query: a window pass
  over the events table × 6 rounds — the dominant term in the r9
  1000x probe's 320x factor; 1122s -> 514s at /tmp/sf100 from this
  fix alone);
* AQE is disabled for the loop (saved/restored): checkpoints taken
  under AQE record UnknownPartitioning (AdaptiveSparkPlanExec decides
  partitioning at execution), which forced every round to re-shuffle
  the EDGE-sized side; with AQE off the checkpointed LogicalRDD keeps
  its hash partitioning, the loop-invariant edge frame is shuffled
  onto ``src`` once at build, and each round's edge⋈rank join plans
  exchange-free (measured: 2 shuffle exchanges per co-partitioned
  join under AQE, 0 without). Iterative loops get nothing from AQE —
  every round is re-planned from a materialized checkpoint anyway.

The dangling-node mass is a 1-row aggregate broadcast back with a
nested-loop join whose build side is a single row. No per-iteration
driver collect. Note: the plan gate (tests/test_plans.py) never sees
the per-iteration joins — ``localCheckpoint`` truncates lineage each
round, so the audited plan is only the post-checkpoint final segment;
the per-round cost is frozen separately in
test_pagerank_per_round_exchanges_frozen.
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
    spark = edges.sparkSession
    # Materialize the caller's edge derivation ONCE under the ambient
    # conf (AQE on: the expensive upstream pass — for the handoff query
    # a window over the events table — keeps its runtime re-planning),
    # so the AQE toggle below only governs the cheap re-layout jobs and
    # the model-sized loop.
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint()
    # AQE wraps every physical plan in AdaptiveSparkPlanExec, whose
    # outputPartitioning is unknown until execution — so a checkpoint
    # taken under AQE records UnknownPartitioning and every round
    # re-shuffles (and re-sorts) the edge-sized side (measured: 2
    # exchanges per co-partitioned join under AQE, 0 without).
    # Iterative loops get nothing from AQE anyway (every round is
    # re-planned from a materialized checkpoint), so disable it for the
    # loop and restore after.
    from ..session import aqe_disabled

    with aqe_disabled(spark):
        # every frame below is explicitly hash-partitioned on its
        # per-round join key BEFORE its checkpoint, so the recorded
        # LogicalRDD partitioning lets Catalyst plan the loop joins
        # exchange-free on the already-placed side
        nodes = (
            e.select(F.col("src").alias("node"))
            .unionByName(e.select(F.col("dst").alias("node")))
            .distinct()
            .repartition("node")
            .localCheckpoint()
        )
        nn = nodes.agg(
            F.count("*").cast("double").alias("n_nodes")
        ).localCheckpoint()
        # Out-degrees are loop-invariant AND feed the per-round dangling
        # anti-join: checkpoint them once (src-node-sized). Pre-round-10
        # this was lazy, so every round's dangling subjob re-derived the
        # FULL edge input (for the registered handoff query: a window
        # pass over the events table x 6 rounds — the dominant term in
        # the r9 1000x probe's 320x factor).
        # .toDF re-aliases with fresh expression ids: the checkpointed
        # LogicalRDD keeps e's original `src` attribute id, and joining
        # it back against e (below) would otherwise be a conflicting
        # self-reference the analyzer refuses to dedup across a
        # checkpoint boundary. The alias-aware ProjectExec still maps
        # the recorded hash(src) partitioning through the rename.
        deg = (
            e.groupBy("src")
            .agg(F.count("*").alias("outdeg"))
            .localCheckpoint()
            .toDF("src", "outdeg")
        )
        # (src, dst, outdeg) is loop-invariant: shuffled onto src AND
        # sorted within partitions ONCE here — the checkpoint records
        # both (LogicalRDD keeps outputPartitioning + outputOrdering
        # when AQE is off), so every round's sort-merge join streams
        # the edge side with NO exchange and NO re-sort; only
        # node-sized frames shuffle per round.
        edeg = (
            e.join(deg, "src")
            .repartition("src")
            .sortWithinPartitions("src")
            .localCheckpoint()
        )
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
