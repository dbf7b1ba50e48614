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


# Below this many edges the whole loop runs in ONE Arrow pass over the
# single coalesced partition (_pagerank_local): 2M two-int64 edge rows
# are ~32 MB in one task and 6 numpy scatter-add rounds are
# milliseconds, while the distributed loop pays ~2 jobs per round
# (dangling/N broadcast collects + the checkpoint job) plus 4 build
# checkpoints — a ~25-job schedule that costs ~2.5s at sf0.1 on a
# 17,906-edge graph (round-12 profile). Above the threshold the
# distributed loop is the only shape that scales. The same move as
# Bradley-Terry's in-one-applyInPandas MM rounds (survival_q.py).
PAGERANK_LOCAL_MAX_EDGES = 2_000_000


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

    Size-dispatched (round 12): at or below
    ``PAGERANK_LOCAL_MAX_EDGES`` edges the loop runs as one Arrow
    ``mapInPandas`` pass (:func:`_pagerank_local`); above it the
    per-round checkpointed distributed loop
    (:func:`pagerank_distributed`) — the only shape that survives
    1000x — takes over. Both implement the identical recurrence;
    they differ only in float summation order, which every consumer
    absorbs in its final rounding (the documented model-output
    contract, ROUNDING.md) and which
    tests/test_operators_golden.py::test_pagerank_local_matches_distributed
    pins to <1e-9.
    """
    # Materialize the caller's edge derivation ONCE under the ambient
    # conf (AQE on: the expensive upstream pass — for the handoff query
    # a window over the events table — keeps its runtime re-planning),
    # so the dispatch count and the loop read a computed frame.
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint()
    n_edges = e.count()
    if n_edges <= PAGERANK_LOCAL_MAX_EDGES:
        return _pagerank_local(e, damping, iterations)
    return pagerank_distributed(e, n_edges, damping, iterations)


def _pagerank_local(e: DataFrame, damping: float, iterations: int) -> DataFrame:
    """All rounds in one numpy pass over the coalesced edge partition.

    ``coalesce(1)`` (no shuffle) narrows the checkpointed edge frame
    into a single task; nodes/out-degrees/dangling mass and the
    ``iterations`` scatter-add rounds all happen in numpy. Determinism:
    ``np.unique`` fixes the node index order, ``np.add.at``
    accumulates in edge-array order — one fixed float-sum order per
    input, independent of partitioning."""
    d = float(damping)
    iters = int(iterations)
    node_t = e.schema["src"].dataType.simpleString()

    def run(batches):
        import numpy as np
        import pandas as pd

        srcs, dsts = [], []
        for pdf in batches:
            srcs.append(pdf["src"].to_numpy())
            dsts.append(pdf["dst"].to_numpy())
        if not srcs or sum(len(a) for a in srcs) == 0:
            yield pd.DataFrame({"node": [], "rank": []})
            return
        s = np.concatenate(srcs)
        t = np.concatenate(dsts)
        nodes, inv = np.unique(np.concatenate([s, t]), return_inverse=True)
        si, ti = inv[: len(s)], inv[len(s):]
        n = len(nodes)
        outdeg = np.zeros(n, dtype="int64")
        np.add.at(outdeg, si, 1)
        rank = np.full(n, 1.0 / n)
        dangling = outdeg == 0
        for _ in range(iters):
            contrib = np.zeros(n)
            np.add.at(contrib, ti, rank[si] / outdeg[si])
            dm = rank[dangling].sum()
            rank = (1.0 - d) / n + d * (contrib + dm / n)
        yield pd.DataFrame({"node": nodes, "rank": rank})

    return e.coalesce(1).mapInPandas(
        run, schema=f"node {node_t}, rank double"
    )


def pagerank_distributed(
    e: DataFrame,
    n_edges: int,
    damping: float = 0.85,
    iterations: int = 6,
) -> DataFrame:
    """The checkpointed per-round loop — the 1000x-scale path.

    ``e`` must be a materialized (src, dst) frame (the dispatcher
    checkpoints it); ``n_edges`` its row count, used to size the
    loop's shuffle partitioning.

    N is model-as-data: a 1-row count aggregate broadcast into the
    rank initialization and every round (the same shape as the
    dangling-mass scalar) — no driver-side action anywhere; an empty
    graph flows through as empty frames (the per-row divisions never
    evaluate) and returns the empty (node, rank) result the oracle's
    CTE chain over zero nodes produces.
    """
    spark = e.sparkSession
    # AQE wraps every physical plan in AdaptiveSparkPlanExec, whose
    # outputPartitioning is unknown until execution — so a checkpoint
    # taken under AQE records UnknownPartitioning and every round
    # re-shuffles (and re-sorts) the edge-sized side (measured: 2
    # exchanges per co-partitioned join under AQE, 0 without).
    # Iterative loops get nothing from AQE anyway (every round is
    # re-planned from a materialized checkpoint), so disable it for the
    # loop and restore after.
    from ..session import aqe_disabled, scoped_shuffle_partitions

    # Size the loop's shuffle count from the materialized edge frame
    # (round 12, the closure-loop move): with AQE off nothing
    # coalesces the conf's partition count down to the data. ~1M
    # two-int64 edge rows per task keeps partitions a few tens of MB,
    # and large graphs keep the ambient conf (the cluster-tuned value)
    # untouched.
    try:
        ambient = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        ambient = 200
    n_part = max(1, min(ambient, -(-n_edges // 1_000_000)))

    with aqe_disabled(spark), scoped_shuffle_partitions(spark, n_part):
        # every frame below is explicitly hash-partitioned on its
        # per-round join key BEFORE its checkpoint, so the recorded
        # LogicalRDD partitioning lets Catalyst plan the loop joins
        # exchange-free on the already-placed side
        nodes = (
            e.select(F.col("src").alias("node"))
            .unionByName(e.select(F.col("dst").alias("node")))
            .distinct()
            .repartition(n_part, "node")
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
            .repartition(n_part, "src")
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
