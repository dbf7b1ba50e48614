"""Bradley-Terry MM fit (Hunter 2004, Ann. Statist. 32(1)) over an
aggregated pair-stats table — two execution paths, bit-identical by
construction, switched on the materialized pair count.

Reference analog: the pairwise-preference aggregation shape of the
reference's grouped model fits (SURVEY §2.11 / X6); the MM update
p_i <- W_i / sum_j n_ij/(p_i+p_j) is row-parallel in the pair table,
which is what makes both paths below exact twins.

Determinism contract (shared with the DuckDB oracle in
queries/survival_q.py): both fold sites — the per-supplier opponent
sum and the normalization total — accumulate 6dp-scaled int64s
(rint(x*1e6), half-to-even in numpy, Spark and DuckDB round_even), so
the sums are order-commutative-exact under ANY partitioning; every
other step is a deterministic elementwise IEEE-double op. Hence the
single-Arrow-group numpy fit, the distributed JVM fit, and the
unrolled-round SQL oracle agree bit for bit.

Path selection: the single-group fit ships the WHOLE pair table into
one Arrow group — item-pairs-sized, capped at C(S,2) rows for S
distinct items (gated in tests/test_properties.py), but C(S,2) itself
blows past Arrow comfort around 5e7 rows (~1.6 GB at 32 B/row,
S ~ 1e4 at full pair density). Beyond ``max_single_group_pairs`` the
fit switches to the sharded path: the pair table stays partitioned
("shards" are Spark partitions), each round computes per-pair int64
contributions JVM-side after joining the current strength table onto
both pair ends, and the scatter-add is a groupBy whose map-side
partial aggregation IS the per-shard partial sum — one small
(items-sized) combine per round, no Python anywhere, no group ever
larger than a partition. The strength table is localCheckpoint'd per
round (iterative-lineage discipline); the only collect is the 1-double
normalization total per round (model-sized — the ml/svm.py pegasos
rule: literals for model state only, never data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Single-Arrow-group comfort ceiling for the pair-stats table:
# ~1.6 GB at 32 B/row. C(S,2) crosses this around S ~ 1e4 at full
# pair density, so any larger item universe (the documented ~3e4
# supplier cliff at sparse density) lands on the sharded path.
#
# Measured at the 100x probe (BASELINE.md round 8, 49.95M pairs,
# local[32]): with an adequately sized heap (24g) the sharded fit is
# 11.9s vs 56.6s single-group — the Arrow group is the bottleneck
# well before it becomes unsafe — but in the bench-default 8g local
# heap the sharded path's per-round shuffles on top of the cached
# pair table OOM while the single group (which streams Arrow batches
# once) completes. The default therefore stays at the safety ceiling:
# below it the single group is reliable in ANY heap; above it no heap
# can hold the group and the sharded path with honestly sized
# executors is the only option. Cluster callers with real executor
# memory should pass a lower max_single_group_pairs (~2e7) to take
# the measured 4.8x win earlier.
MAX_SINGLE_GROUP_PAIRS = 50_000_000


def mm_fit_single_group(pairs: DataFrame, rounds: int = 3) -> DataFrame:
    """Whole pair-stats table as ONE Arrow group: symmetrize,
    dense-index the item universe, run the MM rounds as numpy vector
    ops. np.add.at int64 scatter-adds are exact under any row arrival
    order; np.rint is half-to-even like Spark's rint and DuckDB's
    round_even. Output: (i, wi, ni, p) — item, wins, comparisons,
    strength."""

    def _mm_fit(pdf):
        import numpy as np
        import pandas as pd

        sa = pdf["sa"].to_numpy(np.int64)
        sb = pdf["sb"].to_numpy(np.int64)
        n = pdf["n"].to_numpy(np.int64)
        w = pdf["w"].to_numpy(np.int64)
        sup = np.unique(np.concatenate([sa, sb]))  # sorted item keys
        ia = np.searchsorted(sup, sa)
        ib = np.searchsorted(sup, sb)
        size = sup.size
        wins = np.zeros(size, np.int64)
        np.add.at(wins, ia, w)
        np.add.at(wins, ib, n - w)
        ni = np.zeros(size, np.int64)
        np.add.at(ni, ia, n)
        np.add.at(ni, ib, n)
        row = np.concatenate([ia, ib])
        col = np.concatenate([ib, ia])
        nn = np.concatenate([n, n]).astype(np.float64)
        p = np.ones(size, np.float64)
        for _ in range(rounds):
            contrib = np.rint(nn / (p[row] + p[col]) * 1e6).astype(np.int64)
            ssum = np.zeros(size, np.int64)
            np.add.at(ssum, row, contrib)
            praw = wins / (ssum.astype(np.float64) / 1e6)
            t = np.rint(praw * 1e6).astype(np.int64).sum() / 1e6
            p = praw / t
        return pd.DataFrame({"i": sup, "wi": wins, "ni": ni, "p": p})

    return pairs.groupBy(F.lit(1).alias("g")).applyInPandas(
        _mm_fit, "i long, wi long, ni long, p double"
    )


def mm_fit_sharded(pairs: DataFrame, rounds: int = 3) -> DataFrame:
    """Sharded MM fit: the pair table never leaves the JVM and no
    single task ever holds more than its own partition. Per round:

    1. join the current strength table onto both pair ends (AQE picks
       broadcast while strengths are small, shuffle join beyond),
    2. per-pair contribution rint(n/(p_a+p_b)*1e6) as an int64 column,
    3. explode to (item, contrib) for both ends and groupBy-sum — the
       map-side partial aggregation is the per-shard partial scatter-
       add, the exchange ships items-sized partials, and int64
       addition makes the merge order irrelevant (exactness),
    4. praw = wins/(ssum/1e6); normalization total t collected as ONE
       double (model-sized) and divided in as a literal.

    Every association mirrors mm_fit_single_group term for term
    (n cast to double, the same rint/1e6 grid, the same int64 sums),
    so strengths are bit-identical between the paths — asserted on an
    S>3e4 universe in tests/test_properties.py."""
    # Item universe + win/comparison totals: one symmetrizing pass,
    # exact int64 sums, materialized once (loop-invariant).
    stats = (
        pairs.select(
            F.col("sa").alias("i"), F.col("n").alias("n"), F.col("w").alias("w")
        )
        .unionByName(
            pairs.select(
                F.col("sb").alias("i"),
                F.col("n").alias("n"),
                (F.col("n") - F.col("w")).alias("w"),
            )
        )
        .groupBy("i")
        .agg(F.sum("w").alias("wi"), F.sum("n").alias("ni"))
        .localCheckpoint()
    )
    p = stats.select("i", F.lit(1.0).alias("p"))
    for _ in range(rounds):
        joined = (
            pairs.join(p.select(F.col("i").alias("sa"), F.col("p").alias("p_a")), "sa")
            .join(p.select(F.col("i").alias("sb"), F.col("p").alias("p_b")), "sb")
            .select(
                "sa",
                "sb",
                F.rint(
                    F.col("n").cast("double")
                    / (F.col("p_a") + F.col("p_b"))
                    * F.lit(1e6)
                )
                .cast("long")
                .alias("c"),
            )
        )
        ssum = (
            joined.select(
                F.explode(
                    F.array(
                        F.struct(F.col("sa").alias("i"), F.col("c").alias("c")),
                        F.struct(F.col("sb").alias("i"), F.col("c").alias("c")),
                    )
                ).alias("e")
            )
            .select(F.col("e.i").alias("i"), F.col("e.c").alias("c"))
            .groupBy("i")
            .agg(F.sum("c").alias("ssum"))
        )
        praw = (
            stats.join(ssum, "i")
            .select(
                "i",
                (
                    F.col("wi").cast("double")
                    / (F.col("ssum").cast("double") / F.lit(1e6))
                ).alias("praw"),
            )
            .localCheckpoint()  # materialize: the t-collect and the next
            # round both read it; keeps per-round lineage flat
        )
        t = (
            praw.agg(
                (
                    F.sum(F.rint(F.col("praw") * F.lit(1e6)).cast("long"))
                    / F.lit(1e6)
                ).alias("t")
            ).collect()[0]["t"]
        )
        p = praw.select("i", (F.col("praw") / F.lit(float(t))).alias("p"))
    return stats.join(p, "i").select("i", "wi", "ni", "p")


def bt_strengths(
    pairs: DataFrame,
    rounds: int = 3,
    max_single_group_pairs: int = MAX_SINGLE_GROUP_PAIRS,
    force: str | None = None,
) -> DataFrame:
    """Fit Bradley-Terry strengths from a (sa, sb, n, w) pair-stats
    table, choosing the execution path at the gated bound: the
    single-Arrow-group numpy fit below ``max_single_group_pairs`` pair
    rows, the sharded JVM fit above it. ``pairs`` must be materialized
    (bt_pair_stats localCheckpoints it), so the count probe is a cheap
    scan of cached partitions, and the two paths return bit-identical
    strengths (property-gated). ``force`` ("single" | "sharded") pins
    a path for tests."""
    if force == "single":
        return mm_fit_single_group(pairs, rounds)
    if force == "sharded":
        return mm_fit_sharded(pairs, rounds)
    if pairs.count() > max_single_group_pairs:
        return mm_fit_sharded(pairs, rounds)
    return mm_fit_single_group(pairs, rounds)
