"""Binned range join — the large×large non-equi overlap technique.

Spark has no native range-join optimization (a bare interval predicate
between two large frames plans as BroadcastNestedLoopJoin or a
cartesian): the standard fix is to BIN both sides on a fixed epoch
grid so the planner gets an equi-key, then re-check the exact
predicate as a residual filter. With bin width >= interval length
every interval touches at most 2 bins (bounded fan-out), each point
lands in exactly 1 bin (no double-counted pairs), and the join
shuffles hash-partitioned on bin id like any equi-join — the shape
that survives 100 TB, unlike the grid-broadcast trick (pit.date_grid)
which needs one side to be calendar-sized.

Reference semantics: the pending-backlog family (J17/A15 point-in-
interval counting) re-expressed for two data-sized sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EPOCH = "1990-01-01"


def binned_point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_days: int,
) -> DataFrame:
    """Inner-join every point row to every interval row containing it
    (start <= p <= end, inclusive). ``bin_days`` must be >= the
    longest interval so the interval side explodes into <= 2 bins —
    asserted indirectly by the fan-out expression (a longer interval
    still joins correctly, it just replicates more).

    Returns points.columns + intervals.columns (both sides' columns
    must be disjoint, and neither may already contain the reserved
    ``_bin`` working column — asserted)."""
    for side, df in (("points", points), ("intervals", intervals)):
        if "_bin" in df.columns:
            raise ValueError(
                f"binned_point_in_interval_join: {side} frame already "
                "has a '_bin' column (reserved working name)"
            )
    p_bin = F.floor(
        F.datediff(F.col(point_col), F.lit(EPOCH).cast("date")) / bin_days
    )
    s_bin = F.floor(
        F.datediff(F.col(start_col), F.lit(EPOCH).cast("date")) / bin_days
    )
    e_bin = F.floor(
        F.datediff(F.col(end_col), F.lit(EPOCH).cast("date")) / bin_days
    )
    pts = points.withColumn("_bin", p_bin)
    # Guard reversed intervals BEFORE the explode: F.sequence with
    # start > stop silently generates a DESCENDING list (default step
    # -1), ballooning a badly reversed interval (end years before
    # start) into one row per bin spanned — the residual filter keeps
    # results correct but the explode explodes. A reversed interval
    # matches no point anyway (start <= p <= end is unsatisfiable), so
    # dropping it early is semantics-preserving and fail-fast cheap.
    ivs = intervals.filter(
        F.col(start_col) <= F.col(end_col)
    ).withColumn("_bin", F.explode(F.sequence(s_bin, e_bin)))
    return (
        pts.join(ivs, "_bin")
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop("_bin")
    )
