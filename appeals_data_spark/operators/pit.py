"""Point-in-time (backlog) operator over (enter, exit) interval cohorts.

Reference shape: "how many cases were pending on each date d" —
`sum(enter < d & (exit is null | exit >= d))` evaluated over a date
grid (scratch/hearings/capacity.R:84-86, scratch/dispatch/impact.R:
569-571, SURVEY J17).

Two physical strategies, same semantics:

- ``explode``: each interval emits the grid points it covers
  (`explode(sequence(...))`), then a plain groupBy count. Shuffle
  volume = Σ covered-points — ideal when intervals are short relative
  to the grid. This is the default and the 100 TB path: it's a single
  map-side expansion + partial-agg count, no join at all.
- ``grid-join``: broadcast the (small) grid and range-filter — only
  preferable when intervals are so long the expansion dominates.

Zero-count grid points are restored by a left join against the full
grid (broadcast, tiny).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def date_grid(
    spark: SparkSession, start: str, end: str, step_days: int = 7
) -> DataFrame:
    """Materialize a date grid [start, end] inclusive with a fixed step."""
    return spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("date"),
                F.lit(end).cast("date"),
                F.expr(f"interval {step_days} days"),
            )
        ).alias("grid_date")
    )


def pit_backlog(
    intervals: DataFrame,
    grid: DataFrame,
    enter_col: str | Column,
    exit_col: str | Column,
    step_days: int = 7,
    strategy: str = "explode",
    grid_start: str | None = None,
    grid_end: str | None = None,
) -> DataFrame:
    """Count intervals open at each grid date: enter <= d < exit.

    ``grid`` must be the output of :func:`date_grid` (column
    ``grid_date``, fixed ``step_days`` aligned to its start). Pass the
    same ``grid_start``/``grid_end`` the grid was built from — the
    caller always knows them, and omitting either costs a driver-side
    1-row collect per call to rediscover it. A NULL exit always means
    "still open" (the reference's `exit is null | exit >= d`,
    capacity.R:84-86) via a beyond-grid sentinel — unconditionally, so
    forgetting ``grid_end`` can never silently drop open intervals.
    The explode expansion is also capped at the grid end, so a
    far-future (or sentinel) exit date costs at most one full grid
    sweep per interval, never an unbounded sequence.
    """
    enter = F.col(enter_col) if isinstance(enter_col, str) else enter_col
    exit_ = F.col(exit_col) if isinstance(exit_col, str) else exit_col
    # One combined collect covers every omitted bound (the fallback
    # path); callers passing both bounds never touch the driver.
    bounds = None
    if grid_end is None or (strategy == "explode" and grid_start is None):
        bounds = grid.agg(
            F.min("grid_date").alias("g0"), F.max("grid_date").alias("g1")
        ).collect()[0]
    if grid_end is not None:
        last_grid = F.lit(grid_end).cast("date")
    else:
        last_grid = F.lit(bounds["g1"])
    exit_ = F.coalesce(exit_, F.date_add(last_grid, 1))
    if strategy == "explode":
        if grid_start is not None:
            first = F.lit(grid_start).cast("date")
        else:
            first = F.lit(bounds["g0"])
        # first grid point >= enter: ceil-align to the grid phase
        off = F.datediff(enter, first)
        first_covered = F.date_add(
            first, ((off + step_days - 1) / step_days).cast("int") * step_days
        )
        last_covered = F.least(F.date_sub(exit_, 1), last_grid)
        covered = (
            intervals.withColumn("__first", first_covered)
            .filter(F.col("__first") <= last_covered)
            .select(
                F.explode(
                    F.sequence(
                        F.col("__first"),
                        last_covered,
                        F.expr(f"interval {step_days} days"),
                    )
                ).alias("grid_date")
            )
            .filter(F.col("grid_date") >= first)
        )
        counts = covered.groupBy("grid_date").agg(F.count("*").alias("backlog"))
    else:
        counts = (
            intervals.join(
                F.broadcast(grid),
                (enter <= F.col("grid_date")) & (exit_ > F.col("grid_date")),
            )
            .groupBy("grid_date")
            .agg(F.count("*").alias("backlog"))
        )
    return (
        grid.join(counts, "grid_date", "left")
        .select("grid_date", F.coalesce("backlog", F.lit(0)).alias("backlog"))
        .orderBy("grid_date")
    )
