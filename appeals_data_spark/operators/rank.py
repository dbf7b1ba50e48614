"""Distributed global-order ranking primitives.

Spark plans an UNPARTITIONED window (``Window.orderBy(...)`` with no
partitionBy) as a single-partition sort — the whole input funnels
through one task. Fine for model-sized frames; a silent scale killer
on corpus-sized ones (the w15 100x probe measured a bare global NTILE
at 108x: 0.38s -> 41.6s). Two exact replacements:

* ``ranked_head``: top-k by a deterministic total order WITH an exact
  rank column. ``orderBy + limit(k)`` plans as TakeOrderedAndProject
  (per-partition top-k heads, driver k-way merge — no full sort, no
  single-reducer shuffle); the rank window then runs over k rows.
  Identical rows and ranks to ``row_number().over(global).filter(<=k)``
  for any deterministic (total) order.
* ``global_ntile``: exact NTILE over a total order via a two-phase
  distributed rank — repartitionByRange on the order key (parallel
  local sorts), per-partition row_number, global rank = broadcast
  cumulative partition-size offset + local rank, then NTILE's
  front-loaded-remainder arithmetic applied to the exact rank. Every
  stage is parallel; the only single-task work is the <=nparts-row
  offset cumulation. Bit-identical tile assignment to Spark's and
  DuckDB's NTILE (both front-load the remainder) — the w15 rewrite
  (round 8b), factored here in round 10 so every banding query shares
  it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def ranked_head(
    df: DataFrame,
    k: int,
    order_cols: list[Column | str],
    rank_name: str = "rnk",
) -> DataFrame:
    """Exact top-``k`` of ``df`` under ``order_cols`` with a 1-based
    ``rank_name`` column. The order must be total (include a tiebreak
    key) or ranks within ties are not reproducible."""
    top = df.orderBy(*order_cols).limit(k)
    w = Window.orderBy(*order_cols)
    # the rank window sorts k rows in one partition — k is a constant
    return top.withColumn(rank_name, F.row_number().over(w))


def two_phase_rank(
    df: DataFrame,
    order_cols: list[str],
    nparts: int = 32,
) -> DataFrame:
    """Add ``_rank0`` (0-based exact global rank under ``order_cols``)
    and ``_n`` (total row count) without a global single-partition
    sort. ``order_cols`` must be a total order (include a tiebreak).

    Consumers must not rely on row order — only on the rank values.
    """
    part = df.repartitionByRange(nparts, *order_cols)
    loc = part.withColumn("_pid", F.spark_partition_id()).withColumn(
        "_rn",
        F.row_number().over(Window.partitionBy("_pid").orderBy(*order_cols)),
    )
    sizes = loc.groupBy("_pid").agg(F.count("*").alias("_c"))
    # range partitions are ordered by _pid, so the exclusive running
    # sum over the <=nparts-row size table is each partition's global
    # offset; the single-partition window here sorts <=nparts rows.
    offs = sizes.select(
        "_pid",
        F.coalesce(
            F.sum("_c").over(
                Window.orderBy("_pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).alias("_off"),
        F.sum("_c").over(
            Window.orderBy("_pid").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("_n"),
    )
    return (
        loc.join(F.broadcast(offs), "_pid")
        .withColumn("_rank0", F.col("_off") + F.col("_rn") - 1)
        .drop("_pid", "_rn", "_off")
    )


def global_ntile(
    df: DataFrame,
    n_tiles: int,
    order_cols: list[str],
    tile_name: str = "tile",
    nparts: int = 32,
) -> DataFrame:
    """Exact ``NTILE(n_tiles)`` over a total order, distributed.

    Front-loaded remainder, exactly as Spark and DuckDB define NTILE:
    the first N % n_tiles tiles hold ceil(N/n_tiles) rows, the rest
    floor(N/n_tiles)."""
    ranked = two_phase_rank(df, order_cols, nparts)
    n = F.col("_n")
    ceil_sz = F.floor((n + n_tiles - 1) / n_tiles)
    floor_sz = F.greatest(F.floor(n / n_tiles), F.lit(1))
    rem = n % n_tiles
    boundary = rem * ceil_sz  # first rank0 belonging to a floor tile
    tile = F.when(
        F.col("_rank0") < boundary,
        F.floor(F.col("_rank0") / ceil_sz) + 1,
    ).otherwise(
        rem + F.floor((F.col("_rank0") - boundary) / floor_sz) + 1
    )
    return ranked.withColumn(
        tile_name, tile.cast("int")
    ).drop("_rank0", "_n")
