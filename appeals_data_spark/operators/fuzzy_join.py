"""Fuzzy date-window (as-of-like) join with precise-over-fuzzy precedence.

Re-expression of the reference's decisions⋈claims matching
(notebooks/dispatch/time-to-ep.Rmd:101-125, SURVEY J10): equi-join on
the entity id, keep candidates within ±tolerance days, prefer an exact
date match ("precise") over a nearby one ("fuzzy"), break remaining
ties by earliest right-side timestamp.

Physical shape: the tolerance predicate is a *residual* on an equi
join, so Catalyst plans SMJ/shuffle-hash on the id — never a range
BNLJ. The candidate fan-out is bounded by events-per-entity within the
window; the precedence pick is one window pass over candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def fuzzy_asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_key: str,
    left_ts: str,
    right_ts: str,
    tolerance_days: int = 31,
    right_tiebreak: str | None = None,
    how: str = "left",
) -> DataFrame:
    """Match each left row to at most one right row.

    Parameters mirror the reference logic: ``on`` is the entity id
    (BFCORLID there), ``left_key`` a unique left row id (for the
    per-row precedence window), tolerance the ±day window. Unmatched
    left rows survive with nulls when ``how='left'``.

    Returns left columns + right columns + ``match_type``
    ('precise' | 'fuzzy' | null).
    """
    # Equi-join on the entity id only; the ±tolerance window is a
    # residual filter after the join (day-level diff computed below,
    # where the columns are unambiguous).
    cand = left.join(right.withColumnRenamed(on, f"__r_{on}"), left[on] == F.col(f"__r_{on}"), "inner")
    diff = F.abs(
        F.datediff(
            F.date_trunc("day", F.col(left_ts)).cast("date"),
            F.date_trunc("day", F.col(right_ts)).cast("date"),
        )
    )
    cand = cand.filter(diff <= tolerance_days).withColumn(
        "match_type", F.when(diff == 0, F.lit("precise")).otherwise(F.lit("fuzzy"))
    )
    order = [F.col("match_type").desc(), diff.asc(), F.col(right_ts).asc()]
    if right_tiebreak:
        order.append(F.col(right_tiebreak).asc())
    w = Window.partitionBy(left_key).orderBy(*order)
    best = cand.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop(
        "__rn", f"__r_{on}"
    )
    if how == "left":
        matched_keys = best.select(left_key)
        unmatched = left.join(matched_keys, left_key, "left_anti")
        for c in best.columns:
            if c not in unmatched.columns:
                unmatched = unmatched.withColumn(c, F.lit(None))
        return best.unionByName(unmatched.select(best.columns))
    return best
