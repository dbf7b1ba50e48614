"""Skew mitigation: salted joins and two-phase aggregation.

AQE's skew-join splitting (on in session.py) handles most skew at
runtime, but two cases still need explicit salting at 100 TB:

1. A broadcast-ineligible join where one key dominates (the reference
   hints at veteran-id skew, SURVEY §4 — a few BFCORLIDs own thousands
   of appeals): replicate the small side per salt, spread the hot keys.
2. A high-cardinality aggregation whose partial/merge phases are fine
   but whose single hottest group overflows one task: pre-aggregate on
   (key, salt) first.

Salts are deterministic functions of existing columns (never rand()):
results must be reproducible and retry-stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_of(*cols: Column | str, buckets: int) -> Column:
    """Deterministic salt in [0, buckets): hash of discriminating
    columns (typically the row's own fine-grained id)."""
    return F.pmod(F.xxhash64(*cols), F.lit(buckets)).cast("int")


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    discriminator: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to hot keys on the large side.

    The large side gets a deterministic salt from ``discriminator``
    (a column that varies within a key, e.g. the row id); the small
    side is replicated ``buckets`` times. The shuffle key becomes
    (key, salt) so a hot key spreads over ``buckets`` tasks.

    Only inner/left are valid: replicating the small side would emit
    each unmatched small-side row ``buckets`` times under right/full
    outer, and breaks semi/anti shapes.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports how='inner'|'left', got {how!r}")
    lg = large.withColumn("_salt", _salt_of(discriminator, buckets=buckets))
    sm = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return lg.join(sm, [key, "_salt"], how).drop("_salt")


def salted_groupby(
    df: DataFrame,
    key: str,
    discriminator: str,
    aggs: dict[str, str],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for pathological single-key hotspots:
    partial aggregate on (key, salt), then merge per key. ``aggs``
    maps column -> one of sum/count/min/max (the re-associable set).
    """
    partial_exprs, merge_exprs = [], []
    for col, fn in aggs.items():
        if fn == "count":
            partial_exprs.append(F.count(col).alias(f"_p_{col}"))
            merge_exprs.append(F.sum(f"_p_{col}").alias(f"{fn}_{col}"))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(f"_p_{col}"))
            merge_exprs.append(F.sum(f"_p_{col}").alias(f"{fn}_{col}"))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(f"_p_{col}"))
            merge_exprs.append(F.min(f"_p_{col}").alias(f"{fn}_{col}"))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(f"_p_{col}"))
            merge_exprs.append(F.max(f"_p_{col}").alias(f"{fn}_{col}"))
        else:
            raise ValueError(f"non-reassociable aggregate: {fn}")
    partial = df.withColumn(
        "_salt", _salt_of(discriminator, buckets=buckets)
    ).groupBy(key, "_salt").agg(*partial_exprs)
    return partial.groupBy(key).agg(*merge_exprs)
