"""Sessionization (gaps-and-islands) — running-sum segmentation.

The reference's `group_by(BFKEY, cumsum(!grepl(...)))` idiom
(R/events.R:213-218, SURVEY W3): a running sum of boundary flags
becomes a secondary grouping key. One shuffle (partitionBy the entity),
one ordered pass; scales as pure window work with no joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def epoch_seconds(col: str | Column) -> Column:
    """Whole seconds since epoch for TIMESTAMP_NTZ, truncating —
    matches DuckDB's date_diff('second', ...) boundary counting."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_timestamp(c.cast("timestamp"))


def sessionize(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Assign a ``session_seq`` (1-based per entity) using a max-gap rule.

    New session when the gap to the previous event exceeds
    ``gap_seconds``. ``tiebreak_col`` makes ordering total when
    timestamps can tie.
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(entity_col).orderBy(*order)
    prev_sec = F.lag(epoch_seconds(ts_col)).over(w)
    boundary = F.when(
        prev_sec.isNull() | ((epoch_seconds(ts_col) - prev_sec) > gap_seconds), 1
    ).otherwise(0)
    return df.withColumn(
        "session_seq",
        F.sum(boundary).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
