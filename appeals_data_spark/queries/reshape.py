"""Reshape family (SURVEY.md §2.6 R1-R5): unpivot/pivot/fixed-width.

R1 unpivot is THE reference workhorse (`gather` in every extractor,
R/events.R:48-49). Spark's native ``DataFrame.unpivot`` (= SQL stack)
is a zero-shuffle map-side expansion — rows × k measures, no exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "r1_unpivot_measures",
    oracle="""
    SELECT measure, l_returnflag,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total, COUNT(*) AS n
    FROM (
      SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'l_tax', l_tax FROM lineitem
    )
    GROUP BY measure, l_returnflag
    ORDER BY measure, l_returnflag
    """,
    tags=("R1",),
)
def r1_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide measures -> long (measure, value) rows — tidyr `gather` ≡
    DataFrame.unpivot (R/events.R:48-49, R1). Map-side only; the
    groupBy after it is the only exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ["l_returnflag"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "value",
    )
    return (
        long.groupBy("measure", "l_returnflag")
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
            F.count("*").alias("n"),
        )
        .orderBy("measure", "l_returnflag")
    )


@register(
    "r2_pivot_event_matrix",
    oracle="""
    SELECT user_id,
           COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
           COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
           COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
           COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("R2",),
)
def r2_pivot_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long -> wide pivot (tidyr `spread`, form8-changes.Rmd:62-68).
    Explicit pivot values => single pass, no distinct-discovery job —
    mandatory at scale."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .agg(F.count(F.lit(1)))
        .fillna(0)
        .orderBy("user_id")
    )


@register(
    "r4_fixed_width_split",
    oracle="""
    SELECT SUBSTRING(o_orderpriority, 1, 1) AS prio_code,
           SUBSTRING(o_orderpriority, 3) AS prio_name,
           regexp_extract(o_orderpriority, '^([0-9]+)-', 1) AS prio_digit,
           COUNT(*) AS n
    FROM orders
    GROUP BY 1, 2, 3
    ORDER BY prio_code
    """,
    tags=("R4", "F6"),
)
def r4_fixed_width_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width / positional string splitting — the reference's CVRR
    flag-string parse (the-david-ames-query.R:250-258, R4)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.substring("o_orderpriority", 1, 1).alias("prio_code"),
            F.substring("o_orderpriority", 3, 100).alias("prio_name"),
            F.regexp_extract("o_orderpriority", r"^([0-9]+)-", 1).alias("prio_digit"),
        )
        .agg(F.count("*").alias("n"))
        .orderBy("prio_code")
    )
