"""Composite lifecycle ports — multi-operator analyses traced in
SURVEY.md §3 (the reference's real entry points chain pre-aggregation,
argmax row retrieval, fuzzy matching, derived flags, and 2-D pivot
summaries in one dataflow). Each composite runs as ONE Catalyst plan —
the reference needed an Oracle round-trip per stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..registry import register


@register(
    "comp_time_to_first_ship",
    oracle="""
    WITH fs AS (
      SELECT l_orderkey, MIN(CAST(l_shipdate AS DATE)) AS first_ship
      FROM lineitem GROUP BY l_orderkey
    ), base AS (
      SELECT o.o_custkey, o.o_orderpriority,
             date_trunc('month', o.o_orderdate) AS om,
             date_diff('day', CAST(o.o_orderdate AS DATE), first_ship) AS tts
      FROM orders o JOIN fs ON o_orderkey = l_orderkey
    ), flagged AS (
      SELECT *, COUNT(*) OVER (PARTITION BY o_custkey, om) > 1 AS multi
      FROM base
    )
    SELECT multi,
           quantile_cont(tts, 0.5) FILTER (o_orderpriority = '1-URGENT') AS p1_urgent,
           quantile_cont(tts, 0.5) FILTER (o_orderpriority = '2-HIGH') AS p2_high,
           quantile_cont(tts, 0.5) FILTER (o_orderpriority = '3-MEDIUM') AS p3_medium,
           quantile_cont(tts, 0.5) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS p4_notspec,
           quantile_cont(tts, 0.5) FILTER (o_orderpriority = '5-LOW') AS p5_low
    FROM flagged
    GROUP BY multi ORDER BY multi
    """,
    tags=("COMPOSITE", "J7", "J8", "J16", "A9"),
    bench=True,
)
def comp_time_to_first_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """time-to-ep lifecycle port (time-to-ep.Rmd:34-151, SURVEY §3.3):
    pre-aggregate the child table for the first shipment (J7/J8 —
    argmax via groupBy-min, no full-table sort), derive time-to-ship,
    flag multi-order veteran-months with a window count (J16), pivot
    median days by multi-flag x priority (A9 tapply analog). One plan:
    the reference made three Oracle round-trips plus a Ruby hop."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    first_ship = li.groupBy("l_orderkey").agg(
        F.min(F.col("l_shipdate").cast("date")).alias("first_ship")
    )
    base = o.join(first_ship, o.o_orderkey == first_ship.l_orderkey).select(
        "o_custkey",
        "o_orderpriority",
        F.date_trunc("month", "o_orderdate").alias("om"),
        F.datediff("first_ship", F.col("o_orderdate").cast("date")).alias("tts"),
    )
    flagged = base.withColumn(
        "multi", F.count("*").over(Window.partitionBy("o_custkey", "om")) > 1
    )
    piv = (
        flagged.groupBy("multi")
        .pivot(
            "o_orderpriority",
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
        )
        .agg(F.expr("percentile(tts, 0.5)"))
    )
    return piv.select(
        "multi",
        F.col("1-URGENT").alias("p1_urgent"),
        F.col("2-HIGH").alias("p2_high"),
        F.col("3-MEDIUM").alias("p3_medium"),
        F.col("4-NOT SPECIFIED").alias("p4_notspec"),
        F.col("5-LOW").alias("p5_low"),
    ).orderBy("multi")
