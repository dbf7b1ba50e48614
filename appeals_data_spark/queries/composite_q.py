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


@register(
    "comp_exp_gap_fit",
    oracle="""
    WITH gaps AS (
      SELECT date_diff('second', ts,
               LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_s
      FROM events
    ), buckets AS (
      SELECT CAST(FLOOR(gap_s / 60.0) AS INT) AS t, COUNT(*) AS n
      FROM gaps WHERE gap_s IS NOT NULL GROUP BY 1
    ), surv AS (
      SELECT t,
             CAST(SUM(n) OVER (ORDER BY t DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               / SUM(n) OVER () AS s
      FROM buckets
    )
    SELECT ROUND(regr_slope(LN(s), t), 6) AS neg_lambda,
           ROUND(regr_r2(LN(s), t), 6) AS r2,
           COUNT(*) AS n_points
    FROM surv WHERE t BETWEEN 1 AND 30 AND s > 0
    """,
    tags=("COMPOSITE", "X3", "F9", "A13", "W1"),
)
def comp_exp_gap_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential catch-up model port (event-history.R:277-307 fits
    nls count ~ a(1-exp(-b lag)) for NOD reporting fog): linearized
    here as ln(empirical survival of inter-event gaps) ~ -lambda t,
    fitted with the closed-form regression aggregate. Windows -> bins
    -> reverse running sum -> one sufficient-statistics fit: the whole
    model pipeline never leaves the JVM."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.select(
        (
            F.unix_timestamp(F.lead("ts").over(w).cast("timestamp"))
            - F.unix_timestamp(F.col("ts").cast("timestamp"))
        ).alias("gap_s")
    ).filter(F.col("gap_s").isNotNull())
    buckets = gaps.groupBy(
        F.floor(F.col("gap_s") / 60.0).cast("int").alias("t")
    ).agg(F.count("*").alias("n"))
    w_rev = Window.orderBy(F.desc("t")).rowsBetween(Window.unboundedPreceding, 0)
    surv = buckets.select(
        "t",
        (
            F.sum("n").over(w_rev).cast("double")
            / F.sum("n").over(Window.partitionBy())
        ).alias("s"),
    ).filter(F.col("t").between(1, 30) & (F.col("s") > 0))
    agg = surv.agg(
        F.covar_pop("t", F.log("s")).alias("sxy"),
        F.var_pop("t").alias("sxx"),
        F.corr("t", F.log("s")).alias("r"),
        F.count(F.lit(1)).alias("n_points"),
    )
    return agg.select(
        F.round(F.col("sxy") / F.col("sxx"), 6).alias("neg_lambda"),
        F.round(F.col("r") * F.col("r"), 6).alias("r2"),
        "n_points",
    )
