"""Skew-mitigation queries — the operators/skew.py surface as driver-
contract entries. Each salted plan must produce EXACTLY the unsalted
answer (the oracle is the plain GROUP BY / join), proving the salt is
semantics-free: deterministic, retry-stable, associative-only merges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.skew import salted_groupby, salted_join
from ..registry import register


@register(
    "skew_salted_agg",
    oracle="""
    SELECT l_returnflag,
           COUNT(l_quantity) AS n_rows,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           CAST(MIN(l_shipdate) AS DATE) AS first_ship
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("SKEW", "A1"),
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a pathologically hot key space
    (3 return flags own every lineitem row): partial agg on
    (key, salt-of-orderkey) spreads each hot group over 16 tasks, the
    merge re-aggregates per key. Decimal sums keep the merge exactly
    associative, so the salted answer hash-matches the plain GROUP BY.
    """
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "price_dec", F.col("l_extendedprice").cast("decimal(18,2)")
    )
    out = salted_groupby(
        li,
        "l_returnflag",
        "l_orderkey",
        {"l_quantity": "count", "price_dec": "sum", "l_shipdate": "min"},
        buckets=16,
    )
    return out.select(
        "l_returnflag",
        F.col("count_l_quantity").alias("n_rows"),
        F.col("sum_price_dec").cast("double").alias("revenue"),
        F.col("min_l_shipdate").cast("date").alias("first_ship"),
    ).orderBy("l_returnflag")


@register(
    "skew_salted_join",
    oracle="""
    SELECT n.n_name AS nation,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY nation
    """,
    tags=("SKEW", "J1"),
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join: the fact side is salted by its own orderkey,
    the dim side replicated per salt, so one hot supplier spreads over
    16 shuffle partitions. (At this dim size a broadcast join is what
    the optimizer would pick anyway — the point is the salted plan
    gives the identical answer for the broadcast-ineligible case.)"""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("suppkey"), "l_orderkey", "l_extendedprice"
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("suppkey"), "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation")
    joined = salted_join(li, s, key="suppkey", discriminator="l_orderkey", buckets=16)
    return (
        joined.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("nation")
    )
