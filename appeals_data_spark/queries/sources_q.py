"""Source/sink family (SURVEY.md §2.1 S5-S9).

The reference keeps tiny dimension files as local CSVs joined
client-side (ro.csv / docket.csv, certification-usage.Rmd:25-38) — the
Spark analog is an explicit-schema CSV read broadcast against the fact
table. Sink round-trips (S9) are exercised in tests/test_sources.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.scalars import dec
from ..registry import register

DATA_DIR = os.path.join(os.path.dirname(__file__), os.pardir, "data")
PRIORITY_DIM_CSV = os.path.abspath(os.path.join(DATA_DIR, "priority_dim.csv"))

# The dim inlined for the DuckDB oracle — same five rows as the CSV.
_DIM_VALUES = """
    (VALUES ('1-URGENT', 'expedite', 5),
            ('2-HIGH', 'expedite', 4),
            ('3-MEDIUM', 'standard', 3),
            ('4-NOT SPECIFIED', 'standard', 2),
            ('5-LOW', 'deferred', 1)) AS dim(priority, category, weight)
"""


def read_priority_dim(spark: SparkSession) -> DataFrame:
    """S5: CSV dimension read with an explicit schema (never infer in
    production — inference is a full extra pass and can flip types
    between runs)."""
    return spark.read.csv(
        PRIORITY_DIM_CSV,
        header=True,
        schema="priority string, category string, weight int",
    )


@register(
    "s5_csv_dim_broadcast_join",
    oracle=f"""
    SELECT category,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * weight) AS DOUBLE)
             AS weighted_revenue
    FROM orders JOIN {_DIM_VALUES}
      ON o_orderpriority = priority
    GROUP BY category
    ORDER BY category
    """,
    tags=("S5", "J14", "A5"),
)
def s5_csv_dim_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV dim (ro.csv analog) broadcast-joined to the fact table
    (certification-usage.Rmd:25-38 keeps ro.csv client-side; the Spark
    version broadcasts the 5-row dim so the join never shuffles the
    fact side). Weighted sum via exact decimal so partitioning cannot
    perturb the double result."""
    o = load_table(spark, sf_dir, "orders")
    dim = read_priority_dim(spark)
    return (
        o.join(F.broadcast(dim), o.o_orderpriority == dim.priority)
        .groupBy("category")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(dec("o_totalprice") * F.col("weight")).cast("double").alias(
                "weighted_revenue"
            ),
        )
        .orderBy("category")
    )


def partitioned_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize orders date-partitioned by order year — SURVEY §4's
    production layout for the fact tables (write_partitioned is the
    generic writer; this is its query-visible artifact). A reader
    filtering on the partition column never opens non-matching
    partition directories (PartitionFilters prune at planning), which
    at 100 TB is the difference between scanning one year and scanning
    the lake. Write-once per session via catalog.scratch_path_once."""
    from ..catalog import scratch_path_once

    def write(path: str) -> None:
        (
            load_table(spark, sf_dir, "orders")
            .withColumn("o_yr", F.year("o_orderdate"))
            .write.mode("overwrite")
            .partitionBy("o_yr")
            .parquet(path)
        )

    return spark.read.parquet(
        scratch_path_once(spark, sf_dir, "part_orders_by_yr", write)
    )


@register(
    "s9_partition_pruned_rollup",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders
    WHERE YEAR(o_orderdate) = 1997
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("S9", "S1", "A1", "SCALE"),
)
def s9_partition_pruned_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup over ONE partition of the date-partitioned orders layout:
    the o_yr = 1997 predicate resolves against the directory structure
    at plan time (PartitionFilters — asserted in tests/test_plans.py),
    so the scan never opens the other years' files. Partitioning never
    changes content, so the oracle is the equivalent filter on the raw
    table."""
    po = partitioned_orders(spark, sf_dir)
    return (
        po.filter(F.col("o_yr") == 1997)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(dec("o_totalprice")).cast("double").alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


# One SQL text, two engines: the S1 "SQL surface" artifact. The body is
# written in the ANSI subset both dialects execute identically; only
# the table identifier is templated (Spark reads a per-scale temp view,
# DuckDB its pre-registered view of the same parquet).
_PORTABLE_SQL = """
    SELECT o_orderpriority,
           YEAR(o_orderdate) AS yr,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM {orders}
    WHERE o_orderstatus <> 'P'
    GROUP BY o_orderpriority, YEAR(o_orderdate)
    ORDER BY o_orderpriority, yr
"""


@register(
    "s1_portable_sql_rollup",
    oracle=_PORTABLE_SQL.format(orders="orders"),
    tags=("S1", "A1", "F2"),
)
def s1_portable_sql_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spark.sql(...) text surface, differentially proven: the SAME
    SQL string (modulo the table identifier) runs on Spark and on the
    DuckDB oracle and must hash-match — pinning that the engine's SQL
    dialect handling (YEAR on timestamp_ntz, DECIMAL sum contract,
    multi-key ORDER BY) agrees with ANSI semantics, not just the
    DataFrame API. The view name carries the scale tag so sessions
    mixing scale factors (bench warmup vs timed) can never cross-bind."""
    import hashlib

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    view = f"orders_sql_{tag}"
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(view)
    return spark.sql(_PORTABLE_SQL.format(orders=view))
