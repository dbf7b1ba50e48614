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
