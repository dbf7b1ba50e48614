"""S5/S9 source-and-sink coverage: CSV dim read, sink round-trips,
partitioned layout with partition pruning."""

from __future__ import annotations

import pyspark.sql.functions as F

from appeals_data_spark.catalog import load_table
from appeals_data_spark.queries.sources_q import read_priority_dim

from conftest import SF_SMOKE


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_csv_dim_schema(spark):
    dim = read_priority_dim(spark)
    assert dim.columns == ["priority", "category", "weight"]
    assert dict(dim.dtypes)["weight"] == "int"
    assert dim.count() == 5


def test_parquet_roundtrip(spark, tmp_path):
    src = load_table(spark, SF_SMOKE, "orders")
    out = str(tmp_path / "orders_rt")
    src.write.parquet(out)
    back = spark.read.parquet(out)
    assert _sorted_rows(back) == _sorted_rows(src)


def test_csv_roundtrip_with_schema(spark, tmp_path):
    src = load_table(spark, SF_SMOKE, "nation")
    out = str(tmp_path / "nation_csv")
    src.write.option("header", True).csv(out)
    back = spark.read.csv(out, header=True, schema=src.schema)
    assert _sorted_rows(back) == _sorted_rows(src)


def test_partitioned_write_prunes(spark, tmp_path):
    """Date-partitioned layout (catalog.write_partitioned story): a
    month filter must prune to that partition's files only."""
    src = load_table(spark, SF_SMOKE, "orders").withColumn(
        "o_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    out = str(tmp_path / "orders_part")
    src.write.partitionBy("o_month").parquet(out)
    back = spark.read.parquet(out)
    one_month = back.filter(F.col("o_month") == "1995-03")
    plan = one_month._jdf.queryExecution().executedPlan().toString()
    # the equality predicate must reach the scan as a partition filter
    # (directory-level pruning), not a post-scan data filter
    assert "PartitionFilters" in plan and "1995-03" in plan.split("PartitionFilters", 1)[1][:200]
    assert one_month.count() == src.filter(F.col("o_month") == "1995-03").count()
