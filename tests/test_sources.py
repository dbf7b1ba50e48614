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


def test_claims_ingest_exchange_roundtrip(spark, tmp_path):
    """S6 external exchange: raw BGS-format CSV (M/D/YYYY strings,
    suffixed corlids) -> normalized, month-partitioned parquet."""
    from appeals_data_spark.sources import CLAIMS_COLUMNS, ingest_claims_csv

    csv = tmp_path / "claims.csv"
    blank = [""] * 14  # cols 4..17 and 19.. unused by this test
    rows = [
        ",".join(CLAIMS_COLUMNS),
        ",".join(["123456S", "bc1", "3/7/1996"] + blank[:14] + ["10/2/1996", "jo1", "397", "", ""]),
        ",".join(["98765C", "bc2", "12/31/1995"] + blank[:14] + ["1/6/1996", "jo2", "316", "", ""]),
    ]
    csv.write_text("\n".join(rows) + "\n")
    out = str(tmp_path / "claims_pq")
    claims = ingest_claims_csv(spark, str(csv), out_path=out)

    got = {r["benefit_claim_id"]: r for r in claims.collect()}
    assert dict(claims.dtypes)["claim_receive_date"] == "date"
    assert str(got["bc1"]["claim_receive_date"]) == "1996-03-07"
    assert got["bc1"]["file_number"] == "00123456"
    assert got["bc1"]["corlid_suffix"] == "S"
    assert got["bc1"]["is_amc"] is True
    assert got["bc2"]["file_number"] == "00098765"
    assert got["bc2"]["is_amc"] is False
    # landed layout is month-partitioned for date-window pruning
    assert any("receive_month=" in str(p) for p in (tmp_path / "claims_pq").iterdir())


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
