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


def test_orc_roundtrip(spark, tmp_path):
    # ORC is the other built-in columnar lake format (S9's parquet
    # twin); a 100 TB deployment on an ORC lake reads/writes through
    # the identical DataFrame surface.
    src = load_table(spark, SF_SMOKE, "orders")
    out = str(tmp_path / "orders_orc")
    src.write.orc(out)
    back = spark.read.orc(out)
    assert back.schema == src.schema
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


def test_ts_storage_generations_normalize_identically(spark, tmp_path):
    """The driver regenerates testdata between rounds and the events ts
    column has shipped BOTH as INT64 TIMESTAMP(NANOS) and as plain
    timestamp[us]. Pin that catalog.load_table and event_stream
    normalize the two storage generations to the same instants, so a
    fixture regeneration can never silently shift event times again."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from appeals_data_spark.catalog import _READ_CACHE, load_table
    from appeals_data_spark.streaming.event_stream import event_stream

    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    stamps = [base, base + dt.timedelta(minutes=90), None]
    cols = {
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "user_id": pa.array([10, 10, 11], pa.int64()),
        "event_type": pa.array(["click", "view", "click"]),
        "value": pa.array([1.0, 2.0, 3.0]),
        "props": pa.array(["{}", "{}", "{}"]),
    }
    gen_dirs = {}
    for gen, unit in (("nanos", "ns"), ("micros", "us")):
        d = tmp_path / gen
        d.mkdir()
        tbl = pa.table({**cols, "ts": pa.array(stamps, pa.timestamp(unit))})
        pq.write_table(tbl, d / "events.parquet")
        gen_dirs[gen] = str(d)

    def batch_rows(sf_dir):
        df = load_table(spark, sf_dir, "events")
        assert dict(df.dtypes)["ts"] == "timestamp_ntz"
        return sorted(
            (r["event_id"], r["ts"]) for r in df.select("event_id", "ts").collect()
        )

    try:
        a, b = batch_rows(gen_dirs["nanos"]), batch_rows(gen_dirs["micros"])
        assert a == b
        assert a[0][1] == base  # instants preserved, not shifted 1000x

        def stream_rows(sf_dir):
            from appeals_data_spark.streaming.event_stream import run_to_memory

            out = run_to_memory(
                spark,
                event_stream(spark, sf_dir).select("event_id", "ts"),
                f"t_gen_{sf_dir.split('/')[-1]}",
                output_mode="append",
            )
            return sorted((r["event_id"], r["ts"]) for r in out.collect())

        sa, sb = stream_rows(gen_dirs["nanos"]), stream_rows(gen_dirs["micros"])
        assert sa == sb
    finally:
        # purge per-(session, dir) read cache entries for the temp dirs
        for k in [k for k in _READ_CACHE if k[1] in gen_dirs.values()]:
            _READ_CACHE.pop(k)
