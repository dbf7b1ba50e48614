"""Accuracy audit of the approximate aggregates the engine recommends
at 100 TB (the docstrings of A3/A7/A14 point to them): the approximate
answer must sit inside a known tolerance of the exact answer on the
fixtures, so swapping exact -> approx at scale is a measured decision,
not a leap.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from appeals_data_spark.catalog import load_table

from conftest import SF_SMOKE


def test_approx_count_distinct_within_rsd(spark):
    o = load_table(spark, SF_SMOKE, "orders")
    row = o.agg(
        F.countDistinct("o_custkey").alias("exact"),
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx"),
    ).first()
    # HLL++ with rsd=0.02: allow 3 relative standard deviations
    assert abs(row["approx"] - row["exact"]) <= 0.06 * row["exact"]


def test_approx_percentile_within_band(spark):
    o = load_table(spark, SF_SMOKE, "orders")
    row = o.agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("exact_p50"),
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("approx_p50"),
        F.expr("percentile(o_totalprice, 0.95)").alias("exact_p95"),
        F.percentile_approx("o_totalprice", 0.95, 10000).alias("approx_p95"),
    ).first()
    # accuracy=10000 -> rank error <= n/10000; on these fixtures the
    # value gap at that rank distance stays within 1% of the exact value
    assert abs(row["approx_p50"] - row["exact_p50"]) <= 0.01 * row["exact_p50"]
    assert abs(row["approx_p95"] - row["exact_p95"]) <= 0.01 * row["exact_p95"]


def test_approx_rank_selection_matches_exact_neighborhood(spark):
    # A14's scale alternative: instead of a global row_number sort to
    # find the k-th oldest pending date, take the quantile at k/n.
    o = load_table(spark, SF_SMOKE, "orders").filter(F.col("o_orderstatus") == "O")
    n = o.count()
    k = min(100, n)
    exact = (
        o.select(F.col("o_orderdate").cast("date").alias("d"))
        .orderBy("d")
        .limit(k)
        .collect()[-1]["d"]
    )
    approx = o.agg(
        F.percentile_approx(
            F.col("o_orderdate").cast("timestamp").cast("long"), k / n, 10000
        ).alias("q")
    ).first()["q"]
    import datetime

    approx_d = datetime.datetime.fromtimestamp(approx, datetime.timezone.utc).date()
    assert abs((approx_d - exact).days) <= 7


def test_hll_sketch_partials_merge_to_whole(spark):
    # The mergeable-sketch contract that makes distinct counts shardable
    # at 100 TB: per-shard HLL sketches unioned give the IDENTICAL
    # register state (elementwise max) as one pass over the whole
    # stream, so the estimate is exactly reproducible under any
    # partitioning / shard topology.
    o = load_table(spark, SF_SMOKE, "orders")
    whole = o.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias("e")
    ).first()["e"]
    merged = (
        o.withColumn("shard", F.col("o_orderkey") % 8)
        .groupBy("shard")
        .agg(F.hll_sketch_agg("o_custkey").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"))
        .first()["e"]
    )
    assert merged == whole
