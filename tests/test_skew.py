"""Salted join / two-phase aggregation must be result-identical to the
plain forms (salting only changes the physical distribution)."""

from __future__ import annotations

import pyspark.sql.functions as F

from appeals_data_spark.catalog import load_table
from appeals_data_spark.operators.skew import salted_groupby, salted_join

from conftest import SF_SMOKE


def _sorted(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_matches_plain(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_orderpriority")
    plain = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_linenumber", "o_orderpriority"
    )
    salted = salted_join(
        li.withColumnRenamed("l_orderkey", "k"),
        o.withColumnRenamed("o_orderkey", "k"),
        key="k",
        discriminator="l_linenumber",
        buckets=8,
    ).select(F.col("k").alias("l_orderkey"), "l_linenumber", "o_orderpriority")
    assert _sorted(salted) == _sorted(plain)


def test_salted_groupby_matches_plain(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    plain = li.groupBy("l_returnflag").agg(
        F.count("l_quantity").alias("count_l_quantity"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_q"),
        F.min("l_shipdate").alias("min_l_shipdate"),
    )
    salted = salted_groupby(
        li.withColumn("q", F.col("l_quantity").cast("decimal(18,2)")),
        key="l_returnflag",
        discriminator="l_orderkey",
        aggs={"l_quantity": "count", "q": "sum", "l_shipdate": "min"},
        buckets=8,
    )
    got = {r["l_returnflag"]: (r["count_l_quantity"], r["sum_q"], r["min_l_shipdate"]) for r in salted.collect()}
    want = {r["l_returnflag"]: (r["count_l_quantity"], r["sum_q"], r["min_l_shipdate"]) for r in plain.collect()}
    assert got == want
