"""Bucketing (SURVEY §4: bucket exports by join key so repeated key
joins skip the shuffle). Writes orders+lineitem bucketed by order key
and asserts the join plan has NO shuffle on either side."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from appeals_data_spark.catalog import load_table

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    o = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem")
    (
        o.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .option("path", str(wh / "orders_b"))
        .saveAsTable("orders_b")
    )
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .option("path", str(wh / "lineitem_b"))
        .saveAsTable("lineitem_b")
    )
    yield spark.table("orders_b"), spark.table("lineitem_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    o_b, li_b = bucketed
    # Save/restore the SESSION's tuned threshold (64m) — hardcoding the
    # stock default here once leaked a 10m threshold into every later
    # module-scoped plan fixture and flipped broadcast joins to SMJ.
    orig_abt = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li_b.join(o_b, li_b.l_orderkey == o_b.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count("*").alias("n"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-bucketed scan-to-scan join: the only exchange allowed is
        # the one feeding the final aggregation
        join_part = plan.split("SortMergeJoin")[-1] if "SortMergeJoin" in plan else plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert join_part.count("Exchange") == 0, plan
        # result parity with the unbucketed join
        o = load_table(spark, SF_SMOKE, "orders")
        li = load_table(spark, SF_SMOKE, "lineitem")
        want = sorted(
            tuple(r)
            for r in li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
            .collect()
        )
        assert sorted(tuple(r) for r in joined.collect()) == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", orig_abt)
