"""Gates for operators.range_join.binned_point_in_interval_join — the
pair-payload path of the large×large non-equi family (j22's registered
query takes the coverage-aggregation shortcut; the binned operator is
what pair-carrying semantics use, so it gets its own differential)."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from appeals_data_spark.operators.range_join import (
    binned_point_in_interval_join,
)


def _frames(spark, n_pts=300, n_ivs=200, seed=7):
    rng = random.Random(seed)
    d0 = dt.date(1995, 1, 1)
    pts = [
        (i, d0 + dt.timedelta(days=rng.randint(0, 400)))
        for i in range(n_pts)
    ]
    ivs = []
    for i in range(n_ivs):
        s = d0 + dt.timedelta(days=rng.randint(0, 400))
        ivs.append((1000 + i, s, s + dt.timedelta(days=rng.randint(0, 7))))
    p = spark.createDataFrame(pts, "p_key long, p_date date")
    v = spark.createDataFrame(ivs, "i_key long, s date, e date")
    return p, v, pts, ivs


def test_binned_join_matches_naive_pairs(spark):
    p, v, pts, ivs = _frames(spark)
    got = sorted(
        (r["p_key"], r["i_key"])
        for r in binned_point_in_interval_join(
            p, v, "p_date", "s", "e", 8
        ).collect()
    )
    want = sorted(
        (pk, ik)
        for pk, pd in pts
        for ik, s, e in ivs
        if s <= pd <= e
    )
    assert got == want and len(want) > 100


def test_binned_join_no_duplicate_pairs_and_carries_payload(spark):
    p, v, _, _ = _frames(spark, seed=11)
    out = binned_point_in_interval_join(p, v, "p_date", "s", "e", 8)
    assert set(out.columns) == {"p_key", "p_date", "i_key", "s", "e"}
    n = out.count()
    nd = out.distinct().count()
    assert n == nd  # each point lives in exactly one bin -> no dupes


def test_interval_fanout_bounded_by_two_bins(spark):
    p, v, _, _ = _frames(spark)
    fan = (
        v.select(
            (
                F.floor(F.datediff("e", F.lit("1990-01-01").cast("date")) / 8)
                - F.floor(F.datediff("s", F.lit("1990-01-01").cast("date")) / 8)
                + 1
            ).alias("bins")
        )
        .agg(F.max("bins"))
        .collect()[0][0]
    )
    assert fan <= 2  # bin width >= interval length -> bounded replication


def test_reversed_interval_dropped_not_exploded(spark):
    """A reversed interval (end before start) satisfies no point and
    must be filtered before the bin explode: F.sequence's default -1
    step would otherwise generate one row per bin SPANNED (a
    years-reversed interval balloons into hundreds of rows that the
    residual filter then throws away)."""
    p = spark.createDataFrame(
        [(1, dt.date(1995, 6, 1))], "p_key long, p_date date"
    )
    v = spark.createDataFrame(
        [
            (10, dt.date(1995, 5, 30), dt.date(1995, 6, 3)),  # valid
            (11, dt.date(1999, 1, 1), dt.date(1992, 1, 1)),   # reversed
        ],
        "i_key long, s date, e date",
    )
    out = binned_point_in_interval_join(p, v, "p_date", "s", "e", 8)
    assert [r["i_key"] for r in out.collect()] == [10]
    # and the exploded interval side never materializes the reversed
    # row at all (fan-out stays <= 2 per interval)
    ivs = v.filter(F.col("s") <= F.col("e")).withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.datediff("s", F.lit("1990-01-01").cast("date")) / 8),
                F.floor(F.datediff("e", F.lit("1990-01-01").cast("date")) / 8),
            )
        ),
    )
    assert ivs.count() <= 2
