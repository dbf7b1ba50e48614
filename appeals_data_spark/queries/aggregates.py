"""Aggregation family (SURVEY.md §2.4 A1-A15).

Reference shapes re-expressed over the synthetic star schema. Each
query carries its DuckDB oracle; money sums go through exact decimal
(see functions.scalars) so hashes match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions.scalars import (
    SQL_CHARGE,
    SQL_DISC_PRICE,
    SQL_DSUM,
    charge,
    davg,
    disc_price,
    dsum,
    fiscal_year,
    month_trunc,
    ratio_dbl,
    sql_ratio_dbl,
)
from ..registry import register


@register(
    "a1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {SQL_DSUM.format(col='l_quantity')} AS sum_qty,
           {SQL_DSUM.format(col='l_extendedprice')} AS sum_base_price,
           CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS sum_disc_price,
           CAST(SUM({SQL_CHARGE}) AS DOUBLE) AS sum_charge,
           {SQL_DSUM.format(col='l_quantity')} / COUNT(l_quantity) AS avg_qty,
           {SQL_DSUM.format(col='l_extendedprice')} / COUNT(l_extendedprice) AS avg_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2018-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("A1", "A5", "P4"),
    bench=True,
)
def a1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: the flagship scan+agg.

    Reference analog: grouped milestone summaries over BRIEFF
    (e.g. scratch/decisions/fte.R:62-67). One scan, map-side partial
    aggregation, 2-key groupBy — at 100 TB this is a pure
    scan-throughput query; no join, no skew risk.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2018-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price()).cast("double").alias("sum_disc_price"),
            F.sum(charge()).cast("double").alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "a2_conditional_agg_flags",
    oracle="""
    SELECT o_orderpriority,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_finished,
           COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open,
           COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_pending,
           COUNT(CASE WHEN o_totalprice > 200000 THEN 1 END) AS n_big,
           COUNT(*) AS n_total
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("A2",),
)
def a2_conditional_agg_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivoted conditional counts in one pass — the reference's 16-flag
    `count(case when ...)` idiom (amc-ro-classification.Rmd:53-161)."""
    o = load_table(spark, sf_dir, "orders")
    cnt = lambda c: F.count(F.when(c, 1))  # noqa: E731
    return (
        o.groupBy("o_orderpriority")
        .agg(
            cnt(F.col("o_orderstatus") == "F").alias("n_finished"),
            cnt(F.col("o_orderstatus") == "O").alias("n_open"),
            cnt(F.col("o_orderstatus") == "P").alias("n_pending"),
            cnt(F.col("o_totalprice") > 200000).alias("n_big"),
            F.count("*").alias("n_total"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "a3_distinct_counts",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(DISTINCT DATE_TRUNC('month', o_orderdate)) AS n_months
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    tags=("A3", "A12"),
)
def a3_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counts per group (reference `count(distinct BFKEY)`,
    reader-pilot.R:18). At 100 TB prefer approx_count_distinct unless
    exactness is contractual — both are one shuffle; exact carries the
    distinct-expand cost."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.countDistinct(month_trunc("o_orderdate")).alias("n_months"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "a6_rate_vs_group_total",
    oracle="""
    WITH m AS (
      SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month, o_orderstatus, COUNT(*) AS n
      FROM orders GROUP BY 1, 2
    )
    SELECT month, o_orderstatus, n,
           CAST(SUM(n) OVER (PARTITION BY month) AS BIGINT) AS total,
           CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY month) AS rate
    FROM m
    ORDER BY month, o_orderstatus
    """,
    tags=("A6", "W8"),
)
def a6_rate_vs_group_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-then-rate against the group total — certification-usage.Rmd:40-46.
    Two-level aggregation: groupBy then a partition-total window (no
    second shuffle: window reuses the groupBy hash partitioning)."""
    o = load_table(spark, sf_dir, "orders")
    m = (
        o.groupBy(
            month_trunc("o_orderdate").alias("month"), F.col("o_orderstatus")
        ).agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("month")
    return (
        m.withColumn("total", F.sum("n").over(w))
        .withColumn("rate", F.col("n").cast("double") / F.col("total"))
        .orderBy("month", "o_orderstatus")
    )


@register(
    "a7_quantile_summary",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5)  AS p50_qty,
           quantile_cont(l_quantity, 0.25) AS p25_qty,
           quantile_cont(l_quantity, 0.75) AS p75_qty,
           CAST(MAX(l_quantity) AS DOUBLE) AS max_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("A7",),
)
def a7_quantile_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles (reference median/quantile summaries,
    impact.R:277-298). Quantities are integer-valued and probs are
    binary fractions, so interpolation is exact in both engines.
    At 100 TB swap to approx_percentile (t-digest) — same API shape."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, 0.5)").alias("p50_qty"),
            F.expr("percentile(l_quantity, 0.25)").alias("p25_qty"),
            F.expr("percentile(l_quantity, 0.75)").alias("p75_qty"),
            F.max("l_quantity").cast("double").alias("max_qty"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "a8_crosstab",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("A8",),
)
def a8_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency table in long form (reference `table(actual, pred)`,
    amc-ro-classification.Rmd:266-272)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"))
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "a9_pivot_agg",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus='F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS status_f,
           CAST(SUM(CASE WHEN o_orderstatus='O' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS status_o,
           CAST(SUM(CASE WHEN o_orderstatus='P' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS status_p
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("A9", "R2"),
)
def a9_pivot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D pivot aggregation (reference `tapply` median-by-two-dims,
    time-to-ep.Rmd:145). Explicit pivot values keep it one pass (no
    distinct-values pre-job) — required practice at scale."""
    o = load_table(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"))
    )
    # lowercase names: avoid any case-normalization ambiguity downstream
    return piv.select(
        "o_orderpriority",
        F.col("F").alias("status_f"),
        F.col("O").alias("status_o"),
        F.col("P").alias("status_p"),
    ).orderBy("o_orderpriority")


@register(
    "a10_listagg",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
    tags=("A10",),
)
def a10_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation — Oracle `listagg` (the-david-ames-
    query.R:220-225) as collect_list -> array_sort -> concat_ws."""
    n = load_table(spark, sf_dir, "nation")
    return (
        n.groupBy("n_regionkey")
        .agg(F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("nations"))
        .orderBy("n_regionkey")
    )


@register(
    "a12_monthly_rollup",
    oracle=f"""
    SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month,
           COUNT(*) AS n_orders,
           {SQL_DSUM.format(col='o_totalprice')} AS revenue
    FROM orders
    GROUP BY 1
    ORDER BY month
    """,
    tags=("A12", "F2"),
    bench=True,
)
def a12_monthly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily->monthly rollup (fte.R:62-73). At scale: the month key is
    low-cardinality -> partial aggregation collapses almost everything
    map-side before the shuffle."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(month_trunc("o_orderdate").alias("month"))
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("revenue"))
        .orderBy("month")
    )


@register(
    "a13_histogram",
    oracle="""
    SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bucket, COUNT(*) AS n
    FROM orders
    GROUP BY 1
    ORDER BY bucket
    """,
    tags=("A13",),
)
def a13_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram binning (docket-order.R:69-75)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.floor(F.col("o_totalprice") / 50000).alias("bucket"))
        .agg(F.count("*").alias("n"))
        .orderBy("bucket")
    )


@register(
    "a14_ranked_selection",
    oracle="""
    SELECT o_orderkey, o_orderdate, rn FROM (
      SELECT o_orderkey, o_orderdate,
             ROW_NUMBER() OVER (ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders WHERE o_orderstatus = 'O'
    ) WHERE rn = 100
    """,
    tags=("A14", "O3"),
)
def a14_ranked_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-th element by rank — the reference's docket-line computation
    ("date of the 4000th pending case", docket-model.R:285-293).
    ranked_head plans orderBy+limit as TakeOrderedAndProject
    (per-partition top-k heads, driver merge) instead of funneling the
    filtered projection through one task's global sort — same rows,
    same ranks, no single-reducer stage (round 10)."""
    from ..operators.rank import ranked_head

    o = load_table(spark, sf_dir, "orders")
    return ranked_head(
        o.filter(F.col("o_orderstatus") == "O").select(
            "o_orderkey", "o_orderdate"
        ),
        100,
        ["o_orderdate", "o_orderkey"],
        rank_name="rn",
    ).filter(F.col("rn") == 100)


@register(
    "a15_fiscal_year_summary",
    oracle=f"""
    SELECT {"YEAR(o_orderdate + INTERVAL 3 MONTH)"} AS fy,
           COUNT(*) AS n_orders,
           {SQL_DSUM.format(col='o_totalprice')} AS revenue
    FROM orders
    GROUP BY 1
    ORDER BY fy
    """,
    tags=("A12", "F4", "W10"),
)
def a15_fiscal_year_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fiscal-year bucketing (F4: `findInterval` Oct-1 years ->
    year(date + 3 months))."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(fiscal_year("o_orderdate").alias("fy"))
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("revenue"))
        .orderBy("fy")
    )


@register(
    "a15_interval_overlap_months",
    oracle="""
    WITH months AS (
      SELECT CAST(gs AS DATE) AS month_start,
             CAST(gs + INTERVAL 1 MONTH AS DATE) AS month_end
      FROM generate_series(DATE '1995-01-01', DATE '2001-08-01',
                           INTERVAL 1 MONTH) AS t(gs)
    ), spans AS (
      SELECT CAST(o_orderdate AS DATE) AS o_start,
             CAST(o_orderdate AS DATE) + 30 AS o_end
      FROM orders
    )
    SELECT month_start,
           CAST(SUM(GREATEST(0, date_diff('day',
                 GREATEST(month_start, o_start),
                 LEAST(month_end, o_end)))) AS BIGINT) AS active_order_days
    FROM months JOIN spans
      ON o_start < month_end AND o_end > month_start
    GROUP BY month_start
    ORDER BY month_start
    """,
    tags=("A15", "J17", "F3"),
)
def a15_interval_overlap_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap aggregation (fte.R:45-55 FTE = sum of
    month x tenure overlaps): month grid joined to 30-day order spans
    with greatest/least clamp arithmetic. The grid (~80 rows) is
    broadcast, so the range join is a broadcast nested-loop over a
    tiny side — linear in |orders| at any scale."""
    o = load_table(spark, sf_dir, "orders")
    months = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-01-01").cast("date"),
                F.lit("2001-08-01").cast("date"),
                F.expr("interval 1 month"),
            )
        ).alias("month_start")
    ).select("month_start", F.add_months("month_start", 1).alias("month_end"))
    spans = o.select(
        F.col("o_orderdate").cast("date").alias("o_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("o_end"),
    )
    overlap = F.greatest(
        F.lit(0),
        F.datediff(
            F.least("month_end", "o_end"),
            F.greatest("month_start", "o_start"),
        ),
    )
    return (
        F.broadcast(months)
        .join(spans, (F.col("o_start") < F.col("month_end")) & (F.col("o_end") > F.col("month_start")))
        .groupBy("month_start")
        .agg(F.sum(overlap).alias("active_order_days"))
        .orderBy("month_start")
    )


@register(
    "a16_cube_rollup",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus, o_orderpriority) AS gid,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    tags=("A1", "A9", "S1"),
)
def a16_cube_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets: every (status, priority) margin plus the
    grand total in ONE pass, disambiguated by grouping_id — the OLAP
    rollup surface (Spark expands the cube into an Expand node feeding
    a single hash aggregate, so the fact table is still scanned and
    shuffled once, not once per grouping set). Money totals through
    the exact-decimal contract; grouping_id bit order (first key =
    high bit) agrees between Spark and DuckDB's GROUPING().

    Scale note: a d-key cube multiplies the aggregate input 2^d-fold
    inside Expand — at 100 TB keep d small or split rare margins into
    explicit grouping sets; 2 keys is the sweet spot."""
    from ..functions.scalars import dec

    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n"),
            F.sum(dec("o_totalprice")).cast("double").alias("total_price"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "n", "total_price")
        .orderBy(
            "gid",
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@register(
    "a18_incremental_rollup",
    oracle=f"""
    SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month,
           COUNT(*) AS n_orders,
           {SQL_DSUM.format(col='o_totalprice')} AS revenue
    FROM orders
    GROUP BY 1
    ORDER BY month
    """,
    tags=("A12", "S9", "X1"),
)
def a18_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance of the monthly rollup: partial
    aggregates for months before the cutoff are MATERIALIZED once
    (parquet scratch, session-private via catalog.scratch_path_once —
    the "view state"), and each refresh aggregates only the delta
    rows and merges by re-aggregating the unioned partials — the
    lakehouse pattern where 100 TB of history is never rescanned,
    only the live partition. The oracle is the FULL recompute, so the
    driver check proves merge(state, delta) == recompute exactly:
    decimal partial sums are associative, which is precisely why the
    money contract (functions.scalars) uses them.

    Partial-aggregate state is (month, n_orders, rev DECIMAL): count
    merges by SUM, decimal sums merge exactly under any regrouping;
    the cutoff is a month boundary here but the merge re-aggregation
    stays correct for mid-month cutoffs too."""
    from ..catalog import scratch_path_once
    from ..functions.scalars import dec

    cutoff = "1998-01-01"
    o = load_table(spark, sf_dir, "orders")

    def monthly(df):
        return df.groupBy(month_trunc("o_orderdate").alias("month")).agg(
            F.count("*").alias("n_orders"),
            F.sum(dec("o_totalprice")).alias("rev"),
        )

    def write(path: str) -> None:
        monthly(o.filter(F.col("o_orderdate") < cutoff)).write.mode(
            "overwrite"
        ).parquet(path)

    history = spark.read.parquet(
        scratch_path_once(spark, sf_dir, "mv_monthly_rollup", write)
    )
    delta = monthly(o.filter(F.col("o_orderdate") >= cutoff))
    return (
        history.unionByName(delta)
        .groupBy("month")
        .agg(
            F.sum("n_orders").cast("long").alias("n_orders"),
            F.sum("rev").cast("double").alias("revenue"),
        )
        .orderBy("month")
    )


@register(
    "a20_retention_cohorts",
    oracle="""
    WITH cohorts AS (
      SELECT user_id,
             CAST(DATE_TRUNC('month', MIN(ts)) AS DATE) AS cohort_month
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT user_id,
             CAST(DATE_TRUNC('month', ts) AS DATE) AS act_month
      FROM events
    ), indexed AS (
      SELECT c.cohort_month,
             (YEAR(a.act_month) * 12 + MONTH(a.act_month))
               - (YEAR(c.cohort_month) * 12 + MONTH(c.cohort_month)) AS k,
             a.user_id
      FROM activity a JOIN cohorts c USING (user_id)
    ), counts AS (
      SELECT cohort_month, k, COUNT(DISTINCT user_id) AS n_active
      FROM indexed WHERE k BETWEEN 0 AND 12 GROUP BY cohort_month, k
    )
    SELECT cohort_month, CAST(k AS BIGINT) AS k,
           n_active,
           MAX(CASE WHEN k = 0 THEN n_active END)
             OVER (PARTITION BY cohort_month) AS n_cohort,
           CAST(n_active AS DOUBLE)
             / MAX(CASE WHEN k = 0 THEN n_active END)
                 OVER (PARTITION BY cohort_month) AS retention
    FROM counts
    ORDER BY cohort_month, k
    """,
    tags=("A12", "A3", "W8"),
)
def a20_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The retention triangle: users cohorted by first-activity month,
    distinct-active counts at month offsets 0..12, and retention as a
    share of the cohort's month-0 size — the standard cohort-analysis
    rollup (the A12 monthly machinery composed with A3 distinct counts
    and the W8 rate-vs-group-total shape).

    Scale shape: first-touch min(ts), the distinct (user, month)
    dedup, and the cohort join all key on user_id, so the three
    user-keyed stages reuse one hash partitioning; only the final
    (cohort, k) count shuffles differently, and it is #cohorts x 13
    rows. Retention is a division of two exact integers — identical
    doubles on both engines with no rounding step."""
    e = load_table(spark, sf_dir, "events")
    cohorts = e.groupBy("user_id").agg(
        F.date_trunc("month", F.min("ts")).cast("date").alias("cohort_month")
    )
    activity = e.select(
        "user_id", F.date_trunc("month", "ts").cast("date").alias("act_month")
    ).distinct()
    mnum = lambda c: F.year(c) * 12 + F.month(c)  # noqa: E731
    indexed = activity.join(cohorts, "user_id").select(
        "cohort_month",
        (mnum(F.col("act_month")) - mnum(F.col("cohort_month"))).alias("k"),
        "user_id",
    )
    counts = (
        indexed.filter(F.col("k").between(0, 12))
        .groupBy("cohort_month", "k")
        .agg(F.count_distinct("user_id").alias("n_active"))
    )
    w = Window.partitionBy("cohort_month")
    n0 = F.max(F.when(F.col("k") == 0, F.col("n_active"))).over(w)
    return (
        counts.select(
            "cohort_month",
            F.col("k").cast("long").alias("k"),
            "n_active",
            n0.alias("n_cohort"),
            (F.col("n_active").cast("double") / n0).alias("retention"),
        )
        .orderBy("cohort_month", "k")
    )


@register(
    "a21_sliding_mau",
    oracle="""
    WITH user_days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ), bounds AS (
      SELECT MIN(d) AS lo, MAX(d) AS hi FROM user_days
    ), contrib AS (
      SELECT user_id,
             UNNEST(generate_series(d, d + INTERVAL 27 DAY,
                                    INTERVAL 1 DAY)) AS g
      FROM user_days
    ), mau AS (
      SELECT CAST(g AS DATE) AS d, COUNT(DISTINCT user_id) AS mau
      FROM contrib GROUP BY 1
    ), dau AS (
      SELECT d, COUNT(*) AS dau FROM user_days GROUP BY d
    )
    SELECT m.d, COALESCE(a.dau, 0) AS dau, m.mau,
           CAST(COALESCE(a.dau, 0) AS DOUBLE) / m.mau AS stickiness
    FROM mau m LEFT JOIN dau a USING (d)
    WHERE m.d BETWEEN (SELECT lo FROM bounds) + INTERVAL 27 DAY
                  AND (SELECT hi FROM bounds)
    ORDER BY m.d
    """,
    tags=("A3", "J17", "A12"),
)
def a21_sliding_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 28-day active users (MAU) per day, with same-day DAU
    and the DAU/MAU stickiness ratio — the engagement rollup whose
    naive form (a distinct count per day over a sliding window) is
    quadratic. Spark-first shape: dedupe to (user, day) once, then
    each user-day CONTRIBUTES itself to the next 28 days via a
    map-side explode (the operators/pit.py strategy applied to
    distinct counting), so the only shuffles are the dedupe and the
    per-day distinct aggregation — no self-join, no per-day re-scan.
    Days before a full window has accumulated are trimmed using the
    observed date bounds. Counts are integer-exact; stickiness divides
    two identical integers on both engines."""
    e = load_table(spark, sf_dir, "events")
    user_days = e.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    contrib = user_days.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("d"),
                F.date_add(F.col("d"), 27),
                F.expr("interval 1 day"),
            )
        ).alias("g"),
    )
    mau = contrib.groupBy(F.col("g").alias("d")).agg(
        F.count_distinct("user_id").alias("mau")
    )
    dau = user_days.groupBy("d").agg(F.count("*").alias("dau"))
    bounds = user_days.agg(
        F.date_add(F.min("d"), 27).alias("lo"), F.max("d").alias("hi")
    )
    return (
        mau.join(dau, "d", "left")
        .join(F.broadcast(bounds))
        .filter(F.col("d").between(F.col("lo"), F.col("hi")))
        .select(
            "d",
            F.coalesce(F.col("dau"), F.lit(0)).alias("dau"),
            "mau",
            (
                F.coalesce(F.col("dau"), F.lit(0)).cast("double") / F.col("mau")
            ).alias("stickiness"),
        )
        .orderBy("d")
    )


@register(
    "a22_approx_quantile_bound",
    oracle="""
    SELECT o_orderpriority AS grp,
           COUNT(*) AS n,
           ROUND(quantile_cont(o_totalprice, 0.5), 6) AS exact_p50,
           TRUE AS approx_within_bound
    FROM orders
    GROUP BY grp ORDER BY grp
    """,
    tags=("A7", "APPROX"),
)
def a22_approx_quantile_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Certified approximate quantiles — the 100 TB scale path for A7:
    exact ``percentile`` needs a full sort/collect of each group, while
    ``percentile_approx`` (Greenwald-Khanna) streams in one pass with a
    mergeable sketch and a PROVEN rank-error bound of n/accuracy. The
    approximate VALUE itself is partitioning-dependent (sketch merges
    commute only up to the error bound), so it can't be hash-compared
    across engines; what IS deterministic is the certificate: with
    accuracy=100 (rank error <= 1%), the returned value's rank must
    land in [0.45n, 0.55n] (1% bound + 4% slack for duplicate mass).
    The query emits that certificate as a boolean next to the exact
    median, and the oracle pins the certificate TRUE and the exact
    median by value — so the driver's hash check fails if the sketch's
    bound is ever violated, without ever comparing the unstable
    approximate value. Pre-agg-then-join shape: sketch + exact in one
    grouped pass, rank count in a second, broadcast-joined (both
    aggregations partial)."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.col("o_totalprice").alias("x"),
    )
    stats = o.groupBy("grp").agg(
        F.count("*").alias("n"),
        F.expr("percentile(x, 0.5)").alias("exact_p50"),
        F.expr("percentile_approx(x, 0.5, 100)").alias("approx_p50"),
    )
    ranked = (
        o.join(F.broadcast(stats), "grp")
        .groupBy("grp")
        .agg(
            F.any_value("n").alias("n"),
            F.any_value("exact_p50").alias("exact_p50"),
            F.sum((F.col("x") < F.col("approx_p50")).cast("int")).alias("n_lt"),
            F.sum((F.col("x") <= F.col("approx_p50")).cast("int")).alias("n_le"),
        )
    )
    lo = F.floor(0.45 * F.col("n"))
    hi = F.ceil(0.55 * F.col("n"))
    return ranked.select(
        "grp",
        "n",
        F.round("exact_p50", 6).alias("exact_p50"),
        ((F.col("n_lt") <= hi) & (F.col("n_le") >= lo)).alias(
            "approx_within_bound"
        ),
    ).orderBy("grp")


@register(
    "a23_approx_distinct_bound",
    oracle="""
    SELECT o_orderpriority AS grp,
           COUNT(DISTINCT o_custkey) AS exact_distinct,
           TRUE AS approx_within_bound
    FROM orders
    GROUP BY grp ORDER BY grp
    """,
    tags=("A3", "APPROX"),
)
def a23_approx_distinct_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Certified approximate distinct counts — the A3 scale path:
    COUNT(DISTINCT) shuffles every distinct key, while
    ``approx_count_distinct`` (HyperLogLog++, rsd=0.05) is a mergeable
    fixed-size sketch with one partial-agg pass. As with
    a22_approx_quantile_bound, the sketch VALUE is not hash-comparable
    across engines — the emitted certificate is: |approx - exact| <=
    6 * rsd * exact, which the oracle pins TRUE next to the exact
    count. Six standard errors, not three: unlike a22's PROVEN GK rank
    bound, HLL++ error is probabilistic, and a 3-sigma certificate has
    a small but real chance of legitimately flipping on a fresh
    fixture or scale factor with no code regression. At 6 sigma a flip
    is (for practical purposes) always a real sketch-quality bug —
    precision misconfiguration, merge bug — while still ~3x tighter
    than the error of the next-coarser standard precision tier
    (rsd 0.05 -> 6 sigma = 30% vs rsd ~0.26 at the p=4 floor)."""
    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.countDistinct("o_custkey").alias("exact_distinct"),
        F.expr("approx_count_distinct(o_custkey, 0.05)").alias("approx_distinct"),
    )
    bound = 6 * 0.05 * F.col("exact_distinct")
    return agg.select(
        "grp",
        "exact_distinct",
        (
            F.abs(F.col("approx_distinct") - F.col("exact_distinct")) <= bound
        ).alias("approx_within_bound"),
    ).orderBy("grp")


@register(
    "a24_freq_items_bound",
    oracle=f"""
    WITH hh AS (
      SELECT o_orderpriority AS priority, COUNT(*) AS n,
             SUM(COUNT(*)) OVER () AS t
      FROM orders GROUP BY 1
    )
    SELECT priority, n,
           {sql_ratio_dbl("n", "t")} AS share,
           TRUE AS in_sketch
    FROM hh WHERE n > 0.15 * t ORDER BY priority
    """,
    tags=("A3", "APPROX"),
)
def a24_freq_items_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Certified frequent-items sketch — the third APPROX certificate
    next to a22 (GK quantiles) and a23 (HLL distinct): Spark's
    ``df.stat.freqItems`` (Karp-Shenker-Papadimitriou one-pass counter
    sketch, mergeable map-side) GUARANTEES no false negatives above
    the support threshold — every item with true frequency > s must
    appear in the sketch (false positives allowed). The emitted
    certificate is exactly that one-sided bound: for each EXACT heavy
    hitter (share > 0.15), a boolean that the sketch contains it. The
    oracle pins the exact counts/shares by value and the certificate
    TRUE — the sketch's (partition-order-dependent) false-positive
    tail is never compared, only its proven containment property, so
    the row is hash-stable on any fixture. At 100 TB the exact
    aggregation is one map-side-combinable pass; the sketch is the
    cheap pre-pass that bounds candidate keys before the exact count
    (mirror of the Bloom decontamination shape, for keys)."""
    o = load_table(spark, sf_dir, "orders")
    from pyspark.sql.window import Window

    hh = (
        o.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count("*").alias("n"))
        .withColumn("t", F.sum("n").over(Window.partitionBy()))
    )
    fi = o.select(F.col("o_orderpriority").alias("p")).stat.freqItems(
        ["p"], support=0.15
    )
    return (
        hh.filter(F.col("n") > 0.15 * F.col("t"))
        .crossJoin(F.broadcast(fi))
        .select(
            "priority",
            "n",
            # ratio-of-integer-counts: the measured ROUND(double, s)
            # tie-flip class (BASELINE.md round 9) — exact decimal
            # half-up, double final projection (round-11 migration)
            ratio_dbl(F.col("n"), F.col("t")).alias("share"),
            F.array_contains(F.col("p_freqItems"), F.col("priority")).alias(
                "in_sketch"
            ),
        )
        .orderBy("priority")
    )


def _cm_hash_sql(expr: str, j: str) -> str:
    from ..operators.dedup import sql_portable_hash48

    return f"({sql_portable_hash48(expr, j)}) % 512"


@register(
    "a25_countmin_bound",
    oracle=f"""
    WITH pos AS (
      SELECT o_custkey, 0 AS j,
             {_cm_hash_sql("CAST(o_custkey AS VARCHAR)", "0")} AS p
      FROM orders
      UNION ALL
      SELECT o_custkey, 1,
             {_cm_hash_sql("CAST(o_custkey AS VARCHAR)", "1")}
      FROM orders
      UNION ALL
      SELECT o_custkey, 2,
             {_cm_hash_sql("CAST(o_custkey AS VARCHAR)", "2")}
      FROM orders
    ), cm AS (
      SELECT j, p, COUNT(*) AS cnt FROM pos GROUP BY j, p
    ), exact AS (
      SELECT o_custkey, COUNT(*) AS c FROM orders GROUP BY o_custkey
    ), kpos AS (
      SELECT o_custkey, c, 0 AS j,
             {_cm_hash_sql("CAST(o_custkey AS VARCHAR)", "0")} AS p
      FROM exact
      UNION ALL
      SELECT o_custkey, c, 1,
             {_cm_hash_sql("CAST(o_custkey AS VARCHAR)", "1")}
      FROM exact
      UNION ALL
      SELECT o_custkey, c, 2,
             {_cm_hash_sql("CAST(o_custkey AS VARCHAR)", "2")}
      FROM exact
    ), est AS (
      SELECT k.o_custkey, k.c, MIN(cm.cnt) AS est
      FROM kpos k JOIN cm ON cm.j = k.j AND cm.p = k.p
      GROUP BY k.o_custkey, k.c
    )
    SELECT c AS exact_orders,
           COUNT(*) AS n_keys,
           CAST(SUM(CASE WHEN est < c THEN 1 ELSE 0 END) AS BIGINT)
             AS n_underestimates,
           CAST(SUM(est - c) AS BIGINT) AS total_overestimate,
           CAST(MAX(est - c) AS BIGINT) AS max_overestimate
    FROM est GROUP BY c ORDER BY exact_orders
    """,
    tags=("A3", "APPROX"),
)
def a25_countmin_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Certified Count-Min sketch (Cormode & Muthukrishnan 2005) — the
    fourth APPROX certificate next to a22 (GK quantiles), a23 (HLL
    distinct) and a24 (frequent items), and the only one whose sketch
    VALUES are fully hash-checked: the d=3 x w=512 counter array is
    built from the portable 48-bit hash family
    (operators.dedup.portable_hash48), which DuckDB reproduces
    bit-for-bit, so BOTH engines materialize the identical sketch and
    the identical per-key estimates — not just a boolean bound. The
    emitted report buckets every customer by exact order count and
    pins the CM contract: n_underestimates is structurally 0 (each
    row's counter >= the key's true count; min over rows preserves
    it), and the total/max overestimate quantify the collision mass
    at this (d, w, |keys|) operating point.

    Scale shape: the build is ONE map-side-combinable aggregation
    into d*w = 1536 cells regardless of stream size — the canonical
    mergeable sketch for per-key counts when the key universe is too
    big to shuffle; estimates join the broadcast cell table. The
    exact side (one groupBy) exists here only to certify."""
    from ..operators.dedup import portable_hash48

    o = load_table(spark, sf_dir, "orders")

    def positions(key: F.Column) -> F.Column:
        return F.array(*[
            F.pmod(portable_hash48(key.cast("string"), j), F.lit(512))
            for j in range(3)
        ])

    pos = o.select(
        F.posexplode(positions(F.col("o_custkey"))).alias("j", "p")
    )
    cm = pos.groupBy("j", "p").agg(F.count("*").alias("cnt")).localCheckpoint()
    exact = o.groupBy("o_custkey").agg(F.count("*").alias("c"))
    kpos = exact.select(
        "o_custkey",
        "c",
        F.posexplode(positions(F.col("o_custkey"))).alias("j", "p"),
    )
    est = (
        kpos.join(F.broadcast(cm), ["j", "p"])
        .groupBy("o_custkey", "c")
        .agg(F.min("cnt").alias("est"))
    )
    over = F.col("est") - F.col("c")
    return (
        est.groupBy(F.col("c").alias("exact_orders"))
        .agg(
            F.count("*").alias("n_keys"),
            F.sum((F.col("est") < F.col("c")).cast("int"))
            .cast("long")
            .alias("n_underestimates"),
            F.sum(over).cast("long").alias("total_overestimate"),
            F.max(over).cast("long").alias("max_overestimate"),
        )
        .orderBy("exact_orders")
    )


@register(
    "a26_hll_setops_bound",
    oracle="""
    WITH u AS (SELECT DISTINCT event_type, user_id FROM events),
    per AS (SELECT event_type, COUNT(*) AS n FROM u GROUP BY 1),
    inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS ni
      FROM u a JOIN u b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT pa.event_type AS type_a, pb.event_type AS type_b,
           CAST(pa.n AS BIGINT) AS exact_a,
           CAST(pb.n AS BIGINT) AS exact_b,
           CAST(pa.n + pb.n - COALESCE(i.ni, 0) AS BIGINT) AS exact_union,
           CAST(COALESCE(i.ni, 0) AS BIGINT) AS exact_intersect,
           TRUE AS union_within_bound,
           TRUE AS intersect_within_bound
    FROM per pa
    JOIN per pb ON pa.event_type < pb.event_type
    LEFT JOIN inter i
      ON i.type_a = pa.event_type AND i.type_b = pb.event_type
    ORDER BY type_a, type_b
    """,
    tags=("A3", "APPROX", "U2"),
)
def a26_hll_setops_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Certified sketch SET OPERATIONS — the fourth APPROX certificate
    (after a22 GK / a23 HLL++ / a24 freq-items / a25 Count-Min),
    extending the discipline from single aggregates to set algebra:
    per-event-type Apache DataSketches HLL sketches of the user
    population (``hll_sketch_agg``, lgK=12), merged PAIRWISE at the
    sketch level (``hll_union`` — the operation that makes HLL the
    100 TB audience-overlap tool: union is lossless on sketches, no
    re-scan), plus inclusion-exclusion intersection estimates. The
    emitted certificate per unordered type pair: the union estimate is
    within 6·rsd·exact_union (rsd = 1.04/√2¹² ≈ 1.63%), and the
    inclusion-exclusion intersection is within
    6·rsd·(exact_a + exact_b + exact_union) — the compounded bound,
    since |A∩B| = |A|+|B|-|A∪B| stacks three estimate errors. The
    oracle pins the exact integer populations and TRUE flags; sketch
    internals are never hash-compared (engine-specific), only their
    proven error envelope.

    Scale shape: the sketch arm is ONE map-side-combinable pass over
    events (fixed 4 KB registers per type — the full-table shuffle a
    COUNT(DISTINCT) would need is gone); the exact arm (distinct
    (type,user) -> per-type counts + user-keyed pair intersection) is
    the audit that exists only because the harness demands ground
    truth — production runs sketches alone. All post-agg frames are
    |types|- and |pairs|-sized; AQE broadcasts them unhinted."""
    ev = load_table(spark, sf_dir, "events")
    rsd = 1.04 / (2 ** 12) ** 0.5

    users = ev.select("event_type", "user_id").distinct()
    per = users.groupBy("event_type").agg(F.count("*").alias("n"))
    ua, ub = users.alias("ua"), users.alias("ub")
    inter = (
        ua.join(
            ub,
            (F.col("ua.user_id") == F.col("ub.user_id"))
            & (F.col("ua.event_type") < F.col("ub.event_type")),
        )
        .groupBy(
            F.col("ua.event_type").alias("type_a"),
            F.col("ub.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("ni"))
    )

    sk = ev.groupBy("event_type").agg(
        F.expr("hll_sketch_agg(user_id, 12)").alias("sk")
    )
    ska, skb = sk.alias("ska"), sk.alias("skb")
    est = (
        ska.join(skb, F.col("ska.event_type") < F.col("skb.event_type"))
        .select(
            F.col("ska.event_type").alias("type_a"),
            F.col("skb.event_type").alias("type_b"),
            F.expr("hll_sketch_estimate(ska.sk)").alias("est_a"),
            F.expr("hll_sketch_estimate(skb.sk)").alias("est_b"),
            F.expr("hll_sketch_estimate(hll_union(ska.sk, skb.sk))").alias(
                "est_u"
            ),
        )
    )

    pa, pb = per.alias("pa"), per.alias("pb")
    grid = (
        pa.join(pb, F.col("pa.event_type") < F.col("pb.event_type"))
        .select(
            F.col("pa.event_type").alias("type_a"),
            F.col("pb.event_type").alias("type_b"),
            F.col("pa.n").alias("exact_a"),
            F.col("pb.n").alias("exact_b"),
        )
        .join(inter, ["type_a", "type_b"], "left")
        .withColumn("exact_intersect", F.coalesce(F.col("ni"), F.lit(0)))
        .withColumn(
            "exact_union",
            F.col("exact_a") + F.col("exact_b") - F.col("exact_intersect"),
        )
        .join(est, ["type_a", "type_b"])
    )
    union_bound = 6 * rsd * F.col("exact_union")
    inter_bound = 6 * rsd * (
        F.col("exact_a") + F.col("exact_b") + F.col("exact_union")
    )
    est_i = F.col("est_a") + F.col("est_b") - F.col("est_u")
    return grid.select(
        "type_a",
        "type_b",
        F.col("exact_a").cast("long").alias("exact_a"),
        F.col("exact_b").cast("long").alias("exact_b"),
        F.col("exact_union").cast("long").alias("exact_union"),
        F.col("exact_intersect").cast("long").alias("exact_intersect"),
        (F.abs(F.col("est_u") - F.col("exact_union")) <= union_bound).alias(
            "union_within_bound"
        ),
        (F.abs(est_i - F.col("exact_intersect")) <= inter_bound).alias(
            "intersect_within_bound"
        ),
    ).orderBy("type_a", "type_b")
