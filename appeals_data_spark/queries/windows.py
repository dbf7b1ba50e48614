"""Window-function family (SURVEY.md §2.5 W1-W10).

The reference re-sorts per parser (events.R:96,138,189,218); every
query here computes all its lead/lag/running aggregates over ONE
window spec so the plan sorts each partition exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions.scalars import dsum
from ..registry import register


@register(
    "w1_lead_lag_gaps",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts,
             ts
      FROM events
    )
    SELECT event_type,
           COUNT(*) AS n,
           COUNT(next_ts) AS n_with_next,
           CAST(SUM(CASE WHEN next_ts IS NOT NULL
                    THEN date_diff('second', ts, next_ts) ELSE 0 END) AS BIGINT)
             AS total_gap_seconds
    FROM seq
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("W1", "W2"),
)
def w1_lead_lag_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead/lag across per-entity ordered streams (events.R:137-143
    manual vector shift -> partitionBy gives case-boundary nulls for
    free). Gap math on whole seconds, summed as BIGINT -> exact."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.withColumn("next_ts", F.lead("ts").over(w))
    gap = F.unix_timestamp(F.col("next_ts").cast("timestamp")) - F.unix_timestamp(
        F.col("ts").cast("timestamp")
    )
    return (
        seq.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.count("next_ts").alias("n_with_next"),
            F.sum(F.when(F.col("next_ts").isNotNull(), gap).otherwise(0)).alias(
                "total_gap_seconds"
            ),
        )
        .orderBy("event_type")
    )


@register(
    "w3_session_segmentation",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_id,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ), flagged AS (
      SELECT user_id,
             CASE WHEN prev_ts IS NULL
                       OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END AS is_start
      FROM seq
    )
    SELECT user_id,
           CAST(SUM(is_start) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM flagged
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("W3", "W6"),
    bench=True,
)
def w3_session_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-sum segmentation == sessionization (events.R:213-218,
    W3). Uses the reusable operator; 30-min gap rule."""
    from ..operators.sessionize import sessionize

    e = load_table(spark, sf_dir, "events")
    s = sessionize(e, "user_id", "ts", 1800, tiebreak_col="event_id")
    return (
        s.groupBy("user_id")
        .agg(
            F.max("session_seq").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id")
    )


@register(
    "w4_topk_per_group",
    oracle="""
    SELECT user_id, rank, event_id, value FROM (
      SELECT user_id, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY value DESC, event_id) AS rank
      FROM events WHERE event_type = 'purchase'
    ) WHERE rank <= 3
    ORDER BY user_id, rank
    """,
    tags=("W4", "O3"),
)
def w4_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k by row_number (events.R:230-233 keep-first/last).
    Rank window after a pushed filter; deterministic tiebreak."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        e.filter(F.col("event_type") == "purchase")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("user_id", "rank", "event_id", "value")
        .orderBy("user_id", "rank")
    )


@register(
    "w6_cumulative_condition_flags",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, event_type,
             COALESCE(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior_errors
      FROM events
    )
    SELECT CASE WHEN prior_errors > 0 THEN 'after_error' ELSE 'clean' END AS cohort,
           COUNT(*) AS n_purchases
    FROM seq
    WHERE event_type = 'purchase'
    GROUP BY 1
    ORDER BY cohort
    """,
    tags=("W6",),
)
def w6_cumulative_condition_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative condition counters used to segment downstream events
    (event-history.R:80-96: drop events before/after hearings)."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior_errors = F.coalesce(
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).over(w), F.lit(0)
    )
    return (
        e.withColumn("prior_errors", prior_errors)
        .filter(F.col("event_type") == "purchase")
        .groupBy(
            F.when(F.col("prior_errors") > 0, "after_error")
            .otherwise("clean")
            .alias("cohort")
        )
        .agg(F.count("*").alias("n_purchases"))
        .orderBy("cohort")
    )


@register(
    "w7_dense_rank_group_index",
    oracle="""
    SELECT p_brand, price_rank, COUNT(*) AS n_parts FROM (
      SELECT p_brand,
             DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS price_rank
      FROM part
    )
    WHERE price_rank <= 3
    GROUP BY p_brand, price_rank
    ORDER BY p_brand, price_rank
    """,
    tags=("W7",),
)
def w7_dense_rank_group_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dense_rank group indexing (reference `group_indices`,
    effect-on-outcomes.Rmd:166)."""
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"))
    return (
        p.withColumn("price_rank", F.dense_rank().over(w))
        .filter(F.col("price_rank") <= 3)
        .groupBy("p_brand", "price_rank")
        .agg(F.count("*").alias("n_parts"))
        .orderBy("p_brand", "price_rank")
    )


@register(
    "w9_lead_offset_series",
    oracle="""
    WITH monthly AS (
      SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT month, revenue,
           LEAD(revenue, 2) OVER (ORDER BY month) AS revenue_2mo_ahead,
           LEAD(revenue, 2) OVER (ORDER BY month) - revenue AS delta_2mo
    FROM monthly
    ORDER BY month
    """,
    tags=("W9",),
)
def w9_lead_offset_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-step lead over a time-indexed series (docket-model.R:72-76
    `lead(activation, 730)`). The series is an aggregate (tiny) so the
    unpartitioned window is safe; on raw data always partition."""
    from ..functions.scalars import month_trunc

    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(month_trunc("o_orderdate").alias("month")).agg(
        dsum("o_totalprice").alias("revenue")
    )
    w = Window.orderBy("month")
    ahead = F.lead("revenue", 2).over(w)
    return (
        monthly.withColumn("revenue_2mo_ahead", ahead)
        .withColumn("delta_2mo", ahead - F.col("revenue"))
        .orderBy("month")
    )


@register(
    "w5_variable_distance_lead",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             CAST(FLOOR(value) AS INT) % 3 + 1 AS dist
      FROM events
    )
    SELECT a.event_type,
           COALESCE(b.event_type, '<none>') AS ahead_type,
           COUNT(*) AS n
    FROM seq a
    LEFT JOIN seq b ON b.user_id = a.user_id AND b.rn = a.rn + a.dist
    GROUP BY a.event_type, ahead_type
    ORDER BY a.event_type, ahead_type
    """,
    tags=("W5", "J9"),
)
def w5_variable_distance_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variable-distance forward reference (events.R:220 storage_loc
    lookup at row + dispatch_rows): Spark has no variable lead(), so
    index rows with row_number and self-join on (key, rn + dist).
    Scale: the self-join is an equi-join on (user_id, rn) — shuffles
    both sides once on the same key, never quadratic. The alternative
    collect_list + element_at avoids the join but materializes whole
    partitions; the join form survives unbounded streams."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_type",
        F.row_number().over(w).alias("rn"),
        (F.floor("value").cast("int") % 3 + 1).alias("dist"),
    )
    a, b = seq.alias("a"), seq.alias("b")
    return (
        a.join(
            b,
            (F.col("b.user_id") == F.col("a.user_id"))
            & (F.col("b.rn") == F.col("a.rn") + F.col("a.dist")),
            "left",
        )
        .groupBy(
            F.col("a.event_type").alias("event_type"),
            F.coalesce(F.col("b.event_type"), F.lit("<none>")).alias("ahead_type"),
        )
        .agg(F.count("*").alias("n"))
        .orderBy("event_type", "ahead_type")
    )


@register(
    "w11_rolling_mean",
    oracle="""
    WITH weekly AS (
      SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS wk,
             COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      FROM orders GROUP BY 1
    )
    SELECT wk, n,
           ROUND(AVG(CAST(n AS DOUBLE)) OVER (
             ORDER BY wk ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6)
             AS n_ma4,
           ROUND(AVG(rev) OVER (
             ORDER BY wk ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6)
             AS rev_ma4
    FROM weekly ORDER BY wk
    """,
    tags=("W9", "A12", "S11"),
)
def w11_rolling_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 4-week moving average of weekly order volume/revenue —
    the engine-side smoother replacing the reference's plot-side
    geom_smooth(loess) curves (impact.R:149, capacity.R:241-242, S11:
    smoothing was a ggplot visual there; a user switching to this
    engine gets the data-side series instead). Weekly pre-aggregation
    first, so the sliding window runs over ~350 rows, not raw orders;
    the single unpartitioned window is bounded by the calendar, never
    by data volume. Revenue passes through the exact-decimal contract
    before the double-valued average; 6-dp rounding pins the
    cross-engine division."""
    o = load_table(spark, sf_dir, "orders")
    weekly = o.groupBy(
        F.date_trunc("week", "o_orderdate").cast("date").alias("wk")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("rev"),
    )
    w = Window.orderBy("wk").rowsBetween(-3, Window.currentRow)
    return weekly.select(
        "wk",
        "n",
        F.round(F.avg(F.col("n").cast("double")).over(w), 6).alias("n_ma4"),
        F.round(F.avg("rev").over(w), 6).alias("rev_ma4"),
    ).orderBy("wk")


@register(
    "w12_linear_interpolation",
    oracle="""
    WITH nations AS (
      SELECT DISTINCT c_nationkey AS nation FROM customer WHERE c_nationkey < 5
    ), spine AS (
      SELECT nation, CAST(d AS DATE) AS d
      FROM nations, UNNEST(generate_series(DATE '1996-01-01',
                                           DATE '1996-12-31',
                                           INTERVAL 1 DAY)) AS t(d)
    ), actual AS (
      SELECT c.c_nationkey AS nation, CAST(o.o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS val
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      WHERE c.c_nationkey < 5 AND o.o_totalprice > 150000
        AND o.o_orderdate >= DATE '1996-01-01'
        AND o.o_orderdate <= DATE '1996-12-31'
      GROUP BY 1, 2
    ), joined AS (
      SELECT s.nation, s.d, a.val FROM spine s
      LEFT JOIN actual a ON a.nation = s.nation AND a.d = s.d
    ), ctx AS (
      SELECT nation, d, val,
             last_value(val IGNORE NULLS) OVER (
               PARTITION BY nation ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
             last_value(CASE WHEN val IS NOT NULL THEN d END IGNORE NULLS)
               OVER (PARTITION BY nation ORDER BY d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pd,
             first_value(val IGNORE NULLS) OVER (
               PARTITION BY nation ORDER BY d
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN val IS NOT NULL THEN d END IGNORE NULLS)
               OVER (PARTITION BY nation ORDER BY d
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nd
      FROM joined
    )
    SELECT nation, d,
           CASE WHEN val IS NOT NULL THEN val
                WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                  pv + (nv - pv) * ((d - pd) / CAST(nd - pd AS DOUBLE))
           END AS value_filled,
           CAST(val IS NOT NULL AS INT) AS is_actual
    FROM ctx
    ORDER BY nation, d
    """,
    tags=("W1", "W9", "J18", "F2"),
)
def w12_linear_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-filling with linear interpolation — the time-series
    regularization step (reference plots over sparse daily series;
    this materializes the complete spine data-side): a join-free
    exploded day spine per nation, a left join onto the sparse daily
    actuals, then ONE window pass carrying last/next known value and
    date (ignore-nulls frames) so every gap day gets
    pv + (nv-pv)·(d-pd)/(nd-pd). Edge days before the first / after
    the last observation stay NULL by design. Actual values are exact
    decimal daily sums; interpolation is a single deterministic
    double expression over them.

    Scale shape: the spine explodes from a #nations-row frame (no
    grid join); the actuals join is key-equal; the two window frames
    share one (nation, d) sort. Spine cardinality is #keys × days —
    bound the date range or bucket the keys when that outgrows a
    partition."""
    from ..functions.scalars import dec

    cust = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    nations = (
        cust.filter(F.col("c_nationkey") < 5)
        .select(F.col("c_nationkey").alias("nation"))
        .distinct()
    )
    spine = nations.select(
        "nation",
        F.explode(
            F.sequence(
                F.lit("1996-01-01").cast("date"), F.lit("1996-12-31").cast("date")
            )
        ).alias("d"),
    )
    actual = (
        o.filter(
            (F.col("o_totalprice") > 150000)
            & (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") <= "1996-12-31")
        )
        # unhinted (round-8 hint audit): a nation-filtered customer
        # slice still grows with the corpus (~20% of customers); AQE
        # decides
        .join(
            cust.filter(F.col("c_nationkey") < 5).select(
                "c_custkey", F.col("c_nationkey").alias("nation")
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("nation", F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.sum(dec("o_totalprice")).cast("double").alias("val"))
    )
    joined = spine.join(actual, ["nation", "d"], "left")
    w = Window.partitionBy("nation").orderBy("d")
    prev = w.rowsBetween(Window.unboundedPreceding, -1)
    nxt = w.rowsBetween(1, Window.unboundedFollowing)
    marker = F.when(F.col("val").isNotNull(), F.col("d"))
    ctx = joined.select(
        "nation",
        "d",
        "val",
        F.last("val", ignorenulls=True).over(prev).alias("pv"),
        F.last(marker, ignorenulls=True).over(prev).alias("pd"),
        F.first("val", ignorenulls=True).over(nxt).alias("nv"),
        F.first(marker, ignorenulls=True).over(nxt).alias("nd"),
    )
    # No rounding: every input is exact (decimal-sum doubles, integer
    # day gaps) and each IEEE op is correctly rounded, so the raw
    # double matches bit-for-bit across engines — whereas ROUND(x, 6)
    # lands on .5e-6 midpoints systematically (fractions like 1/2 of
    # scale-2 values) where the engines' half-rounding styles diverge.
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        F.datediff(F.col("d"), F.col("pd"))
        / F.datediff(F.col("nd"), F.col("pd")).cast("double")
    )
    return ctx.select(
        "nation",
        "d",
        F.when(F.col("val").isNotNull(), F.col("val"))
        .when(F.col("pv").isNotNull() & F.col("nv").isNotNull(), interp)
        .alias("value_filled"),
        F.col("val").isNotNull().cast("int").alias("is_actual"),
    ).orderBy("nation", "d")


# Truncated-EWMA weights: (1-alpha)^i for lag i, alpha = 0.2, DEFINED
# as their 4-dp decimal roundings. All accumulation below is exact
# decimal arithmetic; the one division happens between two doubles
# that are exact conversions of identical decimals on both engines
# (numerator units stay under 2^53 through sf0.1), so the emitted
# double needs no rounding step — and has no rounding-tie hazard at
# any magnitude (a plain 6-dp ROUND flipped on an 8.7e6-magnitude tie
# in testing).
_EWMA_LAGS = 8
_EWMA_W = ["1.0", "0.8", "0.64", "0.512", "0.4096", "0.3277", "0.2621", "0.2097"]


def _ewma_oracle() -> str:
    terms = " + ".join(
        f"COALESCE(CAST({w} AS DECIMAL(6,4)) * x_{i}, 0)"
        for i, w in enumerate(_EWMA_W)
    )
    wsum = " + ".join(
        f"CASE WHEN x_{i} IS NOT NULL THEN CAST({w} AS DECIMAL(6,4)) "
        f"ELSE CAST(0 AS DECIMAL(6,4)) END"
        for i, w in enumerate(_EWMA_W)
    )
    lags = ",\n             ".join(
        f"LAG(rev, {i}) OVER (PARTITION BY prio ORDER BY month) AS x_{i}"
        for i in range(1, _EWMA_LAGS)
    )
    return f"""
    WITH monthly AS (
      SELECT o_orderpriority AS prio,
             CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1, 2
    ), lagged AS (
      SELECT prio, month, rev AS x_0,
             {lags}
      FROM monthly
    )
    SELECT prio, month,
           CAST(({terms}) AS DOUBLE) / CAST(({wsum}) AS DOUBLE) AS ewma
    FROM lagged ORDER BY prio, month
    """


@register(
    "w13_ewma_smoothing",
    oracle=_ewma_oracle(),
    tags=("W9", "A12", "S11"),
)
def w13_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of monthly revenue per
    order priority, truncated at 8 lags — the bounded-memory form of
    the reference's plot-side smoothers (impact.R:149, S11, like
    w11_rolling_mean). Truncation is the scale-honest choice: the
    infinite recursion needs sequential per-partition state, while the
    8-term window is ONE window spec (each lag reuses the same sort)
    and renormalizes its weights at the series head where lags are
    missing. Numerator and denominator accumulate in EXACT decimal
    (weights are decimal by definition, revenue stays on the
    exact-decimal contract), so the one double division has identical
    operands on both engines and the result needs no rounding."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.col("o_orderpriority").alias("prio"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    w = Window.partitionBy("prio").orderBy("month")
    xs = [F.col("rev")] + [
        F.lag("rev", i).over(w) for i in range(1, _EWMA_LAGS)
    ]
    dec0 = F.lit("0").cast("decimal(6,4)")
    num = None
    den = None
    for wt, x in zip(_EWMA_W, xs):
        wd = F.lit(wt).cast("decimal(6,4)")
        t = F.coalesce(wd * x, F.lit(0))
        d = F.when(x.isNotNull(), wd).otherwise(dec0)
        num = t if num is None else num + t
        den = d if den is None else den + d
    return (
        monthly.select(
            "prio",
            "month",
            (num.cast("double") / den.cast("double")).alias("ewma"),
        ).orderBy("prio", "month")
    )


@register(
    "w14_cusum_changepoint",
    oracle="""
    WITH monthly AS (
      SELECT o_orderpriority AS grp,
             CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1, 2
    ), stats AS (
      SELECT grp, month,
             CAST(SUM(rev) OVER (PARTITION BY grp ORDER BY month
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS DOUBLE) AS cum,
             ROW_NUMBER() OVER (PARTITION BY grp ORDER BY month) AS k,
             CAST(SUM(rev) OVER (PARTITION BY grp) AS DOUBLE) AS sx,
             COUNT(*) OVER (PARTITION BY grp) AS n
      FROM monthly
    ), s AS (
      SELECT grp, month, n, cum - k * (sx / n) AS cusum
      FROM stats
    )
    SELECT grp, month AS change_month, cusum AS cusum_stat,
           CAST(n AS BIGINT) AS n_months
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY grp
                                   ORDER BY ABS(cusum) DESC, month) AS rn
      FROM s
    ) WHERE rn = 1
    ORDER BY grp
    """,
    tags=("W3", "W6", "X3"),
)
def w14_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection on the monthly revenue series per
    order priority: the cumulative deviation from the series mean,
    S_k = sum_{i<=k} x_i - k*mean, peaks (in absolute value) at the
    most likely level-shift month — the classic offline CUSUM
    estimator, here as pure window algebra (W3's running sums + the
    A14 argmax). The cumulative and total sums stay EXACT decimal and
    convert to double exactly at these magnitudes, so S_k and the
    argmax ranking are identical on both engines with no rounding
    step; ties on |S_k| break on the earlier month.

    Scale shape: one map-side-combinable monthly rollup, then two
    window passes over #months-per-group rows sharing one partition
    key — data volume never reaches the window."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.col("o_orderpriority").alias("grp"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    wo = Window.partitionBy("grp").orderBy("month")
    wa = Window.partitionBy("grp")
    stats = monthly.select(
        "grp",
        "month",
        F.sum("rev").over(
            wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("double").alias("cum"),
        F.row_number().over(wo).alias("k"),
        F.sum("rev").over(wa).cast("double").alias("sx"),
        F.count("*").over(wa).alias("n"),
    )
    s = stats.select(
        "grp",
        "month",
        "n",
        (F.col("cum") - F.col("k") * (F.col("sx") / F.col("n"))).alias("cusum"),
    )
    ranked = s.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("grp").orderBy(F.abs(F.col("cusum")).desc(), "month")
        ),
    )
    return (
        ranked.filter(F.col("rn") == 1)
        .select(
            "grp",
            F.col("month").alias("change_month"),
            F.col("cusum").alias("cusum_stat"),
            F.col("n").cast("long").alias("n_months"),
        )
        .orderBy("grp")
    )


@register(
    "w15_ntile_deciles",
    oracle="""
    WITH tiled AS (
      SELECT o_totalprice,
             NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
      FROM orders
    )
    SELECT decile, COUNT(*) AS n,
           MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total
    FROM tiled GROUP BY decile ORDER BY decile
    """,
    tags=("W7", "A7", "A13"),
)
def w15_ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile banding by NTILE with a deterministic total order
    (price, then key) and per-band summaries — the ranked-bucket
    report shape (A13's histogram by equal POPULATION instead of equal
    width). Both engines share NTILE's front-loaded-remainder
    definition, so band membership is identical.

    Scale shape: a bare ``ntile().over(Window.orderBy(...))`` funnels
    the WHOLE table through one task (Spark plans an unpartitioned
    window as a single-partition sort — the 100x probe measured it at
    108x: 0.38 -> 41.6s). This builder computes the IDENTICAL tile
    assignment with a two-phase distributed rank instead:
    repartitionByRange on the total-order key (parallel local sorts),
    per-partition row_number, then global rank = broadcast cumulative
    partition-size offset + local rank, and NTILE's front-loaded-
    remainder arithmetic applied to the exact rank. Every stage is
    parallel; the only single-task work is the ≤nparts-row offset
    cumulation. Same answer, no global sort bottleneck — measured
    41.6 -> ~4s at sf10."""
    from ..operators.rank import global_ntile

    o = load_table(spark, sf_dir, "orders")
    banded = global_ntile(
        o.select("o_totalprice", "o_orderkey"),
        10,
        ["o_totalprice", "o_orderkey"],
        tile_name="decile",
    )
    return (
        banded.select("o_totalprice", "decile")
        .groupBy("decile")
        .agg(
            F.count("*").alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
            dsum("o_totalprice").alias("total"),
        )
        .orderBy("decile")
    )
