"""Composite lifecycle ports — multi-operator analyses traced in
SURVEY.md §3 (the reference's real entry points chain pre-aggregation,
argmax row retrieval, fuzzy matching, derived flags, and 2-D pivot
summaries in one dataflow). Each composite runs as ONE Catalyst plan —
the reference needed an Oracle round-trip per stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions.scalars import (
    fiscal_year,
    pin_dbl,
    ratio_dbl,
    sql_pin_dbl,
    sql_ratio_dbl,
)
from ..registry import register


@register(
    "comp_time_to_first_ship",
    oracle="""
    WITH fs AS (
      SELECT l_orderkey, MIN(CAST(l_shipdate AS DATE)) AS first_ship
      FROM lineitem GROUP BY l_orderkey
    ), base AS (
      SELECT o.o_custkey, o.o_orderpriority,
             date_trunc('month', o.o_orderdate) AS om,
             date_diff('day', CAST(o.o_orderdate AS DATE), first_ship) AS tts
      FROM orders o JOIN fs ON o_orderkey = l_orderkey
    ), flagged AS (
      SELECT *, COUNT(*) OVER (PARTITION BY o_custkey, om) > 1 AS multi
      FROM base
    )
    SELECT multi,
           quantile_cont(tts, 0.5) FILTER (o_orderpriority = '1-URGENT') AS p1_urgent,
           quantile_cont(tts, 0.5) FILTER (o_orderpriority = '2-HIGH') AS p2_high,
           quantile_cont(tts, 0.5) FILTER (o_orderpriority = '3-MEDIUM') AS p3_medium,
           quantile_cont(tts, 0.5) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS p4_notspec,
           quantile_cont(tts, 0.5) FILTER (o_orderpriority = '5-LOW') AS p5_low
    FROM flagged
    GROUP BY multi ORDER BY multi
    """,
    tags=("COMPOSITE", "J7", "J8", "J16", "A9"),
    bench=True,
)
def comp_time_to_first_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """time-to-ep lifecycle port (time-to-ep.Rmd:34-151, SURVEY §3.3):
    pre-aggregate the child table for the first shipment (J7/J8 —
    argmax via groupBy-min, no full-table sort), derive time-to-ship,
    flag multi-order veteran-months with a window count (J16), pivot
    median days by multi-flag x priority (A9 tapply analog). One plan:
    the reference made three Oracle round-trips plus a Ruby hop."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    first_ship = li.groupBy("l_orderkey").agg(
        F.min(F.col("l_shipdate").cast("date")).alias("first_ship")
    )
    base = o.join(first_ship, o.o_orderkey == first_ship.l_orderkey).select(
        "o_custkey",
        "o_orderpriority",
        F.date_trunc("month", "o_orderdate").alias("om"),
        F.datediff("first_ship", F.col("o_orderdate").cast("date")).alias("tts"),
    )
    flagged = base.withColumn(
        "multi", F.count("*").over(Window.partitionBy("o_custkey", "om")) > 1
    )
    piv = (
        flagged.groupBy("multi")
        .pivot(
            "o_orderpriority",
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
        )
        .agg(F.expr("percentile(tts, 0.5)"))
    )
    return piv.select(
        "multi",
        F.col("1-URGENT").alias("p1_urgent"),
        F.col("2-HIGH").alias("p2_high"),
        F.col("3-MEDIUM").alias("p3_medium"),
        F.col("4-NOT SPECIFIED").alias("p4_notspec"),
        F.col("5-LOW").alias("p5_low"),
    ).orderBy("multi")


@register(
    "comp_outcome_rates",
    oracle=f"""
    WITH lagg AS (
      SELECT l_orderkey,
             MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS had_return
      FROM lineitem GROUP BY l_orderkey
    ), base AS (
      SELECT YEAR(o.o_orderdate + INTERVAL 3 MONTH) AS fy,
             n.n_name AS nation,
             COALESCE(lagg.had_return, 0) AS had_return,
             CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS finished
      FROM orders o
      LEFT JOIN lagg ON o.o_orderkey = lagg.l_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
    )
    SELECT fy, nation,
           COUNT(*) AS n_orders,
           CAST(SUM(had_return) AS BIGINT) AS n_with_return,
           {sql_ratio_dbl("SUM(had_return * finished)",
                          "NULLIF(SUM(had_return), 0)")}
             AS finish_rate_with_return,
           {sql_ratio_dbl("SUM((1 - had_return) * finished)",
                          "NULLIF(SUM(1 - had_return), 0)")}
             AS finish_rate_no_return
    FROM base
    GROUP BY fy, nation
    ORDER BY fy, nation
    """,
    tags=("COMPOSITE", "J1", "J7", "A2", "A5", "W10", "P9"),
    bench=True,
)
def comp_outcome_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """effect-on-outcomes port (effect-on-outcomes.Rmd:55-181, SURVEY
    §3.2): pre-aggregate the 1:N child to an exposure flag BEFORE the
    fact join (J7 — the reference's hearing-counts subquery, keeping
    the join 1:1), broadcast the small dim chain, bucket by fiscal year
    (W10), and compare outcome rates between exposed and unexposed
    groups with conditional aggregation (A2/A5). One Catalyst plan;
    the child pre-agg combines map-side so the big join never fans out.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    lagg = li.groupBy("l_orderkey").agg(
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("had_return")
    )
    base = (
        o.join(lagg, o.o_orderkey == lagg.l_orderkey, "left")
        .na.fill({"had_return": 0})
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            fiscal_year(F.col("o_orderdate")).alias("fy"),
            F.col("n_name").alias("nation"),
            F.col("had_return"),
            F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("finished"),
        )
    )
    return (
        base.groupBy("fy", "nation")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("had_return").alias("n_with_return"),
            # count ratios: the ROUND(double, s) tie-flip class —
            # exact decimal half-up, double final (round-11 migration)
            ratio_dbl(
                F.sum(F.col("had_return") * F.col("finished")),
                F.nullif(F.sum("had_return"), F.lit(0)),
            ).alias("finish_rate_with_return"),
            ratio_dbl(
                F.sum((1 - F.col("had_return")) * F.col("finished")),
                F.nullif(F.sum(1 - F.col("had_return")), F.lit(0)),
            ).alias("finish_rate_no_return"),
        )
        .orderBy("fy", "nation")
    )


def _backlog_oracle() -> str:
    from ..views.events import EVENTS_ALL_SQL

    return f"""
    WITH ev AS (
      SELECT entity_id, event_type, ts FROM ({EVENTS_ALL_SQL})
    ), spans AS (
      SELECT entity_id,
             MIN(CAST(ts AS DATE)) AS enter_d,
             COALESCE(
               MIN(CASE WHEN event_type = 'order_finished'
                        THEN CAST(ts AS DATE) END),
               MAX(CAST(ts AS DATE))) AS exit_d
      FROM ev WHERE ts IS NOT NULL
      GROUP BY entity_id
    ), grid AS (
      SELECT UNNEST(generate_series(DATE '1995-01-02', DATE '2001-12-31',
                                    INTERVAL 7 DAY)) AS g
    )
    SELECT CAST(g AS DATE) AS grid_date,
           (SELECT COUNT(*) FROM spans
             WHERE enter_d <= CAST(g AS DATE)
               AND exit_d > CAST(g AS DATE)) AS backlog
    FROM grid
    ORDER BY grid_date
    """


@register(
    "comp_backlog_reconstruction",
    oracle=_backlog_oracle(),
    tags=("COMPOSITE", "U1", "W6", "J17", "A1"),
)
def comp_backlog_reconstruction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backlog reconstruction from the derived event log (event-history.
    R:34-135 + capacity.R:84-102, SURVEY §7.2 step 8): events_all() ->
    per-entity activity span -> weekly point-in-time backlog.

    The reference's W6 cleaning (drop events after the first end-state
    event) collapses algebraically into the span aggregation: the
    cleaned max-timestamp IS the first end-state timestamp when one
    exists, else the last activity — so exit_d =
    coalesce(min(ts | end state), max(ts)). That turns a window pass +
    filter + re-aggregation into ONE groupBy with map-side partials,
    and the grid expansion then runs join-free (operators.pit explode
    strategy). The reference needed 10 Oracle round-trips plus three
    dplyr passes for the same answer."""
    from ..operators.pit import date_grid, pit_backlog
    from ..views.events import events_all

    ev = events_all(spark, sf_dir)
    spans = ev.groupBy("entity_id").agg(
        F.min(F.col("ts").cast("date")).alias("enter_d"),
        F.coalesce(
            F.min(
                F.when(
                    F.col("event_type") == "order_finished", F.col("ts").cast("date")
                )
            ),
            F.max(F.col("ts").cast("date")),
        ).alias("exit_d"),
    )
    grid = date_grid(spark, "1995-01-02", "2001-12-31", 7)
    return pit_backlog(
        spans, grid, "enter_d", "exit_d", step_days=7,
        grid_start="1995-01-02", grid_end="2001-12-31",
    )


@register(
    "comp_docket_projection",
    oracle="""
    WITH grid AS (
      SELECT UNNEST(generate_series(DATE '1995-01-02', DATE '2001-12-31',
                                    INTERVAL 28 DAY)) AS g
    ), pending AS (
      SELECT CAST(g AS DATE) AS grid_date,
             CAST(o_orderdate AS DATE) AS od,
             o_orderkey,
             ROW_NUMBER() OVER (
               PARTITION BY g
               ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS rn
      FROM grid JOIN orders
        ON CAST(o_orderdate AS DATE) <= CAST(g AS DATE)
       AND CAST(o_orderdate AS DATE)
           + CAST(30 + o_orderkey % 60 AS INTEGER) > CAST(g AS DATE)
    )
    SELECT grid_date, od AS docket_line_date
    FROM pending WHERE rn = 100
    ORDER BY grid_date
    """,
    tags=("COMPOSITE", "J17", "A14", "O3"),
)
def comp_docket_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docket-line projection (docket-model.R:285-312): for each grid
    date, the order date of the 100th-oldest then-pending case — the
    reference's "date of the 4000th pending appeal" time series.

    Physical shape: each interval map-side-emits the grid points it
    covers (no grid join), then ONE shuffle partitions by grid_date for
    the rank. Shuffle volume is Σ covered points (~interval/step per
    row), so at 100 TB you widen the grid step or pre-filter the cohort
    — never a grid x fact cross join. Synthetic pendency = 30 +
    orderkey%60 days, as in j17_pit_backlog."""
    step, start, end, k = 28, "1995-01-02", "2001-12-31", 100
    o = load_table(spark, sf_dir, "orders")
    iv = o.select(
        F.col("o_orderkey"),
        F.col("o_orderdate").cast("date").alias("od"),
        F.date_add(
            F.col("o_orderdate").cast("date"),
            (F.lit(30) + F.col("o_orderkey") % 60).cast("int"),
        ).alias("exit_d"),
    )
    off = F.datediff(F.col("od"), F.lit(start).cast("date"))
    first_covered = F.date_add(
        F.lit(start).cast("date"), ((off + step - 1) / step).cast("int") * step
    )
    covered = (
        iv.withColumn("__first", first_covered)
        .filter(F.col("__first") <= F.date_sub("exit_d", 1))
        .select(
            "o_orderkey",
            "od",
            F.explode(
                F.sequence(
                    F.col("__first"),
                    F.date_sub("exit_d", 1),
                    F.expr(f"interval {step} days"),
                )
            ).alias("grid_date"),
        )
        .filter(F.col("grid_date").between(F.lit(start), F.lit(end)))
    )
    w = Window.partitionBy("grid_date").orderBy("od", "o_orderkey")
    return (
        covered.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == k)
        .select("grid_date", F.col("od").alias("docket_line_date"))
        .orderBy("grid_date")
    )


@register(
    "comp_exp_gap_fit",
    oracle=f"""
    WITH gaps AS (
      SELECT date_diff('second', ts,
               LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_s
      FROM events
    ), buckets AS (
      SELECT CAST(FLOOR(gap_s / 60.0) AS INT) AS t, COUNT(*) AS n
      FROM gaps WHERE gap_s IS NOT NULL GROUP BY 1
    ), surv AS (
      SELECT t,
             CAST(SUM(n) OVER (ORDER BY t DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               / SUM(n) OVER () AS s
      FROM buckets
    )
    SELECT {sql_pin_dbl("regr_slope(LN(s), t)")} AS neg_lambda,
           {sql_pin_dbl("regr_r2(LN(s), t)")} AS r2,
           COUNT(*) AS n_points
    FROM surv WHERE t BETWEEN 1 AND 30 AND s > 0
    """,
    tags=("COMPOSITE", "X3", "F9", "A13", "W1"),
)
def comp_exp_gap_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential catch-up model port (event-history.R:277-307 fits
    nls count ~ a(1-exp(-b lag)) for NOD reporting fog): linearized
    here as ln(empirical survival of inter-event gaps) ~ -lambda t,
    fitted with the closed-form regression aggregate. Windows -> bins
    -> reverse running sum -> one sufficient-statistics fit: the whole
    model pipeline never leaves the JVM."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.select(
        (
            F.unix_timestamp(F.lead("ts").over(w).cast("timestamp"))
            - F.unix_timestamp(F.col("ts").cast("timestamp"))
        ).alias("gap_s")
    ).filter(F.col("gap_s").isNotNull())
    buckets = gaps.groupBy(
        F.floor(F.col("gap_s") / 60.0).cast("int").alias("t")
    ).agg(F.count("*").alias("n"))
    w_rev = Window.orderBy(F.desc("t")).rowsBetween(Window.unboundedPreceding, 0)
    surv = buckets.select(
        "t",
        (
            F.sum("n").over(w_rev).cast("double")
            / F.sum("n").over(Window.partitionBy())
        ).alias("s"),
    ).filter(F.col("t").between(1, 30) & (F.col("s") > 0))
    agg = surv.agg(
        F.covar_pop("t", F.log("s")).alias("sxy"),
        F.var_pop("t").alias("sxx"),
        F.corr("t", F.log("s")).alias("r"),
        F.count(F.lit(1)).alias("n_points"),
    )
    return agg.select(
        # OLS ratios of double moments: the ROUND(double, s) tie-flip
        # class — pinned via floor(x*1e6+0.5) (identical IEEE ops both
        # engines), double final projection (round-11 migration)
        pin_dbl(F.col("sxy") / F.col("sxx")).alias("neg_lambda"),
        pin_dbl(F.col("r") * F.col("r")).alias("r2"),
        "n_points",
    )


@register(
    "comp_decision_locs",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, event_type, ts,
             FIRST_VALUE(CASE WHEN event_type NOT IN ('click', 'view')
                              THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS storage_loc
      FROM events
    ), dec AS (
      SELECT user_id, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM seq
      WHERE event_type = 'signup' AND storage_loc = 'purchase'
    )
    SELECT user_id AS entity_id,
           'SIGNED_DECISION' AS event_type,
           ts AS decision_ts
    FROM dec WHERE rn = 1
    ORDER BY entity_id
    """,
    tags=("COMPOSITE", "W3", "W5", "J8"),
)
def comp_decision_locs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """.parseDecisionLocs, the reference's hardest extractor
    (events.R:207-236): segment each case's location log into
    dispatch runs (cumsum of non-dispatch rows, W3), compute each
    row's post-run storage location via the rank-from-end index
    arithmetic ``LOC[i + dispatch_rows]`` (a variable-distance
    forward lead, W5), and emit SIGNED_DECISION for decision-loc rows
    whose run ends at central dispatch — latest per case (J8 argmax).

    Spark-first collapse: within a case ordered by (ts, id), every row
    of a dispatch run has the same ``i + dispatch_rows`` target — the
    first row AFTER the run, which is by construction the next
    NON-dispatch row (dispatch runs are maximal). So the W3 run id and
    W5 variable lead algebraically reduce to one forward-looking
    ``first(non-dispatch LOC, ignorenulls) OVER (1 FOLLOWING,
    UNBOUNDED)`` on the SAME user-partitioned sort — one shuffle
    total, no (case, run) re-partition. Deviation pinned: the
    reference indexes the GLOBAL arranged frame, so a run at the end
    of one case reads the next case's first row as its storage loc;
    we keep lookups within the case (boundary runs get NULL).

    Mapping onto the clickstream: dispatch locs (``A.+|SUP|OPR``) ->
    {click, view}; decision locs (``D[1-5]``) -> signup; central
    dispatch ('30') -> purchase; LOCDIN/LOCDOUT -> ts.
    """
    e = load_table(spark, sf_dir, "events")
    wfwd = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    storage = F.first(
        F.when(~F.col("event_type").isin("click", "view"), F.col("event_type")),
        ignorenulls=True,
    ).over(wfwd)
    seq = e.select("user_id", "event_id", "event_type", "ts").withColumn(
        "storage_loc", storage
    )
    dec = seq.filter(
        (F.col("event_type") == "signup") & (F.col("storage_loc") == "purchase")
    )
    w_latest = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        dec.withColumn("rn", F.row_number().over(w_latest))
        .filter(F.col("rn") == 1)
        .select(
            F.col("user_id").alias("entity_id"),
            F.lit("SIGNED_DECISION").alias("event_type"),
            F.col("ts").alias("decision_ts"),
        )
        .orderBy("entity_id")
    )


@register(
    "comp_ep_classifier_eval",
    oracle=f"""
    WITH issue_flags AS (
      SELECT l_orderkey,
             MAX(CASE WHEN l_quantity > 45 THEN 1 ELSE 0 END) AS f_bigqty,
             MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS f_returned,
             MAX(CASE WHEN l_tax > 0.07 THEN 1 ELSE 0 END) AS f_hitax
      FROM lineitem GROUP BY l_orderkey
    ), last_line AS (
      SELECT l_orderkey,
             CASE WHEN l_linestatus = 'F' THEN 'RO' ELSE 'AMC' END AS actual
      FROM (
        SELECT l_orderkey, l_linestatus,
               ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                  ORDER BY l_shipdate DESC,
                                           l_linenumber DESC,
                                           l_linestatus DESC) AS rn
        FROM lineitem
      ) WHERE rn = 1
    ), cases AS (
      SELECT o_orderkey, f_bigqty, f_returned, f_hitax,
             CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END
               AS f_building,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
               AS f_urgent,
             actual
      FROM orders
      JOIN issue_flags ON o_orderkey = l_orderkey
      JOIN last_line USING (l_orderkey)
      LEFT JOIN customer ON o_custkey = c_custkey
    ), scored AS (
      SELECT *,
             CASE WHEN f_bigqty + f_returned + f_hitax + f_building
                       + f_urgent > 0 THEN 1 ELSE 0 END AS f_any,
             CASE WHEN f_bigqty + f_returned + f_hitax + f_building
                       + f_urgent > 0 THEN 'RO' ELSE 'AMC' END AS prediction
      FROM cases
    ), long AS (
      SELECT 'f_bigqty' AS flag, f_bigqty AS v, prediction, actual FROM scored
      UNION ALL SELECT 'f_returned', f_returned, prediction, actual FROM scored
      UNION ALL SELECT 'f_hitax', f_hitax, prediction, actual FROM scored
      UNION ALL SELECT 'f_building', f_building, prediction, actual FROM scored
      UNION ALL SELECT 'f_urgent', f_urgent, prediction, actual FROM scored
      UNION ALL SELECT 'f_any', f_any, prediction, actual FROM scored
    )
    SELECT flag,
           CAST(SUM(v) AS BIGINT) AS positive,
           CAST(SUM(CASE WHEN v = 1 AND prediction = 'RO' AND actual = 'AMC'
                         THEN 1 ELSE 0 END) AS BIGINT) AS type1_error,
           CASE WHEN SUM(v) > 0
                THEN {sql_ratio_dbl(
                    "SUM(CASE WHEN v = 1 AND prediction = 'RO' "
                    "AND actual = 'AMC' THEN 1 ELSE 0 END)",
                    "SUM(v)",
                    6,
                )} END AS err_rate
    FROM long GROUP BY flag ORDER BY flag
    """,
    tags=("COMPOSITE", "A2", "J8", "A8", "R3"),
)
def comp_ep_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based classifier + evaluation harness — the AMC/RO routing
    prototype end-to-end (amc-ro-classification.Rmd:38-285): EPTEST_*
    flags built by child-table conditional aggregation (`count(case
    when ...) > 0` per case, A2 over the issues analog) plus
    case-level flags through dim joins, rowSums -> RO/AMC prediction;
    actuals from the last-observed-location argmax (J8); evaluated as
    per-flag positives and Type-I errors (the notebook's
    `colSums(testCases[testCases$type1, ...])` table, R3 wide->long).

    Scale shape: the flag build is one map-side-combinable groupBy of
    lineitem; the actual is one window over the same orderkey
    partitioning (AQE reuses the shuffle); flags unpivot via a
    plan-level explode — no per-flag scans."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")

    flags = li.groupBy(F.col("l_orderkey")).agg(
        F.max(F.when(F.col("l_quantity") > 45, 1).otherwise(0)).alias("f_bigqty"),
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias(
            "f_returned"
        ),
        F.max(F.when(F.col("l_tax") > 0.07, 1).otherwise(0)).alias("f_hitax"),
    )
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic export;
    # l_linestatus joins the tiebreak so rows tied on (shipdate, line)
    # with different statuses resolve identically in both engines (rows
    # tied on all three give the same `actual` either way)
    w = Window.partitionBy("l_orderkey").orderBy(
        F.col("l_shipdate").desc(),
        F.col("l_linenumber").desc(),
        F.col("l_linestatus").desc(),
    )
    last_line = (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_orderkey",
            F.when(F.col("l_linestatus") == "F", "RO")
            .otherwise("AMC")
            .alias("actual"),
        )
    )
    cases = (
        o.join(flags, o["o_orderkey"] == flags["l_orderkey"])
        .join(last_line, "l_orderkey")
        # unhinted (round-8 hint audit): customer is corpus-sized — a
        # hard broadcast hint would ship it whole at any scale; AQE
        # broadcasts while it is actually small
        .join(
            c.select("c_custkey", "c_mktsegment"),
            o["o_custkey"] == F.col("c_custkey"),
            "left",
        )
        .select(
            "f_bigqty",
            "f_returned",
            "f_hitax",
            F.when(F.col("c_mktsegment") == "BUILDING", 1)
            .otherwise(0)
            .alias("f_building"),
            F.when(F.col("o_orderpriority") == "1-URGENT", 1)
            .otherwise(0)
            .alias("f_urgent"),
            "actual",
        )
    )
    total = (
        F.col("f_bigqty")
        + F.col("f_returned")
        + F.col("f_hitax")
        + F.col("f_building")
        + F.col("f_urgent")
    )
    scored = cases.withColumn(
        "f_any", F.when(total > 0, 1).otherwise(0)
    ).withColumn("prediction", F.when(total > 0, "RO").otherwise("AMC"))
    names = ["f_bigqty", "f_returned", "f_hitax", "f_building", "f_urgent", "f_any"]
    long = scored.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(n).alias("flag"), F.col(n).cast("long").alias("v")
                    )
                    for n in names
                ]
            )
        ).alias("fl"),
        "prediction",
        "actual",
    ).select("fl.flag", "fl.v", "prediction", "actual")
    t1 = (F.col("v") == 1) & (F.col("prediction") == "RO") & (
        F.col("actual") == "AMC"
    )
    return (
        long.groupBy("flag")
        .agg(
            F.sum("v").alias("positive"),
            F.sum(F.when(t1, 1).otherwise(0)).alias("type1_error"),
        )
        .select(
            "flag",
            "positive",
            "type1_error",
            F.when(
                F.col("positive") > 0,
                ratio_dbl(F.col("type1_error"), F.col("positive"), 6),
            ).alias("err_rate"),
        )
        .orderBy("flag")
    )
