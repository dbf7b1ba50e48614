"""Reshape family (SURVEY.md §2.6 R1-R5): unpivot/pivot/fixed-width.

R1 unpivot is THE reference workhorse (`gather` in every extractor,
R/events.R:48-49). Spark's native ``DataFrame.unpivot`` (= SQL stack)
is a zero-shuffle map-side expansion — rows × k measures, no exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions.scalars import dec, ratio_dbl, sql_ratio_dbl
from ..registry import register


@register(
    "r1_unpivot_measures",
    oracle="""
    SELECT measure, l_returnflag,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total, COUNT(*) AS n
    FROM (
      SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'l_tax', l_tax FROM lineitem
    )
    GROUP BY measure, l_returnflag
    ORDER BY measure, l_returnflag
    """,
    tags=("R1",),
)
def r1_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide measures -> long (measure, value) rows — tidyr `gather` ≡
    DataFrame.unpivot (R/events.R:48-49, R1). Map-side only; the
    groupBy after it is the only exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ["l_returnflag"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "value",
    )
    return (
        long.groupBy("measure", "l_returnflag")
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
            F.count("*").alias("n"),
        )
        .orderBy("measure", "l_returnflag")
    )


@register(
    "r2_pivot_event_matrix",
    oracle="""
    SELECT user_id,
           COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
           COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
           COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
           COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("R2",),
)
def r2_pivot_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long -> wide pivot (tidyr `spread`, form8-changes.Rmd:62-68).
    Explicit pivot values => single pass, no distinct-discovery job —
    mandatory at scale."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .agg(F.count(F.lit(1)))
        .fillna(0)
        .orderBy("user_id")
    )


@register(
    "r4_fixed_width_split",
    oracle="""
    SELECT SUBSTRING(o_orderpriority, 1, 1) AS prio_code,
           SUBSTRING(o_orderpriority, 3) AS prio_name,
           regexp_extract(o_orderpriority, '^([0-9]+)-', 1) AS prio_digit,
           COUNT(*) AS n
    FROM orders
    GROUP BY 1, 2, 3
    ORDER BY prio_code
    """,
    tags=("R4", "F6"),
)
def r4_fixed_width_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width / positional string splitting — the reference's CVRR
    flag-string parse (the-david-ames-query.R:250-258, R4)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.substring("o_orderpriority", 1, 1).alias("prio_code"),
            F.substring("o_orderpriority", 3, 100).alias("prio_name"),
            F.regexp_extract("o_orderpriority", r"^([0-9]+)-", 1).alias("prio_digit"),
        )
        .agg(F.count("*").alias("n"))
        .orderBy("prio_code")
    )


@register(
    "r3_flags_long_confusion",
    oracle="""
    WITH pred AS (
      SELECT o_orderkey,
             o_orderpriority IN ('1-URGENT', '2-HIGH') AS expedite,
             o_totalprice > 200000 AS high_value,
             o_orderstatus = 'O' AS open
      FROM orders
    ), act AS (
      SELECT l_orderkey,
             MIN(CAST(l_shipdate AS DATE)) <= MIN(CAST(o_orderdate AS DATE)) + 45 AS expedite,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) > 200000 AS high_value,
             BOOL_OR(l_linestatus = 'O') AS open
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY l_orderkey
    ), pred_long AS (
      SELECT o_orderkey, 'expedite' AS flag, expedite AS p FROM pred
      UNION ALL SELECT o_orderkey, 'high_value', high_value FROM pred
      UNION ALL SELECT o_orderkey, 'open', open FROM pred
    ), act_long AS (
      SELECT l_orderkey, 'expedite' AS flag, expedite AS a FROM act
      UNION ALL SELECT l_orderkey, 'high_value', high_value FROM act
      UNION ALL SELECT l_orderkey, 'open', open FROM act
    )
    SELECT pl.flag,
           COUNT(CASE WHEN p AND COALESCE(a, FALSE) THEN 1 END) AS tp,
           COUNT(CASE WHEN p AND NOT COALESCE(a, FALSE) THEN 1 END) AS fp,
           COUNT(CASE WHEN NOT p AND COALESCE(a, FALSE) THEN 1 END) AS fn,
           COUNT(CASE WHEN NOT p AND NOT COALESCE(a, FALSE) THEN 1 END) AS tn
    FROM pred_long pl
    LEFT JOIN act_long al ON pl.o_orderkey = al.l_orderkey AND pl.flag = al.flag
    GROUP BY pl.flag
    ORDER BY pl.flag
    """,
    tags=("R3", "R1", "A8"),
)
def r3_flags_long_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-flags -> long pairs (special-issues.R:240-252: gather 20
    predicted flag columns, join to actuals per issue, confusion
    counts per flag). stack() unpivots both sides; the pair join is an
    equi-join on (order, flag). Orders with no lineitem rows count as
    actual=false via the left join + coalesce."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pred = o.select(
        "o_orderkey",
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("expedite"),
        (F.col("o_totalprice") > 200000).alias("high_value"),
        (F.col("o_orderstatus") == "O").alias("open"),
    )
    act = (
        li.join(o.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(
            (
                F.min(F.col("l_shipdate").cast("date"))
                <= F.date_add(F.min(F.col("o_orderdate").cast("date")), 45)
            ).alias("expedite"),
            (F.sum(dec("l_extendedprice")) > 200000).alias("high_value"),
            F.max(F.col("l_linestatus") == "O").alias("open"),
        )
    )
    stack_expr = (
        "stack(3, 'expedite', expedite, 'high_value', high_value, 'open', open) as (flag, v)"
    )
    pred_long = pred.select("o_orderkey", F.expr(stack_expr)).withColumnRenamed("v", "p")
    act_long = act.select("l_orderkey", F.expr(stack_expr)).withColumnRenamed("v", "a")
    joined = pred_long.join(
        act_long,
        (pred_long.o_orderkey == act_long.l_orderkey) & (pred_long.flag == act_long.flag),
        "left",
    )
    a = F.coalesce(act_long.a, F.lit(False))
    return (
        joined.groupBy(pred_long.flag.alias("flag"))
        .agg(
            F.count(F.when(pred_long.p & a, 1)).alias("tp"),
            F.count(F.when(pred_long.p & ~a, 1)).alias("fp"),
            F.count(F.when(~pred_long.p & a, 1)).alias("fn"),
            F.count(F.when(~pred_long.p & ~a, 1)).alias("tn"),
        )
        .orderBy("flag")
    )


@register(
    "r6_paired_field_changes",
    oracle=f"""
    WITH forms AS (
      SELECT o_orderkey,
             o_orderpriority AS final_priority,
             CASE WHEN o_orderkey % 3 = 0 THEN '3-MEDIUM'
                  ELSE o_orderpriority END AS initial_priority,
             o_orderstatus AS final_status,
             CASE WHEN o_totalprice > 100000 THEN 'O'
                  ELSE o_orderstatus END AS initial_status,
             CASE WHEN o_orderkey % 2 = 0 THEN 'noted' END AS final_note,
             CASE WHEN o_orderkey % 4 = 0 THEN 'noted' END AS initial_note
      FROM orders
    ), long AS (
      SELECT 'priority' AS field,
             COALESCE(initial_priority, 'NULL') AS i,
             COALESCE(final_priority, 'NULL') AS f FROM forms
      UNION ALL
      SELECT 'status', COALESCE(initial_status, 'NULL'),
             COALESCE(final_status, 'NULL') FROM forms
      UNION ALL
      SELECT 'note', COALESCE(initial_note, 'NULL'),
             COALESCE(final_note, 'NULL') FROM forms
    )
    SELECT field,
           CAST(COUNT(*) AS BIGINT) AS n_forms,
           CAST(SUM(CASE WHEN i <> f THEN 1 ELSE 0 END) AS BIGINT)
             AS n_changed,
           {sql_ratio_dbl(
               "SUM(CASE WHEN i <> f THEN 1 ELSE 0 END)", "COUNT(*)", 6
           )} AS change_rate
    FROM long GROUP BY field ORDER BY field
    """,
    tags=("R1", "R2", "COMPOSITE"),
)
def r6_paired_field_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired initial/final field-diff analysis (form8-changes.Rmd:
    33-70): gather the current and _INITIAL_ column pairs long, split
    the key into (field, version), spread back, and compare with NULL
    coerced to a comparable sentinel (the notebook's
    ``replace_na(list(value = "NULL"))`` — a NULL-vs-value pair counts
    as CHANGED, and NULL-vs-NULL as unchanged, which plain SQL
    inequality would return UNKNOWN for). Reported as the per-field
    change-rate table. Paired columns are derived deterministically
    from orders (the export has no versioned form table), exactly like
    the hearing/milestone extractors derive their inputs.

    The gather+spread collapses to a plan-level explode of
    (field, initial, final) structs — one scan, one groupBy."""
    o = load_table(spark, sf_dir, "orders")
    ok = F.col("o_orderkey")
    forms = o.select(
        F.col("o_orderpriority").alias("final_priority"),
        F.when(ok % 3 == 0, "3-MEDIUM")
        .otherwise(F.col("o_orderpriority"))
        .alias("initial_priority"),
        F.col("o_orderstatus").alias("final_status"),
        F.when(F.col("o_totalprice") > 100000, "O")
        .otherwise(F.col("o_orderstatus"))
        .alias("initial_status"),
        F.when(ok % 2 == 0, "noted").alias("final_note"),
        F.when(ok % 4 == 0, "noted").alias("initial_note"),
    )
    sent = lambda c: F.coalesce(F.col(c), F.lit("NULL"))  # noqa: E731
    pairs = [
        ("priority", "initial_priority", "final_priority"),
        ("status", "initial_status", "final_status"),
        ("note", "initial_note", "final_note"),
    ]
    long = forms.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("field"),
                        sent(i).alias("i"),
                        sent(f).alias("f"),
                    )
                    for name, i, f in pairs
                ]
            )
        ).alias("p")
    ).select("p.field", "p.i", "p.f")
    changed = F.when(F.col("i") != F.col("f"), 1).otherwise(0)
    return (
        long.groupBy("field")
        .agg(
            F.count("*").alias("n_forms"),
            F.sum(changed).alias("n_changed"),
        )
        .select(
            "field",
            "n_forms",
            "n_changed",
            ratio_dbl(F.col("n_changed"), F.col("n_forms"), 6).alias(
                "change_rate"
            ),
        )
        .orderBy("field")
    )


@register(
    "r7_scd2_dimension",
    oracle="""
    WITH runs AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN LAG(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, event_type, ts, event_id,
             SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS run_id
      FROM runs
    ), versions AS (
      SELECT user_id, run_id, MIN(event_type) AS attr_value,
             MIN(ts) AS valid_from, COUNT(*) AS n_events
      FROM numbered GROUP BY user_id, run_id
    )
    SELECT user_id, CAST(run_id AS INT) AS version, attr_value,
           valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY run_id)
             AS valid_to,
           CAST(LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY run_id)
                IS NULL AS INT) AS is_current,
           n_events
    FROM versions
    ORDER BY user_id, version
    """,
    tags=("R3", "W3", "W7"),
)
def r7_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing dimension build from the event stream —
    the warehouse-standard versioned dimension: consecutive runs of
    the same attribute value collapse to one version row carrying
    [valid_from, valid_to) and an is_current flag (open NULL valid_to
    on the latest). Gaps-and-islands via lag-change flags + running
    sum (one window pass), then a per-run rollup and a lead() to close
    each version with the next one's start — no self-join anywhere.

    Scale shape: two sorts of the same (user, ts) partitioning (the
    run window and the version lead reuse the partition key, so AQE
    plans one exchange), per-run rollup map-side-combines. Ties at
    identical ts break by event_id on both engines."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    runs = e.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.when(
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
        )
        .otherwise(0)
        .alias("is_start"),
    )
    numbered = runs.withColumn(
        "run_id",
        F.sum("is_start").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    versions = numbered.groupBy("user_id", "run_id").agg(
        F.min("event_type").alias("attr_value"),
        F.min("ts").alias("valid_from"),
        F.count("*").alias("n_events"),
    )
    wv = Window.partitionBy("user_id").orderBy("run_id")
    nxt = F.lead("valid_from").over(wv)
    return versions.select(
        "user_id",
        F.col("run_id").cast("int").alias("version"),
        "attr_value",
        "valid_from",
        nxt.alias("valid_to"),
        nxt.isNull().cast("int").alias("is_current"),
        "n_events",
    ).orderBy("user_id", "version")
