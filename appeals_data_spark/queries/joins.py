"""Join family (SURVEY.md §2.3 J1-J18).

Physical-plan intent per query is documented inline: dims broadcast
(BHJ), facts sort-merge on their keys, wildcard/theta joins forced to
BHJ via broadcast() so they never degenerate into BNLJ over a big side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import literal_dim, load_table
from ..functions.scalars import SQL_DISC_PRICE, disc_price, dsum
from ..registry import register


@register(
    "j1_revenue_by_nation",
    oracle=f"""
    SELECT n_name,
           COUNT(DISTINCT o_orderkey) AS n_orders,
           CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
    tags=("J1", "A1"),
    bench=True,
)
def j1_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈fact⋈dim star join (reference BRIEFF⋈FOLDER + dims, J1).

    Plan: lineitem⋈orders SMJ/shuffle-hash on orderkey, then an
    order-grain pre-aggregation BEFORE the customer join — it reuses
    the orderkey partitioning the join just established (no extra
    shuffle), shrinks the customer-join input from line grain to order
    grain, and turns the per-nation distinct-order count into a plain
    count (no Expand for a distinct aggregate). At 100 TB, bucketing
    lineitem and orders by orderkey turns the big join co-partitioned
    (no shuffle); AQE handles the orderkey skew tail."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    per_order = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_custkey")
        .agg(F.sum(disc_price()).alias("_rev"))
    )
    return (
        per_order.join(c, per_order.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.sum("_rev").cast("double").alias("revenue"),
        )
        .orderBy("n_name")
    )


@register(
    "j2_left_join_order_counts",
    oracle="""
    SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey AND o_orderstatus = 'F'
    GROUP BY c_custkey, c_name
    ORDER BY c_custkey
    """,
    tags=("J2",),
)
def j2_left_join_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join preserving parents with 0 children (reference `left
    join ISSUES on BFKEY=ISSKEY`, J2); count(col) skips nulls exactly
    like SQL."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_custkey")
    )


@register(
    "j3_composite_key_join",
    oracle=f"""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             COUNT(*) AS n_lines,
             SUM({SQL_DISC_PRICE}) AS pair_rev
      FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT s_name,
           COUNT(*) AS n_pairs,
           CAST(SUM(pair_rev) AS DOUBLE) AS revenue
    FROM ps
    JOIN supplier ON ps.l_suppkey = s_suppkey
    JOIN part     ON ps.l_partkey = p_partkey AND p_size >= 25
    GROUP BY s_name
    ORDER BY s_name
    """,
    tags=("J3", "J7", "J11"),
)
def j3_composite_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-aggregate to a composite key then join (reference J3 RMDREA
    composite join + J7 pre-agg-then-join). The pre-aggregation shrinks
    the 1:N side before the join — the reference's manual optimization,
    kept deliberately (Catalyst won't push aggs below joins)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") >= 25)
    # Keep the intermediate exact-decimal: re-casting a computed DOUBLE
    # back to decimal rounds via shortest-string in Spark vs exact
    # binary in DuckDB and diverges on .xx5 boundaries.
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.count("*").alias("n_lines"),
        F.sum(disc_price()).alias("pair_rev"),
    )
    return (
        ps.join(s, ps.l_suppkey == s.s_suppkey)
        .join(p, ps.l_partkey == p.p_partkey)
        .groupBy("s_name")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum("pair_rev").cast("double").alias("revenue"),
        )
        .orderBy("s_name")
    )


# Literal wildcard-classification dim: (brand_pat, status_pat, category).
# '##' is the reference's hierarchical wildcard (ISSREF, J4).
_WILDCARD_DIM = [
    ("Brand#11", "##", "flagship"),
    ("Brand#22", "F", "legacy-finished"),
    ("Brand#22", "##", "legacy"),
    ("##", "P", "pending-any"),
    ("##", "##", "other"),
]


@register(
    "j4_wildcard_hierarchy_join",
    oracle="""
    WITH dim(brand_pat, status_pat, category, prio) AS (VALUES
      ('Brand#11', '##', 'flagship', 1),
      ('Brand#22', 'F', 'legacy-finished', 2),
      ('Brand#22', '##', 'legacy', 3),
      ('##', 'P', 'pending-any', 4),
      ('##', '##', 'other', 5)
    ), joined AS (
      SELECT p_partkey, o_orderstatus, category, prio,
             ROW_NUMBER() OVER (PARTITION BY l_orderkey, l_linenumber ORDER BY prio) AS rn
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN part   ON l_partkey = p_partkey
      JOIN dim    ON (brand_pat = '##' OR brand_pat = p_brand)
                 AND (status_pat = '##' OR status_pat = o_orderstatus)
    )
    SELECT category, COUNT(*) AS n
    FROM joined WHERE rn = 1
    GROUP BY category
    ORDER BY category
    """,
    tags=("J4", "J14"),
)
def j4_wildcard_hierarchy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical wildcard ('##') classification join — the
    reference's ISSUES⋈ISSREF taxonomy join (effect-on-outcomes.
    Rmd:95-106, J4). The dim is tiny and the condition disjunctive, so
    it MUST broadcast (BHJ); a shuffled theta join would be O(n·m).
    Best-match precedence via row_number over dim priority."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")
    dim = literal_dim(
        spark,
        [(b, s, c, i + 1) for i, (b, s, c) in enumerate(_WILDCARD_DIM)],
        "brand_pat string, status_pat string, category string, prio int",
    )
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(p, li.l_partkey == p.p_partkey)
        .join(
            F.broadcast(dim),
            ((dim.brand_pat == "##") | (dim.brand_pat == p.p_brand))
            & ((dim.status_pat == "##") | (dim.status_pat == o.o_orderstatus)),
        )
    )
    w = Window.partitionBy("l_orderkey", "l_linenumber").orderBy("prio")
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("category")
        .agg(F.count("*").alias("n"))
        .orderBy("category")
    )


@register(
    "j5_concat_key_join",
    oracle="""
    WITH dim(ftkey, ftdesc) AS (VALUES
      ('BR11', 'brand eleven'), ('BR22', 'brand twenty-two'),
      ('BR33', 'brand thirty-three'), ('BR44', 'brand forty-four')
    )
    SELECT ftdesc, COUNT(*) AS n
    FROM part
    JOIN dim ON CONCAT('BR', SUBSTRING(p_brand, 7, 2)) = ftkey
    GROUP BY ftdesc
    ORDER BY ftdesc
    """,
    tags=("J5", "F5"),
)
def j5_concat_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-built join key against a code dim — the reference's
    `'DG'||ISSLEV1 = FTKEY` VFTYPES join (J5). Computed equi-key, so
    despite the expression it hash-joins (broadcast)."""
    p = load_table(spark, sf_dir, "part")
    dim = literal_dim(
        spark,
        [("BR11", "brand eleven"), ("BR22", "brand twenty-two"),
         ("BR33", "brand thirty-three"), ("BR44", "brand forty-four")],
        "ftkey string, ftdesc string",
    )
    key = F.concat(F.lit("BR"), F.substring("p_brand", 7, 2))
    return (
        p.join(F.broadcast(dim), key == dim.ftkey)
        .groupBy("ftdesc")
        .agg(F.count("*").alias("n"))
        .orderBy("ftdesc")
    )


@register(
    "j6_nonequi_temporal_join",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_late_lines,
           COUNT(DISTINCT o_orderkey) AS n_orders
    FROM orders
    JOIN lineitem ON l_orderkey = o_orderkey
                 AND l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    tags=("J6",),
)
def j6_nonequi_temporal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join with residual temporal predicate (reference
    `HEARING_DATE < BFDDEC`, J6). The equi half carries the join
    strategy (SMJ); the `<` is a residual filter — no BNLJ."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > F.timestamp_add("DAY", F.lit(60), o.o_orderdate)),
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_late_lines"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "j8_argmax_latest_order",
    oracle="""
    SELECT c_custkey, o_orderkey AS last_orderkey, o_orderdate AS last_orderdate
    FROM (
      SELECT c_custkey, o_orderkey, o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY c_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM customer JOIN orders ON c_custkey = o_custkey
    )
    WHERE rn = 1
    ORDER BY c_custkey
    """,
    tags=("J8", "A11", "W4"),
)
def j8_argmax_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax-row retrieval — reference does groupby-max + join-back
    (time-to-ep.Rmd:54-65, J8); the Spark-native form is one window
    pass (row_number desc == 1), halving the scans. Deterministic
    tiebreak on orderkey."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("c_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .select("c_custkey", "o_orderkey", "o_orderdate")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_custkey",
            F.col("o_orderkey").alias("last_orderkey"),
            F.col("o_orderdate").alias("last_orderdate"),
        )
        .orderBy("c_custkey")
    )


@register(
    "j9_self_join_pairs",
    oracle="""
    SELECT r_name, COUNT(*) AS n_pairs
    FROM nation a
    JOIN nation b ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    JOIN region ON a.n_regionkey = r_regionkey
    GROUP BY r_name
    ORDER BY r_name
    """,
    tags=("J9",),
)
def j9_self_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Role-aliased self-join (reference STAFF parent-location self
    join, R/events.R:89-92, J9)."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    a, b = n.alias("a"), n.alias("b")
    return (
        a.join(
            b,
            (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
            & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
        )
        .join(F.broadcast(r), F.col("a.n_regionkey") == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("r_name")
    )


@register(
    "j13_right_join_fillna",
    oracle="""
    SELECT c_mktsegment,
           COUNT(CASE WHEN has_order THEN 1 END) AS n_with,
           COUNT(CASE WHEN NOT has_order THEN 1 END) AS n_without
    FROM (
      SELECT c_mktsegment, COALESCE(o.o_custkey IS NOT NULL, FALSE) AS has_order
      FROM (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'P') o
      RIGHT JOIN customer ON o.o_custkey = c_custkey
    )
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("J13",),
)
def j13_right_join_fillna(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right join + replace_na(FALSE) — reference `views right_join
    decisions %>% replace_na(caseflow=FALSE)` (impact.R:421-424)."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "P")
        .select("o_custkey")
        .distinct()
    )
    joined = o.join(c, o.o_custkey == c.c_custkey, "right").withColumn(
        "has_order", F.coalesce(F.col("o_custkey").isNotNull(), F.lit(False))
    )
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.when(F.col("has_order"), 1)).alias("n_with"),
            F.count(F.when(~F.col("has_order"), 1)).alias("n_without"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "j15_anti_semi_join",
    oracle="""
    SELECT n_name,
           (SELECT COUNT(*) FROM customer c
             WHERE c.c_nationkey = n.n_nationkey
               AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS n_never_ordered,
           (SELECT COUNT(*) FROM customer c
             WHERE c.c_nationkey = n.n_nationkey
               AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                             AND o.o_totalprice > 400000)) AS n_big_spenders
    FROM nation n
    GROUP BY n_name, n_nationkey
    ORDER BY n_name
    """,
    tags=("J15", "U4"),
)
def j15_anti_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_anti / left_semi joins (reference "not in caseflow" NA
    checks, impact.R:222-224, J15). Anti/semi never widen rows — the
    safe existence-check shape at scale."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    never = c.join(o, c.c_custkey == o.o_custkey, "left_anti")
    big = c.join(
        o.filter(F.col("o_totalprice") > 400000),
        c.c_custkey == o.o_custkey,
        "left_semi",
    )
    never_n = never.groupBy("c_nationkey").agg(F.count("*").alias("n_never_ordered"))
    big_n = big.groupBy("c_nationkey").agg(F.count("*").alias("n_big_spenders"))
    return (
        F.broadcast(n)
        .join(never_n, n.n_nationkey == never_n.c_nationkey, "left")
        .drop("c_nationkey")
        .join(big_n, n.n_nationkey == big_n.c_nationkey, "left")
        .select(
            "n_name",
            F.coalesce("n_never_ordered", F.lit(0)).alias("n_never_ordered"),
            F.coalesce("n_big_spenders", F.lit(0)).alias("n_big_spenders"),
        )
        .orderBy("n_name")
    )


@register(
    "j18_cross_join_grid",
    oracle="""
    WITH years AS (SELECT UNNEST(generate_series(1995, 2001)) AS yr),
         counts AS (
           SELECT c_mktsegment, YEAR(o_orderdate) AS yr, COUNT(*) AS n
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY 1, 2
         )
    SELECT s.c_mktsegment, years.yr, COALESCE(counts.n, 0) AS n
    FROM (SELECT DISTINCT c_mktsegment FROM customer) s
    CROSS JOIN years
    LEFT JOIN counts ON counts.c_mktsegment = s.c_mktsegment AND counts.yr = years.yr
    ORDER BY s.c_mktsegment, years.yr
    """,
    tags=("J18", "J13", "S8"),
)
def j18_cross_join_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense grid expansion: cross join segments × years, left join
    observed counts, fill zeros (reference `merge(steps, weeks,
    by=NULL)` grid, event-history.R:330-335, J18). Grid sides are tiny
    -> broadcast cartesian is safe; never cross-join two big sides."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    years = spark.range(1995, 2002).select(F.col("id").cast("int").alias("yr"))
    segs = c.select("c_mktsegment").distinct()
    counts = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", F.year("o_orderdate").alias("yr"))
        .agg(F.count("*").alias("n"))
    )
    grid = segs.crossJoin(F.broadcast(years))
    return (
        grid.join(counts, ["c_mktsegment", "yr"], "left")
        .select("c_mktsegment", "yr", F.coalesce("n", F.lit(0)).alias("n"))
        .orderBy("c_mktsegment", "yr")
    )


@register(
    "x1_derived_count_scalars",
    oracle="""
    WITH line_counts AS (
      SELECT l_orderkey,
             COUNT(*) AS cnt_lines,
             COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS cnt_returned,
             COUNT(CASE WHEN l_linestatus = 'O' THEN 1 END) AS cnt_open
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(COALESCE(cnt_lines, 0)) AS BIGINT) AS total_lines,
           CAST(SUM(COALESCE(cnt_returned, 0)) AS BIGINT) AS total_returned,
           COUNT(CASE WHEN COALESCE(cnt_open, 0) > 0 THEN 1 END) AS n_with_open
    FROM orders LEFT JOIN line_counts ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("X1", "J7", "A2"),
)
def x1_derived_count_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-stored-function replacement (SURVEY §2.11 X1:
    VACOLS.ISSUE_CNT_* / DIARY_CNT_OPEN used as scalar calls,
    time-to-ep.Rmd:47-49): reimplemented as derived-column views —
    pre-aggregate the child table once, left-join the counts back as
    scalar columns. Catalyst keeps the whole thing JVM-side; a
    per-row UDF/subquery would re-scan lineitem per order."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_orderkey").agg(
        F.count("*").alias("cnt_lines"),
        F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("cnt_returned"),
        F.count(F.when(F.col("l_linestatus") == "O", 1)).alias("cnt_open"),
    )
    return (
        o.join(counts, o.o_orderkey == counts.l_orderkey, "left")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.coalesce("cnt_lines", F.lit(0))).alias("total_lines"),
            F.sum(F.coalesce("cnt_returned", F.lit(0))).alias("total_returned"),
            F.count(F.when(F.coalesce("cnt_open", F.lit(0)) > 0, 1)).alias("n_with_open"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "x1_rr_hearing_postrem",
    oracle="""
    WITH flags AS (
      SELECT o.o_orderkey,
             CASE WHEN COUNT(CASE WHEN l.l_returnflag = 'R' THEN 1 END) > 0
                  THEN 'Y' ELSE 'N' END AS rr_hearing,
             CASE WHEN COUNT(CASE WHEN l.l_linestatus = 'F'
                                   AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                             THEN 1 END) > 0
                  THEN 'Y' ELSE 'N' END AS hearing_held_postrem
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey
    ), pending AS (
      SELECT o.o_custkey, o.o_orderstatus
      FROM orders o LEFT JOIN flags f ON f.o_orderkey = o.o_orderkey
      WHERE (o.o_orderstatus = 'O'
             AND o.o_orderpriority IN ('1-URGENT', '2-HIGH'))
         OR (o.o_orderstatus = 'P'
             AND (o.o_orderdate >= TIMESTAMP '1995-01-01'
                  OR COALESCE(f.rr_hearing, 'N') = 'Y')
             AND COALESCE(f.hearing_held_postrem, 'N') <> 'Y')
    )
    SELECT n.n_name AS nation,
           COUNT(*) AS n_pending,
           COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_advance,
           COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_remand
    FROM pending p
    JOIN customer c ON p.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY nation
    """,
    tags=("X1", "J6", "J7"),
)
def x1_rr_hearing_postrem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The last two stored functions on the X1 list:
    ``vacols.rr_hearing(BFKEY)`` and
    ``vacols.hearing_held_postrem(BFKEY, BFDDEC)`` as used by the
    pending-hearings cascade (reference scratch/hearings/by-ro.R:39-53:
    REM cases are pending iff a hearing is requested/record-ready AND
    no hearing was HELD after the remand decision date). Both are
    per-case scalars derived from the child hearing table — the
    classic X1 rewrite: ONE equi-join + grouped conditional counts
    (the decision-date comparison rides the join as a residual
    predicate, J6 shape), left-joined back as scalar columns (J7),
    then the reference's two-arm pending filter and a per-office
    (nation analog) rollup.

    Scale: orders joins lineitem on the orderkey (SMJ, both sides
    hash-partitioned on the key — no BNLJ; the 90-day comparison is a
    residual inside the conditional count, never a join condition on
    its own), one groupBy on the same key (no extra Exchange under
    the join's partitioning), and the flags frame joins back to
    orders on that key again. The nation dim broadcasts."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    flags = (
        o.select("o_orderkey", "o_orderdate")
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(
            F.when(
                F.count(F.when(F.col("l_returnflag") == "R", 1)) > 0, "Y"
            )
            .otherwise("N")
            .alias("rr_hearing"),
            F.when(
                F.count(
                    F.when(
                        (F.col("l_linestatus") == "F")
                        & (
                            F.col("l_shipdate")
                            > F.timestamp_add("DAY", F.lit(90), F.col("o_orderdate"))
                        ),
                        1,
                    )
                )
                > 0,
                "Y",
            )
            .otherwise("N")
            .alias("hearing_held_postrem"),
        )
    )
    pending = (
        o.join(flags, "o_orderkey", "left")
        .where(
            (
                (F.col("o_orderstatus") == "O")
                & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            )
            | (
                (F.col("o_orderstatus") == "P")
                & (
                    (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
                    | (F.coalesce("rr_hearing", F.lit("N")) == "Y")
                )
                & (F.coalesce("hearing_held_postrem", F.lit("N")) != "Y")
            )
        )
        .select("o_custkey", "o_orderstatus")
    )
    return (
        pending.join(c, pending.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_pending"),
            F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_advance"),
            F.count(F.when(F.col("o_orderstatus") == "P", 1)).alias("n_remand"),
        )
        .orderBy("nation")
    )


@register(
    "j20_rule_cascade_parent",
    oracle="""
    WITH seq AS (
      SELECT o_custkey, o_orderkey, o_orderpriority,
             CAST(o_orderdate AS DATE) AS od,
             LAG(o_orderkey) OVER (PARTITION BY o_custkey, o_orderpriority
                                   ORDER BY o_orderdate, o_orderkey) AS same_pri_parent,
             LAG(o_orderkey) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS prev_any,
             LAG(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS prev_any_date
      FROM orders
    )
    SELECT CASE WHEN same_pri_parent IS NOT NULL THEN 'same_priority'
                WHEN prev_any IS NOT NULL
                     AND date_diff('day', prev_any_date, od) <= 180 THEN 'recent_any'
                ELSE 'stream_root' END AS match_rule,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers
    FROM seq
    GROUP BY match_rule
    ORDER BY match_rule
    """,
    tags=("J20", "W2", "P9"),
)
def j20_rule_cascade_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-cascade parent matching (unified-appeal-streams.R:39-137:
    strip 'B'/'W' suffix, else match BFDPDCN=BFDDEC, else tiebreak):
    each order links to the latest earlier same-priority order, else
    any order within 180 days, else starts a stream. Two window lags
    over different partition keys + a case_when cascade — no joins.
    Scale: two shuffles (custkey+priority, custkey); AQE coalesces."""
    o = load_table(spark, sf_dir, "orders")
    w_pri = Window.partitionBy("o_custkey", "o_orderpriority").orderBy(
        "o_orderdate", "o_orderkey"
    )
    w_any = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("od"),
        F.lag("o_orderkey").over(w_pri).alias("same_pri_parent"),
        F.lag("o_orderkey").over(w_any).alias("prev_any"),
        F.lag(F.col("o_orderdate").cast("date")).over(w_any).alias("prev_any_date"),
    )
    rule = (
        F.when(F.col("same_pri_parent").isNotNull(), "same_priority")
        .when(
            F.col("prev_any").isNotNull()
            & (F.datediff("od", "prev_any_date") <= 180),
            "recent_any",
        )
        .otherwise("stream_root")
    )
    return (
        seq.groupBy(rule.alias("match_rule"))
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
        .orderBy("match_rule")
    )


@register(
    "j12_cross_source_join",
    oracle="""
    WITH activity AS (
      SELECT user_id, COUNT(*) AS n_events,
             COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchases
      FROM events GROUP BY user_id
    ), accounts AS (
      SELECT o_custkey % 150 AS user_id, COUNT(*) AS n_orders
      FROM orders GROUP BY o_custkey % 150
    )
    SELECT CASE WHEN n_purchases > 0 THEN 'purchaser' ELSE 'browser' END
             AS segment,
           COUNT(*) AS n_users,
           CAST(SUM(COALESCE(n_orders, 0)) AS BIGINT) AS total_orders,
           CAST(SUM(n_events) AS BIGINT) AS total_events
    FROM activity LEFT JOIN accounts USING (user_id)
    GROUP BY segment ORDER BY segment
    """,
    tags=("J12",),
)
def j12_cross_source_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source join in one session (reference J12: VACOLS df ⋈
    Caseflow df client-side, amy-97-list.R:20-22; here the event
    stream joins the order system's ledger). Both pre-aggregated to
    the shared key before joining — the shuffled payload is two tiny
    aggregates, not either fact table."""
    e = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    activity = e.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_purchases"),
    )
    accounts = o.groupBy((F.col("o_custkey") % 150).alias("user_id")).agg(
        F.count("*").alias("n_orders")
    )
    seg = F.when(F.col("n_purchases") > 0, "purchaser").otherwise("browser")
    return (
        activity.join(accounts, "user_id", "left")
        .groupBy(seg.alias("segment"))
        .agg(
            F.count("*").alias("n_users"),
            F.sum(F.coalesce("n_orders", F.lit(0))).alias("total_orders"),
            F.sum("n_events").alias("total_events"),
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# J21: the 100 TB fact-fact layout. tests/test_bucketing.py proves the
# co-partitioned plan property; this registered twin makes the layout
# claim a driver-checked artifact (green CORRECTNESS row + the plan
# gate's Exchange assertion in tests/test_plans.py::test_j21_*).
# ---------------------------------------------------------------------------

def bucketed_fact_tables(spark: SparkSession, sf_dir: str):
    """Materialize orders/lineitem bucketed by order key (8 buckets,
    sorted) and return them as catalog tables. This is SURVEY §4's
    prescribed layout: both facts hash-clustered on the join key at
    WRITE time, so every subsequent key join is a zipped scan-to-scan
    sort-merge with zero shuffle — the layout that kills the dominant
    fact-fact exchange at 100 TB (where re-shuffling 100 TB per query
    is the bottleneck; here the one-time write cost amortizes over
    every downstream join). Write-once per session via
    catalog.scratch_path_once (session-private path; table names are
    session-catalog-scoped already)."""
    import hashlib
    import os

    from ..catalog import scratch_path_once

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    o_name, li_name = f"orders_bkt_{tag}", f"lineitem_bkt_{tag}"

    def write(base: str) -> None:
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority"
        )
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice"
        )
        for df, name, col in (
            (o, o_name, "o_orderkey"),
            (li, li_name, "l_orderkey"),
        ):
            (
                df.write.bucketBy(8, col)
                .sortBy(col)
                .mode("overwrite")
                .option("path", os.path.join(base, name))
                .saveAsTable(name)
            )

    scratch_path_once(spark, sf_dir, "bkt", write)
    return spark.table(o_name), spark.table(li_name)


@register(
    "j21_bucketed_copartition_join",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("J21", "J1", "S9", "SCALE"),
)
def j21_bucketed_copartition_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join over the bucketed layout (SURVEY §4): lineitem
    joins orders scan-to-scan on the bucket key — no exchange on either
    join side (asserted in tests/test_plans.py); the only shuffle in
    the query feeds the final priority rollup. hint('merge') pins SMJ
    so the plan exercises the bucket co-partitioning rather than
    broadcasting the small local-test side (at 100 TB neither side
    broadcasts). Bucketing never changes content, so the oracle is the
    plain join on the raw tables."""
    o_b, li_b = bucketed_fact_tables(spark, sf_dir)
    return (
        li_b.hint("merge")
        .join(o_b, li_b["l_orderkey"] == o_b["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "j22_binned_range_join",
    oracle=None,  # bound below (needs the scalars import dance)
    tags=("J22", "RANGE", "J17"),
)
def j22_binned_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large×large point-in-interval join WITHOUT an equi key — the
    backlog/concurrency family (J17/A15 semantics) where BOTH sides
    are data-sized, so neither the calendar-grid broadcast
    (operators.pit.date_grid) nor a dimension broadcast applies: how
    many order windows (o_orderdate .. +7d) were active when each
    URGENT order was placed, rolled up per month. A bare interval
    predicate would plan as BNLJ/cartesian; the binned operator
    (operators.range_join) explodes each interval into ≤2 epoch bins
    and equi-joins on bin id + residual re-check — hash-partitioned
    shuffle, the shape that survives two 100 TB sides.

    Plan note — two valid physical shapes, chosen by payload:
    * pair-payload range joins (each match row carries interval
      attributes) go through operators.range_join's binned equi-join —
      exercised and equivalence-gated in tests/test_range_join.py;
    * THIS query's measure is a pure per-date count with uniform
      self-exclusion (every order's own window covers its own date),
      so conc(p) = coverage[p_date] − 1 and the interval side
      pre-aggregates to a per-day coverage table (one explode of ≤8
      day rows per interval, one count) — density-LINEAR where any
      pair-enumerating plan is density-QUADRATIC. The oracle states
      the quadratic pair semantics directly; hash equality proves the
      rewrite.

    Zero-concurrency points fall out naturally (coverage ≥ 1 always);
    avg goes through ratio_dec, so every output value is
    integer/exact-decimal."""
    from ..functions.scalars import month_trunc, ratio_dbl

    o = load_table(spark, sf_dir, "orders")
    pts = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderdate").cast("date").alias("p_date"),
    )
    cover = (
        o.select(
            F.explode(
                F.sequence(
                    F.col("o_orderdate").cast("date"),
                    F.date_add(F.col("o_orderdate").cast("date"), 7),
                )
            ).alias("d")
        )
        .groupBy("d")
        .agg(F.count("*").alias("n_cover"))
    )
    per_pt = pts.join(cover, pts.p_date == cover.d).select(
        "p_date", (F.col("n_cover") - 1).alias("conc")
    )
    return (
        per_pt.groupBy(month_trunc("p_date").alias("month"))
        .agg(
            F.count("*").cast("long").alias("n_urgent"),
            ratio_dbl(F.sum("conc"), F.count("*"), 6, 6).alias(
                "avg_concurrency"
            ),
            F.max("conc").cast("long").alias("max_concurrency"),
        )
        .orderBy("month")
    )


def _j22_oracle() -> str:
    from ..functions.scalars import sql_ratio_dbl

    avg_sql = sql_ratio_dbl("SUM(conc)", "COUNT(*)", 6, 6)
    return f"""
    WITH pts AS (
      SELECT o_orderkey AS p_key, CAST(o_orderdate AS DATE) AS p_date
      FROM orders WHERE o_orderpriority = '1-URGENT'
    ), ivs AS (
      SELECT o_orderkey AS i_key, CAST(o_orderdate AS DATE) AS s,
             CAST(o_orderdate AS DATE) + 7 AS e
      FROM orders
    ), m AS (
      SELECT p.p_key, p.p_date, COUNT(*) AS nconc
      FROM pts p JOIN ivs i
        ON p.p_date >= i.s AND p.p_date <= i.e AND p.p_key <> i.i_key
      GROUP BY p.p_key, p.p_date
    ), per_pt AS (
      SELECT p.p_date, COALESCE(m.nconc, 0) AS conc
      FROM pts p LEFT JOIN m ON p.p_key = m.p_key AND p.p_date = m.p_date
    )
    SELECT CAST(DATE_TRUNC('month', p_date) AS DATE) AS month,
           CAST(COUNT(*) AS BIGINT) AS n_urgent,
           {avg_sql} AS avg_concurrency,
           CAST(MAX(conc) AS BIGINT) AS max_concurrency
    FROM per_pt GROUP BY month ORDER BY month
    """


from ..registry import REGISTRY as _REG  # noqa: E402

_REG["j22_binned_range_join"].oracle = _j22_oracle()
