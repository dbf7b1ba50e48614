"""Projection / filter / scalar-predicate family (SURVEY.md §2.2 P1-P14,
§2.9 F1-F11).

Each query bundles several predicate/scalar shapes from the inventory.
All expressions are JVM builtins — every filter lands in the parquet
scan as a pushed filter (verify with .explain: PushedFilters), which is
the whole game at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.scalars import dsum, SQL_DSUM
from ..registry import register


@register(
    "p1_projection_alias_nulltest",
    oracle="""
    SELECT o_orderkey AS order_id,
           o_orderdate AS order_date,
           o_totalprice AS amount
    FROM orders
    WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
      AND o_orderstatus = 'O'
    ORDER BY order_id
    """,
    tags=("P1", "P2", "P3", "R5"),
)
def p1_projection_alias_nulltest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column projection + alias + conjunctive WHERE + null tests — the
    reference extractor preamble (R/events.R:30-43). Projection reaches
    the scan: ReadSchema carries only 4 of 6 columns."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(
            F.col("o_custkey").isNotNull()
            & F.col("o_orderdate").isNotNull()
            & (F.col("o_orderstatus") == "O")
        )
        .select(
            F.col("o_orderkey").alias("order_id"),
            F.col("o_orderdate").alias("order_date"),
            F.col("o_totalprice").alias("amount"),
        )
        .orderBy("order_id")
    )


@register(
    "p4_range_in_between",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_returnflag IN ('A', 'R')
      AND l_quantity BETWEEN 10 AND 40
      AND l_linestatus BETWEEN 'F' AND 'O'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("P4", "P5", "P6", "S7"),
)
def p4_range_in_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-range + IN-list + numeric/char BETWEEN (reference P4/P5/P6;
    char BETWEEN keeps Oracle's binary-collation semantics — Spark and
    DuckDB both compare codepoints)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & F.col("l_returnflag").isin("A", "R")
            & F.col("l_quantity").between(10, 40)
            & F.col("l_linestatus").between("F", "O")
        )
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), dsum("l_quantity").alias("qty"))
        .orderBy("l_returnflag")
    )


@register(
    "p7_like_rlike",
    oracle="""
    SELECT source,
           COUNT(CASE WHEN text LIKE '%spark%' THEN 1 END) AS n_like,
           COUNT(CASE WHEN regexp_matches(text, 'merge|join') THEN 1 END) AS n_rlike,
           COUNT(CASE WHEN text LIKE '%sc_n%' THEN 1 END) AS n_underscore,
           COUNT(*) AS n
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
    tags=("P7", "P8"),
)
def p7_like_rlike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE patterns incl. `_` wildcard + unanchored regex contains.

    R's `grepl` is contains-semantics (SURVEY §2.2 P8): Spark `rlike`
    and DuckDB `regexp_matches` are both unanchored contains, so the
    semantics line up without anchors."""
    d = load_table(spark, sf_dir, "documents")
    cnt = lambda c: F.count(F.when(c, 1))  # noqa: E731
    return (
        d.groupBy("source")
        .agg(
            cnt(F.col("text").like("%spark%")).alias("n_like"),
            cnt(F.col("text").rlike("merge|join")).alias("n_rlike"),
            cnt(F.col("text").like("%sc_n%")).alias("n_underscore"),
            F.count("*").alias("n"),
        )
        .orderBy("source")
    )


@register(
    "p9_case_when_derive",
    oracle="""
    SELECT CASE WHEN o_totalprice >= 300000 THEN 'jumbo'
                WHEN o_totalprice >= 150000 THEN 'large'
                WHEN o_totalprice >= 50000  THEN 'medium'
                ELSE 'small' END AS size_class,
           CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END AS is_rush,
           COUNT(*) AS n
    FROM orders
    GROUP BY 1, 2
    ORDER BY size_class, is_rush
    """,
    tags=("P9", "P10"),
)
def p9_case_when_derive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN ladders + 0/1 flag derivation (reference
    `case when BFSO in (...) then 1 else 0 end`,
    amc-ro-classification.Rmd:171-206)."""
    o = load_table(spark, sf_dir, "orders")
    size_class = (
        F.when(F.col("o_totalprice") >= 300000, "jumbo")
        .when(F.col("o_totalprice") >= 150000, "large")
        .when(F.col("o_totalprice") >= 50000, "medium")
        .otherwise("small")
    )
    is_rush = F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0)
    return (
        o.groupBy(size_class.alias("size_class"), is_rush.alias("is_rush"))
        .agg(F.count("*").alias("n"))
        .orderBy("size_class", "is_rush")
    )


@register(
    "p11_coalesce_least_greatest",
    oracle="""
    SELECT l_linestatus,
           COUNT(CASE WHEN COALESCE(NULLIF(l_returnflag, 'N'), 'X') = 'X' THEN 1 END) AS n_defaulted,
           MIN(LEAST(l_shipdate, TIMESTAMP '1997-06-01')) AS min_capped,
           MAX(GREATEST(l_shipdate, TIMESTAMP '1999-01-01')) AS max_floored
    FROM lineitem
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
    tags=("P11", "P12"),
)
def p11_coalesce_least_greatest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-coalescing (`nvl`) + least/greatest date clamping
    (reference ramp.R:24, capacity.R:55)."""
    li = load_table(spark, sf_dir, "lineitem")
    cap = F.lit("1997-06-01").cast("timestamp_ntz")
    floor_ = F.lit("1999-01-01").cast("timestamp_ntz")
    defaulted = F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("X"))
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.count(F.when(defaulted == "X", 1)).alias("n_defaulted"),
            F.min(F.least("l_shipdate", cap)).alias("min_capped"),
            F.max(F.greatest("l_shipdate", floor_)).alias("max_floored"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "p13_deterministic_topn",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
    tags=("P13", "O2", "O3"),
)
def p13_deterministic_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic top-N with tiebreak (reference `sample_n` /
    top-k selections, docket-order.R:321-325, opt-in-effects.R:35).
    orderBy+limit compiles to TakeOrderedAndProject — a per-partition
    top-N then a k-way merge, no global sort; exactly what survives at
    100 TB."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )


@register(
    "f5_string_functions",
    oracle="""
    SELECT p_brand,
           CONCAT('B:', SUBSTRING(p_brand, 7, 2)) AS brand_code,
           LPAD(SUBSTRING(p_brand, 7, 2), 4, '0') AS brand_padded,
           COUNT(CASE WHEN LENGTH(TRIM(p_type)) > 5 THEN 1 END) AS n_long_type,
           COUNT(CASE WHEN LOWER(p_type) = 'promo' THEN 1 END) AS n_promo,
           COUNT(CASE WHEN REGEXP_REPLACE(p_name, '[aeiou]', '', 'g') <> p_name THEN 1 END) AS n_vowel,
           COUNT(*) AS n
    FROM part
    GROUP BY p_brand
    ORDER BY p_brand
    """,
    tags=("F5", "F6", "F7", "F8"),
)
def f5_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar family: concat/substr/lpad/trim/length/lower/
    regexp_replace (reference F5-F8: `||` concat, corlid rjust(8,'0'),
    gsub/tolower, sprintf pad)."""
    p = load_table(spark, sf_dir, "part")
    code = F.substring("p_brand", 7, 2)
    return (
        p.groupBy(
            F.col("p_brand"),
            F.concat(F.lit("B:"), code).alias("brand_code"),
            F.lpad(code, 4, "0").alias("brand_padded"),
        )
        .agg(
            F.count(F.when(F.length(F.trim(F.col("p_type"))) > 5, 1)).alias("n_long_type"),
            F.count(F.when(F.lower("p_type") == "promo", 1)).alias("n_promo"),
            F.count(
                F.when(F.regexp_replace(F.col("p_name"), "[aeiou]", "") != F.col("p_name"), 1)
            ).alias("n_vowel"),
            F.count("*").alias("n"),
        )
        .orderBy("p_brand")
    )


@register(
    "f3_date_arithmetic",
    oracle="""
    SELECT YEAR(o_orderdate) AS order_year,
           CAST(MIN(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY) AS DATE) AS min_due,
           CAST(MAX(o_orderdate - INTERVAL 1 MONTH) AS DATE) AS max_prev_month,
           MAX(DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '2002-01-01')) AS max_age_days,
           COUNT(*) AS n
    FROM orders
    GROUP BY 1
    ORDER BY order_year
    """,
    tags=("F1", "F3"),
)
def f3_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic: date_add / add_months / datediff (reference F3:
    `DEASSIGN - BFD19`, `+ months(1)`, docket-order.R:153)."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return (
        o.groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.min(F.date_add(d, 30)).alias("min_due"),
            F.max(F.add_months(d, -1)).alias("max_prev_month"),
            F.max(F.datediff(F.lit("2002-01-01").cast("date"), d)).alias("max_age_days"),
            F.count("*").alias("n"),
        )
        .orderBy("order_year")
    )


@register(
    "f9_math_functions",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(ABS(l_extendedprice - 50000) AS DECIMAL(18,2))) AS DOUBLE) AS sum_abs_dev,
           CAST(SUM(CAST(ROUND(l_extendedprice, -3) AS DECIMAL(18,2))) AS DOUBLE) AS sum_rounded_k,
           CAST(SUM(CAST(FLOOR(l_quantity / 10) AS BIGINT)) AS BIGINT) AS sum_decile,
           CAST(SUM(CAST(CEIL(l_discount * 100) AS BIGINT)) AS BIGINT) AS sum_disc_pct
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("F9", "F10"),
)
def f9_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalars: abs/round/floor/ceil. Results routed through
    decimal/int sums for cross-engine determinism (F9)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(F.abs(F.col("l_extendedprice") - 50000).cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_abs_dev"),
            F.sum(F.round(F.col("l_extendedprice"), -3).cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_rounded_k"),
            F.sum(F.floor(F.col("l_quantity") / 10).cast("bigint")).cast("bigint").alias("sum_decile"),
            F.sum(F.ceil(F.col("l_discount") * 100).cast("bigint")).cast("bigint").alias("sum_disc_pct"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "f11_json_extract",
    oracle="""
    SELECT event_type,
           COUNT(CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) >= 50 THEN 1 END) AS n_high,
           MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("F11", "S8"),
)
def f11_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props extraction — get_json_object stays
    JVM-side; at 100 TB prefer `from_json` with an explicit schema once
    per pipeline instead of repeated path extraction."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.when(k >= 50, 1)).alias("n_high"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


@register(
    "p14_complete_cases",
    oracle="""
    WITH derived AS (
      SELECT o_orderkey,
             NULLIF(o_orderstatus, 'P') AS status_known,
             CASE WHEN o_totalprice > 100 THEN o_totalprice END AS price_ok
      FROM orders
    )
    SELECT COUNT(*) AS n_total,
           COUNT(CASE WHEN status_known IS NOT NULL
                       AND price_ok IS NOT NULL THEN 1 END) AS n_complete,
           COUNT(CASE WHEN status_known IS NULL
                       OR price_ok IS NULL THEN 1 END) AS n_dropped
    FROM derived
    """,
    tags=("P14", "P11"),
)
def p14_complete_cases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complete-cases filter (docket-order.R:325 drops rows with any
    NA before model fitting): derive nullable columns, count survivors
    of df.na.drop() against the total."""
    o = load_table(spark, sf_dir, "orders")
    derived = o.select(
        "o_orderkey",
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_known"),
        F.when(F.col("o_totalprice") > 100, F.col("o_totalprice")).alias("price_ok"),
    )
    complete = derived.na.drop()
    return (
        derived.agg(F.count("*").alias("n_total"))
        .crossJoin(complete.agg(F.count("*").alias("n_complete")))
        .select(
            "n_total",
            "n_complete",
            (F.col("n_total") - F.col("n_complete")).alias("n_dropped"),
        )
    )
