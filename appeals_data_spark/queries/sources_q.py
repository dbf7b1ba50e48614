"""Source/sink family (SURVEY.md §2.1 S5-S9).

The reference keeps tiny dimension files as local CSVs joined
client-side (ro.csv / docket.csv, certification-usage.Rmd:25-38) — the
Spark analog is an explicit-schema CSV read broadcast against the fact
table. Sink round-trips (S9) are exercised in tests/test_sources.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.scalars import dec
from ..registry import register

DATA_DIR = os.path.join(os.path.dirname(__file__), os.pardir, "data")
PRIORITY_DIM_CSV = os.path.abspath(os.path.join(DATA_DIR, "priority_dim.csv"))

# The dim inlined for the DuckDB oracle — same five rows as the CSV.
_DIM_VALUES = """
    (VALUES ('1-URGENT', 'expedite', 5),
            ('2-HIGH', 'expedite', 4),
            ('3-MEDIUM', 'standard', 3),
            ('4-NOT SPECIFIED', 'standard', 2),
            ('5-LOW', 'deferred', 1)) AS dim(priority, category, weight)
"""


def read_priority_dim(spark: SparkSession) -> DataFrame:
    """S5: CSV dimension read with an explicit schema (never infer in
    production — inference is a full extra pass and can flip types
    between runs)."""
    return spark.read.csv(
        PRIORITY_DIM_CSV,
        header=True,
        schema="priority string, category string, weight int",
    )


@register(
    "s5_csv_dim_broadcast_join",
    oracle=f"""
    SELECT category,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * weight) AS DOUBLE)
             AS weighted_revenue
    FROM orders JOIN {_DIM_VALUES}
      ON o_orderpriority = priority
    GROUP BY category
    ORDER BY category
    """,
    tags=("S5", "J14", "A5"),
)
def s5_csv_dim_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV dim (ro.csv analog) broadcast-joined to the fact table
    (certification-usage.Rmd:25-38 keeps ro.csv client-side; the Spark
    version broadcasts the 5-row dim so the join never shuffles the
    fact side). Weighted sum via exact decimal so partitioning cannot
    perturb the double result."""
    o = load_table(spark, sf_dir, "orders")
    dim = read_priority_dim(spark)
    return (
        o.join(F.broadcast(dim), o.o_orderpriority == dim.priority)
        .groupBy("category")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(dec("o_totalprice") * F.col("weight")).cast("double").alias(
                "weighted_revenue"
            ),
        )
        .orderBy("category")
    )


def partitioned_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize orders date-partitioned by order year — SURVEY §4's
    production layout for the fact tables (write_partitioned is the
    generic writer; this is its query-visible artifact). A reader
    filtering on the partition column never opens non-matching
    partition directories (PartitionFilters prune at planning), which
    at 100 TB is the difference between scanning one year and scanning
    the lake. Write-once per session via catalog.scratch_path_once."""
    from ..catalog import scratch_path_once

    def write(path: str) -> None:
        (
            load_table(spark, sf_dir, "orders")
            .withColumn("o_yr", F.year("o_orderdate"))
            # one writer task per year — small-files discipline
            .repartition("o_yr")
            .write.mode("overwrite")
            .partitionBy("o_yr")
            .parquet(path)
        )

    return spark.read.parquet(
        scratch_path_once(spark, sf_dir, "part_orders_by_yr", write)
    )


@register(
    "s9_partition_pruned_rollup",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders
    WHERE YEAR(o_orderdate) = 1997
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("S9", "S1", "A1", "SCALE"),
)
def s9_partition_pruned_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup over ONE partition of the date-partitioned orders layout:
    the o_yr = 1997 predicate resolves against the directory structure
    at plan time (PartitionFilters — asserted in tests/test_plans.py),
    so the scan never opens the other years' files. Partitioning never
    changes content, so the oracle is the equivalent filter on the raw
    table."""
    po = partitioned_orders(spark, sf_dir)
    return (
        po.filter(F.col("o_yr") == 1997)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(dec("o_totalprice")).cast("double").alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


# One SQL text, two engines: the S1 "SQL surface" artifact. The body is
# written in the ANSI subset both dialects execute identically; only
# the table identifier is templated (Spark reads a per-scale temp view,
# DuckDB its pre-registered view of the same parquet).
_PORTABLE_SQL = """
    SELECT o_orderpriority,
           YEAR(o_orderdate) AS yr,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM {orders}
    WHERE o_orderstatus <> 'P'
    GROUP BY o_orderpriority, YEAR(o_orderdate)
    ORDER BY o_orderpriority, yr
"""


@register(
    "s1_portable_sql_rollup",
    oracle=_PORTABLE_SQL.format(orders="orders"),
    tags=("S1", "A1", "F2"),
)
def s1_portable_sql_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spark.sql(...) text surface, differentially proven: the SAME
    SQL string (modulo the table identifier) runs on Spark and on the
    DuckDB oracle and must hash-match — pinning that the engine's SQL
    dialect handling (YEAR on timestamp_ntz, DECIMAL sum contract,
    multi-key ORDER BY) agrees with ANSI semantics, not just the
    DataFrame API. The view name carries the scale tag so sessions
    mixing scale factors (bench warmup vs timed) can never cross-bind."""
    import hashlib

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    view = f"orders_sql_{tag}"
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(view)
    return spark.sql(_PORTABLE_SQL.format(orders=view))


def _interleave_sql(d1: str, d2: str, bits: int, shr: str) -> str:
    """Morton/Z-value bit interleave as engine-neutral SQL text:
    ``shr`` is the shift-right template ('shiftright({x}, {i})' for
    Spark SQL, '({x} >> {i})' for DuckDB); '&' and arithmetic are
    shared. Even bit positions take d1, odd take d2."""
    terms = []
    for i in range(bits):
        terms.append(f"(({shr.format(x=d1, i=i)} & 1) * {1 << (2 * i)})")
        terms.append(f"(({shr.format(x=d2, i=i)} & 1) * {1 << (2 * i + 1)})")
    return " + ".join(terms)


_Z_BITS = 16
# Probe: a 128-wide customer-key slice — selective on d1, indifferent
# to d2, the pattern multi-dimensional clustering exists to serve.
_Z_PROBE_LO, _Z_PROBE_HI = 100, 227


def _zorder_oracle() -> str:
    z = _interleave_sql("d1", "d2", _Z_BITS, "({x} >> {i})")
    return f"""
    WITH dims AS (
      SELECT o_custkey % 65536 AS d1,
             DATEDIFF('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
               % 65536 AS d2,
             o_orderkey
      FROM orders
    ), keyed AS (
      SELECT d1, d2,
             ({z}) // 1048576 AS zfile,
             o_orderkey // 1024 AS lfile
      FROM dims
    ), zf AS (
      SELECT 'zorder' AS layout, zfile AS f, MIN(d1) AS lo, MAX(d1) AS hi,
             COUNT(*) AS n,
             SUM(CASE WHEN d1 BETWEEN {_Z_PROBE_LO} AND {_Z_PROBE_HI}
                      THEN 1 ELSE 0 END) AS n_match
      FROM keyed GROUP BY zfile
    ), lf AS (
      SELECT 'linear' AS layout, lfile AS f, MIN(d1) AS lo, MAX(d1) AS hi,
             COUNT(*) AS n,
             SUM(CASE WHEN d1 BETWEEN {_Z_PROBE_LO} AND {_Z_PROBE_HI}
                      THEN 1 ELSE 0 END) AS n_match
      FROM keyed GROUP BY lfile
    ), files AS (
      SELECT * FROM zf UNION ALL SELECT * FROM lf
    )
    SELECT layout,
           COUNT(*) AS n_files,
           CAST(SUM(CASE WHEN lo <= {_Z_PROBE_HI} AND hi >= {_Z_PROBE_LO}
                    THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
           CAST(SUM(CASE WHEN lo <= {_Z_PROBE_HI} AND hi >= {_Z_PROBE_LO}
                    THEN n ELSE 0 END) AS BIGINT) AS rows_scanned,
           CAST(SUM(n_match) AS BIGINT) AS rows_matched
    FROM files GROUP BY layout ORDER BY layout
    """


@register(
    "opt_zorder_skipping",
    oracle=_zorder_oracle(),
    tags=("S9", "A13"),
)
def opt_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering vs insertion-order layout, measured
    by min/max-zone data skipping — the mechanism behind Delta/Iceberg
    OPTIMIZE ZORDER and parquet row-group pruning. Every row gets a
    32-bit Morton code interleaving (custkey % 2^16) with the order
    date's day offset; files are fixed z-prefix buckets (z >> 20) vs
    orderkey-range buckets for the linear control. For a selective
    probe on ONE dimension, the z-layout's per-file [min,max] zones
    overlap the probe in O(sqrt(files)) — the report shows files and
    rows a zone-map reader would scan under each layout against the
    true match count. All integer arithmetic; the interleave SQL text
    is generated once and shared by both engines (engine-specific only
    in the shift-right spelling).

    At 100 TB this is a WRITE-side layout choice: sort by the Morton
    key before the partitioned write (one range shuffle), and every
    later multi-dimension selective scan prunes without re-shuffling."""
    o = load_table(spark, sf_dir, "orders")
    dims = o.select(
        (F.col("o_custkey") % 65536).alias("d1"),
        (
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01"))
            % 65536
        ).alias("d2"),
        "o_orderkey",
    )
    z = F.expr(_interleave_sql("d1", "d2", _Z_BITS, "shiftright({x}, {i})"))
    keyed = dims.select(
        "d1",
        F.floor(z / F.lit(1048576)).alias("zfile"),
        F.floor(F.col("o_orderkey") / F.lit(1024)).alias("lfile"),
    )
    probe = F.col("d1").between(_Z_PROBE_LO, _Z_PROBE_HI)
    # Both layouts from ONE scan: explode each row into its (layout,
    # file) pair, then a single shuffle keyed on (layout, f).
    both = keyed.select(
        "d1",
        F.explode(
            F.array(
                F.struct(
                    F.lit("zorder").alias("layout"), F.col("zfile").alias("f")
                ),
                F.struct(
                    F.lit("linear").alias("layout"), F.col("lfile").alias("f")
                ),
            )
        ).alias("lf"),
    )
    files = both.groupBy("lf.layout", "lf.f").agg(
        F.min("d1").alias("lo"),
        F.max("d1").alias("hi"),
        F.count("*").alias("n"),
        F.sum(probe.cast("int")).alias("n_match"),
    )
    hit = (F.col("lo") <= _Z_PROBE_HI) & (F.col("hi") >= _Z_PROBE_LO)
    return (
        files.groupBy("layout")
        .agg(
            F.count("*").alias("n_files"),
            F.sum(hit.cast("int")).cast("long").alias("files_scanned"),
            F.sum(F.when(hit, F.col("n")).otherwise(0))
            .cast("long")
            .alias("rows_scanned"),
            F.sum("n_match").cast("long").alias("rows_matched"),
        )
        .orderBy("layout")
    )


def _claims_exchange_landed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the S6 exchange once per (session, sf): derive a
    deterministic claims CSV from orders in the reference's wire format
    (22 columns, M/D/YYYY non-padded date strings, BFCORLID = digits +
    suffix letter, claims_for_bfcorlid.rb:50-80), then land it through
    sources.claims_ingest.ingest_claims_csv — explicit-schema CSV read,
    date/id normalization, month-partitioned parquet. The report query
    reads the LANDED table, so the round-trip (format -> parse ->
    normalize -> partition) is what the oracle checks."""
    from ..catalog import scratch_path_once
    from ..sources.claims_ingest import CLAIMS_COLUMNS, ingest_claims_csv

    def write(path: str) -> None:
        o = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderkey") % 10 == 0
        )
        rd = F.to_date("o_orderdate")
        vals = {
            "BFCORLID": F.concat(F.col("o_custkey").cast("string"), F.lit("S")),
            "benefit_claim_id": F.col("o_orderkey").cast("string"),
            "claim_receive_date": F.date_format(rd, "M/d/yyyy"),
            "claim_type_code": F.substring("o_orderpriority", 1, 1),
            "claim_type_name": F.lit("Compensation"),
            "claimant_first_name": F.lit("X"),
            "claimant_last_name": F.lit("X"),
            "claimant_middle_name": F.lit("X"),
            "claimant_suffix": F.lit("X"),
            "end_product_type_code": (F.col("o_orderkey") % 4).cast("string"),
            "last_action_date": F.date_format(
                F.date_add(rd, (F.col("o_orderkey") % 90).cast("int")),
                "M/d/yyyy",
            ),
            "organization_name": F.lit("X"),
            "organization_title_type_name": F.lit("X"),
            "payee_type_code": F.lit("00"),
            "person_or_organization_indicator": F.lit("P"),
            "program_type_code": F.lit("CPL"),
            "status_type_code": F.lit("PEND"),
            # every third claim arrives with no journal row — the
            # missing-date parse stat the report counts
            "journal_date": F.when(
                F.col("o_orderkey") % 3 == 0, F.lit(None).cast("string")
            ).otherwise(F.date_format(rd, "M/d/yyyy")),
            "journal_object_id": F.col("o_orderkey").cast("string"),
            "journal_station": F.when(
                F.col("o_orderkey") % 5 == 0, F.lit(397)
            ).otherwise((F.lit(300) + F.col("o_orderkey") % 7).cast("int")),
            "journal_status_type_code": F.lit("PEND"),
            "journal_user_id": F.lit("X"),
        }
        # wire order matters: the explicit-schema read binds by position
        rows = o.select(*[vals[c].alias(c) for c in CLAIMS_COLUMNS])
        # mode("overwrite") keeps retries idempotent: if writer() fails
        # after the CSV lands but before the memo is recorded, the next
        # attempt must not die on "path already exists" (matches the
        # other scratch_path_once writers, e.g. partitioned_orders).
        rows.write.mode("overwrite").csv(os.path.join(path, "csv"), header=True)
        ingest_claims_csv(
            spark, os.path.join(path, "csv"), os.path.join(path, "landed")
        )

    path = scratch_path_once(spark, sf_dir, "claims_exchange", write)
    return spark.read.parquet(os.path.join(path, "landed"))


@register(
    "s6_claims_ingest_report",
    oracle="""
    WITH c AS (
      SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS rd,
             CAST(o_orderdate AS DATE) + CAST(o_orderkey % 90 AS INT)
               AS last_action,
             (o_orderkey % 3 = 0) AS jnull,
             (o_orderkey % 5 = 0) AS amc
      FROM orders WHERE o_orderkey % 10 = 0
    )
    SELECT CAST(date_trunc('month', rd) AS DATE) AS receive_month,
           COUNT(*) AS n_claims,
           CAST(SUM(CASE WHEN amc THEN 1 ELSE 0 END) AS BIGINT) AS n_amc,
           COUNT(DISTINCT o_custkey) AS n_file_numbers,
           CAST(SUM(CASE WHEN LENGTH(CAST(o_custkey AS VARCHAR)) < 8
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_padded,
           CAST(SUM(CASE WHEN jnull THEN 1 ELSE 0 END) AS BIGINT)
             AS n_missing_journal,
           MIN(last_action) AS first_action,
           MAX(last_action) AS last_action
    FROM c GROUP BY 1 ORDER BY 1
    """,
    tags=("S6", "S9", "A12"),
)
def s6_claims_ingest_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 external-exchange ingest, differentially proven end to end:
    a claims CSV in the reference wire format (M/D/YYYY strings,
    BFCORLID digits+suffix, blank journal dates —
    ruby/claims_for_bfcorlid.rb:50-102) is landed through
    sources.claims_ingest (explicit schema, to_date normalization,
    zero-padded file numbers, month-partitioned parquet), and the
    per-receive-month report — claim volume, AMC-station share,
    distinct/padded file numbers, missing journal dates, action-date
    span — is checked against an oracle that derives the same stats
    straight from orders, so any drift in the format->parse->normalize
    round-trip (a date that fails to parse, a pad that changes width,
    a null that stops surviving the CSV hop) breaks the hash match.

    Scale shape: the exchange is write-once (scratch memo); the report
    is one map-side-combinable rollup over the landed table, whose
    month partitioning is the production pruning layout for the J10
    fuzzy as-of consumers."""
    landed = _claims_exchange_landed(spark, sf_dir)
    return (
        landed.groupBy(
            F.trunc("claim_receive_date", "month").alias("receive_month")
        )
        .agg(
            F.count("*").alias("n_claims"),
            F.sum(F.col("is_amc").cast("int")).cast("long").alias("n_amc"),
            F.countDistinct("file_number").alias("n_file_numbers"),
            F.sum(
                (
                    F.length(F.regexp_extract("BFCORLID", r"^(\d+)", 1)) < 8
                ).cast("int")
            )
            .cast("long")
            .alias("n_padded"),
            F.sum(F.col("journal_date").isNull().cast("int"))
            .cast("long")
            .alias("n_missing_journal"),
            F.min("last_action_date").alias("first_action"),
            F.max("last_action_date").alias("last_action"),
        )
        .orderBy("receive_month")
    )
