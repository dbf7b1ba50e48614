"""BGS claims CSV ingest (S6) — external exchange -> parquet table.

The reference's flow (`ruby/claims_for_bfcorlid.rb:50-102` +
`notebooks/dispatch/time-to-ep.Rmd:85-105`): write a veteran-id list,
run a Ruby script that fans out SOAP calls and writes ``claims.csv``
(22 columns, dates as M/D/YYYY strings, file numbers zero-padded to 8,
`claims_for_bfcorlid.rb:80`), then re-parse everything client-side per
analysis. Here the exchange is a one-shot batch ingest job: read the
CSV with an explicit schema, normalize ids and dates ONCE, land
parquet; every downstream query (the J10 fuzzy as-of match) reads the
normalized table with types already right.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

# 22 columns per ruby/claims_for_bfcorlid.rb:50-73.
CLAIMS_COLUMNS = (
    "BFCORLID",
    "benefit_claim_id",
    "claim_receive_date",
    "claim_type_code",
    "claim_type_name",
    "claimant_first_name",
    "claimant_last_name",
    "claimant_middle_name",
    "claimant_suffix",
    "end_product_type_code",
    "last_action_date",
    "organization_name",
    "organization_title_type_name",
    "payee_type_code",
    "person_or_organization_indicator",
    "program_type_code",
    "status_type_code",
    "journal_date",
    "journal_object_id",
    "journal_station",
    "journal_status_type_code",
    "journal_user_id",
)

_DATE_COLS = ("claim_receive_date", "last_action_date", "journal_date")
_DATE_FMT = "M/d/yyyy"  # reference dates serialize as %m/%d/%Y
AMC_STATION = 397  # journal_station 397 = AMC (time-to-ep.Rmd:131)


def claims_schema() -> StructType:
    """Explicit CSV schema: everything string except journal_station
    (streaming/CSV sources never infer in this engine — schema drift in
    an external feed should fail loudly, not silently retype)."""
    fields = [
        StructField(
            c, IntegerType() if c == "journal_station" else StringType(), True
        )
        for c in CLAIMS_COLUMNS
    ]
    return StructType(fields)


def normalize_claims(raw: DataFrame) -> DataFrame:
    """Typed view of the raw exchange rows:

    - M/D/YYYY date strings -> DateType (the reference re-parses these
      per analysis, time-to-ep.Rmd:104-105),
    - file number extracted from BFCORLID and zero-padded to 8 (the
      Ruby side's ``rjust(8, '0')``), suffix preserved separately,
    - ``is_amc`` flag for journal_station 397.
    """
    out = raw
    for c in _DATE_COLS:
        out = out.withColumn(c, F.to_date(c, _DATE_FMT))
    digits = F.regexp_extract("BFCORLID", r"^(\d+)", 1)
    return out.select(
        "*",
        # rjust semantics, NOT bare lpad: Spark lpad TRUNCATES strings
        # longer than the pad width, which would collapse distinct
        # 9+-digit file numbers; the reference's rjust(8, '0') leaves
        # long ids untouched.
        F.when(F.length(digits) >= 8, digits)
        .otherwise(F.lpad(digits, 8, "0"))
        .alias("file_number"),
        F.regexp_extract("BFCORLID", r"(\D+)$", 1).alias("corlid_suffix"),
        (F.col("journal_station") == AMC_STATION).alias("is_amc"),
    )


def ingest_claims_csv(
    spark: SparkSession, csv_path: str, out_path: str | None = None
) -> DataFrame:
    """Read an exchange CSV, normalize, optionally land parquet.

    At scale the landing write partitions by receive month so the
    fuzzy-join queries prune to their date window.
    """
    raw = spark.read.csv(csv_path, header=True, schema=claims_schema())
    claims = normalize_claims(raw)
    if out_path is not None:
        (
            claims.withColumn(
                "receive_month", F.date_trunc("month", "claim_receive_date")
            )
            # Cluster rows by the partition column BEFORE the partitioned
            # write: without it every input task writes a file into every
            # month directory (tasks x months tiny files — measured 2903
            # files for a 15k-row landing); with it each month is written
            # by exactly one task. The standard small-files discipline
            # for partitioned lake layouts.
            .repartition("receive_month")
            .write.mode("overwrite")
            .partitionBy("receive_month")
            .parquet(out_path)
        )
        return spark.read.parquet(out_path)
    return claims
