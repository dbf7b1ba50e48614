"""Live JDBC pull path — the S2/S3 connector analog, as code.

The reference holds two connection modules: ``vacolsConnect.R:8-27``
(Oracle VACOLS over ROracle/JDBC) and ``caseflowConnect.R:8-21``
(Postgres ``caseflow_certification``). Each is ~20 lines: build a
connection handle from host/credentials, hand it to ``dbGetQuery``.
The Spark-native equivalent is ``spark.read.format("jdbc")`` — the
engine's job is to pass the RIGHT options, because the defaults are
single-partition and read the whole table through one executor:

* ``dbtable``/``query`` pushes projection+filters INTO the database
  (Catalyst emits a WHERE clause server-side for pushable predicates);
* ``partitionColumn/lowerBound/upperBound/numPartitions`` splits the
  pull into N parallel range queries — the only way a 100 GB VACOLS
  export saturates a cluster instead of one connection;
* ``fetchsize`` bounds per-round-trip rows (Oracle default 10 is
  pathological; 10k is the working default here).

Evidence discipline: tests/test_jdbc.py round-trips a table through an
embedded Derby database (the JDBC driver Spark ships in its own jars),
proving the option plumbing against a real DriverManager path — no
network, no external service. Oracle/Postgres remain configuration
(their drivers aren't shipped here): the URL/driver land in the same
two options, nothing else changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 1,
    fetchsize: int = 10_000,
    **options: str,
) -> DataFrame:
    """Read ``table`` (a table name or a ``(subquery) alias``) over JDBC.

    With ``partition_column`` + bounds the read issues
    ``num_partitions`` parallel range-predicated queries; without, it
    is a single-connection pull (fine for dims, wrong for facts).
    """
    r = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", str(fetchsize))
    )
    if driver:
        r = r.option("driver", driver)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "read_jdbc: partition_column requires lower_bound and "
                "upper_bound (Spark splits [lower, upper) into "
                "num_partitions range queries)"
            )
        r = (
            r.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        r = r.option(k, v)
    return r.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    driver: str | None = None,
    mode: str = "append",
    batchsize: int = 10_000,
    **options: str,
) -> None:
    """Write ``df`` to a JDBC table (the exchange-export direction)."""
    w = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode(mode)
    )
    if driver:
        w = w.option("driver", driver)
    for k, v in options.items():
        w = w.option(k, v)
    w.save()
