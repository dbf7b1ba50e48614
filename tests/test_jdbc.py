"""JDBC round-trip over embedded Derby — converts the S2/S3 connector
claim ("config, not code") into executed evidence: Spark's JDBC source
writes and reads through a real java.sql.DriverManager path using the
Derby driver Spark ships in its own jars. Oracle/Postgres differ only
in url/driver strings."""

from __future__ import annotations

import pytest

from appeals_data_spark.sources.jdbc import read_jdbc, write_jdbc

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _derby_url(tmp_path):
    return f"jdbc:derby:{tmp_path}/db;create=true"


def test_jdbc_roundtrip_and_partitioned_parallel_read(spark, tmp_path):
    url = _derby_url(tmp_path)
    src = spark.createDataFrame(
        [(i, f"c{i % 5}", float(i) * 1.5) for i in range(100)],
        "id bigint, cat string, amt double",
    )
    write_jdbc(src, url, "exchange", driver=DERBY_DRIVER, mode="overwrite")

    # single-connection pull
    got = read_jdbc(spark, url, "exchange", driver=DERBY_DRIVER)
    assert got.count() == 100
    assert {f.name.lower() for f in got.schema.fields} == {"id", "cat", "amt"}

    # parallel range-partitioned pull: 4 range queries, same content
    par = read_jdbc(
        spark,
        url,
        "exchange",
        driver=DERBY_DRIVER,
        partition_column="id",
        lower_bound=0,
        upper_bound=100,
        num_partitions=4,
    )
    assert par.rdd.getNumPartitions() == 4
    assert sorted(r["id"] for r in par.collect()) == list(range(100))


def test_jdbc_subquery_pushdown(spark, tmp_path):
    url = _derby_url(tmp_path)
    src = spark.createDataFrame(
        [(i, i % 3) for i in range(30)], "id bigint, grp bigint"
    )
    write_jdbc(src, url, "t", driver=DERBY_DRIVER, mode="overwrite")
    # dbtable accepts a server-side subquery — the vacolsConnect
    # embedded-SQL idiom (the database does the filter, not Spark).
    # Column identifiers are quoted because Spark's JDBC writer creates
    # case-exact quoted columns while Derby folds unquoted ones upper;
    # the table name is passed through verbatim (unquoted) by the
    # writer, so it stays unquoted here too.
    sub = read_jdbc(
        spark,
        url,
        '(SELECT "id" FROM t WHERE "grp" = 0) s',
        driver=DERBY_DRIVER,
    )
    assert sorted(r["id"] for r in sub.collect()) == [0, 3, 6, 9, 12, 15, 18, 21, 24, 27]


def test_read_jdbc_requires_bounds_with_partition_column(spark, tmp_path):
    with pytest.raises(ValueError, match="requires lower_bound"):
        read_jdbc(
            spark,
            _derby_url(tmp_path),
            "t",
            driver=DERBY_DRIVER,
            partition_column="id",
        )
