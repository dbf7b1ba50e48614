"""Round-trip gates for sources.merge.merge_into — the S10 analog of
the reference's keyed repair scripts (flag_flip.R / repair-intake-bug.R
UPDATE/INSERT pairs re-expressed as partition-scoped MERGE)."""

from __future__ import annotations

import os

import pytest

from appeals_data_spark.sources.merge import merge_into


def _seed(spark, path):
    rows = [
        (1, 1996, "ADV", 10.0),
        (2, 1996, "ADV", 20.0),
        (3, 1997, "ACT", 30.0),
        (4, 1998, "HIS", 40.0),
    ]
    df = spark.createDataFrame(
        rows, "bfkey long, yr int, status string, amt double"
    )
    df.repartition("yr").write.partitionBy("yr").parquet(path)


def test_merge_updates_inserts_and_leaves_other_partitions_alone(
    spark, tmp_path
):
    path = str(tmp_path / "brieff")
    _seed(spark, path)

    # snapshot the physical files of the partitions the merge must NOT
    # touch — the point of the dynamic-overwrite MERGE shape
    def files(yr):
        d = os.path.join(path, f"yr={yr}")
        return sorted(
            (f, os.path.getmtime(os.path.join(d, f)), os.path.getsize(os.path.join(d, f)))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    before_97, before_98 = files("1997"), files("1998")

    updates = spark.createDataFrame(
        [
            (2, 1996, "ACT", 21.0),  # UPDATE arm: existing key
            (5, 1996, "ADV", 50.0),  # INSERT arm: new key
        ],
        "bfkey long, yr int, status string, amt double",
    )
    merge_into(spark, path, updates, keys=["bfkey"], partition_cols=["yr"])

    got = {
        r["bfkey"]: (r["yr"], r["status"], r["amt"])
        for r in spark.read.parquet(path).collect()
    }
    assert got == {
        1: (1996, "ADV", 10.0),  # untouched row in the touched partition
        2: (1996, "ACT", 21.0),  # updated
        3: (1997, "ACT", 30.0),
        4: (1998, "HIS", 40.0),
        5: (1996, "ADV", 50.0),  # inserted
    }
    # untouched partitions: byte-identical file listings (name, mtime,
    # size) — the rewrite was scoped to yr=1996 only
    assert files("1997") == before_97
    assert files("1998") == before_98


def test_merge_unpartitioned_full_rewrite(spark, tmp_path):
    path = str(tmp_path / "othdocs")
    spark.createDataFrame(
        [(1, "0"), (2, "0")], "ticknum long, clmfld string"
    ).coalesce(1).write.parquet(path)
    merge_into(
        spark,
        path,
        spark.createDataFrame(
            [(2, "1"), (3, "1")], "ticknum long, clmfld string"
        ),
        keys=["ticknum"],
    )
    got = {
        r["ticknum"]: r["clmfld"] for r in spark.read.parquet(path).collect()
    }
    assert got == {1: "0", 2: "1", 3: "1"}


def test_merge_composite_key(spark, tmp_path):
    # repair-intake-bug.R restores ISSUES dispositions keyed by
    # (ISSKEY, ISSSEQ) — the composite-key arm
    path = str(tmp_path / "issues")
    spark.createDataFrame(
        [(10, 1, "P"), (10, 2, "X"), (11, 1, "P")],
        "isskey long, issseq long, issdc string",
    ).coalesce(1).write.parquet(path)
    merge_into(
        spark,
        path,
        spark.createDataFrame([(10, 2, "P")], "isskey long, issseq long, issdc string"),
        keys=["isskey", "issseq"],
    )
    got = {
        (r["isskey"], r["issseq"]): r["issdc"]
        for r in spark.read.parquet(path).collect()
    }
    assert got == {(10, 1): "P", (10, 2): "P", (11, 1): "P"}


def test_merge_moved_row_deletes_stale_partition_copy(spark, tmp_path):
    """An update whose partition value CHANGED must remove the old
    copy from its previous partition — the silent-duplicate hazard the
    round-10 review reproduced (key 2 living in both yr=1996 and its
    new partition)."""
    path = str(tmp_path / "t")
    _seed(spark, path)
    # bfkey=2 moves from yr=1996 to yr=1997
    merge_into(
        spark,
        path,
        spark.createDataFrame(
            [(2, 1997, "ACT", 22.0)],
            "bfkey long, yr int, status string, amt double",
        ),
        keys=["bfkey"],
        partition_cols=["yr"],
    )
    rows = spark.read.parquet(path).collect()
    got = {r["bfkey"]: (r["yr"], r["status"], r["amt"]) for r in rows}
    assert len(rows) == 4  # no duplicate for bfkey=2
    assert got[2] == (1997, "ACT", 22.0)
    assert got[1] == (1996, "ADV", 10.0)  # old partition's other row kept


def test_merge_key_overlapping_partition_ok(spark, tmp_path):
    # keys covering the partition column is the SAFE configuration (a
    # key match implies same partition) — must work, not be refused
    path = str(tmp_path / "t2k")
    _seed(spark, path)
    merge_into(
        spark,
        path,
        spark.createDataFrame(
            [(9, 1996, "ADV", 0.5)],
            "bfkey long, yr int, status string, amt double",
        ),
        keys=["bfkey", "yr"],
        partition_cols=["yr"],
    )
    got = {r["bfkey"] for r in spark.read.parquet(path).collect()}
    assert got == {1, 2, 3, 4, 9}


def test_merge_moved_row_empties_source_partition(spark, tmp_path):
    """The round-11 review repro: the moved row is the ONLY row in its
    source partition. The merged frame then has zero rows for that
    partition, and dynamic partition overwrite never rewrites a
    partition absent from the output — the stale directory must be
    deleted explicitly or the table silently holds two rows for one
    key."""
    path = str(tmp_path / "t3")
    spark.createDataFrame(
        [(1, 1996, "ADV", 10.0), (3, 1997, "ACT", 30.0)],
        "bfkey long, yr int, status string, amt double",
    ).repartition("yr").write.partitionBy("yr").parquet(path)
    # bfkey=1 is yr=1996's ONLY row; move it to yr=1998
    merge_into(
        spark,
        path,
        spark.createDataFrame(
            [(1, 1998, "HIS", 11.0)],
            "bfkey long, yr int, status string, amt double",
        ),
        keys=["bfkey"],
        partition_cols=["yr"],
    )
    rows = spark.read.parquet(path).collect()
    got = {r["bfkey"]: (r["yr"], r["status"], r["amt"]) for r in rows}
    assert len(rows) == 2  # no stale yr=1996 copy of bfkey=1
    assert got == {1: (1998, "HIS", 11.0), 3: (1997, "ACT", 30.0)}
    assert not os.path.isdir(os.path.join(path, "yr=1996"))


def test_merge_refuses_duplicate_update_keys(spark, tmp_path):
    """MERGE requires at most one source row per key — duplicate keys
    in updates would silently insert twice (Delta/Iceberg raise; so do
    we)."""
    path = str(tmp_path / "t4")
    _seed(spark, path)
    with pytest.raises(ValueError, match="distinct keys"):
        merge_into(
            spark,
            path,
            spark.createDataFrame(
                [(2, 1996, "ACT", 21.0), (2, 1996, "HIS", 22.0)],
                "bfkey long, yr int, status string, amt double",
            ),
            keys=["bfkey"],
            partition_cols=["yr"],
        )
    # table unchanged
    assert spark.read.parquet(path).count() == 4


def test_merge_refuses_schema_mismatch(spark, tmp_path):
    path = str(tmp_path / "t2")
    _seed(spark, path)
    with pytest.raises(ValueError, match="lacks target columns"):
        merge_into(
            spark,
            path,
            spark.createDataFrame([(1, 1996)], "bfkey long, yr int"),
            keys=["bfkey"],
            partition_cols=["yr"],
        )
