"""Keyed MERGE (upsert) into a parquet-backed table — the S10 analog.

The reference's operational repair scripts mutate VACOLS rows in place
with keyed UPDATE/INSERT pairs (``scratch/intake/flag_flip.R:49-75``
activates cases by updating BRIEFF/FOLDER/PRIORLOC and inserting
OTHDOCS rows per BFKEY; ``scratch/intake/repair-intake-bug.R:39-55``
restores overwritten ISSUES dispositions key by key). A Spark engine
over a parquet lake has no row-level UPDATE, and the 100 TB-correct
re-expression is the standard MERGE-INTO rewrite pattern every
lakehouse format implements underneath:

    affected = target rows in the partitions the updates touch
    merged   = (affected ANTI-JOIN updates ON keys) UNION updates
    overwrite ONLY those partitions (dynamic partition overwrite)

so a repair touching 3 of 3,000 date partitions rewrites 0.1% of the
table, never all of it, and untouched partitions' files are left
byte-identical on disk (gated by tests/test_merge.py). Unpartitioned
tables fall back to a full rewrite — correct, but documented as the
small-table path (the repair scripts' OTHDOCS-style side tables).

Scale notes:
* the updates side is repair-sized (the reference loops over dozens of
  BFKEYs) — it broadcasts into both the partition filter and the
  anti-join; a data-sized updates frame still works but plans a
  shuffled anti-join, which is the right plan at that size.
* parquet cannot be overwritten while a plan still lazily reads it, so
  the merged frame is materialized (``localCheckpoint``) before the
  write — partition-scoped, hence bounded by the touched-partition
  volume, not the table. On a real cluster with a lakehouse format the
  same logic is one ``MERGE INTO``; this helper is the format-free
  equivalent with the identical partition-pruned I/O shape.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_into(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: list[str],
    partition_cols: list[str] | None = None,
) -> None:
    """Upsert ``updates`` into the parquet table at ``path`` by key.

    Rows whose ``keys`` match an existing row replace it (the UPDATE
    arm); unmatched rows insert (the INSERT arm) — the exact
    insert-or-update shape of flag_flip.R's OTHDOCS branch. ``updates``
    must carry the target's full schema (construct the updated row as
    the reference scripts do). With ``partition_cols`` the rewrite is
    scoped — via dynamic partition overwrite — to the partitions the
    updates land in plus any partition currently holding a matched key
    (so a moved row deletes its stale copy); files of all other
    partitions are not rewritten.
    """
    target = spark.read.parquet(path)
    missing = [c for c in target.columns if c not in updates.columns]
    if missing:
        raise ValueError(
            f"merge_into: updates frame lacks target columns {missing}"
        )
    updates = updates.select(*target.columns)  # align column order
    # MERGE semantics require each target row to match AT MOST ONE
    # source row; duplicate keys in ``updates`` would silently insert
    # twice (the anti-join removes the one matched target row but the
    # union appends every update row). Delta/Iceberg raise here; so do
    # we. The updates frame is repair-sized, so the two counts are a
    # broadcast-scale job, and ``updates`` is cached first so the
    # validation pass and the merge read one computation.
    updates = updates.cache()
    # Everything after the cache runs under try/finally so a failed
    # partition collect / checkpoint / write cannot leak the cached
    # updates frame across repeated failed merges (round-12 review fix).
    try:
        _merge_cached(spark, path, target, updates, keys, partition_cols)
    finally:
        updates.unpersist()


def _merge_cached(
    spark: SparkSession,
    path: str,
    target: DataFrame,
    updates: DataFrame,
    keys: list[str],
    partition_cols: list[str] | None,
) -> None:
    n_rows = updates.count()
    n_keys = updates.select(*keys).distinct().count()
    if n_rows != n_keys:
        raise ValueError(
            f"merge_into: updates has {n_rows} rows but only {n_keys} "
            f"distinct keys {keys}; MERGE requires at most one source "
            "row per key (deduplicate the updates frame first)"
        )
    if partition_cols:
        # Affected partitions = the partitions the updates LAND in,
        # UNION the partitions currently HOLDING a matched key: an
        # update row whose partition value changed (a moved row) must
        # delete its stale copy from the old partition, or the table
        # silently carries two rows for one key (round-10 review fix —
        # the first version only rewrote the landing partitions, and
        # guarded the one configuration where a move is impossible).
        # The old-copy lookup is a read-only key semi-join over the
        # table; when every key column is also a partition column the
        # two sets coincide and the union dedups away.
        upd_parts = updates.select(*partition_cols).distinct()
        old_parts = (
            target.join(F.broadcast(updates.select(*keys).distinct()), keys, "left_semi")
            .select(*partition_cols)
            .distinct()
        )
        parts = upd_parts.unionByName(old_parts).distinct()
        affected = target.join(F.broadcast(parts), partition_cols, "left_semi")
        merged = affected.join(
            F.broadcast(updates.select(*keys).distinct()), keys, "left_anti"
        ).unionByName(updates)
        # materialize BEFORE overwriting the files the plan reads from
        merged = merged.localCheckpoint()
        # A moved row can EMPTY its source partition: merged then has
        # zero rows for that partition, and dynamic partition overwrite
        # only rewrites partitions PRESENT in the output — the stale
        # directory would survive untouched (round-11 review fix).
        # Diff the affected-partition set against merged's partitions
        # and delete the emptied directories explicitly. Both sets are
        # repair-sized (bounded by the updates frame), so the collect
        # is a few rows, never data-scale.
        emptied = parts.join(
            merged.select(*partition_cols).distinct(),
            partition_cols,
            "left_anti",
        ).collect()
        (
            merged.repartition(*[merged[c] for c in partition_cols])
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*partition_cols)
            .parquet(path)
        )
        if emptied:
            jvm = spark._jvm
            hconf = spark._jsc.hadoopConfiguration()
            HPath = jvm.org.apache.hadoop.fs.Path
            fs = HPath(path).getFileSystem(hconf)
            # Hive-style dir layout: k1=v1/k2=v2 — built with Spark's
            # own escapePathName so values containing characters Spark
            # escapes in path names (':', '%', control chars) resolve
            # to the directory actually on disk, and NULL partition
            # values map to __HIVE_DEFAULT_PARTITION__ exactly as the
            # writer spelled them (round-12 review fix: raw str(value)
            # silently missed escaped/NULL dirs, resurrecting the
            # stale-duplicate bug this cleanup exists to prevent).
            esc = jvm.org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            for row in emptied:
                parts_enc = []
                for c in partition_cols:
                    v = row[c]
                    enc = (
                        "__HIVE_DEFAULT_PARTITION__"
                        if v is None
                        else esc.escapePathName(str(v))
                    )
                    parts_enc.append(f"{c}={enc}")
                sub = "/".join(parts_enc)
                p = HPath(f"{path.rstrip('/')}/{sub}")
                if fs.exists(p):
                    fs.delete(p, True)
                else:
                    warnings.warn(
                        f"merge_into: expected emptied partition dir "
                        f"{sub!r} not found under {path}; a stale copy "
                        "of moved rows may survive",
                        stacklevel=2,
                    )
    else:
        merged = target.join(
            F.broadcast(updates.select(*keys).distinct()), keys, "left_anti"
        ).unionByName(updates)
        merged = merged.localCheckpoint()
        merged.write.mode("overwrite").parquet(path)
