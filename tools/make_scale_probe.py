"""Generate an sf-N scale-probe layout from an existing sf directory.

Replicates every table ``--factor`` times with DISJOINT key offsets so
join fanouts, group cardinalities-per-key, and selectivities match the
source layout (each replica is a parallel universe; dims nation/region
stay fixed like TPC-H). Two tables get per-replica perturbation so the
probe doesn't manufacture pathological duplicate clusters:

- documents: for replica i>0, ~40% of words (chosen by a deterministic
  hash of word, position, replica) get an ``i`` suffix. A word-3-gram
  shingle survives only if all three words are untouched (0.6^3 =
  0.22), so cross-replica Jaccard ~ 0.12 — replicas are NOT near-dups
  and the minhash/LSH candidate density stays workload-shaped instead
  of exploding as 10-sized exact-dup cliques around every doc.
- embeddings: coordinates shift by i * 5e-4 — breaks exact-tie
  duplicates while leaving neighborhoods intact (top-k probes stay
  replica-0 vectors).

Usage:
  python tools/make_scale_probe.py [--src /root/testdata/sf0.1]
      [--out /tmp/sf1] [--factor 10]

The output is a bench-compatible layout: run
  SPARK_GRAFT_SF_DIR=/tmp/sf1 python bench.py
and compare per-query times against the source SF (results recorded in
BASELINE.md's scale-probe section).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))

from pyspark.sql import functions as F

from appeals_data_spark.catalog import load_table
from appeals_data_spark.session import get_spark

# table -> {column: offset_source_table} ; offsets are max(key)+1 of the
# offset-source table so every replica's keys are disjoint but
# referential integrity within a replica is preserved.
KEYED = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "events:user_id"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
KEY_OF = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "events:user_id": "user_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}
FILES_PER_TABLE = {"lineitem": 32, "orders": 16, "events": 16}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sf1")
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out, exist_ok=True)

    strides: dict[str, int] = {}
    for src_tab, key in KEY_OF.items():
        tab = src_tab.split(":")[0]
        strides[src_tab] = (
            load_table(spark, args.src, tab).agg(F.max(key)).first()[0] + 1
        )

    for tab in ["region", "nation"]:
        load_table(spark, args.src, tab).write.mode("overwrite").parquet(
            f"{args.out}/{tab}.parquet"
        )
        print(f"{tab}: copied (fixed dim)")

    for tab, keymap in KEYED.items():
        base = load_table(spark, args.src, tab)
        replicas = []
        for i in range(args.factor):
            r = base
            for col, off_src in keymap.items():
                r = r.withColumn(col, F.col(col) + F.lit(i * strides[off_src]))
            if tab == "documents" and i > 0:
                # deterministic ~40% word substitution (see module doc)
                r = r.withColumn(
                    "text",
                    F.array_join(
                        F.expr(
                            f"transform(split(text, ' '), (w, p) -> "
                            f"IF(pmod(hash(w, p, {i}), 10) < 4, "
                            f"concat(w, '{i}'), w))"
                        ),
                        " ",
                    ),
                ).withColumn("n_chars", F.length("text"))
            if tab == "embeddings" and i > 0:
                r = r.withColumn(
                    "embedding",
                    F.expr(
                        f"transform(embedding, x -> "
                        f"CAST(x + {i} * 0.0005 AS FLOAT))"
                    ),
                )
            replicas.append(r)
        out = replicas[0]
        for r in replicas[1:]:
            out = out.unionByName(r)
        n_files = FILES_PER_TABLE.get(tab, 4)
        out.repartition(n_files).write.mode("overwrite").parquet(
            f"{args.out}/{tab}.parquet"
        )
        # count from the written files — counting `out` would re-run
        # the whole replicated union (incl. per-replica transforms) a
        # second time just for this progress line
        n_rows = spark.read.parquet(f"{args.out}/{tab}.parquet").count()
        print(f"{tab}: x{args.factor} -> {n_rows} rows, {n_files} files")

    spark.stop()


if __name__ == "__main__":
    main()
