"""Interleaved same-JVM A/B of a runtime conf over named queries.

Alternates the conf between two values run-by-run (A B A B ...) so both
arms see the same JVM warmth and box conditions; reports per-arm min
(steady) per query. Used for the round-13 adjudication of
spark.sql.adaptive.coalescePartitions.initialPartitionNum (r12 verdict
item #3).

Usage:
    python tools/ab_conf.py --conf spark.sql...initialPartitionNum \
        --a 1024 --b 32 [--sf /root/testdata/sf0.1] [--rounds 4] name...
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from appeals_data_spark.registry import all_queries  # noqa: E402
from appeals_data_spark.session import get_spark  # noqa: E402


def _steal():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    return sum(vals), (vals[7] if len(vals) > 7 else 0)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--conf", required=True)
    ap.add_argument("--a", required=True)
    ap.add_argument("--b", required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    out: dict[str, dict[str, list[float]]] = {
        n: {"a": [], "b": []} for n in args.names
    }
    t0_tot, s0 = _steal()
    for name in args.names:
        q = qs[name]
        # one warmup run per query (codegen/plan compile) under arm A
        spark.conf.set(args.conf, args.a)
        q.builder(spark, args.sf).collect()
        spark.catalog.clearCache()
        for r in range(args.rounds):
            for arm, val in (("a", args.a), ("b", args.b)):
                spark.conf.set(args.conf, val)
                t0 = time.monotonic()
                q.builder(spark, args.sf).collect()
                out[name][arm].append(round(time.monotonic() - t0, 3))
                spark.catalog.clearCache()
    t1_tot, s1 = _steal()
    steal_pct = round(100.0 * (s1 - s0) / (t1_tot - t0_tot), 3)
    for name, arms in out.items():
        print(
            f"{name}: A({args.a}) min={min(arms['a'])} {arms['a']} | "
            f"B({args.b}) min={min(arms['b'])} {arms['b']}"
        )
    print(json.dumps({"steal_pct": steal_pct, "conf": args.conf, "out": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
