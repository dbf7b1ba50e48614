"""Per-query steady-state timing with bench-style warmup.

Like tools/time_queries.py but first runs every named query at
sf0.001 (and a mapInPandas probe) to compile codegen and spin up the
Arrow worker pool, so short runs measure steady-state data work, not
JIT — the same discipline bench.py uses.

Usage:
    python tools/time_warm.py [--sf /root/testdata/sf0.1] [--runs 3] name...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from appeals_data_spark.registry import all_queries  # noqa: E402
from appeals_data_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    smoke = os.path.join(
        os.path.dirname(args.sf.rstrip("/")), "sf0.001"
    )
    warm_dir = smoke if os.path.isdir(smoke) else args.sf
    spark.range(64).repartition(8).mapInPandas(
        lambda b: b, schema="id long"
    ).count()
    for name in args.names:
        if name not in qs:
            print(f"unknown query: {name}", file=sys.stderr)
            return 2
        try:
            qs[name].builder(spark, warm_dir).collect()
        except Exception:
            pass
    spark.catalog.clearCache()
    out = {}
    for name in args.names:
        times = []
        for _ in range(args.runs):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            n = len(qs[name].builder(spark, args.sf).collect())
            times.append(round(time.monotonic() - t0, 3))
        out[name] = {"rows": n, "runs": times, "min": min(times)}
        print(f"{name}: rows={n} runs={times} min={min(times)}s", flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
