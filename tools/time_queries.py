"""Isolated per-query wall-clock timing at a given SF.

One JVM, each named query run ``--runs`` times back-to-back (first run
includes plan/codegen warmup — report the min of the later runs as the
steady state, which is what BASELINE.md records). Collects to the
driver exactly like the bench harness so the full job graph executes.

Usage:
    python tools/time_queries.py [--sf /root/testdata/sf0.1]
        [--runs 4] name [name ...]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from appeals_data_spark.registry import all_queries  # noqa: E402
from appeals_data_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark()
    qs = all_queries()
    out = {}
    for name in args.names:
        if name not in qs:
            print(f"unknown query: {name}", file=sys.stderr)
            return 2
        times = []
        for _ in range(args.runs):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            n = len(qs[name].builder(spark, args.sf).collect())
            times.append(round(time.monotonic() - t0, 3))
        steady = min(times[1:]) if len(times) > 1 else times[0]
        out[name] = {"rows": n, "runs": times, "steady": steady}
        print(f"{name}: rows={n} runs={times} steady={steady}s", flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
