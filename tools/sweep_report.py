"""Cross-round driver-sweep coverage report.

Reads every CORRECTNESS_r0N.json the driver has recorded plus the
current registry order, and prints per-query sweep history: which
rounds produced a row, the latest verdict, and which of the first-50
window entries are scheduled for the upcoming sweep. The round-over-
round rotation policy lives at registry._SWEEP_FIRST.

Usage: python tools/sweep_report.py [--repo /root/repo]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))

from appeals_data_spark.registry import all_queries


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", default=os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))
    args = ap.parse_args()

    rounds: dict[int, dict] = {}
    for path in sorted(glob.glob(os.path.join(args.repo, "CORRECTNESS_r*.json"))):
        n = int("".join(c for c in os.path.basename(path) if c.isdigit()))
        rounds[n] = json.load(open(path))

    names = list(all_queries())
    window = set(names[:50])
    print(f"{len(names)} registered; rounds recorded: {sorted(rounds)}; "
          f"next-window size: {len(window)}")
    never, green, failing = [], 0, []
    for name in names:
        hist = []
        for rn in sorted(rounds):
            row = rounds[rn].get(name)
            if row is None:
                continue
            ok = row.get("rows_match") and row.get("schema_match") is not False \
                and row.get("hash_match") is not False
            hist.append(f"r{rn}:{'PASS' if ok else 'FAIL'}")
        status = " ".join(hist) if hist else "never-swept"
        flag = "*" if name in window else " "
        if not hist:
            never.append(name)
        elif hist[-1].endswith("PASS"):
            green += 1
        else:
            failing.append(name)
        print(f"{flag} {name:42s} {status}")
    print(f"\nsummary: {green} latest-PASS, {len(failing)} latest-FAIL "
          f"{failing if failing else ''}, {len(never)} never-swept "
          f"({sum(1 for n in never if n in window)} of those in the next window)")


if __name__ == "__main__":
    main()
