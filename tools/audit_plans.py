"""Physical-plan audit: the scale-readiness feedback loop.

For each (or every bench-flagged) registered query, prints the join
strategies, exchange count, pushed filters, and scan schemas — the
four things that decide whether a plan survives a 100x scale-up:

- dims must be BroadcastHashJoin (no shuffle of the fact side),
- scans must show pruned ReadSchema + PushedFilters,
- Exchange count is the shuffle budget,
- BroadcastNestedLoopJoin is only acceptable when one side is tiny by
  construction (e.g. the ANN query set).

Usage: python tools/audit_plans.py [query ...] [--sf DIR] [--full]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))

from appeals_data_spark.registry import all_queries
from appeals_data_spark.session import get_spark


def plan_string(spark, df) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def build_with_segments(spark, builder, sf_dir):
    """Build a query's DataFrame while capturing the plan of every
    ``localCheckpoint``'d segment BEFORE its lineage is truncated.

    Iterative operators (PageRank, closure, Lloyd, IRLS, pegasos, BPE)
    cut lineage per round, so the final plan shows only the
    post-checkpoint residue — e.g. Exchange=1 for a 6-round PageRank.
    Intercepting the checkpoint call records each round's real plan, so
    the audit can state the honest total scale cost (rounds x
    join+agg) instead of the residue. Segments don't double count:
    round i's plan scans round i-1's checkpointed RDD."""
    try:
        # Spark 4: instances are the classic subclass, which overrides
        # localCheckpoint — patching the abstract base would be a no-op.
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # pragma: no cover - older Spark
        from pyspark.sql import DataFrame

    segments: list[str] = []
    orig = DataFrame.localCheckpoint

    def patched(self, *a, **kw):
        segments.append(plan_string(spark, self))
        return orig(self, *a, **kw)

    DataFrame.localCheckpoint = patched
    try:
        plan = plan_string(spark, builder(spark, sf_dir))
    finally:
        DataFrame.localCheckpoint = orig
    return plan, segments


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
        args = [a for a in args if a != sf_dir]
    full = "--full" in sys.argv

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    names = args or [n for n, q in sorted(qs.items()) if q.bench]
    def nodes(plan: str, op: str) -> int:
        # count numbered plan nodes exactly as the frozen gate does
        # (tests/test_plans.py) — a bare substring count would double
        # count tree + detail sections and fold BroadcastExchange /
        # ReusedExchange into the shuffle number
        return len(re.findall(rf"\(\d+\) {op}\b", plan))

    for name in names:
        plan, segments = build_with_segments(spark, qs[name].builder, sf_dir)
        # pre-execution AQE plans carry no codegen annotations, so the
        # summary sticks to the join/shuffle/pushdown facts
        print(
            f"== {name}: Exchange={nodes(plan, 'Exchange')} "
            f"BHJ={nodes(plan, 'BroadcastHashJoin')} "
            f"SMJ={nodes(plan, 'SortMergeJoin')} "
            f"BNLJ={nodes(plan, 'BroadcastNestedLoopJoin')} "
            f"Cartesian={nodes(plan, 'CartesianProduct')}"
        )
        if segments:
            seg_ex = sum(nodes(p, "Exchange") for p in segments)
            seg_j = sum(
                nodes(p, "BroadcastHashJoin")
                + nodes(p, "SortMergeJoin")
                + nodes(p, "BroadcastNestedLoopJoin")
                for p in segments
            )
            print(
                f"   iterative: {len(segments)} checkpointed segments hide "
                f"Exchange={seg_ex} joins={seg_j} from the final plan "
                f"(honest total Exchange={nodes(plan, 'Exchange') + seg_ex})"
            )
        for p in re.findall(r"PushedFilters: \[(.+?)\]", plan)[:6]:
            print("   PushedFilters:", p[:110])
        for s in re.findall(r"ReadSchema: (.+)", plan)[:6]:
            print("   ReadSchema:", s[:130])
        if full:
            print(plan)
    spark.stop()


if __name__ == "__main__":
    main()
