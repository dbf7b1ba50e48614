"""Declarative query registry.

Every implemented operator/query from SURVEY.md §2 registers itself here
with (a) a Spark DataFrame builder and (b) an ANSI-SQL oracle string the
DuckDB differential harness can run on the same tables. The driver's
``__spark_entry__.queries()`` / ``oracle_sql()`` are thin projections of
this registry; so are the pytest differential tests and bench.py.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]

_CTE_DEF = re.compile(
    r"((?:\bWITH|,)\s*\w+\s+AS)\s*\("
    r"(?=(?:\s|--[^\n]*\n)*(?:SELECT|WITH|VALUES)\b)",
    re.IGNORECASE,
)


def materialize_ctes(sql: str) -> str:
    """Mark every CTE in an oracle `MATERIALIZED` (DuckDB/Postgres
    hint). Unrolled-iteration oracles reference round i-1's CTE from
    several round-i CTEs; without materialization DuckDB inlines and
    re-evaluates the chain exponentially (measured 34s -> 0.2s on the
    10-round pegasos oracle). Textually safe: a CTE definition is the
    only place ``name AS (`` follows WITH or a comma AND the paren
    opens a query (SELECT/WITH/VALUES lookahead). Column aliases are
    ``expr AS name``; CAST types are never followed by ``(``; named
    WINDOW clauses — including the 2nd+ entry of a multi-window list,
    which the comma anchor alone would hit — open with
    PARTITION/ORDER/ROWS/RANGE, never a query keyword."""
    return _CTE_DEF.sub(r"\1 MATERIALIZED (", sql)


@dataclass
class Query:
    name: str
    builder: Builder
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline suite
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame``."""

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(
            name=name,
            builder=fn,
            oracle=oracle,
            tags=tags,
            bench=bench,
            doc=(fn.__doc__ or "").strip(),
        )
        return fn

    return deco


# Driver-sweep priority. The external correctness driver sweeps exactly
# the first ~50 registry entries per round (a count/time budget — every
# later entry gets no row despite running fine on a vanilla session), so
# ``all_queries`` yields the entries whose driver verdict is most
# valuable first. After the round-4 window below is swept, the
# cross-round union r1|r2|r3|r4 covers ALL registered queries — zero
# never-swept remain.
#
# Round-5 rotation plan: front-load any queries round 5 adds, then the
# ~27 queries whose only driver row is from round 1 (the oldest
# verdicts: p4/p7/p9/p11/p13/p14, f3/f5/f9/f11, the j2/j3/j5-j20 join tail, w4-w9,
# the r1-r4 reshape family — recompute against CORRECTNESS_r0{1..4} as
# in the round-4 session; j2/j3/p13/p9/p7/p4 were displaced from
# the round-4 window by the late text_hybrid_rrf_topk /
# pipe_source_caps / mm_decode_audio / pref_bradley_terry /
# x6_holt_linear / text_bigram_interp_logprob additions), then
# ~6 green sentinels, then the oldest of the queries not swept since
# round 2. Simulate with
# `python tools/check.py --window 50 --vanilla` before shipping.
_SWEEP_FIRST = [
    # Round-4 rotation: after r1∪r2∪r3 exactly 17 registered queries have
    # never received a driver row (all locally green — they landed after
    # the round-3 window was fixed). They lead the window: the 14
    # oracle-backed ones first, the 3 permanent rows-only sketches after
    # (their oracled portable twins are already driver-green).
    "text_bm25_topk",
    "a18_incremental_rollup",
    "r7_scd2_dimension",
    "u7_event_endstates",
    "graph_pagerank_handoff",
    "w13_ewma_smoothing",
    "opt_zorder_skipping",
    "x4_trace_regex",
    "x3_ab_welch_ttest",
    "x3_mad_outliers",
    "a20_retention_cohorts",
    "w14_cusum_changepoint",
    "a21_sliding_mau",
    "w15_ntile_deciles",
    "dedup_minhash_lsh",
    "dedup_simhash_hamming",
    "vec_lsh_topk",
    # new in round 4 (oracle-backed) — need first driver rows
    "x6_logistic_glmm",
    "x3_linear_svm_eval",
    "dedup_semantic_clusters",
    "pipe_perplexity_buckets",
    "stream_centroid_occupancy",
    "pipe_classifier_filter",
    "a22_approx_quantile_bound",
    "a23_approx_distinct_bound",
    "stream_lm_gate",
    "text_hybrid_rrf_topk",
    "pipe_source_caps",
    "mm_decode_audio",
    "pref_bradley_terry",
    "x6_holt_linear",
    "text_bigram_interp_logprob",
    # green sentinels for cross-round regression cover (r1/r2/r3 greens
    # spanning the flagship families: TPC-H agg, fused event union,
    # as-of join, classifier eval, survival, composed ANN)
    "a1_pricing_summary",
    "u1_union_event_log",
    "j10_fuzzy_asof_match",
    "comp_ep_classifier_eval",
    "surv_cuminc",
    "vec_ivfpq_topk",
    # aged round-1 greens (no driver row since r1) — refresh the oldest
    # verdicts, one representative per family plus the j1 watch item
    "j1_revenue_by_nation",
    "a12_monthly_rollup",
    "a2_conditional_agg_flags",
    "a3_distinct_counts",
    "a7_quantile_summary",
    "a8_crosstab",
    "a9_pivot_agg",
    "a10_listagg",
    "a13_histogram",
    "a14_ranked_selection",
    "a15_fiscal_year_summary",
    "p1_projection_alias_nulltest",
]


def all_queries() -> dict[str, Query]:
    # Import for side effects: populates REGISTRY.
    from . import queries  # noqa: F401

    ordered = {n: REGISTRY[n] for n in _SWEEP_FIRST if n in REGISTRY}
    for n, q in REGISTRY.items():
        if n not in ordered:
            ordered[n] = q
    return ordered
