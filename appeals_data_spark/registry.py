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
# valuable first. Cross-round driver union r1|r2|r3|r4|r5 covers ALL
# registered queries.
#
# Round-9 rotation (EXECUTED this round): lead with the seven round-9
# additions (MIPS exact top-k, MMR diversified retrieval, CDC
# chunking + its cross-source lineage matrix, the binned range join,
# the Zipf vocabulary fit, the Mann-Whitney rank test) and the two
# round-9-FIXED queries (pipe_dsir_importance /
# x4_markov_stationary — the r8 hash flips, re-pinned via the portable
# rounding recipes in functions/scalars.py; their fresh verdicts are
# the round's primary evidence). Then the ENTIRE 21-query
# r3-latest tier (retiring it), then 20 of the 32 oracled r5-latest
# queries. TWELVE r5-tier queries defer to round 10, each with
# continuous non-driver evidence in the meantime:
#   a12_monthly_rollup, j1_revenue_by_nation — bench.py HEADLINE every
#     round;
#   graph_pagerank_handoff, mm_decode_audio, pipe_source_caps,
#     x6_holt_linear — bench.py SECONDARY (mm_decode additionally
#     value-gated in tests/test_multimodal.py);
#   x3_ab_welch_ttest, x3_mad_outliers — closed-form differential
#     gates in tests/test_differential.py;
#   x6_logistic_glmm — bench.py SECONDARY + tests/test_differential.py
#     (displaced by the fourth round-9 addition,
#     text_cdc_cross_source);
#   x4_trace_regex — displaced by the fifth addition
#     (j22_binned_range_join); the trace family keeps fresh rows via
#     x4_trace_coverage (r8) and x4_transition_matrix (this window);
#   surv_cuminc — displaced by the sixth addition (text_zipf_fit);
#     the survival family holds three window rows (surv_km_counts,
#     surv_median_lifetime) plus the continuously-benched
#     surv_km_curve;
#   u7_event_endstates — displaced by the seventh addition
#     (x3_mann_whitney); the event-endstate path is exercised every
#     round through the u1 headline bench's fused extractor views and
#     u5/u6 hold window rows.
# The three rows-only sketches (dedup_minhash_lsh,
# dedup_simhash_hamming, vec_lsh_topk — documented no_oracle, portable
# twins fully oracled) stay out of the window: a window slot buys no
# hash verdict for them.
# Round-10 plan: the TWELVE deferred r5 entries lead, then the
# r6-latest tier (44). Simulate with
# `python tools/check.py --window 50 --vanilla` before shipping.
_SWEEP_FIRST = [
    # new in round 9 — need their first driver rows
    "vec_mips_topk",
    "vec_mmr_diversified_topk",
    "text_cdc_chunks",
    "text_cdc_cross_source",
    # FIXED in round 9 (r8 hash flips -> portable rounding pins)
    "pipe_dsir_importance",
    "x4_markov_stationary",
    # new in round 9 (late additions): binned range join, Zipf fit,
    # Mann-Whitney U
    "j22_binned_range_join",
    "text_zipf_fit",
    "x3_mann_whitney",
    # r3-latest tier (all 21 — retires the tier)
    "dedup_substring_coverage",
    "j21_bucketed_copartition_join",
    "mm_decode_image",
    "mm_frame_sample",
    "mm_resize_dims",
    "stream_click_attribution",
    "stream_dedup_user_types",
    "stream_event_union",
    "surv_km_counts",
    "surv_median_lifetime",
    "text_bpe_merges",
    "text_winnow_fingerprints",
    "vec_pq_adc_topk",
    "vec_pq_rerank_topk",
    "w12_linear_interpolation",
    "x3_grouped_correlation",
    "x3_logistic_irls",
    "x4_transition_matrix",
    "x6_grouped_model_fit",
    "x6_mixed_treatment_em",
    "x6_random_intercept_em",
    # r5-latest tier (20 of 32 oracled; deferral justified above).
    # w15_ntile_deciles also carries the round-8b two-phase NTILE
    # rewrite, so its fresh row doubles as a change-verification.
    "a2_conditional_agg_flags",
    "a3_distinct_counts",
    "a7_quantile_summary",
    "a8_crosstab",
    "a9_pivot_agg",
    "a10_listagg",
    "a13_histogram",
    "a14_ranked_selection",
    "a15_fiscal_year_summary",
    "a18_incremental_rollup",
    "a20_retention_cohorts",
    "a21_sliding_mau",
    "a22_approx_quantile_bound",
    "a23_approx_distinct_bound",
    "opt_zorder_skipping",
    "p1_projection_alias_nulltest",
    "r7_scd2_dimension",
    "w13_ewma_smoothing",
    "w14_cusum_changepoint",
    "w15_ntile_deciles",
]


def all_queries() -> dict[str, Query]:
    # Import for side effects: populates REGISTRY.
    from . import queries  # noqa: F401

    unknown = [n for n in _SWEEP_FIRST if n not in REGISTRY]
    # Loud, not silent: a typo or a renamed query must not shrink the
    # driver's 50-query sweep window invisibly. Real raises (not assert)
    # so the guard survives ``python -O``.
    if unknown:
        raise ValueError(f"_SWEEP_FIRST names not in REGISTRY: {unknown}")
    if len(set(_SWEEP_FIRST)) != len(_SWEEP_FIRST):
        dupes = sorted(
            {n for n in _SWEEP_FIRST if _SWEEP_FIRST.count(n) > 1}
        )
        raise ValueError(
            f"duplicate _SWEEP_FIRST entries shrink the sweep window: {dupes}"
        )
    ordered = {n: REGISTRY[n] for n in _SWEEP_FIRST}
    for n, q in REGISTRY.items():
        if n not in ordered:
            ordered[n] = q
    return ordered
