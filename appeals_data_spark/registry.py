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
# Round-6 rotation (EXECUTED this round — the r5 window was
# accidentally left byte-identical to r4's): front-load the six
# round-6 additions (paragraph-granularity dedup, bloom-prefiltered
# decontamination, PII/denylist scrub, cluster-diversity quota
# selection, blocked fuzzy entity matching, frequent-items
# certificate), then the 30 queries whose only driver verdict was
# from round 1 (four rounds of refactors shipped since), then 6 green
# flagship sentinels for cross-round regression cover — including the
# two queries whose PLANS changed this round (pref_bradley_terry's
# rewritten pair generation + windowed MM, pipe_classifier_filter's
# determinism-gate coverage) — then 8 queries whose latest verdict is
# round 2 (the next-oldest tier; comp_outcome_rates,
# a6_rate_vs_group_total, closure_components and
# x1_derived_count_scalars were displaced by the late round-6
# additions and lead the r2 tier in round 7). Round-7 plan: front-load
# round-7 additions, then the four displaced queries and the remaining
# r2-latest tier, then the r3 tier, keeping every query's latest
# driver verdict <= 2 rounds old.
# Simulate with `python tools/check.py --window 50 --vanilla` before
# shipping.
_SWEEP_FIRST = [
    # new in round 6 — need first driver rows
    "dedup_paragraph_retention",
    "pipe_decontam_bloom",
    "pipe_pii_blocklist_scrub",
    "pipe_diverse_cluster_quota",
    "dedup_fuzzy_entity_names",
    "a24_freq_items_bound",
    # the 30 r1-stale queries (only driver verdict was round 1)
    "p4_range_in_between",
    "p7_like_rlike",
    "p9_case_when_derive",
    "p11_coalesce_least_greatest",
    "p13_deterministic_topn",
    "p14_complete_cases",
    "f3_date_arithmetic",
    "f5_string_functions",
    "f9_math_functions",
    "f11_json_extract",
    "j2_left_join_order_counts",
    "j3_composite_key_join",
    "j4_wildcard_hierarchy_join",
    "j5_concat_key_join",
    "j6_nonequi_temporal_join",
    "j8_argmax_latest_order",
    "j9_self_join_pairs",
    "j13_right_join_fillna",
    "j15_anti_semi_join",
    "j18_cross_join_grid",
    "j20_rule_cascade_parent",
    "w4_topk_per_group",
    "w5_variable_distance_lead",
    "w6_cumulative_condition_flags",
    "w7_dense_rank_group_index",
    "w9_lead_offset_series",
    "r1_unpivot_measures",
    "r2_pivot_event_matrix",
    "r3_flags_long_confusion",
    "r4_fixed_width_split",
    # green sentinels: flagship families + the two plan-changed queries
    "a1_pricing_summary",
    "u1_union_event_log",
    "j10_fuzzy_asof_match",
    "vec_ivfpq_topk",
    "pref_bradley_terry",
    "pipe_classifier_filter",
    # r2-latest tier refreshes (oldest remaining verdicts)
    "u2_union_dedup",
    "u3_array_intersect_sources",
    "o1_multikey_sort_head",
    "o4_complete_weeks_only",
    "w1_lead_lag_gaps",
    "j12_cross_source_join",
    "j16_window_similarity_count",
    "j17_pit_backlog",
]


def all_queries() -> dict[str, Query]:
    # Import for side effects: populates REGISTRY.
    from . import queries  # noqa: F401

    unknown = [n for n in _SWEEP_FIRST if n not in REGISTRY]
    # Loud, not silent: a typo or a renamed query must not shrink the
    # driver's 50-query sweep window invisibly.
    assert not unknown, f"_SWEEP_FIRST names not in REGISTRY: {unknown}"
    assert len(set(_SWEEP_FIRST)) == len(_SWEEP_FIRST), (
        "duplicate _SWEEP_FIRST entries shrink the sweep window"
    )
    ordered = {n: REGISTRY[n] for n in _SWEEP_FIRST}
    for n, q in REGISTRY.items():
        if n not in ordered:
            ordered[n] = q
    return ordered
