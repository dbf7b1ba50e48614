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
# Round-8 rotation (EXECUTED this round): front-load the one round-8
# addition (the PQ recall certificate) and the two round-8-changed
# queries (semantic dedup's max_by rep selection + checkpointed
# centroid model; Bradley-Terry now fit through ml/bt.py's
# path-switching bt_strengths), then the TEN r2-latest-tier queries
# deferred from round 7 (retiring the r2 tier completely), then 37 of
# the 45 r3-latest-tier queries. EIGHT r3-tier queries defer to round
# 9, each with continuous non-driver evidence in the meantime:
#   vec_pq_adc_topk, vec_pq_rerank_topk — their oracles and builders
#     are spliced verbatim into vec_pq_recall_report (in this window),
#     and both are in bench.py SECONDARY;
#   dedup_substring_coverage, text_bpe_merges — bench.py SECONDARY;
#   j21_bucketed_copartition_join — zero-Exchange SMJ plan-asserted in
#     tests/test_bucketing.py;
#   stream_click_attribution, stream_dedup_user_types,
#   stream_event_union — stream-vs-batch parity gates in
#     tests/test_streaming.py (batch twins oracle-checked).
# Round-9 plan: those eight lead, then the r4/r5-latest tier.
# Simulate with `python tools/check.py --window 50 --vanilla` before
# shipping.
_SWEEP_FIRST = [
    # new in round 8 — need their first driver rows
    "pipe_dsir_importance",
    "x4_markov_stationary",
    "a26_hll_setops_bound",
    "text_kgram_novelty",
    "vec_sq8_topk",
    "vec_pq_recall_report",
    "vec_ivf_delta_assign",
    # changed in round 8
    "dedup_semantic_clusters",
    "pref_bradley_terry",
    # r2-latest tier, deferred from round 7 — retires the r2 tier
    "surv_weibull_fit",
    "text_token_stats",
    "vec_brute_force_topk",
    "vec_lsh_portable",
    "w11_rolling_mean",
    "w3_session_segmentation",
    "x3_linreg_closed_form",
    "x4_trace_coverage",
    "x6_grouped_glm",
    "x6_partial_pooling",
    # changed by the round-8 sf10-probe scale fixes (data-sized
    # broadcast hints dropped; canonical near-dup stage rewritten as
    # inverted-index intersection counting) — fresh driver rows needed
    "dedup_canonical_corpus",
    "text_trigram_backoff_logprob",
    "text_bigram_interp_logprob",
    "text_bm25_topk",
    "text_hybrid_rrf_topk",
    "pipe_perplexity_buckets",
    "comp_ep_classifier_eval",
    # r3-latest tier (31 of 45; the deferred eight are justified
    # above, plus six more displaced by the probe-fix queries:
    # mm_decode_image / mm_resize_dims / mm_frame_sample (decode value
    # gates in tests/test_multimodal.py), x4_transition_matrix (the
    # trace family has fresh rows via x4_trace_coverage/x4_trace_regex),
    # surv_km_counts / surv_median_lifetime (surv_km_curve is
    # continuously benched and in this window), and
    # x6_random_intercept_em displaced by the hint-audit-changed
    # comp_ep_classifier_eval (the EM family keeps a window row via
    # x6_mixed_treatment_em) — plus text_winnow_fingerprints displaced by the late
    # vec_ivf_delta_assign addition (its fingerprint sibling
    # text_fingerprint_md5 keeps a window row) — all sixteen lead
    # round 9)
    "a16_cube_rollup",
    "pipe_chunk_overlap",
    "pipe_mixture_weights",
    "pipe_model_score_broadcast",
    "pipe_split_shards",
    "pipe_stratified_sample",
    "pipe_temperature_mixture",
    "r6_paired_field_changes",
    "s1_portable_sql_rollup",
    "s9_partition_pruned_rollup",
    "skew_salted_join",
    "text_bpe_vocab",
    "text_char_classes",
    "text_fingerprint_md5",
    "text_lang_confusion",
    "text_quality_flags",
    "text_subword_tokens",
    "text_tfidf_topk",
    "text_token_entropy",
    "text_top2gram_repetition",
    "text_unigram_logprob",
    "text_vocab_topk",
    "u5_event_where_hook",
    "u6_event_funnel",
    # w12_linear_interpolation, x3_grouped_correlation,
    # x3_logistic_irls, x6_grouped_model_fit and x6_mixed_treatment_em
    # displaced by the round-8b additions (pipe_dsir_importance,
    # x4_markov_stationary, a26_hll_setops_bound, text_kgram_novelty,
    # vec_sq8_topk); the interp/correlation/IRLS/grouped-fit/EM family
    # keeps continuous pytest differential evidence via
    # tests/test_differential.py and leads round 9 with the other
    # displaced entries listed above.
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
