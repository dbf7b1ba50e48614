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
# Round-11 rotation (EXECUTED this round): lead with the two queries
# that have NEVER held a driver verdict — pipe_dsir_importance_prod
# (the round-10 rows-only scale twin; a window slot buys its
# rows+schema verdict, the strongest check a rows-only entry can get)
# and x1_rr_hearing_postrem (round-11 addition closing the X1
# stored-function list). Then the PQ-encode consumers
# vec_pq_adc_topk / vec_pq_rerank_topk, whose encode path moved off
# the interpreted HOF this round (bit-identity pytest-gated, but a
# changed plan deserves a fresh driver hash verdict; vec_ivfpq_topk,
# the third consumer, rides in the r7 tier below). Then the TWELVE
# r6-tier deferrals promised by the round-10 plan, then 34 of the 46
# r7-latest-tier entries. TWELVE r7-tier queries defer to round 12,
# each with continuous non-driver evidence in the meantime:
#   stream_tumbling_counts, stream_session_stats, stream_user_totals,
#     stream_doc_curation, stream_centroid_occupancy, stream_lm_gate —
#     availableNow==batch parity + restart/exactly-once gates in
#     tests/test_streaming.py run every round;
#   dedup_incremental_delta — streaming-parity gated likewise;
#   vec_ann_recall_report, vec_kmeans_lloyd-adjacent recall paths —
#     recall/bit-identity gates in tests/test_ann_recall.py
#     (vec_kmeans_lloyd itself KEEPS its slot — its loop touches
#     aqe_disabled, changed this round);
#   mm_feature_rollup, mm_phash_near_dedup — codec+plumbing gates in
#     tests/test_multimodal.py;
#   skew_salted_agg — skew_salted_join twin swept r8; salting gates
#     in tests/test_skew.py;
#   s5_csv_dim_broadcast_join — CSV source gates in
#     tests/test_sources.py.
# The three rows-only sketches (dedup_minhash_lsh,
# dedup_simhash_hamming, vec_lsh_topk) stay out of the window: each
# has a full-oracle *_portable twin IN this window, and a slot buys
# no hash verdict for the xxhash variants themselves.
# Round-12 plan: any round-11 additions/fixes lead, then the twelve
# deferred r7 entries above, then the oldest of the r8-latest tier
# (48) to fill the window. Simulate with
# `python tools/check.py --window 50 --vanilla` before shipping.
# Round-13 rotation (r12 verdict item #8): lead with the five queries
# whose builders changed this optimization round (minhash persist
# discipline x2, the BT single-exchange pair gen, the LM large-arm
# vocab/coalesce edits — at the driver's sweep SF the LM small arms
# run the identical plan, but a changed builder takes a fresh slot,
# the r12 precedent; dedup_minhash_lsh is rows-only and spends its
# slot on the rows+schema check, the strongest available). Then the
# ENTIRE latest-verdict==r8 tier (31 entries incl. the three r12
# deferrals u5_event_where_hook / s9_partition_pruned_rollup /
# x3_linreg_closed_form), which lifts the rotation-honesty bound to
# "no latest verdict predates r9". The remaining 14 slots take the
# oldest r9-tier entries. Simulated with tools/sweep_report.py before
# shipping; dedup_simhash_hamming / vec_lsh_topk hold fresh r12
# rows-verdicts and unchanged builders, so they rotate out.
_SWEEP_FIRST = [
    # -- builders changed in round 13
    "dedup_minhash_portable",
    "dedup_minhash_lsh",
    "pref_bradley_terry",
    "text_bigram_interp_logprob",
    "text_trigram_backoff_logprob",
    # -- latest-verdict==r8 tier, complete
    "u5_event_where_hook",
    "s9_partition_pruned_rollup",
    "x3_linreg_closed_form",
    "s1_portable_sql_rollup",
    "x4_trace_coverage",
    "u6_event_funnel",
    "surv_weibull_fit",
    "x6_grouped_glm",
    "x6_partial_pooling",
    "text_token_stats",
    "text_quality_flags",
    "text_char_classes",
    "text_lang_confusion",
    "text_fingerprint_md5",
    "text_subword_tokens",
    "text_bpe_vocab",
    "text_unigram_logprob",
    "text_token_entropy",
    "text_vocab_topk",
    "text_tfidf_topk",
    "text_bm25_topk",
    "text_hybrid_rrf_topk",
    "pipe_perplexity_buckets",
    "vec_brute_force_topk",
    "vec_lsh_portable",
    "vec_ivf_delta_assign",
    "skew_salted_join",
    "pipe_stratified_sample",
    "pipe_split_shards",
    "pipe_model_score_broadcast",
    "pipe_chunk_overlap",
    # -- r9-latest tier, oldest-first fill
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
    "stream_click_attribution",
    "stream_dedup_user_types",
    "stream_event_union",
    "mm_decode_image",
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
