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
_SWEEP_FIRST = [
    # -- changed this round (the ratio-legacy -> ratio_dbl/pin_dbl
    # migration, round-12 verdict item #1) — lead the window
    "r6_paired_field_changes",
    "comp_ep_classifier_eval",
    "pipe_mixture_weights",
    "pipe_temperature_mixture",
    "pipe_curation_funnel",
    "x6_mixed_treatment_em",
    "x6_logistic_glmm",
    # -- also changed this round: the two small-SF steady recoveries
    # (BT size dispatch, canonical-corpus trim) + kgram-novelty probe
    "pref_bradley_terry",
    "dedup_canonical_corpus",
    "text_kgram_novelty",
    # -- changed later in round 12 (plan rebuilds, all bit-equality/
    # oracle-gated locally — a changed plan deserves a fresh driver
    # hash verdict): size-dispatch family, Arrow front-ends, shared
    # fits (pipe_dsir_importance_prod rides its oracled portable twin;
    # rows-only slots buy no hash verdict)
    "closure_components",
    "graph_pagerank_handoff",
    "x4_markov_stationary",
    "x3_linear_svm_eval",
    "pipe_classifier_filter",
    "pipe_dsir_importance",
    "pipe_decontam_bloom",
    "vec_pq_recall_report",
    "dedup_paragraph_retention",
    "text_cdc_chunks",
    "text_cdc_cross_source",
    "vec_sq8_topk",
    "dedup_embedding_cosine",
    "pipe_contamination_overlap",
    "text_winnow_fingerprints",
    "text_gopher_filters",
    "text_top2gram_repetition",
    "dedup_semantic_clusters",
    # (still later in r12: the LM occurrence front-ends and the
    # substring-coverage gram stream gained the Arrow/size-dispatch
    # arm — at the driver's sweep SF the small arm runs the identical
    # old plan, but the builder changed, so they take fresh slots)
    "text_bigram_interp_logprob",
    "text_trigram_backoff_logprob",
    "dedup_substring_coverage",
    # -- latest verdict predates r8 (rotation honesty, verdict #7);
    # the three rows-only members each carry an oracled portable twin
    "dedup_minhash_lsh",
    "dedup_simhash_hamming",
    "vec_lsh_topk",
    "s5_csv_dim_broadcast_join",
    "stream_tumbling_counts",
    "stream_session_stats",
    "stream_user_totals",
    "stream_doc_curation",
    "stream_centroid_occupancy",
    "stream_lm_gate",
    "mm_feature_rollup",
    "mm_phash_near_dedup",
    "dedup_incremental_delta",
    "vec_ann_recall_report",
    "skew_salted_agg",
    # -- r8-latest tier, oldest-first rotation fill
    "a16_cube_rollup",
    "a26_hll_setops_bound",
    "w3_session_segmentation",
    "w11_rolling_mean",
    # u5_event_where_hook, s9_partition_pruned_rollup,
    # x3_linreg_closed_form displaced to the r13 window by the three
    # latest changed-builder queries above (LM front-ends,
    # substring-coverage dispatch)
    # s1_portable_sql_rollup displaced with the text_* tier below
    # x4_trace_coverage displaced with the text_* tier below
    # u6_event_funnel displaced with the text_* tier below
    # surv_weibull_fit displaced with the text_* tier below
    # x6_grouped_glm, x6_partial_pooling displaced with the text_*
    # tier below
    # (12 more r8-tier text_* entries — token_stats, quality_flags,
    # char_classes, lang_confusion, fingerprint_md5, subword_tokens,
    # bpe_vocab, unigram_logprob, token_entropy, vocab_topk,
    # top2gram_repetition, tfidf_topk — displaced to the r13 window by
    # this round's twelve changed-plan queries; their r8 verdicts
    # satisfy the >=r8 rotation-honesty bound, changed plans do not
    # wait)
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
