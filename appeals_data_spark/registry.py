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
# Round-7 rotation (EXECUTED this round): front-load the four round-7
# additions (S6 claims-exchange ingest report, perceptual-hash image
# near-dedup, trigram stupid-backoff LM, incremental corpus-delta
# dedup), then every query whose code/plan/oracle changed in round 7
# (the zero-shuffle centroid assignment + rint/round_even centroid
# twin family, the pegasos driver-iteration pair, the BT pair-stats
# extraction, the fuzzy-ER hint drop, the try_element_at probes), then
# the r2-latest tier with the four r6-displaced queries first.
# Eight r2-tier queries did not fit and lead round 8 (six listed
# below plus vec_lsh_portable, vec_brute_force_topk and
# text_token_stats (both bench queries — continuously exercised),
# displaced by
# the late vec_ann_recall_report / mm_audio_fingerprint_dedup
# additions; brute-force stays continuously exercised by bench and
# the ANN recall gates),
# followed by the r3-latest tier — keeping every query's latest driver
# verdict <= 2 rounds old.
# Simulate with `python tools/check.py --window 50 --vanilla` before
# shipping.
_SWEEP_FIRST = [
    # new in round 7 — need first driver rows
    "s6_claims_ingest_report",
    "mm_phash_near_dedup",
    "text_trigram_backoff_logprob",
    "dedup_incremental_delta",
    "vec_ann_recall_report",
    "mm_audio_fingerprint_dedup",
    "mm_video_shingle_dedup",
    "a25_countmin_bound",
    # changed in round 7 — zero-shuffle centroid assignment + the
    # rint/round_even centroid-mean twin (6 queries + the streaming
    # occupancy mirror), pegasos driver iteration (2), BT pair-stats
    # extraction, fuzzy-ER broadcast-hint drop, try_element_at probes
    "vec_label_centroid_assign",
    "vec_ivf_topk",
    "vec_ivfpq_topk",
    "dedup_semantic_clusters",
    "pipe_diverse_cluster_quota",
    "vec_kmeans_lloyd",
    "stream_centroid_occupancy",
    "pipe_classifier_filter",
    "x3_linear_svm_eval",
    "pref_bradley_terry",
    "dedup_fuzzy_entity_names",
    "pipe_decontam_bloom",
    "stream_lm_gate",
    # r2-latest tier (the four r6-displaced queries first, then the
    # remaining tier; deferred to round 8: vec_lsh_portable, vec_brute_force_topk, text_token_stats, surv_weibull_fit, w3_session_segmentation,
    # w11_rolling_mean, x3_linreg_closed_form, x4_trace_coverage,
    # x6_grouped_glm, x6_partial_pooling)
    "comp_outcome_rates",
    "a6_rate_vs_group_total",
    "closure_components",
    "x1_derived_count_scalars",
    "a15_interval_overlap_months",
    "comp_backlog_reconstruction",
    "comp_decision_locs",
    "comp_docket_projection",
    "comp_exp_gap_fit",
    "comp_priorloc_parsers",
    "comp_time_to_first_ship",
    "dedup_canonical_corpus",
    "dedup_embedding_cosine",
    "dedup_exact_summary",
    "dedup_minhash_portable",
    "dedup_ngram_jaccard_adjacent",
    "dedup_simhash_portable",
    "mm_feature_rollup",
    "pipe_contamination_overlap",
    "pipe_curation_funnel",
    "pipe_pack_sequences",
    "s5_csv_dim_broadcast_join",
    "skew_salted_agg",
    "stream_doc_curation",
    "stream_session_stats",
    "stream_tumbling_counts",
    "stream_user_totals",
    "surv_km_curve",
    "text_gopher_filters",
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
