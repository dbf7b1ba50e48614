"""Physical-plan regression gate over EVERY registered query.

tools/audit_plans.py is the interactive feedback loop; this test
freezes its invariants so a plan regression (a join degrading to a
cartesian product, a scan losing column pruning, a nested-loop join
appearing on a non-tiny side) fails CI instead of surfacing as a
mystery slowdown at scale.
"""

from __future__ import annotations

import os
import re
import sys

import pytest

from appeals_data_spark.registry import all_queries

from conftest import SF_CORRECT, SF_SMOKE

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir, "tools")
)
from audit_plans import build_with_segments  # noqa: E402

# Queries where BroadcastNestedLoopJoin is acceptable because one side
# is tiny BY CONSTRUCTION (a handful of ANN probe vectors / centroids,
# a month grid, a 1-row scalar aggregate, a wildcard dim of a few
# hundred taxonomy rows). Anything else showing a BNLJ is a bug.
BNLJ_OK = {
    "a15_interval_overlap_months",  # 80-row month grid side
    "dedup_embedding_cosine",  # top-k probe side
    "vec_mips_topk",  # broadcast 8-query probe side (brute-force pattern)
    "j18_cross_join_grid",  # deliberate grid cross join (J18)
    "j4_wildcard_hierarchy_join",  # disjunctive taxonomy dim (must broadcast)
    "o4_complete_weeks_only",  # 1-row max-week scalar
    "p14_complete_cases",  # 1-row threshold scalar
    "pipe_decontam_bloom",  # 1-row 512-word bloom-bitset map side
    "dedup_incremental_delta",  # 1-row corpus-signature bloom map side
    "pipe_mixture_weights",  # 1-row token-budget scalar side
    "text_bm25_topk",  # 1-row corpus-stats scalar side
    "text_hybrid_rrf_topk",  # 1-row BM25 stats scalar + 1-probe dense side
    "text_tfidf_topk",  # 1-row distinct-source-count scalar side
    "text_unigram_logprob",  # 1-row corpus-total scalar side
    "text_bigram_interp_logprob",  # 1-row corpus-total scalar side
    "text_trigram_backoff_logprob",  # 1-row corpus-total scalar side
    "pipe_perplexity_buckets",  # 1-row corpus-total scalar side (LM train)
    # dedup_semantic_clusters left this list in round 12: the one-row
    # centroid-array crossJoin became the Arrow assign_to_centroids
    # pass, so no BNLJ remains in its plan
    "pipe_diverse_cluster_quota",  # |labels|-row centroid side
    "pipe_classifier_filter",  # 1-row fitted-coefficient scoring side
    "stream_centroid_occupancy",  # 1-row centroid-array model side
    "stream_lm_gate",  # 1-row LM-map model side
    "pipe_model_score_broadcast",  # 1-row fitted-coefficient side
    "x3_logistic_irls",  # 1-row IRLS coefficient side per round
    "x3_linear_svm_eval",  # 1-row fitted-coefficient eval side
    "u3_array_intersect_sources",  # collect_set'd tiny side
    "vec_brute_force_topk",  # 8 probe vectors
    "vec_ann_recall_report",  # 8 probe vectors (brute-force arm) + 1-row centroid array
    "vec_sq8_topk",  # 1-row bounds model + 8 probe vectors (round 8b)
    # round 10: six vec entries left this list — the centroid assign
    # fold moved to the Arrow mapInPandas scorer, so the 1-row
    # centroid-array crossJoin BNLJs no longer exist in those plans
    "x6_partial_pooling",  # 1-row global shrinkage stats side
    "x4_trace_regex",  # 4-row pattern dim + 1-row trace-total scalar
    "a21_sliding_mau",  # 1-row date-bounds scalar side
    "a24_freq_items_bound",  # 1-row freqItems sketch side
    "a26_hll_setops_bound",  # |event-type|-row sketch/count frames paired on type inequality
}

MAX_SCAN_FIELDS = 10  # widest table has 16 cols; every query projects fewer

# Frozen shuffle budget for the bench (headline) queries plus the
# heavyweight flagships: the number of `Exchange` (shuffle) nodes in
# the INITIAL formatted plan. A diff here means a join strategy or
# aggregation shape changed — at 100 TB every extra exchange is a
# full-data shuffle, so budget increases must be a conscious decision,
# not a silent regression. (Branches duplicated in the initial plan
# are deduplicated by AQE stage reuse at runtime; the budget counts
# the static plan, which is the stable, comparable artifact.)
SHUFFLE_BUDGET = {
    "a12_monthly_rollup": 2,
    "a1_pricing_summary": 2,
    "comp_outcome_rates": 3,
    "comp_time_to_first_ship": 5,
    # round 13: 10 -> 7 — persisting feats dedupes the signature agg
    # that the band self-join's broadcast side re-planned (broadcast
    # and shuffle exchanges never unify), and the verify side joins a
    # persisted candidate shingle-set frame instead of re-running the
    # semi-join + re-shingle per pair endpoint
    "dedup_minhash_lsh": 7,
    "j10_fuzzy_asof_match": 3,
    "j17_pit_backlog": 2,
    "j1_revenue_by_nation": 3,
    "mm_feature_rollup": 4,
    "pipe_curation_funnel": 10,
    "stream_session_stats": 2,
    "surv_km_curve": 3,
    "text_token_stats": 2,
    # 4 semantic shuffles (clickstream window, ssoc dedup, final agg,
    # order-by) + 2 sized_for_compute redistributions of the orders /
    # lineitem explode branches — those two exist only because the
    # local export is a single split and vanish on a real lake layout.
    "u1_union_event_log": 6,
    "vec_brute_force_topk": 2,
    # 4 -> 2 in round 10: the Arrow assigner replaced the two
    # centroid_struct_array one-row collapses (one per assign side)
    "vec_ivf_topk": 2,
    "w3_session_segmentation": 2,
}


# Populated by the all_plans fixture: name -> plans of the query's
# localCheckpoint'd segments, captured BEFORE lineage truncation (see
# tools/audit_plans.build_with_segments) — the final plan of an
# iterative query shows only the post-checkpoint residue, so the
# per-round scale cost lives here.
SEGMENTS: dict[str, list[str]] = {}


@pytest.fixture(scope="module")
def all_plans(spark):
    # Cold plans only: earlier tests may have materialized a builder's
    # intentional persist() (e.g. minhash candidate pairs), and Spark's
    # cache manager would then substitute InMemoryRelation into any
    # matching subtree here — hiding that plan's real exchanges.
    spark.catalog.clearCache()
    SEGMENTS.clear()
    plans = {}
    for name, q in sorted(all_queries().items()):
        plan, segs = build_with_segments(spark, q.builder, SF_SMOKE)
        plans[name] = plan
        SEGMENTS[name] = segs
    return plans


def test_no_cartesian_products(all_plans):
    offenders = [n for n, p in all_plans.items() if "CartesianProduct" in p]
    assert not offenders, offenders


def test_nested_loop_joins_only_on_tiny_sides(all_plans):
    offenders = [
        n
        for n, p in all_plans.items()
        if "BroadcastNestedLoopJoin" in p and n not in BNLJ_OK
    ]
    assert not offenders, offenders
    stale = [n for n in BNLJ_OK if "BroadcastNestedLoopJoin" not in all_plans[n]]
    assert not stale, f"BNLJ_OK entries no longer needed: {stale}"


def test_scans_are_column_pruned(all_plans):
    offenders = {}
    for name, plan in all_plans.items():
        for schema in re.findall(r"ReadSchema: struct<([^>]*)>", plan):
            n_fields = len([f for f in schema.split(",") if ":" in f])
            if n_fields > MAX_SCAN_FIELDS:
                offenders[name] = n_fields
    assert not offenders, offenders


def test_j21_join_sides_are_shuffle_free(spark):
    # The bucketed-layout query's reason to exist: both fact scans feed
    # the sort-merge join with no Exchange on either side (children of
    # the SMJ node print after it in the plan tree).
    df = all_queries()["j21_bucketed_copartition_join"].builder(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan
    join_subtree = plan.split("SortMergeJoin")[-1]
    assert join_subtree.count("Exchange") == 0, plan


def test_s9_partition_filter_prunes_scan(spark):
    # The partitioned-layout query's reason to exist: the year predicate
    # resolves against partition directories at plan time, not per-row.
    df = all_queries()["s9_partition_pruned_rollup"].builder(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "1997" in m.group(1), plan


def test_bench_shuffle_budget_frozen(all_plans):
    from appeals_data_spark.registry import all_queries

    bench_names = {n for n, q in all_queries().items() if q.bench}
    assert bench_names <= set(SHUFFLE_BUDGET), (
        "bench query missing a frozen shuffle budget — add it "
        f"consciously: {bench_names - set(SHUFFLE_BUDGET)}"
    )
    assert set(SHUFFLE_BUDGET) <= set(all_queries()), (
        f"stale SHUFFLE_BUDGET entries: {set(SHUFFLE_BUDGET) - set(all_queries())}"
    )
    actual = {
        n: len(re.findall(r"\(\d+\) Exchange\b", all_plans[n]))
        for n in bench_names
    }
    drift = {
        n: (SHUFFLE_BUDGET[n], actual[n])
        for n in bench_names
        if actual[n] != SHUFFLE_BUDGET[n]
    }
    assert not drift, f"(budgeted, actual) shuffle-count drift: {drift}"


def _ex(plan: str) -> int:
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


# Frozen (checkpointed segments, exchanges inside those segments) per
# iterative query at SF_SMOKE. localCheckpoint truncates lineage, so
# these exchanges are INVISIBLE to every final-plan assertion above —
# this gate is what keeps the real per-round scale cost of the
# iterative loops (PageRank, closure, Lloyd, IRLS, pegasos, BPE) a
# conscious decision rather than a silent regression. Fixpoint loops
# (closure, canonical dedup) have data-dependent round counts; the
# numbers below are for the fixed sf0.001 fixture. Note
# graph_pagerank_handoff early-exits on the empty sf0.001 graph — its
# honest per-round budget is frozen at sf0.01 in
# test_pagerank_per_round_exchanges_frozen.
ITERATIVE_SEGMENTS = {
    # (3, 10) -> (4, 7) in round 10: the loop checkpoints under a
    # scoped AQE-off (see operators/closure.py) — one extra build
    # segment (the sorted re-layout of the symmetric edge frame) and
    # the per-round label-propagation join now plans exchange-free on
    # the edge side; the convergence count also moved onto the
    # checkpointed frame, halving per-round execution.
    # (4, 7) -> (4, 5) in round 12: the loop sizes its shuffle count
    # from the materialized edge frame (scoped_shuffle_partitions) —
    # at the sf0.001 fixture that is ONE partition, and a single-
    # partition child satisfies every clustered distribution, so the
    # per-round min-agg exchanges vanish from the smoke plan. At
    # scale n_part grows back to the ambient conf and the exchanges
    # return — the frozen number is for the fixed sf0.001 fixture, as
    # stated above.
    # (4, 5) -> (1, 4) in round 12 (second change): the fixpoint is
    # size-dispatched — small numeric graphs run as one Arrow
    # union-find pass over the symmetric-edge checkpoint (the only
    # remaining segment; its 4 exchanges are the upstream handoff
    # window + distinct), and the per-round loop segments appear only
    # above CLOSURE_LOCAL_MAX_EDGES. The distributed loop's per-round
    # budget stays pinned by
    # test_operators_golden.py::test_closure_local_matches_distributed
    # driving it directly.
    "closure_components": (1, 4),
    # (5, 18) -> (5, 22) in round 8: the near-dup stage moved from a
    # per-pair array-shipping block join to inverted-index
    # intersection counting (explode + (blk, word) equi-join + one
    # map-side-combinable pair agg) after the 100x probe measured the
    # array form at >25min/run (BASELINE.md) — 4 more exchange NODES
    # carrying ~15x less data.
    # (5, 22) -> (6, 12) in round 10: inherits the closure loop's
    # AQE-off co-partitioned rounds (connected_components is its
    # clustering stage).
    # (6, 12) -> (6, 22) in round 11: the near-edge stage moved to the
    # prefix-filtered exact similarity join (AllPairs/ppjoin mid-
    # prefix + positional filter) with salted per-block COGROUP
    # verification — the extra exchange NODES are the word-frequency
    # agg + join, the per-doc rarity-rank window, the candidate
    # distinct, and the cogroup's two (blk, salt) exchanges. All are
    # corpus-WORDS-, docs-, or candidates-sized; what they buy is
    # removing BOTH the sum C(occ,2) pair stream (quadratic in block
    # occupancy) and the per-pair array-shipping verify joins
    # (~350 GB at 1000x) — the two sf100 DNFs. sf100 now 422s.
    # (6, 22) -> (7, 18) in round 12: the candidate stream is
    # checkpointed DISK_ONLY (one new segment) and the docs side of
    # the cogroup verify is DATA-ADAPTIVE on the materialized
    # candidate count — endpoint semi-join when pairs are sparse
    # relative to docs, narrow K_SALT explode when dense. The fixture
    # corpus is dense, so the frozen plan shows the explode branch
    # (no endpoint distinct/join exchanges); -4 is the closure loop's
    # single-partition smoke rounds (see closure_components).
    # (7, 18) -> (2, 12) in round 12 (second change): the duplicate
    # graph rides the closure size dispatch — at fixture scale the
    # fixpoint is the one-pass Arrow union-find, so the per-round
    # label segments vanish and only the candidate checkpoint + the
    # symmetric-edge checkpoint remain (the latter's exchanges: the
    # exact-hash window, the cogroup's two (blk, salt) placements, the
    # edge distinct, and the candidate pipeline feeding it).
    # (2, 12) -> (2, 8) in round 12 (third change): below 1M
    # candidates the near-edge verify runs in pure JVM (two doc-id
    # equi-joins + array_intersect/array_union Jaccard) instead of the
    # (blk, salt) cogroup — the fixture takes that branch, dropping
    # the cogroup's two group placements and the docs-side exchanges.
    "dedup_canonical_corpus": (2, 8),
    # (10, 41) -> (12, 18) in round 10: the loop now checkpoints under
    # a scoped AQE-off so LogicalRDD keeps hash partitioning/ordering —
    # the loop-invariant edge frame is placed on src once (two new
    # build segments: the edge-list materialization + the sorted
    # re-layout) and each round's edge⋈rank join plans exchange-free
    # (5 -> 2 exchanges/round; the two left are the contrib agg and the
    # 1-row dangling agg). Same arithmetic, same oracle hash.
    # (12, 18) -> (1, 2) in round 12: pagerank is size-dispatched —
    # at or below PAGERANK_LOCAL_MAX_EDGES the 6 rounds run in ONE
    # Arrow mapInPandas pass over the coalesced edge checkpoint (the
    # Bradley-Terry in-one-applyInPandas move), so the smoke fixture
    # shows only the edge-derivation segment (window + distinct
    # exchanges). The distributed loop's per-round budget stays frozen
    # in test_pagerank_per_round_exchanges_frozen, which now drives
    # pagerank_distributed directly.
    "graph_pagerank_handoff": (1, 2),
    # pipe_classifier_filter / x3_linear_svm_eval no longer appear:
    # pegasos moved to MLlib-style driver iteration (literal-spliced
    # coefficients, no per-round localCheckpoint) — each round is one
    # plain aggregation job, visible as no checkpointed segment.
    # ONE checkpointed segment: posexplode pair generation (unit agg +
    # per-part grouping + pair agg). All 3 MM rounds run inside a
    # single applyInPandas over the checkpointed pair stats — the
    # final plan is just FlatMapGroupsInPandas + rank (2 exchanges).
    # Was (6, 13) with per-round broadcast-join rounds in r4/r5.
    # (1, 3) -> (1, 2) in r13: one explicit pk repartition feeds both
    # the unit-price agg and the per-part grouping (pk is a prefix of
    # (pk, sk)), collapsing the segment's back-to-back exchanges.
    "pref_bradley_terry": (1, 2),
    # two checkpointed segments (r12): the distinct bench gram set
    # (reused by the Bloom build and the confirming semi-join
    # broadcast) plus the contaminated-doc decile table — the corpus
    # probe now runs once inside that segment with the per-doc gram
    # total carried through the explode (was (1, 1) when a second
    # full gram pass re-derived the totals; zero-hit docs are now
    # recovered by count arithmetic in the static plan)
    "pipe_decontam_bloom": (2, 5),
    # one checkpointed segment: the 1536-cell count-min table (one
    # map-side-combinable exchange), broadcast to the estimate join
    "a25_countmin_bound": (1, 1),
    # one checkpointed segment: the distinct frozen-corpus signature
    # set (scan + distinct exchange), reused by the bloom build and
    # the confirming join broadcast
    "dedup_incremental_delta": (1, 1),
    # one checkpointed segment: the (hash, source, n) multiplicity
    # rollup (decode+dhash pass -> source join -> rollup; 2 exchanges)
    # reused by the banding, the Hamming confirm, and both weight joins
    "mm_phash_near_dedup": (1, 2),
    # same shape, audio: decode+envelope-hash pass -> source join ->
    # (hash, source, n) rollup checkpoint (2 exchanges)
    "mm_audio_fingerprint_dedup": (1, 2),
    # same shape, video: stream-walk+frame-hash pass -> source join ->
    # (sequence, source, n) rollup checkpoint (2 exchanges)
    "mm_video_shingle_dedup": (1, 2),
    "stream_lm_gate": (1, 1),
    "pipe_perplexity_buckets": (1, 1),
    "text_bm25_topk": (1, 1),
    "text_bigram_interp_logprob": (2, 1),  # occ (narrow) + vocab checkpoints
    "text_trigram_backoff_logprob": (1, 0),  # one narrow occ checkpoint feeds 5 count tables + scoring
    "text_hybrid_rrf_topk": (1, 1),  # shared BM25 doc-length checkpoint
    # (5,5)/(6,5) -> (5,8)/(6,8) in round 10: the per-round argmax
    # moved from a global-order window (ONE single-partition exchange
    # funneling the ENTIRE pair vocab through one reducer's sort) to a
    # struct-min aggregate — one more exchange NODE per round, but the
    # map-side combine collapses each to 1-row partials; identical
    # winner, oracle hash unchanged.
    "text_bpe_merges": (5, 8),
    "text_bpe_vocab": (6, 8),
    "text_tfidf_topk": (1, 1),
    "text_unigram_logprob": (1, 1),
    # dedup_semantic_clusters dropped from this table in round 12: the
    # centroid model is no longer a checkpointed struct-array segment —
    # assign_to_centroids collects the label-sorted centroid table
    # driver-side (model-sized by contract) and scores in Arrow, so
    # the query has NO checkpointed segment; rep selection stays the
    # max_by agg (not a Window full-member sort-shuffle)
    # (5, 10) -> (4, 8) in round 12: the ivfpq and pq_adc arms share
    # ONE sub=4 codebook checkpoint fitted by the report (identical
    # deterministic build), so a segment and its 2 codebook-fit
    # exchanges drop out. Remaining segments: brute-force truth table,
    # ivfpq centroids, shared sub=4 codebook, rerank sub=2 codebook.
    # (Sharing the sub=4 corpus ENCODE too was tried in r12 and
    # REJECTED by measurement: the eager checkpoint barrier cost more
    # than the saved encode — sf10 19.3s -> 23.4s, sf0.1 flat.)
    "vec_pq_recall_report": (4, 8),
    # one checkpointed segment: the frozen-corpus label centroids (2
    # exchanges), the day-2 model both assignment folds broadcast
    "vec_ivf_delta_assign": (1, 2),
    "vec_ann_recall_report": (1, 2),  # shared centroid checkpoint (ivf arm)
    "vec_ivf_topk": (1, 2),
    "vec_ivfpq_topk": (2, 4),
    # one checkpointed segment: the 1-row SQ8 bounds model (posexplode
    # scan -> groupBy(pos) min/max -> 1-row collapse), broadcast to the
    # encode pass and to the query-side bake-in (round 8b)
    "vec_sq8_topk": (1, 2),
    "vec_kmeans_lloyd": (2, 4),  # (2,6)->(2,4) r10: Arrow assigner
    "vec_pq_adc_topk": (1, 2),
    "vec_pq_rerank_topk": (1, 2),
    "x3_logistic_irls": (3, 3),
    # one checkpointed segment: the 256-row hashed-bigram log-ratio
    # model. (1,3) -> (1,5) in r12: the bucket rows now come from the
    # Arrow producer whose sized_for_compute repartition (single-split
    # bench input; a no-op at scale) sits inside the segment, adding
    # its exchanges to the count — the data-sized agg shape is
    # unchanged (two map-combinable aggs + 1-row totals broadcast)
    "pipe_dsir_importance": (1, 5),
    # identical pipeline with xxhash64 in place of the portable md5
    # hash (the production/scale path; rows-only, no oracle) — same
    # single checkpointed segment: the 256-row log-ratio model
    "pipe_dsir_importance_prod": (1, 3),
    # (8, 12) -> (1, 3) in r12: below MARKOV_LOCAL_MAX_EDGES the six
    # power-iteration rounds run driver-side in exact decimal, so only
    # the |alphabet|²-row transition-matrix segment (window pass +
    # count agg) remains at the fixture; the per-round checkpointed
    # loop (the scale arm) is frozen separately by driving
    # _markov_rounds_distributed in the equality golden test
    "x4_markov_stationary": (1, 3),
    # six checkpointed segments (round 9): the pool pass (brute-force
    # top-10 + vector fetch), the |Q|·90 pairwise-sim frame, and the
    # four greedy MMR picks (window argmax + anti-join each) — all
    # pool-sized after the first segment
    "vec_mmr_diversified_topk": (6, 22),
    # r12: chunking is one Arrow mapInPandas pass (cdc_chunk_stream),
    # so the old cdc_chunks base checkpoint is gone — text_cdc_chunks
    # has NO checkpointed segment anymore (dropped from this table);
    # the cross-source query keeps only its distinct-(source, hash)
    # presence checkpoint, whose segment holds the one distinct
    # exchange (was (2, 2): base checkpoint + cut-collection exchange)
    "text_cdc_cross_source": (1, 1),
}


def test_iterative_hidden_exchanges_frozen(all_plans):
    actual = {
        n: (len(s), sum(_ex(p) for p in s)) for n, s in SEGMENTS.items() if s
    }
    assert actual == ITERATIVE_SEGMENTS, {
        n: (actual.get(n), ITERATIVE_SEGMENTS.get(n))
        for n in set(actual) | set(ITERATIVE_SEGMENTS)
        if actual.get(n) != ITERATIVE_SEGMENTS.get(n)
    }


def test_pagerank_per_round_exchanges_frozen(spark):
    # The honest scale statement for the flagship iterative. Round 10:
    # the loop checkpoints under a scoped AQE-off, so the recorded
    # LogicalRDD partitioning/ordering lets every round's edge⋈rank
    # sort-merge join stream the pre-placed edge side with NO exchange
    # and NO re-sort — 2 exchanges per round (the contribution agg on
    # dst and the 1-row dangling-mass agg), down from 5. Build cost is
    # 6 one-off segments: the caller's edge derivation (2 exchanges:
    # the window + distinct), the node set (1), the 1-row N agg (1),
    # the out-degree agg (1), the sorted src re-layout of the edge
    # frame (1), and the rank init (0 — co-partitioned with nodes).
    # Round 12: the registered query size-dispatches to the one-pass
    # Arrow form at test SFs, so this gate drives the DISTRIBUTED loop
    # directly (pagerank_distributed) — the path every large graph
    # takes. The loop also sizes its shuffle count from the edge count
    # now (scoped_shuffle_partitions): at the sf0.01 fixture that is
    # ONE partition — the per-round contrib/dangling exchanges remain
    # as plan NODES (HashPartitioning(k, 1) is not SinglePartition, so
    # EnsureRequirements still inserts them) but each moves one
    # partition, so the loop schedules 1-task stages instead of
    # conf-many.
    from appeals_data_spark.operators.graph import pagerank_distributed
    from appeals_data_spark.queries.survival_q import _handoff_edges
    from pyspark.sql import functions as F

    def builder(spark, sf_dir):
        e = (
            _handoff_edges(spark, sf_dir)
            .select(F.col("src"), F.col("dst"))
            .localCheckpoint()
        )
        return pagerank_distributed(e, e.count(), 0.85, 6)

    plan, segs = build_with_segments(spark, builder, SF_CORRECT)
    assert len(segs) == 12, len(segs)
    # Build-segment exchanges on the single-partition fixture: the
    # node-set segment shows distinct + the explicit repartition (2 —
    # they no longer collapse once the repartition pins its own
    # count), the 1-row N agg plans exchange-free over the single
    # partition (0), deg/edeg keep their one placement exchange each.
    assert [_ex(p) for p in segs[:6]] == [2, 2, 0, 1, 1, 0]
    assert [_ex(p) for p in segs[6:]] == [2] * 6


def test_persisted_shuffle_coalesces_under_aqe(spark):
    """Round-13 regression gate for the initialPartitionNum=1024 conf
    (session.py RUNTIME_CONFS): shuffles START at 1024 partitions so
    the 1000x-probe hash builds stay memory-safe, and AQE coalesces
    them back down — INCLUDING inside persisted plans. Without
    spark.sql.optimizer.canChangeCachedPlanOutputPartitioning=true an
    InMemoryRelation materializes at the full initial count (measured
    r13: dedup_minhash_lsh's cached candidate frame at 1024 partitions
    doubled-plus the query, 1.7 -> 4.4 s interleaved at sf0.1; with
    the conf the cache coalesces to ~1 and minhash returned to the
    static-32 baseline). Pins the whole mechanism: a persisted
    aggregate over the fixture must hold far fewer partitions than the
    1024 initial count after AQE coalescing."""
    assert (
        spark.conf.get(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
        )
        == "1024"
    )
    assert (
        spark.conf.get(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"
        )
        == "true"
    )
    from appeals_data_spark.catalog import load_table
    from pyspark.sql import functions as F

    d = load_table(spark, SF_CORRECT, "documents")
    agg = d.groupBy("source").agg(F.count("*").alias("n")).persist()
    try:
        agg.count()
        nparts = agg.rdd.getNumPartitions()
    finally:
        agg.unpersist()
    assert nparts <= spark.sparkContext.defaultParallelism, nparts
