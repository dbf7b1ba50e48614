"""Partitioning-independence gate.

The engine's central determinism claim: registered results are
BIT-IDENTICAL under any partitioning, because float-sensitive
aggregations run in exact decimal, transcendentals are evaluated
pre-aggregation and rounded, folds are sequential per row, and
boundary comparisons use constants spliced identically into both
engines. This test re-runs representative float-sensitive queries
under deliberately different shuffle fan-outs AND scan split sizes and
asserts exact equality — the property that makes the DuckDB hash
comparison (and AQE re-planning at 100 TB) safe.
"""

from __future__ import annotations

import pytest

from appeals_data_spark.registry import all_queries

from conftest import SF_SMOKE

# Each exercises a different exactness contract: decimal money sums,
# IRLS/pegasos float folds behind rounded outputs, the decimal LM fold,
# EM window chains, PQ ADC decimal scoring, sketch certificates.
QUERIES = [
    "a1_pricing_summary",
    "stream_lm_gate",
    "x3_linear_svm_eval",
    "x6_logistic_glmm",
    "text_unigram_logprob",
    "vec_pq_adc_topk",
    "a22_approx_quantile_bound",
    # rank fusion: per-row cosine folds + decimal RRF sum — only ranks
    # cross the float boundary, so fused order is partition-independent
    "text_hybrid_rrf_topk",
    # MM iteration: both fold sites are 1e6-scaled int64 scatter-adds
    # inside the single-group applyInPandas fit — exact under any row
    # arrival order
    "pref_bradley_terry",
    # 20-round pegasos on non-grid features: violator folds are
    # 1e6-scaled-long sums (exact_sum_decimals=6), so merge order
    # can't flip the integer n_keep/n_agree outputs
    "pipe_classifier_filter",
    # grouped sequential fold: whole groups cross the Arrow boundary,
    # sorted in-pandas, so partitioning can't reorder the recursion
    "x6_holt_linear",
]


def _run(spark, name, shuffle_parts, max_split):
    spark.catalog.clearCache()
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    old_split = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_parts))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(max_split))
    try:
        df = all_queries()[name].builder(spark, SF_SMOKE)
        return sorted((tuple(r) for r in df.collect()), key=repr)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        spark.conf.set("spark.sql.files.maxPartitionBytes", old_split)
        spark.catalog.clearCache()


@pytest.mark.parametrize("name", QUERIES)
def test_partitioning_independence(spark, name):
    wide = _run(spark, name, 32, 128 * 1024 * 1024)
    narrow = _run(spark, name, 5, 64 * 1024)  # tiny splits: many scan tasks
    assert wide == narrow
