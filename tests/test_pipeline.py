"""Invariant tests for the corpus-curation pipeline queries.

The DuckDB differential check pins exact values; these pin the
*semantic contracts* that must hold at any scale and would survive a
change of fixture data: funnel monotonicity, packing conservation,
sampling determinism.
"""

from __future__ import annotations

import pytest

from appeals_data_spark.registry import all_queries

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def funnel(spark):
    return {
        r["source"]: r
        for r in all_queries()["pipe_curation_funnel"]
        .builder(spark, SF)
        .collect()
    }


def test_funnel_stages_monotonic(funnel):
    assert funnel
    for src, r in funnel.items():
        assert (
            r["n_raw"]
            >= r["n_quality"]
            >= r["n_canonical"]
            >= r["n_clean"]
            >= r["n_sampled"]
            >= 0
        ), src
        assert r["tok_sampled"] <= r["tok_raw"]


def test_funnel_mixture_binds_one_source(funnel):
    """The mixture budget is the largest achievable: some source keeps
    everything (prob 1.0) and no keep-probability exceeds 1."""
    probs = [r["keep_prob"] for r in funnel.values() if r["keep_prob"] is not None]
    assert probs and max(probs) == pytest.approx(1.0)
    assert all(0.0 < p <= 1.0 for p in probs)


def test_packing_conserves_tokens(spark):
    packs = all_queries()["pipe_pack_sequences"].builder(spark, SF).collect()
    by_src: dict[str, list] = {}
    for r in packs:
        by_src.setdefault(r["source"], []).append(r)
    assert by_src
    for src, rows in by_src.items():
        ids = sorted(r["pack_id"] for r in rows)
        assert ids == list(range(len(ids))), f"{src}: pack ids not contiguous"
        assert all(r["n_docs"] >= 1 for r in rows)
    # conservation: packs partition the docs, so token totals match the raw sum
    import duckdb

    raw = {
        s: t
        for s, t in duckdb.sql(
            "SELECT source, SUM(len(list_filter(regexp_split_to_array(trim(text),"
            " '\\s+'), x -> x <> ''))) FROM"
            f" '{SF}/documents.parquet' GROUP BY 1"
        ).fetchall()
    }
    for src, rows in by_src.items():
        assert sum(r["pack_tokens"] for r in rows) == raw[src], src


def test_stratified_sample_deterministic(spark):
    q = all_queries()["pipe_stratified_sample"].builder
    a = sorted(map(tuple, q(spark, SF).collect()))
    b = sorted(map(tuple, q(spark, SF).collect()))
    assert a == b
    for row in a:
        _, _, n_total, n_sampled, _ = row
        assert 0 <= n_sampled <= n_total
