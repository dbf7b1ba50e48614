"""Driver-contract tests for __spark_entry__."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entry_mod  # noqa: E402


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "l_returnflag"


def test_queries_and_oracles_aligned(spark):
    qs = entry_mod.queries()
    osql = entry_mod.oracle_sql()
    assert len(qs) >= 50
    assert set(osql) <= set(qs)
    # all result columns lowercase (case-normalization policy)
    for name, fn in qs.items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert all(c == c.lower() for c in df.columns), (name, df.columns)


def test_sweep_window_invariants():
    """The driver sweeps the first ~50 registry entries; those rows are
    the round's correctness evidence. Keep the window exactly 50 and
    oracle-backed except for EXPLICIT exceptions (a rows-only member
    spends a driver slot on a weaker rows+schema check, so each one
    must be a deliberate decision, not rotation drift) — rotation
    edits that break these should fail here, not in the round
    verdict."""
    from appeals_data_spark.registry import _SWEEP_FIRST, all_queries

    # Round-11 verdict item #1: pipe_dsir_importance_prod is the only
    # never-swept registry entry; rows-only by design (xxhash64 scale
    # twin), its rows+schema verdict is the strongest check a driver
    # slot can buy for it. Drop from this list once it holds a row.
    ROWS_ONLY_ALLOWED = {"pipe_dsir_importance_prod"}

    qs = all_queries()
    assert len(_SWEEP_FIRST) == 50, len(_SWEEP_FIRST)
    assert list(qs)[:50] == _SWEEP_FIRST
    rows_only = {n for n in _SWEEP_FIRST if qs[n].oracle is None}
    assert rows_only <= ROWS_ONLY_ALLOWED, (
        f"undeclared rows-only queries in the driver window: "
        f"{rows_only - ROWS_ONLY_ALLOWED}"
    )
