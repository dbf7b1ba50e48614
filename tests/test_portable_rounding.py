"""Cross-engine rounding-pin gates (functions/scalars.py).

The round-8 driver flipped two hash rows (CORRECTNESS_r08:
pipe_dsir_importance, x4_markov_stationary) with rows+schema green —
the classic signature of a single rounded value landing on a boundary
where Spark's exact-binary-expansion HALF_UP and DuckDB's
scaled-double std::round disagree.  These tests hammer the two
portable replacements with the adversarial inputs that break
ROUND(double, s):

* ``ratio_dec``  — integer count ratios, including EXACT 12-dp ties
  (denominators 2^a·5^b where half the numerators land on .5 exactly).
* ``pin_dec``    — transcendental doubles pinned by floor(x·10^s+0.5),
  the same IEEE ops on both engines.
"""

from __future__ import annotations

import math
import random
from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pytest
from pyspark.sql import functions as F

from appeals_data_spark.functions.scalars import (
    pin_dec,
    ratio_dec,
    sql_pin_dec,
    sql_ratio_dec,
)


def _tie_cases():
    """(n, d) pairs whose n·10^12/d is an exact half-integer — the
    inputs where ROUND(CAST(n AS DOUBLE)/d, 12) is engine-dependent."""
    cases = []
    for d in (8192, 2**14, 2**13 * 5, 2**20, 3 * 2**13):
        for n in (1, 3, 5, d // 2 - 1, d - 1):
            if (2 * n * 10**12) % d == 0 and (n * 10**12) % d != 0:
                cases.append((n, d))
    assert len(cases) >= 8, "tie-case generator lost its teeth"
    return cases


def _random_cases(k=300):
    rng = random.Random(1729)
    out = []
    for _ in range(k):
        d = rng.randint(2, 5_000_000)
        out.append((rng.randint(1, d), d))
    return out


def test_ratio_dec_matches_duckdb_and_exact_halfup(spark):
    rows = _tie_cases() + _random_cases()
    df = spark.createDataFrame(rows, "n long, d long")
    got = {
        (r["n"], r["d"]): r["p"]
        for r in df.select(
            "n", "d", ratio_dec(F.col("n"), F.col("d")).alias("p")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(n BIGINT, d BIGINT)")
    con.executemany("INSERT INTO t VALUES (?,?)", rows)
    duck = {
        (n, d): p
        for n, d, p in con.execute(
            f"SELECT n, d, {sql_ratio_dec('n', 'd')} FROM t"
        ).fetchall()
    }
    for n, d in rows:
        truth = (Decimal(n) / Decimal(d)).quantize(
            Decimal("1e-12"), rounding=ROUND_HALF_UP
        )
        assert got[(n, d)] == truth, f"spark ratio_dec {n}/{d}"
        assert duck[(n, d)] == truth, f"duckdb sql_ratio_dec {n}/{d}"


def test_ratio_dec_catches_what_round_double_misses():
    """Sanity: at least one tie case WOULD diverge under the old
    ROUND(double, 12) oracle — i.e. this gate is not vacuous."""
    con = duckdb.connect()
    diverged = 0
    for n, d in _tie_cases():
        (duck_round,) = con.execute(
            f"SELECT CAST(ROUND(CAST({n} AS DOUBLE)/{d}, 12)"
            " AS DECIMAL(14,12))"
        ).fetchone()
        spark_style = Decimal(n / d).quantize(
            Decimal("1e-12"), rounding=ROUND_HALF_UP
        )
        if duck_round != spark_style:
            diverged += 1
    assert diverged >= 1, (
        "no tie case diverges under ROUND(double,12) on this platform; "
        "re-derive the adversarial set"
    )


@pytest.mark.parametrize("scale", [6, 9])
def test_pin_dec_matches_duckdb(spark, scale):
    rng = random.Random(42)
    xs = [
        math.log((rng.randint(0, 5000) + 1.0) / (rng.uniform(1e4, 2e5)))
        - math.log((rng.randint(1, 20000) + 1.0) / (rng.uniform(1e5, 1e6)))
        for _ in range(400)
    ]
    # exact .5-at-scale boundaries — floor(x*10^s + 0.5) must agree
    xs += [0.0000005, -0.0000005, 1.9999995, -1.9999995, 0.1234565]
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    got = [
        r["p"]
        for r in df.select(pin_dec(F.col("x"), scale).alias("p")).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(x,) for x in xs])
    duck = [
        p for (p,) in con.execute(
            f"SELECT {sql_pin_dec('x', scale)} FROM t"
        ).fetchall()
    ]
    assert got == duck
    # and the pin really is floor(x·10^s + 0.5) of the IEEE double
    for x, p in zip(xs, got):
        expect = Decimal(math.floor(x * 10**scale + 0.5)).scaleb(-scale)
        assert p == expect, f"pin_dec({x!r}, {scale})"


# -- hypothesis fuzz: ratio_dec's closed form vs Python Decimal ---------------
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        n=st.integers(min_value=0, max_value=10**15),
        d=st.integers(min_value=1, max_value=10**15),
        scale=st.sampled_from([6, 9, 12]),
    )
    def test_ratio_formula_matches_decimal_halfup(n, d, scale):
        """The integer formula floor((2n·10^s + d)/(2d)) IS half-up —
        fuzzed against Python's exact Decimal quantize over the full
        BIGINT-ish range (no Spark in the loop: the formula is what
        both engines execute; the engine gates above pin the
        execution)."""
        n = n % (d * 100)  # keep |n/d| inside the declared domain
        s_pow = 10**scale
        q = (2 * n * s_pow + d) // (2 * d)
        want = (Decimal(n) / Decimal(d)).quantize(
            Decimal(1).scaleb(-scale), rounding=ROUND_HALF_UP
        )
        assert Decimal(q).scaleb(-scale) == want
except ImportError:  # pragma: no cover - hypothesis is baked in
    pass


def test_markov_stationary_end_to_end_on_exact_tie_data(spark, tmp_path):
    """Round-8 regression, reconstructed end to end: an events table
    whose transition ratio out of state 'a' is an EXACT 12-dp tie with
    a NON-dyadic denominator (12291/24576 = 0.5001220703125, d =
    3·2^13 — the class where the double is inexact and the two
    engines' ROUND strategies can land on opposite sides). Each user
    loops a->b->a or a->c->a so the chain is irreducible and the
    tie-rounded digit propagates through all six power-iteration
    rounds. The re-pinned query must match DuckDB digit for digit."""
    import datetime as dt

    import duckdb

    n_b, total = 12291, 24576  # n_b ≡ 3 (mod 6) -> exact half at 12 dp
    assert (2 * n_b * 10**12) % total == 0
    assert (n_b * 10**12) % total != 0
    rows = []
    eid = 0
    t0 = dt.datetime(2000, 1, 1)
    for u in range(total):
        nxt = "b" if u < n_b else "c"
        for k, et in enumerate(("a", nxt, "a")):
            rows.append((eid, t0 + dt.timedelta(minutes=k), u, et, 0.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )

    from appeals_data_spark.registry import all_queries

    q = all_queries()["x4_markov_stationary"]
    got = sorted(tuple(r) for r in q.builder(spark, str(tmp_path)).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(q.oracle).fetchall())
    assert got == want
    states = {s for s, _ in got}
    assert states == {"a", "b", "c"}
    assert all(v is not None and v > 0 for _, v in got)
    # the tie really is in the chain: p(a->b) is the exact half-up of
    # 12291/24576 in both engines (the formula gates pin the recipe;
    # this pins the deployed query end to end)
    p_ab = con.execute(
        f"SELECT {sql_ratio_dec('12291', '24576')}"
    ).fetchone()[0]
    assert p_ab == Decimal("0.500122070313")


def test_mann_whitney_degenerate_all_tied_is_null_both_engines(spark):
    """All-tied group: the tie correction zeroes the variance, so
    z = 0/0 — Spark says NaN (IEEE), DuckDB says NULL. The registered
    query guards BOTH engines with the identical var > 0 predicate, so
    the degenerate group yields NULL z_approx on both sides."""
    import duckdb
    import os
    import tempfile

    from appeals_data_spark.registry import all_queries

    with tempfile.TemporaryDirectory() as tmp:
        # one status where every price is identical (urgent + low both
        # present so the HAVING keeps the group), one healthy status
        rows = []
        for i in range(6):
            rows.append((i, "T", "1-URGENT" if i % 2 else "5-LOW", 100.0))
        for i in range(6, 14):
            rows.append(
                (i, "H", "1-URGENT" if i % 2 else "5-LOW", 50.0 + i)
            )
        df = spark.createDataFrame(
            rows,
            "o_orderkey long, o_orderstatus string, "
            "o_orderpriority string, o_totalprice double",
        )
        df.coalesce(1).write.parquet(os.path.join(tmp, "orders.parquet"))
        q = all_queries()["x3_mann_whitney"]
        got = {
            r["status"]: r["z_approx"]
            for r in q.builder(spark, tmp).collect()
        }
        assert got["T"] is None  # guarded, not NaN
        assert got["H"] is not None and got["H"] == got["H"]  # real z
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW orders AS SELECT * FROM "
            f"read_parquet('{tmp}/orders.parquet/*.parquet')"
        )
        want = {s: z for s, _, _, _, z in con.sql(q.oracle).fetchall()}
        assert want["T"] is None
        assert got["H"] == want["H"]


def test_a24_share_end_to_end_on_exact_tie_data(spark, tmp_path):
    """Round-11 migration gate: a24_freq_items_bound's share moved
    from ROUND(n*1.0/t, 6) — the measured engine-dependent tie class —
    to ratio_dbl/sql_ratio_dbl. Crafted corpus: t = 8192 = 2^13 rows,
    so any ODD heavy-hitter count n puts n·10^12/t on an EXACT
    half-integer (10^12 carries exactly 2^12): the input where the
    old formulation is engine-dependent and the pin must agree with
    decimal half-up."""
    import os

    from appeals_data_spark.registry import all_queries

    tmp = str(tmp_path)
    t = 8192
    n_heavy = 2457  # odd, share ~0.2999; 2·n·10^12 % t == 0, n·10^12 % t != 0
    assert (2 * n_heavy * 10**12) % t == 0 and (n_heavy * 10**12) % t != 0
    rows = [(i, "1-URGENT") for i in range(n_heavy)]
    rows += [(n_heavy + i, "5-LOW") for i in range(t - n_heavy)]
    spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string"
    ).coalesce(1).write.parquet(os.path.join(tmp, "orders.parquet"))

    q = all_queries()["a24_freq_items_bound"]
    got = {r["priority"]: r["share"] for r in q.builder(spark, tmp).collect()}
    exp_heavy = float(
        (Decimal(n_heavy) * Decimal(10) ** 12 / Decimal(t)).quantize(
            Decimal(1), rounding=ROUND_HALF_UP
        )
        / Decimal(10) ** 12
    )
    assert got["1-URGENT"] == exp_heavy

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{tmp}/orders.parquet/*.parquet')"
    )
    want = {p: s for p, _, s, _ in con.sql(q.oracle).fetchall()}
    assert got == want
