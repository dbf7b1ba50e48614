"""Vector math over ArrayType(Float) embedding columns.

Two implementations of the same IEEE-754 arithmetic:

* Column helpers (``dot``/``cosine``/``l2sq``) built on higher-order
  functions (``zip_with`` + ``aggregate``) — JVM-side, no Python
  boundary, the right default for cheap/occasional use. Spark does
  NOT whole-stage-codegen higher-order lambdas, so each element step
  is interpreted — fine off the hot path, 2x+ too slow on it.
* ``pair_scores_arrow`` — the hot-path twin over ``mapInPandas``:
  Arrow-batched, NumPy-vectorized ACROSS rows while accumulating
  dimension-by-dimension in float64, i.e. the EXACT left-fold order of
  the HOF helpers (acc = acc + x_k*y_k, k ascending). Multiplication,
  addition, sqrt and division are all correctly-rounded IEEE-754 ops
  in both runtimes, so the scores are bit-identical to the Column
  path (gated in tests/test_ann_recall.py) and every DuckDB oracle
  hash is unchanged. Measured on 8M 64-dim pairs (sf10, local[32]):
  28.6s HOF -> 12.9s Arrow for the same plan shape.

The never-acceptable third option is a row-at-a-time Python UDF.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2sq(a: Column, b: Column) -> Column:
    """Squared Euclidean distance — a sequential left fold, so the
    summation order matches DuckDB's list_sum for the oracle twins."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pair_scores_arrow(
    pairs: DataFrame,
    a_col: str,
    b_col: str,
    keep: list[str],
    out: str,
    metric: str = "cosine",
) -> DataFrame:
    """Score (a, b) vector pairs with the hot-path Arrow twin of the
    Column helpers above — bit-identical values, ~2x+ faster (module
    docstring). ``keep`` columns pass through; the two vector columns
    are dropped (no Arrow back-transfer of payload arrays).

    Null semantics match the HOF fold: a NULL on either side yields a
    NULL score. Degenerate zero-norm cosine (0/0): the HOF fold's
    double division follows IEEE and yields NaN (ANSI divide-by-zero
    errors apply to integral/decimal operands only), while this path
    yields NULL (the computed NaN crosses the Arrow boundary as null,
    Spark's pandas-NaN-is-missing convention) — NaN-vs-NULL differ in
    desc-sort position, but no corpus here carries zero embeddings.
    Gated in tests/test_ann_recall.py.

    Metrics: ``cosine`` and ``dot`` (double, the original pair);
    ``l2sq`` — the squared-L2 left fold's Arrow twin, double, same
    dimension-major accumulation; ``sq_l2_9dp`` — sq_adc_topk's exact
    scaled-long distance: per dimension ``round((x-y)*(x-y)*1e9, 0)``
    with Spark's ROUND semantics (BigDecimal.valueOf(d) = shortest
    round-trip decimal, HALF_UP — matched here by floor(t+0.5) with a
    decimal re-judge of every term within 1e-3 of a .5 boundary, the
    pq_encode exact-tie discipline; Python ``repr(float)`` is the same
    shortest-round-trip decimal as Java ``Double.toString``), summed
    as int64 (exact, order-free), emitted as bigint.
    """
    import numpy as np
    import pandas as pd

    if metric not in ("cosine", "dot", "l2sq", "sq_l2_9dp"):
        raise ValueError(f"pair_scores_arrow: unknown metric {metric!r}")
    schema_fields = pairs.select(*keep).schema.fields
    out_type = "bigint" if metric == "sq_l2_9dp" else "double"
    out_schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema_fields)
        + f", {out} {out_type}"
    )
    want_cos = metric == "cosine"

    def _round_half_up_9dp(t: "np.ndarray") -> "np.ndarray":
        # t >= 0 (squares). Fast path floor(t+0.5); any term whose
        # fractional part sits within 1e-3 of .5 (covers float error of
        # the +0.5 at the ~1e12 magnitudes this metric produces, ulp
        # ~1.2e-4) is re-judged exactly via shortest-round-trip decimal
        # — bit-for-bit Spark ROUND(d, 0).
        from decimal import ROUND_HALF_UP, Decimal

        r = np.floor(t + 0.5)
        frac = t - np.floor(t)
        suspect = np.abs(frac - 0.5) < 1e-3
        if suspect.any():
            for i in np.nonzero(suspect)[0]:
                r[i] = float(
                    Decimal(repr(float(t[i]))).quantize(
                        Decimal("1"), rounding=ROUND_HALF_UP
                    )
                )
        return r.astype(np.int64)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                res = pd.DataFrame({c: [] for c in keep})
                res[out] = np.array(
                    [], dtype=np.int64 if metric == "sq_l2_9dp" else np.float64
                )
                yield res
                continue
            av, bv = pdf[a_col].values, pdf[b_col].values
            mask = np.array(
                [x is not None and y is not None for x, y in zip(av, bv)]
            )
            if mask.any():
                A = np.stack(av[mask]).astype(np.float64)
                B = np.stack(bv[mask]).astype(np.float64)
                n = A.shape[0]
                res = pdf.loc[mask, keep].copy()
                if metric == "sq_l2_9dp":
                    acc = np.zeros(n, dtype=np.int64)
                    for k in range(A.shape[1]):
                        d = A[:, k] - B[:, k]
                        acc += _round_half_up_9dp((d * d) * 1.0e9)
                    res[out] = acc
                else:
                    dt = np.zeros(n)
                    na = np.zeros(n)
                    nb = np.zeros(n)
                    # dimension-major accumulation = the HOF left
                    # fold's order, vectorized across rows —
                    # bit-identical scores
                    for k in range(A.shape[1]):
                        x = A[:, k]
                        y = B[:, k]
                        if metric == "l2sq":
                            d = x - y
                            dt += d * d
                            continue
                        dt += x * y
                        if want_cos:
                            na += x * x
                            nb += y * y
                    res[out] = (
                        dt / (np.sqrt(na) * np.sqrt(nb)) if want_cos else dt
                    )
                yield res
            if not mask.all():
                # genuine nulls (missing vector) — emitted as a
                # separate all-null frame so NaN above stays NaN
                res_null = pdf.loc[~mask, keep].copy()
                res_null[out] = pd.array(
                    [pd.NA] * int((~mask).sum()),
                    dtype="Int64" if metric == "sq_l2_9dp" else "Float64",
                )
                yield res_null

    return pairs.mapInPandas(gen, schema=out_schema)
