"""Distributed linear SVM by full-batch pegasos subgradient descent.

Reference analog: the docket-order classifiers
(scratch/decisions/docket-order.R:329-348), which train e1071 ``svm`` /
kernlab ``ksvm`` models on two numeric features with 4:1 class weights.
The Spark-first re-expression is a deterministic class-weighted LINEAR
SVM: the reference's plots show the learned boundary is used as a
near-linear separator over the two date axes, and a linear model is the
form whose training loop is exactly oracle-checkable (each round is one
aggregation; an RBF kernel would need the kernel matrix). MLlib's
LinearSVC fits the same model but with a non-reproducible optimizer —
this loop is the differential-testable twin.

Pegasos (Shalev-Shwartz et al. 2011), full-batch variant so every
round is deterministic:

    w_{i} = (1 - 1/i) * w_{i-1}
            + (1 / (lambda * i * n)) * sum_{violators} c_y * y * x

where violators are rows with margin y * (w . x) < 1 and c_y is the
per-class cost weight (the reference's ``class.weights``). The bias
rides as a constant feature and is regularized with the rest (pure
pegasos). The loop is MLlib-style driver iteration: each round runs
ONE map-side-combinable aggregation over the cached feature frame and
collects k+1 doubles (the weighted violator sums + count); the updated
coefficients are spliced into the next round's plan as literals. No
per-round ``localCheckpoint`` and no growing lineage — the plan depth
is constant because each round's inputs are constants, and the result
is bit-identical to the broadcast-column formulation (both fold the
same IEEE doubles in the same order).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# At or below this many scan bytes (and only with the exact scaled-
# long fold on), all pegasos rounds run in ONE Arrow pass over the
# coalesced feature partition instead of one aggregation job per
# round: iters scheduler round-trips collapse to one (measured
# pipe_classifier_filter 20 rounds 3.8s -> see OPTIMIZATION_r12.md).
# The exact int64 violator sums make the fold order-independent, so
# the single-task fit is BIT-IDENTICAL to the distributed per-round
# aggregation — pinned by tests/test_ml.py::
# test_pegasos_local_matches_distributed. Unknown size or a
# non-exact (plain double) fold always takes the distributed loop:
# double sums are merge-order-sensitive, so only the exact fold may
# change execution shape without changing a bit. 256 MB of parquet is
# ~15M projected rows — comfortably one task's memory.
SVM_LOCAL_MAX_BYTES = 256 * 1024 * 1024
# Row-count form of the same bound (for persisted inputs whose file
# index is hidden): ~16M projected rows x (k+1) float64 columns is a
# few hundred MB in the single fit task.
SVM_LOCAL_MAX_ROWS = 16_000_000


def pegasos_linear_svm(
    df: DataFrame,
    y: Column,
    xs: list[Column],
    lam: float = 0.1,
    iters: int = 5,
    pos_weight: float = 1.0,
    neg_weight: float = 1.0,
    exact_sum_decimals: int | None = None,
    n_rows: int | None = None,
) -> DataFrame:
    """Fit y in {+1,-1} ~ sign(w0 + w1*x1 + ... + wk*xk); returns the
    1-row coefficient frame (w0..wk). ``y`` must evaluate to +-1.0.

    ``exact_sum_decimals``: when the caller's features (and class
    weights) are exactly representable at <= that many decimal places,
    pass it to accumulate the violator sums as SCALED LONGS: each
    per-row contribution cw*y*x_j is rounded at d decimal places and
    scaled to the integer it denotes (the double's ~1e-16
    representation error is far from any rounding boundary), summed in
    int64, and unscaled once. The fold is EXACT and therefore
    independent of partial-aggregation merge order — the engine's
    partitioning-independence contract (tests/test_determinism.py) —
    while staying inside whole-stage codegen's hardware integer adds
    (a DECIMAL(38,d) fold has the same exactness but leaves Spark's
    compact-decimal path: measured 7.2s vs 2.6s for this 10-round fit
    at sf0.1). Overflow bound: |sum| < 9.2e18 / 10^d weighted violator
    mass per fold — ~2e12 rows at d=6 with |contrib|<=4; a 100 TB fit
    mini-batches long before that. Leave None for features that are
    not decimal-exact; the sums then carry last-ulp merge-order
    sensitivity behind the caller's output rounding.

    Deliberately re-scans the source per round instead of caching the
    training projection: the per-round read is a column-pruned parquet
    scan of just the k+1 feature columns, and a MEMORY_AND_DISK persist
    of the decompressed rows measured SLOWER at sf0.1 (2.8s -> 3.1-3.9s
    for 10 rounds) — columnar scan + OS page cache beats row-cache
    materialization for cheap projections. Add a ``.persist()`` on the
    caller's ``df`` only when the projection itself is expensive
    (joins/UDF features), not for raw-column fits."""
    k = len(xs)
    d = df.select(
        y.cast("double").alias("_y"),
        *[x.cast("double").alias(f"_x{j + 1}") for j, x in enumerate(xs)],
    )
    cw = F.when(F.col("_y") > 0, F.lit(pos_weight)).otherwise(F.lit(neg_weight))
    # MLlib-style driver iteration (round 7): each round is ONE
    # map-side-combinable aggregation job; the k+1 fitted doubles come
    # back to the driver and are spliced into the next round's plan as
    # literals. The r1-r6 shape kept the coefficients in a 1-row frame
    # (crossJoin(broadcast) + per-round localCheckpoint) to stay
    # collect-free, which cost THREE scheduler round-trips per round
    # (agg job, checkpoint job, broadcast) — measured 8.1s for the
    # 20-round sf0.1 fit vs 2.4s with literal splicing. The
    # data-parallel pass is unchanged (and is what scales to 100 TB);
    # only the k+1-value model hop moved off the DAG. Arithmetic is
    # bit-identical: Python float ops are the same IEEE doubles the
    # broadcast column ops computed, in the same association.
    if exact_sum_decimals is not None:
        from ..catalog import scan_input_bytes

        # Two size signals, either one routes small fits local: the
        # scan bytes under a plain file-backed frame, or the caller's
        # known row count (``n_rows``) for frames whose file index is
        # hidden — ``persist()`` swaps in InMemoryRelation and empties
        # ``inputFiles`` immediately, so a cached feature frame always
        # reads as unknown-size without the hint. Unknown on both
        # signals = LARGE, the scale-safe default.
        nbytes = scan_input_bytes(df)
        small = (nbytes is not None and nbytes <= SVM_LOCAL_MAX_BYTES) or (
            n_rows is not None and n_rows <= SVM_LOCAL_MAX_ROWS
        )
        if small:
            w = _fit_local(
                d, k, lam, iters, pos_weight, neg_weight, exact_sum_decimals
            )
            return df.sparkSession.range(1).select(
                *[F.lit(w[j]).alias(f"w{j}") for j in range(k + 1)]
            )

    w = [0.0] * (k + 1)
    for i in range(1, iters + 1):
        wx = F.lit(w[0]) + sum(
            (F.lit(w[j + 1]) * F.col(f"_x{j + 1}") for j in range(k)),
            F.lit(0.0),
        )
        viol = F.col("_y") * wx < 1
        feats = [F.lit(1.0)] + [F.col(f"_x{j + 1}") for j in range(k)]

        def _sv(j: int) -> Column:
            contrib = F.when(viol, cw * F.col("_y") * feats[j])
            if exact_sum_decimals is None:
                return F.coalesce(F.sum(contrib), F.lit(0.0)).alias(f"sv{j}")
            scale = 10 ** exact_sum_decimals
            # rint, not round: Spark's ROUND boxes every double through
            # BigDecimal (measured +50% on this fold); Math.rint is a
            # pure FP instruction. The HALF-TO-EVEN tie mode is
            # load-bearing: x3's grid-aligned features never hit .5,
            # but pipe_classifier_filter's swr-derived contributions
            # can — its oracle matches only because DuckDB round_even
            # is rint's exact twin. Never swap in a half-up ROUND.
            return (
                F.coalesce(
                    F.sum(F.rint(contrib * scale).cast("long")), F.lit(0)
                ).cast("double")
                / scale
            ).alias(f"sv{j}")

        row = d.agg(
            F.count(F.lit(1)).alias("n"),
            *[_sv(j) for j in range(k + 1)],
        ).collect()[0]
        keep = 1.0 - 1.0 / i
        # Same ops, same association as the r1-r6 column expression:
        # keep*w + sv / ((lam*i) * n). Python float division RAISES on
        # zero where IEEE (and the old JVM expression) yields NaN —
        # match the old empty-frame behavior (sv=0, n=0 -> 0/0 -> NaN
        # coefficients, not a crash).
        den = (lam * i) * row["n"]
        w = [
            keep * w[j]
            + (row[f"sv{j}"] / den if den else float("nan"))
            for j in range(k + 1)
        ]
    return df.sparkSession.range(1).select(
        *[F.lit(w[j]).alias(f"w{j}") for j in range(k + 1)]
    )


def _fit_local(
    d: DataFrame,
    k: int,
    lam: float,
    iters: int,
    pos_weight: float,
    neg_weight: float,
    dec: int,
) -> list[float]:
    """All pegasos rounds in one Arrow pass; returns the fitted w.

    Mirrors the distributed round's arithmetic OPERATION FOR OPERATION
    so the result is bit-identical: the margin accumulates left-to-
    right from 0.0 exactly as the Column ``sum`` generator does; each
    violator contribution is ``(cw * y) * feat_j`` then
    ``rint(contrib * scale)``; sums are masked int64 adds (exact,
    order-free — the same reason the distributed fold is partitioning-
    independent); NaN margins/contributions are excluded exactly where
    the JVM's NULL propagation excludes them; and the driver-side w
    update is the identical Python float expression. One job (the
    bounded k+1-double collect) replaces ``iters`` aggregation jobs.
    """
    scale = 10 ** dec

    def run(batches):
        import numpy as np
        import pandas as pd

        ys, xs_ = [], []
        for pdf in batches:
            ys.append(pdf["_y"].to_numpy(dtype="float64", na_value=np.nan))
            xs_.append(
                [
                    pdf[f"_x{j + 1}"].to_numpy(
                        dtype="float64", na_value=np.nan
                    )
                    for j in range(k)
                ]
            )
        if ys:
            y = np.concatenate(ys)
            X = [np.concatenate([b[j] for b in xs_]) for j in range(k)]
        else:
            y = np.zeros(0)
            X = [np.zeros(0) for _ in range(k)]
        n = len(y)
        cw = np.where(y > 0, float(pos_weight), float(neg_weight))
        cy = cw * y
        w = [0.0] * (k + 1)
        for i in range(1, iters + 1):
            acc = np.zeros(n)
            for j in range(k):
                acc = acc + w[j + 1] * X[j]
            wx = w[0] + acc
            viol = (y * wx) < 1  # NaN compares False == NULL-excluded
            svs = []
            for j in range(k + 1):
                contrib = cy if j == 0 else cy * X[j - 1]
                scaled = np.rint(contrib * scale)
                mask = viol & ~np.isnan(scaled)
                svs.append(
                    float(scaled[mask].astype("int64").sum()) / scale
                )
            keep = 1.0 - 1.0 / i
            den = (lam * i) * n
            w = [
                keep * w[j] + (svs[j] / den if den else float("nan"))
                for j in range(k + 1)
            ]
        yield pd.DataFrame({f"w{j}": [w[j]] for j in range(k + 1)})

    schema = ", ".join(f"w{j} double" for j in range(k + 1))
    # coalesce(1): the fit task reads every upstream partition itself
    # (no shuffle — repartition(1) was measured slower: the keyless
    # repartition's sort-before-repartition pass cost more than the
    # serial read saves). Callers whose feature PROJECTION is
    # expensive should persist AND materialize it first so the single
    # fit task deserializes cached rows instead of recomputing the
    # projection serially (pipe_classifier_filter does).
    row = d.coalesce(1).mapInPandas(run, schema=schema).collect()[0]
    return [row[f"w{j}"] for j in range(k + 1)]
