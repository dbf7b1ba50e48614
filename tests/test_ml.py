"""Model-layer tests: closed-form parity and MLlib GLM sanity."""

from __future__ import annotations

import numpy as np
import pytest

from appeals_data_spark.catalog import load_table
from appeals_data_spark.ml import fit_glm, linreg_stats

from conftest import SF_SMOKE


def test_linreg_matches_numpy(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    got = linreg_stats(li, y="l_extendedprice", x="l_quantity").first()
    pdf = li.select("l_quantity", "l_extendedprice").toPandas()
    slope, intercept = np.polyfit(pdf["l_quantity"], pdf["l_extendedprice"], 1)
    assert got["slope"] == pytest.approx(slope, rel=1e-9)
    assert got["intercept"] == pytest.approx(intercept, rel=1e-9)
    assert got["n"] == len(pdf)


def test_glm_gaussian_matches_ols(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").limit(2000)
    model = fit_glm(
        li, label_col="l_extendedprice", feature_cols=["l_quantity", "l_discount"]
    )
    pdf = li.select("l_quantity", "l_discount", "l_extendedprice").toPandas()
    X = np.column_stack([pdf["l_quantity"], pdf["l_discount"], np.ones(len(pdf))])
    beta, *_ = np.linalg.lstsq(X, pdf["l_extendedprice"], rcond=None)
    assert model.coefficients[0] == pytest.approx(beta[0], rel=1e-6)
    assert model.coefficients[1] == pytest.approx(beta[1], rel=1e-6)
    assert model.intercept == pytest.approx(beta[2], rel=1e-6)


def test_glm_binomial_recovers_signal(spark):
    # y ~ Bernoulli(sigmoid(2x - 1)) on a deterministic grid: the fitted
    # slope must be positive and near 2 (exact MLE on noiseless grid
    # probabilities is not expected — sampled labels via threshold).
    import pyspark.sql.functions as F

    df = (
        spark.range(4000)
        .withColumn("x", (F.col("id") % 100).cast("double") / 50.0)
        .withColumn(
            "label",
            (F.sin(F.col("id") * 12.9898) * 0.5 + 0.5  # deterministic pseudo-noise
             < 1 / (1 + F.exp(-(2 * F.col("x") - 1)))).cast("double"),
        )
    )
    model = fit_glm(df, label_col="label", feature_cols=["x"], family="binomial")
    assert model.coefficients[0] > 1.0
    assert abs(model.intercept + model.coefficients[0] * 0.5) < 1.0


def test_glm_group_onehot(spark):
    o = load_table(spark, SF_SMOKE, "orders")
    model = fit_glm(
        o.withColumn("y", o.o_totalprice.cast("double")),
        label_col="y",
        feature_cols=[],
        group_col="o_orderpriority",
    )
    # 5 priorities, dropLast=True -> 4 one-hot coefficients
    assert len(model.coefficients) == 4


def test_logistic_irls_recovers_log_odds(spark):
    """Binary x makes the model saturated, so the true MLE is the
    empirical log-odds: b0 = logit(0.25), b1 = logit(0.75) -
    logit(0.25). Six IRLS rounds converge well inside 1e-3."""
    import math

    from pyspark.sql import functions as F

    from appeals_data_spark.ml.glm import logistic_irls

    rows = []
    for x, p in ((0, 0.25), (1, 0.75)):
        for i in range(200):
            rows.append((float(x), 1.0 if i < p * 200 else 0.0))
    df = spark.createDataFrame(rows, "x double, y double")
    got = logistic_irls(df, y="y", x="x", iters=6).collect()[0]
    logit = lambda p: math.log(p / (1 - p))  # noqa: E731
    assert abs(got["b0"] - logit(0.25)) < 1e-3
    assert abs(got["b1"] - (logit(0.75) - logit(0.25))) < 1e-3


def test_pegasos_separates_linearly_separable_data(spark):
    # Deterministic separable toy set: y = +1 iff x1 + x2 > 1. Twenty
    # full-batch pegasos rounds with a weak regularizer must classify
    # every point correctly (margin 0.2 around the boundary; the bias
    # moves at O(1/(lambda*i)) so separation needs ~20 rounds here).
    import pyspark.sql.functions as F

    from appeals_data_spark.ml.svm import pegasos_linear_svm

    df = (
        spark.range(400)
        .withColumn("x1", (F.col("id") % 20).cast("double") / 10.0)
        .withColumn("x2", ((F.col("id") / 20).cast("int") % 20).cast("double") / 10.0)
        .filter(F.abs(F.col("x1") + F.col("x2") - 1.0) > 0.2)
        .withColumn("y", F.when(F.col("x1") + F.col("x2") > 1.0, 1.0).otherwise(-1.0))
    )
    coefs = pegasos_linear_svm(
        df, y=F.col("y"), xs=[F.col("x1"), F.col("x2")], lam=0.01, iters=20
    ).first()
    score = (
        F.lit(coefs["w0"])
        + F.lit(coefs["w1"]) * F.col("x1")
        + F.lit(coefs["w2"]) * F.col("x2")
    )
    errs = df.filter((F.col("y") > 0) != (score >= 0)).count()
    assert errs == 0
    # The boundary normal must point along (+1, +1).
    assert coefs["w1"] > 0 and coefs["w2"] > 0


def test_pegasos_class_weights_shift_boundary(spark):
    # Same data with a 10:1 positive class weight: the positive region
    # must not shrink — every point the unweighted model calls positive
    # stays positive, and the count of predicted positives grows.
    import pyspark.sql.functions as F

    from appeals_data_spark.ml.svm import pegasos_linear_svm

    df = (
        spark.range(400)
        .withColumn("x1", (F.col("id") % 20).cast("double") / 10.0)
        .withColumn("x2", ((F.col("id") / 20).cast("int") % 20).cast("double") / 10.0)
        .withColumn("y", F.when(F.col("x1") + F.col("x2") > 2.4, 1.0).otherwise(-1.0))
    )

    def npos(pos_weight):
        c = pegasos_linear_svm(
            df,
            y=F.col("y"),
            xs=[F.col("x1"), F.col("x2")],
            lam=0.1,
            iters=5,
            pos_weight=pos_weight,
        ).first()
        score = (
            F.lit(c["w0"])
            + F.lit(c["w1"]) * F.col("x1")
            + F.lit(c["w2"]) * F.col("x2")
        )
        return df.filter(score >= 0).count()

    assert npos(10.0) >= npos(1.0)


def test_pegasos_local_matches_distributed(spark):
    """The round-12 one-pass Arrow fit must be BIT-IDENTICAL to the
    per-round distributed aggregation: with the exact scaled-long fold
    the violator sums are order-free int64 adds and every other step
    mirrors the JVM expression operation for operation, so equality is
    exact (==, not approx) — on real sf0.001 lineitem features with
    class weights, and on a frame containing a null feature row (NULL
    exclusion must match NaN masking)."""
    from pyspark.sql import functions as F

    from appeals_data_spark.ml import svm as svm_mod
    from appeals_data_spark.ml.svm import pegasos_linear_svm

    li = load_table(spark, SF_SMOKE, "lineitem")
    xs = [
        F.col("l_quantity").cast("double") / 50 - 0.5,
        F.col("l_discount").cast("double") * 10 - 0.5,
    ]
    y = F.when(F.col("l_quantity") > 25, 1.0).otherwise(-1.0)

    nulled = li.withColumn(
        "l_discount",
        F.when(F.col("l_orderkey") % 97 == 0, None).otherwise(
            F.col("l_discount")
        ),
    )

    for frame in (li, nulled):
        kwargs = dict(
            y=y,
            xs=xs,
            lam=0.05,
            iters=7,
            pos_weight=4.0,
            neg_weight=1.0,
            exact_sum_decimals=6,
        )
        local = pegasos_linear_svm(frame, **kwargs).collect()[0]
        saved = svm_mod.SVM_LOCAL_MAX_BYTES
        svm_mod.SVM_LOCAL_MAX_BYTES = -1  # force the distributed loop
        try:
            dist = pegasos_linear_svm(frame, **kwargs).collect()[0]
        finally:
            svm_mod.SVM_LOCAL_MAX_BYTES = saved
        assert tuple(local) == tuple(dist)
