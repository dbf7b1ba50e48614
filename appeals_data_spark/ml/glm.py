"""GLM hooks: MLlib fitting + closed-form sufficient statistics.

The reference fits GLMs client-side on query results
(`glm(cancelled ~ ., family=binomial)` scratch/hearings/
cancellations.R:60, `glmer` notebooks/hearings/effect-on-outcomes.
Rmd:236, `lm` scratch/decisions/reader-pilot.R:16-33). The Spark-first
split:

- Simple/multiple linear regression: the sufficient statistics
  (means, covariances) are one aggregation — closed form, exact,
  oracle-checkable (see ``linreg_stats``; DuckDB twin uses
  regr_slope/regr_intercept).
- Everything iterative (logistic, Poisson, mixed effects): MLlib
  ``GeneralizedLinearRegression`` over a features vector — distributed
  IRLS, one pass per iteration. Mixed-effects (glmer) has no MLlib
  twin; the documented approximation is fixed-effects GLM with the
  grouping factor one-hot encoded (what ``fit_glm`` does when
  ``group_col`` is passed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def linreg_stats(df: DataFrame, y: str | Column, x: str | Column) -> DataFrame:
    """Closed-form simple linear regression via sufficient statistics:
    slope = cov_pop(x,y)/var_pop(x), intercept = E[y] - slope*E[x],
    r2 = corr². One aggregation, any scale."""
    yc = F.col(y) if isinstance(y, str) else y
    xc = F.col(x) if isinstance(x, str) else x
    agg = df.agg(
        F.covar_pop(xc, yc).alias("sxy"),
        F.var_pop(xc).alias("sxx"),
        F.avg(xc).alias("mx"),
        F.avg(yc).alias("my"),
        F.corr(xc, yc).alias("r"),
        F.count(F.lit(1)).alias("n"),
    )
    slope = F.col("sxy") / F.col("sxx")
    return agg.select(
        slope.alias("slope"),
        (F.col("my") - slope * F.col("mx")).alias("intercept"),
        (F.col("r") * F.col("r")).alias("r2"),
        "n",
    )


def fit_glm(
    df: DataFrame,
    label_col: str,
    feature_cols: list[str],
    family: str = "gaussian",
    link: str | None = None,
    group_col: str | None = None,
    reg_param: float = 0.0,
):
    """Fit an MLlib GeneralizedLinearRegression; returns the model.

    ``group_col``: optional categorical whose levels are one-hot
    encoded into the design matrix (fixed-effects approximation of the
    reference's glmer random intercepts).
    """
    from pyspark.ml.feature import OneHotEncoder, StringIndexer, VectorAssembler
    from pyspark.ml.regression import GeneralizedLinearRegression

    stages_input = df
    features = list(feature_cols)
    if group_col is not None:
        idx = StringIndexer(
            inputCol=group_col, outputCol=f"{group_col}_idx", stringOrderType="alphabetAsc"
        ).fit(stages_input)
        stages_input = idx.transform(stages_input)
        enc = OneHotEncoder(
            inputCols=[f"{group_col}_idx"], outputCols=[f"{group_col}_oh"], dropLast=True
        ).fit(stages_input)
        stages_input = enc.transform(stages_input)
        features.append(f"{group_col}_oh")
    assembled = VectorAssembler(inputCols=features, outputCol="features").transform(
        stages_input
    )
    glr = GeneralizedLinearRegression(
        labelCol=label_col,
        featuresCol="features",
        family=family,
        regParam=reg_param,
        **({"link": link} if link else {}),
    )
    return glr.fit(assembled)


def logistic_irls(
    df: DataFrame, y: str | Column, x: str | Column, iters: int = 3
) -> DataFrame:
    """Distributed logistic regression y ~ b0 + b1*x by iteratively
    reweighted least squares, entirely as DataFrame aggregations.

    Each iteration is ONE aggregation of five weighted sufficient
    statistics (w, wx, wx2, wz, wxz with w = mu(1-mu), working
    response z = eta + (y-mu)/w), whose 2x2 normal equations solve in
    closed form; the new coefficients are a 1-row frame broadcast back
    onto the data for the next pass (model-as-data — no collect, the
    same feedback shape as the Lloyd k-means rounds). Lineage is cut
    with ``localCheckpoint`` per round (the closure-loop discipline) so
    the fit is `iters` data passes, not the O(iters^2) a nested lazy
    plan would re-run. Starting point beta = (0, 0) (mu = 0.5
    everywhere), the textbook IRLS start.

    Reference analog: the logistic fits of effect-on-outcomes.Rmd
    (glm family=binomial); x6_grouped_glm carries the grouped
    pandas-fit form, this is the single-model JVM-side scale path.
    """
    yc = F.col(y) if isinstance(y, str) else y
    xc = F.col(x) if isinstance(x, str) else x
    d = df.select(yc.cast("double").alias("_y"), xc.cast("double").alias("_x"))
    coefs = d.sparkSession.range(1).select(
        F.lit(0.0).alias("b0"), F.lit(0.0).alias("b1")
    )
    for _ in range(iters):
        eta = F.col("b0") + F.col("b1") * F.col("_x")
        mu = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
        w = mu * (F.lit(1.0) - mu)
        z = eta + (F.col("_y") - mu) / w
        s = (
            d.crossJoin(F.broadcast(coefs))
            .select(
                w.alias("w"),
                (w * F.col("_x")).alias("wx"),
                (w * F.col("_x") * F.col("_x")).alias("wxx"),
                (w * z).alias("wz"),
                (w * F.col("_x") * z).alias("wxz"),
            )
            .agg(
                F.sum("w").alias("sw"),
                F.sum("wx").alias("swx"),
                F.sum("wxx").alias("swxx"),
                F.sum("wz").alias("swz"),
                F.sum("wxz").alias("swxz"),
            )
        )
        b1 = (F.col("sw") * F.col("swxz") - F.col("swx") * F.col("swz")) / (
            F.col("sw") * F.col("swxx") - F.col("swx") * F.col("swx")
        )
        coefs = s.select(
            ((F.col("swz") - b1 * F.col("swx")) / F.col("sw")).alias("b0"),
            b1.alias("b1"),
        ).localCheckpoint()
    return coefs
