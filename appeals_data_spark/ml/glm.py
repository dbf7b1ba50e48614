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
