"""Survival estimation (Kaplan-Meier) as pure DataFrame algebra.

The reference fits `survfit(Surv(age.enter, age.exit, clsevent) ~ 1)`
(notebooks/other/remand-return.Rmd:44-57, SURVEY X3). The Kaplan-Meier
product-limit estimator is expressible with a groupBy + two window
cumulatives — no UDF, no driver loop:

  S(t) = Π_{t_i <= t} (1 - d_i / n_i)

with d_i events at time t_i and n_i the risk set (left-truncation
aware). The cumulative product runs as exp(Σ log(...)) so it stays a
built-in window aggregate; survival probabilities are well-conditioned
in log space.

Scale: one shuffle to the time grain, then windows over a single
ordered pass. For stratified curves add the stratum to every
partitionBy — same plan shape per stratum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def kaplan_meier(
    records: DataFrame,
    duration_col: str,
    event_col: str,
    enter_col: str | None = None,
    strata: list[str] | None = None,
) -> DataFrame:
    """Kaplan-Meier curve from (duration, event[, enter]) records.

    ``event_col``: 1 = event observed at ``duration``, 0 = censored.
    ``enter_col``: optional left-truncation entry time (defaults 0).
    Returns one row per distinct event time with columns
    strata..., t, n_risk, n_event, n_censored, survival.
    """
    strata = strata or []
    part = [F.col(c) for c in strata]
    dur = F.col(duration_col)
    ev = F.col(event_col)

    per_t = records.groupBy(*part, dur.alias("t")).agg(
        F.sum(F.when(ev == 1, 1).otherwise(0)).alias("n_event"),
        F.sum(F.when(ev == 0, 1).otherwise(0)).alias("n_censored"),
        F.count("*").alias("n_at_t"),
    )
    if enter_col is not None:
        entries = records.groupBy(*part, F.col(enter_col).alias("t")).agg(
            F.count("*").alias("n_enter_at_t")
        )
        per_t = per_t.join(entries, strata + ["t"], "full").fillna(
            0, ["n_event", "n_censored", "n_at_t", "n_enter_at_t"]
        )
    else:
        per_t = per_t.withColumn("n_enter_at_t", F.lit(0))

    w_ord = Window.partitionBy(*part).orderBy("t")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    w_prev = w_ord.rowsBetween(Window.unboundedPreceding, -1)

    if enter_col is not None:
        # risk set = entered by t (inclusive) - exited before t
        entered = F.sum("n_enter_at_t").over(w_cum)
        exited_before = F.coalesce(F.sum("n_at_t").over(w_prev), F.lit(0))
        n_risk = entered - exited_before
    else:
        total = Window.partitionBy(*part)
        exited_before = F.coalesce(F.sum("n_at_t").over(w_prev), F.lit(0))
        n_risk = F.sum("n_at_t").over(total) - exited_before

    km = per_t.withColumn("n_risk", n_risk).filter(F.col("n_at_t") > 0)
    # cumulative product in log space; guard the d_i == n_i collapse
    frac = (F.col("n_risk") - F.col("n_event")).cast("double") / F.col("n_risk")
    km = km.withColumn(
        "survival",
        F.when(
            F.min(frac).over(w_cum) <= 0, F.lit(0.0)
        ).otherwise(F.exp(F.sum(F.log(F.greatest(frac, F.lit(1e-300)))).over(w_cum))),
    )
    return km.select(*strata, "t", "n_risk", "n_event", "n_censored", "survival").orderBy(
        *strata, "t"
    )


def km_counts(
    records: DataFrame,
    duration_col: str,
    event_col: str,
    strata: list[str] | None = None,
) -> DataFrame:
    """Oracle-friendly KM core: per-time risk set and event counts plus
    the exact rational survival numerator/denominator products are not
    emitted (float product is engine-dependent); use this for
    hash-checked correctness and :func:`kaplan_meier` for the curve."""
    strata = strata or []
    part = [F.col(c) for c in strata]
    per_t = records.groupBy(*part, F.col(duration_col).alias("t")).agg(
        F.sum(F.when(F.col(event_col) == 1, 1).otherwise(0)).alias("n_event"),
        F.sum(F.when(F.col(event_col) == 0, 1).otherwise(0)).alias("n_censored"),
    )
    w_ord = Window.partitionBy(*part).orderBy("t")
    w_prev = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    total = Window.partitionBy(*part)
    n_at_t = F.col("n_event") + F.col("n_censored")
    per_t = per_t.withColumn(
        "n_risk",
        F.sum(n_at_t).over(total) - F.coalesce(F.sum(n_at_t).over(w_prev), F.lit(0)),
    )
    return per_t.select(*strata, "t", "n_risk", "n_event", "n_censored").orderBy(*strata, "t")


def competing_risks_cuminc(
    records: DataFrame,
    duration_col: str,
    cause_col: str,
    n_causes: int = 2,
    strata: list[str] | None = None,
) -> DataFrame:
    """Aalen-Johansen cumulative incidence under competing risks
    (reference `cuminc`, scratch/other/event-history.R:247-248):

      CIF_k(t) = Σ_{t_i <= t}  S(t_i-) · d_k,i / n_i

    with S the all-cause KM and cause 0 = censored. Same physical
    shape as :func:`kaplan_meier`: one shuffle to the time grain, one
    ordered window pass computing S(t-) in log space and every CIF_k
    as a running sum.
    """
    strata = strata or []
    part = [F.col(c) for c in strata]
    cause = F.col(cause_col)

    aggs = [
        F.sum(F.when(cause == k, 1).otherwise(0)).alias(f"d{k}")
        for k in range(1, n_causes + 1)
    ]
    per_t = records.groupBy(*part, F.col(duration_col).alias("t")).agg(
        *aggs,
        F.sum(F.when(cause == 0, 1).otherwise(0)).alias("n_censored"),
        F.count("*").alias("n_at_t"),
    )
    w_ord = Window.partitionBy(*part).orderBy("t")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    w_prev = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    total = Window.partitionBy(*part)

    n_risk = F.sum("n_at_t").over(total) - F.coalesce(
        F.sum("n_at_t").over(w_prev), F.lit(0)
    )
    d_all = sum(F.col(f"d{k}") for k in range(1, n_causes + 1))
    km = per_t.withColumn("n_risk", n_risk)
    frac = (F.col("n_risk") - d_all).cast("double") / F.col("n_risk")
    # S(t-) = KM just before t: cumulative product over STRICTLY prior rows
    s_prev = F.when(
        F.coalesce(F.min(frac).over(w_prev), F.lit(1.0)) <= 0, F.lit(0.0)
    ).otherwise(
        F.exp(
            F.coalesce(
                F.sum(F.log(F.greatest(frac, F.lit(1e-300)))).over(w_prev), F.lit(0.0)
            )
        )
    )
    km = km.withColumn("s_prev", s_prev)
    out_cols = [*strata, "t", "n_risk", "n_censored"]
    for k in range(1, n_causes + 1):
        km = km.withColumn(
            f"cif{k}",
            F.round(
                F.sum(
                    F.col("s_prev") * F.col(f"d{k}").cast("double") / F.col("n_risk")
                ).over(w_cum),
                6,
            ),
        )
        out_cols += [f"d{k}", f"cif{k}"]
    return km.select(*out_cols).orderBy(*strata, "t")
