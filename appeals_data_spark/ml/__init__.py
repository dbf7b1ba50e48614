"""Statistical-model layer (SURVEY §2.11 X3 — the reference's
glm/glmer/lm/svm calls). Contract: "Spark until the aggregate is
small" — model inputs are built as DataFrames; fitting runs in MLlib
when distributed, or closed-form/driver-side when the sufficient
statistics fit in one row.
"""

from .glm import fit_glm, linreg_stats  # noqa: F401
