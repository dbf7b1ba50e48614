"""Text-analysis column expressions (training-data pipeline ops).

All JVM-side (split/regexp/aggregate builtins) — no Python UDFs — so
they vectorize inside whole-stage codegen and scale linearly over a
100 TB documents table.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")


def tokens(col: str | Column) -> Column:
    """Whitespace tokenization; empty string -> empty array."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_remove(F.split(F.trim(c), r"\s+"), "")


def token_count(col: str | Column) -> Column:
    return F.size(tokens(col))


def stopword_ratio(col: str | Column) -> Column:
    t = tokens(col)
    sw = F.array([F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(t, lambda x: F.array_contains(sw, F.lower(x))))
    return n_stop.cast("double") / F.greatest(F.size(t), F.lit(1)).cast("double")


def char_classes(col: str | Column) -> dict[str, Column]:
    """Counts of character classes, via regexp strip-and-measure."""
    c = F.col(col) if isinstance(col, str) else col
    total = F.length(c)
    alpha = total - F.length(F.regexp_replace(c, "[A-Za-z]", ""))
    digit = total - F.length(F.regexp_replace(c, "[0-9]", ""))
    space = total - F.length(F.regexp_replace(c, r"\s", ""))
    punct = total - alpha - digit - space
    return {"n_chars": total, "n_alpha": alpha, "n_digit": digit, "n_space": space, "n_punct": punct}


def shingles(col: str | Column, k: int = 3) -> Column:
    """Word k-shingles as an array of space-joined strings.

    Built by zipping ``k`` shifted slices of the token array rather
    than indexing inside a lambda: HOF lambdas re-evaluate captured
    expression trees per element, so ``transform(idx, i -> slice(t,
    i, k))`` would re-split the text O(n) times per row. Arguments to
    ``arrays_zip`` are evaluated once.
    """
    t = tokens(col)
    cnt = F.greatest(F.size(t) - (k - 1), F.lit(0))
    z = F.arrays_zip(*[F.slice(t, i + 1, cnt) for i in range(k)])
    return F.transform(z, lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(k)]))


def rolling_fingerprint(col: str | Column) -> Column:
    """Deterministic 64-bit document fingerprint: xxhash64 of the
    normalized (lowercased, whitespace-collapsed) text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "))


def lang_id_heuristic(col: str | Column) -> Column:
    """Tiny deterministic language-ID stand-in: scores by marker-word
    hits. Real model would be a pandas-UDF over a fastText-style model;
    the engine contract (schema, groupable output) is identical."""
    t = F.transform(tokens(col), lambda x: F.lower(x))

    def hits(words: tuple[str, ...]) -> Column:
        arr = F.array([F.lit(w) for w in words])
        return F.size(F.filter(t, lambda x: F.array_contains(arr, x)))

    en = hits(("the", "and", "is", "of"))
    es = hits(("el", "la", "de", "que"))
    de = hits(("der", "die", "und", "ist"))
    return (
        F.when((en >= es) & (en >= de) & (en > 0), F.lit("en"))
        .when((es >= de) & (es > 0), F.lit("es"))
        .when(de > 0, F.lit("de"))
        .otherwise(F.lit("unknown"))
    )
