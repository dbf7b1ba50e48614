"""Shared unigram language-model trainer (the CCNet / quality-scoring
LM; reference analog: the corpus-frequency scoring in
/root/reference/notebooks text-quality passes).

ONE implementation of the vocab -> total -> log-prob pipeline so the
three LM consumers (``text_unigram_logprob``, ``pipe_perplexity_
buckets``, ``streaming.doc_stream.lm_score_map``) cannot drift: the
determinism contract — ``ln`` evaluated once per distinct token,
rounded to 6 dp, cast to DECIMAL(18,6) BEFORE any aggregation, so
every downstream sum is exact decimal arithmetic — lives here and
only here.

Physical shape at 100 TB: vocab is a token groupBy with map-side
partials; the 1-row total and the MB-scale log-prob table broadcast
back onto the occurrence stream. ``localCheckpoint`` materializes the
tiny vocab once so the corpus scan doesn't run three times (score +
vocab + total chains).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Decimal places of the per-token log-prob; DECIMAL(18,6) end-to-end.
LM_LOGPROB_DECIMALS = 6


def unigram_logprob_frame(tok: DataFrame, token_col: str = "token") -> DataFrame:
    """(token, lp DECIMAL(18,6)) from a token-occurrence frame.

    ``tok`` may carry extra columns (doc_id, source); only
    ``token_col`` is read. lp = round(ln(n) - ln(total), 6) — the
    corpus unigram log-probability, exact-decimal from birth.
    """
    vocab = (
        tok.groupBy(token_col).agg(F.count("*").alias("n")).localCheckpoint()
    )
    total = vocab.agg(F.sum("n").alias("t"))
    return vocab.crossJoin(F.broadcast(total)).select(
        token_col,
        F.round(F.log(F.col("n")) - F.log(F.col("t")), LM_LOGPROB_DECIMALS)
        .cast(f"decimal(18,{LM_LOGPROB_DECIMALS})")
        .alias("lp"),
    )
