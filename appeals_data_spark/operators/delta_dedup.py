"""Incremental corpus-delta deduplication (day-2 ingest).

A production 100 TB pipeline never re-dedups the whole lake when a new
batch lands: it carries a frozen-corpus SIGNATURE artifact (here a
Bloom bitset over the doc_signature fingerprint, built with DataFrame
aggregation exactly like pipe_decontam_bloom's — no driver collect)
and scores each incoming document against it. The Bloom filter has
false positives but NO false negatives, and every positive is
confirmed by an exact join against the signature table, so the flags
are bit-identical to a plain exact join (gated in
tests/test_pipeline.py) while the confirm join's probe side is thinned
to true dups + the ~1% false-positive tail — the entire point once the
corpus outgrows broadcast range and the confirm becomes a shuffle
join.

The flag projection is STATELESS (expressions + a static broadcast
side only), so the same function scores a Structured Streaming ingest
micro-batch — parity gated in tests/test_streaming.py, like the PII
scrub.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_BITS = 1 << 15  # 512 64-bit words
BLOOM_K = 3


def doc_signature(text_col: str = "text") -> Column:
    """Bag-of-words document fingerprint: xxhash64 of the SORTED
    DISTINCT token set — invariant to word order and repetition, the
    cheap first tier of fuzzy dedup (a shuffled or stutter-duplicated
    replica collides; genuinely new text does not). Tokens are the
    engine-standard whitespace split of lower(trim(text)) with empties
    dropped, so the DuckDB twin is
    xxhash-free: array_to_string(list_sort(list_distinct(...)), ' ')
    equality (hash equality == string equality barring 2^-64)."""
    toks = F.array_sort(
        F.array_distinct(
            F.filter(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                lambda x: x != "",
            )
        )
    )
    return F.xxhash64(F.concat_ws(" ", toks))


def signature_bloom(corpus_sigs: DataFrame, sig_col: str = "th") -> DataFrame:
    """One-row map<word_idx, word> Bloom bitset over a signature
    column — the broadcastable frozen-corpus artifact. Built with
    groupBy/bit_or aggregation (map-side combinable at any corpus
    size)."""
    pos = [
        F.pmod(F.xxhash64(sig_col, F.lit(j)), F.lit(BLOOM_BITS))
        for j in range(BLOOM_K)
    ]
    words = (
        corpus_sigs.select(F.explode(F.array(*pos)).alias("pos"))
        .groupBy(F.shiftright("pos", 6).alias("w"))
        .agg(
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))")
            ).alias("word")
        )
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "word"))).alias("bf")
    )


def delta_dedup_flags(
    delta: DataFrame, corpus_sigs: DataFrame, sig_col: str = "th"
) -> DataFrame:
    """Per-row corpus-duplicate flag for an incoming batch or stream:
    input columns + ``is_dup_vs_corpus``. Bloom-negative rows are
    decided by the bitset alone (the mixed-condition left join only
    matches Bloom-positive rows); positives are confirmed exactly, so
    a false positive can never flag a non-duplicate.

    CONTRACT: ``corpus_sigs`` must be DISTINCT on ``sig_col`` (it is a
    signature SET) — a duplicated signature would fan each matching
    delta row out to one row per corpus copy through the confirm left
    join. Both shipped call sites build it with ``.distinct()``;
    enforcing it here would re-shuffle an already-distinct artifact on
    every micro-batch."""
    bloom = signature_bloom(corpus_sigs, sig_col)
    probe = delta.crossJoin(F.broadcast(bloom))
    maybe = None
    for j in range(BLOOM_K):
        p = f"pmod(xxhash64({sig_col}, {j}), {BLOOM_BITS})"
        bit = (
            F.expr(
                # try_element_at: NULL-for-missing in every ansi config
                f"coalesce(try_element_at(bf, shiftright({p}, 6)), "
                f"CAST(0 AS BIGINT))"
                f" & shiftleft(CAST(1 AS BIGINT), CAST({p} % 64 AS INT))"
            )
            != 0
        )
        maybe = bit if maybe is None else (maybe & bit)
    conf = corpus_sigs.select(
        F.col(sig_col).alias("_cth"), F.lit(1).alias("_in_c")
    )
    return (
        probe.join(
            F.broadcast(conf),
            (F.col(sig_col) == F.col("_cth")) & maybe,
            "left",
        )
        .withColumn("is_dup_vs_corpus", F.col("_in_c").isNotNull())
        .drop("bf", "_cth", "_in_c")
    )
