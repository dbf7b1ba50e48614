"""Distributed BPE merge-rule training (byte-pair encoding, Sennrich
et al. 2016 shape) over a word-frequency table.

Classic BPE trains on the word-count dictionary, not the raw corpus:
each round counts adjacent symbol pairs weighted by word frequency,
picks the most frequent pair, and fuses every occurrence. Here each
round is one Spark pass: a pair-count aggregation (map-side
combinable), a 1-row argmax broadcast back, and a JVM-side
transform/filter rewrite of the symbol arrays — no Python boundary,
no driver-side collect, lineage cut per round with localCheckpoint
(the closure/Lloyd/IRLS iteration pattern).

Determinism restriction: candidate pairs require ``pa != pb``.
Self-pair merges (aa) make greedy left-to-right fusion order-dependent
inside runs (aaa -> [aa, a]), which a single transform/filter pass
cannot express and which differs across engines' replace semantics;
with ``pa != pb`` adjacent matches can never overlap, so "merge all
matches simultaneously" IS the greedy result and one vectorized pass
per word is exact. Real tokenizers hit self-pairs only deep into
training; the restriction is documented API surface, not a silent
approximation.

Tie-break: (count desc, pa asc, pb asc) — symbol strings are ASCII
tokens, so binary ordering agrees across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chars_of(word) -> F.Column:
    """Split a word into single-character symbols (1-pass substr map —
    avoids split-regex empty-element edge cases across engines)."""
    c = F.col(word) if isinstance(word, str) else word
    # Guard the empty word: sequence(1, 0) yields a DESCENDING [1, 0]
    # (Spark defaults to step -1 when stop < start), which would emit
    # two phantom empty-string symbols.
    return F.when(
        F.length(c) > 0,
        F.transform(F.sequence(F.lit(1), F.length(c)), lambda i: c.substr(i, F.lit(1))),
    ).otherwise(F.array().cast("array<string>"))


def _adjacent_pairs(syms: F.Column) -> F.Column:
    """Array of (pa, pb) structs for each adjacent symbol position."""
    n = F.size(syms)
    idx = F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx,
        lambda i: F.struct(
            F.get(syms, i - 1).alias("pa"), F.get(syms, i).alias("pb")
        ),
    )


def _merge_pair(syms: F.Column, pa: F.Column, pb: F.Column) -> F.Column:
    """Fuse every (pa, pb) adjacency in one vectorized pass: emit the
    fused symbol at the left position, null out the right position,
    filter the nulls. Safe because pa != pb makes matches disjoint."""
    n = F.size(syms)

    def one(i):
        cur = F.get(syms, i - 1)
        nxt = F.get(syms, i)  # null past the end (F.get is total)
        prv = F.get(syms, i - 2)  # null before the start
        is_left = (cur == pa) & F.coalesce(nxt == pb, F.lit(False))
        is_right = F.coalesce(prv == pa, F.lit(False)) & (cur == pb)
        return F.when(is_left, F.concat(pa, pb)).when(is_right, F.lit(None)).otherwise(cur)

    return F.filter(
        F.transform(F.sequence(F.lit(1), n), one), lambda x: x.isNotNull()
    )


def bpe_merge_table(words: DataFrame, n_rounds: int = 3) -> DataFrame:
    """Train ``n_rounds`` BPE merge rules over ``words(word, n)``.

    Returns (merge_round, pa, pb, pair_count) — the ordered merge table that
    IS the trained tokenizer artifact. All-integer/string output, so
    the differential twin is exact.

    Scale shape: the word dictionary is |vocab|-sized (already tiny
    relative to the corpus after the word-count groupBy); each round
    shuffles only distinct pairs with map-side partial sums, and the
    argmax row broadcasts back. n_rounds is the iteration budget knob;
    lineage is cut every round so the plan stays flat.
    """
    return _train(words, n_rounds, need_segmented=False)[0]


def bpe_segmented_words(words: DataFrame, n_rounds: int = 3) -> DataFrame:
    """Train ``n_rounds`` merges and return the word table segmented by
    them: (word, n, syms array<string>) — the tokenizer *applied* to
    its own training dictionary, ready for subword-vocab rollups."""
    return _train(words, n_rounds)[1]


def _train(
    words: DataFrame, n_rounds: int, need_segmented: bool = True
) -> tuple[DataFrame, DataFrame]:
    cur = words.select("word", "n", chars_of("word").alias("syms"))
    out: DataFrame | None = None
    for r in range(1, n_rounds + 1):
        pairs = cur.select("n", F.explode(_adjacent_pairs(F.col("syms"))).alias("p"))
        counts = (
            pairs.select("n", F.col("p.pa").alias("pa"), F.col("p.pb").alias("pb"))
            .filter(F.col("pa") != F.col("pb"))
            .groupBy("pa", "pb")
            .agg(F.sum("n").alias("pair_count"))
        )
        # argmax via 1-row struct-min: (-count, pa, pb) lexicographic
        # MIN is exactly the old (count DESC, pa ASC, pb ASC)
        # row_number()=1 winner, but as a map-side-combinable aggregate
        # — the old global-order window funneled the ENTIRE pair vocab
        # through one partition's sort every round, the classic
        # single-reducer bottleneck at 100 TB vocab sizes (round 10;
        # winner identical, oracle hash unchanged). An empty counts
        # frame aggregates to a NULL struct — filtered, preserving the
        # empty-best loop exit below.
        best = (
            counts.agg(
                F.min(
                    F.struct(
                        (-F.col("pair_count")).alias("neg"), "pa", "pb"
                    )
                ).alias("_b")
            )
            .filter(F.col("_b").isNotNull())
            .select(
                F.col("_b.pa").alias("pa"),
                F.col("_b.pb").alias("pb"),
                (-F.col("_b.neg")).alias("pair_count"),
            )
            .localCheckpoint()
        )
        if best.isEmpty():
            # Dictionary ran out of pa != pb adjacencies: an empty
            # argmax side would annihilate the cross join (and the
            # dictionary with it) — stop with the merges found so far.
            # Driver-side control on an already-materialized 1-row
            # table, same pattern as the closure fixpoint check.
            break
        tagged = best.select(
            F.lit(r).alias("merge_round"), "pa", "pb", "pair_count"
        )
        out = tagged if out is None else out.unionByName(tagged)
        if r == n_rounds and not need_segmented:
            # The final rewrite only matters to segmented-output
            # callers; merge-table callers would pay a full (eager)
            # dictionary pass for a result they discard.
            break
        cur = (
            cur.crossJoin(F.broadcast(best.select("pa", "pb")))
            .select(
                "word",
                "n",
                _merge_pair(F.col("syms"), F.col("pa"), F.col("pb")).alias("syms"),
            )
            .localCheckpoint()
        )
    if out is None:
        # No pa != pb adjacency anywhere (e.g. all 1-char words): an
        # empty merge table with the contract schema.
        out = words.sparkSession.createDataFrame(
            [], "merge_round int, pa string, pb string, pair_count bigint"
        )
    return out.orderBy("merge_round"), cur
