"""Text-analysis column expressions (training-data pipeline ops).

All JVM-side (split/regexp/aggregate builtins) — no Python UDFs — so
they vectorize inside whole-stage codegen and scale linearly over a
100 TB documents table.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.window import Window

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


def shingle_stream(
    df, text_col: str, k: int, carry_cols, distinct=True, count_col=None
):
    """Exploded word k-shingle stream as an Arrow ``mapInPandas`` pass:
    one output row per (doc, gram), carrying ``carry_cols`` alongside
    the gram string ``g``. When ``count_col`` is set, every emitted row
    additionally carries the doc's TOTAL gram count under that name
    (``size(array_distinct(shingles(...)))`` when distinct, else the
    occurrence count) — the decontam pattern, where the per-doc total
    must ride the stream instead of paying a second corpus pass.

    Exists because :func:`shingles`'s ``transform`` lambda — like every
    array higher-order function — is CodegenFallback: the per-gram
    ``concat_ws`` evaluates INTERPRETED, and a corpus-scale
    ``explode(array_distinct(shingles(...)))`` spends ~18s per pass at
    the 100x probe building 25M gram strings one interpreted eval at a
    time (round-12 profile; the same diagnosis as the round-11 PQ
    encode fix, similarity.py pq_encode). Plain Python string slicing
    over Arrow batches is ~4x faster, and the pass stays narrow — no
    shuffle, no join, partition-parallel.

    BIT-EQUALITY CONTRACT: the output row multiset must equal
    ``df.select(*carry_cols, explode(array_distinct(shingles(lower(
    trim(text_col)), k))))`` exactly — pinned by
    tests/test_operators_golden.py::test_shingle_stream_matches_hof_spec.
    The Python reimplementation mirrors the JVM semantics precisely:
    ``trim`` strips ASCII space 0x20 only (Spark StringTrim's default),
    ``lower`` is applied between the two trims, Java ``\\s`` is the
    ASCII class [ \\t\\n\\x0B\\f\\r] (NOT Python's unicode-aware
    ``\\s``), and ``array_distinct`` keeps first occurrence order.
    """
    import re

    import numpy as np

    ws_re = re.compile("[ \t\n\x0b\f\r]+")
    carry_cols = list(carry_cols)
    out_schema = ", ".join(
        [f"{c} {df.schema[c].dataType.simpleString()}" for c in carry_cols]
        + ([f"{count_col} int"] if count_col else [])
        + ["g string"]
    )

    # Cap yielded frames: one input batch of ~10k docs fans out to
    # ~500k gram rows, and a single huge pandas->Arrow frame per
    # yield spikes netty direct buffers and JVM heap on a 32-worker
    # box (the sf100 probe's GC-thrash failure mode). ~128k rows per
    # frame keeps each transfer a few MB without measurable loop cost.
    FLUSH_ROWS = 131_072

    def gen(batches):
        for pdf in batches:
            texts = pdf[text_col]
            carry = pdf[carry_cols]
            out_idx: list[int] = []
            out_n: list[int] = []
            out_g: list[str] = []

            def flush():
                res = carry.iloc[out_idx].reset_index(drop=True)
                if count_col:
                    res[count_col] = np.asarray(out_n, dtype="int32")
                res["g"] = out_g
                return res

            for i, t in enumerate(texts):
                if t is None:
                    continue
                low = t.strip(" ").lower().strip(" ")
                toks = [w for w in ws_re.split(low) if w]
                n = len(toks) - (k - 1)
                if n <= 0:
                    continue
                grams = [" ".join(toks[j : j + k]) for j in range(n)]
                if distinct:
                    grams = list(dict.fromkeys(grams))
                out_idx.extend([i] * len(grams))
                if count_col:
                    out_n.extend([len(grams)] * len(grams))
                out_g.extend(grams)
                if len(out_idx) >= FLUSH_ROWS:
                    yield flush()
                    out_idx, out_n, out_g = [], [], []
            if out_idx:
                yield flush()

    return df.select(*carry_cols, text_col).mapInPandas(gen, schema=out_schema)


def ngram_cols_stream(df, text_col: str, k: int, carry_cols, names):
    """Exploded word n-gram OCCURRENCE stream with the ``k`` gram
    tokens as SEPARATE string columns (``names``), as an Arrow
    ``mapInPandas`` pass: one output row per (doc, position), carrying
    ``carry_cols`` alongside the token columns — the LM-query front
    end (bigram/trigram occurrence streams feed count tables and the
    per-doc scoring join as individual token keys, not concatenated
    gram strings, so :func:`shingle_stream` does not fit).

    Exists for the same reason as :func:`shingle_stream`: the
    expression form ``explode(arrays_zip(slice(t,1,c), .., slice(t,k,
    c)))`` builds a corpus-scale struct array through interpreted
    array kernels — noop-isolated at 24.3 s of text_trigram_backoff's
    102.9 s at the 100x probe (round-12 profile). Plain Python list
    slicing over Arrow batches is ~4x faster and the pass stays
    narrow: no shuffle, no join, partition-parallel.

    BIT-EQUALITY CONTRACT: the output row multiset must equal::

        df.select(*carry_cols, explode(arrays_zip(
            *[slice(t, j+1, greatest(size(t)-(k-1), 0))
              for j in range(k)])).alias("g"))
          .select(*carry_cols, *[col(f"g.{j}") for j in range(k)])

    with ``t = tokens(lower(text_col))`` — pinned by
    tests/test_operators_golden.py::test_ngram_cols_stream_matches_spec.
    Tokenization mirrors the JVM exactly as in shingle_stream (Java
    ``\\s`` is the ASCII class, empty strings removed, lower before
    split — the trim inside :func:`tokens` is a no-op for token
    extraction since ``\\s+`` splits and empties are removed)."""
    import re

    ws_re = re.compile("[ \t\n\x0b\f\r]+")
    carry_cols = list(carry_cols)
    assert len(names) == k
    out_schema = ", ".join(
        [f"{c} {df.schema[c].dataType.simpleString()}" for c in carry_cols]
        + [f"{name} string" for name in names]
    )

    FLUSH_ROWS = 131_072

    def gen(batches):
        for pdf in batches:
            texts = pdf[text_col]
            carry = pdf[carry_cols]
            out_idx: list[int] = []
            out_tok: list[list[str]] = [[] for _ in range(k)]

            def flush():
                res = carry.iloc[out_idx].reset_index(drop=True)
                for j, name in enumerate(names):
                    res[name] = out_tok[j]
                return res

            for i, t in enumerate(texts):
                if t is None:
                    continue
                toks = [w for w in ws_re.split(t.lower()) if w]
                n = len(toks) - (k - 1)
                if n <= 0:
                    continue
                out_idx.extend([i] * n)
                for j in range(k):
                    out_tok[j].extend(toks[j : j + n])
                if len(out_idx) >= FLUSH_ROWS:
                    yield flush()
                    out_idx = []
                    out_tok = [[] for _ in range(k)]
            if out_idx:
                yield flush()

    return df.select(*carry_cols, text_col).mapInPandas(gen, schema=out_schema)


def rolling_fingerprint(col: str | Column) -> Column:
    """Deterministic 64-bit document fingerprint: xxhash64 of the
    normalized (lowercased, whitespace-collapsed) text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "))


def winnow_fingerprints(
    df, text_col: str, id_col: str, k: int = 5, w: int = 4
):
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03): base-31 polynomial hash of every char k-gram of the
    normalized text, then the min hash of each sliding window of ``w``
    consecutive k-grams; the distinct window-mins are the fingerprint
    set. Guarantees any shared substring of length >= k + w - 1
    produces a shared fingerprint.

    The classic O(1) "rolling" update is an artifact of scalar loops;
    in a columnar engine the same hash family is evaluated directly
    per position (explode + codegen'd arithmetic) and the window min
    is a frame aggregate — no Python, no UDF, exact SQL twin in any
    engine with ``ord``/``substr``. Returns (doc_id, fp) distinct
    pairs.

    Per-position char access goes through a per-document char-code
    ARRAY materialized once (split + ascii), so each gram hash is k
    O(1) ``element_at`` lookups. The original ``substr(p+j, 1)`` form
    re-scanned the string from byte 0 per access (UTF8String offsets),
    an O(L²)-bytes hidden cost per document — measured 312s at the
    100x probe vs 8.5s at sf0.1 (a 36x factor that was pure
    byte-rescan CPU, not shuffle). An all-in-row HOF variant (hash
    array + zipped-slice sliding min, no explode) was also tried and
    was 10x SLOWER at sf0.1: higher-order lambdas are interpreted per
    element, while the exploded form keeps the hash arithmetic inside
    whole-stage codegen.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    t = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.transform(F.split(t, ""), F.ascii).alias("_c"),
    ).filter(F.size("_c") >= k)
    pos = base.select(
        "doc_id",
        F.size("_c").alias("_n"),
        F.col("_c"),
        F.explode(F.sequence(F.lit(1), F.size("_c") - (k - 1))).alias("p"),
    )
    h = None
    for j in range(k):
        term = F.element_at(F.col("_c"), F.col("p") + j) * (31**j)
        h = term if h is None else h + term
    grams = pos.select("doc_id", "_n", "p", h.cast("long").alias("h"))
    win = Window.partitionBy("doc_id").orderBy("p").rowsBetween(0, w - 1)
    return (
        grams.select(
            "doc_id",
            "p",
            "_n",
            F.min("h").over(win).alias("fp"),
        )
        # winnowing only selects from FULL windows of w k-grams
        .filter(F.col("p") <= F.col("_n") - (k - 1) - (w - 1))
        .select("doc_id", "fp")
        .distinct()
    )


def winnow_stream(df, text_col: str, id_col: str, carry_cols, k: int = 5, w: int = 4):
    """Winnowing fingerprints as ONE Arrow ``mapInPandas`` pass — the
    hot-path twin of :func:`winnow_fingerprints` (same hash family,
    same window-min selection), returning the distinct (doc, fp) pairs
    with ``carry_cols`` carried through so the consumer's join back
    onto the documents table disappears.

    Exists because the exploded expression form pays, at corpus scale:
    an interpreted per-char ``transform(split(t,''), ascii)`` HOF, a
    position explode to |chars| rows, a per-doc window sort under one
    Exchange, and a distinct under another — ~68 s at the 100x probe,
    nearly all of it those two corpus-char-sized shuffles plus the
    interpreted char-code build. Here the whole pipeline (normalize,
    char codes, base-31 polynomial gram hashes, sliding window min,
    per-doc distinct) is NumPy inside one narrow pass: no explode, no
    shuffle at all.

    BIT-EQUALITY CONTRACT: output row multiset ==
    ``winnow_fingerprints(df, text_col, id_col, k, w)`` joined to the
    carry columns — pinned by tests/test_operators_golden.py::
    test_winnow_stream_matches_expression_spec. JVM semantics mirrored
    by hand: ``trim`` strips ASCII space 0x20 only, Java ``\\s`` is
    the ASCII class, ``split(t, '')`` yields per-codepoint strings and
    ``ascii`` the codepoint (Python ``ord``), hashes are exact int64
    (the JVM int sum never overflows on codepoints < 2327, which the
    ANSI session would reject anyway).
    """
    import re

    import numpy as np

    ws_re = re.compile("[ \t\n\x0b\f\r]+")
    carry_cols = list(carry_cols)
    out_schema = ", ".join(
        [f"{id_col} {df.schema[id_col].dataType.simpleString()}"]
        + [f"{c} {df.schema[c].dataType.simpleString()}" for c in carry_cols]
        + ["fp bigint"]
    )
    weights = [31**j for j in range(k)]

    def gen(batches):
        for pdf in batches:
            texts = pdf[text_col]
            ids = pdf[id_col]
            carry = pdf[carry_cols]
            out_idx: list[int] = []
            out_fp: list[np.ndarray] = []
            for i, t in enumerate(texts):
                if t is None:
                    continue
                norm = ws_re.sub(" ", t.strip(" ").lower())
                n = len(norm)
                if n < k or n - (k - 1) < w:
                    continue
                # vectorized codepoints: UTF-32-LE bytes ARE the
                # codepoint array (one uint32 per Python char)
                codes = np.frombuffer(
                    norm.encode("utf-32-le"), dtype=np.uint32
                ).astype(np.int64)
                h = codes[: n - (k - 1)] * weights[0]
                for j in range(1, k):
                    h = h + codes[j : n - (k - 1) + j] * weights[j]
                mins = np.lib.stride_tricks.sliding_window_view(h, w).min(
                    axis=1
                )
                fps = np.unique(mins)
                out_idx.extend([i] * len(fps))
                out_fp.append(fps)
            if out_idx:
                res = carry.iloc[out_idx].reset_index(drop=True)
                res.insert(0, id_col, ids.iloc[out_idx].reset_index(drop=True))
                res["fp"] = np.concatenate(out_fp)
                yield res
            else:
                res = carry.iloc[[]].reset_index(drop=True)
                res.insert(0, id_col, ids.iloc[[]].reset_index(drop=True))
                res["fp"] = np.array([], dtype=np.int64)
                yield res

    from ..catalog import sized_for_compute

    # sized_for_compute: the per-doc hash/window work is the heavy
    # part; a small export arriving as a handful of splits would run
    # it near-serially (measured 20s -> 6.5s at the 100x probe, whose
    # layout is 4 files on 32 cores)
    return sized_for_compute(df.select(id_col, *carry_cols, text_col)).mapInPandas(
        gen, schema=out_schema
    )


def cdc_chunks(df, text_col: str, id_col: str, w: int = 8, div: int = 64):
    """Content-defined chunking (the gear/Rabin family behind storage
    dedup and chunk-level corpus dedup, cf. FastCDC, Xia et al.
    ATC'16): a boundary is cut after character e whenever the base-31
    polynomial hash of the w-gram ending at e is ≡ 0 (mod div), so
    boundaries depend on CONTENT, not offsets — an insertion early in
    a document shifts every fixed-size block but leaves all later CDC
    chunks (and their hashes) intact. Expected chunk length ≈ div.

    Pure CDC (no min/max clamp) is used deliberately: clamped variants
    make each boundary depend on the previous one — a per-document
    sequential scan — while the pure form is embarrassingly
    position-parallel (the winnowing explode pattern, same hash
    family). Chunk re-extraction via substring is O(doc_len · chunks)
    worst-case on UTF8String offsets, bounded here by the ~1 KB doc
    length, NOT corpus size — at 100 TB cost stays linear in corpus.

    Returns (doc_id, chunk_len, h) — one row per chunk, h the
    portable-48 hash of the chunk text (exact SQL twin).
    """
    from ..operators.dedup import portable_hash48

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    t = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    # localCheckpoint: normalized text + char-code array feed BOTH the
    # position-explode branch and the spans join — unchecked, the scan
    # + regexp + split ran once per branch (round-9 code review; the
    # cross-source sibling had the same shape one level up)
    base = df.select(
        F.col(id_col).alias("doc_id"),
        t.alias("_t"),
        F.transform(F.split(t, ""), F.ascii).alias("_c"),
    ).filter(F.length("_t") >= 1).localCheckpoint()
    pos = base.filter(F.size("_c") >= w).select(
        "doc_id",
        F.size("_c").alias("_n"),
        F.col("_c"),
        F.explode(F.sequence(F.lit(1), F.size("_c") - (w - 1))).alias("p"),
    )
    h = None
    for j in range(w):
        # long arithmetic: 31^7 · 127 overflows int32 at w = 8
        term = F.element_at(F.col("_c"), F.col("p") + j).cast("long") * F.lit(
            31**j
        ).cast("long")
        h = term if h is None else h + term
    cuts = (
        pos.select("doc_id", "_n", h.cast("long").alias("h"), "p")
        .filter((F.col("h") % div == 0) & (F.col("p") + (w - 1) < F.col("_n")))
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(F.col("p") + (w - 1))).alias("cs"))
    )
    spans = (
        base.join(cuts, "doc_id", "left")
        .select(
            "doc_id",
            "_t",
            F.length("_t").alias("n"),
            F.coalesce(F.col("cs"), F.array().cast("array<long>")).alias("cs"),
        )
        .select(
            "doc_id",
            "_t",
            F.explode(
                F.arrays_zip(
                    F.concat(F.array(F.lit(0).cast("long")), F.col("cs")),
                    F.concat(F.col("cs"), F.array(F.col("n").cast("long"))),
                )
            ).alias("z"),
        )
        .select(
            "doc_id",
            F.col("z.0").alias("s"),
            F.col("z.1").alias("e"),
            "_t",
        )
        .filter(F.col("e") > F.col("s"))
    )
    return spans.select(
        "doc_id",
        (F.col("e") - F.col("s")).alias("chunk_len"),
        portable_hash48(
            F.expr("substring(_t, s + 1, e - s)"), "cdc"
        ).alias("h"),
    )


def cdc_chunk_stream(df, text_col: str, id_col: str, carry_cols=(),
                     w: int = 8, div: int = 64):
    """CDC chunking as ONE Arrow ``mapInPandas`` pass: emits
    (id_col, *carry_cols, chunk_len, h) — one row per chunk, no
    shuffle, no join, partition-parallel.

    Exists because the expression form (:func:`cdc_chunks`) pays, per
    run, a localCheckpoint barrier, a per-character interpreted
    ``transform(split(t,''), ascii)`` (HOF = CodegenFallback, the
    shingle_stream diagnosis), a position-explode, a groupBy(doc)
    shuffle to collect cuts, and a join back to the text — all to
    compute a function that is row-local per document. Here the whole
    per-doc pipeline (normalize, rolling base-31 w-gram hash, cut,
    re-slice, portable-48 chunk hash) runs in numpy/hashlib over Arrow
    batches; carry columns ride along, so the caller's doc_id->source
    join disappears too.

    BIT-EQUALITY CONTRACT: output row multiset must equal
    ``cdc_chunks(df, text_col, id_col, w, div)`` joined to
    ``df.select(id_col, *carry_cols)`` exactly — pinned by
    tests/test_operators_golden.py::test_cdc_chunk_stream_matches_expression_spec.
    Semantics mirrored precisely: ``trim`` strips ASCII space 0x20
    only, ``lower`` between trim and the Java ``\\s+`` collapse
    ([ \\t\\n\\x0B\\f\\r], NOT Python's unicode class), char codes are
    code points (utf-32 units = Spark's split('')+ascii), and the
    chunk hash is the first 12 md5 hex digits of ``chunk || '#cdc'``
    (operators.dedup.portable_hash48).
    """
    import hashlib
    import re

    import numpy as np

    ws_re = re.compile("[ \t\n\x0b\f\r]+")
    carry_cols = list(carry_cols)
    sel = [id_col] + carry_cols
    out_schema = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in sel
    ) + ", chunk_len bigint, h bigint"
    pows = [31**j for j in range(w)]
    # portable_hash48 salt is the literal string "cdc" for this family
    salt = b"#cdc"
    FLUSH_ROWS = 131_072

    def gen(batches):
        p = np.array(pows, dtype=np.int64)
        md5 = hashlib.md5
        sw = np.lib.stride_tricks.sliding_window_view
        for pdf in batches:
            texts = pdf[text_col]
            carry = pdf[sel]
            out_idx: list[int] = []
            out_len: list[int] = []
            out_h: list[int] = []
            for i, t in enumerate(texts):
                if t is None:
                    continue
                s = ws_re.sub(" ", t.strip(" ").lower())
                n = len(s)
                if n < 1:
                    continue
                if n >= w:
                    codes = np.frombuffer(
                        s.encode("utf-32-le"), dtype="<u4"
                    ).astype(np.int64)
                    hs = sw(codes, w) @ p
                    cut_idx = np.nonzero(hs % div == 0)[0] + w
                    cuts = cut_idx[cut_idx < n]
                    bounds = [0, *cuts.tolist(), n]
                else:
                    bounds = [0, n]
                for b0, b1 in zip(bounds, bounds[1:]):
                    chunk = s[b0:b1]
                    out_idx.append(i)
                    out_len.append(b1 - b0)
                    out_h.append(
                        int(
                            md5(chunk.encode("utf-8") + salt).hexdigest()[:12],
                            16,
                        )
                    )
                if len(out_idx) >= FLUSH_ROWS:
                    res = carry.iloc[out_idx].reset_index(drop=True)
                    res["chunk_len"] = np.asarray(out_len, dtype=np.int64)
                    res["h"] = np.asarray(out_h, dtype=np.int64)
                    yield res
                    out_idx, out_len, out_h = [], [], []
            if out_idx:
                res = carry.iloc[out_idx].reset_index(drop=True)
                res["chunk_len"] = np.asarray(out_len, dtype=np.int64)
                res["h"] = np.asarray(out_h, dtype=np.int64)
                yield res

    return df.select(*sel, text_col).mapInPandas(gen, schema=out_schema)


def cdc_chunks_stateless(df, text_col: str, id_col: str, w: int = 8, div: int = 64):
    """Row-local twin of ``cdc_chunks`` for STREAMING ingest: no
    groupBy, no window — cut positions are derived inside the row with
    higher-order functions, then chunks explode out, so the projection
    is append-mode stream-safe (the scrub_counts/mm-hash discipline;
    parity gate in tests/test_streaming.py, value-equality gate in
    tests/test_cdc_mmr_mips.py).

    HOF hygiene (the winnowing lesson): every lambda references only
    its own element — per-position hashes come from ``arrays_zip`` of
    w shifted slices (arguments evaluated once per row), positions are
    zipped in as data, and the chunk substring runs AFTER the explode
    at row level. The exploded batch form stays the hot path for
    frozen-corpus passes (codegen'd hash, one explode); this form is
    the ingest path where per-doc cost is bounded by arrival rate."""
    from ..operators.dedup import portable_hash48

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    t = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    base = df.select(
        F.col(id_col).alias("doc_id"),
        t.alias("_t"),
        F.transform(F.split(t, ""), F.ascii).alias("_c"),
    ).filter(F.length("_t") >= 1)
    n = F.length("_t")
    cnt = F.greatest(n - (w - 1), F.lit(0))
    z = F.arrays_zip(*[F.slice("_c", j + 1, cnt) for j in range(w)])
    hs = F.transform(
        z,
        lambda s: sum(
            s[str(j)].cast("long") * F.lit(31**j).cast("long") for j in range(w)
        ),
    )
    # sequence(1, 0) throws (short docs with 1 <= n < w have cnt=0 and
    # must yield ZERO cuts -> one whole-doc chunk, like the batch twin)
    positions = F.when(
        cnt >= 1, F.sequence(F.lit(1), cnt, F.lit(1))
    ).otherwise(F.array().cast("array<int>"))
    pairs = F.arrays_zip(hs, positions)  # fields "0" (hash), "1" (pos p)
    # capturing n (= length(_t)) in the lambda re-evaluates a stored
    # length per element — O(1), unlike capturing the split array
    cuts = F.transform(
        F.filter(
            pairs,
            lambda x: (x["0"] % div == 0) & (x["1"] + (w - 1) < n),
        ),
        lambda x: (x["1"] + (w - 1)).cast("long"),
    )
    spans = base.select(
        "doc_id",
        "_t",
        F.explode(
            F.arrays_zip(
                F.concat(F.array(F.lit(0).cast("long")), cuts),
                F.concat(cuts, F.array(n.cast("long"))),
            )
        ).alias("z"),
    ).select(
        "doc_id",
        F.col("z.0").alias("s"),
        F.col("z.1").alias("e"),
        "_t",
    ).filter(F.col("e") > F.col("s"))
    return spans.select(
        "doc_id",
        (F.col("e") - F.col("s")).alias("chunk_len"),
        portable_hash48(F.expr("substring(_t, s + 1, e - s)"), "cdc").alias("h"),
    )


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


# PII / denylist scrub patterns (RE2/Java common subset — no
# lookaround, no backreferences), shared verbatim by the
# pipe_pii_blocklist_scrub oracle and the streaming ingest projection.
SCRUB_BLOCK = r"\b(customer|vector|stream)\b"
SCRUB_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
SCRUB_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def scrub_counts(docs) -> "DataFrame":
    """Stateless per-document scrub projection — identical over a
    batch table or a file-source stream (no window, no state): hit
    counts per pattern plus the exact character mass a mask-to-empty
    removes, with the fixed masking order (block, email, ipv4)."""
    t = F.lower(F.trim(F.col("text")))
    occ = {
        name: F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0)))
        for name, pat in (
            ("block", SCRUB_BLOCK),
            ("email", SCRUB_EMAIL),
            ("ipv4", SCRUB_IPV4),
        )
    }
    masked = F.regexp_replace(
        F.regexp_replace(F.regexp_replace(t, SCRUB_BLOCK, ""), SCRUB_EMAIL, ""),
        SCRUB_IPV4,
        "",
    )
    return docs.select(
        "doc_id",
        "source",
        occ["block"].alias("occ_block"),
        occ["email"].alias("occ_email"),
        occ["ipv4"].alias("occ_ipv4"),
        (F.length(t) - F.length(masked)).alias("chars_masked"),
    )
