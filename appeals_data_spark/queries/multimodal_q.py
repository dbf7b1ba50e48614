"""Multimodal pipeline queries (training-data ops).

The feature extraction crosses the Python boundary via mapInPandas,
but every emitted value is a pure function of the payload bytes, so
the rollup still carries a full DuckDB oracle (md5/byte-length have
exact SQL twins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.multimodal import (
    as_image_media,
    as_media,
    as_wav_media,
    decode_audio_stats,
    decode_image_stats,
    extract_features,
    resize_media,
    sample_frames,
)
from ..registry import register


@register(
    "mm_decode_image",
    oracle="""
    WITH img AS (
      SELECT source,
             doc_id % 16 + 4 AS w,
             doc_id % 12 + 4 AS h,
             doc_id % 256 AS r, (doc_id * 7) % 256 AS g,
             (doc_id * 13) % 256 AS b
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_imgs,
           CAST(SUM(w) AS BIGINT) AS total_width,
           CAST(SUM(h) AS BIGINT) AS total_height,
           CAST(SUM((r + g + b) * w * h) AS BIGINT) AS total_pixel_sum
    FROM img
    GROUP BY source
    ORDER BY source
    """,
    tags=("MM", "UDF", "CODEC"),
)
def mm_decode_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 1:1 decode path end-to-end with REAL codecs: synthesize a
    genuine image container per document — binary PPM for even
    doc_ids, uncompressed 24-bit BMP for odd (same pixel content,
    different grammar: text header + raw raster vs binary headers +
    bottom-up padded BGR rows) — decode through the decode_media
    per-row mime dispatch (pure-Python parsers, no codec libraries),
    and roll up stats computed from the decoded header and raster.
    The oracle predicts dims and the full-raster pixel sum from the
    doc_id arithmetic — integer-exact and format-independent, so a
    mis-parsed header, missed pad, or truncated raster hash-fails;
    channel order and row order (which a constant-color payload's sum
    cannot see) are pinned byte-level on non-constant images in
    tests/test_multimodal.py."""
    docs = load_table(spark, sf_dir, "documents")
    stats = decode_image_stats(as_image_media(docs, mixed=True))
    return (
        stats.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_imgs"),
            F.sum("width").alias("total_width"),
            F.sum("height").alias("total_height"),
            F.sum("pixel_sum").alias("total_pixel_sum"),
        )
        .orderBy("source")
    )


@register(
    "mm_feature_rollup",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           COUNT(DISTINCT md5(text)) AS n_distinct_payloads,
           CAST(SUM(CASE WHEN octet_length(encode(text)) >= 200
                     THEN 1 ELSE 0 END) AS BIGINT)
             AS n_large
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
    tags=("MM", "UDF", "A1", "X6"),
    bench=True,
)
def mm_feature_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload audit per source: documents -> media table
    (binary blob + typed metadata) -> Arrow-batched mapInPandas
    feature extraction -> rollup. Oracle recomputes byte length and
    md5 in SQL — proving the Python boundary loses nothing."""
    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(as_media(docs))
    return (
        feats.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_bytes").alias("total_bytes"),
            F.countDistinct("digest").alias("n_distinct_payloads"),
            F.sum(F.when(F.col("n_bytes") >= 200, 1).otherwise(0)).alias("n_large"),
        )
        .orderBy("source")
    )


@register(
    "mm_resize_dims",
    oracle="""
    WITH dims AS (
      SELECT source,
             (n_chars % 640) + 32 AS w,
             (n_chars % 480) + 32 AS h
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST(FLOOR(w * LEAST(1.0, 256.0 / GREATEST(w, h)))
                        AS BIGINT)) AS BIGINT)
             AS total_new_width,
           CAST(SUM(CAST(FLOOR(h * LEAST(1.0, 256.0 / GREATEST(w, h)))
                        AS BIGINT)) AS BIGINT)
             AS total_new_height
    FROM dims
    GROUP BY source
    ORDER BY source
    """,
    tags=("MM", "UDF", "X6"),
)
def mm_resize_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail-stage audit: media -> resize_media (cap longer side at
    256, Arrow binary-in/binary-out) -> summed post-resize dimensions
    per source. The oracle recomputes the geometry in SQL; identical
    IEEE doubles on both sides make the truncated ints exact."""
    docs = load_table(spark, sf_dir, "documents")
    resized = resize_media(as_media(docs), max_dim=256)
    return (
        resized.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("new_width").alias("total_new_width"),
            F.sum("new_height").alias("total_new_height"),
        )
        .orderBy("source")
    )


@register(
    "mm_frame_sample",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST(CEIL(CAST((n_chars % 24) + 1 AS DOUBLE) / 4)
                        AS BIGINT)) AS BIGINT)
             AS n_frames_sampled
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
    tags=("MM", "UDF", "X6"),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling: media -> sample_frames (every 4th frame,
    1:N fan-out through mapInPandas) -> frames per source. The oracle
    predicts the fan-out arithmetic (ceil(n_frames / 4) with n_frames =
    n_chars % 24 + 1) straight from the documents table."""
    docs = load_table(spark, sf_dir, "documents")
    frames = sample_frames(as_media(docs), every_k=4)
    return (
        frames.groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_frames_sampled"),
        )
        .orderBy("source")
    )


@register(
    "mm_decode_audio",
    oracle="""
    WITH clip AS (
      SELECT source,
             doc_id % 256 + 16 AS n,
             list_sum(list_transform(range(doc_id % 256 + 16),
               i -> ABS((31 * doc_id + 17 * i) % 65536 - 32768))) AS abs_sum,
             list_max(list_transform(range(doc_id % 256 + 16),
               i -> ABS((31 * doc_id + 17 * i) % 65536 - 32768))) AS peak
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_clips,
           CAST(SUM(n) AS BIGINT) AS total_samples,
           CAST(SUM(abs_sum) AS BIGINT) AS total_abs_amplitude,
           CAST(MAX(peak) AS INT) AS max_peak
    FROM clip
    GROUP BY source
    ORDER BY source
    """,
    tags=("MM", "UDF", "CODEC"),
)
def mm_decode_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audio leg of the decode path with a REAL codec: synthesize a
    genuine RIFF/WAVE PCM16 container per document (8 kHz mono,
    doc_id-derived samples), decode through the decode_media mime
    dispatch (pure-Python chunk-walking parser — no codec libraries),
    and roll up stats computed FROM THE DECODED SAMPLES: counts,
    integer |amplitude| mass, and peak. The oracle predicts all three
    from the doc_id arithmetic — integer-exact, so a mis-walked chunk,
    wrong-endian read, or truncated sample hash-fails.

    Scale shape: identical to mm_decode_image — minimal projection
    before the Arrow boundary, 1:1 partition-preserving mapInPandas,
    then one map-side-combinable rollup."""
    docs = load_table(spark, sf_dir, "documents")
    stats = decode_audio_stats(as_wav_media(docs))
    return (
        stats.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_clips"),
            F.sum("n_samples").alias("total_samples"),
            F.sum("abs_sum").alias("total_abs_amplitude"),
            F.max("max_abs").alias("max_peak"),
        )
        .orderBy("source")
    )


def _pair_report_sql(ham_max: int) -> str:
    """Shared oracle tail for the perceptual near-dedup family: from a
    ``hashes(doc_id, h)`` CTE, the (hash, source) multiplicity rollup,
    8-bit banding over distinct hashes, Hamming confirm at
    ``ham_max``, and exact doc-pair recovery into unordered source
    buckets — mirrors operators.dedup.banded_hash_pair_report term for
    term."""
    return f""", g AS (
      SELECT h, d.source, COUNT(*) AS n
      FROM hashes JOIN documents d USING (doc_id)
      GROUP BY h, d.source
    ), hs AS (
      SELECT DISTINCT h FROM g
    ), bands AS (
      SELECT h, k.k, (h >> (8*k.k)) & 255 AS bv
      FROM hs, (SELECT unnest(range(4)) AS k) k
    ), hp AS (
      SELECT DISTINCT a.h AS ha, b.h AS hb
      FROM bands a JOIN bands b
        ON a.k = b.k AND a.bv = b.bv AND a.h < b.h
    ), hpair AS (
      SELECT ha, hb, bit_count(xor(ha, hb)) AS ham
      FROM hp WHERE bit_count(xor(ha, hb)) <= {ham_max}
    ), contrib AS (
      SELECT LEAST(ga.source, gb.source) AS source_a,
             GREATEST(ga.source, gb.source) AS source_b,
             ga.n * gb.n AS w, hp.ham
      FROM hpair hp
      JOIN g ga ON ga.h = hp.ha
      JOIN g gb ON gb.h = hp.hb
      UNION ALL
      SELECT LEAST(ga.source, gb.source), GREATEST(ga.source, gb.source),
             CASE WHEN ga.source = gb.source THEN ga.n * (ga.n - 1) // 2
                  ELSE ga.n * gb.n END AS w,
             0 AS ham
      FROM g ga JOIN g gb ON ga.h = gb.h AND ga.source <= gb.source
    )
    SELECT source_a, source_b,
           CAST(SUM(w) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN ham = 0 THEN w ELSE 0 END) AS BIGINT)
             AS n_hash_identical,
           MAX(ham) AS max_hamming
    FROM contrib WHERE w > 0
    GROUP BY 1, 2 ORDER BY 1, 2"""


def _hash_source_counts(spark: SparkSession, sf_dir: str, hashes) -> DataFrame:
    """(h, source, n) rollup for the perceptual-dedup family —
    checkpointed once: it feeds the banding, the Hamming confirm, and
    both multiplicity-weight joins."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        hashes.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("h", "source")
        .agg(F.count("*").alias("n"))
        .localCheckpoint()
    )


@register(
    "mm_phash_near_dedup",
    oracle=f"""
    WITH p AS (
      SELECT doc_id, doc_id % 256 AS scene,
             (doc_id // 7) % 16 AS off, (doc_id // 256) % 8 AS pert
      FROM documents
    ), cells AS (
      SELECT doc_id, g.gy, x.gx,
             ((scene*7*(2*x.gx+1) + g.gy*11*(scene+3)) % 199 + off
              + CASE WHEN g.gy = 0 AND (2*x.gx) % 3 = 0
                     THEN pert ELSE 0 END)
           + ((scene*7*(2*x.gx+2) + g.gy*11*(scene+3)) % 199 + off
              + CASE WHEN g.gy = 0 AND (2*x.gx+1) % 3 = 0
                     THEN pert ELSE 0 END) AS c
      FROM p,
           (SELECT unnest(range(4)) AS gy) g,
           (SELECT unnest(range(9)) AS gx) x
    ), bits AS (
      SELECT doc_id, gy, gx, c,
             LEAD(c) OVER (PARTITION BY doc_id, gy ORDER BY gx) AS cn
      FROM cells
    ), hashes AS (
      SELECT doc_id,
             COALESCE(CAST(SUM(CASE WHEN c > cn
                              THEN (1::BIGINT << (gy*8 + gx))
                              ELSE 0 END) AS BIGINT), 0) AS h
      FROM bits WHERE gx < 8 GROUP BY doc_id
    ){_pair_report_sql(8)}
    """,
    tags=("MM", "DEDUP", "LSH", "UDF", "CODEC"),
)
def mm_phash_near_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image near-deduplication — the multimodal twin
    of the simhash/minhash text family: synthesize a REAL gradient
    image per document (mixed PPM/BMP containers), dHash the DECODED
    raster (operators.multimodal.dhash32 — 9x4 block grid, 32 bits),
    band into four 8-bit LSH bands, confirm with Hamming <= 8. The
    corpus contains genuine near-duplicates by construction:
    same-scene documents differ only by a uniform brightness shift
    (dHash-invariant) plus a row-0 perturbation confined to band 0,
    so replicas are guaranteed to collide on bands 1-3 (property gate
    in tests/test_multimodal.py pins both invariances). The oracle
    re-derives every dHash bit closed-form from doc_id arithmetic —
    any mis-parse in either container grammar (BMP pad, bottom-up
    rows, channel order) flips bits and hash-fails.

    Scale shape at 100 TB — the multiplicity-weight formulation
    (operators.dedup.banded_hash_pair_report, shared with the audio
    twin): doc-level pair enumeration is quadratic in replica-group
    size (measured 13.2x on 10x data in the v1 of this query —
    BASELINE.md), so banding and the Hamming confirm run over
    DISTINCT hashes only (bounded by image-content diversity, not
    corpus size) and doc-pair counts are recovered exactly from
    per-(hash, source) multiplicities. The corpus is touched once
    (hash pass + one rollup); everything after is
    distinct-hash-sized."""
    from ..operators.dedup import banded_hash_pair_report
    from ..operators.multimodal import as_gradient_image_media, dhash32

    docs = load_table(spark, sf_dir, "documents")
    g = _hash_source_counts(
        spark, sf_dir, dhash32(as_gradient_image_media(docs))
    )
    return banded_hash_pair_report(g, ham_max=8)


@register(
    "mm_audio_fingerprint_dedup",
    oracle=f"""
    WITH p AS (
      SELECT doc_id, doc_id % 128 AS scene,
             (doc_id // 128) % 3 + 1 AS gain, (doc_id // 7) % 8 AS pert
      FROM documents
    ), env AS (
      SELECT doc_id, f.f,
             16 * ((scene*11 + f.f*f.f) % 199 + 1) * gain
             + CASE WHEN f.f = 0 THEN 6 * pert ELSE 0 END AS e
      FROM p, (SELECT unnest(range(32)) AS f) f
    ), bits AS (
      SELECT doc_id, f, e,
             LEAD(e) OVER (PARTITION BY doc_id ORDER BY f) AS en
      FROM env
    ), hashes AS (
      SELECT doc_id,
             COALESCE(CAST(SUM(CASE WHEN e > en THEN (1::BIGINT << f)
                              ELSE 0 END) AS BIGINT), 0) AS h
      FROM bits WHERE f < 31 GROUP BY doc_id
    ){_pair_report_sql(2)}
    """,
    tags=("MM", "DEDUP", "LSH", "UDF", "CODEC"),
)
def mm_audio_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-deduplication by energy-envelope fingerprint — the
    audio member of the perceptual-dedup family (image twin:
    mm_phash_near_dedup): synthesize a REAL tone WAV per document
    (same-scene docs are the same tone at a different gain plus a
    frame-0 tweak — loudness-unnormalized replicas), decode the RIFF
    container, hash the frame-energy envelope (31 bits, exactly
    gain-invariant on bits 1..30 — operators.multimodal
    .audio_envelope_hash), band and confirm at Hamming <= 2. The
    oracle re-derives every envelope energy closed-form from doc_id
    arithmetic, so a mis-walked RIFF chunk or a sample-order bug
    flips bits and hash-fails; the gain/pert invariances are
    property-gated in tests/test_multimodal.py.

    Scale shape: identical to the image twin — one Arrow decode+hash
    pass over the corpus, one (hash, source) rollup, then the shared
    distinct-hash-sized banding/weighting pipeline
    (operators.dedup.banded_hash_pair_report)."""
    from ..operators.dedup import banded_hash_pair_report
    from ..operators.multimodal import as_tone_wav_media, audio_envelope_hash

    docs = load_table(spark, sf_dir, "documents")
    g = _hash_source_counts(
        spark, sf_dir, audio_envelope_hash(as_tone_wav_media(docs))
    )
    return banded_hash_pair_report(g, ham_max=2)


@register(
    "mm_video_shingle_dedup",
    oracle="""
    WITH p AS (
      SELECT doc_id, doc_id % 64 AS vscene, (doc_id // 64) % 4 AS offv
      FROM documents
    ), fr AS (
      SELECT doc_id, k.k, (vscene*13 + (offv + k.k)*29) % 251 AS fscene
      FROM p, (SELECT unnest(range(8)) AS k) k
    ), cells AS (
      SELECT doc_id, k, g.gy, x.gx,
             ((fscene*7*(2*x.gx+1) + g.gy*11*(fscene+3)) % 199)
           + ((fscene*7*(2*x.gx+2) + g.gy*11*(fscene+3)) % 199) AS c
      FROM fr,
           (SELECT unnest(range(4)) AS gy) g,
           (SELECT unnest(range(9)) AS gx) x
    ), bits AS (
      SELECT doc_id, k, gy, gx, c,
             LEAD(c) OVER (PARTITION BY doc_id, k, gy ORDER BY gx) AS cn
      FROM cells
    ), fh AS (
      SELECT doc_id, k,
             COALESCE(CAST(SUM(CASE WHEN c > cn
                              THEN (1::BIGINT << (gy*8 + gx))
                              ELSE 0 END) AS BIGINT), 0) AS h
      FROM bits WHERE gx < 8 GROUP BY doc_id, k
    ), seqs AS (
      SELECT doc_id,
             array_to_string(list(CAST(h AS VARCHAR) ORDER BY k), ',') AS sk,
             list(h ORDER BY k) AS seq
      FROM fh GROUP BY doc_id
    ), g AS (
      SELECT sk, d.source, COUNT(*) AS n, ANY_VALUE(s.seq) AS seq
      FROM seqs s JOIN documents d USING (doc_id)
      GROUP BY sk, d.source
    ), ds AS (
      SELECT sk, ANY_VALUE(seq) AS seq FROM g GROUP BY sk
    ), grams AS (
      SELECT DISTINCT sk, seq[k.k] AS ha, seq[k.k + 1] AS hb
      FROM ds, (SELECT unnest(range(1, 8)) AS k) k
    ), prs AS (
      SELECT a.sk AS ska, b.sk AS skb, COUNT(*) AS n_common
      FROM grams a JOIN grams b
        ON a.ha = b.ha AND a.hb = b.hb AND a.sk < b.sk
      GROUP BY 1, 2 HAVING COUNT(*) >= 3
    ), contrib AS (
      SELECT LEAST(ga.source, gb.source) AS source_a,
             GREATEST(ga.source, gb.source) AS source_b,
             ga.n * gb.n AS w, pr.n_common, 0 AS ident
      FROM prs pr
      JOIN g ga ON ga.sk = pr.ska
      JOIN g gb ON gb.sk = pr.skb
      UNION ALL
      SELECT LEAST(ga.source, gb.source), GREATEST(ga.source, gb.source),
             CASE WHEN ga.source = gb.source THEN ga.n * (ga.n - 1) // 2
                  ELSE ga.n * gb.n END AS w,
             7 AS n_common, 1 AS ident
      FROM g ga JOIN g gb ON ga.sk = gb.sk AND ga.source <= gb.source
    )
    SELECT source_a, source_b,
           CAST(SUM(w) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN ident = 1 THEN w ELSE 0 END) AS BIGINT)
             AS n_identical,
           MAX(n_common) AS max_common_grams
    FROM contrib WHERE w > 0
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("MM", "DEDUP", "LSH", "UDF", "CODEC"),
)
def mm_video_shingle_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-deduplication by frame-hash shingling — the moving-
    image member of the perceptual-dedup family (image:
    mm_phash_near_dedup, audio: mm_audio_fingerprint_dedup), robust to
    TEMPORAL CROPS: a video is a concatenated binary-PPM frame stream
    (self-delimiting P6 frames — the decode is a genuine container
    walk, operators.multimodal.decode_ppm_stream), each decoded frame
    is dHashed, and two videos match when they share >= 3 consecutive
    frame-hash 2-grams — exactly how a trimmed re-upload of the same
    clip is caught (the corpus contains them by construction:
    same-scene docs start 0-3 frames apart and share 4-7 of the 7
    grams; a uniform brightness shift cancels in every frame hash).
    The oracle re-derives every frame hash closed-form from doc_id
    arithmetic, so a mis-delimited frame, channel swap, or
    order-scrambling bug breaks the hash match.

    Scale shape: one Arrow decode+hash pass over the corpus, one
    (sequence, source) multiplicity rollup, then everything is
    DISTINCT-SEQUENCE-sized (bounded by content diversity — the gram
    self-join and pair recovery never touch doc-level pairs, the
    banded_hash_pair_report discipline applied to sequences)."""
    from ..operators.multimodal import as_video_media, video_hash_seq

    docs = load_table(spark, sf_dir, "documents")
    seqs = video_hash_seq(as_video_media(docs))
    sk = F.array_join(
        F.transform("seq", lambda h: h.cast("string")), ","
    ).alias("sk")
    g = (
        seqs.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy(sk, "source")
        .agg(F.count("*").alias("n"), F.any_value("seq").alias("seq"))
        .localCheckpoint()  # feeds grams, the pair join, and both weight sides
    )
    ds = g.select("sk", "seq").dropDuplicates(["sk"])
    zipped = F.arrays_zip(F.slice("seq", 1, 7), F.slice("seq", 2, 7))
    grams = (
        ds.select("sk", F.explode(zipped).alias("bg"))
        .select(
            "sk", F.col("bg.0").alias("ha"), F.col("bg.1").alias("hb")
        )
        .dropDuplicates(["sk", "ha", "hb"])
    )
    a, b = grams.alias("a"), grams.alias("b")
    prs = (
        a.join(
            b,
            (F.col("a.ha") == F.col("b.ha"))
            & (F.col("a.hb") == F.col("b.hb"))
            & (F.col("a.sk") < F.col("b.sk")),
        )
        .groupBy(F.col("a.sk").alias("ska"), F.col("b.sk").alias("skb"))
        .agg(F.count("*").alias("n_common"))
        .filter(F.col("n_common") >= 3)
    )
    ga = g.select(
        F.col("sk").alias("ska"), F.col("source").alias("sa"),
        F.col("n").alias("na"),
    )
    gb = g.select(
        F.col("sk").alias("skb"), F.col("source").alias("sb"),
        F.col("n").alias("nb"),
    )
    cross = (
        prs.join(ga, "ska")
        .join(gb, "skb")
        .select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
            (F.col("na") * F.col("nb")).alias("w"),
            "n_common",
            F.lit(0).alias("ident"),
        )
    )
    gs = g.alias("x").join(
        g.alias("y"),
        (F.col("x.sk") == F.col("y.sk"))
        & (F.col("x.source") <= F.col("y.source")),
    )
    same = gs.select(
        F.least("x.source", "y.source").alias("source_a"),
        F.greatest("x.source", "y.source").alias("source_b"),
        F.when(
            F.col("x.source") == F.col("y.source"),
            F.shiftright(F.col("x.n") * (F.col("x.n") - 1), 1),
        )
        .otherwise(F.col("x.n") * F.col("y.n"))
        .cast("long")
        .alias("w"),
        F.lit(7).cast("long").alias("n_common"),
        F.lit(1).alias("ident"),
    )
    contrib = cross.unionByName(same).filter(F.col("w") > 0)
    return (
        contrib.groupBy("source_a", "source_b")
        .agg(
            F.sum("w").cast("long").alias("n_pairs"),
            F.sum(F.when(F.col("ident") == 1, F.col("w")).otherwise(0))
            .cast("long")
            .alias("n_identical"),
            F.max("n_common").alias("max_common_grams"),
        )
        .orderBy("source_a", "source_b")
    )
