"""ANN quality audit: recall of the approximate searchers against
brute-force ground truth on the fixture embeddings.

All hash families are deterministic, so recall on a fixed fixture is a
constant — the thresholds sit just below the measured values and exist
to catch silent quality regressions (a broken hyperplane seed, a probe
bug), not statistical noise. The embeddings are near-random 64-dim
vectors (weak neighborhood structure), which bounds achievable recall;
real corpora with cluster structure fare better at the same settings.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from appeals_data_spark.catalog import load_table
from appeals_data_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_topk,
    pq_adc_topk,
    pq_codebooks,
    pq_encode,
)

from conftest import SF_SMOKE

K = 5
DIM = 64


@pytest.fixture(scope="module")
def ground_truth(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    truth = {
        (r.query_id, r.corpus_id)
        for r in brute_force_topk(emb, queries, k=K).collect()
    }
    return emb, queries, truth


def _recall(found, truth) -> float:
    return len(found & truth) / len(truth)


def test_ivf_recall(ground_truth):
    emb, queries, truth = ground_truth
    found = {
        (r.query_id, r.corpus_id)
        for r in ivf_topk(emb, queries, k=K, nprobe=2).collect()
    }
    assert _recall(found, truth) >= 0.35  # measured 0.40 (nprobe=2 of ~10 cells)


def test_ivf_recall_nprobe1(ground_truth):
    # The cheapest setting still has to find something: a recall-0 run
    # here means centroid assignment or the probe join broke outright.
    emb, queries, truth = ground_truth
    found = {
        (r.query_id, r.corpus_id)
        for r in ivf_topk(emb, queries, k=K, nprobe=1).collect()
    }
    assert _recall(found, truth) >= 0.10  # measured 0.15 (1 of ~10 cells)


def test_ivf_recall_rises_with_nprobe(ground_truth):
    emb, queries, truth = ground_truth
    r2 = _recall(
        {(r.query_id, r.corpus_id) for r in ivf_topk(emb, queries, k=K, nprobe=2).collect()},
        truth,
    )
    r4 = _recall(
        {(r.query_id, r.corpus_id) for r in ivf_topk(emb, queries, k=K, nprobe=4).collect()},
        truth,
    )
    assert r4 >= r2  # probing more cells can only add candidates
    assert r4 >= 0.6  # measured 0.65


def test_lsh_recall_multi_table(ground_truth):
    emb, queries, truth = ground_truth
    found = {
        (r.query_id, r.corpus_id)
        for r in lsh_topk(
            emb, queries, DIM, k=K, n_planes=4, n_tables=4
        ).collect()
    }
    assert _recall(found, truth) >= 0.45  # measured 0.525


def _pq_found(emb, queries, m, sub, k):
    cb = pq_codebooks(emb, sub=sub).localCheckpoint()
    codes = pq_encode(emb, cb, m=m, sub=sub)
    return {
        (r.query_id, r.corpus_id)
        for r in pq_adc_topk(codes, cb, queries, m=m, sub=sub, k=k).collect()
    }


def test_pq_adc_recall_floor(ground_truth):
    # Pure compressed-domain top-5 at 16x4 blocks: the random fixture
    # is PQ's worst case; the gate catches a broken encode/LUT, not a
    # quality promise.
    emb, queries, truth = ground_truth
    assert _recall(_pq_found(emb, queries, 16, 4, K), truth) >= 0.15  # measured 0.20


def test_pq_shortlist_rerank_recall(ground_truth):
    # The production shape: ADC shortlist (32x2 blocks, 50 deep) must
    # contain most of the exact top-5 — rerank recall equals shortlist
    # containment since rerank scoring is exact.
    emb, queries, truth = ground_truth
    shortlist = _pq_found(emb, queries, 32, 2, 50)
    assert len(shortlist & truth) / len(truth) >= 0.8  # measured 0.875


def test_pq_finer_blocks_add_recall(ground_truth):
    # Halving block width (8->4->2 dims per code) can only tighten the
    # quantization; recall at fixed depth should be monotone.
    emb, queries, truth = ground_truth
    r8 = _recall(_pq_found(emb, queries, 8, 8, 50), truth)
    r2 = _recall(_pq_found(emb, queries, 32, 2, 50), truth)
    assert r2 >= r8


def test_lsh_tables_add_recall(ground_truth):
    emb, queries, truth = ground_truth
    single = _recall(
        {
            (r.query_id, r.corpus_id)
            for r in lsh_topk(emb, queries, DIM, k=K, n_planes=4, n_tables=1).collect()
        },
        truth,
    )
    multi = _recall(
        {
            (r.query_id, r.corpus_id)
            for r in lsh_topk(emb, queries, DIM, k=K, n_planes=4, n_tables=4).collect()
        },
        truth,
    )
    assert multi >= single  # candidate union can only grow


@pytest.fixture(scope="module")
def rrf_lists(spark):
    """Component top-20 lists (recomputed here from the shared scoring
    helpers) plus the fused output of text_hybrid_rrf_topk itself."""
    from appeals_data_spark.queries.textops_q import (
        _BM25_TERMS,
        _bm25_doc_scores,
    )
    from appeals_data_spark.registry import all_queries

    d = load_table(spark, SF_SMOKE, "documents")
    emb = load_table(spark, SF_SMOKE, "embeddings")
    lex = [
        r.doc_id
        for r in _bm25_doc_scores(d, _BM25_TERMS)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(20)
        .collect()
    ]
    dense = [
        r.corpus_id
        for r in brute_force_topk(emb, emb.filter(F.col("vec_id") == 0), k=20)
        .orderBy("rank")
        .collect()
    ]
    fused = all_queries()["text_hybrid_rrf_topk"].builder(
        spark, SF_SMOKE
    ).collect()
    return lex, dense, fused


def test_rrf_matches_python_rederivation(rrf_lists):
    # Fusion-quality gate (the RRF analog of the recall gates above):
    # re-derive Cormack RRF in pure Python from the component rank
    # lists and require the Spark fused top-10 to match id-for-id in
    # order. Any fusion bug — wrong k constant, missed outer-join arm,
    # decimal drift flipping a tie — lands here.
    lex, dense, fused = rrf_lists
    score: dict[int, float] = {}
    for lst in (lex, dense):
        for i, doc in enumerate(lst, start=1):
            score[doc] = score.get(doc, 0.0) + round(1e6 / (60 + i), 6)
    expect = sorted(score, key=lambda d: (-score[d], d))[:10]
    assert [r.doc_id for r in fused] == expect


def test_rrf_recall_dominates_components(rrf_lists):
    # RRF@10 recall vs each retriever's brute-force/exact top-5 ground
    # truth must be >= that of EITHER single retriever's top-10 (which
    # scores 0 on the other modality's truth). On this fixture the two
    # top-20s are disjoint, so the fused list is the exact interleave:
    # recall is 1.0 on both truths — gate at full containment.
    lex, dense, fused = rrf_lists
    ids = {r.doc_id for r in fused}
    assert set(lex[:5]) <= ids  # lexical truth: recall 1.0 >= lex-only
    assert set(dense[:5]) <= ids  # dense truth: recall 1.0 >= dense-only
    # theorem: a doc in both component top-10s outranks every
    # single-list doc (2/(60+10+k) > 1/(60+1)), so agreement docs can
    # never be fused out — vacuous on the disjoint fixture, live the
    # moment the fixture gains lexical/dense overlap
    assert (set(lex[:10]) & set(dense[:10])) <= ids
    # both modalities must survive fusion (a dead retriever arm would
    # fill the fused list from one side only)
    assert sum(1 for r in fused if r.in_lex) >= 3
    assert sum(1 for r in fused if r.in_dense) >= 3


def test_ivfpq_composed_recall_floor(spark, ground_truth):
    # The composed production shape (vec_ivfpq_topk: coarse-quantizer
    # cell pruning x compressed-domain ADC scoring) multiplies two
    # approximations; gate its end-to-end recall so a probe-count or
    # codebook regression can't pass silently behind the green gates of
    # its two halves.
    from appeals_data_spark.registry import all_queries

    _, _, truth = ground_truth
    found = {
        (r.query_id, r.corpus_id)
        for r in all_queries()["vec_ivfpq_topk"].builder(spark, SF_SMOKE).collect()
    }
    assert _recall(found, truth) >= 0.175  # measured 0.225 (nprobe=3, 16x4 PQ)


def test_ivfpq_exact_rerank_dominates_adc(spark, ground_truth):
    # Exact scoring over the SAME probed cells (ivf_topk nprobe=3) must
    # recall at least as much as compressed-domain ADC over those cells
    # — quantization can only lose candidates on this fixed fixture, so
    # a flip means the ADC LUT or the cell pruning changed.
    from appeals_data_spark.registry import all_queries

    emb, queries, truth = ground_truth
    adc = _recall(
        {
            (r.query_id, r.corpus_id)
            for r in all_queries()["vec_ivfpq_topk"].builder(spark, SF_SMOKE).collect()
        },
        truth,
    )
    exact = _recall(
        {
            (r.query_id, r.corpus_id)
            for r in ivf_topk(emb, queries, k=K, nprobe=3).collect()
        },
        truth,
    )
    assert exact >= adc  # measured 0.50 vs 0.225


def test_pq_recall_report_floors(spark):
    # The driver-facing certificate (vec_pq_recall_report) must show
    # the same floors the arm gates above assert — aggregated across
    # the 8 probe queries, per arm. A breach here means a lossy-
    # quantizer regression reached the shipped report.
    from appeals_data_spark.registry import all_queries

    rows = all_queries()["vec_pq_recall_report"].builder(
        spark, SF_SMOKE
    ).collect()
    by_arm: dict[str, list[int]] = {}
    for r in rows:
        by_arm.setdefault(r.arm, []).append(r.n_hit)
    assert set(by_arm) == {"ivfpq", "pq_adc", "pq_rerank"}
    recall = {arm: sum(v) / (5 * len(v)) for arm, v in by_arm.items()}
    assert recall["ivfpq"] >= 0.175, recall  # measured 0.225
    assert recall["pq_adc"] >= 0.15, recall  # measured 0.20
    assert recall["pq_rerank"] >= 0.8, recall  # measured 0.875
    # exact re-rank over an ADC shortlist can only beat pure ADC
    assert recall["pq_rerank"] >= recall["pq_adc"], recall


def test_sq8_recall_floor(ground_truth):
    # 8-bit scalar quantization barely perturbs squared-L2 ordering
    # even on the near-random fixture — recall should be near-exact
    # (measured 1.0); the floor catches a broken bounds/encode/dequant
    # path, where recall collapses toward the PQ-ADC ~0.2 regime.
    from appeals_data_spark.operators.similarity import (
        sq_adc_topk,
        sq_bounds,
        sq_encode,
    )

    emb, queries, truth = ground_truth
    bounds = sq_bounds(emb).localCheckpoint()
    codes = sq_encode(emb, bounds, dim=DIM)
    found = {
        (r.query_id, r.corpus_id)
        for r in sq_adc_topk(codes, bounds, queries, dim=DIM, k=K).collect()
    }
    assert _recall(found, truth) >= 0.9


def test_sq_l2_9dp_arrow_bit_equals_hof_fold(spark):
    """pair_scores_arrow's ``sq_l2_9dp`` metric (the sq_adc_topk pair
    scorer, round 12) must be BIT-equal to the JVM fold it replaced:
    per dimension round((x-y)*(x-y)*1e9, 0) cast long, summed as
    longs. The corpus is engineered so that many per-dimension terms
    land within ~1e-7 of a .5 decimal boundary — inside the Arrow
    path's 1e-3 suspect window — so the exact-tie decimal re-judge is
    exercised against Spark's BigDecimal HALF_UP on the same doubles,
    not just the floor(t+0.5) fast path."""
    import math

    from pyspark.sql import functions as F

    from appeals_data_spark.functions.vectors import pair_scores_arrow

    dim = 8
    rows = [(0, [0.0] * dim)]  # the query: all zeros, diffs == corpus dims
    for i in range(1, 120):
        # dims hit (k + 0.5)/1e9 squared-distance terms almost exactly
        vec = [
            math.sqrt((i * dim + j + 0.5) / 1.0e9) for j in range(dim)
        ]
        rows.append((i, vec))
    for i in range(120, 180):  # plain far-from-tie values too
        rows.append((i, [((i * 7 + j * 13) % 101 - 50) / 7.0 for j in range(dim)]))
    df = spark.createDataFrame(rows, "id long, v array<double>")
    q = df.filter(F.col("id") == 0).select(
        F.col("id").alias("qid"), F.col("v").alias("q_vec")
    )
    pairs = df.select(F.col("id").alias("cid"), F.col("v").alias("c_vec")).crossJoin(
        F.broadcast(q)
    )
    hof_ad = F.aggregate(
        F.zip_with(
            F.col("q_vec"),
            F.col("c_vec"),
            lambda x, y: F.round((x - y) * (x - y) * F.lit(1.0e9), 0).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    hof = {
        (r.qid, r.cid): r.s
        for r in pairs.select("qid", "cid", hof_ad.alias("s")).collect()
    }
    arw = {
        (r.qid, r.cid): r.s
        for r in pair_scores_arrow(
            pairs, "q_vec", "c_vec", keep=["qid", "cid"], out="s",
            metric="sq_l2_9dp",
        ).collect()
    }
    assert hof == arw


def test_pair_scores_arrow_bit_equals_hof_fold(spark):
    """The Arrow hot path must be BIT-equal to the JVM HOF fold on the
    same pairs; the missing-vector case stays NULL, and the degenerate
    zero-norm cosine yields NULL (where the ANSI HOF fold throws)."""
    from pyspark.sql import functions as F

    from appeals_data_spark.functions.vectors import (
        cosine,
        dot,
        pair_scores_arrow,
    )

    rows = []
    for i in range(200):
        rows.append((i, [((i * 7 + j * 13) % 101 - 50) / 7.0 for j in range(16)]))
    # NOTE a zero-norm vector is NOT tested for cosine: under ANSI mode
    # (Spark 4 default, the engine's sessions) the HOF fold's division
    # THROWS on it, while the Arrow path yields NaN — the engine's
    # corpora never carry zero embeddings, and NaN-sorts-last is the
    # saner behavior if one ever appears.
    rows.append((900, [0.0] * 16))  # dot: exact 0.0 both paths
    rows.append((901, None))  # missing vector -> NULL score
    df = spark.createDataFrame(rows, "id long, v array<float>")
    q = df.filter(F.col("id") < 3).select(
        F.col("id").alias("qid"), F.col("v").alias("q_vec")
    )
    pairs = df.select(F.col("id").alias("cid"), F.col("v").alias("c_vec")).crossJoin(
        F.broadcast(q)
    )
    for metric, col_fn in (("cosine", cosine), ("dot", dot)):
        hof_pairs = (
            pairs.filter(F.col("cid") != 900) if metric == "cosine" else pairs
        )
        hof = {
            (r.qid, r.cid): r.s
            for r in hof_pairs.select(
                "qid", "cid", col_fn(F.col("q_vec"), F.col("c_vec")).alias("s")
            ).collect()
        }
        arw = {
            (r.qid, r.cid): r.s
            for r in pair_scores_arrow(
                pairs, "q_vec", "c_vec", keep=["qid", "cid"], out="s", metric=metric
            ).collect()
        }
        assert set(hof) <= set(arw)
        n_null = 0
        for k, hv in hof.items():
            av = arw[k]
            if hv is None:
                assert av is None, k
                n_null += 1
            else:
                assert hv == av, (k, hv, av)  # exact float equality
        assert n_null == 3  # the None-vector row against 3 queries
        if metric == "cosine":
            # the zero-norm row: the Arrow path yields NULL (the
            # computed NaN crosses the Arrow boundary as null; the
            # ANSI HOF fold would THROW on the same input)
            for qid in (0, 1, 2):
                assert arw[(qid, 900)] is None
        else:
            for qid in (0, 1, 2):
                assert arw[(qid, 900)] == 0.0


def test_assign_to_centroids_arrow_bit_equals_hof_fold(spark):
    """The Arrow assigner must reproduce the HOF fold/comparator
    assignments bit-for-bit — rank 1 (strict-> first-wins) and
    rank_max>1 ((cos DESC, label ASC) stable order)."""
    from pyspark.sql import functions as F

    from appeals_data_spark.operators.similarity import (
        assign_to_centroids,
        centroid_struct_array,
        nearest_centroid_best,
        _topk_centroid_structs,
    )

    corpus = spark.createDataFrame(
        [
            (i, [((i * 11 + j * 3) % 97 - 48) / 9.0 for j in range(8)])
            for i in range(300)
        ],
        "vec_id long, embedding array<float>",
    )
    cents = spark.createDataFrame(
        [
            (c, [((c * 5 + j * 7) % 23 - 11) / 4.0 for j in range(8)])
            for c in range(6)
        ],
        "c_label int, cvec array<double>",
    )

    got1 = {
        r.vec_id: r.c_label
        for r in assign_to_centroids(corpus, cents, 1).collect()
    }
    joined = corpus.crossJoin(F.broadcast(centroid_struct_array(cents)))
    want1 = {
        r.vec_id: r.c_label
        for r in joined.select(
            "vec_id",
            nearest_centroid_best(F.col("_cents"), F.col("embedding"), "int")[
                "c_label"
            ].alias("c_label"),
        ).collect()
    }
    assert got1 == want1 and len(got1) == 300

    got3 = {
        (r.vec_id, r.c_rank): r.c_label
        for r in assign_to_centroids(corpus, cents, 3).collect()
    }
    top = _topk_centroid_structs(F.col("_cents"), F.col("embedding"), 3)
    want3 = {
        (r.vec_id, r._p + 1): r.c_label
        for r in joined.select(
            "vec_id", F.posexplode(top).alias("_p", "_s")
        ).select(
            "vec_id", "_p", F.col("_s")["c_label"].alias("c_label")
        ).collect()
    }
    assert got3 == want3 and len(got3) == 900


def test_pq_encode_arrow_bit_equals_hof(spark):
    """The Arrow PQ encoder must reproduce the HOF reference's codes
    bit-for-bit: the (ROUND(d, 6) ASC, code ASC) struct-min winner per
    (vector, block) — including the fixture corpus AND crafted
    near-ties that force the exact decimal-rounding branch."""
    from appeals_data_spark.operators.similarity import pq_encode_hof

    # 1. fixture corpus, both production settings
    emb = load_table(spark, SF_SMOKE, "embeddings")
    for m, sub in ((16, 4), (32, 2)):
        cb = pq_codebooks(emb, sub=sub).localCheckpoint()
        want = {
            (r.vec_id, r.block): r.code
            for r in pq_encode_hof(emb, cb, m=m, sub=sub).collect()
        }
        got = {
            (r.vec_id, r.block): r.code
            for r in pq_encode(emb, cb, m=m, sub=sub).collect()
        }
        assert got == want and len(got) == emb.count() * m

    # 2. crafted ties: codes 3 and 7 exactly equidistant from the
    # vector (raw doubles equal) -> rounding can't separate them, the
    # code tiebreak must pick 3; plus a sub-1e-6 near-tie where the
    # rounded values DO decide (forces the Decimal re-judge path)
    corpus = spark.createDataFrame(
        [
            (0, [1.0, 2.0]),      # equidistant between (0.5,2.0) and (1.5,2.0)
            (1, [1.0, 2.0 + 4e-7]),  # near-tie, decided at the 6th dp
            (2, None),            # NULL vector -> lowest code per block
        ],
        "vec_id long, embedding array<float>",
    )
    cb2 = spark.createDataFrame(
        [
            (0, 3, [0.5, 2.0]),
            (0, 7, [1.5, 2.0]),
            (0, 9, [9.0, 9.0]),
        ],
        "block int, code int, subvec array<double>",
    )
    want2 = {
        (r.vec_id, r.block): r.code
        for r in pq_encode_hof(
            corpus.filter("embedding IS NOT NULL"), cb2, m=1, sub=2
        ).collect()
    }
    got2 = {
        (r.vec_id, r.block): r.code
        for r in pq_encode(corpus, cb2, m=1, sub=2).collect()
    }
    assert want2[(0, 0)] == 3  # exact tie -> lowest code
    for k, v in want2.items():
        assert got2[k] == v, (k, got2[k], v)
    assert got2[(2, 0)] == 3  # NULL vector: all-NULL d -> lowest code
