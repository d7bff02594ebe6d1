"""QPP predictors (P1-P9), correlation kernels (C1-C11), stochastic
swappers (H5/H6) — vs hand-computed values and brute-force definitions."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_msmarco_spark.operators import correlation as C
from lucene_msmarco_spark.operators import qpp as Q
from lucene_msmarco_spark.operators import stochastic as S
from lucene_msmarco_spark.operators.index import assign_doc_ids, build_index
from lucene_msmarco_spark.operators.retrieval import compile_queries, search
from lucene_msmarco_spark.sources.transcripts import transcripts_local

rng = np.random.default_rng(7)


# ---------------------------------------------------------------------------
# correlation kernels
# ---------------------------------------------------------------------------

def test_kendall_tau_brute_force():
    for _ in range(5):
        x = rng.integers(0, 8, size=12).astype(float)  # with ties
        y = rng.integers(0, 8, size=12).astype(float)
        n = len(x)
        conc = disc = tx = ty = 0
        for i in range(n):
            for j in range(i + 1, n):
                sx = np.sign(x[i] - x[j])
                sy = np.sign(y[i] - y[j])
                if sx == 0:
                    tx += 1
                if sy == 0:
                    ty += 1
                if sx * sy > 0:
                    conc += 1
                elif sx * sy < 0:
                    disc += 1
        n0 = n * (n - 1) / 2
        expect = (conc - disc) / np.sqrt((n0 - tx) * (n0 - ty))
        assert C.kendall_tau(x, y) == pytest.approx(expect)


def test_spearman_is_pearson_of_avg_ranks():
    x = np.array([1.0, 2.0, 2.0, 5.0, 3.0])
    y = np.array([0.5, 0.1, 0.8, 0.8, 0.2])
    # avg ranks: x -> [1, 2.5, 2.5, 5, 4]; y -> [3, 1, 4.5, 4.5, 2]
    expect = np.corrcoef([1, 2.5, 2.5, 5, 4], [3, 1, 4.5, 4.5, 2])[0, 1]
    assert C.spearman_rho(x, y) == pytest.approx(expect)


def test_sare_reference_main_case():
    """Golden from correlation/SARE.java:65-70 inputs, hand-traced."""
    gt = [0.32, 0.15, 0.67, 0.08, 0.96, 0.45]
    pred = [0.22, 0.75, 0.47, 0.83, 0.16, 0.05]
    assert C.sare(gt, pred) == pytest.approx(16 / 36)
    assert C.sarc(gt, pred) == pytest.approx(1 - 16 / 36)


def test_rbo_brute_force_and_bounds():
    def brute(a, b, k, p):
        agg = 0.0
        for d in range(1, k + 1):
            ov = len(set(a[:d]) & set(b[:d]))
            agg += ov / d * p ** (d - 1)
        return (1 - p) * agg

    a = [1, 3, 4, 5, 8, 9]
    b = [2, 3, 5, 6, 8, 10]
    assert C.rbo(a, b, k=6, p=0.8) == pytest.approx(brute(a, b, 6, 0.8))
    assert C.rbo(a, a, k=6, p=0.9) == pytest.approx(
        brute(a, a, 6, 0.9)
    )
    # identical lists at infinite depth converge to 1; at finite k < 1
    assert 0 < C.rbo(a, a) < 1.0001
    assert C.rbo(a, [77, 88, 99, 111, 222, 333]) == 0.0


def test_rank_distance_sorted_b_quirk():
    # A = [10, 30, 20]; B = [30, 10, 20] -> sorted B = [10, 20, 30]
    # posA(10)=0 posB=0; posA(30)=1 posB=2; posA(20)=2 posB=1
    n = 3
    expect = np.sqrt(((0 / n) ** 2 + (1 / n) ** 2 + (1 / n) ** 2) / n)
    assert C.rank_distance([10, 30, 20], [30, 10, 20]) == pytest.approx(
        expect
    )


def test_rmse_minmax_quirk():
    gt = [0.1, 0.5, 0.9]
    pred_small = [0.2, 0.4, 0.8]   # max <= 1: raw RMSE
    assert C.rmse(gt, pred_small) == pytest.approx(
        float(np.sqrt(np.mean((np.array(gt) - np.array(pred_small)) ** 2)))
    )
    pred_big = [2.0, 4.0, 8.0]     # max > 1: min-max first -> [0,1/3,1]
    norm = np.array([0.0, 1 / 3, 1.0])
    assert C.rmse(gt, pred_big) == pytest.approx(
        float(np.sqrt(np.mean((np.array(gt) - norm) ** 2)))
    )


def test_pairwise_and_quantized():
    gt = [0.1, 0.2, 0.3, 0.4]
    assert C.pairwise_accuracy(gt, gt) == 1.0
    assert C.pairwise_accuracy(gt, list(reversed(gt))) == 0.0
    assert C.quantized_strict_match(gt, gt, 4) == 1.0
    assert C.quantized_sim(gt, gt, 4) == 1.0
    assert C.jaccard({1, 2, 3}, {2, 3, 4}) == pytest.approx(2 / 4)


def test_df_forms_match_kernels(spark):
    run_a = [("q1", d, r + 1, 10.0 - r) for r, d in enumerate([5, 1, 9, 3])]
    run_b = [("q1", d, r + 1, 10.0 - r) for r, d in enumerate([9, 5, 3, 7])]
    schema = "qid string, doc_id long, rank int, score double"
    da = spark.createDataFrame(run_a, schema)
    db = spark.createDataFrame(run_b, schema)
    got_rd = C.rank_distance_df(da, db).collect()[0]["rank_dist"]
    assert got_rd == pytest.approx(
        C.rank_distance([5, 1, 9, 3], [9, 5, 3, 7])
    )
    got_rbo = C.rbo_df(da, db).collect()[0]["rbo"]
    assert got_rbo == pytest.approx(C.rbo([5, 1, 9, 3], [9, 5, 3, 7]))


# ---------------------------------------------------------------------------
# QPP on a real (small) index
# ---------------------------------------------------------------------------

QUERIES = [
    ("q1", "ricufex kekegra report"),
    ("q2", "zedzedwi rigrasto bicubi cugramo"),
    ("q3", "tamori polgrake verlu"),
]


@pytest.fixture(scope="module")
def ctx(spark):
    pdf = transcripts_local(300, seed=42)
    docs = assign_doc_ids(spark.createDataFrame(pdf), ["conv_id", "turn_idx"])
    idx = build_index(docs, analyzer="english")
    qdf = spark.createDataFrame(QUERIES, "qid string, qtext string")
    run = search(idx, qdf, model="bm25", k=50).cache()
    qt = compile_queries(qdf, "english")
    idf = Q.query_idf_stats(qt, idx.term_stats, idx.stats.n_docs).cache()
    return idx, qdf, run, qt, idf


def test_idf_stats_quirks(spark, ctx):
    idx, *_ = ctx
    n = float(idx.stats.n_docs)
    qt = spark.createDataFrame(
        [("qx", "ricufex", 1.0), ("qx", "zzzoov", 1.0)],
        "qid string, term string, qtf double",
    )
    row = Q.query_idf_stats(qt, idx.term_stats, idx.stats.n_docs).collect()[0]
    df_r = (
        idx.term_stats.filter(F.col("term") == "ricufex")
        .collect()[0]["df"]
    )
    idf_r = np.log(n / df_r)
    # avgidf: OOV dilutes the denominator
    assert row["avgidf"] == pytest.approx(idf_r / 2)
    assert row["maxidf"] == pytest.approx(idf_r)
    # nqc variant: OOV df -> 1 (idf = ln N)
    assert row["avgidf_nqc"] == pytest.approx((idf_r + np.log(n)) / 2)


def test_nqc_matches_numpy(ctx):
    idx, qdf, run, qt, idf = ctx
    got = {r["qid"]: r["nqc"] for r in Q.nqc(run, idf, k=10).collect()}
    runs = run.filter(F.col("rank") <= 10).orderBy("qid", "rank").collect()
    aidf = {r["qid"]: r["avgidf_nqc"] for r in idf.collect()}
    for qid in got:
        scores = [r["score"] for r in runs if r["qid"] == qid]
        assert got[qid] == pytest.approx(
            float(np.var(scores)) * aidf[qid], rel=1e-9
        )


def test_cumulative_nqc_brute_force(ctx):
    idx, qdf, run, qt, idf = ctx
    k = 10
    got = {
        r["qid"]: r["cumnqc"]
        for r in Q.cumulative_nqc(run, idf, k=k).collect()
    }
    runs = run.orderBy("qid", "rank").collect()
    aidf = {r["qid"]: r["avgidf_nqc"] for r in idf.collect()}
    for qid in got:
        scores = [r["score"] for r in runs if r["qid"] == qid][:k]
        s = 0.0
        for i in range(1, k):
            s += float(np.var(scores[: min(i, len(scores))])) * aidf[qid]
        assert got[qid] == pytest.approx(s / k, rel=1e-9)


def test_rsd_deterministic_and_positive(ctx):
    idx, qdf, run, qt, idf = ctx
    a = {r["qid"]: r["rsd"] for r in Q.rsd(run, idf, k=50).collect()}
    b = {r["qid"]: r["rsd"] for r in Q.rsd(run, idf, k=50).collect()}
    assert a == b
    assert all(v >= 0 for v in a.values())


def test_uef_deterministic(ctx):
    idx, qdf, run, qt, idf = ctx
    base = Q.nqc(run, idf, k=50)
    a = {
        r["qid"]: r["uef"]
        for r in Q.uef(idx, run, base, "nqc", num_samples=3).collect()
    }
    b = {
        r["qid"]: r["uef"]
        for r in Q.uef(idx, run, base, "nqc", num_samples=3).collect()
    }
    assert a == pytest.approx(b)
    assert all(np.isfinite(v) for v in a.values())


def test_variant_and_corel_combine(spark):
    base = spark.createDataFrame(
        [("q1", 2.0), ("q2", 4.0)], "qid string, est double"
    )
    refs = spark.createDataFrame(
        [("q1", 0.5, 1.0), ("q1", 0.5, 3.0)], "qid string, sim double, est double"
    )
    got = {
        r["qid"]: r["est"]
        for r in Q.variant_specificity(base, "est", refs, lam=0.6).collect()
    }
    assert got["q1"] == pytest.approx(0.6 * 2.0 + 0.4 * 2.0)
    assert got["q2"] == pytest.approx(4.0)  # no refs -> falls back to base


def test_precomputed_lookup(spark):
    est = spark.createDataFrame(
        [("q1", 0.3)], "qid string, est double"
    )
    run = spark.createDataFrame(
        [("q1", 1, 1, 1.0), ("q9", 2, 1, 1.0)],
        "qid string, doc_id long, rank int, score double",
    )
    got = {r["qid"]: r["est"] for r in Q.precomputed_predictor(est, run).collect()}
    assert got["q1"] == pytest.approx(0.3)
    assert got["q9"] is None


# ---------------------------------------------------------------------------
# stochastic swappers
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def filled(spark):
    rows = [
        ("q1", d, r + 1, 10.0 - r, rel)
        for r, (d, rel) in enumerate(
            [(11, 0), (12, 1), (13, 0), (14, 0), (15, 1)]
        )
    ]
    return spark.createDataFrame(
        rows, "qid string, doc_id long, rank int, score double, rel int"
    )


def test_swap_permutations_enumeration(filled):
    perms = S.swap_permutations(filled).toPandas()
    # rel ranks (0-based): {1, 4} plus pinned 0 -> {0, 1, 4};
    # nonrel ranks: {0, 2, 3}; pairs excluding equal = 3*3 - 1 = 8
    n_perms = perms["perm_id"].nunique()
    assert n_perms == 1 + 8
    # identity is perm 0
    ident = perms[perms["perm_id"] == 0].sort_values("rank")
    assert ident["doc_id"].tolist() == [11, 12, 13, 14, 15]
    # scores stay attached to ranks in every permutation
    for _, g in perms.groupby("perm_id"):
        g = g.sort_values("rank")
        assert g["score"].tolist() == [10.0, 9.0, 8.0, 7.0, 6.0]
        assert sorted(g["doc_id"].tolist()) == [11, 12, 13, 14, 15]


def test_sampled_and_shuffled_deterministic(filled):
    a = S.sample_swapped_runs(filled, 5).toPandas().sort_values(
        ["sample", "rank"]
    )
    b = S.sample_swapped_runs(filled, 5).toPandas().sort_values(
        ["sample", "rank"]
    )
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    sh = S.shuffled_runs(filled, 2, num_shuffles=10).toPandas()
    sh2 = S.shuffled_runs(filled, 2, num_shuffles=10).toPandas()
    assert sorted(sh["doc_id"]) == sorted(sh2["doc_id"])
    for _, g in sh.groupby("sample"):
        assert sorted(g["doc_id"].tolist()) == [11, 12, 13, 14, 15]


def test_attribute_swapper(spark, filled):
    attrs = spark.createDataFrame(
        [(11, 1), (12, 0), (13, 1), (14, 0), (15, 0)],
        "doc_id long, attr int",
    )
    out = S.attribute_swapped_runs(
        filled.drop("rel"), attrs, num_samples=4
    ).toPandas()
    for _, g in out.groupby("sample"):
        assert sorted(g["doc_id"].tolist()) == [11, 12, 13, 14, 15]


def test_md5_permutation_is_valid_and_sql_equivalent():
    """The SQL-expressible sampling order (_permutation 'md5') must be a
    real permutation, deterministic, seed/sample-sensitive, and equal to
    its definition: order by md5(f"{seed}:{s}:{qid}:{doc}") then doc —
    the construction the qpp_rsd contract oracle inlines."""
    import hashlib

    docs = np.array([7, 3, 99, 42, 5, 11, 8], dtype=np.int64)
    p0 = Q._permutation("q1", 0, Q.SEED, docs, "md5")
    assert sorted(p0.tolist()) == list(range(len(docs)))
    assert np.array_equal(p0, Q._permutation("q1", 0, Q.SEED, docs, "md5"))
    assert not np.array_equal(
        p0, Q._permutation("q1", 1, Q.SEED, docs, "md5")
    )
    assert not np.array_equal(
        p0, Q._permutation("q2", 0, Q.SEED, docs, "md5")
    )
    expect = sorted(
        range(len(docs)),
        key=lambda i: (
            hashlib.md5(
                f"{Q.SEED}:0:q1:{int(docs[i])}".encode()
            ).hexdigest(),
            int(docs[i]),
        ),
    )
    assert p0.tolist() == expect
    with pytest.raises(ValueError):
        Q._permutation("q1", 0, Q.SEED, docs, "fisher-yates")


def test_rsd_md5_mode_deterministic(ctx):
    idx, qdf, run, qt, idf = ctx
    a = {r["qid"]: r["rsd"]
         for r in Q.rsd(run, idf, k=50, permute="md5").collect()}
    b = {r["qid"]: r["rsd"]
         for r in Q.rsd(run, idf, k=50, permute="md5").collect()}
    assert a == b
    assert all(v >= 0 for v in a.values())
    # a different sampling order gives a different (but same-sign)
    # estimate — the two modes share everything except the shuffle
    rng = {r["qid"]: r["rsd"] for r in Q.rsd(run, idf, k=50).collect()}
    assert set(rng) == set(a)


def test_sampled_runs_string_doc_ids(spark):
    """read_res yields STRING doc ids (real TREC runs are alphanumeric,
    e.g. msmarco_doc_00_0) — both permute modes must sample such runs
    instead of crashing on int(doc_id), and the output keeps the input
    id type."""
    rows = [
        (q, f"msmarco_doc_{i:02d}", i + 1, 10.0 - i)
        for q in ("q1", "q2") for i in range(6)
    ]
    run = spark.createDataFrame(
        rows, "qid string, doc_id string, rank int, score double"
    )
    ids = {r[1] for r in rows}
    for mode in ("rng", "md5"):
        out = Q.sampled_runs(
            run, num_samples=2, sample_size=4, permute=mode
        ).toPandas()
        assert out["doc_id"].map(lambda d: isinstance(d, str)).all()
        for (_, _), g in out.groupby(["qid", "sample"]):
            assert len(g) == 4
            assert set(g["doc_id"]) <= ids
            assert sorted(g["rank"]) == [1, 2, 3, 4]
    # the md5 order is deterministic for string ids too
    a = Q.sampled_runs(run, 2, 4, permute="md5").toPandas()
    b = Q.sampled_runs(run, 2, 4, permute="md5").toPandas()
    key = ["qid", "sample", "rank"]
    assert a.sort_values(key)["doc_id"].tolist() == \
        b.sort_values(key)["doc_id"].tolist()
    # integer-like STRING ids keep the numeric md5 rendering and
    # tie-break, so a string-typed res of numeric ids samples
    # identically to the long-typed fixture form
    long_run = spark.createDataFrame(
        [("q1", i, i + 1, 10.0 - i) for i in range(6)],
        "qid string, doc_id long, rank int, score double",
    )
    str_run = spark.createDataFrame(
        [("q1", str(i), i + 1, 10.0 - i) for i in range(6)],
        "qid string, doc_id string, rank int, score double",
    )
    sl = Q.sampled_runs(long_run, 2, 4, permute="md5").toPandas()
    ss = Q.sampled_runs(str_run, 2, 4, permute="md5").toPandas()
    assert sl.sort_values(key)["doc_id"].astype(str).tolist() == \
        ss.sort_values(key)["doc_id"].tolist()
