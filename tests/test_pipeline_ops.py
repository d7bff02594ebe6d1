"""Engine-side training-data-pipeline ops vs their SQL-contract
counterparts and hand-computed values; multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_msmarco_spark import entry_queries
from lucene_msmarco_spark.operators import multimodal as MM
from lucene_msmarco_spark.operators import pipeline as P

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def _sql(spark, name, sf=SF):
    return entry_queries.make_spark_query(name)(spark, sf)


# ---------------------------------------------------------------------------
# dedup family matches the oracle-checked SQL form
# ---------------------------------------------------------------------------

def test_dedup_exact_matches_sql(spark, docs):
    api = (
        P.dedup_exact(docs, prefix_words=8)
        .orderBy("fp").toPandas()
    )
    sql = _sql(spark, "dedup_exact_prefix").toPandas()
    assert api["fp"].tolist() == sql["fp"].tolist()
    assert api["cnt"].tolist() == sql["cnt"].tolist()
    assert api["rep"].tolist() == sql["rep"].tolist()


def test_minhash_matches_sql(spark, docs):
    api = (
        P.minhash_lsh_pairs(docs)
        .orderBy("doc_a", "doc_b").toPandas()
    )
    sql = _sql(spark, "dedup_minhash_lsh").toPandas()
    assert api[["doc_a", "doc_b", "n_buckets"]].values.tolist() == \
        sql[["doc_a", "doc_b", "n_buckets"]].values.tolist()


def test_simhash_matches_sql(spark, docs):
    # build the analyzed tf table exactly as the SQL CTE chain does
    sql = _sql(spark, "dedup_simhash").toPandas()
    # api path: reuse the contract's own tf by rebuilding via SQL up to tf
    from lucene_msmarco_spark.entry_queries import _ir_base

    entry_queries._register_views(spark, SF)
    tf = spark.sql(
        _ir_base("spark") + "\nSELECT doc_id, term, tf FROM tf"
    )
    api = P.simhash(tf).orderBy("doc_id").toPandas()
    sql = sql.sort_values("doc_id").reset_index(drop=True)
    assert api["simhash"].tolist() == sql["simhash"].tolist()


def test_jaccard_matches_sql(spark, docs):
    api = P.ngram_jaccard_pairs(docs, max_shingle_df=50).toPandas()
    api = api.sort_values(
        ["jaccard", "doc_a", "doc_b"], ascending=[False, True, True]
    ).head(100).reset_index(drop=True)
    sql = _sql(spark, "dedup_ngram_jaccard").toPandas()
    assert api["doc_a"].tolist() == sql["doc_a"].tolist()
    assert api["doc_b"].tolist() == sql["doc_b"].tolist()
    assert np.allclose(api["jaccard"].round(4), sql["jaccard"])


# ---------------------------------------------------------------------------
# ANN
# ---------------------------------------------------------------------------

def test_ann_brute_matches_sql(spark, embeddings):
    api = P.ann_brute_topk(
        embeddings, embeddings.filter(F.col("vec_id") < 5), k=5
    ).orderBy("qvec", "rank").toPandas()
    sql = _sql(spark, "ann_cosine_topk").toPandas()
    assert api["qvec"].tolist() == sql["qvec"].tolist()
    assert api["nvec"].tolist() == sql["nvec"].tolist()
    assert np.allclose(api["sim"].round(4), sql["sim"], atol=1e-4)


def test_ann_lsh_matches_sql_and_is_subset_of_bucketmates(
    spark, embeddings
):
    # rank_round=6 mirrors the oracle's round(sim, 6) order; the
    # production default ranks on the raw cosine like ann_brute_topk
    api = P.ann_lsh_topk(
        embeddings, k=5, query_filter=F.col("qvec") < 20, rank_round=6
    ).orderBy("qvec", "rank").toPandas()
    sql = _sql(spark, "ann_lsh_topk").toPandas()
    assert api["qvec"].tolist() == sql["qvec"].tolist()
    assert api["nvec"].tolist() == sql["nvec"].tolist()
    # every returned neighbor shares at least one table's bucket
    bk = P.lsh_bucket(embeddings, n_tables=4).toPandas()
    by_vec = bk.groupby("vec_id")["bucket"].apply(set)
    for r in api.itertuples():
        assert by_vec[r.qvec] & by_vec[r.nvec]


def test_ann_lsh_recall_vs_brute(spark, embeddings):
    # multi-table + multi-probe random-hyperplane LSH recovers >= 0.8 of
    # the exact cosine top-5 on the clustered fixture embeddings
    queries = embeddings.filter(F.col("vec_id") < 100)
    brute = P.ann_brute_topk(embeddings, queries, k=5).toPandas()
    approx = P.ann_lsh_topk(
        embeddings, k=5, n_bits=4, n_tables=8, multiprobe=2,
        query_filter=F.col("qvec") < 100,
    ).toPandas()
    truth = set(zip(brute["qvec"], brute["nvec"]))
    got = set(zip(approx["qvec"], approx["nvec"]))
    recall = len(truth & got) / len(truth)
    assert recall >= 0.8, f"recall@5 {recall:.3f}"


def test_ann_lsh_multiprobe_no_worse(spark, embeddings):
    # probing flipped near-boundary bits only ADDS candidates: the
    # probed result's candidate set is a superset, so per-query top-k
    # sims are pointwise >= the unprobed ones
    base = P.ann_lsh_topk(
        embeddings, k=5, n_bits=6, n_tables=2,
        query_filter=F.col("qvec") < 30,
    ).toPandas().set_index(["qvec", "rank"])["sim"]
    probed = P.ann_lsh_topk(
        embeddings, k=5, n_bits=6, n_tables=2, multiprobe=2,
        query_filter=F.col("qvec") < 30,
    ).toPandas().set_index(["qvec", "rank"])["sim"]
    joined = base.to_frame("b").join(probed.to_frame("p"), how="left")
    assert (joined["p"] >= joined["b"] - 1e-12).all()


def test_ann_ivf_matches_sql(spark, embeddings):
    # the DataFrame operator with the data-independent seeded quantizer
    # equals the oracle-checked SQL form (same inlined centroids) exactly
    api = P.ann_ivf_topk(
        embeddings, k=5, centroids=P.ivf_centroids(64, 16),
        query_filter=F.col("qvec") < 20, rank_round=6,
    ).orderBy("qvec", "rank").toPandas()
    sql = _sql(spark, "ann_ivf_topk").toPandas()
    assert api["qvec"].tolist() == sql["qvec"].tolist()
    assert api["nvec"].tolist() == sql["nvec"].tolist()
    assert np.allclose(api["sim"].round(4), sql["sim"], atol=1e-4)


def test_ann_ivf_full_probe_is_exact(spark, embeddings):
    # probing every list degenerates to the exhaustive search: candidate
    # set = all non-self pairs, so ranks equal ann_brute_topk
    queries = embeddings.filter(F.col("vec_id") < 20)
    brute = P.ann_brute_topk(embeddings, queries, k=5).toPandas()
    full = P.ann_ivf_topk(
        embeddings, k=5, n_lists=16, nprobe=16,
        centroids=P.ivf_centroids(64, 16),
        query_filter=F.col("qvec") < 20,
    ).orderBy("qvec", "rank").toPandas()
    assert brute.sort_values(["qvec", "rank"])["nvec"].tolist() == \
        full["nvec"].tolist()


def test_ann_ivf_fitted_recall_vs_brute(spark, embeddings):
    # spherical k-means centroids (fit_ivf_centroids is deterministic:
    # seeded init, lower-id tie-break) beat the random quantizer at the
    # same probe budget; recall floor pinned on the fixture embeddings
    queries = embeddings.filter(F.col("vec_id") < 100)
    brute = P.ann_brute_topk(embeddings, queries, k=5).toPandas()
    truth = set(zip(brute["qvec"], brute["nvec"]))

    def recall(centroids):
        appr = P.ann_ivf_topk(
            embeddings, k=5, n_lists=16, nprobe=4, centroids=centroids,
            query_filter=F.col("qvec") < 100,
        ).toPandas()
        got = set(zip(appr["qvec"], appr["nvec"]))
        return len(truth & got) / len(truth)

    fitted = recall(P.fit_ivf_centroids(embeddings, 16))
    rand = recall(P.ivf_centroids(64, 16))
    assert fitted >= 0.55, f"fitted recall@5 {fitted:.3f}"
    assert fitted > rand, f"fit did not help: {fitted:.3f} <= {rand:.3f}"


def test_embedding_near_dup_threshold(spark, embeddings):
    pairs = P.embedding_near_dup(embeddings, min_cosine=0.5).toPandas()
    assert (pairs["cosine"] >= 0.5).all()
    assert (pairs["id_a"] < pairs["id_b"]).all()


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

def test_token_counts_matches_sql(spark, docs):
    api = P.token_counts(docs).orderBy("doc_id").toPandas()
    sql = _sql(spark, "token_stats").toPandas()
    assert api["n_ws_tokens"].tolist() == sql["n_ws_tokens"].tolist()
    assert api["n_bpe_tokens"].tolist() == sql["n_bpe_tokens"].tolist()


def test_lang_id_matches_sql(spark, docs):
    api = P.lang_id(docs).orderBy("doc_id").toPandas()
    sql = _sql(spark, "lang_id").toPandas()
    assert api["pred_lang"].tolist() == sql["pred_lang"].tolist()


def test_rolling_fingerprint_order_sensitive(spark):
    d = spark.createDataFrame(
        [(1, "a b c"), (2, "c b a"), (3, "a b c")],
        "doc_id long, text string",
    )
    fp = {r["doc_id"]: r["fingerprint"]
          for r in P.rolling_fingerprint(d).collect()}
    assert fp[1] == fp[3]
    assert fp[1] != fp[2]


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------

def test_image_features_deterministic(spark):
    media = MM.synthetic_media(spark, n=16, kind="image")
    a = MM.image_features(media).orderBy("media_id").toPandas()
    b = MM.image_features(media).orderBy("media_id").toPandas()
    assert a["phash"].tolist() == b["phash"].tolist()
    assert (a["n_bytes"] > 0).all()
    assert len(a) == 16


def test_image_strict_mode_raises(spark):
    media = MM.synthetic_media(spark, n=4, kind="image")
    from py4j.protocol import Py4JJavaError

    with pytest.raises((Py4JJavaError, Exception)):
        MM.image_features(media, strict=True).collect()


def test_audio_and_frames(spark):
    audio = MM.synthetic_media(spark, n=8, kind="audio")
    af = MM.audio_features(audio).toPandas()
    assert len(af) == 8
    assert (af["rms"] > 0).all()

    video = MM.synthetic_media(spark, n=6, kind="video")
    fr = MM.sample_frames(video, every_n=30).toPandas()
    assert (fr.groupby("media_id").size() >= 1).all()
    # frame_idx stride
    assert (fr["frame_idx"] % 30 == 0).all()


def test_phash_near_dup_self(spark):
    media = MM.synthetic_media(spark, n=12, kind="image")
    feats = MM.image_features(media)
    dup_feats = feats.unionByName(
        feats.withColumn("media_id", F.col("media_id") + 1000)
    )
    pairs = MM.phash_near_dup(dup_feats, max_hamming=0).toPandas()
    # every doc pairs with its shifted clone
    clone_pairs = {(r.id_a, r.id_b) for r in pairs.itertuples()}
    for mid in range(12):
        assert (mid, mid + 1000) in clone_pairs


# ---------------------------------------------------------------------------
# scale-shape guards: banding/df-capping must bound candidate explosion
# ---------------------------------------------------------------------------

def _skew_fixture(spark):
    """40 docs sharing one hot 3-gram but otherwise pairwise-unrelated,
    plus one true near-dup pair (docs 1000/1001)."""
    hot = "the common phrase"
    rows = [
        (i, f"{hot} unique{i}a unique{i}b unique{i}c unique{i}d "
            f"unique{i}e unique{i}f unique{i}g")
        for i in range(40)
    ]
    dup = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
           "lambda mu")
    rows += [(1000, dup), (1001, dup + " extraword")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_banding_bounds_hot_shingle_candidates(spark):
    """r=2 banding: docs sharing ONE hot shingle (but nothing else) must
    not explode into O(n^2) candidate pairs — with one-row bands (r=1)
    every pair of the 40 hot-shingle docs collides whenever the hot
    shingle wins a seed's min; with 2-row bands both seeds of some band
    must agree."""
    docs = _skew_fixture(spark)
    banded = P.minhash_lsh_pairs(docs, n_hashes=8, rows_per_band=2)
    pairs = {(r.doc_a, r.doc_b) for r in banded.collect()}
    assert (1000, 1001) in pairs  # true near-dups survive
    cross = [p for p in pairs if p[0] < 1000 and p[1] < 1000]
    # r=1 baseline for contrast: reconstruct one-band-per-hash pairs
    sigs = P.minhash_signatures(docs, n_hashes=8)
    a, b = sigs.alias("a"), sigs.alias("b")
    r1 = (
        a.join(b, (F.col("a.s") == F.col("b.s"))
               & (F.col("a.mh") == F.col("b.mh"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"))
        .distinct().collect()
    )
    r1_cross = [r for r in r1 if r.doc_a < 1000 and r.doc_b < 1000]
    assert len(r1_cross) > 100          # the r=1 shape DOES explode
    assert len(cross) < len(r1_cross) / 10   # banding bounds it


def test_jaccard_df_cap_bounds_hot_shingle_join(spark):
    """Dropping shingles with df > max_shingle_df keeps the self-join
    size proportional to true near-dup mass, not hot-shingle df^2."""
    docs = _skew_fixture(spark)
    capped = P.ngram_jaccard_pairs(docs, max_shingle_df=5)
    pairs = {(r.doc_a, r.doc_b) for r in capped.collect()}
    assert (1000, 1001) in pairs
    assert all(p == (1000, 1001) for p in pairs)  # no hot-shingle pairs
    uncapped = P.ngram_jaccard_pairs(docs, max_shingle_df=None)
    n_uncapped = uncapped.count()
    assert n_uncapped > 700  # 40*39/2 hot pairs + the dup pair


def test_jaccard_auto_cap_default_is_scale_safe(spark):
    """The DEFAULT (max_shingle_df="auto") must bound the candidate join
    on a hot-shingle corpus: 60 docs sharing one 3-gram (df 60 > the
    auto cap of 50) produce NO hot-shingle pairs — only the true
    near-dup pair survives. Exact mode stays opt-in via None."""
    hot = "the common phrase"
    rows = [
        (i, f"{hot} uniq{i}a uniq{i}b uniq{i}c uniq{i}d uniq{i}e")
        for i in range(60)
    ]
    dup = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
           "lambda mu")
    rows += [(1000, dup), (1001, dup + " extraword")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r.doc_a, r.doc_b)
             for r in P.ngram_jaccard_pairs(docs).collect()}
    assert pairs == {(1000, 1001)}
    assert P.derive_max_shingle_df(62) == 50
    assert P.derive_max_shingle_df(10_000_000) == 10_000


# ---------------------------------------------------------------------------
# IVF model persistence + drift refresh
# ---------------------------------------------------------------------------

def test_ivf_model_save_load_roundtrip(spark, embeddings, tmp_path):
    """save -> load must reproduce the fitted quantizer bit-for-bit, and
    ann_ivf_topk off the LOADED centroids must equal the run off the
    fitted ones exactly."""
    path = str(tmp_path / "ivf")
    C = P.fit_ivf_centroids(embeddings, n_lists=16)
    q0 = P.ivf_assignment_quality(embeddings, C)
    entry = P.save_ivf_model(spark, C, path, extra_meta={"quality": q0})
    assert entry["n_lists"] == 16 and entry["dim"] == 64
    C2, meta = P.load_ivf_model(spark, path)
    assert np.array_equal(C, C2)
    assert meta["generation"] == 0 and meta["quality"] == q0
    a = P.ann_ivf_topk(
        embeddings, k=5, centroids=C, query_filter=F.col("qvec") < 10
    ).orderBy("qvec", "rank").toPandas()
    b = P.ann_ivf_topk(
        embeddings, k=5, centroids=C2, query_filter=F.col("qvec") < 10
    ).orderBy("qvec", "rank").toPandas()
    assert a["nvec"].tolist() == b["nvec"].tolist()
    assert np.allclose(a["sim"], b["sim"])


def test_ivf_refresh_noop_without_drift_and_refits_on_drift(
    spark, embeddings, tmp_path
):
    path = str(tmp_path / "ivf")
    C = P.fit_ivf_centroids(embeddings, n_lists=16)
    q0 = P.ivf_assignment_quality(embeddings, C)
    P.save_ivf_model(spark, C, path, extra_meta={"quality": q0})
    # same corpus: quality unchanged -> no refresh
    got, refreshed = P.refresh_ivf_model(spark, path, embeddings)
    assert not refreshed and np.array_equal(got, C)
    # simulate drift: persist a DETUNED quantizer claiming high quality;
    # the measured quality on the real corpus falls below the ratio
    bad = P.ivf_centroids(64, 16, seed=999)
    P.save_ivf_model(spark, bad, path, extra_meta={"quality": 0.99})
    got2, refreshed2 = P.refresh_ivf_model(spark, path, embeddings)
    assert refreshed2
    # the refit must be the deterministic spherical-kmeans result
    assert np.array_equal(got2, P.fit_ivf_centroids(embeddings, 16))
    # and the new generation is on disk with its measured quality
    C3, meta = P.load_ivf_model(spark, path)
    assert np.array_equal(C3, got2)
    assert meta["generation"] >= 2 and "quality" in meta


# ---------------------------------------------------------------------------
# connected components / dedup groups
# ---------------------------------------------------------------------------


def _uf_components(pairs):
    """Union-find oracle: {node: min-node-of-component}."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _cc(spark, pairs):
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = P.connected_components(df).collect()
    return {r["node"]: r["component"] for r in got}


def test_cc_chain_star_and_islands(spark):
    # a 7-node chain (pathological for diameter-bound label propagation),
    # a star, two islands and a triangle closing a cycle
    pairs = (
        [(i, i + 1) for i in range(10, 16)]          # chain 10..16
        + [(100, x) for x in (101, 102, 103)]        # star rooted at 100
        + [(7, 8)]                                   # island pair
        + [(1, 2), (2, 3), (3, 1)]                   # cycle
    )
    assert _cc(spark, pairs) == _uf_components(pairs)


def test_cc_randomized_vs_union_find(spark):
    import random

    rng = random.Random(314159)
    nodes = list(range(60))
    pairs = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(90)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    assert _cc(spark, pairs) == _uf_components(pairs)


def test_cc_empty_and_string_ids(spark):
    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    assert P.connected_components(empty).count() == 0
    sdf = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("x", "y")], "doc_a string, doc_b string"
    )
    got = {r["node"]: r["component"]
           for r in P.connected_components(sdf).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_cc_raises_on_round_exhaustion(spark):
    """Exhausting max_rounds must fail loudly, not return a
    half-contracted star set (silent wrong components)."""
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        P.connected_components(df, max_rounds=0)


def test_dedup_groups_canonical_flag(spark):
    pairs = spark.createDataFrame(
        [(5, 9), (9, 12), (30, 31)], "doc_a long, doc_b long"
    )
    rows = {r["doc_id"]: (r["component"], r["is_canonical"])
            for r in P.dedup_groups(pairs).collect()}
    assert rows == {
        5: (5, True), 9: (5, False), 12: (5, False),
        30: (30, True), 31: (30, False),
    }
    # the kept set is exactly the component roots
    keep = [d for d, (_, can) in rows.items() if can]
    assert sorted(keep) == [5, 30]


# ---------------------------------------------------------------------------
# deterministic hash split
# ---------------------------------------------------------------------------


def test_hash_split_partitioning_independent(spark):
    df = spark.range(500).selectExpr("id AS doc_id")
    a = {r["doc_id"]: r["split"]
         for r in P.hash_split(df).collect()}
    b = {r["doc_id"]: r["split"]
         for r in P.hash_split(df.repartition(7, "doc_id")).collect()}
    c = {r["doc_id"]: r["split"]
         for r in P.hash_split(df.coalesce(1)).collect()}
    assert a == b == c


def test_hash_split_proportions_and_salt(spark):
    df = spark.range(2000).selectExpr("id AS doc_id")
    counts = {
        r["split"]: r["n"]
        for r in P.hash_split(df).groupBy("split")
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 2000 - 0.9) < 0.03
    # a different salt draws an independent split of the same size shape
    other = {r["doc_id"]: r["split"]
             for r in P.hash_split(df, salt="v2").collect()}
    base = {r["doc_id"]: r["split"]
            for r in P.hash_split(df).collect()}
    assert other != base
    # weights normalize: 9/1 == 0.9/0.1
    w1 = {r["doc_id"]: r["split"]
          for r in P.hash_split(df, weights={"a": 9, "b": 1}).collect()}
    w2 = {r["doc_id"]: r["split"]
          for r in P.hash_split(df, weights={"a": .9, "b": .1}).collect()}
    assert w1 == w2


def test_hash_split_validation(spark):
    df = spark.range(3).selectExpr("id AS doc_id")
    with pytest.raises(ValueError):
        P.hash_split(df, weights={})
    with pytest.raises(ValueError):
        P.hash_split(df, weights={"a": -1, "b": 2})
    # single bucket: everything lands there without a CASE
    assert {r["split"] for r in
            P.hash_split(df, weights={"all": 1}).collect()} == {"all"}
