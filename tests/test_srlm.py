"""SRLM fit/rerank (F8/F9) + KNN feedback (F10/F12) vs a pure-pandas
recomputation of the reference formulas."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lucene_msmarco_spark.operators.feedback import lm_doc_vectors
from lucene_msmarco_spark.operators.index import assign_doc_ids, build_index
from lucene_msmarco_spark.operators.retrieval import search
from lucene_msmarco_spark.operators.srlm import (
    knn_centroid_rerank,
    knn_pseudo_rel_rerank,
    raw_query_terms,
    srlm_fit,
    srlm_rerank,
)
from lucene_msmarco_spark.sources.transcripts import transcripts_local

TRAIN_QUERIES = [
    ("t1", "ricufex kekegra"),
    ("t2", "tamori tamori verlu"),   # duplicate term multiplicity
]
TEST_QUERIES = [
    ("q1", "ricufex kekegra report"),
    ("q2", "tamori polgrake verlu"),
]


@pytest.fixture(scope="module")
def ctx(spark):
    pdf = transcripts_local(250, seed=42)
    docs = assign_doc_ids(spark.createDataFrame(pdf), ["conv_id", "turn_idx"])
    idx = build_index(docs, analyzer="english")
    qrels_rows = [
        ("t1", int(d), 1) for d in (3, 17, 40)
    ] + [("t2", int(d), 2) for d in (5, 17)]
    qrels = spark.createDataFrame(
        qrels_rows, "qid string, doc_id long, rel int"
    )
    vecs = lm_doc_vectors(idx).cache()
    return idx, qrels, vecs


def _vec_lookup(vecs_pd: pd.DataFrame) -> dict:
    out: dict = {}
    for r in vecs_pd.itertuples():
        out.setdefault(r.doc_id, {})[r.term] = r.w
    return out


def test_lm_vectors_l2_normalized(ctx):
    _, _, vecs = ctx
    norms = (
        vecs.groupBy("doc_id")
        .agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("n"))
        .collect()
    )
    for r in norms:
        assert r["n"] == pytest.approx(1.0, rel=1e-9)


def test_srlm_fit_matches_pandas(spark, ctx):
    idx, qrels, vecs = ctx
    tq = spark.createDataFrame(TRAIN_QUERIES, "qid string, qtext string")
    model = srlm_fit(vecs, tq, qrels, prune_model=False).toPandas()

    vl = _vec_lookup(vecs.toPandas())
    rels = {"t1": [3, 17, 40], "t2": [5, 17]}
    expect: dict = {}
    for qid, qtext in TRAIN_QUERIES:
        for q in qtext.split():
            for d in rels[qid]:
                dv = vl.get(d, {})
                p_q_d = dv.get(q, 0.0)
                if p_q_d == 0.0:
                    continue
                for w, p_w_d in dv.items():
                    expect[(q, w)] = expect.get((q, w), 0.0) + p_q_d * p_w_d
    got = {(r.qterm, r.coterm): r.wt for r in model.itertuples()}
    assert set(got) == set(expect)
    for key in expect:
        assert got[key] == pytest.approx(expect[key], rel=1e-9)


def test_srlm_prune_top5(spark, ctx):
    idx, qrels, vecs = ctx
    tq = spark.createDataFrame(TRAIN_QUERIES, "qid string, qtext string")
    pruned = srlm_fit(vecs, tq, qrels, num_top_terms=5).toPandas()
    counts = pruned.groupby("qterm").size()
    assert (counts <= 5).all()


def test_srlm_rerank_matches_pandas(spark, ctx):
    idx, qrels, vecs = ctx
    tq = spark.createDataFrame(TRAIN_QUERIES, "qid string, qtext string")
    model = srlm_fit(vecs, tq, qrels, num_top_terms=5)
    qdf = spark.createDataFrame(TEST_QUERIES, "qid string, qtext string")
    run = search(idx, qdf, model="bm25", k=15).cache()

    got = srlm_rerank(run, qdf, model, vecs).orderBy("qid", "rank").collect()

    vl = _vec_lookup(vecs.toPandas())
    m: dict = {}
    for r in model.toPandas().itertuples():
        m.setdefault(r.qterm, {})[r.coterm] = r.wt
    run_pd = run.toPandas()
    expect_rows = []
    for qid, qtext in TEST_QUERIES:
        sub = run_pd[run_pd["qid"] == qid].sort_values("rank")
        scored = []
        for r in sub.itertuples():
            dv = vl.get(r.doc_id, {})
            p = 0.0
            for q in qtext.split():
                td = m.get(q)
                if td:
                    p += sum(wt * dv.get(w, 0.0) for w, wt in td.items())
            scored.append((r.doc_id, r.rank, p * r.score))
        scored.sort(key=lambda t: (-t[2], t[1]))
        for new_rank, (doc, _, sc) in enumerate(scored, 1):
            expect_rows.append((qid, doc, new_rank, sc))
    for g, e in zip(got, expect_rows):
        assert (g["qid"], g["doc_id"], g["rank"]) == e[:3]
        assert g["score"] == pytest.approx(e[3], rel=1e-9, abs=1e-12)


def test_knn_centroid_rerank(spark, ctx):
    idx, qrels, vecs = ctx
    qdf = spark.createDataFrame(TEST_QUERIES, "qid string, qtext string")
    run = search(idx, qdf, model="bm25", k=10).cache()
    knn = spark.createDataFrame(
        [("q1", "t1", 0.7), ("q1", "t2", 0.3), ("q2", "t2", 1.0)],
        "qid string, ref_qid string, sim double",
    )
    out = knn_centroid_rerank(run, knn, qrels, vecs).orderBy(
        "qid", "rank"
    ).collect()
    # structure: permutation of input docs per qid, ranks contiguous
    by_q: dict = {}
    for r in out:
        by_q.setdefault(r["qid"], []).append(r)
    orig = {
        q: {r["doc_id"] for r in run.collect() if r["qid"] == q}
        for q, _ in TEST_QUERIES
    }
    for q, rows in by_q.items():
        assert {r["doc_id"] for r in rows} == orig[q]
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores, reverse=True)

    # hand-check one doc's rescoring: score' = score * dot(centroid, docvec)
    vl = _vec_lookup(vecs.toPandas())
    centroid: dict = {}
    for ref, sim in (("t1", 0.7), ("t2", 0.3)):
        rels = {"t1": [3, 17, 40], "t2": [5, 17]}[ref]
        for d in rels:
            for w, val in vl.get(d, {}).items():
                centroid[w] = centroid.get(w, 0.0) + sim * val
    l2 = np.sqrt(sum(v * v for v in centroid.values()))
    run_pd = run.toPandas()
    sub = run_pd[run_pd["qid"] == "q1"]
    r0 = sub.iloc[0]
    dv = vl.get(r0["doc_id"], {})
    dot = sum((v / l2) * dv.get(w, 0.0) for w, v in centroid.items())
    got_score = {
        (r["qid"], r["doc_id"]): r["score"] for r in out
    }[("q1", r0["doc_id"])]
    assert got_score == pytest.approx(r0["score"] * dot, rel=1e-9, abs=1e-12)


def test_knn_pseudo_rel_rerank_shape(spark, ctx):
    idx, qrels, vecs = ctx
    qdf = spark.createDataFrame(TEST_QUERIES, "qid string, qtext string")
    run = search(idx, qdf, model="bm25", k=10).cache()
    knn = spark.createDataFrame(
        [("q1", "t1", 0.7), ("q2", "t2", 1.0)],
        "qid string, ref_qid string, sim double",
    )
    out = knn_pseudo_rel_rerank(idx, run, knn, qrels).orderBy(
        "qid", "rank"
    ).collect()
    run_docs = {
        q: {r["doc_id"] for r in run.collect() if r["qid"] == q}
        for q, _ in TEST_QUERIES
    }
    by_q: dict = {}
    for r in out:
        by_q.setdefault(r["qid"], []).append(r)
    for q, rows in by_q.items():
        assert {r["doc_id"] for r in rows} == run_docs[q]
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores, reverse=True)


def test_raw_query_terms_multiplicity(spark):
    q = spark.createDataFrame(
        [("t2", "tamori tamori verlu")], "qid string, qtext string"
    )
    got = {
        (r["qid"], r["term"]): r["qtf"]
        for r in raw_query_terms(q).collect()
    }
    assert got[("t2", "tamori")] == 2.0
    assert got[("t2", "verlu")] == 1.0
