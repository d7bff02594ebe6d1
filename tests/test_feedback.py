"""Feedback layer (F1-F6, F11) vs the pure-Python oracle."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lucene_msmarco_spark.config import EngineConfig
from lucene_msmarco_spark.operators.feedback import (
    kl_div_rerank,
    lm_doc_vectors,
    rlm_expand_query,
    rlm_rerank,
    rm1_iid_weights,
    rm_conditional_weights,
    rocchio_expand,
    top_docs_term_stats,
)
from lucene_msmarco_spark.operators.index import assign_doc_ids, build_index
from lucene_msmarco_spark.operators.retrieval import compile_queries, search
from lucene_msmarco_spark.oracle import pyfeedback as po
from lucene_msmarco_spark.oracle.pyoracle import build_pyindex, topk_query
from lucene_msmarco_spark.sources.transcripts import transcripts_local

N = 250
K = 30
NUM_TOP = 10
QUERIES = [("q1", "ricufex kekegra zedzedwi"), ("q2", "yacuv biripol")]


@pytest.fixture(scope="module")
def corpus():
    pdf = transcripts_local(N, seed=42)
    pdf = pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    return pdf, list(zip(range(len(pdf)), pdf["text"].tolist()))


@pytest.fixture(scope="module")
def sidx(spark, corpus):
    pdf, _ = corpus
    docs = assign_doc_ids(spark.createDataFrame(pdf), ["conv_id", "turn_idx"])
    return build_index(docs, analyzer="english")


@pytest.fixture(scope="module")
def pidx(corpus):
    return build_pyindex(corpus[1], analyzer="english")


@pytest.fixture(scope="module")
def runs(spark, sidx, pidx):
    qdf = spark.createDataFrame(QUERIES, "qid string, qtext string")
    srun = search(sidx, qdf, model="bm25", k=K).cache()
    pruns = {qid: topk_query(pidx, qt, k=K, model="bm25")
             for qid, qt in QUERIES}
    return qdf, srun, pruns


def test_rm1_weights_match(spark, sidx, pidx, runs):
    qdf, srun, pruns = runs
    stats = top_docs_term_stats(sidx, srun, NUM_TOP)
    qt = compile_queries(qdf, "english")
    got = rm1_iid_weights(stats, qt)
    gmap = {(r["qid"], r["term"]): r["wt"] for r in got.collect()}
    for qid, qtext in QUERIES:
        want = po.rm1_weights(pidx, qtext, pruns[qid], NUM_TOP)
        mine = {t: w for (q, t), w in gmap.items() if q == qid}
        assert set(mine) == set(want), qid
        for t in want:
            assert math.isclose(mine[t], want[t], rel_tol=1e-9), (qid, t)


def test_rm_conditional_and_kl_rerank_match(spark, sidx, pidx, runs):
    _, srun, pruns = runs
    stats = top_docs_term_stats(sidx, srun, NUM_TOP)
    wts = rm_conditional_weights(stats)
    gmap = {(r["qid"], r["term"]): r["wt"] for r in wts.collect()}
    pwts = {}
    for qid, _qt in QUERIES:
        want = po.rm_conditional_weights(pidx, pruns[qid], NUM_TOP)
        pwts[qid] = want
        mine = {t: w for (q, t), w in gmap.items() if q == qid}
        assert set(mine) == set(want)
        for t in want:
            assert math.isclose(mine[t], want[t], rel_tol=1e-9), (qid, t)

    rer = kl_div_rerank(stats, wts, srun)
    got = {}
    for r in rer.orderBy("qid", "rank").collect():
        got.setdefault(r["qid"], []).append(
            (r["doc_id"], r["rank"], r["score"])
        )
    for qid, _qt in QUERIES:
        want = po.kl_rerank(pidx, pruns[qid], pwts[qid])
        assert [x[0] for x in got[qid]] == [x[0] for x in want], qid
        for (_, _, gs), (_, _, ws) in zip(got[qid], want):
            assert math.isclose(gs, ws, rel_tol=1e-9)


def test_rlm_expansion_shape(spark, sidx, runs):
    qdf, srun, _ = runs
    cfg = EngineConfig()
    stats = top_docs_term_stats(sidx, srun, NUM_TOP)
    wts = rm_conditional_weights(stats)
    qt = compile_queries(qdf, "english")
    exp = rlm_expand_query(sidx, stats, wts, qt, cfg.feedback)
    rows = exp.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r)
    for qid, qtext in QUERIES:
        orig_terms = {r["term"] for r in by_q[qid] if r["weight"] == 0.8}
        exp_terms = [r for r in by_q[qid] if r["weight"] != 0.8]
        assert len(exp_terms) <= cfg.feedback.num_expansion_terms
        # expansion terms exclude originals and carry fbweight-scaled wts
        assert not orig_terms & {r["term"] for r in exp_terms}
        for r in exp_terms:
            assert 0 < r["weight"] <= 0.2 + 1e-12


def test_rlm_rerank_runs_end_to_end(spark, sidx, runs):
    qdf, _, _ = runs
    out = rlm_rerank(sidx, qdf, model="bm25")
    rows = out.orderBy("qid", "rank").collect()
    assert rows
    # rank sequence is dense 1..n per query
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r["rank"])
    for ranks in by_q.values():
        assert ranks == list(range(1, len(ranks) + 1))


def test_rocchio_positive_topm(spark, sidx, runs):
    qdf, srun, _ = runs
    qt = compile_queries(qdf, "english").withColumn(
        "qtf", F.col("qtf").cast("double")
    )
    rel = srun.filter(F.col("rank") <= 3).select("qid", "doc_id")
    vecs = lm_doc_vectors(sidx).join(rel, "doc_id").select(
        "qid", "doc_id", "term", "w"
    )
    out = rocchio_expand(qt, vecs)
    rows = out.collect()
    assert rows
    for r in rows:
        assert r["weight"] > 0
    counts = {}
    for r in rows:
        counts[r["qid"]] = counts.get(r["qid"], 0) + 1
    for c in counts.values():
        assert c <= 20


def test_lm_doc_vectors_l2_normalized(spark, sidx):
    vecs = lm_doc_vectors(sidx)
    norms = vecs.groupBy("doc_id").agg(
        F.sum(F.col("w") * F.col("w")).alias("ss")
    )
    bad = norms.filter(F.abs(F.col("ss") - 1.0) > 1e-9).count()
    assert bad == 0
