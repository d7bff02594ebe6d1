"""End-to-end slice (SURVEY.md §7.1 step 3): transcripts -> index -> BM25 /
LM-Dirichlet / LM-JM top-k, rank- AND score-identical to the pure-Python
oracle."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lucene_msmarco_spark.config import EngineConfig
from lucene_msmarco_spark.operators.index import assign_doc_ids, build_index
from lucene_msmarco_spark.operators.retrieval import search
from lucene_msmarco_spark.oracle.pyoracle import build_pyindex, topk_query
from lucene_msmarco_spark.sources.transcripts import transcripts_local

N_TURNS = 300
QUERIES = [
    ("q1", "ricufex kekegra report"),       # hot + mid-df + corpus-edge term
    ("q2", "alice's running 3.14"),          # possessive + stem + number (unfolded)
    ("q3", "the and of"),                    # stopwords only -> empty result
    ("q4", "zzzunknownzzz"),                 # OOV -> empty result
    ("q5", "yacuv biripol yacuv"),           # duplicate token multiplicity
    ("q6", "zedzedwi rigrasto bicubi cugramo"),  # multi-term hot query
]


@pytest.fixture(scope="module")
def corpus():
    pdf = transcripts_local(N_TURNS, seed=42)
    pdf = pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    docs = list(zip(range(len(pdf)), pdf["text"].tolist()))
    return pdf, docs


@pytest.fixture(scope="module")
def spark_index(spark, corpus):
    pdf, _ = corpus
    sdf = spark.createDataFrame(pdf)
    with_ids = assign_doc_ids(sdf, ["conv_id", "turn_idx"])
    return build_index(with_ids, analyzer="english")


@pytest.fixture(scope="module")
def py_index(corpus):
    _, docs = corpus
    return build_pyindex(docs, analyzer="english")


def test_doc_id_assignment_dense_and_stable(spark, corpus):
    pdf, _ = corpus
    sdf = spark.createDataFrame(pdf.sample(frac=1.0, random_state=7))  # shuffled input
    got = (
        assign_doc_ids(sdf, ["conv_id", "turn_idx"])
        .select("conv_id", "turn_idx", "doc_id")
        .orderBy("doc_id")
        .collect()
    )
    ids = [r["doc_id"] for r in got]
    assert ids == list(range(len(pdf)))  # dense 0..n-1
    keys = [(r["conv_id"], r["turn_idx"]) for r in got]
    assert keys == sorted(keys)  # stable (conv_id, turn_idx) order


def test_text_roundtrip(spark, corpus):
    """North-rule invariant: per-turn text round-trips exactly under stable
    (conv_id, turn_idx) ordering through the engine's doc store."""
    pdf, _ = corpus
    sdf = spark.createDataFrame(pdf)
    idx_docs = assign_doc_ids(sdf, ["conv_id", "turn_idx"])
    back = idx_docs.orderBy("doc_id").select("text").collect()
    assert [r["text"] for r in back] == pdf["text"].tolist()


def test_index_stats_match_oracle(spark_index, py_index):
    assert spark_index.stats.n_docs == py_index.n_docs
    assert spark_index.stats.total_cf == py_index.total_cf
    assert math.isclose(spark_index.stats.avgdl, py_index.avgdl, rel_tol=1e-12)

    got_doclen = {
        r["doc_id"]: r["doclen"] for r in spark_index.doc_stats.collect()
    }
    assert got_doclen == py_index.doclen

    got_df = {
        r["term"]: (r["df"], r["cf"]) for r in spark_index.term_stats.collect()
    }
    want_df = {
        t: (py_index.df(t), py_index.cf(t)) for t in py_index.postings
    }
    assert got_df == want_df


@pytest.mark.parametrize("model", ["bm25", "lmdir", "lmjm", "tfidf"])
def test_topk_matches_oracle(spark, spark_index, py_index, model):
    qdf = spark.createDataFrame(QUERIES, "qid string, qtext string")
    res = search(spark_index, qdf, model=model, k=20)
    got: dict[str, list] = {}
    for r in res.orderBy("qid", "rank").collect():
        got.setdefault(r["qid"], []).append((r["doc_id"], r["rank"], r["score"]))

    for qid, qtext in QUERIES:
        want = topk_query(py_index, qtext, k=20, model=model)
        have = got.get(qid, [])
        assert [x[0] for x in have] == [x[0] for x in want], (qid, model)
        assert [x[1] for x in have] == [x[1] for x in want]
        for (_, _, gs), (_, _, ws) in zip(have, want):
            assert math.isclose(gs, ws, rel_tol=1e-9, abs_tol=1e-12), (qid, model)


def test_two_phase_topk_identical(spark, spark_index):
    qdf = spark.createDataFrame(QUERIES, "qid string, qtext string")
    a = search(spark_index, qdf, model="bm25", k=15, strategy="window")
    b = search(spark_index, qdf, model="bm25", k=15, strategy="two_phase")
    ra = sorted((r["qid"], r["rank"], r["doc_id"], round(r["score"], 9))
                for r in a.collect())
    rb = sorted((r["qid"], r["rank"], r["doc_id"], round(r["score"], 9))
                for r in b.collect())
    assert ra == rb


def test_query_duplicate_token_multiplicity(spark, spark_index, py_index):
    """Duplicate query tokens must score per occurrence (Q1 semantics)."""
    qdf = spark.createDataFrame(
        [("qa", "yacuv"), ("qb", "yacuv yacuv")], "qid string, qtext string"
    )
    res = {(r["qid"], r["doc_id"]): r["score"]
           for r in search(spark_index, qdf, model="bm25", k=5).collect()}
    pairs = [(qid, doc) for (qid, doc) in res if qid == "qa"]
    assert pairs, "term should match some docs"
    for _, doc in pairs:
        if ("qb", doc) in res:
            assert math.isclose(res[("qb", doc)], 2 * res[("qa", doc)],
                                rel_tol=1e-9)
