"""Q8 score induction, Q10 KNN query search, C11 polyfit, E9 fairness."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_msmarco_spark.operators.correlation import polynomial_fit
from lucene_msmarco_spark.operators.eval import fairness_combined
from lucene_msmarco_spark.operators.index import assign_doc_ids, build_index
from lucene_msmarco_spark.operators.retrieval import induce_scores, search
from lucene_msmarco_spark.operators.srlm import knn_query_search
from lucene_msmarco_spark.sources.transcripts import transcripts_local


@pytest.fixture(scope="module")
def idx(spark):
    pdf = transcripts_local(250, seed=42)
    docs = assign_doc_ids(spark.createDataFrame(pdf), ["conv_id", "turn_idx"])
    return build_index(docs, analyzer="english")


def test_induce_scores_matches_direct_scoring(spark, idx):
    qdf = spark.createDataFrame(
        [("q1", "ricufex kekegra"), ("q2", "tamori verlu")],
        "qid string, qtext string",
    )
    # a direct LM-JM run gives ground-truth scores for its own docs
    direct = search(idx, qdf, model="lmjm", k=10).cache()
    induced = induce_scores(idx, direct, qdf, model="lmjm").orderBy(
        "qid", "rank"
    ).collect()
    dmap = {(r["qid"], r["doc_id"]): r for r in direct.collect()}
    for r in induced:
        d = dmap[(r["qid"], r["doc_id"])]
        assert r["score"] == pytest.approx(d["score"], rel=1e-9)
        assert r["rank"] == d["rank"]


def test_induce_scores_zero_for_unmatched(spark, idx):
    qdf = spark.createDataFrame(
        [("q1", "ricufex")], "qid string, qtext string"
    )
    # hand the run a doc that does NOT contain the term
    no_match_doc = (
        idx.tokens.filter(F.col("term") == "ricufex")
        .select("doc_id").distinct()
    )
    some_doc = (
        idx.doc_stats.join(no_match_doc, "doc_id", "left_anti")
        .select("doc_id").limit(1).collect()[0]["doc_id"]
    )
    run = spark.createDataFrame(
        [("q1", int(some_doc), 1, 9.9)],
        "qid string, doc_id long, rank int, score double",
    )
    out = induce_scores(idx, run, qdf, model="lmjm").collect()
    assert out[0]["score"] == 0.0


def test_knn_query_search(spark, idx):
    train = [
        ("t1", "ricufex kekegra report"),
        ("t2", "tamori polgrake verlu"),
        ("t3", "zedzedwi rigrasto"),
        ("t4", "yacuv biripol"),
    ]
    tdf = spark.createDataFrame(train, "qid string, qtext string")
    qdocs = assign_doc_ids(
        tdf.select(F.col("qid").alias("ref_qid"),
                   F.col("qtext").alias("text")),
        ["ref_qid"],
    )
    qindex = build_index(qdocs, analyzer="english")
    test_q = spark.createDataFrame(
        [("t1", "ricufex kekegra report"), ("x1", "tamori verlu")],
        "qid string, qtext string",
    )
    out = knn_query_search(qindex, test_q, k=2).collect()
    by_q: dict = {}
    for r in out:
        by_q.setdefault(r["qid"], []).append(r)
    # self always excluded (t1 may have no non-self match at all here —
    # its terms are unique to itself among the training queries)
    assert all(r["ref_qid"] != r["qid"] for r in out)
    # sims normalized to sum 1 per query
    for q, rows in by_q.items():
        assert sum(r["sim"] for r in rows) == pytest.approx(1.0)
    # x1 should find t2 as its nearest neighbour
    assert by_q["x1"][0]["ref_qid"] == "t2" or any(
        r["ref_qid"] == "t2" for r in by_q["x1"]
    )


def test_polynomial_fit():
    x = np.array([0.0, 1.0, 2.0, 3.0, 4.0])
    y = 2 * x * x - 3 * x + 1
    coeffs = polynomial_fit(x, y, degree=2)
    assert np.allclose(coeffs, [2.0, -3.0, 1.0], atol=1e-8)


def test_fairness_combined(spark):
    pre = spark.createDataFrame(
        [("q1", 0.5, 0.8), ("q2", 0.4, 0.0)],
        "qid string, ndcg double, awrf double",
    )
    got = {r["qid"]: r["combined"]
           for r in fairness_combined(pre).collect()}
    assert got["q1"] == pytest.approx(0.4)
    assert got["q2"] == 0.0


def test_analyzed_export_t3(spark, idx):
    from lucene_msmarco_spark.functions.analysis import analyze_str
    from lucene_msmarco_spark.sources.writers import analyzed_export

    docs = idx.docs.select("doc_id", "text").limit(20)
    out = {r["doc_id"]: r["analyzed"]
           for r in analyzed_export(docs, "english").collect()}
    for r in docs.collect():
        from lucene_msmarco_spark.functions.analysis import fold_numbers_str

        expect = " ".join(analyze_str(fold_numbers_str(r["text"] or ""),
                                      "english"))
        assert out[r["doc_id"]] == expect
