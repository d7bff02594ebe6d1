"""Experiment harnesses (H1/H2/H7) + permutation-map sink (S13)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_msmarco_spark.operators.correlation import kendall_tau
from lucene_msmarco_spark.operators.experiments import (
    grid_search_lambda,
    qpp_experiment,
    stochastic_qpp_evaluation,
)
from lucene_msmarco_spark.operators.index import assign_doc_ids, build_index
from lucene_msmarco_spark.operators.retrieval import search
from lucene_msmarco_spark.sources.transcripts import transcripts_local
from lucene_msmarco_spark.sources.writers import permutation_map

QUERIES = [
    ("q1", "ricufex kekegra report"),
    ("q2", "zedzedwi rigrasto bicubi cugramo"),
    ("q3", "tamori polgrake verlu"),
    ("q4", "yacuv biripol stove"),
]


@pytest.fixture(scope="module")
def ctx(spark):
    pdf = transcripts_local(300, seed=42)
    docs = assign_doc_ids(spark.createDataFrame(pdf), ["conv_id", "turn_idx"])
    idx = build_index(docs, analyzer="english")
    qdf = spark.createDataFrame(QUERIES, "qid string, qtext string")
    # deterministic synthetic qrels: doc_id % 7 keyed by query index
    rows = []
    for qi, (qid, _) in enumerate(QUERIES):
        for d in range(0, 300, 7 + qi):
            rows.append((qid, d, 1 + (d + qi) % 3))
    qrels = spark.createDataFrame(rows, "qid string, doc_id long, rel int")
    return idx, qdf, qrels


def test_qpp_experiment_shapes(ctx):
    idx, qdf, qrels = ctx
    res = qpp_experiment(idx, qdf, qrels, model="bm25", predictor="nqc",
                         k=50, qpp_k=20)
    assert len(res["qids"]) >= 3
    assert set(res["correlations"]) == {
        "kendall", "pearson", "spearman", "sare"
    }
    assert -1 <= res["correlations"]["kendall"] <= 1
    # per-query metric + estimate vectors align with qids
    assert len(res["gt"]) == len(res["pred"]) == len(res["qids"])


def test_qpp_experiment_all_predictors(ctx):
    idx, qdf, qrels = ctx
    for pred in ("nqc", "cumnqc", "avgidf", "maxidf"):
        res = qpp_experiment(idx, qdf, qrels, model="bm25",
                             predictor=pred, k=30, qpp_k=10)
        assert np.isfinite(res["pred"]).all()


def test_grid_search_lambda(spark, ctx):
    idx, qdf, qrels = ctx
    res = qpp_experiment(idx, qdf, qrels, model="bm25", predictor="nqc",
                         k=50, qpp_k=20)
    base = res["estimates"]
    # variants: jittered copies of the base estimate
    variant = base.select(
        "qid", F.lit(1.0).alias("sim"),
        (F.col("nqc") * 1.1).alias("est"),
    )
    out = grid_search_lambda(base, "nqc", variant, res["metrics"])
    assert 0.0 <= out["best_lambda"] <= 1.0
    assert len(out["taus"]) == 11
    # scaled variant preserves ranking -> all lambdas give the same tau
    vals = [v for v in out["taus"].values() if np.isfinite(v)]
    assert max(vals) - min(vals) < 1e-9


def test_stochastic_qpp_evaluation(ctx):
    idx, qdf, qrels = ctx
    run = search(idx, qdf, model="bm25", k=30).cache()
    res = stochastic_qpp_evaluation(
        idx, qdf, qrels, run, num_samples=4, seed=7
    )
    assert set(res) == {"base_tau", "sample_taus", "mean_tau", "delta_tau"}
    assert len(res["sample_taus"]) == 4
    # deterministic under the same seed
    res2 = stochastic_qpp_evaluation(
        idx, qdf, qrels, run, num_samples=4, seed=7
    )
    assert res["sample_taus"] == res2["sample_taus"]


def test_kendall_tau_perfect():
    assert kendall_tau([1, 2, 3, 4], [10, 20, 30, 40]) == pytest.approx(1.0)
    assert kendall_tau([1, 2, 3, 4], [40, 30, 20, 10]) == pytest.approx(-1.0)


def test_permutation_map(spark):
    pre = spark.createDataFrame(
        [("q1", 10, 1, 3.0), ("q1", 20, 2, 2.0), ("q1", 30, 3, 1.0)],
        "qid string, doc_id long, rank int, score double",
    )
    post = spark.createDataFrame(
        [("q1", 30, 1, 3.0), ("q1", 10, 2, 2.0), ("q1", 20, 3, 1.0)],
        "qid string, doc_id long, rank int, score double",
    )
    line = permutation_map(pre, post).collect()[0]["line"]
    assert line == "q1\t1>2,2>3,3>1"


def test_shuffled_runs_single_doc_query(spark):
    """ADVICE r1: a query whose list has exactly one doc must not crash
    the shuffle sampler (no swap partner exists -> identity list)."""
    from lucene_msmarco_spark.operators.stochastic import shuffled_runs

    run = spark.createDataFrame(
        [("q1", 7, 1, 3.0, 1), ("q2", 1, 1, 9.0, 0), ("q2", 2, 2, 8.0, 1)],
        "qid string, doc_id long, rank int, score double, rel int",
    )
    out = shuffled_runs(run, num_samples=2, num_shuffles=5).collect()
    q1 = [r for r in out if r.qid == "q1"]
    assert len(q1) == 2 and all(r.doc_id == 7 for r in q1)


def test_composite_qid_rejects_hash(spark):
    """ADVICE r1: a real qid containing the reserved '#' delimiter must
    fail fast, not silently mis-group per-sample correlations."""
    import pytest
    from lucene_msmarco_spark.operators.qpp import composite_qid

    df = spark.createDataFrame(
        [("q#1", 0)], "qid string, sample int"
    ).select(composite_qid().alias("k"))
    with pytest.raises(Exception, match="reserved delimiter"):
        df.collect()
