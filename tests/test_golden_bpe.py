"""BPE-retrieval end-to-end golden: the reference's
``tokenization/bpe_msmarco.sh:1-63`` flow — train BPE on the collection,
re-encode passages as whitespace-joined subwords, index them with the
whitespace analyzer, sweep LM-Dirichlet mu — run through the SPARK
engine (functions/bpe.py -> operators/index.build_index ->
operators/experiments.mu_sweep) and compared against the committed
pure-Python golden (tests/golden/gen_bpe_golden.py — regenerate with
that script)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from lucene_msmarco_spark.entry_queries import QUERYSET
from lucene_msmarco_spark.functions.bpe import (
    bpe_encode_text,
    train_bpe,
)
from lucene_msmarco_spark.operators.experiments import mu_sweep
from lucene_msmarco_spark.operators.index import build_index
from lucene_msmarco_spark.operators.retrieval import search

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "bpe_musweep.json")


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def ctx(spark, golden):
    docs = spark.read.parquet(
        f"{golden['sf_dir']}/documents.parquet"
    ).select("doc_id", "text")
    model = train_bpe(docs, num_merges=golden["num_merges"])
    enc_docs = bpe_encode_text(docs, model).cache()
    # the reference indexes the encoded file with a WhitespaceAnalyzer
    # and NO further transform — in particular no number folding
    idx = build_index(
        enc_docs, text_col="bpe_text", analyzer="whitespace",
        fold_numbers=False,
    )
    qdf = spark.createDataFrame(QUERYSET, "qid string, qtext string")
    enc_q = (
        bpe_encode_text(qdf, model, text_col="qtext", id_col="qid")
        .select(F.col("doc_id").alias("qid"),
                F.col("bpe_text").alias("qtext"))
    )
    qrels = spark.createDataFrame(
        [tuple(r) for r in golden["qrels"]], "qid string, doc_id long, rel int"
    )
    return {"model": model, "idx": idx, "enc_q": enc_q, "qrels": qrels}


def test_trained_merges_match_pure_python(ctx, golden):
    # pins the Spark (word, freq) aggregation feeding the merge loop
    assert [list(m) for m in ctx["model"].merges] == golden["merges"]


def test_encoded_queries_match(ctx, golden):
    got = {r["qid"]: r["qtext"] for r in ctx["enc_q"].collect()}
    assert got == golden["encoded_queries"]


def test_mu_sweep_best_mu_and_maps(ctx, golden):
    res = mu_sweep(
        ctx["idx"], ctx["enc_q"], ctx["qrels"],
        mus=tuple(golden["mus"]), metric_col="map", k=golden["k"],
    )
    assert res["best_mu"] == golden["best_mu"]
    for mu, want in golden["maps"].items():
        assert res["metrics"][float(mu)] == pytest.approx(want, abs=1e-8)


def test_best_mu_run_topk_rank_exact(ctx, golden):
    from dataclasses import replace

    from lucene_msmarco_spark.config import (
        EngineConfig,
        LMDirichletConfig,
    )

    cfg = replace(EngineConfig(),
                  lmdir=LMDirichletConfig(mu=golden["best_mu"]))
    run = search(ctx["idx"], ctx["enc_q"], model="lmdir", k=10, cfg=cfg)
    got: dict[str, list] = {}
    for r in run.collect():
        got.setdefault(r["qid"], []).append(
            (r["rank"], r["doc_id"], r["score"])
        )
    for qid, want in golden["best_run_top10"].items():
        rows = sorted(got.get(qid, []))
        assert [(r[1], r[0]) for r in rows] == [
            (d, rk) for d, rk, _s in want
        ], f"rank mismatch for {qid}"
        for (_rk, _d, score), (_wd, _wr, wscore) in zip(rows, want):
            assert score == pytest.approx(wscore, abs=1e-6)
