"""BPE train/encode (T4) vs the hand-computed classic fixture, plus the
reference's encode -> whitespace-index -> mu-sweep flow
(tokenization/bpe_msmarco.sh)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_msmarco_spark.functions.bpe import (
    BPEModel,
    bpe_encode_text,
    bpe_encode_tokens,
    train_bpe,
)

# Sennrich et al.'s classic corpus: low x5, lower x2, newest x6, widest x3
CORPUS = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)


@pytest.fixture(scope="module")
def model(spark):
    docs = spark.createDataFrame([(0, CORPUS)], "doc_id long, text string")
    return train_bpe(docs, num_merges=5)


def test_merges_match_hand_computation(model):
    # iteration-by-iteration by hand (ties -> lexicographically smallest):
    # es(9) -> est(9) -> est</w>(9) -> lo(7) -> low(7)
    assert model.merges == [
        ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w"),
    ]


def test_encode_word(model):
    assert model.encode_word("lowest") == ["low", "est"]
    assert model.encode_word("low") == ["low"]
    # unseen characters fall back to character pieces
    assert model.encode_word("xy") == ["x", "y"]
    assert model.encode_word("") == []


def test_encode_text_order_preserved(spark, model):
    docs = spark.createDataFrame(
        [(1, "lowest low slowest")], "doc_id long, text string"
    )
    out = bpe_encode_text(docs, model).collect()[0]["bpe_text"]
    # 'slowest': s,l,o,w,e,s,t,</w> -> es first? greedy by rank:
    # es(r0) -> est(r1) -> est</w>(r2) -> lo(r3) -> low? 'l','o' merge
    # then ('lo','w') -> 'low' => s + low + est
    assert out == "low est low s low est"


def test_encode_tokens_counts(spark, model):
    docs = spark.createDataFrame(
        [(1, "lowest lowest low")], "doc_id long, text string"
    )
    toks = bpe_encode_tokens(docs, model).groupBy("term").count().collect()
    counts = {r["term"]: r["count"] for r in toks}
    assert counts == {"low": 3, "est": 2}


def test_model_save_load_roundtrip(tmp_path, model):
    p = str(tmp_path / "bpe.json")
    model.save(p)
    loaded = BPEModel.load(p)
    assert loaded.merges == model.merges
    assert loaded.encode_word("lowest") == ["low", "est"]


def test_bpe_index_mu_sweep(spark, model):
    """The reference's end-to-end: encode collection -> index encoded
    text with the whitespace analyzer -> sweep LM-Dirichlet mu."""
    from lucene_msmarco_spark.operators.experiments import mu_sweep
    from lucene_msmarco_spark.operators.index import build_index

    rows = [
        (0, "lowest newest gadget"),
        (1, "low gadget gadget"),
        (2, "widest newest low"),
        (3, "unrelated text here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    enc = bpe_encode_text(docs, model)
    idx = build_index(
        enc, text_col="bpe_text", analyzer="whitespace", cache=False
    )
    queries = spark.createDataFrame(
        [("q1", " ".join(
            sum((model.encode_word(w) for w in ["lowest", "gadget"]), [])
        ))],
        "qid string, qtext string",
    )
    qrels = spark.createDataFrame(
        [("q1", 0, 3), ("q1", 1, 2)], "qid string, doc_id long, rel int"
    )
    res = mu_sweep(idx, queries, qrels, mus=(100.0, 1000.0), k=4)
    assert set(res["metrics"]) == {100.0, 1000.0}
    assert res["best_metric"] >= 0.0
