"""Golden-run test (SURVEY.md §5): a committed TREC res file produced by
the pure-Python oracle is reproduced by the engine, and the res
reader/writer round-trips it (S6/S9) — the engine's analog of the
reference's checked-in ``BM25.2019.res`` ground truth."""

from __future__ import annotations

import os

import pytest

from lucene_msmarco_spark.operators.index import assign_doc_ids, build_index
from lucene_msmarco_spark.operators.retrieval import search
from lucene_msmarco_spark.sources.readers import read_res
from lucene_msmarco_spark.sources.transcripts import transcripts_local
from lucene_msmarco_spark.sources.writers import write_trec_run

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "bm25_300turns.res")
QUERIES = [
    ("q1", "ricufex kekegra report"),
    ("q2", "zedzedwi rigrasto bicubi cugramo"),
    ("q5", "yacuv biripol yacuv"),
    ("q6", "tamori polgrake verlu"),
]


def _load_golden():
    rows = []
    for ln in open(GOLDEN).read().splitlines():
        qid, _, doc, rank, score, _ = ln.split("\t")
        rows.append((qid, int(doc), int(rank), float(score)))
    return rows


def test_engine_reproduces_golden(spark):
    pdf = transcripts_local(300, seed=42)
    docs = assign_doc_ids(spark.createDataFrame(pdf),
                          ["conv_id", "turn_idx"])
    idx = build_index(docs, analyzer="english")
    qdf = spark.createDataFrame(QUERIES, "qid string, qtext string")
    run = search(idx, qdf, model="bm25", k=10).orderBy(
        "qid", "rank").collect()
    golden = _load_golden()
    assert len(run) == len(golden)
    for got, (qid, doc, rank, score) in zip(run, golden):
        assert (got["qid"], got["doc_id"], got["rank"]) == (qid, doc, rank)
        assert round(got["score"], 4) == pytest.approx(score, abs=1e-4)


def test_res_reader_header_keeps_duplicate_lines(spark, tmp_path):
    """has_header drops exactly the first line — duplicate 2-col data
    lines must survive (a set subtract would collapse them)."""
    p = tmp_path / "dup.res"
    p.write_text("qid docid\nq1 d7\nq1 d7\nq1 d3\n")
    got = read_res(spark, str(p), has_header=True).orderBy("rank").collect()
    assert [(r["qid"], r["doc_id"], r["rank"]) for r in got] == [
        ("q1", "d7", 1), ("q1", "d7", 2), ("q1", "d3", 3)
    ]


def test_res_reader_writer_roundtrip(spark, tmp_path):
    golden_df = read_res(spark, GOLDEN)
    assert golden_df.count() == 40
    out = str(tmp_path / "rt.res")
    write_trec_run(
        golden_df.withColumn("doc_id", golden_df["doc_id"].cast("long")),
        out, run_name="oracle",
    )
    back = read_res(spark, out).orderBy("qid", "rank").collect()
    orig = golden_df.orderBy("qid", "rank").collect()
    assert len(back) == len(orig)
    for a, b in zip(back, orig):
        assert (a["qid"], a["doc_id"], a["rank"]) == (
            b["qid"], b["doc_id"], b["rank"]
        )
        assert a["score"] == pytest.approx(b["score"], abs=1e-4)
