"""Physical-plan regression tests: broadcast joins where designed,
bounded shuffle counts, column pruning into the parquet scan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_msmarco_spark.operators.index import assign_doc_ids, build_index
from lucene_msmarco_spark.operators.retrieval import (
    compile_queries,
    score_queries,
    search,
)
from lucene_msmarco_spark.plans.inspect import (
    assert_no_cartesian,
    plan_summary,
)
from lucene_msmarco_spark.sources.transcripts import transcripts_local

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _fresh_cache(spark):
    """Earlier test modules cache the same parquet paths; Spark then
    substitutes InMemoryTableScan for the file scan and the pushdown
    assertions below would inspect the cache, not the scan."""
    spark.catalog.clearCache()
    yield


@pytest.fixture(scope="module")
def idx(spark):
    pdf = transcripts_local(300, seed=42)
    docs = assign_doc_ids(spark.createDataFrame(pdf), ["conv_id", "turn_idx"])
    return build_index(docs, analyzer="english")


@pytest.fixture(scope="module")
def qdf(spark):
    return spark.createDataFrame(
        [("q1", "ricufex kekegra"), ("q2", "tamori verlu")],
        "qid string, qtext string",
    )


def test_scoring_joins_broadcast_query_side(idx, qdf):
    """The postings-side join must be a broadcast hash join — the
    postings table must never shuffle at query time (SURVEY.md §3.2)."""
    scored = score_queries(idx, qdf, model="bm25")
    s = plan_summary(scored)
    assert s.n_broadcast_joins >= 2, s.text  # stats join + postings join
    assert s.n_sortmerge_joins == 0, s.text


def test_search_shuffle_budget(idx, qdf):
    """Full search = scoring + final agg + top-k window: the per-(qid,
    doc) aggregation and the per-qid window each shuffle once; nothing
    else may."""
    run = search(idx, qdf, model="bm25", k=10, strategy="window")
    s = plan_summary(run)
    assert s.n_broadcast_joins >= 2, s.text
    assert s.n_exchanges <= 2, s.text
    assert_no_cartesian(run)


def test_english_build_is_exchange_free(spark):
    """THE scale contract of the index build: with the doc store
    hash(doc_id)-clustered by assign_doc_ids, the whole english pipeline
    (tokenize -> (doc_id, raw) aggregation -> fused stem/merge/doclen
    finisher) plans as ONE stage with ZERO exchanges above the doc-store
    scan — the token stream, the largest intermediate at 10^12 turns,
    never crosses the wire. The only build shuffle is the doc-store
    write inside assign_doc_ids itself."""
    pdf = transcripts_local(300, seed=7)
    docs = assign_doc_ids(spark.createDataFrame(pdf), ["conv_id", "turn_idx"])
    idx = build_index(docs, analyzer="english", cache=False)
    plan = idx.tokens._jdf.queryExecution().executedPlan().toString()
    above_store = plan.split("InMemoryTableScan", 1)[0]
    assert "Exchange" not in above_store, above_store
    assert "MapInPandas" in above_store, above_store


def test_parquet_scan_prunes_columns(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    narrow = docs.select("doc_id")
    s = plan_summary(narrow)
    assert any(
        "doc_id" in rs and "text" not in rs for rs in s.read_schemas
    ), s.text


def test_parquet_filter_pushdown(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    filtered = docs.filter(F.col("doc_id") > 100).select("doc_id")
    s = plan_summary(filtered)
    assert any("GreaterThan" in pf for pf in s.pushed_filters), s.text


def test_wholestage_codegen_covers_scoring(idx, qdf):
    scored = score_queries(idx, qdf, model="bm25")
    s = plan_summary(scored)
    assert s.wholestage_codegen_spans >= 1, s.text
