"""Batch retrieval — disjunctive (OR-of-terms) scored search over the
inverted index (Q1-Q8 of SURVEY.md §2.4).

The reference loops query-by-query through Lucene
(``retrieval/OneStepRetriever.java:109-123``); Spark-idiomatic is ONE job
for the whole query set:

    queries --tokenize--> query_terms(qid, term, qtf[, weight])
      --broadcast join--> term_stats (df, cf)          [tiny x vocab join]
      --broadcast join--> tokens(term, doc_id, tf, doclen)
      --column math-->    per-(term,doc) contribution
      --hash agg-->       groupBy(qid, doc_id).sum                (partial+final)
      --top-k-->          two-phase scatter-gather or window rank

The query-term table after the stats join is tiny (queries x terms rows),
so the join against the big postings table is an explicit ``broadcast()``
hash join on ``term`` — the postings side never shuffles. This is the
"postings semi-join IS the skip" property (SURVEY.md §4): only (term, doc)
rows matching query terms flow out of the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import EngineConfig
from ..functions.analysis import (
    not_stopword,
    simple_tokens_col,
    tokenize_english,
    whitespace_tokens_col,
)
from ..functions.scoring import (
    bm25_weight,
    lm_dirichlet_weight,
    lm_jm_weight,
    tfidf_weight,
)
from .index import InvertedIndex
from .topk import topk


def compile_queries(
    queries: DataFrame,
    analyzer: str = "english",
    qid_col: str = "qid",
    qtext_col: str = "qtext",
) -> DataFrame:
    """Q1 — analyze query text into a weighted term bag (qid, term, qtf).

    Duplicate tokens are kept as multiplicity ``qtf`` (the reference's
    ``makeQuery`` adds one SHOULD TermQuery per occurrence —
    ``retrieval/MsMarcoQuery.java:74-83`` — so scores sum per occurrence).
    NO number folding on queries (the T2 doc/query asymmetry).
    """
    text = F.col(qtext_col)
    if analyzer == "english":
        exploded = queries.select(
            qid_col, F.explode(tokenize_english(text)).alias("term")
        )
    elif analyzer == "simple":
        exploded = queries.select(
            qid_col, F.explode(simple_tokens_col(text)).alias("term")
        ).filter(not_stopword(F.col("term")))
    elif analyzer == "whitespace":
        exploded = queries.select(
            qid_col, F.explode(whitespace_tokens_col(text)).alias("term")
        ).filter(F.col("term") != "")
    else:
        raise ValueError(f"unknown analyzer {analyzer!r}")
    return exploded.groupBy(qid_col, "term").agg(
        F.count(F.lit(1)).cast("double").alias("qtf")
    )


def score_contributions(
    index: InvertedIndex,
    query_terms: DataFrame,
    model: str = "bm25",
    cfg: EngineConfig = EngineConfig(),
) -> DataFrame:
    """Per-(qid, term, doc) weighted contribution rows.

    ``query_terms``: (qid, term, qtf) and optionally ``weight`` (Q2 boosts,
    used by feedback expansion); effective multiplier = qtf * weight.
    """
    qt = query_terms
    if "weight" not in qt.columns:
        qt = qt.withColumn("weight", F.lit(1.0))
    # join 1: tiny query-term table x term_stats — broadcast the query side
    qt_stats = index.term_stats.join(
        F.broadcast(qt), "term", "inner"
    )
    # join 2: broadcast enriched query terms into the postings scan
    hits = index.tokens.join(F.broadcast(qt_stats), "term", "inner")

    s = index.stats
    tf, df, cf, doclen = (
        F.col("tf").cast("double"),
        F.col("df").cast("double"),
        F.col("cf").cast("double"),
        F.col("doclen").cast("double"),
    )
    if model == "bm25":
        w = bm25_weight(tf, df, doclen, float(s.n_docs), s.avgdl, cfg.bm25)
    elif model == "lmdir":
        w = lm_dirichlet_weight(tf, cf, doclen, float(s.total_cf), cfg.lmdir)
    elif model == "lmjm":
        w = lm_jm_weight(tf, df, doclen, float(s.n_docs), cfg.lmjm)
    elif model == "tfidf":
        w = tfidf_weight(tf, df, float(s.n_docs))
    else:
        raise ValueError(f"unknown model {model!r}")

    return hits.select(
        "qid",
        "doc_id",
        (w * F.col("qtf") * F.col("weight")).alias("contrib"),
    )


def search(
    index: InvertedIndex,
    queries: DataFrame,
    model: str = "bm25",
    k: int | None = None,
    cfg: EngineConfig = EngineConfig(),
    strategy: str = "window",
    analyzer: str | None = None,
    precompiled_terms: DataFrame | None = None,
    rank_round: int | None = None,
) -> DataFrame:
    """Q3 — batch top-k search. Returns (qid, doc_id, rank, score).

    ``rank_round``: rank on ``round(score, rank_round)`` (doc
    tie-break); window strategy only — the contract-query device."""
    k = k or cfg.num_wanted
    scored = score_queries(
        index, queries, model, cfg, analyzer=analyzer,
        precompiled_terms=precompiled_terms,
    )
    return topk(scored, k, strategy=strategy, rank_round=rank_round).select(
        "qid", "doc_id", "rank", "score"
    )


def score_queries(
    index: InvertedIndex,
    queries: DataFrame | None,
    model: str = "bm25",
    cfg: EngineConfig = EngineConfig(),
    analyzer: str | None = None,
    precompiled_terms: DataFrame | None = None,
) -> DataFrame:
    """Exhaustive scoring without the top-k cut: (qid, doc_id, score)."""
    qt = (
        precompiled_terms
        if precompiled_terms is not None
        else compile_queries(queries, analyzer or index.analyzer)
    )
    contribs = score_contributions(index, qt, model, cfg)
    return contribs.groupBy("qid", "doc_id").agg(
        F.sum("contrib").alias("score")
    )


def induce_scores(
    index: InvertedIndex,
    run: DataFrame,
    queries: DataFrame,
    model: str = "lmjm",
    cfg: EngineConfig = EngineConfig(),
    analyzer: str | None = None,
) -> DataFrame:
    """Q8 — re-score an externally-given ranked list (e.g. a minimalist
    2-column res file) with a term-weight sum over the query terms, then
    re-rank (``qrels/RetrievedResults.java:51-96``; the reference uses
    LM-JM with lambda at the call site). Docs whose text shares no term
    with the query score 0. Returns (qid, doc_id, rank, score)."""
    from pyspark.sql import Window

    qt = compile_queries(queries, analyzer or index.analyzer)
    contribs = score_contributions(index, qt, model, cfg)
    cand = run.select("qid", "doc_id")
    scored = cand.join(contribs, ["qid", "doc_id"], "left").groupBy(
        "qid", "doc_id"
    ).agg(F.coalesce(F.sum("contrib"), F.lit(0.0)).alias("score"))
    w = Window.partitionBy("qid").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return scored.select(
        "qid", "doc_id", F.row_number().over(w).alias("rank"), "score"
    )
