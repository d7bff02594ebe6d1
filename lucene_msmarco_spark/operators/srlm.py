"""Supervised relevance models + KNN-query feedback (SURVEY.md §2.5
F8-F10, F12; reference ``retrieval/SupervisedRLM.java`` and
``retrieval/KNNRelModel.java``).

Semantics pinned from the reference (quirks reproduced on purpose):

F8 fit — ``SupervisedRLM.java:151-187`` + ``TermDistribution.java:25-43``:
   query terms come from a RAW whitespace split of the query text (NOT
   the analyzer), with multiplicity (a repeated term accumulates twice);
   for each (train query, rel doc): coocc[q][w] += P(q|d)·P(w|d) over
   the doc's L2-normalized LM term weights (feedback.lm_doc_vectors,
   ``makeLMTermWts`` ``SupervisedRLM.java:64-119``); contributions where
   P(q|d)=0 are dropped. ``normalizeCooccurStats``
   (``SupervisedRLM.java:188-200``) is a NO-OP in the reference (the
   collected stream is discarded) — the engine likewise does not
   normalize.
   prune — ``SupervisedRLM.java:132-140``: keep top NUM_TOP_TERMS=5
   coterms per qterm by weight (reference tie order is HashMap-
   nondeterministic; pinned here to coterm asc).

F9 rerank — ``SupervisedRLM.java:241-270``: score' = score ·
   Σ_q dot(coocc[q], docvec) — ``cosineSim``
   (``TermDistribution.java:63-78``) is a plain dot product over the
   distribution's support (no norm division; doc vecs are L2-normalized
   at construction). Sort desc, stable on ties -> pinned (score desc,
   prior rank asc).

F10 KNN-centroid rerank — ``KNNRelModel.java:524-574``: centroid =
   Σ_{knn query v} Σ_{rel doc d of v} sim_v · docvec_d, L2-normalized;
   score' = score · dot(centroid, docvec).

F12 KNN pseudo-rel top-docs — ``KNNRelModel.java:576-608``: the union of
   (a) rel docs of the KNN queries at uniform weight 1/|R| and (b) the
   retrieved docs at score/Σscores becomes the pseudo top-docs list
   (rel docs FIRST in list order) fed to the RM-conditional + KL chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import EngineConfig
from .feedback import (
    kl_div_rerank,
    rm_conditional_weights,
    top_docs_term_stats,
)
from .index import InvertedIndex


def raw_query_terms(queries: DataFrame) -> DataFrame:
    """(qid, term, qtf) from a RAW whitespace split (``qText.split("\\s+")``)
    — the SRLM paths do NOT analyze the query (fit ``SupervisedRLM.java:157``,
    rerank ``:242``)."""
    exploded = queries.select(
        "qid",
        F.explode(F.split(F.col("qtext"), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")
    return exploded.groupBy("qid", "term").agg(
        F.count(F.lit(1)).cast("double").alias("qtf")
    )


def srlm_fit(
    lm_vecs: DataFrame,
    train_queries: DataFrame,
    qrels: DataFrame,
    num_top_terms: int = 5,
    prune_model: bool = True,
    rank_round: int | None = None,
) -> DataFrame:
    """F8 -> model (qterm, coterm, wt).

    ``lm_vecs``: (doc_id, term, w) from feedback.lm_doc_vectors;
    ``train_queries``: (qid, qtext); ``qrels``: (qid, doc_id, rel>0 rows).
    ``rank_round``: when set, the top-``num_top_terms`` prune ranks on
    ``round(wt, rank_round)`` (coterm tie-break) — the contract-query
    device; kept wt values stay raw.
    """
    qterms = raw_query_terms(train_queries)
    rel_pairs = qrels.filter(F.col("rel") > 0).select("qid", "doc_id")
    # P(q|d) per (qid, qterm, rel doc)
    pqd = (
        qterms.join(rel_pairs, "qid")
        .join(
            lm_vecs.select(
                F.col("doc_id"), F.col("term"), F.col("w").alias("p_q_d")
            ),
            ["doc_id", "term"],
        )
    )
    # cross with the doc's full vector: coocc contribution qtf·P(q|d)·P(w|d)
    contrib = pqd.join(
        lm_vecs.select(
            "doc_id", F.col("term").alias("coterm"), F.col("w").alias("p_w_d")
        ),
        "doc_id",
    ).select(
        F.col("term").alias("qterm"),
        "coterm",
        (F.col("qtf") * F.col("p_q_d") * F.col("p_w_d")).alias("c"),
    ).filter(F.col("c") > 0)
    model = contrib.groupBy("qterm", "coterm").agg(F.sum("c").alias("wt"))
    if not prune_model:
        return model
    wt_key = (
        F.round(F.col("wt"), rank_round)
        if rank_round is not None else F.col("wt")
    )
    w = Window.partitionBy("qterm").orderBy(
        wt_key.desc(), F.col("coterm").asc()
    )
    return (
        model.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= num_top_terms)
        .drop("r")
    )


def _rerank_by_dot(
    run: DataFrame, dots: DataFrame, rank_round: int | None = None,
) -> DataFrame:
    """score' = score · dot (missing dot -> 0, as the reference sums
    nothing); resort (score' desc, prior rank asc). ``rank_round``:
    rank on ``round(score', rank_round)`` — the contract device."""
    rescored = (
        run.select(
            "qid", "doc_id", F.col("rank").alias("prev_rank"),
            F.col("score").alias("prev_score"),
        )
        .join(dots, ["qid", "doc_id"], "left")
        .withColumn(
            "score",
            F.col("prev_score") * F.coalesce(F.col("dot"), F.lit(0.0)),
        )
    )
    score_key = (
        F.round(F.col("score"), rank_round)
        if rank_round is not None else F.col("score")
    )
    w = Window.partitionBy("qid").orderBy(
        score_key.desc(), F.col("prev_rank").asc()
    )
    return rescored.select(
        "qid", "doc_id", F.row_number().over(w).alias("rank"), "score"
    )


def srlm_rerank(
    run: DataFrame,
    queries: DataFrame,
    model: DataFrame,
    lm_vecs: DataFrame,
    rank_round: int | None = None,
) -> DataFrame:
    """F9 -> (qid, doc_id, rank, score)."""
    qterms = raw_query_terms(queries)
    qmodel = qterms.join(
        model.withColumnRenamed("qterm", "term"), "term"
    ).select(
        "qid", "coterm", (F.col("qtf") * F.col("wt")).alias("wt")
    )
    cand_vecs = run.select("qid", "doc_id").join(lm_vecs, "doc_id")
    dots = cand_vecs.join(
        qmodel.withColumnRenamed("coterm", "term"), ["qid", "term"]
    ).groupBy("qid", "doc_id").agg(
        F.sum(F.col("wt") * F.col("w")).alias("dot")
    )
    return _rerank_by_dot(run, dots, rank_round=rank_round)


def knn_centroid_rerank(
    run: DataFrame,
    knn_queries: DataFrame,
    qrels: DataFrame,
    lm_vecs: DataFrame,
    rank_round: int | None = None,
) -> DataFrame:
    """F10 -> reranked run. ``knn_queries``: (qid, ref_qid, sim) — the
    K nearest training queries of each test query with their similarity
    to the original (``simWithOrig``). ``rank_round``: rank the rerank
    on ``round(score', rank_round)`` (the contract-query device, as F9)."""
    rel_docs = qrels.filter(F.col("rel") > 0).select(
        F.col("qid").alias("ref_qid"), "doc_id"
    )
    weighted = knn_queries.join(rel_docs, "ref_qid").join(
        lm_vecs, "doc_id"
    ).select("qid", "term", (F.col("sim") * F.col("w")).alias("c"))
    centroid = weighted.groupBy("qid", "term").agg(F.sum("c").alias("c"))
    norms = centroid.groupBy("qid").agg(
        F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("l2")
    )
    centroid = centroid.join(norms, "qid").select(
        "qid", "term", (F.col("c") / F.col("l2")).alias("cw")
    )
    cand_vecs = run.select("qid", "doc_id").join(lm_vecs, "doc_id")
    dots = cand_vecs.join(centroid, ["qid", "term"]).groupBy(
        "qid", "doc_id"
    ).agg(F.sum(F.col("cw") * F.col("w")).alias("dot"))
    return _rerank_by_dot(run, dots, rank_round=rank_round)


def knn_pseudo_rel_rerank(
    index: InvertedIndex,
    run: DataFrame,
    knn_queries: DataFrame,
    qrels: DataFrame,
    cfg: EngineConfig = EngineConfig(),
    rank_round: int | None = None,
) -> DataFrame:
    """F12 -> reranked run: pseudo top-docs = KNN rel docs (uniform
    weight, sum 1, listed first) + retrieved docs (score-sum-normalized),
    fed to the RM-conditional + KL-div chain, which reranks the ORIGINAL
    run. ``rank_round`` is forwarded to the KL rerank (contract-query
    device)."""
    rel_docs = (
        knn_queries.join(
            qrels.filter(F.col("rel") > 0).select(
                F.col("qid").alias("ref_qid"), "doc_id"
            ),
            "ref_qid",
        )
        .select("qid", "doc_id")
        .distinct()
    )
    n_rel = rel_docs.groupBy("qid").agg(F.count(F.lit(1)).alias("n"))
    rel_part = rel_docs.join(n_rel, "qid").select(
        "qid", "doc_id", (F.lit(1.0) / F.col("n")).alias("sim"),
        F.lit(0).alias("grp"), F.col("doc_id").alias("ord"),
    )
    score_sums = run.groupBy("qid").agg(F.sum("score").alias("z"))
    ret_part = run.join(score_sums, "qid").select(
        "qid", "doc_id", (F.col("score") / F.col("z")).alias("sim"),
        F.lit(1).alias("grp"), F.col("rank").cast("long").alias("ord"),
    )
    combined = rel_part.unionByName(ret_part)
    w = Window.partitionBy("qid").orderBy("grp", "ord")
    pseudo = combined.select(
        "qid", "doc_id", F.col("sim").alias("score"),
        F.row_number().over(w).alias("rank"),
    )
    stats = top_docs_term_stats(index, pseudo, cfg.feedback.num_top_docs)
    wts = rm_conditional_weights(stats, cfg.feedback)
    # the KL rerank scores the ORIGINAL retrieved list, so the doc-vector
    # side must cover the run's docs: reuse stats with the run's vectors
    run_stats = top_docs_term_stats(index, run, cfg.feedback.num_top_docs)
    return kl_div_rerank(run_stats, wts, run, rank_round=rank_round)


def knn_query_search(
    query_index: InvertedIndex,
    test_queries: DataFrame,
    k: int = 5,
    model: str = "lmdir",
    cfg: EngineConfig = EngineConfig(),
    exclude_self: bool = True,
    rank_round: int | None = None,
) -> DataFrame:
    """Q10 — retrieve the top-k nearest TRAINING queries for each test
    query from a queries-as-documents index (``retrieval/
    MsMarcoQuery.java:85-113``, ``KNNRelModel.java:56-62,102-128``), with
    similarities normalized to sum 1 per test query. ``query_index``:
    an index built over (doc_id=train row id, text=train qtext) with a
    ``ref_qid`` column on its docs table. Returns (qid, ref_qid, sim).
    ``rank_round``: neighbor selection ranks on the rounded retrieval
    score (the contract-query device)."""
    from .retrieval import search as _search

    run = _search(query_index, test_queries, model=model, k=k + 1, cfg=cfg,
                  rank_round=rank_round)
    mapped = run.join(
        query_index.docs.select("doc_id", "ref_qid"), "doc_id"
    )
    if exclude_self:
        mapped = mapped.filter(F.col("qid") != F.col("ref_qid"))
    w = Window.partitionBy("qid").orderBy("rank")
    topk = mapped.withColumn("r2", F.row_number().over(w)).filter(
        F.col("r2") <= k
    )
    sums = topk.groupBy("qid").agg(F.sum("score").alias("z"))
    return topk.join(sums, "qid").select(
        "qid", "ref_qid", (F.col("score") / F.col("z")).alias("sim")
    )
