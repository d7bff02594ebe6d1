"""Pseudo-relevance feedback / reranking (SURVEY.md §2.5, F1-F11) as
whole-query-set DataFrame jobs (the reference loops query-by-query).

Formula provenance (/root/reference/src/main/java):

F1 top-docs term stats — ``fdbk/RetrievedDocsTermStats.java:51-105``:
   per-doc vectors (term, tf, sum_tf=doclen, sim=retrieval score) for ALL
   retrieved docs; vocabulary stats (tf summed, df) over the top-numTopDocs
   docs only. QUIRKS reproduced exactly:
   - ``sumDf`` is the CONSTANT numTopDocs (``:39``), not a sum of dfs;
   - ``sumSim`` accumulates sim once per DISTINCT TERM of each top doc
     (``:102`` sits inside the terms loop), i.e. sum(sim_d * |vocab_d|).

F2 RM1 i.i.d. — ``fdbk/RelevanceModelIId.java:66-104``:
   p_w  = lam*tf_w/sumTf + (1-lam)*df_w/numTopDocs        (lam=0.9)
   K(q) = ln(1 + tf_q/sumTf)  over the query's terms found in the vocab
   wt_w = p_w * exp(sum_q K(q) - 1)

F3 RM conditional — ``fdbk/RelevanceModelConditional.java:26-57``:
   wt_w = sum_{d in top docs, tf_{w,d}>0}
          [lam*tf_{w,d}/doclen_d + (1-lam)*df_w/numTopDocs] * sim_d/sumSim

F4 KL-div rerank — ``fdbk/KLDivReranker.java:18-46``:
   score(d) = 1 - exp( sum_{w: tf_{w,d}>0} wt_w * ln(wt_w/(tf_{w,d}/doclen_d)) )
   sorted desc; ties keep prior rank order (Java stable sort) -> pinned
   tiebreak (score desc, prior rank asc).

F5 RLM expansion — ``fdbk/RelevanceModelIId.java:119-175``:
   wt_w *= ln(N/df_collection(w)); normalize by the sum over the WHOLE
   vocab; take top numTerms non-original terms; expanded query = distinct
   orig terms @ (1-fbweight) (multiplicity collapses to 1) + expansion
   terms @ fbweight*wt. Tie order pinned (wt desc, term asc; the reference
   inherits HashMap iteration order — nondeterministic there).

F7 LM doc vectors — ``retrieval/SupervisedRLM.java:64-119``:
   w(t,d) = ln(1 + (lam/(1-lam)) * (tf/doclen) * (N/df)), lam=0.9,
   then L2-normalized per doc.

F11 Rocchio — ``retrieval/KNNRelModel.java:297-360``:
   q' = alpha*q + (beta/|R|)*sum(rel vecs) - (gamma/|NR|)*sum(nonrel vecs),
   keep positive weights, top numTerms.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import EngineConfig, FeedbackConfig
from .index import InvertedIndex
from .retrieval import compile_queries, search
from .topk import topk


@dataclass
class TopDocsTermStats:
    """F1 artifact bundle; every frame is keyed by qid (batch of queries)."""

    doc_vecs: DataFrame    # qid, doc_id, rank, sim, term, tf, doclen (ALL retrieved)
    term_stats: DataFrame  # qid, term, tf_top, df_top  (top num_top_docs only)
    sums: DataFrame        # qid, sum_tf, sum_sim       (reference quirks)
    num_top_docs: int


def top_docs_term_stats(
    index: InvertedIndex, run: DataFrame, num_top_docs: int
) -> TopDocsTermStats:
    """F1 — ``run``: (qid, doc_id, rank, score)."""
    doc_vecs = (
        run.withColumnRenamed("score", "sim")
        .join(index.tokens, "doc_id")
        .select("qid", "doc_id", "rank", "sim", "term", "tf", "doclen")
    )
    top = doc_vecs.filter(F.col("rank") <= num_top_docs)
    term_stats = top.groupBy("qid", "term").agg(
        F.sum("tf").alias("tf_top"),
        F.count(F.lit(1)).alias("df_top"),  # one row per (doc,term) => df
    )
    sums = top.groupBy("qid").agg(
        F.sum("tf").alias("sum_tf"),
        F.sum("sim").alias("sum_sim"),  # sim once per (doc, DISTINCT term)
    )
    return TopDocsTermStats(doc_vecs, term_stats, sums, num_top_docs)


def rm1_iid_weights(
    stats: TopDocsTermStats,
    query_terms: DataFrame,
    cfg: FeedbackConfig = FeedbackConfig(),
) -> DataFrame:
    """F2 -> (qid, term, wt). ``query_terms``: (qid, term, qtf)."""
    lam = cfg.mixing_lambda
    k = float(stats.num_top_docs)

    # K(q) per query: ln(1 + tf_q/sumTf) for query terms present in vocab
    q_in_vocab = query_terms.select("qid", "term").join(
        stats.term_stats, ["qid", "term"]
    ).join(stats.sums, "qid")
    kq = q_in_vocab.groupBy("qid").agg(
        F.sum(
            F.log(F.lit(1.0) + F.col("tf_top") / F.col("sum_tf"))
        ).alias("total_p_q")
    )

    w = stats.term_stats.join(stats.sums, "qid").join(kq, "qid", "left")
    p_w = (
        F.lit(lam) * F.col("tf_top") / F.col("sum_tf")
        + F.lit(1.0 - lam) * F.col("df_top") / F.lit(k)
    )
    wt = p_w * F.exp(F.coalesce(F.col("total_p_q"), F.lit(0.0)) - F.lit(1.0))
    return w.select("qid", "term", wt.alias("wt"))


def rm_conditional_weights(
    stats: TopDocsTermStats, cfg: FeedbackConfig = FeedbackConfig()
) -> DataFrame:
    """F3 -> (qid, term, wt)."""
    lam = cfg.mixing_lambda
    k = float(stats.num_top_docs)
    top = stats.doc_vecs.filter(F.col("rank") <= stats.num_top_docs)
    enriched = top.join(
        stats.term_stats.select("qid", "term", "df_top"), ["qid", "term"]
    ).join(stats.sums, "qid")
    contrib = (
        F.lit(lam) * F.col("tf") / F.col("doclen")
        + F.lit(1.0 - lam) * F.col("df_top") / F.lit(k)
    ) * F.col("sim") / F.col("sum_sim")
    return enriched.groupBy("qid", "term").agg(
        F.sum(contrib).alias("wt")
    )


def kl_div_rerank(
    stats: TopDocsTermStats, term_weights: DataFrame, run: DataFrame,
    rank_round: int | None = None,
) -> DataFrame:
    """F4 — rerank ALL retrieved docs by 1 - exp(KL); returns
    (qid, doc_id, rank, score).

    ``rank_round``: when set, ranks on ``round(score, rank_round)``
    (prev_rank tie-break) so the ordering is exact under a
    rounded-score total order — the same contract-query device as
    ``bmw_topk``'s ``rank_round`` (sub-ulp libm differences between
    engines cannot flip ranks). Default ``None`` keeps the raw-score
    ordering (the reference's own comparator,
    ``fdbk/KLDivReranker.java``)."""
    joined = stats.doc_vecs.join(term_weights, ["qid", "term"])
    kl_term = F.col("wt") * F.log(
        F.col("wt") / (F.col("tf").cast("double") / F.col("doclen"))
    )
    kl = joined.groupBy("qid", "doc_id").agg(F.sum(kl_term).alias("kl"))
    rescored = (
        run.select("qid", "doc_id", F.col("rank").alias("prev_rank"))
        .join(kl, ["qid", "doc_id"], "left")
        .withColumn(
            "score",
            F.lit(1.0) - F.exp(F.coalesce(F.col("kl"), F.lit(0.0))),
        )
    )
    sort_key = (
        F.round(F.col("score"), rank_round)
        if rank_round is not None else F.col("score")
    )
    w = Window.partitionBy("qid").orderBy(
        sort_key.desc(), F.col("prev_rank").asc()
    )
    return rescored.select(
        "qid", "doc_id",
        F.row_number().over(w).alias("rank"),
        "score",
    )


def rlm_expand_query(
    index: InvertedIndex,
    stats: TopDocsTermStats,
    term_weights: DataFrame,
    query_terms: DataFrame,
    cfg: FeedbackConfig = FeedbackConfig(),
    rank_round: int | None = None,
) -> DataFrame:
    """F5 -> weighted query-term table (qid, term, qtf=1, weight).

    ``rank_round``: when set, the top-``num_expansion_terms`` cutoff
    ranks candidates on ``round(wtn, rank_round)`` (term tie-break) —
    the contract-query device (see ``kl_div_rerank``) making the
    expansion-set membership exact under a rounded total order.
    Default ``None`` keeps the raw-weight ordering
    (``fdbk/RelevanceModelIId.java:156-175``)."""
    fb = cfg.fb_weight
    # wt *= ln(N / df_collection); normalize over the whole vocab
    w = term_weights.join(
        index.term_stats.select("term", "df"), "term"
    ).withColumn(
        "wt2",
        F.col("wt") * F.log(F.lit(float(index.stats.n_docs)) / F.col("df")),
    )
    norm = w.groupBy("qid").agg(F.sum("wt2").alias("z"))
    w = w.join(norm, "qid").withColumn("wtn", F.col("wt2") / F.col("z"))

    orig = query_terms.select("qid", "term").distinct()
    candidates = w.join(orig, ["qid", "term"], "left_anti")
    wtn_key = (
        F.round(F.col("wtn"), rank_round)
        if rank_round is not None else F.col("wtn")
    )
    rank_w = Window.partitionBy("qid").orderBy(
        wtn_key.desc(), F.col("term").asc()
    )
    expansion = (
        candidates.withColumn("r", F.row_number().over(rank_w))
        .filter(F.col("r") <= cfg.num_expansion_terms)
        .select(
            "qid", "term",
            F.lit(1.0).alias("qtf"),
            (F.lit(fb) * F.col("wtn")).alias("weight"),
        )
    )
    orig_weighted = orig.select(
        "qid", "term",
        F.lit(1.0).alias("qtf"),
        F.lit(1.0 - fb).alias("weight"),
    )
    return orig_weighted.unionByName(expansion)


def rlm_rerank(
    index: InvertedIndex,
    queries: DataFrame,
    model: str = "lmdir",
    cfg: EngineConfig = EngineConfig(),
    post_qe: bool = False,
    rank_round: int | None = None,
    rerank_round: int | None = None,
) -> DataFrame:
    """F6 — the RLM driver (``retrieval/KNNRelModel.java:610-620``):
    retrieve -> RM-conditional on top RLM_NUM_TOP_DOCS -> KL rerank ->
    optional expanded re-search. ``rank_round``/``rerank_round`` pin the
    retrieval and KL-rerank orders to rounded score keys (the
    contract-query device); ``None`` keeps the reference's raw
    comparators."""
    run = search(index, queries, model=model, cfg=cfg,
                 rank_round=rank_round)
    qt = compile_queries(queries, index.analyzer)
    stats = top_docs_term_stats(index, run, cfg.feedback.num_top_docs)
    wts = rm_conditional_weights(stats, cfg.feedback)
    reranked = kl_div_rerank(stats, wts, run, rank_round=rerank_round)
    if not post_qe:
        return reranked
    expanded_terms = rlm_expand_query(index, stats, wts, qt, cfg.feedback)
    return search(
        index, queries=None, model=model, cfg=cfg,
        precompiled_terms=expanded_terms, rank_round=rank_round,
    )


def lm_doc_vectors(
    index: InvertedIndex,
    doc_ids: DataFrame | None = None,
    lam: float = 0.9,
) -> DataFrame:
    """F7 -> (doc_id, term, w) L2-normalized LM weights."""
    t = index.tokens
    if doc_ids is not None:
        t = t.join(F.broadcast(doc_ids.select("doc_id").distinct()), "doc_id")
    t = t.join(index.term_stats.select("term", "df"), "term")
    raw = F.log(
        F.lit(1.0)
        + F.lit(lam / (1.0 - lam))
        * (F.col("tf").cast("double") / F.col("doclen"))
        * (F.lit(float(index.stats.n_docs)) / F.col("df"))
    )
    vec = t.select("doc_id", "term", raw.alias("w_raw"))
    norms = vec.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w_raw") * F.col("w_raw"))).alias("l2")
    )
    return vec.join(norms, "doc_id").select(
        "doc_id", "term", (F.col("w_raw") / F.col("l2")).alias("w")
    )


def rocchio_expand(
    query_terms: DataFrame,
    rel_vecs: DataFrame,
    nonrel_vecs: DataFrame | None = None,
    cfg: FeedbackConfig = FeedbackConfig(),
    rank_round: int | None = None,
) -> DataFrame:
    """F11 -> (qid, term, qtf=1, weight); positive weights, top
    num_expansion_terms. ``rel_vecs``/``nonrel_vecs``: (qid, doc_id, term, w).

    ``rank_round``: when set, the top-``num_expansion_terms`` cutoff
    ranks on ``round(weight, rank_round)`` (term tie-break) — the
    contract-query device (see ``rlm_expand_query``) making membership
    exact under a rounded total order. ``None`` keeps raw-weight order.
    """
    a, b, g = cfg.rocchio_alpha, cfg.rocchio_beta, cfg.rocchio_gamma

    def _centroid(vecs: DataFrame, coef: float) -> DataFrame:
        sizes = vecs.select("qid", "doc_id").distinct().groupBy("qid").agg(
            F.count(F.lit(1)).alias("n")
        )
        summed = vecs.groupBy("qid", "term").agg(F.sum("w").alias("sw"))
        return summed.join(sizes, "qid").select(
            "qid", "term",
            (F.lit(coef) * F.col("sw") / F.col("n")).alias("c"),
        )

    parts = [
        query_terms.select(
            "qid", "term", (F.lit(a) * F.col("qtf")).alias("c")
        ),
        _centroid(rel_vecs, b),
    ]
    if nonrel_vecs is not None:
        parts.append(_centroid(nonrel_vecs, -g))
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    combined = merged.groupBy("qid", "term").agg(F.sum("c").alias("weight"))
    positive = combined.filter(F.col("weight") > 0)
    weight_key = (
        F.round(F.col("weight"), rank_round)
        if rank_round is not None else F.col("weight")
    )
    w = Window.partitionBy("qid").orderBy(
        weight_key.desc(), F.col("term").asc()
    )
    return (
        positive.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= cfg.num_expansion_terms)
        .select("qid", "term", F.lit(1.0).alias("qtf"), "weight")
    )


def feedback_term_stats(
    index: InvertedIndex,
    run: DataFrame,
    num_top_docs: int,
    cfg: FeedbackConfig = FeedbackConfig(),
) -> DataFrame:
    """F13 — per-query sorted RM-conditional feedback term weights over
    the top-n of a given run (``retrieval/FdbkTermStats.java:24-65``,
    shell driver ``printfdbkterms.sh``): (qid, term, wt), wt desc."""
    stats = top_docs_term_stats(index, run, num_top_docs)
    wts = rm_conditional_weights(stats, cfg)
    return wts.orderBy("qid", F.col("wt").desc(), "term")
