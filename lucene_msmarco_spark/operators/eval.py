"""Evaluation metrics (SURVEY.md §2.6, E1-E9) — per-query scalar
aggregations over a run joined with qrels, reproducing the reference's
EXACT (sometimes non-standard) definitions from
``qrels/RetrievedResults.java`` / ``AllRetrievedResults.java``:

- binary relevance threshold rel >= min_rel (=2) for AP/P@k/recall
  numerators (``Constants.java:57``), but:
- recall's DENOMINATOR is the size of the full rel>0 qrels map
  (``RetrievedResults.java:185-196``) — mixed thresholds, reproduced;
- RR uses 1/rank of the LAST rel>0 doc in the list (the reference loop
  keeps overwriting — ``RetrievedResults.java:198-206``), not the first;
- nDCG@k computes IDCG from ALL qrels labels sorted desc (not cut to
  retrievable/judged-retrieved), graded, rel/log2(rank+1)
  (``RetrievedResults.java:208-256``);
- AP denominator = #qrels entries with rel >= min_rel; 0 -> AP 0
  (``RetrievedResults.java:150-170``);
- computeAll's "recall" line = (sum of per-query recall fractions) /
  totalNumRel — the quirky double normalization at
  ``AllRetrievedResults.java:217`` — exposed as ``recall_quirk``.

All metrics are computed for the whole query set in ONE DataFrame job
(groupBy qid), not per-query loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

LOG2 = 0.6931471805599453  # ln(2)


def fill_rel(run: DataFrame, qrels: DataFrame) -> DataFrame:
    """Join run with qrels; unjudged docs get rel=0
    (``AllRetrievedResults.java:157-165``)."""
    q = qrels.select("qid", "doc_id", "rel")
    return (
        run.join(q, ["qid", "doc_id"], "left")
        .fillna(0, subset=["rel"])
    )


def rerank_by_score(run: DataFrame) -> DataFrame:
    """E8 — re-sort by score desc (doc_id asc tiebreak) and reassign rank
    1..n, as the reference does on every res load when AUTO_SORT_TOP_DOCS
    (``AllRetrievedResults.java:70-96``)."""
    w = Window.partitionBy("qid").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return run.withColumn("rank", F.row_number().over(w))


def _qrels_stats(qrels: DataFrame, min_rel: int) -> DataFrame:
    return qrels.groupBy("qid").agg(
        F.sum((F.col("rel") >= min_rel).cast("long")).alias("num_rel"),
        F.count(F.lit(1)).alias("num_judged"),  # relMap.size(): rel>0 entries
    )


def _idcg(qrels: DataFrame, cutoff: int) -> DataFrame:
    """IDCG@cutoff from ALL qrels labels sorted desc (reference form)."""
    w = Window.partitionBy("qid").orderBy(F.col("rel").desc())
    ranked = qrels.withColumn("irank", F.row_number().over(w)).filter(
        F.col("irank") <= cutoff
    )
    gain = F.col("rel").cast("double") / (
        F.log(F.lit(1.0) + F.col("irank").cast("double")) / F.lit(LOG2)
    )
    return ranked.groupBy("qid").agg(F.sum(gain).alias("idcg"))


def per_query_metrics(
    run: DataFrame,
    qrels: DataFrame,
    min_rel: int = 2,
    p_k: int = 5,
    ndcg_cutoff: int = 100,
) -> DataFrame:
    """(qid, ap, p_at_k, recall, rr, ndcg, num_rel_ret) — E1-E5 in one job.

    ``run``: (qid, doc_id, rank, score); ``qrels``: (qid, doc_id, rel>0).
    Queries present in the run but absent from qrels produce 0 metrics.
    """
    filled = fill_rel(run, qrels)
    is_rel = (F.col("rel") >= min_rel).cast("long")

    w_rank = (
        Window.partitionBy("qid")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_rel = F.sum(is_rel).over(w_rank)

    gain = F.when(
        F.col("rank") <= ndcg_cutoff,
        F.col("rel").cast("double")
        / (F.log(F.lit(1.0) + F.col("rank").cast("double")) / F.lit(LOG2)),
    ).otherwise(F.lit(0.0))

    per_doc = filled.select(
        "qid",
        "rank",
        "rel",
        is_rel.alias("is_rel"),
        cum_rel.alias("cum_rel"),
        gain.alias("gain"),
    )

    agg = per_doc.groupBy("qid").agg(
        F.sum(
            F.when(
                F.col("is_rel") == 1,
                F.col("cum_rel").cast("double") / F.col("rank"),
            ).otherwise(0.0)
        ).alias("ap_num"),
        F.sum(
            F.when((F.col("rank") <= p_k) & (F.col("is_rel") == 1), 1)
            .otherwise(0)
        ).alias("rel_in_top_pk"),
        F.sum("is_rel").alias("num_rel_ret"),
        F.max(F.when(F.col("rel") > 0, F.col("rank"))).alias("last_rel_rank"),
        F.sum("gain").alias("dcg"),
    )

    qstats = _qrels_stats(qrels, min_rel)
    idcg = _idcg(qrels, ndcg_cutoff)

    out = (
        agg.join(qstats, "qid", "left")
        .join(idcg, "qid", "left")
        .fillna(0, subset=["num_rel", "num_judged"])
    )
    return out.select(
        "qid",
        F.when(F.col("num_rel") > 0, F.col("ap_num") / F.col("num_rel"))
        .otherwise(0.0)
        .alias("ap"),
        (F.col("rel_in_top_pk").cast("double") / F.lit(float(p_k))).alias(
            "p_at_k"
        ),
        F.when(
            F.col("num_judged") > 0,
            F.col("num_rel_ret").cast("double") / F.col("num_judged"),
        )
        .otherwise(0.0)
        .alias("recall"),
        F.when(
            F.col("last_rel_rank").isNotNull(),
            F.lit(1.0) / F.col("last_rel_rank"),
        )
        .otherwise(0.0)
        .alias("rr"),
        F.when(
            F.col("idcg").isNotNull() & (F.col("idcg") != 0),
            F.col("dcg") / F.col("idcg"),
        )
        .otherwise(0.0)
        .alias("ndcg"),
        F.col("num_rel_ret"),
    )


def compute_all(
    run: DataFrame, qrels: DataFrame, min_rel: int = 2
) -> DataFrame:
    """E6 — one-row summary mirroring ``AllRetrievedResults.computeAll``:
    mean AP, P@5, nDCG@100 over queries, plus the quirky
    recall = (sum per-query recall) / totalNumRel normalization."""
    pq = per_query_metrics(run, qrels, min_rel=min_rel, p_k=5,
                           ndcg_cutoff=100)
    total_num_rel = qrels.count()  # all rel>0 entries across queries
    return pq.agg(
        (F.sum("recall") / F.lit(float(total_num_rel))).alias("recall_quirk"),
        F.avg("ap").alias("map"),
        F.avg("p_at_k").alias("p_at_5"),
        F.avg("ndcg").alias("ndcg_100"),
    )


def fairness_combined(pre_evaluated: DataFrame) -> DataFrame:
    """E9 — pre-evaluated fairness metrics: combined = awrf * ndcg
    (``qrels/PreEvaluatedResults.java:16-34``,
    ``qrels/FairnessMetrics.java:9-15``). Input: (qid, ndcg, awrf)."""
    return pre_evaluated.select(
        "qid", "ndcg", "awrf",
        (F.col("awrf") * F.col("ndcg")).alias("combined"),
    )
