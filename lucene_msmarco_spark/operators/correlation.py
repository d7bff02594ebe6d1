"""Rank-list similarity & QPP-correlation metrics (SURVEY.md §2.7, C1-C11).

The reference computes all of these on query-count-sized vectors inside
one JVM (``correlation/*.java``); the right Spark altitude is the same —
numpy kernels on the driver for the per-queryset scalars (a queryset is
thousands of rows at most), plus DataFrame forms for the per-(qid) and
run⨝run shapes that actually scale with data:

- ``rank_distance_df``  (C9) — join two runs on (qid, doc_id), windowed
  rank aggregation, one row per qid.
- ``rbo_df``            (C8) — per-qid RBO via one ``applyInPandas``
  group over the concatenated runs.

Numpy kernel provenance (file:line in /root/reference/src/main/java):
  kendall_tau      correlation/KendalCorrelation.java:8-10 (commons-math3
                   KendallsCorrelation = tau-b, reimplemented)
  pearson/spearman correlation/PearsonCorrelation.java:7-9,
                   SpearmanCorrelation.java:8-10 (ties -> average ranks)
  rmse             correlation/RmseCorrelation.java:19-34 (min-max
                   normalizes pred when max(pred) > 1 — quirk kept)
  pairwise_acc     correlation/PairwiseAccuracyMetric.java:5-30
  quantized_*      correlation/QuantizedSimCorrelation.java:12-44,
                   QuantizedStrictMatchCorrelation.java:10-20,
                   QuantizedClassAccuracy.java:13-37
  min-max          correlation/MinMaxNormalizer.java:9-23
  sare/sarc        correlation/SARE.java:36-63 (per-query |rank_gt -
                   rank_pred| / n over score-sorted positions)
  rbo              correlation/OverlapStats.java:61-105 (p=0.9, depth =
                   list length)
  rank_dist        correlation/OverlapStats.java:119-140 — NB reference
                   quirk: position-in-B is the position in the SORTED
                   doc-id array, not B's rank order; reproduced as-is.
  jaccard          correlation/OverlapStats.java:173-201
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# numpy kernels (driver-side, query-count-sized inputs)
# ---------------------------------------------------------------------------

def _as1d(x) -> np.ndarray:
    a = np.asarray(x, dtype=np.float64)
    if a.ndim != 1:
        raise ValueError("expected 1-D vector")
    return a


def kendall_tau(x, y) -> float:
    """Kendall tau-b (ties corrected), matching commons-math3."""
    x, y = _as1d(x), _as1d(y)
    n = x.size
    if n < 2:
        return float("nan")
    dx = np.sign(x[:, None] - x[None, :])
    dy = np.sign(y[:, None] - y[None, :])
    iu = np.triu_indices(n, k=1)
    prod = dx[iu] * dy[iu]
    concordant = float((prod > 0).sum())
    discordant = float((prod < 0).sum())
    ties_x = float((dx[iu] == 0).sum())
    ties_y = float((dy[iu] == 0).sum())
    n0 = n * (n - 1) / 2.0
    denom = np.sqrt((n0 - ties_x) * (n0 - ties_y))
    return float((concordant - discordant) / denom) if denom else float("nan")


def pearson_r(x, y) -> float:
    x, y = _as1d(x), _as1d(y)
    return float(np.corrcoef(x, y)[0, 1])


def _avg_ranks(x: np.ndarray) -> np.ndarray:
    """Average ranks (1-based) with ties sharing their mean rank."""
    order = np.argsort(x, kind="stable")
    ranks = np.empty(x.size, dtype=np.float64)
    ranks[order] = np.arange(1, x.size + 1, dtype=np.float64)
    # average tied groups
    sx = x[order]
    i = 0
    while i < sx.size:
        j = i
        while j + 1 < sx.size and sx[j + 1] == sx[i]:
            j += 1
        if j > i:
            ranks[order[i : j + 1]] = (i + j + 2) / 2.0
        i = j + 1
    return ranks


def spearman_rho(x, y) -> float:
    return pearson_r(_avg_ranks(_as1d(x)), _avg_ranks(_as1d(y)))


def min_max_normalize(x) -> np.ndarray:
    x = _as1d(x)
    lo, hi = x.min(), x.max()
    if hi == lo:
        raise ValueError("constant input to min-max normalizer")
    return (x - lo) / (hi - lo)


def rmse(gt, pred) -> float:
    """Reference quirk: pred is min-max normalized only when max(pred)>1."""
    gt, pred = _as1d(gt), _as1d(pred)
    if pred.max() > 1:
        pred = min_max_normalize(pred)
    return float(np.sqrt(np.mean((gt - pred) ** 2)))


def pairwise_accuracy(gt, pred) -> float:
    gt, pred = _as1d(gt), _as1d(pred)
    n = gt.size
    iu = np.triu_indices(n, k=1)
    sg = np.sign(gt[:, None] - gt[None, :])[iu]
    sp = np.sign(pred[:, None] - pred[None, :])[iu]
    return float((sg == sp).mean()) if sg.size else float("nan")


def _quantize(x: np.ndarray, n_intervals: int) -> np.ndarray:
    q = np.floor(min_max_normalize(x) * n_intervals).astype(np.int64)
    return np.minimum(q, n_intervals - 1)


def quantized_sim(gt, pred, n_intervals: int = 5) -> float:
    """1 - L1(bucket ids)/max possible."""
    qg = _quantize(_as1d(gt), n_intervals)
    qp = _quantize(_as1d(pred), n_intervals)
    max_dist = (n_intervals - 1) * qg.size
    return 1.0 - float(np.abs(qg - qp).sum()) / max_dist


def quantized_strict_match(gt, pred, n_intervals: int = 5) -> float:
    qg = _quantize(_as1d(gt), n_intervals)
    qp = _quantize(_as1d(pred), n_intervals)
    return float((qg == qp).mean())


def quantized_class_accuracy(gt, pred, n_intervals: int = 5) -> float:
    """Per-class (gt bucket) mean of match rate."""
    qg = _quantize(_as1d(gt), n_intervals)
    qp = _quantize(_as1d(pred), n_intervals)
    accs = [
        float((qp[qg == c] == c).mean())
        for c in np.unique(qg)
    ]
    return float(np.mean(accs))


def sare_per_query(gt, pred) -> np.ndarray:
    """|position of query i in score-sorted gt - same in pred| / n."""
    gt, pred = _as1d(gt), _as1d(pred)
    n = gt.size
    # RankScore sort is by score asc (stable on equal -> original order)
    gt_pos = np.empty(n, dtype=np.int64)
    gt_pos[np.argsort(gt, kind="stable")] = np.arange(n)
    pr_pos = np.empty(n, dtype=np.int64)
    pr_pos[np.argsort(pred, kind="stable")] = np.arange(n)
    return np.abs(gt_pos - pr_pos) / float(n)


def sare(gt, pred) -> float:
    return float(sare_per_query(gt, pred).mean())


def sarc(gt, pred) -> float:
    return 1.0 - sare(gt, pred)


def rbo(list_a, list_b, k: int | None = None, p: float = 0.9) -> float:
    """Rank-biased overlap at depth k (default: len(list_a)), persistence p."""
    a, b = list(list_a), list(list_b)
    k = len(a) if k is None else k
    agg = 0.0
    seen_a: set = set()
    seen_b: set = set()
    overlap = 0
    for d in range(1, k + 1):
        # incremental |top_d(a) ∩ top_d(b)| (list elements assumed unique)
        x = a[d - 1] if d <= len(a) else None
        y = b[d - 1] if d <= len(b) else None
        if x is not None and x == y:
            seen_a.add(x)
            seen_b.add(y)
            overlap += 1
        else:
            if x is not None:
                if x in seen_b:
                    overlap += 1
                seen_a.add(x)
            if y is not None:
                if y in seen_a:
                    overlap += 1
                seen_b.add(y)
        agg += (overlap / d) * p ** (d - 1)
    return (1 - p) * agg


def rank_distance(list_a, list_b) -> float:
    """RMS of normalized rank shifts of common docs; reference quirk: the
    'rank' in B is the doc's position in SORTED-BY-ID B."""
    a = list(list_a)
    b_sorted = np.sort(np.asarray(list(list_b)))
    n = len(a)
    acc = 0.0
    for pos_a, doc in enumerate(a):
        pos_b = np.searchsorted(b_sorted, doc)
        if pos_b < b_sorted.size and b_sorted[pos_b] == doc:
            d = (pos_a - pos_b) / float(n)
            acc += d * d
    return float(np.sqrt(acc / n))


def jaccard(set_a, set_b) -> float:
    a, b = set(set_a), set(set_b)
    union = a | b
    return len(a & b) / len(union) if union else 0.0


# ---------------------------------------------------------------------------
# DataFrame forms
# ---------------------------------------------------------------------------

def rank_distance_df(run_a: DataFrame, run_b: DataFrame) -> DataFrame:
    """C9 as a distributed op: one row (qid, rank_dist) per query.

    Joins the two runs on (qid, doc_id); the position-in-sorted-B quirk is
    a ``row_number`` over doc_id order on B's side.
    """
    from pyspark.sql import Window

    a = run_a.select("qid", "doc_id", (F.col("rank") - 1).alias("pos_a"))
    wb = Window.partitionBy("qid").orderBy("doc_id")
    b = run_b.select("qid", "doc_id").withColumn(
        "pos_b", F.row_number().over(wb) - 1
    )
    n_by_q = run_a.groupBy("qid").agg(F.count(F.lit(1)).alias("n"))
    joined = a.join(b, ["qid", "doc_id"])
    return (
        joined.join(F.broadcast(n_by_q), "qid")
        .withColumn("d", (F.col("pos_a") - F.col("pos_b")) / F.col("n"))
        .groupBy("qid")
        .agg(
            F.sqrt(F.sum(F.col("d") * F.col("d")) / F.first("n"))
            .alias("rank_dist")
        )
    )


def jaccard_overlap_df(
    run_a: DataFrame, run_b: DataFrame, k: int | None = None,
) -> DataFrame:
    """C10 as a distributed op: one row (qid, jaccard) per qid present
    in BOTH runs — |top-k(A) ∩ top-k(B)| / |top-k(A) ∪ top-k(B)|.
    Counts-only (two tiny groupBys + one equi-join on (qid, doc_id)),
    no set materialization — the doc sets never leave the executors."""
    a, b = run_a, run_b
    if k is not None:
        a = a.filter(F.col("rank") <= k)
        b = b.filter(F.col("rank") <= k)
    a = a.select("qid", "doc_id")
    b = b.select("qid", "doc_id")
    na = a.groupBy("qid").agg(F.count(F.lit(1)).alias("na"))
    nb = b.groupBy("qid").agg(F.count(F.lit(1)).alias("nb"))
    ni = (
        a.join(b, ["qid", "doc_id"])
        .groupBy("qid").agg(F.count(F.lit(1)).alias("ni"))
    )
    j = (
        nb.join(na, "qid")
        .join(ni, "qid", "left")
        .fillna(0, subset=["ni"])
    )
    union = F.col("na") + F.col("nb") - F.col("ni")
    return j.select(
        "qid",
        F.when(union > 0, F.col("ni").cast("double") / union)
        .otherwise(F.lit(0.0))
        .alias("jaccard"),
    )


def rbo_df(
    run_a: DataFrame, run_b: DataFrame, p: float = 0.9,
    k: int | None = None,
) -> DataFrame:
    """C8 per qid: (qid, rbo). Each group is two short ranked lists."""

    a = run_a.select("qid", "doc_id", "rank").withColumn("side", F.lit(0))
    b = run_b.select("qid", "doc_id", "rank").withColumn("side", F.lit(1))
    both = a.unionByName(b)

    def one(key, pdf: pd.DataFrame) -> pd.DataFrame:
        la = pdf[pdf["side"] == 0].sort_values("rank")["doc_id"].tolist()
        lb = pdf[pdf["side"] == 1].sort_values("rank")["doc_id"].tolist()
        return pd.DataFrame({
            "qid": [key[0]], "rbo": [rbo(la, lb, k=k, p=p)]
        })

    return both.groupBy("qid").applyInPandas(
        one, schema="qid string, rbo double"
    )


def polynomial_fit(x, y, degree: int = 2) -> np.ndarray:
    """C11 — least-squares polynomial coefficients (highest power first),
    the engine's stand-in for commons-math3 PolynomialCurveFitter
    (``correlation/PolynomialRegression.java:14-57``, standalone in the
    reference)."""
    return np.polyfit(_as1d(x), _as1d(y), degree)
