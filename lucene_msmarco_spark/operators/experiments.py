"""Experiment harnesses (SURVEY.md §2.9, H1-H4, H7): retrieval →
evaluation → QPP → correlation composition, and the train/test grid
search over the variant-mixing λ.

Provenance (/root/reference/src/main/java):
- H1 ``experiments/QPPEvaluator.java:45-141``: run the query set under a
  similarity, evaluate a target metric per query, compute a QPP estimate
  per query, report the rank correlation between the two vectors.
- H2 ``experiments/TRECDLQPPEvaluator.java:83-217``: sweep λ ∈ 0..1
  step 0.1 (``retrieval/Constants.java:55``) maximizing Kendall τ on the
  train split; apply the argmax on test.
- H7 ``stochastic_qpp/StochasticQPPEvaluation.java:94-227``: for each of
  ``num_samples`` perturbed runs per query (operators/stochastic.py),
  recompute metric + estimate, and report the correlation shift per
  sample.

The per-queryset correlation vectors are tiny (#queries), so the final
correlation happens driver-side on collected arrays (the DataFrame jobs
do all the heavy per-document work).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import EngineConfig
from .correlation import kendall_tau, pearson_r, sare, spearman_rho
from .eval import fill_rel, per_query_metrics
from .index import InvertedIndex
from .qpp import composite_qid, cumulative_nqc, nqc, query_idf_stats
from .retrieval import compile_queries, search


def correlation_metric(
    name: str, n_intervals: int = 5
) -> Callable[[np.ndarray, np.ndarray], float]:
    """H4 — SettingsLoader's correlation-metric map
    (``experiments/SettingsLoader.java:33-40``): qpp.metric key ->
    callable. ``n_intervals`` feeds the two quantized metrics
    (qsim.numintervals)."""
    from .correlation import (
        pairwise_accuracy,
        quantized_sim,
        quantized_strict_match,
    )

    table: dict[str, Callable[[np.ndarray, np.ndarray], float]] = {
        "r": pearson_r,
        "rho": spearman_rho,
        "tau": kendall_tau,
        "pairacc": pairwise_accuracy,
        "qsim": lambda gt, pred: quantized_sim(gt, pred, n_intervals),
        "qsim_strict": lambda gt, pred: quantized_strict_match(
            gt, pred, n_intervals
        ),
    }
    if name not in table:
        raise KeyError(
            f"unknown qpp.metric {name!r}; known: {sorted(table)}"
        )
    return table[name]


QPP_METHODS = ("avgidf", "nqc", "uef_nqc")


def qpp_estimates(
    name: str,
    index: InvertedIndex,
    run: DataFrame,
    query_terms: DataFrame,
    top_k: int = 50,
    cfg: EngineConfig = EngineConfig(),
) -> DataFrame:
    """H4 — SettingsLoader's QPP-method map
    (``experiments/SettingsLoader.java:42-46``): qpp.method key ->
    (qid, est). ``top_k`` is SettingsLoader's qppTopK (qpp.numtopdocs),
    the NQC cut; ``query_terms``: (qid, term[, qtf])."""
    stats = query_idf_stats(
        query_terms, index.term_stats, index.stats.n_docs
    )
    if name == "avgidf":
        return stats.select("qid", F.col("avgidf").alias("est"))
    if name == "nqc":
        return nqc(run, stats, k=top_k).select(
            "qid", F.col("nqc").alias("est")
        )
    if name == "uef_nqc":
        from .qpp import uef

        base = nqc(run, stats, k=top_k)
        return uef(index, run, base, "nqc", cfg=cfg).select(
            "qid", F.col("uef").alias("est")
        )
    raise KeyError(
        f"unknown qpp.method {name!r}; known: {sorted(QPP_METHODS)}"
    )


def _aligned_vectors(
    metric_df: DataFrame, est_df: DataFrame, metric_col: str, est_col: str
) -> tuple[np.ndarray, np.ndarray, list[str]]:
    joined = (
        metric_df.select("qid", metric_col)
        .join(est_df.select("qid", est_col), "qid")
        .orderBy("qid")
        .collect()
    )
    qids = [r["qid"] for r in joined]
    gt = np.array([float(r[metric_col]) for r in joined])
    pred = np.array([float(r[est_col] or 0.0) for r in joined])
    return gt, pred, qids


def correlate(gt: np.ndarray, pred: np.ndarray) -> dict[str, float]:
    return {
        "kendall": kendall_tau(gt, pred),
        "pearson": pearson_r(gt, pred),
        "spearman": spearman_rho(gt, pred),
        "sare": sare(gt, pred),
    }


def qpp_experiment(
    index: InvertedIndex,
    queries: DataFrame,
    qrels: DataFrame,
    model: str = "lmdir",
    metric_col: str = "ap",
    predictor: str = "nqc",
    k: int = 100,
    qpp_k: int = 50,
    cfg: EngineConfig = EngineConfig(),
    run: DataFrame | None = None,
) -> dict:
    """H1 — returns {"run", "metrics", "estimates", "correlations"}."""
    if run is None:
        run = search(index, queries, model=model, k=k, cfg=cfg).cache()
    metrics = per_query_metrics(run, qrels).cache()

    qt = compile_queries(queries, index.analyzer)
    idf = query_idf_stats(qt, index.term_stats, index.stats.n_docs)
    if predictor == "nqc":
        est = nqc(run, idf, k=qpp_k)
        est_col = "nqc"
    elif predictor == "cumnqc":
        est = cumulative_nqc(run, idf, k=qpp_k)
        est_col = "cumnqc"
    elif predictor == "avgidf":
        est = idf.select("qid", "avgidf")
        est_col = "avgidf"
    elif predictor == "maxidf":
        est = idf.select("qid", "maxidf")
        est_col = "maxidf"
    else:
        raise ValueError(f"unknown predictor {predictor!r}")

    gt, pred, qids = _aligned_vectors(metrics, est, metric_col, est_col)
    return {
        "run": run,
        "metrics": metrics,
        "estimates": est,
        "qids": qids,
        "gt": gt,
        "pred": pred,
        "correlations": correlate(gt, pred) if len(qids) > 1 else {},
    }


def mu_sweep(
    index: InvertedIndex,
    queries: DataFrame,
    qrels: DataFrame,
    mus: tuple[float, ...] = (100.0, 500.0, 1000.0, 2000.0),
    metric_col: str = "map",
    k: int = 100,
    rank_round: int | None = None,
) -> dict:
    """LM-Dirichlet μ sweep: retrieve + evaluate per μ, pick the best —
    the reference's BPE-index tuning loop
    (``tokenization/bpe_msmarco.sh:29-63`` retrieves and trec_evals per
    μ over the subword-encoded index). Works over ANY index, including a
    BPE-encoded whitespace-analyzed one (functions/bpe.py).

    ``rank_round`` is forwarded to ``search`` (contract-query device).

    Returns {"best_mu", "best_metric", "metrics": {mu: value},
    "summaries": {mu: {metric: value}}} — ``summaries`` carries the
    full computeAll row (map, p_at_5, ndcg_100, recall_quirk) per μ.
    """
    from dataclasses import replace

    from ..config import LMDirichletConfig
    from .eval import compute_all

    out: dict[float, float] = {}
    summaries: dict[float, dict[str, float]] = {}
    for mu in mus:
        cfg = replace(EngineConfig(), lmdir=LMDirichletConfig(mu=mu))
        run = search(index, queries, model="lmdir", k=k, cfg=cfg,
                     rank_round=rank_round)
        summary = compute_all(run, qrels).collect()[0]
        summaries[mu] = {c: float(summary[c]) for c in summary.asDict()}
        out[mu] = float(summary[metric_col])
    best = max(out, key=lambda m: (out[m], -m))
    return {"best_mu": best, "best_metric": out[best], "metrics": out,
            "summaries": summaries}


def grid_search_lambda(
    base_est: DataFrame,
    base_col: str,
    variant_est: DataFrame,
    metrics: DataFrame,
    metric_col: str = "ap",
    lambdas: tuple[float, ...] = tuple(i / 10 for i in range(11)),
) -> dict:
    """H2 — sweep λ of the variant combine (P7) maximizing Kendall τ
    against the per-query metric. ``variant_est``: (qid, sim, est).
    Returns {"best_lambda", "best_tau", "taus"}."""
    from .qpp import variant_specificity

    taus: dict[float, float] = {}
    for lam in lambdas:
        combined = variant_specificity(base_est, base_col, variant_est, lam)
        gt, pred, qids = _aligned_vectors(
            metrics, combined, metric_col, "est"
        )
        taus[lam] = kendall_tau(gt, pred) if len(qids) > 1 else float("nan")
    best = max(taus, key=lambda x: (taus[x], -x))
    return {"best_lambda": best, "best_tau": taus[best], "taus": taus}


def stochastic_qpp_evaluation(
    index: InvertedIndex,
    queries: DataFrame,
    qrels: DataFrame,
    run: DataFrame,
    num_samples: int = 10,
    seed: int = 31415,
    metric_col: str = "ap",
    qpp_k: int = 50,
    cfg: EngineConfig = EngineConfig(),
    estimator: Callable[[DataFrame], DataFrame] | None = None,
    permute: str = "rng",
    metric_round: int | None = None,
    est_round: int | None = None,
) -> dict:
    """H7 — per perturbation sample: recompute metric + NQC on the
    swapped run; report τ per sample and the baseline τ. All samples are
    evaluated in ONE DataFrame job batch via the qid#sample composite key.

    ``permute`` is forwarded to ``sample_swapped_runs`` ("md5" = the
    SQL-expressible seeded draw). ``metric_round``/``est_round`` round
    the per-sample correlation inputs (contract-query device: both
    engines then correlate identical doubles); ``None`` keeps raw.
    """
    from .stochastic import sample_swapped_runs

    filled = fill_rel(run, qrels)
    qt = compile_queries(queries, index.analyzer)
    idf = query_idf_stats(qt, index.term_stats, index.stats.n_docs).cache()

    def estimates_for(r: DataFrame) -> DataFrame:
        return estimator(r) if estimator else nqc(r, idf, k=qpp_k)

    base_metrics = per_query_metrics(run, qrels)
    gt0, pred0, _ = _aligned_vectors(
        base_metrics, estimates_for(run), metric_col,
        "nqc" if estimator is None else "est",
    )
    base_tau = kendall_tau(gt0, pred0)

    samples = sample_swapped_runs(
        filled, num_samples, seed=seed, permute=permute
    )
    srun = samples.select(
        composite_qid().alias("qid"), "doc_id", "rank", "score"
    )
    sq = qrels.sparkSession.range(num_samples).select(
        F.col("id").cast("int").alias("sample")
    )
    sqrels = qrels.crossJoin(F.broadcast(sq)).select(
        composite_qid().alias("qid"), "doc_id", "rel",
    )
    smetrics = per_query_metrics(srun, sqrels)

    sidf = idf.crossJoin(F.broadcast(sq)).select(
        composite_qid().alias("qid"),
        *[c for c in idf.columns if c != "qid"],
    )
    sest = (
        estimator(srun) if estimator else nqc(srun, sidf, k=qpp_k)
    )
    est_col = "nqc" if estimator is None else "est"
    joined = (
        smetrics.select("qid", metric_col)
        .join(sest.select("qid", est_col), "qid")
        .withColumn("sample", F.substring_index("qid", "#", -1).cast("int"))
        .withColumn("oqid", F.substring_index("qid", "#", 1))
        .collect()
    )
    def _rnd(v: float, nd: int | None) -> float:
        return round(v, nd) if nd is not None else v

    per_sample: dict[int, list] = {}
    for r in joined:
        per_sample.setdefault(r["sample"], []).append(
            (
                r["oqid"],
                _rnd(float(r[metric_col]), metric_round),
                _rnd(float(r[est_col] or 0.0), est_round),
            )
        )
    taus = {}
    for s, rows in sorted(per_sample.items()):
        rows.sort()
        gt = np.array([x[1] for x in rows])
        pred = np.array([x[2] for x in rows])
        taus[s] = kendall_tau(gt, pred) if len(rows) > 1 else float("nan")
    tau_vals = [t for t in taus.values() if np.isfinite(t)]
    return {
        "base_tau": base_tau,
        "sample_taus": taus,
        "mean_tau": float(np.mean(tau_vals)) if tau_vals else float("nan"),
        "delta_tau": (
            float(np.mean(tau_vals)) - base_tau if tau_vals else float("nan")
        ),
    }
