"""Query-performance prediction (SURVEY.md §2.8, P1-P9) as whole-queryset
DataFrame jobs.

Formula provenance (/root/reference/src/main/java):

P1 NQC — ``qpp/NQCSpecificity.java:25-46``: population variance of the
   top-k RSVs around their mean, times avgIDF(q). NB the avgIDF used by
   NQC is ``BaseIDFSpecificity.idfs()`` (``:85-105``): idf = ln(N/df)
   with df==0 substituted by 1, averaged over the query's DISTINCT terms.
P2 CumulativeNQC — ``qpp/CumulativeNQC.java:14-21``: (1/k)·Σ_{i=1..k-1}
   NQC@i where NQC@i uses the first min(i, n) scores.
P3 AvgIDF — ``qpp/AvgIDFSpecificity.java:42-61``: Σ_{df>0} ln(N/df)
   divided by the number of ALL distinct query terms (OOV terms dilute
   the average — quirk kept).
P4 MaxIDF — ``qpp/BaseIDFSpecificity.java:44-65``: max ln(N/df) over
   terms with df>0, 0 when every term is OOV.
P5 UEF — ``qpp/UEFSpecificity.java:29-66``: 10 seeded shuffled samples
   of the top list (sample size RLM_NUM_TOP_DOCS=20); each sample is
   reranked with the RM-conditional + KL-div chain (F3+F4) and compared
   to the original by rank-distance (C9); UEF = (10/Σ rankDist)·base(q).
P6 RSD — ``qpp/RSDSpecificity.java:23-51``: 10 seeded shuffled samples;
   mean over samples of RBO(orig, sample)·base(sample).
P7 VariantSpecificity — ``qpp/VariantSpecificity.java:25-111``:
   λ·Σ_v sim_v·base(v)/Σ_v sim_v + (1-λ)·base(q).
P8 CoRelSpecificity — ``qpp/CoRelSpecificity.java:19-112``: the same
   weighted-reference combine applied to rel-doc-as-query runs, mixed
   with P7's estimate.
P9 PreComputedPredictor — ``qpp/PreComputedPredictor.java:38-56``:
   broadcast qid→score lookup.

Determinism: the reference shares ONE ``Random(314152)`` across all
queries and samples (sequence depends on query iteration order); the
engine derives an independent seed per (qid, sample) so results are
partitioning-invariant (SURVEY.md §5 requires full determinism).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import EngineConfig
from .correlation import rank_distance_df, rbo
from .feedback import (
    kl_div_rerank,
    rm_conditional_weights,
    top_docs_term_stats,
)
from .index import InvertedIndex

SEED = 314152  # utils/IndexUtils.java:21


def composite_qid(qid_col: str = "qid", sample_col: str = "sample"):
    """``qid '#' sample`` composite key used to batch per-sample metric/
    estimate jobs. Fails fast (JVM-side raise_error) if a real qid
    contains the reserved ``#`` — otherwise the later ``substring_index``
    parse would silently group correlations under the wrong qid."""
    q = F.col(qid_col)
    guarded = F.when(
        q.contains("#"),
        F.raise_error(F.concat(
            F.lit("qid contains reserved delimiter '#': "), q
        )),
    ).otherwise(q)
    return F.concat_ws("#", guarded, F.col(sample_col))


# ---------------------------------------------------------------------------
# IDF statistics (P3, P4 + NQC's idf variant)
# ---------------------------------------------------------------------------

def query_idf_stats(
    query_terms: DataFrame, term_stats: DataFrame, n_docs: int
) -> DataFrame:
    """(qid, avgidf, maxidf, avgidf_nqc) over DISTINCT query terms.

    ``avgidf`` / ``maxidf`` follow AvgIDF/BaseIDF (OOV terms: skipped in
    the sum but counted in avgidf's denominator); ``avgidf_nqc`` follows
    ``idfs()`` (OOV df -> 1).
    """
    n = float(n_docs)
    qt = query_terms.select("qid", "term").distinct()
    j = qt.join(term_stats.select("term", "df"), "term", "left")
    idf = F.log(F.lit(n) / F.col("df"))
    idf_nqc = F.log(F.lit(n) / F.greatest(F.coalesce(F.col("df"), F.lit(0)), F.lit(1)))
    return j.groupBy("qid").agg(
        (
            F.sum(F.when(F.col("df").isNotNull() & (F.col("df") > 0), idf)
                  .otherwise(F.lit(0.0)))
            / F.count(F.lit(1))
        ).alias("avgidf"),
        F.coalesce(
            F.max(F.when(F.col("df").isNotNull() & (F.col("df") > 0), idf)),
            F.lit(0.0),
        ).alias("maxidf"),
        F.avg(idf_nqc).alias("avgidf_nqc"),
    )


# ---------------------------------------------------------------------------
# NQC family (P1, P2)
# ---------------------------------------------------------------------------

def nqc(
    run: DataFrame, idf_stats: DataFrame, k: int = 50,
    qid_col: str = "qid",
) -> DataFrame:
    """(qid, nqc): var_pop(top-k scores) * avgidf_nqc."""
    v = (
        run.filter(F.col("rank") <= k)
        .groupBy(qid_col)
        .agg(F.var_pop("score").alias("v"))
    )
    return v.join(idf_stats.select(qid_col, "avgidf_nqc"), qid_col).select(
        qid_col, (F.col("v") * F.col("avgidf_nqc")).alias("nqc")
    )


def cumulative_nqc(
    run: DataFrame, idf_stats: DataFrame, k: int = 50
) -> DataFrame:
    """(qid, cumnqc) = (Σ_{i=1..k-1} NQC@min(i,n)) / k."""
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy("rank").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    topk = run.filter(F.col("rank") <= k)
    cum = topk.select(
        "qid", "rank",
        F.sum("score").over(w).alias("s1"),
        F.sum(F.col("score") * F.col("score")).over(w).alias("s2"),
        F.count(F.lit(1)).over(w).alias("i"),
    ).withColumn(
        "var_i",
        F.col("s2") / F.col("i") - (F.col("s1") / F.col("i")) ** 2,
    )
    n_by_q = topk.groupBy("qid").agg(F.count(F.lit(1)).alias("n"))
    # Σ over i=1..k-1 of var@min(i, n): each in-range prefix contributes
    # var_i once; the last prefix (i = n) additionally stands in for
    # every i in (n, k-1].
    per_prefix = cum.join(n_by_q, "qid").withColumn(
        "mult",
        F.when(F.col("i") < F.col("n"), F.lit(1.0)).otherwise(
            F.lit(float(k - 1)) - F.col("n") + F.lit(1.0)
        ),
    ).filter(F.col("i") <= F.lit(k - 1) )
    agg = per_prefix.groupBy("qid").agg(
        (F.sum(F.col("var_i") * F.col("mult")) / F.lit(float(k))).alias("cv")
    )
    return agg.join(idf_stats.select("qid", "avgidf_nqc"), "qid").select(
        "qid", (F.col("cv") * F.col("avgidf_nqc")).alias("cumnqc")
    )


# ---------------------------------------------------------------------------
# sampling helpers (P5, P6)
# ---------------------------------------------------------------------------

def _qid_seed(qid: str, sample: int, seed: int) -> np.random.Generator:
    return np.random.default_rng(
        [seed, sample, zlib.crc32(str(qid).encode("utf-8"))]
    )


def _permutation(
    qid: str, sample: int, seed: int, docs: np.ndarray, permute: str
) -> np.ndarray:
    """Seeded shuffle order of ``docs`` for one (qid, sample).

    ``"rng"`` — numpy PCG64 permutation (the default everywhere).
    ``"md5"`` — order by ``md5(f"{seed}:{sample}:{qid}:{doc_id}")``
    (tie-broken by doc_id): the same seeded-shuffle semantics, but
    computable in ANY SQL engine with ``md5`` — the form the
    ``qpp_rsd`` contract query uses so the sampling machinery gets a
    DuckDB value-level oracle (numpy's PCG stream is not
    SQL-expressible)."""
    n = len(docs)
    if permute == "rng":
        return _qid_seed(qid, sample, seed).permutation(n)
    if permute == "md5":
        import hashlib

        ids = [_doc_sort_key(d) for d in docs]
        keys = [
            hashlib.md5(
                f"{seed}:{sample}:{qid}:{d}".encode()
            ).hexdigest()
            for d in ids
        ]
        return np.asarray(
            sorted(range(n), key=lambda i: (keys[i], ids[i])),
            dtype=np.int64,
        )
    raise ValueError(f"unknown permute mode {permute!r}")


def _doc_sort_key(d):
    """Canonical doc-id key for the md5 permutation: integer ids (the
    synthetic fixtures' long column) keep their numeric form — same
    hash text and numeric tie-break as always — while any other id
    (real TREC runs carry string ids like ``msmarco_doc_00_0``) uses
    its string form instead of crashing on ``int(d)``. Ids are
    homogeneous within a run, so the tie-break sort never compares
    int to str."""
    if isinstance(d, (int, np.integer)):
        return int(d)
    s = str(d)
    try:
        return int(s)
    except ValueError:
        return s


def sampled_runs(
    run: DataFrame, num_samples: int, sample_size: int, seed: int = SEED,
    permute: str = "rng",
) -> DataFrame:
    """Per (qid, sample): a seeded shuffle of the FULL run, truncated to
    min(sample_size, n), re-ranked 1..m in shuffle order, original scores
    kept (``UEFSpecificity.sampleTopDocs``). Output: (qid, sample,
    doc_id, rank, score). ``permute``: see ``_permutation``."""

    def one(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rank")
        outs = []
        n = len(pdf)
        m = min(sample_size, n)
        docs = pdf["doc_id"].to_numpy()
        for s in range(num_samples):
            idx = _permutation(key[0], s, seed, docs, permute)[:m]
            sub = pdf.iloc[idx].copy()
            sub["sample"] = s
            sub["rank"] = np.arange(1, m + 1)
            outs.append(sub[["qid", "sample", "doc_id", "rank", "score"]])
        return pd.concat(outs, ignore_index=True)

    # doc_id keeps the INPUT run's type: read_res yields string ids
    # (real TREC runs are alphanumeric), the synthetic fixtures long —
    # a hard-coded long here would reject every real res file
    doc_t = run.schema["doc_id"].dataType.simpleString()
    return run.groupBy("qid").applyInPandas(
        one,
        schema=f"qid string, sample int, doc_id {doc_t}, rank int,"
               " score double",
    )


def uef(
    index: InvertedIndex,
    run: DataFrame,
    base: DataFrame,
    base_col: str,
    cfg: EngineConfig = EngineConfig(),
    num_samples: int = 10,
    sample_size: int | None = None,
    seed: int = SEED,
    permute: str = "rng",
) -> DataFrame:
    """P5 -> (qid, uef). ``base``: (qid, <base_col>) estimates.
    ``permute``: sampling order (see ``_permutation``)."""
    sample_size = sample_size or cfg.feedback.num_top_docs
    samp = sampled_runs(run, num_samples, sample_size, seed, permute)
    srun = samp.select(
        composite_qid().alias("qid"), "doc_id", "rank", "score"
    )
    stats = top_docs_term_stats(index, srun, num_top_docs=sample_size)
    wts = rm_conditional_weights(stats, cfg.feedback)
    reranked = kl_div_rerank(stats, wts, srun)

    # original full list tagged per sample for the rank-distance join
    sample_ids = run.sparkSession.range(num_samples).select(
        F.col("id").cast("int").alias("sample")
    )
    orig_tagged = run.crossJoin(F.broadcast(sample_ids)).select(
        composite_qid().alias("qid"), "doc_id", "rank",
    )
    rd = rank_distance_df(orig_tagged, reranked)
    back = rd.withColumn(
        "oqid", F.substring_index(F.col("qid"), "#", 1)
    )
    agg = back.groupBy("oqid").agg(F.sum("rank_dist").alias("sum_rd"))
    return agg.join(
        base.withColumnRenamed("qid", "oqid"), "oqid"
    ).select(
        F.col("oqid").alias("qid"),
        (F.lit(float(num_samples)) / F.col("sum_rd") * F.col(base_col))
        .alias("uef"),
    )


def rsd(
    run: DataFrame,
    idf_stats: DataFrame,
    k: int = 50,
    num_samples: int = 10,
    sample_size: int = 20,
    seed: int = SEED,
    p: float = 0.9,
    permute: str = "rng",
) -> DataFrame:
    """P6 -> (qid, rsd). base = NQC computed on each sample's scores.
    ``permute``: sampling order — ``"rng"`` (default) or the
    SQL-expressible ``"md5"`` used by the ``qpp_rsd`` contract oracle
    (see ``_permutation``)."""
    enriched = run.join(
        idf_stats.select("qid", "avgidf_nqc"), "qid", "left"
    )

    def one(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rank")
        docs = pdf["doc_id"].to_numpy()
        scores = pdf["score"].to_numpy()
        aidf = float(pdf["avgidf_nqc"].iloc[0] or 0.0)
        n = len(pdf)
        m = min(sample_size, n)
        acc = 0.0
        for s in range(num_samples):
            idx = _permutation(key[0], s, seed, docs, permute)[:m]
            s_scores = scores[idx][:k]
            est = float(np.var(s_scores)) * aidf if s_scores.size else 0.0
            sim = rbo(docs.tolist(), docs[idx].tolist(), k=n, p=p)
            acc += sim * est
        return pd.DataFrame(
            {"qid": [key[0]], "rsd": [acc / num_samples]}
        )

    return enriched.groupBy("qid").applyInPandas(
        one, schema="qid string, rsd double"
    )


# ---------------------------------------------------------------------------
# reference-set combines (P7, P8) and lookup (P9)
# ---------------------------------------------------------------------------

def weighted_reference_specificity(
    base: DataFrame,
    base_col: str,
    ref_estimates: DataFrame,
    lam: float,
) -> DataFrame:
    """Shared core of P7/P8: ``ref_estimates`` is (qid, sim, est) — one
    row per reference object (query variant / rel-doc-as-query run).
    Returns (qid, est) = λ·Σ sim·est/Σ sim + (1−λ)·base."""
    wavg = ref_estimates.groupBy("qid").agg(
        (F.sum(F.col("sim") * F.col("est")) / F.sum("sim")).alias("wref")
    )
    return base.join(wavg, "qid", "left").select(
        "qid",
        (
            F.lit(lam) * F.coalesce(F.col("wref"), F.col(base_col))
            + F.lit(1.0 - lam) * F.col(base_col)
        ).alias("est"),
    )


def variant_specificity(
    base: DataFrame, base_col: str,
    variant_estimates: DataFrame, lam: float,
) -> DataFrame:
    """P7. ``variant_estimates``: (qid, sim, est) per query variant."""
    return weighted_reference_specificity(
        base, base_col, variant_estimates, lam
    )


def corel_specificity(
    variant_est: DataFrame,
    reldoc_estimates: DataFrame,
    lam: float,
) -> DataFrame:
    """P8: λ·variant_est + (1−λ)·weighted rel-doc-run estimate."""
    wavg = reldoc_estimates.groupBy("qid").agg(
        (F.sum(F.col("sim") * F.col("est")) / F.sum("sim")).alias("wrel")
    )
    return variant_est.join(wavg, "qid", "left").select(
        "qid",
        (
            F.lit(lam) * F.col("est")
            + F.lit(1.0 - lam) * F.coalesce(F.col("wrel"), F.col("est"))
        ).alias("est"),
    )


def precomputed_predictor(estimates: DataFrame, run: DataFrame) -> DataFrame:
    """P9: qid→score broadcast lookup restricted to the run's queries."""
    qids = run.select("qid").distinct()
    return qids.join(F.broadcast(estimates), "qid", "left")
