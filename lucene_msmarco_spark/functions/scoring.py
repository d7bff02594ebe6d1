"""Scoring weight models as pure Catalyst column expressions (JVM-side,
whole-stage codegen — the hot path has zero Python).

Formula provenance (reference, /root/reference/src/main/java):

- BM25 term weight  — ``retrieval/TermWtUtil.java:6-12`` and
  ``indexing/SparseVecWriter.java:29-38``::

      idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))          # Lucene 8 idf
      wt(t,d) = idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*doclen/avgdl))

  Params k1=0.9, b=0.4 per the north rule (the repo's golden MS MARCO runs);
  in-code Lucene defaults are 1.2/0.75 (see config.py).

- LM-Dirichlet  — Lucene ``LMDirichletSimilarity`` semantics, the default
  retrieval model of ``retrieval/OneStepRetriever.java:87-89`` (mu=1000)::

      wt(t,d) = max(0, ln(1 + tf/(mu*P(t|C))) + ln(mu/(doclen+mu)))
      P(t|C)  = cf(t) / total_cf            # collection term frequency model

  (Lucene clamps per-term scores at 0; we reproduce that.)

- LM-Jelinek-Mercer — ``retrieval/TermWtUtil.java:18-20`` (NOTE the
  reference's quirk: it uses N/df, not a cf-based collection model)::

      wt(t,d) = ln(1 + lam/(1-lam) * tf/doclen * N/df)

- tf-idf — ``retrieval/TermWtUtil.java:14-16``::  wt = tf * ln(N/df)

Each weight is multiplied by the query-side multiplicity ``qtf`` (duplicate
query tokens score once per occurrence — ``retrieval/MsMarcoQuery.java:74-83``
keeps duplicates) and an optional boost (Q2, ``BoostQuery``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..config import BM25Config, LMDirichletConfig, LMJelinekMercerConfig


def idf_bm25(df: Column, n_docs: Column | float) -> Column:
    """Lucene-8 BM25 idf: ln(1 + (N - df + .5)/(df + .5))."""
    n = F.lit(n_docs) if not isinstance(n_docs, Column) else n_docs
    return F.log(F.lit(1.0) + (n - df + F.lit(0.5)) / (df + F.lit(0.5)))


def bm25_weight(
    tf: Column,
    df: Column,
    doclen: Column,
    n_docs: Column | float,
    avgdl: Column | float,
    cfg: BM25Config = BM25Config(),
) -> Column:
    avg = F.lit(avgdl) if not isinstance(avgdl, Column) else avgdl
    k1, b = F.lit(cfg.k1), F.lit(cfg.b)
    if cfg.smallfloat_norms:
        # Lucene norm semantics: score with the byte4 round-tripped
        # doclen (what searcher.search actually uses), enabling
        # validation against true Lucene golden runs
        from .smallfloat import smallfloat4_doclen

        doclen = smallfloat4_doclen(doclen)
    denom = tf + k1 * (F.lit(1.0) - b + b * doclen / avg)
    return idf_bm25(df, n_docs) * tf * (k1 + F.lit(1.0)) / denom


def lm_dirichlet_weight(
    tf: Column,
    cf: Column,
    doclen: Column,
    total_cf: Column | float,
    cfg: LMDirichletConfig = LMDirichletConfig(),
) -> Column:
    total = F.lit(total_cf) if not isinstance(total_cf, Column) else total_cf
    mu = F.lit(cfg.mu)
    p_coll = cf / total
    raw = F.log(F.lit(1.0) + tf / (mu * p_coll)) + F.log(mu / (doclen + mu))
    return F.greatest(raw, F.lit(0.0))


def lm_jm_weight(
    tf: Column,
    df: Column,
    doclen: Column,
    n_docs: Column | float,
    cfg: LMJelinekMercerConfig = LMJelinekMercerConfig(),
) -> Column:
    n = F.lit(n_docs) if not isinstance(n_docs, Column) else n_docs
    lam = cfg.lam
    return F.log(
        F.lit(1.0) + F.lit(lam / (1.0 - lam)) * (tf / doclen) * (n / df)
    )


def tfidf_weight(tf: Column, df: Column, n_docs: Column | float) -> Column:
    n = F.lit(n_docs) if not isinstance(n_docs, Column) else n_docs
    return tf * F.log(n / df)


MODELS = ("bm25", "lmdir", "lmjm", "tfidf")
