"""Pure-Python oracle for the feedback layer (F1-F5), independently derived
from the reference semantics (see operators/feedback.py docstring for the
formula provenance and quirks: constant sumDf=numTopDocs, per-term sumSim)."""

from __future__ import annotations

import math
from collections import Counter

from ..functions.analysis import analyze_str
from .pyoracle import PyIndex


def top_docs_stats(idx: PyIndex, ranked: list[tuple[object, int, float]],
                   num_top_docs: int):
    """ranked: [(doc_id, rank, score)] rank-sorted. Returns
    (doc_vecs, term_stats, sum_tf, sum_sim)."""
    doc_vecs = {}   # doc_id -> (rank, sim, Counter(term->tf), doclen)
    term_tf: Counter = Counter()
    term_df: Counter = Counter()
    sum_tf = 0
    sum_sim = 0.0
    for doc_id, rank, sim in ranked:
        vec = Counter()
        for t, plist in idx.postings.items():
            if doc_id in plist:
                vec[t] = plist[doc_id]
        doc_vecs[doc_id] = (rank, sim, vec, idx.doclen[doc_id])
        if rank <= num_top_docs:
            for t, tf in vec.items():
                term_tf[t] += tf
                term_df[t] += 1
                sum_tf += tf
                sum_sim += sim  # reference quirk: once per distinct term
    return doc_vecs, term_tf, term_df, sum_tf, sum_sim


def rm1_weights(idx: PyIndex, qtext: str, ranked, num_top_docs: int,
                lam: float = 0.9) -> dict[str, float]:
    _, term_tf, term_df, sum_tf, _ = top_docs_stats(idx, ranked, num_top_docs)
    qterms = set(analyze_str(qtext, idx.analyzer))
    total_p_q = sum(
        math.log(1.0 + term_tf[q] / sum_tf) for q in qterms if q in term_tf
    )
    out = {}
    for t in term_tf:
        p_w = lam * term_tf[t] / sum_tf + (1 - lam) * term_df[t] / num_top_docs
        out[t] = p_w * math.exp(total_p_q - 1.0)
    return out


def rm_conditional_weights(idx: PyIndex, ranked, num_top_docs: int,
                           lam: float = 0.9) -> dict[str, float]:
    doc_vecs, _, term_df, _, sum_sim = top_docs_stats(
        idx, ranked, num_top_docs
    )
    out: dict[str, float] = {}
    for _doc, (rank, sim, vec, doclen) in doc_vecs.items():
        if rank > num_top_docs:
            continue
        for t, tf in vec.items():
            p_w = lam * tf / doclen + (1 - lam) * term_df[t] / num_top_docs
            out[t] = out.get(t, 0.0) + p_w * sim / sum_sim
    return out


def kl_rerank(idx: PyIndex, ranked, wts: dict[str, float]):
    """-> [(doc_id, new_rank, score)] with (score desc, prev rank asc)."""
    doc_vecs, *_ = top_docs_stats(idx, ranked, 0)
    rescored = []
    for doc_id, prev_rank, _sim in ranked:
        _, _, vec, doclen = doc_vecs[doc_id]
        kl = 0.0
        for t, wt in wts.items():
            tf = vec.get(t, 0)
            if tf == 0:
                continue
            kl += wt * math.log(wt / (tf / doclen))
        rescored.append((doc_id, prev_rank, 1.0 - math.exp(kl)))
    rescored.sort(key=lambda x: (-x[2], x[1]))
    return [(d, i + 1, s) for i, (d, _r, s) in enumerate(rescored)]
