"""Pure-Python single-process oracle: analyze -> index -> score -> top-k.

This is the trivially-auditable ground truth the pytest suite compares the
Spark engine against (SURVEY.md §5 "Oracle 1"). It shares ONLY the
string-level analyzer functions with the engine (so analyzer parity is a
separate test using fixed golden vectors); indexing, scoring and top-k are
re-derived independently here with plain dicts and math.log.

Semantics mirror the reference (/root/reference/src/main/java):
- BM25: idf = ln(1+(N-df+.5)/(df+.5)); wt = idf*tf*(k1+1)/(tf+k1*(1-b+b*dl/avgdl))
  (``retrieval/TermWtUtil.java:6-12``), k1=0.9 b=0.4 per north rule.
- LM-Dirichlet with per-term clamp at 0 (Lucene LMDirichletSimilarity).
- LM-JM: ln(1 + lam/(1-lam) * tf/dl * N/df) (``TermWtUtil.java:18-20``).
- top-k tie-break: score DESC, doc_id ASC (Lucene doc-order ties).
- query-side duplicate tokens score per occurrence.
- number folding on docs only (T2 asymmetry).
"""

from __future__ import annotations

import math
from collections import Counter
from dataclasses import dataclass, field

from ..functions.analysis import analyze_str, fold_numbers_str


@dataclass
class PyIndex:
    analyzer: str = "english"
    fold_numbers: bool = True
    postings: dict[str, dict[object, int]] = field(default_factory=dict)
    doclen: dict[object, int] = field(default_factory=dict)
    n_docs: int = 0
    total_cf: int = 0

    @property
    def avgdl(self) -> float:
        return self.total_cf / self.n_docs if self.n_docs else 0.0

    def add(self, doc_id, text: str) -> None:
        if self.fold_numbers:
            text = fold_numbers_str(text)
        toks = analyze_str(text, self.analyzer)
        self.doclen[doc_id] = len(toks)
        self.n_docs += 1
        self.total_cf += len(toks)
        for t, tf in Counter(toks).items():
            self.postings.setdefault(t, {})[doc_id] = tf

    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def cf(self, term: str) -> int:
        return sum(self.postings.get(term, {}).values())


def build_pyindex(
    docs: list[tuple[object, str]],
    analyzer: str = "english",
    fold_numbers: bool = True,
) -> PyIndex:
    idx = PyIndex(analyzer=analyzer, fold_numbers=fold_numbers)
    for doc_id, text in docs:
        idx.add(doc_id, text)
    return idx


def _bm25(idx: PyIndex, tf: int, df: int, dl: int, k1: float, b: float) -> float:
    idf = math.log(1.0 + (idx.n_docs - df + 0.5) / (df + 0.5))
    return idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / idx.avgdl))


def _lmdir(idx: PyIndex, tf: int, cf: int, dl: int, mu: float) -> float:
    p_coll = cf / idx.total_cf
    raw = math.log(1.0 + tf / (mu * p_coll)) + math.log(mu / (dl + mu))
    return max(0.0, raw)


def _lmjm(idx: PyIndex, tf: int, df: int, dl: int, lam: float) -> float:
    return math.log(1.0 + lam / (1.0 - lam) * (tf / dl) * (idx.n_docs / df))


def _tfidf(idx: PyIndex, tf: int, df: int) -> float:
    return tf * math.log(idx.n_docs / df)


def score_query(
    idx: PyIndex,
    qtext: str,
    model: str = "bm25",
    k1: float = 0.9,
    b: float = 0.4,
    mu: float = 1000.0,
    lam: float = 0.2,
    weights: dict[str, float] | None = None,
) -> dict[object, float]:
    """Accumulate per-doc scores for one query (exhaustive, no pruning)."""
    scores: dict[object, float] = {}
    qterms = Counter(analyze_str(qtext, idx.analyzer))  # qtf multiplicity
    for term, qtf in qterms.items():
        plist = idx.postings.get(term)
        if not plist:
            continue
        df, cf = len(plist), sum(plist.values())
        wq = qtf * (weights.get(term, 1.0) if weights else 1.0)
        for doc_id, tf in plist.items():
            dl = idx.doclen[doc_id]
            if model == "bm25":
                w = _bm25(idx, tf, df, dl, k1, b)
            elif model == "lmdir":
                w = _lmdir(idx, tf, cf, dl, mu)
            elif model == "lmjm":
                w = _lmjm(idx, tf, df, dl, lam)
            elif model == "tfidf":
                w = _tfidf(idx, tf, df)
            else:
                raise ValueError(model)
            scores[doc_id] = scores.get(doc_id, 0.0) + wq * w
    return scores


def topk_query(
    idx: PyIndex, qtext: str, k: int = 100, model: str = "bm25", **kw
) -> list[tuple[object, int, float]]:
    """[(doc_id, rank, score)] with the pinned tie-break."""
    scores = score_query(idx, qtext, model=model, **kw)
    ordered = sorted(scores.items(), key=lambda it: (-it[1], it[0]))[:k]
    return [(d, r + 1, s) for r, (d, s) in enumerate(ordered)]
