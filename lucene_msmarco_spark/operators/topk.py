"""Top-k per query — the engine's analog of Lucene's priority-queue
``searcher.search(query, k)`` (Q3, ``retrieval/OneStepRetriever.java:117``).

Tie-break is pinned everywhere to (score DESC, doc_id ASC) — Lucene breaks
score ties by ascending internal doc order (SURVEY.md §7.3 #4).

Two physical strategies, result-identical:

- ``window``    — ``row_number`` over a per-qid window. One shuffle by qid;
  AQE coalesces. Fine when (#queries x #candidate docs) fits shuffle.
- ``two_phase`` — the north rule's scatter-gather: per-partition heap
  (Arrow-batched ``applyInPandas`` over ``(qid, partition)`` groups is
  avoided — instead a partition-local ``mapInPandas`` heap keeps only the
  k best rows per qid per input partition), then the window strategy over
  the drastically reduced candidate set. At 1000 executors this bounds the
  qid shuffle to k x num_partitions rows per query instead of one row per
  scored document.
"""

from __future__ import annotations

import heapq
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _ranked(scored: DataFrame, k: int, score_col: str, qid_col: str,
            doc_col: str) -> DataFrame:
    w = (
        Window.partitionBy(qid_col)
        .orderBy(F.col(score_col).desc(), F.col(doc_col).asc())
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def topk_window(
    scored: DataFrame,
    k: int,
    score_col: str = "score",
    qid_col: str = "qid",
    doc_col: str = "doc_id",
) -> DataFrame:
    return _ranked(scored, k, score_col, qid_col, doc_col)


def topk_two_phase(
    scored: DataFrame,
    k: int,
    score_col: str = "score",
    qid_col: str = "qid",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Phase 1: partition-local heaps (no shuffle). Phase 2: global merge."""
    schema = scored.select(qid_col, doc_col, score_col).schema

    def local_heaps(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # heap per qid within this partition; (score, -doc_id is wrong for
        # string docs) -> keep (score asc, doc desc) ordering via tuple so
        # heappushpop evicts the worst (lowest score, then highest doc).
        heaps: dict[object, list] = {}
        for pdf in batches:
            for qid, doc, sc in zip(
                pdf[qid_col].values, pdf[doc_col].values, pdf[score_col].values
            ):
                h = heaps.setdefault(qid, [])
                item = (sc, _NegOrd(doc), doc)
                if len(h) < k:
                    heapq.heappush(h, item)
                else:
                    heapq.heappushpop(h, item)
        rows = [
            (qid, it[2], it[0]) for qid, h in heaps.items() for it in h
        ]
        yield pd.DataFrame(rows, columns=[qid_col, doc_col, score_col])

    reduced = scored.select(qid_col, doc_col, score_col).mapInPandas(
        local_heaps, schema=schema
    )
    return _ranked(reduced, k, score_col, qid_col, doc_col)


class _NegOrd:
    """Inverts ordering so the min-heap evicts (low score, HIGH doc_id)
    first, matching the (score desc, doc_id asc) global tie-break."""

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __lt__(self, other):
        return other.v < self.v

    def __eq__(self, other):
        return self.v == other.v


def topk(
    scored: DataFrame,
    k: int,
    strategy: str = "window",
    **kw,
) -> DataFrame:
    if strategy == "window":
        return topk_window(scored, k, **kw)
    if strategy == "two_phase":
        return topk_two_phase(scored, k, **kw)
    raise ValueError(f"unknown top-k strategy {strategy!r}")
