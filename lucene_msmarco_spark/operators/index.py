"""Inverted-index construction (SURVEY.md §7 stage A/B).

Replaces the reference's Lucene ``IndexWriter`` path
(``indexing/MsMarcoIndexer.java:48-90`` -> Lucene segments) with three
relational artifacts plus one broadcastable stats object:

    doc_ids    (doc_id bigint, <source keys...>)       — X7 id<->offset map
    tokens     (term, doc_id, tf, doclen)              — X1 postings (+X2 norms,
                                                         denormalized like
                                                         Lucene's per-doc norm)
    doc_stats  (doc_id, doclen)                        — X2
    term_stats (term, df, cf)                          — X3 / S11
    GlobalStats(n_docs, avgdl, total_cf)               — X4 / X8 broadcast

Scale notes (100 TB / 10^12 turns):
- tokenization is one Arrow-batched map over the input partitions — no
  shuffle; ``explode`` + two hash aggregations follow. Spark's partial
  (map-side) aggregation means the per-term reduce only combines one
  partial row per map task even for Zipf-head terms, so the *count*
  aggregations need no explicit salting; explicit ``(term, salt)``
  bucketing matters for posting-blob construction (see postings.py).
- ``doc_id`` assignment is the scalable two-phase dense rank: range-
  partition by the stable key, per-partition ``row_number``, then add
  broadcasted cumulative partition offsets — no global single-partition
  window.
- the tokens table is written bucketed/sorted by term so query-time
  term lookups prune partitions.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.analysis import (
    fold_numbers_col,
    not_stopword,
    simple_tokens_col,
    tokenize_english,
    whitespace_tokens_col,
)


@dataclass(frozen=True)
class GlobalStats:
    """Document-statistics broadcast (north rule: avgdl, N, df)."""

    n_docs: int
    avgdl: float
    total_cf: int


@dataclass
class InvertedIndex:
    docs: DataFrame        # doc store: (doc_id, text, ...) — X6 stored fields
    tokens: DataFrame      # (term, doc_id, tf, doclen)
    doc_stats: DataFrame   # (doc_id, doclen)
    term_stats: DataFrame  # (term, df, cf)
    stats: GlobalStats
    analyzer: str = "english"
    fold_numbers: bool = True

    def cache(self) -> "InvertedIndex":
        self.tokens = self.tokens.cache()
        self.doc_stats = self.doc_stats.cache()
        self.term_stats = self.term_stats.cache()
        return self


def assign_doc_ids(
    df: DataFrame, keys: list[str], num_partitions: int | None = None
) -> DataFrame:
    """Dense 0-based ``doc_id`` over stable ``keys`` ordering, scalably.

    Mirrors the reference invariant "MS MARCO docids == Lucene doc offsets"
    (``retrieval/SupervisedRLM.java:74``, ``utils/IndexUtils.java:22-62``)
    by making doc_id a pure function of the stable (conv_id, turn_idx)
    order — the north rule's round-trip invariant.

    Two-phase: range partition by keys -> row_number within partition
    (cheap, partition-local sort) -> add exclusive prefix-sum of partition
    sizes (tiny driver-side array, broadcast join). No global shuffle to 1
    partition.
    """
    key_cols = [F.col(k) for k in keys]
    parts = df.repartitionByRange(*key_cols) if num_partitions is None else (
        df.repartitionByRange(num_partitions, *key_cols)
    )
    parts = parts.sortWithinPartitions(*key_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = Window.partitionBy("_pid").orderBy(*key_cols)
    local = parts.withColumn("_rn", F.row_number().over(w) - F.lit(1))
    sizes = (
        local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
        .orderBy("_pid")
        .collect()
    )
    offsets, acc = {}, 0
    for r in sizes:
        offsets[r["_pid"]] = acc
        acc += r["_cnt"]
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid int, _off long"
    )
    return (
        local.join(F.broadcast(off_df), "_pid")
        .withColumn("doc_id", (F.col("_rn") + F.col("_off")).cast("long"))
        .drop("_pid", "_rn", "_off")
    )


def tokenize_docs(
    docs: DataFrame,
    text_col: str = "text",
    analyzer: str = "english",
    fold_numbers: bool = True,
) -> DataFrame:
    """(doc_id, term) exploded token stream — one row per token occurrence.

    Doc-side number folding (T2) is applied before tokenization when
    ``fold_numbers`` (the reference folds docs but not queries — quirk
    reproduced; see analysis.py docstring).
    """
    text = F.col(text_col)
    if fold_numbers:
        text = fold_numbers_col(text)
    if analyzer == "english":
        toks = tokenize_english(text)
        out = docs.select("doc_id", F.explode(toks).alias("term"))
    elif analyzer == "simple":
        toks = simple_tokens_col(text)
        out = docs.select("doc_id", F.explode(toks).alias("term"))
        out = out.filter(not_stopword(F.col("term")))
    elif analyzer == "whitespace":
        toks = whitespace_tokens_col(text)
        out = docs.select("doc_id", F.explode(toks).alias("term"))
        out = out.filter(F.col("term") != "")
    else:
        raise ValueError(f"unknown analyzer {analyzer!r}")
    return out


def build_index(
    docs: DataFrame,
    text_col: str = "text",
    analyzer: str = "english",
    fold_numbers: bool = True,
    cache: bool = True,
) -> InvertedIndex:
    """docs must already carry a ``doc_id`` column (use assign_doc_ids)."""
    occurrences = tokenize_docs(docs, text_col, analyzer, fold_numbers)

    tf = occurrences.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    # doclen = post-analysis token count (Lucene norm semantics: the number
    # of terms the analysis chain emits, after stopword removal —
    # MsMarcoIndexer.java:142 setOmitNorms(false)). Docs whose text
    # analyzes to zero tokens keep doclen=0 via the left join.
    doc_stats = (
        docs.select("doc_id")
        .join(
            tf.groupBy("doc_id").agg(F.sum("tf").alias("doclen")),
            "doc_id",
            "left",
        )
        .fillna(0, subset=["doclen"])
    )
    term_stats = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("tf").alias("cf"),
    )
    # denormalize doclen into the postings (Lucene stores norms per doc
    # next to postings; saves a big join at query time)
    tokens = tf.join(doc_stats, "doc_id").select(
        "term", "doc_id", "tf", "doclen"
    )

    idx = InvertedIndex(
        docs=docs,
        tokens=tokens,
        doc_stats=doc_stats,
        term_stats=term_stats,
        stats=compute_global_stats(doc_stats),
        analyzer=analyzer,
        fold_numbers=fold_numbers,
    )
    return idx.cache() if cache else idx


def compute_global_stats(doc_stats: DataFrame) -> GlobalStats:
    """One collection pass -> broadcastable scalars. The reference hard-codes
    avgdl=57.25 (``retrieval/Constants.java:65``); we compute it (X8)."""
    row = doc_stats.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("doclen").alias("avgdl"),
        F.sum("doclen").alias("total_cf"),
    ).collect()[0]
    return GlobalStats(
        n_docs=int(row["n"]),
        avgdl=float(row["avgdl"] or 0.0),
        total_cf=int(row["total_cf"] or 0),
    )
