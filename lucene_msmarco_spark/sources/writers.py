"""Sinks (SURVEY.md §2.1, S8-S13).

- S9 TREC res: ``qid Q0 docid rank score runname`` with %.4f score
  (``retrieval/OneStepRetriever.java:168-174``)
- S10 sparse vectors: (doc_id, term, weight) with tf / tf-idf / BM25
  weighting (``indexing/SparseVecWriter.java:63-164``; BM25 there uses
  k=1.2 b=0.75 — kept as that sink's default)
- S11 vocab/df dump (``indexing/IndexTester.java:59-84``)
- S12 few-shot JSON (``retrieval/KNNRelModel.java:197-295``)
- S13 model TSV save/load (``retrieval/SupervisedRLM.java:202-238``) —
  term distributions persisted as parquet (qterm, coterm, wt)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import BM25Config
from ..functions.scoring import bm25_weight, tfidf_weight
from ..operators.index import InvertedIndex


def format_trec_run(run: DataFrame, run_name: str = "lms") -> DataFrame:
    """S9 — one string column 'line' in TREC 6-col format."""
    return run.select(
        F.format_string(
            "%s\tQ0\t%s\t%d\t%.4f\t%s",
            F.col("qid"),
            F.col("doc_id").cast("string"),
            F.col("rank"),
            F.col("score").cast("double"),
            F.lit(run_name),
        ).alias("line")
    )


def write_trec_run(run: DataFrame, path: str, run_name: str = "lms") -> None:
    (
        format_trec_run(run, run_name)
        .coalesce(1)
        .write.mode("overwrite")
        .text(path)
    )


def sparse_vectors(
    index: InvertedIndex,
    weighting: str = "bm25",
    bm25: BM25Config = BM25Config(k1=1.2, b=0.75),
    doc_ids: DataFrame | None = None,
) -> DataFrame:
    """S10 — (doc_id, term, weight). ``doc_ids``: optional DataFrame with a
    doc_id column to restrict (the 'top docs' variant); broadcast semi-join."""
    t = index.tokens
    if doc_ids is not None:
        t = t.join(F.broadcast(doc_ids.select("doc_id").distinct()), "doc_id")
    t = t.join(index.term_stats.select("term", "df"), "term")
    s = index.stats
    tf, df, dl = (
        F.col("tf").cast("double"),
        F.col("df").cast("double"),
        F.col("doclen").cast("double"),
    )
    if weighting == "tf":
        w = tf
    elif weighting == "tfidf":
        w = tfidf_weight(tf, df, float(s.n_docs))
    elif weighting == "bm25":
        w = bm25_weight(tf, df, dl, float(s.n_docs), s.avgdl, bm25)
    else:
        raise ValueError(weighting)
    return t.select("doc_id", "term", w.alias("weight"))


def vocab_dump(index: InvertedIndex) -> DataFrame:
    """S11 — (term, df) plus a dense vocabulary id ordered by term (the
    reference's 'first-seen order' is index-iteration order, i.e. sorted
    terms in a Lucene terms dict — lexicographic here too)."""
    from pyspark.sql import Window

    w = Window.orderBy("term")
    return index.term_stats.select(
        "term", "df", (F.row_number().over(w) - 1).alias("term_id")
    )


def fewshot_json(
    topk: DataFrame, qrels: DataFrame, queries: DataFrame
) -> DataFrame:
    """S12 — per-query JSON doc: query text, rel/nonrel retrieved doc ids
    with ranks (shape analog of KNNRelModel's few-shot examples)."""
    joined = (
        topk.join(qrels, ["qid", "doc_id"], "left")
        .fillna(0, subset=["rel"])
    )
    per_q = joined.groupBy("qid").agg(
        F.sort_array(
            F.collect_list(
                F.struct("rank", "doc_id", "rel")
            )
        ).alias("docs")
    )
    out = per_q.join(queries, "qid")
    return out.select(
        "qid",
        F.to_json(
            F.struct(
                F.col("qid"),
                F.col("qtext"),
                F.expr("filter(docs, d -> d.rel > 0)").alias("rel_docs"),
                F.expr("filter(docs, d -> d.rel = 0)").alias("nonrel_docs"),
            )
        ).alias("json"),
    )


def save_term_distribution(model: DataFrame, path: str) -> None:
    """S8/S13 — (qterm, coterm, wt) persisted as parquet."""
    model.write.mode("overwrite").parquet(path)


def load_term_distribution(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def permutation_map(run_pre: DataFrame, run_post: DataFrame) -> DataFrame:
    """S13 — per-qid permutation lines ``qid \\t preRank>postRank,...``
    (``qpp/PreComputedPredictor.java:67-99``): for each doc of the
    pre-run, the rank it moved to in the post-run, in pre-rank order."""
    pre = run_pre.select("qid", "doc_id", F.col("rank").alias("pre_rank"))
    post = run_post.select("qid", "doc_id", F.col("rank").alias("post_rank"))
    joined = pre.join(post, ["qid", "doc_id"])
    pairs = joined.select(
        "qid", "pre_rank",
        F.concat_ws(
            ">",
            F.col("pre_rank").cast("string"),
            F.col("post_rank").cast("string"),
        ).alias("pair"),
    )
    agg = pairs.groupBy("qid").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pre_rank", "pair"))
                ),
                lambda s: s["pair"],
            ),
            ",",
        ).alias("perm")
    )
    return agg.select(
        "qid", F.concat_ws("\t", F.col("qid"), F.col("perm")).alias("line")
    )


def analyzed_export(docs: DataFrame, analyzer: str = "english") -> DataFrame:
    """T3 — pre-analysis export (``indexing/Preprocessor.java:9-31``):
    (doc_id, analyzed) where ``analyzed`` is the space-joined token stream
    (the reference's ``msmarco.stop.stemmed.tsv``). Write with
    ``df.select(format_string('%s\\t%s', ...)).write.text`` for the TSV."""
    from ..functions.analysis import (
        simple_tokens_col,
        tokenize_english,
        whitespace_tokens_col,
    )
    from ..functions.analysis import fold_numbers_col

    text = fold_numbers_col(F.col("text"))
    if analyzer == "english":
        toks = tokenize_english(text)
    elif analyzer == "simple":
        toks = F.filter(simple_tokens_col(text), _not_stop_lambda())
    else:
        toks = whitespace_tokens_col(text)
    return docs.select(
        "doc_id", F.array_join(toks, " ").alias("analyzed")
    )


def _not_stop_lambda():
    from ..functions.analysis import stopwords

    sw = F.array(*[F.lit(s) for s in sorted(stopwords())])
    return lambda t: ~F.array_contains(sw, t)
