"""Readers (SURVEY.md §2.1, S1-S7) — declarative ``spark.read`` scans with
explicit schemas (the reference hard-codes column positions; we make them
``StructType``s so Catalyst can prune/push down).

Reference formats (/root/reference):
- S1 collection TSV: ``docid \\t text`` (``indexing/MsMarcoIndexer.java:67-90``)
- S2 JSONL: ``{id, title, plain}`` -> content = title + " " + plain
  (``indexing/JSONDataIndexer.java:19-45``)
- S3 gzip JSONL {docid, text} + recursive dir walk
  (``indexing/MsMarcoV2JsonToTsvConverter.java:13-48``)
- S4 query TSV: ``qid \\t qtext`` (``retrieval/QueryLoader.java:25-51``)
- S5 qrels: ``qid iter docid rel`` whitespace-separated; keep rel>0;
  first-write-wins per (qid,docid) (``qrels/AllRelRcds.java:37-63``,
  ``qrels/PerQueryRelDocs.java:20-26``)
- S6 res files: 6-col TREC ``qid Q0 docid rank score runname`` or 2-col
  minimalist ``qid docid`` (``qrels/AllRetrievedResults.java:119-146``)
- S7 variants TSV: ``qid \\t qtext \\t v1 ... vn``
  (``retrieval/KNNRelModel.java:141-177``)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_collection_tsv(spark: SparkSession, path: str) -> DataFrame:
    """S1 — (doc_id string, text string)."""
    return spark.read.csv(
        path, sep="\t", schema="doc_id string, text string"
    )


def read_jsonl_collection(
    spark: SparkSession, path: str, recursive: bool = True
) -> DataFrame:
    """S2 — {id,title,plain} JSONL -> (doc_id, text=title+' '+plain);
    gzip auto-detected by Spark; S3's recursion = recursiveFileLookup."""
    df = (
        spark.read.option("recursiveFileLookup", str(recursive).lower())
        .json(path)
    )
    cols = set(df.columns)
    if {"title", "plain"} <= cols:
        text = F.concat_ws(" ", F.col("title"), F.col("plain"))
        did = F.col("id")
    else:  # MS MARCO v2 style {docid, text} (S3)
        text = F.col("text")
        did = F.col("docid") if "docid" in cols else F.col("id")
    # S3 strips newlines/tabs from text
    text = F.regexp_replace(text, r"[\n\t]", " ")
    return df.select(did.cast("string").alias("doc_id"), text.alias("text"))


def read_queries_tsv(spark: SparkSession, path: str) -> DataFrame:
    """S4 — (qid string, qtext string)."""
    return spark.read.csv(path, sep="\t", schema="qid string, qtext string")


def read_qrels(spark: SparkSession, path: str) -> DataFrame:
    """S5 — (qid, doc_id, rel int); rel>0 only; first-write-wins on dup
    (qid,doc_id) reproduced via min-by-line-order -> we use dropDuplicates
    which keeps an arbitrary row; to be faithful we keep the FIRST by file
    order using monotonically_increasing_id (input order preserved per
    file-split; adequate for the single-file qrels the reference uses)."""
    raw = (
        spark.read.text(path)
        .withColumn("_ord", F.monotonically_increasing_id())
        .withColumn("p", F.split(F.trim(F.col("value")), r"\s+"))
        .select(
            F.col("p")[0].alias("qid"),
            F.col("p")[2].alias("doc_id"),
            F.col("p")[3].cast("int").alias("rel"),
            "_ord",
        )
        .filter(F.col("rel") > 0)
    )
    w = Window.partitionBy("qid", "doc_id").orderBy("_ord")
    return (
        raw.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_ord", "_rn")
    )


def read_res(spark: SparkSession, path: str, num_wanted: int | None = None,
             has_header: bool = False) -> DataFrame:
    """S6 — TREC 6-col or minimalist 2-col run file ->
    (qid, doc_id, rank int, score double). 2-col files get rank by file
    order and score 0 (the reference later induces scores — Q8)."""
    lines = spark.read.text(path)
    if has_header:
        # Drop exactly the FIRST line (id 0 = first row of the first
        # partition, i.e. the head of a single-file res). A set
        # ``subtract`` would also collapse duplicate data lines and
        # ``limit(1)`` is not guaranteed to be the head row.
        lines = (
            lines.withColumn("_hdr", F.monotonically_increasing_id())
            .filter(F.col("_hdr") > 0)
            .drop("_hdr")
        )
    parts = lines.withColumn("p", F.split(F.trim(F.col("value")), r"\s+"))
    six = F.size(F.col("p")) >= 6
    df = parts.select(
        F.col("p")[0].alias("qid"),
        F.when(six, F.col("p")[2]).otherwise(F.col("p")[1]).alias("doc_id"),
        F.when(six, F.col("p")[3].cast("int")).alias("rank_raw"),
        F.when(six, F.col("p")[4].cast("double")).otherwise(F.lit(0.0))
        .alias("score"),
        F.monotonically_increasing_id().alias("_ord"),
    )
    w = Window.partitionBy("qid").orderBy(
        F.when(F.col("rank_raw").isNotNull(), F.col("rank_raw"))
        .otherwise(F.col("_ord"))
    )
    out = df.withColumn("rank", F.row_number().over(w)).drop(
        "rank_raw", "_ord"
    )
    if num_wanted:
        out = out.filter(F.col("rank") <= num_wanted)
    return out.select("qid", "doc_id", "rank", "score")


def read_variants_tsv(spark: SparkSession, path: str) -> DataFrame:
    """S7 — (qid, qtext, variant_idx int, vtext)."""
    parts = spark.read.text(path).withColumn(
        "p", F.split(F.col("value"), "\t")
    )
    return parts.select(
        F.col("p")[0].alias("qid"),
        F.col("p")[1].alias("qtext"),
        F.posexplode(F.slice(F.col("p"), 3, 1_000_000)).alias(
            "variant_idx", "vtext"
        ),
    ).filter(F.col("vtext") != "")
