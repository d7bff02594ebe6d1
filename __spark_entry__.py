"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: full-engine BM25 top-10 (english analyzer,
Arrow-vectorized tokenizer UDF) over sf0.001 documents.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator
(SURVEY.md §2 + training-data-pipeline ops). Each logical query is a single
dialect-templated SQL text rendered for Spark SQL and DuckDB (see
``lucene_msmarco_spark/entry_queries.py``), so the engine and its oracle
share the exact same semantics, stoplist, and rounding.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lucene_msmarco_spark import entry_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pyspark.sql import functions as F

    from lucene_msmarco_spark.operators.index import build_index
    from lucene_msmarco_spark.operators.retrieval import search
    from lucene_msmarco_spark.session import _ship_package

    _ship_package(spark)
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    idx = build_index(docs, analyzer="english")
    qdf = spark.createDataFrame(
        entry_queries.QUERYSET, "qid string, qtext string"
    )
    res = search(idx, qdf, model="bm25", k=10)
    return res.select(
        "qid",
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("rank").cast("int").alias("rank"),
        F.round("score", 4).alias("score"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return entry_queries.spark_queries()


def oracle_sql() -> dict[str, str]:
    return entry_queries.duckdb_oracles()
