"""lucene_msmarco_spark — a PySpark-native inverted-index + BM25 engine.

A brand-new engine with the query/data-processing capabilities of the
reference IR codebase ``gdebasis/lucene-msmarco`` (Lucene 8, Java),
re-expressed Spark-first: DataFrame/SQL logical plans, Catalyst-optimized
joins/aggregations, Arrow-vectorized pandas UDFs only where built-ins
cannot express the semantics (tokenization, posting-blob codecs).

Layout
------
- ``config``      — engine constants (analog of ``retrieval/Constants.java``)
- ``session``     — tuned ``SparkSession`` builders
- ``functions``   — scalar/vectorized functions: analyzers, scoring math
- ``sources``     — readers/writers (TSV/JSONL collections, queries, qrels,
                    TREC res files, sparse vectors) + synthetic transcripts
- ``operators``   — index build, top-k retrieval, feedback/reranking,
                    evaluation metrics, QPP, correlation, dedup, similarity
- ``plans``       — plan-inspection helpers (explain/pushdown assertions)
- ``streaming``   — incremental, checkpoint-resumable index maintenance
- ``oracle``      — pure-Python single-process reference implementation
                    used by the pytest suite as ground truth
"""

__version__ = "0.1.0"
