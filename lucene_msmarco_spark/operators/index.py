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
from typing import Iterator

import pandas as pd
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

    def unpersist(self, blocking: bool = False) -> "InvertedIndex":
        """Release every cache this index pinned — including the doc
        store that assign_doc_ids persists unconditionally. Long-lived
        sessions building many indexes call this per retired index;
        without it cached stores accumulate until the LRU block manager
        starts evicting hot data."""
        for df in (self.tokens, self.doc_stats, self.term_stats,
                   self.docs):
            if df is not None:
                df.unpersist(blocking)
        return self


def assign_doc_ids(
    df: DataFrame, keys: list[str], num_partitions: int | None = None,
    base: int = 0,
) -> DataFrame:
    """Dense ``base``-based ``doc_id`` over stable ``keys`` ordering,
    scalably. ``base`` lets an incremental append allocate a disjoint id
    range on top of an existing index (streaming.SegmentedIndexWriter)
    while keeping the hash clustering computed over the FINAL ids.

    Mirrors the reference invariant "MS MARCO docids == Lucene doc offsets"
    (``retrieval/SupervisedRLM.java:74``, ``utils/IndexUtils.java:22-62``)
    by making doc_id a pure function of the stable (conv_id, turn_idx)
    order — the north rule's round-trip invariant.

    Two-phase: range partition by keys -> row_number within partition
    (cheap, partition-local sort) -> add exclusive prefix-sum of partition
    sizes (tiny driver-side array, broadcast join). No global shuffle to 1
    partition.

    Session-state caveats: (a) the returned store is persist()'d eagerly
    (the hash clustering must be pinned — see below); callers that
    retire an index should release it via ``InvertedIndex.unpersist()``
    or ``df.unpersist()``. (b) While materializing, AQE is toggled off
    SESSION-WIDE for the one count() below (Spark has no per-query
    override for spark.sql.adaptive.enabled) — queries planned
    concurrently in the same session during that window are planned
    without AQE; not thread-safe against concurrent DDL of that conf.
    Both are correctness-neutral; on a cluster deployment this whole
    function is the bucketed Iceberg doc-table write and neither applies.
    """
    key_cols = [F.col(k) for k in keys]
    if num_partitions is None:
        # EXPLICIT partition count, 2x the session's shuffle parallelism.
        # Without a count, repartitionByRange is AQE-coalescible: adaptive
        # execution merges the range partitions up to the advisory size,
        # which leaves the persisted doc store SKEWED (measured on the
        # 600k-turn bench input: 216k/69k rows per partition with 3 of 8
        # empty) — and every downstream stage that scans the doc cache
        # (tokenization above all) inherits that skew 1:1, capping CPU
        # utilization at ~40-50% at BOTH scaling levels. A fixed 2x-cores
        # count pins near-equal row counts per partition and gives the
        # tokenize stage fine-grained, balanced tasks. At cluster scale
        # callers pass num_partitions sized to the corpus instead.
        num_partitions = 2 * int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
    parts = df.repartitionByRange(num_partitions, *key_cols)
    parts = parts.sortWithinPartitions(*key_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = Window.partitionBy("_pid").orderBy(*key_cols)
    local = parts.withColumn("_rn", F.row_number().over(w) - F.lit(1))
    # CRITICAL: pin the physical partitioning before observing _pid.
    # Without persist, the offsets-collect job and later jobs can be
    # re-planned differently (AQE partition coalescing, range-sampling),
    # shifting spark_partition_id values — the inner join on _pid below
    # would then silently drop/mis-number rows. Persist makes every
    # downstream job read the SAME evaluated partitions.
    local = local.persist()
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
    out = (
        local.join(F.broadcast(off_df), "_pid")
        .withColumn(
            "doc_id",
            (F.col("_rn") + F.col("_off") + F.lit(int(base))).cast("long"),
        )
        .drop("_pid", "_rn", "_off")
    )
    # Rebalance the doc store AFTER ids are assigned — BY HASH OF doc_id.
    # Two birds: (1) range partitioning clusters rows by sort key, and any
    # correlation between the key and text length (real corpora have
    # plenty: crawl order, conv length drift) leaves the partitions
    # byte-skewed — measured on the bench corpus as one tokenize task
    # running 5x the others; hash(doc_id) of a dense unique id is
    # uniform, so rows AND bytes even out. (2) The hash clustering is the
    # partitioning invariant every per-doc operator downstream needs:
    # with the store clustered by doc_id, HashPartitioning(doc_id)
    # satisfies the ClusteredDistribution of the (doc_id, raw) and
    # (doc_id, term) aggregations, the doclen window, and the doc_stats
    # join, so the whole english index build plans WITHOUT ANY FURTHER
    # EXCHANGE — the token stream (the largest intermediate there is at
    # 10^12 turns) never crosses the wire at all; the only shuffle in the
    # build is this one, over the raw documents. (In a cluster deployment
    # this is the Iceberg doc-table write, bucketed by doc_id.)
    # Materialize the store with AQE off for THIS plan only: an
    # adaptively-planned cached relation reports UnknownPartitioning
    # (its final layout is only fixed at execution), so every downstream
    # consumer would re-exchange despite the data already being hash
    # placed. A non-adaptive cached plan reports HashPartitioning and
    # EnsureRequirements elides the exchanges. Nothing here needs AQE:
    # both shuffles are row-balanced by construction.
    spark = df.sparkSession
    aqe_was = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        out = out.repartition(num_partitions, F.col("doc_id")).persist()
        out.count()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_was)
    local.unpersist()
    # The offsets pass already counted every partition — stash the total
    # so build_index can skip a redundant count() job when computing
    # GlobalStats.n_docs. Plain attributes: lost on further transformation
    # (callers that filter/transform fall back to counting / an explicit
    # repartition), never wrong.
    out._lms_n_docs = acc
    out._lms_clustered_by = "doc_id"
    return out


#: UAX#29-lite word pattern for the JVM fast path — java.util.regex with
#: (?U) so \w covers unicode letters, mirroring the Python analyzer's
#: ``_WORD_RE``.
_JVM_WORD_PATTERN = r"(?U)\w+(?:['’.]\w+)*"
_JVM_POSSESSIVE = r"['’][sS]$"


def raw_token_occurrences(
    docs: DataFrame, text_col: str = "text", fold_numbers: bool = True
) -> DataFrame:
    """JVM-only first stage of the english analyzer: UAX#29-lite tokenize,
    possessive strip, lowercase -> one (doc_id, raw) row per occurrence.
    Stopword removal and Porter stemming happen later at the VOCABULARY
    level (see build_index) so no Python ever touches the token stream.

    Perf notes: lowercase is applied ONCE per document before extraction
    (the word pattern is case-blind after lowering), and the possessive
    strip is plain right()/left() string ops — a per-token regexp_replace
    costs ~20s per 6.5M tokens, the substring form is near-free."""
    text = F.col(text_col)
    if fold_numbers:
        text = fold_numbers_col(text)
    # lower once per doc (the injected ' _NUM_ ' marker lowers to '_num_',
    # matching the per-token LowerCaseFilter in the UDF path)
    text = F.lower(text)
    toks = F.regexp_extract_all(text, F.lit(_JVM_WORD_PATTERN), 0)
    # EnglishPossessiveFilter: strip trailing 's / ’s (already lowercased)
    raw = F.when(
        F.col("tok").endswith("'s") | F.col("tok").endswith("’s"),
        F.expr("substring(tok, 1, length(tok) - 2)"),
    ).otherwise(F.col("tok"))
    return (
        docs.select("doc_id", F.explode(toks).alias("tok"))
        .select("doc_id", raw.alias("raw"))
        .filter(F.col("raw") != "")
    )


def raw_token_counts(
    docs: DataFrame, text_col: str = "text", fold_numbers: bool = True
) -> DataFrame:
    """Aggregated (doc_id, raw, tf_raw) form of raw_token_occurrences."""
    return (
        raw_token_occurrences(docs, text_col, fold_numbers)
        .groupBy("doc_id", "raw")
        .agg(F.count(F.lit(1)).cast("long").alias("tf_raw"))
    )


_stem_vocab_udf = None


def _stem_vocab(col):
    """pandas UDF over DISTINCT raw token types: returns the Porter stem,
    or NULL for stopwords (which drops the row on inner join)."""
    global _stem_vocab_udf
    if _stem_vocab_udf is None:
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import StringType

        from ..functions.analysis import stopwords
        from ..functions.porter import porter_stem

        def go(raws):
            stops = stopwords()
            return raws.map(
                lambda r: None if (not r or r in stops) else porter_stem(r)
            )

        _stem_vocab_udf = pandas_udf(go, StringType())
    return _stem_vocab_udf(col)


_stem_tokens_udf = None


def _stem_tokens(col):
    """Memoized vocabulary stemming applied INLINE to the aggregated
    (doc_id, raw) stream — the scale path's replacement for a separate
    distinct+stem+broadcast-join round trip.

    Iterator-of-Series Arrow UDF: per batch, ``unique()`` the raw types,
    Porter-stem only previously-unseen types (task-local dict cache —
    Zipf token statistics push the hit rate toward 1 after the first
    batch), then map every row back through the dict with pandas'
    C-level ``Series.map``. Stopwords map to NULL (callers filter).

    Why inline beats the broadcast dictionary at BOTH ends of the scale:
    - small corpora: no extra job for ``distinct``, no broadcast-exchange
      build, no join — the stemming rides inside the one tf pipeline, so
      the parallelism-independent cost (2 extra stages + a driver
      collect) disappears, which is what the N-vs-4N scaling ratio sees;
    - 10^12 turns: a global dictionary broadcast grows with |vocab| and
      eventually cannot broadcast at all, while the task-local cache is
      bounded by per-task distinct types and never crosses the wire.
    """
    global _stem_tokens_udf
    if _stem_tokens_udf is None:
        from pyspark.sql.functions import pandas_udf

        def go(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
            from ..functions.analysis import stopwords
            from ..functions.porter import porter_stem

            stops = stopwords()
            cache: dict = {}
            for raws in batches:
                for r in raws.unique():
                    if r not in cache:
                        cache[r] = (
                            None if (not r or r in stops) else porter_stem(r)
                        )
                yield raws.map(cache)

        # The UDF is pure, but the nondeterministic marker is load-bearing
        # for the PLAN: without it Catalyst pushes the downstream
        # ``isnotnull(stem(raw))`` stopword filter through the
        # (doc_id, raw) aggregate, re-evaluating the UDF over the
        # occurrence-level stream — a second ArrowEvalPython round-trip
        # of every token occurrence (measured: doubles the Python/Arrow
        # traffic of the build). Correctness is unaffected either way;
        # this pins the evaluate-once-per-type shape.
        _stem_tokens_udf = pandas_udf(go, "string").asNondeterministic()
    return _stem_tokens_udf(col)


#: worker-process-level stem memo for the fused finisher: python workers
#: are reused across tasks, and Zipf token statistics make the raw-type
#: set nearly identical between partitions, so after the first task the
#: per-task stemming cost collapses to dict lookups. Never crosses the
#: wire; capped at _FUSED_STEM_MEMO_MAX entries (evict-all on overflow —
#: at web-scale type counts an unbounded memo would grow a long-lived
#: worker without limit, and Zipf stats mean a full rebuild re-converges
#: within one batch).
_FUSED_STEM_MEMO: dict = {}
_FUSED_STEM_MEMO_MAX = 2_000_000


def _fused_aggregate(df: "pd.DataFrame"):
    """Shared core of the fused finishers: one partition's JVM-aggregated
    (doc_id, raw, tf_raw) frame -> (tf, doclen, terms) where ``tf`` has
    integer term codes (columns doc_id, tc, tf), ``doclen`` is the
    per-row transform-sum, and ``terms`` decodes tc -> term string.
    Returns None when everything was stopwords. See _fused_finish for
    the semantics and sizing notes.

    Sizing requirement: the whole partition's aggregated (doc_id, raw,
    tf_raw) stream is buffered as ONE pandas frame, so per-task memory
    is bounded by docs-per-partition x distinct-types-per-doc. The
    assign_doc_ids store is data-sized (and hash-balanced in rows AND
    bytes) exactly so this bound stays flat as the corpus grows — at
    cluster scale size ``num_partitions`` to keep partitions at the
    usual 100-200 MB, which keeps this frame well under 1 GB. A skewed
    external doc store should be repartition()'d first (the non-
    clustered branch below does); if a deployment cannot bound its
    partitions, use english_strategy="inline", which streams Arrow
    batches instead of buffering the partition.
    """
    import numpy as np

    from ..functions.analysis import stopwords
    from ..functions.porter import porter_stem

    stops = stopwords()
    memo = _FUSED_STEM_MEMO
    # Stem at the TYPE level, then do all row-level work on integer
    # codes: object-dtype string groupbys are the memory-bandwidth hog
    # of this finisher (every probe chases a PyObject pointer), while
    # int64 groupbys stay on numpy fast paths. factorize() gives the
    # raw -> code mapping in one C pass; stems (and the stopword drop,
    # code -1) are then a |types|-sized table lookup away.
    raw_codes, raw_types = pd.factorize(df["raw"], sort=False)
    term_of_type: dict[str, int] = {}
    terms: list[str] = []
    type_to_term = np.empty(len(raw_types), dtype=np.int64)
    for i, r in enumerate(raw_types):
        t = memo.get(r, _FUSED_STEM_MEMO)  # sentinel: not-yet-stemmed
        if t is _FUSED_STEM_MEMO:
            t = None if (not r or r in stops) else porter_stem(r)
            if len(memo) >= _FUSED_STEM_MEMO_MAX:
                memo.clear()
            memo[r] = t
        if t is None:
            type_to_term[i] = -1
        else:
            code = term_of_type.get(t)
            if code is None:
                code = len(terms)
                term_of_type[t] = code
                terms.append(t)
            type_to_term[i] = code
    term_codes = type_to_term[raw_codes]
    keep = term_codes >= 0
    if not keep.any():
        return None
    doc_ids = df["doc_id"].to_numpy()[keep]
    tf_raw = df["tf_raw"].to_numpy()[keep]
    key = pd.DataFrame({"doc_id": doc_ids, "tc": term_codes[keep],
                        "tf": tf_raw})
    tf = key.groupby(["doc_id", "tc"], sort=False, as_index=False)["tf"].sum()
    doclen = tf.groupby("doc_id", sort=False)["tf"].transform("sum")
    return tf, doclen, terms


def _fused_finish(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
    """Per-partition finisher for the fused english build: consumes the
    JVM-aggregated (doc_id, raw, tf_raw) stream of ONE partition (all
    batches), then in vectorized pandas (_fused_aggregate): memoized
    Porter-stem the raw types (stopwords -> dropped), merge stem
    collisions with a groupby(doc_id, term).sum, and attach doclen =
    groupby(doc_id) transform-sum. REQUIRES the partition to hold
    complete documents (guaranteed by hash(doc_id) clustering — see
    _english_index_parts); sizing notes in _fused_aggregate.
    """
    import numpy as np

    frames = list(batches)
    if not frames:
        return
    df = pd.concat(frames, ignore_index=True)
    res = _fused_aggregate(df)
    if res is None:
        return
    tf, doclen, terms = res
    term_arr = np.asarray(terms, dtype=object)
    yield pd.DataFrame(
        {
            "term": pd.Series(term_arr[tf["tc"].to_numpy()], dtype=object),
            "doc_id": tf["doc_id"].astype("int64"),
            "tf": tf["tf"].astype("int64"),
            "doclen": doclen.astype("int64"),
        }
    )


def tokenize_docs(
    docs: DataFrame,
    text_col: str = "text",
    analyzer: str = "english",
    fold_numbers: bool = True,
) -> DataFrame:
    """(doc_id, term) exploded token stream — one row per token occurrence.
    Used by tests and small flows; build_index uses the aggregated
    dictionary path below for the english analyzer.

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


def _english_index_parts(
    docs: DataFrame,
    text_col: str,
    fold_numbers: bool,
    strategy: str = "fused",
) -> tuple[DataFrame, DataFrame]:
    """Vocabulary-stemmed english analysis (the 100TB-scale path):

    1. ONE tokenize pass, all whole-stage codegen, ending in the
       aggregated (doc_id, raw, tf_raw) stream — the smallest faithful
       form of the token stream. With the doc store hash(doc_id)-
       clustered (assign_doc_ids), this aggregation needs NO exchange:
       every (doc_id, raw) group lives inside the task holding the doc.
    2. Porter-stem the vocabulary, not the stream. Three interchangeable
       forms (tested equal):
       - ``fused`` (default): one mapInPandas finisher per partition
         consumes the aggregated stream and does memoized vocab stemming
         + stem-collision merge + doclen in vectorized pandas
         (_fused_finish). Combined with the clustered doc store the
         ENTIRE build is a single exchange-free stage — the token
         stream, the largest intermediate there is at 10^12 turns,
         never crosses the wire; the only build shuffle is the doc-store
         write itself. No broadcast-size ceiling on |vocab|.
       - ``inline``: memoized Arrow UDF on the aggregated stream
         (see _stem_tokens), then a (doc_id, term) re-aggregation and a
         doclen window over ONE repartition("doc_id") — the pre-fused
         linear pipeline; one token-stream exchange (ArrowEvalPython
         does not propagate the input's clustering, so the exchange is
         unavoidable in this shape).
       - ``dictionary``: distinct raw types -> stem -> broadcast join.
         Kept as an independent differential-test implementation; the
         broadcast grows with |vocab| at corpus scale.
       Stopwords map to NULL/NaN and are dropped in all three.
    3. doclen rides along with NO per-doc join at all (pandas
       transform-sum in ``fused``; window over the doc_id partitioning
       otherwise). This matters twice over at scale: a doclen join
       either broadcasts an O(n_docs) side (impossible at 10^9 docs) or
       SortMergeJoin-re-shuffles the postings at query time (the
       round-2 plan regression caught by tests/test_plans.py).

    Returns (doc_stats(doc_id, doclen), tokens(term, doc_id, tf,
    doclen)); both are LAZY — build_index materializes tokens once and
    derives everything else from its cache.

    doclen = Σ tf after stemming (stemming never changes the token
    count), i.e. Lucene's norm semantics (MsMarcoIndexer.java:142
    setOmitNorms(false)).
    """
    # (doc_id, raw, tf_raw): 100% whole-stage-codegen row-level
    # expressions (regexp inside the Generate input; possessive strip as
    # a plain when/substring AFTER the explode — deliberately NO
    # higher-order array functions: transform/filter/array_sort are
    # CodegenFallback, interpreted per element, and a 571-word
    # array_contains stoplist probe per token costs more than the whole
    # rest of the build). Aggregating (doc_id, raw) FIRST is measurably
    # the right order: partial agg combines map-side, and the ~1.5×
    # data reduction pays for itself in every downstream scan/probe
    # (A/B'd against a skip-the-first-shuffle occurrence-level plan:
    # that one loses ~45% at low parallelism because local shuffles are
    # cheap but the unreduced stream isn't).
    clustered = getattr(docs, "_lms_clustered_by", None) == "doc_id"
    if strategy == "fused":
        # The fused finisher aggregates per PARTITION, so partitions
        # must hold complete documents: the assign_doc_ids store already
        # does (hash(doc_id) clustering, visible to the planner); any
        # other source gets one explicit doc-level repartition — of the
        # raw doc rows, cheaper than any token-level exchange.
        base = docs if clustered else docs.repartition("doc_id")
        raw_tf = raw_token_counts(base, text_col, fold_numbers)
        tokens = raw_tf.mapInPandas(
            _fused_finish, "term string, doc_id long, tf long, doclen long"
        )
        # every row of a doc is emitted by the one finisher task holding
        # the doc (hash(doc_id) clustering) — the invariant the
        # zero-shuffle segment encoder keys off
        # (postings.encode_postings_partition_local)
        tokens._lms_doc_complete_partitions = True
        doc_stats = (
            docs.select("doc_id")
            .join(
                tokens.groupBy("doc_id").agg(
                    F.max("doclen").cast("long").alias("doclen")
                ),
                "doc_id",
                "left",
            )
            .fillna(0, subset=["doclen"])
        )
        return doc_stats, tokens
    raw_tf = raw_token_counts(docs, text_col, fold_numbers)
    if strategy == "inline":
        # stemming rides the reduce side of the first shuffle; stopword
        # rows (term NULL) drop before anything crosses the second wire.
        mapped = (
            raw_tf.withColumn("term", _stem_tokens(F.col("raw")))
            .filter(F.col("term").isNotNull())
            .select("doc_id", "term", "tf_raw")
        )
    else:  # "dictionary"
        raw_tf = raw_tf.persist()
        vocab = raw_tf.select("raw").distinct()
        dictionary = vocab.select(
            "raw", _stem_vocab(F.col("raw")).alias("term")
        ).filter(F.col("term").isNotNull())
        mapped = raw_tf.join(F.broadcast(dictionary), "raw").select(
            "doc_id", "term", "tf_raw"
        )
    # The (doc_id, term) aggregation merges distinct raws sharing a stem
    # ("running"/"runs" -> "run"), summing like Lucene when the filter
    # chain emits equal terms.
    # Repartition the mapped (doc_id, term, tf_raw) rows by doc_id ONCE;
    # hash(doc_id) satisfies the ClusteredDistribution of both the
    # (doc_id, term) stem-merge aggregation and the per-doc window below,
    # so neither inserts a further exchange. (The upstream store's own
    # clustering cannot be reused here: ArrowEvalPython reports unknown
    # output partitioning, so the planner re-exchanges regardless — the
    # ``fused`` strategy exists to avoid exactly this.) No doclen join
    # ever reaches the query-time plan (the round-2 SMJ regression).
    mapped = mapped.repartition("doc_id")
    tf = (
        mapped
        .groupBy("doc_id", "term")
        .agg(F.sum("tf_raw").cast("long").alias("tf"))
    )
    # doclen = Σ tf over the doc, as a window over the SAME partitioning
    # — no join, no broadcast, no re-shuffle; just a partition-local
    # sort by doc_id (WindowExec's requirement).
    tokens = tf.withColumn(
        "doclen",
        F.sum("tf").over(Window.partitionBy("doc_id")).cast("long"),
    ).select("term", "doc_id", "tf", "doclen")
    # docs whose text analyzes to zero tokens vanish in the explode;
    # the left join restores them with doclen=0. Lazy: reads the tokens
    # cache (doclen is constant within a doc) instead of re-running the
    # pipeline or keeping a second persisted tf copy.
    doc_stats = (
        docs.select("doc_id")
        .join(
            tokens.groupBy("doc_id").agg(
                F.max("doclen").cast("long").alias("doclen")
            ),
            "doc_id",
            "left",
        )
        .fillna(0, subset=["doclen"])
    )
    return doc_stats, tokens


def _tf_english_fast(
    docs: DataFrame, text_col: str, fold_numbers: bool
) -> DataFrame:
    """Back-compat shim: (doc_id, term, tf) via _english_index_parts'
    default strategy (``fused``)."""
    _, tokens = _english_index_parts(docs, text_col, fold_numbers)
    return tokens.select("doc_id", "term", "tf")


def _n_docs_of(docs: DataFrame) -> int:
    """Total doc count, without a redundant job when assign_doc_ids
    already counted every partition for the offset prefix-sum."""
    n = getattr(docs, "_lms_n_docs", None)
    return int(n) if n is not None else docs.count()


def build_index(
    docs: DataFrame,
    text_col: str = "text",
    analyzer: str = "english",
    fold_numbers: bool = True,
    cache: bool = True,
    english_strategy: str = "fused",
) -> InvertedIndex:
    """docs must already carry a ``doc_id`` column (use assign_doc_ids).

    ``english_strategy``: "fused" (default — JVM token stream + one
    mapInPandas stem/merge/doclen finisher over the hash(doc_id)
    clustering, a single exchange-free stage: the scale path), "inline"
    (memoized Arrow stem UDF + re-aggregation over one token-stream
    exchange), "dictionary" (distinct-vocab stem + broadcast join), or
    "udf" (Arrow UDF per document — the reference implementation). All
    four are tested equal (tests/test_analysis.py).

    The english fast paths build the WHOLE index from one materialization
    of ``tokens``: GlobalStats comes from a cached-scan aggregate (plus
    the doc count assign_doc_ids already knows) instead of a docs⋈doclens
    join — at 10^9 docs that join is a real shuffle, and its only output
    the build needs eagerly is two scalars."""
    if analyzer == "english" and english_strategy in (
            "fused", "inline", "dictionary"):
        # doclen (Lucene norm semantics: post-StopFilter token count —
        # MsMarcoIndexer.java:142 setOmitNorms(false)) rides along via a
        # window over the tf table's own doc_id partitioning, so postings
        # carry it with NO doc-stats join in the query-time plan. Docs
        # whose text analyzes to zero tokens keep doclen=0 in doc_stats.
        doc_stats, tokens = _english_index_parts(
            docs, text_col, fold_numbers, strategy=english_strategy
        )
        if cache:
            tokens = tokens.persist()
        term_stats = tokens.groupBy("term").agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.sum("tf").alias("cf"),
        )
        # ONE action materializes the tokens persist AND yields the
        # corpus-frequency scalar; n_docs needs no job at all on the
        # assign_doc_ids path. avgdl counts zero-token docs at doclen=0,
        # exactly like the avg() over the doc_stats left join.
        total_cf = int(
            tokens.agg(F.sum("tf").alias("cf")).collect()[0]["cf"] or 0
        )
        n_docs = _n_docs_of(docs)
        stats = GlobalStats(
            n_docs=n_docs,
            avgdl=(total_cf / n_docs) if n_docs else 0.0,
            total_cf=total_cf,
        )
    else:
        occurrences = tokenize_docs(docs, text_col, analyzer, fold_numbers)
        tf = occurrences.groupBy("doc_id", "term").agg(
            F.count(F.lit(1)).cast("long").alias("tf")
        )
        # tokenization is the expensive pass; pin it so the three derived
        # artifacts (doc_stats, term_stats, tokens) each read the
        # evaluated tf instead of re-running the analyzer chain 3-4x.
        if cache:
            tf = tf.persist()
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
        # denormalize doclen into the postings (Lucene stores norms per
        # doc next to postings; saves a big join at query time)
        tokens = tf.join(doc_stats, "doc_id").select(
            "term", "doc_id", "tf", "doclen"
        )
        stats = compute_global_stats(doc_stats)

    idx = InvertedIndex(
        docs=docs,
        tokens=tokens,
        doc_stats=doc_stats,
        term_stats=term_stats,
        stats=stats,
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
