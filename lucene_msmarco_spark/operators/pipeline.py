"""Training-data-pipeline operators as reusable DataFrame functions —
deduplication, similarity search, text analysis — the engine-side
counterparts of the SQL driver-contract queries in ``entry_queries``
(which remain the oracle-checked form; these APIs share the same
semantics and are cross-checked in tests).

Everything here is pure ``pyspark.sql.functions`` column math (JVM,
whole-stage codegen) — no Python in the hot path. All self-joins are
bounded by banding/bucketing so they scale as O(candidates), not O(n²).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.analysis import simple_tokens_col, stopwords

# ---------------------------------------------------------------------------
# deduplication
# ---------------------------------------------------------------------------


def dedup_exact(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    prefix_words: int | None = None,
) -> DataFrame:
    """Exact duplicate groups by md5 of the text (or its first
    ``prefix_words`` words): (fp, cnt, rep) for groups of size > 1; the
    representative is the smallest id (keep-first policy)."""
    base = F.col(text_col)
    if prefix_words is not None:
        base = F.array_join(
            F.slice(F.split(base, " "), 1, prefix_words), " "
        )
    return (
        docs.select(F.col(id_col), F.md5(base).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min(id_col).alias("rep"),
        )
        .filter(F.col("cnt") > 1)
    )


def shingles(
    docs: DataFrame, n: int = 3, text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distinct word n-gram shingles per doc: (doc_id, sh)."""
    ws = F.split(F.col(text_col), " ")
    idxs = F.sequence(F.lit(1), F.size(ws) - F.lit(n - 1))
    grams = F.transform(
        idxs,
        lambda i: F.concat_ws(
            " ", *[F.element_at(ws, i + F.lit(j)) for j in range(n)]
        ),
    )
    return (
        docs.filter(F.size(ws) >= n)
        .select(F.col(id_col).alias("doc_id"), F.explode(grams).alias("sh"))
        .distinct()
    )


def minhash_signatures(
    docs: DataFrame, n_hashes: int = 8, shingle_n: int = 3,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Per-(doc, seed) MinHash: min over ``md5(seed || ':' || shingle)``
    — identical construction to the SQL oracle. (doc_id, s, mh)."""
    sh = shingles(docs, shingle_n, text_col, id_col)
    seeds = sh.sparkSession.range(n_hashes).select(
        F.col("id").cast("int").alias("s")
    )
    return (
        sh.crossJoin(F.broadcast(seeds))
        .select(
            "doc_id", "s",
            F.md5(F.concat_ws(":", F.col("s").cast("string"),
                              F.col("sh"))).alias("h"),
        )
        .groupBy("doc_id", "s")
        .agg(F.min("h").alias("mh"))
    )


def minhash_lsh_pairs(
    docs: DataFrame, n_hashes: int = 8, rows_per_band: int = 2,
    shingle_n: int = 3, text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Banded MinHash LSH candidate pairs: (doc_a, doc_b, n_buckets).

    Signatures are grouped into ``b = n_hashes / rows_per_band`` bands of
    ``r = rows_per_band`` minhashes each; a pair is a candidate only when
    ALL r rows of some band match (band-signature equality). r >= 2 is
    what makes this scale: with r = 1 any two docs sharing ONE minhash
    (any pair sharing any hot shingle) collide, and the self-join on the
    hottest (s, mh) bucket goes quadratic on a near-dup-rich corpus. With
    r rows the collision probability is sim^r per band — Zipf-head
    shingles no longer create mega-buckets (standard b×r S-curve,
    Leskovec/Rajaraman/Ullman MMDS ch.3).

    ``n_buckets`` counts matching bands (1..b).
    """
    if n_hashes % rows_per_band != 0:
        raise ValueError("n_hashes must be a multiple of rows_per_band")
    sigs = minhash_signatures(docs, n_hashes, shingle_n, text_col, id_col)
    bands = (
        sigs.withColumn(
            "band", (F.col("s") / F.lit(rows_per_band)).cast("int")
        )
        .groupBy("doc_id", "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("s", "mh"))
                    ),
                    lambda x: x["mh"],
                ),
                ":",
            ).alias("band_sig")
        )
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_buckets"))
    )


def derive_max_shingle_df(n_docs: int) -> int:
    """Data-derived shingle-df cap for ``ngram_jaccard_pairs``: scales
    with the corpus so the candidate join stays O(n · cap) instead of
    quadratic in the hottest shingle's df, while small corpora keep the
    50 the contract query was sized with."""
    return max(50, int(n_docs) // 1000)


def ngram_jaccard_pairs(
    docs: DataFrame, shingle_n: int = 3, min_jaccard: float = 0.0,
    text_col: str = "text", id_col: str = "doc_id",
    max_shingle_df: int | str | None = "auto",
) -> DataFrame:
    """Shingle-set Jaccard similarity for pairs sharing >= 1 shingle.

    ``max_shingle_df`` drops shingles appearing in more than that many
    documents from the shingle universe BEFORE the self-join (both the
    intersection and the set sizes — a consistent "Jaccard over
    discriminative shingles" semantic). One Zipf-head shingle ("of the
    and"-type 3-grams) makes the self-join quadratic in its df and
    carries no near-dup signal, so the DEFAULT is scale-safe:
    ``"auto"`` derives the cap from the corpus size
    (``derive_max_shingle_df`` — max(50, n_docs/1000); one count()
    action). Pass an int to size the cap yourself, or ``None`` to OPT IN
    to exact all-shingle Jaccard — correct but quadratic in the hottest
    shingle's df, only safe on small corpora. The
    ``dedup_ngram_jaccard`` contract query uses 50 (sized to the sf0.01
    corpus, where auto also resolves to 50).
    """
    sh = shingles(docs, shingle_n, text_col, id_col)
    if max_shingle_df == "auto":
        max_shingle_df = derive_max_shingle_df(docs.count())
    if max_shingle_df is not None:
        keep = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("_df")).filter(
            F.col("_df") <= max_shingle_df
        ).select("sh")
        sh = sh.join(keep, "sh")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("i"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a")
                   .withColumnRenamed("n", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("n", "nb"), "doc_b")
        .withColumn(
            "jaccard",
            F.col("i") / (F.col("na") + F.col("nb") - F.col("i")),
        )
    )
    return out.filter(F.col("jaccard") >= min_jaccard).select(
        "doc_a", "doc_b", "jaccard"
    )


def simhash(
    tf: DataFrame, bits: int = 16, term_col: str = "term",
    id_col: str = "doc_id", tf_col: str = "tf",
) -> DataFrame:
    """tf-weighted SimHash over md5-nibble bit projections of each term
    (same construction as the oracle SQL): (doc_id, simhash)."""
    h = F.md5(F.col(term_col))
    cols = []
    for i in range(bits):
        nib = F.instr(
            F.lit("0123456789abcdef"), F.substring(h, i + 1, 1)
        ) - F.lit(1)
        sign = F.when(nib % 2 == 1, F.lit(1)).otherwise(F.lit(-1))
        cols.append(
            F.sum(F.col(tf_col) * sign).alias(f"s{i}")
        )
    sums = tf.groupBy(id_col).agg(*cols)
    sig = None
    for i in range(bits):
        term = F.when(F.col(f"s{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return sums.select(
        F.col(id_col).alias("doc_id"), sig.cast("long").alias("simhash")
    )


def connected_components(
    pairs: DataFrame, a_col: str = "doc_a", b_col: str = "doc_b",
    max_rounds: int = 50,
) -> DataFrame:
    """Connected components over a candidate-pair graph:
    (node, component) for every node appearing in ``pairs``, where
    ``component`` is the smallest node id in that node's component —
    the step that turns the pair-emitting dedup ops (``minhash_lsh_pairs``,
    ``ngram_jaccard_pairs``, ``embedding_near_dup``) into dedup GROUPS
    a training pipeline can act on (keep one canonical doc per cluster).

    Algorithm: alternating large-star / small-star (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14 — public
    knowledge), converging in O(log² n) rounds. The 100-TB shape:

    - each round is ONE ``groupBy(node).agg(min)`` plus ONE equi-join —
      map-side-combinable aggregates, no ``collect_set`` (a hub node
      never funnels its neighbor LIST through one task, only its min);
    - no driver-side graph state: the driver sees one boolean
      (converged?) and one count per round;
    - each round's edge set is ``localCheckpoint``ed — MANDATORY for an
      iterative DataFrame algorithm: one round references its
      predecessor several times (symmetrize + min-agg + join), so
      without lineage truncation the logical plan grows ~4× per round
      and Catalyst analysis time explodes exponentially (measured: 2s
      round 1, 51s round 2 on a 6-edge toy). On a cluster where
      executor loss matters, set ``spark.sparkContext.setCheckpointDir``
      and swap ``localCheckpoint`` for reliable ``checkpoint`` — same
      semantics, HDFS-backed recovery.

    Unlike naive min-label propagation (rounds = graph diameter, which
    a pathological duplicate CHAIN makes O(n)), star contraction halves
    path lengths every round — duplicate mega-clusters converge in
    ~log² rounds.
    """
    # ids keep their own type (long doc ids, string ids both order);
    # "component" is the min under that type's ordering
    edges = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )

    def _large_star(e: DataFrame) -> DataFrame:
        # undirected neighborhoods: group over both orientations
        s = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = s.groupBy("u").agg(F.min("v").alias("mv")).select(
            "u", F.least(F.col("mv"), F.col("u")).alias("m")
        )
        # connect every strictly-larger neighbor to the min: (v, m).
        # v > u >= m, so output edges always point (larger, smaller)
        return (
            s.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )

    def _small_star(e: DataFrame) -> DataFrame:
        # input edges point (larger u, smaller v); group by the larger
        m = e.groupBy("u").agg(F.min("v").alias("m"))
        nbr = (
            e.join(m, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        self_edge = m.select("u", F.col("m").alias("v"))
        return nbr.union(self_edge).distinct()

    cur = _large_star(edges).localCheckpoint(eager=True)
    cur_n = cur.count()
    for _ in range(max_rounds):
        nxt = _small_star(_large_star(cur)).localCheckpoint(eager=True)
        nxt_n = nxt.count()
        # converged when the (larger -> root) star edge set is stable
        if nxt_n == cur_n and nxt.exceptAll(cur).isEmpty():
            cur = nxt
            break
        cur, cur_n = nxt, nxt_n
    else:
        # Returning a half-contracted star set would silently label
        # docs with non-root components (and multiple canonicals per
        # real cluster) — fail loudly instead. O(log^2 n) convergence
        # means 50 rounds covers any realistic graph; hitting this is
        # a bug or an absurd max_rounds.
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} "
            "rounds; raise max_rounds"
        )
    # converged stars: every non-root points straight at its root
    comps = cur.select(
        F.col("u").alias("node"), F.col("v").alias("component")
    )
    roots = comps.select(
        F.col("component").alias("node"), F.col("component")
    ).distinct()
    return comps.union(roots).distinct()


def dedup_groups(
    pairs: DataFrame, a_col: str = "doc_a", b_col: str = "doc_b",
) -> DataFrame:
    """Near-duplicate clusters from candidate pairs:
    (doc_id, component, is_canonical) — ``component`` is the min doc id
    of the cluster and the canonical (kept) doc is the root itself; a
    downstream pipeline drops every row with ``is_canonical = false``.
    Only docs that appear in at least one pair are returned (singletons
    are trivially canonical and never needed the shuffle)."""
    cc = connected_components(pairs, a_col, b_col)
    return cc.select(
        F.col("node").alias("doc_id"),
        "component",
        (F.col("node") == F.col("component")).alias("is_canonical"),
    )


# ---------------------------------------------------------------------------
# similarity search over embeddings
# ---------------------------------------------------------------------------

def _cos(a, b):
    dot = F.aggregate(
        F.zip_with(a.cast("array<double>"), b.cast("array<double>"),
                   lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate(
        F.transform(a.cast("array<double>"), lambda x: x * x),
        F.lit(0.0), lambda acc, x: acc + x,
    ))
    nb = F.sqrt(F.aggregate(
        F.transform(b.cast("array<double>"), lambda x: x * x),
        F.lit(0.0), lambda acc, x: acc + x,
    ))
    return dot / (na * nb)


def ann_brute_topk(
    embeddings: DataFrame, query_vecs: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    full embedding table — the baseline every approximate variant is
    checked against. Output: (qvec, nvec, rank, sim).

    ``exclude_self`` (default True) drops results where the corpus id
    equals the query id — correct when ``query_vecs`` is drawn from
    ``embeddings`` (self-search). Pass False when the query table is an
    UNRELATED id space: an id collision there is not "the same vector",
    and dropping it silently corrupts that query's top-k."""
    q = query_vecs.select(
        F.col(id_col).alias("qvec"), F.col(vec_col).alias("qemb")
    )
    e = embeddings.select(
        F.col(id_col).alias("nvec"), F.col(vec_col).alias("nemb")
    )
    sims = e.crossJoin(F.broadcast(q))
    if exclude_self:
        sims = sims.filter(F.col("qvec") != F.col("nvec"))
    sims = sims.select(
        "qvec", "nvec", _cos(F.col("qemb"), F.col("nemb")).alias("sim")
    )
    w = Window.partitionBy("qvec").orderBy(
        F.desc("sim"), F.asc("nvec")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qvec", "nvec", "rank", "sim")
    )


#: seed of the shared random-hyperplane family (entry_queries embeds the
#: SAME planes as literals in the dual-dialect SQL contract query, so the
#: DataFrame API and the DuckDB oracle bucket identically)
LSH_SEED = 20260817


def random_hyperplanes(
    d: int, n_bits: int = 8, n_tables: int = 4, seed: int = LSH_SEED,
) -> np.ndarray:
    """(n_tables, n_bits, d) Gaussian projection directions, seeded and
    rounded to 4 decimals so the values survive a round-trip through SQL
    literals exactly (the oracle query inlines them)."""
    rng = np.random.default_rng(seed)
    return np.round(rng.standard_normal((n_tables, n_bits, d)), 4)


def lsh_bucket(
    embeddings: DataFrame, n_bits: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_tables: int = 1, seed: int = LSH_SEED, multiprobe: int = 0,
) -> DataFrame:
    """Random-hyperplane sign-LSH bucket keys (Charikar SimHash-LSH):
    bit_i = [round(v . g_i, 6) >= 0] over ``n_bits`` seeded Gaussian
    directions per table; ``n_tables`` independent tables OR-ed together
    at candidate time. Output rows (id, vec, bucket) — one per (vector,
    table[, probe]); ``bucket`` packs the table id above the sign bits
    so a single equi-join column spans all tables.

    ``multiprobe``: additionally emit, per table, the ``multiprobe``
    buckets reached by flipping the lowest-|projection| bits (the
    near-boundary bits most likely to differ for a true neighbor —
    multi-probe LSH). Use on the QUERY side only; the index side keeps
    one bucket per table.

    The projection is one numpy matmul per Arrow batch — no per-row
    Python. The rounding before the sign makes the bit insensitive to
    sub-ulp summation-order differences vs the SQL oracle's aggregate.
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    nb, nt, mp, sd = int(n_bits), int(n_tables), int(multiprobe), int(seed)

    @pandas_udf(ArrayType(LongType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        X = np.stack(vecs.to_numpy()).astype(np.float64)  # (n, d)
        planes = random_hyperplanes(X.shape[1], nb, nt, sd)
        proj = np.round(X @ planes.reshape(nt * nb, -1).T, 6)  # (n, nt*nb)
        bits = (proj >= 0).reshape(-1, nt, nb)
        weights = 1 << np.arange(nb, dtype=np.int64)
        base = bits @ weights + (np.arange(nt, dtype=np.int64) << nb)
        if mp == 0:
            return pd.Series(list(base))
        # flip the mp lowest-|proj| bits per (vector, table)
        flip_order = np.argsort(
            np.abs(proj).reshape(-1, nt, nb), axis=2, kind="stable"
        )[:, :, :mp]
        probes = base[:, :, None] ^ np.take_along_axis(
            np.broadcast_to(weights, flip_order.shape[:2] + (nb,)),
            flip_order, axis=2,
        )
        return pd.Series(
            list(np.concatenate([base[:, :, None], probes], axis=2)
                 .reshape(len(X), -1))
        )

    return embeddings.select(
        F.col(id_col), F.col(vec_col),
        F.explode(buckets(F.col(vec_col))).alias("bucket"),
    )


def ann_lsh_topk(
    embeddings: DataFrame, k: int = 5, n_bits: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding",
    query_filter=None, n_tables: int = 4, seed: int = LSH_SEED,
    multiprobe: int = 0, rank_round: int | None = None,
) -> DataFrame:
    """Approximate cosine top-k over multi-table random-hyperplane LSH
    buckets: candidates are vector pairs sharing ANY table's bucket
    (union across tables, deduplicated before the exact cosine), plus
    multi-probe expansion on the query side when ``multiprobe`` > 0.
    ``query_filter``: optional Column restricting which vectors act as
    queries. Output: (qvec, nvec, rank, sim).

    ``rank_round``: None (default) ranks on the raw cosine (tie-break
    nvec) — the same total order as ``ann_brute_topk``, so baseline-vs-
    approximate comparisons never disagree on a near-tie from rounding.
    The contract tests pass 6 to mirror their SQL oracle's
    ``round(sim, 6)`` order exactly (the same opt-in device as
    ``rank_round`` in topk/search/bmw_search)."""
    b = lsh_bucket(embeddings, n_bits, id_col, vec_col,
                   n_tables=n_tables, seed=seed)
    if multiprobe > 0:
        a = lsh_bucket(embeddings, n_bits, id_col, vec_col,
                       n_tables=n_tables, seed=seed, multiprobe=multiprobe)
    else:
        a = b
    a = a.select(
        F.col(id_col).alias("qvec"), F.col(vec_col).alias("qemb"), "bucket"
    )
    if query_filter is not None:
        a = a.filter(query_filter)
    c = b.select(
        F.col(id_col).alias("nvec"), F.col(vec_col).alias("nemb"), "bucket"
    )
    # dedupe the cross-table candidate union BEFORE the cosine: each pair
    # is scored once no matter how many tables/probes it collides in
    pairs = (
        a.join(c, "bucket")
        .filter(F.col("qvec") != F.col("nvec"))
        .dropDuplicates(["qvec", "nvec"])
    )
    sims = pairs.select(
        "qvec", "nvec", _cos(F.col("qemb"), F.col("nemb")).alias("sim")
    )
    rank_on = (F.col("sim") if rank_round is None
               else F.round("sim", int(rank_round)))
    w = Window.partitionBy("qvec").orderBy(F.desc(rank_on), F.asc("nvec"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qvec", "nvec", "rank", "sim")
    )


def embedding_near_dup(
    embeddings: DataFrame, min_cosine: float = 0.95, n_bits: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_tables: int = 4, seed: int = LSH_SEED,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via multi-table
    random-hyperplane LSH buckets (pair union deduplicated before the
    exact cosine)."""
    b = lsh_bucket(embeddings, n_bits, id_col, vec_col,
                   n_tables=n_tables, seed=seed)
    a = b.select(F.col(id_col).alias("id_a"),
                 F.col(vec_col).alias("ea"), "bucket")
    c = b.select(F.col(id_col).alias("id_b"),
                 F.col(vec_col).alias("eb"), "bucket")
    pairs = (
        a.join(c, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return pairs.select(
        "id_a", "id_b", _cos(F.col("ea"), F.col("eb")).alias("cosine")
    ).filter(F.col("cosine") >= min_cosine)


def ivf_centroids(
    d: int, n_lists: int = 16, seed: int = LSH_SEED
) -> np.ndarray:
    """(n_lists, d) seeded random unit directions, rounded to 4 decimals
    so the values survive a round-trip through SQL literals exactly — the
    data-INDEPENDENT coarse quantizer the ``ann_ivf_topk`` contract
    oracle inlines. Quality-fitted centroids come from
    ``fit_ivf_centroids``; the routing/probing machinery is identical
    either way. (seed offset keeps the draw disjoint from the LSH
    hyperplanes at the same seed.)"""
    rng = np.random.default_rng(seed + 17)
    c = rng.standard_normal((n_lists, d))
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    return np.round(c, 4)


def fit_ivf_centroids(
    embeddings: DataFrame, n_lists: int = 16, sample_size: int = 4096,
    iters: int = 8, seed: int = LSH_SEED,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> np.ndarray:
    """Spherical k-means coarse quantizer fitted DRIVER-side on a
    deterministic sample (orderBy(id).limit(n) plans as
    TakeOrderedAndProject — bounded at any corpus size). The classic
    fit-small/apply-big split: the model is n_lists x d floats, applied
    executor-side as one matmul per Arrow batch (``ivf_assign``).
    Deterministic: seeded init (``ivf_centroids``), argmax ties to the
    lower list id, empty lists keep their previous centroid."""
    rows = (
        embeddings.orderBy(id_col).select(vec_col)
        .limit(int(sample_size)).collect()
    )
    X = np.stack([np.asarray(r[0], dtype=np.float64) for r in rows])
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    X = X / np.where(norms == 0, 1.0, norms)
    C = ivf_centroids(X.shape[1], n_lists, seed).astype(np.float64)
    for _ in range(int(iters)):
        assign = np.argmax(X @ C.T, axis=1)
        for li in range(int(n_lists)):
            m = X[assign == li]
            if len(m):
                v = m.sum(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    C[li] = v / n
    return np.round(C, 4)


def ivf_assign(
    embeddings: DataFrame, centroids: np.ndarray, nprobe: int = 1,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Route each vector to its ``nprobe`` highest-dot coarse lists
    (dot rounded to 6 decimals before comparison — insensitive to
    summation-order ulps vs the SQL oracle's fold; ties to the lower
    list id, the oracle's ROW_NUMBER order). One numpy matmul per Arrow
    batch against the broadcast (n_lists, d) centroid matrix; output one
    (id, vec, list_id) row per probe."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    C = np.asarray(centroids, dtype=np.float64)
    npb = int(nprobe)

    @pandas_udf(ArrayType(LongType()))
    def probes(vecs: pd.Series) -> pd.Series:
        X = np.stack(vecs.to_numpy()).astype(np.float64)
        dots = np.round(X @ C.T, 6)
        order = np.argsort(-dots, axis=1, kind="stable")[:, :npb]
        return pd.Series(list(order.astype(np.int64)))

    return embeddings.select(
        F.col(id_col), F.col(vec_col),
        F.explode(probes(F.col(vec_col))).alias("list_id"),
    )


def ann_ivf_topk(
    embeddings: DataFrame, k: int = 5, n_lists: int = 16, nprobe: int = 4,
    centroids: np.ndarray | None = None,
    id_col: str = "vec_id", vec_col: str = "embedding",
    query_filter=None, seed: int = LSH_SEED,
    rank_round: int | None = None,
) -> DataFrame:
    """IVF approximate cosine top-k — the second scale path next to LSH:
    every vector routes to its single nearest coarse-centroid list (the
    inverted-file layout; at cluster scale ``list_id`` is the partition/
    bucket key of the vector table, so a probe reads only its lists),
    queries probe their ``nprobe`` nearest lists, and only probed lists
    are scored exactly. ``centroids=None`` fits spherical k-means
    driver-side (``fit_ivf_centroids``); pass ``ivf_centroids(...)`` for
    the data-independent quantizer the contract oracle inlines.
    ``query_filter``: optional Column restricting which vectors act as
    queries. Output: (qvec, nvec, rank, sim).

    Scale sizing: the probe join keys on ``list_id``, so ``n_lists`` is
    the join's key cardinality AND the per-task read unit — size it
    ~sqrt(n_vectors) (standard IVF sizing: balances lists-scanned vs
    list length, and keeps the shuffle free of small-key skew). The
    default 16 fits the test fixtures; at 10^9 vectors use ~3*10^4
    lists, at which point the query side is tiny relative to the
    inverted file and AQE broadcasts it."""
    C = centroids if centroids is not None else fit_ivf_centroids(
        embeddings, n_lists, seed=seed, id_col=id_col, vec_col=vec_col
    )
    inv = ivf_assign(embeddings, C, 1, id_col, vec_col).select(
        F.col(id_col).alias("nvec"), F.col(vec_col).alias("nemb"),
        "list_id",
    )
    q = ivf_assign(embeddings, C, nprobe, id_col, vec_col).select(
        F.col(id_col).alias("qvec"), F.col(vec_col).alias("qemb"),
        "list_id",
    )
    if query_filter is not None:
        q = q.filter(query_filter)
    # index side holds ONE list per vector, so a (qvec, nvec) pair can
    # match at most one probed list — no cross-probe dedup needed
    pairs = q.join(inv, "list_id").filter(F.col("qvec") != F.col("nvec"))
    sims = pairs.select(
        "qvec", "nvec", _cos(F.col("qemb"), F.col("nemb")).alias("sim")
    )
    # rank_round: same opt-in oracle-order device as ann_lsh_topk —
    # default raw-sim order matches the ann_brute_topk baseline
    rank_on = (F.col("sim") if rank_round is None
               else F.round("sim", int(rank_round)))
    w = Window.partitionBy("qvec").orderBy(F.desc(rank_on), F.asc("nvec"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qvec", "nvec", "rank", "sim")
    )


def save_ivf_model(
    spark, centroids: np.ndarray, path: str, seed: int = LSH_SEED,
    extra_meta: dict | None = None,
) -> dict:
    """Persist a fitted IVF coarse quantizer alongside the index
    artifact: a ``centroids/`` parquet table (list_id, centroid) — the
    executor-shippable form — plus an ``_ivf_meta.json`` manifest row
    (n_lists, dim, seed, generation) appended to ``_ivf_manifest.jsonl``
    so refreshes are versioned like index generations
    (streaming.SegmentedIndexWriter's manifest discipline). Returns the
    manifest entry written."""
    import json
    import os
    import time

    C = np.asarray(centroids, dtype=np.float64)
    rows = [(int(i), [float(x) for x in C[i]]) for i in range(C.shape[0])]
    spark.createDataFrame(
        rows, "list_id int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "centroids")
    )
    from ..fsutil import read_jsonl_tolerant

    # generation = count of WHOLE manifest entries: a torn final line
    # (kill mid-append) neither counts nor bricks the store
    mpath = os.path.join(path, "_ivf_manifest.jsonl")
    gen = len(read_jsonl_tolerant(mpath))
    entry = {
        "generation": gen, "n_lists": int(C.shape[0]),
        "dim": int(C.shape[1]), "seed": int(seed),
        "written_at": time.time(), **(extra_meta or {}),
    }
    with open(mpath, "a") as f:
        f.write(json.dumps(entry) + "\n")
    return entry


def load_ivf_model(spark, path: str) -> tuple[np.ndarray, dict]:
    """Load a persisted IVF quantizer: (centroids (n_lists, d), latest
    manifest entry). The centroid table is list_id-ordered so the array
    layout round-trips exactly (``save -> load -> ann_ivf_topk`` must
    reproduce the fitted quantizer's results bit-for-bit)."""
    import os

    rows = (
        spark.read.parquet(os.path.join(path, "centroids"))
        .orderBy("list_id").collect()
    )
    C = np.asarray([r["centroid"] for r in rows], dtype=np.float64)
    from ..fsutil import read_jsonl_tolerant

    # tolerate a torn final manifest line (kill mid-save): the
    # centroids table is overwrite-atomic via parquet _SUCCESS, so the
    # last WHOLE entry always describes a complete quantizer
    entries = read_jsonl_tolerant(
        os.path.join(path, "_ivf_manifest.jsonl")
    )
    meta: dict = entries[-1] if entries else {}
    return C, meta


def ivf_assignment_quality(
    embeddings: DataFrame, centroids: np.ndarray,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> float:
    """Mean best-list dot product over unit-normalized vectors — the
    spherical k-means objective the fit maximizes. Dropping over time
    means the corpus has drifted away from the fitted quantizer."""
    C = np.asarray(centroids, dtype=np.float64)
    assigned = ivf_assign(embeddings, C, 1, id_col, vec_col)
    bc = embeddings.sparkSession.sparkContext.broadcast(C)

    @F.pandas_udf("double")
    def best_dot(vecs: pd.Series, lists: pd.Series) -> pd.Series:
        X = np.stack(vecs.to_numpy()).astype(np.float64)
        norms = np.linalg.norm(X, axis=1, keepdims=True)
        X = X / np.where(norms == 0, 1.0, norms)
        sel = bc.value[lists.to_numpy().astype(np.int64)]
        return pd.Series(np.einsum("ij,ij->i", X, sel))

    row = assigned.select(
        F.avg(best_dot(F.col(vec_col), F.col("list_id"))).alias("q")
    ).collect()[0]
    return float(row["q"] or 0.0)


def refresh_ivf_model(
    spark, path: str, embeddings: DataFrame,
    min_quality_ratio: float = 0.98, n_lists: int | None = None,
    seed: int | None = None, id_col: str = "vec_id",
    vec_col: str = "embedding", **fit_kw,
) -> tuple[np.ndarray, bool]:
    """Drift-refresh entry point: measure the stored quantizer's
    assignment quality on the CURRENT corpus; if it fell below
    ``min_quality_ratio`` x the quality recorded at fit time, refit
    (``fit_ivf_centroids``) and persist a new generation. Returns
    (centroids in effect, whether a refresh happened). Quality at fit
    time is recorded in the manifest by this function and by callers of
    ``save_ivf_model(extra_meta={"quality": ...})``."""
    C, meta = load_ivf_model(spark, path)
    q_now = ivf_assignment_quality(embeddings, C, id_col, vec_col)
    q_fit = float(meta.get("quality", q_now))
    if q_fit > 0 and q_now >= min_quality_ratio * q_fit:
        return C, False
    nl = int(n_lists or meta.get("n_lists") or C.shape[0])
    sd = int(seed if seed is not None else meta.get("seed", LSH_SEED))
    C2 = fit_ivf_centroids(
        embeddings, nl, seed=sd, id_col=id_col, vec_col=vec_col, **fit_kw
    )
    q2 = ivf_assignment_quality(embeddings, C2, id_col, vec_col)
    save_ivf_model(spark, C2, path, seed=sd, extra_meta={"quality": q2})
    return C2, True


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

def text_quality(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Length/stopword/token-shape quality features (engine-side form of
    the ``text_quality`` contract query)."""
    toks = simple_tokens_col(F.lower(F.col(text_col)))
    sw = F.array(*[F.lit(s) for s in sorted(stopwords())])
    exploded = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(toks).alias("t")
    )
    per_doc = exploded.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(
            F.when(F.array_contains(sw, F.col("t")), 1).otherwise(0)
        ).alias("n_stop"),
        F.avg(F.length("t")).alias("avg_token_len"),
    )
    stop_ratio = F.col("n_stop") / F.col("n_tokens")
    return per_doc.select(
        "doc_id", "n_tokens",
        stop_ratio.alias("stop_ratio"),
        "avg_token_len",
        (F.log(F.lit(1.0) + F.col("n_tokens"))
         * (F.lit(1.0) - stop_ratio)).alias("quality"),
    )


def lang_id(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    min_stop_ratio: float = 0.03,
) -> DataFrame:
    """Stopword-ratio language heuristic (en vs unk) — the n-gram-free
    baseline matching the contract query."""
    q = text_quality(docs, text_col, id_col)
    return q.select(
        "doc_id",
        F.when(F.col("stop_ratio") > min_stop_ratio, "en")
        .otherwise("unk").alias("pred_lang"),
    )


def token_counts(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Whitespace + BPE-ish (letter-runs / single digits / punct) token
    counts per doc."""
    ws = F.split(F.col(text_col), " ")
    bpe = F.regexp_extract_all(
        F.col(text_col), F.lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"), 0
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(ws).cast("long").alias("n_ws_tokens"),
        F.size(bpe).cast("long").alias("n_bpe_tokens"),
    )


def rolling_fingerprint(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    base: int = 1_000_003, mod: int = (1 << 31) - 1,
) -> DataFrame:
    # mod < 2^31 keeps acc*base + x < 2^52 — no int64 overflow under
    # ANSI mode
    """Order-sensitive polynomial rolling hash over the word sequence
    (document fingerprinting; contrast with the order-insensitive
    ``doc_fingerprint`` contract query): h = Σ h*B + hash(word) mod M,
    all JVM-side."""
    ws = F.split(F.col(text_col), " ")
    word_hash = F.transform(ws, lambda w: F.pmod(F.xxhash64(w), F.lit(mod)))
    rolled = F.aggregate(
        word_hash,
        F.lit(0).cast("long"),
        lambda acc, x: F.pmod(acc * F.lit(base) + x, F.lit(mod)),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"), rolled.alias("fingerprint")
    )


def hash_split(
    docs: DataFrame, weights: dict[str, float] | None = None,
    id_col: str = "doc_id", salt: str = "split", out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment by content hash — the
    split every training-data pipeline needs to be REPRODUCIBLE:
    membership depends only on ``(salt, id)``, never on partitioning,
    row order, sampling order, or cluster size (``randomSplit`` gives
    none of those guarantees — its assignment changes with the
    partition layout). A doc keeps its split across reruns, incremental
    appends, and engine versions; changing ``salt`` draws a fresh
    independent split.

    Mechanism: ``md5(salt || ':' || id)`` is uniform over hex strings,
    so the first 8 hex chars COMPARED AS STRINGS are a uniform draw
    over [0, 16^8) — thresholds are the cumulative weights rendered as
    8-digit hex, and assignment is a CASE over string compares. Pure
    narrow column math: no shuffle, no RNG state, identical in any SQL
    engine with md5 (the ``hash_split`` contract row pins Spark vs
    DuckDB at value level).

    ``weights`` need not sum to 1; they are normalized. Default
    {"train": .9, "val": .05, "test": .05}.
    """
    if weights is None:
        weights = {"train": 0.9, "val": 0.05, "test": 0.05}
    if not weights or any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative and non-empty")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to > 0")
    names = list(weights)
    bucket = F.substring(
        F.md5(F.concat_ws(":", F.lit(salt),
                          F.col(id_col).cast("string"))), 1, 8
    )
    cum = 0.0
    expr = None
    for name in names[:-1]:
        cum += weights[name] / total
        thr = format(min(int(cum * (1 << 32)), (1 << 32) - 1), "08x")
        cond = bucket < F.lit(thr)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(names[-1])
    return docs.withColumn(out_col, out)
