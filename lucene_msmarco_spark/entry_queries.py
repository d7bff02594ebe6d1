"""Driver-contract queries: one logical SQL text per operator, rendered for
BOTH Spark SQL and DuckDB through a small dialect table — so the engine
query and its correctness oracle are literally the same logic.

These queries run against the driver's parquet fixtures
(``/root/testdata/sf*/``: documents, embeddings, events, ...). They use the
``simple`` analyzer (lowercase, ``[a-z0-9_]+``, stoplist, NO Porter) because
DuckDB cannot run Porter stemming (FTS extension unavailable offline); the
full ``english`` analyzer is covered by the pytest oracle suite and by
``entry()``.

Float-safety: every surfaced score is ``round(x, 4)`` and top-k ranking
orders by the ROUNDED score (tie-broken by doc_id), so sub-ulp libm
differences between JVM and DuckDB cannot flip ranks or hashes.

Operator coverage (SURVEY.md §2 IDs in parens):
  doc_lengths(X2) term_df(X3/S11) global_stats(X4/X8) bm25_topk(Q3/Q4)
  lmdir_topk(Q5) lmjm_topk(Q6) tfidf_topk(Q7) trec_run(S9-shape)
  eval_metrics(E1-E5) eval_summary(E6) qpp_nqc_avgidf(P1/P3)
  bigram_top100(T5) induce_scores(Q8) run_rank_distance(C9)
  run_rbo(C8) retrieval_events_join(cross-source) plus
  training-data-pipeline ops: text_quality, lang_id, doc_fingerprint,
  dedup_exact_prefix, dedup_minhash_lsh (b×r banded),
  dedup_ngram_jaccard (df-capped), dedup_simhash, ann_cosine_topk,
  ann_lsh_topk, ann_ivf_topk (inverted-file probe path),
  dedup_embedding (operator-backed embedding-cosine near-dup),
  token_stats, events_hourly, events_sessionize.
  ``bmw_topk`` (compressed Block-Max path) and ``incremental_topk``
  (SegmentedIndexWriter append+compact+load lifecycle, S14) both run
  against the ``bm25_topk`` oracle — same rows, different engines.

Operator-backed rows (the Spark side runs the real DataFrame operators,
not the dialect-rendered SQL): dedup_embedding, dedup_components
(large-star/small-star connected components vs a recursive-CTE
closure), hash_split (deterministic content-hash train/val/test
split), qpp_rsd, qpp_uef,
fdbk_kl_rerank, fdbk_rm1_expand, fdbk_rocchio, fdbk_rlm_driver(F6),
qpp_cumnqc, qpp_eval_corr(H1/C1/C2), qpp_corr_pack(C3-C7),
qpp_lambda_grid(H2), qpp_variant_spec(P7/C10), qpp_preretrieved
(H8/Q8/E8/P9), corr_polyfit(C11), lmdir_mu_sweep(H3/E6),
stoch_swap_perms(H5), srlm_rerank(F8/F9), srlm_knn_rerank(Q10/F10),
srlm_knn_pseudo(F12), bm25_boosted_topk(Q2), analyzed_export(T3),
bpe_encode(T4), fdbk_term_stats(F1/X5), doc_offsets(X7),
trec_roundtrip(S9/S6), collection_roundtrip(S1), queries_roundtrip(S4),
jsonl_roundtrip(S2/S3), qrels_firstwins(S5), variants_roundtrip(S7),
model_roundtrip(S8), fewshot_roundtrip(S12), perm_map(S13),
bmw_topk, incremental_topk.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .functions.analysis import stopwords

# ---------------------------------------------------------------------------
# fixed deterministic query set (terms drawn from the documents vocabulary)
# ---------------------------------------------------------------------------
QUERYSET: list[tuple[str, str]] = [
    ("q1", "join hash merge"),
    ("q2", "customer order line"),
    ("q3", "the a of and"),               # stopwords only -> no results
    ("q4", "spark spark window"),          # duplicate-token multiplicity
    ("q5", "vector stream qqqzzz"),        # one OOV term
    ("q6", "scan filter column batch row"),
    ("q7", "data table"),
    ("q8", "slow fast small big"),
]

# Deterministic query variants for the P7 contract (S7-shaped: per
# query, vid 1 = drop the last whitespace token, vid 2 = keep the last
# two) — derived from QUERYSET in Python and inlined as VALUES in the
# SQL twin, so both sides see byte-identical variant strings.
VARIANTSET: list[tuple[str, int, str]] = [
    (qid, vid, txt)
    for qid, qtext in QUERYSET
    for vid, txt in (
        (1, " ".join(qtext.split()[:-1])),
        (2, " ".join(qtext.split()[-2:])),
    )
]

# Deterministic TRAINING queries for the Q10/F10 contract: each shares
# at least one analyzed term with a QUERYSET query (so the KNN query
# search finds real neighbors), qids continue the qN scheme (so the
# synthetic qrels formula extends to them), and none collides with a
# test qid (exclude_self never fires — pinned on both sides).
KNNTRAINSET: list[tuple[str, str]] = [
    ("q11", "join hash"),
    ("q12", "customer line"),
    ("q13", "window spark"),
    ("q14", "stream vector"),
    ("q15", "filter scan row"),
    ("q16", "table data"),
    ("q17", "fast small"),
    ("q18", "merge order column"),
]

_TABLES = ("documents", "embeddings", "events", "lineitem", "orders",
           "customer", "supplier", "part", "nation", "region")

# Frozen BPE merge table for the T4 contract row: the first 32 merges
# ``functions.bpe.train_bpe`` learns from the sf0.001 documents table
# (alnum-cleaned, lowercased), inlined as a literal so the row is
# sf-independent and both engines see byte-identical rules. Training
# itself is iterative/driver-side (pytest-covered); this pins the
# ENCODER — the greedy lowest-rank merge loop — at value level.
# Validity invariant (asserted in tests/test_bpe_contract.py): every
# compound token in pair i was produced by an earlier merge j < i,
# which is what makes rank-order sequential replacement equivalent to
# the greedy loop (see build_sql("bpe_encode")).
BPE_MERGESET: list[tuple[str, str]] = [
    ("e", "r"), ("e", "</w>"), ("n", "</w>"), ("o", "r"), ("t", "</w>"),
    ("er", "</w>"), ("o", "w"), ("ow", "</w>"), ("l", "u"), ("i", "n"),
    ("y", "</w>"), ("a", "r"), ("p", "ar"), ("g", "</w>"), ("a", "s"),
    ("h", "</w>"), ("a", "</w>"), ("s", "t"), ("a", "t"), ("a", "n</w>"),
    ("c", "an</w>"), ("s", "can</w>"), ("c", "o"), ("co", "lu"),
    ("colu", "m"), ("colum", "n</w>"), ("d", "ow</w>"), ("in", "dow</w>"),
    ("w", "indow</w>"), ("d", "er</w>"), ("or", "der</w>"),
    ("or", "t</w>"),
]


def _dialect(d: str) -> dict[str, object]:
    """Tiny dialect table covering every divergent construct we use."""
    spark = d == "spark"
    return {
        # tokenize: lowered alnum runs (group 0)
        "TOKENS": (lambda x: f"regexp_extract_all(lower({x}), '[a-z0-9_]+', 0)")
        if spark
        else (lambda x: f"regexp_extract_all(lower({x}), '[a-z0-9_]+')"),
        # T2 number folding, global replace
        "FOLD": (
            lambda x: f"regexp_replace({x}, '(-)?\\\\d+(\\\\.\\\\d*)?', ' _NUM_ ')"
        )
        if spark
        else (
            lambda x: f"regexp_replace({x}, '(-)?\\d+(\\.\\d*)?', ' _NUM_ ', 'g')"
        ),
        "EXPLODE": (lambda x: f"explode({x})") if spark else (lambda x: f"unnest({x})"),
        "SPLIT_WS": (lambda x: f"split({x}, ' ')") if spark
        else (lambda x: f"string_split({x}, ' ')"),
        "LEN": (lambda x: f"size({x})") if spark else (lambda x: f"len({x})"),
        # arr[i] with i being the 1-based position
        "AT": (lambda a, i: f"{a}[{i} - 1]") if spark else (lambda a, i: f"{a}[{i}]"),
        "SLICE": (lambda a, n: f"slice({a}, 1, {n})") if spark
        else (lambda a, n: f"list_slice({a}, 1, {n})"),
        "SORT": (lambda a: f"array_sort({a})") if spark
        else (lambda a: f"list_sort({a})"),
        "JOIN_ARR": (lambda a: f"array_join({a}, ' ')") if spark
        else (lambda a: f"array_to_string({a}, ' ')"),
        "MAP_I": (lambda rng, var, expr: f"transform({rng}, {var} -> {expr})")
        if spark
        else (lambda rng, var, expr: f"list_transform({rng}, {var} -> {expr})"),
        # inclusive integer sequence a..b
        "SEQ": (lambda a, b: f"sequence({a}, {b})") if spark
        else (lambda a, b: f"range({a}, ({b}) + 1)"),
        "DOT": (
            lambda a, b: (
                f"aggregate(zip_with(CAST({a} AS ARRAY<DOUBLE>), "
                f"CAST({b} AS ARRAY<DOUBLE>), (x, y) -> x * y), "
                f"CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
            )
        )
        if spark
        else (
            lambda a, b: (
                f"list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"
            )
        ),
        "COLLECT_DISTINCT": (lambda x: f"collect_set({x})") if spark
        else (lambda x: f"list(DISTINCT {x})"),
        "STR": (lambda x: f"CAST({x} AS STRING)") if spark
        else (lambda x: f"CAST({x} AS VARCHAR)"),
        "REGEX_ALL": (lambda x, p: f"regexp_extract_all({x}, '{p}', 0)")
        if spark
        else (lambda x, p: f"regexp_extract_all({x}, '{p}')"),
        # unix_timestamp FLOORS sub-second fractions; duckdb CAST rounds,
        # so floor explicitly there
        "EPOCH": (lambda x: f"unix_timestamp({x})") if spark
        else (lambda x: f"CAST(floor(epoch({x})) AS BIGINT)"),
        # per-band minhash signature: the band's minhashes concatenated
        # in seed order (aggregate over a (doc_id, band) group)
        "BANDSIG": (
            lambda: "array_join(transform(array_sort("
                    "collect_list(struct(s, mh))), x -> x.mh), ':')"
        )
        if spark
        else (lambda: "string_agg(mh, ':' ORDER BY s)"),
    }


def _stoplist_cte(d: str) -> str:
    sw = sorted(stopwords())
    csv = "|".join(sw).replace("'", "''")
    D = _dialect(d)
    split = (
        f"split('{csv}', '[|]')" if d == "spark" else f"string_split('{csv}', '|')"
    )
    return f"stopw AS (SELECT {D['EXPLODE'](split)} AS sw)"  # noqa: E501


def _queries_cte() -> str:
    vals = ", ".join(f"('{q}', '{t}')" for q, t in QUERYSET)
    return f"queries AS (SELECT qid, qtext FROM (VALUES {vals}) AS q(qid, qtext))"


def _ir_base(d: str, model_expr: str | None = None) -> str:
    """Shared CTE chain: tokenize -> tf/doc_stats/term_stats/globals ->
    query terms -> scored -> ranked (by ROUNDED score). ``model_expr``
    replaces the per-hit weight formula (BM25 default)."""
    D = _dialect(d)
    bm25 = (
        "ln(1 + (g.n_docs - df + 0.5) / (df + 0.5)) * tf * 1.9 "
        "/ (tf + 0.9 * (1 - 0.4 + 0.4 * doclen / g.avgdl))"
    )
    weight = model_expr or bm25
    return f"""
WITH {_stoplist_cte(d)},
{_queries_cte()},
tok AS (
  SELECT doc_id, {D['EXPLODE'](D['TOKENS'](D['FOLD']('text')))} AS term
  FROM documents
),
tokf AS (
  SELECT doc_id, term FROM tok WHERE term NOT IN (SELECT sw FROM stopw)
),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tokf GROUP BY doc_id, term
),
dstats AS (
  SELECT d.doc_id, CAST(COALESCE(SUM(t.tf), 0) AS BIGINT) AS doclen
  FROM documents d LEFT JOIN tf t ON d.doc_id = t.doc_id
  GROUP BY d.doc_id
),
tstats AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df, CAST(SUM(tf) AS BIGINT) AS cf
  FROM tf GROUP BY term
),
g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(AVG(doclen) AS DOUBLE) AS avgdl,
         CAST(SUM(doclen) AS BIGINT) AS total_cf
  FROM dstats
),
qtok AS (
  SELECT qid, {D['EXPLODE'](D['TOKENS']('qtext'))} AS term FROM queries
),
qterms AS (
  SELECT qid, term, CAST(COUNT(*) AS DOUBLE) AS qtf
  FROM qtok WHERE term NOT IN (SELECT sw FROM stopw)
  GROUP BY qid, term
),
hits AS (
  SELECT q.qid, t.doc_id, q.qtf, t.tf, d.doclen, s.df, s.cf
  FROM qterms q
  JOIN tstats s ON q.term = s.term
  JOIN tf t ON q.term = t.term
  JOIN dstats d ON t.doc_id = d.doc_id
),
scored AS (
  SELECT qid, doc_id, SUM(qtf * ({weight})) AS score
  FROM hits CROSS JOIN g
  GROUP BY qid, doc_id
),
ranked AS (
  SELECT qid, doc_id,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY qid ORDER BY round(score, 4) DESC, doc_id ASC
         ) AS INT) AS rank,
         round(score, 4) AS score
  FROM scored
)"""


LMDIR = (
    "greatest(ln(1 + tf / (1000.0 * cf / g.total_cf)) "
    "+ ln(1000.0 / (doclen + 1000.0)), CAST(0 AS DOUBLE))"
)
LMJM = "ln(1 + 0.25 * (tf / doclen) * (g.n_docs / df))"
TFIDF = "tf * ln(g.n_docs / df)"

# Shared RM-conditional weight chain (F3 over a raw-sim LM-Dir run):
# appended after _ir_base(d, LMDIR). `run` re-joins `scored` for the
# UNROUNDED retrieval score (the drivers do not round mid-chain);
# membership is pinned by the round-4 rank key. Used by the
# fdbk_rlm_driver (F6) and fdbk_print_terms (F13) rows.
_RM_WTS_CTES = """
run AS (
  SELECT s.qid, s.doc_id, r.rank, s.score
  FROM scored s JOIN ranked r ON s.qid = r.qid AND s.doc_id = r.doc_id
  WHERE r.rank <= 100
),
dv AS (
  SELECT r.qid, r.doc_id, r.rank, r.score AS sim, t.term, t.tf, ds.doclen
  FROM run r
  JOIN tf t ON r.doc_id = t.doc_id
  JOIN dstats ds ON r.doc_id = ds.doc_id
),
tstop AS (
  SELECT qid, term, CAST(COUNT(*) AS BIGINT) AS df_top
  FROM dv WHERE rank <= 20 GROUP BY qid, term
),
sums AS (
  SELECT qid, SUM(sim) AS sum_sim FROM dv WHERE rank <= 20 GROUP BY qid
),
wts AS (
  SELECT d.qid, d.term,
         SUM((0.9 * d.tf / d.doclen + (1.0 - 0.9) * ts.df_top / 20.0)
             * d.sim / s.sum_sim) AS wt
  FROM dv d
  JOIN tstop ts ON d.qid = ts.qid AND d.term = ts.term
  JOIN sums s ON d.qid = s.qid
  WHERE d.rank <= 20
  GROUP BY d.qid, d.term
)"""

QRELS_CTE = """
qrels AS (
  SELECT qid, doc_id, rel FROM (
    SELECT q.qid, d.doc_id,
           CASE CAST((d.doc_id + CAST(substr(q.qid, 2) AS INT)) % 10 AS INT)
             WHEN 0 THEN 3 WHEN 1 THEN 2 WHEN 2 THEN 1 ELSE 0 END AS rel
    FROM documents d CROSS JOIN queries q
  ) x WHERE rel > 0
)"""

EVAL_BODY = """
run AS (SELECT qid, doc_id, rank, score FROM ranked WHERE rank <= 100),
filled AS (
  SELECT r.qid, r.doc_id, r.rank, COALESCE(s.rel, 0) AS rel
  FROM run r LEFT JOIN qrels s ON r.qid = s.qid AND r.doc_id = s.doc_id
),
perdoc AS (
  SELECT qid, rank, rel,
         CASE WHEN rel >= 2 THEN 1 ELSE 0 END AS is_rel,
         SUM(CASE WHEN rel >= 2 THEN 1 ELSE 0 END) OVER (
           PARTITION BY qid ORDER BY rank
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum_rel,
         CASE WHEN rank <= 100
              THEN rel / (ln(1.0 + rank) / ln(2)) ELSE 0 END AS gain
  FROM filled
),
qstats AS (
  SELECT qid,
         SUM(CASE WHEN rel >= 2 THEN 1 ELSE 0 END) AS num_rel,
         COUNT(*) AS num_judged
  FROM qrels GROUP BY qid
),
idcg AS (
  SELECT qid, SUM(rel / (ln(1.0 + irank) / ln(2))) AS idcg FROM (
    SELECT qid, rel,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rel DESC) AS irank
    FROM qrels
  ) x WHERE irank <= 100 GROUP BY qid
),
peragg AS (
  SELECT qid,
         SUM(CASE WHEN is_rel = 1
                  THEN CAST(cum_rel AS DOUBLE) / rank ELSE 0 END) AS ap_num,
         SUM(CASE WHEN rank <= 5 AND is_rel = 1 THEN 1 ELSE 0 END) AS rel_top5,
         SUM(is_rel) AS num_rel_ret,
         MAX(CASE WHEN rel > 0 THEN rank END) AS last_rel_rank,
         SUM(gain) AS dcg
  FROM perdoc GROUP BY qid
),
permetrics AS (
  SELECT a.qid,
         round(CASE WHEN s.num_rel > 0
                    THEN a.ap_num / s.num_rel ELSE 0 END, 4) AS ap,
         round(CAST(a.rel_top5 AS DOUBLE) / 5, 4) AS p_at_5,
         round(CASE WHEN s.num_judged > 0
                    THEN CAST(a.num_rel_ret AS DOUBLE) / s.num_judged
                    ELSE 0 END, 4) AS recall,
         round(CASE WHEN a.last_rel_rank IS NOT NULL
                    THEN CAST(1 AS DOUBLE) / a.last_rel_rank
                    ELSE CAST(0 AS DOUBLE) END, 4) AS rr,
         round(CASE WHEN i.idcg IS NOT NULL AND i.idcg <> 0
                    THEN a.dcg / i.idcg ELSE 0 END, 4) AS ndcg,
         CASE WHEN s.num_judged > 0
              THEN CAST(a.num_rel_ret AS DOUBLE) / s.num_judged
              ELSE 0 END AS recall_raw,
         CAST(a.num_rel_ret AS BIGINT) AS num_rel_ret
  FROM peragg a
  LEFT JOIN qstats s ON a.qid = s.qid
  LEFT JOIN idcg i ON a.qid = i.qid
)"""


def _shingle_cte(d: str) -> str:
    D = _dialect(d)
    ws = "ws"
    shingle = f"concat_ws(' ', {D['AT'](ws, 'i')}, {D['AT'](ws, 'i + 1')}, {D['AT'](ws, 'i + 2')})"
    return f"""
words AS (SELECT doc_id, {D['SPLIT_WS']('text')} AS ws FROM documents),
shingles AS (
  SELECT DISTINCT doc_id,
         {D['EXPLODE'](D['MAP_I'](D['SEQ']('1', D['LEN']('ws') + ' - 2'), 'i', shingle))} AS sh
  FROM words WHERE {D['LEN']('ws')} >= 3
)"""


def _sql_array(d: str):
    """Render a 1-D float vector as a dialect array literal (SQL-inlined
    model weights: LSH hyperplanes, IVF centroids)."""
    if d == "spark":
        return lambda v: "array(" + ", ".join(
            f"CAST({x} AS DOUBLE)" for x in v) + ")"
    return lambda v: "[" + ", ".join(str(x) for x in v) + "]"


def _lsh_bucket_tables_sql(d: str, n_bits: int = 8, n_tables: int = 4) -> str:
    """UNION-ALL of per-table random-hyperplane bucket keys over the
    ``embeddings`` view — the SQL twin of ``operators/pipeline.lsh_bucket``
    (same seeded planes, inlined as literals; bit_i = [round(v . g_ti, 6)
    >= 0]; bucket packs the table id above the sign bits). Shared by the
    ``ann_lsh_topk`` and ``dedup_embedding`` contract oracles."""
    from .operators.pipeline import random_hyperplanes  # noqa: PLC0415

    D = _dialect(d)
    planes = random_hyperplanes(64, n_bits, n_tables)
    arr = _sql_array(d)

    def bucket_expr(t: int) -> str:
        bits = " + ".join(
            f"(CASE WHEN round({D['DOT']('embedding', arr(planes[t, i]))}"
            f", 6) >= 0 THEN {1 << i} ELSE 0 END)"
            for i in range(n_bits)
        )
        return f"CAST({(t << n_bits)} + {bits} AS BIGINT)"

    return "\n  UNION ALL ".join(
        f"SELECT vec_id, {bucket_expr(t)} AS bucket FROM embeddings"
        for t in range(n_tables)
    )


def _simhash_bits_sql(d: str) -> tuple[str, str]:
    """(per-bit sum columns, signature combine expr) for a 16-bit SimHash
    from the md5 nibbles of each term, tf-weighted."""
    sums = []
    combine = []
    for b in range(16):
        nib = f"instr('0123456789abcdef', substr(h, {b + 1}, 1)) - 1"
        sums.append(
            f"SUM(tf * (CASE WHEN ({nib}) % 2 = 1 THEN 1 ELSE -1 END)) AS s{b}"
        )
        combine.append(f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)")
    return ", ".join(sums), " + ".join(combine)


# ---------------------------------------------------------------------------
# query text builders: name -> {dialect -> sql}
# ---------------------------------------------------------------------------

def _variant_ref_ctes(d: str) -> str:
    """Shared P7/H2 chain, appended after ``_ir_base``: per deterministic
    variant (VARIANTSET) a full BM25 retrieval, an NQC estimate over the
    variant's own terms, and the top-10 Jaccard similarity vs the base
    run — surfaced as ``refs`` (qid, sim, est) — plus the base query's
    NQC as ``bnqc`` (qid, nqc)."""
    D = _dialect(d)
    bm25w = (
        "ln(1 + (g.n_docs - df + 0.5) / (df + 0.5)) * tf * 1.9 "
        "/ (tf + 0.9 * (1 - 0.4 + 0.4 * doclen / g.avgdl))"
    )
    vvals = ", ".join(
        f"('{q}', {v}, '{t}')" for q, v, t in VARIANTSET
    )
    return f""",
variants AS (
  SELECT qid, vid, vtext FROM (VALUES {vvals}) AS v(qid, vid, vtext)
),
vqtok AS (
  SELECT qid, vid, {D['EXPLODE'](D['TOKENS']('vtext'))} AS term
  FROM variants
),
vqterms AS (
  SELECT qid, vid, term, CAST(COUNT(*) AS DOUBLE) AS qtf
  FROM vqtok WHERE term NOT IN (SELECT sw FROM stopw)
  GROUP BY qid, vid, term
),
vhits AS (
  SELECT q.qid, q.vid, t.doc_id, q.qtf, t.tf, d.doclen, s.df
  FROM vqterms q
  JOIN tstats s ON q.term = s.term
  JOIN tf t ON q.term = t.term
  JOIN dstats d ON t.doc_id = d.doc_id
),
vscored AS (
  SELECT qid, vid, doc_id, SUM(qtf * ({bm25w})) AS score
  FROM vhits CROSS JOIN g
  GROUP BY qid, vid, doc_id
),
vranked AS (
  SELECT qid, vid, doc_id,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY qid, vid ORDER BY round(score, 4) DESC, doc_id ASC
         ) AS INT) AS rank,
         round(score, 4) AS score
  FROM vscored
),
vaidf AS (
  SELECT q.qid, q.vid,
         AVG(ln(CAST(g.n_docs AS DOUBLE)
                / GREATEST(COALESCE(s.df, 0), 1))) AS aidf
  FROM vqterms q LEFT JOIN tstats s ON q.term = s.term CROSS JOIN g
  GROUP BY q.qid, q.vid
),
vnqcv AS (
  SELECT qid, vid, var_pop(score) AS v
  FROM vranked WHERE rank <= 50 GROUP BY qid, vid
),
vest AS (
  SELECT nv.qid, nv.vid, nv.v * a.aidf AS est
  FROM vnqcv nv JOIN vaidf a ON nv.qid = a.qid AND nv.vid = a.vid
),
b10 AS (SELECT qid, doc_id FROM ranked WHERE rank <= 10),
v10 AS (SELECT qid, vid, doc_id FROM vranked WHERE rank <= 10),
nasz AS (SELECT qid, COUNT(*) AS na FROM b10 GROUP BY qid),
nbsz AS (SELECT qid, vid, COUNT(*) AS nb FROM v10 GROUP BY qid, vid),
nisz AS (
  SELECT v.qid, v.vid, COUNT(*) AS ni
  FROM v10 v JOIN b10 b ON v.qid = b.qid AND v.doc_id = b.doc_id
  GROUP BY v.qid, v.vid
),
sims AS (
  SELECT nb.qid, nb.vid,
         CASE WHEN na.na + nb.nb - COALESCE(ni.ni, 0) > 0
              THEN CAST(COALESCE(ni.ni, 0) AS DOUBLE)
                   / (na.na + nb.nb - COALESCE(ni.ni, 0))
              ELSE CAST(0 AS DOUBLE) END AS sim
  FROM nbsz nb
  JOIN nasz na ON nb.qid = na.qid
  LEFT JOIN nisz ni ON nb.qid = ni.qid AND nb.vid = ni.vid
),
refs AS (
  SELECT e.qid, s.sim, e.est
  FROM vest e JOIN sims s ON e.qid = s.qid AND e.vid = s.vid
),
bnqcv AS (
  SELECT qid, var_pop(score) AS v FROM ranked WHERE rank <= 50 GROUP BY qid
),
baidf AS (
  SELECT q.qid,
         AVG(ln(CAST(g.n_docs AS DOUBLE)
                / GREATEST(COALESCE(s.df, 0), 1))) AS aidf
  FROM qterms q LEFT JOIN tstats s ON q.term = s.term CROSS JOIN g
  GROUP BY q.qid
),
bnqc AS (
  SELECT nv.qid, nv.v * a.aidf AS nqc
  FROM bnqcv nv JOIN baidf a ON nv.qid = a.qid
)"""


def _knn_ctes(d: str) -> str:
    """Shared Q10 chain, appended after ``_ir_base``: the KNNTRAINSET
    queries-as-documents LM-Dirichlet index (mu=1000, docs-side FOLD),
    the top-2 neighbor search per test query — surfaced as ``knn``
    (qid, ref_qid, sim rounded 6) — plus the training queries' synthetic
    qrels as ``kqrels`` (qid, doc_id, rel)."""
    D = _dialect(d)
    qdvals = ", ".join(
        f"({i}, '{qid}', '{txt}')"
        for i, (qid, txt) in enumerate(KNNTRAINSET)
    )
    lmw = ("greatest(ln(1 + tf / (1000.0 * cf / qdg.total_cf)) "
           "+ ln(1000.0 / (doclen + 1000.0)), CAST(0 AS DOUBLE))")
    return f""",
qdocs AS (
  SELECT doc_id, ref_qid, qtext AS text
  FROM (VALUES {qdvals}) AS qd(doc_id, ref_qid, qtext)
),
kqrels AS (
  SELECT qid, doc_id, rel FROM (
    SELECT q.ref_qid AS qid, d.doc_id,
           CASE CAST((d.doc_id + CAST(substr(q.ref_qid, 2) AS INT)) % 10
                     AS INT)
             WHEN 0 THEN 3 WHEN 1 THEN 2 WHEN 2 THEN 1 ELSE 0 END AS rel
    FROM documents d CROSS JOIN qdocs q
  ) x WHERE rel > 0
),
qdtok AS (
  SELECT doc_id, {D['EXPLODE'](D['TOKENS'](D['FOLD']('text')))} AS term
  FROM qdocs
),
qdtokf AS (
  SELECT doc_id, term FROM qdtok
  WHERE term NOT IN (SELECT sw FROM stopw)
),
qdtf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM qdtokf GROUP BY doc_id, term
),
qdstats AS (
  SELECT d.doc_id, CAST(COALESCE(SUM(t.tf), 0) AS BIGINT) AS doclen
  FROM qdocs d LEFT JOIN qdtf t ON d.doc_id = t.doc_id
  GROUP BY d.doc_id
),
qdterm AS (
  SELECT term, CAST(SUM(tf) AS BIGINT) AS cf FROM qdtf GROUP BY term
),
qdg AS (SELECT CAST(SUM(doclen) AS BIGINT) AS total_cf FROM qdstats),
knnhits AS (
  SELECT q.qid, t.doc_id, q.qtf, t.tf, d.doclen, s.cf
  FROM qterms q
  JOIN qdterm s ON q.term = s.term
  JOIN qdtf t ON q.term = t.term
  JOIN qdstats d ON t.doc_id = d.doc_id
),
knnscored AS (
  SELECT qid, doc_id, SUM(qtf * ({lmw})) AS score
  FROM knnhits CROSS JOIN qdg
  GROUP BY qid, doc_id
),
knnranked AS (
  SELECT qid, doc_id, score,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY qid ORDER BY round(score, 4) DESC, doc_id ASC
         ) AS INT) AS rank
  FROM knnscored
),
knnsel AS (
  SELECT r.qid, d.ref_qid, r.score, r.rank
  FROM knnranked r JOIN qdocs d ON r.doc_id = d.doc_id
  WHERE r.rank <= 3 AND r.qid <> d.ref_qid
),
knntop AS (
  SELECT qid, ref_qid, score,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rank) AS r2
  FROM knnsel
),
knn AS (
  SELECT k.qid, k.ref_qid, round(k.score / z.z, 6) AS sim
  FROM (SELECT qid, ref_qid, score FROM knntop WHERE r2 <= 2) k
  JOIN (
    SELECT qid, SUM(score) AS z FROM knntop WHERE r2 <= 2 GROUP BY qid
  ) z ON k.qid = z.qid
)"""


def build_sql(name: str, d: str) -> str:
    D = _dialect(d)
    base = _ir_base(d)

    if name == "doc_lengths":
        return base + "\nSELECT doc_id, doclen FROM dstats ORDER BY doc_id"
    if name == "term_df":
        return base + "\nSELECT term, df, cf FROM tstats ORDER BY term"
    if name == "global_stats":
        return base + (
            "\nSELECT n_docs, round(avgdl, 6) AS avgdl, total_cf FROM g"
        )
    if name == "bm25_topk":
        return base + (
            "\nSELECT qid, doc_id, rank, score FROM ranked "
            "WHERE rank <= 10 ORDER BY qid, rank"
        )
    if name == "lmdir_topk":
        return _ir_base(d, LMDIR) + (
            "\nSELECT qid, doc_id, rank, score FROM ranked "
            "WHERE rank <= 10 ORDER BY qid, rank"
        )
    if name == "lmjm_topk":
        return _ir_base(d, LMJM) + (
            "\nSELECT qid, doc_id, rank, score FROM ranked "
            "WHERE rank <= 10 ORDER BY qid, rank"
        )
    if name == "tfidf_topk":
        return _ir_base(d, TFIDF) + (
            "\nSELECT qid, doc_id, rank, score FROM ranked "
            "WHERE rank <= 10 ORDER BY qid, rank"
        )
    if name == "trec_run":
        # S9 shape: the 6 columns of a TREC res line (string formatting
        # itself is locale/rounding-sensitive, tested in pytest instead)
        return base + (
            f"\nSELECT qid, 'Q0' AS iter, {D['STR']('doc_id')} AS docid, "
            "rank, score, 'lms' AS runname "
            "FROM ranked WHERE rank <= 10 ORDER BY qid, rank"
        )
    if name == "sparse_vec_bm25":
        # S10 sparse-vector sink (indexing/SparseVecWriter.java:63-164):
        # every (doc_id, term) weighted with THAT sink's BM25 defaults
        # k1=1.2 b=0.75 (not the retrieval 0.9/0.4) over exact doclens.
        return base + """
SELECT f.doc_id, f.term,
       round(ln(1 + (g.n_docs - s.df + 0.5) / (s.df + 0.5)) * f.tf * 2.2
             / (f.tf + 1.2 * (1 - 0.75 + 0.75 * d.doclen / g.avgdl)),
             6) AS weight
FROM tf f
JOIN tstats s ON f.term = s.term
JOIN dstats d ON f.doc_id = d.doc_id
CROSS JOIN g
ORDER BY f.doc_id, f.term"""
    if name == "eval_metrics":
        return (
            base + "," + QRELS_CTE + "," + EVAL_BODY
            + "\nSELECT qid, ap, p_at_5, recall, rr, ndcg, num_rel_ret "
              "FROM permetrics ORDER BY qid"
        )
    if name == "eval_summary":
        return (
            base + "," + QRELS_CTE + "," + EVAL_BODY
            + """
SELECT round(SUM(recall_raw) / (SELECT COUNT(*) FROM qrels), 6) AS recall_quirk,
       round(AVG(ap), 4) AS map,
       round(AVG(p_at_5), 4) AS p_at_5,
       round(AVG(ndcg), 4) AS ndcg_100
FROM permetrics"""
        )
    if name == "qpp_nqc_avgidf":
        return (
            base + ","
            + """
run AS (SELECT qid, doc_id, rank, score FROM ranked WHERE rank <= 100),
aidf AS (
  SELECT q.qid, AVG(ln(CAST(g.n_docs AS DOUBLE) / s.df)) AS avgidf
  FROM qterms q JOIN tstats s ON q.term = s.term CROSS JOIN g
  GROUP BY q.qid
),
nqc AS (
  SELECT qid, var_pop(score) AS v FROM run WHERE rank <= 50 GROUP BY qid
)
SELECT a.qid, round(a.avgidf, 4) AS avgidf,
       round(COALESCE(n.v, 0) * a.avgidf, 4) AS nqc
FROM aidf a LEFT JOIN nqc n ON a.qid = n.qid
ORDER BY a.qid"""
        )
    if name == "bigram_top100":
        # T5 analog: unordered within-doc term pairs, global top-100
        return base + (
            """,
dterms AS (SELECT DISTINCT doc_id, term FROM tokf),
pairs AS (
  SELECT a.term AS t1, b.term AS t2, CAST(COUNT(*) AS BIGINT) AS freq
  FROM dterms a JOIN dterms b
    ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY a.term, b.term
)
SELECT t1, t2, freq FROM pairs
ORDER BY freq DESC, t1, t2 LIMIT 100"""
        )
    if name == "text_quality":
        return base + (
            """,
q AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         SUM(CASE WHEN w.sw IS NOT NULL THEN 1 ELSE 0 END) AS n_stop,
         AVG(CAST(length(term) AS DOUBLE)) AS avg_len
  FROM tok LEFT JOIN stopw w ON tok.term = w.sw GROUP BY doc_id
)
SELECT doc_id, n_tokens,
       round(CAST(n_stop AS DOUBLE) / n_tokens, 4) AS stop_ratio,
       round(avg_len, 4) AS avg_token_len,
       round(ln(1.0 + n_tokens) * (1 - CAST(n_stop AS DOUBLE) / n_tokens), 4)
         AS quality
FROM q ORDER BY doc_id"""
        )
    if name == "lang_id":
        return base + (
            """,
q AS (
  SELECT doc_id,
         SUM(CASE WHEN w.sw IS NOT NULL THEN 1 ELSE 0 END) AS n_stop,
         CAST(COUNT(*) AS BIGINT) AS n_tokens
  FROM tok LEFT JOIN stopw w ON tok.term = w.sw GROUP BY doc_id
)
SELECT doc_id,
       CASE WHEN CAST(n_stop AS DOUBLE) / n_tokens > 0.03
            THEN 'en' ELSE 'unk' END AS pred_lang
FROM q ORDER BY doc_id"""
        )
    if name == "doc_fingerprint":
        return base + (
            f""",
q AS (
  SELECT doc_id,
         md5({D['JOIN_ARR'](D['SORT'](D['COLLECT_DISTINCT']('term')))}) AS fp
  FROM tokf GROUP BY doc_id
)
SELECT doc_id, fp FROM q ORDER BY doc_id"""
        )
    if name == "dedup_exact_prefix":
        fp = f"md5({D['JOIN_ARR'](D['SLICE'](D['SPLIT_WS']('text'), 8))})"
        return f"""
SELECT fp, CAST(COUNT(*) AS BIGINT) AS cnt, MIN(doc_id) AS rep
FROM (SELECT doc_id, {fp} AS fp FROM documents) x
GROUP BY fp HAVING COUNT(*) > 1 ORDER BY fp"""
    if name == "dedup_minhash_lsh":
        # b×r banded LSH (4 bands × 2 rows over 8 minhashes): a pair is
        # a candidate only when BOTH rows of some band match — r>=2 is
        # the scale-safe form (r=1 turns every shared hot shingle into a
        # candidate bucket; see operators/pipeline.minhash_lsh_pairs)
        seeds = ", ".join(f"({s})" for s in range(8))
        str_s = D["STR"]("s")
        return f"""
WITH {_shingle_cte(d)[1:]},
seeds AS (SELECT s FROM (VALUES {seeds}) AS t(s)),
sigs AS (
  SELECT doc_id, s, MIN(md5({str_s} || ':' || sh)) AS mh
  FROM shingles CROSS JOIN seeds GROUP BY doc_id, s
),
bands AS (
  SELECT doc_id, CAST(floor(s / 2.0) AS INT) AS band,
         {D['BANDSIG']()} AS band_sig
  FROM sigs GROUP BY doc_id, CAST(floor(s / 2.0) AS INT)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(COUNT(*) AS BIGINT) AS n_buckets
FROM bands a JOIN bands b
  ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id ORDER BY doc_a, doc_b"""
    if name == "hash_split":
        # deterministic train/val/test assignment by content hash
        # (operators/pipeline.hash_split): md5 hex compared AS STRING
        # against cumulative-weight thresholds — reproducible under any
        # partitioning, identical in any md5-bearing engine. Thresholds
        # are .9/.95 of 16^8 in hex.
        b = (f"substring(md5(concat_ws(':', 'split', "
             f"{D['STR']('doc_id')})), 1, 8)")
        return f"""
SELECT doc_id,
       CASE WHEN {b} < 'e6666666' THEN 'train'
            WHEN {b} < 'f3333333' THEN 'val'
            ELSE 'test' END AS split
FROM documents ORDER BY doc_id"""
    if name == "dedup_components":
        # near-dup GROUPS: connected components (min-id labeling) over
        # the banded-minhash candidate-pair graph. The oracle closes the
        # graph with a recursive CTE (min reachable node per node); the
        # Spark side runs the iterative alternating large-star /
        # small-star operator (operators/pipeline.connected_components,
        # Kiveris et al. SoCC'14) — value-level oracle for the star-
        # contraction loop. Pair construction identical to
        # dedup_minhash_lsh above.
        seeds = ", ".join(f"({s})" for s in range(8))
        str_s = D["STR"]("s")
        return f"""
WITH RECURSIVE {_shingle_cte(d)[1:]},
seeds AS (SELECT s FROM (VALUES {seeds}) AS t(s)),
sigs AS (
  SELECT doc_id, s, MIN(md5({str_s} || ':' || sh)) AS mh
  FROM shingles CROSS JOIN seeds GROUP BY doc_id, s
),
bands AS (
  SELECT doc_id, CAST(floor(s / 2.0) AS INT) AS band,
         {D['BANDSIG']()} AS band_sig
  FROM sigs GROUP BY doc_id, CAST(floor(s / 2.0) AS INT)
),
cand AS (
  SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
),
edges AS (SELECT u, v FROM cand UNION SELECT v AS u, u AS v FROM cand),
reach AS (
  SELECT DISTINCT u AS a, u AS b FROM edges
  UNION
  SELECT r.a, e.v AS b FROM reach r JOIN edges e ON e.u = r.b
)
SELECT a AS doc_id, MIN(b) AS component, (a = MIN(b)) AS is_canonical
FROM reach GROUP BY a ORDER BY doc_id"""
    if name == "dedup_ngram_jaccard":
        # Jaccard over DISCRIMINATIVE shingles: shingles with df > 50
        # are dropped from the universe before the self-join (they make
        # the join quadratic at scale and carry no near-dup signal) —
        # mirrors operators/pipeline.ngram_jaccard_pairs(max_shingle_df)
        return f"""
WITH {_shingle_cte(d)[1:]},
keep AS (SELECT sh FROM shingles GROUP BY sh HAVING COUNT(*) <= 50),
shf AS (SELECT s.doc_id, s.sh FROM shingles s JOIN keep k ON s.sh = k.sh),
shc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM shf GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS i
  FROM shf a JOIN shf b
    ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       round(CAST(i AS DOUBLE) / (ca.n + cb.n - i), 4) AS jaccard
FROM inter
JOIN shc ca ON doc_a = ca.doc_id
JOIN shc cb ON doc_b = cb.doc_id
ORDER BY CAST(i AS DOUBLE) / (ca.n + cb.n - i) DESC, doc_a, doc_b
LIMIT 100"""
    if name == "dedup_simhash":
        sums, combine = _simhash_bits_sql(d)
        return base + f""",
tnib AS (SELECT doc_id, tf, md5(term) AS h FROM tf),
bits AS (SELECT doc_id, {sums} FROM tnib GROUP BY doc_id)
SELECT doc_id, CAST({combine} AS BIGINT) AS simhash
FROM bits ORDER BY doc_id"""
    if name == "ann_cosine_topk":
        dot_ab = D["DOT"]("a.embedding", "b.embedding")
        dot_aa = D["DOT"]("a.embedding", "a.embedding")
        dot_bb = D["DOT"]("b.embedding", "b.embedding")
        return f"""
WITH sims AS (
  SELECT a.vec_id AS qvec, b.vec_id AS nvec,
         {dot_ab} / (sqrt({dot_aa}) * sqrt({dot_bb})) AS sim
  FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
  WHERE a.vec_id < 5
),
ranked AS (
  SELECT qvec, nvec,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY qvec ORDER BY sim DESC, nvec ASC
         ) AS INT) AS rank,
         round(sim, 4) AS sim
  FROM sims
)
SELECT qvec, nvec, rank, sim FROM ranked WHERE rank <= 5
ORDER BY qvec, rank"""
    if name == "qpp_maxidf":
        # P4 MaxIDF (qpp/BaseIDFSpecificity.java:44-65): max ln(N/df)
        # over matched terms, 0 when all terms are OOV
        return base + """,
qa AS (
  SELECT q.qid, s.df FROM qterms q
  LEFT JOIN tstats s ON q.term = s.term
)
SELECT qa.qid,
       round(COALESCE(MAX(CASE WHEN qa.df > 0
                 THEN ln(CAST(g.n_docs AS DOUBLE) / qa.df) END), 0), 4)
         AS maxidf
FROM qa CROSS JOIN g GROUP BY qa.qid ORDER BY qa.qid"""
    if name == "fdbk_kl_rerank":
        # F1+F3+F4 (fdbk/RelevanceModelConditional.java:30-55,
        # fdbk/KLDivReranker.java:29-55): RM-conditional term weights
        # over the top-20 of the BM25 top-100 — per (doc, term):
        # (λ·tf/doclen + (1-λ)·df_top/20)·sim/sum_sim, λ=0.9
        # (Constants.java:38), sim = retrieval score, sum_sim summed
        # once per (doc, DISTINCT term) row [reference quirk] — then
        # every retrieved doc rescored by 1 - exp(Σ_t wt·ln(wt/p_d(t)))
        # over the doc's terms that have weights, p_d = tf/doclen.
        # Ranked on round(score, 6) with previous-rank tie-break (the
        # bmw_topk rank_round device) so the ordering is exact under a
        # rounded total order. This value-level-verifies the RM/KL
        # chain that the qpp_uef reduction deliberately cancels out.
        return base + """,
run AS (SELECT qid, doc_id, rank, score FROM ranked WHERE rank <= 100),
dv AS (
  SELECT r.qid, r.doc_id, r.rank, r.score AS sim, t.term, t.tf, ds.doclen
  FROM run r
  JOIN tf t ON r.doc_id = t.doc_id
  JOIN dstats ds ON r.doc_id = ds.doc_id
),
tstop AS (
  SELECT qid, term, CAST(COUNT(*) AS BIGINT) AS df_top
  FROM dv WHERE rank <= 20 GROUP BY qid, term
),
sums AS (
  SELECT qid, SUM(sim) AS sum_sim FROM dv WHERE rank <= 20 GROUP BY qid
),
wts AS (
  SELECT d.qid, d.term,
         SUM((0.9 * d.tf / d.doclen + (1.0 - 0.9) * ts.df_top / 20.0)
             * d.sim / s.sum_sim) AS wt
  FROM dv d
  JOIN tstop ts ON d.qid = ts.qid AND d.term = ts.term
  JOIN sums s ON d.qid = s.qid
  WHERE d.rank <= 20
  GROUP BY d.qid, d.term
),
kl AS (
  SELECT d.qid, d.doc_id,
         SUM(w.wt * ln(w.wt / (CAST(d.tf AS DOUBLE) / d.doclen))) AS kl
  FROM dv d JOIN wts w ON d.qid = w.qid AND d.term = w.term
  GROUP BY d.qid, d.doc_id
),
rescored AS (
  SELECT r.qid, r.doc_id, r.rank AS prev_rank,
         1.0 - exp(COALESCE(k.kl, 0.0)) AS score
  FROM run r LEFT JOIN kl k ON r.qid = k.qid AND r.doc_id = k.doc_id
),
rr AS (
  SELECT qid, doc_id,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY qid ORDER BY round(score, 6) DESC, prev_rank ASC
         ) AS INT) AS rank,
         round(score, 4) AS score
  FROM rescored
)
SELECT qid, doc_id, rank, score FROM rr WHERE rank <= 10
ORDER BY qid, rank"""
    if name == "fdbk_rm1_expand":
        # F2+F5 (fdbk/RelevanceModelIId.java:66-175): RM1 i.i.d. term
        # weights over the top-20 of the BM25 top-100 — wt(term) =
        # (λ·tf_top/sum_tf + (1-λ)·df_top/20)·exp(K(q) - 1), K(q) =
        # Σ_{q-terms in top-docs vocab} ln(1 + tf_top/sum_tf) — then
        # RLM expansion: wt ×= ln(N/df_collection), normalized over the
        # whole per-query vocab; top-20 NON-query terms by normalized
        # weight (round-6 total order, term tie-break) carry weight
        # fb·wtn (fb = 0.2, Constants.java:45), original query terms
        # carry 1 - fb. This is the reference's most-hit feedback path.
        return base + """,
run AS (SELECT qid, doc_id, rank, score FROM ranked WHERE rank <= 100),
dv AS (
  SELECT r.qid, r.doc_id, r.rank, t.term, t.tf
  FROM run r JOIN tf t ON r.doc_id = t.doc_id
),
tstop AS (
  SELECT qid, term, SUM(tf) AS tf_top, CAST(COUNT(*) AS BIGINT) AS df_top
  FROM dv WHERE rank <= 20 GROUP BY qid, term
),
sums AS (
  SELECT qid, SUM(tf) AS sum_tf FROM dv WHERE rank <= 20 GROUP BY qid
),
kq AS (
  SELECT q.qid, SUM(ln(1.0 + ts.tf_top / s.sum_tf)) AS total_p_q
  FROM qterms q
  JOIN tstop ts ON q.qid = ts.qid AND q.term = ts.term
  JOIN sums s ON q.qid = s.qid
  GROUP BY q.qid
),
w1 AS (
  SELECT ts.qid, ts.term,
         (0.9 * ts.tf_top / s.sum_tf + (1.0 - 0.9) * ts.df_top / 20.0)
           * exp(COALESCE(k.total_p_q, 0.0) - 1.0) AS wt
  FROM tstop ts
  JOIN sums s ON ts.qid = s.qid
  LEFT JOIN kq k ON ts.qid = k.qid
),
w2 AS (
  SELECT w.qid, w.term,
         w.wt * ln(CAST(g.n_docs AS DOUBLE) / t.df) AS wt2
  FROM w1 w JOIN tstats t ON w.term = t.term CROSS JOIN g
),
norm AS (SELECT qid, SUM(wt2) AS z FROM w2 GROUP BY qid),
wn AS (
  SELECT w.qid, w.term, w.wt2 / n.z AS wtn
  FROM w2 w JOIN norm n ON w.qid = n.qid
),
cand AS (
  SELECT wn.qid, wn.term, wn.wtn,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY wn.qid
           ORDER BY round(wn.wtn, 6) DESC, wn.term ASC
         ) AS INT) AS r
  FROM wn
  WHERE NOT EXISTS (
    SELECT 1 FROM qterms q WHERE q.qid = wn.qid AND q.term = wn.term
  )
),
expanded AS (
  SELECT qid, term, CAST(1.0 AS DOUBLE) AS qtf, 0.2 * wtn AS weight
  FROM cand WHERE r <= 20
  UNION ALL
  SELECT DISTINCT qid, term, CAST(1.0 AS DOUBLE) AS qtf,
         CAST(1.0 AS DOUBLE) - 0.2 AS weight
  FROM qterms
)
SELECT qid, term, qtf, round(weight, 6) AS weight
FROM expanded ORDER BY qid, term"""
    if name == "srlm_rerank":
        # F8+F9 (retrieval/SupervisedRLM.java:151-200,241-270 +
        # TermDistribution.java): fit coocc[qterm][coterm] =
        # Σ_{(q,rel d)} qtf·P(q|d)·P(w|d) over L2-normalized LM doc
        # vectors (raw whitespace qterms, NOT analyzed — the reference
        # quirk), prune to top-5 coterms per qterm (round-6 order,
        # coterm tie-break), then rerank the BM25 top-100 by
        # score' = score · Σ_q qtf·dot(coocc[q], docvec). Missing dot
        # -> 0. Round-6 rank key with previous-rank tie-break.
        return base + "," + QRELS_CTE + f""",
run AS (SELECT qid, doc_id, rank, score FROM ranked WHERE rank <= 100),
vraw AS (
  SELECT t.doc_id, t.term,
         ln(1.0 + (0.9 / (1.0 - 0.9))
            * (CAST(t.tf AS DOUBLE) / ds.doclen)
            * (CAST(g.n_docs AS DOUBLE) / s.df)) AS w_raw
  FROM tf t
  JOIN dstats ds ON t.doc_id = ds.doc_id
  JOIN tstats s ON t.term = s.term
  CROSS JOIN g
),
vnorms AS (
  SELECT doc_id, sqrt(SUM(w_raw * w_raw)) AS l2 FROM vraw GROUP BY doc_id
),
vec AS (
  SELECT v.doc_id, v.term, v.w_raw / n.l2 AS w
  FROM vraw v JOIN vnorms n ON v.doc_id = n.doc_id
),
rqt AS (
  SELECT qid, term, CAST(COUNT(*) AS DOUBLE) AS qtf FROM (
    SELECT qid, {D['EXPLODE'](D['SPLIT_WS']('qtext'))} AS term
    FROM queries
  ) x WHERE term <> '' GROUP BY qid, term
),
pqd AS (
  SELECT q.qid, q.term AS qterm, q.qtf, r.doc_id, v.w AS p_q_d
  FROM rqt q
  JOIN qrels r ON q.qid = r.qid
  JOIN vec v ON v.doc_id = r.doc_id AND v.term = q.term
),
contrib AS (
  SELECT p.qterm, v2.term AS coterm, p.qtf * p.p_q_d * v2.w AS c
  FROM pqd p JOIN vec v2 ON v2.doc_id = p.doc_id
),
model AS (
  SELECT qterm, coterm, SUM(c) AS wt
  FROM contrib WHERE c > 0 GROUP BY qterm, coterm
),
pruned AS (
  SELECT qterm, coterm, wt FROM (
    SELECT qterm, coterm, wt,
           ROW_NUMBER() OVER (
             PARTITION BY qterm ORDER BY round(wt, 6) DESC, coterm ASC
           ) AS r
    FROM model
  ) x WHERE r <= 5
),
qmodel AS (
  SELECT q.qid, m.coterm, q.qtf * m.wt AS wt
  FROM rqt q JOIN pruned m ON m.qterm = q.term
),
dots AS (
  SELECT r.qid, r.doc_id, SUM(m.wt * v.w) AS dot
  FROM run r
  JOIN vec v ON v.doc_id = r.doc_id
  JOIN qmodel m ON m.qid = r.qid AND m.coterm = v.term
  GROUP BY r.qid, r.doc_id
),
rescored AS (
  SELECT r.qid, r.doc_id, r.rank AS prev_rank,
         r.score * COALESCE(d.dot, CAST(0 AS DOUBLE)) AS score
  FROM run r LEFT JOIN dots d ON r.qid = d.qid AND r.doc_id = d.doc_id
),
rr AS (
  SELECT qid, doc_id,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY qid ORDER BY round(score, 6) DESC, prev_rank ASC
         ) AS INT) AS rank,
         round(score, 6) AS score
  FROM rescored
)
SELECT qid, doc_id, rank, score FROM rr WHERE rank <= 10
ORDER BY qid, rank"""
    if name == "eval_fairness":
        # E9 fairness pre-evaluated (qrels/PreEvaluatedResults.java:
        # 16-34, FairnessMetrics.java:9-15): combined = awrf * ndcg
        # over a pre-evaluated row set — ndcg from the real E1-E5
        # machinery, awrf a deterministic per-query value
        # round(1/(1+qnum), 4) standing in for the externally-supplied
        # fairness score.
        return (
            base + "," + QRELS_CTE + "," + EVAL_BODY + """,
pre AS (
  SELECT qid, ndcg,
         round(1.0 / (1 + CAST(substr(qid, 2) AS INT)), 4) AS awrf
  FROM permetrics
)
SELECT qid, ndcg, awrf, round(awrf * ndcg, 6) AS combined
FROM pre ORDER BY qid"""
        )
    if name == "doc_lookup":
        # Q9 ID point lookup (stored-field fetch by doc id): the
        # engine's broadcast-filter over the doc store; ids are a
        # deterministic arithmetic subset so both sides derive them.
        return """
SELECT doc_id, text FROM documents
WHERE doc_id % 97 = 0 ORDER BY doc_id"""
    if name == "qpp_stoch_eval":
        # H7 StochasticQPPEvaluation (stochastic_qpp/
        # StochasticQPPEvaluation.java:94-227) under the md5 seeded
        # draw (stochastic.sample_swapped_runs permute="md5"): per
        # sample s in 0..4, draw ONE swap permutation of the BM25
        # top-10 — pick id = argmin over p in 0..n_pairs of
        # md5('31415:s:qid:p'), 0 = identity, p>0 = the (r ASC, nr ASC)
        # pair p-1 with rank-1 always swappable — then recompute AP
        # (round 4) on the swapped run and NQC (round 6; scores stay
        # attached to ranks, so it equals the base NQC) and report
        # Kendall tau-b (AP vs NQC across queries, round 4) per sample.
        str_s = D["STR"]("t.s")
        str_pid = D["STR"]("a.pid")
        samples = ", ".join(f"({s})" for s in range(5))
        return base + "," + QRELS_CTE + f""",
run AS (SELECT qid, doc_id, rank, score FROM ranked WHERE rank <= 10),
filled AS (
  SELECT r.qid, r.doc_id, r.rank, r.score, COALESCE(s.rel, 0) AS rel
  FROM run r LEFT JOIN qrels s ON r.qid = s.qid AND r.doc_id = s.doc_id
),
relranks AS (
  SELECT qid, rank AS r FROM filled WHERE rel >= 1 OR rank = 1
),
nonrelranks AS (
  SELECT qid, rank AS nr FROM filled WHERE rel < 1
),
permids AS (
  SELECT rr.qid, rr.r, nr.nr,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY rr.qid ORDER BY rr.r, nr.nr
         ) AS INT) AS perm_id
  FROM relranks rr
  JOIN nonrelranks nr ON rr.qid = nr.qid AND nr.nr <> rr.r
),
allpids AS (
  SELECT qid, CAST(0 AS INT) AS pid FROM (SELECT DISTINCT qid FROM run) q
  UNION ALL
  SELECT qid, perm_id AS pid FROM permids
),
samples AS (SELECT s FROM (VALUES {samples}) AS t(s)),
choice AS (
  SELECT qid, s, pid FROM (
    SELECT a.qid, t.s, a.pid,
           ROW_NUMBER() OVER (
             PARTITION BY a.qid, t.s
             ORDER BY md5('31415:' || {str_s} || ':' || a.qid || ':'
                          || {str_pid}), a.pid
           ) AS rn
    FROM allpids a CROSS JOIN samples t
  ) x WHERE rn = 1
),
srun AS (
  SELECT c.qid, c.s, f.rank,
         CASE WHEN c.pid > 0 AND f.rank = p.r THEN fn.doc_id
              WHEN c.pid > 0 AND f.rank = p.nr THEN fr.doc_id
              ELSE f.doc_id END AS doc_id,
         f.score
  FROM choice c
  JOIN filled f ON f.qid = c.qid
  LEFT JOIN permids p ON p.qid = c.qid AND p.perm_id = c.pid
  LEFT JOIN filled fr ON fr.qid = c.qid AND fr.rank = p.r
  LEFT JOIN filled fn ON fn.qid = c.qid AND fn.rank = p.nr
),
sfilled AS (
  SELECT r.qid, r.s, r.doc_id, r.rank, COALESCE(q.rel, 0) AS rel
  FROM srun r LEFT JOIN qrels q ON r.qid = q.qid AND r.doc_id = q.doc_id
),
sperdoc AS (
  SELECT qid, s, rank,
         CASE WHEN rel >= 2 THEN 1 ELSE 0 END AS is_rel,
         SUM(CASE WHEN rel >= 2 THEN 1 ELSE 0 END) OVER (
           PARTITION BY qid, s ORDER BY rank
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum_rel
  FROM sfilled
),
sqstats AS (
  SELECT qid, SUM(CASE WHEN rel >= 2 THEN 1 ELSE 0 END) AS num_rel
  FROM qrels GROUP BY qid
),
sap AS (
  SELECT p.qid, p.s,
         round(CASE WHEN st.num_rel > 0 THEN
           SUM(CASE WHEN is_rel = 1
                    THEN CAST(cum_rel AS DOUBLE) / rank ELSE 0 END)
             / st.num_rel ELSE 0 END, 4) AS x
  FROM sperdoc p JOIN sqstats st ON p.qid = st.qid
  GROUP BY p.qid, p.s, st.num_rel
),
nqcv AS (
  SELECT qid, var_pop(score) AS v FROM run WHERE rank <= 50 GROUP BY qid
),
aidf AS (
  SELECT q.qid,
         AVG(ln(CAST(g.n_docs AS DOUBLE)
                / GREATEST(COALESCE(s.df, 0), 1))) AS aidf
  FROM qterms q LEFT JOIN tstats s ON q.term = s.term CROSS JOIN g
  GROUP BY q.qid
),
yv AS (
  SELECT nv.qid, round(nv.v * a.aidf, 6) AS y
  FROM nqcv nv JOIN aidf a ON nv.qid = a.qid
),
mg2 AS (
  SELECT a.s, a.qid, a.x, y.y FROM sap a JOIN yv y ON a.qid = y.qid
),
pr2 AS (
  SELECT a.s, SIGN(a.x - b.x) AS dx, SIGN(a.y - b.y) AS dy
  FROM mg2 a JOIN mg2 b ON a.s = b.s AND a.qid < b.qid
),
tb2 AS (
  SELECT s,
         SUM(CASE WHEN dx * dy > 0 THEN CAST(1 AS DOUBLE) ELSE 0 END)
           AS conc,
         SUM(CASE WHEN dx * dy < 0 THEN CAST(1 AS DOUBLE) ELSE 0 END)
           AS disc,
         SUM(CASE WHEN dx = 0 THEN CAST(1 AS DOUBLE) ELSE 0 END) AS tx,
         SUM(CASE WHEN dy = 0 THEN CAST(1 AS DOUBLE) ELSE 0 END) AS ty,
         CAST(COUNT(*) AS DOUBLE) AS n0
  FROM pr2 GROUP BY s
)
SELECT s, round((conc - disc) / sqrt((n0 - tx) * (n0 - ty)), 4) AS tau
FROM tb2 ORDER BY s"""
    if name == "qpp_corel_spec":
        # P8 CoRelSpecificity (qpp/CoRelsSpecificity-style combine):
        # est = lam*P7_est + (1-lam)*coalesce(weighted rel-doc-run
        # estimate, P7_est), lam = 0.5. Reference runs: per query the
        # first TWO rel docs (by doc_id) used AS QUERIES (doc text,
        # query-side tokenization — no FOLD), full BM25 retrieval,
        # NQC over the doc-text terms, sim = top-10 Jaccard vs the base
        # run. Inputs to both weighted averages are rounded 6 so the
        # combines are bit-identical across engines; the stopword-only
        # query never reaches the combine (no base run -> absent from
        # bnqc and from the Jaccard join) on either side. Zero-sim
        # references are dropped BEFORE the weighted average — they
        # contribute 0 to both numerator and denominator, and keeping
        # them would make the all-zero case 0/0, which Spark (non-ANSI)
        # reads as NULL but DuckDB as NaN.
        bm25w = (
            "ln(1 + (g.n_docs - df + 0.5) / (df + 0.5)) * tf * 1.9 "
            "/ (tf + 0.9 * (1 - 0.4 + 0.4 * doclen / g.avgdl))"
        )
        return (
            base + "," + QRELS_CTE + _variant_ref_ctes(d) + f""",
vwavg AS (
  SELECT qid, SUM(sim * est) / SUM(sim) AS wref FROM refs GROUP BY qid
),
vsest AS (
  SELECT b.qid,
         round(0.5 * COALESCE(w.wref, b.nqc) + (1.0 - 0.5) * b.nqc, 6)
           AS est
  FROM bnqc b LEFT JOIN vwavg w ON b.qid = w.qid
),
rdocs AS (
  SELECT qid, doc_id FROM (
    SELECT qid, doc_id,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY doc_id) AS j
    FROM qrels
  ) x WHERE j <= 2
),
rq AS (
  SELECT r.qid, r.doc_id AS rdoc, d.text
  FROM rdocs r JOIN documents d ON r.doc_id = d.doc_id
),
rqtok AS (
  SELECT qid, rdoc, {D['EXPLODE'](D['TOKENS']('text'))} AS term FROM rq
),
rqterms AS (
  SELECT qid, rdoc, term, CAST(COUNT(*) AS DOUBLE) AS qtf
  FROM rqtok WHERE term NOT IN (SELECT sw FROM stopw)
  GROUP BY qid, rdoc, term
),
rhits AS (
  SELECT q.qid, q.rdoc, t.doc_id, q.qtf, t.tf, d.doclen, s.df
  FROM rqterms q
  JOIN tstats s ON q.term = s.term
  JOIN tf t ON q.term = t.term
  JOIN dstats d ON t.doc_id = d.doc_id
),
rscored AS (
  SELECT qid, rdoc, doc_id, SUM(qtf * ({bm25w})) AS score
  FROM rhits CROSS JOIN g
  GROUP BY qid, rdoc, doc_id
),
rranked AS (
  SELECT qid, rdoc, doc_id,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY qid, rdoc
           ORDER BY round(score, 4) DESC, doc_id ASC
         ) AS INT) AS rank,
         round(score, 4) AS score
  FROM rscored
),
raidf AS (
  SELECT q.qid, q.rdoc,
         AVG(ln(CAST(g.n_docs AS DOUBLE)
                / GREATEST(COALESCE(s.df, 0), 1))) AS aidf
  FROM rqterms q LEFT JOIN tstats s ON q.term = s.term CROSS JOIN g
  GROUP BY q.qid, q.rdoc
),
rnqcv AS (
  SELECT qid, rdoc, var_pop(score) AS v
  FROM rranked WHERE rank <= 50 GROUP BY qid, rdoc
),
rest AS (
  SELECT nv.qid, nv.rdoc, nv.v * a.aidf AS est
  FROM rnqcv nv JOIN raidf a ON nv.qid = a.qid AND nv.rdoc = a.rdoc
),
rb10 AS (SELECT qid, doc_id FROM ranked WHERE rank <= 10),
rv10 AS (SELECT qid, rdoc, doc_id FROM rranked WHERE rank <= 10),
rnasz AS (SELECT qid, COUNT(*) AS na FROM rb10 GROUP BY qid),
rnbsz AS (SELECT qid, rdoc, COUNT(*) AS nb FROM rv10 GROUP BY qid, rdoc),
rnisz AS (
  SELECT v.qid, v.rdoc, COUNT(*) AS ni
  FROM rv10 v JOIN rb10 b ON v.qid = b.qid AND v.doc_id = b.doc_id
  GROUP BY v.qid, v.rdoc
),
rsims AS (
  SELECT nb.qid, nb.rdoc,
         CASE WHEN na.na + nb.nb - COALESCE(ni.ni, 0) > 0
              THEN CAST(COALESCE(ni.ni, 0) AS DOUBLE)
                   / (na.na + nb.nb - COALESCE(ni.ni, 0))
              ELSE CAST(0 AS DOUBLE) END AS sim
  FROM rnbsz nb
  JOIN rnasz na ON nb.qid = na.qid
  LEFT JOIN rnisz ni ON nb.qid = ni.qid AND nb.rdoc = ni.rdoc
),
rrefs AS (
  SELECT e.qid, round(s.sim, 6) AS sim, round(e.est, 6) AS est
  FROM rest e JOIN rsims s ON e.qid = s.qid AND e.rdoc = s.rdoc
  WHERE s.sim > 0
),
rwavg AS (
  SELECT qid, SUM(sim * est) / SUM(sim) AS wrel FROM rrefs GROUP BY qid
)
SELECT v.qid,
       round(0.5 * v.est + (1.0 - 0.5) * COALESCE(w.wrel, v.est), 6)
         AS est
FROM vsest v LEFT JOIN rwavg w ON v.qid = w.qid
ORDER BY v.qid"""
        )
    if name == "stoch_attr_perms":
        # H6 AttributeValueBasedSwapper (stochastic_qpp/
        # AttributeValueBasedSwapper.java:21-53): identical swap
        # mechanics to H5 with rel/nonrel replaced by a binary document
        # attribute (here attr = doc_id % 2) and WITHOUT the
        # rank-1-always-swappable forcing — the enumerator flag combo
        # stoch_swap_perms does not pin. Full permutation set over the
        # BM25 top-10, scores attached to ranks, (r ASC, nr ASC)
        # numbering, identity = perm 0.
        return base + """,
run AS (SELECT qid, doc_id, rank, score FROM ranked WHERE rank <= 10),
filled AS (
  SELECT qid, doc_id, rank, score,
         CAST(doc_id % 2 AS INT) AS rel
  FROM run
),
relranks AS (
  SELECT qid, rank AS r FROM filled WHERE rel >= 1
),
nonrelranks AS (
  SELECT qid, rank AS nr FROM filled WHERE rel < 1
),
permids AS (
  SELECT rr.qid, rr.r, nr.nr,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY rr.qid ORDER BY rr.r, nr.nr
         ) AS INT) AS perm_id
  FROM relranks rr
  JOIN nonrelranks nr ON rr.qid = nr.qid AND nr.nr <> rr.r
),
swapped AS (
  SELECT p.qid, p.perm_id, f.rank,
         CASE WHEN f.rank = p.r THEN fn.doc_id
              WHEN f.rank = p.nr THEN fr.doc_id
              ELSE f.doc_id END AS doc_id,
         f.score
  FROM permids p
  JOIN filled f ON f.qid = p.qid
  JOIN filled fr ON fr.qid = p.qid AND fr.rank = p.r
  JOIN filled fn ON fn.qid = p.qid AND fn.rank = p.nr
),
allperms AS (
  SELECT qid, CAST(0 AS INT) AS perm_id, rank, doc_id, score FROM filled
  UNION ALL
  SELECT qid, perm_id, rank, doc_id, score FROM swapped
)
SELECT qid, perm_id, doc_id, rank, round(score, 4) AS score
FROM allperms ORDER BY qid, perm_id, rank"""
    if name == "qpp_variant_spec":
        # P7 VariantSpecificity (qpp/VariantSpecificity.java) over
        # deterministic variants (VARIANTSET): per variant, a full BM25
        # retrieval, NQC estimate (var_pop(top-50 scores, round-4) x
        # avgidf_nqc over the VARIANT's terms), and sim = Jaccard
        # overlap of the base-vs-variant top-10 doc sets (C10). Combine:
        # est = lam*coalesce(Sum sim*est / Sum sim, base) + (1-lam)*base,
        # lam = 0.5, base = the original query's NQC.
        return base + _variant_ref_ctes(d) + """,
wavg AS (
  SELECT qid, SUM(sim * est) / SUM(sim) AS wref FROM refs GROUP BY qid
)
SELECT b.qid,
       round(0.5 * COALESCE(w.wref, b.nqc) + (1.0 - 0.5) * b.nqc, 6) AS est
FROM bnqc b LEFT JOIN wavg w ON b.qid = w.qid
ORDER BY b.qid"""
    if name == "stoch_swap_perms":
        # H5 samplePermutations (stochastic_qpp/RankSwapper.java:19-141):
        # over the BM25 top-10, enumerate EVERY single-swap permutation
        # of one rel rank (rel >= 1; rank 1 always counts as rel —
        # TOPDOC_ALWAYS_SWAPPED) with one nonrel rank. Scores stay
        # attached to RANKS; only doc ids move. perm_id 0 is the
        # identity; swap (r, nr) pairs are numbered in (r ASC, nr ASC)
        # order — the reference's enumeration order.
        return base + "," + QRELS_CTE + """,
run AS (SELECT qid, doc_id, rank, score FROM ranked WHERE rank <= 10),
filled AS (
  SELECT r.qid, r.doc_id, r.rank, r.score, COALESCE(s.rel, 0) AS rel
  FROM run r LEFT JOIN qrels s ON r.qid = s.qid AND r.doc_id = s.doc_id
),
relranks AS (
  SELECT qid, rank AS r FROM filled WHERE rel >= 1 OR rank = 1
),
nonrelranks AS (
  SELECT qid, rank AS nr FROM filled WHERE rel < 1
),
permids AS (
  SELECT rr.qid, rr.r, nr.nr,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY rr.qid ORDER BY rr.r, nr.nr
         ) AS INT) AS perm_id
  FROM relranks rr
  JOIN nonrelranks nr ON rr.qid = nr.qid AND nr.nr <> rr.r
),
swapped AS (
  SELECT p.qid, p.perm_id, f.rank,
         CASE WHEN f.rank = p.r THEN fn.doc_id
              WHEN f.rank = p.nr THEN fr.doc_id
              ELSE f.doc_id END AS doc_id,
         f.score
  FROM permids p
  JOIN filled f ON f.qid = p.qid
  JOIN filled fr ON fr.qid = p.qid AND fr.rank = p.r
  JOIN filled fn ON fn.qid = p.qid AND fn.rank = p.nr
),
allperms AS (
  SELECT qid, CAST(0 AS INT) AS perm_id, rank, doc_id, score FROM filled
  UNION ALL
  SELECT qid, perm_id, rank, doc_id, score FROM swapped
)
SELECT qid, perm_id, doc_id, rank, round(score, 4) AS score
FROM allperms ORDER BY qid, perm_id, rank"""
    if name == "lmdir_mu_sweep":
        # H3/E6 μ-sweep driver (tokenization/bpe_msmarco.sh:29-63 —
        # retrieve + trec_eval per μ): LM-Dirichlet scoring at each μ
        # in {100, 500, 1000, 2000}, top-100 under the round-4 total
        # order, then the computeAll summary (mean AP / P@5 / nDCG@100
        # + the quirky recall = Σ per-query recall / total num-rel,
        # qrels/AllRetrievedResults.java computeAll) per μ. The weight
        # expression mirrors functions/scoring.lm_dirichlet_weight's
        # operation order exactly: tf / (μ·(cf/total_cf)).
        return base + "," + QRELS_CTE + """,
mus AS (
  SELECT CAST(mu AS DOUBLE) AS mu
  FROM (VALUES (100.0), (500.0), (1000.0), (2000.0)) AS t(mu)
),
mscored AS (
  SELECT m.mu, h.qid, h.doc_id,
         SUM(greatest(
               ln(1.0 + CAST(h.tf AS DOUBLE)
                  / (m.mu * (CAST(h.cf AS DOUBLE) / g.total_cf)))
               + ln(m.mu / (CAST(h.doclen AS DOUBLE) + m.mu)),
               CAST(0 AS DOUBLE)) * h.qtf) AS score
  FROM hits h CROSS JOIN g CROSS JOIN mus m
  GROUP BY m.mu, h.qid, h.doc_id
),
mrun AS (
  SELECT mu, qid, doc_id, rank FROM (
    SELECT mu, qid, doc_id,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY mu, qid
             ORDER BY round(score, 4) DESC, doc_id ASC
           ) AS INT) AS rank
    FROM mscored
  ) x WHERE rank <= 100
),
mfilled AS (
  SELECT r.mu, r.qid, r.rank, COALESCE(s.rel, 0) AS rel
  FROM mrun r LEFT JOIN qrels s ON r.qid = s.qid AND r.doc_id = s.doc_id
),
mperdoc AS (
  SELECT mu, qid, rank, rel,
         CASE WHEN rel >= 2 THEN 1 ELSE 0 END AS is_rel,
         SUM(CASE WHEN rel >= 2 THEN 1 ELSE 0 END) OVER (
           PARTITION BY mu, qid ORDER BY rank
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum_rel,
         CASE WHEN rank <= 100
              THEN rel / (ln(1.0 + rank) / ln(2)) ELSE 0 END AS gain
  FROM mfilled
),
mqstats AS (
  SELECT qid,
         SUM(CASE WHEN rel >= 2 THEN 1 ELSE 0 END) AS num_rel,
         COUNT(*) AS num_judged
  FROM qrels GROUP BY qid
),
midcg AS (
  SELECT qid, SUM(rel / (ln(1.0 + irank) / ln(2))) AS idcg FROM (
    SELECT qid, rel,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rel DESC) AS irank
    FROM qrels
  ) x WHERE irank <= 100 GROUP BY qid
),
mperagg AS (
  SELECT mu, qid,
         SUM(CASE WHEN is_rel = 1
                  THEN CAST(cum_rel AS DOUBLE) / rank ELSE 0 END) AS ap_num,
         SUM(CASE WHEN rank <= 5 AND is_rel = 1 THEN 1 ELSE 0 END)
           AS rel_top5,
         SUM(is_rel) AS num_rel_ret,
         SUM(gain) AS dcg
  FROM mperdoc GROUP BY mu, qid
),
mper AS (
  SELECT a.mu, a.qid,
         CASE WHEN s.num_rel > 0
              THEN a.ap_num / s.num_rel ELSE 0 END AS ap,
         CAST(a.rel_top5 AS DOUBLE) / 5 AS p5,
         CASE WHEN s.num_judged > 0
              THEN CAST(a.num_rel_ret AS DOUBLE) / s.num_judged
              ELSE 0 END AS recall,
         CASE WHEN i.idcg IS NOT NULL AND i.idcg <> 0
              THEN a.dcg / i.idcg ELSE 0 END AS ndcg
  FROM mperagg a
  LEFT JOIN mqstats s ON a.qid = s.qid
  LEFT JOIN midcg i ON a.qid = i.qid
),
tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS total_rel FROM qrels)
SELECT p.mu,
       round(AVG(p.ap), 4) AS map,
       round(AVG(p.p5), 4) AS p_at_5,
       round(AVG(p.ndcg), 4) AS ndcg_100,
       round(SUM(p.recall) / t.total_rel, 6) AS recall_quirk
FROM mper p CROSS JOIN tot t
GROUP BY p.mu, t.total_rel
ORDER BY p.mu"""
    if name == "fdbk_rocchio":
        # F7+F11 (fdbk/Rocchio LM doc vectors + expansion,
        # Constants.java:46-49): L2-normalized LM doc vectors
        # w_raw = ln(1 + λ/(1-λ)·(tf/doclen)·(N/df)), λ=0.9 — then
        # rocchio weight = α·qtf + β·centroid(top-20 docs)
        # - γ·centroid(bottom-3 of the top-100, ranks 98-100),
        # α=0.5 β=0.35 γ=0.15; positive weights only, top-20 terms per
        # query under the round-6 total order (term tie-break).
        return base + """,
run AS (SELECT qid, doc_id, rank FROM ranked WHERE rank <= 100),
rel AS (SELECT qid, doc_id FROM run WHERE rank <= 20),
neg AS (SELECT qid, doc_id FROM run WHERE rank >= 98),
fdocs AS (SELECT doc_id FROM rel UNION SELECT doc_id FROM neg),
vraw AS (
  SELECT t.doc_id, t.term,
         ln(1.0 + (0.9 / (1.0 - 0.9))
            * (CAST(t.tf AS DOUBLE) / ds.doclen)
            * (CAST(g.n_docs AS DOUBLE) / s.df)) AS w_raw
  FROM tf t
  JOIN dstats ds ON t.doc_id = ds.doc_id
  JOIN tstats s ON t.term = s.term
  CROSS JOIN g
  WHERE t.doc_id IN (SELECT doc_id FROM fdocs)
),
norms AS (
  SELECT doc_id, sqrt(SUM(w_raw * w_raw)) AS l2 FROM vraw GROUP BY doc_id
),
vec AS (
  SELECT v.doc_id, v.term, v.w_raw / n.l2 AS w
  FROM vraw v JOIN norms n ON v.doc_id = n.doc_id
),
rvec AS (
  SELECT r.qid, r.doc_id, v.term, v.w
  FROM rel r JOIN vec v ON r.doc_id = v.doc_id
),
nvecs AS (
  SELECT r.qid, r.doc_id, v.term, v.w
  FROM neg r JOIN vec v ON r.doc_id = v.doc_id
),
rsize AS (
  SELECT qid, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n
  FROM rvec GROUP BY qid
),
nsize AS (
  SELECT qid, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n
  FROM nvecs GROUP BY qid
),
parts AS (
  SELECT qid, term, 0.5 * qtf AS c FROM qterms
  UNION ALL
  SELECT v.qid, v.term, 0.35 * SUM(v.w) / s.n AS c
  FROM rvec v JOIN rsize s ON v.qid = s.qid GROUP BY v.qid, v.term, s.n
  UNION ALL
  SELECT v.qid, v.term, (-0.15) * SUM(v.w) / s.n AS c
  FROM nvecs v JOIN nsize s ON v.qid = s.qid GROUP BY v.qid, v.term, s.n
),
comb AS (
  SELECT qid, term, SUM(c) AS weight FROM parts GROUP BY qid, term
),
topm AS (
  SELECT qid, term, weight,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY qid ORDER BY round(weight, 6) DESC, term ASC
         ) AS INT) AS r
  FROM comb WHERE weight > 0
)
SELECT qid, term, CAST(1.0 AS DOUBLE) AS qtf, round(weight, 6) AS weight
FROM topm WHERE r <= 20 ORDER BY qid, term"""
    if name == "bm25_boosted_topk":
        # Q2 boosted/weighted query terms (retrieval/MsMarcoQuery.java
        # setBoost path; the engine's ``weight`` column on compiled
        # terms, operators/retrieval.score_contributions): per-term
        # deterministic boost 1 + (length(term) % 3) * 0.5 multiplies
        # the BM25 contribution alongside qtf. Top-10 under the round-4
        # total order (doc tie-break).
        bm25w = (
            "ln(1 + (g.n_docs - df + 0.5) / (df + 0.5)) * tf * 1.9 "
            "/ (tf + 0.9 * (1 - 0.4 + 0.4 * doclen / g.avgdl))"
        )
        return base + f""",
bqterms AS (
  SELECT qid, term, qtf,
         1.0 + (length(term) % 3) * 0.5 AS boost
  FROM qterms
),
bhits AS (
  SELECT q.qid, t.doc_id, q.qtf, q.boost, t.tf, d.doclen, s.df
  FROM bqterms q
  JOIN tstats s ON q.term = s.term
  JOIN tf t ON q.term = t.term
  JOIN dstats d ON t.doc_id = d.doc_id
),
bscored AS (
  SELECT qid, doc_id, SUM(({bm25w}) * qtf * boost) AS score
  FROM bhits CROSS JOIN g
  GROUP BY qid, doc_id
),
branked AS (
  SELECT qid, doc_id,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY qid ORDER BY round(score, 4) DESC, doc_id ASC
         ) AS INT) AS rank,
         round(score, 4) AS score
  FROM bscored
)
SELECT qid, doc_id, rank, score FROM branked
WHERE rank <= 10 ORDER BY qid, rank"""
    if name == "qpp_corr_pack":
        # C3-C7 correlation kernels over the H1 vectors (x = per-query
        # AP rounded 4, y = NQC rounded 6, qid order = the vectors'
        # original order): C3 RMSE with the reference quirk that pred
        # is min-max normalized ONLY when max(pred) > 1 (C6 normalizer),
        # C4 pairwise sign accuracy over i<j pairs, C5 quantized
        # similarity / strict match / per-class accuracy (5 buckets,
        # floor(minmax*5) clamped to 4), C7 SARE (mean |score-sort
        # position delta| / n; stable sort = value ASC, original-order
        # tie-break) and SARC = 1 - SARE. One collection-level row.
        return (
            base + "," + QRELS_CTE + "," + EVAL_BODY + """,
nqcv AS (
  SELECT qid, var_pop(score) AS v FROM run WHERE rank <= 50 GROUP BY qid
),
aidf AS (
  SELECT q.qid,
         AVG(ln(CAST(g.n_docs AS DOUBLE)
                / GREATEST(COALESCE(s.df, 0), 1))) AS aidf
  FROM qterms q LEFT JOIN tstats s ON q.term = s.term CROSS JOIN g
  GROUP BY q.qid
),
m AS (
  SELECT p.qid, p.ap AS x,
         round(COALESCE(nv.v, 0) * ai.aidf, 6) AS y
  FROM permetrics p
  JOIN aidf ai ON p.qid = ai.qid
  LEFT JOIN nqcv nv ON p.qid = nv.qid
),
mmx AS (SELECT MIN(x) AS lo, MAX(x) AS hi FROM m),
mmy AS (SELECT MIN(y) AS lo, MAX(y) AS hi FROM m),
normed AS (
  SELECT m.qid, m.x, m.y,
         CASE WHEN my.hi > 1 THEN (m.y - my.lo) / (my.hi - my.lo)
              ELSE m.y END AS yn,
         LEAST(CAST(floor((m.x - mx.lo) / (mx.hi - mx.lo) * 5) AS INT),
               4) AS qg,
         LEAST(CAST(floor((m.y - my.lo) / (my.hi - my.lo) * 5) AS INT),
               4) AS qp
  FROM m CROSS JOIN mmx mx CROSS JOIN mmy my
),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM m),
rmse_c AS (SELECT sqrt(AVG((x - yn) * (x - yn))) AS rmse FROM normed),
pw AS (
  SELECT AVG(CASE WHEN SIGN(a.x - b.x) = SIGN(a.y - b.y)
                  THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END)
           AS pw_acc
  FROM m a JOIN m b ON a.qid < b.qid
),
qs AS (
  SELECT 1.0 - SUM(ABS(CAST(qg - qp AS DOUBLE)))
               / (4.0 * (SELECT n FROM nn)) AS q_sim,
         AVG(CASE WHEN qg = qp THEN CAST(1 AS DOUBLE)
                  ELSE CAST(0 AS DOUBLE) END) AS q_strict
  FROM normed
),
qcls AS (
  SELECT qg, AVG(CASE WHEN qp = qg THEN CAST(1 AS DOUBLE)
                      ELSE CAST(0 AS DOUBLE) END) AS acc
  FROM normed GROUP BY qg
),
qca AS (SELECT AVG(acc) AS q_class FROM qcls),
pos AS (
  SELECT qid,
         ROW_NUMBER() OVER (ORDER BY x, qid) - 1 AS px,
         ROW_NUMBER() OVER (ORDER BY y, qid) - 1 AS py
  FROM m
),
sr AS (
  SELECT AVG(ABS(CAST(px - py AS DOUBLE))) / (SELECT n FROM nn) AS sare
  FROM pos
)
SELECT round(rmse_c.rmse, 6) AS rmse,
       round(pw.pw_acc, 6) AS pw_acc,
       round(qs.q_sim, 6) AS q_sim,
       round(qs.q_strict, 6) AS q_strict,
       round(qca.q_class, 6) AS q_class,
       round(sr.sare, 6) AS sare,
       round(1.0 - sr.sare, 6) AS sarc
FROM rmse_c CROSS JOIN pw CROSS JOIN qs CROSS JOIN qca CROSS JOIN sr"""
        )
    if name == "analyzed_export":
        # T3 pre-analysis export (indexing/Preprocessor.java:9-31): the
        # space-joined analyzed token stream per doc, ORDER-PRESERVING
        # (the tok CTEs elsewhere explode and lose order, so this is
        # the only row that pins token SEQUENCE): fold numbers (T2),
        # lowercase alnum runs, drop stopwords in place, join with ' '.
        csv = "|".join(sorted(stopwords())).replace("'", "''")
        toks = D["TOKENS"](D["FOLD"]("text"))
        if d == "spark":
            filt = (f"filter({toks}, t -> "
                    f"NOT array_contains(split('{csv}', '[|]'), t))")
        else:
            filt = (f"list_filter({toks}, t -> "
                    f"NOT list_contains(string_split('{csv}', '|'), t))")
        return (
            f"SELECT doc_id, {D['JOIN_ARR'](filt)} AS analyzed "
            "FROM documents ORDER BY doc_id"
        )
    if name == "bpe_encode":
        # T4 BPE encode (tokenization/bpe_msmarco.sh:1-63 re-encode
        # step): each alnum word of the lowercased text rewritten as
        # space-joined subword units under the frozen BPE_MERGESET,
        # original word order preserved. The twin encodes a word as a
        # '#'-delimited token string ("#t##h##e##</w>#": every token
        # wrapped in its own '#...#', so adjacent tokens are separated
        # by '##' and a replace can never share a boundary character)
        # and applies each merge rule ONCE, in rank order, as
        # replace('#u##v#' -> '#uv#'). That is equivalent to the
        # greedy lowest-rank merge loop in functions/bpe.py because a
        # trained merge list is causally ordered (a pair's compound
        # tokens are always produced by earlier merges, so processing
        # rule i can neither miss nor re-enable a rule <= i), and the
        # double delimiter makes one left-to-right replace-all pass
        # pick exactly the leftmost-first pairing the loop picks
        # (equivalence also brute-checked word-by-word in
        # tests/test_bpe_contract.py). Words are restricted to
        # [a-z0-9_] so '#' and the '</w>' marker cannot collide with
        # word characters.
        if d == "spark":
            enc = "concat(regexp_replace(w, '(.)', '#$1#'), '#</w>#')"
        else:
            enc = "concat(regexp_replace(w, '(.)', '#\\1#', 'g'), '#</w>#')"
        for u, v in BPE_MERGESET:
            enc = f"replace({enc}, '#{u}##{v}#', '#{u}{v}#')"
        enc = f"replace({enc}, '</w>', '')"
        if d == "spark":
            enc = f"array_join(filter(split({enc}, '#'), t -> t != ''), ' ')"
        else:
            enc = (f"array_to_string(list_filter(string_split({enc}, '#'), "
                   "t -> t != ''), ' ')")
        toks = D["TOKENS"]("text")
        return (
            f"WITH dtok AS (SELECT doc_id, {toks} AS ws FROM documents) "
            f"SELECT doc_id, "
            f"{D['JOIN_ARR'](D['MAP_I']('ws', 'w', enc))} AS bpe_text "
            f"FROM dtok WHERE {D['LEN']('ws')} > 0 ORDER BY doc_id"
        )
    if name == "fdbk_term_stats":
        # F1/X5 term-vector fetch + top-docs term stats
        # (fdbk/RelevanceModelIId.java:66-99 buildTermStats): for the
        # BM25 top-10 of each query, the per-term total tf and the
        # count of top docs containing it.
        return base + """,
top AS (SELECT qid, doc_id FROM ranked WHERE rank <= 10),
tv AS (
  SELECT t.qid, t.doc_id, f.term, f.tf
  FROM top t JOIN tf f ON t.doc_id = f.doc_id
)
SELECT qid, term, CAST(SUM(tf) AS BIGINT) AS tf_top,
       CAST(COUNT(*) AS BIGINT) AS df_top
FROM tv GROUP BY qid, term ORDER BY qid, term"""
    if name == "doc_offsets":
        # X7 id<->offset map (utils/IndexUtils.java:22-62, the "MS
        # MARCO docids == Lucene doc offsets" invariant): the dense
        # 0-based id is a pure function of the stable key order.
        return (
            "SELECT doc_id AS orig_id, "
            "CAST(ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS BIGINT) "
            "AS doc_id FROM documents ORDER BY orig_id"
        )
    if name == "trec_roundtrip":
        # S9 sink + S6 reader round-trip: the BM25 top-10 written as
        # TREC 6-col lines (%.4f score) and parsed back must equal the
        # ranked rows (doc_id comes back as the string the line holds).
        return base + (
            f"\nSELECT qid, {D['STR']('doc_id')} AS doc_id, rank, score "
            "FROM ranked WHERE rank <= 10 ORDER BY qid, rank"
        )
    if name == "collection_roundtrip":
        # S1 TSV sink+scan round-trip (indexing/MsMarcoIndexer.java:
        # 67-90 collection format): doc_id \t text written as text lines
        # and parsed back by readers.read_collection_tsv must equal the
        # source rows. TSV-hostile chars ([\t\n\r"]) are blanked on both
        # sides so the line format is an identity (the fixtures contain
        # none; the replace documents the contract).
        if d == "spark":
            clean = "regexp_replace(text, '[\\t\\n\\r\"]', ' ')"
        else:
            clean = "regexp_replace(text, '[\\t\\n\\r\"]', ' ', 'g')"
        return (
            f"SELECT {D['STR']('doc_id')} AS doc_id, {clean} AS text "
            "FROM documents WHERE length(text) > 0 ORDER BY doc_id"
        )
    if name == "jsonl_roundtrip":
        # S2+S3 JSONL round-trip (indexing/JSONDataIndexer.java:19-45 +
        # MsMarcoV2JsonToTsvConverter.java:13-48): {id,title,plain}
        # gzip JSONL written into a NESTED dir, recursively scanned back
        # by readers.read_jsonl_collection -> text = title || ' ' ||
        # plain with [\n\t] blanked (the S3 strip).
        sid = D["STR"]("doc_id")
        if d == "spark":
            strip = "regexp_replace(text, '[\\n\\t]', ' ')"
        else:
            strip = "regexp_replace(text, '[\\n\\t]', ' ', 'g')"
        return (
            f"SELECT {sid} AS doc_id, "
            f"'D' || {sid} || ' ' || {strip} AS text "
            "FROM documents ORDER BY doc_id"
        )
    if name == "queries_roundtrip":
        # S4 query-TSV loader (retrieval/QueryLoader.java:25-51): the
        # QUERYSET written as ``qid \t qtext`` lines and parsed back by
        # readers.read_queries_tsv must equal the literal set.
        return (
            f"WITH {_queries_cte()} "
            "SELECT qid, qtext FROM queries ORDER BY qid"
        )
    if name == "qrels_firstwins":
        # S5 qrels loader quirks (qrels/AllRelRcds.java:37-63 +
        # PerQueryRelDocs.java:20-26): rel>0 only, FIRST line wins per
        # (qid, doc). The written file carries two lines per doc in
        # order: rel = doc_id % 4 (0..3) then rel = 1 — so the parsed
        # rel must be doc_id % 4 when > 0 (first wins over the later 1)
        # and 1 otherwise (the rel-0 first line is dropped).
        return (
            f"SELECT 'q' || {D['STR']('doc_id % 3 + 1')} AS qid, "
            f"{D['STR']('doc_id')} AS doc_id, "
            "CAST(CASE WHEN doc_id % 4 > 0 THEN doc_id % 4 ELSE 1 END "
            "AS INT) AS rel "
            "FROM documents ORDER BY qid, doc_id"
        )
    if name == "variants_roundtrip":
        # S7 variants TSV round-trip (retrieval/KNNRelModel.java:
        # 141-177): qid \t qtext \t v1 \t v2 lines parsed back by
        # readers.read_variants_tsv (posexplode from col 3, 0-based
        # variant_idx, empty variants dropped). Variants are fixed-width
        # slices of the doc text so short docs exercise the '' filter.
        sub = "substring" if d == "spark" else "substr"
        return f"""
WITH v AS (
  SELECT 'v' || {D['STR']('doc_id')} AS qid,
         {sub}(text, 1, 20) AS qtext,
         {sub}(text, 21, 20) AS v1,
         {sub}(text, 41, 20) AS v2
  FROM documents
)
SELECT qid, qtext, CAST(0 AS INT) AS variant_idx, v1 AS vtext
FROM v WHERE v1 != ''
UNION ALL
SELECT qid, qtext, CAST(1 AS INT) AS variant_idx, v2 AS vtext
FROM v WHERE v2 != ''
ORDER BY qid, variant_idx"""
    if name == "fewshot_roundtrip":
        # S12 few-shot JSON sink round-trip (retrieval/KNNRelModel.java:
        # 197-295): the per-query JSON docs (query text + rel/nonrel
        # retrieved ids with ranks, rel from the synthetic (doc_id +
        # qnum) % 5 qrels) written as text and PARSED BACK with a JSON
        # reader must explode to the ranked rows they encode.
        qn = ("CAST(substring(qid, 2, 10) AS INT)" if d == "spark"
              else "CAST(substr(qid, 2) AS INT)")
        return base + f""",
rels AS (
  SELECT qid, doc_id, rank,
         CASE WHEN (doc_id + {qn}) % 5 = 0 THEN 1 ELSE 0 END AS rel
  FROM ranked WHERE rank <= 10
)
SELECT r.qid, q.qtext,
       CASE WHEN r.rel > 0 THEN 'rel' ELSE 'nonrel' END AS kind,
       r.rank, {D['STR']('r.doc_id')} AS doc_id,
       CAST(r.rel AS INT) AS rel
FROM rels r JOIN queries q ON r.qid = q.qid
ORDER BY r.qid, r.rank"""
    if name == "perm_map":
        # S13 permutation-map sink (qpp/PreComputedPredictor.java:
        # 67-99): per-qid ``qid \t pre>post,...`` lines — for each doc
        # of the BM25 top-10 also present in the LM-Dirichlet top-10,
        # the rank it moved to, comma-joined in pre-rank order.
        if d == "spark":
            agg = ("array_join(transform(array_sort("
                   "collect_list(struct(pre_rank, pair))), "
                   "x -> x.pair), ',')")
        else:
            agg = "string_agg(pair, ',' ORDER BY pre_rank)"
        return base + f""",
scored2 AS (
  SELECT qid, doc_id, SUM(qtf * ({LMDIR})) AS score
  FROM hits CROSS JOIN g GROUP BY qid, doc_id
),
ranked2 AS (
  SELECT qid, doc_id,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY qid ORDER BY round(score, 4) DESC, doc_id ASC
         ) AS INT) AS rank
  FROM scored2
),
pre AS (SELECT qid, doc_id, rank AS pre_rank FROM ranked WHERE rank <= 10),
post AS (
  SELECT qid, doc_id, rank AS post_rank FROM ranked2 WHERE rank <= 10
),
pairs AS (
  SELECT p.qid, p.pre_rank,
         {D['STR']('p.pre_rank')} || '>' || {D['STR']('o.post_rank')}
           AS pair
  FROM pre p JOIN post o ON p.qid = o.qid AND p.doc_id = o.doc_id
)
SELECT qid, qid || chr(9) || {agg} AS line
FROM pairs GROUP BY qid ORDER BY qid"""
    if name == "qpp_preretrieved":
        # H8 (QPP on a pre-retrieved run) chaining Q8 induce_scores +
        # E8 rerank_by_score + P1 NQC + P9 precomputed lookup: the
        # external 2-col run is, per query, the doc_ids with
        # (doc_id + qnum) % 3 == 0 (first 40 by doc_id); re-scored with
        # LM-JM (lam=0.2 -> 0.25 factor) over the query terms (docs
        # sharing no term score 0), rounded 4, re-sorted score desc /
        # doc_id asc with ranks reassigned (the AUTO_SORT_TOP_DOCS
        # quirk), NQC (round 6) surfaced on the top-5 rows via the P9
        # broadcast lookup. The stopword-only query (no terms -> no
        # aidf -> no estimate) is dropped by the inner join on both
        # sides: a NULL in a surfaced column would break the driver's
        # sorted-tuple value compare (None is unordered vs float).
        return base + """,
ext AS (
  SELECT q.qid, d.doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY q.qid ORDER BY d.doc_id
         ) AS r
  FROM documents d CROSS JOIN queries q
  WHERE (d.doc_id + CAST(substr(q.qid, 2) AS INT)) % 3 = 0
),
ext40 AS (SELECT qid, doc_id FROM ext WHERE r <= 40),
ihits AS (
  SELECT e.qid, e.doc_id, q.qtf, t.tf, ds.doclen, s.df
  FROM ext40 e
  JOIN qterms q ON q.qid = e.qid
  JOIN tf t ON t.term = q.term AND t.doc_id = e.doc_id
  JOIN tstats s ON s.term = q.term
  JOIN dstats ds ON ds.doc_id = e.doc_id
),
iscored AS (
  SELECT qid, doc_id,
         SUM(qtf * (ln(1 + 0.25 * (tf / doclen) * (g.n_docs / df))))
           AS score
  FROM ihits CROSS JOIN g GROUP BY qid, doc_id
),
ind AS (
  SELECT e.qid, e.doc_id,
         round(COALESCE(i.score, CAST(0 AS DOUBLE)), 4) AS score
  FROM ext40 e
  LEFT JOIN iscored i ON e.qid = i.qid AND e.doc_id = i.doc_id
),
rr8 AS (
  SELECT qid, doc_id, score,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY qid ORDER BY score DESC, doc_id ASC
         ) AS INT) AS rank
  FROM ind
),
nqcv AS (
  SELECT qid, var_pop(score) AS v FROM rr8 WHERE rank <= 50 GROUP BY qid
),
aidf AS (
  SELECT q.qid,
         AVG(ln(CAST(g.n_docs AS DOUBLE)
                / GREATEST(COALESCE(s.df, 0), 1))) AS aidf
  FROM qterms q LEFT JOIN tstats s ON q.term = s.term CROSS JOIN g
  GROUP BY q.qid
),
est AS (
  SELECT nv.qid, round(nv.v * a.aidf, 6) AS nqc
  FROM nqcv nv JOIN aidf a ON nv.qid = a.qid
)
SELECT r.qid, r.doc_id, r.rank, r.score, e.nqc
FROM rr8 r JOIN est e ON r.qid = e.qid
WHERE r.rank <= 5
ORDER BY r.qid, r.rank"""
    if name == "corr_polyfit":
        # C11 polynomial regression (correlation/PolynomialRegression
        # .java:14-57 via commons-math3 PolynomialCurveFitter; engine
        # ``correlation.polynomial_fit`` = np.polyfit): degree-2 least
        # squares of y = NQC (rounded 6) on x = AP (rounded 4, the
        # well-conditioned axis), coefficients highest power first. The
        # twin solves the 3x3 normal equations by Cramer's rule —
        # verified against the SVD solution to ~2e-13 on these fixtures,
        # far inside the round-6 surfacing.
        return (
            base + "," + QRELS_CTE + "," + EVAL_BODY + """,
nqcv AS (
  SELECT qid, var_pop(score) AS v FROM run WHERE rank <= 50 GROUP BY qid
),
aidf AS (
  SELECT q.qid,
         AVG(ln(CAST(g.n_docs AS DOUBLE)
                / GREATEST(COALESCE(s.df, 0), 1))) AS aidf
  FROM qterms q LEFT JOIN tstats s ON q.term = s.term CROSS JOIN g
  GROUP BY q.qid
),
m AS (
  SELECT p.qid, p.ap AS x,
         round(COALESCE(nv.v, 0) * ai.aidf, 6) AS y
  FROM permetrics p
  JOIN aidf ai ON p.qid = ai.qid
  LEFT JOIN nqcv nv ON p.qid = nv.qid
),
s AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS s0, SUM(x) AS s1, SUM(x * x) AS s2,
         SUM(x * x * x) AS s3, SUM(x * x * x * x) AS s4,
         SUM(y) AS t0, SUM(x * y) AS t1, SUM(x * x * y) AS t2
  FROM m
),
dd AS (
  SELECT s.*,
         s0 * (s2 * s4 - s3 * s3) - s1 * (s1 * s4 - s2 * s3)
           + s2 * (s1 * s3 - s2 * s2) AS det
  FROM s
)
SELECT
  round((s0 * (s2 * t2 - t1 * s3) - s1 * (s1 * t2 - t1 * s2)
         + t0 * (s1 * s3 - s2 * s2)) / det, 6) AS c2,
  round((s0 * (t1 * s4 - s3 * t2) - t0 * (s1 * s4 - s3 * s2)
         + s2 * (s1 * t2 - t1 * s2)) / det, 6) AS c1,
  round((t0 * (s2 * s4 - s3 * s3) - s1 * (t1 * s4 - s3 * t2)
         + s2 * (t1 * s3 - s2 * t2)) / det, 6) AS c0
FROM dd"""
        )
    if name == "qpp_lambda_grid":
        # H2 grid_search_lambda (operators/experiments.py; the qpp_eval
        # tuning drivers): for each lambda on the grid, the P7 combine
        # est = lam*coalesce(Sum sim*est / Sum sim, nqc) + (1-lam)*nqc
        # over ROUND-6 refs and base NQC — both engines then see
        # identical doubles, and the two-multiply-one-add combine (and
        # the <=2-element weighted average) is bit-identical IEEE — then
        # Kendall tau-b of est against per-query AP (rounded 4). Output:
        # one (lam, tau) row per grid point.
        return (
            base + "," + QRELS_CTE + "," + EVAL_BODY
            + _variant_ref_ctes(d) + """,
refs_r AS (
  SELECT qid, round(sim, 6) AS sim, round(est, 6) AS est FROM refs
),
wavg_r AS (
  SELECT qid, SUM(sim * est) / SUM(sim) AS wref FROM refs_r GROUP BY qid
),
bnqc_r AS (SELECT qid, round(nqc, 6) AS nqc FROM bnqc),
grid AS (
  SELECT CAST(lam AS DOUBLE) AS lam
  FROM (VALUES (0.0), (0.25), (0.5), (0.75), (1.0)) AS gl(lam)
),
comb AS (
  SELECT g.lam, b.qid,
         g.lam * COALESCE(w.wref, b.nqc) + (1.0 - g.lam) * b.nqc AS est
  FROM bnqc_r b LEFT JOIN wavg_r w ON b.qid = w.qid CROSS JOIN grid g
),
mg AS (
  SELECT c.lam, c.qid, p.ap AS x, c.est AS y
  FROM comb c JOIN permetrics p ON c.qid = p.qid
),
prg AS (
  SELECT a.lam, SIGN(a.x - b.x) AS dx, SIGN(a.y - b.y) AS dy
  FROM mg a JOIN mg b ON a.lam = b.lam AND a.qid < b.qid
),
tbg AS (
  SELECT lam,
         SUM(CASE WHEN dx * dy > 0 THEN CAST(1 AS DOUBLE) ELSE 0 END)
           AS conc,
         SUM(CASE WHEN dx * dy < 0 THEN CAST(1 AS DOUBLE) ELSE 0 END)
           AS disc,
         SUM(CASE WHEN dx = 0 THEN CAST(1 AS DOUBLE) ELSE 0 END) AS tx,
         SUM(CASE WHEN dy = 0 THEN CAST(1 AS DOUBLE) ELSE 0 END) AS ty,
         CAST(COUNT(*) AS DOUBLE) AS n0
  FROM prg GROUP BY lam
)
SELECT lam, round((conc - disc) / sqrt((n0 - tx) * (n0 - ty)), 4) AS tau
FROM tbg ORDER BY lam"""
        )
    if name == "srlm_knn_rerank":
        # Q10+F10 (retrieval/KNNRelModel.java:56-128 getKNNQueries;
        # fdbk KNN-centroid rerank): a queries-as-documents LM-Dirichlet
        # index over KNNTRAINSET (mu=1000; FOLD applied — the docs-side
        # T2 quirk), top-2 neighbors per test query (round-4 rank order,
        # self-exclusion pinned trivially true, sims normalized to sum 1
        # and rounded 6); centroid = L2-normalized Sum sim*(rel-doc LM
        # vector) over the neighbors' synthetic qrels; candidates = the
        # BM25 top-20 rescored by score*dot (missing dot -> 0), round-6
        # rank key with previous-rank tie-break, top-10 surfaced.
        return base + _knn_ctes(d) + """,
krun AS (SELECT qid, doc_id, rank, score FROM ranked WHERE rank <= 20),
relref AS (
  SELECT k.qid, k.ref_qid, k.sim, s.doc_id
  FROM knn k JOIN kqrels s ON s.qid = k.ref_qid AND s.rel > 0
),
kfdocs AS (
  SELECT doc_id FROM relref UNION SELECT doc_id FROM krun
),
vraw AS (
  SELECT t.doc_id, t.term,
         ln(1.0 + (0.9 / (1.0 - 0.9))
            * (CAST(t.tf AS DOUBLE) / ds.doclen)
            * (CAST(g.n_docs AS DOUBLE) / s.df)) AS w_raw
  FROM tf t
  JOIN dstats ds ON t.doc_id = ds.doc_id
  JOIN tstats s ON t.term = s.term
  CROSS JOIN g
  WHERE t.doc_id IN (SELECT doc_id FROM kfdocs)
),
vnorms AS (
  SELECT doc_id, sqrt(SUM(w_raw * w_raw)) AS l2 FROM vraw GROUP BY doc_id
),
vec AS (
  SELECT v.doc_id, v.term, v.w_raw / n.l2 AS w
  FROM vraw v JOIN vnorms n ON v.doc_id = n.doc_id
),
kweighted AS (
  SELECT r.qid, v.term, r.sim * v.w AS c
  FROM relref r JOIN vec v ON v.doc_id = r.doc_id
),
kcentroid AS (
  SELECT qid, term, SUM(c) AS c FROM kweighted GROUP BY qid, term
),
knorm AS (
  SELECT qid, sqrt(SUM(c * c)) AS l2 FROM kcentroid GROUP BY qid
),
kcw AS (
  SELECT c.qid, c.term, c.c / n.l2 AS cw
  FROM kcentroid c JOIN knorm n ON c.qid = n.qid
),
kdots AS (
  SELECT r.qid, r.doc_id, SUM(k.cw * v.w) AS dot
  FROM krun r
  JOIN vec v ON v.doc_id = r.doc_id
  JOIN kcw k ON k.qid = r.qid AND k.term = v.term
  GROUP BY r.qid, r.doc_id
),
krescored AS (
  SELECT r.qid, r.doc_id, r.rank AS prev_rank,
         r.score * COALESCE(d.dot, CAST(0 AS DOUBLE)) AS score
  FROM krun r
  LEFT JOIN kdots d ON r.qid = d.qid AND r.doc_id = d.doc_id
),
krr AS (
  SELECT qid, doc_id,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY qid ORDER BY round(score, 6) DESC, prev_rank ASC
         ) AS INT) AS rank,
         round(score, 6) AS score
  FROM krescored
)
SELECT qid, doc_id, rank, score FROM krr WHERE rank <= 10
ORDER BY qid, rank"""
    if name == "fdbk_print_terms":
        # F13 (retrieval/FdbkTermStats.java:24-65, printfdbkterms.sh):
        # the feedback-term printer — the RM-conditional weights
        # themselves, over the LM-Dirichlet top-20 with RAW sims (same
        # chain fdbk_rlm_driver consumes before its KL step), rounded
        # for the value contract.
        return _ir_base(d, LMDIR) + "," + _RM_WTS_CTES + """
SELECT qid, term, round(wt, 6) AS wt FROM wts
ORDER BY qid, wt DESC, term"""
    if name == "fdbk_rlm_driver":
        # F6 (retrieval/KNNRelModel.java:610-620 relevanceFeedback):
        # the RLM driver's default wiring — LM-Dirichlet retrieval
        # (mu=1000, k=num_wanted=100), RM-conditional weights on the
        # top-20, KL-div rerank of the same run. Membership is pinned
        # by the round-4 rank key but the KL chain consumes the RAW
        # retrieval score as sim (the driver does not round mid-chain),
        # so `run` re-joins `scored` for the unrounded value. Round-6
        # rerank key with previous-rank tie-break; score round 4.
        return _ir_base(d, LMDIR) + "," + _RM_WTS_CTES + """,
kl AS (
  SELECT d.qid, d.doc_id,
         SUM(w.wt * ln(w.wt / (CAST(d.tf AS DOUBLE) / d.doclen))) AS kl
  FROM dv d JOIN wts w ON d.qid = w.qid AND d.term = w.term
  GROUP BY d.qid, d.doc_id
),
rescored AS (
  SELECT r.qid, r.doc_id, r.rank AS prev_rank,
         1.0 - exp(COALESCE(k.kl, 0.0)) AS score
  FROM run r LEFT JOIN kl k ON r.qid = k.qid AND r.doc_id = k.doc_id
),
rr AS (
  SELECT qid, doc_id,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY qid ORDER BY round(score, 6) DESC, prev_rank ASC
         ) AS INT) AS rank,
         round(score, 4) AS score
  FROM rescored
)
SELECT qid, doc_id, rank, score FROM rr WHERE rank <= 10
ORDER BY qid, rank"""
    if name == "srlm_knn_pseudo":
        # F12 (retrieval/KNNRelModel.java pseudo-relevance path):
        # pseudo top-docs list = the KNN neighbors' rel docs (uniform
        # weight 1/n, sum 1, listed FIRST ordered by doc_id) followed by
        # the retrieved docs (score-sum-normalized, ordered by rank);
        # the RM-conditional weights are fit on the pseudo list's
        # top-20 (with the synthetic qrels, n_rel >= 20 always, so the
        # pseudo head is pure rel docs) and the KL-div rerank rescores
        # the ORIGINAL BM25 top-100. Round-6 rank key with previous-rank
        # tie-break, score surfaced at round 4 (the F4 contract shape).
        return base + _knn_ctes(d) + """,
run12 AS (SELECT qid, doc_id, rank, score FROM ranked WHERE rank <= 100),
reld AS (
  SELECT DISTINCT k.qid, s.doc_id
  FROM knn k JOIN kqrels s ON s.qid = k.ref_qid AND s.rel > 0
),
nrel AS (SELECT qid, CAST(COUNT(*) AS BIGINT) AS n FROM reld GROUP BY qid),
relp AS (
  SELECT r.qid, r.doc_id, 1.0 / n.n AS sim, 0 AS grp,
         CAST(r.doc_id AS BIGINT) AS ord
  FROM reld r JOIN nrel n ON r.qid = n.qid
),
zsum AS (SELECT qid, SUM(score) AS z FROM run12 GROUP BY qid),
retp AS (
  SELECT r.qid, r.doc_id, r.score / z.z AS sim, 1 AS grp,
         CAST(r.rank AS BIGINT) AS ord
  FROM run12 r JOIN zsum z ON r.qid = z.qid
),
pseudo AS (
  SELECT qid, doc_id, sim,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY qid ORDER BY grp, ord
         ) AS INT) AS rank
  FROM (SELECT * FROM relp UNION ALL SELECT * FROM retp) u
),
pdv AS (
  SELECT p.qid, p.doc_id, p.rank, p.sim, t.term, t.tf, ds.doclen
  FROM pseudo p
  JOIN tf t ON p.doc_id = t.doc_id
  JOIN dstats ds ON p.doc_id = ds.doc_id
  WHERE p.rank <= 20
),
ptstop AS (
  SELECT qid, term, CAST(COUNT(*) AS BIGINT) AS df_top
  FROM pdv GROUP BY qid, term
),
psums AS (SELECT qid, SUM(sim) AS sum_sim FROM pdv GROUP BY qid),
pwts AS (
  SELECT d.qid, d.term,
         SUM((0.9 * d.tf / d.doclen + (1.0 - 0.9) * ts.df_top / 20.0)
             * d.sim / s.sum_sim) AS wt
  FROM pdv d
  JOIN ptstop ts ON d.qid = ts.qid AND d.term = ts.term
  JOIN psums s ON d.qid = s.qid
  GROUP BY d.qid, d.term
),
rdv AS (
  SELECT r.qid, r.doc_id, t.term, t.tf, ds.doclen
  FROM run12 r
  JOIN tf t ON r.doc_id = t.doc_id
  JOIN dstats ds ON r.doc_id = ds.doc_id
),
pkl AS (
  SELECT d.qid, d.doc_id,
         SUM(w.wt * ln(w.wt / (CAST(d.tf AS DOUBLE) / d.doclen))) AS kl
  FROM rdv d JOIN pwts w ON d.qid = w.qid AND d.term = w.term
  GROUP BY d.qid, d.doc_id
),
prescored AS (
  SELECT r.qid, r.doc_id, r.rank AS prev_rank,
         1.0 - exp(COALESCE(k.kl, 0.0)) AS score
  FROM run12 r LEFT JOIN pkl k ON r.qid = k.qid AND r.doc_id = k.doc_id
),
prr AS (
  SELECT qid, doc_id,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY qid ORDER BY round(score, 6) DESC, prev_rank ASC
         ) AS INT) AS rank,
         round(score, 4) AS score
  FROM prescored
)
SELECT qid, doc_id, rank, score FROM prr WHERE rank <= 10
ORDER BY qid, rank"""
    if name == "qpp_eval_corr":
        # H1 QPP-evaluation harness (qpp_eval/* drivers; correlation
        # kernels utils/TauCorrelation.java / commons-math3): per-query
        # AP (E1, the eval_metrics machinery, rounded 4) correlated
        # with the NQC estimate (P1, rounded 6) across the query set —
        # Kendall tau-b (ties-corrected, the commons-math3 formula),
        # Pearson r, and Spearman rho (Pearson on tie-mean average
        # ranks). One row: the collection-level correlation triple.
        return (
            base + "," + QRELS_CTE + "," + EVAL_BODY + """,
nqcv AS (
  SELECT qid, var_pop(score) AS v FROM run WHERE rank <= 50 GROUP BY qid
),
aidf AS (
  SELECT q.qid,
         AVG(ln(CAST(g.n_docs AS DOUBLE)
                / GREATEST(COALESCE(s.df, 0), 1))) AS aidf
  FROM qterms q LEFT JOIN tstats s ON q.term = s.term CROSS JOIN g
  GROUP BY q.qid
),
m AS (
  SELECT p.qid, p.ap AS x,
         round(COALESCE(nv.v, 0) * ai.aidf, 6) AS y
  FROM permetrics p
  JOIN aidf ai ON p.qid = ai.qid
  LEFT JOIN nqcv nv ON p.qid = nv.qid
),
pr AS (
  SELECT SIGN(a.x - b.x) AS dx, SIGN(a.y - b.y) AS dy
  FROM m a JOIN m b ON a.qid < b.qid
),
tb AS (
  SELECT SUM(CASE WHEN dx * dy > 0 THEN CAST(1 AS DOUBLE) ELSE 0 END)
           AS conc,
         SUM(CASE WHEN dx * dy < 0 THEN CAST(1 AS DOUBLE) ELSE 0 END)
           AS disc,
         SUM(CASE WHEN dx = 0 THEN CAST(1 AS DOUBLE) ELSE 0 END) AS tx,
         SUM(CASE WHEN dy = 0 THEN CAST(1 AS DOUBLE) ELSE 0 END) AS ty,
         CAST(COUNT(*) AS DOUBLE) AS n0
  FROM pr
),
rk AS (
  SELECT x, y,
         RANK() OVER (ORDER BY x)
           + (COUNT(*) OVER (PARTITION BY x) - 1) / 2.0 AS rkx,
         RANK() OVER (ORDER BY y)
           + (COUNT(*) OVER (PARTITION BY y) - 1) / 2.0 AS rky
  FROM m
),
cors AS (
  SELECT CORR(x, y) AS pearson, CORR(rkx, rky) AS spearman FROM rk
)
SELECT round((tb.conc - tb.disc)
             / sqrt((tb.n0 - tb.tx) * (tb.n0 - tb.ty)), 4) AS kendall,
       round(cors.pearson, 4) AS pearson,
       round(cors.spearman, 4) AS spearman
FROM tb CROSS JOIN cors"""
        )
    if name == "qpp_cumnqc":
        # P2 CumulativeNQC (qpp/CumulativeNQC.java): mean over prefix
        # depths i = 1..k-1 of var_pop(top-min(i,n) scores), times
        # avgidf_nqc (OOV df -> 1); the i > n depths all reuse the full
        # prefix's variance (the min(i, n) clamp), hence the mult
        # weighting on the last in-range prefix. k = 50.
        return base + """,
run AS (SELECT qid, doc_id, rank, score FROM ranked WHERE rank <= 50),
cum AS (
  SELECT qid, rank,
         SUM(score) OVER (PARTITION BY qid ORDER BY rank) AS s1,
         SUM(score * score) OVER (PARTITION BY qid ORDER BY rank) AS s2,
         COUNT(*) OVER (PARTITION BY qid ORDER BY rank) AS i
  FROM run
),
nq AS (SELECT qid, CAST(COUNT(*) AS BIGINT) AS n FROM run GROUP BY qid),
pp AS (
  SELECT c.qid,
         c.s2 / c.i - POWER(c.s1 / c.i, 2) AS var_i,
         CASE WHEN c.i < nq.n THEN 1.0
              ELSE 49.0 - nq.n + 1.0 END AS mult
  FROM cum c JOIN nq ON c.qid = nq.qid
  WHERE c.i <= 49
),
cv AS (SELECT qid, SUM(var_i * mult) / 50.0 AS cv FROM pp GROUP BY qid),
aidf AS (
  SELECT q.qid,
         AVG(ln(CAST(g.n_docs AS DOUBLE)
                / GREATEST(COALESCE(s.df, 0), 1))) AS aidf
  FROM qterms q LEFT JOIN tstats s ON q.term = s.term CROSS JOIN g
  GROUP BY q.qid
)
SELECT c.qid, round(c.cv * a.aidf, 6) AS cumnqc
FROM cv c JOIN aidf a ON c.qid = a.qid ORDER BY c.qid"""
    if name == "qpp_uef":
        # P5 UEF (qpp/UEFSpecificity.java:29-82) with the SQL-expressible
        # md5 seeded shuffle (operators/qpp._permutation "md5"): 10
        # samples per query, each = the top-100 run permuted by
        # md5('314152:s:qid:doc_id') truncated to min(20, n); per sample
        # the RM-conditional/KL rerank is computed by the operator but
        # CANCELS OUT of the value — rank_distance (C9,
        # correlation/RankDistanceBasedRBO quirk) reads B's position in
        # SORTED-BY-DOC-ID order, and kl_div_rerank preserves the
        # sample's membership exactly — so the oracle needs only the
        # sampled doc set. uef = num_samples / Σ_s rank_dist(orig,
        # sample_s) × NQC (var_pop(top-50 scores) × avgidf_nqc, OOV
        # df -> 1). The RM/KL values themselves stay pinned by the
        # english-golden pytest rows (F3/F4); this row value-verifies
        # the seeded sampling, the rank-distance quirk, and the NQC
        # composition end-to-end.
        str_s = D["STR"]("t.s")
        str_doc = D["STR"]("r.doc_id")
        samples = ", ".join(f"({s})" for s in range(10))
        return base + f""",
run AS (SELECT qid, doc_id, rank, score FROM ranked WHERE rank <= 100),
nq AS (SELECT qid, CAST(COUNT(*) AS BIGINT) AS n FROM run GROUP BY qid),
samples AS (SELECT s FROM (VALUES {samples}) AS t(s)),
perm AS (
  SELECT r.qid, t.s, r.doc_id,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY r.qid, t.s
           ORDER BY md5('314152:' || {str_s} || ':' || r.qid || ':'
                        || {str_doc}), r.doc_id
         ) AS INT) AS srank
  FROM run r CROSS JOIN samples t
),
samp AS (
  SELECT p.qid, p.s, p.doc_id
  FROM perm p JOIN nq ON p.qid = nq.qid
  WHERE p.srank <= LEAST(20, nq.n)
),
posb AS (
  SELECT qid, s, doc_id,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY qid, s ORDER BY doc_id
         ) AS INT) - 1 AS pos_b
  FROM samp
),
rd AS (
  SELECT r.qid, p.s,
         sqrt(SUM(POWER(
           CAST(r.rank - 1 - p.pos_b AS DOUBLE) / nq.n, 2
         )) / nq.n) AS rank_dist
  FROM run r
  JOIN posb p ON r.qid = p.qid AND r.doc_id = p.doc_id
  JOIN nq ON r.qid = nq.qid
  GROUP BY r.qid, p.s, nq.n
),
sumrd AS (SELECT qid, SUM(rank_dist) AS sum_rd FROM rd GROUP BY qid),
nqcv AS (
  SELECT qid, var_pop(score) AS v FROM run WHERE rank <= 50 GROUP BY qid
),
aidf AS (
  SELECT q.qid,
         AVG(ln(CAST(g.n_docs AS DOUBLE)
                / GREATEST(COALESCE(s.df, 0), 1))) AS aidf
  FROM qterms q LEFT JOIN tstats s ON q.term = s.term CROSS JOIN g
  GROUP BY q.qid
)
SELECT sr.qid,
       round(10.0 / sr.sum_rd * COALESCE(n.v, 0) * a.aidf, 4) AS uef
FROM sumrd sr
JOIN aidf a ON sr.qid = a.qid
LEFT JOIN nqcv n ON sr.qid = n.qid
ORDER BY sr.qid"""
    if name == "qpp_rsd":
        # P6 RSD (qpp/RSDSpecificity.java:23-51) with the SQL-expressible
        # md5 seeded shuffle (operators/qpp._permutation "md5" — the SAME
        # construction, so the operator and this oracle sample
        # identically): 10 samples per query, each = the top-100 run
        # permuted by md5('314152:s:qid:doc_id') truncated to
        # min(20, n); estimate = var_pop(sample scores) * avgidf_nqc
        # (OOV df -> 1, BaseIDFSpecificity.idfs()); similarity =
        # RBO(original, sample, k=n, p=0.9); rsd = mean(sim * est).
        str_s = D["STR"]("t.s")
        str_doc = D["STR"]("r.doc_id")
        samples = ", ".join(f"({s})" for s in range(10))
        return base + f""",
run AS (SELECT qid, doc_id, rank, score FROM ranked WHERE rank <= 100),
nq AS (SELECT qid, CAST(COUNT(*) AS BIGINT) AS n FROM run GROUP BY qid),
samples AS (SELECT s FROM (VALUES {samples}) AS t(s)),
perm AS (
  SELECT r.qid, t.s, r.doc_id, r.score, r.rank,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY r.qid, t.s
           ORDER BY md5('314152:' || {str_s} || ':' || r.qid || ':'
                        || {str_doc}), r.doc_id
         ) AS INT) AS srank
  FROM run r CROSS JOIN samples t
),
samp AS (
  SELECT p.qid, p.s, p.doc_id, p.score, p.srank
  FROM perm p JOIN nq ON p.qid = nq.qid
  WHERE p.srank <= LEAST(20, nq.n)
),
vest AS (SELECT qid, s, var_pop(score) AS v FROM samp GROUP BY qid, s),
depths AS (SELECT {D['EXPLODE'](D['SEQ']('1', '100'))} AS d),
ov AS (
  SELECT r.qid, sa.s, d.d, CAST(COUNT(*) AS DOUBLE) AS ov
  FROM run r
  JOIN samp sa ON r.qid = sa.qid AND r.doc_id = sa.doc_id
  JOIN depths d ON r.rank <= d.d AND sa.srank <= d.d
  GROUP BY r.qid, sa.s, d.d
),
qsd AS (
  SELECT nq.qid, t.s, d.d
  FROM nq CROSS JOIN samples t JOIN depths d ON d.d <= nq.n
),
sims AS (
  SELECT qsd.qid, qsd.s,
         0.1 * SUM(POWER(0.9, qsd.d - 1) * COALESCE(ov.ov, 0) / qsd.d)
           AS sim
  FROM qsd LEFT JOIN ov
    ON qsd.qid = ov.qid AND qsd.s = ov.s AND qsd.d = ov.d
  GROUP BY qsd.qid, qsd.s
),
aidf AS (
  SELECT q.qid,
         AVG(ln(CAST(g.n_docs AS DOUBLE)
                / GREATEST(COALESCE(s.df, 0), 1))) AS aidf
  FROM qterms q LEFT JOIN tstats s ON q.term = s.term CROSS JOIN g
  GROUP BY q.qid
)
SELECT m.qid,
       round(SUM(m.sim * COALESCE(v.v, 0) * a.aidf) / 10, 4) AS rsd
FROM sims m
JOIN vest v ON m.qid = v.qid AND m.s = v.s
JOIN aidf a ON m.qid = a.qid
GROUP BY m.qid ORDER BY m.qid"""
    if name == "token_stats":
        ws = D["SPLIT_WS"]("text")
        bpe = D["REGEX_ALL"]("text", "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]")
        return f"""
SELECT doc_id,
       CAST({D['LEN'](ws)} AS BIGINT) AS n_ws_tokens,
       CAST({D['LEN'](bpe)} AS BIGINT) AS n_bpe_tokens,
       CAST(length(text) AS BIGINT) AS n_chars2
FROM documents ORDER BY doc_id"""
    if name == "ann_lsh_topk":
        # multi-table random-hyperplane LSH (operators/pipeline.py
        # lsh_bucket): per table t, bit_i = [round(v . g_ti, 6) >= 0]
        # over seeded Gaussian directions (random_hyperplanes — the SAME
        # planes, inlined here as literals); bucket packs the table id
        # above the sign bits; candidates = pairs sharing ANY table's
        # bucket, deduped, then exact cosine
        tables = _lsh_bucket_tables_sql(d)
        dot_ab = D["DOT"]("a.embedding", "b.embedding")
        dot_aa = D["DOT"]("a.embedding", "a.embedding")
        dot_bb = D["DOT"]("b.embedding", "b.embedding")
        return f"""
WITH bk AS (
  {tables}
),
cand AS (
  SELECT DISTINCT x.vec_id AS qvec, y.vec_id AS nvec
  FROM bk x JOIN bk y ON x.bucket = y.bucket AND x.vec_id <> y.vec_id
  WHERE x.vec_id < 20
),
sims AS (
  SELECT c.qvec, c.nvec,
         {dot_ab} / (sqrt({dot_aa}) * sqrt({dot_bb})) AS sim
  FROM cand c
  JOIN embeddings a ON a.vec_id = c.qvec
  JOIN embeddings b ON b.vec_id = c.nvec
),
ranked AS (
  SELECT qvec, nvec,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY qvec ORDER BY round(sim, 6) DESC, nvec ASC
         ) AS INT) AS rank,
         round(sim, 4) AS sim
  FROM sims
)
SELECT qvec, nvec, rank, sim FROM ranked WHERE rank <= 5
ORDER BY qvec, rank"""
    if name == "ann_ivf_topk":
        # IVF with the data-independent seeded quantizer (operators/
        # pipeline.ivf_centroids — the SAME centroids, inlined as
        # literals): every vector routes to its argmax-dot list (dot
        # rounded to 6, ties to the lower list id), queries (vec_id <
        # 20) probe their 4 nearest of 16 lists, exact cosine within
        # probed lists only
        from .operators.pipeline import ivf_centroids  # noqa: PLC0415

        n_lists, nprobe = 16, 4
        C = ivf_centroids(64, n_lists)
        arr = _sql_array(d)
        lists = "\n  UNION ALL ".join(
            f"SELECT vec_id, CAST({li} AS BIGINT) AS l, "
            f"round({D['DOT']('embedding', arr(C[li]))}, 6) AS simc "
            f"FROM embeddings"
            for li in range(n_lists)
        )
        dot_ab = D["DOT"]("a.embedding", "b.embedding")
        dot_aa = D["DOT"]("a.embedding", "a.embedding")
        dot_bb = D["DOT"]("b.embedding", "b.embedding")
        return f"""
WITH lists AS (
  {lists}
),
assign AS (
  SELECT vec_id, l,
         ROW_NUMBER() OVER (
           PARTITION BY vec_id ORDER BY simc DESC, l ASC
         ) AS pr
  FROM lists
),
inv AS (SELECT vec_id, l FROM assign WHERE pr = 1),
probe AS (SELECT vec_id, l FROM assign WHERE pr <= {nprobe}
          AND vec_id < 20),
cand AS (
  SELECT p.vec_id AS qvec, i.vec_id AS nvec
  FROM probe p JOIN inv i ON p.l = i.l AND i.vec_id <> p.vec_id
),
sims AS (
  SELECT c.qvec, c.nvec,
         {dot_ab} / (sqrt({dot_aa}) * sqrt({dot_bb})) AS sim
  FROM cand c
  JOIN embeddings a ON a.vec_id = c.qvec
  JOIN embeddings b ON b.vec_id = c.nvec
),
ranked AS (
  SELECT qvec, nvec,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY qvec ORDER BY round(sim, 6) DESC, nvec ASC
         ) AS INT) AS rank,
         round(sim, 4) AS sim
  FROM sims
)
SELECT qvec, nvec, rank, sim FROM ranked WHERE rank <= 5
ORDER BY qvec, rank"""
    if name == "dedup_embedding":
        # embedding-cosine near-duplicate pairs (operators/pipeline.py
        # embedding_near_dup): candidates from the SAME multi-table
        # random-hyperplane buckets as ann_lsh_topk, unordered pairs
        # deduped across tables (id_a < id_b), then exact cosine >=
        # 0.35. The threshold is sized to the synthetic table's
        # near-random cosine range (max off-diagonal ~0.51); the nearest
        # pair sits ~4e-5 from the cut at both test SFs, >> any
        # summation-order float noise, so the raw-value filter is
        # engine-stable.
        tables = _lsh_bucket_tables_sql(d)
        dot_ab = D["DOT"]("a.embedding", "b.embedding")
        dot_aa = D["DOT"]("a.embedding", "a.embedding")
        dot_bb = D["DOT"]("b.embedding", "b.embedding")
        return f"""
WITH bk AS (
  {tables}
),
cand AS (
  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
  FROM bk x JOIN bk y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
),
sims AS (
  SELECT c.id_a, c.id_b,
         {dot_ab} / (sqrt({dot_aa}) * sqrt({dot_bb})) AS cosine
  FROM cand c
  JOIN embeddings a ON a.vec_id = c.id_a
  JOIN embeddings b ON b.vec_id = c.id_b
)
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
       round(cosine, 4) AS cosine
FROM sims WHERE cosine >= 0.35
ORDER BY id_a, id_b"""
    if name == "induce_scores":
        # Q8 ScoreInducer: recompute scores under ANOTHER model (LM-JM)
        # for exactly the (qid, doc) pairs of the BM25 top-10 run — pairs
        # with no term overlap under the new model induce 0
        return base + f""",
run AS (SELECT qid, doc_id, rank FROM ranked WHERE rank <= 10),
ind AS (
  SELECT qid, doc_id, SUM(qtf * ({LMJM})) AS s
  FROM hits CROSS JOIN g GROUP BY qid, doc_id
)
SELECT r.qid, r.doc_id, r.rank,
       round(COALESCE(i.s, 0), 4) AS ind_score
FROM run r LEFT JOIN ind i ON r.qid = i.qid AND r.doc_id = i.doc_id
ORDER BY r.qid, r.rank"""
    if name == "run_rank_distance":
        # C9 DataFrame form over two real runs (BM25 vs LM-JM top-10),
        # reproducing the reference's position-in-SORTED-BY-ID-B quirk
        return base + f""",
scored2 AS (
  SELECT qid, doc_id, SUM(qtf * ({LMJM})) AS score
  FROM hits CROSS JOIN g GROUP BY qid, doc_id
),
ranked2 AS (
  SELECT qid, doc_id,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY qid ORDER BY round(score, 4) DESC, doc_id ASC
         ) AS INT) AS rank
  FROM scored2
),
ra AS (SELECT qid, doc_id, rank - 1 AS pos_a FROM ranked WHERE rank <= 10),
rb AS (
  SELECT qid, doc_id,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY qid ORDER BY doc_id
         ) AS INT) - 1 AS pos_b
  FROM ranked2 WHERE rank <= 10
),
nq AS (SELECT qid, CAST(COUNT(*) AS DOUBLE) AS n FROM ra GROUP BY qid)
SELECT ra.qid,
       round(sqrt(SUM(POWER((pos_a - pos_b) / nq.n, 2)) / MAX(nq.n)), 4)
         AS rank_dist
FROM ra JOIN rb ON ra.qid = rb.qid AND ra.doc_id = rb.doc_id
JOIN nq ON ra.qid = nq.qid
GROUP BY ra.qid ORDER BY ra.qid"""
    if name == "run_rbo":
        # C8 rank-biased overlap (p=.9, depth 10) between the BM25 and
        # LM-JM top-10 lists: rbo = (1-p) Σ_d p^(d-1) · |A_d ∩ B_d| / d
        return base + f""",
scored2 AS (
  SELECT qid, doc_id, SUM(qtf * ({LMJM})) AS score
  FROM hits CROSS JOIN g GROUP BY qid, doc_id
),
ranked2 AS (
  SELECT qid, doc_id,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY qid ORDER BY round(score, 4) DESC, doc_id ASC
         ) AS INT) AS rank
  FROM scored2
),
ra AS (SELECT qid, doc_id, rank FROM ranked WHERE rank <= 10),
rb AS (SELECT qid, doc_id, rank FROM ranked2 WHERE rank <= 10),
depths AS (SELECT {D['EXPLODE'](D['SEQ']('1', '10'))} AS d),
ov AS (
  SELECT a.qid, d.d, CAST(COUNT(*) AS DOUBLE) AS ov
  FROM ra a
  JOIN rb b ON a.qid = b.qid AND a.doc_id = b.doc_id
  JOIN depths d ON a.rank <= d.d AND b.rank <= d.d
  GROUP BY a.qid, d.d
),
qd AS (
  SELECT q.qid, d.d FROM (SELECT DISTINCT qid FROM ra) q CROSS JOIN depths d
)
SELECT qd.qid,
       round(0.1 * SUM(POWER(0.9, qd.d - 1) * COALESCE(ov.ov, 0) / qd.d), 4)
         AS rbo
FROM qd LEFT JOIN ov ON qd.qid = ov.qid AND qd.d = ov.d
GROUP BY qd.qid ORDER BY qd.qid"""
    if name == "retrieval_events_join":
        # cross-source enrichment: BM25 top-10 joined with per-doc event
        # volume (deterministic user_id -> doc_id mapping mod n_docs)
        return base + """,
run AS (SELECT qid, doc_id, rank FROM ranked WHERE rank <= 10),
ev AS (
  SELECT CAST(user_id % g.n_docs AS BIGINT) AS doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         round(SUM(value), 4) AS sum_value
  FROM events CROSS JOIN g GROUP BY CAST(user_id % g.n_docs AS BIGINT)
)
SELECT r.qid, r.doc_id, r.rank,
       COALESCE(e.n_events, 0) AS n_events,
       COALESCE(e.sum_value, 0) AS sum_value
FROM run r LEFT JOIN ev e ON r.doc_id = e.doc_id
ORDER BY r.qid, r.rank"""
    if name == "events_sessionize":
        ep = D["EPOCH"]("ts")
        return f"""
WITH e AS (
  SELECT user_id, event_id, event_type, value, {ep} AS es FROM events
),
gaps AS (
  SELECT user_id, event_id, event_type, value, es,
         CASE WHEN es - LAG(es) OVER (
           PARTITION BY user_id ORDER BY es, event_id
         ) > 1800 OR LAG(es) OVER (
           PARTITION BY user_id ORDER BY es, event_id
         ) IS NULL THEN 1 ELSE 0 END AS new_sess
  FROM e
),
sess AS (
  SELECT user_id, event_id, value, es,
         SUM(new_sess) OVER (
           PARTITION BY user_id ORDER BY es, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS session_idx
  FROM gaps
)
SELECT user_id, CAST(session_idx AS INT) AS session_idx,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MAX(es) - MIN(es) AS BIGINT) AS duration_sec,
       round(SUM(value), 4) AS sum_value
FROM sess GROUP BY user_id, session_idx
ORDER BY user_id, session_idx"""
    if name == "events_hourly":
        return """
SELECT date_trunc('hour', ts) AS hour, event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       round(AVG(value), 4) AS avg_value,
       round(SUM(value), 4) AS sum_value
FROM events GROUP BY date_trunc('hour', ts), event_type
ORDER BY hour, event_type"""
    raise KeyError(name)


QUERY_NAMES = [
    "doc_lengths", "term_df", "global_stats",
    "bm25_topk", "lmdir_topk", "lmjm_topk", "tfidf_topk", "trec_run",
    "eval_metrics", "eval_summary", "qpp_nqc_avgidf", "bigram_top100",
    "text_quality", "lang_id", "doc_fingerprint",
    "dedup_exact_prefix", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "dedup_simhash", "ann_cosine_topk", "events_hourly",
    "qpp_maxidf", "token_stats", "ann_lsh_topk", "ann_ivf_topk",
    "events_sessionize",
    "induce_scores", "run_rank_distance", "run_rbo",
    "retrieval_events_join",
]


def _register_views(spark: SparkSession, sf_dir: str) -> None:
    import os

    for t in _TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            spark.read.parquet(p).createOrReplaceTempView(t)


def _bmw_fixture(spark: SparkSession, sf_dir: str):
    """Shared preamble of the operator-backed contract rows: the sf
    documents table, a simple-analyzer row-level index, its 4-segment
    compact form, the canonical QUERYSET frame, and its compiled
    terms. ONE definition — every SQL twin renders the same docs/
    index/queryset CTEs, so the fixture must not be able to drift
    between rows. Returns (docs, idx, compact, qdf, qt)."""
    from .operators.index import build_index
    from .operators.postings import CompactIndex
    from .operators.retrieval import compile_queries

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    idx = build_index(docs, analyzer="simple", cache=False)
    compact = CompactIndex.from_index(idx, n_segments=4)
    qdf = spark.createDataFrame(QUERYSET, "qid string, qtext string")
    qt = compile_queries(qdf, "simple")
    return docs, idx, compact, qdf, qt


def _fixture_run(compact, qt, k: int) -> DataFrame:
    """The canonical Block-Max run of the operator-backed rows:
    ``rank_round=4`` (the oracle's own total order applied inside the
    scatter-gather selection) projected to the RUN-CTE shape
    (qid, doc_id, rank, round(score, 4))."""
    from pyspark.sql import functions as F

    from .operators.postings import bmw_search

    return bmw_search(compact, qt, k=k, rank_round=4).select(
        "qid", "doc_id", "rank", F.round("score", 4).alias("score")
    )


def _synthetic_qrels(docs: DataFrame, qdf: DataFrame) -> DataFrame:
    """The contract rows' shared deterministic qrels: rel = 3/2/1 when
    (doc_id + qnum) % 10 == 0/1/2, else unjudged — the exact formula
    the SQL twins inline as their QRELS CTE, defined once so the
    operator rows and their oracles cannot drift."""
    from pyspark.sql import functions as F

    m = (F.col("doc_id") + F.substring("qid", 2, 10).cast("int")) % 10
    return (
        docs.select("doc_id").crossJoin(qdf.select("qid"))
        .withColumn(
            "rel",
            F.when(m == 0, 3).when(m == 1, 2).when(m == 2, 1).otherwise(0),
        )
        .filter(F.col("rel") > 0)
        .select("qid", "doc_id", "rel")
    )


def _bmw_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-postings contract: delta+varint encode the simple-
    analyzer index into doc-range segments and answer the QUERYSET with
    the segmented Block-Max path (operators/postings.bmw_search). Must
    reproduce the ``bm25_topk`` oracle rows exactly — same ranking rule
    (rounded score desc, doc_id asc), applied INSIDE the scatter-gather
    selection via ``rank_round=4`` so the top-10 is exact by
    construction under the oracle's own total order (no headroom-k
    re-rank; ADVICE r3 #1)."""
    from pyspark.sql import functions as F

    from .operators.postings import bmw_search

    docs, idx, compact, qdf, qt = _bmw_fixture(spark, sf_dir)
    run = bmw_search(compact, qt, k=10, rank_round=4)
    return run.select(
        "qid", "doc_id",
        F.col("rank").cast("int").alias("rank"),
        F.round("score", 4).alias("score"),
    )


def _incremental_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-writer contract: index the documents table through
    ``streaming.SegmentedIndexWriter`` — three doc_id-ordered appends
    with a compaction folded between them (so the live index mixes a
    compacted generation with a fresh append) — then answer the QUERYSET
    with the segmented Block-Max path over ``writer.load()``.

    ``keys=("doc_id",)`` plus contiguous doc_id-range batches appended
    in order make the writer's dense base-offset id assignment reproduce
    the table's own ids, so the result must equal the ``bm25_topk``
    oracle rows exactly (same ``rank_round=4`` total order). This gives
    the IndexWriter lifecycle (reference ``indexing/MsMarcoIndexer.java:
    49-59``) a value-level oracle, not just the pytest equality suite.

    The 70-row result is materialized before the scratch index dir is
    deleted (the loaded CompactIndex reads those parquet files lazily).
    """
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from .operators.postings import bmw_search
    from .operators.retrieval import compile_queries
    from .streaming.incremental import BuildConfig, SegmentedIndexWriter

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n = docs.count()
    cut1, cut2 = n // 3, (2 * n) // 3
    tmp = tempfile.mkdtemp(prefix="lms_incr_contract_")
    try:
        w = SegmentedIndexWriter(
            spark, tmp, config=BuildConfig(analyzer="simple"),
            keys=("doc_id",),
        )
        w.append(docs.filter(F.col("doc_id") < cut1))
        w.append(
            docs.filter(
                (F.col("doc_id") >= cut1) & (F.col("doc_id") < cut2)
            )
        )
        w.compact()
        w.append(docs.filter(F.col("doc_id") >= cut2))
        compact = w.load()
        qdf = spark.createDataFrame(QUERYSET, "qid string, qtext string")
        qt = compile_queries(qdf, "simple")
        run = bmw_search(compact, qt, k=10, rank_round=4).select(
            "qid", "doc_id",
            F.col("rank").cast("int").alias("rank"),
            F.round("score", 4).alias("score"),
        )
        rows = run.collect()
        return spark.createDataFrame(rows, run.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _stream_hourly_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-analytics contract: replay the events table through the
    WATERMARKED streaming aggregation (``streaming/analytics.py
    hourly_counts`` — readStream source, 2h watermark, 1h event-time
    windows, append mode, drain-sentinel flush) and require the emitted
    rows to equal the batch ``events_hourly`` DuckDB oracle exactly.
    This pins the bounded-replay == batch contract of the streaming
    surface at value level, including the tz-free NTZ<->instant
    conversions (window boundaries must land on the naive hour in ANY
    session timezone)."""
    from pyspark.sql import functions as F

    from .streaming.analytics import (
        cleanup_dirs,
        hourly_backfill,
        scratch_dirs,
    )

    src, sink, ckpt = scratch_dirs("lms_streamh")
    try:
        spark.read.parquet(f"{sf_dir}/events.parquet").write.mode(
            "overwrite"
        ).parquet(src + "/batch0")
        out = (
            hourly_backfill(spark, src, sink, ckpt)
            # the operator's persisted output is TIMESTAMP_NTZ
            # (timezone-free by design); the batch oracle's
            # date_trunc('hour', ts) renders as TIMESTAMP, so align
            # the type here exactly like the events_hourly row does
            .withColumn("hour", F.col("hour").cast("timestamp"))
            .orderBy("hour", "event_type")
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        cleanup_dirs(src, sink, ckpt)


def _stream_sessionize_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-analytics contract: replay the events table through the
    CUSTOM STATEFUL operator (``streaming/analytics.py sessionize`` —
    ``applyInPandasWithState``, per-user buffered state, event-time
    timeouts, drain-sentinel flush) and require the emitted sessions to
    equal the batch ``events_sessionize`` DuckDB oracle exactly: same
    per-user session split, same monotone ``session_idx`` numbering,
    same durations and rounded sums."""
    from .streaming.analytics import (
        cleanup_dirs,
        scratch_dirs,
        sessionize_backfill,
    )

    src, sink, ckpt = scratch_dirs("lms_streams")
    try:
        spark.read.parquet(f"{sf_dir}/events.parquet").write.mode(
            "overwrite"
        ).parquet(src + "/batch0")
        out = sessionize_backfill(spark, src, sink, ckpt).orderBy(
            "user_id", "session_idx"
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        cleanup_dirs(src, sink, ckpt)


def make_spark_query(name: str) -> Callable[[SparkSession, str], DataFrame]:
    if name == "bmw_topk":
        return _bmw_topk_query
    if name == "incremental_topk":
        return _incremental_topk_query

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _register_views(spark, sf_dir)
        return spark.sql(build_sql(name, "spark"))

    run.__name__ = f"query_{name}"
    return run


def _dedup_embedding_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup contract: run the real DataFrame
    operator (``operators/pipeline.embedding_near_dup`` — pandas-UDF
    ``lsh_bucket`` signatures, bucket equi-join candidate pairs, exact
    ``_cos`` filter) against the SQL oracle's inlined-plane twin. Unlike
    ``ann_lsh_topk`` (dialect-templated SQL on both sides), this row
    value-level-verifies the numpy bucketing and the fold-based cosine
    themselves. Threshold rationale in ``build_sql("dedup_embedding")``.
    """
    from pyspark.sql import functions as F

    from .operators.pipeline import embedding_near_dup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pairs = embedding_near_dup(
        emb, min_cosine=0.35, n_bits=8, n_tables=4,
        id_col="vec_id", vec_col="embedding",
    )
    return pairs.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.round("cosine", 4).alias("cosine"),
    ).orderBy("id_a", "id_b")


def _hash_split_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic-split contract: the real
    ``operators/pipeline.hash_split`` (default .9/.05/.05 weights, salt
    "split") vs the same hex-threshold CASE rendered for DuckDB —
    value-level pin that the operator's Python-computed cumulative
    thresholds and the md5-hex string compare agree across engines."""
    from .operators.pipeline import hash_split

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id"
    )
    return hash_split(docs).select("doc_id", "split").orderBy("doc_id")


def _dedup_components_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-GROUPS contract: the iterative alternating large-star /
    small-star connected-components operator
    (``operators/pipeline.connected_components`` -> ``dedup_groups``,
    Kiveris et al. SoCC'14) over the banded-minhash candidate pairs
    (same construction as the ``dedup_minhash_lsh`` row), vs the
    recursive-CTE min-reachable-node closure in DuckDB. Value-level
    oracle for the star-contraction loop — the step that turns pair-
    emitting dedup into keep/drop clusters."""
    from .operators.pipeline import dedup_groups, minhash_lsh_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    pairs = minhash_lsh_pairs(docs, n_hashes=8, rows_per_band=2,
                              shingle_n=3)
    return dedup_groups(pairs).orderBy("doc_id")


def _qpp_rsd_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded-sampling QPP contract (P6 RSD, ``qpp/RSDSpecificity.java:
    23-51``): run the REAL operator chain — simple-analyzer index ->
    segmented Block-Max top-100 (rank_round=4, the oracle's own total
    order) -> ``qpp.query_idf_stats`` -> ``qpp.rsd`` with the
    SQL-expressible md5 permutation — against the dual-dialect SQL twin
    in ``build_sql("qpp_rsd")``. This value-level-verifies the
    shuffle-sample machinery (sampled truncation, per-sample NQC
    estimate, RBO similarity, the avgidf_nqc OOV rule) that previously
    had only pytest coverage."""
    from pyspark.sql import functions as F

    from .operators.qpp import query_idf_stats, rsd

    docs, idx, compact, qdf, qt = _bmw_fixture(spark, sf_dir)
    run = _fixture_run(compact, qt, k=100)
    stats = query_idf_stats(qt, idx.term_stats, idx.stats.n_docs)
    out = rsd(
        run, stats, k=50, num_samples=10, sample_size=20,
        permute="md5",
    )
    return out.select(
        "qid", F.round("rsd", 4).alias("rsd")
    ).orderBy("qid")


def _qpp_uef_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded-sampling QPP contract #2 (P5 UEF, ``qpp/UEFSpecificity.
    java:29-82``): run the REAL operator chain — simple-analyzer index
    -> segmented Block-Max top-100 (rank_round=4) -> ``qpp.nqc`` base
    estimate -> ``qpp.uef`` with the md5 permutation, which internally
    executes the full reference pipeline (sampled runs ->
    ``top_docs_term_stats`` -> ``rm_conditional_weights`` ->
    ``kl_div_rerank`` -> ``rank_distance_df``) — against the reduced
    SQL twin in ``build_sql("qpp_uef")`` (reduction rationale there:
    the KL rerank preserves sample membership, and the C9
    sorted-by-doc-id quirk makes rank_distance read membership only,
    so the rerank scores cancel out of the value). A bug anywhere in
    the chain that perturbs sampling, membership, rank_distance, or
    the NQC base flips this row."""
    from pyspark.sql import functions as F

    from .operators.qpp import nqc, query_idf_stats, uef

    docs, idx, compact, qdf, qt = _bmw_fixture(spark, sf_dir)
    run = _fixture_run(compact, qt, k=100)
    stats = query_idf_stats(qt, idx.term_stats, idx.stats.n_docs)
    base = nqc(run, stats, k=50)
    out = uef(
        idx, run, base, "nqc", num_samples=10, sample_size=20,
        permute="md5",
    )
    return out.select(
        "qid", F.round("uef", 4).alias("uef")
    ).orderBy("qid")


def _fdbk_kl_rerank_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feedback-chain contract (F1 ``top_docs_term_stats`` + F3
    ``rm_conditional_weights`` + F4 ``kl_div_rerank``, reference
    ``fdbk/RelevanceModelConditional.java:30-55`` +
    ``fdbk/KLDivReranker.java:29-55``): run the REAL DataFrame
    operators over the Block-Max top-100 and compare value-level
    against the dual-dialect SQL twin in
    ``build_sql("fdbk_kl_rerank")``. Complements ``qpp_uef``, whose
    oracle reduction deliberately cancels these values out — between
    the two rows the full UEF pipeline is value-verified end-to-end.
    ``rank_round=6`` on both sides (the ``bmw_topk`` device) so the
    rerank ordering is exact under a rounded total order."""
    from pyspark.sql import functions as F

    from .operators.feedback import (
        kl_div_rerank,
        rm_conditional_weights,
        top_docs_term_stats,
    )

    docs, idx, compact, qdf, qt = _bmw_fixture(spark, sf_dir)
    run = _fixture_run(compact, qt, k=100)
    stats = top_docs_term_stats(idx, run, num_top_docs=20)
    wts = rm_conditional_weights(stats)
    reranked = kl_div_rerank(stats, wts, run, rank_round=6)
    return reranked.filter(F.col("rank") <= 10).select(
        "qid", "doc_id", "rank", F.round("score", 4).alias("score")
    ).orderBy("qid", "rank")


def _fdbk_rm1_expand_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RM1/RLM-expansion contract (F2 ``rm1_iid_weights`` + F5
    ``rlm_expand_query``, reference ``fdbk/RelevanceModelIId.java:
    66-175`` — the most-hit feedback path): run the REAL operators over
    the Block-Max top-100 and compare the weighted expanded-query table
    value-level against the SQL twin in
    ``build_sql("fdbk_rm1_expand")``. ``rank_round=6`` on the
    expansion cutoff on both sides so the top-20 membership is exact
    under a rounded total order."""
    from pyspark.sql import functions as F

    from .operators.feedback import (
        rlm_expand_query,
        rm1_iid_weights,
        top_docs_term_stats,
    )

    docs, idx, compact, qdf, qt = _bmw_fixture(spark, sf_dir)
    run = _fixture_run(compact, qt, k=100)
    stats = top_docs_term_stats(idx, run, num_top_docs=20)
    wts = rm1_iid_weights(stats, qt)
    expanded = rlm_expand_query(idx, stats, wts, qt, rank_round=6)
    return expanded.select(
        "qid", "term", "qtf", F.round("weight", 6).alias("weight")
    ).orderBy("qid", "term")


def _qpp_cumnqc_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 CumulativeNQC contract (``qpp/CumulativeNQC.java``): the real
    prefix-variance window operator over the Block-Max top-50 vs the
    SQL twin in ``build_sql("qpp_cumnqc")`` (min(i, n) clamp rendered
    as the mult weighting on the last in-range prefix)."""
    from pyspark.sql import functions as F

    from .operators.qpp import cumulative_nqc, query_idf_stats

    docs, idx, compact, qdf, qt = _bmw_fixture(spark, sf_dir)
    run = _fixture_run(compact, qt, k=100)
    stats = query_idf_stats(qt, idx.term_stats, idx.stats.n_docs)
    out = cumulative_nqc(run, stats, k=50)
    return out.select(
        "qid", F.round("cumnqc", 6).alias("cumnqc")
    ).orderBy("qid")


def _srlm_rerank_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRLM contract (F8 ``srlm_fit`` + F9 ``srlm_rerank``, reference
    ``retrieval/SupervisedRLM.java:151-270``): the real operators — LM
    doc vectors (F7), the raw-whitespace-qterm coocc fit over the
    synthetic qrels with the top-5 prune quirk, and the dot-product
    rerank of the Block-Max top-100 — vs the full SQL twin in
    ``build_sql("srlm_rerank")``. ``rank_round=6`` on both the prune
    and the rerank ordering. First value-level oracle for the SRLM
    family."""
    from pyspark.sql import functions as F

    from .operators.feedback import lm_doc_vectors
    from .operators.srlm import srlm_fit, srlm_rerank

    docs, idx, compact, qdf, qt = _bmw_fixture(spark, sf_dir)
    run = _fixture_run(compact, qt, k=100)
    qrels = _synthetic_qrels(docs, qdf)
    vecs = lm_doc_vectors(idx)
    model = srlm_fit(vecs, qdf, qrels, num_top_terms=5, rank_round=6)
    reranked = srlm_rerank(run, qdf, model, vecs, rank_round=6)
    return reranked.filter(F.col("rank") <= 10).select(
        "qid", "doc_id", "rank", F.round("score", 6).alias("score")
    ).orderBy("qid", "rank")


def _qpp_variant_spec_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 VariantSpecificity contract (``qpp.variant_specificity``,
    reference ``qpp/VariantSpecificity.java``): the REAL composition —
    per deterministic variant (VARIANTSET), a Block-Max retrieval, an
    NQC estimate over the variant's own terms (P1), and a distributed
    top-10 Jaccard similarity against the base run (C10,
    ``correlation.jaccard_overlap_df``) — combined with λ=0.5 against
    the base NQC, vs the full SQL twin in
    ``build_sql("qpp_variant_spec")``. First value-level oracle for the
    P7/P8 reference-set combine and the C10 distributed form."""
    from pyspark.sql import functions as F

    from .operators.correlation import jaccard_overlap_df
    from .operators.postings import bmw_search
    from .operators.qpp import nqc, query_idf_stats, variant_specificity
    from .operators.retrieval import compile_queries

    docs, idx, compact, qdf, qt = _bmw_fixture(spark, sf_dir)
    base_run = _fixture_run(compact, qt, k=100)
    stats = query_idf_stats(qt, idx.term_stats, idx.stats.n_docs)
    base_nqc = nqc(base_run, stats, k=50)
    refs = None
    for vid in (1, 2):
        vqdf = spark.createDataFrame(
            [(q, t) for q, v, t in VARIANTSET if v == vid],
            "qid string, qtext string",
        )
        vqt = compile_queries(vqdf, "simple")
        vrun = bmw_search(compact, vqt, k=100, rank_round=4).select(
            "qid", "doc_id", "rank", F.round("score", 4).alias("score")
        )
        vstats = query_idf_stats(vqt, idx.term_stats, idx.stats.n_docs)
        vest = nqc(vrun, vstats, k=50)
        sim = jaccard_overlap_df(base_run, vrun, k=10)
        r = vest.join(sim, "qid").select(
            "qid", F.col("jaccard").alias("sim"), F.col("nqc").alias("est")
        )
        refs = r if refs is None else refs.unionByName(r)
    out = variant_specificity(base_nqc, "nqc", refs, lam=0.5)
    return out.select(
        "qid", F.round("est", 6).alias("est")
    ).orderBy("qid")


def _stoch_swap_perms_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H5 contract (``stochastic.swap_permutations``, reference
    ``stochastic_qpp/RankSwapper.java:19-141`` samplePermutations): the
    real applyInPandas permutation enumerator over the Block-Max top-10
    with qrels-filled rel labels, vs the SQL twin in
    ``build_sql("stoch_swap_perms")``. Deterministic by construction
    (the full permutation set, no sampling), so it value-pins the swap
    mechanics that the seeded samplers (H5 sample/shuffle, H7) build
    on: scores stay attached to ranks, docs move, identity included,
    rank 1 always swappable, (r, nr) enumeration order."""

    from .operators.eval import fill_rel
    from .operators.stochastic import swap_permutations

    docs, idx, compact, qdf, qt = _bmw_fixture(spark, sf_dir)
    run = _fixture_run(compact, qt, k=10)
    qrels = _synthetic_qrels(docs, qdf)
    filled = fill_rel(run, qrels)
    perms = swap_permutations(filled, top_doc_always_swapped=True,
                              min_rel=1)
    return perms.select(
        "qid", "perm_id", "doc_id", "rank", "score"
    ).orderBy("qid", "perm_id", "rank")


def _lmdir_mu_sweep_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3/E6 μ-sweep contract (``experiments.mu_sweep``, the reference's
    ``tokenization/bpe_msmarco.sh:29-63`` tuning loop): the REAL driver —
    one LM-Dirichlet ``search`` + ``compute_all`` per μ — vs the SQL
    twin in ``build_sql("lmdir_mu_sweep")``. ``rank_round=4`` pins the
    per-μ top-100 membership to the rounded total order on both sides;
    output is the per-μ computeAll summary row (rounded 4 in Spark)."""
    from pyspark.sql import functions as F

    from .operators.experiments import mu_sweep
    from .operators.index import build_index

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    idx = build_index(docs, analyzer="simple", cache=False)
    qdf = spark.createDataFrame(QUERYSET, "qid string, qtext string")
    # the synthetic qrels of QRELS_CTE, rendered as DataFrame ops
    qrels = _synthetic_qrels(docs, qdf)
    res = mu_sweep(idx, qdf, qrels, k=100, rank_round=4)
    rows = [
        (mu, s["map"], s["p_at_5"], s["ndcg_100"], s["recall_quirk"])
        for mu, s in sorted(res["summaries"].items())
    ]
    raw = spark.createDataFrame(
        rows,
        "mu double, map double, p_at_5 double, ndcg_100 double, "
        "recall_quirk double",
    )
    return raw.select(
        "mu",
        F.round("map", 4).alias("map"),
        F.round("p_at_5", 4).alias("p_at_5"),
        F.round("ndcg_100", 4).alias("ndcg_100"),
        # round-6, not 4: the quirk normalization lands on exact decimal
        # values (e.g. 3/4000 = 0.00075) where a 4-digit cut sits on the
        # rounding boundary and sum-order float noise flips it; the
        # value terminates at <= 6 decimals so the 6-digit cut is exact
        F.round("recall_quirk", 6).alias("recall_quirk"),
    ).orderBy("mu")


def _fdbk_rocchio_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rocchio contract (F7 ``lm_doc_vectors`` + F11 ``rocchio_expand``,
    reference Rocchio constants ``Constants.java:46-49``): the real
    operators over the Block-Max top-100 — top-20 docs as positive
    feedback, ranks 98-100 as negative — vs the full SQL twin in
    ``build_sql("fdbk_rocchio")``. Exercises the negative-centroid
    (γ) path and the positive-weight filter; ``rank_round=6`` on the
    expansion cutoff on both sides."""
    from pyspark.sql import functions as F

    from .operators.feedback import lm_doc_vectors, rocchio_expand
    from .operators.index import build_index
    from .operators.postings import CompactIndex, bmw_search
    from .operators.retrieval import compile_queries

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    idx = build_index(docs, analyzer="simple", cache=False)
    compact = CompactIndex.from_index(idx, n_segments=4)
    qdf = spark.createDataFrame(QUERYSET, "qid string, qtext string")
    qt = compile_queries(qdf, "simple").withColumn(
        "qtf", F.col("qtf").cast("double")
    )
    run = bmw_search(compact, qt, k=100, rank_round=4).select(
        "qid", "doc_id", "rank"
    )
    rel = run.filter(F.col("rank") <= 20).select("qid", "doc_id")
    neg = run.filter(F.col("rank") >= 98).select("qid", "doc_id")
    fdocs = rel.select("doc_id").union(neg.select("doc_id")).distinct()
    vecs = lm_doc_vectors(idx, doc_ids=fdocs)
    rel_vecs = rel.join(vecs, "doc_id").select("qid", "doc_id", "term", "w")
    neg_vecs = neg.join(vecs, "doc_id").select("qid", "doc_id", "term", "w")
    out = rocchio_expand(qt, rel_vecs, neg_vecs, rank_round=6)
    return out.select(
        "qid", "term", "qtf", F.round("weight", 6).alias("weight")
    ).orderBy("qid", "term")


def _qpp_eval_corr_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H1 QPP-evaluation-harness contract: the real operator chain —
    ``eval.per_query_metrics`` (AP) + ``qpp.nqc`` over the Block-Max
    top-100 and the synthetic qrels, correlated by the REAL driver-side
    kernels ``correlation.kendall_tau`` / ``pearson_r`` /
    ``spearman_rho`` (exactly what ``experiments.qpp_experiment``
    composes) — vs the SQL twin in ``build_sql("qpp_eval_corr")``.
    Inputs are pre-rounded (ap 4, nqc 6) on both sides so the
    correlations see identical vectors. First value-level oracle for
    the H-family harness and the C1/C2 correlation kernels."""
    import numpy as np
    from pyspark.sql import functions as F

    from .operators.correlation import kendall_tau, pearson_r, spearman_rho
    from .operators.eval import per_query_metrics
    from .operators.qpp import nqc, query_idf_stats

    docs, idx, compact, qdf, qt = _bmw_fixture(spark, sf_dir)
    run = _fixture_run(compact, qt, k=100)
    # the synthetic qrels of QRELS_CTE, rendered as DataFrame ops
    qrels = _synthetic_qrels(docs, qdf)
    metrics = per_query_metrics(run, qrels)
    stats = query_idf_stats(qt, idx.term_stats, idx.stats.n_docs)
    est = nqc(run, stats, k=50)
    rows = (
        metrics.select("qid", F.round("ap", 4).alias("x"))
        .join(est.select("qid", F.round("nqc", 6).alias("y")), "qid")
        .orderBy("qid")
        .collect()
    )
    gt = np.array([r["x"] for r in rows])
    pred = np.array([r["y"] for r in rows])
    out = [(
        round(float(kendall_tau(gt, pred)), 4),
        round(float(pearson_r(gt, pred)), 4),
        round(float(spearman_rho(gt, pred)), 4),
    )]
    return spark.createDataFrame(
        out, "kendall double, pearson double, spearman double"
    )


def _bm25_boosted_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 boosted-terms contract (``retrieval.score_contributions``
    ``weight`` column; reference ``retrieval/MsMarcoQuery.java`` boost
    path): the real engine search over precompiled terms carrying a
    deterministic per-term boost 1 + (len(term) % 3)·0.5, vs the SQL
    twin in ``build_sql("bm25_boosted_topk")``. ``rank_round=4`` pins
    the top-10 membership on both sides."""
    from pyspark.sql import functions as F

    from .operators.index import build_index
    from .operators.retrieval import compile_queries, search

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    idx = build_index(docs, analyzer="simple", cache=False)
    qdf = spark.createDataFrame(QUERYSET, "qid string, qtext string")
    qt = compile_queries(qdf, "simple").withColumn(
        "weight",
        F.lit(1.0) + (F.length("term") % 3).cast("double") * F.lit(0.5),
    )
    run = search(idx, None, model="bm25", k=10, precompiled_terms=qt,
                 rank_round=4)
    return run.select(
        "qid", "doc_id", "rank", F.round("score", 4).alias("score")
    ).orderBy("qid", "rank")


def _qpp_corr_pack_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3-C7 kernel contract: the REAL driver-side kernels
    (``correlation.rmse`` with the normalize-pred-only-when-max>1 quirk,
    ``pairwise_accuracy``, the three ``quantized_*`` metrics,
    ``sare``/``sarc``) over the H1 vectors (AP rounded 4 x NQC rounded
    6, qid-ordered), vs the full SQL twin in
    ``build_sql("qpp_corr_pack")``. Value-pins the min-max normalizer
    (C6), the 5-bucket quantizer clamp, and the stable-sort SARE
    positions that the pytest suite covers only against the pure-Python
    oracle."""
    import numpy as np
    from pyspark.sql import functions as F

    from .operators.correlation import (
        pairwise_accuracy,
        quantized_class_accuracy,
        quantized_sim,
        quantized_strict_match,
        rmse,
        sarc,
        sare,
    )
    from .operators.eval import per_query_metrics
    from .operators.qpp import nqc, query_idf_stats

    docs, idx, compact, qdf, qt = _bmw_fixture(spark, sf_dir)
    run = _fixture_run(compact, qt, k=100)
    qrels = _synthetic_qrels(docs, qdf)
    metrics = per_query_metrics(run, qrels)
    stats = query_idf_stats(qt, idx.term_stats, idx.stats.n_docs)
    est = nqc(run, stats, k=50)
    rows = (
        metrics.select("qid", F.round("ap", 4).alias("x"))
        .join(est.select("qid", F.round("nqc", 6).alias("y")), "qid")
        .orderBy("qid")
        .collect()
    )
    gt = np.array([r["x"] for r in rows])
    pred = np.array([r["y"] for r in rows])
    out = [(
        round(float(rmse(gt, pred)), 6),
        round(float(pairwise_accuracy(gt, pred)), 6),
        round(float(quantized_sim(gt, pred)), 6),
        round(float(quantized_strict_match(gt, pred)), 6),
        round(float(quantized_class_accuracy(gt, pred)), 6),
        round(float(sare(gt, pred)), 6),
        round(float(sarc(gt, pred)), 6),
    )]
    return spark.createDataFrame(
        out,
        "rmse double, pw_acc double, q_sim double, q_strict double, "
        "q_class double, sare double, sarc double",
    )


def _qpp_lambda_grid_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H2 contract (``experiments.grid_search_lambda``): the REAL grid
    driver — per lambda, the P7 ``variant_specificity`` combine over
    round-6 refs/base NQC, Kendall tau-b against round-4 AP via the real
    ``kendall_tau`` kernel — vs the full SQL twin in
    ``build_sql("qpp_lambda_grid")``. Pre-rounding both combine inputs
    makes the two-multiply-one-add combine bit-identical IEEE across
    engines, so the taus match exactly."""
    from pyspark.sql import functions as F

    from .operators.correlation import jaccard_overlap_df
    from .operators.eval import per_query_metrics
    from .operators.experiments import grid_search_lambda
    from .operators.postings import bmw_search
    from .operators.qpp import nqc, query_idf_stats
    from .operators.retrieval import compile_queries

    docs, idx, compact, qdf, qt = _bmw_fixture(spark, sf_dir)
    run = _fixture_run(compact, qt, k=100)
    stats = query_idf_stats(qt, idx.term_stats, idx.stats.n_docs)
    base_nqc = nqc(run, stats, k=50).select(
        "qid", F.round("nqc", 6).alias("nqc")
    )
    refs = None
    for vid in (1, 2):
        vqdf = spark.createDataFrame(
            [(q, t) for q, v, t in VARIANTSET if v == vid],
            "qid string, qtext string",
        )
        vqt = compile_queries(vqdf, "simple")
        vrun = bmw_search(compact, vqt, k=100, rank_round=4).select(
            "qid", "doc_id", "rank", F.round("score", 4).alias("score")
        )
        vstats = query_idf_stats(vqt, idx.term_stats, idx.stats.n_docs)
        vest = nqc(vrun, vstats, k=50)
        sim = jaccard_overlap_df(run, vrun, k=10)
        r = vest.join(sim, "qid").select(
            "qid",
            F.round(F.col("jaccard"), 6).alias("sim"),
            F.round(F.col("nqc"), 6).alias("est"),
        )
        refs = r if refs is None else refs.unionByName(r)
    qrels = _synthetic_qrels(docs, qdf)
    metrics = per_query_metrics(run, qrels).select(
        "qid", F.round("ap", 4).alias("ap")
    )
    res = grid_search_lambda(
        base_nqc, "nqc", refs, metrics, "ap",
        lambdas=(0.0, 0.25, 0.5, 0.75, 1.0),
    )
    rows = [(lam, round(t, 4)) for lam, t in sorted(res["taus"].items())]
    return spark.createDataFrame(
        rows, "lam double, tau double"
    ).orderBy("lam")


def _srlm_knn_rerank_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10+F10 contract (``srlm.knn_query_search`` +
    ``srlm.knn_centroid_rerank``, reference
    ``retrieval/KNNRelModel.java:56-128``): a real queries-as-documents
    LM-Dirichlet index over KNNTRAINSET, the real KNN neighbor search
    (top-2, sims sum-normalized then rounded 6), and the real centroid
    rerank (L2-normalized sim-weighted rel-doc LM vectors, dot-product
    rescore) over the BM25 top-20, vs the full SQL twin in
    ``build_sql("srlm_knn_rerank")``. ``rank_round`` 4 (retrievals) / 6
    (rerank) pin the orders on both sides."""
    from pyspark.sql import functions as F

    from .operators.feedback import lm_doc_vectors
    from .operators.index import build_index
    from .operators.retrieval import search
    from .operators.srlm import knn_centroid_rerank, knn_query_search

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    idx = build_index(docs, analyzer="simple", cache=False)
    qdf = spark.createDataFrame(QUERYSET, "qid string, qtext string")
    qdocs = spark.createDataFrame(
        [(i, qid, txt) for i, (qid, txt) in enumerate(KNNTRAINSET)],
        "doc_id long, ref_qid string, text string",
    )
    qidx = build_index(qdocs, analyzer="simple", cache=False)
    knn = knn_query_search(
        qidx, qdf, k=2, model="lmdir", rank_round=4
    ).select("qid", "ref_qid", F.round("sim", 6).alias("sim"))
    run = search(idx, qdf, model="bm25", k=20, rank_round=4).select(
        "qid", "doc_id", "rank", F.round("score", 4).alias("score")
    )
    m = (F.col("doc_id") + F.substring("qid", 2, 10).cast("int")) % 10
    kqrels = (
        docs.select("doc_id")
        .crossJoin(qdocs.select(F.col("ref_qid").alias("qid")))
        .withColumn(
            "rel",
            F.when(m == 0, 3).when(m == 1, 2).when(m == 2, 1).otherwise(0),
        )
        .filter(F.col("rel") > 0)
        .select("qid", "doc_id", "rel")
    )
    rel_docs = kqrels.select(F.col("qid").alias("ref_qid"), "doc_id")
    fdocs = (
        knn.join(rel_docs, "ref_qid").select("doc_id")
        .union(run.select("doc_id"))
        .distinct()
    )
    vecs = lm_doc_vectors(idx, doc_ids=fdocs)
    out = knn_centroid_rerank(run, knn, kqrels, vecs, rank_round=6)
    return out.filter(F.col("rank") <= 10).select(
        "qid", "doc_id", "rank", F.round("score", 6).alias("score")
    ).orderBy("qid", "rank")


def _eval_fairness_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E9 contract (``eval.fairness_combined``, reference
    ``qrels/PreEvaluatedResults.java:16-34``): the real combined =
    awrf * ndcg over the real per-query nDCG (E1-E5 machinery) and a
    deterministic awrf stand-in, vs the SQL twin in
    ``build_sql("eval_fairness")``."""
    from pyspark.sql import functions as F

    from .operators.eval import fairness_combined, per_query_metrics

    docs, idx, compact, qdf, qt = _bmw_fixture(spark, sf_dir)
    run = _fixture_run(compact, qt, k=100)
    qrels = _synthetic_qrels(docs, qdf)
    pre = per_query_metrics(run, qrels).select(
        "qid",
        F.round("ndcg", 4).alias("ndcg"),
        F.round(
            F.lit(1.0) / (F.lit(1) + F.substring("qid", 2, 10).cast("int")),
            4,
        ).alias("awrf"),
    )
    out = fairness_combined(pre)
    return out.select(
        "qid", "ndcg", "awrf", F.round("combined", 6).alias("combined")
    ).orderBy("qid")


def _doc_lookup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 contract (ID point lookup / X6 stored-field fetch): the
    engine's filter over the doc store for a deterministic id subset,
    vs the trivial SQL twin in ``build_sql("doc_lookup")``."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    return docs.filter(F.col("doc_id") % 97 == 0).orderBy("doc_id")


def _qpp_stoch_eval_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H7 contract (``experiments.stochastic_qpp_evaluation`` with the
    md5 seeded draw): the REAL harness — one composite-qid DataFrame
    batch recomputing AP and NQC on every sampled swap, correlated per
    sample by the real ``kendall_tau`` — vs the full SQL twin in
    ``build_sql("qpp_stoch_eval")``. ``metric_round=4``/``est_round=6``
    (the contract device) make both engines correlate identical
    doubles; the sampled swap itself is value-pinned through the
    argmin-md5 pick shared with the twin."""

    from .operators.experiments import stochastic_qpp_evaluation

    docs, idx, compact, qdf, qt = _bmw_fixture(spark, sf_dir)
    run = _fixture_run(compact, qt, k=10)
    qrels = _synthetic_qrels(docs, qdf)
    res = stochastic_qpp_evaluation(
        idx, qdf, qrels, run, num_samples=5, seed=31415, qpp_k=50,
        permute="md5", metric_round=4, est_round=6,
    )
    rows = [(s, round(t, 4)) for s, t in sorted(res["sample_taus"].items())]
    return spark.createDataFrame(rows, "s int, tau double").orderBy("s")


def _qpp_corel_spec_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 contract (``qpp.corel_specificity``): the real combine —
    lam*P7_est + (1-lam)*coalesce(weighted rel-doc-run estimate,
    P7_est) — over the real reference machinery: per query, its first
    two rel docs used AS QUERIES (Block-Max retrieval + NQC + top-10
    Jaccard vs the base run), vs the full SQL twin in
    ``build_sql("qpp_corel_spec")``. Zero-sim references are dropped
    before the average (see the twin's comment on the 0/0 Spark-NULL vs
    DuckDB-NaN asymmetry)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from .operators.correlation import jaccard_overlap_df
    from .operators.postings import bmw_search
    from .operators.qpp import (
        corel_specificity,
        nqc,
        query_idf_stats,
        variant_specificity,
    )
    from .operators.retrieval import compile_queries

    docs, idx, compact, qdf, qt = _bmw_fixture(spark, sf_dir)
    run = _fixture_run(compact, qt, k=100)
    stats = query_idf_stats(qt, idx.term_stats, idx.stats.n_docs)
    base_nqc = nqc(run, stats, k=50)
    refs = None
    for vid in (1, 2):
        vqdf = spark.createDataFrame(
            [(q, t) for q, v, t in VARIANTSET if v == vid],
            "qid string, qtext string",
        )
        vqt = compile_queries(vqdf, "simple")
        vrun = bmw_search(compact, vqt, k=100, rank_round=4).select(
            "qid", "doc_id", "rank", F.round("score", 4).alias("score")
        )
        vstats = query_idf_stats(vqt, idx.term_stats, idx.stats.n_docs)
        vest = nqc(vrun, vstats, k=50)
        sim = jaccard_overlap_df(run, vrun, k=10)
        r = vest.join(sim, "qid").select(
            "qid", F.col("jaccard").alias("sim"), F.col("nqc").alias("est")
        )
        refs = r if refs is None else refs.unionByName(r)
    vs = variant_specificity(base_nqc, "nqc", refs, lam=0.5).select(
        "qid", F.round("est", 6).alias("est")
    )
    # the synthetic qrels of QRELS_CTE, rendered as DataFrame ops
    qrels = _synthetic_qrels(docs, qdf)
    w = Window.partitionBy("qid").orderBy("doc_id")
    rdocs = (
        qrels.withColumn("j", F.row_number().over(w))
        .filter(F.col("j") <= 2)
        .select("qid", "doc_id", "j")
    )
    reldoc_refs = None
    for j in (1, 2):
        rqdf = (
            rdocs.filter(F.col("j") == j)
            .join(docs, "doc_id")
            .select("qid", F.col("text").alias("qtext"))
        )
        rqt = compile_queries(rqdf, "simple")
        rrun = bmw_search(compact, rqt, k=100, rank_round=4).select(
            "qid", "doc_id", "rank", F.round("score", 4).alias("score")
        )
        rstats = query_idf_stats(rqt, idx.term_stats, idx.stats.n_docs)
        rest = nqc(rrun, rstats, k=50)
        rsim = jaccard_overlap_df(run, rrun, k=10)
        r = rest.join(rsim, "qid").select(
            "qid",
            F.round(F.col("jaccard"), 6).alias("sim"),
            F.round(F.col("nqc"), 6).alias("est"),
        ).filter(F.col("sim") > 0)
        reldoc_refs = (
            r if reldoc_refs is None else reldoc_refs.unionByName(r)
        )
    out = corel_specificity(vs, reldoc_refs, lam=0.5)
    return out.select(
        "qid", F.round("est", 6).alias("est")
    ).orderBy("qid")


def _stoch_attr_perms_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6 contract (``stochastic.swap_permutations`` under the
    AttributeValueBasedSwapper configuration, reference
    ``stochastic_qpp/AttributeValueBasedSwapper.java:21-53``): the rel
    labels come from a binary doc attribute (doc_id % 2) joined with the
    operator's own fill semantics (left join, missing -> 0), and the
    enumerator runs with ``top_doc_always_swapped=False`` — the flag
    combo the H5 row does not pin — vs the self-join SQL twin in
    ``build_sql("stoch_attr_perms")``."""
    from pyspark.sql import functions as F

    from .operators.stochastic import swap_permutations

    docs, idx, compact, qdf, qt = _bmw_fixture(spark, sf_dir)
    run = _fixture_run(compact, qt, k=10)
    attrs = docs.select(
        "doc_id", (F.col("doc_id") % 2).cast("int").alias("attr")
    )
    filled = run.join(
        attrs.select("doc_id", F.col("attr").alias("rel")), "doc_id", "left"
    ).fillna(0, subset=["rel"])
    perms = swap_permutations(filled, top_doc_always_swapped=False,
                              min_rel=1)
    return perms.select(
        "qid", "perm_id", "doc_id", "rank", "score"
    ).orderBy("qid", "perm_id", "rank")


def _analyzed_export_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3 contract (``sources.writers.analyzed_export``, reference
    ``indexing/Preprocessor.java:9-31``): the real order-preserving
    analyzed-text export (simple analyzer: fold, lowercase alnum runs,
    in-place stopword drop, space join) vs the array-filter SQL twin in
    ``build_sql("analyzed_export")``. The only row that value-pins token
    SEQUENCE — every other tok CTE explodes and loses order."""
    from .sources.writers import analyzed_export

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    return analyzed_export(docs, analyzer="simple").orderBy("doc_id")


def _bpe_encode_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 contract (``functions.bpe``, reference
    ``tokenization/bpe_msmarco.sh:1-63`` re-encode step): the real
    encoder — greedy lowest-rank merges in an Arrow-batched
    distinct-word dictionary, broadcast-joined and order-rebuilt — under
    the frozen ``BPE_MERGESET``, vs the rank-order sequential-replace
    SQL twin in ``build_sql("bpe_encode")``. Text is normalized to
    space-joined ``[a-z0-9_]+`` runs on both sides so the delimiter
    characters the twin uses cannot occur in words."""
    from pyspark.sql import functions as F

    from .functions.bpe import BPEModel, bpe_encode_text

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    clean = docs.select(
        "doc_id",
        F.array_join(
            F.expr("regexp_extract_all(lower(text), '[a-z0-9_]+', 0)"), " "
        ).alias("text"),
    ).filter(F.col("text") != "")
    model = BPEModel(merges=list(BPE_MERGESET))
    return (
        bpe_encode_text(clean, model)
        .select("doc_id", "bpe_text")
        .orderBy("doc_id")
    )


def _fdbk_term_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/X5 contract (``feedback.top_docs_term_stats``, reference
    ``fdbk/RelevanceModelIId.java:66-99``): the real term-vector fetch
    over the BM25 top-10 run (the same ``rank_round=4`` segmented path
    the ``bmw_topk`` row proves equal to the ranked oracle) vs the SQL
    twin in ``build_sql("fdbk_term_stats")``. Integer-valued — no
    float rounding in the surfaced columns."""
    from pyspark.sql import functions as F

    from .operators.feedback import top_docs_term_stats
    from .operators.postings import bmw_search

    docs, idx, compact, qdf, qt = _bmw_fixture(spark, sf_dir)
    run = bmw_search(compact, qt, k=10, rank_round=4)
    stats = top_docs_term_stats(idx, run, num_top_docs=10)
    return stats.term_stats.select(
        "qid", "term",
        F.col("tf_top").cast("long").alias("tf_top"),
        F.col("df_top").cast("long").alias("df_top"),
    ).orderBy("qid", "term")


def _doc_offsets_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 contract (``index.assign_doc_ids``, reference
    ``utils/IndexUtils.java:22-62`` docid==offset invariant): the real
    two-phase dense-id assignment (range partition -> partition-local
    row_number -> broadcast prefix-sum of partition sizes) must equal
    the logical spec ``ROW_NUMBER() OVER (ORDER BY key) - 1`` in
    ``build_sql("doc_offsets")`` — i.e. the scalable implementation is
    value-identical to the single-window one it replaces."""
    from pyspark.sql import functions as F

    from .operators.index import assign_doc_ids

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").alias("orig_id"), "text"
    )
    out = assign_doc_ids(docs, keys=["orig_id"])
    res = out.select("orig_id", "doc_id").orderBy("orig_id")
    rows = res.collect()  # materialize, then release the pinned store
    out.unpersist()
    return spark.createDataFrame(rows, res.schema)


def _trec_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9+S6 contract (``writers.write_trec_run`` ->
    ``readers.read_res``; reference ``retrieval/OneStepRetriever.java:
    168-174`` writing, ``qrels/AllRetrievedResults.java:119-146``
    parsing): the BM25 top-10 run written as TREC 6-col text and parsed
    back must equal the ranked oracle rows. Scores are pre-rounded to 4
    so the %.4f line format is an identity and the parsed double equals
    ``round(score, 4)`` exactly. The parsed rows are materialized
    before the scratch dir is deleted."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from .operators.postings import bmw_search
    from .sources.readers import read_res
    from .sources.writers import write_trec_run

    docs, idx, compact, qdf, qt = _bmw_fixture(spark, sf_dir)
    run = bmw_search(compact, qt, k=10, rank_round=4).select(
        "qid", "doc_id",
        F.col("rank").cast("int").alias("rank"),
        F.round("score", 4).alias("score"),
    )
    tmp = tempfile.mkdtemp(prefix="lms_trec_contract_")
    try:
        write_trec_run(run, f"{tmp}/run", run_name="contract")
        back = read_res(spark, f"{tmp}/run")
        rows = back.collect()
        return spark.createDataFrame(rows, back.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _materialize_then_rm(spark: SparkSession, df: DataFrame, tmp: str):
    """Collect ``df`` (which lazily reads files under ``tmp``) before the
    scratch dir is deleted, then rebuild a local DataFrame."""
    import shutil

    try:
        rows = df.collect()
        return spark.createDataFrame(rows, df.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _collection_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 contract (``readers.read_collection_tsv``; reference
    ``indexing/MsMarcoIndexer.java:67-90``): the documents table written
    as ``doc_id \\t text`` lines and scanned back through the TSV reader
    must equal the source rows. TSV-hostile chars are blanked on both
    sides (identity on these fixtures)."""
    import tempfile

    from pyspark.sql import functions as F

    from .sources.readers import read_collection_tsv

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.length("text") > 0)
    )
    lines = docs.select(
        F.format_string(
            "%s\t%s",
            F.col("doc_id").cast("string"),
            F.regexp_replace("text", r'[\t\n\r"]', " "),
        ).alias("value")
    )
    tmp = tempfile.mkdtemp(prefix="lms_coll_contract_")
    lines.coalesce(1).write.mode("overwrite").text(f"{tmp}/coll")
    back = read_collection_tsv(spark, f"{tmp}/coll")
    return _materialize_then_rm(spark, back, tmp)


def _jsonl_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2+S3 contract (``readers.read_jsonl_collection``; reference
    ``indexing/JSONDataIndexer.java:19-45`` + recursive gzip walk
    ``indexing/MsMarcoV2JsonToTsvConverter.java:13-48``): {id, title,
    plain} written as gzip JSONL into a NESTED directory and scanned
    back recursively -> (doc_id, title + ' ' + plain with [\\n\\t]
    blanked)."""
    import tempfile

    from pyspark.sql import functions as F

    from .sources.readers import read_jsonl_collection

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    sid = F.col("doc_id").cast("string")
    lines = docs.select(
        F.to_json(
            F.struct(
                sid.alias("id"),
                F.concat(F.lit("D"), sid).alias("title"),
                F.col("text").alias("plain"),
            )
        ).alias("value")
    )
    tmp = tempfile.mkdtemp(prefix="lms_jsonl_contract_")
    (
        lines.coalesce(1)
        .write.mode("overwrite")
        .option("compression", "gzip")
        .text(f"{tmp}/outer/inner")
    )
    back = read_jsonl_collection(spark, f"{tmp}/outer", recursive=True)
    return _materialize_then_rm(spark, back, tmp)


def _queries_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 contract (``readers.read_queries_tsv``; reference
    ``retrieval/QueryLoader.java:25-51``): the QUERYSET written as
    ``qid \\t qtext`` lines and parsed back through the TSV query loader
    must equal the literal set."""
    import tempfile

    from pyspark.sql import functions as F

    from .sources.readers import read_queries_tsv

    qdf = spark.createDataFrame(QUERYSET, "qid string, qtext string")
    lines = qdf.select(
        F.format_string("%s\t%s", F.col("qid"), F.col("qtext")).alias("value")
    )
    tmp = tempfile.mkdtemp(prefix="lms_queries_contract_")
    lines.coalesce(1).write.mode("overwrite").text(f"{tmp}/queries")
    back = read_queries_tsv(spark, f"{tmp}/queries")
    return _materialize_then_rm(spark, back, tmp)


def _qrels_firstwins_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 contract (``readers.read_qrels``; reference
    ``qrels/AllRelRcds.java:37-63``, ``qrels/PerQueryRelDocs.java:
    20-26``): a qrels file carrying TWO lines per (qid, doc) in order —
    rel = doc_id % 4 (0..3) then rel = 1 — parsed under the rel>0 +
    first-write-wins quirks. The file is written as ONE sorted text
    partition so line order (which the quirk depends on) is exact."""
    import tempfile

    from pyspark.sql import functions as F

    from .sources.readers import read_qrels

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    l1 = docs.select(
        "doc_id",
        F.lit(0).alias("seq"),
        (F.col("doc_id") % 4).alias("rel"),
    )
    l2 = docs.select("doc_id", F.lit(1).alias("seq"), F.lit(1).alias("rel"))
    lines = (
        l1.unionByName(l2)
        .select(
            "doc_id",
            "seq",
            F.format_string(
                "q%d 0 %d %d",
                F.col("doc_id") % 3 + 1,
                F.col("doc_id"),
                F.col("rel"),
            ).alias("value"),
        )
        .repartition(1)
        .sortWithinPartitions("doc_id", "seq")
        .select("value")
    )
    tmp = tempfile.mkdtemp(prefix="lms_qrels_contract_")
    lines.write.mode("overwrite").text(f"{tmp}/qrels")
    back = read_qrels(spark, f"{tmp}/qrels")
    return _materialize_then_rm(spark, back, tmp)


def _variants_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 contract (``readers.read_variants_tsv``; reference
    ``retrieval/KNNRelModel.java:141-177``): ``qid \\t qtext \\t v1 \\t
    v2`` lines (fixed-width slices of the doc text, so short docs leave
    empty variants) parsed back with 0-based variant_idx and '' variants
    dropped."""
    import tempfile

    from pyspark.sql import functions as F

    from .sources.readers import read_variants_tsv

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    lines = docs.select(
        F.concat_ws(
            "\t",
            F.concat(F.lit("v"), F.col("doc_id").cast("string")),
            F.substring("text", 1, 20),
            F.substring("text", 21, 20),
            F.substring("text", 41, 20),
        ).alias("value")
    )
    tmp = tempfile.mkdtemp(prefix="lms_variants_contract_")
    lines.coalesce(1).write.mode("overwrite").text(f"{tmp}/variants")
    back = read_variants_tsv(spark, f"{tmp}/variants")
    return _materialize_then_rm(spark, back, tmp)


def _model_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 contract (``writers.save_term_distribution`` /
    ``load_term_distribution``; reference ``retrieval/SupervisedRLM.java:
    202-238`` model persistence): the RM1/RLM expanded-query table
    persisted to parquet and loaded back must still equal the
    ``fdbk_rm1_expand`` oracle — the save/load pair is lossless."""
    import tempfile

    from pyspark.sql import functions as F

    from .sources.writers import load_term_distribution, save_term_distribution

    expanded = _fdbk_rm1_expand_query(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="lms_model_contract_")
    save_term_distribution(expanded, f"{tmp}/model")
    back = load_term_distribution(spark, f"{tmp}/model").select(
        "qid", "term", "qtf", F.round("weight", 6).alias("weight")
    )
    return _materialize_then_rm(spark, back, tmp)


def _fewshot_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S12 contract (``writers.fewshot_json``; reference
    ``retrieval/KNNRelModel.java:197-295``): the per-query few-shot JSON
    docs (BM25 top-10 split into rel/nonrel under the synthetic
    (doc_id + qnum) % 5 qrels) written as text, parsed back with a JSON
    reader and exploded must equal the ranked rows they encode."""
    import tempfile

    from pyspark.sql import functions as F

    from .operators.postings import bmw_search
    from .sources.writers import fewshot_json

    docs, idx, compact, qdf, qt = _bmw_fixture(spark, sf_dir)
    run = bmw_search(compact, qt, k=10, rank_round=4).select(
        "qid", "doc_id", F.col("rank").cast("int").alias("rank")
    )
    qnum = F.substring("qid", 2, 10).cast("int")
    qrels = (
        run.select("qid", "doc_id")
        .withColumn(
            "rel",
            F.when(((F.col("doc_id") + qnum) % 5) == 0, 1).otherwise(0),
        )
        .filter(F.col("rel") > 0)
    )
    fs = fewshot_json(run, qrels, qdf)
    tmp = tempfile.mkdtemp(prefix="lms_fewshot_contract_")
    fs.select("json").coalesce(1).write.mode("overwrite").text(f"{tmp}/fs")
    parsed = spark.read.json(f"{tmp}/fs")

    def _explode(col: str, kind: str) -> DataFrame:
        return parsed.select(
            "qid",
            "qtext",
            F.lit(kind).alias("kind"),
            F.explode(col).alias("d"),
        ).select(
            "qid",
            "qtext",
            "kind",
            F.col("d.rank").cast("int").alias("rank"),
            F.col("d.doc_id").cast("string").alias("doc_id"),
            F.col("d.rel").cast("int").alias("rel"),
        )

    back = _explode("rel_docs", "rel").unionByName(
        _explode("nonrel_docs", "nonrel")
    )
    return _materialize_then_rm(spark, back, tmp)


def _perm_map_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13 contract (``writers.permutation_map``; reference
    ``qpp/PreComputedPredictor.java:67-99``): the real sink operator
    over the BM25 top-10 (pre) and LM-Dirichlet top-10 (post) runs must
    produce the ``qid \\t pre>post,...`` lines of the SQL twin in
    ``build_sql("perm_map")``."""
    from .sources.writers import permutation_map

    _register_views(spark, sf_dir)
    pre = spark.sql(build_sql("bm25_topk", "spark")).select(
        "qid", "doc_id", "rank"
    )
    post = spark.sql(build_sql("lmdir_topk", "spark")).select(
        "qid", "doc_id", "rank"
    )
    return permutation_map(pre, post).select("qid", "line").orderBy("qid")


def _qpp_preretrieved_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H8 contract: the real chain over a pre-retrieved run —
    ``retrieval.induce_scores`` (Q8, LM-JM), ``eval.rerank_by_score``
    (E8, the AUTO_SORT_TOP_DOCS resort), ``qpp.nqc`` (P1) and
    ``qpp.precomputed_predictor`` (P9 broadcast lookup) — vs the full
    SQL twin in ``build_sql("qpp_preretrieved")``. Scores are rounded 4
    BEFORE the E8 resort so both engines rank identical doubles; the
    stopword-only query (NULL from the P9 left lookup) is filtered out
    — the driver's sorted-tuple compare cannot order None vs float."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from .operators.eval import rerank_by_score
    from .operators.index import build_index
    from .operators.qpp import nqc, precomputed_predictor, query_idf_stats
    from .operators.retrieval import compile_queries, induce_scores

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    idx = build_index(docs, analyzer="simple", cache=False)
    qdf = spark.createDataFrame(QUERYSET, "qid string, qtext string")
    qnum = F.substring("qid", 2, 10).cast("int")
    ext = (
        docs.select("doc_id").crossJoin(qdf.select("qid"))
        .filter(((F.col("doc_id") + qnum) % 3) == 0)
    )
    w = Window.partitionBy("qid").orderBy("doc_id")
    ext40 = (
        ext.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= 40)
        .select("qid", "doc_id")
    )
    ind = induce_scores(idx, ext40, qdf, model="lmjm")
    rr = rerank_by_score(
        ind.select("qid", "doc_id", F.round("score", 4).alias("score"))
    )
    qt = compile_queries(qdf, "simple")
    stats = query_idf_stats(qt, idx.term_stats, idx.stats.n_docs)
    est = nqc(rr, stats, k=50).select(
        "qid", F.round("nqc", 6).alias("nqc")
    )
    pre = precomputed_predictor(est, rr)
    return (
        rr.filter(F.col("rank") <= 5)
        .join(pre.filter(F.col("nqc").isNotNull()), "qid")
        .select("qid", "doc_id", "rank", "score", "nqc")
        .orderBy("qid", "rank")
    )


def _corr_polyfit_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C11 contract (``correlation.polynomial_fit``, reference
    ``correlation/PolynomialRegression.java``): the real np.polyfit
    kernel — degree-2 least squares of NQC (round 6) on AP (round 4) —
    vs the Cramer normal-equations SQL twin in
    ``build_sql("corr_polyfit")``. The two algorithms agree to ~2e-13
    on these vectors; the round-6 surfacing absorbs that."""
    import numpy as np
    from pyspark.sql import functions as F

    from .operators.correlation import polynomial_fit
    from .operators.eval import per_query_metrics
    from .operators.qpp import nqc, query_idf_stats

    docs, idx, compact, qdf, qt = _bmw_fixture(spark, sf_dir)
    run = _fixture_run(compact, qt, k=100)
    qrels = _synthetic_qrels(docs, qdf)
    metrics = per_query_metrics(run, qrels)
    stats = query_idf_stats(qt, idx.term_stats, idx.stats.n_docs)
    est = nqc(run, stats, k=50)
    rows = (
        metrics.select("qid", F.round("ap", 4).alias("x"))
        .join(est.select("qid", F.round("nqc", 6).alias("y")), "qid")
        .orderBy("qid")
        .collect()
    )
    gt = np.array([r["x"] for r in rows])
    pred = np.array([r["y"] for r in rows])
    c2, c1, c0 = (float(c) for c in polynomial_fit(gt, pred, 2))
    out = [(round(c2, 6), round(c1, 6), round(c0, 6))]
    return spark.createDataFrame(out, "c2 double, c1 double, c0 double")


def _sparse_vec_bm25_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10 contract (``writers.sparse_vectors``, reference
    ``indexing/SparseVecWriter.java:63-164``): the real sink — index
    tokens joined to term stats, weighted with the sink's own BM25
    defaults k1=1.2 b=0.75 — vs the SQL twin in
    ``build_sql("sparse_vec_bm25")``."""
    from pyspark.sql import functions as F

    from .config import BM25Config
    from .operators.index import build_index
    from .sources.writers import sparse_vectors

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    idx = build_index(docs, analyzer="simple", cache=False)
    vecs = sparse_vectors(idx, weighting="bm25",
                          bm25=BM25Config(k1=1.2, b=0.75))
    return vecs.select(
        "doc_id", "term", F.round("weight", 6).alias("weight")
    ).orderBy("doc_id", "term")


def _fdbk_print_terms_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13 contract (``feedback.feedback_term_stats``, reference
    ``retrieval/FdbkTermStats.java:24-65`` / ``printfdbkterms.sh``): the
    real printer — LM-Dirichlet retrieve (raw sims, round-4 rank
    membership), RM-conditional weights on the top-20, sorted — vs the
    shared ``_RM_WTS_CTES`` twin in ``build_sql("fdbk_print_terms")``."""
    from pyspark.sql import functions as F

    from .operators.feedback import feedback_term_stats
    from .operators.index import build_index
    from .operators.retrieval import search

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    idx = build_index(docs, analyzer="simple", cache=False)
    qdf = spark.createDataFrame(QUERYSET, "qid string, qtext string")
    run = search(idx, qdf, model="lmdir", k=100, rank_round=4)
    wts = feedback_term_stats(idx, run, num_top_docs=20)
    return wts.select(
        "qid", "term", F.round("wt", 6).alias("wt")
    ).orderBy("qid", F.desc("wt"), "term")


def _fdbk_rlm_driver_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 contract (``feedback.rlm_rerank``, reference
    ``retrieval/KNNRelModel.java:610-620``): the REAL driver function —
    LM-Dirichlet retrieve, RM-conditional on the top-20, KL rerank of
    the same run, all through its own default wiring — vs the full SQL
    twin in ``build_sql("fdbk_rlm_driver")``. Unlike ``fdbk_kl_rerank``
    (which feeds pre-rounded scores through the individual operators),
    this row pins the driver composition itself: the KL chain consumes
    the RAW retrieval score, with membership pinned at rank_round=4 and
    the rerank order at rerank_round=6."""
    from pyspark.sql import functions as F

    from .operators.feedback import rlm_rerank
    from .operators.index import build_index

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    idx = build_index(docs, analyzer="simple", cache=False)
    qdf = spark.createDataFrame(QUERYSET, "qid string, qtext string")
    out = rlm_rerank(idx, qdf, model="lmdir", rank_round=4,
                     rerank_round=6)
    return out.filter(F.col("rank") <= 10).select(
        "qid", "doc_id", "rank", F.round("score", 4).alias("score")
    ).orderBy("qid", "rank")


def _srlm_knn_pseudo_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12 contract (``srlm.knn_pseudo_rel_rerank``, reference
    ``retrieval/KNNRelModel.java`` pseudo-relevance path): the real
    operator — KNN neighbors' rel docs as a uniform-weight pseudo list
    prepended to the score-normalized retrieved list, RM-conditional fit
    on its top-20, KL-div rerank of the ORIGINAL BM25 top-100 — vs the
    full SQL twin in ``build_sql("srlm_knn_pseudo")``. The knn sims
    cancel (rel docs are uniform-weight), so the only cross-engine float
    surface is the RM/KL chain already pinned by ``fdbk_kl_rerank``."""
    from pyspark.sql import functions as F

    from .operators.index import build_index
    from .operators.retrieval import search
    from .operators.srlm import knn_pseudo_rel_rerank, knn_query_search

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    idx = build_index(docs, analyzer="simple", cache=False)
    qdf = spark.createDataFrame(QUERYSET, "qid string, qtext string")
    qdocs = spark.createDataFrame(
        [(i, qid, txt) for i, (qid, txt) in enumerate(KNNTRAINSET)],
        "doc_id long, ref_qid string, text string",
    )
    qidx = build_index(qdocs, analyzer="simple", cache=False)
    knn = knn_query_search(
        qidx, qdf, k=2, model="lmdir", rank_round=4
    ).select("qid", "ref_qid", F.round("sim", 6).alias("sim"))
    run = search(idx, qdf, model="bm25", k=100, rank_round=4).select(
        "qid", "doc_id", "rank", F.round("score", 4).alias("score")
    )
    m = (F.col("doc_id") + F.substring("qid", 2, 10).cast("int")) % 10
    kqrels = (
        docs.select("doc_id")
        .crossJoin(qdocs.select(F.col("ref_qid").alias("qid")))
        .withColumn(
            "rel",
            F.when(m == 0, 3).when(m == 1, 2).when(m == 2, 1).otherwise(0),
        )
        .filter(F.col("rel") > 0)
        .select("qid", "doc_id", "rel")
    )
    out = knn_pseudo_rel_rerank(idx, run, knn, kqrels, rank_round=6)
    return out.filter(F.col("rank") <= 10).select(
        "qid", "doc_id", "rank", F.round("score", 4).alias("score")
    ).orderBy("qid", "rank")


def spark_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out = {n: make_spark_query(n) for n in QUERY_NAMES}
    out["bmw_topk"] = _bmw_topk_query
    out["incremental_topk"] = _incremental_topk_query
    out["dedup_embedding"] = _dedup_embedding_query
    out["dedup_components"] = _dedup_components_query
    out["hash_split"] = _hash_split_query
    out["qpp_rsd"] = _qpp_rsd_query
    out["qpp_uef"] = _qpp_uef_query
    out["fdbk_kl_rerank"] = _fdbk_kl_rerank_query
    out["fdbk_rm1_expand"] = _fdbk_rm1_expand_query
    out["qpp_cumnqc"] = _qpp_cumnqc_query
    out["qpp_eval_corr"] = _qpp_eval_corr_query
    out["fdbk_rocchio"] = _fdbk_rocchio_query
    out["lmdir_mu_sweep"] = _lmdir_mu_sweep_query
    out["stoch_swap_perms"] = _stoch_swap_perms_query
    out["qpp_variant_spec"] = _qpp_variant_spec_query
    out["srlm_rerank"] = _srlm_rerank_query
    out["bm25_boosted_topk"] = _bm25_boosted_topk_query
    out["qpp_corr_pack"] = _qpp_corr_pack_query
    out["qpp_lambda_grid"] = _qpp_lambda_grid_query
    out["srlm_knn_rerank"] = _srlm_knn_rerank_query
    out["srlm_knn_pseudo"] = _srlm_knn_pseudo_query
    out["fdbk_rlm_driver"] = _fdbk_rlm_driver_query
    out["corr_polyfit"] = _corr_polyfit_query
    out["qpp_preretrieved"] = _qpp_preretrieved_query
    out["analyzed_export"] = _analyzed_export_query
    out["stoch_attr_perms"] = _stoch_attr_perms_query
    out["qpp_corel_spec"] = _qpp_corel_spec_query
    out["qpp_stoch_eval"] = _qpp_stoch_eval_query
    out["eval_fairness"] = _eval_fairness_query
    out["doc_lookup"] = _doc_lookup_query
    out["bpe_encode"] = _bpe_encode_query
    out["fdbk_term_stats"] = _fdbk_term_stats_query
    out["doc_offsets"] = _doc_offsets_query
    out["trec_roundtrip"] = _trec_roundtrip_query
    out["sparse_vec_bm25"] = _sparse_vec_bm25_query
    out["fdbk_print_terms"] = _fdbk_print_terms_query
    out["collection_roundtrip"] = _collection_roundtrip_query
    out["queries_roundtrip"] = _queries_roundtrip_query
    out["jsonl_roundtrip"] = _jsonl_roundtrip_query
    out["qrels_firstwins"] = _qrels_firstwins_query
    out["variants_roundtrip"] = _variants_roundtrip_query
    out["model_roundtrip"] = _model_roundtrip_query
    out["fewshot_roundtrip"] = _fewshot_roundtrip_query
    out["perm_map"] = _perm_map_query
    out["stream_hourly"] = _stream_hourly_query
    out["stream_sessionize"] = _stream_sessionize_query
    return out


def duckdb_oracles() -> dict[str, str]:
    out = {n: build_sql(n, "duckdb") for n in QUERY_NAMES}
    # the compressed Block-Max path must equal the exhaustive BM25 oracle
    out["bmw_topk"] = build_sql("bm25_topk", "duckdb")
    # the incremental append+compact+load lifecycle must too
    out["incremental_topk"] = build_sql("bm25_topk", "duckdb")
    # the DataFrame-operator LSH near-dup must equal its inlined-plane twin
    out["dedup_embedding"] = build_sql("dedup_embedding", "duckdb")
    # the iterative star-contraction components vs a recursive-CTE closure
    out["dedup_components"] = build_sql("dedup_components", "duckdb")
    # the deterministic content-hash split vs its hex-threshold twin
    out["hash_split"] = build_sql("hash_split", "duckdb")
    # the seeded-sampling QPP operator chain vs its md5-permutation twin
    out["qpp_rsd"] = build_sql("qpp_rsd", "duckdb")
    # the full UEF pipeline (sampling -> RM/KL rerank -> rank distance
    # -> NQC composition) vs its reduced md5-permutation twin
    out["qpp_uef"] = build_sql("qpp_uef", "duckdb")
    # the RM-conditional/KL-rerank operators vs the full SQL rendering
    # of the reference formulas (the values qpp_uef's reduction cancels)
    out["fdbk_kl_rerank"] = build_sql("fdbk_kl_rerank", "duckdb")
    # RM1 i.i.d. + RLM expansion (the most-hit feedback path) and the
    # prefix-variance CumulativeNQC, each vs a full SQL rendering
    out["fdbk_rm1_expand"] = build_sql("fdbk_rm1_expand", "duckdb")
    out["qpp_cumnqc"] = build_sql("qpp_cumnqc", "duckdb")
    # the H1 harness composition: AP x NQC correlated by the real
    # kendall/pearson/spearman kernels vs a full SQL rendering
    out["qpp_eval_corr"] = build_sql("qpp_eval_corr", "duckdb")
    # Rocchio LM-vector expansion with negative feedback vs a full
    # SQL rendering
    out["fdbk_rocchio"] = build_sql("fdbk_rocchio", "duckdb")
    # the H3 mu-sweep driver: per-mu LM-Dirichlet retrieval + the E6
    # computeAll summary vs a full SQL rendering
    out["lmdir_mu_sweep"] = build_sql("lmdir_mu_sweep", "duckdb")
    # the H5 deterministic permutation enumerator vs a full SQL
    # rendering (self-join swap)
    out["stoch_swap_perms"] = build_sql("stoch_swap_perms", "duckdb")
    # the P7 variant-reference combine (per-variant retrieval + NQC +
    # top-10 Jaccard) vs a full SQL rendering
    out["qpp_variant_spec"] = build_sql("qpp_variant_spec", "duckdb")
    # the F8+F9 supervised-RLM fit + dot-product rerank vs a full SQL
    # rendering
    out["srlm_rerank"] = build_sql("srlm_rerank", "duckdb")
    # Q2 boosted terms through the real weight-column search path
    out["bm25_boosted_topk"] = build_sql("bm25_boosted_topk", "duckdb")
    # the C3-C7 driver-side kernels (RMSE quirk, pairwise, quantized,
    # SARE/SARC) over the H1 vectors vs a full SQL rendering
    out["qpp_corr_pack"] = build_sql("qpp_corr_pack", "duckdb")
    # the H2 lambda-grid driver (per-lambda P7 combine + Kendall tau-b)
    out["qpp_lambda_grid"] = build_sql("qpp_lambda_grid", "duckdb")
    # the Q10 KNN query search + F10 KNN-centroid rerank chain
    out["srlm_knn_rerank"] = build_sql("srlm_knn_rerank", "duckdb")
    # the F12 KNN pseudo-relevance list into the RM/KL rerank chain
    out["srlm_knn_pseudo"] = build_sql("srlm_knn_pseudo", "duckdb")
    # the F6 RLM driver's default wiring (raw-sim KL over LM-Dirichlet)
    out["fdbk_rlm_driver"] = build_sql("fdbk_rlm_driver", "duckdb")
    # the C11 degree-2 least-squares kernel vs Cramer normal equations
    out["corr_polyfit"] = build_sql("corr_polyfit", "duckdb")
    # the H8 pre-retrieved chain (Q8 induce + E8 resort + P1/P9)
    out["qpp_preretrieved"] = build_sql("qpp_preretrieved", "duckdb")
    # the T3 order-preserving analyzed export
    out["analyzed_export"] = build_sql("analyzed_export", "duckdb")
    # the H6 attribute-swap enumerator variant (no rank-1 forcing)
    out["stoch_attr_perms"] = build_sql("stoch_attr_perms", "duckdb")
    # the P8 rel-doc-as-query reference combine over the P7 estimate
    out["qpp_corel_spec"] = build_sql("qpp_corel_spec", "duckdb")
    # the H7 stochastic harness under the md5 seeded draw
    out["qpp_stoch_eval"] = build_sql("qpp_stoch_eval", "duckdb")
    # the E9 pre-evaluated fairness combine and the Q9 point lookup
    out["eval_fairness"] = build_sql("eval_fairness", "duckdb")
    out["doc_lookup"] = build_sql("doc_lookup", "duckdb")
    # the T4 BPE encoder under the frozen merge table vs the rank-order
    # sequential-replace twin
    out["bpe_encode"] = build_sql("bpe_encode", "duckdb")
    # the F1/X5 term-vector fetch over the BM25 top-10
    out["fdbk_term_stats"] = build_sql("fdbk_term_stats", "duckdb")
    # the X7 two-phase dense-id assignment vs the single-window spec
    out["doc_offsets"] = build_sql("doc_offsets", "duckdb")
    # the S9 TREC sink + S6 reader round-trip vs the ranked rows
    out["trec_roundtrip"] = build_sql("trec_roundtrip", "duckdb")
    # the S10 sparse-vector sink (its own k1=1.2 b=0.75 defaults)
    out["sparse_vec_bm25"] = build_sql("sparse_vec_bm25", "duckdb")
    # the F13 feedback-term printer (RM-conditional weights, raw sims)
    out["fdbk_print_terms"] = build_sql("fdbk_print_terms", "duckdb")
    # the S1/S2+S3/S5/S7 loader round-trips (TSV, recursive gzip JSONL,
    # qrels rel>0 + first-wins, variants posexplode)
    out["collection_roundtrip"] = build_sql("collection_roundtrip", "duckdb")
    out["queries_roundtrip"] = build_sql("queries_roundtrip", "duckdb")
    out["jsonl_roundtrip"] = build_sql("jsonl_roundtrip", "duckdb")
    out["qrels_firstwins"] = build_sql("qrels_firstwins", "duckdb")
    out["variants_roundtrip"] = build_sql("variants_roundtrip", "duckdb")
    # the S8 model save/load pair must be lossless around the RM1 oracle
    out["model_roundtrip"] = build_sql("fdbk_rm1_expand", "duckdb")
    # the S12 few-shot JSON sink parsed back and exploded
    out["fewshot_roundtrip"] = build_sql("fewshot_roundtrip", "duckdb")
    # the S13 permutation-map sink vs the dual-ranked string twin
    out["perm_map"] = build_sql("perm_map", "duckdb")
    # the streaming surface: a bounded replay through the watermarked
    # window agg / the applyInPandasWithState sessionizer must equal
    # the batch events oracles exactly (streaming/analytics.py)
    out["stream_hourly"] = build_sql("events_hourly", "duckdb")
    out["stream_sessionize"] = build_sql("events_sessionize", "duckdb")
    return out
