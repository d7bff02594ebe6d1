"""Generate english-analyzer end-to-end goldens for the feedback/QPP
chain (F3 rm-conditional, F4 KL rerank, F5 RLM expansion, P5 UEF,
P6 RSD) from the PURE-PYTHON oracle over sf0.01 documents.

Run from the repo root:  python tests/golden/gen_english_goldens.py

The oracle is independent of the Spark engine: PyIndex + pyfeedback
implement the reference semantics directly (including the quirks:
per-distinct-term sumSim, sorted-B rank distance, seeded per-(qid,
sample) permutations), so the committed JSON pins the engine's full
english path — analyzer, BM25, feedback math, seeded sampling — against
an implementation that shares no DataFrame code with it.
"""

from __future__ import annotations

import json
import math
import os
import sys
import zlib

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

from lucene_msmarco_spark.entry_queries import QUERYSET  # noqa: E402
from lucene_msmarco_spark.functions.analysis import analyze_str  # noqa: E402
from lucene_msmarco_spark.operators.correlation import rbo  # noqa: E402
from lucene_msmarco_spark.oracle import pyfeedback as pf  # noqa: E402
from lucene_msmarco_spark.oracle.pyoracle import (  # noqa: E402
    build_pyindex,
    topk_query,
)

SF_DIR = os.environ.get("LMS_GOLDEN_SF", "/root/testdata/sf0.01")
K = 20           # run depth = feedback depth (RLM_NUM_TOP_DOCS)
NUM_SAMPLES = 10
SEED = 314152
LAM = 0.9
FB = 0.2
NUM_EXP = 20
QPP_K = 50


def _rng(qid: str, sample: int) -> np.random.Generator:
    return np.random.default_rng(
        [SEED, sample, zlib.crc32(str(qid).encode("utf-8"))]
    )


def main() -> None:
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet')"
        " ORDER BY doc_id"
    ).fetchall()
    idx = build_pyindex(rows, analyzer="english")
    n_docs = len(rows)

    golden: dict = {"sf_dir": SF_DIR, "k": K, "queries": {}}
    for qid, qtext in QUERYSET:
        ranked = topk_query(idx, qtext, k=K, model="bm25", k1=0.9, b=0.4)
        if not ranked:
            golden["queries"][qid] = {"qtext": qtext, "run": []}
            continue
        # F3: RM-conditional weights over the top-K
        wts = pf.rm_conditional_weights(idx, ranked, num_top_docs=K,
                                        lam=LAM)
        # F4: KL rerank of the run under those weights
        reranked = pf.kl_rerank(idx, ranked, wts)
        # F5: RLM expansion terms (wt x ln(N/df), normalized, minus the
        # original query terms, top-NUM_EXP by (wtn desc, term asc))
        qterms = set(analyze_str(qtext, "english"))
        w2 = {
            t: w * math.log(n_docs / idx.df(t))
            for t, w in wts.items() if idx.df(t) > 0
        }
        z = sum(w2.values())
        wtn = {t: v / z for t, v in w2.items()}
        cands = sorted(
            ((t, v) for t, v in wtn.items() if t not in qterms),
            key=lambda kv: (-kv[1], kv[0]),
        )[:NUM_EXP]
        expansion = [[t, round(FB * v, 10)] for t, v in cands]

        # base NQC (avgidf_nqc variant: OOV df -> 1, distinct terms)
        idfs = [math.log(n_docs / max(idx.df(t), 1)) for t in qterms]
        aidf = float(np.mean(idfs)) if idfs else 0.0
        scores = np.array([s for _, _, s in ranked])
        nqc = float(np.var(scores[:QPP_K])) * aidf

        # P5 UEF: seeded samples -> feedback rerank -> sorted-B rank
        # distance vs the ORIGINAL run -> num_samples / sum_rd * base
        n = len(ranked)
        m = min(K, n)
        docs_arr = [d for d, _, _ in ranked]
        sum_rd = 0.0
        rsd_acc = 0.0
        for s in range(NUM_SAMPLES):
            perm = _rng(qid, s).permutation(n)[:m]
            sample = [
                (docs_arr[i], r + 1, ranked[i][2])
                for r, i in enumerate(perm)
            ]
            swts = pf.rm_conditional_weights(idx, sample, num_top_docs=m,
                                             lam=LAM)
            srr = pf.kl_rerank(idx, sample, swts)
            # rank distance: pos_a = original rank-1 (full run), pos_b =
            # position in sorted-by-id reranked sample, n = full run len
            sorted_b = sorted(d for d, _, _ in srr)
            orig_pos = {d: r - 1 for d, r, _ in ranked}
            acc = 0.0
            for d in sorted_b:
                pa = orig_pos[d]
                pb = sorted_b.index(d)
                acc += ((pa - pb) / n) ** 2
            sum_rd += math.sqrt(acc / n)
            # P6 RSD accumulation: rbo(orig docs, sample docs) x NQC of
            # the sample's scores (var over first QPP_K) x aidf
            s_scores = np.array([sc for _, _, sc in sample])[:QPP_K]
            est = float(np.var(s_scores)) * aidf if s_scores.size else 0.0
            rsd_acc += rbo(docs_arr, [d for d, _, _ in sample], k=n) * est
        uef = (NUM_SAMPLES / sum_rd * nqc) if sum_rd > 0 else 0.0
        rsd_val = rsd_acc / NUM_SAMPLES

        golden["queries"][qid] = {
            "qtext": qtext,
            "run": [[d, r, round(s, 10)] for d, r, s in ranked],
            "kl_rerank": [[d, r, round(s, 10)] for d, r, s in reranked],
            "rm_top10": [
                [t, round(w, 10)] for t, w in sorted(
                    wts.items(), key=lambda kv: (-kv[1], kv[0])
                )[:10]
            ],
            "rlm_expansion": expansion,
            "nqc": round(nqc, 10),
            "uef": round(uef, 10),
            "rsd": round(rsd_val, 10),
        }

    out = os.path.join(os.path.dirname(__file__),
                       "english_feedback_qpp.json")
    with open(out, "w") as f:
        json.dump(golden, f, indent=1, sort_keys=True)
    print("wrote", out, "queries:",
          sum(1 for q in golden["queries"].values() if q["run"]))


if __name__ == "__main__":
    main()
