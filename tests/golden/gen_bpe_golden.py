"""Generate the BPE-retrieval end-to-end golden: the reference's
``tokenization/bpe_msmarco.sh:1-63`` flow (train BPE on the collection,
re-encode passages as whitespace-joined subwords, index with a
WhitespaceAnalyzer, sweep LM-Dirichlet mu over the subword index) run by
the PURE-PYTHON oracle over sf0.01 documents.

Run from the repo root:  python tests/golden/gen_bpe_golden.py

Scope of independence: retrieval scoring / top-k / AP come from the
pyoracle (no DataFrame code shared with the engine); word frequencies
and the merge-selection loop are re-derived here in plain Python (the
engine computes frequencies with a Spark aggregation); the per-word
greedy encode reuses ``BPEModel.encode_word``, whose semantics are
separately pinned by hand-computed fixtures in tests/test_bpe.py. The
committed JSON therefore pins the SPARK side of the chain — the
(word,freq) aggregation, the broadcast dictionary encode, the
whitespace index build, batch LM-Dir scoring and the eval summary —
against this single-process composition.
"""

from __future__ import annotations

import json
import os
import sys
from collections import Counter

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

from lucene_msmarco_spark.entry_queries import QUERYSET  # noqa: E402
from lucene_msmarco_spark.functions.analysis import stopwords  # noqa: E402
from lucene_msmarco_spark.functions.bpe import BPEModel  # noqa: E402
from lucene_msmarco_spark.oracle.pyoracle import (  # noqa: E402
    build_pyindex,
    topk_query,
)

SF_DIR = os.environ.get("LMS_GOLDEN_SF", "/root/testdata/sf0.01")
NUM_MERGES = 200
MUS = (100.0, 500.0, 1000.0, 2000.0)
K = 100
MIN_REL = 2


def train_merges(word_freqs: dict[str, int], num_merges: int):
    """Sennrich merge loop re-derived in plain Python: count
    frequency-weighted adjacent symbol pairs, take the most frequent
    (ties to the lexicographically smallest pair), stop below count 2."""
    end = "</w>"
    vocab = {tuple(list(w) + [end]): f for w, f in word_freqs.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for word, freq in vocab.items():
            for i in range(len(word) - 1):
                pairs[(word[i], word[i + 1])] += freq
        if not pairs:
            break
        best_count = max(pairs.values())
        if best_count < 2:
            break
        best = min(p for p, c in pairs.items() if c == best_count)
        merges.append(best)
        joined = best[0] + best[1]
        new_vocab = {}
        for word, freq in vocab.items():
            out, i = [], 0
            while i < len(word):
                if i + 1 < len(word) and (word[i], word[i + 1]) == best:
                    out.append(joined)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_vocab[tuple(out)] = freq
        vocab = new_vocab
    return merges


def ap_at_k(ranked, rel_map: dict, num_rel: int) -> float:
    """AP per operators/eval.py (reference RetrievedResults.java:150-170):
    binary threshold rel >= MIN_REL, denominator = #qrels with
    rel >= MIN_REL, 0 when that is 0."""
    if num_rel == 0:
        return 0.0
    cum, s = 0, 0.0
    for doc_id, rank, _score in ranked:
        if rel_map.get(doc_id, 0) >= MIN_REL:
            cum += 1
            s += cum / rank
    return s / num_rel


def main() -> None:
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet')"
        " ORDER BY doc_id"
    ).fetchall()

    # --- BPE train over plain-Python word frequencies ------------------
    wf: Counter = Counter()
    doc_words: dict[object, list[str]] = {}
    for doc_id, text in rows:
        ws = [w for w in text.lower().split() if w]
        doc_words[doc_id] = ws
        wf.update(ws)
    merges = train_merges(dict(wf), NUM_MERGES)
    model = BPEModel(merges=merges)

    # --- encode corpus + queries, build the whitespace subword index ---
    enc_cache: dict[str, str] = {}

    def enc_text(words: list[str]) -> str:
        out = []
        for w in words:
            if w not in enc_cache:
                enc_cache[w] = " ".join(model.encode_word(w))
            out.append(enc_cache[w])
        return " ".join(out)

    bpe_docs = [(doc_id, enc_text(ws)) for doc_id, ws in doc_words.items()]
    idx = build_pyindex(bpe_docs, analyzer="whitespace", fold_numbers=False)

    enc_queries = {
        qid: enc_text([w for w in qtext.lower().split() if w])
        for qid, qtext in QUERYSET
    }

    # --- deterministic qrels: graded whole-word containment ------------
    stops = stopwords()
    qrels: list[list] = []
    rel_by_q: dict[str, dict] = {}
    for qid, qtext in QUERYSET:
        content = [w for w in qtext.lower().split() if w not in stops]
        if not content:
            continue
        rel_by_q[qid] = {}
        for doc_id, ws in doc_words.items():
            dset = set(ws)
            hits = sum(1 for w in content if w in dset)
            if hits == len(content):
                rel = 2
            elif hits > 0:
                rel = 1
            else:
                continue
            qrels.append([qid, int(doc_id), rel])
            rel_by_q[qid][doc_id] = rel

    # --- LM-Dirichlet mu sweep over the subword index ------------------
    maps: dict[str, float] = {}
    runs: dict[float, dict] = {}
    for mu in MUS:
        aps = []
        runs[mu] = {}
        for qid, _qtext in QUERYSET:
            ranked = topk_query(
                idx, enc_queries[qid], k=K, model="lmdir", mu=mu
            )
            runs[mu][qid] = ranked
            if not ranked:
                continue  # queries absent from the run don't enter MAP
            rel_map = rel_by_q.get(qid, {})
            num_rel = sum(1 for r in rel_map.values() if r >= MIN_REL)
            aps.append(ap_at_k(ranked, rel_map, num_rel))
        maps[str(mu)] = sum(aps) / len(aps) if aps else 0.0
    best_mu = max(MUS, key=lambda m: (maps[str(m)], -m))

    golden = {
        "sf_dir": SF_DIR,
        "num_merges": NUM_MERGES,
        "mus": list(MUS),
        "k": K,
        "merges": [list(m) for m in merges],
        "encoded_queries": enc_queries,
        "qrels": sorted(qrels),
        "maps": maps,
        "best_mu": best_mu,
        "best_run_top10": {
            qid: [[int(d), r, round(s, 10)] for d, r, s in ranked[:10]]
            for qid, ranked in runs[best_mu].items()
        },
    }
    out = os.path.join(os.path.dirname(__file__), "bpe_musweep.json")
    with open(out, "w") as f:
        json.dump(golden, f, indent=1)
    print(f"wrote {out}: {len(merges)} merges, best_mu={best_mu}, "
          f"maps={maps}")


if __name__ == "__main__":
    main()
