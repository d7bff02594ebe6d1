"""Generate the quantized-norm (Lucene SmallFloat4) BM25 golden fixture.

Run from the repo root:  python tests/golden/gen_smallfloat_fixture.py

COMPLETELY self-contained: no engine imports. It re-derives, directly
from the public Apache Lucene semantics, the exact scoring pipeline a
Lucene 8.x searcher applies to a whitespace-analyzed corpus:

  1. doclen = token count per doc;
  2. norm byte = ``SmallFloat.intToByte4(doclen)`` (4-mantissa-bit
     float-like byte, values < 24 free/exact — transcribed below from
     the documented public behavior, NOT imported from the engine);
  3. scored length = ``SmallFloat.byte4ToInt(norm)``;
  4. per-term BM25 (k1=0.9, b=0.4, the reference's
     ``retrieval/Constants.java`` parameters) with
     idf = ln(1 + (N - df + 0.5)/(df + 0.5)) and
     tf_norm = tf / (tf + k1*(1 - b + b*quantized_dl/avgdl)).

Lucene 8 dropped the classic (k1+1) numerator factor (LUCENE-8563); the
engine keeps it (reference parity) — a constant positive factor, so the
fixture stores the Lucene-8-form scores and the test multiplies by
(k1+1). avgdl in Lucene is computed from the EXACT total token count
(sumTotalTermFreq / docCount), not from quantized lengths — mirrored
here.

The corpus is deterministic and chosen so quantization bites: doc
lengths span the exact range (< 32), the 2-step range and the coarse
ranges (up to 1500 tokens, where codes are > 128 apart).
"""

from __future__ import annotations

import json
import math
import os
import random

OUT = os.path.join(os.path.dirname(__file__), "smallfloat_bm25.json")

K1, B = 0.9, 0.4

WORDS = [
    "alpha", "bravo", "delta", "echo", "foxtrot", "golf", "hotel",
    "india", "juliet", "kilo", "lima", "mike", "november", "oscar",
    "papa", "quebec", "romeo", "sierra", "tango", "uniform",
]

#: (doc_id, target length) — spans free/exact codes (<24), subnormal
#: (24..31), 2-step (40..55), and coarse ranges where quantization
#: drops many tokens
DOC_LENGTHS = [5, 17, 24, 31, 41, 55, 90, 130, 200, 333, 700, 1500]


def small_float_int_to_byte4(i: int) -> int:
    """Public ``org.apache.lucene.util.SmallFloat.intToByte4``: values
    below 24 are stored exactly; otherwise j = i - 24 is stored as a
    4-mantissa-bit float-like code (exact while j < 8)."""
    assert i >= 0
    if i < 24:
        return i
    j = i - 24
    num_bits = j.bit_length()
    if num_bits < 4:
        return 24 + j
    shift = num_bits - 4
    return 24 + (((j >> shift) & 0x07) | ((shift + 1) << 3))


def small_float_byte4_to_int(b: int) -> int:
    """Public ``SmallFloat.byte4ToInt`` — decode of the byte above."""
    if b < 24:
        return b
    j = b - 24
    bits = j & 0x07
    shift = (j >> 3) - 1
    if shift == -1:
        return 24 + bits
    return 24 + ((bits | 0x08) << shift)


def make_corpus() -> list[tuple[int, str]]:
    rng = random.Random(20260817)
    docs = []
    for doc_id, n in enumerate(DOC_LENGTHS):
        toks = [WORDS[rng.randrange(len(WORDS))] for _ in range(n)]
        # make sure every doc contains at least one query term
        toks[0] = WORDS[doc_id % 4]
        docs.append((doc_id, " ".join(toks)))
    return docs


def main() -> None:
    docs = make_corpus()
    tokenized = {d: t.split() for d, t in docs}
    n_docs = len(docs)
    exact_dl = {d: len(toks) for d, toks in tokenized.items()}
    avgdl = sum(exact_dl.values()) / n_docs
    scored_dl = {
        d: small_float_byte4_to_int(small_float_int_to_byte4(dl))
        for d, dl in exact_dl.items()
    }
    # postings
    tf: dict[str, dict[int, int]] = {}
    for d, toks in tokenized.items():
        for t in toks:
            tf.setdefault(t, {}).setdefault(d, 0)
            tf[t][d] += 1
    queries = {
        "qa": "alpha",
        "qb": "bravo delta",
        "qc": "echo echo golf",      # duplicate query term -> qtf 2
        "qd": "alpha zulu",          # one OOV term
    }
    runs = {}
    for qid, qtext in queries.items():
        qtf: dict[str, int] = {}
        for t in qtext.split():
            qtf[t] = qtf.get(t, 0) + 1
        scores: dict[int, float] = {}
        for t, n_q in qtf.items():
            if t not in tf:
                continue
            df = len(tf[t])
            idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
            for d, f in tf[t].items():
                dl = float(scored_dl[d])
                tfn = f / (f + K1 * (1.0 - B + B * dl / avgdl))
                scores[d] = scores.get(d, 0.0) + n_q * idf * tfn
        top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        runs[qid] = [[d, s] for d, s in top]
    with open(OUT, "w") as f:
        json.dump({
            "k1": K1, "b": B, "avgdl": avgdl, "n_docs": n_docs,
            "docs": [[d, t] for d, t in docs],
            "exact_doclen": {str(d): v for d, v in exact_dl.items()},
            "scored_doclen": {str(d): v for d, v in scored_dl.items()},
            "queries": queries,
            "runs_lucene8_form": runs,
        }, f, indent=1)
    print(f"wrote {OUT}: {len(docs)} docs, {len(queries)} queries")


if __name__ == "__main__":
    main()
