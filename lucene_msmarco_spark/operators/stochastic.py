"""Stochastic rank perturbation for QPP robustness studies
(SURVEY.md §2.9, H5-H7).

Provenance (/root/reference/src/main/java/stochastic_qpp):

H5 RankSwapper — ``RankSwapper.java:19-141``: for one query's ranked
   list, enumerate every permutation that swaps one rel rank with one
   nonrel rank (identity always included; with TOPDOC_ALWAYS_SWAPPED the
   rank-0 doc is treated as a rel rank). A "swap" keeps the SCORES at
   each rank and moves only the doc ids (``swapRanks`` keeps
   ``scoreDocs[i].score`` in place). ``sample()`` draws with
   replacement; ``shuffle()`` applies NUM_SHUFFLES=50 random swaps.
   The reference uses unseeded ``Math.random()`` — the engine takes an
   explicit seed (SURVEY.md §5: must be deterministic).
H6 AttributeValueBasedSwapper — ``AttributeValueBasedSwapper.java:21-53``:
   identical mechanics with rel/nonrel replaced by a binary document
   attribute; pass that attribute as the ``rel`` column.
H7 StochasticQPPEvaluation — ``StochasticQPPEvaluation.java:94-227``:
   per cutoff, draw ``num_samples`` perturbed lists per query, recompute
   the IR metric and the QPP estimate on each, aggregate correlation
   deltas. The engine exposes the sampling (this module) + metric/QPP
   layers (operators/eval.py, operators/qpp.py) + correlation kernels
   (operators/correlation.py); the experiment loop composes them.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _rng(qid: str, sample: int, seed: int) -> np.random.Generator:
    return np.random.default_rng(
        [seed, sample, zlib.crc32(str(qid).encode("utf-8"))]
    )


def swap_permutations(
    filled_run: DataFrame,
    top_doc_always_swapped: bool = True,
    min_rel: int = 1,
) -> DataFrame:
    """H5 ``samplePermutations`` — ALL single-swap permutations.

    ``filled_run``: (qid, doc_id, rank, score, rel). Output: one row per
    (qid, perm_id, rank): (qid, perm_id, doc_id, rank, score) with
    perm_id=0 the identity. Scores stay attached to RANKS, docs move.
    """

    def one(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rank").reset_index(drop=True)
        docs = pdf["doc_id"].to_numpy()
        scores = pdf["score"].to_numpy()
        rel = (pdf["rel"].to_numpy() >= min_rel)
        n = len(pdf)
        rel_ranks = set(np.flatnonzero(rel).tolist())
        if top_doc_always_swapped and n:
            rel_ranks.add(0)
        nonrel_ranks = [i for i in range(n) if not rel[i]]
        perms = [docs]
        for r in sorted(rel_ranks):
            for nr in nonrel_ranks:
                if nr == r:
                    continue
                d = docs.copy()
                d[r], d[nr] = d[nr], d[r]
                perms.append(d)
        rows = {
            "qid": np.repeat(key[0], n * len(perms)),
            "perm_id": np.repeat(np.arange(len(perms)), n),
            "doc_id": np.concatenate(perms),
            "rank": np.tile(np.arange(1, n + 1), len(perms)),
            "score": np.tile(scores, len(perms)),
        }
        return pd.DataFrame(rows)

    # doc_id keeps the input run's type (read_res yields string ids;
    # the synthetic fixtures long) — the swap kernels are type-generic
    doc_t = filled_run.schema["doc_id"].dataType.simpleString()
    return filled_run.groupBy("qid").applyInPandas(
        one,
        schema=(
            f"qid string, perm_id int, doc_id {doc_t}, rank int,"
            " score double"
        ),
    )


def sample_swapped_runs(
    filled_run: DataFrame,
    num_samples: int,
    seed: int = 31415,
    top_doc_always_swapped: bool = True,
    min_rel: int = 1,
    permute: str = "rng",
) -> DataFrame:
    """H5 ``sample()`` — ``num_samples`` draws (with replacement) from the
    swap-permutation set of each query. Output: (qid, sample, doc_id,
    rank, score).

    ``permute``: "rng" (default — the reference's random draw, made
    deterministic by the explicit seed) or "md5" — pick for (qid, s) =
    argmin over pick ids p in 0..len(pairs) of
    md5(f"{seed}:{s}:{qid}:{p}") — the SQL-expressible seeded draw
    (the same device as ``qpp._permutation``), used by the
    ``qpp_stoch_eval`` contract query. Pick id 0 is the identity and
    pick id p>0 is the (r ASC, nr ASC)-ordered swap pair p-1, i.e. the
    perm_id numbering of ``swap_permutations``."""

    def one(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rank").reset_index(drop=True)
        docs = pdf["doc_id"].to_numpy()
        scores = pdf["score"].to_numpy()
        rel = (pdf["rel"].to_numpy() >= min_rel)
        n = len(pdf)
        rel_ranks = sorted(
            set(np.flatnonzero(rel).tolist())
            | ({0} if (top_doc_always_swapped and n) else set())
        )
        nonrel_ranks = [i for i in range(n) if not rel[i]]
        pairs = [(r, nr) for r in rel_ranks for nr in nonrel_ranks
                 if nr != r]
        outs = []
        for s in range(num_samples):
            if permute == "md5":
                import hashlib

                pick = min(
                    range(len(pairs) + 1),
                    key=lambda p: (
                        hashlib.md5(
                            f"{seed}:{s}:{key[0]}:{p}".encode()
                        ).hexdigest(),
                        p,
                    ),
                )
            else:
                rng = _rng(key[0], s, seed)
                pick = int(rng.integers(0, len(pairs) + 1))  # 0=identity
            d = docs.copy()
            if pick > 0:
                r, nr = pairs[pick - 1]
                d[r], d[nr] = d[nr], d[r]
            outs.append(pd.DataFrame({
                "qid": np.repeat(key[0], n),
                "sample": np.repeat(s, n),
                "doc_id": d,
                "rank": np.arange(1, n + 1),
                "score": scores,
            }))
        return pd.concat(outs, ignore_index=True)

    doc_t = filled_run.schema["doc_id"].dataType.simpleString()
    return filled_run.groupBy("qid").applyInPandas(
        one,
        schema=(
            f"qid string, sample int, doc_id {doc_t}, rank int,"
            " score double"
        ),
    )


def shuffled_runs(
    filled_run: DataFrame,
    num_samples: int,
    num_shuffles: int = 50,
    seed: int = 31415,
    top_doc_always_swapped: bool = True,
    min_rel: int = 1,
) -> DataFrame:
    """H5 ``shuffle()`` — ``num_shuffles`` successive random swaps
    (rel-rank x random-other-rank; Constants.NUM_SHUFFLES=50,
    TOPDOC_ALWAYS_SWAPPED pins the rel side to rank 0)."""

    def one(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rank").reset_index(drop=True)
        docs = pdf["doc_id"].to_numpy()
        scores = pdf["score"].to_numpy()
        n = len(pdf)
        outs = []
        for s in range(num_samples):
            rng = _rng(key[0], s, seed)
            d = docs.copy()
            # n < 2: no swap partner exists (rng.integers(0, 0) raises);
            # the only permutation is the identity
            for _ in range(num_shuffles if n >= 2 else 0):
                r = 0 if top_doc_always_swapped else int(
                    rng.integers(0, n)
                )
                nr = int(rng.integers(0, n - 1))
                if nr >= r:
                    nr += 1
                d[r], d[nr] = d[nr], d[r]
            outs.append(pd.DataFrame({
                "qid": np.repeat(key[0], n),
                "sample": np.repeat(s, n),
                "doc_id": d,
                "rank": np.arange(1, n + 1),
                "score": scores,
            }))
        return pd.concat(outs, ignore_index=True)

    doc_t = filled_run.schema["doc_id"].dataType.simpleString()
    return filled_run.groupBy("qid").applyInPandas(
        one,
        schema=(
            f"qid string, sample int, doc_id {doc_t}, rank int,"
            " score double"
        ),
    )


def attribute_swapped_runs(
    run: DataFrame,
    doc_attributes: DataFrame,
    num_samples: int,
    seed: int = 31415,
    attr_col: str = "attr",
) -> DataFrame:
    """H6 — swap docs carrying attribute=1 with attribute=0 docs.
    ``doc_attributes``: (doc_id, <attr_col> int)."""
    filled = run.join(
        F.broadcast(doc_attributes.select(
            "doc_id", F.col(attr_col).alias("rel")
        )),
        "doc_id", "left",
    ).fillna(0, subset=["rel"])
    return sample_swapped_runs(
        filled, num_samples, seed=seed, top_doc_always_swapped=False
    )
