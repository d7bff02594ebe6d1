"""Deterministic synthetic transcripts — the engine's primary input shape
per BASELINE.json ``input_hint``:

    transcripts(conv_id string, turn_idx int, role string, text string,
                tool string, ts timestamp)

Pure function of (seed, n_turns) — FIXTURES.md §1. Text is drawn from a
seeded Zipf(1.1) vocabulary plus injected edge cases (numbers -> _NUM_
folding, possessives, stopwords, mixed case, punctuation, empty, unicode).

Generation is distributed: ``spark.range(n)`` -> per-row deterministic
derivation via JVM-side hash mixing where possible and a seeded
``mapInPandas`` for the text itself (each row's text depends only on
(seed, global row index), so any partitioning yields the same table).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROLES = ("user", "assistant", "tool")
_BASE_TS = np.datetime64("2026-01-01T00:00:00")

_EDGE_SNIPPETS = (
    "alice's report 3.14",
    "the and of to",          # stopwords only
    "Running RUNS runner",    # case + stemming family
    "naïve café übung",       # unicode
    "a -7 b 1999 c 0.5",      # numbers incl. negative/decimal
    "",                        # empty
    "don't can't won't",      # apostrophes
    "U.S.A. agenda item",     # UAX#29 mid-letter dots
)


def _vocab(seed: int, size: int = 5000) -> np.ndarray:
    rng = np.random.default_rng(seed)
    syll = np.array([
        "ta", "ri", "mo", "ke", "lu", "san", "ver", "qua", "zed", "pol",
        "gra", "min", "dor", "fex", "bi", "cu", "nor", "wi", "ya", "sto",
    ])
    parts = rng.integers(0, len(syll), size=(size, 3))
    words = np.array(["".join(syll[p] for p in row) for row in parts])
    # ensure uniqueness by suffixing duplicates with their index
    seen: dict[str, int] = {}
    out = []
    for i, w in enumerate(words):
        if w in seen:
            out.append(f"{w}{i}")
        else:
            seen[w] = i
            out.append(w)
    return np.array(out)


def generate_transcripts_pdf(seed: int, start: int, count: int,
                             n_convs: int) -> pd.DataFrame:
    """Rows [start, start+count) of the canonical transcript table."""
    vocab = _vocab(seed)
    # Zipf ranks: probability ∝ 1/rank^1.1 over the vocab
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    probs = ranks ** -1.1
    probs /= probs.sum()

    rows = []
    for gi in range(start, start + count):
        rng = np.random.default_rng((seed << 20) ^ gi)  # per-row determinism
        conv = gi % n_convs
        turn = gi // n_convs
        role = ROLES[gi % 3]
        n_tok = int(rng.integers(5, 121))
        words = rng.choice(vocab, size=n_tok, p=probs)
        text = " ".join(words)
        if gi % 13 == 0:  # inject an edge snippet deterministically
            text = (_EDGE_SNIPPETS[(gi // 13) % len(_EDGE_SNIPPETS)]
                    + (" " + text if text else ""))
        rows.append((
            f"conv{conv:08d}",
            turn,
            role,
            text,
            f"tool{gi % 7}" if role == "tool" else None,
            _BASE_TS + np.timedelta64(gi, "s"),
        ))
    return pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )


TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def generate_transcripts(
    spark: SparkSession,
    n_turns: int = 20_000,
    seed: int = 42,
    n_convs: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic generator; same table for any partitioning."""
    n_convs = n_convs or max(1, n_turns // 8)

    def gen(batches):
        for pdf in batches:
            idxs = pdf["id"].values
            if len(idxs) == 0:
                continue
            # rows are contiguous within spark.range partitions
            yield generate_transcripts_pdf(
                seed, int(idxs[0]), len(idxs), n_convs
            )

    rng_df = spark.range(0, n_turns, numPartitions=num_partitions)
    return rng_df.mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)


def transcripts_local(n_turns: int = 200, seed: int = 42,
                      n_convs: int | None = None) -> pd.DataFrame:
    """Driver-side tiny fixture (unit tests / oracle input)."""
    n_convs = n_convs or max(1, n_turns // 8)
    return generate_transcripts_pdf(seed, 0, n_turns, n_convs)
