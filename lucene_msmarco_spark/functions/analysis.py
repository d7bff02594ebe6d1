"""Text analysis — the engine's analog of the reference's Lucene analyzer
chain (``indexing/MsMarcoIndexer.java:25-46``, ``utils/IndexUtils.java:64-86``):

    StandardTokenizer (UAX#29) -> EnglishPossessiveFilter -> LowerCaseFilter
      -> StopFilter(custom 571-word stop.txt) -> PorterStemFilter

Three analyzers are provided:

- ``english``  — full parity chain, as an Arrow-vectorized pandas UDF
  (tokenization + Porter cannot be expressed with Spark built-ins). The
  UDF memoizes per-token work across the Arrow batch, so the Python cost
  is O(unique tokens), not O(tokens).
- ``simple``   — lowercase, ``[a-z0-9_]+`` extraction, stopword removal,
  NO stemming. Expressed entirely with built-in ``pyspark.sql.functions``
  (JVM-side, whole-stage-codegen) and exactly reproducible in ANSI SQL /
  DuckDB — this is the analyzer used for the driver's DuckDB-oracle
  correctness gate, where the oracle cannot run Porter.
- ``whitespace`` — the reference's fallback analyzer
  (``MsMarcoIndexer.java:27-29``): split on whitespace, no other transform.

Number folding (T2, ``MsMarcoIndexer.java:62-64``): documents have
``(-)?\\d+(\\.\\d*)?`` replaced by `` _NUM_ `` at index time; queries do NOT
(the reference builds the normalized query map but discards the result —
``OneStepRetriever.java:93-103`` — and we reproduce that asymmetry exactly
for rank parity).
"""

from __future__ import annotations

import re
from functools import lru_cache
from importlib import resources

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .porter import porter_stem

# T2 — number folding regex, identical to MsMarcoIndexer.java:63.
NUM_PATTERN = r"(-)?\d+(\.\d*)?"
NUM_TOKEN = " _NUM_ "

# UAX#29-lite word pattern (ASCII-centric approximation of Lucene's
# StandardTokenizer): runs of word chars, optionally joined by a single
# apostrophe / typographic apostrophe / period when followed by more word
# chars (MidNumLet behavior: "can't", "U.S.A", "3.14" stay single tokens;
# trailing punctuation never attaches).
_WORD_RE = re.compile(r"\w+(?:['’.]\w+)*", re.UNICODE)

# EnglishPossessiveFilter: strip a trailing 's / ’s (case handled before
# lowercasing in Lucene; we match case-insensitively which is equivalent
# given LowerCaseFilter follows immediately).
_POSSESSIVE_RE = re.compile(r"['’][sS]$")


@lru_cache(maxsize=1)
def stopwords() -> frozenset[str]:
    """The reference's custom 571-word stoplist (/root/reference/stop.txt,
    loaded at MsMarcoIndexer.java:31-36), checked in verbatim as data."""
    text = (
        resources.files("lucene_msmarco_spark")
        .joinpath("data/stop.txt")
        .read_text(encoding="utf-8")
    )
    return frozenset(w.strip() for w in text.splitlines() if w.strip())


def fold_numbers_str(text: str) -> str:
    return re.sub(NUM_PATTERN, NUM_TOKEN, text)


def analyze_english(text: str) -> list[str]:
    """Single-string english analyzer (driver-side / oracle use)."""
    stops = stopwords()
    out: list[str] = []
    for raw in _WORD_RE.findall(text):
        tok = _POSSESSIVE_RE.sub("", raw).lower()
        if not tok or tok in stops:
            continue
        out.append(porter_stem(tok))
    return out


def analyze_simple(text: str) -> list[str]:
    """Single-string simple analyzer (must match simple_tokens_col/SQL)."""
    stops = stopwords()
    return [
        t
        for t in re.findall(r"[a-z0-9_]+", text.lower())
        if t not in stops
    ]


def analyze_whitespace(text: str) -> list[str]:
    return text.split()


_ANALYZERS = {
    "english": analyze_english,
    "simple": analyze_simple,
    "whitespace": analyze_whitespace,
}


def analyze_str(text: str, analyzer: str = "english") -> list[str]:
    return _ANALYZERS[analyzer](text)


# --------------------------------------------------------------------------
# Spark-side vectorized analyzers
# --------------------------------------------------------------------------

def _tokenize_english_batch(texts: pd.Series) -> pd.Series:
    """Arrow-vectorized english analyzer. Memoizes the per-token transform
    (possessive+lower+stop+Porter) across the batch; for Zipfian text the
    unique-token set is tiny relative to the token stream, so per-batch
    Python cost approaches O(batch chars) for the regex scan alone."""
    stops = stopwords()
    token_cache: dict[str, str | None] = {}

    def norm(raw: str) -> str | None:
        hit = token_cache.get(raw, "")
        if hit != "":
            return hit
        tok = _POSSESSIVE_RE.sub("", raw).lower()
        res = None if (not tok or tok in stops) else porter_stem(tok)
        token_cache[raw] = res
        return res

    def go(text: str | None) -> list[str]:
        if not text:
            return []
        return [t for t in map(norm, _WORD_RE.findall(text)) if t is not None]

    return texts.map(go)


_tokenize_english_udf = None


def tokenize_english(col: Column) -> Column:
    """Lazily-registered pandas UDF (pyspark 4.x parses return types against
    the active session, so registration can't happen at import time)."""
    global _tokenize_english_udf
    if _tokenize_english_udf is None:
        from pyspark.sql.types import ArrayType, StringType

        _tokenize_english_udf = pandas_udf(
            _tokenize_english_batch, ArrayType(StringType())
        )
    return _tokenize_english_udf(col)


def fold_numbers_col(col: Column) -> Column:
    """T2 number folding as a JVM-side expression (identical semantics in
    Spark and DuckDB: both use the same regex with a space-padded token)."""
    return F.regexp_replace(col, NUM_PATTERN, NUM_TOKEN)


def simple_tokens_col(col: Column) -> Column:
    """``simple`` analyzer tokenization as pure built-in expressions — stays
    inside whole-stage codegen, no Python. Mirror of :func:`analyze_simple`
    (minus the stop filter) and of the DuckDB SQL used by the correctness
    oracle. NOTE: duplicates are preserved (tf semantics); stopword removal
    happens after explode via :func:`not_stopword` (compiles to InSet) so
    it cannot accidentally dedupe (``array_except`` is a set op)."""
    return F.regexp_extract_all(F.lower(col), F.lit("[a-z0-9_]+"), 0)


def not_stopword(term: Column) -> Column:
    """Boolean filter for an exploded term column, JVM-side.

    Implementation note: ``Column.isin(*570 literals)`` triggers a
    pathological Catalyst analysis slowdown (~90s per query on Spark 4.1);
    ``array_contains`` against a single literal array is ~50x faster to
    plan and identical in result."""
    return ~F.array_contains(F.lit(sorted(stopwords())), term)


def whitespace_tokens_col(col: Column) -> Column:
    return F.split(F.trim(col), r"\s+")


def tokens_col(col: Column, analyzer: str = "english") -> Column:
    """Dispatch: analyzed token array for a text column."""
    if analyzer == "english":
        return tokenize_english(col)
    if analyzer == "simple":
        return simple_tokens_col(col)
    if analyzer == "whitespace":
        return whitespace_tokens_col(col)
    raise ValueError(f"unknown analyzer {analyzer!r}")
