"""Validity proofs behind the ``bpe_encode`` contract row.

The SQL twin in ``entry_queries.build_sql("bpe_encode")`` applies each
``BPE_MERGESET`` rule ONCE, in rank order, as a delimiter-guarded
``replace``; the engine (``functions.bpe.BPEModel.encode_word``) runs
the greedy lowest-rank merge loop.  Their equivalence rests on the
merge list being *causally ordered* (every compound token in pair i was
produced by an earlier merge j < i) — this module asserts that
invariant directly, brute-checks the two encoders word-by-word over the
sf0.001 corpus vocabulary plus seeded synthetic words, and pins that
``BPE_MERGESET`` is literally the first 32 merges ``train_bpe`` learns
from the alnum-cleaned sf0.001 documents table.
"""

from __future__ import annotations

import os
import random
import re

import duckdb
import pytest
from pyspark.sql import functions as F

from lucene_msmarco_spark.entry_queries import BPE_MERGESET
from lucene_msmarco_spark.functions.bpe import END, BPEModel, train_bpe

SF_DIR = os.environ.get("LMS_TEST_SF_DIR", "/root/testdata/sf0.001")
TRAIN_SF_DIR = "/root/testdata/sf0.001"  # the mergeset's training corpus


def _atomic(tok: str) -> bool:
    """A unit that exists before any merge: one char, or the END marker."""
    return tok == END or (len(tok) == 1 and END not in tok)


def _sequential_encode(word: str) -> list[str]:
    """Python mirror of the SQL twin: wrap every unit in '#...#', apply
    each rule once in rank order as a left-to-right replace-all, strip
    END, drop empties."""
    s = "".join(f"#{c}#" for c in word) + f"#{END}#"
    for u, v in BPE_MERGESET:
        s = s.replace(f"#{u}##{v}#", f"#{u}{v}#")
    s = s.replace(END, "")
    return [t for t in s.split("#") if t]


def test_mergeset_causally_ordered():
    """Every token of pair i is atomic or the output of a merge j < i —
    the property that makes rank-order sequential replacement equal to
    the greedy lowest-rank loop (rule i can never create or re-enable
    an opportunity for a rule <= i)."""
    produced: set[str] = set()
    for i, (u, v) in enumerate(BPE_MERGESET):
        for tok in (u, v):
            assert _atomic(tok) or tok in produced, (
                f"rule {i} ({u!r},{v!r}): token {tok!r} is compound but "
                "not produced by any earlier merge"
            )
        assert u + v not in produced, f"rule {i} duplicates {u + v!r}"
        produced.add(u + v)


def test_mergeset_tokens_word_safe():
    """The twin's delimiters can never collide with word content: words
    are [a-z0-9_]+ on both sides, so '#' and '<'/'>' are reserved."""
    for u, v in BPE_MERGESET:
        for tok in (u, v):
            base = tok[: -len(END)] if tok.endswith(END) else tok
            assert re.fullmatch(r"[a-z0-9_]*", base), tok


def _corpus_words() -> list[str]:
    con = duckdb.connect()
    rows = con.execute(
        "SELECT DISTINCT unnest(regexp_extract_all(lower(text), "
        "'[a-z0-9_]+')) AS w "
        f"FROM read_parquet('{SF_DIR}/documents.parquet') ORDER BY w"
    ).fetchall()
    con.close()
    return [r[0] for r in rows]


def test_sequential_equals_greedy_on_corpus():
    words = _corpus_words()
    assert len(words) >= 25  # the synthetic corpus vocabulary (31 at sf0.001)
    model = BPEModel(merges=list(BPE_MERGESET))
    for w in words:
        assert model.encode_word(w) == _sequential_encode(w), w


def test_sequential_equals_greedy_on_synthetic():
    """Seeded adversarial words: repeats, overlaps ('aaaa' under (a,a)),
    merge-output characters abutting each other, digits/underscore."""
    model = BPEModel(merges=list(BPE_MERGESET))
    alphabet = "acdeghilmnoprstuwy01_"
    rng = random.Random(314152)
    words = ["", "a", "aa", "aaaa", "erer", "inin", "columnn", "wwindow",
             "scancan", "orderorder", "lulu", "ttttt", "0_9"]
    words += ["".join(rng.choice(alphabet) for _ in range(rng.randint(1, 14)))
              for _ in range(500)]
    for w in words:
        assert model.encode_word(w) == _sequential_encode(w), w


@pytest.mark.slow
def test_mergeset_is_first_32_trained_merges(spark):
    """BPE_MERGESET == train_bpe(sf0.001 documents, 32) over the same
    alnum-cleaned lowercased text the contract row normalizes to."""
    docs = spark.read.parquet(f"{TRAIN_SF_DIR}/documents.parquet").select(
        "doc_id",
        F.array_join(
            F.expr("regexp_extract_all(lower(text), '[a-z0-9_]+', 0)"), " "
        ).alias("text"),
    ).filter(F.col("text") != "")
    model = train_bpe(docs, num_merges=32)
    assert model.merges == list(BPE_MERGESET)
