"""Analyzer parity suite (FIXTURES.md §6) — golden vectors hand-audited
against the reference chain semantics (StandardTokenizer -> possessive ->
lower -> stop(stop.txt) -> Porter; ``indexing/MsMarcoIndexer.java:25-46``)."""

from __future__ import annotations

import pandas as pd
import pytest

from lucene_msmarco_spark.functions.analysis import (
    analyze_english,
    analyze_simple,
    fold_numbers_str,
    stopwords,
)
from lucene_msmarco_spark.functions.porter import porter_stem

# (raw, expected english-analyzed tokens)
GOLDEN = [
    ("alice's report", ["alic", "report"]),
    ("Running RUNS runner", ["run", "run", "runner"]),
    ("the and of to", []),  # all stopwords
    ("", []),
    ("   ", []),
    ("don't can't stop won't", ["stop"]),  # don't/can't/won't all in stop.txt
    ("U.S.A. agenda item", ["u.s.a", "agenda", "item"]),
    ("caresses ponies relational", ["caress", "poni", "relat"]),
    ("naïve café", ["naïv", "café"]),
    ("pre-processing steps", ["pre", "process", "step"]),
]


@pytest.mark.parametrize("raw,expected", GOLDEN)
def test_english_golden(raw, expected):
    assert analyze_english(raw) == expected


def test_stopword_list_loaded():
    sw = stopwords()
    # stop.txt has 571 lines but "would" appears twice; Lucene's
    # CharArraySet dedupes identically -> 570 effective stopwords.
    assert len(sw) == 570
    assert "the" in sw and "a's" in sw and "zero" in sw


def test_possessive_and_case():
    assert analyze_english("ALICE'S Alice’s") == ["alic", "alic"]


def test_number_folding_docs_only():
    # T2: docs folded, queries not (reference quirk, MsMarcoIndexer.java:80
    # vs OneStepRetriever.java:93-103 discarded result)
    assert fold_numbers_str("a -7 b 1999 c 0.5") == "a  _NUM_  b  _NUM_  c  _NUM_ "
    assert analyze_english(fold_numbers_str("pi is 3.14")) == ["pi", "_num_"]
    assert analyze_english("pi is 3.14") == ["pi", "3.14"]


PORTER_VECTORS = {
    "caresses": "caress", "ponies": "poni", "ties": "ti", "cats": "cat",
    "feed": "feed", "agreed": "agre", "plastered": "plaster", "bled": "bled",
    "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file", "happy": "happi", "sky": "sky", "relational": "relat",
    "conditional": "condit", "rational": "ration", "valenci": "valenc",
    "hesitanci": "hesit", "digitizer": "digit", "conformabli": "conform",
    "radicalli": "radic", "differentli": "differ", "vileli": "vile",
    "analogousli": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit", "sensibiliti": "sensibl",
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good", "revival": "reviv", "allowance": "allow",
    "inference": "infer", "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
    "replacement": "replac", "adjustment": "adjust", "dependent": "depend",
    "adoption": "adopt", "homologou": "homolog", "communism": "commun",
    "activate": "activ", "angulariti": "angular", "homologous": "homolog",
    "effective": "effect", "bowdlerize": "bowdler", "probate": "probat",
    "rate": "rate", "cease": "ceas", "controll": "control", "roll": "roll",
    "running": "run", "runs": "run", "generalizations": "gener",
    "oscillators": "oscil",
}


def test_porter_vectors():
    for w, want in PORTER_VECTORS.items():
        assert porter_stem(w) == want, (w, porter_stem(w), want)


def test_porter_short_words_unchanged():
    for w in ["a", "is", "be", "do"]:
        assert porter_stem(w) == w


def test_simple_analyzer_python():
    assert analyze_simple("The QUICK brown-fox 42!") == ["quick", "brown", "fox", "42"]
    # stopwords removed, duplicates preserved
    assert analyze_simple("spark the spark") == ["spark", "spark"]


def test_spark_english_udf_matches_python(spark):
    texts = [r for r, _ in GOLDEN] + ["spark spark spark", None]
    pdf = pd.DataFrame({"text": texts})
    sdf = spark.createDataFrame(pdf)
    from pyspark.sql import functions as F

    from lucene_msmarco_spark.functions.analysis import tokenize_english

    got = [
        r["toks"]
        for r in sdf.select(tokenize_english(F.col("text")).alias("toks"))
        .collect()
    ]
    want = [analyze_english(t) if t else [] for t in texts]
    assert got == want


def test_spark_simple_tokens_match_python(spark):
    from pyspark.sql import functions as F

    from lucene_msmarco_spark.functions.analysis import (
        not_stopword,
        simple_tokens_col,
    )

    texts = ["The QUICK brown-fox 42!", "spark the spark", "a b c", ""]
    sdf = spark.createDataFrame(pd.DataFrame({"text": texts}))
    got = (
        sdf.select(F.posexplode(simple_tokens_col(F.col("text"))).alias("p", "term"))
        .filter(not_stopword(F.col("term")))
        .collect()
    )
    flat = [r["term"] for r in got]
    want = [t for txt in texts for t in analyze_simple(txt)]
    assert sorted(flat) == sorted(want)


@pytest.mark.parametrize("strategy", ["fused", "inline", "dictionary"])
def test_fast_strategies_match_udf_strategy(spark, strategy):
    """All vocabulary-stemmed fast paths (fused mapInPandas finisher;
    inline memoized UDF; distinct + broadcast dictionary) must produce
    EXACTLY the same index artifacts as the per-doc Arrow-UDF reference
    path, on a fixture exercising possessives, duplicate tokens, number
    folding, empty / null / stopword-only texts."""
    from lucene_msmarco_spark.operators.index import build_index

    rows = [
        (0, "The cat's mat is the cat's"),
        (1, "running runs run RUNNING"),
        (2, "call me at 415 or -3.5 ok"),
        (3, ""),
        (4, None),
        (5, "the and of a an"),
        (6, "spark spark spark window joins"),
        (7, "e.g. node.js u.s.a. don't"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fast = build_index(docs, cache=False, english_strategy=strategy)
    ref = build_index(docs, cache=False, english_strategy="udf")

    def rows_of(df, cols):
        return sorted(tuple(r) for r in df.select(*cols).collect())

    assert rows_of(fast.tokens, ["term", "doc_id", "tf", "doclen"]) == \
        rows_of(ref.tokens, ["term", "doc_id", "tf", "doclen"])
    assert rows_of(fast.doc_stats, ["doc_id", "doclen"]) == \
        rows_of(ref.doc_stats, ["doc_id", "doclen"])
    assert rows_of(fast.term_stats, ["term", "df", "cf"]) == \
        rows_of(ref.term_stats, ["term", "df", "cf"])
    assert fast.stats == ref.stats
