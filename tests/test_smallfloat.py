"""SmallFloat4 norm quantization: pure-Python reference vs known Lucene
properties, the Column form vs the reference, and the BM25 flag wiring."""

from __future__ import annotations

from lucene_msmarco_spark.functions.smallfloat import (
    NUM_FREE_VALUES,
    py_byte4_to_int,
    py_int_to_byte4,
    py_quantize,
)


def test_reference_known_values():
    # free values 0..23 and subnormals 24..31 are exact
    for i in range(40):
        assert py_quantize(i) == i
    # normal range: steps of 2 in [40, 56)
    assert py_quantize(40) == 40
    assert py_quantize(41) == 40
    assert py_quantize(42) == 42
    assert py_quantize(55) == 54
    # encode stays in one unsigned byte over the full int range
    for i in [0, 1, 23, 24, 31, 32, 1000, 10**6, 2**31 - 1]:
        b = py_int_to_byte4(i)
        assert 0 <= b <= 255
        assert py_byte4_to_int(b) <= i  # truncation, never rounds up
    assert py_int_to_byte4(2**31 - 1) == 255


def test_reference_monotone_idempotent():
    prev = -1
    for i in range(0, 4000, 7):
        q = py_quantize(i)
        assert q <= i
        assert q >= prev            # monotone non-decreasing
        assert py_quantize(q) == q  # idempotent (q is representable)
        prev = q
    # at most 256 distinct codes
    codes = {py_int_to_byte4(i) for i in range(100_000)}
    assert len(codes) <= 256


def test_column_matches_reference(spark):
    from pyspark.sql import functions as F

    from lucene_msmarco_spark.functions.smallfloat import smallfloat4_doclen

    vals = list(range(0, 300)) + [2**k for k in range(9, 30)] + [
        2**k - 1 for k in range(9, 30)
    ] + [123456, 999999, 2**31 - 1]
    df = spark.createDataFrame([(v,) for v in vals], "doclen long")
    got = {
        r["doclen"]: r["q"]
        for r in df.select(
            "doclen", smallfloat4_doclen(F.col("doclen")).alias("q")
        ).collect()
    }
    for v in vals:
        assert got[v] == py_quantize(v), v


def test_bm25_flag_wiring(spark):
    """flag off => bit-identical to the plain formula; flag on =>
    scores computed with the quantized doclen."""
    import math

    from pyspark.sql import functions as F

    from lucene_msmarco_spark.config import BM25Config
    from lucene_msmarco_spark.functions.scoring import bm25_weight

    rows = [(5.0, 3.0, 57.0), (2.0, 10.0, 201.0), (1.0, 1.0, 41.0)]
    df = spark.createDataFrame(rows, "tf double, df double, doclen double")
    n_docs, avgdl = 1000.0, 60.0

    def expect(tf, dfv, dl):
        idf = math.log(1 + (n_docs - dfv + 0.5) / (dfv + 0.5))
        return idf * tf * 1.9 / (tf + 0.9 * (1 - 0.4 + 0.4 * dl / avgdl))

    off = df.select(bm25_weight(
        F.col("tf"), F.col("df"), F.col("doclen"), n_docs, avgdl,
        BM25Config(),
    ).alias("w")).collect()
    for r, (tf, dfv, dl) in zip(off, rows):
        assert abs(r["w"] - expect(tf, dfv, dl)) < 1e-12

    on = df.select(bm25_weight(
        F.col("tf"), F.col("df"), F.col("doclen"), n_docs, avgdl,
        BM25Config(smallfloat_norms=True),
    ).alias("w")).collect()
    for r, (tf, dfv, dl) in zip(on, rows):
        assert abs(r["w"] - expect(tf, dfv, float(py_quantize(int(dl))))) \
            < 1e-12
    # doclen 201 quantizes to 200, 41 quantizes to 40 — scores differ
    assert abs(on[1]["w"] - off[1]["w"]) > 1e-9
    assert abs(on[2]["w"] - off[2]["w"]) > 1e-9
    assert NUM_FREE_VALUES == 24
