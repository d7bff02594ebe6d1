"""Lucene SmallFloat 4-bit norm quantization (``intToByte4`` /
``byte4ToInt``) as both a pure-Python reference and a Catalyst column
expression.

Lucene 8+ BM25 does not score with the exact document length: at index
time the length is crushed into one byte with 4 mantissa bits
(``org.apache.lucene.util.SmallFloat.intToByte4``, re-derived here from
the public Apache Lucene source semantics), and query-time scoring uses
the decoded value. Reproducing that quantization is the prerequisite for
validating engine BM25 scores against true Lucene runs, e.g. the
reference's committed golden run files
(``ColBERT-PRF-VirtualAppendix/BM25/BM25.2019.res``); with the flag off
(the default) the engine scores with exact doclen (SURVEY.md §4 pinned
decision).

Encoding shape: 255 - intToByte4(Integer.MAX_VALUE) = 24 codes are
reserved for the values 0..23, stored exactly ("free values"); for
i >= 24, j = i - 24 is stored float-like — subnormal (j < 8) exact,
otherwise truncated to its top 4 significant bits. The decode of the
encode therefore equals::

    i                              if i < 32        (free + subnormal)
    24 + (top4bits(j) << shift)    otherwise, j = i - 24

which is monotone, idempotent, and produces at most 256 distinct norms.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: 255 - MAX_INT4, with MAX_INT4 = longToInt4(Integer.MAX_VALUE) = 231
NUM_FREE_VALUES = 24


def py_long_to_int4(i: int) -> int:
    """Reference ``SmallFloat.longToInt4``."""
    if i < 0:
        raise ValueError("only non-negative values supported")
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    encoded = (i >> shift) & 0x07
    encoded |= (shift + 1) << 3
    return encoded


def py_int4_to_long(i: int) -> int:
    """Reference ``SmallFloat.int4ToLong``."""
    bits = i & 0x07
    shift = (i >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


def py_int_to_byte4(i: int) -> int:
    """Reference ``SmallFloat.intToByte4`` (returns the unsigned byte)."""
    if i < 0:
        raise ValueError("only non-negative values supported")
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + py_long_to_int4(i - NUM_FREE_VALUES)


def py_byte4_to_int(b: int) -> int:
    """Reference ``SmallFloat.byte4ToInt`` (unsigned-byte input)."""
    if b < NUM_FREE_VALUES:
        return b
    return NUM_FREE_VALUES + py_int4_to_long(b - NUM_FREE_VALUES)


def py_quantize(i: int) -> int:
    """byte4ToInt(intToByte4(i)) — the value Lucene actually scores with."""
    return py_byte4_to_int(py_int_to_byte4(i))


def np_quantize(doclen):
    """Vectorized ``py_quantize`` over an int array (numpy) — used by the
    compact-postings scoring paths so ``BM25Config.smallfloat_norms``
    gives identical scores whether the engine scores through Catalyst
    columns (``bm25_weight``) or inside an Arrow task (``bmw_search``).

    frexp's exponent IS the exact bit length for integers < 2**53, so the
    top-4-bit truncation is two exact integer shifts.
    """
    import numpy as np

    dls = np.asarray(doclen).astype(np.int64)
    out = dls.copy()
    # free values (< 24) and subnormals (j < 8) are stored exactly
    mask = dls >= NUM_FREE_VALUES + 8
    if mask.any():
        j = dls[mask] - NUM_FREE_VALUES
        nbits = np.frexp(j.astype(np.float64))[1]  # exact bit length
        shift = (nbits - 4).astype(np.int64)
        out[mask] = NUM_FREE_VALUES + ((j >> shift) << shift)
    return out


def smallfloat4_doclen(doclen: Column) -> Column:
    """Column form of ``py_quantize`` — all JVM, codegen-friendly.

    ``length(bin(j))`` gives j's exact bit length (no float log2 edge
    cases); the top-4-bit truncation is floor-divide/multiply by
    2^shift (shift <= 27 for any realistic doclen, so the double pow is
    exact).
    """
    j = doclen.cast("long") - F.lit(NUM_FREE_VALUES)
    numbits = F.length(F.bin(j))
    p = F.pow(F.lit(2.0), (numbits - F.lit(4)).cast("double"))
    quant_j = (F.floor(j / p) * p).cast("long")
    return F.when(
        doclen < F.lit(NUM_FREE_VALUES + 8), doclen.cast("long")
    ).otherwise(F.lit(NUM_FREE_VALUES) + quant_j)
