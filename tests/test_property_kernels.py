"""Property-based tests (hypothesis) for the driver-side pure kernels:
correlation metrics vs independent O(n^2)/set-based reimplementations,
the H4 java.util.Properties parser vs a round-trip escaper, and the BPE
encoder's reconstruction invariant. No SparkSession — these run in
milliseconds and fuzz the exact code the DataFrame forms and contract
rows lean on."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_msmarco_spark.operators.correlation import (
    _avg_ranks,
    kendall_tau,
    pairwise_accuracy,
    quantized_sim,
    quantized_strict_match,
    rank_distance,
    rbo,
    sare,
    sarc,
)

# ---------------------------------------------------------------------------
# independent naive oracles
# ---------------------------------------------------------------------------


def naive_tau_b(x, y) -> float:
    conc = disc = tx = ty = 0
    n = len(x)
    for i in range(n):
        for j in range(i + 1, n):
            a, b = x[i] - x[j], y[i] - y[j]
            if a == 0:
                tx += 1
            if b == 0:
                ty += 1
            if a != 0 and b != 0:
                if (a > 0) == (b > 0):
                    conc += 1
                else:
                    disc += 1
    n0 = n * (n - 1) / 2.0
    denom = math.sqrt((n0 - tx) * (n0 - ty))
    return (conc - disc) / denom if denom else float("nan")


def naive_rbo(a, b, k, p) -> float:
    agg = 0.0
    for d in range(1, k + 1):
        ov = len(set(a[:d]) & set(b[:d]))
        agg += (ov / d) * p ** (d - 1)
    return (1 - p) * agg


def naive_rank_distance(a, b) -> float:
    bs = sorted(b)
    n = len(a)
    acc = 0.0
    for pos_a, doc in enumerate(a):
        if doc in set(b):
            pos_b = bs.index(doc)
            acc += ((pos_a - pos_b) / n) ** 2
    return math.sqrt(acc / n)


def naive_avg_ranks(x) -> list[float]:
    out = []
    for v in x:
        less = sum(1 for u in x if u < v)
        eq = sum(1 for u in x if u == v)
        # average of ranks less+1 .. less+eq
        out.append(less + (eq + 1) / 2.0)
    return out


# small-int values force tie-heavy inputs (the branch that differs
# between tau-a and tau-b, and the one _avg_ranks' group loop handles)
vals = st.lists(
    st.integers(min_value=-5, max_value=5), min_size=2, max_size=24
)


def _paired(draw_len=st.integers(min_value=2, max_value=24)):
    return draw_len.flatmap(
        lambda n: st.tuples(
            st.lists(
                st.integers(min_value=-5, max_value=5),
                min_size=n, max_size=n,
            ),
            st.lists(
                st.integers(min_value=-5, max_value=5),
                min_size=n, max_size=n,
            ),
        )
    )


@settings(max_examples=200, deadline=None)
@given(_paired())
def test_kendall_tau_matches_bruteforce(xy):
    x, y = xy
    got = kendall_tau(x, y)
    want = naive_tau_b(x, y)
    if math.isnan(want):
        assert math.isnan(got)
    else:
        assert got == np.float64(want) or abs(got - want) < 1e-12


@settings(max_examples=200, deadline=None)
@given(vals)
def test_avg_ranks_matches_bruteforce(x):
    got = _avg_ranks(np.asarray(x, dtype=np.float64))
    assert list(got) == naive_avg_ranks(x)


unique_lists = st.lists(
    st.integers(min_value=0, max_value=100),
    min_size=1, max_size=15, unique=True,
)


@settings(max_examples=200, deadline=None)
@given(unique_lists, unique_lists,
       st.floats(min_value=0.1, max_value=0.95))
def test_rbo_matches_setbased(a, b, p):
    k = max(len(a), len(b))
    got = rbo(a, b, k=k, p=p)
    want = naive_rbo(a, b, k, p)
    assert abs(got - want) < 1e-12
    assert 0.0 <= got <= 1.0


@settings(max_examples=100, deadline=None)
@given(unique_lists, st.floats(min_value=0.1, max_value=0.95))
def test_rbo_identity_is_depth_sum(a, p):
    # rbo(A, A) at depth k: overlap/d == 1 every depth -> (1-p) Σ p^(d-1)
    k = len(a)
    want = (1 - p) * sum(p ** (d - 1) for d in range(1, k + 1))
    assert abs(rbo(a, a, k=k, p=p) - want) < 1e-12


@settings(max_examples=200, deadline=None)
@given(unique_lists, unique_lists)
def test_rank_distance_matches_bruteforce(a, b):
    got = rank_distance(a, b)
    want = naive_rank_distance(a, b)
    assert abs(got - want) < 1e-12


@settings(max_examples=100, deadline=None)
@given(vals)
def test_self_similarity_identities(x):
    assert pairwise_accuracy(x, x) == 1.0
    assert sare(x, x) == 0.0
    assert sarc(x, x) == 1.0
    if len(set(x)) > 1:  # quantizers min-max normalize: need a spread
        assert quantized_strict_match(x, x) == 1.0
        assert quantized_sim(x, x) == 1.0


# ---------------------------------------------------------------------------
# H4 Properties parser round-trip
# ---------------------------------------------------------------------------

_KEY_SPECIALS = "=: #!"
_ESCAPES = {"\t": "\\t", "\n": "\\n", "\r": "\\r", "\f": "\\f",
            "\\": "\\\\"}


def _esc(s: str) -> str:
    # mirrors java.util.Properties.store's saveConvert: '=', ':', '#',
    # '!' and space are backslash-escaped in keys AND values (a value
    # starting with '=' after a whitespace separator would otherwise be
    # consumed as the separator — the exact case Java escapes for)
    out = []
    for c in s:
        if c in _ESCAPES:
            out.append(_ESCAPES[c])
        elif c in _KEY_SPECIALS:
            out.append("\\" + c)
        else:
            out.append(c)
    return "".join(out)


key_text = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_categories=("Cs",),
        exclude_characters="\x00",
    ),
    min_size=1, max_size=20,
)
val_text = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_categories=("Cs",),
        exclude_characters="\x00",
    ),
    max_size=30,
)


@settings(max_examples=200, deadline=None)
@given(st.dictionaries(key_text, val_text, min_size=1, max_size=8),
       st.sampled_from(["=", ":", " "]))
def test_parse_properties_roundtrip(d, sep):
    from lucene_msmarco_spark.config import parse_properties

    text = "\n".join(
        f"{_esc(k)}{sep}{_esc(v)}" for k, v in d.items()
    )
    assert parse_properties(text) == d


# ---------------------------------------------------------------------------
# BPE encoder reconstruction
# ---------------------------------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789",
               max_size=16))
def test_bpe_encode_reconstructs_word(word):
    from lucene_msmarco_spark.entry_queries import BPE_MERGESET
    from lucene_msmarco_spark.functions.bpe import BPEModel

    model = BPEModel(merges=list(BPE_MERGESET))
    toks = model.encode_word(word)
    assert "".join(toks) == word
    assert toks == model.encode_word(word)  # deterministic
    assert all(t for t in toks)
