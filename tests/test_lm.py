"""Bigram-LM perplexity scoring (q131 / operators/lm.py) on a
hand-checkable corpus, cross-checked against a pure-Python math.log
reference of the same add-one-smoothed model."""

from __future__ import annotations

import math

from ml_with_spark_streaming_spark.operators.lm import bigram_lm_scores

_ROWS = [
    (0, "the cat sat on the mat"),
    (1, "the cat sat on the mat"),  # duplicate: identical score
    (2, "the dog sat on the rug"),
    (3, "colorless green ideas sleep furiously tonight"),  # improbable
    (4, "single"),  # < 2 tokens: zero row
    (5, ""),  # empty: zero row
]


def _reference_scores():
    """Pure-float add-one bigram LM over the same corpus."""
    toks = {i: t.split() for i, t in _ROWS if len(t.split()) >= 2}
    uni: dict[str, int] = {}
    big: dict[tuple[str, str], int] = {}
    for t in toks.values():
        for w in t:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(t, t[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    v = len(uni)
    out = {}
    for i, t in toks.items():
        nll6 = 0
        for a, b in zip(t, t[1:]):
            x = (uni[a] + v) / (big[(a, b)] + 1)
            nll6 += math.floor(math.log(x) * 1e6 + 0.5)
        n = len(t) - 1
        out[i] = (n, nll6, (nll6 * 2 + n) // (2 * n))
    return out


def test_bigram_lm_matches_math_log_reference(spark):
    df = spark.createDataFrame(_ROWS, "doc_id long, text string")
    got = {r.doc_id: (r.n_bigrams, r.nll_x1e6, r.mean_nll_x1e6)
           for r in bigram_lm_scores(df).collect()}
    ref = _reference_scores()
    assert set(got) == {0, 1, 2, 3, 4, 5}  # full doc spine
    for i, want in ref.items():
        assert got[i] == want, i
    assert got[4] == (0, 0, 0) and got[5] == (0, 0, 0)
    # duplicates score identically; the improbable doc scores worst
    assert got[0] == got[1]
    assert got[3][2] > got[0][2]
    assert got[3][2] > got[2][2]


def test_bigram_lm_layout_independent(spark):
    """Integer micro-nat scores are a pure function of corpus content —
    partitioning must not change any value."""
    rows = [(i, t) for i, t in _ROWS]
    a = spark.createDataFrame(rows, "doc_id long, text string").repartition(7)
    b = spark.createDataFrame(list(reversed(rows)), "doc_id long, text string").repartition(2)
    ga = sorted(map(tuple, bigram_lm_scores(a).collect()))
    gb = sorted(map(tuple, bigram_lm_scores(b).collect()))
    assert ga == gb
