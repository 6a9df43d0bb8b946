"""Misra-Gries frequency sketch: the Python tokenizer twin stays in
lockstep with the JVM expressions, the MG summary honors its theorem,
and frequent_ngrams returns the exact heavy-hitter set independent of
partition layout."""

from __future__ import annotations

import random
from collections import Counter

from pyspark.sql import functions as F

from ml_with_spark_streaming_spark.functions.text import clean_text_expr, tokens_expr
from ml_with_spark_streaming_spark.operators.sketch import (
    frequent_ngrams,
    misra_gries,
    py_clean_tokens,
)

_CHARS = "abcdefgXYZ0129 @#&:/._-\t\n"


def test_py_tokenizer_matches_jvm(spark):
    rnd = random.Random(41)
    data = ["".join(rnd.choice(_CHARS) for _ in range(rnd.randrange(0, 80))) for _ in range(200)]
    data += ["", " ", "@tag #tag &amp", "http://u.rl x", "MiXeD CaSe", "a,b 12c"]
    df = spark.createDataFrame([(s,) for s in data], "t string")
    got = [r["k"] for r in df.select(tokens_expr(clean_text_expr("t")).alias("k")).collect()]
    assert got == [py_clean_tokens(s) for s in data]


def test_misra_gries_theorem(spark):
    rnd = random.Random(5)
    # zipf-ish stream over 500 items
    stream = [f"w{int(rnd.paretovariate(1.2)) % 500}" for _ in range(20000)]
    k = 63
    summary = misra_gries(iter(stream), k)
    assert len(summary) <= k
    exact = Counter(stream)
    n = len(stream)
    for item, c in exact.items():
        if c > n / (k + 1):
            assert item in summary  # every heavy hitter survives
    for item, est in summary.items():
        assert exact[item] - n / (k + 1) <= est <= exact[item]  # MG error bound


def test_frequent_ngrams_exact_and_layout_independent(spark):
    rnd = random.Random(11)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    rows = [
        (i, "hot pair " + " ".join(rnd.choice(vocab) for _ in range(20)))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    k = 63  # threshold n/64

    def run(d):
        return {(r["gram"], r["cnt"]) for r in frequent_ngrams(d, k=k).collect()}

    got = run(df.repartition(7))
    assert got == run(df.coalesce(1))  # layout-independent (theorem, not luck)
    # exact reference
    grams = Counter()
    for _, text in rows:
        toks = py_clean_tokens(text)
        for i in range(len(toks) - 1):
            grams[" ".join(toks[i : i + 2])] += 1
    n = sum(grams.values())
    want = {(g, c) for g, c in grams.items() if c * (k + 1) > n}
    assert got == want
    assert ("hot pair", 300) in got  # the planted boilerplate bigram
