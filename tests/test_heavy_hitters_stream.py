"""Streaming Misra-Gries: merged state honors the stream-lifetime
error bound however the data is batched, and a planted template gram
emerges as a heavy hitter mid-stream."""

from __future__ import annotations

import pytest

import json
import os
import random
from collections import Counter

from ml_with_spark_streaming_spark.operators.sketch import py_clean_tokens
from ml_with_spark_streaming_spark.streaming.heavy_hitters import (
    StreamingHeavyHitters,
)

VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "theta", "iota"]


def _mk_batches(seed=3, n_batches=3, docs_per=60):
    rnd = random.Random(seed)
    batches = []
    for b in range(n_batches):
        rows = []
        for i in range(docs_per):
            text = " ".join(rnd.choice(VOCAB) for _ in range(15))
            if b >= 1:  # template appears from batch 1 on
                text = "spam template " + text
            rows.append((b * 1000 + i, text))
        batches.append(rows)
    return batches


def _exact(batches):
    grams = Counter()
    for rows in batches:
        for _, text in rows:
            toks = py_clean_tokens(text)
            for i in range(len(toks) - 1):
                grams[" ".join(toks[i : i + 2])] += 1
    return grams


@pytest.mark.slow
def test_merged_state_honors_mg_bound_and_finds_template(spark):
    batches = _mk_batches()
    k = 63
    hh = StreamingHeavyHitters(k=k, ngram=2)
    for b, rows in enumerate(batches):
        hh.process_batch(
            spark.createDataFrame(rows, "doc_id long, text string"), b
        )

    exact = _exact(batches)
    n = sum(exact.values())
    assert hh.n_total == n
    assert len(hh.counters) <= k
    bound = n / (k + 1)
    for gram, est in hh.counters.items():
        assert est <= exact[gram]                 # never overestimates
        assert exact[gram] - est <= bound + 1e-9  # MG error bound survives merging
    for gram, c in exact.items():
        if c > bound:
            assert gram in hh.counters            # no heavy hitter is ever missed
    top = hh.heavy_hitters()
    assert top and top[0][0] == "spam template"   # the planted template leads
    assert len(hh.history) == 3
    assert hh.history[0]["n_grams"] > 0


def test_stream_attach_equals_direct_batches(spark, tmp_path):
    rows = _mk_batches(n_batches=1, docs_per=40)[0]
    src = str(tmp_path / "in")
    os.makedirs(src)
    with open(os.path.join(src, "b0.jsonl"), "w") as f:
        for doc_id, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
    # k=127 exceeds the possible bigram vocabulary (8x8), so every
    # partition's MG keeps exact counts and both paths agree exactly
    # regardless of how the source partitions the batch
    streamed = StreamingHeavyHitters(k=127, ngram=2)
    docs = (
        spark.readStream.format("json").schema("doc_id long, text string").load(src)
    )
    q = streamed.attach(docs, checkpoint=str(tmp_path / "ckpt"), available_now=True)
    q.awaitTermination()

    direct = StreamingHeavyHitters(k=127, ngram=2)
    direct.process_batch(spark.createDataFrame(rows, "doc_id long, text string"), 0)
    assert streamed.counters == direct.counters
    assert streamed.n_total == direct.n_total
