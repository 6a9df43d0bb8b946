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


def test_score_against_lm_agrees_with_self_scoring(spark):
    """On the training corpus itself every bigram is known, so the
    reference-artifact form (COALESCEd backoff) must equal the q131
    self-scoring form bit-for-bit."""
    from ml_with_spark_streaming_spark.operators.lm import score_against_lm
    from ml_with_spark_streaming_spark.streaming.perplexity_filter import train_lm

    df = spark.createDataFrame(_ROWS, "doc_id long, text string")
    uni, big, vocab = train_lm(df)
    got = sorted(map(tuple, score_against_lm(df, uni, big, vocab).collect()))
    want = sorted(map(tuple, bigram_lm_scores(df).collect()))
    assert got == want


def test_score_against_lm_backoff_for_unseen(spark):
    """Unseen events score pessimistically and exactly: known-left
    unseen bigram -> ln((c1+V)/1); unknown-left -> ln(V)."""
    import math

    from ml_with_spark_streaming_spark.operators.lm import score_against_lm
    from ml_with_spark_streaming_spark.streaming.perplexity_filter import train_lm

    train = spark.createDataFrame(
        [(0, "the cat sat"), (1, "the cat ran")], "doc_id long, text string"
    )
    uni, big, vocab = train_lm(train)  # vocab: the cat sat ran -> V=4
    new = spark.createDataFrame(
        [(10, "the dog"), (11, "zz qq")], "doc_id long, text string"
    )
    got = {r.doc_id: r.nll_x1e6 for r in score_against_lm(new, uni, big, vocab).collect()}
    # "the dog": left 'the' known (c1=2), 'the dog' unseen -> ln((2+4)/1)
    assert got[10] == math.floor(math.log(6.0) * 1e6 + 0.5)
    # "zz qq": left unknown -> ln((0+4)/1)
    assert got[11] == math.floor(math.log(4.0) * 1e6 + 0.5)


def test_streaming_perplexity_filter_equals_batch(spark, tmp_path):
    """Stream-equals-batch: the micro-batch gate's verdicts equal the
    batch operator's on the same rows, across a model save/resume."""
    import json
    import os

    from ml_with_spark_streaming_spark.operators.lm import score_against_lm
    from ml_with_spark_streaming_spark.streaming.perplexity_filter import (
        StreamingPerplexityFilter,
    )

    corpus = spark.createDataFrame(
        [(i, "the cat sat on the mat tonight " * 3) for i in range(4)]
        + [(9, "the dog ran over the rug today " * 3)],
        "doc_id long, text string",
    )
    incoming = [
        (100, "the cat sat on the mat tonight the cat sat"),  # in-distribution
        (101, "colorless green ideas sleep furiously zz qq"),  # improbable
        (102, "x"),  # unscorable (1 token)
    ]
    kept = set()
    f = StreamingPerplexityFilter.from_corpus(corpus, threshold_x1e6=0)
    # calibrate the gate the way a deployment does: score a labeled
    # slice under the trained LM, put the threshold between the
    # in-distribution doc and the improbable one
    batch_df = spark.createDataFrame(incoming, "doc_id long, text string")
    cal = {
        r.doc_id: r.mean_nll_x1e6
        for r in score_against_lm(batch_df, f.uni, f.big, f.vocab).collect()
    }
    assert cal[100] < cal[101]  # the improbable doc really scores worse
    thr = (cal[100] + cal[101]) // 2
    # save + resume: the gate that runs is loaded from the artifact
    mp = str(tmp_path / "lm")
    f.save_model(mp)
    f2 = StreamingPerplexityFilter.from_model_path(
        spark,
        mp,
        threshold_x1e6=thr,
        on_kept=lambda df, bid: kept.update(r["doc_id"] for r in df.collect()),
    )

    src = str(tmp_path / "in")
    os.makedirs(src)
    with open(os.path.join(src, "b0.jsonl"), "w") as fh:
        for doc_id, text in incoming:
            fh.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
    docs = (
        spark.readStream.format("json")
        .schema("doc_id long, text string")
        .load(src)
    )
    q = f2.attach(docs, checkpoint=str(tmp_path / "ckpt"), available_now=True)
    q.awaitTermination()

    batch = {
        r.doc_id: r.mean_nll_x1e6
        for r in score_against_lm(batch_df, f2.uni, f2.big, f2.vocab).collect()
    }
    assert batch == cal  # the resumed model scores identically
    want_kept = {
        d
        for d, t in incoming
        if (batch[d] <= thr and len(t.split()) >= 2) or len(t.split()) < 2
    }
    assert kept == want_kept
    assert 100 in kept and 102 in kept and 101 not in kept
    h = f2.history[0]
    assert h["n_docs"] == 3 and h["n_kept"] == len(want_kept) and h["n_unscored"] == 1
