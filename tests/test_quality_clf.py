"""Quality-classifier operator (q112/q113): weight algebra pinned
against a hand-rolled numpy twin, and generalization on a planted
high/low-quality corpus."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from ml_with_spark_streaming_spark.operators.quality_clf import (
    TRAIN_KEEP,
    TRAIN_MOD,
    WEIGHT_SCALE,
    _idiv,
    classifier_scores,
    classifier_weights,
    feature_presence,
    heuristic_labels,
)

# planted vocabularies: disjoint, so the rate contrast is unambiguous
_HI_WORDS = "signal lattice theorem kernel manifold gradient".split()
_LO_WORDS = "zz qq xx jj".split()


def _docs(spark, n=60):
    """High-quality docs (long, alpha-rich, hi-vocab) interleaved with
    low-quality ones (short, punctuation-heavy, lo-vocab); doc_id
    parity = class, so both classes land in train AND holdout."""
    rows = []
    for i in range(n):
        if i % 2 == 0:
            words = [_HI_WORDS[(i + j) % len(_HI_WORDS)] for j in range(40)]
            rows.append((i, " ".join(words)))
        else:
            words = [_LO_WORDS[(i + j) % len(_LO_WORDS)] for j in range(3)]
            rows.append((i, "!!! ??? %% " + " ".join(words) + " ### $$$"))
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def _bucket(tok: str) -> str:
    return hashlib.md5(tok.encode()).hexdigest()[:3]


def test_idiv_matches_python_floor_division(spark):
    rows = [(3, 2), (10, 3), (0, 7), (999999 * 1000000, 7), (10**14, 999983)]
    df = spark.createDataFrame(rows, "a: long, b: long")
    got = df.select(_idiv(F.col("a"), F.col("b")).alias("q")).collect()
    assert [r["q"] for r in got] == [a // b for a, b in rows]


def test_weights_match_numpy_twin(spark):
    d = _docs(spark)
    pres = feature_presence(d)
    lab = heuristic_labels(d)
    got = {r["fb"]: r["w"] for r in classifier_weights(pres, lab).collect()}

    # hand twin: same clean/tokenize (planted text is already clean
    # except the punct runs, which the regex strips to spaces)
    labels = {r["doc_id"]: r["y"] for r in lab.collect()}
    presence = {
        (r["doc_id"], r["fb"]) for r in pres.collect()
    }
    train = {i: y for i, y in labels.items() if i % TRAIN_MOD < TRAIN_KEEP}
    n1t = sum(train.values())
    n0t = len(train) - n1t
    counts: dict[str, list[int]] = {}
    for (i, fb) in presence:
        if i in train:
            c = counts.setdefault(fb, [0, 0])
            c[train[i]] += 1
    want = {
        fb: ((c[1] + 1) * WEIGHT_SCALE) // (n1t + 2) - ((c[0] + 1) * WEIGHT_SCALE) // (n0t + 2)
        for fb, c in counts.items()
    }
    assert got == want
    # sanity: the planted labels are what we think they are
    assert all(labels[i] == (1 if i % 2 == 0 else 0) for i in labels)


def test_classifier_generalizes_to_holdout(spark):
    d = _docs(spark)
    pres = feature_presence(d)
    lab = heuristic_labels(d)
    w = classifier_weights(pres, lab)
    sc = classifier_scores(pres, w)
    pred = {
        r["doc_id"]: (1 if r["score"] > 0 else 0)
        for r in sc.collect()
    }
    labels = {r["doc_id"]: r["y"] for r in lab.collect()}
    holdout = [i for i in labels if i % TRAIN_MOD >= TRAIN_KEEP]
    assert holdout, "fixture must exercise the holdout split"
    agree = sum(pred.get(i, 0) == labels[i] for i in holdout)
    # disjoint vocabularies: the scorer must recover the heuristic
    # perfectly out of sample
    assert agree == len(holdout)


def test_presence_matches_global_distinct_reference(spark):
    """The round-12 per-document ``array_distinct`` formulation must
    produce EXACTLY the reference global-distinct pair set (same rows,
    no duplicates) on a corpus with repeated tokens, unicode, URLs and
    empty/punct-only docs — the shuffle-free rewrite's contract."""
    rows = [
        (0, "alpha alpha alpha beta beta gamma"),
        (1, ""),
        (2, "!!! ??? %%"),
        (3, "http://x.co/path?a=1 alpha müller café naïve"),
        (4, "Tab\tseparated\nnewline  double  space alpha"),
        (5, "singleton"),
    ]
    d = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = feature_presence(d)
    from ml_with_spark_streaming_spark.functions.text import clean_text_expr, tokens_expr
    from ml_with_spark_streaming_spark.operators.quality_clf import BUCKET_HEX_CHARS

    ref = (
        d.select(F.col("doc_id"), tokens_expr(clean_text_expr("text")).alias("_t"))
        .select(F.col("doc_id"), F.explode("_t").alias("_tk"))
        .select(
            "doc_id",
            F.substring(F.md5(F.encode(F.col("_tk"), "UTF-8")), 1, BUCKET_HEX_CHARS).alias("fb"),
        )
        .distinct()
    )
    got_rows = [(r["doc_id"], r["fb"]) for r in got.collect()]
    ref_rows = [(r["doc_id"], r["fb"]) for r in ref.collect()]
    assert sorted(got_rows) == sorted(ref_rows)  # set-equal AND duplicate-free
    assert len(got_rows) == len(set(got_rows))


def test_hi_vocab_buckets_weigh_positive(spark):
    d = _docs(spark)
    w = {r["fb"]: r["w"] for r in classifier_weights(feature_presence(d), heuristic_labels(d)).collect()}
    for tok in _HI_WORDS:
        assert w[_bucket(tok)] > 0, tok
    for tok in _LO_WORDS:
        assert w[_bucket(tok)] < 0, tok
