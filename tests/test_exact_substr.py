"""ExactSubstr span recovery on planted duplicate passages."""

from __future__ import annotations

import hashlib

from ml_with_spark_streaming_spark.operators.exact_substr import apply_cuts, duplicate_spans

# 40 distinct filler words so unrelated docs share no k-gram
# (alphabetic only — clean_text_expr strips digits)
_W = [f"w{chr(97 + i // 26)}{chr(97 + i % 26)}" for i in range(40)]


def _doc(words):
    return " ".join(words)


def test_planted_passage_spans_recovered(spark):
    """Two docs share one 12-token passage at different offsets; a
    third repeats a passage internally. Spans, widths, and the
    keep-one cut policy must come back exactly."""
    k = 5
    passage = ["dup" + chr(97 + i) for i in range(12)]  # 12 tokens, k=5 → 8 dup starts
    d0 = _W[0:6] + passage + _W[6:12]  # passage at tokens 7..18
    d1 = _W[12:22] + passage + _W[22:26]  # passage at tokens 11..22
    d2 = _W[26:31] + _W[26:31] + _W[31:40]  # self-repeat: w26..w30 twice
    # doc 3 shares only sub-k (4-token) fragments with docs 0/1
    d3 = _W[0:4] + ["zq"] + _W[12:16] + ["zr"]
    rows = [(0, _doc(d0)), (1, _doc(d1)), (2, _doc(d2)), (3, _doc(d3))]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    got = {
        (r.doc_id, r.span_start, r.span_end, r.n_dup_tokens, r.cut)
        for r in duplicate_spans(df, k=k).collect()
    }
    # doc 0 holds the canonical (first) copy → cut=0; doc 1's copy cut=1.
    # Passage is 12 tokens: starts span positions p..p+7, span covers
    # p..p+11.
    assert (0, 7, 18, 12, 0) in got
    assert (1, 11, 22, 12, 1) in got
    # doc 2: tokens 1..10 are w26..w30 w26..w30; duplicated 5-grams are
    # the ones fully inside each copy — starts 1 and 6, gap 5 == k →
    # merged into one island covering 1..10; start 1 is canonical.
    assert (2, 1, 10, 10, 0) in got
    # doc 3 shares only sub-k fragments with docs 0/1 → no spans
    assert not any(t[0] == 3 for t in got)


def test_no_duplicates_no_spans(spark):
    rows = [(i, _doc(_W[i * 8 : i * 8 + 8])) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert duplicate_spans(df, k=4).count() == 0


def test_overlapping_spans_merge_to_maximal(spark):
    """Duplicated starts closer than k merge into ONE maximal span
    (the paper's maximal-duplicated-substring semantics), and the
    canonical copy keeps cut=0 while every later copy is cut."""
    k = 4
    # doc 0 = A B; doc 1 = B A (A, B = disjoint 6-token passages):
    # in each doc every position is covered by a duplicated 4-gram of
    # A or B except the 3 straddling starts; straddle grams differ
    # between docs, so dup starts are 1..3 and 7..9 (A/B interiors),
    # gap 7-3=4 == k → single island per doc spanning 1..12.
    A = [f"a{chr(97 + i)}" for i in range(6)]
    B = [f"b{chr(97 + i)}" for i in range(6)]
    df = spark.createDataFrame(
        [(0, _doc(A + B)), (1, _doc(B + A))], "doc_id long, text string"
    )
    got = sorted(
        (r.doc_id, r.span_start, r.span_end, r.n_dup_tokens, r.cut)
        for r in duplicate_spans(df, k=k).collect()
    )
    # doc 0 holds canonical copies of both A-grams and B-grams (doc 0
    # precedes doc 1) → its merged span keeps cut=0; doc 1's span holds
    # no canonical gram → cut=1
    assert got == [(0, 1, 12, 12, 0), (1, 1, 12, 12, 1)]


def _fp(words):
    return hashlib.md5(" ".join(words).encode()).hexdigest()[:16]


def test_apply_cuts_excises_later_copies(spark):
    """Cut application: the canonical doc keeps every token; the later
    copy loses exactly the planted passage; untouched docs pass through
    with their full fingerprint."""
    k = 5
    passage = ["dup" + chr(97 + i) for i in range(12)]
    d0 = _W[0:6] + passage + _W[6:12]  # canonical copy → keeps all 24
    d1 = _W[12:22] + passage + _W[22:26]  # later copy → loses 12 of 26
    d2 = _W[26:34]  # no duplicates → untouched
    df = spark.createDataFrame(
        [(0, _doc(d0)), (1, _doc(d1)), (2, _doc(d2))], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in apply_cuts(df, k=k).collect()}
    assert (out[0].n_tokens, out[0].n_cut_tokens, out[0].n_kept_tokens) == (24, 0, 24)
    assert out[0].kept_fp == _fp(d0)
    assert (out[1].n_tokens, out[1].n_cut_tokens, out[1].n_kept_tokens) == (26, 12, 14)
    assert out[1].kept_fp == _fp(_W[12:22] + _W[22:26])
    assert (out[2].n_tokens, out[2].n_cut_tokens) == (8, 0)
    assert out[2].kept_fp == _fp(d2)


def test_apply_cuts_full_duplicate_doc_empties(spark):
    """A verbatim copy of an earlier doc is cut entirely — kept text is
    the empty string (fingerprint of ''), canonical doc untouched."""
    k = 4
    body = _W[0:10]
    df = spark.createDataFrame(
        [(0, _doc(body)), (1, _doc(body))], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in apply_cuts(df, k=k).collect()}
    assert (out[0].n_cut_tokens, out[0].kept_fp) == (0, _fp(body))
    assert (out[1].n_tokens, out[1].n_cut_tokens, out[1].n_kept_tokens) == (10, 10, 0)
    assert out[1].kept_fp == hashlib.md5(b"").hexdigest()[:16]


def test_apply_cuts_accepts_precomputed_spans(spark):
    """Production path: the discovery stage's span table is passed in;
    the application result is identical to the in-query recompute."""
    k = 5
    passage = ["dup" + chr(97 + i) for i in range(12)]
    df = spark.createDataFrame(
        [(0, _doc(_W[0:6] + passage)), (1, _doc(passage + _W[6:12]))],
        "doc_id long, text string",
    )
    spans = duplicate_spans(df, k=k, sorted_output=False)
    a = sorted(map(tuple, apply_cuts(df, k=k).collect()))
    b = sorted(map(tuple, apply_cuts(df, k=k, spans=spans).collect()))
    assert a == b


def test_apply_cuts_layout_independent(spark):
    """The verdicts and fingerprints are a pure function of corpus
    CONTENT: shuffling input row order / partitioning must not change
    the output (the driver-strict determinism canon)."""
    k = 5
    passage = ["dup" + chr(97 + i) for i in range(12)]
    rows = [
        (0, _doc(_W[0:6] + passage + _W[6:12])),
        (1, _doc(_W[12:22] + passage + _W[22:26])),
        (2, _doc(_W[26:34])),
        (3, _doc(passage + _W[34:40])),
    ]
    a = spark.createDataFrame(rows, "doc_id long, text string").repartition(7)
    b = spark.createDataFrame(list(reversed(rows)), "doc_id long, text string").repartition(2)
    got_a = sorted(map(tuple, apply_cuts(a, k=k).collect()))
    got_b = sorted(map(tuple, apply_cuts(b, k=k).collect()))
    assert got_a == got_b
    # internal consistency: kept = total - cut on every row
    for (_, n, cut, kept, _fp) in got_a:
        assert kept == n - cut


def test_apply_cuts_emits_empty_clean_docs(spark):
    """A doc whose text cleans to nothing (digits/punct only) still
    appears with 0 tokens and the fingerprint of '' — q98's empty-doc
    convention, so pack/budget consumers reconcile against the full
    document spine."""
    df = spark.createDataFrame(
        [(0, _doc(_W[0:8])), (1, "123 456 !!!")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in apply_cuts(df, k=4).collect()}
    assert set(out) == {0, 1}
    assert (out[1].n_tokens, out[1].n_cut_tokens, out[1].n_kept_tokens) == (0, 0, 0)
    assert out[1].kept_fp == hashlib.md5(b"").hexdigest()[:16]


def test_xxhash64_mode_same_spans(spark):
    """The production key swap (16-hex md5 prefix -> one BIGINT
    xxhash64, ~half the shuffle width) must not change a single span:
    both keys are injective modulo negligible collision odds, so the
    occurrence aggregate and the position probe see identical groups."""
    k = 5
    passage = ["dup" + chr(97 + i) for i in range(12)]
    d0 = _W[0:6] + passage + _W[6:12]
    d1 = _W[12:22] + passage + _W[22:26]
    d2 = _W[26:31] + _W[26:31] + _W[31:40]
    rows = [(0, _doc(d0)), (1, _doc(d1)), (2, _doc(d2))]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    md5_spans = sorted(map(tuple, duplicate_spans(df, k=k).collect()))
    xx_spans = sorted(
        map(tuple, duplicate_spans(df, k=k, hash_mode="xxhash64").collect())
    )
    assert md5_spans == xx_spans and md5_spans

    import pytest as _pytest

    with _pytest.raises(ValueError, match="hash_mode"):
        duplicate_spans(df, k=k, hash_mode="sha1")
