"""Inverted index (q116) and BM25 retrieval (q117) on a hand-checked
corpus: postings fingerprints, exact rational scores, and ranking."""

from __future__ import annotations

import hashlib
import os

from ml_with_spark_streaming_spark.plans.text_ml import (
    _BM25_TERMS,
    q116_inverted_index,
    q117_bm25_topk,
)

_ROWS = [
    # doc_id, text (alphabetic only — the cleaning chain strips digits)
    (0, "hash hash join filler fill"),  # hash tf=2, join tf=1, dl=5
    (1, "hash filler fill pad pad"),  # hash tf=1, dl=5
    (2, "other words only here now"),  # no query terms, dl=5
    (3, "hash join vector"),  # all three terms, dl=3
]


def _write_docs(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in _ROWS],
        "doc_id: long, text: string, lang: string, source: string, n_chars: long",
    )
    d = str(tmp_path)
    df.coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
    return d


def test_inverted_index_postings(spark, tmp_path):
    d = _write_docs(spark, tmp_path)
    got = {r.term: r for r in q116_inverted_index(spark, d).collect()}
    assert got["hash"].df == 3 and got["hash"].total_tf == 4
    assert got["hash"].postings_fp == hashlib.md5(b"0:2,1:1,3:1").hexdigest()[:16]
    assert got["join"].df == 2 and got["vector"].df == 1
    assert got["filler"].postings_fp == hashlib.md5(b"0:1,1:1").hexdigest()[:16]


def _bm25_contrib(n, tt, df, tf, dl):
    """The fixed-point BM25 contribution (operators/retrieval.py),
    recomputed in pure Python: avgdl/idf/saturation each HALF-UP
    quantized, then multiplied (k1=1.2, b=0.75)."""
    a = (tt * 2000 + n) // (2 * n)
    idf4 = ((2 * n - 2 * df + 1) * 20000 + (2 * df + 1)) // (2 * (2 * df + 1))
    d = 10 * a * tf + 3 * a + 9000 * dl
    sat4 = (440000 * a * tf + d) // (2 * d)
    return (idf4 * sat4 * 2 + 10000) // 20000


def test_bm25_exact_scores_and_ranking(spark, tmp_path):
    d = _write_docs(spark, tmp_path)
    got = q117_bm25_topk(spark, d).collect()
    by_doc = {r.doc_id: r for r in got}
    # doc 2 holds no query term — absent from the result entirely
    assert set(by_doc) == {0, 1, 3}
    n, tt = 4, 18  # 4 docs, 5+5+5+3 tokens
    dfs = {"hash": 3, "join": 2, "vector": 1}
    tfs = {0: {"hash": 2, "join": 1}, 1: {"hash": 1}, 3: {"hash": 1, "join": 1, "vector": 1}}
    dls = {0: 5, 1: 5, 3: 3}
    for doc, terms in tfs.items():
        want = sum(_bm25_contrib(n, tt, dfs[t], tf, dls[doc]) for t, tf in terms.items())
        assert by_doc[doc].score_x1e4 == want, doc
        assert by_doc[doc].n_hit_terms == len(terms)
    # short doc hitting every term (incl. the rarest) outranks the rest;
    # two hash-hits beat one
    ranked = [r.doc_id for r in got]
    assert ranked == [3, 0, 1]
    assert all(t in ("hash", "join", "vector") for t in _BM25_TERMS)


def test_bm25_batch_matches_single_query(spark, tmp_path):
    """The batch form restricted to one query must equal bm25_topk's
    single-query ranking and scores on the same corpus."""
    from ml_with_spark_streaming_spark.operators.retrieval import (
        bm25_topk,
        bm25_topk_batch,
    )
    from ml_with_spark_streaming_spark.sources.batch import load_table

    d = _write_docs(spark, tmp_path)
    docs = load_table(spark, d, "documents")
    single = [
        (r.doc_id, r.n_hit_terms, r.score_x1e4)
        for r in bm25_topk(docs, ("hash", "join", "vector"), k=10).collect()
    ]
    queries = spark.createDataFrame(
        [(1, "hash"), (1, "join"), (1, "vector")], "query_id long, term string"
    )
    batch = [
        (r.doc_id, r.n_hit_terms, r.score_x1e4)
        for r in bm25_topk_batch(docs, queries, k=10).orderBy("rank").collect()
    ]
    assert single == batch


def test_bm25_batch_layout_independent(spark, tmp_path):
    """Integer-rational scoring makes the ranking a pure function of
    corpus content — partitioning must not change any score or rank."""
    from ml_with_spark_streaming_spark.operators.retrieval import bm25_topk_batch

    rows = [(i, t, "en", "s", len(t)) for i, t in _ROWS]
    a = spark.createDataFrame(
        rows, "doc_id: long, text: string, lang: string, source: string, n_chars: long"
    ).repartition(7)
    b = spark.createDataFrame(
        list(reversed(rows)),
        "doc_id: long, text: string, lang: string, source: string, n_chars: long",
    ).repartition(2)
    queries = spark.createDataFrame(
        [(1, "hash"), (1, "join"), (2, "vector")], "query_id long, term string"
    )
    ga = sorted(map(tuple, bm25_topk_batch(a, queries, k=10).collect()))
    gb = sorted(map(tuple, bm25_topk_batch(b, queries, k=10).collect()))
    assert ga == gb


def test_bm25_fixed_point_int64_bounds():
    """Every intermediate of the fixed-point scoring stays inside
    int64 at the documented worst case: a 100 TB-scale corpus (1e10
    docs, 10k-token avgdl) with a rare (df=1) term fully saturating a
    long doc — the regime where the old single-rational form wrapped."""
    M = 2**63
    n = 10**10  # docs
    avgdl = 10**4
    tt = n * avgdl
    a = (tt * 2000 + n) // (2 * n)
    assert tt * 2000 + n < M
    tf, dl, df = 2 * 10**6, 2 * 10**6, 1  # avgdl*tf = 2e10 (documented edge)
    assert 440000 * a * tf < M
    idf4_num = (2 * n - 2 * df + 1) * 20000 + (2 * df + 1)
    assert idf4_num < M
    idf4 = idf4_num // (2 * (2 * df + 1))
    d = 10 * a * tf + 3 * a + 9000 * dl
    assert d * 2 < M
    sat4 = (440000 * a * tf + d) // (2 * d)
    assert sat4 <= 22000
    assert idf4 * sat4 * 2 + 10000 < M
    # and the resulting contribution is sane: idf ~ 2N/3 at df=1
    contrib = (idf4 * sat4 * 2 + 10000) // 20000
    assert contrib > 0


def test_bm25_batch_dedups_query_terms(spark, tmp_path):
    """A duplicated (query_id, term) row must not double-count the
    term — batch scores equal the deduplicated query's scores."""
    from ml_with_spark_streaming_spark.operators.retrieval import bm25_topk_batch
    from ml_with_spark_streaming_spark.sources.batch import load_table

    d = _write_docs(spark, tmp_path)
    docs = load_table(spark, d, "documents")
    clean = spark.createDataFrame(
        [(1, "hash"), (1, "join")], "query_id long, term string"
    )
    dup = spark.createDataFrame(
        [(1, "hash"), (1, "hash"), (1, "join")], "query_id long, term string"
    )
    ga = sorted(map(tuple, bm25_topk_batch(docs, clean, k=10).collect()))
    gb = sorted(map(tuple, bm25_topk_batch(docs, dup, k=10).collect()))
    assert ga == gb
