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


def test_ln_fragment_engine_exact_and_matches_math_log(spark):
    """The sqrt-constructed ln (q130) must be bit-identical between
    Spark and DuckDB AND equal HALF-UP(math.log(x)*1e6) on a probe
    grid spanning tiny corpora up to the documented 1e10-doc bound —
    the property that makes log-BM25 oracle-able at all."""
    import duckdb
    import math

    from ml_with_spark_streaming_spark.operators.retrieval import LN_IDF6_SQL

    pairs = [
        (n, df)
        for n in (1, 2, 10, 500, 5000, 10**6, 10**10)
        for df in (1, 2, 3, 7, 250, 499, n)
        if df <= n
    ]
    vals = ", ".join(f"({n}, {df})" for n, df in pairs)
    duck = {
        (n, df): v
        for n, df, v in duckdb.sql(
            f"SELECT n, df, {LN_IDF6_SQL} AS v FROM (VALUES {vals}) t(n, df)"
        ).fetchall()
    }
    srows = {
        (r["n"], r["df"]): r["v"]
        for r in spark.createDataFrame(pairs, "n long, df long")
        .selectExpr("n", "df", f"{LN_IDF6_SQL} AS v")
        .collect()
    }
    for n, df in pairs:
        want = math.floor(math.log((2 * n + 2) / (2 * df + 1)) * 1e6 + 0.5)
        assert srows[(n, df)] == duck[(n, df)] == want, (n, df)
        # Lucene idf is always positive; at the 1e-6 quantum it can
        # floor to exactly 0 for an everywhere-term in a huge corpus
        # (df = n = 1e10 -> ln(1+1/(2n+1)) ~ 5e-11), never below
        assert srows[(n, df)] >= 0
    # int64 bound at the 1e10-doc worst case: lnidf6 * sat4_max * 2 + 1e6
    assert duck[(10**10, 1)] * 22000 * 2 + 10**6 < 2**63


def test_bm25_ln_order_differs_from_raw_and_matches_textbook(spark, tmp_path):
    """The VERDICT-r4 parity fixture: a query mixing one rare term with
    several moderately-common terms, where raw-Robertson idf and
    textbook log-BM25 RANK DIFFERENTLY — the rare-term doc wins under
    raw idf (which over-weights rarity), the common-terms doc wins
    under ln. q130's ranking must equal a pure-Python math.log BM25
    reference, not the raw ordering."""
    import math
    import os

    from ml_with_spark_streaming_spark.operators.retrieval import (
        bm25_ln_topk,
        bm25_topk,
    )
    from ml_with_spark_streaming_spark.sources.batch import load_table

    common = ["alpha", "beta", "gamma", "delta", "omega"]
    rows = [(0, "zephyr pad pad pad pad")]  # rare term, dl=5
    rows.append((1, " ".join(t for t in common for _ in range(6))))  # dl=30
    for i in range(2, 9):  # 7 docs: df(common)=8 incl. doc 1
        rows.append((i, " ".join(common) + " pad pad pad pad pad"))
    for i in range(9, 18):  # filler: N=18
        rows.append((i, "pad fill words here now pad fill words here now"))
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id: long, text: string, lang: string, source: string, n_chars: long",
    )
    d = str(tmp_path)
    df.coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
    docs = load_table(spark, d, "documents")
    terms = tuple(["zephyr"] + common)

    raw = [r.doc_id for r in bm25_topk(docs, terms, k=20).collect()]
    ln = [r.doc_id for r in bm25_ln_topk(docs, terms, k=20).collect()]
    assert raw.index(0) < raw.index(1)  # raw idf: rare-term doc first
    assert ln.index(1) < ln.index(0)  # log-BM25: common-terms doc first
    assert raw != ln

    # pure-float textbook reference (Lucene idf, k1=1.2, b=0.75)
    texts = dict(rows)
    toks = {i: t.split() for i, t in texts.items()}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    dfreq = {t: sum(1 for tk in toks.values() if t in tk) for t in terms}
    scores = {}
    for i, tk in toks.items():
        s = 0.0
        for t in terms:
            tf = tk.count(t)
            if tf == 0:
                continue
            idf = math.log(1 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len(tk) / avgdl))
        if s > 0:
            scores[i] = s
    ref = sorted(scores, key=lambda i: (-scores[i], i))
    assert ln == ref


# ---------------------------------------------------------------------------
# phrase search (q143 machinery)
# ---------------------------------------------------------------------------


def test_phrase_match_hand_checked(spark):
    """Positional-postings intersection on a corpus with overlapping
    occurrences and a repeated-term phrase."""
    from ml_with_spark_streaming_spark.operators.retrieval import (
        phrase_match,
        positional_postings,
    )

    docs = spark.createDataFrame(
        [
            # "a b a b a": "a b a" occurs at starts 0 and 2 (overlap)
            (0, "a b a b a"),
            # repeated-term phrase "x x" occurs at starts 0,1 (run of 3)
            (1, "x x x y"),
            # phrase terms present but never adjacent
            (2, "a c b c a"),
        ],
        "doc_id: long, text: string",
    )
    postings = positional_postings(docs)
    phrases = spark.createDataFrame([("a b a",), ("x x",)], "phrase: string")
    got = {
        (r.phrase, r.doc_id): r.n_matches
        for r in phrase_match(postings, phrases).collect()
    }
    assert got == {("a b a", 0): 2, ("x x", 1): 2}


def test_phrase_match_no_partial_credit(spark):
    """A start where only SOME offsets vote is not a match."""
    from ml_with_spark_streaming_spark.operators.retrieval import (
        phrase_match,
        positional_postings,
    )

    docs = spark.createDataFrame(
        [(0, "spark fast engine"), (1, "spark slow engine")],
        "doc_id: long, text: string",
    )
    phrases = spark.createDataFrame([("spark fast engine",)], "phrase: string")
    got = phrase_match(positional_postings(docs), phrases).collect()
    assert [(r.phrase, r.doc_id, r.n_matches) for r in got] == [
        ("spark fast engine", 0, 1)
    ]


def test_q148_rrf_fusion_is_consistent(spark):
    """rrf_x1e9 must equal the integer RRF recomputed from the emitted
    ranks, and the output must be rrf-descending."""
    from ml_with_spark_streaming_spark.plans.registry import QUERIES

    rows = QUERIES["q148_hybrid_retrieval"](spark, "/root/testdata/sf0.001").collect()
    assert rows, "hybrid retrieval returned nothing"
    prev = None
    for r in rows:
        want = 0
        if r["lex_rank"] > 0:
            want += 10**9 // (60 + r["lex_rank"])
        if r["sem_rank"] > 0:
            want += 10**9 // (60 + r["sem_rank"])
        assert r["rrf_x1e9"] == want
        if prev is not None:
            assert r["rrf_x1e9"] <= prev
        prev = r["rrf_x1e9"]


def test_batch_bm25_shuffled_queries_mode(spark):
    """broadcast_queries=False (the very-large-query-batch mode: the
    term-keyed joins run as shuffled hash joins, only the 1-row corpus
    stats stay broadcast) must produce identical rankings and scores."""
    from ml_with_spark_streaming_spark.operators.retrieval import bm25_topk_batch

    rows = [(i, t, "en", "s", len(t)) for i, t in _ROWS]
    docs = spark.createDataFrame(
        rows, "doc_id: long, text: string, lang: string, source: string, n_chars: long"
    )
    queries = spark.createDataFrame(
        [(1, "hash"), (1, "join"), (2, "vector")], "query_id long, term string"
    )
    ga = sorted(map(tuple, bm25_topk_batch(docs, queries, k=10).collect()))
    gb = sorted(
        map(
            tuple,
            bm25_topk_batch(docs, queries, k=10, broadcast_queries=False).collect(),
        )
    )
    assert ga == gb and ga


def test_q168_incremental_index_merge(spark):
    """Fixture intent for the refresh: delta-only terms appear with
    delta counts, shared terms' df/total_tf are exact sums, base-only
    terms ride through unchanged (the oracle hash separately proves
    refresh == recompute corpus-wide)."""
    from ml_with_spark_streaming_spark.operators.retrieval import (
        index_term_stats,
        merge_term_stats,
    )

    base = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "beta gamma")], "doc_id long, text string"
    )
    delta = spark.createDataFrame(
        [(3, "beta beta delta")], "doc_id long, text string"
    )
    merged = {
        r.term: (r.df, r.total_tf)
        for r in merge_term_stats(
            index_term_stats(base), index_term_stats(delta)
        ).collect()
    }
    assert merged == {
        "alpha": (1, 2),
        "beta": (3, 4),   # docs 1,2,3; tf 1+1+2
        "gamma": (1, 1),
        "delta": (1, 1),
    }
