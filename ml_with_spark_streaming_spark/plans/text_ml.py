"""Text-pipeline queries over the documents table: the reference's
cleaning chain (P3–P8) plus the text-analysis operators (language-ID,
quality, token counting, fingerprinting), each with a DuckDB oracle.

The cleaning SQL mirrors functions/text.py::clean_text_expr exactly —
same regexes, same order (reference: PAC/passiveAgressiveModel.py:47-52).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ml_with_spark_streaming_spark.functions.text import (
    STOPWORDS_MINI,
    clean_text_expr,
    stem_tokens_udf,
    tokens_expr,
)
from ml_with_spark_streaming_spark.operators.textstats import (
    exact_round_div,
    exact_round_div_sql,
    LANG_LEXICONS,
    LANG_ORDER,
    TOKEN_PATTERN,
    char_counts,
    fingerprint_expr,
    lang_id_expr,
    quality_score_expr,
    token_count_expr,
    whitespace_token_count_expr,
)
from ml_with_spark_streaming_spark.operators.dedup import exact_dedup
from ml_with_spark_streaming_spark.operators.retrieval import (
    BM25_AVGDL_DUCK,
    BM25_CONTRIB_DUCK,
    BM25_LN_CONTRIB_DUCK,
)
from ml_with_spark_streaming_spark.plans.registry import query
from ml_with_spark_streaming_spark.sources.batch import load_table

# the P3-P8 chain in portable SQL ('g' flag: duckdb replaces first
# match only by default; Spark replaces all)
CLEAN_SQL = (
    "trim(lower(regexp_replace(regexp_replace(regexp_replace(regexp_replace("
    "text, '[@#&][A-Za-z0-9-]+', ' ', 'g'), '\\w+://\\S+', ' ', 'g'), "
    "'[^A-Za-z]', ' ', 'g'), '\\s+', ' ', 'g')))"
)

Q40_SQL = f"""
SELECT doc_id, {CLEAN_SQL} AS cleaned
FROM documents
ORDER BY doc_id
"""


@query("q40_clean_documents", Q40_SQL)
def q40_clean_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", clean_text_expr("text").alias("cleaned")).orderBy("doc_id")


Q41_SQL = f"""
SELECT
  doc_id,
  CASE WHEN length({CLEAN_SQL}) = 0 THEN 0
       ELSE len(string_split({CLEAN_SQL}, ' ')) END AS n_tokens,
  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_tokens,
  length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))  AS n_alpha,
  length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))     AS n_digit,
  length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))           AS n_punct
FROM documents
ORDER BY doc_id
"""


@query("q41_token_stats", Q41_SQL)
def q41_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    cc = char_counts("text")
    return d.select(
        "doc_id",
        whitespace_token_count_expr(clean_text_expr("text")).alias("n_tokens"),
        token_count_expr("text").alias("n_bpe_tokens"),
        cc["n_alpha"].alias("n_alpha"),
        cc["n_digit"].alias("n_digit"),
        cc["n_punct"].alias("n_punct"),
    ).orderBy("doc_id")


Q42_SQL = f"""
SELECT t AS token, COUNT(*) AS n
FROM (SELECT unnest(string_split({CLEAN_SQL}, ' ')) AS t FROM documents WHERE length({CLEAN_SQL}) > 0)
WHERE t <> ''
GROUP BY t
ORDER BY n DESC, t
LIMIT 20
"""


@query("q42_word_count_topk", Q42_SQL)
def q42_word_count_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokens_expr(clean_text_expr("text"))).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(20)
    )


_SW_LIST_SQL = "[" + ", ".join(f"'{w}'" for w in STOPWORDS_MINI) + "]"

Q43_SQL = f"""
SELECT
  doc_id,
  len(list_filter(toks, t -> list_contains({_SW_LIST_SQL}, t))) AS n_stopwords,
  len(toks) AS n_tokens,
  {exact_round_div_sql(f'len(list_filter(toks, t -> list_contains({_SW_LIST_SQL}, t)))', 'len(toks)')} AS stopword_ratio
FROM (
  SELECT doc_id, string_split({CLEAN_SQL}, ' ') AS toks
  FROM documents WHERE length({CLEAN_SQL}) > 0
)
WHERE len(toks) > 0
ORDER BY doc_id
"""


@query("q43_stopword_ratio", Q43_SQL)
def q43_stopword_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    sw = F.array(*[F.lit(w) for w in STOPWORDS_MINI])
    toks = tokens_expr(clean_text_expr("text"))
    out = d.select("doc_id", toks.alias("toks")).filter(F.size("toks") > 0)
    n_stop = F.size(F.filter(F.col("toks"), lambda t: F.array_contains(sw, t)))
    return out.select(
        "doc_id",
        n_stop.alias("n_stopwords"),
        F.size("toks").alias("n_tokens"),
        exact_round_div(n_stop, F.size("toks")).alias("stopword_ratio"),
    ).orderBy("doc_id")


def _lang_sql() -> str:
    hit = {
        lang: f"len(list_filter(toks, t -> list_contains([{', '.join(repr(w) for w in LANG_LEXICONS[lang])}], t)))"
        for lang in LANG_ORDER
    }
    best = "greatest(" + ", ".join(hit[lang] for lang in LANG_ORDER) + ")"
    case = "CASE " + " ".join(
        f"WHEN {best} > 0 AND {hit[lang]} = {best} THEN '{lang}'" for lang in LANG_ORDER
    ) + " ELSE 'und' END"
    return f"""
SELECT lang, {case} AS predicted, COUNT(*) AS n
FROM (
  SELECT lang, string_split({CLEAN_SQL}, ' ') AS toks
  FROM documents WHERE length({CLEAN_SQL}) > 0
)
GROUP BY lang, predicted
ORDER BY lang, predicted
"""


@query("q44_langid_heuristic", _lang_sql())
def q44_langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    cleaned = clean_text_expr("text")
    out = d.filter(F.length(cleaned) > 0)
    return (
        out.select("lang", lang_id_expr("text").alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count("*").alias("n"))
        .orderBy("lang", "predicted")
    )


# Per-doc quality as a reusable parenthesized subquery — q45 surfaces
# it directly; q134 joins it onto the dedup-component spine.
QUALITY_TABLE_SQL = f"""(
  SELECT doc_id,
         CASE WHEN n > 0
              THEN {exact_round_div_sql('250 * na + 100 * (n - np) + 3 * wcap * n', '500 * n')}
              ELSE 0.2 END AS quality
  FROM (
    SELECT doc_id,
           length(text) AS n,
           length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS na,
           length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS np,
           least(CASE WHEN length(trim(text)) = 0 THEN 0
                      ELSE len(string_split_regex(trim(text), '\\s+')) END, 50) AS wcap
    FROM documents
  )
)"""

Q45_SQL = f"""
SELECT doc_id, quality FROM {QUALITY_TABLE_SQL} q
ORDER BY doc_id
"""


@query("q45_quality_score", Q45_SQL)
def q45_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", quality_score_expr("text").alias("quality")).orderBy("doc_id")


Q46_SQL = f"""
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS group_size
FROM (
  SELECT doc_id,
         md5(array_to_string(string_split({CLEAN_SQL}, ' ')[1:8], ' ')) AS fp
  FROM documents
)
GROUP BY fp
ORDER BY doc_id
"""


@query("q46_fingerprint_dedup", Q46_SQL)
def q46_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on the 8-token-prefix md5 fingerprint: keep the
    min doc_id per group (hash-groupBy — one shuffle at any scale)."""
    d = load_table(spark, sf_dir, "documents")
    return exact_dedup(d, fingerprint_expr("text", 8), "doc_id").orderBy("doc_id")


@query("q47_stemmed_tokens", no_oracle_reason="Porter/Snowball stemming isn't expressible in SQL")
def q47_stemmed_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow pandas-UDF Porter stemming (the reference's only UDF,
    PAC/passiveAgressiveModel.py:64-66, vectorized)."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens_expr(clean_text_expr("text"))
    return (
        d.select("doc_id", stem_tokens_udf(toks).alias("stemmed"))
        .select("doc_id", F.concat_ws(" ", "stemmed").alias("stemmed_text"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# TF-IDF top term per document (smooth idf, sklearn-style)
# ---------------------------------------------------------------------------

Q48_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split({CLEAN_SQL}, ' ')) AS t
  FROM documents WHERE length({CLEAN_SQL}) > 0
),
tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM tok WHERE t <> '' GROUP BY doc_id, t),
df AS (SELECT t, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY t),
n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM tf),
scored AS (
  SELECT tf.doc_id, tf.t,
         ROUND(tf.tf * (ln((n.n + 1.0) / (df.df + 1.0)) + 1.0), 4) AS tfidf
  FROM tf JOIN df USING (t) CROSS JOIN n
)
SELECT doc_id, t AS term, tfidf FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, t) AS rn
  FROM scored
) WHERE rn = 1
ORDER BY doc_id
"""


@query("q48_tfidf_top_terms", Q48_SQL)
def q48_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top TF-IDF term, computed with built-ins only (the MLlib
    IDF estimator produces hashed — unmappable — feature indices; this
    keeps terms readable AND the whole plan oracle-checkable).

    Plan-shape note: deriving doc-frequency and corpus size from the
    tf table as separate aggregate branches re-executes the
    explode+clean lineage once PER BRANCH (three scans — ReuseExchange
    can't fire because column pruning specializes each branch's
    exchange). Instead: df as count() OVER (PARTITION BY t) — one
    extra vocab-keyed exchange of the small tf table, single explode
    lineage — and the 1-row corpus count from a cheap no-explode pass
    over documents. Measured 1.7 s → 1.3 s at sf0.1; at 100 TB it is
    one full tokenize pass instead of three."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(tokens_expr(clean_text_expr("text"))).alias("t")
    ).filter(F.col("t") != "")
    tf = tok.groupBy("doc_id", "t").agg(F.count("*").alias("tf"))
    tfd = tf.withColumn("df", F.count("*").over(W.partitionBy("t")))
    n = d.agg(
        F.sum(
            F.when(
                F.exists(tokens_expr(clean_text_expr("text")), lambda x: x != ""), 1
            ).otherwise(0)
        ).alias("n")
    )
    scored = (
        tfd.crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "t",
            F.round(
                F.col("tf") * (F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)) + 1.0), 4
            ).alias("tfidf"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "t")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("t").alias("term"), "tfidf")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Winnowing (rolling-hash) document fingerprints — MOSS-style
# ---------------------------------------------------------------------------

Q83_SQL = f"""
WITH c AS (
  SELECT doc_id, {CLEAN_SQL} AS s FROM documents
),
pos AS (
  SELECT doc_id, i, substr(s, CAST(i AS INT), 8) AS wstr
  FROM c, UNNEST(generate_series(1, greatest(length(s) - 7, 0))) AS t(i)
),
h AS (
  SELECT doc_id, i,
         list_reduce(
           list_transform(generate_series(1, 8),
                          j -> CAST(ord(substr(wstr, CAST(j AS INT), 1)) AS BIGINT)),
           (acc, ch) -> (acc * 31 + ch) % 2147483647
         ) AS hh
  FROM pos
),
fp AS (
  SELECT DISTINCT doc_id, f FROM (
    SELECT doc_id, i,
           MIN(hh) OVER (PARTITION BY doc_id ORDER BY i
                         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS f
    FROM h
  ) q WHERE i >= 4
)
SELECT doc_id, COUNT(*) AS n_fp, MIN(f) AS fp_min, MAX(f) AS fp_max,
       CAST(SUM(f) AS BIGINT) AS fp_sum
FROM fp
GROUP BY doc_id
ORDER BY doc_id
"""


@query("q83_winnowing_fingerprints", Q83_SQL)
def q83_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash (Rabin-Karp) k-gram hashes + winnowing selection
    (Schleimer et al., SIGMOD'03) — the brief's rolling-hash document
    fingerprinting, distinct from q46's md5-prefix blocking key. The
    fold arithmetic is pinned to int64 mod 2^31-1 so DuckDB reproduces
    every fingerprint bit-for-bit."""
    from ml_with_spark_streaming_spark.operators.textstats import winnowing_summary

    d = load_table(spark, sf_dir, "documents")
    return winnowing_summary(d, "text", "doc_id", k=8, w=4).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q102 — real BPE token counts (vs the q41 regex proxy)
# ---------------------------------------------------------------------------


@query("q102_bpe_token_counts", no_oracle_reason="BPE tokenization isn't SQL-expressible")
def q102_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document REAL byte-level BPE token counts next to the
    whitespace count and the q41 regex proxy, plus the implied
    tokens-per-100-chars rate — the number a training-data pipeline
    actually budgets by.

    The tokenizer is ``functions/bpe.py`` (published byte-level BPE,
    deterministic in-repo vocab) behind an Arrow-batched
    ``pandas_udf`` — the stemmer's pattern; everything else stays
    codegen. No SQL oracle (BPE is not SQL-expressible — driver
    records the rows-only check); the tokenizer itself is pinned by
    hand-verified merge fixtures and a pure-Python cross-check over
    real documents in tests/test_text.py."""
    from ml_with_spark_streaming_spark.functions.bpe import bpe_token_count_series
    from ml_with_spark_streaming_spark.operators.textstats import (
        token_count_expr,
        whitespace_token_count_expr,
    )

    bpe_count = F.pandas_udf(bpe_token_count_series, "long")

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        whitespace_token_count_expr(clean_text_expr("text")).cast("long").alias("n_ws_tokens"),
        token_count_expr("text").cast("long").alias("n_bpe_tokens_proxy"),
        bpe_count("text").alias("n_bpe_tokens_real"),
        F.length("text").cast("long").alias("n_chars"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q111 — distributed BPE vocabulary training over the corpus
# ---------------------------------------------------------------------------


@query("q111_bpe_vocab_train", no_oracle_reason="iterative BPE merge training isn't SQL-expressible")
def q111_bpe_vocab_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the BPE merge table ON THE CORPUS, distributed — the
    production answer to functions/bpe.py's import-time seed vocab
    (which q102/q103 use by default). Per round: one adjacent-pair
    ``groupBy().sum()`` over the Zipf-bounded WORD-COUNT table (not the
    corpus), a 1-row TakeOrdered argmax to the driver, and a JVM-side
    merge fold; see operators/bpe_train.py for the scale analysis.

    Output: the merge table in training order, bytes surfaced as hex
    strings (driver-comparator-safe). Deterministic — same corpus,
    same merges (ties break on unsigned byte order, identical to the
    in-process trainer; equality is fixture-tested in
    tests/test_bpe_train.py). Rows-only check: iterative argmax
    training is not expressible in one SQL statement.

    n_merges is testdata-scaled (32; production vocabs run 30-50k
    rounds with the SAME per-round plan — the word table shrinks as
    words saturate, and each round stays one vocab-sized shuffle)."""
    from ml_with_spark_streaming_spark.operators.bpe_train import train_bpe_distributed

    d = load_table(spark, sf_dir, "documents")
    merges = train_bpe_distributed(d, "text", n_merges=32)
    rows = [
        (i, a.hex(), b.hex(), (a + b).decode("utf-8", "backslashreplace"))
        for i, (a, b) in enumerate(merges)
    ]
    return spark.createDataFrame(rows, "rank int, left_hex string, right_hex string, merged string")


# ---------------------------------------------------------------------------
# q116 — inverted index build (term -> postings summary)
# ---------------------------------------------------------------------------

Q116_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split({CLEAN_SQL}, ' ') AS t
  FROM documents WHERE length({CLEAN_SQL}) > 0
),
tok AS (SELECT doc_id, unnest(t) AS term FROM toks),
tf AS (SELECT term, doc_id, COUNT(*) AS tf FROM tok GROUP BY term, doc_id)
SELECT term,
       CAST(COUNT(*) AS BIGINT) AS df,
       CAST(SUM(tf) AS BIGINT) AS total_tf,
       substr(md5(string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id)), 1, 16) AS postings_fp
FROM tf GROUP BY term ORDER BY term
"""


@query("q116_inverted_index", Q116_SQL)
def q116_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build — the retrieval-side artifact every search
    / RAG corpus ships: per term, document frequency, total term
    frequency, and a fingerprint of the full ``doc_id:tf`` postings
    list (sorted by doc — the md5 prefix stands in for the posting
    array so the result stays driver-narrow while still pinning the
    COMPLETE postings content, not just its size).

    Scale shape: one tokenize+explode pass, one (term, doc) partial
    aggregation (map-side combinable), then one term-keyed shuffle
    whose reduce builds each posting list locally — exactly how
    distributed index builds partition (term-sharded). No joins, no
    window over data; output is vocabulary-sized."""
    from ml_with_spark_streaming_spark.operators.retrieval import inverted_index

    d = load_table(spark, sf_dir, "documents")
    return inverted_index(d, "text", "doc_id").orderBy("term")


# ---------------------------------------------------------------------------
# q168 — incremental inverted-index maintenance (refresh == recompute)
# ---------------------------------------------------------------------------

Q168_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split({CLEAN_SQL}, ' ') AS t
  FROM documents WHERE length({CLEAN_SQL}) > 0
),
tok AS (SELECT doc_id, unnest(t) AS term FROM toks),
tf AS (SELECT term, doc_id, COUNT(*) AS tf FROM tok GROUP BY term, doc_id)
SELECT term,
       CAST(COUNT(*) AS BIGINT) AS df,
       CAST(SUM(tf) AS BIGINT) AS total_tf
FROM tf GROUP BY term ORDER BY term
"""


@query("q168_incremental_index", Q168_SQL)
def q168_incremental_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental inverted-index maintenance — the q151 MV discipline
    applied to the retrieval artifact: an append-only corpus must not
    rebuild its index per drop. The Spark side REFRESHES: term stats
    over the base slice (``doc_id % 5 != 0`` — the stored index
    artifact), term stats over the delta (the new drop), merged with
    one vocabulary-sized full-outer sum
    (``operators/retrieval.py::merge_term_stats``). The oracle
    RECOMPUTES over the whole corpus — the hash match IS the
    refresh-equals-recompute invariant (df and total_tf are sums over
    disjoint doc sets, so the merge is exact, not approximate).

    The postings fingerprint (q116's audit column) is deliberately
    absent: it digests the FULL posting list, which an incremental
    refresh by definition does not rebuild — at scale the posting
    lists themselves are term-sharded parquet appended per drop, and
    df/total_tf are the maintained summary the BM25 scorer reads.

    Scale shape: refresh cost = one tokenize pass over the DELTA plus
    a vocabulary-sized merge join; the base is read from its artifact
    (here recomputed — testdata has no persisted index), never from
    the raw corpus.
    """
    from ml_with_spark_streaming_spark.lineage import maybe_checkpoint
    from ml_with_spark_streaming_spark.operators.retrieval import (
        index_term_stats,
        merge_term_stats,
    )

    d = load_table(spark, sf_dir, "documents")
    base = index_term_stats(d.filter(F.col("doc_id") % 5 != 0))
    delta = index_term_stats(d.filter(F.col("doc_id") % 5 == 0))
    return merge_term_stats(maybe_checkpoint(base), delta).orderBy("term")


# ---------------------------------------------------------------------------
# q117 — BM25 top-k retrieval (exact integer-rational scoring)
# ---------------------------------------------------------------------------

# Fixed query terms (present in the synthetic corpus vocabulary).
_BM25_TERMS = ("hash", "join", "vector")
_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_TERMS)

# FIXED-POINT BM25 (k1 = 6/5, b = 3/4): avgdl, idf, and saturation each
# quantized HALF-UP in integer arithmetic, then multiplied and summed as
# BIGINT — no ln(), no double division, no float sums. The expression
# fragments are SHARED with the Spark plan (operators/retrieval.py), so
# the engines cannot drift; per-factor quantization also keeps every
# intermediate corpus-size-independent except idf's doc count (the naive
# single-rational form overflowed int64 at ~1e10 corpus tokens).
Q117_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split({CLEAN_SQL}, ' ') AS t
  FROM documents WHERE length({CLEAN_SQL}) > 0
),
dl AS (SELECT doc_id, len(t) AS dl FROM toks),
st AS (
  SELECT n, tt, CAST({BM25_AVGDL_DUCK} AS BIGINT) AS a
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS tt FROM dl)
),
tok AS (SELECT doc_id, unnest(t) AS term FROM toks),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE term IN ({_BM25_TERMS_SQL}) GROUP BY doc_id, term
),
dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
r AS (
  SELECT tf.doc_id AS doc_id, tf.tf AS tf, dfreq.df AS df, dl.dl AS dl, st.n AS n, st.a AS a
  FROM tf
  JOIN dfreq USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN st
),
c AS (SELECT doc_id, {BM25_CONTRIB_DUCK} AS contrib FROM r)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_hit_terms,
       CAST(SUM(contrib) AS BIGINT) AS score_x1e4
FROM c GROUP BY doc_id
ORDER BY score_x1e4 DESC, doc_id
LIMIT 20
"""


@query("q117_bm25_topk", Q117_SQL)
def q117_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k retrieval (Robertson/Sparck Jones; k1=1.2, b=0.75)
    for a fixed term query over the documents corpus — the scoring
    half of the q116 index. Fixed-point scoring (see
    operators/retrieval.py): avgdl/idf/saturation quantized HALF-UP in
    integer arithmetic, no ln()/doubles — the ranking is bit-identical
    across engines and partition layouts, the score crosses the driver
    boundary as a scaled BIGINT, and no intermediate grows with corpus
    tokens (the naive single-rational form overflowed int64).

    Scale shape: corpus stats (N docs, T tokens) are a 1-row broadcast;
    per-term document frequencies are a |query|-row broadcast; the only
    data-sized work is the tokenize pass and a (doc, term) partial
    aggregation filtered to query terms BEFORE the shuffle (the filter
    prunes ~|vocab|/|query| of the explode output map-side). Top-k is
    TakeOrderedAndProject — no global sort materialization."""
    from ml_with_spark_streaming_spark.operators.retrieval import bm25_topk

    d = load_table(spark, sf_dir, "documents")
    return bm25_topk(d, _BM25_TERMS, k=20, text_col="text", id_col="doc_id")


# ---------------------------------------------------------------------------
# q124 — multi-query BM25 (the batch retrieval job)
# ---------------------------------------------------------------------------

_BM25_QUERIES = (
    (1, "hash"), (1, "join"),
    (2, "vector"), (2, "merge"),
    (3, "scan"), (3, "filter"), (3, "sort"),
)
_BM25_QUERIES_SQL = ", ".join(f"({q}, '{t}')" for q, t in _BM25_QUERIES)

Q124_SQL = f"""
WITH qt(query_id, term) AS (VALUES {_BM25_QUERIES_SQL}),
toks AS (
  SELECT doc_id, string_split({CLEAN_SQL}, ' ') AS t
  FROM documents WHERE length({CLEAN_SQL}) > 0
),
dl AS (SELECT doc_id, len(t) AS dl FROM toks),
st AS (
  SELECT n, tt, CAST({BM25_AVGDL_DUCK} AS BIGINT) AS a
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS tt FROM dl)
),
tok AS (SELECT doc_id, unnest(t) AS term FROM toks),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE term IN (SELECT term FROM qt) GROUP BY doc_id, term
),
dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
r AS (
  SELECT qt.query_id AS query_id, tf.doc_id AS doc_id,
         tf.tf AS tf, dfreq.df AS df, dl.dl AS dl, st.n AS n, st.a AS a
  FROM tf
  JOIN dfreq USING (term)
  JOIN dl USING (doc_id)
  JOIN qt USING (term)
  CROSS JOIN st
),
c AS (SELECT query_id, doc_id, {BM25_CONTRIB_DUCK} AS contrib FROM r),
sc AS (
  SELECT query_id, doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_hit_terms,
         CAST(SUM(contrib) AS BIGINT) AS score_x1e4
  FROM c GROUP BY query_id, doc_id
)
SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, n_hit_terms, score_x1e4, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score_x1e4 DESC, doc_id) AS BIGINT) AS rank
  FROM sc
) t
WHERE rank <= 5
ORDER BY query_id, rank
"""


@query("q124_bm25_multi_query", Q124_SQL)
def q124_bm25_multi_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch retrieval job: BM25 top-5 per query for a TABLE of
    queries in one corpus pass (operators/retrieval.bm25_topk_batch) —
    how a production pipeline actually scores thousands of queries,
    vs q117's single fixed query. Query terms prune the corpus explode
    map-side via a broadcast semi-join; per-term df is computed once
    however many queries share the term; per-query top-k is a
    query-partitioned window (bounded, never global). Identical exact
    integer-rational scoring — hash-exact against DuckDB."""
    from ml_with_spark_streaming_spark.operators.retrieval import bm25_topk_batch

    d = load_table(spark, sf_dir, "documents")
    queries = spark.createDataFrame(
        list(_BM25_QUERIES), "query_id long, term string"
    )
    return bm25_topk_batch(d, queries, k=5).orderBy("query_id", "rank")


# ---------------------------------------------------------------------------
# q128 — winnowing-overlap near-dup pairs (MOSS-style candidate generator)
# ---------------------------------------------------------------------------

_WINNOW_MAX_DF = 20  # stop-fingerprint cap: drop fps shared by > max_df docs
_WINNOW_MIN_SHARED = 5  # report pairs sharing >= this many rare fingerprints

Q128_SQL = f"""
WITH c AS (
  SELECT doc_id, {CLEAN_SQL} AS s FROM documents
),
pos AS (
  SELECT doc_id, i, substr(s, CAST(i AS INT), 8) AS wstr
  FROM c, UNNEST(generate_series(1, greatest(length(s) - 7, 0))) AS t(i)
),
h AS (
  SELECT doc_id, i,
         list_reduce(
           list_transform(generate_series(1, 8),
                          j -> CAST(ord(substr(wstr, CAST(j AS INT), 1)) AS BIGINT)),
           (acc, ch) -> (acc * 31 + ch) % 2147483647
         ) AS hh
  FROM pos
),
fp AS (
  SELECT DISTINCT doc_id, f FROM (
    SELECT doc_id, i,
           MIN(hh) OVER (PARTITION BY doc_id ORDER BY i
                         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS f
    FROM h
  ) q WHERE i >= 4
),
rare AS (SELECT f FROM fp GROUP BY f HAVING COUNT(*) <= {_WINNOW_MAX_DF}),
fpr AS (SELECT fp.doc_id, fp.f FROM fp JOIN rare USING (f)),
sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fp FROM fpr GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2, CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM fpr a JOIN fpr b ON a.f = b.f AND a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING COUNT(*) >= {_WINNOW_MIN_SHARED}
)
SELECT s.id1, s.id2, s.n_shared,
       {exact_round_div_sql('s.n_shared', 'least(z1.n_fp, z2.n_fp)')} AS overlap
FROM shared s
JOIN sz z1 ON z1.doc_id = s.id1
JOIN sz z2 ON z2.doc_id = s.id2
ORDER BY s.id1, s.id2
"""


@query("q128_winnowing_pairs", Q128_SQL)
def q128_winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-overlap near-dup candidates (MOSS, Schleimer et al.
    SIGMOD'03) — the rolling-hash modality of the dedup family,
    complementary to MinHash (token sets) and SimHash (bit sketches):
    two docs sharing any substring of length >= k+w-1 chars share a
    fingerprint, so shared-fingerprint counts find copied PASSAGES
    even across reordered documents. Pairs are generated only inside
    fingerprint buckets, with the standard stop-fingerprint cap
    (fps appearing in > max_df docs are dropped — the hot-bucket
    quadratic guard, exactly the stopword trick): never all-pairs.

    overlap = n_shared / min(|fp set|) is the containment-style score
    (exact 4-decimal rational). Fully DuckDB-oracled — the rolling
    hash is plain integer arithmetic in both engines."""
    from ml_with_spark_streaming_spark.lineage import maybe_checkpoint
    from ml_with_spark_streaming_spark.operators.textstats import winnowing_fingerprints

    d = load_table(spark, sf_dir, "documents")
    fps = maybe_checkpoint(winnowing_fingerprints(d, "text", "doc_id", k=8, w=4))
    rare = fps.groupBy("fp").agg(F.count("*").alias("_d")).filter(
        F.col("_d") <= _WINNOW_MAX_DF
    ).select("fp")
    fpr = maybe_checkpoint(fps.join(rare, "fp", "left_semi"))
    sz = fpr.groupBy("doc_id").agg(F.count("*").cast("long").alias("n_fp"))
    a = fpr.select(F.col("doc_id").alias("id1"), "fp")
    b = fpr.select(F.col("doc_id").alias("id2"), "fp")
    shared = (
        a.join(b, "fp")
        .filter(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= _WINNOW_MIN_SHARED)
    )
    z1 = sz.select(F.col("doc_id").alias("id1"), F.col("n_fp").alias("n1"))
    z2 = sz.select(F.col("doc_id").alias("id2"), F.col("n_fp").alias("n2"))
    return (
        shared.join(z1, "id1")
        .join(z2, "id2")
        .select(
            "id1",
            "id2",
            "n_shared",
            exact_round_div(F.col("n_shared"), F.least("n1", "n2")).alias("overlap"),
        )
        .orderBy("id1", "id2")
    )


# ---------------------------------------------------------------------------
# q130 — log-BM25 top-k (textbook Lucene idf, engine-exact via sqrt-ln)
# ---------------------------------------------------------------------------

Q130_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split({CLEAN_SQL}, ' ') AS t
  FROM documents WHERE length({CLEAN_SQL}) > 0
),
dl AS (SELECT doc_id, len(t) AS dl FROM toks),
st AS (
  SELECT n, tt, CAST({BM25_AVGDL_DUCK} AS BIGINT) AS a
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS tt FROM dl)
),
tok AS (SELECT doc_id, unnest(t) AS term FROM toks),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE term IN ({_BM25_TERMS_SQL}) GROUP BY doc_id, term
),
dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
r AS (
  SELECT tf.doc_id AS doc_id, tf.tf AS tf, dfreq.df AS df, dl.dl AS dl, st.n AS n, st.a AS a
  FROM tf
  JOIN dfreq USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN st
),
c AS (SELECT doc_id, {BM25_LN_CONTRIB_DUCK} AS contrib FROM r)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_hit_terms,
       CAST(SUM(contrib) AS BIGINT) AS score_x1e4
FROM c GROUP BY doc_id
ORDER BY score_x1e4 DESC, doc_id
LIMIT 20
"""


@query("q130_bm25_ln_topk", Q130_SQL)
def q130_bm25_ln_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Textbook log-BM25 top-k — q117's retrieval with the Lucene idf
    ``ln(1 + (N−df+½)/(df+½))`` instead of the raw Robertson ratio, so
    multi-term rankings match what an existing BM25 system (Lucene /
    Elasticsearch / textbook implementations) produces. The ln is NOT
    the engine's libm ``ln()`` (banned from oracled queries — results
    are not guaranteed identically rounded across engines): it is
    constructed from correctly-rounded IEEE ops only (16 nested sqrt +
    odd atanh series, see operators/retrieval.py) and quantized to a
    BIGINT at 1e-6, making scores bit-identical across engines AND
    equal to round(math.log(x)*1e6) on every probed input.

    Plan shape is identical to q117 (1-row stats broadcast, |terms|-row
    df broadcast, map-side term filter before the only shuffle, TakeOrdered
    top-k); the ln chain adds ~300 scalar double ops on candidate rows —
    corpus-size-independent. tests/test_retrieval.py pins a fixture where
    raw-idf and log-BM25 ORDER DIFFERENTLY and this query matches the
    math.log ordering."""
    from ml_with_spark_streaming_spark.operators.retrieval import bm25_ln_topk

    d = load_table(spark, sf_dir, "documents")
    return bm25_ln_topk(d, _BM25_TERMS, k=20, text_col="text", id_col="doc_id")


# ---------------------------------------------------------------------------
# q131 — bigram-LM perplexity scoring (CCNet-style quality signal)
# ---------------------------------------------------------------------------

def _q131_sql() -> str:
    from ml_with_spark_streaming_spark.operators.lm import (
        BIGRAM_NLL6_SQL,
        MEAN_NLL_SQL,
    )

    return f"""
WITH toks AS (
  SELECT doc_id, string_split({CLEAN_SQL}, ' ') AS t
  FROM documents WHERE length({CLEAN_SQL}) > 0
),
tk AS (SELECT doc_id, t FROM toks WHERE len(t) >= 2),
pos AS (
  SELECT doc_id, t[CAST(i AS INT)] AS w1, t[CAST(i AS INT) + 1] AS w2
  FROM tk, UNNEST(generate_series(1, len(t) - 1)) AS u(i)
),
uni AS (
  SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1
  FROM (SELECT unnest(t) AS w1 FROM tk) GROUP BY w1
),
big AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM pos GROUP BY w1, w2),
voc AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM uni),
scored AS (
  SELECT w1, w2, {BIGRAM_NLL6_SQL} AS nll6
  FROM big JOIN uni USING (w1) CROSS JOIN voc
),
occ AS (
  SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS n_occ
  FROM pos GROUP BY 1, 2, 3
),
pd AS (
  SELECT doc_id,
         CAST(SUM(n_occ) AS BIGINT) AS n_bigrams,
         CAST(SUM(n_occ * nll6) AS BIGINT) AS nll_x1e6
  FROM occ JOIN scored USING (w1, w2) GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(pd.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(COALESCE(pd.nll_x1e6, 0) AS BIGINT) AS nll_x1e6,
       CAST(COALESCE({MEAN_NLL_SQL.format(div='//')}, 0) AS BIGINT) AS mean_nll_x1e6
FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id
ORDER BY d.doc_id
"""


@query("q131_bigram_lm_nll", _q131_sql())
def q131_bigram_lm_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-style LM quality scoring (CCNet, Wenzek et al. 2019)
    — the standard corpus-curation signal this family was missing:
    every document scored under an add-one-smoothed bigram LM, surfaced
    as total and per-bigram-mean negative log-likelihood in micro-nats
    (BIGINT). High mean-NLL = text the reference distribution finds
    improbable (gibberish, boilerplate soup) — the gate/bucket key of a
    perplexity filter.

    Engine-exact: −ln P = ln((c1+V)/(c12+1)) with the q130
    sqrt-constructed correctly-rounded ln (argument always >= 1), so
    the whole scorer is hash-exact against DuckDB — a distributed LM
    scoring job whose output is reproducible bit-for-bit at any
    partition layout (operators/lm.py documents the int64 bounds).

    Scale shape: tokenize once (checkpointed); unigram/bigram count
    tables are vocab-/bigram-vocab-sized (Zipf-bounded), scored ONCE
    per distinct bigram; the corpus-sized occurrence table is
    pre-aggregated per (doc, w1, w2) map-side before its single join.
    At production scale the count tables come from a persisted
    reference-corpus artifact instead of self-counts — same plan, the
    count lineage swapped for a parquet read."""
    from ml_with_spark_streaming_spark.operators.lm import bigram_lm_scores

    d = load_table(spark, sf_dir, "documents")
    return bigram_lm_scores(d, "text", "doc_id")


# ---------------------------------------------------------------------------
# q141 — heavy-hitter n-grams: Misra-Gries candidates + exact verify
# ---------------------------------------------------------------------------

Q141_SQL = f"""
WITH toks AS (
  SELECT string_split({CLEAN_SQL}, ' ') AS t
  FROM documents WHERE length({CLEAN_SQL}) > 0
),
grams AS (
  SELECT unnest(list_transform(generate_series(1, greatest(len(t) - 1, 0)),
                i -> array_to_string(t[i:i+1], ' '))) AS gram
  FROM toks
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM grams),
cnt AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS cnt FROM grams GROUP BY gram)
SELECT gram, cnt
FROM cnt, tot
WHERE cnt * 1024 > n
ORDER BY cnt DESC, gram
"""


@query("q141_frequent_ngrams", Q141_SQL)
def q141_frequent_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter bigrams: every bigram whose global count exceeds
    n/1024, with EXACT counts — found with bounded memory via
    per-partition Misra-Gries sketches (k=1023 counters) whose union
    is a provable superset of all heavy hitters, then exact-verified
    (operators/sketch.py — the theorem means the sketch affects
    MEMORY, never the answer, so a Python sketch pass still yields a
    hash-exact DuckDB oracle; the oracle just counts exactly).

    The boilerplate/template-discovery primitive: the direct
    groupBy(gram) needs a gram-cardinality combine map per task, which
    grows with the corpus; MG caps it at k counters per task and the
    verify groupBy only carries ≤ partitions·k candidate grams.
    """
    from ml_with_spark_streaming_spark.operators.sketch import frequent_ngrams

    d = load_table(spark, sf_dir, "documents")
    return frequent_ngrams(d, "text", k=1023, ngram=2).orderBy(
        F.col("cnt").desc(), "gram"
    )


# ---------------------------------------------------------------------------
# q143 — exact phrase search via positional postings intersection
# ---------------------------------------------------------------------------

# The oracle deliberately uses a DIFFERENT algorithm (direct sliding-
# window trigram extraction + count) than the engine (positional-
# postings vote join), so a hash match proves the index-intersection
# semantics, not just a shared formulation.
Q143_SQL = f"""
WITH tok AS (
  SELECT doc_id, string_split({CLEAN_SQL}, ' ') AS t
  FROM documents WHERE length({CLEAN_SQL}) > 0
),
tri AS (
  SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS phrase
  FROM tok, unnest(range(1, len(t) - 1)) AS r(i)
  WHERE len(t) >= 3
),
top3 AS (
  SELECT phrase FROM (
    SELECT phrase, COUNT(*) AS n FROM tri GROUP BY phrase
    ORDER BY n DESC, phrase LIMIT 3
  )
)
SELECT phrase, doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches
FROM tri JOIN top3 USING (phrase)
GROUP BY phrase, doc_id
ORDER BY phrase, doc_id
"""


@query("q143_phrase_search", Q143_SQL)
def q143_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search (positional inverted index): take the 3
    globally most frequent trigram phrases (deterministic tie-break:
    count desc, phrase asc), then find every occurrence of each via
    positional-postings intersection (operators/retrieval.py::
    phrase_match — broadcast of the 9-row (phrase, off, term) table
    against one postings scan; candidate starts combine map-side).

    The query-phrase discovery pass is itself one explode + one
    gram-keyed groupBy + TakeOrdered(3); at 100 TB the postings table
    would be a persisted term-sharded index and only the probed
    terms' shards are read — here discovery and postings derive from
    ONE maybe_checkpoint-materialized token table (one documents
    scan), and the 3-row phrase table is materialized so its two
    phrase_match roles (offsets + lengths) don't re-run discovery.
    The oracle recomputes matches by brute sliding-window extraction,
    an independent formulation.
    """
    from ml_with_spark_streaming_spark.lineage import maybe_checkpoint
    from ml_with_spark_streaming_spark.operators.retrieval import (
        phrase_match,
        positional_postings_from_tokens,
    )

    d = load_table(spark, sf_dir, "documents")
    toks = maybe_checkpoint(
        d.select("doc_id", tokens_expr(clean_text_expr("text")).alias("t")).filter(
            F.size("t") > 0
        )
    )
    tris = toks.filter(F.size("t") >= 3).select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(t) - 3),"
                " i -> concat_ws(' ', t[i], t[i+1], t[i+2]))"
            )
        ).alias("phrase")
    )
    top3 = maybe_checkpoint(
        tris.groupBy("phrase")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "phrase")
        .limit(3)
        .select("phrase")
    )
    postings = positional_postings_from_tokens(toks)
    return phrase_match(postings, top3).orderBy("phrase", "doc_id")


# ---------------------------------------------------------------------------
# q144 — vocabulary growth profile (Heaps'-law curve)
# ---------------------------------------------------------------------------

_Q144_BUCKET = "(({col} - mn) * 20) {div} (mx - mn + 1)"

Q144_SQL = f"""
WITH tok AS (
  SELECT doc_id, string_split({CLEAN_SQL}, ' ') AS t
  FROM documents WHERE length({CLEAN_SQL}) > 0
),
bounds AS (SELECT MIN(doc_id) AS mn, MAX(doc_id) AS mx FROM tok),
dl AS (
  SELECT {_Q144_BUCKET.format(col="doc_id", div="//")} AS bucket, len(t) AS n_tokens
  FROM tok, bounds
),
docs_b AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS bucket_tokens
  FROM dl GROUP BY bucket
),
first_doc AS (
  SELECT tkn, MIN(doc_id) AS fd
  FROM (SELECT doc_id, unnest(t) AS tkn FROM tok)
  WHERE tkn <> '' GROUP BY tkn
),
new_v AS (
  SELECT {_Q144_BUCKET.format(col="fd", div="//")} AS bucket,
         CAST(COUNT(*) AS BIGINT) AS new_vocab
  FROM first_doc, bounds GROUP BY bucket
)
SELECT d.bucket, d.n_docs,
       COALESCE(n.new_vocab, 0) AS new_vocab,
       CAST(SUM(d.bucket_tokens) OVER (ORDER BY d.bucket) AS BIGINT) AS cum_tokens,
       CAST(SUM(COALESCE(n.new_vocab, 0)) OVER (ORDER BY d.bucket) AS BIGINT) AS cum_vocab
FROM docs_b d LEFT JOIN new_v n USING (bucket)
ORDER BY bucket
"""


@query("q144_vocab_growth", Q144_SQL)
def q144_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth (Heaps'-law) profile: docs bucketed into 20
    equal-width doc_id ranges; per bucket the number of docs, tokens,
    NEW vocabulary (tokens whose first occurrence falls in the
    bucket), and running totals — the curve |V| vs tokens-seen that
    tokenizer-sizing and dedup-health monitoring read (a corpus whose
    vocab keeps growing linearly is full of noise/IDs; one that
    flattens too fast is template-heavy).

    Scale: the vocab pass is one explode + token-keyed groupBy(min) —
    word-count cost; doc stats are a doc-keyed agg; both derive from
    ONE maybe_checkpoint-materialized token table (one documents
    scan). The doc-stat and new-vocab aggregates are union-merged by
    a second bucket-keyed aggregate so the only window runs DIRECTLY
    over a ≤20-row aggregate output (spine-bounded, no join in
    between). First-occurrence uses doc_id order (the corpus's
    stable ingest order), never a global sort.
    """
    from ml_with_spark_streaming_spark.lineage import maybe_checkpoint

    d = load_table(spark, sf_dir, "documents")
    toks = maybe_checkpoint(
        d.select("doc_id", tokens_expr(clean_text_expr("text")).alias("t")).filter(
            F.size("t") > 0
        )
    )
    bounds = toks.agg(
        F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx")
    )
    bucket = _Q144_BUCKET.format(col="{c}", div="DIV")
    dl = toks.crossJoin(F.broadcast(bounds)).selectExpr(
        f"{bucket.format(c='doc_id')} AS bucket", "size(t) AS n_tokens"
    )
    docs_b = dl.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("bucket_tokens"),
    )
    first_doc = (
        toks.select("doc_id", F.explode("t").alias("tkn"))
        .filter(F.col("tkn") != "")
        .groupBy("tkn")
        .agg(F.min("doc_id").alias("fd"))
    )
    new_v = (
        first_doc.crossJoin(F.broadcast(bounds))
        .selectExpr(f"{bucket.format(c='fd')} AS bucket")
        .groupBy("bucket")
        .agg(F.count("*").cast("long").alias("new_vocab"))
    )
    # Union-merge the two bucket aggregates (new_v's buckets are a
    # subset of docs_b's: a bucket with a first occurrence has ≥1 doc)
    # so the running-total window sits directly on an aggregate.
    merged = (
        docs_b.select("bucket", "n_docs", "bucket_tokens", F.lit(0).alias("new_vocab"))
        .unionByName(
            new_v.select(
                "bucket",
                F.lit(0).alias("n_docs"),
                F.lit(0).alias("bucket_tokens"),
                "new_vocab",
            )
        )
        .groupBy("bucket")
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("bucket_tokens").cast("long").alias("bucket_tokens"),
            F.sum("new_vocab").cast("long").alias("new_vocab"),
        )
    )
    from pyspark.sql import Window as W

    w = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, W.currentRow)
    return merged.select(
        "bucket",
        "n_docs",
        "new_vocab",
        F.sum("bucket_tokens").over(w).cast("long").alias("cum_tokens"),
        F.sum("new_vocab").over(w).cast("long").alias("cum_vocab"),
    ).orderBy("bucket")


# ---------------------------------------------------------------------------
# q153 — character-bigram entropy (information-theoretic quality signal)
# ---------------------------------------------------------------------------

from ml_with_spark_streaming_spark.operators.retrieval import ln_x1e6_sql  # noqa: E402

_LN_C = ln_x1e6_sql("CAST(c AS DOUBLE)")
_LN_N = ln_x1e6_sql("CAST(n_bigrams AS DOUBLE)")

# The oracle applies the exact-ln chain PER ROW (direct formulation);
# the engine routes ln through a distinct-count lookup table — a hash
# match proves the lookup restructuring is value-neutral.
Q153_SQL = f"""
WITH grams AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, length(text) - 1),
                               i -> substr(text, i, 2))) AS bg
  FROM documents WHERE length(text) >= 2
),
cnt AS (SELECT doc_id, bg, CAST(COUNT(*) AS BIGINT) AS c FROM grams GROUP BY doc_id, bg),
pd AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
         CAST(SUM(c * ({_LN_C})) AS BIGINT) AS s
  FROM cnt GROUP BY doc_id
)
SELECT doc_id, n_bigrams,
       CAST(({_LN_N}) - (s // n_bigrams) AS BIGINT) AS entropy_x1e6
FROM pd ORDER BY doc_id
"""


@query("q153_char_entropy", Q153_SQL)
def q153_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-bigram Shannon entropy in micro-nats
    (H = ln n − Σ c·ln c / n) — the information-theoretic repetition/
    gibberish signal (low = template soup, near-max = random noise)
    used alongside q45's ratio heuristics and q131's LM perplexity in
    curation stacks. Engine-exact: both ln's are the q130
    sqrt-constructed correctly-rounded ln on integer-count arguments,
    everything else positive-BIGINT floor arithmetic
    (``operators/textstats.py::char_bigram_entropy``).

    Scale shape: one (doc, bigram)-keyed map-side-combinable count
    groupBy + one per-doc sum; the ~300-op exact-ln chain runs ONLY on
    distinct count values (bounded by max doc length, not corpus
    size) and broadcast-joins back. The oracle computes ln per row —
    an independent formulation of the same value.
    """
    from ml_with_spark_streaming_spark.operators.textstats import (
        char_bigram_entropy,
    )

    d = load_table(spark, sf_dir, "documents")
    return char_bigram_entropy(d, "text", "doc_id").orderBy("doc_id")
