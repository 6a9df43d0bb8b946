"""Retrieval operators over a text corpus: inverted-index build and
BM25 scoring (Robertson/Sparck Jones).

The queries q116/q117/q124 (plans/text_ml.py) delegate here; these
functions are the reusable API surface — pass any (id, text) DataFrame
and, for BM25, any term list or query table.

Scoring is FIXED-POINT BM25 (k1 = 6/5, b = 3/4): avgdl, the idf
factor, and the tf-saturation factor are each quantized HALF-UP at 3-4
decimals with integer DIV (never double division), then multiplied and
summed as BIGINTs — so scores and rankings are bit-identical across
engines and partition layouts. The shared expression fragments below
are f-stringed into BOTH the Spark plans and the DuckDB oracle SQL, so
the two engines cannot drift.

Overflow bounds (int64): quantizing per-factor keeps every
intermediate corpus-size-INDEPENDENT except idf's doc count. The
binding constraints are ``440000·a·tf < 2^63`` (a = 1000·avgdl →
``avgdl·tf < 2.1e10``, e.g. 10k-token docs with tf up to 2e6) and the
final product ``idf4·sat4·2 < 2^63`` → worst case (df = 1, fully
saturated term) ``N < ~3e10`` documents — a 100 TB corpus at 10 KB/doc
is ~1e10 docs, inside the bound. A naive single-rational formulation
(num = idf_num·22·T·tf) overflows int64 once corpus tokens T reach
~1e10; this form does not (bounds pinned by
tests/test_retrieval.py::test_bm25_fixed_point_int64_bounds).

Documented deviation (``bm25_topk``/``bm25_topk_batch``): the idf
factor is the RAW Robertson ratio (N − df + ½)/(df + ½) without the
usual ln(·) wrap. ln is a monotone transform per term, but summed over
multiple terms the two forms are NOT rank-equivalent — raw idf weights
rare terms more aggressively than log-BM25.

``bm25_ln_topk`` closes that gap: textbook log-BM25 (Lucene idf
``ln(1 + (N − df + ½)/(df + ½)) = ln((2N+2)/(2df+1))``, always > 0)
while STAYING engine-exact. Built-in ``ln()`` is libm-dependent and
banned from oracled queries, so the ln is constructed from operations
IEEE 754 defines as correctly rounded in both engines (+ − × ÷ sqrt):
range-reduce with 16 nested sqrt (y = x^(1/2^16); ln x ≤ 24.6 for
N ≤ 1e10 docs ⇒ y − 1 ≤ 3.8e-4), then the odd atanh series
ln x = 2^16 · 2·(z + z³/3 + z⁵/5) with z = (y−1)/(y+1) — series
truncation error ~(2/5)z⁵ ≈ 1e-19 relative, total error dominated by
the 16 sqrt roundings (~2e-15 relative), then quantized HALF-UP to a
BIGINT at 1e-6 (``lnidf6``). On every probed (N, df) the quantized
value EQUALS round(math.log(x)·1e6) (tests/test_retrieval.py); the two
engines agree bit-for-bit because every double op in the chain is
correctly rounded, not approximated. Rankings therefore match true
log-BM25 up to ties at the 1e-6·saturation quantum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ml_with_spark_streaming_spark.functions.text import clean_text_expr, tokens_expr
from ml_with_spark_streaming_spark.lineage import maybe_checkpoint

DEFAULT_K1_NUM, DEFAULT_K1_DEN = 6, 5  # k1 = 1.2
DEFAULT_B_NUM, DEFAULT_B_DEN = 3, 4  # b = 0.75


def bm25_avgdl_sql(div: str) -> str:
    """a = HALF-UP(1000·T/N) over columns ``tt`` (total tokens) and
    ``n`` (doc count) — the scaled average document length."""
    return f"(tt * 2000 + n) {div} (2 * n)"


def bm25_contrib_sql(div: str) -> str:
    """One term's score contribution (×10⁴) over plain columns
    ``n, a, df, tf, dl``:

        idf4 = HALF-UP(1e4 · (2N − 2df + 1) / (2df + 1))
        D    = 10·a·tf + 3·a + 9000·dl          [den of satur, ×(10·a/T·N…) cancelled]
        sat4 = HALF-UP(1e4 · 22·a·tf / D)
        contrib = HALF-UP(idf4 · sat4 / 1e4)

    ``div`` is the engine's integer-division operator (Spark ``DIV``,
    DuckDB ``//``)."""
    idf4 = f"(((2*n - 2*df + 1) * 20000 + (2*df + 1)) {div} (2 * (2*df + 1)))"
    d = "(10*a*tf + 3*a + 9000*dl)"
    sat4 = f"((440000*a*tf + {d}) {div} (2 * {d}))"
    return f"(({idf4} * {sat4} * 2 + 10000) {div} 20000)"


def ln_x1e6_sql(x: str) -> str:
    """``round(ln(x)·1e6)`` as BIGINT from correctly-rounded IEEE ops
    only (16 nested sqrt + odd atanh series — see module docstring).
    Valid for x ≥ 1 (callers pass (2N+2)/(2df+1) ≥ 1 + 1/(2N+1));
    accurate to the last quantized digit for x ≤ e^25 (N ≤ 1e10 docs).
    Identical text is f-stringed into the Spark plan and the DuckDB
    oracle, so the engines evaluate the same expression tree."""
    y = x
    for _ in range(16):
        y = f"sqrt({y})"
    z = f"((({y}) - 1.0) / (({y}) + 1.0))"
    poly = f"(({z}) + ((({z})*({z}))*({z}))/3.0 + (((({z})*({z}))*(({z})*({z})))*({z}))/5.0)"
    return f"CAST(FLOOR((131072.0 * {poly}) * 1000000.0 + 0.5) AS BIGINT)"


LN_IDF6_SQL = ln_x1e6_sql(
    "((2.0 * CAST(n AS DOUBLE) + 2.0) / (2.0 * CAST(df AS DOUBLE) + 1.0))"
)


def bm25_ln_contrib_sql(div: str) -> str:
    """One term's log-BM25 contribution (×10⁴) over plain columns
    ``n, a, df, tf, dl``: Lucene idf ln((2N+2)/(2df+1)) quantized at
    1e-6 (``LN_IDF6_SQL``, always positive so integer HALF-UP division
    is engine-agnostic), the SAME fixed-point tf-saturation factor as
    :func:`bm25_contrib_sql`, combined as
    contrib = HALF-UP(lnidf6 · sat4 / 1e6). int64 bound: lnidf6 ≤
    2.5e7 (N ≤ 1e10), sat4 ≤ 2.2e4 ⇒ product·2 ≤ 1.1e12."""
    d = "(10*a*tf + 3*a + 9000*dl)"
    sat4 = f"((440000*a*tf + {d}) {div} (2 * {d}))"
    return f"(({LN_IDF6_SQL} * {sat4} * 2 + 1000000) {div} 2000000)"


BM25_AVGDL_SPARK = bm25_avgdl_sql("DIV")
BM25_AVGDL_DUCK = bm25_avgdl_sql("//")
BM25_CONTRIB_SPARK = bm25_contrib_sql("DIV")
BM25_CONTRIB_DUCK = bm25_contrib_sql("//")
BM25_LN_CONTRIB_SPARK = bm25_ln_contrib_sql("DIV")
BM25_LN_CONTRIB_DUCK = bm25_ln_contrib_sql("//")


def inverted_index(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per term: document frequency, total term frequency, and an md5
    fingerprint of the full sorted ``id:tf`` postings list. One
    explode, one (term, id) partial agg, one term-keyed shuffle —
    the term-sharded shape distributed index builds use."""
    tok = df.select(
        F.col(id_col), F.explode(tokens_expr(clean_text_expr(text_col))).alias("term")
    ).filter(F.col("term") != "")
    tf = tok.groupBy("term", id_col).agg(F.count("*").alias("tf"))
    posting = F.transform(
        F.array_sort(F.collect_list(F.struct(id_col, "tf"))),
        lambda s: F.concat_ws(":", s[id_col].cast("string"), s["tf"].cast("string")),
    )
    return (
        tf.groupBy("term")
        .agg(
            F.count("*").cast("long").alias("df"),
            F.sum("tf").cast("long").alias("total_tf"),
            F.substring(
                F.md5(F.encode(F.concat_ws(",", posting), "UTF-8")), 1, 16
            ).alias("postings_fp"),
        )
    )


def index_term_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """``(term, df, total_tf)`` — the ADDITIVE slice of the inverted
    index (no postings fingerprint), the form an incremental index
    refresh merges: both columns are sums over disjoint doc sets, so
    ``stats(base) ⊎ stats(delta) == stats(base ∪ delta)`` exactly
    (q168 pins that against a full recompute)."""
    tok = df.select(
        F.col(id_col), F.explode(tokens_expr(clean_text_expr(text_col))).alias("term")
    ).filter(F.col("term") != "")
    tf = tok.groupBy("term", id_col).agg(F.count("*").alias("tf"))
    return tf.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("tf").cast("long").alias("total_tf"),
    )


def merge_term_stats(base: DataFrame, delta: DataFrame) -> DataFrame:
    """Merge two disjoint-corpus ``index_term_stats`` tables: full
    outer on term, per-column sum — one vocabulary-sized join, no
    document rescan."""
    b = base.select("term", F.col("df").alias("_bdf"), F.col("total_tf").alias("_btf"))
    d = delta.select("term", F.col("df").alias("_ddf"), F.col("total_tf").alias("_dtf"))
    return b.join(d, "term", "full_outer").select(
        "term",
        (F.coalesce("_bdf", F.lit(0)) + F.coalesce("_ddf", F.lit(0)))
        .cast("long")
        .alias("df"),
        (F.coalesce("_btf", F.lit(0)) + F.coalesce("_dtf", F.lit(0)))
        .cast("long")
        .alias("total_tf"),
    )


def _corpus_stats(toks: DataFrame, id_col: str) -> tuple[DataFrame, DataFrame]:
    """(dl, st): per-doc length table and the 1-row (n, tt, a) stats."""
    dl = maybe_checkpoint(
        toks.select(id_col, F.size("_toks").cast("long").alias("dl"))
    )
    st = dl.agg(
        F.count("*").cast("long").alias("n"), F.sum("dl").cast("long").alias("tt")
    ).selectExpr("n", "tt", f"{BM25_AVGDL_SPARK} AS a")
    return dl, st


def bm25_topk(
    df: DataFrame,
    terms: tuple[str, ...],
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    contrib_sql: str = BM25_CONTRIB_SPARK,
) -> DataFrame:
    """Top-k documents for a term query under fixed-point BM25 (see
    module docstring). Corpus stats are a 1-row broadcast, per-term
    dfs a |terms|-row broadcast; tf is filtered to the query terms
    BEFORE the shuffle; top-k plans as TakeOrdered."""
    toks = df.select(
        F.col(id_col), tokens_expr(clean_text_expr(text_col)).alias("_toks")
    ).filter(F.size("_toks") > 0)
    toks = maybe_checkpoint(toks)
    dl, st = _corpus_stats(toks, id_col)
    tf = maybe_checkpoint(
        toks.select(F.col(id_col), F.explode("_toks").alias("term"))
        .filter(F.col("term").isin(*terms))
        .groupBy(id_col, "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    r = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(st))
    )
    return (
        r.selectExpr(id_col, f"{contrib_sql} AS contrib")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_hit_terms"),
            F.sum("contrib").cast("long").alias("score_x1e4"),
        )
        .orderBy(F.col("score_x1e4").desc(), id_col)
        .limit(k)
    )


def bm25_ln_topk(
    df: DataFrame,
    terms: tuple[str, ...],
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Textbook log-BM25 top-k (Lucene idf ln(1 + (N−df+½)/(df+½))),
    engine-exact via the sqrt-constructed ln (module docstring) — the
    variant whose multi-term rankings match a system a migrating user
    already runs. Identical plan shape to :func:`bm25_topk`; only the
    per-term contribution fragment differs (the ln chain is ~300 extra
    correctly-rounded scalar ops on the |terms|-candidate rows —
    corpus-size-independent work)."""
    return bm25_topk(df, terms, k, text_col, id_col, contrib_sql=BM25_LN_CONTRIB_SPARK)


def bm25_topk_batch(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_queries: bool = True,
) -> DataFrame:
    """BM25 top-k for a whole TABLE of queries at once — the at-scale
    form (a production retrieval job scores thousands of queries in
    one pass, not one ``isin`` literal each). ``queries`` is
    ``(query_id, term)``; returns ``(query_id, id, n_hit_terms,
    score_x1e4, rank)`` with ``rank <= k`` per query.

    Same fixed-point scoring as :func:`bm25_topk` (shared fragments).
    The query table is deduplicated then broadcast twice (distinct
    terms to prune the corpus explode map-side; full pairs to fan tf
    rows out per query); df is corpus document frequency per term,
    computed once regardless of how many queries share the term.
    Per-query top-k is a window partitioned BY QUERY — bounded by each
    query's candidate docs, never global.

    ``broadcast_queries=False`` is the very-large-query-batch mode:
    the term-keyed joins (terms semi-join, df, qterms fan-out) run as
    shuffled hash joins instead of broadcasts — when the query table
    outgrows executor memory, only the 1-row corpus-stats broadcast
    remains. Rankings are identical (pinned by
    ``tests/test_retrieval.py::test_batch_bm25_shuffled_queries_mode``)."""
    def _q(d: DataFrame) -> DataFrame:
        return F.broadcast(d) if broadcast_queries else d.hint("shuffle_hash")

    toks = df.select(
        F.col(id_col), tokens_expr(clean_text_expr(text_col)).alias("_toks")
    ).filter(F.size("_toks") > 0)
    toks = maybe_checkpoint(toks)
    dl, st = _corpus_stats(toks, id_col)
    # distinct: a duplicated (query_id, term) row must not double-count
    # the term's contribution (and single/batch forms must agree)
    qterms = maybe_checkpoint(queries.select("query_id", "term").distinct())
    terms = qterms.select("term").distinct()
    tf = maybe_checkpoint(
        toks.select(F.col(id_col), F.explode("_toks").alias("term"))
        .join(_q(terms), "term", "left_semi")
        .groupBy(id_col, "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    r = (
        tf.join(_q(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(st))
        .join(_q(qterms), "term")
    )
    from pyspark.sql import Window as W

    sc = (
        r.selectExpr("query_id", id_col, f"{BM25_CONTRIB_SPARK} AS contrib")
        .groupBy("query_id", id_col)
        .agg(
            F.count("*").cast("long").alias("n_hit_terms"),
            F.sum("contrib").cast("long").alias("score_x1e4"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("score_x1e4").desc(), id_col)
    return (
        sc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            id_col,
            "n_hit_terms",
            "score_x1e4",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def positional_postings(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Positional postings ``(id, pos, term)`` — the positional half
    of an inverted index (0-based positions over the cleaned token
    stream). One posexplode; at scale this is the table a phrase/
    proximity index persists term-sharded (sorted by (term, id, pos))
    so phrase queries touch only the probed terms' shards."""
    return positional_postings_from_tokens(
        df.select(
            F.col(id_col), tokens_expr(clean_text_expr(text_col)).alias("__toks")
        ),
        tokens_col="__toks",
        id_col=id_col,
    )


def positional_postings_from_tokens(
    df: DataFrame, tokens_col: str = "t", id_col: str = "doc_id"
) -> DataFrame:
    """``positional_postings`` over an already-tokenized column —
    lets a query that needs both a token table and a postings table
    materialize the tokenize ONCE (maybe_checkpoint) and derive both."""
    return df.select(
        F.col(id_col),
        F.posexplode(F.col(tokens_col)).alias("pos", "term"),
    ).filter(F.col("term") != "")


def phrase_match(
    postings: DataFrame, phrases: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Exact phrase search by positional-postings intersection.

    ``phrases``: a SMALL table ``(phrase: string)`` of space-separated
    query phrases. Each phrase is split into ``(off, term)`` pairs
    (phrase-length rows each) and BROADCAST against the postings: a
    posting at position ``pos`` matching the phrase term at offset
    ``off`` votes for a match starting at ``start = pos − off``; a
    start where ALL offsets voted is a full occurrence (correct even
    for phrases with repeated terms — a posting row joins once per
    offset its term occupies, each vote landing on a different start).

    Scale shape: the corpus-sized side is touched once (the postings
    scan, filtered by the broadcast semi-join on term — only postings
    of query terms survive the map side); candidate starts combine
    map-side in the ``(phrase, id, start)`` groupBy. No corpus
    self-join, no regex scan over full text. Returns per-(phrase, doc)
    occurrence counts.
    """
    pt = phrases.select(
        "phrase", F.posexplode(F.split("phrase", " ")).alias("off", "term")
    )
    plen = phrases.select(
        "phrase", F.size(F.split("phrase", " ")).alias("n_terms")
    )
    votes = postings.join(F.broadcast(pt), "term").select(
        "phrase", id_col, (F.col("pos") - F.col("off")).alias("start")
    )
    full = (
        votes.groupBy("phrase", id_col, "start")
        .agg(F.count("*").alias("n_votes"))
        .join(F.broadcast(plen), "phrase")
        .filter(F.col("n_votes") == F.col("n_terms"))
    )
    return full.groupBy("phrase", id_col).agg(
        F.count("*").cast("long").alias("n_matches")
    )
