"""Retrieval operators over a text corpus: inverted-index build and
BM25 scoring (Robertson/Sparck Jones).

The queries q116/q117 (plans/text_ml.py) delegate here; these functions
are the reusable API surface — pass any (id, text) DataFrame and, for
BM25, any term list. Scoring is EXACT integer rationals (see
``bm25_topk``): with k1 = 6/5 and b = 3/4 every contribution reduces to
one integer num/den pair, rounded HALF-UP at 4 decimals with integer
DIV (never double division — the magnitudes exceed the 2^53 exactness
bound) and summed as BIGINT, so rankings are bit-identical across
engines and partition layouts.

Documented deviation: the idf factor is the RAW Robertson ratio
(N − df + ½)/(df + ½) without the usual ln(·) wrap. ln is a monotone
transform per term, but summed over multiple terms the two forms are
NOT rank-equivalent — raw idf weights rare terms more aggressively
than log-BM25. The trade is deliberate: ln forces doubles (engines'
libm results and float summation order both leak into the ranking),
while the raw ratio keeps every score an exact integer rational. Swap
``(2N − 2df + 1)/(2df + 1)`` for a scaled ``ln`` table if log-BM25
parity with an existing system matters more than cross-engine
exactness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ml_with_spark_streaming_spark.functions.text import clean_text_expr, tokens_expr
from ml_with_spark_streaming_spark.lineage import maybe_checkpoint

DEFAULT_K1_NUM, DEFAULT_K1_DEN = 6, 5  # k1 = 1.2
DEFAULT_B_NUM, DEFAULT_B_DEN = 3, 4  # b = 0.75


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


def bm25_topk(
    df: DataFrame,
    terms: tuple[str, ...],
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents for a term query under BM25 (k1=1.2, b=0.75),
    scored as exact integer rationals:

        idf   = (2N - 2df + 1) / (2df + 1)
        satur = 22·T·tf / (10·T·tf + 3·T + 9·dl·N)     [avgdl = T/N]

    each contribution rounded HALF-UP at 4 decimals via integer DIV
    and summed as BIGINT (``score_x1e4``). Corpus stats are a 1-row
    broadcast, per-term dfs a |terms|-row broadcast; tf is filtered to
    the query terms BEFORE its shuffle; top-k plans as TakeOrdered."""
    toks = df.select(
        F.col(id_col), tokens_expr(clean_text_expr(text_col)).alias("_toks")
    ).filter(F.size("_toks") > 0)
    toks = maybe_checkpoint(toks)
    dl = maybe_checkpoint(
        toks.select(id_col, F.size("_toks").cast("long").alias("dl"))
    )
    st = dl.agg(
        F.count("*").cast("long").alias("n"), F.sum("dl").cast("long").alias("tt")
    )
    tf = maybe_checkpoint(
        toks.select(F.col(id_col), F.explode("_toks").alias("term"))
        .filter(F.col("term").isin(*terms))
        .groupBy(id_col, "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    c = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(st))
        .selectExpr(
            id_col,
            "(2*n - 2*df + 1) * 22 * tt * tf AS num",
            "(2*df + 1) * (10*tt*tf + 3*tt + 9*dl*n) AS den",
        )
    )
    return (
        c.selectExpr(id_col, "(num * 20000 + den) DIV (2 * den) AS contrib")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_hit_terms"),
            F.sum("contrib").cast("long").alias("score_x1e4"),
        )
        .orderBy(F.col("score_x1e4").desc(), id_col)
        .limit(k)
    )


def bm25_topk_batch(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 top-k for a whole TABLE of queries at once — the at-scale
    form (a production retrieval job scores thousands of queries in
    one pass, not one ``isin`` literal each). ``queries`` is
    ``(query_id, term)``; returns ``(query_id, id, n_hit_terms,
    score_x1e4, rank)`` with ``rank <= k`` per query.

    Same exact integer-rational scoring as :func:`bm25_topk`. The
    query table is broadcast twice (distinct terms to prune the corpus
    explode map-side; full pairs to fan tf rows out per query); df is
    corpus document frequency per term, computed once regardless of
    how many queries share the term. Per-query top-k is a window
    partitioned BY QUERY — bounded by each query's candidate docs,
    never global."""
    toks = df.select(
        F.col(id_col), tokens_expr(clean_text_expr(text_col)).alias("_toks")
    ).filter(F.size("_toks") > 0)
    toks = maybe_checkpoint(toks)
    dl = maybe_checkpoint(
        toks.select(id_col, F.size("_toks").cast("long").alias("dl"))
    )
    st = dl.agg(
        F.count("*").cast("long").alias("n"), F.sum("dl").cast("long").alias("tt")
    )
    qterms = maybe_checkpoint(queries.select("query_id", "term"))
    terms = qterms.select("term").distinct()
    tf = maybe_checkpoint(
        toks.select(F.col(id_col), F.explode("_toks").alias("term"))
        .join(F.broadcast(terms), "term", "left_semi")
        .groupBy(id_col, "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    c = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(st))
        .join(F.broadcast(qterms), "term")
        .selectExpr(
            "query_id",
            id_col,
            "(2*n - 2*df + 1) * 22 * tt * tf AS num",
            "(2*df + 1) * (10*tt*tf + 3*tt + 9*dl*n) AS den",
        )
    )
    from pyspark.sql import Window as W

    sc = (
        c.selectExpr("query_id", id_col, "(num * 20000 + den) DIV (2 * den) AS contrib")
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
        .select("query_id", id_col, "n_hit_terms", "score_x1e4", F.col("rank").cast("long").alias("rank"))
    )
