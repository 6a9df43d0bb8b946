"""Bigram language-model scoring — perplexity-style quality filtering
(the CCNet discipline, Wenzek et al. 2019: score every document under
a reference LM and gate/ bucket on per-token negative log-likelihood).

The model is an add-one-smoothed bigram LM:

    P(w2 | w1) = (c(w1 w2) + 1) / (c(w1) + V)

with c(·) corpus counts and V the distinct-vocabulary size. A
document's score is the sum of −ln P over its adjacent token pairs,
surfaced as ``nll_x1e6`` (total, micro-nats) and ``mean_nll_x1e6``
(per-bigram mean) — both BIGINT.

Engine-exact ln: −ln P = ln((c1 + V)/(c12 + 1)), whose argument is
always ≥ 1 (c12 ≤ c1 and V ≥ 1), computed with the same
correctly-rounded sqrt+atanh construction as log-BM25
(``operators/retrieval.ln_x1e6_sql``) and quantized HALF-UP at 1e-6 —
so scores are bit-identical across engines and partition layouts and
the whole operator is DuckDB-oracled, unlike a libm ``ln()``.
int64 bounds: per-bigram nll6 ≤ ln(c1_max + V)·1e6 ≤ 33e6 even at
1e14 corpus tokens; a 1e6-token document sums to ≤ 3.3e13.

Scale shape (all counts are one map-side-combinable aggregate each):
tokenize once (checkpointed); unigram counts and V are vocab-sized;
bigram counts are bigram-vocab-sized (Zipf-bounded, NOT corpus-sized).
Scoring aggregates each doc's bigram OCCURRENCES to per-doc DISTINCT
bigram counts first (map-side combine), joins the bigram-vocab score
table once, and weight-sums per doc — the corpus-sized table crosses
the shuffle exactly twice (bigram-key join, doc-key sum).

At production scale the count tables are a REFERENCE-corpus artifact
(train once on trusted text, score every candidate drop); here the
corpus scores itself, which is the same plan with the count lineage
swapped for a parquet read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ml_with_spark_streaming_spark.functions.text import clean_text_expr, tokens_expr
from ml_with_spark_streaming_spark.lineage import maybe_checkpoint
from ml_with_spark_streaming_spark.operators.retrieval import ln_x1e6_sql

# −ln P(w2|w1) in micro-nats over columns c1 (unigram count), c12
# (bigram count), v (vocab size): ln((c1+v)/(c12+1)), argument >= 1.
BIGRAM_NLL6_SQL = ln_x1e6_sql(
    "((CAST(c1 AS DOUBLE) + CAST(v AS DOUBLE)) / (CAST(c12 AS DOUBLE) + 1.0))"
)

# HALF-UP(total/n) for the per-bigram mean, both BIGINT
MEAN_NLL_SQL = "(nll_x1e6 * 2 + n_bigrams) {div} (2 * n_bigrams)"


def _bigram_occurrences(toks: DataFrame, id_col: str) -> DataFrame:
    """(id, w1, w2, n_occ): per-doc distinct adjacent pairs with
    occurrence counts — the map-side-combinable form scoring joins."""
    pairs = toks.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("_toks") - 1),
                lambda i: F.struct(
                    F.element_at("_toks", i).alias("w1"),
                    F.element_at("_toks", i + 1).alias("w2"),
                ),
            )
        ).alias("_p"),
    ).select(F.col(id_col), F.col("_p.w1"), F.col("_p.w2"))
    return pairs.groupBy(id_col, "w1", "w2").agg(
        F.count("*").cast("long").alias("n_occ")
    )


def bigram_lm_counts(toks: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(unigrams, bigrams, vocab): the LM's count artifacts over a
    tokenized corpus — ``(w1, c1)``, ``(w1, w2, c12)``, and the 1-row
    ``(v)`` vocabulary size. Each is ONE aggregate; at scale these are
    persisted reference-corpus tables."""
    uni = (
        toks.select(F.explode("_toks").alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").cast("long").alias("c1"))
    )
    uni = maybe_checkpoint(uni)
    big = (
        toks.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("_toks") - 1),
                    lambda i: F.struct(
                        F.element_at("_toks", i).alias("w1"),
                        F.element_at("_toks", i + 1).alias("w2"),
                    ),
                )
            ).alias("_p")
        )
        .select(F.col("_p.w1"), F.col("_p.w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("c12"))
    )
    vocab = uni.agg(F.count("*").cast("long").alias("v"))
    return uni, big, vocab


def bigram_nll_table(
    uni: DataFrame, big: DataFrame, vocab: DataFrame
) -> DataFrame:
    """``(w1, w2, nll6)``: every KNOWN bigram scored once —
    bigram-vocab-sized work, the reusable scoring artifact."""
    return (
        big.join(uni, "w1")
        .crossJoin(F.broadcast(vocab))
        .selectExpr("w1", "w2", f"{BIGRAM_NLL6_SQL} AS nll6")
    )


def score_against_lm(
    df: DataFrame,
    uni: DataFrame,
    big: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score ``df`` under a PREBUILT bigram LM (the reference-corpus
    form: counts trained once on trusted text — or loaded from a
    persisted artifact — then applied to every candidate document or
    ingest drop). Returns ``(id_col, n_bigrams, nll_x1e6,
    mean_nll_x1e6)`` over the FULL document spine (zeros for docs with
    < 2 tokens).

    Unseen events back off pessimistically and exactly: a bigram whose
    LEFT unigram is known scores ln((c1+V)/1) (c12 = 0 — add-one mass
    only); a bigram with an unknown left word scores ln(V) (c1 = 0,
    c12 = 0) — the uniform-over-vocab floor. Both arise from the same
    shared fragment with COALESCEd zero counts, so batch and stream
    score identically wherever the model is the same."""
    toks = maybe_checkpoint(
        df.select(
            F.col(id_col), tokens_expr(clean_text_expr(text_col)).alias("_toks")
        ).filter(F.size("_toks") >= 2)
    )
    occ = _bigram_occurrences(toks, id_col)
    r = (
        occ.join(big, ["w1", "w2"], "left")
        .join(uni, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .withColumn("c12", F.coalesce("c12", F.lit(0)))
        .withColumn("c1", F.coalesce("c1", F.lit(0)))
    )
    per_doc = (
        r.selectExpr(id_col, "n_occ", f"{BIGRAM_NLL6_SQL} AS nll6")
        .groupBy(id_col)
        .agg(
            F.sum("n_occ").cast("long").alias("n_bigrams"),
            F.sum(F.col("n_occ") * F.col("nll6")).cast("long").alias("nll_x1e6"),
        )
        .selectExpr(
            id_col,
            "n_bigrams",
            "nll_x1e6",
            f"CAST({MEAN_NLL_SQL.format(div='DIV')} AS LONG) AS mean_nll_x1e6",
        )
    )
    return (
        df.select(F.col(id_col))
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("nll_x1e6", F.lit(0)).cast("long").alias("nll_x1e6"),
            F.coalesce("mean_nll_x1e6", F.lit(0)).cast("long").alias("mean_nll_x1e6"),
        )
        .orderBy(id_col)
    )


def bigram_lm_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document LM score table ``(id_col, n_bigrams, nll_x1e6,
    mean_nll_x1e6)`` — total and per-bigram-mean negative log-
    likelihood in micro-nats, BIGINT, ordered by id. Documents with
    fewer than 2 tokens surface with zeros (full-spine convention).
    Self-scoring form: the count tables are built from ``df`` itself
    (q131's oracled shape — every scored bigram is then known, so the
    no-backoff inner join and :func:`score_against_lm`'s COALESCE form
    agree, pinned by test)."""
    toks = maybe_checkpoint(
        df.select(
            F.col(id_col), tokens_expr(clean_text_expr(text_col)).alias("_toks")
        ).filter(F.size("_toks") >= 2)
    )
    # ONE corpus-sized bigram explode: the per-doc occurrence table is
    # computed first (map-side combinable) and the global bigram counts
    # ROLL UP from it (c12 = Σ n_occ — a bigram-vocab-sized second
    # aggregate), instead of a second explode pass over the corpus
    occ = maybe_checkpoint(_bigram_occurrences(toks, id_col))
    uni = maybe_checkpoint(
        toks.select(F.explode("_toks").alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").cast("long").alias("c1"))
    )
    big = occ.groupBy("w1", "w2").agg(F.sum("n_occ").cast("long").alias("c12"))
    vocab = uni.agg(F.count("*").cast("long").alias("v"))
    # score each DISTINCT bigram once (bigram-vocab-sized work), then
    # weight by per-doc occurrence counts
    scored = bigram_nll_table(uni, big, vocab)
    per_doc = (
        occ.join(scored, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.sum("n_occ").cast("long").alias("n_bigrams"),
            F.sum(F.col("n_occ") * F.col("nll6")).cast("long").alias("nll_x1e6"),
        )
        .selectExpr(
            id_col,
            "n_bigrams",
            "nll_x1e6",
            f"CAST({MEAN_NLL_SQL.format(div='DIV')} AS LONG) AS mean_nll_x1e6",
        )
    )
    return (
        df.select(F.col(id_col))
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("nll_x1e6", F.lit(0)).cast("long").alias("nll_x1e6"),
            F.coalesce("mean_nll_x1e6", F.lit(0)).cast("long").alias("mean_nll_x1e6"),
        )
        .orderBy(id_col)
    )
