"""Benchmark-set decontamination: n-gram overlap against an eval set.

The standard pretraining-corpus hygiene stage (the GPT-3 paper's
appendix C describes the 13-gram variant): any training document
sharing an n-gram with a held-out benchmark/eval document is flagged
(and usually dropped) so downstream eval numbers aren't inflated by
memorized test data.

Scale shape — the ONLY sane one at 100 TB:

* the eval side is benchmark-sized (thousands of documents, millions
  of n-grams at most) → computed once, deduplicated, and BROADCAST;
* the corpus side streams through one explode + one broadcast
  semi-join + one per-doc aggregation (map-side combinable, keyed by
  doc_id) — the corpus is never shuffled by n-gram, never joined to
  itself, and never collected.

Built from the same primitives as the dedup family: ``clean_text_expr``
→ ``tokens_expr`` → ``shingles_expr`` (word n-grams, JVM-side).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ml_with_spark_streaming_spark.functions.text import clean_text_expr, tokens_expr
from ml_with_spark_streaming_spark.operators.dedup import shingles_expr

DEFAULT_NGRAM = 13  # GPT-3 appendix-C decontamination width


def _gram_key(gram: Column) -> Column:
    """A 13-gram is ~90 chars; its comparison key for the distinct /
    join shuffles is the 16-hex-char md5 prefix — ~5x narrower
    exchanges at identical join semantics (64-bit collision odds are
    negligible, and both engines compute the same md5 so the oracle
    replays it exactly; fixed-width hex needs no numeric conversion)."""
    return F.substring(F.md5(F.encode(gram, "UTF-8")), 1, 16)


def _doc_ngrams(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """Distinct (id, n-gram-key) pairs per document; docs shorter than
    n tokens contribute nothing (and are 'clean' by definition).

    Tokenization is materialized behind a repartition barrier BEFORE
    the shingle explode — minhash_signatures' fix for the
    CollapseProject-into-Generate trap, where the 4-regex cleaning
    chain is otherwise inlined into the shingle lambda and re-evaluated
    once per n-gram (measured here: 17 s → 2.5 s at sf0.1)."""
    toks = df.select(F.col(id_col), tokens_expr(clean_text_expr(text_col)).alias("_toks"))
    toks = toks.repartition(id_col)
    return (
        toks.select(F.col(id_col), F.explode(shingles_expr(F.col("_toks"), n)).alias("_g"))
        .select(F.col(id_col), _gram_key(F.col("_g")).alias("gram"))
        .distinct()
    )


def eval_ngrams(eval_df: DataFrame, text_col: str = "text", n: int = DEFAULT_NGRAM) -> DataFrame:
    """The deduplicated n-gram KEY set of the eval/benchmark corpus —
    the small side; callers broadcast it. Same explode barrier as
    ``_doc_ngrams`` (per-element re-evaluation hits any shingle
    fan-out), same md5-prefix key."""
    toks = eval_df.select(tokens_expr(clean_text_expr(text_col)).alias("_toks"))
    toks = toks.repartition(8)  # benchmark-sized side: barrier cost is trivial
    return (
        toks.select(F.explode(shingles_expr(F.col("_toks"), n)).alias("_g"))
        .select(_gram_key(F.col("_g")).alias("gram"))
        .distinct()
    )


def contamination_counts(
    corpus: DataFrame,
    eval_gram_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = DEFAULT_NGRAM,
) -> DataFrame:
    """Per-document contamination profile against ``eval_gram_df``
    (one ``gram`` column, assumed small).

    Returns ``(id_col, n_grams, n_contaminated, keep)`` for every
    corpus row: distinct n-grams in the doc, how many of those appear
    in the eval set (via broadcast semi-join), and ``keep`` = 1 iff
    zero overlap (the GPT-3 policy; callers wanting a laxer threshold
    filter on ``n_contaminated`` themselves).
    """
    grams = _doc_ngrams(corpus, text_col, id_col, n)
    # ONE pass over the explode: broadcast LEFT join marks eval hits,
    # then a single per-doc aggregation counts grams and hits together
    # (a semi-join + second groupBy formulation re-derives the explode)
    marked = grams.join(
        F.broadcast(eval_gram_df.select("gram").withColumn("_hit", F.lit(1))),
        "gram",
        "left",
    )
    per_doc = marked.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_grams"),
        F.sum(F.coalesce("_hit", F.lit(0))).cast("long").alias("n_contaminated"),
    )
    return (
        corpus.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_contaminated", F.lit(0)).cast("long").alias("n_contaminated"),
            (F.coalesce("n_contaminated", F.lit(0)) == 0).cast("int").alias("keep"),
        )
    )
