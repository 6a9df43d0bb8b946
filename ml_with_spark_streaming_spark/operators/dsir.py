"""DSIR-style data selection — importance weighting between a target
(in-domain / trusted) text distribution and the raw corpus via HASHED
unigram bag-of-words models (Xie et al. 2023, "Data Selection for
Language Models via Importance Resampling").

Every token is hashed into one of ``n_buckets`` feature buckets; the
target and raw corpora each induce an add-one-smoothed categorical
distribution over buckets; a document's importance weight is

    log w(x) = sum_tokens [ ln p_target(b(tok)) - ln p_raw(b(tok)) ]

surfaced as ``logw_x1e6`` (total, micro-nats, BIGINT). Positive means
"looks more like the target than like the raw corpus" — the selection
gate keeps exactly those (threshold 0, so selected-by-total equals
selected-by-per-token-mean, and no signed integer division ever runs —
HALF-UP division on NEGATIVE numerators is where engine DIV semantics
diverge).

Engine-exact construction:

* bucket id: first 8 md5 hex chars parsed as BIGINT, mod n_buckets —
  Spark ``conv(.., 16, 10)`` and DuckDB ``'0x' || ..`` casts agree on
  all 2^32 inputs (``HASH_BUCKET_SPARK`` / ``HASH_BUCKET_DUCK``).
* each of the four ln terms (ln(c_t+1), ln(N_t+B), ln(c_s+1),
  ln(N_s+B)) has an argument >= 1 and is quantized HALF-UP at 1e-6 by
  the same correctly-rounded sqrt+atanh construction as log-BM25
  (``operators/retrieval.ln_x1e6_sql``) — bit-identical across
  engines and partition layouts, so the whole operator is
  DuckDB-oracled. Valid while counts stay <= e^25 ~ 7.2e10 (~70 B
  tokens per side); beyond that, extend the construction by one sqrt
  iteration per doubling of the ln range (same swap log-BM25
  documents).

Scale shape (the reason DSIR hashes at all): the model tables are
``n_buckets``-sized REGARDLESS of vocabulary — ``ct`` / ``cs`` are
B-row aggregates rolled up from the per-doc occurrence table, the
1-row totals broadcast, and the B-row weight table broadcast-joins
back onto the occurrences. The corpus-sized data crosses a shuffle
exactly twice: once keyed by (doc, bucket) to build occurrences
(map-side combinable), once keyed by doc for the final sum. At
production scale the weight table is a persisted artifact of the
trusted corpus, and scoring a candidate drop is one scan + one
broadcast join + one per-doc sum.

Reference scope: the reference repo (gopali24/ML_with_Spark_Streaming)
has no data-selection surface; this extends the curation family
(q104/q107 mixing, q112 quality) with the published importance-
resampling selection method.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ml_with_spark_streaming_spark.functions.text import clean_text_expr, tokens_expr
from ml_with_spark_streaming_spark.lineage import maybe_checkpoint
from ml_with_spark_streaming_spark.operators.retrieval import ln_x1e6_sql

# first-8-hex-chars of md5 as BIGINT (< 2^32), then mod n_buckets.
# {tok} is a SQL expression for the token string.
HASH_BUCKET_SPARK = "(CAST(conv(substr(md5({tok}), 1, 8), 16, 10) AS BIGINT) % {b})"
HASH_BUCKET_DUCK = "(CAST(('0x' || substr(md5({tok}), 1, 8)) AS BIGINT) % {b})"

# log importance weight of ONE bucket in micro-nats over columns
# ct (target count), cs (raw count), nt/ns (totals), b (n_buckets):
# ln((ct+1)/(nt+b)) - ln((cs+1)/(ns+b)), as four >=1-argument lns.
BUCKET_LOGW6_SQL = (
    f"({ln_x1e6_sql('(CAST(ct AS DOUBLE) + 1.0)')}"
    f" - {ln_x1e6_sql('(CAST(nt AS DOUBLE) + CAST(b AS DOUBLE))')}"
    f" - {ln_x1e6_sql('(CAST(cs AS DOUBLE) + 1.0)')}"
    f" + {ln_x1e6_sql('(CAST(ns AS DOUBLE) + CAST(b AS DOUBLE))')})"
)


def _bucket_occurrences(
    df: DataFrame, text_col: str, id_col: str, n_buckets: int, carry: list[str]
) -> DataFrame:
    """(id, *carry, bucket, n_occ): per-doc hashed-unigram bucket
    occurrence counts — the map-side-combinable form everything else
    rolls up from. One tokenize + explode pass."""
    toks = df.select(
        F.col(id_col), *[F.col(c) for c in carry],
        F.explode(tokens_expr(clean_text_expr(text_col))).alias("_tok"),
    ).filter(F.col("_tok") != "")
    bucket = F.expr(HASH_BUCKET_SPARK.format(tok="_tok", b=n_buckets))
    return (
        toks.withColumn("bucket", bucket)
        .groupBy(id_col, *carry, "bucket")
        .agg(F.count("*").cast("long").alias("n_occ"))
    )


def dsir_weight_table(
    occ: DataFrame, target_pred: Column, n_buckets: int
) -> DataFrame:
    """``(bucket, w6)`` DENSE over all ``n_buckets`` buckets (buckets
    unseen in the raw corpus get the add-one floor), so the table is a
    complete, apply-anywhere model artifact — a stream scoring a doc
    whose tokens hash into a training-unseen bucket still gets a
    defined weight. B-row work: two bucket-keyed aggregates over the
    occurrence table, one 1-row totals broadcast, four quantized lns
    per row."""
    spark = occ.sparkSession
    cs = occ.groupBy("bucket").agg(F.sum("n_occ").cast("long").alias("cs"))
    ct = (
        occ.filter(target_pred)
        .groupBy("bucket")
        .agg(F.sum("n_occ").cast("long").alias("ct"))
    )
    totals = occ.agg(
        F.sum("n_occ").cast("long").alias("ns"),
        F.sum(F.when(target_pred, F.col("n_occ")).otherwise(F.lit(0)))
        .cast("long")
        .alias("nt"),
    )
    dense = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    return (
        dense.join(cs, "bucket", "left")
        .join(ct, "bucket", "left")
        .withColumn("cs", F.coalesce("cs", F.lit(0)))
        .withColumn("ct", F.coalesce("ct", F.lit(0)))
        .crossJoin(F.broadcast(totals))
        .withColumn("b", F.lit(n_buckets).cast("long"))
        .selectExpr("bucket", f"{BUCKET_LOGW6_SQL} AS w6")
    )


def dsir_score_against(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 512,
    occ: DataFrame | None = None,
) -> DataFrame:
    """Score ``df`` against a PREBUILT dense weight table (the
    production apply form: weights trained once on the trusted corpus
    — or loaded from a persisted artifact — then applied to every
    candidate document or ingest drop). Returns ``(id_col, n_tokens,
    logw_x1e6, selected)`` over the full spine; the batch query and
    the streaming gate both call this, so verdicts agree wherever the
    model is the same. Pass ``occ`` to reuse an already-materialized
    occurrence table (q135's self-scoring form — one tokenize pass)."""
    if occ is None:
        occ = _bucket_occurrences(df, text_col, id_col, n_buckets, carry=[])
    per_doc = (
        occ.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("n_occ").cast("long").alias("n_tokens"),
            F.sum(F.col("n_occ") * F.col("w6")).cast("long").alias("logw_x1e6"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("logw_x1e6", F.lit(0)).cast("long").alias("logw_x1e6"),
            (F.coalesce("logw_x1e6", F.lit(0)) > 0).cast("long").alias("selected"),
        )
        .orderBy(id_col)
    )


def dsir_scores(
    df: DataFrame,
    target_pred: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 512,
    carry: list[str] | None = None,
) -> DataFrame:
    """Per-document DSIR score table ``(id_col, n_tokens, logw_x1e6,
    selected)`` over the FULL document spine (token-less docs surface
    with zeros and selected=0). ``target_pred`` is evaluated against
    the carried columns (default ``["lang"]``) on the occurrence
    table, so the target slice needs no second corpus scan."""
    carry = ["lang"] if carry is None else carry
    occ = maybe_checkpoint(
        _bucket_occurrences(df, text_col, id_col, n_buckets, carry)
    )
    weights = dsir_weight_table(occ, target_pred, n_buckets)
    return dsir_score_against(
        df, weights, text_col=text_col, id_col=id_col, n_buckets=n_buckets, occ=occ
    )
