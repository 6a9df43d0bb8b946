"""ML-path queries through the driver contract (Entry points A/B/C).

Genuinely non-SQL-expressible (iterative training) → rows-only checks,
but every query is fully deterministic: hash-based 80:20 split instead
of randomSplit (partition-layout-independent), deterministic
text-derived label (see _label_expr), additive NB statistics,
deterministic KMeans seeding (lowest doc_ids).

Reference lifecycle being demonstrated (SURVEY.md §3):
* q70 — Entry point A one batch: featurize → split → train → eval;
* q71 — Entry point A replayed: 3 sequential batches, per-batch
  held-out metrics from the evolving model;
* q72 — Entry point B: MiniBatchKMeans, permutation-invariant
  agreement vs the language label;
* q73 — PA variant of q70;
* q74 — the MLlib Pipeline twin (Tokenizer→StopWordsRemover→
  HashingTF→NaiveBayes), reference M1-M6 as one pyspark.ml.Pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ml_with_spark_streaming_spark.functions.metrics import binary_metrics
from ml_with_spark_streaming_spark.functions.text import (
    clean_text_expr,
    remove_stopwords_expr,
    tokens_expr,
)
from ml_with_spark_streaming_spark.ml.incremental import (
    IncrementalBernoulliNB,
    IncrementalLinearClassifier,
    MiniBatchKMeans,
    hashed_features,
)
from ml_with_spark_streaming_spark.plans.registry import query
from ml_with_spark_streaming_spark.sources.batch import load_table


def _label_expr() -> F.Column:
    """Deterministic, learnable synthetic label: the synthetic corpus
    has no semantic labels (the reference's Sentiment140 polarity does
    not exist in testdata), so the label is 'long document'
    (n_chars >= 300, ~balanced) — a signal Bernoulli presence features
    genuinely carry (longer docs have higher presence rates for every
    vocabulary token), so a correct learner must separate the classes
    and the queries are self-validating. (A contains-token label was
    rejected: token presence correlates with length, which biases ALL
    Bernoulli features positive and degenerates to always-positive
    predictions — real NB behavior, but a useless demo.)"""
    return (F.col("n_chars") >= 300).cast("double")


def _labeled_feats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (row_id, target, fi, cnt)."""
    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        F.col("doc_id").alias("row_id"),
        _label_expr().alias("target"),
        remove_stopwords_expr(tokens_expr(clean_text_expr("text"))).alias("toks"),
    )
    return hashed_features(base, "toks", "row_id", extra_cols=("target",))


def _is_train(col: str = "row_id") -> F.Column:
    """Deterministic 80:20 split: partition-layout-independent,
    replaces the reference's seeded train_test_split (D3)."""
    return F.pmod(F.hash(col), F.lit(5)) != 0


def _metrics_df(spark: SparkSession, m, extra: dict | None = None) -> DataFrame:
    row = {
        **(extra or {}),
        "n": m.n,
        "tp": m.tp,
        "fp": m.fp,
        "tn": m.tn,
        "fn": m.fn,
        "acc": round(m.accuracy, 4),
        "precision": round(m.precision, 4),
        "recall": round(m.recall, 4),
        "f1": round(m.f1, 4),
    }
    schema_bits = []
    for k, v in row.items():
        schema_bits.append(f"{k} " + ("long" if isinstance(v, int) else "double"))
    return spark.createDataFrame([tuple(row.values())], ", ".join(schema_bits))


@query("q70_nb_train_eval", no_oracle_reason="iterative ML training isn't SQL-expressible")
def q70_nb_train_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = _labeled_feats(spark, sf_dir).persist()
    try:
        train = feats.filter(_is_train())
        test = feats.filter(~_is_train())
        nb = IncrementalBernoulliNB()
        nb.update(train)
        pred = nb.predict(test).join(test.select("row_id", "target").distinct(), "row_id")
        return _metrics_df(spark, binary_metrics(pred))
    finally:
        feats.unpersist()


@query("q71_nb_incremental_replay", no_oracle_reason="iterative ML training isn't SQL-expressible")
def q71_nb_incremental_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Online learning: 3 sequential doc_id-range batches; held-out
    metrics per batch from the model as of that batch."""
    feats = _labeled_feats(spark, sf_dir).persist()
    try:
        bounds = feats.agg(F.max("row_id")).collect()[0][0] or 0
        step = bounds // 3 + 1
        nb = IncrementalBernoulliNB()
        out = None
        for b in range(3):
            batch = feats.filter(
                (F.col("row_id") >= b * step) & (F.col("row_id") < (b + 1) * step)
            )
            train = batch.filter(_is_train())
            test = batch.filter(~_is_train())
            nb.update(train)
            pred = nb.predict(test).join(test.select("row_id", "target").distinct(), "row_id")
            m = _metrics_df(spark, binary_metrics(pred), extra={"batch_id": b})
            out = m if out is None else out.unionByName(m)
        return out.orderBy("batch_id")
    finally:
        feats.unpersist()


@query("q72_kmeans_agreement", no_oracle_reason="iterative ML training isn't SQL-expressible")
def q72_kmeans_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entry point B with the SURVEY §3 fix: permutation-invariant
    cluster-vs-label agreement instead of assuming cluster-id ≡ label."""
    feats = _labeled_feats(spark, sf_dir).persist()
    try:
        km = MiniBatchKMeans(k=2)
        km.update(feats)
        km.update(feats)
        pred = km.predict(feats).join(feats.select("row_id", "target").distinct(), "row_id")
        agg = pred.agg(
            F.count("*").alias("n"),
            F.count(F.when(F.col("prediction") == F.col("target"), 1)).alias("same"),
        ).collect()[0]
        direct = agg["same"] / agg["n"] if agg["n"] else 0.0
        sizes = {
            int(r["prediction"]): r["c"]
            for r in pred.groupBy("prediction").agg(F.count("*").alias("c")).collect()
        }
        return spark.createDataFrame(
            [
                (agg["n"], sizes.get(0, 0), sizes.get(1, 0), round(max(direct, 1 - direct), 4)),
            ],
            "n long, cluster0_size long, cluster1_size long, agreement double",
        )
    finally:
        feats.unpersist()


@query("q73_pa_train_eval", no_oracle_reason="iterative ML training isn't SQL-expressible")
def q73_pa_train_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = _labeled_feats(spark, sf_dir).persist()
    try:
        train = feats.filter(_is_train())
        test = feats.filter(~_is_train())
        pa = IncrementalLinearClassifier(variant="pa")
        for _ in range(6):
            pa.update(train)
        pred = pa.predict(test).join(test.select("row_id", "target").distinct(), "row_id")
        return _metrics_df(spark, binary_metrics(pred))
    finally:
        feats.unpersist()


@query("q74_mllib_nb_pipeline", no_oracle_reason="iterative ML training isn't SQL-expressible")
def q74_mllib_nb_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1-M6 as a genuine pyspark.ml.Pipeline + MLlib NaiveBayes —
    the distributed batch twin of the incremental path."""
    from ml_with_spark_streaming_spark.ml.batch import fit, prepare

    d = load_table(spark, sf_dir, "documents")
    target = _label_expr()
    train = d.filter(_is_train("doc_id"))
    test = prepare(d.filter(~_is_train("doc_id")), "text", target)
    model = fit(train, "text", target)
    pred = model.transform(test)
    return _metrics_df(spark, binary_metrics(pred, label_col="target", pred_col="prediction"))


@query("q88_sgd_train_eval", no_oracle_reason="iterative ML training isn't SQL-expressible")
def q88_sgd_train_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SGDC entry-point parity (reference SGDC/sgdc.py:154 —
    sklearn.SGDClassifier.partial_fit): hinge-loss SGD with per-shard
    sequential updates + parameter averaging, same harness as the PA
    twin q73."""
    feats = _labeled_feats(spark, sf_dir).persist()
    try:
        train = feats.filter(_is_train())
        test = feats.filter(~_is_train())
        sgd = IncrementalLinearClassifier(variant="sgd", lr=0.5)
        for _ in range(6):
            sgd.update(train)
        pred = sgd.predict(test).join(test.select("row_id", "target").distinct(), "row_id")
        return _metrics_df(spark, binary_metrics(pred))
    finally:
        feats.unpersist()
