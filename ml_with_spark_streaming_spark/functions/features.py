"""Featurization pipeline builders — reference parity, Spark-native.

Reference chain (PAC/passiveAgressiveModel.py:56-77):
  Tokenizer → StopWordsRemover → stemmer UDF → HashingTF(2500) →
  StringIndexer('Label'→'target')

Deviations (deliberate, per SURVEY.md §7):
* the label map is an explicit, deterministic ``when()`` ('4'→1.0,
  '0'→0.0) instead of per-batch frequency-ordered StringIndexer
  (reference M5 is nondeterministic across batches — a bug, not a
  behavior to keep);
* stemming is an Arrow pandas UDF (engine's Porter), not row-at-a-time
  nltk.
"""

from __future__ import annotations

from pyspark.ml.feature import HashingTF, StopWordsRemover, Tokenizer
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ml_with_spark_streaming_spark.functions.text import clean_text_expr, stem_tokens_udf

NUM_FEATURES = 2500  # reference: HashingTF(numFeatures=2500), PAC/passiveAgressiveModel.py:69


def label_expr(col: Column | str = "label") -> Column:
    """Deterministic '4'→1.0 / '0'→0.0 label map (replaces StringIndexer)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c == "4", 1.0).when(c == "0", 0.0).otherwise(F.lit(None).cast("double"))


def featurize(
    df: DataFrame,
    text_col: str = "tweet",
    label_col: str = "label",
    stem: bool = True,
    num_features: int = NUM_FEATURES,
) -> DataFrame:
    """Full reference featurization: clean → tokenize → stopwords →
    (stem) → HashingTF → target.

    Returns df + columns: tweet_clean, words_token, filtered,
    [word_stemmed,] tf (SparseVector), target (double).
    KMeans / TESTING paths skip stemming (reference:
    KMEANS CLUSTERING/kmeans.py:69, TESTING .py:60) — ``stem=False``.
    """
    out = df.withColumn("tweet_clean", clean_text_expr(text_col)).filter(F.col(text_col).isNotNull())
    tokenizer = Tokenizer(inputCol="tweet_clean", outputCol="words_token")
    out = tokenizer.transform(out)
    remover = StopWordsRemover(inputCol="words_token", outputCol="filtered")
    out = remover.transform(out)
    tf_input = "filtered"
    if stem:
        out = out.withColumn("word_stemmed", stem_tokens_udf(F.col("filtered")))
        tf_input = "word_stemmed"
    hashing_tf = HashingTF(numFeatures=num_features, inputCol=tf_input, outputCol="tf")
    out = hashing_tf.transform(out)
    if label_col in df.columns:
        out = out.withColumn("target", label_expr(label_col))
    return out
