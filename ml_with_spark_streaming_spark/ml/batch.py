"""MLlib batch pipeline twin (SURVEY.md §7 step 2).

The reference's per-batch Pipeline (M1-M6: Tokenizer → StopWordsRemover
→ [stem] → HashingTF(2500) → label index → model) as a real
``pyspark.ml.Pipeline`` with MLlib NaiveBayes(modelType='bernoulli') —
the distributed, savable equivalent of the sklearn BernoulliNB path
(BNB/latest_Bnb.py:164). Used for one-shot batch training; the online
path is ml/incremental.py.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.feature import HashingTF, StopWordsRemover, Tokenizer
from pyspark.ml.classification import NaiveBayes
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ml_with_spark_streaming_spark.functions.text import clean_text_expr

NUM_FEATURES = 2500


def build_pipeline(num_features: int = NUM_FEATURES, smoothing: float = 1.0) -> Pipeline:
    return Pipeline(
        stages=[
            Tokenizer(inputCol="clean_text", outputCol="words_token"),
            StopWordsRemover(inputCol="words_token", outputCol="filtered"),
            HashingTF(numFeatures=num_features, inputCol="filtered", outputCol="features", binary=True),
            NaiveBayes(modelType="bernoulli", smoothing=smoothing, labelCol="target", featuresCol="features"),
        ]
    )


def prepare(df: DataFrame, text_col: str = "text", target: F.Column | None = None) -> DataFrame:
    out = df.withColumn("clean_text", clean_text_expr(text_col))
    if target is not None:
        out = out.withColumn("target", target.cast("double"))
    return out


def fit(df: DataFrame, text_col: str = "text", target: F.Column | None = None) -> PipelineModel:
    return build_pipeline().fit(prepare(df, text_col, target))
