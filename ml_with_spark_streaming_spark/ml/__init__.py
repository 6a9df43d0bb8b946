"""Incremental (online) ML on Spark DataFrames.

The reference hands each micro-batch to driver-side sklearn
``partial_fit`` (PAC/passiveAgressiveModel.py:93, SGDC/sgdc.py:89,
BNB/latest_Bnb.py:94, KMEANS CLUSTERING/kmeans.py:92). Here the same
online-learning semantics run distributed: every per-batch pass is a
DataFrame aggregation; only O(num_features) sufficient statistics /
weights ever reach the driver.
"""

from ml_with_spark_streaming_spark.ml.incremental import (
    IncrementalBernoulliNB,
    IncrementalLinearClassifier,
    MiniBatchKMeans,
    hashed_features,
)
from ml_with_spark_streaming_spark.ml.registry import ModelRegistry

__all__ = [
    "IncrementalBernoulliNB",
    "IncrementalLinearClassifier",
    "MiniBatchKMeans",
    "hashed_features",
    "ModelRegistry",
]
