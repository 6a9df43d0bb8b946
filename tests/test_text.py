"""Text cleaning / tokenization / stemming units — hand-computed
expectations mirroring the reference chain (P2-P8, M1-M3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ml_with_spark_streaming_spark.functions.porter import porter_stem
from ml_with_spark_streaming_spark.functions.text import (
    clean_text_expr,
    remove_stopwords_expr,
    stem_tokens_udf,
    tokens_expr,
)


def _one(spark, text):
    return spark.createDataFrame([(text,)], "t string").select(
        clean_text_expr("t").alias("c")
    ).head()["c"]


def test_clean_strips_mentions_urls_nonalpha(spark):
    assert _one(spark, "@user loving #spark3 at http://x.co/y!!") == "loving at"
    assert _one(spark, "Hello,   WORLD 123") == "hello world"
    assert _one(spark, "") == ""


def test_tokens_empty_guard(spark):
    rows = spark.createDataFrame([("",), ("a b",)], "t string").select(
        tokens_expr(clean_text_expr("t")).alias("toks")
    ).collect()
    assert rows[0]["toks"] == []
    assert rows[1]["toks"] == ["a", "b"]


def test_stopword_removal(spark):
    out = spark.createDataFrame([(["the", "cat", "and", "dog"],)], "toks array<string>").select(
        remove_stopwords_expr("toks").alias("f")
    ).head()["f"]
    assert out == ["cat", "dog"]


def test_porter_stem_basics():
    assert porter_stem("caresses") == "caress"
    assert porter_stem("ponies") == "poni"
    assert porter_stem("running") == "run"
    assert porter_stem("agreed") == "agre"
    assert porter_stem("cats") == "cat"


def test_stem_udf_matches_python(spark):
    toks = ["running", "flies", "happily"]
    out = spark.createDataFrame([(toks,)], "toks array<string>").select(
        stem_tokens_udf(F.col("toks")).alias("s")
    ).head()["s"]
    assert out == [porter_stem(t) for t in toks]
