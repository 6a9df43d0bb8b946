"""Deterministic sampling: layout independence, fraction accuracy,
stratified thresholds."""

from __future__ import annotations

from pyspark.sql import functions as F

from ml_with_spark_streaming_spark.operators.sampling import (
    fraction_threshold,
    hash_sample,
    stratified_hash_sample,
)


def test_hash_sample_is_layout_independent(spark):
    df1 = spark.range(0, 10_000).repartition(1)
    df32 = spark.range(0, 10_000).repartition(32)
    s1 = {r["id"] for r in hash_sample(df1, "id", 0.2).collect()}
    s32 = {r["id"] for r in hash_sample(df32, "id", 0.2).collect()}
    assert s1 == s32  # df.sample() fails this; content hashing can't
    # ~20% within binomial noise (4 sigma ≈ 160 on n=10k, p=0.2)
    assert abs(len(s1) - 2000) < 200


def test_hash_sample_salt_draws_independent_samples(spark):
    df = spark.range(0, 10_000)
    a = {r["id"] for r in hash_sample(df, "id", 0.2, salt="a").collect()}
    b = {r["id"] for r in hash_sample(df, "id", 0.2, salt="b").collect()}
    assert a != b
    # independence: |a ∩ b| ≈ 0.04 · n = 400 (±4 sigma ≈ 80)
    assert abs(len(a & b) - 400) < 100


def test_stratified_sample_respects_per_stratum_fractions(spark):
    df = spark.range(0, 20_000).withColumn(
        "cls", F.when(F.col("id") % 2 == 0, "keep_half").otherwise("drop")
    )
    out = stratified_hash_sample(df, "id", "cls", {"keep_half": 0.5}).groupBy("cls").count()
    counts = {r["cls"]: r["count"] for r in out.collect()}
    assert "drop" not in counts  # unlisted stratum fully dropped
    assert abs(counts["keep_half"] - 5000) < 300


def test_fraction_threshold_edges():
    assert fraction_threshold(0.0) == "00000000"
    # "g" sorts above every hex string → fraction 1.0 keeps ALL rows
    # (a 'ffffffff' threshold with strict < would drop keys hashing there)
    assert fraction_threshold(1.0) == "g"
    assert fraction_threshold(0.5) == "80000000"
    assert "ffffffff" < fraction_threshold(1.0)


def test_full_fraction_keeps_every_row(spark):
    df = spark.range(0, 5000)
    assert hash_sample(df, "id", 1.0).count() == 5000


def test_training_order_is_deterministic_permutation(spark):
    from ml_with_spark_streaming_spark.operators.sampling import training_order

    df = spark.range(500).withColumnRenamed("id", "doc_id")
    a = training_order(df, n_shards=8).collect()
    b = training_order(df.repartition(7), n_shards=8).collect()
    # pure function of (key, salt): layout-independent
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # a real permutation: every (shard, pos) unique, positions contiguous from 1
    by_shard = {}
    for r in a:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert sum(len(v) for v in by_shard.values()) == 500
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # uniform-ish shard sizes (md5 on 8 shards, 500 keys)
    sizes = [len(v) for v in by_shard.values()]
    assert len(by_shard) == 8 and min(sizes) > 30
    # a different salt draws a different permutation
    c = training_order(df, n_shards=8, salt="epoch2").collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))
