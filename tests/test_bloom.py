"""Bloom filter operator (operators/bloom.py)."""

from pyspark.sql import functions as F

from ml_with_spark_streaming_spark.operators.bloom import (
    bloom_build,
    bloom_probe,
    derive_bloom_knobs,
)


def test_bloom_no_false_negatives_and_knobs(spark):
    members = spark.createDataFrame([(i,) for i in range(0, 200, 2)], ["k"])
    knob, bitmap = bloom_build(members, "k", bits_per_key=8, n_hashes=5)
    m = knob.collect()[0]["m"]
    # in-plan derivation == the Python twin
    assert m == derive_bloom_knobs(100, bits_per_key=8)[0]
    probe = spark.createDataFrame([(i,) for i in range(200)], ["k"])
    got = {r["k"]: r["bloom_positive"] for r in
           bloom_probe(probe, "k", knob, bitmap, n_hashes=5).collect()}
    # a Bloom filter NEVER misses a member
    assert all(got[i] == 1 for i in range(0, 200, 2))
    # with 8 bits/key the fp rate is ~2%; 100 non-members should not
    # all light up (regression guard on the probe's all-bits-must-hit)
    fp = sum(got[i] for i in range(1, 200, 2))
    assert fp < 30


def test_bloom_probe_preserves_input_multiplicity(spark):
    # duplicate probe rows must come back duplicated — the probe is a
    # row-wise filter flag, not a dedup (ADVICE r5: the old groupBy
    # over the full column set silently collapsed identical rows)
    members = spark.createDataFrame([(1,), (2,)], ["k"])
    knob, bitmap = bloom_build(members, "k", bits_per_key=8, n_hashes=5)
    probe = spark.createDataFrame([(1, "a"), (1, "a"), (1, "b"), (9, "c")], ["k", "tag"])
    rows = bloom_probe(probe, "k", knob, bitmap, n_hashes=5).collect()
    assert len(rows) == 4
    assert sorted((r["k"], r["tag"]) for r in rows) == [
        (1, "a"), (1, "a"), (1, "b"), (9, "c")]
    assert all(r["bloom_positive"] == 1 for r in rows if r["k"] == 1)


def test_bloom_saturated_filter_degrades_to_all_positive(spark):
    # 1 bit/key: the filter saturates and passes (almost) everything —
    # correctness (no false negatives) must still hold
    members = spark.createDataFrame([(i,) for i in range(64)], ["k"])
    knob, bitmap = bloom_build(members, "k", bits_per_key=1, n_hashes=5)
    got = bloom_probe(members, "k", knob, bitmap, n_hashes=5)
    assert got.agg(F.min("bloom_positive")).collect()[0][0] == 1
