"""Streaming IVF-index maintenance: the maintained assignment table
must equal one full assignment pass over (base ∪ all batches) against
the frozen centroids, and a save/resume mid-stream must not change the
outcome."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from ml_with_spark_streaming_spark.operators.ann_index import IVFIndex
from ml_with_spark_streaming_spark.operators.similarity import assign_to_centroids
from ml_with_spark_streaming_spark.streaming.ann_index_maintainer import (
    StreamingANNIndexMaintainer,
)

pytestmark = pytest.mark.slow  # multi-stream/artifact-fit module: full-suite only (SPARK_GRAFT_FULL_TESTS=1)

SCHEMA = "vec_id long, embedding array<float>"


@pytest.fixture(scope="module")
def base_and_batches(spark):
    rnd = random.Random(23)

    def vec():
        return [rnd.gauss(0, 1) for _ in range(16)]

    base = spark.createDataFrame([(i, vec()) for i in range(100)], SCHEMA)
    batches = [
        [(1000 + 10 * b + i, vec()) for i in range(5)] for b in range(4)
    ]
    return base, batches


def test_stream_maintained_equals_full_assign(spark, base_and_batches):
    base, batches = base_and_batches
    idx = IVFIndex.build(base, n_centroids=8, seed=42)
    m = StreamingANNIndexMaintainer(index=idx)
    for bid, rows in enumerate(batches):
        m.process_batch(spark.createDataFrame(rows, SCHEMA), bid)

    union = base
    for rows in batches:
        union = union.unionByName(spark.createDataFrame(rows, SCHEMA))
    want = {
        (r["vec_id"], r["cent_id"])
        for r in assign_to_centroids(union, idx.centroids).collect()
    }
    got = {(r["vec_id"], r["cent_id"]) for r in m.index.assignments.collect()}
    assert got == want
    assert m.index.n_vectors == 120
    assert [h["n_total"] for h in m.history] == [105, 110, 115, 120]
    assert all(h["max_bucket"] >= 1 for h in m.history)

    # empty batch: explicit zero row, index untouched
    m.process_batch(spark.createDataFrame([], SCHEMA), 99)
    assert m.history[-1] == {
        "batch_id": 99, "n_vecs": 0, "n_total": 120, "max_bucket": None,
        "refit": False,
    }

    # at-least-once replay of an applied batch: recorded no-op, the
    # index is NOT double-appended
    m.process_batch(spark.createDataFrame(batches[2], SCHEMA), 2)
    assert m.history[-1]["skipped"] is True
    assert m.index.n_vectors == 120
    assert {(r["vec_id"], r["cent_id"]) for r in m.index.assignments.collect()} == want


def test_pq_codes_maintained_alongside(spark, base_and_batches, tmp_path):
    """With a PQIndex attached, every accepted batch's vectors are
    encoded against the frozen codebooks: the maintained code table
    equals one full encode over (base ∪ all batches), and save/resume
    restores it with the IVF artifact."""
    from ml_with_spark_streaming_spark.operators.ann_index import PQIndex
    from ml_with_spark_streaming_spark.operators.pq import pq_encode

    base, batches = base_and_batches
    idx = IVFIndex.build(base, n_centroids=8, seed=42)
    pq = PQIndex.build(base, m=4, k_sub=8, seed=42)

    path = str(tmp_path / "ann_pq")
    a = StreamingANNIndexMaintainer(index=idx, pq=pq, save_path=path, save_every=1)
    for bid in (0, 1):
        a.process_batch(spark.createDataFrame(batches[bid], SCHEMA), bid)
    b = StreamingANNIndexMaintainer.from_index_path(spark, path)
    assert b.pq is not None
    for bid in (2, 3):
        b.process_batch(spark.createDataFrame(batches[bid], SCHEMA), bid)

    union = base
    for rows in batches:
        union = union.unionByName(spark.createDataFrame(rows, SCHEMA))
    want = {
        (r["vec_id"], tuple(r["codes"]))
        for r in pq_encode(union, pq.codebooks, m=4).collect()
    }
    got = {(r["vec_id"], tuple(r["codes"])) for r in b.pq.codes.collect()}
    assert got == want
    # codes cover exactly the indexed set
    assert {r["vec_id"] for r in b.pq.codes.collect()} == {
        r["vec_id"] for r in b.index.assignments.collect()
    }


def test_save_resume_equals_uninterrupted(spark, base_and_batches, tmp_path):
    base, batches = base_and_batches
    idx = IVFIndex.build(base, n_centroids=8, seed=42)

    ref = StreamingANNIndexMaintainer(index=idx)
    for bid, rows in enumerate(batches):
        ref.process_batch(spark.createDataFrame(rows, SCHEMA), bid)

    path = str(tmp_path / "ann_state")
    a = StreamingANNIndexMaintainer(
        index=idx, save_path=path, save_every=1
    )
    for bid in (0, 1):
        a.process_batch(spark.createDataFrame(batches[bid], SCHEMA), bid)
    b = StreamingANNIndexMaintainer.from_index_path(spark, path)
    for bid in (2, 3):
        b.process_batch(spark.createDataFrame(batches[bid], SCHEMA), bid)

    want = {(r["vec_id"], r["cent_id"]) for r in ref.index.assignments.collect()}
    got = {(r["vec_id"], r["cent_id"]) for r in b.index.assignments.collect()}
    assert got == want
    assert b.index.n_vectors == ref.index.n_vectors == 120
