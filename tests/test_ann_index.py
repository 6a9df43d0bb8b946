"""IVFIndex artifact: round-trip, knob-conflict refusal,
probe-equals-fresh-fit, semdedup-from-assignments equality, and the
derived-k cluster-size bound."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from ml_with_spark_streaming_spark.operators.ann_index import IVFIndex, ivf_index_for
from ml_with_spark_streaming_spark.operators.similarity import (
    derive_semdedup_knobs,
    ivf_topk,
    kmeans_centroids,
    semdedup,
)


@pytest.fixture(scope="module")
def vectors(spark):
    rnd = random.Random(11)
    rows = [(i, [rnd.gauss(0, 1) for _ in range(16)]) for i in range(300)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _queries(vectors):
    return vectors.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )


def test_roundtrip_preserves_fit(spark, vectors, tmp_path):
    idx = IVFIndex.build(vectors, n_centroids=8, seed=42)
    idx.save(str(tmp_path / "ivf"))
    loaded = IVFIndex.load(spark, str(tmp_path / "ivf"))
    assert loaded.n_centroids == 8
    assert loaded.seed == 42
    assert loaded.c_id == "vec_id" and loaded.c_vec == "embedding"
    assert loaded.n_vectors == 300
    want_c = {(r["cent_id"], tuple(r["cent_vec"])) for r in idx.centroids.collect()}
    got_c = {(r["cent_id"], tuple(r["cent_vec"])) for r in loaded.centroids.collect()}
    assert got_c == want_c
    want_a = {(r["vec_id"], r["cent_id"]) for r in idx.assignments.collect()}
    got_a = {(r["vec_id"], r["cent_id"]) for r in loaded.assignments.collect()}
    assert got_a == want_a
    assert len(got_a) == 300  # every vector assigned exactly once


def test_load_refuses_conflicting_knobs(spark, vectors, tmp_path):
    IVFIndex.build(vectors, n_centroids=8, seed=42).save(str(tmp_path / "ivf"))
    with pytest.raises(ValueError, match="n_centroids=8"):
        IVFIndex.load(spark, str(tmp_path / "ivf"), n_centroids=16)
    with pytest.raises(ValueError, match="seed=42"):
        IVFIndex.load(spark, str(tmp_path / "ivf"), seed=7)
    # matching (or None) overrides are fine
    IVFIndex.load(spark, str(tmp_path / "ivf"), n_centroids=8, seed=42)


def test_probe_from_artifact_equals_fresh_fit(spark, vectors, tmp_path):
    """ivf_topk over the persisted (centroids, assignments) must return
    exactly what the in-query fit+assign path returns — the artifact is
    a cache of the fit, never a different answer."""
    idx = IVFIndex.build(vectors, n_centroids=8, seed=42)
    idx.save(str(tmp_path / "ivf"))
    loaded = IVFIndex.load(spark, str(tmp_path / "ivf"))
    fresh_cents = kmeans_centroids(vectors, n_centroids=8, seed=42)
    fresh = {
        (r["q_id"], r["rank"]): (r["vec_id"], r["cosine"])
        for r in ivf_topk(
            _queries(vectors), vectors, k=10, nprobe=4, centroids=fresh_cents
        ).collect()
    }
    from_artifact = {
        (r["q_id"], r["rank"]): (r["vec_id"], r["cosine"])
        for r in ivf_topk(
            _queries(vectors),
            vectors,
            k=10,
            nprobe=4,
            centroids=loaded.centroids,
            assignments=loaded.assignments,
        ).collect()
    }
    assert from_artifact == fresh
    assert len(fresh) > 0


def test_semdedup_from_assignments_equals_fresh(spark, vectors, tmp_path):
    idx = IVFIndex.build(vectors, n_centroids=8, seed=42)
    idx.save(str(tmp_path / "ivf"))
    loaded = IVFIndex.load(spark, str(tmp_path / "ivf"))
    fresh = {
        (r["vec_id"], r["cluster"], r["component"], r["keep"])
        for r in semdedup(vectors, n_centroids=8, threshold=0.4, seed=42).collect()
    }
    from_artifact = {
        (r["vec_id"], r["cluster"], r["component"], r["keep"])
        for r in semdedup(
            vectors, threshold=0.4, assignments=loaded.assignments
        ).collect()
    }
    assert from_artifact == fresh
    assert len(fresh) == 300


def test_ivf_topk_assignments_requires_centroids(vectors):
    idx = IVFIndex.build(vectors, n_centroids=8, seed=42)
    with pytest.raises(ValueError, match="assignments requires"):
        ivf_topk(_queries(vectors), vectors, assignments=idx.assignments)


def test_derive_semdedup_knobs_sqrt_and_clamp():
    assert derive_semdedup_knobs(10_000) == 100
    assert derive_semdedup_knobs(2_000) == math.ceil(math.sqrt(2_000))
    assert derive_semdedup_knobs(2) == 4  # min clamp
    assert derive_semdedup_knobs(10**12, max_k=65536) == 65536  # max clamp


def test_derived_k_bounds_cluster_size(spark):
    """With k = ceil(sqrt(n)) the expected cluster size is sqrt(n); on
    well-spread data the largest KMeans cluster must stay within a
    small multiple of n/k — the bound that keeps the within-cluster
    pair fan-out (quadratic in cluster size) index-sized."""
    rnd = random.Random(3)
    n = 512
    rows = [(i, [rnd.gauss(0, 1) for _ in range(16)]) for i in range(n)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    idx = IVFIndex.build(vecs, n_centroids=None, seed=42)
    k = derive_semdedup_knobs(n)
    assert idx.n_centroids == k
    sizes = [
        r["c"]
        for r in idx.assignments.groupBy("cent_id").agg(F.count("*").alias("c")).collect()
    ]
    assert sum(sizes) == n
    assert max(sizes) <= 8 * n / k, f"max cluster {max(sizes)} vs bound {8 * n / k}"


def test_append_equals_full_assign(spark, vectors):
    """Refresh == recompute for the vector index: appending the delta
    against FROZEN centroids must equal one full assignment pass over
    base ∪ delta with the same centroids (assignment is per-vector
    independent), and must never touch the base rows."""
    from ml_with_spark_streaming_spark.operators.similarity import assign_to_centroids

    base = vectors.filter(F.col("vec_id") % 5 != 0)
    delta = vectors.filter(F.col("vec_id") % 5 == 0)
    idx = IVFIndex.build(base, n_centroids=8, seed=42)
    refreshed = idx.append(delta)
    assert refreshed.n_vectors == 300
    assert refreshed.n_centroids == 8
    merged = {(r["vec_id"], r["cent_id"]) for r in refreshed.assignments.collect()}
    full = {
        (r["vec_id"], r["cent_id"])
        for r in assign_to_centroids(vectors, idx.centroids).collect()
    }
    assert merged == full
    # base rows unchanged by the append
    old = {(r["vec_id"], r["cent_id"]) for r in idx.assignments.collect()}
    assert old <= merged and len(merged) - len(old) == 60


def test_ivf_index_for_memoizes_and_persists(spark, vectors, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "cache"))
    a = ivf_index_for(vectors, str(tmp_path), n_centroids=8, seed=42)
    b = ivf_index_for(vectors, str(tmp_path), n_centroids=8, seed=42)
    assert a is b  # in-process memo
    # the artifact genuinely lives on disk under the cache root
    import os

    roots = os.listdir(tmp_path / "cache")
    assert any(r.startswith("ivf_") for r in roots)
    # a different knob set is a different artifact
    c = ivf_index_for(vectors, str(tmp_path), n_centroids=4, seed=42)
    assert c is not a and c.n_centroids == 4


def test_pq_index_roundtrip_and_refusal(spark, vectors, tmp_path):
    from ml_with_spark_streaming_spark.operators.ann_index import PQIndex

    idx = PQIndex.build(vectors, m=4, k_sub=8, seed=42)
    idx.save(str(tmp_path / "pq"))
    loaded = PQIndex.load(spark, str(tmp_path / "pq"))
    assert (loaded.m, loaded.k_sub, loaded.seed) == (4, 8, 42)
    want = {(r["vec_id"], tuple(r["codes"])) for r in idx.codes.collect()}
    got = {(r["vec_id"], tuple(r["codes"])) for r in loaded.codes.collect()}
    assert got == want and len(got) == 300
    wantc = {
        (r["sub_id"], r["cent_id"], tuple(r["cent_vec"]))
        for r in idx.codebooks.collect()
    }
    gotc = {
        (r["sub_id"], r["cent_id"], tuple(r["cent_vec"]))
        for r in loaded.codebooks.collect()
    }
    assert gotc == wantc
    with pytest.raises(ValueError, match="m=4"):
        PQIndex.load(spark, str(tmp_path / "pq"), m=8)


def test_pq_append_equals_full_encode(spark, vectors):
    """PQIndex.append(delta) must equal one full encode pass over
    (base ∪ delta) against the same frozen codebooks — per-vector
    independence makes the merge exact."""
    from ml_with_spark_streaming_spark.operators.ann_index import PQIndex
    from ml_with_spark_streaming_spark.operators.pq import pq_encode

    base = vectors.filter(F.col("vec_id") % 5 != 0)
    delta = vectors.filter(F.col("vec_id") % 5 == 0)
    idx = PQIndex.build(base, m=4, k_sub=8, seed=42)
    refreshed = idx.append(delta)
    merged = {(r["vec_id"], tuple(r["codes"])) for r in refreshed.codes.collect()}
    full = {
        (r["vec_id"], tuple(r["codes"]))
        for r in pq_encode(vectors, idx.codebooks, m=4).collect()
    }
    assert merged == full and len(merged) == 300
    # base codes untouched by the append
    old = {(r["vec_id"], tuple(r["codes"])) for r in idx.codes.collect()}
    assert old <= merged and len(merged) - len(old) == 60


def test_pq_index_for_memoizes(spark, vectors, tmp_path, monkeypatch):
    from ml_with_spark_streaming_spark.operators.ann_index import pq_index_for

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "cache"))
    a = pq_index_for(vectors, str(tmp_path), m=4, k_sub=8, seed=42)
    b = pq_index_for(vectors, str(tmp_path), m=4, k_sub=8, seed=42)
    assert a is b


def test_regenerated_corpus_rebuilds_stale_artifact(
    spark, vectors, tmp_path, monkeypatch
):
    """Same path, new data: the persisted artifact must NOT be served
    stale — the corpus fingerprint (file listing + sizes/mtimes) in the
    sidecar forces a rebuild when the data at the cache key changed."""
    import os
    import time

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "cache"))
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    (data_dir / "part-0.parquet").write_bytes(b"generation-one")

    a = ivf_index_for(vectors, str(data_dir), n_centroids=8, seed=42)
    assert a.n_vectors == 300

    # "regenerate" the data at the same path (content + mtime change)
    time.sleep(0.01)
    (data_dir / "part-0.parquet").write_bytes(b"generation-two!!")
    os.utime(data_dir / "part-0.parquet")
    smaller = vectors.filter(F.col("vec_id") < 150)
    b = ivf_index_for(smaller, str(data_dir), n_centroids=8, seed=42)
    assert b is not a
    assert b.n_vectors == 150  # rebuilt from the NEW corpus, not stale-served
