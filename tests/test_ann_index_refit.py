"""Automated ANN refit: a drifting vector stream must trip the
bucket-skew bound, trigger a versioned refit+swap, and RECOVER probe
recall that the frozen-centroid index loses.

Deterministic drift geometry (no seed-hunting): the base corpus is 8
tight clusters on scaled axis directions 10*e_j — KMeans(k=8) recovers
one centroid per cluster. Drift batches sit at 30/sqrt(2)*(e0+e1):
equidistant (by cosine) from centroids 0 and 1, so per-point noise
splits them ~50/50 across those two buckets. A drift query's exact
top-10 are drift points from BOTH buckets, but an nprobe=1 probe sees
only one — recall ~0.5 by construction. After refit, the (heavy, far,
tight) drift cluster owns a centroid, every drift point lands in that
one bucket, and the same probe recovers ~full recall."""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import functions as F

from ml_with_spark_streaming_spark.operators.ann_index import IVFIndex
from ml_with_spark_streaming_spark.operators.similarity import (
    assign_to_centroids,
    brute_force_topk,
    ivf_topk,
)
from ml_with_spark_streaming_spark.streaming.ann_index_maintainer import (
    StreamingANNIndexMaintainer,
)

pytestmark = pytest.mark.slow  # multi-stream/artifact-fit module: full-suite only (SPARK_GRAFT_FULL_TESTS=1)

SCHEMA = "vec_id long, embedding array<float>"
DIM = 16
SQ2 = 2 ** 0.5


def _base_rows():
    rnd = random.Random(7)
    rows = []
    for j in range(8):
        for i in range(12):
            v = [rnd.gauss(0, 0.05) for _ in range(DIM)]
            v[j] += 10.0
            rows.append((j * 12 + i, v))
    return rows


def _drift_batches(n_batches=4, per_batch=12):
    rnd = random.Random(11)
    out = []
    for b in range(n_batches):
        rows = []
        for i in range(per_batch):
            v = [rnd.gauss(0, 0.05) for _ in range(DIM)]
            v[0] += 30.0 / SQ2
            v[1] += 30.0 / SQ2
            rows.append((1000 + b * 100 + i, v))
        out.append(rows)
    return out


@pytest.fixture(scope="module")
def corpus_and_batches(spark):
    base = spark.createDataFrame(_base_rows(), SCHEMA).localCheckpoint(eager=True)
    return base, _drift_batches()


def _recall_at_10(spark, idx, corpus_all, query_rows):
    queries = spark.createDataFrame(query_rows, "q_id long, q_vec array<float>")
    exact = brute_force_topk(queries, corpus_all, k=10).select("q_id", "vec_id")
    approx = ivf_topk(
        queries,
        corpus_all,
        k=10,
        nprobe=1,
        centroids=idx.centroids,
        assignments=idx.assignments,
    ).select("q_id", "vec_id")
    n_exact = exact.count()
    n_hit = exact.join(approx, ["q_id", "vec_id"], "left_semi").count()
    return n_hit / n_exact


def test_drift_trips_refit_and_recall_recovers(spark, corpus_and_batches, tmp_path):
    base, batches = corpus_and_batches
    idx = IVFIndex.build(base, n_centroids=8, seed=42)

    frozen = StreamingANNIndexMaintainer(index=idx)  # no refit: the control arm
    path = str(tmp_path / "ann_refit")
    m = StreamingANNIndexMaintainer(
        index=idx,
        corpus=base,
        refit_skew_threshold=1.5,
        save_path=path,
        save_every=1,
    )
    for bid, rows in enumerate(batches):
        b = spark.createDataFrame(rows, SCHEMA)
        frozen.process_batch(b, bid)
        m.process_batch(b, bid)

    assert any(h["refit"] for h in m.history), "skew bound never tripped"
    assert m._n_refits >= 1
    assert not any(h.get("refit") for h in frozen.history)

    corpus_all = base
    for rows in batches:
        corpus_all = corpus_all.unionByName(spark.createDataFrame(rows, SCHEMA))
    corpus_all = corpus_all.localCheckpoint(eager=True)
    query_rows = [(r[0], r[1]) for r in batches[0][:8]]

    r_frozen = _recall_at_10(spark, frozen.index, corpus_all, query_rows)
    r_refit = _recall_at_10(spark, m.index, corpus_all, query_rows)
    # frozen centroids split the drift cluster across two probed-one-
    # at-a-time buckets; the refit owns it with one centroid
    assert r_frozen <= 0.85, f"control arm unexpectedly healthy: {r_frozen}"
    assert r_refit >= 0.95, f"refit did not recover recall: {r_refit}"
    assert r_refit >= r_frozen + 0.1

    # stream == batch across the swap: final assignments equal one full
    # pass over (base + all drift) against the FINAL centroids
    want = {
        (r["vec_id"], r["cent_id"])
        for r in assign_to_centroids(corpus_all, m.index.centroids).collect()
    }
    got = {(r["vec_id"], r["cent_id"]) for r in m.index.assignments.collect()}
    assert got == want

    # superseded version dirs are vacuumed: exactly one live version
    vdirs = [d for d in os.listdir(path) if d.startswith("v")]
    assert len(vdirs) == 1
    assert os.path.exists(os.path.join(path, "MANIFEST.json"))


def test_refit_derive_k_resizes_with_corpus(spark, corpus_and_batches, tmp_path):
    """refit_derive_k=True: the refit re-derives k = ceil(sqrt(n)) from
    the CURRENT corpus size instead of keeping the stale build-time k."""
    from ml_with_spark_streaming_spark.operators.similarity import (
        derive_semdedup_knobs,
    )

    base, batches = corpus_and_batches
    idx = IVFIndex.build(base, n_centroids=8, seed=42)
    m = StreamingANNIndexMaintainer(
        index=idx,
        corpus=base,
        refit_skew_threshold=1.5,
        refit_derive_k=True,
    )
    for bid, rows in enumerate(batches):
        m.process_batch(spark.createDataFrame(rows, SCHEMA), bid)
    assert m._n_refits >= 1
    # the last refit happened at some corpus size n <= 144; k must equal
    # the derived value for the size AT that refit — recompute it from
    # the history row where the refit fired
    last_refit = [h for h in m.history if h.get("refit")][-1]
    assert m.index.n_centroids == derive_semdedup_knobs(last_refit["n_total"])
    assert m.index.n_centroids != 8 or derive_semdedup_knobs(last_refit["n_total"]) == 8


def test_save_resume_across_refit_swap(spark, corpus_and_batches, tmp_path):
    base, batches = corpus_and_batches
    idx = IVFIndex.build(base, n_centroids=8, seed=42)
    path = str(tmp_path / "ann_resume")

    kw = dict(corpus=base, refit_skew_threshold=1.5, save_path=path, save_every=1)
    a = StreamingANNIndexMaintainer(index=idx, **kw)
    for bid in (0, 1):
        a.process_batch(spark.createDataFrame(batches[bid], SCHEMA), bid)

    b = StreamingANNIndexMaintainer.from_index_path(spark, path, **kw)
    assert b._last_batch_id == 1
    # replay of an already-persisted batch after resume: no-op
    b.process_batch(spark.createDataFrame(batches[1], SCHEMA), 1)
    assert b.history[-1]["skipped"] is True
    for bid in (2, 3):
        b.process_batch(spark.createDataFrame(batches[bid], SCHEMA), bid)

    # _n_refits is restored from the manifest, so b's counter already
    # includes a's refits — the combined run must have refit at least once
    assert b._n_refits >= 1

    corpus_all = base
    for rows in batches:
        corpus_all = corpus_all.unionByName(spark.createDataFrame(rows, SCHEMA))
    want = {
        (r["vec_id"], r["cent_id"])
        for r in assign_to_centroids(corpus_all, b.index.centroids).collect()
    }
    got = {(r["vec_id"], r["cent_id"]) for r in b.index.assignments.collect()}
    assert got == want
    assert b.index.n_vectors == 96 + 48
