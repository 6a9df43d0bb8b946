"""PQ codebook drift: frozen codebooks degrade ADC quality unboundedly
under a drifting stream even after an IVF centroid refit — the
maintainer must (a) SEE it (the per-batch ``pq_qerr`` quantization-
error gauge) and (b) FIX it (codebook retrain + full re-encode at
refit time, ``refit_pq_codebooks``).

Deterministic geometry (the test_ann_index_refit drift construction):
base = 8 tight clusters on 10·e_j; drift batches at 30/√2·(e0+e1).
Normalized, a drift vector's subspace-0 projection is ≈(.707,.707,0,0)
— not near ANY base codeword (base subvectors are ≈e_j or ≈0), so
frozen codebooks quantize every drift vector to an axis codeword:
squared reconstruction error ≈ 0.59 per vector vs ~1e-3 for in-
distribution batches, and ADC NEAR-TIES drift neighbors (true cosine
≈ 1) with base cluster-0/1 points (true cosine ≈ 0.707) — the top-10
becomes a noise-ordered mix of true neighbors and base points. After
a retrain over (corpus ∪ accepted) the drift cluster owns codewords,
ADC separates it strictly (≈1.0 vs ≈0.707), and recall recovers —
with ``refit_pq_codebooks=False`` it does not, isolating the codebook
retrain as the thing that fixes it."""

from __future__ import annotations

import random

import pytest

from ml_with_spark_streaming_spark.operators.ann_index import IVFIndex, PQIndex
from ml_with_spark_streaming_spark.operators.pq import pq_quantization_error, pq_topk
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
def arms(spark):
    """Two maintainers over the same drifting stream: codebook retrain
    armed vs frozen codebooks (both refit IVF centroids)."""
    base = spark.createDataFrame(_base_rows(), SCHEMA).localCheckpoint(eager=True)
    batches = _drift_batches()
    out = {}
    for retrain in (True, False):
        m = StreamingANNIndexMaintainer(
            index=IVFIndex.build(base, n_centroids=8, seed=42),
            pq=PQIndex.build(base, m=4, k_sub=16, seed=42),
            corpus=base,
            refit_skew_threshold=1.5,
            refit_pq_codebooks=retrain,
        )
        for bid, rows in enumerate(batches):
            m.process_batch(spark.createDataFrame(rows, SCHEMA), bid)
        assert m._n_refits >= 1, "drift never tripped the IVF refit"
        out[retrain] = m
    corpus_all = base
    for rows in batches:
        corpus_all = corpus_all.unionByName(spark.createDataFrame(rows, SCHEMA))
    return out[True], out[False], corpus_all.localCheckpoint(eager=True), batches


def test_qerr_gauge_sees_drift_and_retrain_fixes_it(spark, arms):
    retrained, frozen, corpus_all, batches = arms

    # the gauge: every pre-refit drift batch encodes with gross error
    first_refit = next(i for i, h in enumerate(frozen.history) if h["refit"])
    assert frozen.history[0]["pq_qerr"] > 0.1
    # frozen arm: the error NEVER recovers, IVF refit or not
    assert all(h["pq_qerr"] > 0.1 for h in frozen.history)
    # retrained arm: batches after the codebook retrain encode cleanly
    post = [h["pq_qerr"] for h in retrained.history[first_refit + 1 :]]
    if post:  # refit may fire on the last batch; full-corpus check below
        assert all(q < 0.01 for q in post)

    # full-corpus distortion: retrained codes reconstruct the drifted
    # corpus; frozen codes cannot (the drift slice alone contributes
    # ~0.59 * 48/144)
    q_frozen = pq_quantization_error(
        corpus_all, frozen.pq.codebooks, frozen.pq.codes, m=4
    )
    q_retrained = pq_quantization_error(
        corpus_all, retrained.pq.codebooks, retrained.pq.codes, m=4
    )
    assert q_frozen > 0.05, f"frozen-codebook distortion unexpectedly low: {q_frozen}"
    assert q_retrained < 0.01, f"retrain did not recover distortion: {q_retrained}"


def _drift_neighborhood_recall(spark, corpus_all, pq: PQIndex, query_rows) -> float:
    """Fraction of ADC top-10 results that are drift points (ids >=
    1000) for drift queries — every drift query's TRUE top-10 is all
    drift (within-cluster cosine ≈ 1 vs ≈ 0.707 to the nearest base
    cluster), so this is recall of the true neighborhood."""
    queries = spark.createDataFrame(query_rows, "q_id long, q_vec array<float>")
    top = pq_topk(
        queries, corpus_all, k=10, m=4, k_sub=16,
        codebooks=pq.codebooks, codes=pq.codes,
    )
    rows = top.select("q_id", "vec_id").collect()
    assert len(rows) == 10 * len(query_rows)
    return sum(1 for r in rows if r["vec_id"] >= 1000) / len(rows)


def test_adc_recall_recovers_only_with_codebook_retrain(spark, arms):
    retrained, frozen, corpus_all, batches = arms
    query_rows = [(r[0], r[1]) for r in batches[0][:6]]
    r_frozen = _drift_neighborhood_recall(spark, corpus_all, frozen.pq, query_rows)
    r_retrained = _drift_neighborhood_recall(
        spark, corpus_all, retrained.pq, query_rows
    )
    # frozen: drift candidates NEAR-TIE with base cluster-0/1 points in
    # ADC (both decode to noise-split axis codewords ~0.707 from the
    # query), so the top-10 is a noise-ordered mix of true neighbors
    # and base points; retrained codebooks separate the drift cluster
    # strictly (ADC ≈ 1.0 vs ≈ 0.707). Same threshold convention as
    # test_ann_index_refit's IVF arms.
    assert r_frozen <= 0.85, f"frozen codebooks unexpectedly healthy: {r_frozen}"
    assert r_retrained >= 0.95, f"retrain did not recover recall: {r_retrained}"
    assert r_retrained >= r_frozen + 0.1


def test_retrained_codes_cover_exactly_the_indexed_set(spark, arms):
    retrained, _frozen, _corpus_all, _batches = arms
    code_ids = {r["vec_id"] for r in retrained.pq.codes.collect()}
    idx_ids = {r["vec_id"] for r in retrained.index.assignments.collect()}
    assert code_ids == idx_ids


def test_qerr_rejects_inconsistent_codes_and_handles_empty(spark):
    """Review pin: NULL reconstruction over joined rows is a WIRING
    error (stale codes / wrong m), not perfect quality — raise, never
    report 0.0; genuinely empty input is 0.0."""
    import pytest
    from pyspark.sql import functions as F

    base = spark.createDataFrame(_base_rows(), SCHEMA)
    pq = PQIndex.build(base, m=4, k_sub=8, seed=42)
    # NULL code entries (a mis-wired/stale code table) -> NULL recon.
    # (Out-of-range codes already throw loudly under ANSI element_at —
    # the silent case is the NULL-propagating one.)
    bad_codes = pq.codes.select(
        "vec_id", F.expr("array(cast(null as int), 0, 0, 0)").alias("codes")
    )
    with pytest.raises(ValueError, match="stale codes or wrong m"):
        pq_quantization_error(base, pq.codebooks, bad_codes, m=4)
    # PARTIAL mismatch (ADVICE pin): F.avg skips per-row NULLs, so a
    # subset of stale rows must not silently average the valid rest —
    # any failed reconstruction raises, with the failure count named.
    partial = pq.codes.select(
        "vec_id",
        F.when(
            F.col("vec_id") % 7 == 0,
            F.expr("array(cast(null as int), 0, 0, 0)"),
        ).otherwise(F.col("codes")).alias("codes"),
    )
    with pytest.raises(ValueError, match=r"NULL for \d+ of \d+ joined rows"):
        pq_quantization_error(base, pq.codebooks, partial, m=4)
    empty = spark.createDataFrame([], SCHEMA)
    assert pq_quantization_error(empty, pq.codebooks, pq.codes, m=4) == 0.0
