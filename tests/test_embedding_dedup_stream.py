"""Streaming embedding-modality dedup gate
(streaming/embedding_dedup_filter.py): micro-batch verdicts must equal
the q100 operators recomputed over (corpus + accepted-so-far), the
index must grow with accepted batches, and the attach() path must
agree with direct process_batch calls."""

from __future__ import annotations

import json
import os
import random
import tempfile

from pyspark.sql import functions as F

from ml_with_spark_streaming_spark.operators.similarity import neardup_pairs
from ml_with_spark_streaming_spark.streaming.embedding_dedup_filter import (
    StreamingEmbeddingDedup,
)

import pytest

pytestmark = pytest.mark.slow  # multi-stream/artifact-fit module: full-suite only (SPARK_GRAFT_FULL_TESTS=1)

_DIM = 16
_SCHEMA = "vec_id long, embedding array<float>"


def _jitter(rnd, v, eps=1e-3):
    return [x * (1 + rnd.uniform(-eps, eps)) for x in v]


def _mk_corpus(rnd, n=12):
    return [(i, [rnd.gauss(0, 1) for _ in range(_DIM)]) for i in range(n)]


def test_gate_verdicts_match_batch_operators(spark):
    rnd = random.Random(3)
    corpus_rows = _mk_corpus(rnd)
    corpus = spark.createDataFrame(corpus_rows, _SCHEMA)
    gate = StreamingEmbeddingDedup.from_corpus(corpus, threshold=0.95, dim=_DIM)

    novel1 = [rnd.gauss(0, 1) for _ in range(_DIM)]
    dup_vec = [rnd.gauss(0, 1) for _ in range(_DIM)]
    b1 = [
        (100, _jitter(rnd, corpus_rows[0][1])),  # near-dup of corpus vec 0
        (101, novel1),                           # novel -> accepted
        (102, dup_vec),                          # identical pair in one drop:
        (103, dup_vec),                          # keep-first (102 kept)
    ]
    gate.process_batch(spark.createDataFrame(b1, _SCHEMA), 0)
    h1 = gate.history[-1]
    assert h1["n_vecs"] == 4
    assert h1["n_near"] == 1 and h1["n_exact"] == 1
    assert h1["n_kept"] == 2  # 101 and 102

    b2 = [
        (200, _jitter(rnd, novel1)),             # near-dup of ACCEPTED 101
        (201, [rnd.gauss(0, 1) for _ in range(_DIM)]),  # novel
        (202, _jitter(rnd, corpus_rows[5][1])),  # near-dup of corpus vec 5
    ]
    kept2: set[int] = set()
    gate.on_kept = lambda df, bid: kept2.update(r.vec_id for r in df.collect())
    gate.process_batch(spark.createDataFrame(b2, _SCHEMA), 1)
    h2 = gate.history[-1]
    assert h2["n_near"] == 2, "grown index must catch the accepted-batch near-dup"
    assert kept2 == {201}

    # parity: every near-rejection has a verified cosine edge to the
    # reference set at that point; every acceptance has none
    refs1 = corpus_rows
    union1 = spark.createDataFrame(
        refs1 + [(i, v) for i, v in b1], _SCHEMA
    )
    edges1 = {
        (r.id1, r.id2)
        for r in neardup_pairs(union1, threshold=0.95).collect()
    }
    ref_ids1 = {i for i, _ in refs1}
    assert any(a in ref_ids1 and b == 100 for a, b in edges1)  # 100 was near
    assert not any(b == 101 and a in ref_ids1 for a, b in edges1)  # 101 clean

    refs2 = refs1 + [(101, novel1), (102, dup_vec)]
    union2 = spark.createDataFrame(refs2 + [(i, v) for i, v in b2], _SCHEMA)
    edges2 = {
        (r.id1, r.id2) for r in neardup_pairs(union2, threshold=0.95).collect()
    }
    ref_ids2 = {i for i, _ in refs2}
    assert any(a in ref_ids2 and b == 200 for a, b in edges2)
    assert any(a in ref_ids2 and b == 202 for a, b in edges2)
    assert not any(b == 201 and a in ref_ids2 for a, b in edges2)


def test_attach_matches_direct_calls(spark):
    """availableNow file-stream run == direct process_batch calls."""
    rnd = random.Random(5)
    corpus_rows = _mk_corpus(rnd)
    corpus = spark.createDataFrame(corpus_rows, _SCHEMA)

    batches = [
        [(300, _jitter(rnd, corpus_rows[1][1])), (301, [rnd.gauss(0, 1) for _ in range(_DIM)])],
        [(302, [rnd.gauss(0, 1) for _ in range(_DIM)])],
    ]

    direct = StreamingEmbeddingDedup.from_corpus(corpus, threshold=0.95, dim=_DIM)
    direct_kept: set[int] = set()
    direct.on_kept = lambda df, bid: direct_kept.update(
        r.vec_id for r in df.collect()
    )
    for bid, rows in enumerate(batches):
        direct.process_batch(spark.createDataFrame(rows, _SCHEMA), bid)

    streamed = StreamingEmbeddingDedup.from_corpus(corpus, threshold=0.95, dim=_DIM)
    stream_kept: set[int] = set()
    streamed.on_kept = lambda df, bid: stream_kept.update(
        r.vec_id for r in df.collect()
    )
    with tempfile.TemporaryDirectory() as root:
        src = os.path.join(root, "in")
        os.makedirs(src)
        for bid, rows in enumerate(batches):
            with open(os.path.join(src, f"b{bid}.jsonl"), "w") as f:
                for vid, vec in rows:
                    f.write(json.dumps({"vec_id": vid, "embedding": vec}) + "\n")
        stream = (
            spark.readStream.format("json")
            .schema(_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .load(src)
        )
        q = streamed.attach(
            stream, checkpoint=os.path.join(root, "ckpt"), available_now=True
        )
        q.awaitTermination()

    assert stream_kept == direct_kept == {301, 302}
    assert sum(h["n_kept"] for h in streamed.history) == sum(
        h["n_kept"] for h in direct.history
    )


def test_compact_and_save_resume_roundtrip(spark, tmp_path):
    """compact() is verdict-neutral; save_index -> from_index_path
    resumes with the grown index intact (a near-dup of an accepted
    vector is still rejected after the round trip); conflicting knob
    overrides on resume raise."""
    import pytest

    rnd = random.Random(9)
    corpus_rows = _mk_corpus(rnd)
    corpus = spark.createDataFrame(corpus_rows, _SCHEMA)
    gate = StreamingEmbeddingDedup.from_corpus(
        corpus, threshold=0.95, dim=_DIM, compact_every=1
    )

    novel = [rnd.gauss(0, 1) for _ in range(_DIM)]
    gate.process_batch(
        spark.createDataFrame([(400, novel)], _SCHEMA), 0
    )  # accepted; compact_every=1 compacts right after
    assert gate._since_compact == 0
    assert gate.history[-1]["n_kept"] == 1

    # verdict-neutral compaction: a jitter of the accepted vector is
    # rejected by the compacted index
    gate.process_batch(
        spark.createDataFrame([(401, _jitter(rnd, novel))], _SCHEMA), 1
    )
    assert gate.history[-1]["n_near"] == 1 and gate.history[-1]["n_kept"] == 0

    idx = str(tmp_path / "emb_index")
    gate.save_index(idx)
    resumed = StreamingEmbeddingDedup.from_index_path(spark, idx, dim=_DIM)
    assert resumed.threshold == 0.95 and resumed.n_planes == 32

    resumed.process_batch(
        spark.createDataFrame(
            [
                (500, _jitter(rnd, novel)),                 # vs accepted-then-saved
                (501, _jitter(rnd, corpus_rows[2][1])),     # vs original corpus
                (502, [rnd.gauss(0, 1) for _ in range(_DIM)]),  # novel
            ],
            _SCHEMA,
        ),
        0,
    )
    h = resumed.history[-1]
    assert h["n_near"] == 2 and h["n_kept"] == 1

    with pytest.raises(ValueError, match="n_planes"):
        StreamingEmbeddingDedup.from_index_path(spark, idx, n_planes=64)


def test_signature_collision_without_near_cosine_is_kept(spark):
    """A full signature is an n_planes-bit hash of the vector, not
    vector equality: two DISTINCT sub-threshold vectors can collide on
    every bit. The intra-batch stage must verify colliding pairs with
    the exact cosine before dropping — here n_planes=1 forces
    collisions (8 vectors, 2 possible signatures) while every pairwise
    cosine of random gaussians sits far below 0.95, so ALL vectors
    must survive."""
    rnd = random.Random(7)
    corpus = spark.createDataFrame([], _SCHEMA)
    gate = StreamingEmbeddingDedup.from_corpus(
        corpus, threshold=0.95, dim=_DIM, n_planes=1, bands=1
    )
    batch = [(i, [rnd.gauss(0, 1) for _ in range(_DIM)]) for i in range(8)]
    # sanity: the planted batch really is pairwise sub-threshold
    import math

    def _cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        return dot / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))

    assert all(
        _cos(batch[i][1], batch[j][1]) < 0.95
        for i in range(8)
        for j in range(i + 1, 8)
    )
    kept: set[int] = set()
    gate.on_kept = lambda df, bid: kept.update(r.vec_id for r in df.collect())
    gate.process_batch(spark.createDataFrame(batch, _SCHEMA), 0)
    h = gate.history[-1]
    assert h["n_exact"] == 0, "signature collisions below threshold must not drop"
    assert kept == set(range(8))

    # positive control: a bit-identical vector in the same drop is
    # still cut (cosine 1 >= threshold), keep-first by id
    v = [rnd.gauss(0, 1) for _ in range(_DIM)]
    gate2 = StreamingEmbeddingDedup.from_corpus(
        corpus, threshold=0.95, dim=_DIM, n_planes=1, bands=1
    )
    gate2.process_batch(spark.createDataFrame([(0, v), (1, v)], _SCHEMA), 0)
    assert gate2.history[-1]["n_exact"] == 1
    assert gate2.history[-1]["n_kept"] == 1


def test_verify_mode_parity_and_scale_behavior(spark):
    """verify_mode="join" and "broadcast" must be verdict-identical on
    the same stream, join mode must never materialize the driver-side
    reference chunks (the 100 TB contract: nothing corpus-sized is
    collected or broadcast), and broadcast mode must ship ONLY the
    per-batch delta as a new chunk (no full-matrix rebroadcast until
    compact())."""
    rnd = random.Random(13)
    corpus_rows = _mk_corpus(rnd)
    novel1 = [rnd.gauss(0, 1) for _ in range(_DIM)]
    dup_vec = [rnd.gauss(0, 1) for _ in range(_DIM)]
    batches = [
        [
            (100, _jitter(rnd, corpus_rows[0][1])),  # near-dup of corpus 0
            (101, novel1),                           # novel -> accepted
            (102, dup_vec),                          # intra-batch pair:
            (103, dup_vec),                          # keep-first (102)
        ],
        [
            (200, _jitter(rnd, novel1)),             # near-dup of ACCEPTED 101
            (201, [rnd.gauss(0, 1) for _ in range(_DIM)]),  # novel
            (202, _jitter(rnd, corpus_rows[5][1])),  # near-dup of corpus 5
        ],
        [
            (300, _jitter(rnd, dup_vec)),            # near-dup of accepted 102
            (301, [rnd.gauss(0, 1) for _ in range(_DIM)]),  # novel
        ],
    ]

    gates, kept = {}, {}
    for mode in ("broadcast", "join"):
        corpus = spark.createDataFrame(corpus_rows, _SCHEMA)
        g = StreamingEmbeddingDedup.from_corpus(
            corpus, threshold=0.95, dim=_DIM, verify_mode=mode,
            compact_every=100,  # keep chunks un-merged for the delta check
        )
        ks: set[int] = set()
        g.on_kept = lambda df, bid, s=ks: s.update(r.vec_id for r in df.collect())
        for bid, rows in enumerate(batches):
            g.process_batch(spark.createDataFrame(rows, _SCHEMA), bid)
        gates[mode], kept[mode] = g, ks

    # verdict parity, batch by batch
    strip = lambda h: [
        {k: r[k] for k in ("batch_id", "n_vecs", "n_exact", "n_near", "n_kept")}
        for r in h
    ]
    assert strip(gates["join"].history) == strip(gates["broadcast"].history)
    assert kept["join"] == kept["broadcast"] == {101, 102, 201, 301}

    # join mode: the driver-side reference chunks were NEVER built
    assert gates["join"]._ref_chunks is None

    # broadcast mode: chunk 0 = corpus, then exactly one O(batch) delta
    # chunk per accepted batch — the existing chunks are not re-shipped
    chunks = gates["broadcast"]._ref_chunks
    assert [len(c.value[1]) for c in chunks] == [12, 2, 1, 1]

    # compact() merges to one chunk and stays verdict-identical
    g = gates["broadcast"]
    g.compact()
    assert len(g._ref_chunks) == 1 and len(g._ref_chunks[0].value[1]) == 16
    g.process_batch(
        spark.createDataFrame([(400, _jitter(rnd, novel1))], _SCHEMA), 3
    )
    gj = gates["join"]
    gj.process_batch(
        spark.createDataFrame([(400, _jitter(rnd, novel1))], _SCHEMA), 3
    )
    assert strip(g.history[-1:]) == strip(gj.history[-1:])
    assert g.history[-1]["n_near"] == 1 and g.history[-1]["n_kept"] == 0


def test_verify_mode_validation_and_state_roundtrip(spark, tmp_path):
    import pytest

    rnd = random.Random(17)
    corpus = spark.createDataFrame(_mk_corpus(rnd), _SCHEMA)
    with pytest.raises(ValueError, match="verify_mode"):
        StreamingEmbeddingDedup.from_corpus(corpus, dim=_DIM, verify_mode="nope")

    g = StreamingEmbeddingDedup.from_corpus(
        corpus, threshold=0.95, dim=_DIM, verify_mode="join"
    )
    idx = str(tmp_path / "emb_idx_join")
    g.save_index(idx)
    r = StreamingEmbeddingDedup.from_index_path(
        spark, idx, dim=_DIM, verify_mode="join"
    )
    assert r.verify_mode == "join"
    r.process_batch(spark.createDataFrame([(1, [1.0] * _DIM)], _SCHEMA), 0)
    assert r._ref_chunks is None


def test_bucket_partitioned_join_verify_prunes_and_agrees(spark, tmp_path):
    """bucket_partitions=N in join mode: save_index persists the vector
    table PARTITIONED by the id-hash bucket, the verify's corpus scan
    carries the candidates' buckets as a static partition predicate
    (PartitionFilters in the physical scan — only those directories are
    read), and verdicts are identical to the unbucketed join gate."""
    import os

    import pytest
    from pyspark.sql import functions as F

    rnd = random.Random(21)
    corpus_rows = _mk_corpus(rnd, n=24)
    novel = [rnd.gauss(0, 1) for _ in range(_DIM)]
    batches = [
        [(600, _jitter(rnd, corpus_rows[2][1])), (601, novel)],
        [(700, _jitter(rnd, novel)), (701, [rnd.gauss(0, 1) for _ in range(_DIM)])],
    ]

    with pytest.raises(ValueError, match="bucket_partitions"):
        StreamingEmbeddingDedup.from_corpus(
            spark.createDataFrame(corpus_rows, _SCHEMA),
            dim=_DIM, bucket_partitions=8,  # broadcast mode: refused
        )

    plain = StreamingEmbeddingDedup.from_corpus(
        spark.createDataFrame(corpus_rows, _SCHEMA),
        threshold=0.95, dim=_DIM, verify_mode="join",
    )
    bucketed = StreamingEmbeddingDedup.from_corpus(
        spark.createDataFrame(corpus_rows, _SCHEMA),
        threshold=0.95, dim=_DIM, verify_mode="join", bucket_partitions=8,
    )
    idx = str(tmp_path / "emb_idx_bucketed")
    bucketed.save_index(idx)
    # the persisted layout IS partitioned by bucket
    vdirs = [d for d in os.listdir(f"{idx}/vectors") if d.startswith("_vb=")]
    assert len(vdirs) > 1
    resumed = StreamingEmbeddingDedup.from_index_path(
        spark, idx, dim=_DIM, verify_mode="join"
    )
    assert resumed.bucket_partitions == 8  # knob restored from the sidecar

    strip = lambda h: [
        {k: r[k] for k in ("n_vecs", "n_exact", "n_near", "n_kept")} for r in h
    ]
    for bid, rows in enumerate(batches):
        b = spark.createDataFrame(rows, _SCHEMA)
        plain.process_batch(b, bid)
        resumed.process_batch(b, bid)
    assert strip(resumed.history) == strip(plain.history)
    assert resumed.history[0]["n_near"] == 1  # 600 vs corpus
    assert resumed.history[1]["n_near"] == 1  # 700 vs accepted 601

    # the verify confined its scan to the candidates' buckets...
    assert resumed._last_join_buckets is not None
    assert 0 < len(resumed._last_join_buckets) <= 8
    # ...and the pruned read of the PERSISTED table shows the partition
    # predicate in the scan (only matching _vb= directories are listed)
    pruned = spark.read.parquet(f"{idx}/vectors").filter(
        F.col("_vb").isin(resumed._last_join_buckets)
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "_vb" in plan


def test_bucketed_index_resumes_with_default_kwargs(spark, tmp_path):
    """Review pin: from_index_path on a bucketed artifact with NO
    overrides must restore join mode from the sidecar (the default
    broadcast mode used to trip the bucket_partitions guard); an
    explicit broadcast override resumes unbucketed; a conflicting
    bucket_partitions override raises."""
    import pytest

    rnd = random.Random(33)
    corpus = spark.createDataFrame(_mk_corpus(rnd), _SCHEMA)
    g = StreamingEmbeddingDedup.from_corpus(
        corpus, threshold=0.95, dim=_DIM, verify_mode="join", bucket_partitions=4
    )
    idx = str(tmp_path / "emb_bucket_default")
    g.save_index(idx)

    r = StreamingEmbeddingDedup.from_index_path(spark, idx, dim=_DIM)
    assert r.verify_mode == "join" and r.bucket_partitions == 4
    r.process_batch(spark.createDataFrame([(1, [1.0] * _DIM)], _SCHEMA), 0)
    assert r.history[-1]["n_kept"] == 1

    rb = StreamingEmbeddingDedup.from_index_path(
        spark, idx, dim=_DIM, verify_mode="broadcast"
    )
    assert rb.bucket_partitions is None  # explicit opt-out: unbucketed
    rb.process_batch(spark.createDataFrame([(2, [1.0] * _DIM)], _SCHEMA), 0)

    with pytest.raises(ValueError, match="bucket_partitions=4"):
        StreamingEmbeddingDedup.from_index_path(
            spark, idx, dim=_DIM, verify_mode="join", bucket_partitions=8
        )


def test_resent_id_with_new_vector_verifies_against_all_rows(spark):
    """Review pin: a re-sent id whose NEW (non-near) vector is accepted
    leaves TWO rows for that id in the reference set; a later
    candidate near the NEW vector must be dropped in BOTH modes, and
    compact() must not collapse the id to one row (oldest- or
    newest-wins would diverge between modes)."""
    rnd = random.Random(41)
    u = [rnd.gauss(0, 1) for _ in range(_DIM)]
    w = [rnd.gauss(0, 1) for _ in range(_DIM)]  # not near u (random gaussians)
    corpus_rows = [(0, u)]

    for mode in ("broadcast", "join"):
        g = StreamingEmbeddingDedup.from_corpus(
            spark.createDataFrame(corpus_rows, _SCHEMA),
            threshold=0.95, dim=_DIM, verify_mode=mode, compact_every=100,
        )
        # id 0 re-sent with w: accepted (vector-novel), id collides
        g.process_batch(spark.createDataFrame([(0, w)], _SCHEMA), 0)
        assert g.history[-1]["n_kept"] == 1
        # near-dup of the NEW vector w -> must be caught
        g.process_batch(
            spark.createDataFrame([(5, _jitter(rnd, w))], _SCHEMA), 1
        )
        assert g.history[-1]["n_near"] == 1, f"{mode}: new row of re-sent id lost"
        # near-dup of the OLD vector u -> still caught
        g.process_batch(
            spark.createDataFrame([(6, _jitter(rnd, u))], _SCHEMA), 2
        )
        assert g.history[-1]["n_near"] == 1, f"{mode}: old row of re-sent id lost"
        # compaction keeps both rows (verdict-neutral)
        g.compact()
        g.process_batch(
            spark.createDataFrame([(7, _jitter(rnd, w)), (8, _jitter(rnd, u))], _SCHEMA), 3
        )
        assert g.history[-1]["n_near"] == 2, f"{mode}: compact collapsed the id"
