"""The ingest door's serving-index stage: every batch's fully-ACCEPTED
vectors (and only those) are appended to the persisted IVF artifact —
docs rejected by ANY gate (text dedup, embedding near-dup, quality)
never reach the index; save_state/from_state carries the index with
the rest of the door."""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import functions as F

from ml_with_spark_streaming_spark.operators.quality_clf import (
    classifier_weights,
    feature_presence,
    heuristic_labels,
)
from ml_with_spark_streaming_spark.operators.similarity import assign_to_centroids
from ml_with_spark_streaming_spark.streaming.ingest_pipeline import (
    StreamingIngestPipeline,
)
from ml_with_spark_streaming_spark.streaming.quality_filter import freeze_weights

from tests.test_quality_clf import _HI_WORDS, _docs

import pytest

pytestmark = pytest.mark.slow  # multi-stream/artifact-fit module: full-suite only (SPARK_GRAFT_FULL_TESTS=1)

_DIM = 16


def _vec(i: int) -> list[float]:
    v = [0.0] * _DIM
    v[i % _DIM] = 1.0
    v[(i + 1) % _DIM] = 0.05 + 0.01 * (i // _DIM)
    return v


def _novel(k: int) -> list[float]:
    """±1 sign patterns (k in 0..2 distinct): cosine <= 0.25 against
    every near-one-hot corpus vector and <= 0 against each other —
    genuinely novel to the embedding gate at threshold 0.95."""
    assert 0 <= k <= 2
    return [1.0 if (i + k) % 3 == 0 else -1.0 for i in range(_DIM)]


def _emb_corpus(spark, ids):
    return spark.createDataFrame(
        [(i, _vec(i)) for i in ids], "doc_id long, embedding array<float>"
    )


def _run_stream(spark, pipe, root, batch, name):
    src = os.path.join(root, f"in_{name}")
    os.makedirs(src)
    with open(os.path.join(src, "b0.jsonl"), "w") as f:
        for doc_id, text, vec in batch:
            f.write(
                json.dumps({"doc_id": doc_id, "text": text, "embedding": vec}) + "\n"
            )
    docs = (
        spark.readStream.format("json")
        .schema("doc_id long, text string, embedding array<float>")
        .load(src)
    )
    q = pipe.attach(
        docs, checkpoint=os.path.join(root, f"ckpt_{name}"), available_now=True
    )
    q.awaitTermination()


def test_ann_stage_indexes_exactly_the_accepted_set(spark):
    corpus = _docs(spark)
    corpus_ids = [r.doc_id for r in corpus.select("doc_id").collect()]
    emb = _emb_corpus(spark, corpus_ids)
    frozen = freeze_weights(
        classifier_weights(feature_presence(corpus), heuristic_labels(corpus))
    )

    hi = " ".join(_HI_WORDS[(7 + j) % len(_HI_WORDS)] for j in range(40))
    copy0 = " ".join(_HI_WORDS[j % len(_HI_WORDS)] for j in range(40))
    batch = [
        # text dup of corpus doc 0 -> text gate drops it; its (novel)
        # vector must NOT be indexed
        (1000, copy0, _novel(0)),
        # novel low-quality -> quality gate drops it
        (1001, "!!! ??? %% novelzz novelqq ### $$$", _novel(1)),
        # text-novel but vector near-dup of corpus vec 0 -> emb gate drops it
        (1002, "spectra " + hi, [x * 1.001 for x in _vec(corpus_ids[0])]),
        # novel everything -> accepted AND indexed
        (1003, "tensor " + hi, _novel(2)),
    ]

    accepted: set[int] = set()
    pipe = StreamingIngestPipeline.build(
        corpus,
        frozen,
        embedding_corpus=emb,
        embedding_threshold=0.95,
        ann_n_centroids=4,
        threshold=0.9,
        on_accepted=lambda df, bid: accepted.update(r["doc_id"] for r in df.collect()),
    )
    with tempfile.TemporaryDirectory() as root:
        _run_stream(spark, pipe, root, batch, "b1")

    assert accepted == {1003}
    m = pipe.ann_maintainer
    indexed = {r[0] for r in m.index.assignments.select("doc_id").collect()}
    assert indexed == set(corpus_ids) | {1003}
    assert m.index.n_vectors == len(corpus_ids) + 1
    # stream == batch for the serving index: assignments equal one full
    # pass over (base emb corpus + accepted vectors) vs the centroids
    full = emb.unionByName(
        spark.createDataFrame([(1003, _novel(2))], "doc_id long, embedding array<float>")
    )
    want = {
        (r["doc_id"], r["cent_id"])
        for r in assign_to_centroids(full, m.index.centroids, c_id="doc_id").collect()
    }
    got = {(r["doc_id"], r["cent_id"]) for r in m.index.assignments.collect()}
    assert got == want


def test_ann_requires_embedding_corpus(spark):
    import pytest

    corpus = _docs(spark)
    frozen = freeze_weights(
        classifier_weights(feature_presence(corpus), heuristic_labels(corpus))
    )
    with pytest.raises(ValueError, match="embedding_corpus"):
        StreamingIngestPipeline.build(corpus, frozen, ann_n_centroids=4)


def test_ann_stage_save_resume_with_pipeline(spark, tmp_path):
    corpus = _docs(spark)
    corpus_ids = [r.doc_id for r in corpus.select("doc_id").collect()]
    emb = _emb_corpus(spark, corpus_ids)
    frozen = freeze_weights(
        classifier_weights(feature_presence(corpus), heuristic_labels(corpus))
    )
    hi = " ".join(_HI_WORDS[(5 + j) % len(_HI_WORDS)] for j in range(40))

    pipe = StreamingIngestPipeline.build(
        corpus,
        frozen,
        embedding_corpus=emb,
        embedding_threshold=0.95,
        ann_n_centroids=4,
        threshold=0.9,
    )
    state = str(tmp_path / "door_state")
    with tempfile.TemporaryDirectory() as root:
        # one source dir + ONE stream checkpoint across the restart —
        # the real resume contract: batch ids continue, so the
        # maintainer's replay guard skips nothing new
        src = os.path.join(root, "in")
        ckpt = os.path.join(root, "ckpt")

        def _feed(p, rows, fname):
            os.makedirs(src, exist_ok=True)
            with open(os.path.join(src, fname), "w") as f:
                for doc_id, text, vec in rows:
                    f.write(
                        json.dumps(
                            {"doc_id": doc_id, "text": text, "embedding": vec}
                        )
                        + "\n"
                    )
            docs = (
                spark.readStream.format("json")
                .schema("doc_id long, text string, embedding array<float>")
                .load(src)
            )
            q = p.attach(docs, checkpoint=ckpt, available_now=True)
            q.awaitTermination()

        _feed(pipe, [(2000, "alpha " + hi, _novel(0))], "b0.jsonl")
        assert pipe.ledger[-1]["n_accepted"] == 1
        pipe.save_state(state)

        resumed = StreamingIngestPipeline.from_state(
            spark, state, corpus, ann_corpus=emb
        )
        m = resumed.ann_maintainer
        assert m is not None
        assert m.index.n_vectors == len(corpus_ids) + 1
        _feed(resumed, [(2001, "omega " + hi, _novel(1))], "b1.jsonl")
        indexed = {r[0] for r in m.index.assignments.select("doc_id").collect()}
        assert indexed == set(corpus_ids) | {2000, 2001}
        # the resumed stage continues against the SAME frozen centroids
        full = emb.unionByName(
            spark.createDataFrame(
                [(2000, _novel(0)), (2001, _novel(1))],
                "doc_id long, embedding array<float>",
            )
        )
        want = {
            (r["doc_id"], r["cent_id"])
            for r in assign_to_centroids(
                full, m.index.centroids, c_id="doc_id"
            ).collect()
        }
        got = {(r["doc_id"], r["cent_id"]) for r in m.index.assignments.collect()}
        assert got == want
