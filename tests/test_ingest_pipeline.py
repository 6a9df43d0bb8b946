"""Composed streaming ingest pipeline (dedup gate -> quality gate):
stream verdicts must equal the batch operators' composition."""

from __future__ import annotations

import json
import os
import tempfile

from ml_with_spark_streaming_spark.operators.quality_clf import (
    classifier_weights,
    feature_presence,
    heuristic_labels,
)
from ml_with_spark_streaming_spark.streaming.ingest_pipeline import StreamingIngestPipeline
from ml_with_spark_streaming_spark.streaming.quality_filter import freeze_weights

from tests.test_quality_clf import _HI_WORDS, _docs


def test_pipeline_composes_both_gates(spark):
    corpus = _docs(spark)  # even ids: high quality; odd ids: low quality
    frozen = freeze_weights(
        classifier_weights(feature_presence(corpus), heuristic_labels(corpus))
    )

    hi = " ".join(_HI_WORDS[(7 + j) % len(_HI_WORDS)] for j in range(40))
    batch = [
        # doc 1000: verbatim copy of corpus doc 0 -> rejected by dedup
        (1000, " ".join(_HI_WORDS[j % len(_HI_WORDS)] for j in range(40))),
        # doc 1001: novel but low quality -> passes dedup, rejected by quality
        (1001, "!!! ??? %% novelzz novelqq ### $$$"),
        # doc 1002: novel high-quality -> accepted end to end
        (1002, hi + " extension tensor"),
    ]

    accepted: set[int] = set()
    pipe = StreamingIngestPipeline.build(
        corpus,
        frozen,
        threshold=0.9,
        on_accepted=lambda df, bid: accepted.update(r["doc_id"] for r in df.collect()),
    )

    with tempfile.TemporaryDirectory() as root:
        src = os.path.join(root, "in")
        os.makedirs(src)
        with open(os.path.join(src, "b0.jsonl"), "w") as f:
            for doc_id, text in batch:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
        docs = (
            spark.readStream.format("json")
            .schema("doc_id long, text string")
            .load(src)
        )
        q = pipe.attach(docs, checkpoint=os.path.join(root, "ckpt"), available_now=True)
        q.awaitTermination()

    assert accepted == {1002}
    assert len(pipe.ledger) == 1
    row = pipe.ledger[0]
    assert row["n_in"] == 3
    assert row["n_after_dedup"] == 2  # doc 1000 deduped
    assert row["n_accepted"] == 1  # doc 1001 fails the quality gate
    # stage histories stay coherent with the ledger
    assert pipe.dedup.history[0]["n_kept"] == 2
    assert pipe.quality.history[0]["n_kept"] == 1


def test_pipeline_with_decontamination_gate(spark):
    """Three-gate pipeline: a doc sharing a 13-gram with the eval set
    is rejected between dedup and quality; the ledger tracks each
    stage's survivor count."""
    corpus = _docs(spark)
    frozen = freeze_weights(
        classifier_weights(feature_presence(corpus), heuristic_labels(corpus))
    )
    bench = " ".join(f"bench{chr(97 + i)}" for i in range(13))  # the eval 13-gram
    eval_corpus = spark.createDataFrame(
        [(9000, f"intro {bench} outro")], "doc_id long, text string"
    )
    hi = " ".join(_HI_WORDS[(3 + j) % len(_HI_WORDS)] for j in range(40))
    batch = [
        # novel, high-quality, but embeds the eval 13-gram -> decon reject
        (1100, f"{hi} {bench}"),
        # novel, clean, high-quality -> accepted (distinct 8-token
        # prefix, or the intra-batch exact gate would collapse the two)
        (1101, "spectra " + hi),
    ]

    accepted: set[int] = set()
    pipe = StreamingIngestPipeline.build(
        corpus,
        frozen,
        eval_corpus=eval_corpus,
        threshold=0.9,
        on_accepted=lambda df, bid: accepted.update(r["doc_id"] for r in df.collect()),
    )

    with tempfile.TemporaryDirectory() as root:
        src = os.path.join(root, "in")
        os.makedirs(src)
        with open(os.path.join(src, "b0.jsonl"), "w") as f:
            for doc_id, text in batch:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
        docs = (
            spark.readStream.format("json")
            .schema("doc_id long, text string")
            .load(src)
        )
        q = pipe.attach(docs, checkpoint=os.path.join(root, "ckpt"), available_now=True)
        q.awaitTermination()

    assert accepted == {1101}
    row = pipe.ledger[0]
    assert row["n_in"] == 2
    assert row["n_after_dedup"] == 2  # both novel
    assert row["n_after_decon"] == 1  # 1100 overlaps the eval set
    assert row["n_accepted"] == 1
    assert pipe.decon.history[0]["n_contaminated"] == 1


def test_fully_rejected_batch_keeps_histories_aligned(spark):
    """A batch entirely rejected by dedup: downstream stages never
    run, but their histories still get explicit zero rows so
    per-batch histories stay index-aligned with the ledger."""
    corpus = _docs(spark)
    frozen = freeze_weights(
        classifier_weights(feature_presence(corpus), heuristic_labels(corpus))
    )
    eval_corpus = spark.createDataFrame(
        [(9000, " ".join(f"bench{chr(97 + i)}" for i in range(13)))],
        "doc_id long, text string",
    )
    pipe = StreamingIngestPipeline.build(
        corpus, frozen, eval_corpus=eval_corpus, threshold=0.9
    )
    # batch: one exact copy of corpus doc 0 -> nothing survives dedup
    copy0 = corpus.filter("doc_id = 0").collect()[0]["text"]
    batch = spark.createDataFrame([(2000, copy0)], "doc_id long, text string")
    pipe.process_batch(batch, 7)

    assert pipe.ledger == [
        {"batch_id": 7, "n_in": 1, "n_after_dedup": 0, "n_after_decon": 0, "n_accepted": 0}
    ]
    assert pipe.dedup.history[-1]["batch_id"] == 7
    assert pipe.decon.history[-1] == {
        "batch_id": 7, "n_docs": 0, "n_contaminated": 0, "n_kept": 0
    }
    assert pipe.quality.history[-1] == {"batch_id": 7, "n_docs": 0, "n_kept": 0}
