"""Streaming segment-quality rewrite: per-batch verdicts must equal
the batch operator's, and the pipeline slot (after segment dedup,
before the doc gates) must rewrite the text later gates score."""

from __future__ import annotations

from ml_with_spark_streaming_spark.operators.segment_dedup import (
    segment_quality_rewrite,
)
from ml_with_spark_streaming_spark.streaming.segment_quality_filter import (
    StreamingSegmentQuality,
)

GOOD = "alphabetical betacarotene gammaglobulin"   # quality ~0.693
JUNK = "!!! ??? %%%"                                # fails any threshold


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_stream_equals_batch_rewrite(spark):
    batches = [
        [(1, f"{GOOD} {JUNK} {GOOD}"), (2, f"{JUNK} {JUNK}")],
        [(3, GOOD), (4, f"{JUNK} {GOOD}")],
    ]
    stage = StreamingSegmentQuality(width=3, threshold_x100=67)
    got: dict[int, str] = {}
    stage.on_kept = lambda df, bid: got.update(
        {r["doc_id"]: r["text"] for r in df.collect()}
    )
    for bid, rows in enumerate(batches):
        stage.process_batch(_docs(spark, rows), bid)

    # batch operator over the same rows, doc by doc
    want = {
        r["doc_id"]: r["text_kept"]
        for r in segment_quality_rewrite(
            _docs(spark, batches[0] + batches[1]), width=3, threshold_x100=67
        ).collect()
        if r["n_kept"] > 0
    }
    assert got == want
    assert 2 not in got  # all-junk doc dropped entirely

    # history bookkeeping
    assert [h["n_docs"] for h in stage.history] == [2, 2]
    assert stage.history[0]["n_cut"] == 3  # junk seg in doc1 + 2 in doc2
    assert stage.history[0]["n_docs_kept"] == 1


def test_pipeline_slots_segquality_before_doc_gates(spark):
    from ml_with_spark_streaming_spark.operators.quality_clf import (
        classifier_weights,
        feature_presence,
        heuristic_labels,
    )
    from ml_with_spark_streaming_spark.streaming.ingest_pipeline import (
        StreamingIngestPipeline,
    )
    from ml_with_spark_streaming_spark.streaming.quality_filter import freeze_weights

    from tests.test_quality_clf import _docs as _corpus_docs

    from ml_with_spark_streaming_spark.streaming.ingest_dedup import (
        StreamingIngestDedup,
    )
    from ml_with_spark_streaming_spark.streaming.quality_filter import (
        StreamingQualityFilter,
    )

    corpus = _corpus_docs(spark)
    frozen = freeze_weights(
        classifier_weights(feature_presence(corpus), heuristic_labels(corpus))
    )
    # build() wires the stage from the threshold knob
    assert (
        StreamingIngestPipeline.build(
            corpus, frozen, segment_quality_threshold_x100=67
        ).segquality
        is not None
    )

    # width=3 fixture pipeline, constructed directly
    pipe = StreamingIngestPipeline(
        dedup=StreamingIngestDedup.from_corpus(corpus),
        quality=StreamingQualityFilter(weights=frozen),
        segquality=StreamingSegmentQuality(width=3, threshold_x100=67),
    )

    seen_by_quality: list[str] = []
    orig = pipe.quality.process_batch

    def spy(df, bid):
        seen_by_quality.extend(r["text"] for r in df.select("text").collect())
        orig(df, bid)

    pipe.quality.process_batch = spy
    # novel doc with one junk paragraph: segquality must cut it BEFORE
    # the quality gate sees the text
    pipe.process_batch(
        _docs(spark, [(5000, f"{GOOD} {JUNK} {GOOD}")]), 0
    )
    assert seen_by_quality == [f"{GOOD} {GOOD}"]
    assert pipe.ledger[-1]["n_after_segquality"] == 1
    assert pipe.ledger[-1]["n_after_rewrite"] == 1
