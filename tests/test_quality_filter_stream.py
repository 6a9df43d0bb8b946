"""Streaming quality filter: the frozen q112 weight table applied per
micro-batch must agree with the batch engine's verdict on the same
rows."""

from __future__ import annotations

import json
import os
import tempfile

from ml_with_spark_streaming_spark.operators.quality_clf import (
    classifier_scores,
    classifier_weights,
    feature_presence,
    heuristic_labels,
)
from ml_with_spark_streaming_spark.streaming.quality_filter import (
    StreamingQualityFilter,
    freeze_weights,
)

from tests.test_quality_clf import _docs


def test_stream_filter_matches_batch_verdict(spark):
    d = _docs(spark)
    pres = feature_presence(d)
    w = classifier_weights(pres, heuristic_labels(d))
    frozen = freeze_weights(w)
    assert 0 < len(frozen) <= 4096

    batch_keep = {
        r["doc_id"]
        for r in classifier_scores(pres, w).filter("score > 0").collect()
    }

    # stream the same docs as 3 json micro-batches
    rows = [(r["doc_id"], r["text"]) for r in d.collect()]
    kept_stream: set[int] = set()
    with tempfile.TemporaryDirectory() as root:
        src = os.path.join(root, "in")
        os.makedirs(src)
        for fi in range(3):
            with open(os.path.join(src, f"b{fi}.jsonl"), "w") as f:
                for i, (doc_id, text) in enumerate(rows):
                    if i % 3 == fi:
                        f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
        docs = (
            spark.readStream.format("json")
            .schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .load(src)
        )
        filt = StreamingQualityFilter(
            weights=frozen,
            on_kept=lambda df, bid: kept_stream.update(r["doc_id"] for r in df.collect()),
        )
        q = filt.attach(docs, checkpoint=os.path.join(root, "ckpt"), available_now=True)
        q.awaitTermination()

    assert kept_stream == batch_keep
    assert sum(h["n_docs"] for h in filt.history) == len(rows)
    assert sum(h["n_kept"] for h in filt.history) == len(batch_keep)


def test_stream_filter_empty_batch_is_noop(spark):
    filt = StreamingQualityFilter(weights=[("abc", 5)])
    filt.process_batch(spark.createDataFrame([], "doc_id long, text string"), 0)
    assert filt.history == []


def test_weights_registry_roundtrip(spark, tmp_path):
    from ml_with_spark_streaming_spark.ml.registry import ModelRegistry
    from ml_with_spark_streaming_spark.streaming.quality_filter import (
        weights_from_state,
        weights_state,
    )

    d = _docs(spark)
    frozen = freeze_weights(classifier_weights(feature_presence(d), heuristic_labels(d)))
    reg = ModelRegistry(str(tmp_path))
    reg.save("qclf", weights_state(frozen), meta={"n_buckets": len(frozen)})
    filt = StreamingQualityFilter.from_registry(reg, "qclf")
    assert sorted(filt.weights) == sorted(frozen)
    assert weights_from_state(reg.load("qclf")) == filt.weights
