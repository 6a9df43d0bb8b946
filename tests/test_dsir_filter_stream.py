"""Streaming DSIR gate: stream verdicts must equal the batch
operator's verdicts under the same frozen weight table, and the frozen
artifact must survive a registry round-trip."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from ml_with_spark_streaming_spark.operators.dsir import (
    dsir_score_against,
    dsir_weight_table,
    _bucket_occurrences,
)
from ml_with_spark_streaming_spark.streaming.dsir_filter import (
    StreamingDSIRFilter,
    freeze_weights,
    weights_from_state,
    weights_state,
)

TGT = ["alpha", "beta", "gamma", "delta"]
SRC = ["zulu", "yankee", "xray", "whiskey"]
B = 64


def _train_weights(spark):
    rows = [(i, " ".join(TGT * 5), "en") for i in range(3)] + [
        (10 + i, " ".join(SRC * 5), "fr") for i in range(3)
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    occ = _bucket_occurrences(corpus, "text", "doc_id", B, carry=["lang"])
    return dsir_weight_table(occ, F.col("lang") == "en", B)


def test_stream_verdicts_equal_batch_and_registry_roundtrip(spark, tmp_path):
    weights = _train_weights(spark)
    frozen = freeze_weights(weights)
    assert len(frozen) == B  # dense artifact: one row per bucket

    # registry-state round trip preserves the table exactly
    assert weights_from_state(weights_state(frozen)) == frozen

    batch_rows = [
        (100, " ".join(TGT * 5)),  # target-like -> kept
        (101, " ".join(SRC * 5)),  # raw-like -> dropped
        (102, " ".join((TGT + SRC) * 5)),  # mixed -> whatever batch says
        (103, ""),  # token-less -> dropped (logw 0)
    ]
    batch_df = spark.createDataFrame(batch_rows, "doc_id long, text string")
    expected = {
        r.doc_id: r.selected
        for r in dsir_score_against(
            batch_df, weights, n_buckets=B
        ).collect()
    }
    assert expected[100] == 1 and expected[101] == 0 and expected[103] == 0

    kept = set()
    gate = StreamingDSIRFilter(
        weights=frozen,
        n_buckets=B,
        on_kept=lambda df, bid: kept.update(r["doc_id"] for r in df.collect()),
    )
    src = str(tmp_path / "in")
    os.makedirs(src)
    with open(os.path.join(src, "b0.jsonl"), "w") as f:
        for doc_id, text in batch_rows:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
    docs = (
        spark.readStream.format("json")
        .schema("doc_id long, text string")
        .load(src)
    )
    q = gate.attach(docs, checkpoint=str(tmp_path / "ckpt"), available_now=True)
    q.awaitTermination()

    assert kept == {d for d, s in expected.items() if s == 1}
    assert gate.history[0]["n_docs"] == 4
    assert gate.history[0]["n_kept"] == len(kept)
