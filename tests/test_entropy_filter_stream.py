"""Streaming entropy gate: stream verdicts must equal the batch
operator's verdicts on the same rows (structural parity — the gate IS
the batch operator per micro-batch)."""

from __future__ import annotations

from ml_with_spark_streaming_spark.operators.textstats import char_bigram_entropy
from ml_with_spark_streaming_spark.streaming.entropy_filter import (
    StreamingEntropyFilter,
)

_ROWS = [
    (0, "aaaaaaaaaaaaaaaa"),                            # zero entropy -> reject
    (1, "abababababababab"),                            # low -> reject at a mid threshold
    (2, "the quick brown fox jumps over the lazy dog"),  # high -> keep
    (3, "x"),                                           # no bigrams -> reject
    (4, "packs my box with five dozen liquor jugs ok"),  # high -> keep
]


def test_stream_equals_batch_verdicts(spark):
    batch_all = spark.createDataFrame(_ROWS, "doc_id long, text string")
    thr = 700_000  # 0.7 nats
    want = {
        r["doc_id"]
        for r in char_bigram_entropy(batch_all, "text", "doc_id")
        .filter(f"entropy_x1e6 >= {thr}")
        .collect()
    }
    assert want == {2, 4}  # sanity: the fixture spans both regimes

    kept = set()
    gate = StreamingEntropyFilter(
        threshold_x1e6=thr,
        on_kept=lambda df, bid: kept.update(r["doc_id"] for r in df.collect()),
    )
    for i, rows in enumerate([_ROWS[:3], _ROWS[3:]]):
        gate.process_batch(
            spark.createDataFrame(rows, "doc_id long, text string"), i
        )
    assert kept == want
    totals = {k: sum(h[k] for h in gate.history) for k in ("n_docs", "n_kept", "n_unscored")}
    assert totals == {"n_docs": 5, "n_kept": 2, "n_unscored": 1}
