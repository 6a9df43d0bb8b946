"""Streaming segment-dedup rewrite gate: multi-batch stream verdicts
equal the batch operator run over the union (corpus < b1 < b2 id
order), compaction never changes verdicts, and the rewrite emits
surviving text while dropping all-boilerplate docs."""

from __future__ import annotations

from ml_with_spark_streaming_spark.operators.segment_dedup import segment_dedup
from ml_with_spark_streaming_spark.streaming.segment_dedup_filter import (
    StreamingSegmentDedup,
)

import pytest

W = 3  # 3-token segments for readable fixtures
BOILER = "all rights reserved"
A = "alpha beta gamma"
B = "delta epsilon zeta"
C = "eta theta iota"
D = "kappa lam mu"


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _run_gate(spark, corpus_rows, batches, compact_every=8):
    kept: dict[int, dict[int, str]] = {}
    gate = StreamingSegmentDedup.from_corpus(
        _df(spark, corpus_rows), width=W, compact_every=compact_every
    )
    for bid, rows in enumerate(batches):
        gate.on_kept = lambda df, b: kept.setdefault(b, {}).update(
            {r["doc_id"]: r["text"] for r in df.collect()}
        )
        gate.process_batch(_df(spark, rows), bid)
    return gate, kept


def test_multibatch_stream_equals_batch_union(spark):
    corpus_rows = [(1, f"{A} {BOILER}"), (2, B)]
    b1 = [(100, f"{BOILER} {C}"), (101, f"{C} {D}")]  # C first kept in 100
    b2 = [(200, f"{D} {BOILER} {A}"), (201, C), (202, "nu xi omicron")]
    gate, kept = _run_gate(spark, corpus_rows, [b1, b2])

    union = segment_dedup(
        _df(spark, corpus_rows + b1 + b2), width=W
    ).collect()
    want = {
        r["doc_id"]: r["text_kept"] for r in union if r["doc_id"] >= 100 and r["n_kept"] > 0
    }
    got = {d: t for bat in kept.values() for d, t in bat.items()}
    assert got == want
    # docs 200/201 are fully seen by batch 2 -> dropped entirely
    assert 200 not in got and 201 not in got
    assert got[202] == "nu xi omicron"  # novel content passes untouched
    h2 = gate.history[1]
    # 200: D seen (b1), BOILER+A seen (corpus); 201: C seen (b1) -> only 202 survives
    assert h2["n_docs"] == 3 and h2["n_docs_kept"] == 1


@pytest.mark.slow
def test_compaction_is_verdict_invariant(spark):
    corpus_rows = [(1, f"{A} {BOILER}")]
    batches = [
        [(100 + 10 * b, f"{BOILER} u{chr(97 + b)}x u{chr(97 + b)}y u{chr(97 + b)}z")]
        for b in range(5)
    ]
    _, kept_never = _run_gate(spark, corpus_rows, batches, compact_every=999)
    gate_often, kept_often = _run_gate(spark, corpus_rows, batches, compact_every=1)
    assert kept_never == kept_often
    assert not gate_often._slices  # everything merged back into the base index


def test_rewrite_emits_surviving_text(spark):
    gate, kept = _run_gate(spark, [(1, BOILER)], [[(100, f"{B} {BOILER} {C}")]])
    assert kept[0] == {100: f"{B} {C}"}
    h = gate.history[0]
    assert (h["n_segs"], h["n_cut"]) == (3, 1)


def test_index_save_load_roundtrip(spark, tmp_path):
    corpus_rows = [(1, f"{A} {BOILER}")]
    b1 = [(100, f"{BOILER} {C}")]
    b2 = [(200, f"{C} {D}")]

    gate = StreamingSegmentDedup.from_corpus(_df(spark, corpus_rows), width=W)
    gate.process_batch(_df(spark, b1), 0)
    gate.save_index(str(tmp_path / "idx"))

    resumed = StreamingSegmentDedup.from_index_path(spark, str(tmp_path / "idx"))
    assert resumed.width == W
    kept: dict[int, str] = {}
    resumed.on_kept = lambda df, b: kept.update(
        {r["doc_id"]: r["text"] for r in df.collect()}
    )
    resumed.process_batch(_df(spark, b2), 1)
    # C was accepted in b1 BEFORE the save -> the resumed gate cuts it
    assert kept == {200: D}

    import pytest

    with pytest.raises(ValueError):
        StreamingSegmentDedup.from_index_path(spark, str(tmp_path / "idx"), width=5)
