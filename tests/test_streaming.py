"""Structured Streaming: file-source micro-batch replay through the
training loop, watermarked windows, and the custom stateful operator.
Memory sink + processAllAvailable per SURVEY.md §5."""

from __future__ import annotations

import json
import random

import pytest
from pyspark.sql import functions as F

from ml_with_spark_streaming_spark.ml import IncrementalBernoulliNB, ModelRegistry
from ml_with_spark_streaming_spark.streaming.train import StreamingTrainer
from ml_with_spark_streaming_spark.streaming.windows import (
    running_user_totals,
    tumbling_counts,
)

POS = ["good", "great", "love", "happy", "awesome"]
NEG = ["bad", "terrible", "hate", "sad", "awful"]


def _wire_files(tmp_path, n_files=3, per_file=60, seed=3):
    rnd = random.Random(seed)
    d = tmp_path / "stream_in"
    d.mkdir()
    for fi in range(n_files):
        recs = []
        for i in range(per_file):
            lab = "4" if i % 2 else "0"
            words = " ".join((POS if lab == "4" else NEG)[rnd.randrange(5)] for _ in range(4))
            recs.append(f"{lab},{words}")
        (d / f"batch_{fi}.json").write_text(json.dumps(recs) + "\n")
    return str(d)


def test_streaming_training_loop(spark, tmp_path):
    path = _wire_files(tmp_path)
    reg = ModelRegistry(str(tmp_path / "models"))
    trainer = StreamingTrainer(
        model=IncrementalBernoulliNB(), registry=reg, key="nb_stream", stem=False
    )
    lines = (
        spark.readStream.format("text").option("maxFilesPerTrigger", 1).load(path)
    )
    q = trainer.attach(lines, trigger_seconds=1, checkpoint=str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert len(trainer.history) == 3  # one per file = one per micro-batch
    assert all(h["batchsize"] > 0 for h in trainer.history)
    # fully-separable vocabulary → the model is perfect by the last batch
    assert trainer.history[-1]["f1"] == 1.0
    # S8: per-batch checkpoint and best snapshot both exist and load
    assert reg.load("nb_stream") is not None
    assert reg.load("nb_stream", best=True) is not None
    # S6: metrics CSV appended one row per batch (+header)
    stats = (tmp_path / "models" / "nb_stream_stats.csv").read_text().strip().splitlines()
    assert len(stats) == 4


def test_empty_batch_guard(spark, tmp_path):
    reg = ModelRegistry(str(tmp_path / "m2"))
    trainer = StreamingTrainer(model=IncrementalBernoulliNB(), registry=reg, key="nb_empty")
    empty = spark.createDataFrame([], "value string")
    trainer.process_batch(empty, 0)  # must not raise (reference crashed + swallowed)
    assert trainer.history == []


@pytest.fixture(scope="module")
def event_stream_dir(spark, tmp_path_factory):
    """Events as JSON files for streaming replay (2 files = 2 batches)."""
    d = tmp_path_factory.mktemp("events_in")
    rows = [
        # user 1: two sessions' worth across one hour; user 2: crosses alert threshold
        (0, "2024-01-01 00:01:00", 1, "click", 10.0),
        (1, "2024-01-01 00:02:00", 1, "view", 20.0),
        (2, "2024-01-01 00:30:00", 2, "click", 600.0),
        (3, "2024-01-01 01:10:00", 1, "click", 5.0),
        (4, "2024-01-01 01:20:00", 2, "buy", 700.0),
        (5, "2024-01-01 01:40:00", 2, "view", 1.0),
    ]
    half = len(rows) // 2
    for fi, chunk in enumerate((rows[:half], rows[half:])):
        lines = "\n".join(
            json.dumps(
                {"event_id": e, "ts": ts, "user_id": u, "event_type": t, "value": v}
            )
            for e, ts, u, t, v in chunk
        )
        (d / f"ev_{fi}.jsonl").write_text(lines + "\n")
    return str(d)


def _read_event_stream(spark, path):
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(path)
    )


def test_streaming_tumbling_counts_match_batch(spark, event_stream_dir):
    stream = tumbling_counts(_read_event_stream(spark, event_stream_dir), minutes=60)
    q = (
        stream.writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (str(r["window_start"]), r["event_type"]): (r["n"], r["sum_value"])
            for r in spark.sql("select * from tumbling_test").collect()
        }
    finally:
        q.stop()
    batch_df = spark.read.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).json(event_stream_dir)
    want = {
        (str(r["window_start"]), r["event_type"]): (r["n"], r["sum_value"])
        for r in tumbling_counts(batch_df, minutes=60).collect()
    }
    assert got == want


def test_stateful_running_totals_final_state_matches_batch(spark, event_stream_dir):
    stream = running_user_totals(_read_event_stream(spark, event_stream_dir))
    q = (
        stream.writeStream.format("memory")
        .queryName("totals_test")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("select * from totals_test").collect()
    finally:
        q.stop()
    # last emission per user == plain batch aggregate (q63 twin)
    final = {}
    for r in rows:  # memory sink appends per batch, later rows win
        final[r["user_id"]] = (r["total"], r["n"], r["alert"])
    batch_df = spark.read.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).json(event_stream_dir)
    want = {
        r["user_id"]: (r["total"], r["n"], r["alert"])
        for r in batch_df.groupBy("user_id")
        .agg(
            F.round(F.sum("value"), 2).alias("total"),
            F.count("*").alias("n"),
            (F.sum("value") > 1000.0).alias("alert"),
        )
        .collect()
    }
    assert final == want
    assert final[2][2] is True  # user 2 crossed the 1000 threshold


def test_throughput_exceeds_reference_ceiling(spark, tmp_path):
    """BASELINE.md: the only reference-derived perf obligation — the
    DStream design capped at 600 records/s (3000 rec / 5 s batch on
    local[2]); the engine must beat it on ingest+featurize+train."""
    import time

    n_files, per_file = 2, 5000
    path = _wire_files(tmp_path, n_files=n_files, per_file=per_file, seed=11)
    reg = ModelRegistry(str(tmp_path / "models_tp"))
    trainer = StreamingTrainer(
        model=IncrementalBernoulliNB(), registry=reg, key="nb_tp", stem=False
    )
    lines = spark.readStream.format("text").option("maxFilesPerTrigger", 1).load(path)
    t0 = time.monotonic()
    q = trainer.attach(lines, trigger_seconds=1, checkpoint=str(tmp_path / "ckpt_tp"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    wall = time.monotonic() - t0
    rate = n_files * per_file / wall
    assert len(trainer.history) == n_files
    assert rate > 600, f"{rate:.0f} rec/s <= reference ceiling (600)"


def test_socket_source_end_to_end(spark):
    """S1 parity: a real TCP server feeding the socket source through
    the wire parser to a memory sink."""
    import socket
    import threading
    import time

    server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    server.bind(("127.0.0.1", 0))
    server.listen(1)
    port = server.getsockname()[1]
    payload = json.dumps(["4,streamed positive", "0,streamed negative"]) + "\n"

    def serve():
        conn, _ = server.accept()
        try:
            conn.sendall(payload.encode())
            time.sleep(8)  # keep the connection up while Spark polls
        finally:
            conn.close()

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    from ml_with_spark_streaming_spark.streaming.sources import socket_stream
    from ml_with_spark_streaming_spark.streaming.wire import parse_wire

    parsed = parse_wire(socket_stream(spark, "127.0.0.1", port))
    q = (
        parsed.writeStream.format("memory")
        .queryName("sock_test")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline:
            if spark.sql("select * from sock_test").count() >= 2:
                break
            time.sleep(0.5)
        rows = {
            (r["label"], r["tweet"]) for r in spark.sql("select * from sock_test").collect()
        }
        assert ("4", "streamed positive") in rows
        assert ("0", "streamed negative") in rows
    finally:
        q.stop()
        server.close()


def test_watermark_drops_late_events(spark, tmp_path):
    """Late-data semantics (SURVEY.md §5): a row arriving AFTER its
    window was finalized and evicted must be dropped. (Spark's
    guarantee is eviction-relative: a late row landing in the same
    batch that finalizes the window is still included — that is the
    watermark delay working as designed.)"""
    d = tmp_path / "late_in"
    d.mkdir()
    batches = [
        [
            {"event_id": 0, "ts": "2024-01-01 10:00:00", "user_id": 1, "event_type": "click", "value": 1.0},
            {"event_id": 1, "ts": "2024-01-01 10:30:00", "user_id": 1, "event_type": "click", "value": 1.0},
            # sentinel: advances the watermark to 11:50 (> 11:00)
            {"event_id": 2, "ts": "2024-01-01 12:00:00", "user_id": 9, "event_type": "view", "value": 1.0},
        ],
        [
            # batch 2 runs with watermark 11:50 → finalizes + evicts the
            # [10:00, 11:00) window at its end
            {"event_id": 3, "ts": "2024-01-01 12:05:00", "user_id": 9, "event_type": "view", "value": 1.0},
        ],
        [
            # LATE: arrives after eviction — must be dropped, not
            # resurrect the closed window
            {"event_id": 4, "ts": "2024-01-01 10:45:00", "user_id": 1, "event_type": "click", "value": 1.0},
            {"event_id": 5, "ts": "2024-01-01 12:10:00", "user_id": 9, "event_type": "view", "value": 1.0},
        ],
    ]
    import os
    import time as _time

    now = _time.time()
    for i, batch in enumerate(batches):
        p = d / f"b{i}.jsonl"
        p.write_text("\n".join(json.dumps(r) for r in batch) + "\n")
        # FileStreamSource orders files by mtime — make the ordering
        # explicit or the "late" file can land in an earlier batch
        os.utime(p, (now + i * 10, now + i * 10))

    stream = tumbling_counts(_read_event_stream(spark, str(d)), minutes=60, watermark="10 minutes")
    q = (
        stream.writeStream.format("memory")
        .queryName("late_test")
        .outputMode("append")  # append only emits CLOSED windows
        .start()
    )
    try:
        q.processAllAvailable()
        rows = [
            (str(r["window_start"]), r["event_type"], r["n"])
            for r in spark.sql("select * from late_test").collect()
            if r["event_type"] == "click"
        ]
    finally:
        q.stop()
    # exactly one emission for the click window, with only on-time rows
    assert rows == [("2024-01-01 10:00:00", "click", 2)]


def test_scorer_replays_frozen_model(spark, tmp_path):
    """Entry point C: train via the streaming loop, freeze the best
    checkpoint, score a replay with a fresh model object."""
    from ml_with_spark_streaming_spark.streaming.score import StreamingScorer

    path = _wire_files(tmp_path, n_files=2, per_file=80, seed=21)
    reg = ModelRegistry(str(tmp_path / "models_sc"))
    trainer = StreamingTrainer(
        model=IncrementalBernoulliNB(), registry=reg, key="nb_sc", stem=False
    )
    lines = spark.readStream.format("text").option("maxFilesPerTrigger", 1).load(path)
    q = trainer.attach(lines, trigger_seconds=1, checkpoint=str(tmp_path / "ck_sc"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    scorer = StreamingScorer.from_registry(
        IncrementalBernoulliNB(), reg, "nb_sc", best=True, stem=False
    )
    lines2 = spark.readStream.format("text").option("maxFilesPerTrigger", 1).load(path)
    q2 = scorer.attach(lines2, trigger_seconds=1)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert len(scorer.history) == 2
    # the frozen model scores the (fully separable) replay perfectly
    assert all(h["f1"] == 1.0 for h in scorer.history)


def test_streaming_session_windows_close_and_match_batch(spark, tmp_path):
    """Session windows in append mode: sessions finalized by the
    watermark must equal the batch twin's rows for the same span."""
    from ml_with_spark_streaming_spark.streaming.windows import session_windows

    d = tmp_path / "sess_in"
    d.mkdir()
    batches = [
        [
            # user 1: two sessions separated by a >5min gap
            {"event_id": 0, "ts": "2024-01-01 10:00:00", "user_id": 1, "event_type": "click", "value": 1.0},
            {"event_id": 1, "ts": "2024-01-01 10:02:00", "user_id": 1, "event_type": "click", "value": 2.0},
            {"event_id": 2, "ts": "2024-01-01 10:20:00", "user_id": 1, "event_type": "click", "value": 3.0},
        ],
        [
            # sentinel advances watermark far past both sessions
            {"event_id": 3, "ts": "2024-01-01 12:00:00", "user_id": 9, "event_type": "view", "value": 0.0},
        ],
        [
            {"event_id": 4, "ts": "2024-01-01 12:05:00", "user_id": 9, "event_type": "view", "value": 0.0},
        ],
    ]
    import os
    import time as _time

    now = _time.time()
    for i, batch in enumerate(batches):
        p = d / f"b{i}.jsonl"
        p.write_text("\n".join(json.dumps(r) for r in batch) + "\n")
        os.utime(p, (now + i * 10, now + i * 10))

    stream = session_windows(_read_event_stream(spark, str(d)), gap_minutes=5)
    q = (
        stream.writeStream.format("memory")
        .queryName("sess_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (str(r["session_start"]), r["user_id"]): (r["n_events"], r["sum_value"])
            for r in spark.sql("select * from sess_test where user_id = 1").collect()
        }
    finally:
        q.stop()
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    batch_df = spark.read.schema(schema).json(str(d))
    want = {
        (str(r["session_start"]), r["user_id"]): (r["n_events"], r["sum_value"])
        for r in session_windows(batch_df, gap_minutes=5).filter(F.col("user_id") == 1).collect()
    }
    # both of user 1's sessions were closed by the watermark and match batch
    assert got == want
    assert len(got) == 2


def _write_mtime_ordered(d, batches):
    """Write one jsonl file per batch with strictly increasing mtimes
    (FileStreamSource orders batches by mtime)."""
    import os
    import time as _time

    d.mkdir(exist_ok=True)
    now = _time.time()
    paths = []
    for i, batch in enumerate(batches):
        p = d / f"b{i}.jsonl"
        p.write_text("\n".join(json.dumps(r) for r in batch) + "\n")
        os.utime(p, (now + i * 10, now + i * 10))
        paths.append(p)
    return paths


def _ev(eid, ts, uid, etype, value):
    return {"event_id": eid, "ts": ts, "user_id": uid, "event_type": etype, "value": value}


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Watermarked stream-stream interval join: replaying both sides
    through file sources yields exactly the batch join's rows."""
    from ml_with_spark_streaming_spark.streaming.joins import interval_join

    clicks = [
        [_ev(0, "2024-01-01 10:00:00", 1, "click", 1.0),
         _ev(1, "2024-01-01 10:10:00", 2, "click", 1.0)],
        [_ev(2, "2024-01-01 11:00:00", 1, "click", 1.0)],
    ]
    purchases = [
        [_ev(10, "2024-01-01 10:05:00", 1, "purchase", 50.0),   # joins click 0
         _ev(11, "2024-01-01 10:45:00", 2, "purchase", 60.0)],  # > 30 min after click 1: no
        [_ev(12, "2024-01-01 11:20:00", 1, "purchase", 70.0),   # joins click 2
         _ev(13, "2024-01-01 12:00:00", 3, "purchase", 80.0)],  # no click: no
    ]
    cd, pd_ = tmp_path / "clicks", tmp_path / "purch"
    _write_mtime_ordered(cd, clicks)
    _write_mtime_ordered(pd_, purchases)

    joined = interval_join(
        _read_event_stream(spark, str(cd)), _read_event_stream(spark, str(pd_))
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["l_event_id"], r["r_event_id"])
            for r in spark.sql("select * from ssj_test").collect()
        }
    finally:
        q.stop()
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    want = {
        (r["l_event_id"], r["r_event_id"])
        for r in interval_join(
            spark.read.schema(schema).json(str(cd)),
            spark.read.schema(schema).json(str(pd_)),
        ).collect()
    }
    assert got == want == {(0, 10), (2, 12)}


def test_streaming_dedup_suppresses_cross_batch_duplicates(spark, tmp_path):
    """dropDuplicatesWithinWatermark: a duplicate event_id replayed in
    a LATER micro-batch (inside the watermark horizon) is suppressed."""
    from ml_with_spark_streaming_spark.streaming.joins import dedup_within_watermark

    batches = [
        [_ev(0, "2024-01-01 10:00:00", 1, "click", 1.0),
         _ev(1, "2024-01-01 10:01:00", 1, "view", 2.0)],
        [_ev(1, "2024-01-01 10:01:00", 1, "view", 2.0),   # exact replay of id 1
         _ev(2, "2024-01-01 10:02:00", 2, "click", 3.0)],
        [_ev(0, "2024-01-01 10:00:00", 1, "click", 1.0),  # replay of id 0
         _ev(3, "2024-01-01 10:03:00", 2, "view", 4.0)],
    ]
    d = tmp_path / "dup_in"
    _write_mtime_ordered(d, batches)
    ded = dedup_within_watermark(_read_event_stream(spark, str(d)))
    q = (
        ded.writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        ids = [r["event_id"] for r in spark.sql("select * from dedup_test").collect()]
    finally:
        q.stop()
    assert sorted(ids) == [0, 1, 2, 3]  # each exactly once


def test_checkpoint_recovery_exactly_once(spark, tmp_path):
    """Kill + restart from checkpoint: the restarted query resumes the
    watermark/window state and the file sink stays exactly-once — no
    closed window is re-emitted, none is lost (the reference's
    filesystem-pickle 'recovery' replays whole batches)."""
    from ml_with_spark_streaming_spark.streaming.windows import tumbling_counts

    d = tmp_path / "ckpt_in"
    out = str(tmp_path / "ckpt_out")
    ck = str(tmp_path / "ckpt_state")
    phase1 = [
        [_ev(0, "2024-01-01 10:00:00", 1, "click", 1.0),
         _ev(1, "2024-01-01 10:30:00", 1, "click", 1.0)],
        # advances watermark to 11:50 → next batch closes [10:00, 11:00)
        [_ev(2, "2024-01-01 12:00:00", 9, "view", 1.0)],
        [_ev(3, "2024-01-01 12:05:00", 9, "view", 1.0)],
    ]
    paths1 = _write_mtime_ordered(d, phase1)

    def run():
        stream = tumbling_counts(_read_event_stream(spark, str(d)), minutes=60)
        return (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .start()
        )

    q = run()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # phase 2: more files appear after the "crash"; restart from ckpt
    import os
    import time as _time

    base = _time.time() + 1000
    phase2 = [
        [_ev(4, "2024-01-01 14:00:00", 9, "view", 1.0)],  # closes the 12:00 window
        [_ev(5, "2024-01-01 16:00:00", 9, "view", 1.0)],  # closes the 14:00 window
    ]
    for i, batch in enumerate(phase2):
        p = d / f"c{i}.jsonl"
        p.write_text("\n".join(json.dumps(r) for r in batch) + "\n")
        os.utime(p, (base + i * 10, base + i * 10))

    q2 = run()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    rows = spark.read.parquet(out).collect()
    emitted = sorted((str(r["window_start"]), r["event_type"], r["n"]) for r in rows)
    # every closed window exactly once, across the restart boundary
    assert emitted == [
        ("2024-01-01 10:00:00", "click", 2),
        ("2024-01-01 12:00:00", "view", 2),
        ("2024-01-01 14:00:00", "view", 1),
    ]
    assert len(paths1) == 3


def test_stream_static_enrichment_join(spark, tmp_path):
    """Stream-static join: each micro-batch joins against a static dim
    table (broadcast — no stream-side state, re-planned per batch)."""
    users = spark.createDataFrame(
        [(1, "basic"), (2, "premium"), (9, "internal")], "user_id long, tier string"
    )
    batches = [
        [_ev(0, "2024-01-01 10:00:00", 1, "click", 1.0),
         _ev(1, "2024-01-01 10:01:00", 2, "buy", 9.0)],
        [_ev(2, "2024-01-01 10:02:00", 3, "click", 1.0)],  # unknown user
    ]
    d = tmp_path / "enrich_in"
    _write_mtime_ordered(d, batches)
    stream = _read_event_stream(spark, str(d))
    enriched = stream.join(F.broadcast(users), "user_id", "left_outer").select(
        "event_id", "user_id", F.coalesce("tier", F.lit("unknown")).alias("tier")
    )
    q = (
        enriched.writeStream.format("memory")
        .queryName("enrich_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["event_id"]: r["tier"] for r in spark.sql("select * from enrich_test").collect()
        }
    finally:
        q.stop()
    assert got == {0: "basic", 1: "premium", 2: "unknown"}


def test_available_now_trigger_processes_all_then_terminates(spark, tmp_path):
    """availableNow: the query drains every pending file in bounded
    micro-batches and stops on its own (no manual stop) — the backfill
    mode; the trained model matches the continuous-trigger result."""
    path = _wire_files(tmp_path, n_files=3, per_file=60, seed=3)
    reg = ModelRegistry(str(tmp_path / "models_an"))
    trainer = StreamingTrainer(
        model=IncrementalBernoulliNB(), registry=reg, key="nb_an", stem=False
    )
    lines = spark.readStream.format("text").option("maxFilesPerTrigger", 1).load(path)
    q = trainer.attach(lines, checkpoint=str(tmp_path / "ck_an"), available_now=True)
    assert q.awaitTermination(120)  # terminates by itself
    assert len(trainer.history) == 3
    assert trainer.history[-1]["f1"] == 1.0


@pytest.mark.slow
def test_stream_stream_left_outer_join_emits_unmatched_after_watermark(spark, tmp_path):
    """Left-outer stream-stream join: a click with no purchase inside
    its 30-min bound emits (click, null) — but only once the watermark
    proves no matching purchase can still arrive."""
    from ml_with_spark_streaming_spark.streaming.joins import interval_join

    clicks = [
        [_ev(0, "2024-01-01 10:00:00", 1, "click", 1.0),   # will match
         _ev(1, "2024-01-01 10:10:00", 2, "click", 1.0)],  # never matches
        # left-side sentinels: the GLOBAL watermark is the min over
        # both inputs, so the left stream must advance too before
        # click 1's join window is provably closed
        [_ev(2, "2024-01-01 13:00:00", 8, "click", 1.0)],
        [_ev(3, "2024-01-01 13:10:00", 8, "click", 1.0)],
    ]
    purchases = [
        [_ev(10, "2024-01-01 10:05:00", 1, "purchase", 50.0)],
        [_ev(11, "2024-01-01 13:00:00", 9, "purchase", 1.0)],
        [_ev(12, "2024-01-01 13:10:00", 9, "purchase", 1.0)],
    ]
    cd, pd_ = tmp_path / "lo_clicks", tmp_path / "lo_purch"
    _write_mtime_ordered(cd, clicks)
    _write_mtime_ordered(pd_, purchases)

    joined = interval_join(
        _read_event_stream(spark, str(cd)),
        _read_event_stream(spark, str(pd_)),
        how="left_outer",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_outer_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["l_event_id"], r["r_event_id"])
            for r in spark.sql("select * from ssj_outer_test").collect()
        }
    finally:
        q.stop()
    assert (0, 10) in got          # matched pair
    assert (1, None) in got        # unmatched left row emitted with nulls
    assert len({p for p in got if p[0] == 1}) == 1  # exactly once


def test_fixture_gauntlet_full_edge_case_batch(spark, tmp_path):
    """FIXTURES.md §1: every required edge-case row through the full
    wire-parse → clean → featurize → train → metrics path in ONE batch —
    nothing crashes, malformed rows are quarantined and counted, and
    every parseable row lands in the batch size."""
    records = [
        "4,@user #tag &amp loves http://x.co THIS, really",  # mentions/urls/case/comma
        "0,bad day 123 !!! émoji \t  spaced",            # digits/punct/non-ascii/ws
        "4,the and of",                                       # stop-words only
        "0,@only #tags http://u.rl 42",                       # empty after cleaning
        "4,running runs run runner",                          # shared stems
        "no comma at all",                                    # malformed record
    ]
    payload = json.dumps(records)
    d = tmp_path / "gauntlet_in"
    d.mkdir()
    (d / "b0.json").write_text(payload + "\n" + "this line is not json\n")

    reg = ModelRegistry(str(tmp_path / "models_g"))
    trainer = StreamingTrainer(
        model=IncrementalBernoulliNB(), registry=reg, key="nb_g", stem=True
    )
    lines = spark.readStream.format("text").load(str(d))
    q = trainer.attach(lines, trigger_seconds=1, checkpoint=str(tmp_path / "ck_g"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert len(trainer.history) == 1
    row = trainer.history[0]
    # batchsize counts the held-out scored rows (~20% content-hash
    # split of the 5 well-formed records, incl. the stop-word-only and
    # empty-after-cleaning rows kept via the fi=-1 sentinel)
    assert 1 <= row["batchsize"] <= 5
    # 1 no-comma record + 1 non-JSON line quarantined, not dropped
    assert row["quarantined"] == 2
    stats = (tmp_path / "models_g" / "nb_g_stats.csv").read_text().splitlines()
    assert "quarantined" in stats[0] and stats[1].endswith(",2")


def test_statestore_reader_exposes_window_state(spark, tmp_path):
    """Observability: the checkpoint's state store is queryable — the
    open windows' partial aggregates are visible as rows."""
    from ml_with_spark_streaming_spark.streaming.sources import read_state
    from ml_with_spark_streaming_spark.streaming.windows import tumbling_counts

    d = tmp_path / "ss_in"
    _write_mtime_ordered(
        d,
        [[_ev(0, "2024-01-01 10:00:00", 1, "click", 1.0),
          _ev(1, "2024-01-01 10:30:00", 1, "view", 2.0)]],
    )
    ck = str(tmp_path / "ss_ck")
    stream = tumbling_counts(_read_event_stream(spark, str(d)), minutes=60)
    q = (
        stream.writeStream.format("memory")
        .queryName("ss_state_test")
        .outputMode("append")
        .option("checkpointLocation", ck)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    state = {
        (r["key"]["event_type"], r["value"]["count"], r["value"]["sum"])
        for r in read_state(spark, ck).collect()
    }
    assert state == {("click", 1, 1.0), ("view", 1, 2.0)}
