"""Streaming SCD2 maintenance (streaming/scd2.py): after any number of
micro-batches, the incrementally-maintained state must EQUAL q154
recomputed over the union of all events — refresh == recompute."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from ml_with_spark_streaming_spark.plans.analytics import q154_scd2_history
from ml_with_spark_streaming_spark.streaming.scd2 import StreamingScd2

_EV_SCHEMA = (
    "event_id: long, ts: timestamp, user_id: long, event_type: string, "
    "value: double, props: string"
)


def _t(m: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, m, 0)


def _batches():
    """Three per-key append-ordered micro-batches covering: plain
    upserts, delete-closes-history, re-create after delete, user new
    in a later batch, delete of a never-seen user (no-op)."""
    b0 = [
        (0, _t(0), 1, "view", 1.00, "{}"),
        (1, _t(1), 2, "view", 2.00, "{}"),
        (2, _t(2), 1, "click", 1.50, "{}"),
    ]
    b1 = [
        (3, _t(3), 1, "error", 0.0, "{}"),   # delete user 1
        (4, _t(4), 2, "purchase", 2.50, "{}"),
        (5, _t(5), 3, "view", 3.00, "{}"),   # new user mid-stream
        (6, _t(6), 9, "error", 0.0, "{}"),   # delete of unseen user: no-op
    ]
    b2 = [
        (7, _t(7), 1, "view", 1.75, "{}"),   # user 1 re-created after delete
        (8, _t(8), 3, "error", 0.0, "{}"),   # user 3 deleted at the end
        (9, _t(9), 2, "click", 2.75, "{}"),
    ]
    return [b0, b1, b2]


def _rows(df):
    return sorted(
        (
            r.user_id,
            r.version,
            r.value_cents,
            r.valid_from_us,
            r.valid_to_us,
            r.is_current,
        )
        for r in df.collect()
    )


def test_stream_state_equals_batch_recompute(spark, tmp_path):
    batches = _batches()
    m = StreamingScd2(state_dir=str(tmp_path / "state"))

    seen = []
    for bid, rows in enumerate(batches):
        seen.extend(rows)
        m.process_batch(spark.createDataFrame(rows, _EV_SCHEMA), bid)

        # write the union so q154 can recompute from scratch
        union_dir = str(tmp_path / f"union_{bid}")
        spark.createDataFrame(seen, _EV_SCHEMA).coalesce(1).write.parquet(
            os.path.join(union_dir, "events.parquet")
        )
        assert _rows(m.snapshot(spark)) == _rows(
            q154_scd2_history(spark, union_dir)
        ), f"state diverged from batch recompute after batch {bid}"

    assert [h["n_changes"] for h in m.history] == [3, 4, 3]
    assert all(h["late_rows"] == 0 for h in m.history)

    # semantic spot checks on the final state
    snap = {(r.user_id, r.version): r for r in m.snapshot(spark).collect()}
    assert snap[(1, 3)].is_current == 1      # re-created after delete
    assert snap[(1, 2)].valid_to_us is not None  # closed by the delete
    assert all(r.is_current == 0 for (u, _), r in snap.items() if u == 3)
    assert 9 not in {u for (u, _) in snap}   # delete of unseen user: no row


def test_out_of_order_batch_rejected(spark, tmp_path):
    m = StreamingScd2(state_dir=str(tmp_path / "state"))
    m.process_batch(
        spark.createDataFrame([(0, _t(5), 1, "view", 1.0, "{}")], _EV_SCHEMA), 0
    )
    with pytest.raises(ValueError, match="append-ordered"):
        m.process_batch(
            spark.createDataFrame([(1, _t(1), 1, "click", 2.0, "{}")], _EV_SCHEMA), 1
        )
    assert m.history[-1]["late_rows"] == 1


def test_state_survives_maintainer_restart(spark, tmp_path):
    """A NEW maintainer over the same state_dir continues where the
    old one stopped (the parquet state table IS the checkpoint)."""
    batches = _batches()
    state = str(tmp_path / "state")

    m1 = StreamingScd2(state_dir=state)
    m1.process_batch(spark.createDataFrame(batches[0], _EV_SCHEMA), 0)
    del m1

    m2 = StreamingScd2(state_dir=state)  # fresh instance, no history
    for bid, rows in enumerate(batches[1:], start=1):
        m2.process_batch(spark.createDataFrame(rows, _EV_SCHEMA), bid)

    import os

    union_dir = str(tmp_path / "union")
    spark.createDataFrame(
        [r for b in batches for r in b], _EV_SCHEMA
    ).coalesce(1).write.parquet(os.path.join(union_dir, "events.parquet"))
    assert _rows(m2.snapshot(spark)) == _rows(q154_scd2_history(spark, union_dir))


def test_restart_with_different_buckets_adopts_persisted_layout(spark, tmp_path):
    """The bucketing width belongs to the PERSISTED layout: a restart
    configured with a different ``buckets`` must adopt the committed
    value, not hash entities into buckets the stored files don't use
    (which would silently miss their open rows and fork history)."""
    batches = _batches()
    state = str(tmp_path / "state")

    m1 = StreamingScd2(state_dir=state, buckets=4)
    m1.process_batch(spark.createDataFrame(batches[0], _EV_SCHEMA), 0)
    del m1

    m2 = StreamingScd2(state_dir=state, buckets=7)  # misconfigured restart
    for bid, rows in enumerate(batches[1:], start=1):
        m2.process_batch(spark.createDataFrame(rows, _EV_SCHEMA), bid)
    assert m2.buckets == 4  # adopted from the manifest

    union_dir = str(tmp_path / "union")
    spark.createDataFrame(
        [r for b in batches for r in b], _EV_SCHEMA
    ).coalesce(1).write.parquet(os.path.join(union_dir, "events.parquet"))
    assert _rows(m2.snapshot(spark)) == _rows(q154_scd2_history(spark, union_dir))


def test_vacuum_handles_nine_digit_batch_ids(spark, tmp_path):
    """``v{batch_id:08d}`` widens past 8 digits; the vacuum pattern
    must widen with it or superseded version dirs leak forever."""
    state = str(tmp_path / "state")
    m = StreamingScd2(state_dir=state)
    m.process_batch(
        spark.createDataFrame([(0, _t(0), 1, "view", 1.0, "{}")], _EV_SCHEMA),
        100_000_000,
    )
    assert os.path.isdir(os.path.join(state, "v100000000"))
    m.process_batch(
        spark.createDataFrame([(1, _t(1), 1, "click", 2.0, "{}")], _EV_SCHEMA),
        100_000_001,
    )
    # the superseded 9-digit dir was vacuumed, the live one remains
    assert not os.path.isdir(os.path.join(state, "v100000000"))
    assert os.path.isdir(os.path.join(state, "v100000001"))
    assert len(m.snapshot(spark).collect()) == 2  # history intact


def _bucket_of(spark, user_id: int, buckets: int) -> int:
    return spark.sql(
        f"SELECT pmod(hash(CAST({user_id} AS BIGINT)), {buckets})"
    ).collect()[0][0]


def _state_files(state_dir: str):
    """(relpath -> mtime_ns) of every parquet data file under every
    version dir currently on disk."""
    out = {}
    for root, _dirs, files in os.walk(state_dir):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                out[os.path.relpath(p, state_dir)] = os.stat(p).st_mtime_ns
    return out


def test_bucketed_state_touches_only_affected_buckets(spark, tmp_path):
    """Production shape: state hash-bucketed by entity key; a batch
    rewrites ONLY its affected buckets — untouched buckets' parquet
    files keep their paths and mtimes; state still equals the q154
    recompute; a restart from the bucketed state continues cleanly."""
    B = 8
    state = str(tmp_path / "state")
    m = StreamingScd2(state_dir=state, buckets=B)

    b0 = [
        (0, _t(0), 1, "view", 1.00, "{}"),
        (1, _t(1), 2, "view", 2.00, "{}"),
        (2, _t(2), 1, "click", 1.50, "{}"),
    ]
    m.process_batch(spark.createDataFrame(b0, _EV_SCHEMA), 0)
    before = _state_files(state)
    assert before, "batch 0 wrote no state files"

    # pick a user whose bucket differs from users 1 and 2
    used = {_bucket_of(spark, u, B) for u in (1, 2)}
    newbie = next(u for u in range(3, 200) if _bucket_of(spark, u, B) not in used)
    b1 = [(3, _t(3), newbie, "view", 9.00, "{}")]
    m.process_batch(spark.createDataFrame(b1, _EV_SCHEMA), 1)

    after = _state_files(state)
    # every file of batch 0's buckets survives byte-untouched
    for rel, mt in before.items():
        assert rel in after and after[rel] == mt, (
            f"untouched bucket file rewritten: {rel}"
        )
    assert len(after) > len(before)  # the new bucket's files were added

    # invariant: bucketed state == q154 recompute over all events
    union_dir = str(tmp_path / "union")
    spark.createDataFrame(b0 + b1, _EV_SCHEMA).coalesce(1).write.parquet(
        os.path.join(union_dir, "events.parquet")
    )
    assert _rows(m.snapshot(spark)) == _rows(q154_scd2_history(spark, union_dir))

    # restart from the bucketed state: fresh maintainer, same dir
    m2 = StreamingScd2(state_dir=state, buckets=B)
    b2 = [(4, _t(4), 1, "error", 0.0, "{}"), (5, _t(5), newbie, "click", 9.5, "{}")]
    m2.process_batch(spark.createDataFrame(b2, _EV_SCHEMA), 2)
    union2 = str(tmp_path / "union2")
    spark.createDataFrame(b0 + b1 + b2, _EV_SCHEMA).coalesce(1).write.parquet(
        os.path.join(union2, "events.parquet")
    )
    assert _rows(m2.snapshot(spark)) == _rows(q154_scd2_history(spark, union2))


def test_replayed_batch_is_a_noop(spark, tmp_path):
    """foreachBatch is at-least-once: redelivering an already-applied
    batch_id must NOT double-apply (no zero-width intervals, no extra
    versions) — the manifest's last_batch_id gates it."""
    m = StreamingScd2(state_dir=str(tmp_path / "state"))
    b0 = [(0, _t(0), 1, "view", 1.0, "{}"), (1, _t(1), 1, "click", 1.5, "{}")]
    df = spark.createDataFrame(b0, _EV_SCHEMA)
    m.process_batch(df, 0)
    want = _rows(m.snapshot(spark))

    m.process_batch(df, 0)  # redelivery of the SAME batch
    assert _rows(m.snapshot(spark)) == want
    assert m.history[-1].get("skipped") is True
    assert m.last_applied_batch_id == 0

    # a restarted maintainer honors the persisted high-water mark too
    m2 = StreamingScd2(state_dir=str(tmp_path / "state"))
    m2.process_batch(df, 0)
    assert _rows(m2.snapshot(spark)) == want
    assert m2.history[-1].get("skipped") is True


def test_late_change_for_deleted_entity_rejected(spark, tmp_path):
    """The ordering guard covers entities whose history is fully
    CLOSED: a change earlier than the delete instant must be rejected,
    not appended as a bogus new current version."""
    m = StreamingScd2(state_dir=str(tmp_path / "state"))
    m.process_batch(
        spark.createDataFrame(
            [(0, _t(0), 1, "view", 1.0, "{}"), (1, _t(5), 1, "error", 0.0, "{}")],
            _EV_SCHEMA,
        ),
        0,
    )
    # user 1 is now fully closed (deleted at t5); a change at t3 is late
    with pytest.raises(ValueError, match="append-ordered"):
        m.process_batch(
            spark.createDataFrame([(2, _t(3), 1, "view", 2.0, "{}")], _EV_SCHEMA), 1
        )
    assert m.history[-1]["late_rows"] == 1
    # a change AT/after the delete instant is legal (re-create)
    m.process_batch(
        spark.createDataFrame([(3, _t(6), 1, "view", 2.0, "{}")], _EV_SCHEMA), 2
    )
    snap = {(r.user_id, r.version): r for r in m.snapshot(spark).collect()}
    assert snap[(1, 2)].is_current == 1


def test_crash_before_manifest_commit_is_recoverable(spark, tmp_path):
    """Crash safety: a version dir written without its manifest commit
    (crash between the parquet write and os.replace) leaves the old
    state live; replaying the batch overwrites the orphan and lands
    the correct state."""
    state = str(tmp_path / "state")
    m = StreamingScd2(state_dir=state)
    b0 = [(0, _t(0), 1, "view", 1.0, "{}")]
    m.process_batch(spark.createDataFrame(b0, _EV_SCHEMA), 0)
    want0 = _rows(m.snapshot(spark))

    # simulate the crash: batch 1's version dir exists, manifest doesn't
    # know about it (write the orphan exactly where batch 1 would)
    orphan = os.path.join(state, "v00000001")
    os.makedirs(os.path.join(orphan, "bucket=0"), exist_ok=True)
    with open(os.path.join(orphan, "bucket=0", "part-garbage.parquet"), "wb") as fh:
        fh.write(b"not parquet")
    assert _rows(m.snapshot(spark)) == want0  # old state still live

    m2 = StreamingScd2(state_dir=state)  # "restart"
    b1 = [(1, _t(1), 1, "click", 1.5, "{}")]
    m2.process_batch(spark.createDataFrame(b1, _EV_SCHEMA), 1)
    union_dir = str(tmp_path / "union")
    spark.createDataFrame(b0 + b1, _EV_SCHEMA).coalesce(1).write.parquet(
        os.path.join(union_dir, "events.parquet")
    )
    assert _rows(m2.snapshot(spark)) == _rows(q154_scd2_history(spark, union_dir))


def test_temporal_enricher_matches_q163(spark, tmp_path):
    """Enriching fact batches against the MAINTAINED history equals
    q163 recomputed over the full changelog (the state invariant
    carries through the interval join)."""
    import os

    from ml_with_spark_streaming_spark.plans.analytics import q163_scd2_temporal_join
    from ml_with_spark_streaming_spark.streaming.scd2 import StreamingTemporalEnricher

    batches = _batches()
    m = StreamingScd2(state_dir=str(tmp_path / "state"))
    for bid, rows in enumerate(batches):
        m.process_batch(spark.createDataFrame(rows, _EV_SCHEMA), bid)

    enr = StreamingTemporalEnricher(scd2=m)
    got = {}
    enr.on_enriched = lambda df, bid: got.update(
        {r.event_id: (r.user_id, r.version, r.state_cents) for r in df.collect()}
    )
    # facts = the purchase events of the same changelog, in two batches
    all_rows = [r for b in batches for r in b]
    purchases = [r for r in all_rows if r[3] == "purchase"]
    enr.process_batch(spark.createDataFrame(purchases[:1], _EV_SCHEMA), 0)
    enr.process_batch(spark.createDataFrame(purchases[1:], _EV_SCHEMA), 1)

    union_dir = str(tmp_path / "union")
    spark.createDataFrame(all_rows, _EV_SCHEMA).coalesce(1).write.parquet(
        os.path.join(union_dir, "events.parquet")
    )
    want = {
        r.event_id: (r.user_id, r.version, r.state_cents)
        for r in q163_scd2_temporal_join(spark, union_dir).collect()
    }
    assert got == want
    assert [h["n_facts"] for h in enr.history] == [1, len(purchases) - 1]
