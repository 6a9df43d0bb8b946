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
