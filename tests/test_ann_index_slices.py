"""Round-10 maintainer persistence contracts:

* non-refit periodic saves are APPEND-ONLY — one O(batch) slice dir
  per save, the base artifact and every prior slice byte-untouched
  (mtime-pinned), and a slice-laden manifest resumes to exactly the
  uninterrupted state;
* ``save()`` with nothing new since the last commit is a NO-OP — the
  live version dir is what the in-memory index reads from, so the old
  rewrite-in-place was a read-your-own-overwrite crash (double
  ``save_state``, or ``save_state`` right after ``from_state``);
* the replay guard is scoped to ONE stream checkpoint — ``attach``
  refuses a checkpoint that differs from the manifest's;
* a refit over an input that does not add up to the index's own row
  count (legacy resume that dropped the accepted table) RAISES instead
  of silently evicting streamed vectors.
"""

from __future__ import annotations

import json
import os
import random

import pytest

from ml_with_spark_streaming_spark.operators.ann_index import IVFIndex
from ml_with_spark_streaming_spark.operators.similarity import assign_to_centroids
from ml_with_spark_streaming_spark.streaming.ann_index_maintainer import (
    StreamingANNIndexMaintainer,
)

pytestmark = pytest.mark.slow  # multi-stream/artifact-fit module: full-suite only (SPARK_GRAFT_FULL_TESTS=1)

SCHEMA = "vec_id long, embedding array<float>"


@pytest.fixture(scope="module")
def base_and_batches(spark):
    rnd = random.Random(31)

    def vec():
        return [rnd.gauss(0, 1) for _ in range(16)]

    base = spark.createDataFrame([(i, vec()) for i in range(100)], SCHEMA)
    batches = [[(1000 + 10 * b + i, vec()) for i in range(5)] for b in range(4)]
    return base, batches


def _file_mtimes(root: str) -> dict:
    out = {}
    for r, _dirs, files in os.walk(root):
        for f in files:
            p = os.path.join(r, f)
            out[p] = os.stat(p).st_mtime_ns
    return out


def test_non_refit_save_is_append_only(spark, base_and_batches, tmp_path):
    base, batches = base_and_batches
    idx = IVFIndex.build(base, n_centroids=8, seed=42)
    path = str(tmp_path / "slices")
    m = StreamingANNIndexMaintainer(index=idx, save_path=path, save_every=1)

    m.process_batch(spark.createDataFrame(batches[0], SCHEMA), 0)  # full save v0
    m.process_batch(spark.createDataFrame(batches[1], SCHEMA), 1)  # slice s1
    with open(os.path.join(path, "MANIFEST.json"), encoding="utf-8") as fh:
        man = json.load(fh)
    assert man["version"] == "v00000000"
    assert [s["name"] for s in man["slices"]] == ["s00000001"]
    assert man["slices"][0]["n"] == 5

    before = _file_mtimes(path)
    m.process_batch(spark.createDataFrame(batches[2], SCHEMA), 2)  # slice s2
    after = _file_mtimes(path)

    # every pre-existing file except the manifest is byte-untouched:
    # the save wrote O(batch) NEW files only
    manifest = os.path.join(path, "MANIFEST.json")
    for p, t in before.items():
        if p == manifest:
            continue
        assert after.get(p) == t, f"non-refit save rewrote {p}"
    new_files = set(after) - set(before)
    assert new_files, "slice save wrote nothing"
    for p in new_files:
        assert f"slices{os.sep}s00000002" in p, f"unexpected new file {p}"

    # a slice-laden manifest resumes to the uninterrupted state
    m.process_batch(spark.createDataFrame(batches[3], SCHEMA), 3)
    r = StreamingANNIndexMaintainer.from_index_path(spark, path)
    assert r._last_batch_id == 3
    assert r.index.n_vectors == 120
    want = {(x["vec_id"], x["cent_id"]) for x in m.index.assignments.collect()}
    got = {(x["vec_id"], x["cent_id"]) for x in r.index.assignments.collect()}
    assert got == want
    # replay guard survives the slice resume
    r.process_batch(spark.createDataFrame(batches[3], SCHEMA), 3)
    assert r.history[-1]["skipped"] is True
    assert r.index.n_vectors == 120


def test_multi_batch_slice_and_resume(spark, base_and_batches, tmp_path):
    """save_every=2: one slice covers TWO batches; resume equals the
    uninterrupted run including the un-saved tail committed by an
    explicit save()."""
    base, batches = base_and_batches
    idx = IVFIndex.build(base, n_centroids=8, seed=42)
    path = str(tmp_path / "slices2")
    m = StreamingANNIndexMaintainer(index=idx, save_path=path, save_every=2)
    for bid in range(4):
        m.process_batch(spark.createDataFrame(batches[bid], SCHEMA), bid)
    with open(os.path.join(path, "MANIFEST.json"), encoding="utf-8") as fh:
        man = json.load(fh)
    # first save (batch 1) is the full v-dir; second (batch 3) a slice of 10
    assert man["version"] == "v00000001"
    assert [(s["name"], s["n"]) for s in man["slices"]] == [("s00000003", 10)]
    r = StreamingANNIndexMaintainer.from_index_path(spark, path)
    assert r.index.n_vectors == 120
    want = {(x["vec_id"], x["cent_id"]) for x in m.index.assignments.collect()}
    assert {(x["vec_id"], x["cent_id"]) for x in r.index.assignments.collect()} == want


def test_save_twice_and_save_after_resume_no_op(spark, base_and_batches, tmp_path):
    """The ADVICE crash: save() targeting the live version dir it is
    itself reading from. Now: no new state -> explicit no-op; pending
    batches -> an append slice; and the artifact stays loadable."""
    base, batches = base_and_batches
    idx = IVFIndex.build(base, n_centroids=8, seed=42)
    path = str(tmp_path / "noop")
    m = StreamingANNIndexMaintainer(index=idx, save_path=path, save_every=1)
    m.process_batch(spark.createDataFrame(batches[0], SCHEMA), 0)

    before = _file_mtimes(path)
    m.save()  # nothing new since the batch-0 save: must not touch disk
    m.save()
    assert _file_mtimes(path) == before

    # save_state immediately after from_state (the second ADVICE repro)
    r = StreamingANNIndexMaintainer.from_index_path(spark, path, save_path=path)
    r.save()
    r.save()
    assert _file_mtimes(path) == before
    assert r.index.n_vectors == 105

    # pending batches present: explicit save commits them as a slice
    r2 = StreamingANNIndexMaintainer.from_index_path(spark, path, save_path=path)
    r2.process_batch(spark.createDataFrame(batches[1], SCHEMA), 1)
    # save_every=None: nothing auto-saved yet
    assert json.load(open(os.path.join(path, "MANIFEST.json")))["last_batch_id"] == 0
    r2.save()
    man = json.load(open(os.path.join(path, "MANIFEST.json")))
    assert man["last_batch_id"] == 1
    assert [s["name"] for s in man["slices"]] == ["s00000001"]
    r3 = StreamingANNIndexMaintainer.from_index_path(spark, path)
    assert r3.index.n_vectors == 110


def test_attach_refuses_foreign_checkpoint(spark, base_and_batches, tmp_path):
    """Batch ids are scoped to the stream checkpoint: a resumed
    maintainer must not attach under a DIFFERENT checkpoint, where ids
    restart at 0 and the replay guard would swallow real batches."""
    base, batches = base_and_batches
    idx = IVFIndex.build(base, n_centroids=8, seed=42)
    path = str(tmp_path / "ckpt")
    m = StreamingANNIndexMaintainer(index=idx, save_path=path, save_every=1)
    m._stream_checkpoint = str(tmp_path / "ckpt_a")
    m.process_batch(spark.createDataFrame(batches[0], SCHEMA), 0)

    r = StreamingANNIndexMaintainer.from_index_path(spark, path)
    assert r._stream_checkpoint == str(tmp_path / "ckpt_a")
    dummy = spark.createDataFrame(batches[1], SCHEMA)
    with pytest.raises(ValueError, match="checkpoint"):
        r.attach(dummy, checkpoint=str(tmp_path / "ckpt_b"))
    with pytest.raises(ValueError, match="checkpoint"):
        r.attach(dummy, checkpoint=None)


def test_refit_refuses_incomplete_corpus(spark, base_and_batches):
    """An index holding MORE vectors than (corpus + tracked accepted) —
    the legacy-resume shape where prior appends lost their vectors —
    must raise at refit time, not silently rebuild over base-only."""
    base, batches = base_and_batches
    # simulate the legacy resume: the index already contains batch 0's
    # appends, but the maintainer's accepted tracking starts empty
    idx = IVFIndex.build(base, n_centroids=8, seed=42).append(
        spark.createDataFrame(batches[0], SCHEMA)
    )
    m = StreamingANNIndexMaintainer(
        index=idx, corpus=base, refit_skew_threshold=0.01
    )
    with pytest.raises(ValueError, match="refit input incomplete"):
        m.process_batch(spark.createDataFrame(batches[1], SCHEMA), 0)


def test_assignments_match_after_slice_resume_against_full_pass(
    spark, base_and_batches, tmp_path
):
    """Stream==batch across the slice layout: resumed assignments equal
    one full assignment pass over (base ∪ all batches)."""
    base, batches = base_and_batches
    idx = IVFIndex.build(base, n_centroids=8, seed=42)
    path = str(tmp_path / "full_pass")
    m = StreamingANNIndexMaintainer(index=idx, save_path=path, save_every=1)
    union = base
    for bid, rows in enumerate(batches):
        b = spark.createDataFrame(rows, SCHEMA)
        m.process_batch(b, bid)
        union = union.unionByName(b)
    r = StreamingANNIndexMaintainer.from_index_path(spark, path)
    want = {
        (x["vec_id"], x["cent_id"])
        for x in assign_to_centroids(union, idx.centroids).collect()
    }
    assert {
        (x["vec_id"], x["cent_id"]) for x in r.index.assignments.collect()
    } == want


def test_save_before_any_batch_does_not_swallow_batch_zero(
    spark, base_and_batches, tmp_path
):
    """Review pin: a save() with no processed batches must record
    last_batch_id=-1 (not a clamped 0) — a resumed maintainer must
    still APPLY the stream's real batch 0."""
    base, batches = base_and_batches
    idx = IVFIndex.build(base, n_centroids=8, seed=42)
    path = str(tmp_path / "pre_batch_save")
    m = StreamingANNIndexMaintainer(index=idx)
    m.save(path)
    with open(os.path.join(path, "MANIFEST.json"), encoding="utf-8") as fh:
        assert json.load(fh)["last_batch_id"] == -1
    r = StreamingANNIndexMaintainer.from_index_path(spark, path)
    assert r._last_batch_id == -1
    r.process_batch(spark.createDataFrame(batches[0], SCHEMA), 0)
    assert "skipped" not in r.history[-1]
    assert r.index.n_vectors == 105


def test_max_slices_compacts_into_a_fresh_version(
    spark, base_and_batches, tmp_path
):
    """A save that would exceed max_slices does a FULL rewrite (fresh
    version, slice list reset, superseded dir vacuumed) — the slice
    list and resume replay stay bounded on a long quiet stream."""
    base, batches = base_and_batches
    idx = IVFIndex.build(base, n_centroids=8, seed=42)
    path = str(tmp_path / "compaction")
    m = StreamingANNIndexMaintainer(
        index=idx, save_path=path, save_every=1, max_slices=2
    )
    for bid in range(4):
        m.process_batch(spark.createDataFrame(batches[bid], SCHEMA), bid)
    # batch 0: full v0; batches 1,2: slices; batch 3: would be slice #3
    # > max_slices=2 -> compaction into v3
    with open(os.path.join(path, "MANIFEST.json"), encoding="utf-8") as fh:
        man = json.load(fh)
    assert man["version"] == "v00000003"
    assert man["slices"] == []
    assert man["last_batch_id"] == 3
    vdirs = [d for d in os.listdir(path) if d.startswith("v")]
    assert vdirs == ["v00000003"]  # superseded v0 vacuumed
    r = StreamingANNIndexMaintainer.from_index_path(spark, path)
    assert r.index.n_vectors == 120
    want = {(x["vec_id"], x["cent_id"]) for x in m.index.assignments.collect()}
    assert {(x["vec_id"], x["cent_id"]) for x in r.index.assignments.collect()} == want


def test_attach_refuses_unscoped_replay_guard_and_reset_clears_it(
    spark, base_and_batches, tmp_path
):
    """ADVICE pin: a maintainer with applied batches but NO recorded
    stream checkpoint (legacy manifest, or batches fed through
    process_batch directly) must refuse attach() — any checkpoint
    restarts batch ids at 0 under the stale high-water mark and the
    guard would swallow the first N real batches. The explicit
    ``reset_replay_guard=True`` escape hatch clears the mark so a
    genuinely NEW stream's batch 0 is processed end-to-end."""
    base, batches = base_and_batches
    idx = IVFIndex.build(base, n_centroids=8, seed=42)
    m = StreamingANNIndexMaintainer(index=idx)
    m.process_batch(spark.createDataFrame(batches[0], SCHEMA), 0)
    dummy = spark.createDataFrame(batches[1], SCHEMA)
    with pytest.raises(ValueError, match="records no stream checkpoint"):
        m.attach(dummy, checkpoint=str(tmp_path / "ckpt_new"))
    with pytest.raises(ValueError, match="records no stream checkpoint"):
        m.attach(dummy, checkpoint=None)

    # the escape hatch, end-to-end on a real stream: batch 0 of the new
    # checkpoint is PROCESSED (the old guard state would have skipped it)
    src = tmp_path / "vec_stream"
    src.mkdir()
    spark.createDataFrame(batches[1], SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).json(str(src))
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    # a FAILED attach must not leave a wiped guard behind (review pin):
    # dummy is a static DataFrame, so the attach itself raises — the
    # guard state must be untouched afterwards
    with pytest.raises(Exception, match="(?i)stream"):
        m.attach(dummy, checkpoint=str(tmp_path / "ckpt_new"), reset_replay_guard=True)
    assert (m._last_batch_id, m._stream_checkpoint) == (0, None)

    q = m.attach(
        stream,
        checkpoint=str(tmp_path / "ckpt_new"),
        available_now=True,
        reset_replay_guard=True,
    )
    q.awaitTermination(120)
    assert m.index.n_vectors == 110
    assert m._stream_checkpoint == str(tmp_path / "ckpt_new")
    assert not m.history[-1].get("skipped", False)


def test_zero_pending_save_persists_moved_replay_guard_meta(
    spark, base_and_batches, tmp_path
):
    """ADVICE pin: save() with nothing pending still commits replay-
    guard metadata that moved since the last data commit — a checkpoint
    recorded by attach(), or a high-water mark advanced by an empty /
    fully-deduped batch. Losing either across a crash un-scopes the
    resumed guard or replays a real batch as a no-op. The rewrite is
    JSON-only: no data file is touched."""
    base, batches = base_and_batches
    idx = IVFIndex.build(base, n_centroids=8, seed=42)
    path = str(tmp_path / "meta_sync")
    m = StreamingANNIndexMaintainer(
        index=idx, save_path=path, save_every=1, dedup_ids=True
    )
    m.process_batch(spark.createDataFrame(batches[0], SCHEMA), 0)  # full v0
    manifest = os.path.join(path, "MANIFEST.json")
    with open(manifest, encoding="utf-8") as fh:
        man = json.load(fh)
    assert (man["last_batch_id"], man["stream_checkpoint"]) == (0, None)

    # a fully-deduped batch advances the in-memory mark but writes no
    # data; attach-after-commit records a checkpoint the same way
    m.process_batch(spark.createDataFrame(batches[0], SCHEMA), 1)
    m._stream_checkpoint = str(tmp_path / "ckpt_meta")
    assert m._pending_n == 0
    before = _file_mtimes(path)
    m.save()
    after = _file_mtimes(path)
    for p, t in before.items():
        if p != manifest:
            assert after.get(p) == t, f"meta-only save rewrote {p}"
    with open(manifest, encoding="utf-8") as fh:
        man = json.load(fh)
    assert man["last_batch_id"] == 1
    assert man["stream_checkpoint"] == str(tmp_path / "ckpt_meta")

    # and the resumed maintainer is scoped: batch 1 replays as a no-op,
    # the recorded checkpoint is enforced
    r = StreamingANNIndexMaintainer.from_index_path(spark, path)
    assert r._last_batch_id == 1
    assert r._stream_checkpoint == str(tmp_path / "ckpt_meta")
    # unchanged meta: save stays a true no-op (manifest untouched)
    before = _file_mtimes(path)
    r.save(path)
    assert _file_mtimes(path) == before
