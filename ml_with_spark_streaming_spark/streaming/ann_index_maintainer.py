"""Streaming maintenance for the persisted IVF index: every
micro-batch of newly-ingested vectors is APPENDED to the artifact
(assigned against the FROZEN centroids — ``IVFIndex.append``, q169's
refresh discipline), so the ANN index a deployment serves tracks the
corpus as it grows — and the maintainer ACTS on the drift signal it
records: when bucket-occupancy skew crosses a configured bound it
refits fresh centroids over (base corpus ∪ all accepted vectors),
writes a NEW versioned artifact, and atomically swaps the manifest, so
probe recall does not degrade without bound under a drifting stream.
When a ``PQIndex`` rides along, a refit also retrains the PQ
codebooks and re-encodes (``refit_pq_codebooks``) — frozen codebooks
degrade ADC quantization error unboundedly under drift even after an
IVF refit, and the per-batch ``pq_qerr`` gauge in ``history`` is the
signal that says so.

This is the last stage of a production vector-ingest door: the
embedding near-dup gate (``streaming/embedding_dedup_filter.py``)
decides which vectors enter the corpus; this maintainer keeps the
SERVING index current for the ones that do.

Per-batch cost: one centroid-broadcast assignment pass over the batch
plus a batch-sized groupBy for the per-bucket delta counts. The
``max_bucket`` drift gauge is maintained as INCREMENTAL driver-side
counters (a k-entry dict updated from each batch's own counts), so
after the one-time O(corpus) counter init — skipped entirely on a
manifest resume, which restores the counters from the sidecar — no
per-batch action touches the corpus. A *refit* is by definition an
O(corpus) KMeans fit — a rate-limited event (the skew bound), never a
per-batch cost.

Persisted layout (the SCD2 manifest discipline —
``streaming/scd2.py``): versioned artifact dirs plus one small
manifest swapped atomically::

    save_path/MANIFEST.json   {"version": "v00000007", "last_batch_id": 9,
                               "n_refits": 1, "bucket_counts": {"0": 13, ...},
                               "slices": [{"name": "s00000009", "n": 5}],
                               "stream_checkpoint": null}
    save_path/v00000007/      (IVFIndex.save layout: centroids/
                               assignments/ params/ [+ pq/ accepted/])
    save_path/v00000007/slices/s00000009/
                              (vectors/ assignments/ [codes/] — ONE
                               batch-sized delta per non-refit save)

* **append-only non-refit saves** — a periodic ``save_every`` save
  writes ONLY the since-last-save delta as a slice dir inside the live
  version and lists it in the manifest: O(batch) files per save, prior
  slices and the base artifact untouched (mtime-pinned by
  ``tests/test_ann_index_stream.py``). A save that would push the
  manifest past ``max_slices`` COMPACTS instead — a full rewrite into
  a fresh version (the LSM segment merge), so a long quiet stream's
  slice list and resume replay stay bounded. A REFIT always rewrites
  everything — centroids changed, every assignment is new — as a
  fresh version dir + manifest swap + vacuum of superseded versions.
* **idempotent replay** — foreachBatch is at-least-once; a replayed
  ``batch_id <= last_batch_id`` (in memory, or from the manifest after
  a resume) is a recorded no-op, never a double append. The manifest's
  ``last_batch_id`` is committed WITH the artifact version, so a
  ``from_index_path`` resume after a crash cannot double-apply the
  in-flight batch. Batch ids are scoped to the STREAM's checkpoint
  dir: ``attach`` records the checkpoint location in the manifest and
  a later ``attach`` against a resumed maintainer REFUSES a different
  one — a fresh checkpoint restarts ids at 0 and the guard would
  otherwise silently record the first N real batches as replays.
* **crash safety** — a new version dir (or slice dir) is fully written
  before the manifest swap (``os.replace``); a crash mid-save leaves
  the old manifest live, unlisted orphan dirs are ignored on load and
  vacuumed with their version. ``save()`` with nothing new since the
  last commit is an explicit NO-OP — the live version dir is what the
  in-memory index READS from, so re-writing it in place would be a
  read-your-own-overwrite crash.
* **exactly-once caveat** — batches appended in memory but not yet
  saved are lost on a crash if the STREAM checkpoint already committed
  them (the source will not replay them). ``save_every=1`` closes that
  window; larger values trade it for fewer slice writes.

Stream == batch is structural: the maintained assignment table equals
one full ``assign_to_centroids`` pass over (base ∪ all accepted
batches) against the current centroids — pinned by
``tests/test_ann_index_stream.py``; the refit path (drift → refit →
recall recovery, resume across the swap, old-dir vacuum) by
``tests/test_ann_index_refit.py``; PQ codebook retraining (drift →
qerr spike → retrain at refit → qerr recovery) by
``tests/test_pq_codebook_refit.py``.
"""

from __future__ import annotations

import json
import os
import re
import shutil
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ml_with_spark_streaming_spark.lineage import maybe_checkpoint
from ml_with_spark_streaming_spark.operators.ann_index import IVFIndex, PQIndex
from ml_with_spark_streaming_spark.operators.similarity import assign_to_centroids
from ml_with_spark_streaming_spark.streaming.foreach import attach_foreach_batch

# 8+ digits so the pattern widens with f"v{batch_id:08d}" past 1e8
# batches — the scd2.py vacuum lesson
_VDIR_RE = re.compile(r"^v\d{8,}$")


@dataclass
class StreamingANNIndexMaintainer:
    """Append each micro-batch's vectors to the IVF artifact; refit on
    drift when configured.

    ``history`` rows: (batch_id, n_vecs, n_total, max_bucket, refit[,
    skipped][, pq_qerr]) — ``max_bucket`` is the largest bucket's
    occupancy after the append, the centroid drift signal;
    ``pq_qerr`` (with a ``pq`` attached) is the batch's mean squared
    PQ reconstruction error, the CODEBOOK drift signal; ``refit=True``
    marks batches where the skew bound tripped and a fresh fit was
    swapped in.

    ``corpus`` + ``refit_skew_threshold`` arm the refit: when
    ``max_bucket > threshold × (n_total / n_centroids)`` (occupancy
    skew vs the balanced mean) the maintainer refits over
    ``corpus ∪ accepted`` with the index's own k and seed. Accepted
    vectors are retained (and persisted under the version dir) so the
    refit input — and a refit after resume — is the TRUE current
    corpus, not just the base; a refit whose tracked input does NOT
    add up to the index's own ``n_vectors`` (a legacy resume that
    dropped the accepted table) RAISES instead of silently evicting
    indexed vectors.

    ``refit_pq_codebooks`` (default True): a refit with a ``pq``
    attached also retrains the per-subspace codebooks over the same
    (corpus ∪ accepted) input and re-encodes — one pass over the
    corpus, amortized into the refit it rides on. False keeps the
    build-time codebooks frozen forever (codes stay valid across IVF
    refits by construction, but ADC quality degrades under drift).

    ``dedup_ids=True`` anti-joins each batch against the existing
    assignment ids before appending — the guard for producers that can
    emit the same vec_id in different batches. It is an O(corpus) scan
    per batch (the batch side broadcasts), so it is off by default:
    the composed ingest door's embedding gate already admits each doc
    id at most once."""

    index: IVFIndex
    # optional: maintain the COMPRESSED representation alongside — each
    # accepted batch's vectors are PQ-encoded against the frozen
    # codebooks (PQIndex.append) so the q170 IVF-PQ probe always has
    # codes for exactly the indexed set. Codes are independent of the
    # IVF centroids, so an IVF refit leaves them valid as-is — but see
    # refit_pq_codebooks for the quality story under drift.
    pq: PQIndex | None = None
    id_col: str = "vec_id"
    vec_col: str = "embedding"
    save_path: str | None = None
    save_every: int | None = None
    corpus: DataFrame | None = None
    refit_skew_threshold: float | None = None
    # True: each refit re-derives k = ceil(sqrt(n)) from the CURRENT
    # corpus size (derive_semdedup_knobs — the q50 derived-knob
    # discipline), so a stream that doubles the corpus doesn't keep a
    # k sized for half of it. False keeps the index's own k.
    refit_derive_k: bool = False
    refit_pq_codebooks: bool = True
    # slice-compaction bound: a periodic save that would push the
    # manifest past this many append slices does a FULL rewrite
    # instead (fresh version + vacuum) — the LSM discipline's segment
    # merge. Without it a long quiet stream (no refits) accumulates
    # slices without bound and every resume replays them all. None
    # disables.
    max_slices: int | None = 64
    dedup_ids: bool = False
    # micro-batches are scheduling-bound on wide partitionings (the
    # embedding gate's measured lesson): coalesce at entry; None disables
    batch_partitions: int | None = 8
    on_appended: object = None
    on_refit: object = None
    history: list[dict] = field(default_factory=list)
    _since_save: int = field(default=0, init=False, repr=False)
    _last_batch_id: int = field(default=-1, init=False, repr=False)
    _n_refits: int = field(default=0, init=False, repr=False)
    _bucket_counts: dict | None = field(default=None, init=False, repr=False)
    _accepted: DataFrame | None = field(default=None, init=False, repr=False)
    _accepted_n: int = field(default=0, init=False, repr=False)
    _corpus_count: int | None = field(default=None, init=False, repr=False)
    # since-last-save deltas (what a non-refit save writes as ONE slice)
    _pending_vecs: DataFrame | None = field(default=None, init=False, repr=False)
    _pending_assigned: DataFrame | None = field(default=None, init=False, repr=False)
    _pending_codes: DataFrame | None = field(default=None, init=False, repr=False)
    _pending_n: int = field(default=0, init=False, repr=False)
    # the committed artifact this maintainer's state is persisted as:
    # (_live_path, _live_version) name the manifest-committed version
    # dir; _slices mirrors the manifest's slice list
    _live_path: str | None = field(default=None, init=False, repr=False)
    _live_version: str | None = field(default=None, init=False, repr=False)
    _slices: list = field(default_factory=list, init=False, repr=False)
    # an unpersisted refit (no save_path at the time): the next save
    # MUST be a full rewrite — pending slices were subsumed by the refit
    _refit_dirty: bool = field(default=False, init=False, repr=False)
    # stream-checkpoint scoping for the replay guard (see module doc)
    _stream_checkpoint: str | None = field(default=None, init=False, repr=False)
    # (last_batch_id, stream_checkpoint) as last COMMITTED to the live
    # manifest — lets a zero-pending save() still persist replay-guard
    # metadata that moved since the last data commit (cheap JSON-only
    # rewrite instead of a silent return)
    _manifest_meta: tuple = field(default=(-1, None), init=False, repr=False)

    # -- resume ------------------------------------------------------
    @classmethod
    def from_index_path(cls, spark, path: str, **kw) -> "StreamingANNIndexMaintainer":
        """Resume from a persisted artifact: manifest layout (versioned
        dirs + append slices) restores the index, the replay high-water
        mark, the incremental bucket counters, and the accepted-vector
        table — slice reads are batch-sized, never an O(corpus) action.
        A pre-manifest flat ``IVFIndex.save`` dir still loads (legacy),
        with counters rebuilt lazily.

        Replay ids are only comparable within ONE stream checkpoint:
        resume the gate with the SAME checkpoint location the manifest
        records (``attach`` enforces this) — a fresh checkpoint
        restarts batch ids at 0 and the high-water mark would silently
        swallow the first N real batches."""
        mpath = os.path.join(path, "MANIFEST.json")
        try:
            with open(mpath, encoding="utf-8") as fh:
                manifest = json.load(fh)
        except FileNotFoundError:
            return cls(index=IVFIndex.load(spark, path), **kw)
        vdir = os.path.join(path, manifest["version"])
        pq = None
        if manifest.get("has_pq") and os.path.isdir(os.path.join(vdir, "pq")):
            pq = PQIndex.load(spark, os.path.join(vdir, "pq"))
        m = cls(index=IVFIndex.load(spark, vdir), pq=pq, **kw)
        m._last_batch_id = int(manifest["last_batch_id"])
        m._n_refits = int(manifest.get("n_refits", 0))
        m._stream_checkpoint = manifest.get("stream_checkpoint")
        m._manifest_meta = (m._last_batch_id, m._stream_checkpoint)
        bc = manifest.get("bucket_counts")
        if bc:
            m._bucket_counts = {int(k): int(v) for k, v in bc.items()}
        acc = os.path.join(vdir, "accepted")
        accepted = spark.read.parquet(acc) if os.path.isdir(acc) else None
        # replay the manifest-listed append slices into the in-memory
        # index (each is one batch-sized parquet read; counts come from
        # the manifest, so no Spark action is needed per slice)
        m._slices = list(manifest.get("slices", []))
        for s in m._slices:
            sdir = os.path.join(vdir, "slices", s["name"])
            vecs = spark.read.parquet(os.path.join(sdir, "vectors"))
            assigned = spark.read.parquet(os.path.join(sdir, "assignments"))
            m.index = m.index.append(vecs, assigned=assigned, n_delta=int(s["n"]))
            if m.pq is not None:
                codes_dir = os.path.join(sdir, "codes")
                m.pq = m.pq.append(
                    vecs, codes=spark.read.parquet(codes_dir)
                ) if os.path.isdir(codes_dir) else m.pq.append(vecs)
            accepted = (
                vecs if accepted is None else accepted.unionByName(vecs)
            )
        if accepted is not None:
            # eager: the dirs may be vacuumed by a later full save
            m._accepted = accepted.localCheckpoint(eager=True)
            m._accepted_n = m._accepted.count()
        m._live_path = path
        m._live_version = manifest["version"]
        return m

    # -- counters ----------------------------------------------------
    def _ensure_counts(self) -> None:
        """One-time counter init from the current assignment table —
        the ONLY O(corpus) action in the steady-state batch path, and
        skipped entirely when the counters came from a manifest."""
        if self._bucket_counts is None:
            self._bucket_counts = {
                int(r["cent_id"]): int(r["count"])
                for r in self.index.assignments.groupBy("cent_id").count().collect()  # bounded-collect: k rows (one per centroid)
            }

    def _max_bucket(self):
        return max(self._bucket_counts.values()) if self._bucket_counts else None

    # -- persistence -------------------------------------------------
    def _write_manifest(self, vname: str) -> None:
        # the replay high-water mark is ALWAYS the true last applied
        # batch id (-1 when nothing was processed yet) — never the
        # version-dir name's clamped number: recording 0 for a
        # batch-less save would make a resumed maintainer swallow the
        # stream's real batch 0 as a replay
        manifest = {
            "version": vname,
            "last_batch_id": self._last_batch_id,
            "n_refits": self._n_refits,
            "has_pq": self.pq is not None,
            "bucket_counts": {str(k): v for k, v in (self._bucket_counts or {}).items()},
            "slices": self._slices,
            "stream_checkpoint": self._stream_checkpoint,
        }
        tmp = os.path.join(self.save_path, "MANIFEST.json.tmp")
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, os.path.join(self.save_path, "MANIFEST.json"))
        self._live_path = self.save_path
        self._live_version = vname
        self._manifest_meta = (self._last_batch_id, self._stream_checkpoint)

    def _clear_pending(self) -> None:
        self._pending_vecs = None
        self._pending_assigned = None
        self._pending_codes = None
        self._pending_n = 0

    def _save_full(self, batch_id: int) -> None:
        """Write the FULL artifact under a fresh ``v{batch_id}`` dir,
        swap the manifest atomically (slice list reset — the base now
        contains everything), reload the in-memory index from the new
        files (so its lineage no longer references soon-vacuumed dirs),
        then vacuum superseded versions. Reserved for refits, first
        saves, and redirects to a new ``save_path`` — the periodic
        steady-state save is ``_save_slice``."""
        vname = f"v{batch_id:08d}"
        vdir = os.path.join(self.save_path, vname)
        if os.path.isdir(vdir):
            # target collides with an existing dir (e.g. a full save at
            # the same batch id the live version was committed under):
            # the in-memory frames may READ those very files, so pin
            # them into memory before the overwrite — never let a write
            # consume its own input (raw localCheckpoint on purpose:
            # this is a correctness materialization, not query lineage)
            self.index = IVFIndex(
                centroids=self.index.centroids.localCheckpoint(eager=True),
                assignments=self.index.assignments.localCheckpoint(eager=True),
                n_centroids=self.index.n_centroids,
                seed=self.index.seed,
                c_id=self.index.c_id,
                c_vec=self.index.c_vec,
                n_vectors=self.index.n_vectors,
            )
            if self.pq is not None:
                self.pq = PQIndex(
                    codebooks=self.pq.codebooks.localCheckpoint(eager=True),
                    codes=self.pq.codes.localCheckpoint(eager=True),
                    m=self.pq.m,
                    k_sub=self.pq.k_sub,
                    seed=self.pq.seed,
                    c_id=self.pq.c_id,
                    c_vec=self.pq.c_vec,
                )
            if self._accepted is not None:
                self._accepted = self._accepted.localCheckpoint(eager=True)
            shutil.rmtree(vdir, ignore_errors=True)
        self.index.save(vdir)
        if self.pq is not None:
            self.pq.save(os.path.join(vdir, "pq"))
        if self._accepted is not None:
            self._accepted.write.mode("overwrite").parquet(
                os.path.join(vdir, "accepted")
            )
        self._slices = []
        self._write_manifest(vname)
        self._clear_pending()
        self._refit_dirty = False
        spark = self.index.centroids.sparkSession
        self.index = IVFIndex.load(spark, vdir)
        if self.pq is not None:
            self.pq = PQIndex.load(spark, os.path.join(vdir, "pq"))
        for d in os.listdir(self.save_path):
            if _VDIR_RE.match(d) and d != vname:
                shutil.rmtree(os.path.join(self.save_path, d), ignore_errors=True)

    def _slice_or_full(self, batch_id: int) -> None:
        """The periodic non-refit commit: an append slice, unless the
        slice list would exceed ``max_slices`` — then a full rewrite
        compacts them back into one base (bounded resume replay)."""
        if (
            self._live_version is not None
            and self._live_path == self.save_path
            and not (
                self.max_slices is not None and len(self._slices) >= self.max_slices
            )
        ):
            self._save_slice(batch_id)
        else:
            self._save_full(batch_id)

    def _save_slice(self, batch_id: int) -> None:
        """Append-only commit: write ONLY the since-last-save delta as
        one slice dir inside the LIVE version, then swap the manifest
        with the slice listed. O(batch) files; the base artifact and
        prior slices are untouched (mtime-pinned by test)."""
        vdir = os.path.join(self.save_path, self._live_version)
        sname = f"s{batch_id:08d}"
        sdir = os.path.join(vdir, "slices", sname)
        self._pending_vecs.write.mode("overwrite").parquet(
            os.path.join(sdir, "vectors")
        )
        self._pending_assigned.write.mode("overwrite").parquet(
            os.path.join(sdir, "assignments")
        )
        if self.pq is not None and self._pending_codes is not None:
            self._pending_codes.write.mode("overwrite").parquet(
                os.path.join(sdir, "codes")
            )
        self._slices = self._slices + [{"name": sname, "n": self._pending_n}]
        self._write_manifest(self._live_version)
        self._clear_pending()

    def save(self, path: str | None = None) -> None:
        """One-shot versioned save of the current index to ``path`` (or
        the configured ``save_path``) — what a composed pipeline's
        ``save_state`` calls so the serving index commits in the same
        unit as the gates. Chooses the cheapest sufficient commit:
        NO-OP when the live manifest already covers this state (the
        double-save / save-right-after-resume case — rewriting the live
        dir in place would overwrite files the in-memory index reads);
        an append SLICE when only un-persisted batches are pending; a
        FULL rewrite otherwise (first save, new path, unsaved refit)."""
        if path is not None:
            self.save_path = path
        if self.save_path is None:
            raise ValueError("no save_path configured")
        self._ensure_counts()
        live_here = (
            self._live_version is not None and self._live_path == self.save_path
        )
        if live_here and not self._refit_dirty and self._pending_n == 0:
            # no data to commit — but the replay-guard metadata may have
            # moved since the last data commit (attach() recorded a
            # checkpoint, or empty/fully-deduped batches advanced the
            # high-water mark). Losing either across a crash would
            # un-scope the resumed guard or replay-swallow real batches,
            # so rewrite the manifest (cheap JSON-only commit) when they
            # differ from the committed values.
            if (self._last_batch_id, self._stream_checkpoint) != self._manifest_meta:
                self._write_manifest(self._live_version)
            return
        if live_here and not self._refit_dirty:
            self._slice_or_full(self._last_batch_id)
        else:
            self._save_full(max(self._last_batch_id, 0))
        self._since_save = 0

    # -- refit -------------------------------------------------------
    def _refit_input(self) -> DataFrame:
        """(corpus ∪ accepted) as (c_id, c_vec) — validated against the
        index's own row count so a refit can never silently rebuild
        over an INCOMPLETE corpus (e.g. a legacy flat-layout resume
        that dropped the accepted-vector table: refitting over
        base-only would evict every streamed vector from the
        assignments with no signal)."""
        ci, cv = self.index.c_id, self.index.c_vec
        if self._corpus_count is None:
            self._corpus_count = self.corpus.count()
        tracked = self._corpus_count + self._accepted_n
        if self.index.n_vectors != tracked:
            raise ValueError(
                f"refit input incomplete: index holds {self.index.n_vectors} "
                f"vectors but corpus+accepted tracks {tracked} "
                f"({self._corpus_count} base + {self._accepted_n} accepted) — "
                "resume with the manifest layout (accepted vectors persisted) "
                "or rebuild the index before arming refit"
            )
        full = self.corpus.select(ci, cv)
        if self._accepted is not None:
            full = full.unionByName(self._accepted)
        return full

    def _maybe_refit(self) -> bool:
        """Fire the refit when bucket skew crosses the bound: fresh
        KMeans over (base corpus ∪ accepted) with the index's own
        k/seed, fresh assignment, counters rebuilt from the new fit —
        and, with ``refit_pq_codebooks``, fresh PQ codebooks + a full
        re-encode (one pass over the same input). The caller persists
        the new index as a NEW version — the swap is the manifest
        commit, so readers of the old artifact are never left
        mid-rewrite."""
        if self.refit_skew_threshold is None or self.corpus is None:
            return False
        mx = self._max_bucket()
        if mx is None or self.index.n_centroids <= 0:
            return False
        mean_occ = self.index.n_vectors / self.index.n_centroids
        if mx <= self.refit_skew_threshold * mean_occ:
            return False
        ci, cv = self.index.c_id, self.index.c_vec
        full = self._refit_input()
        self.index = IVFIndex.build(
            full,
            n_centroids=None if self.refit_derive_k else self.index.n_centroids,
            c_id=ci,
            c_vec=cv,
            seed=self.index.seed,
        )
        if self.pq is not None and self.refit_pq_codebooks:
            pq_src = full
            if (self.pq.c_id, self.pq.c_vec) != (ci, cv):
                pq_src = full.select(
                    F.col(ci).alias(self.pq.c_id), F.col(cv).alias(self.pq.c_vec)
                )
            self.pq = PQIndex.build(
                pq_src,
                m=self.pq.m,
                k_sub=self.pq.k_sub,
                c_id=self.pq.c_id,
                c_vec=self.pq.c_vec,
                seed=self.pq.seed,
            )
        # the refit subsumes any pending append slices: the next save
        # must be a full rewrite (process_batch does it immediately
        # when a save_path is configured)
        self._clear_pending()
        self._refit_dirty = True
        self._n_refits += 1
        self._bucket_counts = None
        self._ensure_counts()  # O(corpus), amortized into the refit itself
        if self.on_refit is not None:
            self.on_refit(self.index, self._n_refits)
        return True

    # -- the batch ---------------------------------------------------
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= self._last_batch_id:
            # at-least-once replay of an already-applied batch:
            # recorded no-op, never a double append
            self.history.append(
                {
                    "batch_id": batch_id,
                    "n_vecs": 0,
                    "n_total": self.index.n_vectors,
                    "max_bucket": self._max_bucket(),
                    "refit": False,
                    "skipped": True,
                }
            )
            return
        ci, cv = self.index.c_id, self.index.c_vec
        b = batch_df.select(
            F.col(self.id_col).alias(ci), F.col(self.vec_col).alias(cv)
        )
        if self.batch_partitions is not None:
            b = b.coalesce(self.batch_partitions)
        b = b.localCheckpoint(eager=True)
        if self.dedup_ids:
            b = b.join(
                self.index.assignments.select(ci), ci, "left_anti"
            ).localCheckpoint(eager=True)
        n_in = b.count()
        if n_in == 0:
            self._last_batch_id = batch_id
            self.history.append(
                {
                    "batch_id": batch_id,
                    "n_vecs": 0,
                    "n_total": self.index.n_vectors,
                    "max_bucket": None,
                    "refit": False,
                }
            )
            return
        self._ensure_counts()
        new_rows = maybe_checkpoint(
            assign_to_centroids(b, self.index.centroids, ci, cv)
        )
        # batch-sized groupBy -> k-bounded driver update: the counters
        # never re-scan the corpus
        for r in new_rows.groupBy("cent_id").count().collect():  # bounded-collect: k rows, one per touched centroid
            k = int(r["cent_id"])
            self._bucket_counts[k] = self._bucket_counts.get(k, 0) + int(r["count"])
        self.index = self.index.append(b, assigned=new_rows, n_delta=n_in)
        pq_qerr = None
        new_codes = None
        if self.pq is not None:
            from ml_with_spark_streaming_spark.operators.pq import (
                pq_encode,
                pq_quantization_error,
            )

            pq_b = b
            if (self.pq.c_id, self.pq.c_vec) != (ci, cv):
                pq_b = b.select(
                    F.col(ci).alias(self.pq.c_id), F.col(cv).alias(self.pq.c_vec)
                )
            new_codes = maybe_checkpoint(
                pq_encode(
                    pq_b, self.pq.codebooks, m=self.pq.m,
                    c_id=self.pq.c_id, c_vec=self.pq.c_vec,
                )
            )
            # the codebook drift gauge: one batch-sized agg, the
            # compressed-representation twin of max_bucket
            pq_qerr = pq_quantization_error(
                pq_b, self.pq.codebooks, new_codes,
                m=self.pq.m, c_id=self.pq.c_id, c_vec=self.pq.c_vec,
            )
            self.pq = self.pq.append(pq_b, codes=new_codes)
        if self.corpus is not None:
            self._accepted = (
                b
                if self._accepted is None
                else maybe_checkpoint(self._accepted.unionByName(b))
            )
            self._accepted_n += n_in
        # accumulate the since-last-save delta (what a slice save commits)
        self._pending_vecs = (
            b
            if self._pending_vecs is None
            else maybe_checkpoint(self._pending_vecs.unionByName(b))
        )
        self._pending_assigned = (
            new_rows
            if self._pending_assigned is None
            else maybe_checkpoint(self._pending_assigned.unionByName(new_rows))
        )
        if new_codes is not None:
            self._pending_codes = (
                new_codes
                if self._pending_codes is None
                else maybe_checkpoint(self._pending_codes.unionByName(new_codes))
            )
        self._pending_n += n_in
        self._last_batch_id = batch_id
        refit = self._maybe_refit()
        row = {
            "batch_id": batch_id,
            "n_vecs": int(n_in),
            "n_total": self.index.n_vectors,
            "max_bucket": int(self._max_bucket()),
            "refit": refit,
        }
        if pq_qerr is not None:
            row["pq_qerr"] = float(pq_qerr)
        self.history.append(row)
        if self.save_path is not None:
            self._since_save += 1
            if refit:
                # a refit ALWAYS persists+swaps immediately: the old
                # artifact answers with stale centroids
                self._save_full(batch_id)
                self._since_save = 0
            elif self.save_every is not None and self._since_save >= self.save_every:
                self._slice_or_full(batch_id)
                self._since_save = 0
        if self.on_appended is not None:
            self.on_appended(self.index, batch_id)

    def attach(
        self,
        vecs: DataFrame,
        checkpoint: str | None = None,
        trigger_seconds: int = 5,
        available_now: bool = False,
        reset_replay_guard: bool = False,
    ) -> StreamingQuery:
        """Attach to a vector stream. The checkpoint location is part
        of the replay guard's identity: batch ids restart at 0 under a
        NEW checkpoint, so attaching a resumed maintainer to a
        different checkpoint than the manifest records would silently
        swallow the first ``last_batch_id`` real batches as replays —
        refused here instead. The same applies when batches WERE
        applied but no checkpoint was recorded (a legacy/pre-attach
        manifest, or batches fed through ``process_batch`` directly):
        any checkpoint then restarts ids at 0 under a stale high-water
        mark, so that shape is refused too rather than silently
        accepted. ``reset_replay_guard=True`` is the explicit caller
        assertion that ``vecs`` is a genuinely NEW stream whose data is
        not already in the index: it clears the high-water mark so the
        new checkpoint's batch 0 is processed."""
        # evaluate the guards against the EFFECTIVE state, but commit
        # nothing until the stream is actually attached — a failed
        # attach (bad source, invalid checkpoint path) must not leave a
        # wiped guard behind that a later save() would persist
        eff_ckpt = None if reset_replay_guard else self._stream_checkpoint
        eff_last = -1 if reset_replay_guard else self._last_batch_id
        if (
            eff_ckpt is not None
            and checkpoint != eff_ckpt
        ):
            raise ValueError(
                f"this index was maintained under stream checkpoint "
                f"{self._stream_checkpoint!r}; attaching with "
                f"{checkpoint!r} would restart batch ids and the replay "
                "guard would drop real batches — resume with the same "
                "checkpoint location, pass reset_replay_guard=True for "
                "a genuinely new stream, or rebuild the index"
            )
        if eff_ckpt is None and eff_last >= 0:
            raise ValueError(
                f"this index has applied batches up to id "
                f"{eff_last} but records no stream checkpoint "
                "(legacy manifest, or batches applied via process_batch "
                "outside attach); under checkpoint "
                f"{checkpoint!r} batch ids restart at 0 and the replay "
                f"guard would silently swallow the first "
                f"{eff_last + 1} real batches — pass "
                "reset_replay_guard=True if this stream's data is NOT "
                "already in the index, or rebuild the index"
            )
        # commit the guard state before the stream can fire its first
        # micro-batch (foreachBatch runs on another thread), but roll
        # back if the attach itself fails — a failed attach must not
        # leave a wiped guard for a later save() to persist
        prev = (self._last_batch_id, self._stream_checkpoint)
        self._last_batch_id, self._stream_checkpoint = eff_last, checkpoint
        try:
            return attach_foreach_batch(
                vecs, self.process_batch, checkpoint, trigger_seconds, available_now
            )
        except BaseException:
            self._last_batch_id, self._stream_checkpoint = prev
            raise
