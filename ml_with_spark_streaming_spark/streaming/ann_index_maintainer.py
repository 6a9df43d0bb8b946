"""Streaming maintenance for the persisted IVF index: every
micro-batch of newly-ingested vectors is APPENDED to the artifact
(assigned against the FROZEN centroids — ``IVFIndex.append``, q169's
refresh discipline), so the ANN index a deployment serves tracks the
corpus as it grows — and, new this round, the maintainer also ACTS on
the drift signal it records: when bucket-occupancy skew crosses a
configured bound it refits fresh centroids over (base corpus ∪ all
accepted vectors), writes a NEW versioned artifact, and atomically
swaps the manifest, so probe recall does not degrade without bound
under a drifting stream.

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
per-batch action touches the corpus. A *save* does rewrite the full
assignments table (the artifact is a plain parquet table, not an LSM),
and a *refit* is by definition an O(corpus) KMeans fit — both are
rate-limited events (``save_every`` / the skew bound), never per-batch
costs.

Persisted layout (the SCD2 manifest discipline —
``streaming/scd2.py``): versioned artifact dirs plus one small
manifest swapped atomically::

    save_path/MANIFEST.json   {"version": "v00000007", "last_batch_id": 7,
                               "n_refits": 1, "bucket_counts": {"0": 13, ...}}
    save_path/v00000007/      (IVFIndex.save layout: centroids/
                               assignments/ params/ [+ accepted/])

* **idempotent replay** — foreachBatch is at-least-once; a replayed
  ``batch_id <= last_batch_id`` (in memory, or from the manifest after
  a resume) is a recorded no-op, never a double append. The manifest's
  ``last_batch_id`` is committed WITH the artifact version, so a
  ``from_index_path`` resume after a crash cannot double-apply the
  in-flight batch.
* **crash safety** — a new version dir is fully written before the
  manifest swap (``os.replace``); a crash mid-save leaves the old
  artifact live and the orphan dir is vacuumed on the next save.
* **exactly-once caveat** — batches appended in memory but not yet
  saved are lost on a crash if the STREAM checkpoint already committed
  them (the source will not replay them). ``save_every=1`` closes that
  window; larger values trade it for fewer table rewrites.

Stream == batch is structural: the maintained assignment table equals
one full ``assign_to_centroids`` pass over (base ∪ all accepted
batches) against the current centroids — pinned by
``tests/test_ann_index_stream.py``; the refit path (drift → refit →
recall recovery, resume across the swap, old-dir vacuum) by
``tests/test_ann_index_refit.py``.
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
    skipped]) — ``max_bucket`` is the largest bucket's occupancy after
    the append, the drift signal; ``refit=True`` marks batches where
    the skew bound tripped and a fresh fit was swapped in.

    ``corpus`` + ``refit_skew_threshold`` arm the refit: when
    ``max_bucket > threshold × (n_total / n_centroids)`` (occupancy
    skew vs the balanced mean) the maintainer refits over
    ``corpus ∪ accepted`` with the index's own k and seed. Accepted
    vectors are retained (and persisted under the version dir) so the
    refit input — and a refit after resume — is the TRUE current
    corpus, not just the base.

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
    # IVF centroids, so an IVF refit leaves them valid as-is; a
    # CODEBOOK refit is a new index on its own drift metrics.
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

    # -- resume ------------------------------------------------------
    @classmethod
    def from_index_path(cls, spark, path: str, **kw) -> "StreamingANNIndexMaintainer":
        """Resume from a persisted artifact: manifest layout (versioned
        dirs) restores the index, the replay high-water mark, the
        incremental bucket counters, and the accepted-vector table —
        no O(corpus) action. A pre-manifest flat ``IVFIndex.save`` dir
        still loads (legacy), with counters rebuilt lazily."""
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
        bc = manifest.get("bucket_counts")
        if bc:
            m._bucket_counts = {int(k): int(v) for k, v in bc.items()}
        acc = os.path.join(vdir, "accepted")
        if os.path.isdir(acc):
            # eager: the dir may be vacuumed by a later save
            m._accepted = spark.read.parquet(acc).localCheckpoint(eager=True)
        return m

    # -- counters ----------------------------------------------------
    def _ensure_counts(self) -> None:
        """One-time counter init from the current assignment table —
        the ONLY O(corpus) action in the steady-state batch path, and
        skipped entirely when the counters came from a manifest."""
        if self._bucket_counts is None:
            self._bucket_counts = {
                int(r["cent_id"]): int(r["count"])
                for r in self.index.assignments.groupBy("cent_id").count().collect()
            }

    def _max_bucket(self):
        return max(self._bucket_counts.values()) if self._bucket_counts else None

    # -- persistence -------------------------------------------------
    def _save_versioned(self, batch_id: int) -> None:
        """Write the artifact under a fresh ``v{batch_id}`` dir, swap
        the manifest atomically, reload the in-memory index from the
        new files (so its lineage no longer references soon-vacuumed
        dirs), then vacuum superseded versions."""
        vname = f"v{batch_id:08d}"
        vdir = os.path.join(self.save_path, vname)
        self.index.save(vdir)
        if self.pq is not None:
            self.pq.save(os.path.join(vdir, "pq"))
        if self._accepted is not None:
            self._accepted.write.mode("overwrite").parquet(
                os.path.join(vdir, "accepted")
            )
        manifest = {
            "version": vname,
            "last_batch_id": batch_id,
            "n_refits": self._n_refits,
            "has_pq": self.pq is not None,
            "bucket_counts": {str(k): v for k, v in (self._bucket_counts or {}).items()},
        }
        tmp = os.path.join(self.save_path, "MANIFEST.json.tmp")
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, os.path.join(self.save_path, "MANIFEST.json"))
        spark = self.index.centroids.sparkSession
        self.index = IVFIndex.load(spark, vdir)
        if self.pq is not None:
            self.pq = PQIndex.load(spark, os.path.join(vdir, "pq"))
        for d in os.listdir(self.save_path):
            if _VDIR_RE.match(d) and d != vname:
                shutil.rmtree(os.path.join(self.save_path, d), ignore_errors=True)

    def save(self, path: str | None = None) -> None:
        """One-shot versioned save (manifest + vacuum) of the current
        index to ``path`` (or the configured ``save_path``) — what a
        composed pipeline's ``save_state`` calls so the serving index
        commits in the same unit as the gates."""
        if path is not None:
            self.save_path = path
        if self.save_path is None:
            raise ValueError("no save_path configured")
        self._ensure_counts()
        self._save_versioned(max(self._last_batch_id, 0))
        self._since_save = 0

    # -- refit -------------------------------------------------------
    def _maybe_refit(self) -> bool:
        """Fire the refit when bucket skew crosses the bound: fresh
        KMeans over (base corpus ∪ accepted) with the index's own
        k/seed, fresh assignment, counters rebuilt from the new fit.
        The caller persists the new index as a NEW version — the swap
        is the manifest commit, so readers of the old artifact are
        never left mid-rewrite."""
        if self.refit_skew_threshold is None or self.corpus is None:
            return False
        mx = self._max_bucket()
        if mx is None or self.index.n_centroids <= 0:
            return False
        mean_occ = self.index.n_vectors / self.index.n_centroids
        if mx <= self.refit_skew_threshold * mean_occ:
            return False
        ci, cv = self.index.c_id, self.index.c_vec
        full = self.corpus.select(ci, cv)
        if self._accepted is not None:
            full = full.unionByName(self._accepted)
        self.index = IVFIndex.build(
            full,
            n_centroids=None if self.refit_derive_k else self.index.n_centroids,
            c_id=ci,
            c_vec=cv,
            seed=self.index.seed,
        )
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
        for r in new_rows.groupBy("cent_id").count().collect():
            k = int(r["cent_id"])
            self._bucket_counts[k] = self._bucket_counts.get(k, 0) + int(r["count"])
        self.index = self.index.append(b, assigned=new_rows, n_delta=n_in)
        if self.pq is not None:
            self.pq = self.pq.append(b)
        if self.corpus is not None:
            self._accepted = (
                b
                if self._accepted is None
                else maybe_checkpoint(self._accepted.unionByName(b))
            )
        self._last_batch_id = batch_id
        refit = self._maybe_refit()
        self.history.append(
            {
                "batch_id": batch_id,
                "n_vecs": int(n_in),
                "n_total": self.index.n_vectors,
                "max_bucket": int(self._max_bucket()),
                "refit": refit,
            }
        )
        if self.save_path is not None:
            self._since_save += 1
            if refit or (
                self.save_every is not None and self._since_save >= self.save_every
            ):
                # a refit ALWAYS persists+swaps immediately: the old
                # artifact answers with stale centroids
                self._save_versioned(batch_id)
                self._since_save = 0
        if self.on_appended is not None:
            self.on_appended(self.index, batch_id)

    def attach(
        self,
        vecs: DataFrame,
        checkpoint: str | None = None,
        trigger_seconds: int = 5,
        available_now: bool = False,
    ) -> StreamingQuery:
        return attach_foreach_batch(
            vecs, self.process_batch, checkpoint, trigger_seconds, available_now
        )
