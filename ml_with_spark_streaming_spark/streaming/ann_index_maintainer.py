"""Streaming maintenance for the persisted IVF index: every
micro-batch of newly-ingested vectors is APPENDED to the artifact
(assigned against the FROZEN centroids — ``IVFIndex.append``, q169's
refresh discipline), so the ANN index a deployment serves tracks the
corpus as it grows without ever refitting or rescanning.

This is the last stage of a production vector-ingest door: the
embedding near-dup gate (``streaming/embedding_dedup_filter.py``)
decides which vectors enter the corpus; this maintainer keeps the
SERVING index current for the ones that do. Per batch the cost is one
centroid-broadcast assignment pass over the batch plus a bounded
count — never a function of the corpus size. ``save_every`` persists
the grown artifact through ``IVFIndex.save`` (atomic enough for a
single writer: centroids never change, assignments are rewritten
whole), so a restarted maintainer resumes from disk via
``IVFIndex.load`` with the same knob-refusal contract.

Stream == batch is structural: the maintained assignment table equals
one full ``assign_to_centroids`` pass over (base ∪ all accepted
batches) against the same centroids — pinned by
``tests/test_ann_index_stream.py``.

Centroid refit is deliberately OUT of scope: a refit changes every
bucket id and is a new index built offline on drift metrics (the
``history`` rows carry per-batch bucket occupancy skew so a monitor
can decide when).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ml_with_spark_streaming_spark.operators.ann_index import IVFIndex
from ml_with_spark_streaming_spark.streaming.foreach import attach_foreach_batch


@dataclass
class StreamingANNIndexMaintainer:
    """Append each micro-batch's vectors to the IVF artifact.

    ``history`` rows: (batch_id, n_vecs, n_total, max_bucket) —
    ``max_bucket`` is the largest bucket's occupancy after the append,
    the drift signal a monitor watches to schedule a refit."""

    index: IVFIndex
    id_col: str = "vec_id"
    vec_col: str = "embedding"
    save_path: str | None = None
    save_every: int | None = None
    on_appended: object = None
    history: list[dict] = field(default_factory=list)
    _since_save: int = field(default=0, init=False, repr=False)

    @classmethod
    def from_index_path(cls, spark, path: str, **kw) -> "StreamingANNIndexMaintainer":
        """Resume from a persisted artifact (``IVFIndex.save``) — the
        restarted maintainer continues appending where the saved one
        stopped; knob conflicts raise inside ``IVFIndex.load``."""
        return cls(index=IVFIndex.load(spark, path), **kw)

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        b = batch_df.select(
            F.col(self.id_col).alias(self.index.c_id),
            F.col(self.vec_col).alias(self.index.c_vec),
        ).localCheckpoint(eager=True)
        n_in = b.count()
        if n_in == 0:
            self.history.append(
                {
                    "batch_id": batch_id,
                    "n_vecs": 0,
                    "n_total": self.index.n_vectors,
                    "max_bucket": None,
                }
            )
            return
        self.index = self.index.append(b)
        max_bucket = (
            self.index.assignments.groupBy("cent_id")
            .count()
            .agg(F.max("count"))
            .collect()[0][0]
        )
        self.history.append(
            {
                "batch_id": batch_id,
                "n_vecs": int(n_in),
                "n_total": self.index.n_vectors,
                "max_bucket": int(max_bucket),
            }
        )
        if self.save_path is not None and self.save_every is not None:
            self._since_save += 1
            if self._since_save >= self.save_every:
                self.index.save(self.save_path)
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
