"""Ingest-time streaming dedup for the EMBEDDING modality: q100's
sign-LSH near-dup gate deployed as a micro-batch stage — the vector
sibling of ``streaming/ingest_dedup.py``'s text gate.

A production pipeline that stores embeddings alongside documents wants
the same at-the-door discipline for vectors it has for text: maintain
a persisted signature index over the accepted corpus, and check every
ingest drop against it BEFORE the vectors reach storage. This module
is that apply side:

* the index artifact is the per-vector band-signature table
  ``(vec_id, band_idx, band_bits)`` (``operators/similarity.py::
  signlsh_bands`` — the grouped form of which is exactly q100's
  candidate-bucket stage), checkpointed here, persisted/bucketed by
  ``(band_idx, band_bits)`` at scale;
* per micro-batch: signatures over the NEW slice only (seeded
  hyperplanes, so batch-side and index-side bits agree exactly), a
  hash join against the index yields candidate (batch, corpus) id
  pairs, and exact cosine over just those candidates gives the
  verdict — the batch never sees the corpus beyond its candidates.

Scopes, mirroring the text gate's contract:

* vs the CORPUS index (and, with ``grow_index=True``, vs every
  previously-accepted batch — each accepted batch appends one
  checkpointed signature slice + its vectors);
* WITHIN the batch, near-duplicates of the batch's FIRST vector per
  full-signature bucket (bit-identical signatures across ALL bands →
  candidate; exact cosine >= threshold vs the bucket's first →
  verdict; keep-first by id). The cosine verify matters: a full
  signature is a 32-bit hash of the vector, and two distinct
  sub-threshold vectors collide on all bits with small but real
  probability — without the verify one would be silently dropped.
  Two near vectors that land in DIFFERENT signature buckets are both
  admitted (and the second drop of either is then rejected against
  the grown index) — same documented semantics as the text gate.

Batch/stream parity is structural: the gate's candidate and verify
stages are the q100 operators; pinned by
``tests/test_embedding_dedup_stream.py``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ml_with_spark_streaming_spark.lineage import maybe_checkpoint
from ml_with_spark_streaming_spark.operators.similarity import (
    dot_expr,
    norm_expr,
    safe_denom,
    signlsh_bands,
)
from ml_with_spark_streaming_spark.streaming.foreach import attach_foreach_batch


@dataclass
class StreamingEmbeddingDedup:
    """Per-micro-batch vector near-dup gate against the corpus
    signature index. ``on_kept`` receives each batch's accepted slice;
    ``history`` records (n_vecs / n_exact / n_near / n_kept)."""

    corpus: DataFrame  # (id_col, vec_col) — the verify side
    band_index: DataFrame  # (id_col, band_idx, band_bits)
    id_col: str = "vec_id"
    vec_col: str = "embedding"
    threshold: float = 0.95
    n_planes: int = 32
    bands: int = 4
    seed: int = 42
    dim: int | None = None
    grow_index: bool = True
    on_kept: object = None
    history: list[dict] = field(default_factory=list)
    # merge accepted-batch slices back into one materialized table
    # every N accepted batches (the text gate's compaction contract:
    # without it a long-running gate's union chain grows per batch)
    compact_every: int | None = 16
    _since_compact: int = field(default=0, init=False, repr=False)

    @classmethod
    def from_corpus(cls, corpus: DataFrame, **kw) -> "StreamingEmbeddingDedup":
        sig_kw = {
            k: kw[k]
            for k in ("n_planes", "bands", "seed", "dim")
            if k in kw
        }
        id_col = kw.get("id_col", "vec_id")
        vec_col = kw.get("vec_col", "embedding")
        idx = maybe_checkpoint(
            signlsh_bands(corpus, c_id=id_col, c_vec=vec_col, **sig_kw)
        )
        return cls(corpus=corpus, band_index=idx, **kw)

    def compact(self) -> None:
        """Re-materialize the grown index union into single
        checkpointed tables (the text gate's compaction: plan depth
        and pinned slice RDDs return to O(1); verdict-neutral — the
        union's CONTENT is unchanged, pinned by test). At scale this
        is the segment-merge every vector store runs."""
        self.band_index = maybe_checkpoint(self.band_index)
        self.corpus = maybe_checkpoint(self.corpus.select(self.id_col, self.vec_col))
        self._since_compact = 0

    def save_index(self, path: str) -> None:
        """Persist the (possibly grown) artifacts: the band-signature
        table, the vector table (the verify side), and a params
        sidecar — band bits are a function of (n_planes, bands, seed),
        so resuming with different knobs would silently never match."""
        self.compact()
        self.band_index.write.mode("overwrite").parquet(f"{path}/band_index")
        self.corpus.select(self.id_col, self.vec_col).write.mode(
            "overwrite"
        ).parquet(f"{path}/vectors")
        spark = self.corpus.sparkSession
        spark.createDataFrame(
            [(self.n_planes, self.bands, self.seed, float(self.threshold))],
            "n_planes int, bands int, seed int, threshold double",
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/params")

    @classmethod
    def from_index_path(cls, spark, path: str, **kw) -> "StreamingEmbeddingDedup":
        """Resume a gate from ``save_index`` artifacts — no corpus
        rescan. Knobs come from the params sidecar; conflicting
        overrides raise (mismatched planes/bands/seed make every
        stored signature unmatchable — a silently broken gate)."""
        p = spark.read.parquet(f"{path}/params").collect()[0]
        saved = {
            "n_planes": int(p["n_planes"]),
            "bands": int(p["bands"]),
            "seed": int(p["seed"]),
            "threshold": float(p["threshold"]),
        }
        for name, val in saved.items():
            if name in kw and kw[name] != val:
                raise ValueError(
                    f"index at {path} was built with {name}={val}; "
                    f"got {name}={kw[name]} — rebuild the index or drop the override"
                )
            kw[name] = val
        return cls(
            corpus=spark.read.parquet(f"{path}/vectors"),
            band_index=spark.read.parquet(f"{path}/band_index"),
            **kw,
        )

    def _cosine(self, v1, v2) -> F.Column:
        return dot_expr(v1, v2) / (
            safe_denom(norm_expr(v1)) * safe_denom(norm_expr(v2))
        )

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        b = batch_df.select(self.id_col, self.vec_col).localCheckpoint(eager=True)
        n_in = b.count()
        if n_in == 0:
            self.history.append(
                {"batch_id": batch_id, "n_vecs": 0, "n_exact": 0, "n_near": 0, "n_kept": 0}
            )
            return

        bb = maybe_checkpoint(
            signlsh_bands(
                b,
                n_planes=self.n_planes,
                bands=self.bands,
                c_id=self.id_col,
                c_vec=self.vec_col,
                seed=self.seed,
                dim=self.dim,
            )
        )

        # intra-batch duplicates: identical full signatures nominate a
        # candidate pair (id, bucket-first), keep-first by id — but a
        # full signature is a 32-bit hash, NOT vector equality, so the
        # exact cosine verifies each pair before anything is dropped
        # (two distinct sub-threshold vectors collide on all bits with
        # ~(1 - theta/pi)^n_planes probability)
        full_sig = bb.groupBy(self.id_col).agg(
            F.concat_ws(
                "|",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("band_idx", "band_bits"))),
                    lambda s: s["band_bits"],
                ),
            ).alias("_sig")
        )
        first_per_sig = full_sig.groupBy("_sig").agg(
            F.min(self.id_col).alias("_first")
        )
        sig_pairs = (
            full_sig.join(first_per_sig, "_sig")
            .filter(F.col(self.id_col) != F.col("_first"))
            .select(self.id_col, "_first")
        )
        bv1 = b.select(self.id_col, F.col(self.vec_col).alias("_v1"))
        bv2 = b.select(
            F.col(self.id_col).alias("_first"), F.col(self.vec_col).alias("_v2")
        )
        exact_dups = (
            sig_pairs.join(bv1, self.id_col)
            .join(bv2, "_first")
            .filter(
                self._cosine(F.col("_v1"), F.col("_v2")) >= F.lit(self.threshold)
            )
            .select(self.id_col)
        )

        # candidates vs index: shared (band_idx, band_bits) bucket
        ref_id = f"_ref_{self.id_col}"
        cand = (
            bb.join(
                self.band_index.withColumnRenamed(self.id_col, ref_id),
                ["band_idx", "band_bits"],
            )
            .select(self.id_col, ref_id)
            .distinct()
        )
        # exact cosine verify over candidates only
        bv = b.withColumnRenamed(self.vec_col, "_bv")
        rv = self.corpus.select(
            F.col(self.id_col).alias(ref_id), F.col(self.vec_col).alias("_rv")
        )
        near_ids = (
            cand.join(bv, self.id_col)
            .join(rv, ref_id)
            .filter(self._cosine(F.col("_bv"), F.col("_rv")) >= F.lit(self.threshold))
            .select(self.id_col)
            .distinct()
        )
        near_ids = maybe_checkpoint(near_ids)
        n_near = near_ids.count()
        n_exact = exact_dups.count()

        kept = (
            b.join(near_ids, self.id_col, "anti")
            .join(exact_dups, self.id_col, "anti")
            .localCheckpoint(eager=True)
        )
        n_kept = kept.count()
        self.history.append(
            {
                "batch_id": batch_id,
                "n_vecs": n_in,
                "n_exact": int(n_exact),
                "n_near": int(n_near),
                "n_kept": int(n_kept),
            }
        )
        if self.grow_index and n_kept:
            kept_sig = maybe_checkpoint(bb.join(kept.select(self.id_col), self.id_col))
            self.band_index = self.band_index.unionByName(kept_sig)
            self.corpus = self.corpus.select(self.id_col, self.vec_col).unionByName(
                kept.select(self.id_col, self.vec_col)
            )
            self._since_compact += 1
            if self.compact_every is not None and self._since_compact >= self.compact_every:
                self.compact()
        if self.on_kept is not None:
            self.on_kept(kept, batch_id)

    def attach(
        self,
        stream_df: DataFrame,
        checkpoint: str | None = None,
        trigger_seconds: int = 5,
        available_now: bool = False,
    ) -> StreamingQuery:
        return attach_foreach_batch(
            stream_df, self.process_batch, checkpoint, trigger_seconds, available_now
        )
