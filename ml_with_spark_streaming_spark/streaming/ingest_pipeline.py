"""The composed ingest pipeline: dedup -> decontaminate -> quality ->
perplexity, per micro-batch — the full accept/reject path a production
corpus runs at the door (novelty first, so later gates never score
documents about to be discarded as duplicates; benchmark overlap
second; the cheap classifier gate third; the LM perplexity gate last,
on the smallest surviving slice; all gates are the EXACT batch
operators, so stream verdicts equal batch verdicts).

Composes ``StreamingIngestDedup`` (q105's gates against the corpus
fingerprint/band indexes), an optional ``StreamingEmbeddingDedup``
(the semantic near-dup gate over a carried ``embedding`` column —
runs right after text dedup, so a paraphrase that shares no shingle
with the corpus is still caught by its vector), an optional
``StreamingSegmentDedup``
(q137's boilerplate REWRITE — runs right after document dedup so
every later gate scores the text that would actually be stored),
an optional ``StreamingSegmentQuality`` (q156's fine-grained quality
REWRITE — cuts low-quality paragraphs right after the dedup rewrite,
stateless), an optional ``StreamingDecontaminationFilter`` (q101's 13-gram eval
overlap), ``StreamingQualityFilter`` (the frozen q112 weight table),
an optional ``StreamingPerplexityFilter`` (the frozen q131 bigram
LM), and an optional ``StreamingDSIRFilter`` (the frozen q135
importance-resampling weight table — the distribution-match gate,
last because it is the most selective), and an optional
``StreamingANNIndexMaintainer`` AFTER acceptance (the serving-index
stage: each batch's fully-accepted vectors — taken from the original
batch, since the rewrite stages drop the vector column — are appended
to the persisted IVF artifact, with drift-triggered refit when
armed, so the ANN index a deployment probes always reflects exactly
the accepted corpus). Each stage keeps its own
per-batch history; the pipeline adds a combined ledger row per
batch: (n_in, n_after_dedup, n_after_rewrite, n_after_decon,
n_after_quality, n_accepted) — where n_accepted is whatever the LAST
configured gate kept.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ml_with_spark_streaming_spark.streaming.ann_index_maintainer import (
    StreamingANNIndexMaintainer,
)
from ml_with_spark_streaming_spark.streaming.decon_filter import (
    StreamingDecontaminationFilter,
)
from ml_with_spark_streaming_spark.streaming.dsir_filter import StreamingDSIRFilter
from ml_with_spark_streaming_spark.streaming.embedding_dedup_filter import (
    StreamingEmbeddingDedup,
)
from ml_with_spark_streaming_spark.streaming.foreach import attach_foreach_batch
from ml_with_spark_streaming_spark.streaming.ingest_dedup import StreamingIngestDedup
from ml_with_spark_streaming_spark.streaming.perplexity_filter import (
    StreamingPerplexityFilter,
)
from ml_with_spark_streaming_spark.streaming.quality_filter import StreamingQualityFilter
from ml_with_spark_streaming_spark.streaming.segment_dedup_filter import (
    StreamingSegmentDedup,
)
from ml_with_spark_streaming_spark.streaming.segment_quality_filter import (
    StreamingSegmentQuality,
)


@dataclass
class StreamingIngestPipeline:
    """Chain the dedup, (optional) decontamination, quality, and
    (optional) perplexity gates over one document stream.

    ``on_accepted`` receives each batch's fully-accepted slice (novel,
    clean of eval overlap, high-quality, AND in-distribution under the
    reference LM) — the write-to-storage hook.
    """

    dedup: StreamingIngestDedup
    quality: StreamingQualityFilter
    embdedup: StreamingEmbeddingDedup | None = None
    segdedup: StreamingSegmentDedup | None = None
    segquality: StreamingSegmentQuality | None = None
    decon: StreamingDecontaminationFilter | None = None
    perplexity: StreamingPerplexityFilter | None = None
    dsir: StreamingDSIRFilter | None = None
    # the serving-index stage AFTER acceptance: each batch's
    # fully-accepted vectors are appended to the persisted IVF artifact
    # (and refit on drift when the maintainer is armed) — the index a
    # deployment probes always reflects exactly the accepted corpus
    ann_maintainer: StreamingANNIndexMaintainer | None = None
    # one coalesce+checkpoint at the door: micro-batches are
    # scheduling-bound on wide default partitionings (the embedding
    # gate's measured lesson), and checkpointing here makes the source
    # parse exactly once instead of per-stage. None disables.
    batch_partitions: int | None = 8
    on_accepted: object = None
    ledger: list[dict] = field(default_factory=list)

    def __post_init__(self) -> None:
        # the pipeline drives the stages through their on_kept hooks;
        # user-supplied stage hooks are preserved and still called
        self._dedup_hook = self.dedup.on_kept
        self._emb_hook = self.embdedup.on_kept if self.embdedup is not None else None
        self._seg_hook = self.segdedup.on_kept if self.segdedup is not None else None
        self._segq_hook = (
            self.segquality.on_kept if self.segquality is not None else None
        )
        self._decon_hook = self.decon.on_kept if self.decon is not None else None
        self._quality_hook = self.quality.on_kept
        self._ppl_hook = self.perplexity.on_kept if self.perplexity is not None else None
        self._dsir_hook = self.dsir.on_kept if self.dsir is not None else None

    @classmethod
    def build(
        cls,
        corpus: DataFrame,
        weights: list[tuple[str, int]],
        eval_corpus: DataFrame | None = None,
        embedding_corpus: DataFrame | None = None,
        embedding_threshold: float = 0.95,
        embedding_verify_mode: str = "broadcast",
        embedding_bucket_partitions: int | None = None,
        vec_col: str = "embedding",
        segment_width: int | None = None,
        segment_quality_threshold_x100: int | None = None,
        perplexity_threshold_x1e6: int | None = None,
        dsir_weights: list[tuple[int, int]] | None = None,
        dsir_n_buckets: int = 512,
        ann_n_centroids: int | None = None,
        ann_refit_skew_threshold: float | None = None,
        on_accepted: object = None,
        **dedup_kw,
    ) -> "StreamingIngestPipeline":
        # all gates must read the same columns
        col_kw = {k: dedup_kw[k] for k in ("id_col", "text_col") if k in dedup_kw}
        decon = (
            StreamingDecontaminationFilter.from_eval_corpus(
                eval_corpus, text_col=col_kw.get("text_col", "text"),
                id_col=col_kw.get("id_col", "doc_id"),
            )
            if eval_corpus is not None
            else None
        )
        ppl = (
            StreamingPerplexityFilter.from_corpus(
                corpus, threshold_x1e6=perplexity_threshold_x1e6, **col_kw
            )
            if perplexity_threshold_x1e6 is not None
            else None
        )
        dsir = (
            StreamingDSIRFilter(
                weights=dsir_weights, n_buckets=dsir_n_buckets, **col_kw
            )
            if dsir_weights is not None
            else None
        )
        embdedup = (
            StreamingEmbeddingDedup.from_corpus(
                embedding_corpus,
                id_col=col_kw.get("id_col", "doc_id"),
                vec_col=vec_col,
                threshold=embedding_threshold,
                verify_mode=embedding_verify_mode,
                bucket_partitions=embedding_bucket_partitions,
            )
            if embedding_corpus is not None
            else None
        )
        segdedup = (
            StreamingSegmentDedup.from_corpus(corpus, width=segment_width, **col_kw)
            if segment_width is not None
            else None
        )
        segquality = (
            StreamingSegmentQuality(
                width=segment_width if segment_width is not None else 10,
                threshold_x100=segment_quality_threshold_x100,
                **col_kw,
            )
            if segment_quality_threshold_x100 is not None
            else None
        )
        ann = None
        if ann_n_centroids is not None:
            if embedding_corpus is None:
                raise ValueError("ann_n_centroids requires embedding_corpus")
            from ml_with_spark_streaming_spark.operators.ann_index import IVFIndex

            idc = col_kw.get("id_col", "doc_id")
            ann = StreamingANNIndexMaintainer(
                index=IVFIndex.build(
                    embedding_corpus,
                    n_centroids=ann_n_centroids,
                    c_id=idc,
                    c_vec=vec_col,
                ),
                id_col=idc,
                vec_col=vec_col,
                corpus=embedding_corpus,
                refit_skew_threshold=ann_refit_skew_threshold,
            )
        return cls(
            dedup=StreamingIngestDedup.from_corpus(corpus, **dedup_kw),
            quality=StreamingQualityFilter(weights=weights, **col_kw),
            embdedup=embdedup,
            segdedup=segdedup,
            segquality=segquality,
            decon=decon,
            perplexity=ppl,
            dsir=dsir,
            ann_maintainer=ann,
            on_accepted=on_accepted,
        )

    def save_state(self, path: str) -> None:
        """Persist the WHOLE door as one unit: every configured gate's
        index/model artifacts (each via its own ``save_*`` contract,
        so compaction + params sidecars apply) plus one pipeline
        manifest carrying the stage configuration, the frozen scalar
        weights, and the ledger. The manifest is written LAST and
        atomically (tmp + rename): a crash mid-save leaves no
        committed manifest, and ``from_state`` refuses to resume from
        an uncommitted directory — the SCD2 state discipline applied
        to the composed pipeline."""
        import json
        import os

        os.makedirs(path, exist_ok=True)
        self.dedup.save_index(os.path.join(path, "dedup_index"))
        if self.embdedup is not None:
            self.embdedup.save_index(os.path.join(path, "emb_index"))
        if self.segdedup is not None:
            self.segdedup.save_index(os.path.join(path, "seg_index"))
        if self.decon is not None:
            self.decon.save_grams(os.path.join(path, "decon_grams"))
        if self.perplexity is not None:
            self.perplexity.save_model(os.path.join(path, "ppl_model"))
        if self.ann_maintainer is not None:
            self.ann_maintainer.save(os.path.join(path, "ann_index"))
        manifest = {
            "id_col": self.dedup.id_col,
            "text_col": self.dedup.text_col,
            "dedup": {
                "grow_index": self.dedup.grow_index,
                "compact_every": self.dedup.compact_every,
                "bloom_prefilter": self.dedup.bloom_prefilter,
            },
            "quality": {"weights": [[fb, int(w)] for fb, w in self.quality.weights]},
            "embdedup": (
                None
                if self.embdedup is None
                else {
                    "vec_col": self.embdedup.vec_col,
                    "grow_index": self.embdedup.grow_index,
                    "compact_every": self.embdedup.compact_every,
                    "dim": self.embdedup.dim,
                    "verify_mode": self.embdedup.verify_mode,
                    # bucket_partitions rides in the gate's own params
                    # sidecar (save_index) and is restored from it
                }
            ),
            "segdedup": (
                None
                if self.segdedup is None
                else {
                    "grow_index": self.segdedup.grow_index,
                    "compact_every": self.segdedup.compact_every,
                }
            ),
            "segquality": (
                None
                if self.segquality is None
                else {
                    "width": self.segquality.width,
                    "threshold_x100": self.segquality.threshold_x100,
                }
            ),
            "decon": (
                None
                if self.decon is None
                else {"bench_names": self.decon.bench_names}
            ),
            "perplexity": (
                None
                if self.perplexity is None
                else {
                    "threshold_x1e6": self.perplexity.threshold_x1e6,
                    "keep_unscored": self.perplexity.keep_unscored,
                }
            ),
            "dsir": (
                None
                if self.dsir is None
                else {
                    "weights": [[int(b), int(w)] for b, w in self.dsir.weights],
                    "n_buckets": self.dsir.n_buckets,
                }
            ),
            "ann_maintainer": (
                None
                if self.ann_maintainer is None
                else {
                    "vec_col": self.ann_maintainer.vec_col,
                    "refit_skew_threshold": self.ann_maintainer.refit_skew_threshold,
                }
            ),
            "ledger": self.ledger,
        }
        tmp = os.path.join(path, "MANIFEST.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(path, "MANIFEST.json"))

    @classmethod
    def from_state(
        cls,
        spark,
        path: str,
        corpus: DataFrame,
        on_accepted: object = None,
        ann_corpus: DataFrame | None = None,
    ) -> "StreamingIngestPipeline":
        """Resume the whole door from ``save_state`` artifacts — no
        corpus/eval/LM rescans; every gate loads its persisted index
        or frozen weights, and the ledger continues where it left off.
        ``corpus`` is the stored document corpus (the text-dedup
        gate's verify side — in production the durable doc store, so
        it is an input here, not part of the state dir)."""
        import json
        import os

        mpath = os.path.join(path, "MANIFEST.json")
        if not os.path.exists(mpath):
            raise FileNotFoundError(
                f"no committed pipeline manifest at {mpath} — "
                "save_state did not complete"
            )
        with open(mpath) as f:
            m = json.load(f)
        col_kw = {"id_col": m["id_col"], "text_col": m["text_col"]}
        dedup = StreamingIngestDedup.from_index_path(
            spark,
            corpus,
            os.path.join(path, "dedup_index"),
            grow_index=m["dedup"]["grow_index"],
            compact_every=m["dedup"]["compact_every"],
            bloom_prefilter=m["dedup"]["bloom_prefilter"],
            **col_kw,
        )
        quality = StreamingQualityFilter(
            weights=[(fb, int(w)) for fb, w in m["quality"]["weights"]], **col_kw
        )
        embdedup = None
        if m["embdedup"] is not None:
            embdedup = StreamingEmbeddingDedup.from_index_path(
                spark,
                os.path.join(path, "emb_index"),
                id_col=m["id_col"],
                vec_col=m["embdedup"]["vec_col"],
                grow_index=m["embdedup"]["grow_index"],
                compact_every=m["embdedup"]["compact_every"],
                dim=m["embdedup"]["dim"],
                verify_mode=m["embdedup"].get("verify_mode", "broadcast"),
            )
        segdedup = None
        if m["segdedup"] is not None:
            segdedup = StreamingSegmentDedup.from_index_path(
                spark,
                os.path.join(path, "seg_index"),
                grow_index=m["segdedup"]["grow_index"],
                compact_every=m["segdedup"]["compact_every"],
                **col_kw,
            )
        segquality = None
        if m["segquality"] is not None:
            segquality = StreamingSegmentQuality(
                width=m["segquality"]["width"],
                threshold_x100=m["segquality"]["threshold_x100"],
                **col_kw,
            )
        decon = None
        if m["decon"] is not None:
            decon = StreamingDecontaminationFilter.from_grams_path(
                spark,
                os.path.join(path, "decon_grams"),
                bench_names=m["decon"]["bench_names"],
                **col_kw,
            )
        ppl = None
        if m["perplexity"] is not None:
            ppl = StreamingPerplexityFilter.from_model_path(
                spark,
                os.path.join(path, "ppl_model"),
                threshold_x1e6=m["perplexity"]["threshold_x1e6"],
                keep_unscored=m["perplexity"]["keep_unscored"],
                **col_kw,
            )
        dsir = None
        if m["dsir"] is not None:
            dsir = StreamingDSIRFilter(
                weights=[(int(b), int(w)) for b, w in m["dsir"]["weights"]],
                n_buckets=m["dsir"]["n_buckets"],
                **col_kw,
            )
        ann = None
        if m.get("ann_maintainer") is not None:
            # the refit corpus resumes as (stored base corpus vectors =
            # the saved index's own accepted set is already inside the
            # artifact's `accepted` table; base vectors must be re-
            # supplied like `corpus` is for the text gate) — callers
            # pass them via ann_corpus when refit stays armed
            ann = StreamingANNIndexMaintainer.from_index_path(
                spark,
                os.path.join(path, "ann_index"),
                id_col=m["id_col"],
                vec_col=m["ann_maintainer"]["vec_col"],
                corpus=ann_corpus,
                refit_skew_threshold=(
                    m["ann_maintainer"]["refit_skew_threshold"]
                    if ann_corpus is not None
                    else None
                ),
                save_path=os.path.join(path, "ann_index"),
            )
        pipe = cls(
            dedup=dedup,
            quality=quality,
            embdedup=embdedup,
            segdedup=segdedup,
            segquality=segquality,
            decon=decon,
            perplexity=ppl,
            dsir=dsir,
            ann_maintainer=ann,
            on_accepted=on_accepted,
        )
        pipe.ledger.extend(m["ledger"])
        return pipe

    @staticmethod
    def _zero_row(history: list[dict], batch_id: int, keys: tuple[str, ...]) -> None:
        """Keep stage histories aligned with the ledger when an
        upstream gate rejects a whole batch: the downstream stage
        never ran, so record an explicit all-zero row for the batch
        instead of silently skipping it (monitors that align stage
        histories by index would otherwise read the wrong batch)."""
        history.append({"batch_id": batch_id, **{k: 0 for k in keys}})

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if self.batch_partitions is not None:
            batch_df = batch_df.coalesce(self.batch_partitions).localCheckpoint(
                eager=True
            )

        def _after_dedup(kept_df: DataFrame, bid: int) -> None:
            if self._dedup_hook is not None:
                self._dedup_hook(kept_df, bid)
            if self.embdedup is None:
                _after_emb(kept_df, bid, ran_emb=False)
            elif kept_df.isEmpty():
                self._zero_row(
                    self.embdedup.history,
                    bid,
                    ("n_vecs", "n_exact", "n_near", "n_kept"),
                )
                _after_emb(kept_df, bid, ran_emb=False)
            else:
                # the embedding gate emits its kept (id, vec) slice;
                # map back to the full doc rows by id (the stream must
                # carry the vec column when this stage is configured)
                idc = self.embdedup.id_col

                def _emb_done(kept_vecs: DataFrame, b: int) -> None:
                    _after_emb(
                        kept_df.join(kept_vecs.select(idc), idc, "semi"), b
                    )

                self.embdedup.on_kept = _emb_done
                self.embdedup.process_batch(kept_df, bid)

        def _after_emb(kept_df: DataFrame, bid: int, ran_emb: bool = True) -> None:
            if ran_emb and self._emb_hook is not None:
                self._emb_hook(kept_df, bid)
            if self.segdedup is None:
                _after_seg(kept_df, bid, ran_seg=False)
            elif kept_df.isEmpty():
                self._zero_row(
                    self.segdedup.history,
                    bid,
                    ("n_docs", "n_segs", "n_cut", "n_docs_kept"),
                )
                _after_seg(kept_df, bid, ran_seg=False)
            else:
                self.segdedup.on_kept = _after_seg
                self.segdedup.process_batch(kept_df, bid)

        def _after_seg(kept_df: DataFrame, bid: int, ran_seg: bool = True) -> None:
            # the rewrite stage emits (id_col, text_col) only — the
            # surviving text IS the document from here on
            if ran_seg and self._seg_hook is not None:
                self._seg_hook(kept_df, bid)
            if self.segquality is None:
                _after_segq(kept_df, bid, ran_segq=False)
            elif kept_df.isEmpty():
                self._zero_row(
                    self.segquality.history,
                    bid,
                    ("n_docs", "n_segs", "n_cut", "n_docs_kept"),
                )
                _after_segq(kept_df, bid, ran_segq=False)
            else:
                self.segquality.on_kept = _after_segq
                self.segquality.process_batch(kept_df, bid)

        def _after_segq(kept_df: DataFrame, bid: int, ran_segq: bool = True) -> None:
            if ran_segq and self._segq_hook is not None:
                self._segq_hook(kept_df, bid)
            if self.decon is not None:
                if kept_df.isEmpty():
                    self._zero_row(
                        self.decon.history, bid, ("n_docs", "n_contaminated", "n_kept")
                    )
                    _after_decon(kept_df, bid, ran_decon=False)
                else:
                    self.decon.on_kept = _after_decon
                    self.decon.process_batch(kept_df, bid)
            else:
                _after_decon(kept_df, bid, ran_decon=False)

        def _after_decon(clean_df: DataFrame, bid: int, ran_decon: bool = True) -> None:
            if ran_decon and self._decon_hook is not None:
                self._decon_hook(clean_df, bid)
            if clean_df.isEmpty():
                self._zero_row(self.quality.history, bid, ("n_docs", "n_kept"))
                _after_quality(clean_df, bid, ran_quality=False)
            else:
                self.quality.on_kept = _after_quality
                self.quality.process_batch(clean_df, bid)

        def _after_quality(
            accepted_df: DataFrame, bid: int, ran_quality: bool = True
        ) -> None:
            if ran_quality and self._quality_hook is not None:
                self._quality_hook(accepted_df, bid)
            if self.perplexity is None:
                _after_ppl(accepted_df, bid, ran_ppl=False)
            elif accepted_df.isEmpty():
                self._zero_row(
                    self.perplexity.history,
                    bid,
                    ("n_docs", "n_kept", "n_unscored"),
                )
                _after_ppl(accepted_df, bid, ran_ppl=False)
            else:
                self.perplexity.on_kept = _after_ppl
                self.perplexity.process_batch(accepted_df, bid)

        def _after_ppl(final_df: DataFrame, bid: int, ran_ppl: bool = True) -> None:
            if ran_ppl and self._ppl_hook is not None:
                self._ppl_hook(final_df, bid)
            if self.dsir is None:
                _after_dsir(final_df, bid, ran_dsir=False)
            elif final_df.isEmpty():
                self._zero_row(self.dsir.history, bid, ("n_docs", "n_kept"))
                _after_dsir(final_df, bid, ran_dsir=False)
            else:
                self.dsir.on_kept = _after_dsir
                self.dsir.process_batch(final_df, bid)

        def _after_dsir(final_df: DataFrame, bid: int, ran_dsir: bool = True) -> None:
            if ran_dsir and self._dsir_hook is not None:
                self._dsir_hook(final_df, bid)
            if self.ann_maintainer is not None:
                # serving-index stage: the ACCEPTED ids' vectors, taken
                # from the ORIGINAL batch (the rewrite stages drop the
                # vector column), appended to the IVF artifact
                idc = self.ann_maintainer.id_col
                vecs = batch_df.select(idc, self.ann_maintainer.vec_col).join(
                    F.broadcast(final_df.select(idc)), idc, "semi"
                )
                self.ann_maintainer.process_batch(vecs, bid)
            if self.on_accepted is not None:
                self.on_accepted(final_df, bid)

        self.dedup.on_kept = _after_dedup
        self.dedup.process_batch(batch_df, batch_id)
        # the ledger is derived from the stage histories (each stage
        # already counted its batch) — no extra Spark actions
        dh = self.dedup.history[-1]
        emb_h = (
            self.embdedup.history[-1]
            if self.embdedup is not None and self.embdedup.history
            else None
        )
        n_after_emb = emb_h["n_kept"] if emb_h is not None else dh["n_kept"]
        gh = (
            self.segdedup.history[-1]
            if self.segdedup is not None and self.segdedup.history
            else None
        )
        # fall back to the EMBEDDING stage's count (not the text-dedup
        # count): when embdedup is configured but segdedup is not, the
        # rewrite column must reflect what later stages actually saw,
        # or the ledger funnel goes non-monotonic
        n_after_rewrite = gh["n_docs_kept"] if gh is not None else n_after_emb
        sqh = (
            self.segquality.history[-1]
            if self.segquality is not None and self.segquality.history
            else None
        )
        n_after_segq = sqh["n_docs_kept"] if sqh is not None else n_after_rewrite
        ch = self.decon.history[-1] if self.decon is not None else None
        qh = self.quality.history[-1] if self.quality.history else None
        n_after_quality = qh["n_kept"] if qh is not None else 0
        ph = (
            self.perplexity.history[-1]
            if self.perplexity is not None and self.perplexity.history
            else None
        )
        n_after_ppl = ph["n_kept"] if ph is not None else n_after_quality
        sh = (
            self.dsir.history[-1]
            if self.dsir is not None and self.dsir.history
            else None
        )
        self.ledger.append(
            {
                "batch_id": batch_id,
                "n_in": dh["n_docs"],
                "n_after_dedup": dh["n_kept"],
                "n_after_embdedup": n_after_emb,
                "n_after_rewrite": n_after_rewrite,
                "n_after_segquality": n_after_segq,
                "n_after_decon": ch["n_kept"] if ch is not None else n_after_segq,
                "n_after_quality": n_after_quality,
                "n_accepted": sh["n_kept"] if sh is not None else n_after_ppl,
            }
        )

    def attach(
        self,
        docs: DataFrame,
        checkpoint: str | None = None,
        trigger_seconds: int = 5,
        available_now: bool = False,
    ) -> StreamingQuery:
        return attach_foreach_batch(
            docs, self.process_batch, checkpoint, trigger_seconds, available_now
        )
