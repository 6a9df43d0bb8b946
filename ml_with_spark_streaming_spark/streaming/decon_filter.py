"""Ingest-time streaming decontamination: q101's 13-gram benchmark
overlap check deployed as a micro-batch gate.

The eval/benchmark n-gram key set is benchmark-sized by definition —
built once (``eval_ngrams``), checkpointed, and broadcast into every
micro-batch; the per-batch cost is one shingle explode over the batch
slice plus the broadcast join (``contamination_counts`` — the exact
plan the batch query q101 runs). Documents sharing ANY eval n-gram are
rejected before they reach storage (the GPT-3 appendix-C policy), so
benchmark material never enters the training corpus in the first
place.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ml_with_spark_streaming_spark.lineage import maybe_checkpoint
from ml_with_spark_streaming_spark.operators.decontaminate import (
    DEFAULT_NGRAM,
    contamination_counts,
    eval_ngrams,
)
from ml_with_spark_streaming_spark.streaming.foreach import attach_foreach_batch


@dataclass
class StreamingDecontaminationFilter:
    """Reject documents overlapping the eval set, per micro-batch.

    ``on_kept`` receives each batch's clean slice; ``history`` records
    per-batch (n_docs, n_contaminated, n_kept).
    """

    eval_grams: DataFrame
    id_col: str = "doc_id"
    text_col: str = "text"
    n: int = DEFAULT_NGRAM
    on_kept: object = None
    history: list[dict] = field(default_factory=list)

    @classmethod
    def from_eval_corpus(
        cls, eval_df: DataFrame, text_col: str = "text", n: int = DEFAULT_NGRAM, **kw
    ) -> "StreamingDecontaminationFilter":
        grams = maybe_checkpoint(eval_ngrams(eval_df, text_col, n))
        return cls(eval_grams=grams, text_col=text_col, n=n, **kw)

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        counts = contamination_counts(
            batch_df, self.eval_grams, self.text_col, self.id_col, self.n
        )
        flagged = batch_df.join(
            counts.select(self.id_col, "keep"), self.id_col
        ).persist()
        try:
            agg = flagged.agg(
                F.count("*").alias("n"),
                F.sum((F.col("keep") == 0).cast("long")).alias("dirty"),
            ).collect()[0]
            self.history.append(
                {
                    "batch_id": batch_id,
                    "n_docs": int(agg["n"]),
                    "n_contaminated": int(agg["dirty"] or 0),
                    "n_kept": int(agg["n"]) - int(agg["dirty"] or 0),
                }
            )
            if self.on_kept is not None:
                self.on_kept(flagged.filter("keep = 1").drop("keep"), batch_id)
        finally:
            flagged.unpersist()

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
