"""Multimodal columns: opaque binary payloads + typed metadata.

Pattern (schemas.MEDIA_ASSETS): ``payload binary`` + ``meta struct`` +
``modality string``. The Spark-side plumbing — schema, partitioning,
Arrow batch shape through mapInPandas — is real and tested; the actual
media decode (PIL/ffmpeg/librosa) is STUBBED because the image/audio
libs are not in this container:

* ``decode_stub="fake"`` (default) derives deterministic pseudo-features
  from the payload bytes — stable, assertable, zero deps;
* ``decode_stub="raise"`` raises NotImplementedError where a real
  decoder would plug in.

At 100 TB: binary payloads ride in parquet alongside metadata;
``spark.sql.files.maxPartitionBytes`` bounds scan-task size, and the
mapInPandas batch size (spark.sql.execution.arrow.maxRecordsPerBatch)
bounds executor memory per Arrow batch — both are the real knobs for
multi-MB payload rows.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "asset_id long, modality string, n_bytes long, first_byte int, byte_sum_mod long"
)


def synthesize_assets(docs: DataFrame, modality: str = "image") -> DataFrame:
    """Deterministic fake media table from the documents fixture:
    payload = utf-8 bytes of the text (oracle-reproducible via
    octet_length/ascii in SQL)."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit(modality).alias("modality"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit(None).cast("string").alias("codec"),
        ).alias("meta"),
    )


def extract_features(assets: DataFrame, decode_stub: str = "fake") -> DataFrame:
    """Per-asset feature extraction over mapInPandas (Arrow batches).

    The real decoder would go where ``_decode`` is; the Spark plumbing
    (binary column in, typed feature row out, per-partition batching)
    is exactly what a PIL/ffmpeg implementation would use.
    """

    def _decode(payload: bytes) -> dict:
        if decode_stub == "raise":
            raise NotImplementedError("media decode requires PIL/ffmpeg — not in this container")
        # deterministic pseudo-features from raw bytes
        return {
            "n_bytes": len(payload),
            "first_byte": payload[0] if payload else -1,
            "byte_sum_mod": sum(payload) % 100000,
        }

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = pdf["payload"].map(lambda p: _decode(bytes(p)))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": feats.map(lambda f: f["n_bytes"]),
                    "first_byte": feats.map(lambda f: f["first_byte"]),
                    "byte_sum_mod": feats.map(lambda f: f["byte_sum_mod"]),
                }
            )

    # prune to the three consumed columns before the opaque Python
    # stage — an unprojected mapInPandas ships (and scans) every asset
    # column, including any metadata struct, into Arrow (guide §4.1)
    return assets.select("asset_id", "modality", "payload").mapInPandas(
        batches, schema=FEATURE_SCHEMA
    )


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (asset, frame_ts).
    Decode is stubbed; the explode/partition shape is the real thing.
    Uses meta.duration_ms when present, else a deterministic duration
    from payload length."""
    duration = F.coalesce(F.col("meta.duration_ms"), (F.length("payload").cast("long") * 10))
    n_frames = F.greatest((duration / every_ms).cast("int"), F.lit(1))
    return assets.select(
        "asset_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)
