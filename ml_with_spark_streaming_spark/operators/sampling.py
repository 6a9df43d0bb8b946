"""Deterministic, layout-independent sampling.

``df.sample()`` / ``sampleBy()`` draw per-partition, so the selected
rows change with partitioning, file order, and executor count — a
reproducibility bug for training-data pipelines (and unusable under
this repo's DuckDB-oracle gate). These operators sample by CONTENT:
keep a row iff the first 8 hex chars of md5(key # salt) fall below a
fraction-of-2^32 threshold.

The comparison is done on the hex STRINGS: for fixed-width lowercase
hex, lexicographic order equals numeric order ('0'-'9' < 'a'-'f' in
ASCII), so the predicate is one md5 + one string compare — fully
inside whole-stage codegen, identical in any engine with md5 (the
DuckDB oracle runs the same expression verbatim).

Properties: sampling is a pure function of (key, salt) — stable across
reruns, partitionings, and engines; changing the salt draws a fresh
independent sample; the same key is selected consistently in every
table (correlated sampling across fact tables for free).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hash_bucket(key: Column, salt: str) -> Column:
    """First 32 bits of md5(key # salt), as 8 lowercase hex chars."""
    return F.substring(
        F.md5(F.encode(F.concat_ws("#", key.cast("string"), F.lit(salt)), "UTF-8")), 1, 8
    )


def fraction_threshold(fraction: float) -> str:
    """The threshold string under which an 8-hex-char bucket falls with
    probability ``fraction``. fraction=1.0 returns "g" — greater than
    every hex string — so a full sample keeps EVERY row (clamping to
    'ffffffff' with a strict < would drop keys hashing exactly there)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    bucket = int(fraction * 2**32)
    if bucket >= 2**32:
        return "g"
    return format(bucket, "08x")


def hash_sample(df: DataFrame, key_col: str, fraction: float, salt: str = "sample") -> DataFrame:
    """Keep ~``fraction`` of rows, selected deterministically by key."""
    return df.filter(_hash_bucket(F.col(key_col), salt) < fraction_threshold(fraction))


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample dominant
    classes). Strata absent from ``fractions`` are dropped (threshold
    '00000000'). One when-chain — still a single codegen'd predicate."""
    thr = F.lit("00000000")
    for stratum, frac in sorted(fractions.items()):
        thr = F.when(F.col(stratum_col) == stratum, F.lit(fraction_threshold(frac))).otherwise(thr)
    return df.filter(_hash_bucket(F.col(key_col), salt) < thr)


def training_order(
    df: DataFrame, key_col: str = "doc_id", n_shards: int = 16, salt: str = "shuffle"
) -> DataFrame:
    """Reproducible global shuffle for training export: assign every
    row a shard and a position within that shard, both pure functions
    of (key, salt) — the order a training run reads is identical
    across reruns, partitionings, executor counts, and engines
    (``ORDER BY rand()`` is none of those, and a global ``ORDER BY
    hash`` is a full sort). Changing the salt draws a fresh
    independent permutation (epoch reshuffle).

    Returns ``(key_col, shard, pos)``: shard = first 32 md5 bits mod
    ``n_shards`` (uniform, so shard sizes concentrate at n/S), pos =
    rank of the full 128-bit md5 within the shard (key tie-break —
    total order even on hash collisions).

    Scale shape: ONE exchange keyed by shard. The per-shard rank is a
    window here so positions are oracle-checkable; the production
    write path doesn't materialize pos at all — it is
    ``repartition(shard).sortWithinPartitions(hx, key)`` straight into
    the shard files, same order, no second shuffle, and S is chosen
    ~ the target file count so partitions stay write-sized.
    """
    from pyspark.sql import Window as W

    hx = F.md5(
        F.encode(F.concat_ws("#", F.col(key_col).cast("string"), F.lit(salt)), "UTF-8")
    )
    shard = (
        F.conv(F.substring(hx, 1, 8), 16, 10).cast("long") % F.lit(n_shards)
    ).alias("shard")
    w = W.partitionBy("shard").orderBy("_hx", key_col)
    return (
        df.select(F.col(key_col), hx.alias("_hx"), shard)
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select(key_col, "shard", "pos")
    )
