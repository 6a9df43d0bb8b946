"""Bloom-filter build/probe as DataFrame dataflow.

The semi-join pruning primitive for 100 TB joins: when a big fact table
joins a filtered dimension, shipping the dimension's key SET is too
big, but shipping a Bloom BITMAP of it is a few KB–MB — the fact scan
then drops non-matching rows BEFORE the shuffle (what Spark's own
runtime row-group filters do; here it is a first-class, inspectable
operator with exact false-positive accounting).

Engine-exact by construction:

* hash_i(v) = first 15 md5 hex chars of ``v || ':' || i`` as BIGINT
  (60 bits, always positive), mod ``m`` — the md5 idiom DuckDB
  reproduces bit-for-bit (see ``operators/dsir.py``).
* ``m`` (bits) is derived from the member count INSIDE the query in
  both engines with integer-only arithmetic: the smallest power of two
  >= bits_per_key*n is ``1 << length(bin(bits_per_key*n - 1))`` —
  ``bin``/``length``/``<<`` exist with identical semantics in Spark
  and DuckDB, so no float log2 boundary can flip the knob.
* the bitmap is 32-bit words (``word_idx = h div 32``): both engines
  shift within non-negative int64 range, no sign-bit edge cases.

Scale shape: build = one distinct + one explode(k) + one word-keyed
``bit_or`` groupBy; the bitmap (m/32 rows) broadcasts. Probe = one
explode(k) + one broadcast join + one key-grouped count — the probed
fact table never shuffles on the filter key. k is fixed (default 5,
near-optimal for 8 bits/key: k* = (m/n)·ln2 ≈ 5.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# {v}: string expr for the key; {i}: string expr for the hash index;
# {m}: expr for the bit-domain size
BLOOM_HASH_SPARK = (
    "(CAST(conv(substr(md5({v} || ':' || {i}), 1, 15), 16, 10) AS BIGINT) % {m})"
)
BLOOM_HASH_DUCK = (
    "(CAST(('0x' || substr(md5({v} || ':' || {i}), 1, 15)) AS BIGINT) % {m})"
)

# smallest power of two >= bits_per_key * n, integer-only, both dialects
BLOOM_BITS_SQL = "CAST(shiftleft(1, length(bin(greatest({bpk} * {n} - 1, 1)))) AS BIGINT)"
BLOOM_BITS_DUCK = "CAST((1 << length(bin(greatest({bpk} * {n} - 1, 1)))) AS BIGINT)"


def derive_bloom_knobs(n_keys: int, bits_per_key: int = 8) -> tuple[int, int]:
    """(n_bits, n_hashes) for ``n_keys`` members: next-pow2(bpk*n) bits,
    k fixed at 5 (optimal for 8 bpk). Python twin of the in-query
    derivation, used by tests and by callers who know n up front."""
    x = max(bits_per_key * n_keys - 1, 1)
    return 1 << x.bit_length(), 5


def bloom_words(
    members: DataFrame, key: str, knob: DataFrame, n_hashes: int = 5
) -> DataFrame:
    """(word_idx, word) bitmap rows for ``members.key`` under an
    EXISTING bit-domain ``knob`` (1-row DF with column ``m``) — the
    incremental-build primitive: new member slices hash under the same
    domain so their words OR into an existing bitmap
    (:func:`bloom_or`). Adding members can only saturate the filter
    (raise fp rate), never break the no-false-negative guarantee."""
    pos = (
        members.select(F.col(key).cast("string").alias("v"))
        .distinct()
        .crossJoin(F.broadcast(knob))
        .select(
            "v",
            "m",
            F.explode(F.array(*[F.lit(i) for i in range(n_hashes)])).alias("i"),
        )
        .selectExpr(
            BLOOM_HASH_SPARK.format(v="v", i="CAST(i AS STRING)", m="m") + " AS h"
        )
    )
    return (
        pos.selectExpr("h div 32 AS word_idx", "CAST(h % 32 AS INT) AS bit")
        .groupBy("word_idx")
        .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), bit))").alias("word"))
    )


def bloom_or(a: DataFrame, b: DataFrame) -> DataFrame:
    """OR two bitmaps built under the SAME knob back into unique
    word_idx rows (probe logic requires one row per word). O(bitmap)
    work — independent of how many members either side encoded."""
    return (
        a.unionByName(b).groupBy("word_idx").agg(F.expr("bit_or(word)").alias("word"))
    )


def bloom_build(
    members: DataFrame, key: str, bits_per_key: int = 8, n_hashes: int = 5
) -> tuple[DataFrame, DataFrame]:
    """Build a Bloom bitmap over the distinct values of ``members.key``.

    Returns ``(knob, bitmap)``: ``knob`` is a 1-row DF with column
    ``m`` (bit-domain size, derived in-plan from the member count);
    ``bitmap`` has ``(word_idx, word)`` rows — 32-bit words, only
    nonzero words present. Both are O(m) small and meant to broadcast.
    """
    vs = members.select(F.col(key).cast("string").alias("v")).distinct()
    vs = vs.localCheckpoint(eager=True)  # knob + positions share one pass
    knob = vs.agg(F.count("*").alias("n")).selectExpr(
        BLOOM_BITS_SQL.format(bpk=bits_per_key, n="n") + " AS m"
    )
    return knob, bloom_words(vs, "v", knob, n_hashes)


def bloom_probe(
    probe: DataFrame,
    key: str,
    knob: DataFrame,
    bitmap: DataFrame,
    n_hashes: int = 5,
) -> DataFrame:
    """Flag each probe row with ``bloom_positive`` (1/0): all
    ``n_hashes`` bits set. Carries every other probe column through.
    One explode + one broadcast join + one groupBy on the probe's full
    column set (callers probe on a unique key or accept grouped rows).
    """
    carry = [c for c in probe.columns]
    ex = (
        probe.withColumn("_v", F.col(key).cast("string"))
        .crossJoin(F.broadcast(knob))
        .select(
            *carry,
            "_v",
            "m",
            F.explode(F.array(*[F.lit(i) for i in range(n_hashes)])).alias("i"),
        )
        .selectExpr(
            *carry,
            BLOOM_HASH_SPARK.format(v="_v", i="CAST(i AS STRING)", m="m") + " AS h",
        )
        .selectExpr(*carry, "h div 32 AS word_idx", "CAST(h % 32 AS INT) AS bit")
    )
    hits = ex.join(F.broadcast(bitmap), "word_idx", "left").selectExpr(
        *carry,
        "CAST((shiftright(coalesce(word, CAST(0 AS BIGINT)), bit) & 1) AS INT) AS hit",
    )
    return hits.groupBy(*carry).agg(
        (F.sum("hit") == F.lit(n_hashes)).cast("int").alias("bloom_positive")
    )
