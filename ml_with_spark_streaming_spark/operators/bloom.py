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

from ..lineage import maybe_checkpoint

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
    # knob + positions share one pass; maybe_checkpoint (not a raw
    # localCheckpoint) so lint's full-lineage mode sees the scan and no
    # eager job fires at plan-construction time under that mode.
    vs = maybe_checkpoint(vs)
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
    ``n_hashes`` bits set. Carries every other probe column through
    and PRESERVES input multiplicity: the membership test runs once
    per DISTINCT key, then the 1/0 flag is broadcast-joined back onto
    the original rows (the ingest_dedup flag-join shape), so duplicate
    probe rows stay duplicated — safe as a fact-table prefilter. The
    flag table is distinct-probe-key-sized; at fact scale where that
    no longer broadcasts, probe the already-distinct key table and
    semi-join instead.
    """
    keys = probe.select(F.col(key).cast("string").alias("_v")).distinct()
    ex = (
        keys.crossJoin(F.broadcast(knob))
        .select(
            "_v",
            "m",
            F.explode(F.array(*[F.lit(i) for i in range(n_hashes)])).alias("i"),
        )
        .selectExpr(
            "_v",
            BLOOM_HASH_SPARK.format(v="_v", i="CAST(i AS STRING)", m="m") + " AS h",
        )
        .selectExpr("_v", "h div 32 AS word_idx", "CAST(h % 32 AS INT) AS bit")
    )
    hits = ex.join(F.broadcast(bitmap), "word_idx", "left").selectExpr(
        "_v",
        "CAST((shiftright(coalesce(word, CAST(0 AS BIGINT)), bit) & 1) AS INT) AS hit",
    )
    flags = hits.groupBy("_v").agg(
        (F.sum("hit") == F.lit(n_hashes)).cast("int").alias("bloom_positive")
    )
    flagged = probe.withColumn("_pk", F.col(key).cast("string")).join(
        F.broadcast(flags), F.col("_pk").eqNullSafe(F.col("_v")), "left"
    )
    return flagged.select(*probe.columns, "bloom_positive")
