"""Distributed byte-level BPE vocabulary TRAINING.

``functions/bpe.py`` trains its merge table at import, driver-local, on
a fixed seed corpus — honest but toy-sized. Training the tokenizer on
the corpus itself is a classic iterative Spark job (Sennrich et al.
2016 §3.2 scaled out), and this module implements it so the merge
table q102/q103 consume can come from the data:

* ONE corpus pass: pre-tokenize (Arrow pandas UDF — the only Python
  data-path stage) → explode → ``groupBy(word).count()``. Everything
  after runs on the WORD-COUNT table, whose size is the distinct
  pre-token vocabulary (Zipf-bounded, ~10^5-10^6 rows at 100 TB — 5+
  orders below corpus size);
* per merge round: adjacent-pair explode + one ``groupBy(pair).sum``
  (map-side combinable) → the argmax pair via ``orderBy().limit(1)``
  (TakeOrdered: per-partition partial top-1, ONE row to the driver per
  round — exactly the O(1) driver boundary an iterative distributed
  algorithm wants);
* the winning merge is applied JVM-side (a left-to-right
  ``F.aggregate`` fold over each word's byte-parts — no Python in the
  round loop), words fully merged to one part drop out of future
  rounds, and the lineage is truncated per round (``localCheckpoint``,
  the iterative-loop pattern of ``operators/graph.py``).

Determinism = the in-process trainer's rule exactly: max pair count,
ties broken by (left, right) bytes ascending — Spark's BINARY ordering
is unsigned-lexicographic, the same total order as Python ``bytes``
(pinned by the equality fixture test in tests/test_bpe_train.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ml_with_spark_streaming_spark.functions.bpe import _pretokens


@F.pandas_udf(T.ArrayType(T.StringType()))
def _pretokenize_udf(texts: pd.Series) -> pd.Series:
    """GPT-2-style pre-token split (functions/bpe.py's ASCII pattern)."""
    return texts.map(lambda t: _pretokens(t) if t else [])


@F.pandas_udf(T.ArrayType(T.BinaryType()))
def _to_byte_parts_udf(words: pd.Series) -> pd.Series:
    """A pre-token as its initial byte-unit sequence."""
    return words.map(lambda w: [bytes([b]) for b in w.encode("utf-8")])


def _pair_structs(parts: Column) -> Column:
    """Adjacent (a, b) part pairs of one word (empty when < 2 parts)."""
    idx = F.when(
        F.size(parts) >= 2, F.sequence(F.lit(1), F.size(parts) - 1)
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(parts, i).alias("a"), F.element_at(parts, i + 1).alias("b")
        ),
    )


def _apply_merge(parts: Column, a: bytes, b: bytes) -> Column:
    """Left-to-right greedy application of ONE merge (a, b) — the fold
    mirrors the in-process trainer's scan: after merging, the new last
    element is a+b, which can itself match ``a`` for the next input
    (e.g. merge (aa, a) over [aa, a, a]). ``F.get`` (not element_at)
    so the empty-accumulator probe is NULL-safe under ANSI."""
    la, lb = F.lit(a), F.lit(b)
    return F.aggregate(
        parts,
        F.array().cast("array<binary>"),
        lambda acc, x: F.when(
            (F.get(acc, F.size(acc) - 1) == la) & (x == lb),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(F.get(acc, F.size(acc) - 1), x)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe_distributed(
    df: DataFrame, text_col: str = "text", n_merges: int = 64, vocab_partitions: int = 4
) -> list[tuple[bytes, bytes]]:
    """Learn ``n_merges`` byte-pair merges from a corpus DataFrame.

    Returns the merge list in training order — the exact artifact
    ``functions.bpe.make_ranks`` / ``bpe_token_count_series_for``
    consume, and bit-equal to ``functions.bpe.train_bpe`` run on the
    collected corpus (fixture-tested). Driver state: one (a, b) row per
    round + the final O(n_merges) list.

    ``vocab_partitions`` pins the word table's layout for the round
    loop: it is vocab-sized (not corpus-sized), so the per-round jobs
    want few fat tasks, not the corpus scan's shuffle width — size it
    ~vocab_rows/1e6 on a real cluster.
    """
    words = (
        df.select(F.explode(_pretokenize_udf(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    wt = (
        words.select(_to_byte_parts_udf("w").alias("parts"), "cnt")
        .filter(F.size("parts") >= 2)
        .repartition(vocab_partitions)
        .localCheckpoint()
    )
    merges: list[tuple[bytes, bytes]] = []
    for _ in range(n_merges):
        top = (
            wt.select(F.explode(_pair_structs(F.col("parts"))).alias("p"), "cnt")
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = bytes(top[0]["a"]), bytes(top[0]["b"])
        merges.append((a, b))
        # lazy checkpoint: still truncates lineage (one fold per round,
        # never a growing expression tree), but materializes WITH the
        # next round's pair-count job — one Spark job per round, not two
        wt = (
            wt.select(_apply_merge(F.col("parts"), a, b).alias("parts"), "cnt")
            .filter(F.size("parts") >= 2)
            .localCheckpoint(eager=False)
        )
    return merges
