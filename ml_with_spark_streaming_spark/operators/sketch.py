"""Bounded-memory frequency sketching: Misra-Gries heavy hitters with
an exact verification pass.

The problem shape at 100 TB: "which n-grams repeat most across the
corpus?" (boilerplate discovery, contamination forensics, template
mining). The direct ``explode → groupBy(gram) → count`` is correct but
its map-side combine hash table is GRAM-CARDINALITY-sized per task —
n-gram cardinality grows with the corpus, so at some scale the combine
map spills and the shuffle carries (almost) every distinct gram.

The sketch route bounds memory by THEOREM instead of by hope:

1. **Candidate pass** — each partition runs Misra-Gries with k
   counters over its gram stream (Misra & Gries 1982; the classic
   mergeable heavy-hitters summary). MG guarantee: an item with
   partition count > n_p/(k+1) always survives the partition's
   summary. Pigeonhole across partitions: a gram with GLOBAL count
   > n/(k+1) must exceed n_p/(k+1) in at least one partition — so the
   union of per-partition candidates is a PROVABLE SUPERSET of every
   global heavy hitter, at O(k) memory per task and ≤ P·k candidate
   rows total (broadcastable).
2. **Verify pass** — exact counts for the candidate set only: one
   corpus gram scan, broadcast semi-join against the candidates, one
   vocab-of-candidates-sized groupBy. Output = candidates whose exact
   count clears the threshold ``count·(k+1) > n`` (integer compare; no
   division). Because of (1) this equals the TRUE set of grams with
   count > n/(k+1) — the sketch affects memory, never the answer, so
   the whole operator is DuckDB-oracle-exact despite the Python pass.

The MG pass runs in Python (``mapInPandas``) because Spark has no
bounded-counter aggregate; it is Arrow-batched, touches each row once,
and emits k rows per partition. Its tokenizer is a pinned Python twin
of ``clean_text_expr``/``tokens_expr`` (property-tested equal on the
generator alphabet) so candidates align with the JVM gram table the
verify pass counts.

Reference scope: the reference has no sketches; this extends the
aggregation surface (SURVEY §2.5 approx family: q66 HLL distinct, q109
quantile sketches) with the frequency-sketch member.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ml_with_spark_streaming_spark.functions.text import clean_text_expr, tokens_expr
from ml_with_spark_streaming_spark.lineage import maybe_checkpoint
from ml_with_spark_streaming_spark.operators.dedup import shingles_expr


def py_clean_tokens(text: str) -> list[str]:
    """Python twin of ``tokens_expr(clean_text_expr(.))`` — MUST stay
    in lockstep (pinned by tests/test_sketch.py against the JVM
    expressions on generated strings)."""
    t = re.sub(r"[@#&][A-Za-z0-9-]+", " ", text or "")
    t = re.sub(r"\w+://\S+", " ", t)
    t = re.sub(r"[^A-Za-z]", " ", t)
    t = re.sub(r"\s+", " ", t).lower().strip()
    return t.split(" ") if t else []


def misra_gries(stream, k: int) -> dict:
    """Textbook MG: k counters; on overflow decrement all (removing
    k+1 distinct items' mass). Returns the surviving counters."""
    counters: dict = {}
    for item in stream:
        if item in counters:
            counters[item] += 1
        elif len(counters) < k:
            counters[item] = 1
        else:
            dead = [g for g in counters if counters[g] == 1]
            for g in counters:
                counters[g] -= 1
            for g in dead:
                del counters[g]
    return counters


def mg_candidates(
    df: DataFrame,
    text_col: str = "text",
    k: int = 1023,
    ngram: int = 2,
) -> DataFrame:
    """Per-partition Misra-Gries candidate grams (one ``gram`` column,
    ≤ k rows per partition) — the bounded-memory pass."""

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def stream():
            for pdf in batches:
                for text in pdf[text_col]:
                    toks = py_clean_tokens(text)
                    for i in range(len(toks) - ngram + 1):
                        yield " ".join(toks[i : i + ngram])

        counters = misra_gries(stream(), k)
        if counters:
            yield pd.DataFrame({"gram": list(counters.keys())})

    return df.select(text_col).mapInPandas(part, "gram string")


def frequent_ngrams(
    df: DataFrame,
    text_col: str = "text",
    k: int = 1023,
    ngram: int = 2,
) -> DataFrame:
    """All n-grams with global count > n/(k+1), with EXACT counts —
    sketch-bounded memory, theorem-exact answer. Columns
    ``(gram, cnt)``; n is the total gram count over the corpus."""
    cands = maybe_checkpoint(mg_candidates(df, text_col, k, ngram).distinct())
    toks = df.select(tokens_expr(clean_text_expr(text_col)).alias("_t"))
    toks = toks.repartition(32)  # explode barrier (the q50 Generate trap)
    grams = toks.select(
        F.explode(shingles_expr(F.col("_t"), ngram)).alias("gram")
    )
    grams = maybe_checkpoint(grams)
    total = grams.agg(F.count("*").cast("long").alias("n"))
    exact = (
        grams.join(F.broadcast(cands), "gram")
        .groupBy("gram")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * (k + 1) > F.col("n"))
        .select("gram", "cnt")
    )
