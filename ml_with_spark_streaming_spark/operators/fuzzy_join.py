"""Fuzzy string self-join (record linkage / entity resolution): all
pairs of strings within Levenshtein distance ``k``, found WITHOUT the
quadratic all-pairs scan.

Blocking is the q-gram prefix filter (Gravano et al., VLDB 2001;
Xiao et al. ED-Join, VLDB 2008), and it is LOSSLESS — the candidate
set provably contains every true pair, so the verified result equals
the nested-loop answer bit-for-bit (the DuckDB oracle computes the
direct formulation):

* an edit operation destroys at most ``q`` q-gram TYPES, so
  ``dist(a,b) <= k  =>  |G(a) ∩ G(b)| >= max(|G(a)|,|G(b)|) - k·q``
  over the DISTINCT q-gram sets;
* by the prefix-filter theorem, two sets with overlap >= t must
  intersect within their ``|G| - t + 1`` smallest elements under any
  global total order — with ``t >= |G| - k·q`` that prefix is at most
  ``k·q + 1`` grams, ordered rarest-first (ascending document
  frequency) so the posting join never touches hot grams;
* strings with ``|G| <= k·q`` (the bound degenerates to 0) cannot be
  pruned by gram overlap at all: they are routed through a broadcast
  length-band nested loop instead (bounded: such strings are shorter
  than ~``(k+1)·q`` characters, a tiny fixed-size set).

The join runs over the DISTINCT string domain — production record
linkage always reconciles the value domain first (domain size <<
corpus size), then broadcast-joins verdicts back onto rows.

Scale shape: one domain-sized distinct, one gram-df groupBy, one
window over the domain for prefix ranking, one posting self-join on
the <= k·q+1 rarest grams per string (candidate pairs are bounded by
posting-list sizes of RARE grams), then an exact Levenshtein verify
on candidates only. No all-pairs stage anywhere; the quadratic
fallback exists only inside the short-string broadcast branch.

Reference parity: the reference engine (gopali24/ML_with_Spark_Streaming)
has no fuzzy join; this extends the dedup/similarity surface
(SURVEY.md §2.5) the same way MinHash (operators/dedup.py) does for
set similarity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ml_with_spark_streaming_spark.lineage import maybe_checkpoint


def fuzzy_string_pairs(
    df: DataFrame,
    col: str,
    k: int = 2,
    q: int = 2,
) -> DataFrame:
    """All distinct-value pairs ``(name_a < name_b, dist)`` of
    ``df[col]`` with ``levenshtein <= k``, via lossless rarest-first
    q-gram prefix blocking (module docstring). Returns columns
    ``(name_a, name_b, dist)``; join back onto ``df`` for row-level
    verdicts."""
    names = maybe_checkpoint(
        df.select(F.col(col).cast("string").alias("name"))
        .filter(F.col("name").isNotNull())
        .distinct()
    )

    # distinct q-gram set per name (set semantics: the overlap bound
    # counts gram TYPES)
    grams = maybe_checkpoint(
        names.filter(F.length("name") >= q).selectExpr(
            "name",
            f"explode(array_distinct(transform(sequence(1, length(name) - {q} + 1),"
            f" i -> substring(name, i, {q})))) AS g",
        )
    )  # domain-sized; feeds three roles (per-name count, df, ranking)
    # names too short to have any q-gram also go through the short branch
    gcnt = grams.groupBy("name").agg(F.count("*").alias("n_g"))

    # rarest-first global order: document frequency per gram
    dfreq = grams.groupBy("g").agg(F.count("*").alias("df"))
    ranked = grams.join(F.broadcast(dfreq), "g").withColumn(
        "rnk",
        F.row_number().over(W.partitionBy("name").orderBy("df", "g")),
    )
    prefix = ranked.filter(F.col("rnk") <= k * q + 1).select("name", "g")

    # short strings: gram filter is vacuous when |G| <= k*q
    short = names.join(gcnt, "name", "left").filter(
        F.coalesce("n_g", F.lit(0)) <= k * q
    ).select("name")

    lev_ok = (
        (F.abs(F.length("name_a") - F.length("name_b")) <= k)
        & (F.levenshtein("name_a", "name_b") <= k)
    )

    cand = (
        prefix.alias("a")
        .join(prefix.alias("b"), "g")
        .filter(F.col("a.name") < F.col("b.name"))
        .select(
            F.col("a.name").alias("name_a"), F.col("b.name").alias("name_b")
        )
        .distinct()
    )
    # short x all (both orientations collapse via the < on names)
    cand_short = (
        F.broadcast(short.select(F.col("name").alias("s_name")))
        .crossJoin(names)
        .filter(F.col("s_name") != F.col("name"))
        .select(
            F.least("s_name", "name").alias("name_a"),
            F.greatest("s_name", "name").alias("name_b"),
        )
        .distinct()
    )

    return (
        cand.unionByName(cand_short)
        .distinct()
        .filter(lev_ok)
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").cast("long").alias("dist"),
        )
    )
