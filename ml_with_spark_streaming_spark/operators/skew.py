"""Skew-handling join/aggregation utilities.

AQE's skew-join splitting (enabled in session.py) handles most runtime
skew for sort-merge joins; manual salting remains the tool when (a) the
skew is known ahead of time, (b) the join is shuffled-hash, or (c) the
skewed side feeds a groupBy whose hot keys overwhelm single reducers.

Both helpers are pure plan rewrites — deterministic, no sampling, no
driver round-trips — and verified equal to their unsalted equivalents
in tests/test_skew.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to hot keys on the facts side.

    The facts side gets a deterministic per-row salt (hash of all
    columns, so identical rows still spread); the dim side is
    replicated ``salt``× — its shuffle volume grows salt×, the hot
    fact key's rows spread across ``salt`` reducers. Use when dim is
    too big to broadcast but far smaller than facts.
    """
    fact_cols = [F.col(c) for c in facts.columns]
    salted_facts = facts.withColumn("_salt", F.pmod(F.hash(*fact_cols), F.lit(salt)))
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = salted_facts.join(salted_dim, [key, "_salt"], how)
    return out.drop("_salt")


def two_phase_agg(
    df: DataFrame,
    key: str,
    agg_col: str,
    salt: int = 16,
) -> DataFrame:
    """Hot-key-safe sum/count: aggregate on (key, salt) first, then on
    key — the hot key's partial results land on ``salt`` different
    reducers before the (tiny) final combine.

    Spark's map-side partial aggregation usually makes this redundant;
    it still wins when upstream partitioning funnels one key's rows
    into few map tasks (e.g. right after an exchange keyed by the hot
    column). Columns: <key>, sum_<agg_col>, n.
    """
    fact_cols = [F.col(c) for c in df.columns]
    partial = (
        df.withColumn("_salt", F.pmod(F.hash(*fact_cols), F.lit(salt)))
        .groupBy(key, "_salt")
        .agg(F.sum(agg_col).alias("_s"), F.count("*").alias("_n"))
    )
    return partial.groupBy(key).agg(
        F.sum("_s").alias(f"sum_{agg_col}"), F.sum("_n").alias("n")
    )
