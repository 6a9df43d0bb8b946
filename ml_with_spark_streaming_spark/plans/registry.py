"""Query/oracle registry.

Contract (driver-enforced, see repo-root ``__spark_entry__.py``):

* each query: ``fn(spark, sf_dir) -> DataFrame``
* oracle: equivalent ANSI SQL for DuckDB over the same parquet tables
  (views pre-registered: region nation customer supplier part orders
  lineitem events documents embeddings)
* column names must match exactly between the two (driver sorts
  columns by name then value-hashes)

Determinism rules applied throughout:
* floating aggregates rounded (``F.round(x, N)`` / ``ROUND(x, N)``) so
  FP non-associativity across partitions can't flip the hash
* timestamps surfaced as DATE or formatted string
* no reliance on row order (driver compare is order-insensitive), but
  LIMIT/top-k queries order by a unique total ordering before limiting
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}
# why each non-oracled query has no SQL twin — the stated reason the
# local gate prints and ORACLE_r{N}.json records next to its weaker
# rows-only check (driver-side: CORRECTNESS notes the same downgrade)
NO_ORACLE_REASONS: dict[str, str] = {}


def query(
    name: str,
    oracle: str | None = None,
    no_oracle_reason: str | None = None,
) -> Callable[[QueryFn], QueryFn]:
    """Register a named query with its DuckDB oracle SQL, or — for
    genuinely non-SQL-expressible ops (iterative ML, approximate-by-
    construction ANN, engine-specific sketches) — an explicit
    ``no_oracle_reason``. Exactly one must be given: a query can't
    silently downgrade to the rows-only check.
    """

    if (oracle is None) == (no_oracle_reason is None):
        raise ValueError(
            f"{name}: give exactly one of oracle / no_oracle_reason"
        )

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        else:
            NO_ORACLE_REASONS[name] = no_oracle_reason
        return fn

    return deco
