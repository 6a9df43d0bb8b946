"""Z-order (Morton-curve) data-layout planning.

At 100 TB the dominant cost of a selective scan is the files it CANNOT
skip: engines prune files by per-file min/max column statistics, and a
layout sorted on one key leaves every OTHER key's per-file range at the
full domain width (no pruning). Interleaving the bits of two keys into
one Morton code and clustering files by that code bounds BOTH keys'
per-file ranges at once — the Delta/Iceberg ``OPTIMIZE ZORDER BY``
idea, reproduced here as a pure DataFrame computation.

Everything is integer arithmetic on BIGINTs, generated as *expression
text* in two dialects (Spark SQL and DuckDB SQL) from one Python loop,
so the engine plan and its oracle share the exact bit-interleaving
definition and the result is hash-exact.

Design choices, scale-first:

* Keys are min/max-normalized into a ``bits``-wide domain before
  interleaving (raw masking would wrap at domain boundaries and wreck
  the skipping bounds at real key magnitudes). The two normalization
  scalars per key come from a 1-row aggregate broadcast-joined back —
  at production scale they are catalog statistics, no extra scan.
* File assignment is the TOP ``log2(n_files)`` bits of the z-value —
  value-based bucketing, NO global sort and NO partition-less window:
  the layout decision is a per-row projection, embarrassingly
  parallel. (A physical rewrite would ``repartitionByRange(z)`` and
  write; here we emit the per-file skipping statistics that decide
  whether the rewrite pays.)
* int64 bound: ``(x - min) * (2^bits - 1)`` must stay below 2^63 —
  with the default ``bits=16`` that allows key ranges up to ~1.4e14,
  far beyond any TPC-H key at any SF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interleave_expr(a: str, b: str, bits: int, dialect: str) -> str:
    """Bit-interleave text for two ``bits``-wide nonnegative ints:
    ``a`` occupies even bit positions, ``b`` odd. Same arithmetic in
    both dialects; only the shift spelling differs."""
    terms = []
    for i in range(bits):
        if dialect == "spark":
            terms.append(
                f"(shiftleft(shiftright({a}, {i}) & 1, {2 * i})"
                f" + shiftleft(shiftright({b}, {i}) & 1, {2 * i + 1}))"
            )
        elif dialect == "duckdb":
            terms.append(
                f"(((({a} >> {i}) & 1) << {2 * i})"
                f" + ((({b} >> {i}) & 1) << {2 * i + 1}))"
            )
        else:  # pragma: no cover
            raise ValueError(dialect)
    return "(" + " + ".join(terms) + ")"


def normalize_expr(col: str, mn: str, mx: str, bits: int, dialect: str) -> str:
    """Min/max-normalize ``col`` into [0, 2^bits - 1] with floor
    division (``div`` in Spark, ``//`` in DuckDB); constant-key domains
    (mx == mn) map to 0."""
    top = (1 << bits) - 1
    div = "div" if dialect == "spark" else "//"
    if dialect == "duckdb":
        # DuckDB widens BIGINT * BIGINT safely but keep parity: all
        # quantities here are bounded per the module docstring
        return (
            f"CAST((({col} - {mn}) * {top}) {div}"
            f" (CASE WHEN {mx} > {mn} THEN {mx} - {mn} ELSE 1 END) AS BIGINT)"
        )
    return (
        f"CAST((({col} - {mn}) * {top}) {div}"
        f" (CASE WHEN {mx} > {mn} THEN {mx} - {mn} ELSE 1 END) AS BIGINT)"
    )


def zorder_file_stats(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = 16,
    file_bits: int = 6,
) -> DataFrame:
    """Per-file min/max skipping statistics for two candidate layouts
    of ``df`` over keys (col_a, col_b):

    * ``zorder`` — files are the top ``file_bits`` bits of the Morton
      code of the normalized keys;
    * ``linear`` — files are the top ``file_bits`` bits of normalized
      ``col_a`` alone (the single-key sort every engine does by
      default).

    Returns ``layout, file_id, n_rows, a_min, a_max, b_min, b_max``:
    the exact statistics a scan planner would consult, making the
    z-order win measurable (under ``linear``, b_max - b_min stays at
    the full domain; under ``zorder`` both spans shrink ~2^(file_bits/2)x).

    One scan, one projection, one unpivot (``stack``), one groupBy —
    the normalization scalars ride in via a broadcast 1-row aggregate.
    """
    base = df.select(
        F.col(col_a).cast("long").alias("a"), F.col(col_b).cast("long").alias("b")
    )
    stats = base.agg(
        F.min("a").alias("amn"),
        F.max("a").alias("amx"),
        F.min("b").alias("bmn"),
        F.max("b").alias("bmx"),
    )
    j = base.join(F.broadcast(stats))
    na = normalize_expr("a", "amn", "amx", bits, "spark")
    nb = normalize_expr("b", "bmn", "bmx", bits, "spark")
    z = interleave_expr("na", "nb", bits, "spark")
    shift = 2 * bits - file_bits
    lin_shift = bits - file_bits
    rows = (
        j.selectExpr(f"{na} AS na", f"{nb} AS nb", "a", "b")
        .selectExpr(
            f"shiftright({z}, {shift}) AS zfid",
            f"shiftright(na, {lin_shift}) AS lfid",
            "a",
            "b",
        )
        .selectExpr(
            "stack(2, 'zorder', zfid, 'linear', lfid) AS (layout, file_id)", "a", "b"
        )
    )
    return (
        rows.groupBy("layout", "file_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("a").alias("a_min"),
            F.max("a").alias("a_max"),
            F.min("b").alias("b_min"),
            F.max("b").alias("b_max"),
        )
        .orderBy("layout", "file_id")
    )


def zorder_oracle_sql(
    table_sql: str,
    col_a: str,
    col_b: str,
    bits: int = 16,
    file_bits: int = 6,
) -> str:
    """DuckDB twin of ``zorder_file_stats`` built from the SAME
    expression generators (dialect='duckdb')."""
    na = normalize_expr(col_a, "amn", "amx", bits, "duckdb")
    nb = normalize_expr(col_b, "bmn", "bmx", bits, "duckdb")
    z = interleave_expr("na", "nb", bits, "duckdb")
    shift = 2 * bits - file_bits
    lin_shift = bits - file_bits
    return f"""
WITH base AS (SELECT {col_a}, {col_b} FROM {table_sql}),
st AS (
  SELECT MIN({col_a}) AS amn, MAX({col_a}) AS amx,
         MIN({col_b}) AS bmn, MAX({col_b}) AS bmx
  FROM base
),
norm AS (
  SELECT {na} AS na, {nb} AS nb,
         CAST({col_a} AS BIGINT) AS a, CAST({col_b} AS BIGINT) AS b
  FROM base CROSS JOIN st
),
fid AS (
  SELECT ({z} >> {shift}) AS zfid, (na >> {lin_shift}) AS lfid, a, b FROM norm
),
u AS (
  SELECT 'zorder' AS layout, zfid AS file_id, a, b FROM fid
  UNION ALL
  SELECT 'linear' AS layout, lfid AS file_id, a, b FROM fid
)
SELECT layout, CAST(file_id AS BIGINT) AS file_id,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(a) AS a_min, MAX(a) AS a_max, MIN(b) AS b_min, MAX(b) AS b_max
FROM u
GROUP BY layout, file_id
ORDER BY layout, file_id
"""
