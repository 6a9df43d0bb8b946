"""Local stand-in for the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares:
  * row count
  * column-name set
  * order-insensitive multiset of rows (columns sorted by name),
    with exact equality on every value (floats included — queries are
    responsible for rounding so this holds).

Usage:  python tools/check_oracle.py [sf_dir] [query-name ...] [--emit [path]]

``--emit`` writes the per-query record (ok/skip/fail + rows + the
registry's stated no-oracle reason) as one JSON artifact — the
committed round record for the 121 queries the driver's pinned
50-query CORRECTNESS sample never covers. A bare ``--emit``
auto-names it ``ORACLE_r{N}.json`` for the in-progress round
(max committed BENCH_r* + 1).
"""

from __future__ import annotations

import datetime
import decimal
import glob
import json
import math
import os
import re
import sys
import time
from collections import Counter

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_args = sys.argv[1:]
EMIT: str | None = None
_emit_auto = False
if "--emit" in _args:
    i = _args.index("--emit")
    nxt = _args[i + 1] if i + 1 < len(_args) else None
    # the operand is a PATH unless it looks like a registered query
    # name (qNN_...) — `--emit q166_semdedup` must not swallow a
    # query-name filter as the output file, while `--emit results`
    # keeps meaning "write to ./results"
    if nxt is not None and not re.match(r"^q\d+_", nxt):
        EMIT = nxt
        del _args[i : i + 2]
    else:
        _emit_auto = True
        del _args[i]

SF_DIR = _args[0] if _args else "/root/testdata/sf0.01"
ONLY = set(_args[1:])

if _emit_auto:
    if ONLY:
        raise SystemExit(
            "bare --emit auto-names the ROUND artifact (ORACLE_r{N}.json); "
            "a name-filtered run would overwrite the full round record "
            "with a partial one — pass an explicit .json path instead"
        )
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(REPO, "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", p))
    ]
    EMIT = os.path.join(REPO, f"ORACLE_r{max(rounds, default=0) + 1:02d}.json")
    if os.path.exists(EMIT):
        # a FULL re-run of the in-progress round legitimately refreshes
        # its own artifact — say so rather than clobbering silently
        print(f"note: refreshing existing round artifact {EMIT}")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def canon(v):
    """Driver-strict canonicalization.

    The driver's comparator hashes pandas frames, where DuckDB HUGEINT
    (SUM over INTEGER) becomes float64 while Spark's LONG stays int64 —
    so int-vs-float must compare DISTINCT here (round-1 q25/q26/q76
    regressions were masked by a shared %.9g format). Floats compare at
    full repr precision: oracled queries must produce bit-identical
    doubles (rounding is the query's job, via scaled-int surfacing)."""
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:NaN"
        return f"f:{v + 0.0!r}"  # +0.0 collapses -0.0
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def value_lint(v) -> str | None:
    """Kinds the driver's comparator mis-handles or crashes on."""
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "array cell (driver pandas sort crashes: unhashable ndarray)"
    if isinstance(v, dict):
        return "map/struct cell (driver comparator unhashable)"
    if isinstance(v, datetime.datetime):
        return "timestamp cell (engine tz/precision canon differs — format as string)"
    if isinstance(v, decimal.Decimal):
        return "decimal cell (pandas dtype differs between engines)"
    return None


def rows_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(canon(r[i]) for i in order) for r in rows)


def lint_rows(cols, rows, engine: str) -> list[str]:
    """Scan EVERY row (not just row 0 — a cell that is NULL in the
    first row but driver-hostile later must not slip past the lint);
    reports the first offending row per column."""
    problems = []
    seen = set()
    for ri, row in enumerate(rows):
        for i, c in enumerate(cols):
            if c in seen or row[i] is None:
                continue
            bad = value_lint(row[i])
            if bad:
                seen.add(c)
                problems.append(f"{engine}.{c} (row {ri}): {bad}")
    return problems


_BAD_SPARK_TYPES = ("array", "map", "struct", "timestamp", "decimal")

# DuckDB-side twin: types pandas mangles in the driver's comparator.
# HUGEINT (SUM over INTEGER) is the round-1 q25/q26 failure class —
# fetchdf converts it to float64 while Spark's LONG stays int64.
_BAD_DUCK_TYPES = ("[]", "LIST", "STRUCT", "MAP", "TIMESTAMP", "DECIMAL", "HUGEINT")


def lint_duckdb_types(cols, types) -> list[str]:
    """Schema-level lint of the ORACLE side, from relation metadata —
    catches driver-hostile DuckDB column types even when every sampled
    row happens to be NULL (mirrors lint_spark_schema)."""
    problems = []
    for c, t in zip(cols, types):
        ts = str(t).upper()
        if any(k in ts for k in _BAD_DUCK_TYPES):
            problems.append(f"duckdb.{c}: schema type {t} (driver comparator unsafe)")
    return problems


def lint_spark_schema(sdf) -> list[str]:
    """Schema-level twin of value_lint — catches driver-hostile column
    types even when the first row is NULL (value_lint only inspects
    row 0's cells)."""
    problems = []
    for f in sdf.schema:
        t = f.dataType.simpleString()
        if any(k in t for k in _BAD_SPARK_TYPES):
            problems.append(f"spark.{f.name}: schema type {t} (driver comparator unsafe)")
    return problems


def main() -> int:
    import ml_with_spark_streaming_spark  # noqa: F401  (repo root on path)
    import __spark_entry__ as entry_mod

    from ml_with_spark_streaming_spark.session import get_spark

    from ml_with_spark_streaming_spark.plans.registry import NO_ORACLE_REASONS

    spark = get_spark(app_name="check_oracle")
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    failures = []
    records: dict[str, dict] = {}
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {e}"))
            records[name] = {"status": "fail", "err": f"spark error: {e}"[:300]}
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            reason = NO_ORACLE_REASONS.get(name, "no oracle")
            records[name] = {
                "status": "skip",
                "rows": len(srows),
                "sec": round(time.time() - t0, 1),
                "reason": reason,
            }
            print(
                f"skip  {name}: no oracle — {reason} "
                f"({len(srows)} rows, {time.time()-t0:.1f}s)"
            )
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = list(rel.columns)
            dtypes = list(rel.types)
            drows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"DUCKDB ERROR: {e}"))
            records[name] = {"status": "fail", "err": f"duckdb error: {e}"[:300]}
            print(f"FAIL  {name}: duckdb error: {e}")
            continue

        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns spark={sorted(scols)} duckdb={sorted(dcols)}")
        problems += lint_spark_schema(sdf)
        problems += lint_duckdb_types(dcols, dtypes)
        problems += lint_rows(scols, srows, "spark") + lint_rows(dcols, drows, "duckdb")
        if not problems:
            sm, dm = rows_multiset(scols, srows), rows_multiset(dcols, drows)
            if sm != dm:
                extra_s = list((sm - dm).items())[:3]
                extra_d = list((dm - sm).items())[:3]
                problems.append(f"values differ; spark-only={extra_s} duckdb-only={extra_d}")
        if problems:
            failures.append((name, "; ".join(problems)))
            records[name] = {
                "status": "fail",
                "rows": len(srows),
                "err": "; ".join(problems)[:300],
            }
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            records[name] = {
                "status": "ok",
                "rows": len(srows),
                "sec": round(time.time() - t0, 1),
            }
            print(f"ok    {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")

    n_checked = len([n for n in qs if not ONLY or n in ONLY])
    print(f"\n{len(failures)} failures / {n_checked} checked")
    for name, msg in failures:
        print(f"  {name}: {msg[:300]}")
    if EMIT:
        counts = Counter(r["status"] for r in records.values())
        artifact = {
            "sf_dir": SF_DIR,
            "checked": n_checked,
            "ok": counts.get("ok", 0),
            "skip_no_oracle": counts.get("skip", 0),
            "failures": counts.get("fail", 0),
            "queries": records,
        }
        if ONLY:
            # a partial record must SAY it's partial
            artifact["filtered_to"] = sorted(ONLY)
        with open(EMIT, "w", encoding="utf-8") as fh:
            json.dump(artifact, fh, indent=1, sort_keys=True)
        print(f"wrote {EMIT}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
