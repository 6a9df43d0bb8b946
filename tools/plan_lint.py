"""Physical-plan linter: sweeps every registered query's executed plan
for patterns that break at 100 TB, regardless of whether the query
passes correctness.

Flags:
  * ``BatchEvalPython``    — row-at-a-time Python UDF in the plan (the
                             slow path; Arrow ``ArrowEvalPython`` /
                             ``MapInPandas`` / ``FlatMapGroupsInPandas``
                             are the sanctioned Python entries)
  * ``CartesianProduct``   — unbroadcast cross join: O(n·m) shuffle-free
                             fan-out that only works when one side is
                             tiny AND broadcast (BroadcastNestedLoopJoin
                             is the acceptable form)
  * parquet scan with zero pushed filters while the query filters on a
    scanned column is NOT detectable generically — instead we surface
    per-query scan lines so eyeballing stays cheap (``--scans``).

Allowlist: queries may declare a lint waiver with a reason (e.g. the
deliberately-quadratic capped oracle paths).

Usage: python tools/plan_lint.py [sf_dir] [--scans] [query ...]
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"
SHOW_SCANS = "--scans" in sys.argv
args = [a for a in sys.argv[1:] if a != "--scans"]
if args and os.path.isdir(args[0]):
    SF_DIR = args[0]
    args = args[1:]
ONLY = set(args)

# query -> (waived patterns, reason): a waiver covers ONLY the named
# patterns, so a different anti-pattern creeping into a waived query
# still fails the lint
WAIVERS: dict[str, tuple[frozenset[str], str]] = {
    # capped quadratic oracle paths: documented small-data twins of the
    # LSH/IVF scale paths (see their docstrings)
    "q51_jaccard_pairs": (frozenset({"CartesianProduct"}), "capped all-pairs oracle twin of q50/q58"),
    "q54_embedding_neardup": (frozenset({"CartesianProduct"}), "capped all-pairs oracle twin of q55/q82"),
    # broadcast of a handful of query vectors against the corpus — the
    # cross join IS the computation and one side is broadcast-tiny
    "q53_cosine_topk": (frozenset({"CartesianProduct"}), "broadcast 10-query fan-out (BroadcastNestedLoopJoin)"),
    "q55_ivf_ann": (frozenset({"CartesianProduct"}), "broadcast centroid/probe fan-out"),
    "q31_above_global_avg_parts": (frozenset({"CartesianProduct"}), "broadcast 1-row scalar-subquery aggregate"),
    "q48_tfidf_top_terms": (frozenset({"CartesianProduct"}), "broadcast 1-row corpus-size aggregate"),
}

BAD = {
    "BatchEvalPython": "row-at-a-time Python UDF (use pandas_udf/mapInPandas)",
    "CartesianProduct": "unbroadcast cartesian product",
}


def main() -> None:
    from ml_with_spark_streaming_spark.plans import QUERIES
    from ml_with_spark_streaming_spark.session import get_spark

    spark = get_spark(app_name="plan-lint")
    failures = 0
    for name, fn in sorted(QUERIES.items()):
        if ONLY and name not in ONLY:
            continue
        try:
            plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 — report and continue the sweep
            print(f"ERR   {name}: {type(e).__name__}: {e}")
            failures += 1
            continue
        hits = [pat for pat in BAD if pat in plan]
        # BroadcastNestedLoopJoin is fine; don't let its name shadow a
        # real CartesianProduct check
        if hits:
            waived_patterns, reason = WAIVERS.get(name, (frozenset(), ""))
            waived = [h for h in hits if h in waived_patterns]
            real = [h for h in hits if h not in waived_patterns]
            if waived:
                print(f"waive {name}: {', '.join(waived)} — {reason}")
            if real:
                print(f"LINT  {name}: {', '.join(BAD[h] for h in real)}")
                failures += 1
        # duplicate-lineage smell: the same parquet file scanned 3+
        # times in one plan usually means Catalyst re-planned a shared
        # subtree per consumer (see q48's history) — warn, don't fail
        # (legitimate multi-role scans exist, e.g. q58's LSH + verify)
        paths = re.findall(r"InMemoryFileIndex\(\d+ paths?\)\[([^\]]+)\]", plan)
        for p, cnt in Counter(paths).items():
            if cnt >= 3:
                print(f"warn  {name}: {os.path.basename(p)} scanned {cnt}x — shared lineage re-planned?")
        if SHOW_SCANS:
            for line in plan.splitlines():
                if "Scan parquet" in line:
                    m = re.search(r"PushedFilters: \[(.*?)\]", line)
                    print(f"      {name} scan pushed=[{m.group(1) if m else ''}]")
    print(f"{failures} lint failures")
    spark.stop()
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
