"""Per-query optimization measurement harness (round-11 discipline).

For each named query (default: bench.py's HEADLINE set) at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1):

* times ``n`` noop-sink materializations (guide §1.4) and records
  min + p50 wall seconds,
* writes ``plans/$SPARK_GRAFT_PLANS_ROUND/<name>_<tag>.txt`` (default
  r12) with ``explain('formatted')`` when ``--plans <tag>`` is given
  (the judge checks plan claims against these files),
* labels every job (guide §1.5) so a Spark UI / event log session is
  readable.

Usage:
    python tools/opt_measure.py [--plans before|after] [--runs N]
        [--out FILE.json] [query ...]

Timings append to the JSON keyed by query name, so successive runs
(before/after a change) can be diffed with plain jq.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    plan_tag = None
    n_runs = 3
    out_path = None
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--plans":
            plan_tag = args[i + 1]
            i += 2
        elif a == "--runs":
            n_runs = int(args[i + 1])
            i += 2
        elif a == "--out":
            out_path = args[i + 1]
            i += 2
        else:
            names.append(a)
            i += 1

    from ml_with_spark_streaming_spark.session import get_spark
    from ml_with_spark_streaming_spark.plans import QUERIES

    if not names:
        import bench

        names = list(bench.HEADLINE)

    spark = get_spark(app_name="opt_measure")
    # same warmup as bench.py: absorb JVM/codegen/parquet-reader cold start
    spark.range(1000).selectExpr("sum(id)").collect()
    QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()

    plans_dir = os.path.join(REPO, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r12"))
    if plan_tag:
        os.makedirs(plans_dir, exist_ok=True)

    results: dict[str, dict] = {}
    if out_path and os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f)

    for name in names:
        fn = QUERIES[name]
        if plan_tag:
            import contextlib
            import io

            df = fn(spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plans_dir, f"{name}_{plan_tag}.txt"), "w") as f:
                f.write(buf.getvalue())
        if n_runs == 0:
            print(f"{name}: plan captured")
            continue
        runs = []
        spark.sparkContext.setJobDescription(f"opt_measure: {name}")
        try:
            for _ in range(n_runs):
                t0 = time.monotonic()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                runs.append(time.monotonic() - t0)
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {type(e).__name__}: {e}"[:300])
            results.setdefault(name, {})[plan_tag or "t"] = {
                "error": f"{type(e).__name__}: {e}"[:200]
            }
            continue
        finally:
            spark.sparkContext.setJobDescription(None)
        runs.sort()
        p50 = runs[len(runs) // 2] if n_runs % 2 else (
            runs[n_runs // 2 - 1] + runs[n_runs // 2]
        ) / 2
        rec = {"min": round(runs[0], 3), "p50": round(p50, 3), "runs": n_runs}
        results.setdefault(name, {})[plan_tag or "t"] = rec
        print(f"{name}: min={rec['min']:.3f} p50={rec['p50']:.3f}")

    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
        print(f"wrote {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
