"""Artifact-to-artifact corpus pipeline runner: the production stage
order executed as PERSISTED parquet stages, not one fused query plan.

The registered queries (q110/q113/q104/q107/q108/q114) pin each
stage's semantics against DuckDB inside a single plan; a production
100 TB build instead runs the stages as separate jobs, each reading
the previous stage's parquet output — so a failed stage restarts from
its input artifact instead of the raw corpus, stages can be scheduled
on different cluster sizes, and every intermediate is inspectable.
This runner IS that discipline, over the SAME stage functions the
queries compose (plans/curation.py: curation_keep_list, epoch_copies,
context_chunks, shard_manifest; operators/exact_substr.py:
duplicate_spans, apply_cuts) — one code path, two execution shapes.

Stages (each writes ``<out>/<stage>.parquet``, each consumed from the
ARTIFACT by the next, never from lineage):

  1. spans      — ExactSubstr discovery (q110): duplicated >=50-token
                  spans + the keep-one cut policy. The application
                  pass (budget) consumes the ARTIFACT, demonstrating
                  the discover->apply handoff q115's docstring
                  promises.
  2. budget     — apply_cuts over the span artifact (q115/q120): the
                  per-doc kept/cut token ledger.
  3. keep       — the four curation gates (q113/q114): dedup-canonical
                  + quality + repetition + classifier keep list.
  4. audit      — q164's selection-bias report over the PIPELINE'S
                  keep decisions (removed = not on the keep artifact):
                  per global quality decile, how many docs the gates
                  removed — a destructive run always ships its bias
                  audit next to the keep list.
  5. copies     — per-doc epoch copy counts from the q104/q107
                  language-mixing recipe, joined against the keep
                  artifact.
  6. chunks     — q108 sliding context windows of kept docs,
                  fingerprinted once per (doc, start).
  7. manifest   — the 16-shard training manifest (q114), computed
                  from the copies + chunks ARTIFACTS.

``--verify`` additionally runs the fused q114 query and asserts the
artifact-built manifest is IDENTICAL row-for-row (the hash-exact
reproduction VERDICT r4 asked for). The manifest intentionally chunks
the gated ORIGINAL text (q114 semantics); the spans/budget artifacts
carry the substring-dedup ledger alongside it (q125 packs from those
counts).

Usage:
  python tools/run_pipeline.py [sf_dir] [--out DIR] [--verify]

Prints one JSON line: per-stage wall seconds + artifact row counts,
and (with --verify) the parity verdict.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_pipeline(spark, sf_dir: str, out: str, verify: bool = False) -> dict:
    from pyspark.sql import functions as F

    from ml_with_spark_streaming_spark.operators.exact_substr import (
        apply_cuts,
        duplicate_spans,
    )
    from ml_with_spark_streaming_spark.plans.curation import (
        context_chunks,
        curation_keep_list,
        epoch_copies,
        integer_quality_scored,
        q114_training_mix_export,
        selection_bias_audit,
        shard_manifest,
    )
    from ml_with_spark_streaming_spark.sources.batch import load_table

    os.makedirs(out, exist_ok=True)
    report: dict = {"sf_dir": sf_dir, "out": out, "stages": {}}

    def stage(name: str, build) -> "object":
        """Run one stage: build its DataFrame, persist the artifact,
        return the RE-READ artifact (downstream consumes files, not
        lineage)."""
        t0 = time.time()
        path = os.path.join(out, f"{name}.parquet")
        build().write.mode("overwrite").parquet(path)
        art = spark.read.parquet(path)
        report["stages"][name] = {
            "sec": round(time.time() - t0, 2),
            "rows": art.count(),
        }
        return art

    d = load_table(spark, sf_dir, "documents")
    spans = stage("spans", lambda: duplicate_spans(d))
    stage("budget", lambda: apply_cuts(d, spans=spans))
    keep = stage("keep", lambda: curation_keep_list(spark, sf_dir))

    def _audit():
        # q164's strata report over the PIPELINE'S OWN keep decisions
        # (removed = not on the keep artifact): every destructive run
        # ships its selection-bias audit alongside the keep list
        flagged = (
            integer_quality_scored(d)
            .join(
                keep.select("doc_id").withColumn("_k", F.lit(1)), "doc_id", "left"
            )
            .withColumn("removed", F.col("_k").isNull().cast("int"))
            .drop("_k")
        )
        return selection_bias_audit(flagged)

    stage("audit", _audit)
    copies = stage("copies", lambda: epoch_copies(spark, sf_dir, keep))
    kept_ids = copies.filter(F.col("n_copies") >= 1).select("doc_id")
    chunks = stage("chunks", lambda: context_chunks(d, kept_ids))
    manifest = stage("manifest", lambda: shard_manifest(copies, chunks))
    report["total_sec"] = round(sum(s["sec"] for s in report["stages"].values()), 2)

    if verify:
        art_rows = sorted(map(tuple, manifest.collect()))
        fused_rows = sorted(map(tuple, q114_training_mix_export(spark, sf_dir).collect()))
        report["verify"] = {
            "manifest_matches_q114": art_rows == fused_rows,
            "n_shards": len(art_rows),
        }
        if art_rows != fused_rows:
            report["verify"]["diff_sample"] = [
                (a, f) for a, f in zip(art_rows, fused_rows) if a != f
            ][:3]
    return report


def main() -> None:
    from ml_with_spark_streaming_spark.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    out = None
    for i, a in enumerate(sys.argv):
        if a == "--out" and i + 1 < len(sys.argv):
            out = sys.argv[i + 1]
    verify = "--verify" in sys.argv
    tmp = None
    if out is None:
        tmp = tempfile.mkdtemp(prefix="pipeline_")
        out = tmp
    spark = get_spark(app_name="run-pipeline")
    try:
        report = run_pipeline(spark, sf_dir, out, verify=verify)
        print(json.dumps(report))
        if verify and not report["verify"]["manifest_matches_q114"]:
            sys.exit(1)
    finally:
        spark.stop()
        if tmp is not None:
            shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
