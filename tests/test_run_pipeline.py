"""Artifact-to-artifact pipeline runner: the staged (persist parquet,
re-read, feed next stage) execution must reproduce the fused q114
manifest exactly, and every stage artifact must land on disk."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)

from run_pipeline import run_pipeline  # noqa: E402

import pytest

pytestmark = pytest.mark.slow  # multi-stream/artifact-fit module: full-suite only (SPARK_GRAFT_FULL_TESTS=1)

STAGES = ("spans", "budget", "keep", "audit", "copies", "chunks", "manifest")


def test_pipeline_artifacts_reproduce_q114(spark, tmp_path):
    out = str(tmp_path / "artifacts")
    report = run_pipeline(spark, "/root/testdata/sf0.001", out, verify=True)
    assert report["verify"]["manifest_matches_q114"] is True
    assert report["verify"]["n_shards"] == 16
    for stage in STAGES:
        assert stage in report["stages"]
        path = os.path.join(out, f"{stage}.parquet")
        assert os.path.isdir(path), stage
        assert report["stages"][stage]["rows"] == spark.read.parquet(path).count()
    # the budget artifact reconciles against the full document spine
    # (one row per doc, kept + cut = total)
    budget = spark.read.parquet(os.path.join(out, "budget.parquet"))
    assert budget.count() == 500
    bad = budget.filter("n_kept_tokens + n_cut_tokens != n_tokens").count()
    assert bad == 0
    # the audit artifact reconciles against the keep artifact: its
    # decile doc counts cover the whole corpus, and total removals
    # equal (corpus - keep list)
    audit = spark.read.parquet(os.path.join(out, "audit.parquet"))
    rows = {r.decile: r for r in audit.collect()}
    assert set(rows) == set(range(1, 11))
    assert sum(r.n_docs for r in rows.values()) == 500
    n_keep = spark.read.parquet(os.path.join(out, "keep.parquet")).count()
    assert sum(r.n_removed for r in rows.values()) == 500 - n_keep
    for r in rows.values():
        assert r.removed_x10000 == r.n_removed * 10000 // r.n_docs
