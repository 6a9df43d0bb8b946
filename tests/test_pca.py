"""PCA operator: projection agrees with numpy on the same model,
component variances are non-increasing, and on PLANTED cluster
geometry (real encoder-like structure) reduced-space retrieval with
exact re-rank recovers the exact top-k."""

from __future__ import annotations

import numpy as np
import pytest

from ml_with_spark_streaming_spark.operators.pca import (
    fit_pca,
    l2_topk,
    pca_project,
)

D = 16


def _clustered(n_per=40, n_clusters=3, seed=7):
    """Clusters separated in a 4-dim subspace, tiny isotropic noise —
    the geometry a real encoder produces (a few high-variance
    directions carry the structure)."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 10.0, size=(n_clusters, 4))
    rows = []
    for c in range(n_clusters):
        base = np.zeros(D)
        base[:4] = centers[c]
        for _ in range(n_per):
            rows.append(base + rng.normal(0, 0.05, size=D))
    return np.array(rows)


@pytest.fixture(scope="module")
def planted(spark):
    x = _clustered()
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<float>",
    )
    return x, df


def test_projection_matches_numpy(planted, spark):
    x, df = planted
    mean, pc = fit_pca(df, k=4)
    got = {
        r["vec_id"]: np.array(r["proj"])
        for r in pca_project(df, mean, pc).select("vec_id", "proj").collect()
    }
    # numpy replay of the SAME model (mean/pc from the fit): centered matmul
    want = (x.astype(np.float32).astype(np.float64) - np.array(mean)) @ np.array(pc)
    for i in range(len(x)):
        assert np.allclose(got[i], want[i], atol=1e-9)


def test_component_variances_non_increasing(planted):
    x, df = planted
    mean, pc = fit_pca(df, k=8)
    proj = np.array(
        [r["proj"] for r in pca_project(df, mean, pc).select("proj").collect()]
    )
    var = proj.var(axis=0)
    assert all(var[i] >= var[i + 1] - 1e-9 for i in range(len(var) - 1))
    # the planted 4-dim structure dominates: top-4 variance >> the rest
    assert var[:4].sum() > 100 * var[4:].sum()


def test_reduced_search_exact_on_planted_clusters(planted, spark):
    x, df = planted
    queries = df.filter("vec_id < 5").selectExpr(
        "vec_id as q_id", "embedding as q_vec"
    )
    exact = {
        (r["q_id"], r["vec_id"])
        for r in l2_topk(queries, df, k=10).select("q_id", "vec_id").collect()
    }
    mean, pc = fit_pca(df, k=4)
    cp = pca_project(df, mean, pc).select("vec_id", "proj")
    qp = pca_project(queries, mean, pc, vec_col="q_vec", out_col="q_proj").select(
        "q_id", "q_proj"
    )
    # reduced space keeps the CLUSTER geometry (within-cluster ordering
    # lives in the discarded noise dims, by construction): every
    # reduced-space neighbor is a true cluster-mate
    red = l2_topk(qp, cp, k=10, q_vec="q_proj", c_vec="proj").select(
        "q_id", "vec_id"
    )
    for r in red.collect():
        assert r["vec_id"] // 40 == r["q_id"] // 40
    # exact re-rank of a cluster-sized shortlist recovers exact top-10
    shortlist = l2_topk(qp, cp, k=45, q_vec="q_proj", c_vec="proj").select(
        "q_id", "vec_id"
    )
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from ml_with_spark_streaming_spark.operators.pca import _l2sq_expr

    rr = (
        shortlist.join(df, "vec_id")
        .join(F.broadcast(queries), "q_id")
        .select(
            "q_id",
            "vec_id",
            F.round(_l2sq_expr(F.col("q_vec"), F.col("embedding")), 6).alias("l2sq"),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.col("l2sq").asc(), F.col("vec_id"))
    rerank = {
        (r["q_id"], r["vec_id"])
        for r in rr.withColumn("rk", F.row_number().over(w))
        .filter("rk <= 10")
        .select("q_id", "vec_id")
        .collect()
    }
    assert rerank == exact


def test_l2_topk_matches_numpy(planted, spark):
    x, df = planted
    queries = df.filter("vec_id < 3").selectExpr("vec_id as q_id", "embedding as q_vec")
    got = {}
    for r in l2_topk(queries, df, k=5).collect():
        got.setdefault(r["q_id"], []).append((r["rank"], r["vec_id"]))
    xf = x.astype(np.float32).astype(np.float64)
    for q in range(3):
        d2 = np.round(((xf - xf[q]) ** 2).sum(axis=1), 6)
        d2[q] = np.inf  # self excluded
        order = sorted(range(len(x)), key=lambda i: (d2[i], i))[:5]
        assert [v for _, v in sorted(got[q])] == order
