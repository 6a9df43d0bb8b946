"""Distributed PCA over embedding columns + reduced-dimension ANN.

The standard scale move before similarity search over a 100 TB
embedding corpus: learn a k-dimensional linear projection (PCA) from
the data, store/search the k-dim projections (k·8 bytes vs d·4 raw),
and re-rank a shortlist with full-precision vectors. Sibling of the PQ
path (operators/pq.py) — PCA is the rotation/truncation half of
OPQ-style pipelines and the cheapest 4-16x footprint cut that keeps L2
geometry (PCA is the L2-optimal linear truncation; Jolliffe, public
theory).

Scale shape:

* FIT is MLlib's PCA estimator (`pyspark.ml.feature.PCA`): the d×d
  covariance Gramian is aggregated JVM-side in one distributed pass
  (map-side combinable outer products), the eigendecomposition runs on
  the DRIVER on a d×d matrix — O(model), independent of corpus size;
  the mean comes from `Summarizer.mean`, same single pass.
* The model that crosses the driver is (mean[d], pc[d][k]) — a few KB.
* PROJECTION is pure JVM codegen: the (mean, pc) model is packed into
  ONE broadcast row and every corpus row folds over the d dimensions
  with `aggregate`/`zip_with` (the packed-broadcast fold family, see
  SCALE.md) — d·k multiply-adds per row, no UDF, no shuffle, no
  explode.
* MLlib's own `PCA.transform` is deliberately NOT used for projection:
  it multiplies RAW vectors by the components without subtracting the
  mean (public Spark behavior, SPARK-28860 discussion), which shifts
  every projection by a constant vector. Constant shifts preserve L2
  distances but NOT cosine or reconstruction claims, so we center
  explicitly and document the contract: reduced-space search here is
  L2.

Reference scope: the reference repo has no embedding operations at
all; this belongs to the similarity-search surface (SURVEY.md north
star), alongside q53 brute force, q55/q106 IVF, q100 sign-LSH, q136 PQ.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def fit_pca(df: DataFrame, vec_col: str = "embedding", k: int = 8):
    """Fit PCA on ``df[vec_col]`` (array<float>, fixed dim d).

    Returns ``(mean, pc)``: mean is a length-d list, pc is a d×k
    nested list (column j = j-th principal axis). Only these O(d·k)
    values cross the driver; the covariance/eig work is MLlib's
    one-pass distributed Gramian + driver-side d×d decomposition.
    """
    from pyspark.ml.feature import PCA as MLPCA
    from pyspark.ml.functions import array_to_vector
    from pyspark.ml.stat import Summarizer

    v = df.select(array_to_vector(F.col(vec_col)).alias("_v"))
    mean = v.select(Summarizer.mean(F.col("_v")).alias("m")).first()["m"]
    model = MLPCA(k=k, inputCol="_v", outputCol="_p").fit(v)
    pc = model.pc.toArray()  # numpy d×k
    return [float(x) for x in mean], [[float(x) for x in row] for row in pc]


def _packed_model(spark, mean: list[float], pc: list[list[float]]) -> DataFrame:
    """The (mean, pc) model as ONE broadcastable row."""
    return spark.createDataFrame(
        [(mean, pc)], "_mean array<double>, _pc array<array<double>>"
    )


def project_expr(vec: Column, mean: Column, pc: Column, k: int) -> Column:
    """Centered projection onto the first ``k`` principal axes as a
    single JVM fold: start from a k-zero accumulator and for each input
    dimension i add (vec[i] − mean[i]) · pc[i][0..k-1] elementwise —
    d·k multiply-adds per row inside whole-stage codegen."""
    d_idx = F.sequence(F.lit(1), F.size(mean))
    zero = F.array_repeat(F.lit(0.0), k)
    return F.aggregate(
        d_idx,
        zero,
        lambda acc, i: F.zip_with(
            acc,
            F.slice(F.element_at(pc, i), 1, k),
            lambda a, p: a
            + p * (F.element_at(vec, i).cast("double") - F.element_at(mean, i)),
        ),
    )


def pca_project(
    df: DataFrame,
    mean: list[float],
    pc: list[list[float]],
    k: int | None = None,
    vec_col: str = "embedding",
    out_col: str = "proj",
) -> DataFrame:
    """``df`` + ``out_col`` = centered k-dim projection. PCA axes are
    nested (the best k-dim subspace is the first k columns of any
    wider fit), so one wide fit serves every ``k`` ≤ fitted k."""
    k = len(pc[0]) if k is None else k
    packed = _packed_model(df.sparkSession, mean, pc)
    return df.crossJoin(F.broadcast(packed)).select(
        *df.columns, project_expr(F.col(vec_col), F.col("_mean"), F.col("_pc"), k).alias(out_col)
    )


def _l2sq_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(
            a, b, lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double"))
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """Exact L2 top-k (squared distance — monotone, no sqrt): broadcast
    queries × corpus, per-query window. Distances rounded to 6 decimals
    before ranking with id tie-break, so the ordering is total and
    stable across layouts. Columns: q_id, vec_id, l2sq, rank."""
    joined = corpus.crossJoin(F.broadcast(queries)).filter(F.col(q_id) != F.col(c_id))
    scored = joined.select(
        q_id,
        c_id,
        F.round(_l2sq_expr(F.col(q_vec), F.col(c_vec)), 6).alias("l2sq"),
    )
    w = W.partitionBy(q_id).orderBy(F.col("l2sq").asc(), F.col(c_id))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
