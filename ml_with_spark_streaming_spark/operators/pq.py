"""Product quantization (PQ) for similarity search — Jégou, Douze,
Schmid, "Product Quantization for Nearest Neighbor Search" (TPAMI
2011), the standard memory-compression path for billion-scale ANN
(FAISS's IndexPQ/IVFPQ family).

A d-dim vector is split into ``m`` subvectors; each subspace gets its
own ``k_sub``-centroid codebook (MLlib KMeans, layout-pinned fit —
see ``similarity.kmeans_centroids``); a vector is stored as ``m``
small code ids. At d=64, m=4, k_sub=16 that is 4 bytes per vector vs
256 raw — the 64x compression that lets a 100 TB embedding corpus'
index live in cluster memory.

Query scoring is ADC (asymmetric distance computation): vectors are
L2-normalized first so inner product equals cosine; per query a
``m x k_sub`` lookup table of subvector-vs-subcentroid dots is
precomputed, and a corpus vector's approximate cosine is the sum of
``m`` table lookups over its codes — no decode, no full-dim
arithmetic in the scan.

Spark shapes (nothing corpus-sized shuffles or collects):

* codebook fit: ``m`` independent MLlib KMeans runs over subvector
  projections — model state is m·k_sub·(d/m) floats, driver-trivial;
  at scale the fit runs on a sampled slice and the codebooks are a
  persisted index artifact.
* encode: codebooks are packed into ONE broadcast row
  (m x k_sub x d/m nested arrays); each corpus row computes its m
  argmin codes in a single JVM higher-order-function projection
  (``transform`` + ``array_min`` over (dist, code) structs) — zero
  shuffles, the q132 packed-broadcast shape.
* ADC top-k: the per-query LUT is built the same packed way
  (queries are a LIMIT slice, broadcast); scoring is one
  corpus-scan fan-out + per-query window top-k (q53's waived
  broadcast shape).

Determinism: ties in the argmin break to the SMALLER code id via
lexicographic ``array_min`` on (dist, code); the KMeans fits are
seeded and layout-pinned; normalization uses the same
``safe_denom`` zero-vector guard as every cosine in the engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ml_with_spark_streaming_spark.lineage import maybe_checkpoint
from ml_with_spark_streaming_spark.operators.similarity import (
    kmeans_centroids,
    norm_expr,
    safe_denom,
)


def _normalized(vec: Column) -> Column:
    """L2-normalize (zero vectors stay zero) so dot == cosine."""
    n = safe_denom(norm_expr(vec))
    return F.transform(vec, lambda x: x.cast("double") / n)


def pq_codebooks(
    corpus: DataFrame,
    m: int = 4,
    k_sub: int = 16,
    c_id: str = "vec_id",
    c_vec: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """``(sub_id, cent_id, cent_vec)``: m per-subspace codebooks fit on
    the L2-NORMALIZED subvectors. m seeded KMeans fits; each reuses the
    layout-pinned deterministic fit. Subspace j covers dims
    [j·d/m, (j+1)·d/m) via a 1-based slice of the normalized vector."""
    dim = len(corpus.select(c_vec).first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    normed = maybe_checkpoint(
        corpus.select(F.col(c_id), _normalized(F.col(c_vec)).alias("_nv"))
    )
    parts = []
    for j in range(m):
        sliced = normed.select(
            F.col(c_id), F.slice("_nv", j * sub + 1, sub).alias("subv")
        )
        cb = kmeans_centroids(
            sliced, n_centroids=k_sub, c_vec="subv", seed=seed + j, c_id=c_id
        )
        parts.append(cb.select(F.lit(j).alias("sub_id"), "cent_id", "cent_vec"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _packed_codebooks(codebooks: DataFrame) -> DataFrame:
    """ONE row: ``cbs[m][k_sub] = cent_vec`` nested arrays, broadcast-
    ready. m·k_sub rows in, one packed row out."""
    per_sub = (
        codebooks.groupBy("sub_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("cent_id", "cent_vec"))
            ).alias("cents")
        )
        .select("sub_id", F.col("cents.cent_vec").alias("vecs"))
    )
    return per_sub.groupBy().agg(
        F.array_sort(F.collect_list(F.struct("sub_id", "vecs"))).alias("_cb")
    ).select(F.col("_cb.vecs").alias("cbs"))


def pq_encode(
    corpus: DataFrame,
    codebooks: DataFrame,
    m: int = 4,
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """``(c_id, codes array<int>)``: each vector's m nearest-subcentroid
    ids (squared-L2 argmin per subspace on the normalized vector,
    ties to the smaller code). One packed-codebook broadcast + one
    corpus projection — zero shuffles."""
    packed = _packed_codebooks(codebooks)
    nv = _normalized(F.col(c_vec))
    dim_col = F.size(F.col(c_vec))
    sub_len = (dim_col / m).cast("int")

    def code_for(j: Column) -> Column:
        subv = F.slice(nv, j * sub_len + 1, sub_len)
        cands = F.transform(
            F.element_at(F.col("cbs"), j + 1),
            lambda cv, ci: F.struct(
                F.aggregate(
                    F.zip_with(subv, cv, lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0),
                    lambda s, v: s + v,
                ).alias("d2"),
                ci.cast("int").alias("code"),
            ),
        )
        return F.array_min(cands)["code"]

    codes = F.transform(F.sequence(F.lit(0), F.lit(m - 1)), code_for)
    return (
        corpus.crossJoin(F.broadcast(packed))
        .select(F.col(c_id), codes.alias("codes"))
    )


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    m: int = 4,
    k_sub: int = 16,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
    codebooks: DataFrame | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """ADC top-k: ``(q_id, c_id, adc_x1e4, rank)`` — approximate cosine
    as the sum of m LUT lookups over the corpus CODES (the compressed
    representation; full vectors are never touched at query time when
    ``codes`` is a persisted artifact). Scores surface as BIGINT
    (adc·1e4 rounded — driver-strict, no raw doubles)."""
    if codebooks is None:
        codebooks = pq_codebooks(corpus, m=m, k_sub=k_sub, c_id=c_id, c_vec=c_vec)
    codebooks = maybe_checkpoint(codebooks)
    if codes is None:
        codes = pq_encode(corpus, codebooks, m=m, c_id=c_id, c_vec=c_vec)
    packed = _packed_codebooks(codebooks)

    nq = _normalized(F.col(q_vec))
    dim_col = F.size(F.col(q_vec))
    sub_len = (dim_col / m).cast("int")

    def lut_for(j: Column) -> Column:
        subq = F.slice(nq, j * sub_len + 1, sub_len)
        return F.transform(
            F.element_at(F.col("cbs"), j + 1),
            lambda cv: F.aggregate(
                F.zip_with(subq, cv, lambda a, b: a * b),
                F.lit(0.0),
                lambda s, v: s + v,
            ),
        )

    luts = queries.crossJoin(F.broadcast(packed)).select(
        F.col(q_id),
        F.transform(F.sequence(F.lit(0), F.lit(m - 1)), lut_for).alias("lut"),
    )
    adc = F.aggregate(
        F.zip_with(
            F.col("lut"),
            F.col("codes"),
            lambda l, c: F.element_at(l, c + 1),
        ),
        F.lit(0.0),
        lambda s, v: s + v,
    )
    scored = (
        codes.crossJoin(F.broadcast(luts))
        .filter(F.col(q_id) != F.col(c_id))
        .select(
            F.col(q_id),
            F.col(c_id),
            F.round(adc * 10000).cast("long").alias("adc_x1e4"),
        )
    )
    w = W.partitionBy(q_id).orderBy(F.col("adc_x1e4").desc(), F.col(c_id))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def pq_topk_rerank(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    shortlist: int = 50,
    m: int = 4,
    k_sub: int = 16,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
    codebooks: DataFrame | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """The production two-stage retrieval: ADC over the compressed
    codes produces a ``shortlist`` of candidates per query, then ONLY
    those are re-scored with exact cosine against the full vectors
    (``(q_id, c_id, cosine, rank)``). The corpus-sized scan touches
    4-byte codes; full 256-byte vectors are fetched for
    shortlist·n_queries rows — the standard accuracy/memory trade
    (IVFADC + re-rank in the PQ paper's terms).

    The exact stage reuses q53's oracle-checked cosine formulation
    (round to 4 decimals BEFORE ranking, c_id ties) so re-ranked
    results are comparable with the brute-force baseline."""
    from ml_with_spark_streaming_spark.operators.similarity import cosine_expr

    cand = pq_topk(
        queries, corpus, k=shortlist, m=m, k_sub=k_sub,
        q_id=q_id, q_vec=q_vec, c_id=c_id, c_vec=c_vec,
        codebooks=codebooks, codes=codes,
    ).select(q_id, c_id)
    rescored = (
        cand.join(corpus.select(F.col(c_id), F.col(c_vec)), c_id)
        .join(queries, q_id)
        .select(
            F.col(q_id),
            F.col(c_id),
            F.round(cosine_expr(F.col(q_vec), F.col(c_vec)), 4).alias("cosine"),
        )
    )
    w = W.partitionBy(q_id).orderBy(F.col("cosine").desc(), F.col(c_id))
    return rescored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
