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


# code-space size (m x k_sub x sub_dim floats) past which pq_encode
# switches from the interpreted HOF argmin to the Arrow/numpy batch
# formulation (module constant so the parity test can force either)
_ARROW_ENCODE_MIN = 1024


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
    corpus projection — zero shuffles.

    Two formulations, same output (the ``signlsh_bands`` precedent):
    JVM higher-order functions for small code spaces, one Arrow/numpy
    distance matrix per batch when ``m × k_sub × sub_dim >= 1024`` —
    the nested HOF argmin is interpreted (not codegen'd) and its
    per-row cost dominates past ~1k centroid floats (measured ~50 ms/
    row at 4×16×16 where the numpy path is ~50 µs/row). Parity is
    test-pinned; numpy ``argmin`` returns the FIRST minimum, matching
    the lexicographic (d2, code) tie-break."""
    import numpy as np

    cb_rows = codebooks.collect()  # m x k_sub rows — O(model), never data
    k_sub = max(r["cent_id"] for r in cb_rows) + 1
    sub = len(cb_rows[0]["cent_vec"])
    if m * k_sub * sub >= _ARROW_ENCODE_MIN:
        import pandas as pd

        cb = np.zeros((m, k_sub, sub), dtype=np.float64)
        for r in cb_rows:
            cb[r["sub_id"], r["cent_id"]] = r["cent_vec"]
        bcb = corpus.sparkSession.sparkContext.broadcast(cb)

        def part(batches):
            C = bcb.value
            m_, _k, s_ = C.shape
            for pdf in batches:
                if not len(pdf):
                    continue
                mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[c_vec]])
                nrm = np.linalg.norm(mat, axis=1, keepdims=True)
                mat = mat / np.where(nrm == 0, 1, nrm)  # safe_denom twin
                codes = np.empty((len(mat), m_), dtype=np.int32)
                for j in range(m_):
                    subv = mat[:, j * s_ : (j + 1) * s_]
                    d2 = ((subv[:, None, :] - C[j][None, :, :]) ** 2).sum(axis=2)
                    codes[:, j] = d2.argmin(axis=1)
                yield pd.DataFrame(
                    {c_id: pdf[c_id].to_numpy(), "codes": codes.tolist()}
                )

        # schema mirrors the HOF path: the id column keeps the CORPUS
        # id type (string/int/long alike), never a hardcoded long
        from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

        out_schema = StructType(
            [
                StructField(c_id, corpus.schema[c_id].dataType),
                StructField("codes", ArrayType(IntegerType())),
            ]
        )
        return corpus.select(c_id, c_vec).mapInPandas(part, out_schema)
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


def pq_quantization_error(
    vectors: DataFrame,
    codebooks: DataFrame,
    codes: DataFrame | None = None,
    m: int = 4,
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> float:
    """Mean squared L2 reconstruction error of ``codes`` against the
    NORMALIZED vectors — the ADC-quality gauge (Jégou §IV calls this
    the quantization distortion): decode each vector's codes back to
    the concatenated codewords and average ``||nv - decode(codes)||²``.
    A drifting stream encoded against frozen codebooks shows this
    rising monotonically; a codebook retrain drops it back.

    One broadcast (packed codebooks) + one join on ``c_id`` + one avg —
    intended for BATCH-SIZED slices (the streaming maintainer's
    per-batch gauge) or sampled corpus audits, and returns a driver
    scalar. Empty input returns 0.0."""
    if codes is None:
        codes = pq_encode(vectors, codebooks, m=m, c_id=c_id, c_vec=c_vec)
    packed = _packed_codebooks(codebooks)
    nv = _normalized(F.col(c_vec))
    # decode = concat of the m looked-up codewords, in subspace order
    recon = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda j: F.element_at(
                F.element_at(F.col("cbs"), j + 1),
                F.element_at(F.col("codes"), j + 1) + 1,
            ),
        )
    )
    err = F.aggregate(
        F.zip_with(nv, recon, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda s, v: s + v,
    )
    row = (
        vectors.select(c_id, c_vec)
        .join(codes, c_id)
        .crossJoin(F.broadcast(packed))
        .agg(
            F.count("*").alias("n"),
            F.avg(err).alias("qerr"),
            # per-row failure count: F.avg silently skips NULLs, so a
            # PARTIAL mismatch (some stale/short code arrays) would
            # otherwise average only the valid subset and understate
            # the drift signal
            F.sum(err.isNull().cast("int")).alias("n_null"),
        )
        .collect()[0]
    )
    if int(row["n"]) == 0:
        return 0.0  # genuinely empty input: nothing to reconstruct
    if int(row["n_null"] or 0) > 0:
        # ANY row that fails to reconstruct means codes/codebooks are
        # inconsistent with the vectors (stale codes, wrong m, short
        # code arrays). Returning the valid-subset average would
        # understate — and an all-NULL join would read as PERFECT
        # reconstruction and silence the drift gauge — fail instead.
        raise ValueError(
            "pq_quantization_error: reconstruction is NULL for "
            f"{int(row['n_null'])} of {int(row['n'])} joined rows — "
            "codes/codebooks do not match the vectors (stale codes or "
            "wrong m?)"
        )
    return float(row["qerr"])


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


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    assignments: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    m: int = 4,
    k_sub: int = 16,
    shortlist: int = 50,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
    codebooks: DataFrame | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ (the PQ paper's IVFADC, FAISS's IndexIVFPQ — the
    billion-scale production composition): coarse quantizer = the
    persisted IVF index (``centroids`` + ``assignments`` from an
    ``IVFIndex`` artifact), fine quantizer = the PQ codebooks/codes.
    Per query only the ``nprobe`` nearest buckets' CODES are
    ADC-scored (a join on ``cent_id``, never a corpus scan), the
    shortlist is re-ranked with exact cosine against the full
    vectors, and the top-k ships as ``(q_id, c_id, cosine, rank)``.

    At 100 TB the scan side of a query touches nprobe/n_centroids of
    the corpus, 4 bytes per vector (codes co-partitioned with the
    assignment table by id; both persisted artifacts); full vectors
    are fetched for shortlist·n_queries rows only. Recall vs
    brute-force is pinned on planted clusters, and probing ALL
    buckets with ``codebooks``/``codes`` fixed degenerates to exactly
    ``pq_topk_rerank`` (both in tests/test_pq.py)."""
    from ml_with_spark_streaming_spark.operators.similarity import cosine_expr

    if codebooks is None:
        codebooks = pq_codebooks(corpus, m=m, k_sub=k_sub, c_id=c_id, c_vec=c_vec)
    codebooks = maybe_checkpoint(codebooks)
    if codes is None:
        codes = pq_encode(corpus, codebooks, m=m, c_id=c_id, c_vec=c_vec)
    packed = _packed_codebooks(codebooks)

    # query -> nprobe nearest coarse centroids (ivf_topk's probe stage)
    probes = (
        queries.crossJoin(F.broadcast(centroids))
        .select(
            q_id, q_vec, "cent_id",
            cosine_expr(F.col(q_vec), F.col("cent_vec")).alias("sim"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy(q_id).orderBy(F.col("sim").desc(), "cent_id")
            ),
        )
        .filter(F.col("rn") <= nprobe)
        .select(q_id, "cent_id")
    )

    # per-query ADC lookup tables (one packed-codebook broadcast)
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

    # candidate codes: only the probed buckets' members
    bucketed_codes = codes.join(assignments.select(c_id, "cent_id"), c_id)
    cand = probes.join(bucketed_codes, "cent_id").select(q_id, c_id, "codes")
    adc = F.aggregate(
        F.zip_with(
            F.col("lut"), F.col("codes"), lambda l, c: F.element_at(l, c + 1)
        ),
        F.lit(0.0),
        lambda s, v: s + v,
    )
    scored = (
        cand.join(F.broadcast(luts), q_id)
        .filter(F.col(q_id) != F.col(c_id))
        .select(
            F.col(q_id),
            F.col(c_id),
            F.round(adc * 10000).cast("long").alias("adc_x1e4"),
        )
    )
    ws = W.partitionBy(q_id).orderBy(F.col("adc_x1e4").desc(), F.col(c_id))
    short = (
        scored.withColumn("rn", F.row_number().over(ws))
        .filter(F.col("rn") <= shortlist)
        .select(q_id, c_id)
    )

    # exact rerank of the shortlist only (q53's oracle-checked cosine)
    rescored = (
        short.join(corpus.select(F.col(c_id), F.col(c_vec)), c_id)
        .join(queries.select(q_id, q_vec), q_id)
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
