"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a broadcast of the (small) query
set against the corpus, cosine as JVM higher-order functions (zip_with
+ aggregate in double precision), per-query top-k via window. No
Python, no UDF, no collect.

Scale path: IVF — assign every corpus vector to its nearest centroid
once (narrow), then probe only the closest `nprobe` centroid buckets
per query: the candidate set shrinks by ~n_centroids/nprobe. Centroid
choice here is deterministic (content-hash sample) so results are
reproducible; at 100 TB you'd fit KMeans centroids instead — the
bucketing/probing plumbing is identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ml_with_spark_streaming_spark.lineage import maybe_checkpoint


def dot_expr(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision (deterministic left-fold order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x.cast("double") * x.cast("double")), F.lit(0.0), lambda s, v: s + v))


def safe_denom(n: Column) -> Column:
    """Zero-norm guard: an all-zero embedding would make cosine NULL/NaN
    (and NaN orders differently between numpy's partial top-k and
    Spark's window sort). Dividing by 1 instead yields cosine 0 — the
    zero vector is 'similar to nothing', and ranking stays total."""
    return F.when(n == 0.0, F.lit(1.0)).otherwise(n)


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (safe_denom(norm_expr(a)) * safe_denom(norm_expr(b)))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast queries × corpus, window top-k.
    Norms are computed ONCE per vector before the pair fan-out (inside
    the fan-out they'd be re-evaluated per pair — measured 3× the
    work). Columns: q_id, vec_id, cosine (rounded 4), rank."""
    qn = queries.withColumn("_qn", norm_expr(F.col(q_vec)))
    cn = corpus.withColumn("_cn", norm_expr(F.col(c_vec)))
    joined = cn.crossJoin(F.broadcast(qn)).filter(F.col(q_id) != F.col(c_id))
    scored = joined.select(
        q_id,
        c_id,
        F.round(
            dot_expr(F.col(q_vec), F.col(c_vec))
            / (safe_denom(F.col("_qn")) * safe_denom(F.col("_cn"))),
            4,
        ).alias("cosine"),
    )
    w = W.partitionBy(q_id).orderBy(F.col("cosine").desc(), F.col(c_id))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def brute_force_topk_arrow(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k via Arrow-batched numpy matmul — the
    vectorized twin of brute_force_topk (same results, same oracle).

    The query set (bounded, dim-table-sized) is collected once and
    broadcast; each corpus partition computes one BLAS matmul
    (batch × dim) @ (dim × n_queries) per Arrow batch and emits only
    its partial top rows per query — a combine-style pushdown, so the
    final window ranks O(|partitions|·k) rows per query instead of the
    whole corpus. The partial cut operates on cosines ROUNDED to the
    output's 4 decimals and keeps the ENTIRE tie tier at the k-th
    value: the final ordering is (ROUND(cos,4) DESC, id ASC), so an
    unrounded or tie-dropping cut could discard exactly the low-id
    rows the final ranking needs (e.g. >k identical vectors in one
    batch).
    """
    import numpy as np
    import pandas as pd

    qrows = queries.select(q_id, q_vec).collect()
    # ids keep their source type (string/int alike) — never forced int64
    qids = np.array([r[q_id] for r in qrows])
    qm = np.stack([np.asarray(r[q_vec], dtype=np.float64) for r in qrows])
    qnorm = np.linalg.norm(qm, axis=1, keepdims=True)
    qm /= np.where(qnorm == 0, 1, qnorm)  # zero-norm guard, see safe_denom
    bq = corpus.sparkSession.sparkContext.broadcast((qids, qm))

    def part(batches):
        qi, qn = bq.value
        for pdf in batches:
            if not len(pdf):
                continue
            cm = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[c_vec]])
            cnorm = np.linalg.norm(cm, axis=1, keepdims=True)
            cm /= np.where(cnorm == 0, 1, cnorm)
            sims = cm @ qn.T  # (batch, n_queries)
            ids = pdf[c_id].to_numpy()
            out = []
            for j in range(len(qi)):
                mask = ids != qi[j]
                s, cid = np.round(sims[mask, j], 4), ids[mask]
                if len(s) > k:
                    # k-th largest ROUNDED value; keep every row tying it
                    kth = np.partition(s, len(s) - k)[len(s) - k]
                    sel = s >= kth
                    s, cid = s[sel], cid[sel]
                out.append(pd.DataFrame({q_id: qi[j], c_id: cid, "_cos": s}))
            if out:
                yield pd.concat(out)

    from pyspark.sql.types import DoubleType, StructField, StructType

    out_schema = StructType(
        [
            StructField(q_id, queries.schema[q_id].dataType),
            StructField(c_id, corpus.schema[c_id].dataType),
            StructField("_cos", DoubleType()),
        ]
    )
    # select the two consumed columns BEFORE the opaque Python stage:
    # Spark cannot see which columns `part` touches, so an unpruned
    # corpus would ship (and scan) every column into Arrow (guide §4.1)
    partial = corpus.select(c_id, c_vec).mapInPandas(part, out_schema)
    scored = partial.select(q_id, c_id, F.round("_cos", 4).alias("cosine"))
    w = W.partitionBy(q_id).orderBy(F.col("cosine").desc(), F.col(c_id))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id1 < id2, cosine ≥ t).

    All-pairs formulation — correct + oracle-checkable at test SF.
    At scale, gate with LSH buckets (random-hyperplane signs) first;
    see ivf_topk for the bucketing pattern.
    """
    normed = corpus.select(
        F.col(c_id), F.col(c_vec).alias("_v"), norm_expr(F.col(c_vec)).alias("_n")
    )
    a = normed.select(F.col(c_id).alias("id1"), F.col("_v").alias("v1"), F.col("_n").alias("n1"))
    b = normed.select(F.col(c_id).alias("id2"), F.col("_v").alias("v2"), F.col("_n").alias("n2"))
    return (
        a.join(b, F.col("id1") < F.col("id2"))
        .select(
            "id1",
            "id2",
            (
                dot_expr(F.col("v1"), F.col("v2"))
                / (safe_denom(F.col("n1")) * safe_denom(F.col("n2")))
            ).alias("_raw"),
        )
        # threshold on the RAW cosine — the oracle SQL (Q54/Q99) also
        # compares unrounded, so the boundary decision is bit-identical;
        # filtering the rounded value would include [t-5e-5, t) pairs
        # the oracle excludes
        .filter(F.col("_raw") >= threshold)
        .select("id1", "id2", F.round("_raw", 4).alias("cosine"))
    )


def derive_signlsh_knobs(
    n_vectors: int, bands: int = 16, min_bits: int = 4, max_bits: int = 32
) -> tuple[int, int]:
    """Size sign-LSH band width from the corpus: bits-per-band =
    clamp(ceil(log2 n), min_bits, max_bits), so expected NOISE bucket
    occupancy n/2^bits stays O(1) as the corpus grows (the module rule
    ``bits ≳ log2 n`` — in-bucket pair generation is quadratic in
    bucket size, so a fixed band width grows buckets linearly with n).
    Returns ``(n_planes, bands)`` for ``signlsh_neardup``. Recall per
    band shrinks as bits grow — the fixed ``bands`` count is the
    OR-amplification budget; in the design regime (near-identical
    vectors, per-bit agreement >= 0.99) recall stays ~1 through 32-bit
    bands, while low-threshold regimes must use the exact twin (q99's
    capped oracle) anyway."""
    import math

    bits = min(max(min_bits, math.ceil(math.log2(max(n_vectors, 2)))), max_bits)
    return bits * bands, bands


def signlsh_bands(
    corpus: DataFrame,
    n_planes: int = 32,
    bands: int = 4,
    c_id: str = "vec_id",
    c_vec: str = "embedding",
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Per-vector sign-LSH band signatures ``(c_id, band_idx,
    band_bits)`` — the INDEX form of the gate (``signlsh_buckets``
    groups these into candidate buckets; the streaming embedding-dedup
    gate persists them and hash-joins each micro-batch's signatures
    against them). Deterministic per vector: seeded hyperplanes,
    row-independent float64 dots — so index-side and batch-side
    signatures agree bit-for-bit.

    Two formulations, same output (see ``signlsh_buckets``): JVM
    higher-order functions for small plane counts, one Arrow matmul
    per batch when ``n_planes x dim >= 2048``.
    """
    import numpy as np

    if dim is None:
        first = corpus.select(c_vec).first()
        if first is None or first[0] is None:
            from pyspark.sql.types import IntegerType, StringType, StructField, StructType

            return corpus.sparkSession.createDataFrame(
                [],
                StructType(
                    [
                        StructField(c_id, corpus.schema[c_id].dataType),
                        StructField("band_idx", IntegerType()),
                        StructField("band_bits", StringType()),
                    ]
                ),
            )
        dim = len(first[0])
    rnd = np.random.RandomState(seed)
    planes = rnd.standard_normal((n_planes, dim))
    rows = n_planes // bands

    if n_planes * dim >= 2048:
        import pandas as pd

        bp = corpus.sparkSession.sparkContext.broadcast(planes)

        def part(batches):
            P = bp.value
            for pdf in batches:
                if not len(pdf):
                    continue
                m = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[c_vec]])
                bits = (m @ P.T) > 0  # (batch, n_planes)
                chars = np.where(bits, "1", "0")
                ids = pdf[c_id].to_numpy()
                out_ids, out_band, out_bits = [], [], []
                for r in range(len(ids)):
                    for j in range(bands):
                        out_ids.append(ids[r])
                        out_band.append(j)
                        out_bits.append("".join(chars[r, j * rows : (j + 1) * rows]))
                yield pd.DataFrame(
                    {c_id: out_ids, "band_idx": out_band, "band_bits": out_bits}
                )

        # the id column keeps the CORPUS id type (string/int/long alike)
        from pyspark.sql.types import IntegerType, StringType, StructField, StructType

        out_schema = StructType(
            [
                StructField(c_id, corpus.schema[c_id].dataType),
                StructField("band_idx", IntegerType()),
                StructField("band_bits", StringType()),
            ]
        )
        return corpus.select(c_id, c_vec).mapInPandas(part, out_schema)
    plane_cols = [
        F.aggregate(
            F.zip_with(
                F.col(c_vec),
                F.array(*[F.lit(float(x)) for x in planes[i]]),
                lambda v, h: v.cast("double") * h,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        > 0
        for i in range(n_planes)
    ]
    band_cols = [
        F.concat_ws(
            "",
            *[plane_cols[j * rows + r].cast("int").cast("string") for r in range(rows)],
        )
        for j in range(bands)
    ]
    return corpus.select(
        F.col(c_id),
        F.posexplode(F.array(*band_cols)).alias("band_idx", "band_bits"),
    )


def signlsh_buckets(
    corpus: DataFrame,
    n_planes: int = 32,
    bands: int = 4,
    c_id: str = "vec_id",
    c_vec: str = "embedding",
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """The (band_idx, band_bits, ids) candidate buckets of the sign-LSH
    gate — the internal stage of ``signlsh_neardup``, exposed so tests
    and capacity checks can assert bucket-occupancy bounds directly.
    Only multi-member buckets are returned (singletons generate no
    pairs).

    Two signature formulations, same output shape:
    * small plane counts → JVM higher-order functions (no Python);
    * ``n_planes × dim >= 2048`` → Arrow ``mapInPandas`` with ONE
      float64 matmul per batch. The HOF expression tree carries
      n_planes × dim literals — past a few thousand, Catalyst
      analysis + codegen dominate runtime (measured ~15 s per call at
      144×64 where the matmul path takes ~1 s), and at 100 TB the
      BLAS path is how you'd compute a 1024-bit signature anyway
      (q81's precedent). Both are deterministic per vector (seeded
      planes; row-independent float64 dots).
    """
    sig = signlsh_bands(corpus, n_planes, bands, c_id, c_vec, seed, dim)
    return (
        sig.groupBy("band_idx", "band_bits")
        .agg(F.array_sort(F.collect_set(c_id)).alias("ids"))
        .filter(F.size("ids") > 1)
    )


def signlsh_neardup(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 32,
    bands: int = 4,
    c_id: str = "vec_id",
    c_vec: str = "embedding",
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Embedding near-dup at scale: random-hyperplane LSH gate + exact
    verify — the bucketed replacement for neardup_pairs' all-pairs join.

    Pass ``dim`` (the embedding width) when known — otherwise a cheap
    ``first()`` probe reads it from the data (array<float> schemas
    don't carry the width statically).

    sign(v·h) over ``n_planes`` seeded hyperplanes gives each vector a
    bit signature; P(bit agrees) = 1 - angle/π, so near-identical
    vectors share whole bands of bits. Pairs are generated only within
    (band_idx, band_bits) buckets — and buckets carry ONLY ids (the
    vectors re-join at verify time), so no aggregation row is ever
    data-sized. Exact cosine then filters candidates. Recall is
    approximate by construction — subset-of-exact is asserted in tests.

    Band width is the scale knob: ``n_planes/bands`` bits per band
    bound expected bucket occupancy at n/2^(bits) for random vectors —
    size bits ≳ log2(n) as the corpus grows or buckets (and the
    in-bucket quadratic pair fan-out) grow linearly with n. The
    default 8-bit bands suit ~10^4 vectors; 1B vectors want ≥32-bit
    bands (e.g. n_planes=128, bands=4).

    The hyperplane matrix is deterministic (seeded numpy) and tiny
    (n_planes × dim), broadcast with the plan.
    """
    if dim is None:
        first = corpus.select(c_vec).first()
        if first is None or first[0] is None:
            return corpus.sparkSession.createDataFrame(
                [], "id1 long, id2 long, cosine double"
            )
        dim = len(first[0])
    buckets = signlsh_buckets(corpus, n_planes, bands, c_id, c_vec, seed, dim)
    pairs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("id1"), y.alias("id2")),
            ),
        )
    )
    cand = (
        buckets.select(F.explode(pairs).alias("p"))
        .select(F.col("p.id1"), F.col("p.id2"))
        .distinct()
    )
    # Materialize the (small, LSH-bounded) candidate pairs, then
    # semi-filter the normed-vector table down to candidate ids and
    # materialize THAT — both verify-join sides otherwise re-plan the
    # full corpus scan (same fix as dedup.jaccard_verify).
    cand = maybe_checkpoint(cand)
    cids = (
        cand.select(F.col("id1").alias(c_id))
        .union(cand.select(F.col("id2").alias(c_id)))
        .distinct()
    )
    normed = maybe_checkpoint(
        corpus.select(F.col(c_id), F.col(c_vec).alias("_v"), norm_expr(F.col(c_vec)).alias("_n"))
        .join(cids, c_id, "left_semi")
    )
    a = normed.select(F.col(c_id).alias("id1"), F.col("_v").alias("v1"), F.col("_n").alias("n1"))
    b = normed.select(F.col(c_id).alias("id2"), F.col("_v").alias("v2"), F.col("_n").alias("n2"))
    return (
        cand.join(a, "id1")
        .join(b, "id2")
        .withColumn(
            "cosine",
            F.round(
                dot_expr(F.col("v1"), F.col("v2"))
                / (safe_denom(F.col("n1")) * safe_denom(F.col("n2"))),
                4,
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id1", "id2", "cosine")
    )


def derive_semdedup_knobs(
    n_vectors: int, min_k: int = 4, max_k: int = 65536
) -> int:
    """Size the SemDeDup cluster count from the corpus: k =
    clamp(ceil(sqrt(n)), min_k, max_k) — the paper's operating regime
    (Abbas et al. 2023 run k ≈ √n), and the value that keeps the
    within-cluster pair search at n²/k ≈ n^1.5 total pairs with
    expected cluster size √n. A FIXED k makes clusters (and the
    quadratic in-cluster fan-out) grow linearly with the corpus — the
    q50 ``derive_minhash_knobs`` lesson applied to the cluster knob."""
    import math

    return min(max(min_k, math.ceil(math.sqrt(max(n_vectors, 1)))), max_k)


def derive_semdedup_gate_bits(
    threshold: float,
    bands: int = 16,
    target_miss: float = 1e-3,
    max_bits: int = 32,
    min_net: float = 4.0,
) -> int:
    """Band width (bits) for ``semdedup``'s in-cluster sign-LSH
    candidate gate at this verify threshold — or 0 when the gate
    cannot pay and the exact in-cluster search should run ungated.

    The derivation is the S-curve sizing rule applied to sign-LSH:
    per-bit collision probability for the WORST accepted pair is
    ``agree = 1 - acos(threshold)/π`` (Charikar 2002), a b-bit band
    collides with probability ``agree^b``, and OR-amplification over
    ``bands`` bands must keep the per-pair miss below ``target_miss``
    — so the widest admissible band is
    ``bits = floor(log(1 - target_miss^(1/bands)) / log(agree))``.

    The gate is only worth arming when it actually prunes: each band
    regenerates candidates, so the expected noise-pair reduction is
    ~``2^bits / bands`` — below ``min_net``× the gate is pure overhead
    and 0 is returned (q166's 0.4 threshold lands here: agree ≈ 0.63
    admits only 2-bit bands, which prune nothing; the paper's 0.95
    operating point admits 9-bit bands, a ~32× candidate cut)."""
    import math

    t = min(max(float(threshold), -1.0), 1.0)
    agree = 1.0 - math.acos(t) / math.pi
    if agree <= 0.5:
        # at/below random-vector bit agreement the gate carries no signal
        return 0
    if agree >= 1.0:
        return max_bits
    p_min = 1.0 - target_miss ** (1.0 / bands)
    bits = min(int(math.log(p_min) / math.log(agree)), max_bits)
    if 2**bits < min_net * bands:
        return 0
    return bits


def assign_to_centroids(
    corpus: DataFrame,
    centroids: DataFrame,
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """Each corpus vector's nearest centroid (by cosine, ties to the
    lowest cent_id): one broadcast of the k×dim centroid table + one
    narrow pass. Returns ``(c_id, cent_id)`` — the IVF assignment
    table ``IVFIndex`` persists; ``ivf_topk``/``semdedup`` consume it
    via their ``assignments`` parameter instead of re-deriving it per
    query. Arithmetic is identical to the fused in-query assignment
    (same cosine expression, same tie-break), so precomputed and fresh
    paths agree row-for-row (pinned by tests/test_ann_index.py)."""
    return (
        corpus.crossJoin(F.broadcast(centroids))
        .select(
            c_id,
            "cent_id",
            cosine_expr(F.col(c_vec), F.col("cent_vec")).alias("sim"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy(c_id).orderBy(F.col("sim").desc(), "cent_id")
            ),
        )
        .filter(F.col("rn") == 1)
        .select(c_id, "cent_id")
    )


def kmeans_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    c_vec: str = "embedding",
    seed: int = 42,
    max_iter: int = 10,
    c_id: str = "vec_id",
    fit_partitions: int = 16,
) -> DataFrame:
    """Real KMeans centroids for IVF (the production fit, vs the
    hash-sample default): MLlib KMeans over the corpus vectors, centers
    returned as the same ``(cent_id, cent_vec)`` table ``ivf_topk``
    consumes. The model state is k x dim floats — driver-trivial; at
    100 TB the fit runs on a sampled slice (pass a pre-sampled corpus)
    and is persisted as an index artifact, exactly like the hash
    sample.

    Deterministic for a fixed seed + input CONTENT: MLlib's k-means||
    init and center averaging are partition-layout dependent, so the
    fit input is pinned to a content-determined layout first —
    ``repartition(fit_partitions, c_id)`` + ``sortWithinPartitions``
    makes the layout a pure function of the ids, independent of the
    upstream file/partition order (verified by the layout-stability
    test)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    spark = corpus.sparkSession
    train = (
        corpus.repartition(fit_partitions, F.col(c_id))
        .sortWithinPartitions(c_id)
        .select(array_to_vector(F.col(c_vec).cast("array<double>")).alias("features"))
    )
    model = KMeans(k=n_centroids, seed=seed, maxIter=max_iter).fit(train)
    centers = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    return spark.createDataFrame(centers, "cent_id int, cent_vec array<double>")


def _semdedup_arrow_pairs(
    assigned: DataFrame, threshold: float, c_id: str, c_vec: str
) -> DataFrame:
    """In-cluster pairs at ``round(cos, 4) >= threshold`` via ONE
    float64 BLAS matmul per cluster (``applyInPandas`` over the
    k-bounded clusters) — the same pair set as the expression join,
    computed at vectorized-flop cost instead of one interpreted
    aggregate/zip_with tree per pair. Block-chunked: peak memory is
    O(block × cluster), never cluster². Ids inside a group are sorted
    so emitted pairs satisfy id1 < id2 by VALUE.

    The threshold decision replicates Spark's ROUNDING RULE exactly:
    ``F.round(x, 4)`` is shortest-decimal-repr BigDecimal HALF_UP, not
    numpy's scaled half-even — so the vectorized pass takes a small
    superset (``cos >= thr - 2e-4``) and each superset member is
    re-decided with ``Decimal(repr(x)).quantize(HALF_UP)``, the same
    arithmetic Spark runs. The residual backend caveat is therefore
    SUMMATION ORDER only (BLAS vs the SQL left-fold can differ in the
    last ulp, which repr then exposes) — the module-level
    float-at-the-boundary caveat, fixture-true like the embedding
    gate's."""
    import numpy as np
    import pandas as pd

    from decimal import ROUND_HALF_UP, Decimal

    from pyspark.sql.types import StructField, StructType

    idt = assigned.schema[c_id].dataType
    out_schema = StructType([StructField("id1", idt), StructField("id2", idt)])
    thr = float(threshold)
    q4 = Decimal("0.0001")

    def _round4_spark(x: float) -> float:
        return float(Decimal(repr(x)).quantize(q4, rounding=ROUND_HALF_UP))

    def per_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"id1": pdf[c_id][:0], "id2": pdf[c_id][:0]})
        pdf = pdf.sort_values(c_id)
        ids = pdf[c_id].to_numpy()
        m = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[c_vec]])
        norms = np.sqrt((m * m).sum(axis=1))
        norms[norms == 0.0] = 1.0  # safe_denom twin: zero vector ~ nothing
        mn = m / norms[:, None]
        out1, out2 = [], []
        block = 2048
        for s in range(0, len(ids), block):
            cos = mn[s : s + block] @ mn.T
            for r in range(cos.shape[0]):
                i = s + r
                row = cos[r, i + 1 :]
                # three vectorized zones: clear accepts (>= thr + 2e-4)
                # and clear rejects (< thr - 2e-4) need no re-check —
                # np.round and Spark's rule can only disagree inside
                # the band, so the interpreted Decimal decision runs on
                # boundary-band values ONLY, keeping the hot path BLAS
                sure = np.nonzero(row >= thr + 2e-4)[0]
                band = np.nonzero((row >= thr - 2e-4) & (row < thr + 2e-4))[0]
                js = sorted(
                    [int(j) + i + 1 for j in sure]
                    + [
                        int(j) + i + 1
                        for j in band
                        if _round4_spark(float(row[j])) >= thr
                    ]
                )
                if js:
                    out1.extend([ids[i]] * len(js))
                    out2.extend(ids[js])
        return pd.DataFrame(
            {"id1": np.asarray(out1, dtype=ids.dtype),
             "id2": np.asarray(out2, dtype=ids.dtype)}
            if out1
            else {"id1": pdf[c_id][:0], "id2": pdf[c_id][:0]}
        )

    return assigned.groupBy("cluster").applyInPandas(per_cluster, out_schema)


def _semdedup_gated_pairs(
    assigned: DataFrame,
    threshold: float,
    bits: int,
    bands: int,
    c_id: str,
    c_vec: str,
    seed: int,
) -> DataFrame:
    """In-cluster pairs with the q100 sign-LSH band gate composed in:
    candidates are pairs that share (cluster, band_idx, band_bits) —
    both gates AND — then exact cosine verifies just those. The band
    self-join replaces the cluster self-join, cutting noise pairs by
    ~2^bits/bands; recall follows the ``derive_semdedup_gate_bits``
    S-curve bound. Candidate and vector tables are materialized so the
    verify join doesn't re-plan the corpus scan (the signlsh_neardup
    fix)."""
    # materialized: both sides of the band self-join read sig, and an
    # unmaterialized plan would recompute the signature pass (and its
    # cluster join) once per side
    sig = maybe_checkpoint(
        signlsh_bands(assigned, bits * bands, bands, c_id, c_vec, seed).join(
            assigned.select(c_id, "cluster"), c_id
        )
    )
    s1 = sig.select(
        "cluster", "band_idx", "band_bits", F.col(c_id).alias("id1")
    )
    s2 = sig.select(
        "cluster", "band_idx", "band_bits", F.col(c_id).alias("id2")
    )
    cand = maybe_checkpoint(
        s1.join(s2, ["cluster", "band_idx", "band_bits"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
    )
    cids = (
        cand.select(F.col("id1").alias(c_id))
        .union(cand.select(F.col("id2").alias(c_id)))
        .distinct()
    )
    vecs = maybe_checkpoint(
        assigned.select(c_id, F.col(c_vec).alias("_v")).join(
            cids, c_id, "left_semi"
        )
    )
    a = vecs.select(F.col(c_id).alias("id1"), F.col("_v").alias("_v1"))
    b = vecs.select(F.col(c_id).alias("id2"), F.col("_v").alias("_v2"))
    return (
        cand.join(a, "id1")
        .join(b, "id2")
        .filter(
            F.round(cosine_expr(F.col("_v1"), F.col("_v2")), 4) >= F.lit(threshold)
        )
        .select("id1", "id2")
    )


def semdedup(
    corpus: DataFrame,
    n_centroids: int = 16,
    threshold: float = 0.95,
    c_id: str = "vec_id",
    c_vec: str = "embedding",
    seed: int = 42,
    centroids: DataFrame | None = None,
    assignments: DataFrame | None = None,
    lsh_gate: bool | None = None,
    lsh_bands: int = 16,
    pair_backend: str = "arrow",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster-scoped
    semantic dedup. KMeans-cluster the embedding space, compute exact
    cosine pairs ONLY within each cluster (the paper's core trick:
    near-duplicates land in the same cluster, so the quadratic pair
    search is bounded per cluster instead of corpus-wide), connect
    pairs at ``threshold`` into components, keep one canonical member
    (min id) per component.

    Returns ``(c_id, cluster, component, keep)`` for every corpus row
    — singletons are their own component with ``keep = 1``.

    Scale shape: one centroid broadcast + one narrow assignment pass;
    the pair search is scoped to clusters (with k clusters of ~n/k
    vectors the pair count is n²/k; k is derived as ⌈√n⌉, the paper's
    regime). Component rounds are q90's join+min loop. Two buy-downs
    on the n²/k term:

    * ``lsh_gate`` — an IN-CLUSTER sign-LSH band join (the q100 gate
      composed with the cluster gate): only band-colliding same-cluster
      pairs reach exact verification. ``None`` (default) derives the
      band width from the threshold via ``derive_semdedup_gate_bits``
      and arms the gate only when the S-curve math says it prunes —
      at the paper's 0.95 operating point it does (~9-bit bands, ~32×
      candidate cut); at exploratory thresholds (≤ ~0.8) sign-LSH
      bands wide enough to preserve recall prune nothing, so the gate
      auto-disarms rather than silently dropping pairs. ``True`` /
      ``False`` force it.
    * ``pair_backend="arrow"`` (ungated path) — per-cluster pairs via
      ONE float64 BLAS matmul per cluster inside ``applyInPandas``
      (block-chunked, memory O(block·s) for cluster size s), replacing
      n²/k interpreted Catalyst aggregate/zip_with cosine evaluations
      with vectorized flops. Same pairs as the expression join
      (``"join"``, kept for degenerate unbounded clusters where a
      group no longer fits an Arrow batch: s ≳ 10⁵) up to the
      float-summation-order-at-the-rounding-boundary caveat the
      embedding gate documents; backend equality is pinned by test.

    Design-regime exactness (clusters of near-identical vectors —
    where SemDeDup operates) is pinned by
    ``tests/test_similarity.py::test_semdedup_planted_clusters``:
    cluster-scoped components equal all-pairs components there, gate
    armed (auto at 0.95) and disarmed alike.
    """
    from ml_with_spark_streaming_spark.operators.graph import connected_components

    if assignments is not None:
        # persisted-index path (IVFIndex): the fit + assignment pass
        # already happened at build time — join the (c_id, cent_id)
        # table back onto the vectors (at scale: co-bucketed by c_id)
        assigned = maybe_checkpoint(
            corpus.select(c_id, c_vec).join(
                assignments.select(c_id, F.col("cent_id").alias("cluster")), c_id
            )
        )
    else:
        if centroids is None:
            centroids = kmeans_centroids(
                corpus, n_centroids=n_centroids, c_vec=c_vec, c_id=c_id, seed=seed
            )
        centroids = maybe_checkpoint(centroids)
        assigned = maybe_checkpoint(
            corpus.crossJoin(F.broadcast(centroids))
            .select(
                c_id, c_vec, "cent_id",
                cosine_expr(F.col(c_vec), F.col("cent_vec")).alias("sim"),
            )
            .withColumn(
                "rn",
                F.row_number().over(W.partitionBy(c_id).orderBy(F.col("sim").desc(), "cent_id")),
            )
            .filter(F.col("rn") == 1)
            .select(F.col(c_id), F.col(c_vec), F.col("cent_id").alias("cluster"))
        )
    if pair_backend not in ("arrow", "join"):
        # validated up front: an armed gate dispatches before the
        # backend branch, and a typo'd backend must not silently ride
        # the gated path instead
        raise ValueError(f"unknown pair_backend {pair_backend!r}")
    gate_bits = derive_semdedup_gate_bits(threshold, bands=lsh_bands)
    if lsh_gate is None:
        lsh_gate = gate_bits > 0
    if lsh_gate:
        if gate_bits == 0:
            raise ValueError(
                f"lsh_gate=True at threshold {threshold}: no band width "
                "preserves recall while pruning — run ungated "
                "(lsh_gate=False/None) or raise the threshold"
            )
        pairs = _semdedup_gated_pairs(
            assigned, threshold, gate_bits, lsh_bands, c_id, c_vec, seed
        )
    elif pair_backend == "arrow":
        pairs = _semdedup_arrow_pairs(assigned, threshold, c_id, c_vec)
    else:  # "join" — the up-front validation admits only arrow/join
        a = assigned.select(
            F.col("cluster"),
            F.col(c_id).alias("id1"),
            F.col(c_vec).alias("_v1"),
        )
        b = assigned.select(
            F.col("cluster"),
            F.col(c_id).alias("id2"),
            F.col(c_vec).alias("_v2"),
        )
        pairs = (
            a.join(b, "cluster")
            .filter(F.col("id1") < F.col("id2"))
            .filter(
                F.round(cosine_expr(F.col("_v1"), F.col("_v2")), 4)
                >= F.lit(threshold)
            )
            .select("id1", "id2")
        )
    comp = connected_components(pairs).withColumnRenamed("id", c_id)
    return (
        assigned.select(c_id, "cluster")
        .join(comp, c_id, "left")
        .select(
            F.col(c_id),
            F.col("cluster").cast("long").alias("cluster"),
            F.coalesce("component", F.col(c_id)).cast("long").alias("component"),
            (F.coalesce("component", F.col(c_id)) == F.col(c_id))
            .cast("long")
            .alias("keep"),
        )
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
    centroids: DataFrame | None = None,
    q_group: str | None = None,
    c_group: str | None = None,
    assignments: DataFrame | None = None,
    c_group_map: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k: IVF with deterministic hash-sampled centroids.

    ``assignments`` (requires ``centroids``): the persisted
    ``(c_id, cent_id)`` table from an ``IVFIndex`` artifact — the
    corpus→centroid pass is skipped and the bucket id joins on
    ``c_id`` instead (at scale: assignment table co-bucketed with the
    corpus by id). Fit-once / probe-many; equality with the fresh-fit
    path is pinned by tests/test_ann_index.py.

    ``q_group``/``c_group`` (both or neither): group-exclusion columns
    for hard-negative mining — candidates whose ``c_group`` equals the
    query's ``q_group`` are dropped BEFORE ranking (filtering after
    top-k would silently return fewer than k when same-group vectors
    crowd the top). The ``c_group`` column rides through to the output.

    ``c_group_map`` (optional, requires ``c_group``): a separate
    ``(c_id, c_group)`` table covering every corpus id. The group
    column then joins onto the PROBED CANDIDATES (n_queries × nprobe
    buckets — a small fraction of the corpus) instead of riding the
    corpus through the bucket join, and the caller's corpus side stays
    narrow (id, vec) — at scale this replaces a corpus-sized
    group-attach join with a candidate-sized one (round-12, guide
    §2.3/§3). Identical rows: the join happens before the group filter
    and the ranking window, and an id missing from the map is dropped
    exactly as it would have been by the caller's corpus pre-join.

    1. centroids = the n_centroids corpus vectors with smallest
       md5(id) — a content-hash sample: uniform-ish spread, fully
       deterministic, independent of partition layout and of id
       density (round-1 used id-stride, which assumed dense ids and
       cost a full corpus.count() action — at 100 TB that is an extra
       complete pass). orderBy+limit plans as TakeOrdered (per-partition
       partial top-k, driver merge of n_centroids rows) — no full sort,
       no count. At real scale fit sampled KMeans centroids instead;
       the bucketing/probing plumbing below is identical.
    2. each corpus vector → nearest centroid (one narrow pass);
    3. each query probes its nprobe nearest centroids;
    4. exact cosine only within probed buckets → window top-k.
    """
    if (q_group is None) != (c_group is None):
        raise ValueError("q_group and c_group must be set together")
    if assignments is not None and centroids is None:
        raise ValueError("assignments requires the matching centroids table")
    if c_group_map is not None and c_group is None:
        raise ValueError("c_group_map requires c_group")
    if centroids is None:
        centroids = _hash_sample_centroids(corpus, n_centroids, c_id, c_vec)
    centroids = maybe_checkpoint(centroids)
    # with a c_group_map, the group column does NOT ride the corpus
    # through the bucket join — it attaches to the probed candidates
    c_extra = [c_group] if (c_group is not None and c_group_map is None) else []
    q_extra = [q_group] if q_group is not None else []
    # corpus -> nearest centroid (skipped when a persisted assignment
    # table is supplied — the IVFIndex fit-once/probe-many path)
    if assignments is not None:
        assigned = corpus.select(c_id, c_vec, *c_extra).join(
            assignments.select(c_id, "cent_id"), c_id
        )
    else:
        assigned = (
            corpus.crossJoin(F.broadcast(centroids))
            .select(c_id, c_vec, *c_extra, "cent_id", cosine_expr(F.col(c_vec), F.col("cent_vec")).alias("sim"))
            .withColumn("rn", F.row_number().over(W.partitionBy(c_id).orderBy(F.col("sim").desc(), "cent_id")))
            .filter(F.col("rn") == 1)
            .select(c_id, c_vec, *c_extra, "cent_id")
        )
    # query -> nprobe nearest centroids
    probes = (
        queries.crossJoin(F.broadcast(centroids))
        .select(q_id, q_vec, *q_extra, "cent_id", cosine_expr(F.col(q_vec), F.col("cent_vec")).alias("sim"))
        .withColumn("rn", F.row_number().over(W.partitionBy(q_id).orderBy(F.col("sim").desc(), "cent_id")))
        .filter(F.col("rn") <= nprobe)
        .select(q_id, q_vec, *q_extra, "cent_id")
    )
    scored = probes.join(assigned, "cent_id").filter(F.col(q_id) != F.col(c_id))
    if c_group_map is not None:
        scored = scored.join(c_group_map.select(c_id, c_group), c_id)
    if q_group is not None:
        scored = scored.filter(F.col(q_group) != F.col(c_group))
    out_extra = [c_group] if c_group is not None else []
    scored = scored.select(
        q_id, c_id, *out_extra, F.round(cosine_expr(F.col(q_vec), F.col(c_vec)), 4).alias("cosine")
    )
    w = W.partitionBy(q_id).orderBy(F.col("cosine").desc(), F.col(c_id))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _hash_sample_centroids(
    corpus: DataFrame, n_centroids: int, c_id: str, c_vec: str
) -> DataFrame:
    """The deterministic content-hash centroid sample (ivf_topk's
    default; see its docstring for why TakeOrdered, not count)."""
    return (
        corpus.select(
            F.col(c_id).alias("cent_id"),
            F.col(c_vec).alias("cent_vec"),
            F.md5(F.col(c_id).cast("string")).alias("_h"),
        )
        .orderBy("_h", "cent_id")
        .limit(n_centroids)
        .drop("_h")
    )


def kcenter_select(
    corpus: DataFrame,
    m: int = 8,
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """Greedy farthest-point (k-center, Gonzalez 1985) diversity
    selection over an embedding column — the coreset / diverse-subset
    stage a training-data pipeline runs to pick maximally-spread
    exemplars (dataset distillation, eval-set seeding, dedup-cluster
    representatives). 2-approximation to the optimal k-center cover.

    Returns ``(rank, vec_id, min_dist_x1e6)``: selection order, the
    chosen vector, and its cosine distance (×10⁶, floored to BIGINT —
    driver-comparator-safe) to the nearest PREVIOUSLY selected center
    at the moment of selection — the running coverage radius, non-
    increasing in rank. Seed (rank 0, dist NULL) is the min-id vector:
    deterministic, and any seed preserves the 2-approx bound.

    Scale shape: the classic incremental formulation — per round, ONE
    narrow pass updates the running min-distance against only the
    NEWEST center (a dim-sized literal broadcast with the plan), then
    a TakeOrdered(1) argmax sends a single row to the driver. O(n·m)
    distance evaluations total (not n·m²), no shuffle in the loop, the
    running-distance table checkpointed per round (the q90/q111 loop
    discipline). Driver state is m ids + m·dim floats — O(model).
    """
    spark = corpus.sparkSession
    pts = maybe_checkpoint(
        corpus.select(F.col(c_id).alias("_kid"), F.col(c_vec).alias("_kvec"))
    )
    seed_rows = pts.orderBy("_kid").limit(1).collect()
    if not seed_rows:
        return spark.createDataFrame([], "rank int, vec_id long, min_dist_x1e6 long")
    sel: list[tuple[int, int, list[float], float | None]] = [
        (0, seed_rows[0]["_kid"], [float(x) for x in seed_rows[0]["_kvec"]], None)
    ]
    cur = pts.withColumn("_mind", F.lit(None).cast("double"))
    for r in range(1, m):
        newest = F.array(*[F.lit(x) for x in sel[-1][2]])
        d_new = F.lit(1.0) - cosine_expr(F.col("_kvec"), newest)
        cur = maybe_checkpoint(
            cur.withColumn("_mind", F.least(F.coalesce(F.col("_mind"), F.lit(2.0)), d_new))
        )
        far = (
            cur.filter(~F.col("_kid").isin([s[1] for s in sel]))
            .orderBy(F.col("_mind").desc(), "_kid")
            .limit(1)
            .collect()
        )
        if not far:
            break
        row = far[0]
        sel.append((r, row["_kid"], [float(x) for x in row["_kvec"]], float(row["_mind"])))
    rows = [
        (r, i, None if d is None else int(d * 1e6)) for (r, i, _v, d) in sel
    ]
    return spark.createDataFrame(rows, "rank int, vec_id long, min_dist_x1e6 long")
