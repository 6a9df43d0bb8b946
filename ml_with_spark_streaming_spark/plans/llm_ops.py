"""LLM-data-pipeline queries: fuzzy dedup (MinHash+LSH, Jaccard,
SimHash), similarity search (brute-force + IVF), multimodal plumbing.

Oracle-checkable wherever the computation is SQL-expressible — the
MinHash signatures use salted md5 specifically so DuckDB can reproduce
them bit-for-bit. xxhash64-based ops (SimHash) and the approximate IVF
path get rows-only checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ml_with_spark_streaming_spark.operators.dedup import (
    derive_minhash_knobs,
    jaccard_pairs,
    minhash_candidates,
    mllib_minhash_pairs,
    simhash_fingerprints,
)
from ml_with_spark_streaming_spark.operators.multimodal import (
    extract_features,
    frame_sample_plan,
    synthesize_assets,
)
from ml_with_spark_streaming_spark.operators.similarity import (
    brute_force_topk,
    brute_force_topk_arrow,
    ivf_topk,
    neardup_pairs,
    signlsh_neardup,
)
from ml_with_spark_streaming_spark.lineage import maybe_checkpoint
from ml_with_spark_streaming_spark.plans.registry import query
from ml_with_spark_streaming_spark.plans.text_ml import CLEAN_SQL
from ml_with_spark_streaming_spark.sources.batch import load_table

# ---------------------------------------------------------------------------
# MinHash + LSH candidate pairs — knobs DERIVED from corpus size +
# target threshold (derive_minhash_knobs); at every sub-1e6-doc corpus
# this yields (k=16, bands=4), which is what the static SQL twin
# hard-codes (the oracle runs at sf<=0.1; tests pin the equivalence).
# max_bucket is the hot-bucket star-pair guard — set far above any
# bucket the oracle data produces (tests assert observed max ≪ cap),
# so the oracle SQL needs no star branch.
# ---------------------------------------------------------------------------

_MINHASH_TARGET_JACCARD = 0.5
_MINHASH_MAX_BUCKET = 256


def _derived_minhash_candidates(d: DataFrame) -> DataFrame:
    n_docs = d.count()  # parquet metadata count — a catalog statistic at scale
    k, bands = derive_minhash_knobs(n_docs, _MINHASH_TARGET_JACCARD)
    return minhash_candidates(
        d, "text", "doc_id", k=k, bands=bands, max_bucket=_MINHASH_MAX_BUCKET
    )

Q50_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split({CLEAN_SQL}, ' ') AS t
  FROM documents WHERE length({CLEAN_SQL}) > 0
),
sh AS (
  SELECT doc_id,
         list_transform(generate_series(1, greatest(len(t) - 2, 0)),
                        i -> array_to_string(t[i:i+2], ' ')) AS s
  FROM toks
),
shf AS (SELECT doc_id, s FROM sh WHERE len(s) > 0),
sig AS (
  SELECT doc_id,
         list_transform(generate_series(0, 15),
                        i -> list_min(list_transform(s, x -> substr(md5(x || '#' || CAST(i // 4 AS VARCHAR)), (i % 4) * 8 + 1, 8)))) AS sg
  FROM shf
),
bands AS (
  SELECT doc_id, j AS band_idx,
         md5(array_to_string(sg[j*4+1:j*4+4], '|')) AS band_hash
  FROM sig, UNNEST([0, 1, 2, 3]) AS t(j)
)
SELECT a.doc_id AS id1, b.doc_id AS id2
FROM bands a
JOIN bands b ON a.band_hash = b.band_hash AND a.band_idx = b.band_idx AND a.doc_id < b.doc_id
GROUP BY 1, 2
ORDER BY 1, 2
"""


@query("q50_minhash_candidates", Q50_SQL)
def q50_minhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return _derived_minhash_candidates(d).orderBy("id1", "id2")


# ---------------------------------------------------------------------------
# Exact n-gram (token-set) Jaccard pairs
# ---------------------------------------------------------------------------

Q51_SQL = f"""
WITH dt AS (
  SELECT DISTINCT doc_id AS id, t
  FROM (SELECT doc_id, unnest(string_split({CLEAN_SQL}, ' ')) AS t
        FROM documents WHERE length({CLEAN_SQL}) > 0 AND doc_id < 1000)
  WHERE t <> ''
),
sz AS (SELECT id, COUNT(*) AS n FROM dt GROUP BY id),
inter AS (
  SELECT a.id AS id1, b.id AS id2, COUNT(*) AS c
  FROM dt a JOIN dt b ON a.t = b.t AND a.id < b.id
  GROUP BY 1, 2
)
SELECT id1, id2, ROUND(c * 1.0 / (sa.n + sb.n - c), 4) AS jaccard
FROM inter
JOIN sz sa ON sa.id = inter.id1
JOIN sz sb ON sb.id = inter.id2
WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.5
ORDER BY id1, id2
"""


def _q167_sql(sample_sql: str) -> str:
    """The recall-audit oracle, parameterized over the audit-slice
    predicate — the id-prefix oracle slice and the production
    content-hash sample share every other line."""
    return f"""
WITH toks AS (
  SELECT doc_id, string_split({CLEAN_SQL}, ' ') AS t
  FROM documents WHERE length({CLEAN_SQL}) > 0 AND {sample_sql}
),
sh AS (
  SELECT doc_id,
         list_transform(generate_series(1, greatest(len(t) - 2, 0)),
                        i -> array_to_string(t[i:i+2], ' ')) AS s
  FROM toks
),
shf AS (SELECT doc_id, s FROM sh WHERE len(s) > 0),
dt AS (
  SELECT DISTINCT doc_id AS id, tok
  FROM (SELECT doc_id, unnest(s) AS tok FROM shf)
  WHERE tok <> ''
),
sz AS (SELECT id, COUNT(*) AS n FROM dt GROUP BY id),
inter AS (
  SELECT a.id AS id1, b.id AS id2, COUNT(*) AS c
  FROM dt a JOIN dt b ON a.tok = b.tok AND a.id < b.id
  GROUP BY 1, 2
),
ex AS (
  SELECT id1, id2,
         CAST(FLOOR(ROUND(c * 1.0 / (sa.n + sb.n - c), 4) * 10000 + 0.5) AS BIGINT) AS j_x10000
  FROM inter
  JOIN sz sa ON sa.id = inter.id1
  JOIN sz sb ON sb.id = inter.id2
  WHERE ROUND(c * 1.0 / (sa.n + sb.n - c), 4) >= 0.3
),
sig AS (
  SELECT doc_id,
         list_transform(generate_series(0, 15),
                        i -> list_min(list_transform(s, x -> substr(md5(x || '#' || CAST(i // 4 AS VARCHAR)), (i % 4) * 8 + 1, 8)))) AS sg
  FROM shf
),
bands AS (
  SELECT doc_id, j AS band_idx,
         md5(array_to_string(sg[j*4+1:j*4+4], '|')) AS band_hash
  FROM sig, UNNEST([0, 1, 2, 3]) AS t(j)
),
cand AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2
  FROM bands a
  JOIN bands b ON a.band_hash = b.band_hash AND a.band_idx = b.band_idx AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
ncand AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cand FROM cand),
flag AS (
  SELECT e.j_x10000, CASE WHEN c.id1 IS NOT NULL THEN 1 ELSE 0 END AS hit
  FROM ex e LEFT JOIN cand c ON c.id1 = e.id1 AND c.id2 = e.id2
),
th AS (SELECT unnest([3000, 5000, 7000]) AS threshold_x10000),
per AS (
  SELECT threshold_x10000,
         CAST(COUNT(*) AS BIGINT) AS n_exact_pairs,
         CAST(SUM(hit) AS BIGINT) AS n_recalled
  FROM th JOIN flag ON flag.j_x10000 >= th.threshold_x10000
  GROUP BY 1
)
SELECT CAST(t.threshold_x10000 AS BIGINT) AS threshold_x10000,
       CAST(COALESCE(p.n_exact_pairs, 0) AS BIGINT) AS n_exact_pairs,
       CAST(COALESCE(p.n_recalled, 0) AS BIGINT) AS n_recalled,
       (SELECT n_cand FROM ncand) AS n_candidate_pairs,
       CAST(CASE WHEN COALESCE(p.n_exact_pairs, 0) = 0 THEN 10000
            ELSE COALESCE(p.n_recalled, 0) * 10000 // p.n_exact_pairs END AS BIGINT)
         AS recall_x10000
FROM th t LEFT JOIN per p ON p.threshold_x10000 = t.threshold_x10000
ORDER BY 1
"""


Q167_SQL = _q167_sql("doc_id < 1000")
# the production slice: q84's deterministic content-hash sample
# (fraction_threshold(0.35) == '59999999'), same md5-threshold predicate
# the oracle runs
Q171_SQL = _q167_sql(
    "substr(md5(CAST(doc_id AS VARCHAR) || '#' || 'sample'), 1, 8) < '59999999'"
)


def _dedup_recall_audit(spark: SparkSession, sf_dir: str, sample_fn) -> DataFrame:
    """Shared recall-audit body; ``sample_fn`` picks the audit slice
    (see q167 for the semantics and scale shape).

    Round-11: the exact-Jaccard side and the MinHash+LSH side consume
    ONE materialized shingle pass over the audit slice
    (``exploded_shingles``) instead of each re-running
    tokenize+shingle+explode — guide §2.4 (share the pass), measured
    9.75 s → ~5 s at sf0.1 together with the jaccard_pairs barrier
    fix; at scale it halves the slice scans. The two sides are then
    INDEPENDENT consumers of the pinned shingle table, so their
    checkpoint materializations run as concurrent jobs
    (``parallel_parts``, guide §2.6) instead of back to back."""
    from ml_with_spark_streaming_spark.lineage import parallel_parts
    from ml_with_spark_streaming_spark.operators.dedup import exploded_shingles

    d = sample_fn(load_table(spark, sf_dir, "documents"))
    sh = maybe_checkpoint(exploded_shingles(d, "text", "doc_id", 3))
    exact, cand = parallel_parts(
        lambda: maybe_checkpoint(
            jaccard_pairs(
                d, "text", "doc_id", threshold=0.3, shingle_w=3, shingles=sh
            ).withColumn(
                "j_x10000",
                F.floor(F.col("jaccard") * 10000 + F.lit(0.5)).cast("long"),
            )
        ),
        lambda: maybe_checkpoint(
            minhash_candidates(
                d, "text", "doc_id", k=16, bands=4, max_bucket=_MINHASH_MAX_BUCKET,
                shingles=sh,
            )
        ),
    )
    n_cand = cand.count()  # O(1) scalar off the checkpointed pair table
    flagged = exact.join(
        cand.withColumn("_c", F.lit(1)), ["id1", "id2"], "left"
    ).select("j_x10000", F.coalesce("_c", F.lit(0)).alias("hit"))
    th = spark.createDataFrame([(3000,), (5000,), (7000,)], "threshold_x10000 long")
    per = (
        flagged.crossJoin(F.broadcast(th))
        .filter(F.col("j_x10000") >= F.col("threshold_x10000"))
        .groupBy("threshold_x10000")
        .agg(
            F.count("*").cast("long").alias("n_exact_pairs"),
            F.sum("hit").cast("long").alias("n_recalled"),
        )
    )
    out = th.join(per, "threshold_x10000", "left").select(
        F.col("threshold_x10000").cast("long"),
        F.coalesce("n_exact_pairs", F.lit(0)).cast("long").alias("n_exact_pairs"),
        F.coalesce("n_recalled", F.lit(0)).cast("long").alias("n_recalled"),
        F.lit(n_cand).cast("long").alias("n_candidate_pairs"),
    )
    return out.withColumn(
        "recall_x10000",
        F.expr(
            "CAST(CASE WHEN n_exact_pairs = 0 THEN 10000 "
            "ELSE n_recalled * 10000 DIV n_exact_pairs END AS BIGINT)"
        ),
    ).orderBy("threshold_x10000")


@query("q167_dedup_recall_audit", Q167_SQL)
def q167_dedup_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-auditing dedup quality: recall of the q50 MinHash+LSH
    candidate gate against exact 3-token-SHINGLE Jaccard — the
    similarity the MinHash signatures actually approximate (q51's
    arithmetic over the gate's own shingle sets, not token sets) —
    per threshold (0.3 / 0.5 / 0.7), on the capped ``doc_id < 1000``
    sample — the sampled recall report a production pipeline runs
    AFTER every dedup pass, because LSH recall is a function of the
    corpus's actual similarity distribution, not just the S-curve
    (q126's index-quality discipline, applied to the dedup gate).

    Columns: ``(threshold_x10000, n_exact_pairs, n_recalled,
    n_candidate_pairs, recall_x10000)`` — all BIGINT; recall of an
    empty exact set is defined as 10000 (vacuously complete).
    Hash-exact oracle: both the exact side and the candidate side are
    the bit-exact salted-md5 formulations q50/q51 already pin.

    Scale shape: the audit runs on a SAMPLE by construction — exact
    all-pairs cost is confined to the capped slice; the LSH side
    reuses the q50 banded-bucket path on the same slice. The
    production slice is q171's content-hash sample (q84's predicate)
    instead of this id prefix; the two share `_dedup_recall_audit`.
    """
    return _dedup_recall_audit(
        spark, sf_dir, lambda d: d.filter(F.col("doc_id") < 1000)
    )


@query("q171_dedup_recall_audit_sampled", Q171_SQL)
def q171_dedup_recall_audit_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q167's recall audit on the PRODUCTION slice: a ~35%
    deterministic content-hash sample (q84's md5-threshold predicate —
    layout-, engine- and id-density-independent) instead of the
    oracle's id-prefix cap. This is the form a 100 TB pipeline
    actually runs after every dedup pass: the exact all-pairs side is
    confined to the hash sample, the LSH side reuses q50's banded
    buckets on the same slice, and the report is comparable across
    runs because the sample is a pure function of the keys.
    Hash-exact oracle: the sample predicate is SQL (same md5 salt/
    threshold as q84), so both engines audit the identical slice."""
    from ml_with_spark_streaming_spark.operators.sampling import hash_sample

    return _dedup_recall_audit(
        spark, sf_dir, lambda d: hash_sample(d, "doc_id", 0.35)
    )


@query("q51_jaccard_pairs", Q51_SQL)
def q51_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs Jaccard — quadratic by design, so the oracle
    slice is CAPPED at 1000 docs (covers every doc at the correctness
    SF; stays bounded at any SF). The unbounded scale path is
    q58_fuzzy_dedup_pipeline (LSH candidates → verify)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    return jaccard_pairs(d, "text", "doc_id", threshold=0.5).orderBy("id1", "id2")


# ---------------------------------------------------------------------------
# SimHash (xxhash64-based → rows-only check)
# ---------------------------------------------------------------------------


@query("q52_simhash_neardup", no_oracle_reason="xxhash64 has no DuckDB equivalent")
def q52_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 64-bit fingerprints via per-bit
    conditional-sum aggregates; pairs bucketed by the top-16-bit band
    before the hamming check (the scale path — no all-pairs xor)."""
    d = load_table(spark, sf_dir, "documents")
    # materialize the tiny (doc_id, simhash) table once: without this
    # the self-join's a/b roles each re-plan the full explode+aggregate
    # fingerprint pipeline from its own corpus scan (2x the dominant
    # cost at 100 TB; 16 bytes/doc to checkpoint)
    fp = maybe_checkpoint(simhash_fingerprints(d, "text", "doc_id"), eager=False)
    banded = fp.withColumn("band", F.shiftrightunsigned("simhash", 48))
    a = banded.select(F.col("doc_id").alias("id1"), F.col("simhash").alias("h1"), "band")
    b = banded.select(F.col("doc_id").alias("id2"), F.col("simhash").alias("h2"), F.col("band").alias("band2"))
    return (
        a.join(b, (a.band == b.band2) & (a.id1 < b.id2))
        .withColumn("hamming", F.bit_count(F.col("h1").bitwiseXOR(F.col("h2"))))
        .filter(F.col("hamming") <= 16)
        .select("id1", "id2", "hamming")
        .orderBy("id1", "id2")
    )


# ---------------------------------------------------------------------------
# MLlib MinHashLSH — built-in alternate to the md5 MinHash path
# ---------------------------------------------------------------------------


@query("q59_mllib_minhash_pairs", no_oracle_reason="MLlib LSH candidate recall is approximate by construction")
def q59_mllib_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib ``MinHashLSH.approxSimilarityJoin`` fuzzy-dedup (the
    built-in counterpart of q50/q58's hand-rolled pipeline). Jaccard
    values on reported pairs are exact (tests cross-check them against
    jaccard_pairs); which candidates surface is hash-dependent →
    rows-only check. Threshold 0.9: the synthetic docs draw from a
    small vocabulary, so ~74% of all pairs clear J>=0.5 — 0.9 keeps
    the distance cut doing real work."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    return mllib_minhash_pairs(d, "text", "doc_id", threshold=0.9).orderBy("id1", "id2")


# ---------------------------------------------------------------------------
# Similarity search over embeddings
# ---------------------------------------------------------------------------

_COS = (
    "list_sum(list_transform(generate_series(1, len({a})), i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    " / (sqrt(list_sum(list_transform(generate_series(1, len({a})), i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))))"
    " * sqrt(list_sum(list_transform(generate_series(1, len({b})), i -> CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))))"
)

Q53_SQL = f"""
WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 10),
scored AS (
  SELECT q.q_id, c.vec_id,
         ROUND({_COS.format(a='q.q_vec', b='c.embedding')}, 4) AS cosine
  FROM embeddings c, q
  WHERE q.q_id <> c.vec_id
)
SELECT q_id, vec_id, cosine, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank
  FROM scored
) t
WHERE rank <= 10
ORDER BY q_id, rank
"""


@query("q53_cosine_topk", Q53_SQL)
def q53_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return brute_force_topk(queries, e, k=10).orderBy("q_id", "rank")


@query("q81_cosine_topk_arrow", Q53_SQL)
def q81_cosine_topk_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q53's exact computation on the Arrow/BLAS path (numpy matmul in
    mapInPandas with partial top-k pushdown) — same oracle SQL, so the
    driver verifies both formulations agree bit-for-bit."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return brute_force_topk_arrow(queries, e, k=10).orderBy("q_id", "rank")


Q54_SQL = f"""
SELECT a.vec_id AS id1, b.vec_id AS id2,
       ROUND({_COS.format(a='a.embedding', b='b.embedding')}, 4) AS cosine
FROM embeddings a
JOIN embeddings b ON a.vec_id < b.vec_id AND a.vec_id < 1000 AND b.vec_id < 1000
WHERE {_COS.format(a='a.embedding', b='b.embedding')} >= 0.4
ORDER BY id1, id2
"""


@query("q54_embedding_neardup", Q54_SQL)
def q54_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs cosine — quadratic oracle path capped at 1000 vectors
    (every vector at the correctness SF). Scale path: q55 IVF."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 1000)
    return neardup_pairs(e, threshold=0.4).orderBy("id1", "id2")


@query("q82_signlsh_neardup", no_oracle_reason="sign-LSH recall is approximate by construction")
def q82_signlsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q54's computation behind a random-hyperplane LSH gate — the
    bucketed scale path (pairs form only inside sign-band buckets;
    verified pairs are a subset of q54's exact result, asserted in
    tests)."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 1000)
    return signlsh_neardup(e, threshold=0.4).orderBy("id1", "id2")


@query("q55_ivf_ann", no_oracle_reason="IVF ANN is approximate by construction")
def q55_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate nearest neighbors (deterministic strided
    centroids, nprobe=4) — the 100 TB path for q53's computation."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return ivf_topk(queries, e, k=10, n_centroids=16, nprobe=4).orderBy("q_id", "rank")


@query("q106_ivf_kmeans_ann", no_oracle_reason="IVF(KMeans) ANN is approximate by construction")
def q106_ivf_kmeans_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q55's IVF probing with REAL KMeans centroids (MLlib fit, seed
    42) instead of the content-hash sample — the production index fit
    the q55 docstring promises, consumed through the PERSISTED
    ``IVFIndex`` artifact (``operators/ann_index.py``): the first
    invocation per process fits + saves centroids and the assignment
    table, every later invocation (bench re-runs, sibling queries)
    loads and probes — fit-once / probe-many, never a per-query refit.
    Same bucketing/probing plumbing (operators/similarity.py::
    ivf_topk); only where the centroid/assignment tables come from
    changes. Rows-only: which neighbors an approximate index returns
    is not SQL-expressible; recall-vs-brute-force is pinned by
    tests/test_similarity.py::test_ivf_kmeans_recall_on_planted_clusters
    and artifact-equals-fresh-fit by tests/test_ann_index.py."""
    from ml_with_spark_streaming_spark.operators.ann_index import ivf_index_for

    e = load_table(spark, sf_dir, "embeddings")
    idx = ivf_index_for(e, sf_dir, n_centroids=16, c_vec="embedding", seed=42)
    queries = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return ivf_topk(
        queries,
        e,
        k=10,
        nprobe=4,
        centroids=idx.centroids,
        assignments=idx.assignments,
    ).orderBy("q_id", "rank")


@query("q169_ivf_index_refresh", no_oracle_reason="iterative KMeans fit isn't SQL-expressible")
def q169_ivf_index_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ANN index maintenance — the vector-index sibling of
    q168's inverted-index refresh: the IVF index is FIT on the base
    corpus (vec_id % 5 != 0), persisted (``IVFIndex``), and the delta
    slice (vec_id % 5 == 0, 'today's drop') is APPENDED by assigning
    only the delta against the frozen centroids — one narrow pass over
    the new vectors, the base corpus is never rescanned and the
    centroids are never refit (refit-on-drift is a new index, not an
    append).

    Because assignment is per-vector independent given fixed
    centroids, the merged table is bit-identical to a full assignment
    pass over base ∪ delta against the same centroids — the invariant
    pinned by tests/test_ann_index.py::test_append_equals_full_assign.
    Rows-only here: the centroids come from an MLlib KMeans fit, which
    DuckDB cannot reproduce. Output: every vector's bucket plus an
    is_delta marker, deterministic (seeded fit, content-keyed layout).
    """
    from ml_with_spark_streaming_spark.operators.ann_index import ivf_index_for

    e = load_table(spark, sf_dir, "embeddings")
    base = e.filter(F.col("vec_id") % 5 != 0)
    delta = e.filter(F.col("vec_id") % 5 == 0)
    idx = ivf_index_for(base, f"{sf_dir}#base80", n_centroids=16, seed=42)
    refreshed = idx.append(delta)
    return (
        refreshed.assignments.select(
            "vec_id",
            F.col("cent_id").cast("long").alias("cent_id"),
            (F.col("vec_id") % 5 == 0).cast("long").alias("is_delta"),
        )
        .orderBy("vec_id")
    )


@query("q170_ivfpq_ann", no_oracle_reason="IVF probe + PQ codes are approximate by construction")
def q170_ivfpq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ top-k (Jégou et al. 2011 IVFADC; FAISS IndexIVFPQ) — the
    billion-scale production composition, assembled entirely from
    PERSISTED artifacts: the ``IVFIndex`` coarse quantizer (q106's
    centroids + assignment table) routes each query to its nprobe
    nearest buckets, the ``PQIndex`` fine quantizer (q136's codebooks
    + the 4-byte-per-vector codes) ADC-scores ONLY those buckets'
    members, and the shortlist is re-ranked with exact cosine against
    the full vectors. Per query the scan side touches
    nprobe/n_centroids of the corpus at 4 bytes/vector; full vectors
    are fetched for shortlist rows only.

    Rows-only: which neighbors an approximate index returns is not
    SQL-expressible; deterministic (seeded fits, id tie-breaks).
    Recall vs brute force on planted clusters and all-buckets-probed
    == pq_topk_rerank are pinned in tests/test_pq.py.
    """
    from ml_with_spark_streaming_spark.operators.ann_index import (
        ivf_index_for,
        pq_index_for,
    )
    from ml_with_spark_streaming_spark.operators.pq import ivfpq_topk

    e = load_table(spark, sf_dir, "embeddings")
    ivf = ivf_index_for(e, sf_dir, n_centroids=16, c_vec="embedding", seed=42)
    pq = pq_index_for(e, sf_dir, m=4, k_sub=16, c_vec="embedding", seed=42)
    queries = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return ivfpq_topk(
        queries,
        e,
        centroids=ivf.centroids,
        assignments=ivf.assignments,
        k=10,
        nprobe=4,
        shortlist=50,
        codebooks=pq.codebooks,
        codes=pq.codes,
    ).orderBy("q_id", "rank")


@query("q118_kcenter_diverse", no_oracle_reason="iterative greedy k-center selection isn't SQL-expressible")
def q118_kcenter_diverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Farthest-point (k-center) diversity sampling over the embeddings
    table — pick 16 maximally-spread exemplars (coreset selection /
    dedup-cluster representatives / eval-set seeding). Greedy Gonzalez
    2-approximation; see operators/similarity.py::kcenter_select for
    the per-round one-narrow-pass + TakeOrdered(1) scale shape.

    Rows-only: the selection is inherently sequential (each pick
    depends on all previous picks) — not expressible as one SQL
    statement; the cluster-coverage property is pinned by
    tests/test_similarity.py::test_kcenter_covers_planted_clusters."""
    from ml_with_spark_streaming_spark.operators.similarity import kcenter_select

    e = load_table(spark, sf_dir, "embeddings")
    return kcenter_select(e, m=16).orderBy("rank")


# ---------------------------------------------------------------------------
# Multimodal plumbing (decode stubbed; schema/batching real)
# ---------------------------------------------------------------------------

Q56_SQL = """
SELECT doc_id AS asset_id,
       'image' AS modality,
       octet_length(encode(text)) AS n_bytes,
       ascii(substr(text, 1, 1)) AS first_byte,
       CAST(list_sum(list_transform(generate_series(1, length(text)), i -> ascii(substr(text, i, 1)))) % 100000 AS BIGINT) AS byte_sum_mod
FROM documents
ORDER BY asset_id
"""


@query("q56_multimodal_features", Q56_SQL)
def q56_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload feature extraction through mapInPandas (Arrow
    batches) — the decode itself is a deterministic stub (no media
    libs in container); the schema/batch plumbing is the real path."""
    d = load_table(spark, sf_dir, "documents")
    assets = synthesize_assets(d, "image")
    return extract_features(assets, decode_stub="fake").orderBy("asset_id")


Q57_SQL = """
SELECT doc_id AS asset_id,
       greatest(CAST(floor(octet_length(encode(text)) * 10 / 1000) AS INT), 1) AS n_frames
FROM documents
ORDER BY asset_id
"""


@query("q57_frame_sample_plan", Q57_SQL)
def q57_frame_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    assets = synthesize_assets(d, "video")
    plan = frame_sample_plan(assets, every_ms=1000)
    return plan.groupBy("asset_id").agg(F.count("*").alias("n_frames")).orderBy("asset_id")


# ---------------------------------------------------------------------------
# End-to-end fuzzy dedup: LSH candidates → exact Jaccard verification
# ---------------------------------------------------------------------------

Q58_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split({CLEAN_SQL}, ' ') AS t
  FROM documents WHERE length({CLEAN_SQL}) > 0
),
sh AS (
  SELECT doc_id,
         list_transform(generate_series(1, greatest(len(t) - 2, 0)),
                        i -> array_to_string(t[i:i+2], ' ')) AS s
  FROM toks
),
shf AS (SELECT doc_id, s FROM sh WHERE len(s) > 0),
sig AS (
  SELECT doc_id,
         list_transform(generate_series(0, 15),
                        i -> list_min(list_transform(s, x -> substr(md5(x || '#' || CAST(i // 4 AS VARCHAR)), (i % 4) * 8 + 1, 8)))) AS sg
  FROM shf
),
bands AS (
  SELECT doc_id, j AS band_idx,
         md5(array_to_string(sg[j*4+1:j*4+4], '|')) AS band_hash
  FROM sig, UNNEST([0, 1, 2, 3]) AS t(j)
),
cand AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2
  FROM bands a
  JOIN bands b ON a.band_hash = b.band_hash AND a.band_idx = b.band_idx AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
tsets AS (
  SELECT doc_id, list_distinct(list_filter(string_split({CLEAN_SQL}, ' '), x -> x <> '')) AS ts
  FROM documents
),
verified AS (
  SELECT c.id1, c.id2,
         ROUND(len(list_intersect(a.ts, b.ts)) * 1.0 /
               (len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts))), 4) AS jaccard
  FROM cand c
  JOIN tsets a ON a.doc_id = c.id1
  JOIN tsets b ON b.doc_id = c.id2
)
SELECT id1, id2, jaccard FROM verified
WHERE jaccard >= 0.3
ORDER BY id1, id2
"""


@query("q58_fuzzy_dedup_pipeline", Q58_SQL)
def q58_fuzzy_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production fuzzy-dedup composition (SURVEY.md §7 step 8):
    MinHash→LSH candidate generation followed by exact Jaccard
    verification restricted to candidates — O(n·sig) + O(candidates),
    never all-pairs. q50/q51 test the stages; this tests the pipeline."""
    from ml_with_spark_streaming_spark.operators.dedup import jaccard_verify

    d = load_table(spark, sf_dir, "documents")
    cands = _derived_minhash_candidates(d)
    return jaccard_verify(cands, d, "text", "doc_id", threshold=0.3).orderBy("id1", "id2")


@query("q123_cluster_profile", no_oracle_reason="KMeans assignment isn't SQL-expressible")
def q123_cluster_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-based corpus profiling — the view behind cluster-level
    pruning (SemDeDup arXiv:2303.09540, DataComp-style curation):
    embed-cluster the corpus with the deterministic MLlib KMeans fit
    (q106's index fit), assign every vector to its nearest centroid,
    join document metadata across modalities, and profile each cluster
    (size, language spread, quality). A pipeline drops or downweights
    whole low-quality/near-duplicate clusters from this table.

    Plan: k-row centroid broadcast against the vectors (one narrow
    assignment pass, q55/q106's shape), doc metadata joined by id
    (both sides shuffle by id once), then a k-group aggregate. Quality
    is the q45 exact rational averaged as a scaled-integer mean (no
    float summation)."""
    from ml_with_spark_streaming_spark.operators.similarity import (
        cosine_expr,
        kmeans_centroids,
    )
    from ml_with_spark_streaming_spark.operators.textstats import quality_score_expr
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "embeddings")
    cents = maybe_checkpoint(
        kmeans_centroids(e, n_centroids=8, c_vec="embedding", seed=42)
    )
    assigned = (
        e.crossJoin(F.broadcast(cents))
        .select(
            "vec_id",
            "cent_id",
            cosine_expr(F.col("embedding"), F.col("cent_vec")).alias("sim"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("vec_id").orderBy(F.col("sim").desc(), "cent_id")
            ),
        )
        .filter(F.col("rn") == 1)
        .select("vec_id", "cent_id")
    )
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        # round, don't truncate: quality is floor(r)/1e4, a double whose
        # x1e4 rescale can land at .9999.. below the integer
        F.round(quality_score_expr("text") * 10000, 0).cast("long").alias("q_x1e4"),
    )
    j = assigned.join(d, assigned.vec_id == d.doc_id)
    return (
        j.groupBy("cent_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.count_distinct("lang").cast("long").alias("n_langs"),
            F.sum("q_x1e4").cast("long").alias("q_sum_x1e4"),
        )
        # integer-DIV HALF-UP mean (the repo canon — double division
        # plus cast-truncation misrounds past 2^53)
        .selectExpr(
            "cent_id",
            "n_docs",
            "n_langs",
            "q_sum_x1e4",
            "CAST((q_sum_x1e4 * 2 + n_docs) DIV (2 * n_docs) AS LONG) AS q_mean_x1e4",
        )
        .orderBy("cent_id")
    )


@query("q126_ann_recall", no_oracle_reason="the IVF side is approximate by construction")
def q126_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-quality evaluation as a query: recall@10 of the IVF ANN
    index (q106's real-KMeans fit) against exact brute-force top-10
    (q53's oracle-checked formulation), per query and summarized — the
    number a production pipeline monitors when it tunes
    n_centroids/nprobe or decides an index rebuild.

    Plan: both sides restricted to the same query slice; exact side is
    the broadcast fan-out + partial top-k, IVF side probes the
    PERSISTED IVFIndex artifact (q106's — the gauge evaluates the
    index a deployment actually serves, and pays no per-run refit);
    recall is one inner join on (q_id, neighbor) + two
    grouped counts. Scores never cross the boundary — only integer
    hit counts and a 4-decimal exact rational recall."""
    from ml_with_spark_streaming_spark.operators.ann_index import ivf_index_for
    from ml_with_spark_streaming_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )
    from ml_with_spark_streaming_spark.operators.textstats import exact_round_div

    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = maybe_checkpoint(
        brute_force_topk(queries, e, k=10).select("q_id", "vec_id")
    )
    idx = ivf_index_for(e, sf_dir, n_centroids=16, c_vec="embedding", seed=42)
    approx = maybe_checkpoint(
        ivf_topk(
            queries, e, k=10, nprobe=4,
            centroids=idx.centroids, assignments=idx.assignments,
        ).select("q_id", "vec_id")
    )
    hits = exact.join(approx, ["q_id", "vec_id"], "left_semi")
    per_q = (
        exact.groupBy("q_id")
        .agg(F.count("*").cast("long").alias("n_exact"))
        .join(
            hits.groupBy("q_id").agg(F.count("*").cast("long").alias("n_hit")),
            "q_id",
            "left",
        )
        .select(
            "q_id",
            "n_exact",
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
        )
    )
    return per_q.select(
        "q_id",
        "n_exact",
        "n_hit",
        exact_round_div(F.col("n_hit"), F.col("n_exact")).alias("recall_at_10"),
    ).orderBy("q_id")


@query("q129_ivf_nprobe_sweep", no_oracle_reason="IVF ANN is approximate by construction")
def q129_ivf_nprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF tuning table: recall@10 vs nprobe (1/2/4/8) against the
    exact brute-force baseline, one row per setting — what an index
    operator reads to pick the recall/cost point (q126 measures the
    chosen config; this query is how it gets chosen).

    The fit comes from the PERSISTED IVFIndex artifact (q106's) and
    the exact baseline is computed ONCE and shared across the sweep
    (checkpointed); each sweep point re-probes only. Recall is summed
    integer hits over summed exact neighbors — exact rational,
    driver-narrow."""
    from ml_with_spark_streaming_spark.operators.ann_index import ivf_index_for
    from ml_with_spark_streaming_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )
    from ml_with_spark_streaming_spark.operators.textstats import exact_round_div

    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = maybe_checkpoint(
        brute_force_topk(queries, e, k=10).select("q_id", "vec_id")
    )
    idx = ivf_index_for(e, sf_dir, n_centroids=16, c_vec="embedding", seed=42)
    rows = []
    for nprobe in (1, 2, 4, 8):
        approx = ivf_topk(
            queries, e, k=10, nprobe=nprobe,
            centroids=idx.centroids, assignments=idx.assignments,
        ).select("q_id", "vec_id")
        stats = (
            exact.join(approx, ["q_id", "vec_id"], "left_semi")
            .agg(F.count("*").cast("long").alias("n_hit"))
            .crossJoin(exact.agg(F.count("*").cast("long").alias("n_exact")))
            .collect()[0]
        )
        rows.append((nprobe, int(stats["n_exact"]), int(stats["n_hit"])))
    out = spark.createDataFrame(rows, "nprobe long, n_exact long, n_hit long")
    return out.select(
        "nprobe",
        "n_exact",
        "n_hit",
        exact_round_div(F.col("n_hit"), F.col("n_exact")).alias("recall_at_10"),
    ).orderBy("nprobe")


# ---------------------------------------------------------------------------
# q132 — semantic decontamination (embedding-cosine eval-set gate)
# ---------------------------------------------------------------------------

Q132_SQL = f"""
WITH ev AS (
  SELECT vec_id AS eval_id, embedding AS vec FROM embeddings WHERE vec_id < 20
),
scored AS (
  SELECT c.vec_id, e.eval_id,
         ROUND({_COS.format(a='c.embedding', b='e.vec')}, 4) AS cosine
  FROM embeddings c, ev e
  WHERE c.vec_id >= 20
),
best AS (
  SELECT vec_id, eval_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cosine DESC, eval_id) AS rn
  FROM scored
)
SELECT vec_id,
       CAST(eval_id AS BIGINT) AS nearest_eval_id,
       cosine AS max_cosine,
       CAST(CASE WHEN cosine >= 0.35 THEN 1 ELSE 0 END AS BIGINT) AS contaminated
FROM best WHERE rn = 1
ORDER BY vec_id
"""


@query("q132_semantic_decontamination", Q132_SQL)
def q132_semantic_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic (embedding-level) benchmark decontamination — the
    paraphrase-robust sibling of q101's 13-gram lexical gate: a corpus
    vector is flagged when its cosine to ANY eval vector reaches the
    threshold, with the nearest eval id and the margin kept for audit.

    Eval set = vec_id < 20 (benchmark-sized, fixed); corpus = the
    rest. Threshold 0.35 is calibrated to THIS synthetic table (max
    corpus-to-eval cosine ≈ 0.49, p90 ≈ 0.32 — random-ish vectors);
    production semantic decon runs >= 0.95 on real encoder output.
    The plan shape is threshold-independent.

    Scale: the oracle's quadratic join is replayable because the
    corpus side here is tiny; the ENGINE plan is the 100 TB shape —
    packed eval broadcast + per-row fold, zero shuffles (see
    operators/decontaminate.py::semantic_contamination).
    """
    from ml_with_spark_streaming_spark.operators.decontaminate import (
        semantic_contamination,
    )

    e = load_table(spark, sf_dir, "embeddings")
    ev = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("eval_id"), F.col("embedding").alias("vec")
    )
    corpus = e.filter(F.col("vec_id") >= 20)
    return semantic_contamination(corpus, ev, threshold=0.35).orderBy("vec_id")


@query("q136_pq_recall", no_oracle_reason="KMeans PQ codebooks aren't SQL-expressible")
def q136_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization index evaluation: recall@10 of PQ-ADC
    scoring (operators/pq.py — m=4 subspaces x 16 codes = 4 bytes per
    vector, 64x compression of the d=64 corpus) against exact
    brute-force cosine top-10, per query. The q126 gauge for the
    COMPRESSED index family: what a 100 TB embedding store monitors
    when deciding whether in-memory PQ codes can serve first-pass
    retrieval (with exact re-rank on the shortlist) or the index
    needs more codebook bits.

    Plan: codebooks + codes come from the PERSISTED PQIndex artifact
    (q170's — fit and encode happen once per corpus, not per gauge
    run); ADC is the q53 broadcast fan-out over the CODES table;
    recall is a semi-join + two grouped counts. Only integer hits and
    the exact-rational recall surface.
    """
    from ml_with_spark_streaming_spark.operators.ann_index import pq_index_for
    from ml_with_spark_streaming_spark.operators.pq import pq_topk, pq_topk_rerank
    from ml_with_spark_streaming_spark.operators.similarity import brute_force_topk
    from ml_with_spark_streaming_spark.operators.textstats import exact_round_div

    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = maybe_checkpoint(
        brute_force_topk(queries, e, k=10).select("q_id", "vec_id")
    )
    # the shared persisted fit + encode for both retrieval modes
    pqidx = pq_index_for(e, sf_dir, m=4, k_sub=16, c_vec="embedding", seed=42)
    cb, codes = pqidx.codebooks, pqidx.codes
    modes = {
        "adc": pq_topk(queries, e, k=10, m=4, codebooks=cb, codes=codes),
        "adc_rerank50": pq_topk_rerank(
            queries, e, k=10, shortlist=50, m=4, codebooks=cb, codes=codes
        ),
    }
    outs = []
    for mode, approx in modes.items():
        hits = exact.join(
            approx.select("q_id", "vec_id"), ["q_id", "vec_id"], "left_semi"
        )
        per_q = (
            exact.groupBy("q_id")
            .agg(F.count("*").cast("long").alias("n_exact"))
            .join(
                hits.groupBy("q_id").agg(F.count("*").cast("long").alias("n_hit")),
                "q_id",
                "left",
            )
            .select(
                F.lit(mode).alias("method"),
                "q_id",
                "n_exact",
                F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
            )
        )
        outs.append(per_q)
    out = outs[0].unionByName(outs[1])
    return out.select(
        "method",
        "q_id",
        "n_exact",
        "n_hit",
        exact_round_div(F.col("n_hit"), F.col("n_exact")).alias("recall_at_10"),
    ).orderBy("method", "q_id")


# ---------------------------------------------------------------------------
# q138 — PCA dimensionality reduction + reduced-space ANN recall sweep
# ---------------------------------------------------------------------------


@query("q138_pca_ann_sweep", no_oracle_reason="the PCA eigenbasis isn't SQL-expressible")
def q138_pca_ann_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA-reduced similarity search, evaluated: recall@10 of L2 top-10
    computed in a k-dim PCA projection (k = 4/8/16/32 of d=64) against
    exact full-dimension L2 top-10, direct and with exact re-rank of a
    50-shortlist — the tuning table for the cheapest footprint cut an
    embedding store can make (operators/pca.py; the rotation/truncation
    sibling of the q136 PQ gauge).

    Plan: ONE MLlib PCA fit at k=32 (PCA axes are nested, so every
    narrower k is a prefix slice of the same projection — no refit, no
    reprojection); corpus and queries projected once each via the
    packed-broadcast fold (zero shuffles, pure codegen) and
    checkpointed; per sweep point the reduced search is the q53-style
    broadcast fan-out over k-dim arrays (k/64th the arithmetic) and the
    re-rank touches full vectors for shortlist·n_queries rows only.
    Only integer hit counts and exact-rational recalls surface.
    """
    from ml_with_spark_streaming_spark.operators.pca import (
        _l2sq_expr,
        fit_pca,
        l2_topk,
        pca_project,
    )
    from ml_with_spark_streaming_spark.operators.textstats import exact_round_div
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = maybe_checkpoint(l2_topk(queries, e, k=10).select("q_id", "vec_id"))

    mean, pc = fit_pca(e, k=32)
    cp = maybe_checkpoint(
        pca_project(e, mean, pc).select("vec_id", "proj")
    )
    qp = maybe_checkpoint(
        pca_project(queries, mean, pc, vec_col="q_vec", out_col="q_proj").select(
            "q_id", "q_vec", "q_proj"
        )
    )

    outs = []
    for k_dims in (4, 8, 16, 32):
        qk = qp.select("q_id", F.slice("q_proj", 1, k_dims).alias("q_proj_k"))
        ck = cp.select("vec_id", F.slice("proj", 1, k_dims).alias("proj_k"))
        red = l2_topk(
            qk, ck, k=50, q_vec="q_proj_k", c_vec="proj_k"
        ).select("q_id", "vec_id", "rank")
        shortlist = red.select("q_id", "vec_id")
        rr = (
            shortlist.join(e, "vec_id")
            .join(F.broadcast(queries), "q_id")
            .select(
                "q_id",
                "vec_id",
                F.round(_l2sq_expr(F.col("q_vec"), F.col("embedding")), 6).alias("l2sq"),
            )
        )
        wrr = W.partitionBy("q_id").orderBy(F.col("l2sq").asc(), F.col("vec_id"))
        modes = {
            "reduced": red.filter(F.col("rank") <= 10).select("q_id", "vec_id"),
            "rerank50": rr.withColumn("rk", F.row_number().over(wrr))
            .filter(F.col("rk") <= 10)
            .select("q_id", "vec_id"),
        }
        for mode, approx in modes.items():
            hits = exact.join(approx, ["q_id", "vec_id"], "left_semi")
            outs.append(
                exact.agg(F.count("*").cast("long").alias("n_exact"))
                .crossJoin(hits.agg(F.count("*").cast("long").alias("n_hit")))
                .select(
                    F.lit(k_dims).cast("long").alias("k_dims"),
                    F.lit(mode).alias("method"),
                    "n_exact",
                    "n_hit",
                    exact_round_div(F.col("n_hit"), F.col("n_exact")).alias(
                        "recall_at_10"
                    ),
                )
            )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("k_dims", "method")


# ---------------------------------------------------------------------------
# q140 — containment near-dup pairs (asymmetric: truncations/supersets)
# ---------------------------------------------------------------------------

Q140_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split({CLEAN_SQL}, ' ') AS t
  FROM documents WHERE length({CLEAN_SQL}) > 0
),
grams AS (
  SELECT DISTINCT doc_id AS id, substr(md5(g), 1, 16) AS g
  FROM (
    SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(t) - 2, 0)),
                   i -> array_to_string(t[i:i+2], ' '))) AS g
    FROM toks
  )
),
gf AS (
  SELECT id, g FROM (
    SELECT id, g, COUNT(*) OVER (PARTITION BY g) AS dfc FROM grams
  ) WHERE dfc <= 20
),
sz AS (SELECT id, COUNT(*) AS n FROM gf GROUP BY id),
inter AS (
  SELECT a.id AS id1, b.id AS id2, COUNT(*) AS c
  FROM gf a JOIN gf b ON a.g = b.g AND a.id < b.id
  GROUP BY 1, 2
),
scored AS (
  SELECT id1, id2,
         ROUND(c * 1.0 / sa.n, 4) AS c_ab,
         ROUND(c * 1.0 / sb.n, 4) AS c_ba
  FROM inter JOIN sz sa ON sa.id = inter.id1 JOIN sz sb ON sb.id = inter.id2
)
SELECT id1, id2, c_ab, c_ba,
       CASE WHEN c_ab >= 0.8 AND c_ba >= 0.8 THEN 'mutual'
            WHEN c_ab >= 0.8 THEN 'a_in_b'
            ELSE 'b_in_a' END AS relation
FROM scored
WHERE greatest(c_ab, c_ba) >= 0.8
ORDER BY id1, id2
"""


@query("q140_containment_pairs", Q140_SQL)
def q140_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup pairs by shingle containment (Broder 1997):
    C(A,B) = |S(A)∩S(B)|/|S(A)| ≥ 0.8 in either direction. The dedup
    modality symmetric Jaccard (q50/q51/q58) is structurally blind to:
    a truncated copy or a doc-plus-appended-boilerplate has Jaccard
    ≈ |A|/|B| (tiny) but containment ≈ 1 — these survive the Jaccard
    pipeline and still leak near-duplicate content into training.

    Scale shape: pairs form only inside shared-shingle postings, with
    shingles above document-frequency 20 dropped first (the q128
    stop-fingerprint guard bounds the posting join; common shingles
    carry no containment signal). See operators/dedup.py
    ::containment_pairs.
    """
    from ml_with_spark_streaming_spark.operators.dedup import containment_pairs

    d = load_table(spark, sf_dir, "documents")
    return containment_pairs(d, threshold=0.8, stop_df=20).orderBy("id1", "id2")


# ---------------------------------------------------------------------------
# q148 — hybrid retrieval: BM25 (lexical) + cosine (semantic), RRF-fused
# ---------------------------------------------------------------------------

from ml_with_spark_streaming_spark.operators.retrieval import (  # noqa: E402
    BM25_AVGDL_DUCK,
    BM25_CONTRIB_DUCK,
    bm25_topk,
)

_RRF_K = 60  # standard RRF constant (Cormack et al. 2009)
_RRF_SCALE = 10**9
_HYB_TERMS = ("hash", "join", "vector")
_HYB_TERMS_SQL = ", ".join(f"'{t}'" for t in _HYB_TERMS)

# Lexical arm = q117's fixed-point BM25 CTE chain (top-50 with ranks);
# semantic arm = q53's rounded-cosine ranking for ONE query vector;
# fusion = integer reciprocal-rank: 1e9 // (60 + rank), summed.
Q148_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split({CLEAN_SQL}, ' ') AS t
  FROM documents WHERE length({CLEAN_SQL}) > 0
),
dl AS (SELECT doc_id, len(t) AS dl FROM toks),
st AS (
  SELECT n, tt, CAST({BM25_AVGDL_DUCK} AS BIGINT) AS a
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS tt FROM dl)
),
tok AS (SELECT doc_id, unnest(t) AS term FROM toks),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE term IN ({_HYB_TERMS_SQL}) GROUP BY doc_id, term
),
dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
r AS (
  SELECT tf.doc_id AS doc_id, tf.tf AS tf, dfreq.df AS df, dl.dl AS dl, st.n AS n, st.a AS a
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN st
),
lex AS (
  SELECT doc_id, CAST(SUM({BM25_CONTRIB_DUCK}) AS BIGINT) AS s
  FROM r GROUP BY doc_id
),
lexr AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS lex_rank
  FROM lex ORDER BY s DESC, doc_id LIMIT 50
),
q AS (SELECT embedding AS q_vec FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT c2.vec_id, ROUND({_COS.format(a='q.q_vec', b='c2.embedding')}, 4) AS cosine
  FROM embeddings c2, q WHERE c2.vec_id <> 0
),
semr AS (
  SELECT vec_id, ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id) AS sem_rank
  FROM scored ORDER BY cosine DESC, vec_id LIMIT 50
),
f AS (
  SELECT COALESCE(lexr.doc_id, semr.vec_id) AS doc_id,
         COALESCE(lex_rank, 0) AS lex_rank,
         COALESCE(sem_rank, 0) AS sem_rank,
         (CASE WHEN lex_rank IS NOT NULL THEN {_RRF_SCALE} // ({_RRF_K} + lex_rank) ELSE 0 END
          + CASE WHEN sem_rank IS NOT NULL THEN {_RRF_SCALE} // ({_RRF_K} + sem_rank) ELSE 0 END) AS rrf
  FROM lexr FULL OUTER JOIN semr ON lexr.doc_id = semr.vec_id
)
SELECT doc_id, CAST(lex_rank AS BIGINT) AS lex_rank,
       CAST(sem_rank AS BIGINT) AS sem_rank, CAST(rrf AS BIGINT) AS rrf_x1e9
FROM f ORDER BY rrf_x1e9 DESC, doc_id LIMIT 20
"""


@query("q148_hybrid_retrieval", Q148_SQL)
def q148_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion (Cormack et al.
    2009): the lexical arm is q117's fixed-point BM25 top-50 over
    documents, the semantic arm is q53's rounded-cosine top-50 over the
    aligned embeddings table (query = vec 0), fused as the integer
    reciprocal rank 1e9 // (60 + rank) summed across arms — the
    standard RAG-stack first-stage ranker, engine-exact end to end
    (BM25 is integer-rational; cosine ranks on the ROUND(..,4) value
    both engines agree on; fusion is pure integer arithmetic).

    Scale shape: each arm is its existing top-k operator (TakeOrdered,
    no global sort); fusion then touches only 2x50 rows — window
    ranks, the full-outer join, and the RRF sum all run on LIMIT-k
    outputs, so fusion cost is independent of corpus size.
    """
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")

    lex = bm25_topk(d, _HYB_TERMS, k=50, text_col="text", id_col="doc_id")
    from pyspark.sql import Window as W

    lexr = lex.select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.col("score_x1e4").desc(), "doc_id"))
        .alias("lex_rank"),
    )
    qv = e.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    semr = brute_force_topk(qv, e, k=50).select(
        "vec_id", F.col("rank").alias("sem_rank")
    )
    f = lexr.join(semr, lexr["doc_id"] == semr["vec_id"], "full_outer")
    rrf = F.expr(
        f"CASE WHEN lex_rank IS NOT NULL THEN {_RRF_SCALE} DIV ({_RRF_K} + lex_rank) ELSE 0 END"
        f" + CASE WHEN sem_rank IS NOT NULL THEN {_RRF_SCALE} DIV ({_RRF_K} + sem_rank) ELSE 0 END"
    )
    return (
        f.select(
            F.coalesce("doc_id", "vec_id").alias("doc_id"),
            F.coalesce("lex_rank", F.lit(0)).cast("long").alias("lex_rank"),
            F.coalesce("sem_rank", F.lit(0)).cast("long").alias("sem_rank"),
            rrf.cast("long").alias("rrf_x1e9"),
        )
        .orderBy(F.col("rrf_x1e9").desc(), "doc_id")
        .limit(20)
    )
