"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the whole point of these at 100 TB):
* exact dedup = hash-groupBy on a fingerprint — one shuffle keyed by
  the hash, map-side partial agg, no row ever compared to another
  directly;
* MinHash = explode(shingles) then ``groupBy(id).agg(min(h_0)...
  min(h_{k-1}))`` — k min-aggregates stay inside whole-stage codegen
  and combine map-side, so the shuffle carries one k-wide row per doc.
  (A nested higher-order-function formulation — transform over
  sequence(0,k) with an inner transform per shingle — falls out of
  codegen into interpreted evaluation and measured ~700 s where this
  takes ~2 s at sf0.01; never nest HOFs in a hot path.)
* LSH = band hashes over the signature columns, explode to
  (band_idx, band_hash), self-equi-join keyed by the band — candidate
  pairs only ever form within a bucket. Pairwise work is
  O(candidates), not O(n²);
* Jaccard verification only runs on LSH candidates at scale; the
  all-pairs token-join variant here is the oracle-checkable
  small-data path and is quadratic by design — do not point it at
  100 TB (use minhash_candidates → jaccard_verify instead);
* SimHash = explode(tokens) then 64 conditional-sum aggregates (one
  per bit), fingerprint assembled from the sums — same
  codegen/map-side-combine shape as MinHash.

Hashing note: MinHash signatures use md5 (hex-string min) rather than
xxhash64 so every step is reproducible in ANSI SQL for the DuckDB
oracle. SimHash uses xxhash64 (no DuckDB twin → rows-only check).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ml_with_spark_streaming_spark.functions.text import clean_text_expr, tokens_expr
from ml_with_spark_streaming_spark.lineage import maybe_checkpoint


def lsh_s_curve_error(
    b: int, r: int, threshold: float, w_fp: float = 0.5, w_fn: float = 0.5, steps: int = 1000
) -> float:
    """Integrated false-positive + false-negative probability of the
    LSH S-curve P(candidate | s) = 1 − (1 − s^r)^b around ``threshold``
    (midpoint rule; the standard banding-quality objective — MMDS
    ch. 3.4.3, same formulation datasketch's optimal-param search
    minimizes). FP mass is ∫₀ᵗ P ds, FN mass ∫ₜ¹ (1 − P) ds."""
    fp = fn = 0.0
    for i in range(steps):
        s = (i + 0.5) / steps
        p = 1.0 - (1.0 - s**r) ** b
        if s < threshold:
            fp += p / steps
        else:
            fn += (1.0 - p) / steps
    return w_fp * fp + w_fn * fn


def derive_minhash_knobs(
    n_docs: int,
    target_jaccard: float = 0.5,
    w_fp: float = 0.5,
    w_fn: float = 0.5,
) -> tuple[int, int]:
    """(k, bands) for :func:`minhash_candidates`, DERIVED from corpus
    size and the similarity threshold instead of fixture-tuned
    constants (the q100 ``derive_signlsh_knobs`` discipline).

    Signature width k grows with the corpus: a dissimilar pair
    (similarity s < t) becomes a candidate with probability
    ≈ b·s^r, so expected false-positive candidates per doc scale like
    n·b·s^r — bounding that as n grows requires more signature budget.
    The k ladder (16 → 32 → 64 at 1e6 / 1e8 docs) spends that budget
    on MORE BANDS at the optimizer-chosen r: the integrated S-curve
    error falls monotonically with k (0.083 → 0.059 → 0.053 at
    t = 0.5), cutting BOTH false-negative mass above the threshold and
    the steepness-limited false-positive mass just below it, while the
    exact-Jaccard verify stage absorbs what remains.

    bands b then minimizes :func:`lsh_s_curve_error` over the divisors
    of k at the target threshold — for (k=16, t=0.5) this lands on
    b=4 (threshold (1/4)^(1/4) ≈ 0.71), the constants q50/q58 shipped
    with; at 1e7 docs it returns (32, 8), at 1e9 (64, 16). Pinned by
    tests/test_dedup.py::test_derive_minhash_knobs.

    ``w_fp``/``w_fn`` weight the two error masses. The symmetric
    default fits candidate-ANALYSIS jobs (q50/q58: every candidate is
    exact-verified, both error kinds cost one unit of work). An ingest
    GATE is asymmetric — a missed duplicate enters the corpus forever,
    a false candidate costs one verify join — so a gate should derive
    with w_fn ≫ w_fp: at t = 0.9 the symmetric optimum is (16, 1)
    (one 16-row AND band, recall at s = 0.94 only ~0.37), while
    w_fn = 0.95 picks b = 4 (recall ~0.998) — exactly the banding
    `streaming/ingest_dedup.py` ships (pinned by test)."""
    k = 16 if n_docs <= 1_000_000 else 32 if n_docs <= 100_000_000 else 64
    best_b = min(
        (b for b in range(1, k + 1) if k % b == 0),
        key=lambda b: lsh_s_curve_error(b, k // b, target_jaccard, w_fp, w_fn),
    )
    return k, best_b


def shingles_expr(tokens: Column, n: int = 3) -> Column:
    """Word n-gram shingles: slice windows over the token array
    (JVM-side; empty when fewer than n tokens).

    The short-doc branch must be explicit: ``sequence(1, 0)`` DESCENDS
    in Spark (default step -1 when start > stop), so the naive
    ``sequence(1, greatest(size-n+1, 0))`` yields ``[1, 0]`` for a doc
    with < n tokens and ``slice(toks, 0, n)`` then throws
    INVALID_PARAMETER_VALUE.START at runtime."""
    idx = F.when(
        F.size(tokens) >= n, F.sequence(F.lit(1), F.size(tokens) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tokens, i, n)))


def _minhash_col(i: int, shingle_col: str = "_s") -> Column:
    """The i-th minhash value AS A LONG: a 32-bit (8-hex-char) chunk
    of a salted md5, parsed to numeric — each 128-bit digest yields
    FOUR signature values, so k=16 costs 4 md5 calls per shingle, not
    16 (measured 1.15 s → 0.76 s at sf0.1; codegen dedupes the shared
    digests across the min-aggs). Numeric min ≡ lexicographic min over
    fixed-width hex, but min(long) buffers get codegen'd HashAggregate
    while min(string) forces SortAggregate (measured 3.4 s → 2.2 s for
    the signature stage at sf0.1)."""
    salt, chunk = divmod(i, 4)
    h = F.substring(
        F.md5(F.encode(F.concat_ws("#", F.col(shingle_col), F.lit(str(salt))), "UTF-8")),
        chunk * 8 + 1,
        8,
    )
    return F.conv(h, 16, 10).cast("long")


def exploded_shingles(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """The exploded ``(id_col, _s)`` shingle table every shingle
    consumer starts from — tokenize behind the repartition barrier
    (the CollapseProject-into-Generate rule), then one Generate.
    Exposed so composite queries (q167/q171's recall audit) can
    materialize ONE shingle pass and feed both their exact-Jaccard and
    MinHash sides instead of re-running tokenize+explode per side."""
    toks = df.select(F.col(id_col), tokens_expr(clean_text_expr(text_col)).alias("_toks"))
    toks = toks.repartition(id_col)
    return toks.select(
        F.col(id_col), F.explode(shingles_expr(F.col("_toks"), n)).alias("_s")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    shingle_n: int = 3,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Per-doc k-wide MinHash signature: columns ``<id_col>, mh0..mh{k-1}``.

    sig[i] = min over shingles of md5(shingle || '#' || i). Docs with
    zero shingles drop out (explode of an empty array yields no rows),
    matching the reference semantics of skipping empty text.

    ``shingles``: a pre-built ``(id_col, _s)`` table from
    :func:`exploded_shingles` (same ``shingle_n``!) — callers that
    also need the shingles elsewhere share one pass.
    """
    # Materialize tokenization behind a shuffle barrier BEFORE the
    # shingle explode: CollapseProject otherwise inlines the 4-regex
    # cleaning chain into the shingle lambda, re-evaluating it once PER
    # SHINGLE (~50x per doc — measured 24 s vs 3 s at sf0.1). The
    # repartition also spreads the hash fan-out evenly, which is what
    # you want at scale anyway.
    ex = (
        shingles
        if shingles is not None
        else exploded_shingles(df, text_col, id_col, shingle_n)
    )
    aggs = [F.min(_minhash_col(i)).alias(f"mh{i}") for i in range(k)]
    sig = ex.groupBy(id_col).agg(*aggs)
    # surface as the canonical 8-hex form (what the DuckDB oracle and
    # the band hashes consume); the numeric form exists only inside
    # the aggregation buffers
    return sig.select(
        F.col(id_col),
        *[F.format_string("%08x", F.col(f"mh{i}")).alias(f"mh{i}") for i in range(k)],
    )


def lsh_bands(sig: DataFrame, id_col: str = "doc_id", k: int = 16, bands: int = 4) -> DataFrame:
    """Explode a signature table to ``<id_col>, band_idx, band_hash``.

    band[j] = md5(join('|', sig[j*rows .. j*rows+rows-1])). Docs
    sharing any (band_idx, band_hash) are candidate duplicates.
    """
    rows = k // bands
    band_cols = [
        F.md5(
            F.encode(F.concat_ws("|", *[F.col(f"mh{j * rows + r}") for r in range(rows)]), "UTF-8")
        )
        for j in range(bands)
    ]
    return sig.select(
        F.col(id_col), F.posexplode(F.array(*band_cols)).alias("band_idx", "band_hash")
    )


def minhash_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    bands: int = 4,
    max_bucket: int | None = None,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Distinct candidate pairs (id1 < id2) sharing ≥1 LSH band.

    One shuffle keyed by (band_idx, band_hash) groups each bucket, then
    pairs are generated INSIDE the bucket array — no self-join, so the
    signature pipeline runs once (a self-equi-join recomputed it for
    both sides: 6.5 s → 3.4 s at sf0.1). Within-bucket pair generation
    is quadratic in bucket size, which is inherent to LSH candidate
    semantics; bucket arrays are dup-group-sized, not data-sized.

    ``max_bucket`` is the hot-bucket quadratic guard (q128's
    stop-fingerprint discipline applied to LSH): a bucket of m ids
    yields m(m−1)/2 pairs, so one pathological bucket (boilerplate
    text, a mass-duplicated template) can dominate the whole stage —
    m = 1e5 near-identical docs is 5e9 pairs from ONE bucket. Buckets
    larger than the cap emit STAR pairs (min id × each other id,
    m−1 pairs) instead of all pairs: downstream exact-Jaccard verify
    still sees every member, and the connected-components consumer
    (q90/q100) recovers the full duplicate CLUSTER through the star's
    transitive closure — only direct pair enumeration inside the
    oversized bucket is traded away. None (default) keeps exact
    all-pairs semantics (the oracle-checked form)."""
    banded = lsh_bands(
        minhash_signatures(df, text_col, id_col, k, shingles=shingles), id_col, k, bands
    )
    buckets = (
        banded.groupBy("band_idx", "band_hash")
        .agg(F.array_sort(F.collect_set(id_col)).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    all_pairs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("id1"), y.alias("id2")),
            ),
        )
    )
    if max_bucket is not None:
        star = F.transform(
            F.slice(F.col("ids"), 2, F.size(F.col("ids"))),
            lambda y: F.struct(F.col("ids")[0].alias("id1"), y.alias("id2")),
        )
        pairs = F.when(F.size("ids") > max_bucket, star).otherwise(all_pairs)
    else:
        pairs = all_pairs
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select(F.col("p.id1"), F.col("p.id2"))
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    shingle_w: int | None = None,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Exact set-Jaccard over all pairs sharing ≥1 element.

    Elements are distinct TOKENS by default (q51's form); with
    ``shingle_w`` set they are distinct w-token shingles — the
    similarity the MinHash gate actually approximates (q167's recall
    audit compares the gate against THAT, not token sets).

    Small-data / oracle path (quadratic in docs-per-element). The
    scale path is minhash_candidates → this same arithmetic restricted
    to candidates (jaccard_verify).
    Columns: id1, id2, jaccard (rounded 4).
    """
    # Tokenize behind the repartition barrier BEFORE the element
    # explode — the same CollapseProject-into-Generate trap as
    # minhash_signatures: without it the 4-regex cleaning chain is
    # inlined into the shingle lambda and re-evaluated once per
    # shingle (measured 4.5 s → 0.45 s for the q167 audit slice at
    # sf0.1; the barrier also spreads the fan-out across tasks, which
    # a 1-file oracle-slice scan otherwise serializes).
    # ``shingles`` (a pre-built exploded_shingles table, shingle width
    # == shingle_w) lets composite callers share that pass instead.
    if shingles is not None:
        if shingle_w is None:
            raise ValueError("shingles= requires shingle_w (token mode has no shingle table)")
        dt = (
            shingles.select(F.col(id_col).alias("id"), F.col("_s").alias("t"))
            .filter(F.col("t") != "")
            .distinct()
        )
    else:
        tk = df.select(
            F.col(id_col).alias("id"), tokens_expr(clean_text_expr(text_col)).alias("_toks")
        ).repartition("id")
        elems = (
            F.col("_toks") if shingle_w is None else shingles_expr(F.col("_toks"), shingle_w)
        )
        dt = (
            tk.select("id", F.explode(F.array_distinct(elems)).alias("t"))
            .filter(F.col("t") != "")
            .distinct()
        )
    # callers cap the input (oracle path), so materializing the
    # token table is cheap — and the four downstream consumers
    # (a/b join sides, two size lookups) stop re-planning the scan
    dt = maybe_checkpoint(dt)
    sizes = dt.groupBy("id").agg(F.count("*").alias("n"))
    a = dt.select(F.col("id").alias("id1"), "t")
    b = dt.select(F.col("id").alias("id2"), F.col("t").alias("t2"))
    inter = (
        a.join(b, (a.t == b.t2) & (a.id1 < b.id2))
        .groupBy("id1", "id2")
        .agg(F.count("*").alias("c"))
    )
    sa = sizes.select(F.col("id").alias("id1"), F.col("n").alias("na"))
    sb = sizes.select(F.col("id").alias("id2"), F.col("n").alias("nb"))
    return (
        inter.join(sa, "id1")
        .join(sb, "id2")
        .withColumn("jaccard", F.round(F.col("c") / (F.col("na") + F.col("nb") - F.col("c")), 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "jaccard")
    )


def jaccard_verify(
    candidates: DataFrame,
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """Exact Jaccard restricted to LSH candidate pairs — the scale
    path: O(candidates) token-set intersections, each computed as one
    JVM array op after two hash joins against the token-set table.

    The candidate pairs are materialized (they are the SMALL, bounded
    product of LSH) and the token-set table is semi-joined down to
    candidate ids before being materialized and probed from both join
    sides — otherwise each side re-plans the full-corpus tokenize scan
    (measured 7.2 s → 4.4 s for the q90 edge stage at sf0.1)."""
    cand = maybe_checkpoint(candidates)
    ids = (
        cand.select(F.col("id1").alias("_jid"))
        .union(cand.select(F.col("id2").alias("_jid")))
        .distinct()
    )
    tok_sets = df.select(
        F.col(id_col).alias("_jid"),
        F.array_distinct(F.array_remove(tokens_expr(clean_text_expr(text_col)), "")).alias("_jt"),
    ).join(ids, "_jid", "left_semi")
    tok_sets = maybe_checkpoint(tok_sets)
    candidates = cand
    a = tok_sets.select(F.col("_jid").alias("id1"), F.col("_jt").alias("t1"))
    b = tok_sets.select(F.col("_jid").alias("id2"), F.col("_jt").alias("t2"))
    inter = F.size(F.array_intersect(F.col("t1"), F.col("t2")))
    union = F.size(F.col("t1")) + F.size(F.col("t2")) - inter
    return (
        candidates.join(a, "id1")
        .join(b, "id2")
        .withColumn("jaccard", F.round(inter / union, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "jaccard")
    )


def simhash_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """64-bit SimHash per doc: columns ``<id_col>, simhash`` (long).

    explode(distinct tokens) → one conditional-sum aggregate per bit
    (sum +1/-1 by bit of xxhash64(token)) → sign of each sum becomes
    the fingerprint bit. All literal shift amounts, so every
    expression stays in whole-stage codegen and combines map-side.
    """
    ex = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(tokens_expr(clean_text_expr(text_col)))).alias("_t"),
    ).filter(F.col("_t") != "")
    h = F.xxhash64(F.col("_t"))
    aggs = [
        F.sum(F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"b{i}")
        for i in range(bits)
    ]
    sums = ex.groupBy(id_col).agg(*aggs)
    fp = reduce(
        Column.bitwiseOR,
        [
            F.when(
                F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
            ).otherwise(F.lit(0).cast("long"))
            for i in range(bits)
        ],
    )
    return sums.select(F.col(id_col), fp.alias("simhash"))


def simhash_hamming(a: Column, b: Column) -> Column:
    """Hamming distance between two simhash longs (popcount via
    bit_count)."""
    return F.bit_count(a.bitwiseXOR(b))


def mllib_minhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_hash_tables: int = 8,
    num_features: int = 1 << 18,
) -> DataFrame:
    """Fuzzy-dedup via MLlib's built-in ``MinHashLSH.approxSimilarityJoin``
    — the alternate path to the hand-rolled md5 MinHash above
    (minhash_candidates → jaccard_verify).

    Token sets → binary HashingTF vectors → MinHashLSH; the approx
    join buckets by hash tables (OR-amplified) and computes Jaccard
    distance on candidates only — exact over the HASHED feature sets,
    which equals token-set Jaccard except when distinct tokens collide
    into one of the ``num_features`` buckets (≈ vocab²/2^19 expected
    colliding token pairs at the default 2^18; raise num_features for
    big vocabularies). The tests cross-check values against
    jaccard_pairs on a collision-free fixture. Candidate recall is
    approximate by construction → rows-only check.
    Columns: id1, id2, jaccard (rounded 4).
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    toks = df.select(
        F.col(id_col),
        F.array_distinct(
            F.array_remove(tokens_expr(clean_text_expr(text_col)), "")
        ).alias("_toks"),
    ).filter(F.size("_toks") > 0)
    feat = HashingTF(
        inputCol="_toks", outputCol="_features", numFeatures=num_features, binary=True
    ).transform(toks)
    model = MinHashLSH(
        inputCol="_features", outputCol="_hashes", numHashTables=num_hash_tables, seed=42
    ).fit(feat)
    pairs = model.approxSimilarityJoin(feat, feat, 1.0 - threshold, distCol="_dist")
    return (
        pairs.filter(F.col(f"datasetA.{id_col}") < F.col(f"datasetB.{id_col}"))
        .select(
            F.col(f"datasetA.{id_col}").alias("id1"),
            F.col(f"datasetB.{id_col}").alias("id2"),
            F.round(1.0 - F.col("_dist"), 4).alias("jaccard"),
        )
    )


def exact_dedup(df: DataFrame, key: Column, id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id representative per key; one hash-shuffle.
    Columns: <id_col> (kept id), group_size."""
    return (
        df.select(key.alias("_k"), F.col(id_col))
        .groupBy("_k")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("group_size"))
        .drop("_k")
        .select(id_col, "group_size")
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    stop_df: int = 20,
) -> DataFrame:
    """Asymmetric near-dup pairs by shingle CONTAINMENT (Broder 1997):
    C(A,B) = |S(A) ∩ S(B)| / |S(A)|. Catches the duplicates symmetric
    Jaccard is structurally blind to — a truncated copy, a doc embedded
    in a longer one, a page plus appended boilerplate: when |A| ≪ |B|,
    Jaccard ≈ |A|/|B| stays tiny while C(A,B) ≈ 1.

    Returns ``(id1, id2, c_ab, c_ba, relation)`` for pairs with
    max(C) ≥ threshold, id1 < id2; relation classifies the direction:
    'mutual' (both ≥ τ — ordinary near-dups), 'a_in_b' (id1 nearly
    contained in id2), 'b_in_a'.

    Scale shape: candidate pairs form ONLY inside shared-shingle
    postings, and shingles with document frequency > ``stop_df`` are
    dropped first (the q128 stop-fingerprint guard — common shingles
    are exactly the hot keys that would make the posting join
    quadratic; they also carry no containment signal). Set sizes are
    counted AFTER the stop filter so both containment directions use
    the same informative-shingle universe (documented semantics: an
    all-boilerplate doc has an empty effective set and pairs with
    nothing). One shingle-keyed window for the df filter, one posting
    join, one per-pair count — the same bounded-quadratic envelope as
    winnowing overlap.
    """
    from pyspark.sql import Window as W

    toks = df.select(
        F.col(id_col).alias("id"), tokens_expr(clean_text_expr(text_col)).alias("_t")
    ).repartition("id")
    grams = (
        toks.select(
            "id", F.explode(shingles_expr(F.col("_t"), n)).alias("_g")
        )
        .select("id", F.substring(F.md5(F.encode("_g", "UTF-8")), 1, 16).alias("g"))
        .distinct()
    )
    # round-11 note: a broadcast-anti-join-of-hot-grams variant (count
    # grams, broadcast the >stop_df list, anti-join — one fewer posting
    # exchange on paper) measured SLOWER end-to-end at sf0.1 (whole-q140
    # min 2.70 s vs 2.04 s here, 4-run alternating session): the extra
    # checkpoint materialization + per-consumer broadcast build costs
    # more than this single window pass over the checkpointed postings.
    gf = maybe_checkpoint(
        grams.withColumn("dfc", F.count("*").over(W.partitionBy("g")))
        .filter(F.col("dfc") <= stop_df)
        .select("id", "g")
    )
    sizes = gf.groupBy("id").agg(F.count("*").alias("n"))
    a = gf.select(F.col("id").alias("id1"), "g")
    b = gf.select(F.col("id").alias("id2"), F.col("g").alias("g2"))
    inter = (
        a.join(b, (a.g == b.g2) & (a.id1 < b.id2))
        .groupBy("id1", "id2")
        .agg(F.count("*").alias("c"))
    )
    sa = sizes.select(F.col("id").alias("id1"), F.col("n").alias("na"))
    sb = sizes.select(F.col("id").alias("id2"), F.col("n").alias("nb"))
    scored = (
        inter.join(sa, "id1")
        .join(sb, "id2")
        .withColumn("c_ab", F.round(F.col("c") / F.col("na"), 4))
        .withColumn("c_ba", F.round(F.col("c") / F.col("nb"), 4))
        .filter(F.greatest("c_ab", "c_ba") >= threshold)
    )
    return scored.select(
        "id1",
        "id2",
        "c_ab",
        "c_ba",
        F.when((F.col("c_ab") >= threshold) & (F.col("c_ba") >= threshold), "mutual")
        .when(F.col("c_ab") >= threshold, "a_in_b")
        .otherwise("b_in_a")
        .alias("relation"),
    )
