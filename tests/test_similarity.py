"""Similarity-search operators: the HOF and Arrow/BLAS formulations
must agree exactly (same oracle), and IVF recall is sane."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from ml_with_spark_streaming_spark.operators.similarity import (
    brute_force_topk,
    brute_force_topk_arrow,
    ivf_topk,
)


@pytest.fixture(scope="module")
def vectors(spark):
    rnd = random.Random(7)
    rows = [(i, [rnd.gauss(0, 1) for _ in range(16)]) for i in range(200)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _queries(vectors):
    return vectors.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )


def test_arrow_topk_equals_hof_topk(vectors):
    hof = {
        (r["q_id"], r["rank"]): (r["vec_id"], r["cosine"])
        for r in brute_force_topk(_queries(vectors), vectors, k=10).collect()
    }
    arrow = {
        (r["q_id"], r["rank"]): (r["vec_id"], r["cosine"])
        for r in brute_force_topk_arrow(_queries(vectors), vectors, k=10).collect()
    }
    assert hof == arrow
    assert len(hof) == 50  # 5 queries × k=10


def test_ivf_topk_overlaps_exact(vectors):
    """IVF with all centroids probed degenerates to exact; with fewer
    probes it must still recover most of the true top-k."""
    exact = {
        (r["q_id"], r["vec_id"]) for r in brute_force_topk(_queries(vectors), vectors, k=10).collect()
    }
    approx = {
        (r["q_id"], r["vec_id"])
        for r in ivf_topk(_queries(vectors), vectors, k=10, n_centroids=8, nprobe=8).collect()
    }
    # probing every bucket = exhaustive search
    assert approx == exact
    partial = {
        (r["q_id"], r["vec_id"])
        for r in ivf_topk(_queries(vectors), vectors, k=10, n_centroids=8, nprobe=4).collect()
    }
    recall = len(partial & exact) / len(exact)
    assert recall >= 0.5, f"recall {recall}"


def test_cosine_is_exact(vectors, spark):
    """Spot-check one pair against driver-side math."""
    rows = {r["vec_id"]: r["embedding"] for r in vectors.filter(F.col("vec_id") < 2).collect()}
    a, b = rows[0], rows[1]
    dot = sum(x * y for x, y in zip(a, b))
    want = round(dot / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))), 4)
    got = {
        r["vec_id"]: r["cosine"]
        for r in brute_force_topk_arrow(
            _queries(vectors).filter(F.col("q_id") == 0), vectors.filter(F.col("vec_id") <= 1), k=1
        ).collect()
    }
    assert got[1] == pytest.approx(want, abs=1e-4)


def test_signlsh_neardup_subset_of_exact_with_full_recall_on_clones(spark):
    """Sign-LSH verified pairs ⊆ exact pairs, with exact cosines; a
    jittered clone (cosine ≈ 1) must always be recovered — identical
    signs across every band."""
    from ml_with_spark_streaming_spark.operators.similarity import (
        neardup_pairs,
        signlsh_neardup,
    )

    rnd = random.Random(13)
    base = [[rnd.gauss(0, 1) for _ in range(16)] for _ in range(100)]
    rows = [(i, v) for i, v in enumerate(base)]
    # ids 100.. = near-exact clones of ids 0..9
    rows += [(100 + i, [x * 1.0001 + 1e-5 for x in base[i]]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    exact = {
        (r["id1"], r["id2"]): r["cosine"]
        for r in neardup_pairs(df, threshold=0.9).collect()
    }
    lsh = {
        (r["id1"], r["id2"]): r["cosine"]
        for r in signlsh_neardup(df, threshold=0.9).collect()
    }
    assert set(lsh) <= set(exact)
    for i in range(10):
        assert (i, 100 + i) in lsh  # clones share every sign bit
        assert lsh[(i, 100 + i)] == exact[(i, 100 + i)]


def test_ivf_kmeans_recall_on_planted_clusters(spark):
    """IVF with REAL KMeans centroids (q106's path): members of a
    planted near-identical cluster always land in the same KMeans
    bucket, so probing must recover ALL in-cluster neighbors — exact
    in-cluster recall, not an approximate overlap bound."""
    import random as _random

    from ml_with_spark_streaming_spark.operators.similarity import (
        ivf_topk,
        kmeans_centroids,
    )

    rnd = _random.Random(7)
    rows = []
    vid = 0
    # 10 planted clusters of 5 jittered copies
    for _ in range(10):
        base = [rnd.gauss(0, 1) for _ in range(16)]
        for _ in range(5):
            rows.append((vid, [x * (1 + rnd.uniform(-1e-3, 1e-3)) for x in base]))
            vid += 1
    # noise
    for _ in range(100):
        rows.append((vid, [rnd.gauss(0, 1) for _ in range(16)]))
        vid += 1
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    cents = kmeans_centroids(corpus, n_centroids=8, c_vec="embedding", seed=42)
    # one query per planted cluster: its first member
    queries = corpus.filter((F.col("vec_id") % 5 == 0) & (F.col("vec_id") < 50)).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    got = (
        ivf_topk(queries, corpus, k=4, n_centroids=8, nprobe=2, centroids=cents)
        .collect()
    )
    by_q: dict = {}
    for r in got:
        by_q.setdefault(r.q_id, set()).add(r.vec_id)
    for q in range(0, 50, 5):
        mates = {q + 1, q + 2, q + 3, q + 4}
        assert mates <= by_q.get(q, set()), (q, by_q.get(q))


def test_ivf_hard_negatives_recall(spark):
    """q165's composition (IVF probe + component anti-filter inside
    the probe): (a) an anchor's own cluster-mates NEVER surface as
    negatives even though they are its nearest vectors; (b) the probed
    negatives recover most of the exact exclusion-aware top-3 (the
    q126 recall discipline applied to hard-negative mining)."""
    import random as _random

    from ml_with_spark_streaming_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        kmeans_centroids,
    )

    rnd = _random.Random(7)
    rows = []
    vid = 0
    for _ in range(10):  # 10 planted clusters of 5 jittered copies
        base = [rnd.gauss(0, 1) for _ in range(16)]
        for _ in range(5):
            rows.append((vid, [x * (1 + rnd.uniform(-1e-3, 1e-3)) for x in base]))
            vid += 1
    for _ in range(100):  # noise
        rows.append((vid, [rnd.gauss(0, 1) for _ in range(16)]))
        vid += 1
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # component = planted cluster (vid//5*5 for members), own id for noise
    comp = F.when(F.col("vec_id") < 50, (F.col("vec_id") / 5).cast("long") * 5).otherwise(
        F.col("vec_id")
    )
    tagged = corpus.withColumn("neg_component", comp)

    anchors = (
        tagged.filter((F.col("vec_id") % 5 == 0) & (F.col("vec_id") < 50))
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_vec"),
            F.col("neg_component").alias("q_comp"),
        )
    )
    cents = kmeans_centroids(corpus, n_centroids=8, c_vec="embedding", seed=42)
    got = ivf_topk(
        anchors,
        tagged,
        k=3,
        nprobe=4,
        centroids=cents,
        q_group="q_comp",
        c_group="neg_component",
    ).collect()

    by_q: dict = {}
    for r in got:
        # (a) the exclusion holds: negatives never come from the
        # anchor's own cluster (its 4 nearest vectors by construction)
        assert r.neg_component != (r.q_id // 5) * 5, r
        by_q.setdefault(r.q_id, set()).add(r.vec_id)

    # exact exclusion-aware top-3: brute force, drop same-cluster, rank
    exact = sorted(
        brute_force_topk(anchors.select("q_id", "q_vec"), corpus, k=10).collect(),
        key=lambda r: (r.q_id, r.rank),
    )
    exact_by_q: dict = {}
    for r in exact:
        q_cluster = range((r.q_id // 5) * 5, (r.q_id // 5) * 5 + 5)
        if r.vec_id in q_cluster:
            continue
        s = exact_by_q.setdefault(r.q_id, [])
        if len(s) < 3:
            s.append(r.vec_id)

    hits = sum(len(by_q.get(q, set()) & set(want)) for q, want in exact_by_q.items())
    total = sum(len(want) for want in exact_by_q.values())
    assert total == 30
    recall = hits / total
    assert recall >= 0.6, f"IVF hard-negative recall {recall:.2f} < 0.6"


@pytest.mark.slow
def test_ivf_topk_c_group_map_matches_corpus_column(spark):
    """The round-12 candidate-side group attach (``c_group_map``) must
    return EXACTLY the rows of the corpus-column path — same ids, same
    cosines, same ranks — on a fixture where the exclusion bites
    (planted clusters crowd each anchor's top)."""
    import random as _random

    from ml_with_spark_streaming_spark.operators.similarity import (
        ivf_topk,
        kmeans_centroids,
    )

    rnd = _random.Random(11)
    rows = []
    vid = 0
    for _ in range(8):  # planted clusters of 4 jittered copies
        base = [rnd.gauss(0, 1) for _ in range(12)]
        for _ in range(4):
            rows.append((vid, [x * (1 + rnd.uniform(-1e-3, 1e-3)) for x in base]))
            vid += 1
    for _ in range(60):
        rows.append((vid, [rnd.gauss(0, 1) for _ in range(12)]))
        vid += 1
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    comp = F.when(F.col("vec_id") < 32, (F.col("vec_id") / 4).cast("long") * 4).otherwise(
        F.col("vec_id")
    )
    tagged = corpus.withColumn("neg_component", comp)
    group_map = corpus.select("vec_id", comp.alias("neg_component"))
    anchors = tagged.filter((F.col("vec_id") % 4 == 0) & (F.col("vec_id") < 32)).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_vec"),
        F.col("neg_component").alias("q_comp"),
    )
    cents = kmeans_centroids(corpus, n_centroids=8, c_vec="embedding", seed=42)
    kw = dict(k=3, nprobe=4, centroids=cents, q_group="q_comp", c_group="neg_component")
    via_column = ivf_topk(anchors, tagged, **kw).orderBy("q_id", "rank").collect()
    via_map = (
        ivf_topk(anchors, corpus, c_group_map=group_map, **kw)
        .orderBy("q_id", "rank")
        .collect()
    )
    assert via_map == via_column
    assert len(via_map) > 0


@pytest.mark.slow
def test_semdedup_planted_clusters(spark):
    """SemDeDup design regime: planted near-identical groups must
    collapse to ONE keeper each, noise survives untouched, and the
    cluster-scoped components equal the all-pairs components (the
    KMeans gate loses nothing where near-dups share a cluster)."""
    import random as _random

    from ml_with_spark_streaming_spark.operators.graph import connected_components
    from ml_with_spark_streaming_spark.operators.similarity import (
        neardup_pairs,
        semdedup,
    )

    rnd = _random.Random(11)
    rows = []
    vid = 0
    for _ in range(5):  # 5 planted groups of 4 jittered copies
        base = [rnd.gauss(0, 1) for _ in range(16)]
        for _ in range(4):
            rows.append((vid, [x * (1 + rnd.uniform(-1e-3, 1e-3)) for x in base]))
            vid += 1
    for _ in range(80):  # noise
        rows.append((vid, [rnd.gauss(0, 1) for _ in range(16)]))
        vid += 1
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    out = {r.vec_id: r for r in semdedup(corpus, n_centroids=8, threshold=0.95).collect()}
    assert len(out) == vid  # every vector has a row
    for g in range(5):
        members = [g * 4 + j for j in range(4)]
        comps = {out[m].component for m in members}
        assert comps == {g * 4}, f"group {g} not collapsed: {comps}"
        assert [out[m].keep for m in members] == [1, 0, 0, 0]
    noise = [v for v in range(20, vid)]
    assert all(out[v].keep == 1 and out[v].component == v for v in noise)

    # design-regime exactness: cluster-scoped == all-pairs components
    allpairs = neardup_pairs(corpus, threshold=0.95).select("id1", "id2")
    want = {
        r.vec_id: r.component
        for r in connected_components(allpairs)
        .withColumnRenamed("id", "vec_id")
        .collect()
    }
    got = {v: r.component for v, r in out.items() if r.component != v or v in want}
    assert got == want


def test_kmeans_centroids_layout_stable(spark):
    """The centroid fit must be a pure function of the corpus CONTENT:
    identical vectors arriving at different partition counts/orders
    must produce identical centers (MLlib alone is layout-dependent —
    kmeans_centroids pins the layout before fitting)."""
    import random as _random

    from ml_with_spark_streaming_spark.operators.similarity import kmeans_centroids

    rnd = _random.Random(3)
    rows = [(i, [rnd.gauss(0, 1) for _ in range(8)]) for i in range(150)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    a = kmeans_centroids(df.repartition(2), n_centroids=5, c_vec="embedding", seed=42)
    b = kmeans_centroids(
        df.repartition(13).sortWithinPartitions(F.col("vec_id").desc()),
        n_centroids=5,
        c_vec="embedding",
        seed=42,
    )
    ca = {r.cent_id: tuple(r.cent_vec) for r in a.collect()}
    cb = {r.cent_id: tuple(r.cent_vec) for r in b.collect()}
    assert ca == cb


def test_derived_knobs_bound_bucket_size(spark):
    """derive_signlsh_knobs must hold noise-bucket occupancy O(1) as
    the corpus grows: at two corpus sizes an order of magnitude apart,
    the max multi-member bucket stays tiny (a FIXED band width would
    grow it linearly — 2048 random vectors in 16 4-bit buckets/band
    average 128 per bucket)."""
    import random as _random

    from ml_with_spark_streaming_spark.operators.similarity import (
        derive_signlsh_knobs,
        signlsh_buckets,
    )

    rnd = _random.Random(17)
    for n in (256, 2048):
        rows = [(i, [rnd.gauss(0, 1) for _ in range(32)]) for i in range(n)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        n_planes, bands = derive_signlsh_knobs(n)
        bits = n_planes // bands
        assert bits >= 8  # bits >= log2(n)
        buckets = signlsh_buckets(df, n_planes=n_planes, bands=bands)
        sizes = [r["s"] for r in buckets.selectExpr("size(ids) AS s").collect()]
        max_bucket = max(sizes, default=1)
        # Gaussian sign-cells are unequal-measure, so the max bucket
        # exceeds the n/2^bits ~ 1 mean — but it must stay log-scaled
        # (measured: 8 at n=256, 24 at n=2048), not linear in n
        assert max_bucket <= 3 * bits, f"n={n}: max bucket {max_bucket}"
    # comparative pin at the larger size: the derived width beats the
    # old fixed 4-bit bands by an order of magnitude (measured 24 vs 255)
    fixed_sizes = [
        r["s"]
        for r in signlsh_buckets(df, n_planes=64, bands=16)
        .selectExpr("size(ids) AS s")
        .collect()
    ]
    assert max_bucket * 5 <= max(fixed_sizes)


def test_signlsh_gate_exact_on_clones_with_derived_knobs(spark):
    """q100's production parameterization end-to-end: derived knobs on
    planted near-identical clusters must still recover the exact edge
    set (recall ~1 in the design regime even with wide bands)."""
    import random as _random

    from ml_with_spark_streaming_spark.operators.similarity import (
        derive_signlsh_knobs,
        neardup_pairs,
        signlsh_neardup,
    )

    rnd = _random.Random(23)
    rows, vid = [], 0
    for _ in range(6):
        base = [rnd.gauss(0, 1) for _ in range(32)]
        for _ in range(3):
            rows.append((vid, [x * (1 + rnd.uniform(-1e-4, 1e-4)) for x in base]))
            vid += 1
    for _ in range(110):
        rows.append((vid, [rnd.gauss(0, 1) for _ in range(32)]))
        vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    n_planes, bands = derive_signlsh_knobs(len(rows))
    exact = {(r.id1, r.id2) for r in neardup_pairs(df, threshold=0.95).collect()}
    gated = {
        (r.id1, r.id2)
        for r in signlsh_neardup(
            df, threshold=0.95, n_planes=n_planes, bands=bands
        ).collect()
    }
    assert gated == exact and len(exact) == 18  # 6 clusters x C(3,2)


def test_kcenter_covers_planted_clusters(spark):
    """Greedy k-center with m = #clusters picks exactly one exemplar
    per well-separated planted cluster, and the coverage radius
    (min_dist at selection) is non-increasing in rank."""
    from ml_with_spark_streaming_spark.operators.similarity import kcenter_select

    # 4 orthogonal direction clusters of 6 near-identical members each:
    # cosine distance ~0 within a cluster, ~1 across clusters
    import random as _random

    rnd = _random.Random(11)
    rows = []
    vid = 0
    for c in range(4):
        base = [0.0] * 16
        base[c * 4] = 1.0
        for _ in range(6):
            rows.append(
                (vid, [x + rnd.uniform(-1e-3, 1e-3) for x in base])
            )
            vid += 1
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    got = kcenter_select(corpus, m=4).orderBy("rank").collect()
    assert [r.rank for r in got] == [0, 1, 2, 3]
    assert got[0].vec_id == 0 and got[0].min_dist_x1e6 is None  # min-id seed
    picked_clusters = {r.vec_id // 6 for r in got}
    assert picked_clusters == {0, 1, 2, 3}  # one exemplar per cluster
    dists = [r.min_dist_x1e6 for r in got[1:]]
    assert all(d > 900_000 for d in dists)  # cross-cluster: cosine dist ~1
    assert dists == sorted(dists, reverse=True)  # non-increasing radius


def test_kcenter_small_corpus_truncates(spark):
    """m larger than the corpus returns every vector once."""
    from ml_with_spark_streaming_spark.operators.similarity import kcenter_select

    corpus = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [1.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    got = kcenter_select(corpus, m=10).collect()
    assert sorted(r.vec_id for r in got) == [0, 1, 2]
    assert len({r.rank for r in got}) == 3


@pytest.mark.slow
def test_kcenter_layout_independent(spark):
    """k-center selection is a pure function of corpus content —
    row order / partitioning must not change the picked exemplars."""
    from ml_with_spark_streaming_spark.operators.similarity import kcenter_select

    import random as _random

    rnd = _random.Random(3)
    rows = [(i, [rnd.gauss(0, 1) for _ in range(8)]) for i in range(40)]
    a = spark.createDataFrame(rows, "vec_id long, embedding array<float>").repartition(5)
    b = spark.createDataFrame(list(reversed(rows)), "vec_id long, embedding array<float>").repartition(11)
    got_a = [tuple(r) for r in kcenter_select(a, m=6).orderBy("rank").collect()]
    got_b = [tuple(r) for r in kcenter_select(b, m=6).orderBy("rank").collect()]
    assert got_a == got_b


def test_semantic_contamination_planted(spark):
    """semantic_contamination on hand-built vectors: exact-copy vec is
    flagged, orthogonal vec is not, ties break to the SMALLER eval id,
    and the zero vector scores 0 (safe_denom guard)."""
    from ml_with_spark_streaming_spark.operators.decontaminate import (
        semantic_contamination,
    )

    ev = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0, 0.0]), (101, [0.0, 1.0, 0.0, 0.0])],
        "eval_id long, vec array<float>",
    )
    corpus = spark.createDataFrame(
        [
            (1, [2.0, 0.0, 0.0, 0.0]),  # scaled copy of eval 100 -> cos 1.0
            (2, [0.0, 0.0, 1.0, 0.0]),  # orthogonal to both -> cos 0.0
            (3, [1.0, 1.0, 0.0, 0.0]),  # cos 0.7071 to BOTH -> tie
            (4, [0.0, 0.0, 0.0, 0.0]),  # zero vector -> cos 0.0, no NaN
        ],
        "vec_id long, embedding array<float>",
    )
    got = {
        r.vec_id: r
        for r in semantic_contamination(corpus, ev, threshold=0.95).collect()
    }
    assert set(got) == {1, 2, 3, 4}
    assert (got[1].nearest_eval_id, got[1].max_cosine, got[1].contaminated) == (100, 1.0, 1)
    assert (got[2].max_cosine, got[2].contaminated) == (0.0, 0)
    # tie on cosine -> min eval id wins
    assert (got[3].nearest_eval_id, got[3].max_cosine, got[3].contaminated) == (100, 0.7071, 0)
    assert (got[4].max_cosine, got[4].contaminated) == (0.0, 0)


@pytest.mark.slow
def test_pq_encode_deterministic_and_layout_independent(spark):
    """PQ codes are a pure function of vector CONTENT: same corpus in
    a different partition layout encodes identically, and codes have
    exactly m entries in [0, k_sub)."""
    import random

    from ml_with_spark_streaming_spark.operators.pq import pq_codebooks, pq_encode

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(60)]
    a = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    b = spark.createDataFrame(list(reversed(rows)), "vec_id long, embedding array<float>").repartition(7)

    cb_a = pq_codebooks(a, m=4, k_sub=4)
    cb_b = pq_codebooks(b, m=4, k_sub=4)
    got_a = {r.vec_id: list(r.codes) for r in pq_encode(a, cb_a, m=4).collect()}
    got_b = {r.vec_id: list(r.codes) for r in pq_encode(b, cb_b, m=4).collect()}
    assert got_a == got_b
    assert all(len(c) == 4 and all(0 <= x < 4 for x in c) for c in got_a.values())


@pytest.mark.slow
def test_pq_recall_high_on_clustered_vectors(spark):
    """On PLANTED clusters (where real encoder output lives) PQ-ADC
    retrieves the query's own cluster: every top-(size-1) neighbor of
    each query is a same-cluster member, and rerank orders them by
    exact cosine."""
    import random

    from ml_with_spark_streaming_spark.operators.pq import (
        pq_codebooks,
        pq_encode,
        pq_topk,
        pq_topk_rerank,
    )
    from pyspark.sql import functions as F

    rng = random.Random(3)
    dim, n_clusters, per = 16, 4, 8
    centers = [[rng.uniform(-1, 1) for _ in range(dim)] for _ in range(n_clusters)]
    rows = []
    for c, ctr in enumerate(centers):
        for i in range(per):
            rows.append(
                (c * 100 + i, [x + rng.uniform(-0.02, 0.02) for x in ctr])
            )
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = corpus.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    cb = pq_codebooks(corpus, m=4, k_sub=8)
    codes = pq_encode(corpus, cb, m=4)
    k = per - 1
    adc = pq_topk(queries, corpus, k=k, m=4, codebooks=cb, codes=codes).collect()
    assert all(r.q_id // 100 == r.vec_id // 100 for r in adc)  # same cluster
    rr = pq_topk_rerank(
        queries, corpus, k=k, shortlist=2 * k, m=4, codebooks=cb, codes=codes
    ).collect()
    assert all(r.q_id // 100 == r.vec_id // 100 for r in rr)
    # rerank surfaces exact cosines, descending per query
    by_q = {}
    for r in sorted(rr, key=lambda r: (r.q_id, r.rank)):
        by_q.setdefault(r.q_id, []).append(r.cosine)
    assert all(cs == sorted(cs, reverse=True) for cs in by_q.values())


@pytest.mark.slow
def test_ivfpq_recall_and_all_probed_equals_rerank(spark):
    """IVF-PQ on planted clusters: with the coarse quantizer routing
    queries to their own cluster's bucket, top-(size-1) neighbors are
    same-cluster members; and probing ALL buckets with the same
    codebooks/codes degenerates to exactly pq_topk_rerank (the IVF
    stage only prunes, never re-scores)."""
    import random

    from pyspark.sql import functions as F

    from ml_with_spark_streaming_spark.operators.ann_index import IVFIndex
    from ml_with_spark_streaming_spark.operators.pq import (
        ivfpq_topk,
        pq_codebooks,
        pq_encode,
        pq_topk_rerank,
    )

    rng = random.Random(5)
    dim, n_clusters, per = 16, 4, 8
    centers = [[rng.uniform(-1, 1) for _ in range(dim)] for _ in range(n_clusters)]
    rows = []
    for c, ctr in enumerate(centers):
        for i in range(per):
            rows.append((c * 100 + i, [x + rng.uniform(-0.02, 0.02) for x in ctr]))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = corpus.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    idx = IVFIndex.build(corpus, n_centroids=n_clusters, seed=42)
    cb = pq_codebooks(corpus, m=4, k_sub=8)
    codes = pq_encode(corpus, cb, m=4)
    k = per - 1

    got = ivfpq_topk(
        queries, corpus, centroids=idx.centroids, assignments=idx.assignments,
        k=k, nprobe=1, shortlist=2 * k, m=4, codebooks=cb, codes=codes,
    ).collect()
    assert len(got) == n_clusters * k
    assert all(r.q_id // 100 == r.vec_id // 100 for r in got)  # own cluster

    all_probed = {
        (r.q_id, r.rank): (r.vec_id, r.cosine)
        for r in ivfpq_topk(
            queries, corpus, centroids=idx.centroids, assignments=idx.assignments,
            k=k, nprobe=n_clusters, shortlist=2 * k, m=4, codebooks=cb, codes=codes,
        ).collect()
    }
    rerank = {
        (r.q_id, r.rank): (r.vec_id, r.cosine)
        for r in pq_topk_rerank(
            queries, corpus, k=k, shortlist=2 * k, m=4, codebooks=cb, codes=codes
        ).collect()
    }
    assert all_probed == rerank


@pytest.mark.slow
def test_pq_encode_arrow_equals_hof(spark, monkeypatch):
    """The Arrow/numpy encode formulation (code spaces >= 1024 floats)
    must produce the same codes as the JVM HOF path — same fixture,
    threshold forced each way."""
    import random

    import ml_with_spark_streaming_spark.operators.pq as pqmod
    from ml_with_spark_streaming_spark.operators.pq import pq_codebooks, pq_encode

    rng = random.Random(17)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(80)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cb = pq_codebooks(corpus, m=4, k_sub=16)  # 4*16*16 = 1024 -> Arrow default
    arrow = {r.vec_id: list(r.codes) for r in pq_encode(corpus, cb, m=4).collect()}
    monkeypatch.setattr(pqmod, "_ARROW_ENCODE_MIN", 10**9)  # force HOF
    hof = {r.vec_id: list(r.codes) for r in pq_encode(corpus, cb, m=4).collect()}
    assert arrow == hof
    assert all(len(c) == 4 and all(0 <= x < 16 for x in c) for c in arrow.values())


def test_arrow_paths_preserve_string_ids(spark):
    """signlsh_bands' Arrow path (n_planes x dim >= 2048) and
    brute_force_topk_arrow must carry a STRING id through unchanged —
    their output schemas derive from the input, never a hardcoded
    long."""
    import random

    from ml_with_spark_streaming_spark.operators.similarity import (
        brute_force_topk,
        brute_force_topk_arrow,
        signlsh_bands,
    )

    rng = random.Random(29)
    rows = [
        (f"doc-{i:03d}", [rng.gauss(0, 1) for _ in range(64)]) for i in range(40)
    ]
    corpus = spark.createDataFrame(rows, "vec_id string, embedding array<float>")
    bands = signlsh_bands(corpus, n_planes=32, dim=64)  # 2048 -> Arrow path
    assert dict(bands.dtypes)["vec_id"] == "string"
    assert bands.count() == 40 * 4

    queries = spark.createDataFrame(
        [(f"doc-{i:03d}", rows[i][1]) for i in range(3)],
        "q_id string, q_vec array<float>",
    )
    arrow = brute_force_topk_arrow(queries, corpus, k=5)
    hof = brute_force_topk(queries, corpus, k=5)
    assert dict(arrow.dtypes)["q_id"] == "string"
    assert dict(arrow.dtypes)["vec_id"] == "string"
    got = {(r.q_id, r.vec_id, r.rank) for r in arrow.collect()}
    want = {(r.q_id, r.vec_id, r.rank) for r in hof.collect()}
    assert got == want


@pytest.mark.slow
def test_pq_encode_arrow_preserves_id_type(spark, monkeypatch):
    """The Arrow path's output schema must carry the CORPUS id type —
    a string-keyed corpus crossing the 1024-float threshold keeps its
    string ids (it used to hardcode `long` and fail), matching the
    generic c_id contract the HOF path always honored."""
    import random

    import ml_with_spark_streaming_spark.operators.pq as pqmod
    from ml_with_spark_streaming_spark.operators.pq import pq_codebooks, pq_encode

    rng = random.Random(19)
    rows = [(f"doc-{i:03d}", [rng.uniform(-1, 1) for _ in range(64)]) for i in range(60)]
    corpus = spark.createDataFrame(rows, "vec_id string, embedding array<float>")
    cb = pq_codebooks(corpus, m=4, k_sub=16)  # 1024 floats -> Arrow path
    out = pq_encode(corpus, cb, m=4)
    assert dict(out.dtypes)["vec_id"] == "string"
    arrow = {r.vec_id: list(r.codes) for r in out.collect()}
    assert set(arrow) == {f"doc-{i:03d}" for i in range(60)}
    monkeypatch.setattr(pqmod, "_ARROW_ENCODE_MIN", 10**9)  # force HOF
    hof = {r.vec_id: list(r.codes) for r in pq_encode(corpus, cb, m=4).collect()}
    assert arrow == hof


@pytest.mark.slow
def test_semdedup_gate_derivation_and_backends(spark):
    """Round-11 pins (VERDICT #3):

    * ``derive_semdedup_gate_bits`` arms the in-cluster sign-LSH gate
      at the paper's operating point and DISARMS it at exploratory
      thresholds where no recall-preserving band width prunes;
    * forcing the gate where the math says it can't pay raises;
    * the arrow (per-cluster BLAS) and join (Catalyst expression)
      exact backends produce identical components;
    * gate armed vs disarmed agree in the design regime (the planted
      fixture), composing with the existing all-pairs pin."""
    import random as _random

    from ml_with_spark_streaming_spark.operators.similarity import (
        derive_semdedup_gate_bits,
        semdedup,
    )

    # knob derivation: 0.95 admits a pruning band; 0.4 does not
    assert derive_semdedup_gate_bits(0.95) >= 8
    assert derive_semdedup_gate_bits(0.99) >= derive_semdedup_gate_bits(0.95)
    assert derive_semdedup_gate_bits(0.4) == 0
    assert derive_semdedup_gate_bits(0.0) == 0
    assert derive_semdedup_gate_bits(1.0) == 32  # identical-only: max width

    rnd = _random.Random(7)
    rows = []
    vid = 0
    for _ in range(4):  # planted near-identical groups
        base = [rnd.gauss(0, 1) for _ in range(16)]
        for _ in range(3):
            rows.append((vid, [x * (1 + rnd.uniform(-1e-3, 1e-3)) for x in base]))
            vid += 1
    for _ in range(60):
        rows.append((vid, [rnd.gauss(0, 1) for _ in range(16)]))
        vid += 1
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def comps(**kw):
        return {
            (r.vec_id, r.component, r.keep)
            for r in semdedup(corpus, n_centroids=6, **kw).collect()
        }

    # backend equality at a moderate threshold (gate auto-off at 0.6)
    assert derive_semdedup_gate_bits(0.6) == 0
    assert comps(threshold=0.6, pair_backend="arrow") == comps(
        threshold=0.6, pair_backend="join"
    )
    # design regime: gate on == gate off == arrow == join
    want = comps(threshold=0.95, lsh_gate=False, pair_backend="join")
    assert comps(threshold=0.95, lsh_gate=False, pair_backend="arrow") == want
    assert comps(threshold=0.95, lsh_gate=True) == want
    assert comps(threshold=0.95) == want  # auto arms, same verdicts

    import pytest as _pytest

    with _pytest.raises(ValueError, match="no band width"):
        semdedup(corpus, n_centroids=6, threshold=0.4, lsh_gate=True)
    # a typo'd backend must raise even when the gate would dispatch
    # first (review pin: validated up front)
    with _pytest.raises(ValueError, match="unknown pair_backend"):
        semdedup(corpus, n_centroids=6, threshold=0.95, pair_backend="arow")
