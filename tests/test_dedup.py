"""Dedup operators on tiny hand-checkable fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ml_with_spark_streaming_spark.functions.text import clean_text_expr
from ml_with_spark_streaming_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    jaccard_verify,
    minhash_candidates,
    simhash_fingerprints,
    simhash_hamming,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog tonight"),
    (2, "the quick brown fox jumps over the lazy dog today"),  # near-dup of 1
    (3, "completely different subject matter entirely unrelated text here"),
    (4, "the quick brown fox jumps over the lazy dog tonight"),  # exact dup of 1
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_minhash_finds_near_dups(docs):
    pairs = {(r["id1"], r["id2"]) for r in minhash_candidates(docs).collect()}
    assert (1, 4) in pairs  # identical docs always collide on every band
    assert (1, 2) in pairs or (2, 4) in pairs  # near-dups share most shingles
    assert not any(3 in p for p in pairs)  # unrelated doc never pairs


def test_jaccard_exact_values(docs):
    got = {(r["id1"], r["id2"]): r["jaccard"] for r in jaccard_pairs(docs, threshold=0.0).collect()}
    assert got[(1, 4)] == 1.0
    # docs 1 and 2 share 8 of 10 distinct tokens: J = 8/10
    assert got[(1, 2)] == pytest.approx(0.8, abs=1e-4)
    assert (1, 3) not in got  # zero shared tokens → no pair row at all


def test_jaccard_verify_matches_exact(docs):
    cands = minhash_candidates(docs)
    via_lsh = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in jaccard_verify(cands, docs, threshold=0.0).collect()
    }
    exact = {
        (r["id1"], r["id2"]): r["jaccard"] for r in jaccard_pairs(docs, threshold=0.0).collect()
    }
    for pair, j in via_lsh.items():
        assert exact[pair] == j


def test_simhash_identical_and_distant(spark, docs):
    fp = {r["doc_id"]: r["simhash"] for r in simhash_fingerprints(docs).collect()}
    assert fp[1] == fp[4]  # identical text → identical fingerprint
    d = spark.createDataFrame([(fp[1], fp[3])], "a long, b long").select(
        simhash_hamming(F.col("a"), F.col("b")).alias("h")
    ).head()["h"]
    assert d > 16  # unrelated docs far apart in hamming space


def test_exact_dedup_groups(docs):
    out = {
        r["doc_id"]: r["group_size"]
        for r in exact_dedup(docs, F.md5(clean_text_expr("text"))).collect()
    }
    assert out[1] == 2  # docs 1 and 4 collapse, min-id representative kept
    assert out[2] == 1 and out[3] == 1
    assert 4 not in out


def test_mllib_minhash_agrees_with_exact_jaccard(docs):
    from ml_with_spark_streaming_spark.operators.dedup import mllib_minhash_pairs

    got = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in mllib_minhash_pairs(docs, threshold=0.5, num_hash_tables=10).collect()
    }
    exact = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in jaccard_pairs(docs, threshold=0.5).collect()
    }
    # the exact dup always survives every hash table; values are exact
    assert (1, 4) in got and got[(1, 4)] == 1.0
    for pair, j in got.items():
        assert exact[pair] == pytest.approx(j, abs=1e-4)


def test_winnowing_pairs_find_copied_passage(spark, tmp_path):
    """q128 semantics: two docs sharing a long copied passage (but
    otherwise disjoint) surface as a pair; unrelated docs don't."""
    import os

    from ml_with_spark_streaming_spark.plans.text_ml import q128_winnowing_pairs

    passage = "the quick brown fox jumps over the lazy dog again and again " * 3
    rows = [
        (0, passage + "alpha beta gamma delta epsilon zeta"),
        (1, "eta theta iota kappa lambading mu " + passage),
        (2, "completely different words that share nothing with others whatsoever here"),
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id: long, text: string, lang: string, source: string, n_chars: long",
    )
    d = str(tmp_path)
    df.coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))

    got = {(r.id1, r.id2): r for r in q128_winnowing_pairs(spark, d).collect()}
    assert (0, 1) in got
    assert got[(0, 1)].overlap > 0.5  # the shared passage dominates both fp sets
    assert not any(2 in p for p in got)


def test_derive_minhash_knobs():
    """Knob derivation (S-curve optimum over divisors of the n-scaled
    signature budget): the two oracle corpus sizes land exactly on the
    constants the static SQL twins hard-code (k=16, bands=4); bigger
    corpora sharpen the curve; the integrated error is monotonically
    non-increasing up the k ladder."""
    from ml_with_spark_streaming_spark.operators.dedup import (
        derive_minhash_knobs,
        lsh_s_curve_error,
    )

    assert derive_minhash_knobs(500) == (16, 4)  # sf0.01 corpus
    assert derive_minhash_knobs(5000) == (16, 4)  # sf0.1 corpus
    assert derive_minhash_knobs(10**6) == (16, 4)  # ladder edge
    assert derive_minhash_knobs(10**7) == (32, 8)
    assert derive_minhash_knobs(10**9) == (64, 16)
    errs = [
        lsh_s_curve_error(b, k // b, 0.5)
        for k, b in ((16, 4), (32, 8), (64, 16))
    ]
    assert errs[0] > errs[1] > errs[2]
    # different target thresholds move the banding, same public theory
    assert derive_minhash_knobs(500, target_jaccard=0.9)[1] < 4
    assert derive_minhash_knobs(500, target_jaccard=0.3)[1] > 4


def test_minhash_star_pair_guard(spark):
    """max_bucket: an over-cap bucket (mass-duplicated template) emits
    star pairs (min id x each other member) instead of all pairs —
    linear in bucket size, with every member still reachable from the
    representative (the connected-components consumer recovers the full
    cluster). Under-cap buckets keep exact all-pairs semantics."""
    template = "the quick brown fox jumps over the lazy dog tonight and tomorrow"
    hot = spark.createDataFrame(
        [(i, template) for i in range(10)], "doc_id long, text string"
    )
    all_pairs = minhash_candidates(hot, "text", "doc_id", max_bucket=None).collect()
    star = minhash_candidates(hot, "text", "doc_id", max_bucket=4).collect()
    assert len(all_pairs) == 45  # 10*9/2 — the quadratic blowup
    got = sorted((r.id1, r.id2) for r in star)
    assert got == [(0, i) for i in range(1, 10)]  # 9 star pairs, min id hub
    # a bucket at exactly the cap is NOT degraded
    ok = minhash_candidates(hot.filter("doc_id < 4"), "text", "doc_id", max_bucket=4)
    assert len(ok.collect()) == 6  # 4*3/2 all pairs


def test_minhash_derived_knobs_recall_and_bucket_cap(spark):
    """q50/q58's derived-knob path at the correctness SF: every true
    near-dup pair (exact SHINGLE-set Jaccard >= 0.8 — the similarity
    the signatures actually sketch) is a candidate, dissimilar pairs
    (j <= 0.2) are not, and no LSH bucket approaches the star-pair cap
    (so the static all-pairs oracle SQL describes the executed
    semantics exactly)."""
    import itertools

    from ml_with_spark_streaming_spark.functions.text import tokens_expr
    from ml_with_spark_streaming_spark.operators.dedup import (
        lsh_bands,
        minhash_signatures,
        shingles_expr,
    )
    from ml_with_spark_streaming_spark.plans.llm_ops import (
        _MINHASH_MAX_BUCKET,
        _derived_minhash_candidates,
    )
    from ml_with_spark_streaming_spark.sources.batch import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    rows = d.select(
        "doc_id", shingles_expr(tokens_expr(clean_text_expr("text")), 3).alias("s")
    ).collect()
    sets = {r.doc_id: set(r.s) for r in rows if r.s}
    cands = {(r.id1, r.id2) for r in _derived_minhash_candidates(d).collect()}
    high = low = high_hit = low_hit = 0
    for a, b in itertools.combinations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        inter = len(sa & sb)
        if not inter:
            continue
        j = inter / (len(sa) + len(sb) - inter)
        if j >= 0.8:
            high += 1
            high_hit += (a, b) in cands
        elif j <= 0.2:
            low += 1
            low_hit += (a, b) in cands
    assert high >= 20  # the corpus really contains near-dups
    assert high_hit == high  # full recall above the dedup threshold
    assert low_hit == 0  # and no candidates from dissimilar pairs
    bands = lsh_bands(minhash_signatures(d, "text", "doc_id", k=16), "doc_id", 16, 4)
    mx = (
        bands.groupBy("band_idx", "band_hash")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert mx <= 8 < _MINHASH_MAX_BUCKET


def test_derive_minhash_knobs_gate_weighting():
    """The FP/FN weighting story: a candidate-analysis job (symmetric
    costs) at t=0.9 gets the sharp (16, 1) AND-band with terrible
    recall just above threshold, while a dedup GATE (missed dup =
    permanent corpus damage) derives recall-heavy and lands on the
    b=4 banding the streaming ingest gate ships."""
    from ml_with_spark_streaming_spark.operators.dedup import derive_minhash_knobs

    assert derive_minhash_knobs(500, 0.9) == (16, 1)
    assert derive_minhash_knobs(500, 0.9, w_fp=0.05, w_fn=0.95) == (16, 4)
    # recall at s = 0.94 under each banding
    p = lambda b, r: 1 - (1 - 0.94**r) ** b  # noqa: E731
    assert p(1, 16) < 0.4 < 0.99 < p(4, 4)


def test_containment_pairs_catch_truncations_jaccard_misses(spark):
    from ml_with_spark_streaming_spark.operators.dedup import (
        containment_pairs,
        jaccard_pairs,
    )

    # letters only: the clean chain strips digits
    words = ["tok" + chr(97 + i // 26) + chr(97 + i % 26) for i in range(40)]
    long_doc = " ".join(words)
    trunc = " ".join(words[:10])        # strict prefix: contained, low Jaccard
    rows = [
        (1, long_doc),
        (2, trunc),
        (3, long_doc),                   # identical to 1 -> mutual
        (4, " ".join("zzz" + chr(97 + i) for i in range(26))),  # unrelated
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id1"], r["id2"]): r
        for r in containment_pairs(df, threshold=0.8, stop_df=20).collect()
    }
    assert got[(1, 2)]["relation"] == "b_in_a" and got[(1, 2)]["c_ba"] == 1.0
    assert got[(1, 3)]["relation"] == "mutual"
    assert got[(2, 3)]["relation"] == "a_in_b"
    assert not any(4 in k for k in got)
    # the pair containment catches is invisible to symmetric Jaccard:
    # |S(trunc)| = 8 of |S(long)| = 38 shingles -> J ~ 0.21
    jac = {
        (r["id1"], r["id2"])
        for r in jaccard_pairs(df, threshold=0.5).collect()
    }
    assert (1, 2) not in jac


def test_containment_stop_gram_guard_drops_hot_shingles(spark):
    from ml_with_spark_streaming_spark.operators.dedup import containment_pairs

    # 30 docs sharing ONE hot boilerplate line (df=30 > stop_df=20) and
    # otherwise disjoint -> the hot shingles are dropped, no pairs form
    rows = [
        (i, "all rights reserved by us "
         + " ".join("u" + chr(97 + i // 26) + chr(97 + i % 26)
                    + "w" + chr(97 + j) for j in range(10)))
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert containment_pairs(df, threshold=0.5, stop_df=20).count() == 0


def test_q167_recall_audit_counts(spark, tmp_path):
    """The audit's rows must reconcile with the operators it audits:
    n_exact_pairs / n_recalled equal an independent recomputation from
    jaccard_pairs x minhash_candidates, an identical pair is always
    recalled (identical docs share every band), and recall of an
    empty exact set is the defined 10000."""
    import os

    from ml_with_spark_streaming_spark.operators.dedup import (
        jaccard_pairs,
        minhash_candidates,
    )
    from ml_with_spark_streaming_spark.plans.llm_ops import q167_dedup_recall_audit

    # letters only (the q40 cleaner strips digits)
    w = [f"aw{chr(97 + i)}{chr(97 + j)}" for i in range(6) for j in range(6)]
    base = " ".join(w[:20])
    rows = [
        (0, base, "en", "s", 1),          # identical pair 0-1: J = 1
        (1, base, "en", "s", 1),
        (2, " ".join(w[:12] + w[20:28]), "en", "s", 1),  # J(0,2) = 12/28 ~ 0.43
        (3, " ".join(w[28:36]), "en", "s", 1),           # unrelated
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path)
    df.coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))

    got = {r.threshold_x10000: r for r in q167_dedup_recall_audit(spark, d).collect()}
    assert set(got) == {3000, 5000, 7000}

    exact = {
        (r.id1, r.id2): r.jaccard
        for r in jaccard_pairs(df, threshold=0.3, shingle_w=3).collect()
    }
    cand = {
        (r.id1, r.id2)
        for r in minhash_candidates(df, k=16, bands=4, max_bucket=256).collect()
    }
    for t, row in got.items():
        want_exact = {p for p, j in exact.items() if round(j * 10000) >= t}
        assert row.n_exact_pairs == len(want_exact)
        assert row.n_recalled == len(want_exact & cand)
        assert row.n_candidate_pairs == len(cand)
        if want_exact:
            assert row.recall_x10000 == row.n_recalled * 10000 // row.n_exact_pairs
        else:
            assert row.recall_x10000 == 10000
    # the identical pair exists and is recalled at every threshold
    assert (0, 1) in exact and exact[(0, 1)] == 1.0 and (0, 1) in cand
    assert got[7000].n_exact_pairs >= 1 and got[7000].n_recalled >= 1


def test_shared_shingle_pass_matches_independent(docs):
    """Round-11: a pre-built exploded_shingles table fed to BOTH
    jaccard_pairs and minhash_candidates (the q167/q171 shared-pass
    shape) must reproduce the independent-pass outputs exactly."""
    from ml_with_spark_streaming_spark.operators.dedup import exploded_shingles

    sh = exploded_shingles(docs, "text", "doc_id", 3).localCheckpoint()
    jp_indep = {
        (r.id1, r.id2): r.jaccard
        for r in jaccard_pairs(docs, threshold=0.3, shingle_w=3).collect()
    }
    jp_shared = {
        (r.id1, r.id2): r.jaccard
        for r in jaccard_pairs(
            docs, threshold=0.3, shingle_w=3, shingles=sh
        ).collect()
    }
    assert jp_shared == jp_indep
    mc_indep = {
        (r.id1, r.id2) for r in minhash_candidates(docs, k=16, bands=4).collect()
    }
    mc_shared = {
        (r.id1, r.id2)
        for r in minhash_candidates(docs, k=16, bands=4, shingles=sh).collect()
    }
    assert mc_shared == mc_indep
    # token mode has no shingle table to share — loud, not silent
    with pytest.raises(ValueError):
        jaccard_pairs(docs, threshold=0.3, shingles=sh)
