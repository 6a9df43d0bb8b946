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
