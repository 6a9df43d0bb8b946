"""Curation operators: connected components, repetition signals, PII
scrub, and the short-document shingle regression."""

from __future__ import annotations

from pyspark.sql import functions as F

from ml_with_spark_streaming_spark.operators.dedup import minhash_signatures, shingles_expr
from ml_with_spark_streaming_spark.operators.graph import (
    connected_components,
    star_components,
)
from ml_with_spark_streaming_spark.plans.curation import pii_signals, repetition_signals

import pytest


def _components(spark, edges):
    df = spark.createDataFrame(edges, "id1: long, id2: long")
    return dict(connected_components(df).collect())


def test_cc_two_components_and_transitivity(spark):
    got = _components(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_cc_path_graph_deeper_than_one_hop(spark):
    # diameter-6 chain: min label must walk the full path, not 1 hop
    got = _components(spark, [(i, i + 1) for i in range(6)])
    assert got == {i: 0 for i in range(7)}


def test_cc_empty_edges(spark):
    df = spark.createDataFrame([], "id1: long, id2: long")
    assert connected_components(df).count() == 0


def test_star_components_matches_min_label(spark):
    # random-ish graph with a clique, a chain, and singleton pairs:
    # O(log n) star contraction must agree with min-label exactly
    edges = (
        [(1, 2), (2, 3), (1, 3)]          # clique
        + [(i, i + 1) for i in range(20, 26)]  # chain
        + [(100, 101), (200, 201)]        # pairs
        + [(3, 20)]                        # clique-chain bridge
    )
    df = spark.createDataFrame(edges, "id1: long, id2: long")
    assert dict(star_components(df).collect()) == dict(
        connected_components(df).collect()
    )


@pytest.mark.slow
def test_q100_lsh_gate_matches_exact_on_planted_clusters(spark):
    """q100's pipeline (sign-LSH gate → components) must produce
    EXACTLY the clusters of the all-pairs formulation in the gate's
    design regime: planted groups of near-identical vectors (cosine
    >= 0.95, per-bit agreement ~0.9) among random noise. This pins the
    gate-vs-exact equivalence that q99's capped oracle cannot (a
    lossless gate at q99's 0.4 threshold is impossible — see its
    docstring)."""
    import random as _random

    from ml_with_spark_streaming_spark.operators.similarity import (
        neardup_pairs,
        signlsh_neardup,
    )

    rnd = _random.Random(99)
    rows = []
    vid = 0
    # 5 planted clusters of 4 jittered copies each
    for _ in range(5):
        base = [rnd.gauss(0, 1) for _ in range(32)]
        for _ in range(4):
            rows.append((vid, [x * (1 + rnd.uniform(-1e-3, 1e-3)) for x in base]))
            vid += 1
    # 60 noise vectors (random 32-dim: pairwise cosine far below 0.95)
    for _ in range(60):
        rows.append((vid, [rnd.gauss(0, 1) for _ in range(32)]))
        vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def clusters(edge_df):
        comp = dict(connected_components(edge_df).collect())
        groups = {}
        for node, c in comp.items():
            groups.setdefault(c, set()).add(node)
        return sorted(sorted(g) for g in groups.values())

    exact_edges = neardup_pairs(df, threshold=0.95).select("id1", "id2")
    lsh_edges = signlsh_neardup(df, threshold=0.95).select("id1", "id2")
    exact_clusters = clusters(exact_edges)
    assert clusters(lsh_edges) == exact_clusters
    # the 5 planted 4-cliques are all found
    planted = [list(range(k * 4, k * 4 + 4)) for k in range(5)]
    assert [c for c in exact_clusters if min(c) < 20] == planted


def test_cc_duplicate_and_symmetric_edges_change_nothing(spark):
    """Round-11 pins the ``sym``-side ``distinct()`` removal: duplicate
    edges, reversed duplicates, and self-loops cannot change a min
    aggregate, so labels must be identical to the clean edge list's —
    the removed distinct was a full shuffle of the 2x-edge table that
    bought nothing."""
    clean = [(1, 2), (2, 3), (10, 11)]
    noisy = clean + [(1, 2), (2, 1), (3, 2), (10, 11), (11, 11)]
    assert _components(spark, noisy) == _components(spark, clean) == {
        1: 1, 2: 1, 3: 1, 10: 10, 11: 10,
    }


@pytest.mark.slow
def test_cc_deep_chain_falls_back_to_star(spark):
    # diameter-80 chain with max_iter=4: min-label cannot converge, so
    # the star-contraction handoff must finish the job (previously a
    # hard RuntimeError)
    df = spark.createDataFrame([(i, i + 1) for i in range(80)], "id1: long, id2: long")
    got = dict(connected_components(df, max_iter=4).collect())
    assert got == {i: 0 for i in range(81)}


def test_shingles_short_docs_yield_empty_not_crash(spark):
    # sequence(1,0) descends in Spark; shingles_expr must guard it
    df = spark.createDataFrame(
        [(["a"],), (["a", "b"],), (["a", "b", "c"],), ([],)], "toks: array<string>"
    )
    rows = df.select(shingles_expr(F.col("toks"), 2).alias("sh")).collect()
    assert [r.sh for r in rows] == [[], ["a b"], ["a b", "b c"], []]


def test_minhash_drops_short_docs_without_error(spark):
    df = spark.createDataFrame(
        [(0, "one"), (1, "two words"), (2, "three word doc here")], "doc_id: long, text: string"
    )
    sig = minhash_signatures(df, "text", "doc_id", k=4)
    assert [r.doc_id for r in sig.select("doc_id").collect()] == [2]


def test_repetition_signals_hand_checked(spark):
    # "a a a b": tokens 4, types 2, top 3/4, ttr 2/4
    #            bigrams [a a, a a, a b]: 3 total, 2 distinct -> dup 1/3
    df = spark.createDataFrame(
        [(0, "a a a b"), (1, "x"), (2, "")], "doc_id: long, text: string"
    )
    got = {r.doc_id: r for r in repetition_signals(df).collect()}
    r0 = got[0]
    assert (r0.n_tokens, r0.n_types) == (4, 2)
    assert r0.top_token_frac == 0.75
    assert r0.type_token_ratio == 0.5
    assert r0.dup_bigram_frac == 0.3333
    r1 = got[1]  # single token: no bigrams
    assert (r1.n_tokens, r1.n_types, r1.dup_bigram_frac) == (1, 1, 0.0)
    r2 = got[2]  # empty doc: all zeros
    assert (r2.n_tokens, r2.n_types, r2.top_token_frac) == (0, 0, 0.0)


def test_pii_signals_counts_and_redaction(spark):
    df = spark.createDataFrame(
        [
            (0, "mail bob@x.co or sue@y.org from 1.2.3.4 phone 555-1234"),
            (1, "nothing sensitive here"),
        ],
        "id: long, profile: string",
    )
    got = {r.id: r for r in pii_signals(df, "profile").collect()}
    assert (got[0].n_emails, got[0].n_ips, got[0].n_phones) == (2, 1, 1)
    assert got[0]._redacted == "mail <EMAIL> or <EMAIL> from <IP> phone <PHONE>"
    assert (got[1].n_emails, got[1].n_ips, got[1].n_phones) == (0, 0, 0)
    assert got[1]._redacted == "nothing sensitive here"


def test_cc_random_graphs_match_union_find(spark):
    """Min-label propagation vs a Python union-find reference over a
    batch of random graphs (one Spark job: graphs disambiguated by an
    id offset so they ride one edge DataFrame)."""
    import random

    rnd = random.Random(20260813)
    all_edges: list[tuple[int, int]] = []
    expected: dict[int, int] = {}
    for g in range(8):
        off = g * 1000
        n = rnd.randrange(2, 30)
        m = rnd.randrange(1, 40)
        edges = [
            (off + rnd.randrange(n), off + rnd.randrange(n)) for _ in range(m)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            edges = [(off, off + 1)]
        all_edges += edges
        parent: dict[int, int] = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        nodes = {v for e in edges for v in e}
        roots = {x: find(x) for x in nodes}
        comp_min = {}
        for x, r in roots.items():
            comp_min[r] = min(comp_min.get(r, x), x)
        expected.update({x: comp_min[r] for x, r in roots.items()})

    df = spark.createDataFrame(all_edges, "id1: long, id2: long")
    got = dict(connected_components(df).collect())
    assert got == expected


def test_decontamination_flags_planted_overlap(spark, tmp_path):
    """q101 semantics on a crafted corpus: a doc sharing a 13-gram
    with an eval doc is flagged; clean and too-short docs keep."""
    import os

    from ml_with_spark_streaming_spark.plans.curation import q101_decontaminate

    # alphabetic suffixes: the cleaning chain strips digits, which
    # would collapse bench0..bench12 into 13 identical tokens
    bench = " ".join(f"bench{chr(97 + i)}" for i in range(13))  # the eval 13-gram
    clean = " ".join(f"clean{chr(97 + i)}" for i in range(20))
    rows = [
        # doc 0: eval slice (0 % 97 == 0) — the benchmark document
        (0, f"intro words {bench} outro", "en", "s", 0),
        # doc 1: corpus doc embedding the same 13 tokens mid-text
        (1, f"leading text here {bench} trailing text", "en", "s", 0),
        # doc 2: corpus doc, >=13 tokens, no overlap
        (2, clean, "en", "s", 0),
        # doc 3: corpus doc with < 13 tokens — no grams, clean by definition
        (3, "too short to have any thirteen gram at all", "en", "s", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id: long, text: string, lang: string, source: string, n_chars: long"
    )
    d = str(tmp_path)
    df.coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))

    got = {r.doc_id: r for r in q101_decontaminate(spark, d).collect()}
    assert set(got) == {1, 2, 3}  # eval doc 0 excluded from the corpus output
    assert got[1].n_contaminated > 0 and got[1].keep == 0
    # doc1 = 3 + 13 + 2 = 18 tokens -> 6 distinct 13-grams; exactly ONE
    # (bencha..benchm) matches the eval set
    assert got[1].n_grams == 6 and got[1].n_contaminated == 1
    assert got[2].n_contaminated == 0 and got[2].keep == 1
    assert got[2].n_grams == 20 - 12
    assert (got[3].n_grams, got[3].n_contaminated, got[3].keep) == (0, 0, 1)


def test_corpus_mixing_hand_checked(spark, tmp_path):
    """q104 arithmetic on a corpus small enough to mix by hand:
    en = 8 tokens of 10 total (natural 0.8), de = 2 of 10 (0.2);
    targets en 50% / de 15% give repeat factors 50*10/(100*8)=0.625
    and 15*10/(100*2)=0.75."""
    import os

    from ml_with_spark_streaming_spark.plans.curation import q104_corpus_mixing

    rows = [
        (0, "alpha beta gamma delta", "en", "s", 0),
        (1, "alpha beta gamma delta", "en", "s", 0),
        (2, "xray yankee", "de", "s", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id: long, text: string, lang: string, source: string, n_chars: long"
    )
    d = str(tmp_path)
    df.coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))

    got = {r.lang: r for r in q104_corpus_mixing(spark, d).collect()}
    assert (got["en"].n_docs, got["en"].lang_tokens) == (2, 8)
    assert (got["de"].n_docs, got["de"].lang_tokens) == (1, 2)
    assert got["en"].natural_frac == 0.8 and got["de"].natural_frac == 0.2
    assert got["en"].target_pct == 50 and got["de"].target_pct == 15
    assert got["en"].repeat_factor == 0.625
    assert got["de"].repeat_factor == 0.75


def test_incremental_dedup_planted_batch(spark, tmp_path):
    """q105 on a crafted ingest: new docs (doc_id % 10 == 9) against
    the existing corpus — one exact dup, one near dup, one novel."""
    import os

    from ml_with_spark_streaming_spark.plans.curation import q105_incremental_dedup

    import string

    # 60 unique alpha tokens; the near-dup changes ONLY the first token,
    # so its 8-token-prefix fingerprint differs (exact_dup must be 0)
    # while token-set Jaccard = 59/61 = 0.967 >= 0.9 (near_dup must be 1)
    words = [f"w{a}{b}" for a in string.ascii_lowercase[:8] for b in string.ascii_lowercase[:8]]
    base = " ".join(words[:60])
    near = " ".join(["zzz"] + words[1:60])
    rows = [
        # existing corpus
        (0, base, "en", "s", 0),
        (1, "completely different existing text about other things entirely", "en", "s", 0),
        # new batch (ids ending in 9)
        (9, base, "en", "s", 0),                    # exact dup of doc 0
        (19, near, "en", "s", 0),                   # near-only dup
        (29, "novel new document with fresh words never seen before anywhere", "en", "s", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id: long, text: string, lang: string, source: string, n_chars: long"
    )
    d = str(tmp_path)
    df.coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))

    got = {r.doc_id: r for r in q105_incremental_dedup(spark, d).collect()}
    assert set(got) == {9, 19, 29}
    assert (got[9].exact_dup, got[9].near_dup, got[9].keep) == (1, 1, 0)
    assert (got[19].exact_dup, got[19].near_dup, got[19].keep) == (0, 1, 0)
    assert (got[29].exact_dup, got[29].near_dup, got[29].keep) == (0, 0, 1)


def test_mixture_realization_matches_hand_hash(spark, tmp_path):
    """q107 copy counts cross-checked against an independent Python
    md5 computation of the same content-hash rule (rf_en = 0.625,
    rf_de = 0.75 from the q104 fixture arithmetic)."""
    import hashlib
    import math
    import os

    from ml_with_spark_streaming_spark.plans.curation import q107_mixture_realization

    rows = [
        (0, "alpha beta gamma delta", "en", "s", 0),
        (1, "alpha beta gamma delta", "en", "s", 0),
        (2, "xray yankee", "de", "s", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id: long, text: string, lang: string, source: string, n_chars: long"
    )
    d = str(tmp_path)
    df.coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))

    got = {r.doc_id: r.n_copies for r in q107_mixture_realization(spark, d).collect()}

    rf = {"en": 0.625, "de": 0.75}
    want = {}
    for doc_id, _, lang, _, _ in rows:
        frac = rf[lang] - math.floor(rf[lang])
        bucket = hashlib.md5(f"{doc_id}#mix".encode()).hexdigest()[:8]
        thr = format(math.floor(frac * 2**32), "08x")
        want[doc_id] = math.floor(rf[lang]) + (1 if bucket < thr else 0)
    assert got == want


def test_token_chunks_boundaries_and_fingerprints(spark, tmp_path):
    """q108 window arithmetic on a hand-sized doc: 100 tokens at
    chunk=64/stride=48 gives starts 1/49/97 with lengths 64/52/4; the
    fingerprint is the md5 prefix of the joined slice (hashlib
    cross-check)."""
    import hashlib
    import os
    import string

    from ml_with_spark_streaming_spark.plans.curation import q108_token_chunks

    words = [
        f"w{a}{b}"
        for a in string.ascii_lowercase[:10]
        for b in string.ascii_lowercase[:10]
    ][:100]
    rows = [
        (0, " ".join(words), "en", "s", 0),
        (1, "", "en", "s", 0),  # empty: no chunks
    ]
    df = spark.createDataFrame(
        rows, "doc_id: long, text: string, lang: string, source: string, n_chars: long"
    )
    d = str(tmp_path)
    df.coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))

    got = q108_token_chunks(spark, d).collect()
    assert [r.doc_id for r in got] == [0, 0, 0]
    assert [(r.chunk_idx, r.chunk_start, r.chunk_len) for r in got] == [
        (0, 1, 64),
        (1, 49, 52),
        (2, 97, 4),
    ]
    for r in got:
        sl = words[r.chunk_start - 1 : r.chunk_start - 1 + 64]
        assert r.chunk_fp == hashlib.md5(" ".join(sl).encode()).hexdigest()[:16]


def test_temperature_mixing_hand_checked(spark, tmp_path):
    """q121 τ=2 math on a 2-language corpus: shares ∝ sqrt(tokens),
    repeats derived from the published rounded share — all integer
    HALF-UP, verified against hand-computed values."""
    import os

    from ml_with_spark_streaming_spark.plans.curation import q121_temperature_mixing

    rows = [
        (0, "wa " * 100, "en", "s", 300),  # 100 tokens -> sq 10000
        (1, "wb " * 400, "de", "s", 1200),  # 400 tokens -> sq 20000
    ]
    df = spark.createDataFrame(
        rows, "doc_id: long, text: string, lang: string, source: string, n_chars: long"
    )
    d = str(tmp_path)
    df.coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))

    got = {r.lang: r for r in q121_temperature_mixing(spark, d).collect()}
    # sum_sq = 30000, total = 500
    assert got["en"].lang_tokens == 100 and got["de"].lang_tokens == 400
    assert got["en"].temp_share_x1e4 == 3333  # 10000/30000 -> 0.3333
    assert got["de"].temp_share_x1e4 == 6667  # 20000/30000 -> 0.6667
    assert got["en"].repeat_x1e4 == 16665  # 0.3333*500/100 = 1.6665 epochs
    assert got["de"].repeat_x1e4 == 8334  # 0.6667*500/400 = 0.8334 epochs
    # temperature flattens: sqrt share (33%) > natural share (20%) for
    # the low-resource language
    assert got["en"].temp_share_x1e4 > 2000


def test_leakage_safe_split_no_cross_split_neardups(spark, tmp_path):
    """q133: every verified near-dup pair lands on ONE side of the
    split (the invariant the operator exists for), on a corpus where
    the naive per-doc hash split demonstrably leaks."""
    import hashlib
    import os

    from ml_with_spark_streaming_spark.plans.curation import (
        dedup_components,
        q133_leakage_safe_split,
    )
    from ml_with_spark_streaming_spark.operators.dedup import (
        jaccard_verify,
        minhash_candidates,
    )

    base = " ".join(f"tok{chr(97 + i)}{chr(97 + j)}" for i in range(6) for j in range(6))
    other = " ".join(f"uniq{chr(97 + i)}{chr(97 + j)}" for i in range(6) for j in range(6))
    rows = [
        (0, base, "en", "s", 0),  # near-dup cluster {0, 1}
        (1, base, "en", "s", 0),
        (2, other, "en", "s", 0),  # singleton
    ]
    df = spark.createDataFrame(
        rows, "doc_id: long, text: string, lang: string, source: string, n_chars: long"
    )
    d = str(tmp_path)
    df.coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))

    # the planted pair would LEAK under a per-doc hash split: doc 0
    # buckets train, doc 1 heldout (hand-checked md5 buckets)
    def naive(x: int) -> bool:
        return hashlib.md5(f"{x}#split".encode()).hexdigest()[:8] < "cccccccc"

    assert naive(0) != naive(1)

    got = {r.doc_id: r for r in q133_leakage_safe_split(spark, d).collect()}
    assert set(got) == {0, 1, 2}
    # cluster members inherit one verdict — no leak
    assert got[0].component == got[1].component == 0
    assert got[0].split == got[1].split
    assert got[2].component == 2

    # the invariant holds for EVERY verified pair, not just the planted one
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    cands = minhash_candidates(docs, "text", "doc_id", k=16, bands=4)
    edges = jaccard_verify(cands, docs, "text", "doc_id", threshold=0.9)
    for e in edges.collect():
        assert got[e.id1].split == got[e.id2].split


def test_canonical_selection_keeps_best_not_min_id(spark, tmp_path):
    """q134: within a near-dup cluster the KEPT doc is the quality
    argmax, not q90's min doc_id — exactly one kept per component."""
    import os

    from ml_with_spark_streaming_spark.plans.curation import q134_canonical_selection

    base = " ".join(f"tok{chr(97 + i)}{chr(97 + j)}" for i in range(6) for j in range(6))
    rows = [
        # doc 0: the near-dup cluster's min id, degraded with heavy
        # punctuation (lower alpha ratio -> lower quality)
        (0, base + " !!!! #### $$$$ %%%% @@@@ ^^^^", "en", "s", 0),
        (1, base, "en", "s", 0),  # clean copy — higher quality
        (2, "solo " + " ".join(f"u{chr(97 + i)}" for i in range(20)), "en", "s", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id: long, text: string, lang: string, source: string, n_chars: long"
    )
    d = str(tmp_path)
    df.coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))

    got = {r.doc_id: r for r in q134_canonical_selection(spark, d).collect()}
    assert got[0].component == got[1].component == 0
    assert got[1].quality > got[0].quality
    # the better copy wins even though doc 0 is the component label
    assert (got[0].is_kept, got[1].is_kept) == (0, 1)
    assert got[2].is_kept == 1  # singleton keeps itself
    per_comp = {}
    for r in got.values():
        per_comp[r.component] = per_comp.get(r.component, 0) + r.is_kept
    assert all(v == 1 for v in per_comp.values())


def test_dsir_selects_by_content_not_label(spark):
    """q135's operator: a doc whose TOKENS are target-like is selected
    even though its lang label is not 'en' — DSIR's whole point
    (select raw data that LOOKS like the target). Token sets are
    chosen so target/source classes land in disjoint hash buckets
    (md5-checked above the fixture)."""
    import hashlib

    from ml_with_spark_streaming_spark.operators.dsir import dsir_scores
    from pyspark.sql import functions as F

    tgt = ["alpha", "beta", "gamma", "delta"]
    src = ["zulu", "yankee", "xray", "whiskey"]

    def bucket(t, B=64):
        return int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % B

    assert not (set(map(bucket, tgt)) & set(map(bucket, src)))  # fixture guard

    t_text = " ".join(tgt * 5)
    s_text = " ".join(src * 5)
    rows = (
        [(i, t_text, "en") for i in range(3)]  # the target slice
        + [(10 + i, s_text, "fr") for i in range(3)]  # raw-only docs
        + [(20, t_text, "fr")]  # target-LIKE content, non-target label
        + [(21, "", "fr")]  # token-less doc -> zeros, not selected
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        r.doc_id: r
        for r in dsir_scores(df, F.col("lang") == "en", n_buckets=64).collect()
    }
    assert set(got) == {0, 1, 2, 10, 11, 12, 20, 21}
    for i in (0, 1, 2, 20):  # target-like content selected...
        assert got[i].logw_x1e6 > 0 and got[i].selected == 1
    for i in (10, 11, 12):  # ...source-like content not
        assert got[i].logw_x1e6 < 0 and got[i].selected == 0
    assert (got[21].n_tokens, got[21].logw_x1e6, got[21].selected) == (0, 0, 0)
    # identical content => identical score regardless of label
    assert got[20].logw_x1e6 == got[0].logw_x1e6


# ---------------------------------------------------------------------------
# pagerank (operators/graph.py) — integer fixed-point, vs a pure-Python
# replay of the exact same recurrence
# ---------------------------------------------------------------------------


def _pagerank_py(edges, iters=5, scale=10**12, d=85):
    """Driver-side replay of the documented integer recurrence."""
    from collections import defaultdict

    w = defaultdict(int)
    for u, v, ww in edges:
        w[(u, v)] += ww
    nodes = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    n = len(nodes)
    outw = defaultdict(int)
    for (u, _), ww in w.items():
        outw[u] += ww
    base = scale // n
    r = {v: base for v in nodes}
    for _ in range(iters):
        dangling = sum(r[v] for v in nodes if outw[v] == 0)
        inc = defaultdict(int)
        for (u, v), ww in w.items():
            inc[v] += (r[u] * ww) // outw[u]
        r = {
            v: ((100 - d) * base + d * (inc[v] + dangling // n)) // 100
            for v in nodes
        }
    return r


def test_pagerank_matches_python_recurrence(spark):
    from ml_with_spark_streaming_spark.operators.graph import pagerank

    # hub-and-spoke with a dangling node (4 has no out-edges) and a
    # multi-edge (1->2 twice, must pre-aggregate to w=5)
    edges = [(1, 2, 3), (1, 2, 2), (2, 3, 1), (3, 1, 1), (1, 4, 1), (2, 4, 2)]
    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    got = {
        row["id"]: row["rank"]
        for row in pagerank(df, "src", "dst", "w", iters=5).collect()
    }
    assert got == _pagerank_py(edges, iters=5)
    # fixed-point mass conservation: floor-division loses < 1 unit per
    # node per division site, so total mass stays within n*iters*3 of scale
    assert abs(sum(got.values()) - 10**12) <= 4 * 5 * 3


def test_pagerank_unweighted_uniform_cycle(spark):
    from ml_with_spark_streaming_spark.operators.graph import pagerank

    # a 3-cycle is symmetric: all ranks equal at every iteration
    df = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], ["src", "dst"])
    ranks = {r["rank"] for r in pagerank(df, "src", "dst", iters=4).collect()}
    assert len(ranks) == 1


def test_q158_hard_negatives_exclude_neardup_cluster(spark, tmp_path):
    """An anchor's near-duplicates (same q99 component) must never
    appear among its hard negatives; the top negative is the most
    similar OUT-of-cluster vector."""
    import os

    from ml_with_spark_streaming_spark.plans.curation import q158_hard_negatives

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.999, 0.04, 0.0, 0.0], 0),   # near-dup of 0 (cos ~1)
        (2, [0.3, 0.954, 0.0, 0.0], 1),    # cos vs 0 = 0.3 < 0.4: out of cluster
        (3, [0.0, 1.0, 0.0, 0.0], 1),      # near-dup of 2 (cos 0.95)
        (4, [0.0, 0.0, 1.0, 0.0], 2),      # orthogonal to everything
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    d = str(tmp_path)
    df.coalesce(1).write.parquet(os.path.join(d, "embeddings.parquet"))

    out = {}
    for r in q158_hard_negatives(spark, d).collect():
        out.setdefault(r.q_id, []).append((r.rank, r.vec_id, r.cosine))

    negs0 = [v for _, v, _ in sorted(out[0])]
    assert 1 not in negs0                # the near-dup is never a negative
    assert negs0[0] == 2                 # hardest out-of-cluster vector first
    assert set(negs0) == {2, 3, 4}
    # vec 2's own cluster-mate 3 is excluded from ITS negatives too
    negs2 = [v for _, v, _ in sorted(out[2])]
    assert 3 not in negs2 and 0 in negs2


def test_multi_benchmark_decon_flags_per_registry_entry(spark):
    """A corpus doc sharing a 13-gram with benchmark A (only) is
    flagged for A alone; overlap with several benchmarks raises
    n_benchmarks_hit; clean docs keep=1."""
    from ml_with_spark_streaming_spark.operators.decontaminate import (
        multi_contamination_counts,
        tagged_eval_ngrams,
    )

    run_a = " ".join(f"alpha{i}" for i in range(13))
    run_b = " ".join(f"beta{i}" for i in range(13))
    benches = {
        "a": spark.createDataFrame([(900, run_a)], "doc_id long, text string"),
        "b": spark.createDataFrame([(901, run_b)], "doc_id long, text string"),
    }
    corpus = spark.createDataFrame(
        [
            (1, f"intro words {run_a} trailing text"),          # hits A only
            (2, f"{run_a} middle {run_b}"),                     # hits both
            (3, " ".join(f"clean{i}" for i in range(20))),      # clean
        ],
        "doc_id long, text string",
    )
    tagged = tagged_eval_ngrams(benches)
    out = {
        r.doc_id: r
        for r in multi_contamination_counts(corpus, tagged, ["a", "b"]).collect()
    }
    assert out[1].n_hit_a > 0 and out[1].n_hit_b == 0
    assert out[1].n_benchmarks_hit == 1 and out[1].keep == 0
    assert out[2].n_hit_a > 0 and out[2].n_hit_b > 0
    assert out[2].n_benchmarks_hit == 2 and out[2].keep == 0
    assert out[3].n_hit_a == 0 and out[3].n_hit_b == 0 and out[3].keep == 1


def test_decon_registry_validation(spark):
    """An empty benchmark registry is a clear ValueError (not a None
    AttributeError), and names that would splice illegal characters
    into hit_<name> column references are rejected up front."""
    import pytest as _pytest

    from ml_with_spark_streaming_spark.operators.decontaminate import (
        multi_contamination_counts,
        tagged_eval_ngrams,
    )

    with _pytest.raises(ValueError, match="empty"):
        tagged_eval_ngrams({})
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with _pytest.raises(ValueError, match=r"A-Za-z0-9_"):
        tagged_eval_ngrams({"mmlu.dev": df})
    with _pytest.raises(ValueError, match="empty"):
        multi_contamination_counts(df, df, [])
    with _pytest.raises(ValueError, match=r"A-Za-z0-9_"):
        multi_contamination_counts(df, df, ["ok", "bad`name"])


def test_q161_duplication_matrix_counts_only_math(spark, tmp_path):
    """Cross pairs = c_a*c_b, within pairs = C(c,2), computed from
    counts without materializing document pairs."""
    import os

    from ml_with_spark_streaming_spark.plans.curation import (
        q161_source_duplication_matrix,
    )

    # letters only: the q40 cleaner strips digits, so digit-suffixed
    # "unique" tokens would collide into one fingerprint
    boiler = " ".join(f"tok{chr(97 + i)}" for i in range(10))
    uniq = lambda k: " ".join(  # noqa: E731
        f"u{chr(107 + k)}w{chr(97 + i)}" for i in range(10)
    )
    rows = (
        # boilerplate: 3 copies in src1, 2 in src2 -> within1 C(3,2)=3,
        # within2 C(2,2)=1, cross 3*2=6
        [(i, boiler, "en", "src1", 1) for i in range(3)]
        + [(10 + i, boiler, "en", "src2", 1) for i in range(2)]
        + [(20, uniq(1), "en", "src1", 1), (21, uniq(2), "en", "src3", 1)]
    )
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path)
    df.coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))

    got = {
        (r.source_a, r.source_b): r.dup_pairs
        for r in q161_source_duplication_matrix(spark, d).collect()
    }
    assert got == {("src1", "src1"): 3, ("src1", "src2"): 6, ("src2", "src2"): 1}


def test_q164_bias_audit_removal_lands_in_right_decile(spark, tmp_path):
    """Duplicates of a LOW-quality doc must show up as removals in the
    low deciles and leave the high deciles untouched; counts per
    decile follow exact-rank arithmetic."""
    import os

    from ml_with_spark_streaming_spark.plans.curation import q164_dedup_bias_audit

    junk = "!!! ??? %%% ### $$$ @@@ ^^^ &&& *** ((("
    good = lambda k: " ".join(  # noqa: E731
        f"qual{chr(107 + k)}word{chr(97 + i)}" for i in range(12)
    )
    rows = (
        # 5 copies of one junk doc (lowest scores): 4 removals
        [(i, junk, "en", "s", 40) for i in range(5)]
        + [(10 + k, good(k), "en", "s", 100) for k in range(15)]  # unique good docs
    )
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path)
    df.coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))

    out = {r.decile: r for r in q164_dedup_bias_audit(spark, d).collect()}
    assert sum(r.n_docs for r in out.values()) == 20
    assert all(r.n_docs == 2 for r in out.values())  # 20 docs -> 2 per decile
    # the 5 junk copies occupy ranks 1-5 (deciles 1..3); rank 1 is the
    # KEPT first occurrence, so removals land [1, 2, 1] across
    # deciles 1-3 and never in the high deciles
    assert sum(r.n_removed for r in out.values()) == 4
    assert (out[1].n_removed, out[2].n_removed, out[3].n_removed) == (1, 2, 1)
    assert out[2].removed_x10000 == 10000  # both docs in decile 2 removed
    assert all(out[dc].n_removed == 0 for dc in range(4, 11))


def test_streaming_registry_decon_attributes_hits_per_benchmark(spark):
    """The q160 registry mode of the streaming decon gate: strict keep
    (clean of ALL registered eval sets) must equal the batch operator,
    and per-batch history must attribute contaminated docs to the
    right benchmark."""
    from ml_with_spark_streaming_spark.operators.decontaminate import (
        multi_contamination_counts,
        tagged_eval_ngrams,
    )
    from ml_with_spark_streaming_spark.streaming.decon_filter import (
        StreamingDecontaminationFilter,
    )

    run_a = " ".join(f"alphagram{chr(97 + i)}" for i in range(13))
    run_b = " ".join(f"betagram{chr(97 + i)}" for i in range(13))
    benches = {
        "mmlu": spark.createDataFrame([(900, run_a)], "doc_id long, text string"),
        "gsm": spark.createDataFrame([(901, run_b)], "doc_id long, text string"),
    }
    batch = spark.createDataFrame(
        [
            (1, f"prefix words {run_a} suffix"),
            (2, f"{run_b} tail content here"),
            (3, " ".join(f"cleanword{chr(97 + i)}" for i in range(20))),
        ],
        "doc_id long, text string",
    )

    gate = StreamingDecontaminationFilter.from_registry(benches)
    kept: set[int] = set()
    gate.on_kept = lambda df, bid: kept.update(r.doc_id for r in df.collect())
    gate.process_batch(batch, 0)

    assert kept == {3}
    h = gate.history[-1]
    assert (h["n_docs"], h["n_contaminated"], h["n_kept"]) == (3, 2, 1)
    assert (h["docs_hit_mmlu"], h["docs_hit_gsm"]) == (1, 1)

    # stream verdict == batch operator verdict, row for row
    tagged = tagged_eval_ngrams(benches)
    batch_keep = {
        r.doc_id
        for r in multi_contamination_counts(batch, tagged, ["mmlu", "gsm"])
        .filter("keep = 1")
        .collect()
    }
    assert kept == batch_keep
