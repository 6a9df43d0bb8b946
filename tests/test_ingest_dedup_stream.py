"""Streaming ingest dedup: each micro-batch's verdict against the
static corpus index must equal the batch engine's verdict (q105's
gates) on the same rows."""

from __future__ import annotations

import json
import os
import tempfile

from ml_with_spark_streaming_spark.streaming.ingest_dedup import (
    StreamingIngestDedup,
    build_corpus_index,
)

import pytest

pytestmark = pytest.mark.slow  # multi-stream/artifact-fit module: full-suite only (SPARK_GRAFT_FULL_TESTS=1)

# 30-token base docs so a 1-token edit keeps Jaccard ~0.94 >= 0.9
_BASE = ["w" + chr(97 + i) + chr(97 + j) for i in range(3) for j in range(10)]


def _corpus(spark):
    rows = [
        (0, " ".join(_BASE)),
        (1, " ".join(reversed(_BASE))),
        (2, " ".join("x" + w for w in _BASE)),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _batch_rows():
    exact = " ".join(_BASE)  # doc 100: byte-identical to corpus doc 0
    # doc 101: first token changed (outside q46's 8-token-prefix
    # fingerprint -> not an exact hit), Jaccard 29/31 ~ 0.935 >= 0.9
    near = " ".join(["zz"] + _BASE[1:])
    novel = " ".join("q" + w for w in _BASE)  # doc 102: disjoint vocabulary
    return [(100, exact), (101, near), (102, novel)]


def test_stream_dedup_matches_expected_verdicts(spark):
    corpus = _corpus(spark)
    kept, flags = set(), {}
    dd = StreamingIngestDedup.from_corpus(
        corpus,
        threshold=0.9,
        on_kept=lambda df, bid: kept.update(r["doc_id"] for r in df.collect()),
    )

    with tempfile.TemporaryDirectory() as root:
        src = os.path.join(root, "in")
        os.makedirs(src)
        for i, (doc_id, text) in enumerate(_batch_rows()):
            with open(os.path.join(src, f"b{i}.jsonl"), "w") as f:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
        docs = (
            spark.readStream.format("json")
            .schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .load(src)
        )
        q = dd.attach(docs, checkpoint=os.path.join(root, "ckpt"), available_now=True)
        q.awaitTermination()

    # exact copy and near-dup rejected; novel doc kept
    assert kept == {102}
    totals = {
        k: sum(h[k] for h in dd.history)
        for k in ("n_docs", "n_exact", "n_near", "n_kept")
    }
    assert totals["n_docs"] == 3
    assert totals["n_exact"] == 1  # doc 100
    assert totals["n_kept"] == 1  # doc 102
    assert totals["n_near"] >= 1  # doc 101 (the exact copy may also band-match)


def test_index_build_shapes(spark):
    corpus = _corpus(spark)
    fp, bands = build_corpus_index(corpus)
    assert fp.columns == ["fp"] and fp.count() == 3
    assert set(bands.columns) == {"doc_id", "band_idx", "band_hash"}


def test_empty_batch_is_noop(spark):
    dd = StreamingIngestDedup.from_corpus(_corpus(spark))
    dd.process_batch(spark.createDataFrame([], "doc_id long, text string"), 0)
    assert dd.history == []


def test_intra_and_cross_batch_duplicates_rejected(spark):
    """The three dedup scopes beyond the corpus index: two copies of a
    NOVEL doc in one batch admit only the first; a copy of an
    accepted doc arriving in a LATER batch is rejected because the
    index grew; near-dup of an accepted doc is rejected via the grown
    band index + accepted-docs verify side."""
    import json
    import os
    import tempfile

    corpus = _corpus(spark)
    kept = set()
    dd = StreamingIngestDedup.from_corpus(
        corpus,
        threshold=0.9,
        on_kept=lambda df, bid: kept.update(r["doc_id"] for r in df.collect()),
    )
    novel = " ".join("n" + w for w in _BASE)
    near_novel = " ".join(["zz"] + ["n" + w for w in _BASE][1:])
    batches = [
        # batch 0: novel doc + byte-identical copy in the SAME batch
        [(200, novel), (201, novel)],
        # batch 1: another exact copy (cross-batch) + a near-dup of it
        [(300, novel), (301, near_novel)],
    ]
    with tempfile.TemporaryDirectory() as root:
        src = os.path.join(root, "in")
        os.makedirs(src)
        for i, rows in enumerate(batches):
            with open(os.path.join(src, f"b{i}.jsonl"), "w") as f:
                for doc_id, text in rows:
                    f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
        docs = (
            spark.readStream.format("json")
            .schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .load(src)
        )
        q = dd.attach(docs, checkpoint=os.path.join(root, "ckpt"), available_now=True)
        q.awaitTermination()

    assert kept == {200}
    totals = {k: sum(h[k] for h in dd.history) for k in ("n_docs", "n_kept")}
    assert totals["n_docs"] == 4 and totals["n_kept"] == 1


def test_index_persistence_roundtrip(spark, tmp_path):
    """A gate resumed from persisted index artifacts rejects a copy of
    a doc ACCEPTED before the save — the restart-survivable index
    story (no corpus rescan on resume)."""
    corpus = _corpus(spark)
    dd = StreamingIngestDedup.from_corpus(corpus, threshold=0.9)
    novel = " ".join("p" + w for w in _BASE)
    dd.process_batch(
        spark.createDataFrame([(400, novel)], "doc_id long, text string"), 0
    )
    assert dd.history[0]["n_kept"] == 1
    idx = str(tmp_path / "idx")
    dd.save_index(idx)

    dd2 = StreamingIngestDedup.from_index_path(spark, corpus, idx, threshold=0.9)
    dd2.process_batch(
        spark.createDataFrame(
            [(500, novel), (501, " ".join("q" + w for w in _BASE))],
            "doc_id long, text string",
        ),
        0,
    )
    h = dd2.history[0]
    assert h["n_exact"] == 1  # the copy of accepted doc 400
    assert h["n_kept"] == 1  # doc 501 is genuinely new


def test_compaction_is_verdict_neutral_and_resume_equals_compacted(spark, tmp_path):
    """compact() (auto every N accepted batches) must change NOTHING
    about verdicts: run 3x-plus-N batches through a compacting gate
    (N=2) and an identical non-compacting gate (compact_every=None) —
    per-batch histories, kept sets, and the final index CONTENTS must
    be identical; and a gate resumed from save_index (which compacts
    before writing) must hold exactly the compacted index."""

    def vocab(prefix):
        return [prefix + w for w in _BASE]

    def doc(prefix):
        return " ".join(vocab(prefix))

    def near(prefix):
        return " ".join(["zz"] + vocab(prefix)[1:])  # Jaccard ~0.94 >= 0.9

    batches = [
        [(600, doc("a")), (601, doc("b"))],  # both kept
        [(610, doc("a")), (611, doc("c"))],  # exact dup of accepted + novel
        [(620, near("c")), (621, doc("d"))],  # near-dup of accepted + novel
        [(630, doc("b")), (631, doc("e"))],
        [(640, near("e")), (641, doc("f"))],
        [(650, doc("f"))],
        [(660, doc("a")), (661, doc("g"))],
    ]

    def run(compact_every):
        kept = set()
        dd = StreamingIngestDedup.from_corpus(
            _corpus(spark),
            threshold=0.9,
            compact_every=compact_every,
            on_kept=lambda df, bid: kept.update(r["doc_id"] for r in df.collect()),
        )
        for i, rows in enumerate(batches):
            dd.process_batch(
                spark.createDataFrame(rows, "doc_id long, text string"), i
            )
        return dd, kept

    dd_c, kept_c = run(2)
    dd_n, kept_n = run(None)
    assert dd_c._since_compact < len(batches)  # compaction actually fired
    assert dd_n._since_compact == len(batches)  # and the control never did
    assert dd_c.history == dd_n.history
    assert kept_c == kept_n == {600, 601, 611, 621, 631, 641, 661}

    def contents(dd):
        return (
            sorted(r.fp for r in dd.fp_index.collect()),
            sorted(map(tuple, dd.band_index.collect())),
            sorted(map(tuple, dd.accepted_docs.collect())),
        )

    assert contents(dd_c) == contents(dd_n)

    idx = str(tmp_path / "idx")
    dd_c.save_index(idx)
    dd_r = StreamingIngestDedup.from_index_path(spark, _corpus(spark), idx)
    assert contents(dd_r) == contents(dd_c)
    # the resumed gate still rejects dups of pre-save accepted docs
    dd_r.process_batch(
        spark.createDataFrame(
            [(700, doc("g")), (701, near("d")), (702, doc("h"))],
            "doc_id long, text string",
        ),
        99,
    )
    h = dd_r.history[0]
    assert h["n_exact"] == 1 and h["n_near"] >= 1 and h["n_kept"] == 1


def test_bloom_prefilter_is_verdict_invariant(spark):
    """The Bloom prefilter on the exact-fingerprint probe must change
    NOTHING: drive the same batches (corpus dupes, intra-batch dupes,
    cross-batch dupes of accepted docs, near-dups, novels) through a
    prefiltered and an unfiltered gate — histories and kept sets must
    be identical (a Bloom filter has no false negatives; positives
    still go through the real index join)."""
    novel = " ".join("n" + w for w in _BASE)
    batches = [
        [(100, " ".join(_BASE)), (200, novel), (201, novel)],  # corpus dup + intra dup
        [(300, novel), (301, " ".join(["zz"] + ["n" + w for w in _BASE][1:])),
         (302, " ".join("r" + w for w in _BASE))],  # cross-batch dup + near + novel
    ]

    def run(bloom):
        kept = set()
        dd = StreamingIngestDedup.from_corpus(
            _corpus(spark),
            threshold=0.9,
            bloom_prefilter=bloom,
            on_kept=lambda df, bid: kept.update(r["doc_id"] for r in df.collect()),
        )
        for i, rows in enumerate(batches):
            dd.process_batch(
                spark.createDataFrame(rows, "doc_id long, text string"), i
            )
        return kept, dd.history

    kept_b, hist_b = run(True)
    kept_p, hist_p = run(False)
    assert kept_b == kept_p == {200, 302}
    assert hist_b == hist_p
