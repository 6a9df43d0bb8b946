"""Composed streaming ingest pipeline (dedup gate -> quality gate):
stream verdicts must equal the batch operators' composition."""

from __future__ import annotations

import json
import os
import tempfile

from ml_with_spark_streaming_spark.operators.quality_clf import (
    classifier_weights,
    feature_presence,
    heuristic_labels,
)
from ml_with_spark_streaming_spark.streaming.ingest_pipeline import StreamingIngestPipeline
from ml_with_spark_streaming_spark.streaming.quality_filter import freeze_weights

from tests.test_quality_clf import _HI_WORDS, _docs

import pytest

pytestmark = pytest.mark.slow  # multi-stream/artifact-fit module: full-suite only (SPARK_GRAFT_FULL_TESTS=1)


def test_pipeline_composes_both_gates(spark):
    corpus = _docs(spark)  # even ids: high quality; odd ids: low quality
    frozen = freeze_weights(
        classifier_weights(feature_presence(corpus), heuristic_labels(corpus))
    )

    hi = " ".join(_HI_WORDS[(7 + j) % len(_HI_WORDS)] for j in range(40))
    batch = [
        # doc 1000: verbatim copy of corpus doc 0 -> rejected by dedup
        (1000, " ".join(_HI_WORDS[j % len(_HI_WORDS)] for j in range(40))),
        # doc 1001: novel but low quality -> passes dedup, rejected by quality
        (1001, "!!! ??? %% novelzz novelqq ### $$$"),
        # doc 1002: novel high-quality -> accepted end to end
        (1002, hi + " extension tensor"),
    ]

    accepted: set[int] = set()
    pipe = StreamingIngestPipeline.build(
        corpus,
        frozen,
        threshold=0.9,
        on_accepted=lambda df, bid: accepted.update(r["doc_id"] for r in df.collect()),
    )

    with tempfile.TemporaryDirectory() as root:
        src = os.path.join(root, "in")
        os.makedirs(src)
        with open(os.path.join(src, "b0.jsonl"), "w") as f:
            for doc_id, text in batch:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
        docs = (
            spark.readStream.format("json")
            .schema("doc_id long, text string")
            .load(src)
        )
        q = pipe.attach(docs, checkpoint=os.path.join(root, "ckpt"), available_now=True)
        q.awaitTermination()

    assert accepted == {1002}
    assert len(pipe.ledger) == 1
    row = pipe.ledger[0]
    assert row["n_in"] == 3
    assert row["n_after_dedup"] == 2  # doc 1000 deduped
    assert row["n_accepted"] == 1  # doc 1001 fails the quality gate
    # stage histories stay coherent with the ledger
    assert pipe.dedup.history[0]["n_kept"] == 2
    assert pipe.quality.history[0]["n_kept"] == 1


def test_pipeline_with_decontamination_gate(spark):
    """Three-gate pipeline: a doc sharing a 13-gram with the eval set
    is rejected between dedup and quality; the ledger tracks each
    stage's survivor count."""
    corpus = _docs(spark)
    frozen = freeze_weights(
        classifier_weights(feature_presence(corpus), heuristic_labels(corpus))
    )
    bench = " ".join(f"bench{chr(97 + i)}" for i in range(13))  # the eval 13-gram
    eval_corpus = spark.createDataFrame(
        [(9000, f"intro {bench} outro")], "doc_id long, text string"
    )
    hi = " ".join(_HI_WORDS[(3 + j) % len(_HI_WORDS)] for j in range(40))
    batch = [
        # novel, high-quality, but embeds the eval 13-gram -> decon reject
        (1100, f"{hi} {bench}"),
        # novel, clean, high-quality -> accepted (distinct 8-token
        # prefix, or the intra-batch exact gate would collapse the two)
        (1101, "spectra " + hi),
    ]

    accepted: set[int] = set()
    pipe = StreamingIngestPipeline.build(
        corpus,
        frozen,
        eval_corpus=eval_corpus,
        threshold=0.9,
        on_accepted=lambda df, bid: accepted.update(r["doc_id"] for r in df.collect()),
    )

    with tempfile.TemporaryDirectory() as root:
        src = os.path.join(root, "in")
        os.makedirs(src)
        with open(os.path.join(src, "b0.jsonl"), "w") as f:
            for doc_id, text in batch:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
        docs = (
            spark.readStream.format("json")
            .schema("doc_id long, text string")
            .load(src)
        )
        q = pipe.attach(docs, checkpoint=os.path.join(root, "ckpt"), available_now=True)
        q.awaitTermination()

    assert accepted == {1101}
    row = pipe.ledger[0]
    assert row["n_in"] == 2
    assert row["n_after_dedup"] == 2  # both novel
    assert row["n_after_decon"] == 1  # 1100 overlaps the eval set
    assert row["n_accepted"] == 1
    assert pipe.decon.history[0]["n_contaminated"] == 1


def test_fully_rejected_batch_keeps_histories_aligned(spark):
    """A batch entirely rejected by dedup: downstream stages never
    run, but their histories still get explicit zero rows so
    per-batch histories stay index-aligned with the ledger."""
    corpus = _docs(spark)
    frozen = freeze_weights(
        classifier_weights(feature_presence(corpus), heuristic_labels(corpus))
    )
    eval_corpus = spark.createDataFrame(
        [(9000, " ".join(f"bench{chr(97 + i)}" for i in range(13)))],
        "doc_id long, text string",
    )
    pipe = StreamingIngestPipeline.build(
        corpus, frozen, eval_corpus=eval_corpus, threshold=0.9
    )
    # batch: one exact copy of corpus doc 0 -> nothing survives dedup
    copy0 = corpus.filter("doc_id = 0").collect()[0]["text"]
    batch = spark.createDataFrame([(2000, copy0)], "doc_id long, text string")
    pipe.process_batch(batch, 7)

    assert pipe.ledger == [
        {
            "batch_id": 7,
            "n_in": 1,
            "n_after_dedup": 0,
            "n_after_embdedup": 0,
            "n_after_rewrite": 0,
            "n_after_segquality": 0,
            "n_after_decon": 0,
            "n_after_quality": 0,
            "n_accepted": 0,
        }
    ]
    assert pipe.dedup.history[-1]["batch_id"] == 7
    assert pipe.decon.history[-1] == {
        "batch_id": 7, "n_docs": 0, "n_contaminated": 0, "n_kept": 0
    }
    assert pipe.quality.history[-1] == {"batch_id": 7, "n_docs": 0, "n_kept": 0}


def test_pipeline_with_perplexity_gate(spark):
    """Four-gate pipeline: a novel, clean, classifier-positive doc can
    still be rejected by the LM perplexity gate (vocabulary the
    reference distribution has never seen scores the ln(V) floor per
    bigram, above a threshold calibrated on in-distribution text)."""
    from ml_with_spark_streaming_spark.operators.lm import score_against_lm
    from ml_with_spark_streaming_spark.streaming.perplexity_filter import train_lm

    corpus = _docs(spark)
    frozen = freeze_weights(
        classifier_weights(feature_presence(corpus), heuristic_labels(corpus))
    )
    hi_words = [_HI_WORDS[(5 + j) % len(_HI_WORDS)] for j in range(40)]
    hi = " ".join(hi_words)
    # the scrambled doc has the SAME token set as in-distribution text
    # (so the presence-feature classifier scores it identically and it
    # passes that gate) but REVERSED word order — every bigram is
    # unseen by the LM, scoring the pessimistic ln((c1+V)/1) backoff
    scrambled = " ".join(reversed(hi_words))
    batch = [(1200, "spectra " + hi), (1201, "spectra " + scrambled)]

    # calibrate the threshold between the two docs under the corpus LM
    uni, big, voc = train_lm(corpus)
    bdf = spark.createDataFrame(batch, "doc_id long, text string")
    cal = {r.doc_id: r.mean_nll_x1e6 for r in score_against_lm(bdf, uni, big, voc).collect()}
    assert cal[1200] < cal[1201]
    thr = (cal[1200] + cal[1201]) // 2

    accepted: set[int] = set()
    pipe = StreamingIngestPipeline.build(
        corpus,
        frozen,
        perplexity_threshold_x1e6=thr,
        threshold=0.9,
        on_accepted=lambda df, bid: accepted.update(r["doc_id"] for r in df.collect()),
    )
    batch_df = spark.createDataFrame(batch, "doc_id long, text string")
    pipe.process_batch(batch_df, 0)

    row = pipe.ledger[0]
    assert row["n_in"] == 2 and row["n_after_dedup"] == 2
    assert row["n_after_quality"] == 2  # both pass the classifier
    assert row["n_accepted"] == 1  # the LM gate rejects the gibberish
    assert accepted == {1200}
    assert pipe.perplexity.history[0]["n_kept"] == 1


def test_pipeline_with_dsir_gate(spark):
    """Five-gate wiring: a novel, classifier-positive doc is rejected
    by the DSIR gate when its content matches the RAW side of the
    importance model, and accepted when it matches the TARGET side —
    both docs being equally 'high quality' (same classifier-positive
    vocabulary class), so only the distribution-match gate separates
    them."""
    import hashlib

    from pyspark.sql import functions as F

    from ml_with_spark_streaming_spark.operators.dsir import (
        _bucket_occurrences,
        dsir_weight_table,
    )
    from ml_with_spark_streaming_spark.streaming.dsir_filter import (
        freeze_weights as freeze_dsir,
    )

    corpus = _docs(spark)
    frozen_q = freeze_weights(
        classifier_weights(feature_presence(corpus), heuristic_labels(corpus))
    )

    tgt, src = ["signal", "lattice", "theorem"], ["kernel", "manifold", "gradient"]

    def dbucket(t, B=64):
        return int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % B

    # fixture guard: target/source vocab in disjoint DSIR buckets
    assert not (set(map(dbucket, tgt)) & set(map(dbucket, src)))

    train = spark.createDataFrame(
        [(i, " ".join(tgt * 5), "en") for i in range(3)]
        + [(10 + i, " ".join(src * 5), "fr") for i in range(3)],
        "doc_id long, text string, lang string",
    )
    occ = _bucket_occurrences(train, "text", "doc_id", 64, carry=["lang"])
    frozen_d = freeze_dsir(dsir_weight_table(occ, F.col("lang") == "en", 64))

    accepted: set[int] = set()
    pipe = StreamingIngestPipeline.build(
        corpus,
        frozen_q,
        dsir_weights=frozen_d,
        dsir_n_buckets=64,
        threshold=0.9,
        on_accepted=lambda df, bid: accepted.update(r["doc_id"] for r in df.collect()),
    )
    batch = [
        (1300, "spectra " + " ".join(tgt * 10)),  # target-like -> accepted
        (1301, "spectra " + " ".join(src * 10)),  # raw-like -> DSIR-rejected
    ]
    batch_df = spark.createDataFrame(batch, "doc_id long, text string")
    pipe.process_batch(batch_df, 0)

    row = pipe.ledger[0]
    assert row["n_in"] == 2 and row["n_after_dedup"] == 2
    assert row["n_after_quality"] == 2  # both pass the classifier
    assert row["n_accepted"] == 1  # DSIR separates them
    assert accepted == {1300}
    assert pipe.dsir.history[0] == {"batch_id": 0, "n_docs": 2, "n_kept": 1}


def test_pipeline_with_segment_rewrite_stage(spark):
    """The rewrite stage runs after doc-level dedup: a novel document
    carrying a corpus boilerplate segment loses that segment but
    continues through the quality gate as its surviving text; the
    ledger records the rewrite column."""
    corpus = _docs(spark)
    frozen = freeze_weights(
        classifier_weights(feature_presence(corpus), heuristic_labels(corpus))
    )
    # width=10 segments: corpus doc 0's FIRST 10 tokens form a segment
    # the batch doc repeats verbatim AFTER 30 novel tokens (so the
    # boilerplate lands exactly on a segment boundary). The novel part
    # mixes hi-vocab (to pass the classifier) with ten fresh words (to
    # stay below the 0.9 near-dup Jaccard vs the cyclic corpus docs).
    corpus_seg = " ".join(_HI_WORDS[j % len(_HI_WORDS)] for j in range(10))
    fresh = " ".join("fresh" + chr(97 + j) for j in range(10))
    novel = " ".join(_HI_WORDS[(1 + j) % len(_HI_WORDS)] for j in range(20)) + " " + fresh

    accepted: dict[int, str] = {}
    pipe = StreamingIngestPipeline.build(
        corpus,
        frozen,
        segment_width=10,
        threshold=0.9,
        on_accepted=lambda df, bid: accepted.update(
            {r["doc_id"]: r["text"] for r in df.collect()}
        ),
    )
    # novel text FIRST: the exact-dedup gate fingerprints the first 8
    # tokens, which must not collide with corpus doc 0's prefix
    batch = [(1400, novel + " " + corpus_seg)]  # 30 novel + 10 boilerplate tokens
    pipe.process_batch(spark.createDataFrame(batch, "doc_id long, text string"), 0)

    row = pipe.ledger[0]
    assert row["n_in"] == 1 and row["n_after_dedup"] == 1
    assert row["n_after_rewrite"] == 1 and row["n_accepted"] == 1
    assert pipe.segdedup.history[0]["n_cut"] >= 1
    # the trailing boilerplate segment is cut; the accepted text is
    # exactly the 30 novel tokens
    assert accepted == {1400: novel}


def _novel_doc(tag, off):
    """Novel-by-shingle but classifier-liked text: every 3-gram carries
    a unique connector token while the _HI_WORDS presence features keep
    the quality score positive (letters only — the cleaner strips
    digits)."""
    return " ".join(
        f"{_HI_WORDS[(off + j) % len(_HI_WORDS)]} {tag}{chr(97 + j // 5)}{chr(97 + j % 5)}"
        for j in range(20)
    )


def test_pipeline_save_state_resume_equals_uninterrupted(spark, tmp_path):
    """The whole door restarts as ONE unit: run two batches, save_state,
    from_state, run two more — ledger and accepted set must equal the
    uninterrupted 4-batch run. Exercises every gate's persisted
    artifact (text-dedup index GROWN by accepted batches, embedding
    index grown likewise, decon grams, frozen quality/DSIR weights,
    perplexity LM) — batch 2 contains a duplicate of a batch-0-accepted
    doc and a near-dup of a batch-1-accepted VECTOR, so a resume that
    lost the grown state would visibly over-accept."""
    import random as _random

    corpus = _docs(spark)
    frozen = freeze_weights(
        classifier_weights(feature_presence(corpus), heuristic_labels(corpus))
    )
    bench = " ".join(f"bench{chr(97 + i)}" for i in range(13))
    eval_corpus = spark.createDataFrame(
        [(9000, f"intro {bench} outro")], "doc_id long, text string"
    )
    rnd = _random.Random(29)
    dim = 16
    emb_corpus = spark.createDataFrame(
        [(i, [rnd.gauss(0, 1) for _ in range(dim)]) for i in range(8)],
        "doc_id long, embedding array<float>",
    )

    def vec():
        return [rnd.gauss(0, 1) for _ in range(dim)]

    doc_a = _novel_doc("qa", 2)
    doc_c = _novel_doc("qc", 6)
    vec_c = vec()
    batches = [
        # b0: A accepted; B carries the eval 13-gram -> decon reject
        [(3000, doc_a, vec()), (3001, f"{_novel_doc('qb', 4)} {bench}", vec())],
        # b1: C accepted (novel text + novel vector)
        [(3002, doc_c, vec_c)],
        # b2: copy of A's TEXT (grown text index must reject), novel
        # text with C's VECTOR perturbed (grown vector index must
        # reject), E novel -> accepted
        [
            (3003, doc_a, vec()),
            (3004, _novel_doc("qd", 8), [x * (1 + rnd.uniform(-1e-3, 1e-3)) for x in vec_c]),
            (3005, _novel_doc("qe", 11), vec()),
        ],
        # b3: F novel -> accepted
        [(3006, _novel_doc("qf", 13), vec())],
    ]
    schema = "doc_id long, text string, embedding array<float>"
    build_kw = dict(
        eval_corpus=eval_corpus,
        embedding_corpus=emb_corpus,
        embedding_threshold=0.95,
        segment_width=10,
        segment_quality_threshold_x100=1,
        perplexity_threshold_x1e6=10**12,  # pass-all: state round-trip is the point
        dsir_weights=[(b, 1) for b in range(64)],  # all-positive: pass-all
        dsir_n_buckets=64,
        threshold=0.9,
    )

    # uninterrupted reference
    ref_accepted: set[int] = set()
    ref = StreamingIngestPipeline.build(
        corpus,
        frozen,
        on_accepted=lambda df, bid: ref_accepted.update(r["doc_id"] for r in df.collect()),
        **build_kw,
    )
    for bid, rows in enumerate(batches):
        ref.process_batch(spark.createDataFrame(rows, schema), bid)
    assert ref_accepted == {3000, 3002, 3005, 3006}  # fixture sanity

    # interrupted: 2 batches -> save -> resume -> 2 batches
    acc_a: set[int] = set()
    pipe_a = StreamingIngestPipeline.build(
        corpus,
        frozen,
        on_accepted=lambda df, bid: acc_a.update(r["doc_id"] for r in df.collect()),
        **build_kw,
    )
    for bid in (0, 1):
        pipe_a.process_batch(spark.createDataFrame(batches[bid], schema), bid)
    state = str(tmp_path / "door_state")
    pipe_a.save_state(state)

    acc_b: set[int] = set()
    pipe_b = StreamingIngestPipeline.from_state(
        spark,
        state,
        corpus,
        on_accepted=lambda df, bid: acc_b.update(r["doc_id"] for r in df.collect()),
    )
    assert pipe_b.ledger == ref.ledger[:2]  # ledger resumed, not reset
    for bid in (2, 3):
        pipe_b.process_batch(spark.createDataFrame(batches[bid], schema), bid)

    assert acc_a | acc_b == ref_accepted
    assert pipe_b.ledger == ref.ledger
    # the resumed gates produced the same per-stage verdicts
    assert pipe_b.dedup.history[-2:] == ref.dedup.history[-2:]
    assert pipe_b.embdedup.history[-2:] == ref.embdedup.history[-2:]


def test_from_state_refuses_uncommitted_dir(spark, tmp_path):
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError, match="manifest"):
        StreamingIngestPipeline.from_state(
            spark, str(tmp_path / "nowhere"), _docs(spark)
        )


def test_pipeline_with_embedding_gate(spark):
    """Multimodal door: a doc with novel TEXT but a near-duplicate
    EMBEDDING is cut by the embedding stage (text dedup is blind to
    it); novel doc passes; ledger tracks the stage."""
    import random as _random

    corpus = _docs(spark)  # text corpus for the text gates
    frozen = freeze_weights(
        classifier_weights(feature_presence(corpus), heuristic_labels(corpus))
    )
    rnd = _random.Random(21)
    dim = 16
    emb_corpus = spark.createDataFrame(
        [(i, [rnd.gauss(0, 1) for _ in range(dim)]) for i in range(8)],
        "doc_id long, embedding array<float>",
    )
    base_vec = emb_corpus.collect()[3].embedding

    # novel-by-shingle but classifier-liked: every 3-gram carries a
    # unique connector token (so the text gate sees no corpus shingle)
    # while the _HI_WORDS presence features keep the quality score
    # positive (letters only — the cleaner strips digits)
    def _novel(tag, off):
        return " ".join(
            f"{_HI_WORDS[(off + j) % len(_HI_WORDS)]} {tag}{chr(97 + j // 5)}{chr(97 + j % 5)}"
            for j in range(20)
        )

    hi = _novel("qm", 5)
    hi2 = _novel("zx", 9)
    batch = [
        # novel text, embedding ~= corpus vec 3 -> embedding gate cuts
        (2000, hi, [x * (1 + rnd.uniform(-1e-3, 1e-3)) for x in base_vec]),
        # novel text, novel embedding -> accepted end to end
        (2001, hi2, [rnd.gauss(0, 1) for _ in range(dim)]),
    ]
    batch_df = spark.createDataFrame(
        batch, "doc_id long, text string, embedding array<float>"
    )

    accepted: set[int] = set()
    pipe = StreamingIngestPipeline.build(
        corpus,
        frozen,
        embedding_corpus=emb_corpus,
        embedding_threshold=0.95,
        threshold=0.9,
        on_accepted=lambda df, bid: accepted.update(r["doc_id"] for r in df.collect()),
    )
    pipe.process_batch(batch_df, 0)

    assert accepted == {2001}
    row = pipe.ledger[0]
    assert row["n_in"] == 2
    assert row["n_after_dedup"] == 2       # both texts novel
    assert row["n_after_embdedup"] == 1    # 2000 cut by the vector gate
    # with no segdedup configured the rewrite column must fall back to
    # the EMBEDDING stage's count, keeping the funnel monotonic
    assert row["n_after_rewrite"] == 1
    assert row["n_after_rewrite"] <= row["n_after_embdedup"]
    assert row["n_accepted"] == 1
    assert pipe.embdedup.history[0]["n_near"] == 1
