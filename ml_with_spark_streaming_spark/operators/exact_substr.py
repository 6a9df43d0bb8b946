"""Substring-level exact deduplication (ExactSubstr): find and flag
repeated >= k-token SPANS across (and within) documents.

The standard curation stage between fuzzy document-dedup and sequence
packing (Lee et al. 2021, "Deduplicating Training Data Makes Language
Models Better", arXiv:2107.06499 — their ExactSubstr removes every
duplicated substring of >= 50 tokens, keeping one occurrence). Document-
level dedup (exact fingerprint / MinHash / SimHash / embeddings —
``operators/dedup.py``) misses boilerplate, quoted passages, and
templated fragments shared by otherwise-distinct documents; this
operator finds them at token-span granularity.

Formulation (suffix-array-free, join-based — the shape that actually
distributes):

1. tokenize once (behind the repartition barrier — the
   CollapseProject-into-Generate rule from ``minhash_signatures``);
2. explode every k-token shingle WITH its start position; the
   comparison key is the 16-hex md5 prefix (``decontaminate._gram_key``
   — ~5x narrower shuffles, negligible 64-bit collision odds, exactly
   reproducible in DuckDB);
3. one groupBy(gram key): occurrence count + the canonical (first)
   occurrence — map-side combinable min/count, shuffle keyed by the
   hash. Keys occurring >= 2 times are the duplicated-shingle table,
   bounded by DUPLICATED content, not corpus size;
4. join the position table back to the duplicated keys (only
   duplicated positions survive — again bounded by duplicated
   content);
5. per document, merge duplicate start positions whose spans overlap
   or touch (gap <= k) into maximal spans — a gaps-and-islands window
   PARTITIONED BY doc (never global), then one groupBy(doc, island).

At 100 TB: the corpus is never self-joined (step 3's aggregation is
the only all-corpus shuffle, keyed by the 16-hex gram hash, count+min
combine map-side); steps 4-5 run over duplicated positions only. This
trades the reference paper's single-machine suffix array for two
hash shuffles — the join-based equivalent used by distributed
implementations (e.g. text-dedup's Spark ExactSubstr variants).

Cut policy: a span is ``cut = 1`` unless it contains the canonical
(globally first by (doc_id, pos)) occurrence of at least one of its
duplicated shingles — so every duplicated passage keeps exactly its
first copy, later copies are marked for removal (the Lee et al.
keep-one policy at span granularity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ml_with_spark_streaming_spark.functions.text import clean_text_expr, tokens_expr
from ml_with_spark_streaming_spark.lineage import maybe_checkpoint
from ml_with_spark_streaming_spark.operators.dedup import shingles_expr

DEFAULT_SPAN_TOKENS = 50  # Lee et al. 2021 §3.1 production width

# md5('') prefix — the kept-text fingerprint of a doc with no tokens
_EMPTY_FP = "d41d8cd98f00b204"


def _occ_key(doc_id, pos):
    """Total order over occurrences as a fixed-width string — min()
    over it is the globally FIRST occurrence, identically computable
    in DuckDB (printf) so the oracle replays the canonical choice."""
    return F.format_string("%012d#%09d", doc_id, pos)


def tokenized(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One tokenize pass behind the repartition barrier, materialized —
    the shared input of span discovery AND cut application (each would
    otherwise re-run the regex chain over the whole corpus). Lazy
    checkpoint: a single-consumer caller (q110's discovery-only path)
    pays nothing up front; the materialization happens on first use
    and is reused from there."""
    return maybe_checkpoint(
        df.select(F.col(id_col), tokens_expr(clean_text_expr(text_col)).alias("_toks"))
        .repartition(id_col),
        eager=False,
    )


def duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_SPAN_TOKENS,
    sorted_output: bool = True,
    toks: DataFrame | None = None,
    hash_mode: str = "md5",
) -> DataFrame:
    """Maximal duplicated >= k-token spans per document.

    Returns ``(id_col, span_start, span_end, n_dup_tokens, cut)``:
    1-based token positions, inclusive ends, ``n_dup_tokens`` the span
    width, ``cut`` = 1 iff the span holds no canonical (first)
    occurrence of any of its shingles (the keep-one policy).
    ``toks`` (from :func:`tokenized`) lets a caller share one tokenize
    pass between discovery and application.

    ``hash_mode``: ``"md5"`` (16-hex-char key — the DuckDB-replayable
    oracle form) or ``"xxhash64"`` (one BIGINT key — ~half the shuffle
    width at identical plan shape; the production swap for the one
    corpus-sized exchange). Spans are identical either way (both keys
    are injective modulo negligible collision odds), pinned by
    ``tests/test_exact_substr.py::test_xxhash64_mode_same_spans``.
    """
    if hash_mode not in ("md5", "xxhash64"):
        raise ValueError(f"hash_mode must be 'md5' or 'xxhash64', got {hash_mode!r}")
    if toks is None:
        toks = tokenized(df, text_col, id_col)
    gram_key = (
        F.xxhash64(F.col("_g"))
        if hash_mode == "xxhash64"
        else F.substring(F.md5(F.encode(F.col("_g"), "UTF-8")), 1, 16)
    )
    grams = toks.select(
        F.col(id_col),
        F.posexplode(shingles_expr(F.col("_toks"), k)).alias("_i", "_g"),
    ).select(
        F.col(id_col),
        (F.col("_i") + 1).alias("pos"),  # 1-based, matching the SQL twin
        gram_key.alias("gk"),
    )
    # one corpus pass feeds BOTH the occurrence aggregate and the
    # position probe (otherwise each re-plans the tokenize+explode)
    grams = maybe_checkpoint(grams)
    dup = (
        grams.groupBy("gk")
        .agg(
            F.count("*").alias("_n_occ"),
            F.min(_occ_key(F.col(id_col), F.col("pos"))).alias("_canon"),
        )
        .filter(F.col("_n_occ") >= 2)
        .select("gk", "_canon")
    )
    dp = grams.join(dup, "gk").select(
        F.col(id_col),
        "pos",
        (_occ_key(F.col(id_col), F.col("pos")) == F.col("_canon")).cast("int").alias("_is_canon"),
    )
    # gaps-and-islands over duplicate START positions, per doc: a new
    # island when this span neither overlaps nor touches the previous
    # one (gap > k). Window is doc-partitioned — parallel, never global.
    w = W.partitionBy(id_col).orderBy("pos")
    isl = dp.withColumn(
        "_new",
        (F.col("pos") - F.coalesce(F.lag("pos").over(w), F.col("pos")) > k).cast("int"),
    ).withColumn("_island", F.sum("_new").over(w.rowsBetween(W.unboundedPreceding, 0)))
    out = (
        isl.groupBy(id_col, "_island")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + (k - 1)).cast("long").alias("span_end"),
            (F.max("pos") - F.min("pos") + k).cast("long").alias("n_dup_tokens"),
            (F.max("_is_canon") == 0).cast("int").alias("cut"),
        )
        .select(id_col, "span_start", "span_end", "n_dup_tokens", "cut")
    )
    return out.orderBy(id_col, "span_start") if sorted_output else out


def apply_cuts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_SPAN_TOKENS,
    spans: DataFrame | None = None,
) -> DataFrame:
    """APPLY the keep-one cut policy — the second half of the
    ExactSubstr stage: drop every token inside a ``cut = 1`` span and
    emit, per document, ``(id_col, n_tokens, n_cut_tokens,
    n_kept_tokens, kept_fp)`` where ``kept_fp`` is the 16-hex md5
    prefix of the space-joined surviving tokens (the cleaned text's
    content fingerprint — driver-narrow stand-in for the text itself;
    a consumer re-slices the same kept positions).

    ``spans`` defaults to ``duplicate_spans(df, ...)`` recomputed
    in-query; in production the span table is the materialized output
    of the discovery stage, passed in here so the application pass is
    ONE corpus scan + one join.

    Scale shape: cut spans are bounded by DUPLICATED content (and
    islands are disjoint per doc — next start ≥ prev end + 2 — so the
    range join matches ≤ 1 span per position, no fan-out). The span
    side is broadcast here; if a pathological corpus outgrows the
    broadcast threshold, drop the hint and the same join shuffles
    co-partitioned on ``id_col``. The per-doc reassembly is a
    map-side ``collect_list`` keyed by the doc — never a global sort.
    """
    toks = tokenized(df, text_col, id_col)
    if spans is None:
        spans = duplicate_spans(df, text_col, id_col, k=k, sorted_output=False, toks=toks)
    cut = (
        spans.filter(F.col("cut") == 1)
        .select(F.col(id_col).alias("_sdoc"), "span_start", "span_end")
    )
    cut = maybe_checkpoint(cut)
    pos = toks.select(
        F.col(id_col), F.posexplode("_toks").alias("_i", "_tok")
    ).select(F.col(id_col), (F.col("_i") + 1).alias("pos"), "_tok")
    flagged = pos.join(
        F.broadcast(cut),
        (F.col(id_col) == F.col("_sdoc"))
        & F.col("pos").between(F.col("span_start"), F.col("span_end")),
        "left",
    ).select(
        F.col(id_col),
        "pos",
        "_tok",
        F.col("span_start").isNotNull().cast("int").alias("_cut"),
    )
    kept = F.when(F.col("_cut") == 0, F.struct(F.col("pos"), F.col("_tok")))
    agg = flagged.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum("_cut").cast("long").alias("n_cut_tokens"),
        (F.count("*") - F.sum("_cut")).cast("long").alias("n_kept_tokens"),
        F.substring(
            F.md5(
                F.encode(
                    F.concat_ws(
                        " ",
                        F.transform(
                            F.array_sort(F.collect_list(kept)), lambda s: s["_tok"]
                        ),
                    ),
                    "UTF-8",
                )
            ),
            1,
            16,
        ).alias("kept_fp"),
    )
    # docs whose cleaned text is EMPTY produce no token rows but must
    # still appear (0 tokens, fingerprint of '') — q98's empty-doc
    # convention, so pack/budget consumers reconcile against the full
    # document spine
    return (
        df.select(F.col(id_col))
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("n_cut_tokens", F.lit(0)).cast("long").alias("n_cut_tokens"),
            F.coalesce("n_kept_tokens", F.lit(0)).cast("long").alias("n_kept_tokens"),
            F.coalesce("kept_fp", F.lit(_EMPTY_FP)).alias("kept_fp"),
        )
        .orderBy(id_col)
    )
