"""Segment-level (paragraph) dedup: drop repeated segments corpus-wide,
keep each document's surviving segments in order.

The CCNet / C4 curation stage (Wenzek et al. 2020 dedupe at paragraph
granularity; C4 drops repeated three-sentence spans): boilerplate —
headers, footers, license blocks, navigation text — repeats across
millions of pages, and document-level dedup never sees it because the
surrounding text differs. The unit of deduplication here is a SEGMENT
of a document; the first occurrence (in deterministic (doc_id, pos)
order) survives, every later occurrence anywhere in the corpus is cut,
and each document is reassembled from its surviving segments.

Segmentation is pluggable: real corpora split on newlines
(``F.split(text, "\\n")``); the synthetic fixture corpus has no
newlines, so the default segmentation is fixed-width token windows
(``width`` tokens per segment) — deterministic, engine-portable, and
the same shape a sentence splitter would feed in.

Scale shape at 100 TB:

* first-occurrence election is a ``row_number`` window PARTITIONED BY
  the segment hash — the segment-hash shuffle is the one corpus-sized
  exchange, keyed by a 16-hex md5 prefix (same narrow-key trick as the
  dedup family; ~64-bit keys instead of full paragraph strings);
* reassembly is ONE per-document aggregation (collect surviving
  (pos, para) structs, sort, join) — map-side combinable by doc_id;
* nothing is collected, nothing self-joins, no global sort; boilerplate
  segments are exactly the hot keys, but the window only ranks within
  a hash partition (hot key = one big partition ranked once — and AQE
  skew handling applies to the exchange).

Reference scope note: the reference repo (867 LoC of DStreams +
driver-side sklearn) has no dedup of any kind; this operator is part
of the training-data-pipeline surface (SURVEY.md north star), sibling
to document-level q46/q50 and token-span-level q110/q115.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ml_with_spark_streaming_spark.lineage import maybe_checkpoint

DEFAULT_WIDTH = 10  # tokens per synthetic segment


def _segments_expr(toks: Column, width: int) -> Column:
    """Array of fixed-width token-window segments; empty array for
    token-less docs (guarded — ``F.sequence(0, -1)`` would descend)."""
    n_seg = F.ceil(F.size(toks) / F.lit(width)).cast("int")
    idx = F.when(n_seg > 0, F.sequence(F.lit(0), n_seg - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i * width + 1, width), " ")
    )


def _toks_table(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One row per document: ``(id_col, _toks)``, materialized behind a
    repartition barrier BEFORE the per-segment transform — the segment
    lambda references ``toks`` per element, and CollapseProject would
    otherwise inline the split+filter chain into the lambda and
    re-evaluate it once per segment (the q50/q101 Generate trap,
    measured there at ~7x)."""
    return df.select(
        F.col(id_col),
        F.filter(F.split(F.col(text_col), " "), lambda t: t != "").alias("_toks"),
    ).repartition(id_col)


def _segments(toks: DataFrame, id_col: str, width: int) -> DataFrame:
    return toks.select(
        F.col(id_col),
        F.posexplode(_segments_expr(F.col("_toks"), width)).alias("pos", "para"),
    )


def segment_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """``(id_col, pos, para)`` — one row per segment, pos is the
    segment's 0-based position within its document."""
    return _segments(_toks_table(df, text_col, id_col), id_col, width)


def segment_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Corpus-wide segment dedup over the FULL document spine.

    Returns ``(id_col, n_segs, n_kept, text_kept)``: segment count,
    surviving-segment count, and the document reassembled from its
    surviving segments in original order ('' when nothing survives —
    a document made entirely of boilerplate). First occurrence wins,
    ordered by (doc_id, pos) — deterministic and engine-portable.

    The checkpointed token table is scanned by BOTH the segment branch
    and the document spine (the left join that surfaces token-less
    docs), so the base table is read exactly once.
    """
    toks = maybe_checkpoint(_toks_table(df, text_col, id_col))
    segs = _segments(toks, id_col, width)
    h = F.substring(F.md5(F.encode("para", "UTF-8")), 1, 16)
    w = Window.partitionBy("_h").orderBy(id_col, "pos")
    ranked = segs.withColumn("_h", h).withColumn(
        "keep", F.row_number().over(w) == 1
    )
    per_doc = ranked.groupBy(id_col).agg(
        F.sort_array(F.collect_list(F.struct("pos", "keep", "para"))).alias("_s")
    )
    kept = F.filter(F.col("_s"), lambda s: s["keep"])
    agg = per_doc.select(
        F.col(id_col),
        F.size("_s").cast("long").alias("n_segs"),
        F.size(kept).cast("long").alias("n_kept"),
        F.array_join(F.transform(kept, lambda s: s["para"]), " ").alias("text_kept"),
    )
    return (
        toks.select(id_col)
        .join(agg, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_segs", F.lit(0)).cast("long").alias("n_segs"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("text_kept", F.lit("")).alias("text_kept"),
        )
    )


def segment_quality_rewrite(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = DEFAULT_WIDTH,
    threshold_x100: int = 67,
) -> DataFrame:
    """FineWeb/C4-style fine-grained quality filtering (Penedo et al.
    2024 §3.3; Raffel et al. 2020 §2.2): score each SEGMENT with the
    q45 quality rational and rebuild every document from only its
    passing segments — a low-quality paragraph is cut without
    discarding the whole document (doc-level gates like q93/q113 are
    all-or-nothing).

    Keep test is the UNROUNDED pure-integer comparison
    ``(250·na + 100·(n−np) + 3·wcap·n)·100 >= threshold_x100·500·n``
    (the q45 rational cross-multiplied) — no double is rounded
    anywhere, so engines cannot disagree at a boundary. Empty-segment
    guard: segments always contain >=1 token by construction.

    Returns ``(id_col, n_segs, n_kept, text_kept)`` over the FULL
    document spine (same contract as ``segment_dedup``; '' when no
    segment passes).

    Scale shape: scoring is a pure codegen projection on the segment
    table — NO corpus-wide exchange at all (unlike dedup, quality
    needs no cross-document state); the only shuffle is the per-doc
    regroup, keyed by the id. The checkpointed token table feeds both
    the segment branch and the doc spine, one base scan.
    """
    toks = maybe_checkpoint(_toks_table(df, text_col, id_col))
    segs = _segments(toks, id_col, width)
    n = F.length("para").cast("long")
    na = n - F.length(F.regexp_replace("para", r"[A-Za-z]", "")).cast("long")
    np_ = F.length(F.regexp_replace("para", r"[A-Za-z0-9\s]", "")).cast("long")
    wcap = F.least(
        F.size(F.filter(F.split(F.trim(F.col("para")), r"\s+"), lambda t: t != "")),
        F.lit(50),
    ).cast("long")
    keep = (250 * na + 100 * (n - np_) + 3 * wcap * n) * 100 >= (
        F.lit(int(threshold_x100)) * 500 * n
    )
    scored = segs.withColumn("keep", keep)
    per_doc = scored.groupBy(id_col).agg(
        F.sort_array(F.collect_list(F.struct("pos", "keep", "para"))).alias("_s")
    )
    kept = F.filter(F.col("_s"), lambda s: s["keep"])
    agg = per_doc.select(
        F.col(id_col),
        F.size("_s").cast("long").alias("n_segs"),
        F.size(kept).cast("long").alias("n_kept"),
        F.array_join(F.transform(kept, lambda s: s["para"]), " ").alias("text_kept"),
    )
    return (
        toks.select(id_col)
        .join(agg, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_segs", F.lit(0)).cast("long").alias("n_segs"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("text_kept", F.lit("")).alias("text_kept"),
        )
    )
