"""Segment-level dedup: boilerplate is cut corpus-wide, first
occurrence wins in (doc_id, pos) order, documents reassemble from
surviving segments in original order."""

from __future__ import annotations

from ml_with_spark_streaming_spark.operators.segment_dedup import (
    segment_dedup,
    segment_table,
)

# width=3 segments for readable fixtures
BOILER = "all rights reserved"
A = "alpha beta gamma"
B = "delta epsilon zeta"
C = "eta theta iota"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_first_occurrence_wins_and_docs_reassemble(spark):
    rows = [
        (1, f"{A} {BOILER}"),          # first use of BOILER -> kept
        (2, f"{B} {BOILER} {C}"),      # repeated BOILER -> cut, B/C survive
        (3, BOILER),                    # all-boilerplate doc -> empty
        (4, ""),                        # token-less doc -> spine row, zeros
    ]
    out = {
        r["doc_id"]: r
        for r in segment_dedup(_docs(spark, rows), width=3).collect()
    }
    assert out[1]["text_kept"] == f"{A} {BOILER}"
    assert (out[1]["n_segs"], out[1]["n_kept"]) == (2, 2)
    assert out[2]["text_kept"] == f"{B} {C}"  # order preserved across the cut
    assert (out[2]["n_segs"], out[2]["n_kept"]) == (3, 2)
    assert out[3]["text_kept"] == "" and out[3]["n_kept"] == 0
    assert (out[4]["n_segs"], out[4]["n_kept"], out[4]["text_kept"]) == (0, 0, "")


def test_duplicate_within_one_document_is_cut(spark):
    rows = [(7, f"{A} {A} {B}")]
    row = segment_dedup(_docs(spark, rows), width=3).collect()[0]
    assert row["text_kept"] == f"{A} {B}"
    assert (row["n_segs"], row["n_kept"]) == (3, 2)


def test_segment_table_positions_and_ragged_tail(spark):
    rows = [(9, "a b c d")]  # width 3 -> ["a b c", "d"]
    segs = sorted(
        (r["pos"], r["para"])
        for r in segment_table(_docs(spark, rows), width=3).collect()
    )
    assert segs == [(0, "a b c"), (1, "d")]


def test_segment_quality_rewrite_cuts_bad_paragraphs(spark):
    from ml_with_spark_streaming_spark.operators.segment_dedup import (
        segment_quality_rewrite,
    )

    # long alpha words: alpha_ratio 38/40 -> quality ~0.693 >= 0.67
    good = "alphabetical betacarotene gammaglobulin"
    junk = "!!! ??? %%%"               # punctuation soup: fails any threshold
    rows = [
        (1, f"{good} {junk} {good}"),  # middle segment cut, order preserved
        (2, f"{junk} {junk}"),         # nothing survives -> ''
        (3, good),                     # untouched
    ]
    out = {
        r["doc_id"]: r
        for r in segment_quality_rewrite(
            _docs(spark, rows), width=3, threshold_x100=67
        ).collect()
    }
    assert out[1]["text_kept"] == f"{good} {good}"
    assert (out[1]["n_segs"], out[1]["n_kept"]) == (3, 2)
    assert out[2]["text_kept"] == "" and out[2]["n_kept"] == 0
    assert out[3]["text_kept"] == good and out[3]["n_kept"] == 1


def test_segment_quality_threshold_is_exclusive_integer_compare(spark):
    from ml_with_spark_streaming_spark.operators.segment_dedup import (
        segment_quality_rewrite,
    )

    # "alpha beta gamma": n=16, na=14, np=0, wcap=3 -> quality rational
    # (250*14 + 100*16 + 3*3*16) / (500*16) = 5244/8000 = 0.6555
    good = "alpha beta gamma"
    df = _docs(spark, [(1, good)])
    at = segment_quality_rewrite(df, width=3, threshold_x100=65).collect()[0]
    above = segment_quality_rewrite(df, width=3, threshold_x100=66).collect()[0]
    assert at["n_kept"] == 1       # 5244*100 >= 65*500*16 -> kept
    assert above["n_kept"] == 0    # 524400 < 66*8000=528000 -> cut
