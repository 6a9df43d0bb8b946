"""Distributed BPE training equals the in-process trainer."""

from __future__ import annotations

from ml_with_spark_streaming_spark.functions.bpe import (
    _SEED_CORPUS,
    bpe_token_count_series_for,
    train_bpe,
)
from ml_with_spark_streaming_spark.operators.bpe_train import train_bpe_distributed

import pytest

pytestmark = pytest.mark.slow  # multi-stream/artifact-fit module: full-suite only (SPARK_GRAFT_FULL_TESTS=1)


def test_distributed_equals_inprocess_on_seed_corpus(spark):
    """Bit-equal merge lists on the seed corpus (single row → identical
    pre-token stream), pinning pair counting, weighting, and the
    (-count, pair-bytes) tie-break across the distributed formulation."""
    df = spark.createDataFrame([(_SEED_CORPUS,)], "text string")
    assert train_bpe_distributed(df, "text", n_merges=48) == train_bpe([_SEED_CORPUS], 48)


def test_distributed_equals_inprocess_on_documents(spark):
    """Same equality over real multi-row corpus data (sf0.001 docs),
    then q102-style counting runs against the corpus-trained table."""
    from ml_with_spark_streaming_spark.sources.batch import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents").limit(80)
    texts = [r.text for r in d.select("text").collect()]
    merges = train_bpe_distributed(d, "text", n_merges=24)
    assert merges == train_bpe(texts, 24)

    # corpus-trained counting: lossless (>= pre-token count never, but
    # counts bounded by byte length and > 0 for non-empty text)
    import pandas as pd

    mapper = bpe_token_count_series_for(merges)
    counts = mapper(pd.Series(texts[:10]))
    for t, c in zip(texts[:10], counts):
        assert 0 < c <= len(t.encode("utf-8"))
