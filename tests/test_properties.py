"""Property-style equivalence: the engine's Column expressions vs
pure-Python reference models over generated inputs (one Spark job per
test — examples are batched into a single DataFrame, not run
per-example)."""

from __future__ import annotations

import json
import random
import re
import string

from pyspark.sql import functions as F

from ml_with_spark_streaming_spark.functions.text import clean_text_expr, tokens_expr
from ml_with_spark_streaming_spark.streaming.wire import parse_wire

_CHARS = (
    string.ascii_letters
    + string.digits
    + " \t\n@#&,.:;!?'\"()-_/🙂é漢"
    + "://"
)


def _rand_strings(n=300, seed=1234):
    rnd = random.Random(seed)
    out = []
    for _ in range(n):
        ln = rnd.randrange(0, 60)
        out.append("".join(rnd.choice(_CHARS) for _ in range(ln)))
    # adversarial fixed cases
    out += [
        "", " ", "@only #tags &here", "http://u.rl only", "a,b,c",
        "ftp://x\t\nmix 123", "ALLCAPS lower", "@a" * 30,
    ]
    return out


def _py_clean(text: str) -> str:
    t = re.sub(r"[@#&][A-Za-z0-9-]+", " ", text)
    t = re.sub(r"\w+://\S+", " ", t)
    t = re.sub(r"[^A-Za-z]", " ", t)
    t = re.sub(r"\s+", " ", t)
    return t.lower().strip()


def test_clean_text_matches_python_model(spark):
    data = _rand_strings()
    df = spark.createDataFrame([(s,) for s in data], "t string")
    got = [r["c"] for r in df.select(clean_text_expr("t").alias("c")).collect()]
    want = [_py_clean(s) for s in data]
    assert got == want


def test_tokens_match_python_model(spark):
    data = _rand_strings(seed=99)
    df = spark.createDataFrame([(s,) for s in data], "t string")
    got = [r["k"] for r in df.select(tokens_expr(clean_text_expr("t")).alias("k")).collect()]
    want = [(_py_clean(s).split(" ") if _py_clean(s) else []) for s in data]
    assert got == want


def test_wire_roundtrip_generated_payloads(spark):
    rnd = random.Random(7)
    payload_records = []
    lines = []
    for _ in range(40):
        recs = []
        for _ in range(rnd.randrange(1, 6)):
            label = rnd.choice(["0", "4"])
            # text may contain commas and unicode — split is first-comma-only
            text = "".join(rnd.choice(_CHARS.replace("\n", "")) for _ in range(rnd.randrange(0, 30)))
            recs.append(f"{label},{text}")
            payload_records.append((label, text))
        lines.append(json.dumps(recs))
    df = spark.createDataFrame([(line,) for line in lines], "value string")
    parsed = parse_wire(df).filter(F.col("error").isNull())
    got = sorted((r["label"], r["tweet"]) for r in parsed.collect())
    assert got == sorted(payload_records)


def test_bpe_properties_on_generated_text():
    """Byte-level BPE invariants over generated inputs (pure Python —
    the UDF twin is pinned against this implementation in
    test_text.py): encode is lossless (chunks re-concatenate to the
    input), count == len(encode), and token count never exceeds the
    byte count."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ml_with_spark_streaming_spark.functions.bpe import count_tokens, encode

    @settings(max_examples=200, deadline=None)
    @given(
        st.text(
            alphabet=st.sampled_from(
                string.ascii_letters + string.digits + " .,!?'\"-:;()/@#&\n\t"
            ),
            max_size=400,
        )
    )
    def check(s: str) -> None:
        chunks = encode(s)
        assert b"".join(chunks).decode("utf-8") == s
        assert count_tokens(s) == len(chunks)
        assert count_tokens(s) <= len(s.encode("utf-8"))
        assert all(len(c) >= 1 for c in chunks)

    check()


def test_exact_substr_invariants_on_generated_corpora(spark):
    """Cross-operator invariants of the ExactSubstr stage on randomly
    generated duplicate-heavy corpora (tiny vocab forces shared
    shingles): spans are disjoint and >= k wide per doc; per doc,
    apply_cuts' n_cut_tokens equals the total width of its cut spans;
    kept + cut = total; every count is within the doc length."""
    from ml_with_spark_streaming_spark.operators.exact_substr import (
        apply_cuts,
        duplicate_spans,
    )

    rnd = random.Random(17)
    vocab = ["w" + c for c in string.ascii_lowercase[:6]]
    k = 4
    for trial in range(3):
        rows = [
            (i, " ".join(rnd.choice(vocab) for _ in range(rnd.randint(0, 25))))
            for i in range(12)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        spans = duplicate_spans(df, k=k).collect()
        by_doc: dict[int, list] = {}
        for r in spans:
            by_doc.setdefault(r.doc_id, []).append(r)
        for doc, ss in by_doc.items():
            ss.sort(key=lambda r: r.span_start)
            for r in ss:
                assert r.n_dup_tokens >= k
                assert r.span_end - r.span_start + 1 == r.n_dup_tokens
            for a, b in zip(ss, ss[1:]):
                assert b.span_start > a.span_end + 1, (trial, doc)  # disjoint, non-adjacent
        cuts = {r.doc_id: r for r in apply_cuts(df, k=k).collect()}
        n_tokens = {i: len(t.split()) if t else 0 for i, t in rows}
        assert set(cuts) == set(n_tokens)
        for doc, r in cuts.items():
            assert r.n_tokens == n_tokens[doc], (trial, doc)
            assert r.n_kept_tokens == r.n_tokens - r.n_cut_tokens
            want_cut = sum(
                s.n_dup_tokens for s in by_doc.get(doc, []) if s.cut == 1
            )
            assert r.n_cut_tokens == want_cut, (trial, doc)
