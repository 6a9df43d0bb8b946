"""Benchmark-set decontamination: n-gram overlap against an eval set.

The standard pretraining-corpus hygiene stage (the GPT-3 paper's
appendix C describes the 13-gram variant): any training document
sharing an n-gram with a held-out benchmark/eval document is flagged
(and usually dropped) so downstream eval numbers aren't inflated by
memorized test data.

Scale shape — the ONLY sane one at 100 TB:

* the eval side is benchmark-sized (thousands of documents, millions
  of n-grams at most) → computed once, deduplicated, and BROADCAST;
* the corpus side streams through one explode + one broadcast
  semi-join + one per-doc aggregation (map-side combinable, keyed by
  doc_id) — the corpus is never shuffled by n-gram, never joined to
  itself, and never collected.

Built from the same primitives as the dedup family: ``clean_text_expr``
→ ``tokens_expr`` → ``shingles_expr`` (word n-grams, JVM-side).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ml_with_spark_streaming_spark.functions.text import clean_text_expr, tokens_expr
from ml_with_spark_streaming_spark.operators.dedup import shingles_expr

DEFAULT_NGRAM = 13  # GPT-3 appendix-C decontamination width

_NAME_RE = re.compile(r"^[A-Za-z0-9_]+$")


def _validate_registry(benchmarks) -> None:
    """Benchmark names become ``hit_<name>`` column suffixes that are
    later interpolated into ``F.col``/string expressions — reject an
    empty registry and any name that is not ``[A-Za-z0-9_]+`` (dots,
    backticks, spaces would silently mis-resolve columns)."""
    if not benchmarks:
        raise ValueError(
            "benchmark registry is empty — register at least one eval set"
        )
    bad = [n for n in benchmarks if not _NAME_RE.match(str(n))]
    if bad:
        raise ValueError(
            f"benchmark names must match [A-Za-z0-9_]+ (they become "
            f"hit_<name> column suffixes); invalid: {bad!r}"
        )


def _gram_key(gram: Column) -> Column:
    """A 13-gram is ~90 chars; its comparison key for the distinct /
    join shuffles is the 16-hex-char md5 prefix — ~5x narrower
    exchanges at identical join semantics (64-bit collision odds are
    negligible, and both engines compute the same md5 so the oracle
    replays it exactly; fixed-width hex needs no numeric conversion)."""
    return F.substring(F.md5(F.encode(gram, "UTF-8")), 1, 16)


def _doc_ngrams(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """Distinct (id, n-gram-key) pairs per document; docs shorter than
    n tokens contribute nothing (and are 'clean' by definition).

    Tokenization is materialized behind a repartition barrier BEFORE
    the shingle explode — minhash_signatures' fix for the
    CollapseProject-into-Generate trap, where the 4-regex cleaning
    chain is otherwise inlined into the shingle lambda and re-evaluated
    once per n-gram (measured here: 17 s → 2.5 s at sf0.1)."""
    toks = df.select(F.col(id_col), tokens_expr(clean_text_expr(text_col)).alias("_toks"))
    toks = toks.repartition(id_col)
    return (
        toks.select(F.col(id_col), F.explode(shingles_expr(F.col("_toks"), n)).alias("_g"))
        .select(F.col(id_col), _gram_key(F.col("_g")).alias("gram"))
        .distinct()
    )


def eval_ngrams(eval_df: DataFrame, text_col: str = "text", n: int = DEFAULT_NGRAM) -> DataFrame:
    """The deduplicated n-gram KEY set of the eval/benchmark corpus —
    the small side; callers broadcast it. Same explode barrier as
    ``_doc_ngrams`` (per-element re-evaluation hits any shingle
    fan-out), same md5-prefix key."""
    toks = eval_df.select(tokens_expr(clean_text_expr(text_col)).alias("_toks"))
    toks = toks.repartition(8)  # benchmark-sized side: barrier cost is trivial
    return (
        toks.select(F.explode(shingles_expr(F.col("_toks"), n)).alias("_g"))
        .select(_gram_key(F.col("_g")).alias("gram"))
        .distinct()
    )


def contamination_counts(
    corpus: DataFrame,
    eval_gram_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = DEFAULT_NGRAM,
) -> DataFrame:
    """Per-document contamination profile against ``eval_gram_df``
    (one ``gram`` column, assumed small).

    Returns ``(id_col, n_grams, n_contaminated, keep)`` for every
    corpus row: distinct n-grams in the doc, how many of those appear
    in the eval set (via broadcast semi-join), and ``keep`` = 1 iff
    zero overlap (the GPT-3 policy; callers wanting a laxer threshold
    filter on ``n_contaminated`` themselves).
    """
    grams = _doc_ngrams(corpus, text_col, id_col, n)
    # ONE pass over the explode: broadcast LEFT join marks eval hits,
    # then a single per-doc aggregation counts grams and hits together
    # (a semi-join + second groupBy formulation re-derives the explode)
    marked = grams.join(
        F.broadcast(eval_gram_df.select("gram").withColumn("_hit", F.lit(1))),
        "gram",
        "left",
    )
    per_doc = marked.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_grams"),
        F.sum(F.coalesce("_hit", F.lit(0))).cast("long").alias("n_contaminated"),
    )
    return (
        corpus.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_contaminated", F.lit(0)).cast("long").alias("n_contaminated"),
            (F.coalesce("n_contaminated", F.lit(0)) == 0).cast("int").alias("keep"),
        )
    )


def semantic_contamination(
    corpus: DataFrame,
    eval_df: DataFrame,
    threshold: float,
    c_id: str = "vec_id",
    c_vec: str = "embedding",
    e_id: str = "eval_id",
    e_vec: str = "vec",
) -> DataFrame:
    """Embedding-level decontamination: flag every corpus vector whose
    cosine similarity to ANY eval/benchmark vector reaches
    ``threshold`` (the semantic sibling of the 13-gram lexical gate —
    catches paraphrased/reformatted test data that shares no 13-gram
    with the benchmark; the n-gram policy is blind to those).

    Returns one row per corpus vector:
    ``(c_id, nearest_eval_id, max_cosine, contaminated)`` — the full
    audit view, not just the flagged slice, so the keep-list AND the
    near-miss margin are both inspectable.

    Scale shape — the decisive structural fact is that the eval side
    is benchmark-sized while the corpus is 100 TB, so the ONLY sane
    plan is a broadcast of the packed eval set and a single corpus
    scan with ZERO shuffles:

    * eval vectors (+ precomputed norms) are packed into ONE row via
      ``collect_list(struct(...))`` and broadcast;
    * each corpus row folds over that array with JVM higher-order
      functions — ``transform`` builds (cosine, -eval_id) candidate
      structs, ``array_max`` takes the lexicographic max, giving the
      argmax with min-eval-id tie-break in one pass, no explode, no
      groupBy, no window;
    * nothing data-sized is collected or shuffled — the output is a
      pure projection of the corpus scan.

    Cosine matches the q53 oracle formulation bit-for-bit: double
    left-fold dot / (safe_denom(norm) product), rounded to 4 decimals
    BEFORE the argmax and the threshold compare, so ranking and
    flagging agree with any engine replaying the same arithmetic.
    """
    from ml_with_spark_streaming_spark.operators.similarity import (
        dot_expr,
        norm_expr,
        safe_denom,
    )

    ev = eval_df.select(
        F.col(e_id).cast("long").alias("eval_id"), F.col(e_vec).alias("vec")
    ).withColumn("norm", norm_expr(F.col("vec")))
    packed = ev.agg(F.collect_list(F.struct("eval_id", "vec", "norm")).alias("evals"))

    cn = corpus.withColumn("_cn", norm_expr(F.col(c_vec)))
    joined = cn.crossJoin(F.broadcast(packed))

    def _cand(e: Column) -> Column:
        cos = F.round(
            dot_expr(F.col(c_vec), e["vec"])
            / (safe_denom(F.col("_cn")) * safe_denom(e["norm"])),
            4,
        )
        return F.struct(cos.alias("cos"), (-e["eval_id"]).alias("nid"))

    best = F.array_max(F.transform(F.col("evals"), _cand))
    return joined.select(
        F.col(c_id),
        (-best["nid"]).alias("nearest_eval_id"),
        best["cos"].alias("max_cosine"),
        (best["cos"] >= F.lit(threshold)).cast("long").alias("contaminated"),
    )


def tagged_eval_ngrams(
    benchmarks: dict[str, DataFrame],
    text_col: str = "text",
    n: int = DEFAULT_NGRAM,
) -> DataFrame:
    """One row per DISTINCT gram across a REGISTRY of benchmarks, with
    a 0/1 flag column per benchmark (``hit_<name>``) — a gram shared
    by several benchmarks carries several flags, so the corpus pass
    below stays a single broadcast join however many benchmarks are
    registered. Benchmark-sized (the union of eval gram sets).

    Registry names become column suffixes (``hit_<name>``) and are
    later spliced into ``F.col`` expressions, so they are validated up
    front: the registry must be non-empty and every name must match
    ``[A-Za-z0-9_]+`` (a dot or backtick in a name would otherwise
    resolve to the wrong column silently)."""
    _validate_registry(benchmarks)
    tagged = None
    for name, df in benchmarks.items():
        t = eval_ngrams(df, text_col=text_col, n=n).withColumn(
            "_bench", F.lit(name)
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    return tagged.groupBy("gram").agg(
        *[
            F.max((F.col("_bench") == name).cast("int")).alias(f"hit_{name}")
            for name in benchmarks
        ]
    )


def multi_contamination_counts(
    corpus: DataFrame,
    tagged_gram_df: DataFrame,
    bench_names: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = DEFAULT_NGRAM,
) -> DataFrame:
    """Per-document contamination profile against EVERY registered
    benchmark in one corpus pass: ``(id_col, n_grams,
    n_hit_<bench>..., n_benchmarks_hit, keep)``. The corpus explode
    runs ONCE regardless of registry size; each benchmark adds one
    conditional sum to the same aggregation (the q101 shape,
    vectorized across the registry)."""
    _validate_registry(bench_names)
    grams = _doc_ngrams(corpus, text_col, id_col, n)
    marked = grams.join(F.broadcast(tagged_gram_df), "gram", "left")
    aggs = [F.count("*").cast("long").alias("n_grams")] + [
        F.sum(F.coalesce(f"hit_{b}", F.lit(0))).cast("long").alias(f"n_hit_{b}")
        for b in bench_names
    ]
    per_doc = marked.groupBy(id_col).agg(*aggs)
    hit_any = sum(
        (F.coalesce(f"n_hit_{b}", F.lit(0)) > 0).cast("long") for b in bench_names
    )
    return (
        corpus.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            *[
                F.coalesce(f"n_hit_{b}", F.lit(0)).cast("long").alias(f"n_hit_{b}")
                for b in bench_names
            ],
            hit_any.cast("long").alias("n_benchmarks_hit"),
            (hit_any == 0).cast("int").alias("keep"),
        )
    )
