"""Text analysis operators: language-ID, quality scoring, token
counting, fingerprinting.

All pure Column expressions (JVM-side, codegen'd, no Python in the hot
path) — at 100 TB these run inside the parquet scan's projection. Each
has an exact ANSI-SQL mirror so the DuckDB oracle can check it
(plans/text_ml.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ml_with_spark_streaming_spark.functions.text import clean_text_expr, tokens_expr

# BPE-ish word/number/punct token pattern (public GPT-2-style shape,
# simplified to be RE2/Java-regex portable)
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# tiny per-language lexicons for the heuristic language-ID
# (explicit so the oracle SQL can embed the identical lists)
LANG_LEXICONS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "es": ["el", "la", "de", "que", "y", "los", "un", "es"],
    "fr": ["le", "la", "de", "et", "un", "les", "des", "est"],
    "de": ["der", "die", "und", "das", "ist", "ein", "nicht", "mit"],
}
LANG_ORDER = ["en", "es", "fr", "de"]  # deterministic tie-break order


def token_count_expr(text: Column | str) -> Column:
    """BPE-ish token count via regexp_extract_all (JVM-side)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_PATTERN), F.lit(0)))


def whitespace_token_count_expr(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    cleaned = F.trim(c)
    return F.when(F.length(cleaned) == 0, F.lit(0)).otherwise(F.size(F.split(cleaned, r"\s+")))


def char_counts(text: Column | str) -> dict[str, Column]:
    """Character-class counts via length-difference (one codegen'd
    projection, no explode)."""
    c = F.col(text) if isinstance(text, str) else text
    total = F.length(c)
    return {
        "n_chars": total,
        "n_alpha": total - F.length(F.regexp_replace(c, r"[A-Za-z]", "")),
        "n_digit": total - F.length(F.regexp_replace(c, r"[0-9]", "")),
        "n_space": total - F.length(F.regexp_replace(c, r"\s", "")),
        "n_punct": F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", "")),
    }


def exact_round_div(num: Column, den: Column, decimals: int = 4) -> Column:
    """num/den rounded HALF-UP to ``decimals`` via integer arithmetic:
    floor((num·2·10^d + den) / (2·den)) / 10^d. Engine-exact — Spark
    and DuckDB disagree on ROUND(double) when a small-denominator
    rational ties at exactly half an ulp-of-decimal (see
    quality_score_expr); this never rounds a double at all. Requires
    num ≥ 0, den > 0, magnitudes < 2^53 / 2·10^d."""
    scale = 10**decimals
    n, d = num.cast("long"), den.cast("long")
    return F.floor((n * (2 * scale) + d) / (2 * d)) / F.lit(float(scale))


def exact_round_div_sql(num: str, den: str, decimals: int = 4) -> str:
    """The DuckDB twin of exact_round_div, as a SQL fragment."""
    scale = 10**decimals
    return (
        f"FLOOR((CAST({num} AS BIGINT) * {2 * scale} + CAST({den} AS BIGINT)) * 1.0"
        f" / (2 * CAST({den} AS BIGINT))) / {scale}.0"
    )


def quality_score_expr(text: Column | str) -> Column:
    """Deterministic document-quality heuristic in [0,1]:
    0.5·alpha_ratio + 0.3·min(words/50, 1) + 0.2·(1 − punct_ratio).

    Evaluated as ONE exact rational — numerator
    250·n_alpha + 100·(n − n_punct) + 3·min(words,50)·n over 500·n —
    with the 4-decimal HALF-UP rounding done in INTEGER arithmetic:
    floor((num·20000 + den) / (2·den)) / 10⁴. No ROUND(double) ever
    runs, because that's where engines disagree: the weighted-sum form
    hit a .00005 boundary at sf0.1 (terms associate differently:
    0.8282 vs 0.8283), and even single-division doubles still tie when
    the rational is exactly x.xxxx5 (0.7202 vs 0.7203 — Spark rounds
    the exact BigDecimal of the double, DuckDB rounds via ·10⁴).
    All intermediates < 2^53, so the one double division is exact-in,
    correctly-rounded-out and identical everywhere."""
    cc = char_counts(text)
    # long BEFORE multiplying: 500·total etc. overflow 32-bit (ANSI
    # error / silent wrap) on multi-MB documents
    total = cc["n_chars"].cast("long")
    n_alpha = cc["n_alpha"].cast("long")
    n_punct = cc["n_punct"].cast("long")
    wc = whitespace_token_count_expr(text).cast("long")
    wcap = F.least(wc, F.lit(50).cast("long"))
    num = 250 * n_alpha + 100 * (total - n_punct) + 3 * wcap * total
    # empty text: alpha/punct ratios define to 0 → 0.2 + 0.3·0 = 0.2
    return F.when(total > 0, exact_round_div(num, 500 * total)).otherwise(F.lit(0.2))


def lang_hits_expr(tokens: Column, lexicon: list[str]) -> Column:
    lex = F.array(*[F.lit(w) for w in lexicon])
    return F.size(F.filter(tokens, lambda t: F.array_contains(lex, t)))


def lang_id_expr(text: Column | str) -> Column:
    """Heuristic language-ID: argmax of lexicon hits, 'und' when no
    hits, ties broken by LANG_ORDER."""
    toks = tokens_expr(clean_text_expr(text))
    hits = {lang: lang_hits_expr(toks, LANG_LEXICONS[lang]) for lang in LANG_ORDER}
    best = F.greatest(*[hits[lang] for lang in LANG_ORDER])
    expr = F.lit("und")
    # build the when-chain in reverse so earlier languages win ties
    for lang in reversed(LANG_ORDER):
        expr = F.when((best > 0) & (hits[lang] == best), lang).otherwise(expr)
    return expr


ROLL_BASE = 31
ROLL_MOD = 2_147_483_647  # 2^31 - 1: (acc*31 + c) stays far inside int64


def rolling_hash_expr(s: Column, k: int) -> Column:
    """Rabin-Karp polynomial hash of the k-char string ``s``:
    fold h = (h*31 + code(c)) mod (2^31-1), seeded with the first
    char's codepoint (exactly DuckDB's ``list_reduce`` fold shape, so
    the oracle reproduces it bit-for-bit)."""
    init = F.ascii(F.substring(s, 1, 1)).cast("long")
    return F.aggregate(
        F.sequence(F.lit(1), F.lit(k - 1)),
        init,
        lambda acc, j: (acc * ROLL_BASE + F.ascii(F.substring(s, j + 1, 1))) % ROLL_MOD,
    )


def winnowing_fingerprints(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
):
    """MOSS-style winnowing fingerprints (the brief's 'rolling hash'
    fingerprinting): hash every k-char window of the cleaned text,
    then each window of ``w`` consecutive hashes selects its minimum —
    the distinct selected hashes are the doc's fingerprint set.
    Guarantees any shared substring of length ≥ k+w-1 yields a shared
    fingerprint (Schleimer, Wilkerson, Aiken — SIGMOD'03).

    Output: distinct ``(<id_col>, fp)`` rows (two docs sharing any
    substring of length ≥ k+w-1 share ≥1 fp — the near-dup blocking
    key). Docs shorter than k+w-1 chars have no complete window and
    drop out. ``winnowing_summary`` aggregates this to the compact
    oracle-checkable form.

    Plan shape: positions explode (~len rows/doc) behind a
    repartition barrier (CollapseProject would otherwise inline the
    regex clean chain into the per-position projection — the q50
    lesson), window-min partitioned by doc, then one hash-shuffle agg.
    """
    from pyspark.sql import Window as W

    cleaned = df.select(F.col(id_col), clean_text_expr(text_col).alias("_c"))
    # docs shorter than k have no complete window; without this filter
    # Spark's sequence(1, len-k+1) would DESCEND ([1, 0] — default
    # step -1 when start > stop) and hash out-of-range substrings the
    # oracle's empty generate_series(1, 0) never produces
    cleaned = cleaned.filter(F.length("_c") >= k).repartition(id_col)
    pos = cleaned.select(
        F.col(id_col),
        F.col("_c"),
        F.explode(F.sequence(F.lit(1), F.length("_c") - (k - 1))).alias("i"),
    )
    hashed = pos.select(
        F.col(id_col), "i", rolling_hash_expr(F.substring(F.col("_c"), F.col("i"), k), k).alias("h")
    )
    win = W.partitionBy(id_col).orderBy("i").rowsBetween(-(w - 1), 0)
    return (
        hashed.withColumn("fp", F.min("h").over(win))
        .filter(F.col("i") >= w)
        .select(id_col, "fp")
        .distinct()
    )


def winnowing_summary(df, text_col: str = "text", id_col: str = "doc_id", k: int = 8, w: int = 4):
    """Per-doc fingerprint-set summary (count/min/max/sum over the
    distinct set) — compact, order-free, oracle-checkable."""
    fps = winnowing_fingerprints(df, text_col, id_col, k, w)
    return fps.groupBy(id_col).agg(
        F.count("*").alias("n_fp"),
        F.min("fp").alias("fp_min"),
        F.max("fp").alias("fp_max"),
        F.sum("fp").alias("fp_sum"),
    )


def fingerprint_expr(text: Column | str, prefix_tokens: int = 8) -> Column:
    """Document fingerprint: md5 of the first-k cleaned tokens.

    md5 (not xxhash64) so the oracle SQL can reproduce it exactly;
    the normalized-prefix trick makes it a cheap near-dup blocking key.
    """
    toks = tokens_expr(clean_text_expr(text))
    prefix = F.concat_ws(" ", F.slice(toks, 1, prefix_tokens))
    return F.md5(F.encode(prefix, "UTF-8"))


def char_bigram_entropy(df, text_col: str, id_col: str):
    """Per-document character-bigram Shannon entropy in micro-nats —
    the information-theoretic repetition signal (low entropy = template
    soup / repeated boilerplate; a cleaner cousin of q91's dup-bigram
    ratio). H = ln(n) − (Σ c·ln(c))/n over the doc's bigram counts,
    computed ENGINE-EXACTLY: both ln's ride the sqrt-constructed
    correctly-rounded ``ln_x1e6_sql`` (arguments are integer counts
    ≥ 1), the division is floor division on positive BIGINTs.

    Scale shape: the corpus-sized work is one (doc, bigram)-keyed
    map-side-combinable count groupBy and one per-doc sum. The ~300-op
    ln chain runs only on the DISTINCT integer count values (bounded
    by max doc length, not by corpus size) and broadcast-joins back —
    the q130/q131 trick of keeping exact-ln work off the data spine.

    int64 bounds: Σ c·ln6(c) ≤ n·ln6(n) — safe to n ≈ 4e11 chars/doc.

    Returns ``(id_col, n_bigrams, entropy_x1e6)`` for docs with ≥ 1
    bigram.
    """
    from pyspark.sql import DataFrame  # noqa: F401
    from ml_with_spark_streaming_spark.lineage import maybe_checkpoint
    from ml_with_spark_streaming_spark.operators.retrieval import ln_x1e6_sql

    # filter BEFORE sequence(): Spark's sequence(1, 0) would generate a
    # DESCENDING [1, 0], not an empty array
    grams = df.filter(F.length(text_col) >= 2).selectExpr(
        id_col,
        f"explode(transform(sequence(1, length({text_col}) - 1),"
        f" i -> substring({text_col}, i, 2))) AS bg",
    )
    cnt = maybe_checkpoint(
        grams.groupBy(id_col, "bg").agg(F.count("*").cast("long").alias("c"))
    )
    # exact-ln lookup over DISTINCT count values only
    ln_c = cnt.select("c").distinct().selectExpr(
        "c", ln_x1e6_sql("CAST(c AS DOUBLE)") + " AS ln6_c"
    )
    per_doc = (
        cnt.join(F.broadcast(ln_c), "c")
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("long").alias("n_bigrams"),
            F.sum(F.col("c") * F.col("ln6_c")).cast("long").alias("s"),
        )
    )
    ln_n = per_doc.select(F.col("n_bigrams").alias("n")).distinct().selectExpr(
        "n", ln_x1e6_sql("CAST(n AS DOUBLE)") + " AS ln6_n"
    )
    return (
        per_doc.join(F.broadcast(ln_n), per_doc["n_bigrams"] == ln_n["n"])
        .selectExpr(
            id_col,
            "n_bigrams",
            "CAST(ln6_n - (s DIV n_bigrams) AS BIGINT) AS entropy_x1e6",
        )
    )


# --- UTF-8 hygiene / normalization (mojibake, control chars, zero-width) ---

# Pattern syntax chosen for the java.util.regex (Spark) ∩ RE2 (DuckDB)
# common subset: two-digit \xNN escapes for the control range (a raw
# NUL would break the SQL text), LITERAL characters for the
# supplementary-plane classes (\uXXXX vs \x{...} syntax differs
# between the engines, the literal codepoint doesn't).
# C0 controls minus \t\n\r, plus DEL.
CTRL_CLASS = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"
ZW_CLASS = "[​‌‍﻿]"   # zero-width space/joiners, BOM
REPL_CHAR = "�"                       # UTF-8 decode damage marker
NBSP = " "


def _count_class(c: Column, klass: str) -> Column:
    return (F.length(c) - F.length(F.regexp_replace(c, klass, ""))).cast("long")


def normalize_text_expr(text: Column | str) -> Column:
    """Transmission-damage cleanup, content-preserving: control and
    zero-width characters and U+FFFD replacement markers are removed,
    NBSP becomes a regular space. Unlike the reference's P3-P8 chain
    (clean_text_expr — an aggressive featurizer), this is the
    idempotent hygiene pass a corpus runs BEFORE storage. One codegen
    projection."""
    c = F.col(text) if isinstance(text, str) else text
    c = F.regexp_replace(c, CTRL_CLASS, "")
    c = F.regexp_replace(c, ZW_CLASS, "")
    c = F.regexp_replace(c, REPL_CHAR, "")
    return F.regexp_replace(c, NBSP, " ")


def hygiene_counts(text: Column | str) -> dict[str, Column]:
    """Per-document damage tallies (length-difference trick — no
    explode, stays in the scan projection)."""
    c = F.col(text) if isinstance(text, str) else text
    return {
        "n_ctrl": _count_class(c, CTRL_CLASS),
        "n_zw": _count_class(c, ZW_CLASS),
        "n_repl": _count_class(c, REPL_CHAR),
        "n_nbsp": _count_class(c, NBSP),
    }
