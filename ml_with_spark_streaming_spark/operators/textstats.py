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


def quality_score_expr(text: Column | str) -> Column:
    """Deterministic document-quality heuristic in [0,1]:
    rewards alphabetic mass and mid-length docs, penalizes punctuation
    soup. All integer-derived arithmetic → bit-identical across
    engines."""
    cc = char_counts(text)
    total = cc["n_chars"]
    alpha_ratio = F.when(total > 0, cc["n_alpha"] / total).otherwise(F.lit(0.0))
    punct_ratio = F.when(total > 0, cc["n_punct"] / total).otherwise(F.lit(0.0))
    wc = whitespace_token_count_expr(text)
    len_score = F.least(wc / F.lit(50.0), F.lit(1.0))
    return F.round(0.5 * alpha_ratio + 0.3 * len_score + 0.2 * (1.0 - punct_ratio), 4)


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


def fingerprint_expr(text: Column | str, prefix_tokens: int = 8) -> Column:
    """Document fingerprint: md5 of the first-k cleaned tokens.

    md5 (not xxhash64) so the oracle SQL can reproduce it exactly;
    the normalized-prefix trick makes it a cheap near-dup blocking key.
    """
    toks = tokens_expr(clean_text_expr(text))
    prefix = F.concat_ws(" ", F.slice(toks, 1, prefix_tokens))
    return F.md5(F.encode(prefix, "UTF-8"))
