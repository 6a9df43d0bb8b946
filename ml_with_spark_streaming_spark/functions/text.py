"""Text cleaning + tokenization as composable Column expressions.

Mirrors the reference's cleaning chain (P2–P8, reference:
PAC/passiveAgressiveModel.py:46-52) but as one declarative expression —
Catalyst's CollapseProject folds the regex chain into a single
whole-stage-codegen projection; nothing leaves the JVM.

The only Python-side step in the whole text path is stemming
(reference: PAC/passiveAgressiveModel.py:64-66 used a row-at-a-time
UDF over nltk's SnowballStemmer("english"); here it's an
Arrow-vectorized pandas UDF over the engine's own Porter2/Snowball
implementation — same algorithm as the reference, so stemmed tokens
match a reference replay word-for-word).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ml_with_spark_streaming_spark.functions.snowball import snowball_stem

# Reference regexes, in reference order (PAC/passiveAgressiveModel.py:47-50)
RE_MENTIONS = r"[@#&][A-Za-z0-9-]+"  # strip @mentions / #hashtags / &entities
RE_URLS = r"\w+://\S+"  # strip scheme://… URLs
RE_NON_ALPHA = r"[^A-Za-z]"  # strip digits/punct/emoji
RE_WS = r"\s+"  # collapse whitespace
# The engine fuses the last two reference passes into ONE traversal:
# replacing every [^A-Za-z] char with a space and then collapsing \s+
# runs is, character for character, the same string as replacing each
# maximal [^A-Za-z]+ run with one space (all whitespace at the \s+
# stage came from the previous pass, so every collapsible run IS a
# non-alpha run). Property-checked against the 4-pass form on
# adversarial unicode/URL/mention mixes and on the full sf0.1 corpus
# (round 11; zero mismatches). One fewer regex pass per document in
# every text query; the DuckDB oracle keeps the reference 4-pass SQL.
RE_NON_ALPHA_RUN = r"[^A-Za-z]+"


def clean_text_expr(col: Column | str) -> Column:
    """P3–P8 as one Column: strip mentions/URLs/non-alpha, collapse
    whitespace, lowercase, trim."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, RE_MENTIONS, " ")
    c = F.regexp_replace(c, RE_URLS, " ")
    c = F.regexp_replace(c, RE_NON_ALPHA_RUN, " ")
    return F.trim(F.lower(c))


def tokens_expr(col: Column | str) -> Column:
    """Whitespace tokenization with an empty-string guard (split('')
    yields [''] — we want [])."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.length(c) == 0, F.array().cast("array<string>")).otherwise(F.split(c, " "))


# A small, explicit stop-word list used by the ORACLE-CHECKABLE queries
# (the full pyspark.ml StopWordsRemover default-English list is used in
# the ML pipeline; it can't be mirrored into portable ANSI SQL, so the
# cross-engine queries pin their own list).
STOPWORDS_MINI = (
    "the a an and or of to in on for with at by from is are was were be been it this that".split()
)


def remove_stopwords_expr(tokens: Column | str, stopwords: list[str] | None = None) -> Column:
    """Built-in-functions stop-word removal (JVM-side array filter)."""
    c = F.col(tokens) if isinstance(tokens, str) else tokens
    sw = F.array(*[F.lit(w) for w in (stopwords or STOPWORDS_MINI)])
    return F.filter(c, lambda t: ~F.array_contains(sw, t))


@F.pandas_udf(T.ArrayType(T.StringType()))
def stem_tokens_udf(tokens: pd.Series) -> pd.Series:
    """Arrow-vectorized Snowball (Porter2) stemming over token arrays.

    Replaces the reference's row-at-a-time ``F.udf`` Snowball stemmer
    (PAC/passiveAgressiveModel.py:64-66) — same algorithm, same
    outputs, ~10-100× less serde overhead at scale. A per-word memo
    cache exploits Zipf token distributions: within an Arrow batch most
    tokens repeat, so the stemmer runs once per distinct word.
    """
    cache: dict[str, str] = {}

    def stem(t: str) -> str:
        s = cache.get(t)
        if s is None:
            s = cache[t] = snowball_stem(t)
        return s

    return tokens.map(lambda ts: [stem(t) for t in ts] if ts is not None else None)
