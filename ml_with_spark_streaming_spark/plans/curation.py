"""Training-data curation queries: dedup clustering (connected
components over verified near-dup pairs), Gopher-style repetition /
quality signals, and PII detection + redaction.

These extend the fuzzy-dedup stages in ``plans/llm_ops.py`` to the
operations a 100 TB pretraining pipeline actually ships: a per-cluster
keep-list (q90), per-document repetition filters (q91 — the
"repetition" family of Gopher/MassiveText quality rules, Rae et al.
2021, arXiv:2112.11446), and PII scrubbing (q92 — regex classes over
text, as in public Common Crawl / BigScience pipelines).

Oracle notes: every ratio is surfaced via exact integer HALF-UP
rounding (``exact_round_div``) — no ROUND(double) crosses the engine
boundary; counts are BIGINT on both sides; booleans are surfaced as
INT (driver comparator treats bool/None canon inconsistently).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ml_with_spark_streaming_spark.operators.dedup import (
    jaccard_verify,
    minhash_candidates,
    shingles_expr,
)
from ml_with_spark_streaming_spark.operators.graph import connected_components
from ml_with_spark_streaming_spark.operators.textstats import (
    exact_round_div,
    exact_round_div_sql,
)
from ml_with_spark_streaming_spark.functions.text import clean_text_expr, tokens_expr
from ml_with_spark_streaming_spark.lineage import maybe_checkpoint
from ml_with_spark_streaming_spark.plans.registry import query
from ml_with_spark_streaming_spark.plans.text_ml import CLEAN_SQL, QUALITY_TABLE_SQL
from ml_with_spark_streaming_spark.sources.batch import load_table

# ---------------------------------------------------------------------------
# q90 — near-dup clusters: LSH candidates → exact-Jaccard verify →
# connected components → canonical keep-list
# ---------------------------------------------------------------------------

# The candidate/verify CTEs mirror Q58_SQL (same salted-md5 MinHash, so
# DuckDB reproduces the pair set bit-for-bit); the component step is a
# recursive min-label walk — bounded because verified clusters at
# threshold 0.9 are tiny (largest component 3 at sf0.01). The chain is
# a module constant so the composed pipeline (q93) reuses it verbatim.
_DEDUP_COMPONENT_CTES = f"""toks AS (
  SELECT doc_id, string_split({CLEAN_SQL}, ' ') AS t
  FROM documents WHERE length({CLEAN_SQL}) > 0
),
sh AS (
  SELECT doc_id,
         list_transform(generate_series(1, greatest(len(t) - 2, 0)),
                        i -> array_to_string(t[i:i+2], ' ')) AS s
  FROM toks
),
shf AS (SELECT doc_id, s FROM sh WHERE len(s) > 0),
sig AS (
  SELECT doc_id,
         list_transform(generate_series(0, 15),
                        i -> list_min(list_transform(s, x -> substr(md5(x || '#' || CAST(i // 4 AS VARCHAR)), (i % 4) * 8 + 1, 8)))) AS sg
  FROM shf
),
bands AS (
  SELECT doc_id, j AS band_idx,
         md5(array_to_string(sg[j*4+1:j*4+4], '|')) AS band_hash
  FROM sig, UNNEST([0, 1, 2, 3]) AS t(j)
),
cand AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2
  FROM bands a
  JOIN bands b ON a.band_hash = b.band_hash AND a.band_idx = b.band_idx AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
tsets AS (
  SELECT doc_id, list_distinct(list_filter(string_split({CLEAN_SQL}, ' '), x -> x <> '')) AS ts
  FROM documents
),
edges AS (
  SELECT c.id1, c.id2
  FROM cand c
  JOIN tsets a ON a.doc_id = c.id1
  JOIN tsets b ON b.doc_id = c.id2
  WHERE ROUND(len(list_intersect(a.ts, b.ts)) * 1.0 /
              (len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts))), 4) >= 0.9
),
sym AS (
  SELECT id1 AS a, id2 AS b FROM edges
  UNION
  SELECT id2 AS a, id1 AS b FROM edges
),
walk(id, label) AS (
  SELECT a, a FROM sym
  UNION
  SELECT s.b, w.label FROM walk w JOIN sym s ON s.a = w.id
),
comp AS (SELECT id, MIN(label) AS component FROM walk GROUP BY id),
assigned AS (
  SELECT d.doc_id, CAST(COALESCE(c.component, d.doc_id) AS BIGINT) AS component
  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
)"""

Q90_SQL = f"""
WITH RECURSIVE {_DEDUP_COMPONENT_CTES},
sizes AS (SELECT component, CAST(COUNT(*) AS BIGINT) AS cluster_size FROM assigned GROUP BY component)
SELECT a.doc_id, a.component, s.cluster_size,
       CAST(CASE WHEN a.doc_id = a.component THEN 1 ELSE 0 END AS BIGINT) AS is_canonical
FROM assigned a JOIN sizes s ON s.component = a.component
ORDER BY a.doc_id
"""


def dedup_components(d: DataFrame) -> DataFrame:
    """(doc_id, component) for EVERY document: LSH candidates →
    exact-Jaccard verify (≥0.9) → connected components; docs outside
    any cluster are singletons via LEFT JOIN + COALESCE — never
    materialized as edges."""
    cands = minhash_candidates(d, "text", "doc_id", k=16, bands=4)
    edges = jaccard_verify(cands, d, "text", "doc_id", threshold=0.9).select("id1", "id2")
    comp = connected_components(edges).withColumnRenamed("id", "doc_id")
    return (
        d.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).cast("long").alias("component"),
        )
    )


@query("q90_dedup_clusters", Q90_SQL)
def q90_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster assignment: the fuzzy-dedup ENDGAME. Every
    doc labeled with its cluster representative (min doc_id), cluster
    size, and a keep-list flag (is_canonical).

    Scale: candidate/verify stages are the q58 pipeline (O(n·sig) +
    O(candidates)); components converge in O(cluster diameter) join
    rounds (see operators/graph.py).
    """
    d = load_table(spark, sf_dir, "documents")
    assigned = dedup_components(d)
    sizes = assigned.groupBy("component").agg(F.count("*").cast("long").alias("cluster_size"))
    return (
        assigned.join(sizes, "component")
        .select(
            "doc_id",
            "component",
            "cluster_size",
            (F.col("doc_id") == F.col("component")).cast("long").alias("is_canonical"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q91 — repetition / lexical-diversity signals (Gopher-style rules)
# ---------------------------------------------------------------------------

Q91_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split({CLEAN_SQL}, ' ') AS t
  FROM documents WHERE length({CLEAN_SQL}) > 0
),
tok AS (SELECT doc_id, unnest(t) AS tk FROM toks),
tc AS (SELECT doc_id, tk, COUNT(*) AS c FROM tok GROUP BY 1, 2),
ts AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_types,
         CAST(MAX(c) AS BIGINT) AS top_c
  FROM tc GROUP BY 1
),
bg AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, greatest(len(t) - 1, 0)),
                               i -> array_to_string(t[i:i+1], ' '))) AS b
  FROM toks
),
bc AS (SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY 1, 2),
bs AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
         CAST(COUNT(*) AS BIGINT) AS n_distinct_bigrams
  FROM bc GROUP BY 1
)
SELECT d.doc_id,
  CAST(COALESCE(ts.n_tokens, 0) AS BIGINT) AS n_tokens,
  CAST(COALESCE(ts.n_types, 0) AS BIGINT) AS n_types,
  CASE WHEN ts.n_tokens IS NULL THEN 0.0
       ELSE {exact_round_div_sql("ts.top_c", "ts.n_tokens")} END AS top_token_frac,
  CASE WHEN ts.n_tokens IS NULL THEN 0.0
       ELSE {exact_round_div_sql("ts.n_types", "ts.n_tokens")} END AS type_token_ratio,
  CASE WHEN bs.n_bigrams IS NULL OR bs.n_bigrams = 0 THEN 0.0
       ELSE {exact_round_div_sql("bs.n_bigrams - bs.n_distinct_bigrams", "bs.n_bigrams")} END AS dup_bigram_frac
FROM documents d
LEFT JOIN ts ON ts.doc_id = d.doc_id
LEFT JOIN bs ON bs.doc_id = d.doc_id
ORDER BY d.doc_id
"""


def repetition_signals(d: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc repetition signals used by MassiveText/Gopher-style
    quality filters: top-token fraction, type-token ratio, duplicate
    2-gram fraction.

    Scale: one tokenize pass behind a repartition(id) barrier (the
    CollapseProject-into-Generate trap — see operators/dedup.py), then
    two explode→groupBy chains keyed by id; every aggregate combines
    map-side. Ratios via exact integer rounding, so the output carries
    no engine-divergent ROUND(double).
    """
    base = d.select(
        F.col(id_col), tokens_expr(clean_text_expr(text_col)).alias("toks")
    ).repartition(id_col)

    # ONE explode carries both gram kinds (0 = unigram, 1 = bigram) —
    # separate token/bigram explodes each push a different size-filter
    # into their scan branch, which defeats ReuseExchange and runs the
    # tokenize pass twice (measured: 3 scans → 2, one id-only).
    tagged = F.concat(
        F.transform(F.col("toks"), lambda t: F.struct(F.lit(0).alias("kind"), t.alias("v"))),
        F.transform(
            shingles_expr(F.col("toks"), 2),
            lambda b: F.struct(F.lit(1).alias("kind"), b.alias("v")),
        ),
    )
    counts = (
        base.select(id_col, F.explode(tagged).alias("it"))
        .groupBy(id_col, F.col("it.kind").alias("kind"), F.col("it.v").alias("v"))
        .agg(F.count("*").alias("c"))
    )
    kind_stats = counts.groupBy(id_col, "kind").agg(
        F.sum("c").alias("n"), F.count("*").alias("nd"), F.max("c").alias("top")
    )
    per_doc = kind_stats.groupBy(id_col).agg(
        F.max(F.when(F.col("kind") == 0, F.col("n"))).cast("long").alias("n_tokens"),
        F.max(F.when(F.col("kind") == 0, F.col("nd"))).cast("long").alias("n_types"),
        F.max(F.when(F.col("kind") == 0, F.col("top"))).cast("long").alias("top_c"),
        F.max(F.when(F.col("kind") == 1, F.col("n"))).cast("long").alias("n_bigrams"),
        F.max(F.when(F.col("kind") == 1, F.col("nd"))).cast("long").alias("n_distinct_bigrams"),
    )

    zero = F.lit(0.0)
    return (
        d.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("n_types", F.lit(0)).cast("long").alias("n_types"),
            F.when(F.col("n_tokens").isNull(), zero)
            .otherwise(exact_round_div(F.col("top_c"), F.col("n_tokens")))
            .alias("top_token_frac"),
            F.when(F.col("n_tokens").isNull(), zero)
            .otherwise(exact_round_div(F.col("n_types"), F.col("n_tokens")))
            .alias("type_token_ratio"),
            F.when(F.col("n_bigrams").isNull() | (F.col("n_bigrams") == 0), zero)
            .otherwise(
                exact_round_div(
                    F.col("n_bigrams") - F.col("n_distinct_bigrams"), F.col("n_bigrams")
                )
            )
            .alias("dup_bigram_frac"),
        )
    )


@query("q91_repetition_signals", Q91_SQL)
def q91_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters over the documents table — see
    repetition_signals for the plan shape and scale notes."""
    d = load_table(spark, sf_dir, "documents")
    return repetition_signals(d, "text", "doc_id").orderBy("doc_id")


# ---------------------------------------------------------------------------
# q92 — PII detection + redaction
# ---------------------------------------------------------------------------

# The slim TPC-H testdata carries no free-text PII columns, so the
# query synthesizes a deterministic per-customer profile string (same
# pattern as the multimodal asset synthesis in operators/multimodal.py)
# and then runs the REAL detection/redaction machinery over it. The
# patterns stay in the RE2 ∩ java.util.regex common subset so both
# engines compile them identically.
_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_IP_RE = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"
_PHONE_RE = r"555-[0-9]{4}"

_PROFILE_SQL = (
    "'contact ' || c_name || ' <' || replace(lower(c_name), '#', '') || '@example.com>'"
    " || CASE WHEN c_custkey % 3 = 0"
    "         THEN ' cc ops-' || CAST(c_custkey % 7 AS VARCHAR) || '@example.org' ELSE '' END"
    " || ' from host 10.' || CAST(c_custkey % 200 AS VARCHAR)"
    " || '.' || CAST((c_custkey // 3) % 250 AS VARCHAR)"
    " || '.' || CAST(c_custkey % 250 AS VARCHAR)"
    " || CASE WHEN c_custkey % 2 = 0"
    "         THEN ' phone 555-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') ELSE '' END"
)

Q92_SQL = f"""
WITH profiles AS (
  SELECT c_custkey, {_PROFILE_SQL} AS profile FROM customer
)
SELECT c_custkey,
  CAST(len(regexp_extract_all(profile, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(profile, '{_IP_RE}')) AS BIGINT)    AS n_ips,
  CAST(len(regexp_extract_all(profile, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
  md5(regexp_replace(regexp_replace(regexp_replace(profile,
      '{_EMAIL_RE}', '<EMAIL>', 'g'),
      '{_IP_RE}', '<IP>', 'g'),
      '{_PHONE_RE}', '<PHONE>', 'g')) AS redacted_md5
FROM profiles
ORDER BY c_custkey
"""


def pii_signals(df: DataFrame, text_col: str) -> DataFrame:
    """Append PII counts + a fully-redacted text column.

    One codegen projection — regex scans parallelize embarrassingly
    and scale linearly with input bytes; the redaction order (emails →
    IPs → phones) is fixed so patterns can't partially overlap."""
    c = F.col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(c, _EMAIL_RE, "<EMAIL>"),
            _IP_RE,
            "<IP>",
        ),
        _PHONE_RE,
        "<PHONE>",
    )
    return df.select(
        "*",
        F.size(F.regexp_extract_all(c, F.lit(_EMAIL_RE), F.lit(0))).cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all(c, F.lit(_IP_RE), F.lit(0))).cast("long").alias("n_ips"),
        F.size(F.regexp_extract_all(c, F.lit(_PHONE_RE), F.lit(0))).cast("long").alias("n_phones"),
        redacted.alias("_redacted"),
    )


@query("q92_pii_scrub", Q92_SQL)
def q92_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction over synthesized customer profiles:
    email / IPv4 / phone counts and an md5 of the redacted text (the
    hash pins the exact redacted bytes cross-engine without shipping
    the full string through the comparator)."""
    c = load_table(spark, sf_dir, "customer")
    key = F.col("c_custkey")
    profile = F.concat(
        F.lit("contact "),
        F.col("c_name"),
        F.lit(" <"),
        F.regexp_replace(F.lower("c_name"), "#", ""),
        F.lit("@example.com>"),
        F.when(
            key % 3 == 0,
            F.concat(F.lit(" cc ops-"), (key % 7).cast("string"), F.lit("@example.org")),
        ).otherwise(F.lit("")),
        F.lit(" from host 10."),
        (key % 200).cast("string"),
        F.lit("."),
        ((key / 3).cast("long") % 250).cast("string"),
        F.lit("."),
        (key % 250).cast("string"),
        F.when(
            key % 2 == 0,
            F.concat(
                F.lit(" phone 555-"),
                F.lpad((key % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
    )
    profiles = c.select("c_custkey", profile.alias("profile"))
    return (
        pii_signals(profiles, "profile")
        .select(
            "c_custkey",
            "n_emails",
            "n_ips",
            "n_phones",
            F.md5(F.col("_redacted")).alias("redacted_md5"),
        )
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# q93 — the composed curation pipeline: quality × repetition × dedup
# ---------------------------------------------------------------------------

# qc/qual — the q45 exact-rational quality heuristic as CTEs; shared by
# q93 (heuristic gate) and q112/q113 (weak labels for the classifier)
_QUAL_CTES = f"""qc AS (
  SELECT doc_id,
         length(text) AS n,
         length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS na,
         length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS np,
         least(CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(text), '\\s+')) END, 50) AS wcap
  FROM documents
),
qual AS (
  SELECT doc_id,
         CASE WHEN n > 0
              THEN {exact_round_div_sql('250 * na + 100 * (n - np) + 3 * wcap * n', '500 * n')}
              ELSE 0.2 END AS quality
  FROM qc
)"""

# rtok…rbs — the q91 duplicate-bigram fraction inputs; shared by q93/q113
_REP_CTES = """rtok AS (SELECT doc_id, unnest(t) AS tk FROM toks),
rtc AS (SELECT doc_id, tk, COUNT(*) AS c FROM rtok GROUP BY 1, 2),
rbg AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, greatest(len(t) - 1, 0)),
                               i -> array_to_string(t[i:i+1], ' '))) AS b
  FROM toks
),
rbc AS (SELECT doc_id, b, COUNT(*) AS c FROM rbg GROUP BY 1, 2),
rbs AS (SELECT doc_id, SUM(c) AS n_bigrams, COUNT(*) AS n_distinct FROM rbc GROUP BY 1)"""

Q93_SQL = f"""
WITH RECURSIVE {_DEDUP_COMPONENT_CTES},
{_QUAL_CTES},
{_REP_CTES},
flags AS (
  SELECT d.doc_id, d.lang, d.source,
         CASE WHEN a.doc_id = a.component THEN 1 ELSE 0 END AS canonical,
         CASE WHEN q.quality >= 0.5 THEN 1 ELSE 0 END AS quality_ok,
         CASE WHEN rbs.n_bigrams IS NULL OR rbs.n_bigrams = 0 THEN 1
              WHEN {exact_round_div_sql('rbs.n_bigrams - rbs.n_distinct', 'rbs.n_bigrams')} <= 0.2 THEN 1
              ELSE 0 END AS rep_ok
  FROM documents d
  JOIN assigned a ON a.doc_id = d.doc_id
  JOIN qual q ON q.doc_id = d.doc_id
  LEFT JOIN rbs ON rbs.doc_id = d.doc_id
)
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(canonical) AS BIGINT) AS n_canonical,
       CAST(SUM(quality_ok) AS BIGINT) AS n_quality_ok,
       CAST(SUM(rep_ok) AS BIGINT) AS n_rep_ok,
       CAST(SUM(canonical * quality_ok * rep_ok) AS BIGINT) AS n_kept,
       {exact_round_div_sql('SUM(canonical * quality_ok * rep_ok)', 'COUNT(*)')} AS keep_frac
FROM flags
GROUP BY lang, source
ORDER BY lang, source
"""


@query("q93_curation_pipeline", Q93_SQL)
def q93_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The assembled keep-list pipeline a pretraining corpus build
    runs: per-(lang, source) counts of documents surviving each
    curation gate — dedup canonicality (q90), quality score ≥ 0.5
    (q45), duplicate-bigram fraction ≤ 0.2 (q91) — and the combined
    keep rate.

    Composition only: every stage is the already-oracled operator;
    this query pins that they compose without re-deriving each other's
    inputs (the tokenize pass feeds dedup and repetition from one
    lineage)."""
    from ml_with_spark_streaming_spark.operators.textstats import quality_score_expr

    d = load_table(spark, sf_dir, "documents")
    assigned = dedup_components(d)
    rep = repetition_signals(d, "text", "doc_id").select("doc_id", "dup_bigram_frac")
    flags = (
        # quality is a pure projection — computed inline with the
        # metadata scan rather than as a separate scan + join
        d.select(
            "doc_id", "lang", "source", quality_score_expr("text").alias("quality")
        )
        .join(assigned, "doc_id")
        .join(rep, "doc_id")
        .select(
            "lang",
            "source",
            (F.col("doc_id") == F.col("component")).cast("int").alias("canonical"),
            (F.col("quality") >= 0.5).cast("int").alias("quality_ok"),
            (F.col("dup_bigram_frac") <= 0.2).cast("int").alias("rep_ok"),
        )
    )
    return (
        flags.groupBy("lang", "source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("canonical").cast("long").alias("n_canonical"),
            F.sum("quality_ok").cast("long").alias("n_quality_ok"),
            F.sum("rep_ok").cast("long").alias("n_rep_ok"),
            F.sum(F.col("canonical") * F.col("quality_ok") * F.col("rep_ok"))
            .cast("long")
            .alias("n_kept"),
        )
        .select(
            "lang",
            "source",
            "n_docs",
            "n_canonical",
            "n_quality_ok",
            "n_rep_ok",
            "n_kept",
            exact_round_div(F.col("n_kept"), F.col("n_docs")).alias("keep_frac"),
        )
        .orderBy("lang", "source")
    )


# ---------------------------------------------------------------------------
# q98 — sequence packing: concat-and-chunk token offsets
# ---------------------------------------------------------------------------

_CTX = 2048  # training context length (tokens per packed sequence)
_BUCKET = 256  # docs per prefix-sum bucket (scale knob, see docstring)

def _pack_from_counts(nt: DataFrame) -> DataFrame:
    """The two-phase-prefix-sum packing core, shared by q98 (whitespace
    counts) and q103 (real BPE counts): ``nt`` must carry
    ``(doc_id, n_tokens, _b)`` and SHOULD already be checkpointed so
    the bucket-totals branch and the offset join don't re-derive the
    count column (expensive for the BPE variant)."""
    bucket_sums = nt.groupBy("_b").agg(F.sum("n_tokens").alias("_bsum"))
    w_prev = W.orderBy("_b").rowsBetween(W.unboundedPreceding, -1)
    offsets = bucket_sums.select(
        "_b", F.coalesce(F.sum("_bsum").over(w_prev), F.lit(0)).alias("_boff")
    )
    w_in = W.partitionBy("_b").orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0)
    cum = nt.join(F.broadcast(offsets), "_b").select(
        "doc_id",
        "n_tokens",
        (F.col("_boff") + F.sum("n_tokens").over(w_in)).alias("cum"),
    )
    ctx = F.lit(_CTX)
    return cum.select(
        "doc_id",
        "n_tokens",
        F.col("cum").cast("long").alias("cum_tokens"),
        F.when(F.col("n_tokens") == 0, F.lit(None).cast("long"))
        .otherwise(F.floor((F.col("cum") - F.col("n_tokens")) / ctx))
        .alias("chunk_first"),
        F.when(F.col("n_tokens") == 0, F.lit(None).cast("long"))
        .otherwise(F.floor((F.col("cum") - 1) / ctx))
        .alias("chunk_last"),
    ).orderBy("doc_id")


Q98_SQL = f"""
WITH nt AS (
  SELECT doc_id,
         CASE WHEN length({CLEAN_SQL}) = 0 THEN 0
              ELSE len(string_split({CLEAN_SQL}, ' ')) END AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM nt
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(cum AS BIGINT) AS cum_tokens,
       CASE WHEN n_tokens = 0 THEN NULL
            ELSE CAST((cum - n_tokens) // {_CTX} AS BIGINT) END AS chunk_first,
       CASE WHEN n_tokens = 0 THEN NULL
            ELSE CAST((cum - 1) // {_CTX} AS BIGINT) END AS chunk_last
FROM c
ORDER BY doc_id
"""


@query("q98_sequence_packing", Q98_SQL)
def q98_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style concat-and-chunk packing: documents laid end-to-end in
    doc_id order, each assigned its [chunk_first, chunk_last] span of
    fixed-length training sequences (ctx=2048 whitespace tokens).

    The global running sum is computed as a TWO-PHASE distributed
    prefix sum — per-bucket token totals, a tiny bucket-offset window
    (n/256 rows), then within-bucket running sums — because a naive
    ``SUM() OVER (ORDER BY doc_id)`` with no PARTITION BY drags every
    row through ONE partition. The oracle uses the naive global window
    (DuckDB is single-node anyway); results are exactly equal —
    integer arithmetic, same total order. At 100 TB the bucket width
    is the knob: buckets must be numerous enough to spread the
    within-bucket windows, few enough that the offset table stays
    driver-trivial (1e9 docs / 1e5-doc buckets = 1e4 offset rows).
    """
    from ml_with_spark_streaming_spark.operators.textstats import (
        whitespace_token_count_expr,
    )

    d = load_table(spark, sf_dir, "documents")
    # one corpus scan: checkpoint the 24-byte/doc length table so the
    # bucket-totals branch and the offset join don't each re-tokenize
    # the full text column (the DupFactScan lint)
    nt = d.select(
        "doc_id",
        whitespace_token_count_expr(clean_text_expr("text")).cast("long").alias("n_tokens"),
        (F.col("doc_id") / _BUCKET).cast("long").alias("_b"),
    )
    nt = maybe_checkpoint(nt, eager=False)
    return _pack_from_counts(nt)


# ---------------------------------------------------------------------------
# q99 — embedding-modality dedup clusters (cosine pairs → components)
# ---------------------------------------------------------------------------

_COS_SQL = (
    "list_sum(list_transform(generate_series(1, len({a})), i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    " / (sqrt(list_sum(list_transform(generate_series(1, len({a})), i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))))"
    " * sqrt(list_sum(list_transform(generate_series(1, len({b})), i -> CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))))"
)

def _embedding_components(e: DataFrame) -> DataFrame:
    """q99's component assignment: cosine near-dup edges (≥0.4) →
    connected components, singletons labeled by their own id. Shared
    by q99 (the cluster/keep-list view) and q158 (hard-negative
    exclusion)."""
    from ml_with_spark_streaming_spark.operators.similarity import neardup_pairs

    edges = neardup_pairs(e, threshold=0.4).select("id1", "id2")
    comp = connected_components(edges).withColumnRenamed("id", "vec_id")
    return (
        e.select("vec_id")
        .join(comp, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce("component", F.col("vec_id")).cast("long").alias("component"),
        )
    )


# the q99 recursive-CTE chain (edges → components), reused by q158
_EMB_COMP_CTES = f"""edges AS (
  SELECT a.vec_id AS id1, b.vec_id AS id2
  FROM embeddings a
  JOIN embeddings b ON a.vec_id < b.vec_id AND a.vec_id < 1000 AND b.vec_id < 1000
  WHERE {_COS_SQL.format(a='a.embedding', b='b.embedding')} >= 0.4
),
sym AS (
  SELECT id1 AS a, id2 AS b FROM edges
  UNION
  SELECT id2 AS a, id1 AS b FROM edges
),
walk(id, label) AS (
  SELECT a, a FROM sym
  UNION
  SELECT s.b, w.label FROM walk w JOIN sym s ON s.a = w.id
),
comp AS (SELECT id, MIN(label) AS component FROM walk GROUP BY id),
assigned AS (
  SELECT e.vec_id, CAST(COALESCE(c.component, e.vec_id) AS BIGINT) AS component
  FROM embeddings e LEFT JOIN comp c ON c.id = e.vec_id
  WHERE e.vec_id < 1000
)"""

Q99_SQL = f"""
WITH RECURSIVE {_EMB_COMP_CTES},
sizes AS (SELECT component, CAST(COUNT(*) AS BIGINT) AS cluster_size FROM assigned GROUP BY component)
SELECT a.vec_id, a.component, s.cluster_size,
       CAST(CASE WHEN a.vec_id = a.component THEN 1 ELSE 0 END AS BIGINT) AS is_canonical
FROM assigned a JOIN sizes s ON s.component = a.component
ORDER BY a.vec_id
"""


@query("q99_embedding_dedup_clusters", Q99_SQL)
def q99_embedding_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q90's cluster/keep-list endgame on the EMBEDDING modality:
    cosine near-dup pairs (≥0.4, q54's capped oracle formulation) →
    connected components → canonical representative per cluster
    (SemDeDup-style semantic dedup, Abbas et al. 2023,
    arXiv:2303.09540 — theirs clusters with k-means first; the
    pair→component step is the same).

    This is the capped-exact ORACLE TWIN (the q51 role): the all-pairs
    edge stage is exhaustively correct on the ``vec_id < 1000`` slice
    so DuckDB can replay it bit-for-bit. The UNCAPPED scale path is
    q100, which runs the same component/canonical stages behind the
    sign-LSH candidate gate (q82) instead of the quadratic join. A
    lossless gate at this low threshold is impossible in principle —
    cos 0.4 means P(hyperplane bit agrees) = 1 - acos(0.4)/pi = 0.63,
    and any OR-amplification reaching ~100% recall needs bands so
    narrow that in-bucket fan-out exceeds the all-pairs join itself —
    which is exactly why the oracle twin stays capped-exact and the
    gate's regime (production semantic-dedup thresholds >= 0.95, where
    per-bit agreement is 0.9) is pinned by the planted-cluster fixture
    test instead (tests/test_curation.py::test_q100_lsh_gate_matches_
    exact_on_planted_clusters)."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 1000)
    assigned = _embedding_components(e)
    sizes = assigned.groupBy("component").agg(F.count("*").cast("long").alias("cluster_size"))
    return (
        assigned.join(sizes, "component")
        .select(
            "vec_id",
            "component",
            "cluster_size",
            (F.col("vec_id") == F.col("component")).cast("long").alias("is_canonical"),
        )
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# q100 — embedding dedup at scale: sign-LSH gate → components (uncapped)
# ---------------------------------------------------------------------------


@query("q100_embedding_dedup_at_scale", no_oracle_reason="sign-LSH candidate recall is approximate by construction")
def q100_embedding_dedup_at_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q99's pipeline in its 100 TB shape: the FULL embeddings table
    (no vec_id cap), near-dup edges from the sign-LSH candidate gate +
    exact-cosine verify (q82's operator — banded bucket shuffle, never
    all-pairs), then the shared connected-components / canonical-
    representative stages.

    Rows-only check: which candidate pairs the gate surfaces is
    hash-dependent (recall < 1 by construction), but fully
    deterministic — seeded hyperplanes, sorted bucket id-lists — so
    row counts and values are stable across runs and partition
    layouts. Exactness in the gate's design regime (clusters of
    near-identical vectors, cosine >= 0.95 — the SemDeDup operating
    point) is pinned by the planted-cluster fixture test, which
    asserts gate-fed components == all-pairs-fed components.

    Scale knobs are DERIVED from the corpus size (round-3 ask): one
    metadata-cheap ``count()`` → ``derive_signlsh_knobs`` sizes
    bits-per-band = clamp(ceil(log2 n), 4, 32) so noise-bucket
    occupancy stays O(1) at any corpus size (in-bucket pair fan-out is
    quadratic in bucket size — a fixed band width grows buckets
    linearly with n; the occupancy bound is pinned at two corpus sizes
    by tests/test_similarity.py::test_derived_knobs_bound_bucket_size).
    At the 0.45 threshold the derived (wider) bands trade gate recall
    for that bound — the documented regime split: exact recall
    reference is q99's capped twin, the gate's design regime is
    near-identical vectors, where recall stays ~1 (planted-cluster
    test).
    """
    from ml_with_spark_streaming_spark.operators.similarity import (
        derive_signlsh_knobs,
        signlsh_neardup,
    )

    e = load_table(spark, sf_dir, "embeddings")
    n_planes, bands = derive_signlsh_knobs(e.count())
    edges = signlsh_neardup(
        e, threshold=0.45, n_planes=n_planes, bands=bands, c_id="vec_id", c_vec="embedding"
    ).select("id1", "id2")
    comp = connected_components(edges).withColumnRenamed("id", "vec_id")
    assigned = (
        e.select("vec_id")
        .join(comp, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce("component", F.col("vec_id")).cast("long").alias("component"),
        )
    )
    sizes = assigned.groupBy("component").agg(F.count("*").cast("long").alias("cluster_size"))
    return (
        assigned.join(sizes, "component")
        .select(
            "vec_id",
            "component",
            "cluster_size",
            (F.col("vec_id") == F.col("component")).cast("long").alias("is_canonical"),
        )
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# q101 — benchmark-set decontamination (13-gram overlap vs eval set)
# ---------------------------------------------------------------------------

Q101_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split({CLEAN_SQL}, ' ') AS t
  FROM documents WHERE length({CLEAN_SQL}) > 0
),
grams AS (
  -- join/distinct key is the 16-hex md5 prefix of the gram (the
  -- engine's narrow-shuffle key — see operators/decontaminate.py)
  SELECT DISTINCT doc_id, substr(md5(g), 1, 16) AS g FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, greatest(len(t) - 12, 0)),
                                 i -> array_to_string(t[i:i+12], ' '))) AS g
    FROM toks
  )
),
ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
corpus AS (SELECT doc_id, g FROM grams WHERE doc_id % 97 <> 0),
per_doc AS (
  SELECT c.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_grams,
         CAST(SUM(CASE WHEN ev.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated
  FROM corpus c LEFT JOIN ev ON ev.g = c.g
  GROUP BY c.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(p.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(p.n_contaminated, 0) AS BIGINT) AS n_contaminated,
       CAST(CASE WHEN COALESCE(p.n_contaminated, 0) = 0 THEN 1 ELSE 0 END AS INT) AS keep
FROM documents d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
WHERE d.doc_id % 97 <> 0
ORDER BY d.doc_id
"""


@query("q101_decontaminate", Q101_SQL)
def q101_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-set decontamination — the GPT-3 appendix-C curation
    stage (13-gram overlap against a held-out eval set; Brown et al.
    2020): training documents sharing any 13-gram with an eval
    document are flagged so benchmark numbers aren't inflated by
    memorized test data. The reference has no decontamination; this is
    part of the training-data-pipeline surface (SURVEY.md north star).

    The eval set here is a deterministic slice of the corpus
    (``doc_id % 97 == 0`` — benchmark-sized by construction) so both
    engines derive it identically; in production it is a separate
    benchmark table, same plan shape.

    Scale shape: the eval n-gram set is deduplicated and BROADCAST;
    the corpus streams through one explode + broadcast left join + one
    per-doc aggregation (map-side combinable). The corpus is never
    shuffled by n-gram and never self-joined — at 100 TB the only big
    shuffle is the distinct on (doc_id, gram), keyed by doc id + gram."""
    from ml_with_spark_streaming_spark.operators.decontaminate import (
        contamination_counts,
        eval_ngrams,
    )

    d = load_table(spark, sf_dir, "documents")
    ev = eval_ngrams(d.filter(F.col("doc_id") % 97 == 0))
    corpus = d.filter(F.col("doc_id") % 97 != 0)
    return contamination_counts(corpus, ev).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q103 — sequence packing on REAL BPE token counts
# ---------------------------------------------------------------------------


@query("q103_sequence_packing_bpe", no_oracle_reason="BPE tokenization isn't SQL-expressible")
def q103_sequence_packing_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q98's concat-and-chunk packing budgeted in REAL byte-level BPE
    tokens (``functions/bpe.py`` — the published Sennrich/GPT-2
    algorithm with a deterministic in-repo vocab) instead of the
    whitespace proxy, so chunk offsets mean what a training loader
    needs them to mean.

    The count column is the only Python stage (Arrow-batched
    ``pandas_udf``, LRU-cached per unique pre-token); it is computed
    ONCE into the checkpointed 24-byte/doc count table, and the packing
    core is the shared two-phase distributed prefix sum (see q98 for
    the scale analysis). No SQL oracle — BPE is not expressible in
    DuckDB; the packing arithmetic is pinned by the q98 oracle on the
    same code path and the tokenizer by hand-verified merge fixtures
    (tests/test_text.py)."""
    from ml_with_spark_streaming_spark.functions.bpe import bpe_token_count_series

    bpe_count = F.pandas_udf(bpe_token_count_series, "long")

    d = load_table(spark, sf_dir, "documents")
    nt = d.select(
        "doc_id",
        bpe_count("text").alias("n_tokens"),
        (F.col("doc_id") / _BUCKET).cast("long").alias("_b"),
    )
    nt = maybe_checkpoint(nt, eager=False)
    return _pack_from_counts(nt)


# ---------------------------------------------------------------------------
# q104 — corpus mixing plan: per-language token budgets → repeat factors
# ---------------------------------------------------------------------------

# Target mixture weights (percent of the training token budget per
# language) — the fixed "data recipe" a pretraining run declares up
# front (the Pile / DoReMi-style mixing table, Gao et al. 2020
# arXiv:2101.00027 §1, Xie et al. 2023 arXiv:2305.10429).
_MIX_TARGETS = {"en": 50, "de": 15, "es": 15, "fr": 10, "zh": 10}

def _mix_case_sql(col: str = "lang") -> str:
    """The target-weight lookup as a SQL CASE over an explicit column
    reference (parameterized — a textual .replace() on the column name
    would also rewrite any value that happened to contain it)."""
    return (
        f"CASE {col} "
        + " ".join(f"WHEN '{k}' THEN {v}" for k, v in _MIX_TARGETS.items())
        + " ELSE 0 END"
    )


_MIX_CASE_SQL = _mix_case_sql()
_TARGET_P = _mix_case_sql("p.lang")  # the per-row target weight in the plan CTEs

# Shared CTE chain for the mixing plan (q104 + q107): per-language
# token inventory, grand total, and the GUARDED repeat factor — a
# language whose documents all clean to empty text (plausible for
# non-Latin scripts under the [^A-Za-z] cleaner) has lang_tokens = 0
# and must plan 0.0 epochs, not a NULL from a zero-denominator
# division. The realization (q107) consumes the same CTE, so the plan
# and its realization cannot disagree.
_RF_SQL = (
    "CASE WHEN p.lang_tokens = 0 THEN 0.0 ELSE "
    + exact_round_div_sql(f"({_TARGET_P}) * t.total_tokens", "100 * p.lang_tokens")
    + " END"
)
_MIX_PLAN_CTES = f"""nt AS (
  SELECT lang,
         CASE WHEN length({CLEAN_SQL}) = 0 THEN 0
              ELSE len(string_split({CLEAN_SQL}, ' ')) END AS n_tokens
  FROM documents
),
per_lang AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS lang_tokens
  FROM nt GROUP BY lang
),
tot AS (SELECT CAST(SUM(lang_tokens) AS BIGINT) AS total_tokens FROM per_lang),
pl AS (
  SELECT p.lang, p.n_docs, p.lang_tokens, t.total_tokens,
         CASE WHEN t.total_tokens = 0 THEN 0.0
              ELSE {exact_round_div_sql('p.lang_tokens', 't.total_tokens')} END AS natural_frac,
         CAST({_TARGET_P} AS BIGINT) AS target_pct,
         {_RF_SQL} AS repeat_factor
  FROM per_lang p CROSS JOIN tot t
)"""

Q104_SQL = f"""
WITH {_MIX_PLAN_CTES}
SELECT lang, n_docs, lang_tokens, natural_frac, target_pct, repeat_factor
FROM pl
ORDER BY lang
"""


@query("q104_corpus_mixing", Q104_SQL)
def q104_corpus_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The data-recipe planning table a pretraining run derives before
    sampling: per language, its document/token inventory, its natural
    share of the corpus, the declared target share (``_MIX_TARGETS``),
    and the repeat factor (epochs over that subset) that realizes the
    target mix at a fixed total token budget —
    ``repeat = target% · total_tokens / (100 · lang_tokens)``.

    One scan → one 5-group aggregation; the grand total joins back as
    a broadcast 1-row aggregate (q21/q31's scalar-subquery pattern —
    never a global window). All ratios are exact_round_div integer
    rationals, so no double crosses the engine boundary. At 100 TB
    this is a metadata query: cost is the token-count scan, already
    computed by q41/q98 in a real pipeline run."""
    return _mixing_plan(spark, sf_dir).select(
        "lang", "n_docs", "lang_tokens", "natural_frac", "target_pct", "repeat_factor"
    ).orderBy("lang")


def _mixing_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The language-level mixing plan shared by q104 (reported as-is)
    and q107 (realized per doc): token inventory, natural share,
    target share, and the zero-guarded repeat factor. Defined ONCE so
    the plan and its realization cannot disagree (the guard lives
    here: lang_tokens = 0 → 0.0 epochs, never a NULL from a
    zero-denominator division)."""
    from ml_with_spark_streaming_spark.operators.textstats import (
        whitespace_token_count_expr,
    )

    d = load_table(spark, sf_dir, "documents")
    per_lang = (
        d.select(
            "lang",
            whitespace_token_count_expr(clean_text_expr("text")).cast("long").alias("n_tokens"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("lang_tokens"),
        )
    )
    # 5 rows — materialize, or the grand-total branch re-plans the
    # whole token-count scan (q97's fan-out rule)
    per_lang = maybe_checkpoint(per_lang)
    tot = per_lang.agg(F.sum("lang_tokens").cast("long").alias("total_tokens"))
    target = F.coalesce(
        *[F.when(F.col("lang") == k, F.lit(v)) for k, v in _MIX_TARGETS.items()],
        F.lit(0),
    )
    return per_lang.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        "lang_tokens",
        "total_tokens",
        F.when(F.col("total_tokens") == 0, F.lit(0.0))
        .otherwise(exact_round_div(F.col("lang_tokens"), F.col("total_tokens")))
        .alias("natural_frac"),
        target.cast("long").alias("target_pct"),
        F.when(F.col("lang_tokens") == 0, F.lit(0.0))
        .otherwise(
            exact_round_div(target * F.col("total_tokens"), 100 * F.col("lang_tokens"))
        )
        .alias("repeat_factor"),
    )


# ---------------------------------------------------------------------------
# q105 — incremental dedup: a NEW ingest batch vs the EXISTING corpus
# ---------------------------------------------------------------------------

Q105_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split({CLEAN_SQL}, ' ') AS t
  FROM documents WHERE length({CLEAN_SQL}) > 0
),
sh AS (
  SELECT doc_id,
         list_transform(generate_series(1, greatest(len(t) - 2, 0)),
                        i -> array_to_string(t[i:i+2], ' ')) AS s
  FROM toks
),
shf AS (SELECT doc_id, s FROM sh WHERE len(s) > 0),
sig AS (
  SELECT doc_id,
         list_transform(generate_series(0, 15),
                        i -> list_min(list_transform(s, x -> substr(md5(x || '#' || CAST(i // 4 AS VARCHAR)), (i % 4) * 8 + 1, 8)))) AS sg
  FROM shf
),
bands AS (
  SELECT doc_id, j AS band_idx,
         md5(array_to_string(sg[j*4+1:j*4+4], '|')) AS band_hash
  FROM sig, UNNEST([0, 1, 2, 3]) AS t(j)
),
cand AS (
  SELECT DISTINCT n.doc_id AS id1, o.doc_id AS id2
  FROM bands n
  JOIN bands o ON n.band_hash = o.band_hash AND n.band_idx = o.band_idx
  WHERE n.doc_id % 10 = 9 AND o.doc_id % 10 <> 9
),
tsets AS (
  SELECT doc_id, list_distinct(list_filter(string_split({CLEAN_SQL}, ' '), x -> x <> '')) AS ts
  FROM documents
),
near AS (
  SELECT DISTINCT c.id1 AS doc_id
  FROM cand c
  JOIN tsets a ON a.doc_id = c.id1
  JOIN tsets b ON b.doc_id = c.id2
  WHERE ROUND(len(list_intersect(a.ts, b.ts)) * 1.0 /
              (len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts))), 4) >= 0.9
),
fps AS (
  SELECT doc_id,
         md5(array_to_string(string_split({CLEAN_SQL}, ' ')[1:8], ' ')) AS fp
  FROM documents
),
exact AS (
  SELECT DISTINCT f.doc_id
  FROM fps f
  JOIN (SELECT DISTINCT fp FROM fps WHERE doc_id % 10 <> 9) o ON o.fp = f.fp
  WHERE f.doc_id % 10 = 9
)
SELECT d.doc_id,
       CAST(CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END AS INT) AS exact_dup,
       CAST(CASE WHEN nr.doc_id IS NOT NULL THEN 1 ELSE 0 END AS INT) AS near_dup,
       CAST(CASE WHEN e.doc_id IS NULL AND nr.doc_id IS NULL THEN 1 ELSE 0 END AS INT) AS keep
FROM documents d
LEFT JOIN exact e ON e.doc_id = d.doc_id
LEFT JOIN near nr ON nr.doc_id = d.doc_id
WHERE d.doc_id % 10 = 9
ORDER BY d.doc_id
"""


@query("q105_incremental_dedup", Q105_SQL)
def q105_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-ingestion dedup: a NEW batch of documents (here the
    deterministic ``doc_id % 10 == 9`` slice — in production, today's
    crawl drop) checked against the EXISTING corpus, per new doc:
    exact duplicate (8-token-prefix fingerprint seen before), near
    duplicate (MinHash band collision with an existing doc + exact
    Jaccard >= 0.9 verify), and the keep flag.

    This is the shape the one-shot q90 pipeline takes when data
    arrives incrementally: at 100 TB the corpus side's fingerprint and
    band tables are PRECOMPUTED artifacts of previous ingests (append-
    only, bucketed by hash), so the per-drop cost is signatures over
    the new batch + two hash joins against the indexes — never a
    corpus rescan (the rescan here exists only because the testdata
    has no persisted index sidecar). Candidate fan-out and verify are
    the q58/q90 operators restricted to new-vs-old pairs."""
    from ml_with_spark_streaming_spark.operators.dedup import (
        jaccard_verify,
        lsh_bands,
        minhash_signatures,
    )
    from ml_with_spark_streaming_spark.operators.textstats import fingerprint_expr

    d = load_table(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % 10 == 9

    fps = d.select("doc_id", fingerprint_expr("text", 8).alias("fp"))
    exact_ids = (
        fps.filter(is_new)
        .join(fps.filter(~is_new).select("fp").distinct(), "fp", "left_semi")
        .select("doc_id")
        .withColumn("_exact", F.lit(1))
    )

    banded = lsh_bands(minhash_signatures(d, "text", "doc_id", k=16), "doc_id", 16, 4)
    banded = maybe_checkpoint(banded)  # one signature pass feeds both roles
    cand = (
        banded.filter(is_new)
        .select(F.col("doc_id").alias("id1"), "band_idx", "band_hash")
        .join(
            banded.filter(~is_new).select(
                F.col("doc_id").alias("id2"), "band_idx", "band_hash"
            ),
            ["band_idx", "band_hash"],
        )
        .select("id1", "id2")
        .distinct()
    )
    near_ids = (
        jaccard_verify(cand, d, "text", "doc_id", threshold=0.9)
        .select(F.col("id1").alias("doc_id"))
        .distinct()
        .withColumn("_near", F.lit(1))
    )

    return (
        d.filter(is_new)
        .select("doc_id")
        .join(exact_ids, "doc_id", "left")
        .join(near_ids, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("_exact", F.lit(0)).cast("int").alias("exact_dup"),
            F.coalesce("_near", F.lit(0)).cast("int").alias("near_dup"),
            (F.coalesce("_exact", F.lit(0)) + F.coalesce("_near", F.lit(0)) == 0)
            .cast("int")
            .alias("keep"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q107 — mixture realization: the q104 plan applied as per-doc copy counts
# ---------------------------------------------------------------------------

Q107_SQL = f"""
WITH {_MIX_PLAN_CTES}
SELECT d.doc_id, d.lang,
       CAST(FLOOR(pl.repeat_factor)
            + CASE WHEN substr(md5(CAST(d.doc_id AS VARCHAR) || '#' || 'mix'), 1, 8)
                        < printf('%08x', least(CAST(FLOOR((pl.repeat_factor - FLOOR(pl.repeat_factor)) * 4294967296) AS BIGINT), 4294967295))
                   THEN 1 ELSE 0 END
            AS BIGINT) AS n_copies
FROM documents d JOIN pl ON pl.lang = d.lang
ORDER BY d.doc_id
"""


@query("q107_mixture_realization", Q107_SQL)
def q107_mixture_realization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q104's data recipe REALIZED: every document assigned its copy
    count for the training run — ``floor(repeat_factor)`` full epochs
    plus one more iff the doc's content hash falls under the
    fractional epoch (q84's deterministic md5-bucket sampling, so the
    realized mix is a pure function of (doc_id, recipe): stable across
    reruns, partitionings, and engines — Spark and DuckDB emit
    identical copy counts, which the oracle hash verifies).

    The fractional threshold is computed IN-QUERY (``%08x`` of
    floor(frac·2^32) — format_string/printf exist in both engines;
    fixed-width lowercase hex compares lexicographically = numerically)
    because the repeat factor is data-dependent, unlike
    ``operators/sampling.py``'s driver-side constant threshold. One
    token-count scan + one broadcast join of the 5-row plan onto the
    doc spine; scales as a pure projection."""
    plan = _mixing_plan(spark, sf_dir).select(
        "lang", F.col("repeat_factor").alias("rf")
    )
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    bucket = F.substring(
        F.md5(
            F.encode(F.concat_ws("#", F.col("doc_id").cast("string"), F.lit("mix")), "UTF-8")
        ),
        1,
        8,
    )
    frac = F.col("rf") - F.floor("rf")
    # clamp: frac <= 0.9999 today (exact_round_div's 4-decimal cap), but
    # if the rounding precision is ever raised, frac near 1 could format
    # as 9-char '100000000' and the fixed-width lexicographic compare
    # would invert — least() pins the threshold inside 8 hex chars
    thr = F.format_string(
        "%08x",
        F.least(F.floor(frac * F.lit(float(2**32))).cast("long"), F.lit(2**32 - 1)),
    )
    return (
        d.join(F.broadcast(plan), "lang")
        .select(
            "doc_id",
            "lang",
            (
                F.floor("rf").cast("long")
                + F.when(bucket < thr, F.lit(1)).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("n_copies"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q110 — ExactSubstr: duplicated >= k-token spans across documents
# ---------------------------------------------------------------------------

_SPAN_K = 20  # span width in tokens (testdata-scaled; production: 50, Lee et al. 2021)

# CTE chain shared by q110 (span discovery) and q115 (cut application):
# tokenize → shingle-with-position → 16-hex gram keys → duplicated keys
# with canonical first occurrence → duplicated positions → per-doc
# gaps-and-islands merge.
_EXACT_SUBSTR_CTES = f"""toks AS (
  SELECT doc_id, string_split({CLEAN_SQL}, ' ') AS t
  FROM documents WHERE length({CLEAN_SQL}) > 0
),
g AS (
  SELECT doc_id, unnest(generate_series(1, greatest(len(t) - {_SPAN_K - 1}, 0))) AS pos, t
  FROM toks
),
gg AS (
  SELECT doc_id, pos,
         substr(md5(array_to_string(t[pos:pos+{_SPAN_K - 1}], ' ')), 1, 16) AS gk
  FROM g
),
dup AS (
  SELECT gk, MIN(printf('%012d#%09d', doc_id, pos)) AS canon
  FROM gg GROUP BY gk HAVING COUNT(*) >= 2
),
dp AS (
  SELECT gg.doc_id, gg.pos,
         CASE WHEN printf('%012d#%09d', gg.doc_id, gg.pos) = d.canon THEN 1 ELSE 0 END AS is_canon
  FROM gg JOIN dup d ON d.gk = gg.gk
),
dpl AS (
  SELECT doc_id, pos, is_canon,
         CASE WHEN pos - COALESCE(LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos), pos) > {_SPAN_K}
              THEN 1 ELSE 0 END AS newisl
  FROM dp
),
isl AS (
  SELECT doc_id, pos, is_canon,
         SUM(newisl) OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM dpl
)"""

Q110_SQL = f"""
WITH {_EXACT_SUBSTR_CTES}
SELECT doc_id,
       CAST(MIN(pos) AS BIGINT) AS span_start,
       CAST(MAX(pos) + {_SPAN_K - 1} AS BIGINT) AS span_end,
       CAST(MAX(pos) - MIN(pos) + {_SPAN_K} AS BIGINT) AS n_dup_tokens,
       CAST(CASE WHEN MAX(is_canon) = 0 THEN 1 ELSE 0 END AS INT) AS cut
FROM isl GROUP BY doc_id, island
ORDER BY doc_id, span_start
"""


@query("q110_exact_substr_spans", Q110_SQL)
def q110_exact_substr_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level exact dedup (ExactSubstr, Lee et al. 2021
    arXiv:2107.06499): maximal duplicated >= k-token spans per
    document, with the keep-one cut policy — the curation stage between
    fuzzy document-dedup (q90) and packing (q98/q103) that document-
    granularity dedup cannot express (boilerplate, quoted passages,
    templated fragments inside otherwise-distinct documents).

    Scale shape (see operators/exact_substr.py): ONE corpus tokenize +
    shingle explode feeds both the occurrence aggregate (shuffle keyed
    by the 16-hex gram hash, count/min combine map-side) and the
    position probe; only DUPLICATED positions reach the doc-partitioned
    gaps-and-islands merge. The corpus is never self-joined — duplicate
    discovery is the hash aggregation, exactly q46/q101's shape."""
    from ml_with_spark_streaming_spark.operators.exact_substr import duplicate_spans

    d = load_table(spark, sf_dir, "documents")
    return duplicate_spans(d, "text", "doc_id", k=_SPAN_K)


# ---------------------------------------------------------------------------
# q115 — ExactSubstr cut APPLICATION: the cleaned corpus after span removal
# ---------------------------------------------------------------------------

Q115_SQL = f"""
WITH {_EXACT_SUBSTR_CTES},
cutspans AS (
  SELECT doc_id, MIN(pos) AS s, MAX(pos) + {_SPAN_K - 1} AS e
  FROM isl GROUP BY doc_id, island
  HAVING MAX(is_canon) = 0
),
p AS (SELECT doc_id, unnest(generate_series(1, len(t))) AS pos, t FROM toks),
pt AS (SELECT doc_id, pos, t[pos] AS tok FROM p),
fl AS (
  SELECT pt.doc_id, pt.pos, pt.tok,
         CASE WHEN c.s IS NOT NULL THEN 1 ELSE 0 END AS cut
  FROM pt LEFT JOIN cutspans c
    ON c.doc_id = pt.doc_id AND pt.pos BETWEEN c.s AND c.e
),
perdoc AS (
  SELECT doc_id,
         COUNT(*) AS n_tokens,
         SUM(cut) AS n_cut_tokens,
         substr(md5(coalesce(string_agg(CASE WHEN cut = 0 THEN tok END, ' ' ORDER BY pos), '')), 1, 16) AS kept_fp
  FROM fl GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(p.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(p.n_cut_tokens, 0) AS BIGINT) AS n_cut_tokens,
       CAST(COALESCE(p.n_tokens - p.n_cut_tokens, 0) AS BIGINT) AS n_kept_tokens,
       COALESCE(p.kept_fp, 'd41d8cd98f00b204') AS kept_fp
FROM documents d LEFT JOIN perdoc p ON p.doc_id = d.doc_id
ORDER BY d.doc_id
"""


@query("q115_exact_substr_apply", Q115_SQL)
def q115_exact_substr_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr stage, second half — APPLY q110's keep-one cut
    policy and emit the cleaned corpus: per document, token counts
    before/after and the md5 fingerprint of the surviving text (the
    driver-narrow stand-in for the cleaned ``text`` column). Together
    with q110 this is the complete Lee et al. 2021 duplicate-passage
    removal stage: discovery emits spans, application re-slices every
    document with later copies excised while canonical (first) copies
    survive.

    Scale shape (see operators/exact_substr.apply_cuts): the cut-span
    table is bounded by duplicated content and broadcast; spans are
    disjoint per doc so the range join never fans out; reassembly is a
    per-doc collect_list — no global sort, one corpus scan in the
    application pass (the discovery scan is q110's, materialized as a
    stage output in production)."""
    from ml_with_spark_streaming_spark.operators.exact_substr import apply_cuts

    d = load_table(spark, sf_dir, "documents")
    return apply_cuts(d, "text", "doc_id", k=_SPAN_K)


# ---------------------------------------------------------------------------
# q108 — sliding token-window chunking (context-window splitter)
# ---------------------------------------------------------------------------

_CHUNK_LEN = 64  # tokens per chunk (testdata-scaled; production: 512+)
_CHUNK_STRIDE = 48  # window stride -> 16-token overlap

Q108_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split({CLEAN_SQL}, ' ') AS t
  FROM documents WHERE length({CLEAN_SQL}) > 0
),
ch AS (
  SELECT doc_id, t, unnest(generate_series(1, len(t), {_CHUNK_STRIDE})) AS start
  FROM toks
)
SELECT doc_id,
       CAST((start - 1) // {_CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
       CAST(start AS BIGINT) AS chunk_start,
       CAST(least({_CHUNK_LEN}, len(t) - start + 1) AS BIGINT) AS chunk_len,
       substr(md5(array_to_string(t[start:start+{_CHUNK_LEN - 1}], ' ')), 1, 16) AS chunk_fp
FROM ch
ORDER BY doc_id, chunk_idx
"""


@query("q108_token_chunks", Q108_SQL)
def q108_token_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding context-window chunking — the splitter every RAG /
    long-context training pipeline runs: each document becomes
    overlapping windows of ``_CHUNK_LEN`` tokens at ``_CHUNK_STRIDE``
    spacing, emitted as (doc_id, chunk_idx, start, length, content
    fingerprint). The fingerprint (16-hex md5 prefix) stands in for
    the chunk text so results stay driver-narrow; a consumer slices
    the same windows from the token array.

    Plan: tokenize behind the repartition barrier (the
    CollapseProject-into-Generate rule — the regex chain must run once
    per DOC, the per-chunk work is just an array slice of the already-
    materialized token column), explode the stride positions, one
    codegen projection. No shuffle except the presentation sort;
    chunk count scales with corpus tokens / stride, each output row a
    fixed ~40 bytes."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", tokens_expr(clean_text_expr("text")).alias("_toks")
    ).filter(F.size("_toks") > 0)
    toks = toks.repartition("doc_id")
    ch = toks.select(
        "doc_id",
        "_toks",
        F.explode(
            F.sequence(F.lit(1), F.size("_toks"), F.lit(_CHUNK_STRIDE))
        ).alias("start"),
    )
    return (
        ch.select(
            "doc_id",
            F.floor((F.col("start") - 1) / _CHUNK_STRIDE).cast("long").alias("chunk_idx"),
            F.col("start").cast("long").alias("chunk_start"),
            F.least(F.lit(_CHUNK_LEN), F.size("_toks") - F.col("start") + 1)
            .cast("long")
            .alias("chunk_len"),
            F.substring(
                F.md5(
                    F.encode(
                        F.concat_ws(" ", F.slice("_toks", F.col("start"), _CHUNK_LEN)),
                        "UTF-8",
                    )
                ),
                1,
                16,
            ).alias("chunk_fp"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


# ---------------------------------------------------------------------------
# q112 — corpus-trained quality classifier (heuristic-label distillation)
# q113 — the q93 pipeline with the classifier as a fourth gate
# ---------------------------------------------------------------------------

from ml_with_spark_streaming_spark.operators.quality_clf import (  # noqa: E402
    TRAIN_KEEP,
    TRAIN_MOD,
    classifier_scores,
    classifier_weights,
    feature_presence,
    presence_sql,
    WEIGHTS_SQL,
)

# weak labels from the shared qual CTE (q45's exact-rational heuristic)
_LABEL_CTE = "lab AS (SELECT doc_id, CASE WHEN quality >= 0.5 THEN 1 ELSE 0 END AS y FROM qual)"

Q112_SQL = f"""
WITH {presence_sql(CLEAN_SQL)},
{_QUAL_CTES},
{_LABEL_CTE},
{WEIGHTS_SQL},
flags AS (
  SELECT d.doc_id, d.lang, d.source, l.y,
         CASE WHEN COALESCE(s.score, 0) > 0 THEN 1 ELSE 0 END AS clf,
         CASE WHEN d.doc_id % {TRAIN_MOD} >= {TRAIN_KEEP} THEN 1 ELSE 0 END AS holdout
  FROM documents d
  JOIN lab l USING (doc_id)
  LEFT JOIN csc s USING (doc_id)
)
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(clf) AS BIGINT) AS n_clf_ok,
       CAST(SUM(y) AS BIGINT) AS n_heur_ok,
       CAST(SUM(CASE WHEN clf = y THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
       CAST(SUM(holdout) AS BIGINT) AS n_holdout,
       CAST(SUM(holdout * CASE WHEN clf = y THEN 1 ELSE 0 END) AS BIGINT) AS n_holdout_agree
FROM flags
GROUP BY lang, source
ORDER BY lang, source
"""


@query("q112_quality_classifier", Q112_SQL)
def q112_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained document-quality classifier — the distillation
    bootstrap every large curation pipeline ships (GPT-3 §A, CCNet,
    fastText quality filters): weak labels from the q45 heuristic on a
    deterministic 80% split, a linear bag-of-words scorer trained in
    ONE distributed aggregation, the whole corpus scored via the
    broadcast weight-table join (the same scoring shape as the
    reference's sklearn linear models, PAC/passiveAgressiveModel.py:93
    — re-expressed as DataFrame ops with integer-exact weights so the
    oracle is bit-for-bit).

    Outputs per (lang, source): corpus size, classifier/heuristic
    keep counts, agreement overall and on the held-out 20% (the
    generalization signal a production pipeline monitors).

    Scale shape: two checkpointed scans of documents (presence pairs +
    labels); training collects NOTHING (the 1-row class-totals table is
    broadcast); the weight table is ≤ 4096 rows broadcast to scoring.
    Data-sized shuffles are keyed by doc_id only."""
    from ml_with_spark_streaming_spark.operators.quality_clf import LABEL_THRESHOLD
    from ml_with_spark_streaming_spark.operators.textstats import quality_score_expr

    from ml_with_spark_streaming_spark.lineage import parallel_parts

    d = load_table(spark, sf_dir, "documents")
    # base: metadata + weak label in ONE scan (no join) — feeds
    # training (y), flags (lang/source/y), and the holdout marker.
    # base and pres are independent scans of documents, so their
    # checkpoint materializations overlap (parallel_parts, guide §2.6)
    base, pres = parallel_parts(
        lambda: maybe_checkpoint(
            d.select(
                "doc_id",
                "lang",
                "source",
                (quality_score_expr("text") >= F.lit(LABEL_THRESHOLD)).cast("int").alias("y"),
            )
        ),
        lambda: maybe_checkpoint(feature_presence(d)),
    )
    w = classifier_weights(pres, base.select("doc_id", "y"))
    sc = classifier_scores(pres, w)
    flags = (
        base.join(sc, "doc_id", "left")
        .select(
            "lang",
            "source",
            "y",
            (F.coalesce(F.col("score"), F.lit(0)) > 0).cast("int").alias("clf"),
            (F.pmod(F.col("doc_id"), F.lit(TRAIN_MOD)) >= F.lit(TRAIN_KEEP))
            .cast("int")
            .alias("holdout"),
        )
    )
    return (
        flags.groupBy("lang", "source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("clf").cast("long").alias("n_clf_ok"),
            F.sum("y").cast("long").alias("n_heur_ok"),
            F.sum((F.col("clf") == F.col("y")).cast("int")).cast("long").alias("n_agree"),
            F.sum("holdout").cast("long").alias("n_holdout"),
            F.sum(F.col("holdout") * (F.col("clf") == F.col("y")).cast("int"))
            .cast("long")
            .alias("n_holdout_agree"),
        )
        .orderBy("lang", "source")
    )


Q113_SQL = f"""
WITH RECURSIVE {_DEDUP_COMPONENT_CTES},
{_QUAL_CTES},
{_REP_CTES},
{presence_sql(CLEAN_SQL)},
{_LABEL_CTE},
{WEIGHTS_SQL},
flags AS (
  SELECT d.doc_id, d.lang, d.source,
         CASE WHEN a.doc_id = a.component THEN 1 ELSE 0 END AS canonical,
         CASE WHEN q.quality >= 0.5 THEN 1 ELSE 0 END AS quality_ok,
         CASE WHEN rbs.n_bigrams IS NULL OR rbs.n_bigrams = 0 THEN 1
              WHEN {exact_round_div_sql('rbs.n_bigrams - rbs.n_distinct', 'rbs.n_bigrams')} <= 0.2 THEN 1
              ELSE 0 END AS rep_ok,
         CASE WHEN COALESCE(s.score, 0) > 0 THEN 1 ELSE 0 END AS clf_ok
  FROM documents d
  JOIN assigned a ON a.doc_id = d.doc_id
  JOIN qual q ON q.doc_id = d.doc_id
  LEFT JOIN rbs ON rbs.doc_id = d.doc_id
  LEFT JOIN csc s ON s.doc_id = d.doc_id
)
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(canonical * quality_ok * rep_ok) AS BIGINT) AS n_kept_base,
       CAST(SUM(clf_ok) AS BIGINT) AS n_clf_ok,
       CAST(SUM(canonical * quality_ok * rep_ok * clf_ok) AS BIGINT) AS n_kept_clf,
       {exact_round_div_sql('SUM(canonical * quality_ok * rep_ok * clf_ok)', 'COUNT(*)')} AS keep_frac_clf
FROM flags
GROUP BY lang, source
ORDER BY lang, source
"""


@query("q113_curation_with_classifier", Q113_SQL)
def q113_curation_with_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q93's composed keep-list with the q112 classifier wired in as a
    FOURTH gate — dedup canonicality × heuristic quality × repetition ×
    classifier — surfacing the base vs. classifier-augmented keep
    counts side by side so the keep-list delta is auditable.

    Composition only: every stage is the already-oracled operator
    (q90 components, q45 quality, q91 repetition, q112 scorer); this
    query pins that they compose."""
    from ml_with_spark_streaming_spark.operators.quality_clf import heuristic_labels
    from ml_with_spark_streaming_spark.operators.textstats import quality_score_expr

    d = load_table(spark, sf_dir, "documents")
    assigned = dedup_components(d)
    rep = repetition_signals(d, "text", "doc_id").select("doc_id", "dup_bigram_frac")
    pres = maybe_checkpoint(feature_presence(d))
    lab = maybe_checkpoint(heuristic_labels(d))
    sc = classifier_scores(pres, classifier_weights(pres, lab))
    flags = (
        d.select(
            "doc_id", "lang", "source", quality_score_expr("text").alias("quality")
        )
        .join(assigned, "doc_id")
        .join(rep, "doc_id")
        .join(sc, "doc_id", "left")
        .select(
            "lang",
            "source",
            (F.col("doc_id") == F.col("component")).cast("int").alias("canonical"),
            (F.col("quality") >= 0.5).cast("int").alias("quality_ok"),
            (F.col("dup_bigram_frac") <= 0.2).cast("int").alias("rep_ok"),
            (F.coalesce(F.col("score"), F.lit(0)) > 0).cast("int").alias("clf_ok"),
        )
    )
    kept = F.col("canonical") * F.col("quality_ok") * F.col("rep_ok")
    return (
        flags.groupBy("lang", "source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(kept).cast("long").alias("n_kept_base"),
            F.sum("clf_ok").cast("long").alias("n_clf_ok"),
            F.sum(kept * F.col("clf_ok")).cast("long").alias("n_kept_clf"),
            exact_round_div(
                F.sum(kept * F.col("clf_ok")), F.count("*")
            ).alias("keep_frac_clf"),
        )
        .orderBy("lang", "source")
    )


# ---------------------------------------------------------------------------
# q114 — end-to-end training-mix export: keep-list → mixture copies →
# context chunking → deterministic shard assignment → per-shard manifest
# ---------------------------------------------------------------------------

Q114_SQL = f"""
WITH RECURSIVE {_DEDUP_COMPONENT_CTES},
{_QUAL_CTES},
{_REP_CTES},
{presence_sql(CLEAN_SQL)},
{_LABEL_CTE},
{WEIGHTS_SQL},
{_MIX_PLAN_CTES},
keep AS (
  SELECT d.doc_id, d.lang
  FROM documents d
  JOIN assigned a ON a.doc_id = d.doc_id
  JOIN qual q ON q.doc_id = d.doc_id
  LEFT JOIN rbs ON rbs.doc_id = d.doc_id
  LEFT JOIN csc s ON s.doc_id = d.doc_id
  WHERE a.doc_id = a.component
    AND q.quality >= 0.5
    AND (rbs.n_bigrams IS NULL OR rbs.n_bigrams = 0
         OR {exact_round_div_sql('rbs.n_bigrams - rbs.n_distinct', 'rbs.n_bigrams')} <= 0.2)
    AND COALESCE(s.score, 0) > 0
),
copies AS (
  SELECT k.doc_id,
         CAST(FLOOR(pl.repeat_factor)
              + CASE WHEN substr(md5(CAST(k.doc_id AS VARCHAR) || '#' || 'mix'), 1, 8)
                          < printf('%08x', least(CAST(FLOOR((pl.repeat_factor - FLOOR(pl.repeat_factor)) * 4294967296) AS BIGINT), 4294967295))
                     THEN 1 ELSE 0 END
              AS BIGINT) AS n_copies
  FROM keep k JOIN pl ON pl.lang = k.lang
),
chunks AS (
  SELECT doc_id, start,
         least({_CHUNK_LEN}, len(t) - start + 1) AS chunk_len,
         substr(md5(array_to_string(t[start:start+{_CHUNK_LEN - 1}], ' ')), 1, 16) AS fp
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t), {_CHUNK_STRIDE})) AS start FROM toks)
),
seqs AS (
  SELECT r.doc_id, r.copy_idx, c.start, c.chunk_len, c.fp
  FROM (SELECT doc_id, unnest(generate_series(1, n_copies)) AS copy_idx
        FROM copies WHERE n_copies >= 1) r
  JOIN chunks c ON c.doc_id = r.doc_id
)
SELECT substr(md5(CAST(doc_id AS VARCHAR) || '#' || CAST(copy_idx AS VARCHAR) || '#' || CAST(start AS VARCHAR)), 1, 1) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_seqs,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(SUM(chunk_len) AS BIGINT) AS n_tokens,
       MIN(fp) AS min_fp,
       MAX(fp) AS max_fp
FROM seqs
GROUP BY shard
ORDER BY shard
"""


def curation_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q113/q114's four-gate keep list as a standalone STAGE:
    ``(doc_id, lang)`` for docs that are (1) their dedup component's
    canonical member, (2) quality >= 0.5, (3) repetition-clean
    (dup-bigram fraction <= 0.2), (4) scored positive by the
    corpus-trained classifier. The pipeline runner persists this as
    the ``keep`` artifact; q114 composes it in-query."""
    from ml_with_spark_streaming_spark.operators.quality_clf import heuristic_labels
    from ml_with_spark_streaming_spark.operators.textstats import quality_score_expr

    d = load_table(spark, sf_dir, "documents")
    assigned = dedup_components(d)
    rep = repetition_signals(d, "text", "doc_id").select("doc_id", "dup_bigram_frac")
    pres = maybe_checkpoint(feature_presence(d))
    lab = maybe_checkpoint(heuristic_labels(d))
    sc = classifier_scores(pres, classifier_weights(pres, lab))
    return (
        d.select("doc_id", "lang", quality_score_expr("text").alias("quality"))
        .join(assigned, "doc_id")
        .join(rep, "doc_id")
        .join(sc, "doc_id", "left")
        .filter(
            (F.col("doc_id") == F.col("component"))
            & (F.col("quality") >= 0.5)
            & (F.col("dup_bigram_frac") <= 0.2)
            & (F.coalesce(F.col("score"), F.lit(0)) > 0)
        )
        .select("doc_id", "lang")
    )


def epoch_copies(spark: SparkSession, sf_dir: str, keep: DataFrame) -> DataFrame:
    """Stage: per-kept-doc epoch copy counts ``(doc_id, n_copies)``
    from the q104/q107 language-mixing recipe — floor(repeat_factor)
    plus a deterministic md5-bucket bonus copy realizing the
    fractional part (identical arithmetic to q107/q114's SQL twin).
    The 5-row recipe is broadcast; output is keep-list-sized."""
    plan = _mixing_plan(spark, sf_dir).select(
        "lang", F.col("repeat_factor").alias("rf")
    )
    bucket = F.substring(
        F.md5(
            F.encode(
                F.concat_ws("#", F.col("doc_id").cast("string"), F.lit("mix")), "UTF-8"
            )
        ),
        1,
        8,
    )
    frac = F.col("rf") - F.floor("rf")
    thr = F.format_string(
        "%08x",
        F.least(F.floor(frac * F.lit(float(2**32))).cast("long"), F.lit(2**32 - 1)),
    )
    return keep.join(F.broadcast(plan), "lang").select(
        "doc_id",
        (
            F.floor("rf").cast("long")
            + F.when(bucket < thr, F.lit(1)).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("n_copies"),
    )


def context_chunks(d: DataFrame, kept_ids: DataFrame) -> DataFrame:
    """Stage: q108's sliding context-window chunking restricted to kept
    docs: ``(doc_id, start, chunk_len, fp)``. Chunks are fingerprinted
    ONCE per (doc, start) — the copy explosion joins to this table, so
    no chunk is ever re-hashed per copy."""
    toks = (
        d.select("doc_id", tokens_expr(clean_text_expr("text")).alias("_toks"))
        .filter(F.size("_toks") > 0)
        # fingerprint only KEPT docs: the inner join downstream would
        # prune the rest anyway, but a semi-join BEFORE chunking skips
        # the md5 work for dropped docs entirely (identical result)
        .join(kept_ids, "doc_id", "left_semi")
        .repartition("doc_id")
    )
    return toks.select(
        "doc_id",
        "_toks",
        F.explode(F.sequence(F.lit(1), F.size("_toks"), F.lit(_CHUNK_STRIDE))).alias(
            "start"
        ),
    ).select(
        "doc_id",
        "start",
        F.least(F.lit(_CHUNK_LEN), F.size("_toks") - F.col("start") + 1).alias(
            "chunk_len"
        ),
        F.substring(
            F.md5(
                F.encode(
                    F.concat_ws(" ", F.slice("_toks", F.col("start"), _CHUNK_LEN)),
                    "UTF-8",
                )
            ),
            1,
            16,
        ).alias("fp"),
    )


def shard_manifest(copies: DataFrame, chunks: DataFrame) -> DataFrame:
    """Stage: explode copy counts to (doc, copy_idx), join the chunk
    table, assign each sequence its deterministic shard (first hex char
    of md5(doc#copy#start) — 16 shards), and aggregate the per-shard
    manifest a training job reads."""
    reps = copies.filter(F.col("n_copies") >= 1).select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.col("n_copies").cast("int"))).alias(
            "copy_idx"
        ),
    )
    seqs = reps.join(chunks, "doc_id")
    shard = F.substring(
        F.md5(
            F.encode(
                F.concat_ws(
                    "#",
                    F.col("doc_id").cast("string"),
                    F.col("copy_idx").cast("string"),
                    F.col("start").cast("string"),
                ),
                "UTF-8",
            )
        ),
        1,
        1,
    )
    return (
        seqs.select("doc_id", "chunk_len", "fp", shard.alias("shard"))
        .groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_seqs"),
            F.count_distinct("doc_id").cast("long").alias("n_docs"),
            F.sum("chunk_len").cast("long").alias("n_tokens"),
            F.min("fp").alias("min_fp"),
            F.max("fp").alias("max_fp"),
        )
        .orderBy("shard")
    )


@query("q114_training_mix_export", Q114_SQL)
def q114_training_mix_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The assembled ENDGAME a pretraining corpus build actually ships:
    curation keep-list (q113's four gates) → per-doc epoch copies from
    the language-mixing recipe (q104/q107) → sliding context-window
    chunking (q108) → deterministic shard assignment (first hex char of
    md5(doc#copy#start) → 16 shards) → the per-shard MANIFEST (sequence
    /doc/token counts + fingerprint range) that a training job reads.

    Every stage is the already-oracled operator; this query pins the
    full composition bit-for-bit against DuckDB. The manifest stands in
    for the shard WRITE (``.write.partitionBy("shard")`` on the seqs
    table is the production sink — the driver contract wants a
    DataFrame back, and counts + fingerprints pin the identical
    content).

    Scale shape: chunks are computed ONCE per (doc, start) and joined
    to the copy explosion (never re-fingerprinted per copy); the copy
    table is doc_id-keyed and tiny (kept docs × small epoch counts);
    the 5-row mixing recipe is broadcast; the final shuffle carries 16
    shard groups of 5 counter fields. Data-sized shuffles are keyed by
    doc_id (gates, chunk join) — the same keys as every upstream stage.

    The stage functions (curation_keep_list / epoch_copies /
    context_chunks / shard_manifest) are SHARED with the
    artifact-to-artifact runner ``tools/run_pipeline.py``, which
    persists each stage as parquet and reproduces this manifest
    hash-exactly — one code path, two execution disciplines."""
    d = load_table(spark, sf_dir, "documents")
    keep = curation_keep_list(spark, sf_dir)
    # two consumers (copy explosion + the chunking semi-join) over the
    # whole gate lineage — materialize the tiny (doc_id, n_copies) table
    copies = maybe_checkpoint(epoch_copies(spark, sf_dir, keep))
    chunks = context_chunks(
        d, copies.filter(F.col("n_copies") >= 1).select("doc_id")
    )
    return shard_manifest(copies, chunks)


# ---------------------------------------------------------------------------
# q120 — token budget impact of substring dedup, per (lang, source)
# ---------------------------------------------------------------------------

Q120_SQL = f"""
WITH {_EXACT_SUBSTR_CTES},
cutspans AS (
  SELECT doc_id, MIN(pos) AS s, MAX(pos) + {_SPAN_K - 1} AS e
  FROM isl GROUP BY doc_id, island
  HAVING MAX(is_canon) = 0
),
p AS (SELECT doc_id, unnest(generate_series(1, len(t))) AS pos FROM toks),
fl AS (
  SELECT p.doc_id, p.pos,
         CASE WHEN c.s IS NOT NULL THEN 1 ELSE 0 END AS cut
  FROM p LEFT JOIN cutspans c
    ON c.doc_id = p.doc_id AND p.pos BETWEEN c.s AND c.e
),
perdoc AS (
  SELECT doc_id, COUNT(*) AS n_tokens, SUM(cut) AS n_cut
  FROM fl GROUP BY doc_id
)
SELECT d.lang, d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN COALESCE(pd.n_cut, 0) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_cut,
       CAST(COALESCE(SUM(pd.n_tokens), 0) AS BIGINT) AS tokens_before,
       CAST(COALESCE(SUM(pd.n_tokens - pd.n_cut), 0) AS BIGINT) AS tokens_after,
       CASE WHEN COALESCE(SUM(pd.n_tokens), 0) = 0 THEN 1.0
            ELSE {exact_round_div_sql('SUM(pd.n_tokens - pd.n_cut)', 'SUM(pd.n_tokens)')} END AS kept_frac
FROM documents d LEFT JOIN perdoc pd ON pd.doc_id = d.doc_id
GROUP BY d.lang, d.source
ORDER BY d.lang, d.source
"""


@query("q120_substring_dedup_budget", Q120_SQL)
def q120_substring_dedup_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipeline-planning view of substring dedup: per (lang,
    source), document counts, how many documents lose at least one
    span, and the token budget before/after the q115 cut — the number
    a mixing plan (q104) consumes when substring dedup sits between
    fuzzy dedup and packing. kept_frac is the exact 4-decimal rational
    (integer HALF-UP — no float rounding crosses the boundary).

    Plan: q115's per-doc counts (span discovery + one application
    scan) joined to the documents metadata and collapsed to a
    group-count-sized aggregate — the added cost over q115 is one
    broadcast-sized join and a tiny shuffle."""
    from ml_with_spark_streaming_spark.operators.exact_substr import apply_cuts

    d = load_table(spark, sf_dir, "documents")
    per_doc = apply_cuts(d, "text", "doc_id", k=_SPAN_K)
    joined = per_doc.join(d.select("doc_id", "lang", "source"), "doc_id")
    return (
        joined.groupBy("lang", "source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum((F.col("n_cut_tokens") > 0).cast("long")).alias("n_docs_cut"),
            F.sum("n_tokens").cast("long").alias("tokens_before"),
            F.sum("n_kept_tokens").cast("long").alias("tokens_after"),
            # all-empty group: nothing to remove -> kept_frac 1.0
            F.when(F.sum("n_tokens") == 0, F.lit(1.0))
            .otherwise(exact_round_div(F.sum("n_kept_tokens"), F.sum("n_tokens")))
            .alias("kept_frac"),
        )
        .orderBy("lang", "source")
    )


# ---------------------------------------------------------------------------
# q121 — temperature-scaled mixture weights (UniMax / multilingual sampling)
# ---------------------------------------------------------------------------

# τ = 2 temperature sampling: share_i ∝ tokens_i^(1/τ) = sqrt(tokens_i)
# — the standard upweight-the-tail recipe for multilingual corpora
# (mT5 §3.1 arXiv:2010.11934, UniMax arXiv:2304.09151). τ = 2 keeps the
# whole computation engine-exact: sqrt is IEEE-754 correctly rounded in
# BOTH engines (unlike pow/ln), ×1000 is an exact-scale product, and
# FLOOR of bit-identical doubles is bit-identical — so sq is a
# deterministic BIGINT and everything after it is integer rationals
# (DIV-based HALF-UP; magnitudes exceed exact_round_div's 2^53 double
# bound, so no double division is used at all).
Q121_SQL = f"""
WITH nt AS (
  SELECT lang,
         CASE WHEN length({CLEAN_SQL}) = 0 THEN 0
              ELSE len(string_split({CLEAN_SQL}, ' ')) END AS n_tokens
  FROM documents
),
per_lang AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS lang_tokens
  FROM nt GROUP BY lang
),
s AS (
  SELECT lang, n_docs, lang_tokens,
         CAST(FLOOR(sqrt(CAST(lang_tokens AS DOUBLE)) * 1000) AS BIGINT) AS sq
  FROM per_lang
),
tot AS (
  SELECT CAST(SUM(lang_tokens) AS BIGINT) AS total_tokens,
         CAST(SUM(sq) AS BIGINT) AS sum_sq
  FROM s
),
sh AS (
  SELECT s.lang, s.n_docs, s.lang_tokens, t.total_tokens,
         CAST(CASE WHEN t.sum_sq = 0 THEN 0
              ELSE (s.sq * 20000 + t.sum_sq) // (2 * t.sum_sq) END AS BIGINT) AS temp_share_x1e4
  FROM s CROSS JOIN tot t
)
SELECT lang, n_docs, lang_tokens, temp_share_x1e4,
       CAST(CASE WHEN lang_tokens = 0 THEN 0
            ELSE (temp_share_x1e4 * total_tokens * 2 + lang_tokens) // (2 * lang_tokens) END AS BIGINT) AS repeat_x1e4
FROM sh
ORDER BY lang
"""


@query("q121_temperature_mixing", Q121_SQL)
def q121_temperature_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture weights (τ = 2): each language's
    training share ∝ sqrt(its token count) — the mT5/UniMax recipe
    that upweights low-resource languages without a hand-declared
    target table (q104's declared-recipe sibling). Emits the share and
    the repeat factor realizing it at the corpus's own token budget,
    both as scaled BIGINTs.

    Engine-exact by construction: τ = 2 makes the only irrational a
    correctly-rounded IEEE sqrt (identical bits in Spark and DuckDB),
    immediately floored to an integer; shares and repeats are then
    integer-DIV HALF-UP rationals — no pow/ln/float-sum ever crosses
    the boundary. The repeat factor is derived FROM the published
    rounded share, so the table is self-consistent.

    Scale: one token-count scan → 5-group agg (map-side combine),
    totals as a broadcast 1-row aggregate — q104's metadata-cost
    shape."""
    from ml_with_spark_streaming_spark.operators.textstats import (
        whitespace_token_count_expr,
    )

    d = load_table(spark, sf_dir, "documents")
    per_lang = maybe_checkpoint(
        d.select(
            "lang",
            whitespace_token_count_expr(clean_text_expr("text")).cast("long").alias("n_tokens"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("lang_tokens"),
        )
    )
    s = per_lang.select(
        "lang",
        "n_docs",
        "lang_tokens",
        F.floor(F.sqrt(F.col("lang_tokens").cast("double")) * 1000).cast("long").alias("sq"),
    )
    tot = s.agg(
        F.sum("lang_tokens").cast("long").alias("total_tokens"),
        F.sum("sq").cast("long").alias("sum_sq"),
    )
    return (
        s.crossJoin(F.broadcast(tot))
        .selectExpr(
            "lang",
            "n_docs",
            "lang_tokens",
            "total_tokens",
            "CAST(CASE WHEN sum_sq = 0 THEN 0 ELSE (sq * 20000 + sum_sq) DIV (2 * sum_sq) END AS LONG) AS temp_share_x1e4",
        )
        .selectExpr(
            "lang",
            "n_docs",
            "lang_tokens",
            "temp_share_x1e4",
            "CAST(CASE WHEN lang_tokens = 0 THEN 0 ELSE (temp_share_x1e4 * total_tokens * 2 + lang_tokens) DIV (2 * lang_tokens) END AS LONG) AS repeat_x1e4",
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# q125 — packing the substring-cleaned corpus (q115 -> q98)
# ---------------------------------------------------------------------------

Q125_SQL = f"""
WITH {_EXACT_SUBSTR_CTES},
cutspans AS (
  SELECT doc_id, MIN(pos) AS s, MAX(pos) + {_SPAN_K - 1} AS e
  FROM isl GROUP BY doc_id, island
  HAVING MAX(is_canon) = 0
),
p AS (SELECT doc_id, unnest(generate_series(1, len(t))) AS pos FROM toks),
fl AS (
  SELECT p.doc_id, p.pos,
         CASE WHEN c.s IS NOT NULL THEN 1 ELSE 0 END AS cut
  FROM p LEFT JOIN cutspans c
    ON c.doc_id = p.doc_id AND p.pos BETWEEN c.s AND c.e
),
nk0 AS (
  SELECT doc_id, COUNT(*) - SUM(cut) AS n_tokens
  FROM fl GROUP BY doc_id
),
nk AS (
  SELECT d.doc_id, COALESCE(x.n_tokens, 0) AS n_tokens
  FROM documents d LEFT JOIN nk0 x ON x.doc_id = d.doc_id
),
cm AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM nk
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(cum AS BIGINT) AS cum_tokens,
       CASE WHEN n_tokens = 0 THEN NULL
            ELSE CAST((cum - n_tokens) // {_CTX} AS BIGINT) END AS chunk_first,
       CASE WHEN n_tokens = 0 THEN NULL
            ELSE CAST((cum - 1) // {_CTX} AS BIGINT) END AS chunk_last
FROM cm
ORDER BY doc_id
"""


@query("q125_packing_after_cuts", Q125_SQL)
def q125_packing_after_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack the substring-CLEANED corpus: q115's kept-token counts fed
    through q98's two-phase distributed prefix sum — the stage order a
    real pipeline runs (dedup → substring cut → pack), so sequence
    boundaries are computed over the text that will actually be
    trained on, not the raw lengths. A fully-cut document contributes
    0 tokens and spans no chunk (NULL bounds, matching q98's
    empty-doc convention).

    Plan: q115's per-doc counts (one tokenize pass shared between span
    discovery and application) checkpointed into the 24-byte/doc
    length table; the packing core is the shared `_pack_from_counts`
    (bucket totals + tiny offset window — never a global window over
    data)."""
    from ml_with_spark_streaming_spark.operators.exact_substr import apply_cuts

    d = load_table(spark, sf_dir, "documents")
    nt = maybe_checkpoint(
        apply_cuts(d, "text", "doc_id", k=_SPAN_K)
        .select(
            "doc_id",
            F.col("n_kept_tokens").alias("n_tokens"),
            (F.col("doc_id") / _BUCKET).cast("long").alias("_b"),
        )
    )
    return _pack_from_counts(nt)


# ---------------------------------------------------------------------------
# q133 — leakage-safe train/heldout split (split by DEDUP COMPONENT)
# ---------------------------------------------------------------------------

Q133_SQL = f"""
WITH RECURSIVE {_DEDUP_COMPONENT_CTES}
SELECT a.doc_id, a.component,
       CASE WHEN substr(md5(CAST(a.component AS VARCHAR) || '#' || 'split'), 1, 8)
                 < 'cccccccc'
            THEN 'train' ELSE 'heldout' END AS split
FROM assigned a
ORDER BY a.doc_id
"""


@query("q133_leakage_safe_split", Q133_SQL)
def q133_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80:20 train/heldout split that CANNOT leak near-duplicates
    across the boundary: the split key is the document's q90 dedup
    COMPONENT (LSH candidates → exact-Jaccard ≥ 0.9 verify → connected
    components), so every member of a near-dup cluster inherits one
    verdict — a paraphrased copy of a heldout doc can never land in
    train. Splitting doc-wise (the naive `hash_sample(doc_id)`)
    silently leaks: any cluster with ≥ 2 docs has a ~2·p·(1−p) chance
    per pair of straddling the boundary, which inflates eval exactly
    like benchmark contamination does.

    The split itself is the q84 content-hash rule applied to the
    component id (md5(component # 'split') first-8-hex < 0.8·2^32) —
    deterministic across layouts, engines, and reruns; changing the
    salt redraws the split without touching the clustering.

    Scale: component assignment is q90's pipeline (bucketed LSH, never
    all-pairs; O(diameter) join rounds); the split adds ONE md5
    projection — no new shuffle. Test pins the no-leak invariant:
    every verified near-dup pair has both sides in the same split.
    """
    d = load_table(spark, sf_dir, "documents")
    assigned = dedup_components(d)
    bucket = F.substring(
        F.md5(
            F.encode(
                F.concat_ws("#", F.col("component").cast("string"), F.lit("split")),
                "UTF-8",
            )
        ),
        1,
        8,
    )
    return (
        assigned.select(
            "doc_id",
            "component",
            F.when(bucket < F.lit("cccccccc"), F.lit("train"))
            .otherwise(F.lit("heldout"))
            .alias("split"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q134 — quality-aware canonical selection (best doc per near-dup cluster)
# ---------------------------------------------------------------------------

Q134_SQL = f"""
WITH RECURSIVE {_DEDUP_COMPONENT_CTES},
q AS (SELECT * FROM {QUALITY_TABLE_SQL} qt),
r AS (
  SELECT a.doc_id, a.component, q.quality,
         ROW_NUMBER() OVER (PARTITION BY a.component
                            ORDER BY q.quality DESC, a.doc_id) AS rn
  FROM assigned a JOIN q ON q.doc_id = a.doc_id
)
SELECT doc_id, component, quality,
       CAST(CASE WHEN rn = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_kept
FROM r
ORDER BY doc_id
"""


@query("q134_canonical_selection", Q134_SQL)
def q134_canonical_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection: within every q90 near-dup
    cluster keep the HIGHEST-quality member (q45's engine-exact score;
    doc_id breaks ties), not the arbitrary min-doc_id that q90's
    is_canonical flag uses. This is what production dedup actually
    ships — when a page was crawled five times, you keep the cleanest
    copy, not the one that happened to get the smallest id.

    Scale: component assignment is q90's bucketed pipeline; the
    quality score is one codegen projection on the same documents
    scan; selection is a window PARTITIONED BY component (cluster-
    sized partitions — verified clusters are tiny by construction at
    threshold 0.9, so no skewed window partition is possible).
    """
    from ml_with_spark_streaming_spark.operators.textstats import quality_score_expr

    d = load_table(spark, sf_dir, "documents")
    assigned = dedup_components(d)
    q = d.select("doc_id", quality_score_expr("text").alias("quality"))
    w = W.partitionBy("component").orderBy(F.desc("quality"), F.asc("doc_id"))
    return (
        assigned.join(q, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .select(
            "doc_id",
            "component",
            "quality",
            (F.col("rn") == 1).cast("long").alias("is_kept"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q135 — DSIR importance-weighted data selection (hashed unigram models)
# ---------------------------------------------------------------------------


def _q135_sql() -> str:
    from ml_with_spark_streaming_spark.operators.dsir import (
        BUCKET_LOGW6_SQL,
        HASH_BUCKET_DUCK,
    )

    bucket = HASH_BUCKET_DUCK.format(tok="tok", b=512)
    return f"""
WITH occ AS (
  SELECT doc_id, lang, {bucket} AS bucket, CAST(COUNT(*) AS BIGINT) AS n_occ
  FROM (
    SELECT doc_id, lang, unnest(string_split({CLEAN_SQL}, ' ')) AS tok
    FROM documents WHERE length({CLEAN_SQL}) > 0
  )
  WHERE tok <> ''
  GROUP BY 1, 2, 3
),
cs AS (SELECT bucket, CAST(SUM(n_occ) AS BIGINT) AS cs FROM occ GROUP BY bucket),
ct AS (SELECT bucket, CAST(SUM(n_occ) AS BIGINT) AS ct FROM occ WHERE lang = 'en' GROUP BY bucket),
tot AS (
  SELECT CAST(SUM(n_occ) AS BIGINT) AS ns,
         CAST(SUM(CASE WHEN lang = 'en' THEN n_occ ELSE 0 END) AS BIGINT) AS nt
  FROM occ
),
w AS (
  SELECT cs.bucket, {BUCKET_LOGW6_SQL} AS w6
  FROM (SELECT cs.bucket, cs.cs, COALESCE(ct.ct, 0) AS ct
        FROM cs LEFT JOIN ct ON ct.bucket = cs.bucket) cs,
       (SELECT ns, nt, CAST(512 AS BIGINT) AS b FROM tot) t
),
per_doc AS (
  SELECT o.doc_id,
         CAST(SUM(o.n_occ) AS BIGINT) AS n_tokens,
         CAST(SUM(o.n_occ * w.w6) AS BIGINT) AS logw_x1e6
  FROM occ o JOIN w ON w.bucket = o.bucket
  GROUP BY o.doc_id
)
SELECT d.doc_id,
       COALESCE(p.n_tokens, 0) AS n_tokens,
       COALESCE(p.logw_x1e6, 0) AS logw_x1e6,
       CAST(CASE WHEN COALESCE(p.logw_x1e6, 0) > 0 THEN 1 ELSE 0 END AS BIGINT) AS selected
FROM documents d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
ORDER BY d.doc_id
"""


@query("q135_dsir_selection", _q135_sql())
def q135_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023): score every document by
    its log importance weight between the TARGET distribution (here
    the 'en' slice — the trusted/in-domain corpus) and the RAW corpus
    distribution, both modeled as add-one-smoothed categoricals over
    512 hashed unigram buckets; keep docs whose total weight is
    positive ("looks more target-like than corpus-like").

    All arithmetic is quantized-BIGINT (four >=1-argument lns per
    bucket via the sqrt+atanh construction), so the oracle is
    hash-exact; see operators/dsir.py for the int64/ln-range bounds
    and the two-shuffle scale shape (model tables are 512 rows
    REGARDLESS of vocabulary — DSIR's hashing point).
    """
    from ml_with_spark_streaming_spark.operators.dsir import dsir_scores

    d = load_table(spark, sf_dir, "documents")
    return dsir_scores(d, F.col("lang") == "en", n_buckets=512)


# ---------------------------------------------------------------------------
# q137 — segment-level (paragraph) dedup, CCNet/C4 boilerplate removal
# ---------------------------------------------------------------------------

Q137_SQL = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS ts
  FROM documents
), seg AS (
  SELECT doc_id, CAST(g.i AS INT) AS pos,
         array_to_string(ts[(g.i*10+1):(g.i*10+10)], ' ') AS para
  FROM toks, LATERAL (SELECT unnest(range((len(ts)+9)//10)) AS i) g
), ranked AS (
  SELECT doc_id, pos, para,
         row_number() OVER (PARTITION BY substr(md5(para),1,16)
                            ORDER BY doc_id, pos) = 1 AS keep
  FROM seg
), agg AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_segs,
         CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         string_agg(CASE WHEN keep THEN para END, ' ' ORDER BY pos) AS text_kept
  FROM ranked GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(a.n_segs, 0) AS n_segs,
       COALESCE(a.n_kept, 0) AS n_kept,
       COALESCE(a.text_kept, '') AS text_kept
FROM documents d LEFT JOIN agg a USING (doc_id)
ORDER BY d.doc_id
"""


@query("q137_segment_dedup", Q137_SQL)
def q137_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-level (paragraph) dedup — the CCNet/C4 curation stage
    (Wenzek et al. 2020; Raffel et al. 2020 §2.2): repeated segments
    (boilerplate, license blocks, navigation text) are cut corpus-wide,
    first occurrence in (doc_id, pos) order wins, and every document is
    reassembled from its surviving segments. Granularity sits between
    document-level (q46/q50) and token-span-level (q110/q115) dedup.

    Segments here are fixed 10-token windows (the fixture corpus has no
    newlines; real corpora pass a newline split — same plan). Scale
    shape: ONE corpus-sized exchange keyed by a 16-hex md5 segment-hash
    prefix (row_number window partitioned by hash), one per-doc
    regroup; no self-join, no global sort, nothing collected. See
    operators/segment_dedup.py.
    """
    from ml_with_spark_streaming_spark.operators.segment_dedup import segment_dedup

    d = load_table(spark, sf_dir, "documents")
    return segment_dedup(d).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q139 — reproducible training-order shuffle (hash-sharded)
# ---------------------------------------------------------------------------

Q139_SQL = """
WITH h AS (
  SELECT doc_id,
         md5(CAST(doc_id AS VARCHAR) || '#shuffle') AS hx
  FROM documents
)
SELECT doc_id,
       CAST(('0x' || substr(hx, 1, 8)) AS BIGINT) % 16 AS shard,
       CAST(row_number() OVER (
              PARTITION BY CAST(('0x' || substr(hx, 1, 8)) AS BIGINT) % 16
              ORDER BY hx, doc_id) AS BIGINT) AS pos
FROM h
ORDER BY shard, pos
"""


@query("q139_training_order", Q139_SQL)
def q139_training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible global shuffle for training export: every document
    gets a (shard, pos) — a deterministic permutation that is a pure
    function of (doc_id, salt), identical across reruns, partition
    layouts, and engines. The stage between the q114 manifest and the
    training run: models want shuffled data, pipelines want the
    shuffle REPRODUCIBLE (restart mid-epoch, re-export byte-identical
    shards, debug a loss spike at step N by reading exactly what the
    model saw). Salt change = fresh epoch permutation.

    Scale shape: one exchange keyed by shard; production writes skip
    the pos column entirely via repartition(shard) +
    sortWithinPartitions (see operators/sampling.py::training_order).
    """
    from ml_with_spark_streaming_spark.operators.sampling import training_order

    d = load_table(spark, sf_dir, "documents")
    return training_order(d, n_shards=16).orderBy("shard", "pos")


# ---------------------------------------------------------------------------
# q142 — per-source corpus scorecard (the governance rollup)
# ---------------------------------------------------------------------------

Q142_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split({CLEAN_SQL}, ' ') AS t
  FROM documents WHERE length({CLEAN_SQL}) > 0
),
grams AS (
  SELECT DISTINCT doc_id, substr(md5(g), 1, 16) AS g FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, greatest(len(t) - 12, 0)),
                                 i -> array_to_string(t[i:i+12], ' '))) AS g
    FROM toks
  )
),
ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
contam AS (
  SELECT c.doc_id,
         CAST(CASE WHEN COUNT(ev.g) > 0 THEN 1 ELSE 0 END AS BIGINT) AS is_contam
  FROM (SELECT doc_id, g FROM grams WHERE doc_id % 97 <> 0) c
  LEFT JOIN ev ON ev.g = c.g
  GROUP BY c.doc_id
),
pop AS (
  SELECT d.doc_id, d.source, d.text,
         md5(array_to_string(string_split({CLEAN_SQL}, ' ')[1:8], ' ')) AS fp,
         q.quality
  FROM documents d JOIN {QUALITY_TABLE_SQL} q ON q.doc_id = d.doc_id
  WHERE d.doc_id % 97 <> 0
),
flags AS (
  SELECT doc_id, source,
         CAST(CASE WHEN doc_id <> MIN(doc_id) OVER (PARTITION BY fp)
              THEN 1 ELSE 0 END AS BIGINT) AS is_dup,
         CAST(CASE WHEN quality < 0.5 THEN 1 ELSE 0 END AS BIGINT) AS is_lowq,
         CAST(length(text) AS BIGINT) AS n_chars
  FROM pop
)
SELECT f.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(f.is_dup) AS BIGINT) AS n_dup_docs,
       CAST(SUM(f.is_lowq) AS BIGINT) AS n_low_quality,
       CAST(SUM(COALESCE(c.is_contam, 0)) AS BIGINT) AS n_contaminated,
       CAST(SUM(f.n_chars) AS BIGINT) AS n_chars_total
FROM flags f LEFT JOIN contam c ON c.doc_id = f.doc_id
GROUP BY f.source
ORDER BY f.source
"""


@query("q142_source_scorecard", Q142_SQL)
def q142_source_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus governance scorecard: for every ingestion
    source, how many documents it contributes and how many of them are
    duplicates (non-canonical under q46's fingerprint dedup), low
    quality (q45's exact-rational score < 0.5 — an integer-safe
    threshold on the already-engine-exact rounded value), or
    benchmark-contaminated (≥1 13-gram hit against the q101 eval
    slice). THE table a data team reads when deciding which source to
    upweight, cap, or cut — every per-doc signal already exists as its
    own query; this is their one-scan-each rollup keyed by provenance.

    All outputs are BIGINT counts (no float aggregation crosses the
    boundary). Scale shape: the fingerprint window shuffles by fp, the
    contamination branch is q101's broadcast-eval shape, and the final
    rollup is one groupBy(source) over per-doc flags — each corpus
    pass is an independent aggregate lineage over the checkpointed
    population slice.
    """
    from ml_with_spark_streaming_spark.operators.decontaminate import (
        contamination_counts,
        eval_ngrams,
    )
    from ml_with_spark_streaming_spark.operators.textstats import (
        fingerprint_expr,
        quality_score_expr,
    )

    d = load_table(spark, sf_dir, "documents")
    pop = maybe_checkpoint(d.filter(F.col("doc_id") % 97 != 0))
    ev = eval_ngrams(d.filter(F.col("doc_id") % 97 == 0))
    contam = contamination_counts(pop, ev).select(
        "doc_id", (F.col("n_contaminated") > 0).cast("long").alias("is_contam")
    )
    w = W.partitionBy("_fp")
    flags = (
        pop.withColumn("_fp", fingerprint_expr("text", 8))
        .withColumn(
            "is_dup",
            (F.col("doc_id") != F.min("doc_id").over(w)).cast("long"),
        )
        .withColumn("is_lowq", (quality_score_expr("text") < 0.5).cast("long"))
        .withColumn("n_chars", F.length("text").cast("long"))
    )
    return (
        flags.join(contam, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("is_dup").cast("long").alias("n_dup_docs"),
            F.sum("is_lowq").cast("long").alias("n_low_quality"),
            F.sum(F.coalesce("is_contam", F.lit(0))).cast("long").alias("n_contaminated"),
            F.sum("n_chars").cast("long").alias("n_chars_total"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q156 — per-segment quality rewrite (FineWeb-style fine-grained filtering)
# ---------------------------------------------------------------------------

Q156_SQL = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS ts
  FROM documents
), seg AS (
  SELECT doc_id, CAST(g.i AS INT) AS pos,
         array_to_string(ts[(g.i*10+1):(g.i*10+10)], ' ') AS para
  FROM toks, LATERAL (SELECT unnest(range((len(ts)+9)//10)) AS i) g
), q AS (
  SELECT doc_id, pos, para,
         length(para) AS n,
         length(para) - length(regexp_replace(para, '[A-Za-z]', '', 'g')) AS na,
         length(regexp_replace(para, '[A-Za-z0-9\\s]', '', 'g')) AS np,
         least(len(list_filter(string_split_regex(trim(para), '\\s+'), t -> t <> '')), 50) AS wcap
  FROM seg
), flag AS (
  SELECT doc_id, pos, para,
         (250*na + 100*(n - np) + 3*wcap*n) * 100 >= 67 * 500 * n AS keep
  FROM q
), agg AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_segs,
         CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         string_agg(CASE WHEN keep THEN para END, ' ' ORDER BY pos) AS text_kept
  FROM flag GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(a.n_segs, 0) AS n_segs,
       COALESCE(a.n_kept, 0) AS n_kept,
       COALESCE(a.text_kept, '') AS text_kept
FROM documents d LEFT JOIN agg a USING (doc_id)
ORDER BY d.doc_id
"""


@query("q156_segment_quality_rewrite", Q156_SQL)
def q156_segment_quality_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fine-grained quality filtering (FineWeb, Penedo et al. 2024;
    C4's line-level rules, Raffel et al. 2020 §2.2): every segment is
    scored with the q45 exact quality rational and documents are
    rebuilt from only the segments passing an UNROUNDED pure-integer
    threshold (cross-multiplied rational, so no engine can disagree
    at a rounding boundary) — a bad paragraph costs that paragraph,
    not the document. Complements q137 (segment dedup) and q113
    (doc-level gate); ``operators/segment_dedup.py::
    segment_quality_rewrite``.

    Scale shape: scoring is a codegen projection on the segment table
    — quality needs NO cross-document state, so the only corpus-sized
    exchange is the per-doc regroup.
    """
    from ml_with_spark_streaming_spark.operators.segment_dedup import (
        segment_quality_rewrite,
    )

    d = load_table(spark, sf_dir, "documents")
    return segment_quality_rewrite(d, "text", "doc_id").orderBy("doc_id")


# ---------------------------------------------------------------------------
# q157 — UTF-8 hygiene normalization (mojibake / control / zero-width audit)
# ---------------------------------------------------------------------------

from ml_with_spark_streaming_spark.operators.textstats import (  # noqa: E402
    CTRL_CLASS,
    NBSP,
    REPL_CHAR,
    ZW_CLASS,
    hygiene_counts,
    normalize_text_expr,
)

# The synthetic corpus is clean, so (the q92 pattern) the query plants
# deterministic transmission damage per doc_id and runs the REAL
# normalization machinery over it; both engines synthesize the
# identical damaged string from the same expression.
_DMG = {
    1: " note​",          # NBSP + zero-width space
    2: "\x07alert\x1b",             # BEL + ESC control chars
    3: "caf�",                 # UTF-8 decode damage marker
    4: " ​﻿\x01�!",  # one of everything
}


def _dmg_case_sql() -> str:
    whens = " ".join(
        f"WHEN doc_id % 5 = {k} THEN text || '{v}'" for k, v in _DMG.items()
    )
    return f"CASE {whens} ELSE text END"


Q157_SQL = f"""
WITH damaged AS (
  SELECT doc_id, {_dmg_case_sql()} AS t FROM documents
)
SELECT doc_id,
  CAST(length(t) - length(regexp_replace(t, '{CTRL_CLASS}', '', 'g')) AS BIGINT) AS n_ctrl,
  CAST(length(t) - length(regexp_replace(t, '{ZW_CLASS}', '', 'g')) AS BIGINT) AS n_zw,
  CAST(length(t) - length(regexp_replace(t, '{REPL_CHAR}', '', 'g')) AS BIGINT) AS n_repl,
  CAST(length(t) - length(regexp_replace(t, '{NBSP}', '', 'g')) AS BIGINT) AS n_nbsp,
  md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
      '{CTRL_CLASS}', '', 'g'),
      '{ZW_CLASS}', '', 'g'),
      '{REPL_CHAR}', '', 'g'),
      '{NBSP}', ' ', 'g')) AS normalized_md5
FROM damaged
ORDER BY doc_id
"""


@query("q157_utf8_hygiene", Q157_SQL)
def q157_utf8_hygiene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UTF-8 hygiene pass — the content-preserving normalization a web
    corpus runs BEFORE storage (distinct from q40's aggressive
    reference featurizer): strip control chars, zero-width
    chars/BOM, and U+FFFD decode-damage markers; NBSP becomes a plain
    space. Damage tallies per document plus the md5 of the normalized
    text (``operators/textstats.py::normalize_text_expr``,
    idempotence pinned by test). The synthetic corpus is clean, so
    the query PLANTS deterministic damage per doc_id (q92's fixture
    pattern) and both engines normalize the identical damaged string.

    Scale shape: one codegen projection inside the scan — counts via
    the length-difference trick, no explode, no shuffle at all except
    the presentation sort.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dmg = F.col("text")
    expr = None
    for k, v in _DMG.items():
        cond = F.col("doc_id") % 5 == k
        branch = F.concat(F.col("text"), F.lit(v))
        expr = F.when(cond, branch) if expr is None else expr.when(cond, branch)
    t = expr.otherwise(dmg).alias("t")
    base = F.col("t")
    cnt = hygiene_counts(base)
    return (
        d.select("doc_id", t)
        .select(
            "doc_id",
            cnt["n_ctrl"].alias("n_ctrl"),
            cnt["n_zw"].alias("n_zw"),
            cnt["n_repl"].alias("n_repl"),
            cnt["n_nbsp"].alias("n_nbsp"),
            F.md5(F.encode(normalize_text_expr(base), "UTF-8")).alias("normalized_md5"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q158 — hard-negative mining (top-k similar, excluding near-dup clusters)
# ---------------------------------------------------------------------------

Q158_SQL = f"""
WITH RECURSIVE {_EMB_COMP_CTES},
q AS (
  SELECT e.vec_id AS q_id, e.embedding AS q_vec, a.component AS q_comp
  FROM embeddings e JOIN assigned a ON a.vec_id = e.vec_id
  WHERE e.vec_id < 10
),
scored AS (
  SELECT q.q_id, c.vec_id,
         ROUND({_COS_SQL.format(a='q.q_vec', b='c.embedding')}, 4) AS cosine,
         a.component AS neg_component
  FROM embeddings c
  JOIN assigned a ON a.vec_id = c.vec_id
  CROSS JOIN q
  WHERE q.q_id <> c.vec_id AND a.component <> q.q_comp
)
SELECT q_id, vec_id, cosine, neg_component, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank
  FROM scored
) t
WHERE rank <= 3
ORDER BY q_id, rank
"""


@query("q158_hard_negatives", Q158_SQL)
def q158_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor
    embedding, the top-3 MOST similar vectors that are NOT in the
    anchor's near-duplicate cluster. Plain top-k (q53) would hand a
    contrastive batch its own paraphrases as negatives — false
    negatives that poison the loss (Robinson et al. 2021,
    arXiv:2010.04592 hard-negative sampling; SimCSE-style batch
    construction) — so the q99 dedup components define the exclusion
    zone: same component == positive, never a negative.

    Composition: q99's component assignment (cosine edges → connected
    components on the capped-exact ``vec_id < 1000`` oracle slice) ×
    q53's broadcast cosine top-k, with the component anti-filter
    applied BEFORE ranking.

    Scale shape: component table is a narrow (id → component) map
    broadcast onto the scored pairs; scoring stays q53's shape
    (anchors broadcast, one corpus pass, partial top-k). At 100 TB
    the anchor set rides the q106 IVF probe path instead of the
    brute-force pass — the exclusion join is unchanged.
    """
    from ml_with_spark_streaming_spark.operators.similarity import (
        cosine_expr,
        norm_expr,
        safe_denom,
        dot_expr,
    )

    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 1000)
    assigned = maybe_checkpoint(_embedding_components(e))
    anchors = (
        e.filter(F.col("vec_id") < 10)
        .join(assigned, "vec_id")
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_vec"),
            F.col("component").alias("q_comp"),
        )
        .withColumn("_qn", norm_expr(F.col("q_vec")))
    )
    cn = (
        e.join(assigned, "vec_id")
        .withColumnRenamed("component", "neg_component")
        .withColumn("_cn", norm_expr(F.col("embedding")))
    )
    scored = (
        cn.crossJoin(F.broadcast(anchors))
        .filter(
            (F.col("q_id") != F.col("vec_id"))
            & (F.col("neg_component") != F.col("q_comp"))
        )
        .select(
            "q_id",
            "vec_id",
            F.round(
                dot_expr(F.col("q_vec"), F.col("embedding"))
                / (safe_denom(F.col("_qn")) * safe_denom(F.col("_cn"))),
                4,
            ).alias("cosine"),
            "neg_component",
        )
    )
    w = W.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .orderBy("q_id", "rank")
    )


@query("q165_hard_negatives_ivf", no_oracle_reason="IVF-probed, approximate by construction")
def q165_hard_negatives_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q158's hard-negative mining in its 100 TB shape — the runnable
    composition the q158 docstring promises: the FULL embeddings table
    (no vec_id cap), dedup components from the sign-LSH candidate gate
    (q100's scalable path — banded bucket shuffle, never all-pairs),
    and scoring through q106's IVF probe (real KMeans centroids, seed
    42) with the component anti-filter applied INSIDE the probe,
    before ranking (``operators/similarity.py::ivf_topk`` q_group/
    c_group — filtering after top-k would return fewer than k when an
    anchor's own paraphrase cluster crowds the probed buckets).

    Per anchor the work is nprobe bucket joins, not a corpus pass;
    the component map is a narrow (id -> component) table joined onto
    the bucketed candidates. Nothing here is quadratic in the corpus.

    Rows-only: which negatives an approximate index surfaces is not
    SQL-expressible, but fully deterministic (seeded KMeans, seeded
    hyperplanes, id tie-breaks). Recall vs the exact exclusion-aware
    top-k is pinned on a planted-cluster fixture by
    tests/test_similarity.py::test_ivf_hard_negatives_recall — the
    q126 discipline applied to q158. The capped-exact q158 stays as
    the oracle twin for the arithmetic.

    Index plumbing: the KMeans fit + assignment come from the
    PERSISTED ``IVFIndex`` artifact (fit-once/probe-many,
    ``operators/ann_index.py``), and the sign-LSH knobs derive from
    the corpus size RECORDED IN the artifact's sidecar — no per-run
    ``count()`` action over the embeddings table.
    """
    from ml_with_spark_streaming_spark.operators.ann_index import ivf_index_for
    from ml_with_spark_streaming_spark.operators.similarity import (
        derive_signlsh_knobs,
        ivf_topk,
        signlsh_neardup,
    )

    e = load_table(spark, sf_dir, "embeddings")
    idx = ivf_index_for(e, sf_dir, n_centroids=16, c_vec="embedding", seed=42)
    n_planes, bands = derive_signlsh_knobs(idx.n_vectors)
    edges = signlsh_neardup(
        e, threshold=0.45, n_planes=n_planes, bands=bands,
        c_id="vec_id", c_vec="embedding",
    ).select("id1", "id2")
    comp = connected_components(edges).withColumnRenamed("id", "vec_id")
    assigned = maybe_checkpoint(
        e.select("vec_id")
        .join(comp, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce("component", F.col("vec_id")).cast("long").alias("component"),
        )
    )
    anchors = (
        e.filter(F.col("vec_id") < 10)
        .join(assigned, "vec_id")
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_vec"),
            F.col("component").alias("q_comp"),
        )
    )
    # The component map attaches to the PROBED CANDIDATES inside
    # ivf_topk (c_group_map), not to the whole corpus: the corpus side
    # stays the narrow (vec_id, embedding) table, which removes a full
    # corpus-sized join (e ⋈ assigned) from the plan and shrinks the
    # group-attach join from corpus-sized to candidate-sized
    # (round-12, guide §2.3/§3). `assigned` is checkpointed above, so
    # its second reference here costs nothing extra.
    return (
        ivf_topk(
            anchors,
            e,
            k=3,
            nprobe=4,
            centroids=idx.centroids,
            assignments=idx.assignments,
            q_group="q_comp",
            c_group="neg_component",
            c_group_map=assigned.withColumnRenamed("component", "neg_component"),
        )
        .select(
            "q_id",
            "vec_id",
            "cosine",
            "neg_component",
            F.col("rank").cast("long").alias("rank"),
        )
        .orderBy("q_id", "rank")
    )


@query("q166_semdedup", no_oracle_reason="KMeans clustering isn't SQL-expressible")
def q166_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup proper (Abbas et al. 2023) over the embeddings table:
    KMeans clusters (seed 42, the q106 fit), exact cosine pairs ONLY
    within each cluster, components, keep-one-per-component — the
    k-means-scoped semantic dedup the paper describes, completing the
    family next to q99 (capped-exact twin), q100 (sign-LSH gate) and
    q123 (the cluster profile view).

    Threshold 0.4 here: the synthetic embeddings carry no planted
    near-identical vectors (max pairwise cosine ~0.5), so the paper's
    0.95 operating point would make the query vacuously empty; 0.4 is
    q99's edge threshold, so the component structure is comparable.
    Deterministic (seeded fit, id tie-breaks) — rows-only stable;
    design-regime exactness (cluster-scoped == all-pairs on planted
    near-identical clusters) is pinned by
    tests/test_similarity.py::test_semdedup_planted_clusters.

    Scale: pair search is an equi-join on cluster over the persisted
    assignment table — n²/k pairs for k clusters, and k is DERIVED as
    ceil(√n) (``derive_semdedup_knobs``, the paper's k ≈ √n regime)
    from the corpus size, not hardcoded: total pair work stays ~n^1.5
    and expected cluster size √n as the corpus grows (cluster-size
    bound pinned by tests/test_ann_index.py). The fit + assignment
    come from the persisted ``IVFIndex`` artifact (fit-once/
    probe-many, ``operators/ann_index.py``) — no per-query KMeans.
    Nothing corpus-wide is ever all-pairs.
    """
    from ml_with_spark_streaming_spark.operators.ann_index import ivf_index_for
    from ml_with_spark_streaming_spark.operators.similarity import semdedup

    e = load_table(spark, sf_dir, "embeddings")
    # n_centroids=None -> k = ceil(sqrt(n)), derived at build time and
    # frozen into the artifact
    idx = ivf_index_for(e, sf_dir, n_centroids=None, c_vec="embedding", seed=42)
    return semdedup(e, threshold=0.4, assignments=idx.assignments).orderBy("vec_id")


# ---------------------------------------------------------------------------
# q160 — benchmark-registry decontamination (N benchmarks, one corpus pass)
# ---------------------------------------------------------------------------

_Q160_BENCHES = {"a": 97, "b": 89, "c": 83}  # doc_id % m == 0 slices

Q160_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split({{clean}}, ' ') AS t
  FROM documents WHERE length({{clean}}) > 0
),
grams AS (
  SELECT DISTINCT doc_id, substr(md5(g), 1, 16) AS g FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, greatest(len(t) - 12, 0)),
                                 i -> array_to_string(t[i:i+12], ' '))) AS g
    FROM toks
  )
),
tagged AS (
  SELECT g,
         {', '.join(f'MAX(CASE WHEN doc_id % {m} = 0 THEN 1 ELSE 0 END) AS hit_{b}' for b, m in _Q160_BENCHES.items())}
  FROM grams
  WHERE {' OR '.join(f'doc_id % {m} = 0' for m in _Q160_BENCHES.values())}
  GROUP BY g
),
corpus AS (
  SELECT doc_id, g FROM grams
  WHERE {' AND '.join(f'doc_id % {m} <> 0' for m in _Q160_BENCHES.values())}
),
per_doc AS (
  SELECT c.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_grams,
         {', '.join(f'CAST(SUM(COALESCE(t.hit_{b}, 0)) AS BIGINT) AS n_hit_{b}' for b in _Q160_BENCHES)}
  FROM corpus c LEFT JOIN tagged t ON t.g = c.g
  GROUP BY c.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(p.n_grams, 0) AS BIGINT) AS n_grams,
       {', '.join(f'CAST(COALESCE(p.n_hit_{b}, 0) AS BIGINT) AS n_hit_{b}' for b in _Q160_BENCHES)},
       CAST({' + '.join(f'CASE WHEN COALESCE(p.n_hit_{b}, 0) > 0 THEN 1 ELSE 0 END' for b in _Q160_BENCHES)} AS BIGINT) AS n_benchmarks_hit,
       CAST(CASE WHEN {' + '.join(f'CASE WHEN COALESCE(p.n_hit_{b}, 0) > 0 THEN 1 ELSE 0 END' for b in _Q160_BENCHES)} = 0 THEN 1 ELSE 0 END AS INT) AS keep
FROM documents d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
WHERE {' AND '.join(f'd.doc_id % {m} <> 0' for m in _Q160_BENCHES.values())}
ORDER BY d.doc_id
""".format(clean=CLEAN_SQL)


@query("q160_benchmark_registry_decon", Q160_SQL)
def q160_benchmark_registry_decon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination against a REGISTRY of benchmarks in one corpus
    pass — production pipelines screen against dozens of eval sets
    (MMLU, GSM8K, HumanEval, ...), and rescanning 100 TB per benchmark
    is the naive trap q101 would fall into if run N times. The tagged
    gram table (one row per distinct eval gram, a 0/1 flag per
    benchmark — ``operators/decontaminate.py::tagged_eval_ngrams``)
    broadcasts once; each benchmark costs one conditional sum inside
    the SAME per-doc aggregation. Output: per corpus doc, the 13-gram
    hit count against each benchmark, how many benchmarks it touches,
    and the strict keep verdict (clean of ALL).

    Benchmarks here are the q101-convention synthetic slices
    (doc_id % 97/89/83 == 0); the corpus is every doc in none.
    """
    from ml_with_spark_streaming_spark.operators.decontaminate import (
        multi_contamination_counts,
        tagged_eval_ngrams,
    )

    d = load_table(spark, sf_dir, "documents")
    benches = {
        b: d.filter(F.col("doc_id") % m == 0) for b, m in _Q160_BENCHES.items()
    }
    corpus = d
    for m in _Q160_BENCHES.values():
        corpus = corpus.filter(F.col("doc_id") % m != 0)
    tagged = maybe_checkpoint(tagged_eval_ngrams(benches))
    return multi_contamination_counts(
        corpus, tagged, list(_Q160_BENCHES)
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q161 — cross-source duplication matrix (who copies whom), counts-only
# ---------------------------------------------------------------------------

Q161_SQL = f"""
WITH fp AS (
  SELECT source,
         md5(array_to_string(string_split({CLEAN_SQL}, ' ')[1:8], ' ')) AS f
  FROM documents
),
cnt AS (SELECT f, source, CAST(COUNT(*) AS BIGINT) AS c FROM fp GROUP BY f, source),
pairs AS (
  SELECT a.source AS source_a, b.source AS source_b,
         SUM(CASE WHEN a.source = b.source
                  THEN a.c * (a.c - 1) // 2
                  ELSE a.c * b.c END) AS dup_pairs
  FROM cnt a JOIN cnt b
    ON a.f = b.f AND a.source <= b.source
  GROUP BY 1, 2
)
SELECT source_a, source_b, CAST(dup_pairs AS BIGINT) AS dup_pairs
FROM pairs WHERE dup_pairs > 0
ORDER BY source_a, source_b
"""


@query("q161_source_duplication_matrix", Q161_SQL)
def q161_source_duplication_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix — which ingestion sources copy
    each other (mirror sites, syndication, re-crawls): for every
    source pair, how many duplicate-document pairs share a q46
    fingerprint, computed from per-(fingerprint, source) COUNTS only
    — cross pairs are c_a·c_b and within-source pairs C(c,2), so no
    document pair is ever materialized and a boilerplate fingerprint
    shared by a million docs costs two count rows, not 10^12 join
    rows. The q142 governance scorecard's off-diagonal companion.

    Scale shape: one fingerprint-keyed count groupBy (the q46
    shuffle), then a self-join of the per-source COUNT table on the
    fingerprint — duplicate-group-bounded, orders of magnitude
    smaller than the corpus — and one final small groupBy.
    """
    from ml_with_spark_streaming_spark.operators.textstats import fingerprint_expr

    d = load_table(spark, sf_dir, "documents").select(
        "source", fingerprint_expr("text", 8).alias("f")
    )
    cnt = maybe_checkpoint(
        d.groupBy("f", "source").agg(F.count("*").cast("long").alias("c"))
    )
    a = cnt.select("f", F.col("source").alias("source_a"), F.col("c").alias("ca"))
    b = cnt.select("f", F.col("source").alias("source_b"), F.col("c").alias("cb"))
    return (
        a.join(b, "f")
        .filter(F.col("source_a") <= F.col("source_b"))
        .withColumn(
            "pp",
            F.when(
                F.col("source_a") == F.col("source_b"),
                F.expr("ca * (ca - 1) DIV 2"),  # always even; stays BIGINT
            ).otherwise(F.col("ca") * F.col("cb")),
        )
        .groupBy("source_a", "source_b")
        .agg(F.sum("pp").cast("long").alias("dup_pairs"))
        .filter(F.col("dup_pairs") > 0)
        .orderBy("source_a", "source_b")
    )


# ---------------------------------------------------------------------------
# q164 — dedup selection-bias audit: removal rate per quality decile
# ---------------------------------------------------------------------------

Q164_SQL = f"""
WITH qc AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n,
         CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS BIGINT) AS na,
         CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS BIGINT) AS np,
         CAST(least(CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(text), '\\s+')) END, 50) AS BIGINT) AS wcap,
         md5(array_to_string(string_split({CLEAN_SQL}, ' ')[1:8], ' ')) AS fp
  FROM documents
),
scored AS (
  SELECT doc_id, fp,
         CASE WHEN n > 0
              THEN (250*na + 100*(n - np) + 3*wcap*n) * 10000 // (500*n)
              ELSE 2000 END AS score_x10000
  FROM qc
),
ranked AS (
  SELECT doc_id, score_x10000,
         ROW_NUMBER() OVER (ORDER BY score_x10000, doc_id) AS rn,
         COUNT(*) OVER () AS n_total,
         ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) > 1 AS removed
  FROM scored
)
SELECT CAST((rn - 1) * 10 // n_total + 1 AS BIGINT) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN removed THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       CAST(SUM(CASE WHEN removed THEN 1 ELSE 0 END) * 10000 // COUNT(*) AS BIGINT)
         AS removed_x10000
FROM ranked GROUP BY 1 ORDER BY decile
"""


@query("q164_dedup_bias_audit", Q164_SQL)
def q164_dedup_bias_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selection-bias audit for the dedup stage: per GLOBAL quality
    decile, how many documents exact dedup (q46 keep-first) would
    remove — the check that a filter stage is not disproportionately
    deleting one stratum (dedup that mostly eats low-quality docs is
    doing quality filtering by accident; one that eats high-quality
    docs is losing signal). Strata audits like this run after every
    destructive stage of a production corpus build.

    Engine-exact: the quality score is the UNROUNDED q45 rational
    floored at 4 decimals in pure integers (num·10⁴ DIV den), the
    decile is exact-rank arithmetic ((rn−1)·10 DIV n), the rate is an
    integer rational ×10⁴ — no doubles anywhere.

    Scale shape: the global ranking uses q33's two-phase pattern —
    ``repartitionByRange`` on the (score, id) total order, local
    row_number per range partition, offsets prefix-summed over the
    P-row count table and broadcast back; NO partition-less window
    ever touches the data. The removed flag is q46's fingerprint
    window (duplicate-group-sized partitions).
    """
    d = load_table(spark, sf_dir, "documents")
    scored = maybe_checkpoint(integer_quality_scored(d))

    w_fp = W.partitionBy("fp").orderBy("doc_id")
    flagged = scored.withColumn(
        "removed", (F.row_number().over(w_fp) > 1).cast("int")
    )
    return selection_bias_audit(flagged)


def integer_quality_scored(d: DataFrame) -> DataFrame:
    """``(doc_id, fp, score_x10000)``: the UNROUNDED q45 quality
    rational floored at 4 decimals in pure integers (num·10⁴ DIV den)
    plus the q46 fingerprint — q164's scoring projection, shared with
    the pipeline runner's audit stage."""
    from ml_with_spark_streaming_spark.operators.textstats import (
        char_counts,
        fingerprint_expr,
        whitespace_token_count_expr,
    )

    cc = char_counts("text")
    n = cc["n_chars"].cast("long")
    na = cc["n_alpha"].cast("long")
    np_ = cc["n_punct"].cast("long")
    wcap = F.least(whitespace_token_count_expr("text"), F.lit(50)).cast("long")
    num = 250 * na + 100 * (n - np_) + 3 * wcap * n
    return d.select(
        "doc_id",
        fingerprint_expr("text", 8).alias("fp"),
        num.alias("_num"),
        (500 * n).alias("_den"),
    ).selectExpr(
        "doc_id",
        "fp",
        # pure-integer floor division, no doubles anywhere
        "CASE WHEN _den > 0 THEN (_num * 10000) DIV _den ELSE 2000 END AS score_x10000",
    )


def selection_bias_audit(flagged: DataFrame) -> DataFrame:
    """Per-GLOBAL-quality-decile removal rates over ``flagged`` =
    ``(doc_id, score_x10000, removed:int)`` — q164's strata report as
    a standalone stage, so ANY destructive filter (dedup, the
    pipeline's composed keep list) can emit its bias audit. Scale
    shape: q33's two-phase global ranking (repartitionByRange + local
    row_number + broadcast P-row prefix-sum offsets); NO partition-less
    window touches the data."""
    spark = flagged.sparkSession
    parts = max(int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 1)
    ranged = flagged.repartitionByRange(
        parts, "score_x10000", "doc_id"
    ).withColumn("_pid", F.spark_partition_id())
    w_pid = W.orderBy("_pid")
    offsets = (
        ranged.groupBy("_pid")
        .agg(F.count("*").alias("_cnt"))
        .select(
            "_pid",
            F.coalesce(
                F.sum("_cnt").over(w_pid.rowsBetween(W.unboundedPreceding, -1)),
                F.lit(0),
            ).alias("_off"),
            F.sum("_cnt")
            .over(w_pid.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
            .alias("_n"),
        )
    )
    w_local = W.partitionBy("_pid").orderBy("score_x10000", "doc_id")
    ranked = ranged.join(F.broadcast(offsets), "_pid").select(
        "removed",
        (F.col("_off") + F.row_number().over(w_local)).alias("_rn"),
        "_n",
    )
    return (
        ranked.groupBy(
            (F.expr("(_rn - 1) * 10 DIV _n") + 1).cast("long").alias("decile")
        )
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("removed").cast("long").alias("n_removed"),
        )
        .withColumn(
            "removed_x10000", F.expr("n_removed * 10000 DIV n_docs").cast("long")
        )
        .orderBy("decile")
    )
