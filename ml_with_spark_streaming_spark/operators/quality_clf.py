"""Corpus-trained document-quality classifier (distillation scorer).

The standard bootstrap for a pretraining quality filter (GPT-3 §A /
CCNet / fastText-style): derive weak labels from a cheap heuristic,
train a linear bag-of-words scorer on them, then score the whole
corpus with the model — the model generalizes the heuristic to
vocabulary evidence and is far cheaper than the heuristic on re-runs
(one broadcast join vs. the full regex chain).

The reference repo trains sklearn linear models over HashingTF(2500)
features (PAC/passiveAgressiveModel.py:69,93); this operator is that
same shape — hashed bag-of-words → linear weight table → score — but
with every step a DataFrame op and every number an exact integer so a
DuckDB oracle can reproduce it bit-for-bit:

* feature bucket = first 3 hex chars of md5(token) → 4096 buckets
  (portable: both engines share md5; no murmur3 in DuckDB);
* training = ONE distinct + ONE groupBy over (label, bucket) presence
  counts — Bernoulli NB sufficient statistics;
* weights = Laplace-smoothed presence-RATE contrast, fixed-point
  integers: w_f = (n1_f+1)·S div (N1+2) − (n0_f+1)·S div (N0+2) with
  S = 10^6. Integer floor-division keeps the weight table engine-exact
  (log-odds NB weights would put cross-engine ``log`` doubles in the
  hash path) and bounds every weight by ±S, so a document score is
  ≤ n_buckets·S ≈ 4·10^9 — no BIGINT overflow at any corpus size
  (the naive cross-multiplied contrast overflows int64 near 10^8
  training docs);
* scoring = inner join against the ≤4096-row broadcast weight table +
  one per-doc sum; decision = score > 0.

Scale shape: the corpus is scanned twice (once for presence — shared
lineage with training — once implied by the caller's metadata scan);
presence dedup is per-document inside the token array (no shuffle),
so the only data-sized shuffles are the training join and the per-doc
score sum, both keyed by doc. Training statistics crossing the driver:
zero — the 1-row class-totals table is broadcast-joined, never
collected. The weight table itself is ≤ 4096 rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ml_with_spark_streaming_spark.functions.text import clean_text_expr, tokens_expr
from ml_with_spark_streaming_spark.operators.textstats import quality_score_expr

# 3 hex chars of md5 → 16^3 = 4096 feature buckets (reference dimension
# was 2500; a power of 16 keeps the bucket a plain substr in both
# engines with no hex→int conversion, which DuckDB lacks).
BUCKET_HEX_CHARS = 3
# fixed-point scale for the rate-contrast weights
WEIGHT_SCALE = 1_000_000
# heuristic label threshold (q45's exact-rational quality score)
LABEL_THRESHOLD = 0.5
# deterministic 80:20 split: doc_id % TRAIN_MOD < TRAIN_KEEP trains
TRAIN_MOD = 5
TRAIN_KEEP = 4


def _idiv(num: Column, den: Column | int) -> Column:
    """Exact BIGINT floor division for non-negative operands.

    ``floor(a/b)`` on longs routes through a double divide, which can
    mis-floor when the true quotient sits within one ulp of an integer;
    ``(a − a mod b)/b`` divides exactly-divisible longs, whose integer
    quotient IEEE division returns exactly. Matches DuckDB ``//``."""
    d = F.lit(den) if isinstance(den, int) else den
    return ((num - F.pmod(num, d)) / d).cast("long")


def feature_presence(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Distinct (id, fb) presence pairs — fb is the 3-hex-char md5
    bucket of each cleaned token: the Bernoulli feature representation.

    Dedup happens PER DOCUMENT inside the token array
    (``array_distinct`` before the explode), not as a global
    ``.distinct()`` — the pair set is identical because ``id_col`` is
    one-row-per-document in every caller (``documents`` is keyed by
    doc_id; streaming micro-batches carry one row per doc), and the
    global distinct was a full data-sized shuffle + aggregate of the
    presence table that bought nothing (round-12; sf0.1 A/B min
    1.09 -> 0.87 s for the operator, full q112 min 2.09 -> 1.42 s;
    set-parity asserted, pinned by tests/test_quality_clf.py). Were a
    caller ever to feed duplicate id rows, scores scale by the copy
    count and the ``score > 0`` decision is sign-invariant — but the
    trained WEIGHTS would double-count, so training callers must keep
    the one-row-per-doc contract."""
    # no size()>0 pre-filter: explode of an empty token array already
    # yields no rows, and the filter's size(_t) re-evaluates the whole
    # clean+tokenize chain once more per row (Filter and Generate each
    # inline the projection) — identical output, one less regex pass
    toks = docs.select(
        F.col(id_col), tokens_expr(clean_text_expr(text_col)).alias("_t")
    )
    return toks.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(
                F.transform(
                    "_t",
                    lambda tk: F.substring(
                        F.md5(F.encode(tk, "UTF-8")), 1, BUCKET_HEX_CHARS
                    ),
                )
            )
        ).alias("fb"),
    )


def heuristic_labels(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, y) weak labels: y = 1 iff the q45 exact-rational quality
    heuristic ≥ 0.5. Pure projection — computed inline with the scan."""
    return docs.select(
        F.col(id_col),
        (quality_score_expr(text_col) >= F.lit(LABEL_THRESHOLD)).cast("int").alias("y"),
    )


def classifier_weights(presence: DataFrame, labels: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Train the scorer: (fb, w) with the fixed-point presence-rate
    contrast weight. ONE join + ONE groupBy(fb) + a broadcast 1-row
    totals table; nothing collects to the driver."""
    tr = labels.filter(F.pmod(F.col(id_col), F.lit(TRAIN_MOD)) < F.lit(TRAIN_KEEP))
    totals = tr.agg(
        F.sum("y").cast("long").alias("n1t"),
        (F.count("*") - F.sum("y")).cast("long").alias("n0t"),
    )
    per_fb = (
        presence.join(tr, id_col)
        .groupBy("fb")
        .agg(
            F.sum("y").cast("long").alias("n1"),
            (F.count("*") - F.sum("y")).cast("long").alias("n0"),
        )
    )
    return per_fb.crossJoin(F.broadcast(totals)).select(
        "fb",
        (
            _idiv((F.col("n1") + 1) * WEIGHT_SCALE, F.col("n1t") + 2)
            - _idiv((F.col("n0") + 1) * WEIGHT_SCALE, F.col("n0t") + 2)
        ).alias("w"),
    )


def classifier_scores(presence: DataFrame, weights: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, score): Σ over present buckets of w — the broadcast
    weight-table join + per-doc sum. Buckets unseen in training carry
    implicit weight 0 (inner join drops them — identical on both
    engines). Decision rule: score > 0 ⇒ high quality."""
    return (
        presence.join(F.broadcast(weights), "fb")
        .groupBy(id_col)
        .agg(F.sum("w").cast("long").alias("score"))
    )


# --------------------------------------------------------------------------
# DuckDB oracle twins (composable CTE fragments)
# --------------------------------------------------------------------------

def presence_sql(clean_sql: str) -> str:
    """CTE body list reproducing feature_presence as ``pres(doc_id, fb)``.
    Expects a ``documents`` view; ``clean_sql`` is the engine's shared
    cleaning expression over ``text``."""
    return f"""ctoks AS (
  SELECT doc_id, string_split({clean_sql}, ' ') AS t
  FROM documents WHERE length({clean_sql}) > 0
),
pres AS (
  SELECT DISTINCT doc_id, substr(md5(tk), 1, {BUCKET_HEX_CHARS}) AS fb
  FROM (SELECT doc_id, unnest(t) AS tk FROM ctoks)
)"""


# labels twin lives with the q45 quality CTE (plans/curation.py) — the
# weight/score algebra twin:
WEIGHTS_SQL = f"""ctr AS (
  SELECT l.doc_id, l.y FROM lab l WHERE l.doc_id % {TRAIN_MOD} < {TRAIN_KEEP}
),
ctot AS (
  SELECT CAST(SUM(y) AS BIGINT) AS n1t, CAST(COUNT(*) - SUM(y) AS BIGINT) AS n0t FROM ctr
),
cfc AS (
  SELECT p.fb,
         CAST(SUM(t.y) AS BIGINT) AS n1,
         CAST(COUNT(*) - SUM(t.y) AS BIGINT) AS n0
  FROM pres p JOIN ctr t USING (doc_id)
  GROUP BY p.fb
),
cw AS (
  SELECT fb,
         ((n1 + 1) * {WEIGHT_SCALE}) // (n1t + 2)
         - ((n0 + 1) * {WEIGHT_SCALE}) // (n0t + 2) AS w
  FROM cfc, ctot
),
csc AS (
  SELECT p.doc_id, CAST(SUM(w.w) AS BIGINT) AS score
  FROM pres p JOIN cw w USING (fb)
  GROUP BY p.doc_id
)"""
