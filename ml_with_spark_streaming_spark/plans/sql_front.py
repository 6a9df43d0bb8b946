"""Statement-level SQL front door: run a registered query from its SQL
TEXT through ``spark.sql`` instead of the DataFrame API.

Every registered query already carries an ANSI-SQL twin (the DuckDB
oracle). For the relational subset that twin is dialect-neutral enough
to execute UNMODIFIED in Spark SQL — so the engine accepts the SQL
statement directly, with the oracle string as the single source of
truth (no third copy of the semantics to drift). ``SQL_RUNNABLE``
pins exactly which queries qualify; each one is verified by test to
produce the SAME rows and column names as its DataFrame-API path
(both compile to Catalyst plans over the same parquet scans, so the
physical strategies — broadcast joins, partial aggregation, pushdown
— are the optimizer's choice either way).

A second tier, ``SQL_REWRITTEN``, covers twins whose only
DuckDB-isms are MECHANICAL dialect gaps: ``spark_dialect`` rewrites
them token-for-token (``string_split``→``split``, ``//``→``DIV``,
``strftime``→``date_format`` with format-code conversion,
``x[a:b]`` slices→``slice``, ``CAST(.. AS VARCHAR)``→``STRING``,
``epoch_us``→``unix_micros``, list lambdas→higher-order functions,
…) and the rewritten text runs under ``spark.sql``. Every promoted
query is STILL pinned by the same rows+column-names-equal test as
the verbatim tier — the rewrite layer earns no trust by itself.

A third tier, ``SQL_RECURSIVE``, executes the ``WITH RECURSIVE``
twins whose recursion is UNION-distinct (q90/q93/q99/q113/q114/
q133/q134/q158). Spark 4.1's native recursive CTE accepts only
``UNION ALL`` ([UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE]) and min-label
propagation needs UNION-distinct to terminate, so these run through
``run_recursive_sql``: a quote/paren-aware WITH-clause parser plus a
fixpoint driver that materializes each CTE in order and iterates the
self-referencing one (seed with the non-recursive members; loop
``spark.sql`` over the recursive members; union-distinct; stop when
the row set stops growing — bounded by the component diameter).

A fourth tier, ``SQL_ASOF``, lowers DuckDB's ``ASOF JOIN`` — syntax
Spark SQL does not have — to the union + running ``last() ignore
nulls`` window form the q29 DataFrame path uses
(``rewrite_asof_join``). With it, ALL 142 oracled queries run from
their SQL text; the exclusion list is empty. Former blockers closed
mechanically in round 9: struct literals
``{'k': v}`` → ``named_struct`` (q65) and the WITH RECURSIVE tier;
in round 8:
``list_reduce`` folds (head-seeded ``aggregate``), ``ord``→``ascii``,
``array_to_string(list(x ORDER BY o), d)``→``listagg ... WITHIN
GROUP``; and two oracles were made dialect-neutral without changing
their values (q69's QUALIFY → CTE + WHERE; q164's integer widths made
explicit — DuckDB's ``length()`` is BIGINT, Spark's is INT, so the
unwidened arithmetic overflowed under ANSI mode).

Usage::

    from ml_with_spark_streaming_spark.plans.sql_front import run_sql
    df = run_sql(spark, "/root/testdata/sf0.01", "q01_pricing_summary")
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from ml_with_spark_streaming_spark.plans.registry import ORACLES
from ml_with_spark_streaming_spark.schemas import TABLE_SCHEMAS
from ml_with_spark_streaming_spark.sources.batch import load_table

# Verified dialect-portable queries: each runs verbatim under
# spark.sql AND matches the DataFrame-API rows + column names
# (tests/test_sql_front.py re-proves the whole list).
SQL_RUNNABLE: tuple[str, ...] = (
    "q01_pricing_summary",
    "q02_revenue_by_nation",
    "q03_top_unshipped_orders",
    "q04_priority_semi_join",
    "q05_customers_no_orders",
    "q06_promo_revenue",
    "q07_nation_volume",
    "q08_topk_parts_per_brand",
    "q09_running_customer_total",
    "q11_rollup_quantity",
    "q12_cube_orders",
    "q13_grouping_sets",
    "q14_setop_intersect",
    "q15_setop_except",
    "q16_union_all_counts",
    "q17_distinct_flags",
    "q18_conditional_agg",
    "q19_event_stats",
    "q20_pivot_status",
    "q21_above_avg_suppliers",
    "q22_above_brand_avg_parts",
    "q23_string_functions",
    "q25_math_functions",
    "q27_value_histogram",
    "q28_top_orders",
    "q30_range_join_bands",
    "q31_above_global_avg_parts",
    "q32_order_history_lag_lead",
    "q33_acctbal_quartiles",
    "q39_best_order_per_customer",
    "q63_running_user_totals",
    "q64_grouped_agg_udaf",
    "q66_approx_count_distinct",
    "q67_regional_revenue_6way",
    "q68_or_predicate_revenue",
    "q69_big_spenders_vs_segment",
    "q75_unpivot_event_stats",
    "q76_null_safe_join",
    "q78_dedup_replayed_events",
    "q79_full_outer_customer_orders",
    "q80_stats_aggregates",
    "q87_waiting_suppliers",
    "q94_funnel_steps",
    "q122_crossmodal_integrity",
    "q155_fuzzy_name_pairs",
)


# Tier 2: verified dialect-REWRITTEN queries — spark_dialect() maps
# their DuckDB-only surface mechanically; each one is pinned by the
# same rows+column-names test as the verbatim tier.
SQL_REWRITTEN: tuple[str, ...] = (
    "q101_decontaminate",
    "q104_corpus_mixing",
    "q105_incremental_dedup",
    "q107_mixture_realization",
    "q108_token_chunks",
    "q10_event_deltas",
    "q110_exact_substr_spans",
    "q112_quality_classifier",
    "q115_exact_substr_apply",
    "q116_inverted_index",
    "q117_bm25_topk",
    "q120_substring_dedup_budget",
    "q121_temperature_mixing",
    "q124_bm25_multi_query",
    "q125_packing_after_cuts",
    "q127_daily_anomalies",
    "q128_winnowing_pairs",
    "q130_bm25_ln_topk",
    "q131_bigram_lm_nll",
    "q132_semantic_decontamination",
    "q135_dsir_selection",
    "q137_segment_dedup",
    "q139_training_order",
    "q140_containment_pairs",
    "q141_frequent_ngrams",
    "q142_source_scorecard",
    "q143_phrase_search",
    "q144_vocab_growth",
    "q145_nation_pagerank",
    "q146_zorder_layout",
    "q147_bloom_semijoin",
    "q148_hybrid_retrieval",
    "q149_shuffle_skew_profile",
    "q150_compaction_plan",
    "q151_incremental_view",
    "q152_exact_quantiles",
    "q153_char_entropy",
    "q154_scd2_history",
    "q156_segment_quality_rewrite",
    "q157_utf8_hygiene",
    "q159_scd2_asof",
    "q160_benchmark_registry_decon",
    "q161_source_duplication_matrix",
    "q163_scd2_temporal_join",
    "q164_dedup_bias_audit",
    "q167_dedup_recall_audit",
    "q168_incremental_index",
    "q171_dedup_recall_audit_sampled",
    "q24_date_functions",
    "q26_json_extract",
    "q34_range_frame_neighbors",
    "q35_brand_size_arrays",
    "q36_order_quantity_arrays",
    "q37_part_name_tokens",
    "q38_segment_percentiles",
    "q40_clean_documents",
    "q41_token_stats",
    "q42_word_count_topk",
    "q43_stopword_ratio",
    "q44_langid_heuristic",
    "q45_quality_score",
    "q46_fingerprint_dedup",
    "q48_tfidf_top_terms",
    "q49_map_functions",
    "q50_minhash_candidates",
    "q51_jaccard_pairs",
    "q53_cosine_topk",
    "q54_embedding_neardup",
    "q56_multimodal_features",
    "q57_frame_sample_plan",
    "q58_fuzzy_dedup_pipeline",
    "q60_tumbling_counts",
    "q61_sliding_user_activity",
    "q65_udtf_lateral_tokens",
    "q62_session_windows",
    "q77_interval_join_attribution",
    "q81_cosine_topk_arrow",
    "q83_winnowing_fingerprints",
    "q84_hash_sample",
    "q85_stratified_sample",
    "q86_variant_json",
    "q89_recursive_hierarchy",
    "q91_repetition_signals",
    "q92_pii_scrub",
    "q95_retention_cohorts",
    "q96_gapfill_resample",
    "q97_table_profile",
    "q98_sequence_packing",
)


# Tier 3: WITH RECURSIVE twins. ``run_recursive_sql`` lowers a
# UNION ALL recursion onto Spark 4.1's NATIVE recursive-CTE executor
# (handed to spark.sql whole — pinned by
# test_recursive_union_all_runs_natively); only UNION-distinct
# recursions go through the semi-naive fixpoint driver below (each
# CTE materializes in order, the self-referencing one iterates until
# the row SET stops growing — bounded by the component diameter, the
# same small-diameter argument q90's DataFrame CC loop documents).
# All 8 current twins are the UNION-distinct remainder BY NECESSITY,
# not convenience — each one's recursion is a min-label walk over the
# SYMMETRIC edge closure, where distinct is load-bearing for
# termination: verified empirically on this Spark build
# (test_recursive_walk_cannot_lower_natively) that (a) UNION inside
# the recursion raises [UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE] and
# (b) the mechanical UNION→UNION ALL rewrite of the cyclic walk
# re-derives already-seen (id, label) rows forever and dies on the
# recursion-depth limit instead of terminating. Moving DISTINCT to
# the outer select cannot fix (b): termination itself depends on the
# in-recursion dedup, and the single-self-reference rule bars a
# NOT EXISTS anti-join against the accumulated set. Pinned by the
# same rows+column-names test as tiers 1-2.
# NOTE: this tier exists for SQL-surface completeness; the PRODUCTION
# path for these queries is the DataFrame API (operators/graph.py's
# checkpointed min-label loop) — the oracle's naive walk materializes
# every (node, reached-label) pair, which is the formulation DuckDB
# runs, not the one you'd run at 100 TB.
SQL_RECURSIVE: tuple[str, ...] = (
    "q90_dedup_clusters",
    "q93_curation_pipeline",
    "q99_embedding_dedup_clusters",
    "q113_curation_with_classifier",
    "q114_training_mix_export",
    "q133_leakage_safe_split",
    "q134_canonical_selection",
    "q158_hard_negatives",
)

# A fourth tier: twins using DuckDB's ASOF JOIN — syntax Spark SQL does
# not have at all. ``rewrite_asof_join`` lowers the supported shape to
# the union + running last() window formulation the q29 DataFrame path
# already uses (one shuffle on the key, linear scan per partition —
# never a per-row range explosion); parity with the DataFrame path is
# pinned like every other promoted query.
SQL_ASOF: tuple[str, ...] = ("q29_asof_purchase_view",)


# --- the mechanical DuckDB -> Spark SQL dialect layer ---------------

# function renames applied OUTSIDE quoted strings, longest-name first
# (epoch_us before epoch). All are 1:1 in arity and argument order.
_FN_RENAMES = [
    ("string_split_regex", "split"),
    ("string_split", "split"),
    ("array_to_string", "array_join"),
    ("quantile_cont", "percentile"),
    ("list_contains", "array_contains"),
    ("list_transform", "transform"),
    # generate_series is NOT in this list: its empty-range semantics
    # differ from sequence's, so it has a dedicated guarded rewrite
    ("json_extract", "get_json_object"),
    ("list_filter", "filter"),
    ("list_sort", "sort_array"),
    ("list_min", "array_min"),
    ("list_max", "array_max"),
    ("list_distinct", "array_distinct"),
    ("list_intersect", "array_intersect"),
    ("list", "array_agg"),
    ("epoch_us", "unix_micros"),
    ("ord", "ascii"),  # both: codepoint of the first character
    ("epoch_ms", "unix_millis"),
    ("unnest", "explode"),
    ("epoch", "unix_seconds"),
    ("len", "size"),
]

# strftime %-codes -> java.time patterns (the subset the twins use)
_STRF = {"%Y": "yyyy", "%m": "MM", "%d": "dd", "%H": "HH", "%M": "mm", "%S": "ss", "%%": "%"}


def _segments(sql: str) -> list[tuple[str, str]]:
    """Tokenize into ('', code) / ('q', quoted string) / ('c', -- comment)
    runs. Apostrophes inside comments (e.g. "the engine's") must NOT
    open a string — comments are recognized first when outside quotes."""
    out, cur, i, n = [], [], 0, len(sql)
    while i < n:
        c = sql[i]
        if c == "'":
            if cur:
                out.append(("", "".join(cur)))
                cur = []
            j = i + 1
            while j < n and sql[j] != "'":
                j += 1
            out.append(("q", sql[i : j + 1]))
            i = j + 1
        elif c == "-" and sql[i : i + 2] == "--":
            if cur:
                out.append(("", "".join(cur)))
                cur = []
            j = sql.find("\n", i)
            j = n if j < 0 else j
            out.append(("c", sql[i:j]))
            i = j
        else:
            cur.append(c)
            i += 1
    if cur:
        out.append(("", "".join(cur)))
    return out


def _in_quote_map(s: str) -> list[bool]:
    """Per-character flag: inside a single-quoted string or a --
    comment (the delimiters themselves count as inside)."""
    out = []
    for kind, seg in _segments(s):
        out.extend([kind != ""] * len(seg))
    return out


def _split_args(inner: str) -> list[str]:
    """Split a call's argument text at top-level commas (quote- and
    paren/bracket-aware)."""
    qmap = _in_quote_map(inner)
    args, d, last = [], 0, 0
    for i, c in enumerate(inner):
        if qmap[i]:
            continue
        if c in "([":
            d += 1
        elif c in ")]":
            d -= 1
        elif c == "," and d == 0:
            args.append(inner[last:i].strip())
            last = i + 1
    args.append(inner[last:].strip())
    return args


def _rewrite_calls(sql: str, fname: str, repl) -> str:
    """Rewrite every ``fname(...)`` call outside quotes: ``repl`` gets
    the top-level argument list and returns the replacement text, or
    None to leave that occurrence alone."""
    pat = re.compile(rf"\b{fname}\s*\(")
    pos = 0
    while True:
        qmap = _in_quote_map(sql)
        m = next((mm for mm in pat.finditer(sql, pos) if not qmap[mm.start()]), None)
        if m is None:
            return sql
        d, j = 0, m.end() - 1
        while j < len(sql):
            if not qmap[j]:
                if sql[j] == "(":
                    d += 1
                elif sql[j] == ")":
                    d -= 1
                    if d == 0:
                        break
            j += 1
        new = repl(_split_args(sql[m.end() : j]))
        if new is None:
            pos = m.start() + 1
            continue
        sql = sql[: m.start()] + new + sql[j + 1 :]
        pos = m.start()


_INTERVAL_SECONDS = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
                     "hour": 3600, "hours": 3600, "day": 86400, "days": 86400}


def _special_calls(sql: str) -> str:
    """DuckDB calls needing more than a rename."""
    # list_sum over doubles -> higher-order fold
    sql = _rewrite_calls(
        sql, "list_sum",
        lambda a: f"aggregate({a[0]}, CAST(0.0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE))"
        if len(a) == 1 else None,
    )
    # range(n) = [0..n-1] (empty when n<=0; a bare sequence(0, n-1)
    # would yield [0,-1] at n=0 — Spark infers a negative step)
    sql = _rewrite_calls(
        sql, "range",
        lambda a: f"slice(sequence(0, greatest(({a[0]}) - 1, 0)), 1, ({a[0]}))"
        if len(a) == 1 else None,
    )
    # range(a, b) = [a..b-1]
    sql = _rewrite_calls(
        sql, "range",
        lambda a: f"slice(sequence(({a[0]}), greatest(({a[1]}) - 1, ({a[0]}))), 1, "
        f"greatest(({a[1]}) - ({a[0]}), 0))" if len(a) == 2 else None,
    )
    # list_reduce(L, F): DuckDB folds left with the FIRST element as
    # the init value -> aggregate over the tail, seeded with head
    # (single-element lists return the element unchanged in both)
    sql = _rewrite_calls(
        sql, "list_reduce",
        lambda a: (
            f"aggregate(slice(({a[0]}), 2, greatest(size({a[0]}) - 1, 0)), "
            f"element_at(({a[0]}), 1), {a[1]})"
        )
        if len(a) == 2 else None,
    )

    # array_to_string(list(X ORDER BY O), D): Spark's array_agg takes
    # no ORDER BY — but the composite is exactly listagg WITHIN GROUP
    def _ats(a):
        if len(a) != 2:
            return None
        inner = a[0].strip()
        if not (inner.startswith("list(") and inner.endswith(")")):
            return None
        body = inner[5:-1]
        # split at the top-level ORDER BY (paren/quote aware)
        qmap = _in_quote_map(body)
        d, cut = 0, -1
        for i in range(len(body)):
            if qmap[i]:
                continue
            if body[i] in "([":
                d += 1
            elif body[i] in ")]":
                d -= 1
            elif d == 0 and body[i:].upper().startswith(" ORDER BY "):
                cut = i
                break
        if cut < 0:
            return None
        x, o = body[:cut].strip(), body[cut + len(" ORDER BY "):].strip()
        return f"listagg({x}, {a[1]}) WITHIN GROUP (ORDER BY {o})"

    sql = _rewrite_calls(sql, "array_to_string", _ats)

    # DuckDB regexp_extract_all/_extract default to group 0 (whole
    # match); Spark defaults to group 1
    for fn in ("regexp_extract_all", "regexp_extract"):
        sql = _rewrite_calls(
            sql, fn,
            lambda a, fn=fn: f"{fn}({a[0]}, {a[1]}, 0)" if len(a) == 2 else None,
        )
    # DuckDB's 1-arg encode(str) -> UTF-8 bytes
    sql = _rewrite_calls(
        sql, "encode",
        lambda a: f"encode({a[0]}, 'UTF-8')" if len(a) == 1 else None,
    )
    # time_bucket(INTERVAL 'N unit', ts) -> epoch-aligned floor
    def _tb(a):
        if len(a) != 2:
            return None
        m = re.match(r"INTERVAL\s+'(\d+)\s+(\w+)'", a[0], re.IGNORECASE)
        if not m or m.group(2).lower() not in _INTERVAL_SECONDS:
            return None
        s = int(m.group(1)) * _INTERVAL_SECONDS[m.group(2).lower()]
        return f"timestamp_seconds((unix_seconds({a[1]}) DIV {s}) * {s})"

    sql = _rewrite_calls(sql, "time_bucket", _tb)

    # string_agg(x, d ORDER BY o) -> listagg(x, d) WITHIN GROUP (ORDER BY o)
    def _sagg(a):
        if len(a) != 2 or " ORDER BY " not in a[1]:
            return None
        delim, order = a[1].split(" ORDER BY ", 1)
        return f"listagg({a[0]}, {delim.strip()}) WITHIN GROUP (ORDER BY {order.strip()})"

    sql = _rewrite_calls(sql, "string_agg", _sagg)

    # ('0x' || HEX) used as an integer literal -> conv(HEX, 16, 10)
    pos = 0
    while True:
        qmap = _in_quote_map(sql)
        m = next(
            (mm for mm in re.finditer(r"\(\s*'0x'\s*\|\|\s*", sql)
             if not qmap[mm.start()] and mm.start() >= pos),
            None,
        )
        if m is None:
            break
        d, j = 0, m.start()
        while j < len(sql):
            if not qmap[j] or sql[j] == "'":
                if sql[j] == "(" and not qmap[j]:
                    d += 1
                elif sql[j] == ")" and not qmap[j]:
                    d -= 1
                    if d == 0:
                        break
            j += 1
        inner = sql[m.end() : j]
        sql = f"{sql[:m.start()]}(conv({inner}, 16, 10)){sql[j + 1:]}"
        pos = m.start() + 1
    return sql


def _map_quoted(sql: str, outside, inside=None) -> str:
    """Apply ``outside`` to code segments of ``sql`` (not quoted
    strings, not -- comments) and ``inside`` to the quoted strings."""
    return "".join(
        outside(seg) if kind == "" else (inside(seg) if inside and kind == "q" else seg)
        for kind, seg in _segments(sql)
    )


def _rewrite_brackets(sql: str) -> str:
    """DuckDB bracket syntax on a primary expression (identifier or
    call chain, walked back quote/paren-aware):

    * ``EXPR[a:b]`` (1-based inclusive slice, start clamped at 1,
      empty when b < a) -> ``slice(EXPR, greatest(a,1),
      greatest((b)-greatest(a,1)+1, 0))``
    * ``EXPR[i]`` (1-based index / map key) -> ``element_at(EXPR, i)``

    Bracket groups NOT preceded by an expression (literal lists like
    ``[0, 1, 2]``) are left for ``_rewrite_literal_arrays``."""
    while True:
        quoted = _in_quote_map(sql)
        hit = None
        for i, ch in enumerate(sql):
            if ch != "[" or quoted[i]:
                continue
            # matching ] at bracket depth 0 (quote-aware)
            depth, j = 0, i
            while j < len(sql):
                if not quoted[j]:
                    if sql[j] == "[":
                        depth += 1
                    elif sql[j] == "]":
                        depth -= 1
                        if depth == 0:
                            break
                j += 1
            inner = sql[i + 1 : j]
            # top-level ':' split (quote/paren aware)
            d, colon = 0, None
            innerq = _in_quote_map(inner)
            for k, c in enumerate(inner):
                if innerq[k]:
                    continue
                if c in "([":
                    d += 1
                elif c in ")]":
                    d -= 1
                elif c == ":" and d == 0:
                    colon = k
                    break
            # walk back over the bracketed primary expression
            s = i
            while s > 0:
                c = sql[s - 1]
                if c == ")":
                    d = 0
                    s -= 1
                    while s > 0:
                        if sql[s] == "'":  # skip quoted strings backwards
                            s -= 1
                            while s > 0 and sql[s] != "'":
                                s -= 1
                        elif sql[s] == ")":
                            d += 1
                        elif sql[s] == "(":
                            d -= 1
                            if d == 0:
                                break
                        s -= 1
                elif re.match(r"[A-Za-z0-9_.\]]", c):
                    s -= 1
                else:
                    break
            if s == i:
                continue  # no preceding expression: literal list
            hit = (s, i, j, inner, colon)
            break
        if hit is None:
            return sql
        s, i, j, inner, colon = hit
        expr = sql[s:i]
        if colon is not None:
            a, b = inner[:colon], inner[colon + 1 :]
            st = f"greatest({a}, 1)"
            sql = (
                f"{sql[:s]}slice({expr}, {st}, "
                f"greatest(({b})-{st}+1, 0)){sql[j + 1:]}"
            )
        else:
            sql = f"{sql[:s]}element_at({expr}, {inner}){sql[j + 1:]}"


def _rewrite_struct_literals(sql: str) -> str:
    """DuckDB struct literal ``{'k1': v1, 'k2': v2}`` ->
    ``named_struct('k1', v1, 'k2', v2)``. Fires only on brace groups
    whose every top-level element is a quoted-key ``'k': v`` pair
    (quote/paren/brace-aware) — anything else is left alone."""
    while True:
        qmap = _in_quote_map(sql)
        hit = None
        for i, ch in enumerate(sql):
            if ch != "{" or qmap[i]:
                continue
            d, j = 0, i
            while j < len(sql):
                if not qmap[j]:
                    if sql[j] == "{":
                        d += 1
                    elif sql[j] == "}":
                        d -= 1
                        if d == 0:
                            break
                j += 1
            if j >= len(sql):
                return sql
            inner = sql[i + 1 : j]
            # split at top-level commas, then each element at its first
            # top-level ':' — keys must be quoted strings
            iq = _in_quote_map(inner)
            elems, depth, last = [], 0, 0
            for k, c in enumerate(inner):
                if iq[k]:
                    continue
                if c in "([{":
                    depth += 1
                elif c in ")]}":
                    depth -= 1
                elif c == "," and depth == 0:
                    elems.append(inner[last:k])
                    last = k + 1
            elems.append(inner[last:])
            parts, ok = [], True
            for e in elems:
                eq = _in_quote_map(e)
                d2, cut = 0, -1
                for k, c in enumerate(e):
                    if eq[k]:
                        continue
                    if c in "([{":
                        d2 += 1
                    elif c in ")]}":
                        d2 -= 1
                    elif c == ":" and d2 == 0:
                        cut = k
                        break
                key = e[:cut].strip() if cut > 0 else ""
                if not (key.startswith("'") and key.endswith("'") and len(key) > 2):
                    ok = False
                    break
                parts.append(f"{key}, {e[cut + 1:].strip()}")
            if ok:
                hit = (i, j, f"named_struct({', '.join(parts)})")
                break
        if hit is None:
            return sql
        i, j, new = hit
        sql = sql[:i] + new + sql[j + 1 :]


def _rewrite_literal_arrays(sql: str) -> str:
    """``['a', 'b']`` / ``[0, 1, 2]`` -> ``array(...)`` (literal
    element lists only — slices were rewritten away first).
    Quote-aware: a ``[...]``-shaped substring INSIDE a string literal
    (e.g. a regex character class ``'[0, 1]'``) must survive, so a
    match whose ``[`` sits inside quotes is skipped."""
    lit = r"(?:'[^']*'|-?\d+(?:\.\d+)?)"
    pat = re.compile(rf"\[(\s*{lit}(?:\s*,\s*{lit})*\s*)\]")
    pos = 0
    while True:
        qmap = _in_quote_map(sql)
        m = next(
            (mm for mm in pat.finditer(sql, pos) if not qmap[mm.start()]), None
        )
        if m is None:
            return sql
        new = f"array({m.group(1)})"
        sql = sql[: m.start()] + new + sql[m.end() :]
        pos = m.start() + len(new)


def _call_args(sql: str, open_paren: int) -> tuple[list[str], int]:
    """Split the argument list of the call whose ``(`` is at
    ``open_paren`` on top-level commas (quote/paren-aware). Returns
    (args, index of the closing paren)."""
    qmap = _in_quote_map(sql)
    d, j, args, last = 1, open_paren + 1, [], open_paren + 1
    while j < len(sql):
        if not qmap[j]:
            if sql[j] == "(":
                d += 1
            elif sql[j] == ")":
                d -= 1
                if d == 0:
                    break
            elif sql[j] == "," and d == 1:
                args.append(sql[last:j])
                last = j + 1
        j += 1
    args.append(sql[last:j])
    return args, j


def _rewrite_generate_series(sql: str) -> str:
    """DuckDB ``generate_series(a, b)`` is inclusive and EMPTY when
    b < a; Spark ``sequence(a, b)`` is inclusive but DESCENDS when
    b < a. The guarded form preserves the empty-range semantics (and
    the element type, which a CASE over a bare ``array()`` would not):
    ``slice(sequence(a, greatest(b, a)), 1, greatest(b-a+1, 0))``.
    The 3-arg (step) form maps to plain ``sequence(a, b, s)`` — the
    engines agree whenever the step sign matches the direction, the
    only regime the promoted twins use."""
    pos = 0
    while True:
        qmap = _in_quote_map(sql)
        m = next(
            (
                mm
                for mm in re.finditer(r"\bgenerate_series\s*\(", sql)
                if mm.start() >= pos and not qmap[mm.start()]
            ),
            None,
        )
        if m is None:
            return sql
        args, close = _call_args(sql, m.end() - 1)
        if len(args) == 2:
            a, b = (x.strip() for x in args)
            new = (
                f"slice(sequence(({a}), greatest(({b}), ({a}))), 1, "
                f"greatest(({b})-({a})+1, 0))"
            )
        else:
            new = f"sequence({', '.join(x.strip() for x in args)})"
        sql = sql[: m.start()] + new + sql[close + 1 :]
        pos = m.start() + len(new)


def _strip_regex_g_flag(sql: str) -> str:
    """DuckDB ``regexp_replace(x, pat, rep, 'g')``: Spark replaces
    globally by default and takes no flags argument. Scoped to 4-arg
    ``regexp_replace`` calls whose LAST top-level argument is the
    literal ``'g'`` — a bare ``, 'g')`` anywhere else (another
    function's real argument, or a 3-arg replace whose REPLACEMENT is
    the letter g) must survive."""
    pos = 0
    while True:
        qmap = _in_quote_map(sql)
        m = next(
            (
                mm
                for mm in re.finditer(r"\bregexp_replace\s*\(", sql)
                if mm.start() >= pos and not qmap[mm.start()]
            ),
            None,
        )
        if m is None:
            return sql
        args, close = _call_args(sql, m.end() - 1)
        if len(args) == 4 and args[3].strip() == "'g'":
            inner = ",".join(args[:3])
            sql = f"{sql[:m.end()]}{inner}{sql[close:]}"
        pos = m.end()


def _rewrite_strftime(sql: str) -> str:
    """``strftime(x, '%Y-%m-%d')`` -> ``date_format(x, 'yyyy-MM-dd')``.
    The format lives INSIDE quotes, so this runs before the
    quote-splitting renames: convert every quoted string that uses a
    known %-code, then rename the function outside quotes."""

    def _fmt(q: str) -> str:
        if not re.search(r"%[YmdHMS%]", q):
            return q
        for k, v in _STRF.items():
            q = q.replace(k, v)
        return q

    sql = _map_quoted(sql, lambda s: s, inside=_fmt)
    return _map_quoted(sql, lambda s: re.sub(r"\bstrftime\s*\(", "date_format(", s))


def _outside_rewrites(seg: str) -> str:
    for old, new in _FN_RENAMES:
        seg = re.sub(rf"\b{old}\s*\(", f"{new}(", seg, flags=re.IGNORECASE)
    # integer division; ISO day-of-week; VARCHAR; IGNORE NULLS position
    seg = seg.replace("//", " DIV ")
    seg = re.sub(r"\bisodow\s*\(([^()]*)\)", r"(weekday(\1) + 1)", seg)
    seg = re.sub(r"\bAS\s+VARCHAR\b", "AS STRING", seg, flags=re.IGNORECASE)
    seg = re.sub(
        r"\b(\w+)\(([^()]*?)\s+IGNORE\s+NULLS\)", r"\1(\2) IGNORE NULLS", seg
    )
    # decimal literals: DuckDB types 1.0 as DOUBLE-compatible, Spark as
    # DECIMAL — the D suffix keeps arithmetic in doubles end to end
    seg = re.sub(r"(?<![\w.])(\d+\.\d+)(?![\w.])", r"\1D", seg)
    return seg


def _lateralize_tvf(sql: str) -> str:
    """DuckDB's table-valued ``FROM x, UNNEST(arr) AS u(i)`` arrives
    here (after the renames) as ``, explode(arr) AS u(i)`` — a
    correlated table function, which Spark requires to be marked
    LATERAL. Only the table-alias form ``AS name(col)`` qualifies
    (a SELECT-list explode can't carry that alias shape)."""
    pos = 0
    while True:
        qmap = _in_quote_map(sql)
        m = next(
            (mm for mm in re.finditer(r"\bexplode\s*\(", sql)
             if mm.start() >= pos and not qmap[mm.start()]),
            None,
        )
        if m is None:
            return sql
        k = m.start() - 1
        while k >= 0 and sql[k].isspace():
            k -= 1
        d, j = 0, m.end() - 1
        while j < len(sql):
            if not qmap[j]:
                if sql[j] == "(":
                    d += 1
                elif sql[j] == ")":
                    d -= 1
                    if d == 0:
                        break
            j += 1
        follows = re.match(r"\s*AS\s+\w+\s*\(\s*\w+\s*\)", sql[j + 1 :])
        if k >= 0 and sql[k] == "," and follows:
            sql = sql[: m.start()] + "LATERAL " + sql[m.start() :]
            pos = m.start() + 9
        else:
            pos = m.start() + 1


def _tvf_wrap_arrays(sql: str) -> str:
    """An ARRAY expression used as a table reference (DuckDB's
    ``FROM range(n) t(i)`` arrives here as ``JOIN slice(...) AS
    t(i)``) must be exploded to row form for Spark."""
    pos = 0
    while True:
        qmap = _in_quote_map(sql)
        m = next(
            (mm for mm in re.finditer(r"\bslice\s*\(", sql)
             if mm.start() >= pos and not qmap[mm.start()]),
            None,
        )
        if m is None:
            return sql
        k = m.start() - 1
        while k >= 0 and sql[k].isspace():
            k -= 1
        head = sql[max(0, k - 5) : k + 1].upper()
        table_pos = k >= 0 and (
            sql[k] == "," or head.endswith("JOIN") or head.endswith("FROM")
        )
        d, j = 0, m.end() - 1
        while j < len(sql):
            if not qmap[j]:
                if sql[j] == "(":
                    d += 1
                elif sql[j] == ")":
                    d -= 1
                    if d == 0:
                        break
            j += 1
        follows = re.match(r"\s*AS\s+\w+\s*\(\s*\w+\s*\)", sql[j + 1 :])
        if table_pos and follows:
            sql = (
                sql[: m.start()] + "explode(" + sql[m.start() : j + 1] + ")"
                + sql[j + 1 :]
            )
            pos = j + 9
        else:
            pos = m.start() + 1


def spark_dialect(sql: str) -> str:
    """Mechanically rewrite a DuckDB oracle statement into Spark SQL.
    Purely textual — every promoted query is separately pinned by the
    rows+names-equal test, the rewrite layer itself is never trusted."""
    sql = _map_quoted(sql, lambda s: s, inside=lambda q: q.replace("\\", "\\\\"))
    sql = _rewrite_brackets(sql)
    sql = _rewrite_struct_literals(sql)
    sql = _rewrite_strftime(sql)
    sql = _special_calls(sql)
    sql = _map_quoted(sql, _outside_rewrites)
    sql = _rewrite_generate_series(sql)
    sql = _lateralize_tvf(sql)
    sql = _tvf_wrap_arrays(sql)
    sql = _rewrite_literal_arrays(sql)
    sql = _strip_regex_g_flag(sql)
    # DuckDB's unit-first day difference (timestamps here are all
    # midnight-aligned, so complete-day and boundary counts agree).
    # Via _rewrite_calls so a "date_diff('day'," substring INSIDE a
    # string literal survives untouched.
    for fn in ("date_diff", "datediff"):
        sql = _rewrite_calls(
            sql,
            fn,
            lambda a: f"timestampdiff(DAY, {a[1]}, {a[2]})"
            if len(a) == 3 and a[0].strip().lower() == "'day'"
            else None,
        )
    # 128-bit accumulators -> Spark's widest exact integer type
    # (code segments only — never inside quoted strings)
    sql = _map_quoted(
        sql,
        lambda s: re.sub(r"\bAS\s+HUGEINT\b", "AS DECIMAL(38,0)", s, flags=re.IGNORECASE),
    )
    return sql


# --- WITH RECURSIVE fixpoint driver ---------------------------------


def _match_paren(sql: str, open_idx: int, qmap: list[bool]) -> int:
    """Index of the ``)`` matching ``sql[open_idx] == '('`` (quote-aware)."""
    d = 0
    for j in range(open_idx, len(sql)):
        if qmap[j]:
            continue
        if sql[j] == "(":
            d += 1
        elif sql[j] == ")":
            d -= 1
            if d == 0:
                return j
    raise ValueError("unbalanced parentheses in SQL text")


def _references(text: str, name: str) -> bool:
    """Does ``text`` mention ``name`` as a word outside quotes/comments?"""
    pat = re.compile(rf"\b{re.escape(name)}\b", re.IGNORECASE)
    return any(pat.search(seg) for kind, seg in _segments(text) if kind == "")


def _parse_with_recursive(sql: str):
    """Parse ``WITH RECURSIVE c1 [(cols)] AS (...), c2 AS (...) <final>``
    into ``([(name, cols|None, body), ...], final_text)``. Returns
    None when the statement is not a WITH RECURSIVE."""
    m = re.match(r"\s*WITH\s+RECURSIVE\s+", sql, re.IGNORECASE)
    if not m:
        return None
    qmap = _in_quote_map(sql)
    i, n, ctes = m.end(), len(sql), []
    while True:
        while i < n and sql[i].isspace():
            i += 1
        mm = re.match(r"[A-Za-z_]\w*", sql[i:])
        if not mm:
            raise ValueError(f"expected CTE name at offset {i}")
        name = mm.group(0)
        i += mm.end()
        while i < n and sql[i].isspace():
            i += 1
        cols = None
        if i < n and sql[i] == "(":
            j = _match_paren(sql, i, qmap)
            cols = [c.strip() for c in sql[i + 1 : j].split(",")]
            i = j + 1
            while i < n and sql[i].isspace():
                i += 1
        if not re.match(r"AS\b", sql[i:], re.IGNORECASE):
            raise ValueError(f"expected AS after CTE name {name!r}")
        i += 2
        while i < n and sql[i].isspace():
            i += 1
        if i >= n or sql[i] != "(":
            raise ValueError(f"expected ( after AS for CTE {name!r}")
        j = _match_paren(sql, i, qmap)
        ctes.append((name, cols, sql[i + 1 : j]))
        i = j + 1
        while i < n and sql[i].isspace():
            i += 1
        if i < n and sql[i] == ",":
            i += 1
            continue
        break
    return ctes, sql[i:]


def _split_union(body: str):
    """Split ``body`` at top-level UNION [ALL] boundaries
    (quote/paren-aware). Returns (parts, any_union_all)."""
    qmap = _in_quote_map(body)
    parts, d, last, i, n, saw_all = [], 0, 0, 0, len(body), False
    while i < n:
        if not qmap[i]:
            c = body[i]
            if c in "([":
                d += 1
            elif c in ")]":
                d -= 1
            elif (
                d == 0
                and (i == 0 or not (body[i - 1].isalnum() or body[i - 1] == "_"))
            ):
                mm = re.match(r"UNION(\s+ALL)?\b", body[i:], re.IGNORECASE)
                if mm:
                    parts.append(body[last:i])
                    saw_all = saw_all or bool(mm.group(1))
                    i += mm.end()
                    last = i
                    continue
        i += 1
    parts.append(body[last:])
    return parts, saw_all


def _fixpoint_cte(
    spark: SparkSession, name: str, cols, body: str, max_rounds: int = 200
) -> DataFrame:
    """Execute a self-referencing UNION-distinct CTE by semi-naive
    fixpoint iteration: seed with the non-recursive members, then
    re-evaluate the recursive members against the accumulated set and
    union-distinct until no new rows appear. Monotone (rows are only
    added), so termination == the first round that adds nothing; each
    round is one distinct + one count, and the round count is bounded
    by the recursion depth of the data (component diameter for the
    min-label walks this tier serves)."""
    parts, saw_all = _split_union(body)
    if saw_all:
        raise ValueError(
            f"recursive CTE {name!r} uses UNION ALL — run_recursive_sql "
            "lowers that onto Spark's native recursive-CTE executor, "
            "never this fixpoint driver"
        )
    base = [p for p in parts if not _references(p, name)]
    step = [p for p in parts if _references(p, name)]
    if not base or not step:
        raise ValueError(f"CTE {name!r} is not a base-UNION-step recursion")

    def _union_all(stmts):
        df = None
        for s in stmts:
            d = spark.sql(s)
            df = d if df is None else df.union(d)
        return df.toDF(*cols) if cols else df

    cur = _union_all(base).distinct().localCheckpoint(eager=True)
    n_cur = cur.count()
    for _ in range(max_rounds):
        cur.createOrReplaceTempView(name)
        nxt = cur.union(_union_all(step)).distinct().localCheckpoint(eager=True)
        n_nxt = nxt.count()
        if n_nxt == n_cur:  # nxt ⊇ cur, so equal counts == equal sets
            return nxt
        cur, n_cur = nxt, n_nxt
    raise RuntimeError(f"recursive CTE {name!r} did not converge in {max_rounds} rounds")


def run_recursive_sql(spark: SparkSession, sql: str) -> DataFrame:
    """Execute a WITH RECURSIVE statement: materialize each CTE in
    order as a temp view, then run the final query body. A
    self-referencing CTE whose recursion is UNION ALL is handed to
    Spark 4.1's NATIVE recursive-CTE executor (the legal lowering —
    native semantics keep duplicate derivations, exactly as the SQL
    says); a UNION-distinct recursion — which the native executor
    refuses ([UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE]) and which cannot
    be mechanically rewritten to UNION ALL when the walk is cyclic
    (it would never terminate) — iterates through the semi-naive
    fixpoint driver. The returned DataFrame is built on
    eagerly-registered views, so later view replacement does not
    retro-change it."""
    parsed = _parse_with_recursive(sql)
    if parsed is None:
        raise ValueError("not a WITH RECURSIVE statement")
    ctes, final = parsed
    for name, cols, body in ctes:
        if _references(body, name):
            _parts, saw_all = _split_union(body)
            if saw_all:
                # native path: earlier CTEs are temp views by now, so
                # the single recursive CTE re-wraps as its own statement
                col_sig = f" ({', '.join(cols)})" if cols else ""
                df = spark.sql(
                    f"WITH RECURSIVE {name}{col_sig} AS ({body}) "
                    f"SELECT * FROM {name}"
                )
            else:
                df = _fixpoint_cte(spark, name, cols, body)
        else:
            df = spark.sql(body)
            if cols:
                df = df.toDF(*cols)
        df.createOrReplaceTempView(name)
    out = spark.sql(final)
    # the final plan is ANALYZED above (view plans are captured at
    # spark.sql time), so the scaffolding views can be dropped — left
    # registered, a CTE named like a base table (or another query's
    # CTE) would shadow it for every later run_sql in this session
    for name, _cols, _body in ctes:
        spark.catalog.dropTempView(name)
    return out


_ASOF_RE = re.compile(r"\bASOF\s+JOIN\b", re.IGNORECASE)
_ASOF_ON_RE = re.compile(
    r"(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s+AND\s+(\w+)\.(\w+)\s*>=\s*(\w+)\.(\w+)\s*$",
    re.IGNORECASE,
)


def rewrite_asof_join(sql: str) -> str:
    """Lower ``FROM (<l>) la ASOF JOIN (<r>) ra ON la.k = ra.k AND
    la.t >= ra.t`` to plain Spark SQL: tag-union both sides, take the
    running ``last(t) ignore nulls`` of the RIGHT rows over a window
    partitioned by the key and ordered by (t, tag) — right rows sort
    first at equal t, giving the INCLUSIVE ``>=`` match — then keep
    left rows with a match. Exactly the q29 DataFrame formulation:
    one shuffle on the key, a linear scan per partition, no range
    explosion, no per-row subquery.

    Supported shape (everything else raises, loudly): both sides are
    parenthesized ``SELECT * FROM <same table> ...`` subqueries (the
    union is positional — enforced, not assumed), one equality key, an
    inclusive ``>=`` time predicate, and right-side references in the
    SELECT list / trailing clauses limited to ``ra.t`` (the matched
    as-of timestamp — substituted quote-aware, so string literals
    mentioning the alias are untouched). An outer ``WHERE`` is merged
    into the rewrite's own WHERE; trailing ``GROUP BY`` / ``HAVING`` /
    ``ORDER BY`` / ``LIMIT`` move onto the final select over the
    windowed union (executed parity vs DuckDB's native ASOF pinned
    per clause in ``test_asof_rewriter_tail_clause_parity``). That is
    the surface the registered twins use; widening it means widening
    the parity-pin set first."""
    m = _ASOF_RE.search(sql)
    qmap = _in_quote_map(sql)
    if m is None or qmap[m.start()]:
        return sql
    # left side: the last top-level "FROM (" before ASOF JOIN
    from_m = None
    for fm in re.finditer(r"\bFROM\s*\(", sql[: m.start()], re.IGNORECASE):
        if not qmap[fm.start()]:
            from_m = fm
    if from_m is None:
        raise ValueError("ASOF JOIN: left side must be a parenthesized subquery")
    lopen = from_m.end() - 1
    lclose = _match_paren(sql, lopen, qmap)
    lsub = sql[lopen + 1 : lclose]
    lal = re.match(r"\s*(?:AS\s+)?(\w+)\s*$", sql[lclose + 1 : m.start()], re.IGNORECASE)
    if lal is None:
        raise ValueError("ASOF JOIN: left subquery must carry an alias")
    lalias = lal.group(1)
    # right side: "( <sub> ) alias ON"
    rm = re.compile(r"\s*\(").match(sql, m.end())
    if rm is None:
        raise ValueError("ASOF JOIN: right side must be a parenthesized subquery")
    ropen = rm.end() - 1
    rclose = _match_paren(sql, ropen, qmap)
    rsub = sql[ropen + 1 : rclose]
    ral = re.compile(r"\s*(?:AS\s+)?(\w+)\s+ON\s+", re.IGNORECASE).match(
        sql, rclose + 1
    )
    if ral is None:
        raise ValueError("ASOF JOIN: right subquery must carry an alias, then ON")
    ralias = ral.group(1)
    # ON body runs to the next top-level clause keyword (or the end)
    tail_m = re.compile(
        r"\b(ORDER\s+BY|GROUP\s+BY|WHERE|LIMIT|HAVING)\b", re.IGNORECASE
    ).search(sql, ral.end())
    while tail_m is not None and qmap[tail_m.start()]:
        tail_m = tail_m.re.search(sql, tail_m.end())
    on_end = tail_m.start() if tail_m else len(sql)
    on_body = sql[ral.end() : on_end].strip()
    tail = sql[on_end:]
    onm = _ASOF_ON_RE.match(on_body)
    if onm is None:
        raise ValueError(
            f"ASOF JOIN: unsupported ON shape {on_body!r} — need "
            "`la.k = ra.k AND la.t >= ra.t`"
        )
    a1, k1, a2, k2, a3, t1, a4, t2 = onm.groups()
    key = {a1: k1, a2: k2}
    tcols = {a3: t1, a4: t2}
    if set(key) != {lalias, ralias} or set(tcols) != {lalias, ralias}:
        raise ValueError("ASOF JOIN: ON must relate the two join aliases")
    if key[lalias] != key[ralias]:
        raise ValueError("ASOF JOIN: equality key must be the same column name")
    if a3 != lalias:
        raise ValueError("ASOF JOIN: time predicate must be `left.t >= right.t`")
    kcol, tcol = key[lalias], tcols[lalias]
    if tcols[ralias] != tcol:
        raise ValueError("ASOF JOIN: time column must be the same name on both sides")
    # the union below is POSITIONAL — guarantee column alignment by
    # requiring both sides to be `SELECT * FROM <same table> ...`
    # (exactly the promoted twins' shape); two differently-ordered
    # projections would silently scramble columns otherwise
    side_re = re.compile(r"^\s*SELECT\s+\*\s+FROM\s+(\w+)\b", re.IGNORECASE)
    lt, rt = side_re.match(lsub), side_re.match(rsub)
    if lt is None or rt is None or lt.group(1).lower() != rt.group(1).lower():
        raise ValueError(
            "ASOF JOIN: both sides must be `SELECT * FROM <same table> ...` "
            "— the rewrite unions them positionally, so differing "
            "projections would misalign columns"
        )
    # SELECT list: between the statement's leading SELECT and the FROM
    sel_m = re.compile(r"^\s*SELECT\b", re.IGNORECASE).match(sql)
    if sel_m is None:
        raise ValueError("ASOF JOIN rewrite expects a top-level SELECT")
    select_list = sql[sel_m.end() : from_m.start()]
    # a leading WHERE in the tail must merge into the rewrite's own
    # WHERE (two WHERE clauses would be a parse error downstream)
    where_extra = ""
    wm = re.compile(r"^\s*WHERE\s+", re.IGNORECASE).match(tail)
    if wm is not None:
        tqmap = _in_quote_map(tail)
        nxt = re.compile(
            r"\b(ORDER\s+BY|GROUP\s+BY|LIMIT|HAVING)\b", re.IGNORECASE
        ).search(tail, wm.end())
        while nxt is not None and tqmap[nxt.start()]:
            nxt = nxt.re.search(tail, nxt.end())
        cut = nxt.start() if nxt else len(tail)
        where_extra = f" AND ({tail[wm.end():cut].strip()})"
        tail = tail[cut:]

    # right-side references become the window's running last — applied
    # OUTSIDE quoted strings only (the dialect layer's contract), and
    # to the trailing clauses too (ORDER BY v.ts is legal)
    def _sub_rt(seg: str) -> str:
        return re.sub(rf"\b{ralias}\.{tcol}\b", "_asof_rt", seg)

    select_list = _map_quoted(select_list, _sub_rt)
    tail = _map_quoted(tail, _sub_rt)
    where_extra = _map_quoted(where_extra, _sub_rt)
    for txt, where in (
        (select_list, "SELECT list"),
        (tail, "trailing clauses"),
        (where_extra, "WHERE clause"),
    ):
        # quote-aware: a string literal mentioning `v.` is not a reference
        if any(
            re.search(rf"\b{ralias}\.", seg)
            for kind, seg in _segments(txt)
            if kind == ""
        ):
            raise ValueError(
                f"ASOF JOIN: {where} may reference the right side only "
                f"through {ralias}.{tcol} (the matched as-of timestamp)"
            )
    return (
        f"WITH _asof_l AS ({lsub}),\n"
        f"_asof_r AS ({rsub}),\n"
        "_asof_all AS (\n"
        "  SELECT *, 1 AS _is_l FROM _asof_l\n"
        "  UNION ALL\n"
        "  SELECT *, 0 AS _is_l FROM _asof_r\n"
        "),\n"
        "_asof_m AS (\n"
        f"  SELECT *, LAST(CASE WHEN _is_l = 0 THEN {tcol} END, TRUE) OVER (\n"
        f"    PARTITION BY {kcol} ORDER BY {tcol}, _is_l\n"
        "    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _asof_rt\n"
        "  FROM _asof_all\n"
        ")\n"
        f"SELECT {select_list.strip()}\n"
        f"FROM _asof_m {lalias}\n"
        f"WHERE _is_l = 1 AND _asof_rt IS NOT NULL{where_extra}\n"
        f"{tail}"
    )


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every base table as a temp view (through
    ``load_table``, so the timestamp-encoding session confs apply to
    the SQL path exactly as they do to the DataFrame path)."""
    for t in TABLE_SCHEMAS:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def run_sql(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Execute query ``name`` from its SQL text over ``sf_dir``'s
    tables. Raises ``KeyError`` for unknown names and ``ValueError``
    for registered queries whose twin is not dialect-portable."""
    if name not in ORACLES or ORACLES[name] is None:
        raise KeyError(f"no SQL text registered for {name!r}")
    if name in SQL_RUNNABLE:
        register_views(spark, sf_dir)
        return spark.sql(ORACLES[name])
    if name in SQL_REWRITTEN:
        register_views(spark, sf_dir)
        return spark.sql(spark_dialect(ORACLES[name]))
    if name in SQL_RECURSIVE:
        register_views(spark, sf_dir)
        return run_recursive_sql(spark, spark_dialect(ORACLES[name]))
    if name in SQL_ASOF:
        register_views(spark, sf_dir)
        return spark.sql(rewrite_asof_join(spark_dialect(ORACLES[name])))
    raise ValueError(
        f"{name!r} has a SQL twin for the oracle harness, but it uses "
        "DuckDB-only surface the dialect layer doesn't map — use the "
        "DataFrame API (plans.QUERIES) for this query"
    )
