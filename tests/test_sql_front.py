"""SQL front door: every SQL_RUNNABLE query executed from its SQL text
(and every SQL_REWRITTEN query executed through the spark_dialect
layer) must produce the same rows and column names as its
DataFrame-API path."""

from __future__ import annotations

import pytest

from ml_with_spark_streaming_spark.plans import QUERIES
from ml_with_spark_streaming_spark.plans.sql_front import (
    SQL_ASOF,
    SQL_RECURSIVE,
    SQL_REWRITTEN,
    SQL_RUNNABLE,
    rewrite_asof_join,
    run_sql,
    spark_dialect,
)

SF = "/root/testdata/sf0.001"


def _rows(df):
    # None-safe, type-stable total order (rollup/cube rows carry NULL
    # group keys; decimals and floats compare by string form)
    return sorted(
        map(tuple, df.collect()),
        key=lambda t: tuple((v is None, str(type(v)), str(v)) for v in t),
    )


# The heavyweight parity params (iterative CC/PageRank twins, the
# composed pipelines, MinHash chains — 10-80 s each even at sf0.001)
# run only in the full suite (SPARK_GRAFT_FULL_TESTS=1); the default
# subset keeps the fast ~85% so `pytest tests/ -x -q` fits the round
# driver's time budget (round-12, r11-verdict item #7).
_SLOW_PARAMS = {
    "q50_minhash_candidates",
    "q51_jaccard_pairs",
    "q54_embedding_neardup",
    "q58_fuzzy_dedup_pipeline",
    "q90_dedup_clusters",
    "q93_curation_pipeline",
    "q99_embedding_dedup_clusters",
    "q105_incremental_dedup",
    "q113_curation_with_classifier",
    "q114_training_mix_export",
    "q128_winnowing_pairs",
    "q131_bigram_lm_nll",
    "q133_leakage_safe_split",
    "q134_canonical_selection",
    "q145_nation_pagerank",
    "q158_hard_negatives",
    "q167_dedup_recall_audit",
    "q171_dedup_recall_audit_sampled",
}


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(n, marks=pytest.mark.slow) if n in _SLOW_PARAMS else n
        for n in SQL_RUNNABLE + SQL_REWRITTEN + SQL_RECURSIVE + SQL_ASOF
    ],
)
def test_sql_text_matches_dataframe_api(spark, name):
    sql_df = run_sql(spark, SF, name)
    api_df = QUERIES[name](spark, SF)
    assert [f.name for f in sql_df.schema] == [f.name for f in api_df.schema]
    assert _rows(sql_df) == _rows(api_df)


def test_tiers_are_disjoint_and_rewrites_change_text(spark):
    tiers = [set(SQL_RUNNABLE), set(SQL_REWRITTEN), set(SQL_RECURSIVE), set(SQL_ASOF)]
    for i, a in enumerate(tiers):
        for b in tiers[i + 1 :]:
            assert not a & b
    # the dialect layer is only applied where it's needed — for tier-2
    # queries the rewritten text must differ from the DuckDB original
    from ml_with_spark_streaming_spark.plans.registry import ORACLES

    changed = sum(
        1 for n in SQL_REWRITTEN if spark_dialect(ORACLES[n]) != ORACLES[n]
    )
    assert changed == len(SQL_REWRITTEN)


def test_run_sql_rejects_non_portable_and_unknown(spark):
    with pytest.raises(KeyError):
        run_sql(spark, SF, "q47_stemmed_tokens")  # no SQL twin at all
    with pytest.raises(KeyError):
        run_sql(spark, SF, "nope")


def test_every_oracled_query_runs_from_sql_text(spark):
    """The front door is CLOSED at 142/142: every registered query with
    a SQL twin belongs to exactly one runnable tier — the exclusion
    list is empty."""
    from ml_with_spark_streaming_spark.plans.registry import ORACLES

    oracled = {n for n, sql in ORACLES.items() if sql is not None}
    tiered = set(SQL_RUNNABLE) | set(SQL_REWRITTEN) | set(SQL_RECURSIVE) | set(SQL_ASOF)
    assert tiered <= oracled
    assert oracled - tiered == set(), "oracled queries missing a SQL-front tier"


def test_asof_rewriter_guards(spark):
    """rewrite_asof_join: pass-through without ASOF, loud failures on
    unsupported shapes (exclusive predicate; right-side column other
    than the as-of timestamp)."""
    assert rewrite_asof_join("SELECT 1") == "SELECT 1"
    # quoted mention is not a join
    assert rewrite_asof_join("SELECT 'ASOF JOIN' AS s") == "SELECT 'ASOF JOIN' AS s"
    base = (
        "SELECT p.a, {sel} FROM (SELECT * FROM t) p "
        "ASOF JOIN (SELECT * FROM t) v ON p.k = v.k AND {pred}"
    )
    with pytest.raises(ValueError, match="ON shape"):
        rewrite_asof_join(base.format(sel="v.ts", pred="p.ts > v.ts"))
    with pytest.raises(ValueError, match="matched as-of timestamp"):
        rewrite_asof_join(base.format(sel="v.other", pred="p.ts >= v.ts"))


def test_dialect_rewrites_are_quote_aware_and_scoped(spark):
    """The mechanical rewrites must not fire inside string literals,
    must scope the 'g'-flag strip to 4-arg regexp_replace, and must
    preserve DuckDB's empty-range generate_series semantics."""
    # literal-array rewrite skips [..]-shaped substrings inside quotes
    assert (
        spark_dialect("SELECT regexp_extract(x, '[1, 2]', 0) FROM t")
        == "SELECT regexp_extract(x, '[1, 2]', 0) FROM t"
    )
    assert spark_dialect("SELECT [1, 2] AS a") == "SELECT array(1, 2) AS a"

    # 'g' strip: 4-arg regexp_replace loses the flag; a 3-arg call
    # whose REPLACEMENT is the letter g, and other functions' real
    # 'g' arguments, survive
    assert (
        spark_dialect("SELECT regexp_replace(x, 'a+', 'b', 'g') FROM t")
        == "SELECT regexp_replace(x, 'a+', 'b') FROM t"
    )
    assert (
        spark_dialect("SELECT regexp_replace(x, 'a+', 'g') FROM t")
        == "SELECT regexp_replace(x, 'a+', 'g') FROM t"
    )
    assert (
        spark_dialect("SELECT array_to_string(x, 'g') FROM t")
        == "SELECT array_join(x, 'g') FROM t"
    )

    # datediff/HUGEINT rewrites are call- and quote-scoped: the code
    # forms rewrite, the same text inside a string literal survives
    assert (
        spark_dialect("SELECT date_diff('day', a, b) AS d FROM t")
        == "SELECT timestampdiff(DAY, a, b) AS d FROM t"
    )
    assert (
        spark_dialect("SELECT 'date_diff(x AS HUGEINT)' AS s FROM t")
        == "SELECT 'date_diff(x AS HUGEINT)' AS s FROM t"
    )
    assert (
        spark_dialect("SELECT CAST(n AS HUGEINT) AS h FROM t")
        == "SELECT CAST(n AS DECIMAL(38,0)) AS h FROM t"
    )

    # generate_series: inclusive AND empty when b < a, matching DuckDB
    import duckdb

    for a, b in ((1, 5), (1, 1), (1, 0), (3, 2)):
        duck = duckdb.sql(f"SELECT generate_series({a}, {b}) AS s").fetchone()[0]
        got = spark.sql(
            spark_dialect(f"SELECT generate_series({a}, {b}) AS s")
        ).collect()[0]["s"]
        assert list(got) == list(duck), f"range ({a},{b}): {got} != {duck}"


def test_recursive_driver_edge_cases(spark):
    """The WITH RECURSIVE fixpoint driver: parses multi-CTE clauses,
    refuses non-recursive statements and UNION ALL recursion (native
    Spark handles that), and computes a textbook transitive closure."""
    import pytest as _pytest

    from ml_with_spark_streaming_spark.plans.sql_front import run_recursive_sql

    spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "src int, dst int"
    ).createOrReplaceTempView("edges_t")
    out = run_recursive_sql(
        spark,
        """WITH RECURSIVE reach(a, b) AS (
             SELECT src, dst FROM edges_t
             UNION
             SELECT r.a, e.dst FROM reach r JOIN edges_t e ON e.src = r.b
           )
           SELECT a, b FROM reach ORDER BY a, b""",
    )
    got = {(r.a, r.b) for r in out.collect()}
    assert got == {
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (10, 11),
    }

    with _pytest.raises(ValueError, match="not a WITH RECURSIVE"):
        run_recursive_sql(spark, "SELECT 1 AS x")
    # UNION ALL recursion lowers onto Spark's NATIVE executor (round 11)
    out = run_recursive_sql(
        spark,
        """WITH RECURSIVE r(n) AS (
             SELECT 1 UNION ALL SELECT n + 1 FROM r WHERE n < 3
           ) SELECT * FROM r ORDER BY n""",
    )
    assert [row.n for row in out.collect()] == [1, 2, 3]


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAVE_HYPOTHESIS = False


if _HAVE_HYPOTHESIS:
    # adversarial literal content: regex character classes, //, [1,2],
    # DuckDB-looking call text, bracket slices — everything the rewrite
    # layer maps OUTSIDE quotes must survive INSIDE them. Excluded by
    # construction: single quotes (would terminate the literal), % (the
    # strftime %-code conversion legitimately rewrites quoted formats),
    # and backslash (legitimately doubled for Spark's escape handling).
    _LIT = st.text(
        alphabet="abgz 0123456789[],/#()*+?{}|:.-_<>=",
        min_size=0,
        max_size=40,
    )

    @given(lit=_LIT)
    @settings(max_examples=300, deadline=None)
    def test_dialect_property_quoted_literals_survive(lit):
        """Every rewrite in spark_dialect must be quote-aware: a SQL
        statement whose string literals contain arbitrary
        rewrite-triggering text keeps those literals byte-identical,
        while the surrounding code still rewrites."""
        sql = (
            f"SELECT '{lit}' AS a, len(x) // 2 AS h, list_min(v) AS m, "
            f"CAST(n AS HUGEINT) AS w FROM t WHERE y <> '{lit}'"
        )
        out = spark_dialect(sql)
        assert f"'{lit}'" in out, f"literal mangled: {out!r}"
        assert out.count(f"'{lit}'") == 2
        assert " DIV " in out and "size(x)" in out
        assert "array_min(v)" in out and "DECIMAL(38,0)" in out


def test_asof_rewriter_review_regressions(spark):
    """Round-10 review pins: quote-aware substitution, tail ra.t
    allowed, outer WHERE merged (not doubled), positional-union shape
    guard."""
    base = (
        "SELECT p.a, v.ts{extra} FROM (SELECT * FROM t) p "
        "ASOF JOIN (SELECT * FROM t) v ON p.k = v.k AND p.ts >= v.ts{tail}"
    )
    # string literal mentioning the right alias is untouched and legal
    out = rewrite_asof_join(
        base.format(extra=", 'v.ts drives the asof' AS note", tail="")
    )
    assert "'v.ts drives the asof'" in out
    assert "_asof_rt" in out
    # ORDER BY v.ts in the tail is substituted, not rejected
    out = rewrite_asof_join(base.format(extra="", tail=" ORDER BY v.ts"))
    assert out.rstrip().endswith("ORDER BY _asof_rt")
    # an outer WHERE merges into the generated WHERE: exactly one WHERE
    out = rewrite_asof_join(
        base.format(extra="", tail=" WHERE p.a > 0 ORDER BY p.a")
    )
    assert out.upper().count("WHERE") == 1
    assert "AND (p.a > 0)" in out
    assert out.rstrip().endswith("ORDER BY p.a")
    # positional-union shape guard: differing projections raise
    with pytest.raises(ValueError, match="positionally"):
        rewrite_asof_join(
            "SELECT p.a FROM (SELECT a, ts FROM t) p "
            "ASOF JOIN (SELECT ts, a FROM t) v ON p.k = v.k AND p.ts >= v.ts"
        )
    with pytest.raises(ValueError, match="positionally"):
        rewrite_asof_join(
            "SELECT p.a FROM (SELECT * FROM t) p "
            "ASOF JOIN (SELECT * FROM u) v ON p.k = v.k AND p.ts >= v.ts"
        )


def test_asof_rewriter_tail_clause_parity(spark):
    """Round-11 pin (VERDICT #6): each supported TRAILING clause after
    an ASOF join — GROUP BY, GROUP BY + HAVING, ORDER BY + LIMIT — is
    executed through the rewrite and matched row-for-row against
    DuckDB's native ASOF JOIN on the same parquet data. The rewrite
    moves the tail onto the final select over the windowed union, so
    these clauses must aggregate/filter/sort the MATCHED rows exactly
    as the native operator does."""
    import duckdb

    from ml_with_spark_streaming_spark.plans.sql_front import register_views

    register_views(spark, SF)
    con = duckdb.connect()
    for t in ("events",):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    asof = (
        "FROM (SELECT * FROM events WHERE event_type = 'purchase') p "
        "ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v "
        "ON p.user_id = v.user_id AND p.ts >= v.ts"
    )
    cases = [
        # trailing GROUP BY
        (
            "SELECT p.user_id, COUNT(*) AS n_purch, "
            f"MAX(epoch_us(p.ts) - epoch_us(v.ts)) AS max_lag_us {asof} "
            "GROUP BY p.user_id"
        ),
        # trailing GROUP BY + HAVING
        (
            "SELECT p.user_id, COUNT(*) AS n_purch "
            f"{asof} GROUP BY p.user_id HAVING COUNT(*) >= 2"
        ),
        # outer WHERE + trailing ORDER BY + LIMIT (deterministic order)
        (
            "SELECT p.event_id, epoch_us(p.ts) - epoch_us(v.ts) AS lag_us "
            f"{asof} WHERE p.value > 1 ORDER BY lag_us DESC, p.event_id LIMIT 5"
        ),
    ]
    for stmt in cases:
        lowered = rewrite_asof_join(spark_dialect(stmt))
        assert "ASOF JOIN" not in lowered.upper()
        got = spark.sql(lowered)
        want_rel = con.sql(stmt)
        assert [c.lower() for c in got.columns] == [
            c.lower() for c in want_rel.columns
        ]
        ordered = "ORDER BY" in stmt
        g = [tuple(r) for r in got.collect()]
        w = [tuple(r) for r in want_rel.fetchall()]
        if not ordered:
            g, w = sorted(g), sorted(w)
        assert g == w, f"tail-clause parity broke for: {stmt}"
    con.close()


def test_recursive_union_all_runs_natively(spark):
    """Round-11 pin (VERDICT #5): run_recursive_sql hands a UNION ALL
    recursion to Spark 4.1's native recursive-CTE executor. The diamond
    DAG distinguishes the engines: the native UNION ALL semantics KEEP
    the duplicate derivation of the sink node (two paths), which the
    fixpoint driver's union-distinct would collapse — so the duplicate
    row is proof the native path executed, with faithful semantics."""
    from ml_with_spark_streaming_spark.plans.sql_front import run_recursive_sql

    spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4), (3, 4)], "src int, dst int"
    ).createOrReplaceTempView("dag_edges")
    try:
        out = run_recursive_sql(
            spark,
            """
            WITH RECURSIVE reach (node) AS (
              SELECT 1
              UNION ALL
              SELECT e.dst FROM reach r JOIN dag_edges e ON e.src = r.node
            )
            SELECT node, COUNT(*) AS n_paths FROM reach GROUP BY node ORDER BY node
            """,
        )
        rows = {r.node: r.n_paths for r in out.collect()}
        assert rows == {1: 1, 2: 1, 3: 1, 4: 2}  # 4 reached via BOTH paths
    finally:
        spark.catalog.dropTempView("dag_edges")


def test_recursive_walk_cannot_lower_natively(spark):
    """Round-11 pin (VERDICT #5): the 8 tier-3 twins stay on the
    fixpoint driver BY NECESSITY. Their shared recursion — a min-label
    walk over the symmetric edge closure — (a) raises
    UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE natively as written, and
    (b) under the mechanical UNION -> UNION ALL rewrite re-derives
    already-seen rows forever on the cyclic closure and dies on the
    recursion-depth limit instead of terminating. Both verified here
    against THIS Spark build, so a future Spark that lifts either
    restriction shows up as this test failing."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import AnalysisException

    spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2)], "a int, b int"
    ).createOrReplaceTempView("sym_edges")
    walk = """
      WITH RECURSIVE walk (id, label) AS (
        SELECT a, a FROM sym_edges
        {union}
        SELECT s.b, w.label FROM walk w JOIN sym_edges s ON s.a = w.id
      )
      SELECT id, MIN(label) AS component FROM walk GROUP BY id
    """
    try:
        with pytest.raises(AnalysisException, match="UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE"):
            spark.sql(walk.format(union="UNION")).collect()
        with pytest.raises((Py4JJavaError, Exception)) as ei:
            spark.sql(walk.format(union="UNION ALL")).collect()
        assert "RECURSION" in str(ei.value).upper()  # depth limit, not an answer
    finally:
        spark.catalog.dropTempView("sym_edges")
