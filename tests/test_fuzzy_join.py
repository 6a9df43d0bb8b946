"""Lossless-blocking tests for the fuzzy string self-join
(operators/fuzzy_join.py): the prefix-filtered result must equal the
brute-force nested loop EXACTLY — including short strings the q-gram
filter cannot prune."""

from __future__ import annotations

import pytest

from ml_with_spark_streaming_spark.operators.fuzzy_join import fuzzy_string_pairs


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(names: list[str], k: int) -> set[tuple[str, str, int]]:
    out = set()
    uniq = sorted(set(names))
    for i, a in enumerate(uniq):
        for b in uniq[i + 1 :]:
            d = _lev(a, b)
            if d <= k:
                out.add((a, b, d))
    return out


@pytest.mark.parametrize("k", [1, 2])
def test_blocking_is_lossless(spark, k):
    names = [
        "old bolt", "red bolt", "red boat", "red bolts", "blue bolt",
        "small ring", "small ringo", "smal ring", "hot gear", "hot bear",
        "completely different string", "zzzz qqqq",
    ]
    df = spark.createDataFrame([(n,) for n in names], ["name"])
    got = {
        (r.name_a, r.name_b, r.dist)
        for r in fuzzy_string_pairs(df, "name", k=k, q=2).collect()
    }
    assert got == _brute(names, k)


def test_short_strings_route_through_fallback(spark):
    # "ab" vs "cd": distance 2, ZERO shared bigrams — only the
    # short-string branch can find this pair; a pure gram join would
    # silently drop it
    names = ["ab", "cd", "a", "abcdef", "abcdgf"]
    df = spark.createDataFrame([(n,) for n in names], ["name"])
    got = {
        (r.name_a, r.name_b, r.dist)
        for r in fuzzy_string_pairs(df, "name", k=2, q=2).collect()
    }
    assert ("ab", "cd", 2) in got
    assert ("a", "ab", 1) in got
    assert ("abcdef", "abcdgf", 1) in got
    assert got == _brute(names, 2)


def test_duplicates_and_nulls_collapse_to_domain(spark):
    df = spark.createDataFrame(
        [("red bolt",), ("red bolt",), ("red boat",), (None,)], ["name"]
    )
    rows = fuzzy_string_pairs(df, "name", k=2, q=2).collect()
    assert [(r.name_a, r.name_b, r.dist) for r in rows] == [
        ("red boat", "red bolt", 1)
    ]
