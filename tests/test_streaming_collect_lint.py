"""Every ``.collect(`` callsite in the streaming stage modules must
carry a ``bounded-collect: <why>`` justification tag (tools/
streaming_collect_lint.py) — plan_lint covers query plans, this covers
stage-local Python, so a throughput optimization can't silently
reintroduce an O(corpus) driver pull (the round-9 embedding-gate
lesson). No SparkSession needed: pure AST."""

from __future__ import annotations

import textwrap

from tools.streaming_collect_lint import lint_source, lint_tree


def test_streaming_tree_has_no_untagged_collects():
    assert lint_tree() == {}


def test_untagged_data_sized_collect_trips():
    src = textwrap.dedent(
        """
        def process_batch(self, batch_df, batch_id):
            # grow the reference matrix from the whole corpus
            rows = self.corpus.select("id", "vec").collect()
            return rows
        """
    )
    bad = lint_source(src)
    assert len(bad) == 1 and bad[0][0] == 4


def test_tagged_collect_passes_same_line_and_lookback():
    src = textwrap.dedent(
        """
        def f(df, params):
            p = params.collect()[0]  # bounded-collect: single-row sidecar
            # bounded-collect: one row per micro-batch
            agg = (
                df.groupBy("k")
                .count()
                .collect()
            )
            return p, agg
        """
    )
    assert lint_source(src) == []


def test_docstring_and_comment_mentions_do_not_trip():
    src = textwrap.dedent(
        '''
        def f():
            """Never .collect() the corpus; collect() is the slow path."""
            # a comment saying df.collect() here
            return 1
        '''
    )
    assert lint_source(src) == []


def test_lookback_window_is_bounded():
    """A tag too far above the collect line does NOT count — the tag
    must sit next to the pull it justifies."""
    src = (
        "def f(df):\n"
        "    # bounded-collect: stale tag, ten lines up\n"
        + "    x = 1\n" * 10
        + "    return df.collect()\n"
    )
    assert len(lint_source(src)) == 1
