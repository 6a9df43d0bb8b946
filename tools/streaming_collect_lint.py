"""Driver-pull honesty lint for the streaming stages.

``tools/plan_lint.py`` inspects QUERY plans; it cannot see stage-local
Python in the micro-batch processors, where a throughput optimization
can silently reintroduce an O(corpus) driver pull (the round-9
embedding-gate lesson: a driver-resident reference matrix collected
from — and re-broadcast over — the whole accepted corpus). This lint
closes that hole structurally: every real ``.collect(`` CALLSITE under
``ml_with_spark_streaming_spark/streaming/`` must carry a
``bounded-collect: <why>`` tag in a comment on the same line or within
the few lines above it, stating the size bound that makes the driver
pull safe (single-row aggregate, params sidecar, one micro-batch,
k-bounded counter table, ...). An untagged collect fails the lint —
the author must either bound it and say so, or keep the data
executor-side.

Call-level AST matching, not grep: docstrings and comments that merely
MENTION collect() don't trip it. Run standalone (exit code = number of
violations) or through ``tests/test_streaming_collect_lint.py``.
"""

from __future__ import annotations

import ast
import os
import sys

TAG = "bounded-collect:"
LOOKBACK = 5  # tag may sit up to this many lines above the .collect line

_STREAMING_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "ml_with_spark_streaming_spark",
    "streaming",
)


def lint_source(src: str, name: str = "<string>") -> list[tuple[int, str]]:
    """Return (lineno, snippet) for every ``.collect(`` call without a
    ``bounded-collect:`` tag on its line or the LOOKBACK lines above."""
    lines = src.splitlines()
    bad: list[tuple[int, str]] = []
    for node in ast.walk(ast.parse(src, filename=name)):
        if not (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr == "collect"
        ):
            continue
        # the line the ``.collect`` attribute itself ends on — multi-line
        # agg(...) chains tag next to the collect, not the statement head
        ln = node.func.end_lineno or node.lineno
        window = lines[max(0, ln - 1 - LOOKBACK) : ln]
        if not any(TAG in w for w in window):
            bad.append((ln, lines[ln - 1].strip()))
    return bad


def lint_tree(root: str = _STREAMING_DIR) -> dict[str, list[tuple[int, str]]]:
    out: dict[str, list[tuple[int, str]]] = {}
    for fname in sorted(os.listdir(root)):
        if not fname.endswith(".py"):
            continue
        path = os.path.join(root, fname)
        with open(path, encoding="utf-8") as fh:
            bad = lint_source(fh.read(), name=path)
        if bad:
            out[fname] = bad
    return out


def main() -> int:
    failures = lint_tree()
    n = 0
    for fname, sites in failures.items():
        for ln, snippet in sites:
            print(f"UNTAGGED COLLECT {fname}:{ln}: {snippet}")
            n += 1
    print(f"{n} untagged streaming collect callsites")
    return n


if __name__ == "__main__":
    sys.exit(main())
