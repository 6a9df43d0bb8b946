"""Lineage materialization helper.

``localCheckpoint`` replaces a DataFrame's logical plan with a
``LogicalRDD`` at construction time — which also makes every scan
UPSTREAM of the checkpoint invisible to ``tools/plan_lint.py``'s
duplicate-scan rule (the lint stringifies the post-checkpoint plan).
Query code therefore routes non-iterative checkpoints through
``maybe_checkpoint``: production behavior is identical, but the linter
sets ``SPARK_GRAFT_NO_CHECKPOINT=1`` so the full lineage stays visible
and the DupFactScan waivers describe real, inspected plan shapes.

The iterative loops in ``operators/graph.py`` keep raw
``localCheckpoint`` calls — without lineage truncation the loop's
per-round plans grow without bound and the loop itself cannot run, so
there is nothing meaningful for the linter to see there anyway.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import DataFrame

_warned = False


def maybe_checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """``df.localCheckpoint(eager)`` unless ``SPARK_GRAFT_NO_CHECKPOINT=1``.

    The flag exists ONLY for ``tools/plan_lint.py`` (full-lineage plan
    inspection). A stray env var in a production shell would silently
    disable every non-iterative materialization — so the first skip
    prints a loud stderr warning."""
    if os.environ.get("SPARK_GRAFT_NO_CHECKPOINT") == "1":
        global _warned
        if not _warned:
            _warned = True
            print(
                "WARNING: SPARK_GRAFT_NO_CHECKPOINT=1 — lineage materialization "
                "DISABLED (lint-only mode; expensive subtrees will re-execute "
                "per consumer). Unset this in production runs.",
                file=sys.stderr,
            )
        return df
    return df.localCheckpoint(eager=eager)
