"""SCALE.md's measured tables must equal what tools/refresh_scale.py
renders from the committed bench_detail.json — the doc drifted from
the bench artifact in rounds 6 AND 7; this pin makes that structurally
impossible (stale doc == red test)."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def test_scale_md_bench_tables_fresh():
    import json

    from refresh_scale import BEGIN, END, render_bench_tables

    with open(os.path.join(REPO, "bench_detail.json")) as f:
        detail = json.load(f)
    with open(os.path.join(REPO, "SCALE.md")) as f:
        doc = f.read()
    start, end = doc.find(BEGIN), doc.find(END)
    assert start >= 0 and end >= 0, "BENCH_TABLES markers missing from SCALE.md"
    current = doc[start : end + len(END)]
    want = render_bench_tables(detail)
    assert current == want, (
        "SCALE.md's generated tables are stale — run `python tools/refresh_scale.py` "
        "in the same commit that updated bench_detail.json"
    )


def test_refresh_is_idempotent(tmp_path):
    import shutil

    from refresh_scale import refresh

    scale = tmp_path / "SCALE.md"
    shutil.copy(os.path.join(REPO, "SCALE.md"), scale)
    # first run may or may not change (depending on repo state); the
    # second run over its own output must be a no-op
    refresh(scale_path=str(scale))
    assert refresh(scale_path=str(scale)) is False
