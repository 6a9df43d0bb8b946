"""SCALE.md's measured tables must equal what tools/refresh_scale.py
renders from the committed bench_detail.json — the doc drifted from
the bench artifact in rounds 6 AND 7; this pin makes that structurally
impossible (stale doc == red test)."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def _committed_bench_detail() -> str:
    """The COMMITTED bench_detail.json, not the working-tree file.

    The round driver re-runs bench.py after our final commit and overwrites
    the working-tree bench_detail.json; pinning against HEAD means an
    external bench run cannot redden the suite, while a commit that updates
    bench_detail.json without refreshing SCALE.md still trips the pin.
    Falls back to the working-tree file outside a git checkout.
    """
    try:
        out = subprocess.run(
            ["git", "show", "HEAD:bench_detail.json"],
            cwd=REPO,
            capture_output=True,
            text=True,
            timeout=30,
        )
        if out.returncode == 0 and out.stdout.strip():
            return out.stdout
    except (OSError, subprocess.TimeoutExpired):
        pass
    with open(os.path.join(REPO, "bench_detail.json")) as f:
        return f.read()


def test_scale_md_bench_tables_fresh():
    import json

    from refresh_scale import BEGIN, END, render_bench_tables

    detail = json.loads(_committed_bench_detail())
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
