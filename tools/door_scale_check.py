"""Door-at-scale flatness check: is the streaming ingest door's
PER-BATCH cost flat as the corpus and serving index grow?

The batch queries' 10x spot-check (``scale_check.py``) says nothing
about the STREAMING path, whose 100 TB claim rests on design shape
(delta broadcasts, bucketed join verify, O(batch) slice saves). This
tool measures it: the full ingest door — text gates + embedding
near-dup gate + serving IVF index — runs for N micro-batches against
the 10x-grown ``.scale/sf1`` corpus in BOTH verify modes, recording
each batch's docs/s (``bench._ingest_pipeline_rate`` with
``per_batch=True``). Two numbers per mode:

* ``late_over_early`` — mean docs/s of the last window over the first
  (batch 0 excluded: it pays one-time stream/Arrow init). A per-batch
  cost that grows with the accepted-so-far state would push this well
  below 1; the documented single-observation noise band is ±25%, and
  window means of w=4 batches tighten it, so < ``--flat-bound``
  (default 0.7) flags a trend.
* ``vs_sf01_ratio`` — the 10x-base run's aggregate docs/s over the
  sf0.1-base run's (big/small): a per-batch cost carrying an O(corpus)
  term would COLLAPSE this toward ~0.1; flat designs read ~1.

Writes the ``ingest_door`` section of SCALE_CHECK.json (merging —
``scale_check.py`` owns the query sections) and prints one row per
mode. Run alone — never concurrently with bench.py or pytest.

Usage:
    python tools/door_scale_check.py                # both modes, both bases
    python tools/door_scale_check.py --skip-base    # sf1 trend only
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

OUT_JSON = os.path.join(REPO, "SCALE_CHECK.json")


def _window_mean(rates: list[float], lo: int, hi: int) -> float:
    w = rates[lo:hi]
    return sum(w) / len(w) if w else float("nan")


def run(per_file: int, n_files: int, skip_base: bool) -> dict:
    import bench
    from scale_check import BASE, COPIES, OUT_DIR, generate

    from ml_with_spark_streaming_spark.session import get_spark

    w = max(2, n_files // 3)
    if n_files < 2 * w + 1:
        # batch 0 is excluded (one-time init), so the early window is
        # rates[1 : 1+w] and the late one rates[-w:] — they must be
        # DISJOINT or late/early is vacuously ~1 and the trend check
        # checks nothing
        raise SystemExit(
            f"--n-files {n_files} too small: early/late windows of "
            f"w={w} batches (batch 0 excluded) need n_files >= {2 * w + 1}"
        )
    generate()
    spark = get_spark(app_name="door-scale-check")
    # absorb one-time init outside every measured point — WITH the
    # embedding gate and serving index armed, so their first-use costs
    # (Arrow vector-column conversion, signature/IVF machinery) don't
    # land inside the first measured run's wall clock
    bench._ingest_pipeline_rate(
        spark, per_file=200, n_files=1, sf_dir=BASE, embedding=True, ann=True
    )
    out: dict = {
        "per_file": per_file,
        "n_files": n_files,
        "window": w,
        "base": BASE,
        "scaled": OUT_DIR,
        "data_ratio": COPIES,
        "modes": {},
    }
    for mode in ("broadcast", "join"):
        big = bench._ingest_pipeline_rate(
            spark,
            per_file=per_file,
            n_files=n_files,
            embedding=True,
            ann=True,
            verify_mode=mode,
            sf_dir=OUT_DIR,
            per_batch=True,
        )
        rates = big["per_batch_docs_per_sec"]
        early = _window_mean(rates, 1, 1 + w)  # batch 0 = one-time init
        late = _window_mean(rates, len(rates) - w, len(rates))
        row = {
            "sf1_docs_per_sec": big["docs_per_sec"],
            "sf1_per_batch_docs_per_sec": rates,
            "early_window_mean": round(early, 1),
            "late_window_mean": round(late, 1),
            "late_over_early": round(late / early, 3) if early else None,
            "survivors": big["survivors"],
        }
        if not skip_base:
            small = bench._ingest_pipeline_rate(
                spark,
                per_file=per_file,
                n_files=n_files,
                embedding=True,
                ann=True,
                verify_mode=mode,
                sf_dir=BASE,
            )
            row["sf01_docs_per_sec"] = small["docs_per_sec"]
            row["vs_sf01_ratio"] = round(
                big["docs_per_sec"] / small["docs_per_sec"], 3
            )
        out["modes"][mode] = row
        print(
            f"{mode:10s} sf1={row['sf1_docs_per_sec']:7.1f} docs/s  "
            f"late/early={row['late_over_early']}  "
            f"vs_sf01={row.get('vs_sf01_ratio', 'skipped')}"
        )
    spark.stop()
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-file", type=int, default=2000)
    ap.add_argument("--n-files", type=int, default=12)
    ap.add_argument("--skip-base", action="store_true")
    ap.add_argument("--flat-bound", type=float, default=0.7)
    args = ap.parse_args()
    section = run(args.per_file, args.n_files, args.skip_base)
    payload = {}
    if os.path.exists(OUT_JSON):
        try:
            with open(OUT_JSON, encoding="utf-8") as fh:
                payload = json.load(fh)
        except (OSError, ValueError):
            payload = {}
    payload["ingest_door"] = section
    with open(OUT_JSON, "w", encoding="utf-8") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
    print(f"wrote {OUT_JSON} (ingest_door)")
    flagged = [
        m
        for m, r in section["modes"].items()
        if r["late_over_early"] is not None
        and r["late_over_early"] < args.flat_bound
    ]
    if flagged:
        print(f"TREND FLAGGED (late/early < {args.flat_bound}): {flagged}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
