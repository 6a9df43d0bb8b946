"""10x scale spot-check: does each expensive headline query's wall
time grow ~linearly when the data grows 10x?

The per-round bench runs at sf0.1; the brief grades plans at 100x
that. This tool closes the gap empirically: it synthesizes an
sf1-EQUIVALENT slice (10 copies of sf0.1 with consistent key
remapping — see below), times the most expensive headline queries at
both scales with the bench's own methodology (noop sink, min-of-N),
and records the wall-time scaling factor per query. A ratio well
above the 10x data ratio flags a super-linear plan — next round's
optimization target.

Upscaling is NOT naive replication — that would plant cross-copy
duplicates and near-duplicates, inflating every pair-generating
operator quadratically and faking super-linear scaling:

* relational tables: every key (orderkey/custkey/partkey/suppkey/
  event_id/user_id) is offset by ``copy * 10^10``, so joins fan out
  exactly as at sf0.1 and per-user/session structure is preserved
  per copy; dimension tables (region/nation) stay fixed like real
  dimensions.
* documents: copy 0 is verbatim; in copies 1..9 every 3rd token is
  rewritten with a copy-specific suffix, so cross-copy Jaccard ~0.5
  and containment ~2/3 — far under the dedup thresholds — while
  token counts, lengths, and WITHIN-copy duplicate structure are
  preserved. ``n_chars`` is recomputed.
* embeddings: each copy is rotated by its own seeded random
  orthogonal matrix — rotation preserves every within-copy cosine
  EXACTLY (the q50/q166 planted structure scales linearly) while
  cross-copy cosines are near zero.

Usage (run alone — never concurrently with bench.py or pytest):

    python tools/scale_check.py                  # generate + time
    python tools/scale_check.py --regen          # force re-generation

Writes SCALE_CHECK.json at the repo root (committed; SCALE.md cites
it) and prints one row per query. The generated slice lives under
``.scale/sf1`` (gitignored — ~10x sf0.1 on disk, a build artifact).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = "/root/testdata/sf0.1"
OUT_DIR = os.path.join(REPO, ".scale", "sf1")
OUT_JSON = os.path.join(REPO, "SCALE_CHECK.json")
COPIES = 10
STRIDE = 10_000_000_000

# the most expensive headline queries by the round-9 bench, the ones
# whose scaling behavior decides whether the engine survives 100x
DEFAULT_QUERIES = [
    "q167_dedup_recall_audit",
    "q90_dedup_clusters",
    "q165_hard_negatives_ivf",
    "q166_semdedup",
    "q112_quality_classifier",
    "q145_nation_pagerank",
    "q50_minhash_candidates",
    "q115_exact_substr_apply",
    "q140_containment_pairs",
    "q110_exact_substr_spans",
]

# (table, [key columns to offset by copy*STRIDE]) — every other column
# is carried through unchanged; region/nation are fixed dimensions
_KEYED = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
}
_VERBATIM = ["region", "nation"]


def _gen_relational(con) -> None:
    for t, keys in _KEYED.items():
        cols = [
            r[0]
            for r in con.sql(f"DESCRIBE SELECT * FROM '{BASE}/{t}.parquet'").fetchall()
        ]
        sel = ", ".join(
            f"{c} + _copy.c * {STRIDE} AS {c}" if c in keys else c for c in cols
        )
        con.sql(
            f"COPY (SELECT {sel} FROM '{BASE}/{t}.parquet', "
            f"(SELECT unnest(range({COPIES})) AS c) _copy) "
            f"TO '{OUT_DIR}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t in _VERBATIM:
        con.sql(
            f"COPY (SELECT * FROM '{BASE}/{t}.parquet') "
            f"TO '{OUT_DIR}/{t}.parquet' (FORMAT PARQUET)"
        )


def _gen_documents(con) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = con.sql(f"SELECT * FROM '{BASE}/documents.parquet'").fetchall()
    out = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
    for copy in range(COPIES):
        for doc_id, text, lang, source, _n in rows:
            if copy:
                toks = text.split(" ")
                toks = [
                    f"{t}c{copy}" if i % 3 == 2 else t for i, t in enumerate(toks)
                ]
                text = " ".join(toks)
            out["doc_id"].append(doc_id + copy * STRIDE)
            out["text"].append(text)
            out["lang"].append(lang)
            out["source"].append(source)
            out["n_chars"].append(len(text))
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    pq.write_table(
        pa.table(out, schema=schema), f"{OUT_DIR}/documents.parquet"
    )


def _gen_embeddings(con) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = con.sql(f"SELECT * FROM '{BASE}/embeddings.parquet'").fetchall()
    mat = np.asarray([r[1] for r in rows], dtype=np.float64)
    dim = mat.shape[1]
    ids = np.asarray([r[0] for r in rows], dtype=np.int64)
    labels = [r[2] for r in rows]
    all_ids, all_vecs, all_labels = [], [], []
    rng = np.random.default_rng(42)
    for copy in range(COPIES):
        if copy == 0:
            q = np.eye(dim)
        else:
            # seeded random rotation: within-copy cosines are preserved
            # exactly; cross-copy cosines are ~N(0, 1/dim)
            q, r = np.linalg.qr(rng.standard_normal((dim, dim)))
            q = q @ np.diag(np.sign(np.diag(r)))
        rotated = (mat @ q.T).astype(np.float32)
        all_ids.extend((ids + copy * STRIDE).tolist())
        all_vecs.extend(rotated.tolist())
        all_labels.extend(labels)
    schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    )
    pq.write_table(
        pa.table(
            {"vec_id": all_ids, "embedding": all_vecs, "label": all_labels},
            schema=schema,
        ),
        f"{OUT_DIR}/embeddings.parquet",
    )


def generate(regen: bool = False) -> None:
    import duckdb

    if not regen and os.path.exists(os.path.join(OUT_DIR, "lineitem.parquet")):
        print(f"slice exists at {OUT_DIR} (use --regen to rebuild)")
        return
    os.makedirs(OUT_DIR, exist_ok=True)
    con = duckdb.connect()
    t0 = time.monotonic()
    _gen_relational(con)
    _gen_documents(con)
    _gen_embeddings(con)
    print(f"generated {COPIES}x slice at {OUT_DIR} in {time.monotonic() - t0:.1f}s")


def time_queries(names: list[str], runs: int = 2) -> dict:
    from ml_with_spark_streaming_spark.plans import QUERIES
    from ml_with_spark_streaming_spark.session import get_spark

    spark = get_spark(app_name="scale-check")
    # same warmup discipline as bench.py: absorb JVM/codegen cold start
    QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()
    out = {}
    for name in names:
        fn = QUERIES[name]
        row = {}
        for label, sf_dir in (("sf0.1", BASE), ("sf1", OUT_DIR)):
            best = float("inf")
            # min-of-N like bench.py; one-time artifact builds (ANN
            # indexes keyed by sf_dir) land in run 1 and the min takes
            # the steady-state run — identical policy at both scales
            for _ in range(runs):
                t0 = time.monotonic()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.monotonic() - t0)
            row[label] = round(best, 3)
        row["ratio"] = round(row["sf1"] / row["sf0.1"], 2) if row["sf0.1"] else None
        out[name] = row
        print(f"{name:42s} sf0.1={row['sf0.1']:8.3f}s  sf1={row['sf1']:8.3f}s  ratio={row['ratio']}")
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--regen", action="store_true")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--queries", nargs="*", default=DEFAULT_QUERIES)
    ap.add_argument("--gen-only", action="store_true")
    args = ap.parse_args()
    generate(regen=args.regen)
    if args.gen_only:
        return 0
    results = time_queries(args.queries, runs=args.runs)
    payload = {
        "data_ratio": COPIES,
        "base": BASE,
        "runs_per_point": args.runs,
        "queries": results,
    }
    # preserve sections owned by sibling checks (door_scale_check.py's
    # "ingest_door") — each tool rewrites only its own keys
    if os.path.exists(OUT_JSON):
        try:
            with open(OUT_JSON, encoding="utf-8") as fh:
                prior = json.load(fh)
            for k, v in prior.items():
                payload.setdefault(k, v)
        except (OSError, ValueError):
            pass
    with open(OUT_JSON, "w", encoding="utf-8") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
    print(f"wrote {OUT_JSON}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
