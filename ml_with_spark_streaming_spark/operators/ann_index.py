"""Persisted IVF index artifact for the batch ANN path: fit once,
save, probe many.

Every batch ANN query used to refit KMeans centroids and recompute the
corpus→centroid assignment at query time — correct, but at 100 TB the
fit is a multi-pass job you run ONCE and the assignment is a table you
store next to the corpus, not a per-query cost (locally the two fits
were most of q165+q166's bench time). ``IVFIndex`` is that artifact:

* ``build`` — one MLlib KMeans fit (``kmeans_centroids``, seeded,
  layout-pinned) + one assignment pass (``assign_to_centroids``),
  recording the corpus row count so downstream knob derivation
  (sign-LSH bits, SemDeDup k) never needs another full-table action;
* ``save``/``load`` — centroids + assignment table as parquet plus a
  params sidecar; loading with conflicting knobs RAISES (an index fit
  with different k/seed answers a different question — silently
  probing it would be a wrong-results bug), the exact contract
  ``streaming/embedding_dedup_filter.py`` ships for the vector gate;
* ``ivf_index_for`` — the build-once/load-many front door the
  registered queries (q106/q165/q166) use: keyed by (corpus key,
  knobs), backed by disk under ``$SPARK_GRAFT_INDEX_DIR`` (default: a
  per-process temp dir) and an in-process memo, so the first caller
  pays the fit and every later query — including bench re-runs —
  reads the artifact.

Consumers: ``ivf_topk(..., centroids=idx.centroids,
assignments=idx.assignments)`` and ``semdedup(...,
assignments=idx.assignments)`` skip their in-query fit/assign stages;
equality with the fresh-fit paths is pinned by tests/test_ann_index.py.

At scale: centroids are a k×dim broadcast table; the assignment table
is co-partitioned/bucketed with the corpus by id so the probe join is
shuffle-free; refresh (new corpus slices) appends assignment rows for
the delta against the FROZEN centroids and refits only when drift
metrics demand it — the q168 refresh-equals-recompute discipline.
"""

from __future__ import annotations

import atexit
import hashlib
import json
import os
import shutil
import tempfile
from dataclasses import dataclass

from pyspark.sql import DataFrame

from ml_with_spark_streaming_spark.lineage import maybe_checkpoint
from ml_with_spark_streaming_spark.operators.similarity import (
    assign_to_centroids,
    derive_semdedup_knobs,
    kmeans_centroids,
)


@dataclass
class IVFIndex:
    """The persisted fit: ``centroids`` (cent_id, cent_vec),
    ``assignments`` (c_id, cent_id), and the knobs + corpus size the
    fit is a function of."""

    centroids: DataFrame
    assignments: DataFrame
    n_centroids: int
    seed: int
    c_id: str
    c_vec: str
    n_vectors: int

    @classmethod
    def build(
        cls,
        corpus: DataFrame,
        n_centroids: int | None = 16,
        c_id: str = "vec_id",
        c_vec: str = "embedding",
        seed: int = 42,
    ) -> "IVFIndex":
        """Fit + assign, once. ``n_centroids=None`` derives k ≈ √n
        (``derive_semdedup_knobs``) — the one corpus ``count()`` here
        is a BUILD-time action, amortized over the artifact's life
        (and recorded in the sidecar so no consumer repeats it)."""
        n = corpus.count()
        k = derive_semdedup_knobs(n) if n_centroids is None else int(n_centroids)
        cents = maybe_checkpoint(
            kmeans_centroids(corpus, n_centroids=k, c_vec=c_vec, c_id=c_id, seed=seed)
        )
        assigned = maybe_checkpoint(assign_to_centroids(corpus, cents, c_id, c_vec))
        return cls(
            centroids=cents,
            assignments=assigned,
            n_centroids=k,
            seed=seed,
            c_id=c_id,
            c_vec=c_vec,
            n_vectors=int(n),
        )

    def append(
        self,
        delta: DataFrame,
        assigned: DataFrame | None = None,
        n_delta: int | None = None,
    ) -> "IVFIndex":
        """Incremental index maintenance: assign ONLY the delta against
        the FROZEN centroids and union the assignment rows — one narrow
        pass over the new slice, the corpus is never rescanned (q168's
        refresh-==-recompute discipline applied to the vector index).
        Because assignment is per-vector independent given fixed
        centroids, the merged table is EXACTLY what a full assignment
        pass over base ∪ delta against the same centroids would produce
        (pinned by tests/test_ann_index.py). Centroids are deliberately
        NOT refit — at scale you refit on drift metrics, not per drop;
        a refit is a new index, not an append. Returns a new IVFIndex
        (the artifact is immutable once saved).

        ``assigned``/``n_delta``: callers that already ran the
        delta's assignment pass (the streaming maintainer assigns once
        and reuses the rows for its per-bucket counters) pass both and
        skip the duplicate pass + count action here; ``assigned`` must
        be exactly ``assign_to_centroids(delta, self.centroids, ...)``."""
        new_rows = (
            assigned
            if assigned is not None
            else maybe_checkpoint(
                assign_to_centroids(delta, self.centroids, self.c_id, self.c_vec)
            )
        )
        merged = maybe_checkpoint(self.assignments.unionByName(new_rows))
        n_new = int(n_delta) if n_delta is not None else delta.count()
        return IVFIndex(
            centroids=self.centroids,
            assignments=merged,
            n_centroids=self.n_centroids,
            seed=self.seed,
            c_id=self.c_id,
            c_vec=self.c_vec,
            n_vectors=self.n_vectors + n_new,
        )

    def save(self, path: str) -> None:
        self.centroids.write.mode("overwrite").parquet(f"{path}/centroids")
        self.assignments.write.mode("overwrite").parquet(f"{path}/assignments")
        spark = self.centroids.sparkSession
        spark.createDataFrame(
            [(self.n_centroids, self.seed, self.c_id, self.c_vec, self.n_vectors)],
            "n_centroids int, seed int, c_id string, c_vec string, n_vectors long",
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/params")

    @classmethod
    def load(cls, spark, path: str, **kw) -> "IVFIndex":
        """Resume from ``save`` artifacts — no corpus rescan, no fit.
        Knobs come from the params sidecar; conflicting overrides
        raise (a different k or seed is a DIFFERENT index)."""
        p = spark.read.parquet(f"{path}/params").collect()[0]
        saved = {
            "n_centroids": int(p["n_centroids"]),
            "seed": int(p["seed"]),
            "c_id": str(p["c_id"]),
            "c_vec": str(p["c_vec"]),
        }
        for name, val in saved.items():
            if name in kw and kw[name] is not None and kw[name] != val:
                raise ValueError(
                    f"index at {path} was built with {name}={val!r}; "
                    f"got {name}={kw[name]!r} — rebuild the index or drop the override"
                )
        return cls(
            centroids=spark.read.parquet(f"{path}/centroids"),
            assignments=spark.read.parquet(f"{path}/assignments"),
            n_vectors=int(p["n_vectors"]),
            **saved,
        )


@dataclass
class PQIndex:
    """The persisted product-quantization fit: per-subspace
    ``codebooks`` (sub_id, cent_id, cent_vec), the corpus ``codes``
    (c_id, codes array<int>) — the 4-byte-per-vector compressed
    representation ADC scans — and the knobs the fit is a function of.
    Same save/load/refusal contract as ``IVFIndex``; at scale codes
    are co-partitioned with the corpus (and with the IVF assignment
    table) by id, so the IVF-PQ probe join is shuffle-free."""

    codebooks: DataFrame
    codes: DataFrame
    m: int
    k_sub: int
    seed: int
    c_id: str
    c_vec: str

    @classmethod
    def build(
        cls,
        corpus: DataFrame,
        m: int = 4,
        k_sub: int = 16,
        c_id: str = "vec_id",
        c_vec: str = "embedding",
        seed: int = 42,
    ) -> "PQIndex":
        from ml_with_spark_streaming_spark.operators.pq import pq_codebooks, pq_encode

        cbs = maybe_checkpoint(
            pq_codebooks(corpus, m=m, k_sub=k_sub, c_id=c_id, c_vec=c_vec, seed=seed)
        )
        codes = maybe_checkpoint(pq_encode(corpus, cbs, m=m, c_id=c_id, c_vec=c_vec))
        return cls(
            codebooks=cbs, codes=codes, m=m, k_sub=k_sub, seed=seed, c_id=c_id, c_vec=c_vec
        )

    def append(self, delta: DataFrame, codes: DataFrame | None = None) -> "PQIndex":
        """Incremental PQ maintenance, the q169 discipline for the
        COMPRESSED representation: encode ONLY the delta against the
        FROZEN per-subspace codebooks and union the code rows — one
        narrow pass over the new slice, bit-identical to re-encoding
        base ∪ delta (encoding is per-vector independent given fixed
        codebooks; pinned by tests/test_ann_index.py). Codebooks are
        deliberately not refit — a codebook refit re-codes the whole
        corpus and is a NEW index built on drift metrics, exactly like
        the IVF centroid refit (the streaming maintainer retrains them
        AT the IVF refit when armed — ``refit_pq_codebooks``).

        ``codes``: callers that already encoded the delta (the
        streaming maintainer reuses the batch's codes for its
        quantization-error gauge and its append slices) pass them and
        skip the duplicate encode; must be exactly
        ``pq_encode(delta, self.codebooks, ...)``."""
        from ml_with_spark_streaming_spark.operators.pq import pq_encode

        new_codes = (
            codes
            if codes is not None
            else maybe_checkpoint(
                pq_encode(
                    delta, self.codebooks, m=self.m, c_id=self.c_id, c_vec=self.c_vec
                )
            )
        )
        return PQIndex(
            codebooks=self.codebooks,
            codes=maybe_checkpoint(self.codes.unionByName(new_codes)),
            m=self.m,
            k_sub=self.k_sub,
            seed=self.seed,
            c_id=self.c_id,
            c_vec=self.c_vec,
        )

    def save(self, path: str) -> None:
        self.codebooks.write.mode("overwrite").parquet(f"{path}/codebooks")
        self.codes.write.mode("overwrite").parquet(f"{path}/codes")
        spark = self.codebooks.sparkSession
        spark.createDataFrame(
            [(self.m, self.k_sub, self.seed, self.c_id, self.c_vec)],
            "m int, k_sub int, seed int, c_id string, c_vec string",
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/params")

    @classmethod
    def load(cls, spark, path: str, **kw) -> "PQIndex":
        p = spark.read.parquet(f"{path}/params").collect()[0]
        saved = {
            "m": int(p["m"]),
            "k_sub": int(p["k_sub"]),
            "seed": int(p["seed"]),
            "c_id": str(p["c_id"]),
            "c_vec": str(p["c_vec"]),
        }
        for name, val in saved.items():
            if name in kw and kw[name] is not None and kw[name] != val:
                raise ValueError(
                    f"index at {path} was built with {name}={val!r}; "
                    f"got {name}={kw[name]!r} — rebuild the index or drop the override"
                )
        return cls(
            codebooks=spark.read.parquet(f"{path}/codebooks"),
            codes=spark.read.parquet(f"{path}/codes"),
            **saved,
        )


_MEMO: dict[tuple, IVFIndex] = {}
_PQ_MEMO: dict[tuple, PQIndex] = {}
_PROC_ROOT: list[str] = []


def _corpus_fingerprint(cache_key: str) -> str:
    """Cheap identity of the corpus BEHIND a cache key: the sorted
    (relpath, size, mtime_ns) listing of the files under the key's
    filesystem path (any ``#variant`` suffix stripped), hashed. This is
    what lets a persisted artifact detect that the data at the same
    path was REGENERATED — without it, ``SPARK_GRAFT_INDEX_DIR`` would
    silently serve a stale index fit on the old data (wrong neighbors,
    and q165 deriving knobs from a stale ``n_vectors``). A listing walk
    is O(#files) driver-side stat calls — never a data scan."""
    base = cache_key.split("#", 1)[0]
    parts: list[str] = []
    # never fingerprint the index store itself: if SPARK_GRAFT_INDEX_DIR
    # nests under the corpus path, writing the artifact would change the
    # "corpus" fingerprint and self-invalidate on every call
    skip = os.environ.get("SPARK_GRAFT_INDEX_DIR")
    skip_real = os.path.realpath(skip) if skip else None
    if os.path.isdir(base):
        for root, dirs, files in os.walk(base):
            dirs.sort()
            if skip_real is not None:
                dirs[:] = [
                    d
                    for d in dirs
                    if os.path.realpath(os.path.join(root, d)) != skip_real
                ]
            for f in sorted(files):
                p = os.path.join(root, f)
                try:
                    st = os.stat(p)
                except OSError:
                    continue
                parts.append(
                    f"{os.path.relpath(p, base)}:{st.st_size}:{st.st_mtime_ns}"
                )
    elif os.path.isfile(base):
        try:
            st = os.stat(base)
            parts.append(f"{os.path.basename(base)}:{st.st_size}:{st.st_mtime_ns}")
        except OSError:
            pass
    return hashlib.md5("\n".join(parts).encode()).hexdigest()


def _artifact_is_current(path: str, fingerprint: str) -> bool:
    """True iff a saved artifact exists at ``path`` AND was built from
    a corpus with this fingerprint; anything else (absent, pre-
    fingerprint layout, regenerated data) means (re)build."""
    if not os.path.exists(os.path.join(path, "params")):
        return False
    try:
        with open(os.path.join(path, "fingerprint.json"), encoding="utf-8") as fh:
            return json.load(fh).get("fingerprint") == fingerprint
    except (OSError, ValueError):
        return False


def _write_fingerprint(path: str, fingerprint: str) -> None:
    tmp = os.path.join(path, "fingerprint.json.tmp")
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump({"fingerprint": fingerprint}, fh)
    os.replace(tmp, os.path.join(path, "fingerprint.json"))


def _index_root() -> str:
    root = os.environ.get("SPARK_GRAFT_INDEX_DIR")
    if root:
        os.makedirs(root, exist_ok=True)
        return root
    if not _PROC_ROOT:
        d = tempfile.mkdtemp(prefix="spark_graft_ivf_")
        _PROC_ROOT.append(d)
        atexit.register(shutil.rmtree, d, ignore_errors=True)
    return _PROC_ROOT[0]


def ivf_index_for(
    corpus: DataFrame,
    cache_key: str,
    n_centroids: int | None = 16,
    c_id: str = "vec_id",
    c_vec: str = "embedding",
    seed: int = 42,
) -> IVFIndex:
    """Build-once / load-many: return the IVF index for ``corpus``
    under ``cache_key`` (the caller's corpus identity — the registered
    queries pass the sf_dir path). First call fits, SAVES the artifact
    to disk, and reloads it (so the returned tables genuinely read the
    persisted parquet — the plan a probe-many deployment runs); later
    calls in the same process return the memo, later processes with
    ``SPARK_GRAFT_INDEX_DIR`` set reload from disk."""
    fp = _corpus_fingerprint(cache_key)
    key = (os.path.realpath(cache_key), n_centroids, c_id, c_vec, seed, fp)
    idx = _MEMO.get(key)
    if idx is not None:
        return idx
    spark = corpus.sparkSession
    digest = hashlib.md5(repr(key[:-1]).encode()).hexdigest()[:16]
    path = os.path.join(_index_root(), f"ivf_{digest}")
    if not _artifact_is_current(path, fp):
        # absent OR fit on since-regenerated data: rebuild, never serve stale
        shutil.rmtree(path, ignore_errors=True)
        IVFIndex.build(
            corpus, n_centroids=n_centroids, c_id=c_id, c_vec=c_vec, seed=seed
        ).save(path)
        _write_fingerprint(path, fp)
    idx = IVFIndex.load(spark, path, c_id=c_id, c_vec=c_vec, seed=seed)
    _MEMO[key] = idx
    return idx


def pq_index_for(
    corpus: DataFrame,
    cache_key: str,
    m: int = 4,
    k_sub: int = 16,
    c_id: str = "vec_id",
    c_vec: str = "embedding",
    seed: int = 42,
) -> PQIndex:
    """``ivf_index_for``'s contract for the PQ artifact: first caller
    fits (m seeded KMeans runs) + encodes + saves; later calls load
    the persisted codebooks/codes — the compressed corpus is encoded
    ONCE, not per query."""
    fp = _corpus_fingerprint(cache_key)
    key = ("pq", os.path.realpath(cache_key), m, k_sub, c_id, c_vec, seed, fp)
    idx = _PQ_MEMO.get(key)
    if idx is not None:
        return idx
    spark = corpus.sparkSession
    digest = hashlib.md5(repr(key[:-1]).encode()).hexdigest()[:16]
    path = os.path.join(_index_root(), f"pq_{digest}")
    if not _artifact_is_current(path, fp):
        shutil.rmtree(path, ignore_errors=True)
        PQIndex.build(
            corpus, m=m, k_sub=k_sub, c_id=c_id, c_vec=c_vec, seed=seed
        ).save(path)
        _write_fingerprint(path, fp)
    idx = PQIndex.load(spark, path, c_id=c_id, c_vec=c_vec, seed=seed)
    _PQ_MEMO[key] = idx
    return idx
