"""Filesystem model registry: per-key checkpoints + best-by-metric.

Reference semantics being re-expressed (S8/D7 in SURVEY.md §2):
* per-batch-size checkpoint — joblib dump/load each batch
  (PAC/passiveAgressiveModel.py:92-94);
* best-so-far snapshot when F1 improves
  (PAC/passiveAgressiveModel.py:117-122), plus a human-readable
  stats file (S7).

Storage is ``.npz`` (numpy state dicts from the incremental learners)
plus a JSON sidecar of metrics — no pickle, so checkpoints are
portable and inspectable. On a cluster this directory would live on
shared storage (HDFS/S3 via a mounted path); state is O(num_features),
so checkpoint IO is trivial at any data scale.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


class ModelRegistry:
    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _paths(self, key: str, best: bool = False) -> tuple[str, str]:
        suffix = "_best" if best else ""
        return (
            os.path.join(self.root, f"{key}{suffix}.npz"),
            os.path.join(self.root, f"{key}{suffix}.json"),
        )

    def save(self, key: str, state: dict[str, np.ndarray], meta: dict | None = None) -> None:
        npz, js = self._paths(key)
        np.savez_compressed(npz, **state)
        with open(js, "w") as f:
            json.dump({"ts": time.time(), **(meta or {})}, f, indent=1)

    def load(self, key: str, best: bool = False) -> dict[str, np.ndarray] | None:
        npz, _ = self._paths(key, best)
        if not os.path.exists(npz):
            return None
        with np.load(npz) as z:
            return {k: z[k] for k in z.files}

    def meta(self, key: str, best: bool = False) -> dict | None:
        _, js = self._paths(key, best)
        if not os.path.exists(js):
            return None
        with open(js) as f:
            return json.load(f)

    def save_if_best(
        self, key: str, state: dict[str, np.ndarray], metric: float, meta: dict | None = None
    ) -> bool:
        """D7: checkpoint under ``<key>_best`` iff ``metric`` beats the
        stored best. Returns True when the snapshot was taken."""
        prev = self.meta(key, best=True)
        if prev is not None and prev.get("metric", float("-inf")) >= metric:
            return False
        npz, js = self._paths(key, best=True)
        np.savez_compressed(npz, **state)
        with open(js, "w") as f:
            json.dump({"ts": time.time(), "metric": metric, **(meta or {})}, f, indent=1)
        return True
