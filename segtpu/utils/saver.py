"""Checkpoint/resume + best-arch tracking.

Reference: torch.save/torch.load of controller state + search history,
and a ``Saver`` keeping the best architectures (SURVEY.md §5.4).
TPU rebuild: pytrees serialize as .npz (flattened by keypath) plus a
JSON sidecar for structure-free metadata — dependency-free, portable,
and independent of jax versions. Orbax is deliberately not required for
these tiny states (controller ≈ 100k params).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional

import numpy as np
import jax


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save_pytree(path: str, tree) -> None:
    np.savez(path, **_flatten(tree))


def load_pytree_like(path: str, template):
    """Load an .npz into the structure of ``template``."""
    data = np.load(path)
    flat_t, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for p, leaf in flat_t:
        key = "/".join(str(getattr(q, "key", getattr(q, "idx", q)))
                       for q in p)
        arr = data[key]
        assert arr.shape == np.asarray(leaf).shape, (key, arr.shape, leaf.shape)
        import jax.numpy as jnp
        leaves.append(jnp.asarray(arr.astype(np.asarray(leaf).dtype)))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), leaves)


class SearchSaver:
    """Search-state persistence + top-k genotype records
    (reference: Saver-style best-ckpt keeper + controller snapshots)."""

    def __init__(self, snapshot_dir: str, keep_top: int = 5):
        self.dir = snapshot_dir
        self.keep_top = keep_top
        os.makedirs(snapshot_dir, exist_ok=True)
        self.history: List[Dict[str, Any]] = []

    @property
    def _meta_path(self):
        return os.path.join(self.dir, "search_state.json")

    def record(self, step: int, genotype, reward: float, extra=None):
        self.history.append({"step": step, "genotype": genotype,
                             "reward": float(reward),
                             **(extra or {})})
        with open(os.path.join(self.dir, "search_log.jsonl"), "a") as f:
            f.write(json.dumps(self.history[-1]) + "\n")

    def best(self, k: Optional[int] = None):
        k = k or self.keep_top
        return sorted(self.history, key=lambda r: -r["reward"])[:k]

    def save(self, step: int, controller_params, baseline: float):
        save_pytree(os.path.join(self.dir, "controller.npz"),
                    controller_params)
        with open(self._meta_path, "w") as f:
            json.dump({"step": step, "baseline": float(baseline),
                       "history": self.history, "best": self.best()}, f)

    def load(self, controller_template):
        """-> (step, controller_params, baseline) or None if no snapshot."""
        if not os.path.exists(self._meta_path):
            return None
        with open(self._meta_path) as f:
            meta = json.load(f)
        params = load_pytree_like(
            os.path.join(self.dir, "controller.npz"), controller_template)
        self.history = meta["history"]
        return meta["step"], params, meta["baseline"]
