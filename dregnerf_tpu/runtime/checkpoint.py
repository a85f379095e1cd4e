"""Self-describing checkpoint manager.

Capability parity with the reference `CheckPointManager`
(conerf/base/checkpoint_manager.py:13-223): step-stamped artifacts under
`<out>/model/`, a latest copy (`model.ckpt`), a best-by-score copy
(`model_best.ckpt`), a `checkpoints.txt` registry, `max_to_keep` +
`keep_checkpoint_every_n_hours` retention.

Format: one `.npz` per checkpoint holding every array leaf with
slash-joined pytree paths, plus an embedded `__meta__` JSON string with all
non-array state (step, aabb, contraction type, render step size, camera
poses as lists, block_id, ...). A NeRF is therefore reconstructable from a
single artifact — the property the registration stage depends on
(reference confidence_loss.py:16-52 `load_radiance_fields`).
"""
from __future__ import annotations

import json
import os
import re
import shutil
import time
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in flat:
        keys = []
        for p in path:
            if hasattr(p, "key"):
                keys.append(str(p.key))
            elif hasattr(p, "idx"):
                keys.append(str(p.idx))
            elif hasattr(p, "name"):
                keys.append(str(p.name))
            else:
                keys.append(str(p))
        out[prefix + "/".join(keys)] = np.asarray(leaf)
    return out


def _unflatten_into(template: Any, flat: Dict[str, np.ndarray], prefix: str = "") -> Any:
    """Restore a pytree with the same structure as `template` from flat arrays."""
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths:
        keys = []
        for p in path:
            if hasattr(p, "key"):
                keys.append(str(p.key))
            elif hasattr(p, "idx"):
                keys.append(str(p.idx))
            elif hasattr(p, "name"):
                keys.append(str(p.name))
            else:
                keys.append(str(p))
        k = prefix + "/".join(keys)
        if k not in flat:
            raise KeyError(f"checkpoint missing leaf {k!r}")
        arr = flat[k]
        if hasattr(leaf, "dtype"):
            arr = arr.astype(leaf.dtype)
        # hand back device arrays: numpy leaves inside jitted code break on
        # traced-index fancy indexing (e.g. the hash-table gather)
        leaves.append(jax.numpy.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_checkpoint(
    path: str, state: Dict[str, Any], meta: Dict[str, Any]
) -> None:
    """Write `state` (pytrees of arrays, keyed by name) + JSON-able `meta`."""
    flat: Dict[str, np.ndarray] = {}
    for name, tree in state.items():
        flat.update(_flatten(tree, prefix=name + "::"))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez(tmp, __meta__=np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    ), **flat)
    # numpy appends .npz to the name passed to savez if missing; normalize
    if not os.path.exists(tmp) and os.path.exists(tmp + ".npz"):
        tmp = tmp + ".npz"
    os.replace(tmp, path)


def load_checkpoint(
    path: str, templates: Optional[Dict[str, Any]] = None
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Returns (state, meta). With `templates`, state values are pytrees of
    the given structure; without, state maps flat 'name::a/b' -> array."""
    with np.load(path, allow_pickle=False) as data:
        meta = json.loads(bytes(data["__meta__"]).decode())
        flat = {k: data[k] for k in data.files if k != "__meta__"}
    if templates is None:
        return flat, meta
    state = {
        name: _unflatten_into(tmpl, flat, prefix=name + "::")
        for name, tmpl in templates.items()
    }
    return state, meta


class CheckpointManager:
    """Directory-level manager with registry/retention/best-tracking."""

    def __init__(
        self,
        save_dir: str,
        max_to_keep: int = 5,
        keep_checkpoint_every_n_hours: float = 10000.0,
    ):
        self.save_dir = save_dir
        self.max_to_keep = max_to_keep
        self.keep_every_s = keep_checkpoint_every_n_hours * 3600.0
        self.best_score = -np.inf
        self._kept: list[tuple[str, float]] = []
        self._last_permanent = time.time()
        os.makedirs(save_dir, exist_ok=True)
        self._load_registry()
        # restore best_score across process restarts (supervised fleet runs
        # kill+restart trainers; without this the first post-restart save
        # would overwrite model_best.ckpt regardless of score)
        if os.path.exists(self.best_path):
            try:
                _, meta = load_checkpoint(self.best_path)
                self.best_score = float(meta.get("_score", -np.inf))
            except Exception:
                pass

    # -- paths ------------------------------------------------------------
    def step_path(self, step: int) -> str:
        return os.path.join(self.save_dir, f"model_{step:06d}.ckpt")

    @property
    def latest_path(self) -> str:
        return os.path.join(self.save_dir, "model.ckpt")

    @property
    def best_path(self) -> str:
        return os.path.join(self.save_dir, "model_best.ckpt")

    @property
    def registry_path(self) -> str:
        return os.path.join(self.save_dir, "checkpoints.txt")

    def _load_registry(self) -> None:
        if not os.path.exists(self.registry_path):
            return
        with open(self.registry_path) as f:
            for line in f:
                name = line.strip()
                if name:
                    p = os.path.join(self.save_dir, name)
                    if os.path.exists(p):
                        self._kept.append((p, os.path.getmtime(p)))

    def _write_registry(self) -> None:
        with open(self.registry_path, "w") as f:
            for p, _ in self._kept:
                f.write(os.path.basename(p) + "\n")

    # -- api ---------------------------------------------------------------
    def save(
        self,
        step: int,
        state: Dict[str, Any],
        meta: Dict[str, Any],
        score: Optional[float] = None,
    ) -> str:
        meta = dict(meta, step=step)
        if score is not None:
            meta["_score"] = float(score)
        path = self.step_path(step)
        save_checkpoint(path, state, meta)
        shutil.copyfile(path, self.latest_path)
        if score is not None and score > self.best_score:
            self.best_score = score
            shutil.copyfile(path, self.best_path)

        now = time.time()
        if now - self._last_permanent >= self.keep_every_s:
            self._last_permanent = now  # this one is permanent: don't track
        else:
            self._kept.append((path, now))
            while len(self._kept) > self.max_to_keep:
                old, _ = self._kept.pop(0)
                if os.path.exists(old):
                    os.remove(old)
        self._write_registry()
        return path

    def latest_step(self) -> Optional[int]:
        if os.path.exists(self.latest_path):
            _, meta = load_checkpoint(self.latest_path)
            return int(meta.get("step", 0))
        steps = [
            int(m.group(1))
            for m in (
                re.match(r"model_(\d+)\.ckpt$", f) for f in os.listdir(self.save_dir)
            )
            if m
        ]
        return max(steps) if steps else None

    def load(
        self, templates: Optional[Dict[str, Any]] = None, path: str = ""
    ) -> Optional[Tuple[Dict[str, Any], Dict[str, Any]]]:
        """latest -> specified -> None (reference load_no_config fallback).

        A directory path resolves to its model.ckpt (latest copy), so
        `--ckpt_path <run>/model` works like pointing at the file."""
        candidates = [path] if path else []
        candidates.append(self.latest_path)
        for cand in candidates:
            if cand and os.path.isdir(cand):
                cand = os.path.join(cand, "model.ckpt")
            if cand and os.path.exists(cand):
                return load_checkpoint(cand, templates)
        return None
