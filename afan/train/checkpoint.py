"""Checkpoint save/restore with overlap-restore semantics.

The reference checkpoints torch state dicts with a *partial overlap-key
restore* that loads whatever intersects and reports the matched fraction
(`Detection/model.py:200-217`); the classification stack keeps
``checkpoint.pt`` + ``best_model.pt`` keyed on val accuracy
(`Classification/main_perturb.py:116-136`).

Here checkpoints are atomically-written pickles of host-numpy pytrees
(``{params, batch_stats, opt_state, step, meta}``) — the same
self-contained-file semantics as the reference's ``torch.save`` dicts,
portable across backends and jax versions. :func:`overlap_restore`
reproduces the reference's tolerant-key behavior for pytrees: leaves present
in both trees with matching shapes are restored, everything else keeps its
initialization, and the matched fraction is returned.
"""
from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _path_key(path) -> str:
    """Stringify one jax key path — the single source of the key
    convention shared by overlap_restore and restore_opt_state."""
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                    for p in path)


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        flat[_path_key(path)] = np.asarray(leaf)
    return flat


def overlap_restore(init_tree: Any, saved_tree: Any) -> Tuple[Any, float]:
    """Restore leaves of ``saved_tree`` into ``init_tree`` wherever the
    path exists in both AND the shape matches; return (tree, matched_frac).

    Parity with `Detection/model.py:206-211` (dict-comprehension overlap +
    "model weights are loaded [k/n]" log).
    """
    saved_flat = _flatten(saved_tree)
    matched = [0]

    def pick(path, leaf):
        cand = saved_flat.get(_path_key(path))
        if cand is not None and tuple(cand.shape) == tuple(np.shape(leaf)):
            matched[0] += 1
            return jax.numpy.asarray(cand, dtype=leaf.dtype)
        return leaf

    out = jax.tree_util.tree_map_with_path(pick, init_tree)
    total = len(jax.tree.leaves(init_tree))
    return out, matched[0] / max(total, 1)


def restore_opt_state(fresh: Any, saved: Any) -> Tuple[Any, bool]:
    """Full-fidelity optimizer-state restore: the reference persists
    optimizer + scheduler state in every checkpoint
    (`Detection/model.py:189-198`, `Classification/main_perturb.py:116-136`)
    so a resumed run keeps SGD momentum and LR position.

    Rebuilds on the FRESH state's treedef (container classes in an old
    pickle may differ across optax versions) with the saved leaf values.
    Leaves are paired by flattened KEY PATH, not flatten order — a
    reordered container chain in an old pickle could otherwise silently
    swap same-shaped leaves (e.g. a momentum trace for a params-shaped
    leaf). Returns (opt_state, ok); any path/shape mismatch falls back
    to the fresh init with ok=False.
    """
    import jax.numpy as jnp

    def _paths(tree):
        return [(_path_key(path), leaf) for path, leaf in
                jax.tree_util.tree_flatten_with_path(tree)[0]]

    fresh_flat = _paths(fresh)
    saved_flat = dict(_paths(saved))
    if len(saved_flat) != len(fresh_flat):
        return fresh, False
    treedef = jax.tree.structure(fresh)
    out = []
    for key, f in fresh_flat:
        if key not in saved_flat:
            return fresh, False
        s = np.asarray(saved_flat[key])
        if tuple(s.shape) != tuple(np.shape(f)):
            return fresh, False
        out.append(jnp.asarray(s, dtype=getattr(f, "dtype", s.dtype)))
    return jax.tree.unflatten(treedef, out), True


def save_checkpoint(path: str, payload: Dict[str, Any]) -> str:
    """Write a checkpoint: pickle of host numpy trees, written to a temp
    file and atomically renamed (a crash mid-write can't corrupt the
    previous checkpoint — the reference's torch.save lacks this)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    host = jax.tree.map(lambda x: np.asarray(x)
                        if hasattr(x, "shape") else x, payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(host, f, protocol=4)
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str) -> Optional[Dict[str, Any]]:
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        return pickle.load(f)
