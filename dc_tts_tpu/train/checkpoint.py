"""Two-namespace checkpointing.

The reference composes ONE inference graph from TWO separately trained
checkpoints via scope-filtered Savers: Text2Mel trainables from logdir-1,
SSRN trainables + global step from logdir-2
(``/root/reference/synthesize.py:32-41``). This module preserves that
contract: each network saves/restores its own namespace independently; a
synthesizer restores "text2mel" from one directory and "ssrn" from another.

Format: flattened pytree -> ``.npz`` (one per step) + the step encoded in
the filename ``model_gs_{NNN}k.npz`` exactly like the reference's
``model_gs_{NNN}k`` naming (train.py:151-152). Restore picks the latest.
Pure numpy I/O — no TF, no orbax dependency on the hot path.
"""
from __future__ import annotations

import os
import re
from typing import Any, Optional, Tuple

import jax
import numpy as np


_SEP = "//"


def _flatten(tree) -> dict:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = _SEP.join(_path_str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _path_str(p) -> str:
    if hasattr(p, "key"):
        return str(p.key)
    if hasattr(p, "idx"):
        return str(p.idx)
    if hasattr(p, "name"):
        return str(p.name)
    return str(p)


def _unflatten_into(template, flat: dict):
    leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for path, leaf in leaves_with_path:
        key = _SEP.join(_path_str(p) for p in path)
        if key not in flat:
            raise KeyError(f"checkpoint missing leaf {key!r}")
        arr = flat[key]
        if tuple(arr.shape) != tuple(np.shape(leaf)):
            raise ValueError(
                f"shape mismatch for {key!r}: ckpt {arr.shape} vs "
                f"model {np.shape(leaf)}")
        new_leaves.append(arr.astype(np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def step_name(step: int) -> str:
    """'model_gs_012k' for step 12000 — the reference's naming scheme."""
    return "model_gs_" + str(step // 1000).zfill(3) + "k"


def save(logdir: str, tree: Any, step: int, keep: int = 5) -> str:
    """Save a pytree checkpoint; prune to the newest `keep` files."""
    os.makedirs(logdir, exist_ok=True)
    flat = _flatten(tree)
    flat["__step__"] = np.asarray(step, np.int64)
    path = os.path.join(logdir, step_name(step) + ".npz")
    tmp = path + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path)
    ckpts = sorted_checkpoints(logdir)
    for old in ckpts[:-keep]:
        os.remove(os.path.join(logdir, old))
    return path


def sorted_checkpoints(logdir: str):
    if not os.path.isdir(logdir):
        return []
    pat = re.compile(r"model_gs_(\d+)k\.npz$")
    found = [(int(m.group(1)), f) for f in os.listdir(logdir)
             if (m := pat.match(f))]
    return [f for _, f in sorted(found)]


def latest_path(logdir: str) -> Optional[str]:
    ckpts = sorted_checkpoints(logdir)
    return os.path.join(logdir, ckpts[-1]) if ckpts else None


def restore(logdir: str, template: Any) -> Tuple[Any, int]:
    """Restore the latest checkpoint into `template`'s structure.

    Returns (tree, step). Raises FileNotFoundError when no checkpoint exists
    (callers decide whether that means cold start).
    """
    path = latest_path(logdir)
    if path is None:
        raise FileNotFoundError(f"no checkpoint in {logdir}")
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    step = int(flat.pop("__step__", 0))
    return _unflatten_into(template, flat), step


def restore_or_init(logdir: str, template: Any) -> Tuple[Any, int]:
    """Crash-and-resume semantics of tf.train.Supervisor (train.py:144):
    restore the latest checkpoint if present, otherwise keep the template."""
    try:
        return restore(logdir, template)
    except FileNotFoundError:
        return template, 0
