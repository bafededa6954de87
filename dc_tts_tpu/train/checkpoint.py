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
            # A params-only template may be restored from a FULL train-state
            # checkpoint (the synthesizer pulling weights out of a training
            # logdir) — the params live under the "params//" namespace there.
            alt = "params" + _SEP + key
            if alt in flat:
                key = alt
            else:
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
    """Save a pytree checkpoint; prune to the newest `keep` files.

    keep=5 mirrors tf.train.Saver's max_to_keep default (the reference's
    Supervisor-managed saver, train.py:144); keep=0 disables pruning.
    """
    os.makedirs(logdir, exist_ok=True)
    flat = _flatten(tree)
    flat["__step__"] = np.asarray(step, np.int64)
    path = os.path.join(logdir, step_name(step) + ".npz")
    tmp = path + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path)
    if keep:
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


# ---------------------------------------------------------------------------
# full train-state checkpointing (params + optimizer state + step)
#
# The reference's tf.train.Supervisor saves/restores ALL global variables —
# Adam's m/v slots and global_step included (/root/reference/train.py:144) —
# so a restarted job continues on the same optimizer trajectory and LR.
# These helpers preserve that: the train loop checkpoints
# {"params": ..., "opt_state": ...}; the synthesizer keeps restoring a
# params-only template from the same files (see _unflatten_into's
# "params//" fallback).


def save_train_state(logdir: str, params: Any, opt_state: Any, step: int,
                     keep: int = 5) -> str:
    return save(logdir, {"params": params, "opt_state": opt_state}, step,
                keep=keep)


def _fast_forward_counts(opt_state: Any, step: int) -> Any:
    """Set optax step counters to `step` — used when resuming from a legacy
    params-only checkpoint so the Noam schedule continues from the true
    step instead of re-entering warmup. Adam moments are unrecoverable
    from such checkpoints and restart at zero.

    Targets exactly the scalar fields NAMED ``count`` on optax state
    namedtuples (ScaleByAdamState.count, ScaleByScheduleState.count, ...)
    rather than every integer scalar leaf — a future optax state carrying
    a non-counter integer scalar must not be silently overwritten."""
    import jax.numpy as jnp

    def ff(node):
        if isinstance(node, tuple) and hasattr(node, "_fields"):
            new = {}
            for f in node._fields:
                v = getattr(node, f)
                if f == "count" and np.ndim(v) == 0:
                    new[f] = jnp.asarray(step, np.asarray(v).dtype)
                else:
                    new[f] = ff(v)
            return type(node)(**new)
        if isinstance(node, (list, tuple)):
            return type(node)(ff(v) for v in node)
        if isinstance(node, dict):
            return {k: ff(v) for k, v in node.items()}
        return node

    return ff(opt_state)


def restore_train_state(logdir: str, params_template: Any,
                        opt_state_template: Any
                        ) -> Tuple[Any, Any, int, str]:
    """Restore (params, opt_state, step) from the latest checkpoint.

    Returns (params, opt_state, step, kind) where kind is one of
    "full" (complete optimizer trajectory restored), "legacy"
    (params-only checkpoint: moments reset, schedule counts fast-forwarded
    to the saved step), or "cold" (no checkpoint found).
    """
    path = latest_path(logdir)
    if path is None:
        return params_template, opt_state_template, 0, "cold"
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    step = int(flat.pop("__step__", 0))
    try:
        tree = _unflatten_into(
            {"params": params_template, "opt_state": opt_state_template}, flat)
        return tree["params"], tree["opt_state"], step, "full"
    except KeyError:
        params = _unflatten_into(params_template, flat)
        return (params, _fast_forward_counts(opt_state_template, step),
                step, "legacy")
