"""Optimizer: Adam + Noam decay + per-element gradient value clipping.

Reproduces the reference's training scheme (``/root/reference/train.py:120-131``
plus ``utils.py:142-145``): Noam learning rate
``lr0 * sqrt(warmup) * min((step+1) * warmup^-1.5, (step+1)^-0.5)``,
tf.train.AdamOptimizer defaults (b1=0.9, b2=0.999, eps=1e-8), and
``clip_by_value(grad, -1, 1)`` applied BEFORE Adam.
"""
from __future__ import annotations

import jax.numpy as jnp
import optax

from ..config import Config


def noam_schedule(init_lr: float, warmup_steps: float = 4000.0):
    """optax schedule: 0-based count -> lr. The reference evaluates the decay
    at global_step + 1 (utils.py:144), hence the +1."""
    def schedule(count):
        step = count + 1.0
        return init_lr * (warmup_steps ** 0.5) * jnp.minimum(
            step * warmup_steps ** -1.5, step ** -0.5)
    return schedule


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip(1.0),  # per-element value clip, as in train.py:127
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_schedule(noam_schedule(cfg.lr, cfg.warmup_steps)),
        optax.scale(-1.0),
    )
