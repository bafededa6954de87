"""Jitted training steps for Text2Mel and SSRN.

Each network trains independently with its own parameters/optimizer state —
the reference's two-job task split (``/root/reference/train.py:22-27``,
README's "train Text2Mel and SSRN on two GPUs") carried over as two
independent jit functions that can run concurrently on disjoint device sets.

Steps are pure (state, batch, rng) -> (state, metrics) functions, donated
and pjit-shardable over a data mesh axis (see ``parallel/``).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..models.ssrn import SSRN
from ..models.text2mel import Text2Mel
from .losses import attention_diagonality, ssrn_loss, text2mel_loss
from .optimizer import make_optimizer


class Text2MelTrainState(NamedTuple):
    params: dict
    opt_state: tuple
    step: jax.Array  # () int32 global step


class SSRNTrainState(NamedTuple):
    params: dict
    opt_state: tuple
    step: jax.Array


def init_text2mel_state(cfg: Config, key) -> Text2MelTrainState:
    params = Text2Mel(cfg).init(key)
    opt_state = make_optimizer(cfg).init(params)
    return Text2MelTrainState(params, opt_state, jnp.zeros((), jnp.int32))


def init_ssrn_state(cfg: Config, key) -> SSRNTrainState:
    params = SSRN(cfg).init(key)
    opt_state = make_optimizer(cfg).init(params)
    return SSRNTrainState(params, opt_state, jnp.zeros((), jnp.int32))


def teacher_forcing_shift(mels: jax.Array) -> jax.Array:
    """S = [0; mels[:, :-1]] — the decoder input shift (train.py:51)."""
    return jnp.concatenate([jnp.zeros_like(mels[:, :1]), mels[:, :-1]], axis=1)


def make_text2mel_step(cfg: Config, axis_name: Optional[str] = None):
    """Build the Text2Mel train step.

    batch: dict(texts (B,N) i32, mels (B,T,n_mels) f32,
                text_lens (B,) i32, mel_lens (B,) i32).
    With axis_name set, gradients are mean-reduced across that mesh axis
    inside the step (for shard_map-style use); under pjit/GSPMD sharding the
    all-reduce is inserted automatically and axis_name stays None.
    """
    model = Text2Mel(cfg)
    opt = make_optimizer(cfg)

    def loss_fn(params, batch, rng):
        S = teacher_forcing_shift(batch["mels"])
        logits, Y, align, _ = model.apply(params, batch["texts"], S,
                                          rng=rng, train=True)
        loss, metrics = text2mel_loss(logits, Y, align, batch["mels"], cfg,
                                      batch.get("text_lens"),
                                      batch.get("mel_lens"))
        metrics["attention_diagonality"] = attention_diagonality(
            align, batch.get("text_lens"), batch.get("mel_lens"))
        return loss, metrics

    def step(state: Text2MelTrainState, batch, rng
             ) -> Tuple[Text2MelTrainState, dict]:
        rng = jax.random.fold_in(rng, state.step)
        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch, rng)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return Text2MelTrainState(params, opt_state, state.step + 1), metrics

    return step


def make_ssrn_step(cfg: Config, axis_name: Optional[str] = None):
    """Build the SSRN train step.

    batch: dict(mels (B,T/r,n_mels) f32, mags (B,T,n_freq) f32).
    SSRN consumes ground-truth coarse mels during training (train.py:69-72).
    """
    model = SSRN(cfg)
    opt = make_optimizer(cfg)

    def loss_fn(params, batch, rng):
        logits, Z = model.apply(params, batch["mels"], rng=rng, train=True)
        return ssrn_loss(logits, Z, batch["mags"], cfg)

    def step(state: SSRNTrainState, batch, rng) -> Tuple[SSRNTrainState, dict]:
        rng = jax.random.fold_in(rng, state.step)
        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch, rng)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return SSRNTrainState(params, opt_state, state.step + 1), metrics

    return step
