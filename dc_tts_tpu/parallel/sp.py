"""Sequence parallelism: shard the time axis of conv stacks with halo
exchange.

SSRN (and any non-causal stack here) is convolutional with small receptive
fields per block — kernel 3, dilation <= 3 — so the time axis T shards
cleanly across a mesh axis: each shard computes its local frames after
exchanging ``halo = (K-1)*rate/2`` boundary frames with its neighbors via
``lax.ppermute`` (ICI neighbor exchange, SURVEY §2.3/§5). Edge shards
receive zeros from the void, which reproduces exactly the zero SAME-padding
of the unsharded op. The stride-2 transposed conv needs a single left-halo
frame (y[2t] = x[t] w0 + x[t-1] w2).

This is the scaling path for long-utterance batched synthesis: SSRN +
Griffin-Lim dominate FLOPs at large T, and DP over utterances alone cannot
shard a single long utterance.

Implementation detail: blocks run in "valid" mode on halo-extended inputs
inside a ``shard_map`` over the mesh axis; everything else (LN, gates,
activations) is positionwise and shards trivially.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import Config
from ..models import layers as L
from ..models.blocks import C, D, HC, _act


def _exchange_halo(x, left_n: int, right_n: int, axis_name: str):
    """Fetch left_n trailing frames from the left neighbor and right_n
    leading frames from the right neighbor. Non-neighbors contribute zeros
    (edge shards), matching SAME zero padding."""
    n = jax.lax.axis_size(axis_name)
    parts = []
    if left_n > 0:
        # shard i receives shard i-1's tail: perm (src -> dst) = (i, i+1)
        perm = [(i, i + 1) for i in range(n - 1)]
        left = jax.lax.ppermute(x[:, -left_n:, :], axis_name, perm)
        parts.append(left)
    parts.append(x)
    if right_n > 0:
        perm = [(i + 1, i) for i in range(n - 1)]
        right = jax.lax.ppermute(x[:, :right_n, :], axis_name, perm)
        parts.append(right)
    return jnp.concatenate(parts, axis=1)


def _conv_valid(p, x_ext, size: int, rate: int, t_out: int):
    """Dilated conv over an already halo-padded input, producing t_out."""
    w = p["w"]
    K, cin, cout = w.shape
    if K == 1:
        y = jnp.dot(x_ext, w[0], preferred_element_type=jnp.float32)
    else:
        taps = [jax.lax.slice_in_dim(x_ext, k * rate, k * rate + t_out, axis=1)
                for k in range(K)]
        y = jnp.dot(jnp.concatenate(taps, axis=-1),
                    w.reshape(K * cin, cout),
                    preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"]
    return y


def _apply_block_sp(p, spec, x, axis_name: str, ln_eps: float):
    t_local = x.shape[1]
    if isinstance(spec, D):
        # y[2t] = x[t] w0 + x[t-1] w2 ; y[2t+1] = x[t] w1 — one left halo.
        x_ext = _exchange_halo(x, 1, 0, axis_name)
        x_prev = x_ext[:, :t_local, :]
        w = p["conv"]["w"]
        even = (jnp.dot(x, w[0], preferred_element_type=jnp.float32)
                + jnp.dot(x_prev, w[2], preferred_element_type=jnp.float32))
        odd = jnp.dot(x, w[1], preferred_element_type=jnp.float32)
        y = jnp.stack([even, odd], axis=2).reshape(
            x.shape[0], 2 * t_local, w.shape[-1])
        if "b" in p["conv"]:
            y = y + p["conv"]["b"]
        y = L.layer_norm(p["ln"], y, ln_eps)
        return _act(y, spec.act)

    total = (spec.size - 1) * spec.rate
    left = total // 2
    right = total - left
    x_ext = _exchange_halo(x, left, right, axis_name) if total else x
    if isinstance(spec, C):
        y = _conv_valid(p["conv"], x_ext, spec.size, spec.rate, t_local)
        y = L.layer_norm(p["ln"], y, ln_eps)
        return _act(y, spec.act)
    if isinstance(spec, HC):
        h = _conv_valid(p["conv"], x_ext, spec.size, spec.rate, t_local)
        h1, h2 = jnp.split(h, 2, axis=-1)
        h1 = jax.nn.sigmoid(L.layer_norm(p["ln1"], h1, ln_eps))
        h2 = L.layer_norm(p["ln2"], h2, ln_eps)
        return h1 * h2 + (1.0 - h1) * x
    raise TypeError(spec)


def apply_stack_sp(params: Sequence[dict], specs: Sequence, x, *,
                   axis_name: str, ln_eps: float = 1e-5):
    """Shard-local stack apply; call inside shard_map with T sharded."""
    for p, spec in zip(params, specs):
        x = _apply_block_sp(p, spec, x, axis_name, ln_eps)
    return x


def ssrn_apply_sp(cfg: Config, params, Y, mesh: Mesh, axis: str = "data"):
    """Time-sharded SSRN forward: Y (B, T/r, n_mels) -> Z (B, T, n_freq).

    T/r must divide by the mesh axis size. Returns the same values as
    ``SSRN.apply`` (inference path, no dropout) up to float noise; verified
    in tests/test_sp.py.
    """
    from ..models.ssrn import ssrn_specs
    specs = ssrn_specs(cfg)

    def local_fn(p, y_local):
        z = apply_stack_sp(p, specs, y_local, axis_name=axis,
                           ln_eps=cfg.ln_eps)
        return jax.nn.sigmoid(z)

    shard = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(None, axis, None)),
        out_specs=P(None, axis, None))
    return shard(params["stack"], Y)
