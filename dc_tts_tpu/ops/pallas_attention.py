"""Pallas kernel: fused monotonic-attention decode step.

One autoregressive step's attention — scores, monotonic window mask,
softmax, argmax cursor update, and context matvec — in a single
VMEM-resident kernel over batch blocks. Replaces ~6 separate XLA ops per
step in the decode loop (210 sequential steps make per-step latency
matter).

Semantics identical to Text2Mel.decode_step's inline attention
(reference networks.py:140-151 with the [p, p+win) window from
networks.py:141-147): scores = q·K^T/sqrt(d); keys outside the window get
-(2^32-1); softmax over N; cursor = argmax; ctx = A·V.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .pallas_blocks import pallas_supported  # noqa: F401  (re-export)

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pl = None

NEG_INF = -(2.0 ** 32 - 1.0)


def _attn_kernel(q_ref, k_ref, v_ref, p_ref, ctx_ref, a_ref, newp_ref,
                 *, win: int, scale: float):
    """Mosaic cannot lower BATCHED dot_general (3-D operands with batch
    dims), and this op is tiny (bb*N*d MACs) — so scores and context are
    VPU multiply-reduces, and the cursor argmax is the max+iota+min trick
    (ties -> lowest index, identical to jnp.argmax semantics)."""
    q = q_ref[:]                   # (BB, d)
    K = k_ref[:]                   # (BB, N, d)
    V = v_ref[:]
    p = p_ref[:]                   # (BB, 1) int32
    scores = jnp.sum(K * q[:, None, :], axis=2) * scale  # (BB, N)
    n = scores.shape[1]
    pos = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    disallowed = (pos < p) | (pos >= p + win)
    scores = jnp.where(disallowed, NEG_INF, scores)
    m = jnp.max(scores, axis=1, keepdims=True)
    e = jnp.exp(scores - m)
    a = e / jnp.sum(e, axis=1, keepdims=True)            # (BB, N)
    is_max = a >= jnp.max(a, axis=1, keepdims=True)
    newp = jnp.min(jnp.where(is_max, pos, n), axis=1).astype(jnp.int32)
    ctx = jnp.sum(a[:, :, None] * V, axis=1)             # (BB, d)
    ctx_ref[:] = ctx
    a_ref[:] = a
    newp_ref[:] = newp[:, None]


@functools.partial(jax.jit, static_argnames=("win", "block_b", "interpret"))
def monotonic_attention_step(q, K, V, prev, *, win: int = 3,
                             block_b: int = 8, interpret: bool = False):
    """q (B,d), K/V (B,N,d), prev (B,) i32 -> (ctx (B,d), A (B,N), new_p (B,)).

    Matches the inline attention in Text2Mel.decode_step bit-for-bit up to
    softmax reassociation.
    """
    B, N, d = K.shape
    bb = min(block_b, B)
    if B % bb:
        bb = 1
    scale = 1.0 / float(d) ** 0.5
    kern = functools.partial(_attn_kernel, win=win, scale=scale)
    grid = (B // bb,)
    ctx, A, newp = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, N, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, N, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bb, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, d), jnp.float32),
            jax.ShapeDtypeStruct((B, N), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ),
        interpret=interpret,
    )(q, K, V, prev[:, None].astype(jnp.int32))
    return ctx, A, newp[:, 0]
