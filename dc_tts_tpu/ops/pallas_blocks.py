"""Pallas TPU kernels for the hot conv blocks.

The HC (gated highway conv) block is the dominant op in both networks —
TextEnc/AudioEnc/AudioDec are 20 of 38 layers HC, SSRN 8 of 16
(reference networks.py). XLA executes it as matmul + several elementwise
kernels with HBM round-trips between them; these kernels fuse

    dilated conv (shift+matmul on the MXU)
    -> split -> 2x layer-norm -> sigmoid gate -> residual

into a single VMEM-resident pass per batch row.

Layouts: x (B, T, C) f32; the kernel's time axis is pre-padded at trace
level ((K-1)*rate zeros, causal or SAME split — identical to
models/layers.py semantics, so these kernels swap in under the lax oracles
in tests/test_pallas.py). Param vectors are passed as (1, C) rows for TPU
tiling.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # pallas needs a TPU-ish backend; import tolerantly
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS = True
except Exception:  # pragma: no cover
    _PALLAS = False


def pallas_supported() -> bool:
    return _PALLAS


def _ln_rows(x, gamma, beta, eps):
    """Layer norm over the last axis; gamma/beta are (1, C) rows."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * gamma + beta


def _hc_kernel(x_ref, w_ref, b_ref, g1_ref, b1_ref, g2_ref, b2_ref,
               out_ref, *, size: int, rate: int, t_out: int, left: int,
               eps: float):
    """One batch row: x_ref (1, pad+T, C) -> out_ref (1, T, C)."""
    c = out_ref.shape[-1]
    x = x_ref[0]
    if size == 1:
        taps = x
        resid = x
    else:
        taps = jnp.concatenate(
            [x[k * rate: k * rate + t_out, :] for k in range(size)], axis=-1)
        # residual is the UN-padded input: starts `left` into the pad
        resid = x[left: left + t_out, :]
    h = jnp.dot(taps, w_ref[:], preferred_element_type=jnp.float32)
    h = h + b_ref[0]
    h1 = _ln_rows(h[:, :c], g1_ref[:], b1_ref[:], eps)
    h2 = _ln_rows(h[:, c:], g2_ref[:], b2_ref[:], eps)
    gate = jax.nn.sigmoid(h1)
    out_ref[0] = gate * h2 + (1.0 - gate) * resid


def _row_spec(c):
    return pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("size", "rate", "causal",
                                             "eps", "interpret"))
def fused_hc(x, w, b, g1, b1, g2, b2, *, size: int, rate: int,
             causal: bool, eps: float = 1e-5, interpret: bool = False):
    """Fused highway-conv block. x (B,T,C), w (K, C, 2C) -> (B,T,C).

    Numerically equivalent to blocks.apply_block(HC(...)) in eval mode.
    """
    B, T, C = x.shape
    K = size
    total = (K - 1) * rate
    left = (total if causal else total // 2) if total else 0
    xp = jnp.pad(x, ((0, 0), (left, total - left), (0, 0))) if total else x
    w2 = w.reshape(K * C, 2 * C)
    rows = [p.reshape(1, -1) for p in (b, g1, b1, g2, b2)]

    kern = functools.partial(_hc_kernel, size=size, rate=rate, t_out=T,
                             left=left, eps=eps)
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, xp.shape[1], C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K * C, 2 * C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            _row_spec(2 * C), _row_spec(C), _row_spec(C),
            _row_spec(C), _row_spec(C),
        ],
        out_specs=pl.BlockSpec((1, T, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, C), jnp.float32),
        interpret=interpret,
    )(xp, w2, *rows)


def _conv_kernel(x_ref, w_ref, b_ref, g_ref, be_ref, out_ref, *,
                 size: int, rate: int, t_out: int, eps: float, act):
    x = x_ref[0]
    if size == 1:
        taps = x
    else:
        taps = jnp.concatenate(
            [x[k * rate: k * rate + t_out, :] for k in range(size)], axis=-1)
    h = jnp.dot(taps, w_ref[:], preferred_element_type=jnp.float32)
    h = _ln_rows(h + b_ref[0], g_ref[:], be_ref[:], eps)
    if act == "relu":
        h = jnp.maximum(h, 0.0)
    elif act == "sigmoid":
        h = jax.nn.sigmoid(h)
    out_ref[0] = h


@functools.partial(jax.jit, static_argnames=("size", "rate", "causal",
                                             "eps", "act", "interpret"))
def fused_conv_ln_act(x, w, b, gamma, beta, *, size: int, rate: int,
                      causal: bool, act=None, eps: float = 1e-5,
                      interpret: bool = False):
    """Fused conv1d + layer-norm + activation. x (B,T,Cin), w (K,Cin,Cout)."""
    B, T, Cin = x.shape
    K, _, Cout = w.shape
    total = (K - 1) * rate
    if total:
        left = total if causal else total // 2
        xp = jnp.pad(x, ((0, 0), (left, total - left), (0, 0)))
    else:
        xp = x
    kern = functools.partial(_conv_kernel, size=size, rate=rate, t_out=T,
                             eps=eps, act=act)
    rows = [p.reshape(1, -1) for p in (b, gamma, beta)]
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, xp.shape[1], Cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K * Cin, Cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            _row_spec(Cout), _row_spec(Cout), _row_spec(Cout),
        ],
        out_specs=pl.BlockSpec((1, T, Cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, Cout), jnp.float32),
        interpret=interpret,
    )(xp, w.reshape(K * Cin, Cout), *rows)
