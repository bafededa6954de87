"""Fused HC block with a custom VJP — the training-path Pallas kernel.

Forward: the fused conv+2xLN+gate kernel (same math as
``pallas_blocks.fused_hc``). Backward: a second Pallas kernel that
recomputes the cheap intermediates (one matmul) and produces every
gradient — dx, dW, db, dgamma/dbeta for both layer norms — in one
VMEM-resident pass per batch row, accumulating weight gradients across the
(sequential) TPU grid.

Derivation (per batch row; T time steps, C channels, K taps):
    taps = concat_k shift_k(x)            (T, KC)
    h    = taps @ W + b                   (T, 2C);  a = h[:,:C], b2 = h[:,C:]
    n1   = (a - mu1) * inv1;  z1 = n1*g1 + be1;  g = sigmoid(z1)
    n2   = (b2 - mu2) * inv2; h2 = n2*g2 + be2
    y    = g*h2 + (1-g)*x
Backward given dy:
    dg   = dy*(h2 - x);        dh2 = dy*g;        dx += dy*(1-g)
    dz1  = dg * g * (1-g);     dga1 = sum dz1*n1; dbe1 = sum dz1
    da   = inv1*(dn1 - mean(dn1) - n1*mean(dn1*n1)),  dn1 = dz1*g1
    dn2  = dh2*g2;  dga2 = sum dh2*n2; dbe2 = sum dh2
    db2  = inv2*(dn2 - mean(dn2) - n2*mean(dn2*n2))
    dh   = [da, db2];  dbias = sum_t dh;  dW = taps^T @ dh
    dtaps = dh @ W^T  -> un-shift/accumulate into dx (done at trace level).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pl = None


def _pads(size: int, rate: int, causal: bool):
    total = (size - 1) * rate
    left = total if causal else total // 2
    return left, total - left


def _taps(xp, size: int, rate: int, t_out: int):
    if size == 1:
        return xp
    return jnp.concatenate(
        [xp[k * rate: k * rate + t_out, :] for k in range(size)], axis=-1)


def _ln_stats(v, eps):
    mu = jnp.mean(v, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(v - mu), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    return (v - mu) * inv, inv


def _fwd_kernel(x_ref, w_ref, b_ref, g1_ref, b1_ref, g2_ref, b2_ref,
                out_ref, *, size, rate, t_out, left, eps):
    c = out_ref.shape[-1]
    x = x_ref[0]
    taps = _taps(x, size, rate, t_out)
    resid = x[left: left + t_out, :] if size > 1 else x
    h = jnp.dot(taps, w_ref[:], preferred_element_type=jnp.float32) + b_ref[0]
    n1, _ = _ln_stats(h[:, :c], eps)
    n2, _ = _ln_stats(h[:, c:], eps)
    g = jax.nn.sigmoid(n1 * g1_ref[:] + b1_ref[:])
    h2 = n2 * g2_ref[:] + b2_ref[:]
    out_ref[0] = g * h2 + (1.0 - g) * resid


def _bwd_kernel(x_ref, w_ref, b_ref, g1_ref, b1_ref, g2_ref, b2_ref, dy_ref,
                dxp_ref, dw_ref, db_ref, dg1_ref, db1_ref, dg2_ref, db2_ref,
                *, size, rate, t_out, left, eps):
    i = pl.program_id(0)
    c = dy_ref.shape[-1]
    x = x_ref[0]
    dy = dy_ref[0]
    taps = _taps(x, size, rate, t_out)
    resid = x[left: left + t_out, :] if size > 1 else x

    h = jnp.dot(taps, w_ref[:], preferred_element_type=jnp.float32) + b_ref[0]
    n1, inv1 = _ln_stats(h[:, :c], eps)
    n2, inv2 = _ln_stats(h[:, c:], eps)
    g = jax.nn.sigmoid(n1 * g1_ref[:] + b1_ref[:])
    h2 = n2 * g2_ref[:] + b2_ref[:]

    dg = dy * (h2 - resid)
    dh2 = dy * g
    dz1 = dg * g * (1.0 - g)

    dga1 = jnp.sum(dz1 * n1, axis=0, keepdims=True)
    dbe1 = jnp.sum(dz1, axis=0, keepdims=True)
    dn1 = dz1 * g1_ref[:]
    da = inv1 * (dn1 - jnp.mean(dn1, axis=-1, keepdims=True)
                 - n1 * jnp.mean(dn1 * n1, axis=-1, keepdims=True))

    dga2 = jnp.sum(dh2 * n2, axis=0, keepdims=True)
    dbe2 = jnp.sum(dh2, axis=0, keepdims=True)
    dn2 = dh2 * g2_ref[:]
    db2 = inv2 * (dn2 - jnp.mean(dn2, axis=-1, keepdims=True)
                  - n2 * jnp.mean(dn2 * n2, axis=-1, keepdims=True))

    dh = jnp.concatenate([da, db2], axis=-1)          # (T, 2C)
    dw = jnp.dot(taps.T, dh, preferred_element_type=jnp.float32)
    dbias = jnp.sum(dh, axis=0, keepdims=True)
    dtaps = jnp.dot(dh, w_ref[:].T, preferred_element_type=jnp.float32)

    # dx in padded coordinates: residual part + un-shifted tap pieces
    dxp = jnp.zeros_like(x)
    if size == 1:
        dxp = dtaps + dy * (1.0 - g)
    else:
        pad_t = x.shape[0]
        res_part = dy * (1.0 - g)
        for k in range(size):
            piece = dtaps[:, k * c: (k + 1) * c]
            grow = jnp.zeros((pad_t, c), piece.dtype)
            grow = jax.lax.dynamic_update_slice(grow, piece, (k * rate, 0))
            dxp = dxp + grow
        grow = jnp.zeros((pad_t, c), res_part.dtype)
        grow = jax.lax.dynamic_update_slice(grow, res_part, (left, 0))
        dxp = dxp + grow
    dxp_ref[0] = dxp

    # accumulate param grads across the sequential grid
    @pl.when(i == 0)
    def _init():
        dw_ref[:] = dw
        db_ref[:] = dbias
        dg1_ref[:] = dga1
        db1_ref[:] = dbe1
        dg2_ref[:] = dga2
        db2_ref[:] = dbe2

    @pl.when(i != 0)
    def _acc():
        dw_ref[:] += dw
        db_ref[:] += dbias
        dg1_ref[:] += dga1
        db1_ref[:] += dbe1
        dg2_ref[:] += dga2
        db2_ref[:] += dbe2


def _row_spec(c):
    return pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)


def _call_fwd(x, w2, rows, *, size, rate, left, right, eps, interpret):
    B, T, C = x.shape
    xp = jnp.pad(x, ((0, 0), (left, right), (0, 0))) if left + right else x
    kern = functools.partial(_fwd_kernel, size=size, rate=rate, t_out=T,
                             left=left, eps=eps)
    return pl.pallas_call(
        kern, grid=(B,),
        in_specs=[
            pl.BlockSpec((1, xp.shape[1], C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((size * C, 2 * C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            _row_spec(2 * C), _row_spec(C), _row_spec(C),
            _row_spec(C), _row_spec(C),
        ],
        out_specs=pl.BlockSpec((1, T, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, C), jnp.float32),
        interpret=interpret,
    )(xp, w2, *rows)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def hc_block_trainable(x, w, b, g1, b1, g2, b2, size, rate, causal, eps,
                       interpret):
    """Differentiable fused HC block. x (B,T,C), w (K,C,2C) -> (B,T,C)."""
    K, C, _ = w.shape
    left, right = _pads(size, rate, causal)
    rows = [p.reshape(1, -1) for p in (b, g1, b1, g2, b2)]
    return _call_fwd(x, w.reshape(K * C, 2 * C), rows, size=size, rate=rate,
                     left=left, right=right, eps=eps, interpret=interpret)


def _fwd_rule(x, w, b, g1, b1, g2, b2, size, rate, causal, eps, interpret):
    y = hc_block_trainable(x, w, b, g1, b1, g2, b2, size, rate, causal, eps,
                           interpret)
    return y, (x, w, b, g1, b1, g2, b2)


def _bwd_rule(size, rate, causal, eps, interpret, res, dy):
    x, w, b, g1, b1, g2, b2 = res
    B, T, C = x.shape
    K = size
    left, right = _pads(size, rate, causal)
    xp = jnp.pad(x, ((0, 0), (left, right), (0, 0))) if left + right else x
    w2 = w.reshape(K * C, 2 * C)
    rows = [p.reshape(1, -1) for p in (b, g1, b1, g2, b2)]
    kern = functools.partial(_bwd_kernel, size=size, rate=rate, t_out=T,
                             left=left, eps=eps)
    pad_t = xp.shape[1]
    dxp, dw2, db, dg1, db1, dg2, db2 = pl.pallas_call(
        kern, grid=(B,),
        in_specs=[
            pl.BlockSpec((1, pad_t, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K * C, 2 * C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            _row_spec(2 * C), _row_spec(C), _row_spec(C),
            _row_spec(C), _row_spec(C),
            pl.BlockSpec((1, T, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, pad_t, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K * C, 2 * C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            _row_spec(2 * C), _row_spec(C), _row_spec(C),
            _row_spec(C), _row_spec(C),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, pad_t, C), jnp.float32),
            jax.ShapeDtypeStruct((K * C, 2 * C), jnp.float32),
            jax.ShapeDtypeStruct((1, 2 * C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ),
        interpret=interpret,
    )(xp, w2, *rows, dy)
    # un-pad dx
    dx = dxp[:, left: left + T, :] if left + right else dxp
    return (dx, dw2.reshape(K, C, 2 * C), db[0], dg1[0], db1[0],
            dg2[0], db2[0])


hc_block_trainable.defvjp(_fwd_rule, _bwd_rule)
