"""Fused HC block with a custom VJP — the training-path Pallas kernel.

Forward: the fused conv+2xLN+gate kernel (same math as
the retired eval-mode fused_hc). Backward: a second Pallas kernel that
recomputes the cheap intermediates (one matmul) and produces every
gradient — dx, dW, db, dgamma/dbeta for both layer norms — in one
VMEM-resident pass per batch row, accumulating weight gradients across the
(sequential) TPU grid. Both kernels run an INNER time-tile loop so the
(T, 2C) intermediates never exceed the VMEM budget at full SSRN/Text2Mel
geometry (see pallas_common.py for the budget rationale); the backward
holds BOTH the weight block and its gradient accumulator resident, so its
budget gate (``hc_train_fits``) is stricter than the forward's.

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
    dtaps = dh @ W^T  -> un-shifted/accumulated into dx inside the kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .pallas_common import (_ceil_to, _hc_vmem, _ld, _st, _tile_loop,
                             choose_time_tile)

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pl = None


def _pads(size: int, rate: int, causal: bool):
    total = (size - 1) * rate
    left = total if causal else total // 2
    return left, total - left


def _make_dot(bf16: bool):
    """Matmul helper: f32@HIGHEST (strict-parity training) or bf16
    operands / f32 accumulation (the compute_dtype="bfloat16" mode —
    identical operand treatment to the XLA bf16 conv path)."""
    if bf16:
        return lambda a, b: jnp.dot(a.astype(jnp.bfloat16),
                                    b.astype(jnp.bfloat16),
                                    preferred_element_type=jnp.float32)
    return lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)


def _make_dotg(bf16: bool):
    if bf16:
        return lambda a, b, dims: jax.lax.dot_general(
            a.astype(jnp.bfloat16), b.astype(jnp.bfloat16), dims,
            preferred_element_type=jnp.float32)
    return lambda a, b, dims: jax.lax.dot_general(
        a, b, dims, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _bwd_vmem(T: int, C: int, size: int, tt: int, rate: int) -> int:
    pad_t = T + (size - 1) * rate
    x_row = pad_t * C * 4 * 2
    dy_row = T * C * 4 * 2
    dxp_row = pad_t * C * 4 * 2
    w = size * C * 2 * C * 4
    dw = size * C * 2 * C * 4
    tile = (3 * tt * 2 * C * 4         # h, dh, per-tap matmul temps
            + 4 * tt * C * 4)          # LN temps / gate pieces
    return x_row + dy_row + dxp_row + w + dw + tile


def hc_train_fits(T: int, C: int, size: int, rate: int) -> bool:
    """Can the trainable fused HC (fwd + bwd kernels) run at this geometry?

    The backward's dx scatter-adds land at tap offsets (k*rate, left) that
    are not multiples of 8; Mosaic only accepts such stores when the whole
    index is STATIC, i.e. when the row fits in ONE time tile. So the
    compiled trainable path requires single-tile bwd — in practice C<=256
    at full Text2Mel geometry; wider blocks fall back to XLA (which is
    matmul-bound there anyway)."""
    fwd = choose_time_tile(T, lambda t: _hc_vmem(T, C, size, rate, t))
    bwd = choose_time_tile(T, lambda t: _bwd_vmem(T, C, size, t, rate))
    return fwd is not None and bwd == T


def _ln_stats(v, eps):
    mu = jnp.mean(v, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(v - mu), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    return (v - mu) * inv, inv


def _fwd_kernel(x_ref, w_ref, b_ref, g1_ref, b1_ref, g2_ref, b2_ref,
                out_ref, *, size, rate, left, eps, tt, n_tiles, bf16=False):
    # conv = sum of per-tap matmuls (Mosaic cannot concat
    # slices at different sublane phases)
    c = out_ref.shape[-1]
    b = b_ref[0]
    g1, b1, g2, b2 = g1_ref[:], b1_ref[:], g2_ref[:], b2_ref[:]
    dot = _make_dot(bf16)

    def tile(t0):
        h = b + dot(_ld(x_ref, t0, 0, tt), w_ref[0])
        for k in range(1, size):
            h = h + dot(_ld(x_ref, t0, k * rate, tt), w_ref[k])
        resid = _ld(x_ref, t0, left, tt)
        n1, _ = _ln_stats(h[:, :c], eps)
        n2, _ = _ln_stats(h[:, c:], eps)
        g = jax.nn.sigmoid(n1 * g1 + b1)
        h2 = n2 * g2 + b2
        _st(out_ref, t0, tt, g * h2 + (1.0 - g) * resid)

    _tile_loop(n_tiles, tt, tile)


def _bwd_kernel(x_ref, w_ref, b_ref, g1_ref, b1_ref, g2_ref, b2_ref, dy_ref,
                dxp_ref, dw_ref, db_ref, dg1_ref, db1_ref, dg2_ref, db2_ref,
                *, size, rate, left, eps, tt, n_tiles, bf16=False):
    dot = _make_dot(bf16)
    dotg = _make_dotg(bf16)
    grid_i = pl.program_id(0)
    c = dy_ref.shape[-1]
    b = b_ref[0]
    g1v, b1v, g2v, b2v = g1_ref[:], b1_ref[:], g2_ref[:], b2_ref[:]

    # zero the per-row dx accumulator; zero the param accumulators once
    dxp_ref[0] = jnp.zeros_like(dxp_ref[0])

    @pl.when(grid_i == 0)
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)
        dg1_ref[:] = jnp.zeros_like(dg1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dg2_ref[:] = jnp.zeros_like(dg2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    def tile(t0):
        resid = _ld(x_ref, t0, left, tt)
        dy = _ld(dy_ref, t0, 0, tt)

        h = b + dot(_ld(x_ref, t0, 0, tt), w_ref[0])
        for k in range(1, size):
            h = h + dot(_ld(x_ref, t0, k * rate, tt), w_ref[k])
        n1, inv1 = _ln_stats(h[:, :c], eps)
        n2, inv2 = _ln_stats(h[:, c:], eps)
        g = jax.nn.sigmoid(n1 * g1v + b1v)
        h2 = n2 * g2v + b2v

        dg = dy * (h2 - resid)
        dh2 = dy * g
        dz1 = dg * g * (1.0 - g)

        dg1_ref[:] += jnp.sum(dz1 * n1, axis=0, keepdims=True)
        db1_ref[:] += jnp.sum(dz1, axis=0, keepdims=True)
        dn1 = dz1 * g1v
        da = inv1 * (dn1 - jnp.mean(dn1, axis=-1, keepdims=True)
                     - n1 * jnp.mean(dn1 * n1, axis=-1, keepdims=True))

        dg2_ref[:] += jnp.sum(dh2 * n2, axis=0, keepdims=True)
        db2_ref[:] += jnp.sum(dh2, axis=0, keepdims=True)
        dn2 = dh2 * g2v
        db2g = inv2 * (dn2 - jnp.mean(dn2, axis=-1, keepdims=True)
                       - n2 * jnp.mean(dn2 * n2, axis=-1, keepdims=True))

        dh = jnp.concatenate([da, db2g], axis=-1)          # (tt, 2C)
        db_ref[:] += jnp.sum(dh, axis=0, keepdims=True)
        res_part = dy * (1.0 - g)
        # dx scatter-adds land at static offsets: the compiled path is
        # gated to n_tiles == 1 (t0 = 0, plain static slices — verified
        # supported on hardware even when left/k*rate are not 0 mod 8);
        # multi-tile bwd only ever runs interpreted (CPU tests).
        dxp_ref[0, _off(t0, left), :] += res_part
        for k in range(size):
            xk = _ld(x_ref, t0, k * rate, tt)
            # dW_k += x_k^T @ dh (contract over time, no transpose buffer)
            dw_ref[k] += dotg(xk, dh, (((0,), (0,)), ((), ())))
            # dx_k = dh @ W_k^T (contract over the output axis)
            dxp_ref[0, _off(t0, k * rate), :] += dotg(
                dh, w_ref[k], (((1,), (1,)), ((), ())))

    def _off(t0, off):
        return (slice(t0 + off, t0 + off + tt) if isinstance(t0, int)
                else pl.ds(t0 + off, tt))

    _tile_loop(n_tiles, tt, tile)


def _row_spec(c):
    return pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)


def _call_fwd(x, w, rows, *, size, rate, left, right, eps, interpret,
              bf16=False):
    B, T, C = x.shape
    tt = choose_time_tile(T, lambda t: _hc_vmem(T, C, size, rate, t))
    if tt is None:
        raise ValueError(f"hc_block_trainable fwd over VMEM at T={T} C={C}")
    Tp = _ceil_to(T, tt)
    xp = jnp.pad(x, ((0, 0), (left, right + (Tp - T) + 8), (0, 0)))
    kern = functools.partial(_fwd_kernel, size=size, rate=rate, left=left,
                             eps=eps, tt=tt, n_tiles=Tp // tt, bf16=bf16)
    out = pl.pallas_call(
        kern, grid=(B,),
        in_specs=[
            pl.BlockSpec((1, xp.shape[1], C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((size, C, 2 * C), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            _row_spec(2 * C), _row_spec(C), _row_spec(C),
            _row_spec(C), _row_spec(C),
        ],
        out_specs=pl.BlockSpec((1, Tp, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Tp, C), jnp.float32),
        interpret=interpret,
    )(xp, w, *rows)
    return out[:, :T, :] if Tp != T else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12))
def hc_block_trainable(x, w, b, g1, b1, g2, b2, size, rate, causal, eps,
                       interpret, bf16=False):
    """Differentiable fused HC block. x (B,T,C), w (K,C,2C) -> (B,T,C).
    bf16=True streams matmul operands through the MXU at bf16 rate with
    f32 accumulation (for compute_dtype="bfloat16" training)."""
    left, right = _pads(size, rate, causal)
    rows = [p.reshape(1, -1) for p in (b, g1, b1, g2, b2)]
    return _call_fwd(x, w, rows, size=size, rate=rate, left=left,
                     right=right, eps=eps, interpret=interpret, bf16=bf16)


def _fwd_rule(x, w, b, g1, b1, g2, b2, size, rate, causal, eps, interpret,
              bf16=False):
    y = hc_block_trainable(x, w, b, g1, b1, g2, b2, size, rate, causal, eps,
                           interpret, bf16)
    return y, (x, w, b, g1, b1, g2, b2)


def _bwd_rule(size, rate, causal, eps, interpret, bf16, res, dy):
    x, w, b, g1, b1, g2, b2 = res
    B, T, C = x.shape
    K = size
    left, right = _pads(size, rate, causal)
    tt = choose_time_tile(T, lambda t: _bwd_vmem(T, C, size, t, rate))
    if tt is None:
        raise ValueError(f"hc_block_trainable bwd over VMEM at T={T} C={C}")
    Tp = _ceil_to(T, tt)
    xp = jnp.pad(x, ((0, 0), (left, right + (Tp - T) + 8), (0, 0)))
    dyp = jnp.pad(dy, ((0, 0), (0, Tp - T), (0, 0))) if Tp != T else dy
    rows = [p.reshape(1, -1) for p in (b, g1, b1, g2, b2)]
    kern = functools.partial(_bwd_kernel, size=size, rate=rate, left=left,
                             eps=eps, tt=tt, n_tiles=Tp // tt, bf16=bf16)
    pad_t = xp.shape[1]
    dxp, dw, db, dg1, db1, dg2, db2 = pl.pallas_call(
        kern, grid=(B,),
        in_specs=[
            pl.BlockSpec((1, pad_t, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, C, 2 * C), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            _row_spec(2 * C), _row_spec(C), _row_spec(C),
            _row_spec(C), _row_spec(C),
            pl.BlockSpec((1, Tp, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, pad_t, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, C, 2 * C), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            _row_spec(2 * C), _row_spec(C), _row_spec(C),
            _row_spec(C), _row_spec(C),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, pad_t, C), jnp.float32),
            jax.ShapeDtypeStruct((K, C, 2 * C), jnp.float32),
            jax.ShapeDtypeStruct((1, 2 * C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ),
        interpret=interpret,
    )(xp, w, *rows, dyp)
    # un-pad dx (tile round-up rows carry dy=0 so contribute nothing)
    dx = dxp[:, left: left + T, :]
    return (dx, dw, db[0], dg1[0], db1[0], dg2[0], db2[0])


hc_block_trainable.defvjp(_fwd_rule, _bwd_rule)
