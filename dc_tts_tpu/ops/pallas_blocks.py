"""Pallas TPU kernels for the hot conv blocks.

The HC (gated highway conv) block is the dominant op in both networks —
TextEnc/AudioEnc/AudioDec are 20 of 38 layers HC, SSRN 8 of 16
(reference networks.py; the conv at /root/reference/modules.py:187 is the
hot op). XLA executes it as matmul + several elementwise kernels with HBM
round-trips between them; these kernels fuse

    dilated conv (shift+matmul on the MXU)
    -> split -> 2x layer-norm -> sigmoid gate -> residual

into a single VMEM-resident pass per batch row.

Geometry/VMEM design: VMEM is ~16 MB/core. A full SSRN row at T=840,
C=512 with its (3C, 2C) weight block and (T, 2C) intermediates does not
fit, so the kernel keeps the (1, pad+T, C) input row and the weight
resident but iterates an INNER time loop over tiles of ``time_tile``
frames — intermediates (taps, h, the LN temps) shrink to tile size while
the matmuls stay MXU-shaped. ``fits_vmem``/``choose_time_tile`` implement
the static budget; blocks whose weights alone bust the budget (SSRN's
C=1024 HCs: 25 MB of weights) return False and the caller falls back to
the XLA path — fusing there would force HBM-streamed weights for an op
XLA already executes matmul-bound.

Layouts: x (B, T, C) f32; time is pre-padded at trace level ((K-1)*rate
zeros, causal or SAME split — identical to models/layers.py semantics, so
these kernels swap in under the lax oracles in tests/test_pallas.py).
Param vectors are passed as (1, C) rows for TPU tiling.
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


def default_interpret() -> bool:
    """Compiled Pallas needs a TPU backend; anywhere else (the CPU test
    suite, the 8-device virtual meshes) the kernels run interpreted so the
    use_pallas=True code path stays testable off-chip."""
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# static VMEM budgeting

# Budget for one grid step's resident blocks + temps. Calibrated on the
# real chip (scripts/tpu_diag.py): a v5e accepts well beyond the generic
# "~16 MB" figure, but 15 MB keeps the kernels portable to older cores;
# the inner time loop exists precisely so the budget can stay small.
VMEM_BUDGET = 15 * 1024 * 1024
_TILES = (512, 256, 128, 64)


def _hc_vmem(T: int, C: int, size: int, rate: int, tt: int) -> int:
    """Bytes for one grid step of the fused HC kernel at time-tile tt."""
    pad_t = T + (size - 1) * rate
    x_row = pad_t * C * 4 * 2          # double-buffered input row
    out_row = T * C * 4 * 2            # double-buffered output row
    w = size * C * 2 * C * 4           # resident weight block
    h = tt * 2 * C * 4                 # conv accumulator (no taps buffer:
    ln_tmp = 2 * tt * C * 4            # the conv is a sum of per-tap matmuls)
    return x_row + out_row + w + h + ln_tmp


def _conv_vmem(T: int, Cin: int, Cout: int, size: int, rate: int,
               tt: int) -> int:
    pad_t = T + (size - 1) * rate
    return (pad_t * Cin * 4 * 2 + T * Cout * 4 * 2
            + size * Cin * Cout * 4 + 2 * tt * Cout * 4)


def choose_time_tile(T: int, vmem_fn) -> int | None:
    """Largest tile whose estimate fits the budget; None if nothing does."""
    if vmem_fn(T) <= VMEM_BUDGET:      # whole row in one pass
        return T
    for tt in _TILES:
        if tt < T and vmem_fn(tt) <= VMEM_BUDGET:
            return tt
    return None


def hc_fits(T: int, C: int, size: int, rate: int) -> bool:
    return choose_time_tile(
        T, lambda tt: _hc_vmem(T, C, size, rate, tt)) is not None


def conv_fits(T: int, Cin: int, Cout: int, size: int, rate: int) -> bool:
    return choose_time_tile(
        T, lambda tt: _conv_vmem(T, Cin, Cout, size, rate, tt)) is not None


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _ld(x_ref, t0, off: int, tt: int):
    """Load tt rows of x_ref[0] starting at t0 + off.

    Mosaic requires DYNAMIC sublane offsets to be provably 0 mod 8. t0 is
    either a Python int (single-tile kernels: fully static, any offset is
    fine) or a traced multiple of 8 (pl.multiple_of). For the traced case
    an arbitrary static tap offset `off` is handled by loading an ALIGNED
    window 8 rows wider and taking a static value-slice — a sublane shift,
    verified supported on real v5e hardware.
    """
    if isinstance(t0, int):
        return x_ref[0, t0 + off: t0 + off + tt, :]
    rem = off % 8
    if rem == 0:
        return x_ref[0, pl.ds(t0 + off, tt), :]
    wide = x_ref[0, pl.ds(t0 + (off - rem), tt + 8), :]
    return wide[rem: rem + tt, :]


def _tile_loop(n_tiles: int, tt: int, body):
    """Run body(t0) per tile: statically when there is one tile (t0=0,
    arbitrary offsets allowed), else a fori_loop with t0 hinted 0 mod 8
    (every multi-tile tt is a multiple of 8, see _TILES)."""
    if n_tiles == 1:
        body(0)
    else:
        assert tt % 8 == 0

        def step(i, _):
            body(pl.multiple_of(i * tt, 8))
            return 0

        jax.lax.fori_loop(0, n_tiles, step, 0)


def _st(out_ref, t0, tt, val):
    if isinstance(t0, int):
        out_ref[0, t0: t0 + tt, :] = val
    else:
        out_ref[0, pl.ds(t0, tt), :] = val


def _ln_rows(x, gamma, beta, eps):
    """Layer norm over the last axis; gamma/beta are (1, C) rows."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * gamma + beta


# ---------------------------------------------------------------------------
# fused HC


def _hc_kernel(x_ref, w_ref, b_ref, g1_ref, b1_ref, g2_ref, b2_ref,
               out_ref, *, size: int, rate: int, left: int, eps: float,
               tt: int, n_tiles: int):
    """One batch row, inner loop over time tiles of tt frames.

    The dilated conv is a SUM of per-tap matmuls (x shifted by k*rate @
    w[k]) rather than tap-concat + one matmul: Mosaic cannot concatenate
    vectors whose row offsets differ (t0 + k*rate lands on different
    sublane phases), and the sum form needs no (tt, K*C) taps buffer.
    """
    c = out_ref.shape[-1]
    b = b_ref[0]
    g1, b1, g2, b2 = g1_ref[:], b1_ref[:], g2_ref[:], b2_ref[:]

    def tile(t0):
        h = b + jnp.dot(_ld(x_ref, t0, 0, tt), w_ref[0],
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        for k in range(1, size):
            h = h + jnp.dot(_ld(x_ref, t0, k * rate, tt), w_ref[k],
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
        # residual is the UN-padded input: starts `left` into the pad
        resid = _ld(x_ref, t0, left, tt)
        h1 = _ln_rows(h[:, :c], g1, b1, eps)
        h2 = _ln_rows(h[:, c:], g2, b2, eps)
        gate = jax.nn.sigmoid(h1)
        _st(out_ref, t0, tt, gate * h2 + (1.0 - gate) * resid)

    _tile_loop(n_tiles, tt, tile)


def _row_spec(c):
    return pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("size", "rate", "causal",
                                             "eps", "interpret"))
def fused_hc(x, w, b, g1, b1, g2, b2, *, size: int, rate: int,
             causal: bool, eps: float = 1e-5, interpret: bool = False):
    """Fused highway-conv block. x (B,T,C), w (K, C, 2C) -> (B,T,C).

    Numerically equivalent to blocks.apply_block(HC(...)) in eval mode.
    Raises ValueError when no time tile fits the VMEM budget (gate with
    ``hc_fits`` first).
    """
    B, T, C = x.shape
    K = size
    tt = choose_time_tile(T, lambda t: _hc_vmem(T, C, size, rate, t))
    if tt is None:
        raise ValueError(f"fused_hc does not fit VMEM at T={T}, C={C}")
    Tp = _ceil_to(T, tt)
    n_tiles = Tp // tt
    total = (K - 1) * rate
    left = (total if causal else total // 2) if total else 0
    # pad: halo for the taps plus the tile round-up (extra rows are
    # computed then sliced off; LN of a zero row is eps-safe)
    # +8 tail rows so the aligned wide loads in _ld never run off the end
    xp = jnp.pad(x, ((0, 0), (left, total - left + (Tp - T) + 8), (0, 0)))
    rows = [p.reshape(1, -1) for p in (b, g1, b1, g2, b2)]

    kern = functools.partial(_hc_kernel, size=size, rate=rate,
                             left=left, eps=eps, tt=tt, n_tiles=n_tiles)
    out = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, xp.shape[1], C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, C, 2 * C), lambda i: (0, 0, 0),
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


# ---------------------------------------------------------------------------
# fused conv + LN + activation


def _conv_kernel(x_ref, w_ref, b_ref, g_ref, be_ref, out_ref, *,
                 size: int, rate: int, eps: float, act,
                 tt: int, n_tiles: int):
    b = b_ref[0]
    g, be = g_ref[:], be_ref[:]

    def tile(t0):
        h = b + jnp.dot(_ld(x_ref, t0, 0, tt), w_ref[0],
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        for k in range(1, size):
            h = h + jnp.dot(_ld(x_ref, t0, k * rate, tt), w_ref[k],
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
        h = _ln_rows(h, g, be, eps)
        if act == "relu":
            h = jnp.maximum(h, 0.0)
        elif act == "sigmoid":
            h = jax.nn.sigmoid(h)
        _st(out_ref, t0, tt, h)

    _tile_loop(n_tiles, tt, tile)


@functools.partial(jax.jit, static_argnames=("size", "rate", "causal",
                                             "eps", "act", "interpret"))
def fused_conv_ln_act(x, w, b, gamma, beta, *, size: int, rate: int,
                      causal: bool, act=None, eps: float = 1e-5,
                      interpret: bool = False):
    """Fused conv1d + layer-norm + activation. x (B,T,Cin), w (K,Cin,Cout)."""
    B, T, Cin = x.shape
    K, _, Cout = w.shape
    tt = choose_time_tile(
        T, lambda t: _conv_vmem(T, Cin, Cout, size, rate, t))
    if tt is None:
        raise ValueError(
            f"fused_conv does not fit VMEM at T={T}, {Cin}->{Cout}")
    Tp = _ceil_to(T, tt)
    n_tiles = Tp // tt
    total = (K - 1) * rate
    left = (total if causal else total // 2) if total else 0
    # +8 tail rows so the aligned wide loads in _ld never run off the end
    xp = jnp.pad(x, ((0, 0), (left, total - left + (Tp - T) + 8), (0, 0)))
    kern = functools.partial(_conv_kernel, size=size, rate=rate,
                             eps=eps, act=act, tt=tt, n_tiles=n_tiles)
    rows = [p.reshape(1, -1) for p in (b, gamma, beta)]
    out = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, xp.shape[1], Cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, Cin, Cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            _row_spec(Cout), _row_spec(Cout), _row_spec(Cout),
        ],
        out_specs=pl.BlockSpec((1, Tp, Cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Tp, Cout), jnp.float32),
        interpret=interpret,
    )(xp, w, *rows)
    return out[:, :T, :] if Tp != T else out
