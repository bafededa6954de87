"""Shared Pallas infrastructure: VMEM budgeting + Mosaic-safe tile helpers.

Used by the HC training kernel (``pallas_hc_vjp``); the GL and decode
kernels (``pallas_gl``, ``pallas_decode``) carry their own geometry. The
eval-mode per-block conv/HC kernels and the single-step attention kernel
that originally lived alongside these helpers were measured XLA-losers at
every production geometry and were retired in round 4 (BASELINE.md keeps
their final numbers); the whole-loop decode kernel supersedes them on the
synthesis path.
"""
from __future__ import annotations

import jax

try:  # pallas needs a TPU-ish backend; import tolerantly
    from jax.experimental import pallas as pl
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
    """Bytes for one grid step of the fused HC forward at time-tile tt."""
    pad_t = T + (size - 1) * rate
    x_row = pad_t * C * 4 * 2          # double-buffered input row
    out_row = T * C * 4 * 2            # double-buffered output row
    w = size * C * 2 * C * 4           # resident weight block
    h = tt * 2 * C * 4                 # conv accumulator (no taps buffer:
    ln_tmp = 2 * tt * C * 4            # the conv is a sum of per-tap matmuls)
    return x_row + out_row + w + h + ln_tmp


def choose_time_tile(T: int, vmem_fn) -> int | None:
    """Largest tile whose estimate fits the budget; None if nothing does."""
    if vmem_fn(T) <= VMEM_BUDGET:      # whole row in one pass
        return T
    for tt in _TILES:
        if tt < T and vmem_fn(tt) <= VMEM_BUDGET:
            return tt
    return None


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
