"""Fused Pallas kernels for the Griffin-Lim phase-reconstruction round.

GL dominates synthesis (91.8% of device time in round 2, BASELINE.md) and
its measured in-loop round cost is ~12.7 ms at bench geometry (B=40, F=840,
n_fft=2048) against a ~3 ms MXU floor (scripts/gl_diag.py) — the gap is
intermediate materialization: XLA runs istft->stft as ~10 separate
kernels with (B, F, 2048)-sized HBM round-trips between them (windowing,
8-stream overlap-add, trim/pad, re-framing, phase normalize).

These kernels fuse one GL round (reference semantics:
``/root/reference/utils.py:96-107``) into TWO pallas_calls that tile over
(batch, time) and keep every intermediate in VMEM:

  kernel 1 (irdft+OLA):  X -> inverse-rDFT matmul (MXU, bf16 operands,
      f32 accumulation) -> x window -> overlap-add -> x 1/sum(win^2)
      -> y segments.  Time tiles read a LEFT halo of P = ceil(n_fft/hop)
      frame rows (a frame's tail reaches P-1 segments right of it).
  kernel 2 (frame+rdft+phase):  y -> re-frame (staggered lane concat,
      no gather) -> x window -> forward-rDFT matmuls (MXU) ->
      phase-normalize -> re-impose |X| = mag.  Tiles read a RIGHT halo
      of segments.

The split keeps each kernel's resident DFT matrices at ~8.4 MB bf16
(both pairs together would bust the ~15 MB VMEM budget), and the
intermediate between them is the (B, L) waveform — the smallest tensor
in the whole round (37 MB vs 275 MB for frames). The istft trim and the
stft reflect-pad between the kernels stay on XLA: they cancel in the
interior and only touch n_fft samples per edge.

Numerics: identical operation set to the XLA ``dft_bf16`` round (bf16
operands, f32 accumulation, same 1e-8 phase floor); only the reduction
ORDER inside matmul tiles differs. Parity is pinned by
tests/test_pallas_gl.py (interpret mode on CPU) and on-chip by
scripts/gl_pallas_bench.py (which checks one-round
parity before timing).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS = True
except Exception:  # pragma: no cover
    _PALLAS = False


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


class GLGeom(NamedTuple):
    """Static geometry of a fused GL round (see module docstring)."""
    n_fft: int
    hop: int
    win_length: int
    F: int          # spectrogram frames
    n_freq: int
    P: int          # frames overlapping one hop segment: ceil(n_fft/hop)
    halo1: int      # k1 left-halo rows (multiple of 8, >= P)
    tf1: int        # k1 tile frames (multiple of halo1)
    fp1: int        # k1 padded grid rows
    halo2: int      # k2 right-halo rows (multiple of 8, >= P-1)
    tf2: int        # k2 tile frames (multiple of halo2)
    f2: int         # k2 padded output rows (multiple of tf2)
    seg2: int       # k2 padded input segments (f2 + halo2)
    L_sig: int      # istft output samples (after the center trim)


def gl_geometry(n_fft: int, hop: int, win_length: int, F: int) -> GLGeom:
    pad = n_fft // 2
    P = -(-n_fft // hop)
    halo1 = _ceil_to(P, 8)
    tf1 = _ceil_to(128, halo1)
    L_sig = n_fft + hop * (F - 1) - 2 * pad
    # k1 must produce every OLA position the re-framer reads: [0, pad+L_sig)
    rows_needed = -(-(pad + L_sig) // hop)
    fp1 = _ceil_to(max(F, rows_needed), tf1)
    halo2 = _ceil_to(max(P - 1, 1), 8)
    # k2 shares k1's padded row count so X needs NO per-round re-padding
    # between the kernels (the loop carry stays (B, fp1, n_freq)); the few
    # extra zero-mag rows of k2 matmul cost less than the pads they save
    tf2 = tf1
    f2 = fp1
    seg2 = f2 + halo2
    return GLGeom(n_fft, hop, win_length, F, n_fft // 2 + 1, P, halo1, tf1,
                  fp1, halo2, tf2, f2, seg2, L_sig)


# ---------------------------------------------------------------------------
# kernel 1: inverse rDFT + window + overlap-add + NOLA normalization


def _mm1(x, m_ref):
    """Single-pass bf16 matmul, f32 accumulation."""
    return jnp.dot(x.astype(jnp.bfloat16), m_ref[:],
                   preferred_element_type=jnp.float32)


def _mm3(x, hi_ref, lo_ref):
    """3-pass bf16 matmul ≈ f32: x = xh+xl and M = Mh+Ml split into bf16
    hi/lo halves; x@M ≈ xh@Mh + xh@Ml + xl@Mh (the xl@Ml term is below
    f32 noise) — the same decomposition XLA's Precision.HIGH uses."""
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    return (jnp.dot(xh, hi_ref[:], preferred_element_type=jnp.float32)
            + jnp.dot(xh, lo_ref[:], preferred_element_type=jnp.float32)
            + jnp.dot(xl, hi_ref[:], preferred_element_type=jnp.float32))


def _k1_body(g: GLGeom, three: bool, xr_ref, xr_halo_ref, xi_ref,
             xi_halo_ref, a_ref, al_ref, b_ref, bl_ref, win_ref, wsq_ref,
             y_ref):
    t = pl.program_id(1)
    live = jnp.where(t > 0, 1.0, 0.0).astype(jnp.float32)
    xr = jnp.concatenate([xr_halo_ref[0] * live, xr_ref[0]], axis=0)
    xi = jnp.concatenate([xi_halo_ref[0] * live, xi_ref[0]], axis=0)
    # inverse rDFT: z = Re(X) @ A + Im(X) @ B   (MXU, f32 accumulation)
    if three:
        z = _mm3(xr, a_ref, al_ref) + _mm3(xi, b_ref, bl_ref)
    else:
        z = _mm1(xr, a_ref) + _mm1(xi, b_ref)
    zw = z * win_ref[0][None, :]
    lanes = g.P * g.hop
    zw = jnp.pad(zw, ((0, 0), (0, lanes - g.n_fft)))
    # overlap-add: segment k of this tile collects piece p of frame row
    # k + halo1 - p (frame f's piece p lands in segment f + p)
    acc = jnp.zeros((g.tf1, g.hop), jnp.float32)
    for p in range(g.P):
        r0 = g.halo1 - p
        acc = acc + zw[r0: r0 + g.tf1, p * g.hop: (p + 1) * g.hop]
    y_ref[0] = acc * wsq_ref[:]


def _k1_call(g: GLGeom, Xr_p, Xi_p, consts, three, interpret):
    Bsz = Xr_p.shape[0]
    nT = g.fp1 // g.tf1
    R1 = g.tf1 // g.halo1
    NF = g.n_freq
    cur = pl.BlockSpec((1, g.tf1, NF), lambda b, t: (b, t, 0))
    halo = pl.BlockSpec((1, g.halo1, NF),
                        lambda b, t: (b, jnp.maximum(t * R1 - 1, 0), 0))
    mat = pl.BlockSpec((NF, g.n_fft), lambda b, t: (0, 0))
    return pl.pallas_call(
        functools.partial(_k1_body, g, three),
        grid=(Bsz, nT),
        in_specs=[cur, halo, cur, halo, mat, mat, mat, mat,
                  pl.BlockSpec((1, g.n_fft), lambda b, t: (0, 0)),
                  pl.BlockSpec((g.tf1, g.hop), lambda b, t: (t, 0))],
        out_specs=pl.BlockSpec((1, g.tf1, g.hop), lambda b, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct((Bsz, g.fp1, g.hop), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=interpret,
    )(Xr_p, Xr_p, Xi_p, Xi_p, consts["Ab"], consts["Ab_lo"],
      consts["Bb"], consts["Bb_lo"], consts["win"], consts["wsq_seg"])


# ---------------------------------------------------------------------------
# kernel 2: re-frame + window + forward rDFT + phase normalize + reimpose


def _k2_body(g: GLGeom, three: bool, y_ref, y_halo_ref, c_ref, cl_ref,
             s_ref, sl_ref, win_ref, mag_ref, xr_ref, xi_ref, fbuf):
    y = jnp.concatenate([y_ref[0], y_halo_ref[0]], axis=0)
    # frame j = segments [j, j+P) flattened, truncated to n_fft — the
    # staggered-stream framing, assembled through a VMEM scratch: a lane
    # concat of row-shifted slices has per-operand sublane offsets, which
    # Mosaic's tpu.concatenate rejects ("offset mismatch on non-concat
    # dimension"); stores relayout fine.
    for p in range(g.P):
        fbuf[:, p * g.hop: (p + 1) * g.hop] = y[p: p + g.tf2, :]
    frames = fbuf[:, : g.n_fft]
    fw = frames * win_ref[0][None, :]
    if three:
        er = _mm3(fw, c_ref, cl_ref)
        ei = _mm3(fw, s_ref, sl_ref)
    else:
        er = _mm1(fw, c_ref)
        ei = _mm1(fw, s_ref)
    r = jnp.sqrt(er * er + ei * ei)
    s = mag_ref[0] / jnp.maximum(1e-8, r)
    xr_ref[0] = er * s
    xi_ref[0] = ei * s


def _k2_call(g: GLGeom, y_seg, consts, mag_p, three, interpret):
    Bsz = y_seg.shape[0]
    nT = g.f2 // g.tf2
    R2 = g.tf2 // g.halo2
    NF = g.n_freq
    cur = pl.BlockSpec((1, g.tf2, g.hop), lambda b, t: (b, t, 0))
    halo = pl.BlockSpec((1, g.halo2, g.hop),
                        lambda b, t: (b, (t + 1) * R2, 0))
    out = pl.BlockSpec((1, g.tf2, NF), lambda b, t: (b, t, 0))
    mat = pl.BlockSpec((g.n_fft, NF), lambda b, t: (0, 0))
    return pl.pallas_call(
        functools.partial(_k2_body, g, three),
        grid=(Bsz, nT),
        in_specs=[cur, halo, mat, mat, mat, mat,
                  pl.BlockSpec((1, g.n_fft), lambda b, t: (0, 0)),
                  pl.BlockSpec((1, g.tf2, NF), lambda b, t: (b, t, 0))],
        out_specs=(out, out),
        out_shape=(jax.ShapeDtypeStruct((Bsz, g.f2, NF), jnp.float32),
                   jax.ShapeDtypeStruct((Bsz, g.f2, NF), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((g.tf2, g.P * g.hop), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=interpret,
    )(y_seg, y_seg, consts["Cb"], consts["Cb_lo"], consts["Sb"],
      consts["Sb_lo"], consts["win"], mag_p)


# ---------------------------------------------------------------------------
# glue: one exact GL round


def fused_gl_round(Xr, Xi, mag_p, consts, g: GLGeom, interpret: bool = False,
                   three_pass: bool = False):
    """One Griffin-Lim round, fused. Xr/Xi/mag_p (B, f2, n_freq) f32
    (rows >= F are zero and stay zero: their mag is zero). consts holds the
    bf16 DFT mats + window + NOLA pytree from ``gl_fused_consts``. Returns
    the re-imposed (Xr', Xi'). three_pass=True runs the hi/lo bf16 3-pass
    matmul decomposition (≈ f32, for the basin-selecting head/tail rounds
    of the mixed schedule)."""
    pad = g.n_fft // 2
    B = Xr.shape[0]
    Xrp = jnp.pad(Xr, ((0, 0), (0, g.fp1 - g.f2), (0, 0)))
    Xip = jnp.pad(Xi, ((0, 0), (0, g.fp1 - g.f2), (0, 0)))
    y = _k1_call(g, Xrp, Xip, consts, three_pass, interpret)
    y = y.reshape(B, g.fp1 * g.hop)
    # istft center-trim then stft reflect-pad (reference utils.py:109-114 +
    # librosa stft center): interior samples cancel; only n_fft-sample edges
    # are touched, so XLA does this between the kernels.
    y = y[:, pad: pad + g.L_sig]
    y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    y = jnp.pad(y, ((0, 0), (0, g.seg2 * g.hop - y.shape[1])))
    y_seg = y.reshape(B, g.seg2, g.hop)
    return _k2_call(g, y_seg, consts, mag_p, three_pass, interpret)


def gl_fused_consts(n_fft: int, hop: int, win_length: int, F: int) -> dict:
    """Host-side constants pytree for the fused rounds. Pass through your
    jit boundary as ARGUMENTS (embedded literals compile minutes slower
    over the axon tunnel — see dsp.stft.dft_consts)."""
    from ..dsp.stft import (_dft_mats, _idft_mats, _ola_window_sq,
                            hann_window)
    g = gl_geometry(n_fft, hop, win_length, F)
    C32, S32 = _dft_mats(n_fft, "float32")
    A32, B32 = _idft_mats(n_fft, "float32")

    import ml_dtypes  # numpy bfloat16 (ships with jax)

    def split(m32):
        hi = m32.astype(ml_dtypes.bfloat16)
        lo = (m32 - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
        return hi, lo

    Cb, Cl = split(C32)
    Sb, Sl = split(S32)
    Ab, Al = split(A32)
    Bb, Bl = split(B32)
    win = hann_window(win_length, n_fft).reshape(1, n_fft)
    # NOLA normalization in OLA coordinates, padded with the same 1.0 the
    # istft uses where the window sum vanishes. wsq spans the full OLA
    # support n_fft + hop*(F-1), which can exceed the fp1*hop samples k1
    # actually emits (fp1 only guarantees coverage of [0, pad+L_sig), the
    # part the trim keeps) — truncate: the dropped tail lies beyond
    # pad+L_sig and is discarded before kernel 2 re-frames.
    wsq = _ola_window_sq(F, n_fft, hop, win_length)
    wsq_seg = np.ones((g.fp1 * hop,), np.float32)
    n = min(wsq.shape[0], g.fp1 * hop)
    wsq_seg[:n] = wsq[:n]
    # zero-width F tag: distinct F can share an fp1 bucket (e.g. 840 and
    # 850 at production geometry) while their NOLA tails differ, so
    # griffin_lim validates caller-passed consts against THIS shape — a
    # (F, 0) array stays statically inspectable through jit boundaries.
    return {"Ab": Ab, "Ab_lo": Al, "Bb": Bb, "Bb_lo": Bl,
            "Cb": Cb, "Cb_lo": Cl, "Sb": Sb, "Sb_lo": Sl,
            "win": win, "wsq_seg": wsq_seg.reshape(g.fp1, hop),
            "F_tag": np.zeros((F, 0), np.float32)}


def pallas_gl_supported() -> bool:
    return _PALLAS
