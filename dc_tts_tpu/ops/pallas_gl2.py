"""Whole-loop fused Griffin-Lim: ALL 50 rounds as ONE Pallas kernel.

Round 3's fused GL (ops/pallas_gl.py) fuses one round into two kernels but
still pays, per round, the HBM round-trips of the (B, F, n_freq) spectra
between kernels, the halo re-reads, and 17 MB of resident full DFT
matrices that force the two-kernel split in the first place. Round-4
profiling (scripts/ct_kernel_exp.py) showed the bf16 DFT matmul compute is
roughly FREE next to that traffic — so the win is not a faster matmul, it
is making the traffic zero.

This kernel does that with the 4-step (Cooley-Tukey transpose) DFT
factorization, N = 16 * N2 (N2 = n_fft/16 = 128 at production size):

    n = 128*n1 + n2,  k = k1 + 16*k2
    G[k1,f,n2] = sum_n1 W16[n1,k1] x[f,n1,n2]       MXU, contract 16
    Z[k1,f,n2] = G * W_N^{n2 k1}                    VPU twiddle (exact f32)
    X[k1,f,k2] = sum_n2 Z[k1,f,n2] W128[n2,k2]      MXU, contract 128

whose constants total a few hundred KB — small enough that one utterance's
ENTIRE Griffin-Lim state (full-spectrum X in the scrambled (k1, f, k2)
layout, the waveform, the frame buffer, all matrices) lives in VMEM
(~128 MB on v5e) for all 50 rounds. Per utterance the kernel reads the
magnitude once and writes the waveform once; every intermediate of every
round stays on-chip. The spectrum stays in the scrambled layout between
rounds — the inverse stages consume it directly — so each round needs
exactly two frame-layout transposes ((F,16,N2) <-> (16,F,N2)).

The full 2048-bin spectrum (mirrored magnitude) is carried instead of the
rfft half: phase-normalize/re-impose act bin-wise so conjugate symmetry is
preserved to rounding, and both transform directions become plain dense
stages with no Nyquist special cases.

Precision schedule (same shape as dsp.griffin_lim's dft_mixed): the
basin-selecting head/tail rounds and the final synthesis iSTFT run the
factored stages at f32 Precision.HIGHEST with exact f32 twiddles — BETTER
than the old 3-pass trick at a fraction of its cost, because the factored
stages carry ~4x fewer MACs; the middle rounds run single-pass bf16
operands / f32 accumulation.

Reference semantics: /root/reference/utils.py:96-114 (istft -> stft ->
phase normalize -> re-impose, 1e-8 floor) with librosa's center trim +
reflect pad reproduced in-kernel: the trim/pad composition is the
IDENTITY on the interior and a static mirror on the n_fft-sample edges,
implemented with an exact one-hot lane-reversal matmul + static lane
concats (no gathers).
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

_N1 = 16


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


class GL2Geom(NamedTuple):
    n_fft: int
    hop: int
    win_length: int
    F: int
    N2: int          # n_fft // 16
    P: int           # ceil(n_fft / hop)
    F2: int          # F padded to a multiple of 8
    rows_y: int      # waveform buffer rows (hop samples each)
    pad: int         # n_fft // 2
    L_sig: int       # trimmed istft length
    edge_rows: int   # mirror scratch rows (covers both reflect edges)


def gl2_geometry(n_fft: int, hop: int, win_length: int, F: int) -> GL2Geom:
    if n_fft % (2 * _N1) != 0:
        raise ValueError(
            f"fused whole-loop GL needs n_fft % {2 * _N1} == 0, "
            f"got n_fft={n_fft}")
    pad = n_fft // 2
    P = -(-n_fft // hop)
    F2 = _ceil_to(F, 8)
    L_sig = n_fft + hop * (F - 1) - 2 * pad
    # rows must cover both the re-framer reads [0, F2+P-1) and the reflect
    # tail 2*pad + L_sig
    rows_y = max(F2 + P - 1, -(-(2 * pad + L_sig) // hop) + 1)
    rows_y = _ceil_to(rows_y, 8)
    # mirror rows touched per edge: left [0, (pad-1)//hop], right spans
    # <= pad/hop + 2 rows — size the edge scratch from geometry instead
    # of a hardcoded bound (a 16-row buffer overflows at n_fft >~ 30*hop)
    edge_rows = _ceil_to(pad // hop + 2, 8)
    return GL2Geom(n_fft, hop, win_length, F, n_fft // _N1, P, F2, rows_y,
                   pad, L_sig, edge_rows)


# ---------------------------------------------------------------------------
# constants


def gl2_consts(n_fft: int, hop: int, win_length: int, F: int) -> dict:
    """Host-side constants pytree (all tiny). Pass through jit boundaries
    as ARGUMENTS (see dsp.stft.dft_consts)."""
    from ..dsp.stft import hann_window, _ola_window_sq

    import ml_dtypes

    g = gl2_geometry(n_fft, hop, win_length, F)
    N2 = g.N2
    n1 = np.arange(_N1)
    n2 = np.arange(N2)

    ang16 = 2 * np.pi * np.outer(n1, n1) / _N1
    C16f, S16f = np.cos(ang16), -np.sin(ang16)              # [n1, k1]
    angT = 2 * np.pi * np.outer(n1, n2) / n_fft             # [k1, n2]
    Tc, Ts = np.cos(angT), -np.sin(angT)
    ang2 = 2 * np.pi * np.outer(n2, n2) / N2
    C128f, S128f = np.cos(ang2), -np.sin(ang2)              # [n2, k2]

    # inverse (1/N folded into the 16-point stage)
    C16i = np.cos(ang16) / n_fft                            # [k1, n1]
    S16i = np.sin(ang16) / n_fft
    # stacked forms: one M=32 (fwd) / K=32 (inv) matmul replaces two M=16
    CS16f = np.concatenate([C16f, S16f], axis=0)            # (32, 16)
    CS16i = np.concatenate([C16i.T, -S16i.T], axis=0).T     # (16, 32)
    C128i, S128i = np.cos(ang2), np.sin(ang2)               # [k2, n2]

    win = hann_window(win_length, n_fft).reshape(1, n_fft)
    wsq = _ola_window_sq(F, n_fft, hop, win_length)         # 1/sum(w^2)
    wsq_seg = np.ones((g.rows_y * hop,), np.float32)
    n = min(wsq.shape[0], wsq_seg.shape[0])
    wsq_seg[:n] = wsq[:n]

    rev = np.eye(hop, dtype=np.float32)[::-1]               # lane reversal

    # wide (lane-tiled) twiddles let the forward stage twiddle in the FLAT
    # (16, chunk*N2) layout, skipping one relayout per chunk
    CF = _ceil_to(-(-g.F2 // 3), 8)
    Tcw = np.tile(Tc, (1, CF))
    Tsw = np.tile(Ts, (1, CF))

    def f32(x):
        return np.ascontiguousarray(x, np.float32)

    def bf(x):
        return np.ascontiguousarray(x.astype(np.float32)).astype(
            ml_dtypes.bfloat16)

    # (the un-stacked per-direction 16-point matrices are NOT shipped:
    # the stacked CS16f/CS16i forms superseded them)
    return {
        "CS16f": f32(CS16f), "CS16i": f32(CS16i),
        "CS16fb": bf(CS16f), "CS16ib": bf(CS16i),
        "Tc": f32(Tc)[:, None, :], "Ts": f32(Ts)[:, None, :],
        "Tcw": f32(Tcw), "Tsw": f32(Tsw),
        "C128f": f32(C128f), "S128f": f32(S128f),
        "C128i": f32(C128i), "S128i": f32(S128i),
        "C128fb": bf(C128f), "S128fb": bf(S128f),
        "C128ib": bf(C128i), "S128ib": bf(S128i),
        "win": f32(win), "wsq": f32(wsq_seg.reshape(g.rows_y, hop)),
        "rev": f32(rev),
        "F_tag": np.zeros((F, 0), np.float32),
    }


def scramble_mag(mag: jax.Array, g: GL2Geom,
                 dtype=jnp.float32) -> jax.Array:
    """(..., F, n_freq) magnitude -> (..., 16, F2, N2) full-spectrum
    magnitude in the kernel's (k1, f, k2) layout (XLA, once per call)."""
    F, nf = mag.shape[-2], mag.shape[-1]
    assert nf == g.n_fft // 2 + 1
    tail = jnp.flip(mag[..., 1:-1], axis=-1)        # bins n_fft-1 .. n_freq
    full = jnp.concatenate([mag, tail], axis=-1)    # (..., F, n_fft)
    full = jnp.pad(full, [(0, 0)] * (mag.ndim - 2)
                   + [(0, g.F2 - F), (0, 0)])
    full = full.reshape(full.shape[:-1] + (g.N2, _N1))   # k = k1 + 16 k2
    # dtype=bf16 would halve this read (the kernel's dominant HBM
    # traffic) at a ~0.4% magnitude-quantization cost, but measured NO
    # wall-clock gain — the grid pipeline hides the read under compute —
    # so f32 (exact) is the default.
    return jnp.moveaxis(full, -1, -3).astype(dtype)


# ---------------------------------------------------------------------------
# kernel


def _mm(a, m_ref, hi: bool):
    """Stage matmul: f32 HIGHEST (head/tail/final) or bf16 single-pass.
    bf16 operands may be pre-cast (cheap relayouts happen on half-width
    data); f32 operands are cast here."""
    if hi:
        return jax.lax.dot_general(
            a, m_ref[:], (((a.ndim - 1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
    if a.dtype != jnp.bfloat16:
        a = a.astype(jnp.bfloat16)
    return jnp.dot(a, m_ref[:], preferred_element_type=jnp.float32)


def _kernel(g: GL2Geom, sched, ablate, mag_ref,
            cs16f_ref, cs16i_ref, cs16fb_ref, cs16ib_ref,
            tc_ref, ts_ref, tcw_ref, tsw_ref,
            c128f_ref, s128f_ref, c128i_ref, s128i_ref,
            c128fb_ref, s128fb_ref, c128ib_ref, s128ib_ref,
            win_ref, wsq_ref, rev_ref,
            y_out, xr_ref, xi_ref, y_ref, fbuf, edge_buf):
    N2, F2, P, hop, n_fft = g.N2, g.F2, g.P, g.hop, g.n_fft
    pad, L = g.pad, g.L_sig
    head, mid, tail = sched
    tc, ts = tc_ref[:], ts_ref[:]
    win = win_ref[0]

    # transposed-stage forms use explicit swapaxes; Mosaic lowers them as
    # relayout copies (verified on v5e by scripts/ct_kernel_exp.py)

    def mm_left(m_ref, a, hi):
        """m (16,16) @ a (16, K) with the precision schedule."""
        if hi:
            return jax.lax.dot_general(
                m_ref[:], a, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
        if a.dtype != jnp.bfloat16:
            a = a.astype(jnp.bfloat16)
        return jnp.dot(m_ref[:], a, preferred_element_type=jnp.float32)

    # transform stages run in frame CHUNKS so the (16, chunk, N2)
    # intermediates stay a fraction of the resident state (whole-utterance
    # temps busted the 128 MB VMEM budget at production geometry)
    CF = _ceil_to(-(-F2 // 3), 8)
    chunks = [(c0, min(CF, F2 - c0)) for c0 in range(0, F2, CF)]

    def do_inverse(hi):
        """X scratch (scrambled) -> windowed frames stored in fbuf."""
        if "inv" in ablate:
            return
        c128i = c128i_ref if hi else c128ib_ref
        s128i = s128i_ref if hi else s128ib_ref
        for c0, cw in chunks:
            Xr = xr_ref[:, c0: c0 + cw, :].reshape(_N1 * cw, N2)
            Xi = xi_ref[:, c0: c0 + cw, :].reshape(_N1 * cw, N2)
            if "mm128" in ablate:
                hr = Xr.reshape(_N1, cw, N2)
                h_i = Xi.reshape(_N1, cw, N2)
            else:
                hr = (_mm(Xr, c128i, hi)
                      - _mm(Xi, s128i, hi)).reshape(_N1, cw, N2)
                h_i = (_mm(Xr, s128i, hi)
                       + _mm(Xi, c128i, hi)).reshape(_N1, cw, N2)
            zr = (hr * tc + h_i * ts).reshape(_N1, cw * N2)
            zi = (h_i * tc - hr * ts).reshape(_N1, cw * N2)
            # x[n1,f,n2] = sum_k1 C16i[n1,k1] zr[k1,..] - S16i[n1,k1] zi[..]
            # (stacked: [C16i | -S16i] (16,32) @ [zr; zi] (32, K))
            if "mm16" in ablate:
                xT = (zr - zi).reshape(_N1, cw, N2)
            else:
                cs16i = cs16i_ref if hi else cs16ib_ref
                zs = jnp.concatenate([zr, zi], axis=0)
                xT = mm_left(cs16i, zs, hi).reshape(_N1, cw, N2)
            if "relay" in ablate:
                frames = xT.reshape(cw, n_fft)
            else:
                frames = jnp.swapaxes(xT, 0, 1).reshape(cw, n_fft)
            fbuf[c0: c0 + cw, :n_fft] = frames * win[None, :]

    def do_ola_and_edges():
        """fbuf frames -> y scratch: OLA + NOLA + trim/reflect edges."""
        if "ola" in ablate:
            return
        zw = fbuf[:, :n_fft]
        lanes = P * hop
        zwp = jnp.pad(zw, ((0, 0), (0, lanes - n_fft)))
        y_ref[:] = jnp.zeros((g.rows_y, hop), jnp.float32)
        for p in range(P):
            y_ref[p: p + F2, :] += zwp[:, p * hop: (p + 1) * hop]
        y_ref[:] = y_ref[:] * wsq_ref[:]

        # trim+reflect == identity on the interior; mirror the edges. A
        # mirrored dest row r is a static lane-concat of two LANE-REVERSED
        # source rows (the mirror runs backwards through sample index
        # s = s_hi - c, crossing exactly one row boundary per dest row);
        # lane reversal is an exact one-hot (hop, hop) matmul.
        rev = rev_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, hop), 1)

        def mirror_rows(r_lo, r_hi, s_of_r, keep_of_r):
            """Overwrite dest rows r_lo..r_hi with y[s_of_r(r) - c] on the
            lanes keep_of_r selects (reads a pre-overwrite snapshot). The
            two lane-slices land at shifted offsets, which Mosaic's lane
            concat rejects — assemble through edge_buf stores instead
            (stores relayout fine)."""
            a_min = min(s_of_r(r) for r in range(r_lo, r_hi + 1)) // hop - 1
            a_max = max(s_of_r(r) for r in range(r_lo, r_hi + 1)) // hop
            rb0 = max(0, (a_min // 8) * 8)
            # HIGHEST: a one-hot permutation matmul is EXACT at full
            # precision, but Mosaic's default dot demotes the values to
            # single-pass bf16 (measured 1e-3 edge error on chip)
            blk = jax.lax.dot_general(
                y_ref[rb0: _ceil_to(a_max + 1, 8), :], rev,
                (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            for i, r in enumerate(range(r_lo, r_hi + 1)):
                s_hi = s_of_r(r)
                a1, b1 = s_hi // hop, s_hi % hop
                edge_buf[i: i + 1, : b1 + 1] = \
                    blk[a1 - rb0: a1 - rb0 + 1, hop - 1 - b1:]
                if b1 + 1 < hop:
                    edge_buf[i: i + 1, b1 + 1:] = \
                        blk[a1 - 1 - rb0: a1 - rb0, : hop - 1 - b1]
            for i, r in enumerate(range(r_lo, r_hi + 1)):
                y_ref[r: r + 1, :] = jnp.where(keep_of_r(r),
                                               edge_buf[i: i + 1, :],
                                               y_ref[r: r + 1, :])

        if "edges" in ablate:
            return
        # left: y2[j] = y[2*pad - j] for j < pad
        mirror_rows(0, (pad - 1) // hop,
                    lambda r: 2 * pad - hop * r,
                    lambda r: lane < (pad - hop * r))
        # right: y2[j] = y[2*E - j] for E < j <= E + pad, E = last kept
        E = pad + L - 1
        mirror_rows((E + 1) // hop, (E + pad) // hop,
                    lambda r: 2 * E - hop * r,
                    lambda r: ((hop * r + lane) > E)
                    & ((hop * r + lane) <= E + pad))

    def do_forward(hi):
        """y scratch -> spectrum scratch (scrambled), phase-normalized
        against the magnitude."""
        if "fwd" in ablate:
            return
        c128f = c128f_ref if hi else c128fb_ref
        s128f = s128f_ref if hi else s128fb_ref
        for p in range(P):
            fbuf[:, p * hop: (p + 1) * hop] = y_ref[p: p + F2, :]
        tcw, tsw = tcw_ref[:], tsw_ref[:]
        for c0, cw in chunks:
            frames = fbuf[c0: c0 + cw, :n_fft] * win[None, :]
            if "relay" in ablate:
                x2 = frames.reshape(_N1, cw * N2)
            else:
                xT = jnp.swapaxes(frames.reshape(cw, _N1, N2), 0, 1)
                x2 = xT.reshape(_N1, cw * N2)
            # twiddle in the FLAT layout (wide lane-tiled twiddles) so the
            # matmul outputs need no (16, cw, N2) round-trip; the 16-point
            # stage is ONE stacked M=32 matmul ([C16f; S16f] @ x2)
            if "mm16" in ablate:
                gr = gi = x2
            else:
                cs16f = cs16f_ref if hi else cs16fb_ref
                gg = mm_left(cs16f, x2, hi)       # (32, K): [gr; gi]
                gr, gi = gg[:_N1], gg[_N1:]
            tw_c = tcw[:, : cw * N2]
            tw_s = tsw[:, : cw * N2]
            zr = (gr * tw_c - gi * tw_s).reshape(_N1 * cw, N2)
            zi = (gr * tw_s + gi * tw_c).reshape(_N1 * cw, N2)
            if "mm128" in ablate:
                er, ei = zr, zi
            else:
                er = _mm(zr, c128f, hi) - _mm(zi, s128f, hi)
                ei = _mm(zr, s128f, hi) + _mm(zi, c128f, hi)
            r = jnp.sqrt(er * er + ei * ei)
            scale = (mag_ref[0, :, c0: c0 + cw, :].reshape(_N1 * cw, N2)
                     / jnp.maximum(1e-8, r))
            xr_ref[:, c0: c0 + cw, :] = (er * scale).reshape(_N1, cw, N2)
            xi_ref[:, c0: c0 + cw, :] = (ei * scale).reshape(_N1, cw, N2)

    def round_body(hi):
        def body(i, carry):
            do_inverse(hi)
            do_ola_and_edges()
            do_forward(hi)
            return carry
        return body

    # X0 = magnitude, zero phase
    xr_ref[:] = mag_ref[0].astype(jnp.float32)
    xi_ref[:] = jnp.zeros(mag_ref.shape[1:], jnp.float32)

    jax.lax.fori_loop(0, head, round_body(True), 0)
    jax.lax.fori_loop(0, mid, round_body(False), 0)
    jax.lax.fori_loop(0, tail, round_body(True), 0)

    # final synthesis iSTFT at full precision: inverse + OLA + NOLA (no
    # reflect — the caller trims [pad : pad+L] from the flat signal)
    do_inverse(True)
    zw = fbuf[:, :n_fft]
    zwp = jnp.pad(zw, ((0, 0), (0, P * hop - n_fft)))
    y_ref[:] = jnp.zeros((g.rows_y, hop), jnp.float32)
    for p in range(P):
        y_ref[p: p + F2, :] += zwp[:, p * hop: (p + 1) * hop]
    y_out[0] = y_ref[:] * wsq_ref[:]


def gl2_run(mag_scr: jax.Array, consts: dict, g: GL2Geom, n_iter: int,
            interpret: bool = False) -> jax.Array:
    """Run the whole GL loop. mag_scr: (B, 16, F2, N2) from scramble_mag
    (already denormalized/amplified). Returns (B, L_sig) waveforms."""
    B = mag_scr.shape[0]
    head = min(n_iter, max(1, n_iter // 10))
    tail = min(n_iter - head, max(2, n_iter // 10))
    mid = n_iter - head - tail

    cn = ["CS16f", "CS16i", "CS16fb", "CS16ib",
          "Tc", "Ts", "Tcw", "Tsw",
          "C128f", "S128f", "C128i", "S128i",
          "C128fb", "S128fb", "C128ib", "S128ib",
          "win", "wsq", "rev"]

    def cspec(name):
        shp = tuple(consts[name].shape)
        return pl.BlockSpec(shp, lambda b: tuple(0 for _ in shp))

    out = pl.pallas_call(
        functools.partial(_kernel, g, (head, mid, tail), frozenset()),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, _N1, g.F2, g.N2), lambda b: (b, 0, 0, 0))]
        + [cspec(n) for n in cn],
        out_specs=pl.BlockSpec((1, g.rows_y, g.hop), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, g.rows_y, g.hop), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_N1, g.F2, g.N2), jnp.float32),
            pltpu.VMEM((_N1, g.F2, g.N2), jnp.float32),
            pltpu.VMEM((g.rows_y, g.hop), jnp.float32),
            pltpu.VMEM((g.F2, g.P * g.hop), jnp.float32),
            pltpu.VMEM((g.edge_rows, g.hop), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 << 20),
        interpret=interpret,
    )(mag_scr, *[consts[n] for n in cn])
    y = out.reshape(B, g.rows_y * g.hop)
    return y[:, g.pad: g.pad + g.L_sig]


def pallas_gl2_supported() -> bool:
    return _PALLAS
