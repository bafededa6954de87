"""Griffin-Lim stage decomposition on TPU (round 3).

BASELINE.md round 2: GL is 91.8% of synthesis device time at 13.3% MFU.
The 4 big DFT matmuls per round cost ~200 ms ideal over 50 rounds at the
dft_mixed schedule, but the measured stage is ~1.53 s — so ~1.3 s is
something else. This script times each constituent at bench geometry
(B=40, F=840, n_fft=2048) to locate it.

All DFT matrices / windows enter every jit AS ARGUMENTS — closed-over
device arrays embed as HLO literals and push compiles to tens of minutes
over the axon tunnel (the dft_consts docstring pathology).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dc_tts_tpu.utils.compile_cache import enable as enable_compile_cache

enable_compile_cache()

from dc_tts_tpu.config import base_config
from dc_tts_tpu.dsp.stft import (_dft_mats, _idft_mats, _frame_signal,
                                 _overlap_add, _ola_window_sq, hann_window,
                                 istft, stft, _mm, _mm3x)

T0 = time.time()


def mark(msg):
    print(f"[{time.time() - T0:7.1f}s] {msg}", flush=True)


def _fence(out):
    leaf = jax.tree.leaves(out)[0]
    if jnp.iscomplexobj(leaf):
        leaf = leaf.real  # axon can't transfer complex scalars (Unimplemented)
    return np.asarray(leaf.ravel()[0])


def timeit(fn, *args, iters=5):
    out = fn(*args)
    _ = _fence(out)  # host fence
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = _fence(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    cfg = base_config()
    B, F, n_fft, hop, win_l = 40, 840, cfg.n_fft, cfg.hop_length, cfg.win_length
    n_freq = n_fft // 2 + 1
    mark(f"platform {jax.devices()[0].platform}  B={B} F={F}")

    rng = np.random.default_rng(0)
    mag = jnp.asarray(rng.random((B, F, n_freq), np.float32))
    Xr = jnp.asarray(rng.standard_normal((B, F, n_freq)).astype(np.float32))
    Xi = jnp.asarray(rng.standard_normal((B, F, n_freq)).astype(np.float32))
    X = jax.lax.complex(Xr, Xi)
    frames = jnp.asarray(rng.standard_normal((B, F, n_fft)).astype(np.float32))

    C32, S32 = _dft_mats(n_fft, "float32")
    A32, B32 = _idft_mats(n_fft, "float32")
    m3 = {"C": jnp.asarray(C32), "S": jnp.asarray(S32),
          "A": jnp.asarray(A32), "B": jnp.asarray(B32)}
    Cb, Sb = _dft_mats(n_fft, "bfloat16")
    Ab, Bb = _idft_mats(n_fft, "bfloat16")
    mb = {"C": jnp.asarray(Cb), "S": jnp.asarray(Sb),
          "A": jnp.asarray(Ab), "B": jnp.asarray(Bb)}

    win = jnp.asarray(hann_window(win_l, n_fft))
    wsq = jnp.asarray(_ola_window_sq(F, n_fft, hop, win_l))
    pad = n_fft // 2
    L = n_fft + hop * (F - 1) - 2 * pad

    # ---- full rounds (the current production round body)
    def round_full(mth, X, mag, mm):
        x_t = istft(X, n_fft, hop, win_l, method=mth, mats=mm)
        est = stft(x_t, n_fft, hop, win_l, method=mth, mats=mm)
        phase = est / jnp.maximum(1e-8, jnp.abs(est))
        return mag * phase

    t = timeit(jax.jit(lambda X, mag, mm: round_full("dft_3x", X, mag, mm)),
               X, mag, m3)
    mark(f"full round dft_3x     {t*1e3:8.1f} ms")
    t = timeit(jax.jit(lambda X, mag, mm: round_full("dft_bf16", X, mag, mm)),
               X, mag, mb)
    mark(f"full round dft_bf16   {t*1e3:8.1f} ms")

    # ---- the 4 matmuls alone, bf16 (the FLOP floor of a round)
    def mm4_bf(Xr, Xi, fr, mm):
        z = (_mm(Xr, mm["A"], jnp.bfloat16) + _mm(Xi, mm["B"], jnp.bfloat16))
        er = _mm(fr, mm["C"], jnp.bfloat16)
        ei = _mm(fr, mm["S"], jnp.bfloat16)
        return z, er, ei

    t = timeit(jax.jit(mm4_bf), Xr, Xi, frames, mb)
    mark(f"4 matmuls bf16        {t*1e3:8.1f} ms")

    # ---- phase normalize + reimpose alone (planar)
    def phase_planar(er, ei, mag):
        r = jnp.sqrt(er * er + ei * ei)
        s = mag / jnp.maximum(1e-8, r)
        return er * s, ei * s

    t = timeit(jax.jit(phase_planar), Xr, Xi, mag)
    mark(f"phase+reimpose planar {t*1e3:8.1f} ms")

    # ---- framing / OLA alone
    def ola_only(fr, win, wsq):
        return _overlap_add(fr * win, hop) * wsq

    t = timeit(jax.jit(ola_only), frames, win, wsq)
    mark(f"window+OLA+wsq        {t*1e3:8.1f} ms")

    yb = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32))

    def frame_only(y, win):
        yp = jnp.pad(y, [(0, 0), (pad, pad)], mode="reflect")
        return _frame_signal(yp, F, n_fft, hop) * win

    t = timeit(jax.jit(frame_only), yb, win)
    mark(f"pad+frame+window      {t*1e3:8.1f} ms")

    # ---- planar full round (no complex64 anywhere), bf16 matmuls
    def round_planar_bf(Xr, Xi, mag, mm, win, wsq):
        z = (_mm(Xr, mm["A"], jnp.bfloat16) + _mm(Xi, mm["B"], jnp.bfloat16))
        yy = _overlap_add(z * win, hop) * wsq
        yy = yy[..., pad: pad + L]
        yp = jnp.pad(yy, [(0, 0), (pad, pad)], mode="reflect")
        fr = _frame_signal(yp, F, n_fft, hop) * win
        er = _mm(fr, mm["C"], jnp.bfloat16)
        ei = _mm(fr, mm["S"], jnp.bfloat16)
        r = jnp.sqrt(er * er + ei * ei)
        s = mag / jnp.maximum(1e-8, r)
        return er * s, ei * s

    t = timeit(jax.jit(round_planar_bf), Xr, Xi, mag, mb, win, wsq)
    mark(f"planar round bf16     {t*1e3:8.1f} ms")

    # ---- 40-round loops: complex (current) vs planar
    def gl_complex(mag, mm):
        Xc = mag.astype(jnp.complex64)

        def body(_, Xc):
            return round_full("dft_bf16", Xc, mag, mm)

        return jnp.real(jax.lax.fori_loop(0, 40, body, Xc))

    def gl_planar(mag, mm, win, wsq):
        def body(_, c):
            return round_planar_bf(*c, mag, mm, win, wsq)

        xr, xi = jax.lax.fori_loop(0, 40, body,
                                   (mag, jnp.zeros_like(mag)))
        return xr

    t = timeit(jax.jit(gl_complex), mag, mb, iters=2)
    mark(f"40 rounds complex bf16  {t*1e3:8.1f} ms")
    t = timeit(jax.jit(gl_planar), mag, mb, win, wsq, iters=2)
    mark(f"40 rounds planar  bf16  {t*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
