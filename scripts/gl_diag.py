"""Griffin-Lim stage decomposition on TPU (round 3).

BASELINE.md round 2: GL is 91.8% of synthesis device time at 13.3% MFU.
The 4 big DFT matmuls per round cost ~200 ms ideal over 50 rounds at the
dft_mixed schedule, but the measured stage is ~1.53 s — so ~1.3 s is
something else. This script times each constituent at bench geometry
(B=40, F=840, n_fft=2048) to locate it:

  - full GL round (dft_3x / dft_bf16)
  - the 4 matmuls alone (irdft pair + rdft pair)
  - istft alone / stft alone (adds framing + OLA + window)
  - phase-normalize + mag-reimpose alone
  - OLA alone, framing alone
  - planar (real-pair) round vs complex64 round
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
from dc_tts_tpu.dsp import stft as stft_mod
from dc_tts_tpu.dsp.stft import (_dft_mats, _idft_mats, _frame_signal,
                                 _overlap_add, _ola_window_sq, hann_window,
                                 istft, stft, rdft, irdft)

T0 = time.time()


def mark(msg):
    print(f"[{time.time() - T0:7.1f}s] {msg}", flush=True)


def timeit(fn, *args, iters=5):
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[0])  # host fence
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0].ravel()[0])
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
    L = n_fft + hop * (F - 1) - 2 * (n_fft // 2)
    y = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32))

    C32, S32 = _dft_mats(n_fft, "float32")
    A32, B32 = _idft_mats(n_fft, "float32")
    m3 = {"C": jnp.asarray(C32), "S": jnp.asarray(S32),
          "A": jnp.asarray(A32), "B": jnp.asarray(B32)}
    Cb, Sb = _dft_mats(n_fft, "bfloat16")
    Ab, Bb = _idft_mats(n_fft, "bfloat16")
    mb = {"C": jnp.asarray(Cb), "S": jnp.asarray(Sb),
          "A": jnp.asarray(Ab), "B": jnp.asarray(Bb)}

    # ---- full rounds
    def round_full(mth, mm, X):
        x_t = istft(X, n_fft, hop, win_l, method=mth, mats=mm)
        est = stft(x_t, n_fft, hop, win_l, method=mth, mats=mm)
        phase = est / jnp.maximum(1e-8, jnp.abs(est))
        return mag * phase

    for mth, mm in [("dft_3x", m3), ("dft_bf16", mb)]:
        f = jax.jit(lambda X, mm=mm, mth=mth: round_full(mth, mm, X))
        t = timeit(f, X)
        mark(f"full round {mth:9s} {t*1e3:8.1f} ms")

    # ---- matmuls alone (same shapes, 3-pass and bf16)
    from dc_tts_tpu.dsp.stft import _mm, _mm3x

    def mm4_3x(Xr, Xi, fr):
        z = _mm3x(Xr, m3["A"]) + _mm3x(Xi, m3["B"])      # irdft pair
        er = _mm3x(fr, m3["C"])
        ei = _mm3x(fr, m3["S"])
        return z, er, ei

    def mm4_bf(Xr, Xi, fr):
        z = _mm(Xr, mb["A"], jnp.bfloat16) + _mm(Xi, mb["B"], jnp.bfloat16)
        er = _mm(fr, mb["C"], jnp.bfloat16)
        ei = _mm(fr, mb["S"], jnp.bfloat16)
        return z, er, ei

    t = timeit(jax.jit(mm4_3x), Xr, Xi, frames)
    mark(f"4 matmuls 3-pass      {t*1e3:8.1f} ms")
    t = timeit(jax.jit(mm4_bf), Xr, Xi, frames)
    mark(f"4 matmuls bf16        {t*1e3:8.1f} ms")

    # ---- istft / stft alone
    for mth, mm in [("dft_3x", m3), ("dft_bf16", mb)]:
        t = timeit(jax.jit(lambda X, mm=mm, mth=mth: istft(
            X, n_fft, hop, win_l, method=mth, mats=mm)), X)
        mark(f"istft {mth:9s}       {t*1e3:8.1f} ms")
        t = timeit(jax.jit(lambda y, mm=mm, mth=mth: stft(
            y, n_fft, hop, win_l, method=mth, mats=mm)), y)
        mark(f"stft  {mth:9s}       {t*1e3:8.1f} ms")

    # ---- phase normalize + reimpose alone (complex and planar forms)
    def phase_cx(est):
        phase = est / jnp.maximum(1e-8, jnp.abs(est))
        return mag * phase

    def phase_planar(er, ei):
        r = jnp.sqrt(er * er + ei * ei)
        s = mag / jnp.maximum(1e-8, r)
        return er * s, ei * s

    t = timeit(jax.jit(phase_cx), X)
    mark(f"phase+reimpose cx     {t*1e3:8.1f} ms")
    t = timeit(jax.jit(phase_planar), Xr, Xi)
    mark(f"phase+reimpose planar {t*1e3:8.1f} ms")

    # ---- framing / OLA alone
    win = jnp.asarray(hann_window(win_l, n_fft))
    wsq = jnp.asarray(_ola_window_sq(F, n_fft, hop, win_l))

    def ola_only(fr):
        yy = _overlap_add(fr * win, hop)
        return yy * wsq

    t = timeit(jax.jit(ola_only), frames)
    mark(f"window+OLA+wsq        {t*1e3:8.1f} ms")

    pad = n_fft // 2

    def frame_only(y):
        yp = jnp.pad(y, [(0, 0), (pad, pad)], mode="reflect")
        fr = _frame_signal(yp, F, n_fft, hop)
        return fr * win

    t = timeit(jax.jit(frame_only), y)
    mark(f"pad+frame+window      {t*1e3:8.1f} ms")

    # ---- planar full round (no complex64 anywhere)
    def round_planar_3x(Xr, Xi):
        z = _mm3x(Xr, m3["A"]) + _mm3x(Xi, m3["B"])      # (B,F,n_fft)
        yy = _overlap_add(z * win, hop) * wsq             # OLA coords
        # interior-equivalent trim+repad composition (exact: trim+reflect)
        yy = yy[..., pad: pad + L]
        yp = jnp.pad(yy, [(0, 0), (pad, pad)], mode="reflect")
        fr = _frame_signal(yp, F, n_fft, hop) * win
        er = _mm3x(fr, m3["C"])
        ei = _mm3x(fr, m3["S"])
        r = jnp.sqrt(er * er + ei * ei)
        s = mag / jnp.maximum(1e-8, r)
        return er * s, ei * s

    def round_planar_bf(Xr, Xi):
        z = (_mm(Xr, mb["A"], jnp.bfloat16)
             + _mm(Xi, mb["B"], jnp.bfloat16))
        yy = _overlap_add(z * win, hop) * wsq
        yy = yy[..., pad: pad + L]
        yp = jnp.pad(yy, [(0, 0), (pad, pad)], mode="reflect")
        fr = _frame_signal(yp, F, n_fft, hop) * win
        er = _mm(fr, mb["C"], jnp.bfloat16)
        ei = _mm(fr, mb["S"], jnp.bfloat16)
        r = jnp.sqrt(er * er + ei * ei)
        s = mag / jnp.maximum(1e-8, r)
        return er * s, ei * s

    t = timeit(jax.jit(round_planar_3x), Xr, Xi)
    mark(f"planar round 3-pass   {t*1e3:8.1f} ms")
    t = timeit(jax.jit(round_planar_bf), Xr, Xi)
    mark(f"planar round bf16     {t*1e3:8.1f} ms")

    # ---- 50-round loop comparison: current complex vs planar-in-scan
    def gl_complex(mag):
        Xc = mag.astype(jnp.complex64)
        def body(_, Xc):
            return round_full("dft_bf16", mb, Xc)
        return jnp.real(jax.lax.fori_loop(0, 40, body, Xc))

    def gl_planar(mag):
        def body(_, c):
            return round_planar_bf(*c)
        xr, xi = jax.lax.fori_loop(0, 40, body, (mag, jnp.zeros_like(mag)))
        return xr

    t = timeit(jax.jit(gl_complex), mag, iters=2)
    mark(f"40 rounds complex bf16  {t*1e3:8.1f} ms")
    t = timeit(jax.jit(gl_planar), mag, iters=2)
    mark(f"40 rounds planar  bf16  {t*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
