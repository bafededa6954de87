"""Fused-Pallas GL: on-chip parity + throughput at bench geometry.

Times the fused middle loop against the XLA dft_bf16 loop it replaces
(in-loop round cost was 12.7 ms on XLA vs a ~3 ms MXU floor —
scripts/gl_diag.py), checks one-round parity on chip, and times the full
griffin_lim schedules (dft_mixed vs dft_pallas). All consts pass through
jit boundaries as arguments (literal embedding compiles minutes slower).
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
from dc_tts_tpu.dsp.griffin_lim import griffin_lim, gl_consts
from dc_tts_tpu.dsp.stft import istft, stft
from dc_tts_tpu.ops.pallas_gl import fused_gl_round, gl_geometry

T0 = time.time()


def mark(msg):
    print(f"[{time.time() - T0:7.1f}s] {msg}", flush=True)


def timeit(fn, *args, iters=3):
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0].ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    cfg = base_config().replace(stft_method="dft_pallas")
    B, F = 40, cfg.max_T * cfg.r
    n_fft, hop, win_l = cfg.n_fft, cfg.hop_length, cfg.win_length
    n_freq = n_fft // 2 + 1
    mark(f"platform {jax.devices()[0].platform}  B={B} F={F}")

    rng = np.random.default_rng(0)
    mag = jnp.asarray(rng.random((B, F, n_freq), np.float32))
    Xr = jnp.asarray(rng.standard_normal((B, F, n_freq)).astype(np.float32))
    Xi = jnp.asarray(rng.standard_normal((B, F, n_freq)).astype(np.float32))

    g = gl_geometry(n_fft, hop, win_l, F)
    mats = jax.tree.map(jnp.asarray, gl_consts(cfg, F=F))
    fused = mats["fused"]
    mb = {"C": mats["Cb"], "S": mats["Sb"], "A": mats["Ab"], "B": mats["Bb"]}

    pr = ((0, 0), (0, g.f2 - F), (0, 0))
    Xrp, Xip = jnp.pad(Xr, pr), jnp.pad(Xi, pr)
    mag_p = jnp.pad(mag, pr)

    # ---- one-round on-chip parity vs the XLA bf16 round
    def xla_round(Xr, Xi, mag, mb):
        X = jax.lax.complex(Xr, Xi)
        x_t = istft(X, n_fft, hop, win_l, method="dft_bf16", mats=mb)
        est = stft(x_t, n_fft, hop, win_l, method="dft_bf16", mats=mb)
        phase = est / jnp.maximum(1e-8, jnp.abs(est))
        out = mag * phase
        return jnp.real(out), jnp.imag(out)

    def pallas_round(Xrp, Xip, mag_p, fused):
        return fused_gl_round(Xrp, Xip, mag_p, fused, g, False)

    rr, ri = jax.jit(xla_round)(Xr, Xi, mag, mb)
    pr_, pi_ = jax.jit(pallas_round)(Xrp, Xip, mag_p, fused)
    dr = float(jnp.abs(pr_[:, :F] - rr).max())
    di = float(jnp.abs(pi_[:, :F] - ri).max())
    mark(f"one-round parity vs XLA bf16: max abs dr={dr:.3e} di={di:.3e}")

    # ---- 40-round loops
    def loop_xla(mag, mb):
        X = mag.astype(jnp.complex64)

        def body(_, X):
            x_t = istft(X, n_fft, hop, win_l, method="dft_bf16", mats=mb)
            est = stft(x_t, n_fft, hop, win_l, method="dft_bf16", mats=mb)
            phase = est / jnp.maximum(1e-8, jnp.abs(est))
            return mag * phase

        return jnp.real(jax.lax.fori_loop(0, 40, body, X))

    def loop_pallas(mag_p, fused):
        def body(_, c):
            return fused_gl_round(c[0], c[1], mag_p, fused, g, False)

        xr, _ = jax.lax.fori_loop(0, 40, body,
                                  (mag_p, jnp.zeros_like(mag_p)))
        return xr

    t = timeit(jax.jit(loop_xla), mag, mb)
    mark(f"40 rounds XLA bf16      {t*1e3:8.1f} ms ({t*25:.2f} ms/round)")
    t = timeit(jax.jit(loop_pallas), mag_p, fused)
    mark(f"40 rounds fused pallas  {t*1e3:8.1f} ms ({t*25:.2f} ms/round)")

    # ---- full griffin_lim schedules (50 iters, incl head/tail + final)
    mx = jax.tree.map(jnp.asarray, gl_consts(cfg.replace(
        stft_method="dft_mixed"), F=F))

    def full_mixed(mag, m):
        return griffin_lim(mag, n_fft, hop, win_l, cfg.n_iter,
                           method="dft_mixed", mats=m)

    def full_pallas(mag, m):
        return griffin_lim(mag, n_fft, hop, win_l, cfg.n_iter,
                           method="dft_pallas", mats=m)

    t = timeit(jax.jit(full_mixed), mag, mx)
    mark(f"griffin_lim dft_mixed  50 it {t*1e3:8.1f} ms")
    t = timeit(jax.jit(full_pallas), mag, mats)
    mark(f"griffin_lim dft_pallas 50 it {t*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
