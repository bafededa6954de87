"""Whole-loop fused GL (dft_pallas2): ON-CHIP parity + timing.

The interpret-mode tests (tests/test_pallas_gl2.py) pin the math; this
script pins the COMPILED Mosaic kernel on real hardware, where layout/
relayout behavior can differ from interpret mode:

  1. single-round parity (n_iter=1: one HIGHEST round + final iSTFT)
     against the XLA f32 "dft" path at full production geometry
  2. full 50-iteration timing at bench geometry (B=40)
  3. SSRN synthesis-precision gate: the Synthesizer's default
     ssrn_precision="high" (3-pass MXU accumulation) against "highest"
     at full geometry — the CPU suite cannot see this (precision hints
     are no-ops off TPU), so the 7.4e-5 measured error bound is pinned
     HERE, where future kernel/compiler changes would widen it.

Run on the TPU (takes one ~5 min kernel compile on a cold cache).
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

from dc_tts_tpu.dsp.stft import stft, istft, dft_consts
from dc_tts_tpu.ops.pallas_gl2 import (gl2_consts, gl2_geometry, gl2_run,
                                       scramble_mag)

N_FFT, HOP, WIN_L, F, B = 2048, 275, 1102, 840, 40
T0 = time.time()


def mark(msg):
    print(f"[{time.time() - T0:7.1f}s] {msg}", flush=True)


def main():
    assert jax.default_backend() == "tpu", "run this on the TPU"
    g = gl2_geometry(N_FFT, HOP, WIN_L, F)
    rng = np.random.default_rng(0)
    n_freq = N_FFT // 2 + 1
    mag = jnp.asarray(rng.random((B, F, n_freq), np.float32)) + 0.05
    consts = jax.tree.map(jnp.asarray, gl2_consts(N_FFT, HOP, WIN_L, F))

    # ---- 1. one-round parity vs the XLA f32 path (compiled, on chip)
    m = jax.tree.map(jnp.asarray, dft_consts(N_FFT, "dft"))

    @jax.jit
    def xla_round(mag, m):
        X = mag.astype(jnp.complex64)
        x_t = istft(X, N_FFT, HOP, WIN_L, method="dft", mats=m)
        est = stft(x_t, N_FFT, HOP, WIN_L, method="dft", mats=m)
        X1 = mag * (est / jnp.maximum(1e-8, jnp.abs(est)))
        return istft(X1, N_FFT, HOP, WIN_L, method="dft", mats=m)

    one = jax.jit(lambda ms, c: gl2_run(ms, c, g, n_iter=1))
    mag_scr = jax.jit(lambda x: scramble_mag(x, g, dtype=jnp.float32))(mag)
    y_ref = np.asarray(xla_round(mag, m))
    mark("xla round done")
    y = np.asarray(one(mag_scr, consts))
    n = min(y.shape[-1], y_ref.shape[-1])
    d = np.abs(y[:, :n] - y_ref[:, :n]).max()
    mark(f"one-round ON-CHIP parity vs XLA f32: max abs diff {d:.3e} "
         f"(scale {np.abs(y_ref).max():.3f})")
    assert d < 5e-5, "on-chip parity regression"

    # ---- 2. full 50-iteration timing
    run = jax.jit(lambda ms, c: gl2_run(ms, c, g, n_iter=50))
    y = run(mag_scr, consts)
    np.asarray(y[:, :8])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        y = run(mag_scr, consts)
        np.asarray(y[:, :8])
        best = min(best, time.perf_counter() - t0)
    mark(f"full 50-iter GL (B={B}): {best:.3f} s "
         f"({best * 1e3 / 50:.2f} ms/round eq)")

    # ---- 3. SSRN "high" (3-pass) vs "highest" synthesis-precision gate
    from dc_tts_tpu.config import base_config
    from dc_tts_tpu.models.ssrn import SSRN

    cfg = base_config()
    params = SSRN(cfg).init(jax.random.PRNGKey(0))
    Y = jax.random.uniform(jax.random.PRNGKey(1), (8, cfg.max_T, cfg.n_mels))
    z_hi = np.asarray(jax.jit(SSRN(cfg).apply)(params, Y)[1])
    cfg_h = cfg.replace(compute_dtype="float32_high")
    z_h = np.asarray(jax.jit(SSRN(cfg_h).apply)(params, Y)[1])
    rel = np.abs(z_h - z_hi).max() / max(1e-9, np.abs(z_hi).max())
    mark(f"SSRN high-vs-highest ON-CHIP rel err: {rel:.3e} "
         f"(measured 7.4e-5 in r4; bound 3e-4)")
    assert rel < 3e-4, "ssrn_precision='high' error bound regression"
    return 0


if __name__ == "__main__":
    sys.exit(main())
