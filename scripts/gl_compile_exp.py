"""Experiment: is Griffin-Lim's slow TPU compile caused by the DFT matrices
being embedded as HLO constants?

Times jit lower+compile (no execution) and then steady-state execution of
the GL loop at growing sizes, for (a) the current constant-embedding path
and (b) a variant where the cos/sin matrices are jit ARGUMENTS.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dc_tts_tpu.dsp.stft import (_dft_mats, _idft_mats, hann_window,
                                 _frame_signal, _overlap_add, _ola_window_sq,
                                 num_frames)

T0 = time.time()


def mark(msg):
    print(f"[{time.time() - T0:8.1f}s] {msg}", flush=True)


N_FFT, HOP, WIN, N_ITER = 2048, 276, 1102, 50


def gl_args(mag, C, S, A, Bm):
    """GL loop with DFT matrices as runtime arguments."""
    win = jnp.asarray(hann_window(WIN, N_FFT))
    F = mag.shape[-2]
    total = N_FFT + HOP * (F - 1)
    n = total - 2 * (N_FFT // 2)
    wsq = jnp.asarray(_ola_window_sq(F, N_FFT, HOP, WIN))
    pad = N_FFT // 2

    def istft_(X):
        frames = (jnp.real(X) @ A + jnp.imag(X) @ Bm)
        y = _overlap_add(frames * win, HOP)
        y = y * wsq
        return y[..., pad: total - pad]

    def stft_(y):
        y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)], mode="reflect")
        f = num_frames(n, N_FFT, HOP)
        frames = _frame_signal(y, f, N_FFT, HOP) * win
        return jax.lax.complex(frames @ C, frames @ S)

    X = mag.astype(jnp.complex64)

    def body(_, X):
        est = stft_(istft_(X))
        return mag * (est / jnp.maximum(1e-8, jnp.abs(est)))

    X = jax.lax.fori_loop(0, N_ITER, body, X)
    return istft_(X)


def gl_const(mag):
    from dc_tts_tpu.dsp.griffin_lim import griffin_lim
    return griffin_lim(mag, N_FFT, HOP, WIN, N_ITER, method="dft")


def run(label, fn, mag, *extra):
    t = time.time()
    c = jax.jit(fn).lower(mag, *extra).compile()
    mark(f"{label}: compile {time.time() - t:.1f}s")
    t = time.time()
    y = c(mag, *extra)
    _ = np.asarray(y)
    mark(f"{label}: run1 {time.time() - t:.1f}s")
    t = time.time()
    y = c(mag, *extra)
    _ = np.asarray(y)
    mark(f"{label}: run2 {time.time() - t:.1f}s")


def main():
    mark(f"devices={jax.devices()}")
    x = jnp.ones((8, 8))
    _ = np.asarray(x @ x)
    mark("claimed chip")

    C, S = [jnp.asarray(m) for m in _dft_mats(N_FFT)]
    A, Bm = [jnp.asarray(m) for m in _idft_mats(N_FFT)]

    for B, F in [(8, 212), (40, 212), (40, 844)]:
        key = jax.random.PRNGKey(0)
        mag = jax.random.uniform(key, (B, F, N_FFT // 2 + 1)) + 0.1
        run(f"args  B={B} F={F}", gl_args, mag, C, S, A, Bm)
        run(f"const B={B} F={F}", gl_const, mag)
    mark("DONE")


if __name__ == "__main__":
    main()
