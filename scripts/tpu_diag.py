"""Incremental TPU health/compile diagnostic (live progress to stdout).

Steps from a trivial op up through each pipeline stage at reduced sizes,
printing wall time after each, so a hang is attributable to a specific
compile/execute step rather than the whole pipeline. Run unbuffered and
redirect to a file to watch progress live:

    timeout 1800 python -u scripts/tpu_diag.py > /tmp/diag.out 2>&1 &
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

T0 = time.time()


def mark(msg):
    print(f"[{time.time() - T0:8.1f}s] {msg}", flush=True)


def main():
    enable_compile_cache()
    mark(f"start; devices={jax.devices()}")

    x = jnp.ones((256, 256))
    mark(f"small matmul -> {float(np.asarray((x @ x).sum()))}")

    from dc_tts_tpu.config import base_config, test_config
    from dc_tts_tpu.models.ssrn import SSRN
    from dc_tts_tpu.models.text2mel import Text2Mel
    from dc_tts_tpu.dsp.griffin_lim import spectrogram_to_wav

    # tiny config first: small compiles of every stage
    for name, cfg in [("tiny", test_config()), ("full", base_config())]:
        t2m, ssrn = Text2Mel(cfg), SSRN(cfg)
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
        p1, p2 = t2m.init(k1), ssrn.init(k2)
        B = 4 if name == "tiny" else 40
        ids = jax.random.randint(k3, (B, cfg.max_N), 1, cfg.vocab_size)
        mark(f"{name}: params built")

        Y0 = jnp.zeros((B, cfg.max_T // cfg.r, cfg.n_mels))
        t = time.time()
        Z = jax.jit(lambda p, y: ssrn.apply(p, y)[1])(p2, Y0)
        _ = np.asarray(Z)
        mark(f"{name}: ssrn compile+run {time.time() - t:.1f}s")

        t = time.time()
        w = jax.jit(lambda z: spectrogram_to_wav(z, cfg))(Z)
        _ = np.asarray(w)
        mark(f"{name}: griffin-lim compile+run {time.time() - t:.1f}s")

        t = time.time()
        Y = jax.jit(lambda p, i: t2m.decode(p, i)[0])(p1, ids)
        _ = np.asarray(Y)
        mark(f"{name}: decode compile+run {time.time() - t:.1f}s")
    mark("ALL OK")


if __name__ == "__main__":
    main()
