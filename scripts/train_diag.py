"""Locate the non-matmul cost in bf16 training steps (round 3).

t2m bf16 trains at 9.4% MFU (46.9 ms/step), SSRN bf16 at 20% (96 ms) —
the matmuls are a small fraction at bf16 rate, so something elementwise
dominates. Suspects: per-layer threefry dropout masks (38 layers x
(B,T,C) bernoulli draws per step), f32 LayerNorm chains, gate/residual
elementwise. This script toggles dropout and the RNG implementation.
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
from dc_tts_tpu.train.steps import (init_ssrn_state, init_text2mel_state,
                                    make_ssrn_step, make_text2mel_step)

T0 = time.time()


def mark(msg):
    print(f"[{time.time() - T0:7.1f}s] {msg}", flush=True)


def bench(label, cfg, which):
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    B, N, T = cfg.B, cfg.max_N, cfg.max_T
    batch = {
        "texts": jnp.asarray(rng.integers(1, cfg.vocab_size, (B, N)),
                             jnp.int32),
        "mels": jnp.asarray(rng.random((B, T, cfg.n_mels), np.float32)),
        "mags": jnp.asarray(rng.random((B, T * cfg.r, cfg.n_freq),
                                       np.float32)),
        "text_lens": jnp.full((B,), int(N * 0.6), jnp.int32),
        "mel_lens": jnp.full((B,), int(T * 0.8), jnp.int32),
    }
    if which == "t2m":
        state = init_text2mel_state(cfg, key)
        step = jax.jit(make_text2mel_step(cfg))
        b = {k: v for k, v in batch.items() if k != "mags"}
    else:
        state = init_ssrn_state(cfg, key)
        step = jax.jit(make_ssrn_step(cfg))
        b = {"mels": batch["mels"], "mags": batch["mags"]}
    r = jax.random.PRNGKey(1)
    state, m = step(state, b, r)
    _ = float(np.asarray(m["loss"]))
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        state, m = step(state, b, r)
        _ = float(np.asarray(m["loss"]))
        best = min(best, time.perf_counter() - t0)
    mark(f"{label:42s} {best*1e3:8.1f} ms/step")


def main():
    cfg = base_config()
    mark(f"platform {jax.devices()[0].platform} B={cfg.B}")
    for which in ("t2m", "ssrn"):
        bench(f"{which} bf16 dropout=0.05 (prod)",
              cfg.replace(compute_dtype="bfloat16"), which)
        bench(f"{which} bf16 dropout=0",
              cfg.replace(compute_dtype="bfloat16", dropout_rate=0.0), which)
        bench(f"{which} f32  dropout=0",
              cfg.replace(dropout_rate=0.0), which)
    # dropout cost is RNG generation: 38 (t2m) / 16 (ssrn) threefry
    # bernoulli draws over (B,T,C) per step. rbg = the TPU hardware RNG.
    jax.config.update("jax_default_prng_impl", "rbg")
    for which in ("t2m", "ssrn"):
        bench(f"{which} bf16 dropout=0.05 rbg",
              cfg.replace(compute_dtype="bfloat16"), which)
        bench(f"{which} f32  dropout=0.05 rbg", cfg, which)


if __name__ == "__main__":
    main()
