"""Diagnose the SSRN train-step slowness on the current backend.

bench_train measured ssrn f32 at ~4.6 s/step (2.5% MFU) vs t2m's 117 ms
(22.6% MFU) — ~10x off the roofline. Suspects:

  A. dropout PRNG: ~20 threefry masks of (B, 840, C<=2048) per step
     (~1.1e9 random u32) — VPU-bound, and the default threefry is slow.
  B. HBM pressure: f32 activations for backward are ~30 x (32,840,1024..2048)
     = multi-GB; remat measuring FASTER (2.9 s) hints at spilling.
  C. the backward itself (shift-concat conv / deconv grads).

Variants isolate each: forward-only vs train step, dropout on/off,
threefry partitionable, rbg (hardware) PRNG, remat, bf16.
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
from dc_tts_tpu.models.ssrn import SSRN
from dc_tts_tpu.train.steps import init_ssrn_state, make_ssrn_step

T0 = time.time()


def mark(msg):
    print(f"[{time.time() - T0:7.1f}s] {msg}", flush=True)


def time_call(fn, *args, iters=4):
    out = fn(*args)
    _ = jax.tree.map(np.asarray, jax.tree.leaves(out)[0])
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    return best


def bench_variant(label, cfg, train=True):
    key = jax.random.PRNGKey(0)
    batch = {
        "mels": np.asarray(jax.random.uniform(
            key, (cfg.B, cfg.max_T, cfg.n_mels)), np.float32),
        "mags": np.asarray(jax.random.uniform(
            key, (cfg.B, cfg.max_T * cfg.r, cfg.n_freq)), np.float32),
    }
    try:
        if train:
            state = init_ssrn_state(cfg, key)
            step = jax.jit(make_ssrn_step(cfg))
            rng = jax.random.PRNGKey(1)
            t = time_call(lambda: step(state, batch, rng))
        else:
            model = SSRN(cfg)
            params = model.init(key)
            f = jax.jit(lambda p, y: model.apply(p, y)[0])
            t = time_call(lambda: f(params, batch["mels"]))
        mark(f"{label:42s} {t*1e3:8.1f} ms")
    except Exception as e:
        mark(f"{label:42s} FAILED {type(e).__name__}: {e}")


def main():
    cfg = base_config()
    mark(f"platform {jax.devices()[0].platform}, B={cfg.B}")

    bench_variant("fwd only, eval (no dropout)", cfg, train=False)
    bench_variant("train f32 (baseline)", cfg)
    bench_variant("train f32 dropout=0", cfg.replace(dropout_rate=0.0))

    jax.config.update("jax_threefry_partitionable", True)
    bench_variant("train f32 threefry_partitionable", cfg)
    jax.config.update("jax_threefry_partitionable", False)

    jax.config.update("jax_default_prng_impl", "rbg")
    bench_variant("train f32 rbg prng", cfg)
    jax.config.update("jax_default_prng_impl", "threefry2x32")

    bench_variant("train f32 remat", cfg.replace(remat=True))
    bench_variant("train bf16 dropout=0",
                  cfg.replace(compute_dtype="bfloat16", dropout_rate=0.0))
    bench_variant("train bf16 remat",
                  cfg.replace(compute_dtype="bfloat16", remat=True))


if __name__ == "__main__":
    main()
