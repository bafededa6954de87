"""SSRN slowness, round 2: proper scalar-reduction fencing (the first diag
accidentally timed a 110 MB logits transfer through the ~40 MB/s tunnel).

Times, all all-device with a fused scalar sum as the only host copy:
  - SSRN forward at f32 (Precision.HIGHEST pins, the parity default)
  - SSRN forward with compute_dtype=bfloat16
  - per-layer-group forwards (prefixes of the spec list) to localize
  - t2m-style reference point: SSRN fwd at B=40 like profile_stages
  - full train step (grad+adam) f32 and bf16, loss-scalar fenced
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
from dc_tts_tpu.models.blocks import apply_stack, init_stack
from dc_tts_tpu.models.ssrn import SSRN, ssrn_specs
from dc_tts_tpu.train.steps import init_ssrn_state, make_ssrn_step

T0 = time.time()


def mark(msg):
    print(f"[{time.time() - T0:7.1f}s] {msg}", flush=True)


def time_scalar(fn, *args, iters=4):
    """fn must return a scalar (or tuple w/ scalar first)."""
    s = fn(*args)
    _ = float(np.asarray(jax.tree.leaves(s)[0]))
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        s = fn(*args)
        _ = float(np.asarray(jax.tree.leaves(s)[0]))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    cfg = base_config()
    mark(f"platform {jax.devices()[0].platform}")
    key = jax.random.PRNGKey(0)
    B = cfg.B  # 32
    Y = jnp.asarray(np.random.default_rng(0).random(
        (B, cfg.max_T, cfg.n_mels), np.float32) * 0.5)

    model = SSRN(cfg)
    params = model.init(key)

    f32 = jax.jit(lambda p, y: jnp.sum(model.apply(p, y)[0]))
    t = time_scalar(f32, params, Y)
    mark(f"fwd f32 (HIGHEST) B={B}              {t*1e3:8.1f} ms")

    cfg_bf = cfg.replace(compute_dtype="bfloat16")
    model_bf = SSRN(cfg_bf)
    fbf = jax.jit(lambda p, y: jnp.sum(model_bf.apply(p, y)[0]))
    t = time_scalar(fbf, params, Y)
    mark(f"fwd bf16 B={B}                       {t*1e3:8.1f} ms")

    # localize: run prefixes of the stack
    specs = ssrn_specs(cfg)
    labels = ["C512", "+2HC@T210", "+D+2HC@T420", "+D+2HC@T840",
              "+C1024", "+2HC1024@T840", "+C1025", "+2Crelu+C@1025"]
    cuts = [1, 3, 6, 9, 10, 12, 13, 16]
    p2, _ = init_stack(key, cfg.n_mels, specs)
    for lab, cut in zip(labels, cuts):
        sub = specs[:cut]
        subp = p2[:cut] if isinstance(p2, (list, tuple)) else p2
        g = jax.jit(lambda pp, y, sub=sub, cut=cut: jnp.sum(apply_stack(
            pp[:cut] if isinstance(pp, (list, tuple)) else pp, sub, y,
            ln_eps=cfg.ln_eps, dropout_rate=0.0, rng=None, train=False)))
        try:
            t = time_scalar(g, subp, Y)
            mark(f"prefix {lab:22s} {t*1e3:8.1f} ms")
        except Exception as e:
            mark(f"prefix {lab:22s} FAILED {type(e).__name__}: {e}")
            break

    st = init_ssrn_state(cfg, key)
    step = jax.jit(make_ssrn_step(cfg))
    batch = {"mels": np.asarray(Y),
             "mags": np.random.default_rng(1).random(
                 (B, cfg.max_T * cfg.r, cfg.n_freq)).astype(np.float32)}
    rng = jax.random.PRNGKey(1)

    def run_step():
        st2, m = step(st, batch, rng)
        return m["loss"]
    t = time_scalar(run_step)
    mark(f"train step f32 (loss-fenced)         {t*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
