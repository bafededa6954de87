"""SSRN backward-pass bisection (round 2, diag 3).

bench_train: ssrn f32 train step = 2939 ms at B=32 while the forward is
~70-90 ms — the backward is ~30x the forward instead of the usual ~2x.
bf16 and remat are both SLOWER, so the suspect is layout/elementwise
pathology, not matmul FLOPs. This script times value_and_grad of stack
prefixes (dropout off) to localize the layer group, then toggles the
loss, dropout, and deconv individually.
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
from dc_tts_tpu.models.blocks import C, D, HC, apply_stack, init_stack
from dc_tts_tpu.models.ssrn import ssrn_specs
from dc_tts_tpu.train.losses import ssrn_loss
from dc_tts_tpu.train.steps import init_ssrn_state, make_ssrn_step

T0 = time.time()


def mark(msg):
    print(f"[{time.time() - T0:7.1f}s] {msg}", flush=True)


def time_scalar(fn, *args, iters=3):
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
    mark(f"platform {jax.devices()[0].platform} B={cfg.B}")
    key = jax.random.PRNGKey(0)
    B = cfg.B
    Y = jnp.asarray(np.random.default_rng(0).random(
        (B, cfg.max_T, cfg.n_mels), np.float32) * 0.5)
    mags = jnp.asarray(np.random.default_rng(1).random(
        (B, cfg.max_T * cfg.r, cfg.n_freq), np.float32))

    specs = ssrn_specs(cfg)
    params, _ = init_stack(key, cfg.n_mels, specs)
    params = list(params)

    # ---- grad of sum(prefix), dropout OFF — localize the slow group
    labels = ["C512@210", "+2HC@210", "+D+2HC@420", "+D+2HC@840",
              "+C1024@840", "+2HC1024@840", "+C1025", "full16"]
    cuts = [1, 3, 6, 9, 10, 12, 13, 16]
    for lab, cut in zip(labels, cuts):
        sub = tuple(specs[:cut])

        def loss(pp, y, sub=sub, cut=cut):
            out = apply_stack(pp, sub, y, ln_eps=cfg.ln_eps,
                              dropout_rate=0.0, rng=None, train=True)
            return jnp.sum(out * out)

        g = jax.jit(lambda pp, y, loss=loss: jax.value_and_grad(loss)(
            pp[:len(sub)], y)[0])
        try:
            t = time_scalar(g, params, Y)
            mark(f"grad prefix {lab:16s} {t*1e3:8.1f} ms")
        except Exception as e:
            mark(f"grad prefix {lab:16s} FAILED {type(e).__name__}: {e}")

    # ---- the real train step, dropout ON vs OFF
    for lab, c in [("step dropout=0.05 (prod)", cfg),
                   ("step dropout=0", cfg.replace(dropout_rate=0.0))]:
        state = init_ssrn_state(c, key)
        step = jax.jit(make_ssrn_step(c))
        batch = {"mels": Y, "mags": mags}
        rng = jax.random.PRNGKey(1)

        def run(state=state, step=step, batch=batch, rng=rng):
            st2, m = step(state, batch, rng)
            return m["loss"]

        t = time_scalar(run)
        mark(f"{lab:28s} {t*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
