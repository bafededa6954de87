"""Fused whole-loop Pallas decode: on-chip parity + throughput (B=40).

Compares Text2Mel.decode(mode="fused") — the ONE-kernel 210-step loop with
VMEM-resident weights and shift-register conv state — against the XLA
incremental path it replaces (measured 252 us/step, 20.9% MFU).
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
from dc_tts_tpu.models.text2mel import Text2Mel
from dc_tts_tpu import text as text_mod

T0 = time.time()


def mark(msg):
    print(f"[{time.time() - T0:7.1f}s] {msg}", flush=True)


def timeit(fn, *args, iters=5):
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
    cfg = base_config()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sents = text_mod.load_test_sentences(
        os.path.join(here, "harvard_sentences.txt"))
    ids = jnp.asarray(text_mod.encode_batch(sents, cfg))
    mark(f"platform {jax.devices()[0].platform}  B={ids.shape[0]}")

    model = Text2Mel(cfg)
    params = model.init(jax.random.PRNGKey(0))

    inc = jax.jit(lambda p, i: model.decode(p, i, mode="incremental"))
    fus = jax.jit(lambda p, i: model.decode(p, i, mode="fused"))

    Yr, Ar = inc(params, ids)
    _ = np.asarray(Yr[0, 0, 0])
    mark("incremental compiled")
    Y, A = fus(params, ids)
    _ = np.asarray(Y[0, 0, 0])
    mark("fused compiled")

    dy = float(jnp.abs(Y - Yr).max())
    da = float(jnp.abs(A - Ar).max())
    cursors_eq = bool(jnp.all(jnp.argmax(A, axis=1)
                              == jnp.argmax(Ar, axis=1)))
    mark(f"parity: max |dY|={dy:.3e} max |dA|={da:.3e} "
         f"cursor trajectories equal={cursors_eq}")

    t = timeit(inc, params, ids)
    mark(f"incremental decode (XLA)   {t*1e3:8.1f} ms")
    t = timeit(fus, params, ids)
    mark(f"fused decode (Pallas)      {t*1e3:8.1f} ms")

    # ---- precision ladder + the bench's B=72 chunk geometry
    from dc_tts_tpu.models.text2mel import Text2Mel as _T2M
    from dc_tts_tpu.ops.pallas_decode import (fused_decode,
                                              pack_decode_params)

    packed = pack_decode_params(cfg, params)
    Kt, V = model.text_encode(params, ids, train=False)
    # Mosaic supports only HIGHEST and default dot precision in-kernel;
    # measure default (single-pass) as the latency floor — NOT a usable
    # mode (its drift diverges the cursor), just the matmul-cost bound.
    fus_lo = jax.jit(lambda p, k, v: fused_decode(
        p, k, v, cfg.max_T, cfg, prec="default"))
    Yl, Al = fus_lo(packed, Kt, V)
    t = timeit(fus_lo, packed, Kt, V)
    mark(f"fused prec=default (floor) {t*1e3:8.1f} ms")

    # high3: hi/lo bf16 3-pass decomposition on EVERY layer matmul, half
    # HIGHEST's passes; gate cursor equality + Y parity vs XLA
    fus_h3 = jax.jit(lambda p, k, v: fused_decode(
        p, k, v, cfg.max_T, cfg, prec="high3"))
    Y3, A3 = fus_h3(packed, Kt, V)
    dy3 = float(jnp.abs(Y3 - Yr).max())
    cur3 = bool(jnp.all(jnp.argmax(A3, axis=1).astype(jnp.int32)
                        == jnp.argmax(Ar, axis=1).astype(jnp.int32)))
    t = timeit(fus_h3, packed, Kt, V)
    mark(f"fused prec=high3           {t*1e3:8.1f} ms   "
         f"max|dY|={dy3:.2e} cursors_eq={cur3}")

    # hybrid: enc stack (the cursor-critical q path) HIGHEST, dec stack
    # high3 — dec errors only reach the cursor through the
    # sigmoid-compressed y feedback
    fus_hy = jax.jit(lambda p, k, v: fused_decode(
        p, k, v, cfg.max_T, cfg, prec="hybrid"))
    Yh, Ah = fus_hy(packed, Kt, V)
    dyh = float(jnp.abs(Yh - Yr).max())
    curh = bool(jnp.all(jnp.argmax(Ah, axis=1).astype(jnp.int32)
                        == jnp.argmax(Ar, axis=1).astype(jnp.int32)))
    t = timeit(fus_hy, packed, Kt, V)
    mark(f"fused prec=hybrid          {t*1e3:8.1f} ms   "
         f"max|dY|={dyh:.2e} cursors_eq={curh}")

    # ---- trajectory gate: exact cursor equality vs the XLA path across
    # 10 random inits at full geometry (the default-safety bar for any
    # reduced-precision mode; VERDICT r4 #3)
    flips = {"high3": 0, "hybrid": 0}
    worst = {"high3": 0.0, "hybrid": 0.0}
    for seed in range(10):
        pi = model.init(jax.random.PRNGKey(100 + seed))
        Yri, Ari = inc(pi, ids)
        pki = pack_decode_params(cfg, pi)
        Kti, Vi = model.text_encode(pi, ids, train=False)
        curs_r = np.asarray(jnp.argmax(Ari, axis=1))
        for name, f in (("high3", fus_h3), ("hybrid", fus_hy)):
            Yx, Ax = f(pki, Kti, Vi)
            eq = bool(np.array_equal(np.asarray(jnp.argmax(Ax, axis=1)),
                                     curs_r))
            if not eq:
                flips[name] += 1
            worst[name] = max(worst[name], float(jnp.abs(Yx - Yri).max()))
    mark(f"10-init gate: high3 flips={flips['high3']} "
         f"worst|dY|={worst['high3']:.2e}; hybrid flips={flips['hybrid']} "
         f"worst|dY|={worst['hybrid']:.2e}")

    ids72 = jnp.concatenate([ids, ids[:32]], axis=0)
    t = timeit(inc, params, ids72)
    mark(f"B=72 incremental (XLA)     {t*1e3:8.1f} ms")
    t = timeit(fus, params, ids72)
    mark(f"B=72 fused (Pallas)        {t*1e3:8.1f} ms")
    fus72 = jax.jit(lambda p, i: model.decode(p, i, mode="fused",
                                              prec="hybrid"))
    t = timeit(fus72, params, ids72)
    mark(f"B=72 fused prec=hybrid     {t*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
