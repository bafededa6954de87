"""Capture a jax.profiler trace of one train step and print the top device
ops by total time — no TensorBoard needed (parses the raw .xplane.pb with
TF's bundled xplane proto).

Usage: python scripts/xprof_top.py [t2m|ssrn] [compute_dtype] [fwd]
Default: ssrn bfloat16 full step.
"""
from __future__ import annotations

import glob
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


def top_ops(trace_dir: str, n: int = 35):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane under {trace_dir}"
    agg = {}
    total = 0
    for p in paths:
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "/device" not in plane.name:
                continue
            ev_names = {k: v.name for k, v in plane.event_metadata.items()}
            for line in plane.lines:
                if "XLA Ops" not in line.name:
                    continue
                for ev in line.events:
                    name = ev_names.get(ev.metadata_id, "?")
                    d = ev.duration_ps / 1e6  # ps -> us
                    agg[name] = agg.get(name, 0.0) + d
                    total += d
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:n]
    print(f"total device op time {total/1e3:.2f} ms across {len(agg)} ops")
    for name, us in rows:
        print(f"{us/1e3:9.3f} ms  {100*us/max(total,1e-9):5.1f}%  {name[:110]}")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "ssrn"
    dtype = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
    fwd_only = len(sys.argv) > 3 and sys.argv[3] == "fwd"
    jax.config.update("jax_default_prng_impl", "rbg")
    cfg = base_config().replace(compute_dtype=dtype)
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
    key = jax.random.PRNGKey(0)
    if which == "t2m":
        state = init_text2mel_state(cfg, key)
        step = jax.jit(make_text2mel_step(cfg))
        b = {k: v for k, v in batch.items() if k != "mags"}
    else:
        state = init_ssrn_state(cfg, key)
        step = jax.jit(make_ssrn_step(cfg))
        b = {"mels": batch["mels"], "mags": batch["mags"]}

    if fwd_only:
        from dc_tts_tpu.models.ssrn import SSRN
        from dc_tts_tpu.train.losses import ssrn_loss

        model = SSRN(cfg)

        def fwd(params, b, r):
            logits, Z = model.apply(params, b["mels"], rng=r, train=True)
            return ssrn_loss(logits, Z, b["mags"], cfg)[0]

        f = jax.jit(fwd)
        run = lambda r: float(f(state.params, b, r))
    else:
        def run(r):
            nonlocal state
            state, m = step(state, b, r)
            return float(np.asarray(m["loss"]))

    r = jax.random.PRNGKey(1)
    run(r)  # compile
    run(r)
    trace_dir = f"/tmp/xprof_{which}_{dtype}{'_fwd' if fwd_only else ''}"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            run(r)
    time.sleep(1)
    print(f"== {which} {dtype}{' fwd-only' if fwd_only else ''} x3 steps ==")
    top_ops(trace_dir)


if __name__ == "__main__":
    main()
