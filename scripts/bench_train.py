"""Training-step throughput on the current backend (run on TPU).

BASELINE.json config #5: the guided-attention training step on LJ-style
minibatches (reference hot loop: /root/reference/train.py:146-148). Times
BOTH networks' train steps at full geometry across variants:

  - f32 (default numerics)
  - bf16 conv operands (compute_dtype=bfloat16, f32 accumulation)
  - remat (jax.checkpoint per block)
  - pallas (fused HC forward + hand-written VJP where it fits VMEM)
  - bucketed shapes (the median-length bucket, to measure padding waste)

Prints one line per variant: step time, steps/s, examples/s, and MFU
(3x forward FLOPs as the standard fwd+bwd estimate, x6 MXU passes for
f32@HIGHEST). Synthetic batches — step cost does not depend on content.
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
from dc_tts_tpu.models.ssrn import ssrn_specs
from dc_tts_tpu.models.text2mel import (audio_dec_specs, audio_enc_specs,
                                        text_enc_specs)
from dc_tts_tpu.train.steps import (init_ssrn_state, init_text2mel_state,
                                    make_ssrn_step, make_text2mel_step)
from dc_tts_tpu.utils.profiling import (PRECISION_PASSES, conv_stack_flops,
                                        mfu)


def synth_batch(cfg, key, n=None, t=None):
    n = n or cfg.max_N
    t = t or cfg.max_T
    k1, k2 = jax.random.split(key)
    return {
        "texts": np.asarray(jax.random.randint(k1, (cfg.B, n), 1,
                                               cfg.vocab_size), np.int32),
        "mels": np.asarray(jax.random.uniform(k2, (cfg.B, t, cfg.n_mels)),
                           np.float32),
        "mags": np.asarray(jax.random.uniform(k2, (cfg.B, t * cfg.r,
                                                   cfg.n_freq)), np.float32),
        "text_lens": np.full((cfg.B,), int(n * 0.6), np.int32),
        "mel_lens": np.full((cfg.B,), int(t * 0.8), np.int32),
    }


def bench_step(label, cfg, which, batch, iters=5):
    key = jax.random.PRNGKey(0)
    if which == "t2m":
        state = init_text2mel_state(cfg, key)
        step = jax.jit(make_text2mel_step(cfg), donate_argnums=0)
        fwd_flops = (conv_stack_flops(cfg.B, batch["texts"].shape[1],
                                      text_enc_specs(cfg), cfg.e)
                     + conv_stack_flops(cfg.B, batch["mels"].shape[1],
                                        audio_enc_specs(cfg), cfg.n_mels)
                     + conv_stack_flops(cfg.B, batch["mels"].shape[1],
                                        audio_dec_specs(cfg), 2 * cfg.d))
        b = {k: v for k, v in batch.items() if k != "mags"}
    else:
        state = init_ssrn_state(cfg, key)
        step = jax.jit(make_ssrn_step(cfg), donate_argnums=0)
        fwd_flops = conv_stack_flops(cfg.B, batch["mels"].shape[1],
                                     ssrn_specs(cfg), cfg.n_mels)
        b = {"mels": batch["mels"], "mags": batch["mags"]}
    rng = jax.random.PRNGKey(1)
    # Batches live on device for the timed loop: the production loop
    # overlaps host->device transfer with compute (prefetch_to_device;
    # the reference's queue runners do the same), so the step metric must
    # not charge a synchronous re-upload per call — over the axon tunnel
    # that upload dominates (2.9 s vs 0.2 s actual SSRN step). Set
    # BENCH_HOST_FEED=1 to measure the synchronous-feed number instead.
    if not os.environ.get("BENCH_HOST_FEED"):
        b = jax.device_put(b)
    try:
        # PIPELINED timing, one fence per iters-step span: the production
        # loop (donated state, prefetch, logs every N steps) never blocks
        # per step, and over the axon tunnel a per-step host fence adds a
        # flat ~26 ms of round-trip latency that is NOT device time
        # (measured r5: SSRN bf16_full 67.6 ms fenced vs 41.9 pipelined).
        # The old per-step-fenced channel is kept for r4 comparability.
        state, metrics = step(state, b, rng)        # compile
        _ = float(np.asarray(metrics["loss"]))
        span = 1e9
        for _i in range(3):
            t0 = time.perf_counter()
            for _j in range(iters):
                state, metrics = step(state, b, rng)
            _ = float(np.asarray(metrics["loss"]))
            span = min(span, time.perf_counter() - t0)
        pipelined = span / iters
        best = 1e9
        for _i in range(iters):
            t0 = time.perf_counter()
            state, metrics = step(state, b, rng)
            _ = float(np.asarray(metrics["loss"]))  # host fence
            best = min(best, time.perf_counter() - t0)
    except Exception as e:
        print(f"{label:34s} FAILED: {type(e).__name__}: {e}")
        return
    train_flops = 3 * fwd_flops  # fwd + bwd standard estimate
    passes = PRECISION_PASSES[
        "bf16" if cfg.compute_dtype.startswith("bfloat16")
        else "f32_highest"]
    print(f"{label:34s} {pipelined*1e3:8.1f} ms/step  "
          f"{1/pipelined:6.2f} steps/s "
          f"{cfg.B/pipelined:7.1f} ex/s  "
          f"mfu {100*mfu(train_flops, pipelined, passes):5.1f}%  "
          f"(fenced {best*1e3:.1f} ms)",
          flush=True)


def bench_combo(label, cfg, which, shapes, iters=5):
    """Time one step per bucket shape and combine with EQUAL weights —
    compute_bucket_shapes splits the corpus into equal-count groups by
    construction, so a steady-state epoch runs each shape equally often.
    Returns the combined steps/s."""
    times = []
    for n, t in shapes:
        b = synth_batch(cfg, jax.random.PRNGKey(7), n=n, t=t)
        key = jax.random.PRNGKey(0)
        if which == "t2m":
            state = init_text2mel_state(cfg, key)
            step = jax.jit(make_text2mel_step(cfg), donate_argnums=0)
            b = {k: v for k, v in b.items() if k != "mags"}
        else:
            state = init_ssrn_state(cfg, key)
            step = jax.jit(make_ssrn_step(cfg), donate_argnums=0)
            b = {"mels": b["mels"], "mags": b["mags"]}
        b = jax.device_put(b)
        rng = jax.random.PRNGKey(1)
        state, metrics = step(state, b, rng)
        _ = float(np.asarray(metrics["loss"]))
        # pipelined, one fence per iters-step span (production methodology
        # — donated state, no per-step host sync; see bench_step)
        span = 1e9
        for _i in range(3):
            t0 = time.perf_counter()
            for _j in range(iters):
                state, metrics = step(state, b, rng)
            _ = float(np.asarray(metrics["loss"]))
            span = min(span, time.perf_counter() - t0)
        times.append(span / iters)
    avg = sum(times) / len(times)
    sps = 1.0 / avg
    hours_2m = 2_000_000 * avg / 3600.0
    per = "  ".join(f"({n},{t}) {tt*1e3:.1f}ms" for (n, t), tt
                    in zip(shapes, times))
    print(f"{label:34s} {avg*1e3:8.1f} ms/step  {sps:6.2f} steps/s  "
          f"-> {hours_2m:5.1f} h to 2M steps   [{per}]", flush=True)
    return sps


def defaults_main():
    """Measure the SHIPPED training CLI defaults (VERDICT r3 #6): rbg
    hardware RNG + 3 length buckets, at f32 (the --dtype default) and
    bfloat16. Bucket shapes: the last is ALWAYS the full grid
    (dataset.compute_bucket_shapes); the two smaller are LJ-like tertile
    shapes (the median (104,136) was measured from LJ in round 3)."""
    jax.config.update("jax_default_prng_impl", "rbg")  # the CLI default
    cfg = base_config()
    shapes = [(72, 96), (104, 136), (cfg.max_N, cfg.max_T)]
    print(f"platform {jax.devices()[0].platform}, B={cfg.B}, rng=rbg, "
          f"bucket shapes {shapes}", flush=True)
    for which in ("t2m", "ssrn"):
        bench_combo(f"{which} DEFAULTS (f32+rbg+buckets)", cfg, which,
                    shapes)
        bench_combo(f"{which} bf16+rbg+buckets",
                    cfg.replace(compute_dtype="bfloat16"), which, shapes)
        bench_combo(f"{which} bf16_full+rbg+buckets",
                    cfg.replace(compute_dtype="bfloat16_full"), which,
                    shapes)


def main():
    cfg = base_config()
    print(f"platform {jax.devices()[0].platform}, B={cfg.B}, "
          f"full grid ({cfg.max_N}, {cfg.max_T})", flush=True)
    batch = synth_batch(cfg, jax.random.PRNGKey(7))
    # a median-LJ-like bucket shape (see data.compute_bucket_shapes)
    bucket = synth_batch(cfg, jax.random.PRNGKey(7), n=104, t=136)

    for which in ("t2m", "ssrn"):
        bench_step(f"{which} f32", cfg, which, batch)
        bench_step(f"{which} bf16 convs",
                   cfg.replace(compute_dtype="bfloat16"), which, batch)
        bench_step(f"{which} bf16_full (bf16 activations)",
                   cfg.replace(compute_dtype="bfloat16_full"), which, batch)
        bench_step(f"{which} f32 remat", cfg.replace(remat=True), which,
                   batch)
        bench_step(f"{which} f32 pallas-vjp",
                   cfg.replace(use_pallas=True), which, batch)
        bench_step(f"{which} bf16 pallas-vjp",
                   cfg.replace(use_pallas=True,
                               compute_dtype="bfloat16"), which, batch)
        bench_step(f"{which} f32 bucket(104,136)", cfg, which, bucket)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "defaults":
        defaults_main()
    else:
        main()
