"""Round-5 experiment: where does the SSRN bf16 train step's time go?

Round-4 measured SSRN bf16 at 96 ms/step = 20% MFU (f32 is 198 ms at
58%): halving precision only halved the step, so the bf16 path is
activation-traffic/layout bound, not MXU bound. Candidate fix measured
here: compute_dtype="bfloat16_full" carries INTER-block activations in
bf16 (conv taps gather/concat, HC residuals, stored-for-backward tensors
all halve their HBM bytes) while matmuls keep f32 accumulation and
LN/gate math stays f32 off the f32 matmul output.

Rows (full grid, B=32, rng=rbg as the shipped CLI defaults):
  1. fwd-only vs full step at bf16 — splits forward from backward cost
  2. bf16 (r4 baseline: f32 activations, per-layer operand casts)
  3. bfloat16_full (bf16 inter-block activations)
  4. f32 (context)
for both networks; then the shipped-defaults 3-bucket combination for
whichever bf16 mode wins (the number BASELINE.md's training table quotes).
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


def make_batch(cfg, n=None, t=None):
    rng = np.random.default_rng(0)
    B, N, T = cfg.B, n or cfg.max_N, t or cfg.max_T
    return {
        "texts": jnp.asarray(rng.integers(1, cfg.vocab_size, (B, N)),
                             jnp.int32),
        "mels": jnp.asarray(rng.random((B, T, cfg.n_mels), np.float32)),
        "mags": jnp.asarray(rng.random((B, T * cfg.r, cfg.n_freq),
                                       np.float32)),
        "text_lens": jnp.full((B,), int(N * 0.6), jnp.int32),
        "mel_lens": jnp.full((B,), int(T * 0.8), jnp.int32),
    }


def bench(label, cfg, which, fwd_only=False, n=None, t=None, iters=5):
    key = jax.random.PRNGKey(0)
    batch = make_batch(cfg, n, t)
    if which == "t2m":
        state = init_text2mel_state(cfg, key)
        step = make_text2mel_step(cfg)
        b = {k: v for k, v in batch.items() if k != "mags"}
    else:
        state = init_ssrn_state(cfg, key)
        step = make_ssrn_step(cfg)
        b = {"mels": batch["mels"], "mags": batch["mags"]}

    if fwd_only:
        from dc_tts_tpu.models.ssrn import SSRN
        from dc_tts_tpu.models.text2mel import Text2Mel
        from dc_tts_tpu.train.losses import ssrn_loss, text2mel_loss
        from dc_tts_tpu.train.steps import teacher_forcing_shift

        if which == "ssrn":
            model = SSRN(cfg)

            def fwd(params, b, rng):
                logits, Z = model.apply(params, b["mels"], rng=rng,
                                        train=True)
                return ssrn_loss(logits, Z, b["mags"], cfg)[0]
        else:
            model = Text2Mel(cfg)

            def fwd(params, b, rng):
                S = teacher_forcing_shift(b["mels"])
                logits, Y, align, _ = model.apply(params, b["texts"], S,
                                                  rng=rng, train=True)
                return text2mel_loss(logits, Y, align, b["mels"], cfg,
                                     b.get("text_lens"),
                                     b.get("mel_lens"))[0]

        f = jax.jit(fwd)
        r = jax.random.PRNGKey(1)
        out = f(state.params, b, r)
        _ = float(out)
        best = 1e9
        for _ in range(iters):
            t0 = time.perf_counter()
            _ = float(f(state.params, b, r))
            best = min(best, time.perf_counter() - t0)
    else:
        sj = jax.jit(step)
        r = jax.random.PRNGKey(1)
        state, m = sj(state, b, r)
        _ = float(np.asarray(m["loss"]))
        best = 1e9
        for _ in range(iters):
            t0 = time.perf_counter()
            state, m = sj(state, b, r)
            _ = float(np.asarray(m["loss"]))
            best = min(best, time.perf_counter() - t0)
    mark(f"{label:46s} {best*1e3:8.1f} ms")
    return best


def main():
    jax.config.update("jax_default_prng_impl", "rbg")  # the CLI default
    cfg = base_config()
    mark(f"platform {jax.devices()[0].platform} B={cfg.B} rng=rbg")

    bf = cfg.replace(compute_dtype="bfloat16")
    bff = cfg.replace(compute_dtype="bfloat16_full")

    for which in ("ssrn", "t2m"):
        bench(f"{which} bf16 FWD-ONLY", bf, which, fwd_only=True)
        bench(f"{which} bf16 full step (r4 baseline)", bf, which)
        bench(f"{which} bf16_full FWD-ONLY", bff, which, fwd_only=True)
        bench(f"{which} bf16_full full step", bff, which)
        bench(f"{which} f32 full step (context)", cfg, which)

    # shipped-defaults 3-bucket combination for the bf16_full candidate
    shapes = [(72, 96), (104, 136), (cfg.max_N, cfg.max_T)]
    for which in ("ssrn", "t2m"):
        times = [bench(f"{which} bf16_full bucket {s}", bff, which,
                       n=s[0], t=s[1]) for s in shapes]
        avg = sum(times) / len(times)
        mark(f"{which} bf16_full DEFAULTS eq-wt: {avg*1e3:.1f} ms/step "
             f"-> {2_000_000 * avg / 3600.0:.1f} h to 2M steps")


if __name__ == "__main__":
    main()
