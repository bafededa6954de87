"""Per-stage timing of the synthesis pipeline on the current backend.

Times Text2Mel decode, SSRN, and Griffin-Lim separately (each its own jit,
fenced by host copies) to direct kernel-optimization work.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dc_tts_tpu.config import base_config
from dc_tts_tpu.dsp.griffin_lim import spectrogram_to_wav, gl_consts
from dc_tts_tpu.models.ssrn import SSRN
from dc_tts_tpu.models.text2mel import Text2Mel
from dc_tts_tpu import text as text_mod
from dc_tts_tpu.utils.compile_cache import enable as enable_compile_cache

enable_compile_cache()


def timed(name, fn, *args, n=3):
    """Time fn's DEVICE cost: fence on a host copy of a scalar reduction,
    not of the full output — stage outputs here are up to 138 MB and the
    axon tunnel moves tens of MB/s, which would swamp the compute time
    (the end-to-end bench keeps the wav transfer, as delivery is part of
    that metric)."""
    out = fn(*args)
    _ = jax.tree.map(np.asarray, out)  # compile + materialize

    fsum = jax.jit(lambda *a: jax.tree.reduce(
        lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)), fn(*a),
        jnp.float32(0)))
    _ = float(np.asarray(fsum(*args)))  # compile the fused reduction
    best = 1e9
    for _i in range(n):
        t0 = time.perf_counter()
        _ = float(np.asarray(fsum(*args)))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:24s} {best:8.3f}s", flush=True)
    return out, best


def main():
    cfg = base_config()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sents = text_mod.load_test_sentences(
        os.path.join(here, "harvard_sentences.txt"))
    ids = jnp.asarray(text_mod.encode_batch(sents, cfg))
    B = ids.shape[0]
    print(f"batch {B}, platform {jax.devices()[0].platform}", flush=True)

    t2m = Text2Mel(cfg)
    ssrn = SSRN(cfg)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    p1, p2 = t2m.init(k1), ssrn.init(k2)

    dec = jax.jit(lambda p, i: t2m.decode(p, i, mode="fused")[0])
    (Y), t_dec = timed("text2mel decode (210)", dec, p1, ids)

    ssrn_fn = jax.jit(lambda p, y: ssrn.apply(p, y)[1])
    (Z), t_ssrn = timed("ssrn", ssrn_fn, p2, Y)

    gl = jax.jit(lambda z, m: spectrogram_to_wav(z, cfg, m))
    (w), t_gl = timed("griffin-lim (50 it)", gl, Z, gl_consts(cfg))

    tot = t_dec + t_ssrn + t_gl
    audio = int(np.prod(np.shape(w))) / cfg.sr
    print(f"{'total':24s} {tot:8.3f}s  -> {audio / tot:.1f} audio-s/s")
    for name, t in [("decode", t_dec), ("ssrn", t_ssrn), ("gl", t_gl)]:
        print(f"  {name:8s} {100 * t / tot:5.1f}%")

    # ---- MFU / roofline report (the "speed-of-light per chip" check) ----
    from dc_tts_tpu.models.ssrn import ssrn_specs
    from dc_tts_tpu.models.text2mel import (audio_dec_specs, audio_enc_specs,
                                            text_enc_specs)
    from dc_tts_tpu.utils.profiling import (PRECISION_PASSES,
                                            V5E_BF16_PEAK_FLOPS,
                                            conv_stack_flops,
                                            griffin_lim_flops, mfu)

    N, T = ids.shape[1], cfg.max_T
    dec_flops = (conv_stack_flops(B, N, text_enc_specs(cfg), cfg.e)
                 + conv_stack_flops(B, T, audio_enc_specs(cfg), cfg.n_mels)
                 + conv_stack_flops(B, T, audio_dec_specs(cfg), 2 * cfg.d)
                 + 2 * 2 * B * T * N * cfg.d)              # QK^T + A*V
    ssrn_flops = conv_stack_flops(B, T, ssrn_specs(cfg), cfg.n_mels)
    frames = T * cfg.r + 1  # istft/stft round frame count inside GL
    gl_flops = griffin_lim_flops(B, frames, cfg.n_fft, cfg.n_iter,
                                 cfg.stft_method)
    if cfg.stft_method in ("dft_mixed", "dft_pallas", "dft_pallas2"):
        # schedule: n_iter/10 head + n_iter/10 tail rounds at 3 passes
        # (dft_3x) — dft_pallas2 runs those at HIGHEST (6 passes) on its
        # factored stages — the rest single-pass bf16 (dsp/griffin_lim.py)
        it = cfg.n_iter
        hd = min(it, max(1, it // 10))
        tl = min(it - hd, max(2, it // 10))
        hp = 6 if cfg.stft_method == "dft_pallas2" else 3
        gl_passes = (hp * (hd + tl) + (it - hd - tl)) / it
    else:
        gl_passes = PRECISION_PASSES[
            "bf16" if cfg.stft_method.endswith("bf16") else
            "f32_high" if cfg.stft_method in ("dft_3x", "ct") else
            "f32_highest"]
    print(f"\nMFU vs one-chip bf16 peak ({V5E_BF16_PEAK_FLOPS/1e12:.0f} "
          f"TFLOP/s); conv stacks run f32@HIGHEST (x6 passes), "
          f"GL method '{cfg.stft_method}' x{gl_passes}:")
    for name, fl, t, passes in [
            ("decode", dec_flops, t_dec, PRECISION_PASSES["f32_highest"]),
            ("ssrn", ssrn_flops, t_ssrn, PRECISION_PASSES["f32_highest"]),
            ("gl", gl_flops, t_gl, gl_passes)]:
        print(f"  {name:8s} {fl/1e12:7.2f} TFLOP  {fl/t/1e12:7.2f} TFLOP/s "
              f" mfu {100*mfu(fl, t, passes):5.1f}%")


if __name__ == "__main__":
    main()
