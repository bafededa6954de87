"""Compare pipeline variants on the current backend (run on TPU).

Times full batched Harvard synthesis for combinations of:
  - Griffin-Lim STFT backend: fft vs dft (MXU matmul)
  - conv compute dtype: float32 vs bfloat16
  - fused Pallas blocks on/off (inference path)
Prints one line per variant. Timing is fenced with a host copy of a scalar.
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
from dc_tts_tpu.dsp.griffin_lim import spectrogram_to_wav, gl_consts
from dc_tts_tpu.models.ssrn import SSRN
from dc_tts_tpu.models.text2mel import Text2Mel
from dc_tts_tpu import text as text_mod


def bench(cfg, ids, label, n=3):
    t2m = Text2Mel(cfg)
    ssrn = SSRN(cfg)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    p1, p2 = t2m.init(k1), ssrn.init(k2)

    mats = gl_consts(cfg)

    @jax.jit
    def run(p1, p2, ids, mats):
        Y, _ = t2m.decode(p1, ids)
        _, Z = ssrn.apply(p2, Y)
        wav = spectrogram_to_wav(Z, cfg, mats)
        return jnp.sum(wav), wav.shape[-1]

    s, nsamp = run(p1, p2, ids, mats)
    _ = float(s)
    best = 1e9
    for _i in range(n):
        t0 = time.perf_counter()
        s, _ = run(p1, p2, ids, mats)
        _ = float(s)
        best = min(best, time.perf_counter() - t0)
    audio = ids.shape[0] * int(nsamp) / cfg.sr
    print(f"{label:42s} {best:7.3f}s  {audio / best:8.1f} audio-s/s",
          flush=True)
    return best


def main():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sents = text_mod.load_test_sentences(
        os.path.join(here, "harvard_sentences.txt"))
    base = base_config()
    ids = jnp.asarray(text_mod.encode_batch(sents, base))
    print(f"batch {ids.shape[0]}, platform {jax.devices()[0].platform}")
    variants = [
        ("fft GL, f32 convs", base.replace(stft_method="fft")),
        ("dft GL, f32 convs", base.replace(stft_method="dft")),
        ("dft_3x GL, f32 convs", base.replace(stft_method="dft_3x")),
        ("dft_mixed GL, f32 convs", base.replace(stft_method="dft_mixed")),
        ("dft_pallas2 GL, f32 convs (default)",
         base.replace(stft_method="dft_pallas2")),
        ("dft_pallas GL, f32 convs (r3 default)",
         base.replace(stft_method="dft_pallas")),
        ("ct GL, f32 convs", base.replace(stft_method="ct")),
        ("dft_bf16 GL, f32 convs", base.replace(stft_method="dft_bf16")),
        ("dft_3x GL, bf16 convs", base.replace(stft_method="dft_3x",
                                               compute_dtype="bfloat16")),
    ]
    # BENCH_ONLY="dft_mixed,pallas" runs just the rows whose label contains
    # one of the comma-separated substrings (each compile costs minutes over
    # the tunnel; re-measuring one cell shouldn't pay for the whole grid).
    only = [s.strip() for s in os.environ.get("BENCH_ONLY", "").split(",")
            if s.strip()]
    if only:
        variants = [(l, c) for l, c in variants
                    if any(s in l for s in only)]
    for label, cfg in variants:
        try:
            bench(cfg, ids, label)
        except Exception as e:
            print(f"{label:42s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
