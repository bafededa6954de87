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
from dc_tts_tpu.dsp.griffin_lim import spectrogram_to_wav
from dc_tts_tpu.models.ssrn import SSRN
from dc_tts_tpu.models.text2mel import Text2Mel
from dc_tts_tpu import text as text_mod


def timed(name, fn, *args, n=3):
    out = fn(*args)
    _ = jax.tree.map(np.asarray, out)  # compile + fence
    best = 1e9
    for _i in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = jax.tree.map(np.asarray, out)
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

    dec = jax.jit(lambda p, i: t2m.decode(p, i)[0])
    (Y), t_dec = timed("text2mel decode (210)", dec, p1, ids)

    ssrn_fn = jax.jit(lambda p, y: ssrn.apply(p, y)[1])
    (Z), t_ssrn = timed("ssrn", ssrn_fn, p2, Y)

    gl = jax.jit(lambda z: spectrogram_to_wav(z, cfg))
    (w), t_gl = timed("griffin-lim (50 it)", gl, Z)

    tot = t_dec + t_ssrn + t_gl
    audio = int(np.prod(np.shape(w))) / cfg.sr
    print(f"{'total':24s} {tot:8.3f}s  -> {audio / tot:.1f} audio-s/s")
    for name, t in [("decode", t_dec), ("ssrn", t_ssrn), ("gl", t_gl)]:
        print(f"  {name:8s} {100 * t / tot:5.1f}%")


if __name__ == "__main__":
    main()
