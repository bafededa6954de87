"""Measure a CPU proxy of the reference pipeline's throughput.

The reference is TF1 on CPU: 210 autoregressive steps each re-running the
full graph on the whole mel buffer (synthesize.py:45-54), one SSRN pass,
then 50 host Griffin-Lim iterations per utterance. This proxy runs OUR
implementation in mode="reference" (same per-step full-prefix recompute
semantics) on the CPU backend for a small batch and extrapolates
audio-s/s. It under-counts the TF graph's work (TextEnc/AudioEnc are not
re-run per step here), so the stored baseline is a conservative
(favorable-to-the-reference) number.

Writes baseline_cpu.json next to bench.py.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from dc_tts_tpu.config import base_config  # noqa: E402
from dc_tts_tpu.models.ssrn import SSRN  # noqa: E402
from dc_tts_tpu.models.text2mel import Text2Mel  # noqa: E402
from dc_tts_tpu.pipeline import Synthesizer  # noqa: E402
from dc_tts_tpu import text as text_mod  # noqa: E402


def main():
    cfg = base_config()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sents = text_mod.load_test_sentences(
        os.path.join(here, "harvard_sentences.txt"))[:2]
    ids = text_mod.encode_batch(sents, cfg)

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    synth = Synthesizer(cfg, Text2Mel(cfg).init(k1), SSRN(cfg).init(k2),
                        decode_mode="reference")

    wavs, _, _, _ = synth.synthesize_ids(ids)  # compile
    jax.block_until_ready(wavs)
    t0 = time.perf_counter()
    wavs, _, _, _ = synth.synthesize_ids(ids)
    jax.block_until_ready(wavs)
    dt = time.perf_counter() - t0
    audio_s = int(np.prod(wavs.shape)) / cfg.sr
    value = audio_s / dt
    out = {"audio_s_per_s": round(value, 4), "batch": len(sents),
           "mode": "reference-semantics CPU proxy", "seconds": round(dt, 2)}
    with open(os.path.join(here, "baseline_cpu.json"), "w") as f:
        json.dump(out, f)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
