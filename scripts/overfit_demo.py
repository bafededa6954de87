"""End-to-end learning demo: overfit ONE utterance, then synthesize it
autoregressively and compare against the ground-truth features.

This exercises the full loop the reference validates by ear: guided
attention must become monotonic, the incremental decoder must walk the
text with its cursor, SSRN must upsample, and Griffin-Lim must produce
audio whose spectrogram matches. Runs on CPU in a few minutes.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax

if os.environ.get("DEMO_CPU", "1") == "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from dc_tts_tpu.config import test_config
from dc_tts_tpu.dsp.features import reduce_mel, wav_to_spectrograms
from dc_tts_tpu.pipeline import Synthesizer
from dc_tts_tpu.train.steps import (init_ssrn_state, init_text2mel_state,
                                    make_ssrn_step, make_text2mel_step)
from dc_tts_tpu import text as text_mod


def main(steps=int(os.environ.get("DEMO_STEPS", "3000"))):
    cfg = test_config().replace(warmup_steps=200.0, B=1)
    sentence = "a quick brown fox."
    ids = text_mod.encode_batch([sentence], cfg)
    n_chars = int(np.flatnonzero(ids[0])[-1]) + 1

    # synthetic "speech": per-char tones so audio follows the text
    sr, hop = cfg.sr, cfg.hop_length
    samples_per_char = (cfg.max_T * cfg.r * hop) // n_chars
    wav = np.concatenate([
        0.4 * np.sin(2 * np.pi * (150 + 35 * (int(c) % 12))
                     * np.arange(samples_per_char) / sr)
        for c in ids[0, :n_chars]]).astype(np.float32)
    mel, mag = wav_to_spectrograms(jnp.asarray(wav), cfg)
    mel, mag = reduce_mel(np.asarray(mel), np.asarray(mag), cfg.r)
    t = min(mel.shape[0], cfg.max_T)
    mels = np.zeros((1, cfg.max_T, cfg.n_mels), np.float32)
    mags = np.zeros((1, cfg.max_T * cfg.r, cfg.n_freq), np.float32)
    mels[0, :t] = mel[:t]
    mags[0, : t * cfg.r] = mag[: t * cfg.r]

    batch = {"texts": jnp.asarray(ids), "mels": jnp.asarray(mels),
             "text_lens": jnp.asarray([n_chars]),
             "mel_lens": jnp.asarray([t])}
    sbatch = {"mels": jnp.asarray(mels), "mags": jnp.asarray(mags)}

    s1 = init_text2mel_state(cfg, jax.random.PRNGKey(0))
    s2 = init_ssrn_state(cfg, jax.random.PRNGKey(1))
    step1 = jax.jit(make_text2mel_step(cfg), donate_argnums=0)
    step2 = jax.jit(make_ssrn_step(cfg), donate_argnums=0)

    t0 = time.time()
    for i in range(steps):
        s1, m1 = step1(s1, batch, jax.random.PRNGKey(2))
        s2, m2 = step2(s2, sbatch, jax.random.PRNGKey(3))
        if i % 500 == 0 or i == steps - 1:
            print(f"step {i}: t2m mels L1 {float(m1['loss_mels']):.4f} "
                  f"att {float(m1['loss_att']):.4f} "
                  f"diag {float(m1['attention_diagonality']):.4f} "
                  f"ssrn mags L1 {float(m2['loss_mags']):.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    # free-running synthesis of the training sentence
    synth = Synthesizer(cfg, s1.params, s2.params)
    wavs, Y, Z, align = synth.synthesize_ids(jnp.asarray(ids))
    Yn = np.asarray(Y)[0, :t]
    mel_l1 = float(np.abs(Yn - mels[0, :t]).mean())
    # attention path monotonicity
    cursor = np.asarray(align)[0].argmax(axis=0)
    mono_frac = float(np.mean(np.diff(cursor[:t]) >= 0))
    # spectral match of the synthesized audio
    mel_s, _ = wav_to_spectrograms(jnp.asarray(np.asarray(wavs)[0]), cfg)
    m1_ = mels[0, :t].ravel()
    m2_ = np.asarray(reduce_mel(np.asarray(mel_s),
                                np.zeros((mel_s.shape[0], cfg.n_freq),
                                         np.float32), cfg.r)[0])[:t].ravel()
    n = min(len(m1_), len(m2_))
    corr = float(np.corrcoef(m1_[:n], m2_[:n])[0, 1])
    print(f"\nfree-running mel L1 vs target: {mel_l1:.4f}")
    print(f"attention cursor monotonic fraction: {mono_frac:.2f}")
    print(f"synthesized-audio mel correlation: {corr:.3f}")
    ok = mel_l1 < 0.15 and corr > 0.5
    print("DEMO", "PASS" if ok else "WEAK")


if __name__ == "__main__":
    main()
